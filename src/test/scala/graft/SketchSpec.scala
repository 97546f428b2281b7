package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HLL++ sketch is the one gate surface with no cross-engine oracle
  * (txt_approx_distinct is rows-only by design: DuckDB's approx sketch is a
  * different algorithm). This spec bounds it against the EXACT distinct on
  * seeded data instead: the estimate must fall within a small multiple of
  * its configured relative standard deviation. Deterministic input + a
  * deterministic hash make the assertion stable, not flaky.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("approx_count_distinct lands within its configured error bound") {
    import spark.implicits._
    // three cardinality regimes: small (exact-mode HLL), mid, large
    for (n <- Seq(500L, 20000L, 200000L)) {
      val df = spark.range(n * 3)
        .select((col("id") % n).cast("string").as("w")) // each value ~3 times
      val row = df.agg(
        countDistinct(col("w")).as("exact"),
        approx_count_distinct(col("w"), 0.01).as("approx")).collect()(0)
      val (exact, approx) = (row.getLong(0), row.getLong(1))
      assert(exact === n)
      val relErr = math.abs(approx - exact).toDouble / exact
      // 4x the configured rsd (0.01): comfortably inside HLL++'s tail for a
      // fixed dataset while still catching a mis-sized sketch outright
      assert(relErr <= 0.04,
        s"n=$n: approx=$approx vs exact=$exact, relErr=$relErr > 0.04")
    }
  }

  test("the txt_approx_distinct gate's estimate tracks its exact column") {
    // the gate query itself carries exact_distinct next to approx_distinct
    // precisely so the sketch is checkable — assert the bound on real
    // testdata when present (the driver's own volume)
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val rows = SparkEntry.queries("txt_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct")
      val approx = r.getAs[Long]("approx_distinct")
      val relErr = math.abs(approx - exact).toDouble / math.max(1L, exact)
      assert(relErr <= 0.04,
        s"source=${r.get(0)}: approx=$approx vs exact=$exact, relErr=$relErr")
    }
  }
}
