package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A raw HLL++ estimate has no cross-engine oracle (DuckDB's approx sketch
  * is a different algorithm), so the txt_approx_distinct GATE row carries
  * the sketch as a within-bound VERDICT column next to DuckDB-oracled exact
  * counts. This spec bounds the estimate itself against the exact distinct
  * on seeded data: it must fall within a small multiple of its configured
  * relative standard deviation. Deterministic input + a deterministic hash
  * make the assertion stable, not flaky.
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

  test("the txt_approx_distinct gate's within-bound verdict holds on testdata") {
    // the gate query folds the sketch into approx_within_rsd (|approx −
    // exact| ≤ max(1, 4·rsd·exact)), which the DuckDB oracle asserts as
    // literal TRUE — check the same verdict here on the driver's own volume
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val rows = SparkEntry.queries("txt_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_within_rsd"),
        s"source=${r.get(0)}: sketch drifted out of its 4x-rsd bound " +
          s"(exact=${r.getAs[Long]("exact_distinct")})")
    }
  }
}
