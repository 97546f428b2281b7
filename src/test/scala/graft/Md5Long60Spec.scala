package graft

import graft.functions.{Md5Long60, Portable}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The custom codegen'd md5long60 expression must agree bit-for-bit with the
  * composed builtin chain `conv(substring(md5(x), 1, 15), 16, 10)::long` it
  * replaces (which is also what the DuckDB oracles compute).
  */
class Md5Long60Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("matches the composed-builtin reference on arbitrary strings") {
    import spark.implicits._
    val gen = Gen.listOfN(400, Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("λ", "中", "🙂", "\n", "\t", " ")).map(_.mkString)))
    val strs = gen.sample.get
    val df = (strs :+ "").toDF("s")
    val bad = df.select(
      Portable.md5Long(col("s")).as("fast"),
      Portable.md5LongReference(col("s")).as("ref"))
      .filter(col("fast") =!= col("ref") || col("fast") < 0)
    assert(bad.isEmpty)
  }

  test("direct compute matches java reference for edge inputs") {
    for (s <- Seq("", "a", "0~0", "x" * 10000)) {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = digest.map(b => f"$b%02x").mkString
      val want = java.lang.Long.parseLong(hex.take(15), 16)
      assert(Md5Long60.compute(s.getBytes("UTF-8")) === want, s"input '$s'")
    }
  }
}
