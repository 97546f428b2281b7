package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Scratch dirs for queries that materialize an intermediate table (the
  * jsonl converter roundtrip, the shingle staging table, the gz archives,
  * the end-to-end engine work dirs).
  *
  * The root is CONFIGURABLE (`spark.graft.staging.root` conf, or the
  * `GRAFT_STAGING_ROOT` env var) and all paths go through the Hadoop
  * FileSystem API: on a real cluster the root must be a shared filesystem
  * (HDFS / object store) that every executor and the driver can reach — a
  * driver-local `java.io.tmpdir` default only works in `local[*]`, where
  * driver and executors share one machine. Defaults to `java.io.tmpdir`
  * for exactly that local mode.
  *
  * `dir` wipes and recreates its tag (repeated Verify/Bench invocations in
  * one JVM don't leak dataset-sized staging trees); `cached`/`markReady`
  * let expensive fixtures (the block-gzip archives) build once per JVM and
  * be reused by later queries — the reuse is gated on an explicit marker
  * file so a half-built tree from a crashed run is rebuilt, never trusted.
  * The pid scope keeps two concurrent runs from deleting each other's live
  * staging mid-query.
  */
object Staging {

  private val ReadyMarker = "_GRAFT_STAGING_READY"

  private def rootStr(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.staging.root")
      .orElse(sys.env.get("GRAFT_STAGING_ROOT"))
      .getOrElse(sys.props.getOrElse("java.io.tmpdir", "/tmp"))

  private def tagPath(spark: SparkSession, tag: String): Path =
    new Path(new Path(rootStr(spark),
      s"graft-stage-${ProcessHandle.current().pid()}"), tag)

  /** A fresh (wiped) scratch dir for `tag`. */
  def dir(spark: SparkSession, tag: String): String = {
    val p = tagPath(spark, tag)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    fs.mkdirs(p)
    p.toString
  }

  /** Reusable scratch dir: returns (path, ready). `ready` is true only when
    * a previous build completed and called [[markReady]] — the caller then
    * skips the build; otherwise the dir comes back wiped and the caller
    * builds and marks it.
    */
  def cached(spark: SparkSession, tag: String): (String, Boolean) = {
    val p = tagPath(spark, tag)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(p, ReadyMarker))) (p.toString, true)
    else {
      fs.delete(p, true)
      fs.mkdirs(p)
      (p.toString, false)
    }
  }

  /** Stamp a [[cached]] dir as completely built. */
  def markReady(spark: SparkSession, path: String): Unit = {
    val p = new Path(path, ReadyMarker)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(p, true).close()
  }
}
