package graft.queries

/** pid-scoped scratch dirs for queries that materialize an intermediate
  * table (the jsonl converter roundtrip, the shingle staging table, the
  * end-to-end engine work dirs). Reusing a tag rm -rf's the previous run's
  * copy, so repeated Verify/Bench invocations in one JVM don't leak
  * dataset-sized tmp trees; the pid scope keeps two concurrent runs (e.g.
  * full Verify + a prefix-filtered dev run) from deleting each other's live
  * staging mid-query.
  */
object Staging {
  private def rmRf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRf))
    f.delete(): Unit
  }

  def dir(tag: String): String = {
    val root = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    val d = new java.io.File(s"$root/graft-stage-${ProcessHandle.current().pid()}/$tag")
    rmRf(d)
    d.mkdirs()
    d.getAbsolutePath
  }
}
