package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic CDC change-log generator (FIXTURES.md §2).
  *
  * Everything is a pure function of (seed, row index) via `xxhash64` — no
  * wall clock, no java.util.Random, no external data — so the same config
  * always produces byte-identical events at any parallelism. This is the
  * engine-side analogue of the reference's system-test producer
  * (system_test/run.py:189-205) which feeds 100 JSON records with known
  * bytes; ours scales by count alone.
  *
  * Knobs: nKeys (distinct (repo, path) pairs), hotPct (fraction of events
  * hitting repo 0 — exercises the salted partitioner), deletePct,
  * partitions P, payload size range.
  */
object ChangeGen {

  /** Generate `nEvents` change events as a DataFrame with the ChangeEvent
    * schema. Offsets are dense and monotonically increasing per partition,
    * starting at `startOffset` (non-zero starts are a ported test case, cf.
    * reference BlockGZIPFileWriterTest.java:66 offset 987654321).
    */
  def changes(
      spark: SparkSession,
      nEvents: Long,
      nKeys: Int = 1000,
      partitions: Int = 4,
      hotPct: Int = 0,          // 0..100: % of events on repo "org-0/repo-0"
      deletePct: Int = 10,      // % of events that are deletes
      seed: Long = 42L,
      startOffset: Long = 0L,
      minLen: Int = 64,
      maxLen: Int = 512): DataFrame = {
    require(maxLen >= minLen && minLen >= 0)
    val r = spark.range(0, nEvents, 1, math.max(4, partitions))
    // independent deterministic hash streams per purpose
    def h(tag: String) = xxhash64(lit(seed), lit(tag), col("id"))
    val keyId = when(pmod(h("hot"), lit(100)) < lit(hotPct), lit(0L))
      .otherwise(pmod(h("key"), lit(nKeys.toLong)))
    val version = pmod(h("ver"), lit(1000000L)) // distinguishes updates of a key
    val isDelete = pmod(h("op"), lit(100)) < lit(deletePct)
    val repo = concat(lit("org-"), pmod(keyId, lit(17)), lit("/repo-"), pmod(keyId, lit(97)))
    val ext = element_at(
      lit(Array("scala", "java", "py", "md", "rs", "go")),
      (pmod(keyId, lit(6)) + 1).cast("int"))
    val path = concat(lit("src/dir"), pmod(keyId, lit(13)), lit("/File"), keyId, lit("."), ext)
    val lang = ext // lang keyed by extension (FIXTURES.md §1)
    // deterministic pseudo-text: md5 stream sliced to a seeded length
    val len = (lit(minLen) + pmod(h("len"), lit((maxLen - minLen + 1).toLong))).cast("int")
    val block = md5(concat(lit(seed), lit(":"), col("id"))) // 32 chars
    val contentFull = concat((0 until (512 / 32 + 1)).map(i => md5(concat(block, lit(i)))): _*)
    val content = substring(contentFull, 1, 512).substr(lit(1), len)
    val commit = substring(sha2(concat(repo, path, version), 256), 1, 40)

    val base = r
      .withColumn("keyId", keyId)
      .withColumn("repo", repo)
      .withColumn("path", path)
      .withColumn("partition", pmod(xxhash64(repo, path), lit(partitions.toLong)).cast("int"))
      .withColumn("op", when(isDelete, lit("delete")).otherwise(lit("upsert")))
      .withColumn("commit", when(isDelete, lit(null: String)).otherwise(commit))
      .withColumn("lang", lang)
      .withColumn("content", when(isDelete, lit(null: String)).otherwise(content))

    // dense per-partition offsets in generation order (= id order), like the
    // reference's per-TopicPartition offset sequence. A window at gen time is
    // fine: generation is test/bench fixture code, not the ingest hot path.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("partition")).orderBy(col("id"))
    base
      .withColumn("offset", row_number().over(w).cast("long") - 1L + lit(startOffset))
      .select("partition", "offset", "op", "repo", "path", "commit", "lang", "content")
  }

  /** The independent oracle for the final lake state (FIXTURES.md §5):
    * last-writer-wins per (repo, path) by (partition, offset), deletes drop
    * the key. Computed in one batch expression over the raw log — never via
    * the engine under test.
    */
  def oracleFinalState(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("repo"), col("path"))
      .orderBy(col("offset").desc, col("partition").desc)
    changes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "upsert")
      .select("repo", "path", "commit", "lang", "content", "partition", "offset")
  }
}
