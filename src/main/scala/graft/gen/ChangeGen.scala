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
  * Layout is arithmetic, not windowed — `partition = id % P`,
  * `offset = id / P` — so generation is embarrassingly parallel with zero
  * shuffles (the original windowed design was the generator's own
  * bottleneck). Keys are partition-local (the path embeds the partition),
  * exactly like Kafka keys hashing to one partition: per-key event order is
  * total within its partition.
  *
  * Knobs: nKeys (TOTAL distinct keys, dealt across partitions), hotPct (fraction of events on
  * the hot repo `org-0/repo-0` — exercises skew handling), deletePct,
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
    require(partitions >= 1, "need at least one partition")
    // nKeys is the TOTAL distinct-key budget, dealt evenly across partitions
    val keysPerPartition = math.max(1, nKeys / partitions)
    // slice count follows cluster cores, not the logical partition count:
    // every column is a pure function of id, so range-slice parallelism is
    // free — tying it to `partitions` (often 4) would generate 10^9 rows on
    // 4 tasks
    val r = spark.range(0, nEvents, 1,
      math.max(spark.sparkContext.defaultParallelism, partitions))
    // independent deterministic hash streams per purpose
    def h(tag: String) = xxhash64(lit(seed), lit(tag), col("id"))
    val partitionCol = pmod(col("id"), lit(partitions.toLong)).cast("int")
    // integral div, not double Divide: `/` coerces to double and loses
    // integer precision past 2^53 ids (the same trap Chunker documents)
    val offsetCol =
      call_function("div", col("id"), lit(partitions.toLong)) + lit(startOffset)
    val isHot = pmod(h("hot"), lit(100)) < lit(hotPct)
    val keyId = pmod(h("key"), lit(keysPerPartition.toLong))
    val isDelete = pmod(h("op"), lit(100)) < lit(deletePct)
    // keys are partition-local: the hot repo has one hot path per partition
    // (same repo — the skew target — per-key order still total per partition)
    val repo = when(isHot, lit("org-0/repo-0"))
      .otherwise(concat(lit("org-"), pmod(keyId, lit(17)), lit("/repo-"), pmod(keyId, lit(97))))
    val ext = element_at(
      lit(Array("scala", "java", "py", "md", "rs", "go")),
      (pmod(keyId, lit(6)) + 1).cast("int"))
    val path = when(isHot, concat(lit("hot/File"), partitionCol, lit(".md")))
      .otherwise(concat(lit("src/dir"), partitionCol, lit("/File"), keyId, lit("."), ext))
    val lang = when(isHot, lit("md")).otherwise(ext) // lang keyed by extension
    // deterministic pseudo-text: 2 md5 blocks (64 chars) tiled to cover any
    // seeded length up to maxLen (the repeat count derives from maxLen —
    // a fixed count would silently cap large payloads)
    val len = (lit(minLen) + pmod(h("len"), lit((maxLen - minLen + 1).toLong))).cast("int")
    val block = concat(md5(concat(lit(seed), lit(":"), col("id"))),
      md5(concat(lit(seed), lit(";"), col("id"))))
    val content = repeat(block, maxLen / 64 + 1).substr(lit(1), len)
    val version = pmod(h("ver"), lit(1000000L))
    val commit = substring(sha2(concat(repo, path, version), 256), 1, 40)

    r.select(
      partitionCol.as("partition"),
      offsetCol.as("offset"),
      when(isDelete, lit("delete")).otherwise(lit("upsert")).as("op"),
      repo.as("repo"),
      path.as("path"),
      when(isDelete, lit(null: String)).otherwise(commit).as("commit"),
      lang.as("lang"),
      when(isDelete, lit(null: String)).otherwise(content).as("content"))
  }

  /** The independent oracle for the final lake state (FIXTURES.md §5):
    * last-writer-wins per (repo, path) by offset, deletes drop the key.
    * Computed in one batch expression over the raw log — never via the
    * engine under test.
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
