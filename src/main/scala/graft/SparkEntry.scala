package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers the SURVEY.md §2 operator inventory (cdc_*: the
  * reference's sink/source/format operators re-expressed Spark-first),
  * general relational analytics (ana_*), training-data pipeline operators
  * (txt_* dedup/fingerprint/quality, emb_* similarity, mm_* multimodal),
  * and end-to-end runs of the actual CDC engine (eng_*) whose lake output
  * is checked against an independent DuckDB last-writer-wins oracle.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: last-writer-wins CDC merge
    * state over the portable change-log view. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_lww_state")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.defs ++ AnalyticsQueries.defs ++ TextQueries.defs ++
      EmbeddingQueries.defs ++ EngineQueries.defs ++ MultimodalQueries.defs

  /** For each key in queries, equivalent SQL runnable by DuckDB on
    * the same parquet tables.
    */
  def oracleSql: Map[String, String] =
    CdcQueries.oracles ++ AnalyticsQueries.oracles ++ TextQueries.oracles ++
      EmbeddingQueries.oracles ++ EngineQueries.oracles ++ MultimodalQueries.oracles
}
