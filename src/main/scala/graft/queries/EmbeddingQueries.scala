package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Exactness across engines: float elements are scaled to integers
  * (round(x * 1e6) as BIGINT), so dot products and norms are exact integer
  * arithmetic in both Spark and DuckDB; the final cosine is a double
  * computed from identical integers with identical IEEE ops, then emitted
  * (and ordered, and thresholded) as exact NANO units:
  * `floor(cos * 1e9)` as BIGINT. floor of identical doubles is identical
  * on both engines — unlike `round(x, 9)`, where Spark rounds HALF_UP on
  * the double's shortest decimal REPRESENTATION while DuckDB rounds the
  * binary value, a ~1e-8-per-row cross-engine flip risk that would also
  * make top-k ranks nondeterministic at the 10^10-row design point.
  *
  * Scale path: brute-force top-k is the baseline (fine for a bounded query
  * set — it's one broadcast of the queries against a scan of the corpus);
  * the LSH variant buckets by 8 deterministic hyperplane signs so candidate
  * generation is a bucket-equijoin, never all-pairs.
  */
object EmbeddingQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** vectors as exact scaled integers + precomputed squared norm */
  private def scaled(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("v"))
      .withColumn("norm2", expr("aggregate(transform(v, x -> x * x), 0L, (a, b) -> a + b)"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** exact nano-cosine (see class doc). Zero-norm vectors raise loudly:
    * the division would be NaN, which DuckDB refuses to cast to BIGINT
    * while Spark's floor silently yields 0 — the one input where the
    * "identical doubles" argument breaks, so it must never reach it.
    */
  private def cosNano(d: Column, na: Column, nb: Column): Column =
    when(na > 0L && nb > 0L,
      floor((d.cast("double") /
        (sqrt(na.cast("double")) * sqrt(nb.cast("double")))) * lit(1e9)).cast("long"))
      .otherwise(raise_error(lit(
        "cosNano: zero-norm embedding — cosine undefined; engines disagree on NaN")))

  /** the DuckDB twin of [[cosNano]] over a BIGINT dot product expression */
  private def duckCosNano(dotExpr: String, naExpr: String, nbExpr: String): String =
    s"CAST(floor(CAST($dotExpr AS DOUBLE) / (sqrt(CAST($naExpr AS DOUBLE)) * sqrt(CAST($nbExpr AS DOUBLE))) * 1000000000) AS BIGINT)"

  private def duckDot(qv: String, cv: String): String =
    s"CAST(list_sum(list_transform(range(1, len($qv) + 1), i -> $qv[i] * $cv[i])) AS BIGINT)"

  /** ±1 hyperplane coefficient for (dim i, plane j): parity of
    * md5(s"$i~$j") — the same value Spark's
    * `md5(concat(CAST(i AS STRING), '~', 'j'))` and DuckDB's
    * `md5(CAST(i-1 AS VARCHAR) || '~' || 'j')` derive. The coefficients are
    * constants, so they're computed once here and embedded as array
    * literals instead of being re-derived per row (64 dims × 8 planes =
    * 512 md5 calls per row otherwise — pure waste at 100 TB).
    */
  private def planeSign(i: Int, j: Int): Long =
    if (graft.functions.Md5Long60.compute(s"$i~$j".getBytes("UTF-8")) % 2 == 0) 1L
    else -1L

  /** 8-bit LSH bucket: sign of the dot product with 8 deterministic
    * hyperplanes, whose coefficients are ±1 from md5(dim || '~' || plane).
    */
  private def withBucket(v: DataFrame): DataFrame = {
    // vector length probed once at plan time — the embeddings table is
    // fixed-dimension by contract (a ragged row would null-pad the zip and
    // zero its bits). Empty input keeps a nominal dims so the (empty) plan
    // still builds.
    val dims = v.select(size(col("v"))).head(1).headOption
      .map(_.getInt(0)).getOrElse(1)
    val planeBit = (j: Int) => {
      val signs = typedlit((0 until dims).map(i => planeSign(i, j)))
      val signedSum = aggregate(
        zip_with(col("v"), signs, (x, s) => x * s), lit(0L), (a, b) => a + b)
      when(signedSum > 0, lit(1L << j)).otherwise(lit(0L))
    }
    v.withColumn("bucket", (0 until 8).map(planeBit).reduce(_ + _))
  }

  /** DuckDB: same scaled-int vectors. */
  private val duckScaled =
    """WITH sv AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
      |  FROM embeddings
      |), sn AS (
      |  SELECT vec_id, v,
      |         CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS norm2
      |  FROM sv
      |)""".stripMargin

  private val duckBucket = duckScaled + ",\n" +
    (0 until 8).map { j =>
      s"""p$j AS (
         |  SELECT vec_id,
         |         CASE WHEN CAST(list_sum(list_transform(range(1, len(v) + 1),
         |                i -> CASE WHEN ('0x' || substr(md5(CAST(i - 1 AS VARCHAR) || '~' || '$j'), 1, 15))::BIGINT % 2 = 0
         |                          THEN v[i] ELSE -v[i] END)) AS BIGINT) > 0
         |              THEN ${1L << j} ELSE 0 END AS bit$j
         |  FROM sn
         |)""".stripMargin
    }.mkString(",\n") +
    """,
      |bucketed AS (
      |  SELECT sn.vec_id, sn.v, sn.norm2,
      |         CAST(p0.bit0 + p1.bit1 + p2.bit2 + p3.bit3 + p4.bit4 + p5.bit5 + p6.bit6 + p7.bit7 AS BIGINT) AS bucket
      |  FROM sn
      |  JOIN p0 USING (vec_id) JOIN p1 USING (vec_id) JOIN p2 USING (vec_id)
      |  JOIN p3 USING (vec_id) JOIN p4 USING (vec_id) JOIN p5 USING (vec_id)
      |  JOIN p6 USING (vec_id) JOIN p7 USING (vec_id)
      |)""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // brute-force cosine top-3 for the first 5 query vectors
    "emb_cosine_topk" -> { (s, dir) =>
      val all = scaled(s, dir)
      val q = all.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm2").as("qn"))
      val joined = broadcast(q).crossJoin(
        all.select(col("vec_id").as("cid"), col("v").as("cv"), col("norm2").as("cn")))
        .filter(col("qid") =!= col("cid"))
        .withColumn("cos_nano", cosNano(dot(col("qv"), col("cv")), col("qn"), col("cn")))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos_nano").desc, col("cid"))
      joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("qid"), col("rank"), col("cid"), col("cos_nano"))
    },

    // LSH bucket histogram (the partition layout of the ANN index)
    "emb_lsh_buckets" -> { (s, dir) =>
      withBucket(scaled(s, dir))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("vec_id")).as("min_vec"),
          max(col("vec_id")).as("max_vec"))
    },

    // ANN: nearest in-bucket neighbor per query vector (bucket-equijoin,
    // never all-pairs — the 100 TB candidate-generation path)
    "emb_lsh_ann" -> { (s, dir) =>
      val b = withBucket(scaled(s, dir))
      val q = b.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("norm2").as("qn"), col("bucket"))
      val c = b.select(col("vec_id").as("cid"), col("v").as("cv"),
        col("norm2").as("cn"), col("bucket"))
      val joined = q.join(c, Seq("bucket")).filter(col("qid") =!= col("cid"))
        .withColumn("cos_nano", cosNano(dot(col("qv"), col("cv")), col("qn"), col("cn")))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos_nano").desc, col("cid"))
      joined.withColumn("rank", row_number().over(w)).filter(col("rank") === 1)
        .select(col("qid"), col("bucket"), col("cid"), col("cos_nano"))
    },

    // embedding near-dup pairs within buckets above a cosine floor — the
    // threshold compares EXACT nano integers, so membership cannot flip
    // between engines
    "emb_neardup" -> { (s, dir) =>
      val b = withBucket(scaled(s, dir))
      val l = b.select(col("vec_id").as("ida"), col("v").as("va"),
        col("norm2").as("na"), col("bucket"))
      val r = b.select(col("vec_id").as("idb"), col("v").as("vb"),
        col("norm2").as("nb"), col("bucket"))
      l.join(r, Seq("bucket")).filter(col("ida") < col("idb"))
        .withColumn("cos_nano", cosNano(dot(col("va"), col("vb")), col("na"), col("nb")))
        .filter(col("cos_nano") >= 300000000L)
        .select(col("ida"), col("idb"), col("bucket"), col("cos_nano"))
    },

    // IVF ANN: assign every vector to its nearest of 4 deterministic
    // centroids (broadcast nested-loop over k centroids — k is tiny, the
    // corpus scan is the big side), then search only within the query's
    // cell. The inverted-file counterpart of the LSH path: candidate
    // generation is a cell-equijoin, never all-pairs.
    "emb_ivf_topk" -> { (s, dir) =>
      val all = scaled(s, dir)
      val cents = all.filter(col("vec_id") < 4)
        .select(col("vec_id").as("cent_id"), col("v").as("cvv"), col("norm2").as("cnn"))
      val assigned = all.crossJoin(broadcast(cents))
        .withColumn("cos_c", cosNano(dot(col("v"), col("cvv")), col("norm2"), col("cnn")))
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))
      val cells = assigned.withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("norm2"), col("cent_id").as("cell"))
      val q = cells.filter(col("vec_id") >= 5 && col("vec_id") < 15)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("norm2").as("qn"), col("cell"))
      val c = cells.select(col("vec_id").as("cid"), col("v").as("cv"),
        col("norm2").as("cn"), col("cell"))
      val joined = q.join(c, Seq("cell")).filter(col("qid") =!= col("cid"))
        .withColumn("cos_nano", cosNano(dot(col("qv"), col("cv")), col("qn"), col("cn")))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos_nano").desc, col("cid"))
      joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("qid"), col("cell"), col("rank"), col("cid"), col("cos_nano"))
    })

  val oracles: Map[String, String] = Map(
    "emb_cosine_topk" -> (duckScaled +
      s""", q AS (SELECT vec_id AS qid, v AS qv, norm2 AS qn FROM sn WHERE vec_id < 5),
        |scoredq AS (
        |  SELECT q.qid, c.vec_id AS cid,
        |         ${duckCosNano(duckDot("q.qv", "c.v"), "q.qn", "c.norm2")} AS cos_nano
        |  FROM q, sn c WHERE q.qid <> c.vec_id
        |)
        |SELECT qid, rank, cid, cos_nano FROM (
        |  SELECT qid, cid, cos_nano,
        |         row_number() OVER (PARTITION BY qid ORDER BY cos_nano DESC, cid) AS rank
        |  FROM scoredq) t
        |WHERE rank <= 3""".stripMargin),

    "emb_lsh_buckets" -> (duckBucket +
      """
        |SELECT bucket, count(*) AS n, min(vec_id) AS min_vec, max(vec_id) AS max_vec
        |FROM bucketed GROUP BY 1""".stripMargin),

    "emb_lsh_ann" -> (duckBucket +
      s""", q AS (SELECT vec_id AS qid, v AS qv, norm2 AS qn, bucket FROM bucketed WHERE vec_id < 20),
        |scoredq AS (
        |  SELECT q.qid, q.bucket, c.vec_id AS cid,
        |         ${duckCosNano(duckDot("q.qv", "c.v"), "q.qn", "c.norm2")} AS cos_nano
        |  FROM q JOIN bucketed c ON q.bucket = c.bucket AND q.qid <> c.vec_id
        |)
        |SELECT qid, bucket, cid, cos_nano FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_nano DESC, cid) AS rank
        |  FROM scoredq) t
        |WHERE rank = 1""".stripMargin),

    "emb_ivf_topk" -> (duckScaled +
      s""", cents AS (SELECT vec_id AS cent_id, v AS cvv, norm2 AS cnn FROM sn WHERE vec_id < 4),
        |assigned AS (
        |  SELECT sn.vec_id, sn.v, sn.norm2, c.cent_id,
        |         ${duckCosNano(duckDot("sn.v", "c.cvv"), "sn.norm2", "c.cnn")} AS cos_c
        |  FROM sn, cents c
        |), cells AS (
        |  SELECT vec_id, v, norm2, cent_id AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cent_id) AS rn
        |    FROM assigned) t
        |  WHERE rn = 1
        |), q AS (SELECT vec_id AS qid, v AS qv, norm2 AS qn, cell FROM cells WHERE vec_id >= 5 AND vec_id < 15),
        |scoredq AS (
        |  SELECT q.qid, q.cell, c.vec_id AS cid,
        |         ${duckCosNano(duckDot("q.qv", "c.v"), "q.qn", "c.norm2")} AS cos_nano
        |  FROM q JOIN cells c ON q.cell = c.cell AND q.qid <> c.vec_id
        |)
        |SELECT qid, cell, rank, cid, cos_nano FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_nano DESC, cid) AS rank
        |  FROM scoredq) t
        |WHERE rank <= 3""".stripMargin),

    "emb_neardup" -> (duckBucket +
      s"""
        |SELECT * FROM (
        |  SELECT a.vec_id AS ida, b.vec_id AS idb, a.bucket,
        |         ${duckCosNano(duckDot("a.v", "b.v"), "a.norm2", "b.norm2")} AS cos_nano
        |  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |) t WHERE cos_nano >= 300000000""".stripMargin)
  )
}
