package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline text operators over the `documents` table:
  * exact dedup, MinHash signatures, LSH candidate pairs, n-gram Jaccard,
  * SimHash, fingerprinting, token counting, language ID, quality scoring.
  *
  * Everything hash-based uses md5 (portable to the DuckDB oracle); shingles
  * are 3-word n-grams over whitespace tokens. All set ops are per-doc
  * DISTINCT so the math is true set similarity.
  *
  * Scale notes: every operator here is a groupBy/join on hashable keys —
  * no cross joins. The LSH self-join is the scale path for near-dup at
  * 100 TB (candidates per band bucket, never all pairs); the Jaccard join
  * runs only on LSH candidates.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** distinct 3-word shingles per doc: (doc_id, shingle).
    *
    * Dedup is PER DOC (a shingle never repeats across doc_ids here, since
    * doc_id rides every row), so it runs as `array_distinct` on the per-doc
    * shingle array BEFORE the explode — a map-side operation — instead of a
    * row-level `.distinct()`, which was a full (doc_id, shingle) exchange of
    * every shingle string. For the aggregate consumers (minhash min()s) the
    * optimizer used to eliminate that distinct anyway (min is duplicate-
    * insensitive); the MATERIALIZING consumer (txt_ngram_jaccard's staged
    * shingle table) actually paid it — now no consumer shuffles raw
    * shingle text at all (guide §2.3: don't shuffle heavy strings to dedup
    * what a per-row array op can dedup).
    */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, size(w) - 2), " +
          "i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))")))
        .as("shingle"))

  /** Mersenne prime 2^31-1: the modulus of the 2-universal hash family. */
  private val M31 = 2147483647L

  /** (a, b) pairs of the k=8 hash family h_i(x) = (a_i·x + b_i) mod (2^31-1);
    * fixed odd multipliers — the standard MinHash construction over ONE
    * carrier fingerprint per shingle instead of k independent digests
    * (8× less md5 on the dominant stage of the dedup pipeline at 100 TB).
    */
  private val hashFamily = Seq(
    (1103515245L, 12345L), (1299709L, 7919L), (15485863L, 32452843L),
    (982451653L, 104729L), (179424673L, 2038074743L), (32416190071L % M31, 65537L),
    (22801763489L % M31, 179426549L), (1073741827L % M31, 999999937L))

  /** k=8 MinHash signature per doc: carrier h = md5long(shingle) mod 2^31-1,
    * then min over the 2-universal family per doc.
    */
  private def minhashSigFrom(sh: DataFrame): DataFrame = {
    val withH = sh
      .withColumn("h", pmod(graft.functions.Portable.md5Long(col("shingle")), lit(M31)))
    val aggs = hashFamily.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(M31))).as(s"m$i")
    }
    withH.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  private def minhashSig(s: SparkSession, dir: String): DataFrame =
    minhashSigFrom(shingles(s, dir))

  /** Pathological-bucket cap: a band bucket of n docs yields n·(n-1)/2
    * candidate pairs by design, so ONE degenerate bucket (boilerplate text,
    * empty-ish shingle sets colliding) goes quadratic at 100 TB. Buckets
    * larger than this are dropped whole — their members are either spam or
    * still candidate-paired through their other, more selective bands. The
    * constant is interpolated into the DuckDB oracle so the two sides
    * cannot drift.
    */
  private val maxLshBucket = 64

  /** LSH candidate pairs: 4 bands of 2 minhashes each; a pair is a candidate
    * if any band matches. One pass over the signatures (bands unpivoted with
    * a generator, so the expensive shingle+minhash subtree appears ONCE in
    * the plan — a self-join would recompute it per side per band, 8 scans at
    * 100 TB), then pairs generated per band bucket — never all-pairs, and
    * buckets above [[maxLshBucket]] dropped before pair expansion.
    */
  private def lshPairsFrom(sh: DataFrame): DataFrame = {
    val sig = minhashSigFrom(sh)
    // band key packs the band's two 31-bit minhashes into one long (< 2^62)
    val bands = sig.select(col("doc_id"), explode(array(
      (0 until 4).map(b => struct(lit(b).as("band"),
        (col(s"m${2 * b}") * lit(M31) + col(s"m${2 * b + 1}")).as("bkey"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    bands.groupBy(col("band"), col("bkey"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxLshBucket)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS doc_a, y AS doc_b))))"))
        .as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
  }

  private val duckShingles =
    """WITH w AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |  FROM documents
      |  WHERE len(string_split_regex(trim(text), '\s+')) >= 3
      |), sh AS (
      |  SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 1),
      |                i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
      |  FROM w
      |)""".stripMargin

  // oracle built FROM the same hashFamily constants — cannot drift
  private val duckSig = duckShingles +
    s""", sh2 AS (
       |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % $M31 AS h FROM sh
       |), sig AS (
       |  SELECT doc_id,
       |         ${hashFamily.zipWithIndex.map { case ((a, b), i) =>
                    s"min((h * $a + $b) % $M31) AS m$i" }.mkString(",\n       |         ")}
       |  FROM sh2 GROUP BY 1
       |)""".stripMargin

  private val duckBands = duckSig +
    s""", bands AS (
       |  SELECT doc_id, 0 AS band, m0 * $M31 + m1 AS bkey FROM sig
       |  UNION ALL SELECT doc_id, 1, m2 * $M31 + m3 FROM sig
       |  UNION ALL SELECT doc_id, 2, m4 * $M31 + m5 FROM sig
       |  UNION ALL SELECT doc_id, 3, m6 * $M31 + m7 FROM sig
       |), bsz AS (
       |  SELECT band, bkey, count(*) AS c FROM bands GROUP BY 1, 2
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |  JOIN bsz s ON s.band = a.band AND s.bkey = a.bkey
       |  WHERE s.c <= $maxLshBucket
       |)""".stripMargin

  // language-ID keyword table: marker word per language, scored by
  // occurrence count in the padded text; argmax with a fixed tiebreak chain
  private val langMarkers = Seq(
    "en" -> " the ", "es" -> " a ", "de" -> " data ", "fr" -> " key ", "zh" -> " row ")

  private def occurrences(padded: Column, kw: String): Column =
    ((length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(kw), "")))
      / lit(kw.length)).cast("long")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact dedup: content-hash groups, survivor = min doc_id
    "txt_dedup_exact" -> { (s, dir) =>
      docs(s, dir).groupBy(md5(col("text")).as("text_md5"))
        .agg(min(col("doc_id")).as("survivor"), count(lit(1)).as("n_copies"))
    },

    // MinHash signatures (k=8)
    "txt_minhash" -> { (s, dir) => minhashSig(s, dir) },

    // LSH banding: near-dup candidate pairs
    "txt_lsh_pairs" -> { (s, dir) => lshPairsFrom(shingles(s, dir)) },

    // exact n-gram Jaccard on the LSH candidates. The shingle subtree feeds
    // FOUR consumers (minhash, both intersection sides, sizes); Catalyst
    // does not CSE identical subtrees across joins, so stage it once as a
    // parquet temp — at 100 TB this IS the pipeline design (a materialized
    // shingle table), not a workaround.
    "txt_ngram_jaccard" -> { (s, dir) =>
      val stage = Staging.dir(s, "shingles") + "/sh.parquet"
      shingles(s, dir).write.mode("overwrite").parquet(stage)
      val sh = s.read.parquet(stage)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val pairs = lshPairsFrom(sh)
      val inter = pairs
        .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sh.as("sb"), col("doc_b") === col("sb.doc_id")
          && col("sa.shingle") === col("sb.shingle"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
      pairs
        .join(inter, Seq("doc_a", "doc_b"), "left")
        .na.fill(0L, Seq("n_inter"))
        .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
        .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
        .select(col("doc_a"), col("doc_b"), col("n_inter"),
          (col("za.sz") + col("zb.sz") - col("n_inter")).as("n_union"),
          // exact NANO units, not round(x, 9): floor of identical doubles
          // is identical across engines, round-half-up at scale 9 is not
          // (Spark rounds the shortest decimal repr, DuckDB the binary)
          floor(col("n_inter").cast("double")
            / (col("za.sz") + col("zb.sz") - col("n_inter")).cast("double")
            * lit(1e9)).cast("long")
            .as("jaccard_nano"))
    },

    // SimHash (16-bit) over distinct words. Dedup is per doc, so it runs as
    // a map-side array_distinct before the explode instead of a row-level
    // .distinct() — the sum() votes are duplicate-SENSITIVE, so unlike the
    // minhash path the optimizer could never eliminate that exchange itself
    // (it shuffled every word string once just to dedup within doc_id).
    "txt_simhash" -> { (s, dir) =>
      val words = docs(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(split(trim(col("text")), "\\s+"))).as("word"))
      val sign = (j: Int) => when(
        pmod(graft.functions.Portable.md5Long(concat(lit(s"$j#"), col("word"))), lit(2L)) === 0,
        lit(1L)).otherwise(lit(-1L))
      val votes = words.groupBy(col("doc_id"))
        .agg(sum(sign(0)).as("b0"),
          (1 until 16).map(j => sum(sign(j)).as(s"b$j")): _*)
      votes.select(col("doc_id"),
        (0 until 16).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
    },

    // HLL++ sketch surface: approximate distinct tokens per source next to
    // the exact count. A raw sketch estimate can never hash-match a foreign
    // engine, so the GATE row carries (a) the exact columns, DuckDB-oracled,
    // and (b) the sketch as a WITHIN-BOUND verdict: |approx − exact| ≤
    // max(1, 4·rsd·exact) — the same 4× bound SketchSpec pins — which the
    // oracle asserts as literal TRUE. A sketch that drifts out of bound
    // turns the gate red instead of hiding behind a rows-only check.
    "txt_approx_distinct" -> { (s, dir) =>
      docs(s, dir)
        .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("word"))
        .groupBy(col("source"))
        .agg(countDistinct(col("word")).as("exact_distinct"),
          approx_count_distinct(col("word"), 0.01).as("approx"),
          count(lit(1)).as("n_tokens"))
        .select(col("source"), col("exact_distinct"), col("n_tokens"),
          (abs(col("approx") - col("exact_distinct")) <=
            greatest(lit(1L), (col("exact_distinct") * lit(0.04)).cast("long")))
            .as("approx_within_rsd"))
    },

    // document fingerprint: md5 of whitespace-normalized text
    "txt_fingerprint" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fingerprint"))
    },

    // token counting: whitespace tokens + BPE-ish regex tokens
    "txt_token_count" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        expr("size(regexp_extract_all(text, '\\\\S+', 0))").cast("long").as("n_ws_tokens"),
        expr("size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))")
          .cast("long").as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars"))
    },

    // language ID: stopword-marker scores + fixed-order argmax
    "txt_langid" -> { (s, dir) =>
      val padded = concat(lit(" "), lower(col("text")), lit(" "))
      val scored = docs(s, dir).select(
        (col("doc_id") +: langMarkers.map { case (l, kw) =>
          occurrences(padded, kw).as(s"s_$l")
        }): _*)
      // argmax with tiebreak = declaration order (en, es, de, fr, zh)
      val pred = langMarkers.map(_._1).foldRight(lit("und"): Column) { (l, acc) =>
        val isMax = langMarkers.map(_._1).filter(_ != l)
          .map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
        when(col(s"s_$l") > 0 && isMax &&
          langMarkers.map(_._1).takeWhile(_ != l)
            .map(o => col(s"s_$l") > col(s"s_$o")).foldLeft(lit(true): Column)(_ && _),
          lit(l)).otherwise(acc)
      }
      scored.withColumn("predicted", pred)
    },

    // quality scoring: exact integer features + double-of-exact composite
    "txt_quality" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        expr("size(regexp_extract_all(text, '\\\\S+', 0))").cast("long").as("n_tokens"),
        expr("size(regexp_extract_all(text, '[.!?,;:]', 0))").cast("long").as("n_punct"),
        expr("size(regexp_extract_all(concat(' ', lower(text), ' '), " +
          "' (the|a|of|and|to|in) ', 0))").cast("long").as("n_stop"))
        // NANO-unit ratios (floor of identical doubles — see jaccard note).
        // Zero-token docs raise loudly: NaN/Inf floor differently across
        // engines (DuckDB errors on the BIGINT cast, Spark yields 0), so
        // the undefined case must never reach the conversion.
        .withColumn("_tok", when(col("n_tokens") > 0L, col("n_tokens"))
          .otherwise(raise_error(concat(
            lit("quality ratios undefined for zero-token doc "), col("doc_id")))))
        .withColumn("avg_token_len_nano",
          floor(col("n_chars").cast("double") / col("_tok").cast("double")
            * lit(1e9)).cast("long"))
        .withColumn("stop_ratio_nano",
          floor(col("n_stop").cast("double") / col("_tok").cast("double")
            * lit(1e9)).cast("long"))
        .withColumn("quality_score_nano",
          floor((least(col("_tok").cast("double") / lit(100.0), lit(1.0)) * lit(0.5)
            + col("n_stop").cast("double") / col("_tok").cast("double") * lit(2.0))
            * lit(1e9)).cast("long"))
        .drop("_tok")
    })

  val oracles: Map[String, String] = Map(
    "txt_dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS survivor, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    // the within-bound verdict is the oracle-checkable face of the sketch:
    // DuckDB asserts TRUE, Spark computes it — sketch drift fails the gate
    "txt_approx_distinct" ->
      """WITH words AS (
        |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS word
        |  FROM documents
        |)
        |SELECT source, count(DISTINCT word) AS exact_distinct,
        |       count(*) AS n_tokens, TRUE AS approx_within_rsd
        |FROM words GROUP BY 1""".stripMargin,

    "txt_minhash" -> (duckSig + "\nSELECT * FROM sig"),

    "txt_lsh_pairs" -> (duckBands + "\nSELECT doc_a, doc_b FROM pairs"),

    "txt_ngram_jaccard" -> (duckBands +
      """, sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT p.doc_a, p.doc_b, count(*) AS n_inter
        |  FROM pairs p
        |  JOIN sh sa ON sa.doc_id = p.doc_a
        |  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
        |  GROUP BY 1, 2
        |)
        |SELECT p.doc_a, p.doc_b, coalesce(i.n_inter, 0) AS n_inter,
        |       za.sz + zb.sz - coalesce(i.n_inter, 0) AS n_union,
        |       CAST(floor(CAST(coalesce(i.n_inter, 0) AS DOUBLE)
        |             / CAST(za.sz + zb.sz - coalesce(i.n_inter, 0) AS DOUBLE) * 1000000000) AS BIGINT) AS jaccard_nano
        |FROM pairs p
        |LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
        |JOIN sizes za ON za.doc_id = p.doc_a
        |JOIN sizes zb ON zb.doc_id = p.doc_b""".stripMargin),

    "txt_simhash" -> {
      val hexLong = (e: String) => s"('0x' || substr(md5($e), 1, 15))::BIGINT"
      val sums = (0 until 16).map(j =>
        s"sum(CASE WHEN ${hexLong(s"'$j#' || word")} % 2 = 0 THEN 1 ELSE -1 END) AS b$j")
        .mkString(",\n         ")
      val bits = (0 until 16).map(j =>
        s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
      s"""WITH words AS (
         |  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
         |  FROM documents
         |), votes AS (
         |  SELECT doc_id,
         |         $sums
         |  FROM words GROUP BY 1
         |)
         |SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM votes""".stripMargin
    },

    "txt_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents""".stripMargin,

    "txt_token_count" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
        |       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        |       CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents""".stripMargin,

    "txt_langid" -> {
      val score = (kw: String) =>
        s"CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', '$kw', ''))) / ${kw.length} AS BIGINT)"
      val cols = langMarkers.map { case (l, kw) => s"${score(kw)} AS s_$l" }.mkString(",\n       ")
      // same fixed-order argmax chain as the Spark side
      val langs = langMarkers.map(_._1)
      val pred = langs.map { l =>
        val geAll = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
        val gtPrev = langs.takeWhile(_ != l).map(o => s"s_$l > s_$o")
        val cond = (Seq(s"s_$l > 0", geAll) ++ gtPrev).mkString(" AND ")
        s"WHEN $cond THEN '$l'"
      }.mkString("\n              ")
      s"""WITH scored AS (
         |  SELECT doc_id,
         |       $cols
         |  FROM documents
         |)
         |SELECT *, CASE $pred
         |              ELSE 'und' END AS predicted
         |FROM scored""".stripMargin
    },

    "txt_quality" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         CAST(length(text) AS BIGINT) AS n_chars,
        |         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |         CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT) AS n_punct,
        |         CAST(len(regexp_extract_all(' ' || lower(text) || ' ', ' (the|a|of|and|to|in) ')) AS BIGINT) AS n_stop
        |  FROM documents
        |)
        |SELECT doc_id, n_chars, n_tokens, n_punct, n_stop,
        |       CAST(floor(CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1000000000) AS BIGINT) AS avg_token_len_nano,
        |       CAST(floor(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1000000000) AS BIGINT) AS stop_ratio_nano,
        |       CAST(floor((least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
        |             + CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 2.0) * 1000000000) AS BIGINT) AS quality_score_nano
        |FROM f""".stripMargin
  )
}
