package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics over the TPC-H-ish tables — the generic scan /
  * filter / aggregate / join / window / top-k surface, written the way the
  * plans should look at 100 TB: filters and projections pushed to the
  * parquet scan, dimension joins broadcast, doubles aggregated exactly
  * (order-independent, so the DuckDB cross-check can't be broken by
  * summation order), top-k fully tie-broken.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** exact money: double -> decimal(18,6) before any aggregation */
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")

  /** Exact money emitted engine-portably: micro-units as BIGINT. Gate
    * outputs never carry DECIMAL columns — different readers disagree on
    * decimal representation (Decimal object vs float64), which fails the
    * driver's value hash even when the numbers are identical; int64 has one
    * representation everywhere. The conversion is exact: no money/value
    * column in the testdata has a nonzero digit past 6 decimal places
    * (verified at sf0.001/0.01/0.1), so the decimal(25,6) round-trip and the
    * *1e6 scaling introduce no rounding on either engine.
    *
    * That data property is GUARDED, not assumed: a value that does not
    * round-trip decimal(25,6) → double exactly would be rounded, and Spark
    * (HALF_UP on the shortest double repr) and DuckDB's double→decimal
    * conversion may round differently — the gate would then hash-mismatch
    * silently at whatever scale factor first grows such a value. Instead,
    * raise_error fires loudly at Verify time. Cost: one extra cast +
    * comparison per row, branch-free in codegen.
    */
  private def micro(c: org.apache.spark.sql.Column) = {
    val d = c.cast("decimal(25,6)")
    // `d.isNotNull` distinguishes decimal overflow (cast yields null) and
    // NaN from the rounding case; the magnitude bound catches the band
    // where the decimal fits but ×1e6 overflows Long (whose cast yields a
    // silent null under non-ANSI semantics) — all three fail loudly
    when(c.isNull ||
        (d.isNotNull && d.cast("double") === c && abs(c) < lit(9.2233e12)),
        (d * lit(1000000)).cast("long"))
      .otherwise(raise_error(concat(
        lit("micro(): value not exactly representable as micro-unit int64 "),
        lit("(rounds past 6 decimal places — engines may round differently "),
        lit("— overflows the Long micro range, or is not finite): "),
        c.cast("string"))))
  }

  /** the matching DuckDB expression (kept textually adjacent so the two
    * sides can't drift) */
  private def duckMicro(e: String): String =
    s"CAST(CAST($e AS DECIMAL(25,6)) * 1000000 AS BIGINT)"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1 shape: scan + pushed filter + hash aggregate
    "ana_pricing_summary" -> { (s, dir) =>
      // to_timestamp evaluates in the UTC session timezone; a
      // java.sql.Timestamp literal would resolve in the JVM default TZ and
      // silently shift the boundary rows relative to the DuckDB oracle
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(micro(col("l_quantity"))).as("sum_qty_micro"),
          sum(micro(col("l_extendedprice"))).as("sum_base_price_micro"),
          sum(micro(dec(col("l_extendedprice"))
            * (lit(1).cast("decimal(18,6)") - dec(col("l_discount")))))
            .as("sum_disc_price_micro"),
          count(lit(1)).as("count_order"))
    },

    // star join: fact ⋈ broadcast dims, revenue per region
    "ana_region_revenue" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sum(micro(col("o_totalprice"))).as("revenue_micro"),
          count(lit(1)).as("n_orders"))
    },

    // top-k with full tiebreak (rank, then key) — never a bare LIMIT, and
    // never a global window either: orderBy(...).limit(k) compiles to
    // TakeOrderedAndProject (per-partition heap + driver merge of k rows),
    // so only the k survivors are ranked. A Window.orderBy with no partition
    // would move EVERY aggregated customer row to one partition — the
    // classic 100 TB scale-killer. The rank window over the k survivors is
    // partitioned by a constant-valued but NON-FOLDABLE key (pmod(key, 1)):
    // a lit() would be constant-folded out of the partition spec, putting
    // WindowExec back on its everything-to-one-partition path.
    "ana_top_customers" -> { (s, dir) =>
      val byCust = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(micro(col("o_totalprice"))).as("total_micro"),
          count(lit(1)).as("n_orders"))
      val top = byCust.orderBy(col("total_micro").desc, col("o_custkey")).limit(10)
      val w = Window.partitionBy(pmod(col("o_custkey"), lit(1L)))
        .orderBy(col("total_micro").desc, col("o_custkey"))
      top.withColumn("rank", row_number().over(w).cast("long"))
        .select(col("rank"), col("o_custkey"), col("total_micro"),
          col("n_orders"))
    },

    // as-of join: each purchase matched to the user's most recent view at or
    // before it. Composed from existing ops (SURVEY §2.7 preference (a)):
    // tag the reference rows, one running MAX over a per-user ordered window
    // of a zero-padded (ts_us, event_id) string key — lexicographic order ==
    // numeric order, so the max in the preceding frame IS the as-of match.
    // One shuffle on user_id, no join at all — the 100 TB shape (a real
    // as-of equijoin would shuffle both sides on the same key anyway, plus
    // a per-key merge).
    "ana_asof_join" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          col("event_type"), unix_micros(col("ts").cast("timestamp")).as("us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev
        // GUARD the padded-key contract: lexicographic == numeric only while
        // event_id fits 12 digits and ts is post-epoch. Past either cap the
        // key ordering silently inverts — and the DuckDB oracle shares the
        // formula, so the gate could never catch it (a correlated-oracle
        // blind spot). Same pattern as micro(): loud beats silently wrong.
        .withColumn("us", when(col("us") >= 0L && col("event_id") < 1000000000000L,
          col("us")).otherwise(raise_error(concat(
            lit("asof key caps exceeded (event_id >= 1e12 or pre-epoch ts): "),
            col("event_id").cast("string"), lit(" @ "), col("us").cast("string")))))
        .withColumn("view_key",
          when(col("event_type") === "view",
            format_string("%020d#%012d", col("us"), col("event_id"))))
        .withColumn("asof", max(col("view_key")).over(w))
        .filter(col("event_type") === "purchase" && col("asof").isNotNull)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          substring(col("asof"), 22, 12).cast("long").as("view_id"),
          (col("us") - substring(col("asof"), 1, 20).cast("long")).as("gap_us"))
    },

    // explicit two-phase salted aggregation (hot-key defence made visible;
    // result provably equals the plain groupBy the oracle runs)
    "ana_salted_agg" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val salted = ev.withColumn("_salt", pmod(col("event_id"), lit(8L)))
        .groupBy(col("user_id"), col("_salt"))
        .agg(count(lit(1)).as("pn"), sum(micro(col("value"))).as("pv"))
      salted.groupBy(col("user_id"))
        .agg(sum(col("pn")).as("n"), sum(col("pv")).as("total_value_micro"))
    },

    // sessionization: event-time gaps > 30 min start a new session (lag window)
    "ana_sessionize" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
    },

    // rollup / grouping sets: revenue at (status, priority), (status), ()
    // levels in one pass — partial aggregation handles all levels map-side
    "ana_rollup" -> { (s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(micro(col("o_totalprice"))).as("revenue_micro"),
          count(lit(1)).as("n"),
          grouping_id(col("o_orderstatus"), col("o_orderpriority"))
            .cast("int").as("lvl"))
    },

    // anti/semi join surface: customers with and without orders
    "ana_customer_activity" -> { (s, dir) =>
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val active = customer.join(orders, customer("c_custkey") === orders("o_custkey"),
        "left_semi").select(lit("active").as("status"), col("c_custkey"))
      val inactive = customer.join(orders, customer("c_custkey") === orders("o_custkey"),
        "left_anti").select(lit("inactive").as("status"), col("c_custkey"))
      active.unionAll(inactive).groupBy(col("status"))
        .agg(count(lit(1)).as("n"), min(col("c_custkey")).as("min_key"),
          max(col("c_custkey")).as("max_key"))
    })

  val oracles: Map[String, String] = Map(
    "ana_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
        |         CASE WHEN event_type = 'view'
        |              THEN printf('%020d#%012d', epoch_us(ts), event_id) END AS view_key
        |  FROM events
        |), m AS (
        |  SELECT *, max(view_key) OVER (PARTITION BY user_id ORDER BY us, event_id
        |             ROWS UNBOUNDED PRECEDING) AS asof_key
        |  FROM e
        |)
        |SELECT event_id AS purchase_id, user_id,
        |       CAST(substr(asof_key, 22, 12) AS BIGINT) AS view_id,
        |       us - CAST(substr(asof_key, 1, 20) AS BIGINT) AS gap_us
        |FROM m WHERE event_type = 'purchase' AND asof_key IS NOT NULL""".stripMargin,

    "ana_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         |       CAST(sum(${duckMicro("o_totalprice")}) AS BIGINT) AS revenue_micro,
         |       count(*) AS n,
         |       CAST(grouping(o_orderstatus, o_orderpriority) AS INT) AS lvl
         |FROM orders
         |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,

    "ana_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(sum(${duckMicro("l_quantity")}) AS BIGINT) AS sum_qty_micro,
         |       CAST(sum(${duckMicro("l_extendedprice")}) AS BIGINT) AS sum_base_price_micro,
         |       CAST(sum(${duckMicro("CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))")}) AS BIGINT) AS sum_disc_price_micro,
         |       count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY 1, 2""".stripMargin,

    "ana_region_revenue" ->
      s"""SELECT r_name,
         |       CAST(sum(${duckMicro("o_totalprice")}) AS BIGINT) AS revenue_micro,
         |       count(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1""".stripMargin,

    "ana_top_customers" ->
      s"""SELECT row_number() OVER (ORDER BY total_micro DESC, o_custkey) AS rank,
         |       o_custkey, total_micro, n_orders
         |FROM (SELECT o_custkey, CAST(sum(${duckMicro("o_totalprice")}) AS BIGINT) AS total_micro,
         |             count(*) AS n_orders
         |      FROM orders GROUP BY 1) t
         |QUALIFY rank <= 10""".stripMargin,

    "ana_salted_agg" ->
      s"""SELECT user_id, count(*) AS n,
         |       CAST(sum(${duckMicro("value")}) AS BIGINT) AS total_value_micro
         |FROM events GROUP BY 1""".stripMargin,

    "ana_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |)
        |SELECT user_id,
        |       CAST(sum(CASE WHEN prev_ts IS NULL
        |                      OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM g GROUP BY 1""".stripMargin,

    "ana_customer_activity" ->
      """WITH s AS (
        |  SELECT CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |              THEN 'active' ELSE 'inactive' END AS status, c_custkey
        |  FROM customer
        |)
        |SELECT status, count(*) AS n, min(c_custkey) AS min_key, max(c_custkey) AS max_key
        |FROM s GROUP BY 1""".stripMargin
  )
}
