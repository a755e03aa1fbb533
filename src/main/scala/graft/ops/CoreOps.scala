package graft.ops

import graft.{F, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators (SURVEY.md §2 #1-5, #15-19).
  *
  * These re-express the reference's SQL surface — scan/filter/aggregate,
  * fact⋈dim joins, exists/not-exists universe filters, multi-granularity
  * rollups, and min/max listing windows (reference:
  * app/src/crypto_data_pipeline_duckdb.py:294-312, 968-972, 1227-1243) —
  * as declarative DataFrame plans. Dims are broadcast; the fact side keeps
  * a single shuffle per aggregation key; every filter/projection reaches
  * the parquet scan via Catalyst pushdown.
  */
object CoreOps {
  type Q = (SparkSession, String) => DataFrame
  import Tables.t
  import F._

  /** #1 scan → filter → groupBy multi-aggregate (kline-rollup shape). */
  private val q01: Q = (s, dir) => {
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r4(sum(col("l_quantity"))).as("sum_qty"),
        r4(sum(col("l_extendedprice"))).as("sum_base_price"),
        r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
        r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("sum_charge"),
        r6(avg(col("l_quantity"))).as("avg_qty"),
        r6(avg(col("l_extendedprice"))).as("avg_price"),
        r6(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 4) AS sum_charge,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_extendedprice), 6) AS avg_price,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1999-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** #2 five-way fact⋈dims join + aggregate; dims broadcast. */
  private val q02: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val o  = t(s, dir, "orders")
    val c  = t(s, dir, "customer")
    val n  = broadcast(t(s, dir, "nation"))
    val r  = broadcast(t(s, dir, "region"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  private val q02Sql =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** #3 join + aggregate + top-N (ORDER BY/LIMIT), reference-style "latest
    * extremes first, head(10)" shape. */
  private val q03: Q = (s, dir) => {
    val c  = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o  = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
      .select(col("l_orderkey"), epochMs(col("o_orderdate")).as("o_orderdate_ms"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q03Sql =
    """SELECT l_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** #4 anti join (NOT EXISTS): customers with no urgent order. */
  private val q04: Q = (s, dir) => {
    val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    t(s, dir, "customer")
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_custkey")
  }

  private val q04Sql =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** #5 semi join (EXISTS): orders having a high-discount line. */
  private val q05: Q = (s, dir) => {
    val disc = t(s, dir, "lineitem").filter(col("l_discount") > lit(0.08))
    t(s, dir, "orders")
      .join(disc, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  private val q05Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
      |ORDER BY o_orderkey""".stripMargin

  /** #15 epoch/interval time ops: range clamp + day buckets (reference
    * clamps fetch ranges to [list_date, delist_date] the same way,
    * crypto_data_pipeline_duckdb.py:236-268). */
  private val q15: Q = (s, dir) => {
    t(s, dir, "events")
      .filter(col("ts") >= lit("2024-01-05").cast("timestamp") &&
        col("ts") < lit("2024-01-20").cast("timestamp"))
      .groupBy(epochMs(date_trunc("day", col("ts"))).as("day_ms"), col("event_type"))
      .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("total"))
      .orderBy("day_ms", "event_type")
  }

  private val q15Sql =
    """SELECT epoch_ms(date_trunc('day', ts)) AS day_ms, event_type,
      |  count(*) AS n, round(sum(value), 4) AS total
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-20'
      |GROUP BY 1, 2
      |ORDER BY day_ms, event_type""".stripMargin

  /** #16 window rank: top-3 orders per customer. */
  private val q16: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
      .orderBy("o_custkey", "rnk")
  }

  private val q16Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
      |  FROM orders)
      |WHERE rnk <= 3
      |ORDER BY o_custkey, rnk""".stripMargin

  /** #17 multi-granularity rollup — the reference updates per-minute,
    * per-2h and per-day tables separately; ROLLUP produces all
    * granularities in one shuffle. */
  private val q17: Q = (s, dir) => {
    t(s, dir, "events")
      .select(col("event_type"), epochMs(date_trunc("day", col("ts"))).as("day_ms"), col("value"))
      .rollup(col("event_type"), col("day_ms"))
      .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("total"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day_ms"), lit(-1L)).as("day_ms"), col("n"), col("total"))
      .orderBy("event_type", "day_ms")
  }

  private val q17Sql =
    """SELECT coalesce(event_type, 'ALL') AS event_type,
      |  coalesce(day_ms, -1) AS day_ms, n, total
      |FROM (
      |  SELECT event_type, day_ms, count(*) AS n, round(sum(value), 4) AS total
      |  FROM (SELECT event_type, epoch_ms(date_trunc('day', ts)) AS day_ms, value FROM events)
      |  GROUP BY ROLLUP (event_type, day_ms))
      |ORDER BY event_type, day_ms""".stripMargin

  /** #18 pivot via conditional aggregation: wide per-user metrics. */
  private val q18: Q = (s, dir) => {
    val e = t(s, dir, "events")
    def cnt(et: String) = sum(when(col("event_type") === et, 1L).otherwise(0L))
    def value(et: String) = r4(sum(when(col("event_type") === et, col("value")).otherwise(0.0)))
    e.groupBy(col("user_id"))
      .agg(
        cnt("click").as("n_click"), cnt("view").as("n_view"),
        cnt("purchase").as("n_purchase"), cnt("signup").as("n_signup"),
        cnt("error").as("n_error"), value("purchase").as("purchase_value"),
        value("view").as("view_value"))
      .orderBy("user_id")
  }

  private val q18Sql =
    """SELECT user_id,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      |  round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 4) AS purchase_value,
      |  round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0.0 END), 4) AS view_value
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** #19 min/max listing windows joined to a dim — the reference derives
    * per-asset [list_date, delist_date] exactly this way
    * (crypto_data_pipeline_duckdb.py:294-312). */
  private val q19: Q = (s, dir) => {
    val w = t(s, dir, "events").groupBy(col("user_id"))
      .agg(epochMs(min(col("ts"))).as("first_ms"), epochMs(max(col("ts"))).as("last_ms"),
        count(lit(1)).as("n_events"))
    t(s, dir, "customer")
      .join(w, pmod(col("c_custkey"), lit(150L)) === col("user_id"))
      .select(col("c_custkey"), col("c_name"), col("user_id"), col("first_ms"),
        col("last_ms"), col("n_events"))
      .orderBy("c_custkey")
  }

  private val q19Sql =
    """SELECT c_custkey, c_name, user_id, first_ms, last_ms, n_events
      |FROM customer
      |JOIN (
      |  SELECT user_id, epoch_ms(min(ts)) AS first_ms, epoch_ms(max(ts)) AS last_ms,
      |    count(*) AS n_events
      |  FROM events GROUP BY user_id) w
      |ON (c_custkey % 150) = user_id
      |ORDER BY c_custkey""".stripMargin

  /** #19b distribution summary: exact linear-interpolation percentiles
    * (p50/p95/p99) of extended price per (returnflag, linestatus) —
    * the distribution profile an ingest-quality monitor keys on. Exact
    * `percentile` sorts within each group (both engines define index =
    * p·(n−1) with linear interpolation, so values match bit-for-bit);
    * at 100 TB swap in `approx_percentile` (KLL/GK sketch, mergeable,
    * one pass, no per-group sort) — the spec pins the approx path to
    * the exact one within its error bound. */
  private val q20: Q = (s, dir) => {
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        // one percentile buffer per group serving all three quantiles —
        // three scalar percentile() calls triple the sort/merge work
        expr("percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D))").as("ps"))
      .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
        r6(col("ps").getItem(0)).as("p50"),
        r6(col("ps").getItem(1)).as("p95"),
        r6(col("ps").getItem(2)).as("p99"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q20Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
      |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
      |  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Percentile winsorization of ANY numeric column per key (public
    * operator behind [[graft.Graft.winsorize]]) — the outlier-clipping
    * scrub a numeric feature pipeline runs before training: per-key
    * exact linear-interpolation percentiles at `lo`/`hi` (the q20
    * machinery), values clamped into [p_lo, p_hi], a `clip` flag
    * (−1/0/1) marking which tail a row came from. Appends
    * `winsorized` + `clip`. The percentile table is key-cardinality-
    * sized and BROADCASTS back onto the fact scan — one agg shuffle,
    * no second fact-side shuffle. `approx = true` IS the 100 TB path
    * (not just documentation): `approx_percentile` with `accuracy`
    * (mergeable KLL-style sketch, one pass, no per-group sort, rank
    * error ≤ n/accuracy) — the clip semantics are unchanged and
    * a06_winsorize_approx measures the realized divergence. */
  def winsorizeOf(df: DataFrame, key: String, value: String,
                  lo: Double, hi: Double, approx: Boolean = false,
                  accuracy: Int = 10000): DataFrame = {
    require(0 <= lo && lo < hi && hi <= 1, s"need 0 <= lo < hi <= 1, got lo=$lo hi=$hi")
    require(accuracy >= 1, s"accuracy must be >= 1, got $accuracy")
    val pctExpr =
      if (approx) s"approx_percentile($value, array(${lo}D, ${hi}D), $accuracy)"
      else s"percentile($value, array(${lo}D, ${hi}D))"
    val pct = df.groupBy(col(key))
      .agg(expr(pctExpr).as("__ps"))
      .select(col(key), col("__ps").getItem(0).as("__plo"),
        col("__ps").getItem(1).as("__phi"))
    df.join(broadcast(pct), Seq(key))
      .withColumn("winsorized",
        when(col(value) < col("__plo"), col("__plo"))
          .when(col(value) > col("__phi"), col("__phi"))
          .otherwise(col(value)))
      .withColumn("clip",
        when(col(value) < col("__plo"), -1)
          .when(col(value) > col("__phi"), 1)
          .otherwise(0))
      .drop("__plo", "__phi")
  }

  /** #19j winsorize events.value per series at [p1, p99] — the
    * outlier-clipping pass as a gate query; the replaced values are
    * the interpolated percentiles themselves, so parity rides q20's
    * proven percentile agreement. */
  private val q47: Q = (s, dir) =>
    winsorizeOf(t(s, dir, "events"), "event_type", "value", lo = 0.01, hi = 0.99)
      .select(col("event_type"), col("event_id"), epochMs(col("ts")).as("ts_ms"),
        col("value"), r6(col("winsorized")).as("winsorized"), col("clip"))
      .orderBy("event_type", "ts_ms", "event_id")

  private val q47Sql =
    """WITH p AS (
      |  SELECT event_type,
      |    quantile_cont(value, 0.01) AS plo,
      |    quantile_cont(value, 0.99) AS phi
      |  FROM events GROUP BY event_type)
      |SELECT e.event_type, e.event_id, epoch_ms(e.ts) AS ts_ms, e.value,
      |  round(CASE WHEN e.value < plo THEN plo
      |    WHEN e.value > phi THEN phi ELSE e.value END, 6) AS winsorized,
      |  CASE WHEN e.value < plo THEN -1
      |    WHEN e.value > phi THEN 1 ELSE 0 END AS clip
      |FROM events e JOIN p USING (event_type)
      |ORDER BY event_type, ts_ms, event_id""".stripMargin

  /** MAD-based robust outlier detection per key (public operator
    * behind [[graft.Graft.madOutliers]]) — [[winsorizeOf]]'s robust
    * sibling: med = exact median, mad = median(|x − med|), and a row
    * is an outlier when |x − med| > k·1.4826·mad (1.4826 scales MAD
    * to σ under normality — the standard robust z-score). Unlike
    * mean/σ rules the thresholds themselves cannot be dragged by the
    * outliers they hunt. Appends `med`, `mad`, `robust_z`,
    * `is_outlier`. A zero MAD (> half the key's rows identical)
    * degenerates the z — then ANY deviation from the median flags,
    * and `robust_z` is null. Two key-sized percentile aggs (the q20
    * machinery), both BROADCAST back; the fact side is scanned twice
    * and never shuffled on a non-key. At 100 TB swap in
    * `approx_percentile` (q20's documented trade). */
  def madOutliersOf(df: DataFrame, key: String, value: String,
                    k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val med = df.groupBy(col(key))
      .agg(expr(s"percentile($value, 0.5D)").as("__med"))
    val dev = df.join(broadcast(med), Seq(key))
      .withColumn("__absdev", abs(col(value) - col("__med")))
    val mad = dev.groupBy(col(key))
      .agg(expr("percentile(__absdev, 0.5D)").as("__mad"))
    val cut = (lit(k) * lit(1.4826)) * col("__mad")
    dev.join(broadcast(mad), Seq(key))
      .withColumn("med", col("__med"))
      .withColumn("mad", col("__mad"))
      .withColumn("robust_z",
        when(col("__mad") > 0.0, col("__absdev") / (lit(1.4826) * col("__mad"))))
      .withColumn("is_outlier",
        when(col("__mad") > 0.0, col("__absdev") > cut)
          .otherwise(col(value) =!= col("__med")))
      .drop("__med", "__mad", "__absdev")
  }

  /** #19l MAD outliers over events.value per series at k = 3 — the
    * robust anomaly flags next to q47's percentile clamp; both
    * medians ride q20's proven exact-interp percentile parity. */
  private val q48: Q = (s, dir) =>
    madOutliersOf(t(s, dir, "events"), "event_type", "value", k = 3.0)
      .select(col("event_type"), col("event_id"), epochMs(col("ts")).as("ts_ms"),
        col("value"), r6(col("med")).as("med"), r6(col("mad")).as("mad"),
        r6(col("robust_z")).as("robust_z"), col("is_outlier"))
      .orderBy("event_type", "ts_ms", "event_id")

  private val q48Sql =
    """WITH m AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY event_type),
      |d AS (
      |  SELECT e.event_type, e.event_id, e.ts, e.value, m.med,
      |    abs(e.value - m.med) AS absdev
      |  FROM events e JOIN m USING (event_type)),
      |md AS (
      |  SELECT event_type, quantile_cont(absdev, 0.5) AS mad
      |  FROM d GROUP BY event_type)
      |SELECT d.event_type, d.event_id, epoch_ms(d.ts) AS ts_ms, d.value,
      |  round(d.med, 6) AS med, round(md.mad, 6) AS mad,
      |  round(CASE WHEN md.mad > 0.0 THEN absdev / (1.4826 * md.mad) END, 6) AS robust_z,
      |  CASE WHEN md.mad > 0.0 THEN absdev > (3.0 * 1.4826) * md.mad
      |    ELSE d.value <> d.med END AS is_outlier
      |FROM d JOIN md USING (event_type)
      |ORDER BY d.event_type, ts_ms, d.event_id""".stripMargin

  /** Fixed-width histogram of ANY numeric column (public operator
    * behind [[graft.Graft.histogram]]): bin = floor(value/width), per
    * bin count + mean + share of total — the distribution profile a
    * data validator renders. One groupBy shuffle (map-side combined);
    * the share is a window over the bin rows, not the data. */
  def histogramOf(df: DataFrame, valueCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    df.withColumn("bin", floor(col(valueCol) / binWidth).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), r4(avg(col(valueCol))).as("avg_value"))
      .withColumn("share", r6(col("n") / sum(col("n")).over(Window.partitionBy())))
  }

  /** #19c histogram profiling over lineitem extended price. */
  private val q24: Q = (s, dir) =>
    histogramOf(t(s, dir, "lineitem"), "l_extendedprice", binWidth = 5000.0)
      .withColumnRenamed("avg_value", "avg_price")
      .orderBy("bin")

  private val q24Sql =
    """WITH b AS (
      |  SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin,
      |    count(*) AS n, round(avg(l_extendedprice), 4) AS avg_price
      |  FROM lineitem GROUP BY 1)
      |SELECT bin, n, avg_price, round(n / sum(n) OVER (), 6) AS share
      |FROM b ORDER BY bin""".stripMargin

  /** #19d cardinality profile: exact distinct counts per series — the
    * symbol-universe / active-user counts the reference's validators
    * report. Exact COUNT(DISTINCT) is the oracle-checked form; the
    * 100 TB path is `approx_count_distinct` (HLL++, one pass,
    * mergeable), pinned to the exact values by spec. */
  private val q25: Q = (s, dir) => {
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(to_date(col("ts"))).as("n_days"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  private val q25Sql =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS n_users,
      |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
      |  count(*) AS n_events
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** #2b supplier concentration — the TPC-H Q11 "important stock"
    * shape: revenue per supplier, kept only where it exceeds 1.05× the
    * GLOBAL mean supplier revenue (scale-robust: the threshold tracks
    * the supplier count). The global (total, count) is a 1-row
    * aggregate broadcast onto the per-supplier rollup (scalar
    * subqueries in the oracle) — at 100 TB the fact table shuffles
    * once for the rollup and the threshold costs one broadcast of one
    * row, never a second fact pass (the total reuses the rollup). */
  private val q28: Q = (s, dir) => {
    val rev = t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    val total = rev.agg(sum(col("revenue")).as("total_rev"), count(lit(1)).as("n_supp"))
    rev.join(broadcast(total))
      .filter(col("revenue") > lit(1.05) * col("total_rev") / col("n_supp"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        r4(col("revenue")).as("revenue"),
        r6(col("revenue") / col("total_rev")).as("share"))
      .orderBy("s_suppkey")
  }

  private val q28Sql =
    """WITH rev AS (
      |  SELECT l_suppkey, sum(l_extendedprice * (1.0 - l_discount)) AS revenue
      |  FROM lineitem GROUP BY 1)
      |SELECT s_suppkey, s_name, n_name,
      |  round(revenue, 4) AS revenue,
      |  round(revenue / (SELECT sum(revenue) FROM rev), 6) AS share
      |FROM rev
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE revenue > 1.05 * (SELECT sum(revenue) FROM rev) / (SELECT count(*) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** #19e the 100 TB cardinality path AS A QUERY: per-series HLL++
    * (`approx_count_distinct`) next to the exact count and the
    * realized relative error. One pass, mergeable partials, constant
    * memory per group — what replaces q25's exact COUNT(DISTINCT)
    * when the distinct set no longer fits a hash table per group.
    * rows-only check (a sketch is not SQL-reproducible in DuckDB);
    * the spec bounds the error against the exact values. */
  private val a01: Q = (s, dir) => {
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        // event_id is the table PK: exact distinct == count, and writing
        // it as count keeps the plan at ONE distinct aggregate — a second
        // countDistinct would Expand every input row once per distinct
        // column before the shuffle
        count(col("event_id")).as("exact_ids"),
        approx_count_distinct(col("event_id"), 0.02).as("approx_ids"))
      .withColumn("rel_err_users",
        r6(abs(col("approx_users") - col("exact_users")) / col("exact_users").cast("double")))
      .withColumn("rel_err_ids",
        r6(abs(col("approx_ids") - col("exact_ids")) / col("exact_ids").cast("double")))
      .orderBy("event_type")
  }

  /** #19f the 100 TB percentile path AS A QUERY: per-group
    * `approx_percentile` (one-pass mergeable quantile sketch) next to
    * q20's exact interpolated percentiles and the realized relative
    * error. rows-only check; the spec bounds the error. */
  private val a02: Q = (s, dir) => {
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D))").as("ex"),
        expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D), 10000)").as("ap"))
      .select(col("l_returnflag"), col("n_rows"),
        r6(col("ex").getItem(0)).as("exact_p50"), r6(col("ap").getItem(0)).as("approx_p50"),
        r6(col("ex").getItem(2)).as("exact_p99"), r6(col("ap").getItem(2)).as("approx_p99"),
        r6(greatest(
          abs(col("ap").getItem(0) - col("ex").getItem(0)) / col("ex").getItem(0),
          abs(col("ap").getItem(1) - col("ex").getItem(1)) / col("ex").getItem(1),
          abs(col("ap").getItem(2) - col("ex").getItem(2)) / col("ex").getItem(2))).as("max_rel_err"))
      .orderBy("l_returnflag")
  }

  /** #19f2 the 100 TB WINSORIZE path AS A QUERY: [[winsorizeOf]] run
    * in BOTH modes — exact interpolated percentiles vs the
    * `approx = true` sketch swap — row-joined on the events PK and
    * collapsed per series to the realized divergence: rows whose clip
    * flag flipped, clip volumes both modes, and the worst per-row
    * value delta. rows-only check (the sketch cut is not
    * SQL-reproducible in DuckDB); Round11Spec bounds clip_diff_rows by
    * the sketch's rank guarantee (≤ ~2·n/accuracy + interpolation
    * slack). The q47 documented swap made an executable code path. */
  private val a06: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val ex = winsorizeOf(ev, "event_type", "value", lo = 0.01, hi = 0.99)
      .select(col("event_type"), col("event_id"),
        col("winsorized").as("w_ex"), col("clip").as("c_ex"))
    val ap = winsorizeOf(ev, "event_type", "value", lo = 0.01, hi = 0.99,
        approx = true)
      .select(col("event_type"), col("event_id"),
        col("winsorized").as("w_ap"), col("clip").as("c_ap"))
    ex.join(ap, Seq("event_type", "event_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("c_ex") =!= col("c_ap"), 1L).otherwise(0L)).as("clip_diff_rows"),
        sum(abs(col("c_ex")).cast("long")).as("clipped_exact"),
        sum(abs(col("c_ap")).cast("long")).as("clipped_approx"),
        r6(max(abs(col("w_ex") - col("w_ap")))).as("max_abs_delta"))
      .orderBy("event_type")
  }

  /** #19f3 the 100 TB BINNING path AS A QUERY: [[quantileBinsOf]] run
    * in BOTH modes, row-joined on the events PK, collapsed per series
    * to rows that changed decile and the worst bin displacement —
    * each of the 9 cut points can move ≤ n/accuracy ranks, so moved
    * rows are bounded by 9·n/accuracy (+ tie slack). rows-only check;
    * Round11Spec pins the bound. The q49 documented swap made an
    * executable code path. */
  private val a07: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val ex = quantileBinsOf(ev, "event_type", "value", nBins = 10)
      .select(col("event_type"), col("event_id"), col("bin").as("bin_ex"))
    val ap = quantileBinsOf(ev, "event_type", "value", nBins = 10,
        approx = true)
      .select(col("event_type"), col("event_id"), col("bin").as("bin_ap"))
    ex.join(ap, Seq("event_type", "event_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("bin_ex") =!= col("bin_ap"), 1L).otherwise(0L)).as("moved_rows"),
        max(abs(col("bin_ex") - col("bin_ap"))).as("max_bin_delta"))
      .orderBy("event_type")
  }

  /** #19g the 100 TB PROFILING path AS A QUERY: term frequencies
    * estimated from a deterministic md5 10% document sample next to
    * the exact counts — how a corpus is profiled (mixture weights,
    * vocabulary stats) without scanning all of it. ONE aggregation
    * computes both sides: the sample membership is a pure function of
    * doc_id (never rand() — reruns reproduce the estimate bit-for-bit),
    * so `n_est` is just a conditional sum riding the exact count's
    * map-side combine; the shuffle carries (term, count, est) — at
    * 100 TB a real deployment flips the filter to scan ONLY the sample,
    * making profiling 10× cheaper than the count it estimates. Unlike
    * a01/a02 the estimator is SQL-expressible, so this one is
    * hash-checked against DuckDB, not rows-only. */
  private val a03: Q = (s, dir) => {
    val sampled = pmod(hash60(concat(lit("a03:"), col("doc_id").cast("string"))), lit(10L)) === 0
    t(s, dir, "documents")
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("n_exact"),
        sum(when(sampled, lit(10L)).otherwise(lit(0L))).as("n_est"))
      .withColumn("rel_err", r4(abs(col("n_est") - col("n_exact")) / col("n_exact").cast("double")))
      .orderBy(col("n_exact").desc, col("term"))
      .limit(20)
  }

  /** Sample-based corpus term profiling over ANY (id, text) table
    * (public operator behind [[graft.Graft.termProfile]]; a03 is the
    * fixed 10%-sample instantiation of this shape): exact top-`k` term
    * counts next to the estimate a deterministic md5 `permille`/1000
    * document sample would produce, in ONE aggregation — sample
    * membership is a pure function of (salt, id), so the estimate is
    * reproducible bit-for-bit, and at 100 TB the same plan with the
    * filter flipped profiles the corpus at sample cost. Returns
    * (term, n_exact, n_est, rel_err). */
  def termProfileOf(docs: DataFrame, idCol: String, textCol: String, k: Int,
                    permille: Int, salt: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(permille >= 1 && permille <= 1000, s"permille must be in [1,1000], got $permille")
    val sampled =
      pmod(hash60(concat(lit(salt + ":"), col("__id").cast("string"))), lit(1000L)) < permille
    docs.select(col(idCol).as("__id"), explode(words(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("n_exact"),
        (sum(when(sampled, lit(1L)).otherwise(lit(0L))) * lit(1000.0 / permille)).as("n_est"))
      .withColumn("rel_err", abs(col("n_est") - col("n_exact")) / col("n_exact").cast("double"))
      .orderBy(col("n_exact").desc, col("term"))
      .limit(k)
  }

  private val a03Sql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      |  FROM documents),
      |g AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS n_exact,
      |    CAST(sum(CASE WHEN CAST(('0x' || substr(md5('a03:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 0
      |      THEN 10 ELSE 0 END) AS BIGINT) AS n_est
      |  FROM tok GROUP BY term)
      |SELECT term, n_exact, n_est,
      |  round(abs(n_est - n_exact) / CAST(n_exact AS DOUBLE), 4) AS rel_err
      |FROM g
      |ORDER BY n_exact DESC, term
      |LIMIT 20""".stripMargin

  /** #q42 semi-structured props: the events table's JSON payload column
    * (the reference's raw REST payloads keep exactly this shape)
    * extracted ONCE at the scan (`get_json_object` → typed cast, a
    * codegen'd per-row path — the parse never reaches a shuffle) and
    * aggregated per series: count, distinct values, sum/avg/min/max.
    * At 100 TB the alternative — storing parsed columns — is the
    * KlineJson ingest path; this is the query-time fallback for
    * payloads that were landed raw. */
  private val q42: Q = (s, dir) => {
    val k = get_json_object(col("props"), "$.k").cast("long")
    t(s, dir, "events")
      .select(col("event_type"), k.as("__k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("__k")).as("n_distinct_k"),
        sum(col("__k")).as("sum_k"),
        r4(avg(col("__k"))).as("avg_k"),
        min(col("__k")).as("min_k"),
        max(col("__k")).as("max_k"))
      .orderBy("event_type")
  }

  private val q42Sql =
    """SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_distinct_k,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** #q43 the skew-mitigation path AS a query: lineitem ⋈ supplier
    * executed through [[Skew.saltedJoin]] (8 deterministic md5 salts
    * spread each supplier key over 8 tasks; the 1000-row dim side
    * replicates once per salt) and rolled up per supplier nation. The
    * oracle is the PLAIN join — the gate's hash compare proves salting
    * is result-identical, which is the entire point of the operator:
    * a declarative fallback for hot keys that overflow one task when
    * AQE's runtime split isn't available (e.g. broadcast-disabled SMJ
    * on a pre-bucketed layout). */
  private val q43: Q = (s, dir) => {
    val li = t(s, dir, "lineitem").select(
      col("l_suppkey").as("suppkey"), col("l_orderkey"), col("l_quantity"))
    val sup = t(s, dir, "supplier").select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    Skew.saltedJoin(li, sup, "suppkey", col("l_orderkey"), salts = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"), r4(sum(col("l_quantity"))).as("sum_qty"))
      .orderBy("s_nationkey")
  }

  private val q43Sql =
    """SELECT s_nationkey,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  round(sum(l_quantity), 4) AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin

  /** Quantile discretization of ANY numeric column per key (public
    * operator behind [[graft.Graft.quantileBins]]) — the feature-binning
    * step (MLlib QuantileDiscretizer shape) on the q20 exact-percentile
    * machinery: per-key interpolated cut points at i/nBins, broadcast
    * back onto the fact scan, bin = #cuts ≤ value ∈ [0, nBins−1].
    * Appends `bin`. Equal-boundary values go to the upper bin in both
    * engines (≤ rule). One agg shuffle for the key-cardinality-sized
    * cut table, no second fact shuffle. `approx = true` IS the 100 TB
    * path: `approx_percentile` cut points (mergeable sketch, rank
    * error ≤ n/accuracy per cut — so at most nBins·n/accuracy rows can
    * change bin, measured by a07_bins_approx); for a GLOBAL binning
    * collect the nBins−1 cuts to the driver and use the
    * `graft_searchsorted` literal kernel (map-only, O(log k) per row
    * instead of O(k)). */
  def quantileBinsOf(df: DataFrame, key: String, value: String,
                     nBins: Int, approx: Boolean = false,
                     accuracy: Int = 10000): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    require(accuracy >= 1, s"accuracy must be >= 1, got $accuracy")
    val qs = (1 until nBins).map(i => s"${i.toDouble / nBins}D").mkString(", ")
    val cutExpr =
      if (approx) s"approx_percentile($value, array($qs), $accuracy)"
      else s"percentile($value, array($qs))"
    val cuts = df.groupBy(col(key))
      .agg(expr(cutExpr).as("__cuts"))
    df.join(broadcast(cuts), Seq(key))
      .withColumn("bin",
        size(filter(col("__cuts"), c => c <= col(value))).cast("int"))
      .drop("__cuts")
  }

  /** #19d decile binning of extendedprice per returnflag, summarized
    * per (key, bin): the discretizer output as an auditable profile. */
  private val q49: Q = (s, dir) =>
    quantileBinsOf(t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice", 10)
      .groupBy(col("l_returnflag"), col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"), max(col("l_extendedprice")).as("hi"))
      .select(col("l_returnflag"), col("bin"), col("n"),
        r6(col("lo")).as("lo"), r6(col("hi")).as("hi"))
      .orderBy("l_returnflag", "bin")

  private val q49Sql = {
    val qs = (1 until 10).map(i => (i / 10.0).toString).mkString(", ")
    s"""WITH c AS (
       |  SELECT l_returnflag, quantile_cont(l_extendedprice, [$qs]) AS cuts
       |  FROM lineitem GROUP BY 1),
       |b AS (
       |  SELECT l.l_returnflag,
       |    CAST(len(list_filter(c.cuts, x -> x <= l.l_extendedprice)) AS INT) AS bin,
       |    l.l_extendedprice AS v
       |  FROM lineitem l JOIN c USING (l_returnflag))
       |SELECT l_returnflag, bin, count(*) AS n,
       |  round(min(v), 6) AS lo, round(max(v), 6) AS hi
       |FROM b GROUP BY 1, 2
       |ORDER BY l_returnflag, bin""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q49_quantile_bins" -> q49,
    "q47_winsorize" -> q47,
    "q48_mad_outliers" -> q48,
    "q28_supplier_share" -> q28,
    "a01_approx_distinct" -> a01,
    "a02_approx_percentile" -> a02,
    "a03_sampled_terms" -> a03,
    "a06_winsorize_approx" -> a06,
    "a07_bins_approx" -> a07,
    "q42_json_props" -> q42,
    "q43_skew_join" -> q43,
    "q24_histogram" -> q24,
    "q25_distinct_counts" -> q25,
    "q20_percentiles" -> q20,
    "q01_pricing_summary" -> q01,
    "q02_revenue_by_nation" -> q02,
    "q03_top_orders" -> q03,
    "q04_customers_no_orders" -> q04,
    "q05_orders_with_discounts" -> q05,
    "q15_time_buckets" -> q15,
    "q16_top_per_group" -> q16,
    "q17_grouping_sets" -> q17,
    "q18_conditional_pivot" -> q18,
    "q19_minmax_windows" -> q19)

  val oracle: Map[String, String] = Map(
    "q49_quantile_bins" -> q49Sql,
    "q47_winsorize" -> q47Sql,
    "q48_mad_outliers" -> q48Sql,
    "q28_supplier_share" -> q28Sql,
    "a03_sampled_terms" -> a03Sql,
    "q42_json_props" -> q42Sql,
    "q43_skew_join" -> q43Sql,
    "q24_histogram" -> q24Sql,
    "q25_distinct_counts" -> q25Sql,
    "q20_percentiles" -> q20Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_revenue_by_nation" -> q02Sql,
    "q03_top_orders" -> q03Sql,
    "q04_customers_no_orders" -> q04Sql,
    "q05_orders_with_discounts" -> q05Sql,
    "q15_time_buckets" -> q15Sql,
    "q16_top_per_group" -> q16Sql,
    "q17_grouping_sets" -> q17Sql,
    "q18_conditional_pivot" -> q18Sql,
    "q19_minmax_windows" -> q19Sql)
}
