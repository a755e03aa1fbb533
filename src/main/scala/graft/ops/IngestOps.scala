package graft.ops

import graft.{F, Tables}
import graft.sources.{OptionJson, RatesJson}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-path queries (SURVEY.md §2 sources) — drive the source
  * layers end-to-end inside the driver's gate. Payload pages are built
  * in-plan from the events table (there is no raw-payload table in
  * testdata), so the parse → explode → dedup plan is exercised on real
  * driver runs.
  *
  * Oracle-checked since round 8: each page carries a leading `_ord`
  * field (zero-padded event_id) that the parse schemas do NOT declare —
  * `from_json` ignores undeclared JSON keys, exactly as the real
  * parsers ignore extra API fields — and `sort_array` orders the
  * collected records by it, so the in-page position `__pos` (the
  * PageDedup tie-break) is the event_id rank: deterministic under any
  * partitioning, and replayable in the oracle as a plain
  * `row_number() OVER (... ORDER BY page_seq, event_id)`. Output
  * timestamps are projected to epoch-ms longs (same column names) for
  * the exact-hash compare. */
object IngestOps {
  type Q = (SparkSession, String) => DataFrame
  import Tables.t
  import F._

  /** Unique, fixed-width (string sort == numeric sort) in-page order
    * discriminator; first struct field so `sort_array` orders by it. */
  private def ord: Column = lpad(col("event_id").cast("string"), 12, "0").as("_ord")

  /** #o01 options exercise-history ingest
    * (crypto_data_pipline_clickhouse.py:246-441): one synthetic page
    * per event_type built with to_json(collect_list(struct(…))) over a
    * sampled slice, then OptionJson.parseExercise → dedupKeepFirst —
    * the declarative form of the reference's fetch→concat→dedup loop. */
  private val o01: Q = (s, dir) => {
    val ev = t(s, dir, "events").filter(pmod(col("event_id"), lit(37L)) === 0)
    val pages = ev.groupBy(col("event_type").as("underlying"))
      .agg(to_json(sort_array(collect_list(struct(
        ord,
        concat(col("event_type"), lit("-"), col("event_id")).as("symbol"),
        col("value").as("strikePrice"),
        (col("value") * lit(1.01)).as("realStrikePrice"),
        lit("REALISTIC_VALUE_STRICKEN").as("strikeResult"),
        epochMs(col("ts")).as("expiryDate"))))).as("payload"))
      .withColumn("page_seq", lit(1L))
    OptionJson.dedupExerciseKeepFirst(
      OptionJson.parseExercise(pages, "payload", "underlying", Seq("page_seq")),
      col("page_seq"))
      .withColumn("expiryDate", epochMs(col("expiryDate")))
      .orderBy("symbol")
  }

  /** #o02 funding-rate ingest (crypto_data_pipline_clickhouse.py:717-940):
    * one page per event_type (symbol = type+"USDT", so keys COLLIDE and
    * the keep-last heal is exercised on real data); every 7th record's
    * fundingRate is a non-numeric string, exercising the reference's
    * to_numeric(errors='coerce').fillna(0) rule end-to-end. */
  private val o02: Q = (s, dir) => {
    val ev = t(s, dir, "events").filter(pmod(col("event_id"), lit(29L)) === 0)
    val pages = ev.groupBy(col("event_type").as("market"))
      .agg(to_json(sort_array(collect_list(struct(
        ord,
        concat(col("event_type"), lit("USDT")).as("symbol"),
        epochMs(col("ts")).cast("string").as("fundingTime"),
        when(pmod(col("event_id"), lit(203L)) === 0, lit("n/a"))
          .otherwise((col("value") / lit(1e6)).cast("string")).as("fundingRate"),
        col("value").cast("string").as("markPrice"))))).as("payload"))
      .withColumn("page_seq", lit(1L))
    RatesJson.dedupFundingKeepLast(
      RatesJson.parseFunding(pages, "payload", Seq("page_seq")), col("page_seq"))
      .withColumn("fundingTime", epochMs(col("fundingTime")))
      .orderBy("symbol", "fundingTime")
  }

  /** #o03 margin-interest-rate ingest
    * (crypto_data_pipline_clickhouse.py:461-716): same landed-page
    * contract keyed (asset, timestamp); vipLevel cycles 0-8. */
  private val o03: Q = (s, dir) => {
    val ev = t(s, dir, "events").filter(pmod(col("event_id"), lit(31L)) === 0)
    val pages = ev.groupBy(col("event_type").as("market"))
      .agg(to_json(sort_array(collect_list(struct(
        ord,
        col("event_type").as("asset"),
        epochMs(col("ts")).cast("string").as("timestamp"),
        (col("value") / lit(1e4)).cast("string").as("dailyInterestRate"),
        pmod(col("event_id"), lit(9L)).cast("string").as("vipLevel"))))).as("payload"))
      .withColumn("page_seq", lit(1L))
    RatesJson.dedupMarginKeepLast(
      RatesJson.parseMargin(pages, "payload", Seq("page_seq")), col("page_seq"))
      .withColumn("timestamp", epochMs(col("timestamp")))
      .orderBy("asset", "timestamp")
  }

  /** #o04 option-KLINE ingest (crypto_data_pipline_clickhouse.py:
    * 1031-1041 — the object-shaped kline payload, vs the array-shaped
    * spot/futures one): two synthetic pages per symbol whose minute
    * buckets COLLIDE across pages, so parseOptionKlines → page-concat →
    * dedupKlinesKeepLast exercises the newest-page-wins heal on the
    * (symbol, interval, timestamp) PK — the option-market interval
    * rides the payload, so a 1h bar never collapses into the 1m bar
    * sharing its openTime. */
  private val o04: Q = (s, dir) => {
    val ev = t(s, dir, "events").filter(pmod(col("event_id"), lit(31L)) === 0)
    val minuteMs = epochMs(col("ts")) - pmod(epochMs(col("ts")), lit(60000L))
    def page(seq: Long, slice: Column => Column, bump: Double): DataFrame = ev
      .filter(slice(col("event_id")))
      .groupBy(concat(col("event_type"), lit("-C")).as("sym"))
      .agg(to_json(sort_array(collect_list(struct(
        ord,
        (col("value") * lit(bump)).cast("string").as("open"),
        (col("value") * lit(1.02)).cast("string").as("high"),
        (col("value") * lit(0.98)).cast("string").as("low"),
        (col("value") * lit(1.01)).cast("string").as("close"),
        col("user_id").cast("string").as("volume"),
        (col("user_id") * 2).cast("string").as("amount"),
        when(pmod(col("event_id"), lit(2L)) === 0, lit("1m")).otherwise(lit("1h")).as("interval"),
        pmod(col("event_id"), lit(500L)).cast("string").as("tradeCount"),
        col("user_id").cast("string").as("takerVolume"),
        col("user_id").cast("string").as("takerAmount"),
        minuteMs.cast("string").as("openTime"),
        (minuteMs + 59999L).cast("string").as("closeTime"))))).as("payload"))
      .withColumn("page_seq", lit(seq))
    // page 2 re-fetches half the keys with REVISED opens (bump 1.1):
    // the keep-last heal must surface page 2's values on collided PKs
    val pages = page(1L, _ => lit(true), 1.0).unionByName(
      page(2L, id => pmod(id, lit(62L)) === 0, 1.1))
    OptionJson.dedupKlinesKeepLast(
      OptionJson.parseOptionKlines(pages, "payload", "sym", Seq("page_seq")),
      col("page_seq"))
      .withColumn("timestamp", epochMs(col("timestamp")))
      .withColumn("close_time", epochMs(col("close_time")))
      .orderBy("symbol", "interval", "timestamp")
  }

  /** #p02 the reference's DAILY MARKET LOOP as ONE oracle-checked plan
    * (the market-side sibling of TextOps p01): ingest → upsert-heal →
    * spot align → premium → WMA → extreme-move report, composed exactly
    * as the reference's scheduler runs them daily
    * (scheduler_clickhouse.py:26-147 sequencing;
    * crypto_data_pipeline_duckdb.py:1546-1594 upsert, :1229-1243
    * premium, :1246-1263 WMA, :1720-1764 extreme cases).
    *
    * Stage 1 (ingest): two landed funding-rate pages per market — page 2
    * is "today's" re-fetch that revises markPrice on half the keys —
    * parsed by [[RatesJson.parseFunding]] and healed by the keep-last
    * upsert rule (page 2 wins on collided (symbol, fundingTime) PKs).
    * Stage 2 (align): as-of backward join to the denser spot series via
    * [[graft.Graft.asofJoin]] — the last spot print at-or-before each
    * funding row; premium = markPrice/spot − 1 (:1237).
    * Stage 3 (indicator): WMA(12) of the premium per symbol via
    * [[graft.Graft.wma]] (the O(1)-per-row cumulative-sum form; the
    * oracle replays the identical formulation so doubles match bitwise).
    * Stage 4 (report): LAG(5) premium change, |Δ| > 2 threshold, 1h
    * debounce, newest-first top-20 with the Asia/Shanghai wall clock —
    * the q12 extreme-case shape applied to the derived premium.
    *
    * The gate proves the COMPOSITION — page heal feeding the as-of,
    * the as-of feeding the indicator, the indicator feeding the report —
    * not just each operator alone. Plan shape: the page build + heal
    * shuffles on (symbol, fundingTime); the as-of union+carry, WMA and
    * report windows all share ONE partitioning on symbol (a single
    * exchange reused across four window stages); the top-20 is a
    * TakeOrdered, never a full sort. */
  private val p02: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val ev = t(s, dir, "events").filter(pmod(col("event_id"), lit(29L)) === 0)
    // stage 1: one page per market and fetch day; page 2 revises half
    // the keys (value*1.001) — the upsert delta the heal must surface
    def page(seq: Long, slice: Column => Column, price: Column): DataFrame = ev
      .filter(slice(col("event_id")))
      .groupBy(col("event_type").as("market"))
      .agg(to_json(sort_array(collect_list(struct(
        ord,
        concat(col("event_type"), lit("USDT")).as("symbol"),
        epochMs(col("ts")).cast("string").as("fundingTime"),
        (col("value") / lit(1e6)).cast("string").as("fundingRate"),
        price.cast("string").as("markPrice"))))).as("payload"))
      .withColumn("page_seq", lit(seq))
    val pages = page(1L, _ => lit(true), col("value")).unionByName(
      page(2L, id => pmod(id, lit(58L)) === 0, col("value") * lit(1.001)))
    val perp = RatesJson.dedupFundingKeepLast(
      RatesJson.parseFunding(pages, "payload", Seq("page_seq")), col("page_seq"))
      .select(col("symbol"), col("fundingTime").as("ts"),
        col("fundingRate"), col("markPrice"))
    // stage 2: align to the denser spot series (last print at-or-before)
    val spot = t(s, dir, "events").filter(pmod(col("event_id"), lit(7L)) === 0)
      .groupBy(concat(col("event_type"), lit("USDT")).as("symbol"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("spot"))
    val prem = graft.Graft.asofJoin(perp, spot, "symbol", "ts", Seq("spot"))
      .filter(col("spot").isNotNull)
      .withColumn("premium", col("markPrice") / col("spot") - lit(1.0))
    // stage 3: WMA(12) of the premium ((symbol, ts) is the healed PK, so
    // ordering by ts alone is total — the id tie-break never fires)
    val wm = graft.Graft.wma(prem, "symbol", "ts", "ts", "premium", n = 12)
    // stage 4: LAG(5) change + 1h debounce + newest-first top-20
    val w = Window.partitionBy(col("symbol")).orderBy(col("ts"))
    val cand = wm
      .withColumn("value_change", col("premium") - lag(col("premium"), 5).over(w))
      .filter(abs(col("value_change")) > lit(2.0))
    cand
      .withColumn("gap_ms", epochMs(col("ts")) - epochMs(lag(col("ts"), 1).over(w)))
      .filter(col("gap_ms").isNull || col("gap_ms") > lit(3600000L))
      .select(col("symbol"), epochMs(col("ts")).as("ts_ms"),
        epochMs(from_utc_timestamp(col("ts"), "Asia/Shanghai")).as("ts_cn_ms"),
        col("fundingRate"), col("markPrice"), col("spot"),
        r6(col("premium")).as("premium"), r6(col("wma")).as("wma12"),
        r6(col("value_change")).as("value_change"), col("gap_ms"))
      .orderBy(col("ts_ms").desc, col("symbol"))
      .limit(20)
  }

  val queries: Map[String, Q] = Map(
    "o01_option_exercise" -> o01,
    "o02_funding_rates" -> o02,
    "o03_margin_rates" -> o03,
    "o04_option_klines" -> o04,
    "p02_market_pipeline" -> p02)

  /** DuckDB replay of the ingest gates: the JSON round-trip is the
    * identity on these payloads (shortest-repr double/long strings cast
    * back exactly), so the oracle reproduces build → concat → keyed
    * keep-first/keep-last directly from `events`, with the in-page
    * tie-break replayed as ORDER BY event_id (see `_ord` above). */
  val oracle: Map[String, String] = Map(
    "o01_option_exercise" ->
      """SELECT event_type || '-' || CAST(event_id AS VARCHAR) AS symbol,
        |  'binance' AS exchange, 'OPTION' AS type,
        |  event_type AS underlying,
        |  epoch_ms(ts) AS expiryDate,
        |  value AS strikePrice,
        |  value * 1.01 AS realStrikePrice,
        |  'REALISTIC_VALUE_STRICKEN' AS strikeResult
        |FROM events WHERE event_id % 37 = 0
        |ORDER BY symbol""".stripMargin,
    "o02_funding_rates" ->
      """WITH src AS (
        |  SELECT event_type || 'USDT' AS symbol,
        |    epoch_ms(ts) AS fundingTime,
        |    CASE WHEN event_id % 203 = 0 THEN 0.0 ELSE value / 1000000.0 END AS fundingRate,
        |    value AS markPrice, event_id
        |  FROM events WHERE event_id % 29 = 0)
        |SELECT symbol, 'binance' AS exchange, 'PERPETUAL' AS type,
        |  fundingTime, fundingRate, markPrice
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY symbol, fundingTime ORDER BY event_id DESC) AS rn
        |      FROM src)
        |WHERE rn = 1
        |ORDER BY symbol, fundingTime""".stripMargin,
    "o03_margin_rates" ->
      """WITH src AS (
        |  SELECT event_type AS asset,
        |    epoch_ms(ts) AS timestamp,
        |    value / 10000.0 AS dailyInterestRate,
        |    event_id % 9 AS vipLevel, event_id
        |  FROM events WHERE event_id % 31 = 0)
        |SELECT asset, 'binance' AS exchange, 'Margin' AS type,
        |  timestamp, dailyInterestRate, vipLevel
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY asset, timestamp ORDER BY event_id DESC) AS rn
        |      FROM src)
        |WHERE rn = 1
        |ORDER BY asset, timestamp""".stripMargin,
    "o04_option_klines" ->
      """WITH ev AS (
        |  SELECT *, epoch_ms(ts) - (epoch_ms(ts) % 60000) AS minute_ms
        |  FROM events WHERE event_id % 31 = 0),
        |pages AS (
        |  SELECT 1 AS page_seq, event_id,
        |    event_type || '-C' AS symbol,
        |    CASE WHEN event_id % 2 = 0 THEN '1m' ELSE '1h' END AS "interval",
        |    minute_ms AS timestamp, minute_ms + 59999 AS close_time,
        |    value * 1.0 AS open, value * 1.02 AS high, value * 0.98 AS low,
        |    value * 1.01 AS close,
        |    CAST(user_id AS DOUBLE) AS volume,
        |    CAST(user_id * 2 AS DOUBLE) AS quote_volume,
        |    CAST(user_id AS DOUBLE) AS taker_buy_volume,
        |    CAST(user_id AS DOUBLE) AS taker_buy_quote_volume,
        |    event_id % 500 AS trades_count
        |  FROM ev
        |  UNION ALL
        |  SELECT 2, event_id, event_type || '-C',
        |    CASE WHEN event_id % 2 = 0 THEN '1m' ELSE '1h' END,
        |    minute_ms, minute_ms + 59999,
        |    value * 1.1, value * 1.02, value * 0.98, value * 1.01,
        |    CAST(user_id AS DOUBLE), CAST(user_id * 2 AS DOUBLE),
        |    CAST(user_id AS DOUBLE), CAST(user_id AS DOUBLE),
        |    event_id % 500
        |  FROM ev WHERE event_id % 62 = 0)
        |SELECT symbol, 'binance' AS exchange, 'OPTION' AS type, "interval",
        |  timestamp, close_time, open, high, low, close, volume, quote_volume,
        |  taker_buy_volume, taker_buy_quote_volume, trades_count,
        |  0.0 AS ignore
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY symbol, "interval", timestamp
        |        ORDER BY page_seq DESC, event_id DESC) AS rn
        |      FROM pages)
        |WHERE rn = 1
        |ORDER BY symbol, "interval", timestamp""".stripMargin,
    "p02_market_pipeline" ->
      """WITH src AS (
        |  SELECT event_type || 'USDT' AS symbol, epoch_ms(ts) AS ft_ms,
        |    value / 1000000.0 AS fundingRate, value AS markPrice,
        |    event_id, 1 AS page_seq
        |  FROM events WHERE event_id % 29 = 0
        |  UNION ALL
        |  SELECT event_type || 'USDT', epoch_ms(ts), value / 1000000.0,
        |    value * 1.001, event_id, 2
        |  FROM events WHERE event_id % 58 = 0),
        |healed AS (
        |  SELECT symbol, epoch_ms(ft_ms) AS ts, fundingRate, markPrice FROM (
        |    SELECT *, row_number() OVER (PARTITION BY symbol, ft_ms
        |      ORDER BY page_seq DESC, event_id DESC) AS rn FROM src)
        |  WHERE rn = 1),
        |spot AS (
        |  SELECT event_type || 'USDT' AS symbol, ts, arg_max(value, event_id) AS spot
        |  FROM events WHERE event_id % 7 = 0
        |  GROUP BY 1, 2),
        |al AS (
        |  SELECT h.symbol AS symbol, h.ts AS ts, h.fundingRate AS fundingRate,
        |    h.markPrice AS markPrice, s.spot AS spot
        |  FROM healed h ASOF LEFT JOIN spot s
        |    ON h.symbol = s.symbol AND h.ts >= s.ts),
        |prem AS (
        |  SELECT *, markPrice / spot - 1.0 AS premium
        |  FROM al WHERE spot IS NOT NULL),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY ts) AS rn
        |  FROM prem),
        |c AS (
        |  SELECT *,
        |    sum(premium * rn) OVER w AS cxw,
        |    sum(premium) OVER w AS cx
        |  FROM r
        |  WINDOW w AS (PARTITION BY symbol ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (
        |  SELECT *,
        |    cxw - lag(cxw, 12, CAST(0.0 AS DOUBLE)) OVER o AS sxw,
        |    cx - lag(cx, 12, CAST(0.0 AS DOUBLE)) OVER o AS sx
        |  FROM c
        |  WINDOW o AS (PARTITION BY symbol ORDER BY ts)),
        |wm AS (
        |  SELECT symbol, ts, fundingRate, markPrice, spot, premium,
        |    CASE WHEN least(rn, 12) = 12
        |      THEN (sxw + (12 - rn) * sx) / 78.0 END AS wma12
        |  FROM f),
        |chg AS (
        |  SELECT *, premium - lag(premium, 5)
        |    OVER (PARTITION BY symbol ORDER BY ts) AS value_change
        |  FROM wm),
        |cand AS (SELECT * FROM chg WHERE abs(value_change) > 2.0),
        |deb AS (
        |  SELECT *, epoch_ms(ts) - epoch_ms(lag(ts, 1)
        |    OVER (PARTITION BY symbol ORDER BY ts)) AS gap_ms
        |  FROM cand)
        |SELECT symbol, epoch_ms(ts) AS ts_ms,
        |  epoch_ms(timezone('Asia/Shanghai', timezone('UTC', ts))) AS ts_cn_ms,
        |  fundingRate, markPrice, spot, round(premium, 6) AS premium,
        |  round(wma12, 6) AS wma12, round(value_change, 6) AS value_change,
        |  gap_ms
        |FROM deb
        |WHERE gap_ms IS NULL OR gap_ms > 3600000
        |ORDER BY ts_ms DESC, symbol
        |LIMIT 20""".stripMargin)
}
