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

  val queries: Map[String, Q] = Map(
    "o01_option_exercise" -> o01,
    "o02_funding_rates" -> o02,
    "o03_margin_rates" -> o03,
    "o04_option_klines" -> o04)

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
        |ORDER BY symbol, "interval", timestamp""".stripMargin)
}
