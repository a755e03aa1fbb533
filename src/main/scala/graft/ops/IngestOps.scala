package graft.ops

import graft.{F, Tables}
import graft.sources.{OptionJson, RatesJson}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-path queries (SURVEY.md §2 sources) — drive the source
  * layers end-to-end inside the driver's gate. Payload pages are built
  * in-plan from the events table (there is no raw-payload table in
  * testdata), so the parse → explode → dedup plan is exercised on real
  * driver runs; rows-only because the JSON round-trip is not
  * SQL-expressible in the oracle's dialect-portable subset. */
object IngestOps {
  type Q = (SparkSession, String) => DataFrame
  import Tables.t
  import F._

  /** #o01 options exercise-history ingest
    * (crypto_data_pipline_clickhouse.py:246-441): one synthetic page
    * per event_type built with to_json(collect_list(struct(…))) over a
    * sampled slice, then OptionJson.parseExercise → dedupKeepFirst —
    * the declarative form of the reference's fetch→concat→dedup loop. */
  private val o01: Q = (s, dir) => {
    val ev = t(s, dir, "events").filter(pmod(col("event_id"), lit(37L)) === 0)
    val pages = ev.groupBy(col("event_type").as("underlying"))
      .agg(to_json(collect_list(struct(
        concat(col("event_type"), lit("-"), col("event_id")).as("symbol"),
        col("value").as("strikePrice"),
        (col("value") * lit(1.01)).as("realStrikePrice"),
        lit("REALISTIC_VALUE_STRICKEN").as("strikeResult"),
        epochMs(col("ts")).as("expiryDate")))).as("payload"))
      .withColumn("page_seq", lit(1L))
    OptionJson.dedupExerciseKeepFirst(
      OptionJson.parseExercise(pages, "payload", "underlying", Seq("page_seq")),
      col("page_seq"))
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
      .agg(to_json(collect_list(struct(
        concat(col("event_type"), lit("USDT")).as("symbol"),
        epochMs(col("ts")).cast("string").as("fundingTime"),
        when(pmod(col("event_id"), lit(203L)) === 0, lit("n/a"))
          .otherwise((col("value") / lit(1e6)).cast("string")).as("fundingRate"),
        col("value").cast("string").as("markPrice")))).as("payload"))
      .withColumn("page_seq", lit(1L))
    RatesJson.dedupFundingKeepLast(
      RatesJson.parseFunding(pages, "payload", Seq("page_seq")), col("page_seq"))
      .orderBy("symbol", "fundingTime")
  }

  /** #o03 margin-interest-rate ingest
    * (crypto_data_pipline_clickhouse.py:461-716): same landed-page
    * contract keyed (asset, timestamp); vipLevel cycles 0-8. */
  private val o03: Q = (s, dir) => {
    val ev = t(s, dir, "events").filter(pmod(col("event_id"), lit(31L)) === 0)
    val pages = ev.groupBy(col("event_type").as("market"))
      .agg(to_json(collect_list(struct(
        col("event_type").as("asset"),
        epochMs(col("ts")).cast("string").as("timestamp"),
        (col("value") / lit(1e4)).cast("string").as("dailyInterestRate"),
        pmod(col("event_id"), lit(9L)).cast("string").as("vipLevel")))).as("payload"))
      .withColumn("page_seq", lit(1L))
    RatesJson.dedupMarginKeepLast(
      RatesJson.parseMargin(pages, "payload", Seq("page_seq")), col("page_seq"))
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
      .agg(to_json(collect_list(struct(
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
        (minuteMs + 59999L).cast("string").as("closeTime")))).as("payload"))
      .withColumn("page_seq", lit(seq))
    // page 2 re-fetches half the keys with REVISED opens (bump 1.1):
    // the keep-last heal must surface page 2's values on collided PKs
    val pages = page(1L, _ => lit(true), 1.0).unionByName(
      page(2L, id => pmod(id, lit(62L)) === 0, 1.1))
    OptionJson.dedupKlinesKeepLast(
      OptionJson.parseOptionKlines(pages, "payload", "sym", Seq("page_seq")),
      col("page_seq"))
      .orderBy("symbol", "interval", "timestamp")
  }

  val queries: Map[String, Q] = Map(
    "o01_option_exercise" -> o01,
    "o02_funding_rates" -> o02,
    "o03_margin_rates" -> o03,
    "o04_option_klines" -> o04)
  val oracle: Map[String, String] = Map.empty
}
