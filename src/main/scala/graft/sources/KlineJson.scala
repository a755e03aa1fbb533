package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's REST-kline ingest surface as a Spark source layer.
  *
  * A Binance kline page is a JSON array of 12-element arrays —
  * `[open_time_ms, "open", "high", "low", "close", "volume",
  * close_time_ms, "quote_volume", trades_count, "taker_buy_volume",
  * "taker_buy_quote_volume", "ignore"]`
  * (crypto_data_pipeline_duckdb.py:871-876). The reference normalizes
  * with pandas: ms-epoch → timestamp, string → float casts, constant
  * enrichment (exchange/type/interval) and a fixed column order
  * (crypto_data_pipeline_duckdb.py:1067-1083), then concatenates pages
  * and dedups `(symbol, timestamp)` keep-last
  * (crypto_data_pipeline_duckdb.py:1073-1078 sort → drop_duplicates).
  *
  * Here the landing zone is a DataFrame of raw page payloads — one row
  * per fetched page `(symbol, page_seq, payload_json)`, however they
  * arrived (files, Kafka, a REST collector) — and normalization is a
  * single declarative plan: `from_json` → `explode` → typed projection.
  * Everything is per-row narrow work: at 100 TB of landed pages this
  * runs at scan speed with no shuffle; the keep-last dedup is one
  * window over (symbol, timestamp), the same single-shuffle shape as
  * q06. JSON numbers and strings both land as STRING in the parse
  * schema (kline arrays mix both), then cast once.
  */
object KlineJson {

  /** Parse schema for one page payload: array of 12-field rows, every
    * field read as string (Jackson stringifies bare numbers). */
  val payloadSchema: ArrayType = ArrayType(ArrayType(StringType))

  /** The reference's output column order (crypto_data_pipeline_duckdb.py:1080-1082). */
  val columns: Seq[String] = Seq(
    "symbol", "exchange", "type", "interval", "timestamp", "close_time",
    "open", "high", "low", "close", "volume", "quote_volume",
    "taker_buy_volume", "taker_buy_quote_volume", "trades_count", "ignore")

  /** Explode one-page-per-row payloads into typed kline rows.
    *
    * @param raw         landing DataFrame
    * @param payloadCol  JSON page payload column (array-of-arrays text)
    * @param symbolCol   symbol column
    * @param marketType  "SPOT" or "PERPETUAL" (reference `type` constant)
    * @param interval    kline interval constant, e.g. "1m"
    * @param passthrough landing columns to carry along (e.g. the page
    *                    sequence for [[dedupKeepLast]])
    */
  def parse(raw: DataFrame, payloadCol: String, symbolCol: String,
            marketType: String, interval: String,
            passthrough: Seq[String] = Nil): DataFrame = {
    val k = col("__k")
    def d(i: Int, name: String): Column = k.getItem(i).cast(DoubleType).as(name)
    raw
      .select(col("*"),
        posexplode(from_json(col(payloadCol), payloadSchema)).as(Seq("__pos", "__k")))
      .select(Seq[Column](
        col(symbolCol).as("symbol"),
        lit("binance").as("exchange"),
        lit(marketType).as("type"),
        lit(interval).as("interval"),
        timestamp_millis(k.getItem(0).cast(LongType)).as("timestamp"),
        timestamp_millis(k.getItem(6).cast(LongType)).as("close_time"),
        d(1, "open"), d(2, "high"), d(3, "low"), d(4, "close"), d(5, "volume"),
        d(7, "quote_volume"), d(9, "taker_buy_volume"), d(10, "taker_buy_quote_volume"),
        k.getItem(8).cast(LongType).as("trades_count"),
        d(11, "ignore"),
        col("__pos")) ++ passthrough.map(col): _*)
  }

  /** Page-concat + dedup-keep-last by (symbol, timestamp): later pages
    * (higher `pageSeq`) win, ties within a page broken by array
    * position — pandas keep='last' on the page-ordered concat, made
    * deterministic (see [[PageDedup]]). One window shuffle, keyed like
    * the store. */
  def dedupKeepLast(parsed: DataFrame, pageSeq: Column): DataFrame =
    PageDedup(parsed, Seq("symbol", "timestamp"), columns, pageSeq, keepFirst = false)

  /** The reference's pagination plan (`get_historical_klines`
    * crypto_data_pipeline_duckdb.py:883-949): fetch windows of
    * `limit` bars stepping from start to end. Pure, driver-side. */
  def pageWindows(startMs: Long, endMs: Long, intervalMs: Long, limit: Int): Seq[(Long, Long)] = {
    require(intervalMs > 0 && limit > 0)
    val step = intervalMs * limit
    Iterator.iterate(startMs)(_ + step).takeWhile(_ < endMs)
      .map(s => (s, math.min(s + step, endMs))).toSeq
  }

  /** Futures fetch-range clamp: never fetch past the contract's
    * delivery date (crypto_data_pipeline_duckdb.py:905-911). */
  def clampToDelivery(startMs: Long, endMs: Long, deliveryMs: Option[Long]): Option[(Long, Long)] = {
    val end = deliveryMs.fold(endMs)(math.min(endMs, _))
    if (end <= startMs) None else Some((startMs, end))
  }
}
