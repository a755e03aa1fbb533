package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's options-market ingest surface as a Spark source
  * layer — the ClickHouse backend's two option payload shapes
  * (crypto_data_pipline_clickhouse.py:169-223 `get_option_symbols`,
  * :246-441 exercise history), normalized the same way [[KlineJson]]
  * normalizes klines.
  *
  * An exchange-info page carries `optionSymbols`: objects with
  * contract metadata plus a nested `filters` list from which the
  * reference picks PRICE_FILTER and LOT_SIZE entries and flattens
  * (crypto_data_pipline_clickhouse.py:180-214). An exercise-history
  * page is a flat array of (symbol, strikePrice, realStrikePrice,
  * strikeResult, expiryDate-ms) records; the reference concatenates
  * pages walking backward from the end time and dedups
  * (symbol, expiryDate) keep-FIRST — the first (newest-window) fetch
  * wins (crypto_data_pipline_clickhouse.py:318-321) — then stamps
  * underlying/exchange/type constants and casts numerics (:413-424).
  *
  * As with klines, the landing zone is one row per fetched page
  * `(underlying, page_seq, payload_json)` and normalization is a
  * declarative `from_json` → `explode` → typed projection: narrow,
  * shuffle-free, scan-speed at any landing volume. Every leaf parses
  * as STRING (Binance stringifies decimals; Jackson stringifies bare
  * numbers) and is cast exactly once. */
object OptionJson {

  private val filterSchema = StructType(Seq(
    StructField("filterType", StringType),
    StructField("minPrice", StringType),
    StructField("maxPrice", StringType),
    StructField("tickSize", StringType),
    StructField("minQty", StringType),
    StructField("maxQty", StringType),
    StructField("stepSize", StringType)))

  /** Parse schema for one exchange-info `optionSymbols` page. */
  val symbolsSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("symbol", StringType),
    StructField("underlying", StringType),
    StructField("quoteAsset", StringType),
    StructField("unit", StringType),
    StructField("expiryDate", StringType),
    StructField("side", StringType),
    StructField("strikePrice", StringType),
    StructField("priceScale", StringType),
    StructField("quantityScale", StringType),
    StructField("makerFeeRate", StringType),
    StructField("takerFeeRate", StringType),
    StructField("liquidationFeeRate", StringType),
    StructField("initialMargin", StringType),
    StructField("maintenanceMargin", StringType),
    StructField("minInitialMargin", StringType),
    StructField("minMaintenanceMargin", StringType),
    StructField("filters", ArrayType(filterSchema)))))

  /** Parse schema for one exercise-history page. */
  val exerciseSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("symbol", StringType),
    StructField("strikePrice", StringType),
    StructField("realStrikePrice", StringType),
    StructField("strikeResult", StringType),
    StructField("expiryDate", StringType))))

  /** The reference's flattened option-symbol column order
    * (crypto_data_pipline_clickhouse.py:185-214). */
  val symbolColumns: Seq[String] = Seq(
    "symbol", "underlying", "quoteAsset", "unit", "exchange", "type",
    "expiryDate", "side", "strikePrice",
    "minPrice", "maxPrice", "tickSize", "priceScale",
    "minQty", "maxQty", "stepSize", "quantityScale",
    "makerFeeRate", "takerFeeRate", "liquidationFeeRate",
    "initialMargin", "maintenanceMargin", "minInitialMargin", "minMaintenanceMargin")

  /** The reference's exercise-history column order
    * (crypto_data_pipline_clickhouse.py:426-428). */
  val exerciseColumns: Seq[String] = Seq(
    "symbol", "exchange", "type", "underlying", "expiryDate",
    "strikePrice", "realStrikePrice", "strikeResult")

  /** Explode one-page-per-row exchange-info payloads into flattened,
    * typed option-symbol rows: the PRICE_FILTER / LOT_SIZE entries are
    * picked out of the nested filters list in-plan (a codegen'd array
    * `filter`, the declarative form of the reference's
    * `next(f for f in filters if ...)`). */
  def parseSymbols(raw: DataFrame, payloadCol: String,
                   passthrough: Seq[String] = Nil): DataFrame = {
    val o = col("__o")
    def d(c: Column, name: String): Column = c.cast(DoubleType).as(name)
    def pick(t: String): Column =
      filter(o.getField("filters"), f => f.getField("filterType") === t).getItem(0)
    raw
      .withColumn("__o", explode(from_json(col(payloadCol), symbolsSchema)))
      .withColumn("__pf", pick("PRICE_FILTER"))
      .withColumn("__lf", pick("LOT_SIZE"))
      .select(Seq[Column](
        o.getField("symbol").as("symbol"),
        o.getField("underlying").as("underlying"),
        o.getField("quoteAsset").as("quoteAsset"),
        o.getField("unit").cast(LongType).as("unit"),
        lit("binance").as("exchange"),
        lit("OPTION").as("type"),
        timestamp_millis(o.getField("expiryDate").cast(LongType)).as("expiryDate"),
        o.getField("side").as("side"),
        d(o.getField("strikePrice"), "strikePrice"),
        d(col("__pf").getField("minPrice"), "minPrice"),
        d(col("__pf").getField("maxPrice"), "maxPrice"),
        d(col("__pf").getField("tickSize"), "tickSize"),
        o.getField("priceScale").cast(LongType).as("priceScale"),
        d(col("__lf").getField("minQty"), "minQty"),
        d(col("__lf").getField("maxQty"), "maxQty"),
        d(col("__lf").getField("stepSize"), "stepSize"),
        o.getField("quantityScale").cast(LongType).as("quantityScale"),
        d(o.getField("makerFeeRate"), "makerFeeRate"),
        d(o.getField("takerFeeRate"), "takerFeeRate"),
        d(o.getField("liquidationFeeRate"), "liquidationFeeRate"),
        d(o.getField("initialMargin"), "initialMargin"),
        d(o.getField("maintenanceMargin"), "maintenanceMargin"),
        d(o.getField("minInitialMargin"), "minInitialMargin"),
        d(o.getField("minMaintenanceMargin"), "minMaintenanceMargin")
      ) ++ passthrough.map(col): _*)
  }

  /** Explode one-page-per-row exercise-history payloads into typed
    * rows with the reference's constants and column order. */
  def parseExercise(raw: DataFrame, payloadCol: String, underlyingCol: String,
                    passthrough: Seq[String] = Nil): DataFrame = {
    val e = col("__e")
    raw
      .select(col("*"),
        posexplode(from_json(col(payloadCol), exerciseSchema)).as(Seq("__pos", "__e")))
      .select(Seq[Column](
        e.getField("symbol").as("symbol"),
        lit("binance").as("exchange"),
        lit("OPTION").as("type"),
        col(underlyingCol).as("underlying"),
        timestamp_millis(e.getField("expiryDate").cast(LongType)).as("expiryDate"),
        e.getField("strikePrice").cast(DoubleType).as("strikePrice"),
        e.getField("realStrikePrice").cast(DoubleType).as("realStrikePrice"),
        e.getField("strikeResult").as("strikeResult"),
        col("__pos")
      ) ++ passthrough.map(col): _*)
  }

  /** Parse schema for one options-kline page: unlike spot/futures
    * (12-element arrays), the options API returns OBJECTS keyed by
    * name (crypto_data_pipline_clickhouse.py:1088-1091 builds the
    * frame from dicts and renames into the standard columns). */
  val optionKlineSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("open", StringType),
    StructField("high", StringType),
    StructField("low", StringType),
    StructField("close", StringType),
    StructField("volume", StringType),
    StructField("amount", StringType),
    StructField("interval", StringType),
    StructField("tradeCount", StringType),
    StructField("takerVolume", StringType),
    StructField("takerAmount", StringType),
    StructField("openTime", StringType),
    StructField("closeTime", StringType))))

  /** Explode one-page-per-row options-kline payloads into the SAME
    * typed shape and column order as [[KlineJson.parse]], so the
    * whole downstream path — [[KlineJson.dedupKeepLast]], MergeWriter
    * upsert, streaming ingest — applies unchanged to the options
    * market. Fields map BY NAME (openTime→timestamp,
    * tradeCount→trades_count, takerVolume/takerAmount→taker_buy_*,
    * amount→quote_volume; the by-name form of the reference's
    * positional rename, immune to key-order drift); options klines
    * carry their own `interval` field and no `ignore`. */
  def parseOptionKlines(raw: DataFrame, payloadCol: String, symbolCol: String,
                        passthrough: Seq[String] = Nil): DataFrame = {
    val k = col("__k")
    def d(name: String, as: String): Column = k.getField(name).cast(DoubleType).as(as)
    raw
      .select(col("*"),
        posexplode(from_json(col(payloadCol), optionKlineSchema)).as(Seq("__pos", "__k")))
      .select(Seq[Column](
        col(symbolCol).as("symbol"),
        lit("binance").as("exchange"),
        lit("OPTION").as("type"),
        k.getField("interval").as("interval"),
        timestamp_millis(k.getField("openTime").cast(LongType)).as("timestamp"),
        timestamp_millis(k.getField("closeTime").cast(LongType)).as("close_time"),
        d("open", "open"), d("high", "high"), d("low", "low"), d("close", "close"),
        d("volume", "volume"), d("amount", "quote_volume"),
        d("takerVolume", "taker_buy_volume"), d("takerAmount", "taker_buy_quote_volume"),
        k.getField("tradeCount").cast(LongType).as("trades_count"),
        lit(0.0).as("ignore"),
        col("__pos")) ++ passthrough.map(col): _*)
  }

  /** Page-concat + dedup keep-LAST for option klines, keyed by
    * (symbol, interval, timestamp): unlike spot/futures — where the
    * pipeline stamps one constant interval and (symbol, timestamp) is
    * the PK — the options `interval` rides the payload, so a landing
    * dir carrying mixed intervals must NOT collapse a 1h bar into the
    * 1m bar sharing its openTime. */
  def dedupKlinesKeepLast(parsed: DataFrame, pageSeq: Column): DataFrame =
    PageDedup(parsed, Seq("symbol", "interval", "timestamp"),
      KlineJson.columns, pageSeq, keepFirst = false)

  /** Page-concat + dedup keep-FIRST for exercise history, keyed by
    * (symbol, expiryDate): the earliest page (lowest `pageSeq`) wins,
    * ties within a page broken by array position — pandas keep='first'
    * on the reference's newest-window-first concat, made deterministic
    * (see [[PageDedup]]); the opposite orientation of
    * [[KlineJson.dedupKeepLast]]'s heal. One window shuffle. */
  def dedupExerciseKeepFirst(parsed: DataFrame, pageSeq: Column): DataFrame =
    PageDedup(parsed, Seq("symbol", "expiryDate"), exerciseColumns, pageSeq, keepFirst = true)
}
