package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's SPOT / USD-M-perpetual exchange-info ingest surface
  * as a Spark source layer — the DuckDB backend's `get_spot_symbols` /
  * `get_um_perpetual_symbols` flattens
  * (crypto_data_pipeline_duckdb.py:57-155), the twins of
  * [[OptionJson.parseSymbols]] for the other two markets.
  *
  * A spot exchange-info page carries `symbols`: objects with trading
  * metadata plus a nested `filters` list from which the reference picks
  * the PRICE_FILTER and LOT_SIZE entries BY TYPE
  * (`next(f for f in symbol['filters'] if f['filterType'] == ...)`,
  * :69-70) and flattens into a typed row (:72-91). A perp page is the
  * same shape restricted to `contractType == 'PERPETUAL'` (:119), with
  * the filters picked POSITIONALLY (`filters[0]` / `filters[1]`,
  * :139-144 — the reference trusts the futures API's fixed order; we
  * mirror that exactly) and the onboard/delivery ms-epochs lifted to
  * timestamps (:150-151).
  *
  * These tables exist to define the FETCH UNIVERSE of every kline
  * cycle: spot klines are fetched for `quote_asset IN ('USDT','USDC')`
  * (:972, :1108) and perp klines for `delivery_date IS NOT NULL`
  * (:970, :1104) — [[spotUniverse]] / [[perpUniverse]] are those two
  * rules as operators.
  *
  * As with [[KlineJson]], the landing zone is one row per fetched page
  * `(page_seq, payload_json)` and normalization is a declarative
  * `from_json` → `explode` → typed projection: narrow, shuffle-free,
  * scan-speed at any landing volume. Every leaf parses as STRING
  * (Binance stringifies decimals; Jackson stringifies bare numbers)
  * and is cast exactly once. */
object SymbolJson {

  private val filterSchema = StructType(Seq(
    StructField("filterType", StringType),
    StructField("minPrice", StringType),
    StructField("maxPrice", StringType),
    StructField("tickSize", StringType),
    StructField("minQty", StringType),
    StructField("maxQty", StringType),
    StructField("stepSize", StringType)))

  /** Parse schema for one spot exchange-info `symbols` page. */
  val spotSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("symbol", StringType),
    StructField("baseAsset", StringType),
    StructField("quoteAsset", StringType),
    StructField("status", StringType),
    StructField("isSpotTradingAllowed", BooleanType),
    StructField("isMarginTradingAllowed", BooleanType),
    StructField("baseAssetPrecision", StringType),
    StructField("quoteAssetPrecision", StringType),
    StructField("filters", ArrayType(filterSchema)))))

  /** Parse schema for one UM-futures exchange-info `symbols` page. */
  val perpSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("symbol", StringType),
    StructField("baseAsset", StringType),
    StructField("quoteAsset", StringType),
    StructField("marginAsset", StringType),
    StructField("contractType", StringType),
    StructField("underlyingSubType", ArrayType(StringType)),
    StructField("status", StringType),
    StructField("onboardDate", StringType),
    StructField("deliveryDate", StringType),
    StructField("pricePrecision", StringType),
    StructField("quantityPrecision", StringType),
    StructField("filters", ArrayType(filterSchema)))))

  /** The reference's flattened spot-symbol column order
    * (crypto_data_pipeline_duckdb.py:72-91). */
  val spotColumns: Seq[String] = Seq(
    "symbol", "base_asset", "quote_asset", "exchange", "type", "status",
    "is_spot_trading_allowed", "is_margin_trading_allowed",
    "base_precision", "quote_precision",
    "min_price", "max_price", "tick_size", "min_qty", "max_qty", "step_size")

  /** The reference's flattened perp-symbol column order
    * (crypto_data_pipeline_duckdb.py:121-145). */
  val perpColumns: Seq[String] = Seq(
    "symbol", "base_asset", "quote_asset", "margin_asset", "exchange", "type",
    "underlyingSubType", "status", "onboard_date", "delivery_date",
    "price_precision", "quantity_precision",
    "min_price", "max_price", "tick_size", "min_qty", "max_qty", "step_size")

  private def d(c: Column, name: String): Column = c.cast(DoubleType).as(name)

  /** Explode one-page-per-row SPOT exchange-info payloads into
    * flattened, typed symbol rows: PRICE_FILTER / LOT_SIZE are picked
    * out of the nested filters list BY TYPE in-plan (a codegen'd array
    * `filter`, the declarative form of the reference's
    * `next(f for f in filters if f['filterType'] == ...)`; a missing
    * filter yields nulls, matching the reference's `if price_filter
    * else None`). */
  def parseSpotSymbols(raw: DataFrame, payloadCol: String,
                       passthrough: Seq[String] = Nil): DataFrame = {
    val o = col("__s")
    // `get` (not getItem) — NULL on a missing filter under ANSI mode,
    // the reference's `if price_filter else None`
    def pick(t: String): Column =
      get(filter(o.getField("filters"), f => f.getField("filterType") === t), lit(0))
    raw
      .withColumn("__s", explode(from_json(col(payloadCol), spotSchema)))
      .withColumn("__pf", pick("PRICE_FILTER"))
      .withColumn("__lf", pick("LOT_SIZE"))
      .select(Seq[Column](
        o.getField("symbol").as("symbol"),
        o.getField("baseAsset").as("base_asset"),
        o.getField("quoteAsset").as("quote_asset"),
        lit("binance").as("exchange"),
        lit("SPOT").as("type"),
        o.getField("status").as("status"),
        o.getField("isSpotTradingAllowed").as("is_spot_trading_allowed"),
        o.getField("isMarginTradingAllowed").as("is_margin_trading_allowed"),
        o.getField("baseAssetPrecision").cast(LongType).as("base_precision"),
        o.getField("quoteAssetPrecision").cast(LongType).as("quote_precision"),
        d(col("__pf").getField("minPrice"), "min_price"),
        d(col("__pf").getField("maxPrice"), "max_price"),
        d(col("__pf").getField("tickSize"), "tick_size"),
        d(col("__lf").getField("minQty"), "min_qty"),
        d(col("__lf").getField("maxQty"), "max_qty"),
        d(col("__lf").getField("stepSize"), "step_size")
      ) ++ passthrough.map(col): _*)
  }

  /** Explode one-page-per-row UM-futures exchange-info payloads into
    * flattened, typed PERPETUAL symbol rows: non-PERPETUAL contracts
    * (quarterlies) are dropped (crypto_data_pipeline_duckdb.py:119),
    * `underlyingSubType` joins to the reference's comma string (:128),
    * onboard/delivery ms-epochs lift to timestamps (:150-151), and the
    * filters are read POSITIONALLY — `filters[0]` = PRICE_FILTER,
    * `filters[1]` = LOT_SIZE — exactly as the reference indexes them
    * (:139-144). */
  def parsePerpSymbols(raw: DataFrame, payloadCol: String,
                       passthrough: Seq[String] = Nil): DataFrame = {
    val o = col("__s")
    raw
      .withColumn("__s", explode(from_json(col(payloadCol), perpSchema)))
      .filter(o.getField("contractType") === "PERPETUAL")
      .withColumn("__pf", get(o.getField("filters"), lit(0)))
      .withColumn("__lf", get(o.getField("filters"), lit(1)))
      .select(Seq[Column](
        o.getField("symbol").as("symbol"),
        o.getField("baseAsset").as("base_asset"),
        o.getField("quoteAsset").as("quote_asset"),
        o.getField("marginAsset").as("margin_asset"),
        lit("binance").as("exchange"),
        o.getField("contractType").as("type"),
        array_join(o.getField("underlyingSubType"), ",").as("underlyingSubType"),
        o.getField("status").as("status"),
        timestamp_millis(o.getField("onboardDate").cast(LongType)).as("onboard_date"),
        timestamp_millis(o.getField("deliveryDate").cast(LongType)).as("delivery_date"),
        o.getField("pricePrecision").cast(LongType).as("price_precision"),
        o.getField("quantityPrecision").cast(LongType).as("quantity_precision"),
        d(col("__pf").getField("minPrice"), "min_price"),
        d(col("__pf").getField("maxPrice"), "max_price"),
        d(col("__pf").getField("tickSize"), "tick_size"),
        d(col("__lf").getField("minQty"), "min_qty"),
        d(col("__lf").getField("maxQty"), "max_qty"),
        d(col("__lf").getField("stepSize"), "step_size")
      ) ++ passthrough.map(col): _*)
  }

  /** The spot kline-fetch universe rule
    * (`select symbol from bn_spot_symbols where quote_asset in
    * ('USDT','USDC')`, crypto_data_pipeline_duckdb.py:972, :1108)
    * as an operator over the flattened spot symbol table. */
  def spotUniverse(spotSymbols: DataFrame,
                   quoteAssets: Seq[String] = Seq("USDT", "USDC")): DataFrame =
    spotSymbols.filter(col("quote_asset").isin(quoteAssets: _*)).select("symbol")

  /** The perp kline-fetch universe rule
    * (`select symbol, delivery_date from bn_perp_symbols where
    * delivery_date is not null`, crypto_data_pipeline_duckdb.py:970,
    * :1104) — the delivery date then clamps each symbol's fetch range
    * downstream (:1010-1014). */
  def perpUniverse(perpSymbols: DataFrame): DataFrame =
    perpSymbols.filter(col("delivery_date").isNotNull)
      .select("symbol", "delivery_date")
}
