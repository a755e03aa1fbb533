package graft

import graft.sources.SymbolJson
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SymbolJson: the reference DuckDB backend's spot/UM-perp
  * exchange-info payloads as a Spark source layer — typed symbol-dim
  * flattens (by-type filter pick for spot, positional for perp,
  * mirroring crypto_data_pipeline_duckdb.py:69-70 vs :139-144) and the
  * two kline-fetch-universe rules (:970-972). */
class SymbolJsonSpec extends SparkSpec {
  import spark.implicits._

  // one spot exchange-info page: BTCUSDT lists PRICE_FILTER first;
  // ETHBTC lists LOT_SIZE first plus a decoy filter type, so the pick
  // must match on filterType, not position; DOGEUSDC has NO price
  // filter at all (reference: `if price_filter else None` -> nulls)
  private val spotPages = Seq(
    (1L,
      """[{"symbol": "BTCUSDT", "baseAsset": "BTC", "quoteAsset": "USDT",
           "status": "TRADING", "isSpotTradingAllowed": true, "isMarginTradingAllowed": true,
           "baseAssetPrecision": 8, "quoteAssetPrecision": 2,
           "filters": [
             {"filterType": "PRICE_FILTER", "minPrice": "0.01", "maxPrice": "1000000", "tickSize": "0.01"},
             {"filterType": "LOT_SIZE", "minQty": "0.00001", "maxQty": "9000", "stepSize": "0.00001"}]},
          {"symbol": "ETHBTC", "baseAsset": "ETH", "quoteAsset": "BTC",
           "status": "TRADING", "isSpotTradingAllowed": true, "isMarginTradingAllowed": false,
           "baseAssetPrecision": 8, "quoteAssetPrecision": 8,
           "filters": [
             {"filterType": "LOT_SIZE", "minQty": "0.001", "maxQty": "5000", "stepSize": "0.001"},
             {"filterType": "ICEBERG_PARTS"},
             {"filterType": "PRICE_FILTER", "minPrice": "0.000001", "maxPrice": "922327", "tickSize": "0.000001"}]},
          {"symbol": "DOGEUSDC", "baseAsset": "DOGE", "quoteAsset": "USDC",
           "status": "BREAK", "isSpotTradingAllowed": false, "isMarginTradingAllowed": false,
           "baseAssetPrecision": 8, "quoteAssetPrecision": 4,
           "filters": [
             {"filterType": "LOT_SIZE", "minQty": "1", "maxQty": "90000000", "stepSize": "1"}]}]"""))
    .toDF("page_seq", "payload")

  test("parseSpotSymbols: flatten, typed casts, filter picked by type not position") {
    val out = SymbolJson.parseSpotSymbols(spotPages, "payload")
    assert(out.columns.toSeq == SymbolJson.spotColumns)
    val sch = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(sch("min_price") == DoubleType && sch("base_precision") == LongType)
    assert(sch("is_spot_trading_allowed") == BooleanType)
    assert(out.count() == 3)
    val eth = out.filter(col("symbol") === "ETHBTC").head()
    assert(eth.getDouble(eth.fieldIndex("min_price")) == 0.000001,
      "PRICE_FILTER despite being listed after LOT_SIZE and a decoy")
    assert(eth.getDouble(eth.fieldIndex("min_qty")) == 0.001)
    assert(!eth.getBoolean(eth.fieldIndex("is_margin_trading_allowed")))
    val doge = out.filter(col("symbol") === "DOGEUSDC").head()
    assert(doge.isNullAt(doge.fieldIndex("min_price")), "no PRICE_FILTER -> null, not a crash")
    assert(doge.getDouble(doge.fieldIndex("step_size")) == 1.0)
    assert(out.select("exchange", "type").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("binance", "SPOT")))
  }

  // one UM-futures page: a PERPETUAL, a CURRENT_QUARTER (must be
  // dropped), and a delisting PERPETUAL with a null deliveryDate;
  // filters are positional — [0]=PRICE_FILTER, [1]=LOT_SIZE
  private val perpPages = Seq(
    (1L,
      """[{"symbol": "BTCUSDT", "baseAsset": "BTC", "quoteAsset": "USDT", "marginAsset": "USDT",
           "contractType": "PERPETUAL", "underlyingSubType": ["PoW", "Layer1"],
           "status": "TRADING", "onboardDate": 1569398400000, "deliveryDate": 4133404800000,
           "pricePrecision": 2, "quantityPrecision": 3,
           "filters": [
             {"filterType": "PRICE_FILTER", "minPrice": "556.8", "maxPrice": "4529764", "tickSize": "0.1"},
             {"filterType": "LOT_SIZE", "minQty": "0.001", "maxQty": "1000", "stepSize": "0.001"}]},
          {"symbol": "BTCUSDT_250926", "baseAsset": "BTC", "quoteAsset": "USDT", "marginAsset": "USDT",
           "contractType": "CURRENT_QUARTER", "underlyingSubType": ["PoW"],
           "status": "TRADING", "onboardDate": 1750000000000, "deliveryDate": 1758873600000,
           "pricePrecision": 1, "quantityPrecision": 3,
           "filters": [
             {"filterType": "PRICE_FILTER", "minPrice": "556.8", "maxPrice": "4529764", "tickSize": "0.1"},
             {"filterType": "LOT_SIZE", "minQty": "0.001", "maxQty": "500", "stepSize": "0.001"}]},
          {"symbol": "ALPACAUSDT", "baseAsset": "ALPACA", "quoteAsset": "USDT", "marginAsset": "USDT",
           "contractType": "PERPETUAL", "underlyingSubType": ["DEFI"],
           "status": "SETTLING", "onboardDate": 1618560000000, "deliveryDate": null,
           "pricePrecision": 4, "quantityPrecision": 0,
           "filters": [
             {"filterType": "PRICE_FILTER", "minPrice": "0.001", "maxPrice": "2000", "tickSize": "0.0001"},
             {"filterType": "LOT_SIZE", "minQty": "1", "maxQty": "10000000", "stepSize": "1"}]}]"""))
    .toDF("page_seq", "payload")

  test("parsePerpSymbols: PERPETUAL-only, positional filters, ms-epoch dates, subtype join") {
    val out = SymbolJson.parsePerpSymbols(perpPages, "payload")
    assert(out.columns.toSeq == SymbolJson.perpColumns)
    val sch = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(sch("onboard_date") == TimestampType && sch("delivery_date") == TimestampType)
    assert(sch("price_precision") == LongType && sch("tick_size") == DoubleType)
    assert(out.count() == 2, "the quarterly contract is dropped")
    val btc = out.filter(col("symbol") === "BTCUSDT").head()
    assert(btc.getString(btc.fieldIndex("underlyingSubType")) == "PoW,Layer1",
      "list joined to the reference's comma string")
    assert(btc.getDouble(btc.fieldIndex("min_price")) == 556.8)
    assert(btc.getDouble(btc.fieldIndex("step_size")) == 0.001)
    assert(btc.getTimestamp(btc.fieldIndex("onboard_date")).getTime == 1569398400000L)
    assert(btc.getString(btc.fieldIndex("type")) == "PERPETUAL")
    val alp = out.filter(col("symbol") === "ALPACAUSDT").head()
    assert(alp.isNullAt(alp.fieldIndex("delivery_date")))
  }

  test("spotUniverse / perpUniverse: the two kline-fetch rules") {
    val spot = SymbolJson.parseSpotSymbols(spotPages, "payload")
    val su = SymbolJson.spotUniverse(spot).as[String].collect().sorted
    assert(su.toSeq == Seq("BTCUSDT", "DOGEUSDC"), "quote_asset IN (USDT, USDC); ETHBTC excluded")
    assert(SymbolJson.spotUniverse(spot, Seq("BTC")).as[String].collect().toSeq == Seq("ETHBTC"))
    val perp = SymbolJson.parsePerpSymbols(perpPages, "payload")
    val pu = SymbolJson.perpUniverse(perp)
    assert(pu.columns.toSeq == Seq("symbol", "delivery_date"))
    assert(pu.as[(String, java.sql.Timestamp)].collect().map(_._1).toSeq == Seq("BTCUSDT"),
      "null delivery_date excluded from the fetch universe")
  }
}
