package graft

import graft.sources.OptionJson
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OptionJson: the reference ClickHouse backend's option payloads as a
  * Spark source layer — exchange-info symbol flatten (nested filter
  * pick), exercise-history normalization, page-concat dedup
  * keep-first. */
class OptionJsonSpec extends SparkSpec {
  import spark.implicits._

  // one exchange-info page: a call and a put; the put lists LOT_SIZE
  // before PRICE_FILTER so the pick must match on filterType, not
  // position; decimals quoted, ints bare (the Binance mix)
  private val symbolPages = Seq(
    (1L,
      """[{"symbol": "BTC-250328-60000-C", "underlying": "BTCUSDT", "quoteAsset": "USDT",
           "unit": 1, "expiryDate": 1743148800000, "side": "CALL", "strikePrice": "60000",
           "priceScale": 2, "quantityScale": 2,
           "makerFeeRate": "0.0002", "takerFeeRate": "0.0005", "liquidationFeeRate": "0.002",
           "initialMargin": "0.15", "maintenanceMargin": "0.075",
           "minInitialMargin": "0.1", "minMaintenanceMargin": "0.05",
           "filters": [
             {"filterType": "PRICE_FILTER", "minPrice": "0.1", "maxPrice": "99999", "tickSize": "0.1"},
             {"filterType": "LOT_SIZE", "minQty": "0.01", "maxQty": "1000", "stepSize": "0.01"}]},
          {"symbol": "BTC-250328-60000-P", "underlying": "BTCUSDT", "quoteAsset": "USDT",
           "unit": 1, "expiryDate": 1743148800000, "side": "PUT", "strikePrice": "60000",
           "priceScale": 2, "quantityScale": 2,
           "makerFeeRate": "0.0002", "takerFeeRate": "0.0005", "liquidationFeeRate": "0.002",
           "initialMargin": "0.15", "maintenanceMargin": "0.075",
           "minInitialMargin": "0.1", "minMaintenanceMargin": "0.05",
           "filters": [
             {"filterType": "LOT_SIZE", "minQty": "0.02", "maxQty": "500", "stepSize": "0.02"},
             {"filterType": "PRICE_FILTER", "minPrice": "0.2", "maxPrice": "88888", "tickSize": "0.2"}]}]"""))
    .toDF("page_seq", "payload")

  test("parseSymbols: flatten, typed casts, filter picked by type not position") {
    val out = OptionJson.parseSymbols(symbolPages, "payload")
    assert(out.columns.toSeq == OptionJson.symbolColumns)
    val sch = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(sch("expiryDate") == TimestampType && sch("strikePrice") == DoubleType)
    assert(sch("priceScale") == LongType && sch("unit") == LongType)
    val put = out.filter(col("side") === "PUT").head()
    assert(put.getDouble(put.fieldIndex("minPrice")) == 0.2, "PRICE_FILTER despite being listed second")
    assert(put.getDouble(put.fieldIndex("minQty")) == 0.02)
    assert(put.getDouble(put.fieldIndex("strikePrice")) == 60000.0)
    val call = out.filter(col("side") === "CALL").head()
    assert(call.getDouble(call.fieldIndex("tickSize")) == 0.1)
    assert(out.select("exchange", "type").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("binance", "OPTION")))
  }

  // two exercise pages for BTCUSDT: page 2 re-fetches the 1743148800000
  // expiry — keep-FIRST means page 1's record wins (newest-window-first
  // pagination); plus one ETHUSDT page
  private val exercisePages = Seq(
    ("BTCUSDT", 1L,
      """[{"symbol": "BTC-250328-60000-C", "strikePrice": "60000", "realStrikePrice": "61234.5",
           "strikeResult": "REALISTIC_VALUE_STRICKEN", "expiryDate": 1743148800000}]"""),
    ("BTCUSDT", 2L,
      """[{"symbol": "BTC-250328-60000-C", "strikePrice": "60000", "realStrikePrice": "0",
           "strikeResult": "EXTRINSIC_VALUE_EXPIRED", "expiryDate": 1743148800000},
          {"symbol": "BTC-250321-55000-P", "strikePrice": "55000", "realStrikePrice": "54000",
           "strikeResult": "REALISTIC_VALUE_STRICKEN", "expiryDate": 1742544000000}]"""),
    ("ETHUSDT", 1L,
      """[{"symbol": "ETH-250328-3000-C", "strikePrice": "3000", "realStrikePrice": "3100.25",
           "strikeResult": "REALISTIC_VALUE_STRICKEN", "expiryDate": 1743148800000}]"""))
    .toDF("underlying", "page_seq", "payload")

  test("parseExercise + dedupKeepFirst: first page wins, constants and order stamped") {
    val parsed = OptionJson.parseExercise(exercisePages, "payload", "underlying", Seq("page_seq"))
    val out = OptionJson.dedupExerciseKeepFirst(parsed, col("page_seq"))
    assert(out.columns.toSeq == OptionJson.exerciseColumns)
    assert(out.count() == 3) // 2 BTC expiries + 1 ETH
    val kept = out.filter(col("symbol") === "BTC-250328-60000-C").head()
    assert(kept.getDouble(kept.fieldIndex("realStrikePrice")) == 61234.5,
      "page 1 (keep-first) beats page 2's re-fetch")
    assert(kept.getString(kept.fieldIndex("strikeResult")) == "REALISTIC_VALUE_STRICKEN")
    assert(kept.getString(kept.fieldIndex("underlying")) == "BTCUSDT")
    val sch = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(sch("expiryDate") == TimestampType && sch("realStrikePrice") == DoubleType)
  }

  // one options-kline page: object-shaped rows (not the spot/futures
  // 12-element arrays); page 2 re-fetches openTime=120000 with a heal
  private val optionKlinePages = Seq(
    ("BTC-250328-60000-C", 1L,
      """[{"open": "1.0", "high": "2.0", "low": "0.5", "close": "1.5", "volume": "10.0",
           "amount": "15.0", "interval": "1m", "tradeCount": 7,
           "takerVolume": "4.0", "takerAmount": "6.0", "openTime": 60000, "closeTime": 119999},
          {"open": "1.5", "high": "2.5", "low": "1.0", "close": "2.0", "volume": "11.0",
           "amount": "22.0", "interval": "1m", "tradeCount": 9,
           "takerVolume": "5.0", "takerAmount": "7.0", "openTime": 120000, "closeTime": 179999}]"""),
    ("BTC-250328-60000-C", 2L,
      """[{"open": "1.5", "high": "2.6", "low": "1.0", "close": "2.1", "volume": "12.0",
           "amount": "25.0", "interval": "1m", "tradeCount": 10,
           "takerVolume": "5.5", "takerAmount": "7.5", "openTime": 120000, "closeTime": 179999}]"""))
    .toDF("symbol", "page_seq", "payload")

  test("parseOptionKlines: object payloads land in the standard kline shape; keep-last heal applies") {
    val out = OptionJson.parseOptionKlines(optionKlinePages, "payload", "symbol", Seq("page_seq"))
    // identical schema to the spot/futures path: downstream dedup/merge
    // machinery applies unchanged
    val spotShaped = sources.KlineJson.parse(
      Seq(("X", 1L, """[[0,"0","0","0","0","0",1,"0",0,"0","0","0"]]"""))
        .toDF("symbol", "page_seq", "payload"),
      "payload", "symbol", "SPOT", "1m", Seq("page_seq"))
    // same names and types; nullability legitimately differs where one
    // path sources a column from the payload and the other from a lit
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      spotShaped.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val deduped = sources.KlineJson.dedupKeepLast(out, col("page_seq"))
    assert(deduped.count() == 2)
    val healed = deduped.filter(unix_millis(col("timestamp")) === 120000).head()
    assert(healed.getDouble(healed.fieldIndex("close")) == 2.1)
    assert(healed.getDouble(healed.fieldIndex("quote_volume")) == 25.0, "amount → quote_volume")
    assert(healed.getLong(healed.fieldIndex("trades_count")) == 10L, "tradeCount → trades_count")
    assert(deduped.select("type", "interval").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("OPTION", "1m")))
  }

  test("ms-epoch conversion matches the raw payload") {
    val parsed = OptionJson.parseExercise(exercisePages, "payload", "underlying")
    val r = parsed.filter(col("symbol") === "BTC-250321-55000-P")
      .select(unix_millis(col("expiryDate"))).head()
    assert(r.getLong(0) == 1742544000000L)
  }

  test("intra-page duplicate keys: the FIRST array element wins deterministically") {
    // pandas drop_duplicates(keep='first') is array-order deterministic;
    // page_seq alone can't order rows within one page — __pos must
    val page = Seq(("BTCUSDT", 1L,
      """[{"symbol": "BTC-X", "strikePrice": "1", "realStrikePrice": "111",
           "strikeResult": "A", "expiryDate": 60000},
          {"symbol": "BTC-X", "strikePrice": "1", "realStrikePrice": "222",
           "strikeResult": "B", "expiryDate": 60000}]"""))
      .toDF("underlying", "page_seq", "payload")
    val out = OptionJson.dedupExerciseKeepFirst(
      OptionJson.parseExercise(page.repartition(8), "payload", "underlying", Seq("page_seq")),
      col("page_seq")).collect()
    assert(out.length == 1)
    assert(out(0).getDouble(out(0).fieldIndex("realStrikePrice")) == 111.0)
    assert(out(0).getString(out(0).fieldIndex("strikeResult")) == "A")
  }

  test("dedupKlinesKeepLast keys on interval: mixed-interval pages don't collapse") {
    def k(ms: Long, interval: String, close: String) =
      s"""{"open": "1.0", "high": "2.0", "low": "0.5", "close": $close, "volume": "10.0",
           "amount": "15.0", "interval": "$interval", "tradeCount": 7,
           "takerVolume": "4.0", "takerAmount": "6.0", "openTime": $ms, "closeTime": ${ms + 1}}"""
    // a 1m bar and a 1h bar share openTime=0 — distinct bars, not dups
    val pages = Seq(("S", 1L, s"[${k(0, "1m", "\"1.5\"")}, ${k(0, "1h", "\"2.5\"")}]"))
      .toDF("symbol", "page_seq", "payload")
    val parsed = OptionJson.parseOptionKlines(pages, "payload", "symbol", Seq("page_seq"))
    val byInterval = OptionJson.dedupKlinesKeepLast(parsed, col("page_seq"))
      .select("interval", "close").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byInterval == Map("1m" -> 1.5, "1h" -> 2.5),
      "both intervals must survive the (symbol, interval, timestamp) dedup")
    // the spot-keyed dedup would have collapsed them — the documented trap
    assert(sources.KlineJson.dedupKeepLast(parsed, col("page_seq")).count() == 1)
  }

  test("streaming option-kline ingest: object pages land, heal and merge like spot") {
    import graft.streaming.StreamOps
    val root = java.nio.file.Files.createTempDirectory("opt_ingest").toString
    val landing = s"$root/landing"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    new java.io.File(landing).mkdirs()
    def land(name: String, rows: Seq[(String, Long, String)]): Unit = {
      val tmp = s"$root/tmp_$name"
      rows.toDF("symbol", "page_seq", "payload").coalesce(1).write.json(tmp)
      new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".json"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(landing, s"$name.json")))
    }
    def bar(ms: Long, close: String, trades: Int) =
      s"""[{"open": "1.0", "high": "2.0", "low": "0.5", "close": $close, "volume": "10.0",
            "amount": "15.0", "interval": "1m", "tradeCount": $trades,
            "takerVolume": "4.0", "takerAmount": "6.0",
            "openTime": $ms, "closeTime": ${ms + 59999}}]"""

    val sym = "BTC-250328-60000-C"
    // batch 1: page 2 heals openTime=60000 within the batch
    land("b1", Seq((sym, 1L, bar(60000, "\"1.5\"", 7)), (sym, 2L, bar(60000, "\"1.6\"", 8))))
    val q1 = StreamOps.streamingOptionKlineIngest(spark, landing, store, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    // batch 2 (restart, same checkpoint): cross-batch merge heal
    land("b2", Seq((sym, 1L, bar(60000, "\"1.7\"", 9))))
    val q2 = StreamOps.streamingOptionKlineIngest(spark, landing, store, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(store)
      .select(col("symbol"), unix_millis(col("timestamp")).as("ms"),
        col("close"), col("type"))
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getDouble(2) == 1.7, "cross-batch merge heal")
    assert(rows(0).getString(3) == "OPTION")
  }
}
