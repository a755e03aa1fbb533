package graft

import graft.sources.RatesJson
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RatesJson: funding-rate and margin-interest-rate payload
  * normalization — the coerce-to-0.0 numeric rule, keep-last page
  * dedup, reference constants and column orders. */
class RatesJsonSpec extends SparkSpec {
  import spark.implicits._

  // page 2 re-fetches fundingTime=120000 (heal wins); one record has
  // an EMPTY fundingRate — the reference coerces it to 0.0, not null
  private val fundingPages = Seq(
    (1L, """[{"symbol": "BTCUSDT", "fundingTime": 60000, "fundingRate": "0.0001", "markPrice": "60000.5"},
             {"symbol": "BTCUSDT", "fundingTime": 120000, "fundingRate": "", "markPrice": "60010"}]"""),
    (2L, """[{"symbol": "BTCUSDT", "fundingTime": 120000, "fundingRate": "0.0002", "markPrice": "60020"}]"""))
    .toDF("page_seq", "payload")

  test("parseFunding: empty-string numerics coerce to 0.0; keep-last heal wins") {
    val parsed = RatesJson.parseFunding(fundingPages, "payload", Seq("page_seq"))
    val empties = parsed.filter(col("page_seq") === 1 && unix_millis(col("fundingTime")) === 120000).head()
    assert(empties.getDouble(empties.fieldIndex("fundingRate")) == 0.0,
      "to_numeric(errors='coerce').fillna(0) semantics")
    val out = RatesJson.dedupFundingKeepLast(parsed, col("page_seq"))
    assert(out.columns.toSeq == RatesJson.fundingColumns)
    assert(out.count() == 2)
    val healed = out.filter(unix_millis(col("fundingTime")) === 120000).head()
    assert(healed.getDouble(healed.fieldIndex("fundingRate")) == 0.0002)
    assert(out.select("exchange", "type").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("binance", "PERPETUAL")))
    val sch = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(sch("fundingTime") == TimestampType && sch("markPrice") == DoubleType)
  }

  private val marginPages = Seq(
    (1L, """[{"asset": "BTC", "timestamp": 60000, "dailyInterestRate": "0.00025", "vipLevel": 0},
             {"asset": "ETH", "timestamp": 60000, "dailyInterestRate": "0.0003", "vipLevel": 0}]"""),
    (2L, """[{"asset": "BTC", "timestamp": 60000, "dailyInterestRate": "0.00026", "vipLevel": 0}]"""))
    .toDF("page_seq", "payload")

  test("intra-page duplicate keys: the LAST array element wins deterministically") {
    val page = Seq((1L,
      """[{"symbol": "X", "fundingTime": 60000, "fundingRate": "0.1", "markPrice": "1"},
          {"symbol": "X", "fundingTime": 60000, "fundingRate": "0.2", "markPrice": "2"}]"""))
      .toDF("page_seq", "payload")
    val out = RatesJson.dedupFundingKeepLast(
      RatesJson.parseFunding(page.repartition(8), "payload", Seq("page_seq")),
      col("page_seq")).collect()
    assert(out.length == 1)
    assert(out(0).getDouble(out(0).fieldIndex("fundingRate")) == 0.2,
      "keep-last = highest (page_seq, __pos)")
  }

  test("parseMargin: typed rows, Margin constant, keep-last per (asset, timestamp)") {
    val out = RatesJson.dedupMarginKeepLast(
      RatesJson.parseMargin(marginPages, "payload", Seq("page_seq")), col("page_seq"))
    assert(out.columns.toSeq == RatesJson.marginColumns)
    assert(out.count() == 2)
    val btc = out.filter(col("asset") === "BTC").head()
    assert(btc.getDouble(btc.fieldIndex("dailyInterestRate")) == 0.00026, "page 2 wins")
    assert(btc.getString(btc.fieldIndex("type")) == "Margin")
    assert(btc.getLong(btc.fieldIndex("vipLevel")) == 0L)
    val sch = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(sch("timestamp") == TimestampType && sch("vipLevel") == LongType)
  }

  private def land(root: String, landing: String, name: String,
                   rows: Seq[(String, Long, String)]): Unit = {
    import spark.implicits._
    val tmp = s"$root/tmp_$name"
    rows.toDF("symbol", "page_seq", "payload").coalesce(1).write.json(tmp)
    new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".json"))
      .foreach(f => java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(landing, s"$name.json")))
  }

  test("streaming funding ingest: heal wins within and across batches; coerce survives the stream") {
    import graft.streaming.StreamOps
    val root = java.nio.file.Files.createTempDirectory("funding_ingest").toString
    val landing = s"$root/landing"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    new java.io.File(landing).mkdirs()
    def page(sym: String, ms: Long, rate: String) =
      s"""[{"symbol": "$sym", "fundingTime": $ms, "fundingRate": "$rate", "markPrice": "100"}]"""
    // batch 1: page 2 heals the same (symbol, ts) within the batch; one
    // garbage rate must coerce to 0.0 through the streaming path too
    land(root, landing, "b1", Seq(
      ("BTCUSDT", 1L, page("BTCUSDT", 60000, "0.001")),
      ("BTCUSDT", 2L, page("BTCUSDT", 60000, "0.002")),
      ("ETHUSDT", 1L, page("ETHUSDT", 60000, "oops"))))
    val q1 = StreamOps.streamingFundingIngest(spark, landing, store, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    val after1 = spark.read.parquet(store)
      .select(col("symbol"), unix_millis(col("fundingTime")).as("ms"), col("fundingRate"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(after1(("BTCUSDT", 60000L)) == 0.002, "in-batch heal: higher page_seq wins")
    assert(after1(("ETHUSDT", 60000L)) == 0.0, "coerce-to-0 garbage rule holds in-stream")
    // batch 2, restarted query on the same checkpoint: cross-batch heal
    land(root, landing, "b2", Seq(("BTCUSDT", 1L, page("BTCUSDT", 60000, "0.003"))))
    val q2 = StreamOps.streamingFundingIngest(spark, landing, store, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val after2 = spark.read.parquet(store)
      .select(col("symbol"), unix_millis(col("fundingTime")).as("ms"), col("fundingRate"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(after2(("BTCUSDT", 60000L)) == 0.003, "cross-batch heal: merge overrides the store")
    assert(after2.size == 2)
  }

  test("streaming margin ingest: asset-partitioned store, keyed (asset, timestamp)") {
    import graft.streaming.StreamOps
    val root = java.nio.file.Files.createTempDirectory("margin_ingest").toString
    val landing = s"$root/landing"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    new java.io.File(landing).mkdirs()
    def page(asset: String, ms: Long, rate: String) =
      s"""[{"asset": "$asset", "timestamp": $ms, "dailyInterestRate": "$rate", "vipLevel": 1}]"""
    land(root, landing, "b1", Seq(
      ("BTC", 1L, page("BTC", 60000, "0.00025")),
      ("ETH", 1L, page("ETH", 60000, "0.0003"))))
    val q1 = StreamOps.streamingMarginIngest(spark, landing, store, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    land(root, landing, "b2", Seq(("BTC", 1L, page("BTC", 60000, "0.00026"))))
    val q2 = StreamOps.streamingMarginIngest(spark, landing, store, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(store)
      .select(col("asset"), unix_millis(col("timestamp")).as("ms"), col("dailyInterestRate"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows(("BTC", 60000L)) == 0.00026, "heal merged into the asset-partitioned store")
    assert(rows(("ETH", 60000L)) == 0.0003)
    assert(new java.io.File(s"$store/asset=BTC").exists, "store partitioned by asset")
  }
}
