package graft

import graft.sources.KlineJson
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** KlineJson: the reference's REST payload normalization as a Spark
  * source layer — parse/typing/enrichment/column order, page-concat
  * dedup keep-last, pagination windows, delivery clamp. */
class KlineJsonSpec extends SparkSpec {
  import spark.implicits._

  // two pages for BTCUSDT: page 2 re-fetches ts=120000 with a fixed-up
  // close (the reference's overlap heal), plus one ETHUSDT page
  private val pages = Seq(
    ("BTCUSDT", 1L,
      """[[60000, "1.0", "2.0", "0.5", "1.5", "10.0", 119999, "15.0", 7, "4.0", "6.0", "0"],
         [120000, "1.5", "2.5", "1.0", "2.0", "11.0", 179999, "22.0", 9, "5.0", "7.0", "0"]]"""),
    ("BTCUSDT", 2L,
      """[[120000, "1.5", "2.6", "1.0", "2.1", "12.0", 179999, "25.0", 10, "5.5", "7.5", "0"]]"""),
    ("ETHUSDT", 1L,
      """[[60000, "10.0", "20.0", "5.0", "15.0", "100.0", 119999, "150.0", 70, "40.0", "60.0", "0"]]"""))
    .toDF("symbol", "page_seq", "payload")

  test("parse: typed rows, constants, and the reference's column order") {
    val out = KlineJson.parse(pages, "payload", "symbol", "SPOT", "1m", Seq("page_seq"))
    val deduped = KlineJson.dedupKeepLast(out, col("page_seq"))
    assert(deduped.columns.toSeq == KlineJson.columns)
    val sch = deduped.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(sch("timestamp") == TimestampType && sch("close_time") == TimestampType)
    assert(sch("open") == DoubleType && sch("volume") == DoubleType)
    assert(sch("trades_count") == LongType)
    assert(deduped.select("exchange", "type", "interval").distinct().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      == Seq(("binance", "SPOT", "1m")))
  }

  test("dedup keep-last: the later page wins on (symbol, timestamp)") {
    val out = KlineJson.dedupKeepLast(
      KlineJson.parse(pages, "payload", "symbol", "SPOT", "1m", Seq("page_seq")), col("page_seq"))
    assert(out.count() == 3) // 2 BTC bars + 1 ETH bar
    val healed = out.filter(col("symbol") === "BTCUSDT" && unix_millis(col("timestamp")) === 120000)
      .select("close", "trades_count").head()
    assert(healed.getDouble(0) == 2.1 && healed.getLong(1) == 10L)
  }

  test("ms-epoch conversion matches the raw payload") {
    val out = KlineJson.parse(pages, "payload", "symbol", "PERPETUAL", "1m")
    val r = out.filter(col("symbol") === "ETHUSDT")
      .select(unix_millis(col("timestamp")), unix_millis(col("close_time"))).head()
    assert(r.getLong(0) == 60000L && r.getLong(1) == 119999L)
  }

  test("streaming ingest end-to-end: pages land, heal wins within and across batches") {
    val root = java.nio.file.Files.createTempDirectory("kline_ingest").toString
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
      s"""[[$ms, "1.0", "2.0", "0.5", $close, "10.0", ${ms + 59999}, "15.0", $trades, "4.0", "6.0", "0"]]"""

    // batch 1: two pages — page 2 heals ts=60000 within the batch
    land("b1", Seq(("BTCUSDT", 1L, bar(60000, "\"1.5\"", 7)), ("BTCUSDT", 2L, bar(60000, "\"1.6\"", 8))))
    val q1 = StreamOps.streamingKlineIngest(spark, landing, store, "SPOT", "1m", ckpt)
    try q1.processAllAvailable() finally q1.stop()
    val afterB1 = spark.read.parquet(store)
      .filter(unix_millis(col("timestamp")) === 60000).select("close").head().getDouble(0)
    assert(afterB1 == 1.6, s"in-batch heal: higher page_seq must win, got $afterB1")

    // batch 2 (restarted query, same checkpoint): re-fetch heals it again
    land("b2", Seq(("BTCUSDT", 1L, bar(60000, "\"1.7\"", 9)), ("ETHUSDT", 1L, bar(120000, "\"9.0\"", 3))))
    val q2 = StreamOps.streamingKlineIngest(spark, landing, store, "SPOT", "1m", ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(store)
      .select(col("symbol"), unix_millis(col("timestamp")).as("ms"), col("close"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows(("BTCUSDT", 60000L)) == 1.7, "cross-batch heal: merge must override the store")
    assert(rows(("ETHUSDT", 120000L)) == 9.0, "new symbol partition inserted")
    assert(rows.size == 2)
  }

  test("pageWindows: limit-sized steps covering [start, end)") {
    val w = KlineJson.pageWindows(0L, 10 * 60000L, 60000L, 3)
    assert(w == Seq((0L, 180000L), (180000L, 360000L), (360000L, 540000L), (540000L, 600000L)))
    assert(w.forall { case (s, e) => e > s && (e - s) <= 3 * 60000L })
  }

  test("clampToDelivery: ranges never cross the delivery date") {
    assert(KlineJson.clampToDelivery(0L, 100L, Some(50L)) == Some((0L, 50L)))
    assert(KlineJson.clampToDelivery(0L, 100L, None) == Some((0L, 100L)))
    assert(KlineJson.clampToDelivery(60L, 100L, Some(50L)) == None)
  }
}
