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
}
