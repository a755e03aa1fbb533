package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's rate-history ingest surfaces — funding rates for
  * USD-M perpetuals (crypto_data_pipline_clickhouse.py:717-940) and
  * spot-margin interest rates (:461-716) — normalized like
  * [[KlineJson]]/[[OptionJson]]: one landed page per row, `from_json`
  * → `explode` → typed projection, then a keyed keep-last dedup.
  *
  * Distinctive reference semantics kept: funding-rate numerics pass
  * through pandas `to_numeric(errors='coerce').fillna(0)` (:919-927) —
  * empty/garbage strings land as 0.0, not null — realized here as
  * cast-then-coalesce (a failed cast is null, coalesced to 0.0);
  * both tables dedup keep-LAST on their (key, ts) after the
  * page-ordered concat (:922-930, :679-683). */
object RatesJson {

  /** Parse schema for one funding-rate page. */
  val fundingSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("symbol", StringType),
    StructField("fundingTime", StringType),
    StructField("fundingRate", StringType),
    StructField("markPrice", StringType))))

  /** Parse schema for one margin-interest-rate page. */
  val marginSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("asset", StringType),
    StructField("timestamp", StringType),
    StructField("dailyInterestRate", StringType),
    StructField("vipLevel", StringType))))

  /** The reference's funding-rate column order (:934). */
  val fundingColumns: Seq[String] =
    Seq("symbol", "exchange", "type", "fundingTime", "fundingRate", "markPrice")

  /** The reference's margin-rate column order (:690). */
  val marginColumns: Seq[String] =
    Seq("asset", "exchange", "type", "timestamp", "dailyInterestRate", "vipLevel")

  /** to_numeric(errors='coerce').fillna(0): a string that fails the
    * double cast (including "") becomes 0.0, never null — try_cast,
    * because under ANSI semantics a plain cast THROWS on garbage and
    * one bad landed record would fail the whole ingest job. */
  private def coerce0(c: Column): Column = coalesce(c.try_cast(DoubleType), lit(0.0))

  /** Explode one-page-per-row funding-rate payloads into typed rows. */
  def parseFunding(raw: DataFrame, payloadCol: String,
                   passthrough: Seq[String] = Nil): DataFrame = {
    val f = col("__f")
    raw
      .select(col("*"),
        posexplode(from_json(col(payloadCol), fundingSchema)).as(Seq("__pos", "__f")))
      .select(Seq[Column](
        f.getField("symbol").as("symbol"),
        lit("binance").as("exchange"),
        lit("PERPETUAL").as("type"),
        timestamp_millis(f.getField("fundingTime").cast(LongType)).as("fundingTime"),
        coerce0(f.getField("fundingRate")).as("fundingRate"),
        coerce0(f.getField("markPrice")).as("markPrice"),
        col("__pos")
      ) ++ passthrough.map(col): _*)
  }

  /** Page-concat + dedup keep-LAST by (symbol, fundingTime); in-page
    * ties break on array position (see [[PageDedup]]). */
  def dedupFundingKeepLast(parsed: DataFrame, pageSeq: Column): DataFrame =
    PageDedup(parsed, Seq("symbol", "fundingTime"), fundingColumns, pageSeq, keepFirst = false)

  /** [[dedupFundingKeepLast]] that KEEPS the page-seq column in the
    * output — the continuous pipeline's store schema carries it as the
    * revision authority for cross-batch precedence (a late page 1
    * landing after page 2 must not roll the revision back). `seqName`
    * must be a column of `parsed` (the passthrough page order). */
  def dedupFundingKeepLastSeq(parsed: DataFrame, seqName: String): DataFrame =
    PageDedup(parsed, Seq("symbol", "fundingTime"), fundingColumns :+ seqName,
      col(seqName), keepFirst = false)

  /** Explode one-page-per-row margin-interest-rate payloads into typed
    * rows (type constant 'Margin', reference casing :688). */
  def parseMargin(raw: DataFrame, payloadCol: String,
                  passthrough: Seq[String] = Nil): DataFrame = {
    val m = col("__m")
    raw
      .select(col("*"),
        posexplode(from_json(col(payloadCol), marginSchema)).as(Seq("__pos", "__m")))
      .select(Seq[Column](
        m.getField("asset").as("asset"),
        lit("binance").as("exchange"),
        lit("Margin").as("type"),
        timestamp_millis(m.getField("timestamp").cast(LongType)).as("timestamp"),
        m.getField("dailyInterestRate").cast(DoubleType).as("dailyInterestRate"),
        m.getField("vipLevel").cast(LongType).as("vipLevel"),
        col("__pos")
      ) ++ passthrough.map(col): _*)
  }

  /** Page-concat + dedup keep-LAST by (asset, timestamp); in-page
    * ties break on array position (see [[PageDedup]]). */
  def dedupMarginKeepLast(parsed: DataFrame, pageSeq: Column): DataFrame =
    PageDedup(parsed, Seq("asset", "timestamp"), marginColumns, pageSeq, keepFirst = false)
}
