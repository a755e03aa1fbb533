package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Five-way fact⋈dims revenue rollup (SURVEY §2 #2). */
  def entry(spark: SparkSession): DataFrame =
    CoreOps.queries("q02_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  private val blocks: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (CoreOps.queries, CoreOps.oracle),
      (DataOps.queries, DataOps.oracle),
      (TimeSeriesOps.queries, TimeSeriesOps.oracle),
      (BehaviorOps.queries, BehaviorOps.oracle),
      (FinOps.queries, FinOps.oracle),
      (IndicatorOps.queries, IndicatorOps.oracle),
      (EconOps.queries, EconOps.oracle),
      (TextStatsOps.queries, TextStatsOps.oracle),
      (ScanOps.queries, ScanOps.oracle),
      (DedupOps.queries, DedupOps.oracle),
      (TextOps.queries, TextOps.oracle),
      (SimOps.queries, SimOps.oracle),
      (MultiOps.queries, MultiOps.oracle),
      (QualityOps.queries, QualityOps.oracle),
      (IngestOps.queries, IngestOps.oracle),
      (graft.streaming.StreamOps.queries, graft.streaming.StreamOps.oracle))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    blocks.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    *
    * Every `round(X, n)` is mechanically rewritten to
    * `floor((X) * 10ⁿ.0 + 0.5) / 10ⁿ.0` — the same IEEE double sequence
    * [[F.r4]]/[[F.r6]] emit on the Spark side, so exact-half values can't
    * diverge between engines (Spark round is HALF_UP on the shortest
    * decimal string; DuckDB rounds the binary value). */
  def oracleSql: Map[String, String] =
    blocks.map(_._2).reduce(_ ++ _).map { case (k, v) => k -> rewriteRounds(v) }

  /** Rewrite each top-level `round(X, n)` (args never contain string
    * literals in our oracles) into the floor-based form. */
  private[graft] def rewriteRounds(sql: String): String = {
    val i = {
      var p = sql.indexOf("round(")
      while (p > 0 && (sql(p - 1).isLetterOrDigit || sql(p - 1) == '_')) // skip bround etc.
        p = sql.indexOf("round(", p + 1)
      p
    }
    if (i < 0) sql
    else {
      val open = i + "round".length
      var depth = 0
      var j = open
      var lastTopComma = -1
      while ({ val c = sql(j); c != ')' || depth != 1 }) {
        sql(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 1 => lastTopComma = j
          case _ =>
        }
        j += 1
      }
      val arg = sql.substring(open + 1, lastTopComma).trim
      val n = sql.substring(lastTopComma + 1, j).trim.toInt
      val scale = "1" + ("0" * n) + ".0"
      sql.substring(0, i) + s"floor(($arg) * $scale + 0.5) / $scale" + rewriteRounds(sql.substring(j + 1))
    }
  }
}
