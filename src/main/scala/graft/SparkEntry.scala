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
      (TimeSeriesOps.queries, TimeSeriesOps.oracle))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    blocks.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    blocks.map(_._2).reduce(_ ++ _)
}
