package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The one page-concat dedup all ingest sources share: keep exactly
  * one row per key set, ordered by (page_seq, in-page array position
  * `__pos`). The position tie-break matters: pandas
  * `drop_duplicates(keep='first'/'last')` is ARRAY-ORDER
  * deterministic, but a window ordered by page_seq alone picks an
  * arbitrary survivor among duplicates WITHIN one page (Spark's sort
  * is not stable) — so every parse function emits `__pos` from
  * posexplode and the dedup breaks ties on it. */
private[sources] object PageDedup {

  /** @param keys      dedup key columns
    * @param outCols   final projection (drops `__pos`/passthrough)
    * @param pageSeq   page order column
    * @param keepFirst true → lowest (pageSeq, __pos) wins (pandas
    *                  keep='first' on page-ordered concat); false →
    *                  highest wins (keep='last', the heal orientation) */
  def apply(parsed: DataFrame, keys: Seq[String], outCols: Seq[String],
            pageSeq: Column, keepFirst: Boolean): DataFrame = {
    val ord =
      if (keepFirst) Seq(pageSeq.asc, col("__pos").asc)
      else Seq(pageSeq.desc, col("__pos").desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    parsed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .select(outCols.map(col): _*)
  }
}
