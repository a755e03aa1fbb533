package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Partitioned-parquet PK upsert — the reference's `update_table`
  * (crypto_data_pipeline_duckdb.py:1546-1594: temp table → UPDATE
  * matched → INSERT new) as a distributed sink.
  *
  * Strategy for 100 TB tables: the store is parquet partitioned by a
  * coarse time/hash column. A merge
  *   1. computes the delta's impacted partition values (a driver-side
  *      list bounded by the partition count, NOT the row count),
  *   2. reads ONLY those partitions of the base (partition pruning),
  *   3. unions base+delta and keeps the delta row per PK (one shuffle
  *      on the PK),
  *   4. rewrites only the impacted partitions via dynamic partition
  *      overwrite.
  * Untouched partitions are never read or written, so merge cost scales
  * with the delta, not the table.
  */
object MergeWriter {

  /** Upsert `delta` into the parquet table at `path`.
    *
    * @param keys         primary-key columns (delta must be unique on them)
    * @param partitionCol physical partition column; must be in both schemas
    */
  def merge(spark: SparkSession, path: String, delta: DataFrame,
            keys: Seq[String], partitionCol: String): Unit = {
    val dataCols = delta.columns.toSeq
    val impacted = delta.select(col(partitionCol)).distinct().collect().map(_.get(0))

    val base = spark.read.parquet(path)
      .filter(col(partitionCol).isInStr(impacted))
      .select(dataCols.map(col): _*)

    // delta (priority 1) overrides base (priority 0) per PK: one shuffle
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__prio").desc)
    val merged = base.withColumn("__prio", lit(0))
      .unionByName(delta.withColumn("__prio", lit(1)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__prio", "__rn")

    // cut lineage before overwriting the very partitions being read
    val out = merged.localCheckpoint(eager = true)
    try {
      out.write
        .mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol)
        .parquet(path)
    } finally graft.Checkpoints.free(out)
  }

  private implicit class ColOps(private val c: org.apache.spark.sql.Column) extends AnyVal {
    def isInStr(vals: Array[Any]): org.apache.spark.sql.Column = c.isin(vals.toIndexedSeq: _*)
  }
}
