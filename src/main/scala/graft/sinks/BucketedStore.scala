package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed storage for co-located joins.
  *
  * The reference's hot join (perp ⋈ spot klines on (symbol, ts),
  * crypto_data_pipeline_duckdb.py:1229-1243) repeats every update
  * cycle. At 100 TB the shuffle dominates that join; bucketing both
  * tables by the join key at write time makes every subsequent join
  * shuffle-free: Spark's scan reports the bucketed distribution and
  * the join planner skips both Exchanges (verified in
  * BucketedStoreSpec by asserting the physical plan has no shuffle).
  *
  * Buckets also bound memory per task deterministically — size
  * `buckets` so each bucket ≈ one task's working set at the target
  * scale, and keep the SAME bucket count on both sides of a
  * co-located join.
  */
object BucketedStore {

  /** Write `df` as a bucketed, bucket-sorted table. */
  def write(spark: SparkSession, df: DataFrame, table: String,
            bucketCols: Seq[String], buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
