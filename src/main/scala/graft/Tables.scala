package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Parquet source layer for the driver-generated testdata tables.
  *
  * The reference stores its tables (bn_spot_klines, bn_perp_klines,
  * bn_funding_rates, …) in DuckDB/ClickHouse and reads them back with SQL
  * (reference: app/src/crypto_data_pipeline_duckdb.py:1499-1544). Here the
  * store is columnar parquet read through Spark's vectorized reader, so
  * Catalyst pushes filters and prunes columns at the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table from an sf directory.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; sessions set spark.sql.legacy.parquet.nanosAsLong,
    * and the epoch-nanos long is converted here to a microsecond
    * timestamp (floor division — same truncation DuckDB applies when it
    * reduces precision).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        // sessions not built by graft.Sessions may still infer NTZ; the
        // cast under a UTC session timezone preserves the instant
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
