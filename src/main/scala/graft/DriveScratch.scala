package graft

import org.apache.spark.sql.functions._

/** TEMP ×10 probe — delete before committing. */
object DriveScratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/x10"
    // ×10 replicas with key spread (ids/users offset per replica)
    val ev = Tables.t(spark, src, "events")
    ev.crossJoin(spark.range(10).toDF("r"))
      .select((col("event_id") + col("r") * 10000000L).as("event_id"),
        col("ts"), (col("user_id") + col("r") * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val docs = Tables.t(spark, src, "documents")
    docs.crossJoin(spark.range(10).toDF("r"))
      .select((col("doc_id") + col("r") * 10000000L).as("doc_id"),
        col("text"), col("lang"),
        concat(col("source"), lit("_"), col("r")).as("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "embeddings")
      .foreach(t => Tables.t(spark, src, t).write.mode("overwrite").parquet(s"$out/$t.parquet"))

    def time(q: String): Unit = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, out).count()
      println(f"PROBE $q: rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    Seq("q50_funnel", "q51_retention", "t11_bm25", "t12_bpe_train",
      "ds12_weighted_sample", "ds13_quality_prune", "q49_quantile_bins",
      "ds10_profile", "ds11_checks", "st05_stream_quality").foreach(time)
    spark.stop()
  }
}
