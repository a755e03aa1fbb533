package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporary probe harness (deleted before round end): round-7 scale
  * probes — deque rolling extrema vs frame min/max at small and LARGE
  * n, plus q44/q45/q46/q47/d08 on ×50-events / ×10-docs replicas. */
object DriveScratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"

    val evOut = "/tmp/x50_events_r7"
    if (!new java.io.File(evOut).exists) {
      Tables.t(spark, sf, "events")
        .withColumn("r", explode(sequence(lit(0), lit(49))))
        .withColumn("event_type", concat(col("event_type"), lit("_"), col("r")))
        .drop("r")
        .write.mode("overwrite").parquet(evOut)
    }
    val docsOut = "/tmp/x10_docs_r7"
    if (!new java.io.File(docsOut).exists) {
      Tables.t(spark, sf, "documents")
        .withColumn("r", explode(sequence(lit(0), lit(9))))
        .withColumn("doc_id", col("doc_id") + col("r") * lit(1000000L))
        .drop("r")
        .write.mode("overwrite").parquet(docsOut)
    }
    val ev = spark.read.parquet(evOut)
    val docs = spark.read.parquet(docsOut)
    println(s"events x50 rows=${ev.count()} keys=${ev.select("event_type").distinct.count()}; docs x10=${docs.count()}")

    def time(label: String)(mk: => DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"PROBE $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    def frameExtrema(n: Int): DataFrame = {
      val ord = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      val fr = ord.rowsBetween(-(n - 1), Window.currentRow)
      ev.select(col("event_type"), col("event_id"),
        when(row_number().over(ord) >= n, min(col("value")).over(fr)).as("roll_min"),
        when(row_number().over(ord) >= n, max(col("value")).over(fr)).as("roll_max"))
    }

    time("deque rollingExtrema n=20")(
      ops.ScanOps.rollingExtremaOf(ev, "event_type", "ts", "event_id", "value", 20))
    time("frame min/max       n=20")(frameExtrema(20))
    time("deque rollingExtrema n=2000")(
      ops.ScanOps.rollingExtremaOf(ev, "event_type", "ts", "event_id", "value", 2000))
    time("frame min/max       n=2000")(frameExtrema(2000))

    time("q44 macd (x50)")(
      ops.ScanOps.macdOf(ev, "event_type", "ts", "event_id", "value", 12, 26, 9))

    val bars = Graft.resampleOhlc(ev, "event_type", "ts", "event_id", "value", "hour")
    time("q45 stochastic bars (x50)")(
      Graft.stochastic(bars, "event_type", "bucket", "high", "low", "close", 14, 3))
    time("q47 winsorize (x50)")(
      Graft.winsorize(ev, "event_type", "value", 0.01, 0.99))
    time("d08 stripBoilerplate (x10 docs)")(
      Graft.stripBoilerplate(docs, "doc_id", "text", " ", 0.78))
    time("a04 heavyHitters (x10 docs)")(
      Graft.heavyHitters(docs, "text", k = 20))
    time("t10 winnowPairs (x10 all-copies)")(
      Graft.winnowPairs(docs, "doc_id", "text", 8, 4, 0.5))

    spark.stop()
  }
}
