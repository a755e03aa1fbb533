package graft

import graft.ops.Skew
import graft.sinks.IncrementalPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.time.Duration

/** End-to-end incremental loop (the reference's scheduler as a
  * library) and the skew-salting join. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("incremental ticks: full load, then delta with overlap heal, idempotent watermark") {
    val dir = Files.createTempDirectory("graft_incr").toString + "/t"

    // the "exchange": rows appear over time; a later fetch revises row (BTC, m1)
    val page1 = Seq(("BTC", "d1", ts(0), 100.0), ("BTC", "d1", ts(1), 101.0))
    val page2 = Seq(("BTC", "d1", ts(1), 999.0), ("BTC", "d1", ts(2), 102.0), ("ETH", "d1", ts(2), 10.0))
    var source: Seq[(String, String, java.sql.Timestamp, Double)] = page1

    def fetch(lb: Option[java.sql.Timestamp]): DataFrame = {
      val df = source.toDF("symbol", "day", "ts", "close")
      lb match { case Some(t) => df.filter(col("ts") >= lit(t)); case None => df }
    }

    // tick 1: empty store → full load
    val n1 = IncrementalPipeline.tick(spark, dir, fetch, Seq("symbol", "ts"), "ts",
      Duration.ofMinutes(1), "day")
    assert(n1 == 2)
    assert(IncrementalPipeline.watermark(spark, dir, "ts").contains(ts(1)))

    // tick 2: new page; overlap=1min re-fetches m1 and heals it to 999.0
    source = page2
    val n2 = IncrementalPipeline.tick(spark, dir, fetch, Seq("symbol", "ts"), "ts",
      Duration.ofMinutes(1), "day")
    assert(n2 == 3) // m1 (healed) + m2 BTC + m2 ETH
    val got = spark.read.parquet(dir).select("symbol", "ts", "close")
      .as[(String, java.sql.Timestamp, Double)].collect().toSet
    assert(got == Set(
      ("BTC", ts(0), 100.0),
      ("BTC", ts(1), 999.0), // healed by overlap re-fetch
      ("BTC", ts(2), 102.0),
      ("ETH", ts(2), 10.0)))
    assert(IncrementalPipeline.watermark(spark, dir, "ts").contains(ts(2)))

    // tick 3: nothing new beyond watermark-overlap → merge is a no-op upsert
    val n3 = IncrementalPipeline.tick(spark, dir, fetch, Seq("symbol", "ts"), "ts",
      Duration.ofMinutes(1), "day")
    assert(n3 == 3) // overlap window [m1,∞) rows re-merged, values unchanged
    assert(spark.read.parquet(dir).count() == 4)
  }

  test("fetch delta dedups keep-last per PK before merging") {
    val dir = Files.createTempDirectory("graft_incr2").toString + "/t"
    def fetch(lb: Option[java.sql.Timestamp]): DataFrame =
      Seq(("BTC", "d1", ts(0), 1.0), ("BTC", "d1", ts(0), 2.0)) // duplicate PK in one batch
        .toDF("symbol", "day", "ts", "close")
    IncrementalPipeline.tick(spark, dir, fetch, Seq("symbol", "ts"), "ts",
      Duration.ofMinutes(1), "day")
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("tickAndCompact keeps a churned partition's file count bounded, data intact") {
    val dir = Files.createTempDirectory("graft_incr3").toString + "/t"
    var batch = 0
    def fetch(lb: Option[java.sql.Timestamp]): DataFrame =
      Seq(("BTC", "d1", ts(batch), batch.toDouble)).toDF("symbol", "day", "ts", "close")
    // many small ticks churn partition d1; spread writes over tasks so
    // each merge leaves several files
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      (0 until 10).foreach { i =>
        batch = i
        IncrementalPipeline.tickAndCompact(spark, dir, fetch, Seq("symbol", "ts"), "ts",
          Duration.ofMinutes(0), "day", maxFilesPerPartition = 3)
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    val files = new java.io.File(s"$dir/day=d1").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(files <= 3 + 1, s"maintenance must bound fragmentation, got $files files")
    val got = spark.read.parquet(dir).select("ts", "close")
      .as[(java.sql.Timestamp, Double)].collect().toMap
    assert(got == (0 until 10).map(i => ts(i) -> i.toDouble).toMap,
      "compaction + merges must preserve every row")
  }

  test("salted join equals plain join, with salt spreading the hot key") {
    val fact = Tables.t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val dim = Tables.t(spark, sfDir, "customer")
      .select(pmod(col("c_custkey"), lit(150L)).as("user_id"), col("c_name"))
      .groupBy("user_id").agg(first("c_name").as("c_name"))
    val plain = fact.join(dim, Seq("user_id"))
      .select("event_id", "user_id", "c_name")
    val salted = Skew.saltedJoin(fact, dim, "user_id", col("event_id"), salts = 8)
      .select("event_id", "user_id", "c_name")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }
}
