package graft

import org.apache.spark.sql.functions._

/** Round-13 contract pins: the legacy (pre-batch_id) gram-store
  * migration path of streamingNgramNovelty. A store written by the
  * old flat-append layout has no batch_id column and no partition
  * directories; the first post-upgrade batch must (a) not throw,
  * (b) treat every legacy gram as history (backfilled into
  * batch_id=-1, strictly before any replayable batch), and (c) leave
  * the store in the new partitioned layout. */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  test("streamingNgramNovelty migrates a legacy flat gram store in place") {
    val base = java.nio.file.Files.createTempDirectory("graft_legacy_").toString
    try {
      new java.io.File(s"$base/landing").mkdirs()
      // the same 8-gram + hash pipeline the operator runs, minus batch_id:
      // doc -1's grams land in the store the OLD layout way (flat files)
      val seen = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      Seq(-1L -> seen).toDF("doc_id", "text")
        .select(F.words(col("text")).as("__ws"))
        .select(explode(expr(
          "transform(sequence(0, size(__ws)-8), i -> array_join(slice(__ws, i+1, 8), ' '))")).as("__g"))
        .select(F.hash60(col("__g")).as("__h")).distinct()
        .write.mode("overwrite").parquet(s"$base/grams") // FLAT: no batch_id
      assert(!spark.read.parquet(s"$base/grams").columns.contains("batch_id"))
      // first post-upgrade batch: one doc REPEATING the legacy text
      // (novelty must be 0 — history seen), one fresh doc (novelty 1)
      Seq((1L, seen), (2L, "one two three four five six seven eight nine ten"))
        .toDF("doc_id", "text").coalesce(1)
        .write.mode("append").json(s"$base/landing")
      val stream = spark.readStream.schema("doc_id LONG, text STRING")
        .json(s"$base/landing")
      val q = streaming.StreamOps.streamingNgramNovelty(spark, stream,
        s"$base/grams", s"$base/novelty", s"$base/ckpt")
      try q.processAllAvailable() finally q.stop()
      val out = spark.read.parquet(s"$base/novelty")
        .select("doc_id", "novelty").as[(Long, Double)].collect().toMap
      assert(out(1L) == 0.0, s"legacy grams must count as history, got novelty ${out(1L)}")
      assert(out(2L) == 1.0, s"fresh doc must be fully novel, got ${out(2L)}")
      // the store is now partitioned: legacy rows under batch_id=-1
      val store = spark.read.parquet(s"$base/grams")
      assert(store.columns.contains("batch_id"), "store must be in the new layout")
      assert(store.filter(col("batch_id") === -1L).count() > 0L,
        "legacy grams must live in the batch_id=-1 partition")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(base))
    }
  }
}
