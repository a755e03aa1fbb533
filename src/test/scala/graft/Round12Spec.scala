package graft

import org.apache.spark.sql.functions._

/** Round-12 invariants: the ljungBox short-series contract (a series
  * with n_obs ≤ h emits its row with null q_stat instead of
  * vanishing) and streamingNgramNovelty replay idempotency (a
  * replayed micro-batch overwrites its own partitions and scores
  * against the history it saw the first time — never against its own
  * grams). */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  test("q93 ljungBox: a series shorter than h+1 emits a null-q_stat row, not no row") {
    val long = (1 to 50).map(i =>
      ("long", new java.sql.Timestamp(1700000000000L + i * 3600000L),
        (scala.util.hashing.MurmurHash3.stringHash(s"lb12:$i") % 1000) / 10.0))
    // 6 observations: lags 1..5 have pairs, lags 6..10 have none
    val short = (1 to 6).map(i =>
      ("short", new java.sql.Timestamp(1700000000000L + i * 3600000L), i * 1.0 + (i % 2)))
    val out = ops.EconOps.ljungBoxOf((long ++ short).toDF("sym", "bucket", "close"),
      "sym", "bucket", "close").orderBy("series").collect()
    assert(out.length == 2, "both series must appear")
    val l = out(0); val s = out(1)
    assert(l.getString(0) == "long" && !l.isNullAt(3) && !l.isNullAt(4))
    assert(s.getString(0) == "short" && s.getLong(1) == 6L)
    assert(s.isNullAt(3) && s.isNullAt(4),
      "with n_obs <= h the test is undefined: null q_stat/reject, row present")
  }

  test("streamingNgramNovelty: a full-batch replay is idempotent (no dup rows, no self-history)") {
    val base = java.nio.file.Files.createTempDirectory("graft_t22r_").toString
    new java.io.File(s"$base/landing").mkdirs()
    val docs = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    docs.coalesce(1).write.mode("append").json(s"$base/landing")
    def run(ckpt: String): Unit = {
      val stream = spark.readStream.schema("doc_id LONG, text STRING")
        .json(s"$base/landing")
      val q = streaming.StreamOps.streamingNgramNovelty(spark, stream,
        s"$base/grams", s"$base/novelty", ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    run(s"$base/ckpt1")
    // fresh checkpoint = the batch replays as batch_id 0 against a
    // store that already holds batch 0's grams — exactly the
    // crash-before-checkpoint-commit window the delivery contract
    // must survive
    run(s"$base/ckpt2")
    val streamed = spark.read.parquet(s"$base/novelty")
      .select("doc_id", "n_grams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val batch = ops.TextStatsOps.ngramNoveltyOf(docs, "doc_id", "text", n = 8)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(streamed == batch,
      "replay must overwrite its own partition and reproduce the first-run verdicts")
  }
}
