package graft

import org.apache.spark.sql.functions._
import graft.ops.{CoreOps, FinOps}

/** Round-11 invariants: the gate-artifact query-count lock (a late-
  * landing query must mechanically fail the build instead of slipping
  * the round-exit determinism dump — the round-9/10 escape class), and
  * the realized-error bounds for the executable approx swaps
  * (a06/a07/a08 — the q47/q49/q62 documented `approx_percentile`
  * trades turned into tested code paths). */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  test("GATE.json query count equals SparkEntry.queries.size (stale-gate lock)") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("GATE.json")))
    val m = """"queries"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
    assert(m.isDefined, "GATE.json must carry a numeric \"queries\" field")
    val gate = m.get.group(1).toInt
    assert(gate == SparkEntry.queries.size,
      s"GATE.json records $gate queries but SparkEntry has " +
        s"${SparkEntry.queries.size} — refresh the round-exit gate " +
        "(determinism dump + parity + GATE.json) for the late addition")
  }

  test("a06 winsorize approx: clip membership drifts at most the sketch rank bound") {
    // approx_percentile guarantees rank error <= n/accuracy per cut;
    // plus <=1 rank each side because the exact cut INTERPOLATES where
    // the sketch returns a data element. Two cuts -> 2*(n/acc + 2).
    val rows = SparkEntry.queries("a06_winsorize_approx")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      val diff = r.getLong(2)
      val bound = 2L * (n / 10000L + 2L)
      assert(diff <= bound, s"${r.getString(0)}: clip_diff_rows $diff > bound $bound (n=$n)")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= n)
      assert(r.getLong(4) >= 0 && r.getLong(4) <= n)
    }
  }

  test("a07 quantile bins approx: moved rows bounded by 9 shifted cuts, 1 bin max") {
    val rows = SparkEntry.queries("a07_bins_approx")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      val moved = r.getLong(2)
      val bound = 9L * (n / 10000L + 2L)
      assert(moved <= bound, s"${r.getString(0)}: moved_rows $moved > bound $bound (n=$n)")
      if (!r.isNullAt(3))
        assert(r.getInt(3) <= 1,
          "a sub-rank cut shift can move a row at most one bin")
    }
  }

  test("a08 VaR/ES approx: tail membership and ES ordering hold in both modes") {
    val rows = SparkEntry.queries("a08_var_es_approx")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nObs = r.getLong(1)
      val (varEx, varAp) = (r.getDouble(2), r.getDouble(3))
      val (esEx, esAp) = (r.getDouble(4), r.getDouble(5))
      val (ntEx, ntAp) = (r.getLong(6), r.getLong(7))
      assert(math.abs(ntEx - ntAp) <= nObs / 10000L + 2L,
        s"${r.getString(0)}: tail count drift ${math.abs(ntEx - ntAp)} too large")
      // the ES is a mean over returns <= the cut, in BOTH modes
      assert(esEx <= varEx + 1e-9 && esAp <= varAp + 1e-9,
        "expected shortfall must not exceed its VaR cut")
      assert(!varAp.isNaN && !esAp.isNaN)
    }
  }

  test("componentsStar equals label-prop components on the d06 near-dup graph") {
    val pairs = SparkEntry.queries("d02_minhash_lsh")(spark, sfDir)
      .filter(col("est_sim") >= 0.5).select("doc_a", "doc_b")
    def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      df.as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val lp = labelMap(ops.DedupOps.components(pairs, "doc_a", "doc_b"))
    val st = labelMap(ops.DedupOps.componentsStar(pairs, "doc_a", "doc_b"))
    assert(lp.nonEmpty && st == lp,
      "both algorithms must produce identical (label, size) per node")
  }

  test("componentsStar: 300-node chain converges in O(log n) rounds, label-prop in O(n)") {
    val chain = spark.range(299)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val st = ops.DedupOps.componentsStar(chain, "doc_a", "doc_b")
      .as[(Long, Long, Long)].collect()
    val starRounds = ops.DedupOps.ccRounds.get()
    assert(st.length == 300 && st.forall(r => r._2 == 0L && r._3 == 300L),
      "one component rooted at 0 covering all 300 nodes")
    assert(starRounds <= 24,
      s"chain-300 must converge in O(log n) alternating rounds, took $starRounds")
    // the label-prop baseline on a shorter chain: rounds ~ diameter
    val chain40 = spark.range(39)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val lp = ops.DedupOps.components(chain40, "doc_a", "doc_b")
      .as[(Long, Long, Long)].collect()
    val lpRounds = ops.DedupOps.ccRounds.get()
    assert(lp.forall(r => r._2 == 0L && r._3 == 40L))
    assert(lpRounds >= 35,
      s"label prop on a 40-chain needs ~diameter rounds (got $lpRounds) — " +
        "this asymmetry is WHY componentsStar exists")
    assert(starRounds < lpRounds,
      "the O(log n) path must beat O(diameter) even at 300 vs 40 nodes")
  }

  test("componentsStar: self-pairs are singletons, empty input is empty, cliques merge") {
    val mixed = Seq((5L, 5L), (1L, 2L), (2L, 3L), (7L, 8L), (8L, 7L))
      .toDF("doc_a", "doc_b")
    val out = ops.DedupOps.componentsStar(mixed, "doc_a", "doc_b")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (5L, 5L, 1L), (7L, 7L, 2L), (8L, 7L, 2L)))
    val empty = ops.DedupOps.componentsStar(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), "doc_a", "doc_b")
    assert(empty.count() == 0L)
  }

  test("t22 novelty: an exact duplicate scores 0, the first occurrence owns its grams") {
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text), (3L, other)).toDF("doc_id", "text")
    val out = ops.TextStatsOps.ngramNoveltyOf(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(0)._4 == 1.0, "doc 1 owns every gram it introduces")
    assert(out(1)._4 == 0.0, "an exact duplicate introduces nothing")
    assert(out(2)._4 == 1.0, "disjoint content is fully novel")
    assert(out(0)._2 == 40 - 8 + 1, "distinct 8-gram count")
  }

  test("ds22 curve: monotone non-increasing in tau, docs bounded by pair mass") {
    val rows = SparkEntry.queries("ds22_dedup_curve")(spark, sfDir)
      .orderBy("tau").as[(Double, Long, Long)].collect()
    assert(rows.nonEmpty && rows.head._2 > 0, "the corpus has planted near-dups")
    rows.sliding(2).foreach {
      case Array((_, p1, d1), (_, p2, d2)) =>
        assert(p2 <= p1 && d2 <= d1, "raising tau cannot add pairs or docs")
      case _ =>
    }
    rows.foreach { case (_, p, d) => assert(d <= 2 * p, "each pair covers <= 2 docs") }
  }

  test("q92 ADF: white noise rejects the unit root, a random walk does not") {
    val n = 400
    val base = (1 to n).map { i =>
      ("noise", new java.sql.Timestamp(1700000000000L + i * 3600000L),
        math.sin(i * 2.7) * 5.0 + 100.0)
    }
    var acc = 100.0
    val walk = (1 to n).map { i =>
      acc += math.sin(i * 1.3) * 0.9 + math.cos(i * 7.1) * 0.9 // bounded increments
      ("walk", new java.sql.Timestamp(1700000000000L + i * 3600000L), acc)
    }
    val df = (base ++ walk).toDF("sym", "bucket", "close")
    val out = ops.EconOps.adfOf(df, "sym", "bucket", "close")
      .orderBy("series").collect()
    val noise = out(0); val rw = out(1)
    assert(noise.getString(0) == "noise" && rw.getString(0) == "walk")
    assert(noise.getDouble(4) < -2.86 && noise.getBoolean(5),
      s"mean-reverting series must reject the unit root, df=${noise.getDouble(4)}")
    assert(rw.getDouble(4) > noise.getDouble(4),
      "the random walk must look far less stationary than white noise")
  }

  test("q93 Ljung-Box: trending series rejects white noise, hash noise does not") {
    val n = 300
    val rows = (1 to n).flatMap { i =>
      val noise = (scala.util.hashing.MurmurHash3.stringHash(s"lb:$i") % 1000) / 10.0
      Seq(("trend", new java.sql.Timestamp(1700000000000L + i * 3600000L), i * 1.0),
        ("noise", new java.sql.Timestamp(1700000000000L + i * 3600000L), noise))
    }
    val df = rows.toDF("sym", "bucket", "close")
    val out = ops.EconOps.ljungBoxOf(df, "sym", "bucket", "close")
      .orderBy("series").collect()
    val noise = out(0); val trend = out(1)
    assert(!noise.getBoolean(4),
      s"hash noise must pass the white-noise test, Q=${noise.getDouble(3)}")
    assert(trend.getBoolean(4),
      s"a pure trend must reject it, Q=${trend.getDouble(3)}")
  }

  test("s19 silhouette: tight well-separated clusters score near 1") {
    def vec(center: Double, jitter: Double): Seq[Double] =
      (0 until 8).map(j => center + jitter * (j + 1) / 100.0)
    val corpus = (0L until 20L).map { i =>
      val c = if (i % 2 == 0) 1.0 else -1.0
      (i, vec(c, (i % 5).toDouble))
    }.toDF("vec_id", "v")
    val cents = Seq((0L, vec(1.0, 0.0)), (1L, vec(-1.0, 0.0))).toDF("vec_id", "v")
    val out = ops.SimOps.silhouetteOf(corpus, cents, "vec_id", "v")
      .orderBy("cell").as[(Long, Long, Double)].collect()
    assert(out.length == 2 && out.forall(_._2 == 10L), "even split over both cells")
    assert(out.forall(_._3 > 0.9), s"separated clusters must score high: ${out.toSeq}")
  }

  test("ds23 k-fold: disjoint, exhaustive, deterministic, roughly balanced") {
    val docs = Tables.t(spark, sfDir, "documents")
    val n = docs.count()
    val folded = ops.DataOps.kfoldOf(docs, "doc_id", "graft", 5)
    assert(folded.count() == n, "every doc gets exactly one fold")
    val sizes = folded.groupBy("fold").count().as[(Long, Long)].collect().toMap
    assert(sizes.keySet == (0L until 5L).toSet && sizes.values.sum == n)
    sizes.values.foreach(c => assert(math.abs(c - n / 5.0) < n * 0.2,
      s"fold sizes should be near-uniform: $sizes"))
    // rerun-stable: the assignment is a pure function of the id
    val again = ops.DataOps.kfoldOf(docs, "doc_id", "graft", 5)
      .select("doc_id", "fold").as[(Long, Long)].collect().toMap
    folded.select("doc_id", "fold").as[(Long, Long)].collect()
      .foreach { case (id, f) => assert(again(id) == f) }
  }

  test("q94 cointegration: a hedged pair passes, independent walks fail") {
    // genuinely INTEGRATED walks: hash-driven iid increments cumulated
    // (a bounded sin/cos "walk" is secretly stationary and would
    // legitimately cointegrate with anything stationary)
    def inc(salt: String, i: Int): Double =
      (scala.util.hashing.MurmurHash3.stringHash(s"$salt:$i") % 1001) / 1000.0
    val n = 400
    var wa = 100.0; var wb = 80.0
    val rows = (1 to n).flatMap { i =>
      wa += inc("a", i)
      wb += inc("b", i)
      val ts = new java.sql.Timestamp(1700000000000L + i * 3600000L)
      Seq(
        ("wa", ts, wa), ("wb", ts, wb),
        // hedged: 2*wa + stationary noise — cointegrated with wa by construction
        ("hedged", ts, 2.0 * wa + math.sin(i * 2.7) * 1.5))
    }
    val df = rows.toDF("sym", "bucket", "close")
    val yes = ops.EconOps.cointTestOf(df, "sym", "bucket", "close", "hedged", "wa").collect()(0)
    val no = ops.EconOps.cointTestOf(df, "sym", "bucket", "close", "wa", "wb").collect()(0)
    assert(yes.getBoolean(5), s"hedged pair must cointegrate, df=${yes.getDouble(4)}")
    assert(!no.getBoolean(5), s"independent walks must not, df=${no.getDouble(4)}")
  }

  test("streamingNgramNovelty == batch novelty when docs arrive in doc-id order") {
    val base = java.nio.file.Files.createTempDirectory("graft_t22s_").toString
    new java.io.File(s"$base/landing").mkdirs()
    val docs = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    val cut = 250L
    def run(): Unit = {
      val stream = spark.readStream.schema("doc_id LONG, text STRING")
        .json(s"$base/landing")
      val q = streaming.StreamOps.streamingNgramNovelty(spark, stream,
        s"$base/grams", s"$base/novelty", s"$base/ckpt")
      try q.processAllAvailable() finally q.stop()
    }
    // batch 1 = low ids, drained; then batch 2 = the rest (a restart of
    // the same checkpointed pipeline, like a daily tick)
    docs.filter(col("doc_id") < cut).coalesce(1)
      .write.mode("append").json(s"$base/landing")
    run()
    docs.filter(col("doc_id") >= cut).coalesce(1)
      .write.mode("append").json(s"$base/landing")
    run()
    val streamed = spark.read.parquet(s"$base/novelty")
      .select("doc_id", "n_grams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val batch = ops.TextStatsOps.ngramNoveltyOf(docs, "doc_id", "text", n = 8)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(streamed.nonEmpty && streamed == batch,
      "in-order arrival must reproduce the batch ownership exactly")
  }

  test("q95 OU half-life: a planted AR(1) recovers its half-life; walks report null") {
    // x' = phi*x + noise with phi = 0.5: beta_hat ~ phi - 1 = -0.5,
    // kappa = -ln(0.5) = ln 2, half-life = 1 bar
    def noise(i: Int): Double =
      (scala.util.hashing.MurmurHash3.stringHash(s"ou:$i") % 1001) / 1000.0
    var x = 0.0
    var w = 100.0
    val rows = (1 to 500).flatMap { i =>
      x = 0.5 * x + noise(i)
      w += noise(i + 7919) // pure integration: no reversion
      val ts = new java.sql.Timestamp(1700000000000L + i * 3600000L)
      Seq(("ou", ts, x), ("walk", ts, w))
    }
    val out = ops.EconOps.ouHalflifeOf(rows.toDF("sym", "bucket", "close"),
      "sym", "bucket", "close").orderBy("series").collect()
    val ou = out(0); val walk = out(1)
    assert(ou.getBoolean(4), "the AR(1) must read as mean-reverting")
    assert(math.abs(ou.getDouble(6) - 1.0) < 0.35,
      s"phi=0.5 implies ~1-bar half-life, got ${ou.getDouble(6)}")
    assert(ou.getDouble(3) < -2.86, "and significantly so (the q92 gate)")
    // a finite-sample walk often has a SLIGHTLY negative beta-hat, so
    // mean_reverting (a sign flag, not a test) may be true — what must
    // hold is: no significance, and a half-life orders of magnitude
    // beyond the AR(1)'s (or none at all)
    assert(walk.getDouble(3) > -2.86,
      s"the walk must fail the significance gate, df=${walk.getDouble(3)}")
    assert(walk.isNullAt(6) || walk.getDouble(6) > 30.0,
      "a pure integration has no actionable half-life")
  }

  test("probe-fit disk cache: a cold memo reloads weights without re-running GD") {
    val dir = java.nio.file.Files.createTempDirectory("probe_cache_spec_").toString
    System.setProperty("graft.probe.cache", dir)
    try {
      val emb = Tables.t(spark, sfDir, "embeddings")
        .withColumn("y", when(col("vec_id") % 2 === 0, 1.0).otherwise(-1.0))
      val runs0 = ops.SimOps.probeFitRuns.get()
      val w1 = ops.SimOps.fitLinearProbe(emb, "vec_id", "embedding", "y",
        dims = 16, lr = 0.1, iters = 2)
      assert(ops.SimOps.probeFitRuns.get() == runs0 + 1, "first fit runs GD")
      // simulate a fresh JVM: in-memory memo gone, disk cache remains
      ops.SimOps.clearProbeMemo()
      val w2 = ops.SimOps.fitLinearProbe(emb, "vec_id", "embedding", "y",
        dims = 16, lr = 0.1, iters = 2)
      assert(ops.SimOps.probeFitRuns.get() == runs0 + 1,
        "the reload must come from disk, not a second GD run")
      assert(w1.toSeq == w2.toSeq, "reloaded weights are bit-identical")
    } finally {
      System.clearProperty("graft.probe.cache")
      ops.SimOps.clearProbeMemo()
    }
  }

  // ---- p05: the continuous market pipeline vs the p02 batch loop ----

  private def batchReport(): Seq[org.apache.spark.sql.Row] =
    SparkEntry.queries("p02_market_pipeline")(spark, sfDir).collect().toSeq

  private def landingPages(): org.apache.spark.sql.DataFrame =
    ops.IngestOps.fundingPages(spark, sfDir)
      .select(col("market").as("symbol"), col("page_seq"), col("payload"))

  private def runPipeline(base: String, watermark: String,
                          maxFiles: Int): Seq[org.apache.spark.sql.Row] = {
    val q = streaming.StreamOps.streamingMarketPipeline(
      spark, s"$base/landing", ops.IngestOps.spotSeries(spark, sfDir),
      s"$base/store", s"$base/report", s"$base/ckpt",
      watermarkDelay = watermark, maxFilesPerTrigger = maxFiles)
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(s"$base/report")
      .orderBy(col("ts_ms").desc, col("symbol")).collect().toSeq
  }

  test("p05 stream == p02 batch row-for-row at two watermark settings") {
    val expect = batchReport()
    assert(expect.nonEmpty, "the batch loop must produce extreme rows")
    Seq("10 minutes", "48 hours").foreach { wm =>
      val base = java.nio.file.Files.createTempDirectory("graft_p05_wm_").toString
      new java.io.File(s"$base/landing").mkdirs()
      val pages = landingPages()
      Seq(1L, 2L).foreach { p =>
        pages.filter(col("page_seq") === p).coalesce(1)
          .write.mode("append").json(s"$base/landing")
      }
      val got = runPipeline(base, wm, maxFiles = 1)
      assert(got == expect, s"watermark $wm: stream report must equal batch row-for-row")
    }
  }

  test("p05 stream == p02 batch when both pages land in ONE micro-batch") {
    val base = java.nio.file.Files.createTempDirectory("graft_p05_one_").toString
    new java.io.File(s"$base/landing").mkdirs()
    landingPages().coalesce(1).write.mode("append").json(s"$base/landing")
    assert(runPipeline(base, "2 hours", maxFiles = 0) == batchReport())
  }

  test("p05 revision precedence: a LATE page 1 cannot roll back page 2's revisions") {
    // page 2 lands and is processed FIRST; page 1 arrives in a later
    // restart of the same checkpointed pipeline — the store must keep
    // page 2's markPrice revisions, so the final report still equals
    // the batch heal (page_seq is the authority, not arrival order)
    val base = java.nio.file.Files.createTempDirectory("graft_p05_rev_").toString
    new java.io.File(s"$base/landing").mkdirs()
    val pages = landingPages()
    pages.filter(col("page_seq") === 2L).coalesce(1)
      .write.mode("append").json(s"$base/landing")
    runPipeline(base, "2 hours", maxFiles = 1)
    pages.filter(col("page_seq") === 1L).coalesce(1)
      .write.mode("append").json(s"$base/landing")
    val got = runPipeline(base, "2 hours", maxFiles = 1)
    assert(got == batchReport(),
      "reversed arrival must converge to the same healed report")
  }

  test("approx knob scales with accuracy: a coarse sketch stays within its own bound") {
    // accuracy=100 on ~thousands of rows: a deliberately coarse sketch
    // still respects rank error <= n/100 per cut — the bound is the
    // contract at ANY accuracy, which is what makes the 100 TB
    // swap-in safe to reason about
    val ev = Tables.t(spark, sfDir, "events")
    val n = ev.count()
    val ex = CoreOps.winsorizeOf(ev, "event_type", "value", 0.01, 0.99)
      .select(col("event_type"), col("event_id"), col("clip").as("c_ex"))
    val ap = CoreOps.winsorizeOf(ev, "event_type", "value", 0.01, 0.99,
        approx = true, accuracy = 100)
      .select(col("event_type"), col("event_id"), col("clip").as("c_ap"))
    val perKey = ex.join(ap, Seq("event_type", "event_id"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("c_ex") =!= col("c_ap"), 1L).otherwise(0L)).as("diff"))
      .as[(String, Long, Long)].collect()
    perKey.foreach { case (k, nk, diff) =>
      val bound = 2L * (nk / 100L + 2L)
      assert(diff <= bound, s"$k: diff $diff > coarse bound $bound (n=$nk)")
    }
    assert(n > 0)
  }
}
