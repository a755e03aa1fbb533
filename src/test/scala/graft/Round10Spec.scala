package graft

import java.nio.file.Files

/** Round-10 guard hardening: the drift re-measure fires at 1.5× (t01
  * escaped round 9 at 1.57× under the old 2× bar) and reads the
  * self-written complete BENCH_FULL.json, so a tail-truncated driver
  * artifact can never blind it again. */
class Round10Spec extends SparkSpec {

  private def write(dir: java.io.File, name: String, body: String): Unit =
    Files.write(new java.io.File(dir, name).toPath, body.getBytes("UTF-8"))

  test("drift re-measure threshold is 1.5x") {
    assert(Bench.DriftFactor == 1.5)
  }

  test("previousRoundTimes: BENCH_FULL.json completes and overrides a truncated round artifact") {
    val dir = Files.createTempDirectory("bench_full").toFile
    // the round artifact lost its head (round-9 shape): only one query
    // survives the tail, with a stale time
    write(dir, "BENCH_r9.json",
      """"t01_lang_id":9.99},"errors":{},"reruns":{},""" +
        """"jvm_chunks":12,"sf":"/root/testdata/sf0.1","n":179,"metric":"total","value":185.2,"unit":"sec"}""")
    write(dir, Bench.FullArtifact,
      """{"queries":{"q01_pricing_summary":0.61,"t01_lang_id":0.88},"errors":{},"reruns":{},""" +
        """"jvm_chunks":12,"sf":"/root/testdata/sf0.1","n":2,"metric":"total","value":1.49,"unit":"sec"}""")
    val m = Bench.previousRoundTimes("/root/testdata/sf0.1", dir)
    assert(m.get("q01_pricing_summary").contains(0.61),
      "query missing from the truncated tail comes from the full artifact")
    assert(m.get("t01_lang_id").contains(0.88),
      "full artifact wins over the round artifact on conflict")
  }

  test("fitLinearProbe memoizes identical fits (the s09/s11/s14 shared probe)") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = (1L to 40L).map(i =>
      (i, Array.tabulate(4)(j => math.sin(i * 2.0 + j)), if (i % 2 == 0) 1.0 else -1.0))
      .toDF("vec_id", "embedding", "y")
    val before = graft.ops.SimOps.probeFitRuns.get()
    val w1 = graft.ops.SimOps.fitLinearProbe(df, "vec_id", "embedding", "y",
      dims = 4, lr = 0.05, iters = 2)
    val w2 = graft.ops.SimOps.fitLinearProbe(df, "vec_id", "embedding", "y",
      dims = 4, lr = 0.05, iters = 2)
    assert(graft.ops.SimOps.probeFitRuns.get() == before + 1,
      "the second identical fit must be a cache hit, not a retrain")
    assert(w1.toSeq == w2.toSeq)
    // different parameters are a different fit — never served stale
    val w3 = graft.ops.SimOps.fitLinearProbe(df, "vec_id", "embedding", "y",
      dims = 4, lr = 0.05, iters = 3)
    assert(graft.ops.SimOps.probeFitRuns.get() == before + 2)
    assert(w3.toSeq != w1.toSeq)
  }

  test("pairsSpread: exact hedge on a perfect pair, spike flags, sd=0 -> null z") {
    val spark = SparkSpec.session
    import spark.implicits._
    def ts(h: Int) = new java.sql.Timestamp(h * 3600000L)
    // b walks 10,11,...; a = 5 + 2b EXACTLY -> OLS must recover
    // beta=2, alpha=5 bit-for-bit and every spread is 0
    val perfect = (0 until 40).flatMap { h =>
      Seq(("A", ts(h), 5.0 + 2.0 * (10 + h)), ("B", ts(h), (10 + h).toDouble))
    }.toDF("k", "bucket", "close")
    val out = graft.ops.FinOps.pairsSpreadOf(perfect, "k", "bucket", "close",
      "A", "B", n = 24).collect()
    assert(out.forall(r => r.getDouble(r.fieldIndex("beta")) == 2.0))
    assert(out.forall(r => r.getDouble(r.fieldIndex("alpha")) == 5.0))
    assert(out.forall(r => r.getDouble(r.fieldIndex("spread")) == 0.0))
    // zero-variance windows: sd is exactly 0 -> z must be null, never NaN
    assert(out.forall(r => r.isNullAt(r.fieldIndex("z"))))
    // now a +10 dislocation at h=35: its z must flag as a +2-sigma entry
    val spiked = perfect.withColumn("close",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("k") === "A" &&
          org.apache.spark.sql.functions.col("bucket") === ts(35),
        org.apache.spark.sql.functions.col("close") + 10.0)
        .otherwise(org.apache.spark.sql.functions.col("close")))
    val sp = graft.ops.FinOps.pairsSpreadOf(spiked, "k", "bucket", "close",
      "A", "B", n = 24).collect()
    val spike = sp.find(_.getTimestamp(0) == ts(35)).get
    assert(spike.getDouble(spike.fieldIndex("z")) > 2.0)
    assert(spike.getInt(spike.fieldIndex("signal")) == 1)
  }

  test("annIvfPq on a custom schema: cells bound candidates, top hit matches brute") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def va(b: Int, eps: Double) =
      if (b == 0) Array(1.0, eps, 0.0, 0.0) else Array(eps, 1.0, 0.0, 0.0)
    val corpus = (0L until 20L).map(i => (i, va((i % 2).toInt, 0.01 * (i / 2 + 1))))
      .toDF("vid", "emb")
    val queries = Seq((100L, va(0, 0.015)), (101L, va(1, 0.015))).toDF("vid", "emb")
    val cents = Seq((0L, Array(1.0, 0.0, 0.0, 0.0)), (1L, Array(0.0, 1.0, 0.0, 0.0)))
      .toDF("vid", "emb")
    val out = Graft.annIvfPq(corpus, queries, cents, cents, "vid", "emb",
      dims = 4, m = 2, kCodes = 2, k = 3, probes = 1).collect()
    assert(out.length == 6)
    out.foreach { r =>
      val (q, v, cell) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(cell == q - 100L, "probes=1 keeps each query in its own cluster cell")
      assert(v % 2 == q - 100L, "every candidate came from the probed cell")
    }
    // the confirm column is the TRUE cosine: the reported top hit's
    // cos_sim must dominate its cellmates' (exactness of the confirm)
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { hits =>
      val r1 = hits.minBy(_.getLong(1))
      assert(hits.forall(h => h.getDouble(5) <= r1.getDouble(5) + 1e-12 ||
        h.getLong(1) > 1), "rank-1 by ADC is also the max-cosine cellmate here")
    }
  }

  test("kyleLambda: exact recovery when dp = 0.5 * signed volume") {
    val spark = SparkSpec.session
    import spark.implicits._
    def ts(h: Int) = new java.sql.Timestamp(h * 3600000L)
    // close walks +1/-1 alternately, volume constant 2 => q = +/-2 and
    // dp = 0.5 * q EXACTLY: zero residuals, lambda = 0.5, intercept = 0
    var c = 100.0
    val bars = (0 until 21).map { h =>
      if (h > 0) c += (if (h % 2 == 1) 1.0 else -1.0)
      ("X", ts(h), c, 2.0)
    }.toDF("k", "bucket", "close", "vol")
    val out = graft.Graft.kyleLambda(bars, "k", "bucket", "close", "vol").head()
    assert(out.getLong(out.fieldIndex("n_bars")) == 20L)
    assert(out.getDouble(out.fieldIndex("lambda")) == 0.5)
    assert(out.getDouble(out.fieldIndex("intercept")) == 0.0)
  }

  test("bootstrapCi: deterministic, brackets the mean, narrows with level") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, (i % 37).toDouble + 10.0)).toDF("id", "x")
    val a = graft.Graft.bootstrapCi(df, "id", "x", b = 40, level = 0.95).head()
    val b = graft.Graft.bootstrapCi(df, "id", "x", b = 40, level = 0.95).head()
    assert(a == b, "md5 weights: the CI is a pure function of (salt, ids, values)")
    val (lo, m, hi) = (a.getDouble(a.fieldIndex("ci_lo")),
      a.getDouble(a.fieldIndex("mean")), a.getDouble(a.fieldIndex("ci_hi")))
    assert(lo < m && m < hi, "the interval brackets the point mean")
    assert(a.getLong(a.fieldIndex("n_replicas")) == 40L)
    val narrow = graft.Graft.bootstrapCi(df, "id", "x", b = 40, level = 0.5).head()
    val (nlo, nhi) = (narrow.getDouble(narrow.fieldIndex("ci_lo")),
      narrow.getDouble(narrow.fieldIndex("ci_hi")))
    assert(nlo >= lo && nhi <= hi, "a 50% interval sits inside the 95% interval")
  }

  test("survival: Kaplan-Meier product limit, censoring, exact-zero tail") {
    val spark = SparkSpec.session
    import spark.implicits._
    def day(d: Int) = new java.sql.Timestamp(d * 86400000L)
    // u1 lives days 0-2 (lifetime 2), u2 day 0 (0), u3 days 0-1 (1) — all
    // churned; u4 is active through day 10 (lifetime 10) => CENSORED at
    // censorDays=3 (last day >= 10-3)
    val ev = Seq(
      (1L, 0), (1L, 1), (1L, 2), (2L, 0), (3L, 0), (3L, 1),
      (4L, 0), (4L, 5), (4L, 10))
      .map { case (u, d) => (u, day(d)) }.toDF("u", "ts")
    val km = graft.Graft.survival(ev, "u", "ts", censorDays = 3)
      .orderBy("k").collect()
    assert(km.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 10L))
    assert(km.map(r => r.getLong(r.fieldIndex("n_at_risk"))).toSeq == Seq(4L, 3L, 2L, 1L))
    assert(km.map(r => r.getLong(r.fieldIndex("n_censored"))).toSeq == Seq(0L, 0L, 0L, 1L))
    val s = km.map(r => r.getDouble(r.fieldIndex("survival")))
    assert(math.abs(s(0) - 0.75) < 1e-12)
    assert(math.abs(s(1) - 0.5) < 1e-12)
    assert(math.abs(s(2) - 0.25) < 1e-12)
    assert(math.abs(s(3) - 0.25) < 1e-12, "censored tail holds the curve flat")
    // hazard = 1 at the last level pins survival to EXACTLY 0, never ln(0)
    val ev2 = Seq((1L, day(0)), (1L, day(10)), (4L, day(20))).toDF("u", "ts")
    val km2 = graft.Graft.survival(ev2, "u", "ts", censorDays = 3)
      .orderBy("k").collect()
    assert(km2.last.getDouble(km2.last.fieldIndex("survival")) == 0.0)
  }

  test("vpin: volume clock buckets, tick-rule signs, one-sided flow saturates at 1") {
    val spark = SparkSpec.session
    import spark.implicits._
    def ts(h: Int) = new java.sql.Timestamp(h * 60000L)
    // 12 monotonically rising fills, vol 10 each, budget 30 => 4 buckets
    // of 3 fills; the very first fill is tick-flat (sign 0)
    val fills = (1 to 12).map(i => ("X", ts(i), i.toLong, i.toDouble, 10.0))
      .toDF("k", "bucket_ts", "fid", "p", "v")
    val out = graft.Graft.vpin(fills, "k", "bucket_ts", Seq("fid"), "p", "v",
        budget = 30.0, n = 2)
      .orderBy("bar").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.forall(_.getLong(2) == 3L), "equal-volume buckets of 3 fills")
    assert(out.head.getDouble(4) == 20.0 / 30.0, "first bucket carries the flat first fill")
    assert(out.drop(1).forall(_.getDouble(4) == 1.0), "one-sided flow saturates imbalance")
    assert(out.head.isNullAt(5) && out(1).isNullAt(5) === false, "vpin null till n buckets")
    assert(math.abs(out(2).getDouble(5) - 1.0) < 1e-12)
  }

  test("zipfFit: exact-power-law corpus fits alpha 1, r2 1") {
    val spark = SparkSpec.session
    import spark.implicits._
    // counts 24/12/8/6 = 24/rank exactly -> ln points are collinear
    val text = Seq.fill(24)("aa") ++ Seq.fill(12)("bb") ++ Seq.fill(8)("cc") ++ Seq.fill(6)("dd")
    val docs = Seq((1L, text.mkString(" "))).toDF("id", "text")
    val out = graft.Graft.zipfFit(docs, "text", topV = 4).head()
    assert(out.getLong(out.fieldIndex("n_terms")) == 4L)
    assert(math.abs(out.getDouble(out.fieldIndex("zipf_alpha")) - 1.0) < 1e-9)
    assert(out.getDouble(out.fieldIndex("r2")) > 1.0 - 1e-9)
  }

  test("byteEntropy: exact entropy laws on constructed payloads") {
    val spark = SparkSpec.session
    import spark.implicits._
    val docs = Seq(
      (1L, Array.fill[Byte](64)(0x41)),                       // constant -> 0 bits
      (2L, Array.tabulate[Byte](64)(i => if (i % 2 == 0) 0x41 else 0x42)), // two equal bytes -> 1 bit
      (3L, Array.tabulate[Byte](256)(i => i.toByte)))         // all 256 once -> 8 bits
      .toDF("id", "payload")
    val out = graft.ops.MultiOps.byteEntropyOf(docs, "id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((64L, 1L, 0.0, 0.0)), "constant payload: zero entropy exactly")
    assert(out(2L)._2 == 2L && math.abs(out(2L)._3 - 1.0) < 1e-12, "two equal bytes: 1 bit")
    assert(out(3L)._2 == 256L && math.abs(out(3L)._3 - 8.0) < 1e-12 &&
      math.abs(out(3L)._4 - 1.0) < 1e-12, "uniform 256 bytes: 8 bits, full channel")
  }

  test("rrfFuse: full-outer rank fusion, absent list contributes 0, ties break by id") {
    val spark = SparkSpec.session
    import spark.implicits._
    val l1 = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val l2 = Seq((3L, 1L), (4L, 2L)).toDF("id", "rank")
    val out = graft.ops.SimOps.rrfFuseOf(Seq(l1, l2), "id", "rank", k0 = 60, topK = 10)
      .collect()
    // id 3 appears in both lists (1/63 + 1/61) and must fuse first;
    // ids 2 (rank 2 in list 1) and 4 (rank 2 in list 2) tie at exactly
    // 1/62 and must break by id
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 1L, 2L, 4L))
    val id3 = out.head
    assert(id3.getDouble(id3.fieldIndex("rrf")) == 1.0 / 63.0 + 1.0 / 61.0)
    val id4 = out.last
    assert(id4.isNullAt(id4.fieldIndex("rank_0")), "absent from list 1 -> null rank, 0 contribution")
    assert(out.map(r => r.getLong(r.fieldIndex("fused_rank"))).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("previousRoundTimes: a BENCH_FULL.json from another SF dir is ignored") {
    val dir = Files.createTempDirectory("bench_sf").toFile
    write(dir, Bench.FullArtifact,
      """{"queries":{"q01":0.2},"errors":{},"reruns":{},""" +
        """"jvm_chunks":1,"sf":"/root/testdata/sf0.01","n":1,"metric":"total","value":0.2,"unit":"sec"}""")
    assert(Bench.previousRoundTimes("/root/testdata/sf0.1", dir).isEmpty)
  }
}
