package graft

import org.apache.spark.sql.functions._

/** Round-15 second batch: concat-and-chunk sequence packing (ds24),
  * graph-ANN delete consolidation (s27), continuous OHLC state (st14),
  * and the hashed-feature weak-label probe (t26). */
class Round15bSpec extends SparkSpec {

  // ------------------------------------ ds24 concat-and-chunk packing

  test("concatChunkOf: spans tile every sequence exactly (seqLen tokens " +
    "except each shard's last), per-doc spans conserve its token count, " +
    "zero-token docs drop, and the map is bit-stable under repartition") {
    import spark.implicits._
    // token counts 0..12 planted via (i*7) mod 13 — includes zeros
    val docs = (1 to 40).map(i => (i.toLong, ((i * 7) % 13).toLong))
      .toDF("doc_id", "n")
    val out = graft.ops.DataOps
      .concatChunkOf(docs, "doc_id", "n", seqLen = 10L, nShards = 3)
      .cache()
    try {
      // per-doc token mass preserved; zero-token docs gone
      val perDoc = out.groupBy("doc_id").agg(sum("n_toks").as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = (1 to 40).map(i => i.toLong -> ((i * 7) % 13).toLong)
        .filter(_._2 > 0).toMap
      assert(perDoc == expected, "span token mass must equal doc token count")
      // every sequence except each shard's LAST carries exactly seqLen
      val seqs = out.groupBy("shard", "seq_id").agg(sum("n_toks").as("s"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      val lastSeq = seqs.groupBy(_._1).map { case (sh, rs) => sh -> rs.map(_._2).max }
      seqs.foreach { case (sh, sq, s) =>
        if (sq != lastSeq(sh)) assert(s == 10L,
          s"non-final sequence ($sh, $sq) must hold exactly seqLen tokens, got $s")
        else assert(s >= 1L && s <= 10L)
      }
      // spans are contiguous inside a sequence: offsets chain from 0
      out.collect()
        .groupBy(r => (r.getAs[Int]("shard"), r.getAs[Long]("seq_id"))).foreach {
        case (_, rs) =>
          val spans = rs.map(r =>
            (r.getAs[Long]("seq_off"), r.getAs[Long]("n_toks"))).sortBy(_._1)
          assert(spans.head._1 == 0L, "first span starts at offset 0")
          spans.sliding(2).foreach {
            case Array((o1, n1), (o2, _)) => assert(o1 + n1 == o2,
              "spans must tile the sequence with no gap or overlap")
            case _ =>
          }
      }
      // deterministic under physical layout changes
      val again = graft.ops.DataOps
        .concatChunkOf(docs.repartition(7), "doc_id", "n", 10L, 3)
        .orderBy("shard", "seq_id", "seq_off").collect().toSeq
      assert(out.orderBy("shard", "seq_id", "seq_off").collect().toSeq == again,
        "chunking must be a pure function of (salt, ids, token counts)")
    } finally out.unpersist()
  }

  // ----------------- s27 graph delete: consolidation vs full rebuild

  test("graphDeleteOf: no deleted id survives, untouched nodes keep lists " +
    "bit-identically, and search recall over the consolidated graph is " +
    "within noise of a full rebuild on the live corpus") {
    import graft.ops.SimOps
    val all = Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), F.asDouble(col("embedding")).as("v"))
    val live = all.filter(col("vec_id") % 10 =!= 9)
    val del = all.filter(col("vec_id") % 10 === 9)
    // anchors are even ids, never % 10 == 9 ∩ % 64 == 0 — the anchor
    // slice survives the delete, so both graphs search identically
    val anchors = all.filter(pmod(col("vec_id"), lit(64)) === 0)
    val edges = SimOps.knnGraphOf(all, anchors, "vec_id", "v", "vec_id", "v",
      r = 8, cellProbes = 2, descentRounds = 1).localCheckpoint(eager = true)
    val cons = SimOps.graphDeleteOf(all, del, edges, "vec_id", "v", r = 8)
      .localCheckpoint(eager = true)
    // 1. deleted ids appear nowhere
    assert(cons.filter(col("src") % 10 === 9 || col("dst") % 10 === 9).count() == 0L,
      "deleted ids must vanish from both edge ends")
    assert(cons.groupBy("src").count().agg(max("count")).head().getLong(0) <= 8L,
      "out-degree cap must survive the delete")
    // 2. untouched nodes (no edge into the delete set) keep lists bit-identically
    val touched = edges.join(del.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
      .select(col("src")).distinct()
    val untouchedOld = edges
      .join(del.select(col("vec_id").as("src")), Seq("src"), "left_anti")
      .join(touched, Seq("src"), "left_anti")
      .select(col("src"), col("dst"), col("cos"))
    val untouchedNew = cons.join(touched, Seq("src"), "left_anti")
      .join(del.select(col("vec_id").as("src")), Seq("src"), "left_anti")
      .join(untouchedOld.select(col("src")).distinct(), Seq("src"), "left_semi")
      .select(col("src"), col("dst"), col("cos"))
    assert(untouchedOld.exceptAll(untouchedNew).count() == 0L &&
      untouchedNew.exceptAll(untouchedOld).count() == 0L,
      "untouched nodes must keep their lists bit-identically")
    // 3. recall on the live corpus: consolidated vs full rebuild
    val rebuilt = SimOps.knnGraphOf(live, anchors, "vec_id", "v", "vec_id", "v",
      r = 8, cellProbes = 2, descentRounds = 1).localCheckpoint(eager = true)
    val queries = live.filter(col("vec_id") < 5)
    val truth = Graft.knnBrute(live, queries, "vec_id", "v", 10)
      .select(col("q_id").cast("long"), col("vec_id").cast("long")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    def recallOf(e: org.apache.spark.sql.DataFrame): Double = {
      val res = SimOps.graphAnnOf(live, queries, anchors, e, "vec_id", "v",
        k = 10, beam = 4, hops = 3)
        .select(col("q_id").cast("long"), col("vec_id").cast("long")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val per = truth.map { case (q, t) =>
        (t intersect res.getOrElse(q, Set.empty)).size / 10.0 }
      per.sum / per.size
    }
    val (rc, rr) = (recallOf(cons), recallOf(rebuilt))
    info(f"consolidated recall@10 $rc%.3f vs live rebuild $rr%.3f")
    assert(rc >= rr - 0.1,
      s"consolidated graph recall $rc must be within noise of rebuild $rr")
  }

  // ------------------ st14 continuous OHLC: the algebraic merge law

  private def plantedTicks: Seq[(String, Long, java.sql.Timestamp, Double)] = {
    // two symbols, ticks spread over 5 hourly buckets, including
    // same-timestamp id ties (the argmin/argmax tie-break matters)
    val base = 1700000000000L
    (0 until 200).map { i =>
      val sym = if (i % 2 == 0) "AAA" else "BBB"
      val ts = new java.sql.Timestamp(base + (i % 5) * 3600000L + (i % 7) * 60000L)
      (sym, i.toLong, ts, 100.0 + (i % 23) * 1.5 - (i % 11))
    }
  }

  test("ohlcState merge law: landing-merged bars == one-shot state of the " +
    "union (argmin/argmax picks, min/max, sums — exact at any split), " +
    "and replaying a landing is a no-op") {
    import spark.implicits._
    import graft.sinks.SketchStore
    val df = plantedTicks.toDF("event_type", "event_id", "ts", "value")
    val store = java.nio.file.Files.createTempDirectory("r15b_ohlc_").toString
    (0 until 3).foreach { l =>
      SketchStore.land(spark, store, SketchStore.ohlcState(
        df.filter(col("event_id") % 3 === l), Seq("event_type"),
        "ts", "event_id", "value", "hour"), l.toLong)
    }
    // materialize: the replay below overwrites landing 0's files, and a
    // lazy plan would re-list the store after the overwrite
    val merged = SketchStore.mergedOhlc(spark, store, Seq("event_type"))
      .localCheckpoint(eager = true)
    val whole = SketchStore.ohlcState(df, Seq("event_type"),
      "ts", "event_id", "value", "hour")
    // volume is the one float: compare it rounded (the q09 rule),
    // everything else must be bit-identical
    def canon(d: org.apache.spark.sql.DataFrame) = d.select(
      col("event_type"), col("bucket_ms"), col("o_ts"), col("o_id"),
      col("open"), col("high"), col("low"), col("c_ts"), col("c_id"),
      col("close"), F.r6(col("volume")).as("volume"), col("n_trades"))
    assert(canon(merged).exceptAll(canon(whole)).count() == 0L &&
      canon(whole).exceptAll(canon(merged)).count() == 0L,
      "landing-merged OHLC state must equal the one-shot state")
    // idempotent replay: re-land landing 0, merged state unchanged
    SketchStore.land(spark, store, SketchStore.ohlcState(
      df.filter(col("event_id") % 3 === 0), Seq("event_type"),
      "ts", "event_id", "value", "hour"), 0L)
    val again = SketchStore.mergedOhlc(spark, store, Seq("event_type"))
    assert(canon(again).exceptAll(canon(merged)).count() == 0L &&
      canon(merged).exceptAll(canon(again)).count() == 0L,
      "replaying a landing must not change merged state")
  }

  test("streamingOhlc: a stream of micro-batches lands the same merged " +
    "bars as the one-shot q09 resample (batch == stream), late rows " +
    "for old buckets absorbed exactly") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{TickEvent, StreamOps}
    implicit val sql = spark.sqlContext
    val all = plantedTicks.map { case (s, i, ts, v) => TickEvent(s, i, ts, v) }
    val base = java.nio.file.Files.createTempDirectory("r15b_ohlc_stream_").toString
    val input = MemoryStream[TickEvent]
    val q = StreamOps.streamingOhlc(spark, input.toDF(),
      s"$base/ohlc", s"$base/report", s"$base/ckpt")
    try {
      // batches NOT aligned to buckets: every batch carries late rows
      // for buckets earlier batches already landed
      all.grouped(70).foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
      val streamed = graft.sinks.AtomicReport.read(spark, s"$base/report")
      val oneShot = Graft.resampleOhlc(all.toDF(), "event_type", "ts",
          "event_id", "value", "hour")
        .select(col("event_type"), unix_millis(col("bucket")).as("bucket_ms"),
          col("open"), col("high"), col("low"), col("close"),
          F.r4(col("volume")).as("volume"), col("n_trades"))
      assert(streamed.exceptAll(oneShot).count() == 0L &&
        oneShot.exceptAll(streamed).count() == 0L,
        "stream-of-micro-batches report must equal the one-shot resample")
    } finally q.stop()
  }

  // ------------- t26 hashed-feature classifier: it actually learns

  test("hashClassifierOf: nails a linearly separable planted corpus, " +
    "and the scored output is bit-stable under repartition") {
    import spark.implicits._
    // docs are alpha/beta mixtures; label = majority token — a linear
    // functional of token frequencies, exactly what the model can fit
    val docs = (0 until 200).map { i =>
      val nAlpha = i % 11
      val text = (Seq.fill(nAlpha)("alpha") ++ Seq.fill(10 - nAlpha)("beta"))
        .mkString(" ")
      (i.toLong, text, if (nAlpha >= 5) 1.0 else -1.0)
    }.toDF("doc_id", "text", "y")
    val out = graft.ops.TextOps.hashClassifierOf(docs, "doc_id", "text",
      docs.select(col("doc_id"), col("y")), "y", dim = 64, lr = 4.0, iters = 20)
    val acc = out.agg(avg(col("correct").cast("int"))).head().getDouble(0)
    info(f"planted-corpus training accuracy $acc%.3f")
    assert(acc >= 0.95, s"separable corpus must be learned, got accuracy $acc")
    val again = graft.ops.TextOps.hashClassifierOf(docs.repartition(7), "doc_id",
      "text", docs.select(col("doc_id"), col("y")), "y", dim = 64, lr = 4.0, iters = 20)
    assert(out.select("doc_id", "score").exceptAll(again.select("doc_id", "score")).count() == 0L &&
      again.select("doc_id", "score").exceptAll(out.select("doc_id", "score")).count() == 0L,
      "the training loop's float folds must be bit-stable under repartition")
  }

  test("hashClassifierOf: the fitted model scores EVERY tokened doc — " +
    "unlabeled docs keep their score with null y/correct (the " +
    "distillation contract: a small labeled slice, the whole corpus scored)") {
    import spark.implicits._
    val docs = (0 until 100).map { i =>
      val nAlpha = i % 11
      (i.toLong, (Seq.fill(nAlpha)("alpha") ++ Seq.fill(10 - nAlpha)("beta")).mkString(" "))
    }.toDF("doc_id", "text")
    // labels for the even half only
    val labels = (0 until 100 by 2)
      .map(i => (i.toLong, if (i % 11 >= 5) 1.0 else -1.0)).toDF("doc_id", "y")
    val out = graft.ops.TextOps.hashClassifierOf(docs, "doc_id", "text",
      labels, "y", dim = 64, lr = 4.0, iters = 10)
    assert(out.count() == 100L, "every tokened doc must be scored")
    val unl = out.filter(col("doc_id") % 2 === 1)
    assert(unl.count() == 50L &&
      unl.filter(col("y").isNotNull || col("correct").isNotNull).count() == 0L &&
      unl.filter(col("score").isNull).count() == 0L,
      "unlabeled docs: score present, y/correct null")
    // the half-trained model still learns the separable rule, and its
    // scores generalize to the unlabeled half
    val genAcc = unl
      .withColumn("want", (col("doc_id") % 11 >= 5))
      .agg(avg(((col("score") >= 0) === col("want")).cast("int")))
      .head().getDouble(0)
    info(f"generalization accuracy on the unlabeled half $genAcc%.3f")
    assert(genAcc >= 0.9, s"held-out half must be scored correctly: $genAcc")
  }

  test("t26 gate shape: the stopword-ratio teacher is learned well above " +
    "the 0.5 balanced baseline on the real corpus") {
    val out = graft.ops.TextOps.queries("t26_hash_classifier")(
      spark, "/root/testdata/sf0.01")
    val acc = out.agg(avg(col("correct").cast("int"))).head().getDouble(0)
    val pos = out.agg(avg((col("y") > 0).cast("int"))).head().getDouble(0)
    info(f"gate accuracy $acc%.3f at positive rate $pos%.3f")
    assert(math.abs(pos - 0.5) < 0.05, s"median label must balance classes: $pos")
    assert(acc >= 0.7, s"the distilled rule must be learned: accuracy $acc")
  }

  // ----------- st15 bottom-k sample: min-rank merge law + KMV bound

  test("bottomKState merge law: landing-merged bottom-k == one-shot " +
    "bottom-k of the union (min-rank pick: associative, idempotent), " +
    "re-landing is a no-op, and shared values collapse across landings") {
    import spark.implicits._
    import graft.sinks.SketchStore
    // overlapping landings: value space 0..399, each landing sees a slice
    val mk = (lo: Int, hi: Int) => (lo until hi)
      .map(i => ("g" + (i % 2), (i % 400).toLong)).toDF("g", "v")
    val store = java.nio.file.Files.createTempDirectory("r15b_bk_").toString
    val parts = Seq(mk(0, 300), mk(200, 600), mk(500, 800))
    parts.zipWithIndex.foreach { case (p, l) =>
      SketchStore.land(spark, store, SketchStore.bottomKState(p, Seq("g"), "v", 16), l.toLong)
    }
    val merged = SketchStore.mergedBottomK(spark, store, Seq("g"), 16)
      .localCheckpoint(eager = true)
    val whole = SketchStore.bottomKState(mk(0, 800), Seq("g"), "v", 16)
    assert(merged.exceptAll(whole).count() == 0L &&
      whole.exceptAll(merged).count() == 0L,
      "landing-merged bottom-k must equal the one-shot sketch")
    SketchStore.land(spark, store,
      SketchStore.bottomKState(parts(1), Seq("g"), "v", 16), 1L)
    val again = SketchStore.mergedBottomK(spark, store, Seq("g"), 16)
    assert(again.exceptAll(merged).count() == 0L &&
      merged.exceptAll(again).count() == 0L,
      "replaying a landing must not change merged state")
  }

  test("KMV estimate from bottom-k state: realized relative error within " +
    "the 1/sqrt(k) regime on a planted 20k-distinct corpus") {
    import spark.implicits._
    import graft.sinks.SketchStore
    val k = 256
    val df = (0 until 20000).map(i => ("all", i.toLong)).toDF("g", "v")
    val st = SketchStore.bottomKState(df, Seq("g"), "v", k)
    val hk = st.agg(max("h")).head().getLong(0)
    val est = (k - 1).toDouble * 1152921504606846976.0 / hk.toDouble
    val rel = math.abs(est / 20000.0 - 1)
    info(f"KMV estimate $est%.1f vs 20000 exact, rel err $rel%.4f")
    assert(rel <= 0.25, s"KMV estimate off by $rel — beyond the 1/sqrt(k) regime")
    assert(st.count() == k.toLong)
  }

  test("streamingSample: a stream of micro-batches lands the same merged " +
    "sample as the one-shot sketch (batch == stream)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{ProfileEvent, StreamOps}
    import graft.sinks.SketchStore
    implicit val sql = spark.sqlContext
    val all = (0 until 120).map(i => ProfileEvent("t" + (i % 2), (i % 50).toLong, 0.0))
    val base = java.nio.file.Files.createTempDirectory("r15b_sample_stream_").toString
    val input = MemoryStream[ProfileEvent]
    val q = StreamOps.streamingSample(spark, input.toDF(),
      s"$base/bk", s"$base/report", s"$base/ckpt", Seq("event_type"), "user_id", 8)
    try {
      all.grouped(40).foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
      val streamed = graft.sinks.AtomicReport.read(spark, s"$base/report")
        .select("event_type", "value", "h")
      val oneShot = SketchStore.bottomKState(all.toDF(), Seq("event_type"), "user_id", 8)
        .select("event_type", "value", "h")
      assert(streamed.exceptAll(oneShot).count() == 0L &&
        oneShot.exceptAll(streamed).count() == 0L,
        "stream-of-micro-batches sample must equal the one-shot sketch")
    } finally q.stop()
  }

  // ----------------------- review-pass hardening pins (second pass)

  test("bottomKState: NULL values are excluded — they never occupy a " +
    "sample slot or skew the KMV estimate") {
    import spark.implicits._
    import graft.sinks.SketchStore
    val df = (Seq.tabulate(40)(i => ("g", Option(i.toLong))) :+ (("g", Option.empty[Long])))
      .toDF("g", "v")
    val st = SketchStore.bottomKState(df, Seq("g"), "v", 8)
    assert(st.filter(col("value").isNull || col("h").isNull).count() == 0L,
      "null values must not enter the sketch")
    assert(st.count() == 8L)
  }

  test("hashClassifierOf: an exactly-duplicated label row does not " +
    "double-count its doc (output equals the deduplicated run)") {
    import spark.implicits._
    val docs = (0 until 60).map { i =>
      val nAlpha = i % 11
      (i.toLong, (Seq.fill(nAlpha)("alpha") ++ Seq.fill(10 - nAlpha)("beta")).mkString(" "))
    }.toDF("doc_id", "text")
    val lab = (0 until 60).map(i => (i.toLong, if (i % 11 >= 5) 1.0 else -1.0))
    val clean = graft.ops.TextOps.hashClassifierOf(docs, "doc_id", "text",
      lab.toDF("doc_id", "y"), "y", dim = 64, lr = 4.0, iters = 5)
    val dup = graft.ops.TextOps.hashClassifierOf(docs, "doc_id", "text",
      (lab ++ lab.take(20)).toDF("doc_id", "y"), "y", dim = 64, lr = 4.0, iters = 5)
    assert(clean.exceptAll(dup).count() == 0L && dup.exceptAll(clean).count() == 0L,
      "duplicate label rows must collapse before training")
  }

  test("graphDeleteOf: a pre-ROUNDED caller edge list cannot put the same " +
    "dst at two ranks of a node's list (stitch pairs anti-joined before " +
    "scoring, not collapsed by bit-equality)") {
    import graft.ops.SimOps
    val all = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), F.asDouble(col("embedding")).as("v"))
    val anchors = all.filter(pmod(col("vec_id"), lit(64)) === 0)
    val edges = SimOps.knnGraphOf(all, anchors, "vec_id", "v", "vec_id", "v",
        r = 4, cellProbes = 2, descentRounds = 1)
      .select(col("src"), col("dst"), round(col("cos"), 2).as("cos"))
      .localCheckpoint(eager = true)
    val del = all.filter(col("vec_id") % 10 === 9)
    val cons = SimOps.graphDeleteOf(all, del, edges, "vec_id", "v", r = 4)
    assert(cons.groupBy("src", "dst").count().filter(col("count") > 1).count() == 0L,
      "a (src, dst) pair must appear at most once after consolidation")
    assert(cons.groupBy("src").count().agg(max("count")).head().getLong(0) <= 4L)
  }

  // ---------- st16 continuous ANN index: stream == one-shot insert

  test("streamingAnnIndex: vectors absorbed through the store produce the " +
    "BIT-identical edge list of a one-shot graphInsertOf, and replaying " +
    "a tick is a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{VecEvent, StreamOps}
    import graft.ops.SimOps
    implicit val sql = spark.sqlContext
    val all = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), F.asDouble(col("embedding")).as("v"))
    val a = all.filter(col("vec_id") % 10 =!= 9)
    val b = all.filter(col("vec_id") % 10 === 9)
    val evs = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => VecEvent(r.getLong(0), r.getSeq[Double](1)))
    val base = java.nio.file.Files.createTempDirectory("r15b_ann_stream_").toString
    val input = MemoryStream[VecEvent]
    val q = StreamOps.streamingAnnIndex(spark, input.toDF(),
      s"$base/idx", s"$base/ckpt")
    try {
      input.addData(evs(a).toIndexedSeq); q.processAllAvailable()
      input.addData(evs(b).toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    // round 16: ticks land only CHANGED lists — the queryable index is
    // the latest-landing-per-src merged view
    val streamed = StreamOps.annIndexReport(spark, s"$base/idx")
      .localCheckpoint(eager = true)
    val anchors = a.filter(pmod(col("vec_id"), lit(64)) === 0)
    val edgesA = SimOps.knnGraphOf(a, anchors, "vec_id", "v", "vec_id", "v",
      r = 8, cellProbes = 2, descentRounds = 1)
    val oneShot = SimOps.graphInsertOf(a, b, edgesA, anchors, anchors,
      "vec_id", "v", r = 8, beam = 4, hops = 3)
      .select(col("src"), col("dst"), col("cos"))
    assert(streamed.exceptAll(oneShot).count() == 0L &&
      oneShot.exceptAll(streamed).count() == 0L,
      "index streamed through the store must equal the one-shot insert")
    // replay tick 1: prior landings unchanged, own partitions overwritten
    StreamOps.annIndexTick(spark, s"$base/idx", b, "vec_id", "v",
      r = 8, beam = 4, hops = 3, landingId = 1L)
    val again = StreamOps.annIndexReport(spark, s"$base/idx")
    assert(again.exceptAll(streamed).count() == 0L &&
      streamed.exceptAll(again).count() == 0L,
      "replaying a tick must not change the landed index")
  }
}
