package graft

import org.apache.spark.sql.functions._

/** Round-7 operators: MACD (three-recurrence segmented scan),
  * stochastic oscillator (%K/%D), boilerplate-segment stripping —
  * edge branches the DuckDB gate alone wouldn't pin down. */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Seq[Double], key: String = "k"): org.apache.spark.sql.DataFrame =
    vals.zipWithIndex.map { case (v, i) =>
      (key, new java.sql.Timestamp(1700000000000L + i * 60000L), i.toLong, v)
    }.toDF("sym", "t", "seq", "px")

  test("macd matches the driver-side three-fold recurrence bit-for-bit; first row is 0/0/0") {
    val vals = Seq(4.21, 9.73, 1.18, 7.54, 3.33, 8.08, 2.99)
    val (f, s, g) = (3, 7, 2)
    val out = Graft.macd(series(vals), "sym", "t", "seq", "px", f, s, g)
      .orderBy("ts_ms").select("macd", "signal", "hist")
      .as[(Double, Double, Double)].collect()
    val (aF, aS, aG) = (2.0 / (f + 1), 2.0 / (s + 1), 2.0 / (g + 1))
    var eF = 0.0; var eS = 0.0; var sig = 0.0
    val want = vals.zipWithIndex.map { case (x, i) =>
      if (i == 0) { eF = x; eS = x; sig = eF - eS }
      else {
        eF = eF * (1 - aF) + aF * x
        eS = eS * (1 - aS) + aS * x
        sig = sig * (1 - aG) + aG * (eF - eS)
      }
      (eF - eS, sig, (eF - eS) - sig)
    }
    assert(out.toSeq == want, "same fold, same doubles")
    assert(out.head == ((0.0, 0.0, 0.0)), "both EWMAs init to x1 ⇒ macd1 = signal1 = 0")
    assert(Graft.macd(series(vals), "sym", "t", "seq", "px").columns.toSeq ==
      Seq("sym", "ts_ms", "seq", "macd", "signal", "hist"))
  }

  test("macd line == ewmaExact(fast) − ewmaExact(slow) bit-for-bit on testdata") {
    val ev = Tables.t(spark, sfDir, "events")
    val m = Graft.macd(ev, "user_id", "ts", "event_id", "value", 12, 26, 9)
      .select(col("user_id"), col("event_id"), col("macd"))
    val fast = Graft.ewmaExact(ev, "user_id", "ts", "event_id", "value", 2.0 / 13)
      .select(col("user_id"), col("event_id"), col("ewma").as("ef"))
    val slow = Graft.ewmaExact(ev, "user_id", "ts", "event_id", "value", 2.0 / 27)
      .select(col("user_id"), col("event_id"), col("ewma").as("es"))
    val j = m.join(fast, Seq("user_id", "event_id")).join(slow, Seq("user_id", "event_id"))
    assert(j.filter(col("macd") =!= col("ef") - col("es")).count() == 0)
    assert(j.count() == ev.count())
  }

  test("macd rejects a degenerate span ordering") {
    intercept[IllegalArgumentException] {
      Graft.macd(series(Seq(1.0)), "sym", "t", "seq", "px", fast = 26, slow = 12)
    }
  }

  test("stochastic: warmup nulls, rising series pins %K to 100, %D is the 3-mean") {
    // strictly rising closes with high = low = close: after warmup the
    // close IS the rolling max ⇒ %K = 100 exactly
    val vals = (1 to 8).map(_.toDouble)
    val bars = vals.zipWithIndex.map { case (v, i) =>
      ("k", new java.sql.Timestamp(1700000000000L + i * 3600000L), v, v, v)
    }.toDF("sym", "bkt", "hi", "lo", "cl")
    val out = Graft.stochastic(bars, "sym", "bkt", "hi", "lo", "cl", n = 4, dPeriod = 3)
      .orderBy("bkt").select("pct_k", "pct_d")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(out.take(3).forall(_._1.isEmpty), "%K null until n bars")
    assert(out.drop(3).forall(_._1.contains(100.0)), "rising series: close == rolling max")
    assert(out.take(5).forall(_._2.isEmpty), "%D null until n + dPeriod - 1 bars")
    assert(out.drop(5).forall(_._2.contains(100.0)))
  }

  test("stochastic: a flat window reads 50, not NaN") {
    val bars = (0 until 5).map { i =>
      ("k", new java.sql.Timestamp(1700000000000L + i * 3600000L), 7.0, 7.0, 7.0)
    }.toDF("sym", "bkt", "hi", "lo", "cl")
    val ks = Graft.stochastic(bars, "sym", "bkt", "hi", "lo", "cl", n = 3)
      .orderBy("bkt").select("pct_k").collect().map(r => Option(r.get(0)))
    assert(ks.drop(2).forall(_.contains(50.0)), "hh == ll ⇒ 50 by convention")
  }

  test("stochastic %K stays in [0, 100] on real bars") {
    val bars = Graft.resampleOhlc(Tables.t(spark, sfDir, "events"),
      "event_type", "ts", "event_id", "value", "hour")
    val k = Graft.stochastic(bars, "event_type", "bucket", "high", "low", "close", n = 14)
      .filter(col("pct_k").isNotNull)
    assert(k.count() > 0)
    assert(k.filter(col("pct_k") < 0.0 || col("pct_k") > 100.0).count() == 0,
      "close lies inside [rolling low, rolling high] by construction")
  }

  test("graft_winnow_set is consistent with graft_winnow's summary, bit for bit") {
    val df = Tables.t(spark, sfDir, "documents").limit(50)
      .filter(length(col("text")) >= 11)
      .select(
        expr("graft_winnow(text, 8, 4)").as("s"),
        expr("graft_winnow_set(text, 8, 4)").as("fps"))
      .select(col("s.n_fp"), col("s.fp_min"), col("s.fp_max"), col("s.fp_xor"),
        size(col("fps")).cast("long").as("c_n"),
        col("fps").getItem(0).as("c_min"),
        element_at(col("fps"), -1).as("c_max"),
        aggregate(col("fps"), lit(0L), (a, x) => a.bitwiseXOR(x)).as("c_xor"),
        (col("fps") === array_sort(col("fps"))).as("sorted"))
    val bad = df.filter(
      col("n_fp") =!= col("c_n") || col("fp_min") =!= col("c_min") ||
      col("fp_max") =!= col("c_max") || col("fp_xor") =!= col("c_xor") || !col("sorted"))
    assert(bad.count() == 0, "set kernel must agree with the summary kernel")
  }

  test("winnowPairs: identical docs overlap 1.0; disjoint docs never pair") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr")).toDF("id", "body")
    val pairs = Graft.winnowPairs(docs, "id", "body", kGram = 8, window = 4, minOverlap = 0.5)
      .collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    assert(pairs(0).getDouble(3) == 1.0, "identical fingerprint sets")
  }

  test("winnowPairs: the MOSS df cap drops corpus-wide fingerprints from pairing") {
    // doc 3 shares the long common prefix with 1 and 2 but nothing
    // else; with the cap at 2, prefix fingerprints (df = 3) vanish and
    // only the 1-2 pair (identical suffixes too) survives
    val common = "identical shared prefix text across all three documents here"
    val docs = Seq(
      (1L, common + " tail one alpha beta gamma delta epsilon"),
      (2L, common + " tail one alpha beta gamma delta epsilon"),
      (3L, common + " completely different ending zzz yyy xxx www")).toDF("id", "body")
    val capped = Graft.winnowPairs(docs, "id", "body", 8, 4, 0.5, maxDf = 2).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)),
      "df-3 prefix fingerprints must not pair; the identical tail still does")
    assert(capped(0).getDouble(3) == 1.0, "overlap is over the surviving sets")
  }

  test("winnowPairs finds the corpus's planted near-copies") {
    val pairs = SparkEntry.queries("t10_winnow_pairs")(spark, sfDir)
    assert(pairs.count() > 0, "testdata plants near-duplicate docs")
    assert(pairs.filter(col("overlap") > 1.0 || col("overlap") < 0.5).count() == 0)
  }

  test("heavyHitters: CMS estimates dominate exact counts and are exact sans collisions") {
    val docs = Tables.t(spark, sfDir, "documents")
    val hh = Graft.heavyHitters(docs, "text", k = 10).collect()
    assert(hh.length == 10)
    hh.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"CMS never underestimates: ${r.getString(0)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // a 31-word vocabulary in 4x1024 buckets: collisions are
    // essentially impossible, so the estimate is exact here
    assert(hh.forall(_.getLong(3) == 0L), "no collisions at this vocab/width ratio")
    // a tiny width forces collisions — the overestimate becomes visible
    val tight = Graft.heavyHitters(docs, "text", k = 10, rows = 2, width = 4).collect()
    assert(tight.exists(_.getLong(3) > 0L), "width=4 must collide")
    assert(tight.forall(r => r.getLong(2) >= r.getLong(1)), "still never underestimates")
  }

  test("streamingExtrema == batch rollingExtrema BIT-FOR-BIT across micro-batches") {
    import graft.streaming.{BollEvent, ExtremaOut, StreamOps}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val n = 17
    val input = MemoryStream[BollEvent]
    val q = StreamOps.streamingExtrema(input.toDS(), n)
      .writeStream.format("memory").queryName("ext_out").outputMode("append").start()
    try {
      val evs = Tables.t(spark, sfDir, "events")
        .select(col("event_type"), col("event_id"), col("ts"), col("value"))
        .as[BollEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("ext_out").as[ExtremaOut].collect()
        .map(o => (o.event_type, o.event_id) -> ((o.roll_min, o.roll_max))).toMap
      val want = Graft.rollingExtrema(Tables.t(spark, sfDir, "events"),
          "event_type", "ts", "event_id", "value", n)
        .select(col("event_type"), col(s"event_id"), col("roll_min"), col("roll_max"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((if (r.isNullAt(2)) None else Some(r.getDouble(2)),
            if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
      assert(got.keySet == want.keySet)
      want.foreach { case (k, w) => assert(got(k) == w, s"$k: ${got(k)} != $w") }
    } finally q.stop()
  }

  test("annPq: ADC ranks full top-k per query; a corpus vector's own codeword scores it first") {
    val e = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), F.asDouble(col("embedding")).as("v"))
    val out = Graft.annPq(e, e.filter(col("vec_id") < 5), e.filter(col("vec_id") < 8),
      "vec_id", "v", dims = 64, m = 4, kCodes = 8, k = 10)
    val rows = out.collect()
    assert(rows.length == 50, "5 queries x full top-10")
    assert(rows.forall(r => !r.isNullAt(3) && !r.isNullAt(4)))
    // a CODEBOOK vector queried with itself quantizes to its own
    // codewords: every other corpus vector's ADC is >= its own, and its
    // own ADC is the pure quantization residual >= 0
    val self = Graft.annPq(e, e.filter(col("vec_id") === 3), e.filter(col("vec_id") < 8),
      "vec_id", "v", dims = 64, m = 4, kCodes = 8, k = 3, excludeSelf = false).collect()
    assert(self.head.getLong(2) == 3L, "rank 1 is the query itself")
    assert(self.head.getDouble(4) > 0.999999, "cosine with itself")
  }

  test("winsorize: clipped rows take the percentile value; interior rows pass through") {
    val ev = Tables.t(spark, sfDir, "events")
    val w = Graft.winsorize(ev, "event_type", "value", lo = 0.01, hi = 0.99)
    assert(w.count() == ev.count(), "one output row per input row")
    assert(w.filter(col("clip") =!= 0).count() > 0, "p1/p99 must clip some tail rows")
    assert(w.filter(col("clip") === 0 && col("winsorized") =!= col("value")).count() == 0)
    // every clipped value equals its key's boundary: winsorized takes
    // exactly two distinct values per key among clipped rows
    val perKey = w.filter(col("clip") =!= 0)
      .groupBy("event_type", "clip").agg(countDistinct("winsorized").as("nv"))
    assert(perKey.filter(col("nv") =!= 1).count() == 0)
    // clip direction matches the value's side of the boundary
    assert(w.filter(col("clip") === -1 && col("value") >= col("winsorized")).count() == 0)
    assert(w.filter(col("clip") === 1 && col("value") <= col("winsorized")).count() == 0)
  }

  test("winsorize: [0, 1] bounds are the identity; degenerate bounds rejected") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 100.0), ("b", 5.0))
      .toDF("grp", "x")
    val idw = Graft.winsorize(df, "grp", "x", lo = 0.0, hi = 1.0)
    assert(idw.filter(col("clip") =!= 0).count() == 0, "min/max percentiles clip nothing")
    intercept[IllegalArgumentException] {
      Graft.winsorize(df, "grp", "x", lo = 0.9, hi = 0.5)
    }
  }

  test("graft_cdc: lossless partition, bounded chunks, matches a driver-side Gear fold") {
    val payloads = Tables.t(spark, sfDir, "documents").limit(30)
      .select(col("doc_id"), col("text"))
    val rows = payloads
      .withColumn("chunks", expr("graft_cdc(CAST(text AS BINARY), 6, 32, 256)"))
      .select(col("text"), col("chunks"))
      .collect()
    def ref(bytes: Array[Byte]): Seq[(String, Int)] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      def hx(off: Int, len: Int) = {
        md.reset(); md.update(bytes, off, len)
        md.digest().map(b => f"$b%02x").mkString
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
      var start = 0; var h = 0L
      for (i <- bytes.indices) {
        h = (h << 1) + graft.functions.Cdc.gear(bytes(i) & 0xff)
        val len = i - start + 1
        if ((len >= 32 && (h & 63L) == 0L) || len >= 256) {
          out += ((hx(start, len), len)); start = i + 1; h = 0L
        }
      }
      if (start < bytes.length) out += ((hx(start, bytes.length - start), bytes.length - start))
      out.toSeq
    }
    rows.foreach { r =>
      val bytes = r.getString(0).getBytes("UTF-8")
      val got = r.getSeq[org.apache.spark.sql.Row](1).map(c => (c.getString(0), c.getInt(1)))
      assert(got == ref(bytes), "kernel must match the reference fold")
      assert(got.map(_._2).sum == bytes.length, "lossless partition")
      assert(got.dropRight(1).forall(c => c._2 >= 32 && c._2 <= 256),
        "non-final chunks respect [min, max]")
    }
  }

  test("graft_cdc is shift-resistant where fixed-size chunking is not") {
    import spark.implicits._
    // a multi-KB payload (many content cuts); a 1-byte prepend must
    // cost at most the chunks before the first re-aligned boundary
    val text = Tables.t(spark, sfDir, "documents")
      .orderBy("doc_id").limit(20).select("text").as[String].collect().mkString(" ")
    val shifted = "X" + text
    val df = Seq(("orig", text), ("shifted", shifted)).toDF("which", "t")
      .withColumn("cdc", expr("transform(graft_cdc(CAST(t AS BINARY), 6, 32, 256), c -> c.md5)"))
    val m = df.select("which", "cdc").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(m("orig").size > 10, s"payload must chunk richly, got ${m("orig").size}")
    val cdcShared = (m("orig") intersect m("shifted")).size.toDouble / m("orig").size
    assert(cdcShared > 0.5,
      s"CDC re-aligns after one chunk: $cdcShared of chunks survive a 1-byte prepend")
    // fixed 64-byte windows: one prepended byte shifts every boundary
    def fixed(s: String) = s.getBytes("UTF-8").grouped(64).map(_.toSeq).toSet
    val fixedShared = (fixed(text) intersect fixed(shifted)).size
    assert(fixedShared == 0, "every fixed-size chunk shifts")
  }

  test("m06 finds the planted near-copies' shared chunks") {
    val out = SparkEntry.queries("m06_cdc_dedup")(spark, sfDir)
    assert(out.count() == 500)
    assert(out.filter(col("dedup_ratio") > 0.5).count() > 0,
      "planted near-copy payloads share most chunks")
    assert(out.filter(col("shared_bytes") > col("n_bytes")).count() == 0)
  }

  test("p01 pipeline invariants: dedup'd, quality-gated, split, and packed in order") {
    val out = SparkEntry.queries("p01_data_pipeline")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length < 500, "the pipeline must gate out SOME docs")
    val md5s = rows.map(_.getString(1))
    assert(md5s.distinct.length == md5s.length, "exact dedup: one doc per canonical md5")
    assert(rows.forall(_.getDouble(4) >= 0.55), "quality gate holds")
    assert(rows.map(_.getString(2)).toSet.subsetOf(Set("train", "val", "test")))
    // packing: per split, bins are the running-sum rule in doc order
    rows.groupBy(_.getString(2)).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(5) == cum / 2048L, s"bin rule broken at doc ${r.getLong(0)}")
        cum += r.getLong(3)
      }
    }
  }

  test("contaminationScore: a verbatim-lifted doc saturates, a fresh doc reads zero") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("id", "body")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // verbatim copy
      (2L, "one two three four five six seven eight nine ten"),         // disjoint
      (3L, "alpha beta gamma delta epsilon zeta eta theta nope fresh")) // shared prefix
      .toDF("id", "body")
    val out = Graft.contaminationScore(train, bench, "id", "body", n = 8, flagFrac = 0.2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(3) == 1.0 && out(1L).getBoolean(4), "verbatim ⇒ 1.0, flagged")
    assert(out(2L).getDouble(3) == 0.0 && !out(2L).getBoolean(4), "disjoint ⇒ 0.0")
    // doc 3: grams = 3 windows, 1 of them ("alpha..theta") is in bench
    assert(out(3L).getLong(1) == 3L && out(3L).getLong(2) == 1L)
    assert(out(3L).getBoolean(4), "1/3 > 0.2 flags — graded, not binary")
  }

  test("madOutliers: planted spikes flag, the bulk does not; zero-MAD degenerates sanely") {
    val base = (1 to 99).map(i => ("a", i.toLong, 10.0 + (i % 7) * 0.1)) :+ (("a", 100L, 500.0))
    val df = base.toDF("grp", "rid", "x")
    val out = Graft.madOutliers(df, "grp", "x", k = 3.0).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(out(100L).getBoolean(6), "the 500.0 spike must flag")
    assert(out(100L).getDouble(5) > 3.0, "spike robust_z clears the cut")
    val flagged = out.values.count(_.getBoolean(6))
    assert(flagged == 1, s"only the spike flags, got $flagged")
    // zero MAD: > half the rows identical — any deviation flags
    val flat = Seq(("b", 1L, 5.0), ("b", 2L, 5.0), ("b", 3L, 5.0), ("b", 4L, 9.0))
      .toDF("grp", "rid", "x")
    val fz = Graft.madOutliers(flat, "grp", "x").collect().map(r => r.getLong(1) -> r).toMap
    assert(fz(4L).getBoolean(6) && !fz(1L).getBoolean(6))
    assert(fz(4L).isNullAt(5), "robust_z is null when MAD is 0")
  }

  test("madOutliers and winsorize agree on tail membership at matched strengths") {
    val ev = Tables.t(spark, sfDir, "events")
    val m = Graft.madOutliers(ev, "event_type", "value", k = 3.0)
    assert(m.count() == ev.count())
    // every MAD outlier is deviant from ITS key's median by construction
    assert(m.filter(col("is_outlier") && col("value") === col("med")).count() == 0)
  }

  test("stripBoilerplate: newline segments — the classic line-dedup shape") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nalpha beta\nfooter"),
      (2L, "COOKIE BANNER\ngamma\nfooter"),
      (3L, "COOKIE BANNER\ndelta epsilon\nfooter"),
      (4L, "COOKIE BANNER\nfooter")).toDF("id", "body")
    // threshold ceil(0.9 * 4) = 4: only lines in ALL docs are boilerplate
    val out = Graft.stripBoilerplate(docs, "id", "body", "\n", minDocFrac = 0.9)
      .orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(1L) == (("alpha beta", 1L, 2L)))
    assert(byId(2L) == (("gamma", 1L, 2L)))
    assert(byId(3L) == (("delta epsilon", 1L, 2L)))
    assert(byId(4L) == (("", 0L, 2L)), "all-boilerplate doc yields empty text, not a dropped row")
  }

  test("stripBoilerplate: threshold is a ceil'd fraction and order is preserved") {
    val docs = Seq(
      (1L, "x\na\nx\nb"), (2L, "x\nc"), (3L, "d\ne")).toDF("id", "body")
    // ceil(0.6 * 3) = 2: 'x' (docs 1, 2) goes; everything else stays
    val out = Graft.stripBoilerplate(docs, "id", "body", "\n", minDocFrac = 0.6)
      .orderBy("id").collect()
    assert(out(0).getString(1) == "a\nb", "surviving segments rejoin in original order")
    assert(out(0).getLong(3) == 2L, "both occurrences of a boilerplate segment count")
    assert(out(1).getString(1) == "c")
    assert(out(2).getString(1) == "d\ne")
  }

  test("rollingExtrema == rowsBetween frame min/max bit-for-bit on testdata") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.t(spark, sfDir, "events")
    val n = 17
    val scan = Graft.rollingExtrema(ev, "event_type", "ts", "event_id", "value", n)
    val ord = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val frame = ord.rowsBetween(-(n - 1), Window.currentRow)
    val ref = ev.select(col("event_type"), col("event_id"),
        when(row_number().over(ord) >= n, min(col("value")).over(frame)).as("fmin"),
        when(row_number().over(ord) >= n, max(col("value")).over(frame)).as("fmax"))
    val j = scan.join(ref, Seq("event_type", "event_id"))
    assert(j.count() == ev.count())
    assert(j.filter(
      (col("roll_min") =!= col("fmin")) || (col("roll_max") =!= col("fmax")) ||
      (col("roll_min").isNull =!= col("fmin").isNull)).count() == 0,
      "deque scan must reproduce the frame's exact picks, nulls included")
  }

  test("rollingExtrema: ties, warmup nulls, and n = 1 degenerate window") {
    val out = Graft.rollingExtrema(series(Seq(5.0, 5.0, 2.0, 8.0, 8.0)),
        "sym", "t", "seq", "px", n = 2)
      .orderBy("ts_ms").select("roll_min", "roll_max")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(out(0) == ((None, None)), "null until n rows")
    assert(out(1) == ((Some(5.0), Some(5.0))), "tied window")
    assert(out(2) == ((Some(2.0), Some(5.0))))
    assert(out(3) == ((Some(2.0), Some(8.0))))
    assert(out(4) == ((Some(8.0), Some(8.0))), "tied extrema after eviction")
    val one = Graft.rollingExtrema(series(Seq(3.0, 1.0)), "sym", "t", "seq", "px", n = 1)
      .orderBy("ts_ms").collect()
    assert(one.forall(r => r.getDouble(3) == r.getDouble(4)), "n=1: every row is its own window")
  }

  test("rollingExtrema property: random series vs a driver-side sliding window") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(200)(math.floor(rnd.nextDouble() * 50) / 5.0) // many ties
    val n = 9
    val got = Graft.rollingExtrema(series(vals), "sym", "t", "seq", "px", n)
      .orderBy("ts_ms").select("roll_min", "roll_max")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    vals.indices.foreach { i =>
      val want =
        if (i >= n - 1) {
          val w = vals.slice(i - n + 1, i + 1)
          (Some(w.min), Some(w.max))
        } else (None, None)
      assert(got(i) == want, s"row $i")
    }
  }

  test("stripBoilerplate: consecutive delimiters collapse; empty segments never count") {
    val docs = Seq((1L, "a\n\nb"), (2L, "\n\nc")).toDF("id", "body")
    val out = Graft.stripBoilerplate(docs, "id", "body", "\n", minDocFrac = 1.0)
      .orderBy("id").collect()
    assert(out(0).getString(1) == "a\nb" && out(0).getLong(2) == 2L)
    assert(out(1).getString(1) == "c")
  }
}
