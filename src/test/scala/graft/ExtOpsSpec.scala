package graft

import org.apache.spark.sql.functions._

/** Round-3 operators: range join, edit-distance near-dup, text
  * normalization, overlapping windows, approx sketches. */
class ExtOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)

  test("rangeJoin matches points to containing intervals with [start, end) bounds") {
    val points = Seq(
      ("u1", ts(0), 1L),   // == start of i1: inside
      ("u1", ts(30), 2L),  // mid i1
      ("u1", ts(60), 3L),  // == end of i1: OUTSIDE (half-open), == start of i2
      ("u1", ts(200), 4L), // in no interval
      ("u2", ts(30), 5L))  // right minutes, wrong key
      .toDF("uid", "t", "pid")
    val intervals = Seq(
      ("u1", ts(0), ts(60), 10L),   // i1
      ("u1", ts(60), ts(120), 11L), // i2 adjacent
      ("u3", ts(0), ts(300), 12L))  // other key
      .toDF("uid", "s", "e", "iid")
    val got = Graft.rangeJoin(points, intervals, "uid", "t", "s", "e", bucketMs = 10 * 60000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 11L)), s"got $got")
  }

  test("rangeJoin: intervals spanning many buckets match exactly once; empty intervals never") {
    val points = Seq(("k", ts(95), 1L)).toDF("uid", "t", "pid")
    val intervals = Seq(
      ("k", ts(0), ts(100), 20L),  // spans 10 buckets of 10 min
      ("k", ts(95), ts(95), 21L),  // empty: end == start
      ("k", ts(99), ts(90), 22L))  // inverted
      .toDF("uid", "s", "e", "iid")
    val got = Graft.rangeJoin(points, intervals, "uid", "t", "s", "e", bucketMs = 10 * 60000L)
      .select("pid", "iid").as[(Long, Long)].collect().toList
    assert(got == List((1L, 20L)), s"pair must appear exactly once: $got")
  }

  test("rangeJoin rejects colliding non-key column names") {
    val points = Seq(("k", ts(0), 1L)).toDF("uid", "t", "x")
    val intervals = Seq(("k", ts(0), ts(60), 2L)).toDF("uid", "s", "e", "x")
    val ex = intercept[IllegalArgumentException] {
      Graft.rangeJoin(points, intervals, "uid", "t", "s", "e", 60000L)
    }
    assert(ex.getMessage.contains("x"))
  }

  test("rangeJoin plans as an equi-join and matches the naive inequality-join result") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    def nlJoins(df: org.apache.spark.sql.DataFrame): Int = {
      df.count() // finalize AQE
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan; case o => o
      }
      p.collectWithSubqueries { case b: BroadcastNestedLoopJoinExec => b }.size
    }
    val e = Tables.t(spark, sfDir, "events")
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("v_event_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"), col("ts").as("p_start"),
        (col("ts") + expr("INTERVAL 4 HOURS")).as("p_end"))
    val binned = Graft.rangeJoin(views, purchases, "user_id", "ts", "p_start", "p_end", 3600000L)
    assert(nlJoins(binned) == 0, "bin join must plan as an equi-join")
    // the naive inequality-only form Spark would otherwise plan
    val naive = views.withColumnRenamed("user_id", "v_user").join(purchases,
      col("v_user") === col("user_id") &&
        col("ts") >= col("p_start") && col("ts") < col("p_end"))
    assert(naive.count() == binned.count(), "bin join computes the identical result")
  }

  test("editDistancePairs finds the planted typo near-dup and bounds the distance") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again todey"), // 1 edit
      (3L, "a completely different text about spark catalyst optimizer rules and joins"))
      .toDF("pid", "body")
    val got = Graft.editDistancePairs(docs, "pid", "body", maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.get((1L, 2L)).contains(1L), s"got $got")
    assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // tight threshold excludes the pair entirely (thresholded levenshtein path)
    val none = Graft.editDistancePairs(docs, "pid", "body", maxDist = 0).collect()
    assert(!none.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("normalizeText canonicalizes case, punctuation and whitespace to one form") {
    val docs = Seq(
      (1L, "Hello,   World! 42"),
      (2L, "hello world 42"),
      (3L, "unrelated")).toDF("pid", "body")
    val out = Graft.normalizeText(docs, "pid", "body").collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    assert(out(1L).getString(out(1L).fieldIndex("clean_text")) == "hello world 42")
    assert(out(1L).getString(out(1L).fieldIndex("clean_md5")) ==
      out(2L).getString(out(2L).fieldIndex("clean_md5")),
      "canonical forms of equivalent texts must hash identically")
    assert(out(1L).getLong(out(1L).fieldIndex("n_words")) == 3L)
    assert(out(1L).getDouble(out(1L).fieldIndex("removed_ratio")) > 0.0)
    assert(out(2L).getDouble(out(2L).fieldIndex("removed_ratio")) == 0.0)
  }

  test("m05 overlapping windows: 50% hop yields the full-frame count, adjacent windows share bytes") {
    val out = ops.MultiOps.queries("m05_overlap_windows")(spark, sfDir)
    val one = out.filter(col("doc_id") === 0).collect()
    val hexLen = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") === 0).select(length(hex(col("text").cast("binary"))))
      .head().getInt(0)
    val want = (hexLen - 64) / 32 + 1
    assert(one.length == want, s"expected $want full frames, got ${one.length}")
    // hop < frame ⇒ strictly more windows than non-overlapping m03-style frames
    assert(want > hexLen / 64)
  }

  test("fillGaps densifies the grid, forward-fills holes, and flags synthesized rows") {
    val bars = Seq(
      ("BTC", ts(0), 10.0), ("BTC", ts(180), 13.0), // 3-hour hole at +1h, +2h
      ("ETH", ts(60), 5.0))
      .toDF("sym", "bucket", "px")
    val out = Graft.fillGaps(bars, "sym", "bucket", "px").collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out.size == 5) // BTC 4 grid points + ETH 1
    assert(out(("BTC", ts(0))) == (10.0, false))
    assert(out(("BTC", ts(60))) == (10.0, true))  // carried forward
    assert(out(("BTC", ts(120))) == (10.0, true))
    assert(out(("BTC", ts(180))) == (13.0, false))
    assert(out(("ETH", ts(60))) == (5.0, false)) // single-point series intact
  }

  test("fillGaps linear mode interpolates holes time-weighted, forward-fills the tail") {
    val bars = Seq(
      ("BTC", ts(0), 10.0), ("BTC", ts(180), 13.0), // holes at +1h, +2h
      ("BTC", ts(240), 99.0))
      .toDF("sym", "bucket", "px")
    val out = Graft.fillGaps(bars, "sym", "bucket", "px", step = "interval 1 hour", mode = "linear")
      .collect().map(r => r.getTimestamp(1) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(ts(0)) == (10.0, false))
    assert(out(ts(60)) == (11.0, true))  // 10 + (13-10)*1/3
    assert(out(ts(120)) == (12.0, true)) // 10 + (13-10)*2/3
    assert(out(ts(180)) == (13.0, false))
    assert(out(ts(240)) == (99.0, false))
    val badMode = intercept[IllegalArgumentException] {
      Graft.fillGaps(bars, "sym", "bucket", "px", mode = "spline")
    }
    assert(badMode.getMessage.contains("spline"))
  }

  test("hashSplit rejects fractions that overflow 100%") {
    val docs = Seq((1L, "x")).toDF("doc_id", "t")
    val ex = intercept[IllegalArgumentException] {
      Graft.hashSplit(docs, "doc_id", trainPct = 80, valPct = 30)
    }
    assert(ex.getMessage.contains("80"))
  }

  test("hashSplit is deterministic, exhaustive, and near the requested fractions") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Graft.hashSplit(docs, "doc_id").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Graft.hashSplit(docs, "doc_id").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "same salt ⇒ identical assignment")
    assert(a.size == docs.count(), "every row is assigned")
    val train = a.values.count(_ == "train").toDouble / a.size
    assert(train > 0.68 && train < 0.92, s"~80% train at small n, got $train")
    // a different salt draws an independent split
    val c = Graft.hashSplit(docs, "doc_id", salt = "other").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a != c)
  }

  test("deterministicSample keeps the same rows across runs at roughly the rate per stratum") {
    val ev = Tables.t(spark, sfDir, "events")
    val s1 = Graft.deterministicSample(ev, "event_type", "event_id", permille = 100)
      .select("event_id").as[Long].collect().toSet
    val s2 = Graft.deterministicSample(ev, "event_type", "event_id", permille = 100)
      .select("event_id").as[Long].collect().toSet
    assert(s1 == s2 && s1.nonEmpty)
    val total = ev.count()
    assert(s1.size > total * 0.05 && s1.size < total * 0.16, s"${s1.size} of $total")
    // permille is monotone: a 20% sample contains the 10% sample
    val s3 = Graft.deterministicSample(ev, "event_type", "event_id", permille = 200)
      .select("event_id").as[Long].collect().toSet
    assert(s1.subsetOf(s3))
  }

  test("packBins: bins respect the budget except oversized singletons, order preserved") {
    val docs = Seq(
      ("en", 1L, 1000L), ("en", 2L, 900L), ("en", 3L, 300L), // bin 0: 1000+900; 300 starts at cum 1900 -> bin 0
      ("en", 4L, 5000L), // oversized: own bin
      ("de", 5L, 100L)).toDF("lang", "id", "tok")
    val out = Graft.packBins(docs, "lang", "id", "tok", budget = 2048L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(1L) == 0L && out(2L) == 0L)
    assert(out(3L) == 0L) // exclusive prefix 1900 < 2048
    assert(out(4L) == 1L) // exclusive prefix 2200
    assert(out(5L) == 0L) // independent shard
  }

  test("topTerms ranks by exact count with term tie-break") {
    val docs = Seq((1L, "b b b a a c"), (2L, "a d d")).toDF("pid", "body")
    val out = Graft.topTerms(docs, "body", 3)
      .as[(String, Long)].collect().toList
    assert(out == List(("a", 3L), ("b", 3L), ("d", 2L)))
  }

  test("bigramStats computes exact conditional next-word probabilities") {
    val docs = Seq((1L, "a b a b a c")).toDF("pid", "body")
    val out = Graft.bigramStats(docs, "body", 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("a", "b")) == (2L, 2.0 / 3.0)) // a heads 3 bigrams
    assert(out(("b", "a")) == (2L, 1.0))       // b always followed by a
    assert(out(("a", "c")) == (1L, 1.0 / 3.0))
    assert(out.size == 3)
  }

  test("approx sketches land within their documented error of the exact values") {
    val a01 = ops.CoreOps.queries("a01_approx_distinct")(spark, sfDir).collect()
    assert(a01.nonEmpty)
    a01.foreach { r =>
      assert(r.getDouble(r.fieldIndex("rel_err_users")) < 0.15,
        s"HLL default rsd 5%: ${r.mkString(",")}")
      assert(r.getDouble(r.fieldIndex("rel_err_ids")) < 0.10,
        s"HLL rsd 2%: ${r.mkString(",")}")
    }
    val a02 = ops.CoreOps.queries("a02_approx_percentile")(spark, sfDir).collect()
    assert(a02.nonEmpty)
    a02.foreach { r =>
      assert(r.getDouble(r.fieldIndex("max_rel_err")) < 0.05,
        s"accuracy 10000 on small groups should be near-exact: ${r.mkString(",")}")
    }
  }
}
