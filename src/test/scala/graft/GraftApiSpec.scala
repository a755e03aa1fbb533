package graft

import org.apache.spark.sql.functions._

/** The public Graft facade must work on arbitrary schemas — not just
  * the testdata columns the oracle queries bind. */
class GraftApiSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)

  private val bars = Seq(
    ("BTC", 1L, ts(0), 10.0), ("BTC", 2L, ts(1), 11.0), ("BTC", 3L, ts(2), 12.0),
    ("BTC", 4L, ts(200), 9.0), // 198-min gap -> new session, gap report row
    ("ETH", 5L, ts(0), 5.0), ("ETH", 6L, ts(1), 6.0))
    .toDF("sym", "bar_id", "t", "px")

  test("wma on a custom schema: null until full, exact weighted mean after") {
    val out = Graft.wma(bars, "sym", "t", "bar_id", "px", n = 3)
      .select("sym", "bar_id", "wma").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(("BTC", 1L)).isEmpty && out(("BTC", 2L)).isEmpty)
    assert(math.abs(out(("BTC", 3L)).get - (10 * 1 + 11 * 2 + 12 * 3) / 6.0) < 1e-12)
    assert(math.abs(out(("BTC", 4L)).get - (11 * 1 + 12 * 2 + 9 * 3) / 6.0) < 1e-12)
    assert(out(("ETH", 6L)).isEmpty) // only 2 rows, window never fills
  }

  test("sessionize + gaps agree about the hole in the series") {
    val sess = Graft.sessionize(bars, "sym", "t", "bar_id", "px", gapMs = 30 * 60000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(sess == Set(("BTC", 1L), ("BTC", 2L), ("ETH", 1L)), s"got $sess")
    val gap = Graft.gaps(bars, "sym", "t", "bar_id", minGapMs = 30 * 60000L).collect()
    assert(gap.length == 1 && gap(0).getString(0) == "BTC"
      && gap(0).getLong(3) == 198L * 60000L)
  }

  test("resampleOhlc picks first/last by time order") {
    val r = Graft.resampleOhlc(bars, "sym", "t", "bar_id", "px", "hour")
      .filter(col("sym") === "BTC" && hour(col("bucket")) === hour(lit(ts(0))))
    val row = r.head()
    assert(row.getDouble(row.fieldIndex("open")) == 10.0)
    assert(row.getDouble(row.fieldIndex("close")) == 12.0)
    assert(row.getDouble(row.fieldIndex("high")) == 12.0)
  }

  test("dedupKeepLast keeps the highest-priority row per key") {
    val dup = bars.unionByName(Seq(("BTC", 7L, ts(2), 99.0)).toDF("sym", "bar_id", "t", "px"))
    val out = Graft.dedupKeepLast(dup, Seq("sym", "t"), Seq(col("bar_id")))
      .filter(col("sym") === "BTC" && col("t") === ts(2)).collect()
    assert(out.length == 1 && out(0).getDouble(3) == 99.0)
  }

  test("connectedComponents labels with the component minimum") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("x", "y")
    val out = Graft.connectedComponents(pairs, "x", "y").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      10L -> (10L, 2L), 11L -> (10L, 2L)))
  }

  test("asofJoin carries the latest right row at-or-before each left row") {
    val quotes = Seq(("BTC", ts(0), 100.0), ("BTC", ts(10), 101.0), ("ETH", ts(5), 5.0))
      .toDF("sym", "t", "quote_px")
    val trades = Seq(("BTC", ts(4), 1L), ("BTC", ts(10), 2L), ("BTC", ts(11), 3L),
      ("ETH", ts(1), 4L), ("DOGE", ts(9), 5L))
      .toDF("sym", "t", "trade_id")
    val out = Graft.asofJoin(trades, quotes, "sym", "t", Seq("quote_px")).collect()
      .map(r => r.getLong(r.fieldIndex("trade_id")) ->
        (if (r.isNullAt(r.fieldIndex("quote_px"))) None else Some(r.getDouble(r.fieldIndex("quote_px"))))).toMap
    assert(out == Map(
      1L -> Some(100.0), // ts(4): latest quote is ts(0)
      2L -> Some(101.0), // equal ts: >= semantics sees the ts(10) quote
      3L -> Some(101.0),
      4L -> None, // ETH trade precedes the only ETH quote
      5L -> None)) // no DOGE quotes at all
    // asof_ts reports the matched quote time
    val m = Graft.asofJoin(trades, quotes, "sym", "t", Seq("quote_px"))
      .filter(col("trade_id") === 1L).head()
    assert(m.getTimestamp(m.fieldIndex("asof_ts")) == ts(0))
  }

  test("asofJoin carries the matched row's nulls — no back-fill from older right rows") {
    // quote at ts(10) has a NULL size; the older ts(0) quote has one.
    // The ts(11) trade matches ts(10): size must be null, NOT 7.0.
    val quotes = Seq(("BTC", ts(0), Some(100.0), Some(7.0)), ("BTC", ts(10), Some(101.0), None))
      .toDF("sym", "t", "quote_px", "quote_sz")
    val trades = Seq(("BTC", ts(11), 1L)).toDF("sym", "t", "trade_id")
    val r = Graft.asofJoin(trades, quotes, "sym", "t", Seq("quote_px", "quote_sz")).head()
    assert(r.getDouble(r.fieldIndex("quote_px")) == 101.0)
    assert(r.isNullAt(r.fieldIndex("quote_sz")),
      "null value column of the matched row must not be back-filled from an older row")
    assert(r.getTimestamp(r.fieldIndex("asof_ts")) == ts(10))
  }

  test("asofJoin generates collision-free temp names and rejects output collisions") {
    // user columns deliberately named like the old internals
    val quotes = Seq(("BTC", ts(0), 100.0, "r0")).toDF("sym", "t", "px", "__rts")
    val trades = Seq(("BTC", ts(1), 1L, "s1", "c1")).toDF("sym", "t", "__side", "__carry", "__asof_side")
    val out = Graft.asofJoin(trades, quotes, "sym", "t", Seq("px", "__rts")).head()
    assert(out.getDouble(out.fieldIndex("px")) == 100.0)
    assert(out.getString(out.fieldIndex("__rts")) == "r0")
    assert(out.getString(out.fieldIndex("__asof_side")) == "c1") // left cols untouched
    // carried name colliding with a left column must fail fast, not mis-select
    val bad = intercept[IllegalArgumentException] {
      Graft.asofJoin(trades.withColumnRenamed("__side", "px"), quotes, "sym", "t", Seq("px"))
    }
    assert(bad.getMessage.contains("px"))
    val badTs = intercept[IllegalArgumentException] {
      Graft.asofJoin(trades.withColumnRenamed("__side", "asof_ts"), quotes, "sym", "t", Seq("px"))
    }
    assert(badTs.getMessage.contains("asof_ts"))
  }

  test("rollingAutoCorr keeps every input row; corr null till full, ±1 on 2-point windows") {
    val out = Graft.rollingAutoCorr(bars, "sym", "t", "bar_id", "px", n = 2)
      .select("sym", "bar_id", "corr").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out.size == bars.count(), "first row per key must appear in the output")
    assert(out(("BTC", 1L)).isEmpty) // no lag pair yet
    assert(out(("BTC", 2L)).isEmpty) // one pair < n
    assert(math.abs(out(("BTC", 3L)).get - 1.0) < 1e-12) // rising: (11,10),(12,11)
    assert(math.abs(out(("BTC", 4L)).get + 1.0) < 1e-12) // turn: (12,11),(9,12)
    assert(out(("ETH", 5L)).isEmpty && out(("ETH", 6L)).isEmpty)
  }

  test("minhashPairs and simhashPairs find planted near-dups on a custom schema") {
    val docs = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again and again"),
      (102L, "the quick brown fox jumps over the lazy dog again and again"), // exact copy
      (103L, "a completely different document about spark window functions and shuffles"))
      .toDF("post_id", "body")
    val mh = Graft.minhashPairs(docs, "post_id", "body").collect()
    assert(mh.exists(r => r.getLong(0) == 101L && r.getLong(1) == 102L && r.getDouble(2) == 1.0))
    assert(!mh.exists(r => r.getLong(1) == 103L && r.getDouble(2) >= 0.5))
    val sh = Graft.simhashPairs(docs, "post_id", "body").collect()
    assert(sh.exists(r => r.getLong(0) == 101L && r.getLong(1) == 102L && r.getLong(2) == 0L))
    // custom banding parameters produce a well-formed pair list too
    val mh16 = Graft.minhashPairs(docs, "post_id", "body", shingleN = 2, k = 16, bands = 8)
    assert(mh16.columns.toSeq == Seq("doc_a", "doc_b", "est_sim"))
    assert(mh16.collect().exists(r => r.getLong(0) == 101L && r.getLong(1) == 102L))
  }

  test("ngramJaccardPairs and embeddingNearDupPairs on custom schemas") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // near-copy
      (3L, "one two three four five six seven eight"))
      .toDF("pid", "body")
    val jp = Graft.ngramJaccardPairs(docs, "pid", "body", threshold = 0.3).collect()
    assert(jp.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getDouble(2) > 0.3))
    assert(!jp.exists(r => r.getLong(1) == 3L))

    val vecs = Seq(
      (1L, (0 until 16).map(i => 1.0 + i * 0.01).toArray),
      (2L, (0 until 16).map(i => 1.0 + i * 0.011).toArray), // ~same direction
      (3L, (0 until 16).map(i => math.pow(-1.0, i) * (1.0 + i)).toArray))
      .toDF("vid", "emb")
    val np = Graft.embeddingNearDupPairs(vecs, "vid", "emb", dims = 16, threshold = 0.99,
      sketchBits = 8, bands = 4).collect()
    assert(np.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getDouble(2) > 0.99))
    assert(!np.exists(r => r.getLong(1) == 3L))
  }

  test("text operators run on a custom schema with sensible values") {
    val posts = Seq(
      (1L, "the quick brown fox of the river and the lazy dog in the meadow"),
      (2L, "der schnelle braune fuchs und die faule katze ist von hier"),
      (3L, "spam spam spam spam spam spam"))
      .toDF("pid", "body")
    val lang = Graft.langId(posts, "pid", "body").collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("pred_lang"))).toMap
    assert(lang(1L) == "en" && lang(2L) == "de")
    val q = Graft.textQuality(posts, "pid", "body")
      .filter(col("doc_id") === 1L).head()
    assert(q.getLong(q.fieldIndex("n_words")) == 14L)
    assert(q.getDouble(q.fieldIndex("stop_ratio")) > 0.3) // the/of/and/in...
    val tc = Graft.tokenCounts(posts, "pid", "body").filter(col("doc_id") === 3L).head()
    assert(tc.getLong(tc.fieldIndex("n_ws_tokens")) == 6L)
    val rep = Graft.repetitionSignals(posts, "pid", "body")
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("dup_word_ratio"))).toMap
    assert(rep(3L) > 0.8 && rep(2L) < 0.2) // all-same doc vs normal prose
  }

  test("knnBrute ranks by exact cosine with id tiebreak") {
    val vecs = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)), (3L, Array(0.0, 1.0)))
      .toDF("id", "v")
    val out = Graft.knnBrute(vecs, vecs.filter(col("id") === 1), "id", "v", k = 2)
      .select("rank", "id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (2L, 3L))) // 2 is nearest to 1, then 3
  }

  test("annIvf / annLsh on a custom schema agree with brute force on separable clusters") {
    // two well-separated direction clusters in 4 dims
    def va(b: Int, eps: Double) =
      if (b == 0) Array(1.0, eps, 0.0, 0.0) else Array(eps, 1.0, 0.0, 0.0)
    val corpus = (0L until 20L).map(i => (i, va((i % 2).toInt, 0.01 * (i / 2 + 1))))
      .toDF("vid", "emb")
    val queries = Seq((100L, va(0, 0.015)), (101L, va(1, 0.015))).toDF("vid", "emb")
    val cents = Seq((0L, Array(1.0, 0.0, 0.0, 0.0)), (1L, Array(0.0, 1.0, 0.0, 0.0)))
      .toDF("cid", "cv")
    val brute = Graft.knnBrute(corpus, queries, "vid", "emb", k = 3)
      .select("q_id", "rank", "vid").as[(Long, Long, Long)].collect()
      .map { case (q, r, v) => (q, r) -> v }.toMap
    val ivf = Graft.annIvf(corpus, queries, cents, "vid", "emb", "cid", "cv",
        k = 3, probes = 1)
      .select(col("q_id"), col("rank"), col("vid"), col("cell")).collect()
    assert(ivf.length == 6)
    ivf.foreach { r =>
      val (q, v, cell) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(cell == q - 100L, "probes=1 keeps each query in its own cluster cell")
      assert(v % 2 == q - 100L, "every hit is from the query's cluster")
      assert(brute((q, r.getLong(1))) == v, "in-cell ranks match the exact ranking")
    }
    val lsh = Graft.annLsh(corpus, queries, "vid", "emb", dims = 4, k = 3,
        sketchBits = 8, bands = 2)
      .select("q_id", "rank", "vid").as[(Long, Long, Long)].collect()
    // same-direction vectors share every sign band, so recall is full here
    lsh.foreach { case (q, r, v) => assert(brute((q, r)) == v) }
    assert(lsh.length == 6)
  }

  test("annLshAuto resolves small corpora to the clamp floor: identical to manual 24-bit") {
    val e = Tables.t(spark, sfDir, "embeddings")
    val auto = Graft.annLshAuto(e, e.filter(col("vec_id") < 3), "vec_id", "embedding",
      dims = 64, k = 5)
    val manual = Graft.annLsh(e, e.filter(col("vec_id") < 3), "vec_id", "embedding",
      dims = 64, k = 5, sketchBits = 24, bands = 4)
    assert(auto.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      manual.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    intercept[IllegalArgumentException] {
      Graft.annLshAuto(e, e, "vec_id", "embedding", dims = 64, k = 5, bands = 11)
    }
  }

  test("knnBrute excludeSelf=false keeps corpus rows whose id coincides with a query id") {
    val corpus = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1))).toDF("id", "v")
    // disjoint query table that HAPPENS to reuse id 1
    val queries = Seq((1L, Array(1.0, 0.0))).toDF("id", "v")
    val withSelf = Graft.knnBrute(corpus, queries, "id", "v", k = 2, excludeSelf = false)
      .select("rank", "id").as[(Long, Long)].collect().toSet
    assert(withSelf == Set((1L, 1L), (2L, 2L))) // corpus id 1 not dropped
    val dflt = Graft.knnBrute(corpus, queries, "id", "v", k = 2)
      .select("id").as[Long].collect().toSet
    assert(dflt == Set(2L)) // default documents the shared-id-space contract
  }
}
