package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-16 laws: the delta-bounded graph-maintenance decomposition
  * (graphInsertDeltaOf / graphDeleteDeltaOf vs their full forms) that
  * lets the continuous index tick land only changed adjacency lists. */
class Round16Spec extends SparkSpec {
  import graft.ops.SimOps

  private def vecsOf(dir: String): DataFrame =
    Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), F.asDouble(col("embedding")).as("v"))

  private def sameRows(x: DataFrame, y: DataFrame): Boolean =
    x.count() == y.count() && x.except(y).isEmpty && y.except(x).isEmpty

  test("graphInsertOf decomposes EXACTLY into graphInsertDeltaOf plus the " +
    "untouched original lists (the delta-landing law)") {
    val all = vecsOf("/root/testdata/sf0.001")
    val a = all.filter(col("vec_id") % 10 =!= 9)
    val b = all.filter(col("vec_id") % 10 === 9)
    val anchors = all.filter(pmod(col("vec_id"), lit(64)) === 0)
    val edges = SimOps.knnGraphOf(a, anchors, "vec_id", "v", "vec_id", "v",
      r = 8, cellProbes = 2, descentRounds = 1).localCheckpoint(eager = true)
    val full = SimOps.graphInsertOf(a, b, edges, anchors, anchors,
      "vec_id", "v", r = 8, beam = 4, hops = 3).localCheckpoint(eager = true)
    val delta = SimOps.graphInsertDeltaOf(a, b, edges, anchors, anchors,
      "vec_id", "v", r = 8, beam = 4, hops = 3).localCheckpoint(eager = true)
    val untouched = edges.join(delta.select("src").distinct(),
      Seq("src"), "left_anti")
    val recomposed = delta.unionByName(untouched)
    assert(sameRows(full, recomposed),
      "delta lists ∪ untouched lists must equal the full insert bit-for-bit")
    info(s"changed-list rows ${delta.count()} vs full index rows ${full.count()}")
    // every delta node's list is in the changed set
    assert(delta.select("src").distinct()
      .join(b.select(col("vec_id").as("src")), Seq("src"), "left_semi")
      .count() == b.count(), "every inserted node needs a landed list")
  }

  test("graphInsertDeltaOf: a SMALL delta lands a small changed set — the " +
    "challenge fan-in is bounded by the delta's cells, not the corpus") {
    val all = vecsOf("/root/testdata/sf0.01")
    val a = all.filter(col("vec_id") % 100 =!= 99)
    val b = all.filter(col("vec_id") % 100 === 99)
    val anchors = all.filter(pmod(col("vec_id"), lit(64)) === 0)
    val edges = SimOps.knnGraphOf(a, anchors, "vec_id", "v", "vec_id", "v",
      r = 8, cellProbes = 2, descentRounds = 1).localCheckpoint(eager = true)
    val delta = SimOps.graphInsertDeltaOf(a, b, edges, anchors, anchors,
      "vec_id", "v", r = 8, beam = 4, hops = 3).localCheckpoint(eager = true)
    val (nd, nf) = (delta.count(), edges.count() + delta.count())
    info(s"1% delta: changed-list rows $nd of ~$nf total index rows")
    assert(nd < nf / 2,
      s"a 1% insert must not re-land most of the index ($nd of $nf)")
  }

  test("annIndexTick with deletes: the merged index view equals the one-shot " +
    "delete-then-insert composition bit-for-bit, replay is idempotent, and " +
    "the delete tick's landing is delta-bounded") {
    import graft.streaming.StreamOps
    val all = vecsOf("/root/testdata/sf0.001")
    val a0 = all.filter(col("vec_id") % 10 =!= 8)
    val b = all.filter(col("vec_id") % 10 === 8)
    val d = all.filter(col("vec_id") % 10 === 9)
    val store = java.nio.file.Files.createTempDirectory("r16_tickd_").toString
    StreamOps.annIndexTick(spark, store, a0, "vec_id", "v",
      r = 8, beam = 4, hops = 3, landingId = 0L)
    StreamOps.annIndexTick(spark, store, b, "vec_id", "v",
      r = 8, beam = 4, hops = 3, landingId = 1L, deletes = d)
    val merged = StreamOps.annIndexReport(spark, store)
      .localCheckpoint(eager = true)
    // one-shot composition: build on a0, delete d, insert b on survivors
    val anchors0 = a0.filter(pmod(col("vec_id"), lit(64)) === 0)
    val edges0 = SimOps.knnGraphOf(a0, anchors0, "vec_id", "v", "vec_id", "v",
      r = 8, cellProbes = 2, descentRounds = 1).localCheckpoint(eager = true)
    val afterDel = SimOps.graphDeleteOf(a0, d, edges0, "vec_id", "v", r = 8)
    val survivors = a0.join(d.select("vec_id"), Seq("vec_id"), "left_anti")
    val anchorsS = survivors.filter(pmod(col("vec_id"), lit(64)) === 0)
    val oneShot = SimOps.graphInsertOf(survivors, b, afterDel, anchorsS,
      anchorsS, "vec_id", "v", r = 8, beam = 4, hops = 3)
      .localCheckpoint(eager = true)
    assert(sameRows(merged, oneShot),
      "stream-through-the-store must equal the one-shot delete+insert composition")
    // no deleted src or dst survives in the merged view
    assert(merged.join(d.select(col("vec_id").as("src")), Seq("src"), "left_semi").isEmpty)
    assert(merged.join(d.select(col("vec_id").as("dst")), Seq("dst"), "left_semi").isEmpty)
    // the tick's landing held only changed lists, not the index
    val landed1 = spark.read.parquet(s"$store/edges")
      .filter(col("__landing").cast("long") === 1L)
    info(s"tick-1 landing rows ${landed1.count()} vs index rows ${merged.count()}")
    // replay tick 1: merged view unchanged
    StreamOps.annIndexTick(spark, store, b, "vec_id", "v",
      r = 8, beam = 4, hops = 3, landingId = 1L, deletes = d)
    assert(sameRows(StreamOps.annIndexReport(spark, store), merged),
      "replaying the delete+insert tick must not change the merged index")
  }

  test("annIndexTick: delete then RE-INSERT resurrects a node (newest event " +
    "wins in the live view) and a deletes-only tick works") {
    import graft.streaming.StreamOps
    val all = vecsOf("/root/testdata/sf0.001")
    val d = all.filter(col("vec_id") % 10 === 9)
    val store = java.nio.file.Files.createTempDirectory("r16_res_").toString
    StreamOps.annIndexTick(spark, store, all, "vec_id", "v",
      r = 8, beam = 4, hops = 3, landingId = 0L)
    // deletes-only tick
    StreamOps.annIndexTick(spark, store, all.filter(lit(false)), "vec_id", "v",
      r = 8, beam = 4, hops = 3, landingId = 1L, deletes = d)
    val afterDel = StreamOps.annLiveVectors(spark, store)
    assert(afterDel.join(d.select("vec_id"), Seq("vec_id"), "left_semi").isEmpty,
      "deleted ids must leave the live view")
    assert(StreamOps.annIndexReport(spark, store)
      .join(d.select(col("vec_id").as("dst")), Seq("dst"), "left_semi").isEmpty,
      "no deleted dst may survive a deletes-only tick")
    // re-insert the same ids: they come back
    StreamOps.annIndexTick(spark, store, d, "vec_id", "v",
      r = 8, beam = 4, hops = 3, landingId = 2L)
    val resurrected = StreamOps.annLiveVectors(spark, store)
    assert(resurrected.join(d.select("vec_id"), Seq("vec_id"), "left_semi")
      .count() == d.count(), "re-inserted ids must be live again")
    assert(StreamOps.annIndexReport(spark, store)
      .join(d.select(col("vec_id").as("src")), Seq("src"), "left_semi")
      .select("src").distinct().count() == d.count(),
      "every re-inserted node must have an adjacency list in the index view")
  }

  test("filteredAnnOf: every result matches the predicate, ranks are dense " +
    "per query, and recall vs the FILTERED brute truth holds (while " +
    "filter-after-search returns fewer matches)") {
    val all = Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), F.asDouble(col("embedding")).as("v"), col("label"))
    val corpus = all.select(col("vec_id"), col("v"))
    val anchors = corpus.filter(pmod(col("vec_id"), lit(64)) === 0)
    val edges = SimOps.knnGraphOf(corpus, anchors, "vec_id", "v", "vec_id", "v",
      r = 8, cellProbes = 2, descentRounds = 1).localCheckpoint(eager = true)
    val matching = all.filter(col("label") === 1)
    val queries = corpus.filter(col("vec_id") < 5)
    val k = 10
    // beam 40 = plain-beam 4 / ~9% selectivity (the over-fetch rule
    // documented on the operator; beam 4 measured recall 0.18 here)
    val res = SimOps.filteredAnnOf(corpus, queries, anchors, edges,
      "vec_id", "v", matching, k = k, beam = 40, hops = 3)
      .localCheckpoint(eager = true)
    // predicate completeness: nothing outside label = 1
    assert(res.join(matching.select("vec_id"), Seq("vec_id"), "left_anti").isEmpty)
    // dense ranks 1..n per query
    assert(res.groupBy("q_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .filter(col("n") =!= col("mx")).isEmpty)
    // recall vs filtered brute truth
    val truth = Graft.knnBrute(
        corpus.join(matching.select("vec_id"), Seq("vec_id"), "left_semi"),
        queries, "vec_id", "v", k)
      .select(col("q_id"), col("vec_id"))
    val hits = truth.join(res.select(col("q_id"), col("vec_id")),
      Seq("q_id", "vec_id"), "left_semi").count()
    val total = truth.count()
    info(f"filtered recall@$k = ${hits.toDouble / total}%.3f ($hits/$total)")
    assert(hits.toDouble / total >= 0.6,
      "filtered graph search must find most of the filtered brute truth")
    // the naive alternative (plain top-k, then filter) under-fills
    val naive = SimOps.graphAnnOf(corpus, queries, anchors, edges,
        "vec_id", "v", k = k, beam = 4, hops = 3)
      .join(matching.select("vec_id"), Seq("vec_id"), "left_semi").count()
    info(s"filter-after-search kept $naive rows vs ${res.count()} from the filtered rank")
    assert(naive < res.count(),
      "filter-after-top-k must return fewer matches than rank-after-filter")
  }

  test("annIndexCompact: merged views are bit-stable across compaction, a " +
    "subsequent tick lands identical lists on compacted vs uncompacted " +
    "stores, and older landings are dropped") {
    import graft.streaming.StreamOps
    val all = vecsOf("/root/testdata/sf0.001")
    val a0 = all.filter(col("vec_id") % 10 =!= 8)
    val b1 = all.filter(col("vec_id") % 10 === 8)
    val d1 = all.filter(col("vec_id") % 10 === 9)
    def build(store: String): Unit = {
      StreamOps.annIndexTick(spark, store, a0, "vec_id", "v",
        r = 8, beam = 4, hops = 3, landingId = 0L)
      StreamOps.annIndexTick(spark, store, b1, "vec_id", "v",
        r = 8, beam = 4, hops = 3, landingId = 1L, deletes = d1)
    }
    val sA = java.nio.file.Files.createTempDirectory("r16_cmpA_").toString
    val sB = java.nio.file.Files.createTempDirectory("r16_cmpB_").toString
    build(sA); build(sB)
    val before = StreamOps.annIndexReport(spark, sB).localCheckpoint(eager = true)
    val liveBefore = StreamOps.annLiveVectors(spark, sB).localCheckpoint(eager = true)
    StreamOps.annIndexCompact(spark, sB, upTo = 2L)
    assert(sameRows(StreamOps.annIndexReport(spark, sB), before),
      "the index view must be bit-stable across compaction")
    assert(sameRows(StreamOps.annLiveVectors(spark, sB), liveBefore),
      "the live-vector view must be bit-stable across compaction")
    // old landings gone: exactly one landing remains in each store
    val landings = spark.read.parquet(s"$sB/edges")
      .select(col("__landing").cast("long")).distinct().count()
    assert(landings == 1L, s"expected 1 edge landing after compaction, got $landings")
    // a further tick (re-insert of the deleted slice) lands identically
    StreamOps.annIndexTick(spark, sA, d1, "vec_id", "v",
      r = 8, beam = 4, hops = 3, landingId = 2L)
    StreamOps.annIndexTick(spark, sB, d1, "vec_id", "v",
      r = 8, beam = 4, hops = 3, landingId = 2L)
    assert(sameRows(StreamOps.annIndexReport(spark, sA),
      StreamOps.annIndexReport(spark, sB)),
      "a tick must land the same index on compacted and uncompacted stores")
  }

  test("hashClassifierOf(exact = false): the order-free map-side-combine " +
    "gradient trains to the same model — identical predictions, score " +
    "drift bounded in ulps (the a06/a07 production-swap contract)") {
    import graft.ops.TextOps
    val dir = "/root/testdata/sf0.01"
    val docs = Tables.t(spark, dir, "documents")
    val ws = F.words(col("text"))
    val ratioed = docs.filter(size(ws) > 0)
      .select(col("doc_id"),
        (size(filter(ws, w => w.isin("a", "the"))).cast("double") /
          size(ws).cast("double")).as("ratio"))
    val med = ratioed.agg(expr("percentile(ratio, 0.5D)").as("med"))
    val labels = ratioed.crossJoin(broadcast(med))
      .select(col("doc_id"),
        when(col("ratio") >= col("med"), 1.0).otherwise(-1.0).as("y"))
    def run(exact: Boolean) = TextOps.hashClassifierOf(docs, "doc_id", "text",
        labels, "y", dim = 64, lr = 50.0, iters = 5, exact = exact)
      .select(col("doc_id"), col("score"), col("predicted"))
      .localCheckpoint(eager = true)
    val (ex, ap) = (run(exact = true), run(exact = false))
    assert(ex.count() == ap.count())
    val j = ex.as("e").join(ap.as("a"), "doc_id")
    assert(j.filter(col("e.predicted") =!= col("a.predicted")).isEmpty,
      "exact and production gradients must agree on every prediction")
    val maxDelta = j.select(max(abs(col("e.score") - col("a.score"))))
      .head().getDouble(0)
    info(f"max |score_exact - score_prod| = $maxDelta%.3e")
    assert(maxDelta < 1e-9,
      s"score drift between gradient forms must be ulp-scale, got $maxDelta")
  }

  test("ohlcStoreReport(beforeLanding): the frozen-prefix view is a pure " +
    "function of landings before the bound — later ticks cannot move it") {
    import graft.streaming.StreamOps
    val ev = Tables.t(spark, "/root/testdata/sf0.01", "events")
      .withColumn("__tick", dayofmonth(col("ts")) % 3)
    val store = java.nio.file.Files.createTempDirectory("r16_ohlc_").toString
    def tick(n: Int): Unit =
      StreamOps.ohlcTick(spark, s"$store/ohlc",
        ev.filter(col("__tick") === n), Seq("event_type"),
        "ts", "event_id", "value", "hour", n.toLong)
    tick(0); tick(1)
    val frozenAt2 = StreamOps.ohlcStoreReport(spark, s"$store/ohlc",
      Seq("event_type"), beforeLanding = Some(2L))
      .orderBy("event_type", "bucket_ms").localCheckpoint(eager = true)
    tick(2) // a later landing with rows for the SAME buckets
    val frozenAfter = StreamOps.ohlcStoreReport(spark, s"$store/ohlc",
      Seq("event_type"), beforeLanding = Some(2L))
      .orderBy("event_type", "bucket_ms")
    assert(frozenAt2.exceptAll(frozenAfter).isEmpty &&
      frozenAfter.exceptAll(frozenAt2).isEmpty,
      "the frozen prefix must be byte-stable across later landings")
    // and the unbounded view DID move (tick 2 carries real rows)
    val unbounded = StreamOps.ohlcStoreReport(spark, s"$store/ohlc",
      Seq("event_type"))
    assert(unbounded.exceptAll(frozenAt2).count() > 0,
      "the unbounded view must absorb the new landing")
  }

  test("graphDeleteOf decomposes EXACTLY into graphDeleteDeltaOf plus the " +
    "untouched live lists (the delta-landing law, delete side)") {
    val all = vecsOf("/root/testdata/sf0.001")
    val anchors = all.filter(pmod(col("vec_id"), lit(64)) === 0)
    val edges = SimOps.knnGraphOf(all, anchors, "vec_id", "v", "vec_id", "v",
      r = 8, cellProbes = 2, descentRounds = 1).localCheckpoint(eager = true)
    val del = all.filter(col("vec_id") % 10 === 9)
    val full = SimOps.graphDeleteOf(all, del, edges, "vec_id", "v", r = 8)
      .localCheckpoint(eager = true)
    val delta = SimOps.graphDeleteDeltaOf(all, del, edges, "vec_id", "v", r = 8)
      .localCheckpoint(eager = true)
    val delIds = del.select(col("vec_id").as("src"))
    val untouched = edges
      .join(delta.select("src").distinct(), Seq("src"), "left_anti")
      .join(delIds, Seq("src"), "left_anti")
    val recomposed = delta.unionByName(untouched.select("src", "dst", "cos"))
    assert(sameRows(full, recomposed),
      "changed lists ∪ untouched live lists must equal the full delete bit-for-bit")
    assert(delta.join(delIds, Seq("src"), "left_semi").isEmpty,
      "a deleted src must not land a list")
    info(s"changed-list rows ${delta.count()} vs live index rows ${full.count()}")
  }

  test("st18 gate: tombstones stay dead through compaction and every live " +
    "id keeps a list (the lifecycle invariants end-to-end)") {
    import graft.streaming.StreamOps
    val out = StreamOps.queries("st18_stream_ann_compact")(
      spark, "/root/testdata/sf0.001").localCheckpoint(eager = true)
    assert(out.filter(col("src") % 10 === 9 || col("dst") % 10 === 9).isEmpty,
      "a deleted id must survive on neither edge end after compaction + insert")
    val live = vecsOf("/root/testdata/sf0.001")
      .filter(col("vec_id") % 10 =!= 9).count()
    val srcs = out.select("src").distinct().count()
    assert(srcs == live,
      s"every live id needs an adjacency list ($srcs lists for $live live ids)")
  }

  test("epochMixOf: full epochs carry EVERY domain doc, the fractional epoch " +
    "IS mixtureSampleOf at the leftover budget, and unweighted domains are " +
    "absent (the ds25 laws)") {
    import graft.ops.DataOps
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("n_tokens", size(F.words(col("text"))).cast("long"))
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .localCheckpoint(true)
    val avail0 = docs.filter(col("source") === "src0")
      .agg(sum("n_tokens")).head.getLong(0)
    assume(avail0 > 0, "sf0.001 documents must contain src0 rows")
    // target(src0) = 0.5 · 5·avail0 = 2.5·avail0 → epochs exactly 2.5
    val budget = 5L * avail0
    val weights = Map("src0" -> 0.5, "src1" -> 0.5)
    val mix = DataOps.epochMixOf(docs, "source", "doc_id", "n_tokens",
      weights, budget, maxEpochs = 4.0).localCheckpoint(true)

    assert(mix.filter(!col("source").isin("src0", "src1")).isEmpty,
      "domains outside the weight table must contribute nothing")

    val n0 = docs.filter(col("source") === "src0").count()
    for (e <- Seq(0L, 1L))
      assert(mix.filter(col("source") === "src0" && col("epoch") === e)
        .count() == n0, s"full epoch $e must carry every src0 doc")
    assert(mix.filter(col("source") === "src0")
      .agg(max("epoch")).head.getLong(0) == 2L,
      "src0 at epochs 2.5 must end at the fractional epoch 2")

    // the fractional epoch == ds06's mixtureSampleOf at the leftover budget
    // (pbudget = 0.5·avail0; an integer prefix is < p iff < ceil(p))
    val pb = math.ceil(0.5 * avail0).toLong
    val partial = mix
      .filter(col("source") === "src0" && col("epoch") === 2L)
      .select("doc_id", "source", "n_tokens")
    val ds06Pick = DataOps.mixtureSampleOf(
        docs.filter(col("source") === "src0"), "source", "doc_id", "n_tokens",
        Map("src0" -> pb))
      .select("doc_id", "source", "n_tokens")
    assert(sameRows(partial, ds06Pick),
      "the fractional epoch must be the ds06 pick at the leftover budget")

    // token conservation: the partial fill lands in [pbudget, pbudget + max doc)
    val filled = partial.agg(sum("n_tokens")).head.getLong(0)
    val maxDoc = docs.filter(col("source") === "src0")
      .agg(max("n_tokens")).head.getLong(0)
    assert(filled >= pb && filled < pb + maxDoc,
      s"partial fill $filled must land in [$pb, ${pb + maxDoc})")
    info(s"src0: avail $avail0, partial budget $pb, filled $filled")
  }
}
