package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-9 regression specs (non-Spark surfaces). */
class Round9Spec extends AnyFunSuite {

  private def write(dir: java.io.File, name: String, body: String): Unit =
    Files.write(new java.io.File(dir, name).toPath, body.getBytes("UTF-8"))

  test("previousRoundTimes parses Bench's own raw output line") {
    val dir = Files.createTempDirectory("bench_raw").toFile
    write(dir, "BENCH_r7.json",
      """{"queries":{"q01":0.5,"s06_ann_pq":2.54},"errors":{},"reruns":{},""" +
        """"jvm_chunks":9,"sf":"/root/testdata/sf0.1","n":2,"metric":"total","value":3.04,"unit":"sec"}""")
    val m = Bench.previousRoundTimes("/root/testdata/sf0.1", dir)
    assert(m == Map("q01" -> 0.5, "s06_ann_pq" -> 2.54))
    assert(Bench.previousRoundTimes("/root/testdata/sf0.01", dir).isEmpty,
      "different SF dir must not drift-compare")
  }

  test("previousRoundTimes parses the driver's escaped tail-wrapped artifact") {
    // The round-8 driver artifact shape: our JSON line embedded inside a
    // "tail" string with escaped quotes. The round-8 drift guard parsed
    // nothing out of this (empty reruns despite a 4.3x delta) — this spec
    // pins the unescape fix.
    val dir = Files.createTempDirectory("bench_drv").toFile
    write(dir, "BENCH_r8.json",
      """{
        |  "n": 8,
        |  "rc": 0,
        |  "cpus": 32,
        |  "sf": 0.1,
        |  "tail": "{\"queries\":{\"s06_ann_pq\":10.877,\"t11_bm25\":6.835},\"errors\":{},\"reruns\":{},\"jvm_chunks\":9,\"sf\":\"/root/testdata/sf0.1\",\"n\":2,\"metric\":\"total\",\"value\":17.7,\"unit\":\"sec\"}\n[success] Total time: 456 s"
        |}""".stripMargin)
    val m = Bench.previousRoundTimes("/root/testdata/sf0.1", dir)
    assert(m.get("s06_ann_pq").contains(10.877))
    assert(m.get("t11_bm25").contains(6.835))
    assert(!m.contains("value") && !m.contains("n") && !m.contains("rc"))
  }

  test("aucOf fails loudly on empty input and ignores NaN scores") {
    val spark = SparkSpec.session
    import spark.implicits._
    val empty = Seq.empty[(Double, Boolean, Long)].toDF("s", "y", "id")
    val e = intercept[IllegalArgumentException] {
      graft.ops.SimOps.aucOf(empty, "s", "y", "id").collect()
    }
    assert(e.getMessage.contains("no rows"))
    // NaN scores are dropped, not bucketed into garbage: AUC over
    // {0.9+, 0.1-} with a NaN row is exactly 1.0 either way
    val df = Seq((0.9, true, 1L), (0.1, false, 2L), (Double.NaN, true, 3L))
      .toDF("s", "y", "id")
    val row = graft.ops.SimOps.aucOf(df, "s", "y", "id").collect()(0)
    assert(row.getAs[Long]("n_pos") == 1L && row.getAs[Long]("n_neg") == 1L)
    assert(math.abs(row.getAs[Double]("auc") - 1.0) < 1e-9)
  }

  test("concurrent same-version commit loses loudly, store stays intact") {
    // Two committers that both computed next = v must not interleave
    // files under one version: the second writeVersion for the same v
    // throws VersionConflictException and the winner's data is intact.
    val spark = SparkSpec.session
    import spark.implicits._
    val path = Files.createTempDirectory("vstore_cas").toString + "/t"
    val a = Seq((1L, "a")).toDF("id", "name").withColumn("__op", org.apache.spark.sql.functions.lit("u"))
    val b = Seq((2L, "b")).toDF("id", "name").withColumn("__op", org.apache.spark.sql.functions.lit("u"))
    graft.sinks.VersionedStore.writeVersion(spark, path, a, 0)
    intercept[graft.sinks.VersionConflictException] {
      graft.sinks.VersionedStore.writeVersion(spark, path, b, 0)
    }
    val got = graft.sinks.VersionedStore.read(spark, path, 0, Seq("id")).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L), "winner's version 0 must survive the losing attempt")
  }

  test("reliable-checkpoint mode yields identical iterative results") {
    // The 100 TB stance: localCheckpoint pins blocks in executor
    // storage (lost on executor death); spark.graft.checkpoint.reliable
    // routes the same lineage truncations to the reliable checkpoint
    // dir. Results must be bit-identical either way.
    val spark = SparkSpec.session
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("a", "b")
    val docs = Seq("the cat sat on the mat", "the cat sat", "a mat on a cat")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    def run(): (Seq[String], Seq[String], Seq[String]) = (
      graft.ops.DedupOps.components(pairs, "a", "b")
        .orderBy("id").collect().map(_.toString).toSeq,
      graft.ops.DedupOps.pageRankOf(
        pairs.union(pairs.select(org.apache.spark.sql.functions.col("b"),
          org.apache.spark.sql.functions.col("a"))), "a", "b", iters = 3)
        .orderBy("node").collect().map(_.toString).toSeq,
      graft.ops.TextOps.bpeTrainOf(docs, "id", "text", 6)
        .orderBy("rank").collect().map(_.toString).toSeq)
    val local = run()
    val dir = Files.createTempDirectory("reliable_ck")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(graft.Checkpoints.ReliableKey, "true")
    try {
      val reliable = run()
      assert(reliable == local)
      assert(new java.io.File(dir.toString).listFiles.nonEmpty,
        "reliable mode must actually write to the checkpoint dir")
    } finally spark.conf.set(graft.Checkpoints.ReliableKey, "false")
  }

  test("hot-bucket guard drops the pathological bucket, keeps honest pairs") {
    // One degenerate LSH bucket (here: 40 identical docs, e.g. empty
    // boilerplate d01 missed) emits B²/2 ≈ 800 pairs and at corpus
    // scale dominates the whole job. With maxBucket set, the hot
    // bucket is dropped while pairs found through normal buckets
    // survive — an LSH pair needs only one surviving shared band.
    val spark = SparkSpec.session
    import spark.implicits._
    val boiler = (0 until 40).map(i => (i.toLong, "click here to accept cookies and continue to site"))
    val near = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "the quick brown fox jumps over the lazy dog again and once"))
    val docs = (boiler ++ near).toDF("doc_id", "text")
    val uncapped = graft.Graft.minhashPairs(docs, "doc_id", "text")
    val capped = graft.Graft.minhashPairs(docs, "doc_id", "text", maxBucket = 10)
    assert(uncapped.count() == 40L * 39 / 2 + 1, "40 clones pair fully + 1 honest pair")
    val keptPairs = capped.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(keptPairs.toSet == Set((100L, 101L)),
      s"capped run must keep exactly the honest near-dup pair, got ${keptPairs.toSeq}")

    // same guard on the embedding pipeline: 40 identical vectors in one
    // sketch bucket vs one honest near-dup pair of distinct vectors
    val vDup = Seq.tabulate(64)(i => math.sin(i + 1.0))
    val vA = Seq.tabulate(64)(i => math.cos(3.0 * i + 1.0))
    val vB = vA.updated(0, vA.head + 0.05)
    val vecs = ((0 until 40).map(i => (i.toLong, vDup)) ++ Seq((100L, vA), (101L, vB)))
      .toDF("vec_id", "embedding")
    val cappedV = graft.Graft.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      dims = 64, threshold = 0.95, maxBucket = 10)
    val keptV = cappedV.select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(keptV.toSet == Set((100L, 101L)),
      s"embedding guard must keep exactly the honest pair, got ${keptV.toSeq}")
  }

  test("substringDupStats: interval merge, internal repeats, clean docs") {
    val spark = SparkSpec.session
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),        // shares the full 5-token run with doc 2
      (2L, "a b c d e f"),      // superset: every doc-1 window duplicated
      (3L, "z z z z"),          // INTERNAL repeat: (z z z) at p=0 and p=1
      (4L, "m n o p q r"),      // all windows unique
      (5L, "xy")                // under w tokens: filtered out entirely
    ).toDF("doc_id", "text")
    val out = graft.Graft.substringDupStats(docs, "doc_id", "text", w = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // doc 1: windows abc/bcd/cde all shared with doc 2 -> merged coverage
    // is the whole doc (3 + 1 + 1), not 3*w=9 — the interval-union rule.
    assert(out(1L) == ((5L, 3L, 3L, 5L, 1.0)))
    // doc 2: 4 windows, 3 duplicated (def is unique), coverage 5 of 6
    assert(out(2L) == ((6L, 4L, 3L, 5L, 0.833333)))
    // doc 3: within-doc repeat counts (the Lee et al. rule)
    assert(out(3L) == ((4L, 2L, 2L, 4L, 1.0)))
    // doc 4: clean doc still reported, zeros
    assert(out(4L) == ((6L, 4L, 0L, 0L, 0.0)))
    assert(!out.contains(5L), "docs shorter than w have no windows")
  }

  test("incrementalDedup: exact precedence, near tie-break, new fallback") {
    val spark = SparkSpec.session
    import spark.implicits._
    val history = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally different words here entirely"),
      (3L, "alpha beta gamma delta epsilon zeta"), // dup inside history
      (4L, "totally different words here entirely") // -> tie with 2
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "Alpha  BETA gamma delta epsilon zeta"),     // exact after normalize
      (12L, "totally, different words here entirely!"),  // same tokens, diff md5
      (13L, "completely novel content nobody wrote before")
    ).toDF("doc_id", "text")
    val out = graft.Graft.incrementalDedup(history, batch, "doc_id", "text",
        threshold = 0.25)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out.size == 3, "one verdict per batch doc")
    // exact wins over near even though 10 also band-matches 1/3
    assert(out(10L) == (("exact", 1L)), "min history id for the md5 group")
    // identical token stream but different md5 -> near at est_sim 1.0,
    // tie between history 2 and 4 broken by min id
    assert(out(12L) == (("near", 2L)))
    assert(out(13L) == (("new", -1L)))
  }

  test("sqEncode/annSq: code bounds, constant dims, quantization error") {
    val spark = SparkSpec.session
    import spark.implicits._
    val dims = 8
    // deterministic spread + one CONSTANT dimension (index 7)
    val vecs = (0 until 20).map { i =>
      (i.toLong, Seq.tabulate(dims)(j => if (j == 7) 1.5 else math.sin(i * 1.7 + j)))
    }.toDF("vec_id", "v")
    val codes = graft.Graft.sqEncode(vecs, "vec_id", "v", dims).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size == 20)
    assert(codes.values.forall(_.forall(c => c >= 0 && c <= 255)), "8-bit range")
    assert(codes.values.forall(_(7) == 0), "constant dim encodes to 0")
    // grid extremes map to the grid ends
    val dim0 = codes.values.map(_(0))
    assert(dim0.min == 0 && dim0.max == 255, "min/max of a dim hit the code ends")

    val out = graft.Graft.annSq(vecs, vecs.filter($"vec_id" < 2), "vec_id", "v",
      dims, k = 5).collect()
    assert(out.length == 10, "k rows per query")
    // asymmetric SQ8 on an 8-dim grid: quantized cosine within half-step
    // error of the true cosine for every reported hit
    assert(out.forall(r => math.abs(r.getDouble(3) - r.getDouble(4)) < 0.02),
      "sq_cos tracks cos_sim within quantization error")
    val brute = graft.Graft.knnBrute(vecs, vecs.filter($"vec_id" < 2), "vec_id", "v", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).toSet
    val sq = out.map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = brute.map(t => (t._1, t._2)).count(sq.contains)
    assert(hits >= 8, s"recall@5 vs exact should be near-perfect on 20 vecs, got $hits/10")
  }

  test("mrlRecall: front-loaded signal keeps prefix recall, baseline is 1.0") {
    val spark = SparkSpec.session
    import spark.implicits._
    // Signal lives ENTIRELY in dims 0-3; dims 4-7 are constant. Prefix-4
    // retrieval must then match full-dim retrieval exactly.
    val front = (0 until 12).map { i =>
      (i.toLong, Seq.tabulate(8)(j => if (j < 4) math.sin(i * 2.3 + j) else 0.5))
    }.toDF("vec_id", "v")
    val r1 = graft.Graft.mrlRecall(front, front.filter($"vec_id" < 3), "vec_id", "v",
        fullDims = 8, prefixes = Seq(4, 8), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert((0 until 3).forall(q => r1((q.toLong, 8)) == 1.0), "baseline recall is 1 by definition")
    assert((0 until 3).forall(q => r1((q.toLong, 4)) == 1.0),
      "prefix covering all signal dims loses nothing")
    // Signal ONLY in the tail: prefix-4 sees constants, ranks by id -> poor
    val tail = (0 until 12).map { i =>
      (i.toLong, Seq.tabulate(8)(j => if (j >= 4) math.sin(i * 2.3 + j) else 0.5))
    }.toDF("vec_id", "v")
    val r2 = graft.Graft.mrlRecall(tail, tail.filter($"vec_id" < 3), "vec_id", "v",
        fullDims = 8, prefixes = Seq(4, 8), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert((0 until 3).forall(q => r2((q.toLong, 8)) == 1.0))
    assert(r2.filterKeys(_._2 == 4).values.sum / 3.0 < 1.0,
      "tail-signal corpus must lose recall under prefix truncation")
    intercept[IllegalArgumentException] {
      graft.Graft.mrlRecall(front, front, "vec_id", "v", 8, Seq(4), 3)
    }
  }

  test("dsirSelect: target-like docs score higher and dominate the draw") {
    val spark = SparkSpec.session
    import spark.implicits._
    val target = (0 until 6).map(i =>
      (100L + i, "the quick brown fox jumps over the lazy dog again and again")).toDF("doc_id", "text")
    val pool = ((0 until 8).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog")) ++
      (10 until 18).map(i => (i.toLong, "zzz qqq www eee rrr ttt yyy uuu iii ooo")) ++
      Seq((30L, "solo"))) // single token: no bigrams, excluded
      .toDF("doc_id", "text")
    val out = graft.Graft.dsirSelect(target, pool, "doc_id", "text",
      buckets = 512, sampleN = 6)
    val rows = out.collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(4))).toMap
    assert(!rows.contains(30L), "bigram-less docs are excluded")
    val likeT = (0 until 8).map(_.toLong)
    val unlike = (10 until 18).map(_.toLong)
    assert(likeT.map(rows(_)._1).min > unlike.map(rows(_)._1).max,
      "every target-like doc outscores every off-target doc")
    assert(rows.count(_._2._2 == 1) == 6, "exactly sampleN selected")
    assert(likeT.count(rows(_)._2 == 1) >= 5,
      "the exp(lr)-weighted draw is dominated by target-like docs")
    // pure function of (salt, ids, text): a rerun is bit-identical
    val again = graft.Graft.dsirSelect(target, pool, "doc_id", "text",
      buckets = 512, sampleN = 6).collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(4))).toMap
    assert(again == rows)
  }

  test("temperatureMix: alpha<1 flattens, alpha=1 is the natural mix") {
    val spark = SparkSpec.session
    import spark.implicits._
    // one giant domain (16k tokens), one tiny (100), one middling (1k)
    val docs = Seq(("big", 16000L), ("small", 100L), ("mid", 1000L))
      .toDF("domain", "n_tokens")
    val m = graft.Graft.temperatureMix(docs, "domain", "n_tokens",
        alpha = 0.3, budgetTokens = 100000L)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(math.abs(m.values.map(_._2).sum - 1.0) < 1e-12, "temp shares sum to 1")
    assert(m("small")._3 > 1.0 && m("big")._3 < 1.0,
      "alpha<1 boosts the tail and shrinks the head")
    assert(m("small")._2 > m("small")._1 && m("big")._2 < m("big")._1)
    // alpha = 1: pow(n, 1) == n exactly, so the temperature mix IS the
    // natural mix bit-for-bit
    val id = graft.Graft.temperatureMix(docs, "domain", "n_tokens", 1.0, 100000L)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(id.values.forall { case (nat, temp) => nat == temp })
  }

  test("streamingIncrementalDedup: history advances between micro-batches") {
    val spark = SparkSpec.session
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{DocEvent, StreamOps}
    val dir = Files.createTempDirectory("incdedup").toFile.getAbsolutePath
    val input = MemoryStream[DocEvent]
    val q = StreamOps.streamingIncrementalDedup(spark, input.toDF(),
      s"$dir/history", s"$dir/verdicts", s"$dir/ckpt", threshold = 0.25)
    try {
      input.addData(
        DocEvent(1L, "alpha beta gamma delta epsilon zeta"),
        DocEvent(2L, "totally different words here entirely"))
      q.processAllAvailable()
      input.addData(
        DocEvent(10L, "Alpha  beta gamma delta epsilon zeta"), // exact vs batch-1 doc 1
        DocEvent(11L, "totally different words here friend"),  // near vs batch-1 doc 2
        DocEvent(12L, "completely novel content nobody wrote"))
      q.processAllAvailable()
      // batch_id is a PARTITION column now — read back with inferred
      // (integer) type, so go through Number
      val v = spark.read.parquet(s"$dir/verdicts")
        .collect()
        .map(r => r.getLong(0) ->
          (r.getString(1), r.getAs[Number]("batch_id").longValue)).toMap
      assert(v(1L) == (("new", 0L)) && v(2L) == (("new", 0L)),
        "first batch sees an empty history")
      assert(v(10L)._1 == "exact" && v(11L)._1 == "near" && v(12L)._1 == "new",
        s"second batch must dedup against batch 1, got $v")
      assert(Seq(10L, 11L, 12L).forall(v(_)._2 == 1L), "batch provenance recorded")
      assert(spark.read.parquet(s"$dir/history").count() == 5,
        "both batches folded into the store")
    } finally q.stop()
  }

  test("bloomProbe: no false negatives; FPs appear as m shrinks") {
    val spark = SparkSpec.session
    import spark.implicits._
    val history = (0 until 200).map(i => (i.toLong, s"history document number $i payload"))
      .toDF("doc_id", "text")
    val batch = (
      Seq((1000L, "History  DOCUMENT number 7 payload")) ++   // member (normalize)
      (0 until 50).map(i => (2000L + i, s"novel text $i never seen"))
    ).toDF("doc_id", "text")
    // generous filter: the member hits, novels nearly all miss
    val big = graft.Graft.bloomProbe(history, batch, "doc_id", "text",
        mBits = 1 << 16, kHashes = 4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(big(1000L) == ((1, 1, 0)), "member: bloom and exact agree")
    assert(big.forall { case (_, (b, e, _)) => e != 1 || b == 1 },
      "NO false negatives, ever")
    assert(big.count(_._2._3 == 1) == 0, "64k bits / 200 docs: no FPs expected")
    // starved filter: false positives must appear, and every one is
    // flagged is_fp (bloom says yes, exact says no)
    val tiny = graft.Graft.bloomProbe(history, batch, "doc_id", "text",
        mBits = 64, kHashes = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(tiny(1000L)._1 == 1 && tiny(1000L)._2 == 1)
    assert(tiny.count(_._2._3 == 1) > 10, "64-bit filter over 200 keys must flood FPs")
    assert(tiny.forall { case (_, (b, e, f)) => f == (if (b == 1 && e == 0) 1 else 0) })
  }

  test("lengthGroups: grouped padding beats arrival, tokens conserved") {
    val spark = SparkSpec.session
    import spark.implicits._
    // interleaved short/long so arrival-order batches pad heavily
    val docs = (0 until 100).map(i =>
      (i.toLong, if (i % 2 == 0) 10L else 1000L)).toDF("doc_id", "n_tokens")
    val out = graft.Graft.lengthGroups(docs, "doc_id", "n_tokens", batchSize = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val (len, arr) = out.partition(_._1 == "length")
    assert(len.length == 10 && arr.length == 10)
    assert(len.forall(_._3 == 10L), "full batches of batchSize")
    // perfect separation: 50 shorts + 50 longs in batches of 10 -> zero padding
    assert(len.map(_._6).sum == 0L, "homogeneous-length batches pad nothing")
    assert(arr.map(_._6).sum == (1000L - 10L) * 50, "interleaved arrival pads every short")
    assert(len.map(_._5).sum == arr.map(_._5).sum, "token mass conserved across schemes")
    // deterministic: rerun is identical
    val again = graft.Graft.lengthGroups(docs, "doc_id", "n_tokens", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(again.toSeq == out.toSeq)
  }

  test("p03 gauntlet: every verdict observable, precedence and planting hold") {
    val spark = SparkSpec.session
    val out = graft.ops.DedupOps.queries("p03_curation_pipeline")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the five exact plants (copies of docs 0-4) must ALL flag exact_dup —
    // and exact precedence means none of them leaks into later stages
    assert((0 until 5).forall(i => out(10000L + i) == "exact_dup"),
      s"exact plants: ${(0 until 5).map(i => out.get(10000L + i))}")
    assert((0 until 5).forall(i => out(i.toLong) != "exact_dup"),
      "the min-id keeper of each md5 group survives stage 1")
    // the five self-repeating plants pair with nothing (unique shingles)
    // yet are 95.8% span-covered: substr_dup by construction
    assert((0 until 5).forall(i => out(20000L + i) == "substr_dup"),
      s"selfrep plants: ${(0 until 5).map(i => out.get(20000L + i))}")
    assert(out.values.exists(_ == "kept"), "clean docs survive the gauntlet")
  }

  test("phash: exact bit packing, hamming-blocked pairs, pigeonhole recall") {
    val spark = SparkSpec.session
    import spark.implicits._
    // 4-byte payloads, bits=4 -> samples are exactly the 4 bytes.
    // "aaaz": sum 413, only 'z'(122)*4 > 413      -> bits {3}   = 8
    // "aaoz": sum 427, 'o'(111)*4 and 'z'*4 > 427 -> bits {2,3} = 12
    // "zzaa": sum 438, the two 'z's               -> bits {0,1} = 3
    val docs = Seq((1L, "aaaz"), (2L, "aaoz"), (3L, "zzaa"))
      .toDF("doc_id", "text").withColumn("payload", $"text".cast("binary"))
    val h = graft.Graft.phash(docs, "doc_id", "payload", bits = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == Map(1L -> 8L, 2L -> 12L, 3L -> 3L), s"got $h")
    val pairs = graft.Graft.phashPairs(docs, "doc_id", "payload",
        bits = 4, chunks = 2, maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // 8 vs 12 differ in bit 2 only AND share low chunk 0 -> found;
    // 3 is 3 bits from 8 and 2 from 12: over maxHamming, not reported
    assert(pairs.toSeq == Seq((1L, 2L, 1)), s"got ${pairs.toSeq}")
    // byte-identical payloads always pair at hamming 0
    val dup = docs.union(Seq((10L, "aaaz")).toDF("doc_id", "text")
      .withColumn("payload", $"text".cast("binary")))
    val p2 = graft.Graft.phashPairs(dup, "doc_id", "payload", 4, 2, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(p2.contains((1L, 10L, 0)))
  }

  test("streamingSupertrend is bit-equal to the batch segmented scan") {
    val spark = SparkSpec.session
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{BarEvent, StreamOps}
    // deterministic wavy bars with enough range contraction to flip trend
    def ts(h: Int) = new java.sql.Timestamp(h * 3600000L)
    val bars = (for {
      k <- Seq("A", "B"); h <- 0 until 40
    } yield {
      val base = 100.0 + 20.0 * math.sin(h / 4.0 + (if (k == "A") 0 else 2))
      BarEvent(k, ts(h), base + 1.5, base - 1.5, base + math.cos(h.toDouble))
    }).sortBy(e => (e.ts.getTime, e.event_type))
    val batch = graft.Graft.supertrend(bars.toDF(), "event_type", "ts",
        "high", "low", "close", n = 10, mult = 3.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getInt(5))).toMap
    assert(batch.values.map(_._3).toSet == Set(1, -1), "both trends must occur")
    val input = MemoryStream[BarEvent]
    val q = StreamOps.streamingSupertrend(input.toDS(), 10, 3.0)
      .writeStream.format("memory").queryName("st_super").outputMode("append").start()
    try {
      input.addData(bars.take(30)); q.processAllAvailable()
      input.addData(bars.drop(30)); q.processAllAvailable()
      val streamed = spark.table("st_super")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getDouble(3), r.getDouble(4), r.getInt(5))).toMap
      assert(streamed == batch, "continuous twin must be bit-equal to batch")
    } finally q.stop()
  }

  test("cross-gate invariant: a05 exact_hit set == d13 exact verdicts") {
    // Both gates run the SAME history/batch split (doc_id % 5) and the
    // SAME whitespace-normalized md5 — the Bloom probe's exact answer
    // and the incremental-dedup exact verdict must therefore name the
    // identical doc set, and every one of them must also bloom-hit
    // (the no-false-negative law, cross-checked between operators).
    val spark = SparkSpec.session
    val dir = "/root/testdata/sf0.001"
    val bloom = graft.ops.DataOps.queries("a05_bloom_filter")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val inc = graft.ops.DedupOps.queries("d13_incremental_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bloom.keySet == inc.keySet, "same batch universe")
    val exactBloom = bloom.filter(_._2._2 == 1).keySet
    val exactInc = inc.filter(_._2 == "exact").keySet
    assert(exactBloom == exactInc, s"$exactBloom vs $exactInc")
    assert(exactBloom.forall(bloom(_)._1 == 1), "exact members always bloom-hit")
  }

  test("psar: rises under the lows in a trend, jumps to EP on reversal") {
    val spark = SparkSpec.session
    import spark.implicits._
    def ts(h: Int) = new java.sql.Timestamp(h * 3600000L)
    // 10 rising bars then a crash through the SAR
    val bars = ((0 until 10).map { h =>
      val b = 100.0 + 2.0 * h
      ("A", ts(h), b + 1.0, b - 1.0, b)
    } ++ Seq(("A", ts(10), 101.0, 99.0, 100.0)))
      .toDF("event_type", "ts", "high", "low", "close")
    val out = graft.Graft.psar(bars, "event_type", "ts", "high", "low", "close")
      .orderBy("ts_ms").collect()
      .map(r => (r.getLong(1) / 3600000L, r.getDouble(2), r.getDouble(3), r.getInt(4)))
    assert(out.length == 10, "seed bar emits nothing")
    val upLeg = out.init
    assert(upLeg.forall(_._4 == 1), "monotone rise keeps the up-trend")
    assert(upLeg.forall { case (h, _, sar, _) => sar < 100.0 + 2.0 * h - 1.0 },
      "SAR stays strictly below the bar lows while the trend holds")
    assert(upLeg.map(_._3).sliding(2).forall(p => p(0) <= p(1)),
      "SAR is non-decreasing within an up-trend (acceleration only)")
    val crash = out.last
    assert(crash._4 == -1, "the crash bar reverses the trend")
    assert(crash._3 == 119.0, "reversed SAR jumps to the old extreme point (max high = 118+1)")
  }

  test("calibrationBins: perfect separation yields a step diagram") {
    val spark = SparkSpec.session
    import spark.implicits._
    // scores 0.00..0.99, positive iff score >= 0.50: deciles 0-4 must be
    // all-negative, 5-9 all-positive, and every bin mean sits inside it
    val rows = (0 until 100).map(i => (i.toLong, i / 100.0, i >= 50))
      .toDF("id", "score", "is_pos")
    val out = graft.Graft.calibrationBins(rows, "score", "is_pos", "id")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.size == 10 && out.values.map(_._1).sum == 100L)
    (0 until 5).foreach(b => assert(out(b)._4 == 0.0, s"bin $b must be pure negative"))
    (5 until 10).foreach(b => assert(out(b)._4 == 1.0, s"bin $b must be pure positive"))
    out.foreach { case (b, (_, _, mean, _)) =>
      assert(mean >= b / 10.0 - 1e-9 && mean < (b + 1) / 10.0 + 1e-9,
        s"bin $b mean $mean outside its bounds")
    }
    intercept[IllegalArgumentException] {
      graft.Graft.calibrationBins(rows.filter($"id" < 0), "score", "is_pos", "id")
    }
  }

  test("ichimoku: warmup nulls, shifted spans, flat-series identity") {
    val spark = SparkSpec.session
    import spark.implicits._
    def ts(h: Int) = new java.sql.Timestamp(h * 3600000L)
    val bars = (0 until 80).map(h => ("A", ts(h), 105.0, 95.0, 100.0))
      .toDF("event_type", "ts", "high", "low", "close")
    val out = graft.Graft.ichimoku(bars, "event_type", "ts", "high", "low", "close")
      .orderBy("ts").collect()
    def d(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    out.zipWithIndex.foreach { case (r, i) =>
      val h = i + 1
      assert(d(r, 3).isDefined == (h >= 9), s"tenkan warmup at $h")
      assert(d(r, 4).isDefined == (h >= 26), s"kijun warmup at $h")
      // senkou_a needs kijun (26) shifted 26 -> first at bar 52;
      // senkou_b needs the 52-window shifted 26 -> first at bar 78
      assert(d(r, 5).isDefined == (h >= 52), s"senkou_a at $h")
      assert(d(r, 6).isDefined == (h >= 78), s"senkou_b at $h")
      assert(d(r, 7).isDefined == (h <= 80 - 26), s"chikou at $h")
      // flat series: every defined line is the 100.0 midpoint / close
      Seq(3, 4, 5, 6).foreach(c => d(r, c).foreach(v => assert(v == 100.0)))
      d(r, 7).foreach(v => assert(v == 100.0))
    }
  }

  test("previousRoundTimes picks the newest round artifact") {
    val dir = Files.createTempDirectory("bench_new").toFile
    write(dir, "BENCH_r2.json",
      """{"queries":{"q01":9.0},"sf":"/x","metric":"total","value":9.0}""")
    write(dir, "BENCH_r10.json",
      """{"queries":{"q01":1.0},"sf":"/x","metric":"total","value":1.0}""")
    assert(Bench.previousRoundTimes("/x", dir) == Map("q01" -> 1.0))
  }
}
