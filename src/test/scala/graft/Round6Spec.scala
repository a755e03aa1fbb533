package graft

import org.apache.spark.sql.functions._

/** Round-6 facade operators on custom schemas: the indicator trio
  * (rsi/atr/obv), the export shuffle (shuffleShards) and per-doc
  * TF-IDF — each spec pins the edge branch the DuckDB parity gate
  * exercises only incidentally (first-delta null, first-bar true
  * range, flat close, duplicate-free pos, idf smoothing). */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)

  private def series(px: Seq[Double]) =
    px.zipWithIndex.map { case (v, i) => ("S", i.toLong, ts(i), v) }
      .toDF("sym", "id", "t", "px")

  test("rsi: null through the warmup, first delta excluded, flat window pins 50") {
    // deltas: +1 +1 -1 0 → with n=3 the first rsi appears at row 4
    val out = Graft.rsi(series(Seq(10.0, 11.0, 12.0, 11.0, 11.0)), "sym", "t", "id", "px", n = 3)
      .orderBy("id").collect()
    val iRsi = out(0).fieldIndex("rsi")
    assert(out.take(3).forall(_.isNullAt(iRsi)), "rows 0-2 have < 3 deltas")
    // row 3: deltas +1 +1 -1 → gains 2, losses 1 → 100*2/3
    assert(math.abs(out(3).getDouble(iRsi) - 100.0 * 2 / 3) < 1e-9)
    // row 4: deltas +1 -1 0 → gains 1, losses 1 → 50
    assert(math.abs(out(4).getDouble(iRsi) - 50.0) < 1e-9)
    // an entirely flat series: all deltas 0 → gains = losses = 0 → 50, not NaN
    val flat = Graft.rsi(series(Seq(5.0, 5.0, 5.0, 5.0)), "sym", "t", "id", "px", n = 2)
      .orderBy("id").collect()
    assert(flat.drop(2).forall(r => r.getDouble(iRsi) == 50.0))
  }

  test("atr: first bar's true range is high-low; gaps use |high/low - prevClose|") {
    val bars = Seq(
      ("S", 1L, 12.0, 9.0, 10.0),  // first bar: tr = 3
      ("S", 2L, 11.0, 10.5, 11.0), // prevClose 10: tr = max(0.5, 1.0, 0.5) = 1
      ("S", 3L, 20.0, 18.0, 19.0)  // gap up from 11: tr = max(2, 9, 7) = 9
    ).toDF("sym", "bkt", "high", "low", "close")
    val out = Graft.atr(bars, "sym", "bkt", "high", "low", "close", n = 2)
      .orderBy("bkt").collect()
    val (iTr, iAtr) = (out(0).fieldIndex("tr"), out(0).fieldIndex("atr"))
    assert(out.map(_.getDouble(iTr)).toSeq == Seq(3.0, 1.0, 9.0))
    assert(out(0).isNullAt(iAtr), "null until n bars")
    assert(math.abs(out(1).getDouble(iAtr) - 2.0) < 1e-9) // (3+1)/2
    assert(math.abs(out(2).getDouble(iAtr) - 5.0) < 1e-9) // (1+9)/2
  }

  test("obv: volume flows with the sign of the close move; flat closes add 0") {
    val bars = Seq(
      ("S", 1L, 10.0, 100.0), // first bar: no delta → +0
      ("S", 2L, 11.0, 50.0),  // up → +50
      ("S", 3L, 11.0, 70.0),  // flat → +0
      ("S", 4L, 9.0, 30.0)    // down → -30
    ).toDF("sym", "bkt", "close", "vol")
    val out = Graft.obv(bars, "sym", "bkt", "close", "vol")
      .orderBy("bkt").collect()
    val iObv = out(0).fieldIndex("obv")
    assert(out.map(_.getDouble(iObv)).toSeq == Seq(0.0, 50.0, 50.0, 20.0))
  }

  test("shuffleShards: deterministic permutation, shard = h mod n, dense 0-based pos") {
    val df = (0L until 500L).map(i => (i, s"doc$i")).toDF("doc_id", "body")
    val a = Graft.shuffleShards(df, "doc_id", nShards = 7).orderBy("doc_id").collect()
    val b = Graft.shuffleShards(df.repartition(13), "doc_id", nShards = 7)
      .orderBy("doc_id").collect()
    // bit-for-bit reproducible whatever the input partitioning
    assert(a.map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSeq ==
      b.map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSeq)
    // every row lands in [0, n) and positions are dense 0..m-1 per shard
    val byShard = a.groupBy(_.getInt(2))
    assert(byShard.keySet.forall(s => s >= 0 && s < 7))
    byShard.values.foreach { rows =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // a different salt produces a different permutation
    val c = Graft.shuffleShards(df, "doc_id", nShards = 7, salt = "other")
      .orderBy("doc_id").collect()
    assert(a.map(_.getLong(3)).toSeq != c.map(_.getLong(3)).toSeq)
  }

  test("tfidfTopTerms: smoothed idf, rank by (score desc, term), k caps per doc") {
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "common common date")
    ).toDF("doc_id", "text")
    val out = Graft.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rnk").collect()
    def idf(df: Long) = math.log((1.0 + 3) / (1.0 + df)) + 1.0
    val d1 = out.filter(_.getLong(0) == 1L)
    // apple: tf 2, df 1 → clear winner; banana (df 2) beats common (df 3)
    assert(d1.map(_.getString(1)).toSeq == Seq("apple", "banana"))
    assert(math.abs(d1(0).getDouble(4) - 2 * idf(1)) < 1e-9)
    assert(math.abs(d1(1).getDouble(4) - 1 * idf(2)) < 1e-9)
    assert(out.count(_.getLong(0) == 1L) == 2, "k caps the per-doc rows")
    // doc 2: banana and cherry tie on tf=1 only if df equal — cherry df 1
    // beats banana df 2; the term tie-break is exercised in doc 3? no —
    // equal (tf, df) scores tie and break alphabetically:
    val d2 = out.filter(_.getLong(0) == 2L).map(_.getString(1)).toSeq
    assert(d2 == Seq("cherry", "banana"))
    // doc 3: common tf=2 outweighs its low idf here? score(common) =
    // 2*idf(3) = 2*1.0 = 2.0 vs date 1*idf(1) ≈ 1.693 → common first
    val d3 = out.filter(_.getLong(0) == 3L).map(_.getString(1)).toSeq
    assert(d3 == Seq("common", "date"))
  }

  test("lshBandBits: log-n growth holds the expected bucket occupancy bound") {
    import ops.DedupOps.lshBandBits
    // corpus ×10 → more bits, no knob change; occupancy n/2^bits stays
    // under targetBucket until the hard sketch-width cap
    val grows = Seq(500L, 5000L, 50000L, 500000L, 5000000L).map(lshBandBits(_))
    assert(grows == grows.sorted, "bits must be monotone in corpus size")
    for (n <- Seq(500L, 5000L, 50000L, 500000L)) {
      val b = lshBandBits(n)
      assert(b >= 6 && b <= 15)
      assert(n.toDouble / (1L << b) <= 32.0, s"occupancy bound broken at n=$n")
    }
    assert(lshBandBits(5000000L) == 15, "cap at the 64-bit sketch word")
    assert(lshBandBits(10L) == 6, "floor keeps small corpora from over-blocking")
  }

  test("embeddingNearDupPairsAuto wires the pre-pass into the same blocked plan") {
    val e = Tables.t(spark, sfDir, "embeddings")
    val auto = Graft.embeddingNearDupPairsAuto(e, "vec_id", "embedding",
      dims = 64, threshold = 0.45)
    val manual = Graft.embeddingNearDupPairs(e, "vec_id", "embedding",
      dims = 64, threshold = 0.45, sketchBits = 24, bands = 4)
    // the small test corpus resolves to the clamp floor (6 bits × 4
    // bands = 24): identical blocking, identical confirmed pairs
    assert(auto.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      manual.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("tfidfTopTerms: equal (tf, df) scores break ties alphabetically") {
    val docs = Seq((1L, "zebra alpha"), (2L, "zebra alpha")).toDF("doc_id", "text")
    val out = Graft.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rnk").collect()
    assert(out.filter(_.getLong(0) == 1L).map(_.getString(1)).toSeq == Seq("alpha", "zebra"))
  }

  // ---- randomized properties (fixed-seed pseudo-random walks) ----

  private def walk(seed: Int, n: Int): Seq[Double] = {
    val r = new scala.util.Random(seed)
    Iterator.iterate(100.0)(v => v * (1.0 + (r.nextDouble() - 0.5) / 50)).take(n).toSeq
  }

  test("property: rsi stays in [0, 100] and is null exactly through the warmup") {
    val df = (0 until 4).flatMap { s =>
      walk(s, 60).zipWithIndex.map { case (v, i) => (s"k$s", i.toLong, ts(i), v) }
    }.toDF("sym", "id", "t", "px")
    val out = Graft.rsi(df, "sym", "t", "id", "px", n = 14).collect()
    val (iId, iRsi) = (out(0).fieldIndex("id"), out(0).fieldIndex("rsi"))
    out.foreach { r =>
      if (r.getLong(iId) < 14) assert(r.isNullAt(iRsi))
      else {
        val v = r.getDouble(iRsi)
        assert(v >= 0.0 && v <= 100.0, s"rsi $v out of range")
      }
    }
  }

  test("property: atr true range is non-negative and >= high-low") {
    val bars = (0 until 3).flatMap { s =>
      val px = walk(10 + s, 40)
      px.zipWithIndex.map { case (v, i) =>
        (s"k$s", i.toLong, v * 1.02, v * 0.98, v) }
    }.toDF("sym", "bkt", "high", "low", "close")
    val out = Graft.atr(bars, "sym", "bkt", "high", "low", "close", n = 5).collect()
    val (iH, iL, iTr, iAtr) =
      (out(0).fieldIndex("high"), out(0).fieldIndex("low"),
        out(0).fieldIndex("tr"), out(0).fieldIndex("atr"))
    out.foreach { r =>
      assert(r.getDouble(iTr) >= r.getDouble(iH) - r.getDouble(iL) - 1e-12)
      if (!r.isNullAt(iAtr)) assert(r.getDouble(iAtr) >= 0.0)
    }
  }

  test("property: tfidf rows recompute from first principles; ranks dense from 1") {
    val r = new scala.util.Random(7)
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    val docs = (1L to 20L).map(i =>
      (i, Seq.fill(3 + r.nextInt(12))(vocab(r.nextInt(vocab.size))).mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val out = Graft.tfidfTopTerms(df, "doc_id", "text", k = 3)
      .orderBy("doc_id", "rnk").collect()
    val toks = docs.map { case (i, t) => i -> t.split(" ").toSeq }.toMap
    val dfCount = toks.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size)
    out.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      assert(rows.map(_.getLong(5)).sorted.toSeq == (1L to rows.length).toSeq, "dense ranks")
      rows.foreach { r0 =>
        val term = r0.getString(1)
        val tf = toks(id).count(_ == term).toLong
        assert(r0.getLong(2) == tf, s"tf of $term in doc $id")
        assert(r0.getLong(3) == dfCount(term).toLong)
        val want = tf * (math.log((1.0 + 20) / (1.0 + dfCount(term))) + 1.0)
        assert(math.abs(r0.getDouble(4) - want) < 1e-9)
      }
    }
  }

  test("invalid arguments fail fast with the parameter named") {
    val e = Tables.t(spark, sfDir, "embeddings")
    val ex = intercept[IllegalArgumentException] {
      Graft.embeddingNearDupPairsAuto(e, "vec_id", "embedding", dims = 64, bands = 11)
    }
    assert(ex.getMessage.contains("bands"))
    intercept[IllegalArgumentException] {
      graft.streaming.StreamOps.streamingRsi(
        spark.emptyDataset[graft.streaming.BollEvent], n = 0)
    }
  }

  test("property: shuffleShards loses and duplicates nothing") {
    val df = (0L until 777L).map(i => (i, s"v$i")).toDF("doc_id", "body")
    val out = Graft.shuffleShards(df, "doc_id", nShards = 5).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == (0L until 777L).toSeq)
  }
}
