package graft

import graft.ops.{DataOps, SimOps, TextOps}
import org.apache.spark.sql.functions._

/** Round-7b operators: BM25 retrieval, E-S weighted sampling, per-group
  * top-% pruning, covariance + PCA — semantic properties beyond the
  * DuckDB gate. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: hand-computed score on a 3-doc corpus; zero-score docs drop") {
    val docs = Seq(
      (1L, "spark spark join"),    // tf(spark)=2, dl=3
      (2L, "join join join"),      // tf=0 for query → drops
      (3L, "spark"),               // tf=1, dl=1
      (4L, "")                     // no tokens → excluded from N/avgdl
    ).toDF("doc_id", "text")
    val out = TextOps.bm25Of(docs, "doc_id", "text", Seq("spark"), k1 = 1.2, b = 0.75, topK = 10)
      .orderBy("rnk").collect()
    // N=3 tokenized docs, avgdl=7/3, df(spark)=2
    val n = 3.0; val avgdl = 7.0 / 3.0; val df = 2.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def score(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val got = out.map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(3L, 1L)) // dl=1 beats dl=3 at these tfs
    assert(math.abs(got(0)._2 - score(1, 1)) < 1e-12)
    assert(math.abs(got(1)._2 - score(2, 3)) < 1e-12)
    assert(got.map(_._3).toSeq == Seq(1L, 2L))
    assert(!got.map(_._1).contains(2L) && !got.map(_._1).contains(4L))
  }

  test("bm25: topK truncates and rank is dense from 1") {
    val docs = (1 to 30).map(i => (i.toLong, "alpha " * i)).toDF("doc_id", "text")
    val out = TextOps.bm25Of(docs, "doc_id", "text", Seq("alpha"), topK = 7).collect()
    assert(out.length == 7)
    assert(out.map(_.getLong(3)).sorted.toSeq == (1L to 7L))
  }

  test("weightedSample matches a driver-side brute-force replay and is deterministic") {
    val rows = (1L to 200L).map(i => (i, (i % 7 + 1).toDouble))
    val df = rows.toDF("id", "w")
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val want = rows.map { case (id, w) =>
      val u = (hash60(s"salt7:$id") + 1).toDouble / 1152921504606846976.0
      (id, math.log(u) / w)
    }.sortBy { case (id, key) => (-key, id) }.take(25).map(_._1)
    val got = DataOps.weightedSampleOf(df, "id", "w", "salt7", 25)
      .orderBy("rnk").select("id").as[Long].collect().toSeq
    assert(got == want)
    val again = DataOps.weightedSampleOf(df, "id", "w", "salt7", 25)
      .orderBy("rnk").select("id").as[Long].collect().toSeq
    assert(again == got)
  }

  test("weightedSample: non-positive weights never drawn; n caps the draw") {
    val df = Seq((1L, 5.0), (2L, 0.0), (3L, -1.0), (4L, 2.0)).toDF("id", "w")
    val got = DataOps.weightedSampleOf(df, "id", "w", "s", 10)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 4L))
    assert(DataOps.weightedSampleOf(df, "id", "w", "s", 1).count() == 1)
  }

  test("topPctPerGroup: exact ceil cutoffs per group, scores ordered") {
    val df = (for (g <- Seq("a", "b"); i <- 1 to 5)
      yield (g, i.toLong, i.toDouble)).toDF("g", "id", "s")
    def kept(pct: Int): Map[String, Seq[Long]] =
      DataOps.topPctPerGroupOf(df, "g", "s", "id", pct)
        .collect().groupBy(_.getString(0))
        .map { case (g, rs) => g -> rs.map(_.getLong(1)).sorted.toSeq }
    assert(kept(40) == Map("a" -> Seq(4L, 5L), "b" -> Seq(4L, 5L))) // ceil(2)=2
    assert(kept(1) == Map("a" -> Seq(5L), "b" -> Seq(5L)))          // ceil(0.05)=1
    assert(kept(100) == Map("a" -> (1L to 5L), "b" -> (1L to 5L)))
    assert(kept(50)("a") == Seq(3L, 4L, 5L))                        // ceil(2.5)=3
  }

  test("crossNearDup: recall vs brute force at the threshold; no same-side pairs") {
    // deterministic vectors: base direction per group, small per-item tilt
    def vec(g: Int, k: Int): Seq[Double] =
      (0 until 8).map(d => math.cos(g * 1.1 + d) + 0.01 * k * math.sin(d + g))
    val left = (0 until 40).map(i => (i.toLong, vec(i % 4, i))).toDF("id", "v")
    val right = (100 until 110).map(i => (i.toLong, vec(i % 4, i))).toDF("id", "v")
    val got = graft.ops.DedupOps
      .crossNearDupOf(left, right, "id", "v", 0.99, sketchBits = 16, bands = 8, dims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force truth
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val truth = (for {
      (i, vi) <- (0 until 40).map(i => (i.toLong, vec(i % 4, i)))
      (j, vj) <- (100 until 110).map(j => (j.toLong, vec(j % 4, j)))
      if cos(vi, vj) >= 0.99
    } yield (i, j)).toSet
    assert(truth.nonEmpty)
    assert(got.subsetOf(truth))          // precision exact (cosine confirm)
    assert(got.size >= truth.size * 8 / 10) // band recall high at 0.99
    assert(got.forall { case (a, b) => a < 100 && b >= 100 })
  }

  test("crossNearDupPairsAuto: precision stays exact, results confirm at threshold") {
    def vec(g: Int, k: Int): Seq[Double] =
      (0 until 8).map(d => math.cos(g * 1.1 + d) + 0.01 * k * math.sin(d + g))
    val left = (0 until 40).map(i => (i.toLong, vec(i % 4, i))).toDF("id", "v")
    val right = (100 until 110).map(i => (i.toLong, vec(i % 4, i))).toDF("id", "v")
    val got = Graft.crossNearDupPairsAuto(left, right, "id", "v", dims = 8,
        threshold = 0.99, bands = 8).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getDouble(2) >= 0.99)) // exact-cosine confirm holds
    assert(got.forall(r => r.getLong(0) < 100 && r.getLong(1) >= 100))
  }

  test("quantileBins: known cuts, boundary goes to upper bin, degenerate key collapses") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0),
      ("b", 7.0), ("b", 7.0), ("b", 7.0)).toDF("k", "v")
    val got = graft.ops.CoreOps.quantileBinsOf(df, "k", "v", 4)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getInt(2)).toMap
    // key a: cuts at p25/p50/p75 = 17.5, 25, 32.5 → one value per bin
    assert(got(("a", 10.0)) == 0 && got(("a", 20.0)) == 1)
    assert(got(("a", 30.0)) == 2 && got(("a", 40.0)) == 3)
    // key b: all-equal values → cuts all equal v → everything upper bin
    assert(got(("b", 7.0)) == 3)
    // boundary: value == cut counts the cut (≤ rule) → upper bin
    val eq = graft.ops.CoreOps.quantileBinsOf(
        Seq(("x", 1.0), ("x", 2.0), ("x", 3.0)).toDF("k", "v"), "k", "v", 2)
      .collect().map(r => r.getDouble(1) -> r.getInt(2)).toMap
    assert(eq(2.0) == 1) // median = 2.0 exactly; 2.0 lands above
    intercept[IllegalArgumentException](
      graft.ops.CoreOps.quantileBinsOf(df, "k", "v", 1))
  }

  test("bpeTrain matches a driver-side reference BPE exactly (merges, counts, order)") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new"),
      (3L, "low news new lower")).toDF("doc_id", "text")
    val got = TextOps.bpeTrainOf(docs, "doc_id", "text", 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

    // reference: word-level Sennrich BPE with greedy left-to-right apply
    val freq = Seq("low", "lower", "lowest", "low", "low", "new", "newer",
      "newest", "new", "low", "news", "new", "lower")
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var vocab: Map[Seq[String], Long] =
      freq.map { case (w, c) => (w.map(_.toString) :+ "</w>") -> c }.toMap
    def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += (l + r); i += 2 }
        else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    val want = (1 to 8).flatMap { rank =>
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach { case Seq(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + c; case _ => } }
      if (pairs.isEmpty) None
      else {
        val ((l, r), n) = pairs.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        vocab = vocab.groupBy { case (syms, _) => applyMerge(syms, l, r) }
          .map { case (syms, m) => syms -> m.values.sum }
        Some((rank, l, r, n))
      }
    }
    assert(got == want)
    assert(got.size == 8 && got.map(_._1) == (1 to 8))
  }

  test("bpeEncode: matches per-word reference apply; tokens rejoin to the input") {
    val docs = Seq(
      (1L, "low lower lowest"),
      (2L, "new newer lownew")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrainOf(docs, "doc_id", "text", 6)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = TextOps.bpeEncodeOf(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getLong(2))).toMap

    def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += (l + r); i += 2 }
        else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    def encodeWord(w: String): Seq[String] =
      merges.foldLeft[Seq[String]](w.map(_.toString) :+ "</w>")((s, m) => applyMerge(s, m._1, m._2))
    Map(1L -> "low lower lowest", 2L -> "new newer lownew").foreach { case (id, text) =>
      val want = text.split(" ").toSeq.flatMap(encodeWord)
      assert(got(id)._1 == want, s"doc $id")
      assert(got(id)._2 == want.length.toLong)
      // lossless: stripping markers reconstructs the concatenated words
      assert(got(id)._1.mkString.replace("</w>", "") == text.replace(" ", ""))
    }
  }

  test("bpe merge kernel: greedy left-to-right, 'aaa' + (a,a) -> [aa, a]") {
    val df = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    val got = TextOps.bpeTrainOf(df, "doc_id", "text", 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 1: pairs in "aaa</w>": (a,a)x2; in "aaaa</w>": (a,a)x3 -> (a,a)=5
    assert(got.head == ("a", "a", 5L))
    // after merge: [aa,a,</w>] and [aa,aa,</w>] -> round 2 top pair (aa,aa)=1? No:
    // pairs: (aa,a)=1,(a,</w>)=1,(aa,aa)=1,(aa,</w>)=1 -> tie on count, lex (a,</w>) wins
    assert(got(1) == ("a", "</w>", 1L))
  }

  test("bpeTrain: resume from persisted merges reproduces the uninterrupted run bit-for-bit") {
    // the restart contract: replay the k merges already persisted
    // (map-only), continue training — ranks k+1..N must equal an
    // uninterrupted N-merge run exactly, counts included
    val docs = (1L to 30L).map(i =>
      (i, "alpha beta gamma delta " * (i % 3 + 1).toInt)).toDF("doc_id", "text")
    val full = TextOps.bpeTrainOf(docs, "doc_id", "text", 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(full.length == 10)
    val persisted = full.take(4).map(t => (t._2, t._3)).toSeq
    val resumed = TextOps.bpeTrainOf(docs, "doc_id", "text", 6, persisted)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(resumed.toSeq == full.drop(4).toSeq,
      s"resumed run diverged:\n${resumed.toSeq}\nvs\n${full.drop(4).toSeq}")
  }

  test("linearTrend: exact OLS on a known line + noise; degenerate series null out") {
    import graft.ops.FinOps
    // y = 3 + 2x exactly → slope 2, intercept 3, r2 1
    val line = (0 until 20).map(i => ("line", i.toLong, 3.0 + 2.0 * i))
    // constant series → dy = 0 → r2 null, slope 0
    val flat = (0 until 5).map(i => ("flat", i.toLong, 7.0))
    // single point → n < 2 → all null
    val one = Seq(("one", 0L, 1.0))
    val df = (line ++ flat ++ one).toDF("k", "b", "v")
    val out = FinOps.trendOf(df, "k", "b", "v").orderBy("series").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("flat", "line", "one"))
    val l = out(1)
    assert(math.abs(l.getDouble(2) - 2.0) < 1e-9 && math.abs(l.getDouble(3) - 3.0) < 1e-9)
    assert(math.abs(l.getDouble(4) - 1.0) < 1e-9)
    assert(out(0).getDouble(2) == 0.0 && out(0).isNullAt(4), "flat: slope 0, r2 null")
    assert(out(2).isNullAt(2) && out(2).isNullAt(3) && out(2).isNullAt(4), "n=1: all null")
    // descending line: negative slope, r2 = 1
    val desc = (0 until 10).map(i => ("d", i.toLong, 100.0 - 5.0 * i)).toDF("k", "b", "v")
    val dr = FinOps.trendOf(desc, "k", "b", "v").collect()(0)
    assert(math.abs(dr.getDouble(2) + 5.0) < 1e-9 && math.abs(dr.getDouble(4) - 1.0) < 1e-9)
  }

  test("featureHash: sign-cancelling cells from first principles; partitioning-invariant") {
    import graft.ops.TextOps
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta beta gamma"), (3L, "")).toDF("id", "body")
    val out = TextOps.featureHashOf(docs, "id", "body", dim = 8, salt = "s").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // recompute from first principles with the same md5 formula
    def h60(s: String): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    def cell(toks: Seq[String]): Map[Long, (Long, Long)] =
      toks.groupBy(t => h60("s:" + t) % 8).map { case (b, ts) =>
        b -> (ts.map(t => if (h60("sgn:" + t) % 2 == 0) 1L else -1L).sum, ts.size.toLong)
      }
    val want = Map(1L -> cell(Seq("alpha", "beta", "alpha")),
      2L -> cell(Seq("beta", "beta", "gamma")))
    val wantFlat = for ((d, cs) <- want; (b, v) <- cs) yield (d, b) -> v
    assert(out == wantFlat, s"$out vs $wantFlat")
    assert(!out.keySet.exists(_._1 == 3L), "empty doc yields no cells")
    // deterministic under repartitioning
    val again = TextOps.featureHashOf(docs.repartition(7), "id", "body", dim = 8, salt = "s")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(again == out)
    intercept[IllegalArgumentException](TextOps.featureHashOf(docs, "id", "body", dim = 1))
  }

  test("covariance matches the exact driver-side computation") {
    val data = Seq(
      (1L, Seq(1.0, 2.0, 0.5)), (2L, Seq(2.0, 1.0, 1.5)),
      (3L, Seq(3.0, 5.0, -1.0)), (4L, Seq(0.0, 4.0, 2.0)))
    val df = data.toDF("id", "v")
    val n = data.size.toDouble
    def mean(k: Int) = data.map(_._2(k)).sum / n
    def cov(i: Int, j: Int) =
      data.map(r => r._2(i) * r._2(j)).sum / n - mean(i) * mean(j)
    val got = SimOps.covarianceOf(df, "id", "v").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == 6) // 3*4/2 upper-triangle cells
    for (i <- 0 until 3; j <- i until 3) {
      val (cnt, c) = got((i, j))
      assert(cnt == 4L)
      assert(math.abs(c - cov(i, j)) < 1e-12, s"cov($i,$j)")
    }
  }

  test("covariance samplePermille: deterministic subset, moments converge to the full pass") {
    // 4000 deterministic quasi-random rows; half-rate sample should
    // reproduce every covariance cell within sampling error
    val data = (0 until 4000).map { k =>
      val a = 2.0 * math.sin(k * 0.7)
      (k.toLong, Seq(a, 0.8 * a + math.cos(k * 1.3), math.sin(k * 0.31)))
    }
    val df = data.toDF("id", "v")
    val full = SimOps.covarianceOf(df, "id", "v").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    val s1 = SimOps.covarianceOf(df, "id", "v", samplePermille = 500).collect()
    val s2 = SimOps.covarianceOf(df, "id", "v", samplePermille = 500).collect()
    // bit-identical across reruns: the sample is a pure function of ids
    assert(s1.map(_.toString).sorted.sameElements(s2.map(_.toString).sorted))
    val n = s1.head.getLong(2)
    assert(n > 1600 && n < 2400, s"~50% of 4000 expected, got $n")
    s1.foreach { r =>
      val ((i, j), c) = ((r.getInt(0), r.getInt(1)), r.getDouble(3))
      assert(math.abs(c - full((i, j))) < 0.15 * (1 + math.abs(full((i, j)))),
        s"sampled cov($i,$j)=$c vs full=${full((i, j))}")
    }
  }

  test("pcaFit samplePermille: components align with full fit; projection covers full input") {
    val data = (0 until 3000).map { k =>
      val t = k * 0.05
      (k.toLong, Seq(t, 2.0 * t + math.sin(k * 0.9), math.cos(k * 0.37)))
    }
    val df = data.toDF("id", "v")
    val (_, fullComps, _) = SimOps.pcaFitOf(df, "id", "v", dims = 3, nComp = 2)
    val (_, sampComps, sampMeans) = SimOps.pcaFitOf(df, "id", "v", dims = 3, nComp = 2,
      samplePermille = 300)
    for (k <- 0 until 2) {
      val cos = fullComps(k).zip(sampComps(k)).map { case (x, y) => x * y }.sum
      assert(math.abs(cos) > 0.95, s"component $k drifted: |cos|=$cos")
    }
    // fit is sampled but the map-only projection runs over the FULL input
    val proj = SimOps.pcaProjectOf(df, "v", sampComps, sampMeans)
    assert(proj.count() == 3000)
  }

  test("pcaFit: orthonormal components, descending eigenvalues, projection variance = eigenvalue") {
    // strongly correlated 2D cloud embedded in 3D, deterministic points
    val pts = (0 until 80).map { k =>
      val t = k * 0.1
      (k.toLong, Seq(t, 2.0 * t + math.sin(k), 0.3 * math.cos(3 * k)))
    }
    val df = pts.toDF("id", "v")
    val (evs, comps, means) = SimOps.pcaFitOf(df, "id", "v", dims = 3, nComp = 3)
    assert(evs.length == 3 && evs.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    assert(evs.forall(_ >= -1e-9)) // PSD
    for (a <- 0 until 3; b <- a until 3) {
      val d = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(d - (if (a == b) 1.0 else 0.0)) < 1e-7, s"ortho($a,$b)")
    }
    // sign pin: largest-|coordinate| entry of each component is positive
    comps.foreach(w => assert(w.maxBy(math.abs) > 0))
    val proj = SimOps.pcaProjectOf(df, "v", comps, means)
      .select("pc0", "pc1").as[(Double, Double)].collect()
    def popVar(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    assert(math.abs(popVar(proj.map(_._1).toSeq) - evs(0)) < 1e-6 * (1 + evs(0)))
    assert(math.abs(popVar(proj.map(_._2).toSeq) - evs(1)) < 1e-6 * (1 + evs(1)))
    assert(math.abs(proj.map(_._1).sum / proj.length) < 1e-9) // centered
  }

  test("pcaProject on a known axis-aligned cloud picks the max-variance axis") {
    // dim1 = k%2 correlates weakly with dim0 (cov = 0.25), so the top
    // component is rotated ~cov/(var0-var1) ≈ 0.0012 off axis 0
    val pts = (0 until 50).map(k => (k.toLong, Seq(k * 1.0, (k % 2).toDouble)))
    val df = pts.toDF("id", "v")
    val (evs, comps, _) = SimOps.pcaFitOf(df, "id", "v", dims = 2, nComp = 1)
    assert(math.abs(comps(0)(0)) > 0.999) // axis 0 dominates
    assert(math.abs(comps(0)(1)) < 0.01)
    assert(evs(0) > 100)
  }
}
