package graft

import org.apache.spark.sql.functions._

/** End-to-end gate queries added late in round 6: the funding/margin
  * rate ingest surfaces (o02/o03, rows-only in the driver gate) and
  * the ANN recall eval (s05, oracle-checked) — each spec pins the
  * invariant the rows-only/aggregate gate can't see directly. */
class IngestGateSpec extends SparkSpec {

  test("o02: funding ingest lands reference columns, keyed unique, coerced non-null") {
    val out = ops.IngestOps.queries("o02_funding_rates")(spark, sfDir)
    assert(out.columns.toSeq == sources.RatesJson.fundingColumns)
    val n = out.count()
    assert(n > 0)
    assert(out.select("symbol", "fundingTime").distinct().count() == n,
      "dedup keep-last leaves (symbol, fundingTime) unique")
    assert(out.filter(col("fundingRate").isNull || col("markPrice").isNull).count() == 0,
      "to_numeric(errors='coerce').fillna(0): rate numerics are never null")
    assert(out.select("exchange", "type").distinct().collect().toSeq.map(r =>
      (r.getString(0), r.getString(1))) == Seq(("binance", "PERPETUAL")))
  }

  test("o02: the in-plan garbage numerics really exercise the coerce-to-0 rule") {
    // event_ids divisible by 203 carry fundingRate "n/a"; unless healed
    // away by a colliding key, they must land as 0.0 — prove at least
    // one garbage record flowed through the cast (sf0.001 has
    // event_id 0, which always survives keep-last ties deterministically)
    val out = ops.IngestOps.queries("o02_funding_rates")(spark, sfDir)
    assert(out.filter(col("fundingRate") === 0.0).count() > 0,
      "no coerced 0.0 row — the garbage branch never ran")
  }

  test("o03: margin ingest lands reference columns; vip levels stay in 0-8") {
    val out = ops.IngestOps.queries("o03_margin_rates")(spark, sfDir)
    assert(out.columns.toSeq == sources.RatesJson.marginColumns)
    val n = out.count()
    assert(n > 0)
    assert(out.select("asset", "timestamp").distinct().count() == n)
    val vips = out.select("vipLevel").distinct().collect().map(_.getLong(0))
    assert(vips.forall(v => v >= 0 && v <= 8))
    assert(out.select("type").distinct().collect().map(_.getString(0)).toSeq == Seq("Margin"))
  }

  test("o04: option-kline ingest is keyed unique with page-2 (newest) winning collisions") {
    val out = ops.IngestOps.queries("o04_option_klines")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val cols = ops.IngestOps.queries("o04_option_klines")(spark, sfDir).columns
    assert(cols.take(6).toSeq ==
      Seq("symbol", "exchange", "type", "interval", "timestamp", "close_time"))
    // PK unique on (symbol, interval, timestamp) — epoch-ms in the gate
    val keys = out.map(r => (r.getString(0), r.getString(3), r.getLong(4)))
    assert(keys.distinct.length == keys.length)
    assert(out.forall(_.getString(2) == "OPTION"))
    // page 2 re-fetches event_ids ≡ 0 mod 62 with opens bumped ×1.1;
    // the keep-LAST heal must surface page 2's value on every collided
    // PK: open ≈ 1.1 × (high / 1.02) ⇒ open/high ≈ 1.0784 (vs 0.9804)
    val bumped = out.count(r => r.getDouble(6) / r.getDouble(7) > 1.0)
    assert(bumped > 0, "collisions must exist and take page 2's revision")
    assert(out.forall(r => Set("1m", "1h").contains(r.getString(3))))
  }

  test("p02: the daily market loop composes heal → as-of → WMA → extreme report") {
    val out = ops.IngestOps.queries("p02_market_pipeline")(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 20)
    val cols = ops.IngestOps.queries("p02_market_pipeline")(spark, sfDir).columns.toSeq
    assert(cols == Seq("symbol", "ts_ms", "ts_cn_ms", "fundingRate", "markPrice",
      "spot", "premium", "wma12", "value_change", "gap_ms"))
    // newest-first report, Asia/Shanghai wall clock is UTC+8 exactly
    assert(out.map(_.getLong(1)).toSeq == out.map(_.getLong(1)).sortBy(-_).toSeq)
    out.foreach { r =>
      assert(r.getLong(2) - r.getLong(1) == 28800000L)
      // every reported row cleared the |Δ₅ premium| > 2 threshold…
      assert(math.abs(r.getDouble(8)) > 2.0)
      // …and the 1h debounce (gap null on the series head only)
      assert(r.isNullAt(9) || r.getLong(9) > 3600000L)
      // premium recomputes from the aligned columns (round-half-up @6)
      val prem = r.getDouble(4) / r.getDouble(5) - 1.0
      assert(math.abs(math.floor(prem * 1e6 + 0.5) / 1e6 - r.getDouble(6)) < 1e-12)
      // the healed markPrice is page-1 raw or page-2's ×1.001 revision,
      // never a mix: markPrice/(fundingRate·10⁶) ∈ {1.0, 1.001} — proves
      // the upsert heal fed the as-of stage with whole-record wins
      val ratio = r.getDouble(4) / (r.getDouble(3) * 1e6)
      assert(math.abs(ratio - 1.0) < 1e-9 || math.abs(ratio - 1.001) < 1e-9,
        s"markPrice/fundingRate ratio $ratio is neither page-1 nor page-2")
    }
  }

  test("a03: sampled estimates are ×10 sample counts and recompute from raw text") {
    val out = ops.CoreOps.queries("a03_sampled_terms")(spark, sfDir).collect()
    assert(out.length == 20)
    assert(out.map(_.getLong(1)).toSeq == out.map(_.getLong(1)).sortBy(-_).toSeq, "exact-count order")
    out.foreach { r =>
      assert(r.getLong(2) % 10 == 0, "estimate is 10x a sample count")
      assert(r.getDouble(3) >= 0.0)
    }
    // the top term's exact count recomputed from first principles
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val counts = docs.flatMap(_._2.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out(0).getLong(1) == counts(out(0).getString(0)))
    assert(out.map(_.getLong(1)).max == counts.values.max)
  }

  test("termProfile: custom schema, deterministic sample estimate, exact top-k") {
    import spark.implicits._
    val docs = (1L to 200L).map(i =>
      (i, if (i % 3 == 0) "alpha beta alpha" else "alpha gamma")).toDF("pid", "body")
    val out = Graft.termProfile(docs, "pid", "body", k = 3, permille = 250, salt = "s")
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("alpha", "gamma", "beta"))
    // exact counts from first principles: 66 docs x2 alpha + 134 x1
    assert(out(0).getLong(1) == 66L * 2 + 134L)
    assert(out(1).getLong(1) == 134L && out(2).getLong(1) == 66L)
    // estimate = 4x the sampled count, identical across partitionings
    val again = Graft.termProfile(docs.repartition(13), "pid", "body",
      k = 3, permille = 250, salt = "s").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      again.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
    out.foreach { r =>
      assert(r.getDouble(2) % 4.0 == 0.0, "estimate is 1000/250 = 4x a sample count")
    }
    intercept[IllegalArgumentException] {
      Graft.termProfile(docs, "pid", "body", k = 3, permille = 0)
    }
  }

  test("histogram: custom schema bins, counts and shares from first principles") {
    import spark.implicits._
    val df = Seq(0.5, 1.5, 1.6, 2.1, 9.9, -0.3).toDF("v")
    val out = Graft.histogram(df, "v", binWidth = 1.0).orderBy("bin").collect()
    val bins = out.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(bins.keySet == Set(-1L, 0L, 1L, 2L, 9L))
    assert(bins(1L)._1 == 2 && bins(-1L)._1 == 1, "floor binning incl. negatives")
    // shares are r6 presentation-rounded: the sum drifts by ≤ nBins·1e-6
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-5, "shares sum to 1")
    intercept[IllegalArgumentException] { Graft.histogram(df, "v", binWidth = 0.0) }
  }

  test("q41: beta/alpha recompute from first-principles covariance on a tiny grid") {
    import spark.implicits._
    // two series + benchmark on 5 shared buckets; closes chosen so
    // returns are exact decimals
    val rows =
      Seq(100.0, 110.0, 121.0, 108.9, 119.79).zipWithIndex.map { case (v, i) => ("bench", i.toLong, v) } ++
      Seq(50.0, 60.0, 72.0, 61.2, 73.44).zipWithIndex.map { case (v, i) => ("s1", i.toLong, v) } ++
      Seq(10.0, 10.0, 10.0, 10.0, 10.0).zipWithIndex.map { case (v, i) => ("flat", i.toLong, v) }
    val grid = rows.toDF("k", "b", "v")
    val out = Graft.betaVs(grid, "k", "b", "v", benchmark = "bench")
      .orderBy("series").collect()
    def rets(px: Seq[Double]) = px.sliding(2).map { case Seq(a, c) => c / a - 1 }.toSeq
    def beta(rs: Seq[Double], rb: Seq[Double]): Double = {
      val n = rs.length
      val (ss, sb) = (rs.sum, rb.sum)
      val ssb = rs.zip(rb).map { case (a, c) => a * c }.sum
      val sb2 = rb.map(x => x * x).sum
      (n * ssb - ss * sb) / (n * sb2 - sb * sb)
    }
    val rb = rets(Seq(100.0, 110.0, 121.0, 108.9, 119.79))
    val r1 = rets(Seq(50.0, 60.0, 72.0, 61.2, 73.44))
    assert(out.map(_.getString(0)).toSeq == Seq("flat", "s1"))
    val s1 = out(1)
    assert(s1.getLong(1) == 4)
    assert(math.abs(s1.getDouble(2) - beta(r1, rb)) < 1e-9)
    val alphaWant = r1.sum / 4 - beta(r1, rb) * (rb.sum / 4)
    assert(math.abs(s1.getDouble(3) - alphaWant) < 1e-9)
    // the flat series has zero returns: beta 0 (cov 0), alpha 0
    assert(math.abs(out(0).getDouble(2)) < 1e-12 && math.abs(out(0).getDouble(3)) < 1e-12)
  }

  test("s05: recall@10 recomputes from the s01/s02 results it claims to compare") {
    val rec = ops.SimOps.queries("s05_ann_recall")(spark, sfDir).collect()
    val bruteSet = ops.SimOps.queries("s01_knn_bruteforce")(spark, sfDir)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfSet = ops.SimOps.queries("s02_ann_ivf")(spark, sfDir)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rec.map(_.getLong(0)).toSeq == (0L to 4L), "one row per query vector, ordered")
    rec.foreach { r =>
      val (q, hits, recall) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val want = bruteSet.filter(_._1 == q).count(ivfSet.contains)
      assert(hits == want, s"n_hits for q=$q")
      assert(math.abs(recall - math.floor(hits / 10.0 * 1e4 + 0.5) / 1e4) < 1e-12)
      assert(hits >= 0 && hits <= 10)
    }
  }
}
