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
