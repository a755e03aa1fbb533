package graft

import org.apache.spark.sql.functions._

/** Round-4 facade operators on custom (non-testdata) schemas:
  * finance analytics (bollinger/drawdown/pairCorr/scd2/ewma) and the
  * LLM-pipeline block (pii/bigramScore/mixtureSample/decontaminate/
  * kmeans). */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)

  test("bollinger: null till full, exact mean/sd after, breakout flags fire") {
    val px = Seq(10.0, 12.0, 11.0, 13.0, 50.0) // last value explodes upward
    val df = px.zipWithIndex.map { case (v, i) => ("S", i.toLong, ts(i), v) }
      .toDF("sym", "id", "t", "px")
    val out = Graft.bollinger(df, "sym", "t", "id", "px", n = 4, width = 2.0)
      .orderBy("id").collect()
    // band = the 4 rows BEFORE each row: rows 0-3 lack 4 predecessors
    assert(out.take(4).forall(_.isNullAt(out(0).fieldIndex("mid"))))
    val r4 = out(4) // band from 10,12,11,13; the spike is NOT in its own band
    val mean = (10.0 + 12 + 11 + 13) / 4
    val sd = math.sqrt((10.0 * 10 + 12 * 12 + 11 * 11 + 13 * 13) / 4 - mean * mean)
    assert(math.abs(r4.getDouble(r4.fieldIndex("mid")) - mean) < 1e-9)
    assert(math.abs(r4.getDouble(r4.fieldIndex("upper")) - (mean + 2 * sd)) < 1e-9)
    assert(r4.getInt(r4.fieldIndex("breakout")) == 1) // 50 breaks the band
  }

  test("maxDrawdown finds the deepest trough against the running peak") {
    val px = Seq(10.0, 20.0, 15.0, 5.0, 8.0, 25.0, 24.0)
    val df = px.zipWithIndex.map { case (v, i) => ("S", i.toLong, ts(i), v) }
      .toDF("sym", "id", "t", "px")
    val r = Graft.maxDrawdown(df, "sym", "t", "id", "px").head()
    assert(math.abs(r.getDouble(r.fieldIndex("max_dd")) - (5.0 - 20.0) / 20.0) < 1e-12)
    assert(r.getLong(r.fieldIndex("trough_id")) == 3L)
    assert(r.getDouble(r.fieldIndex("peak")) == 20.0)
    assert(r.getLong(r.fieldIndex("n_rows")) == 7L)
  }

  test("pairCorr: perfectly correlated and anti-correlated series") {
    val rows = (0 until 10).flatMap { i =>
      Seq(("A", ts(i), i.toDouble), ("B", ts(i), 2.0 * i + 5), ("C", ts(i), -i.toDouble))
    }.toDF("sym", "bucket", "close")
    val out = Graft.pairCorr(rows, "sym", "bucket", "close").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(math.abs(out(("A", "B")) - 1.0) < 1e-12)
    assert(math.abs(out(("A", "C")) + 1.0) < 1e-12)
    assert(math.abs(out(("B", "C")) + 1.0) < 1e-12)
  }

  test("scd2 compresses repeats and chains effective intervals") {
    val df = Seq(
      (1L, ts(0), 1L, "bronze"), (1L, ts(1), 2L, "bronze"),
      (1L, ts(2), 3L, "gold"), (1L, ts(5), 4L, "bronze"),
      (2L, ts(0), 5L, "gold"))
      .toDF("uid", "t", "eid", "tier")
    val out = Graft.scd2(df, "uid", "t", "eid", "tier")
      .orderBy("uid", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, "bronze", ts(0), Some(ts(2)), false),
      (1L, 2L, "gold", ts(2), Some(ts(5)), false),
      (1L, 3L, "bronze", ts(5), None, true),
      (2L, 1L, "gold", ts(0), None, true)))
  }

  test("ewma: adjust=True weights over available history") {
    val df = Seq(("S", 0L, ts(0), 10.0), ("S", 1L, ts(1), 20.0), ("S", 2L, ts(2), 14.0))
      .toDF("sym", "id", "t", "px")
    val out = Graft.ewma(df, "sym", "t", "id", "px", alpha = 0.25, w = 8)
      .orderBy("id").select("ewma").as[Double].collect()
    val b = 0.75
    assert(math.abs(out(0) - 10.0) < 1e-12)
    assert(math.abs(out(1) - (20.0 + b * 10.0) / (1 + b)) < 1e-12)
    assert(math.abs(out(2) - (14.0 + b * 20.0 + b * b * 10.0) / (1 + b + b * b)) < 1e-12)
  }

  test("piiRedact counts and masks emails, phones, IPv4s") {
    val df = Seq(
      (1L, "mail me at jo.doe+x@corp.example.org or +1-555-0199, host 192.168.1.23 ok"),
      (2L, "nothing sensitive here 42"))
      .toDF("id", "body")
    val out = Graft.piiRedact(df, "id", "body").orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getLong(r1.fieldIndex("n_emails")) == 1L)
    assert(r1.getLong(r1.fieldIndex("n_phones")) == 1L)
    assert(r1.getLong(r1.fieldIndex("n_ips")) == 1L)
    assert(r1.getString(r1.fieldIndex("redacted")) ==
      "mail me at [EMAIL] or [PHONE], host [IP] ok")
    val r2 = out(1)
    assert(r2.getLong(r2.fieldIndex("n_emails")) == 0L &&
      r2.getString(r2.fieldIndex("redacted")).endsWith("42"))
  }

  test("bigramScore matches a hand-computed smoothed bigram model") {
    val df = Seq((7L, "a b a b")).toDF("id", "body")
    val r = Graft.bigramScore(df, "id", "body", addK = 0.5).head()
    // bigrams: (a,b) ×2, (b,a) ×1; c1(a)=2, c1(b)=1; V = |{a,b}| = 2
    val pAB = (2 + 0.5) / (2 + 0.5 * 2)
    val pBA = (1 + 0.5) / (1 + 0.5 * 2)
    val expected = (math.log(pAB) + math.log(pBA) + math.log(pAB)) / 3
    assert(r.getLong(r.fieldIndex("n_bigrams")) == 3L)
    assert(math.abs(r.getDouble(r.fieldIndex("avg_logp")) - expected) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("ppl")) - math.exp(-expected)) < 1e-12)
  }

  test("mixtureSample respects per-domain budgets and is deterministic") {
    val docs = (0 until 50).map(i => (i.toLong, s"d${i % 2}", 10L))
      .toDF("id", "dom", "toks")
    val budgets = Map("d0" -> 45L, "d1" -> 100L)
    def run() = Graft.mixtureSample(docs, "dom", "id", "toks", budgets)
      .select("id", "dom", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val out = run()
    // budget 45 over 10-token docs: 5 picked (the 5th crosses: 40 < 45)
    assert(out.count(_._2 == "d0") == 5)
    assert(out.count(_._2 == "d1") == 10)
    // exclusive prefix strictly under budget for every kept row
    assert(out.forall { case (_, d, cum) => cum - 10 < budgets(d) })
    assert(out == run()) // bit-for-bit reproducible
    // unbudgeted domains contribute nothing
    val none = Graft.mixtureSample(docs, "dom", "id", "toks", Map("other" -> 1000L))
    assert(none.count() == 0)
  }

  test("decontaminate flags only training docs sharing an n-gram") {
    val shared = "one two three four five six seven eight"
    val train = Seq(
      (1L, s"prefix words here $shared suffix tail"),
      (2L, "totally different content with no overlap at all whatsoever now"))
      .toDF("id", "body")
    val bench = Seq((100L, s"benchmark intro $shared closing words"))
      .toDF("id", "body")
    val out = Graft.decontaminate(train, bench, "id", "body", n = 8).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L)
    assert(out(0).getLong(out(0).fieldIndex("n_bench_docs")) == 1L)
    assert(out(0).getLong(out(0).fieldIndex("n_shared_grams")) >= 1L)
  }

  test("kmeans separates two blobs and assigns every point") {
    val pts = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0 else 100.0
      (i.toLong, Array(base + i * 0.01, base - i * 0.01))
    }.toDF("id", "v")
    val out = Graft.kmeans(pts, "id", "v", dims = 2, k = 2, iters = 3).collect()
    assert(out.length == 20)
    val byCluster = out.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(byCluster.size == 2)
    // each blob lands wholly in one cluster
    val evens = (0 until 20 by 2).map(_.toLong).toSet
    assert(byCluster.values.toSet == Set(evens, (0 until 20).map(_.toLong).toSet -- evens))
    // trained centroids sit at blob centers: dist2 far below the blob gap
    assert(out.forall(_.getDouble(2) < 1.0))
  }
}
