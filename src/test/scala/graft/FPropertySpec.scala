package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks of the shared column builders against plain-Scala
  * reference implementations (one Spark job per property, all samples
  * batched in a single DataFrame). */
class FPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vecGen = Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0))
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("hash60 is always in [0, 2^60) and deterministic") {
    val strs = samples(Gen.asciiPrintableStr, 200)
    val out = strs.toDF("s").select(F.hash60(col("s")).as("h")).as[Long].collect()
    assert(out.forall(h => h >= 0L && h < (1L << 60)))
    val out2 = strs.toDF("s").select(F.hash60(col("s")).as("h")).as[Long].collect()
    assert(out.toSeq == out2.toSeq)
  }

  test("text kernels equal their HOF twins on random token arrays") {
    val tokGen = Gen.listOfN(12, Gen.oneOf(
      "the", "a", "of", "und", "que", "spark", "row", "éé", "k", "zzzz", "123", "longerword"))
    val docs = samples(tokGen, 150)
    val df = docs.toDF("ws").selectExpr(
      "graft_stopcount(ws, array('the', 'a', 'of')) AS sc",
      "size(filter(ws, w -> w IN ('the', 'a', 'of'))) AS sc_hof",
      "graft_total_strlen(ws) AS tl",
      "aggregate(ws, 0L, (acc, w) -> acc + length(w)) AS tl_hof",
      "graft_subword_est(ws) AS se",
      "aggregate(ws, 0L, (acc, w) -> acc + CAST(ceil(length(w) / 4.0) AS BIGINT)) AS se_hof",
      "graft_top_ngram_count(ws, 2) AS tn")
    df.collect().foreach { r =>
      assert(r.getLong(0) == r.getInt(1).toLong)
      assert(r.getLong(2) == r.getLong(3))
      assert(r.getLong(4) == r.getLong(5))
    }
    // top-ngram mode vs a driver-side count
    docs.zip(df.select("tn").collect()).foreach { case (ws, r) =>
      val want = ws.sliding(2).map(_.mkString(" ")).toSeq
        .groupBy(identity).values.map(_.size).max.toLong
      assert(r.getLong(0) == want)
    }
  }

  test("graft_jaccard equals the array_intersect composition on distinct arrays") {
    val setGen = Gen.chooseNum(0, 10)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf((1 to 15).map("tok" + _))).map(_.distinct))
    val pairs = samples(Gen.zip(setGen, setGen), 150) :+ ((Nil, Nil))
    val df = pairs.toDF("a", "b").selectExpr(
      "graft_jaccard(a, b) AS j",
      // try_divide: under ANSI (the session default) a bare 0/0 throws;
      // the kernel's contract is NULL for the empty-empty case
      "try_divide(size(array_intersect(a, b)), CAST(size(a) + size(b) - size(array_intersect(a, b)) AS DOUBLE)) AS j_ref")
    df.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
  }

  test("dotN equals the balanced-tree reference sum, bit for bit") {
    def balRef(xs: Seq[Double]): Double =
      if (xs.size == 1) xs.head
      else balRef(xs.grouped(2).map(g => if (g.size == 2) g(0) + g(1) else g(0)).toSeq)
    val pairs = samples(Gen.zip(vecGen, vecGen), 100)
    val expected = pairs.map { case (a, b) => balRef(a.zip(b).map { case (x, y) => x * y }) }
    val got = pairs.toDF("a", "b")
      .select(F.dotN(col("a"), col("b"), 16).as("d")).as[Double].collect()
    assert(got.toSeq == expected)
  }

  test("wma rolling-sum reformulation equals direct weighted mean (q11 algebra)") {
    // wma_t over full window = Σ w_i x_i / Σ w_i with w_i = 1..n; the
    // query computes (sxw + (n - rn)·sx)/T. Check the algebra directly.
    val n = 5
    val series = samples(Gen.listOfN(20, Gen.chooseNum(-50.0, 50.0)), 30)
    series.foreach { xs =>
      xs.indices.drop(n - 1).foreach { t =>
        val win = xs.slice(t - n + 1, t + 1)
        val direct = win.zipWithIndex.map { case (x, j) => x * (j + 1) }.sum / (n * (n + 1) / 2.0)
        val rn = t + 1 // global row number (1-based)
        val sxw = win.zipWithIndex.map { case (x, j) => x * (rn - (n - 1) + j) }.sum
        val sx = win.sum
        val reformulated = (sxw + (n - rn) * sx) / (n * (n + 1) / 2.0)
        assert(math.abs(direct - reformulated) < 1e-9, s"t=$t: $direct vs $reformulated")
      }
    }
  }
}
