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
