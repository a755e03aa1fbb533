package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{ParScanOps, ScanOps}

/** Parallel-prefix scan path (ops.ParScanOps) vs the bit-exact
  * sequential segmented scan (ops.ScanOps): per-wrapper max-|Δ|
  * tolerance bounds, slice-count invariance, the split-init-window
  * edge (1-row runs), and the bit-exact single-slice anchor for the
  * scalar EWMA case. The sequential path stays the default and the
  * oracle-checked form; these tests pin how far the opt-in parallel
  * composition is allowed to drift (a few ulps — every family matrix
  * is contractive, so composition error cannot amplify). */
class ParScanSpec extends SparkSpec {
  import spark.implicits._

  /** ~60-100-scale values, multiple keys of uneven length. */
  private def frame(rows: Int, keys: Int): DataFrame =
    (0L until rows.toLong).map { i =>
      (s"k${i % keys}", new java.sql.Timestamp(1700000000000L + (i / keys) * 1000L),
        i, math.sin(i.toDouble * 0.7) * 40 + 60)
    }.toDF("sym", "t", "seq", "px")

  /** Max absolute per-cell |par − seq| over all shared value columns,
    * requiring identical row sets and identical null patterns. */
  private def maxDelta(seq: DataFrame, par: DataFrame, valueCols: Seq[String]): Double = {
    val keyCols = Seq("sym", "ts_ms", "seq")
    val s = seq.select((keyCols ++ valueCols).map(col): _*)
    val p = par.select((keyCols ++ valueCols).map(col): _*)
    assert(s.count() == p.count(), "row counts must match")
    val joined = s.as("s").join(p.as("p"), keyCols, "full_outer")
    assert(joined.count() == s.count(), "key sets must match")
    valueCols.foreach { c =>
      val nullMismatch = joined.filter(col(s"s.$c").isNull =!= col(s"p.$c").isNull).count()
      assert(nullMismatch == 0L, s"null pattern must match for $c")
    }
    val deltas = valueCols.map(c => coalesce(abs(col(s"s.$c") - col(s"p.$c")), lit(0.0)))
    val worst = deltas.reduce((a, b) => greatest(a, b))
    joined.agg(max(worst)).as[Option[Double]].collect().head.getOrElse(0.0)
  }

  // renames so par output joins on the same key names as seq output
  private def norm(df: DataFrame): DataFrame =
    df.withColumnRenamed("sym", "sym").withColumnRenamed("seq", "seq")

  test("ewmaExactPar: slices=1 is BIT-exact vs the sequential scan") {
    val df = frame(500, 3)
    val d = maxDelta(
      ScanOps.ewmaExactOf(df, "sym", "t", "seq", "px", 0.25),
      ParScanOps.ewmaExactParOf(df, "sym", "t", "seq", "px", 0.25, slices = 1),
      Seq("ewma"))
    assert(d == 0.0, s"single-slice replay must be the identical fold, got max delta $d")
  }

  test("ewmaExactPar: multi-slice within 1e-9 of sequential, all slice counts agree") {
    val df = frame(3000, 4)
    val seq = ScanOps.ewmaExactOf(df, "sym", "t", "seq", "px", 0.25)
    Seq(2, 8, 64).foreach { sl =>
      val d = maxDelta(seq,
        ParScanOps.ewmaExactParOf(df, "sym", "t", "seq", "px", 0.25, slices = sl),
        Seq("ewma"))
      assert(d <= 1e-9, s"slices=$sl max delta $d exceeds 1e-9")
    }
  }

  test("macdPar: three-recurrence composition within 1e-9 of sequential") {
    val df = frame(2500, 3)
    val d = maxDelta(
      ScanOps.macdOf(df, "sym", "t", "seq", "px"),
      ParScanOps.macdParOf(df, "sym", "t", "seq", "px", slices = 16),
      Seq("macd", "signal", "hist"))
    assert(d <= 1e-9, s"max delta $d exceeds 1e-9")
  }

  test("garchPar: state-augmented affine form within 1e-9 of sequential") {
    val base = frame(2500, 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sym")).orderBy(col("t"), col("seq"))
    val innov = base.withColumn("r", col("px") - lag(col("px"), 1).over(w))
      .filter(col("r").isNotNull)
    val d = maxDelta(
      ScanOps.garchOf(innov, "sym", "t", "seq", "r", 0.1, 0.1, 0.8),
      ParScanOps.garchParOf(innov, "sym", "t", "seq", "r", 0.1, 0.1, 0.8, slices = 16),
      Seq("sigma2", "sigma"))
    assert(d <= 1e-9, s"max delta $d exceeds 1e-9")
  }

  test("trixPar: triple-EWMA chain within 1e-9, null pattern preserved") {
    val df = frame(2000, 3)
    val d = maxDelta(
      ScanOps.trixOf(df, "sym", "t", "seq", "px", n = 15),
      ParScanOps.trixParOf(df, "sym", "t", "seq", "px", n = 15, slices = 16),
      Seq("e3", "trix"))
    assert(d <= 1e-9, s"max delta $d exceeds 1e-9")
  }

  test("holtPar: two-row init window within 1e-9, seed/forecast nulls preserved") {
    val df = frame(2000, 3)
    val d = maxDelta(
      ScanOps.holtOf(df, "sym", "t", "seq", "px"),
      ParScanOps.holtParOf(df, "sym", "t", "seq", "px", slices = 16),
      Seq("level", "trend", "forecast", "err"))
    assert(d <= 1e-9, s"max delta $d exceeds 1e-9")
  }

  test("holtPar: split init window — 1-row runs (slices >> rows) still seed correctly") {
    // 5-row single series forced into ~5 single-row range splits: the
    // two-row seed window spans TWO runs and the driver must stitch it
    val vals = Seq(10.0, 14.0, 12.0, 18.0, 16.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("k", new java.sql.Timestamp(1700000000000L + i * 60000L), i.toLong, v)
    }.toDF("sym", "t", "seq", "px")
    val d = maxDelta(
      ScanOps.holtOf(df, "sym", "t", "seq", "px"),
      ParScanOps.holtParOf(df, "sym", "t", "seq", "px", slices = 5),
      Seq("level", "trend", "forecast", "err"))
    assert(d <= 1e-9, s"max delta $d exceeds 1e-9")
    // null shape: bar1 trend/forecast/err null, bar2 forecast/err null
    val rows = ParScanOps.holtParOf(df, "sym", "t", "seq", "px", slices = 5)
      .orderBy("ts_ms").collect()
    assert(rows(0).isNullAt(4) && rows(0).isNullAt(5) && rows(0).isNullAt(6))
    assert(!rows(1).isNullAt(4) && rows(1).isNullAt(5) && rows(1).isNullAt(6))
    assert(!rows(2).isNullAt(5) && !rows(2).isNullAt(6))
  }

  test("parallel path: single-row and two-row series, every wrapper") {
    val one = Seq(("k", new java.sql.Timestamp(1700000000000L), 0L, 42.0))
      .toDF("sym", "t", "seq", "px")
    assert(ParScanOps.ewmaExactParOf(one, "sym", "t", "seq", "px", 0.25, 4)
      .collect().map(_.getDouble(3)).toSeq == Seq(42.0))
    assert(ParScanOps.macdParOf(one, "sym", "t", "seq", "px", slices = 4)
      .collect().map(_.getDouble(3)).toSeq == Seq(0.0))
    val h1 = ParScanOps.holtParOf(one, "sym", "t", "seq", "px", slices = 4).collect()
    assert(h1.length == 1 && h1(0).getDouble(3) == 42.0 && h1(0).isNullAt(4))
    val two = Seq(
      ("k", new java.sql.Timestamp(1700000000000L), 0L, 10.0),
      ("k", new java.sql.Timestamp(1700000060000L), 1L, 13.0))
      .toDF("sym", "t", "seq", "px")
    val h2 = ParScanOps.holtParOf(two, "sym", "t", "seq", "px", slices = 4)
      .orderBy("ts_ms").collect()
    assert(h2(1).getDouble(3) == 13.0 && h2(1).getDouble(4) == 3.0)
  }

  test("kalmanPar: variance BIT-exact, level within 1e-9, slices=1 fully bit-exact") {
    val df = frame(2500, 3)
    val seq = ScanOps.kalmanOf(df, "sym", "t", "seq", "px", procVar = 0.1, obsVar = 1.0)
    // multi-slice: variance is data-independent and must be bit-exact;
    // the level carries composition ulps
    val par = ParScanOps.kalmanParOf(df, "sym", "t", "seq", "px",
      procVar = 0.1, obsVar = 1.0, slices = 16)
    assert(maxDelta(seq, par, Seq("variance")) == 0.0,
      "the Riccati sequence must be the identical IEEE recursion")
    assert(maxDelta(seq, par, Seq("level")) <= 1e-9)
    // single slice: one run, replayed from scratch — fully bit-exact
    val par1 = ParScanOps.kalmanParOf(df, "sym", "t", "seq", "px",
      procVar = 0.1, obsVar = 1.0, slices = 1)
    assert(maxDelta(seq, par1, Seq("level", "variance")) == 0.0)
    // single-row series
    val one = Seq(("k", new java.sql.Timestamp(1700000000000L), 0L, 42.0))
      .toDF("sym", "t", "seq", "px")
    val o = ParScanOps.kalmanParOf(one, "sym", "t", "seq", "px", 0.1, 1.0, 4).collect()
    assert(o.length == 1 && o(0).getDouble(3) == 42.0 && o(0).getDouble(4) == 1.0)
  }

  test("property sweep: every wrapper tracks its sequential twin on hash-random series") {
    // hash-seeded pseudo-random data (deterministic — no Math.random),
    // uneven key lengths, three slice counts, all six wrappers
    def h(s: String): Double =
      (scala.util.hashing.MurmurHash3.stringHash(s) % 10000) / 100.0
    val df = (0L until 1500L).map { i =>
      (s"k${i % 7}", new java.sql.Timestamp(1700000000000L + (i / 7) * 1000L),
        i, 60.0 + h(s"v:$i"))
    }.toDF("sym", "t", "seq", "px")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sym")).orderBy(col("t"), col("seq"))
    val innov = df.withColumn("r", col("px") - lag(col("px"), 1).over(w))
      .filter(col("r").isNotNull)
    Seq(3, 17, 64).foreach { sl =>
      assert(maxDelta(ScanOps.ewmaExactOf(df, "sym", "t", "seq", "px", 0.3),
        ParScanOps.ewmaExactParOf(df, "sym", "t", "seq", "px", 0.3, sl), Seq("ewma")) <= 1e-9)
      assert(maxDelta(ScanOps.macdOf(df, "sym", "t", "seq", "px"),
        ParScanOps.macdParOf(df, "sym", "t", "seq", "px", slices = sl),
        Seq("macd", "signal", "hist")) <= 1e-9)
      assert(maxDelta(ScanOps.garchOf(innov, "sym", "t", "seq", "r", 0.05, 0.1, 0.85),
        ParScanOps.garchParOf(innov, "sym", "t", "seq", "r", 0.05, 0.1, 0.85, sl),
        Seq("sigma2", "sigma")) <= 1e-9)
      assert(maxDelta(ScanOps.trixOf(df, "sym", "t", "seq", "px", 9),
        ParScanOps.trixParOf(df, "sym", "t", "seq", "px", 9, sl), Seq("e3", "trix")) <= 1e-9)
      assert(maxDelta(ScanOps.holtOf(df, "sym", "t", "seq", "px", 0.4, 0.2),
        ParScanOps.holtParOf(df, "sym", "t", "seq", "px", 0.4, 0.2, sl),
        Seq("level", "trend", "forecast", "err")) <= 1e-9)
      assert(maxDelta(ScanOps.kalmanOf(df, "sym", "t", "seq", "px", 0.2, 2.0),
        ParScanOps.kalmanParOf(df, "sym", "t", "seq", "px", 0.2, 2.0, sl),
        Seq("level", "variance")) <= 1e-9)
    }
  }

  test("kalmanPar: a NaN in the data propagates like the sequential scan (no re-seed)") {
    // regression: the level carry once used NaN as its own "not
    // started" sentinel, so a NaN INPUT made later runs silently
    // restart the filter with finite levels
    val vals = (0 until 40).map(i => if (i == 5) Double.NaN else 50.0 + i)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("k", new java.sql.Timestamp(1700000000000L + i * 60000L), i.toLong, v)
    }.toDF("sym", "t", "seq", "px")
    def levels(d: org.apache.spark.sql.DataFrame): Seq[Double] =
      d.orderBy("ts_ms").select("level").as[Double].collect().toSeq
    val seq = levels(ScanOps.kalmanOf(df, "sym", "t", "seq", "px", 0.1, 1.0))
    val par = levels(ParScanOps.kalmanParOf(df, "sym", "t", "seq", "px", 0.1, 1.0, slices = 8))
    assert(seq.drop(5).forall(_.isNaN), "sequential: NaN poisons the level from row 5 on")
    seq.zip(par).zipWithIndex.foreach { case ((s, p), i) =>
      if (s.isNaN) assert(p.isNaN, s"row $i: parallel must propagate the NaN too")
      else assert(math.abs(s - p) <= 1e-9, s"row $i: $s vs $p")
    }
  }

  test("parallel path is tolerance-invariant under input partitioning") {
    // repartitionByRange samples boundaries per run, so the SPLIT can
    // move — values may shift by composition ulps but never more
    val df = frame(2000, 3)
    def run(d: DataFrame): DataFrame =
      ParScanOps.ewmaExactParOf(d, "sym", "t", "seq", "px", 0.125, slices = 8)
    val d1 = maxDelta(run(df), run(df.repartition(13)), Seq("ewma"))
    val d2 = maxDelta(run(df), run(df.orderBy(rand(42))), Seq("ewma"))
    assert(d1 <= 1e-9 && d2 <= 1e-9, s"partitioning drift $d1 / $d2 exceeds 1e-9")
  }
}
