package graft

import org.apache.spark.sql.DataFrame

/** Hand-computed pins for the window-form indicator family
  * (ops.IndicatorOps, q70–q76). Each test builds a series whose
  * indicator value is derivable on paper and asserts exact doubles —
  * the operators use only exact picks and defined-order folds, so no
  * tolerance is needed. */
class IndicatorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = new java.sql.Timestamp(h * 3600000L)

  /** h=i+1, l=i−1, c=i → tp=i, range=2 — the workhorse ramp. */
  private def ramp(n: Int): DataFrame =
    (1 to n).map(i => ("A", ts(i), i + 1.0, i - 1.0, i.toDouble, 2L))
      .toDF("event_type", "ts", "high", "low", "close", "vol")

  private def flat(n: Int): DataFrame =
    (1 to n).map(i => ("A", ts(i), 105.0, 95.0, 100.0, 3L))
      .toDF("event_type", "ts", "high", "low", "close", "vol")

  test("cci: warmup nulls, ramp pins, flat window -> 0") {
    val out = Graft.cci(ramp(25), "event_type", "ts", "high", "low", "close", n = 20)
      .orderBy("ts").collect()
    (0 until 19).foreach(i => assert(out(i).isNullAt(6), s"warmup at ${i + 1}"))
    // rn=20: tp=20, sma=10.5, md = mean(|i-10.5|, i=1..20) = 5.0
    val r20 = out(19)
    assert(r20.getDouble(4) == 10.5 && r20.getDouble(5) == 5.0)
    assert(math.abs(r20.getDouble(6) - 9.5 / 0.075) < 1e-12)
    // every full ramp window has the same shape -> same cci
    assert(math.abs(out(24).getDouble(6) - 9.5 / 0.075) < 1e-12)
    val flatOut = Graft.cci(flat(22), "event_type", "ts", "high", "low", "close", n = 20)
      .orderBy("ts").collect()
    assert(flatOut(21).getDouble(6) == 0.0, "flat window: md=0 -> cci=0")
  }

  test("williamsR: ramp pins -100/15, flat -> -50") {
    val out = Graft.williamsR(ramp(20), "event_type", "ts", "high", "low", "close", n = 14)
      .orderBy("ts").collect()
    (0 until 13).foreach(i => assert(out(i).isNullAt(5)))
    // rn>=14: hh=i+1, ll=i-14 -> -100*(1)/(15)
    (13 until 20).foreach { i =>
      assert(math.abs(out(i).getDouble(5) - (-100.0 / 15.0)) < 1e-12, s"at ${i + 1}")
    }
    val f = Graft.williamsR(flat(15), "event_type", "ts", "high", "low", "close", n = 14)
      .orderBy("ts").collect()
    assert(f(14).getDouble(5) == -100.0 * (105.0 - 100.0) / 10.0, "flat bars still have range")
  }

  test("keltner: ramp center/band exact") {
    val out = Graft.keltner(ramp(15), "event_type", "ts", "high", "low", "close", n = 10)
      .orderBy("ts").collect()
    (0 until 9).foreach(i => assert(out(i).isNullAt(3)))
    // rn=i>=10: center = mean(i-9..i) = i-4.5, band = 2
    (9 until 15).foreach { j =>
      val i = j + 1
      assert(out(j).getDouble(3) == i - 4.5, s"center at $i")
      assert(out(j).getDouble(4) == i - 2.5, s"upper at $i")
      assert(out(j).getDouble(5) == i - 6.5, s"lower at $i")
    }
  }

  test("mfi: monotone rise -> 100, fall -> 0, flat -> 50") {
    val up = Graft.mfi(ramp(20), "event_type", "ts", "high", "low", "close", "vol", n = 14)
      .orderBy("ts").collect()
    (0 until 14).foreach(i => assert(up(i).isNullAt(4), s"warmup at ${i + 1}"))
    (14 until 20).foreach(i => assert(up(i).getDouble(4) == 100.0))
    val downBars = (1 to 20).map(i => ("A", ts(i), 101.0 - i, 99.0 - i, 100.0 - i, 2L))
      .toDF("event_type", "ts", "high", "low", "close", "vol")
    val dn = Graft.mfi(downBars, "event_type", "ts", "high", "low", "close", "vol", n = 14)
      .orderBy("ts").collect()
    (14 until 20).foreach(i => assert(dn(i).getDouble(4) == 0.0))
    val fl = Graft.mfi(flat(16), "event_type", "ts", "high", "low", "close", "vol", n = 14)
      .orderBy("ts").collect()
    assert(fl(15).getDouble(4) == 50.0, "flat tp -> no flows -> 50")
  }

  test("vortex: flat series -> vi+ = vi- = 1") {
    val out = Graft.vortex(flat(20), "event_type", "ts", "high", "low", "close", n = 14)
      .orderBy("ts").collect()
    (0 until 14).foreach(i => assert(out(i).isNullAt(3), s"warmup at ${i + 1}"))
    (14 until 20).foreach { i =>
      assert(out(i).getDouble(3) == 1.0 && out(i).getDouble(4) == 1.0)
    }
  }

  test("chaikinAd: close at high accumulates +vol, at low -vol, flat bar 0") {
    val bars = Seq(
      ("A", ts(1), 10.0, 8.0, 10.0, 5L),  // mfm=+1 -> ad=5
      ("A", ts(2), 10.0, 8.0, 8.0, 3L),   // mfm=-1 -> ad=2
      ("A", ts(3), 9.0, 9.0, 9.0, 7L),    // flat bar -> mfm=0 -> ad=2
      ("A", ts(4), 10.0, 8.0, 9.0, 4L))   // mid close -> mfm=0 -> ad=2
      .toDF("event_type", "ts", "high", "low", "close", "vol")
    val out = Graft.chaikinAd(bars, "event_type", "ts", "high", "low", "close", "vol")
      .orderBy("ts").collect().map(r => (r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq((1.0, 5.0), (-1.0, 2.0), (0.0, 2.0), (0.0, 2.0)))
  }

  test("adx: steady ramp pins DI+=50, DI-=0, DX=ADX=100; warmup gates hold") {
    // h=i+1,l=i-1,c=i: +DM=1, -DM=0, TR=2 every delta -> all RMAs are
    // constant from the seed, so DI+/DX/ADX are exact from first emission
    val out = Graft.adx(ramp(40), "event_type", "ts", "high", "low", "close", n = 14)
      .orderBy("ts_ms").collect()
    assert(out.length == 39, "seed bar emits nothing")
    out.zipWithIndex.foreach { case (r, i) =>
      val j = i + 1 // delta index
      assert(!r.isNullAt(2) == (j >= 14), s"di warmup at $j")
      assert(!r.isNullAt(5) == (j >= 27), s"adx warmup at $j")
      if (j >= 14) {
        assert(r.getDouble(2) == 50.0 && r.getDouble(3) == 0.0 && r.getDouble(4) == 100.0)
      }
      if (j >= 27) assert(r.getDouble(5) == 100.0)
    }
  }

  test("heikinAshi: hand-computed three-bar chain; flat series is identity") {
    val bars = Seq(
      ("A", ts(1), 10.0, 12.0, 8.0, 11.0),
      ("A", ts(2), 11.0, 13.0, 10.0, 12.0),
      ("A", ts(3), 12.0, 12.0, 9.0, 9.0))
      .toDF("event_type", "ts", "open", "high", "low", "close")
    val out = Graft.heikinAshi(bars, "event_type", "ts", "open", "high", "low", "close")
      .orderBy("ts_ms").collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out(0) == ((10.5, 12.0, 8.0, 10.25)))
    assert(out(1) == ((10.375, 13.0, 10.0, 11.5)))
    assert(out(2) == ((10.9375, 12.0, 9.0, 10.5)))
    val fl = Graft.heikinAshi(
      flat(5).withColumn("open", org.apache.spark.sql.functions.lit(100.0)),
      "event_type", "ts", "open", "high", "low", "close")
      .collect()
    fl.foreach { r =>
      assert(r.getDouble(2) == 100.0 && r.getDouble(5) == 100.0, "flat HA open/close")
      assert(r.getDouble(3) == 105.0 && r.getDouble(4) == 95.0, "raw extrema survive")
    }
  }

  test("trix: constant series -> 0 after the first bar; ramp -> positive") {
    val const = (1 to 10).map(i => ("A", ts(i), 0L, 50.0)).toDF("event_type", "ts", "tie", "x")
    val out = Graft.trix(const, "event_type", "ts", "tie", "x", n = 15)
      .orderBy("ts_ms").collect()
    assert(out(0).isNullAt(4), "first bar has no previous e3")
    out.drop(1).foreach(r => assert(r.getDouble(4) == 0.0 && r.getDouble(3) == 50.0))
    val rampx = (1 to 30).map(i => ("A", ts(i), 0L, i.toDouble)).toDF("event_type", "ts", "tie", "x")
    val r2 = Graft.trix(rampx, "event_type", "ts", "tie", "x", n = 15)
      .orderBy("ts_ms").collect()
    r2.drop(1).foreach(r => assert(r.getDouble(4) > 0.0, "monotone rise -> positive trix"))
  }

  test("aroon: rising highs pin up=100, falling lows pin down=100; latest tie wins") {
    val out = Graft.aroon(ramp(30), "event_type", "ts", "high", "low", n = 25)
      .orderBy("ts").collect()
    (0 until 24).foreach(i => assert(out(i).isNullAt(2)))
    (24 until 30).foreach { i =>
      assert(out(i).getLong(2) == 0L && out(i).getLong(3) == 24L)
      assert(out(i).getDouble(4) == 100.0, "new high every bar")
      assert(out(i).getDouble(5) == 100.0 * 1 / 25, "lowest low fell out of the window edge")
    }
    // all-equal highs: the LATEST occurrence of the max wins the tie
    val out2 = Graft.aroon(flat(26), "event_type", "ts", "high", "low", n = 25)
      .orderBy("ts").collect()
    assert(out2(25).getLong(2) == 0L && out2(25).getLong(3) == 0L)
    assert(out2(25).getDouble(4) == 100.0 && out2(25).getDouble(5) == 100.0)
  }
}
