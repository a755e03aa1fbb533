package graft

/** Hand-computed pins for the econometric estimators (ops.EconOps,
  * q80–q83). */
class EconSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = new java.sql.Timestamp(h * 3600000L)

  test("amihud: known returns and volumes; warmup gate") {
    // closes 100,110,99,... vol 2: ret1=0.1 illiq=0.05; ret2=-0.1 illiq=0.05
    val bars = Seq(
      ("A", ts(1), 100.0, 2L), ("A", ts(2), 110.0, 2L), ("A", ts(3), 99.0, 2L),
      ("A", ts(4), 99.0, 4L))
      .toDF("event_type", "ts", "close", "vol")
    val out = Graft.amihud(bars, "event_type", "ts", "close", "vol", n = 2)
      .orderBy("ts").collect()
    assert(out(0).isNullAt(3) && out(0).isNullAt(5), "first bar: no return")
    assert(out(1).getDouble(3) == 110.0 / 100.0 - 1.0 &&
      out(1).getDouble(4) == (110.0 / 100.0 - 1.0) / 2.0)
    assert(out(1).isNullAt(5), "needs n defined terms")
    assert(out(2).getDouble(3) == 99.0 / 110.0 - 1.0)
    // rn=3: mean(illiq2, illiq3) = (0.05 + 0.1/110/2... hand value below
    val illiq2 = math.abs(110.0 / 100.0 - 1.0) / 2.0
    val illiq3 = math.abs(99.0 / 110.0 - 1.0) / 2.0
    assert(out(2).getDouble(5) == (0.0 + illiq2 + illiq3) / 2.0)
    assert(out(3).getDouble(3) == 0.0 && out(3).getDouble(4) == 0.0,
      "flat bar: zero return, zero impact")
  }

  test("rollSpread: alternating prices pin cov=-1, spread=2; trending -> null") {
    val alt = (1 to 6).map(i => ("A", ts(i), if (i % 2 == 0) 11.0 else 10.0))
      .toDF("event_type", "ts", "p")
    val r = Graft.rollSpread(alt, "event_type", "ts", "p").collect()(0)
    assert(r.getLong(1) == 4L, "pairs need two lags")
    assert(r.getDouble(2) == -1.0 && r.getDouble(3) == 2.0)
    // monotone ramp: constant +1 changes, cov = 0 -> estimator undefined
    val ramp = (1 to 6).map(i => ("A", ts(i), i.toDouble)).toDF("event_type", "ts", "p")
    val r2 = Graft.rollSpread(ramp, "event_type", "ts", "p").collect()(0)
    assert(r2.getDouble(2) == 0.0 && r2.isNullAt(3))
  }

  test("acf: linear series -> 1 at every lag, with shrinking pair counts") {
    val lin = (1 to 40).map(i => ("A", ts(i), i.toDouble)).toDF("event_type", "ts", "x")
    val out = Graft.acf(lin, "event_type", "ts", "x", maxLag = 5)
      .orderBy("lag").collect()
    assert(out.length == 5)
    out.zipWithIndex.foreach { case (r, i) =>
      val k = i + 1
      assert(r.getInt(1) == k && r.getLong(2) == 40 - k, s"n_pairs at lag $k")
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-9, s"linear acf at lag $k")
    }
    // alternating series: acf(1) = -1, acf(2) = +1 (exactly periodic)
    val altv = (1 to 41).map(i => ("A", ts(i), if (i % 2 == 0) 1.0 else -1.0))
      .toDF("event_type", "ts", "x")
    val a = Graft.acf(altv, "event_type", "ts", "x", maxLag = 2)
      .orderBy("lag").collect()
    assert(math.abs(a(0).getDouble(3) + 1.0) < 1e-9)
    assert(math.abs(a(1).getDouble(3) - 1.0) < 1e-9)
  }

  test("hurst: mean-reverting zigzag scores far below a persistent walk") {
    // deterministic hash noise, ±1 steps
    def rnd(i: Int): Double = (((i * 2654435761L) & 0xffff) / 65535.0) - 0.5
    // persistent: slowly-varying increments (long runs of like-signed
    // deviation from the block mean -> the deviation walk ranges wide)
    val incP = (1 to 600).map(i => math.sin(i / 100.0) + 0.1 * rnd(i))
    val walkP = incP.scanLeft(0.0)(_ + _)
    // anti-persistent: alternating increments (negative autocorrelation)
    val zig = (1 to 600).scanLeft(0.0) { (acc, i) =>
      acc + (if (i % 2 == 0) 1.0 else -1.0) + 0.2 * rnd(i)
    }
    val df = (walkP.zipWithIndex.map { case (v, i) => ("P", ts(i), v) } ++
      zig.zipWithIndex.map { case (v, i) => ("Z", ts(i), v) })
      .toDF("event_type", "ts", "x")
    val out = Graft.hurst(df, "event_type", "ts", "x", scales = Seq(16, 32, 64))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("P")._1 == 3 && out("Z")._1 == 3, "all three scales survive")
    assert(out("P")._2 > 0.7, s"persistent walk H=${out("P")._2}")
    assert(out("Z")._2 < 0.35, s"zigzag H=${out("Z")._2}")
    assert(out("P")._2 > out("Z")._2 + 0.3, "clear separation")
  }

  test("hurst: pure ramp has zero-variance blocks and yields no row") {
    val ramp = (1 to 300).map(i => ("A", ts(i), i.toDouble)).toDF("event_type", "ts", "x")
    assert(Graft.hurst(ramp, "event_type", "ts", "x", Seq(16, 32)).count() == 0)
  }
}
