package graft

/** Pins for q87 Holt smoothing and ds19 PSI drift. */
class Quality9Spec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = new java.sql.Timestamp(h * 3600000L)

  test("holt: a pure linear ramp is forecast perfectly from bar 3 on") {
    val df = (1 to 20).map(i => ("A", ts(i), 0L, i.toDouble)).toDF("k", "ts", "tie", "x")
    val out = Graft.holt(df, "k", "ts", "tie", "x").orderBy("ts_ms").collect()
    // bar 1: raw value, no trend/forecast
    assert(out(0).getDouble(3) == 1.0 && out(0).isNullAt(4) && out(0).isNullAt(5))
    // bar 2 seed: level = 2, trend = 1, still no forecast
    assert(out(1).getDouble(3) == 2.0 && out(1).getDouble(4) == 1.0 && out(1).isNullAt(5))
    // bars 3..: level tracks i, trend stays 1, forecast == x, err == 0
    // (to IEEE rounding: 0.3*3 + 0.7*3 = 2.9999999999999996)
    out.drop(2).zipWithIndex.foreach { case (r, j) =>
      val i = j + 3
      assert(math.abs(r.getDouble(3) - i) < 1e-9, s"level at $i")
      assert(math.abs(r.getDouble(4) - 1.0) < 1e-9, s"trend at $i")
      assert(math.abs(r.getDouble(5) - i) < 1e-9, s"forecast at $i")
      assert(math.abs(r.getDouble(6)) < 1e-9, s"err at $i")
    }
  }

  test("holt: a level shift produces one big error then re-converges toward it") {
    val df = ((1 to 10).map(i => ("A", ts(i), 0L, 10.0)) ++
      (11 to 30).map(i => ("A", ts(i), 0L, 50.0))).toDF("k", "ts", "tie", "x")
    val out = Graft.holt(df, "k", "ts", "tie", "x").orderBy("ts_ms").collect()
    assert(out(10).getDouble(6) == 40.0, "the shift bar is missed by exactly the jump")
    assert(math.abs(out(29).getDouble(6)) < math.abs(out(11).getDouble(6)),
      "errors shrink as the level re-converges")
  }

  test("psiDrift: identical halves give PSI 0; a shifted half crosses the action bar") {
    val base = (1 to 1000).map(i => (i.toLong, (i % 100).toLong)).toDF("id", "v")
    val same = Graft.psiDrift(base, base, "v", bins = 10).collect()
    assert(same.length == 10, "every bin present")
    same.foreach { r =>
      assert(r.getDouble(7) == 0.0 && r.getDouble(8) == 0.0, "identical -> psi 0 exactly")
    }
    // current shifted way up: mass leaves the low bins
    val cur = (1 to 1000).map(i => (i.toLong, 80L + (i % 20))).toDF("id", "v")
    val drift = Graft.psiDrift(base, cur, "v", bins = 10).collect()
    assert(drift.length == 10)
    val psi = drift.head.getDouble(8)
    assert(drift.forall(_.getDouble(8) == psi), "total repeated on every row")
    assert(psi > 0.25, s"shift must cross the action threshold, got $psi")
    // out-of-range current values clamp into the edge bin, not vanish
    val far = Graft.psiDrift(base, base.withColumn("v", $"v" + 1000), "v", 10).collect()
    assert(far.map(_.getLong(4)).sum == 1000L, "all current rows counted")
    assert(far.last.getLong(4) == 1000L, "clamped to the top bin")
  }
}
