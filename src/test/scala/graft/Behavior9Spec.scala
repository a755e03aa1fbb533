package graft

/** Hand-computed pins for the round-9 behavioral operators (q84–q86). */
class Behavior9Spec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)

  test("behaviorEntropy: uniform pins ln k, single-category pins 0") {
    val ev = (Seq.tabulate(4)(i => (1L, ts(i), if (i % 2 == 0) "a" else "b")) ++
      Seq.tabulate(3)(i => (2L, ts(i), "only")) ++
      Seq((3L, ts(0), "x"), (3L, ts(1), "y"), (3L, ts(2), "y"), (3L, ts(3), "y")))
      .toDF("user_id", "ts", "event_type")
    val out = Graft.behaviorEntropy(ev, "user_id", "event_type")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    // user 1: 2+2 uniform over 2 -> H = ln 2, normalized 1
    assert(out(1L)._1 == 4L && out(1L)._2 == 2L)
    assert(math.abs(out(1L)._3 - math.log(2)) < 1e-12 &&
      math.abs(out(1L)._4.get - 1.0) < 1e-12)
    // user 2: one category -> H = 0, normalized null
    assert(out(2L)._3 == 0.0 && out(2L)._4.isEmpty)
    // user 3: p = 1/4, 3/4
    val h3 = -(0.25 * math.log(0.25)) - (0.75 * math.log(0.75))
    assert(math.abs(out(3L)._3 - h3) < 1e-12)
  }

  test("interEventStats: constant cadence has sd 0; burst shows in max") {
    val ev = (Seq.tabulate(5)(i => (1L, ts(i))) :+ ((2L, ts(0))) :+ ((2L, ts(1))) :+ ((2L, ts(60))))
      .toDF("user_id", "ts")
    val out = Graft.interEventStats(ev, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(out(1L) == ((4L, 4 * 60000L, 60000.0, 0.0, 60000L, 60000L)))
    val (n2, tot2, mean2, _, mn2, mx2) = out(2L)
    assert(n2 == 2L && tot2 == 60 * 60000L && mn2 == 60000L && mx2 == 59 * 60000L)
    assert(mean2 == 30 * 60000.0)
    // single-event users are absent
    val single = Graft.interEventStats(Seq((9L, ts(0))).toDF("user_id", "ts"), "user_id", "ts")
    assert(single.count() == 0)
  }

  test("giniConcentration: even split -> 0; monopoly approaches 1") {
    // group E: 4 users x 5 events each -> G = 0
    // group M: user 1..3 have 1 event, user 4 has 97 -> G high
    val ev = ((for (u <- 1 to 4; i <- 1 to 5) yield ("E", u.toLong, i)) ++
      (for (u <- 1 to 3) yield ("M", u.toLong, 0)) ++
      (for (i <- 1 to 97) yield ("M", 4L, i)))
      .map { case (g, u, i) => (g, u, ts(i)) }
      .toDF("event_type", "user_id", "ts")
    val out = Graft.giniConcentration(ev, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("E")._3 == 0.0, "perfectly even")
    assert(out("M")._1 == 4L && out("M")._2 == 100L)
    // ranks: counts (1,1,1,97) -> sum i*c = 1+2+3+4*97 = 394
    val expected = (2.0 * 394 - 5.0 * 100) / (4.0 * 100)
    assert(out("M")._3 == expected && expected > 0.7)
  }
}
