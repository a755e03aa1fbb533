package graft

import graft.ops.BehaviorOps

/** Funnel/retention semantics the SQL gate can't pin alone: strict
  * in-order progress, out-of-order events, cohort day arithmetic. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = new java.sql.Timestamp(1700006400000L + h * 3600000L) // exact UTC midnight base

  test("funnel: strict order — a purchase before the click chain does not count") {
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)), // full path
      (2L, "view", ts(0)), (2L, "click", ts(1)),                          // stops at click
      (3L, "click", ts(0)), (3L, "view", ts(1)),                          // click BEFORE view
      (4L, "purchase", ts(0)), (4L, "view", ts(1)), (4L, "click", ts(2)), // early purchase
      (5L, "view", ts(3))                                                 // view only
    ).toDF("user_id", "event_type", "ts")
    val out = BehaviorOps.funnelOf(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("step").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "view", 5L), (2, "click", 3L), (3, "purchase", 1L)))
    // users 1,2,4 click at-or-after their first view; only user 1 purchases after
    assert(math.abs(out(1).getDouble(3) - 3.0 / 5.0) < 1e-12)
    assert(math.abs(out(2).getDouble(3) - 1.0 / 3.0) < 1e-12)
    assert(math.abs(out(2).getDouble(4) - 1.0 / 5.0) < 1e-12)
    intercept[IllegalArgumentException](
      BehaviorOps.funnelOf(ev, "user_id", "event_type", "ts", Seq("view")))
    intercept[IllegalArgumentException](
      BehaviorOps.funnelOf(ev, "user_id", "event_type", "ts", Seq("view", "view")))
  }

  test("funnel: same-timestamp step events count (at-or-after, not strictly-after)") {
    val ev = Seq((1L, "view", ts(0)), (1L, "click", ts(0)))
      .toDF("user_id", "event_type", "ts")
    val out = BehaviorOps.funnelOf(ev, "user_id", "event_type", "ts",
      Seq("view", "click")).orderBy("step").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L))
  }

  test("retention: exact day cells from a hand-built activity grid") {
    val day = 24
    val ev = Seq(
      (1L, ts(0)), (1L, ts(day)), (1L, ts(2 * day)),      // days 0,1,2
      (2L, ts(1)), (2L, ts(2 * day + 3)),                 // days 0,2 (same cohort)
      (3L, ts(day)), (3L, ts(day + 1)), (3L, ts(3 * day)) // cohort day1, k=0,2
    ).toDF("user_id", "ts")
    val out = BehaviorOps.retentionOf(ev, "user_id", "ts", maxK = 7)
      .orderBy("cohort_ms", "k").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val d0 = 1700006400000L
    val d1 = d0 + 86400000L
    assert(out.keySet.map(_._1) == Set(d0, d1))
    assert(out((d0, 0)) == ((2L, 2L, 1.0)))  // users 1,2 on their day 0
    assert(out((d0, 1)) == ((1L, 2L, 0.5)))  // only user 1 back next day
    assert(out((d0, 2)) == ((2L, 2L, 1.0)))  // both back on day 2
    assert(out((d1, 0)) == ((1L, 1L, 1.0)))
    assert(out((d1, 2)) == ((1L, 1L, 1.0)))
    assert(!out.contains((d1, 1)))           // sparse: no zero-filled cells
  }
}
