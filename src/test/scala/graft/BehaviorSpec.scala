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

  test("funnel: construction is lazy (no jobs) and an S=10 funnel is one action") {
    // the old impl ran a persist + count() per stage AT CONSTRUCTION —
    // ≥2S driver-blocking jobs before the caller ever asked for rows
    val ev = (1L to 40L).flatMap { u =>
      (0 until 10).filter(s => u % (s + 1) == 0).map(s => (u, s"s$s", ts(s)))
    }.toDF("user_id", "event_type", "ts")
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = BehaviorOps.funnelOf(ev, "user_id", "event_type", "ts",
        (0 until 10).map(s => s"s$s"))
      Thread.sleep(1000) // listener bus is async; let any events drain
      assert(jobs == 0, s"funnel construction must not run Spark jobs, ran $jobs")
      val out = df.orderBy("step").collect()
      assert(out.length == 10)
      // step k requires u divisible by lcm(1..k+1): lcm 1,2,6,12 → 40,20,6,3
      assert(out.map(_.getLong(2)).take(4).toSeq == Seq(40L, 20L, 6L, 3L))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("funnel: a step nobody reached yields 0 users and 0.0 conversions, never NaN") {
    val ev = Seq(
      (1L, "view", ts(0)), (2L, "view", ts(0)), (1L, "click", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val out = BehaviorOps.funnelOf(ev, "user_id", "event_type", "ts",
      Seq("view", "signup", "click")).orderBy("step").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 0L, 0L))
    val convs = out.flatMap(r => Seq(r.getDouble(3), r.getDouble(4)))
    assert(convs.forall(c => !c.isNaN), s"NaN leaked: ${convs.toSeq}")
    assert(out(1).getDouble(3) == 0.0 && out(2).getDouble(3) == 0.0,
      "conversion out of / into an empty step is 0.0")
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
