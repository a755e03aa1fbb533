package graft

import graft.plans.AsofJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The whole-operator as-of join (custom LogicalPlan + Strategy +
  * SparkPlan) must agree exactly with the declarative union+carry
  * facade operator — including null carries and no-match rows. */
class AsofNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)

  private def collectKey(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("native as-of == declarative as-of on a custom schema with nulls and no-match keys") {
    val quotes = Seq(
      ("BTC", ts(0), Some(100.0), Some(7.0)),
      ("BTC", ts(10), Some(101.0), None), // null size must carry as null
      ("ETH", ts(5), Some(5.0), Some(1.0)))
      .toDF("sym", "t", "px", "sz")
    val trades = Seq(
      ("BTC", ts(4), 1L), ("BTC", ts(10), 2L), ("BTC", ts(11), 3L),
      ("ETH", ts(1), 4L),  // precedes the only ETH quote -> nulls
      ("DOGE", ts(9), 5L)) // no quotes at all
      .toDF("sym", "t", "trade_id")
    val native = Graft.asofJoinNative(trades, quotes, "sym", "t", Seq("px", "sz"))
    val declarative = Graft.asofJoin(trades, quotes, "sym", "t", Seq("px", "sz"))
    assert(native.columns.toSeq == declarative.columns.toSeq)
    assert(collectKey(native) == collectKey(declarative))
    val r = native.filter(col("trade_id") === 3L).head()
    assert(r.getDouble(r.fieldIndex("px")) == 101.0)
    assert(r.isNullAt(r.fieldIndex("sz")), "matched row's null must not back-fill")
  }

  test("native as-of == declarative as-of on the events table (q13 shape)") {
    val e = Tables.t(spark, sfDir, "events")
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("v_event_id"), max_by(col("value"), col("event_id")).as("v_value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_event_id"), col("value").as("p_value"))
    val native = Graft.asofJoinNative(purchases, views, "user_id", "ts", Seq("v_event_id", "v_value"))
    val declarative = Graft.asofJoin(purchases, views, "user_id", "ts", Seq("v_event_id", "v_value"))
    assert(native.count() == purchases.count())
    assert(collectKey(native) == collectKey(declarative))
  }

  test("the plan contains AsofJoinExec with co-partitioned, sorted children") {
    val quotes = Seq(("A", ts(0), 1.0)).toDF("k", "t", "v")
    val trades = Seq(("A", ts(1), 1L)).toDF("k", "t", "id")
    val df = Graft.asofJoinNative(trades, quotes, "k", "t", Seq("v"))
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }
    val execs = plan.collectWithSubqueries { case e: AsofJoinExec => e }
    assert(execs.size == 1, s"expected AsofJoinExec in:\n$plan")
    // EnsureRequirements must have inserted sorts satisfying (key, ts)
    execs.head.children.foreach { c =>
      assert(c.outputOrdering.map(_.child.toString.takeWhile(_ != '#')).take(2) == Seq("k", "t"),
        s"child must be sorted by (key, ts): ${c.outputOrdering}")
    }
  }
}
