package graft

import graft.sinks.BucketedStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bucketed tables must make the repeated fact⋈fact join shuffle-free
  * (the reference's perp⋈spot alignment — its hottest join). */
class BucketedStoreSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // finalize AQE
    def strip(p: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan =
      p match { case a: AdaptiveSparkPlanExec => a.executedPlan; case o => o }
    strip(df.queryExecution.executedPlan).collectWithSubqueries {
      case s: ShuffleExchangeExec => s
    }.size
  }

  /** Broadcast disabled so the comparison isolates bucketing: without
    * it AQE broadcasts the small side and both variants show 0
    * shuffles, proving nothing. */
  private def withoutBroadcast[T](f: => T): T = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try f finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old)
    }
  }

  test("join of two tables bucketed on the key plans without a shuffle") { withoutBroadcast {
    val li = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val o = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    BucketedStore.write(spark, li, "li_b", Seq("l_orderkey"), 8)
    BucketedStore.write(spark, o, "o_b", Seq("o_orderkey"), 8)

    val joined = BucketedStore.read(spark, "li_b")
      .join(BucketedStore.read(spark, "o_b"), col("l_orderkey") === col("o_orderkey"))
    assert(shuffles(joined) == 0, "bucketed join must not shuffle")

    // identical sort-merge join on raw parquet shuffles BOTH sides
    val raw = li.join(o, col("l_orderkey") === col("o_orderkey"))
    assert(shuffles(raw) == 2, "raw SMJ must shuffle both sides")
    assert(raw.count() == joined.count())
  } }

  test("groupBy on the bucket key needs no exchange either") {
    val agg = BucketedStore.read(spark, "li_b")
      .groupBy("l_orderkey").agg(sum("l_extendedprice"))
    assert(shuffles(agg) == 0, "bucketed aggregation must not shuffle")
  }
}
