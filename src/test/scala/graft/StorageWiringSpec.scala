package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.sinks.{BucketedStore, ZOrderWriter}

/** The storage layer WIRED UNDER the pipelines it was built for
  * (round-11/12 carried item):
  *
  *  - p02's perp/spot alignment over a [[BucketedStore]] pair: the
  *    native as-of join consumes the bucketed distribution and plans
  *    with ZERO shuffles (scan-metrics-level proof, broadcast
  *    disabled), and the full market report over the bucketed tables
  *    is row-identical to the plain-parquet gate;
  *  - p04's retrieval pipeline over a [[ZOrderWriter]] corpus: output
  *    hash-identical to the plain layout, while the id-sliced scans
  *    (queries, centroids) let parquet footer min/max skip most of
  *    the corpus (row-group pruning measured via numOutputRows — the
  *    zorder probe's metric). */
class StorageWiringSpec extends SparkSpec {

  // ---- plan introspection (AQE-safe: QueryStageExec has NO children)
  private def walk[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = pf.lift(p).toSeq
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case o                        => o.children
    }
    here ++ kids.flatMap(walk(_)(pf))
  }
  private def shuffles(df: DataFrame): Int = {
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    walk(df.queryExecution.executedPlan) { case s: ShuffleExchangeLike => s }.size
  }
  private def scanRows(df: DataFrame): Long = {
    df.write.format("noop").mode("overwrite").save()
    walk(df.queryExecution.executedPlan) { case f: FileSourceScanExec => f }
      .map(_.metrics("numOutputRows").value).sum
  }

  private def withoutBroadcast[T](f: => T): T = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try f finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old)
    }
  }

  private def dump(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToRawLongBits(d).toString
        case x         => String.valueOf(x)
      }.mkString("|")).sorted
  }

  // p02 stage-1 inputs, exactly as the gate builds them
  private def perpSpot: (DataFrame, DataFrame) = {
    val perp = graft.sources.RatesJson.dedupFundingKeepLast(
      graft.sources.RatesJson.parseFunding(
        graft.ops.IngestOps.fundingPages(spark, sfDir), "payload", Seq("page_seq")),
      col("page_seq"))
      .select(col("symbol"), col("fundingTime").as("ts"),
        col("fundingRate"), col("markPrice"))
    (perp, graft.ops.IngestOps.spotSeries(spark, sfDir))
  }

  test("p02 over BucketedStore: native as-of joins the pair with ZERO shuffles") {
    withoutBroadcast {
      val (perp, spot) = perpSpot
      BucketedStore.write(spark, perp, "graft_wire_perp", Seq("symbol"), 8)
      BucketedStore.write(spark, spot, "graft_wire_spot", Seq("symbol"), 8)
      val bPerp = BucketedStore.read(spark, "graft_wire_perp")
      val bSpot = BucketedStore.read(spark, "graft_wire_spot")
      val wired = Graft.asofJoinNative(bPerp, bSpot, "symbol", "ts", Seq("spot"))
      assert(shuffles(wired) == 0,
        "bucketed perp/spot must satisfy the native as-of's ClusteredDistribution with no exchange")
      val plain = Graft.asofJoinNative(perp, spot, "symbol", "ts", Seq("spot"))
      assert(shuffles(plain) > 0, "control: the plain-parquet pair must need a shuffle")
      assert(dump(wired) == dump(plain), "bucketed as-of must be row-identical to plain")
    }
  }

  test("p02 over BucketedStore: the full market report is row-identical to the plain gate") {
    val (perp, spot) = perpSpot
    // tables written by the previous test may be gone under testOnly ordering — rewrite
    BucketedStore.write(spark, perp, "graft_wire_perp", Seq("symbol"), 8)
    BucketedStore.write(spark, spot, "graft_wire_spot", Seq("symbol"), 8)
    val wired = graft.ops.IngestOps.marketReportOf(
      BucketedStore.read(spark, "graft_wire_perp"),
      BucketedStore.read(spark, "graft_wire_spot"))
    val plain = graft.ops.IngestOps.marketReportOf(perp, spot)
    assert(dump(wired) == dump(plain),
      "the daily market loop must not care whether its inputs are bucketed")
  }

  test("p04 over a z-ordered corpus: identical output, pruned id-slice scans") {
    val base = java.nio.file.Files.createTempDirectory("graft_wire_z_").toString
    try {
      val emb = Tables.t(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"), col("label"))
      emb.repartition(16).write.mode("overwrite").parquet(s"$base/natural")
      ZOrderWriter.writeZOrdered(emb, s"$base/zorder", "vec_id", "label",
        numFiles = 16, bits = 12, tieBreak = Seq("vec_id"))
      def corpus(path: String): DataFrame = spark.read.parquet(path)
        .select(col("vec_id"), F.asDouble(col("embedding")).as("v"))
      val plainOut = graft.ops.SimOps.retrievalPipelineOf(corpus(s"$base/natural"))
      val zOut = graft.ops.SimOps.retrievalPipelineOf(corpus(s"$base/zorder"))
      assert(dump(zOut) == dump(plainOut),
        "the retrieval pipeline must not care about the corpus layout")
      // the id-sliced scan (p04's query side): footer min/max skipping
      // must collapse the z-ordered read to a fraction of the corpus
      val zRows = scanRows(corpus(s"$base/zorder").filter(col("vec_id") < 5))
      val nRows = scanRows(corpus(s"$base/natural").filter(col("vec_id") < 5))
      assert(zRows * 4 <= nRows,
        s"z-ordered id-slice must prune row groups: read $zRows vs natural $nRows")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(base))
    }
  }
}
