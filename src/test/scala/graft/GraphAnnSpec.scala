package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.SimOps

/** Graph ANN (s20: knnGraphOf build + graphAnnOf beam search) — the
  * recall-at-low-budget claim, measured not asserted-by-prose: at the
  * gate parameters the beam search must reach recall@10 ≥ the IVF
  * 2-probe path while SCORING fewer candidates per query. Plus the
  * structural contracts: ≤ r out-edges per node, build determinism
  * under input partitioning, and the hops=0 degenerate form. */
class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private def all: DataFrame =
    Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), F.asDouble(col("embedding")).as("v"))

  private def topSet(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("q_id").cast("long"), col("vec_id").cast("long"))
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def anchors: DataFrame = all.filter(pmod(col("vec_id"), lit(64)) === 0)

  private lazy val edges = SimOps.knnGraphOf(all, anchors,
    "vec_id", "v", "vec_id", "v", r = 8, cellProbes = 2, descentRounds = 1)
    .localCheckpoint(eager = true)

  test("knnGraphOf: at most r out-edges per node, no self-loops, deterministic under repartition") {
    val perSrc = edges.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(perSrc <= 8, s"out-degree cap broken: $perSrc > 8")
    assert(edges.filter(col("src") === col("dst")).count() == 0L, "self-loop found")
    val again = SimOps.knnGraphOf(all.repartition(13), anchors,
      "vec_id", "v", "vec_id", "v", r = 8, cellProbes = 2, descentRounds = 1)
    assert(edges.select("src", "dst").exceptAll(again.select("src", "dst")).count() == 0L &&
      again.select("src", "dst").exceptAll(edges.select("src", "dst")).count() == 0L,
      "edge set must be invariant under input partitioning")
  }

  test("beam search beats IVF recall at a smaller scored-candidate budget (the s20 claim)") {
    val queries = all.filter(col("vec_id") < 5)
    val truth = topSet(Graft.knnBrute(all, queries, "vec_id", "v", 10))
    val graphAll = SimOps.graphAnnOf(all, queries, anchors, edges, "vec_id", "v",
      k = Int.MaxValue, beam = 4, hops = 3).localCheckpoint(eager = true)
    val ivfAll = SimOps.ivfAnnOf(all, queries, anchors, "vec_id", "v", "vec_id", "v",
      k = Int.MaxValue, probes = 2).localCheckpoint(eager = true)
    def recallOf(result: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, t) => (t intersect result.getOrElse(q, Set.empty)).size / 10.0 }
      per.sum / per.size
    }
    val gRecall = recallOf(topSet(graphAll.filter(col("rank") <= 10)))
    val iRecall = recallOf(topSet(ivfAll.filter(col("rank") <= 10)))
    val gBudget = graphAll.groupBy("q_id").count().agg(avg("count")).head().getDouble(0)
    val iBudget = ivfAll.groupBy("q_id").count().agg(avg("count")).head().getDouble(0)
    info(f"graph recall@10 $gRecall%.3f at budget $gBudget%.1f; ivf recall@10 $iRecall%.3f at budget $iBudget%.1f")
    assert(gBudget < iBudget * 0.7, s"graph must score well under IVF's candidates: $gBudget vs ivf $iBudget")
    assert(gRecall >= iRecall, s"graph recall $gRecall must be >= ivf recall $iRecall")
    assert(gRecall >= 0.9, s"graph recall unreasonably low: $gRecall")
  }

  test("hops=0 degenerates to the anchor entry; self-entries excluded from results") {
    val res = SimOps.graphAnnOf(all, all.filter(col("vec_id") === 0),
      anchors, edges, "vec_id", "v", k = 10, beam = 4, hops = 0)
    // vec_id 0 is its own best anchor (cos=1), which excludeSelf drops
    assert(res.count() == 0L, "self-anchor entries must be excluded")
    val resKeep = SimOps.graphAnnOf(all, all.filter(col("vec_id") === 0),
      anchors, edges, "vec_id", "v", k = 10, beam = 4,
      hops = 0, excludeSelf = false)
    assert(resKeep.count() == 1L && resKeep.filter(col("vec_id") === col("q_id")).count() == 1L)
  }
}
