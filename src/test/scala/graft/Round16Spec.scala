package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-16 laws: the delta-bounded graph-maintenance decomposition
  * (graphInsertDeltaOf / graphDeleteDeltaOf vs their full forms) that
  * lets the continuous index tick land only changed adjacency lists. */
class Round16Spec extends SparkSpec {
  import graft.ops.SimOps

  private def vecsOf(dir: String): DataFrame =
    Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), F.asDouble(col("embedding")).as("v"))

  private def sameRows(x: DataFrame, y: DataFrame): Boolean =
    x.count() == y.count() && x.except(y).isEmpty && y.except(x).isEmpty

  test("graphInsertOf decomposes EXACTLY into graphInsertDeltaOf plus the " +
    "untouched original lists (the delta-landing law)") {
    val all = vecsOf("/root/testdata/sf0.001")
    val a = all.filter(col("vec_id") % 10 =!= 9)
    val b = all.filter(col("vec_id") % 10 === 9)
    val anchors = all.filter(pmod(col("vec_id"), lit(64)) === 0)
    val edges = SimOps.knnGraphOf(a, anchors, "vec_id", "v", "vec_id", "v",
      r = 8, cellProbes = 2, descentRounds = 1).localCheckpoint(eager = true)
    val full = SimOps.graphInsertOf(a, b, edges, anchors, anchors,
      "vec_id", "v", r = 8, beam = 4, hops = 3).localCheckpoint(eager = true)
    val delta = SimOps.graphInsertDeltaOf(a, b, edges, anchors, anchors,
      "vec_id", "v", r = 8, beam = 4, hops = 3).localCheckpoint(eager = true)
    val untouched = edges.join(delta.select("src").distinct(),
      Seq("src"), "left_anti")
    val recomposed = delta.unionByName(untouched)
    assert(sameRows(full, recomposed),
      "delta lists ∪ untouched lists must equal the full insert bit-for-bit")
    info(s"changed-list rows ${delta.count()} vs full index rows ${full.count()}")
    // every delta node's list is in the changed set
    assert(delta.select("src").distinct()
      .join(b.select(col("vec_id").as("src")), Seq("src"), "left_semi")
      .count() == b.count(), "every inserted node needs a landed list")
  }

  test("graphInsertDeltaOf: a SMALL delta lands a small changed set — the " +
    "challenge fan-in is bounded by the delta's cells, not the corpus") {
    val all = vecsOf("/root/testdata/sf0.01")
    val a = all.filter(col("vec_id") % 100 =!= 99)
    val b = all.filter(col("vec_id") % 100 === 99)
    val anchors = all.filter(pmod(col("vec_id"), lit(64)) === 0)
    val edges = SimOps.knnGraphOf(a, anchors, "vec_id", "v", "vec_id", "v",
      r = 8, cellProbes = 2, descentRounds = 1).localCheckpoint(eager = true)
    val delta = SimOps.graphInsertDeltaOf(a, b, edges, anchors, anchors,
      "vec_id", "v", r = 8, beam = 4, hops = 3).localCheckpoint(eager = true)
    val (nd, nf) = (delta.count(), edges.count() + delta.count())
    info(s"1% delta: changed-list rows $nd of ~$nf total index rows")
    assert(nd < nf / 2,
      s"a 1% insert must not re-land most of the index ($nd of $nf)")
  }

  test("graphDeleteOf decomposes EXACTLY into graphDeleteDeltaOf plus the " +
    "untouched live lists (the delta-landing law, delete side)") {
    val all = vecsOf("/root/testdata/sf0.001")
    val anchors = all.filter(pmod(col("vec_id"), lit(64)) === 0)
    val edges = SimOps.knnGraphOf(all, anchors, "vec_id", "v", "vec_id", "v",
      r = 8, cellProbes = 2, descentRounds = 1).localCheckpoint(eager = true)
    val del = all.filter(col("vec_id") % 10 === 9)
    val full = SimOps.graphDeleteOf(all, del, edges, "vec_id", "v", r = 8)
      .localCheckpoint(eager = true)
    val delta = SimOps.graphDeleteDeltaOf(all, del, edges, "vec_id", "v", r = 8)
      .localCheckpoint(eager = true)
    val delIds = del.select(col("vec_id").as("src"))
    val untouched = edges
      .join(delta.select("src").distinct(), Seq("src"), "left_anti")
      .join(delIds, Seq("src"), "left_anti")
    val recomposed = delta.unionByName(untouched.select("src", "dst", "cos"))
    assert(sameRows(full, recomposed),
      "changed lists ∪ untouched live lists must equal the full delete bit-for-bit")
    assert(delta.join(delIds, Seq("src"), "left_semi").isEmpty,
      "a deleted src must not land a list")
    info(s"changed-list rows ${delta.count()} vs live index rows ${full.count()}")
  }
}
