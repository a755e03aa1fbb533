package graft

import org.apache.spark.sql.functions._

/** Round-15 items: indexDrift works for non-Long id types, the CMS
  * report counts absent (zero) cells, VAD profiles keep empty-payload
  * ids, and the s20 graph build bounds hot-cell pair generation. */
class Round15Spec extends SparkSpec {

  // ------------------------------------- s25 drift: non-Long id types

  test("indexDriftOf: Int and String id columns work (the cells frame " +
    "carries the id column's actual type; no Long cast on the way in)") {
    import spark.implicits._
    val a = Seq(1.0, 0.0, 0.0, 0.0)
    val b = Seq(0.0, 1.0, 0.0, 0.0)
    // Int ids — numeric, so the public long `cluster` contract holds
    val idxI = Seq(0 -> a, 4 -> a, 2 -> b, 6 -> b).toDF("vec_id", "v")
    val newI = Seq(1 -> a, 5 -> a, 3 -> b, 7 -> b).toDF("vec_id", "v")
    val outI = graft.ops.SimOps.indexDriftOf(idxI, newI, "vec_id", "v",
      dims = 4, k = 2, iters = 1).orderBy("cluster").collect()
    assert(outI.map(_.getLong(0)).toSeq == Seq(0L, 2L),
      "Int ids train and report the same cells as Long ids")
    assert(outI.forall(_.getDouble(6) == 0.0), "mirrored halves: PSI 0")
    // String ids — must not throw; cluster ids come from numeric strings
    val idxS = Seq("00" -> a, "04" -> a, "02" -> b, "06" -> b).toDF("vec_id", "v")
    val newS = Seq("01" -> a, "05" -> a, "03" -> b, "07" -> b).toDF("vec_id", "v")
    val outS = graft.ops.SimOps.indexDriftOf(idxS, newS, "vec_id", "v",
      dims = 4, k = 2, iters = 1).orderBy("cluster").collect()
    assert(outS.map(_.getLong(0)).toSeq == Seq(0L, 2L),
      "numeric-string ids survive the final long cast")
    assert(outS.map(r => (r.getLong(1), r.getLong(2))).forall(_ == ((2L, 2L))),
      "occupancy mirrors on both sides")
  }

  // --------------------------------- st12 report: absent cells are 0

  test("termSketchReport: a term whose cells were never landed estimates 0 " +
    "and STAYS in the report (absent sparse cells count as zero)") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("r15_cms_").toString
    val docs = Seq((1L, "alpha alpha beta")).toDF("doc_id", "text")
    graft.streaming.StreamOps.termSketchTick(spark, store, docs, "text",
      rows = 4, width = 1024, landingId = 0L)
    // watchlist carries a term the corpus never contained: zzz-phantom
    val watch = Seq(("alpha", 2L), ("zzzphantom", 0L)).toDF("term", "n_exact")
    val out = graft.streaming.StreamOps
      .termSketchReport(spark, store, watch, rows = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out.contains("zzzphantom"), "absent-cell terms must not vanish")
    assert(out("zzzphantom") == 0L, s"all-empty cells => estimate 0, got $out")
    assert(out("alpha") >= 2L, "CMS estimates dominate exacts")
  }

  // ------------------------------------ m13 VAD: empty payloads kept

  test("vadProfileOf: empty and NULL payloads keep their id with n_bytes=0 " +
    "and null trims instead of vanishing from the output") {
    import spark.implicits._
    val df = Seq(
      (1L, Array[Byte](0, 0, 127.toByte, 127.toByte, 0)),
      (2L, Array.empty[Byte]),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val out = graft.ops.MultiOps.vadProfileOf(df, "id", "payload")
      .orderBy("id").collect()
    assert(out.length == 3, s"every input id gets a row, got ${out.length}")
    val empty = out.filter(r => r.getLong(0) != 1L)
    assert(empty.forall(_.getLong(1) == 0L), "empty/null payloads: n_bytes 0")
    assert(empty.forall(_.isNullAt(7)) && empty.forall(_.isNullAt(8)),
      "empty/null payloads: null trim offsets")
    assert(empty.forall(_.isNullAt(9)), "empty/null payloads: null active_ratio")
    val full = out.find(_.getLong(0) == 1L).get
    // bytes (0,0,127,127,0): |0-128|=128 active, |127-128|=1 silent
    assert(full.getLong(1) == 5L && full.getLong(7) == 0L && full.getLong(8) == 4L,
      s"non-empty payload trims to the active extent, got $full")
  }
}
