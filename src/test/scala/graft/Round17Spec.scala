package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-17 contracts: the annIndexTick UPDATE-form guard (a live id
  * must be re-embedded as delete + insert in one tick, never batch
  * alone) and the CTE-materialization rewrite's anchoring. */
class Round17Spec extends SparkSpec {
  import graft.streaming.StreamOps

  private def vecsOf(dir: String): DataFrame =
    Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), F.asDouble(col("embedding")).as("v"))

  test("annIndexTick FAILS LOUDLY when a live id arrives in `batch` alone, " +
    "and the error names the sanctioned delete+insert form") {
    val all = vecsOf("/root/testdata/sf0.001")
    val store = java.nio.file.Files.createTempDirectory("graft_r17_guard_").toString
    StreamOps.annIndexTick(spark, store, all.filter(col("vec_id") < 400),
      "vec_id", "v", r = 8, beam = 4, hops = 3, landingId = 0L)
    // re-embed vec_id 7 (live) by batch alone: must throw, and must not
    // have landed anything for tick 1
    val tweaked = all.filter(col("vec_id") === 7)
      .select(col("vec_id"), transform(col("v"), x => x * 2.0).as("v"))
    val ex = intercept[IllegalArgumentException] {
      StreamOps.annIndexTick(spark, store, tweaked,
        "vec_id", "v", r = 8, beam = 4, hops = 3, landingId = 1L)
    }
    assert(ex.getMessage.contains("delete + insert in ONE tick"),
      s"error must name the sanctioned update form, got: ${ex.getMessage}")
    assert(ex.getMessage.contains("7"), "error must name the offending id")
    // the guard ran BEFORE any landing: tick 1 left no state, so the
    // next tick's crashed-tick manifest check stays quiet
    assert(spark.read.parquet(s"$store/vectors")
      .filter(col("__landing").cast("long") === 1L).isEmpty,
      "a guarded tick must not land vectors")
    // the sanctioned form (same tick: delete the id AND insert its new
    // vector) is accepted and the NEW vector wins everywhere
    StreamOps.annIndexTick(spark, store, tweaked,
      "vec_id", "v", r = 8, beam = 4, hops = 3, landingId = 1L,
      deletes = all.filter(col("vec_id") === 7))
    val lived = StreamOps.annLiveVectors(spark, store)
      .filter(col("vec_id") === 7).collect()
    assert(lived.length == 1, "the re-embedded id stays live")
    val v0 = all.filter(col("vec_id") === 7).select("v")
      .collect()(0).getSeq[Double](0)
    val v1 = lived(0).getSeq[Double](1)
    assert(v1 == v0.map(_ * 2.0), "the NEW embedding is the live vector")
  }

  test("a dead id (never inserted) and a deleted id pass the guard — only " +
    "LIVE ids are rejected from a batch-only arrival") {
    val all = vecsOf("/root/testdata/sf0.001")
    val store = java.nio.file.Files.createTempDirectory("graft_r17_guard2_").toString
    StreamOps.annIndexTick(spark, store, all.filter(col("vec_id") < 300),
      "vec_id", "v", r = 8, beam = 4, hops = 3, landingId = 0L)
    // delete 5, then re-insert 5 batch-only in a LATER tick: 5 is not
    // live any more, so the plain insert path (resurrection) is fine
    StreamOps.annIndexTick(spark, store,
      all.filter(col("vec_id") >= 300 && col("vec_id") < 320),
      "vec_id", "v", r = 8, beam = 4, hops = 3, landingId = 1L,
      deletes = all.filter(col("vec_id") === 5))
    StreamOps.annIndexTick(spark, store, all.filter(col("vec_id") === 5),
      "vec_id", "v", r = 8, beam = 4, hops = 3, landingId = 2L)
    assert(StreamOps.annLiveVectors(spark, store)
      .filter(col("vec_id") === 5).count() == 1L,
      "a deleted id re-inserted batch-only is a legal resurrection")
  }

  test("materializeCtes anchors to CTE definition sites: column-list CTEs " +
    "are rewritten, mid-line ` AS (` text is left alone") {
    import graft.ops.SimOps.materializeCtes
    val sql =
      """WITH base AS (SELECT 1 AS x),
        |w(a, b) AS (SELECT x, x + 1 FROM base),
        |lit AS (SELECT 'this AS (text)' AS s, CAST(x AS INT) AS y FROM base)
        |SELECT * FROM w JOIN lit ON TRUE""".stripMargin
    val out = materializeCtes(sql)
    assert(out.contains("WITH base AS MATERIALIZED (SELECT 1 AS x)"),
      "WITH-leading CTE rewritten")
    assert(out.contains("w(a, b) AS MATERIALIZED ("),
      "column-list CTE rewritten")
    assert(out.contains("lit AS MATERIALIZED (SELECT"),
      "line-start CTE rewritten")
    assert(out.contains("'this AS (text)'"),
      "string literal untouched")
    assert(!out.contains("x AS MATERIALIZED"), "expression alias untouched")
    // idempotent enough for today's call sites: a second pass must not
    // double-rewrite an already-materialized CTE
    assert(materializeCtes(out) == out, "second pass is a no-op")
  }
}
