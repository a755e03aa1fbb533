package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch: dump the physical plan of ONE t26 gradient-descent
  * iteration in the round-16 shape (doc-window → doc_id re-join →
  * bucket-window) vs the round-17 shape (pre-partitioned cache, one
  * full-frame doc window, one bucket window) — the per-iteration
  * exchange-count evidence for plans/r17 (the declared query returns a
  * checkpointed frame whose plan hides the loop). */
object GradProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = args.headOption.getOrElse("plans/r17")
    val s = Sessions.builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = Tables.t(s, dir, "documents")
    val cells = graft.ops.TextOps.featureHashOf(docs, "doc_id", "text", 64)
    val wDoc = Window.partitionBy(col("doc_id"))
    val x = cells
      .withColumn("__tot", sum(col("n_tokens")).over(wDoc))
      .withColumn("x", col("feat").cast("double") / col("__tot").cast("double"))
      .select(col("doc_id"), col("bucket"), col("x"))
    val lab = docs.select(col("doc_id"), lit(1.0).as("y"))
    val wArr = Array.fill(64)(0.0)
    val wlit = array(wArr.map(lit).toIndexedSeq: _*)
    val wDocOrd = wDoc.orderBy(col("bucket"))
    val wDocCum = wDocOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDocAll = wDocOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wB = Window.partitionBy(col("bucket"))
    val wBOrd = wB.orderBy(col("doc_id"))
    val wBCum = wBOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBAll = wBOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/$name.txt"), txt)
      println(s"PLANOK $name")
    }
    // round-16 shape: plain cache; score fold → last-row filter → errs
    // re-joined onto xy by doc_id → cumulative bucket fold at last row
    locally {
      val xy = x.join(lab, "doc_id").cache()
      val errs = xy.withColumn("__rn", row_number().over(wDocOrd))
        .withColumn("__cnt", count(lit(1)).over(wDoc))
        .withColumn("__sc",
          sum(col("x") * element_at(wlit, col("bucket").cast("int") + 1)).over(wDocCum))
        .filter(col("__rn") === col("__cnt"))
        .select(col("doc_id"), (col("__sc") - col("y")).as("err"))
      val g = xy.join(errs, "doc_id")
        .withColumn("__rn", row_number().over(wBOrd))
        .withColumn("__cnt", count(lit(1)).over(wB))
        .withColumn("__sr", sum(col("err") * col("x")).over(wBCum))
        .filter(col("__rn") === col("__cnt"))
        .select(col("bucket"), col("__sr"))
      dump("t26_hash_classifier_iteration_before", g)
      xy.unpersist()
    }
    // round-17 shape: cache pre-partitioned by doc_id and sorted
    // (doc_id, bucket); one full-frame doc window (same fold order),
    // err carried in-frame, one bucket window
    locally {
      val xy = x.join(lab, "doc_id")
        .repartition(col("doc_id"))
        .sortWithinPartitions(col("doc_id"), col("bucket"))
        .cache()
      val g = xy.withColumn("__sc",
          sum(col("x") * element_at(wlit, col("bucket").cast("int") + 1)).over(wDocAll))
        .withColumn("__e", col("__sc") - col("y"))
        .withColumn("__rn", row_number().over(wBOrd))
        .withColumn("__sr", sum(col("__e") * col("x")).over(wBAll))
        .filter(col("__rn") === 1)
        .select(col("bucket"), col("__sr"))
      xy.count() // fill the cache so the dumped plan reads from it
      dump("t26_hash_classifier_iteration_after", g)
      xy.unpersist()
    }
    s.stop()
  }
}
