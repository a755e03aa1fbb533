package graft

import graft.functions.DotProduct
import org.apache.spark.sql.functions._

/** The optimizer rule must silently replace user-written HOF dot
  * products with the native DotProduct loop — same results, native
  * plan. */
class NativeVectorRewriteSpec extends SparkSpec {

  private def vecs = Tables.t(spark, sfDir, "embeddings")
    .select(col("vec_id"), F.asDouble(col("embedding")).as("v"))

  test("HOF aggregate(zip_with(a,b,*),0.0,+) is rewritten to DotProduct") {
    val df = vecs.withColumn("d", F.dot(col("v"), col("v")))
    val natives = df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case d: DotProduct => d
    })
    assert(natives.nonEmpty, "optimizer must rewrite the HOF dot to DotProduct")
  }

  test("rewrite preserves values bit-for-bit vs a session without the rule") {
    val out = vecs.limit(50).withColumn("d", F.dot(col("v"), col("v")))
      .select("vec_id", "d").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference: same fold via the unrolled tree path (not subject to the rule)
    val ref = vecs.limit(50).withColumn("d", F.dotN(col("v"), col("v"), 64))
      .select("vec_id", "d").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // balanced vs sequential differ in general; compare within fp tolerance
    out.foreach { case (id, d) => assert(math.abs(d - ref(id)) < 1e-9) }
    // exact check: native loop == Scala-side sequential fold
    val raw = Tables.t(spark, sfDir, "embeddings").limit(50)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    raw.foreach { case (id, xs) =>
      val seq = xs.foldLeft(0.0)((acc, x) => acc + x * x)
      assert(out(id) == seq, s"vec $id: native ${out(id)} vs scala $seq")
    }
  }

  test("non-matching shapes are left alone (different seed)") {
    val df = vecs.withColumn("d",
      expr("aggregate(zip_with(v, v, (x, y) -> x * y), CAST(1.0 AS DOUBLE), (acc, x) -> acc + x)"))
    val natives = df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case d: DotProduct => d
    })
    assert(natives.isEmpty, "seed != 0.0 must not be rewritten")
    // and it still evaluates correctly (1.0 + Σx²)
    val r = df.limit(1).select("d").head().getDouble(0)
    assert(r > 1.0)
  }
}
