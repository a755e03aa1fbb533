package graft

import org.apache.spark.sql.functions._
import graft.functions.WinnowFingerprint

/** Native graft_winnow fingerprint: bit-identical to the composed
  * HOF md5-gram + window-min chain it replaces, and evaluated once per
  * row in the optimized plan. */
class WinnowSpec extends SparkSpec {

  private def docs = Tables.t(spark, sfDir, "documents")
    .filter(length(col("text")) >= 11)

  test("graft_winnow(text, 8, 4) == HOF md5-gram/window-min chain, bit for bit") {
    val native = docs
      .withColumn("fp", expr("graft_winnow(text, 8, 4)"))
      .select(col("doc_id"), col("fp.n_grams"), col("fp.n_fp"),
        col("fp.fp_min"), col("fp.fp_max"), col("fp.fp_xor"))
    val hof = docs
      .withColumn("grams", expr(
        "transform(sequence(1, length(text) - 7), " +
          "i -> CAST(conv(substring(md5(substring(text, i, 8)), 1, 15), 16, 10) AS BIGINT))"))
      .withColumn("wins", expr(
        "transform(sequence(1, size(grams) - 3), j -> array_min(slice(grams, j, 4)))"))
      .withColumn("fps", array_distinct(col("wins")))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        size(col("fps")).cast("long").as("n_fp"),
        array_min(col("fps")).as("fp_min"),
        array_max(col("fps")).as("fp_max"),
        expr("aggregate(fps, CAST(0 AS BIGINT), (acc, x) -> acc ^ x)").as("fp_xor"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("non-ASCII substrings hash by code point, like SQL substring") {
    // 'é' is 2 UTF-8 bytes, 1 character: byte-offset grams would diverge
    val df = spark.sql(
      """SELECT graft_winnow(t, 3, 2) AS fp,
        |  transform(sequence(1, length(t) - 2),
        |    i -> CAST(conv(substring(md5(substring(t, i, 3)), 1, 15), 16, 10) AS BIGINT)) AS grams
        |FROM VALUES ('héllo wörld'), ('ascii only.') AS v(t)""".stripMargin)
    df.collect().foreach { r =>
      val grams = r.getSeq[Long](1)
      val wins = grams.sliding(2).map(_.min).toSeq.distinct
      val fp = r.getStruct(0)
      assert(fp.getLong(0) == grams.size)
      assert(fp.getLong(1) == wins.size)
      assert(fp.getLong(2) == wins.min && fp.getLong(3) == wins.max)
      assert(fp.getLong(4) == wins.reduce(_ ^ _))
    }
  }

  test("shorter than w grams yields NULL; the query's length filter excludes it") {
    val r = spark.sql("SELECT graft_winnow('abcdefghij', 8, 4) AS fp").head()
    assert(r.isNullAt(0)) // 10 chars -> 3 grams < w=4
  }

  test("t04's plan evaluates the winnow expression once, not per struct field") {
    val plan = SparkEntry.queries("t04_fingerprint")(spark, sfDir)
      .queryExecution.optimizedPlan
    val n = plan.collect { case node =>
      node.expressions.map(_.collect { case w: WinnowFingerprint => w }.size).sum
    }.sum
    assert(n == 1, s"expected exactly 1 WinnowFingerprint in the optimized plan, saw $n")
  }
}
