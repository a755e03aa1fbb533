package graft

import graft.ops.QualityOps
import graft.ops.QualityOps.Check
import org.apache.spark.sql.functions._

/** Data-quality layer (ds10 profile / ds11 constraint suite): semantic
  * edges the DuckDB gate alone wouldn't pin — null handling, mixed
  * types, pass/fail boundary behavior, the one-job plan shape. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "a", Some(1.0), "2024-01-01 00:00:00"),
    (2L, "b", Some(2.5), "2024-01-02 00:00:00"),
    (3L, "a", None, "2024-01-03 00:00:00"),
    (4L, null.asInstanceOf[String], Some(-3.0), null.asInstanceOf[String]))
    .toDF("id", "cat", "v", "tss")
    .withColumn("ts", col("tss").cast("timestamp")).drop("tss")

  test("profileOf: counts, null fraction, distincts, typed min/max routing") {
    val p = QualityOps.profileOf(df, Seq("id", "cat", "v", "ts"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "cat", "v", "ts"))

    val id = p("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 4)          // n_rows, n_nonnull
    assert(id.getDouble(3) == 0.0 && id.getLong(4) == 4)      // null_frac, n_distinct
    assert(id.getDouble(5) == 1.0 && id.getDouble(6) == 4.0)  // numeric min/max
    assert(id.isNullAt(7) && id.isNullAt(8))                  // no string min/max

    val cat = p("cat")
    assert(cat.getLong(2) == 3 && cat.getDouble(3) == 0.25 && cat.getLong(4) == 2)
    assert(cat.isNullAt(5) && cat.isNullAt(6))                // no numeric min/max
    assert(cat.getString(7) == "a" && cat.getString(8) == "b")

    val v = p("v")
    assert(v.getLong(2) == 3 && v.getDouble(5) == -3.0 && v.getDouble(6) == 2.5)

    val ts = p("ts") // timestamps profile as epoch-ms doubles
    assert(ts.getLong(2) == 3 && ts.getDouble(5) == 1.7040672e12)
  }

  test("profileOf: approx mode keeps the same shape, rejects unknown columns") {
    val p = QualityOps.profileOf(df, Seq("id"), exactDistinct = false).collect()
    assert(p.length == 1 && p(0).getLong(4) >= 3) // HLL++ near 4
    intercept[IllegalArgumentException](QualityOps.profileOf(df, Seq("nope")))
    intercept[IllegalArgumentException](QualityOps.profileOf(df, Seq.empty))
  }

  test("checkConstraintsOf: boundary is inclusive both directions; report never throws") {
    val out = QualityOps.checkConstraintsOf(df, Seq(
      Check("rows_ge_4", count(lit(1)).cast("double"), 4.0),          // == threshold → pass
      Check("rows_ge_5", count(lit(1)).cast("double"), 5.0),          // fail
      Check("nullfrac_le_quarter",
        (count(lit(1)) - count(col("v"))) / count(lit(1)).cast("double"),
        0.25, atLeast = false),                                        // == threshold → pass
      Check("max_v_le_2", max(col("v")), 2.0, atLeast = false)))       // 2.5 > 2 → fail
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(out == Map(
      "rows_ge_4" -> true, "rows_ge_5" -> false,
      "nullfrac_le_quarter" -> true, "max_v_le_2" -> false))
    intercept[IllegalArgumentException](QualityOps.checkConstraintsOf(df, Seq.empty))
    intercept[IllegalArgumentException](QualityOps.checkConstraintsOf(df,
      Seq(Check("dup", count(lit(1)), 1.0), Check("dup", count(lit(1)), 2.0))))
  }

  test("both operators are one aggregation job: no joins, no extra shuffles") {
    val plan = QualityOps.profileOf(df, Seq("id", "cat", "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    val plan2 = QualityOps.checkConstraintsOf(df,
      Seq(Check("a", count(lit(1)), 1.0), Check("b", max(col("v")), 0.0)))
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("Join"))
  }
}
