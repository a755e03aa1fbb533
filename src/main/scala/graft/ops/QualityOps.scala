package graft.ops

import graft.{F, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality profiling + constraint validation (SURVEY.md §2
  * ds10/ds11) — the pre-training sanity layer every 100 TB ingest runs
  * before any downstream job: per-column statistics (the pandas
  * `describe` / Deequ `ColumnProfiler` shape, reference analog: the
  * ad-hoc `validate_data` checks in the ClickHouse backend,
  * crypto_data_pipline_clickhouse.py:1697-1786) and a declarative
  * expectation suite (the Deequ/Great-Expectations shape) evaluated in
  * ONE aggregation pass.
  *
  * Scale stance: both operators are a single scan + a single aggregate
  * over a 1-row (or k-row) result — nothing row-sized ever shuffles.
  * The only caveat is [[profileOf]]'s EXACT distinct counts: k exact
  * `count_distinct`s plan one Expand (k× row amplification into the
  * partial agg). That is the oracle-checkable form; at 100 TB swap
  * `exactDistinct = false` — `approx_count_distinct` (HLL++) keeps a
  * constant-size buffer per column with NO Expand, the a01 trade.
  */
object QualityOps {
  type Q = (SparkSession, String) => DataFrame
  import Tables.t
  import F._

  /** Per-column profile over ANY table (public operator behind
    * [[graft.Graft.profileTable]]): one row per requested column with
    * row count, non-null count, null fraction, distinct count and
    * min/max. Numeric + timestamp columns report min/max as doubles
    * (`min_num`/`max_num`, timestamps as epoch-ms); string/other
    * columns as strings (`min_str`/`max_str`) — never a double
    * formatted into a string (engine-dependent text). ONE aggregate
    * job for every column: the per-column structs are assembled from a
    * single global agg row and exploded driver-free. */
  def profileOf(df: DataFrame, cols: Seq[String], exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profileOf needs at least one column")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(types.contains(c), s"profileOf: no such column '$c'"))

    def asNum(c: String): Option[Column] = types(c) match {
      case _: NumericType => Some(col(c).cast("double"))
      case _: TimestampType => Some(epochMs(col(c)).cast("double"))
      case BooleanType => Some(col(c).cast("int").cast("double"))
      case _ => None
    }
    val aggs: Seq[Column] = cols.flatMap { c =>
      val nd = if (exactDistinct) count_distinct(col(c)) else approx_count_distinct(c)
      Seq(
        count(col(c)).as(s"__nn_$c"),
        nd.as(s"__dc_$c"),
        asNum(c).map(n => min(n)).getOrElse(lit(null).cast("double")).as(s"__mn_$c"),
        asNum(c).map(n => max(n)).getOrElse(lit(null).cast("double")).as(s"__mx_$c"),
        (if (asNum(c).isEmpty) min(col(c).cast("string")) else lit(null).cast("string")).as(s"__ms_$c"),
        (if (asNum(c).isEmpty) max(col(c).cast("string")) else lit(null).cast("string")).as(s"__xs_$c"))
    }
    val one = df.groupBy().agg(count(lit(1)).as("__n"), aggs: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"),
        ((col("__n") - col(s"__nn_$c")) / col("__n").cast("double")).as("null_frac"),
        col(s"__dc_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_num"), col(s"__mx_$c").as("max_num"),
        col(s"__ms_$c").as("min_str"), col(s"__xs_$c").as("max_str"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /** One declarative data-quality expectation: `metric` is ANY
    * aggregate expression producing a double in [whatever the check
    * means]; the check passes when metric ≥ `threshold` (or ≤ when
    * `atLeast = false`). */
  final case class Check(name: String, metric: Column, threshold: Double,
                         atLeast: Boolean = true)

  /** Constraint-suite validation over ANY table (public operator
    * behind [[graft.Graft.checkConstraints]]): every check's metric is
    * computed in ONE aggregation pass over one scan (the Deequ
    * execution shape), then the k-row report (check, metric,
    * threshold, passed) is exploded from the single agg row. Failing
    * checks don't stop the job — the report is the product; gate on
    * `passed` downstream. */
  def checkConstraintsOf(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "checkConstraintsOf needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "checkConstraintsOf: duplicate check names")
    val aggs = checks.zipWithIndex.map { case (c, i) => c.metric.cast("double").as(s"__m_$i") }
    val one = df.groupBy().agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check_name"),
        col(s"__m_$i").as("metric"),
        lit(c.threshold).as("threshold"),
        (if (c.atLeast) col(s"__m_$i") >= c.threshold else col(s"__m_$i") <= c.threshold)
          .as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** #ds10 profile of the events stream table: ids, timestamps,
    * categorical, payload and value columns in one pass. */
  private val ds10: Q = (s, dir) =>
    profileOf(t(s, dir, "events"),
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        r6(col("null_frac")).as("null_frac"), col("n_distinct"),
        r6(col("min_num")).as("min_num"), r6(col("max_num")).as("max_num"),
        col("min_str"), col("max_str"))
      .orderBy("col_name")

  private def ds10ColSql(c: String, num: Boolean, ts: Boolean): String = {
    val mn =
      if (ts) s"round(CAST(epoch_ms(min($c)) AS DOUBLE), 6)"
      else if (num) s"round(CAST(min($c) AS DOUBLE), 6)"
      else "CAST(NULL AS DOUBLE)"
    val mx =
      if (ts) s"round(CAST(epoch_ms(max($c)) AS DOUBLE), 6)"
      else if (num) s"round(CAST(max($c) AS DOUBLE), 6)"
      else "CAST(NULL AS DOUBLE)"
    val ms = if (num || ts) "CAST(NULL AS VARCHAR)" else s"CAST(min($c) AS VARCHAR)"
    val xs = if (num || ts) "CAST(NULL AS VARCHAR)" else s"CAST(max($c) AS VARCHAR)"
    s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_nonnull,
       |  round((count(*) - count($c)) / CAST(count(*) AS DOUBLE), 6) AS null_frac,
       |  count(DISTINCT $c) AS n_distinct, $mn AS min_num, $mx AS max_num,
       |  $ms AS min_str, $xs AS max_str FROM events""".stripMargin
  }

  private val ds10Sql =
    Seq(
      ds10ColSql("event_id", num = true, ts = false),
      ds10ColSql("ts", num = false, ts = true),
      ds10ColSql("user_id", num = true, ts = false),
      ds10ColSql("event_type", num = false, ts = false),
      ds10ColSql("value", num = true, ts = false),
      ds10ColSql("props", num = false, ts = false))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  /** #ds11 the expectation suite over events: volume, completeness,
    * key uniqueness, categorical domain, value range — the five checks
    * every ingest gate runs, one aggregation pass. */
  private val ds11: Q = (s, dir) => {
    val types = Seq("view", "click", "purchase", "signup", "error")
    checkConstraintsOf(t(s, dir, "events"), Seq(
      Check("row_count_min_1000", count(lit(1)).cast("double"), 1000.0),
      Check("value_complete_99", count(col("value")) / count(lit(1)).cast("double"), 0.99),
      Check("event_id_unique", count_distinct(col("event_id")) / count(lit(1)).cast("double"), 1.0),
      Check("event_type_in_domain",
        sum(when(col("event_type").isin(types: _*), 1).otherwise(0)) / count(lit(1)).cast("double"), 1.0),
      Check("value_in_range",
        sum(when(col("value").between(0.0, 1e6), 1).otherwise(0)) / count(lit(1)).cast("double"), 0.999)))
      .select(col("check_name"), r6(col("metric")).as("metric"), col("threshold"), col("passed"))
      .orderBy("check_name")
  }

  private val ds11Sql =
    """WITH m AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS m0,
      |    count(value) / CAST(count(*) AS DOUBLE) AS m1,
      |    count(DISTINCT event_id) / CAST(count(*) AS DOUBLE) AS m2,
      |    sum(CASE WHEN event_type IN ('view','click','purchase','signup','error') THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) AS m3,
      |    sum(CASE WHEN value BETWEEN 0.0 AND 1000000.0 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) AS m4
      |  FROM events)
      |SELECT check_name, round(metric, 6) AS metric, threshold, metric >= threshold AS passed
      |FROM (
      |  SELECT 'row_count_min_1000' AS check_name, m0 AS metric, 1000.0 AS threshold FROM m
      |  UNION ALL SELECT 'value_complete_99', m1, 0.99 FROM m
      |  UNION ALL SELECT 'event_id_unique', m2, 1.0 FROM m
      |  UNION ALL SELECT 'event_type_in_domain', m3, 1.0 FROM m
      |  UNION ALL SELECT 'value_in_range', m4, 0.999 FROM m)
      |ORDER BY check_name""".stripMargin

  /** Population Stability Index between a reference and a current
    * dataset over one numeric column (public operator behind
    * [[graft.Graft.psiDrift]]) — the distribution-drift gate a
    * dataset refresh runs before retraining (industry rule of thumb:
    * < 0.1 stable, 0.1–0.25 shifting, > 0.25 action):
    * `bins` equal-width buckets over the REFERENCE min/max (out-of-
    * range current values clamp to the edge bins — drift beyond the
    * reference range must count, not vanish), add-1 smoothed shares
    * so empty bins stay finite (deterministic — never an epsilon
    * float), PSI = Σ (p−q)·ln(p/q). Returns one row per bin
    * (lo, hi, counts, shares, contrib) with the total on every row.
    * Each side reduces to ≤bins integer counts map-side; the bin
    * frame is a generated `bins`-row table so EMPTY bins are present;
    * the float contrib folds in BIN order (q31 rule). Two scans, two
    * k-row aggregates, one k-row join — nothing row-sized shuffles. */
  def psiDriftOf(ref: DataFrame, cur: DataFrame, valueCol: String,
                 bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val s = ref.sparkSession
    val stats = ref.agg(min(col(valueCol).cast("double")).as("lo"),
      max(col(valueCol).cast("double")).as("hi"),
      count(col(valueCol)).as("n_ref"))
    def binned(df: DataFrame, cname: String): DataFrame =
      df.select(col(valueCol).cast("double").as("__x"))
        .filter(col("__x").isNotNull)
        .crossJoin(broadcast(stats.select(col("lo"), col("hi"))))
        .withColumn("bin",
          when(col("hi") === col("lo"), lit(0L))
            .otherwise(greatest(lit(0L), least(lit(bins - 1L),
              floor((col("__x") - col("lo")) / ((col("hi") - col("lo")) / bins))))))
        .groupBy("bin").agg(count(lit(1)).as(cname))
    val frame = s.range(bins).select(col("id").as("bin"))
    val ordB = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
    val cumB = ordB.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val allB = ordB.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val nRefT = sum(col("n_ref")).over(allB)
    val nCurT = sum(col("n_cur")).over(allB)
    val p = (col("n_ref").cast("double") + 1.0) / (nRefT.cast("double") + lit(bins.toDouble))
    val q = (col("n_cur").cast("double") + 1.0) / (nCurT.cast("double") + lit(bins.toDouble))
    frame
      .join(binned(ref, "n_ref"), Seq("bin"), "left")
      .join(binned(cur, "n_cur"), Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(broadcast(stats.select(col("lo").as("__lo"), col("hi").as("__hi"))))
      .withColumn("lo", col("__lo") + col("bin") * ((col("__hi") - col("__lo")) / bins))
      .withColumn("hi", col("__lo") + (col("bin") + 1) * ((col("__hi") - col("__lo")) / bins))
      .withColumn("p_ref", p)
      .withColumn("p_cur", q)
      .withColumn("contrib", (col("p_ref") - col("p_cur")) * log(col("p_ref") / col("p_cur")))
      .withColumn("__cpsi", sum(col("contrib")).over(cumB))
      .withColumn("psi", last(col("__cpsi")).over(allB))
      .select(col("bin").cast("long").as("bin"), col("lo"), col("hi"),
        col("n_ref").cast("long").as("n_ref"), col("n_cur").cast("long").as("n_cur"),
        col("p_ref"), col("p_cur"), col("contrib"), col("psi"))
  }

  /** #ds19 PSI drift of documents.n_chars between the even-doc_id
    * half (reference) and the odd half (current) — a deterministic
    * two-version carve of one table (the ds14 rule). */
  private val ds19: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    psiDriftOf(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "n_chars", bins = 10)
      .select(col("bin"), r6(col("lo")).as("lo"), r6(col("hi")).as("hi"),
        col("n_ref"), col("n_cur"),
        r6(col("p_ref")).as("p_ref"), r6(col("p_cur")).as("p_cur"),
        r6(col("contrib")).as("contrib"), r6(col("psi")).as("psi"))
      .orderBy("bin")
  }

  private val ds19Sql =
    """WITH s AS (
      |  SELECT CAST(min(n_chars) AS DOUBLE) AS lo, CAST(max(n_chars) AS DOUBLE) AS hi
      |  FROM documents WHERE doc_id % 2 = 0),
      |rb AS (
      |  SELECT CASE WHEN s.hi = s.lo THEN CAST(0 AS BIGINT)
      |      ELSE greatest(CAST(0 AS BIGINT), least(CAST(9 AS BIGINT),
      |        CAST(floor((CAST(n_chars AS DOUBLE) - s.lo) / ((s.hi - s.lo) / 10)) AS BIGINT))) END AS bin,
      |    count(*) AS n_ref
      |  FROM documents, s WHERE doc_id % 2 = 0 GROUP BY 1),
      |cb AS (
      |  SELECT CASE WHEN s.hi = s.lo THEN CAST(0 AS BIGINT)
      |      ELSE greatest(CAST(0 AS BIGINT), least(CAST(9 AS BIGINT),
      |        CAST(floor((CAST(n_chars AS DOUBLE) - s.lo) / ((s.hi - s.lo) / 10)) AS BIGINT))) END AS bin,
      |    count(*) AS n_cur
      |  FROM documents, s WHERE doc_id % 2 = 1 GROUP BY 1),
      |f AS (
      |  SELECT CAST(unnest(generate_series(0, 9)) AS BIGINT) AS bin),
      |j AS (
      |  SELECT f.bin,
      |    coalesce(rb.n_ref, 0) AS n_ref, coalesce(cb.n_cur, 0) AS n_cur
      |  FROM f LEFT JOIN rb ON rb.bin = f.bin LEFT JOIN cb ON cb.bin = f.bin),
      |w AS (
      |  SELECT j.bin, j.n_ref, j.n_cur, s.lo AS glo, s.hi AS ghi,
      |    sum(j.n_ref) OVER () AS tr, sum(j.n_cur) OVER () AS tc
      |  FROM j, s),
      |v AS (
      |  SELECT bin,
      |    glo + bin * ((ghi - glo) / 10) AS lo,
      |    glo + (bin + 1) * ((ghi - glo) / 10) AS hi,
      |    n_ref, n_cur,
      |    (CAST(n_ref AS DOUBLE) + 1.0) / (CAST(tr AS DOUBLE) + 10.0) AS p_ref,
      |    (CAST(n_cur AS DOUBLE) + 1.0) / (CAST(tc AS DOUBLE) + 10.0) AS p_cur
      |  FROM w),
      |c AS (
      |  SELECT bin, lo, hi, n_ref, n_cur, p_ref, p_cur,
      |    (p_ref - p_cur) * ln(p_ref / p_cur) AS contrib,
      |    sum((p_ref - p_cur) * ln(p_ref / p_cur))
      |      OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpsi
      |  FROM v)
      |SELECT bin, round(lo, 6) AS lo, round(hi, 6) AS hi,
      |  CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
      |  round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
      |  round(contrib, 6) AS contrib,
      |  round(last_value(cpsi) OVER (ORDER BY bin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6) AS psi
      |FROM c
      |ORDER BY bin""".stripMargin

  val queries: Map[String, Q] = Map(
    "ds10_profile" -> ds10,
    "ds11_checks" -> ds11,
    "ds19_psi_drift" -> ds19)

  val oracle: Map[String, String] = Map(
    "ds10_profile" -> ds10Sql,
    "ds11_checks" -> ds11Sql,
    "ds19_psi_drift" -> ds19Sql)
}
