package graft.ops

import graft.{F, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream (SURVEY.md §2 #19m/#19n)
  * — the funnel/retention queries every event pipeline ships alongside
  * the reference's time-series surface (the user_id/event_type shape of
  * the events table IS the app-analytics schema).
  *
  * Scale stance: both operators reduce the event log to per-user
  * aggregates FIRST (user-cardinality-sized tables), then join/roll up
  * on the user key — the raw log is never joined against itself; every
  * join key is the same `user` column so one hash partitioning serves
  * the chain. Counts are longs; rates are long/long divisions at the
  * output boundary (bit-exact in any engine).
  */
object BehaviorOps {
  type Q = (SparkSession, String) => DataFrame
  import Tables.t
  import F._

  /** Ordered conversion funnel over ANY (user, type, time) event table
    * (public operator behind [[graft.Graft.funnel]]): step i counts
    * users whose FIRST step-i event at-or-after their step-(i−1) entry
    * exists — min-timestamp chaining, the strict "progress through the
    * funnel in order" semantics (an early purchase before any view does
    * NOT count step 3). Returns one row per step: (step, step_name,
    * n_users, conv_from_prev, conv_from_first).
    *
    * Each stage is one filter + per-user min aggregation joined on the
    * user key against the previous stage's user-sized table.
    *
    * LAZY and single-action: the stage tables are tagged with their step
    * index, unioned, and counted in ONE groupBy — no per-stage driver
    * `count()` loop, so an S-step funnel is one Spark action however
    * large S gets. Shared stage subtrees across the union branches
    * collapse via exchange reuse, so each stage aggregate still computes
    * once. A step no user reached yields n_users = 0 (left join against
    * the step spine) and conversions are pinned to 0.0 — never NaN —
    * when the divisor step is empty. */
  def funnelOf(events: DataFrame, userCol: String, typeCol: String,
               tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.select(col(userCol).as("__u"), col(typeCol).as("__t"),
      epochMs(col(tsCol)).as("__ms"))
    // stage tables: (user, entry_ms) for users that reached the step
    val entries = steps.foldLeft(Vector.empty[DataFrame]) { (acc, step) =>
      val mine = ev.filter(col("__t") === step)
      acc :+ (acc.lastOption match {
        case None => mine.groupBy("__u").agg(min(col("__ms")).as("__entry"))
        case Some(p) => mine
          .join(p.select(col("__u"), col("__entry").as("__pentry")), "__u")
          .filter(col("__ms") >= col("__pentry"))
          .groupBy("__u").agg(min(col("__ms")).as("__entry"))
      })
    }
    val counts = entries.zipWithIndex
      .map { case (df, i) => df.select(lit(i + 1).as("step"), col("__u")) }
      .reduce(_ unionByName _)
      .groupBy("step").agg(count(lit(1)).as("__n"))
    val spine = steps.zipWithIndex.map { case (s, i) => (i + 1, s) }
      .toDF("step", "step_name")
    val base = spine.join(broadcast(counts), Seq("step"), "left")
      .withColumn("n_users", coalesce(col("__n"), lit(0L)))
    val prev = base.select((col("step") + 1).as("step"), col("n_users").as("__prev"))
    val frst = base.filter(col("step") === 1).select(col("n_users").as("__first"))
    base.join(broadcast(prev), Seq("step"), "left")
      .crossJoin(broadcast(frst)) // 1-row build side: documented BNLJ
      .select(col("step"), col("step_name"), col("n_users"),
        when(col("step") === 1, lit(1.0))
          .when(col("__prev") > 0, col("n_users").cast("double") / col("__prev"))
          .otherwise(lit(0.0)).as("conv_from_prev"),
        when(col("__first") > 0, col("n_users").cast("double") / col("__first"))
          .otherwise(lit(0.0)).as("conv_from_first"))
  }

  /** #19m the view → click → purchase funnel on the events table. */
  private val q50: Q = (s, dir) =>
    funnelOf(t(s, dir, "events"), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .select(col("step"), col("step_name"), col("n_users"),
        r6(col("conv_from_prev")).as("conv_from_prev"),
        r6(col("conv_from_first")).as("conv_from_first"))
      .orderBy("step")

  private val q50Sql =
    """WITH e AS (SELECT user_id AS u, event_type AS t, epoch_ms(ts) AS ms FROM events),
      |s1 AS (SELECT u, min(ms) AS entry FROM e WHERE t = 'view' GROUP BY u),
      |s2 AS (SELECT e.u, min(e.ms) AS entry FROM e JOIN s1 ON e.u = s1.u
      |  WHERE e.t = 'click' AND e.ms >= s1.entry GROUP BY e.u),
      |s3 AS (SELECT e.u, min(e.ms) AS entry FROM e JOIN s2 ON e.u = s2.u
      |  WHERE e.t = 'purchase' AND e.ms >= s2.entry GROUP BY e.u),
      |c AS (SELECT (SELECT count(*) FROM s1) AS n1,
      |             (SELECT count(*) FROM s2) AS n2,
      |             (SELECT count(*) FROM s3) AS n3)
      |SELECT * FROM (
      |  SELECT 1 AS step, 'view' AS step_name, n1 AS n_users,
      |    round(1.0, 6) AS conv_from_prev, round(1.0, 6) AS conv_from_first FROM c
      |  UNION ALL SELECT 2, 'click', n2,
      |    round(CAST(n2 AS DOUBLE) / n1, 6), round(CAST(n2 AS DOUBLE) / n1, 6) FROM c
      |  UNION ALL SELECT 3, 'purchase', n3,
      |    round(CAST(n3 AS DOUBLE) / n2, 6), round(CAST(n3 AS DOUBLE) / n1, 6) FROM c)
      |ORDER BY step""".stripMargin

  /** Retention cohorts over ANY (user, time) activity table (public
    * operator behind [[graft.Graft.retention]]): cohort = the user's
    * first active period (day-truncated), cell (cohort, k) = users
    * active k periods later, retention = cell / cohort size. Returns
    * (cohort_ms, k, n_active, n_cohort, retention) for 0 ≤ k ≤ maxK.
    *
    * Distinct (user, period) activity joins the user-sized first-day
    * table on the user key; both inputs derive from ONE pass over the
    * log. Day truncation is floor-mod (`pmod`), so pre-epoch timestamps
    * truncate toward -∞ like any other day. */
  def retentionOf(events: DataFrame, userCol: String, tsCol: String,
                  maxK: Int): DataFrame = {
    require(maxK >= 1, s"maxK must be >= 1, got $maxK")
    val dayMs = 86400000L
    val act = events
      .select(col(userCol).as("__u"),
        (epochMs(col(tsCol)) - pmod(epochMs(col(tsCol)), lit(dayMs))).as("__day"))
      .distinct()
    val first = act.groupBy("__u").agg(min(col("__day")).as("cohort_ms"))
    val cohortSize = first.groupBy("cohort_ms").agg(count(lit(1)).as("n_cohort"))
    act.join(first, "__u")
      .withColumn("k", ((col("__day") - col("cohort_ms")) / dayMs).cast("int"))
      .filter(col("k") <= maxK)
      .groupBy(col("cohort_ms"), col("k")).agg(count(lit(1)).as("n_active"))
      .join(cohortSize, "cohort_ms")
      .withColumn("retention", col("n_active") / col("n_cohort").cast("double"))
  }

  /** #19n day-cohort retention, k ≤ 7, over the events table. */
  private val q51: Q = (s, dir) =>
    retentionOf(t(s, dir, "events"), "user_id", "ts", maxK = 7)
      .select(col("cohort_ms"), col("k"), col("n_active"), col("n_cohort"),
        r6(col("retention")).as("retention"))
      .orderBy("cohort_ms", "k")

  // day truncation uses the FLOOR-mod form (pmod's semantics): DuckDB's
  // bare % returns negative remainders for pre-epoch timestamps, which
  // would diverge from Spark's pmod — identical on post-1970 data, but
  // the oracle states the same function, not a lookalike
  private val q51Sql =
    """WITH act AS (SELECT DISTINCT user_id AS u,
      |    epoch_ms(ts) - ((epoch_ms(ts) % 86400000 + 86400000) % 86400000) AS day
      |  FROM events),
      |first AS (SELECT u, min(day) AS cohort_ms FROM act GROUP BY u),
      |sz AS (SELECT cohort_ms, count(*) AS n_cohort FROM first GROUP BY cohort_ms),
      |cells AS (
      |  SELECT f.cohort_ms, CAST((a.day - f.cohort_ms) // 86400000 AS INT) AS k,
      |    count(*) AS n_active
      |  FROM act a JOIN first f ON a.u = f.u
      |  WHERE (a.day - f.cohort_ms) // 86400000 <= 7
      |  GROUP BY 1, 2)
      |SELECT c.cohort_ms, c.k, c.n_active, sz.n_cohort,
      |  round(c.n_active / CAST(sz.n_cohort AS DOUBLE), 6) AS retention
      |FROM cells c JOIN sz USING (cohort_ms)
      |ORDER BY cohort_ms, k""".stripMargin

  /** Event-type transition matrix over ANY (user, time, type) event
    * table (public operator behind [[graft.Graft.transitions]]): per
    * user in (ts, id) order, each consecutive event pair contributes
    * one (from_type, to_type) edge; returns the edge counts and the
    * row-stochastic probability p = n(from→to) / n(from→·) — the
    * first-order Markov chain funnel/retention's fixed steps can't
    * see (where do users actually GO next?).
    *
    * One user-key window pass (lead) + one (from, to) count agg; the
    * probability normalizer is a window sum over the ≤ |types|² count
    * rows. Counts are longs; p is one long/long division at the output
    * boundary — bit-exact in any engine at any parallelism. */
  def transitionsOf(events: DataFrame, userCol: String, tsCol: String,
                    idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__t"), col("__id"))
    events
      .select(col(userCol).as("__u"), col(tsCol).as("__t"),
        col(idCol).as("__id"), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("p", col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(Window.partitionBy(col("from_type"))))
  }

  /** #q55 event-type transition matrix over the events table. */
  private val q55: Q = (s, dir) =>
    transitionsOf(t(s, dir, "events"), "user_id", "ts", "event_id", "event_type")
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        r6(col("p")).as("p"))
      .orderBy("from_type", "to_type")

  private val q55Sql =
    """WITH e AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS to_type
      |  FROM events),
      |c AS (SELECT from_type, to_type, count(*) AS n_transitions
      |  FROM e WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n_transitions,
      |  round(CAST(n_transitions AS DOUBLE) /
      |    sum(n_transitions) OVER (PARTITION BY from_type), 6) AS p
      |FROM c
      |ORDER BY from_type, to_type""".stripMargin

  /** Rolling k-day distinct active users (public operator behind
    * [[graft.Graft.rollingActive]]): per observed activity day d, the
    * count of distinct users active in (d−k+1 .. d] — the trailing
    * WAU/MAU curve. Returns (day_ms, n_active).
    *
    * Scale stance: sliding-window COUNT DISTINCT never runs as a
    * distinct-per-frame window (O(k) re-scan per row) or a range
    * self-join. The distinct (user, day) activity set fans each row
    * out to the ≤ k window-end days it covers (map-side ×k explode —
    * membership in "active within k days of d" is exactly "d within
    * k days after an active day"), one distinct collapses overlapping
    * coverage, one count per day. Day truncation is the q51 floor-mod
    * (epoch-ms longs — no calendar/timezone in the hot path); output
    * days are restricted to observed activity days via a broadcast
    * day-set semi-join. Integer counts ⇒ bit-exact. */
  def rollingActiveOf(events: DataFrame, userCol: String, tsCol: String,
                      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dayMs = 86400000L
    val act = events
      .select(col(userCol).as("__u"),
        (epochMs(col(tsCol)) - pmod(epochMs(col(tsCol)), lit(dayMs))).as("__day"))
      .distinct()
    val days = act.select(col("__day").as("day_ms")).distinct()
    act
      .select(col("__u"), explode(sequence(col("__day"),
        col("__day") + lit((k - 1) * dayMs), lit(dayMs))).as("day_ms"))
      .distinct()
      .join(broadcast(days), "day_ms")
      .groupBy(col("day_ms")).agg(count(lit(1)).as("n_active"))
  }

  /** #q57 trailing 7-day distinct actives per observed day. */
  private val q57: Q = (s, dir) =>
    rollingActiveOf(t(s, dir, "events"), "user_id", "ts", k = 7)
      .orderBy("day_ms")

  private val q57Sql =
    """WITH act AS (SELECT DISTINCT user_id AS u,
      |    epoch_ms(ts) - ((epoch_ms(ts) % 86400000 + 86400000) % 86400000) AS day
      |  FROM events),
      |days AS (SELECT DISTINCT day FROM act)
      |SELECT days.day AS day_ms, count(DISTINCT a.u) AS n_active
      |FROM days JOIN act a
      |  ON a.day BETWEEN days.day - 6 * 86400000 AND days.day
      |GROUP BY 1
      |ORDER BY day_ms""".stripMargin

  /** Top session journeys over ANY (user, time, type) event table
    * (public operator behind [[graft.Graft.topPaths]]): gap-sessionize
    * per user (new session when the gap exceeds `gapMs`), take each
    * session's first `k` event types in (ts, id) total order, join
    * them into a `path` string ("view>click>purchase"), and count
    * sessions per path — the journey-frequency table transition
    * matrices (q55) summarize one edge at a time.
    *
    * Two window passes on the user key (session ids = cumulative sum
    * of gap flags, then per-session row numbers) + one path-count agg;
    * ≤ k rows per session ever reach the aggregate. The path string
    * assembles via array_sort(collect_list(struct(ts, id, type))) —
    * collect order is nondeterministic, the sort restores the total
    * order, so the result is partitioning-invariant. */
  def topPathsOf(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, typeCol: String, gapMs: Long, k: Int): DataFrame = {
    require(gapMs > 0, s"gapMs must be > 0, got $gapMs")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col("__u")).orderBy(col("__t"), col("__id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("__t"), 1).over(w)
    val sess = events
      .select(col(userCol).as("__u"), epochMs(col(tsCol)).as("__t"),
        col(idCol).as("__id"), col(typeCol).as("__et"))
      .withColumn("ns", when(prev.isNull || col("__t") - prev > gapMs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(cum))
    val wS = Window.partitionBy(col("__u"), col("sid")).orderBy(col("__t"), col("__id"))
    sess
      .withColumn("rn", row_number().over(wS))
      .filter(col("rn") <= k)
      .groupBy(col("__u"), col("sid"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__t").as("t"), col("__id").as("i"),
          col("__et").as("et")))), x => x.getField("et")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
  }

  /** #q58 session journeys: first 3 event types per 30-min-gap session. */
  private val q58: Q = (s, dir) =>
    topPathsOf(t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
      gapMs = 1800000L, k = 3)
      .orderBy("path")

  private val q58Sql =
    """WITH e AS (SELECT user_id AS u, epoch_ms(ts) AS t, event_id AS eid,
      |    event_type AS et FROM events),
      |s AS (SELECT *, CASE WHEN lag(t) OVER o IS NULL
      |      OR t - lag(t) OVER o > 1800000 THEN 1 ELSE 0 END AS ns
      |  FROM e WINDOW o AS (PARTITION BY u ORDER BY t, eid)),
      |s2 AS (SELECT *, sum(ns) OVER (PARTITION BY u ORDER BY t, eid
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM s),
      |r AS (SELECT *, row_number() OVER (PARTITION BY u, sid ORDER BY t, eid) AS rn
      |  FROM s2),
      |p AS (SELECT u, sid, string_agg(et, '>' ORDER BY t, eid) AS path
      |  FROM r WHERE rn <= 3 GROUP BY u, sid)
      |SELECT path, count(*) AS n_sessions
      |FROM p GROUP BY path
      |ORDER BY path""".stripMargin

  /** Per-entity Shannon entropy of a categorical column (public
    * operator behind [[graft.Graft.behaviorEntropy]]) — how varied is
    * each user's behavior: H = −Σ p·ln p over the entity's category
    * distribution, plus the 0..1 normalized form H/ln(k). The log
    * reduces per (entity, category) to integer counts FIRST; the float
    * entropy fold runs in CATEGORY order (cumulative + last row — the
    * q33 rule) over the ≤k category rows per entity, so the result is
    * bit-identical at any parallelism. Single-category entities have
    * H = 0 and null normalized form. */
  def behaviorEntropyOf(df: DataFrame, entity: String, category: String): DataFrame = {
    val ord = Window.partitionBy(col(entity)).orderBy(col(category))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val p = col("__c").cast("double") / col("__n").cast("double")
    df.groupBy(col(entity), col(category)).agg(count(lit(1)).as("__c"))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(entity))))
      .withColumn("__h", sum(-p * log(p)).over(cum))
      .withColumn("__k", count(lit(1)).over(Window.partitionBy(col(entity))))
      .withColumn("__last", lead(col(category), 1).over(ord).isNull)
      .filter(col("__last"))
      .select(col(entity), col("__n").cast("long").as("n_events"),
        col("__k").cast("long").as("n_types"),
        last(col("__h")).over(allW).as("entropy"),
        when(col("__k") >= 2,
          last(col("__h")).over(allW) / log(col("__k").cast("double")))
          .as("norm_entropy"))
  }

  /** #q84 per-user event-type entropy. */
  private val q84: Q = (s, dir) =>
    behaviorEntropyOf(t(s, dir, "events"), "user_id", "event_type")
      .select(col("user_id"), col("n_events"), col("n_types"),
        r6(col("entropy")).as("entropy"), r6(col("norm_entropy")).as("norm_entropy"))
      .orderBy("user_id")

  private val q84Sql =
    """WITH c AS (
      |  SELECT user_id, event_type, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT user_id, event_type, c,
      |    sum(c) OVER (PARTITION BY user_id) AS n,
      |    count(*) OVER (PARTITION BY user_id) AS k
      |  FROM c),
      |h AS (
      |  SELECT user_id, n, k,
      |    sum(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
      |      * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))) OVER o AS ch,
      |    lead(event_type, 1) OVER po IS NULL AS is_last
      |  FROM w
      |  WINDOW po AS (PARTITION BY user_id ORDER BY event_type),
      |    o AS (PARTITION BY user_id ORDER BY event_type
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT user_id, CAST(n AS BIGINT) AS n_events, CAST(k AS BIGINT) AS n_types,
      |  round(ch, 6) AS entropy,
      |  round(CASE WHEN k >= 2 THEN ch / ln(CAST(k AS DOUBLE)) END, 6) AS norm_entropy
      |FROM h WHERE is_last
      |ORDER BY user_id""".stripMargin

  /** Per-entity inter-event timing profile (public operator behind
    * [[graft.Graft.interEventStats]]): gaps between consecutive events
    * in epoch-ms (INTEGER arithmetic end to end — sums, min/max, and
    * Σgap² all exact, the variance expression the only float op), the
    * cadence fingerprint bot/burst detection reads. One window
    * shuffle on the entity key; entities with < 2 events are absent
    * (no gaps — contract). Σgap² runs in decimal(38,0) (the q64 rule:
    * exact at any parallelism, no long overflow). */
  def interEventStatsOf(df: DataFrame, entity: String, ts: String): DataFrame = {
    val ord = Window.partitionBy(col(entity)).orderBy(col("__t"))
    val nD = col("n_gaps").cast("double")
    df.select(col(entity), epochMs(col(ts)).as("__t"))
      .withColumn("__g", col("__t") - lag(col("__t"), 1).over(ord))
      .filter(col("__g").isNotNull)
      .groupBy(col(entity))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__g")).as("__sg"),
        sum(col("__g").cast("decimal(38,0)") * col("__g").cast("decimal(38,0)")).as("__sg2"),
        min(col("__g")).as("min_gap_ms"),
        max(col("__g")).as("max_gap_ms"))
      .select(col(entity), col("n_gaps"),
        col("__sg").cast("long").as("total_ms"),
        (col("__sg").cast("double") / nD).as("mean_gap_ms"),
        // variance clamped at 0: the double cast of the exact decimal
        // sums can cancel slightly negative for huge near-constant
        // gaps — sd must read 0 there, never NaN (same clamp in q85Sql)
        when(col("n_gaps") >= 2,
          sqrt(greatest(lit(0.0), (col("__sg2").cast("double") -
            col("__sg").cast("double") * col("__sg").cast("double") / nD) / nD)))
          .as("sd_gap_ms"),
        col("min_gap_ms").cast("long").as("min_gap_ms"),
        col("max_gap_ms").cast("long").as("max_gap_ms"))
  }

  /** #q85 per-user inter-event timing. */
  private val q85: Q = (s, dir) =>
    interEventStatsOf(t(s, dir, "events"), "user_id", "ts")
      .select(col("user_id"), col("n_gaps"), col("total_ms"),
        r4(col("mean_gap_ms")).as("mean_gap_ms"),
        r4(col("sd_gap_ms")).as("sd_gap_ms"),
        col("min_gap_ms"), col("max_gap_ms"))
      .orderBy("user_id")

  private val q85Sql =
    """WITH g AS (
      |  SELECT user_id,
      |    epoch_ms(ts) - lag(epoch_ms(ts), 1)
      |      OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) AS g
      |  FROM events),
      |a AS (
      |  SELECT user_id, count(*) AS n,
      |    sum(g) AS sg,
      |    sum(CAST(g AS DECIMAL(38,0)) * CAST(g AS DECIMAL(38,0))) AS sg2,
      |    min(g) AS mn, max(g) AS mx
      |  FROM g WHERE g IS NOT NULL GROUP BY 1)
      |SELECT user_id, CAST(n AS BIGINT) AS n_gaps, CAST(sg AS BIGINT) AS total_ms,
      |  round(CAST(sg AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_gap_ms,
      |  round(CASE WHEN n >= 2 THEN
      |    sqrt(greatest(0.0, (CAST(sg2 AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
      |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))) END, 4) AS sd_gap_ms,
      |  CAST(mn AS BIGINT) AS min_gap_ms, CAST(mx AS BIGINT) AS max_gap_ms
      |FROM a
      |ORDER BY user_id""".stripMargin

  /** Gini concentration of activity per group (public operator behind
    * [[graft.Graft.giniConcentration]]) — how concentrated is a
    * group's event volume across entities: the standard rank formula
    * G = (2·Σᵢ i·cᵢ − (n+1)·Σc) / (n·Σc) over entities sorted by
    * (count, entity). EVERYTHING except the final division is INTEGER
    * arithmetic — no float fold discipline needed at all; ties broken
    * by entity id so ranks are total-ordered in both engines. 0 =
    * perfectly even, →1 = one entity dominates. One aggregate + one
    * window on the group key over the entity-sized table. */
  def giniConcentrationOf(df: DataFrame, group: String, entity: String): DataFrame = {
    val ord = Window.partitionBy(col(group)).orderBy(col("__c"), col("__e"))
    val grp = Window.partitionBy(col(group))
    val nD = col("n_entities").cast("double")
    val totD = col("total").cast("double")
    df.groupBy(col(group), col(entity).as("__e")).agg(count(lit(1)).as("__c"))
      .withColumn("__i", row_number().over(ord).cast("long"))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_entities"),
        sum(col("__c")).as("total"),
        sum(col("__i") * col("__c")).as("__ic"))
      .select(col(group), col("n_entities"), col("total").cast("long").as("total"),
        when(col("n_entities") >= 2 && col("total") > 0,
          (lit(2.0) * col("__ic").cast("double") - (nD + 1.0) * totD) / (nD * totD))
          .as("gini"))
  }

  /** #q86 Gini concentration of user activity per event type. */
  private val q86: Q = (s, dir) =>
    giniConcentrationOf(t(s, dir, "events"), "event_type", "user_id")
      .select(col("event_type"), col("n_entities"), col("total"),
        r6(col("gini")).as("gini"))
      .orderBy("event_type")

  private val q86Sql =
    """WITH c AS (
      |  SELECT event_type, user_id, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, c,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY c, user_id) AS BIGINT) AS i
      |  FROM c),
      |a AS (
      |  SELECT event_type, count(*) AS n, sum(c) AS tot, sum(i * c) AS ic
      |  FROM r GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_entities, CAST(tot AS BIGINT) AS total,
      |  round(CASE WHEN n >= 2 AND tot > 0 THEN
      |    (2.0 * CAST(ic AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(tot AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)) END, 6) AS gini
      |FROM a
      |ORDER BY event_type""".stripMargin

  /** Kaplan–Meier churn survival over ANY (entity, time) activity log
    * (public operator behind [[graft.Graft.survival]]) — the
    * time-to-churn curve next to [[retentionOf]]'s calendar cohorts:
    * per entity, lifetime = last active day − first active day;
    * entities still active within `censorDays` of the corpus' last day
    * are CENSORED (their true lifetime is unknown — dropping them
    * would bias survival down, counting them as churned would bias it
    * up; KM handles them exactly). Per lifetime level k:
    * n_at_risk = entities with lifetime ≥ k, n_churned = churned
    * entities ending at k, hazard = churned/at-risk, and
    * S(k) = Π_{i≤k} (1 − hazard_i) — realized as exp(Σ ln(1−h)) in
    * BOTH engines (identical op sequence; a level with hazard = 1
    * pins S to exactly 0 from there on via an integer flag, never
    * ln(0)). Day truncation is the q51 floor-mod rule. Everything up
    * to hazard is INTEGER arithmetic; the level table is
    * lifetime-span-sized (the deliberate k-row single partition,
    * ds18 rule); the corpus max day rides one broadcast row. */
  def survivalOf(events: DataFrame, entity: String, ts: String,
                 censorDays: Int): DataFrame = {
    require(censorDays >= 0, s"censorDays must be >= 0, got $censorDays")
    val dayMs = 86400000L
    val day = ((epochMs(col(ts)) - pmod(epochMs(col(ts)), lit(dayMs))) / lit(dayMs)).cast("long")
    val per = events.select(col(entity).as("__u"), day.as("__d"))
      .groupBy("__u").agg(min(col("__d")).as("__f"), max(col("__d")).as("__l"))
    val lv = per
      .crossJoin(broadcast(per.agg(max(col("__l")).as("__mx")))) // 1-row build side
      .withColumn("k", col("__l") - col("__f"))
      .withColumn("__ch", col("__l") < col("__mx") - censorDays)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("__end"),
        sum(when(col("__ch"), 1L).otherwise(0L)).as("n_churned"))
    val ord = Window.orderBy(col("k"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    lv
      .withColumn("__tot", sum(col("__end")).over(all))
      .withColumn("__cend", sum(col("__end")).over(cum))
      .withColumn("n_at_risk", col("__tot") - (col("__cend") - col("__end")))
      .withColumn("n_censored", col("__end") - col("n_churned"))
      .withColumn("hazard", col("n_churned").cast("double") / col("n_at_risk").cast("double"))
      .withColumn("__dead", max(when(col("n_churned") === col("n_at_risk"), 1L)
        .otherwise(0L)).over(cum))
      .withColumn("__cln", sum(when(col("n_churned") === col("n_at_risk"), lit(0.0))
        .otherwise(log(lit(1.0) - col("hazard")))).over(cum))
      .withColumn("survival", when(col("__dead") === 1L, lit(0.0))
        .otherwise(exp(col("__cln"))))
      .select(col("k"), col("n_at_risk").cast("long").as("n_at_risk"),
        col("n_churned").cast("long").as("n_churned"),
        col("n_censored").cast("long").as("n_censored"),
        col("hazard"), col("survival"))
  }

  /** #q91 Kaplan–Meier user-churn survival (3-day censor margin). */
  private val q91: Q = (s, dir) =>
    survivalOf(t(s, dir, "events"), "user_id", "ts", censorDays = 3)
      .select(col("k"), col("n_at_risk"), col("n_churned"), col("n_censored"),
        r6(col("hazard")).as("hazard"), r6(col("survival")).as("survival"))
      .orderBy("k")

  private val q91Sql =
    """WITH e AS (
      |  SELECT user_id AS u,
      |    (epoch_ms(ts) - epoch_ms(ts) % 86400000) // 86400000 AS d
      |  FROM events),
      |per AS (SELECT u, min(d) AS f, max(d) AS l FROM e GROUP BY u),
      |mx AS (SELECT max(l) AS mxl FROM per),
      |lt AS (
      |  SELECT l - f AS k,
      |    count(*) AS nend,
      |    sum(CASE WHEN l < mxl - 3 THEN 1 ELSE 0 END) AS n_churned
      |  FROM per, mx GROUP BY 1),
      |c AS (
      |  SELECT k, nend, n_churned,
      |    sum(nend) OVER () AS tot,
      |    sum(nend) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cend
      |  FROM lt),
      |h AS (
      |  SELECT k, n_churned, nend - n_churned AS n_censored,
      |    tot - (cend - nend) AS n_at_risk,
      |    CAST(n_churned AS DOUBLE) / CAST(tot - (cend - nend) AS DOUBLE) AS hazard
      |  FROM c),
      |s AS (
      |  SELECT *,
      |    max(CASE WHEN n_churned = n_at_risk THEN 1 ELSE 0 END)
      |      OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead,
      |    sum(CASE WHEN n_churned = n_at_risk THEN 0.0 ELSE ln(1.0 - hazard) END)
      |      OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cln
      |  FROM h)
      |SELECT k, CAST(n_at_risk AS BIGINT) AS n_at_risk,
      |  CAST(n_churned AS BIGINT) AS n_churned,
      |  CAST(n_censored AS BIGINT) AS n_censored,
      |  round(hazard, 6) AS hazard,
      |  round(CASE WHEN dead = 1 THEN 0.0 ELSE exp(cln) END, 6) AS survival
      |FROM s
      |ORDER BY k""".stripMargin

  val queries: Map[String, Q] = Map(
    "q91_survival" -> q91,
    "q50_funnel" -> q50,
    "q51_retention" -> q51,
    "q55_transitions" -> q55,
    "q57_rolling_active" -> q57,
    "q58_top_paths" -> q58,
    "q84_user_entropy" -> q84,
    "q85_inter_event" -> q85,
    "q86_gini" -> q86)

  val oracle: Map[String, String] = Map(
    "q50_funnel" -> q50Sql,
    "q51_retention" -> q51Sql,
    "q55_transitions" -> q55Sql,
    "q57_rolling_active" -> q57Sql,
    "q58_top_paths" -> q58Sql,
    "q84_user_entropy" -> q84Sql,
    "q85_inter_event" -> q85Sql,
    "q86_gini" -> q86Sql,
    "q91_survival" -> q91Sql)
}
