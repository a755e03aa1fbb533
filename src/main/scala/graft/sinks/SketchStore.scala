package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted MERGEABLE sketch state — the 100 TB profiling story made
  * durable: a01/a02 run HLL / quantile estimation within one query, but
  * a lake that lands data continuously cannot afford to re-scan history
  * per report. It keeps per-landing SKETCH state instead, merges states
  * (cheap — state-sized, not data-sized), and estimates from the merge.
  * The reference's analog is its incremental high-watermark bookkeeping
  * (crypto_data_pipeline_duckdb.py:1523-1544) applied to statistics
  * rather than rows.
  *
  * Both sketches here are RELATIONAL — rows of integers, not opaque
  * binary blobs — which buys three properties an opaque sketch column
  * (e.g. a serialized HLL with a HIP accumulator) cannot give:
  *   1. EXACT merge law: merge(state(A), state(B)) == state(A ∪ B),
  *      row-for-row (register max / bucket-count sum are associative,
  *      commutative, idempotent-per-item) — spec-proven, not ±ε;
  *   2. order-independent determinism at any parallelism (a HIP
  *      estimator's value depends on insertion/merge order; register
  *      maxes and counts do not);
  *   3. a DuckDB-replayable oracle: the whole estimate chain is md5
  *      hashing + integer folds + one defined-order float fold.
  *
  * HLL state: per key group, register → max(rho) rows, ≤ 2^p rows per
  * group after the map-side combine (the m08 bound shape). The hash is
  * [[graft.F.hash60]] (md5-derived, 60 bits): low p bits pick the
  * register, rho = leading-zero count of the high 60−p bits + 1,
  * computed by BINARY-STRING LENGTH (`conv(w, 10, 2)` / DuckDB
  * `bin(w)`) — integer-exact, immune to the floor(log2(w)) ulp trap.
  * Estimate = the standard HLL composite: α·m²/Σ2^−M with linear
  * counting below 2.5m (Flajolet et al. 2007); the Σ folds over the
  * ≤(61−p)-row rho HISTOGRAM in rho order (the m08 defined-order-fold
  * rule), so the float result is bit-stable at any parallelism. The
  * 60-bit-hash large-range correction is irrelevant below ~10¹⁶.
  *
  * Quantile state: per key group, fixed-width value buckets → count
  * (the q24 histogram as persisted state). Merge = count sum (exact);
  * estimate = bucket midpoint at the cumulative target — absolute
  * error ≤ width/2, the documented trade (swap width per domain).
  *
  * Store layout: one parquet table per sketch kind partitioned by
  * `__landing` with dynamic partition overwrite — replaying a landing
  * REPLACES its partition byte-identically (idempotent retries, the
  * MergeWriter rule). Merged state is one scan + one (key, register |
  * bucket) shuffle over state-sized data; landings never re-scan raw
  * history. Compact with [[MergeWriter.compact]] on long histories.
  */
object SketchStore {

  /** Per-group HLL register state of `valueCol`'s distinct count:
    * (keys..., reg, rho). Deterministic, mergeable via [[mergeStates]]. */
  def hllState(df: DataFrame, keys: Seq[String], valueCol: String,
               p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val m = 1L << p
    df.select((keys.map(col) :+
        graft.F.hash60(col(valueCol).cast("string")).as("__h")): _*)
      .withColumn("reg", (col("__h") % m).cast("int"))
      .withColumn("__w", expr(s"__h div $m")) // integer div: 60-bit h > 2^52
      .withColumn("rho",
        when(col("__w") > 0, lit(61 - p) - length(conv(col("__w"), 10, 2)))
          .otherwise(lit(61 - p)).cast("int"))
      .groupBy((keys.map(col) :+ col("reg")): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Per-group fixed-width value histogram state: (keys..., bucket, cnt). */
  def histState(df: DataFrame, keys: Seq[String], valueCol: String,
                width: Double): DataFrame = {
    require(width > 0, s"width must be > 0, got $width")
    df.withColumn("bucket", floor(col(valueCol) / lit(width)).cast("long"))
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** RELATIVE-error quantile state (keys..., qbucket, cnt) — the
    * heavy-tailed sibling of [[histState]]: a fixed width is useless
    * for a domain spanning decades (width 10 puts every price below
    * 10 in one bucket), so buckets here are DECIMAL-SCIENTIFIC —
    * quantize u = floor(|v| / quantum), then bucket by (decimal
    * exponent e = digit count of u, two leading digits d ∈ [10, 99]),
    * encoded into one sort-ordered long:
    *
    *   qbucket = sign(v) · (e·100 + d)      (u = 0 ⇒ qbucket 0)
    *
    * Bucket width is 10^(e−2)·quantum — PROPORTIONAL to the value, so
    * the midpoint estimate's relative error is ≤ 0.5/d ≤ 5% at any
    * magnitude (exact below 100·quantum where a bucket is a single
    * quantized integer). The encoding is a total order over the reals
    * (negative magnitudes invert ⇒ sort first), every step is integer
    * arithmetic on a decimal STRING length/prefix — identical in
    * Spark and DuckDB, no floor(log(v)) ulp trap — and the merge law
    * is the same count sum as [[histState]] ([[mergedLogHist]]).
    * Domain: |v| < 9.2e18·quantum (long overflow guard); values
    * smaller than `quantum` collapse into qbucket 0. */
  def logHistState(df: DataFrame, keys: Seq[String], valueCol: String,
                   quantum: Double = 1e-9): DataFrame = {
    require(quantum > 0, s"quantum must be > 0, got $quantum")
    df.withColumn("__u", floor(abs(col(valueCol)) / lit(quantum)).cast("long"))
      .withColumn("__us", col("__u").cast("string"))
      .withColumn("qbucket",
        when(col("__u") === 0L, lit(0L)).otherwise(
          signum(col(valueCol)).cast("long") *
            (length(col("__us")).cast("long") * 100L +
              substring(col("__us"), 1, 2).cast("long"))))
      .groupBy((keys.map(col) :+ col("qbucket")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-landing OHLC bar state over a keyed (ts, id, value) stream —
    * the ALGEBRAIC sibling of the sketch states (q09's resample as
    * durable mergeable state): open/close are VALUE PICKS carried
    * with their (ts, id) merge keys (lexicographic struct min/max =
    * argmin/argmax with the q09 tie-break — associative, commutative,
    * per-item idempotent), high/low are plain min/max picks, and
    * volume/n_trades are sums, so merge(state(A), state(B)) ==
    * state(A ⊎ B) exactly on every pick/integer column; `volume` is
    * the one float (reports round it — the q09 rule). Residual ulp
    * risk, documented deliberately (round-15 advice): volume is an
    * IEEE double sum whose addition ORDER differs between
    * landing-merged state (per-landing partials, then a partial sum)
    * and a one-shot computation over the union, so the merge law for
    * volume is exact-up-to-ulps rather than bitwise; the r4 report
    * rounding absorbs it except exactly AT a half-way boundary
    * (probability ~2⁻⁴⁸ per bar on continuous data — the gate corpus
    * has none), and the spec compares volume rounded while every
    * other column is asserted bitwise. `decimalVolume = true` is the
    * EXECUTABLE swap (round-17, upgrading the round-16 documented
    * note): volume lands as DECIMAL(38,10) — finite-tick prices are
    * exact in 10 decimal places, decimal addition is associative and
    * commutative, so the volume merge law becomes BITWISE at any
    * landing grouping/order (Round17Spec pins it); the pick/count
    * columns need no change. Both sides of a merge must use the same
    * knob (the schemas differ). Timestamps are
    * carried at MICROSECOND precision (Spark's own comparison
    * precision — the same total order the one-shot argmin uses).
    * Output schema == [[mergedOhlc]]'s, so merged state re-merges. */
  def ohlcState(df: DataFrame, keys: Seq[String], tsCol: String,
                idCol: String, valueCol: String, unit: String,
                decimalVolume: Boolean = false): DataFrame =
    df.groupBy((keys.map(col) :+
        unix_millis(date_trunc(unit, col(tsCol))).as("bucket_ms")): _*)
      .agg(
        min(struct(unix_micros(col(tsCol)).as("o_ts"), col(idCol).as("o_id"),
          col(valueCol).cast("double").as("open"))).as("__o"),
        max(struct(unix_micros(col(tsCol)).as("c_ts"), col(idCol).as("c_id"),
          col(valueCol).cast("double").as("close"))).as("__c"),
        max(col(valueCol).cast("double")).as("high"),
        min(col(valueCol).cast("double")).as("low"),
        (if (decimalVolume)
          sum(col(valueCol).cast(
            org.apache.spark.sql.types.DecimalType(28, 10)))
        else sum(col(valueCol).cast("double"))).as("volume"),
        count(lit(1)).as("n_trades"))
      .select((keys.map(col) ++ Seq(col("bucket_ms"),
        col("__o").getField("o_ts").as("o_ts"),
        col("__o").getField("o_id").as("o_id"),
        col("__o").getField("open").as("open"),
        col("high"), col("low"),
        col("__c").getField("c_ts").as("c_ts"),
        col("__c").getField("c_id").as("c_id"),
        col("__c").getField("close").as("close"),
        col("volume"), col("n_trades"))): _*)

  /** Merged [[ohlcState]] across landings: argmin/argmax re-picks via
    * the carried (ts, id) keys, min/max/sum folds for the rest — the
    * same schema back, so merging is associative at any landing
    * grouping (spec-pinned: merged == one-shot state of the union). */
  def mergedOhlc(spark: SparkSession, path: String, keys: Seq[String],
                 beforeLanding: Option[Long] = None): DataFrame =
    beforeLanding.foldLeft(spark.read.parquet(path))((df, b) =>
        df.filter(col("__landing").cast("long") < b))
      .groupBy((keys.map(col) :+ col("bucket_ms")): _*)
      .agg(
        min(struct(col("o_ts"), col("o_id"), col("open"))).as("__o"),
        max(struct(col("c_ts"), col("c_id"), col("close"))).as("__c"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        sum(col("volume")).as("volume"),
        sum(col("n_trades")).as("n_trades"))
      .select((keys.map(col) ++ Seq(col("bucket_ms"),
        col("__o").getField("o_ts").as("o_ts"),
        col("__o").getField("o_id").as("o_id"),
        col("__o").getField("open").as("open"),
        col("high"), col("low"),
        col("__c").getField("c_ts").as("c_ts"),
        col("__c").getField("c_id").as("c_id"),
        col("__c").getField("close").as("close"),
        col("volume"), col("n_trades"))): _*)

  /** Per-landing BOTTOM-K sketch state over `valueCol`'s distinct set
    * (Cohen 2007 / the KMV lineage): the k smallest md5 hashes per key
    * group, each carrying its value — ≤ k rows per group per landing.
    * Merge = the k smallest of the union ([[mergedBottomK]]) —
    * associative, commutative, idempotent (a min-rank pick, the
    * Bloom-union strength). The merged state is simultaneously (a) a
    * UNIFORM SAMPLE of every distinct value ever landed (md5 order is
    * value-blind) and (b) a distinct-count estimator: n̂ = (k−1)·2⁶⁰ /
    * h₍ₖ₎ — and unlike HLL registers the whole chain is
    * md5-deterministic, so a DuckDB oracle replays sample AND estimate
    * exactly. */
  def bottomKState(df: DataFrame, keys: Seq[String], valueCol: String,
                   k: Int, salt: String = "bk"): DataFrame = {
    // Value contract (documented deliberately, round-15 advice): the
    // sketch hashes valueCol CAST TO STRING, so the sample identity is
    // the engine's string rendering. For integer/string values the
    // rendering is canonical and a DuckDB oracle replays it exactly
    // (st15 uses longs). FLOAT values render differently across
    // engines (Spark 1.0E-7 vs DuckDB 1e-07) — a float-valued gate
    // query over this sketch would silently lose oracle parity;
    // normalize floats to a canonical rendering (or scale to longs)
    // before sketching them.
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("h"))
    // NULL values are excluded: null hashes to null, which Spark's
    // ascending sort ranks FIRST — a single null would permanently
    // occupy a sample slot and skew h₍ₖ₎ (and DuckDB's default NULLS
    // LAST would disagree). A sample of values has no null member.
    df.select((keys.map(col) :+ col(valueCol).cast("string").as("value")): _*)
      .filter(col("value").isNotNull)
      .distinct()
      .withColumn("h", graft.F.hash60(concat(lit(salt + ":"), col("value"))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Merged [[bottomKState]] across landings: distinct (value, h) —
    * the same value re-landing twice hashes to the same row — then the
    * k smallest per group again. Same schema back ⇒ re-mergeable. */
  def mergedBottomK(spark: SparkSession, path: String, keys: Seq[String],
                    k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("h"))
    spark.read.parquet(path)
      .select((keys.map(col) ++ Seq(col("value"), col("h"))): _*)
      .distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Land one landing's sketch state (idempotent: replaying a landing
    * id replaces exactly its partition via dynamic overwrite). */
  def land(spark: SparkSession, path: String, state: DataFrame,
           landingId: Long): Unit =
    state.withColumn("__landing", lit(landingId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__landing")
      .parquet(path)

  /** Merged HLL state across every landed partition: register-wise max.
    * merge(state(A), state(B)) == state(A ∪ B) exactly — max is
    * associative/commutative and per-item idempotent (spec-pinned). */
  def mergedHll(spark: SparkSession, path: String, keys: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy((keys.map(col) :+ col("reg")): _*)
      .agg(max(col("rho")).as("rho"))

  /** Merged histogram state across landings: bucket-count sums (exact). */
  def mergedHist(spark: SparkSession, path: String, keys: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Merged [[logHistState]] across landings: qbucket-count sums
    * (exact — same linearity as [[mergedHist]]). ≤ ~1800 rows per key
    * group per sign-decade span regardless of corpus size. */
  def mergedLogHist(spark: SparkSession, path: String, keys: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy((keys.map(col) :+ col("qbucket")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Per-landing count-min-sketch counter state over a tokenized text
    * column: (r, b, cnt) with the a04 md5-derived buckets
    * ([[graft.ops.DataOps.cmsHeavyHittersOf]]'s exact formula, so a
    * landed state IS that sketch's state). Counter sums are
    * associative, commutative and linear in the input multiset, so
    * merge(state(A), state(B)) == state(A ⊎ B) EXACTLY (cell-wise
    * add) — the frequency sibling of [[mergedHll]]'s register max. */
  def cmsState(df: DataFrame, textCol: String, rows: Int = 4,
               width: Int = 1024): DataFrame = {
    require(rows >= 1 && width >= 2,
      s"rows >= 1 and width >= 2 required, got rows=$rows width=$width")
    df.select(explode(graft.F.words(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("__n"))
      .select(col("__n"), explode(array((0 until rows).map(r =>
        struct(lit(r).as("r"),
          pmod(graft.F.hash60(concat(lit(s"$r:"), col("term"))),
            lit(width.toLong)).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col("__n")).as("cnt"))
  }

  /** Merged CMS state across landings: cell-wise counter sums (exact
    * by linearity). ≤ rows·width rows regardless of corpus size. */
  def mergedCms(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("r"), col("b"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Per-landing BLOOM set-bit position state over a text column's
    * normalized content hash: DISTINCT `pos` rows, ≤ min(k·n, m) per
    * landing and ≤ m merged — the fourth mergeable sketch
    * ([[graft.ops.DataOps.bloomProbeOf]]'s exact position formula, so
    * a landed state IS that filter's state). Merge = bitwise OR = set
    * union of positions ([[mergedBloom]]'s distinct) — associative,
    * commutative AND idempotent, the strongest merge law of the four:
    * merge(state(A), state(B)) == state(A ∪ B) row-for-row, and
    * re-landing any landing is a no-op even before the dynamic-
    * overwrite guard. No false negatives survive the store: a content
    * hash landed at ANY tick has all k positions set in every later
    * merge (monotone union, spec-pinned). */
  def bloomState(df: DataFrame, textCol: String, mBits: Int = 2048,
                 kHashes: Int = 4): DataFrame = {
    require(mBits >= 2 && kHashes >= 1,
      s"need mBits >= 2 and kHashes >= 1, got $mBits/$kHashes")
    val m = md5(trim(regexp_replace(lower(col(textCol)), "\\s+", " ")))
    df.select(explode(array((0 until kHashes).map(i =>
        pmod(graft.F.hash60(concat(lit(s"bloom$i:"), m)),
          lit(mBits.toLong))): _*)).as("pos"))
      .distinct()
  }

  /** Merged Bloom state across landings: the position-set union.
    * `beforeLanding` bounds the read to landings strictly earlier —
    * the probe-then-land loop's "history as of tick t" view, pruned
    * to the store's landing partitions. */
  def mergedBloom(spark: SparkSession, path: String,
                  beforeLanding: Option[Long] = None): DataFrame = {
    val all = spark.read.parquet(path)
    beforeLanding.fold(all)(b => all.filter(col("__landing") < b))
      .select(col("pos")).distinct()
  }

  /** Distinct-count estimate per key group from HLL register state:
    * (keys..., est). Composite estimator with linear counting; the
    * float fold runs over the rho histogram in rho order. */
  def hllEstimate(state: DataFrame, keys: Seq[String], p: Int = 12): DataFrame = {
    val m = (1L << p).toDouble
    val alphaM2 = 0.7213 / (1.0 + 1.079 / m) * m * m // one shared literal
    val kc = keys.map(col)
    val po = Window.partitionBy(kc: _*).orderBy(col("rho"))
    val cum = po.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    state.groupBy((kc :+ col("rho")): _*).agg(count(lit(1)).as("__c"))
      .withColumn("__s", sum(col("__c").cast("double") *
        pow(lit(2.0), -col("rho").cast("double"))).over(cum))
      .withColumn("__present", sum(col("__c")).over(Window.partitionBy(kc: _*)))
      .withColumn("__last", lead(col("rho"), 1).over(po).isNull)
      .filter(col("__last"))
      .withColumn("__zeros", (lit(m.toLong) - col("__present")).cast("double"))
      .withColumn("__eraw", lit(alphaM2) / (col("__zeros") + col("__s")))
      .withColumn("est",
        when(col("__eraw") <= lit(2.5 * m) && col("__zeros") > 0,
          lit(m) * log(lit(m) / col("__zeros")))
        .otherwise(col("__eraw")))
      .select((kc :+ col("est")): _*)
  }

  /** Quantile estimates per key group from [[logHistState]] rows: the
    * same cumulative walk as [[histQuantiles]] (qbucket encodes a
    * total order over values), decoding the winning bucket to its
    * midpoint — (d + 0.5)·10^max(e−2,0)·quantum, sign-applied; qbucket
    * 0 decodes to 0.0. Relative error ≤ 0.5/d ≤ 5%. */
  def logHistQuantiles(state: DataFrame, keys: Seq[String],
                       qs: Seq[(Double, String)],
                       quantum: Double = 1e-9): DataFrame = {
    require(qs.nonEmpty, "at least one quantile required")
    val kc = keys.map(col)
    val po = Window.partitionBy(kc: _*).orderBy(col("qbucket"))
    val cum = po.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cummed = state
      .withColumn("__cum", sum(col("cnt")).over(cum))
      .withColumn("__n", sum(col("cnt")).over(Window.partitionBy(kc: _*)))
    def decode(b: Column): Column = {
      val mag = abs(b)
      // Column `/` is DOUBLE division — floor() keeps the exponent integral
      val e = floor(mag / lit(100L)).cast("double")
      val d = (mag % 100L).cast("double")
      // e <= 2 buckets are a SINGLE quantized integer (d = u): the
      // width exponent clamps at 0, not e-2
      when(b === 0L, lit(0.0)).otherwise(
        signum(b).cast("double") * (d + lit(0.5)) *
          pow(lit(10.0), greatest(e - lit(2.0), lit(0.0))) * lit(quantum))
    }
    val aggs = qs.map { case (q, alias) =>
      decode(min(when(col("__cum").cast("double") >= lit(q) * col("__n").cast("double"),
        col("qbucket")))).as(alias)
    }
    cummed.groupBy(kc: _*)
      .agg(max(col("__n")).as("n"), aggs: _*)
  }

  /** Quantile estimates per key group from histogram state: for each
    * (q, alias), the midpoint of the first bucket whose cumulative
    * count reaches q·n. Returns (keys..., n, <alias>...). */
  def histQuantiles(state: DataFrame, keys: Seq[String], width: Double,
                    qs: Seq[(Double, String)]): DataFrame = {
    require(qs.nonEmpty, "at least one quantile required")
    val kc = keys.map(col)
    val po = Window.partitionBy(kc: _*).orderBy(col("bucket"))
    val cum = po.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cummed = state
      .withColumn("__cum", sum(col("cnt")).over(cum))
      .withColumn("__n", sum(col("cnt")).over(Window.partitionBy(kc: _*)))
    val aggs = qs.map { case (q, alias) =>
      ((min(when(col("__cum").cast("double") >= lit(q) * col("__n").cast("double"),
        col("bucket"))).cast("double") + lit(0.5)) * lit(width)).as(alias)
    }
    cummed.groupBy(kc: _*)
      .agg(max(col("__n")).as("n"), aggs: _*)
  }
}
