package graft.ops

import graft.{F, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset management (SURVEY.md §2 #36-39) — the split/sample/pack
  * bookkeeping a training-data pipeline runs after cleaning: every
  * assignment is a DETERMINISTIC function of content keys (md5-derived,
  * like the dedup family), so datasets are reproducible bit-for-bit
  * across runs, engines and cluster sizes — never `rand()`, which
  * resamples on every retry and can't be oracle-checked.
  *
  * Scale stance: ds01/ds02 are map-only (scan-speed filters); ds03
  * packs per shard key so the running sum parallelizes; ds04 is one
  * partial-aggregated shuffle on the term.
  */
object DataOps {
  type Q = (SparkSession, String) => DataFrame
  import Tables.t
  import F._

  /** Deterministic train/val/test split over ANY keyed table (public
    * operator behind [[graft.Graft.hashSplit]]): bucket = md5 of
    * (salt || id) mod 100; [0, trainPct) → train, [trainPct,
    * trainPct+valPct) → val, rest → test. Per-row, stable under
    * reruns/retries/cluster size; salt isolates independent splits. */
  def hashSplitOf(df: DataFrame, idCol: String, salt: String,
                  trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"hashSplit fractions must satisfy 0 <= train($trainPct) + val($valPct) <= 100")
    val bucket = pmod(hash60(concat(lit(salt + ":"), col(idCol).cast("string"))), lit(100L))
    df.withColumn("split_bucket", bucket)
      .withColumn("split",
        when(col("split_bucket") < trainPct, "train")
          .when(col("split_bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** #36 the 80/10/10 split of the documents corpus. */
  private val ds01: Q = (s, dir) =>
    hashSplitOf(t(s, dir, "documents"), "doc_id", "graft", 80, 10)
      .select(col("doc_id"), col("lang"), col("split_bucket"), col("split"))
      .orderBy("doc_id")

  private val ds01Sql =
    """SELECT doc_id, lang,
      |  CAST(('0x' || substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS split_bucket,
      |  CASE WHEN CAST(('0x' || substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
      |       WHEN CAST(('0x' || substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Deterministic stratified sample over ANY keyed table (public
    * operator behind [[graft.Graft.deterministicSample]]): keeps rows
    * whose md5 bucket (of salt || stratum || id, mod 1000) falls below
    * `permille`. Every stratum is sampled at the same rate; the kept
    * set is a pure function of the keys — re-running, scaling the
    * cluster, or retrying a stage cannot change it. */
  def deterministicSampleOf(df: DataFrame, stratumCol: String, idCol: String,
                            salt: String, permille: Int): DataFrame =
    df.filter(pmod(hash60(concat(lit(salt + ":"), col(stratumCol).cast("string"),
      lit(":"), col(idCol).cast("string"))), lit(1000L)) < permille)

  /** #37 a 10% per-event-type sample of the events stream. */
  private val ds02: Q = (s, dir) =>
    deterministicSampleOf(t(s, dir, "events"), "event_type", "event_id", "graft", 100)
      .select(col("event_id"), col("event_type"), col("user_id"),
        epochMs(col("ts")).as("ts_ms"), col("value"))
      .orderBy("event_id")

  private val ds02Sql =
    """SELECT event_id, event_type, user_id, epoch_ms(ts) AS ts_ms, value
      |FROM events
      |WHERE CAST(('0x' || substr(md5('graft:' || event_type || ':' || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < 100
      |ORDER BY event_id""".stripMargin

  /** Sequence packing over ANY sharded doc table (public operator
    * behind [[graft.Graft.packBins]]): docs are packed in (shard,
    * order) sequence into bins of `budget` tokens — bin index =
    * floor(exclusive-prefix-sum / budget), the streaming-friendly
    * first-fit-in-order rule every pretraining tokenizer shard job
    * uses. One window shuffle on the shard key; O(1) per row. A doc
    * longer than the budget still lands in one bin (its own). */
  def packBinsOf(df: DataFrame, shardCol: String, idCol: String,
                 tokensCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("bin", ((col("__cum") - col(tokensCol)) / budget).cast("long"))
      .drop("__cum")
  }

  /** #38 pack the documents corpus into 2048-token bins per language. */
  private val ds03: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
      .withColumn("n_tokens", size(words(col("text"))).cast("long"))
    packBinsOf(docs, "lang", "doc_id", "n_tokens", budget = 2048L)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin"))
      .orderBy("doc_id")
  }

  private val ds03Sql =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, lang, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d)
      |SELECT doc_id, lang, n_tokens, CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin
      |FROM c
      |ORDER BY doc_id""".stripMargin

  /** Corpus-wide term frequencies, top k (public operator behind
    * [[graft.Graft.topTerms]]): explode → count → top-k with a total
    * tie-break. Map-side partial aggregation absorbs the explode —
    * only (term, partial count) rows shuffle, so the cost at 100 TB
    * is the distinct-term count, not the token count. */
  def topTermsOf(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(words(col(textCol))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(k)

  /** #39 the 50 most frequent corpus terms. */
  private val ds04: Q = (s, dir) =>
    topTermsOf(t(s, dir, "documents"), "text", 50)

  private val ds04Sql =
    """SELECT term, count(*) AS n
      |FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents)
      |GROUP BY term
      |ORDER BY n DESC, term
      |LIMIT 50""".stripMargin

  /** Corpus bigram statistics (public operator behind
    * [[graft.Graft.bigramStats]]): count of each adjacent word pair
    * and the conditional next-word probability
    * P(w2 | w1) = count(w1 w2) / count(w1 ·), top k pairs. The first
    * shuffle aggregates (w1, w2, partial count) — map-side combine
    * absorbs the token explode — and the head-count window shuffles
    * only the DISTINCT-bigram table, so corpus size enters through
    * vocabulary, not token count. */
  def bigramStatsOf(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs
      .select(words(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(__ws)-2), i -> struct(__ws[i] AS w1, __ws[i+1] AS w2))")).as("__bg"))
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .withColumn("__c1", sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .select(col("w1"), col("w2"), col("c12"),
        (col("c12") / col("__c1").cast("double")).as("p_next"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(k)

  /** #40 the 30 most frequent corpus bigrams with P(next | head). */
  private val ds05: Q = (s, dir) =>
    bigramStatsOf(t(s, dir, "documents"), "text", 30)
      .select(col("w1"), col("w2"), col("c12"), r6(col("p_next")).as("p_next"))

  private val ds05Sql =
    """WITH w AS (
      |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
      |bg AS (
      |  SELECT unnest(list_transform(generate_series(1, len(ws)-1),
      |    i -> ws[i] || ' ' || ws[i+1])) AS b
      |  FROM w WHERE len(ws) >= 2),
      |c AS (
      |  SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
      |    count(*) AS c12
      |  FROM bg GROUP BY 1, 2),
      |t AS (SELECT w1, w2, c12, sum(c12) OVER (PARTITION BY w1) AS c1 FROM c)
      |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
      |  round(c12 / CAST(c1 AS DOUBLE), 6) AS p_next
      |FROM t
      |ORDER BY c12 DESC, w1, w2
      |LIMIT 30""".stripMargin

  val queries: Map[String, Q] = Map(
    "ds01_hash_split" -> ds01,
    "ds02_det_sample" -> ds02,
    "ds03_pack_bins" -> ds03,
    "ds04_top_terms" -> ds04,
    "ds05_bigram_stats" -> ds05)

  val oracle: Map[String, String] = Map(
    "ds01_hash_split" -> ds01Sql,
    "ds02_det_sample" -> ds02Sql,
    "ds03_pack_bins" -> ds03Sql,
    "ds04_top_terms" -> ds04Sql,
    "ds05_bigram_stats" -> ds05Sql)
}
