package graft.ops

import graft.{F, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics text operators (SURVEY.md §2 t18–t20, ds18) —
  * the lexical-quality measurements an LLM-data curation pass runs
  * next to the t01–t17 family: collocation mining (PMI), lexical
  * diversity, readability scoring, and label/class balance for
  * mixture design.
  *
  * Scale stance: token streams collapse at the map-side combine
  * (groupBy on token/bigram keys — corpus size enters through
  * VOCABULARY, the t09/ds04 rule); per-doc scores are map-only
  * expressions over the text column (no shuffle at all beyond the
  * scan); the class-balance rollup reduces to one row per class
  * before any window touches it. All counts are integers (BIGINT at
  * the boundary); the only doubles are per-row ratios/logs of those
  * integers — deterministic at any parallelism. */
object TextStatsOps {
  type Q = (SparkSession, String) => DataFrame
  import Tables.t
  import F._

  // -------------------------------------------------------------- PMI

  /** Pointwise-mutual-information collocations (public operator
    * behind [[graft.Graft.pmiCollocations]]): for adjacent-token
    * pairs, pmi = ln( (c12/B) · (N/c1) · (N/c2) ) with c1/c2 unigram
    * occurrence counts, N total tokens, B total bigrams — the
    * classical "words that belong together" miner (Church & Hanks
    * 1990). Pairs below `minCount` are noise and dropped BEFORE the
    * unigram join; the distinct-bigram table (vocabulary-sized) is
    * what shuffles, and the two scalar totals broadcast as 1-row
    * literals folded by the same integer sums in both engines. Top-k
    * by rounded pmi (ties → pair name) keeps the ordering stable
    * across engines even at the last ulp of ln. */
  def pmiCollocationsOf(docs: DataFrame, textCol: String, minCount: Long,
                        k: Int): DataFrame = {
    val toks = docs.select(words(col(textCol)).as("__ws"))
    val uni = toks.select(explode(col("__ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val bi = toks.filter(size(col("__ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(__ws)-2), i -> struct(__ws[i] AS w1, __ws[i+1] AS w2))")).as("__bg"))
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val totals = uni.agg(sum(col("c")).as("n_tok")).crossJoin(
      docs.select(greatest(size(words(col(textCol))) - 1, lit(0)).as("__nb"))
        .agg(sum(col("__nb")).cast("long").as("n_bi")))
    val nTok = col("n_tok").cast("double")
    // uni is vocabulary-sized: no broadcast hint — AQE broadcasts it at
    // gate scale, a 100 TB corpus shuffle-joins it (both sides key-bound)
    bi.join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
      .crossJoin(broadcast(totals))
      .withColumn("pmi",
        log((col("c12").cast("double") / col("n_bi").cast("double")) *
          (nTok / col("c1").cast("double")) * (nTok / col("c2").cast("double"))))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        r6(col("pmi")).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** #t18 top-25 PMI collocations with c12 ≥ 10 over the corpus. */
  private val t18: Q = (s, dir) =>
    pmiCollocationsOf(t(s, dir, "documents"), "text", minCount = 10L, k = 25)
      .withColumn("c12", col("c12").cast("long"))
      .withColumn("c1", col("c1").cast("long"))
      .withColumn("c2", col("c2").cast("long"))

  private val t18Sql =
    """WITH w AS (
      |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
      |uni AS (
      |  SELECT unnest(ws) AS w FROM w),
      |uc AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
      |tot AS (
      |  SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uc) AS n_tok,
      |    (SELECT CAST(sum(greatest(len(ws) - 1, 0)) AS BIGINT) FROM w) AS n_bi),
      |bg AS (
      |  SELECT unnest(list_transform(generate_series(1, len(ws)-1),
      |    i -> ws[i] || ' ' || ws[i+1])) AS b
      |  FROM w WHERE len(ws) >= 2),
      |bc AS (
      |  SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
      |    count(*) AS c12
      |  FROM bg GROUP BY 1, 2
      |  HAVING count(*) >= 10),
      |j AS (
      |  SELECT bc.w1, bc.w2, bc.c12, u1.c AS c1, u2.c AS c2, t.n_tok, t.n_bi
      |  FROM bc
      |  JOIN uc u1 ON u1.w = bc.w1
      |  JOIN uc u2 ON u2.w = bc.w2
      |  CROSS JOIN tot t)
      |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
      |  CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
      |  round(ln((CAST(c12 AS DOUBLE) / CAST(n_bi AS DOUBLE))
      |    * (CAST(n_tok AS DOUBLE) / CAST(c1 AS DOUBLE))
      |    * (CAST(n_tok AS DOUBLE) / CAST(c2 AS DOUBLE))), 6) AS pmi
      |FROM j
      |ORDER BY pmi DESC, w1, w2
      |LIMIT 25""".stripMargin

  // ------------------------------------------------ lexical diversity

  /** Per-document lexical diversity (public operator behind
    * [[graft.Graft.lexicalDiversity]]): type-token ratio and hapax
    * (frequency-1 type) share — the repetitiveness signals next to
    * t05's Gopher family. Tokens explode once, collapse to (doc,
    * token, count) at the map-side combine, then reduce to one row
    * per doc with INTEGER aggregates only; the two ratios are per-row
    * divisions of those integers. Docs with zero tokens have no
    * diversity by definition and are absent (contract). Shuffles on
    * the doc key — embarrassingly parallel at any corpus size. */
  def lexicalDiversityOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(words(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col(idCol), col("n_tokens"), col("n_types"), col("n_hapax"),
        (col("n_types").cast("double") / col("n_tokens").cast("double")).as("ttr"),
        (col("n_hapax").cast("double") / col("n_types").cast("double")).as("hapax_ratio"))

  /** #t19 lexical diversity per document. */
  private val t19: Q = (s, dir) =>
    lexicalDiversityOf(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("n_types").cast("long").as("n_types"),
        col("n_hapax").cast("long").as("n_hapax"),
        r6(col("ttr")).as("ttr"), r6(col("hapax_ratio")).as("hapax_ratio"))
      .orderBy("doc_id")

  private val t19Sql =
    """WITH w AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents),
      |c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
      |d AS (
      |  SELECT doc_id,
      |    CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS n_types,
      |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      |  FROM c GROUP BY 1)
      |SELECT doc_id, n_tokens, n_types, n_hapax,
      |  round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr,
      |  round(CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6) AS hapax_ratio
      |FROM d
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ readability

  /** Flesch readability per document (public operator behind
    * [[graft.Graft.readability]]): words = [a-z0-9]+ tokens,
    * sentences = [.!?]+ runs (floored at 1), syllables = [aeiouy]+
    * vowel groups in the lowercased text — the standard heuristic
    * when no dictionary is in the engine. Reading ease = 206.835 −
    * 1.015·(W/S) − 84.6·(Syl/W); FK grade = 0.39·(W/S) +
    * 11.8·(Syl/W) − 15.59; null when a doc has no words. Map-only:
    * three regex counts per row, no shuffle beyond the scan. */
  def readabilityOf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = size(words(col(textCol))).cast("long")
    val s = greatest(size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))), lit(1)).cast("long")
    val syl = size(regexp_extract_all(lower(col(textCol)), lit("[aeiouy]+"), lit(0))).cast("long")
    val wps = col("n_words").cast("double") / col("n_sentences").cast("double")
    val spw = col("n_syllables").cast("double") / col("n_words").cast("double")
    docs.select(col(idCol), w.as("n_words"), s.as("n_sentences"), syl.as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0,
          lit(206.835) - lit(1.015) * wps - lit(84.6) * spw))
      .withColumn("fk_grade",
        when(col("n_words") > 0,
          lit(0.39) * wps + lit(11.8) * spw - lit(15.59)))
  }

  /** #t20 Flesch / FK grade per document. */
  private val t20: Q = (s, dir) =>
    readabilityOf(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"),
        r6(col("flesch")).as("flesch"), r6(col("fk_grade")).as("fk_grade"))
      .orderBy("doc_id")

  private val t20Sql =
    """WITH c AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_words,
      |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
      |  FROM documents)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  round(CASE WHEN n_words > 0 THEN
      |    206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
      |      - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) END, 6) AS flesch,
      |  round(CASE WHEN n_words > 0 THEN
      |    0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
      |      + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) - 15.59 END, 6) AS fk_grade
      |FROM c
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- class balance

  /** Class/label balance report (public operator behind
    * [[graft.Graft.classBalance]]) — the imbalance audit a mixture
    * design starts from: per class, doc/token counts and share, the
    * inverse-frequency weight N/(K·n_c), and the effective-number
    * weight (1−β)/(1−β^n_c) (Cui et al. 2019) normalized so weights
    * mean to 1 across classes. The corpus reduces to one row per
    * class FIRST (integer sums at the map-side combine); the window
    * normalization then runs on the K-row class table — a deliberate
    * K-row single-partition exchange, the ds10/q28 scalar pattern. */
  def classBalanceOf(df: DataFrame, classCol: String, tokensCol: String,
                     beta: Double = 0.999): DataFrame = {
    require(beta > 0 && beta < 1, s"beta must be in (0,1), got $beta")
    val all = Window.partitionBy()
    // the float normalizer folds in CLASS order (cumulative + last — the
    // q31/q33 discipline); integer totals are order-free hash aggregates
    val ordK = Window.orderBy(col(classCol))
    val cumK = ordK.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allK = ordK.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val nD = col("n_docs").cast("double")
    df.groupBy(col(classCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).cast("long").as("n_tokens"))
      .withColumn("__total", sum(col("n_docs")).over(all))
      .withColumn("__k", count(lit(1)).over(all))
      .withColumn("doc_share", nD / col("__total").cast("double"))
      .withColumn("inv_freq_weight",
        col("__total").cast("double") / (col("__k").cast("double") * nD))
      .withColumn("__raw_en", (lit(1.0) - lit(beta)) / (lit(1.0) - pow(lit(beta), nD)))
      .withColumn("__csum_en", sum(col("__raw_en")).over(cumK))
      .withColumn("eff_num_weight",
        col("__raw_en") * col("__k").cast("double") / last(col("__csum_en")).over(allK))
      .select(col(classCol), col("n_docs").cast("long").as("n_docs"), col("n_tokens"),
        col("doc_share"), col("inv_freq_weight"), col("eff_num_weight"))
  }

  /** #ds18 class balance over documents.lang (tokens = n_chars/4, the
    * t03 BPE-ish proxy, exact integer division). */
  private val ds18: Q = (s, dir) =>
    classBalanceOf(
      t(s, dir, "documents").withColumn("__tok", floor(col("n_chars") / 4).cast("long")),
      "lang", "__tok")
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        r6(col("doc_share")).as("doc_share"),
        r6(col("inv_freq_weight")).as("inv_freq_weight"),
        r6(col("eff_num_weight")).as("eff_num_weight"))
      .orderBy("lang")

  private val ds18Sql =
    """WITH c AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(CAST(floor(n_chars / 4) AS BIGINT)) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |w AS (
      |  SELECT lang, n_docs, n_tokens,
      |    sum(n_docs) OVER () AS total,
      |    count(*) OVER () AS k,
      |    (1.0 - 0.999) / (1.0 - pow(0.999, CAST(n_docs AS DOUBLE))) AS raw_en,
      |    sum((1.0 - 0.999) / (1.0 - pow(0.999, CAST(n_docs AS DOUBLE))))
      |      OVER (ORDER BY lang ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS csum_en
      |  FROM c),
      |v AS (
      |  SELECT lang, n_docs, n_tokens,
      |    CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE) AS doc_share,
      |    CAST(total AS DOUBLE) / (CAST(k AS DOUBLE) * CAST(n_docs AS DOUBLE)) AS inv_freq_weight,
      |    raw_en * CAST(k AS DOUBLE) /
      |      last_value(csum_en) OVER (ORDER BY lang
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS eff_num_weight
      |  FROM w)
      |SELECT lang, n_docs, n_tokens,
      |  round(doc_share, 6) AS doc_share,
      |  round(inv_freq_weight, 6) AS inv_freq_weight,
      |  round(eff_num_weight, 6) AS eff_num_weight
      |FROM v
      |ORDER BY lang""".stripMargin

  /** Zipf's-law fit of the corpus rank-frequency distribution (public
    * operator behind [[graft.Graft.zipfFit]]) — the one-row corpus
    * health check: natural language follows count ∝ rank^(−α) with
    * α ≈ 1; a corpus whose α drifts far from its baseline (boilerplate
    * floods flatten the head, template spam steepens it) changed
    * distributionally even when volume looks normal. Takes the top-V
    * terms by (count desc, term) — the ds04 total-ordered pick — and
    * OLS-fits ln(count) on ln(rank): zipf_alpha = −slope, with the
    * moment-closed-form r² as fit quality.
    *
    * Scale shape: ONE token-count shuffle (map-side combine absorbs
    * the explode — corpus size enters through vocabulary), the top-V
    * pick is a TakeOrdered, and the fit folds run over ≤V rows in rank
    * order (the deliberate k-row single partition, ds18 rule). ln is
    * applied per row and summed in rank order (q33 discipline). */
  def zipfFitOf(docs: DataFrame, textCol: String, topV: Int = 200): DataFrame = {
    require(topV >= 3, s"topV must be >= 3, got $topV")
    val ordR = Window.orderBy(col("rnk"))
    val cum = ordR.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = ordR.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val top = docs.select(explode(words(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(topV)
      .withColumn("rnk", row_number().over(Window.orderBy(col("c").desc, col("term"))))
    val nD = col("__n").cast("double")
    top
      .withColumn("__x", log(col("rnk").cast("double")))
      .withColumn("__y", log(col("c").cast("double")))
      .withColumn("__rn", row_number().over(ordR))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__sx", sum(col("__x")).over(cum))
      .withColumn("__sy", sum(col("__y")).over(cum))
      .withColumn("__sxy", sum(col("__x") * col("__y")).over(cum))
      .withColumn("__sx2", sum(col("__x") * col("__x")).over(cum))
      .withColumn("__sy2", sum(col("__y") * col("__y")).over(cum))
      .filter(col("__rn") === col("__n"))
      .select(col("__n").as("n_terms"),
        when(nD * col("__sx2") - col("__sx") * col("__sx") > 0.0,
          (nD * col("__sxy") - col("__sx") * col("__sy")) /
            (nD * col("__sx2") - col("__sx") * col("__sx"))).as("__slope"),
        col("__sx"), col("__sy"), col("__sxy"), col("__sx2"), col("__sy2"), nD.as("__nd"))
      .select(col("n_terms"),
        (-col("__slope")).as("zipf_alpha"),
        (col("__sy") / col("__nd") - col("__slope") * (col("__sx") / col("__nd")))
          .as("intercept"),
        when((col("__nd") * col("__sx2") - col("__sx") * col("__sx")) *
             (col("__nd") * col("__sy2") - col("__sy") * col("__sy")) > 0.0,
          ((col("__nd") * col("__sxy") - col("__sx") * col("__sy")) *
           (col("__nd") * col("__sxy") - col("__sx") * col("__sy"))) /
            ((col("__nd") * col("__sx2") - col("__sx") * col("__sx")) *
             (col("__nd") * col("__sy2") - col("__sy") * col("__sy")))).as("r2"))
  }

  /** #t21 Zipf fit over the documents corpus' top-200 terms. */
  private val t21: Q = (s, dir) =>
    zipfFitOf(t(s, dir, "documents"), "text", topV = 200)
      .select(col("n_terms"), r6(col("zipf_alpha")).as("zipf_alpha"),
        r6(col("intercept")).as("intercept"), r6(col("r2")).as("r2"))

  private val t21Sql =
    """WITH tc AS (
      |  SELECT term, count(*) AS c
      |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents)
      |  GROUP BY term),
      |top AS (
      |  SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rnk
      |  FROM tc QUALIFY rnk <= 200),
      |m AS (
      |  SELECT rnk, ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      |  FROM top),
      |e AS (
      |  SELECT row_number() OVER o AS rn, count(*) OVER () AS n,
      |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
      |    sum(x * y) OVER w AS sxy, sum(x * x) OVER w AS sx2,
      |    sum(y * y) OVER w AS sy2
      |  FROM m
      |  WINDOW o AS (ORDER BY rnk),
      |    w AS (ORDER BY rnk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |f AS (
      |  SELECT n,
      |    CASE WHEN CAST(n AS DOUBLE) * sx2 - sx * sx > 0.0
      |      THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
      |           / (CAST(n AS DOUBLE) * sx2 - sx * sx) END AS slope,
      |    sx, sy, sxy, sx2, sy2, CAST(n AS DOUBLE) AS nd
      |  FROM e WHERE rn = n)
      |SELECT CAST(n AS BIGINT) AS n_terms,
      |  round(-slope, 6) AS zipf_alpha,
      |  round(sy / nd - slope * (sx / nd), 6) AS intercept,
      |  round(CASE WHEN (nd * sx2 - sx * sx) * (nd * sy2 - sy * sy) > 0.0
      |    THEN ((nd * sxy - sx * sy) * (nd * sxy - sx * sy))
      |         / ((nd * sx2 - sx * sx) * (nd * sy2 - sy * sy)) END, 6) AS r2
      |FROM f""".stripMargin

  // ------------------------------------------------------- n-gram novelty

  /** Per-doc n-gram NOVELTY (public operator behind
    * [[graft.Graft.ngramNovelty]]) — the incremental-information
    * profile of a corpus in doc_id order: a doc's novelty is the
    * fraction of its distinct word n-grams whose FIRST corpus
    * occurrence (minimum doc_id) is this doc. Exact duplicates score
    * 0, templated/boilerplate docs score low, genuinely new content
    * scores near 1 — the per-doc complement of d12's corpus-level
    * substring-dup statistics (Lee et al. 2022's dedup rationale reads
    * directly off this column), and a curation signal a mixture
    * designer sorts on. Docs with fewer than `n` words have no grams
    * and are omitted (the ds07 rule).
    *
    * Scale: distinct (doc, gram-hash) pairs shuffle once (map-side
    * combine collapses within-doc repeats); the first-owner table
    * groups on the SAME gram-hash key, so the ownership join reuses
    * that partitioning — no second full shuffle of the gram stream;
    * output is doc-sized. */
  def ngramNoveltyOf(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 8): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val grams = docs
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(__ws)-$n), i -> array_join(slice(__ws, i+1, $n), ' '))")).as("__g"))
      .select(col("doc_id"), hash60(col("__g")).as("__h"))
      .distinct()
    val owner = grams.groupBy(col("__h")).agg(min(col("doc_id")).as("__owner"))
    grams.join(owner, "__h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("doc_id") === col("__owner"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", col("n_novel").cast("double") / col("n_grams").cast("double"))
  }

  /** #t22 8-gram novelty over the documents corpus. */
  private val t22: Q = (s, dir) =>
    ngramNoveltyOf(t(s, dir, "documents"), "doc_id", "text", n = 8)
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        r6(col("novelty")).as("novelty"))
      .orderBy("doc_id")

  private val t22Sql =
    """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
      |g AS (
      |  SELECT DISTINCT doc_id,
      |    CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) AS h
      |  FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 7),
      |      i -> array_to_string(ws[i:i+7], ' '))) AS gram
      |    FROM w WHERE len(ws) >= 8)),
      |own AS (SELECT h, min(doc_id) AS owner FROM g GROUP BY h)
      |SELECT g.doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN g.doc_id = own.owner THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  round(CAST(sum(CASE WHEN g.doc_id = own.owner THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS novelty
      |FROM g JOIN own ON own.h = g.h
      |GROUP BY g.doc_id
      |ORDER BY g.doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "t22_ngram_novelty" -> t22,
    "t18_pmi" -> t18,
    "t19_lexdiv" -> t19,
    "t20_readability" -> t20,
    "ds18_class_balance" -> ds18,
    "t21_zipf" -> t21)

  val oracle: Map[String, String] = Map(
    "t22_ngram_novelty" -> t22Sql,
    "t18_pmi" -> t18Sql,
    "t19_lexdiv" -> t19Sql,
    "t20_readability" -> t20Sql,
    "ds18_class_balance" -> ds18Sql,
    "t21_zipf" -> t21Sql)
}
