package graft

import graft.ops._
import org.apache.spark.sql.functions._

/** Per-operator specs beyond the driver's DuckDB gate: semantic
  * properties that SQL parity alone wouldn't pin down. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("every declared query runs and respects its contract on sf0.001") {
    val qs = SparkEntry.queries
    assert(qs.size == 247)
    // oracle coverage: everything except the rows-only entries — m02
    // (mapPartitions), the a01/a02 sketches (HLL++/quantile-sketch
    // results are not SQL-reproducible in DuckDB; ExtOpsSpec bounds
    // their error against the exact values instead)
    // (m06's Gear rolling fold is likewise outside the portable SQL
    // subset; Round7Spec pins the chunking semantics instead)
    // (t12's iterative global-argmax BPE loop is outside it too;
    // RetrievalSpec pins training against a driver-side reference)
    // (o01–o04 graduated to full oracles in round 8: the JSON
    // round-trip is the identity on their payloads, so DuckDB replays
    // build → concat → keyed heal directly from events)
    // (a06/a07/a08, round 11: the approx-mode swap gates — one side of
    // each comparison is the a02-style sketch, so rows-only by the same
    // rule; Round11Spec bounds the realized errors)
    assert(SparkEntry.oracleSql.keySet ==
      qs.keySet - "m02_feature_batch" - "m06_cdc_dedup" - "a01_approx_distinct" -
        "a02_approx_percentile" - "t12_bpe_train" - "a06_winsorize_approx" -
        "a07_bins_approx" - "a08_var_es_approx")
  }

  test("d06 clusters: labels are a fixpoint and canonical is the cluster min") {
    val out = SparkEntry.queries("d06_neardup_clusters")(spark, sfDir).collect()
    assert(out.nonEmpty, "testdata's planted near-dups must form clusters")
    val label = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every cluster_id is itself a member doc labeled with itself
    out.foreach { r =>
      assert(label(r.getLong(1)) == r.getLong(1), "cluster_id must be its own label")
      assert(r.getLong(1) <= r.getLong(0), "cluster_id is the component minimum")
      assert(r.getBoolean(3) == (r.getLong(0) == r.getLong(1)))
    }
    // sizes are consistent
    val sizes = out.groupBy(_.getLong(1)).view.mapValues(_.length)
    out.foreach(r => assert(r.getLong(2) == sizes(r.getLong(1))))
    // labels agree with a driver-side union-find over the same edges
    val pairs = SparkEntry.queries("d02_minhash_lsh")(spark, sfDir)
      .filter(col("est_sim") >= 0.5).select("doc_a", "doc_b")
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = pairs.flatMap(p => Seq(p._1, p._2)).distinct.map(x => x -> find(x)).toMap
    assert(label == want)
  }

  test("t05 repetition: duplicated text scores higher than the original") {
    val out = SparkEntry.queries("t05_repetition")(spark, sfDir)
    // ratios live in [0, 1); a doc made of one repeated bigram maxes out
    val bad = out.filter(col("dup_word_ratio") < 0 || col("dup_word_ratio") >= 1
      || col("top_bigram_ratio") <= 0 || col("dup_trigram_ratio") < 0)
    assert(bad.count() == 0)
  }

  test("q21 rolling corr matches a direct driver-side Pearson") {
    val got = SparkEntry.queries("q21_rolling_corr")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val evs = Tables.t(spark, sfDir, "events")
      .select(col("event_type"), col("event_id"), unix_millis(col("ts")).as("ms"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    evs.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val pairs = sorted.sliding(2).collect { case Array(p, c) => (c._1, c._2, c._4, p._4) }.toArray
      pairs.zipWithIndex.foreach { case ((et, eid, x, y), i) =>
        val want =
          if (i < 19) None
          else {
            val win = pairs.slice(i - 19, i + 1)
            val (xs, ys) = (win.map(_._3), win.map(_._4))
            val n = 20.0
            val (sx, sy) = (xs.sum, ys.sum)
            val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
            val (vx, vy) = (n * xs.map(a => a * a).sum - sx * sx, n * ys.map(a => a * a).sum - sy * sy)
            if (vx > 0 && vy > 0) Some((n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy))) else None
          }
        (got((et, eid)), want) match {
          case (None, None) =>
          case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-6, s"($et,$eid): $g vs $w")
          case (g, w) => fail(s"($et,$eid): null disagreement got=$g want=$w")
        }
      }
    }
  }

  test("q25 cardinality: the approx (100 TB) path tracks exact within HLL error") {
    val got = Tables.t(spark, sfDir, "events")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.01).as("approx")).head()
    val (exact, approx) = (got.getLong(0), got.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"$approx vs $exact")
  }

  test("q23 as-of tolerance: stale matches are nulled, fresh ones equal q13") {
    val q13m = SparkEntry.queries("q13_asof_join")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4))))).toMap
    SparkEntry.queries("q23_asof_tolerance")(spark, sfDir).collect().foreach { r =>
      val pid = r.getLong(0); val pTs = r.getLong(2)
      if (!r.isNullAt(3)) {
        assert(Some((r.getLong(3), r.getLong(4))) == q13m(pid), "fresh match must equal q13's")
        assert(pTs - r.getLong(4) <= 3600000L && r.getLong(6) == pTs - r.getLong(4))
      } else {
        // either q13 had no match at all, or it was older than the tolerance
        q13m(pid).foreach { case (_, vTs) => assert(pTs - vTs > 3600000L) }
      }
    }
  }

  test("q20 percentiles: the approx (100 TB) path tracks exact within its bound") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.95)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("approx")).head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    // accuracy 10000 -> rank error <= n/10000; at sf0.001 that is ~exact
    assert(math.abs(approx - exact) / exact < 0.01, s"$approx vs $exact")
  }

  test("s03 LSH ANN: dense ranks, and every neighbor shares a sketch band with its query") {
    val res = SparkEntry.queries("s03_ann_lsh")(spark, sfDir)
      .select("q_id", "rank").as[(Long, Long)].collect()
    assert(res.nonEmpty)
    res.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q06 dedup keep-last: exactly one row per PK, and it is the latest") {
    val out = SparkEntry.queries("q06_dedup_keep_last")(spark, sfDir)
    val perKey = out.groupBy("user_id", "event_type").count()
    assert(perKey.filter(col("count") > 1).count() == 0)
    val events = Tables.t(spark, sfDir, "events")
    val maxTs = events.groupBy("user_id", "event_type")
      .agg(max(unix_millis(col("ts"))).as("max_ms"))
    val joined = out.join(maxTs, Seq("user_id", "event_type"))
    assert(joined.filter(col("ts_ms") =!= col("max_ms")).count() == 0)
  }

  test("q11 WMA: null until window full, then matches direct O(n*w) computation") {
    val out = SparkEntry.queries("q11_wma_premium")(spark, sfDir)
      .select("event_type", "event_id", "ts_ms", "value", "wma12").collect()
    val bySeries = out.groupBy(_.getString(0))
    bySeries.foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r.getLong(2), r.getLong(1)))
      sorted.zipWithIndex.foreach { case (r, i) =>
        if (i < 11) assert(r.isNullAt(4), s"row $i should be null (warmup)")
        else {
          val win = sorted.slice(i - 11, i + 1).map(_.getDouble(3))
          val expect = win.zipWithIndex.map { case (v, j) => v * (j + 1) }.sum / 78.0
          val got = r.getDouble(4)
          assert(math.abs(got - expect) < 1e-6, s"row $i: $got vs $expect")
        }
      }
    }
  }

  test("q13 as-of join: every matched view is the latest at-or-before the purchase") {
    val out = SparkEntry.queries("q13_asof_join")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.filter(!_.isNullAt(4)).foreach { r =>
      assert(r.getLong(4) <= r.getLong(2), "view ts must be <= purchase ts")
    }
  }

  test("d03 simhash blocking has full recall at hamming<=3 (vs unblocked join)") {
    // brute-force pairs from the per-doc simhash, recomputed without chunks
    val out = SparkEntry.queries("d03_simhash")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(out.forall(_._3 <= 3))
  }

  test("d05 sign-sketch candidates: every reported pair clears the threshold") {
    val rows = SparkEntry.queries("d05_embedding_neardup")(spark, sfDir).collect()
    rows.foreach(r => assert(r.getDouble(2) >= 0.45))
  }

  test("s02 IVF results are a subset of s01 brute-force corpus with correct ranks") {
    val ivf = SparkEntry.queries("s02_ann_ivf")(spark, sfDir)
      .select("q_id", "rank").as[(Long, Long)].collect()
    // ranks are dense 1..k per query
    ivf.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("m02 feature batch: deterministic checksums, all docs present") {
    val out = SparkEntry.queries("m02_feature_batch")(spark, sfDir)
    val docs = Tables.t(spark, sfDir, "documents")
    assert(out.count() == docs.count())
    assert(out.filter(col("checksum") <= 0).count() == 0)
  }

  test("hash60 is stable and non-negative (oracle compatibility)") {
    val got = spark.range(1).select(F.hash60(lit("x")).as("h")).head().getLong(0)
    assert(got == 710810379057940483L) // matches DuckDB ('0x'||substr(md5('x'),1,15))::BIGINT
  }

  test("d02 LSH recall: every brute-force pair with jaccard >= 0.9 is found") {
    // ground truth: driver-side brute force over the sf0.001 documents
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), F.words(col("text")).as("ws")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).sliding(3).map(_.mkString(" ")).toSet)
      .filter(_._2.nonEmpty)
    val truth = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      (ida, sa) = docs(i); (idb, sb) = docs(j)
      inter = (sa & sb).size
      jac = inter.toDouble / (sa.size + sb.size - inter)
      if jac >= 0.9
    } yield (math.min(ida, idb), math.max(ida, idb))).toSet
    assert(truth.nonEmpty, "testdata should contain planted near-dups")
    val found = SparkEntry.queries("d02_minhash_lsh")(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val missed = truth -- found
    assert(missed.isEmpty, s"LSH missed ${missed.size}/${truth.size} true near-dup pairs: $missed")
  }
}
