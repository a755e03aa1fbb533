package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL table-valued-function surface for the [[graft.Graft]] facades —
  * the non-Scala user's door into the engine. The kernels already ride
  * `SparkSessionExtensions` (scalar functions, optimizer rule, as-of
  * strategy); this registers the top TABLE operators the same way, via
  * the public `injectTableFunction` hook, so a SQL-only caller can run
  *
  *   SELECT * FROM graft_asof_join('trades', 'quotes', 'sym', 'ts', 'px')
  *   SELECT * FROM graft_resample_ohlc('events', 'event_type', 'ts',
  *                                     'event_id', 'value', 'hour')
  *
  * Contract: every argument is a foldable literal; TABLE arguments are
  * passed by NAME (a temp view or catalog table — resolved through the
  * active session's catalog at analysis time, so the TVF plan inlines
  * the view's plan and Catalyst optimizes straight through it: filters
  * over the TVF push into the underlying scan exactly as they do for
  * the Scala facade). Column lists ride as comma-separated strings
  * (SQL TVF argument lists are flat expressions — no array-of-identifier
  * syntax exists to do better). Each builder delegates to the SAME
  * facade the Scala API calls: one implementation, two surfaces. */
object GraftTvfs {

  private def fail(fn: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"$fn: $msg")

  private def strArg(fn: String, args: Seq[Expression], i: Int): String = {
    if (i >= args.length) fail(fn, s"missing argument ${i + 1}")
    val e = args(i)
    if (!e.foldable) fail(fn, s"argument ${i + 1} must be a literal string")
    Option(e.eval()).map(_.toString).getOrElse(fail(fn, s"argument ${i + 1} is null"))
  }

  private def numArg(fn: String, args: Seq[Expression], i: Int): Double = {
    if (i >= args.length) fail(fn, s"missing argument ${i + 1}")
    val e = args(i)
    if (!e.foldable) fail(fn, s"argument ${i + 1} must be a numeric literal")
    e.eval() match {
      case n: java.lang.Number => n.doubleValue()
      // SQL fractional literals fold to Spark Decimal, not a JDK Number
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => fail(fn, s"argument ${i + 1} must be numeric, got $other")
    }
  }

  private def optStrArg(fn: String, args: Seq[Expression], i: Int,
                        default: String): String =
    if (i < args.length) strArg(fn, args, i) else default

  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def table(name: String): DataFrame = SparkSession.active.table(name)

  /** One TVF registration: name + a builder from literal args to the
    * facade's (unanalyzed) logical plan — the analyzer then resolves
    * the whole subtree inside the calling query. */
  private def tvf(name: String)(build: Seq[Expression] => DataFrame):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(GraftTvfs.getClass.getName, name),
      (args: Seq[Expression]) => build(args).queryExecution.logical)

  /** All table functions, registered by [[GraftExtensions]]. */
  private[functions] def registrations: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] = Seq(

    // graft_asof_join(left, right, key, ts, carryCsv [, direction])
    tvf("graft_asof_join") { a =>
      graft.Graft.asofJoin(table(strArg("graft_asof_join", a, 0)),
        table(strArg("graft_asof_join", a, 1)),
        strArg("graft_asof_join", a, 2), strArg("graft_asof_join", a, 3),
        csv(strArg("graft_asof_join", a, 4)),
        optStrArg("graft_asof_join", a, 5, "backward"))
    },

    // graft_fill_gaps(view, key, bucket, value [, step [, mode]])
    tvf("graft_fill_gaps") { a =>
      graft.Graft.fillGaps(table(strArg("graft_fill_gaps", a, 0)),
        strArg("graft_fill_gaps", a, 1), strArg("graft_fill_gaps", a, 2),
        strArg("graft_fill_gaps", a, 3),
        optStrArg("graft_fill_gaps", a, 4, "interval 1 hour"),
        optStrArg("graft_fill_gaps", a, 5, "ffill"))
    },

    // graft_resample_ohlc(view, key, ts, id, value, unit)
    tvf("graft_resample_ohlc") { a =>
      graft.Graft.resampleOhlc(table(strArg("graft_resample_ohlc", a, 0)),
        strArg("graft_resample_ohlc", a, 1), strArg("graft_resample_ohlc", a, 2),
        strArg("graft_resample_ohlc", a, 3), strArg("graft_resample_ohlc", a, 4),
        strArg("graft_resample_ohlc", a, 5))
    },

    // graft_dedup_keep_last(view, keysCsv, priorityCsv)
    tvf("graft_dedup_keep_last") { a =>
      graft.Graft.dedupKeepLast(table(strArg("graft_dedup_keep_last", a, 0)),
        csv(strArg("graft_dedup_keep_last", a, 1)),
        csv(strArg("graft_dedup_keep_last", a, 2))
          .map(org.apache.spark.sql.functions.col))
    },

    // graft_minhash_pairs(docs, id, text, shingleN, k, bands)
    tvf("graft_minhash_pairs") { a =>
      graft.Graft.minhashPairs(table(strArg("graft_minhash_pairs", a, 0)),
        strArg("graft_minhash_pairs", a, 1), strArg("graft_minhash_pairs", a, 2),
        numArg("graft_minhash_pairs", a, 3).toInt,
        numArg("graft_minhash_pairs", a, 4).toInt,
        numArg("graft_minhash_pairs", a, 5).toInt)
    },

    // graft_components(pairs, aCol, bCol)
    tvf("graft_components") { a =>
      graft.Graft.connectedComponents(table(strArg("graft_components", a, 0)),
        strArg("graft_components", a, 1), strArg("graft_components", a, 2))
    },

    // graft_winsorize(view, key, value, lo, hi)
    tvf("graft_winsorize") { a =>
      graft.ops.CoreOps.winsorizeOf(table(strArg("graft_winsorize", a, 0)),
        strArg("graft_winsorize", a, 1), strArg("graft_winsorize", a, 2),
        numArg("graft_winsorize", a, 3), numArg("graft_winsorize", a, 4))
    },

    // graft_quantile_bins(view, key, value, nBins)
    tvf("graft_quantile_bins") { a =>
      graft.ops.CoreOps.quantileBinsOf(table(strArg("graft_quantile_bins", a, 0)),
        strArg("graft_quantile_bins", a, 1), strArg("graft_quantile_bins", a, 2),
        numArg("graft_quantile_bins", a, 3).toInt)
    },

    // graft_ewma_exact(view, key, ts, tie, value, alpha)
    tvf("graft_ewma_exact") { a =>
      graft.Graft.ewmaExact(table(strArg("graft_ewma_exact", a, 0)),
        strArg("graft_ewma_exact", a, 1), strArg("graft_ewma_exact", a, 2),
        strArg("graft_ewma_exact", a, 3), strArg("graft_ewma_exact", a, 4),
        numArg("graft_ewma_exact", a, 5))
    },

    // graft_wma(view, key, ts, id, value, n)
    tvf("graft_wma") { a =>
      graft.Graft.wma(table(strArg("graft_wma", a, 0)),
        strArg("graft_wma", a, 1), strArg("graft_wma", a, 2),
        strArg("graft_wma", a, 3), strArg("graft_wma", a, 4),
        numArg("graft_wma", a, 5).toInt)
    },

    // SELECT * FROM graft_ann_ivf('corpus', 'queries', 'centroids',
    //                             'vec_id', 'v', 'vec_id', 'v', 10, 2)
    tvf("graft_ann_ivf") { a =>
      graft.Graft.annIvf(table(strArg("graft_ann_ivf", a, 0)),
        table(strArg("graft_ann_ivf", a, 1)),
        table(strArg("graft_ann_ivf", a, 2)),
        strArg("graft_ann_ivf", a, 3), strArg("graft_ann_ivf", a, 4),
        strArg("graft_ann_ivf", a, 5), strArg("graft_ann_ivf", a, 6),
        numArg("graft_ann_ivf", a, 7).toInt,
        if (a.length > 8) numArg("graft_ann_ivf", a, 8).toInt else 2)
    },

    // SELECT * FROM graft_ann_graph('corpus', 'queries', 'anchors',
    //                               'vec_id', 'v', 10, 8, 4, 3)
    // (r builds the knnGraph inline; beam/hops drive the search)
    tvf("graft_ann_graph") { a =>
      val corpus = table(strArg("graft_ann_graph", a, 0))
      val anchors = table(strArg("graft_ann_graph", a, 2))
      val id = strArg("graft_ann_graph", a, 3)
      val vec = strArg("graft_ann_graph", a, 4)
      val edges = graft.Graft.knnGraph(corpus, anchors, id, vec, id, vec,
        r = if (a.length > 6) numArg("graft_ann_graph", a, 6).toInt else 8)
      graft.Graft.annGraph(corpus, table(strArg("graft_ann_graph", a, 1)),
        anchors, edges, id, vec,
        k = numArg("graft_ann_graph", a, 5).toInt,
        beam = if (a.length > 7) numArg("graft_ann_graph", a, 7).toInt else 4,
        hops = if (a.length > 8) numArg("graft_ann_graph", a, 8).toInt else 3)
    },

    // SELECT * FROM graft_decontaminate('train', 'bench', 'doc_id', 'text', 8)
    tvf("graft_decontaminate") { a =>
      graft.Graft.decontaminate(table(strArg("graft_decontaminate", a, 0)),
        table(strArg("graft_decontaminate", a, 1)),
        strArg("graft_decontaminate", a, 2), strArg("graft_decontaminate", a, 3),
        if (a.length > 4) numArg("graft_decontaminate", a, 4).toInt else 8)
    })

  def register(ext: SparkSessionExtensions): Unit =
    registrations.foreach(ext.injectTableFunction)
}
