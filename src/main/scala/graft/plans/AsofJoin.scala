package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a WHOLE-OPERATOR Catalyst extension — the (c)
  * path for operators Spark can't express: a custom [[LogicalPlan]]
  * node, a [[SparkStrategy]], and a physical [[AsofJoinExec]] that
  * co-partitions both inputs on the key, sorts each by (key, ts), and
  * merges them in ONE forward pass per partition with O(1) state (the
  * latest visible right row) — no union row doubling, no window
  * buffering, no range explosion. Registered through
  * `SparkSessionExtensions.injectPlannerStrategy` by
  * [[graft.functions.GraftExtensions]].
  *
  * Semantics are identical to [[graft.Graft.asofJoin]] (its spec runs
  * both): each left row gains the latest right row with rTs <= lTs for
  * its key — that right row's values verbatim, nulls included — plus
  * `asof_ts`; all null when nothing precedes. `right` unique per
  * (key, ts); null keys/timestamps never match. The declarative
  * union+carry plan remains the default facade (whole-stage codegen,
  * one shuffle of L+R); this operator is the lower-level form — one
  * exchange per side and a merge that touches each row exactly once.
  */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        keyL: Attribute, tsL: Attribute,
                        keyR: Attribute, tsR: Attribute,
                        carried: Seq[Attribute], asofTs: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ carried.map(_.withNullability(true)) :+ asofTs
  override def producedAttributes: AttributeSet = AttributeSet(asofTs)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] as [[AsofJoinExec]]; injected via extensions. */
object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofJoinPlan =>
      AsofJoinExec(p.keyL, p.tsL, p.keyR, p.tsR, p.carried, p.asofTs, p.output,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Merge-pass as-of join: children arrive co-partitioned on the key
  * (ClusteredDistribution ⇒ EnsureRequirements inserts/aligns the two
  * hash exchanges) and sorted by (key, ts), so each partition is a
  * single interleaved scan. State per partition is ONE buffered right
  * row — independent of key cardinality, window span, or skew. */
case class AsofJoinExec(keyL: Attribute, tsL: Attribute,
                        keyR: Attribute, tsR: Attribute,
                        carried: Seq[Attribute], asofTs: Attribute,
                        output: Seq[Attribute],
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(keyL)) :: ClusteredDistribution(Seq(keyR)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(keyL, Ascending), SortOrder(tsL, Ascending)),
      Seq(SortOrder(keyR, Ascending), SortOrder(tsR, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyIdx = lOut.indexWhere(_.exprId == keyL.exprId)
    val lTsIdx = lOut.indexWhere(_.exprId == tsL.exprId)
    val rKeyIdx = rOut.indexWhere(_.exprId == keyR.exprId)
    val rTsIdx = rOut.indexWhere(_.exprId == tsR.exprId)
    val carriedIdx = carried.map(a => rOut.indexWhere(_.exprId == a.exprId)).toArray
    val keyDt = keyL.dataType
    val tsDt = tsL.dataType
    val carriedDt = carried.map(_.dataType).toArray
    val nCar = carriedIdx.length
    val outTypes = output.map(_.dataType)

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyDt)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsDt)
      val rBuf = ri.buffered
      val proj = UnsafeProjection.create(
        outTypes.zipWithIndex.map { case (dt, i) =>
          BoundReference(i, dt, nullable = true): Expression })
      val joined = new JoinedRow
      val buf = new GenericInternalRow(nCar + 1) // carried values :+ rts
      val nullBuf = new GenericInternalRow(nCar + 1)
      var haveMatch = false
      var matchKey: Any = null

      li.map { l =>
        val lk = l.get(lKeyIdx, keyDt)
        val lt = l.get(lTsIdx, tsDt)
        if (lk == null || lt == null) {
          // null key/ts never matches; right state is untouched
          proj(joined(l, nullBuf))
        } else {
          var continue = true
          while (continue && rBuf.hasNext) {
            val r = rBuf.head
            val rk = r.get(rKeyIdx, keyDt)
            if (rk == null) rBuf.next() // unmatched by contract; sorted first
            else {
              val kc = keyOrd.compare(rk, lk)
              if (kc > 0) continue = false // right ahead: stop
              else if (kc < 0) {
                // earlier key than every remaining left row (left is
                // sorted): nothing can match it again — discard
                rBuf.next()
              } else {
                val rt = r.get(rTsIdx, tsDt)
                if (rt == null) {
                  rBuf.next() // null ts never becomes visible
                } else if (tsOrd.compare(rt, lt) <= 0) {
                  // visible to this (and every later) left row of the key:
                  // consume and make it the current carried match
                  rBuf.next()
                  matchKey = InternalRow.copyValue(rk)
                  haveMatch = true
                  var i = 0
                  while (i < nCar) {
                    buf.update(i, InternalRow.copyValue(r.get(carriedIdx(i), carriedDt(i))))
                    i += 1
                  }
                  buf.update(nCar, InternalRow.copyValue(rt))
                } else {
                  continue = false // same key, future ts: stop, keep buffered
                }
              }
            }
          }
          val ok = haveMatch && keyOrd.compare(matchKey, lk) == 0
          proj(joined(l, if (ok) buf else nullBuf))
        }
      }
    }
  }
}

/** Builder for the native plan (public surface:
  * [[graft.Graft.asofJoinNative]]). Same output contract and
  * validation as the declarative facade operator. */
object AsofJoin {
  def native(left: DataFrame, right: DataFrame, key: String, ts: String,
             valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns.filterNot(c => c == key || c == ts).toSeq
    val clash = valueCols.filter(c => c == key || c == ts || lCols.contains(c)) ++
      (if (left.columns.contains("asof_ts") || valueCols.contains("asof_ts")) Seq("asof_ts") else Nil)
    require(clash.isEmpty,
      s"asofJoinNative output name collision on ${clash.distinct.mkString(", ")}: " +
        "carried right columns and asof_ts must not collide with left columns")
    val lp = left.queryExecution.analyzed
    // self-join safety: when left and right derive from the same frame
    // they share expression ids, and the analyzer's DeduplicateRelations
    // would rewrite the right subtree UNDER this node while the node's
    // own keyR/tsR fields kept the stale ids (still "resolvable" via the
    // left child). A fresh-alias Project gives the node right-side
    // references that no deduplication can touch.
    val rp0 = right.queryExecution.analyzed
    val rp = Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"asofJoinNative: column $n not found"))
    val rTs = attr(rp, ts)
    val node = AsofJoinPlan(lp, rp, attr(lp, key), attr(lp, ts), attr(rp, key), rTs,
      valueCols.map(attr(rp, _)), AttributeReference("asof_ts", rTs.dataType, nullable = true)())
    GraftSqlBridge.ofRows(left.sparkSession, node)
  }
}
