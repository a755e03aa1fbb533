package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact Jaccard similarity of two string arrays that are already
  * element-distinct (SURVEY.md §2 #23's confirm step): |A∩B| via one
  * hash set, |A∩B| / (|A|+|B|−|A∩B|) as a double — the same value as
  * `size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect))`
  * but in one codegen'd call instead of an interpreted ArrayIntersect
  * (CodegenFallback) per candidate pair. Contract: non-null distinct
  * elements (callers pass `array_distinct` outputs). */
case class ArrayJaccard(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // two empty arrays -> 0/0 -> NULL (try_divide semantics; the composed
  // form under ANSI would throw), so always nullable
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() == 0 && y.numElements() == 0) null
    else SetImpl.jaccard(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() == 0 && $b.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.SetImpl.jaccard($a, $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two equal-length long arrays agree —
  * the minhash signature agreement used for est_sim (#21). Replaces an
  * interpreted zip_with/aggregate pair evaluated per candidate row. */
case class SigAgree(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sig_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetImpl.agree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SetImpl.agree($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Highest occurrence count of any n-token gram in a token array —
  * the mode of the row's own n-gram multiset (t05's top-bigram signal)
  * computed per row with a hash map, instead of exploding every gram
  * of the corpus through a two-level groupBy and joining back. Turns
  * the operator map-only. Contract: non-null tokens; returns NULL when
  * the array has fewer than n tokens. */
case class TopNgramCount(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "graft_top_ngram_count requires n >= 1")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_top_ngram_count"

  override protected def nullSafeEval(ws: Any): Any = {
    val r = SetImpl.topNgramCount(ws.asInstanceOf[ArrayData], n)
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.SetImpl.topNgramCount($c, $n);
         |${ev.isNull} = ${ev.value} < 0;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static implementations callable from generated code. */
object SetImpl {

  /** Contract: not both arrays empty (the expression nulls that case). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val (small, large, ns, nl) = if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nl) { if (set.contains(large.getUTF8String(i))) inter += 1; i += 1 }
    inter.toDouble / (na + nb - inter).toDouble
  }

  def agree(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0L
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }

  /** -1 is the in-band null (fewer than n tokens). */
  def topNgramCount(ws: ArrayData, n: Int): Long = {
    val nw = ws.numElements()
    val ngrams = nw - n + 1
    if (ngrams < 1) return -1L
    val counts = new java.util.HashMap[UTF8String, Array[Int]](ngrams * 2)
    var best = 0
    var i = 0
    while (i < ngrams) {
      // n-gram key: tokens joined by a space (same text as concat_ws)
      var len = n - 1
      var j = 0
      while (j < n) { len += ws.getUTF8String(i + j).numBytes(); j += 1 }
      val bytes = new Array[Byte](len)
      var off = 0
      j = 0
      while (j < n) {
        if (j > 0) { bytes(off) = ' '; off += 1 }
        val t = ws.getUTF8String(i + j)
        t.writeToMemory(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += t.numBytes()
        j += 1
      }
      val key = UTF8String.fromBytes(bytes)
      var c = counts.get(key)
      if (c == null) { c = Array(0); counts.put(key, c) }
      c(0) += 1
      if (c(0) > best) best = c(0)
      i += 1
    }
    best.toLong
  }
}
