package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token-array kernels for the text-analysis block (t01–t03).
  * Each replaces an interpreted higher-order-function chain —
  * `size(filter(ws, w -> w IN (...)))` scans the IN-list per token per
  * language, `aggregate(ws, 0L, ...)` folds interpreted per token —
  * with a compiled loop. Values are identical; contracts: non-null
  * tokens, NULL in → NULL out (standard null-safe eval). */

/** Count of tokens contained in a fixed stop list (hash-set lookup). */
case class StopCount(child: Expression, stops: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_stopcount"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stops.size * 2)
    stops.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def count(ws: ArrayData): Long = {
    val n = ws.numElements()
    var c = 0L
    var i = 0
    while (i < n) { if (set.contains(ws.getUTF8String(i))) c += 1; i += 1 }
    c
  }

  override protected def nullSafeEval(ws: Any): Any = count(ws.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopCount", this, classOf[StopCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ length(token) in characters — the numerator of mean word length. */
case class TotalStrLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_total_strlen"

  override protected def nullSafeEval(ws: Any): Any =
    TextImpl.totalLen(ws.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextImpl.totalLen($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ ceil(length(token)/4) — the chars/4 BPE-ish subword estimate
  * applied word-wise (t03). Integer arithmetic: ceil(len/4) = (len+3)/4. */
case class SubwordEst(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_subword_est"

  override protected def nullSafeEval(ws: Any): Any =
    TextImpl.subwordEst(ws.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextImpl.subwordEst($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextImpl {
  def totalLen(ws: ArrayData): Long = {
    val n = ws.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += ws.getUTF8String(i).numChars(); i += 1 }
    s
  }

  def subwordEst(ws: ArrayData): Long = {
    val n = ws.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += (ws.getUTF8String(i).numChars() + 3) / 4; i += 1 }
    s
  }
}

/** One greedy left-to-right BPE merge pass: every adjacent (left,
  * right) symbol pair in the array is replaced by their concatenation.
  * The workhorse of [[graft.ops.TextOps.bpeTrainOf]]'s training loop —
  * each round applies the newly-learned merge to every word's symbol
  * sequence map-side (the array is word-length-bounded, so the pass is
  * O(len) per row with zero allocation beyond the output). */
case class BpeMerge(child: Expression, left: String, right: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge"

  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)
  @transient private lazy val lr = UTF8String.fromString(left + right)

  def merge(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && a.getUTF8String(i) == l && a.getUTF8String(i + 1) == r) {
        out.add(lr); i += 2
      } else { out.add(a.getUTF8String(i)); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(ws: Any): Any = merge(ws.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerge", this, classOf[BpeMerge].getName)
    defineCodeGen(ctx, ev, c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.merge($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
