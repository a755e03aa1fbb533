package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}

/** Native Catalyst expressions for fixed-work vector math.
  *
  * Why not compose built-ins? The two usable encodings both lose:
  * higher-order functions (`aggregate`/`zip_with`) evaluate their
  * lambdas interpreted per element (~50µs/pair in LSH joins), and an
  * unrolled 64-term expression tree makes janino-compiled stages big
  * and slow to build. A BinaryExpression with `doGenCode` emits one
  * tight Java loop over `ArrayData` — full whole-stage codegen, O(1)
  * bytecode, no boxing. This is preference order (b) from the build
  * brief: a custom scalar Expression, registered through the public
  * `SparkSessionExtensions` hook ([[GraftExtensions]]).
  *
  * Null contract (both expressions): mirrors the composed HOF form
  * `aggregate(zip_with(a,b,(x,y)->x*y),0.0,(s,v)->s+v)` exactly —
  * NULL if either array is NULL, if lengths differ (zip_with pads the
  * shorter side with nulls → the fold goes NULL), or if any element in
  * range is NULL. This is what lets [[NativeVectorRewrite]] substitute
  * the native loop for the HOF shape unconditionally. When both child
  * types are `array<double not null>` the per-element null check is
  * statically elided — the hot path is the same two-load-FMA loop.
  *
  * Float-math contract: sequential left fold (s += aᵢ·bᵢ), identical
  * to the DuckDB oracle's `list_reduce` index fold — see
  * [[graft.OracleSql.seqDot]].
  */
trait VectorBinary extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  // NULL on length mismatch even for non-null children, so always nullable
  override def nullable: Boolean = true
  // SQL callers get analyzer-inserted casts (array<int> → array<double>)
  // or a clean resolution failure; without this, codegen's getDouble
  // would reinterpret raw int bytes silently.
  // (return type inferred: AbstractDataType itself is private[sql])
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  /** true unless BOTH children are statically array<double not null> —
    * drives elision of the per-element null branch in eval and codegen. */
  protected lazy val elemsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })
}

case class DotProduct(left: Expression, right: Expression) extends VectorBinary {
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (elemsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val nullCheck =
        if (elemsNullable)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    ${ev.value} += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity in ONE pass: dot, ‖a‖² and ‖b‖² accumulate in the
  * same loop (a third of the array traffic of three separate folds).
  * Accumulation order per term matches the oracle's three sequential
  * folds exactly — each accumulator is its own left fold. Null contract
  * as [[DotProduct]] (NULL on null array / length mismatch / null
  * element), mirroring what the three composed HOF folds would return. */
case class CosineSim(left: Expression, right: Expression) extends VectorBinary {
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (elemsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      s += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    s / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val nullCheck =
        if (elemsNullable)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0; double $na = 0.0; double $nb = 0.0;
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $xv = $x.getDouble($i);
         |    double $yv = $y.getDouble($i);
         |    $s += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $s / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `bits` random-hyperplane sign bits of the LSH sketch in ONE
  * array pass per plane, one expression evaluation total — replaces
  * `bits` separate dot-product folds (each its own codegen'd call
  * re-reading the array and a literal plane). The ±1 planes are
  * [[graft.ops.DedupOps.planesFor]] verbatim (md5 parity), flattened
  * into a primitive double[] referenced from generated code.
  *
  * Value contract mirrors the composed form
  * `CASE WHEN aggregate(zip_with(v, plane, *), 0.0, +) > 0 THEN bit ELSE 0`
  * summed over planes, BIT-EXACTLY: per plane the fold is the same
  * sequential s += v(i)·(±1.0) from 0.0; a length mismatch or null
  * element makes every plane's CASE yield 0 ⇒ sketch 0L (not NULL —
  * matching zip_with's null-pad fold); NULL only for a NULL array. */
case class SignSketch(child: Expression, bits: Int, dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 60 && dims >= 1, s"bits in [1,60], dims >= 1; got $bits/$dims")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_signsketch"
  override def inputTypes = Seq(ArrayType(DoubleType))

  @transient private lazy val planes: Array[Double] =
    graft.ops.DedupOps.planesFor(bits, dims).flatten.map(_.toDouble).toArray

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dims) return 0L
    var sk = 0L
    var p = 0
    while (p < bits) {
      var s = 0.0
      var i = 0
      var nul = false
      while (i < dims && !nul) {
        if (x.isNullAt(i)) nul = true
        else { s += x.getDouble(i) * planes(p * dims + i); i += 1 }
      }
      if (nul) return 0L
      if (s > 0.0) sk |= 1L << p
      p += 1
    }
    sk
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val pl = ctx.addReferenceObj("planes", planes, "double[]")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val sk = ctx.freshName("sk")
      val nul = ctx.freshName("nul")
      s"""
         |long $sk = 0L;
         |boolean $nul = ($x.numElements() != $dims);
         |if (!$nul) {
         |  for (int $p = 0; $p < $bits && !$nul; $p++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dims; $i++) {
         |      if ($x.isNullAt($i)) { $nul = true; break; }
         |      $s += $x.getDouble($i) * $pl[$p * $dims + $i];
         |    }
         |    if (!$nul && $s > 0.0) $sk |= 1L << $p;
         |  }
         |}
         |${ev.value} = $nul ? 0L : $sk;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Upper-bound binary search of a double against a SORTED boundary
  * array: returns the count of boundaries ≤ the value, an int in
  * [0, len]. The generic quantile-bucketizer primitive (non-uniform
  * `width_bucket`): boundaries come from `approxQuantile` on the
  * driver and ship to executors as one referenced double[]; the
  * per-row cost is a codegen'd O(log len) loop — the built-in
  * alternatives are a len-deep CASE chain or an interpreted
  * `aggregate` lambda over a literal array, both O(len)/row.
  * Duplicate boundaries (a skewed quantile grid) resolve to the
  * upper bound, so equal values always land in one bucket. */
case class SearchSorted(child: Expression, boundaries: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  require(boundaries.nonEmpty, "boundaries must be non-empty")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_searchsorted"
  override def inputTypes = Seq(DoubleType)

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[Double]
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.addReferenceObj("bounds", boundaries, "double[]")
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi"); val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0; int $hi = $b.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($b[$mid] <= $v) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Public-API registration: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (set by [[graft.Sessions]]). After registration the functions are
  * usable from any SQL/expr context as `graft_dot(a, b)` / `graft_cosine(a, b)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => NativeVectorRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsofStrategy)
    GraftTvfs.register(ext) // SQL TVF surface for the table facades
    ext.injectFunction((new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSim(children.head, children(1))))
    ext.injectFunction((new FunctionIdentifier("graft_stopcount"),
      new ExpressionInfo(classOf[StopCount].getName, "graft_stopcount"),
      (children: Seq[Expression]) => {
        arity("graft_stopcount", "(text, array<string> stopwords)", children, 2)
        StopCount(children.head, litStringArray("graft_stopcount", children(1), "stopwords"))
      }))
    ext.injectFunction((new FunctionIdentifier("graft_total_strlen"),
      new ExpressionInfo(classOf[TotalStrLen].getName, "graft_total_strlen"),
      (children: Seq[Expression]) => TotalStrLen(children.head)))
    ext.injectFunction((new FunctionIdentifier("graft_subword_est"),
      new ExpressionInfo(classOf[SubwordEst].getName, "graft_subword_est"),
      (children: Seq[Expression]) => SubwordEst(children.head)))
    ext.injectFunction((new FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[ArrayJaccard].getName, "graft_jaccard"),
      (children: Seq[Expression]) => ArrayJaccard(children.head, children(1))))
    ext.injectFunction((new FunctionIdentifier("graft_sig_agree"),
      new ExpressionInfo(classOf[SigAgree].getName, "graft_sig_agree"),
      (children: Seq[Expression]) => SigAgree(children.head, children(1))))
    ext.injectFunction((new FunctionIdentifier("graft_top_ngram_count"),
      new ExpressionInfo(classOf[TopNgramCount].getName, "graft_top_ngram_count"),
      (children: Seq[Expression]) => {
        arity("graft_top_ngram_count", "(text, int n)", children, 2)
        TopNgramCount(children.head, litInt("graft_top_ngram_count", children(1), "n"))
      }))
    ext.injectFunction((new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        arity("graft_simhash", "(text, int bits)", children, 2)
        SimHash(children.head, litInt("graft_simhash", children(1), "bits"))
      }))
    ext.injectFunction((new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[ShingleMinHash].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        arity("graft_minhash", "(text, int shingle, int k)", children, 3)
        ShingleMinHash(children.head,
          litInt("graft_minhash", children(1), "shingle"),
          litInt("graft_minhash", children(2), "k"))
      }))
    ext.injectFunction((new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "graft_winnow"),
      (children: Seq[Expression]) => {
        arity("graft_winnow", "(text, int k, int window)", children, 3)
        WinnowFingerprint(children.head,
          litInt("graft_winnow", children(1), "k"),
          litInt("graft_winnow", children(2), "window"))
      }))
    ext.injectFunction((new FunctionIdentifier("graft_cdc"),
      new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc"),
      (children: Seq[Expression]) => {
        arity("graft_cdc", "(binary payload, int maskBits, int minLen, int maxLen)", children, 4)
        CdcChunks(children.head,
          litInt("graft_cdc", children(1), "maskBits"),
          litInt("graft_cdc", children(2), "minLen"),
          litInt("graft_cdc", children(3), "maxLen"))
      }))
    ext.injectFunction((new FunctionIdentifier("graft_winnow_set"),
      new ExpressionInfo(classOf[WinnowSet].getName, "graft_winnow_set"),
      (children: Seq[Expression]) => {
        arity("graft_winnow_set", "(text, int k, int window)", children, 3)
        WinnowSet(children.head,
          litInt("graft_winnow_set", children(1), "k"),
          litInt("graft_winnow_set", children(2), "window"))
      }))
    ext.injectFunction((new FunctionIdentifier("graft_signsketch"),
      new ExpressionInfo(classOf[SignSketch].getName, "graft_signsketch"),
      (children: Seq[Expression]) => {
        arity("graft_signsketch", "(array<double> vec, int bits, int dims)", children, 3)
        SignSketch(children.head,
          litInt("graft_signsketch", children(1), "bits"),
          litInt("graft_signsketch", children(2), "dims"))
      }))
    ext.injectFunction((new FunctionIdentifier("graft_searchsorted"),
      new ExpressionInfo(classOf[SearchSorted].getName, "graft_searchsorted"),
      (children: Seq[Expression]) => {
        arity("graft_searchsorted", "(double value, array<numeric> sorted boundaries)", children, 2)
        SearchSorted(children.head,
          litDoubleArray("graft_searchsorted", children(1), "boundaries", requireSorted = true))
      }))
    ext.injectFunction((new FunctionIdentifier("graft_bpe_merge"),
      new ExpressionInfo(classOf[BpeMerge].getName, "graft_bpe_merge"),
      (children: Seq[Expression]) => {
        arity("graft_bpe_merge", "(array<string> symbols, string left, string right)", children, 3)
        BpeMerge(children.head,
          litString("graft_bpe_merge", children(1), "left"),
          litString("graft_bpe_merge", children(2), "right"))
      }))
  }
}

/** Builder-argument validation for the SQL-registered kernels. The
  * non-column arguments (bits/dims/boundaries/stopwords) are expression
  * constructor parameters, so they must be FOLDABLE literals — a raw
  * `.eval().asInstanceOf` on a column reference or a wrongly-typed
  * literal dies with an opaque ClassCastException/NPE mid-analysis.
  * These helpers fail resolution with the expected signature instead. */
object GraftExtensions {
  import org.apache.spark.sql.types._

  private def bad(fn: String, why: String): Nothing =
    throw new AnalysisException(
      s"$fn: $why", None, None, None, None,
      Map.empty[String, String], Array.empty[org.apache.spark.QueryContext])

  private[functions] def arity(fn: String, usage: String, children: Seq[Expression], n: Int): Unit =
    if (children.length != n)
      bad(fn, s"takes $n arguments $usage, got ${children.length}")

  private[functions] def litInt(fn: String, e: Expression, name: String): Int = {
    val ok = e.foldable && (e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    if (!ok) bad(fn, s"argument `$name` must be a foldable integer literal, " +
      s"got ${e.dataType.simpleString} (foldable=${e.foldable})")
    e.eval() match {
      case n: Number => n.intValue
      case _ => bad(fn, s"argument `$name` must not be NULL")
    }
  }

  private[functions] def litString(fn: String, e: Expression, name: String): String = {
    if (!e.foldable || e.dataType != StringType)
      bad(fn, s"argument `$name` must be a foldable string literal, " +
        s"got ${e.dataType.simpleString} (foldable=${e.foldable})")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case _ => bad(fn, s"argument `$name` must not be NULL")
    }
  }

  private[functions] def litStringArray(fn: String, e: Expression, name: String): Seq[String] = {
    val ok = e.foldable && (e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (!ok) bad(fn, s"argument `$name` must be a foldable array<string> literal, " +
      s"got ${e.dataType.simpleString} (foldable=${e.foldable})")
    e.eval() match {
      case arr: ArrayData =>
        (0 until arr.numElements()).map { i =>
          if (arr.isNullAt(i)) bad(fn, s"argument `$name` must not contain NULL elements")
          arr.getUTF8String(i).toString
        }
      case _ => bad(fn, s"argument `$name` must not be NULL")
    }
  }

  private[functions] def litDoubleArray(fn: String, e: Expression, name: String,
                                        requireSorted: Boolean): Array[Double] = {
    val elemType = e.dataType match {
      case ArrayType(t @ (ByteType | ShortType | IntegerType | LongType |
                          FloatType | DoubleType), _) if e.foldable => t
      case t => bad(fn, s"argument `$name` must be a foldable array<numeric> literal, " +
        s"got ${t.simpleString} (foldable=${e.foldable})")
    }
    val out = e.eval() match {
      case arr: ArrayData =>
        Array.tabulate(arr.numElements()) { i =>
          if (arr.isNullAt(i)) bad(fn, s"argument `$name` must not contain NULL elements")
          elemType match {
            case DoubleType => arr.getDouble(i)
            case FloatType => arr.getFloat(i).toDouble
            case LongType => arr.getLong(i).toDouble
            case IntegerType => arr.getInt(i).toDouble
            case ShortType => arr.getShort(i).toDouble
            case _ => arr.getByte(i).toDouble
          }
        }
      case _ => bad(fn, s"argument `$name` must not be NULL")
    }
    if (out.isEmpty) bad(fn, s"argument `$name` must be non-empty")
    if (requireSorted && out.indices.tail.exists(i => out(i) < out(i - 1)))
      bad(fn, s"argument `$name` must be sorted ascending")
    out
  }
}
