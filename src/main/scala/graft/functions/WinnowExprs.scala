package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MOSS winnowing fingerprint (SURVEY.md §2 #30).
  *
  * The composed form — `transform(sequence(...), i -> conv(substr(md5(
  * substring(text,i,k)),1,15),16,10))` then a second transform for the
  * window minima — pays the interpreted-lambda tax on every k-gram
  * (~6µs/gram: per-element substring, hex md5, string conv, plus a
  * `slice` allocation per window). One document of 300 chars is ~300
  * lambda round-trips. This expression does the whole scheme in a
  * single typed pass: md5 of each k-gram's UTF-8 bytes (thread-local
  * MessageDigest, no hex round-trip — the 60-bit value is read straight
  * off the digest), O(1)-amortized sliding-window minima, and the
  * distinct-set summary (count/min/max/xor), returning one struct.
  * ~10× over the HOF chain; whole-stage codegen keeps the loop in the
  * generated stage via a static call.
  *
  * Value contract (bit-identical to the composed form and the DuckDB
  * oracle `CAST('0x' || substr(md5(substring(text,i,k)),1,15) AS
  * BIGINT)`): gram hash = first 60 bits of md5 over the gram's UTF-8
  * bytes, code-point substrings (non-ASCII safe). Returns NULL when
  * fewer than `w` grams exist (callers filter `length >= k + w - 1`).
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k >= 1 && w >= 1, "graft_winnow requires k >= 1, w >= 1")

  override def dataType: DataType = WinnowFingerprint.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(t: Any): Any =
    Winnow.compute(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.Winnow.compute($c, $k, $w);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprint {
  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_fp", LongType, nullable = false),
    StructField("fp_min", LongType, nullable = false),
    StructField("fp_max", LongType, nullable = false),
    StructField("fp_xor", LongType, nullable = false)))
}

/** [[WinnowFingerprint]]'s sibling returning the fingerprint SET
  * itself — the sorted distinct window minima as array<long> — for
  * plans that JOIN on fingerprints (MOSS-style overlap detection,
  * [[graft.ops.TextOps.winnowPairsOf]]) rather than summarize them.
  * Same gram hashing, same winnowing, same NULL contract; the sort
  * makes the array deterministic and oracle-comparable
  * (`list_sort(list_distinct(wins))`). */
case class WinnowSet(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, "graft_winnow_set requires k >= 1, w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow_set"

  override protected def nullSafeEval(t: Any): Any =
    Winnow.computeSet(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.Winnow.computeSet($c, $k, $w);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The computation behind [[WinnowFingerprint]], as a static method so
  * generated code can call it directly. */
object Winnow {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def hash60(md: java.security.MessageDigest, bytes: Array[Byte], off: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    // first 15 hex chars == first 60 bits, big-endian — same value as
    // conv(substr(md5_hex, 1, 15), 16, 10)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  /** All k-gram 60-bit hashes of `s`, or null when fewer than `w`
    * grams exist — the shared front half of both kernels. */
  private def gramHashes(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val bytes = s.getBytes
    val n = s.numChars()
    val nGrams = n - k + 1
    if (nGrams < w) return null
    val md = digest.get()
    val grams = new Array[Long](nGrams)
    if (bytes.length == n) {
      // ASCII fast path: byte offsets == code-point offsets
      var i = 0
      while (i < nGrams) { grams(i) = hash60(md, bytes, i, k); i += 1 }
    } else {
      // map code-point index -> byte offset once, then hash byte ranges
      val starts = new Array[Int](n + 1)
      var p = 0; var c = 0
      while (p < bytes.length) {
        starts(c) = p
        val b = bytes(p) & 0xff
        p += (if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4)
        c += 1
      }
      starts(n) = bytes.length
      var i = 0
      while (i < nGrams) {
        grams(i) = hash60(md, bytes, starts(i), starts(i + k) - starts(i))
        i += 1
      }
    }
    grams
  }

  /** @return InternalRow(n_grams, n_fp, fp_min, fp_max, fp_xor), or
    *         null when the text has fewer than w k-grams. */
  def compute(s: UTF8String, k: Int, w: Int): InternalRow = {
    val grams = gramHashes(s, k, w)
    if (grams == null) return null
    val nGrams = grams.length
    // winnow: min per w-window, summarized over the DISTINCT minima
    var fpMin = Long.MaxValue; var fpMax = Long.MinValue; var fpXor = 0L; var nFp = 0L
    val seen = new java.util.HashSet[java.lang.Long](math.min(nGrams, 1 << 16))
    val nw = nGrams - w + 1
    var j = 0
    while (j < nw) {
      var m = grams(j); var q = 1
      while (q < w) { val v = grams(j + q); if (v < m) m = v; q += 1 }
      if (seen.add(m)) {
        nFp += 1; fpXor ^= m
        if (m < fpMin) fpMin = m
        if (m > fpMax) fpMax = m
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](nGrams.toLong, nFp, fpMin, fpMax, fpXor))
  }

  /** @return the SORTED distinct window minima as ArrayData, or null
    *         when the text has fewer than w k-grams. */
  def computeSet(s: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val grams = gramHashes(s, k, w)
    if (grams == null) return null
    val nGrams = grams.length
    val seen = new java.util.HashSet[java.lang.Long](math.min(nGrams, 1 << 16))
    val nw = nGrams - w + 1
    var j = 0
    while (j < nw) {
      var m = grams(j); var q = 1
      while (q < w) { val v = grams(j + q); if (v < m) m = v; q += 1 }
      seen.add(m)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}
