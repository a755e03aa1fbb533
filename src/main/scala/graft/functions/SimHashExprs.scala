package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native weighted SimHash over a token array (SURVEY.md §2 #22).
  *
  * The relational formulation — explode(words) → groupBy(doc, word)
  * count → 60 conditional-sum aggregate columns → re-group per doc —
  * costs two full shuffles of the (doc, word) rows just to weight each
  * word by its count. But Σ_distinct count·(±1) ≡ Σ_occurrences (±1):
  * the same 60 bit-sums fall out of one pass over the row's own token
  * array, no grouping at all. This expression computes md5 per token
  * (thread-local digest, 60-bit value read straight off the digest
  * bytes), accumulates the ±1 bit counters, and assembles the simhash —
  * turning the operator from a 2-shuffle aggregation into a map-only
  * projection. At 100 TB that is the difference between a narrow scan
  * stage and shuffling ~the corpus token count.
  *
  * Value contract (bit-identical to the exploded form and the DuckDB
  * oracle): token hash = first 60 bits of md5(token) big-endian (==
  * `conv(substr(md5(w),1,15),16,10)`); bit b of the result is set iff
  * the signed counter for b is > 0. Returns NULL for an empty token
  * array (callers filter `size(ws) >= 1`).
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 60, "graft_simhash supports 1..60 bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(ws: Any): Any = {
    val r = SimHashImpl.compute(ws.asInstanceOf[ArrayData], bits)
    if (r == java.lang.Long.MIN_VALUE) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.SimHashImpl.compute($c, $bits);
         |${ev.isNull} = ${ev.value} == java.lang.Long.MIN_VALUE;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The computation behind [[SimHash]], static for generated code.
  * Long.MinValue is the in-band null (empty token array) — a real
  * simhash of ≤60 bits is always ≥ 0. */
object SimHashImpl {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(ws: ArrayData, bits: Int): Long = {
    val n = ws.numElements()
    if (n == 0) return java.lang.Long.MIN_VALUE
    val md = digest.get()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(ws.getUTF8String(i).getBytes)
      val d = md.digest()
      // first 15 hex chars == first 60 bits, big-endian
      val h = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) sh |= (1L << b)
      b += 1
    }
    sh
  }
}
