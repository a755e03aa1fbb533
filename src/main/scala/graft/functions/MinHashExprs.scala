package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature over word shingles (SURVEY.md §2 #21/#23).
  *
  * Replaces the composed form
  * `aggregate(transform(sh, s -> conv(substr(md5(s),1,7),16,10)), ...,
  * zip_with-least fold)`: every md5 there runs through an interpreted
  * lambda (HOF lambdas never codegen), and the k-way fold allocates two
  * arrays per shingle. This expression takes the token array, forms
  * each n-word shingle's UTF-8 bytes directly into a thread-local
  * MessageDigest (never materializing the shingle string), reads the
  * 28-bit base hash off the digest, and updates all k minima in place —
  * one typed pass, no per-element allocation.
  *
  * Value contract (bit-identical to the composed Spark form and the
  * DuckDB oracle): base hash g = first 7 hex chars of
  * md5(concat_ws(' ', shingle words)) as a 28-bit int; signature[i] =
  * min over shingles of (2i+3)·g + 12289·i + 1 mod 2²⁹ (all terms
  * positive — pmod == %). Returns NULL when fewer than one shingle
  * exists (callers filter `size(ws) >= n`).
  */
case class ShingleMinHash(child: Expression, n: Int, k: Int)
  extends UnaryExpression {

  require(n >= 1 && k >= 1, "graft_minhash requires n >= 1, k >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(ws: Any): Any =
    MinHash.compute(ws.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHash.compute($c, $n, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The computation behind [[ShingleMinHash]], static for generated code. */
object MinHash {
  private val MOD = 536870912L // 2^29
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** @return array of k minhash values, or null when the token array
    *         has fewer than n words (no shingles). */
  def compute(ws: ArrayData, n: Int, k: Int): ArrayData = {
    val nw = ws.numElements()
    val nSh = nw - n + 1
    if (nSh < 1) return null
    val md = digest.get()
    // pre-fetch token bytes once (each token participates in n shingles)
    val toks = new Array[Array[Byte]](nw)
    var p = 0
    while (p < nw) { toks(p) = ws.getUTF8String(p).getBytes; p += 1 }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, MOD)
    var i = 0
    while (i < nSh) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks(i + j))
        j += 1
      }
      val d = md.digest()
      // first 7 hex chars == first 28 bits, big-endian — same value as
      // conv(substr(md5_hex, 1, 7), 16, 10)
      val g = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
      var t = 0
      while (t < k) {
        val v = ((2 * t + 3) * g + 12289L * t + 1L) % MOD
        if (v < mins(t)) mins(t) = v
        t += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
