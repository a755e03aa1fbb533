package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (Gear/FastCDC family) over a binary
  * payload — the storage-dedup primitive fixed-size chunking cannot
  * be: inserting one byte shifts EVERY fixed-size chunk boundary after
  * it (0% chunk reuse), while content-defined boundaries re-align
  * within one chunk (the spec proves both properties). One typed pass
  * per payload: rolling gear hash h = (h << 1) + gear(byte), a cut
  * when the low `maskBits` bits are zero (expected chunk length
  * 2^maskBits) clamped to [minLen, maxLen], md5 per chunk.
  *
  * Returns array<struct<md5: string, len: int>> in payload order
  * (lossless partition: lens sum to the payload length). The gear
  * table is deterministic — gear(b) = first 8 bytes of md5("gear:b")
  * — so chunk ids are reproducible across runs/engines/languages.
  * NULL only for a NULL payload; an empty payload chunks to an empty
  * array. */
case class CdcChunks(child: Expression, maskBits: Int, minLen: Int, maxLen: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(maskBits >= 1 && maskBits <= 30, s"maskBits in [1,30], got $maskBits")
  require(1 <= minLen && minLen <= maxLen,
    s"need 1 <= minLen <= maxLen, got $minLen/$maxLen")

  override def dataType: DataType = CdcChunks.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_cdc"
  override def inputTypes = Seq(BinaryType)

  override protected def nullSafeEval(b: Any): Any =
    Cdc.compute(b.asInstanceOf[Array[Byte]], maskBits, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.Cdc.compute($c, $maskBits, $minLen, $maxLen);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {
  val schema: ArrayType = ArrayType(StructType(Seq(
    StructField("md5", StringType, nullable = false),
    StructField("len", IntegerType, nullable = false))), containsNull = false)
}

/** The computation behind [[CdcChunks]], static so generated code can
  * call it directly (the [[Winnow]] pattern). */
object Cdc {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** gear(b) = first 8 bytes (big-endian) of md5("gear:" ++ b's decimal
    * string) — deterministic and language-portable. */
  val gear: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(256) { b =>
      md.reset()
      val d = md.digest(s"gear:$b".getBytes("UTF-8"))
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    }
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest,
                     bytes: Array[Byte], off: Int, len: Int): UTF8String = {
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(bytes: Array[Byte], maskBits: Int, minLen: Int, maxLen: Int): ArrayData = {
    val mask = (1L << maskBits) - 1
    val md = digest.get()
    val chunks = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        chunks += new GenericInternalRow(Array[Any](md5Hex(md, bytes, start, len), len))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length)
      chunks += new GenericInternalRow(
        Array[Any](md5Hex(md, bytes, start, bytes.length - start), bytes.length - start))
    new GenericArrayData(chunks.toArray)
  }
}
