package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared codegen-friendly column builders.
  *
  * Everything here composes built-in `org.apache.spark.sql.functions` only,
  * so whole-stage codegen applies end to end; no UDFs. Each helper has an
  * exact DuckDB-SQL twin (documented inline) so query results hash-match
  * the driver's oracle.
  */
object F {

  /** Stable 60-bit hash shared with the oracle.
    *
    * Spark:  conv(substring(md5(x), 1, 15), 16, 10)::long
    * DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT
    *
    * 15 hex chars = 60 bits, always non-negative, fits in int64 in both
    * engines. md5 is identical everywhere, which is what makes MinHash /
    * SimHash / fingerprint results oracle-checkable.
    */
  def hash60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Lowercased word tokens; DuckDB twin: regexp_extract_all(lower(x), '[a-z0-9]+'). */
  def words(c: Column): Column = regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** Timestamp → epoch millis (BIGINT both sides; DuckDB twin: epoch_ms(ts)).
    * All timestamps cross the verify boundary as epoch-ms to dodge
    * ns/us parquet logical-type mismatches between engines. */
  def epochMs(c: Column): Column = unix_millis(c.cast("timestamp"))

  /** Output-boundary rounding: stabilizes float hashes across engines.
    *
    * NOT `round()`: Spark rounds the shortest decimal string HALF_UP while
    * DuckDB rounds the binary double, so exact-half values (e.g.
    * 0.5163125) diverge. floor(x·10ⁿ + 0.5)/10ⁿ is the same IEEE op
    * sequence in both engines → bit-identical. Oracle SQL keeps writing
    * round(X, n); [[graft.SparkEntry]] rewrites it to this form. */
  def r4(c: Column): Column = floor(c * 1e4 + 0.5) / 1e4
  def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** Dot product over array<double> via codegen'd higher-order functions.
    * Sequential left fold == DuckDB list_dot_product evaluation order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm of an array<double>. */
  def norm2(a: Column): Column = aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** Cosine similarity of two array<double> columns.
    * DuckDB twin: list_cosine_similarity(a::DOUBLE[], b::DOUBLE[]). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** array<float> parquet column → array<double> for stable float math. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Fixed-dimension unrolled dot/norm/cosine: higher-order functions
    * (aggregate/zip_with) evaluate their lambdas interpreted per element,
    * which dominates pair-wise similarity joins. For a known dim these
    * unroll to a codegen'd expression tree.
    *
    * The sum is a BALANCED adjacent-pair tree (depth log₂n), not a left
    * fold: janino compiles a 64-deep nested expression pathologically
    * slowly (tens of seconds per stage), while depth-6 nesting is
    * instant. Float addition order changes the result, so the DuckDB
    * oracle ([[graft.OracleSql.dot]]) emits the IDENTICAL balanced
    * parenthesization — both engines run the same IEEE op tree. */
  private def balSum(xs: Seq[Column]): Column =
    if (xs.sizeIs == 1) xs.head
    else balSum(xs.grouped(2).map(g => if (g.sizeIs == 2) g(0) + g(1) else g(0)).toSeq)

  def dotN(a: Column, b: Column, n: Int): Column =
    balSum((0 until n).map(i => a.getItem(i) * b.getItem(i)))

  def norm2N(a: Column, n: Int): Column =
    balSum((0 until n).map(i => a.getItem(i) * a.getItem(i)))

  def cosineN(a: Column, b: Column, n: Int): Column =
    dotN(a, b, n) / (sqrt(norm2N(a, n)) * sqrt(norm2N(b, n)))

  /** Squared L2 distance, fixed dim — same balanced tree as [[dotN]];
    * DuckDB twin: [[OracleSql.dist2]]. */
  def dist2N(a: Column, b: Column, n: Int): Column =
    balSum((0 until n).map { i =>
      val d = a.getItem(i) - b.getItem(i); d * d
    })
}
