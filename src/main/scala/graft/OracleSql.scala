package graft

/** DuckDB-SQL text generators that mirror [[F]]'s Column builders
  * operation-for-operation, so float results hash-match the oracle. */
object OracleSql {

  /** Balanced adjacent-pair sum — the same tree [[F.dotN]] builds. */
  def balSum(terms: Seq[String]): String =
    if (terms.sizeIs == 1) terms.head
    else balSum(terms.grouped(2).map(g => if (g.sizeIs == 2) s"(${g(0)} + ${g(1)})" else g(0)).toSeq)

  /** dot(a, b) over 1-based DuckDB list indexing. */
  def dot(a: String, b: String, n: Int): String =
    balSum((1 to n).map(i => s"($a[$i] * $b[$i])"))

  def norm2(a: String, n: Int): String = dot(a, a, n)

  def cosine(a: String, b: String, n: Int): String =
    s"${dot(a, b, n)} / (sqrt(${norm2(a, n)}) * sqrt(${norm2(b, n)}))"
}
