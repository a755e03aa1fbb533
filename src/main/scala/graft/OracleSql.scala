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

  /** Squared L2 distance over 1-based lists — [[graft.F.dist2N]]'s twin. */
  def dist2(a: String, b: String, n: Int): String =
    balSum((1 to n).map(i => s"(($a[$i] - $b[$i]) * ($a[$i] - $b[$i]))"))

  def cosine(a: String, b: String, n: Int): String =
    s"${dot(a, b, n)} / (sqrt(${norm2(a, n)}) * sqrt(${norm2(b, n)}))"

  /** Sequential left-fold dot — mirrors the native loop in
    * [[graft.functions.DotProduct]] (s starts at 0.0; 0.0+t₁ ≡ t₁, so
    * DuckDB's init-less list_reduce is the identical op sequence). */
  def seqDot(a: String, b: String, n: Int): String =
    s"list_reduce(list_transform(generate_series(1, $n), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  /** Mirrors [[graft.functions.CosineSim]]: three independent
    * sequential accumulators. */
  def seqCosine(a: String, b: String, n: Int): String =
    s"${seqDot(a, b, n)} / (sqrt(${seqDot(a, a, n)}) * sqrt(${seqDot(b, b, n)}))"
}
