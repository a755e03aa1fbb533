package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout — multi-dimensional locality for
  * a parquet store, the Spark-native analog of a warehouse's
  * `OPTIMIZE ... ZORDER BY (a, b)`.
  *
  * A store sorted by one column prunes beautifully on that column and
  * not at all on the second: every file's min/max envelope on `b`
  * spans the whole domain. Interleaving the bits of both columns'
  * bucket ranks into one z-value and laying files out along it gives
  * every file a tight min/max envelope in BOTH dimensions, so parquet
  * footer stats skip files/row-groups for predicates on EITHER column
  * (the reference's hottest scan pattern — (symbol, time-range) — is
  * exactly this 2-D shape, crypto_data_pipeline_duckdb.py:1720-1764).
  *
  * Scale stance: ranks come from `width_bucket` over the columns'
  * min/max — ONE tiny all-column aggregate (4 doubles on the driver,
  * the k-means-centroid pattern), then the z-value is a pure
  * codegen'd bitwise ladder per row; the only shuffle is the range
  * partition that places rows into files. Skewed domains make some
  * z-buckets hot — `repartitionByRange` still splits them evenly
  * across files (quantile-based boundaries on the z-value itself), at
  * the cost of wider envelopes in the hot region; a rank-based
  * (quantile) bucketizer is the documented upgrade path if a domain
  * is pathologically skewed. */
object ZOrderWriter {

  /** Interleave the low `bits` bits of two non-negative bucket ranks:
    * result bit 2i = bit i of `a`, bit 2i+1 = bit i of `b`. Pure
    * column expression (shift/mask ladder — whole-stage codegen). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    def spread(x: Column): Column = {
      var v = x.cast("bigint")
      v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x3333333333333333L))
      v = v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x5555555555555555L))
      v
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Bucket rank of `c` in [0, 2^bits): uniform `width_bucket` between
    * the column's min and max (inclusive clamp at the top edge). */
  private def rank(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = 1 << bits
    if (hi <= lo) lit(0L) // constant column: every row in bucket 0
    else least(width_bucket(c.cast("double"), lit(lo), lit(hi), lit(n)) - 1, lit(n - 1L))
  }

  /** Write `df` as `numFiles` parquet files laid out along the
    * z-curve of (`colA`, `colB`). File ASSIGNMENT is deterministic for
    * a given input layout (range boundaries come from seeded
    * sampling); intra-file row order is total — and the write
    * byte-reproducible — only when `tieBreak` extends (z) to a unique
    * key. Returns nothing; read the path back with ordinary
    * `spark.read.parquet`. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int, bits: Int = 12,
                    tieBreak: Seq[String] = Nil): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    // one 4-double aggregate on the driver — the k-means-centroid shape
    val r = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    if (r.isNullAt(0)) { // empty input: write the empty table, no layout to pick
      df.write.mode("overwrite").parquet(path)
      return
    }
    val (loA, hiA, loB, hiB) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val z = zValue(rank(col(colA), loA, hiA, bits), rank(col(colB), loB, hiB, bits), bits)
    val ordered = df
      .withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(("__z" +: tieBreak).map(col): _*)
      .drop("__z")
    ordered.write.mode("overwrite").parquet(path)
  }

  /** [[writeZOrdered]] with QUANTILE bucket ranks — the documented
    * upgrade path for pathologically skewed domains, where uniform
    * min/max buckets collapse most rows into a few codes and the
    * z-curve loses that dimension's discrimination. Boundaries come
    * from one `approxQuantile` pass per column (mergeable sketch,
    * 2^bits−1 doubles on the driver); each row's rank is a codegen'd
    * O(bits) binary search (`graft_searchsorted`). Equal-depth codes
    * also balance file sizes under any skew. */
  def writeZOrderedQuantile(df: DataFrame, path: String, colA: String, colB: String,
                            numFiles: Int, bits: Int = 10, relErr: Double = 0.001,
                            tieBreak: Seq[String] = Nil): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val tmp = df.withColumn("__qa", col(colA).cast("double"))
      .withColumn("__qb", col(colB).cast("double"))
    val Seq(bA, bB) = Seq("__qa", "__qb").map(c => tmp.stat.approxQuantile(c, probs, relErr))
    if (bA.isEmpty || bB.isEmpty) { // empty input
      df.write.mode("overwrite").parquet(path)
      return
    }
    def rank(qc: String, bs: Array[Double]) =
      expr(s"graft_searchsorted($qc, array(${bs.map(x => s"${x}D").mkString(",")}))")
    val z = zValue(rank("__qa", bA).cast("bigint"), rank("__qb", bB).cast("bigint"), bits)
    tmp.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(("__z" +: tieBreak).map(col): _*)
      .drop("__z", "__qa", "__qb")
      .write.mode("overwrite").parquet(path)
  }
}
