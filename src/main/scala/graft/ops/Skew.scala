package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys overflow a single task.
  *
  * AQE's skew-join split handles sort-merge skew at runtime; salting is
  * the declarative fallback when one join key dominates (the
  * reference's data has exactly this shape: a handful of symbols carry
  * most of the volume). The fact side gets a deterministic salt from
  * its row content; the dim side is replicated once per salt value, so
  * the join key becomes (key, salt) and the hot key spreads over
  * `salts` tasks. Deterministic (md5-based, no rand()) so plans stay
  * reproducible and re-executable.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted `salts` ways.
    *
    * @param factSaltSrc column whose hash spreads the fact side (use a
    *                    high-cardinality column, e.g. the PK)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factSaltSrc: Column, salts: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(conv(substring(md5(factSaltSrc.cast("string")), 1, 7), 16, 10).cast("long"), lit(salts.toLong)).cast("int"))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
