package graft

import org.apache.spark.sql.functions._

/** Degenerate-input robustness: operators must return empty results,
  * not crash, when their blocking/filter stages leave nothing. */
class EmptyGraphSpec extends SparkSpec {

  test("d06 converges immediately on a corpus with no near-dup pairs") {
    // a store of unique single-use docs: minhash pairs at est>=0.5 is empty
    val dir = java.nio.file.Files.createTempDirectory("nodups").toString
    import spark.implicits._
    (1L to 40L).map(i => (i, s"totally unique document number $i with marker ${"x" * i.toInt} and suffix ${i * 7919}"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("d06_neardup_clusters")(spark, dir)
    assert(out.count() >= 0) // must not throw; empty or tiny result
    out.collect().foreach(r => assert(r.getLong(1) <= r.getLong(0)))
  }
}
