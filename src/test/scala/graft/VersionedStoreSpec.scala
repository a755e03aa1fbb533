package graft

import graft.sinks.VersionedStore
import org.apache.spark.sql.DataFrame

/** VersionedStore: time-travel reconstruction, delta-only storage,
  * idempotent commits, checkpointed reads. */
class VersionedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("vstore").toString + "/t"

  private def sorted(df: DataFrame) =
    df.orderBy("id").collect().map(_.toString).toSeq

  test("three versions round-trip exactly; history stays readable") {
    val path = tmp()
    val v0data = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "score")
    assert(VersionedStore.commit(spark, path, v0data, Seq("id")) == 0)
    // v1: change id 2, delete id 3, add id 4
    val v1data = Seq((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0))
      .toDF("id", "name", "score")
    assert(VersionedStore.commit(spark, path, v1data, Seq("id")) == 1)
    // v2: delete id 1
    val v2data = Seq((2L, "B", 21.0), (4L, "d", 40.0)).toDF("id", "name", "score")
    assert(VersionedStore.commit(spark, path, v2data, Seq("id")) == 2)

    assert(sorted(VersionedStore.read(spark, path, 0, Seq("id"))) == sorted(v0data))
    assert(sorted(VersionedStore.read(spark, path, 1, Seq("id"))) == sorted(v1data))
    assert(sorted(VersionedStore.read(spark, path, 2, Seq("id"))) == sorted(v2data))
    assert(VersionedStore.versions(spark, path) == Seq(0, 1, 2))
  }

  test("deltas store only what changed; re-committing identical data is a no-op") {
    val path = tmp()
    val v0data = (1L to 100L).map(i => (i, s"doc$i")).toDF("id", "text")
    VersionedStore.commit(spark, path, v0data, Seq("id"))
    // v1 touches 3 rows: one changed, one deleted, one added
    val v1data = (1L to 99L).map(i => (i, if (i == 7) "doc7-rev2" else s"doc$i"))
      .toDF("id", "text").union(Seq((101L, "new")).toDF("id", "text"))
    VersionedStore.commit(spark, path, v1data, Seq("id"))
    val delta1 = spark.read.parquet(path).filter($"__v" === 1)
    assert(delta1.count() == 3, "changed + deleted + added rows only")
    assert(delta1.filter($"__op" === "d").select("id").as[Long].collect().toSeq == Seq(100L))
    // identical re-commit: empty delta, version unchanged
    assert(VersionedStore.commit(spark, path, v1data, Seq("id")) == 1)
    assert(VersionedStore.versions(spark, path) == Seq(0, 1))
  }

  test("checkpoint bounds the fold and preserves every version's reads") {
    val path = tmp()
    val v0data = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    val v1data = Seq((1L, 1.5), (3L, 3.0)).toDF("id", "v")
    VersionedStore.commit(spark, path, v0data, Seq("id"))
    VersionedStore.commit(spark, path, v1data, Seq("id"))
    val ck = VersionedStore.checkpoint(spark, path, Seq("id"))
    assert(ck == 2)
    // post-checkpoint commit
    val v3data = Seq((1L, 1.5), (3L, 3.5)).toDF("id", "v")
    assert(VersionedStore.commit(spark, path, v3data, Seq("id")) == 3)
    // reads: pre-checkpoint history intact, post-checkpoint exact
    assert(sorted(VersionedStore.read(spark, path, 0, Seq("id"))) == sorted(v0data))
    assert(sorted(VersionedStore.read(spark, path, 1, Seq("id"))) == sorted(v1data))
    assert(sorted(VersionedStore.read(spark, path, 2, Seq("id"))) == sorted(v1data))
    assert(sorted(VersionedStore.read(spark, path, 3, Seq("id"))) == sorted(v3data))
    // the v3 read folds only versions >= the checkpoint
    val plan = VersionedStore.read(spark, path, 3, Seq("id"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__v") && !plan.contains("__v = 0"),
      s"fold starts at the checkpoint:\n$plan")
  }

  test("incremental ingest ticks land as versions; time travel replays each tick") {
    // the IncrementalPipeline shape: each tick merges a delta batch
    // (keep-last per key), then the merged state commits as a version —
    // the versioned-ingest composition a corpus store runs nightly
    val path = tmp()
    def merged(batches: Seq[(Long, String, Double)]*): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val all = batches.zipWithIndex.map { case (b, i) =>
        b.toDF("id", "sym", "px").withColumn("__tick", lit(i))
      }.reduce(_ unionByName _)
      val w = Window.partitionBy("id").orderBy(col("__tick").desc)
      all.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn", "__tick")
    }
    val t1 = Seq((1L, "a", 10.0), (2L, "b", 20.0))
    val t2 = Seq((2L, "b", 21.0), (3L, "c", 30.0)) // heals 2, adds 3
    VersionedStore.commit(spark, path, merged(t1), Seq("id"))
    VersionedStore.commit(spark, path, merged(t1, t2), Seq("id"))
    assert(sorted(VersionedStore.read(spark, path, 0, Seq("id"))) == sorted(merged(t1)))
    assert(sorted(VersionedStore.read(spark, path, 1, Seq("id"))) == sorted(merged(t1, t2)))
    // the tick-2 delta is exactly the healed row + the new row
    assert(spark.read.parquet(path).filter($"__v" === 1).count() == 2)
  }

  test("a crashed half-written version is invisible and wiped by the retry") {
    val path = tmp()
    val v0data = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    VersionedStore.commit(spark, path, v0data, Seq("id"))
    // simulate a crash: land partition files for __v=1 WITHOUT a marker
    Seq((9L, "junk")).toDF("id", "name")
      .withColumn("__op", org.apache.spark.sql.functions.lit("u"))
      .withColumn("__v", org.apache.spark.sql.functions.lit(1))
      .write.mode("append").partitionBy("__v").parquet(path)
    assert(VersionedStore.versions(spark, path) == Seq(0),
      "unmarked partition is not a version")
    assert(sorted(VersionedStore.read(spark, path, 0, Seq("id"))) == sorted(v0data),
      "reads never see uncommitted rows")
    // the retrying commit wipes the leftover and lands clean
    val v1data = Seq((1L, "a"), (2L, "B")).toDF("id", "name")
    assert(VersionedStore.commit(spark, path, v1data, Seq("id")) == 1)
    assert(sorted(VersionedStore.read(spark, path, 1, Seq("id"))) == sorted(v1data))
    val v1rows = spark.read.parquet(path).filter($"__v" === 1).collect()
    assert(!v1rows.exists(_.getLong(0) == 9L), "junk from the crash is gone")
  }

  test("null content and column order don't confuse the diff hash") {
    val path = tmp()
    val v0data = Seq((1L, Some("x"), 1.0), (2L, None, 2.0))
      .toDF("id", "name", "score")
    VersionedStore.commit(spark, path, v0data, Seq("id"))
    // same data, different column order: no-op commit
    val same = v0data.select("score", "id", "name")
    assert(VersionedStore.commit(spark, path, same, Seq("id")) == 0)
    // null -> value IS a change
    val v1data = Seq((1L, Some("x"), 1.0), (2L, Some("y"), 2.0))
      .toDF("id", "name", "score")
    assert(VersionedStore.commit(spark, path, v1data, Seq("id")) == 1)
    assert(spark.read.parquet(path).filter($"__v" === 1).count() == 1)
  }
}
