package graft

import graft.sinks.ZOrderWriter
import org.apache.spark.sql.functions._

/** Z-order layout: Morton interleave correctness and the property the
  * layout exists for — tight per-file min/max envelopes in BOTH
  * dimensions, so either-column predicates touch few files. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: a on even positions, b on odd") {
    val df = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (5L, 3L),           // 101 ⋈ 011 = 0b011011 + ... = a bits even, b odd
      (0xFFFFL, 0L), (0L, 0xFFFFL), (0xFFFFL, 0xFFFFL)
    ).toDF("a", "b")
    val got = df.select(ZOrderWriter.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    def morton(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val want = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L),
      (0xFFFFL, 0L), (0L, 0xFFFFL), (0xFFFFL, 0xFFFFL)).map((morton _).tupled)
    assert(got == want)
    assert(morton(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL, "16+16 bits fill 32")
  }

  test("z-ordered files have tight envelopes in BOTH dimensions; linear layout in one") {
    val root = java.nio.file.Files.createTempDirectory("zorder").toString
    // a 64x64 grid: two independent uniform dimensions
    val grid = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"),
      col("id").as("payload"))
    val nFiles = 16
    ZOrderWriter.writeZOrdered(grid, s"$root/z", "x", "y", nFiles, tieBreak = Seq("payload"))
    // the comparison layout: same file count, sorted by x only
    grid.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$root/linear")

    def filesTouched(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()

    val zx = filesTouched(s"$root/z", col("x") === 7)
    val zy = filesTouched(s"$root/z", col("y") === 7)
    val lx = filesTouched(s"$root/linear", col("x") === 7)
    val ly = filesTouched(s"$root/linear", col("y") === 7)
    // linear: perfect on its sort key, hopeless on the other
    assert(lx <= 2, s"x-sorted layout must nail x predicates, touched $lx")
    assert(ly == nFiles.toLong, s"x-sorted layout spans all files on y, touched $ly")
    // z-order: BOTH dimensions touch a strict subset (√n-ish per slice)
    assert(zx < nFiles / 2, s"z layout on x touched $zx of $nFiles")
    assert(zy < nFiles / 2, s"z layout on y touched $zy of $nFiles")
    // no rows lost or duplicated by the rewrite
    assert(spark.read.parquet(s"$root/z").count() == 4096)
    assert(spark.read.parquet(s"$root/z").select(sum("payload")).head().getLong(0)
      == grid.select(sum("payload")).head().getLong(0))
  }

  test("graft_searchsorted: upper-bound rank against a driver-side reference") {
    val bounds = Array(1.0, 3.0, 3.0, 7.5, 100.0) // duplicate boundary on purpose
    val vals = Seq(-5.0, 1.0, 2.9, 3.0, 3.1, 7.5, 99.0, 100.0, 1e9)
    val got = vals.toDF("v")
      .selectExpr(s"graft_searchsorted(v, array(${bounds.map(x => s"${x}D").mkString(",")})) AS r")
      .collect().map(_.getInt(0)).toSeq
    val want = vals.map(v => bounds.count(_ <= v))
    assert(got == want, s"$got != $want")
  }

  test("quantile z-order balances files under heavy skew; uniform collapses") {
    val root = java.nio.file.Files.createTempDirectory("zorder_q").toString
    // y is log-skewed: uniform min/max buckets put almost every row in code 0
    val skewed = spark.range(4096).select(
      (col("id") % 64).as("x"),
      pow(lit(2.0), (col("id") % 16).cast("double")).as("y"),
      col("id").as("payload"))
    val nFiles = 16
    ZOrderWriter.writeZOrderedQuantile(skewed, s"$root/q", "x", "y", nFiles,
      tieBreak = Seq("payload"))
    val perFile = spark.read.parquet(s"$root/q")
      .groupBy(input_file_name()).count().collect().map(_.getLong(1))
    assert(perFile.length == nFiles)
    val mean = perFile.sum.toDouble / perFile.length
    assert(perFile.max <= 2 * mean, s"quantile codes must balance files, got ${perFile.toSeq}")
    // both dimensions still prune: a single x value and a y range each
    // touch a strict subset of files
    def touched(pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(s"$root/q").filter(pred)
        .select(input_file_name()).distinct().count()
    assert(touched(col("x") === 7) < nFiles / 2)
    assert(touched(col("y") === 2.0) < nFiles / 2, "small skewed values keep discrimination")
    assert(spark.read.parquet(s"$root/q").count() == 4096)
  }

  test("constant and degenerate domains do not break the bucketizer") {
    val root = java.nio.file.Files.createTempDirectory("zorder_const").toString
    val df = spark.range(100).select(lit(5L).as("x"), col("id").as("y"))
    ZOrderWriter.writeZOrdered(df, s"$root/z", "x", "y", numFiles = 4)
    assert(spark.read.parquet(s"$root/z").count() == 100)
    ZOrderWriter.writeZOrdered(df.filter(col("y") < 0), s"$root/empty", "x", "y", numFiles = 4)
    assert(spark.read.parquet(s"$root/empty").count() == 0, "empty input writes an empty table")
    intercept[IllegalArgumentException] {
      ZOrderWriter.writeZOrdered(df, s"$root/bad", "x", "y", numFiles = 0)
    }
    intercept[IllegalArgumentException] {
      ZOrderWriter.zValue(col("x"), col("y"), bits = 17)
    }
  }
}
