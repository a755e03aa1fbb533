package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ATOMIC report publication for continuous loops (round-16 advice:
  * [[graft.streaming.StreamOps.streamingOhlc]]/`streamingSample`
  * re-published their report with a bare `mode("overwrite")` parquet
  * write — a reader racing a tick could observe a deleted or
  * half-written directory).
  *
  * Versioned-directory scheme, no rename semantics required (portable
  * to any Hadoop FileSystem, object stores included):
  *
  *   publish  writes `reportPath/v=N` as a normal parquet directory —
  *            the committer lands the `_SUCCESS` marker LAST, so the
  *            version is invisible to readers until its content is
  *            complete;
  *   read     lists committed versions (`_SUCCESS` present), reads the
  *            HIGHEST — a partial/in-flight directory is never picked;
  *   prune    keeps the newest `keep` committed versions so a reader
  *            that resolved version N−1 just before a publish retains
  *            a full tick of grace before its files disappear.
  *
  * Replaying a tick overwrites its own version directory (idempotent,
  * the landing-store rule); during that replay the version is
  * uncommitted and readers fall back to the previous one. At 100 TB
  * the same scheme works unchanged — the listing is one directory of
  * version names, never data-sized. */
object AtomicReport {

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Publish `df` as version `version`, then prune old versions. */
  def publish(df: DataFrame, reportPath: String, version: Long,
              keep: Int = 2): Unit = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    df.write.mode("overwrite").parquet(s"$reportPath/v=$version")
    prune(df.sparkSession, reportPath, keep)
  }

  /** Committed versions, ascending (only directories whose `_SUCCESS`
    * marker landed). */
  def versions(spark: SparkSession, reportPath: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(reportPath)
    val fs = fsOf(spark, reportPath)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .filter(st => fs.exists(
        new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** The newest COMMITTED report. Throws when nothing has been
    * published yet. */
  def read(spark: SparkSession, reportPath: String): DataFrame = {
    val vs = versions(spark, reportPath)
    require(vs.nonEmpty, s"no committed report under $reportPath")
    spark.read.parquet(s"$reportPath/v=${vs.last}")
  }

  private def prune(spark: SparkSession, reportPath: String, keep: Int): Unit = {
    val vs = versions(spark, reportPath)
    val fs = fsOf(spark, reportPath)
    vs.dropRight(keep).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$reportPath/v=$v"), true); ()
    }
  }
}
