package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit storage release for `localCheckpoint`'d frames.
  *
  * `Dataset.unpersist()` only clears CacheManager entries; a local
  * checkpoint's blocks live on the underlying RDD and otherwise stay
  * pinned in executor storage until the session ends. Call [[free]]
  * once nothing will reference the frame again (its lineage is
  * truncated, so a later access WOULD fail — this is deliberate
  * end-of-life, e.g. the previous round's labels in an iterative
  * algorithm after the next round has materialized). */
object Checkpoints {
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: LogicalRDD => r.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
