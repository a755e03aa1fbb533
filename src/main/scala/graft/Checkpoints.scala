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

  /** Session conf key: when `true`, [[stabilize]] uses RELIABLE
    * `Dataset.checkpoint` (files under `SparkContext.setCheckpointDir`,
    * which must be set — on a cluster, a DFS path) instead of
    * `localCheckpoint`. Local checkpoints pin blocks in executor
    * storage and are LOST on executor death — fine for a dev loop,
    * a reliability risk for a long 100 TB iterative job, where one
    * preempted executor would fail the whole computation. */
  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Truncate lineage between iterative rounds: `localCheckpoint` by
    * default, reliable `checkpoint` when [[ReliableKey]] is set. The
    * result is plan-identical either way (a LogicalRDD leaf), so
    * operator output does not depend on the mode — only failure
    * recovery does (spec-pinned in Round9Spec). */
  def stabilize(df: DataFrame, eager: Boolean = true): DataFrame = {
    val s = df.sparkSession
    if (s.conf.get(ReliableKey, "false").toBoolean) {
      require(s.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true requires SparkContext.setCheckpointDir " +
          "(a DFS path on a cluster) before running iterative operators")
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
  }

  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: LogicalRDD => r.rdd.unpersist(blocking = false)
      case _ => ()
    }

  private val scope =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[DataFrame]]()

  /** Register a checkpointed frame with the enclosing [[scoped]] block
    * (no-op when none is active — one-shot operator calls keep their
    * blocks until GC, as before). */
  private[graft] def register(df: DataFrame): DataFrame = {
    val b = scope.get()
    if (b != null) b += df
    df
  }

  /** Run `body` with a checkpoint-tracking scope: every frame
    * [[register]]ed inside (the tick-internal localCheckpoints of the
    * graph-maintenance path) is [[free]]d when the block exits. A
    * CONTINUOUS loop calls bounded ticks forever — without this, each
    * tick's checkpoint blocks pin executor storage until a GC happens
    * to collect the driver-side references, and a day of micro-batches
    * fills the store's disk with dead blocks (observed: the ×100
    * anntick probe transiently eating ~76 GB). Frames freed here are
    * end-of-life by construction: a tick lands everything it computed
    * before returning. */
  def scoped[T](body: => T): T = {
    val prev = scope.get()
    val buf = new scala.collection.mutable.ArrayBuffer[DataFrame]()
    scope.set(buf)
    try body finally {
      buf.foreach(df => try free(df) catch { case _: Throwable => () })
      scope.set(prev)
    }
  }
}
