package graft

/** Scratch: decompose a tail query's wall into construction /
  * planning / execution (round-17 optimization evidence). */
object TailProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = Sessions.builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q30_vwap", "q09_resample_ohlc", "q02_revenue_by_nation", "d02_minhash_lsh")
    (1 to 2).foreach { pass =>
      println(s"== pass $pass")
      names.foreach { n =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(s, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        val ph = df.queryExecution.tracker.phases
          .map { case (k, v) => f"$k=${(v.endTimeMs - v.startTimeMs) / 1000.0}%.2f" }
          .mkString(" ")
        println(f"TAIL $n construct=${(t1 - t0) / 1e9}%.2f plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f [$ph]")
      }
    }
    s.stop()
  }
}
