package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds at
  * SPARK_GRAFT_SF_DIR. Each query is executed twice — the first pass
  * warms JIT/codegen/file-footer caches (a cluster's steady state), the
  * second is timed. Queries run in sorted order for stable comparisons
  * across rounds.
  *
  * Each query is evaluated through the `noop` sink: every output column
  * and the final presentation sort are fully computed (unlike `count()`,
  * which lets Catalyst prune unconsumed projections and eliminate the
  * sort — the engine's own documented pitfall), but nothing is written.
  * A failing query reports value -1 and its error in an `errors` map
  * instead of masquerading as a fast success. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def run(name: String, record: Boolean): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          if (record) {
            val msg = e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage)
            // strip every JSON-illegal character, not just the common ones
            errors(name) = msg.replaceAll("""[\p{Cntrl}"\\]""", " ").take(200)
          }
          -1.0
      }
    }
    names.foreach(run(_, record = false)) // warm-up pass
    val results = names.map(n => n -> run(n, record = true))
    // ms precision, and the headline metric/value/unit keys LAST: the
    // harness that consumes this line keeps only a bounded tail of the
    // output, so with ~90 queries the head of the line is what gets
    // truncated — the totals must live at the end to survive.
    def ms(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"queries":$qs,"errors":$errs,"sf":"$sfDir","n":${names.size},"metric":"total","value":${ms(total)},"unit":"sec"}""")
    spark.stop()
  }
}
