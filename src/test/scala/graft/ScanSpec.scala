package graft

import org.apache.spark.sql.functions._

/** Segmented-scan recurrences (ops.ScanOps / Graft.ewmaExact /
  * Graft.rsiWilder): exact values against a driver-side fold, edge
  * branches, and determinism under arbitrary input partitioning. */
class ScanSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Seq[Double], key: String = "k"): org.apache.spark.sql.DataFrame =
    vals.zipWithIndex.map { case (v, i) =>
      (key, new java.sql.Timestamp(1700000000000L + i * 60000L), i.toLong, v)
    }.toDF("sym", "t", "seq", "px")

  test("ewmaExact matches the driver-side recurrence bit-for-bit (custom schema)") {
    val vals = Seq(1.63, 26.17, 64.23, 15.88, 50.77, 34.75)
    val out = Graft.ewmaExact(series(vals), "sym", "t", "seq", "px", alpha = 0.25)
      .orderBy("ts_ms").select("ewma").as[Double].collect()
    val expect = vals.tail.scanLeft(vals.head)((acc, x) => acc * 0.75 + 0.25 * x)
    assert(out.toSeq == expect, "same fold, same doubles")
    assert(Graft.ewmaExact(series(vals), "sym", "t", "seq", "px", 0.25).columns.toSeq ==
      Seq("sym", "ts_ms", "seq", "ewma"))
  }

  test("ewmaExact: single-row series emits its own value; alpha validated") {
    val out = Graft.ewmaExact(series(Seq(7.5)), "sym", "t", "seq", "px", alpha = 0.5).collect()
    assert(out.length == 1 && out(0).getDouble(3) == 7.5)
    val ex = intercept[IllegalArgumentException] {
      Graft.ewmaExact(series(Seq(1.0)), "sym", "t", "seq", "px", alpha = 1.0)
    }
    assert(ex.getMessage.contains("alpha"))
  }

  test("scan output is invariant under input partitioning and row order") {
    val df = (0L until 2000L).map { i =>
      (s"k${i % 7}", new java.sql.Timestamp(1700000000000L + (i / 7) * 1000L), i, math.sin(i.toDouble) * 50 + 50)
    }.toDF("sym", "t", "seq", "px")
    def run(d: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, Double)] =
      Graft.ewmaExact(d, "sym", "t", "seq", "px", alpha = 0.125)
        .orderBy("sym", "ts_ms", "seq")
        .as[(String, Long, Long, Double)].collect().toSeq
    val base = run(df)
    assert(base == run(df.repartition(13)), "repartition must not change any double")
    assert(base == run(df.orderBy(rand(42))), "row order must not change any double")
  }

  test("rsiWilder: null until n deltas, then the exact recurrence") {
    val vals = Seq(10.0, 12.0, 11.0, 15.0, 13.0, 16.0)
    val n = 3
    val out = Graft.rsiWilder(series(vals), "sym", "t", "seq", "px", n)
      .orderBy("ts_ms").select("rsi").collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    assert(out.take(n).forall(_.isEmpty), s"first row + ${n - 1} deltas have no rsi")
    // driver-side fold: deltas 2,-1,4,-2,3 -> gains/losses RMA
    val deltas = vals.zip(vals.tail).map { case (a, b) => b - a }
    val a = 1.0 / n; val b = 1.0 - a
    def rma(xs: Seq[Double]): Seq[Double] = xs.tail.scanLeft(xs.head)((acc, x) => acc * b + a * x)
    val ag = rma(deltas.map(d => if (d > 0) d else 0.0))
    val al = rma(deltas.map(d => if (d < 0) -d else 0.0))
    val expect = ag.zip(al).zipWithIndex.collect {
      case ((g, l), j) if j + 1 >= n => if (g + l == 0) 50.0 else 100.0 * g / (g + l)
    }
    assert(out.drop(n).flatten.toSeq == expect)
  }

  test("rsiWilder edges: flat series pins to 50, monotone rise to 100") {
    val flat = Graft.rsiWilder(series(Seq.fill(8)(5.0)), "sym", "t", "seq", "px", n = 3)
      .filter(col("rsi").isNotNull).select("rsi").as[Double].collect()
    assert(flat.nonEmpty && flat.forall(_ == 50.0))
    val rise = Graft.rsiWilder(series((1 to 8).map(_.toDouble)), "sym", "t", "seq", "px", n = 3)
      .filter(col("rsi").isNotNull).select("rsi").as[Double].collect()
    assert(rise.nonEmpty && rise.forall(_ == 100.0))
  }

  test("scan plan: exactly one exchange (the groupByKey shuffle)") {
    val df = series((1 to 50).map(_.toDouble))
    val plan = Graft.ewmaExact(df, "sym", "t", "seq", "px", 0.25)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n$plan")
  }

  test("kalman matches the driver-side filter bit-for-bit; gain anneals to steady state") {
    val vals = Seq(3.0, 1.0, 4.0, 1.5, 9.2, 2.6, 5.3, 5.8, 9.7, 9.3)
    val (q, r) = (0.1, 1.0)
    var xh = vals.head; var p = r
    val expect = (xh, p) +: vals.tail.map { z =>
      val pp = p + q; val k = pp / (pp + r)
      xh = xh + k * (z - xh); p = (1.0 - k) * pp
      (xh, p)
    }
    val out = Graft.kalman(series(vals), "sym", "t", "seq", "px", q, r)
      .orderBy("ts_ms").select("level", "variance")
      .as[(Double, Double)].collect().toSeq
    assert(out == expect, "same op sequence, same doubles")
    // the Riccati variance is monotone decreasing toward its fixed point
    val ps = out.map(_._2)
    assert(ps.zip(ps.tail).forall { case (a, b) => b < a }, "variance anneals")
    val steady = (-q + math.sqrt(q * q + 4 * q * r)) / 2 // posterior P* of the Riccati fixed point
    assert(math.abs(ps.last - steady) < 0.05, s"approaching P* = $steady, got ${ps.last}")
  }

  test("garch matches the driver-side recurrence; shocks spike sigma2, decay follows") {
    val rs = Seq(0.5, -1.0, 2.0, 0.3, 0.1, 0.05)
    val (w, a, b) = (0.1, 0.1, 0.8)
    var s2 = rs.head * rs.head
    val expect = s2 +: rs.sliding(2).map { pair =>
      s2 = w + a * pair(0) * pair(0) + b * s2
      s2
    }.toSeq
    val out = Graft.garch(series(rs), "sym", "t", "seq", "px", w, a, b)
      .orderBy("ts_ms").select("sigma2").as[Double].collect().toSeq
    assert(out == expect, "same op sequence, same doubles")
    // the +2.0 shock at index 2 raises the NEXT variance
    assert(out(3) > out(2), "shock feeds through with one step of lag")
    intercept[IllegalArgumentException] {
      Graft.garch(series(rs), "sym", "t", "seq", "px", 0.1, 0.3, 0.75) // a+b >= 1
    }
  }

  test("kalman: invariant under input partitioning; parameters validated") {
    val df = series(Seq(5.0, 7.0, 6.0, 8.0)) // any order/partitioning
    def run(d: org.apache.spark.sql.DataFrame) =
      Graft.kalman(d, "sym", "t", "seq", "px", 0.2, 0.5)
        .orderBy("ts_ms").collect().map(_.toString).toSeq
    assert(run(df) == run(df.repartition(7).sortWithinPartitions(desc("px"))))
    intercept[IllegalArgumentException] {
      Graft.kalman(df, "sym", "t", "seq", "px", 0.0, 1.0)
    }
  }
}
