package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(event_id: Long, user_id: Long, event_type: String,
              ts: java.sql.Timestamp, value: Double)

/** Proves the st01/st02 transforms are genuinely streaming-capable:
  * the same Column logic runs over a MemoryStream with a watermark and
  * converges to the batch result. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new java.sql.Timestamp(1700000000000L + minute * 60000L)

  private val rows = Seq(
    Ev(1, 1, "click", ts(0), 1.0),
    Ev(2, 1, "click", ts(5), 2.0),
    Ev(3, 2, "view", ts(61), 3.0),
    Ev(4, 2, "view", ts(62), 4.0),
    Ev(5, 1, "click", ts(125), 5.0),
    Ev(6, 3, "purchase", ts(126), 6.0))

  test("st01 tumbling agg: streaming (watermark + complete sink) == batch") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.tumblingAggOut(
        StreamOps.tumblingAgg(input.toDF().withWatermark("ts", "2 hours")))
      .writeStream.format("memory").queryName("st01_out").outputMode("complete").start()
    try {
      input.addData(rows.take(3))
      q.processAllAvailable()
      input.addData(rows.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("st01_out")
        .orderBy("bucket_ms", "event_type").collect().toSeq
      val batch = StreamOps.tumblingAggOut(StreamOps.tumblingAgg(rows.toDF()))
        .orderBy("bucket_ms", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(batch.size == 4) // 4 distinct (hour, event_type) buckets
    } finally q.stop()
  }

  test("st05 windowed quality gate: streaming == batch bit-for-bit; flags violations") {
    implicit val sql = spark.sqlContext
    val bad = Seq(
      Ev(7, 4, "bogus", ts(2), 1.0),                          // domain violation, hour 0
      Ev(8, 4, "click", ts(63), -5.0),                        // range violation, hour 1
      Ev(9, 5, "view", ts(64), 2.0))                          // normal
    val all = rows ++ bad
    val input = MemoryStream[Ev]
    val q = StreamOps.windowedQualityOut(
        StreamOps.windowedQuality(input.toDF().withWatermark("ts", "2 hours")), minN = 2)
      .writeStream.format("memory").queryName("st05_out").outputMode("complete").start()
    try {
      input.addData(all.take(4))
      q.processAllAvailable()
      input.addData(all.drop(4))
      q.processAllAvailable()
      val streamed = spark.table("st05_out").orderBy("bucket_ms").collect().toSeq
      val batch = StreamOps.windowedQualityOut(
          StreamOps.windowedQuality(all.toDF()), minN = 2)
        .orderBy("bucket_ms").collect().toSeq
      assert(streamed == batch)
      val byHour = batch.map(r => r.getLong(0) -> r).toMap
      assert(batch.size == 3)
      // hour 0: 1 domain violation in 3 events → domain_frac 2/3 → fail
      assert(!byHour(1699999200000L).getBoolean(6))
      // hour 2: clean, n=2 ≥ minN → pass
      assert(byHour(1700006400000L).getBoolean(6))
    } finally q.stop()
  }

  test("st08 windowed PSI: streaming counts (watermark + complete sink) + sink-side projection == batch") {
    implicit val sql = spark.sqlContext
    // reference: a tight value cluster around 1-6; current drifts high
    val ref = rows.toDF()
    val refBins = StreamOps.psiRefBins(ref, "value", bins = 4)
    val Array(lo, hi) = refBins.select("lo", "hi").head().toSeq.map(_.asInstanceOf[Double]).toArray
    val cur = Seq(
      Ev(11, 1, "click", ts(1), 5.5), Ev(12, 1, "click", ts(2), 6.0),
      Ev(13, 2, "view", ts(3), 9.0), // clamps to the top bin (out of ref range)
      Ev(14, 2, "view", ts(70), 1.0), Ev(15, 3, "click", ts(71), 1.2))
    val input = MemoryStream[Ev]
    val q = StreamOps.windowedPsiCounts(
        input.toDF().withWatermark("ts", "2 hours"), "value", lit(lo), lit(hi), bins = 4)
      .writeStream.format("memory").queryName("st08_counts").outputMode("complete").start()
    try {
      input.addData(cur.take(3))
      q.processAllAvailable()
      input.addData(cur.drop(3))
      q.processAllAvailable()
      val streamed = StreamOps.windowedPsiOut(spark.table("st08_counts"), refBins, bins = 4)
        .orderBy("bucket_ms", "bin").collect().toSeq
      val batch = StreamOps.windowedPsiOut(
          StreamOps.windowedPsiCounts(cur.toDF(), "value", lit(lo), lit(hi), bins = 4),
          refBins, bins = 4)
        .orderBy("bucket_ms", "bin").collect().toSeq
      assert(streamed == batch) // integer counts → bit-equal projection
      assert(batch.size == 8)   // 2 windows × 4 bins (empty bins present)
      // hour 0 leans on the top bin (5.5, 6.0, 9.0-clamped) → drifted
      val h0 = batch.filter(_.getLong(0) == 1700000000000L - 1700000000000L % 3600000L)
      assert(h0.forall(_.getBoolean(8)))
      assert(h0.map(_.getLong(3)).sum == 3) // all three events binned
    } finally q.stop()
  }

  test("st02 streaming dedup keeps first arrival per key within watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Ev]
    val dup = Ev(99, 1, "click", ts(0), 42.0) // same (user, type, minute) as event 1
    val q = StreamOps.streamingDedup(input.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("st02_out").outputMode("append").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      input.addData(Seq(dup)) // late duplicate: must be dropped
      q.processAllAvailable()
      val got = spark.table("st02_out").select("event_id").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 3L, 4L, 5L, 6L)) // 99 deduped; (1,click,min0) kept once
    } finally q.stop()
  }

  test("st04 windowed top-k: append-mode agg + sink-side rank == batch") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Ev]
    // append mode: each window emits exactly once, when the watermark
    // passes its end — the rank then runs on FINAL counts at the sink
    val q = StreamOps.tumblingAgg(input.toDF().withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName("st04_out").outputMode("append").start()
    try {
      input.addData(rows.take(3))
      q.processAllAvailable()
      input.addData(rows.drop(3))
      q.processAllAvailable()
      // sentinel far in the future: advances the watermark past every
      // real window (its own window stays pending and never emits)
      input.addData(Seq(Ev(999, 9, "flush", ts(100000), 0.0)))
      q.processAllAvailable()
      val streamed = StreamOps.windowTopK(spark.table("st04_out"), 3)
        .select(unix_millis(col("window.start")).as("bucket_ms"), col("rank"),
          col("event_type"), col("n"))
        .orderBy("bucket_ms", "rank").collect().toSeq
      val batch = StreamOps.windowTopK(StreamOps.tumblingAgg(rows.toDF()), 3)
        .select(unix_millis(col("window.start")).as("bucket_ms"), col("rank"),
          col("event_type"), col("n"))
        .orderBy("bucket_ms", "rank").collect().toSeq
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("st01 batch entry matches the streaming transform on testdata") {
    val viaEntry = SparkEntry.queries("st01_window_agg")(spark, sfDir)
    val direct = StreamOps.tumblingAggOut(StreamOps.tumblingAgg(Tables.t(spark, sfDir, "events")))
      .orderBy("bucket_ms", "event_type")
    assert(viaEntry.collect().toSeq == direct.collect().toSeq)
  }

  test("tumblingAgg over a real parquet file stream == batch (file-source path)") {
    // file source requires a directory: stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val f = dir.toString
    val sch = spark.read.parquet(f).schema
    val raw = spark.readStream.schema(sch).parquet(f)
    // normalize ts like Tables.t: legacy nanos-long testdata needs the
    // explicit conversion; timestamp encodings pass through
    val sdf = sch.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    val q = StreamOps.tumblingAggOut(
        StreamOps.tumblingAgg(sdf.withWatermark("ts", "2 hours")))
      .writeStream.format("memory").queryName("st_file_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("st_file_out")
        .orderBy("bucket_ms", "event_type").collect().toSeq
      val batch = StreamOps.tumblingAggOut(StreamOps.tumblingAgg(Tables.t(spark, sfDir, "events")))
        .orderBy("bucket_ms", "event_type").collect().toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("checkpointed restart: dedup state survives stop/start, file source -> parquet sink") {
    import java.nio.file.{Files => F}
    val root = F.createTempDirectory("graft_chk")
    val srcDir = root.resolve("src"); F.createDirectories(srcDir)
    val outDir = root.resolve("out").toString
    val chkDir = root.resolve("chk").toString

    def writeBatch(name: String, rows: Seq[Ev]): Unit =
      rows.toDF().coalesce(1).write.mode("overwrite").parquet(root.resolve(name).toString) // stage
    def moveIn(name: String): Unit = {
      val staged = root.resolve(name).toFile.listFiles.filter(_.getName.endsWith(".parquet"))
      staged.zipWithIndex.foreach { case (f, i) =>
        F.move(f.toPath, srcDir.resolve(s"$name-$i.parquet")) }
    }

    val schema = Seq.empty[Ev].toDF().schema
    def startQuery() =
      StreamOps.streamingDedup(
          spark.readStream.schema(schema).parquet(srcDir.toString).withWatermark("ts", "1 hour"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chkDir)
        .outputMode("append").start()

    // run 1: batch A (one intra-batch duplicate key)
    writeBatch("a", Seq(
      Ev(1, 1, "click", ts(0), 1.0),
      Ev(2, 1, "click", ts(0), 2.0), // same (user,type,minute) as 1 -> dropped
      Ev(3, 2, "view", ts(1), 3.0)))
    moveIn("a")
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // run 2 (fresh query, same checkpoint): batch B re-sends a batch-A key
    writeBatch("b", Seq(
      Ev(4, 1, "click", ts(0), 9.0), // duplicate of run-1 state -> must still drop
      Ev(5, 3, "purchase", ts(2), 5.0)))
    moveIn("b")
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir).select("event_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 5L),
      s"state must survive restart: expected {1,3,5}, got $got")
  }

  test("streaming RSI(14) == batch rsi when events arrive in event-time order") {
    import graft.streaming.{BollEvent, RsiOut}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[BollEvent]
    val q = StreamOps.streamingRsi(input.toDS(), 14)
      .writeStream.format("memory").queryName("rsi_out").outputMode("append").start()
    try {
      val evs = Tables.t(spark, sfDir, "events")
        .select(col("event_type"), col("event_id"), col("ts"), col("value"))
        .as[BollEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("rsi_out").as[RsiOut].collect()
        .map(o => (o.event_type, o.event_id) -> o.rsi).toMap
      val want = Graft.rsi(Tables.t(spark, sfDir, "events"),
          "event_type", "ts", "event_id", "value", n = 14)
        .select("event_type", "event_id", "rsi").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      assert(got.keySet == want.keySet)
      var nonNull = 0
      want.foreach { case (k, w) =>
        (got(k), w) match {
          case (None, None) => // warm-up rows agree
          case (Some(g), Some(e)) =>
            // batch uses cumulative-sum differences; fp tolerance only
            assert(math.abs(g - e) < 1e-6, s"$k: streaming $g vs batch $e")
            nonNull += 1
          case (g, e) => fail(s"$k: null disagreement streaming=$g batch=$e")
        }
      }
      assert(nonNull > 0, "testdata must produce post-warmup RSI rows")
    } finally q.stop()
  }

  test("checkpointed restart: EWMA accumulator state survives stop/start bit-exactly") {
    import graft.streaming.BollEvent
    import java.nio.file.{Files => F}
    val root = F.createTempDirectory("graft_ewma_chk")
    val srcDir = root.resolve("src"); F.createDirectories(srcDir)
    val outDir = root.resolve("out").toString
    val chkDir = root.resolve("chk").toString
    def land(name: String, rows: Seq[BollEvent]): Unit = {
      val staged = root.resolve(name).toString
      rows.toDF().coalesce(1).write.mode("overwrite").parquet(staged)
      new java.io.File(staged).listFiles.filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          F.move(f.toPath, srcDir.resolve(s"$name-$i.parquet")) }
    }
    val schema = Seq.empty[BollEvent].toDF().schema
    def startQuery() =
      StreamOps.streamingEwma(
          spark.readStream.schema(schema).parquet(srcDir.toString).as[BollEvent], alpha = 0.25)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chkDir)
        .outputMode("append").start()
    def ev(id: Long, v: Double) = BollEvent("K", id, new java.sql.Timestamp(1700000000000L + id * 60000L), v)
    val all = Seq(ev(1, 10.0), ev(2, 14.0), ev(3, 7.0), ev(4, 21.0), ev(5, 3.0))
    land("b1", all.take(3))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // restart on the same checkpoint: rows 4-5 must CONTINUE the fold
    land("b2", all.drop(3))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(outDir)
      .select("event_id", "ewma").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the exact fold over the full series, from first principles
    val want = all.map(_.value).scanLeft(Option.empty[Double]) {
      case (None, x) => Some(x)
      case (Some(a), x) => Some(a * 0.75 + 0.25 * x)
    }.flatten
    assert(got.size == 5)
    all.zip(want).foreach { case (e, w) =>
      assert(got(e.event_id) == w, s"event ${e.event_id}: ${got(e.event_id)} != $w")
    }
  }

  test("checkpointed restart: volume-bar open-bar state survives stop/start") {
    // the open bar and the volume clock come back from the checkpoint:
    // a bar whose fills straddle the restart closes with exactly the
    // same accumulators as an uninterrupted run
    import graft.streaming.{FillEvent, VbarOut}
    import java.nio.file.{Files => F}
    val root = F.createTempDirectory("graft_vbar_chk")
    val srcDir = root.resolve("src"); F.createDirectories(srcDir)
    val outDir = root.resolve("out").toString
    val chkDir = root.resolve("chk").toString
    def land(name: String, rows: Seq[FillEvent]): Unit = {
      val staged = root.resolve(name).toString
      rows.toDF().coalesce(1).write.mode("overwrite").parquet(staged)
      new java.io.File(staged).listFiles.filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          F.move(f.toPath, srcDir.resolve(s"$name-$i.parquet")) }
    }
    val schema = Seq.empty[FillEvent].toDF().schema
    def startQuery() =
      StreamOps.streamingVolumeBars(
          spark.readStream.schema(schema).parquet(srcDir.toString).as[FillEvent],
          budget = 10.0)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chkDir)
        .outputMode("append").start()
    def ev(id: Long, p: Double, v: Double) =
      FillEvent("K", id, new java.sql.Timestamp(1700000000000L + id * 60000L), p, v)
    // bar 0 = fills 1-3 (vol 12, overshoot), bar 1 = fills 4-5 (vol 11);
    // the restart lands between fills 2 and 3 — INSIDE bar 0
    val all = Seq(ev(1, 5.0, 4.0), ev(2, 6.0, 4.0), ev(3, 7.0, 4.0),
      ev(4, 8.0, 9.0), ev(5, 9.0, 2.0), ev(6, 10.0, 1.0))
    land("b1", all.take(2))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    land("b2", all.drop(2))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(outDir).as[VbarOut]
      .collect().map(o => o.bar ->
        ((o.n_fills, o.open, o.close, o.volume, o.vwap))).toMap
    // batch truth over the full fill sequence
    val batch = graft.ops.FinOps.volumeBarsOf(all.toDF(), "event_type", "ts",
        Seq("event_id"), "price", "volume", budget = 10.0)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(4), r.getDouble(5), r.getDouble(8), r.getDouble(9),
          r.getDouble(11)))).toMap
    // bars 0 and 1 closed before the stream's end; the final open bar is state
    assert(got.keySet == Set(0L, 1L), s"closed bars: ${got.keySet}")
    got.foreach { case (b, v) =>
      assert(v == batch(b), s"bar $b after restart: $v != ${batch(b)}")
    }
  }

  test("checkpointed restart: MACD three-recurrence state survives stop/start bit-exactly") {
    // the ScanOps-state family's restart contract: fast/slow/signal
    // accumulators come back from the checkpoint and rows after the
    // restart CONTINUE the three recurrences exactly
    import graft.streaming.BollEvent
    import java.nio.file.{Files => F}
    val root = F.createTempDirectory("graft_macd_chk")
    val srcDir = root.resolve("src"); F.createDirectories(srcDir)
    val outDir = root.resolve("out").toString
    val chkDir = root.resolve("chk").toString
    def land(name: String, rows: Seq[BollEvent]): Unit = {
      val staged = root.resolve(name).toString
      rows.toDF().coalesce(1).write.mode("overwrite").parquet(staged)
      new java.io.File(staged).listFiles.filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          F.move(f.toPath, srcDir.resolve(s"$name-$i.parquet")) }
    }
    val schema = Seq.empty[BollEvent].toDF().schema
    def startQuery() =
      StreamOps.streamingMacd(
          spark.readStream.schema(schema).parquet(srcDir.toString).as[BollEvent],
          fast = 2, slow = 4, signal = 3)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chkDir)
        .outputMode("append").start()
    def ev(id: Long, v: Double) = BollEvent("K", id, new java.sql.Timestamp(1700000000000L + id * 60000L), v)
    val all = Seq(ev(1, 10.0), ev(2, 14.0), ev(3, 7.0), ev(4, 21.0), ev(5, 3.0))
    land("b1", all.take(3))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    land("b2", all.drop(3))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(outDir)
      .select("event_id", "macd", "signal", "hist").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // the exact three-recurrence fold over the full series
    val (aF, bF) = (2.0 / 3, 1.0 - 2.0 / 3)
    val (aS, bS) = (2.0 / 5, 1.0 - 2.0 / 5)
    val (aG, bG) = (2.0 / 4, 1.0 - 2.0 / 4)
    val want = all.map(_.value).scanLeft(Option.empty[(Double, Double, Double)]) {
      case (None, v) => Some((v, v, 0.0))
      case (Some((eF, eS, g)), v) =>
        val nF = eF * bF + aF * v
        val nS = eS * bS + aS * v
        Some((nF, nS, g * bG + aG * (nF - nS)))
    }.flatten
    assert(got.size == 5)
    all.zip(want).foreach { case (e, (eF, eS, g)) =>
      val m = eF - eS
      assert(got(e.event_id) == ((m, g, m - g)),
        s"event ${e.event_id}: ${got(e.event_id)} != ${(m, g, m - g)}")
    }
  }

  test("streaming exact EWMA == batch segmented scan BIT-FOR-BIT across micro-batches") {
    import graft.streaming.{BollEvent, EwmaOut}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[BollEvent]
    val q = StreamOps.streamingEwma(input.toDS(), alpha = 0.25)
      .writeStream.format("memory").queryName("ewma_out").outputMode("append").start()
    try {
      val evs = Tables.t(spark, sfDir, "events")
        .select(col("event_type"), col("event_id"), col("ts"), col("value"))
        .as[BollEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("ewma_out").as[EwmaOut].collect()
        .map(o => (o.event_type, o.event_id) -> o.ewma).toMap
      val want = graft.ops.ScanOps.ewmaExactOf(Tables.t(spark, sfDir, "events"),
          "event_type", "ts", "event_id", "value", alpha = 0.25)
        .select("event_type", "event_id", "ewma").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got.keySet == want.keySet)
      // the GroupState accumulator performs the scan's exact op order —
      // equality is bitwise, no tolerance
      want.foreach { case (k, w) => assert(got(k) == w, s"$k: ${got(k)} != $w") }
    } finally q.stop()
  }

  test("streaming Kalman == batch segmented scan BIT-FOR-BIT across micro-batches") {
    import graft.streaming.{BollEvent, KalmanOut}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[BollEvent]
    val q = StreamOps.streamingKalman(input.toDS(), procVar = 0.1, obsVar = 1.0)
      .writeStream.format("memory").queryName("kal_out").outputMode("append").start()
    try {
      val evs = Tables.t(spark, sfDir, "events")
        .select(col("event_type"), col("event_id"), col("ts"), col("value"))
        .as[BollEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("kal_out").as[KalmanOut].collect()
        .map(o => (o.event_type, o.event_id) -> (o.level, o.variance)).toMap
      val want = graft.ops.ScanOps.kalmanOf(Tables.t(spark, sfDir, "events"),
          "event_type", "ts", "event_id", "value", procVar = 0.1, obsVar = 1.0)
        .select("event_type", "event_id", "level", "variance").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3)))).toMap
      assert(got.keySet == want.keySet)
      want.foreach { case (k, w) => assert(got(k) == w, s"$k: ${got(k)} != $w") }
    } finally q.stop()
  }

  test("streaming GARCH == batch segmented scan BIT-FOR-BIT across micro-batches") {
    import graft.streaming.{BollEvent, GarchOut}
    implicit val sql = spark.sqlContext
    // innovations = per-series value diffs, like the q63 gate
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val innov = Tables.t(spark, sfDir, "events")
      .withColumn("value", col("value") - lag(col("value"), 1).over(w))
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("ts"), col("value"))
    val input = MemoryStream[BollEvent]
    val q = StreamOps.streamingGarch(input.toDS(), omega = 0.1, alpha = 0.1, beta = 0.8)
      .writeStream.format("memory").queryName("garch_out").outputMode("append").start()
    try {
      val evs = innov.as[BollEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("garch_out").as[GarchOut].collect()
        .map(o => (o.event_type, o.event_id) -> (o.sigma2, o.sigma)).toMap
      val want = graft.ops.ScanOps.garchOf(innov,
          "event_type", "ts", "event_id", "value", 0.1, 0.1, 0.8)
        .select("event_type", "event_id", "sigma2", "sigma").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3)))).toMap
      assert(got.keySet == want.keySet)
      want.foreach { case (k, v) => assert(got(k) == v, s"$k: ${got(k)} != $v") }
    } finally q.stop()
  }

  test("streaming volume bars emit exactly the batch-completed bars") {
    import graft.streaming.{FillEvent, VbarOut}
    implicit val sql = spark.sqlContext
    val fills = Tables.t(spark, sfDir, "events")
      .select(col("event_type"), col("event_id"), col("ts"),
        col("value").as("price"),
        (pmod(col("event_id"), lit(7)) + lit(1)).cast("double").as("volume"))
    val input = MemoryStream[FillEvent]
    val q = StreamOps.streamingVolumeBars(input.toDS(), budget = 50.0)
      .writeStream.format("memory").queryName("vbar_out").outputMode("append").start()
    try {
      val evs = fills.as[FillEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("vbar_out").as[VbarOut].collect()
        .map(o => (o.event_type, o.bar) ->
          ((o.start_ms, o.end_ms, o.n_fills, o.open, o.high, o.low, o.close,
            o.volume, o.vwap))).toMap
      val batch = graft.ops.FinOps.volumeBarsOf(fills, "event_type", "ts",
          Seq("event_id"), "price", "volume", budget = 50.0)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getTimestamp(2).getTime, r.getTimestamp(3).getTime, r.getLong(4),
            r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8),
            r.getDouble(9), r.getDouble(11)))).toMap
      // streaming never emits each series' still-open final bar
      val lastBar = batch.keys.groupBy(_._1).map { case (k, bars) => k -> bars.map(_._2).max }
      val completed = batch.filter { case ((k, b), _) => b != lastBar(k) }
      assert(got.keySet == completed.keySet,
        s"missing: ${completed.keySet -- got.keySet}; extra: ${got.keySet -- completed.keySet}")
      completed.foreach { case (k, v) => assert(got(k) == v, s"$k: ${got(k)} != $v") }
      assert(completed.nonEmpty, "testdata must close at least one bar per series")
    } finally q.stop()
  }

  test("streaming MACD == batch three-recurrence scan BIT-FOR-BIT across micro-batches") {
    import graft.streaming.{BollEvent, MacdOut}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[BollEvent]
    val q = StreamOps.streamingMacd(input.toDS(), fast = 12, slow = 26, signal = 9)
      .writeStream.format("memory").queryName("macd_out").outputMode("append").start()
    try {
      val evs = Tables.t(spark, sfDir, "events")
        .select(col("event_type"), col("event_id"), col("ts"), col("value"))
        .as[BollEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("macd_out").as[MacdOut].collect()
        .map(o => (o.event_type, o.event_id) -> ((o.macd, o.signal, o.hist))).toMap
      val want = graft.ops.ScanOps.macdOf(Tables.t(spark, sfDir, "events"),
          "event_type", "ts", "event_id", "value", 12, 26, 9)
        .select("event_type", "event_id", "macd", "signal", "hist").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
      assert(got.keySet == want.keySet)
      // identical op sequence in the GroupState — bitwise, no tolerance
      want.foreach { case (k, w) => assert(got(k) == w, s"$k: ${got(k)} != $w") }
    } finally q.stop()
  }

  test("streaming stochastic == batch %K/%D BIT-FOR-BIT over resampled bars") {
    import graft.streaming.{AtrEvent, StochOut}
    implicit val sql = spark.sqlContext
    val bars = Graft.resampleOhlc(Tables.t(spark, sfDir, "events"),
        "event_type", "ts", "event_id", "value", "hour")
      .select(col("event_type"), F.epochMs(col("bucket")).as("eid"), col("bucket"),
        col("high"), col("low"), col("close"))
    val input = MemoryStream[AtrEvent]
    val q = StreamOps.streamingStochastic(input.toDS(), n = 14, dPeriod = 3)
      .writeStream.format("memory").queryName("stoch_out").outputMode("append").start()
    try {
      val evs = bars.select(col("event_type"), col("eid").as("event_id"),
          col("bucket").as("ts"), col("high"), col("low"), col("close"))
        .as[AtrEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("stoch_out").as[StochOut].collect()
        .map(o => (o.event_type, o.event_id) -> ((o.pct_k, o.pct_d))).toMap
      val want = Graft.stochastic(bars, "event_type", "bucket",
          "high", "low", "close", n = 14, dPeriod = 3)
        .select(col("event_type"), col("eid"), col("pct_k"), col("pct_d")).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((if (r.isNullAt(2)) None else Some(r.getDouble(2)),
            if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
      assert(got.keySet == want.keySet)
      assert(want.exists(_._2._2.isDefined), "testdata must produce defined %D rows")
      // exact-pick extrema + identical fold order — bitwise, no tolerance
      want.foreach { case (k, w) => assert(got(k) == w, s"$k: ${got(k)} != $w") }
    } finally q.stop()
  }

  test("streaming OBV == batch obv BIT-FOR-BIT over resampled bars") {
    import graft.streaming.{ObvEvent, ObvOut}
    implicit val sql = spark.sqlContext
    val bars = Graft.resampleOhlc(Tables.t(spark, sfDir, "events"),
        "event_type", "ts", "event_id", "value", "hour")
      .select(col("event_type"), col("bucket"), col("close"),
        col("n_trades").cast("double").as("volume"))
    val input = MemoryStream[ObvEvent]
    val q = StreamOps.streamingObv(input.toDS())
      .writeStream.format("memory").queryName("obv_out").outputMode("append").start()
    try {
      val evs = bars.select(col("event_type"), unix_millis(col("bucket")).as("ms"),
          col("close"), col("volume")).collect()
        .map(r => ObvEvent(r.getString(0), r.getLong(1),
          new java.sql.Timestamp(r.getLong(1)), r.getDouble(2), r.getDouble(3)))
        .sortBy(e => (e.ts.getTime, e.event_id))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("obv_out").as[ObvOut].collect()
        .map(o => (o.event_type, o.event_id) -> o.obv).toMap
      val want = Graft.obv(bars, "event_type", "bucket", "close", "volume")
        .select(col("event_type"), unix_millis(col("bucket")), col("obv")).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got.keySet == want.keySet)
      want.foreach { case (k, w) => assert(got(k) == w, s"$k: ${got(k)} != $w") }
    } finally q.stop()
  }

  test("streaming ATR(14) == batch atr BIT-FOR-BIT (prefix-sum state, no tolerance)") {
    import graft.streaming.{AtrEvent, AtrOut}
    implicit val sql = spark.sqlContext
    val bars = Graft.resampleOhlc(Tables.t(spark, sfDir, "events"),
        "event_type", "ts", "event_id", "value", "hour")
      .select(col("event_type"), col("bucket"), col("high"), col("low"), col("close"))
    val input = MemoryStream[AtrEvent]
    val q = StreamOps.streamingAtr(input.toDS(), n = 14)
      .writeStream.format("memory").queryName("atr_out").outputMode("append").start()
    try {
      val evs = bars.select(col("event_type"), unix_millis(col("bucket")).as("ms"),
          col("high"), col("low"), col("close")).collect()
        .map(r => AtrEvent(r.getString(0), r.getLong(1),
          new java.sql.Timestamp(r.getLong(1)), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .sortBy(e => (e.ts.getTime, e.event_id))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("atr_out").as[AtrOut].collect()
        .map(o => (o.event_type, o.event_id) -> ((o.tr, o.atr))).toMap
      val want = Graft.atr(bars, "event_type", "bucket", "high", "low", "close", n = 14)
        .select(col("event_type"), unix_millis(col("bucket")), col("tr"), col("atr")).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
      assert(got.keySet == want.keySet)
      var filled = 0
      want.foreach { case (k, (wtr, watr)) =>
        val (gtr, gatr) = got(k)
        assert(gtr == wtr, s"$k tr: $gtr != $wtr")
        assert(gatr == watr, s"$k atr: $gatr != $watr")
        if (watr.isDefined) filled += 1
      }
      assert(filled > 0, "testdata must produce post-warmup ATR rows")
    } finally q.stop()
  }

  test("streaming WMA(12) == batch q11 when events arrive in event-time order") {
    import graft.streaming.{WmaEvent, WmaOut}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[WmaEvent]
    val q = StreamOps.streamingWma(input.toDS(), 12)
      .writeStream.format("memory").queryName("wma_out").outputMode("append").start()
    try {
      val evs = Tables.t(spark, sfDir, "events")
        .select(col("event_type"), col("event_id"), col("ts"), col("value"))
        .as[WmaEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      // three micro-batches, split on event-time — the incremental path
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("wma_out").as[WmaOut].collect()
        .map(o => (o.event_type, o.event_id) -> o.wma).toMap
      val want = SparkEntry.queries("q11_wma_premium")(spark, sfDir)
        .select("event_type", "event_id", "wma12").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      assert(got.keySet == want.keySet)
      want.foreach { case (k, w) =>
        (got(k), w) match {
          case (None, None) => // warm-up rows agree
          case (Some(g), Some(e)) =>
            // batch uses the rolling-sum reformulation; fp tolerance only
            assert(math.abs(g - e) < 1e-6, s"$k: streaming $g vs batch $e")
          case (g, e) => fail(s"$k: null disagreement streaming=$g batch=$e")
        }
      }
    } finally q.stop()
  }

  test("streaming Bollinger(20) == batch q31 when events arrive in event-time order") {
    import graft.streaming.{BollEvent, BollOut}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[BollEvent]
    val q = StreamOps.streamingBollinger(input.toDS(), n = 20, width = 2.0)
      .writeStream.format("memory").queryName("boll_out").outputMode("append").start()
    try {
      val evs = Tables.t(spark, sfDir, "events")
        .select(col("event_type"), col("event_id"), col("ts"), col("value"))
        .as[BollEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("boll_out").as[BollOut].collect()
        .map(o => (o.event_type, o.event_id) -> ((o.mid, o.upper, o.breakout))).toMap
      val want = Graft.bollinger(Tables.t(spark, sfDir, "events"),
          "event_type", "ts", "event_id", "value", n = 20, width = 2.0)
        .select("event_type", "event_id", "mid", "upper", "breakout").collect()
        .map { r =>
          val k = (r.getString(0), r.getLong(1))
          val v =
            if (r.isNullAt(2)) (None, None, None)
            else (Some(r.getDouble(2)), Some(r.getDouble(3)), Some(r.getInt(4)))
          k -> v
        }.toMap
      assert(got.keySet == want.keySet)
      val valueOf = evs.map(e => (e.event_type, e.event_id) -> e.value).toMap
      var breakouts = 0
      want.foreach { case (k, (wm, wu, wb)) =>
        val (gm, gu, gb) = got(k)
        (gm, wm) match {
          case (None, None) => // warm-up rows agree
          case (Some(g), Some(e)) =>
            // batch uses cumulative-sum differences; fp tolerance only
            assert(math.abs(g - e) < 1e-6, s"$k mid: streaming $g vs batch $e")
            assert(math.abs(gu.get - wu.get) < 1e-6, s"$k upper")
            // a value within the fp tolerance of a band edge can
            // legitimately flip the flag between the two computations —
            // only assert the flag away from the edges
            val lower = 2 * e - wu.get
            val nearEdge = math.abs(valueOf(k) - wu.get) < 1e-6 ||
              math.abs(valueOf(k) - lower) < 1e-6
            if (!nearEdge)
              assert(gb == wb, s"$k breakout: streaming $gb vs batch $wb")
            breakouts += wb.count(_ != 0)
          case (g, e) => fail(s"$k: null disagreement streaming=$g batch=$e")
        }
      }
      assert(breakouts > 0, "testdata should produce at least one band breakout")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: gap closes sessions, timeout flushes state") {
    import graft.streaming.{SessEvent, Session}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[SessEvent]
    val sess = StreamOps.streamingSessionize(
      input.toDS().withWatermark("ts", "0 seconds"), gapMs = 10 * 60000L)
    val q = sess.writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      // batch 1: user 1 has two events 5 min apart (one session);
      // user 2 has one event
      input.addData(
        SessEvent(1, ts(0), 1.0), SessEvent(1, ts(5), 2.0), SessEvent(2, ts(3), 7.0))
      q.processAllAvailable()
      // batch 2: user 1 returns after a 30-min gap -> closes session 1 inline
      input.addData(SessEvent(1, ts(35), 4.0))
      q.processAllAvailable()
      // user 1's first session closes inline (gap exceeded); user 2's
      // open session times out too — batch 2 advanced the watermark to
      // ts(35), past user 2's (end ts(3) + 10 min) timeout
      val afterGap = spark.table("sess_out").as[Session].collect().toSet
      assert(afterGap == Set(
        Session(1, ts(0).getTime, ts(5).getTime, 2, 3.0),
        Session(2, ts(3).getTime, ts(3).getTime, 1, 7.0)), s"got $afterGap")
      // batch 3: far-future event pushes the watermark past every open
      // session's (end + gap) -> event-time timeouts flush users 1 and 2
      input.addData(SessEvent(99, ts(1000), 0.0))
      q.processAllAvailable()
      input.addData(SessEvent(99, ts(2000), 0.0)) // advance watermark again
      q.processAllAvailable()
      val all = spark.table("sess_out").as[Session].collect().toSet
      assert(all.contains(Session(2, ts(3).getTime, ts(3).getTime, 1, 7.0)), s"user 2 flush missing: $all")
      assert(all.contains(Session(1, ts(35).getTime, ts(35).getTime, 1, 4.0)), s"user 1 second session missing: $all")
    } finally q.stop()
  }

  test("streaming as-of enrichment == batch asofJoin when events arrive in event-time order") {
    import graft.streaming.{AsofEvent, AsofOut}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[AsofEvent]
    val q = StreamOps.streamingAsof(input.toDS())
      .writeStream.format("memory").queryName("asof_out").outputMode("append").start()
    try {
      val e = Tables.t(spark, sfDir, "events")
      val evs = e.filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id").as("key"),
          when(col("event_type") === "view", 0).otherwise(1).as("side"),
          col("event_id").as("id"), col("ts"), col("value"))
        .as[AsofEvent].collect().sortBy(x => (x.ts.getTime, x.side, x.id))
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("asof_out").as[AsofOut].collect()
        .map(o => o.id -> (o.asof_ts_ms, o.asof_id, o.asof_value)).toMap

      val views = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("v_id"), max_by(col("value"), col("event_id")).as("v_value"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("p_id"))
      val want = Graft.asofJoin(purchases, views, "user_id", "ts", Seq("v_id", "v_value"))
        .select(col("p_id"), unix_millis(col("asof_ts")).as("a_ms"), col("v_id"), col("v_value"))
        .collect()
        .map(r => r.getLong(0) -> (
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      assert(got.keySet == want.keySet)
      val diffs = want.collect { case (k, w) if got(k) != w => (k, got(k), w) }
      assert(diffs.isEmpty, s"first diffs: ${diffs.take(3)}")
    } finally q.stop()
  }

  test("st03 stream-stream interval join: two watermarked streams == batch") {
    implicit val sql = spark.sqlContext
    val pIn = MemoryStream[Ev]
    val vIn = MemoryStream[Ev]
    val joined = StreamOps.intervalJoin(
      StreamOps.st03Purchases(pIn.toDF()).withWatermark("p_ts", "1 hour"),
      StreamOps.st03Views(vIn.toDF()).withWatermark("v_ts", "1 hour"),
      windowMs = 30 * 60000L)
      .select("p_event_id", "v_event_id", "user_id")
    val q = joined.writeStream.format("memory").queryName("st03_out")
      .outputMode("append").start()
    val purchases = Seq(
      Ev(100, 1, "purchase", ts(40), 9.0), Ev(101, 2, "purchase", ts(50), 9.0),
      Ev(102, 1, "purchase", ts(300), 9.0))
    val views = Seq(
      Ev(1, 1, "view", ts(15), 1.0),  // 25 min before purchase 100: match
      Ev(2, 1, "view", ts(41), 1.0),  // after purchase 100: no match
      Ev(3, 2, "view", ts(45), 1.0),  // 5 min before purchase 101: match
      Ev(4, 1, "view", ts(200), 1.0)) // 100 min before purchase 102: outside window
    try {
      // interleaved arrival across micro-batches
      pIn.addData(purchases.take(2)); vIn.addData(views.take(2))
      q.processAllAvailable()
      vIn.addData(views.drop(2)); pIn.addData(purchases.drop(2))
      q.processAllAvailable()
      val streamed = spark.table("st03_out").as[(Long, Long, Long)].collect().toSet
      val batch = StreamOps.intervalJoin(
          StreamOps.st03Purchases(purchases.toDF()), StreamOps.st03Views(views.toDF()),
          windowMs = 30 * 60000L)
        .select("p_event_id", "v_event_id", "user_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      assert(batch == Set((100L, 1L, 1L), (101L, 3L, 2L)))
    } finally q.stop()
  }

  test("st03 left-outer stream-stream join emits unattributed purchases after the watermark") {
    implicit val sql = spark.sqlContext
    val pIn = MemoryStream[Ev]
    val vIn = MemoryStream[Ev]
    val joined = StreamOps.intervalJoin(
      StreamOps.st03Purchases(pIn.toDF()).withWatermark("p_ts", "10 minutes"),
      StreamOps.st03Views(vIn.toDF()).withWatermark("v_ts", "10 minutes"),
      windowMs = 30 * 60000L, joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("st03_outer_out")
      .outputMode("append").start()
    try {
      pIn.addData(Ev(100, 1, "purchase", ts(40), 9.0), // will match
        Ev(101, 7, "purchase", ts(40), 9.0)) // user 7 never views
      vIn.addData(Ev(1, 1, "view", ts(20), 1.0))
      q.processAllAvailable()
      // advance both watermarks far past purchase 101's window
      pIn.addData(Ev(900, 9, "purchase", ts(5000), 0.0))
      vIn.addData(Ev(901, 9, "view", ts(5000), 0.0))
      q.processAllAvailable()
      val got = spark.table("st03_outer_out")
        .select("p_event_id", "v_event_id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got(100L).contains(1L), s"matched purchase pairs with its view: $got")
      assert(got.get(101L).exists(_.isEmpty),
        s"unattributed purchase must emit with null view columns once closed: $got")
    } finally q.stop()
  }

  test("sessionize survives an event whose session end + gap is below the watermark") {
    // Two layers keep a way-late event from killing the query: Spark's
    // stateful-operator late-row filter drops rows at-or-below the
    // watermark before they reach the state function (verified here —
    // user 5 produces NO session), and for any residual path the clamp
    // in streamingSessionize keeps setTimeoutTimestamp above the
    // watermark instead of throwing IllegalArgumentException.
    import graft.streaming.{SessEvent, Session}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[SessEvent]
    val sess = StreamOps.streamingSessionize(
      input.toDS().withWatermark("ts", "0 seconds"), gapMs = 10 * 60000L)
    val q = sess.writeStream.format("memory").queryName("sess_late_out").outputMode("append").start()
    try {
      input.addData(SessEvent(9, ts(2000), 1.0)) // watermark -> ts(2000)
      q.processAllAvailable()
      input.addData(SessEvent(5, ts(100), 3.0)) // way-late event
      q.processAllAvailable()
      assert(q.isActive && q.exception.isEmpty,
        s"late event must not kill the query: ${q.exception}")
      input.addData(SessEvent(9, ts(3000), 1.0)) // gap-close user 9, advance watermark
      q.processAllAvailable()
      val got = spark.table("sess_late_out").as[Session].collect().toSet
      assert(got == Set(Session(9, ts(2000).getTime, ts(2000).getTime, 1, 1.0)),
        s"late row is filtered (no user-5 session), on-time sessions close: $got")
    } finally q.stop()
  }

  test("streaming CUSUM == first-principles Page fold BIT-FOR-BIT; alarm resets state") {
    import graft.streaming.{BollEvent, CusumOut}
    implicit val sql = spark.sqlContext
    val (target, slack, h) = (10.0, 0.5, 5.0)
    def ev(id: Long, v: Double) =
      BollEvent("K", id, new java.sql.Timestamp(1700000000000L + id * 60000L), v)
    // on-target noise, then a +3 drift: s+ accumulates 2.5/event and
    // must alarm on the third drifted event (2.5 -> 5.0 -> 7.5 > h)
    val all = Seq(ev(1, 10.2), ev(2, 9.9), ev(3, 13.0), ev(4, 13.0), ev(5, 13.0),
      ev(6, 10.0), ev(7, 10.1))
    val input = MemoryStream[BollEvent]
    val q = StreamOps.streamingCusum(input.toDS(), target, slack, h)
      .writeStream.format("memory").queryName("cusum_out").outputMode("append").start()
    try {
      // split across micro-batches so state crosses the batch boundary
      all.grouped(2).foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
      val got = spark.table("cusum_out").as[CusumOut].collect()
        .map(o => o.event_id -> ((o.s_pos, o.s_neg, o.alarm))).toMap
      // first-principles fold of the same recurrence
      var (sp, sn) = (0.0, 0.0)
      val want = all.map { e =>
        val p = math.max(0.0, sp + (e.value - target - slack))
        val n = math.max(0.0, sn + (target - e.value - slack))
        val alarm = p > h || n > h
        if (alarm) { sp = 0.0; sn = 0.0 } else { sp = p; sn = n }
        e.event_id -> ((p, n, alarm))
      }.toMap
      assert(got == want, s"bitwise fold equality: $got vs $want")
      assert(got(5L)._3 && !got(4L)._3, "alarm exactly on the third drifted event")
      assert(got(6L)._1 == 0.0 && got(6L)._2 == 0.0,
        "post-alarm event starts from reset state")
    } finally q.stop()
  }
}
