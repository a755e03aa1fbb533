package graft

import org.apache.spark.sql.Row

/** Streaming twins of the round-9 scan indicators must be BIT-EQUAL to
  * their batch forms on the same bars, across a micro-batch split. */
class StreamTwin9Spec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import graft.streaming._

  private def ts(h: Int) = new java.sql.Timestamp(h * 3600000L)

  private def optD(r: Row, i: Int): Option[Double] =
    if (r.isNullAt(i)) None else Some(r.getDouble(i))

  private def wavyBars: Seq[BarEvent] = (for {
    k <- Seq("A", "B"); h <- 0 until 60
  } yield {
    val base = 100.0 + 15.0 * math.sin(h / 3.0 + (if (k == "A") 0 else 2))
    BarEvent(k, ts(h), base + 2.0 + math.cos(h * 1.7), base - 2.0, base + math.cos(h.toDouble))
  }).sortBy(e => (e.ts.getTime, e.event_type))

  test("streamingAdx == batch adx across a micro-batch split") {
    val bars = wavyBars
    val batch = graft.ops.ScanOps.adxOf(bars.toDF(), "event_type", "ts",
        "high", "low", "close", n = 14)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (optD(r, 2), optD(r, 3), optD(r, 4), optD(r, 5))).toMap
    assert(batch.values.exists(_._4.isDefined), "ADX warmup completes")
    implicit val sql = spark.sqlContext
    val input = MemoryStream[BarEvent]
    val q = StreamOps.streamingAdx(input.toDS(), 14)
      .writeStream.format("memory").queryName("st_adx").outputMode("append").start()
    try {
      input.addData(bars.take(45)); q.processAllAvailable()
      input.addData(bars.drop(45)); q.processAllAvailable()
      val streamed = spark.table("st_adx")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (optD(r, 2), optD(r, 3), optD(r, 4), optD(r, 5))).toMap
      assert(streamed == batch, "continuous ADX must be bit-equal to batch")
    } finally q.stop()
  }

  test("streamingHeikinAshi == batch heikinAshi across a micro-batch split") {
    val bars = wavyBars.map(b => OhlcEvent(b.event_type, b.ts,
      (b.high + b.low) / 2.0, b.high, b.low, b.close))
    val batch = graft.ops.ScanOps.heikinAshiOf(bars.toDF(), "event_type", "ts",
        "open", "high", "low", "close")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    implicit val sql = spark.sqlContext
    val input = MemoryStream[OhlcEvent]
    val q = StreamOps.streamingHeikinAshi(input.toDS())
      .writeStream.format("memory").queryName("st_ha").outputMode("append").start()
    try {
      input.addData(bars.take(37)); q.processAllAvailable()
      input.addData(bars.drop(37)); q.processAllAvailable()
      val streamed = spark.table("st_ha")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
      assert(streamed == batch, "continuous HA must be bit-equal to batch")
    } finally q.stop()
  }

  test("streamingTrix == batch trix across a micro-batch split") {
    val events = wavyBars.zipWithIndex.map { case (b, i) =>
      BollEvent(b.event_type, i.toLong, b.ts, b.close) }
    val batch = graft.ops.ScanOps.trixOf(events.toDF(), "event_type", "ts",
        "event_id", "value", n = 15)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(3), optD(r, 4))).toMap
    implicit val sql = spark.sqlContext
    val input = MemoryStream[BollEvent]
    val q = StreamOps.streamingTrix(input.toDS(), 15)
      .writeStream.format("memory").queryName("st_trix").outputMode("append").start()
    try {
      input.addData(events.take(50)); q.processAllAvailable()
      input.addData(events.drop(50)); q.processAllAvailable()
      val streamed = spark.table("st_trix")
        .collect().map(r => (r.getString(0), r.getLong(2)) ->
          (r.getDouble(3), optD(r, 4))).toMap
      assert(streamed == batch, "continuous TRIX must be bit-equal to batch")
    } finally q.stop()
  }

  test("streamingAdfMonitor == batch adfTrajectory across a micro-batch split") {
    import org.apache.spark.sql.functions.col
    def optB(r: Row, i: Int): Option[Boolean] =
      if (r.isNullAt(i)) None else Some(r.getBoolean(i))
    val events = wavyBars.zipWithIndex.map { case (b, i) =>
      BollEvent(b.event_type, i.toLong, b.ts, b.close) }
    val batch = graft.ops.EconOps.adfTrajectoryOf(
        events.toDF().select(col("event_type"), col("ts"), col("value").as("close")),
        "event_type", "ts", "close")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime) ->
        (r.getInt(2).toLong, optD(r, 3), optD(r, 4), optB(r, 5), optB(r, 6),
          optD(r, 7), optD(r, 8))).toMap
    assert(batch.values.exists(_._7.isDefined),
      "the sine series must mean-revert into a defined half-life somewhere")
    assert(batch.values.exists(_._2.isEmpty), "warmup rows carry null fits")
    implicit val sql = spark.sqlContext
    val input = MemoryStream[BollEvent]
    val q = StreamOps.streamingAdfMonitor(input.toDS())
      .writeStream.format("memory").queryName("st_adfmon").outputMode("append").start()
    try {
      input.addData(events.take(43)); q.processAllAvailable()
      input.addData(events.drop(43)); q.processAllAvailable()
      val streamed = spark.table("st_adfmon")
        .collect().map(r => (r.getString(0), r.getLong(2)) ->
          (r.getLong(3), optD(r, 4), optD(r, 5), optB(r, 6), optB(r, 7),
            optD(r, 8), optD(r, 9))).toMap
      assert(streamed == batch, "continuous ADF/OU monitor must be bit-equal to batch")
    } finally q.stop()
  }

  test("streamingHolt == batch holt across a micro-batch split") {
    val events = wavyBars.zipWithIndex.map { case (b, i) =>
      BollEvent(b.event_type, i.toLong, b.ts, b.close) }
    val batch = graft.ops.ScanOps.holtOf(events.toDF(), "event_type", "ts",
        "event_id", "value", alpha = 0.3, betaT = 0.1)
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        (r.getDouble(3), optD(r, 4), optD(r, 5), optD(r, 6))).toMap
    assert(batch.values.exists(_._4.isDefined), "forecast errors appear after the seed bars")
    implicit val sql = spark.sqlContext
    val input = MemoryStream[BollEvent]
    val q = StreamOps.streamingHolt(input.toDS(), alpha = 0.3, betaT = 0.1)
      .writeStream.format("memory").queryName("st_holt").outputMode("append").start()
    try {
      input.addData(events.take(41)); q.processAllAvailable()
      input.addData(events.drop(41)); q.processAllAvailable()
      val streamed = spark.table("st_holt")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getDouble(3), optD(r, 4), optD(r, 5), optD(r, 6))).toMap
      assert(streamed == batch, "continuous Holt must be bit-equal to batch")
    } finally q.stop()
  }
}
