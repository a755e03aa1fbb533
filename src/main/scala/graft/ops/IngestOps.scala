package graft.ops

import graft.{F, Tables}
import graft.sources.OptionJson
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-path queries (SURVEY.md §2 sources) — drive the source
  * layers end-to-end inside the driver's gate. Payload pages are built
  * in-plan from the events table (there is no raw-payload table in
  * testdata), so the parse → explode → dedup plan is exercised on real
  * driver runs; rows-only because the JSON round-trip is not
  * SQL-expressible in the oracle's dialect-portable subset. */
object IngestOps {
  type Q = (SparkSession, String) => DataFrame
  import Tables.t
  import F._

  /** #o01 options exercise-history ingest
    * (crypto_data_pipline_clickhouse.py:246-441): one synthetic page
    * per event_type built with to_json(collect_list(struct(…))) over a
    * sampled slice, then OptionJson.parseExercise → dedupKeepFirst —
    * the declarative form of the reference's fetch→concat→dedup loop. */
  private val o01: Q = (s, dir) => {
    val ev = t(s, dir, "events").filter(pmod(col("event_id"), lit(37L)) === 0)
    val pages = ev.groupBy(col("event_type").as("underlying"))
      .agg(to_json(collect_list(struct(
        concat(col("event_type"), lit("-"), col("event_id")).as("symbol"),
        col("value").as("strikePrice"),
        (col("value") * lit(1.01)).as("realStrikePrice"),
        lit("REALISTIC_VALUE_STRICKEN").as("strikeResult"),
        epochMs(col("ts")).as("expiryDate")))).as("payload"))
      .withColumn("page_seq", lit(1L))
    OptionJson.dedupExerciseKeepFirst(
      OptionJson.parseExercise(pages, "payload", "underlying", Seq("page_seq")),
      col("page_seq"))
      .orderBy("symbol")
  }

  val queries: Map[String, Q] = Map("o01_option_exercise" -> o01)
  val oracle: Map[String, String] = Map.empty
}
