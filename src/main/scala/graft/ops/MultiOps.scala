package graft.ops

import graft.{F, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One binary payload row for m02's typed partition pipeline. */
case class BinDoc(doc_id: Long, payload: Array[Byte])

/** Per-batch extracted features (m02 output). */
case class BinFeature(doc_id: Long, batch_id: Long, byte_len: Long, checksum: Long)

/** Multimodal columns (SURVEY.md §2 #31-32): image/audio/video payloads
  * as opaque `binary` columns with typed metadata.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub; what is real and tested is the
  * Spark-side plumbing a multimodal pipeline needs — binary column
  * handling, metadata extraction at scan speed (m01), and batched
  * per-partition feature extraction with a typed Dataset (m02, the
  * `mapPartitions` shape a Python `mapInPandas` decoder would plug
  * into).
  *
  * The testdata ships no binary table, so payloads are derived
  * deterministically from `documents.text` (UTF-8 bytes) — the plumbing
  * is identical for real media bytes.
  */
object MultiOps {
  type Q = (SparkSession, String) => DataFrame
  import Tables.t
  import F._

  /** #31 binary metadata extract: byte length, magic-byte prefix (hex of
    * the first 4 bytes), and a STUB decode — width/height derived from
    * the payload hash, standing in for an image header parse. Everything
    * is a codegen'd per-row expression; at 100 TB this runs at scan
    * speed with only the metadata columns materialized. */
  private val m01: Q = (s, dir) => {
    t(s, dir, "documents")
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("magic_hex", substring(hex(col("payload")), 1, 8))
      .withColumn("h", hash60(col("text")))
      // STUB decode: deterministic fake dimensions in lieu of a codec
      .withColumn("decoded_w", (pmod(col("h"), lit(1024L)) + 1L).cast("long"))
      .withColumn("decoded_h", (pmod(expr("shiftright(h, 10)"), lit(1024L)) + 1L).cast("long"))
      .select(col("doc_id"), col("byte_len"), col("magic_hex"), col("decoded_w"), col("decoded_h"))
      .orderBy("doc_id")
  }

  private val m01Sql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  substr(hex(encode(text)), 1, 8) AS magic_hex,
      |  CAST((CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 1024) + 1 AS BIGINT) AS decoded_w,
      |  CAST(((CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) >> 10) % 1024) + 1 AS BIGINT) AS decoded_h
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** #32 batched per-partition feature extraction (rows-only check +
    * ScalaTest spec): the typed `mapPartitions` shape for a multimodal
    * decoder. Rows stream through in batches of 32 — the batch boundary
    * is where a real pipeline would hand a columnar block to a decode
    * library; the STUB computes a deterministic byte checksum instead.
    * Batch ids are partition-local (stable because the input is
    * repartitioned by doc_id range), features are per-row, and nothing
    * is collected to the driver. */
  private val m02: Q = (s, dir) => {
    val spark = s
    import spark.implicits._
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .repartitionByRange(8, col("doc_id"))
      .as[BinDoc]
    docs.mapPartitions { it =>
      it.grouped(32).zipWithIndex.flatMap { case (batch, bi) =>
        // STUB decode boundary: a real pipeline decodes `batch` here
        batch.map { d =>
          var sum = 0L
          var i = 0
          while (i < d.payload.length) { sum += (d.payload(i) & 0xff).toLong * (i + 1); i += 1 }
          BinFeature(d.doc_id, bi.toLong, d.payload.length.toLong, sum)
        }
      }
    }.toDF()
      .select(col("doc_id"), col("batch_id"), col("byte_len"), col("checksum"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "m01_binary_meta" -> m01,
    "m02_feature_batch" -> m02)

  /** m02 is intentionally absent: mapPartitions output is rows-only. */
  val oracle: Map[String, String] = Map(
    "m01_binary_meta" -> m01Sql)
}
