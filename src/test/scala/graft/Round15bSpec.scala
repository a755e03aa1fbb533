package graft

import org.apache.spark.sql.functions._

/** Round-15 second batch: concat-and-chunk sequence packing (ds24),
  * graph-ANN delete consolidation (s27), continuous OHLC state (st14),
  * and the hashed-feature weak-label probe (t26). */
class Round15bSpec extends SparkSpec {

  // ------------------------------------ ds24 concat-and-chunk packing

  test("concatChunkOf: spans tile every sequence exactly (seqLen tokens " +
    "except each shard's last), per-doc spans conserve its token count, " +
    "zero-token docs drop, and the map is bit-stable under repartition") {
    import spark.implicits._
    // token counts 0..12 planted via (i*7) mod 13 — includes zeros
    val docs = (1 to 40).map(i => (i.toLong, ((i * 7) % 13).toLong))
      .toDF("doc_id", "n")
    val out = graft.ops.DataOps
      .concatChunkOf(docs, "doc_id", "n", seqLen = 10L, nShards = 3)
      .cache()
    try {
      // per-doc token mass preserved; zero-token docs gone
      val perDoc = out.groupBy("doc_id").agg(sum("n_toks").as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = (1 to 40).map(i => i.toLong -> ((i * 7) % 13).toLong)
        .filter(_._2 > 0).toMap
      assert(perDoc == expected, "span token mass must equal doc token count")
      // every sequence except each shard's LAST carries exactly seqLen
      val seqs = out.groupBy("shard", "seq_id").agg(sum("n_toks").as("s"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      val lastSeq = seqs.groupBy(_._1).map { case (sh, rs) => sh -> rs.map(_._2).max }
      seqs.foreach { case (sh, sq, s) =>
        if (sq != lastSeq(sh)) assert(s == 10L,
          s"non-final sequence ($sh, $sq) must hold exactly seqLen tokens, got $s")
        else assert(s >= 1L && s <= 10L)
      }
      // spans are contiguous inside a sequence: offsets chain from 0
      out.collect()
        .groupBy(r => (r.getAs[Int]("shard"), r.getAs[Long]("seq_id"))).foreach {
        case (_, rs) =>
          val spans = rs.map(r =>
            (r.getAs[Long]("seq_off"), r.getAs[Long]("n_toks"))).sortBy(_._1)
          assert(spans.head._1 == 0L, "first span starts at offset 0")
          spans.sliding(2).foreach {
            case Array((o1, n1), (o2, _)) => assert(o1 + n1 == o2,
              "spans must tile the sequence with no gap or overlap")
            case _ =>
          }
      }
      // deterministic under physical layout changes
      val again = graft.ops.DataOps
        .concatChunkOf(docs.repartition(7), "doc_id", "n", 10L, 3)
        .orderBy("shard", "seq_id", "seq_off").collect().toSeq
      assert(out.orderBy("shard", "seq_id", "seq_off").collect().toSeq == again,
        "chunking must be a pure function of (salt, ids, token counts)")
    } finally out.unpersist()
  }
}
