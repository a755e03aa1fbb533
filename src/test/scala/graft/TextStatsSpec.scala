package graft

/** Hand-computed pins for the corpus-statistics text operators
  * (ops.TextStatsOps, t18–t20, ds18). */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("pmiCollocations: a repeated pair pins pmi = ln 4; min-count filters") {
    // 10 docs "new york": unigrams new=10, york=10, N=20; bigrams B=10,
    // c12=10 -> pmi = ln((10/10)*(20/10)*(20/10)) = ln 4
    val docs = ((1 to 10).map(i => (i.toLong, "new york")) :+ (11L, "lone"))
      .toDF("doc_id", "text")
    val out = Graft.pmiCollocations(docs, "text", minCount = 2L, k = 5).collect()
    assert(out.length == 1, "only the repeated pair survives min-count")
    val r = out(0)
    assert(r.getString(0) == "new" && r.getString(1) == "york")
    assert(r.getLong(2) == 10L && r.getLong(3) == 10L && r.getLong(4) == 10L)
    // N=21 with the lone doc: pmi = ln((10/10)*(21/10)*(21/10))
    val expect = math.floor(math.log((21.0 / 10.0) * (21.0 / 10.0)) * 1e6 + 0.5) / 1e6
    assert(r.getDouble(5) == expect)
  }

  test("lexicalDiversity: 'a a b' -> 3 tokens, 2 types, 1 hapax") {
    val out = Graft.lexicalDiversity(
      Seq((1L, "a a b"), (2L, "x y z")).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 2L && out(0).getLong(3) == 1L)
    assert(out(0).getDouble(4) == 2.0 / 3.0 && out(0).getDouble(5) == 0.5)
    assert(out(1).getDouble(4) == 1.0 && out(1).getDouble(5) == 1.0, "all-distinct doc")
  }

  test("readability: 'Hello world.' pins Flesch 77.905, FK 2.89") {
    val out = Graft.readability(
      Seq((1L, "Hello world."), (2L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    val r = out(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L && r.getLong(3) == 3L)
    assert(math.abs(r.getDouble(4) - (206.835 - 1.015 * 2.0 - 84.6 * 1.5)) < 1e-9)
    assert(math.abs(r.getDouble(5) - (0.39 * 2.0 + 11.8 * 1.5 - 15.59)) < 1e-9)
    assert(out(1).getLong(1) == 0L && out(1).isNullAt(4) && out(1).isNullAt(5),
      "empty doc: zero words, null scores")
  }

  test("classBalance: rare class gets the larger weights; weights mean to 1") {
    val df = (Seq.fill(3)(("A", 10L)) :+ (("B", 5L)))
      .toDF("lang", "tok")
    val out = Graft.classBalance(df, "lang", "tok")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out("A")._1 == 3L && out("A")._2 == 30L)
    assert(out("B")._1 == 1L && out("B")._2 == 5L)
    assert(out("A")._3 == 0.75 && out("B")._3 == 0.25)
    assert(out("A")._4 == 4.0 / 6.0 && out("B")._4 == 2.0)
    assert(out("B")._5 > out("A")._5, "rare class upweighted")
    assert(math.abs((out("A")._5 + out("B")._5) / 2.0 - 1.0) < 1e-9, "mean-1 normalization")
  }
}
