package graft

/** Pins for the round-9 similarity additions (s15 range search, s16
  * MaxSim late interaction). */
class Sim9Spec extends SparkSpec {
  import spark.implicits._

  test("rangeSearch: radius keeps exactly the vectors inside tau; self excluded") {
    val r2 = math.sqrt(0.5)
    val corpus = Seq(
      (0L, Seq(1.0, 0.0)),          // the query itself
      (1L, Seq(2.0, 0.0)),          // cos 1 (scale-invariant)
      (2L, Seq(0.0, 1.0)),          // cos 0
      (3L, Seq(r2, r2)),            // cos ~0.7071
      (4L, Seq(-1.0, 0.0)))         // cos -1
      .toDF("vec_id", "v")
    val out = Graft.rangeSearch(corpus, corpus.filter($"vec_id" === 0), "vec_id", "v", tau = 0.5)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out.keySet == Set(1L, 3L), s"got ${out.keySet}")
    assert(out(1L) == 1.0 && math.abs(out(3L) - r2) < 1e-12)
    val withSelf = Graft.rangeSearch(corpus, corpus.filter($"vec_id" === 0),
      "vec_id", "v", tau = 0.5, excludeSelf = false)
      .collect().map(_.getLong(1)).toSet
    assert(withSelf == Set(0L, 1L, 3L), "self included on demand")
  }

  test("maxSim: token-order invariance separates it from single-vector cosine") {
    // dims=4 as 2 tokens of 2 dims. Query tokens: [1,0] and [0,1].
    val corpus = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 1.0)), // query
      (1L, Seq(1.0, 0.0, 0.0, 1.0)), // identical        -> maxsim 2
      (2L, Seq(0.0, 1.0, 1.0, 0.0)), // tokens SWAPPED   -> maxsim 2 (cosine would say 0)
      (3L, Seq(1.0, 0.0, 1.0, 0.0)), // one token shared -> maxsim 1
      (4L, Seq(0.0, 1.0, 0.0, 1.0))) // one token shared -> maxsim 1
      .toDF("vec_id", "v")
    val out = Graft.maxSim(corpus, corpus.filter($"vec_id" === 0), "vec_id", "v",
      dims = 4, nSub = 2, k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) == ((1L, 1L, 2.0)) && out(1) == ((2L, 2L, 2.0)),
      s"swapped-token doc ties the identical doc: ${out.toSeq}")
    assert(out(2) == ((3L, 3L, 1.0)) && out(3) == ((4L, 4L, 1.0)))
    // the single-vector baseline CANNOT see doc 2: cos(q, doc2) = 0
    val cosBase = Graft.knnBrute(corpus, corpus.filter($"vec_id" === 0), "vec_id", "v", 4)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(math.abs(cosBase(2L)) < 1e-12, "plain cosine scores the swapped doc 0")
  }
}
