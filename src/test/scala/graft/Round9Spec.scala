package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-9 regression specs (non-Spark surfaces). */
class Round9Spec extends AnyFunSuite {

  private def write(dir: java.io.File, name: String, body: String): Unit =
    Files.write(new java.io.File(dir, name).toPath, body.getBytes("UTF-8"))

  test("previousRoundTimes parses Bench's own raw output line") {
    val dir = Files.createTempDirectory("bench_raw").toFile
    write(dir, "BENCH_r7.json",
      """{"queries":{"q01":0.5,"s06_ann_pq":2.54},"errors":{},"reruns":{},""" +
        """"jvm_chunks":9,"sf":"/root/testdata/sf0.1","n":2,"metric":"total","value":3.04,"unit":"sec"}""")
    val m = Bench.previousRoundTimes("/root/testdata/sf0.1", dir)
    assert(m == Map("q01" -> 0.5, "s06_ann_pq" -> 2.54))
    assert(Bench.previousRoundTimes("/root/testdata/sf0.01", dir).isEmpty,
      "different SF dir must not drift-compare")
  }

  test("previousRoundTimes parses the driver's escaped tail-wrapped artifact") {
    // The round-8 driver artifact shape: our JSON line embedded inside a
    // "tail" string with escaped quotes. The round-8 drift guard parsed
    // nothing out of this (empty reruns despite a 4.3x delta) — this spec
    // pins the unescape fix.
    val dir = Files.createTempDirectory("bench_drv").toFile
    write(dir, "BENCH_r8.json",
      """{
        |  "n": 8,
        |  "rc": 0,
        |  "cpus": 32,
        |  "sf": 0.1,
        |  "tail": "{\"queries\":{\"s06_ann_pq\":10.877,\"t11_bm25\":6.835},\"errors\":{},\"reruns\":{},\"jvm_chunks\":9,\"sf\":\"/root/testdata/sf0.1\",\"n\":2,\"metric\":\"total\",\"value\":17.7,\"unit\":\"sec\"}\n[success] Total time: 456 s"
        |}""".stripMargin)
    val m = Bench.previousRoundTimes("/root/testdata/sf0.1", dir)
    assert(m.get("s06_ann_pq").contains(10.877))
    assert(m.get("t11_bm25").contains(6.835))
    assert(!m.contains("value") && !m.contains("n") && !m.contains("rc"))
  }

  test("previousRoundTimes picks the newest round artifact") {
    val dir = Files.createTempDirectory("bench_new").toFile
    write(dir, "BENCH_r2.json",
      """{"queries":{"q01":9.0},"sf":"/x","metric":"total","value":9.0}""")
    write(dir, "BENCH_r10.json",
      """{"queries":{"q01":1.0},"sf":"/x","metric":"total","value":1.0}""")
    assert(Bench.previousRoundTimes("/x", dir) == Map("q01" -> 1.0))
  }
}
