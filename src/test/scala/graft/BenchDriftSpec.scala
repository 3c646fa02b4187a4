package graft

import org.scalatest.funsuite.AnyFunSuite

/** The drift protocol's artifact parser: strictly the `queries` object
  * of a bench_details-format file — `failed` lists and `probe_passes`
  * maps later in the artifact also contain query names and must not
  * leak into the previous-round baseline.
  */
class BenchDriftSpec extends AnyFunSuite {

  test("parsePrevQueries reads only the queries object") {
    val artifact =
      """{"metric":"total","value":248.0,"unit":"sec",
        |"queries":{"q_a":1.25,"q_b_2":0.5,"q_neg":-1.0,"q_exp":1.2E1},
        |"failed":["q_broken"],
        |"probe_passes":{"q_bench_contain":[4.5,4.6]},
        |"probe_median":{"q_bench_contain":4.55}}""".stripMargin
    val m = Bench.parsePrevQueries(artifact)
    assert(m == Map("q_a" -> 1.25, "q_b_2" -> 0.5, "q_neg" -> -1.0,
      "q_exp" -> 12.0))
    assert(!m.contains("q_broken") && !m.contains("q_bench_contain"))
  }

  test("json.dump spacing (the chunked runner's format) parses too") {
    val spaced = """{"metric": "total", "queries": {"q_x": 1.5, "q_y": 2.0}, "failed": ["q_z"]}"""
    assert(Bench.parsePrevQueries(spaced) == Map("q_x" -> 1.5, "q_y" -> 2.0))
  }

  test("negative exponents parse; one bad value drops only its entry") {
    val artifact =
      """{"queries":{"q_tiny":1.2E-4,"q_bad":nan,"q_ok":3.0}}"""
    val m = Bench.parsePrevQueries(artifact)
    assert(m.get("q_tiny").contains(1.2e-4))
    assert(m.get("q_ok").contains(3.0))
    assert(!m.contains("q_bad"))
  }

  test("missing or malformed artifacts yield an empty baseline") {
    assert(Bench.parsePrevQueries("") == Map.empty)
    assert(Bench.parsePrevQueries("{\"value\":1}") == Map.empty)
    assert(Bench.parsePrevQueries("not json at all") == Map.empty)
    // queries object present but empty
    assert(Bench.parsePrevQueries("{\"queries\":{}}") == Map.empty)
  }

  test("the committed bench_prev.json parses to the r10 baseline") {
    val p = java.nio.file.Paths.get("bench_prev.json")
    assume(java.nio.file.Files.exists(p))
    val m = Bench.parsePrevQueries(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    // the r10 full-suite artifact: 167 per-query timings
    assert(m.size >= 150, s"only ${m.size} queries parsed")
    assert(m.contains("q_bench_contain") && m.contains("q_pipeline5"))
    assert(m.values.forall(v => v > 0 || v == -1.0))
  }
}
