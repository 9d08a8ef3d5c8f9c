package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the driver-facing harness that no operator work may break. */
class HarnessContractSpec extends AnyFunSuite {

  test("every query has an oracle or a documented rows-only note, never a dangling oracle") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${(os -- qs).mkString(", ")}")
  }

  test("bench JSON line fits the 2 KB archived stdout tail at worst-case widths") {
    // the archiver keeps only the last 2000 bytes of bench stdout — and
    // the measured round-5 file shows sbt's trailing
    // "[success] Total time: …" line (~80 bytes) lives INSIDE that tail,
    // so the real budget for the JSON line is ~1920 bytes. Rounds 3-5
    // overflowed it: the alphabetically-first timings were truncated out
    // and the driver's JSON parse recorded `parsed: null` (round 2, the
    // last round whose line fit, is the only round with a parsed dict).
    // Round 6 shortened the query keys to buy the line back under budget
    // with headroom. Reconstruct the line with every value at the widest
    // rendering Bench's compact stdout precision produces below 100 s —
    // "9.9" (%.1f under 10 s) and "99" (%.0f above) are both ≤ 3 chars;
    // any single query beyond 100 s is >2.5× the worst standing baseline
    // line, so the round is failed regardless of archival fidelity.
    // (BENCH_FULL.json keeps 10 ms precision — a repo file with no size
    // cap, not budgeted here.)
    val worstVal = "9.9"
    val queries = SparkEntry.queries.keys.toSeq.sorted
      .map(k => s""""$k":$worstVal""").mkString("{", ",", "}")
    // no "errors" key: Bench omits it on a clean run, and a run WITH
    // errors exits 1 and fails the round before archival matters.
    val line =
      s"""{"metric":"total","value":9999,"unit":"sec","queries":$queries,"sf":"sf0.1"}"""
    val budget = 2000 - 81 /* sbt [success] line + newline */ - 1 /* own newline */
    assert(line.getBytes("UTF-8").length <= budget,
      s"bench line would be ${line.getBytes("UTF-8").length} bytes > $budget — trim " +
        "key names (or teach the archiver to keep full stdout) before adding queries")
  }
}
