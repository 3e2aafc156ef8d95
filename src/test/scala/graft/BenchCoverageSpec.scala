package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's >5x regression gate only covers queries with a budget
  * entry — this spec makes "every query is budgeted" a compile-adjacent
  * invariant, so a new query cannot silently ship ungated. */
class BenchCoverageSpec extends AnyFunSuite {

  test("every SparkEntry query has a Bench budget entry") {
    val missing = SparkEntry.queries.keySet -- Bench.budget.keySet
    assert(missing.isEmpty,
      s"unbudgeted queries (add first-recorded sf0.1 warm values): $missing")
  }

  test("no budget entry is orphaned (query renamed or removed)") {
    val orphans = Bench.budget.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"budget entries with no query: $orphans")
  }

  test("headline names are real queries and the printed line fits the driver tail") {
    val ghosts = Bench.headline.toSet -- SparkEntry.queries.keySet
    assert(ghosts.isEmpty, s"headline entries with no query: $ghosts")
    assert(Bench.headline.distinct.size == Bench.headline.size, "duplicate headline entries")
    // Worst case: every headline value prints as "9999.99" and ten
    // regression names ride along — the line must still land inside the
    // driver's 2000-char tail capture with room for sbt's success line.
    val line = Bench.headline.map("\"" + _ + "\":9999.99").mkString(",").length +
      Bench.headline.take(10).map("\"" + _ + "\",").mkString.length + 250
    assert(line < 1900, s"worst-case bench line $line chars risks tail truncation")
  }

  test("every query has oracle SQL or is a documented rows-only entry") {
    val rowsOnly = Set.empty[String] // r07: agg_approx gained a bounded
                                     // oracle (exact values + in-bound
                                     // verdict columns), so every query
                                     // is oracle-checked
    val trainedLater = Set("ann_ivf", "ann_ivf_pruned", "ann_pq", "ann_ivf_pq",
      "pipeline_mix") // oracle SQL embeds trained
                                      // centroid/codebook literals, produced
                                      // once the query has run (Verify runs
                                      // queries, THEN dumps)
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- rowsOnly -- trainedLater
    assert(missing.isEmpty, s"queries with neither oracle SQL nor a documented waiver: $missing")
  }
}
