package graft.queries

import graft.SparkSpec

/** Pins Bench's fixture-prewarm contract (Bench.FixtureQueries): each listed
  * query materializes its scratch fixture during plan CONSTRUCTION (so the
  * warm-up prebuild actually prebuilds), and a second construction reuses
  * the cached fixture (so the prewarm makes the later timed constructions
  * build-free). The spec drives construction through a path ALIAS of the
  * test scale factor ("sf0.001/." ) — Scratch keys embed the sfDir string,
  * so the alias guarantees fresh keys even when other suites in this JVM
  * already materialized fixtures for the plain path.
  */
class BenchFixtureSpec extends SparkSpec {
  // Trailing "/." aliases the directory without changing what is read.
  private val sf = "/root/testdata/sf0.001/."

  test("every FixtureQueries entry exists in the catalog") {
    val missing = graft.Bench.FixtureQueries.filterNot(Catalog.byName.contains)
    assert(missing.isEmpty, s"unknown fixture queries: $missing")
  }

  test("fixture queries build at construction, then reuse the cache") {
    graft.Bench.FixtureQueries.foreach { name =>
      val before = graft.util.Scratch.materializedCount
      Catalog.byName(name).run(spark, sf) // construction only — no action
      val afterFirst = graft.util.Scratch.materializedCount
      assert(afterFirst > before,
        s"$name did not materialize a fixture at construction")
      Catalog.byName(name).run(spark, sf)
      assert(graft.util.Scratch.materializedCount == afterFirst,
        s"$name rebuilt its fixture on re-construction (cache miss)")
    }
  }
}
