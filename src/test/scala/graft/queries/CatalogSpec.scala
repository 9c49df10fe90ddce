package graft.queries

import graft.SparkSpec

/** Smoke gate over the whole declared surface: every catalog query builds,
  * runs at sf0.001, and returns a stable schema. Catches analysis breakage
  * (unresolved columns, bad oracles are the driver's job) before the driver
  * round does.
  */
class CatalogSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Queries legitimately empty at the smallest scale factor. */
  private val mayBeEmpty = Set("q08_anti_join", "q19_except")

  Catalog.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, sf)
      val n = df.count()
      assert(n >= 0)
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length === df.columns.length,
        s"${q.name} has duplicate column names")
    }
  }

  test("every oracle belongs to a declared query") {
    val names = Catalog.all.map(_.name).toSet
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(names))
  }

  test("entry() returns rows at sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
