package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Caches

/** Cache-lifetime hygiene (round-7 verdict item 3): every persist the
  * library takes is registered with Caches, and releaseAll() evicts them
  * all — the hook a long-lived session calls when a corpus goes out of
  * scope. Correctness after release is also pinned: dropped caches
  * re-derive from source.
  */
class CachesSpec extends SparkSpec {

  test("library persists are registered and releaseAll evicts every one") {
    val s = spark
    import s.implicits._
    Caches.releaseAll() // start clean (other specs may have retained)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words entirely here now"))
      .toDF("doc_id", "text")
    val before = Caches.retainedCount
    val pairs = graft.ext.Dedup.jaccardPairs(docs)
    val n1 = pairs.count()
    assert(Caches.retainedCount > before,
      "jaccardPairs must register its persists with Caches")
    assert(!Caches.noneCached(s), "caches should be materialized after count")

    Caches.releaseAll()
    assert(Caches.retainedCount === 0)
    assert(Caches.noneCached(s),
      "releaseAll must leave the CacheManager empty")

    // dropped caches re-derive: same answer, no staleness
    assert(graft.ext.Dedup.jaccardPairs(docs).count() === n1)
    Caches.releaseAll()
  }

  test("no naked .persist() remains in library code (grep-style audit)") {
    // Source-level guard for the review bar: every persist call in
    // src/main goes through Caches.retain or carries a matching unpersist
    // in the same scope (StreamingQ's foreachBatch pair).
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val text = java.nio.file.Files.readString(p)
        val naked = raw"\.persist\(\)".r.findAllIn(text).size
        val paired = raw"\.unpersist\(".r.findAllIn(text).size
        val inCaches = p.toString.endsWith("util/Caches.scala")
        if (!inCaches && naked > paired) Some(s"$p: $naked persist / $paired unpersist")
        else None
      }.toList
    assert(offenders.isEmpty,
      s"unowned persists found:\n${offenders.mkString("\n")}")
  }
}
