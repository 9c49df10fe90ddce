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

  test("retainCheckpointed memoizes by plan, truncates lineage, and " +
      "releases") {
    val s = spark
    import s.implicits._
    Caches.releaseAll()
    def build() = Seq((1L, 2.0), (2L, 4.0)).toDF("id", "v")
      .withColumn("w", col("v") * 2)
    val a = Caches.retainCheckpointed(build())
    val b = Caches.retainCheckpointed(build())
    // memo hit: an identical canonical plan returns the SAME checkpointed
    // frame — the train-once contract's mechanism
    assert(a eq b, "identical plans must resolve to one checkpoint")
    // lineage truncated: the plan is a scan of the materialized RDD, not
    // the original projection tree
    assert(a.queryExecution.optimizedPlan.collectLeaves().exists(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
      a.queryExecution.optimizedPlan.toString)
    // values identical to the source plan
    assert(a.orderBy("id").collect().map(_.toString).toSeq
      === build().orderBy("id").collect().map(_.toString).toSeq)
    // a DIFFERENT plan gets its own checkpoint
    val c = Caches.retainCheckpointed(build().filter(col("id") > 1))
    assert(!(c eq a))
    Caches.releaseAll()
    // after release the memo is empty: the same plan re-checkpoints fresh
    val d = Caches.retainCheckpointed(build())
    assert(!(d eq a), "releaseAll must clear the checkpoint memo")
    Caches.releaseAll()
  }

  test("memo key erases checkpoint physical metadata: re-built plans " +
      "over one checkpoint HIT (round-18 sf10 fix, pinned per ADVICE)") {
    val s = spark
    import s.implicits._
    Caches.releaseAll()
    // Reproduce the round-18 miss shape: a checkpoint whose LogicalRDD
    // carries non-trivial captured physical metadata (HashPartitioning
    // from the repartition, ordering from the sort), referenced TWICE in
    // one query so DeduplicateRelations re-instances it with fresh
    // exprIds per construction. Without the memo-key erasure, two builds
    // of this identical query canonicalize unequal and every lookup
    // misses (the six-query ~320 s/query sf10-auto retrain).
    val ck = Seq((1L, 2.0), (2L, 4.0), (3L, 6.0)).toDF("id", "v")
      .repartition(col("id")).sortWithinPartitions("id")
      .localCheckpoint()
    def build() = ck.union(ck.filter(col("id") > 0))
      .groupBy("id").agg(sum("v").as("s"))
    // The normalization itself must be ACTIVE (not the raw-plan
    // fallback): normalized keys of two builds are canonically equal.
    assert(Caches.normalizeForKey(build()).canonicalized ==
           Caches.normalizeForKey(build()).canonicalized,
      "normalizeForKey must produce a construction-stable key for " +
        "checkpoint-embedding plans")
    // And the public contract: the second identical build HITs. A Spark
    // upgrade that reshapes LogicalRDD's constructor lands in the
    // raw-plan fallback (miss, never wrong values) and fails here —
    // the loud signal ADVICE asked for.
    val a = Caches.retainCheckpointed(build())
    val b = Caches.retainCheckpointed(build())
    assert(a eq b,
      "re-built checkpoint-embedding plans must memo-HIT " +
        "(is memo-key normalization in the fallback path?)")
    assert(a.orderBy("id").collect().map(_.getDouble(1)).toSeq
      === Seq(4.0, 8.0, 12.0))
    Caches.releaseAll()
  }

  test("memoCount misses when a scanned path is rewritten in-session " +
      "(file-index fingerprint in the memo key)") {
    // ADVICE r19 (Caches.scala): a plan-only memo key served a stale count
    // to resolveCells/resolveBits after a fixture rewrite under identical
    // plan text. The key now folds in a hash of df.inputFiles; Spark's
    // per-write part-file UUIDs make any overwrite change that listing.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_memo_fp")
      .toString
    (1L to 5L).toDF("id").write.mode("overwrite").parquet(dir)
    assert(Caches.memoCount(s.read.parquet(dir)) === 5L)
    (1L to 9L).toDF("id").write.mode("overwrite").parquet(dir)
    assert(Caches.memoCount(s.read.parquet(dir)) === 9L,
      "rewritten path must MISS the count memo, not serve the stale 5")
    // No file source in the plan → empty listing → plan-key behavior.
    val mem = s.range(7).toDF()
    assert(Caches.memoCount(mem) === 7L && Caches.memoCount(mem) === 7L)
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
