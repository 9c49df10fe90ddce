package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private lazy val df = (1 to 1000)
    .map(i => (i % 7, i.toLong, (i * 37 % 100).toDouble))
    .toDF("grp", "id", "score")

  test("matches the window-rank formulation exactly") {
    val topk = TopKPerKey(df, Seq("grp"), Seq(("score", false), ("id", true)), 5)
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    val ref = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
    assert(topk.count() === 35) // 7 groups x 5
    assert(topk.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(topk).count() === 0)
  }

  test("k larger than any group returns everything") {
    val topk = TopKPerKey(df, Seq("grp"), Seq(("id", true)), 100000)
    assert(topk.count() === 1000)
  }

  test("physical plan is partial -> exchange -> final, not window sort") {
    val topk = TopKPerKey(df, Seq("grp"), Seq(("score", true)), 2)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPartial"))
    assert(plan.contains("TopKFinal"))
    assert(!plan.contains("Window"))
  }

  test("ascending order returns minima") {
    val topk = TopKPerKey(df, Seq("grp"), Seq(("id", true)), 1)
    val ids = topk.select("id").as[Long].collect().sorted
    assert(ids.toSeq === (1L to 7L)) // smallest id per mod-7 group
  }

  test("group-column filter pushes below the operator into the scan") {
    val topk = TopKPerKey(df, Seq("grp"), Seq(("score", false), ("id", true)), 3)
    val filtered = topk.filter(col("grp") === 2)

    // optimizer: Filter commuted below TopKPerKeyPlan
    val opt = filtered.queryExecution.optimizedPlan
    val topkNode = opt.collectFirst { case t: TopKPerKeyPlan => t }.get
    assert(topkNode.child.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isDefined, s"filter not pushed below top-k:\n$opt")

    // results: identical to filter-before-topk semantics
    val ref = TopKPerKey(df.filter(col("grp") === 2), Seq("grp"),
      Seq(("score", false), ("id", true)), 3)
    assert(filtered.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(filtered).count() === 0)
    assert(filtered.count() === 3)
  }

  test("non-group filter is NOT pushed (it would change the candidates)") {
    val topk = TopKPerKey(df, Seq("grp"), Seq(("score", false), ("id", true)), 3)
    val filtered = topk.filter(col("score") > 50)
    val topkNode = filtered.queryExecution.optimizedPlan
      .collectFirst { case t: TopKPerKeyPlan => t }.get
    assert(topkNode.child.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isEmpty, "score filter must stay above the top-k")
  }

  test("1M distinct keys under a 1000-key heap cap stays correct " +
      "(partial flush + final sort-fallback paths)") {
    // 4M rows, 1M distinct keys, 4 rows per key (ids g, g+1M, g+2M, g+3M).
    // With maxKeysPerTask=1000 every task holds ≥31k keys on average, so the
    // partial stage MUST flush repeatedly and the final stage MUST take the
    // external-sort fallback — the assertions below only hold if both
    // degraded paths compute exact per-key top-k.
    spark.conf.set("spark.graft.topk.maxKeysPerTask", "1000")
    try {
      val big = spark.range(0, 4000000L).select(
        (col("id") % 1000000L).as("grp"), col("id").as("score"))
      val topk = TopKPerKey(big, Seq("grp"), Seq(("score", true)), 2)
      // top-2 ascending per key are exactly ids g and g+1M → all < 2M
      assert(topk.count() === 2000000L)
      assert(topk.filter(col("score") >= 2000000L).count() === 0)
      assert(topk.select(sum(col("score"))).as[Long].head() ===
        (0L until 2000000L).sum)
    } finally spark.conf.unset("spark.graft.topk.maxKeysPerTask")
  }

  test("large k with few keys under a 1-key heap cap takes the final-stage " +
      "spillable sort (k=10^4 retained rows per key)") {
    // The adversarial axis orthogonal to the 1M-keys test above: few keys
    // but k·rows-per-key large, so the FINAL stage's fallback sorts row
    // sets far bigger than any heap the cap admits. maxKeysPerTask=1
    // forces a breach in every task that sees a second distinct key
    // (64 keys into ≤32 reduce partitions — pigeonhole guarantees some),
    // pinning the GraftSorterBridge path with 10^4-per-key emission.
    spark.conf.set("spark.graft.topk.maxKeysPerTask", "1")
    try {
      val big = spark.range(0, 1280000L).select(
        (col("id") % 64L).as("grp"), col("id").as("score"))
      val topk = TopKPerKey(big, Seq("grp"), Seq(("score", true)), 10000)
      // ascending top-10^4 per key = ids g + 64j, j < 10^4 → all < 640000
      assert(topk.count() === 640000L)
      assert(topk.filter(col("score") >= 640000L).count() === 0)
      assert(topk.select(sum(col("score"))).as[Long].head() ===
        (0L until 640000L).sum)
    } finally spark.conf.unset("spark.graft.topk.maxKeysPerTask")
  }

  test("double group keys normalize: -0.0/0.0 one group, NaNs one group") {
    // byte-compared group keys must match SQL groupBy semantics
    val df = Seq((0.0, 1L), (-0.0, 2L), (Double.NaN, 3L), (Double.NaN, 4L))
      .toDF("grp", "id")
    val topk = TopKPerKey(df, Seq("grp"), Seq(("id", true)), 1)
    val ids = topk.select("id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(1L, 3L)) // one winner per NORMALIZED group
  }

  test("unknown column and non-positive k fail fast") {
    intercept[IllegalArgumentException] {
      TopKPerKey(df, Seq("nope"), Seq(("id", true)), 1)
    }
    intercept[IllegalArgumentException] {
      TopKPerKey(df, Seq("grp"), Seq(("id", true)), 0)
    }
  }
}
