package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.ScaleGuard

/** q90's guardrail (round-7 verdict item 5): the retained single-reducer
  * percentile must fail LOUDLY above the size cap, directing users to the
  * scale-safe twins — and must stay bit-identical below it.
  */
class ScaleGuardSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("under the cap the guard is a pass-through (q90 result unchanged)") {
    val q90 = graft.SparkEntry.queries("q90_percentile_cut")
    val rows = q90(spark, sf).collect()
    assert(rows.nonEmpty)
  }

  test("over the cap the guard throws before any job, naming the twins") {
    spark.conf.set(ScaleGuard.PercentileMaxBytesKey, "1")
    try {
      val q90 = graft.SparkEntry.queries("q90_percentile_cut")
      val e = intercept[IllegalStateException] { q90(spark, sf) }
      assert(e.getMessage.contains("q80_percentile_sketch"))
      assert(e.getMessage.contains("q101_percentile_gate_exact"))
      assert(e.getMessage.contains(ScaleGuard.PercentileMaxBytesKey))
    } finally spark.conf.unset(ScaleGuard.PercentileMaxBytesKey)
  }

  test("a negative cap disables the guard explicitly") {
    spark.conf.set(ScaleGuard.PercentileMaxBytesKey, "-1")
    try {
      val df = spark.range(1000).select(col("id").cast("double").as("v"))
      assert(ScaleGuard.singleReducerPercentile(df) eq df)
    } finally spark.conf.unset(ScaleGuard.PercentileMaxBytesKey)
  }
}
