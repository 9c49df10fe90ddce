package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.ScaleGuard

/** The retained single-reducer percentile (Extended.percentileCutBuiltin —
  * RETIRED from the declared surface in round 11, q101 is the scale-safe
  * twin that stays declared): it must fail LOUDLY above the size cap,
  * directing users to the scale-safe forms; stay bit-identical to declared
  * q101 below it; and keep the broadcast-cutoff plan shape.
  */
class ScaleGuardSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("under the cap the guard passes through and equals declared q101") {
    val builtin = Extended.percentileCutBuiltin(spark, sf)
      .orderBy("l_returnflag").collect()
    assert(builtin.nonEmpty)
    // identical cut by construction: the built-in percentile_disc form and
    // q101's two-level integer-rank form gate the same rows
    val q101 = graft.SparkEntry.queries("q101_percentile_gate_exact")(spark, sf)
      .orderBy("l_returnflag").collect()
    assert(builtin.map(_.toString).toSeq == q101.map(_.toString).toSeq)
  }

  test("the retired form keeps the broadcast-cutoff plan (no SMJ)") {
    val p = Extended.percentileCutBuiltin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("over the cap the guard throws before any job, naming the twins") {
    spark.conf.set(ScaleGuard.PercentileMaxBytesKey, "1")
    try {
      val e = intercept[IllegalStateException] {
        Extended.percentileCutBuiltin(spark, sf)
      }
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

  test("no declared query routes through the single-reducer guard") {
    // the retirement's contract: the catalogue must not regrow a declared
    // entry that embeds the guarded construct (the guard lives on only as
    // the spec-pinned anti-example above)
    assert(!graft.SparkEntry.queries.contains("q90_percentile_cut"))
  }
}
