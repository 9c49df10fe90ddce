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
    val bDf = Extended.percentileCutBuiltin(spark, sf)
    val qDf = graft.SparkEntry.queries("q101_percentile_gate_exact")(spark, sf)
    // schema compared explicitly — the old Row.toString compare rendered
    // INT and BIGINT (and double formatting edge cases) identically,
    // masking type drift between the twins (round-11 advice)
    assert(bDf.schema.map(f => (f.name, f.dataType))
      == qDf.schema.map(f => (f.name, f.dataType)))
    // identical cut by construction: the built-in percentile_disc form and
    // q101's two-level integer-rank form gate the same rows
    val builtin = bDf.orderBy("l_returnflag").collect()
    val q101 = qDf.orderBy("l_returnflag").collect()
    assert(builtin.nonEmpty && builtin.length == q101.length)
    builtin.zip(q101).foreach { case (b, q) =>
      (0 until b.length).foreach { i =>
        assert(b.get(i) == q.get(i),
          s"field $i: ${b.get(i)} (builtin) != ${q.get(i)} (q101)")
      }
    }
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
