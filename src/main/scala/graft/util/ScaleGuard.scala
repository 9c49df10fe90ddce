package graft.util

import org.apache.spark.sql.DataFrame

/** Loud guard for deliberately-retained single-reducer constructs.
  *
  * Extended.percentileCutBuiltin keeps the SQL-standard global
  * `percentile_disc` form as the documented hazard next to its scale-safe
  * twins (q80's fixed-width histogram sketch, q101's two-level exact cut);
  * since round 11 it is spec-only — the DECLARED surface carries q101, so
  * no catalogue query embeds a known single-reducer. A global exact
  * percentile funnels the full value column through ONE reducer; at bench
  * scale that is a few MB, at 100 TB it is a driver-side OOM that fails
  * only after shuffling the corpus. This guard makes the construct fail
  * FAST instead — before any job runs — once the optimizer's size
  * estimate for the input exceeds a configurable cap.
  *
  * Stats-only by design: `optimizedPlan.stats.sizeInBytes` comes from the
  * file index (or upstream operator estimates), so the check costs no
  * Spark job and cannot itself become a scan. The cap is bytes, not rows,
  * because row counts are absent from non-CBO stats while size always
  * propagates.
  */
object ScaleGuard {
  val PercentileMaxBytesKey = "spark.graft.percentile.maxBytes"

  /** 4 GiB default: far above any single-box bench input, far below the
    * point where a single-reducer sort stops being a shrug at 100 TB.
    */
  val DefaultPercentileMaxBytes: Long = 4L << 30

  /** Pass `df` through unchanged when its size estimate is under the cap;
    * throw with a message naming `alternatives` otherwise. A negative cap
    * disables the guard explicitly (the documented escape hatch).
    */
  def singleReducerPercentile(df: DataFrame,
      alternatives: String = "q80_percentile_sketch / q101_percentile_gate_exact"): DataFrame = {
    val cap = df.sparkSession.conf
      .get(PercentileMaxBytesKey, DefaultPercentileMaxBytes.toString).toLong
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (cap >= 0 && est > BigInt(cap)) throw new IllegalStateException(
      s"global exact percentile over an input estimated at $est bytes " +
        s"(> $PercentileMaxBytesKey=$cap): this construct sorts the full " +
        s"value column through a single reducer and does not scale. Use " +
        s"the scale-safe forms instead ($alternatives), or raise/disable " +
        s"the cap (-1) if the input is genuinely small.")
    df
  }
}
