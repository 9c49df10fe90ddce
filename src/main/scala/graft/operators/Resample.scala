package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling with gap-filling — the alignment operator the
  * reference's sensor domain needs but never implements (SURVEY.md §1.1:
  * "no gap-filling"; rooms with a silent sensor simply vanish from its
  * inner join, utils/spark_transforming.py:97-113).
  *
  * Per key: build the dense bucket grid spanning [min(ts), max(ts)],
  * left-join the observed per-bucket aggregate, and forward-fill misses
  * with the last observed value.
  *
  * Scale shape: one groupBy for the per-key span (tiny result), grid rows
  * generated distributed by `sequence`+`explode` (no driver loop), one
  * shuffle to join observations, one window pass for the fill. Grid size is
  * span/step per key — the output's own size, so nothing is materialized
  * beyond the answer.
  */
object Resample {

  /** @param df      input rows
    * @param keyCol  series identity column name
    * @param tsCol   event-time column name (TimestampType)
    * @param valCol  numeric observation column name
    * @param step    bucket width as a SQL interval string (e.g. "1 hour");
    *                buckets are epoch-aligned via date_trunc on `truncUnit`
    * @param truncUnit date_trunc unit matching `step` ("hour", "day", ...)
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      step: String = "1 hour", truncUnit: String = "hour"): DataFrame = {
    val bucketed = df.select(
      col(keyCol).as("k"),
      date_trunc(truncUnit, col(tsCol)).as("bucket"),
      col(valCol).as("v"))

    // observed per-bucket mean (decimal-exact so results are
    // partitioning-stable and oracle-portable)
    val observed = bucketed
      .groupBy("k", "bucket")
      .agg((sum(col("v").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
        .cast("double") / count(lit(1))).as("v_obs"))

    val grid = bucketed
      .groupBy("k")
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("k"),
        explode(expr(s"sequence(lo, hi, interval $step)")).as("bucket"))

    val w = Window.partitionBy("k").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq("k", "bucket"), "left")
      .withColumn("v_filled", last(col("v_obs"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("v_obs").isNull)
  }
}
