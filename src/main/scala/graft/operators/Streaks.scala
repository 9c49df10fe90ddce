package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands over a per-key event-timestamp stream: runs of
  * CONSECUTIVE active days per key (streaks — the retention/engagement
  * shape).
  *
  * Reduction: distinct (key, day) first — the windowed part never sees raw
  * events — then anchor = day − row_number, which is constant across each
  * consecutive run (consecutive days advance both by one), so a plain
  * groupBy(key, anchor) recovers the islands. The row_number window and
  * the final agg share the key-prefix hash partitioning: ONE shuffle of
  * (key, date) pairs, bounded by keys × days — orders of magnitude under
  * the event count at 100 TB.
  */
object Streaks {

  /** Streaks of at least `minDays` consecutive active days per `key`,
    * as (key, streak_start, streak_end, streak_days).
    */
  def consecutiveDays(df: DataFrame, key: String, ts: String,
      minDays: Int = 2): DataFrame = {
    val days = df.select(col(key), to_date(col(ts)).as("dt")).distinct()
    val w = Window.partitionBy(key).orderBy("dt")
    days
      .withColumn("anchor", date_sub(col("dt"), row_number().over(w)))
      .groupBy(col(key), col("anchor"))
      .agg(min("dt").as("streak_start"), max("dt").as("streak_end"),
        count(lit(1)).as("streak_days"))
      .filter(col("streak_days") >= minDays)
      .select(col(key), col("streak_start"), col("streak_end"),
        col("streak_days"))
  }
}
