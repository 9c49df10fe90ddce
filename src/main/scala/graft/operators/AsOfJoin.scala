package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, attach the right row with the greatest
  * `rightTime <= leftTime` within the same key — the time-series alignment
  * operator that generalizes the reference's minute-key equi-join
  * (utils/spark_transforming.py:97-113; SURVEY.md §2.4 names as-of as the
  * natural extension, and Spark 4 batch has no built-in).
  *
  * Spark-first design (no custom physical operator needed): ONE shuffle on
  * the key, no range explosion —
  *
  *   1. union right rows (tagged) with left rows, aligned by name;
  *   2. per key, sort by (time, side) with right rows first at equal times
  *      (makes the match inclusive: `rightTime <= leftTime`);
  *   3. running `last(right_payload, ignoreNulls)` over
  *      rowsBetween(unboundedPreceding, currentRow) carries the most recent
  *      right row forward;
  *   4. keep left rows.
  *
  * Cost: one hash shuffle + per-partition sort of |L|+|R| rows — the same
  * plan class as a sort-merge join, scale-safe at 100 TB (contrast with the
  * naive equi-join + filter + argmax, which explodes to |L|·|R| per key).
  * Skewed keys fall under AQE's skew handling like any other shuffle.
  *
  * Determinism: when several right rows share the greatest admissible time,
  * `tieBreak` columns order them and the LAST one wins; pass the right
  * table's unique id to make results reproducible.
  */
object AsOfJoin {

  /** @param left      left frame; all its columns survive
    * @param leftTime  left event-time column name
    * @param right     right frame; its non-key payload columns are attached
    * @param rightTime right event-time column name
    * @param keys      equi-join key column names present on both sides
    * @param tieBreak  right columns ordering equal-time right rows
    * @param forward   false (default): greatest `rightTime <= leftTime`
    *                  (backward as-of); true: smallest `rightTime >=
    *                  leftTime` (forward as-of — "next reading at or after")
    * @param toleranceMicros for TimestampType time columns: null the match
    *                  when it lies more than this many microseconds from
    *                  the left time (exact integer compare via unix_micros —
    *                  a double epoch-seconds compare would wobble at the
    *                  boundary). Same one-shuffle plan; the bound only
    *                  filters the carried match.
    */
  def leftAsOf(
      left: DataFrame,
      leftTime: String,
      right: DataFrame,
      rightTime: String,
      keys: Seq[String],
      tieBreak: Seq[String] = Nil,
      forward: Boolean = false,
      toleranceMicros: Option[Long] = None): DataFrame = {

    val reserved = Set("_t", "_side", "_r", "_asof", "_asof_t") ++
      tieBreak.map(c => s"_tb_$c")
    val clash = (left.columns ++ right.columns).filter(c =>
      reserved(c) || c.startsWith("_tb_"))
    require(clash.isEmpty,
      s"leftAsOf reserves internal column names ${reserved.mkString(", ")}; " +
        s"rename input columns: ${clash.mkString(", ")}")

    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_t"),
        struct(rightPayload.map(col): _*).as("_r"),
        lit(1).as("_side")) ++
        tieBreak.map(c => col(c).as(s"_tb_$c")): _*)
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(0))

    val u = l.unionByName(r, allowMissingColumns = true)
    // forward as-of = the same carry scanned in DESCENDING time: the last
    // right row seen before a left row is then the SMALLEST admissible
    // rightTime >= leftTime. Right-before-left at equal times (inclusive
    // match) and the tie-break direction are unchanged.
    val tCol = if (forward) col("_t").desc else col("_t").asc
    val order = Seq(tCol, col("_side").desc) ++
      tieBreak.map(c => col(s"_tb_$c").asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = u
      .withColumn("_asof", last("_r", ignoreNulls = true).over(w))
      .withColumn("_asof_t",
        last(when(col("_side") === 1, col("_t")), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
    val bounded = toleranceMicros match {
      case Some(tol) =>
        carried.withColumn("_asof",
          when(abs(unix_micros(col("_asof_t")) -
            unix_micros(col(leftTime))) <= tol, col("_asof")))
      case None => carried
    }
    bounded.drop(
      (Seq("_t", "_side", "_r", "_asof_t") ++ tieBreak.map(c => s"_tb_$c")): _*)
  }
}
