package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (pareto frontier): rows not dominated by any other row,
  * where domination means strictly greater on the `bigger` column AND
  * strictly smaller on the `smaller` column (e.g. "no other part is both
  * larger and cheaper").
  *
  * The textbook form is an O(n²) NOT-EXISTS self-join. For two dimensions
  * it reduces exactly to: per-`bigger`-value partial-agg min of `smaller`
  * (one shuffle of (bigger, min) pairs), a running strict-prefix min over
  * the aggregated rows ordered by `bigger` desc (a single-partition window
  * — fine, its input cardinality is the attribute DOMAIN, not the row
  * count), and a broadcast join of the per-value threshold back onto the
  * scan. A row survives iff no strictly-larger `bigger` value has a
  * strictly-smaller `smaller`: thr(b) = min over b' > b of min_smaller(b'),
  * keep when thr is null (max value) or smaller <= thr. At 100 TB: one
  * partial agg + one broadcast, never a self-join.
  */
object Skyline {

  /** Rows of `df` on the pareto frontier of (`bigger` max-better,
    * `smaller` min-better). Preserves all input columns.
    */
  def pareto2D(df: DataFrame, bigger: String, smaller: String): DataFrame = {
    val byVal = df.groupBy(bigger)
      .agg(min(smaller).as("graft_sky_min"))
    val w = Window.orderBy(col(bigger).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val thr = byVal
      .withColumn("graft_sky_thr", min("graft_sky_min").over(w))
      .select(col(bigger), col("graft_sky_thr"))
    df.join(broadcast(thr), bigger)
      .filter(col("graft_sky_thr").isNull ||
        col(smaller) <= col("graft_sky_thr"))
      .drop("graft_sky_thr")
  }
}
