package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data clustering.
  *
  * At 100 TB, a table range-partitioned and sorted by the z-value of two
  * filter columns gives every parquet file/row-group TIGHT min/max stats on
  * BOTH columns at once — a 2-D box predicate then prunes most row groups at
  * the scan (the same layout trick Delta/Iceberg expose as OPTIMIZE ZORDER
  * BY; here it is plain `repartitionByRange(z).sortWithinPartitions(z)` +
  * parquet stats, no table format needed). A single-column sort can only
  * tighten one dimension; z-order trades a little of each.
  *
  * The z-value never appears in query predicates — queries keep filtering on
  * the natural columns, and pruning falls out of the physical correlation.
  * Built from codegen'd bitwise `Column` ops only (shift/and/or), so the
  * layout write is one whole-stage-codegen'd pass.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `x` (even z positions) and `y` (odd
    * positions): z = Σ_i ((x>>i & 1) << 2i) | ((y>>i & 1) << (2i+1)).
    * `bits` must cover each column's value domain — masked-off high bits
    * would alias distant values onto nearby z cells and destroy the
    * min/max-stat locality this exists for.
    *
    * Dimensions must first be SCALED to comparable magnitude: if one domain
    * is 2^k× wider, its top bits own the top z bits and the curve degrades
    * to a plain sort on that column (the narrow column's files stay
    * full-span). Table-format implementations normalize via per-column
    * range buckets; a cheap static `y * (xMax/yMax)` multiplier does the
    * same where domains are known, as in q77.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val xm = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val ym = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The clustered-layout write (q77's layout pass, also pinned by
    * LayoutSpec on this same code path): range-partition + sort `df` by
    * z(x, y) into `files` parquet files at `dest`, return the read-back.
    * Callers pre-scale x/y to comparable magnitude per [[zValue]]'s note.
    */
  def clusteredWrite(df: DataFrame, x: Column, y: Column, dest: String,
      files: Int = 8): DataFrame = {
    df.withColumn("zval", zValue(x, y))
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(dest)
    df.sparkSession.read.parquet(dest)
  }
}
