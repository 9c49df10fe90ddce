package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec
import graft.sources.Tables

/** Semantic pins for the round-9 maintenance/governance queries: q106's
  * partial-state merge must equal a full recompute (the IVM contract), q107's
  * profile must be internally consistent, and t20's budget cut must admit a
  * quality-ranked prefix that just crosses half the source's token mass.
  */
class ProfileMaintenanceSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q106 snapshot+delta merge equals the full recompute") {
    val merged = Catalog.byName("q106_incremental_agg").run(spark, sf)
    val full = Tables.events(spark, sf)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double")
          .as("sum_value"),
        min("value").as("min_value"), max("value").as("max_value"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("q107 profile is internally consistent") {
    val rows = Catalog.byName("q107_table_profile").run(spark, sf).collect()
    val n = Tables.lineitem(spark, sf).count()
    assert(rows.length === 4)
    rows.foreach { r =>
      val (nonNull, distinct, nRows) =
        (r.getLong(1), r.getLong(2), r.getLong(5))
      assert(nRows === n)
      assert(distinct <= nonNull && nonNull <= nRows)
      assert(r.getString(3) != null && r.getString(4) != null)
    }
  }

  test("t20 admits a rank-contiguous prefix that just crosses half the mass") {
    val kept = Catalog.byName("t20_quality_budget").run(spark, sf)
      .select("source", "rn", "n_tokens").collect()
      .groupBy(_.getString(0))
    val totals = graft.ext.TextOps.quality(
        Tables.documents(spark, sf), keep = Seq("source"))
      .groupBy("source").agg(sum("n_tokens").as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.nonEmpty && kept.keySet === totals.keySet)
    kept.foreach { case (src, rows) =>
      val rns = rows.map(_.getInt(1)).sorted
      assert(rns.toSeq === (1 to rows.length), s"$src kept a non-prefix")
      val mass = rows.map(_.getLong(2)).sum
      val lastTok = rows.maxBy(_.getInt(1)).getLong(2)
      assert(mass * 2 >= totals(src), s"$src under-spent the budget")
      assert((mass - lastTok) * 2 < totals(src),
        s"$src over-spent before the boundary doc")
    }
  }
}
