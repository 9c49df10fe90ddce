package graft.queries

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Typed Dataset API coverage (SURVEY.md §1.3 "case-class Encoders where
  * type safety helps"): a custom [[Aggregator]] — the typed, mergeable
  * user-defined aggregate — plus typed groupByKey. Completes the typed
  * family next to m04 (typed mapPartitions) and s04 (typed
  * flatMapGroupsWithState).
  */
object TypedQ {

  final case class LineQty(l_returnflag: String, l_quantity: Double)

  /** Decimal-exact mean: accumulate (count, sum in cents as Long) — merge
    * order can't perturb the result, so it is safe under any partitioning
    * (the property a double-sum Aggregator lacks).
    */
  object ExactMeanQty extends Aggregator[LineQty, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: LineQty): (Long, Long) =
      (b._1 + 1, b._2 + math.round(a.l_quantity * 100))
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Long)): Double =
      (r._2.toDouble / 100.0) / r._1
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Seq[Q] = Seq(
    Q("q43_typed_agg",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select("l_returnflag", "l_quantity").as[LineQty]
          .groupByKey(_.l_returnflag)
          .agg(ExactMeanQty.toColumn.name("mean_qty"))
          .toDF("l_returnflag", "mean_qty")
      },
      // cents-exact mean: sums of l_quantity*100 are integral.
      Some("""SELECT l_returnflag,
                     (CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
                        / 100.0) / COUNT(*) AS mean_qty
              FROM lineitem GROUP BY l_returnflag""")),

    Q("q44_union_distinct",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .distinct(),
      Some("""SELECT c_nationkey AS nk FROM customer
              UNION
              SELECT s_nationkey FROM supplier"""))
  )
}
