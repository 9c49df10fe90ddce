package graft.operators

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the algorithmic REDUCTIONS behind q89/q92 against brute force on
  * seeded random data: the operators replace an O(n²) self-join (skyline)
  * and an ad-hoc run-detection (streaks) with shuffle-lean plans — these
  * properties prove the plans compute the same relation the naive
  * definition does, including tie and duplicate cases the testdata may not
  * contain.
  */
class ReductionPropSpec extends SparkSpec {

  test("skyline reduction equals the O(n²) dominance definition") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 25) {
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(60)
      // tiny domains on purpose: force duplicate sizes and tied prices
      val rows = Seq.fill(n)(
        (rnd.nextInt(1000).toLong, rnd.nextInt(8), rnd.nextInt(10) * 1.0))
      val df = rows.toDF("id", "b", "sm")
      val got = Skyline.pareto2D(df, "b", "sm")
        .select("id", "b", "sm").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sorted.toSeq
      val want = rows.filter { case (_, b, sm) =>
        !rows.exists { case (_, b2, sm2) => b2 > b && sm2 < sm }
      }.sorted
      assert(got === want.sorted, s"seed=$seed rows=$rows")
    }
  }

  test("streak reduction equals naive consecutive-run detection") {
    val s = spark
    import s.implicits._
    val day0 = Date.valueOf("2024-01-01").toLocalDate
    for (seed <- 1 to 15) {
      val rnd = new scala.util.Random(100 + seed)
      val n = 1 + rnd.nextInt(80)
      // few keys, few days, multiple events per day (the distinct matters)
      val rows = Seq.fill(n)((rnd.nextInt(3).toLong,
        Timestamp.valueOf(day0.plusDays(rnd.nextInt(12))
          .atTime(rnd.nextInt(24), 0))))
      val df = rows.toDF("k", "ts")
      val got = Streaks.consecutiveDays(df, "k", "ts")
        .collect().map(r => (r.getLong(0), r.getDate(1).toString,
          r.getDate(2).toString, r.getLong(3))).sorted.toSeq
      val want = rows.groupBy(_._1).toSeq.flatMap { case (k, evs) =>
        val days = evs.map(_._2.toLocalDateTime.toLocalDate).distinct.sorted
        // split into consecutive runs
        val runs = days.foldLeft(List.empty[List[java.time.LocalDate]]) {
          case (acc, d) => acc match {
            case (h :: t) :: rest if h.plusDays(1) == d =>
              (d :: h :: t) :: rest
            case _ => List(d) :: acc
          }
        }.map(_.reverse).reverse
        runs.filter(_.size >= 2).map(r =>
          (k, r.head.toString, r.last.toString, r.size.toLong))
      }.sorted
      assert(got === want, s"seed=$seed")
    }
  }
}
