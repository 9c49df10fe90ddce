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

  test("rolling 7-day distinct (q104's explode+dedup) equals brute recount") {
    val s = spark
    import s.implicits._
    val day0 = Date.valueOf("2024-01-01").toLocalDate
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(200 + seed)
      val n = 1 + rnd.nextInt(80)
      // few users × few days with repeats: windows overlap and users recur
      val rows = Seq.fill(n)((rnd.nextInt(5).toLong,
        Date.valueOf(day0.plusDays(rnd.nextInt(15)))))
      val ev = rows.toDF("user_id", "day").distinct()
      val mx = ev.agg(max("day").as("md"))
      val got = ev.select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("w"))
        .distinct()
        .join(broadcast(mx)).filter(col("w") <= col("md"))
        .groupBy("w").agg(count(lit(1)).as("users_7d"))
        .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
        .sorted.toSeq
      val dist = rows.map { case (u, d) => (u, d.toLocalDate) }.distinct
      val (lo, hi) = (dist.map(_._2).min, dist.map(_._2).max)
      val want = Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi))
        .map { w =>
          val lo7 = w.minusDays(6)
          (w.toString, dist.filter { case (_, d) =>
            !d.isBefore(lo7) && !d.isAfter(w) }.map(_._1).distinct.size.toLong)
        }.filter(_._2 > 0).toSeq.sorted
      assert(got === want, s"seed=$seed")
    }
  }

  test("link rank equals naive integer power iteration on random graphs") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(200 + seed)
      val n = 2 + rnd.nextInt(40)
      val edges = Seq.fill(n)(
        (rnd.nextInt(8).toLong, rnd.nextInt(8).toLong)).distinct
      val iters = 1 + rnd.nextInt(4)
      val got = LinkRank.rank(edges.toDF("src", "dst"), iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // naive driver-side model of the same integer formula — dangling
      // nodes (dst-only) still hold rank and leak nothing, matching the
      // operator's closed node set
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var rank = nodes.map(_ -> LinkRank.InitRank).toMap
      (1 to iters).foreach { _ =>
        val in = edges.groupBy(_._2).view.mapValues(
          _.map { case (src, _) => rank(src) / deg(src) }.sum).toMap
        rank = nodes.map(v => v -> (in.getOrElse(v, 0L) * LinkRank.DampNum
          / LinkRank.DampDen + LinkRank.BaseRank)).toMap
      }
      assert(got === rank.toSeq.sorted, s"seed=$seed edges=$edges iters=$iters")
    }
  }
}
