package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private lazy val s = spark
  import s.implicits._

  test("leftAsOf picks the greatest right time <= left time per key") {
    val quotes = Seq( // key, qt, px
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("k", "qt", "px")
    val trades = Seq( // key, tt
      ("A", 5L), ("A", 20L), ("A", 25L), ("B", 100L), ("C", 50L))
      .toDF("k", "tt")

    val out = AsOfJoin.leftAsOf(trades, "tt", quotes, "qt", Seq("k"))
      .select($"k", $"tt", $"_asof.qt".as("mqt"), $"_asof.px".as("mpx"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet

    assert(out === Set(
      ("A", 5L, None, None),               // before any quote
      ("A", 20L, Some(20L), Some(2.0)),    // equal time is inclusive
      ("A", 25L, Some(20L), Some(2.0)),
      ("B", 100L, Some(15L), Some(9.0)),
      ("C", 50L, None, None)))             // key with no right rows
  }

  test("forward as-of picks the smallest right time >= left time per key") {
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("k", "qt", "px")
    val trades = Seq(
      ("A", 5L), ("A", 20L), ("A", 25L), ("A", 31L), ("B", 1L))
      .toDF("k", "tt")

    val out = AsOfJoin.leftAsOf(trades, "tt", quotes, "qt", Seq("k"),
        forward = true)
      .select($"k", $"tt", $"_asof.qt".as("mqt"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet

    assert(out === Set(
      ("A", 5L, Some(10L)),   // next quote after 5
      ("A", 20L, Some(20L)),  // equal time inclusive
      ("A", 25L, Some(30L)),
      ("A", 31L, None),       // nothing after the last quote
      ("B", 1L, Some(15L))))
  }

  test("toleranceMicros nulls matches beyond the bound (both directions)") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val right = Seq(("A", t(1000)), ("A", t(5000))).toDF("k", "rt")
    val left = Seq(("A", t(1100)), ("A", t(3000)), ("A", t(4990)))
      .toDF("k", "lt")
    def matched(forward: Boolean): Seq[Option[Long]] =
      AsOfJoin.leftAsOf(left, "lt", right, "rt", Seq("k"),
        forward = forward, toleranceMicros = Some(200L * 1000000L))
        .orderBy("lt")
        .select($"_asof.rt").collect()
        .map(r => Option(r.get(0))
          .map(_.asInstanceOf[java.sql.Timestamp].getTime / 1000L)).toSeq
    // backward: 1100→1000 (within 200s), 3000→null (2000s away), 4990→null
    assert(matched(forward = false) === Seq(Some(1000L), None, None))
    // forward: 1100→null (3900s to 5000), 3000→null, 4990→5000 (10s)
    assert(matched(forward = true) === Seq(None, None, Some(5000L)))
  }

  test("tieBreak orders equal-time right rows deterministically (last wins)") {
    val right = Seq(("A", 10L, "r1"), ("A", 10L, "r2"), ("A", 10L, "r0"))
      .toDF("k", "rt", "tag")
    val left = Seq(("A", 11L)).toDF("k", "lt")
    val out = AsOfJoin.leftAsOf(left, "lt", right, "rt", Seq("k"),
      tieBreak = Seq("tag"))
      .select($"_asof.tag").as[String].collect()
    assert(out.toSeq === Seq("r2")) // greatest tag at the tied max time
  }
}
