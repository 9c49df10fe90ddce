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
