package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ResampleSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def ts(t: String) = Timestamp.valueOf(t)

  test("gapFill densifies the grid, forward-fills, and flags gaps") {
    // key "a": observations in hours 0 and 3 -> hours 1,2 are filled gaps
    val df = Seq(
      ("a", ts("2024-01-01 00:15:00"), 10.0),
      ("a", ts("2024-01-01 00:45:00"), 20.0), // same bucket: mean = 15
      ("a", ts("2024-01-01 03:30:00"), 40.0),
      ("b", ts("2024-01-01 05:00:00"), 7.0)).toDF("k0", "t0", "v0")

    val out = Resample.gapFill(df, "k0", "t0", "v0")
      .orderBy("k", "bucket").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        Option(r.get(2)), r.getDouble(3), r.getBoolean(4)))

    assert(out.toSeq === Seq(
      ("a", "2024-01-01 00:00:00.0", Some(15.0), 15.0, false),
      ("a", "2024-01-01 01:00:00.0", None, 15.0, true),  // filled
      ("a", "2024-01-01 02:00:00.0", None, 15.0, true),  // filled
      ("a", "2024-01-01 03:00:00.0", Some(40.0), 40.0, false),
      ("b", "2024-01-01 05:00:00.0", Some(7.0), 7.0, false)))
  }

  test("single-observation key yields a one-row grid") {
    val df = Seq(("x", ts("2024-01-01 10:59:00"), 3.0)).toDF("k0", "t0", "v0")
    val out = Resample.gapFill(df, "k0", "t0", "v0").collect()
    assert(out.length === 1)
    assert(!out.head.getBoolean(4))
  }
}
