package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift guard (round-7, verdict item 5): the driver regenerates
  * /root/testdata between rounds and has already changed `events.ts`'s
  * physical type once (TIMESTAMP(NANOS) → timestamp[us] NTZ), which broke
  * 23 queries and 31 specs at the round-6 gate through a single unhandled
  * case in `Tables.normalizeEvents`. This spec pins the catalog's contract:
  * every on-disk table opens, and `events.ts` normalizes to TimestampType
  * from EVERY physical form seen so far — so the next regeneration fails
  * one focused test here instead of 54 scattered ones.
  */
class TablesSchemaSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private def available: Boolean = new java.io.File(sf).isDirectory

  test("every catalog table opens with a non-empty schema") {
    assume(available)
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sf, n)
      assert(df.schema.fields.nonEmpty, s"$n: empty schema")
    }
  }

  test("events.ts normalizes to TimestampType from the on-disk form") {
    assume(available)
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts read as ${ev.schema("ts").dataType}; " +
        "normalizeEvents is missing a case for the regenerated physical type")
    // The two operations that broke at the r6 gate must both resolve.
    ev.select(expr("unix_micros(ts)")).limit(1).collect()
    ev.withWatermark("ts", "1 minute")
  }

  test("normalizeEvents accepts nanos-long, micros-NTZ and micros-LTZ") {
    import spark.implicits._
    val microsUtc = 1700000000000000L // 2023-11-14T22:13:20Z
    // nanos-as-long (legacy TIMESTAMP(NANOS) read)
    val fromNanos = Tables.normalizeEvents(
      Seq(microsUtc * 1000L).toDF("ts"))
    // micros NTZ (current generator output: isAdjustedToUTC=false)
    val fromNtz = Tables.normalizeEvents(
      Seq(microsUtc).toDF("us")
        .select(expr("make_timestamp_ntz(2023, 11, 14, 22, 13, 20)").as("ts")))
    // micros LTZ (already normalized — pass through)
    val fromLtz = Tables.normalizeEvents(
      Seq(microsUtc).toDF("us")
        .select(expr("timestamp_micros(us)").as("ts")))
    for ((df, form) <- Seq(fromNanos -> "nanos-long", fromNtz -> "micros-NTZ",
                           fromLtz -> "micros-LTZ")) {
      assert(df.schema("ts").dataType == TimestampType, s"form=$form")
      val got = df.select(expr("unix_micros(ts)")).as[Long].head()
      assert(got == microsUtc,
        s"form=$form: unix_micros=$got != $microsUtc — normalization must " +
          "be value-preserving under the UTC-pinned session")
    }
  }
}
