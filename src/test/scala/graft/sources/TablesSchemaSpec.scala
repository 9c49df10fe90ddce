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

  test("catalog-assumed columns exist with compatible type families") {
    assume(available)
    // Family-level assertions only (integral / fractional / string / array /
    // timestamp-like): strict physical types drift benignly between
    // regenerations, but a column the query surface depends on vanishing or
    // changing family should fail HERE, not in 50 scattered query specs.
    def family(dt: DataType): String = dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => "int"
      case _: FloatType | _: DoubleType | _: DecimalType => "frac"
      case _: StringType => "str"
      case _: TimestampType | _: TimestampNTZType | _: DateType => "time"
      case ArrayType(e, _) => "arr:" + family(e)
      case other => other.simpleString
    }
    val assumed: Seq[(String, String, String)] = Seq(
      ("documents", "doc_id", "int"), ("documents", "text", "str"),
      ("documents", "lang", "str"), ("documents", "source", "str"),
      ("documents", "n_chars", "int"),
      ("embeddings", "vec_id", "int"), ("embeddings", "embedding", "arr:frac"),
      ("embeddings", "label", "int"),
      ("events", "event_id", "int"), ("events", "user_id", "int"),
      ("events", "event_type", "str"), ("events", "value", "frac"),
      ("events", "props", "str"),
      ("lineitem", "l_orderkey", "int"), ("lineitem", "l_quantity", "frac"),
      ("lineitem", "l_extendedprice", "frac"),
      ("lineitem", "l_discount", "frac"),
      ("lineitem", "l_returnflag", "str"), ("lineitem", "l_shipdate", "time"),
      ("orders", "o_orderkey", "int"), ("orders", "o_custkey", "int"),
      ("orders", "o_totalprice", "frac"), ("orders", "o_orderdate", "time"),
      ("orders", "o_orderpriority", "str"),
      ("customer", "c_custkey", "int"), ("customer", "c_nationkey", "int"),
      ("nation", "n_nationkey", "int"), ("nation", "n_regionkey", "int"),
      ("region", "r_regionkey", "int"),
      ("supplier", "s_suppkey", "int"), ("part", "p_partkey", "int"))
    val schemas = assumed.map(_._1).distinct
      .map(t => t -> Tables.load(spark, sf, t).schema).toMap
    assumed.foreach { case (t, c, fam) =>
      val f = schemas(t).fields.find(_.name == c)
      assert(f.isDefined, s"$t.$c: column missing after regeneration")
      assert(family(f.get.dataType) == fam,
        s"$t.$c: family ${family(f.get.dataType)} != assumed $fam " +
          s"(physical ${f.get.dataType.simpleString})")
    }
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

  test("estimatedSplits: file-backed plans estimate > 0 with rdd-parity " +
      "on a single small file; in-memory frames estimate 0 (round-16 — " +
      "the seeded-kmeans floor no longer compiles a physical plan)") {
    val s2 = spark
    import s2.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val est = Tables.estimatedSplits(emb)
    assert(est > 0)
    // one small parquet file: the estimate and the physical layout agree,
    // so the floor's routing decision is unchanged by the swap
    assert(est === emb.rdd.getNumPartitions.toLong)
    assert(Tables.estimatedSplits(Seq((1L, 2L)).toDF("a", "b")) === 0L)
  }
}
