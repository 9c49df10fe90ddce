package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins the physical property q77's z-order layout exists for: after
  * clustering by z(l_partkey, l_suppkey), each written file covers a small
  * box of the 2-D key space, so its parquet min/max stats can kill it
  * against a box predicate. A single-column sort would tighten only its own
  * column; z-order must tighten BOTH on average.
  */
class LayoutSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("z-value interleaves bits exactly (Morton order)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L),
      (1999L, 99L)).toDF("x", "y")
    val got = rows.select(ZOrder.zValue(col("x"), col("y"), 16).as("z"))
      .as[Long].collect().toSeq
    def ref(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val want = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L),
      (1999L, 99L)).map { case (x, y) => ref(x, y) }
    assert(got === want)
  }

  test("z-order layout tightens per-file min/max on BOTH box columns") {
    val tmp = graft.util.Scratch.dir("graft_layoutspec_z")
    // The same clusteredWrite code path q77 runs — the spec pins the query.
    val clustered = ZOrder.clusteredWrite(Tables.lineitem(spark, sf),
      col("l_partkey"), col("l_suppkey") * lit(20), tmp)

    val perFile = clustered
      .groupBy(input_file_name().as("f"))
      .agg(
        (max("l_partkey") - min("l_partkey")).as("pk_span"),
        (max("l_suppkey") - min("l_suppkey")).as("sk_span"))
      .agg(avg("pk_span").as("avg_pk"), avg("sk_span").as("avg_sk"),
        count(lit(1)).as("n_files"))
      .head()
    val (avgPk, avgSk, nFiles) =
      (perFile.getDouble(0), perFile.getDouble(1), perFile.getLong(2))
    assert(nFiles >= 8)
    // Global spans at sf0.01: l_partkey 0..1999, l_suppkey 0..99. An
    // unclustered write leaves every file spanning ~the full 2-D domain
    // (area ratio ~1.0). The 8-way z-layout must shrink the average file's
    // key-space BOX to a fraction of the domain, with some tightening on
    // EACH dimension (exact per-dimension splits depend on where the
    // range-sampler lands relative to bit boundaries, so the per-dim bound
    // is loose and the area bound carries the assertion). The bound is 1/3,
    // not tighter: RangePartitioner's sample seed derives from RDD ids, so
    // in a shared-session full-suite run the boundaries shift slightly with
    // suite order (observed 0.19 in isolation, 0.257 in-suite).
    val areaRatio = (avgPk / 2000.0) * (avgSk / 100.0)
    assert(areaRatio < 1.0 / 3, s"file box area not shrunk: $areaRatio " +
      s"(pk=$avgPk, sk=$avgSk)")
    assert(avgPk < 2000 * 0.9, s"partkey span not tightened: $avgPk")
    assert(avgSk < 100 * 0.9, s"suppkey span not tightened: $avgSk")
  }
}
