package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage 1 of the pipeline: per-room per-sensor CSVs → one aligned office
  * table (reference: utils/spark_transforming.py — 5-way inner equi-join per
  * room on the minute key, tag room, union rooms, sort, dropna, derive
  * event timestamp).
  *
  * Two physical strategies behind one logical contract:
  *
  *   - [[joinPlan]] — the reference's shape verbatim: five filtered frames
  *     chained through inner equi-joins on `ts_min_bignt`
  *     (utils/spark_transforming.py:97-113), then the union fold
  *     (:123-131 — expressed as one frame because `room` is a column here,
  *     not a loop variable). Faithful to join multiplicity on duplicate
  *     timestamps.
  *   - [[pivotPlan]] — the 100 TB form: ONE globbed scan of every file
  *     (no per-file driver loop — the reference runs ~255 schema-inference
  *     jobs for 51 rooms, SURVEY.md §4), sensor identity recovered from the
  *     file path with `input_file_name()`, then a single groupBy pivot.
  *     One shuffle on (room, ts) replaces 4 joins per room × 51 rooms;
  *     requiring all five sensors non-null reproduces inner-join row loss.
  *     Collapses duplicate timestamps with `first` (documented divergence —
  *     duplicate minute keys in a sensor file are a data bug the reference
  *     turns into a row explosion).
  *
  * Both read with the declared schema (no inference) and map files by
  * filename stem, fixing the reference's listing-order column assignment
  * (utils/spark_transforming.py:78-88, SURVEY.md §0).
  */
object RoomReader {
  import OfficeSchema._

  /** Read every `<root>/<room>/<sensor>.csv` as one raw frame with `room` and
    * `sensor` columns recovered from the file path — S4 without a driver-side
    * listing loop.
    */
  def rawScan(spark: SparkSession, root: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(sensorCsv)
      .csv(s"$root/*/*.csv")
      .withColumn("path", input_file_name())
      .withColumn("sensor", regexp_extract(col("path"), "([^/]+)\\.csv$", 1))
      .withColumn("room", regexp_extract(col("path"), "([^/]+)/[^/]+\\.csv$", 1))
      .drop("path")

  /** Shared tail: global sort, dropna (utils/spark_transforming.py:143,145),
    * event timestamp derivation (:148-149; UTC-pinned, at-rest type STRING).
    */
  private def finish(joined: DataFrame): DataFrame =
    joined
      .orderBy("ts_min_bignt", "room")
      .na.drop("any")
      .withColumn("event_ts_min",
        date_format(from_unixtime(col("ts_min_bignt")), "yyyy-MM-dd HH:mm:ss"))
      .select(office.fieldNames.map(col): _*)

  /** Reference-shaped plan: five per-sensor frames, chained inner joins. */
  def joinPlan(spark: SparkSession, root: String): DataFrame = {
    val raw = rawScan(spark, root)
    val bySensor = sensors.map { s0 =>
      raw.filter(col("sensor") === s0)
        .select(col("room"), col("ts_min_bignt"), col("reading").as(s0))
    }
    val joined = bySensor.reduce(_.join(_, Seq("room", "ts_min_bignt"), "inner"))
    finish(joined)
  }

  /** Scale plan: single scan + groupBy pivot; inner-join semantics restored
    * by requiring all five sensor columns non-null.
    */
  def pivotPlan(spark: SparkSession, root: String): DataFrame = {
    val raw = rawScan(spark, root)
    val wide = raw
      .groupBy("room", "ts_min_bignt")
      .pivot("sensor", sensors)
      .agg(first("reading"))
    val allPresent = sensors.map(col(_).isNotNull).reduce(_ && _)
    finish(wide.filter(allPresent))
  }

  def read(spark: SparkSession, root: String, faithful: Boolean = false): DataFrame =
    if (faithful) joinPlan(spark, root) else pivotPlan(spark, root)
}

/** Stage-1 job: rooms directory → one parquet dataset, mode=overwrite
  * (K1, utils/spark_transforming.py:162). One canonical output path —
  * the reference's out/output path mismatch (SURVEY.md §0) does not exist
  * here.
  */
object BatchEtl {
  def run(spark: SparkSession, roomsDir: String, outPath: String,
      faithful: Boolean = false): Unit =
    RoomReader.read(spark, roomsDir, faithful)
      .write.mode("overwrite").parquet(outPath)
}
