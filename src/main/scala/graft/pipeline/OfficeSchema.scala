package graft.pipeline

import org.apache.spark.sql.types._

/** Schemas for the office-sensor pipeline (the reference's domain model).
  *
  * The reference infers per-file CSV schemas (utils/spark_transforming.py:82)
  * and renames positionally; inference is nondeterministic across files
  * (int vs long/double can flip per room — SURVEY.md §7.4 risk 2), so this
  * engine declares every schema explicitly.
  */
object OfficeSchema {

  /** Sensor file basenames, in the column order of the joined output
    * (utils/spark_transforming.py:66). The reference maps files to columns by
    * directory-listing order; we key by filename stem (SURVEY.md §0).
    */
  val sensors: Seq[String] = Seq("co2", "humidity", "light", "pir", "temperature")

  /** One per-sensor CSV: minute-granularity epoch key + reading
    * (utils/spark_transforming.py:82-83).
    */
  val sensorCsv: StructType = StructType(Seq(
    StructField("ts_min_bignt", LongType, nullable = false),
    StructField("reading", FloatType, nullable = true)))

  /** Joined/unioned batch output — also the 8-field CSV wire format the
    * streaming jobs parse (convert-to-elasticsearch.py:107-114). Column order
    * IS the wire order (data_generator/dataframe_to_kafka.py:74,91).
    */
  val office: StructType = StructType(Seq(
    StructField("ts_min_bignt", LongType, nullable = false),
    StructField("co2", FloatType, nullable = true),
    StructField("humidity", FloatType, nullable = true),
    StructField("light", FloatType, nullable = true),
    StructField("pir", FloatType, nullable = true),
    StructField("temperature", FloatType, nullable = true),
    StructField("room", StringType, nullable = false),
    StructField("event_ts_min", StringType, nullable = true)))

  /** Typed view of [[office]] for Dataset[OfficeReading] call sites. */
  final case class OfficeReading(
      ts_min_bignt: Long,
      co2: Option[Float],
      humidity: Option[Float],
      light: Option[Float],
      pir: Option[Float],
      temperature: Option[Float],
      room: String,
      event_ts_min: Option[String])

  /** Sink schema after streaming enrichment: all office columns plus
    * `if_movement` ∈ {movement, no_movement} (pir > 0,
    * convert-to-elasticsearch.py:120-134).
    */
  val enriched: StructType =
    StructType(office.fields :+ StructField("if_movement", StringType, nullable = false))

  /** ES index mapping stand-in (convert-to-elasticsearch.py:42-56) as a
    * sink-schema descriptor: field name → declared sink type. Keeps the
    * reference's declared-at-sink typing without an ES dependency.
    */
  val esMapping: Seq[(String, String)] = Seq(
    "ts_min_bignt" -> "keyword",
    "co2" -> "float", "humidity" -> "float", "light" -> "float",
    "pir" -> "float", "temperature" -> "float",
    "room" -> "keyword",
    "event_ts_min" -> "date",
    "if_movement" -> "keyword")
}
