package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables

/** Structured Streaming pipeline, batch-checkable (Q20 / SURVEY.md §2.10).
  *
  * Reproduces the reference's streaming stage shape — source → CSV-wire
  * parse (`split`+`cast`, convert-to-elasticsearch.py:107-114) → CASE
  * enrichment (:120-134) → checkpointed append file sink
  * (convert-to-minio.py:125-131) — with the Kafka endpoints swapped for a
  * file source + parquet sink (zero-egress test env; SURVEY.md §7.4 risk 3).
  * `Trigger.AvailableNow` drains the source and stops, so the result is a
  * deterministic DataFrame the DuckDB oracle can check.
  *
  * Scale: the file source lists and splits per micro-batch; parse/enrich is
  * stateless whole-stage-codegen'd projection; the sink commits via the
  * checkpoint WAL (exactly-once for file sinks).
  */
object StreamingQ {

  /** Run a file-source → wire-encode → wire-decode → enrich → parquet-sink
    * stream to completion and return the sunk rows.
    */
  def streamPipe(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    val rawSchema = s.read.parquet(path).schema
    val out  = Files.createTempDirectory("graft_q20_out").toString
    val ckpt = Files.createTempDirectory("graft_q20_ckpt").toString
    // The streaming file source requires a directory; expose the single
    // parquet file through a temp dir symlink (simulates the landing dir a
    // real deployment tails).
    val srcDir = Files.createTempDirectory("graft_q20_src")
    Files.createSymbolicLink(srcDir.resolve("events.parquet"),
      java.nio.file.Paths.get(path))

    val src = Tables.normalizeEvents(
      s.readStream.schema(rawSchema).parquet(srcDir.toString))

    // Encode to the 4-field CSV wire format, then parse it back — the same
    // split+cast the reference's streaming jobs apply to Kafka values.
    val wire = src.select(
      concat_ws(",",
        col("event_id"), col("event_type"), col("value").cast("string"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("value"))
    val parts = split(col("value"), ",")
    val parsed = wire
      .withColumn("event_id", parts.getItem(0).cast("long"))
      .withColumn("event_type", parts.getItem(1))
      .withColumn("value_d", parts.getItem(2).cast("double"))
      .withColumn("ts_str", parts.getItem(3))
      .drop("value")
      .withColumn("if_move",
        when(col("value_d") > 10, "movement").otherwise("no_movement"))

    val q = parsed.writeStream
      .format("parquet")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .option("path", out)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    s.read.parquet(out)
  }

  val queries: Seq[Q] = Seq(
    Q("q20_stream_pipe",
      (s, d) => streamPipe(s, d),
      Some("""SELECT event_id, event_type, value AS value_d,
                     strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
                     CASE WHEN value > 10 THEN 'movement'
                          ELSE 'no_movement' END AS if_move
              FROM events"""))
  )
}
