package graft.pipeline

import java.io.{File, FileWriter}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Stage 3: replay a batch dataset as a stream (reference:
  * data_generator/dataframe_to_kafka.py — collect() + per-row
  * `producer.send` + sleep).
  *
  * The file-based "topic": each call appends one text file of wire lines to
  * `topicDir`; a Structured Streaming `text` source tailing that directory
  * sees each file as one ordered batch of messages (the 1-partition-topic
  * ordering guarantee, kafka/kafka_admin.py:27). Rate control is
  * files-per-tick (the consumer's `maxFilesPerTrigger`) rather than the
  * reference's per-row sleep — its 0.5–2 msg/s was generator-throttled, not
  * engine-bound (BASELINE.md).
  *
  * The `collect()` here is tooling, not engine data path: a replay generator
  * is by definition a driver-side emitter (it simulates external producers). The
  * engine's own operators never collect (SURVEY.md §7.4 risk 5).
  */
object Replay {

  /** Encode `df` per `schema` field order and append it to the topic as
    * `epoch`-suffixed files of `rowsPerFile` lines each. Returns files written.
    */
  def toTopic(df: DataFrame, schema: StructType, topicDir: String,
      rowsPerFile: Int = 1000, epoch: Int = 0, sep: String = ","): Int = {
    new File(topicDir).mkdirs()
    val lines = CsvWire.encode(df, schema, sep)
      .collect().map(_.getString(0))
    lines.grouped(rowsPerFile).zipWithIndex.foreach { case (chunk, i) =>
      val f = new File(topicDir, f"replay-$epoch%03d-$i%05d.txt")
      val w = new FileWriter(f)
      try chunk.foreach { l => w.write(l); w.write('\n') }
      finally w.close()
    }
    (lines.length + rowsPerFile - 1) / rowsPerFile
  }

  /** Replay N epochs (the reference's repeat loop,
    * data_generator/dataframe_to_kafka.py:104).
    */
  def epochs(df: DataFrame, schema: StructType, topicDir: String,
      n: Int, rowsPerFile: Int = 1000): Unit =
    (0 until n).foreach(e => toTopic(df, schema, topicDir, rowsPerFile, e))
}
