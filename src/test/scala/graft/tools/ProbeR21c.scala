package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** r21: decompose s13 — topic encode+write vs stream drain, repartition
  * vs coalesce, maxFilesPerTrigger 1 vs 4.
  * Usage: `Test/runMain graft.ProbeR21c <sfDir>`.
  */
object ProbeR21c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val sel = graft.sources.Tables.events(spark, d).select(col("event_id"),
      col("user_id"), col("event_type"), col("value"),
      unix_micros(col("ts")).as("tsu"))
    spark.read.parquet(d + "/events.parquet").groupBy().count().collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (i <- 1 to 2) time(s"encode_repartition_$i") {
      val topic = graft.util.Scratch.dir(s"probe_s13_rep_$i")
      graft.pipeline.CsvWire.encode(sel, sel.schema)
        .repartition(4).write.mode("overwrite").text(topic)
    }
    for (i <- 1 to 2) time(s"encode_coalesce_$i") {
      val topic = graft.util.Scratch.dir(s"probe_s13_coa_$i")
      graft.pipeline.CsvWire.encode(sel, sel.schema)
        .coalesce(4).write.mode("overwrite").text(topic)
    }
    val topic = graft.util.Scratch.dir("probe_s13_topic")
    graft.pipeline.CsvWire.encode(sel, sel.schema)
      .repartition(4).write.mode("overwrite").text(topic)
    for (mfpt <- Seq(1, 4); i <- 1 to 2) time(s"drain_mfpt${mfpt}_$i") {
      val out = graft.util.Scratch.dir(s"probe_s13_out_$mfpt$i")
      val ckpt = graft.util.Scratch.dir(s"probe_s13_ckpt_$mfpt$i")
      val q = spark.readStream.format("graft-wire").schema(sel.schema)
        .option("maxFilesPerTrigger", mfpt).load(topic)
        .filter(col("value") > 10.0)
        .select("event_id", "event_type", "value")
        .writeStream.format("parquet").outputMode("append")
        .option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    spark.stop()
  }
}
