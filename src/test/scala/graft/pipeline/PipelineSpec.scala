package graft.pipeline

import java.io.{File, PrintWriter}
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end slice of the reference pipeline (SURVEY.md §7.2): rooms
  * fixture → batch ETL (both physical plans) → wire replay → streaming
  * parse/enrich → sinks. The fixture engineers the three defects the
  * reference's data can contain: sensor-file misalignment (inner-join row
  * loss), null readings (dropna), duplicate timestamps (join multiplicity).
  */
class PipelineSpec extends SparkSpec {

  private lazy val roomsDir: String = {
    val dir = Files.createTempDirectory("graft_rooms").toString
    val base = 1700000000L
    val sensors = OfficeSchema.sensors
    for (room <- Seq("r1", "r2", "r3"); sensor <- sensors) {
      val f = new File(s"$dir/$room")
      f.mkdirs()
      val w = new PrintWriter(new File(f, s"$sensor.csv"))
      w.println("ts_min_bignt,reading")
      for (i <- 0 until 5) {
        val ts = base + i * 60
        val skip = room == "r2" && sensor == "pir" && i == 2 // misalignment
        val nul  = room == "r3" && sensor == "humidity" && i == 1 // null reading
        if (!skip) w.println(s"$ts," + (if (nul) "" else s"${10.0 + i}"))
      }
      if (room == "r1" && sensor == "co2") w.println(s"$base,99.9") // dup ts
      w.close()
    }
    dir
  }

  test("pivotPlan: misaligned row lost, null row dropped, dup collapsed") {
    val out = RoomReader.pivotPlan(spark, roomsDir)
    assert(out.columns.toSeq === OfficeSchema.office.fieldNames.toSeq)
    assert(out.count() === 13) // 15 cells - 1 misaligned - 1 null
    assert(out.filter(col("room") === "r2" &&
      col("ts_min_bignt") === 1700000120L).count() === 0)
    assert(out.filter(col("room") === "r3" &&
      col("ts_min_bignt") === 1700000060L).count() === 0)
  }

  test("joinPlan keeps reference join multiplicity on duplicate timestamps") {
    val j = RoomReader.joinPlan(spark, roomsDir)
    assert(j.count() === 14) // pivot's 13 + 1 from the duplicated r1 ts
    assert(j.filter(col("room") === "r1" &&
      col("ts_min_bignt") === 1700000000L).count() === 2)
  }

  test("plans agree wherever no duplicate timestamps exist") {
    val p = RoomReader.pivotPlan(spark, roomsDir).filter(col("room") =!= "r1")
    val j = RoomReader.joinPlan(spark, roomsDir).filter(col("room") =!= "r1")
    assert(p.exceptAll(j).count() === 0)
    assert(j.exceptAll(p).count() === 0)
  }

  test("event_ts_min derivation is UTC-pinned") {
    val row = RoomReader.pivotPlan(spark, roomsDir)
      .filter(col("ts_min_bignt") === 1700000000L).head()
    assert(row.getAs[String]("event_ts_min") === "2023-11-14 22:13:20")
  }

  test("wire codec roundtrips the office schema") {
    val df = RoomReader.pivotPlan(spark, roomsDir)
    val back = CsvWire.decode(CsvWire.encode(df, OfficeSchema.office),
      OfficeSchema.office)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.exceptAll(df).count() === 0)
    assert(df.exceptAll(back).count() === 0)
  }

  test("replay -> file stream -> parse/enrich -> parquet sink, end to end") {
    val etl = RoomReader.pivotPlan(spark, roomsDir)
    val topic = Files.createTempDirectory("graft_topic").toString
    Replay.toTopic(etl, OfficeSchema.office, topic, rowsPerFile = 4)

    val out  = Files.createTempDirectory("graft_sink").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val q = StreamJobs.toParquet(
      StreamJobs.parseEnrich(StreamJobs.fileWireSource(spark, topic)),
      out, ckpt)
    q.awaitTermination()

    val sunk = spark.read.parquet(out)
    assert(sunk.count() === 13)
    assert(sunk.columns.contains("if_movement"))
    // pir > 0 everywhere in the fixture → all movement
    assert(sunk.filter(col("if_movement") === "movement").count() === 13)
  }

  test("checkpointed restart is exactly-once across epochs") {
    val etl = RoomReader.pivotPlan(spark, roomsDir)
    val topic = Files.createTempDirectory("graft_topic2").toString
    val out   = Files.createTempDirectory("graft_sink2").toString
    val ckpt  = Files.createTempDirectory("graft_ckpt2").toString

    Replay.toTopic(etl, OfficeSchema.office, topic, rowsPerFile = 100, epoch = 0)
    val q1 = StreamJobs.toParquet(
      StreamJobs.parseEnrich(StreamJobs.fileWireSource(spark, topic)), out, ckpt)
    q1.awaitTermination()

    // new data lands; restart from the same checkpoint processes ONLY it
    Replay.toTopic(etl, OfficeSchema.office, topic, rowsPerFile = 100, epoch = 1)
    val q2 = StreamJobs.toParquet(
      StreamJobs.parseEnrich(StreamJobs.fileWireSource(spark, topic)), out, ckpt)
    q2.awaitTermination()

    assert(spark.read.parquet(out).count() === 26) // 13 per epoch, no replays
  }

  test("ES-shaped sink writes one JSON document per row") {
    val etl = RoomReader.pivotPlan(spark, roomsDir)
    val topic = Files.createTempDirectory("graft_topic3").toString
    val out   = Files.createTempDirectory("graft_es").toString
    val ckpt  = Files.createTempDirectory("graft_ckpt3").toString
    Replay.toTopic(etl, OfficeSchema.office, topic)
    val q = StreamJobs.toEsShaped(
      StreamJobs.parseEnrich(StreamJobs.fileWireSource(spark, topic)), out, ckpt)
    q.awaitTermination()

    val docs = spark.read.json(s"$out/*.jsonl")
    assert(docs.count() === 13)
    assert(OfficeSchema.esMapping.map(_._1).forall(docs.columns.contains))
  }
}
