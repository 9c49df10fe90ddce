package graft.pipeline

import org.apache.spark.sql.SparkSession

/** CLI mirroring the reference's five pipeline stages (the Airflow DAG's
  * python3 calls, airflow/dags/dag.py:48-81) as subcommands of one binary —
  * orchestration containers (Airflow/Kafka/ES/MinIO) are out of engine scope
  * (SURVEY.md §7.1).
  *
  * {{{
  * runMain graft.pipeline.Main etl      <roomsDir> <outParquet> [--faithful]
  * runMain graft.pipeline.Main replay   <parquet>  <topicDir> [rowsPerFile] [epochs]
  * runMain graft.pipeline.Main stream   <topicDir> <outParquet> <checkpoint>
  * runMain graft.pipeline.Main stream-es <topicDir> <outDir>    <checkpoint>
  * }}}
  */
object Main {
  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    val spark = session()
    spark.sparkContext.setLogLevel("WARN")
    try args.toList match {
      case "etl" :: rooms :: out :: rest =>
        BatchEtl.run(spark, rooms, out, faithful = rest.contains("--faithful"))
        println(s"[etl] wrote ${spark.read.parquet(out).count()} rows to $out")

      case "replay" :: parquet :: topic :: rest =>
        val rows   = rest.headOption.map(_.toInt).getOrElse(1000)
        val epochs = rest.drop(1).headOption.map(_.toInt).getOrElse(1)
        Replay.epochs(spark.read.parquet(parquet), OfficeSchema.office,
          topic, epochs, rows)
        println(s"[replay] $epochs epoch(s) to $topic")

      case "stream" :: topic :: out :: ckpt :: Nil =>
        val q = StreamJobs.toParquet(
          StreamJobs.parseEnrich(StreamJobs.fileWireSource(spark, topic)),
          out, ckpt)
        q.awaitTermination()
        println(s"[stream] sank ${spark.read.parquet(out).count()} rows to $out")

      case "stream-es" :: topic :: out :: ckpt :: Nil =>
        val q = StreamJobs.toEsShaped(
          StreamJobs.parseEnrich(StreamJobs.fileWireSource(spark, topic)),
          out, ckpt, mapping = OfficeSchema.esMapping.toMap)
        q.awaitTermination()
        println(s"[stream-es] documents written under $out")

      case other =>
        System.err.println(s"unknown command: ${other.mkString(" ")}")
        System.err.println("commands: etl | replay | stream | stream-es")
        sys.exit(2)
    } finally spark.stop()
  }
}
