package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: warm-JVM timing of the streaming suite under different
  * state-partitioning / provider knobs, to size the fixed cost honestly.
  * Usage: Probe4 [sfDir] [names...]
  */
object Probe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("s01_stream_tumbling", "s02_stream_session",
        "s03_stream_dedup", "s04_stream_stateful", "s06_stream_sliding",
        "s07_stream_stream_join", "s05_stream_static_join",
        "s08_foreach_batch", "q20_stream_pipe")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runAll(tag: String): Unit = {
      val times = names.map { n =>
        val t0 = System.nanoTime()
        graft.queries.Catalog.byName(n).run(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val detail = names.zip(times)
        .map { case (n, t) => f"${n.stripPrefix("s").take(12)}=$t%.2f" }
        .mkString(" ")
      println(f"PROBE4 $tag total=${times.sum}%.2f $detail")
    }

    runAll("warmup")
    Seq("8", "4", "2").foreach { p =>
      spark.conf.set("graft.stream.stateParts", p)
      runAll(s"parts=$p")
      runAll(s"parts=$p run2")
    }
    spark.stop()
  }
}
