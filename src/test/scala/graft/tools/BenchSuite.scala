package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: Bench's min-of-2 noop-sink methodology over a name-filtered
  * slice of the catalog (e.g. the d-/x-suites at the sf1 scale checkpoint).
  * Usage: `Test/runMain graft.BenchSuite <prefix[,prefix...]> <sfDir>`.
  */
object BenchSuite {
  def main(args: Array[String]): Unit = {
    val prefixes = args(0).split(",").toSeq
    val sfDir = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Same session-conf injection as BenchOne ("k=v;k=v"), so suite
    // slices can run at the production knobs (e.g. kmeansCells=auto for
    // the round-18 sf10-auto x-family check).
    sys.env.get("GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    spark.read.parquet(sfDir + "/documents.parquet").count()
    val picked = SparkEntry.queries.filter { case (n, _) =>
      prefixes.exists(n.startsWith)
    }
    val results = picked.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable => println(s"FAIL $name: $e"); -1.0 }
      }
      val m = if (times.exists(_ < 0)) -1.0 else times.min
      println(f"BENCHSUITE $name min=$m%.3f")
      name -> m
    }
    val failed = results.collect { case (n, v) if v < 0 => n }
    println(f"BENCHSUITE_TOTAL ${results.map(_._2).filter(_ >= 0).sum}%.2f " +
      s"over ${results.size - failed.size}/${results.size} queries" +
      (if (failed.nonEmpty) s" FAILED=${failed.mkString(",")}" else ""))
    spark.stop()
    graft.util.Scratch.cleanup()
    Runtime.getRuntime.halt(0)
  }
}
