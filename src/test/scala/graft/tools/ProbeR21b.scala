package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21: decompose t14's lexicon build — where do the ~11 s go?
  * Usage: `Test/runMain graft.ProbeR21b <sfDir>`.
  */
object ProbeR21b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val d = args(0)
    val docs = spark.read.parquet(d + "/documents.parquet")
    docs.groupBy().count().collect() // warm

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val seg = expr("graft_passages_distinct(text, 4)")
    for (i <- 1 to 2) time(s"explode_only_$i") {
      docs.select(explode(seg).as("seg"))
        .write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 2) time(s"explode_hash_only_$i") {
      docs.select(explode(seg).as("seg"))
        .select(xxhash64(col("seg")).as("h"))
        .write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 2) time(s"hash_count_$i") {
      docs.select(explode(seg).as("seg"))
        .select(xxhash64(col("seg")).as("h"))
        .groupBy("h").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 3)
        .write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 2) time(s"string_count_$i") {
      docs.select(explode(seg).as("seg"))
        .groupBy("seg").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
