package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary repro harness — not part of the engine.
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    val df = graft.queries.Catalog.byName(args(0)).run(spark, d)
    df.show(5, false)
    println("rows=" + df.count())
    spark.stop()
  }
}
