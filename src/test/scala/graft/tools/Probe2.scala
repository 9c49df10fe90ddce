package graft

import org.apache.spark.sql.SparkSession

// Perf probe: time one catalog query at an arbitrary SF dir, dump plan.
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // positional args vs flags: "Probe2 q --explain" must not read a
    // directory literally named "--explain"
    val positional = args.filterNot(_.startsWith("--"))
    val d = if (positional.length > 1) positional(1) else "/root/testdata/sf0.1"
    val tb = System.nanoTime()
    val df = graft.queries.Catalog.byName(args(0)).run(spark, d)
    println(f"build=${(System.nanoTime()-tb)/1e9}%.2f s")
    if (args.contains("--explain")) df.explain("formatted")
    if (args.contains("--show")) df.show(100, truncate = false)
    // Time through the noop sink, same as Bench: every column of every row
    // materializes, so projection-heavy queries aren't under-measured by
    // count()'s column pruning. rows= comes from an observe() metric on the
    // SAME materializing pass — no second job.
    val obs = org.apache.spark.sql.Observation("probe")
    val counted = df.observe(obs, org.apache.spark.sql.functions
      .count(org.apache.spark.sql.functions.lit(1)).as("n"))
    val t0 = System.nanoTime()
    counted.write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    println("rows=" + obs.get("n"))
    println(f"time=$dt%.2f s")
    spark.stop()
  }
}
