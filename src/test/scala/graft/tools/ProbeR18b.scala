package graft

import org.apache.spark.sql.SparkSession

/** Round-18: run one catalog query twice at a forced k and print per-run
  * times — with GRAFT_CACHE_DEBUG=1 the Caches memo hit/miss trace shows
  * whether the training chain re-runs. Usage:
  * `Test/runMain graft.ProbeR18b <query> <sfDir> <k>`.
  */
object ProbeR18b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 2)
      spark.conf.set(graft.ext.Dedup.KmeansCellsKey, args(2))
    val fn = SparkEntry.queries(args(0))
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      System.err.println(s"[probe] ---- run $i construct ----")
      val df = fn(spark, args(1))
      val t1 = System.nanoTime()
      System.err.println(s"[probe] ---- run $i execute ----")
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"PROBE ${args(0)} run$i construct=${(t1 - t0) / 1e9}%.2f " +
        f"execute=${(t2 - t1) / 1e9}%.2f")
    }
    spark.stop()
    graft.util.Scratch.cleanup()
  }
}
