package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object T18Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(d + "/documents.parquet")
    println("SCAN_PARTS=" + docs.rdd.getNumPartitions)
    docs.count()
    def t(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"PHASE $name min=${ts.min}%.2f")
    }
    val docs32 = docs.repartition(32)
    t("gen_1part") { docs.filter(length(col("text")) >= 3)
      .select(col("doc_id"), expr("graft_char_grams(text, 3)"))
      .write.format("noop").mode("overwrite").save() }
    t("gen_32part") { docs32.filter(length(col("text")) >= 3)
      .select(col("doc_id"), expr("graft_char_grams(text, 3)"))
      .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
