package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join handling — the runtime half of the skew story (q60's
  * salted join is the planned half): a join with one dominant key must
  * complete with the hot partition SPLIT by AQE rather than serialized
  * through one task. Thresholds are lowered so toy-scale data trips the
  * same code path a 100 TB hot key would.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val s = spark
    import s.implicits._
    val prev = Seq(
      "spark.sql.adaptive.enabled" -> s.conf.get("spark.sql.adaptive.enabled"),
      "spark.sql.adaptive.skewJoin.enabled" ->
        s.conf.get("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        s.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        s.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        s.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        s.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4096")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4096")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      // 90% of the left rows share key 0; right side is uniform.
      val left = s.range(0, 20000)
        .select(when(col("id") % 10 =!= 0, col("id") % 50 + 1)
          .otherwise(lit(0)).as("k"), col("id").as("payload"))
      val right = s.range(0, 51).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("name"))
      val joined = left.join(right, "k")
      // execute THIS QueryExecution so AQE finalizes its adaptive plan
      // (count() would plan a separate aggregate query)
      assert(joined.collect().length === 20000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skew=true"), plan.take(2000))
    } finally prev.foreach { case (k, v) => s.conf.set(k, v) }
  }
}
