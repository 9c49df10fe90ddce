package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 decomposition probe for the auto-k training blow-up (verdict
  * item 1): times each stage of the k-means|| seeding + Lloyd chain at a
  * forced k, so the 322 s sf10-auto x15 wall can be attributed to a stage
  * instead of guessed at. Usage:
  * `Test/runMain graft.ProbeR18 <sfDir> <k>`.
  */
object ProbeR18 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    t("corpus count")(emb.count())

    val e0raw = emb.select(col("vec_id"),
      expr("transform(embedding, ex -> CAST(ex AS DOUBLE))").as("e"))
    val par = spark.sparkContext.defaultParallelism
    val e0 = graft.util.Caches.retain(e0raw.repartition(par))
    t("e0 materialize")(e0.count())

    // --- seeding chain, stage by stage (mirrors parallelSeedsWith) ---
    val ell = (graft.ext.Similarity.ParSeed.OversampleX * k).toDouble
    val c0 = e0.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
    var prev = t("c0 checkpoint")(graft.util.Caches.retainCheckpointed(c0))
    for (r <- 1 to graft.ext.Similarity.ParSeed.Rounds) {
      val centsArr = prev.agg(collect_list(struct(lit(0).as("cluster"),
        col("ce").as("cvec"))).as("cents"))
      val scored = e0.crossJoin(broadcast(centsArr))
        .withColumn("dd", expr("graft_best_cell(e, cents).dd"))
      val phi = scored.agg((sum(expr(
        "CAST(floor(dd * 67108864.0) AS BIGINT)")).cast("double")
        / 67108864.0).as("phi"))
      val fresh = scored.crossJoin(broadcast(phi))
        .filter(col("dd") > 0 &&
          (col("phi") === 0.0 || rand() < lit(0.5)))  // admission shape only
        .select(col("vec_id").as("cid"), col("e").as("ce"))
      val n = t(s"round $r cands checkpoint")(
        graft.util.Caches.retainCheckpointed(prev.union(fresh)))
      println(s"PROBE round $r cand_count ${n.count()}")
      prev = n
    }
    val rw = org.apache.spark.sql.expressions.Window.orderBy("cid")
    val ranked = prev
      .withColumn("rn", (row_number().over(rw) - 1).cast("int"))
    val rArr = ranked.agg(expr("array_sort(collect_list(" +
      "named_struct('cluster', rn, 'cvec', ce)))").as("cents"))
    val weights = t("weights pass")(
      graft.util.Caches.retainCheckpointed(
        e0.crossJoin(broadcast(rArr))
          .select(expr("graft_best_cell(e, cents).c").as("rn"))
          .groupBy("rn").agg(count(lit(1)).as("w"))))
    println(s"PROBE weights rows ${weights.count()}")

    // --- the full production entry, end to end, twice ---
    spark.conf.set(graft.ext.Dedup.KmeansCellsKey, k.toString)
    for (i <- 1 to 2) {
      t(s"kmeansSummaryPP full run $i") {
        graft.ext.Similarity.kmeansSummaryPP(emb)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // and the pure Lloyd at the same k for comparison (modulo seeds)
    for (i <- 1 to 2) {
      t(s"kmeansSummary modulo run $i") {
        graft.ext.Similarity.kmeansSummary(emb)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
    graft.util.Scratch.cleanup()
  }
}
