package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21 decomposition probe: split t14/t15 into model-build vs per-row
  * scoring so the slow half is attributable (guide §1 measure first).
  * Usage: `Test/runMain graft.ProbeR21 <sfDir>`.
  */
object ProbeR21 {
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

    // t14 halves
    val segArr = expr("graft_passages(text, 4)")
    val bp = docs
      .select(explode(array_distinct(segArr)).as("seg"))
      .groupBy("seg").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 3)
      .agg(expr("sort_array(collect_list(seg))").as("bps"))
    val bpRow = time("t14_model_collect")(bp.collect())
    println(s"bp size: ${bpRow(0).getSeq[String](0).size}")
    for (i <- 1 to 2) time(s"t14_model_noop_$i") {
      bp.write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 2) time(s"t14_score_$i") {
      docs.crossJoin(broadcast(bp))
        .select(col("doc_id"),
          expr("graft_scrub_passages(text, 4, bps)").as("r"))
        .select(col("doc_id"), col("r.clean_text"), col("r.n_removed"))
        .write.format("noop").mode("overwrite").save()
    }

    // t15 halves
    val tokd = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    val model = tokd.groupBy("tok").agg(count(lit(1)).as("df"))
      .agg(expr("array_sort(collect_list(struct(tok, df)))").as("t"))
      .select(expr("transform(t, x -> x.tok)").as("ts"),
        expr("transform(t, x -> x.df)").as("ds"))
    for (i <- 1 to 2) time(s"t15_model_noop_$i") {
      model.write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 2) time(s"t15_score_$i") {
      docs.crossJoin(broadcast(model))
        .select(col("doc_id"), expr("graft_tok_df(text, ts, ds)").as("f"))
        .filter(col("f.n_toks") > 0)
        .select(col("doc_id"), col("f.n_toks"),
          (col("f.sum_df").cast("double") / col("f.n_toks")).as("mean_df"))
        .write.format("noop").mode("overwrite").save()
    }
    // OLD t14 form (pre-r21), same box — honest A/B
    val bpOld = docs
      .select(explode(array_distinct(segArr)).as("seg"))
      .groupBy("seg").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 3)
      .select("seg").withColumn("is_bp", lit(true))
    for (i <- 1 to 2) time(s"t14_OLD_$i") {
      docs.select(col("doc_id"), posexplode(segArr).as(Seq("idx", "seg")))
        .join(broadcast(bpOld), Seq("seg"), "left_outer")
        .select(col("doc_id"), col("idx"), col("seg"),
          coalesce(col("is_bp"), lit(false)).as("is_bp"))
        .groupBy("doc_id")
        .agg(expr("array_sort(collect_list(struct(idx, seg, is_bp)))").as("a"))
        .select(col("doc_id"),
          concat_ws(" ",
            expr("transform(filter(a, x -> NOT x.is_bp), x -> x.seg)"))
            .as("clean_text"),
          expr("size(filter(a, x -> x.is_bp))").cast("long").as("n_removed"))
        .write.format("noop").mode("overwrite").save()
    }
    // OLD t15 form
    val dfOld = tokd.groupBy("tok").agg(count(lit(1)).as("df"))
    for (i <- 1 to 2) time(s"t15_OLD_$i") {
      tokd.join(broadcast(dfOld), "tok")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"), sum("df").as("sum_df"))
        .select(col("doc_id"), col("n_toks"),
          (col("sum_df").cast("double") / col("n_toks")).as("mean_df"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
