package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: the filtered-ANN selectivity crossover measurement
  * (round-13 verdict item 4). For predicates of ~50% / ~10% / ~1%
  * selectivity it times both strategies with BenchOne's min-of-2 noop-sink
  * methodology and reads the inline arm's recall from its own flag column:
  *
  *   - `pre`   = x27's pre-filter exact arm (always correct; cost scales
  *               with survivor count — the whole filtered corpus is
  *               exact-scored);
  *   - `inline`= x28's inline-filtered IVF-PQ serve (cost ~ probed-cell
  *               survivors + shortK re-rank; recall < 1 exactly when true
  *               filtered neighbors live outside the probed cells).
  *
  * Usage: `Test/runMain graft.FilteredSweep <sfDir>`. Output: one JSON
  * line per (arm, strategy) — BASELINE.md records the curve and the
  * crossover rule derived from it.
  */
object FilteredSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args(0)
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count().toDouble
    // labels are uniform over 0..9; vec_id stride sharpens to ~1%
    val arms = Seq(
      ("sel50", col("label") < 5),
      ("sel10", col("label") === 3),
      ("sel1", col("label") === 3 && pmod(col("vec_id"), lit(10)) === 0))
    def time(df: => org.apache.spark.sql.DataFrame): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    arms.foreach { case (name, pred) =>
      val sel = emb.filter(pred).count() / n
      val tPre = time(graft.ext.Similarity.filteredExactPred(emb, pred))
      // nprobe is the inline arm's recall-repair knob: broad predicates
      // spread filtered survivors across many cells, so a fixed nprobe's
      // recall collapses as selectivity rises — the curve needs both axes.
      val probes = Seq(2, 4, 8).map { np =>
        val inline =
          graft.ext.Similarity.ivfPqFilteredRerankPred(emb, pred, nprobe = np)
        val t = time(inline)
        val flags = inline.collect()
        val recall =
          if (flags.isEmpty) 0.0
          else flags.count(_.getBoolean(4)).toDouble / flags.length
        f""""inline_np$np":{"sec":$t%.3f,"recall":$recall%.3f}"""
      }.mkString(",")
      // the other repair axis: once every cell is probed, residual loss is
      // the ADC shortlist's resolution floor (x24) — widen shortK to read
      // how much of the broad-predicate recall it buys back, and at what
      // re-rank cost.
      val wide = graft.ext.Similarity
        .ivfPqFilteredRerankPred(emb, pred, nprobe = 8, shortK = 400)
      val tWide = time(wide)
      val wf = wide.collect()
      val rWide =
        if (wf.isEmpty) 0.0
        else wf.count(_.getBoolean(4)).toDouble / wf.length
      println(f"""{"arm":"$name","selectivity":$sel%.4f,""" +
        f""""pre_sec":$tPre%.3f,$probes,""" +
        f""""inline_np8_sk400":{"sec":$tWide%.3f,"recall":$rWide%.3f},""" +
        f""""sf":"$sfDir"}""")
    }
    graft.util.Caches.releaseAll()
    spark.stop()
  }
}
