package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 measurement harness: the kmeansCells sweep + recall-vs-nprobe
  * points BASELINE.md records for the learned-cell family (x11/x12/x13/x14/
  * d17/d18). Usage:
  *   Test/runMain graft.SweepR10 <sfDir> <k1,k2,...|auto>
  * For each k: d17 wall + pruned count, x13's recall@10 at nprobe 1 and 2,
  * d18's planted-dup recall. One line per k, machine-readable.
  */
object SweepR10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val ks = args(1).split(",").toSeq
    val emb = graft.sources.Tables.embeddings(spark, d)
    val n = emb.count()
    println(s"SWEEP dir=$d n=$n")
    ks.foreach { k =>
      graft.util.Caches.releaseAll()
      spark.conf.set(graft.ext.Dedup.KmeansCellsKey, k)
      val t0 = System.nanoTime()
      val pruned = graft.ext.Dedup.semanticDedup(emb)
        .filter(col("is_pruned") === 1).count()
      val d17s = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rc = graft.ext.Similarity.ivfRecallCurve(emb).collect()
        .sortBy(_.getInt(0)).map(_.getDouble(3))
      val x13s = (System.nanoTime() - t1) / 1e9
      val pr = graft.ext.Dedup.semanticEval(emb).collect().head
      println(f"SWEEP k=$k%-5s d17_sec=$d17s%.2f pruned=$pruned " +
        f"recall_np1=${rc(0)}%.2f recall_np2=${rc(1)}%.2f x13_sec=$x13s%.2f " +
        f"d18_recall=${pr.getDouble(4)}%.3f d18_truth=${pr.getLong(0)}")
      spark.conf.unset(graft.ext.Dedup.KmeansCellsKey)
    }
    graft.util.Caches.releaseAll()
    spark.stop()
  }
}
