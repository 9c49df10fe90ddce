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
    val emb = graft.sources.Tables.embeddings(spark, d)
    val n = emb.count()
    println(s"SWEEP dir=$d n=$n")
    // Mode 2: the x16 crossover measurement — `x16 k1xk2[,k1xk2...]`
    // times the two-level quantizer's full train+serve against the flat
    // quantizer at the same effective cell count (x12 with k = k1·k2).
    if (args(1) == "x16") {
      args(2).split(",").foreach { spec =>
        val Array(k1, k2) = spec.split("x").map(_.toInt)
        graft.util.Caches.releaseAll()
        spark.conf.set(graft.ext.Dedup.KmeansCellsKey, k1.toString)
        val t0 = System.nanoTime()
        val n2 = graft.ext.Similarity
          .knnIvfTwoLevel(emb, k2 = k2).count()
        val two = (System.nanoTime() - t0) / 1e9
        graft.util.Caches.releaseAll()
        spark.conf.set(graft.ext.Dedup.KmeansCellsKey, (k1 * k2).toString)
        val t1 = System.nanoTime()
        val nf = graft.ext.Similarity.knnIvfLearned(emb).count()
        val flat = (System.nanoTime() - t1) / 1e9
        println(f"SWEEP x16 k1=$k1 k2=$k2 two_level_sec=$two%.2f " +
          f"(rows=$n2) flat_k=${k1 * k2} flat_sec=$flat%.2f (rows=$nf)")
        graft.util.Caches.releaseAll()
        spark.conf.set(graft.ext.Dedup.KmeansCellsKey, k1.toString)
        val t2 = System.nanoTime()
        val pr = graft.ext.Dedup.semanticDedupTwoLevel(emb, k2 = k2)
          .filter(col("is_pruned") === 1).count()
        val d19 = (System.nanoTime() - t2) / 1e9
        println(f"SWEEP d19 k1=$k1 k2=$k2 sec=$d19%.2f pruned=$pr")
        spark.conf.unset(graft.ext.Dedup.KmeansCellsKey)
      }
      graft.util.Caches.releaseAll()
      spark.stop()
      return
    }
    val ks = args(1).split(",").toSeq
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
