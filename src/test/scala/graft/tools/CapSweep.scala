package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 verdict item 5: the d23 capped-vs-uncapped measurement — the
  * cap's effect on a BOILERPLATE-HEAVY corpus, which the planted testdata
  * alone cannot show (its cross-copy token sets are disjoint by
  * construction, so no organic hot anchor exists; see make_sf1.py).
  *
  * Corpus: the sf documents with plantSpans' planted partial overlaps,
  * PLUS one shared 24-token boilerplate run appended to every doc_id %
  * `boilerMod` == 0 (the disclaimers/license-header shape — the 100 TB
  * hazard d23's cap exists for). Every boilerplate carrier shares ~17
  * winnow anchors with every other carrier, so the uncapped candidate set
  * gains ~carriers²/2 pairs; the cap drops those anchor buckets (and ONLY
  * pair generation — surviving spans are bit-identical, pinned by the
  * ExtSpec drop-only contract).
  *
  * Usage: Test/runMain graft.CapSweep <sfDir> [boilerMod]
  * Prints one line per (cap, wall-min-of-2, pair count).
  */
object CapSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args(0)
    val boilerMod = if (args.length > 1) args(1).toInt else 50
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    val boiler = (1 to 24).map(i => s"bp$i").mkString(" ")
    val docs = graft.ext.Dedup.plantSpans(
      graft.sources.Tables.documents(spark, sfDir))
    val aug = docs.select(col("doc_id"),
      when(col("doc_id") % boilerMod === 0,
        concat(col("text"), lit(" " + boiler)))
        .otherwise(col("text")).as("text"))
    val nCarriers = aug.filter(col("doc_id") % boilerMod === 0).count()
    def run(cap: Option[Long]): (Double, Long) = {
      cap match {
        case Some(c) =>
          spark.conf.set(graft.ext.Dedup.MaxBucketSizeKey, c.toString)
        case None => spark.conf.unset(graft.ext.Dedup.MaxBucketSizeKey)
      }
      val walls = (1 to 2).map { _ =>
        graft.util.Caches.releaseAll() // no cross-run reuse: cold each pass
        val t0 = System.nanoTime()
        graft.ext.Dedup.winnowedSpans(aug)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      graft.util.Caches.releaseAll()
      val pairs = graft.ext.Dedup.winnowedSpans(aug).count()
      spark.conf.unset(graft.ext.Dedup.MaxBucketSizeKey)
      (walls.min, pairs)
    }
    println(s"CAPSWEEP sf=$sfDir boilerMod=$boilerMod carriers=$nCarriers")
    // optional 3rd arg: comma-separated caps ("off,64,256"); capped arms
    // first by default so a DNF uncapped run still leaves the capped rows
    val caps = (if (args.length > 2) args(2).split(",").toSeq
      else Seq("64", "256", "off"))
      .map(c => if (c == "off") None else Some(c.toLong))
    caps.foreach { cap =>
      val (w, p) = run(cap)
      println(f"CAPSWEEP cap=${cap.map(_.toString).getOrElse("off")}%-4s " +
        f"wall=$w%.2f s pairs=$p")
    }
    spark.stop()
  }
}
