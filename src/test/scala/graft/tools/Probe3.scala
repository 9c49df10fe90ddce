package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness (like Probe/Probe2): times d03 LSH-pair formulations warm,
  * with full materialization (noop sink), to pick the fastest one.
  */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.Dedup

    def docs = graft.sources.Tables.documents(spark, sfDir)

    // current: persist + join (AQE may broadcast) + distinct
    def vA(): DataFrame = Dedup.lshPairs(docs)

    // no persist, shuffle-join (merge hint defeats broadcast → ReusedExchange?)
    def vB(): DataFrame = {
      val sig = Dedup.minhash(docs)
      val bandStructs = Dedup.bands.zipWithIndex.map { case ((x, y), i) =>
        struct(lit(i).as("band"), col(s"mh$x").as("h1"), col(s"mh$y").as("h2"))
      }
      val banded = sig
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
        .select(col("doc_id"), col("b.band"), col("b.h1"), col("b.h2"))
      val a = banded.toDF("doc_a", "band_a", "h1a", "h2a")
      val b = banded.toDF("doc_b", "band_b", "h1b", "h2b").hint("merge")
      a.join(b, col("band_a") === col("band_b") && col("h1a") === col("h1b") &&
          col("h2a") === col("h2b") && col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    }

    // bucket-aggregate: groupBy band key, collect doc ids, emit pairs
    def vC(): DataFrame = {
      val sig = Dedup.minhash(docs)
      val bandStructs = Dedup.bands.zipWithIndex.map { case ((x, y), i) =>
        struct(lit(i).as("band"), col(s"mh$x").as("h1"), col(s"mh$y").as("h2"))
      }
      val banded = sig
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
        .select(col("doc_id"), col("b.band"), col("b.h1"), col("b.h2"))
      banded.groupBy("band", "h1", "h2")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (x, i) ->
               transform(slice(ids, i + 2, size(ids) - i - 1),
                         y -> struct(x AS doc_a, y AS doc_b))))""")).as("p"))
        .select(col("p.doc_a"), col("p.doc_b")).distinct()
    }

    // persist + join, but broadcast disabled via merge hint (reuse cache)
    def vD(): DataFrame = {
      val sig = Dedup.minhash(docs).persist()
      val bandStructs = Dedup.bands.zipWithIndex.map { case ((x, y), i) =>
        struct(lit(i).as("band"), col(s"mh$x").as("h1"), col(s"mh$y").as("h2"))
      }
      val banded = sig
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
        .select(col("doc_id"), col("b.band"), col("b.h1"), col("b.h2"))
      val a = banded.toDF("doc_a", "band_a", "h1a", "h2a")
      val b = banded.toDF("doc_b", "band_b", "h1b", "h2b")
      val r = a.join(b, col("band_a") === col("band_b") &&
          col("h1a") === col("h1b") &&
          col("h2a") === col("h2b") && col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      r
    }

    // persist + shuffle-hash-hint join
    def vE(): DataFrame = {
      val sig = Dedup.minhash(docs).persist()
      val bandStructs = Dedup.bands.zipWithIndex.map { case ((x, y), i) =>
        struct(lit(i).as("band"), col(s"mh$x").as("h1"), col(s"mh$y").as("h2"))
      }
      val banded = sig
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
        .select(col("doc_id"), col("b.band"), col("b.h1"), col("b.h2"))
      val a = banded.toDF("doc_a", "band_a", "h1a", "h2a")
      val b = banded.toDF("doc_b", "band_b", "h1b", "h2b").hint("shuffle_hash")
      a.join(b, col("band_a") === col("band_b") &&
          col("h1a") === col("h1b") &&
          col("h2a") === col("h2b") && col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    }

    def time(name: String, mk: () => DataFrame, n: Int = 3): Unit = {
      val ts = (1 to n).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE3 $name min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // warm-up
    spark.range(1000000).selectExpr("sum(id)").collect()
    vA().write.format("noop").mode("overwrite").save()

    time("A_persist_aqe", vA)
    time("B_noper_merge", vB)
    time("C_bucket_agg", vC)
    time("D_persist_plain", vD)
    time("E_persist_shash", vE)
    spark.stop()
  }
}
