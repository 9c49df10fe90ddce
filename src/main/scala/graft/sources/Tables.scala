package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the benchmark tables (TESTDATA.md).
  *
  * The reference reads its inputs with per-file schema-inferred CSV scans
  * (reference: utils/spark_transforming.py:82) — one Spark job per file.
  * Here every table is a single parquet scan: columnar, splittable, with
  * predicate pushdown and column pruning handled by the vectorized reader.
  * At 100 TB these scans parallelize by row-group; nothing here funnels
  * through the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark only
    * reads with `spark.sql.legacy.parquet.nanosAsLong=true` (as LongType
    * nanos). Normalize to a microsecond TimestampType column so every
    * downstream operator sees a plain timestamp.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEvents(load(s, d, "events"))

  /** Shared by the batch loader and the streaming file source (which must
    * read with the raw on-disk schema first).
    */
  def normalizeEvents(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case _        => df
  }

  /** Scale-adaptive spread for CPU-heavy PRE-exchange pipelines (per-row
    * kernels, generators): when the scan has fewer splits than the cluster
    * has slots — the small-file regime, where all that per-row work funnels
    * through one task — redistribute round-robin to full parallelism. At
    * real scale a 100 TB table scans as ~10⁵ row-group splits, the guard is
    * false, and this is a NO-OP: no shuffle is ever added to a large input
    * (hardcoding `repartition(n)` here would full-shuffle the corpus —
    * the exact anti-pattern this guard exists to avoid). Measured on t18 at
    * sf0.1: 6× on the generate stage (1 task → 32).
    */
  def spread(df: DataFrame): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < slots) df.repartition(slots) else df
  }
}
