package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** `events.ts` arrives in whatever physical form the data generator last
    * chose — observed so far: parquet TIMESTAMP(NANOS) (readable only as
    * LongType nanos under `spark.sql.legacy.parquet.nanosAsLong=true`) and
    * parquet timestamp[us] with isAdjustedToUTC=false (read as
    * TIMESTAMP_NTZ). Normalize every form to a microsecond TimestampType
    * column so downstream `unix_micros`/watermark consumers see one type.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEvents(load(s, d, "events"))

  /** Shared by the batch loader and the streaming file source (which must
    * read with the raw on-disk schema first). NTZ→LTZ is value-preserving
    * here because every entrypoint pins the session to UTC.
    */
  def normalizeEvents(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
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
    val spark = df.sparkSession
    val slots = spark.sparkContext.defaultParallelism
    // Estimate the scan's split count from the file index (no job, no RDD
    // materialization — safe even if a caller ever passes a post-shuffle
    // plan under AQE). Both reader generations are matched so a v1→v2
    // migration of any loader keeps the estimate alive: v1
    // LogicalRelation/HadoopFsRelation and DSv2 FileScan (parquet/csv/orc
    // under spark.sql.sources.useV1SourceList changes). Plans with no file
    // relation at all (pure in-memory frames, non-file DSv2 sources)
    // estimate 0 and are left untouched — for those there is no "small
    // scan" to widen and an unconditional repartition would add a shuffle.
    val estSplits = estimatedSplits(df)
    if (estSplits > 0 && estSplits < slots) df.repartition(slots) else df
  }

  /** The scan's split-count estimate from the file index — no job, no RDD
    * materialization, no physical planning (the round-15 advice:
    * `df.rdd.getNumPartitions` compiles the physical plan once per call,
    * which the seeded-kmeans parallelization floor paid at every plan
    * build). 0 when the plan has no file relation (pure in-memory frames,
    * non-file DSv2 sources) — callers treat that as "unknown, leave the
    * layout alone".
    */
  def estimatedSplits(df: DataFrame): Long = {
    val spark = df.sparkSession
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    def splitsOf(bytes: Long): Long =
      math.max(1L, (bytes + maxSplit - 1) / maxSplit)
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => splitsOf(fs.location.sizeInBytes)
        case _ => 0L
      }
      case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        v2.scan match {
          case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            splitsOf(f.fileIndex.sizeInBytes)
          case _ => 0L
        }
    }.sum
  }
}
