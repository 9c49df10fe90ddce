package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Object-store (s3a/MinIO) sink configuration surface — the deployment
  * seam for the reference's MinIO job (convert-to-minio.py:125-131, whose
  * `s3a://` path + endpoint creds are the only MinIO-specific parts).
  *
  * Writing parquet to an object store with the default file-rename commit
  * protocol is both slow (copy-on-rename) and unsafe (non-atomic dir
  * rename); the production answer is the S3A committers (Hadoop's
  * "zero-rename" magic/directory committers) bound through Spark's cloud
  * commit protocol. This object declares exactly those settings; the
  * classes live in `spark-hadoop-cloud` + `hadoop-aws`, which a cloud
  * deployment ships on its classpath (this zero-egress build cannot —
  * [[enable]] therefore guards on their presence instead of failing at
  * first write).
  */
object ObjectStoreSink {

  /** Session-level SQL configs for the cloud commit protocol. */
  val sqlConf: Map[String, String] = Map(
    "spark.sql.sources.commitProtocolClass" ->
      "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    "spark.sql.parquet.output.committer.class" ->
      "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter")

  /** Hadoop-level configs: bind the s3a scheme to the S3A committer
    * factory, choose the "magic" committer (no local staging copy), and
    * the endpoint/path-style knobs a MinIO deployment sets.
    */
  val hadoopConf: Map[String, String] = Map(
    "mapreduce.outputcommitter.factory.scheme.s3a" ->
      "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory",
    "fs.s3a.committer.name" -> "magic",
    "fs.s3a.committer.magic.enabled" -> "true",
    // MinIO wiring (values come from the deployment, listed for the shape):
    // fs.s3a.endpoint, fs.s3a.access.key, fs.s3a.secret.key,
    "fs.s3a.path.style.access" -> "true")

  /** True when the cloud committer classes are on the classpath. */
  def available: Boolean =
    try {
      Class.forName("org.apache.spark.internal.io.cloud.PathOutputCommitProtocol")
      true
    } catch { case _: ClassNotFoundException => false }

  /** Apply the committer configs to a live session; returns whether they
    * were applied. Refusing (rather than applying blindly) keeps local-FS
    * writes working when `spark-hadoop-cloud` is absent — a session-wide
    * commitProtocolClass pointing at a missing class would fail EVERY
    * subsequent write, not just s3a ones.
    */
  def enable(spark: SparkSession): Boolean =
    available && {
      sqlConf.foreach { case (k, v) => spark.conf.set(k, v) }
      hadoopConf.foreach { case (k, v) =>
        spark.sparkContext.hadoopConfiguration.set(k, v)
      }
      true
    }
}
