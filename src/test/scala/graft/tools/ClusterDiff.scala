package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Compares two Verify output trees (dirA dirB) query by query: row count +
  * order-insensitive content hash (sum of xxhash64 over the canonical
  * column-sorted row struct). Used for the local-cluster falsification run:
  * dirA = local[16] pass, dirB = local-cluster[2,8,4096] pass — any
  * serialization/broadcast/codegen divergence between single-JVM and
  * real-executor mode shows up as a hash mismatch here.
  */
object ClusterDiff {
  def main(args: Array[String]): Unit = {
    val (dirA, dirB) = (args(0), args(1))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def sig(dir: String, name: String): Option[(Long, String)] =
      try {
        val df = spark.read.parquet(s"$dir/$name")
        val cols = df.columns.sorted.map(col).toSeq
        // decimal sum (wide enough for 2^63 * rowcount — no ANSI overflow)
        // + bit_xor, both order-insensitive multiset digests.
        val h = xxhash64(to_json(struct(cols: _*)))
        val row = df.select(
          count(lit(1)).as("n"),
          coalesce(sum(h.cast("decimal(38,0)")), lit(0)).cast("string").as("s"),
          coalesce(bit_xor(h), lit(0L)).cast("string").as("x"))
          .head()
        Some((row.getLong(0), row.getString(1) + "/" + row.getString(2)))
      } catch { case e: Throwable =>
        println(s"ERR  $name ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
        None
      }

    val names = new java.io.File(dirA).listFiles()
      .filter(f => f.isDirectory)
      .map(_.getName).sorted
    var bad = 0
    names.foreach { n =>
      (sig(dirA, n), sig(dirB, n)) match {
        case (Some((na, ha)), Some((nb, hb))) if na == nb && ha == hb =>
          println(s"OK   $n rows=$na")
        case (a, b) =>
          bad += 1
          println(s"DIFF $n a=$a b=$b")
      }
    }
    println(s"RESULT ${names.length - bad}/${names.length} match, $bad diff")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
