package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18: reconstruct parallelSeedsWith's round-1 union verbatim, twice,
  * and descend the canonicalized trees to the first node where hashCode
  * diverges. Usage: `Test/runMain graft.ProbeR18d <sfDir>`.
  */
object ProbeR18d {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val sfDir = args(0)

    def e0() = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, ex -> CAST(ex AS DOUBLE))").as("e"))

    val c0 = e0().orderBy("vec_id").limit(1)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
    val prev = graft.util.Caches.retainCheckpointed(c0)

    val P = graft.ext.PortableHash.P
    def u01Sql(r: Int): String =
      s"(CAST(((((vec_id % $P) * 31 + $r) % $P) * 2654435761 % $P) AS DOUBLE)" +
        s" / $P)"

    def round1(): DataFrame = {
      val ell = 16.0
      val centsArr = prev.agg(collect_list(struct(lit(0).as("cluster"),
        col("ce").as("cvec"))).as("cents"))
      val scored = e0().crossJoin(broadcast(centsArr))
        .withColumn("dd", expr("graft_best_cell(e, cents).dd"))
      val phi = scored.agg((sum(expr(
        "CAST(floor(dd * 67108864.0) AS BIGINT)")).cast("double")
        / 67108864.0).as("phi"))
      val fresh = scored.crossJoin(broadcast(phi))
        .filter(col("dd") > 0 &&
          (col("phi") === 0.0 || expr(u01Sql(1)) <
            least(lit(1.0), lit(ell) * col("dd") / col("phi"))))
        .select(col("vec_id").as("cid"), col("e").as("ce"))
      prev.union(fresh)
    }

    val a = round1().queryExecution.analyzed.canonicalized
    val b = round1().queryExecution.analyzed.canonicalized
    println(s"TOP hashEq=${a.hashCode == b.hashCode} eq=${a == b}")

    def walk(x: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             y: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             depth: Int): Unit = {
      val he = x.hashCode == y.hashCode
      println(s"${"  " * depth}${x.nodeName} hashEq=$he eq=${x == y}")
      if (!he) {
        // compare expressions too
        x.expressions.zip(y.expressions).zipWithIndex.foreach {
          case ((ex, ey), i) =>
            if (ex.hashCode != ey.hashCode)
              println(s"${"  " * depth} EXPR[$i] hashNeq: ${ex.sql.take(90)}")
        }
        x.children.zip(y.children).foreach { case (cx, cy) =>
          walk(cx, cy, depth + 1) }
      }
    }
    walk(a, b, 0)
    spark.stop()
  }
}
