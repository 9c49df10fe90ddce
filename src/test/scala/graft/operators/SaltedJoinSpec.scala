package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("salted inner join equals the plain join on a skewed key") {
    // 10k rows of one hot key + a tail of cold keys
    val skewed = (1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"cold_$i", i.toLong))
    val left = skewed.toDF("k", "row_id")
    val right = (Seq("hot") ++ (1 to 100).map(i => s"cold_$i"))
      .zipWithIndex.map { case (k, i) => (k, s"payload_$i") }
      .toDF("k", "payload")

    val plain  = left.join(right, Seq("k"), "inner")
    val salted = SaltedJoin.inner(left, right, "k", "row_id", 8)

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salt actually spreads the hot key across buckets") {
    val left = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "row_id")
    val buckets = left
      .withColumn("_salt", pmod(hash(col("row_id")), lit(8)))
      .select("_salt").distinct().count()
    assert(buckets === 8)
  }

  test("salting is deterministic across evaluations (no rand())") {
    val left = (1 to 50).map(i => ("hot", i.toLong)).toDF("k", "row_id")
    val salt = pmod(hash(col("row_id")), lit(8))
    val a = left.withColumn("s", salt).collect().map(r => (r.getLong(1), r.getInt(2)))
    val b = left.withColumn("s", salt).collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(a.toSeq === b.toSeq)
  }
}
