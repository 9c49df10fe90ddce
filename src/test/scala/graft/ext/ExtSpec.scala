package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-level checks on the dedup/similarity operators (the oracle gate
  * proves value equality; these pin the semantic contracts).
  */
class ExtSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over a sleepy dog"), // near dup
    (4L, "entirely different content about database engines"),
    (5L, "one"),                                         // too short to sign
    (6L, "")).toDF("doc_id", "text")

  test("exact duplicates always surface as LSH candidate pairs") {
    val pairs = Dedup.lshPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("jaccard is 1.0 for exact duplicates and within [0,1] everywhere") {
    val jp = Dedup.jaccardPairs(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(jp((1L, 2L)) === 1.0)
    assert(jp.values.forall(j => j >= 0.0 && j <= 1.0))
  }

  test("signatures exist only for docs with >= 2 tokens") {
    val ids = Dedup.minhash(docs).select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 3L, 4L))
  }

  test("identical docs have identical simhash; near dups are close") {
    val sh = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(3L)) < hamming(sh(1L), sh(4L)))
  }

  test("LSH knn results lie in the query's bucket and are cosine-ranked") {
    val emb = graft.sources.Tables.embeddings(s, "/root/testdata/sf0.001")
    val out = Similarity.knnLsh(emb).collect()
    val buckets = out.map(_.getInt(2)).toSet
    assert(buckets.size === 1) // all results share the query's bucket
    val sims = out.map(_.getDouble(3))
    assert(sims.toSeq === sims.sortBy(-_).toSeq)
  }

  test("brute-force knn top-1 is the true global maximum") {
    val emb = graft.sources.Tables.embeddings(s, "/root/testdata/sf0.001")
    graft.functions.GraftFunctions.register(s)
    val top = Similarity.knnBrute(emb, 1).head.getDouble(2)
    val q = emb.orderBy("vec_id").limit(1)
      .select(col("embedding").as("qe"), col("vec_id").as("q_id"))
    val maxAll = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(expr("max(graft_cos(embedding, qe))")).head.getDouble(0)
    assert(top === maxAll)
  }
}
