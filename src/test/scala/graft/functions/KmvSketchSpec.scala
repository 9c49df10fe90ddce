package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Merge-order / partitioning invariance of the KMV sketch — the contract
  * that makes a sketch "mergeable" at 100 TB: any split of the input into
  * partial buffers, merged in any order, must yield bit-identical results.
  */
class KmvSketchSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("buffer: kept set is insertion-order independent (property)") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0L, 1000000006L)), Gen.long) {
      (hs: List[Long], seed: Long) =>
        val a = new KmvBuffer(8)
        val b = new KmvBuffer(8)
        hs.foreach(a.add)
        new scala.util.Random(seed).shuffle(hs).foreach(b.add)
        a.set == b.set && a.estimate == b.estimate &&
          a.sketchBytes.toSeq == b.sketchBytes.toSeq
    })
  }

  test("buffer: merge of arbitrary splits equals single-pass (property)") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0L, 1000000006L)),
      Gen.chooseNum(1, 5)) { (hs: List[Long], nSplits: Int) =>
      val whole = new KmvBuffer(8)
      hs.foreach(whole.add)
      // split round-robin, build partials, merge right-to-left
      val parts = (0 until nSplits).map { i =>
        val p = new KmvBuffer(8)
        hs.zipWithIndex.collect { case (h, j) if j % nSplits == i => h }
          .foreach(p.add)
        p
      }
      val merged = new KmvBuffer(8)
      parts.reverse.foreach(merged.merge)
      merged.set == whole.set &&
        merged.sketchBytes.toSeq == whole.sketchBytes.toSeq
    })
  }

  test("unionEstimate from two sketchBytes == estimate of the merged buffer (property)") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0L, 1000000006L)),
      Gen.listOf(Gen.chooseNum(0L, 1000000006L))) {
      (ha: List[Long], hb: List[Long]) =>
        val a = new KmvBuffer(8)
        val b = new KmvBuffer(8)
        ha.foreach(a.add)
        hb.foreach(b.add)
        val merged = new KmvBuffer(8)
        merged.merge(a); merged.merge(b)
        KmvBuffer.unionEstimate(a.sketchBytes, b.sketchBytes, 8) ==
          merged.estimate
    })
  }

  test("buffer: serialize/deserialize round-trips") {
    val agg = KmvSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 8)
    val buf = new KmvBuffer(8)
    Seq(5L, 3L, 999999999L, 0L, 5L).foreach(buf.add)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.set === buf.set)
    assert(back.estimate === buf.estimate)
  }

  test("aggregate: result is partitioning-invariant end-to-end") {
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val df = (1 to 5000).map(i => ((i * 7919) % 300, s"user_${i % 997}"))
      .toDF("grp", "uid")
    def run(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.groupBy("grp").agg(expr("graft_kmv(uid)").as("kmv"))
        .select(col("grp"), col("kmv.n_kept"), col("kmv.kth_min"),
          col("kmv.est_distinct"), hex(col("kmv.sketch")))
        .collect().map(_.toString).sorted.toSeq
    val one = run(df.coalesce(1))
    val many = run(df.repartition(13, col("uid")))
    val byOther = run(df.repartition(7, col("grp")))
    assert(one === many)
    assert(one === byOther)
  }

  test("aggregate: estimate is exact below k and ~accurate above") {
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    // 40 distinct < k=64 → exact; 997 distinct > k → within 25%
    val small = (1 to 500).map(i => s"u${i % 40}").toDF("uid")
      .agg(expr("graft_kmv(uid)").as("k")).select(col("k.est_distinct"))
      .as[Double].head()
    assert(small === 40.0)
    val big = (1 to 5000).map(i => s"user_${i % 997}").toDF("uid")
      .agg(expr("graft_kmv(uid)").as("k")).select(col("k.est_distinct"))
      .as[Double].head()
    assert(math.abs(big - 997) / 997.0 < 0.25, s"estimate $big vs 997")
  }
}
