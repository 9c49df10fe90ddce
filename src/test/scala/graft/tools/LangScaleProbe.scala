package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-20 scale-law measurement for the merged language-id kernel
  * (verdict r19 item 2): score the sf documents corpus against N
  * SYNTHETIC profiles via (a) the r19 shape — one graft_gram_hits scan
  * per profile per row — and (b) the merged graft_gram_hits_all single
  * call, at N = 9 / 25 / 50. The claim under test: per-row cost of (a)
  * is linear in N while (b) is roughly flat (it scales with DISTINCT
  * gram WIDTHS, capped at 8 by the long pack — the synthetic set cycles
  * 4 widths, matching the shipped 9-language artifact's width count).
  * Usage: `Test/runMain graft.LangScaleProbe <sfDir>`.
  */
object LangScaleProbe {
  /** N deterministic disjoint profiles, 10 grams each, widths cycling
    * 3/4/5/6 bytes: gram j of lang i = base-26 letters of (i*10+j),
    * left-padded — distinct across the whole set, so the merged table
    * has no equal runs (the common case) and hit rates on real text are
    * ~0 for every profile, making the scan cost the whole measurement.
    */
  def synth(n: Int): Seq[(String, Seq[String])] =
    (0 until n).map { i =>
      val w = 3 + (i % 4)
      val grams = (0 until 10).map { j =>
        val v = i * 10 + j
        val s = BigInt(v).toString(26).map(c =>
          if (c.isDigit) ('a' + (c - '0')).toChar
          else ('k' + (c - 'a')).toChar)
        ("z" * w + s).takeRight(w)
      }
      (s"l$i", grams)
    }

  def t(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"PROBE $label $dt%.2f s")
    dt
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    import s.implicits._

    val docs = s.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    docs.agg(sum(length(col("text")))).collect() // warm the scan

    for (n <- Seq(9, 25, 50)) {
      val profiles = synth(n)
      val prof = profiles.zipWithIndex
        .flatMap { case ((_, gs), i) => gs.map(g => (i, g)) }
        .toDF("tie_rank", "g")

      // (a) r19 shape: one kernel call per profile
      val pm = prof.groupBy("tie_rank")
        .agg(collect_list(col("g")).as("grams"))
        .agg(map_from_entries(collect_list(
          struct(col("tie_rank"), col("grams")))).as("pm"))
      val perProfile = docs.crossJoin(broadcast(pm))
        .select(profiles.indices.map(i =>
          expr(s"graft_gram_hits(text, element_at(pm, $i))").as(s"s_$i")): _*)
      // (b) merged single call
      val merged = prof
        .select(col("tie_rank"), octet_length(col("g")).as("w"),
          expr("graft_pack_gram(g)").as("pg"))
        .groupBy(col("w"))
        .agg(expr("array_sort(collect_list(struct(pg, tie_rank)))").as("pt"))
        .agg(collect_list(struct(col("w"),
          expr("transform(pt, x -> x.pg)").as("packed"),
          expr("transform(pt, x -> x.tie_rank)").as("li"))).as("profs"))
      val one = docs.crossJoin(broadcast(merged))
        .withColumn("sc", expr(s"graft_gram_hits_all(text, profs, $n)"))
        .select(profiles.indices.map(i =>
          element_at(col("sc"), i + 1).as(s"s_$i")): _*)

      def drain(df: DataFrame): Unit =
        df.agg(profiles.indices.map(i =>
          sum(col(s"s_$i")).as(s"t_$i")).head,
          profiles.indices.tail.map(i => sum(col(s"s_$i"))): _*).collect()

      drain(perProfile); drain(one) // JIT warm-up, both paths
      val a = Seq.fill(2)(t(s"per-profile n=$n")(drain(perProfile))).min
      val b = Seq.fill(2)(t(s"merged      n=$n")(drain(one))).min
      println(f"RESULT n=$n per_profile=$a%.2f merged=$b%.2f " +
        f"ratio=${a / math.max(b, 1e-9)}%.1f")
    }
    s.stop()
  }
}
