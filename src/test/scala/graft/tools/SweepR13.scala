package graft

import org.apache.spark.sql.SparkSession

/** Round-13 measurement harness. Usage: Test/runMain graft.SweepR13 <sfDir> <mode>
  *
  *   bits   — the code-resolution sweep the round-12 verdict asked for
  *            (item 4): x24's raw-ADC recall floor (0.2-0.3 flat in nprobe)
  *            is attributed to m·log2(kcode) = 12 bits/vector, and
  *            BASELINE names "more codebook bits" as the lever — but the
  *            knob was never swept. Runs the raw-ADC recall curve AND one
  *            rerank point (shortK=50) per (m, kcode) config on the
  *            planted corpus, timing each config's curve build:
  *              (4, 8)  = 12 bits (the declared default)
  *              (8, 8)  = 24 bits via more subspaces (finer spatial split)
  *              (4, 64) = 24 bits via bigger codebooks (finer per-subspace)
  *              (8, 64) = 48 bits (both)
  *            dim = 64, so subDim = 64 / m.
  *
  *   q95    — reproduce the driver's bimodal q95 reading (verdict item 1):
  *            run q95_sql_udf N times in a row and print each wall time;
  *            with the hoisted registration the steady-state runs must sit
  *            in one band (the catalog work now happens once per session).
  */
object SweepR13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val emb0 = graft.sources.Tables.embeddings(spark, d)
    args(1) match {
      case "bits" =>
        val emb = graft.ext.Similarity.clusteredCorpus(emb0)
        Seq((4, 8), (8, 8), (4, 64), (8, 64)).foreach { case (m, kcode) =>
          val subDim = 64 / m
          val bits = m * (math.log(kcode) / math.log(2)).round
          val t0 = System.nanoTime()
          val raw = graft.ext.Similarity
            .ivfPqRecallCurve(emb, pp = true, m = m, subDim = subDim,
              kcode = kcode)
            .collect().sortBy(_.getInt(0))
          val tRaw = (System.nanoTime() - t0) / 1e9
          raw.foreach(r => println(
            s"SWEEP13 bits m=$m kcode=$kcode bits=$bits " +
              s"x24 nprobe=${r.getInt(0)} recall=${r.getDouble(3)}"))
          val t1 = System.nanoTime()
          val rr = graft.ext.Similarity
            .ivfPqRerankCurve(emb, pp = true, m = m, subDim = subDim,
              kcode = kcode)
            .collect().sortBy(_.getInt(0))
          val tRr = (System.nanoTime() - t1) / 1e9
          rr.foreach(r => println(
            s"SWEEP13 bits m=$m kcode=$kcode bits=$bits " +
              s"x26 shortK=${r.getInt(0)} recall=${r.getDouble(3)}"))
          println(f"SWEEP13 bits m=$m kcode=$kcode bits=$bits " +
            f"raw_curve_s=$tRaw%.2f rerank_curve_s=$tRr%.2f")
          graft.util.Caches.releaseAll() // fresh training per config
        }
      case "q95" =>
        val n = if (args.length > 2) args(2).toInt else 6
        val fn = SparkEntry.queries("q95_sql_udf")
        (1 to n).foreach { i =>
          val t0 = System.nanoTime()
          fn(spark, d).write.format("noop").mode("overwrite").save()
          println(f"SWEEP13 q95 run=$i t=${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
    }
    graft.util.Caches.releaseAll()
    spark.stop()
  }
}
