package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 measurement harness for the IVF-PQ family (x23-x26).
  * Usage: Test/runMain graft.SweepR12 <sfDir> <mode>
  *   pieces  — time each pipeline stage of the x24/x26 curves separately
  *             (training, per-arm search, exact) to attribute curve cost
  *   scale   — x18 vs x23 vs x25 min-of-2 at the given dir (the
  *             crossover record)
  */
object SweepR12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SWEEP12 $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb0 = graft.sources.Tables.embeddings(spark, d)
    args(1) match {
      case "pieces" =>
        import graft.ext.Similarity
        graft.functions.GraftFunctions.register(spark)
        val emb = Similarity.clusteredCorpus(emb0)
        t("corpus count")(emb.count())
        val a1 = t("a1 train+retain (pp)")(graft.util.Caches.retain(
          Similarity.kmeansAssignSeeded(emb, 8, 2, pp = true)
            .select(col("vec_id"), col("e"), col("cluster"))))
        t("a1 count (fills cache)")(a1.count())
        t("a1 count (warm)")(a1.count())
        val cv1 = a1.agg(expr("graft_centroids(cluster, e, 8)").as("cents"))
          .select(explode(col("cents")).as("ct"))
          .select(col("ct.cluster").as("rc1"), col("ct.cvec").as("cv1"))
        t("cv1 collect")(cv1.collect())
        t("cv1 collect again")(cv1.collect())
        val resid = graft.util.Caches.retain(
          a1.join(broadcast(cv1), col("cluster") === col("rc1"))
            .select(col("vec_id"), col("cluster").as("c1"),
              expr("zip_with(e, cv1, (x, y) -> x - y)").as("r")))
        t("resid count (fills cache)")(resid.count())
        val cbAll = graft.util.Caches.retain((0 until 4).map { s =>
          val off = s * 16 + 1
          Similarity.lloydOver(resid.select(col("vec_id"),
              expr(s"slice(r, $off, 16)").as("e")), 8, 2, pp = false)
            .agg(expr(s"graft_centroids(cluster, e, 8)").as(s"cents$s"))
        }.reduce(_.crossJoin(_)))
        t("cbAll collect (fills cache)")(cbAll.collect())
        t("cbAll collect (warm)")(cbAll.collect())
        val q = a1.orderBy("vec_id").limit(1)
          .select(col("vec_id").as("q_id"), col("e").as("qe"))
        t("q collect")(q.collect())
        val probed = cv1.crossJoin(broadcast(q))
          .withColumn("dq", expr("graft_l2(cv1, qe)"))
          .orderBy(col("dq"), col("rc1")).limit(1)
          .select(col("rc1").as("pcell"), col("cv1").as("pcv"), col("qe"))
        t("probed collect")(probed.collect())
        val cand = resid
          .join(broadcast(probed.select("pcell")), col("c1") === col("pcell"))
          .crossJoin(broadcast(q.select("q_id")))
          .filter(col("vec_id") =!= col("q_id"))
          .crossJoin(broadcast(cbAll))
          .select(Seq(col("vec_id"), col("c1")) ++
            (0 until 4).map { s =>
              val off = s * 16 + 1
              expr(s"""array_min(transform(cents$s,
                   ct -> named_struct('dd', graft_l2(slice(r, $off, 16), ct.cvec),
                                      'c', ct.cluster))).c""").as(s"code_$s")
            }: _*)
        t("cand count")(cand.count())
        t("cand count again")(cand.count())
        val jobs = new java.util.concurrent.atomic.AtomicInteger
        val taskMs = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              jobs.incrementAndGet()
            override def onTaskEnd(
                e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (e.taskMetrics != null)
                taskMs.addAndGet(e.taskMetrics.executorRunTime)
          })
        t("full arm warm")(
          Similarity.ivfPqKnn(emb, nprobe = 1, pp = true).count())
        Thread.sleep(500)
        println(s"SWEEP12 arm jobs=${jobs.get} task_exec_ms=${taskMs.get}")
      case "scale" =>
        Seq("x18_pq_knn", "x23_ivfpq_knn", "x25_ivfpq_rerank").foreach { q =>
          val fn = SparkEntry.queries(q)
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"SWEEP12 $q min=${times.min}%.2f runs=${times.mkString(",")}")
        }
      case "recall" =>
        // the x24/x26 curve values at this dir's corpus size (the gates
        // declare them at sf0.01/sf0.1; this reads how they move with
        // cluster size — e.g. does shortK=200 still saturate when the
        // planted clusters are 10x larger?)
        val emb = graft.ext.Similarity.clusteredCorpus(emb0)
        graft.ext.Similarity.ivfPqRecallCurve(emb, pp = true)
          .collect().sortBy(_.getInt(0)).foreach(r =>
            println(s"SWEEP12 x24 nprobe=${r.getInt(0)} " +
              s"recall=${r.getDouble(3)}"))
        graft.ext.Similarity.ivfPqRerankCurve(emb, pp = true)
          .collect().sortBy(_.getInt(0)).foreach(r =>
            println(s"SWEEP12 x26 shortK=${r.getInt(0)} " +
              s"recall=${r.getDouble(3)}"))
      // `recall4`: the rerank curve at nprobe=4 — measures whether the
      // shortK ceiling (a truth member outside the nprobe=2 cells) lifts
      // when the probe widens, i.e. the "nprobe buys the ceiling" claim.
      case "recall4" =>
        val emb = graft.ext.Similarity.clusteredCorpus(emb0)
        graft.ext.Similarity.ivfPqRerankCurve(emb, pp = true, nprobe = 4)
          .collect().sortBy(_.getInt(0)).foreach(r =>
            println(s"SWEEP12 x26np4 shortK=${r.getInt(0)} " +
              s"recall=${r.getDouble(3)}"))
      // `auto`: the production posture — kmeansCells=auto derives k1 from
      // the corpus (occupancy ~256), modulo seed (a pp chain at k1~200 is
      // ~200 corpus passes). Measures whether bounded occupancy restores
      // the small-shortK recall the fixed-k1=8 run loses at 10x.
      case "auto" =>
        // optional 3rd arg: nprobe (default 2) — the co-sizing check:
        // auto-k1 shrinks cells ~10x, so the probe fraction must grow
        // ~10x to hold the recall ceiling.
        val np = if (args.length > 2) args(2).toInt else 2
        spark.conf.set(graft.ext.Dedup.KmeansCellsKey, "auto")
        try {
          val emb = graft.ext.Similarity.clusteredCorpus(emb0)
          // pp=true to match the fixed-k1 baseline curves — comparing an
          // auto-k1 modulo-seed run against a pp-seeded baseline would
          // conflate the seeding with the cell count (caught when the
          // first auto run read identical curves at nprobe 2 and 16)
          graft.ext.Similarity.ivfPqRerankCurve(emb, pp = true, nprobe = np)
            .collect().sortBy(_.getInt(0)).foreach(r =>
              println(s"SWEEP12 x26auto np=$np shortK=${r.getInt(0)} " +
                s"recall=${r.getDouble(3)}"))
        } finally spark.conf.unset(graft.ext.Dedup.KmeansCellsKey)
    }
    graft.util.Caches.releaseAll()
    spark.stop()
  }
}
