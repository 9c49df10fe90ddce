package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Physical-plan regressions gate: the 100 TB properties the engine relies
  * on — pushdown reaching the scan, dimension joins broadcasting, top-k
  * avoiding global sorts, partition pruning, single-shuffle as-of — pinned
  * as assertions so a refactor can't silently regress them.
  */
class PlanQualitySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    Catalog.byName(name).run(spark, sf).queryExecution.executedPlan.toString

  test("q01: filter and projection are pushed into the parquet scan") {
    val p = planOf("q01_scan_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,10.0)"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"))
  }

  test("q06: all four dimension joins broadcast — no shuffle join") {
    val p = planOf("q06_join5_chain")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 4)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q17: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = planOf("q17_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q29: as-of join runs as ONE shuffle + window, no join explosion") {
    val p = planOf("q29_asof_join")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1)
    assert(p.contains("Window"))
    assert(!p.contains("Join"))
  }

  test("q30: band join broadcasts the small side") {
    val p = planOf("q30_range_join")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("q42: partition filter prunes at the source") {
    val p = planOf("q42_partitioned_table")
    assert(p.contains("PartitionFilters: [isnotnull(etype"))
  }

  test("q41: custom grouped top-k plans as partial -> exchange -> final") {
    val p = planOf("q41_grouped_topk")
    assert(p.contains("TopKPartial"))
    assert(p.contains("TopKFinal"))
    assert(!p.contains("Window"))
  }

  test("q76: runtime bloom filter prunes the fact side before the shuffle") {
    // Built on a scoped newSession with the injection thresholds dropped
    // (the catalog lambda does this itself), so the executed plan must show
    // the bloom build on the selective orders side and the pushed
    // might_contain probe on the lineitem side.
    val p = planOf("q76_bloom_prune_join")
    assert(p.contains("bloom_filter_agg"))
    assert(p.contains("might_contain"))
  }

  test("d12: canonical dedup map is ONE exchange (window-min, no join-back)") {
    val p = planOf("d12_dedup_canonical")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1)
    assert(!p.contains("Join"))
  }

  test("x07: kNN join keeps k per query before the exchange — no window sort") {
    val p = planOf("x07_knn_join")
    assert(p.contains("TopKPartial"))
    assert(p.contains("TopKFinal"))
    assert(!p.contains("Window"))
    assert(p.contains("BroadcastNestedLoopJoin")) // tiny query side broadcast
  }

  test("d13: eval grams broadcast — corpus grams never shuffle to a merge join") {
    val p = planOf("d13_decontaminate")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q79: anomaly flags are ONE exchange (the user window), no join") {
    val p = planOf("q79_anomaly_zscore")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1)
    assert(p.contains("Window"))
    assert(!p.contains("Join"))
  }

  test("d03: signature self-join is a shuffled hash join, not a broadcast") {
    // At 100 TB the signature relation is TB-scale: AQE's broadcast choice
    // is only valid at toy SF, so the plan pins the scale-honest shape.
    val p = planOf("d03_dedup_lsh_pairs")
    assert(p.contains("ShuffledHashJoin"))
    assert(!p.contains("BroadcastHashJoin"))
  }

  test("x04: the only collect_list left is the dim-bounded vector assembly") {
    // The per-(label,pos) row fold was removed in round 3 (unbounded group
    // materialization); the surviving collect_list aggregates exactly
    // `dim`=64 elements per label — bounded by dimensionality, not rows.
    val p = Catalog.byName("x04_knn_ivf").run(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert("collect_list".r.findAllIn(p).size === 1, p)
    assert(!p.contains("collect_list(struct(vec_id"))
  }

  test("d08: native gram kernel, ONE exchange, partial count before it") {
    // The countDistinct form needed two exchanges over (gram_hash, doc_id);
    // per-doc in-row dedup makes the corpus count a single map-side-combined
    // shuffle of gram hashes.
    val p = planOf("d08_boilerplate_ngrams")
    assert(p.contains("graft_gram5_distinct"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(p.contains("partial_count"))
  }

  test("t06: repetition signals are per-row — zero exchanges, native kernel") {
    val p = planOf("t06_text_repetition")
    assert(p.contains("graft_rep_stats"))
    assert(!p.contains("Exchange"), p)
  }

  test("d11: incremental admission is semi + anti probe, no pair materialization") {
    val p = planOf("d11_dedup_incremental")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    // the snapshot side is probed, never joined into an output pair relation
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("p03: pipeline composes into 2 exchanges — digest window + partial-agg'd mix report") {
    val p = planOf("p03_training_pipeline")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
    assert(p.contains("partial_count"), p) // mix report combines map-side
  }

  test("p05: packing is ONE exchange — (source,bin) agg reuses source partitioning") {
    val p = planOf("p05_sequence_packing")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(p.contains("partial_count"), p) // bin stats combine map-side
  }

  test("q86: lateral top-n de-correlates — WindowGroupLimit before the exchange, nation broadcast") {
    val p = planOf("q86_lateral_topn")
    // Catalyst must rewrite the per-row LATERAL into join + ranked window,
    // with the group-limit pushed BELOW the shuffle (map-side top-k prune)
    // — not re-execute the subquery per outer row.
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("q59: KMV sketch aggregates partial -> final (mergeable at scale)") {
    val p = planOf("q59_kmv_sketch")
    assert(p.contains("ObjectHashAggregate"))
    assert(p.contains("partial_graft_kmv"))
  }

  test("d03's 100TB layout: band-bucketed signature table joins exchange-free") {
    // The Dedup scaladoc's promised layout made concrete: materialize the
    // exploded (band,h1,h2,doc_id) signature relation bucketed on the band
    // key; every subsequent LSH candidate join then needs NO shuffle of
    // either side — the one-time bucketed write replaces a per-query
    // exchange of the corpus-sized relation.
    val s = spark
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val sig = graft.ext.Dedup.minhash(
        graft.sources.Tables.documents(s, sf))
      val banded = sig.select(col("doc_id"),
        explode(array(graft.ext.Dedup.bands.zipWithIndex.map {
          case ((x, y), i) => struct(lit(i).as("band"),
            col(s"mh$x").as("h1"), col(s"mh$y").as("h2"))
        }: _*)).as("b"))
        .select(col("doc_id"), col("b.band"), col("b.h1"), col("b.h2"))
      banded.write.mode("overwrite")
        .bucketBy(4, "band", "h1", "h2").sortBy("band", "h1", "h2")
        .saveAsTable("b_sig")
      val a = s.table("b_sig").toDF("doc_a", "band", "h1", "h2")
      val b = s.table("b_sig").toDF("doc_b", "band_b", "h1b", "h2b")
      val pairs = a.join(b, col("band") === col("band_b") &&
          col("h1") === col("h1b") && col("h2") === col("h2b") &&
          col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val p = pairs.queryExecution.executedPlan.toString
      // the JOIN reads both sides bucket-aligned: no exchange exists on the
      // join keys (band,h1,h2) — the only one is the distinct's, on
      // (doc_a, doc_b), above the join
      assert(p.contains("SortMergeJoin"))
      assert(!p.contains("Exchange hashpartitioning(band"),
        s"signature self-join must not reshuffle bucketed sides:\n$p")
      assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
      assert(pairs.count() > 0)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS b_sig")
    }
  }

  test("q92: skyline is agg + broadcast threshold join — never a self-join") {
    val p = planOf("q92_skyline")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
    // the single-partition window runs over the per-size aggregate only:
    // partial agg must appear below the window's exchange
    assert(p.contains("partial_min"))
  }

  test("q89: streaks reuse ONE user partitioning across window and agg") {
    val p = planOf("q89_streaks")
    // distinct (user, day) + row_number + final agg: the row_number window
    // and the groupBy(user, anchor) agg share the user_id-prefix hash
    // partitioning, so only the distinct and the window repartition —
    // 2 exchanges total, none carrying raw events
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2)
  }

  test("t14: scrub lexicon broadcasts — the only corpus exchange builds the lexicon") {
    val p = planOf("t14_passage_scrub")
    // Round 21: the lexicon is ONE sorted broadcast row and each doc
    // scrubs itself in the compiled kernel — the per-doc reassembly
    // exchange (posexplode → join → groupBy(doc_id)) is gone. The single
    // remaining hash exchange is the lexicon count agg; the broadcast is
    // a one-row cross (nested-loop), never a sort-merge join.
    assert(p.contains("graft_scrub_passages"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("t16: batching is ONE exchange — (bucket,batch) agg reuses the bucket window partitioning") {
    val p = planOf("t16_length_batching")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(p.contains("Window"), p)
  }

  test("x09/x10: quantize + integer score stay compiled kernels, not HOFs") {
    for (q <- Seq("x09_quantized_knn", "x10_two_stage_knn")) {
      val p = planOf(q)
      // the codegen'd expressions must appear; the interpreted lambda forms
      // (transform / aggregate(zip_with)) must not creep back into the plan
      assert(p.contains("graft_q127"), q)
      assert(p.contains("graft_doti"), q)
      assert(!p.contains("zip_with"), q)
      assert(!p.contains("lambdafunction"), q)
    }
  }

  test("d15: simhash block join is a shuffled hash join, never a cartesian") {
    val p = planOf("d15_simhash_pairs")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q101: percentile gate sorts the price DOMAIN, never the raw rows") {
    val p = planOf("q101_percentile_gate_exact")
    // the histogram partial-aggregates before its exchange; the only
    // single-partition step runs over the (cents, count) aggregate
    assert(p.contains("partial_count"), p)
    assert(!p.contains("Exchange rangepartitioning"), p) // no global row sort
    assert(p.contains("BroadcastNestedLoopJoin"), p)     // cutoff broadcast
  }

  test("q96: storage-partitioned join — zero exchanges over the keyed V2 scans") {
    val p = planOf("q96_dsv2_spj")
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("BatchScan graft-wire"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("q95: SQL UDF inlines — the bind-param filter still reaches the scan") {
    val p = planOf("q95_sql_udf")
    // a Scala-lambda UDF here would appear as BatchEvalPython/Invoke and
    // block pushdown; the SQL-body function must leave neither trace
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,30.0)"), p)
    assert(!p.contains("UDF"), p)
  }

  test("q94: link-rank iterations broadcast the node-scale rank side — edges never merge-join") {
    // the per-iteration shape, via the spec hook that skips the lineage
    // truncation (the declared query's final plan is a checkpoint scan and
    // hides the joins inside its materialization — pinned below)
    val edges = graft.sources.Tables.events(spark, sf)
      .select((col("user_id") % 50).as("src"), (col("event_id") % 50).as("dst"))
      .distinct()
    val raw = graft.operators.LinkRank.rank(edges, 3, checkpoint = false)
      .queryExecution.executedPlan.toString
    assert(raw.contains("BroadcastHashJoin"), raw)
    assert(!raw.contains("SortMergeJoin"), raw)
    assert(!raw.contains("CartesianProduct"), raw)
    // the declared query's plan: ONE scan of the materialized final
    // iteration (round-13: the nested broadcast tree re-planned per run
    // was the 0.98→1.92 s same-tree wobble) — no joins survive in it
    val p = planOf("q94_link_rank")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q93: bucketed co-located join — only the final agg exchanges") {
    val p = planOf("q93_bucketed_join")
    assert(p.contains("SortMergeJoin"), p)
    // the join consumes the two bucketed scans in place; the single
    // exchange is the groupBy(o_orderpriority) re-key above it
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
    assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)
  }

  test("q103: cohort counts are plain count(*) — no COUNT DISTINCT Expand") {
    val p = planOf("q103_retention_cohort")
    assert(!p.contains("Expand"), p)
    // dedup and first-seen agg share the user_id hash partitioning
    assert(p.contains("Exchange hashpartitioning(user_id"), p)
  }

  test("q104: rolling distinct is explode + dedup — no Expand, 1-row max broadcasts") {
    val p = planOf("q104_rolling_distinct")
    assert(!p.contains("Expand"), p)
    assert(p.contains("Generate explode"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q100: forward fill is ONE exchange — the user window — no join") {
    val p = planOf("q100_forward_fill")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("q102: SCD2 point-in-time join broadcasts the versioned dim — facts never shuffle") {
    val p = planOf("q102_scd2_join")
    // equality on nk carries the hash join; the validity window is the
    // residual condition on the SAME node — not a nested-loop fallback
    assert("BroadcastHashJoin .* >= vstart".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p) // fact side flows through
    // the only nested-loop is the dim BUILD (nation × 3 versions, dim-scale
    // cross); the fact relation must never feed one
    "BroadcastNestedLoopJoin.*".r.findAllIn(p).foreach(l =>
      assert(l.contains("Cross"), p))
  }

  test("s27: first-seen runs as ONE stateful operator with append emission") {
    // Drive the streaming transform directly (AvailableNow over the events
    // parquet) and pin the INCREMENTAL plan: exactly one
    // FlatMapGroupsWithState state store keyed by user, no second stateful
    // op, no sort — emission is append-mode pass-through above the state op.
    val s = spark
    val src = Paths.get(graft.util.Scratch.dir("graft_s27_src"))
    Files.createSymbolicLink(src.resolve("events.parquet"),
      Paths.get(s"$sf/events.parquet"))
    val out  = graft.util.Scratch.dir("graft_s27_out")
    val ckpt = graft.util.Scratch.dir("graft_s27_ckpt")
    val schema = s.read.parquet(s"$sf/events.parquet").schema
    val q = StreamingQ.withStateParts(s,
        StreamingQ.inletBytes(src.toString)) {
      val stream = Tables.normalizeEvents(
        s.readStream.schema(schema).parquet(src.toString))
      val q0 = StreamingQ.firstSeenXform(s)(stream).writeStream
        .format("parquet").outputMode("append")
        .option("checkpointLocation", ckpt).option("path", out)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q0.awaitTermination(); q0
    }
    val p = q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
    assert("FlatMapGroupsWithState".r.findAllIn(p).size === 1, p)
    // the flag state lives inside the flatMap operator itself — no second
    // stateful op (a windowed-agg formulation would add StateStoreSave)
    assert("StateStoreSave|StateStoreRestore".r.findAllIn(p).isEmpty, p)
    assert(p.contains("Append, NoTimeout"), p)
    // ONE exchange: the stateful operator's required key partitioning
    // (the groupByKey-appended user key); the local per-partition Sort
    // above it is the operator's grouping contract, not a global sort
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(s.read.parquet(out).count() > 0)
  }

  test("t18: trigram-LM scoring is one compiled pass over a broadcast " +
      "1-row model — no probe explode, no scoring join, no per-doc " +
      "re-aggregation") {
    val p = planOf("t18_trigram_lm")
    // round 20: the 65536-bucket model merges into ONE row of sorted
    // parallel (bucket, count) arrays, broadcast via the documented
    // broadcast-scalar crossJoin pattern; every document is scored by a
    // single graft_lm_familiarity projection
    assert(p.contains("graft_lm_familiarity"), p)
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      p)
    // exactly ONE hash exchange remains: the model's bucket groupBy (≤2^16
    // rows after map-side combine); the old per-doc scoring aggregate — a
    // corpus-scale doc_id exchange — is gone
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("t19: mixture rates broadcast — document admission is shuffle-free") {
    val p = planOf("t19_mixture_sample")
    // the |sources|-row rate table broadcasts; docs stream through the
    // admission filter without ever hash-exchanging on doc identity
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning(doc_id"), p)
    // the only hash exchanges are the dim-scale per-source aggregates
    "Exchange hashpartitioning\\(\\w+".r.findAllIn(p).foreach(e =>
      assert(e.contains("(source"), p))
    assert(!p.contains("Window"), p)
  }

  test("p07: training shuffle is ONE corpus exchange, no global sort") {
    val p = planOf("p07_training_shuffle")
    // the window's partition key IS the shuffle key: one corpus-scale hash
    // exchange on shard, then an in-partition (non-global) sort
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Exchange rangepartitioning"), p) // no global sort
    // the shard-count aggregate is metadata-scale: a 1-row broadcast cross
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    "BroadcastNestedLoopJoin.*".r.findAllIn(p).foreach(l =>
      assert(l.contains("Cross"), p))
    assert(p.contains("Window"), p)
  }

  test("q105: PII pseudonymization is scan→project — zero exchanges") {
    val p = planOf("q105_pii_mask")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("Scan parquet"), p)
  }

  test("x11: corpus never hash-exchanges — every exchange carries centroid keys") {
    val p = planOf("x11_kmeans")
    // assignment = broadcast centroid row per Lloyd round (2 rounds)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size === 2, p)
    // assignment is the compiled argmin kernel (round 13: graft_best_cell
    // replaced the array_min(transform(...)) HOF — interpreted lambda +
    // one struct alloc per centroid per row), never an interpreted fold
    assert(p.contains("graft_best_cell"), p)
    assert(!p.contains("zip_with"), p)
    assert(!p.contains("array_min"), p)
    // centroid recompute is the mergeable accumulator (one bounded buffer
    // per partition), not the exploded (cluster,pos) row chain
    assert(p.contains("partial_graft_centroids"), p)
    assert(!p.contains("Generate posexplode"), p)
    // the only hash exchange is the final per-cluster summary — the n-row
    // corpus side flows map-side through every round
    "Exchange hashpartitioning\\(\\w+".r.findAllIn(p).foreach(e =>
      assert(e.contains("(cluster"), p))
  }

  test("d17: cell-blocked pair stage is a shuffled hash join, never cartesian") {
    val p = planOf("d17_semantic_dedup")
    // the pairwise stage must join on the learned cell key (d03's
    // scale-honest shape)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the kmeans assignment is TRAINED ONCE, OUTSIDE this plan: the
    // retained checkpoint (Caches.retainCheckpointed — the round-12
    // planning-floor fix) truncates the Lloyd lineage, so every consumer
    // scans the materialized partitions and the serving plan carries NO
    // training subtree at all
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("partial_graft_centroids"),
      "training leaked back into the serving plan:\n" + p)
  }

  test("q108: sketch profile is ONE scan — every stat and every KMV ride " +
      "a single aggregate pass") {
    val p = planOf("q108_profile_sketch")
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert(p.contains("partial_graft_kmv"), p)
    // no per-column distinct branches (q107's shape) and no Expand
    assert(!p.contains("Expand"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // partial -> SinglePartition exchange -> final: the only exchange
    // carries the 17 aggregation buffers, never rows
    assert("Exchange SinglePartition".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("x14: nprobe probe broadcasts; corpus never hash-exchanges") {
    val p = planOf("x14_knn_ivf_nprobe")
    // serving centroids from the mergeable accumulator over the
    // checkpointed assignment, cells ranked against the broadcast query,
    // nprobe rows broadcast back
    assert(p.contains("partial_graft_centroids"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the checkpointed assignment is the only corpus relation (training
    // lineage truncated out of the plan); no hash exchange of it appears
    // anywhere in the probe plan
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("p08 lifecycle: the quantizer trains ONCE — every stage scans the " +
      "same checkpointed RDD") {
    val df = Catalog.byName("p08_semantic_lifecycle").run(spark, sf)
    // dedup-side pairs (2 consumers), admission base, serve-side kept scan
    // and the query row all end at the retained CHECKPOINT of the
    // assignment (Caches.retainCheckpointed memoizes by canonicalized
    // input plan); the train-once contract is that they all scan the SAME
    // materialized RDD instance.
    val rdds = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD
          if r.output.map(_.name).toSet == Set("vec_id", "e", "cluster")
        => r.rdd
    }
    assert(rdds.size >= 3,
      s"dedup + serve stages must all read the checkpointed assignment, " +
        s"saw ${rdds.size}")
    assert(rdds.map(_.id).distinct.size === 1,
      "quantizer trained more than once: distinct checkpoint RDDs found")
  }

  test("p08 lifecycle: serve stage is broadcast-probed, never a shuffle " +
      "of the corpus for the query row") {
    val p = planOf("p08_semantic_lifecycle")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("d19: pair stage is a shuffled hash join on the compound cell key") {
    val p = planOf("d19_semantic_dedup_2level")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // both Lloyd levels are trained once into the checkpointed cells
    // relation; the pair sides + admission base scan its partitions and
    // no training subtree appears in the serving plan
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("partial_graft_centroids"),
      "training leaked back into the serving plan:\n" + p)
  }

  test("x23: IVFADC scores only probed cells — no corpus exchange, no " +
      "training subtree, broadcast-only probe") {
    val p = planOf("x23_ivfpq_knn")
    // the index artifacts are checkpointed scans; the serving plan holds
    // no Lloyd/codebook training and never hash-exchanges the corpus
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("partial_graft_centroids"),
      "training leaked back into the serving plan:\n" + p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("x25: the re-rank touches shortK point reads, not the corpus") {
    val p = planOf("x25_ivfpq_rerank")
    // shortlist broadcast back against the checkpointed full-precision
    // relation: broadcast join + TakeOrdered, no corpus-side exchange
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x27: the pre-filter predicate reaches the parquet scan; the flag " +
      "is broadcast-only") {
    val p = planOf("x27_filtered_knn")
    // the whole point of pre-filtering in Spark: the label predicate is a
    // plain column filter, so it pushes into the scan (at 100 TB with
    // label a partition column this becomes partition pruning)
    assert(p.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)]")
      || p.contains("EqualTo(label,3)"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // post-filter arm rows join broadcast; no corpus hash exchange
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("x28: the inline filter reaches the serving scan BEFORE scoring; " +
      "everything else is broadcast-sized") {
    val p = planOf("x28_ivfpq_filtered")
    // the middle path's whole point: the predicate pushes into the parquet
    // scan of the serving pass (at 100 TB with label-bearing stored codes,
    // partition pruning + the same pushed filter on the codes table)
    assert(p.contains("EqualTo(label,3)"), p)
    // cell prune + probe + codebooks + shortlist + flag all broadcast; the
    // corpus never hash-exchanges and no non-broadcast cartesian appears
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("x30: k-means|| seeds re-enter as a literal relation — no " +
      "sequential TakeOrdered chain at any k") {
    val p = planOf("x30_kmeans_parallel")
    // the parallel seeder's whole point: the k centers are computed from
    // bounded candidate METADATA at plan build and re-enter as a literal
    // (LocalTableScan); the farthest-point seeder's k−1 TakeOrdered jobs
    // are absent from the served plan
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("p10: the serve plan reads artifact parquet only — no training " +
      "subtree, no corpus scan, no checkpoint") {
    val p = planOf("p10_index_lifecycle")
    assert(!p.contains("embeddings.parquet"), p)
    assert(p.contains("graft_mat"), p) // the persisted-artifact scratch dir
    assert(!p.contains("Scan ExistingRDD"), p) // no in-session checkpoint
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("d21: one gram-hash equi-join — never cartesian; spans from window " +
      "streaks, no text re-scan") {
    val p = planOf("d21_exact_substring")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p) // the streak row_number
    assert(p.contains("Generate"), p) // posexplode of the gram kernel
    assert(p.contains("graft_gram_chain"), p) // compiled kernel, not a HOF
  }

  test("x32: recursed recluster — candidates stay distributed (checkpoint " +
      "scans), no k-step TakeOrdered chain, no cartesian") {
    val p = planOf("x32_kmeans_recursed")
    // the distributed arm's signature: centroid artifacts re-enter as
    // checkpointed relations (Scan ExistingRDD) consumed via broadcast;
    // the greedy arm's LocalTableScan literal and the farthest-point
    // TakeOrdered chain are both absent
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x33: both recall arms run through TopKPerKey partial heaps — the " +
      "n*|Q| scored relation never shuffles") {
    val p = planOf("x33_sampled_recall")
    assert(p.contains("TopKPartial"), p)
    assert(p.contains("TopKFinal"), p)
    assert(p.contains("graft_cos"), p) // compiled kernel, not a HOF fold
    assert(!p.contains("Window"), p)   // no window-rank fallback anywhere
  }

  test("d25: media near-dup pairs via shuffled-hash block join over the " +
      "compiled dHash — never cartesian") {
    val p = planOf("d25_media_neardup")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.contains("graft_dhash"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d29: alignment-tolerant media pairs via shuffled-hash block join " +
      "over the compiled RAW min-hash array — never cartesian, sketch " +
      "gate inline, Jaccard verify on sketch survivors only") {
    val p = planOf("d29_media_minhash_neardup")
    assert(p.contains("ShuffledHashJoin"), p)
    // the raw-array signature (block width truncates at join time — the
    // round-17 knob), not the packed 60-bit form
    assert(p.contains("graft_byte_minhash_arr"), p)
    // the exact verify's gram arrays appear (candidate-side joins), and
    // the quadratic space never materializes
    assert(p.contains("graft_byte_grams"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the 16-hash sketch gate sits BELOW the gram joins, inline on the
    // candidate rows (the alias is inlined by column pruning, so pin the
    // highest sketch index ON THE SIGNATURE ATTRIBUTE — a bare "[19]"
    // could match unrelated plan ids (round-18 ADVICE): the gate is the
    // only expression indexing sh_a at the last sketch position, and it
    // renders as sh_a#<exprId>[19]
    assert("""sh_a#\d+\[19\]""".r.findFirstIn(p).isDefined, p)
  }

  test("p14: tokenizer artifact serve — the encode plan contains NO " +
      "aggregation (no pair counting, no training subtree): the merge " +
      "table is a parquet scan and every merge joins ONE broadcast row") {
    val p = planOf("p14_tokenizer_lifecycle")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // k 1-row merge joins
    assert(!p.contains("HashAggregate"), p)          // no counting anywhere
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("TakeOrderedAndProject"), p)  // no winner selection
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q109: the fact scan carries a dynamicpruning PartitionFilter — " +
      "the dim's non-join-column filter reaches the fact only at runtime") {
    val p = planOf("q109_dynamic_pruning")
    assert(p.contains("dynamicpruning"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q106: refresh reads state + pruned delta — history rows untouched") {
    val p = planOf("q106_incremental_agg")
    assert(p.contains("partial_sum"), p)
    // the delta scan must partition-prune on the persisted day layout
    // (the cutoff is a plan-time literal from the watermark read); match
    // only "a partition filter on day exists" — the disjunction's operand
    // order/parenthesization is Catalyst-version-dependent
    assert("PartitionFilters: \\[[^\\]]*day".r.findFirstIn(p).isDefined, p)
    // no scan of the raw events table — only the state table and the
    // day-partitioned layout appear
    assert(!p.contains("events.parquet"), p)
    "Exchange hashpartitioning\\(\\w+".r.findAllIn(p).foreach(e =>
      assert(e.contains("(user_id"), p))
  }

  test("q107: profile never Expands — distincts are partial-dedup branches") {
    val p = planOf("q107_table_profile")
    // the multi-COUNT(DISTINCT) Expand form dragged every agg buffer across
    // rows×(cols+1) expanded rows (20× slower); the pinned shape is one
    // narrow stats pass + per-column map-side-distinct aggregates whose
    // 1-row results broadcast together
    assert(!p.contains("Expand"), p)
    assert("Scan parquet".r.findAllIn(p).size === 5, p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size === 4, p)
    // each distinct branch dedups map-side before its exchange: the partial
    // aggregate keyed on the column itself must sit below every shuffle
    assert(p.contains("partial_count"), p)
  }

  test("t20: budget cut is ONE source exchange — scoring rides the scan") {
    val p = planOf("t20_quality_budget")
    assert(p.contains("graft_quality_stats"), p)
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(p.contains("Exchange hashpartitioning(source"), p)
  }

  test("t23: BPE encode — the merge chain never goes quadratic (every " +
      "winner join is the 1-row broadcast), no SMJ, winners via TakeOrdered") {
    val p = planOf("t23_bpe_encode")
    // each of the k rounds: winner = TakeOrderedAndProject over the
    // map-side-combined pair counts; merge = corpus x broadcast(1 row)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("p13: langid mix — the label is a per-row kernel (no exchange to " +
      "label), rates/admission joins all broadcast, no SMJ anywhere, and " +
      "the corpus scans exactly twice (stats retained — round-16 advice)") {
    val p = planOf("p13_langid_mix")
    assert(p.contains("graft_gram_hits"), p) // the compiled langid scorer
    assert(p.contains("graft_poly_hash"), p) // the deterministic coin
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // two corpus scans STRUCTURALLY: the retained per-language stats feed
    // both the rate table and the admission join from one cached frame,
    // so a ReuseExchange regression cannot re-introduce a third scan.
    // (The plan STRING repeats the cache's build subtree once per
    // consumer, so scans are counted per executed job, not per print:
    // cache build = 1 corpus scan, admission pass = 1.)
    assert(p.contains("InMemoryTableScan"), p)
    // the profile ARTIFACT is a parquet scan in the lineage (round-17:
    // langid serves from the persisted profile table, not plan literals)
    assert(p.contains("profiles"), p)
  }

  test("bucketed tables join without a shuffle exchange") {
    val s = spark
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.orders(s, sf).write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      Tables.lineitem(s, sf).write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
      val j = s.table("b_lineitem")
        .join(s.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"))
      assert(!p.contains("Exchange hashpartitioning"),
        "bucketed join must not reshuffle either side")
      assert(j.count() === Tables.lineitem(s, sf).count()) // FK join keeps rows
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
