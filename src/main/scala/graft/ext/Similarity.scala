package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Q
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings.embedding`
  * column (ArrayType(FloatType), 64-dim) — north-star similarity ops.
  *
  * Cosine is computed as a sequential left fold over double-cast elements in
  * BOTH engines (Spark `aggregate(zip_with(...))`, DuckDB
  * `list_reduce(list_prepend(...))`) so the IEEE double results are
  * bit-identical and the driver's hash compare passes.
  *
  * Scale design:
  *   - brute-force top-k: broadcast the single query row, per-partition
  *     scan + `TakeOrderedAndProject` (no global sort, no shuffle of the
  *     fact side). This is the exact baseline.
  *   - LSH variant: 8 random-hyperplane sign bits → 256 buckets; the scan
  *     is pre-filtered to the query's bucket (~1/256 of the data at
  *     uniform spread) before the exact cosine ranking. At 100 TB the
  *     bucket id becomes a parquet partition column, turning the prune
  *     into partition pruning at the source.
  */
object Similarity {

  /** Spark SQL: sequential-fold dot product of two float-array columns. */
  def sparkDot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      s"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  /** DuckDB: identical fold (same element order, same double arithmetic). */
  def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, v) -> acc + v)"

  def sparkCos(a: String, b: String): String =
    s"(${sparkDot(a, b)}) / (sqrt(${sparkDot(a, a)}) * sqrt(${sparkDot(b, b)}))"
  def duckCos(a: String, b: String): String =
    s"(${duckDot(a, b)}) / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)}))"

  /** Squared-L2 distance as a sequential left fold over 1-based indices —
    * the oracle-side twin of the compiled engine kernel (VecOps.d2D via
    * `graft_l2`): identical per-element subtract → square → accumulate
    * sequence in double precision, so both engines produce bit-identical
    * distances. Inputs must already be double lists.
    */
  def duckD2(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), (a2, v2) -> a2 + v2)"

  /** Deterministic "random" hyperplane j, component i (1-based):
    * ((i · (2j+3) · 2654435761) >> 16) % 7 − 3 ∈ [-3, 3]. Same integers in
    * all engines (VecOps.planeCoef is the native mirror; see its scaladoc
    * for why the stride scales with j — the original % 7 family repeated
    * with period 7 in j, collapsing plane 7 onto plane 0). No RNG, no
    * stored model; integer division keeps the shift portable SQL.
    */
  val nPlanes = 8
  private def coefSql(iExpr: String, j: Int): String =
    s"((($iExpr * ${2 * j + 3} * 2654435761) / 65536) % 7) - 3"
  def sparkPlaneDot(v: String, j: Int): String =
    s"aggregate(sequence(1, size($v)), CAST(0 AS DOUBLE), " +
      s"(acc, i) -> acc + CAST(element_at($v, i) AS DOUBLE) * " +
      s"(${coefSql("CAST(i AS BIGINT)", j).replace(" / ", " DIV ")}))"
  def duckPlaneDot(v: String, j: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(1, len($v) + 1), " +
      s"i -> CAST($v[i] AS DOUBLE) * (${coefSql("i", j).replace(" / ", " // ")}))), " +
      s"(acc, v2) -> acc + v2)"

  /** Σ 2^j · [dot(v, plane_j) > 0] — the `bits`-wide LSH bucket id
    * (default 8 = the x02/x03 declared contract; d07's oracle threads
    * the conf-resolved width so a numeric hyperplaneBits knob keeps
    * engine and oracle in lockstep — the round-10 review gap).
    */
  def sparkBucket(v: String, bits: Int = nPlanes): String =
    (0 until bits).map { j =>
      s"(CASE WHEN (${sparkPlaneDot(v, j)}) > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS INT)")
  def duckBucket(v: String, bits: Int = nPlanes): String =
    (0 until bits).map { j =>
      s"(CASE WHEN (${duckPlaneDot(v, j)}) > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS INT)")

  /** The query point: lowest vec_id (deterministic, no parameters). */
  private def queryRow(emb: DataFrame): DataFrame =
    emb.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))

  /** Exact brute-force cosine top-k against the query row. The cosine is the
    * native codegen'd [[graft.functions.CosFExpr]] (same sequential fold as
    * the SQL form, one compiled call per row); broadcast query row +
    * `TakeOrderedAndProject` means no shuffle of the fact side.
    */
  def knnBrute(emb: DataFrame, kTop: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    emb.crossJoin(broadcast(queryRow(emb)))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", expr("graft_cos(embedding, qe)"))
      .select("vec_id", "label", "cos_sim")
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(kTop)
  }

  def knnBruteSql(kTop: Int = 10, src: String = "embeddings"): String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe
                   FROM $src ORDER BY vec_id LIMIT 1)
        SELECT vec_id, label, ${duckCos("embedding", "qe")} AS cos_sim
        FROM $src, q WHERE vec_id <> q_id
        ORDER BY cos_sim DESC, vec_id LIMIT $kTop"""

  /** LSH-pruned ANN: restrict the exact ranking to the query's bucket. */
  def knnLsh(emb: DataFrame, kTop: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val bucketed = emb.withColumn("bucket", expr("graft_lsh_bucket(embedding)"))
    val q = bucketed.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        col("bucket").as("q_bucket"))
    bucketed.join(broadcast(q), col("bucket") === col("q_bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", expr("graft_cos(embedding, qe)"))
      .select("vec_id", "label", "bucket", "cos_sim")
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(kTop)
  }

  def knnLshSql(kTop: Int = 10): String =
    s"""WITH b AS (SELECT vec_id, label, embedding,
                          ${duckBucket("embedding")} AS bucket
                   FROM embeddings),
             q AS (SELECT vec_id AS q_id, embedding AS qe, bucket AS q_bucket
                   FROM b ORDER BY vec_id LIMIT 1)
        SELECT vec_id, label, bucket, ${duckCos("embedding", "qe")} AS cos_sim
        FROM b, q WHERE bucket = q_bucket AND vec_id <> q_id
        ORDER BY cos_sim DESC, vec_id LIMIT $kTop"""

  /** IVF-style ANN: a coarse quantizer (one centroid per label, the
    * stand-in for k-means cells) picks the probe cell, and the exact cosine
    * ranking runs only inside it. At 100 TB the centroid table is a
    * broadcast-sized index and cells map to parquet partitions, so the probe
    * becomes partition pruning — the classic IVF trade (recall bounded by
    * nprobe=1 here) against scanning the corpus.
    *
    * Determinism for the oracle: the centroid is the mean of values
    * quantized to 2^-20 units — `floor(val * 2^20)` is bit-identical in
    * both engines (float→double is exact, ×2^20 is an exponent shift,
    * floor is exact; no decimal/round rounding-rule divergence) and the
    * BIGINT sum is associative, hence order-free and partition-stable
    * WITHOUT materializing any per-group array (a hot label can have
    * billions of rows at 100 TB; the old collect_list fold OOM'd there).
    * The 1e-6-scale quantization is immaterial for a coarse quantizer.
    */
  def knnIvf(emb: DataFrame, kTop: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val pe = emb.select(col("label"), col("vec_id"),
      posexplode(col("embedding")).as(Seq("pos", "val")))
    val cent = pe.groupBy("label", "pos")
      .agg(
        sum(expr("CAST(floor(CAST(val AS DOUBLE) * 1048576.0) AS BIGINT)"))
          .as("sq"),
        count(lit(1)).as("n"))
      .withColumn("c",
        expr("CAST(sq AS DOUBLE) / 1048576.0 / CAST(n AS DOUBLE)"))
    // The one remaining collect_list assembles the centroid VECTOR per
    // label: exactly `dim` (=64) elements per group, bounded by the
    // embedding dimensionality — not by row count — so it is safe at any
    // data scale (unlike the per-(label,pos) row fold removed above).
    val carr = cent.groupBy("label")
      .agg(expr("transform(sort_array(collect_list(struct(pos, c))), x -> x.c)")
        .as("cvec"))
    val q = emb.orderBy("vec_id").limit(1).select(
      col("vec_id").as("q_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qe"))
    val probe = carr.crossJoin(broadcast(q))
      .withColumn("cq", expr("graft_cos(cvec, qe)"))
      .orderBy(col("cq").desc, col("label"))
      .limit(1)
      .select(col("label").as("best_label"), col("q_id"), col("qe"))
    emb.join(broadcast(probe), col("label") === col("best_label"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim",
        expr("graft_cos(transform(embedding, x -> CAST(x AS DOUBLE)), qe)"))
      .select("vec_id", "label", "cos_sim")
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(kTop)
  }

  def knnIvfSql(kTop: Int = 10): String = {
    def fold(n: String, body: String) =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(range(1, $n + 1), i -> $body)), (acc, v) -> acc + v)"""
    s"""WITH pe AS (
          SELECT label, vec_id, i - 1 AS pos, embedding[i] AS val
          FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
        cent AS (
          SELECT label, pos,
                 CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * 1048576.0)
                               AS BIGINT)) AS DOUBLE)
                   / 1048576.0 / CAST(COUNT(*) AS DOUBLE) AS c
          FROM pe GROUP BY label, pos),
        carr AS (SELECT label, list(c ORDER BY pos) AS cvec FROM cent GROUP BY label),
        q AS (SELECT vec_id AS q_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
              FROM embeddings ORDER BY vec_id LIMIT 1),
        probe AS (
          SELECT label AS best_label, q_id, qe,
                 ${fold("len(cvec)", "cvec[i] * qe[i]")}
                 / (sqrt(${fold("len(cvec)", "cvec[i] * cvec[i]")})
                  * sqrt(${fold("len(qe)", "qe[i] * qe[i]")})) AS cq
          FROM carr, q ORDER BY cq DESC, label LIMIT 1)
        SELECT e.vec_id, e.label,
               ${fold("len(e.embedding)", "CAST(e.embedding[i] AS DOUBLE) * qe[i]")}
               / (sqrt(${fold("len(e.embedding)",
                 "CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)")})
                * sqrt(${fold("len(qe)", "qe[i] * qe[i]")})) AS cos_sim
        FROM embeddings e, probe
        WHERE e.label = best_label AND e.vec_id <> q_id
        ORDER BY cos_sim DESC, e.vec_id LIMIT $kTop"""
  }

  /** x11: distributed k-means (Lloyd's algorithm), the operator that TRAINS
    * the coarse quantizer x04 only consumes (x04's cells are the `label`
    * column stand-in; this builds real cells from the vectors). `iters`
    * Lloyd rounds from the deterministic seed assignment `vec_id % k`,
    * returning per-cluster sizes and the quantized inertia (sum of squared
    * distances to the assigned centroid).
    *
    * Scale design — the textbook distributed Lloyd shape:
    *   - ASSIGNMENT is map-side only: the k×dim centroid table is collected
    *     into ONE broadcast row (`cents`, an array of (cluster, cvec)
    *     structs — bounded by k·dim, never by data) and the argmin is a
    *     per-row SQL fold over it. No shuffle of the corpus, ever.
    *   - CENTROID RECOMPUTE is one partial-agg'd exchange per round:
    *     posexplode → groupBy(cluster, pos) sums are map-side combined, so
    *     the shuffle carries ≤ k·dim rows per input partition (NOT n·dim).
    *   - DETERMINISM uses the x04 discipline end-to-end: centroid means are
    *     floor-quantized BIGINT sums (order-free, partition-stable, no
    *     per-group arrays), distances are the graft_l2/duckD2 sequential
    *     fold (bit-identical doubles in both engines), argmin tie-breaks on
    *     the lowest cluster id (the fold scans `cents` in cluster order and
    *     replaces only on strict `<`), and the final inertia sum is again a
    *     quantized BIGINT sum. The whole 2-round pipeline is hash-stable
    *     under any partitioning at any scale.
    */
  def kmeansSummary(emb: DataFrame, kDefault: Int = 8,
      iters: Int = 2): DataFrame =
    summarize(emb, kDefault, iters, _ => SeedMode.Modulo)

  /** x15: the summary under the PRODUCTION initializer (farthest-point
    * seeding, [[farthestPointSeeds]]) — x11's `vec_id % k` seed stays the
    * declared baseline contract; this mode is what a real deployment runs.
    */
  def kmeansSummaryPP(emb: DataFrame, kDefault: Int = 8,
      iters: Int = 2): DataFrame =
    summarize(emb, kDefault, iters, k => SeedMode.fromPp(pp = true, k))

  /** x30: the summary under k-means|| seeding ([[parallelSeeds]]) at the
    * declared small-k contract — the hash gate that pins the SCALABLE
    * initializer's every stage (sampling rounds, weighting, candidate
    * Lloyd) against the fully unrolled oracle. Explicit mode: at k=8 the
    * pp flag would route to farthest-point; this query IS the parallel
    * seeder's gate.
    */
  def kmeansSummaryParallel(emb: DataFrame, kDefault: Int = 8,
      iters: Int = 2): DataFrame =
    summarize(emb, kDefault, iters, _ => SeedMode.Parallel)

  /** x32: the summary under the RECURSED k-means|| recluster (the
    * above-ReclusterMaxK arm forced at an oracle-unrollable k) — the hash
    * gate that pins the distributed recluster's every stage (weight-ranked
    * seeding, broadcast assignment, quantized weighted Lloyd) against the
    * fully unrolled DuckDB twin, x30's discipline for the path that runs
    * when auto-k crosses the threshold. Default k = 24: above PpMaxK (so
    * the summary is a genuinely parallel-seeded one) and 3× the x30
    * default (a non-trivial seed count), while the oracle's sampling CTEs
    * stay cheap.
    */
  def kmeansSummaryParallelRecursed(emb: DataFrame, kDefault: Int = 24,
      iters: Int = 2): DataFrame =
    summarize(emb, kDefault, iters, _ => SeedMode.ParallelRecursed)

  private def summarize(emb: DataFrame, kDefault: Int, iters: Int,
      mode: Int => SeedMode): DataFrame = {
    // Same cell-count resolution as d17/x12 (numeric conf wins, `auto`
    // derives from a corpus count): x11 trains the quantizer the other two
    // consume, so a knob the trainer ignored would silently fork the cells.
    val k = graft.ext.Dedup.resolveCells(emb, kDefault)
    import org.apache.spark.sql.expressions.Window
    kmeansAssignMode(emb, k, iters, mode(k)).groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"),
        (sum(expr("CAST(floor(dd * 67108864.0) AS BIGINT)")).cast("double")
          / 67108864.0).as("inertia"))
      // Empty cells were silently OMITTED (graft_centroids skips them and
      // no row appears here) — round-9 advice: make them loud. The count
      // rides every row as a constant column; the window is over the ≤ k
      // summary rows, not the corpus.
      .withColumn("n_empty_cells",
        (lit(k) - count(lit(1)).over(Window.partitionBy())).cast("long"))
  }

  /** The per-vector assignment after `iters` Lloyd rounds:
    * (vec_id, e double-array, cluster, dd squared-L2 to the assigned
    * centroid). kmeansSummary's per-cluster rollup and d17's semantic-dedup
    * blocking both consume this.
    */
  def kmeansAssign(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame =
    kmeansAssignSeeded(emb, k, iters, pp = false)

  /** pp requests resolve through [[SeedMode.fromPp]]: farthest-point at the
    * declared small-k contract, k-means|| above ParSeed.PpMaxK — which is
    * the auto-k wiring (round-13 verdict item 1): every production family
    * that trains pp-seeded (Serve.Pp, the IVF-PQ surface) now gets the
    * O(Rounds)-pass initializer the moment its cell count goes auto,
    * instead of k−1 sequential corpus passes.
    */
  def kmeansAssignSeeded(emb: DataFrame, k: Int, iters: Int,
      pp: Boolean): DataFrame =
    kmeansAssignMode(emb, k, iters, SeedMode.fromPp(pp, k))

  /** The shared assignment-work bound: a corpus pass is CPU-bound kernel
    * work ∝ bytes·k, and below this much of it a repartition's exchange
    * costs more than the parallelism buys (calibrated so the k=8
    * declared default triggers exactly where round-15's 32 MiB byte bar
    * did). Shared by the batch floor below and the streaming serve floor
    * (StreamingQ.streamAssignFloor) so the two scale rules can't drift.
    */
  private[graft] val AssignFloorWork: BigInt = BigInt(32L << 20) * 8

  private[graft] def kmeansAssignMode(emb: DataFrame, k: Int, iters: Int,
      mode: SeedMode): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val e0 = emb.select(col("vec_id"),
      expr("transform(embedding, ex -> CAST(ex AS DOUBLE))").as("e"))
    // The non-modulo seeders issue extra corpus passes (farthest-point:
    // k−1 TakeOrdered jobs; k-means||: Rounds+1 broadcast passes); without
    // the retain each pass would re-scan parquet and re-cast. The
    // modulo-seed path keeps e0 unretained: its ~iters+1 reads don't
    // justify a corpus-sized cache entry (the round-10 review's x15
    // finding).
    //
    // Parallelization floor (round 15): those passes are broadcast MAP
    // passes, so their parallelism is the SCAN's split count — a
    // single-row-group parquet corpus (the testdata layout; any
    // pathologically coarse lake layout at scale) serializes EVERY pass
    // onto one task no matter how many cores the session has (measured:
    // the k=16384 k-means|| build sat at 1/32 cores for its whole
    // sampling phase). One corpus repartition up to the session
    // parallelism, paid once and amortized across all Rounds+Iters+1
    // passes via the retain, fixes the floor; the guard keeps it a no-op
    // on a well-split corpus (splits >= cores — every real cluster
    // layout), so no shuffle is added where none is needed. Values are
    // unchanged by construction: every downstream stage is order-free
    // (the partition-stability specs pin exactly this).
    // Two guards: splits < cores (a well-split corpus never repartitions)
    // AND enough per-pass WORK to amortize the exchange. Round 18 re-drew
    // the work bound: the round-15 guard was bytes ≥ 32 MiB, a pure-IO
    // proxy — but a seeding pass is CPU-bound kernel work ∝ bytes·k
    // (each row scans O(k) candidates), so a 30 MB corpus at auto-k=782
    // sat under the byte bar while carrying ~800× the flops the bar was
    // calibrated for. Measured at the sf10-auto checkpoint: the ENTIRE
    // k-means|| chain ran on ONE task (the parquet file is a single
    // 30 MB split) and x15 cost 322 s where the same passes run ~32-way
    // in seconds. The bound is now bytes·k ≥ 32 MiB·8 (identical trigger
    // to round-15's at the k=8 declared default, so every measured small
    // point is unchanged; any auto-k corpus crosses it at ~0.3 MB): at
    // the boundary a pass is ~1 GFLOP single-task, where the one-time
    // exchange (~0.1-0.3 s) pays for itself in the first pass.
    // Split count via the file-index estimate (Tables.estimatedSplits),
    // NOT e0.rdd.getNumPartitions — .rdd compiles the physical plan once
    // per BUILD (round-15 advice item 5). estimate 0 = no file relation
    // (unknown layout) → leave it alone, same as the well-split case.
    // Round 18: the floor now covers Modulo too — modulo's iters+1 assign
    // passes carry the SAME bytes·k kernel work (x11 at sf10-auto: 18.7 s
    // single-task where the bound-triggered repartition runs them 32-way).
    // Modulo stays unretained (the round-10 contract), so each of its ~3
    // passes re-pays the exchange — ~0.3 s each on a 30 MB corpus, noise
    // against the 10-30× kernel win, and below the bound nothing changes.
    val floored = {
      val par = emb.sparkSession.sparkContext.defaultParallelism
      val bytes = emb.queryExecution.optimizedPlan.stats.sizeInBytes
      val splits = graft.sources.Tables.estimatedSplits(e0)
      if (bytes * k >= AssignFloorWork && splits > 0 && splits < par)
        e0.repartition(par)
      else e0
    }
    lloydOverMode(if (mode != SeedMode.Modulo)
      graft.util.Caches.retain(floored) else floored, k, iters, mode)
  }

  /** The Lloyd core over an arbitrary (vec_id, e: array<double>) relation —
    * [[kmeansAssignSeeded]] feeds it the embedding table; x16's second
    * level feeds it RESIDUALS. Same broadcast-assignment /
    * mergeable-accumulator / quantized-determinism shape regardless of
    * input.
    */
  private[graft] def lloydOver(e0: DataFrame, k: Int, iters: Int,
      pp: Boolean): DataFrame =
    lloydOverMode(e0, k, iters, SeedMode.fromPp(pp, k))

  private[graft] def lloydOverMode(e0: DataFrame, k: Int, iters: Int,
      mode: SeedMode): DataFrame = {
    graft.functions.GraftFunctions.register(e0.sparkSession)

    // (cluster, e) rows → a single broadcast row holding the sorted
    // array<struct<cluster,cvec>> centroid table, via the mergeable
    // graft_centroids accumulator (functions/CentroidSum.scala): one
    // bounded k·dim-long buffer per partition, merged at a single reducer —
    // ONE stage where the posexplode → groupBy(cluster,pos) →
    // groupBy(cluster) → collect chain was three, with the same quantized
    // BIGINT sums (order-free, bit-identical to the SQL twin).
    def centroidRow(assigned: DataFrame): DataFrame =
      assigned.agg(expr(s"graft_centroids(cluster, e, $k)").as("cents"))

    def assign(cents: DataFrame): DataFrame = {
      // array_min over (dd, cluster) structs IS the argmin with the
      // lowest-cluster tie-break (struct ordering is lexicographic); each
      // distance is ONE compiled graft_l2 call — the interpreted
      // aggregate()-fold argmin evaluated two interpreted SQL folds per candidate
      // and measured ~4× slower on this path.
      e0.crossJoin(broadcast(cents))
        .withColumn("best", expr(bestCellExpr))
        .select(col("vec_id"), col("e"),
          col("best.c").as("cluster"), col("best.dd").as("dd"))
    }

    val a0 = mode match {
      case SeedMode.Modulo =>
        e0.withColumn("cluster", pmod(col("vec_id"), lit(k)).cast("int"))
      case SeedMode.FarthestPoint => assign(farthestPointSeeds(e0, k))
      case SeedMode.Parallel => assign(parallelSeeds(e0, k))
      case SeedMode.ParallelRecursed =>
        assign(parallelSeedsWith(e0, k, recursed = true))
    }
    (1 to iters).foldLeft(a0: DataFrame)((a, _) => assign(centroidRow(a)))
  }

  /** The trained quantizer as a shippable ARTIFACT: the 1-row centroid
    * relation that PRODUCES kmeansAssign(emb, k, iters)'s assignment —
    * i.e. recomputed from the round-(iters−1) assignment, exactly the
    * table the final Lloyd round broadcast. This is what an offline
    * trainer hands an online server (s30): assigning a new vector against
    * it with the same argmin expression reproduces the batch cells
    * bit-for-bit.
    */
  def kmeansTrainedCentroids(emb: DataFrame, kDefault: Int = 8,
      iters: Int = 2, pp: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val k = graft.ext.Dedup.resolveCells(emb, kDefault)
    // `pp` must mirror the index build it serves (x28 trains pp-seeded;
    // a modulo-seeded artifact would assign different cells and the
    // re-encode≡stored-code contract below would silently break).
    // retainCheckpointed: this 1-row artifact is BROADCAST per consumer —
    // and a stream-static broadcast recomputes its subquery every
    // micro-batch, so without the checkpoint the pp seed chain (k−1
    // sequential corpus passes) re-trained PER BATCH once the round-13
    // defaults flipped (measured: s31 2.5 → 4.6 s; the artifact is what
    // an offline trainer SHIPS, so materializing it is also the honest
    // lifecycle shape).
    graft.util.Caches.retainCheckpointed(
      kmeansAssignSeeded(emb, k, iters - 1, pp)
        .agg(expr(s"graft_centroids(cluster, e, $k)").as("cents")))
  }

  /** The argmin-cell SQL expression [[kmeansAssignSeeded]]'s assign step
    * and s30's streaming assignment share — ONE definition so the offline
    * and online cell of a vector can never drift.
    *
    * Round 13: compiled kernel (same HOF-to-Expression move as
    * adcTermExpr — VecOps.bestCellD documents the bit-identity: d2D fold
    * per centroid, (dd, cluster)-lexicographic min). The Lloyd assignment
    * evaluated the lambda interpreted with one struct allocation per
    * centroid per row per round — at auto-k that is ~n²/256 allocations.
    */
  val bestCellExpr: String = "graft_best_cell(e, cents)"

  /** Deterministic farthest-point seeding — the k-means++ shape with D²
    * SAMPLING replaced by argmax (the classic k-center greedy, a provable
    * 2-approximation and the standard derandomization): c0 = the lowest
    * vec_id's vector; c_j = the vector farthest from its nearest chosen
    * center (tie-break lowest vec_id). No RNG, no stored model — fully
    * reproducible and oracle-expressible, unlike seeded sampling whose RNG
    * stream no two engines share. Fixes the `vec_id % k` baseline's
    * textbook-worst-case behavior on adversarial corpora (all seeds can
    * land in one clump; farthest-point seeds by construction spread).
    *
    * Shape: k−1 corpus passes, each a broadcast of the ≤ k chosen vectors
    * + a map-side min-distance + TakeOrdered(1) — no shuffle of the corpus
    * ever; the passes read e0 (retained by callers at the corpus level).
    * Returns the 1-row `cents` relation [[kmeansAssignSeeded]]'s assign()
    * consumes.
    */
  private def farthestPointSeeds(e0: DataFrame, k: Int): DataFrame = {
    val c0 = e0.orderBy("vec_id").limit(1).select(col("e").as("c0"))
    val chosen = (1 until k).foldLeft(c0) { (prev, j) =>
      val dists = (0 until j).map(i => expr(s"graft_l2(e, c$i)"))
      val md = if (dists.size == 1) dists.head else least(dists: _*)
      e0.crossJoin(broadcast(prev))
        .withColumn("md", md)
        .orderBy(col("md").desc, col("vec_id"))
        .limit(1)
        .select((0 until j).map(i => col(s"c$i")) :+ col("e").as(s"c$j"): _*)
    }
    chosen.select(array((0 until k).map(j =>
      struct(lit(j).as("cluster"), col(s"c$j").as("cvec"))): _*).as("cents"))
  }

  /** Fixed k-means|| geometry — ONE definition shared by the engine seeder,
    * the oracle CTE generator, and the pp-mode routing rule, so the three
    * can never desynchronize (the Serve-object discipline).
    */
  private[graft] object ParSeed {
    /** Candidate-sampling passes. Bahmani et al. prove O(log φ) rounds
      * suffice; a FIXED small constant keeps the chain oracle-unrollable
      * and is the published practical choice (≈5 rounds at ℓ=2k; 3 is
      * plenty at ℓ=2k for the planted/test geometries, gated by x30).
      */
    val Rounds = 3
    /** Weighted Lloyd rounds over the ≤ 1+Rounds·ℓ candidate rows. */
    val Iters = 2
    /** Per-round expected oversampling is ℓ = OversampleX · k. */
    val OversampleX = 2
    /** pp-mode routing: farthest-point (k−1 sequential corpus passes) IS
      * the declared small-k contract — x15/x21/x24/Serve all gate at k=8 —
      * but above this bound the same request routes to k-means||, whose
      * pass count is independent of k. This is what makes `auto` cell
      * counts (k ≈ n/256) safe to combine with production seeding: at
      * auto-k, farthest-point would be O(n) sequential Spark jobs.
      */
    val PpMaxK = 16
    /** Above this k the Bahmani step-3 recluster RECURSES through the
      * distributed weighted-Lloyd shape instead of the driver-local greedy
      * (see [[Similarity.reclusterDistributed]]) — closing the round-14
      * declared driver-flops bound (greedy is O(k·|C|·dim) driver
      * arithmetic; measured on the sf10 corpus: 64 s of warm wall at
      * k=4096, infeasible at 16384).
      *
      * The default is 256 — deliberately equal to
      * [[Similarity.MaxUnrolledSeedK]], the k-step-unrolled ORACLE
      * feasibility bound — so every conf-numeric k keeps a runnable gate:
      * at k ≤ 256 the greedy engine arm pairs with the greedy unrolled
      * twin; above, the recursed arm pairs with its polynomial twin.
      * Measured crossover justifies the low default (sf10, 200k vecs,
      * warm min-of-2, BASELINE.md round-15): recursed beats greedy at
      * EVERY k ≥ 256 (1.6 vs 4.5 s at 256, 3.5 vs 15.8 at 1024, 10.4 vs
      * 74.1 at 4096) with equal quality (k=1024 inertia 165898 vs
      * 165974, zero empty cells both). Conf [[ReclusterMaxKKey]]
      * overrides (specs force it to pin routing; raising it above 256
      * reopens the poisoned-oracle window (256, threshold] — loud, by
      * the unrolledSeedGuard).
      */
    val ReclusterMaxKDefault = 256
    val ReclusterMaxKKey = "spark.graft.ann.reclusterMaxK"
  }

  /** The recluster routing threshold — engine side reads the LIVE session
    * conf at plan build; [[parallelSeedCtes]] resolves the SAME knob at
    * generation time (Dedup.confInt), the d17 conf-agreement discipline.
    */
  private[graft] def reclusterMaxK(spark: SparkSession): Int = {
    val v = spark.conf.get(ParSeed.ReclusterMaxKKey,
      ParSeed.ReclusterMaxKDefault.toString).toInt
    require(v >= 1, s"${ParSeed.ReclusterMaxKKey}=$v out of range (>= 1)")
    v
  }

  /** How a seeding request resolves to an initializer. Public APIs keep the
    * 2-valued `pp` flag (declared contracts pin its meaning at small k);
    * the 3rd member is reachable explicitly (x30) or via the PpMaxK route.
    */
  private[graft] sealed trait SeedMode
  private[graft] object SeedMode {
    case object Modulo extends SeedMode
    case object FarthestPoint extends SeedMode
    case object Parallel extends SeedMode
    /** k-means|| with the recluster FORCED through the distributed arm
      * regardless of the ReclusterMaxK threshold — the x32 gate's mode
      * (above-threshold semantics at an oracle-unrollable k). Production
      * requests never name it: Parallel self-routes on the threshold.
      */
    case object ParallelRecursed extends SeedMode
    def fromPp(pp: Boolean, k: Int): SeedMode =
      if (!pp) Modulo
      else if (k <= ParSeed.PpMaxK) FarthestPoint
      else Parallel
  }

  /** Oracle-side mirror of [[SeedMode.fromPp]] — EVERY pp-seeded oracle
    * generator routes through this, never through ppSeedCtes directly
    * (round-14 advice: with the kmeansCells knob set to a numeric k >
    * ParSeed.PpMaxK, the engine's pp request resolves to k-means|| while a
    * generator that hardcodes ppSeedCtes would still emit the
    * farthest-point chain — a spurious hash mismatch on a supported gate
    * configuration). One definition, so the engine routing rule and the
    * oracle routing rule can never desynchronize.
    */
  def seedCtesFromPp(pp: Boolean, k: Int): Option[String] =
    SeedMode.fromPp(pp, k) match {
      case SeedMode.Modulo => None
      case SeedMode.FarthestPoint => Some(ppSeedCtes(k))
      // fromPp never returns ParallelRecursed (a gate-only mode), and
      // parallelSeedCtes self-routes the recluster arm on the same conf
      // threshold parallelSeeds reads — so Parallel covers both arms here.
      case _ => Some(parallelSeedCtes(k))
    }

  /** The deterministic per-(vec_id, round) uniform in [0,1) that replaces
    * k-means||'s RNG draw (the q68/p09 no-RNG discipline: membership must
    * be a pure function both engines evaluate bit-identically — no two
    * engines share an RNG stream). Integer mix: fold the id and round
    * through the portable-hash modulus, then one multiplicative spread
    * (2654435761 = Knuth's 2^32/φ constant; consecutive ids land ~0.287
    * apart mod 1 — low-discrepancy, which for threshold sampling is
    * exactly what's wanted). All arithmetic stays < 2^63: the pre-multiply
    * value is < P ≈ 1e9, so h·2654435761 < 2.7e18.
    */
  private def u01Sql(r: Int): String = {
    val P = graft.ext.PortableHash.P
    s"(CAST(((((vec_id % $P) * 31 + $r) % $P) * 2654435761 % $P) AS DOUBLE)" +
      s" / $P)"
  }

  /** Deterministic k-means|| seeding (Bahmani et al., "Scalable k-means++",
    * VLDB 2012) — the SCALABLE production initializer: ParSeed.Rounds corpus
    * passes (a constant, independent of k) each admitting every point with
    * probability min(1, ℓ·d²(x,C)/φ) in PARALLEL, then a weighted Lloyd
    * re-cluster of the tiny candidate set down to k centers. Replaces
    * [[farthestPointSeeds]]' k−1 sequential passes above ParSeed.PpMaxK
    * (the round-13 verdict's last sequential-barrier design): at auto-k
    * (k ≈ n/256) farthest-point is O(n) sequential Spark jobs; this is
    * O(Rounds + Iters) jobs at ANY k, every one a broadcast map-side pass
    * over the corpus — no corpus shuffle anywhere.
    *
    * Determinism (hash-gated by x30 against the fully unrolled DuckDB
    * twin [[parallelSeedCtes]]):
    *   - the RNG draw is [[u01Sql]] — a pure (vec_id, round) function;
    *   - d²(x,C) is the compiled graft_best_cell min (value = MIN of
    *     bit-portable d2 folds, order-free);
    *   - φ is the floor-quantized BIGINT cost sum (order-free);
    *   - candidate ids are the rank by vec_id; weights are corpus argmin
    *     counts with the (dd, id) tie-break; the candidate Lloyd uses
    *     weighted floor-quantized component sums. Zero-weight candidates
    *     drop before the Lloyd (they carry no corpus mass, and keeping
    *     them could form weight-0 clusters whose mean is 0/0).
    *
    * Returns the 1-row `cents` relation (array<struct<cluster, cvec>>,
    * cluster ∈ [0, k), possibly missing ids where a candidate-Lloyd cell
    * emptied) that [[lloydOver]]'s assign step consumes — the same shape
    * [[farthestPointSeeds]] returns.
    */
  private[graft] def parallelSeeds(e0: DataFrame, k: Int): DataFrame =
    parallelSeedsWith(e0, k, k > reclusterMaxK(e0.sparkSession))

  /** Explicit-routing entry: `recursed` forces the recluster arm
    * independent of the conf threshold — the x32 gate and the
    * local-≡-recursed spec pin the above-threshold path at a k small
    * enough for the unrolled DuckDB twin / reference arithmetic.
    */
  private[graft] def parallelSeedsWith(e0: DataFrame, k: Int,
      recursed: Boolean): DataFrame = {
    graft.functions.GraftFunctions.register(e0.sparkSession)
    val ell = (ParSeed.OversampleX * k).toDouble
    // c0 = the lowest vec_id's vector — the same deterministic anchor
    // farthest-point uses (Bahmani picks it uniformly; any fixed choice
    // satisfies the proof's requirements).
    val c0 = e0.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
    // Each round's candidate relation is a tiny (≤ 1+r·ℓ rows) eager
    // checkpoint: without it, round r's plan embeds round r−1's TWICE
    // (once under the cents array, once under φ), doubling the corpus
    // passes per round — the checkpoint makes each round exactly one
    // corpus pass, read from the caller's retained e0 cache.
    val cands = (1 to ParSeed.Rounds).foldLeft(
      graft.util.Caches.retainCheckpointed(c0)) { (prev, r) =>
      // cluster ids are irrelevant for the min-distance (only `.dd` is
      // consumed), so the collect_list order inside the 1-row array
      // doesn't matter here.
      val centsArr = prev.agg(collect_list(struct(lit(0).as("cluster"),
        col("ce").as("cvec"))).as("cents"))
      val scored = e0.crossJoin(broadcast(centsArr))
        .withColumn("dd", expr(s"$bestCellExpr.dd"))
      val phi = scored.agg((sum(expr(
        "CAST(floor(dd * 67108864.0) AS BIGINT)")).cast("double")
        / 67108864.0).as("phi"))
      // phi = 0 with some dd > 0 is reachable (every floor(dd·2^26) term
      // quantizes to 0 on a near-degenerate corpus); ℓ·dd/0.0 is IEEE ∞ on
      // the Spark side but DuckDB's x/0 depends on its float-ops setting —
      // so the degenerate case is admitted EXPLICITLY (admit-all: the
      // paper's threshold min(1, ℓ·dd/φ) → 1 as φ → 0⁺) before any
      // division, identically here and in [[parallelSeedCtes]].
      val fresh = scored.crossJoin(broadcast(phi))
        .filter(col("dd") > 0 && // dd=0 ⇔ already a candidate: never re-admit
          (col("phi") === 0.0 || expr(u01Sql(r)) <
            least(lit(1.0), lit(ell) * col("dd") / col("phi"))))
        .select(col("vec_id").as("cid"), col("e").as("ce"))
      graft.util.Caches.retainCheckpointed(prev.union(fresh))
    }
    // Candidate id = rank by vec_id (0-based INT): the portable id both
    // engines derive identically; the single-partition window is over the
    // ≤ 1+Rounds·ℓ candidate rows, never the corpus.
    val rw = org.apache.spark.sql.expressions.Window.orderBy("cid")
    val ranked = cands
      .withColumn("rn", (row_number().over(rw) - 1).cast("int"))
    val rArr = ranked.agg(expr("array_sort(collect_list(" +
      "named_struct('cluster', rn, 'cvec', ce)))").as("cents"))
    // weight(c) = |{x : c = argmin_(dd, id) d²(x, C)}| — one corpus pass.
    val weights = e0.crossJoin(broadcast(rArr))
      .select(expr(s"$bestCellExpr.c").as("rn"))
      .groupBy("rn").agg(count(lit(1)).as("w"))
    // --- Bahmani step 3: re-cluster the candidate set down to k centers.
    // Two implementations of the recluster, routed on k (ONE rule, mirrored
    // bit-for-bit by [[parallelSeedCtes]]' generation-time routing):
    //   k ≤ ReclusterMaxK — the paper's own prescription ("since |C| is
    //     small, it can be reclustered on one machine"): driver-local
    //     greedy k-center seeding + weighted Lloyd over the O(k) candidate
    //     rows. The greedy step is O(k·|C|·dim) ≈ 2·OversampleX·dim·k²
    //     local flops — ~0.4 GFLOP at k=4096 (sub-second; the default
    //     threshold is ReclusterMaxKDefault=256, chosen at the measured
    //     crossover), but ~100 GFLOP at the 65536 resolveCells ceiling
    //     (~a minute of driver time): the round-14 declared bound.
    //   k > ReclusterMaxK — the recursion that closes that bound (round-15
    //     verdict item 1): the recluster runs through the DISTRIBUTED
    //     weighted-Lloyd shape instead — weight-ranked seeding (a sort,
    //     not k sequential greedy steps) + Iters broadcast-assign /
    //     quantized-recompute rounds over the candidate RELATION, never
    //     collected. O(Rounds + Iters) jobs at any k; the driver holds
    //     only 1-row centroid artifacts. See [[reclusterDistributed]].
    if (recursed) reclusterDistributed(ranked, weights, k)
    else reclusterGreedyLocal(ranked, weights, k, e0.sparkSession)
  }

  /** The below-threshold recluster: collect the O(k)-row candidate set
    * (METADATA, not data — the resolveCells discipline: a deliberate,
    * bounded plan-build-time action) and run greedy k-center + weighted
    * Lloyd as driver-local arithmetic — k sequential greedy STEPS as
    * microseconds of flops instead of k−1 sequential Spark JOBS (the exact
    * barrier this seeder exists to remove). Every local operation mirrors
    * the oracle CTEs bit-for-bit: d² is the same sequential
    * subtract-square-accumulate fold as VecOps.d2D/duckD2, argmax/argmin
    * tie-breaks are (value, rank/cluster) lexicographic via strict
    * comparison over ascending scan order, and the weighted means use the
    * same floor-quantized BIGINT sums.
    */
  private def reclusterGreedyLocal(ranked: DataFrame, weights: DataFrame,
      k: Int, spark: SparkSession): DataFrame = {
    val local = ranked.join(weights, Seq("rn")) // inner: drops weight-0 cands
      .select(col("rn"), col("ce"), col("w"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getLong(2)))
      .sortBy(_._1)
    val nC = local.length
    require(nC >= 1, "k-means|| sampling produced no candidates")
    require(nC <= 8 * (ParSeed.OversampleX * k * ParSeed.Rounds + 1),
      s"k-means|| candidate set exploded: $nC rows for k=$k — geometry " +
        "violates the ℓ-per-round admission bound; refusing a driver-side " +
        "recluster of unbounded size")
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    // Greedy k-center over candidates: c0 = rank 0 (the corpus anchor —
    // the lowest vec_id is always candidate rank 0, weight ≥ 1); c_j =
    // argmax min-distance-to-chosen, (md DESC, rn ASC) tie-break. Chosen
    // candidates have md = 0, so duplicates appear only in the k > |C|
    // degenerate case — the same semantics the pp chain has.
    val seedIdx = scala.collection.mutable.ArrayBuffer(0)
    val minD = Array.fill(nC)(Double.PositiveInfinity)
    for (_ <- 1 until k) {
      var i = 0
      while (i < nC) {
        val d = d2(local(i)._2, local(seedIdx.last)._2)
        if (d < minD(i)) minD(i) = d
        i += 1
      }
      var best = 0; var bestMd = minD(0)
      i = 1
      while (i < nC) { // strict > keeps the lowest rank on ties
        if (minD(i) > bestMd) { best = i; bestMd = minD(i) }
        i += 1
      }
      seedIdx += best
    }
    // Weighted Lloyd over the candidates: assign to the greedy seeds, then
    // Iters × (quantized weighted-centroid recompute → reassign); the
    // output is the recompute the last reassignment consumed (the
    // kmeansTrainedCentroids convention).
    def assignLocal(cs: Array[(Int, Array[Double])]): Array[Int] =
      local.map { case (_, ce, _) =>
        var bc = cs(0)._1; var bd = d2(ce, cs(0)._2)
        var c = 1
        while (c < cs.length) { // strict < keeps the lowest cluster on ties
          val d = d2(ce, cs(c)._2)
          if (d < bd) { bd = d; bc = cs(c)._1 }
          c += 1
        }
        bc
      }
    def recompute(asn: Array[Int]): Array[(Int, Array[Double])] = {
      val dim = local(0)._2.length
      val sums = scala.collection.mutable.SortedMap.empty[Int,
        (Array[Long], Long)]
      local.indices.foreach { i =>
        val (_, ce, w) = local(i)
        val (vs, w0) = sums.getOrElse(asn(i), (new Array[Long](dim), 0L))
        var j = 0
        while (j < dim) {
          vs(j) += math.floor(ce(j) * 1048576.0).toLong * w; j += 1
        }
        sums(asn(i)) = (vs, w0 + w)
      }
      sums.iterator.map { case (cl, (vs, w)) =>
        cl -> vs.map(v => v.toDouble / 1048576.0 / w.toDouble)
      }.toArray
    }
    var cs: Array[(Int, Array[Double])] =
      seedIdx.toArray.zipWithIndex.map { case (idx, j) => (j, local(idx)._2) }
    var asn = assignLocal(cs)
    for (i <- 1 to ParSeed.Iters) {
      cs = recompute(asn)
      if (i < ParSeed.Iters) asn = assignLocal(cs)
    }
    // Re-enter the plan as a literal relation → the same 1-row cents array
    // shape farthestPointSeeds returns (what an offline trainer ships).
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cluster",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cvec",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false),
        nullable = false)))
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(cs.map(c =>
        org.apache.spark.sql.Row(c._1, c._2.toSeq)): _*)
    spark.createDataFrame(rows, schema)
      .agg(expr("array_sort(collect_list(" +
        "named_struct('cluster', cluster, 'cvec', cvec)))").as("cents"))
  }

  /** The above-threshold recluster (round-15 verdict item 1 — the
    * recursion the round-14 DECLARED BOUND named): re-cluster the
    * candidate set down to k centers WITHOUT collecting it, so no driver
    * flops/row ceiling exists at any k the 65536 cents-broadcast ceiling
    * admits.
    *
    * Greedy k-center seeding is inherently k sequential steps — driver
    * O(k²·dim) flops or k distributed barriers, both the thing being
    * removed — so above the threshold the seeding RULE changes to a
    * parallel one: the k heaviest candidates by corpus mass, (w DESC,
    * rn ASC) tie-break, cluster id = 0-based rank in that order. Heavy
    * candidates are where the D²-oversampled mass concentrated, and the
    * Iters weighted-Lloyd rounds that follow are the same correction the
    * greedy path applies. The Lloyd arithmetic is IDENTICAL to the local
    * path's (quantized BIGINT weighted sums, (dd, cluster)-lexicographic
    * argmin via the same compiled graft_best_cell fold), and the whole
    * chain is unrolled in [[parallelSeedRecursedCtes]] — polynomial-size
    * SQL (no k-step greedy chain), so this path is DuckDB-hash-gated at
    * k above the threshold (x32) exactly like the greedy path is at the
    * default (x30).
    *
    * Shape: the candidate relation (≤ 1+Rounds·ℓ rows) stays distributed;
    * seeding is one metadata-scale sort; each Lloyd round is one broadcast
    * assign + one posexplode/groupBy quantized recompute over candidate
    * rows — O(Iters) jobs, centroid artifacts (k·dim·8 B ≤ ~34 MB at the
    * 65536 ceiling) are the only driver-resident state.
    */
  private def reclusterDistributed(ranked: DataFrame, weights: DataFrame,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // swt = (rn, ce, w): candidates with their corpus-mass weights (inner
    // join drops weight-0 candidates — they carry no mass, and keeping
    // them could form weight-0 clusters whose mean is 0/0 — the same rule
    // as the local path). Checkpointed: it is read Iters+2 times below and
    // its lineage contains a corpus pass (the weights aggregation).
    val swt = graft.util.Caches.retainCheckpointed(
      ranked.join(weights, Seq("rn")).select("rn", "ce", "w"))
    // Weight-ranked seeds: the single-partition window is over the O(k)
    // candidate rows, never the corpus (the `ranked` discipline).
    val sw = Window.orderBy(col("w").desc, col("rn"))
    val seeds = swt
      .withColumn("cl", (row_number().over(sw) - 1).cast("int"))
      .filter(col("cl") < k)
    def centsOf(asn: DataFrame): DataFrame = asn
      .select(col("cl"), col("w"), posexplode(col("ce")).as(Seq("pos", "v")))
      .groupBy("cl", "pos")
      .agg((sum(expr("CAST(floor(v * 1048576.0) AS BIGINT) * w"))
        .cast("double") / 1048576.0 / sum(col("w")).cast("double")).as("c"))
      .groupBy("cl")
      .agg(expr("transform(array_sort(collect_list(" +
        "named_struct('p', pos, 'c', c))), s -> s.c)").as("cvec"))
      .agg(expr("array_sort(collect_list(" +
        "named_struct('cluster', cl, 'cvec', cvec)))").as("cents"))
    def assignW(cents: DataFrame): DataFrame = swt
      .crossJoin(broadcast(cents))
      .select(col("rn"), col("ce"), col("w"),
        expr("graft_best_cell(ce, cents).c").as("cl"))
    // Round 0's "recompute" is the seed selection itself (each seed is its
    // own 1-candidate cluster mean = itself — but expressed as the literal
    // seed vectors, matching the local path's seed-then-assign order).
    val seedCents = graft.util.Caches.retainCheckpointed(
      seeds.agg(expr("array_sort(collect_list(" +
        "named_struct('cluster', cl, 'cvec', ce)))").as("cents")))
    var asn = assignW(seedCents)
    var cents = seedCents
    for (i <- 1 to ParSeed.Iters) {
      cents = graft.util.Caches.retainCheckpointed(centsOf(asn))
      if (i < ParSeed.Iters) asn = assignW(cents)
    }
    cents
  }

  /** x12: IVF ANN over the LEARNED quantizer — the serving-side completion
    * of the x11 → x12 lifecycle (x04 is the same probe shape over the
    * `label` stand-in cells; this one trains its cells). The query's own
    * Lloyd assignment IS its nearest coarse cell, so the probe needs no
    * extra centroid pass: rank exact cosine inside that one cell
    * (nprobe=1, the x04 recall trade). The assignment relation is the SAME
    * retained checkpoint d17 blocks on (Caches.retainCheckpointed memoizes
    * by canonicalized plan), so an index-maintenance pipeline that
    * dedups and serves pays for training once. At 100 TB `cluster` becomes
    * a parquet partition column and the probe is partition pruning at the
    * source — the real IVF serving shape.
    */
  def knnIvfLearned(emb: DataFrame, kDefault: Int = 8, iters: Int = 2,
      kTop: Int = 10, pp: Boolean = false,
      mode: Option[SeedMode] = None): DataFrame = {
    // Honor the SAME cell-count knob d17 reads (graft.ext.Dedup
    // .KmeansCellsKey, incl. its `auto` derivation) — with a mismatched k
    // the two operators would each train and retain their own full-corpus
    // assignment, silently breaking the train-once contract documented
    // above.
    val k = graft.ext.Dedup.resolveCells(emb, kDefault)
    val assigned = graft.util.Caches.retainCheckpointed(
      kmeansAssignMode(emb, k, iters,
        mode.getOrElse(SeedMode.fromPp(pp, k)))
        .select(col("vec_id"), col("e"), col("cluster")))
    val q = assigned.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("q_id"), col("e").as("qe"),
        col("cluster").as("q_cell"))
    assigned.join(broadcast(q),
        col("cluster") === col("q_cell") && col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", expr("graft_cos(e, qe)"))
      .select("vec_id", "cluster", "cos_sim")
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(kTop)
  }

  def knnIvfLearnedSql(k: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, 8),
      iters: Int = 2, kTop: Int = 10): String =
    s"""WITH ${kmeansAssignCtes(k, iters)},
             q AS (SELECT vec_id AS q_id, e AS qe, cluster AS q_cell
                   FROM a$iters ORDER BY vec_id LIMIT 1)
        SELECT z.vec_id, z.cluster, ${duckCos("z.e", "qe")} AS cos_sim
        FROM a$iters z, q WHERE z.cluster = q_cell AND z.vec_id <> q_id
        ORDER BY cos_sim DESC, z.vec_id LIMIT $kTop"""

  /** Serving-index centroid CTEs recomputed FROM the final assignment
    * `a$iters` — what a real IVF index stores next to its cells; the
    * probe ranking needs the centroid table, which [[kmeansAssignCtes]]'s
    * last round consumed but did not keep. One more (pe, c, cv) round of
    * the same quantized-BIGINT discipline, ending in
    * `cvF(cluster, cvec)`.
    */
  def kmeansServeCentroidsCtes(iters: Int = 2, prefix: String = ""): String = {
    val p = prefix
    s"""${p}peF AS (SELECT cluster, i - 1 AS pos, e[i] AS val
                FROM ${p}a$iters, UNNEST(range(1, len(e) + 1)) AS t(i)),
        ${p}cF AS (SELECT cluster, pos,
                      CAST(SUM(CAST(floor(val * 1048576.0) AS BIGINT))
                           AS DOUBLE) / 1048576.0 / COUNT(*) AS c
               FROM ${p}peF GROUP BY 1, 2),
        ${p}cvF AS MATERIALIZED (SELECT cluster, list(c ORDER BY pos) AS cvec
                FROM ${p}cF GROUP BY 1)"""
  }

  /** x14: IVF ANN with nprobe > 1 — the recall/latency knob every real IVF
    * deployment turns (x12 is the nprobe=1 special case). The probe ranks
    * ALL cell centroids against the query by squared-L2 and scans the
    * `nprobe` nearest cells; the centroid table is recomputed from the
    * final assignment via ONE mergeable graft_centroids pass (the
    * serving-index artifact — k·dim bounded, broadcast-sized), so the
    * corpus still never hash-exchanges. At 100 TB the probed cells are
    * `nprobe` parquet partitions instead of one — cost grows linearly in
    * nprobe, recall monotonically (probed cell sets are supersets), which
    * is exactly the curve x13 measures.
    *
    * Determinism: centroid recompute is the quantized-BIGINT x11
    * discipline; probe ranking uses the bit-identical graft_l2/duckD2 fold
    * with (distance, cluster) tie-break; the in-cell ranking is x12's.
    */
  def knnIvfLearnedProbe(emb: DataFrame, kDefault: Int = 8, iters: Int = 2,
      nprobe: Int = 2, kTop: Int = 10, pp: Boolean = false,
      mode: Option[SeedMode] = None): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val k = graft.ext.Dedup.resolveCells(emb, kDefault)
    // Same retained checkpoint as x12/d17 (memoized by canonicalized
    // plan): train once, serve at any nprobe.
    val assigned = graft.util.Caches.retainCheckpointed(
      kmeansAssignMode(emb, k, iters,
        mode.getOrElse(SeedMode.fromPp(pp, k)))
        .select(col("vec_id"), col("e"), col("cluster")))
    val crows = assigned
      .agg(expr(s"graft_centroids(cluster, e, $k)").as("cents"))
      .select(explode(col("cents")).as("ct"))
      .select(col("ct.cluster").as("pcell"), col("ct.cvec").as("cvec"))
    val q = assigned.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val probed = crows.crossJoin(broadcast(q))
      .withColumn("dq", expr("graft_l2(cvec, qe)"))
      .orderBy(col("dq"), col("pcell")).limit(nprobe)
      .select(col("pcell"), col("q_id"), col("qe"))
    // nprobe rows broadcast; each corpus row matches at most one (cells
    // are distinct), so the join fans nothing out.
    assigned.join(broadcast(probed),
        col("cluster") === col("pcell") && col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", expr("graft_cos(e, qe)"))
      .select("vec_id", "cluster", "cos_sim")
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(kTop)
  }

  def knnIvfLearnedProbeSql(k: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, 8),
      iters: Int = 2, nprobe: Int = 2, kTop: Int = 10): String =
    s"""WITH ${kmeansAssignCtes(k, iters)},
             ${kmeansServeCentroidsCtes(iters)},
             q AS (SELECT vec_id AS q_id, e AS qe
                   FROM a$iters ORDER BY vec_id LIMIT 1),
             probe AS (SELECT cluster AS pcell FROM cvF, q
                       ORDER BY ${duckD2("cvec", "qe")}, cluster
                       LIMIT $nprobe)
        SELECT z.vec_id, z.cluster, ${duckCos("z.e", "qe")} AS cos_sim
        FROM a$iters z, q
        WHERE z.cluster IN (SELECT pcell FROM probe) AND z.vec_id <> q_id
        ORDER BY cos_sim DESC, z.vec_id LIMIT $kTop"""

  /** x16: TWO-LEVEL residual quantizer (the IVF-with-residual-codebook
    * shape) — the measured fix for the flat quantizer's crossover: at the
    * sf10 checkpoint, k=782 flat cells cost 118 s because the argmin
    * assignment is O(n·k·dim), dominating the pair/probe savings past
    * k ≈ 256 (BASELINE.md round-10 sweep). Two levels give k1·k2
    * effective cells for O(n·(k1+k2)·dim) assignment work: level 1 is
    * x11's Lloyd over the corpus; level 2 re-runs the SAME Lloyd core
    * over the RESIDUALS e − centroid1(cell), so fine cells refine where
    * the coarse quantizer was wrong, exactly the classic residual-VQ
    * recipe. A vector's cell is (c1, c2); search probes the query's own
    * (c1, c2) — at 100 TB the pair becomes a two-level partition key and
    * the probe prunes ~k1·k2× of the corpus for (k1+k2)-cost assignment.
    *
    * Determinism end-to-end: level-1 centroids are the quantized-BIGINT
    * serving table (the x14 artifact); residual subtraction is exact IEEE
    * per element (identical zip_with / list_transform op order in both
    * engines); level 2 repeats the unrolled-CTE oracle chain under a name
    * prefix. The level-1 assignment is the SAME retained cache
    * d17/x12/x14 share — one training pass feeds the whole family.
    */
  /** The two-level (vec_id, e, c1, c2) cell assignment x16's probe and
    * d19's dedup both consume — retained, so an index-maintenance
    * pipeline that dedups and serves over the two-level cells pays for
    * BOTH trainings once (the level-1 relation is additionally the same
    * cache d17/x12/x14 share).
    */
  def twoLevelCells(emb: DataFrame, k1Default: Int = 8, k2: Int = 8,
      iters: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val k1 = graft.ext.Dedup.resolveCells(emb, k1Default)
    val a1 = graft.util.Caches.retainCheckpointed(
      kmeansAssign(emb, k1, iters)
        .select(col("vec_id"), col("e"), col("cluster")))
    val c1rows = a1.agg(expr(s"graft_centroids(cluster, e, $k1)").as("cents"))
      .select(explode(col("cents")).as("ct"))
      .select(col("ct.cluster").as("rc"), col("ct.cvec").as("cv1"))
    val resid = a1.join(broadcast(c1rows), col("cluster") === col("rc"))
      .select(col("vec_id"), col("e"), col("cluster").as("c1"),
        expr("zip_with(e, cv1, (x, y) -> x - y)").as("r"))
    val fine = lloydOver(resid.select(col("vec_id"), col("r").as("e")),
        k2, iters, pp = false)
      .select(col("vec_id"), col("cluster").as("c2"))
    graft.util.Caches.retainCheckpointed(
      resid.select("vec_id", "e", "c1").join(fine, "vec_id"))
  }

  /** Oracle CTE block ending in `cells(vec_id, e, c1, c2)` — the twin of
    * [[twoLevelCells]], shared by x16/x17/d19/d20. `src` must expose
    * (vec_id, embedding), like [[kmeansAssignCtes]]'s.
    */
  def twoLevelCellsCtes(k1: Int, k2: Int, iters: Int,
      src: String = "embeddings"): String =
    s"""${kmeansAssignCtes(k1, iters, src = src)},
        ${kmeansServeCentroidsCtes(iters)},
        resid0 AS MATERIALIZED (SELECT z.vec_id, z.e, z.cluster AS c1,
                          list_transform(range(1, len(z.e) + 1),
                                         i -> z.e[i] - cvec[i]) AS r
                   FROM a$iters z JOIN cvF ON z.cluster = cvF.cluster),
        resid AS (SELECT vec_id, r AS embedding FROM resid0),
        ${kmeansAssignCtes(k2, iters, src = "resid", prefix = "f")},
        cells AS MATERIALIZED (SELECT r0.vec_id, r0.e, r0.c1, f.cluster AS c2
                  FROM resid0 r0 JOIN fa$iters f
                    ON r0.vec_id = f.vec_id)"""

  def knnIvfTwoLevel(emb: DataFrame, k1Default: Int = 8, k2: Int = 8,
      iters: Int = 2, kTop: Int = 10): DataFrame = {
    val cells = twoLevelCells(emb, k1Default, k2, iters)
    val q = cells.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("q_id"), col("e").as("qe"),
        col("c1").as("qc1"), col("c2").as("qc2"))
    cells.join(broadcast(q),
        col("c1") === col("qc1") && col("c2") === col("qc2") &&
          col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", expr("graft_cos(e, qe)"))
      .select("vec_id", "c1", "c2", "cos_sim")
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(kTop)
  }

  def knnIvfTwoLevelSql(k1: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, 8),
      k2: Int = 8, iters: Int = 2, kTop: Int = 10): String =
    s"""WITH ${twoLevelCellsCtes(k1, k2, iters)},
             q AS (SELECT vec_id AS q_id, e AS qe, c1 AS qc1, c2 AS qc2
                   FROM cells ORDER BY vec_id LIMIT 1)
        SELECT z.vec_id, z.c1, z.c2, ${duckCos("z.e", "qe")} AS cos_sim
        FROM cells z, q
        WHERE z.c1 = qc1 AND z.c2 = qc2 AND z.vec_id <> q_id
        ORDER BY cos_sim DESC, z.vec_id LIMIT $kTop"""

  /** x19: MULTI-PROBE search over the two-level index — the serving story
    * x16 lacked (its own gate x17 reads recall 0.0 at the single-(c1,c2)
    * probe: with k1·k2 = 64 effective cells the probed fraction is ~1.6%,
    * hopeless on a spread-out corpus). x14's nprobe pattern applied PER
    * LEVEL: rank all k1 coarse serving centroids against the query, probe
    * the p1 nearest; within EACH probed coarse cell, form the query's
    * residual against THAT cell's centroid (multi-probe must re-residualize
    * per cell — the residual the index stored is relative to the cell the
    * vector landed in), rank the k2 shared fine centroids in residual
    * space, probe the p2 nearest → p1·p2 (c1, c2) pairs scanned exactly.
    *
    * Scale: both centroid tables are broadcast-sized artifacts recomputed
    * from the SAME retained cells relation x16/d19 train (one training pass
    * serves the whole family); the probe set is p1·p2 rows broadcast; each
    * corpus row matches at most one pair, so the join fans nothing out. At
    * 100 TB (c1, c2) is a two-level partition key and the probe reads
    * p1·p2 of k1·k2 partitions — cost linear in p1·p2, recall monotone
    * (probed pair sets are supersets as p1/p2 grow), the x20 curve.
    *
    * Determinism: serving centroids are the quantized-BIGINT artifact;
    * per-level ranking is the bit-portable graft_l2/duckD2 fold with
    * (distance, cluster) tie-breaks; residuals are element-wise exact IEEE
    * subtraction; the per-coarse-cell fine top-p2 is a ROW_NUMBER window
    * over ≤ p1·k2 broadcast-sized rows in both engines.
    */
  def knnIvfTwoLevelProbe(emb: DataFrame, k1Default: Int = 8, k2: Int = 8,
      iters: Int = 2, p1: Int = 2, p2: Int = 2, kTop: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val k1 = graft.ext.Dedup.resolveCells(emb, k1Default)
    val cells = twoLevelCells(emb, k1Default, k2, iters)
    val q = cells.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    // Level-1 serving centroids from the cached cells relation — the same
    // (c1, e) multiset the level-1 assignment holds, so this is the x14
    // serving artifact without re-reading the corpus.
    val cv1 = cells.agg(expr(s"graft_centroids(c1, e, $k1)").as("cents"))
      .select(explode(col("cents")).as("ct"))
      .select(col("ct.cluster").as("rc1"), col("ct.cvec").as("cv1"))
    // Level-2 (residual-space) serving centroids: residuals recomputed
    // against cv1 exactly as training did, then one mergeable pass.
    val cv2 = cells.join(broadcast(cv1), col("c1") === col("rc1"))
      .select(col("c2"), expr("zip_with(e, cv1, (x, y) -> x - y)").as("r"))
      .agg(expr(s"graft_centroids(c2, r, $k2)").as("cents"))
      .select(explode(col("cents")).as("ct"))
      .select(col("ct.cluster").as("rc2"), col("ct.cvec").as("cv2"))
    val coarse = cv1.crossJoin(broadcast(q))
      .withColumn("dq1", expr("graft_l2(cv1, qe)"))
      .orderBy(col("dq1"), col("rc1")).limit(p1)
      .select(col("rc1").as("pc1"),
        expr("zip_with(qe, cv1, (x, y) -> x - y)").as("rqe"))
    // p1 × k2 rows — broadcast-scale; the per-coarse-cell top-p2 window
    // runs over that tiny relation, never corpus data.
    val fineRanked = coarse.crossJoin(broadcast(cv2))
      .withColumn("dq2", expr("graft_l2(rqe, cv2)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pc1").orderBy(col("dq2"), col("rc2"))
    val pairs = fineRanked
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= p2)
      .select(col("pc1"), col("rc2").as("pc2"))
    cells.join(broadcast(pairs),
        col("c1") === col("pc1") && col("c2") === col("pc2"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", expr("graft_cos(e, qe)"))
      .select("vec_id", "c1", "c2", "cos_sim")
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(kTop)
  }

  /** Shared probe CTEs for the two-level multi-probe oracle: assumes
    * `cells` + `cvF` + `fcvF` + `q(q_id, qe)` exist; ends in
    * `${pfx}fp(pc1, pc2)` — the p1·p2 probed pairs.
    */
  private def twoLevelProbeCtes(p1: Int, p2: Int, pfx: String = ""): String =
    s"""${pfx}cp AS (SELECT cluster AS pc1, cvec AS pcv1 FROM cvF, q
                ORDER BY ${duckD2("cvec", "qe")}, cluster LIMIT $p1),
        ${pfx}rq AS (SELECT pc1,
                        list_transform(range(1, len(qe) + 1),
                                       i -> qe[i] - pcv1[i]) AS rqe
                 FROM ${pfx}cp, q),
        ${pfx}fp AS (SELECT pc1, pc2 FROM (
                  SELECT r.pc1, f.cluster AS pc2,
                         ROW_NUMBER() OVER (PARTITION BY r.pc1
                           ORDER BY ${duckD2("r.rqe", "f.cvec")}, f.cluster)
                           AS rn
                  FROM ${pfx}rq r, fcvF f) WHERE rn <= $p2)"""

  def knnIvfTwoLevelProbeSql(k1: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, 8),
      k2: Int = 8, iters: Int = 2, p1: Int = 2, p2: Int = 2,
      kTop: Int = 10): String =
    s"""WITH ${twoLevelCellsCtes(k1, k2, iters)},
             ${kmeansServeCentroidsCtes(iters, prefix = "f")},
             q AS (SELECT vec_id AS q_id, e AS qe
                   FROM cells ORDER BY vec_id LIMIT 1),
             ${twoLevelProbeCtes(p1, p2)}
        SELECT z.vec_id, z.c1, z.c2, ${duckCos("z.e", "qe")} AS cos_sim
        FROM cells z, q
        WHERE EXISTS (SELECT 1 FROM fp
                      WHERE fp.pc1 = z.c1 AND fp.pc2 = z.c2)
          AND z.vec_id <> q_id
        ORDER BY cos_sim DESC, z.vec_id LIMIT $kTop"""

  /** x20: the two-level index's recall-vs-(p1,p2) CURVE — the x13
    * discipline for the multi-probe path: one row per (p1, p2) arm,
    * recall@k against x01's exact top-k. This is the number that sizes
    * serving (how many of the k1·k2 cells a query must touch for usable
    * recall) — the gate x17's single-cell probe reads 0.0 on, so the curve
    * is what says the index HAS a serving story.
    */
  val TwoLevelCurveArms: Seq[(Int, Int)] = Seq((1, 1), (2, 2), (4, 4))

  def twoLevelRecallCurve(emb: DataFrame, kTop: Int = 10): DataFrame = {
    val exact = knnBrute(emb, kTop).select(col("vec_id"))
    def arm(p1: Int, p2: Int): DataFrame =
      exact.join(
          knnIvfTwoLevelProbe(emb, p1 = p1, p2 = p2, kTop = kTop)
            .select("vec_id"),
          Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_overlap"))
        .select(lit(p1).as("p1"), lit(p2).as("p2"), lit(kTop).as("k"),
          col("n_overlap"),
          (col("n_overlap").cast("double") / kTop).as("recall_at_k"))
    TwoLevelCurveArms.map { case (a, b) => arm(a, b) }
      .reduce(_.unionByName(_))
  }

  def twoLevelRecallCurveSql(k1: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, 8),
      k2: Int = 8, iters: Int = 2, kTop: Int = 10,
      src: String = "embeddings", pre: String = ""): String = {
    val armCtes = TwoLevelCurveArms.map { case (p1, p2) =>
      s"""${twoLevelProbeCtes(p1, p2, pfx = s"a${p1}_${p2}_")},
          arm${p1}_$p2 AS (SELECT z.vec_id FROM cells z, q
                     WHERE EXISTS (SELECT 1 FROM a${p1}_${p2}_fp fp
                                   WHERE fp.pc1 = z.c1 AND fp.pc2 = z.c2)
                       AND z.vec_id <> q_id
                     ORDER BY ${duckCos("z.e", "qe")} DESC, z.vec_id
                     LIMIT $kTop)"""
    }.mkString(",\n")
    val armSelects = TwoLevelCurveArms.map { case (p1, p2) =>
      s"""SELECT $p1 AS p1, $p2 AS p2, $kTop AS k,
                 CAST(count(*) AS BIGINT) AS n_overlap,
                 CAST(count(*) AS DOUBLE) / $kTop AS recall_at_k
          FROM exact WHERE vec_id IN (SELECT vec_id FROM arm${p1}_$p2)"""
    }.mkString("\nUNION ALL\n")
    s"""WITH ${if (pre.nonEmpty) pre + "," else ""}
             ${twoLevelCellsCtes(k1, k2, iters, src = src)},
             ${kmeansServeCentroidsCtes(iters, prefix = "f")},
             q AS (SELECT vec_id AS q_id, e AS qe
                   FROM cells ORDER BY vec_id LIMIT 1),
             exact AS (SELECT vec_id FROM (${knnBruteSql(kTop, src = src)})),
             $armCtes
        $armSelects"""
  }

  /** PLANTED-CLUSTER evaluation corpus (x21/x22) — the round-10 verdict's
    * point: every recall gate so far was measured on near-orthogonal
    * RANDOM embeddings, where true neighbors are spread across cells and
    * the curves mostly read the corpus's geometry, not the quantizer. This
    * corpus is derived DETERMINISTICALLY per row from vec_id (same
    * integer-hash family as the LSH planes — no RNG, no stored fixture, no
    * new files; both engines compute it bit-identically): 8 planted
    * centers with ±3 integer coordinates (the (2c+3)-stride coefficient
    * pattern), plus ±0.2-amplitude deterministic noise. Measured geometry:
    * within-cluster cosine ≈ 0.995, between ≈ 0.07 — so a quantizer that
    * recovers the planted cells scores recall ≈ 1 and one that collapses
    * scores near the probed fraction; the gates finally measure the INDEX.
    *
    * The planted id hashes vec_id (Knuth multiplicative, >>16) so it is
    * DELIBERATELY uncorrelated with the `vec_id % k` Lloyd seed — a seed
    * that equals the planted clustering would trivialize training.
    */
  val ClusteredPlanted = 8

  /** vec_id enters every hash below masked to 2^24: unmasked, the
    * `vec_id * 2654435761` coefficient overflows BIGINT at vec_id ≳ 3.5e9
    * (non-ANSI Spark wraps silently while DuckDB raises — the engines'
    * bit-identity contract would break exactly at extreme corpus scale;
    * round-11 advice). The mask is the identity for vec_id < 16,777,216 —
    * every derived corpus through the sf10 checkpoint (500k vectors) is
    * byte-unchanged — and beyond it the planted pattern repeats with
    * period 2^24, keeping both engines in exact lockstep at any scale.
    * The worst products are then 2^24·2654435761 ≈ 4.5e16 (label) and
    * (2^24·129)·1099087573 ≈ 2.4e18 (noise), both inside Long.
    */
  private val clusteredLabelExpr =
    "(((vec_id % 16777216) * 2654435761) DIV 65536) % 8"
  private val clusteredLabelDuck =
    "(((vec_id % 16777216) * 2654435761) // 65536) % 8"

  def clusteredCorpus(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr(s"CAST($clusteredLabelExpr AS INT)").as("label"),
      expr(s"""transform(sequence(1, size(embedding)), i ->
          CAST((((CAST(i AS BIGINT) * (2 * ($clusteredLabelExpr) + 3))
                 * 2654435761) DIV 65536) % 7 - 3 AS DOUBLE)
          + 0.1 * CAST((((((vec_id % 16777216) + 1)
                 * (2 * CAST(i AS BIGINT) + 1))
                 * 1099087573) DIV 65536) % 5 - 2 AS DOUBLE))""")
        .as("embedding"))

  /** The oracle twin as a CTE named `clustered`, for the `pre`/`src` slots
    * of the recall-curve SQL builders.
    */
  val clusteredCteSql: String =
    s"""clustered AS (SELECT vec_id,
          CAST($clusteredLabelDuck AS INT) AS label,
          list_transform(range(1, len(embedding) + 1), i ->
            CAST((((i * (2 * ($clusteredLabelDuck) + 3))
                   * 2654435761) // 65536) % 7 - 3 AS DOUBLE)
            + 0.1 * CAST((((((vec_id % 16777216) + 1) * (2 * i + 1))
                   * 1099087573) // 65536) % 5 - 2 AS DOUBLE)) AS embedding
        FROM embeddings)"""

  /** x17: x16's recall gate — recall@k of the two-level single-(c1,c2)
    * probe vs x01's exact top-k (the x13 discipline applied to the
    * residual quantizer; with k1·k2 effective cells the probed fraction
    * is ~1/(k1·k2), so this is the number that says how much nprobe — or
    * how much coarser a quantizer — serving needs).
    */
  def twoLevelRecall(emb: DataFrame, kTop: Int = 10): DataFrame = {
    val exact = knnBrute(emb, kTop).select(col("vec_id"))
    exact.join(knnIvfTwoLevel(emb, kTop = kTop).select("vec_id"),
        Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(kTop).as("k"), col("n_overlap"),
        (col("n_overlap").cast("double") / kTop).as("recall_at_k"))
  }

  def twoLevelRecallSql(k1: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, 8),
      k2: Int = 8, iters: Int = 2, kTop: Int = 10): String =
    s"""WITH ${twoLevelCellsCtes(k1, k2, iters)},
             q AS (SELECT vec_id AS q_id, e AS qe, c1 AS qc1, c2 AS qc2
                   FROM cells ORDER BY vec_id LIMIT 1),
             approx AS (SELECT z.vec_id FROM cells z, q
                        WHERE z.c1 = qc1 AND z.c2 = qc2
                          AND z.vec_id <> q_id
                        ORDER BY ${duckCos("z.e", "qe")} DESC, z.vec_id
                        LIMIT $kTop),
             exact AS (SELECT vec_id FROM (${knnBruteSql(kTop)}))
        SELECT $kTop AS k, CAST(count(*) AS BIGINT) AS n_overlap,
               CAST(count(*) AS DOUBLE) / $kTop AS recall_at_k
        FROM exact WHERE vec_id IN (SELECT vec_id FROM approx)"""

  /** x18: PRODUCT QUANTIZATION retrieval (the PQ/ADC shape) — the
    * memory-side lever the x-family lacked: x09's int8 scalar
    * quantization is 4× compression; PQ at m=4 subspaces × 8 codewords
    * stores ONE BYTE-SIZED CODE PER SUBSPACE — 4 small ints per vector
    * vs 64 floats (64×), which is what makes a 100 TB corpus's index fit
    * cache tiers. Train: each subspace (16 dims) gets its own codebook
    * via the SAME Lloyd core over the subvector slices; the published
    * codebook (serving centroids from the final assignment — the
    * x14/x16 artifact pattern) is the shippable index. Encode + score:
    * code_s(x) = argmin codeword for x's subvector; the query builds an
    * m×k LUT of d2(q_s, codeword) and the asymmetric distance is
    * ADC(x) = Σ_s LUT[s][code_s(x)] — here both run in ONE projection
    * over the corpus with the m codebooks in a single broadcast row:
    * zero shuffles, zero joins, one scan, then TakeOrdered(k). The
    * in_exact_topk flag (x09's discipline) measures the ADC
    * approximation against the exact L2 top-k inline.
    *
    * Determinism: codebooks are quantized-BIGINT serving centroids;
    * slices/casts are element-wise exact; argmin ties break on the
    * lowest codeword (array_min struct ordering = the oracle's
    * ROW_NUMBER ORDER BY dd, c); the ADC sum is a fixed-order 4-term
    * double add mirrored as ((dd0+dd1)+dd2)+dd3 in both engines.
    */
  def pqKnn(emb: DataFrame, m: Int = 4, subDim: Int = 16, kcode: Int = 8,
      iters: Int = 2, kTop: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    // retainCheckpointed (see Caches): the codebook row is broadcast into
    // 5 downstream subplans (m LUTs + the encode projection), and each
    // broadcast-exchange job re-ran the m Lloyd chains over the cached
    // corpus AND re-planned their full logical trees — the residual part
    // of x18's small-SF scheduling floor after the LUT-join rewrite.
    val e0 = graft.util.Caches.retainCheckpointed(emb.select(col("vec_id"),
      expr("transform(embedding, ex -> CAST(ex AS DOUBLE))").as("e")))
    val q = e0.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val cbAll = graft.util.Caches.retainCheckpointed((0 until m).map { s =>
      val off = s * subDim + 1
      lloydOver(e0.select(col("vec_id"),
          expr(s"slice(e, $off, $subDim)").as("e")), kcode, iters, pp = false)
        .agg(expr(s"graft_centroids(cluster, e, $kcode)").as(s"cents$s"))
    }.reduce(_.crossJoin(_)))
    // round 13: compiled encode kernel (VecOps.codeD) — same argmin/
    // tie-break as the slice+HOF form, zero per-codeword allocations
    def code(s: Int) = s"graft_code(e, cents$s, ${s * subDim}, $subDim)"
    // The m query-side LUTs are tiny DataFrames (kcode rows each) joined
    // back by codeword id: broadcast hash joins stay inside whole-stage
    // codegen, where the per-row filter()/element_at() lambda form was
    // interpreted per row per subspace (measured ~4× slower at sf10).
    val luts = (0 until m).map { s =>
      val off = s * subDim + 1
      cbAll.crossJoin(q)
        .select(explode(col(s"cents$s")).as("ct"), col("qe"))
        .select(col("ct.cluster").as(s"c$s"),
          expr(s"graft_l2(slice(qe, $off, $subDim), ct.cvec)").as(s"dd$s"))
    }
    val withCodes = e0.crossJoin(broadcast(cbAll))
      .crossJoin(broadcast(q.select(col("q_id"))))
      .filter(col("vec_id") =!= col("q_id"))
      .select(Seq(col("vec_id")) ++
        (0 until m).map(s => expr(code(s)).as(s"code_$s")): _*)
    val scored = luts.zipWithIndex.foldLeft(withCodes) {
      case (acc, (l, s)) =>
        acc.join(broadcast(l), col(s"code_$s") === col(s"c$s"))
    }
    val adc = (0 until m).map(s => col(s"dd$s")).reduce(_ + _)
    val top = scored.withColumn("adc", adc)
      .select("vec_id", "adc")
      .orderBy(col("adc"), col("vec_id")).limit(kTop)
    val exact = e0.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("d2", expr("graft_l2(e, qe)"))
      .orderBy(col("d2"), col("vec_id")).limit(kTop)
      .select(col("vec_id").as("evid"))
    top.join(broadcast(exact), col("vec_id") === col("evid"), "left_outer")
      .select(col("vec_id"), col("adc"),
        col("evid").isNotNull.as("in_exact_topk"))
  }

  def pqKnnSql(m: Int = 4, subDim: Int = 16, kcode: Int = 8,
      iters: Int = 2, kTop: Int = 10): String = {
    val perSub = (0 until m).map { s =>
      val off = s * subDim
      s"""sub$s AS (SELECT vec_id,
                           list_slice(embedding, ${off + 1}, ${off + subDim})
                             AS embedding
                    FROM embeddings),
          ${kmeansAssignCtes(kcode, iters, src = s"sub$s", prefix = s"s$s")},
          ${kmeansServeCentroidsCtes(iters, prefix = s"s$s")},
          s${s}code AS (SELECT vec_id, cluster AS code_$s
                        FROM (SELECT z.vec_id, c.cluster,
                                     ROW_NUMBER() OVER (PARTITION BY z.vec_id
                                       ORDER BY ${duckD2("z.e", "c.cvec")},
                                                c.cluster) AS rn
                              FROM s${s}e0 z, s${s}cvF c) WHERE rn = 1),
          s${s}lut AS (SELECT cluster AS c$s,
                              ${duckD2(
                                s"list_slice(qe, ${off + 1}, ${off + subDim})",
                                "cvec")} AS dd$s
                       FROM s${s}cvF, qd)"""
    }.mkString(",\n")
    val codeJoin = (1 until m)
      .map(s => s"JOIN s${s}code USING (vec_id)").mkString(" ")
    val lutJoin = (0 until m)
      .map(s => s"JOIN s${s}lut ON code_$s = c$s").mkString(" ")
    val adc = (0 until m).map(s => s"dd$s").reduce((a, b) => s"($a + $b)")
    s"""WITH qd AS (SELECT vec_id AS q_id,
                           list_transform(embedding, x -> CAST(x AS DOUBLE))
                             AS qe
                    FROM embeddings ORDER BY vec_id LIMIT 1),
            $perSub,
            codes AS (SELECT * FROM s0code $codeJoin),
            scored AS (SELECT codes.vec_id, $adc AS adc
                       FROM codes $lutJoin),
            exact AS (SELECT e2.vec_id
                      FROM (SELECT vec_id,
                                   list_transform(embedding,
                                                  x -> CAST(x AS DOUBLE)) AS e
                            FROM embeddings) e2, qd
                      WHERE e2.vec_id <> q_id
                      ORDER BY ${duckD2("e2.e", "qe")}, e2.vec_id
                      LIMIT $kTop),
            top AS (SELECT s.vec_id, s.adc FROM scored s, qd
                    WHERE s.vec_id <> q_id
                    ORDER BY s.adc, s.vec_id LIMIT $kTop)
        SELECT t.vec_id, t.adc,
               t.vec_id IN (SELECT vec_id FROM exact) AS in_exact_topk
        FROM top t"""
  }

  /** x23: IVF-PQ — the COMPOSED production ANN index (x16's coarse cells ×
    * x18's PQ codes): PQ codebooks are trained on LEVEL-1 RESIDUALS
    * (e − coarse centroid), and ADC scoring runs ONLY inside the probed
    * coarse cells — the two halves the round-10 verdict said existed
    * separately (x16: cells, x18: codes) composed into the index a real
    * deployment ships (the classic IVFADC recipe: coarse quantizer for the
    * prune, residual product quantizer for the in-cell scan).
    *
    * Scale shape — why this is the 100 TB index:
    *   - the coarse probe is x14's: rank k1 broadcast-sized serving
    *     centroids, scan `nprobe` cells; at scale c1 is a partition key
    *     and the probe is partition pruning at the source.
    *   - the in-cell scan reads m byte-sized codes per vector (m·log2(k)
    *     bits ≈ 24 bits at the round-13 default, 12 at the swept
    *     baseline, vs 64 floats — the compression that fits an
    *     index in cache tiers) and scores each candidate with m LUT adds;
    *     the LUTs are nprobe·m·kcode rows built from the query alone.
    *   - training on residuals (not raw vectors) is what makes a SMALL
    *     codebook usable: the coarse quantizer removes the between-cell
    *     variance, so the PQ codewords only span the in-cell spread.
    *   - here encode runs after the prune: in production `code_s` is a
    *     stored index column and only probed partitions are read, so
    *     serving never touches (or encodes) unprobed cells; this
    *     projection stands in for reading that stored column. Codes are a
    *     pure function of (vector, codebooks), so encode-before-store and
    *     encode-after-prune are the same values.
    *
    * Determinism: level-1 centroids and all m codebooks are
    * quantized-BIGINT serving artifacts; residuals are element-wise exact
    * IEEE subtraction; code argmin ties break on the lowest codeword
    * (array_min struct ordering = the oracle's ROW_NUMBER ORDER BY dd, c);
    * the ADC sum is the fixed-order ((dd0+dd1)+dd2)+dd3 in both engines;
    * the in_exact_topk flag (x09/x18 discipline) compares against the
    * exact L2 top-k — ADC approximates L2, so the gate measures the
    * quantizer against its own metric.
    *
    * The level-1 assignment is the SAME retained relation d17/x12/x14/x16
    * share — one coarse training serves the whole family; the residual
    * relation and the 1-row codebook table are retained too, so the x24
    * recall-curve arms re-probe without retraining.
    */
  /** The shared IVF-PQ pipeline up to the ADC-scored candidate relation:
    * (scored(vec_id, c1, adc, code_*…), a1, q, exactL2 top-k). [[ivfPqKnn]]
    * takes scored's top-k directly (the raw-ADC index contract);
    * [[ivfPqKnnRerank]] re-ranks an ADC shortlist exactly (the production
    * serving path).
    */
  /** The offline IVF-PQ index build: (a1 assignment, cv1 serving-centroid
    * rows, resid residuals, cbAll codebook row) — all lineage-truncated
    * checkpoints. [[ivfPqCore]] consumes it for the declared batch
    * queries; the streaming serving form (s31) broadcasts the same
    * artifacts, so offline index and online scorer can never drift.
    */
  private[graft] def ivfPqIndex(emb: DataFrame, k1Default: Int, m: Int,
      subDim: Int, kcode: Int, iters: Int, pp: Boolean)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val k1 = graft.ext.Dedup.resolveCells(emb, k1Default)
    // retainCheckpointed, not retain: the probe path fans this relation
    // into ~10 broadcast subplans per arm, and each broadcast-exchange job
    // re-plans its whole logical subtree — with the farthest-point seed
    // chain + Lloyd rounds under it that was 24 jobs / 12 s of DRIVER
    // planning for 0.6 s of executor work. The checkpoint truncates the
    // lineage to the materialized partitions; values identical.
    val a1 = graft.util.Caches.retainCheckpointed(
      kmeansAssignSeeded(emb, k1, iters, pp)
        .select(col("vec_id"), col("e"), col("cluster")))
    val cv1 = graft.util.Caches.retainCheckpointed(
      a1.agg(expr(s"graft_centroids(cluster, e, $k1)").as("cents"))
        .select(explode(col("cents")).as("ct"))
        .select(col("ct.cluster").as("rc1"), col("ct.cvec").as("cv1")))
    val resid = graft.util.Caches.retainCheckpointed(
      a1.join(broadcast(cv1), col("cluster") === col("rc1"))
        .select(col("vec_id"), col("cluster").as("c1"),
          expr("zip_with(e, cv1, (x, y) -> x - y)").as("r")))
    val cbAll = graft.util.Caches.retainCheckpointed((0 until m).map { s =>
      val off = s * subDim + 1
      lloydOver(resid.select(col("vec_id"),
          expr(s"slice(r, $off, $subDim)").as("e")), kcode, iters, pp = false)
        .agg(expr(s"graft_centroids(cluster, e, $kcode)").as(s"cents$s"))
    }.reduce(_.crossJoin(_)))
    (a1, cv1, resid, cbAll)
  }

  /** The per-subspace "encode + asymmetric-distance" SQL term over a row
    * holding `r` (the candidate's residual), `rqe` (the cell's query
    * residual) and the broadcast `cents$s` codebooks — shared by the batch
    * scorer and the streaming serving form (one definition, zero drift).
    *
    * Round 13: the slice + `array_min(transform(...))` HOF form became the
    * compiled graft_adc_term kernel — higher-order functions evaluate
    * their lambda interpreted and allocated one named_struct PER CODEWORD
    * per subspace per candidate (256 allocations/candidate at the kcode=64
    * default). Values bit-identical (same d2 fold over the offset window,
    * same (dd, cluster) argmin tie-break — VecOps.adcTermD), pinned by the
    * unchanged oracle hashes across the whole IVF-PQ family.
    */
  private[graft] def adcTermExpr(s: Int, subDim: Int): String = {
    val off = s * subDim
    s"graft_adc_term(r, rqe, cents$s, $off, $subDim)"
  }

  /** s31's serving contract: ONE definition of the four constants the
    * engine query, the streaming shortlist processor, and the hand-written
    * oracle SQL all embed (round-12 advice: they were hard-coded
    * independently in four places — ivfPqQueryProbes defaults, the
    * AdcShortlistProcessor shortK, the engine's post-drain rank windows,
    * and the oracle's LIMIT/rn literals — so changing any one silently
    * desynchronized the engine from its correctness gate).
    */
  private[graft] object Serve {
    val NQueries = 8 // static query set: the NQueries lowest-id vectors
    val NProbe = 2   // probed serving cells per query
    val ShortK = 50  // ADC shortlist width held in state / re-ranked
    val TopK = 5     // final exact-re-ranked answer size per query
    // The index config behind the declared IVF-PQ serving surface
    // (x23/x25/x28/s31 + the curves), shared engine/oracle/specs. Round-13
    // re-pick from the measured sweeps: farthest-point seeding (the
    // round-12 matrix: pp-seeded reaches recall 1.0 where modulo-seeded
    // collapses) and kcode=64 (the bits sweep: at equal 24 bits, bigger
    // codebooks beat more subspaces — raw-ADC floor 0.2→0.5/0.6 and
    // shortK=50 saturates to 1.0 at BOTH sf0.1 and sf1; numbers in
    // BASELINE.md round-13).
    val K1Default = 8 // declared oracle contract; `auto` is the prod knob
    val M = 4         // subspaces (subDim = dim / m = 16 at dim 64)
    val SubDim = 16
    val Kcode = 64    // codewords per subspace: m·log2(kcode) = 24 bits
    val Iters = 2
    val Pp = true     // farthest-point level-1 seeding
  }

  /** The static query set + per-query probe table the streaming server
    * (s31) and its specs share — ONE definition so the catalog query and
    * the slicing/chaos specs can never validate a different serving shape
    * (round-12 review): the nQueries lowest-id vectors, each with its
    * nprobe nearest serving cells and the per-cell query residual.
    */
  private[graft] def ivfPqQueryProbes(a1: DataFrame, cv1: DataFrame,
      nQueries: Int = Serve.NQueries,
      nprobe: Int = Serve.NProbe): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(a1.sparkSession)
    val qset = a1.orderBy("vec_id").limit(nQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("dq"), col("rc1"))
    val probes = qset.crossJoin(broadcast(cv1))
      .withColumn("dq", expr("graft_l2(cv1, qe)"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= nprobe)
      .select(col("q_id"), col("rc1").as("pcell"),
        expr("zip_with(qe, cv1, (x, y) -> x - y)").as("rqe"))
    (qset, probes)
  }

  private def ivfPqCore(emb: DataFrame, k1Default: Int, m: Int, subDim: Int,
      kcode: Int, iters: Int, nprobe: Int, kTop: Int, pp: Boolean)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    ivfPqCoreFrom(ivfPqIndex(emb, k1Default, m, subDim, kcode, iters, pp),
      m, subDim, nprobe, kTop)

  /** The probe/score/exact stage over an ALREADY-BUILT index — the serve
    * half of the train/serve lifecycle. The in-session queries feed it
    * [[ivfPqIndex]]'s checkpoints; p10 feeds it the same four relations
    * LOADED from parquet in a fresh session. ONE definition, so the served
    * answer cannot depend on where the index came from.
    */
  private[graft] def ivfPqCoreFrom(
      parts: (DataFrame, DataFrame, DataFrame, DataFrame),
      m: Int, subDim: Int, nprobe: Int, kTop: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (a1, cv1, resid, cbAll) = parts
    graft.functions.GraftFunctions.register(a1.sparkSession)
    val q = a1.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val probed = cv1.crossJoin(broadcast(q))
      .withColumn("dq", expr("graft_l2(cv1, qe)"))
      .orderBy(col("dq"), col("rc1")).limit(nprobe)
      .select(col("rc1").as("pcell"), col("cv1").as("pcv"), col("qe"))
    // Multi-probe must re-residualize the query per probed cell — the
    // residual the index stores is relative to the cell the vector landed
    // in (x19's lesson, applied to the PQ scoring).
    val rq = probed.select(col("pcell"),
      expr("zip_with(qe, pcv, (x, y) -> x - y)").as("rqe"))
    // Encode + ADC-score in ONE projection: each candidate's per-subspace
    // argmin yields the chosen codeword AND its vector, so the asymmetric
    // distance is computed directly against the cell's query residual —
    // identical values to the (cell, codeword)-keyed LUT join the oracle
    // runs (ADC[s] = d2(rqe_s, codeword(code_s)) either way), but zero
    // joins: measured, the m LUT broadcast joins cost 8 extra
    // broadcast-exchange jobs per arm at a ~0.5 s/job driver floor. At
    // 100 TB with STORED codes (no `r` in hand) the LUT-join form is the
    // right scan — x18 keeps that shape on the declared surface.
    val adc = (0 until m).map(s => expr(adcTermExpr(s, subDim))).reduce(_ + _)
    val scored = resid
      .join(broadcast(rq), col("c1") === col("pcell"))
      .crossJoin(broadcast(q.select("q_id")))
      .filter(col("vec_id") =!= col("q_id"))
      .crossJoin(broadcast(cbAll))
      .select(col("vec_id"), col("c1"), adc.as("adc"))
    val exact = a1.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("d2", expr("graft_l2(e, qe)"))
      .orderBy(col("d2"), col("vec_id")).limit(kTop)
      .select(col("vec_id").as("evid"))
    (scored, a1, q, exact)
  }

  def ivfPqKnn(emb: DataFrame, k1Default: Int = Serve.K1Default,
      m: Int = Serve.M, subDim: Int = Serve.SubDim,
      kcode: Int = Serve.Kcode, iters: Int = Serve.Iters, nprobe: Int = 2,
      kTop: Int = 10, pp: Boolean = Serve.Pp): DataFrame = {
    val (scored, _, _, exact) =
      ivfPqCore(emb, k1Default, m, subDim, kcode, iters, nprobe, kTop, pp)
    val top = scored.orderBy(col("adc"), col("vec_id")).limit(kTop)
    top.join(broadcast(exact), col("vec_id") === col("evid"), "left_outer")
      .select(col("vec_id"), col("c1"), col("adc"),
        col("evid").isNotNull.as("in_exact_topk"))
  }

  /** x25: IVF-PQ with EXACT RE-RANK — the production serving path (x10's
    * two-stage discipline composed onto the IVFADC index): the ADC scan
    * keeps a `shortK`-wide shortlist (by (adc, vec_id)), and only those
    * rows are re-scored with the exact L2 kernel against the full-precision
    * vectors. At 100 TB the shortlist is shortK row-ids resolved against
    * the vector store (shortK point reads), so the full-precision corpus is
    * touched shortK times per query while the scan itself reads only codes
    * in probed partitions — the standard answer to raw ADC's resolution
    * floor (m·log2(kcode) bits/vector cannot rank within-cell
    * neighbors whose true distances differ by less than the quantization
    * error; x24's flat raw curve is that floor, measured — 0.2 at the
    * 12-bit baseline, 0.5 at the 24-bit round-13 default, BASELINE.md).
    *
    * Determinism: the shortlist cut is (adc, vec_id)-ordered (bit-stable),
    * the re-rank is the same graft_l2/duckD2 fold as the exact baseline
    * with (d2, vec_id) tie-break — every stage hash-gateable.
    */
  /** The exact-re-rank tail over an ADC-scored relation — shared by
    * [[ivfPqKnnRerank]] and [[ivfPqRerankCurve]]'s arms so the curve
    * re-cuts ONE scored scan per shortK instead of rebuilding the whole
    * probe/score/exact pipeline per arm (the oracle already shares its
    * scored block; round-12 review).
    */
  private def rerankTail(scored: DataFrame, a1: DataFrame, q: DataFrame,
      exact: DataFrame, shortK: Int, kTop: Int): DataFrame = {
    val shortlist = scored.orderBy(col("adc"), col("vec_id")).limit(shortK)
      .select(col("vec_id"), col("c1"))
    // shortK rows broadcast against the cached full-precision relation —
    // the "resolve row-ids against the vector store" point-read stand-in.
    a1.join(broadcast(shortlist), "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("d2", expr("graft_l2(e, qe)"))
      .select("vec_id", "c1", "d2")
      .orderBy(col("d2"), col("vec_id")).limit(kTop)
      .join(broadcast(exact), col("vec_id") === col("evid"), "left_outer")
      .select(col("vec_id"), col("c1"), col("d2"),
        col("evid").isNotNull.as("in_exact_topk"))
  }

  /** The x25 serving answer computed from index ARTIFACTS (p10's serve
    * phase): same core + re-rank tail as [[ivfPqKnnRerank]], index origin
    * decided by the caller.
    */
  private[graft] def ivfPqServeRerank(
      parts: (DataFrame, DataFrame, DataFrame, DataFrame),
      m: Int = Serve.M, subDim: Int = Serve.SubDim, nprobe: Int = 2,
      shortK: Int = Serve.ShortK, kTop: Int = 10): DataFrame = {
    val (scored, a1, q, exact) = ivfPqCoreFrom(parts, m, subDim, nprobe, kTop)
    rerankTail(scored, a1, q, exact, shortK, kTop)
  }

  /** p11: INCREMENTAL INDEX MAINTENANCE — the lifecycle step after p10's
    * persist: a delta batch (vec_id ≡ 0 mod 5 — the sf-independent split)
    * is admitted against the FROZEN quantizer (cell = argmin vs the
    * trained centroids, residual vs the serving centroid, codes vs the
    * frozen codebooks — NO retraining anywhere), appended to the index
    * relations, and served together with the base. The admission rule is
    * the SAME argmin the batch build applies (s30's online≡batch cell
    * contract), so a delta vector equal to a base vector gets identical
    * cell/residual/codes — re-encode ≡ stored, maintained. The query
    * vector is the lowest vec_id = a DELTA row: the served answer proves
    * freshly-admitted vectors are retrievable without retrain. At 100 TB
    * this is the nightly-append job: assign+encode is one broadcast
    * map-side pass over the delta, the index table gains a partition.
    */
  def ivfPqDeltaServe(emb: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val serve = Serve
    val base = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val delta = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
    val (a1, cv1, resid, cbAll) = ivfPqIndex(base, serve.K1Default,
      serve.M, serve.SubDim, serve.Kcode, serve.Iters, serve.Pp)
    val assignCents =
      kmeansTrainedCentroids(base, serve.K1Default, serve.Iters, serve.Pp)
    val deltaAssigned = delta
      .select(col("vec_id"),
        expr("transform(embedding, ex -> CAST(ex AS DOUBLE))").as("e"))
      .crossJoin(broadcast(assignCents))
      .withColumn("cluster", expr(s"$bestCellExpr.c"))
      .select("vec_id", "e", "cluster")
    val deltaResid = deltaAssigned
      .join(broadcast(cv1), col("cluster") === col("rc1"))
      .select(col("vec_id"), col("cluster").as("c1"),
        expr("zip_with(e, cv1, (x, y) -> x - y)").as("r"))
    ivfPqServeRerank((a1.unionByName(deltaAssigned), cv1,
      resid.unionByName(deltaResid), cbAll))
  }

  /** Oracle twin of [[ivfPqDeltaServe]]: the base chains via
    * [[ivfPqIndexCtes]], the delta admitted against cv$iters (the trained
    * centroids — what produced a$iters's cells) and the frozen v{s}cvF
    * codebooks, unioned, probed, LUT-scored, re-ranked.
    */
  def ivfPqDeltaServeSql(k1: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, Serve.K1Default),
      m: Int = Serve.M, subDim: Int = Serve.SubDim,
      kcode: Int = Serve.Kcode, iters: Int = Serve.Iters,
      nprobe: Int = 2, shortK: Int = Serve.ShortK, kTop: Int = 10,
      pp: Boolean = Serve.Pp): String = {
    val codeCols = (0 until m).map(s => s"code_$s").mkString(", ")
    val dsubs = (0 until m).map { s =>
      val off = s * subDim
      s"""dcode$s AS (SELECT vec_id, cluster AS code_$s
                      FROM (SELECT z.vec_id, c.cluster,
                                   ROW_NUMBER() OVER (PARTITION BY z.vec_id
                                     ORDER BY ${duckD2(
                                       s"list_slice(z.r, ${off + 1}, ${off + subDim})",
                                       "c.cvec")}, c.cluster) AS rn
                            FROM dR z, v${s}cvF c) WHERE rn = 1)"""
    }.mkString(",\n")
    val dcodeJoin = (0 until m)
      .map(s => s"JOIN dcode$s USING (vec_id)").mkString(" ")
    val luts = (0 until m).map { s =>
      val off = s * subDim
      s"""plut$s AS (SELECT r.pcell AS pc$s, c.cluster AS cc$s,
                            ${duckD2(
                              s"list_slice(r.rqe, ${off + 1}, ${off + subDim})",
                              "c.cvec")} AS dd$s
                     FROM prq r, v${s}cvF c)"""
    }.mkString(",\n")
    val lutJoin = (0 until m)
      .map(s => s"JOIN plut$s ON k.c1 = pc$s AND k.code_$s = cc$s")
      .mkString(" ")
    val adc = (0 until m).map(s => s"dd$s").reduce((a, b) => s"($a + $b)")
    s"""WITH base AS MATERIALIZED (SELECT * FROM embeddings
               WHERE vec_id % 5 <> 0),
            ${ivfPqIndexCtes(k1, m, subDim, kcode, iters, src = "base",
              seed = seedCtesFromPp(pp, k1))},
            de0 AS MATERIALIZED (SELECT vec_id,
                   list_transform(embedding, ex -> CAST(ex AS DOUBLE)) AS e
                 FROM embeddings WHERE vec_id % 5 = 0),
            dA AS MATERIALIZED (SELECT vec_id, e, cl AS cluster
                 FROM (SELECT de0.vec_id, de0.e, cv$iters.cluster AS cl,
                              ${duckD2("de0.e", "cvec")} AS dd,
                              ROW_NUMBER() OVER (PARTITION BY de0.vec_id
                                ORDER BY ${duckD2("de0.e", "cvec")},
                                         cv$iters.cluster) AS rn
                       FROM de0, cv$iters) WHERE rn = 1),
            dR AS MATERIALIZED (SELECT da.vec_id, da.cluster AS c1,
                   list_transform(range(1, len(da.e) + 1),
                                  i -> da.e[i] - cvF.cvec[i]) AS r
                 FROM dA da JOIN cvF ON da.cluster = cvF.cluster),
            $dsubs,
            allcodes AS MATERIALIZED (
              SELECT vec_id, c1, $codeCols FROM pqcodes
              UNION ALL
              SELECT dR.vec_id, dR.c1, $codeCols FROM dR $dcodeJoin),
            allA AS MATERIALIZED (
              SELECT vec_id, e, cluster FROM a$iters
              UNION ALL
              SELECT vec_id, e, cluster FROM dA),
            pq AS MATERIALIZED (SELECT vec_id AS q_id, e AS qe FROM allA
                 ORDER BY vec_id LIMIT 1),
            pprobe AS (SELECT cluster AS pcell, cvec AS pcv FROM cvF, pq
                       ORDER BY ${duckD2("cvec", "qe")}, cluster
                       LIMIT $nprobe),
            prq AS (SELECT pcell,
                           list_transform(range(1, len(qe) + 1),
                                          i -> qe[i] - pcv[i]) AS rqe
                    FROM pprobe, pq),
            $luts,
            pscored AS MATERIALIZED (SELECT k.vec_id, k.c1, $adc AS adc
                 FROM allcodes k $lutJoin, pq
                 WHERE k.vec_id <> q_id),
            pshort AS (SELECT vec_id, c1 FROM pscored
                       ORDER BY adc, vec_id LIMIT $shortK),
            prr AS (SELECT z.vec_id, z.cluster AS c1,
                           ${duckD2("z.e", "qe")} AS d2
                    FROM allA z JOIN pshort s ON z.vec_id = s.vec_id, pq
                    ORDER BY d2, z.vec_id LIMIT $kTop),
            pfex AS (SELECT z.vec_id FROM allA z, pq
                     WHERE z.vec_id <> q_id
                     ORDER BY ${duckD2("z.e", "qe")}, z.vec_id LIMIT $kTop)
        SELECT vec_id, c1, d2,
               vec_id IN (SELECT vec_id FROM pfex) AS in_exact_topk
        FROM prr"""
  }

  def ivfPqKnnRerank(emb: DataFrame, k1Default: Int = Serve.K1Default,
      m: Int = Serve.M, subDim: Int = Serve.SubDim,
      kcode: Int = Serve.Kcode, iters: Int = Serve.Iters, nprobe: Int = 2,
      shortK: Int = Serve.ShortK, kTop: Int = 10,
      pp: Boolean = Serve.Pp): DataFrame = {
    val (scored, a1, q, exact) =
      ivfPqCore(emb, k1Default, m, subDim, kcode, iters, nprobe, kTop, pp)
    rerankTail(scored, a1, q, exact, shortK, kTop)
  }

  /** Shared IVF-PQ oracle CTEs: the level-1 chain + serving centroids +
    * residuals + m per-subspace codebook chains (over residual slices) +
    * FULL-CORPUS codes + the query + the exact-L2 top-k. Ends with
    * `pqcodes(vec_id, c1, code_0..)`, `q(q_id, qe)`, `pqexact(vec_id)`.
    * (The oracle encodes the whole corpus where the engine encodes after
    * the prune — codes are a pure function of (vector, codebooks), so the
    * compared results are identical.)
    */
  /** The index-build half of [[ivfPqBaseCtes]] — chains, serving
    * centroids, residuals, full-corpus codes — with no query bound yet;
    * the streaming serving oracle (s31) appends its own multi-query
    * probe block.
    */
  private[graft] def ivfPqIndexCtes(k1: Int, m: Int, subDim: Int, kcode: Int,
      iters: Int, src: String,
      seed: Option[String] = None): String = {
    val subs = (0 until m).map { s =>
      val off = s * subDim
      s"""vsub$s AS (SELECT vec_id,
                            list_slice(r, ${off + 1}, ${off + subDim})
                              AS embedding
                     FROM residp),
          ${kmeansAssignCtes(kcode, iters, src = s"vsub$s", prefix = s"v$s")},
          ${kmeansServeCentroidsCtes(iters, prefix = s"v$s")},
          v${s}code AS (SELECT vec_id, cluster AS code_$s
                        FROM (SELECT z.vec_id, c.cluster,
                                     ROW_NUMBER() OVER (PARTITION BY z.vec_id
                                       ORDER BY ${duckD2("z.e", "c.cvec")},
                                                c.cluster) AS rn
                              FROM v${s}e0 z, v${s}cvF c) WHERE rn = 1)"""
    }.mkString(",\n")
    val codeJoin = (0 until m)
      .map(s => s"JOIN v${s}code USING (vec_id)").mkString(" ")
    s"""${kmeansAssignCtes(k1, iters, src = src, seed = seed)},
        ${kmeansServeCentroidsCtes(iters)},
        residp AS MATERIALIZED (SELECT z.vec_id, z.cluster AS c1,
                          list_transform(range(1, len(z.e) + 1),
                                         i -> z.e[i] - cvec[i]) AS r
                   FROM a$iters z JOIN cvF ON z.cluster = cvF.cluster),
        $subs,
        pqcodes AS MATERIALIZED (SELECT residp.vec_id, residp.c1,
                           ${(0 until m).map(s => s"code_$s").mkString(", ")}
                    FROM residp $codeJoin)"""
  }

  private def ivfPqBaseCtes(k1: Int, m: Int, subDim: Int, kcode: Int,
      iters: Int, kTop: Int, src: String,
      seed: Option[String] = None): String =
    s"""${ivfPqIndexCtes(k1, m, subDim, kcode, iters, src, seed)},
        q AS MATERIALIZED (SELECT vec_id AS q_id, e AS qe
              FROM a$iters ORDER BY vec_id LIMIT 1),
        pqexact AS MATERIALIZED (SELECT z.vec_id FROM a$iters z, q
                    WHERE z.vec_id <> q_id
                    ORDER BY ${duckD2("z.e", "qe")}, z.vec_id LIMIT $kTop)"""

  /** Per-nprobe probe/LUT/score block over [[ivfPqBaseCtes]]'s relations;
    * ends with `${pfx}scored(vec_id, c1, adc)`. `extraJoin`/`extraCond`/
    * `carry` let x28's filtered variant restrict and widen the scored scan
    * (join the label source, keep only predicate survivors, carry the
    * label through) without duplicating the LUT plumbing.
    */
  private def ivfPqProbeCtes(m: Int, subDim: Int, nprobe: Int,
      pfx: String = "", extraJoin: String = "", extraCond: String = "",
      carry: String = ""): String = {
    val luts = (0 until m).map { s =>
      val off = s * subDim
      s"""${pfx}lut$s AS (SELECT r.pcell AS pc$s, c.cluster AS cc$s,
                         ${duckD2(
                           s"list_slice(r.rqe, ${off + 1}, ${off + subDim})",
                           "c.cvec")} AS dd$s
                  FROM ${pfx}rq r, v${s}cvF c)"""
    }.mkString(",\n")
    val lutJoin = (0 until m)
      .map(s => s"JOIN ${pfx}lut$s ON k.c1 = pc$s AND k.code_$s = cc$s")
      .mkString(" ")
    val adc = (0 until m).map(s => s"dd$s").reduce((a, b) => s"($a + $b)")
    s"""${pfx}probe AS (SELECT cluster AS pcell, cvec AS pcv FROM cvF, q
                ORDER BY ${duckD2("cvec", "qe")}, cluster LIMIT $nprobe),
        ${pfx}rq AS (SELECT pcell,
                        list_transform(range(1, len(qe) + 1),
                                       i -> qe[i] - pcv[i]) AS rqe
                 FROM ${pfx}probe, q),
        $luts,
        ${pfx}scored AS MATERIALIZED (SELECT k.vec_id, k.c1$carry, $adc AS adc
                 FROM pqcodes k $lutJoin $extraJoin, q
                 WHERE k.vec_id <> q_id$extraCond)"""
  }

  def ivfPqKnnSql(k1: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, Serve.K1Default),
      m: Int = Serve.M, subDim: Int = Serve.SubDim,
      kcode: Int = Serve.Kcode, iters: Int = Serve.Iters,
      nprobe: Int = 2, kTop: Int = 10, pp: Boolean = Serve.Pp): String =
    s"""WITH ${ivfPqBaseCtes(k1, m, subDim, kcode, iters, kTop,
           src = "embeddings",
           seed = seedCtesFromPp(pp, k1))},
             ${ivfPqProbeCtes(m, subDim, nprobe)},
             top AS (SELECT vec_id, c1, adc FROM scored
                     ORDER BY adc, vec_id LIMIT $kTop)
        SELECT t.vec_id, t.c1, t.adc,
               t.vec_id IN (SELECT vec_id FROM pqexact) AS in_exact_topk
        FROM top t"""

  /** Re-rank CTE over an ADC-scored block (`scoredName`, default
    * `${pfx}scored`): the shortK ADC shortlist re-scored exactly against
    * `a$iters`'s full-precision vectors; ends with
    * `${pfx}rr(vec_id, c1, d2)` — the final top-k.
    */
  private def ivfPqRerankCte(iters: Int, shortK: Int, kTop: Int,
      pfx: String = "", scoredName: String = ""): String = {
    val scored = if (scoredName.nonEmpty) scoredName else s"${pfx}scored"
    s"""${pfx}short AS (SELECT vec_id, c1 FROM $scored
                 ORDER BY adc, vec_id LIMIT $shortK),
        ${pfx}rr AS (SELECT z.vec_id, s.c1, ${duckD2("z.e", "qe")} AS d2
              FROM a$iters z JOIN ${pfx}short s ON z.vec_id = s.vec_id, q
              ORDER BY d2, z.vec_id LIMIT $kTop)"""
  }

  def ivfPqKnnRerankSql(k1: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, Serve.K1Default),
      m: Int = Serve.M, subDim: Int = Serve.SubDim,
      kcode: Int = Serve.Kcode, iters: Int = Serve.Iters,
      nprobe: Int = 2, shortK: Int = Serve.ShortK, kTop: Int = 10,
      pp: Boolean = Serve.Pp): String =
    s"""WITH ${ivfPqBaseCtes(k1, m, subDim, kcode, iters, kTop,
           src = "embeddings",
           seed = seedCtesFromPp(pp, k1))},
             ${ivfPqProbeCtes(m, subDim, nprobe)},
             ${ivfPqRerankCte(iters, shortK, kTop)}
        SELECT t.vec_id, t.c1, t.d2,
               t.vec_id IN (SELECT vec_id FROM pqexact) AS in_exact_topk
        FROM rr t"""

  /** x24: the IVF-PQ recall-vs-nprobe CURVE on the planted-cluster corpus
    * (x21/x22's discipline applied to the composed index): recall@k of the
    * ADC top-k against the exact L2 top-k, one row per nprobe arm. Because
    * [[ivfPqKnn]]'s in_exact_topk flag already marks each returned row's
    * membership in the exact set, each arm is ONE aggregate over the
    * (≤ k)-row search result — the curve costs the searches themselves
    * plus nothing. The trainings (level-1 cells, residuals, codebooks) are
    * retained, so arms share one training pass.
    */
  val PqCurveArms: Seq[Int] = Seq(1, 2, 4)

  /** x24: the raw-ADC recall-vs-nprobe curve — the gate that reads the
    * CODE RESOLUTION floor (m·log2(kcode) bits cannot rank
    * within-cell neighbors whose true distances differ by less than the
    * quantization error, so the curve sits flat below the probe's recall;
    * x26's shortK curve is the knob that buys it back).
    */
  def ivfPqRecallCurve(emb: DataFrame, kTop: Int = 10,
      pp: Boolean = Serve.Pp, m: Int = Serve.M, subDim: Int = Serve.SubDim,
      kcode: Int = Serve.Kcode): DataFrame = {
    // The nprobe arms are NESTED (cells ranked by (dq, rc1) identically,
    // arm np = the first np of them) and a candidate's ADC value is
    // arm-independent (the query residual is per CELL) — so the curve
    // scores ONCE at the widest arm, tags each candidate with its cell's
    // probe rank, checkpoints the (vec_id, prn, adc) relation, and each
    // arm is a rank filter + TakeOrdered over the checkpoint. Round 12's
    // per-arm form re-ran the whole probe/encode/score pipeline three
    // times (and the oracle still does — its per-arm blocks were already
    // the honest cost accounting).
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val (a1, cv1, resid, cbAll) =
      ivfPqIndex(emb, Serve.K1Default, m, subDim, kcode, Serve.Iters, pp)
    val q = a1.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val npMax = PqCurveArms.max
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("dq"), col("rc1"))
    val rq = cv1.crossJoin(broadcast(q))
      .withColumn("dq", expr("graft_l2(cv1, qe)"))
      .withColumn("prn", row_number().over(w))
      .filter(col("prn") <= npMax)
      .select(col("rc1").as("pcell"), col("prn"),
        expr("zip_with(qe, cv1, (x, y) -> x - y)").as("rqe"))
    val adc = (0 until m).map(s => expr(adcTermExpr(s, subDim))).reduce(_ + _)
    val scored = graft.util.Caches.retainCheckpointed(resid
      .join(broadcast(rq), col("c1") === col("pcell"))
      .crossJoin(broadcast(q.select("q_id")))
      .filter(col("vec_id") =!= col("q_id"))
      .crossJoin(broadcast(cbAll))
      .select(col("vec_id"), col("prn"), adc.as("adc")))
    val exact = a1.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("d2", expr("graft_l2(e, qe)"))
      .orderBy(col("d2"), col("vec_id")).limit(kTop)
      .select(col("vec_id").as("evid"))
    def arm(np: Int): DataFrame =
      scored.filter(col("prn") <= np)
        .orderBy(col("adc"), col("vec_id")).limit(kTop)
        .join(broadcast(exact), col("vec_id") === col("evid"), "left_outer")
        // count(when(...)) not sum(): an empty probed cell would make the
        // sum NULL where the oracle's count(*) reads 0
        .agg(count(when(col("evid").isNotNull, lit(1))).as("n_overlap"))
        .select(lit(np).as("nprobe"), lit(kTop).as("k"), col("n_overlap"),
          (col("n_overlap").cast("double") / kTop).as("recall_at_k"))
    PqCurveArms.map(arm).reduce(_.unionByName(_))
  }

  def ivfPqRecallCurveSql(k1: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, Serve.K1Default),
      m: Int = Serve.M, subDim: Int = Serve.SubDim,
      kcode: Int = Serve.Kcode, iters: Int = Serve.Iters,
      kTop: Int = 10, src: String = "embeddings",
      pre: String = "", pp: Boolean = Serve.Pp): String = {
    val armCtes = PqCurveArms
      .map(np => ivfPqProbeCtes(m, subDim, np, pfx = s"n${np}_"))
      .mkString(",\n")
    val armSelects = PqCurveArms.map { np =>
      s"""SELECT $np AS nprobe, $kTop AS k,
                 CAST(count(*) AS BIGINT) AS n_overlap,
                 CAST(count(*) AS DOUBLE) / $kTop AS recall_at_k
          FROM (SELECT vec_id FROM n${np}_scored
                ORDER BY adc, vec_id LIMIT $kTop)
          WHERE vec_id IN (SELECT vec_id FROM pqexact)"""
    }.mkString("\nUNION ALL\n")
    s"""WITH ${if (pre.nonEmpty) pre + "," else ""}
             ${ivfPqBaseCtes(k1, m, subDim, kcode, iters, kTop, src = src,
               seed = seedCtesFromPp(pp, k1))},
             $armCtes
        $armSelects"""
  }

  /** x26: the re-ranked index's recall-vs-shortK curve at the declared
    * serving nprobe — the knob that actually moves on this index. Once
    * the probe reaches the right cell (x21: planted recall 1.0 at
    * nprobe=1), x24's nprobe axis is flat by construction; what decides
    * serving recall is how wide an ADC shortlist the exact re-rank gets
    * to repair — i.e. how many of the true top-k survive the code cut.
    * Cost is linear in shortK (shortK point reads of full-precision
    * vectors per query), so this curve IS the latency/recall trade a
    * deployment tunes.
    */
  val PqShortArms: Seq[Int] = Seq(50, 200, 800)

  def ivfPqRerankCurve(emb: DataFrame, kTop: Int = 10,
      pp: Boolean = Serve.Pp, nprobe: Int = 2, m: Int = Serve.M,
      subDim: Int = Serve.SubDim, kcode: Int = Serve.Kcode): DataFrame = {
    // nprobe is fixed across arms, so the probe/ADC-score/exact pipeline
    // is built ONCE and each arm only re-cuts the shortlist — mirroring
    // the oracle's shared `scored` block. Checkpointed: the arms are
    // plan CUTS, and without materialization each re-executed the full
    // ADC scan (3× the scoring work for identical values).
    val (scored0, a1, q, exact) =
      ivfPqCore(emb, Serve.K1Default, m, subDim, kcode, Serve.Iters,
        nprobe, kTop, pp)
    val scored = graft.util.Caches.retainCheckpointed(scored0)
    def arm(sk: Int): DataFrame =
      rerankTail(scored, a1, q, exact, sk, kTop)
        .agg(count(when(col("in_exact_topk"), lit(1))).as("n_overlap"))
        .select(lit(sk).as("short_k"), lit(kTop).as("k"), col("n_overlap"),
          (col("n_overlap").cast("double") / kTop).as("recall_at_k"))
    PqShortArms.map(arm).reduce(_.unionByName(_))
  }

  def ivfPqRerankCurveSql(k1: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, Serve.K1Default),
      m: Int = Serve.M, subDim: Int = Serve.SubDim,
      kcode: Int = Serve.Kcode, iters: Int = Serve.Iters,
      nprobe: Int = 2, kTop: Int = 10, src: String = "embeddings",
      pre: String = "", pp: Boolean = Serve.Pp): String = {
    // ONE probe/LUT/score block (nprobe fixed) shared by every arm; each
    // arm only re-cuts the shortlist and re-ranks.
    val armCtes = PqShortArms
      .map(sk => ivfPqRerankCte(iters, sk, kTop, pfx = s"s${sk}_",
        scoredName = "scored"))
      .mkString(",\n")
    val armSelects = PqShortArms.map { sk =>
      s"""SELECT $sk AS short_k, $kTop AS k,
                 CAST(count(*) AS BIGINT) AS n_overlap,
                 CAST(count(*) AS DOUBLE) / $kTop AS recall_at_k
          FROM (SELECT vec_id FROM s${sk}_rr)
          WHERE vec_id IN (SELECT vec_id FROM pqexact)"""
    }.mkString("\nUNION ALL\n")
    s"""WITH ${if (pre.nonEmpty) pre + "," else ""}
             ${ivfPqBaseCtes(k1, m, subDim, kcode, iters, kTop, src = src,
               seed = seedCtesFromPp(pp, k1))},
             ${ivfPqProbeCtes(m, subDim, nprobe)},
             $armCtes
        $armSelects"""
  }

  /** x27: FILTERED ANN — the "vector search + metadata predicate" problem
    * every production deployment hits: the true answer is the top-k AMONG
    * rows satisfying the filter, and the two classic strategies differ in
    * both cost and correctness:
    *   - PRE-FILTER: apply the predicate first, exact-rank the survivors.
    *     Spark-first this is the plan you want at selective predicates —
    *     the filter is a plain column predicate, so it reaches the
    *     parquet scan (PushedFilters; at 100 TB with label a partition
    *     column, partition pruning) and the exact kernel touches only
    *     survivors. ALWAYS correct.
    *   - POST-FILTER: run the unfiltered ANN top-k, then filter. Cheap
    *     (index-speed) but structurally lossy: matching vectors pushed
    *     out of the unfiltered top-k by non-matching neighbors are GONE —
    *     the classic post-filter recall hole.
    * The declared contract returns the pre-filter exact answer with an
    * `in_postfilter` flag per row (the x09/x18 inline-measurement
    * discipline applied to filtering): the flag column IS the measured
    * recall hole, hash-gated at every SF. Cost shape: the pre arm is one
    * pushed-down scan + TakeOrdered (no shuffle); the post arm reuses the
    * checkpointed IVF index and its ≤ k rows join broadcast.
    */
  def filteredKnn(emb: DataFrame, kDefault: Int = 8, iters: Int = 2,
      nprobe: Int = 2, target: Int = 3, kTop: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val q = emb.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val pre = emb.filter(col("label") === target)
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", expr("graft_cos(embedding, qe)"))
      .select("vec_id", "label", "cos_sim")
      .orderBy(col("cos_sim").desc, col("vec_id")).limit(kTop)
    val post = knnIvfLearnedProbe(emb, kDefault, iters, nprobe, kTop)
      .select(col("vec_id").as("pvid"))
    // the ≤ k post-filter candidates broadcast against the label column;
    // the corpus never exchanges for the flag
    val postMatching = emb.select(col("vec_id").as("lvid"), col("label"))
      .join(broadcast(post), col("lvid") === col("pvid"))
      .filter(col("label") === target)
      .select(col("pvid"))
    pre.join(broadcast(postMatching), col("vec_id") === col("pvid"),
        "left_outer")
      .select(col("vec_id"), col("label"), col("cos_sim"),
        col("pvid").isNotNull.as("in_postfilter"))
  }

  def filteredKnnSql(k: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, 8),
      iters: Int = 2, nprobe: Int = 2, target: Int = 3,
      kTop: Int = 10): String =
    s"""WITH fq AS (SELECT vec_id AS q_id, embedding AS qe
                    FROM embeddings ORDER BY vec_id LIMIT 1),
             pre AS (SELECT e.vec_id, e.label,
                            ${duckCos("e.embedding", "qe")} AS cos_sim
                     FROM embeddings e, fq
                     WHERE e.label = $target AND e.vec_id <> q_id
                     ORDER BY cos_sim DESC, e.vec_id LIMIT $kTop),
             post AS (SELECT t.vec_id
                      FROM (${knnIvfLearnedProbeSql(k, iters, nprobe,
                              kTop)}) t
                      JOIN embeddings l ON t.vec_id = l.vec_id
                      WHERE l.label = $target)
        SELECT p.vec_id, p.label, p.cos_sim,
               p.vec_id IN (SELECT vec_id FROM post) AS in_postfilter
        FROM pre p"""

  /** x28: INLINE-FILTERED IVF-PQ serving — the production middle path x27
    * deliberately left open (round-12 verdict item 3). x27's two arms are
    * the endpoints: pre-filter exact (always correct, costs a full filtered
    * exact pass) and post-filter (index-speed, structurally lossy). The
    * shape a real vector store ships sits between them: the predicate is
    * applied INSIDE the probed-cell scan, BEFORE ADC scoring and the
    * shortlist — matching vectors can never be displaced by non-matching
    * neighbors (the post-filter hole is closed by construction), and a
    * selective predicate costs nprobe pruned scans plus a shortK exact
    * re-rank, never a full exact pass.
    *
    * Plan shape (the serving scan is s31's online-encode form, batch):
    * ONE parquet scan of the corpus with the label predicate PUSHED TO THE
    * SCAN (PushedFilters — x27's pre-arm discipline; at 100 TB with label
    * a partition column, partition pruning), each survivor's coarse cell
    * assigned against the broadcast trained-centroid artifact (bit-for-bit
    * the batch cell — s30's pinned contract), pruned to the query's nprobe
    * probed cells by a broadcast join BEFORE any scoring, residualized
    * against the broadcast serving centroid, encode+ADC-scored inline
    * ([[adcTermExpr]] — identical values to the stored-codes LUT join the
    * oracle runs), shortlisted by (adc, vec_id), and the ≤ shortK
    * survivors re-ranked exactly. With STORED label-bearing codes the same
    * plan is a codes-table scan with cell partition-pruning + the label
    * filter pushed — the re-encode here is the deterministic stand-in
    * (codes are a pure function of (vector, codebooks)).
    *
    * The `in_filtered_exact_topk` flag marks each returned row's
    * membership in the pre-filter exact top-k (the always-correct answer),
    * so the residual loss — true filtered neighbors whose cell the probe
    * missed — is measured inline and hash-gated at every SF (x27's flag
    * discipline; [[ivfPqFilteredRerankCurve]] reads how shortK repairs the
    * in-cell part of it).
    */
  private def ivfPqFilteredCore(emb: DataFrame, k1Default: Int, m: Int,
      subDim: Int, kcode: Int, iters: Int, nprobe: Int,
      pred: org.apache.spark.sql.Column,
      kTop: Int, pp: Boolean): (DataFrame, DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val (a1, cv1, _, cbAll) =
      ivfPqIndex(emb, k1Default, m, subDim, kcode, iters, pp)
    val q = a1.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    // probed cells + per-cell serving centroid + query residual (x23's
    // probe, keeping pcv so survivors residualize against their own cell)
    val rq = cv1.crossJoin(broadcast(q))
      .withColumn("dq", expr("graft_l2(cv1, qe)"))
      .orderBy(col("dq"), col("rc1")).limit(nprobe)
      .select(col("rc1").as("pcell"), col("cv1").as("pcv"),
        expr("zip_with(qe, cv1, (x, y) -> x - y)").as("rqe"))
    val assignCents = kmeansTrainedCentroids(emb, k1Default, iters, pp)
    val adc = (0 until m).map(s => expr(adcTermExpr(s, subDim))).reduce(_ + _)
    // THE FILTERED SERVING SCAN: predicate at the source scan, cell prune
    // before scoring, everything else broadcast-sized.
    val scored = emb.filter(pred)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, ex -> CAST(ex AS DOUBLE))").as("e"))
      .crossJoin(broadcast(assignCents))
      .withColumn("best", expr(bestCellExpr))
      .select(col("vec_id"), col("label"), col("e"), col("best.c").as("c1"))
      .join(broadcast(rq), col("c1") === col("pcell"))
      .crossJoin(broadcast(q.select("q_id")))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("r", expr("zip_with(e, pcv, (x, y) -> x - y)"))
      .crossJoin(broadcast(cbAll))
      .select(col("vec_id"), col("label"), col("e"), col("c1"),
        adc.as("adc"))
    // the always-correct pre-filter exact top-k (x27's pre arm), for the
    // inline flag — one more pushed-down scan + TakeOrdered, no shuffle
    val fexact = emb.filter(pred)
      .select(col("vec_id"),
        expr("transform(embedding, ex -> CAST(ex AS DOUBLE))").as("e"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("d2x", expr("graft_l2(e, qe)"))
      .orderBy(col("d2x"), col("vec_id")).limit(kTop)
      .select(col("vec_id").as("evid"))
    (scored, q, fexact)
  }

  /** The shortlist-cut + exact-re-rank tail over a filtered ADC-scored
    * relation — survivors carry their own full-precision vectors from the
    * serving scan, so the re-rank needs no store lookup.
    */
  private def filteredRerankTail(scored: DataFrame, q: DataFrame,
      fexact: DataFrame, shortK: Int, kTop: Int): DataFrame =
    scored.orderBy(col("adc"), col("vec_id")).limit(shortK)
      .crossJoin(broadcast(q))
      .withColumn("d2", expr("graft_l2(e, qe)"))
      .select("vec_id", "label", "c1", "d2")
      .orderBy(col("d2"), col("vec_id")).limit(kTop)
      .join(broadcast(fexact), col("vec_id") === col("evid"), "left_outer")
      .select(col("vec_id"), col("label"), col("c1"), col("d2"),
        col("evid").isNotNull.as("in_filtered_exact_topk"))

  /** The x28 inline-filtered serving arm under an ARBITRARY predicate —
    * the FilteredSweep tool's entry for the selectivity crossover
    * measurement (BASELINE.md records the curve; the declared x28 keeps
    * the fixed label contract so its oracle stays expressible).
    */
  private[graft] def ivfPqFilteredRerankPred(emb: DataFrame,
      pred: org.apache.spark.sql.Column, nprobe: Int = 2,
      shortK: Int = Serve.ShortK, kTop: Int = 10): DataFrame = {
    val (scored, q, fexact) = ivfPqFilteredCore(emb, Serve.K1Default,
      Serve.M, Serve.SubDim, Serve.Kcode, Serve.Iters, nprobe, pred,
      kTop, Serve.Pp)
    filteredRerankTail(scored, q, fexact, shortK, kTop)
  }

  /** The x27 pre-filter-exact arm under an arbitrary predicate (always
    * correct; the sweep's other endpoint): pushed-down scan + one compiled
    * L2 per survivor + TakeOrdered.
    */
  private[graft] def filteredExactPred(emb: DataFrame,
      pred: org.apache.spark.sql.Column, kTop: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val q = emb.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("q_id"),
        expr("transform(embedding, ex -> CAST(ex AS DOUBLE))").as("qe"))
    emb.filter(pred)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, ex -> CAST(ex AS DOUBLE))").as("e"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("d2", expr("graft_l2(e, qe)"))
      .select("vec_id", "label", "d2")
      .orderBy(col("d2"), col("vec_id")).limit(kTop)
  }

  def ivfPqFilteredRerank(emb: DataFrame, k1Default: Int = Serve.K1Default,
      m: Int = Serve.M, subDim: Int = Serve.SubDim,
      kcode: Int = Serve.Kcode, iters: Int = Serve.Iters, nprobe: Int = 2,
      target: Int = 3, shortK: Int = Serve.ShortK, kTop: Int = 10,
      pp: Boolean = Serve.Pp): DataFrame = {
    val (scored, q, fexact) = ivfPqFilteredCore(emb, k1Default, m, subDim,
      kcode, iters, nprobe, col("label") === target, kTop, pp)
    filteredRerankTail(scored, q, fexact, shortK, kTop)
  }

  def ivfPqFilteredRerankSql(k1: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, Serve.K1Default),
      m: Int = Serve.M, subDim: Int = Serve.SubDim,
      kcode: Int = Serve.Kcode, iters: Int = Serve.Iters,
      nprobe: Int = 2, target: Int = 3, shortK: Int = Serve.ShortK,
      kTop: Int = 10, src: String = "embeddings", pre: String = "",
      pp: Boolean = Serve.Pp): String =
    s"""WITH ${if (pre.nonEmpty) pre + "," else ""}
             ${ivfPqBaseCtes(k1, m, subDim, kcode, iters, kTop, src = src,
               seed = seedCtesFromPp(pp, k1))},
             ${ivfPqProbeCtes(m, subDim, nprobe,
               extraJoin = s"JOIN $src l ON k.vec_id = l.vec_id",
               extraCond = s" AND l.label = $target",
               carry = ", l.label")},
             fexact AS (SELECT z.vec_id
                        FROM a$iters z JOIN $src l ON z.vec_id = l.vec_id, q
                        WHERE l.label = $target AND z.vec_id <> q_id
                        ORDER BY ${duckD2("z.e", "qe")}, z.vec_id
                        LIMIT $kTop),
             fshort AS (SELECT vec_id, label, c1 FROM scored
                        ORDER BY adc, vec_id LIMIT $shortK),
             frr AS (SELECT z.vec_id, s.label, s.c1,
                            ${duckD2("z.e", "qe")} AS d2
                     FROM a$iters z JOIN fshort s ON z.vec_id = s.vec_id, q
                     ORDER BY d2, z.vec_id LIMIT $kTop)
        SELECT t.vec_id, t.label, t.c1, t.d2,
               t.vec_id IN (SELECT vec_id FROM fexact)
                 AS in_filtered_exact_topk
        FROM frr t"""

  /** x29: x28's recall-vs-shortK curve on the planted corpus, filtered to
    * the QUERY'S OWN planted cell (label 0 — the lowest vec_id hashes to
    * cell 0 by [[clusteredLabelExpr]], a compile-time constant so the
    * predicate stays a pushed-down literal): the filter keeps exactly the
    * query's cluster mates, whose true distances differ by less than the
    * code quantization error — the worst case for raw ADC (x24's floor)
    * and therefore the sharpest read of how much of the filtered answer
    * each shortlist row buys back (x26's discipline under a predicate).
    */
  def ivfPqFilteredRerankCurve(emb: DataFrame, kTop: Int = 10,
      pp: Boolean = Serve.Pp, nprobe: Int = 2,
      target: Int = 0): DataFrame = {
    val (scored0, q, fexact) = ivfPqFilteredCore(
      emb, Serve.K1Default, Serve.M, Serve.SubDim, Serve.Kcode,
      Serve.Iters, nprobe, col("label") === target, kTop, pp)
    // arms are shortlist cuts of ONE scored relation — materialize it
    // (same rationale as ivfPqRerankCurve)
    val scored = graft.util.Caches.retainCheckpointed(scored0)
    def arm(sk: Int): DataFrame =
      filteredRerankTail(scored, q, fexact, sk, kTop)
        .agg(count(when(col("in_filtered_exact_topk"), lit(1)))
          .as("n_overlap"))
        .select(lit(sk).as("short_k"), lit(kTop).as("k"), col("n_overlap"),
          (col("n_overlap").cast("double") / kTop).as("recall_at_k"))
    PqShortArms.map(arm).reduce(_.unionByName(_))
  }

  def ivfPqFilteredRerankCurveSql(k1: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, Serve.K1Default),
      m: Int = Serve.M, subDim: Int = Serve.SubDim,
      kcode: Int = Serve.Kcode, iters: Int = Serve.Iters,
      nprobe: Int = 2, target: Int = 0, kTop: Int = 10,
      src: String = "embeddings", pre: String = "",
      pp: Boolean = Serve.Pp): String = {
    val armCtes = PqShortArms.map { sk =>
      s"""s${sk}_fshort AS (SELECT vec_id, label, c1 FROM scored
                    ORDER BY adc, vec_id LIMIT $sk),
          s${sk}_frr AS (SELECT z.vec_id
                  FROM a$iters z JOIN s${sk}_fshort s ON z.vec_id = s.vec_id,
                       q
                  ORDER BY ${duckD2("z.e", "qe")}, z.vec_id LIMIT $kTop)"""
    }.mkString(",\n")
    val armSelects = PqShortArms.map { sk =>
      s"""SELECT $sk AS short_k, $kTop AS k,
                 CAST(count(*) AS BIGINT) AS n_overlap,
                 CAST(count(*) AS DOUBLE) / $kTop AS recall_at_k
          FROM s${sk}_frr
          WHERE vec_id IN (SELECT vec_id FROM fexact)"""
    }.mkString("\nUNION ALL\n")
    s"""WITH ${if (pre.nonEmpty) pre + "," else ""}
             ${ivfPqBaseCtes(k1, m, subDim, kcode, iters, kTop, src = src,
               seed = seedCtesFromPp(pp, k1))},
             ${ivfPqProbeCtes(m, subDim, nprobe,
               extraJoin = s"JOIN $src l ON k.vec_id = l.vec_id",
               extraCond = s" AND l.label = $target",
               carry = ", l.label")},
             fexact AS (SELECT z.vec_id
                        FROM a$iters z JOIN $src l ON z.vec_id = l.vec_id, q
                        WHERE l.label = $target AND z.vec_id <> q_id
                        ORDER BY ${duckD2("z.e", "qe")}, z.vec_id
                        LIMIT $kTop),
             $armCtes
        $armSelects"""
  }

  /** x13: the learned-cell family's RECALL GATE (x06's discipline applied
    * to x12/x14) — recall@k of the IVF probe against x01's exact top-k, as
    * a recall-vs-nprobe CURVE: one row per nprobe ∈ {1, 2}. This is the
    * shippability number the round-9 quantizer lacked: it decides whether
    * nprobe=1 serving is acceptable or the index needs more probes (or
    * more cells). Evaluation adds only broadcast-sized semi-joins on the
    * three tiny top-k relations.
    */
  def ivfRecallCurve(emb: DataFrame, kTop: Int = 10,
      pp: Boolean = false): DataFrame =
    ivfRecallCurveArms(emb, kTop, pp, None)

  /** x31's entry: the same curve under an EXPLICIT seed mode — the gate
    * that grades the k-means|| initializer's serving quality on the
    * planted corpus (x21's discipline for the new seeder: every
    * initializer ships with its recall gate).
    */
  private[graft] def ivfRecallCurveMode(emb: DataFrame, kTop: Int,
      mode: SeedMode): DataFrame =
    ivfRecallCurveArms(emb, kTop, pp = false, Some(mode))

  private def ivfRecallCurveArms(emb: DataFrame, kTop: Int, pp: Boolean,
      mode: Option[SeedMode]): DataFrame = {
    val exact = knnBrute(emb, kTop).select(col("vec_id"))
    def arm(nprobe: Int, approx: DataFrame): DataFrame =
      exact.join(approx.select("vec_id"), Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_overlap"))
        .select(lit(nprobe).as("nprobe"), lit(kTop).as("k"),
          col("n_overlap"),
          (col("n_overlap").cast("double") / kTop).as("recall_at_k"))
    arm(1, knnIvfLearned(emb, kTop = kTop, pp = pp, mode = mode))
      .unionByName(arm(2,
        knnIvfLearnedProbe(emb, nprobe = 2, kTop = kTop, pp = pp,
          mode = mode)))
  }

  /** `pre` prepends extra CTEs right after WITH (e.g. the clustered-corpus
    * derivation, with `src` pointing at it); `pp` switches the oracle's
    * seed to the farthest-point chain — both must mirror the engine call.
    */
  def ivfRecallCurveSql(k: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, 8),
      iters: Int = 2, kTop: Int = 10, src: String = "embeddings",
      pre: String = "", pp: Boolean = false,
      parallelSeed: Boolean = false): String =
    s"""WITH ${if (pre.nonEmpty) pre + "," else ""}
             ${kmeansAssignCtes(k, iters, src = src,
               seed = if (parallelSeed) Some(parallelSeedCtes(k))
                 else seedCtesFromPp(pp, k))},
             ${kmeansServeCentroidsCtes(iters)},
             q AS (SELECT vec_id AS q_id, e AS qe, cluster AS q_cell
                   FROM a$iters ORDER BY vec_id LIMIT 1),
             exact AS (SELECT vec_id FROM (${knnBruteSql(kTop, src = src)})),
             arm1 AS (SELECT z.vec_id
                      FROM a$iters z, q
                      WHERE z.cluster = q_cell AND z.vec_id <> q_id
                      ORDER BY ${duckCos("z.e", "qe")} DESC, z.vec_id
                      LIMIT $kTop),
             probe AS (SELECT cluster AS pcell FROM cvF, q
                       ORDER BY ${duckD2("cvec", "qe")}, cluster LIMIT 2),
             arm2 AS (SELECT z.vec_id
                      FROM a$iters z, q
                      WHERE z.cluster IN (SELECT pcell FROM probe)
                        AND z.vec_id <> q_id
                      ORDER BY ${duckCos("z.e", "qe")} DESC, z.vec_id
                      LIMIT $kTop)
        SELECT 1 AS nprobe, $kTop AS k,
               CAST(count(*) AS BIGINT) AS n_overlap,
               CAST(count(*) AS DOUBLE) / $kTop AS recall_at_k
        FROM exact WHERE vec_id IN (SELECT vec_id FROM arm1)
        UNION ALL
        SELECT 2 AS nprobe, $kTop AS k,
               CAST(count(*) AS BIGINT) AS n_overlap,
               CAST(count(*) AS DOUBLE) / $kTop AS recall_at_k
        FROM exact WHERE vec_id IN (SELECT vec_id FROM arm2)"""

  /** x33: the SAMPLED-QUERIES recall gate — the standard ANN-benchmark
    * evaluation form (fixed query set, recall@k per query), which is what
    * makes recall gates AFFORDABLE at production scale: the exact
    * comparison arm costs O(n·|Q|) — one corpus pass against a broadcast
    * of nq content-hash-picked queries — instead of a per-gate cost that
    * grows with whatever the gate happens to train (x31's shape pays its
    * full trained-probe chain per run; at sf10 that wall was ~21 s).
    *
    * Query selection is the q68 discipline: the nq corpus vectors ranked
    * lowest by a pure hash of vec_id ((id % P)·2654435761 % P, the u01Sql
    * spread constant) — a deterministic, partition-independent,
    * engine-portable pick; `sample()`'s RNG is none of those. Both top-k
    * arms run through the TopKPerKey physical operator (x07's kNN-join
    * shape): per-partition heaps keep ≤ |Q|·kTop rows BEFORE the exchange,
    * so the shuffle never carries the n·|Q| scored relation a window-rank
    * plan would ship. Output: one row per query (q_id, k, n_overlap,
    * recall_at_k) — the per-query curve an index owner actually reads.
    */
  def ivfRecallSampled(emb: DataFrame, kTop: Int = 10, nq: Int = 8,
      mode: SeedMode = SeedMode.Parallel,
      nprobes: Seq[Int] = Seq(1, 2)): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val k = graft.ext.Dedup.resolveCells(emb, 8)
    val assigned = graft.util.Caches.retainCheckpointed(
      kmeansAssignMode(emb, k, 2, mode)
        .select(col("vec_id"), col("e"), col("cluster")))
    val P = graft.ext.PortableHash.P
    val qs = assigned
      .withColumn("hq", expr(s"((vec_id % $P) * 2654435761) % $P"))
      .orderBy("hq", "vec_id").limit(nq) // TakeOrdered: no corpus sort
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    def topk(scored: DataFrame): DataFrame =
      graft.plans.TopKPerKey(scored, keys = Seq("q_id"),
        orderBy = Seq(("cs", false), ("vec_id", true)), k = kTop)
        .select("q_id", "vec_id")
    val exact = topk(assigned.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cs", expr("graft_cos(e, qe)"))
      .select("q_id", "vec_id", "cs"))
    // probe ranking is UNIFORM across the nprobe axis (top-n serving
    // centroids by (d², cell) per query — cvF in the oracle), so probed
    // cell sets are nested prefixes and recall is monotone in nprobe by
    // construction. |Q|·k scored cell rows, ranked through the same
    // TopKPerKey operator the arms use — no window anywhere in the plan.
    val scoredCells = assigned
      .agg(expr(s"graft_centroids(cluster, e, $k)").as("cents"))
      .select(explode(col("cents")).as("ct"))
      .select(col("ct.cluster").as("pcell"), col("ct.cvec").as("cvec"))
      .crossJoin(broadcast(qs))
      .withColumn("dq", expr("graft_l2(cvec, qe)"))
      .select("q_id", "pcell", "dq")
    def arm(np: Int): DataFrame = {
      val probe = graft.plans.TopKPerKey(scoredCells, keys = Seq("q_id"),
        orderBy = Seq(("dq", true), ("pcell", true)), k = np)
        .select("q_id", "pcell")
        .join(qs, Seq("q_id")) // re-attach qe: tiny × tiny
      val approx = topk(assigned.join(broadcast(probe),
          col("cluster") === col("pcell") && col("vec_id") =!= col("q_id"))
        .withColumn("cs", expr("graft_cos(e, qe)"))
        .select("q_id", "vec_id", "cs"))
      val hits = exact.join(approx, Seq("q_id", "vec_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("n_overlap"))
      qs.select("q_id").join(hits, Seq("q_id"), "left")
        .select(col("q_id"), lit(np).as("nprobe"), lit(kTop).as("k"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          (coalesce(col("n_overlap"), lit(0L)).cast("double") / kTop)
            .as("recall_at_k"))
    }
    nprobes.map(arm).reduce(_.unionByName(_))
  }

  /** Oracle twin of [[ivfRecallSampled]] — same hash-ranked query pick,
    * window-rank top-k arms, per-query overlap.
    */
  def ivfRecallSampledSql(k: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, 8),
      iters: Int = 2, kTop: Int = 10, nq: Int = 8,
      src: String = "embeddings", pre: String = "",
      nprobes: Seq[Int] = Seq(1, 2)): String = {
    val P = graft.ext.PortableHash.P
    val arms = nprobes.map { np =>
      s"""ap$np AS (SELECT q_id, vec_id FROM (
                      SELECT pq.q_id, z.vec_id,
                             ROW_NUMBER() OVER (PARTITION BY pq.q_id
                               ORDER BY ${duckCos("z.e", "pq.qe")} DESC,
                                        z.vec_id) AS rn
                      FROM a$iters z
                      JOIN (SELECT pr.q_id, pr.pcell, qs.qe
                            FROM pr JOIN qs USING (q_id)
                            WHERE pr.prn <= $np) pq
                        ON z.cluster = pq.pcell AND z.vec_id <> pq.q_id)
                    WHERE rn <= $kTop),
          hit$np AS (SELECT ex.q_id, CAST(count(*) AS BIGINT) AS n_overlap
                     FROM ex JOIN ap$np ON ex.q_id = ap$np.q_id
                                       AND ex.vec_id = ap$np.vec_id
                     GROUP BY ex.q_id)"""
    }.mkString(",\n")
    val selects = nprobes.map { np =>
      s"""SELECT qs.q_id, $np AS nprobe, $kTop AS k,
                 coalesce(hit$np.n_overlap, CAST(0 AS BIGINT)) AS n_overlap,
                 CAST(coalesce(hit$np.n_overlap, 0) AS DOUBLE) / $kTop
                   AS recall_at_k
          FROM qs LEFT JOIN hit$np ON qs.q_id = hit$np.q_id"""
    }.mkString(" UNION ALL ")
    s"""WITH ${if (pre.nonEmpty) pre + "," else ""}
             ${kmeansAssignCtes(k, iters, src = src,
               seed = Some(parallelSeedCtes(k)))},
             ${kmeansServeCentroidsCtes(iters)},
             qs AS MATERIALIZED (
               SELECT vec_id AS q_id, e AS qe
               FROM a$iters
               ORDER BY ((vec_id % $P) * 2654435761) % $P, vec_id
               LIMIT $nq),
             ex AS MATERIALIZED (SELECT q_id, vec_id FROM (
                      SELECT qs.q_id, z.vec_id,
                             ROW_NUMBER() OVER (PARTITION BY qs.q_id
                               ORDER BY ${duckCos("z.e", "qe")} DESC,
                                        z.vec_id) AS rn
                      FROM a$iters z, qs WHERE z.vec_id <> q_id)
                    WHERE rn <= $kTop),
             pr AS MATERIALIZED (
               SELECT qs.q_id, cvF.cluster AS pcell,
                      ROW_NUMBER() OVER (PARTITION BY qs.q_id
                        ORDER BY ${duckD2("cvF.cvec", "qs.qe")},
                                 cvF.cluster) AS prn
               FROM cvF, qs),
             $arms
        $selects"""
  }

  /** CTE chain shared by the kmeans oracles: `iters` Lloyd rounds unrolled
    * (assignment via ROW_NUMBER argmin with the same (dd, cluster)
    * tie-break the engine's fold applies); `a$iters` is the final
    * (vec_id, e, cluster, dd) assignment relation.
    */
  /** Oracle twin of [[farthestPointSeeds]] + the seed assignment: chained
    * 1-row CTEs k0..k{k-1} (each picks the argmax-min-distance vector via
    * the same bit-portable L2 fold and (distance DESC, vec_id) tie-break),
    * then `a0` = the argmin assignment against those centers — replacing
    * the default modulo-seed `a0` in [[kmeansAssignCtes]].
    */
  /** Feasibility bound for the k-STEP-UNROLLED oracle twins (farthest-point
    * chain, greedy recluster): their SQL TEXT is O(k²) characters —
    * measured ~1 GB at k=4096, an OOM just to BUILD the string. Beyond
    * this k the generated fragment fails LOUDLY at oracle evaluation
    * (guardAuto's poison discipline, scoped to the seed chain) instead of
    * materializing it; the recursed arm's twin is polynomial-size and
    * never needs the guard — which is exactly why gates above
    * ReclusterMaxK are recursed-arm gates (x32).
    */
  private[graft] val MaxUnrolledSeedK = 256
  private def unrolledSeedGuard(k: Int)(chain: => String): String =
    if (k <= MaxUnrolledSeedK) chain
    else s"""a0 AS (SELECT vec_id, e,
               CAST(error('unrolled seed oracle at k=$k: the k-step chain
 is O(k^2) SQL text; gate at k <= $MaxUnrolledSeedK, or above ReclusterMaxK
 where the polynomial recursed twin applies') AS INT) AS cluster,
               CAST(0 AS DOUBLE) AS dd
             FROM e0)"""

  def ppSeedCtes(k: Int): String = unrolledSeedGuard(k) {
    // Each k_j MATERIALIZED: under DuckDB's per-reference CTE inlining the
    // chain is exponential (k_j re-inlines k_0..k_{j-1}, each re-inlining
    // the corpus scan) — see the kmeansAssignCtes scaladoc.
    val ks = (0 until k).map { j =>
      if (j == 0)
        "k0 AS MATERIALIZED (SELECT e AS ce FROM e0 ORDER BY vec_id LIMIT 1)"
      else {
        val dists = (0 until j).map(i => duckD2("e", s"k$i.ce"))
        val md =
          if (dists.size == 1) dists.head
          else s"least(${dists.mkString(", ")})"
        val froms = (0 until j).map(i => s"k$i").mkString(", ")
        s"k$j AS MATERIALIZED (SELECT e AS ce FROM e0, $froms " +
          s"ORDER BY $md DESC, vec_id LIMIT 1)"
      }
    }.mkString(",\n")
    val cents = (0 until k)
      .map(j => s"SELECT $j AS cluster, ce AS cvec FROM k$j")
      .mkString(" UNION ALL ")
    s"""$ks,
        cents0 AS MATERIALIZED ($cents),
        d0 AS (SELECT vec_id, e, cents0.cluster AS cl,
                      ${duckD2("e", "cvec")} AS dd
               FROM e0, cents0),
        a0 AS MATERIALIZED (SELECT vec_id, e, cl AS cluster, dd
               FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dd, cl) AS rn
                     FROM d0) WHERE rn = 1)"""
  }

  /** Oracle twin of [[parallelSeeds]] + the seed assignment, fully
    * unrolled: ParSeed.Rounds sampling rounds (per-point min distance →
    * quantized cost sum → threshold admission on the shared [[u01Sql]]
    * draw), the rank/weight pass, ParSeed.Iters weighted Lloyd rounds over
    * the candidate set, then `cents0`/`a0` — a drop-in for [[ppSeedCtes]]
    * as kmeansAssignCtes' `seed`. Every multiply-referenced CTE is
    * MATERIALIZED (see the kmeansAssignCtes scaladoc — the sampling chain
    * is exponential under DuckDB's per-reference inlining).
    */
  def parallelSeedCtes(k: Int): String =
    parallelSeedCtesWith(k,
      recursed = k > graft.ext.Dedup.confInt(
        ParSeed.ReclusterMaxKKey, ParSeed.ReclusterMaxKDefault))

  /** The recursed-arm twin by name, for generators that force the arm the
    * way [[SeedMode.ParallelRecursed]] does (the x32 gate).
    */
  def parallelSeedRecursedCtes(k: Int): String =
    parallelSeedCtesWith(k, recursed = true)

  private def parallelSeedCtesWith(k: Int, recursed: Boolean): String =
    if (!recursed && k > MaxUnrolledSeedK) unrolledSeedGuard(k)("")
    else parallelSeedCtesBody(k, recursed)

  private def parallelSeedCtesBody(k: Int, recursed: Boolean): String = {
    val ell = ParSeed.OversampleX * k
    val nR = ParSeed.Rounds
    val nI = ParSeed.Iters
    val rounds = (1 to nR).map { r =>
      s"""sd$r AS (SELECT vec_id, MIN(${duckD2("e0.e", "s.ce")}) AS dd
                   FROM e0, sc${r - 1} s GROUP BY vec_id),
          sp$r AS (SELECT CAST(SUM(CAST(floor(dd * 67108864.0) AS BIGINT))
                               AS DOUBLE) / 67108864.0 AS phi FROM sd$r),
          sc$r AS MATERIALIZED (
            SELECT cid, ce FROM sc${r - 1}
            UNION ALL
            SELECT e0.vec_id AS cid, e0.e AS ce
            FROM e0 JOIN sd$r USING (vec_id), sp$r
            WHERE sd$r.dd > 0
              AND (phi = 0 OR ${u01Sql(r)} <
                  least(1.0, CAST($ell AS DOUBLE) * sd$r.dd / phi)))"""
    }.mkString(",\n")
    // The initial recluster assignment `wa0`, by arm:
    //   greedy (k <= ReclusterMaxK): k-center over the weighted candidate
    //     set — sg0 = candidate rank 0, sg_j = argmax min-distance with
    //     (md DESC, rn) tie-break — the chain the engine runs driver-side
    //     over the same O(k) rows. The CTE chain is k-step (exponential
    //     under inlining, hence MATERIALIZED), which is why gates for the
    //     RECURSED arm cannot simply raise k here.
    //   recursed (k > ReclusterMaxK): weight-ranked seeds — the k heaviest
    //     candidates, (w DESC, rn) tie-break, cluster = 0-based rank — a
    //     POLYNOMIAL-size chain at any k, mirroring
    //     [[Similarity.reclusterDistributed]].
    val seedArm =
      if (recursed)
        s"""rs AS MATERIALIZED (
              SELECT cl, ce FROM (
                SELECT ce, CAST(ROW_NUMBER() OVER (ORDER BY w DESC, rn) - 1
                               AS INT) AS cl
                FROM swt)
              WHERE cl < $k),
            gc AS MATERIALIZED (SELECT cl AS cluster, ce AS cvec FROM rs)"""
      else {
        val greedy = (1 until k).map { j =>
          val dists = (0 until j).map(i => duckD2("swt.ce", s"sg$i.ce"))
          val md =
            if (dists.size == 1) dists.head
            else s"least(${dists.mkString(", ")})"
          val froms = (0 until j).map(i => s"sg$i").mkString(", ")
          s"""sg$j AS MATERIALIZED (SELECT swt.ce AS ce FROM swt, $froms
                ORDER BY $md DESC, swt.rn LIMIT 1)"""
        }.mkString(",\n")
        val gcents = (0 until k)
          .map(j => s"SELECT $j AS cluster, ce AS cvec FROM sg$j")
          .mkString(" UNION ALL ")
        s"""sg0 AS MATERIALIZED (SELECT ce FROM swt WHERE rn = 0),
            $greedy,
            gc AS MATERIALIZED ($gcents)"""
      }
    def wRecompute(i: Int, prev: String): String =
      s"""wpe$i AS (SELECT cluster, w, gi - 1 AS pos, ce[gi] AS v
                    FROM $prev, UNNEST(range(1, len(ce) + 1)) AS t(gi)),
          wc$i AS (SELECT cluster, pos,
                          CAST(SUM(CAST(floor(v * 1048576.0) AS BIGINT) * w)
                               AS DOUBLE) / 1048576.0
                            / CAST(SUM(w) AS DOUBLE) AS c
                   FROM wpe$i GROUP BY 1, 2),
          wcv$i AS MATERIALIZED (SELECT cluster, list(c ORDER BY pos) AS cvec
                   FROM wc$i GROUP BY 1)"""
    def wReassign(i: Int): String =
      s"""wad$i AS (SELECT s.rn, s.ce, s.w, wcv$i.cluster AS cl,
                           ${duckD2("s.ce", "cvec")} AS dd
                    FROM swt s, wcv$i),
          wa$i AS (SELECT rn, ce, w, cl AS cluster
                   FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY rn
                                ORDER BY dd, cl) AS rnk
                         FROM wad$i) WHERE rnk = 1)"""
    val lloyd = (1 to nI).map { i =>
      val rec = wRecompute(i, s"wa${i - 1}")
      if (i < nI) rec + ",\n" + wReassign(i) else rec
    }.mkString(",\n")
    s"""sc0 AS MATERIALIZED (SELECT vec_id AS cid, e AS ce FROM e0
               ORDER BY vec_id LIMIT 1),
        $rounds,
        scF AS MATERIALIZED (SELECT cid, ce,
                 CAST(ROW_NUMBER() OVER (ORDER BY cid) - 1 AS INT) AS rn
               FROM sc$nR),
        swd AS (SELECT e0.vec_id, scF.rn, ${duckD2("e0.e", "scF.ce")} AS dd
                FROM e0, scF),
        swn AS (SELECT rn, CAST(COUNT(*) AS BIGINT) AS w
                FROM (SELECT vec_id, rn, ROW_NUMBER() OVER (
                          PARTITION BY vec_id ORDER BY dd, rn) AS rnk
                      FROM swd) WHERE rnk = 1 GROUP BY rn),
        swt AS MATERIALIZED (SELECT scF.rn, scF.ce, swn.w
               FROM scF JOIN swn USING (rn)),
        $seedArm,
        gd AS (SELECT swt.rn, swt.ce, swt.w, gc.cluster AS cl,
                      ${duckD2("swt.ce", "cvec")} AS dd
               FROM swt, gc),
        wa0 AS (SELECT rn, ce, w, cl AS cluster
                FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY rn
                             ORDER BY dd, cl) AS rnk
                      FROM gd) WHERE rnk = 1),
        $lloyd,
        cents0 AS MATERIALIZED (SELECT cluster, cvec FROM wcv$nI),
        d0 AS (SELECT vec_id, e, cents0.cluster AS cl,
                      ${duckD2("e", "cvec")} AS dd
               FROM e0, cents0),
        a0 AS MATERIALIZED (SELECT vec_id, e, cl AS cluster, dd
               FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dd, cl) AS rn
                     FROM d0) WHERE rn = 1)"""
  }

  /** `prefix` renames every CTE in the chain (e0 → ${prefix}e0, …) so two
    * chains can coexist in one WITH (x16 unrolls a second Lloyd chain over
    * residuals). `seed` overrides the modulo-seed a0 and is only valid
    * with the default (empty) prefix — [[ppSeedCtes]] references the
    * unprefixed e0.
    */
  /** Every multiply-referenced CTE in these chains is `AS MATERIALIZED`
    * (DuckDB-only syntax — these strings never reach Spark): DuckDB
    * INLINES plain CTEs per reference, so a chain whose tail references
    * its head fan-multiplies the base-table scans — the farthest-point
    * seed chain (k_j references k_0..k_{j-1}) is EXPONENTIAL under
    * inlining, and composing chains (x23-x26: seed + m codebook chains +
    * per-arm probes) blew past a 20k file-handle limit re-opening the
    * same parquet. Materialization computes each relation once, which is
    * also what the engine's retained caches do — the twins now share the
    * evaluation shape, not just the values.
    */
  def kmeansAssignCtes(k: Int = 8, iters: Int = 2,
      src: String = "embeddings", seed: Option[String] = None,
      prefix: String = ""): String = {
    require(seed.isEmpty || prefix.isEmpty,
      "seed CTEs reference the unprefixed e0/a0 names")
    val p = prefix
    def round(i: Int, prev: String): String =
      s"""${p}pe$i AS (SELECT cluster, i - 1 AS pos, e[i] AS val
                   FROM $prev, UNNEST(range(1, len(e) + 1)) AS t(i)),
          ${p}c$i AS (SELECT cluster, pos,
                         CAST(SUM(CAST(floor(val * 1048576.0) AS BIGINT))
                              AS DOUBLE) / 1048576.0 / COUNT(*) AS c
                  FROM ${p}pe$i GROUP BY 1, 2),
          ${p}cv$i AS (SELECT cluster, list(c ORDER BY pos) AS cvec
                   FROM ${p}c$i GROUP BY 1),
          ${p}d$i AS (SELECT vec_id, e, ${p}cv$i.cluster AS cl,
                         ${duckD2("e", "cvec")} AS dd
                  FROM ${p}e0, ${p}cv$i),
          ${p}a$i AS MATERIALIZED (SELECT vec_id, e, cl AS cluster, dd
                  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY dd, cl) AS rn
                        FROM ${p}d$i) WHERE rn = 1)"""
    val rounds = (1 to iters).map(i => round(i, s"${p}a${i - 1}")).mkString(",\n")
    val a0 = seed.getOrElse(
      s"""${p}a0 AS MATERIALIZED (
                 SELECT vec_id, e, CAST(vec_id % $k AS INT) AS cluster
                 FROM ${p}e0)""")
    s"""${p}e0 AS MATERIALIZED (SELECT vec_id,
                      list_transform(embedding, ex -> CAST(ex AS DOUBLE))
                        AS e
               FROM $src),
        $a0,
        $rounds"""
  }

  /** Oracle twin of [[kmeansSummary]] — k resolves from the same conf knob
    * the engine reads, at generation time (Dedup.confInt).
    */
  def kmeansSummarySql(k: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, 8),
      iters: Int = 2, seed: Option[String] = None): String =
    s"""WITH ${kmeansAssignCtes(k, iters, seed = seed)}
        SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(CAST(floor(dd * 67108864.0) AS BIGINT)) AS DOUBLE)
                 / 67108864.0 AS inertia,
               CAST($k - COUNT(*) OVER () AS BIGINT) AS n_empty_cells
        FROM a$iters GROUP BY cluster"""

  /** Oracle twin of [[kmeansSummaryPP]]: the same rollup over the
    * farthest-point-seeded assignment chain.
    */
  def kmeansSummaryPPSql(k: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, 8),
      iters: Int = 2): String =
    kmeansSummarySql(k, iters, seed = seedCtesFromPp(pp = true, k))

  /** Oracle twin of [[kmeansSummaryParallel]]: the same rollup over the
    * k-means||-seeded assignment chain.
    */
  def kmeansSummaryParallelSql(k: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, 8),
      iters: Int = 2): String =
    kmeansSummarySql(k, iters, seed = Some(parallelSeedCtes(k)))

  /** Oracle twin of [[kmeansSummaryParallelRecursed]]: the rollup over the
    * recursed-recluster-seeded chain (arm forced, like the engine's mode).
    */
  def kmeansSummaryParallelRecursedSql(k: Int = graft.ext.Dedup.confInt(
        graft.ext.Dedup.KmeansCellsKey, 24),
      iters: Int = 2): String =
    kmeansSummarySql(k, iters, seed = Some(parallelSeedRecursedCtes(k)))

  /** x06: ANN quality evaluation — recall@k of the LSH-pruned search (x02)
    * against the exact brute-force ranking (x01), the metric that decides
    * whether an ANN index's prune is shippable. Both top-k lists are tiny
    * (k rows), so the overlap is a semi-join of two broadcast-sized
    * relations and a scalar aggregate — evaluation costs nothing beyond the
    * two searches themselves at any data scale.
    */
  def annRecall(emb: DataFrame, kTop: Int = 10): DataFrame = {
    val exact = knnBrute(emb, kTop).select(col("vec_id"))
    val approx = knnLsh(emb, kTop).select(col("vec_id"))
    exact.join(approx, Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(kTop).as("k"), col("n_overlap"),
        (col("n_overlap").cast("double") / kTop).as("recall_at_k"))
  }

  def annRecallSql(kTop: Int = 10): String =
    s"""WITH exact AS (${knnBruteSql(kTop)}),
             approx AS (${knnLshSql(kTop)})
        SELECT $kTop AS k, CAST(count(*) AS BIGINT) AS n_overlap,
               CAST(count(*) AS DOUBLE) / $kTop AS recall_at_k
        FROM exact WHERE vec_id IN (SELECT vec_id FROM approx)"""

  /** Per-bucket occupancy histogram — the planning stat an ANN index needs
    * (bucket skew decides whether the prune is worth it).
    */
  def bucketHistogram(emb: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    emb.withColumn("bucket", expr("graft_lsh_bucket(embedding)"))
      .groupBy("bucket").agg(count(lit(1)).as("n_vecs"))
  }

  def bucketHistogramSql: String =
    s"""SELECT ${duckBucket("embedding")} AS bucket,
               CAST(count(*) AS BIGINT) AS n_vecs
        FROM embeddings GROUP BY 1"""
}

/** Time-series similarity search (per the retrieved EDBT time-series
  * similarity literature): daily activity profiles per user, Pearson
  * correlation against a target user over the days both were active,
  * top-10 most-similar. Decimal-exact moment sums (the Q34 discipline)
  * make the correlation reproducible under any partitioning.
  *
  * Scale: profiles are one groupBy; the target's profile broadcasts; the
  * per-user correlation is a second groupBy over the day-joined rows —
  * no pairwise blow-up (query-vs-all, not all-pairs).
  */
object TsSimilarity {
  import org.apache.spark.sql.types.DecimalType

  def topSimilarUsers(events: DataFrame, kTop: Int = 10): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), dayofmonth(col("ts")).as("dom"))
      .agg(sum(col("value").cast(DecimalType(12, 2))).cast("double").as("v"))
    val minUser = daily.select(min("user_id").as("t_uid"))
    val t = daily.join(broadcast(minUser), col("user_id") === col("t_uid"))
      .select(col("dom").as("t_dom"), col("v").as("tv"), col("t_uid"))
    daily.join(broadcast(t),
        col("dom") === col("t_dom") && col("user_id") =!= col("t_uid"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n"),
        sum(col("v").cast(DecimalType(18, 6))).cast("double").as("sx"),
        sum(col("tv").cast(DecimalType(18, 6))).cast("double").as("sy"),
        sum((col("v").cast(DecimalType(18, 6)) *
          col("v").cast(DecimalType(18, 6)))).cast("double").as("sxx"),
        sum((col("tv").cast(DecimalType(18, 6)) *
          col("tv").cast(DecimalType(18, 6)))).cast("double").as("syy"),
        sum((col("v").cast(DecimalType(18, 6)) *
          col("tv").cast(DecimalType(18, 6)))).cast("double").as("sxy"))
      .filter(col("n") >= 3)
      .select(col("user_id"), col("n"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) /
          (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
            sqrt(col("syy") - col("sy") * col("sy") / col("n"))))
          .as("corr_act"))
      .orderBy(col("corr_act").desc, col("user_id"))
      .limit(kTop)
  }

  val topSimilarUsersSql: String =
    """WITH daily AS (
         SELECT user_id, day(ts) AS dom,
                CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
         FROM events GROUP BY user_id, day(ts)),
       t AS (SELECT dom AS t_dom, v AS tv,
                    (SELECT min(user_id) FROM daily) AS t_uid
             FROM daily WHERE user_id = (SELECT min(user_id) FROM daily)),
       m AS (SELECT user_id,
                    CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sx,
                    CAST(SUM(CAST(tv AS DECIMAL(18,6))) AS DOUBLE) AS sy,
                    CAST(SUM(CAST(v AS DECIMAL(18,6))
                             * CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
                    CAST(SUM(CAST(tv AS DECIMAL(18,6))
                             * CAST(tv AS DECIMAL(18,6))) AS DOUBLE) AS syy,
                    CAST(SUM(CAST(v AS DECIMAL(18,6))
                             * CAST(tv AS DECIMAL(18,6))) AS DOUBLE) AS sxy
             FROM daily JOIN t ON dom = t_dom AND user_id <> t_uid
             GROUP BY user_id)
       SELECT user_id, n,
              (sxy - sx * sy / n)
                / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n))
                AS corr_act
       FROM m WHERE n >= 3
       ORDER BY corr_act DESC, user_id LIMIT 10"""
}

object SimilarityQueries {
  // `def` for the same reason as DedupQueries: the x11/x12 oracle strings
  // resolve the kmeansCells conf at generation time.
  def queries: Seq[Q] = Seq(
    Q("x01_knn_brute",
      (s, d) => Similarity.knnBrute(Tables.embeddings(s, d)),
      Some(Similarity.knnBruteSql())),

    Q("x02_knn_lsh",
      (s, d) => Similarity.knnLsh(Tables.embeddings(s, d)),
      Some(Similarity.knnLshSql())),

    Q("x03_lsh_histogram",
      (s, d) => Similarity.bucketHistogram(Tables.embeddings(s, d)),
      Some(Similarity.bucketHistogramSql)),

    Q("x04_knn_ivf",
      (s, d) => Similarity.knnIvf(Tables.embeddings(s, d)),
      Some(Similarity.knnIvfSql())),

    Q("x05_ts_similarity",
      (s, d) => TsSimilarity.topSimilarUsers(Tables.events(s, d)),
      Some(TsSimilarity.topSimilarUsersSql)),

    Q("x06_ann_recall",
      (s, d) => Similarity.annRecall(Tables.embeddings(s, d)),
      Some(Similarity.annRecallSql())),

    // x07: kNN JOIN — k nearest corpus vectors for EVERY query in a query
    // set at once (the retrieval / near-dup-vs-eval workload; x01 is the
    // one-query special case). Broadcast the tiny query side, score per
    // (corpus row × query) map-side, then the custom TopKPerKey operator
    // keeps k per query BEFORE the exchange — the shuffle carries ≤
    // |queries|·k rows per input partition, never the |corpus|·|queries|
    // scored cross product a window-rank plan would ship.
    Q("x07_knn_join",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val emb = Tables.embeddings(s, d)
        val q = emb.orderBy("vec_id").limit(8)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val scored = emb.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cos_sim", expr("graft_cos(embedding, qe)"))
          .select("q_id", "vec_id", "label", "cos_sim")
        graft.plans.TopKPerKey(scored, keys = Seq("q_id"),
          orderBy = Seq(("cos_sim", false), ("vec_id", true)), k = 5)
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe
                          FROM embeddings ORDER BY vec_id LIMIT 8),
                    scored AS (SELECT q.q_id, e.vec_id, e.label,
                                      ${Similarity.duckCos("e.embedding", "q.qe")}
                                        AS cos_sim
                               FROM embeddings e, q WHERE e.vec_id <> q.q_id)
               SELECT q_id, vec_id, label, cos_sim FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                             ORDER BY cos_sim DESC, vec_id) AS rn
                 FROM scored) WHERE rn <= 5""")),

    // x08: MAXSIM late-interaction scoring (the ColBERT retrieval shape):
    // the query is MULTI-vector (label 0's 4 lowest vec_ids); each
    // candidate group (= label) scores as the mean over query vectors of
    // the max cosine to any of its vectors. Broadcast query side, map-side
    // cosine, then two partial-agg'd exchanges (max per (label, q_vec),
    // combine per label) — never a per-group vector collection. The mean
    // uses the floor-quantize + integer-sum discipline (sum of doubles is
    // order-sensitive; integer sums are not), divided by the
    // power-of-two constant 4·2^32 so the final double is exact in both
    // engines.
    Q("x08_maxsim",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val emb = Tables.embeddings(s, d)
        val qv = emb.filter(col("label") === 0).orderBy("vec_id").limit(4)
          .select(col("vec_id").as("q_vec"), col("embedding").as("qe"))
        emb.filter(col("label") =!= 0)
          .crossJoin(broadcast(qv))
          .withColumn("cos_sim", expr("graft_cos(embedding, qe)"))
          .groupBy("label", "q_vec").agg(max("cos_sim").as("mx"))
          .groupBy("label")
          .agg((sum(floor(col("mx") * lit(4294967296L)).cast("long"))
            .cast("double") / lit(1.7179869184e10)).as("maxsim_score"))
          .orderBy(col("maxsim_score").desc, col("label"))
          .limit(5)
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_vec, embedding AS qe
                          FROM embeddings WHERE label = 0
                          ORDER BY vec_id LIMIT 4),
                    sc AS (SELECT e.label, q.q_vec,
                                  max(${Similarity.duckCos("e.embedding", "q.qe")})
                                    AS mx
                           FROM embeddings e, q WHERE e.label <> 0
                           GROUP BY e.label, q.q_vec)
               SELECT label,
                      CAST(SUM(CAST(floor(mx * 4294967296) AS BIGINT))
                           AS DOUBLE) / 17179869184.0 AS maxsim_score
               FROM sc GROUP BY label
               ORDER BY maxsim_score DESC, label LIMIT 5""")),

    // x09: INT8 scalar-quantized retrieval — per-vector symmetric
    // quantization (code = round-half-up(x / max|x| × 127)) and ranking by
    // the INTEGER dot product of codes, flagged against the exact float
    // top-k (x01). This is the memory-side ANN lever next to the pruning
    // levers (x02 LSH, x04 IVF): 4× smaller vectors, integer SIMD-able
    // scoring — at 100 TB the quantized relation is what fits in cache
    // tiers, with the flag column as the shipped recall check. All
    // arithmetic is exact and portable: quantization in doubles with one
    // floor, scoring in int64 — no float accumulation anywhere, so the
    // ranking is bit-stable under any partitioning. Quantize + score are
    // the compiled graft_q127/graft_doti kernels (one codegen'd pass per
    // vector; the interpreted transform/zip_with HOF form measured ~6×
    // slower on the sf1 corpus).
    Q("x09_quantized_knn",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val coded = Tables.embeddings(s, d)
          .withColumn("code", expr("graft_q127(embedding)"))
          .filter(col("code").isNotNull)
        val q = coded.orderBy("vec_id").limit(1)
          .select(col("vec_id").as("q_id"), col("code").as("qc"))
        val exact = graft.ext.Similarity.knnBrute(Tables.embeddings(s, d))
          .select(col("vec_id").as("evid"))
        val top = coded.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("qdot", expr("graft_doti(code, qc)"))
          .select("vec_id", "label", "qdot")
          .orderBy(col("qdot").desc, col("vec_id")).limit(10)
        top.join(broadcast(exact), col("vec_id") === col("evid"),
            "left_outer")
          .select(col("vec_id"), col("label"), col("qdot"),
            col("evid").isNotNull.as("in_exact_topk"))
      },
      Some(s"""WITH c2 AS (SELECT vec_id, label,
                                  list_transform(embedding,
                                    x -> CAST(floor(CAST(x AS DOUBLE)
                                           / CAST(list_max(list_transform(
                                               embedding, y -> abs(y)))
                                             AS DOUBLE) * 127.0 + 0.5)
                                         AS BIGINT)) AS code
                           FROM embeddings
                           WHERE CAST(list_max(list_transform(embedding,
                                   y -> abs(y))) AS DOUBLE) > 0),
                    q AS (SELECT vec_id AS q_id, code AS qc FROM c2
                          ORDER BY vec_id LIMIT 1),
                    top AS (SELECT vec_id, label,
                                   CAST(list_sum(list_transform(
                                          range(1, len(code) + 1),
                                          i -> code[i] * qc[i]))
                                        AS BIGINT) AS qdot
                            FROM c2, q WHERE vec_id <> q_id
                            ORDER BY qdot DESC, vec_id LIMIT 10),
                    ex AS (SELECT vec_id FROM (${Similarity.knnBruteSql(10)}))
               SELECT t.vec_id, t.label, t.qdot,
                      t.vec_id IN (SELECT vec_id FROM ex) AS in_exact_topk
               FROM top t""")),

    // x10: TWO-STAGE retrieval — the production coarse-to-fine pattern:
    // an int8-quantized shortlist (x09's integer scoring, k×5 = 50 wide)
    // feeds an exact float-cosine re-rank that returns the final top-10.
    // The expensive exact kernel touches 50 rows instead of the corpus;
    // the shortlist stage is the int8 scan that fits cache tiers at
    // 100 TB. Both stages are deterministic (integer shortlist ranking,
    // the same graft_cos fold as x01 for the re-rank), so the two-stage
    // result is hash-stable — and on this corpus it recovers the exact
    // top-10 whenever the shortlist recall holds, which x09's flag
    // column measures.
    Q("x10_two_stage_knn",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val coded = Tables.embeddings(s, d)
          .withColumn("code", expr("graft_q127(embedding)"))
          .filter(col("code").isNotNull)
        val q = coded.orderBy("vec_id").limit(1)
          .select(col("vec_id").as("q_id"), col("code").as("qc"),
            col("embedding").as("qe"))
        val shortlist = coded.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("qdot", expr("graft_doti(code, qc)"))
          .orderBy(col("qdot").desc, col("vec_id")).limit(50)
        shortlist
          .withColumn("cos_sim", expr("graft_cos(embedding, qe)"))
          .select("vec_id", "label", "cos_sim")
          .orderBy(col("cos_sim").desc, col("vec_id")).limit(10)
      },
      Some(s"""WITH c2 AS (SELECT vec_id, label, embedding,
                                  list_transform(embedding,
                                    x -> CAST(floor(CAST(x AS DOUBLE)
                                           / CAST(list_max(list_transform(
                                               embedding, y -> abs(y)))
                                             AS DOUBLE) * 127.0 + 0.5)
                                         AS BIGINT)) AS code
                           FROM embeddings
                           WHERE CAST(list_max(list_transform(embedding,
                                   y -> abs(y))) AS DOUBLE) > 0),
                    q AS (SELECT vec_id AS q_id, code AS qc,
                                 embedding AS qe
                          FROM c2 ORDER BY vec_id LIMIT 1),
                    shortlist AS (SELECT vec_id, label, embedding, qe,
                                         CAST(list_sum(list_transform(
                                                range(1, len(code) + 1),
                                                i -> code[i] * qc[i]))
                                              AS BIGINT) AS qdot
                                  FROM c2, q WHERE vec_id <> q_id
                                  ORDER BY qdot DESC, vec_id LIMIT 50)
               SELECT vec_id, label,
                      ${Similarity.duckCos("embedding", "qe")} AS cos_sim
               FROM shortlist
               ORDER BY cos_sim DESC, vec_id LIMIT 10""")),

    // x11: k-means TRAINING (2 Lloyd rounds, k=8) — see
    // Similarity.kmeansSummary for the broadcast-assignment /
    // partial-agg-recompute scale design and the quantized determinism
    // discipline that makes an iterative float algorithm hash-gateable.
    Q("x11_kmeans",
      (s, d) => Similarity.kmeansSummary(Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(Similarity.kmeansSummarySql()))),

    // x12: IVF search over x11's trained cells (nprobe=1), sharing d17's
    // cached assignment relation — see Similarity.knnIvfLearned.
    Q("x12_knn_ivf_learned",
      (s, d) => Similarity.knnIvfLearned(Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(Similarity.knnIvfLearnedSql()))),

    // x13: recall@k of the learned-cell IVF probe vs x01's exact top-k,
    // one row per nprobe — the shippability gate for the x11-trained
    // quantizer (see Similarity.ivfRecallCurve).
    Q("x13_ivf_recall",
      (s, d) => Similarity.ivfRecallCurve(Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(Similarity.ivfRecallCurveSql()))),

    // x14: nprobe=2 IVF search — the recall/latency knob itself (see
    // Similarity.knnIvfLearnedProbe).
    Q("x14_knn_ivf_nprobe",
      (s, d) => Similarity.knnIvfLearnedProbe(Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(Similarity.knnIvfLearnedProbeSql()))),

    // x15: k-means under the PRODUCTION initializer — deterministic
    // farthest-point seeding (the derandomized k-means++ shape; see
    // Similarity.farthestPointSeeds). x11 keeps the modulo seed as the
    // baseline contract; both report empty cells loudly.
    Q("x15_kmeans_pp",
      (s, d) => Similarity.kmeansSummaryPP(Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(Similarity.kmeansSummaryPPSql()))),

    // x16: two-level residual quantizer — k1·k2 effective cells for
    // O(n·(k1+k2)·dim) assignment work, the measured crossover fix (see
    // Similarity.knnIvfTwoLevel).
    Q("x16_knn_ivf_two_level",
      (s, d) => Similarity.knnIvfTwoLevel(Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(Similarity.knnIvfTwoLevelSql()))),

    // x17: x16's recall gate vs the exact top-k (x13's discipline for
    // the two-level probe).
    Q("x17_two_level_recall",
      (s, d) => Similarity.twoLevelRecall(Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(Similarity.twoLevelRecallSql()))),

    // x18: product-quantization retrieval — m per-subspace codebooks,
    // asymmetric-distance (LUT) scoring in one shuffle-free corpus scan,
    // exact-L2 flag inline (see Similarity.pqKnn).
    Q("x18_pq_knn",
      (s, d) => Similarity.pqKnn(Tables.embeddings(s, d)),
      Some(Similarity.pqKnnSql())),

    // x19: multi-probe serving over the two-level index — x14's nprobe
    // pattern per level (p1 coarse cells, per-cell query residual, p2 fine
    // cells each), the serving story x16's single-cell probe lacked (see
    // Similarity.knnIvfTwoLevelProbe).
    Q("x19_two_level_nprobe",
      (s, d) => Similarity.knnIvfTwoLevelProbe(Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.knnIvfTwoLevelProbeSql()))),

    // x20: the multi-probe recall-vs-(p1,p2) curve — the gate that says
    // the two-level index HAS a usable retrieval path (x17's single-cell
    // gate reads 0.0; see Similarity.twoLevelRecallCurve).
    Q("x20_two_level_recall_curve",
      (s, d) => Similarity.twoLevelRecallCurve(Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.twoLevelRecallCurveSql()))),

    // x21: x13's IVF recall curve re-run on the PLANTED-CLUSTER corpus
    // (8 deterministic centers, within-cos ≈ 0.995 / between ≈ 0.07) under
    // the production farthest-point seeding — the gate that measures the
    // QUANTIZER, not the corpus's random geometry (the round-10 verdict's
    // reading of every prior recall number). On this geometry a trainer
    // that recovers the planted cells reads recall ≈ 1 at nprobe=1; one
    // that collapses reads ≈ the probed fraction.
    Q("x21_clustered_ivf_recall",
      (s, d) => Similarity.ivfRecallCurve(
        Similarity.clusteredCorpus(Tables.embeddings(s, d)), pp = true),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.ivfRecallCurveSql(src = "clustered",
          pre = Similarity.clusteredCteSql, pp = true)))),

    // x22: x20's two-level multi-probe recall curve on the same planted
    // corpus — the residual quantizer's curve measured where cluster
    // structure EXISTS to recover (see Similarity.clusteredCorpus).
    Q("x22_clustered_two_level_curve",
      (s, d) => Similarity.twoLevelRecallCurve(
        Similarity.clusteredCorpus(Tables.embeddings(s, d))),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.twoLevelRecallCurveSql(src = "clustered",
          pre = Similarity.clusteredCteSql)))),

    // x23: IVF-PQ — x16's coarse cells composed with x18's PQ codes: the
    // codebooks train on level-1 RESIDUALS and ADC scoring runs only
    // inside the probed cells (the production IVFADC index; see
    // Similarity.ivfPqKnn for the scale shape and determinism contract).
    Q("x23_ivfpq_knn",
      (s, d) => Similarity.ivfPqKnn(Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.ivfPqKnnSql()))),

    // x24: the RAW-ADC recall-vs-nprobe curve on the planted-cluster
    // corpus under the production (farthest-point) level-1 seeding — the
    // x21/x22 gate discipline applied to IVF-PQ. With the probe recovering
    // the planted cells (x21: recall 1.0 at nprobe=1), what this curve
    // reads is the CODE RESOLUTION floor: m·log2(kcode) bits cannot rank
    // within-cluster neighbors whose true distances differ by less than
    // the quantization error — the honestly-gated number that says raw
    // ADC needs x25's re-rank (exactly as x17's 0.0 said x16 needed x19).
    // The round-13 bits sweep (BASELINE.md) moved the default to 24 bits
    // (kcode=64): the floor lifts 0.2 -> 0.5 and shortK=50 saturates.
    Q("x24_ivfpq_recall_curve",
      (s, d) => Similarity.ivfPqRecallCurve(
        Similarity.clusteredCorpus(Tables.embeddings(s, d)), pp = true),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.ivfPqRecallCurveSql(src = "clustered",
          pre = Similarity.clusteredCteSql, pp = true)))),

    // x25: IVF-PQ + exact re-rank — the production serving path (ADC
    // shortlist of 50 within the probed cells, exact L2 re-rank to top-10;
    // see Similarity.ivfPqKnnRerank).
    Q("x25_ivfpq_rerank",
      (s, d) => Similarity.ivfPqKnnRerank(Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.ivfPqKnnRerankSql()))),

    // x26: the re-ranked index's recall-vs-shortK curve on the planted
    // corpus — the knob that actually moves once the probe reaches the
    // right cell: x24 reads the flat ADC floor, this curve reads how much
    // of it the exact re-rank buys back per shortlist row (see
    // Similarity.ivfPqRerankCurve).
    Q("x26_ivfpq_rerank_curve",
      (s, d) => Similarity.ivfPqRerankCurve(
        Similarity.clusteredCorpus(Tables.embeddings(s, d)), pp = true),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.ivfPqRerankCurveSql(src = "clustered",
          pre = Similarity.clusteredCteSql, pp = true)))),

    // x27: filtered ANN — pre-filter exact (predicate pushed to the scan)
    // with the post-filter arm's recall hole flagged per row (see
    // Similarity.filteredKnn: the two classic strategies, one declared
    // contract, the loss measured inline).
    Q("x27_filtered_knn",
      (s, d) => Similarity.filteredKnn(Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.filteredKnnSql()))),

    // x28: INLINE-filtered IVF-PQ serving — the production middle path
    // between x27's two arms: the label predicate applied inside the
    // probed-cell scan BEFORE ADC scoring and the shortlist, exact re-rank
    // on survivors; selective predicates cost nprobe pruned scans, never a
    // full exact pass (see Similarity.ivfPqFilteredCore for the plan shape
    // and the stored-codes equivalence).
    Q("x28_ivfpq_filtered",
      (s, d) => Similarity.ivfPqFilteredRerank(Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.ivfPqFilteredRerankSql()))),

    // x29: x28's recall-vs-shortK curve on the planted corpus, filtered to
    // the query's own planted cell — the filtered counterpart of x26's
    // repair curve (see Similarity.ivfPqFilteredRerankCurve).
    Q("x29_ivfpq_filtered_curve",
      (s, d) => Similarity.ivfPqFilteredRerankCurve(
        Similarity.clusteredCorpus(Tables.embeddings(s, d)), pp = true),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.ivfPqFilteredRerankCurveSql(src = "clustered",
          pre = Similarity.clusteredCteSql, pp = true)))),

    // x30: k-means under DETERMINISTIC k-means|| seeding (Bahmani et al.'s
    // oversampled initializer, derandomized via the q68 content-hash
    // discipline) — the SCALABLE production seeder: a constant number of
    // parallel sampling passes at any k, vs x15's k−1 sequential passes.
    // pp requests above ParSeed.PpMaxK (i.e. every auto-k index build)
    // route here automatically; this query is the small-k hash gate that
    // pins every stage against the fully unrolled oracle (see
    // Similarity.parallelSeeds).
    Q("x30_kmeans_parallel",
      (s, d) => Similarity.kmeansSummaryParallel(Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.kmeansSummaryParallelSql()))),

    // x32: k-means|| under the RECURSED candidate recluster (round-15
    // verdict item 1) — the arm production takes when k exceeds
    // ReclusterMaxK (where the driver-local greedy would be O(k²·dim)
    // flops), forced at k=24 so the weight-ranked-seed + distributed
    // weighted-Lloyd chain is pinned stage-by-stage against its unrolled
    // DuckDB twin. Greedy gates (x30) cannot cover this arm by raising k:
    // their oracle's k-center chain is k sequential CTEs; the recursed
    // twin is polynomial-size at any k.
    Q("x32_kmeans_recursed",
      (s, d) => Similarity.kmeansSummaryParallelRecursed(
        Tables.embeddings(s, d)),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.kmeansSummaryParallelRecursedSql()))),

    // x31: the k-means|| initializer's SERVING-QUALITY gate — x21's
    // planted-corpus recall curve under parallel seeding (every
    // initializer ships with its gate): a seeder that recovers the
    // planted cells reads recall ≈ 1 at nprobe=1; one that merges/splits
    // them reads the probed fraction. This is the number that justifies
    // routing auto-k builds to k-means|| (BASELINE.md round-14).
    Q("x31_parallel_ivf_recall",
      (s, d) => Similarity.ivfRecallCurveMode(
        Similarity.clusteredCorpus(Tables.embeddings(s, d)), 10,
        Similarity.SeedMode.Parallel),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.ivfRecallCurveSql(src = "clustered",
          pre = Similarity.clusteredCteSql, parallelSeed = true)))),

    // x33: the SAMPLED-QUERIES recall gate (round-15 verdict item 2) —
    // x31's quality question in the ANN-benchmark evaluation form: a
    // fixed content-hash-picked query set, recall@k PER QUERY, exact arm
    // O(n·|Q|) through the TopKPerKey pre-exchange heaps. This is the
    // gate shape that runs at production scale (sf10 wall recorded in
    // BASELINE.md round-15); x31 stays as the one-query curve whose
    // nprobe axis this gate does not sweep.
    Q("x33_sampled_recall",
      (s, d) => Similarity.ivfRecallSampled(
        Similarity.clusteredCorpus(Tables.embeddings(s, d))),
      Some(graft.ext.Dedup.guardAuto(graft.ext.Dedup.KmeansCellsKey)(
        Similarity.ivfRecallSampledSql(src = "clustered",
          pre = Similarity.clusteredCteSql))))
  )
}
