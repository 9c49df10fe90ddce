package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.apache.spark.sql.types.StructType

import graft.SparkSpec
import graft.sources.Tables
import graft.util.Scratch

/** Crash-mid-stream gate: an armed task-side counter makes every gated row
  * throw while armed. The session runs local[4, 2], so a few armed rows
  * exhaust task retries and terminate the QUERY with an uncommitted
  * micro-batch — the real crash the checkpoint protocol must absorb.
  * Static object state is task-visible because tests run in-process.
  */
object ChaosGate {
  private val armed = new java.util.concurrent.atomic.AtomicInteger(0)
  def arm(n: Int): Unit = armed.set(n)
  def disarm(): Unit = armed.set(0)
  def hit(): Unit =
    if (armed.getAndUpdate(n => if (n > 0) n - 1 else 0) > 0)
      throw new RuntimeException("chaos: injected crash")
}

/** Restart-at-batch-k chaos tests: each stateful streaming pipeline is run
  * once cleanly and once with an injected CRASH after micro-batch k commits
  * (query dies with an uncommitted batch in flight), then restarted from
  * its checkpoint. The two runs must produce identical final output — the
  * exactly-once contract across checkpoint recovery for the
  * transformWithState family (ValueState / timers / MapState / ListState on
  * RocksDB) and the DSv2 wire connector's source offsets and epoch sink.
  */
class StreamingChaosSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private lazy val s: SparkSession = spark
  import s.implicits._

  private val nFiles = 8

  /** events.parquet split into `nFiles` EVENT-TIME-ORDERED files with
    * strictly increasing mtimes, so every run (clean, chaos, restart)
    * slices the same maxFilesPerTrigger=1 micro-batches in the same order —
    * the s12/s17/s18 cross-batch ordering contract, and the determinism the
    * output comparison relies on.
    */
  private lazy val eventsSplit: (String, StructType) = {
    val raw = s.read.parquet(s"$sf/events.parquet")
    val dir = Scratch.dir("graft_chaos_src")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ts"))
    val sliced = raw.withColumn("__b", ntile(nFiles).over(w)).cache()
    (1 to nFiles).foreach { i =>
      val tmp = Scratch.dir(s"graft_chaos_tmp$i")
      sliced.filter(col("__b") === i).drop("__b")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(fail(s"no part file in $tmp"))
      val dst = new java.io.File(dir, f"events_$i%02d.parquet")
      Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(1700000000000L + i * 60000L))
    }
    sliced.unpersist()
    (dir, raw.schema)
  }

  private def gate(df: DataFrame): DataFrame = {
    val boom = udf((id: Long) => { ChaosGate.hit(); true })
    df.filter(boom(col("event_id")))
  }

  /** Run the pipeline over the split source three ways — clean, crashed at
    * batch k, restarted — and require the crashed+restarted output to equal
    * the clean run's. AvailableNow + maxFilesPerTrigger=1 → one micro-batch
    * per source file, so batch boundaries are identical across runs.
    */
  /** Scope RocksDB CHANGELOG checkpointing around `body`: commits upload a
    * per-batch changelog instead of a full snapshot, and recovery REPLAYS
    * changelogs on top of the last uploaded snapshot — a different
    * restore path than snapshot-load, and the production configuration for
    * large state at 100 TB (per-commit upload cost proportional to the
    * batch's delta, not the store size).
    */
  private def withChangelog[T](on: Boolean)(body: => T): T =
    if (!on) body
    else {
      val k = "spark.sql.streaming.stateStore.rocksdb." +
        "changelogCheckpointing.enabled"
      s.conf.set(k, "true")
      try body finally s.conf.unset(k)
    }

  private def chaosCompare(label: String, rocks: Boolean = true,
      changelog: Boolean = false)(
      xform: DataFrame => DataFrame): Unit = withChangelog(changelog) {
    val (srcDir, rawSchema) = eventsSplit
    def run(out: String, ckpt: String, kill: Option[Int]): Boolean = {
      def body: Boolean = {
        StreamingQ.withStateParts(s, StreamingQ.inletBytes(srcDir)) {
          val src = Tables.normalizeEvents(
            s.readStream.schema(rawSchema)
              .option("maxFilesPerTrigger", 1).parquet(srcDir))
          val q = xform(if (kill.isDefined) gate(src) else src)
            .writeStream.format("parquet").outputMode("append")
            .option("checkpointLocation", ckpt).option("path", out)
            .trigger(Trigger.AvailableNow()).start()
          kill match {
            case Some(k) =>
              val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
              while (q.isActive &&
                     Option(q.lastProgress).forall(_.batchId < k) &&
                     System.nanoTime() < deadline) Thread.sleep(5)
              ChaosGate.arm(64)
              val crashed =
                try { q.awaitTermination(); false }
                catch { case _: StreamingQueryException => true }
              ChaosGate.disarm()
              crashed
            case None =>
              q.awaitTermination(); false
          }
        }
      }
      if (rocks) StreamingQ.withRocksDb(s)(body) else body
    }

    val cleanOut = Scratch.dir(s"graft_chaos_${label}_clean_out")
    run(cleanOut, Scratch.dir(s"graft_chaos_${label}_clean_ck"), None)

    val out = Scratch.dir(s"graft_chaos_${label}_out")
    val ckpt = Scratch.dir(s"graft_chaos_${label}_ck")
    val crashed = run(out, ckpt, Some(1))
    assert(crashed, s"$label: injected crash did not terminate the query")
    val resumedCrash = run(out, ckpt, None) // restart from checkpoint
    assert(!resumedCrash)

    def rows(p: String): Seq[String] =
      s.read.parquet(p).collect().map(_.toString).sorted.toSeq
    assert(rows(out) === rows(cleanOut),
      s"$label: restarted output differs from uninterrupted run")
  }

  test("s12 ValueState survives a crash at batch k (restart = clean run)") {
    chaosCompare("s12")(StreamingQ.twsRunningMaxXform(s))
  }

  test("s16 event-time timers survive a crash at batch k") {
    chaosCompare("s16")(StreamingQ.timerSessionXform(s))
  }

  test("s17 MapState survives a crash at batch k") {
    chaosCompare("s17")(StreamingQ.mapStateXform(s))
  }

  test("s12 ValueState: crash recovery under changelog checkpointing") {
    chaosCompare("s12cc", changelog = true)(StreamingQ.twsRunningMaxXform(s))
  }

  test("s17 MapState: crash recovery under changelog checkpointing") {
    chaosCompare("s17cc", changelog = true)(StreamingQ.mapStateXform(s))
  }

  test("s18 ListState survives a crash at batch k") {
    chaosCompare("s18")(StreamingQ.listStateXform(s))
  }

  /** documents.parquet split into nFiles doc_id-ordered files (same
    * discipline as eventsSplit) for the s28 chaos run.
    */
  private lazy val docsSplit: (String, StructType) = {
    val raw = s.read.parquet(s"$sf/documents.parquet")
    val dir = Scratch.dir("graft_chaos_docs_src")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
    val sliced = raw.withColumn("__b", ntile(nFiles).over(w)).cache()
    (1 to nFiles).foreach { i =>
      val tmp = Scratch.dir(s"graft_chaos_dtmp$i")
      sliced.filter(col("__b") === i).drop("__b")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(fail(s"no part file in $tmp"))
      val dst = new java.io.File(dir, f"docs_$i%02d.parquet")
      Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(1700000000000L + i * 60000L))
    }
    sliced.unpersist()
    (dir, raw.schema)
  }

  /** Generic crash/restart driver over an arbitrary pre-split source dir;
    * returns whether the injected crash fired. `gateCol` is the column the
    * chaos UDF rides on.
    */
  private def runSplit(srcDir: String, schema: StructType, gateCol: String,
      xform: DataFrame => DataFrame, out: String, ckpt: String,
      kill: Option[Int]): Boolean =
    StreamingQ.withRocksDb(s) {
      StreamingQ.withStateParts(s, StreamingQ.inletBytes(srcDir)) {
        val boom = udf((id: Long) => { ChaosGate.hit(); true })
        val src0 = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
        val src = if (kill.isDefined) src0.filter(boom(col(gateCol))) else src0
        val q = xform(src).writeStream.format("parquet")
          .outputMode("append")
          .option("checkpointLocation", ckpt).option("path", out)
          .trigger(Trigger.AvailableNow()).start()
        kill match {
          case Some(k) =>
            val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
            while (q.isActive &&
                   Option(q.lastProgress).forall(_.batchId < k) &&
                   System.nanoTime() < deadline) Thread.sleep(5)
            ChaosGate.arm(64)
            val crashed =
              try { q.awaitTermination(); false }
              catch { case _: StreamingQueryException => true }
            ChaosGate.disarm()
            crashed
          case None => q.awaitTermination(); false
        }
      }
    }

  test("s28 bucket-min state survives a crash at batch k " +
      "(near-dup fold = clean run = batch oracle)") {
    val (srcDir, schema) = docsSplit

    def fold(p: String): Map[Long, Boolean] =
      s.read.parquet(p)
        .groupBy("doc_id").agg(bool_or(col("band_dup")).as("is_dup"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap

    val cleanOut = Scratch.dir("graft_chaos_s28_clean_out")
    runSplit(srcDir, schema, "doc_id", StreamingQ.nearDupXform(s),
      cleanOut, Scratch.dir("graft_chaos_s28_clean_ck"), None)

    val out = Scratch.dir("graft_chaos_s28_out")
    val ckpt = Scratch.dir("graft_chaos_s28_ck")
    assert(runSplit(srcDir, schema, "doc_id", StreamingQ.nearDupXform(s),
      out, ckpt, Some(2)), "s28: injected crash did not terminate the query")
    runSplit(srcDir, schema, "doc_id", StreamingQ.nearDupXform(s),
      out, ckpt, None) // restart from checkpoint

    val restarted = fold(out)
    assert(restarted === fold(cleanOut),
      "s28: restarted near-dup fold differs from uninterrupted run")
    // and both equal the batch pair relation the op is the online form of
    val docs = s.read.parquet(s"$sf/documents.parquet")
    val dupIds = graft.ext.Dedup.lshPairs(docs).collect()
      .map(_.getLong(1)).toSet
    restarted.foreach { case (id, flagged) =>
      assert(flagged === dupIds.contains(id),
        s"s28: doc $id verdict $flagged diverges from batch oracle")
    }
  }

  test("s29 per-query top-k state survives a crash at batch k " +
      "(post-drain rank = clean run = batch rank)") {
    // embeddings split by vec_id; the static query set reads from the
    // unsplit table exactly as the s29 catalog query does.
    val raw = s.read.parquet(s"$sf/embeddings.parquet")
    val dir = Scratch.dir("graft_chaos_emb_src")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    val sliced = raw.withColumn("__b", ntile(nFiles).over(w)).cache()
    (1 to nFiles).foreach { i =>
      val tmp = Scratch.dir(s"graft_chaos_etmp$i")
      sliced.filter(col("__b") === i).drop("__b")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(fail(s"no part file in $tmp"))
      val dst = new java.io.File(dir, f"emb_$i%02d.parquet")
      Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(1700000000000L + i * 60000L))
    }
    sliced.unpersist()

    graft.functions.GraftFunctions.register(s)
    val q = raw.orderBy("vec_id").limit(8)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val xform = StreamingQ.knnAdmitXform(s, q)(_)

    // The admission LOG is order-sensitive (a monotone threshold process);
    // the operator's declared output is the post-drain rank, which is
    // slicing- and order-independent — that is what must survive.
    def rank(p: String): Seq[String] = {
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
      s.read.parquet(p)
        .withColumn("rn", row_number().over(win)).filter(col("rn") <= 5)
        .drop("rn").collect().map(_.toString).sorted.toSeq
    }

    val cleanOut = Scratch.dir("graft_chaos_s29_clean_out")
    runSplit(dir, raw.schema, "vec_id", xform,
      cleanOut, Scratch.dir("graft_chaos_s29_clean_ck"), None)

    val out = Scratch.dir("graft_chaos_s29_out")
    val ckpt = Scratch.dir("graft_chaos_s29_ck")
    assert(runSplit(dir, raw.schema, "vec_id", xform, out, ckpt, Some(2)),
      "s29: injected crash did not terminate the query")
    runSplit(dir, raw.schema, "vec_id", xform, out, ckpt, None)

    val restarted = rank(out)
    assert(restarted === rank(cleanOut),
      "s29: restarted top-k rank differs from uninterrupted run")
    // and both equal the batch kNN rank (x07's relation)
    val expected = raw.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", expr("graft_cos(embedding, qe)"))
      .select(col("q_id"), col("vec_id"), col("label"), col("cos_sim"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
    val expRows = expected.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= 5).drop("rn")
      .collect().map(_.toString).sorted.toSeq
    assert(restarted === expRows,
      "s29: restarted rank diverges from the batch kNN relation")
  }

  test("s31 per-query ADC shortlist state survives a crash at batch k " +
      "(post-drain rank = clean run)") {
    // Same embeddings split as the s29 chaos test; the offline index
    // artifacts are trained from the unsplit table exactly as the s31
    // catalog query does. The admission LOG is order-sensitive; the
    // declared output is the post-drain rank — that is what must survive
    // the crash. (Batch equality of the full serve tail is the s31
    // oracle gate's job; this pins the STATE machinery across recovery.)
    val raw = s.read.parquet(s"$sf/embeddings.parquet")
    val dir = Scratch.dir("graft_chaos_s31_src")
    val w0 = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    val sliced = raw.withColumn("__b", ntile(nFiles).over(w0)).cache()
    (1 to nFiles).foreach { i =>
      val tmp = Scratch.dir(s"graft_chaos_s31_tmp$i")
      sliced.filter(col("__b") === i).drop("__b")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(fail(s"no part file in $tmp"))
      val dst = new java.io.File(dir, f"emb_$i%02d.parquet")
      Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(1700000000000L + i * 60000L))
    }
    sliced.unpersist()

    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, sf)
    val serve = graft.ext.Similarity.Serve
    val (a1, cv1, _, cbAll) = graft.ext.Similarity.ivfPqIndex(
      emb, serve.K1Default, serve.M, serve.SubDim, serve.Kcode,
      serve.Iters, pp = serve.Pp)
    val assignCents = graft.ext.Similarity.kmeansTrainedCentroids(
      emb, serve.K1Default, serve.Iters, pp = serve.Pp)
    val (_, probes) = graft.ext.Similarity.ivfPqQueryProbes(a1, cv1)
    val xform = StreamingQ.ivfPqServeXform(
      s, assignCents, cv1, cbAll, probes)(_)
    // The floored twin (round-19, ADVICE r18): floorParts=4 forces the
    // repartition-before-stateful-op branch that sf10's work floor takes
    // but gate-scale inlets never reach. The crashed+restarted run uses
    // it; equality against the UNfloored clean run pins both restart
    // recovery over the exchange and floor-invariance of the declared
    // post-drain rank in one assert.
    val xformFloored = StreamingQ.ivfPqServeXform(
      s, assignCents, cv1, cbAll, probes, floorParts = 4)(_)

    def rank(p: String): Seq[String] = {
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("adc"), col("vec_id"))
      s.read.parquet(p)
        .withColumn("rn", row_number().over(win)).filter(col("rn") <= 5)
        .drop("rn").collect().map(_.toString).sorted.toSeq
    }

    val cleanOut = Scratch.dir("graft_chaos_s31_clean_out")
    runSplit(dir, raw.schema, "vec_id", xform,
      cleanOut, Scratch.dir("graft_chaos_s31_clean_ck"), None)

    val out = Scratch.dir("graft_chaos_s31_out")
    val ckpt = Scratch.dir("graft_chaos_s31_ck")
    assert(runSplit(dir, raw.schema, "vec_id", xformFloored, out, ckpt,
        Some(2)),
      "s31: injected crash did not terminate the query")
    runSplit(dir, raw.schema, "vec_id", xformFloored, out, ckpt, None)

    val restarted = rank(out)
    assert(restarted.nonEmpty)
    assert(restarted === rank(cleanOut),
      "s31: restarted ADC shortlist rank differs from uninterrupted run")
  }

  test("s30 per-cell representative state survives a crash at batch k " +
      "(verdicts = clean run = batch oracle)") {
    // embeddings split into vec_id-ordered files (the ordered-replay
    // contract s30 declares): the earliest batch containing a cell holds
    // its global min id, so the representative is set once; the crash and
    // restart must neither lose it nor re-elect a different one.
    val raw = s.read.parquet(s"$sf/embeddings.parquet")
    val dir = Scratch.dir("graft_chaos_emb30_src")
    val w0 = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    val sliced = raw.withColumn("__b", ntile(nFiles).over(w0)).cache()
    (1 to nFiles).foreach { i =>
      val tmp = Scratch.dir(s"graft_chaos_e30tmp$i")
      sliced.filter(col("__b") === i).drop("__b")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(fail(s"no part file in $tmp"))
      val dst = new java.io.File(dir, f"emb30_$i%02d.parquet")
      Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(1700000000000L + i * 60000L))
    }
    sliced.unpersist()

    graft.functions.GraftFunctions.register(s)
    val cents = graft.ext.Similarity.kmeansTrainedCentroids(
      Tables.embeddings(s, sf))
    val xform = StreamingQ.semanticDedupXform(s, cents)(_)
    def rows(p: String): Seq[String] =
      s.read.parquet(p).collect().map(_.toString).sorted.toSeq

    val cleanOut = Scratch.dir("graft_chaos_s30_clean_out")
    runSplit(dir, raw.schema, "vec_id", xform,
      cleanOut, Scratch.dir("graft_chaos_s30_clean_ck"), None)

    val out = Scratch.dir("graft_chaos_s30_out")
    val ckpt = Scratch.dir("graft_chaos_s30_ck")
    assert(runSplit(dir, raw.schema, "vec_id", xform, out, ckpt, Some(2)),
      "s30: injected crash did not terminate the query")
    runSplit(dir, raw.schema, "vec_id", xform, out, ckpt, None)

    val restarted = rows(out)
    assert(restarted === rows(cleanOut),
      "s30: restarted verdicts differ from uninterrupted run")
    // and both equal the batch form: min-id rep per learned cell + the
    // same cos > tau admission via the shared kernels
    val a2 = graft.ext.Similarity.kmeansAssign(Tables.embeddings(s, sf))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster").orderBy("vec_id")
    val rep = a2.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("vec_id").as("rid"), col("e").as("re"))
    val isDup = col("vec_id") =!= col("rid") && expr("graft_cos(e, re)") > 0.3
    val exp = a2.join(rep, "cluster")
      .select(col("vec_id"), col("cluster"),
        when(isDup, col("rid")).otherwise(col("vec_id")).as("rep_id"),
        when(isDup, 1).otherwise(0).as("is_pruned"))
      .collect().map(_.toString).sorted.toSeq
    assert(restarted === exp,
      "s30: restarted verdicts diverge from the batch admission relation")
  }

  test("s13 wire streaming source: crash mid-topic, restart is exactly-once") {
    val sel = Tables.events(s, sf).select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), unix_micros(col("ts")).as("tsu"))
    val topic = Scratch.dir("graft_chaos_s13_topic")
    graft.pipeline.CsvWire.encode(sel, sel.schema)
      .repartition(6).write.mode("overwrite").text(topic)

    def drain(out: String, ckpt: String, kill: Option[Int]): Boolean =
      StreamingQ.withStateParts(s, StreamingQ.inletBytes(topic)) {
        val src = s.readStream.format("graft-wire").schema(sel.schema)
          .option("maxFilesPerTrigger", 1).load(topic)
        val piped = (if (kill.isDefined) gate(src) else src)
          .filter(col("value") > 10.0)
          .select("event_id", "event_type", "value")
        val q = piped.writeStream.format("parquet").outputMode("append")
          .option("checkpointLocation", ckpt).option("path", out)
          .trigger(Trigger.AvailableNow()).start()
        kill match {
          case Some(k) =>
            val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
            while (q.isActive &&
                   Option(q.lastProgress).forall(_.batchId < k) &&
                   System.nanoTime() < deadline) Thread.sleep(5)
            ChaosGate.arm(64)
            val crashed =
              try { q.awaitTermination(); false }
              catch { case _: StreamingQueryException => true }
            ChaosGate.disarm()
            crashed
          case None => q.awaitTermination(); false
        }
      }

    val cleanOut = Scratch.dir("graft_chaos_s13_clean_out")
    drain(cleanOut, Scratch.dir("graft_chaos_s13_clean_ck"), None)
    val out = Scratch.dir("graft_chaos_s13_out")
    val ckpt = Scratch.dir("graft_chaos_s13_ck")
    assert(drain(out, ckpt, Some(1)), "s13: injected crash did not trigger")
    drain(out, ckpt, None)
    def rows(p: String) =
      s.read.parquet(p).collect().map(_.toString).sorted.toSeq
    assert(rows(out) === rows(cleanOut))
  }

  test("s14 wire streaming sink: crash mid-epoch, replay replaces not appends") {
    val (srcDir, rawSchema) = eventsSplit

    def drain(topic: String, ckpt: String, kill: Option[Int]): Boolean =
      StreamingQ.withStateParts(s, StreamingQ.inletBytes(srcDir)) {
        val src = Tables.normalizeEvents(
          s.readStream.schema(rawSchema)
            .option("maxFilesPerTrigger", 1).parquet(srcDir))
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        val q = (if (kill.isDefined) gate(src) else src)
          .writeStream.format("graft-wire")
          .option("path", topic).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        kill match {
          case Some(k) =>
            val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
            while (q.isActive &&
                   Option(q.lastProgress).forall(_.batchId < k) &&
                   System.nanoTime() < deadline) Thread.sleep(5)
            ChaosGate.arm(64)
            val crashed =
              try { q.awaitTermination(); false }
              catch { case _: StreamingQueryException => true }
            ChaosGate.disarm()
            crashed
          case None => q.awaitTermination(); false
        }
      }

    val wireSchema = StructType(rawSchema.fields.filter(f =>
      Set("event_id", "user_id", "event_type", "value").contains(f.name)))
    def topicRows(topic: String) =
      s.read.format("graft-wire").schema(wireSchema).load(topic)
        .collect().map(_.toString).sorted.toSeq

    val cleanTopic = Scratch.dir("graft_chaos_s14_clean_topic")
    drain(cleanTopic, Scratch.dir("graft_chaos_s14_clean_ck"), None)
    val topic = Scratch.dir("graft_chaos_s14_topic")
    val ckpt = Scratch.dir("graft_chaos_s14_ck")
    assert(drain(topic, ckpt, Some(1)), "s14: injected crash did not trigger")
    drain(topic, ckpt, None)
    val files = new java.io.File(topic).listFiles().map(_.getName)
    assert(!files.exists(_.startsWith("_tmp_")),
      s"crashed epoch left staging files: ${files.mkString(",")}")
    assert(topicRows(topic) === topicRows(cleanTopic))
  }
}
