package graft.ext

import graft.SparkSpec

/** Contract checks on the parameterized trigram-LM scorer (t18 core). */
class TextOpsSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "pack my box with five dozen liquor jugs"),
    (4L, "ab"), // below the 3-char trigram floor — excluded
    (5L, "")).toDF("doc_id", "text")

  test("trigram LM: broadcast and shuffle-fallback paths agree") {
    // Same bucket count on both sides of the broadcast threshold would need
    // a >2^20-bucket model; instead pin the DECISION both ways at the same
    // small bucket count by checking the plan, and value-equality across
    // bucket counts is meaningless — so: force the fallback by scoring at a
    // bucket count above lmBroadcastMaxBuckets and compare against the
    // unhashed-collision-free expectation that both paths share.
    val fine = TextOps.trigramFamiliarity(docs, TextOps.lmBroadcastMaxBuckets * 4)
    val coarse = TextOps.trigramFamiliarity(docs, 65536L)
    // n_tris is bucket-count independent (it counts the doc's own trigrams)
    val nFine = fine.select("doc_id", "n_tris").as[(Long, Long)].collect().toMap
    val nCoarse = coarse.select("doc_id", "n_tris").as[(Long, Long)].collect().toMap
    assert(nFine === nCoarse)
    assert(nFine.keySet === Set(1L, 2L, 3L)) // 4,5 below trigram floor
    // exact dups score identically on either path
    val fFine = fine.select("doc_id", "familiarity").as[(Long, Long)].collect().toMap
    assert(fFine(1L) === fFine(2L))
  }

  test("trigram LM: broadcastable model scores via the compiled kernel, " +
      "over-threshold model falls back to a non-broadcast join") {
    def joins(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val small = joins(TextOps.trigramFamiliarity(docs, 65536L))
    val big = joins(
      TextOps.trigramFamiliarity(docs, TextOps.lmBroadcastMaxBuckets * 4))
    // round 20: the small-bucket path is ONE graft_lm_familiarity pass per
    // row against a broadcast 1-row sorted-model artifact (the documented
    // broadcast-scalar crossJoin pattern) — no probe-side explode, no
    // per-doc re-aggregation, no join on b at all
    assert(small.contains("graft_lm_familiarity"),
      s"small-bucket model must score via the kernel:\n$small")
    assert(small.contains("BroadcastExchange"),
      s"small-bucket model row must broadcast:\n$small")
    assert(!small.contains("SortMergeJoin") &&
      !small.contains("ShuffledHashJoin"),
      s"small-bucket path must not shuffle-join:\n$small")
    assert(!big.contains("BroadcastHashJoin") &&
      !big.contains("graft_lm_familiarity"),
      s"over-threshold model must NOT broadcast:\n$big")
  }

  test("t22 BPE merge surgery: greedy leftmost non-overlapping convention " +
      "(the self-overlap case merges floor(n/2) times), boundary-safe") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions._
    def mergeOnce(toks: Seq[String], a: String, b: String): Seq[String] = {
      val df = Seq(Tuple1(toks)).toDF("toks")
        .crossJoin(Seq((a, b)).toDF("a", "b"))
      df.select(split(trim(expr(
        "replace(concat(' ', array_join(toks, '  '), ' '), " +
          "concat(' ', a, '  ', b, ' '), " +
          "concat(' ', a, '_', b, ' '))")), "  ").as("out"))
        .as[Seq[String]].collect().head
    }
    // self-overlap: "a a a" -> one merge (BPE greedy), "a a a a" -> two
    assert(mergeOnce(Seq("a", "a", "a"), "a", "a") === Seq("a_a", "a"))
    assert(mergeOnce(Seq("a", "a", "a", "a"), "a", "a")
      === Seq("a_a", "a_a"))
    // boundary: match at string start and end; adjacent matches chain
    assert(mergeOnce(Seq("x", "y", "x", "y"), "x", "y")
      === Seq("x_y", "x_y"))
    // no false merge when a token merely CONTAINS the pair members
    assert(mergeOnce(Seq("xa", "ay"), "a", "a") === Seq("xa", "ay"))
    // single-token doc passes through
    assert(mergeOnce(Seq("solo"), "a", "b") === Seq("solo"))
    // the merged token no longer equals either parent: later pairs see it
    assert(mergeOnce(Seq("a_a", "a"), "a", "a") === Seq("a_a", "a"))
  }

  test("t23 BPE encode: k sequential merges apply end-to-end (winner r " +
      "recounted over the (r-1)-merged corpus), counts carried exactly") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions._
    // round 1: (a,b) wins 3-2 over (b,c); round 2: (a_b,c) wins 2-1 over
    // (a_b,a_b) — so round 2's winner EXISTS only because round 1 merged.
    val corpus0 = Seq(
      (1L, Seq("a", "b", "a", "b", "c")),
      (2L, Seq("a", "b", "c", "c")))
      .toDF("doc_id", "toks")
      .withColumn("n_tokens_raw", size(col("toks")).cast("long"))
    val (winners, encoded) = TextOps.bpeRounds(corpus0, 2, 2)
    val w = winners.map(_.select("a", "b").as[(String, String)]
      .collect().head)
    assert(w === Seq(("a", "b"), ("a_b", "c")))
    val out = encoded.select("doc_id", "toks", "n_tokens_raw")
      .as[(Long, Seq[String], Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === Seq("a_b", "a_b_c"))
    assert(out(2L)._2 === Seq("a_b_c", "c"))
    assert(out(1L)._3 === 5L && out(2L)._3 === 4L) // raw counts ride through
  }

  test("p13 langid mix: sqrt-temperature caps small languages at full " +
      "admission while the dominant language downsamples") {
    import org.apache.spark.sql.functions.col
    val rows = graft.queries.Catalog.byName("p13_langid_mix")
      .run(spark, "/root/testdata/sf0.001")
      .collect().map { r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getLong(5)))
      }.toMap
    assert(rows.keySet === Set("en", "de", "fr", "ru", "zh", "ja", "ko", "ar"))
    // planted non-en rows (incl. the r18 CJK + r19 hangul witnesses):
    // tiny mass -> rate caps at 1.0 -> every doc admitted
    Seq("de", "fr", "ru", "zh", "ja", "ko", "ar").foreach { l =>
      val (nDocs, mass, rate, nAdm, admMass) = rows(l)
      assert(rate === 1.0 && nAdm === nDocs && admMass === mass, s"$l: $rows")
    }
    // dominant en: a real (0,1) rate, admission strictly partial
    val (nEn, massEn, rateEn, admEn, admMassEn) = rows("en")
    assert(rateEn > 0.0 && rateEn < 1.0)
    assert(admEn > 0L && admEn < nEn)
    assert(admMassEn > 0L && admMassEn < massEn)
  }

  test("t21 language-id: planted German/French/Russian rows route with " +
      "margin; profiles are boundary-anchored (corpus words cannot fire " +
      "them); the label now reads the persisted profile artifact") {
    import org.apache.spark.sql.functions.col
    val out = graft.queries.Catalog.byName("t21_language_id")
      .run(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") >= 900000L)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[String]("lang")).toMap
    assert(out === Map(900001L -> "de", 900002L -> "fr", 900003L -> "ru",
      900004L -> "zh", 900005L -> "ja", 900006L -> "ko",
      900007L -> "ar"))
    // the anchoring property itself: profile grams never fire on the
    // corpus vocabulary ("table" must not read French, "order" not German)
    val vocabCtx = " " + Seq("table", "order", "query", "value", "customer",
      "merge", "filter", "stream").mkString(" ") + " "
    TextOps.LangProfiles.filter(_._1 != "en").foreach { case (lang, grams) =>
      grams.foreach(g => assert(!vocabCtx.contains(g),
        s"profile gram '$g' ($lang) fires on the corpus vocabulary"))
    }
    // the serve plan reads profiles from the parquet artifact, not plan
    // literals: the profile table appears as a scan in the plan lineage
    val plan = graft.queries.Catalog.byName("t21_language_id")
      .run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("profiles"), plan.take(2000))
  }

  test("BPE sample sizing: microsForBudget math and the conf precedence " +
      "(sampleMicros > sampleBytes > legacy 50%)") {
    // proportional with floor/cap
    assert(TextOps.microsForBudget(50, 100) === 500000L)
    assert(TextOps.microsForBudget(1, 100) === 10000L)
    assert(TextOps.microsForBudget(200, 100) === 1000000L) // capped
    assert(TextOps.microsForBudget(1, 10000000) === 1000L) // floored
    intercept[IllegalArgumentException](TextOps.microsForBudget(0, 100))
    // precedence on a live session: text totals 40 bytes over 4 docs
    val d = docs.sparkSession.range(0, 4)
      .selectExpr("id AS doc_id", "repeat('x', 10) AS text")
    val conf = spark.conf
    def clear(): Unit = {
      conf.unset(TextOps.BpeSampleMicrosKey)
      conf.unset(TextOps.BpeSampleBytesKey)
    }
    clear()
    assert(TextOps.resolveBpeSampleMicros(d) === TextOps.BpeSampleMicros)
    conf.set(TextOps.BpeSampleBytesKey, "20") // half the 40-byte corpus
    assert(TextOps.resolveBpeSampleMicros(d) === 500000L)
    conf.set(TextOps.BpeSampleMicrosKey, "123456") // numeric wins
    assert(TextOps.resolveBpeSampleMicros(d) === 123456L)
    conf.set(TextOps.BpeSampleMicrosKey, "2000000")
    intercept[IllegalArgumentException](TextOps.resolveBpeSampleMicros(d))
    clear()
    conf.set(TextOps.BpeSampleBytesKey, "auto") // 8 MiB >> 40 B -> cap
    assert(TextOps.resolveBpeSampleMicros(d) === 1000000L)
    clear()
    // Shared parse-and-validate (ADVICE r19): engine and p15 oracle arm
    // refuse identically — out-of-range and non-numeric both name the key.
    assert(TextOps.parseBpeSampleMicros("123456") === 123456L)
    val over = intercept[IllegalArgumentException](
      TextOps.parseBpeSampleMicros("2000000"))
    assert(over.getMessage.contains(TextOps.BpeSampleMicrosKey))
    val nan = intercept[IllegalArgumentException](
      TextOps.parseBpeSampleMicros("half"))
    assert(nan.getMessage.contains(TextOps.BpeSampleMicrosKey))
  }

  test("t21 profile artifact: schema is (lang, tie_rank, grams) with " +
      "tie_rank mirroring the argmax preference order, and langIdNgram " +
      "rejects non-identifier keep entries") {
    val prof = spark.read.parquet(TextOps.langProfileArtifact(spark))
    assert(prof.schema.fieldNames.toSeq === Seq("lang", "tie_rank", "grams"))
    val rows = prof.collect().map(r =>
      r.getString(0) -> r.getInt(1)).toMap
    assert(rows === TextOps.LangProfiles.map(_._1).zipWithIndex.toMap)
    val ex = intercept[IllegalArgumentException] {
      TextOps.langIdNgram(docs, keep = Seq("1; DROP TABLE x"))
    }
    assert(ex.getMessage.contains("plain column identifier"))
  }
}
