package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The library's advertised session wiring: a session built with
  * `.withExtensions(new GraftExtensions)` (equivalently
  * `spark.sql.extensions=graft.functions.GraftExtensions`) must expose every
  * graft_* function in pure SQL and plan the custom TopK operator — with NO
  * explicit register() call. This is the entry point a user switching to the
  * library actually configures, so it gets its own gate.
  *
  * The spec builds a dedicated session (clearing the shared default first —
  * getOrCreate would otherwise return it and silently skip the extensions),
  * and restores the shared session afterwards so suite order doesn't matter.
  */
class ExtensionsSpec extends AnyFunSuite {

  private def withExtSession[A](f: SparkSession => A): A = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try f(s)
    finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("graft_* functions resolve in pure SQL with no register() call") {
    withExtSession { s =>
      val r = s.sql(
        """SELECT graft_poly_hash('hello world') AS fp,
                  graft_simhash('a b a b') AS sh,
                  graft_rep_stats('a a b').n_tokens AS n,
                  graft_cos(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                            array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))
                    AS c""").collect().head
      // values must equal the kernel directly (same code path as register())
      assert(r.getLong(0) === TextHash.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
      assert(r.getInt(2) === 3)
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    }
  }

  test("KMV aggregate and sketch algebra work through the extension path") {
    withExtSession { s =>
      import s.implicits._
      (1 to 100).map(_.toString).toDF("v").createOrReplaceTempView("t")
      val r = s.sql(
        """SELECT a.k.n_kept AS n,
                  graft_kmv_union_est(a.k.sketch, a.k.sketch) AS u,
                  a.k.est_distinct AS e
           FROM (SELECT graft_kmv(v) AS k FROM t) a""").collect().head
      assert(r.getInt(0) === 64)
      assert(r.getDouble(1) === r.getDouble(2)) // A∪A = A, bit-exact
    }
  }

  test("trailing geometry args reject non-literal / non-int input loudly") {
    withExtSession { s =>
      import s.implicits._
      Seq(("abc", 1)).toDF("t", "n").createOrReplaceTempView("tg")
      // column reference where a plan-time literal is required: must be a
      // named AnalysisException, not the opaque NPE/CCE from eval(null)
      // (round-13 advice — these functions are reachable from ad-hoc SQL).
      val e1 = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_char_grams(t, n) FROM tg").collect()
      }
      assert(e1.getMessage.contains("graft_char_grams"))
      assert(e1.getMessage.contains("foldable INT literal"))
      // Long literal (BIGINT) where INT is required: same named error.
      val e2 = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_code(array(1.0d), array(named_struct(" +
          "'cluster', 0, 'cvec', array(1.0d))), CAST(0 AS BIGINT), 1)")
          .collect()
      }
      assert(e2.getMessage.contains("graft_code"))
      // the valid literal spelling still resolves and evaluates (generator
      // in the FROM clause via LATERAL VIEW, its supported position)
      val ok = s.sql(
        "SELECT count(*) AS n FROM tg LATERAL VIEW graft_char_grams(t, 2) g")
        .collect().head.getLong(0)
      assert(ok === 2L) // "abc" → "ab", "bc"
    }
  }

  test("the custom TopK operator executes in an extensions-built session") {
    withExtSession { s =>
      import s.implicits._
      val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 8))
        .toDF("g", "v")
      val out = graft.plans.TopKPerKey(df, Seq("g"), Seq(("v", false)), 2)
      assert(out.queryExecution.executedPlan.toString.contains("TopK"))
      assert(out.collect().map(r => (r.getString(0), r.getInt(1))).sorted
        === Seq(("a", 2), ("a", 3), ("b", 8), ("b", 9)))
    }
  }
}
