package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the custom Catalyst Generator (TokenWindowsExpr): window
  * boundaries, empty-token semantics shared with DuckDB's string_split,
  * SQL LATERAL VIEW usage, and the plan shape (GenerateExec, no
  * intermediate array construction).
  */
class GeneratorSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def windows(text: String, n: Int, stride: Int): Seq[(Int, String)] = {
    GraftFunctions.register(spark)
    val df = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(text)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    df.select(expr(s"graft_token_windows(text, $n, $stride)"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
  }

  test("full and trailing-partial windows, stride < n overlap") {
    assert(windows("a b c d e", 3, 2) ===
      Seq((0, "a b c"), (1, "c d e"), (2, "e")))
  }

  test("exact-multiple length yields no empty trailing window") {
    assert(windows("a b c d", 2, 2) === Seq((0, "a b"), (1, "c d")))
  }

  test("empty string is ONE one-empty-token window (string_split parity)") {
    assert(windows("", 4, 4) === Seq((0, "")))
  }

  test("consecutive separators keep empty tokens (string_split parity)") {
    assert(windows("a  b", 2, 2) === Seq((0, "a "), (1, "b")))
  }

  test("null text generates zero rows") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val n = Seq[(Long, Option[String])]((1L, None)).toDF("id", "text")
      .select(expr("graft_token_windows(text, 4, 4)")).count()
    assert(n === 0L)
  }

  test("usable as a SQL table function via LATERAL VIEW") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((7L, "x y z w v")).toDF("doc_id", "text")
      .createOrReplaceTempView("gen_docs")
    val rows = spark.sql(
      """SELECT doc_id, w.win_idx, w.win_text
         FROM gen_docs
         LATERAL VIEW graft_token_windows(text, 2, 2) w AS win_idx, win_text
         ORDER BY win_idx""").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ===
      Seq((7L, 0, "x y"), (7L, 1, "z w"), (7L, 2, "v")))
  }

  test("plans as Generate — no array materialization in the plan") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
      .select(col("doc_id"), expr("graft_token_windows(text, 8, 4)"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Generate graft_token_windows"), p)
    assert(!p.toLowerCase.contains("explode"), p)
  }
}
