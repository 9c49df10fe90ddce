package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` are derived from the single query catalogue
  * (graft.queries.Catalog): every operator family from SURVEY.md §2 plus the
  * north-star extension ops (dedup / similarity / multimodal / text) is one
  * named entry with a DuckDB oracle where SQL can express it.
  */
object SparkEntry {

  /** Flagship: the reference's 5-way chained inner equi-join shape
    * (utils/spark_transforming.py:97-113) on the star schema; driver
    * smoke-checks rows > 0 at sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Catalog.byName("q06_join5_chain").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
