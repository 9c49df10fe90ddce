package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Scans, projections, filters, joins, aggregates, windows, sorts and set
  * operations — the relational core of SURVEY.md §2 (Q1–Q19 + aggregate /
  * window capability queries).
  *
  * Reference provenance (see SURVEY.md §2 for the full mapping):
  *   - scan/project/filter: utils/spark_transforming.py:82-95,
  *     data_generator/dataframe_to_kafka.py:88-90
  *   - 5-way chained inner equi-join: utils/spark_transforming.py:97-113
  *   - union fold: utils/spark_transforming.py:123-131
  *   - global sort: utils/spark_transforming.py:143
  *   - limit: data_generator/dataframe_to_kafka.py:94-95
  *
  * Scale notes (100 TB posture): filters/projections are declared on the
  * scan so Catalyst pushes them into parquet (`PushedFilters`/`ReadSchema`);
  * dimension joins broadcast (nation/region/customer are small relative to
  * the fact side); the 5-way chain keys on the same column family so AQE
  * coalesces shuffles; top-k compiles to `TakeOrderedAndProject` (no global
  * sort materialization).
  */
object Relational {
  private def dec12(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
  private def dec4(c: org.apache.spark.sql.Column)  = c.cast(DecimalType(4, 2))

  val queries: Seq[Q] = Seq(
    // S1/S2/P1 + predicate pushdown: filter + projection reach the parquet scan.
    Q("q01_scan_filter_project",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
              FROM lineitem WHERE l_quantity < 10""")),

    // P2/P4: projection + rename + reorder.
    Q("q02_project_rename",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey").as("okey"),
        col("o_orderpriority").as("priority"),
        col("o_totalprice").as("price")),
      Some("""SELECT o_orderkey AS okey, o_orderpriority AS priority,
                     o_totalprice AS price FROM orders""")),

    // P5: derived columns (withColumn chain collapses to one Project).
    Q("q03_derived_columns",
      (s, d) => Tables.events(s, d)
        .withColumn("value_x2", col("value") * 2)
        .withColumn("etype_upper", upper(col("event_type")))
        .withColumn("user_bucket", col("user_id") % 10)
        .select("event_id", "value_x2", "etype_upper", "user_bucket"),
      Some("""SELECT event_id, value * 2 AS value_x2,
                     upper(event_type) AS etype_upper,
                     user_id % 10 AS user_bucket FROM events""")),

    // P6: na.drop — null-producing derivation then dropna
    // (reference drops post-join: utils/spark_transforming.py:145).
    Q("q04_dropna",
      (s, d) => Tables.events(s, d)
        .withColumn("v", when(col("value") > 5, col("value")))
        .select("event_id", "v")
        .na.drop("any"),
      Some("SELECT event_id, value AS v FROM events WHERE value > 5")),

    // P7/F3: standalone predicate + CASE WHEN enrichment
    // (if_movement: convert-to-elasticsearch.py:120-134).
    Q("q05_filter_case",
      (s, d) => Tables.events(s, d)
        .filter(col("event_type") =!= "error")
        .select(
          col("event_id"),
          when(col("value") > 10, "movement").otherwise("no_movement")
            .as("if_movement")),
      Some("""SELECT event_id,
                     CASE WHEN value > 10 THEN 'movement'
                          ELSE 'no_movement' END AS if_movement
              FROM events WHERE event_type <> 'error'""")),

    // J1: 5-table chained inner equi-join (utils/spark_transforming.py:97-113).
    // Catalyst broadcasts the dimension sides; the lineitem↔orders join is the
    // only real shuffle and AQE sizes it at runtime.
    Q("q06_join5_chain",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .select("l_orderkey", "l_linenumber", "c_custkey", "n_name", "r_name"),
      Some("""SELECT l_orderkey, l_linenumber, c_custkey, n_name, r_name
              FROM lineitem
              JOIN orders   ON l_orderkey  = o_orderkey
              JOIN customer ON o_custkey   = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey""")),

    // Semi join (capability row under SURVEY §2.4).
    Q("q07_semi_join",
      (s, d) => {
        val c = Tables.customer(s, d)
        c.join(Tables.orders(s, d), c("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    // Anti join.
    Q("q08_anti_join",
      (s, d) => {
        val c = Tables.customer(s, d)
        c.join(Tables.orders(s, d), c("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    // Theta (non-equi) self join: nation pairs within a region.
    Q("q09_theta_join",
      (s, d) => {
        val n1 = Tables.nation(s, d)
          .select(col("n_nationkey").as("k1"), col("n_name").as("nation_a"),
                  col("n_regionkey").as("rk1"))
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("k2"), col("n_name").as("nation_b"),
                  col("n_regionkey").as("rk2"))
        n1.join(n2, col("rk1") === col("rk2") && col("k1") < col("k2"))
          .select("nation_a", "nation_b")
      },
      Some("""SELECT n1.n_name AS nation_a, n2.n_name AS nation_b
              FROM nation n1 JOIN nation n2
                ON n1.n_regionkey = n2.n_regionkey
               AND n1.n_nationkey < n2.n_nationkey""")),

    // Q10: TPC-H Q1-style grouped aggregate (sum/avg/count with partial
    // map-side aggregation). DECIMAL casts make the double sums exact so the
    // DuckDB hashes match bit-for-bit.
    Q("q10_agg_pricing",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(dec12(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec12(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(dec12(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount")))
            * (lit(1) + dec4(col("l_tax")))).cast("double").as("sum_charge"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"),
          (sum(dec12(col("l_extendedprice"))).cast("double") / count(lit(1)))
            .as("avg_price"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
                     SUM(l_quantity) AS sum_qty,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                       AS sum_base_price,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                       AS sum_disc_price,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l_discount AS DECIMAL(4,2)))
                              * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
                       AS sum_charge,
                     SUM(l_quantity) / COUNT(*) AS avg_qty,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                       / COUNT(*) AS avg_price,
                     CAST(COUNT(*) AS BIGINT) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              GROUP BY l_returnflag, l_linestatus""")),

    // Q11: HLL sketch — approx_count_distinct. HLL registers can't
    // hash-match across engines, but the ESTIMATE can be error-gated: the
    // query emits the exact distinct count plus a boolean asserting
    // |approx − exact| ≤ 3·rsd·exact (rsd = 0.05 ⇒ ±15%, a ~99.7%
    // confidence band for HLL++'s near-Gaussian error); the oracle emits
    // the same exact count with TRUE. The hash comparison then FAILS iff
    // the sketch ever lands outside its advertised error bound — a real
    // correctness gate on the approximation, not a rows-only count.
    Q("q11_approx_distinct",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), rsd = 0.05)
               .as("approx_parts"),
             countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts"))
            <= lit(3 * 0.05) * col("exact_parts")).as("within_tol")),
      Some("""SELECT l_returnflag,
                     CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
                     TRUE AS within_tol
              FROM lineitem GROUP BY 1""")),

    // Q12: rollup (grouping sets family).
    Q("q12_rollup",
      (s, d) => Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        // Column overload, not rollup(String*): Spark 4's ambiguous-self-join
        // check misfires on the String form after a join chain (df.col
        // attaches plan-id metadata that the detector can't disambiguate).
        .select("r_name", "n_name", "c_acctbal")
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
             sum(dec12(col("c_acctbal"))).cast("double").as("sum_acctbal")),
      Some("""SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
                     CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                       AS sum_acctbal
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY ROLLUP (r_name, n_name)""")),

    // Q13: ranking window functions (unique ordering => deterministic).
    Q("q13_rank_window",
      (s, d) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.customer(s, d).select(
          col("c_custkey"), col("c_nationkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
      },
      Some("""SELECT c_custkey, c_nationkey,
                     CAST(ROW_NUMBER() OVER w AS INT) AS rn,
                     CAST(RANK() OVER w AS INT) AS rnk,
                     CAST(DENSE_RANK() OVER w AS INT) AS drnk
              FROM customer
              WINDOW w AS (PARTITION BY c_nationkey
                           ORDER BY c_acctbal DESC, c_custkey)""")),

    // Q14: lag/lead analytics (sensor-delta analogue of the reference's
    // time-series rows).
    Q("q14_lag_lead",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d).select(
          col("event_id"), col("user_id"),
          lag("value", 1).over(w).as("prev_value"),
          (col("value") - lag("value", 1).over(w)).as("delta"),
          lead("event_type", 1).over(w).as("next_type"))
      },
      Some("""SELECT event_id, user_id,
                     LAG(value, 1) OVER w AS prev_value,
                     value - LAG(value, 1) OVER w AS delta,
                     LEAD(event_type, 1) OVER w AS next_type
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""")),

    // Q15: sliding-frame aggregate (moving sum/avg over 3 rows).
    Q("q15_moving_agg",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-2, 0)
        val e = Tables.events(s, d)
        e.select(
          col("event_id"), col("user_id"),
          sum("value").over(w).as("mv_sum"),
          count(lit(1)).over(w).as("mv_cnt"))
          .withColumn("mv_avg", col("mv_sum") / col("mv_cnt"))
      },
      Some("""SELECT event_id, user_id, mv_sum, mv_cnt, mv_sum / mv_cnt AS mv_avg
              FROM (SELECT event_id, user_id,
                           SUM(value) OVER w AS mv_sum,
                           CAST(COUNT(*) OVER w AS BIGINT) AS mv_cnt
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))""")),

    // O1: global sort (range-partitioned total order,
    // utils/spark_transforming.py:143).
    Q("q16_sort_global",
      (s, d) => Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
              ORDER BY l_shipdate, l_orderkey, l_linenumber""")),

    // O2: top-k => TakeOrderedAndProject (no global sort materialization).
    Q("q17_topk",
      (s, d) => Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // U1: union with column alignment — unionByName, the idiomatic form of
    // the reference's reduce(union(select(a.columns))) fold
    // (utils/spark_transforming.py:123-131).
    Q("q18_union_align",
      (s, d) => {
        val c = Tables.customer(s, d).select(
          col("c_custkey").cast("long").as("id"), col("c_name").as("name"),
          col("c_acctbal").as("acctbal"), lit("customer").as("src"))
        val sup = Tables.supplier(s, d).select(
          col("s_acctbal").as("acctbal"), col("s_name").as("name"),
          col("s_suppkey").cast("long").as("id"), lit("supplier").as("src"))
        c.unionByName(sup)
      },
      Some("""SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
                     'customer' AS src FROM customer
              UNION ALL
              SELECT s_suppkey, s_name, s_acctbal, 'supplier' FROM supplier""")),

    // Set ops: INTERSECT (distinct semantics both engines).
    Q("q19_intersect",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk"))),
      Some("""SELECT c_nationkey AS nk FROM customer
              INTERSECT
              SELECT s_nationkey FROM supplier""")),

    // Set ops: EXCEPT.
    Q("q19_except",
      (s, d) => Tables.nation(s, d).select(col("n_nationkey").as("nk"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nk"))),
      Some("""SELECT n_nationkey AS nk FROM nation
              EXCEPT
              SELECT s_nationkey FROM supplier""")),

    // Multiset (ALL) variants — exceptAll/intersectAll keep per-row
    // MULTIPLICITY (bag semantics), which the distinct forms above destroy:
    // the engine plans them as count-aggregated anti/semi arithmetic, one
    // shuffle each side on the compared key, never a row-by-row NOT IN.
    Q("q81_except_all",
      (s, d) => Tables.customer(s, d).select((col("c_nationkey") % 7).as("k"))
        .exceptAll(Tables.supplier(s, d)
          .select((col("s_nationkey") % 7).as("k"))),
      Some("""SELECT c_nationkey % 7 AS k FROM customer
              EXCEPT ALL
              SELECT s_nationkey % 7 FROM supplier""")),

    Q("q82_intersect_all",
      (s, d) => Tables.customer(s, d).select((col("c_nationkey") % 7).as("k"))
        .intersectAll(Tables.supplier(s, d)
          .select((col("s_nationkey") % 7).as("k"))),
      Some("""SELECT c_nationkey % 7 AS k FROM customer
              INTERSECT ALL
              SELECT s_nationkey % 7 FROM supplier""")),

    // Schema-evolution union: unionByName(allowMissingColumns) null-fills
    // columns absent on one side — how heterogeneous table versions append
    // (q18's aligned union assumes identical schemas; q58 is the parquet
    // read-side merge of the same concern). DuckDB's UNION ALL BY NAME is
    // the oracle twin.
    Q("q83_union_missing_cols",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey").as("id"), col("c_acctbal").as("bal"),
          col("c_mktsegment").as("seg"))
        .unionByName(
          Tables.supplier(s, d)
            .select((col("s_suppkey") + 100000L).as("id"),
              col("s_acctbal").as("bal")),
          allowMissingColumns = true),
      Some("""SELECT c_custkey AS id, c_acctbal AS bal, c_mktsegment AS seg
              FROM customer
              UNION ALL BY NAME
              SELECT s_suppkey + 100000 AS id, s_acctbal AS bal
              FROM supplier"""))
  )
}
