package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scalar function families: wire-format encode/decode, strings, math,
  * arrays, JSON (SURVEY.md §2.9, Q22–Q26).
  *
  * The wire roundtrip is the reference's Kafka value format: `concat_ws`
  * encode (data_generator/dataframe_to_kafka.py:68-74,91) and
  * `split(value,',')[i].cast(T)` decode (convert-to-elasticsearch.py:107-114).
  * All functions here are stock Catalyst expressions — codegen'd, no UDFs.
  */
object Scalars {

  val queries: Seq[Q] = Seq(
    // F1/F2/F7 (Q22): CSV wire encode + decode roundtrip.
    Q("q22_wire_roundtrip",
      (s, d) => Tables.events(s, d)
        .select(
          col("event_id"),
          concat_ws(",", col("event_id"), col("event_type"),
                    col("value").cast("string")).as("wire"))
        .withColumn("value_rt", split(col("wire"), ",").getItem(2).cast("double")),
      Some("""SELECT event_id,
                     concat_ws(',', event_id, event_type, CAST(value AS VARCHAR))
                       AS wire,
                     CAST(split_part(concat_ws(',', event_id, event_type,
                                               CAST(value AS VARCHAR)), ',', 3)
                          AS DOUBLE) AS value_rt
              FROM events""")),

    // Q23: string family (upper/substring/length/regexp/like/replace).
    Q("q23_strings",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        upper(substring(col("text"), 1, 20)).as("head_u"),
        length(col("text")).as("n_len"),
        regexp_extract(col("text"), "[a-z]+", 0).as("first_word"),
        col("text").like("%table%").as("has_table"),
        substring(regexp_replace(col("text"), " ", "_"), 1, 30).as("snake_head")),
      Some("""SELECT doc_id,
                     upper(substr(text, 1, 20)) AS head_u,
                     CAST(length(text) AS INT) AS n_len,
                     regexp_extract(text, '[a-z]+') AS first_word,
                     text LIKE '%table%' AS has_table,
                     substr(replace(text, ' ', '_'), 1, 30) AS snake_head
              FROM documents""")),

    // Q24: math family. Only IEEE-exact ops (abs/floor/ceil/sqrt/x*x/mod) so
    // the oracle matches bit-for-bit; `round` on computed doubles is
    // deliberately excluded (HALF_UP-vs-binary divergence, see Q.scala).
    Q("q24_math",
      (s, d) => Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_extendedprice") - 50000).as("abs_diff"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_quantity")).as("qty_ceil"),
        sqrt(col("l_extendedprice")).as("price_sqrt"),
        (col("l_discount") * col("l_discount")).as("disc_sq"),
        (col("l_orderkey") % 7).as("okey_mod7"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate")),
      Some("""SELECT l_orderkey, l_linenumber,
                     abs(l_extendedprice - 50000) AS abs_diff,
                     CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
                     CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
                     sqrt(l_extendedprice) AS price_sqrt,
                     l_discount * l_discount AS disc_sq,
                     l_orderkey % 7 AS okey_mod7,
                     greatest(l_tax, l_discount) AS max_rate
              FROM lineitem""")),

    // Q25: array family over tokenized text (split/size/element_at/
    // array_contains/slice/array_join/array_distinct).
    Q("q25_arrays",
      (s, d) => {
        val toks = split(col("text"), " ")
        Tables.documents(s, d).select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          element_at(toks, 1).as("first_tok"),
          array_contains(toks, "table").as("has_table_tok"),
          array_join(slice(toks, 1, 3), " ").as("first3"),
          size(array_distinct(toks)).as("n_uniq_tokens"))
      },
      Some("""SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                     string_split(text, ' ')[1] AS first_tok,
                     list_contains(string_split(text, ' '), 'table')
                       AS has_table_tok,
                     array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
                     CAST(len(list_distinct(string_split(text, ' '))) AS INT)
                       AS n_uniq_tokens
              FROM documents""")),

    // Q26: JSON extraction from the events.props column.
    Q("q26_json",
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int")),
      Some("""SELECT event_id,
                     json_extract_string(props, '$.k') AS k_str,
                     CAST(json_extract_string(props, '$.k') AS INT) AS k_int
              FROM events"""))
  )
}
