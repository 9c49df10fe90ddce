package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The delimiter-joined wire format connecting the batch output to the
  * streaming jobs (encode: data_generator/dataframe_to_kafka.py:68-74,91;
  * decode: convert-to-elasticsearch.py:105-114).
  *
  * `decode(encode(df)) == df` for separator-free, null-or-nonempty field
  * values — the round-trip property Q22 checks and PipelineSpec
  * property-tests. Nulls ride as empty fields: bare `concat_ws` silently
  * DROPS null columns (shifting every later field — the reference inherits
  * this PySpark behavior), so encode coalesces each field to "" to keep
  * arity fixed, and decode maps "" back to null before the cast. The one
  * wire ambiguity this leaves is genuine empty strings decoding as null —
  * inherent to unquoted CSV.
  *
  * Both directions are single codegen'd projections (F1/F2/F7): stateless,
  * per-row, embarrassingly parallel at any scale.
  */
object CsvWire {

  /** Row → one `value` string column. Column order defines the wire layout
    * (the schema's field order); null fields encode as empty.
    */
  def encode(df: DataFrame, schema: StructType, sep: String = ","): DataFrame =
    df.select(concat_ws(sep,
      schema.fieldNames.map(n => coalesce(col(n).cast("string"), lit(""))): _*)
      .as("value"))

  /** `value` string column → typed columns: `split(value)[i]` with empty →
    * null, then `cast(T)`; the raw value is dropped
    * (convert-to-elasticsearch.py:115).
    */
  def decode(df: DataFrame, schema: StructType, sep: String = ","): DataFrame = {
    val parts = split(col("value"), java.util.regex.Pattern.quote(sep))
    val cols: Seq[Column] = schema.fields.zipWithIndex.map { case (f, i) =>
      nullif(parts.getItem(i), lit("")).cast(f.dataType).as(f.name)
    }
    df.select(col("*") +: cols: _*).drop("value")
  }
}
