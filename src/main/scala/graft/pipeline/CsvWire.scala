package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The delimiter-joined wire format connecting the batch output to the
  * streaming jobs (encode: data_generator/dataframe_to_kafka.py:68-74,91;
  * decode: convert-to-elasticsearch.py:105-114).
  *
  * `decode(encode(df)) == df` for separator-free field values — the
  * round-trip property Q22 checks and PipelineSpec property-tests. Both
  * directions are single codegen'd projections (F1/F2/F7): stateless,
  * per-row, embarrassingly parallel at any scale.
  */
object CsvWire {

  /** Row → one `value` string column: `concat_ws(sep, cols…)`. Column order
    * defines the wire layout (the schema's field order).
    */
  def encode(df: DataFrame, schema: StructType, sep: String = ","): DataFrame =
    df.select(concat_ws(sep, schema.fieldNames.map(col): _*).as("value"))

  /** `value` string column → typed columns: `split(value)[i].cast(T)`,
    * then drop the raw value (convert-to-elasticsearch.py:115).
    */
  def decode(df: DataFrame, schema: StructType, sep: String = ","): DataFrame = {
    val parts = split(col("value"), java.util.regex.Pattern.quote(sep))
    val cols: Seq[Column] = schema.fields.zipWithIndex.map { case (f, i) =>
      parts.getItem(i).cast(f.dataType).as(f.name)
    }
    df.select(col("*") +: cols: _*).drop("value")
  }
}
