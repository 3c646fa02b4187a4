package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-on-read extraction of semi-structured payload columns, plus a
  * JSONL source adapter. The reference has no source layer at all
  * (SURVEY §2.1 — I/O is the caller's problem); a lake-scale engine
  * needs one, and event payloads in practice arrive as JSON strings
  * (the driver's `events.props` column is exactly that).
  *
  * Scale posture: `from_json` is a codegen-friendly per-row projection —
  * no shuffle, no UDF; parse errors yield null structs (PERMISSIVE), so
  * a corrupt payload never fails the job. Extracted fields are plain
  * columns afterwards: filters on them push into the scan of any
  * downstream materialization, and pruning drops the raw string early.
  */
object SemiStructured {

  /** Parses `jsonCol` against `schema` and promotes every top-level
    * field to a column (name collisions with existing columns are the
    * caller's responsibility). The raw column is retained; drop it
    * downstream if unneeded.
    */
  def extractJson(df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    val parsed = df.withColumn("__graft_json", from_json(col(jsonCol), schema))
    schema.fieldNames
      .foldLeft(parsed)((d, f) => d.withColumn(f, col("__graft_json")(f)))
      .drop("__graft_json")
  }

  /** Reads newline-delimited JSON with an EXPLICIT schema — schema
    * inference is a full extra pass over the data and is disabled by
    * contract here (at 100 TB an inference pass is a second job).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
