package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink with the options that matter at lake scale spelled
  * out. CSV is the interchange format curation pipelines cannot avoid
  * (vendor drops, spreadsheet exports, legacy logs); the two decisions
  * that decide correctness and throughput are both made EXPLICIT here:
  *
  *   - **schema**: reading with an explicit `StructType` — never
  *     `inferSchema`, which buys its guess with a full extra pass over
  *     the data and still gets ambiguous columns wrong. With a declared
  *     schema the scan is single-pass, splittable per file, and types
  *     are stable across engines.
  *   - **malformed rows**: PERMISSIVE mode with a named corrupt-record
  *     column, so bad lines become inspectable rows (quarantine-able,
  *     same posture as [[graft.multimodal.Media]]'s corrupt-blob lane)
  *     instead of killing a 100-TB job (FAILFAST) or vanishing silently
  *     (DROPMALFORMED).
  *
  * Quoting/escaping stay at the RFC-4180-ish Spark defaults (`"` quote,
  * doubled-quote escape via `escape = "\""` set explicitly below so
  * write and read agree), which round-trips embedded commas, quotes and
  * JSON payloads.
  */
object Csv {

  /** Writes `df` as headered CSV under `path`. Overwrites. Timestamps
    * serialize as ISO-8601 with microseconds, which [[read]] parses back
    * losslessly. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .csv(path)

  /** Reads a headered CSV directory with an explicit schema. Malformed
    * rows land in `corruptCol` (appended to the schema) with every data
    * column null — filter `col(corruptCol).isNotNull` to quarantine.
    * Caveat: Spark refuses a query that references ONLY the corrupt
    * column straight off the raw scan; `.cache()` (or write out) the
    * parsed frame before a corrupt-only quarantine count.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, "string"))
      .option("header", "true")
      .option("escape", "\"")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)
}
