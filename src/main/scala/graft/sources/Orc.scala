package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the second columnar lake format next to parquet
  * (Hive-lineage warehouses and Trino/Presto estates are ORC-heavy;
  * a curation engine that can only read parquet cannot ingest them).
  * Spark's native vectorized ORC reader gives the same scan properties
  * the engine relies on everywhere else: column pruning, predicate
  * pushdown into stripe/row-group indexes, and splittable files — the
  * spec audits `PushedFilters` on the read-back plan, same contract as
  * [[Layout]]'s partition-pruning audit.
  *
  * The two write-side decisions are spelled out rather than left to
  * session defaults:
  *
  *   - **compression**: zstd — parquet-class ratios at similar read
  *     cost; at 100 TB the bytes on disk are the scan time.
  *   - **bloom filters**: opt-in per column. ORC bloom filters live in
  *     the stripe index, so a selective equality predicate on a
  *     high-cardinality column (doc ids, user ids, digests) skips whole
  *     stripes without reading them — the storage-side analogue of
  *     [[graft.joins.BloomPrune]].
  */
object Orc {

  /** Writes `df` as ORC under `path`. Overwrites. `bloomFor` columns
    * get stripe-level bloom filters (spend ~1 byte/value to skip
    * stripes on point lookups). */
  def write(df: DataFrame, path: String,
            bloomFor: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .option("compression", "zstd")
    (if (bloomFor.nonEmpty)
       w.option("orc.bloom.filter.columns", bloomFor.mkString(","))
     else w)
      .orc(path)
  }

  /** Reads an ORC directory. Schema comes from the ORC footer (typed,
    * not inferred from data — unlike CSV there is no ambiguity to
    * guess wrong), so no explicit StructType is required. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
