package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Data-layout sink: hive-partitioned, sorted parquet. The reference has
  * no storage layer (SURVEY §2.1), but at lake scale the LAYOUT of what
  * you write decides the cost of every later scan: directory partitioning
  * turns predicates on the partition key into pruned listings (no file
  * even opened), and sorting within files tightens parquet row-group
  * min/max bounds so range predicates skip pages.
  *
  * Scale posture: `repartition(partitionBy)` gives each output directory
  * a bounded writer count (without it, every task writes a file into
  * every partition — the small-files explosion); `sortWithinPartitions`
  * orders rows inside each writer task, which is exactly the unit parquet
  * statistics cover. No global sort, no driver involvement.
  */
object Layout {

  /** Writes `df` under `path` partitioned by `partitionBy`, each file
    * sorted by `sortBy`. Overwrites. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionBy: Seq[String], sortBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty, "need at least one partition column")
    df.repartition(partitionBy.map(col): _*)
      .sortWithinPartitions((partitionBy ++ sortBy).map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionBy: _*)
      .parquet(path)
  }

  /** Reads a [[writePartitioned]] layout back. Predicates on the
    * partition columns prune directories (check `.explain` for
    * `PartitionFilters`); predicates on `sortBy` columns skip row
    * groups via parquet statistics. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
