package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{IntervalSpec, Tables}
import graft.joins.IntervalJoin

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered in [[queries]]
  * bound to the driver's TPC-H-ish parquet testdata, with an equivalent
  * DuckDB oracle in [[oracleSql]] where ANSI-SQL-expressible.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** orders as per-customer activity intervals [orderdate, orderdate+days]. */
  private def orderWindows(s: SparkSession, dir: String, days: Int): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      col("o_orderdate").as("win_start"),
      (col("o_orderdate") + expr(s"INTERVAL $days DAYS")).as("win_stop"))

  // ───────────────────────── queries ─────────────────────────

  private val q_interval_contain: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val orders = orderWindows(s, dir, 30)
      val points = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      IntervalJoin(
        orders, points,
        leftSpec  = IntervalSpec.closed("win_start", "win_stop"),
        rightSpec = IntervalSpec.point("l_shipdate"),
        leftOn = Seq("o_orderkey"), rightOn = Seq("l_orderkey"),
        keepOrder = false)
        .select(
          col("o_orderkey").as("okey"),
          col("l_linenumber").as("lnum"),
          col("l_shipdate").as("ship"))
    }

  private val q_interval_overlap: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val a = orderWindows(s, dir, 30)
      val b = orderWindows(s, dir, 15)
      IntervalJoin(
        a, b,
        leftSpec  = IntervalSpec.closed("win_start", "win_stop"),
        rightSpec = IntervalSpec.closed("win_start", "win_stop"),
        on = Seq("o_custkey"),
        keepOrder = false)
        .select(
          col("o_orderkey_x").as("lkey"),
          col("o_orderkey_y").as("rkey"))
    }

  private val q_interval_keep_first: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val a = orderWindows(s, dir, 30)
      val b = orderWindows(s, dir, 15)
      IntervalJoin(
        a, b,
        leftSpec  = IntervalSpec.closed("win_start", "win_stop"),
        rightSpec = IntervalSpec.closed("win_start", "win_stop"),
        on = Seq("o_custkey"),
        keep = "first",
        leftIdCol = Some("o_orderkey"), rightIdCol = Some("o_orderkey"),
        keepOrder = false)
        .select(
          col("o_orderkey_x").as("lkey"),
          col("o_orderkey_y").as("rkey"))
    }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q_interval_contain(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_interval_contain"    -> q_interval_contain,
    "q_interval_overlap"    -> q_interval_overlap,
    "q_interval_keep_first" -> q_interval_keep_first,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_interval_contain" ->
      """SELECT o.o_orderkey AS okey, l.l_linenumber AS lnum, l.l_shipdate AS ship
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  AND l.l_shipdate >= o.o_orderdate
        |  AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY""".stripMargin,
    "q_interval_overlap" ->
      """SELECT a.o_orderkey AS lkey, b.o_orderkey AS rkey
        |FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
        |  AND a.o_orderdate <= b.o_orderdate + INTERVAL 15 DAY
        |  AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY""".stripMargin,
    "q_interval_keep_first" ->
      """WITH j AS (
        |  SELECT a.o_orderkey AS lkey, b.o_orderkey AS rkey,
        |         ROW_NUMBER() OVER (PARTITION BY a.o_orderkey ORDER BY b.o_orderkey) AS rn
        |  FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
        |    AND a.o_orderdate <= b.o_orderdate + INTERVAL 15 DAY
        |    AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY)
        |SELECT lkey, rkey FROM j WHERE rn = 1""".stripMargin,
  )
}
