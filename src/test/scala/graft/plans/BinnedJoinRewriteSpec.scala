package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[BinnedJoinRewrite]] must be invisible semantically: for every input
  * (including null endpoints, inverted per-row intervals, strict and mixed
  * inequalities, timestamps) the rewritten join returns exactly the naive
  * join's rows — while the optimized plan shows the bin explosion instead
  * of a cartesian / nested-loop shape.
  */
class BinnedJoinRewriteSpec extends SparkSuite {

  private def withRule[A](confs: (String, String)*)(body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BinnedJoinRewrite
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally {
      spark.experimental.extraOptimizations = prev
      confs.foreach { case (k, _) => spark.conf.unset(k) }
    }
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  import scala.util.Random
  private def intervals(seed: Int, n: Int, nulls: Boolean): DataFrame = {
    val rnd = new Random(seed)
    val rs = (0 until n).map { i =>
      val a = rnd.nextInt(1000).toLong
      val len = rnd.nextInt(40).toLong - 5 // some inverted (stop < start)
      val lo = if (nulls && rnd.nextInt(20) == 0) null else java.lang.Long.valueOf(a)
      val hi = if (nulls && rnd.nextInt(20) == 0) null else java.lang.Long.valueOf(a + len)
      (i.toLong, lo, hi)
    }
    import spark.implicits._
    rs.toDF("id", "lo", "hi")
  }

  test("keyless overlap join: rewritten plan, identical rows") {
    val l = intervals(1, 300, nulls = true)
    val r = intervals(2, 200, nulls = true)
      .toDF("rid", "rlo", "rhi")
    def q: DataFrame =
      l.join(r, col("lo") <= col("rhi") && col("rlo") <= col("hi"))
    val expected = rows(q) // rule inert: width conf unset
    withRule(BinnedJoinRewrite.widthKey -> "25") {
      val planned = q
      val opt = planned.queryExecution.optimizedPlan.toString
      assert(opt.contains("__graft_bin"), s"rule did not fire:\n$opt")
      assert(rows(planned) == expected)
      planned.collect()
      val phys = planned.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct") && !phys.contains("NestedLoop"),
        s"still a cartesian shape:\n$phys")
    }
  }

  test("strict / mixed inequalities and containment shape") {
    val l = intervals(3, 250, nulls = false)
    val r = intervals(4, 150, nulls = false).toDF("rid", "rlo", "rhi")
    // strict on one side, point-in-interval shape via GreaterThan forms
    def q: DataFrame =
      l.join(r, col("rlo") < col("lo") && col("rhi") >= col("lo"))
    val expected = rows(q)
    withRule(BinnedJoinRewrite.widthKey -> "10") {
      val planned = q
      assert(planned.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(rows(planned) == expected)
    }
  }

  test("equality keys: skipped by default, rewritten with withKeys") {
    import spark.implicits._
    val rnd = new Random(7)
    val l = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(3), rnd.nextInt(500).toLong, rnd.nextInt(500).toLong + 30))
      .toDF("id", "k", "lo", "hi")
    val r = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(3), rnd.nextInt(500).toLong, rnd.nextInt(500).toLong + 30))
      .toDF("rid", "rk", "rlo", "rhi")
    def q: DataFrame = l.join(r,
      col("k") === col("rk") && col("lo") <= col("rhi") && col("rlo") <= col("hi"))
    val expected = rows(q)
    withRule(BinnedJoinRewrite.widthKey -> "40") {
      assert(!q.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    }
    withRule(BinnedJoinRewrite.widthKey -> "40",
        BinnedJoinRewrite.withKeysKey -> "true") {
      val planned = q
      assert(planned.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(rows(planned) == expected)
    }
  }

  test("timestamp endpoints bin in seconds") {
    import spark.implicits._
    val rnd = new Random(11)
    def ts(n: Int, names: Seq[String]): DataFrame =
      (0 until n).map { i =>
        val a = 1700000000L + rnd.nextInt(100000)
        (i.toLong, new java.sql.Timestamp(a * 1000L),
          new java.sql.Timestamp((a + rnd.nextInt(5000)) * 1000L))
      }.toDF(names: _*)
    val l = ts(200, Seq("id", "lo", "hi"))
    val r = ts(150, Seq("rid", "rlo", "rhi"))
    def q: DataFrame =
      l.join(r, col("lo") <= col("rhi") && col("rlo") <= col("hi"))
    val expected = rows(q)
    withRule(BinnedJoinRewrite.widthKey -> "3600") {
      val planned = q
      assert(planned.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(rows(planned) == expected)
    }
  }

  test("double endpoints require the no-NaN contract") {
    import spark.implicits._
    val l = Seq((1L, 0.0, 10.0), (2L, 5.5, 6.5)).toDF("id", "lo", "hi")
    val r = Seq((9L, 6.0, 20.0)).toDF("rid", "rlo", "rhi")
    def q: DataFrame =
      l.join(r, col("lo") <= col("rhi") && col("rlo") <= col("hi"))
    withRule(BinnedJoinRewrite.widthKey -> "5") {
      assert(!q.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    }
    withRule(BinnedJoinRewrite.widthKey -> "5",
        BinnedJoinRewrite.assumeNoNaNKey -> "true") {
      val planned = q
      assert(planned.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(rows(planned) == rows(q))
    }
  }

  test("randomized: any width, any shape, rows identical to the naive join") {
    val rnd = new Random(99)
    for (trial <- 1 to 6) {
      val width = Seq("1", "7", "40", "1000")(rnd.nextInt(4))
      val strictL = rnd.nextBoolean()
      val strictR = rnd.nextBoolean()
      val l = intervals(100 + trial, 120, nulls = true)
      val r = intervals(200 + trial, 90, nulls = true).toDF("rid", "rlo", "rhi")
      def q: DataFrame = l.join(r,
        (if (strictL) col("lo") < col("rhi") else col("lo") <= col("rhi")) &&
          (if (strictR) col("rlo") < col("hi") else col("rlo") <= col("hi")))
      val expected = rows(q)
      withRule(BinnedJoinRewrite.widthKey -> width) {
        val planned = q
        assert(planned.queryExecution.optimizedPlan.toString.contains("__graft_bin"),
          s"trial $trial (width=$width) did not rewrite")
        assert(rows(planned) == expected,
          s"trial $trial (width=$width strictL=$strictL strictR=$strictR) diverged")
      }
    }
  }

  test("GraftExtensions wiring installs the rule in a fresh session") {
    import org.apache.spark.sql.SparkSession
    val active = SparkSession.getActiveSession
    val default = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions=graft.plans.GraftExtensions` is the conf
      // route on a fresh cluster; it is STATIC (read from the
      // SparkContext's conf at context creation), so inside this shared-
      // context test JVM we exercise the same class via the builder hook
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions()(_))
        .config("spark.graft.binnedJoin.width", "25")
        .getOrCreate()
      import s2.implicits._
      val l = Seq((1L, 0L, 10L), (2L, 50L, 60L)).toDF("id", "lo", "hi")
      val r = Seq((9L, 5L, 55L)).toDF("rid", "rlo", "rhi")
      val q = l.join(r, col("lo") <= col("rhi") && col("rlo") <= col("hi"))
      assert(q.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(q.count() == 2)

      // the extension also registers the native expressions for SQL users
      val row = s2.sql(
        """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
          |       vec_norm(array(3.0d, 4.0d)) AS n,
          |       sorted_long_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS i,
          |       size(gram_hash(array(1L, 2L, 3L), 2)) AS g,
          |       size(minhash_bands(array(1L, 2L), 4, 2)) AS b,
          |       simhash64(array(0L)) AS s,
          |       vec_quant_i8(array(0.5d, -1.0d)).q8 AS q
          |""".stripMargin).head()
      assert(row.getDouble(0) == 11.0 && row.getDouble(1) == 5.0)
      assert(row.getInt(2) == 2 && row.getInt(3) == 2 && row.getInt(4) == 4)
      // simhash of the all-zero-bits hash: every vote negative → 0
      assert(row.getLong(5) == 0L)
      assert(row.getSeq[Byte](6) == Seq[Byte](64, -127))
    } finally {
      active.foreach(SparkSession.setActiveSession)
      default.foreach(SparkSession.setDefaultSession)
    }
  }
}
