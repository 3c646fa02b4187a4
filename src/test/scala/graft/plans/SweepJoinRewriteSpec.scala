package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[SweepJoinRewrite]] must be invisible semantically: a plain keyed
  * DataFrame range join planned through the custom sweep exec returns
  * exactly the rows of the un-rewritten join — strict and non-strict
  * inequalities, null keys/endpoints, residual conjuncts included.
  */
class SweepJoinRewriteSpec extends SparkSuite {
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    val cl = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val prevStrat = cl.experimental.extraStrategies
    spark.experimental.extraOptimizations = prev :+ SweepJoinRewrite
    cl.experimental.extraStrategies =
      prevStrat :+ org.apache.spark.sql.graft.IntervalSweepStrategy
    spark.conf.set(SweepJoinRewrite.enabledKey, "true")
    try body
    finally {
      spark.experimental.extraOptimizations = prev
      cl.experimental.extraStrategies = prevStrat
      spark.conf.unset(SweepJoinRewrite.enabledKey)
    }
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def frames = {
    val rnd = new scala.util.Random(3)
    val l = (0 until 300).map { i =>
      val s = rnd.nextInt(200).toLong
      (if (i % 19 == 0) null else java.lang.Long.valueOf(i % 6),
        i.toLong, java.lang.Long.valueOf(s),
        if (i % 23 == 0) null else java.lang.Long.valueOf(s + rnd.nextInt(30)))
    }.toDF("g", "lid", "s", "e")
    val r = (0 until 250).map { i =>
      val s = rnd.nextInt(200).toLong
      (if (i % 13 == 0) null else java.lang.Long.valueOf(i % 6),
        i.toLong, java.lang.Long.valueOf(s),
        java.lang.Long.valueOf(s + rnd.nextInt(20)))
    }.toDF("g2", "rid", "rs", "re")
    (l, r)
  }

  test("keyed range join plans as the sweep exec, rows identical") {
    val (l, r) = frames
    for ((c1, c2) <- Seq(
        (col("s") <= col("re"), col("rs") <= col("e")),   // closed
        (col("s") < col("re"), col("rs") < col("e")),     // open
        (col("s") <= col("re"), col("rs") < col("e")))) { // mixed
      def q: DataFrame = l.join(r, col("g") === col("g2") && c1 && c2)
      val expected = rows(q) // rule inert without the conf
      withRule {
        val planned = q
        val phys = planned.queryExecution.executedPlan.toString
        assert(phys.contains("IntervalSweepJoin"), s"rule did not fire:\n$phys")
        assert(rows(planned) == expected)
      }
    }
  }

  test("null-safe keys and residual conjuncts survive the rewrite") {
    val (l, r) = frames
    // <=> keys: null groups match each other; plus a residual cross-side
    // predicate that must become a post-filter on the sweep output
    def q: DataFrame = l.join(r, col("g") <=> col("g2") &&
      col("s") <= col("re") && col("rs") <= col("e") &&
      (col("lid") + col("rid")) % 3 =!= 0)
    val expected = rows(q)
    withRule {
      val planned = q
      val phys = planned.queryExecution.executedPlan.toString
      assert(phys.contains("IntervalSweepJoin"), phys)
      assert(rows(planned) == expected)
    }
  }

  test("out-of-scope shapes are left alone") {
    val (l, r) = frames
    withRule {
      // keyless: BinnedJoinRewrite's territory
      val keyless = l.join(r, col("s") <= col("re") && col("rs") <= col("e"))
      assert(!keyless.queryExecution.optimizedPlan.toString
        .contains("IntervalSweepJoin"))
      // mixed =/<=> key semantics
      val mixed = l.join(r, col("g") === col("g2") && col("lid") <=> col("rid") &&
        col("s") <= col("re") && col("rs") <= col("e"))
      assert(!mixed.queryExecution.optimizedPlan.toString
        .contains("IntervalSweepJoin"))
      // only one range direction (no opposing pair)
      val oneSided = l.join(r, col("g") === col("g2") && col("s") <= col("re"))
      assert(!oneSided.queryExecution.optimizedPlan.toString
        .contains("IntervalSweepJoin"))
    }
  }

  test("GraftExtensions wiring installs rule + strategy in a fresh session") {
    import org.apache.spark.sql.SparkSession
    val active = SparkSession.getActiveSession
    val default = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions()(_))
        .config(SweepJoinRewrite.enabledKey, "true")
        .getOrCreate()
      import s2.implicits._
      val l = Seq((1L, 0L, 10L), (1L, 50L, 60L), (2L, 0L, 10L))
        .toDF("g", "s", "e")
      val r = Seq((1L, 5L, 55L), (2L, 90L, 99L)).toDF("g2", "rs", "re")
      val q = l.join(r, col("g") === col("g2") &&
        col("s") <= col("re") && col("rs") <= col("e"))
      assert(q.queryExecution.executedPlan.toString.contains("IntervalSweepJoin"))
      assert(q.count() == 2)
    } finally {
      active.foreach(SparkSession.setActiveSession)
      default.foreach(SparkSession.setDefaultSession)
    }
  }
}
