package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.IntervalSpec
import graft.joins.{SaltedSweepJoin, SweepJoin}

/** Hot-key time-skew probe: one key holds 50% of both sides of an
  * interval join; times the plain sweep (whole key on one task) against
  * the salted sweep (key time-sliced across tasks). Prints one JSON
  * line; row counts must agree or the probe aborts. Evidence artifact
  * for SCALING.md — not part of the driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.SkewProbe [slices]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val slices = if (args.nonEmpty) args(0).toInt else 16
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the q_salted_sweep shape, keep=all so the sweep itself (not the
    // keep reduction) carries the skew
    def orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val skew = (k: org.apache.spark.sql.Column) =>
      when(k % 2 === 0, 0L).otherwise(k % 997)
    val l = orders.select(
      col("o_orderkey").as("okey"), skew(col("o_orderkey")).as("grp"),
      ((col("o_orderkey") * 13 % 100000).cast("double") / 10.0).as("s"),
      ((col("o_orderkey") * 13 % 100000).cast("double") / 10.0 +
        (col("o_custkey") % 40).cast("double") / 10.0).as("e"))
    val r = orders.select(
      col("o_orderkey").as("rid"), skew(col("o_orderkey")).as("grp_r"),
      ((col("o_orderkey") * 31 % 100000).cast("double") / 10.0).as("p"))

    def time(df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def plain = SweepJoin(l, r, Seq("grp"), Seq("grp_r"),
      IntervalSpec.closed("s", "e"), IntervalSpec.point("p"))
    def salted = SaltedSweepJoin(l, r, Seq("grp"), Seq("grp_r"),
      IntervalSpec.closed("s", "e"), IntervalSpec.point("p"),
      slices = slices, hotKeyThreshold = 300)

    // warm both paths once (janino/JIT), then best-of-2 timed
    time(plain); time(salted)
    val (tp1, np) = time(plain); val (ts1, ns) = time(salted)
    val (tp2, np2) = time(plain); val (ts2, ns2) = time(salted)
    require(np == ns && np == np2 && np == ns2,
      s"row mismatch: plain=$np salted=$ns")
    println(s"""{"probe":"skewed_sweep","sf":"$sfDir","rows":$np,""" +
      s""""slices":$slices,"plain_sec":${math.min(tp1, tp2)},""" +
      s""""salted_sec":${math.min(ts1, ts2)}}""")
    spark.stop()
  }
}
