package graft

import java.sql.Timestamp

import graft.core.IntervalSpec
import graft.joins.IntervalJoin
import graft.resample.ResampleEav
import graft.windows.Impute
import org.apache.spark.sql.functions._

/** Dtype sweeps mirroring the reference's test matrix
  * (`tests/util.py:377-416` create_random_series; dtype coverage in
  * `tests/test_merge_intervals.py:336-349`, `tests/test_factorize.py:77-92`,
  * `tests/test_resample_eav.py:159-178`): operators must work over
  * string / timestamp / int / bool values, not just doubles.
  */
class DtypeSpecs extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("resample_eav over string values: min/max/mode/count/nunique/r0") {
    val obs = Seq(
      (1L, 1.0, "x", "beta"), (1L, 2.0, "x", "alpha"),
      (1L, 3.0, "x", "beta"), (1L, 9.0, "x", "zeta"))
      .toDF("e", "t", "attr", "v")
    val wins = Seq((1L, 0.0, 5.0)).toDF("e", "ws", "wt")
    val out = ResampleEav(
      obs, wins,
      agg = Map("x" -> Seq("min", "max", "mode", "count", "nunique", "r0", "r-1")),
      timeCol = "t", valueCol = "v", entityCol = Some("e"),
      attrCol = Some("attr"), wStartCol = Some("ws"), wStopCol = Some("wt"))
      .collect()(0)
    assert(out.getAs[String]("x_min") == "alpha")
    assert(out.getAs[String]("x_max") == "beta")
    assert(out.getAs[String]("x_mode") == "beta")
    assert(out.getAs[Long]("x_count") == 3L)
    assert(out.getAs[Long]("x_nunique") == 2L)
    assert(out.getAs[String]("x_r0") == "beta")   // first by time
    assert(out.getAs[String]("x_r-1") == "beta")  // last by time (t=3)
  }

  test("resample_eav over timestamp values: min/max/r0 keep the type") {
    val obs = Seq(
      (1L, 1.0, "x", ts("2024-03-01 10:00:00")),
      (1L, 2.0, "x", ts("2024-01-01 09:00:00")))
      .toDF("e", "t", "attr", "v")
    val wins = Seq((1L, 0.0, 5.0)).toDF("e", "ws", "wt")
    val out = ResampleEav(
      obs, wins,
      agg = Map("x" -> Seq("min", "max", "r0")),
      timeCol = "t", valueCol = "v", entityCol = Some("e"),
      attrCol = Some("attr"), wStartCol = Some("ws"), wStopCol = Some("wt"))
      .collect()(0)
    assert(out.getAs[Timestamp]("x_min") == ts("2024-01-01 09:00:00"))
    assert(out.getAs[Timestamp]("x_max") == ts("2024-03-01 10:00:00"))
    assert(out.getAs[Timestamp]("x_r0") == ts("2024-03-01 10:00:00"))
  }

  test("interval join over int endpoints: continuum semantics (merging.py:125-130)") {
    // interval (0,1) open over ints is NON-empty and overlaps (0,2)
    val l = Seq((1L, 0, 1)).toDF("lid", "a", "b")
    val r = Seq((2L, 0, 2), (3L, 1, 5), (4L, -3, 0)).toDF("rid", "c", "d")
    val out = IntervalJoin(
      l, r,
      leftSpec = IntervalSpec(Some("a"), Some("b"),
        includeStart = false, includeStop = false),
      rightSpec = IntervalSpec(Some("c"), Some("d"),
        includeStart = false, includeStop = false),
      keepOrder = false)
      .select("rid").as[Long].collect().toSet
    // (0,1)∩(0,2)=(0,1)≠∅; (0,1)∩(1,5)=∅ (open); (0,1)∩(-3,0)=∅
    assert(out == Set(2L))
  }

  test("interval join over timestamp endpoints with open stop") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("lid", "a", "b")
    val r = Seq(
      (2L, ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00")),
      (3L, ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00")))
      .toDF("rid", "c", "d")
    // left stop open → touching at the boundary does not match
    val out = IntervalJoin(
      l, r,
      leftSpec = IntervalSpec(Some("a"), Some("b"), includeStop = false),
      rightSpec = IntervalSpec.closed("c", "d"),
      keepOrder = false)
      .select("rid").as[Long].collect().toSet
    assert(out == Set(3L))
  }

  test("impute ffill/bfill over string and boolean columns") {
    val df = Seq(
      (1L, 1, Some("a"), Some(true)), (1L, 2, None, None),
      (1L, 3, Some("b"), Some(false)), (1L, 4, None, None))
      .toDF("g", "t", "s", "flag")
    val f = Impute(df, Seq("s", "flag"), "ffill",
      groupBy = Seq("g"), orderBy = Seq(col("t")))
      .orderBy("t").collect()
    assert(f.map(r => Option(r.getAs[String]("s"))).toSeq ==
      Seq(Some("a"), Some("a"), Some("b"), Some("b")))
    assert(f.map(r => Option(r.getAs[java.lang.Boolean]("flag"))).toSeq ==
      Seq(Some(true), Some(true), Some(false), Some(false)))
  }

  test("grouped mode over booleans with deterministic ties") {
    import graft.agg.GroupedMode
    val df = Seq((1L, true), (1L, false), (2L, true), (2L, true))
      .toDF("g", "v")
    val out = GroupedMode(df, Seq("g"), "v")
      .orderBy("g").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L) == false) // tie → smallest value (false < true)
    assert(out(2L) == true)
  }
}
