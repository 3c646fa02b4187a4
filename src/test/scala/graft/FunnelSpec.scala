package graft

import graft.core.Funnel
import org.apache.spark.sql.functions._

/** The curation funnel: first-fail attribution, conservation
  * (entering = failed + surviving, chained), null-fails-the-gate,
  * zero-failure stages visible, empty input, repartition determinism.
  */
class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def df = Seq(
    (1L, "good long text here", 10),
    (2L, "", 10),                    // fails nonempty
    (3L, "short", 10),               // fails minlen
    (4L, "good enough text!!", -1),  // fails score
    (5L, "also a fine doc yes", 3),
    (6L, null.asInstanceOf[String], 9) // null text: fails FIRST gate
  ).toDF("id", "text", "score")

  private val stages = Seq(
    "nonempty" -> (length(col("text")) > 0),
    "minlen"   -> (length(col("text")) >= 10),
    "score"    -> (col("score") > 0))

  test("first-fail attribution and conservation") {
    val out = Funnel(df, stages).orderBy("stage_idx").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out === Array(
      ("nonempty", 6L, 2L, 4L),  // "" and null both fail the first gate
      ("minlen", 4L, 1L, 3L),
      ("score", 3L, 1L, 2L)))
    // chain conservation: surviving(i) = entering(i+1)
    out.sliding(2).foreach { case Array(a, b) => assert(a._4 == b._2) }
  }

  test("zero-failure stages stay visible; all-pass input") {
    val allPass = Seq((1L, "a long enough text", 5),
      (2L, "another long text!", 6)).toDF("id", "text", "score")
    val out = Funnel(allPass, stages).orderBy("stage_idx").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out === Array((2L, 0L, 2L), (2L, 0L, 2L), (2L, 0L, 2L)))
  }

  test("empty input yields an all-zero funnel") {
    val out = Funnel(df.filter(lit(false)), stages)
      .orderBy("stage_idx").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out === Array((0L, 0L, 0L), (0L, 0L, 0L), (0L, 0L, 0L)))
  }

  test("streaming funnel: per-window attrition matches the batch CASE, " +
      "and out-of-order rows inside the watermark update closed windows") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String): Timestamp = Timestamp.valueOf(s)
    val input = MemoryStream[(Timestamp, String, Int)]
    val stream = input.toDF().toDF("ts", "text", "score")
    val out = graft.streaming.StreamingOps.streamingFunnel(
      stream, "ts", stages, watermark = "10 minutes", windowDur = "1 hour")
    val q = out.writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      input.addData(
        (ts("2024-01-01 00:05:00"), "", 5),                  // nonempty
        (ts("2024-01-01 00:10:00"), "short", 5),             // minlen
        (ts("2024-01-01 00:20:00"), "long enough text", -1), // score
        (ts("2024-01-01 00:30:00"), "long enough text", 2),  // kept
        (ts("2024-01-01 01:10:00"), "second window doc", 9)) // kept, w2
      q.processAllAvailable()
      val w1 = ts("2024-01-01 00:00:00")
      val w2 = ts("2024-01-01 01:00:00")
      def rows() = spark.table("funnel_stream")
        .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3)))
        .toSet
      assert(rows() == Set(
        (w1, "nonempty", 1L), (w1, "minlen", 1L), (w1, "score", 1L),
        (w1, "kept", 1L), (w2, "kept", 1L)))
      // OUT-OF-ORDER arrival — the property the watermark exists for:
      // after batch 1 the watermark sits at max(ts) − 10 min = 01:00,
      // which CLOSES w1 (window end 01:00 ≤ watermark) but leaves w2
      // open. A 01:05 straggler (5 min older than anything seen) must
      // still land in the already-emitted w2 window (update mode
      // re-emits it with the larger count), while a 00:45 row whose
      // window is closed is dropped — no stage count of w1 may change
      input.addData(
        (ts("2024-01-01 01:05:00"), "late but window open", 3),  // kept, w2
        (ts("2024-01-01 00:45:00"), "", 9)) // w1 closed: dropped
      q.processAllAvailable()
      assert(rows().contains((w2, "kept", 2L)),
        s"late in-watermark row must update w2: ${rows()}")
      assert(!rows().contains((w1, "nonempty", 2L)),
        s"closed-window row must be dropped: ${rows()}")
    } finally q.stop()
  }

  test("property: conservation holds across random corpora and stages") {
    for (seed <- Seq(31, 32, 33)) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(100)
      val rows = (0 until n).map(i => (i.toLong,
        rnd.nextInt(40), rnd.nextInt(40), rnd.nextInt(40)))
      val data = rows.toDF("id", "a", "b", "c")
      val (ta, tb, tc) = (rnd.nextInt(40), rnd.nextInt(40), rnd.nextInt(40))
      val st = Seq("ga" -> (col("a") >= ta), "gb" -> (col("b") >= tb),
        "gc" -> (col("c") >= tc))
      val out = Funnel(data, st).orderBy("stage_idx").collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
      // total enters stage 0; each stage conserves; chain links up
      assert(out.head._1 == n)
      out.foreach { case (e, f, s) => assert(e == f + s && f >= 0 && s >= 0) }
      out.sliding(2).foreach { case Array(x, y) => assert(x._3 == y._1)
                               case _ => () }
      // survivors equal a direct conjunction count
      val direct = rows.count { case (_, a, b, c) =>
        a >= ta && b >= tb && c >= tc }
      assert(out.last._3 == direct, s"seed=$seed")
      // per-stage failed equals the sequential first-fail count
      val ff = rows.groupBy { case (_, a, b, c) =>
        if (a < ta) 0 else if (b < tb) 1 else if (c < tc) 2 else 3 }
      out.zipWithIndex.foreach { case ((_, f, _), i) =>
        assert(f == ff.getOrElse(i, Nil).size.toLong, s"seed=$seed stage=$i") }
    }
  }

  test("deterministic under repartitioning; duplicate names refused") {
    val a = Funnel(df.repartition(7), stages).collect().toSet
    val b = Funnel(df, stages).collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Funnel(df, Seq("x" -> lit(true), "x" -> lit(false)))
    }
  }
}
