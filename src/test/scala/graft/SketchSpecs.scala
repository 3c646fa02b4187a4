package graft

import graft.agg.{CountMin, DistinctSketch}
import graft.similarity.RandomProjection
import org.apache.spark.sql.functions._

/** Specs for the deterministic sketch family (KMV distinct, count-min)
  * and the JL random projection.
  */
class SketchSpecs extends SparkSuite {
  import spark.implicits._

  // --- KMV distinct sketch -------------------------------------------

  test("kmv: groups below k are exact; duplicates never inflate") {
    val df = (0 until 10).flatMap(v => Seq.fill(5)(("a", s"v$v")))
      .toDF("grp", "v")
    val out = DistinctSketch.approxDistinct(df, Seq("grp"), "v", k = 16)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("n_distinct_est") == 10.0)
  }

  test("kmv: estimate within ~4 sigma at k=256") {
    val n = 5000
    val df = (0 until n).map(v => ("a", s"value_$v")).toDF("grp", "v")
    val est = DistinctSketch.approxDistinct(df, Seq("grp"), "v", k = 256)
      .collect().head.getAs[Double]("n_distinct_est")
    // relative error ~1/sqrt(k-2) ≈ 6.3%; 4 sigma ≈ 25%
    assert(math.abs(est - n) < n * 0.25, s"est=$est for n=$n")
  }

  test("kmv: sketches of slices union to exactly the whole-frame sketch") {
    val k = 32
    val df = (0 until 2000).map(v => ("a", s"x$v", v % 2)).toDF("grp", "v", "half")
    val whole = DistinctSketch.sketch(df, Seq("grp"), "v", k)
      .collect().head.getAs[scala.collection.Seq[Long]]("kmv")
    val halves = DistinctSketch.sketch(df, Seq("grp", "half"), "v", k)
    val merged = halves.groupBy("grp")
      .agg(collect_list("kmv").as("parts"))
      .select(DistinctSketch.unionSketch(
        element_at(col("parts"), 1), element_at(col("parts"), 2), k).as("kmv"))
      .collect().head.getAs[scala.collection.Seq[Long]]("kmv")
    assert(merged == whole)
  }

  test("kmv: deterministic across repartitionings") {
    val df = (0 until 3000).map(v => ("g" + v % 3, s"u$v")).toDF("grp", "v")
    val a = DistinctSketch.approxDistinct(df.repartition(13), Seq("grp"), "v")
      .orderBy("grp").collect().map(_.getAs[Double]("n_distinct_est")).toSeq
    val b = DistinctSketch.approxDistinct(df.coalesce(1), Seq("grp"), "v")
      .orderBy("grp").collect().map(_.getAs[Double]("n_distinct_est")).toSeq
    assert(a == b)
  }

  // --- bottom-k quantile sketch --------------------------------------

  test("quantile sketch: groups at or below k are exact percentile_cont") {
    import graft.agg.QuantileSketch
    val df = (1 to 50).map(v => ("a", s"id$v", v.toDouble)).toDF("grp", "id", "v")
    val sk = QuantileSketch.sketch(df, Seq("grp"), "v", col("id"), k = 64)
    val got = sk.select(
      QuantileSketch.quantile(col("qsk"), 0.5).as("p50"),
      QuantileSketch.quantile(col("qsk"), 0.25).as("p25")).head
    val want = df.agg(
      expr("percentile(v, 0.5)"), expr("percentile(v, 0.25)")).head
    assert(got.getDouble(0) == want.getDouble(0))
    assert(got.getDouble(1) == want.getDouble(1))
  }

  test("quantile sketch: slice sketches union to exactly the whole-frame sketch") {
    import graft.agg.QuantileSketch
    val k = 16
    val df = (0 until 2000).map(v => ("a", s"id$v", (v % 97).toDouble, v % 2))
      .toDF("grp", "id", "v", "half")
    val whole = QuantileSketch.sketch(df, Seq("grp"), "v", col("id"), k)
      .select(QuantileSketch.quantile(col("qsk"), 0.5)).head.getDouble(0)
    val halves = QuantileSketch.sketch(df, Seq("grp", "half"), "v", col("id"), k)
    val merged = halves.groupBy("grp")
      .agg(collect_list("qsk").as("parts"))
      .select(QuantileSketch.quantile(QuantileSketch.unionSketch(
        element_at(col("parts"), 1), element_at(col("parts"), 2), k), 0.5))
      .head.getDouble(0)
    assert(merged == whole)
  }

  test("quantile sketch: deterministic across repartitionings; ~sample accuracy") {
    import graft.agg.QuantileSketch
    val n = 4000
    val df = (0 until n).map(v => ("a", s"id$v", v.toDouble)).toDF("grp", "id", "v")
    def p50(d: org.apache.spark.sql.DataFrame) =
      QuantileSketch.sketch(d, Seq("grp"), "v", col("id"), k = 256)
        .select(QuantileSketch.quantile(col("qsk"), 0.5)).head.getDouble(0)
    val a = p50(df.repartition(17))
    val b = p50(df.coalesce(1))
    assert(a == b)
    // true median is ~n/2; sample error ~ n/(2*sqrt(k)) — allow 4x
    assert(math.abs(a - n / 2.0) < 4 * n / (2 * math.sqrt(256)), s"p50=$a")
  }

  // --- count-min sketch ----------------------------------------------

  private def tokenRows = Seq(
    "w1" -> 100, "w2" -> 50, "w3" -> 10, "w4" -> 3, "w5" -> 1
  ).flatMap { case (w, c) => Seq.fill(c)(w) }.toDF("tok")

  test("count-min: never underestimates, exact on a wide sketch") {
    val sk = CountMin.sketch(tokenRows, "tok", depth = 4, width = 4096)
    val keys = Seq("w1", "w2", "w3", "w4", "w5").toDF("tok")
    val est = CountMin.estimate(sk, keys, "tok", depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("w1" -> 100L, "w2" -> 50L, "w3" -> 10L, "w4" -> 3L, "w5" -> 1L)
    exact.foreach { case (k, v) =>
      assert(est(k) >= v, s"$k underestimated: ${est(k)} < $v")
    }
    // 5 keys in 4×4096 cells: collision probability ~0 → exact
    assert(est == exact)
  }

  test("count-min: unseen key estimates 0 on a wide sketch") {
    val sk = CountMin.sketch(tokenRows, "tok", depth = 4, width = 4096)
    val est = CountMin.estimate(sk, Seq("nope").toDF("tok"), "tok",
      depth = 4, width = 4096).collect().head.getLong(1)
    assert(est == 0L)
  }

  test("count-min: slice sketches merge to the whole-frame sketch") {
    val a = tokenRows.limit(80)
    val b = tokenRows.exceptAll(a)
    val merged = CountMin.merge(
        CountMin.sketch(a, "tok"), CountMin.sketch(b, "tok"))
      .orderBy("depth", "bucket").collect().toSeq
    val whole = CountMin.sketch(tokenRows, "tok")
      .orderBy("depth", "bucket").collect().toSeq
    assert(merged == whole)
  }

  test("count-min: weighted sketch counts weights, not rows") {
    val df = Seq(("w1", 7L), ("w1", 3L), ("w2", 5L)).toDF("tok", "n")
    val sk = CountMin.sketch(df, "tok", depth = 3, width = 512, weight = col("n"))
    val est = CountMin.estimate(sk, Seq("w1", "w2").toDF("tok"), "tok",
      depth = 3, width = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("w1" -> 10L, "w2" -> 5L))
  }

  // --- random projection ---------------------------------------------

  test("random projection: basis vectors map to ±1/√k entries; linear") {
    val dimIn = 8; val dimOut = 4
    val e0 = Array.tabulate(dimIn)(i => if (i == 0) 1.0 else 0.0)
    val e1 = Array.tabulate(dimIn)(i => if (i == 1) 1.0 else 0.0)
    val both = e0.zip(e1).map { case (a, b) => 2.0 * a + 3.0 * b }
    val df = Seq((0L, e0), (1L, e1), (2L, both)).toDF("id", "embedding")
    val out = RandomProjection.project(df, "embedding", dimIn, dimOut, seed = 7L)
      .orderBy("id").collect().map(_.getAs[scala.collection.Seq[Double]]("embedding"))
    val s = 1.0 / math.sqrt(dimOut.toDouble)
    out(0).foreach(v => assert(math.abs(math.abs(v) - s) < 1e-12))
    out(1).foreach(v => assert(math.abs(math.abs(v) - s) < 1e-12))
    // linearity: P(2·e0 + 3·e1) = 2·P(e0) + 3·P(e1)
    out(2).zip(out(0).zip(out(1))).foreach { case (c, (a, b)) =>
      assert(math.abs(c - (2 * a + 3 * b)) < 1e-12)
    }
  }

  test("random projection: deterministic; matrix signs from the md5 recipe") {
    val m1 = RandomProjection.matrix(16, 8, 42L)
    val m2 = RandomProjection.matrix(16, 8, 42L)
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    assert(m1.flatten.forall(v => v == 1.0 || v == -1.0))
    // different seed → different matrix
    val m3 = RandomProjection.matrix(16, 8, 43L)
    assert(m1.map(_.toSeq).toSeq != m3.map(_.toSeq).toSeq)
  }

  test("random projection: separates far clusters after 64→8 reduction") {
    // two tight clusters far apart in 64-dim space; after projection,
    // within-cluster distances must stay well below between-cluster
    val rnd = new scala.util.Random(11)
    def pt(center: Double) =
      Array.tabulate(64)(_ => center + rnd.nextGaussian() * 0.05)
    val rows = (0 until 10).map(i => (i.toLong, pt(0.0))) ++
      (10 until 20).map(i => (i.toLong, pt(5.0)))
    val df = rows.toDF("id", "embedding")
    val proj = RandomProjection.project(df, "embedding", 64, 8)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[scala.collection.Seq[Double]]("embedding")).toMap
    def dist(a: scala.collection.Seq[Double], b: scala.collection.Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val within = for (i <- 0L until 10L; j <- (i + 1) until 10L)
      yield dist(proj(i), proj(j))
    val between = for (i <- 0L until 10L; j <- 10L until 20L)
      yield dist(proj(i), proj(j))
    assert(within.max < between.min,
      s"projection lost cluster structure: ${within.max} vs ${between.min}")
  }

  test("random projection: null vectors pass through as null") {
    val df = Seq((0L, Some(Array.fill(8)(1.0))), (1L, None))
      .toDF("id", "embedding")
    val out = RandomProjection.project(df, "embedding", 8, 4)
      .orderBy("id").collect()
    assert(out(0).getAs[scala.collection.Seq[Double]]("embedding").length == 4)
    assert(out(1).isNullAt(1))
  }
}
