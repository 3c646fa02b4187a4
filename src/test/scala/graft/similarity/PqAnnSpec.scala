package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Product-quantization ANN: exact-recovery fixture (ksub covers the
  * corpus → ADC distance IS the exact integer distance), the
  * determinism contract (bit-identical codes under any partitioning),
  * guards (ragged dims, dim % m), empty-code retention, and the
  * IVF-composed search (nprobe = nlist ≡ the plain ADC scan).
  */
class PqAnnSpec extends SparkSuite {
  import spark.implicits._

  private val scale = 1L << 20

  private def quant(v: Seq[Float]): Seq[Long] =
    v.map(x => math.floor(x.toDouble * scale).toLong)

  private def exactDist(a: Seq[Float], b: Seq[Float]): Long =
    quant(a).zip(quant(b)).map { case (x, y) => (x - y) * (x - y) }.sum

  // 6 distinct 4-dim vectors
  private val vecs = Seq(
    0L -> Seq(0.1f, 0.2f, -0.3f, 0.4f),
    1L -> Seq(0.9f, -0.8f, 0.7f, -0.6f),
    2L -> Seq(-0.5f, 0.4f, 0.3f, -0.2f),
    3L -> Seq(0.05f, 0.15f, -0.25f, 0.35f),
    4L -> Seq(0.85f, -0.75f, 0.65f, -0.55f),
    5L -> Seq(-0.45f, 0.35f, 0.25f, -0.15f))
  private def df = vecs.toDF("vec_id", "embedding")

  test("pq: ksub >= corpus and iters=0 -> codes are exact, ADC = exact distance") {
    // every vector is its own seed centroid: each subvector quantizes
    // to itself, so ADC reconstructs the exact integer distance
    val (model, codes) = PqAnn.fit(df, "vec_id", "embedding",
      m = 2, ksub = 6, iters = 0)
    val res = PqAnn.search(codes, df.filter(col("vec_id") < 2),
      "vec_id", "embedding", "pq_codes", k = 5, model)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val vm = vecs.toMap
    for (((q, n), adist) <- res)
      assert(adist == exactDist(vm(q), vm(n)), s"query=$q neighbor=$n")
    // all 5 non-self neighbors ranked for both queries
    assert(res.size == 10)
  }

  test("pq: native VecPqLut == composed subDist chain, bit-for-bit " +
      "(incl. ksub = 256 production width)") {
    // 16-dim corpus so a 256-code codebook has room to differ per code
    val rnd = new scala.util.Random(11)
    val wide = (0L until 300L).map(i =>
      i -> Seq.fill(16)(rnd.nextFloat() * 2 - 1)).toDF("vec_id", "embedding")
    for (ksub <- Seq(4, 256)) {
      val (model, _) = PqAnn.fit(wide, "vec_id", "embedding",
        m = 4, ksub = ksub, iters = 1)
      val q = wide.filter(col("vec_id") < 8)
        .select(col("vec_id"), model.quantize(col("embedding")).as("qq"))
        .localCheckpoint(true)
      def lutMap(c: org.apache.spark.sql.Column) = q.select(col("vec_id"),
          c.as("lut"))
        .collect().map(r => r.getLong(0) ->
          r.getSeq[scala.collection.Seq[Long]](1).map(_.toList).toList).toMap
      val native = lutMap(model.lutQuantized(col("qq")))
      val composed = lutMap(model.lutQuantizedComposed(col("qq")))
      assert(native == composed, s"ksub=$ksub lut mismatch")
      assert(native.head._2.length == 4 &&
        native.head._2.head.length == ksub)
    }
  }

  test("pq: codes and ranks are partitioning-independent (bit-identical)") {
    val rnd = new scala.util.Random(7)
    val big = (0 until 300).map { i =>
      (i.toLong, Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
    def run(parts: Int) = {
      val (model, codes) = PqAnn.fit(big.repartition(parts), "vec_id",
        "embedding", m = 4, ksub = 5, iters = 2)
      (model.codebooks,
        PqAnn.search(codes, big.filter(col("vec_id") < 5), "vec_id",
          "embedding", "pq_codes", k = 3, model)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getInt(3))).sortBy(t => (t._1, t._4)).toSeq)
    }
    assert(run(1) == run(13))
  }

  test("pq: ADC never beats the true nearest neighbor's exact distance rank quality") {
    // sanity: with enough codes the top-1 ADC neighbor of a vector that
    // has an exact twin IS the twin (distance 0 survives quantization)
    val twin = (df.collect().map(r => (r.getLong(0), r.getSeq[Float](1))) :+
      (100L, vecs.toMap.apply(3L))).toSeq.toDF("vec_id", "embedding")
    val (model, codes) = PqAnn.fit(twin, "vec_id", "embedding",
      m = 2, ksub = 7, iters = 1)
    val top = PqAnn.search(codes, twin.filter(col("vec_id") === 100L),
      "vec_id", "embedding", "pq_codes", k = 1, model)
      .collect().head
    assert(top.getLong(1) == 3L && top.getLong(2) == 0L)
  }

  test("pq: guards — ragged dims, dim % m, too few vectors") {
    val ragged = Seq((0L, Seq(0.1f, 0.2f)), (1L, Seq(0.3f, 0.4f, 0.5f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      PqAnn.fit(ragged, "vec_id", "embedding", m = 1, ksub = 2, iters = 1)
    }
    assert(e1.getMessage.contains("ragged"))
    val e2 = intercept[IllegalArgumentException] {
      PqAnn.fit(df, "vec_id", "embedding", m = 3, ksub = 2, iters = 1)
    }
    assert(e2.getMessage.contains("divisible"))
    val e3 = intercept[IllegalArgumentException] {
      PqAnn.fit(df.limit(2), "vec_id", "embedding", m = 2, ksub = 4, iters = 1)
    }
    assert(e3.getMessage.contains("non-null vectors"))
  }

  test("pq: empty code keeps its centroid across an iteration") {
    // two tight clusters + ksub=3: the third seed (id 2) loses all its
    // points after iteration 1 once ids 2 and 5 sit nearer another
    // centroid — its codebook row must survive unchanged, not NaN/zero
    val d = Seq(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(1.0f, 1.0f), 2L -> Seq(0.01f, 0.01f),
      3L -> Seq(0.99f, 0.99f), 4L -> Seq(0.02f, 0.0f), 5L -> Seq(1.0f, 0.98f)
    ).toDF("vec_id", "embedding")
    val (m1, _) = PqAnn.fit(d, "vec_id", "embedding", m = 1, ksub = 3, iters = 3)
    assert(m1.codebooks.head.length == 3)
    assert(m1.codebooks.head.forall(_.forall(v => v.abs <= 2 * scale)))
  }

  test("pq: IVF-composed search with nprobe = nlist equals the plain ADC scan") {
    val rnd = new scala.util.Random(11)
    val big = (0 until 200).map { i =>
      (i.toLong, Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
    val (model, codes) = PqAnn.fit(big, "vec_id", "embedding",
      m = 4, ksub = 4, iters = 1)
    val coarse = IvfAnn.fit(big, "vec_id", "embedding", nlist = 4)
    val withCell = codes.join(
      big.select(col("vec_id"),
        coarse.cell(col("embedding").cast("array<double>")).as("cell")),
      "vec_id")
    val queries = big.filter(col("vec_id") < 4)
    def rows(dfr: org.apache.spark.sql.DataFrame) =
      dfr.select("query_id", "neighbor_id", "adist", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).toSet
    val plain = rows(PqAnn.search(codes, queries, "vec_id", "embedding",
      "pq_codes", k = 3, model))
    val ivf = rows(PqAnn.search(withCell, queries, "vec_id", "embedding",
      "pq_codes", k = 3, model, coarse = Some(("cell", coarse, 4))))
    assert(ivf == plain)
    // and a pruned probe returns a subset of the candidates' pairs
    val pruned = PqAnn.search(withCell, queries, "vec_id", "embedding",
      "pq_codes", k = 3, model, coarse = Some(("cell", coarse, 1)))
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned.nonEmpty)
  }

  test("pq: null query vectors are dropped, not scored (brute and coarse)") {
    val withNull = (vecs :+ (200L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val (model, codes) = PqAnn.fit(withNull, "vec_id", "embedding",
      m = 2, ksub = 6, iters = 1)
    val qs = withNull.filter(col("vec_id") === 200L || col("vec_id") === 0L)
    val brute = PqAnn.search(codes, qs, "vec_id", "embedding",
      "pq_codes", k = 3, model).select("query_id")
      .collect().map(_.getLong(0)).toSet
    assert(brute == Set(0L), "null-vector query must produce no rows")
    val coarse = IvfAnn.fit(df, "vec_id", "embedding", nlist = 2)
    val withCell = codes.join(
      df.select(col("vec_id"),
        coarse.cell(col("embedding").cast("array<double>")).as("cell")),
      "vec_id")
    val probed = PqAnn.search(withCell, qs, "vec_id", "embedding",
      "pq_codes", k = 3, model, coarse = Some(("cell", coarse, 2)))
      .select("query_id").collect().map(_.getLong(0)).toSet
    assert(probed == Set(0L))
  }

  test("residual pq: ksub >= corpus and iters=0 -> ADC = exact distance") {
    // every residual is its own seed centroid, and the query residual is
    // built against the NEIGHBOR's cell — so the ADC sum telescopes to
    // the exact integer distance ‖q − x‖² regardless of which cell each
    // vector landed in
    val coarse = IvfAnn.fit(df, "vec_id", "embedding", nlist = 2)
    val (model, codes) = PqAnn.fitResidual(df, "vec_id", "embedding",
      coarse, m = 2, ksub = 6, iters = 0)
    assert(codes.columns.toSeq == Seq("vec_id", "pq_codes", "cell"))
    val res = PqAnn.searchResidual(codes, df.filter(col("vec_id") < 2),
      "vec_id", "embedding", "pq_codes", "cell", k = 5, model, nprobe = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val vm = vecs.toMap
    assert(res.size == 10)
    for (((q, n), adist) <- res)
      assert(adist == exactDist(vm(q), vm(n)), s"query=$q neighbor=$n")
  }

  test("residual pq: codes/ranks partitioning-independent; pruned probe subset") {
    val rnd = new scala.util.Random(23)
    val big = (0 until 300).map { i =>
      (i.toLong, Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
    val coarse = IvfAnn.fit(big, "vec_id", "embedding", nlist = 4)
    def run(parts: Int) = {
      val (model, codes) = PqAnn.fitResidual(big.repartition(parts),
        "vec_id", "embedding", coarse, m = 4, ksub = 5, iters = 2)
      (model.pq.codebooks,
        PqAnn.searchResidual(codes, big.filter(col("vec_id") < 5),
          "vec_id", "embedding", "pq_codes", "cell", k = 3, model,
          nprobe = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getInt(3))).sortBy(t => (t._1, t._4)).toSeq)
    }
    assert(run(1) == run(13))
    // nprobe=1 candidates ⊆ nprobe=4 candidates per query
    val (model, codes) = PqAnn.fitResidual(big, "vec_id", "embedding",
      coarse, m = 4, ksub = 5, iters = 2)
    def cands(np: Int) = PqAnn.searchResidual(codes,
      big.filter(col("vec_id") < 5), "vec_id", "embedding", "pq_codes",
      "cell", k = 300, model, nprobe = np)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands(1).subsetOf(cands(4)))
  }
}
