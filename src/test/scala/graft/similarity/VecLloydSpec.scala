package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** VecNearestSqLong / VecPqCodes / VecAdc ≡ the composed
  * higher-order-function forms they replaced in the integer Lloyd /
  * PQ paths: randomized differential including exact ties (duplicate
  * centroids / duplicate codebook rows) and boundary codes.
  */
class VecLloydSpec extends SparkSuite {
  import spark.implicits._

  // the pre-round-9 composed implementations, verbatim semantics
  private def legacyBest(q: Column, cents: Seq[Seq[Long]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, j) =>
      struct(
        aggregate(
          zip_with(q, typedLit(c), (x, cc) => (x - cc) * (x - cc)),
          lit(0L), (acc, v) => acc + v).as("dist"),
        lit(j).as("cluster"))
    }: _*)).cast("struct<dist:bigint,cluster:int>")

  private def legacySubCode(q: Column, cb: Seq[Seq[Long]],
      si: Int, dsub: Int): Column =
    array_min(array(cb.zipWithIndex.map { case (c, j) =>
      struct(
        aggregate(
          zip_with(slice(q, si * dsub + 1, dsub), typedLit(c),
            (x, cc) => (x - cc) * (x - cc)),
          lit(0L), (acc, v) => acc + v).as("dist"),
        lit(j).as("code"))
    }: _*)).cast("struct<dist:bigint,code:int>").getField("code")

  private def legacyAdc(codes: Column, lut: Column): Column =
    aggregate(zip_with(codes, lut, (c, row) => element_at(row, c + 1)),
      lit(0L), (acc, v) => acc + v)

  private val rnd = new scala.util.Random(23)
  private def lvec(d: Int): Seq[Long] = Seq.fill(d)(rnd.nextLong() % 1000000L)

  test("vec_nearest_sq ≡ legacy composed argmin (randomized, ties)") {
    val base = Seq.fill(7)(lvec(8))
    val cents = base :+ base(2) // duplicate: exact tie → smaller cluster id
    val rows = ((0 until 300).map(i => (i.toLong, lvec(8))) ++
      cents.zipWithIndex.map { case (c, i) => ((1000 + i).toLong, c) })
      .toDF("id", "v")
    val m = KMeans.Model(cents.map(_.toIndexedSeq).toIndexedSeq, 1L << 20)
    val out = rows.select(col("id"),
      m.best(col("v")).as("nb"), legacyBest(col("v"), cents).as("lb")).collect()
    for (r <- out)
      assert(r.getStruct(1) == r.getStruct(2), s"id=${r.getLong(0)}")
    // the duplicated centroid's own vector resolves to the SMALLER id
    val dup = out.find(_.getLong(0) == 1007L).get
    assert(dup.getStruct(1).getInt(1) == 2)
  }

  test("vec_pq_codes ≡ legacy per-subspace argmin chain") {
    val mSub = 4; val ksub = 5; val dsub = 3
    val cb = IndexedSeq.fill(mSub)(IndexedSeq.fill(ksub)(
      lvec(dsub).toIndexedSeq))
    val model = PqAnn.Model(cb, 1L << 20)
    val rows = (0 until 250).map(i => (i.toLong, lvec(mSub * dsub)))
      .toDF("id", "v")
    val out = rows.select(col("id"),
      model.encodeQuantized(col("v")).as("nc"),
      array((0 until mSub).map(si =>
        legacySubCode(col("v"), cb(si), si, dsub)): _*).as("lc")).collect()
    for (r <- out)
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"id=${r.getLong(0)}")
  }

  test("vec_adc ≡ legacy element_at fold, incl. boundary codes") {
    val mSub = 6; val ksub = 4
    val rows = (0 until 200).map { i =>
      val codes = Seq.fill(mSub)(rnd.nextInt(ksub))
      val lut = Seq.fill(mSub)(Seq.fill(ksub)(rnd.nextLong() % 1000000L))
      (i.toLong, codes, lut)
    } :+ ((999L, Seq.fill(mSub)(ksub - 1), // max code in every subspace
      Seq.fill(mSub)(Seq.fill(ksub)(rnd.nextLong() % 1000000L))))
    val df = rows.toDF("id", "codes", "lut")
    val model = PqAnn.Model(
      IndexedSeq.fill(mSub)(IndexedSeq.fill(ksub)(IndexedSeq(0L))), 1L << 20)
    val out = df.select(col("id"),
      model.adc(col("codes"), col("lut")).as("na"),
      legacyAdc(col("codes"), col("lut")).as("la")).collect()
    for (r <- out)
      assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}")
  }

  test("nearest-sq is partitioning-invariant inside a full kmeans fit") {
    val big = (0 until 300).map { i =>
      (i.toLong, Seq.fill(6)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("id", "v")
    def run(parts: Int) =
      KMeans.fit(big.repartition(parts), "id", "v", k = 5, iters = 2)
        ._2.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(run(1) == run(13))
  }
}
