package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** VecNearestCosine / VecTopCosine ≡ the composed argmax form they
  * replaced (array_max / array_sort over per-centroid cosine structs):
  * randomized differential over vectors including zero vectors and
  * exact ties, plus the nprobe=1 ↔ cell consistency contract.
  */
class VecCentroidSpec extends SparkSuite {
  import spark.implicits._

  // the pre-round-9 composed implementation, verbatim semantics
  private def legacyScored(v: Column, cents: Seq[Seq[Double]]): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      struct(VectorOps.cosine(v, typedLit(c)).as("cos"),
        lit(-i).as("negCell"))
    }: _*)
  private def legacyCell(v: Column, cents: Seq[Seq[Double]]): Column =
    -array_max(legacyScored(v, cents)).getField("negCell")
  private def legacyProbes(v: Column, cents: Seq[Seq[Double]], np: Int): Column =
    transform(
      slice(reverse(array_sort(legacyScored(v, cents))), 1, np),
      s => -s.getField("negCell"))

  private val rnd = new scala.util.Random(17)
  private def vec(d: Int): Seq[Double] = Seq.fill(d)(rnd.nextDouble() * 2 - 1)

  test("nearest/top cosine ≡ legacy composed argmax (randomized, 16 cells)") {
    val cents = Seq.fill(16)(vec(8))
    val rows = ((0 until 400).map(i => (i.toLong, vec(8))) ++
      // exact duplicates of centroids (cos = 1 against their own cell)
      cents.zipWithIndex.map { case (c, i) => ((1000 + i).toLong, c) } :+
      // the zero vector: every cosine is the 0.0 guard → ties across ALL
      // cells, must pick cell 0 in both forms
      (2000L, Seq.fill(8)(0.0))).toDF("id", "v")
    val m = IvfAnn.Model(cents)
    val out = rows.select(col("id"),
      m.cell(col("v")).as("nc"),
      legacyCell(col("v"), cents).cast("int").as("lc"),
      m.probes(col("v"), 5).as("np"),
      legacyProbes(col("v"), cents, 5).cast("array<int>").as("lp"))
      .collect()
    for (r <- out) {
      assert(r.getInt(1) == r.getInt(2), s"cell mismatch id=${r.getLong(0)}")
      assert(r.getSeq[Int](3) == r.getSeq[Int](4),
        s"probes mismatch id=${r.getLong(0)}")
    }
    val zero = out.find(_.getLong(0) == 2000L).get
    assert(zero.getInt(1) == 0)
  }

  test("duplicate centroids tie to the smallest cell id; nprobe clamps at k") {
    val c = vec(4)
    val cents = Seq(vec(4), c, c, vec(4)) // cells 1 and 2 identical
    val m = IvfAnn.Model(cents)
    val df = Seq((0L, c)).toDF("id", "v")
    val r = df.select(m.cell(col("v")).as("cell"),
      m.probes(col("v"), 10).as("p")).head()
    assert(r.getInt(0) == 1) // not 2: ties break to the smaller id
    val p = r.getSeq[Int](1)
    assert(p.length == 4 && p.take(2) == Seq(1, 2)) // clamp + tie order
  }

  test("vec_project ≡ legacy per-output-dim dot array (randomized)") {
    val dimIn = 12; val dimOut = 5
    val m = RandomProjection.matrix(dimIn, dimOut, seed = 42L)
    val scale = math.sqrt(dimOut.toDouble)
    val rows = (0 until 300).map(i => (i.toLong, vec(dimIn))).toDF("id", "v")
    val legacy = array(m.map(colJ =>
      VectorOps.dot(col("v"), lit(colJ)) / scale).toIndexedSeq: _*)
    val out = rows.select(col("id"),
      RandomProjection.projectCol(col("v"), dimIn, dimOut).as("np"),
      legacy.as("lp")).collect()
    for (r <- out)
      assert(r.getSeq[Double](1) == r.getSeq[Double](2),
        s"id=${r.getLong(0)}")
  }

  test("null vector yields null; search end-to-end unchanged by the swap") {
    val cents = Seq.fill(6)(vec(8))
    val df = Seq((0L, Option(vec(8))), (1L, Option.empty[Seq[Double]]))
      .toDF("id", "v")
    val m = IvfAnn.Model(cents)
    val rows = df.select(m.cell(col("v")).as("c"), m.probes(col("v"), 2).as("p"))
      .collect()
    assert(!rows(0).isNullAt(0) && !rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }
}
