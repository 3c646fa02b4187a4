package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Fixed-point Lloyd k-means: known-geometry fixtures, the determinism
  * contract (bit-identical assignments under any partitioning), the
  * empty-cluster retention rule, and model/frame agreement.
  */
class KMeansSpec extends SparkSuite {
  import spark.implicits._

  // two tight blobs around (0,0) and (1,1); ids ordered so the seeds
  // (two smallest ids) start one in each blob
  private def blobs = Seq(
    (0L, Seq(0.01f, 0.02f)), (2L, Seq(0.03f, -0.01f)), (4L, Seq(-0.02f, 0.0f)),
    (1L, Seq(0.98f, 1.01f)), (3L, Seq(1.02f, 0.97f)), (5L, Seq(0.99f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("kmeans: separates two blobs, exact integer distances") {
    val (model, assigned) = KMeans.fit(blobs, "vec_id", "embedding",
      k = 2, iters = 3)
    val byId = assigned.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(byId.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    assert(Set(0L, 2L, 4L).map(byId(_)._1).size == 1) // blob A together
    assert(Set(1L, 3L, 5L).map(byId(_)._1).size == 1) // blob B together
    assert(byId(0L)._1 != byId(1L)._1)
    // distance is exact integer math: recompute one by hand
    val m = model.centroids
    val q0 = Seq(0.01f, 0.02f).map(x => math.floor(x.toDouble * (1L << 20)).toLong)
    val c = m(byId(0L)._1)
    val want = q0.zip(c).map { case (x, cc) => (x - cc) * (x - cc) }.sum
    assert(byId(0L)._2 == want)
  }

  test("kmeans: assignments are partitioning-independent (bit-identical)") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 400).map { i =>
      (i.toLong, Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
    def run(parts: Int) =
      KMeans.fit(df.repartition(parts), "vec_id", "embedding",
        k = 5, iters = 3)._2
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(run(1) == run(13))
  }

  test("kmeans: empty cluster keeps its centroid; duplicate seeds tolerated") {
    // seeds are ids 0 and 1 — identical vectors, so every point ties to
    // cluster 0 and cluster 1 starves from iteration 1 onward
    val df = Seq(
      (0L, Seq(0.5f, 0.5f)), (1L, Seq(0.5f, 0.5f)), (2L, Seq(0.4f, 0.6f))
    ).toDF("vec_id", "embedding")
    val (model, assigned) = KMeans.fit(df, "vec_id", "embedding",
      k = 2, iters = 1)
    // iteration 1 assigned every point to cluster 0 (tie → smallest), so
    // cluster 1 starved and its update kept the seed centroid verbatim
    val q = Seq(0.5f, 0.5f).map(x => math.floor(x.toDouble * (1L << 20)).toLong)
    assert(model.centroids(1) == q)
    // the unchanged centroid is still live: it wins its own seed points
    // back in the final assignment (0.5,0.5 is now closer to the seed
    // than to cluster 0's moved mean) — correct Lloyd behavior
    assert(assigned.count() == 3)
  }

  test("kmeans: model.assign matches the returned assignment frame") {
    val (model, assigned) = KMeans.fit(blobs, "vec_id", "embedding",
      k = 2, iters = 2)
    val viaModel = blobs
      .select(col("vec_id"), model.assign(col("embedding")).as("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val viaFrame = assigned.select("vec_id", "cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(viaModel == viaFrame)
  }

  test("kmeans: null vectors dropped, guards fire") {
    val df = Seq(
      (0L, Some(Seq(0.1f, 0.2f))), (1L, None), (2L, Some(Seq(0.3f, 0.1f)))
    ).toDF("vec_id", "embedding")
    val (_, assigned) = KMeans.fit(df, "vec_id", "embedding", k = 2, iters = 1)
    assert(assigned.count() == 2)
    intercept[IllegalArgumentException] {
      KMeans.fit(df, "vec_id", "embedding", k = 2, iters = 1, scale = 3L)
    }
    intercept[IllegalArgumentException] { // k > non-null vectors
      KMeans.fit(df, "vec_id", "embedding", k = 5, iters = 1)
    }
  }
}
