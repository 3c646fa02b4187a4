package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search — the classic
  * cell-probe scale path complementing [[LshAnn]] (hyperplane LSH) and
  * [[CosineTopK]] (exact brute force).
  *
  * A coarse quantizer of `nlist` centroids partitions the corpus into
  * cells ("inverted lists"): each corpus vector is assigned to its
  * highest-cosine centroid ONCE, map-side, no shuffle. A query probes the
  * `nprobe` nearest cells and scores only those candidates exactly —
  * cost drops from O(|Q|·|C|) to ~O(|Q|·|C|·nprobe/nlist).
  *
  * Scale design (100 TB posture):
  *   - centroids are a driver-side literal array (nlist × dim doubles —
  *     a few MB for any sane nlist), shipped inside the codegen'd cell
  *     expression; assignment is embarrassingly parallel;
  *   - the corpus is NEVER shuffled: the probe side (queries × nprobe
  *     cell ids) broadcasts, and the cell-equality join prunes
  *     (1 − nprobe/nlist) of each corpus partition at probe time;
  *   - for query sets too large to broadcast, repartition BOTH sides by
  *     `cell` — that co-located layout IS the inverted-file index, and
  *     writing the corpus bucketed by cell amortizes it across query
  *     batches;
  *   - `fit` here picks deterministic seed centroids (first `nlist` rows
  *     by id — reproducible in any engine, which the differential oracle
  *     needs). Real deployments train k-means on a sample and pass the
  *     trained centroids to [[IvfAnn.Model]] directly; every downstream
  *     step is identical.
  */
object IvfAnn {

  /** Coarse quantizer: `centroids(i)` is cell `i`'s centroid.
    *
    * Both assignments run through the compact native expressions
    * ([[org.apache.spark.sql.graft.VecNearestCosine]] /
    * [[org.apache.spark.sql.graft.VecTopCosine]]). The earlier composed
    * form (`array_max` over an array of k inline cosine structs)
    * inflated the consuming stage's generated method past the JIT's
    * compilable size at k = 16, leaving the IVF probe join interpreted
    * — measured 60× slower at sf1 (SCALING.md round 9).
    */
  case class Model(centroids: Seq[Seq[Double]]) {
    require(centroids.nonEmpty, "need at least one centroid")

    /** Cell id (int) of vector `v`: argmax-cosine centroid, ties to the
      * SMALLEST cell id. */
    def cell(v: Column): Column =
      org.apache.spark.sql.graft.VecFunctions.vec_nearest_cosine(v, centroids)

    /** The `nprobe` nearest cell ids of `v`, best first (cosine
      * descending, ties to the smallest cell id). */
    def probes(v: Column, nprobe: Int): Column =
      org.apache.spark.sql.graft.VecFunctions.vec_top_cosine(v, centroids, nprobe)
  }

  /** Deterministic seed quantizer: centroids = the `nlist` corpus vectors
    * with the smallest ids. Reproducible everywhere (no RNG, no
    * iteration order); swap in k-means-trained centroids for recall.
    */
  def fit(corpus: DataFrame, idCol: String, vecCol: String, nlist: Int): Model =
    // BOUNDED collect: limit(nlist) caps it at nlist·dim doubles — the
    // coarse quantizer is driver-sized by design (it ships to executors
    // as a literal matrix), whatever the corpus size
    Model(corpus
      .orderBy(col(idCol))
      .limit(nlist)
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq)

  /** Trained quantizer: Spark ML k-means (Lloyd over distributed
    * partials — the training itself is a Spark job, so it scales to any
    * corpus; train on a sample for speed, the quantizer only needs the
    * coarse shape). `distanceMeasure = cosine` matches the cosine-argmax
    * cell assignment in [[Model.cell]] — training with the same metric
    * the probes use is what buys recall at low `nprobe`.
    *
    * @param sampleFraction train on a corpus sample (deterministic under
    *                       the same seed + input; 1.0 = full corpus)
    */
  def fitKMeans(
      corpus: DataFrame,
      vecCol: String,
      nlist: Int,
      seed: Long = 42L,
      maxIter: Int = 20,
      sampleFraction: Double = 1.0): Model = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val base =
      if (sampleFraction < 1.0) corpus.sample(withReplacement = false, sampleFraction, seed)
      else corpus
    val feats = base.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val km = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setDistanceMeasure("cosine")
      .setFeaturesCol("features")
    Model(km.fit(feats).clusterCenters
      .map(_.toArray.toIndexedSeq).toIndexedSeq)
  }

  /** Top-k cosine neighbors per query among the probed cells.
    *
    * @param corpus  (idCol, vecCol)
    * @param queries (idCol, vecCol) — small; broadcast with its probes
    * @return (query_id, neighbor_id, cosine, rank) — rank 1..k by
    *         descending cosine, ties by neighbor id ascending (the same
    *         contract as [[CosineTopK]]; approximate — neighbors outside
    *         the probed cells are missed)
    */
  def search(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      model: Model,
      nprobe: Int,
      excludeSelf: Boolean = true,
      broadcastQueries: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      model.cell(col(vecCol)).as("cell"))
    // broadcastQueries = false is the documented big-query-batch path:
    // both sides hash on `cell`, i.e. the co-located inverted-file
    // layout (persist the corpus bucketed by cell to amortize it)
    val q0 = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(model.probes(col(vecCol), nprobe)).as("cell"))
    val q = if (broadcastQueries) broadcast(q0) else q0
    val scored = c.join(q,
        c("cell") === q("cell") &&
          (if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true)))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** One corpus pass serving a whole `nprobe` grid — the advisor/recall
    * measurement path. [[search]] at np ∈ {1, 2, 4} costs three corpus
    * cell-assignment passes (`model.cell` is nlist·dim flops per corpus
    * row) plus three probe joins; but [[Model.probes]] is PREFIX-STABLE
    * (the selection loop takes cells best-first with ties to the
    * smallest id), so the candidate set at any np ≤ max(nprobes) is
    * exactly the max-np candidate set restricted to probe rank < np.
    * This computes the max-np candidates ONCE (one cell assignment, one
    * join, one cosine per candidate), tags each candidate with every
    * requested np whose probe window contains its cell, and ranks with
    * a single window — per (np, query) the rows are bit-identical to
    * `search(..., nprobe = np)`.
    *
    * @return (nprobe, query_id, neighbor_id, cosine, rank) — one row
    *         group per distinct requested nprobe
    */
  def searchMulti(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      model: Model,
      nprobes: Seq[Int],
      excludeSelf: Boolean = true,
      broadcastQueries: Boolean = true): DataFrame = {
    require(nprobes.nonEmpty, "need at least one nprobe")
    val nps = nprobes.distinct.sorted
    val maxNp = nps.last
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      model.cell(col(vecCol)).as("cell"))
    val q0 = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        posexplode(model.probes(col(vecCol), maxNp))
          .as(Seq("__graft_pr", "cell")))
    val q = if (broadcastQueries) broadcast(q0) else q0
    val scored = c.join(q,
        c("cell") === q("cell") &&
          (if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true)))
      .select(col("query_id"), col("neighbor_id"), col("__graft_pr"),
        VectorOps.cosine(col("qv"), col("cv")).as("cosine"))
    // a candidate probed at rank r belongs to every leg with np > r; the
    // explode duplicates only matched candidates (≤ |nps|×), never the
    // corpus scan
    val npArr = array(nps.map(lit): _*)
    val tagged = scored
      .withColumn("nprobe",
        explode(filter(npArr, np => np > col("__graft_pr"))))
      .drop("__graft_pr")
    val w = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    tagged.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("nprobe"), col("query_id"), col("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Convenience: fit + search in one call. */
  def apply(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int,
      nprobe: Int,
      excludeSelf: Boolean = true): DataFrame =
    search(corpus, queries, idCol, vecCol, k,
      fit(corpus, idCol, vecCol, nlist), nprobe, excludeSelf)
}
