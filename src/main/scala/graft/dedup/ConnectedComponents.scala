package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointStats

/** Connected components over a near-duplicate pair graph, and cluster
  * assignment for a document corpus.
  *
  * The pair generators ([[MinHashDedup]], [[SimHashDedup]],
  * [[NgramJaccardDedup]], [[graft.similarity.EmbeddingDedup]]) emit edges;
  * actually deduplicating a corpus additionally needs the transitive
  * closure — a chain a~b~c must collapse to ONE cluster even when (a,c)
  * itself is below the similarity threshold. The reference is a
  * single-machine pandas library and has no analogue; at cluster scale the
  * closure is the classic iterative min-label algorithm with pointer
  * jumping (cf. Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14): O(log d) rounds for diameter d, each round a pair of
  * shuffle-partitioned equi-joins plus a grouped min.
  *
  * Scale posture: the per-round state is one (node, comp) frame of two
  * longs per node — tiny next to the corpus — and is localCheckpoint'ed
  * every round to truncate lineage (an iterative plan would otherwise grow
  * without bound and recompute every prior round). Convergence detection
  * is a single scalar aggregate per round (labels are monotonically
  * non-increasing, so the label sum is a fixpoint witness), not a collect
  * of data.
  */
object ConnectedComponents {

  /** `(node: long, comp: long)` for every node appearing in `edges`;
    * `comp` is the least node id in the node's component. Self-loops and
    * null endpoints are ignored. Nodes not mentioned in `edges` do not
    * appear (callers complete singletons themselves, cf.
    * [[DuplicateClusters]]).
    */
  def apply(edges: DataFrame, srcCol: String, dstCol: String,
            maxIter: Int = 30): DataFrame = {
    // materialize the edge list BEFORE mirroring: `edges` is typically an
    // expensive pair-generation pipeline (LSH banding, Jaccard verify),
    // and the union below references it twice — without the barrier the
    // whole pipeline would run once per orientation
    val e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .localCheckpoint()
    // undirected: both orientations once; reused by every round. Pinned
    // stats: checkpoint leaves inherit the PRE-checkpoint plan's size
    // estimate (see [[org.apache.spark.sql.graft.CheckpointStats]]) — for
    // `sym` that is the whole pair-generation pipeline's, typically a
    // wild multiplicative overestimate that would then seed every
    // round's join estimates.
    val sym0 = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint()
    val sym = CheckpointStats.withRowCount(sym0, sym0.count(), 24)
    // seed with min(self, neighbors) — the first propagate round folded
    // into initialization (one grouped min on the mirrored edges), which
    // saves a full checkpoint+witness cycle on star-shaped dup clusters
    var labels = sym.groupBy(col("u").as("node"))
      .agg(min(col("v")).as("__nm"))
      .select(col("node"), least(col("node"), col("__nm")).as("comp"))
      .localCheckpoint()
    // label sum as the fixpoint witness; decimal(38,0): a long sum can
    // overflow once node-id × node-count crosses 2^63 (real at 100 TB).
    // An empty label frame (no edges at all) sums to SQL null — normalize
    // to zero so the fixpoint compare terminates instead of NPE-ing.
    // The same pass counts the rows — the honest size the round's
    // checkpoints get pinned to (the node set never changes).
    def witness(l: DataFrame): (java.math.BigDecimal, Long) = {
      val r = l.agg(sum(col("comp").cast("decimal(38,0)")), count(lit(1))).head
      val d = r.getDecimal(0)
      (if (d == null) java.math.BigDecimal.ZERO else d, r.getLong(1))
    }
    var (prev, nNodes) = witness(labels)
    labels = CheckpointStats.withRowCount(labels, nNodes, 24)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // propagate: comp'(u) = min(comp(u), min over neighbors v of comp(v))
      val nbrMin = sym.as("e")
        .join(labels.as("l"), col("e.v") === col("l.node"))
        .groupBy(col("e.u").as("node")).agg(min(col("l.comp")).as("nmin"))
      val prop = labels.as("l")
        .join(nbrMin.as("m"), col("l.node") === col("m.node"), "left")
        .select(col("l.node").as("node"),
          least(col("l.comp"), coalesce(col("m.nmin"), col("l.comp"))).as("comp"))
      // materialize the propagate result BEFORE jumping: the jumps below
      // self-join their input, and every reference to an un-checkpointed
      // `prop` re-runs the edge join above — the expensive step of the
      // round. Checkpointed, the edge join runs exactly ONCE per round
      // and the jumps join a two-long-column frame. Pinned stats: prop
      // is a 1:1 left join on the label frame, so its row count is
      // nNodes by construction — without the pin, each round's inherited
      // estimate compounds multiplicatively through the self-joins and
      // the optimizer's stats walks end up doing million-bit BigInt
      // multiplication (measured: q_dedup_embcluster seconds → >7 min).
      val p = CheckpointStats.withRowCount(prop.localCheckpoint(), nNodes, 24)
      // pointer jump: comp''(u) = min(comp'(u), comp'(comp'(u))) — label
      // values are themselves node ids, so each extra self-join halves
      // the remaining pointer depth (this is what makes the loop
      // O(log d)). TWO jumps per round: a jump is a join on the tiny
      // checkpointed (node, comp) frame — far cheaper than the edge-join
      // propagate step — and chain-shaped duplicate graphs
      // (near-threshold cosine links) otherwise dominate the round count
      def jump(l: DataFrame): DataFrame = l.as("a")
        .join(l.select(col("node").as("jn"), col("comp").as("jc")).as("j"),
          col("a.comp") === col("j.jn"), "left")
        .select(col("a.node").as("node"),
          least(col("a.comp"), coalesce(col("j.jc"), col("a.comp"))).as("comp"))
      val jumped = jump(jump(p)).localCheckpoint()
      p.unpersist(blocking = false)
      val (cur, _) = witness(jumped)
      converged = cur.compareTo(prev) == 0
      prev = cur
      // the superseded round's checkpoint blocks are dead the moment the
      // new frame is materialized — at cluster scale, 30 retained copies
      // of a per-node frame is real storage pressure
      labels.unpersist(blocking = false)
      labels = CheckpointStats.withRowCount(jumped, nNodes, 24)
      iter += 1
    }
    sym.unpersist(blocking = false)
    e.unpersist(blocking = false)
    // scale diagnostics: rounds is the O(log d) witness — it should stay
    // flat as data replicates (components get wider, not deeper)
    System.err.println(s"[cc] rounds=$iter converged=$converged")
    labels
  }
}

/** Cluster assignment: every document gets the id of its near-duplicate
  * cluster (the least reachable doc id through `pairs`), the cluster size,
  * and a canonical flag marking the one survivor per cluster. Documents in
  * no pair form singleton clusters of themselves.
  */
object DuplicateClusters {

  def apply(docs: DataFrame, idCol: String,
            pairs: DataFrame, leftCol: String, rightCol: String,
            maxIter: Int = 30): DataFrame = {
    // ids must be integral — EVERYWHERE: the cluster id IS the least id,
    // and a silent cast("long") on strings would null out cluster
    // assignments (docs side) or drop every edge (pairs side, where the
    // nulls feed the isNotNull filter and dedup silently no-ops)
    val integral = Set("byte", "short", "integer", "long")
    def checkId(df: DataFrame, c: String, what: String): Unit = {
      val t = df.schema(c).dataType
      require(integral(t.typeName),
        s"DuplicateClusters needs an integral $what column, got $t for $c")
    }
    checkId(docs, idCol, "id")
    checkId(pairs, leftCol, "pair-endpoint")
    checkId(pairs, rightCol, "pair-endpoint")
    val comp = ConnectedComponents(pairs, leftCol, rightCol, maxIter)
    val labeled = docs.as("d")
      .join(comp.as("c"), col(s"d.$idCol").cast("long") === col("c.node"), "left")
      .withColumn("cluster_id",
        coalesce(col("c.comp"), col(s"d.$idCol").cast("long")))
      .drop("node", "comp")
    // sizes via groupBy + join, not a count-over-cluster window: a
    // mega-cluster (one boilerplate doc duplicated everywhere) would pin
    // its whole window partition on one task, while the aggregate
    // reduces map-side and AQE can skew-split the join
    val sizes = labeled.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_id")
      .withColumn("is_canonical",
        (col(idCol).cast("long") === col("cluster_id")).cast("int"))
      .select((docs.columns.toSeq :+ "cluster_id" :+ "cluster_size"
        :+ "is_canonical").map(col): _*)
  }

  /** Re-elects each cluster's canonical row by PREFERENCE rather than
    * least-id: curation pipelines keep the best duplicate (longest text,
    * highest quality score), not the numerically smallest id. `prefer`
    * columns rank descending-first-wins; ties fall back to ascending id
    * so the choice stays deterministic. One rank window over the
    * existing cluster partitioning — no new shuffle when the frame is
    * already cluster-keyed.
    */
  def canonicalBy(clustered: DataFrame, idCol: String,
                  prefer: Seq[Column],
                  clusterCol: String = "cluster_id"): DataFrame = {
    require(prefer.nonEmpty, "pass at least one preference column")
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(prefer.map(_.desc) :+ col(idCol).asc: _*)
    clustered.withColumn("is_canonical",
      (row_number().over(w) === 1).cast("int"))
  }
}
