package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.DuplicateClusters

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540): cluster the corpus embeddings with
  * a coarse quantizer, then treat each cell as a dedup block — within a
  * cell, document pairs above a cosine threshold form a
  * semantic-duplicate graph whose transitive closure is collapsed to one
  * canonical document per semantic cluster. Cross-cell near-duplicates
  * are missed by construction; that is the approximation that makes the
  * all-pairs kernel block-bounded instead of corpus-quadratic.
  *
  * Pure composition of the existing scale paths, each already
  * plan-audited:
  *   - cell assignment is the IVF coarse quantizer ([[IvfAnn.Model.cell]]
  *     — literal centroids shipped in the expression, map-side, the
  *     corpus is never shuffled for assignment);
  *   - within-cell pairs come from [[EmbeddingDedup]] with
  *     `blockBy = cell` (the quadratic kernel is bounded by the largest
  *     cell; pick `nlist` so cells fit, exactly as IVF sizing does);
  *   - the closure + canonical election is [[DuplicateClusters]]
  *     (pointer-jumping min-label, O(log d) rounds).
  *
  * Returns `docs` plus `cluster_id`, `cluster_size`, `is_canonical`
  * (least-id survivor; re-elect by quality with
  * [[graft.dedup.DuplicateClusters.canonicalBy]]).
  */
object SemDedup {

  def apply(
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      model: IvfAnn.Model,
      threshold: Double,
      maxIter: Int = 30): DataFrame = {
    val cell = "__graft_cell"
    val withCell = docs.withColumn(cell, model.cell(col(vecCol)))
    val pairs = EmbeddingDedup(withCell, idCol, vecCol, threshold,
      blockBy = Seq(cell))
    DuplicateClusters(docs, idCol, pairs, "id_l", "id_r", maxIter)
  }
}
