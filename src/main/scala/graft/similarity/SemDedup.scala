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
  * "Pick `nlist` so cells fit" is ENFORCED, not assumed: a degenerate
  * quantizer (all vectors landing in one cell) would silently
  * reintroduce the corpus-quadratic kernel, so cell sizes are measured
  * up front (one map-side-combined aggregation to ≤ nlist rows — cheap
  * next to the pair kernel) and any cell above `maxCell` members is
  * refused with the offending sizes, or — with `dropOversized = true` —
  * excluded from pairing (its documents stay singleton clusters, the
  * same contract as [[graft.dedup.MinHashDedup]]'s `maxBucket`). The
  * exclusion is a literal `isin` filter over ≤ nlist cell ids — no
  * extra shuffle on the corpus.
  *
  * Returns `docs` plus `cluster_id`, `cluster_size`, `is_canonical`
  * (least-id survivor; re-elect by quality with
  * [[graft.dedup.DuplicateClusters.canonicalBy]]).
  */
object SemDedup {

  /** @param maxCell      refuse (or drop) cells with more members — the
    *                     m²-pair skew guard; `Int.MaxValue` skips the
    *                     measuring pass entirely
    * @param dropOversized drop oversized cells from pairing instead of
    *                     throwing; their documents survive un-deduped
    */
  def apply(
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      model: IvfAnn.Model,
      threshold: Double,
      maxIter: Int = 30,
      maxCell: Int = 100000,
      dropOversized: Boolean = false): DataFrame = {
    require(maxCell >= 2, "maxCell must be at least 2")
    val cell = "__graft_cell"
    val withCell = docs.withColumn(cell, model.cell(col(vecCol)))
    val bounded =
      if (maxCell == Int.MaxValue) withCell
      else {
        // ≤ nlist rows reach the driver — same bounded-probe class as
        // the quantizer's own centroid collect
        val fat = withCell.groupBy(col(cell))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") > maxCell)
          .collect().map(r => r.getInt(0) -> r.getLong(1))
        if (fat.nonEmpty && !dropOversized)
          throw new IllegalArgumentException(
            s"SemDedup: ${fat.length} quantizer cell(s) exceed maxCell=" +
              s"$maxCell (worst: ${fat.maxBy(_._2)}); the within-cell " +
              "kernel is quadratic in cell size. Raise nlist (retrain " +
              "the quantizer), raise maxCell, or pass " +
              "dropOversized = true to leave those documents un-deduped")
        if (fat.isEmpty) withCell
        else withCell.filter(!col(cell).isin(fat.map(_._1): _*))
      }
    val pairs = EmbeddingDedup(bounded, idCol, vecCol, threshold,
      blockBy = Seq(cell))
    DuplicateClusters(docs, idCol, pairs, "id_l", "id_r", maxIter)
  }
}
