package graft.similarity

import graft.SparkSuite

/** Reciprocal-rank fusion: hand-computed integer scores, union
  * semantics for a document missing from one leg, top-k cut with the
  * doc-id tie-break, and partitioning invariance.
  */
class RrfSpec extends SparkSuite {
  import spark.implicits._

  private val S = 1000000000000L
  private def c(rank: Long): Long = S / (60L + rank)

  test("rrf: fused score = sum of scale div (k0 + rank), exact") {
    // leg A ranks (d1, d2, d3); leg B ranks (d3, d1) — d2 missing in B
    val legA = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3)).toDF("q", "d", "r")
    val legB = Seq((1L, 30L, 1), (1L, 10L, 2)).toDF("q", "d", "r")
    val out = Rrf.fuse(Seq(legA, legB), "q", "d", "r", topK = 10)
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getInt(3))).toSet
    val expected = Set(
      (10L, c(1) + c(2), 1), // top: rank 1 + rank 2
      (30L, c(3) + c(1), 2), // c(3)+c(1) < c(1)+c(2)
      (20L, c(2), 3))        // single-leg contribution only
    assert(out == expected)
  }

  test("rrf: equal scores tie-break by document id ascending, topK cuts") {
    // two docs with identical (rank-1, rank-2) contributions swapped
    val legA = Seq((1L, 5L, 1), (1L, 3L, 2), (1L, 9L, 3)).toDF("q", "d", "r")
    val legB = Seq((1L, 3L, 1), (1L, 5L, 2), (1L, 9L, 4)).toDF("q", "d", "r")
    val out = Rrf.fuse(Seq(legA, legB), "q", "d", "r", topK = 2)
      .collect().map(x => (x.getLong(1), x.getInt(3))).toSeq.sortBy(_._2)
    // d3 and d5 both score c(1)+c(2): smaller id d3 wins rank 1; topK=2
    // drops d9 entirely
    assert(out == Seq((3L, 1), (5L, 2)))
  }

  test("rrf: per-query fusion is independent and partitioning-invariant") {
    val rnd = new scala.util.Random(3)
    val legs = (0 until 3).map { _ =>
      (for {
        q <- 0L until 7L
        (d, i) <- rnd.shuffle((0L until 40L).toList).take(25).zipWithIndex
      } yield (q, d, i + 1)).toDF("q", "d", "r")
    }
    def run(parts: Int) =
      Rrf.fuse(legs.map(_.repartition(parts)), "q", "d", "r", topK = 5)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getInt(3))).sortBy(t => (t._1, t._4)).toSeq
    val a = run(1)
    assert(a == run(11))
    assert(a.groupBy(_._1).forall(_._2.length == 5))
  }

  test("rrf: guards") {
    intercept[IllegalArgumentException] {
      Rrf.fuse(Seq.empty, "q", "d", "r", topK = 5)
    }
    intercept[IllegalArgumentException] {
      Rrf.fuse(Seq(Seq((1L, 1L, 1)).toDF("q", "d", "r")), "q", "d", "r",
        topK = 0)
    }
  }
}
