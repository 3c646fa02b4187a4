package graft

import org.apache.spark.sql.functions._
import graft.graph.{LabelPropagation, PageRank}

/** PageRank: differential vs a sequential fixed-point oracle, structure
  * sanity (hubs, rings, dangling mass), and the determinism contract
  * that motivates the integer formulation.
  */
class GraphSpecs extends SparkSuite {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Sequential reference with IDENTICAL integer arithmetic. */
  private def refRank(edges: Seq[(Long, Long)], nodes: Seq[Long],
                      iters: Int, damping: Int = 85): Map[Long, Long] = {
    val n = nodes.size
    val base = Scale / n
    val tele = (100L - damping) * base / 100L
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodeSet = nodes.toSet
    var rank = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(outdeg.contains).map(rank).sum
      val dshare = damping * dm / (100L * n)
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((u, v) <- edges if nodeSet.contains(u))
        contrib(v) += damping * rank(u) / (100L * outdeg(u))
      rank = nodes.map(v => v -> (tele + dshare + contrib(v))).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long],
                  iters: Int): Map[Long, Long] =
    PageRank(edges.toDF("s", "d"), "s", "d", iterations = iters,
      nodes = Some(nodes.toDF("node")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pagerank matches the sequential integer oracle on a random multigraph") {
    val rnd = new scala.util.Random(7)
    val nodes = (0L until 60L).toSeq
    // multigraph: duplicates and self-loops on purpose; ~1/5 of nodes
    // end up dangling (no out-edges)
    val edges = (0 until 150).map { _ =>
      (rnd.nextInt(48).toLong, rnd.nextInt(60).toLong)
    }
    assert(run(edges, nodes, 6) == refRank(edges, nodes, 6))
  }

  test("pagerank on a symmetric ring is uniform every iteration") {
    val n = 12L
    val nodes = (0L until n).toSeq
    val edges = nodes.map(i => (i, (i + 1) % n))
    val got = run(edges, nodes, 5)
    assert(got.values.toSet.size == 1)
    assert(got == refRank(edges, nodes, 5))
  }

  test("pagerank early stop: converged ring stops early, deterministically") {
    val n = 12L
    val nodes = (0L until n).toSeq
    val edges = nodes.map(i => (i, (i + 1) % n))
    // the uniform ring drifts by ~1 fixed-point unit per node per round
    // (integer division quantization) until the exact integer fixed
    // point — well before 20 rounds; tolerance=1 stops there
    val (dfEarly, rounds) = PageRank.run(
      edges.toDF("s", "d"), "s", "d", iterations = 20,
      nodes = Some(nodes.toDF("node")), tolerance = 1L)
    assert(rounds < 20, s"expected early stop, ran all $rounds")
    val early = dfEarly.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bit-identical to running exactly `rounds` iterations without the
    // stop, and the stopping round is partitioning-independent
    assert(early == run(edges, nodes, rounds))
    val (dfAgain, roundsAgain) = PageRank.run(
      edges.toDF("s", "d").repartition(5), "s", "d", iterations = 20,
      nodes = Some(nodes.toDF("node")), tolerance = 1L)
    assert(roundsAgain == rounds)
    assert(dfAgain.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == early)
    // tolerance=0 disables the stop: all rounds run
    val (_, all) = PageRank.run(edges.toDF("s", "d"), "s", "d",
      iterations = 3, nodes = Some(nodes.toDF("node")))
    assert(all == 3)
  }

  test("pagerank is bit-identical under input repartitioning") {
    val rnd = new scala.util.Random(11)
    val nodes = (0L until 40L).toSeq
    val edges = (0 until 90).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val base = run(edges, nodes, 4)
    val shuffled = PageRank(
      edges.toDF("s", "d").repartition(7), "s", "d", iterations = 4,
      nodes = Some(nodes.toDF("node").repartition(3)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base == shuffled)
  }

  test("pagerank: hub outranks leaves; dangling mass is redistributed") {
    // star into node 0 (a pure sink: dangling), leaves 1..9
    val nodes = (0L to 9L).toSeq
    val edges = (1L to 9L).map(i => (i, 0L))
    val got = run(edges, nodes, 8)
    assert(got(0L) > got(1L))
    assert(got == refRank(edges, nodes, 8))
    // dangling redistribution keeps total mass near scale: without it
    // the sink would absorb and drain ~85% of everything each round
    val total = got.values.sum
    assert(total > Scale * 95L / 100L && total <= Scale)
  }

  test("pagerank: default universe = edge endpoints; isolated node via nodes=") {
    val edges = Seq((1L, 2L), (2L, 1L))
    val noIso = PageRank(edges.toDF("s", "d"), "s", "d", iterations = 3)
      .collect().map(_.getLong(0)).toSet
    assert(noIso == Set(1L, 2L))
    val withIso = run(edges, Seq(1L, 2L, 3L), 3)
    assert(withIso.keySet == Set(1L, 2L, 3L))
    // the isolated node is dangling: it holds teleport + dangling share
    assert(withIso(3L) < withIso(1L))
    assert(withIso == refRank(edges, Seq(1L, 2L, 3L), 3))
  }

  test("pagerank rejects invalid arguments") {
    val e = Seq((1L, 2L)).toDF("s", "d")
    intercept[IllegalArgumentException](PageRank(e, "s", "d", iterations = 0))
    intercept[IllegalArgumentException](PageRank(e, "s", "d", dampingPct = 101))
    intercept[IllegalArgumentException](PageRank(e, "s", "d", scale = 10L))
    // scale needs 100x headroom under Long.MaxValue (dampingPct * rank)
    intercept[IllegalArgumentException](
      PageRank(e, "s", "d", scale = Long.MaxValue / 2L))
    intercept[IllegalArgumentException](PageRank(e, "s", "d", tolerance = -1L))
    // nodes must be a single-column frame — a multi-column frame would
    // silently rank by its first column otherwise
    intercept[IllegalArgumentException](
      PageRank(e, "s", "d", nodes = Some(Seq((1L, "x")).toDF("n", "extra"))))
  }

  // ── label propagation ─────────────────────────────────────────────────

  private def refLpa(edges: Seq[(Long, Long)], seed: Map[Long, Long],
                     iters: Int): Map[Long, Long] = {
    var labels = seed
    for (_ <- 1 to iters) {
      val next = edges.groupBy(_._2).map { case (dst, in) =>
        val counts = in.map(e => labels(e._1))
          .groupBy(identity).map { case (l, xs) => l -> xs.size }
        // majority, ties to the smallest label
        dst -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
      labels = labels.map { case (n, l) => n -> next.getOrElse(n, l) }
    }
    labels
  }

  test("label propagation matches the sequential rule on a random graph") {
    val rnd = new scala.util.Random(13)
    val nodes = (0L until 50L).toSeq
    val edges = Seq.fill(220)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val seed = nodes.map(n => n -> (n % 7)).toMap
    val want = refLpa(edges, seed, 4)
    val got = LabelPropagation(
      seed.toSeq.toDF("node", "label"), edges.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("label propagation: two cliques converge to one label each") {
    // two 4-cliques joined by a single weak edge
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val edges = clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((3L, 10L))
    val nodes = Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L)
    val out = LabelPropagation(nodes.toDF("node"), edges.toDF("src", "dst"),
      iters = 6).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique agrees internally; the cliques stay distinct
    assert(Seq(0L, 1L, 2L, 3L).map(out).toSet.size == 1)
    assert(Seq(11L, 12L, 13L).map(out).toSet.size == 1)
    assert(out(0L) != out(11L))
  }

  test("label propagation is bit-identical under repartitioning") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
    def run(parts: Int) = LabelPropagation(
      (0L until 80L).toDF("node").repartition(parts),
      edges.toDF("src", "dst").repartition(parts), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(11))
  }
}
