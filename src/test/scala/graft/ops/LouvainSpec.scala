package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-level Louvain: coarsening conservation laws, stability of an
  * optimal partition, and modularity monotone across levels — the
  * contract `sim_louvain_levels` rides. */
class LouvainSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame =
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b), 1L) }
      .toDF("a", "b", "w")

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))

  /** Weighted modularity of a labeling over canonical (a,b,w) edges
    * (self-loops allowed): Σ_c [ e_in(c)/m − (d_c / 2m)² ]. */
  private def modularity(edges: Seq[(Long, Long, Long)],
                         lab: Map[Long, Long]): Double = {
    val m = edges.map(_._3).sum.toDouble
    val deg = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    edges.foreach { case (a, b, w) =>
      if (a == b) deg(a) += 2 * w else { deg(a) += w; deg(b) += w }
    }
    val ein = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    edges.foreach { case (a, b, w) =>
      if (lab(a) == lab(b)) ein(lab(a)) += w
    }
    val dsum = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    deg.foreach { case (n, d) => dsum(lab(n)) += d.toDouble }
    (ein.keySet ++ dsum.keySet).toSeq.map { c =>
      ein(c) / m - math.pow(dsum(c) / (2 * m), 2)
    }.sum
  }

  private def labelsOf(df: DataFrame, keyCol: String, valCol: String): Map[Long, Long] =
    df.select(keyCol, valCol).as[(Long, Long)].collect().toMap

  test("coarsening conserves total weight; supernode degree = sum of member degrees") {
    val e0 = edgesDf(clique(Seq(0L, 1L, 2L)) ++ clique(Seq(10L, 11L, 12L)) ++ Seq((2L, 10L)))
    val lab = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L), (12L, 10L))
      .toDF("n", "comm")
    val e1 = Similarity.louvainCoarsen(e0, lab)
    val rows = e1.as[(Long, Long, Long)].collect().toSet
    // 3 intra edges each → self-loops of weight 3; one bridge of weight 1
    assert(rows == Set((0L, 0L, 3L), (10L, 10L, 3L), (0L, 10L, 1L)))
    assert(e1.agg(sum("w")).as[Long].head() ==
      e0.agg(sum("w")).as[Long].head(), "total weight must be conserved")
  }

  test("an optimal two-clique partition is stable through both levels") {
    // two K4s joined by one bridge: the clique partition is optimal;
    // at level 2 the supernode gain 2m·w(bridge) − k_A·k_B = 26 − 169
    // is negative, so neither supernode moves — exact LONG arithmetic
    val cliqueA = Seq(0L, 1L, 2L, 3L)
    val cliqueB = Seq(10L, 11L, 12L, 13L)
    val pairs = clique(cliqueA) ++ clique(cliqueB) ++ Seq((3L, 10L))
    val seed = (cliqueA.map(_ -> 0L) ++ cliqueB.map(_ -> 10L)).toDF("n", "comm")
    val out = Similarity.louvainLevels(
      pairs.map { case (a, b) => (a, b) }.toDF("a", "b"), seed)
    val l2 = labelsOf(out, "vec_id", "comm2")
    assert(cliqueA.map(l2).toSet.size == 1 && cliqueB.map(l2).toSet.size == 1)
    assert(l2(0L) != l2(10L), "the bridge must not merge the cliques")
  }

  test("rounds within a level: bounded unroll law, early exit = running the remaining rounds") {
    val cliques = Seq(0L, 100L, 200L, 300L).map(base => (0L until 5L).map(base + _))
    val bridges = Seq((4L, 100L), (104L, 200L), (204L, 300L), (304L, 0L))
    val pairs = cliques.flatMap(clique) ++ bridges
    val raw = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b), 1L) }
    val e = edgesDf(pairs)
    val emptySeed = Seq.empty[(Long, Long)].toDF("n", "comm")

    // the unroll law: rounds=2 IS louvainMoveRound∘louvainMoveRound
    // (what the oracle chain unrolls), early exit or not
    val m1 = Similarity.louvainMoveRound(e, emptySeed)
    val m2 = Similarity.louvainMoveRound(e, m1)
    assert(labelsOf(Similarity.louvainMoveRounds(e, emptySeed, 2), "n", "comm")
      == labelsOf(m2, "n", "comm"))

    // the second round catches chain moves the synchronized first round
    // left on the table: modularity strictly improves on this fixture
    val q1 = modularity(raw, labelsOf(m1, "n", "comm"))
    val q2 = modularity(raw, labelsOf(m2, "n", "comm"))
    assert(q2 >= q1 - 1e-12, s"round 2 must not lose modularity: $q1 -> $q2")

    // early exit ≡ running the remaining rounds: find the manual fixed
    // point, then a large bound must land exactly on it (and one more
    // application must reproduce it)
    var cur = m1
    var prev = labelsOf(m1, "n", "comm")
    var fixed: Option[Map[Long, Long]] = None
    for (_ <- 2 to 10 if fixed.isEmpty) {
      cur = Similarity.louvainMoveRound(e, cur)
      val now = labelsOf(cur, "n", "comm")
      if (now == prev) fixed = Some(now) else prev = now
    }
    assert(fixed.nonEmpty, "fixture must reach a fixed point within 10 rounds")
    assert(labelsOf(Similarity.louvainMoveRounds(e, emptySeed, 10), "n", "comm")
      == fixed.get)
    assert(labelsOf(Similarity.louvainMoveRound(e, cur), "n", "comm") == fixed.get,
      "a fixed point must reproduce itself")
  }

  test("modularity is non-decreasing across seed -> level 1 -> level 2") {
    // ring of four K5s, singleton seeds: level 1 merges within cliques,
    // level 2 can only improve or hold — assert the full chain
    val cliques = Seq(0L, 100L, 200L, 300L).map(base => (0L until 5L).map(base + _))
    val bridges = Seq((4L, 100L), (104L, 200L), (204L, 300L), (304L, 0L))
    val pairs = cliques.flatMap(clique) ++ bridges
    val raw = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b), 1L) }
    val emptySeed = Seq.empty[(Long, Long)].toDF("n", "comm")
    val out = Similarity.louvainLevels(
      pairs.map { case (a, b) => (a, b) }.toDF("a", "b"), emptySeed)
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val qSeed = modularity(raw, nodes.map(n => n -> n).toMap)
    val q1 = modularity(raw, labelsOf(out, "vec_id", "comm1"))
    val q2 = modularity(raw, labelsOf(out, "vec_id", "comm2"))
    assert(q1 >= qSeed - 1e-12, s"level 1 must not lose modularity: $qSeed -> $q1")
    assert(q2 >= q1 - 1e-12, s"level 2 must not lose modularity: $q1 -> $q2")
    assert(q2 > qSeed, s"two levels must beat singletons: $qSeed -> $q2")

    // and the hierarchy engine holds the chain through a THIRD level
    val labs = Similarity.louvainLabels(
      pairs.map { case (a, b) => (a, b) }.toDF("a", "b"), emptySeed, levels = 3)
    val qs = labs.map(l => modularity(raw, labelsOf(l, "vec_id", "comm")))
    assert(qs(0) == q1 && qs(1) == q2,
      "louvainLevels must be the 2-level projection of louvainLabels")
    assert(qs(2) >= qs(1) - 1e-12, s"level 3 must not lose modularity: $qs")
  }
}
