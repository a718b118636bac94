package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank + canonical-by-centrality survivor policy. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala replay of the integer recurrence. */
  private def brute(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .filter(e => e._1 != e._2).distinct
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size.toLong
    var pr: Map[Long, Long] = deg.map { case (id, _) => id -> Graph.Scale / n }
    for (_ <- 0 until iters) {
      val contribs = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = deg.map { case (id, _) =>
        id -> ((15L * Graph.Scale) / (100L * n) + 85L * contribs.getOrElse(id, 0L) / 100L)
      }
    }
    pr
  }

  // triangle 1-2-3 plus pendant 4 attached to 1: node 1 is most central
  private val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))

  test("picorank recurrence matches a plain-Scala replay; center ranks first") {
    val got = Graph.pageRankFixedPoint(edges.toDF("id_a", "id_b"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute(edges, 3))
    assert(got.maxBy(_._2)._1 == 1L)
    // total mass stays within truncation loss of Scale (1 unit per
    // division, a handful of divisions per node per iteration)
    assert(got.values.sum <= Graph.Scale && got.values.sum > Graph.Scale - 100L)
  }

  test("duplicated and reversed input pairs do not double edges") {
    val dup = edges ++ edges.map(_.swap) ++ edges
    val a = Graph.pageRankFixedPoint(edges.toDF("id_a", "id_b"), iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.pageRankFixedPoint(dup.toDF("id_a", "id_b"), iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("partitioning-layout invariant (exact, not approximate)") {
    val rnd = new scala.util.Random(11)
    val big = (1 to 400).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    val one = Graph.pageRankFixedPoint(big.toDF("id_a", "id_b").coalesce(1), iters = 3)
      .orderBy(col("id")).collect().toSeq
    val many = Graph.pageRankFixedPoint(big.toDF("id_a", "id_b").repartition(13), iters = 3)
      .orderBy(col("id")).collect().toSeq
    assert(one == many)
  }

  test("canonicalByRank flags exactly one canonical per component") {
    // two components: the triangle+pendant, and an isolated pair 10-11
    val pairs = (edges ++ Seq((10L, 11L))).toDF("id_a", "id_b")
    val out = Graph.canonicalByRank(pairs, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    val byComp = out.groupBy(_._2)
    assert(byComp.keySet == Set(1L, 10L)) // component = min id
    byComp.foreach { case (_, rows) => assert(rows.count(_._3) == 1) }
    // the triangle's center wins its component
    assert(out.find(_._3).exists(_._1 == 1L) || out.filter(_._3).map(_._1).contains(1L))
    assert(out.filter(_._2 == 1L).filter(_._3).map(_._1).toSeq == Seq(1L))
  }

  test("validation: iteration and damping bounds") {
    val df = edges.toDF("id_a", "id_b")
    intercept[IllegalArgumentException] { Graph.pageRankFixedPoint(df, iters = 0) }
    intercept[IllegalArgumentException] { Graph.pageRankFixedPoint(df, dampingPct = 100) }
  }

  test("triangleCounts: clique, hub and path shapes") {
    import spark.implicits._
    // K4 on 1-4 (every node in C(3,2)=3 triangles), a hub 10 with three
    // spokes (no triangles), a dangling path 20-21
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L),
      (2L, 1L), (1L, 2L), // duplicates + reversed collapse
      (5L, 5L), // self loop dropped
    ).toDF("id_a", "id_b")
    val got = Graph.triangleCounts(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 3L), got.toString)
    assert(Seq(10L, 11L, 12L, 13L, 20L, 21L).forall(got(_) == 0L))
    assert(!got.contains(5L), "self-loop-only node has no edges")
    // total triangles = sum/3 = 4 (the K4)
    assert(got.values.sum == 12L)
    // deterministic across partitionings
    val a = Graph.triangleCounts(pairs.repartition(7)).collect().map(_.toSeq).toSeq
    val b = Graph.triangleCounts(pairs).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
  test("component-size histogram over CC labels counts each cluster once") {
    import spark.implicits._
    // components: {1,2,3} (size 3), {10,11} (size 2), {20,21} (size 2)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    val hist = graft.operators.Dedup.connectedComponents(pairs)
      .groupBy(col("component")).agg(count(lit(1)).as("size"))
      .groupBy(col("size")).agg(count(lit(1)).as("n_components"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hist == Map(3L -> 1L, 2L -> 2L))
  }
}
