package graft

import graft.operators.{Hnsw, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HnswSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8

  // deterministic hash-derived vectors, no RNG
  private def vecs(n: Int) = spark.range(n)
    .select(col("id"), array((0 until dim).map(i =>
      (pmod(xxhash64(col("id") * lit(dim) + lit(i)), lit(1000L)).cast("double") /
        lit(1000.0)) - lit(0.5)): _*).as("vec"))

  test("exhaustive config (nProbe=nCells, efSearch>=shard) equals brute force exactly") {
    val corpus = vecs(120)
    val queries = corpus.filter(col("id") < 6)
    val cents = Similarity.deterministicCentroids(corpus, nCells = 4, iters = 3)
    val idx = Hnsw.buildNswIndex(corpus, cents, m = 4, efConstruction = 16)
    val got = Hnsw.nswTopK(idx, cents, queries, k = 5, nProbe = 4, efSearch = 1 << 20)
      .orderBy(col("query_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val want = Similarity.bruteForceTopK(corpus, queries, 5)
      .orderBy(col("query_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.length == 30)
    assert(got.toSeq == want.toSeq) // bit-identical cosines + same tie rule
  }

  test("insertIntoIndex equals a full fresh build, node for node") {
    val corpus = vecs(120)
    val cents = Similarity.deterministicCentroids(corpus, nCells = 4, iters = 3)
    val base = Hnsw.buildNswIndex(corpus.filter(col("id") >= 30), cents,
      m = 4, efConstruction = 16)
    val merged = Hnsw.insertIntoIndex(base, cents, corpus.filter(col("id") < 30),
      m = 4, efConstruction = 16)
    val full = Hnsw.buildNswIndex(corpus, cents, m = 4, efConstruction = 16)
    def canon(ds: org.apache.spark.sql.Dataset[Hnsw.NswNode]) =
      ds.collect().map(n => (n.cell, n.id, n.vec.toSeq, n.neighbors.sorted.toSeq))
        .sortBy(x => (x._1, x._2)).toSeq
    // the exact-equivalence guarantee the sim_hnsw_insert oracle rests on:
    // buildShard inserts ascending-id regardless of arrival order
    assert(canon(merged) == canon(full))
    // and untouched cells really were untouched (same node set per cell)
    val newCells = merged.filter(col("id") < 30)
      .select(col("cell")).distinct().as[Int].collect().toSet
    assert(newCells.nonEmpty)
  }

  test("index adjacency: spanning-tree connectivity and degree discipline") {
    val corpus = vecs(200)
    val cents = Similarity.deterministicCentroids(corpus, nCells = 2, iters = 2)
    val nodes = Hnsw.buildNswIndex(corpus, cents, m = 3, efConstruction = 8).collect()
    assert(nodes.length == 200)
    nodes.groupBy(_.cell).foreach { case (_, shard) =>
      val ids = shard.map(_.id).toSet
      val adj = shard.map(n => n.id -> n.neighbors.toSet).toMap
      // every neighbor id is a shard member
      shard.foreach(n => assert(n.neighbors.forall(ids.contains)))
      // connected from the min id following DIRECTED edges
      val entry = ids.min
      val seen = scala.collection.mutable.Set(entry)
      val stack = scala.collection.mutable.Stack(entry)
      while (stack.nonEmpty) {
        adj(stack.pop()).foreach(nb => if (seen.add(nb)) stack.push(nb))
      }
      assert(seen == ids, s"shard not connected: reached ${seen.size} of ${ids.size}")
    }
  }

  test("approximate config is deterministic across partitionings and recall is sane") {
    val corpus = vecs(300)
    val queries = corpus.filter(col("id") < 10)
    val cents = Similarity.deterministicCentroids(corpus, nCells = 4, iters = 3)
    def run(c: org.apache.spark.sql.DataFrame) = {
      val idx = Hnsw.buildNswIndex(c, cents, m = 4, efConstruction = 16)
      Hnsw.nswTopK(idx, cents, queries, k = 5, nProbe = 2, efSearch = 8)
        .orderBy(col("query_id"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    val a = run(corpus.repartition(7))
    val b = run(corpus.coalesce(1))
    assert(a == b)
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
    val idx = Hnsw.buildNswIndex(corpus, cents, m = 4, efConstruction = 16)
    val approx = Hnsw.nswTopK(idx, cents, queries, k = 5, nProbe = 2, efSearch = 8)
    val rec = Similarity.annRecallReport(approx, exact, k = 5)
      .agg(avg(col("recall"))).collect()(0).getDouble(0)
    assert(rec > 0.5, s"mean recall@5 suspiciously low: $rec")
  }

  // The spec-proof behind the sim_hnsw_recall VALUES pin (see
  // OracleParitySpec.specProvedPins): the beam trajectory itself has no
  // SQL reformulation, so the recall REPORT is re-derived here from raw
  // collected sets in plain Scala — per query: n_approx / n_exact row
  // counts, hits = |approx-id-set ∩ exact-id-set|, recall = hits/k as one
  // IEEE division by n_exact — and compared field-for-field against
  // Similarity.annRecallReport over the same frames.
  test("recall report re-derived independently from raw top-k sets") {
    val corpus = vecs(300)
    val queries = corpus.filter(col("id") < 10)
    val cents = Similarity.deterministicCentroids(corpus, nCells = 4, iters = 3)
    val idx = Hnsw.buildNswIndex(corpus, cents, m = 4, efConstruction = 16)
    val approx = Hnsw.nswTopK(idx, cents, queries, k = 5, nProbe = 2, efSearch = 8)
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
    val got = Similarity.annRecallReport(approx, exact, k = 5)
      .orderBy(col("query_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val aSets = approx.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val eSets = exact.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = eSets.keys.toSeq.sorted.map { q =>
      val a = aSets.getOrElse(q, Set.empty[Long])
      val hits = (a intersect eSets(q)).size.toLong
      (q, a.size.toLong, eSets(q).size.toLong, hits,
        hits.toDouble / eSets(q).size.toDouble)
    }
    assert(got.toSeq == want)
    assert(got.length == 10)
  }

  test("single-node shard and k > corpus behave") {
    val corpus = vecs(3)
    val queries = corpus.filter(col("id") === 0)
    val cents = Similarity.deterministicCentroids(corpus, nCells = 3, iters = 1)
    val idx = Hnsw.buildNswIndex(corpus, cents, m = 2, efConstruction = 4)
    val out = Hnsw.nswTopK(idx, cents, queries, k = 10, nProbe = 3, efSearch = 64)
      .collect()
    assert(out.map(_.getLong(1)).toSet == Set(1L, 2L)) // self excluded
  }
}
