package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph centrality over derived document/entity graphs — e.g. ranking the
  * canonical member of a near-dup cluster by how central it is in the
  * similarity graph (the PageRank-as-canonicalizer pattern), or weighting
  * sources by citation-like link structure before mixture sampling.
  *
  * FIXED-POINT arithmetic, deliberately: float PageRank sums partial
  * contributions in shuffle order, so two runs of the same job (or the
  * same run after an AQE re-plan or task retry) can disagree in the last
  * ulps — and a rank ORDER can flip on a near-tie. Ranks here live in
  * integer units of 1e-12 ("picoranks"): contributions use integer
  * division, sums are exact BIGINT adds (associative/commutative — any
  * partitioning, any engine), and the DuckDB oracle replays every
  * iteration bit-identically. The truncation error is bounded by 1 unit
  * per division — ~1e-12 per node per iteration, orders below anything a
  * ranking could notice.
  *
  * Scale shape: the classic 2-shuffles-per-iteration loop — contributions
  * shuffle on src (a join against the symmetrized edge list), sums
  * shuffle on dst with map-side partial aggregation; the edge list is
  * lazily pinned so iterations re-read it instead of re-deriving it. Hot
  * (high-degree) nodes are ordinary AQE skew-join territory; the per-node
  * state is one long.
  */
object Graph {

  val Scale: Long = 1000000000000L // 1e12 picorank units

  /** Fixed-point PageRank over an UNDIRECTED pair list (id_a, id_b).
    *
    * Pairs are symmetrized and de-duplicated; nodes are the pair
    * endpoints (an isolated document has no edges and no rank — filter
    * your corpus against the output, don't expect a row). Per iteration:
    *
    *   pr_{t+1}(v) = ((100-dampingPct) * Scale) div (100 * n)
    *               + (dampingPct * Σ_{u~v} (pr_t(u) div deg(u))) div 100
    *
    * all in BIGINT. Returns (id, rank_fp, rank) with rank = rank_fp/1e12
    * as a double (exact: both operands integral), ordered by nothing —
    * callers order. */
  def pageRankFixedPoint(
      pairs: DataFrame, // (id_a, id_b)
      iters: Int = 3,
      dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 20, s"pageRankFixedPoint: iters must be in [1, 20], got $iters")
    require(dampingPct >= 1 && dampingPct <= 99,
      s"pageRankFixedPoint: dampingPct must be in [1, 99], got $dampingPct")
    val sym = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct() // a duplicated input pair must not double an edge's weight
      .transform(graft.operators.Pin.lazyPin) // every iteration re-reads the edges — pin once
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n1 = deg.agg(count(lit(1)).as("n"))
    var pr = deg.select(col("src").as("id"), col("deg"))
      .crossJoin(broadcast(n1))
      .withColumn("pr", expr(s"$Scale div n"))
    val teleport = expr(s"((${100 - dampingPct}) * $Scale) div (100 * n)")
    for (_ <- 0 until iters) {
      val contribs = pr
        .select(col("id").as("src"), expr("pr div deg").as("c"))
        .join(sym, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        .withColumnRenamed("dst", "id")
      pr = pr.drop("pr").join(contribs, Seq("id"), "left")
        .withColumn("pr", teleport + expr(s"($dampingPct * coalesce(s, 0L)) div 100"))
        .drop("s")
    }
    pr.select(col("id"), col("pr").as("rank_fp"),
      (col("pr").cast("double") / lit(Scale)).as("rank"))
  }

  /** Canonical member per near-dup component by graph centrality: the
    * highest-PageRank node of each connected component (rank ties break
    * to the smallest id) — the "most representative duplicate" policy,
    * complementing min-id ([[Dedup.dedupByPairs]]) and best-quality
    * ([[Dedup.dedupByPairsKeepBest]]) survivor rules. */
  def canonicalByRank(pairs: DataFrame, iters: Int = 3): DataFrame = {
    val ranks = pageRankFixedPoint(pairs, iters)
    val comps = Dedup.connectedComponents(
      pairs.select(col("id_a"), col("id_b")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(col("rank_fp").desc, col("id").asc)
    comps.join(ranks, Seq("id"))
      .withColumn("_rn", row_number().over(w))
      .select(col("id"), col("component"), col("rank_fp"), col("rank"),
        (col("_rn") === 1).as("is_canonical"))
  }

  /** Per-node triangle counts over an undirected pair list — the local
    * clustering signal that separates a tight template family (every
    * member similar to every other) from a hub-and-spokes false-positive
    * cluster (one doc superficially similar to many unrelated ones) in a
    * near-dup graph; also the standard community-structure probe.
    *
    * Algorithm: degree-ordered node-iterator (Schank & Wagner 2005) —
    * each undirected edge is ORIENTED from its lower to its higher
    * endpoint under the total order (degree, id), wedges are generated
    * only at each node's oriented out-neighborhood, and a wedge closes
    * iff its two endpoints are themselves an oriented edge. Orienting by
    * degree caps every out-degree at O(√m), so a celebrity node of
    * degree d generates O(d) wedge work instead of O(d²) — the reason
    * this survives a power-law 100 TB graph where the naive
    * all-neighbor-pairs join does not. Each triangle is generated
    * exactly once (its lowest-ordered vertex owns it).
    *
    * Scale shape: one degree aggregation, one self-equi-join of the
    * oriented edge list on the wedge apex, one equi-join of wedges
    * against the edge list on the closing pair, one explode+count —
    * every join an equi-join on bounded keys, all counts exact BIGINTs
    * (trivially oracle-portable).
    *
    * @param pairs (id_a, id_b) undirected; self-loops/nulls dropped,
    *              duplicates collapse
    * @return (id, n_triangles) — every node of the pair list, 0 for
    *         triangle-free nodes, ordered by id */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val canon = pairs
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .transform(graft.operators.Pin.lazyPin)
    val deg = canon.select(col("a").as("id")).unionAll(canon.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .transform(graft.operators.Pin.lazyPin)
    // orient each edge low -> high under the (deg, id) total order
    val oriented = canon
      .join(deg.select(col("id").as("a"), col("deg").as("_da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("_db")), Seq("b"))
      .select(
        when(col("_da") < col("_db") ||
          (col("_da") === col("_db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(col("_da") < col("_db") ||
          (col("_da") === col("_db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("dst"))
      .transform(graft.operators.Pin.lazyPin)
    // wedges at the apex: unordered out-neighbor pairs, then close against
    // the oriented edge list (either orientation of the closing pair)
    val l = oriented.select(col("src"), col("dst").as("_v"))
    val r = oriented.select(col("src"), col("dst").as("_w"))
    val wedges = l.join(r, Seq("src")).filter(col("_v") < col("_w"))
    val closing = oriented.select(
      least(col("src"), col("dst")).as("_v"), greatest(col("src"), col("dst")).as("_w"))
    val tris = wedges.join(closing, Seq("_v", "_w"))
    val perNode = tris
      .select(explode(array(col("src"), col("_v"), col("_w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n"))
    deg.select(col("id"))
      .join(perNode, Seq("id"), "left")
      .select(col("id"), coalesce(col("n"), lit(0L)).as("n_triangles"))
      .orderBy(col("id"))
  }

  /** k-core decomposition membership: the maximal induced subgraph in
    * which every node has degree >= k (Seidman 1983, "Network structure
    * and minimum degree") — the density gate on a near-dup graph that
    * [[triangleCounts]] probes locally: a template family survives the
    * 2-core (its members sit on cycles), a hub-and-spokes false-positive
    * star dies (every spoke has degree 1), and higher k isolates
    * progressively tighter clique-like cores worth a single canonical
    * survivor.
    *
    * Algorithm: synchronous DELTA peeling to the fixpoint (round-14; the
    * r13 version re-aggregated the FULL alive set every round, a CPU
    * factor the 1M→2M doubling flagged at 2.8×). Round t's semantics are
    * unchanged — keep the nodes with >= k neighbors inside round t-1's
    * survivor set — but the degrees are MAINTAINED, not recomputed:
    * deg_t(v) = deg_{t-1}(v) − |N(v) ∩ removed_{t-1}|, so each round
    * touches only the edges incident to the nodes peeled LAST round
    * (shrinking fast to nothing) instead of every edge of the alive set.
    * The set shrinks monotonically, so a peeled node can never
    * re-qualify (its alive-degree only decreases); decrement rows landing
    * on already-dead nodes are dropped by the alive-side join.
    * Convergence is detected by the removal set becoming empty.
    *
    * Scale shape: one shuffle per iteration (edges equi-joined against
    * the |removed|-bounded id set — broadcastable once the peel
    * localizes — then a map-side-combined count merged into the alive
    * frame); the symmetrized edge list is pinned once and re-read;
    * superseded per-round checkpoints are unpersisted as soon as their
    * successor is materialized, so the block store holds ≤ 2 round
    * frames however deep the peel. Iteration count is the peel depth,
    * not the node count — bounded by the longest degeneracy chain, and
    * HARD-CAPPED at [[KCoreMaxIters]] with a loud error (the oracle
    * replays exactly that many synchronous rounds, so an unconverged
    * graph must fail, not silently diverge). Near-dup graphs peel in a
    * handful of rounds; a 100 TB adversarial path graph would switch to
    * the same loop with checkpoint-every-8.
    *
    * @param pairs undirected (id_a, id_b); nulls/self-loops dropped,
    *              duplicate pairs collapse
    * @return (id, core_degree) — the surviving nodes with their degree
    *         INSIDE the core, ordered by id; empty when the k-core is
    *         empty (the peel removed every node before stabilizing) */
  def kCore(pairs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1, got $k")
    val sym = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
      .transform(graft.operators.Pin.lazyPin)
    // one checkpointed (id, core_degree) frame per round, holding BOTH
    // the survivors (deg >= k) and this round's removals (deg < k) —
    // round 1 = full degrees of every endpoint
    var degCk = sym.groupBy(col("src")).agg(count(lit(1)).as("core_degree"))
      .select(col("src").as("id"), col("core_degree"))
      .transform(graft.operators.Pin.lazyPin)
    var cur = degCk.filter(col("core_degree") >= k.toLong)
    var removed = degCk.filter(col("core_degree") < k.toLong).select(col("id"))
    var nRemoved = removed.count() // materializes degCk
    var iters = 1
    while (nRemoved > 0) {
      if (iters > KCoreMaxIters)
        throw new IllegalStateException(
          s"kCore: no fixpoint after $KCoreMaxIters peel rounds (pathological graph; " +
            "raise the cap in lockstep with the oracle's round count)")
      // decrement = per alive node, how many of its neighbors were
      // peeled LAST round; edges whose src is itself dead fall out of
      // the left join below
      val dec = sym.join(removed.select(col("id").as("dst")), Seq("dst"))
        .groupBy(col("src")).agg(count(lit(1)).as("_dec"))
        .select(col("src").as("id"), col("_dec"))
      val newDeg = cur.join(dec, Seq("id"), "left")
        .select(col("id"),
          (col("core_degree") - coalesce(col("_dec"), lit(0L))).as("core_degree"))
        .transform(graft.operators.Pin.lazyPin)
      val newCur = newDeg.filter(col("core_degree") >= k.toLong)
      val newRemoved = newDeg.filter(col("core_degree") < k.toLong).select(col("id"))
      nRemoved = newRemoved.count() // materializes newDeg BEFORE the old blocks go
      degCk.unpersist()
      degCk = newDeg; cur = newCur; removed = newRemoved
      iters += 1
    }
    cur.orderBy(col("id"))
  }

  /** Peel-round cap for [[kCore]] — matched by the oracle's synchronous
    * round count; exceeding it is a loud error, never a silent drift. */
  val KCoreMaxIters: Int = 64
}
