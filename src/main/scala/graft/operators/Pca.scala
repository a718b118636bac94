package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-integer distributed PCA sketch over an embedding column: the
  * TRAINED counterpart of the train-free Johnson–Lindenstrauss projection
  * ([[graft.functions.VectorFunctions.randomProjection]]) — one
  * distributed pass builds the (centered, n-scaled) scatter matrix, a
  * driver-side fixed-point power iteration extracts the principal
  * direction, and the corpus projects onto it with pure integer
  * arithmetic. The OPQ/whitening prep step of an ANN pipeline, and the
  * "rank my corpus along its dominant axis of variation" probe.
  *
  * Why fixed-point everywhere (the [[Graph.pageRankFixedPoint]]
  * discipline): float matvecs sum in shuffle/loop order and eigenvector
  * extraction is iterative, so doubles would drift across engines. Here
  *  - embeddings micro-quantize to MILLI units (floor(x·1e3), one IEEE
  *    multiply + floor — bit-identical everywhere),
  *  - the scatter uses the n-scaled centering identity
  *      S_ij = n·Σ q_i q_j − (Σ q_i)(Σ q_j)
  *    (same eigenvectors as the covariance, no rational division),
  *    with products and the scatter itself carried in DECIMAL(38,0)
  *    end-to-end — |S| ≤ 2·(n·qmax)² needs ≤ 38 digits up to n ≈ 10¹⁶
  *    rows at qmax ≈ 1e3, so the operator COMPUTES at the 100 TB design
  *    point instead of refusing (the r13 BIGINT landing guard tripped
  *    at n ≈ 2·10⁶),
  *  - the power iteration renormalizes by max|component| (no sqrt): all
  *    BigInt driver-side, truncating division, replayed exactly by the
  *    oracle's HUGEINT CTE chain,
  *  - projections are Σ q_i·v_i BIGINT folds (order-free).
  *
  * Scale shape: the scatter is ONE map-side-combined aggregation with
  * dim·(dim+1)/2 keys (the per-row pair explode combines locally — no
  * self-join, no corpus shuffle); the power iteration runs on the
  * collected dim×dim integer matrix (driver-bounded: 64×64 here); the
  * projection is a zero-shuffle fold against the literal eigenvector.
  * The iteration count is FIXED (not run to convergence) — the contract
  * is "t synchronous power steps from the all-ones start", deterministic
  * and oracle-replayable; on a spectrum with close top eigenvalues the
  * result is the t-step Krylov direction, which is exactly what ships. */
object Pca {

  /** Embedding quantization scale: milli-units. */
  val QuantScale: Double = 1000.0

  /** Fixed-point eigenvector scale: max|component| = 1e6 after each step. */
  val VecScale: Long = 1000000L

  /** floor(x·1e3) per element, BIGINT. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(QuantScale)).cast("long"))

  /** Upper triangle (i ≤ j, 0-based) of the n-scaled centered scatter
    * S_ij = n·Σ q_i q_j − (Σ q_i)(Σ q_j) as exact DECIMAL(38,0)s
    * (round-14: carried wide end-to-end, no BIGINT landing — see
    * [[scatterFromStats]]).
    *
    * Rows with a NULL embedding or a length ≠ dim are excluded (a
    * ragged vector has no row in the Gram). One explode to per-row
    * (i, j, q_i·q_j) triples (dim·(dim+1)/2 per row, map-side combined)
    * + one to per-component sums; the |keys| ≤ dim² result never
    * exceeds a broadcastable frame.
    *
    * @return (i, j, s) ordered by (i, j) */
  def scaledScatter(df: DataFrame, vec: Column, dim: Int): DataFrame =
    // n rides the component-sum aggregation (count per component = row
    // count, identical for every i), so the corpus scans TWICE (pairs +
    // component sums), never a third time for the count — plan-audited.
    scatterFromStats(scatterStats(df, vec, dim))

  /** The scatter's SUFFICIENT STATISTICS — (i, j, Σ q_i q_j) pairs plus
    * (i, Σ q_i, n) components, both DECIMAL(38,0)-exact. These are
    * ADDITIVE (unlike the centered scatter itself: S = n·P − m·mᵀ mixes
    * batches non-linearly), which is what makes the trained axis
    * INCREMENTALLY maintainable: persist the stats, and tonight's crawl
    * contributes one bounded merge (elementwise sums over ≤ dim² rows)
    * instead of a rescan of history — the [[graft.operators.Incremental]]
    * discipline applied to PCA. Compose with [[mergeStats]] and
    * [[scatterFromStats]]. */
  def scatterStats(df: DataFrame, vec: Column, dim: Int): (DataFrame, DataFrame) = {
    require(dim >= 1 && dim <= 512, s"scatterStats: dim must be in [1, 512], got $dim")
    val q = df
      .select(quantize(vec).as("_qv"))
      .filter(col("_qv").isNotNull && size(col("_qv")) === dim)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val pairsArr = flatten(transform(col("_qv"), (qi, i) =>
      transform(slice(col("_qv"), i + lit(1), lit(dim)), (qj, k) =>
        struct(i.as("i"), (i + k).as("j"), (qi * qj).as("p")))))
    val pairs = q.select(explode(pairsArr).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.p").as("p"))
      .groupBy(col("i"), col("j"))
      .agg(sum(dec(col("p"))).as("_pp"))
    val comps = q.select(posexplode(col("_qv")).as(Seq("i", "q")))
      .groupBy(col("i")).agg(sum(dec(col("q"))).as("_m"), count(lit(1)).as("_cnt"))
    (pairs, comps)
  }

  /** Elementwise sum of two stats sets — the incremental-merge step
    * (dim²-bounded frames; exact DECIMAL adds, order-free). */
  def mergeStats(
      a: (DataFrame, DataFrame), b: (DataFrame, DataFrame)): (DataFrame, DataFrame) = {
    val pairs = a._1.unionByName(b._1)
      .groupBy(col("i"), col("j")).agg(sum(col("_pp")).as("_pp"))
    val comps = a._2.unionByName(b._2)
      .groupBy(col("i")).agg(sum(col("_m")).as("_m"), sum(col("_cnt")).as("_cnt"))
    (pairs, comps)
  }

  /** The [[scaledScatter]] output computed FROM persisted/merged stats —
    * value-identical to the direct pass by construction (same integers),
    * which is what lets the incremental path share the direct path's
    * oracle. `s` stays DECIMAL(38,0) END-TO-END (round-14; the r13
    * version landed in BIGINT behind a raise_error guard, which at
    * qmax ≈ 1e3 REFUSED past n ≈ 2·10⁶ rows — a real ceiling at the
    * 100 TB design point). |S| ≤ 2·(n·qmax)² needs ≤ 38 digits up to
    * n ≈ 10¹⁶ rows at qmax ≈ 1e3, and the driver power iteration ingests
    * BigInt, so nothing downstream needed the narrow landing. Callers
    * that want BIGINT output re-impose their own guarded cast. */
  def scatterFromStats(stats: (DataFrame, DataFrame)): DataFrame = {
    val (pairs, comps) = stats
    val m = comps.transform(graft.operators.Pin.lazyPin)
    val n1 = m.agg(coalesce(max(col("_cnt")), lit(0L)).as("_n"))
    val sDec = col("_n").cast("decimal(38,0)") * col("_pp") - col("_mi") * col("_mj")
    pairs
      .join(m.select(col("i"), col("_m").as("_mi")), Seq("i"))
      .join(m.select(col("i").as("j"), col("_m").as("_mj")), Seq("j"))
      .crossJoin(broadcast(n1))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        sDec.as("s"))
      .orderBy(col("i"), col("j"))
  }

  /** Collect a [[scaledScatter]]/[[scatterFromStats]] triangle (≤
    * dim·(dim+1)/2 rows — driver-bounded by construction) and mirror it
    * into the full dim×dim BigInt matrix the power iteration consumes.
    * DECIMAL(38,0) entries ingest losslessly via the unscaled
    * BigInteger. */
  def collectScatter(triangle: DataFrame, dim: Int): Array[Array[BigInt]] =
    fullScatter(
      triangle.collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt,
        BigInt(r.getDecimal(2).toBigInteger))).toSeq,
      dim)

  /** Mirror the collected upper triangle into a full dim×dim BigInt
    * matrix (driver-side; the triangle is ≤ dim·(dim+1)/2 rows). */
  def fullScatter(triangle: Seq[(Int, Int, BigInt)], dim: Int): Array[Array[BigInt]] = {
    val s = Array.fill(dim, dim)(BigInt(0))
    triangle.foreach { case (i, j, v) => s(i)(j) = v; s(j)(i) = v }
    s
  }

  /** `iters` synchronous power steps from the all-ones start, max-norm
    * renormalized to [[VecScale]] fixed-point units after each step —
    * truncating (toward-zero) division, exactly the oracle's
    * sign-split HUGEINT `//`. Returns the direction in 1e6 units. */
  def principalDirectionFixedPoint(
      scatter: Array[Array[BigInt]], iters: Int): Array[Long] = {
    require(iters >= 1 && iters <= 16,
      s"principalDirectionFixedPoint: iters must be in [1, 16], got $iters")
    val dim = scatter.length
    var v = Array.fill(dim)(BigInt(VecScale))
    for (_ <- 0 until iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(BigInt(0))((acc, j) => acc + scatter(i)(j) * v(j)))
      val mx = w.map(_.abs).max.max(BigInt(1))
      v = w.map(x => x * VecScale / mx) // BigInt / truncates toward zero
    }
    v.map(_.toLong)
  }

  /** Exact-integer projection score_fp = Σ q_i·v_i per row against the
    * LITERAL fixed-point direction — a zero-shuffle fold (BIGINT terms
    * ≤ dim·qmax·1e6; order-free because integers are associative).
    * Rows excluded from the scatter (null/ragged) are excluded here too.
    *
    * @return (id, score_fp) ordered by id */
  def projectPrincipal(
      df: DataFrame, id: Column, vec: Column, direction: Array[Long]): DataFrame = {
    val q = quantize(vec)
    df
      .select(id.as("id"), q.as("_qv"))
      .filter(col("_qv").isNotNull && size(col("_qv")) === direction.length)
      .select(col("id"),
        aggregate(zip_with(col("_qv"), typedLit(direction.toSeq), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("score_fp"))
      .orderBy(col("id"))
  }
}
