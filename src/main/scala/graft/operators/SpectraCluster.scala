package graft.operators

import graft.functions.BinPeaksExpr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Native LSH-style spectra clustering — the Spark-first replacement for
  * the one pipeline step the reference delegates to an external tool
  * (MaraCluster, `submissions.nf:245-269`; its IO contract — K3 MGF out,
  * S6 TSV in, J4 positional join — is already implemented in
  * [[graft.io.MgfIO]]/[[graft.io.SideInputs]]/
  * [[graft.pipeline.ClusterInference]]). SURVEY §7.5 flags this operator
  * as the optional scale extension; with it the engine runs the full
  * cluster-inference path standalone.
  *
  * Algorithm (the falcon/MaraCluster family shape, re-expressed as
  * Spark relational ops — no all-pairs stage anywhere):
  *  1. each spectrum's peaks are binned by fragment m/z and the topK
  *     strongest bins kept ([[BinPeaksExpr]], one codegen pass per row);
  *  2. candidate pairs come from an equi-join on the composite key
  *     (precursorCharge, precursor bucket, candidate bin): a pair is
  *     probed only if both spectra put one of their `candidateBins`
  *     strongest bins on the same key — an inverted-index join like the
  *     n-gram posting join in [[Dedup.ngramJaccardPairs]], never O(n²);
  *  3. the exact gates then run per candidate: |Δ precursor m/z| <=
  *     precursorTol (same charge), and binned-vector cosine >= minCosine
  *     (numerator folded over the min-specId side's bin array against the
  *     other side's bin map — deterministic; norms from exact
  *     per-spectrum sums);
  *  4. edges feed [[Dedup.connectedComponents]] (large-star/small-star,
  *     O(log n) rounds, driver union-find tail on broadcast-scale edge
  *     sets); every input spectrum gets a label, singletons label
  *     themselves — clusterId = min specId of the component, the same
  *     contract as the dedup components.
  *
  * Precursor bucketing: bucket = floor(pmz / precursorTol); the probe
  * side emits {bucket, bucket+1} and pairs are canonicalised after the
  * join, so any pair within tol lands on a shared key (floors of values
  * <= tol apart differ by at most 1; a pair whose gap is within 1 ulp of
  * tol AND straddles two bucket boundaries may be missed — the bucket
  * stage is the candidate generator, the exact tol filter is authoritative
  * for everything it sees).
  *
  * 100 TB shape: binning is a zero-shuffle projection; the candidate join
  * shuffles on the composite key whose cardinality grows with the corpus
  * (charge x pmz-bucket x bin), so buckets stay small; `maxCandidateKeyDf`
  * drops degenerate hot keys (a contaminant bin shared by a whole
  * precursor bucket) the same way the n-gram posting join caps document
  * frequency — a bounded-recall skew guard, logged via the returned
  * diagnostics, never an OOM.
  */
object SpectraCluster {

  /** @param binWidth        fragment bin width in Da (1.0005 ~ the
    *                        standard peptide-fragment spacing)
    * @param topPeaks        bins kept per spectrum after binning
    * @param candidateBins   strongest bins used as inverted-index keys
    *                        (<= topPeaks)
    * @param precursorTol    max |Δ precursor m/z| within a pair, Da
    * @param minCosine       edge threshold on binned-vector cosine
    * @param maxCandidateKeyDf drop candidate keys indexed by more than
    *                        this many spectra (0 = disabled) */
  final case class Config(
      binWidth: Double = 1.0005,
      topPeaks: Int = 50,
      candidateBins: Int = 8,
      precursorTol: Double = 0.05,
      minCosine: Double = 0.7,
      maxCandidateKeyDf: Long = 100000L,
  ) {
    require(binWidth > 0 && java.lang.Double.isFinite(binWidth), "binWidth must be finite positive")
    require(topPeaks > 0, "topPeaks must be positive")
    require(candidateBins > 0 && candidateBins <= topPeaks,
      "candidateBins must be in [1, topPeaks]")
    require(precursorTol > 0 && java.lang.Double.isFinite(precursorTol),
      "precursorTol must be finite positive")
    require(maxCandidateKeyDf >= 0, "maxCandidateKeyDf must be >= 0")
    // NaN would make `cosine >= minCosine` never true — every spectrum a
    // silent singleton instead of a loud error
    require(minCosine >= -1.0 && minCosine <= 1.0,
      "minCosine must be in [-1, 1] (and not NaN)")
  }

  /** Input contract: (specId: long — unique, precursorMz: double,
    * precursorCharge: int, masses: array<double>, intensities:
    * array<double>). Returns (specId, clusterId) covering EVERY input
    * row — spectra with no parseable peaks cluster as singletons. */
  def clusterSpectra(spectra: DataFrame, cfg: Config = Config()): DataFrame = {
    val allIds = spectra.select(col("specId"))
    val edges = similarityEdges(spectra, cfg).select(col("id_a"), col("id_b"))
    val comp = Dedup.connectedComponents(edges)
    allIds
      .join(comp.withColumnRenamed("id", "specId"), Seq("specId"), "left")
      .select(col("specId"), coalesce(col("component"), col("specId")).as("clusterId"))
  }

  /** The scored edge list (id_a < id_b, cosine >= minCosine) — exposed for
    * tests and for callers that want the similarity graph itself. */
  def similarityEdges(spectra: DataFrame, cfg: Config = Config()): DataFrame = {
    val prepared = prepare(spectra, cfg)
      // Pinned once: the binning projection feeds both join sides, both
      // score joins, and the norm lookups. LAZY (same as the
      // minHashLshPairs pin): materialized by the first real action, so
      // building the frame for a plan dump or schema check costs nothing.
      .transform(graft.operators.Pin.lazyPin)

    // Candidate keys: the candidateBins strongest bins by (w desc, bin
    // asc) — the kernel's own topK order. r15: one native selection pass
    // (TopBinsExpr) instead of the interpreted array_sort lambda
    // comparator + transform + slice chain (CodegenFallback, per-element
    // lambda dispatch); same bins, same emit order.
    val withCand = prepared.withColumn(
      "candBin",
      explode(graft.functions.BinVectorExprs.topBinsCol(
        prepared.sparkSession, col("binned"), cfg.candidateBins)))

    // Probe side doubles into the next bucket; canonicalisation after the
    // join makes the {bucket, bucket+1} emit direction-symmetric.
    val probe = withCand
      .withColumn("jb", explode(array(col("bucket"), col("bucket") + 1)))
      .select(col("specId"), col("charge"), col("pmz"), col("jb"), col("candBin"))
    val index = withCand
      .select(col("specId"), col("charge"), col("pmz"),
        col("bucket").as("jb"), col("candBin"))

    val indexGuarded =
      if (cfg.maxCandidateKeyDf <= 0) index
      else {
        val hot = index.groupBy(col("charge"), col("jb"), col("candBin"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > cfg.maxCandidateKeyDf)
          .select(col("charge"), col("jb"), col("candBin"))
        // The hot-key set is tiny by construction (keys over the cap);
        // dropping its INDEX postings suppresses every pair through the
        // key (the probe side stays unguarded — see below).
        index.join(broadcast(hot), Seq("charge", "jb", "candBin"), "left_anti")
      }
    // The probe side needs no guard: every candidate pair joins one probe
    // row to one INDEX row on the key, so dropping a hot key's index
    // postings suppresses all pairs through it.
    val pairs = probe.alias("a")
      .join(indexGuarded.alias("b"),
        col("a.charge") === col("b.charge") &&
          col("a.jb") === col("b.jb") &&
          col("a.candBin") === col("b.candBin") &&
          col("a.specId") =!= col("b.specId") &&
          abs(col("a.pmz") - col("b.pmz")) <= lit(cfg.precursorTol))
      .select(
        least(col("a.specId"), col("b.specId")).as("id_a"),
        greatest(col("a.specId"), col("b.specId")).as("id_b"))
      .distinct()

    val aSide = prepared.select(
      col("specId").as("id_a"), col("binned").as("ba"), col("norm").as("na"))
    val bSide = prepared.select(
      col("specId").as("id_b"), col("binned").as("bb"), col("norm").as("nb"))

    // r15: the per-pair dot was an interpreted `aggregate` fold probing a
    // per-pair `map_from_entries` rebuild; SortedBinDotExpr merges the two
    // bin-sorted arrays in one codegen pass. Bit-parity with the fold:
    // same bin-asc visit order, and the old form's `+ w * 0.0` for
    // missing bins is an fp identity on these non-negative sums (see the
    // kernel scaladoc).
    pairs
      .join(aSide, Seq("id_a"))
      .join(bSide, Seq("id_b"))
      .withColumn("dot", graft.functions.BinVectorExprs.binDotCol(
        prepared.sparkSession, col("ba"), col("bb")))
      .withColumn("cosine", col("dot") / (col("na") * col("nb")))
      .filter(col("cosine") >= cfg.minCosine)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Binned projection: (specId, charge, pmz, bucket, binned, norm).
    * Zero-shuffle; rows whose spectra produce no usable bins are dropped
    * here (they re-enter as singletons in [[clusterSpectra]]). */
  private def prepare(spectra: DataFrame, cfg: Config): DataFrame =
    spectra
      .select(
        col("specId"),
        col("precursorCharge").as("charge"),
        col("precursorMz").as("pmz"),
        BinPeaksExpr.binPeaksCol(
          spectra.sparkSession, col("masses"), col("intensities"),
          cfg.binWidth, cfg.topPeaks).as("binned"))
      // non-finite pmz must drop here too: floor(Infinity/tol) narrows to
      // Long.MaxValue (floor is not a Cast, so no ANSI range check) and
      // the probe side's bucket + 1 then dies with ARITHMETIC_OVERFLOW
      // under ANSI — one corrupt spectrum would kill the whole clustering
      // job (verified against Spark 4.1)
      .filter(col("binned").isNotNull && size(col("binned")) > 0 &&
        col("pmz").isNotNull && !isnan(col("pmz")) &&
        abs(col("pmz")) < lit(Double.MaxValue) && col("charge").isNotNull)
      // r15: squared-norm via the merge-dot kernel applied to itself —
      // same fold order (bin asc) as the old `aggregate` HOF, one codegen
      // pass instead of interpreted lambda dispatch per element
      .withColumn("norm",
        sqrt(graft.functions.BinVectorExprs.binDotCol(
          spectra.sparkSession, col("binned"), col("binned"))))
      .filter(col("norm") > 0)
      .withColumn("bucket", floor(col("pmz") / lit(cfg.precursorTol)))

  /** Re-shape cluster assignments to the MaraCluster TSV row shape
    * ([[graft.io.SideInputs.maraClusterSchema]]) so the native clusterer
    * drops into [[graft.pipeline.ClusterInference]] unchanged: the caller
    * supplies the same (file, spectrumIndex, specId) mapping it used to
    * build the cluster input (J4 positional contract — an explicit index
    * column, never a post-hoc row number). */
  def asMaraClusterRows(mapping: DataFrame, assignments: DataFrame): DataFrame =
    mapping
      .select(col("file"), col("spectrumIndex"), col("specId"))
      .join(assignments, Seq("specId"))
      .select(col("file"), col("spectrumIndex"), col("clusterId"))
}
