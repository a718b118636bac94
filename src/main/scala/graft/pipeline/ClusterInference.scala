package graft.pipeline

import graft.functions.UsiFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The `perform-inference` command: cluster-consensus PSM rescoring
  * (SURVEY.md §3.2; InferenceService.performProteinInference:85-279).
  *
  * Input contract: the i-th spectrum of the validated archive-spectrum
  * table corresponds to MaraCluster's spectrum index i (positional
  * contract J4 — the caller must supply the explicit `index` column that
  * was carried through the MGF writer, never a post-hoc
  * `monotonically_increasing_id`, SURVEY §7.4 item 4).
  *
  * Cluster semantics (clean re-derivation; the reference's
  * integer-division ratio bug at InferenceService.java:126 makes its
  * ratio 0 or 1 — `legacyRatio = true` reproduces that):
  *  - A10: group members by cluster id;
  *  - A11: drop clusters with >1 distinct isobaric (L->I) sequence, and
  *    clusters where no peptidoform reaches ratio > 0.5 of members;
  *  - A12: the representative is the best-scoring (lowest q) PSM of the
  *    dominant peptidoform, ties broken by usi.
  */
object ClusterInference {

  final case class ClusterOutputs(
      /** Surviving representative PSMs (one per kept cluster). */
      representatives: DataFrame,
      /** Clusters removed by the purity filters, with reason. */
      removed: DataFrame,
  )

  /** @param spectra  archive-spectrum rows with (index, usi,
    *                 peptideSequence, peptidoform, isDecoy, score)
    * @param clusters MaraCluster rows (SideInputs.readMaraCluster shape)
    * @param legacyRatio reproduce the integer-division purity-ratio bug
    * @param legacyFirstSeen A12 reference semantics: the representative's
    *                 peptidoform is the FIRST one encountered in file
    *                 order, and only ties within that form take the lower
    *                 score (InferenceService.java:134-140; SURVEY §7.4
    *                 item 5). Clean default: dominant form, best score.
    */
  def run(
      spectra: DataFrame,
      clusters: DataFrame,
      legacyRatio: Boolean = false,
      legacyFirstSeen: Boolean = false,
      requireFullCoverage: Boolean = true,
  ): ClusterOutputs = {
    // Referential integrity first: a cluster member whose spectrumIndex
    // has no spectrum row would silently vanish from the inner join,
    // computing purity over PARTIAL membership (the stale-TSV failure the
    // sidecar path documents as must-fail-loudly). Bounded probe: one
    // limit(1) anti-join job.
    if (requireFullCoverage) {
      val orphan = clusters.select(col("spectrumIndex").as("index"))
        .join(spectra.select(col("index")), Seq("index"), "left_anti")
        .limit(1).collect()
      require(orphan.isEmpty,
        s"ClusterInference: cluster member spectrumIndex=${orphan.headOption.map(_.get(0))} " +
          "has no spectrum row — stale cluster input? (pass requireFullCoverage=false to " +
          "accept partial membership)")
    }
    // J4 — positional join. Members with a NULL peptide sequence carry no
    // identification evidence (same null rule as the dedup/FDR family):
    // unfiltered they would be invisible to the nIso purity set
    // (collect_set drops nulls) yet still count toward `total`, and a
    // null-form group could even emit a null-sequence representative.
    val members = spectra.join(
      clusters.select(col("spectrumIndex").as("index"), col("clusterId")),
      Seq("index"), "inner")
      .filter(col("peptideSequence").isNotNull && col("peptidoform").isNotNull)
      .withColumn("isoSeq", UsiFunctions.isobaric(col("peptideSequence")))

    val wCluster = Window.partitionBy(col("clusterId"))

    // A11 — purity stats per cluster.
    val formCounts = members
      .withColumn("nIso", size(collect_set(col("isoSeq")).over(wCluster)))
      .withColumn("total", count(lit(1)).over(wCluster))
      .withColumn("formCount",
        count(lit(1)).over(Window.partitionBy(col("clusterId"), col("peptidoform"))))

    val ratio =
      if (legacyRatio)
        // Math.round(count/size * 100) / 100 with INTEGER division
        // (InferenceService.java:126): 0.0 unless the form is 100%.
        (col("formCount").cast("double") / col("total")).cast("long").cast("double")
      else col("formCount").cast("double") / col("total")

    // Lazily pinned: both outputs (representatives AND removed) read this
    // frame — unpinned, a consumer of both re-runs the members join and
    // every window pass twice.
    val withRatio = formCounts.withColumn("ratio", ratio)
      .withColumn("maxRatio", max(col("ratio")).over(wCluster))
      .transform(graft.operators.Pin.lazyPin)

    val impure = col("nIso") > 1 || col("maxRatio") <= 0.5
    val removed = withRatio.filter(impure)
      .select(col("clusterId"),
        when(col("nIso") > 1, "multiple_isobaric_sequences")
          .otherwise("no_majority_peptidoform").as("reason"))
      .distinct()

    // A12 — representative selection. Scores order asc_nulls_last: a PSM
    // whose score failed to parse (null) must never beat a real score as
    // "best"; ties resolve on file order (index), the reference's
    // strict-< keep-first rule — usi order need not match index order.
    val wBest =
      if (legacyFirstSeen) {
        // first-seen form wins: members of the form at the lowest index
        // rank first, then lower score within that form.
        Window.partitionBy(col("clusterId"))
          .orderBy(col("firstSeenIndex").asc, col("score").asc_nulls_last, col("index").asc)
      } else
        Window.partitionBy(col("clusterId"))
          .orderBy(col("ratio").desc, col("peptidoform").asc,
            col("score").asc_nulls_last, col("index").asc)
    val withFirstSeen =
      if (legacyFirstSeen)
        // First-seen FORM identity is isobaric (the reference compares
        // PeptidoformClustered with L->I equality, InferenceService
        // .java:134-140) — grouping by raw peptidoform would give an
        // L/I-variant form its own first-seen index and pick the wrong
        // representative.
        withRatio.withColumn("firstSeenIndex",
          min(col("index")).over(Window.partitionBy(col("clusterId"),
            UsiFunctions.isobaric(col("peptidoform")))))
      else withRatio
    val representatives = withFirstSeen
      .filter(!impure)
      .withColumn("_rn", row_number().over(wBest))
      .filter(col("_rn") === 1)
      .drop("_rn", "nIso", "total", "formCount", "ratio", "maxRatio", "isoSeq", "firstSeenIndex")

    ClusterOutputs(representatives, removed)
  }
}
