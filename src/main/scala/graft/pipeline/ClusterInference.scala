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
  ): ClusterOutputs = {
    // J4 — positional join.
    val members = spectra.join(
      clusters.select(col("spectrumIndex").as("index"), col("clusterId")),
      Seq("index"), "inner")
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

    val withRatio = formCounts.withColumn("ratio", ratio)
      .withColumn("maxRatio", max(col("ratio")).over(wCluster))

    val impure = col("nIso") > 1 || col("maxRatio") <= 0.5
    val removed = withRatio.filter(impure)
      .select(col("clusterId"),
        when(col("nIso") > 1, "multiple_isobaric_sequences")
          .otherwise("no_majority_peptidoform").as("reason"))
      .distinct()

    // A12 — representative selection.
    val wBest =
      if (legacyFirstSeen) {
        // first-seen form wins: members of the form at the lowest index
        // rank first, then lower score within that form.
        Window.partitionBy(col("clusterId"))
          .orderBy(col("firstSeenIndex").asc, col("score").asc, col("usi").asc)
      } else
        Window.partitionBy(col("clusterId"))
          .orderBy(col("ratio").desc, col("peptidoform").asc, col("score").asc, col("usi").asc)
    val withFirstSeen =
      if (legacyFirstSeen)
        withRatio.withColumn("firstSeenIndex",
          min(col("index")).over(Window.partitionBy(col("clusterId"), col("peptidoform"))))
      else withRatio
    val representatives = withFirstSeen
      .filter(!impure)
      .withColumn("_rn", row_number().over(wBest))
      .filter(col("_rn") === 1)
      .drop("_rn", "nIso", "total", "formCount", "ratio", "maxRatio", "isoSeq", "firstSeenIndex")

    ClusterOutputs(representatives, removed)
  }
}
