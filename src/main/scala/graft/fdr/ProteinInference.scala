package graft.fdr

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Protein inference (SURVEY.md §2.4 A15, §7.4 hard part #1).
  *
  * The reference delegates Occam's-razor inference to the PIA library
  * (PIAModelerService.java:80-101: OccamsRazor inference + multiplicative
  * scoring). Re-derivation, Spark-first:
  *
  *  - the peptide<->protein bipartite graph is built with `groupBy` +
  *    `collect_set` (same-set proteins collapse on an identical sorted
  *    peptide-set signature — SURVEY §7.4: `groupBy(sort_array(collect_set))`);
  *  - subset elimination and the greedy minimal cover run per assay inside
  *    `flatMapGroups` on a `KeyValueGroupedDataset`: exact, imperative, and
  *    distributed ACROSS assays (the per-assay graph after aggregation is at
  *    most thousands of protein groups — bounded task memory), so the engine
  *    scales with the number of assays rather than serializing everything
  *    through the driver.
  */
object ProteinInference {

  // NOTE: these must stay public top-level-ish (not private) — Catalyst's
  // generated SafeProjection cannot access private case classes.
  /** One protein group after same-set collapse, with its inference verdict. */
  final case class ProteinGroupResult(
      assay: String,
      accession: String,
      anchorProtein: String,
      memberType: String, // "representative" | "sameset" | "subset"
      groupId: Int,
      numberPeptides: Int,
  )

  final case class PeptideSet(assay: String, proteins: Seq[String], peptides: Seq[String])

  /** Runs Occam's-razor inference.
    *
    * @param peptideProteins DataFrame with columns (`assay`, `peptide`,
    *                        `protein`) — one row per observed pair, duplicates
    *                        allowed.
    * @return one row per input protein with its group assignment.
    */
  def occamsRazor(peptideProteins: DataFrame): DataFrame = {
    val spark = peptideProteins.sparkSession
    import spark.implicits._

    // protein -> sorted distinct peptide set, then same-set collapse:
    // proteins with identical signatures form one group.
    // Null pairs carry no evidence and are dropped up front — without
    // this, collect_set (which skips nulls) can emit an EMPTY peptide or
    // protein set and greedyCover's representative pick (`proteins.head`,
    // subset-anchor `.head`) would crash the whole assay's inference.
    val signatures = peptideProteins
      .filter($"peptide".isNotNull && $"protein".isNotNull)
      .groupBy($"assay", $"protein")
      .agg(sort_array(collect_set($"peptide")).as("peptides"))
      .groupBy($"assay", $"peptides")
      .agg(sort_array(collect_set($"protein")).as("proteins"))
      .as[PeptideSet]

    signatures
      .groupByKey(_.assay)
      .flatMapGroups((assay, groups) => greedyCover(assay, groups.toSeq))
      .toDF()
  }

  /** Exact greedy set cover over one assay's collapsed protein groups.
    * Groups are reported in cover order; a group whose peptides are fully
    * covered by previously-reported groups is a "subset" member anchored to
    * the group that covered most of its peptides. Deterministic: ties break
    * on (peptide count desc, first accession asc). */
  private[fdr] def greedyCover(assay: String, groups: Seq[PeptideSet]): Iterator[ProteinGroupResult] = {
    val sorted = groups.sortBy(g => (-g.peptides.size, g.proteins.head))
    val covered = mutable.Set.empty[String]
    val results = mutable.ArrayBuffer.empty[ProteinGroupResult]
    var groupId = 0
    // Peptide -> the representative that first covered it (for subset anchors).
    val coveredBy = mutable.Map.empty[String, String]

    var remaining = sorted
    while (remaining.nonEmpty) {
      // Pick the group with most uncovered peptides (greedy step).
      val best = remaining.maxBy(g =>
        (g.peptides.count(p => !covered.contains(p)), g.proteins.head)
      )(Ordering.Tuple2(Ordering.Int, Ordering.String.reverse))
      val fresh = best.peptides.count(p => !covered.contains(p))
      if (fresh == 0) {
        // Everything left is a subset of already-reported groups.
        remaining.foreach { g =>
          val anchor = g.peptides
            .flatMap(coveredBy.get)
            .groupBy(identity)
            .map { case (a, hits) => (a, hits.size) }
            .toSeq
            .sortBy { case (a, n) => (-n, a) }
            .head._1
          g.proteins.foreach { p =>
            results += ProteinGroupResult(assay, p, anchor, "subset", groupId, g.peptides.size)
          }
          groupId += 1
        }
        remaining = Nil
      } else {
        val rep = best.proteins.head
        best.proteins.zipWithIndex.foreach { case (p, i) =>
          results += ProteinGroupResult(
            assay, p, rep, if (i == 0) "representative" else "sameset", groupId, best.peptides.size)
        }
        best.peptides.foreach { p =>
          if (!covered.contains(p)) { covered += p; coveredBy(p) = rep }
        }
        groupId += 1
        remaining = remaining.filterNot(_ eq best)
      }
    }
    results.iterator
  }

  /** A6 — protein inference confidence category: a protein is
    * "distinguishable" iff some peptide's protein list is exactly [it],
    * else "indistinguishable".
    * Reference: InferenceService.getInferenceCategories:52-61. */
  def inferenceCategories(peptideProteins: DataFrame): DataFrame = {
    // null pairs carry no evidence — same rule as occamsRazor: a null
    // peptide must not fabricate a "distinguishable" verdict, a null
    // protein must not appear as an output row
    val evidence = peptideProteins
      .filter(col("peptide").isNotNull && col("protein").isNotNull)
    val uniqueEvidence = evidence
      .groupBy(col("assay"), col("peptide"))
      .agg(collect_set(col("protein")).as("proteins"))
      .filter(size(col("proteins")) === 1)
      .select(col("assay"), explode(col("proteins")).as("protein"))
      .distinct()
      .withColumn("has_unique", lit(true))

    evidence
      .select(col("assay"), col("protein"))
      .distinct()
      .join(uniqueEvidence, Seq("assay", "protein"), "left")
      .select(
        col("assay"),
        col("protein"),
        when(col("has_unique"), lit("distinguishable"))
          .otherwise(lit("indistinguishable"))
          .as("category"),
      )
  }
}
