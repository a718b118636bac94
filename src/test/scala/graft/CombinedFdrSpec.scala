package graft

import graft.fdr.{CombinedFdr, TargetDecoy}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CombinedFdrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fdr_score interpolates between decoy steps, tie-free and monotone") {
    // best-first: T T D T T D -> q: [1/2*?..] compute: fdr 0,0,1/2,1/3,1/4,2/4
    // q (suffix min): 0,0,1/3,1/3,1/4->? recompute: fdr=[0,0,.5,1/3,.25,.5]
    // suffix mins: [0,0,.25,.25,.25,.5]
    val df = Seq(
      (1L, 60.0, false), (2L, 50.0, false), (3L, 40.0, true),
      (4L, 30.0, false), (5L, 20.0, false), (6L, 10.0, true),
    ).toDF("id", "score", "decoy")
    val got = CombinedFdr.withFdrScore(df, Seq.empty, col("score"), col("decoy"), col("id"))
      .orderBy(col("score").desc)
      .select(col("q_value"), col("fdr_score")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))

    val fdrScores = got.map(_._2)
    // strictly non-decreasing along worsening score and no duplicate values
    fdrScores.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    assert(fdrScores.distinct.length == fdrScores.length)
    // rows before the first decoy interpolate from (0,0) to the first step q
    val firstStepQ = got(2)._1
    assert(got(0)._2 > 0 && got(0)._2 < firstStepQ)
    assert(got(2)._2 == firstStepQ) // on-step row keeps the step q
  }

  test("golden worked example: every stage value hand-computed (Jones et al. shape)") {
    // Engine A best-first: T(10) D(8) T(6) D(4)
    //   fdr = [0, 1, 1/2, 1] ; q (suffix min) = [0, 1/2, 1/2, 1]
    //   FDR score (interpolate between decoy steps at rank 2 q=.5, rank 4 q=1):
    //     rank1: 0 + 1*(0.5)/2 = 0.25 ; rank2 (on step) = 0.5
    //     rank3: 0.5 + 1*(0.5)/2 = 0.75 ; rank4 (on step) = 1.0
    // Engine B best-first: T(9) D(3) -> q = [0, 1]; FDR score = [0.5, 1.0]
    val rows = Seq(
      ("A", "spec1", "P1", 10.0, false, "a1"),
      ("A", "spec2", "P2", 8.0, true, "a2"),
      ("A", "spec3", "P3", 6.0, false, "a3"),
      ("A", "spec4", "P4", 4.0, true, "a4"),
      ("B", "spec1", "P1", 9.0, false, "b1"),
      ("B", "spec5", "P5", 3.0, true, "b2"),
    ).toDF("engine", "spectrum", "peptide", "score", "decoy", "psmId")

    val stage1 = CombinedFdr.withFdrScore(
      rows.withColumn("_engine", col("engine")), Seq(col("_engine")),
      col("score"), col("decoy"), col("psmId"))
      .select(col("psmId"), col("fdr_score")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(stage1 == Map(
      "a1" -> 0.25, "a2" -> 0.5, "a3" -> 0.75, "a4" -> 1.0,
      "b1" -> 0.5, "b2" -> 1.0))

    // Stage 2: products — spec1 seen by both engines: 0.25 * 0.5 = 0.125;
    // per-engine-combination target-decoy calibration:
    //   group [A,B]: {spec1 T} -> q 0
    //   group [A]: asc by product: spec2 D (fdr 1), spec3 T (1/1), spec4 D (2/1)
    //              -> q = [1, 1, 2]
    //   group [B]: {spec5 D} -> q 1
    val out = CombinedFdr.combinedQValues(
      rows, col("engine"), Seq(col("spectrum"), col("peptide")),
      col("score"), col("decoy"), col("psmId")).collect()
      .map(r => r.getAs[String]("spectrum") ->
        (r.getAs[Double]("combined_fdr_score"), r.getAs[Double]("combined_q_value"))).toMap
    assert(out == Map(
      "spec1" -> (0.125, 0.0), "spec2" -> (0.5, 1.0), "spec3" -> (0.75, 1.0),
      "spec4" -> (1.0, 2.0), "spec5" -> (1.0, 1.0)))
  }

  test("combined q-values: multi-engine agreement outranks single-engine hits") {
    // engine A and B agree on spec1..4 (targets) and spec9 (decoy);
    // engine A alone sees spec5..8 (targets) + decoy spec10.
    val rows =
      (1 to 4).flatMap(i => Seq(
        ("A", s"spec$i", "PEP" + i, 100.0 - i, false, s"A$i"),
        ("B", s"spec$i", "PEP" + i, 90.0 - i, false, s"B$i"))) ++
        (5 to 8).map(i => ("A", s"spec$i", "PEP" + i, 80.0 - i, false, s"A$i")) ++
        Seq(("A", "spec9", "DEC9", 5.0, true, "A9"), ("B", "spec9", "DEC9", 4.0, true, "B9"),
          ("A", "spec10", "DEC10", 3.0, true, "A10"))
    val df = rows.toDF("engine", "spectrum", "peptide", "score", "decoy", "psmId")

    val out = CombinedFdr.combinedQValues(
      df, col("engine"), Seq(col("spectrum"), col("peptide")),
      col("score"), col("decoy"), col("psmId"))
    val rowsOut = out.collect()
    assert(rowsOut.length == 10) // one per identification

    val byKey = rowsOut.map(r => r.getAs[String]("spectrum") -> r).toMap
    // agreement group recorded
    assert(byKey("spec1").getAs[scala.collection.Seq[String]]("engines").toSeq == Seq("A", "B"))
    assert(byKey("spec5").getAs[scala.collection.Seq[String]]("engines").toSeq == Seq("A"))
    // product of two sub-1 scores < single score at comparable rank
    assert(byKey("spec1").getAs[Double]("combined_fdr_score") <
      byKey("spec5").getAs[Double]("combined_fdr_score"))
    // decoys carry their flag through the combination
    assert(byKey("spec9").getAs[Boolean]("is_decoy"))
    // within the two-engine group, targets get a better q than the decoy
    assert(byKey("spec1").getAs[Double]("combined_q_value") <=
      byKey("spec9").getAs[Double]("combined_q_value"))
  }

  test("protein stage scored off PSM FDR score (PIA parity flag) — pinned golden") {
    // PIAModelerService.java:80-101: MultiplicativeScoring over
    // PSM_LEVEL_FDR_SCORE, ONLY_BEST per peptide, protein FDR over that
    // score. Demo-assay FDR scores: PEPTIDEK 1/42, ELVISLIVESK 2/42,
    // AAAAKPEPR 3/42 — so sp|P1 = -log10(1/42)-log10(2/42) = 2.94547 and
    // sp|P2 = -log10(2/42)-log10(3/42) = 2.46835 (5 dp), where the
    // default q-basis run reports 3.55629 for BOTH (all accepted PSM
    // q-values tie at 0.016667).
    val out = graft.pipeline.DemoAssay.combinedFdrProteinIndex(spark)
      .proteinEvidence.orderBy(col("reportedAccession")).collect()
    val scores = out.map(r => r.getAs[String]("reportedAccession") ->
      r.getAs[Row]("bestSearchEngineScore").getAs[String]("value")).toMap
    assert(scores == Map("sp|P1" -> "2.94547", "sp|P2" -> "2.46835"))
    val props = out.head.getAs[scala.collection.Seq[Row]]("properties")
      .map(p => p.getAs[String]("name")).toSeq
    assert(props.contains("multiplicative protein score (-sum log10 FDRScore)"))

    // the default basis is untouched by the flag (its own pinned golden)
    val defaults = graft.pipeline.DemoAssay.runIndex(spark)
      .proteinEvidence.orderBy(col("reportedAccession")).collect()
      .map(r => r.getAs[String]("reportedAccession") ->
        r.getAs[Row]("bestSearchEngineScore").getAs[String]("value")).toMap
    assert(defaults == Map("sp|P1" -> "1.77814", "sp|P2" -> "1.77814"))
  }

  test("withFdrScoreFromCounts with groupCols matches per-group windowed withFdrScore") {
    import spark.implicits._
    // two groups whose cum_decoys values REPEAT across groups — without
    // the group-aware join the steps fan out and mix groups
    val df = Seq(
      ("e1", 1L, 10.0, false), ("e1", 2L, 9.0, true), ("e1", 3L, 8.0, false),
      ("e1", 4L, 7.0, true), ("e1", 5L, 6.0, false),
      ("e2", 6L, 10.0, false), ("e2", 7L, 9.5, true), ("e2", 8L, 9.0, true),
      ("e2", 9L, 8.0, false),
    ).toDF("g", "id", "score", "decoy")
    val windowed = CombinedFdr.withFdrScore(
      df, Seq(col("g")), col("score"), col("decoy"), col("id"))
      .orderBy(col("id")).select(col("id"), col("fdr_score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val counts = TargetDecoy.withQValues(
      df, Seq(col("g")), col("score"), col("decoy"), col("id"))
    val fromCounts = CombinedFdr.withFdrScoreFromCounts(counts, col("decoy"), Seq("g"))
      .orderBy(col("id")).select(col("id"), col("fdr_score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromCounts.size == windowed.size) // no fan-out
    windowed.zip(fromCounts).foreach { case ((ia, a), (ib, b)) =>
      assert(ia == ib && math.abs(a - b) < 1e-12, s"windowed=$windowed fromCounts=$fromCounts")
    }
  }
}
