package graft

import graft.fdr.CombinedFdr
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
}
