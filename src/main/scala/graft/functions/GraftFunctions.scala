package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call registration of every native function on a SPECIFIC session.
  *
  * The lazy column-API registrations key off the thread-local active
  * session; a DataFrame owned by a different session (`newSession()`
  * isolates the function registry) would analyze against a registry the
  * build-time hook never touched. Operators therefore call this with
  * `df.sparkSession` at entry — idempotent and memoized, so it costs a
  * map lookup after the first call. */
object GraftFunctions {

  def ensureRegistered(spark: SparkSession): Unit = {
    VectorExprs.register(spark)
    WordShinglesExpr.register(spark)
    GramOverlapExpr.register(spark)
    WordGramsExpr.register(spark)
    NfcNormalizeExpr.register(spark)
    ArgMinCellExpr.register(spark)
    EncodePeptidoformExpr.register(spark)
    ModsToStructsExpr.register(spark)
    ResidueMassExpr.register(spark)
    QualityMetricsExpr.register(spark)
    KmvSketchAgg.register(spark)
    TopKByAgg.register(spark)
    CountMinAgg.register(spark)
    BinPeaksExpr.register(spark)
    BinVectorExprs.register(spark)
  }
}
