package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Loader-robustness regression for the events table (round-6 lesson: the
  * driver regenerated testdata flipping `ts` from parquet TIMESTAMP(NANOS)
  * to plain TIMESTAMP micros, and the loader's hard-coded nanos workaround
  * crashed every events-table query). Both encodings ship as committed
  * fixtures; the loader must read either and produce identical values. */
class TablesLoaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture(name: String): String =
    getClass.getResource(s"/graft/$name").toString

  private def formatted(df: DataFrame): Seq[(Long, String)] =
    df.select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
      .orderBy(col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq

  test("micros-encoded events load without the legacy nanos conf") {
    // run BEFORE the nanos test can set nanosAsLong on the shared session
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val df = Tables.loadEvents(spark, fixture("events_ts_micros.parquet"))
    val t = df.schema("ts").dataType
    assert(t == TimestampType || t == TimestampNTZType, s"unexpected ts type $t")
    assert(df.count() == 20)
  }

  test("nanos-encoded events load via the legacy-long fallback") {
    val df = Tables.loadEvents(spark, fixture("events_ts_nanos.parquet"))
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() == 20)
  }

  test("native temp functions resolve on the nanos fallback's isolated session") {
    // the fallback frame is owned by a newSession() whose function
    // registry starts empty — loadEvents must pre-register the native
    // functions or any aggregate like topk_ids dies UNRESOLVED_ROUTINE
    val df = Tables.loadEvents(spark, fixture("events_ts_nanos.parquet"))
    val top = df.groupBy(col("event_id") % 2)
      .agg(graft.functions.TopKByAgg
        .topKIds(df.sparkSession, col("event_id").cast("double"), col("event_id"), 2).as("t"))
    assert(top.select(explode(col("t"))).count() == 4)
    val sk = graft.operators.Sketches.kmvDistinctByGroup(
      df, Seq(lit(1)), col("event_id"), 8)
    assert(sk.collect().head.getAs[Long]("n_kmv") == 8L)
  }

  test("both encodings yield identical timestamp values") {
    val us = formatted(Tables.loadEvents(spark, fixture("events_ts_micros.parquet")))
    val ns = formatted(Tables.loadEvents(spark, fixture("events_ts_nanos.parquet")))
    assert(us == ns)
    // spot-check an absolute value so both being wrong the same way fails
    assert(us.head == (0L, "2025-03-01 12:00:00.000000"))
  }

  // --- generalized drift tolerance (round-7: the r5→r6 nanos flip was
  // only patched for events.ts; any fact-table column type can flip) ---

  /** Stage a fixture under the `$dir/$name.parquet` layout Tables expects. */
  private def staged(fixture: String, table: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("tables_drift").toString
    val src = java.nio.file.Paths.get(
      new java.net.URI(getClass.getResource(s"/graft/$fixture").toString))
    java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$dir/$table.parquet"))
    dir
  }

  test("documents with narrowed int32 ids/n_chars conform to the canonical longs") {
    val df = Tables(spark, staged("documents_narrow_ids.parquet", "documents"), "documents")
    assert(df.schema("doc_id").dataType == org.apache.spark.sql.types.LongType)
    assert(df.schema("n_chars").dataType == org.apache.spark.sql.types.LongType)
    assert(df.filter(col("doc_id") % 2 === 0).count() == 10)
  }

  test("embeddings with double elements / long label conform to float32 / int32") {
    import org.apache.spark.sql.types._
    val df = Tables(spark, staged("embeddings_double_elems.parquet", "embeddings"), "embeddings")
    assert(df.schema("embedding").dataType.asInstanceOf[ArrayType].elementType == FloatType)
    assert(df.schema("label").dataType == IntegerType)
    // the native vector kernels type-check for float32 input — must still run
    val n = df.select(graft.functions.VectorFunctions.cosine(
      col("embedding"), col("embedding")).as("c")).filter(col("c") > 0.99).count()
    assert(n == 10)
  }

  test("events with float32 value / int32 user_id conform to double / long") {
    import org.apache.spark.sql.types._
    val df = Tables(spark, staged("events_drifted_types.parquet", "events"), "events")
    assert(df.schema("value").dataType == DoubleType)
    assert(df.schema("user_id").dataType == LongType)
    assert(df.schema("ts").dataType == TimestampType || df.schema("ts").dataType == TimestampNTZType)
    assert(df.count() == 20)
  }

  test("non-coercible drift fails loudly naming the table and column") {
    val err = intercept[IllegalStateException] {
      Tables(spark, staged("documents_bad_text.parquet", "documents"), "documents")
    }
    assert(err.getMessage.contains("documents.text"), err.getMessage)
  }
}
