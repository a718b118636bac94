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

  // --- round-8 advice guards: silent-corruption paths in conform ---

  private def messages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("integral narrowing with an out-of-range value fails loudly, not wrapping") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables_overflow").toString
    // canonical embeddings.label is int32; 3e9 does not fit — a plain cast
    // would silently wrap to a negative key
    Seq((1L, Array(0.5f, 0.5f), 3000000000L), (2L, Array(0.25f, 0.75f), 1L))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val err = intercept[Exception] {
      Tables(spark, dir, "embeddings").collect()
    }
    assert(messages(err).contains("overflows"), messages(err))
  }

  test("in-range integral narrowing still loads (guard is value-level)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables_narrow_ok").toString
    Seq((1L, Array(0.5f, 0.5f), 7L), (2L, Array(0.25f, 0.75f), -3L))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = Tables(spark, dir, "embeddings")
    assert(df.schema("label").dataType == org.apache.spark.sql.types.IntegerType)
    assert(df.select(sum(col("label"))).head().getLong(0) == 4L)
  }

  test("plain INT64 micro-epoch ts fails loudly instead of loading 1000x off") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables_us_epoch").toString
    // 2025-02-19T21:20:00Z as MICROSECONDS (~1.7e15): the ns-assuming
    // div-1000 would silently land in year 2025/1000 territory
    Seq((1L, 1740000000000000L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val err = intercept[Exception] {
      Tables(spark, dir, "events").collect()
    }
    assert(messages(err).contains("nanosecond"), messages(err))
  }

  test("plain INT64 nano-epoch ts loads as exact truncated microseconds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables_ns_epoch").toString
    Seq((1L, 1740000000000000123L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head().getString(0)
    assert(got == "2025-02-19 21:20:00.000000", got)
  }

  test("non-coercible drift fails loudly naming the table and column") {
    val err = intercept[IllegalStateException] {
      Tables(spark, staged("documents_bad_text.parquet", "documents"), "documents")
    }
    assert(err.getMessage.contains("documents.text"), err.getMessage)
  }
}
