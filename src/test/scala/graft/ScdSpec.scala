package graft

import graft.operators.Scd
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hist(rows: (Long, String, Long, Option[Long])*) =
    rows.toSeq.toDF("key", "value", "valid_from", "valid_to")
  private def ch(rows: (Long, String, Long, String)*) =
    rows.toSeq.toDF("key", "value", "ts", "op")

  test("scd2: insert, effective upsert, no-op upsert, delete, closed passthrough") {
    val h = hist(
      (1L, "a1", 0L, None),        // will be upserted to a2
      (1L, "a0", -10L, Some(0L)),  // closed history: untouched
      (2L, "b", 0L, None),         // no-op upsert (same value)
      (3L, "c", 0L, None),         // deleted
      (4L, "d", 0L, None),         // no change at all
    )
    val c = ch(
      (1L, "a2", 100L, "upsert"),
      (2L, "b", 100L, "upsert"),
      (3L, "ignored", 100L, "delete"),
      (5L, "e", 100L, "upsert"),   // brand-new key
      (6L, "f", 100L, "delete"),   // delete of a non-existent key: no-op
    )
    val out = Scd.scd2Merge(h, c)
      .orderBy(col("key"), col("valid_from"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong))).toSeq
    assert(out == Seq(
      (1L, "a0", -10L, Some(0L)),   // closed history passes through
      (1L, "a1", 0L, Some(100L)),   // old version closed at change ts
      (1L, "a2", 100L, None),       // new open version
      (2L, "b", 0L, None),          // no-op upsert leaves the row open
      (3L, "c", 0L, Some(100L)),    // delete closes without replacement
      (4L, "d", 0L, None),          // untouched
      (5L, "e", 100L, None),        // insert
    ))
  }

  test("scd2: null values compare null-safely; layout invariance") {
    val h = hist((1L, null.asInstanceOf[String], 0L, None))
    // null -> null is a no-op upsert; null -> x is an effective change
    val noop = Scd.scd2Merge(h, ch((1L, null.asInstanceOf[String], 5L, "upsert")))
      .collect()
    assert(noop.length == 1 && noop.head.isNullAt(3))
    val changed = Scd.scd2Merge(h, ch((1L, "x", 5L, "upsert")))
      .orderBy(col("valid_from")).collect()
    assert(changed.length == 2)
    val h2 = hist((1L to 100L).map(i => (i, s"v$i", 0L, None)): _*)
    val c2 = ch((1L to 50L).map(i => (i * 2, s"w$i", 9L, "upsert")): _*)
    val one = Scd.scd2Merge(h2.coalesce(1), c2).orderBy(col("key"), col("valid_from"))
      .collect().toSeq
    val many = Scd.scd2Merge(h2.repartition(7), c2.repartition(3))
      .orderBy(col("key"), col("valid_from")).collect().toSeq
    assert(one == many)
  }

  test("scd2: duplicate change keys fail loudly") {
    val h = hist((1L, "a", 0L, None))
    val dup = ch((1L, "x", 5L, "upsert"), (1L, "y", 6L, "upsert"))
    val e = intercept[Exception] {
      Scd.scd2Merge(h, dup).collect()
    }
    assert(e.getMessage != null)
  }

  test("scd2: unknown or NULL op fails loudly instead of acting as a delete") {
    val h = hist((1L, "a", 0L, None))
    intercept[Exception] {
      Scd.scd2Merge(h, ch((1L, "x", 5L, "UPSERT"))).collect() // case typo
    }
    intercept[Exception] {
      Scd.scd2Merge(h, ch((1L, "x", 5L, null.asInstanceOf[String]))).collect()
    }
  }

  test("scd2: an open row with NULL valid_from still exists (presence != payload)") {
    val h = Seq((1L, "a", None: Option[Long], None: Option[Long]),
      (2L, "b", None: Option[Long], None: Option[Long]))
      .toDF("key", "value", "valid_from", "valid_to")
    // no change for key 1: the open row must pass through, not vanish
    val out = Scd.scd2Merge(h, ch((2L, "b2", 9L, "upsert")))
      .orderBy(col("key"), col("valid_from")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (2L, "b"), (2L, "b2")))
  }

  test("scd2: timestamp-typed validity intervals work (type-generic ts)") {
    val h = Seq((1L, "a", "2024-01-01 00:00:00", null.asInstanceOf[String]))
      .toDF("key", "value", "f", "t")
      .select(col("key"), col("value"), to_timestamp(col("f")).as("valid_from"),
        to_timestamp(col("t")).as("valid_to"))
    val c = Seq((1L, "b", "2024-06-01 00:00:00", "upsert"))
      .toDF("key", "value", "ts_s", "op")
      .select(col("key"), col("value"), to_timestamp(col("ts_s")).as("ts"), col("op"))
    val out = Scd.scd2Merge(h, c).orderBy(col("valid_from")).collect()
    assert(out.length == 2)
    assert(out(0).getString(1) == "a" && !out(0).isNullAt(3)) // closed at ts
    assert(out(1).getString(1) == "b" && out(1).isNullAt(3))  // new open
  }
}
