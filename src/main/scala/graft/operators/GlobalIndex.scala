package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.LongType

/** Distributed 0-based global row index over a total order (SURVEY.md §7.4
  * item 4 — the positional cluster contract J4).
  *
  * `row_number().over(Window.orderBy(...))` funnels every row through ONE
  * task; here the total order comes from a parallel range sort
  * (`repartitionByRange` + in-partition sort) and the index from
  * `zipWithIndex`, whose only sequential state is one count per partition
  * on the driver. Exact same numbering, no single-task stage.
  */
object GlobalIndex {

  /** Adds `outCol`: the 0-based rank of the row under `order`.
    * `order` must be a total order (tie-free) for the index to be
    * deterministic. */
  def withGlobalIndex(
      df: DataFrame,
      order: Seq[Column],
      outCol: String,
      numPartitions: Int = 0,
  ): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(outCol, LongType)
    // zipWithIndex EAGERLY runs one job at construction (its per-partition
    // start offsets need the partition sizes). Pin the sorted RDD so that
    // job fills a cache the real action then reads — unpinned, the full
    // scan + range shuffle + sort would execute twice per caller. RDD
    // blocks (unlike DataFrame cache entries) are reclaimed by the context
    // cleaner once the result is dereferenced — NOTE the pin therefore
    // lives exactly as long as the caller holds ANY frame derived from
    // the result (an eager unpersist here would force the sort to rerun
    // on every later action). Long-lived holders should materialize
    // (write / localCheckpoint) and drop the reference.
    val rddSorted = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rdd = rddSorted.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }
}
