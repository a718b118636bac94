package graft.functions

/** The one capped-TreeSet invariant every bounded sketch/top-k buffer in
  * this engine shares: keep the k SMALLEST elements under the set's own
  * ordering (reverse the ordering to keep the k largest). Centralized so
  * a change to the tie/duplicate policy cannot silently diverge across
  * the KMV aggregate, the relation-level KMV, and the top-k aggregate.
  * Duplicates (per the ordering) collapse — these are SETS by contract.
  */
private[graft] object BoundedSets {

  def keepSmallest[T](set: java.util.TreeSet[T], e: T, k: Int): Unit = {
    if (set.size < k) { set.add(e); () }
    else {
      val cmp = set.comparator()
      val less =
        if (cmp != null) cmp.compare(e, set.last()) < 0
        else e.asInstanceOf[Comparable[T]].compareTo(set.last()) < 0
      if (less && set.add(e)) { set.pollLast(); () }
    }
  }
}
