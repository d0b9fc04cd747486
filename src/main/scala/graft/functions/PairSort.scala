package graft.functions

/** Tandem sort over paired primitive arrays — the shared kernel behind the
  * [[TopKBuffer]] and [[QSketchBuffer]] compactions, which keep their
  * (Double, Long) pairs as two primitive arrays instead of an
  * `ArrayBuffer[(Double, Long)]` (one boxed tuple per aggregated ROW on the
  * 100 TB hot paths — every knn scored row, every raw quantile value).
  *
  * Median-of-three quicksort, insertion sort below 16, recursion on the
  * smaller side. Unstable — safe here because both users' orders break
  * every tie down to the full pair, so compare-equal elements are
  * bit-interchangeable (NaN payload bits excepted, which neither user's
  * data can produce and whose order was unspecified before too).
  */
private[functions] abstract class PairSorter {
  /** Total order between pairs (d1, l1) and (d2, l2). */
  def cmp(d1: Double, l1: Long, d2: Double, l2: Long): Int

  final def sort(ds: Array[Double], ls: Array[Long], n: Int): Unit =
    qsort(ds, ls, 0, n - 1)

  private def swap(ds: Array[Double], ls: Array[Long], i: Int, j: Int): Unit = {
    val d = ds(i); ds(i) = ds(j); ds(j) = d
    val l = ls(i); ls(i) = ls(j); ls(j) = l
  }

  // plain recursion: buffer sizes are bounded (4k / 4·maxCentroids), and
  // the smaller side recurses first so depth stays logarithmic in practice
  private def qsort(ds: Array[Double], ls: Array[Long], lo: Int, hi: Int): Unit = {
    if (hi - lo < 16) {
      // insertion sort
      var i = lo + 1
      while (i <= hi) {
        val d = ds(i); val l = ls(i)
        var j = i - 1
        while (j >= lo && cmp(ds(j), ls(j), d, l) > 0) {
          ds(j + 1) = ds(j); ls(j + 1) = ls(j); j -= 1
        }
        ds(j + 1) = d; ls(j + 1) = l
        i += 1
      }
    } else {
      // median-of-three pivot moved to lo
      val mid = lo + (hi - lo) / 2
      if (cmp(ds(mid), ls(mid), ds(lo), ls(lo)) < 0) swap(ds, ls, mid, lo)
      if (cmp(ds(hi), ls(hi), ds(lo), ls(lo)) < 0) swap(ds, ls, hi, lo)
      if (cmp(ds(hi), ls(hi), ds(mid), ls(mid)) < 0) swap(ds, ls, hi, mid)
      val pd = ds(mid); val pl = ls(mid)
      // Hoare partition
      var i = lo - 1; var j = hi + 1
      var done = false
      while (!done) {
        do i += 1 while (cmp(ds(i), ls(i), pd, pl) < 0)
        do j -= 1 while (cmp(ds(j), ls(j), pd, pl) > 0)
        if (i >= j) done = true else swap(ds, ls, i, j)
      }
      // recurse on the smaller side, loop on the larger (bounded stack)
      if (j - lo < hi - j - 1) {
        qsort(ds, ls, lo, j)
        qsort(ds, ls, j + 1, hi)
      } else {
        qsort(ds, ls, j + 1, hi)
        qsort(ds, ls, lo, j)
      }
    }
  }
}

private[functions] object PairSort {
  /** (score desc, id asc) with NaN scores last — byte-for-byte the order
    * `Ordering.by(p => (-p._1, p._2))` imposed on the tuple buffer
    * (java.lang.Double.compare over NEGATED scores, so ±0.0 and NaN rank
    * exactly as before).
    */
  val topK: PairSorter = new PairSorter {
    def cmp(d1: Double, l1: Long, d2: Double, l2: Long): Int = {
      val c = java.lang.Double.compare(-d1, -d2)
      if (c != 0) c else java.lang.Long.compare(l1, l2)
    }
  }

  /** (mean asc, weight asc) — the centroid pack order `sortBy(c => (c._1,
    * c._2))` imposed (total Double order: -0.0 < 0.0 < NaN-last).
    */
  val centroid: PairSorter = new PairSorter {
    def cmp(d1: Double, l1: Long, d2: Double, l2: Long): Int = {
      val c = java.lang.Double.compare(d1, d2)
      if (c != 0) c else java.lang.Long.compare(l1, l2)
    }
  }
}
