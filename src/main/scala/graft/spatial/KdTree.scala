package graft.spatial

/** Minimal static 2-D KD-tree for nearest-neighbor lookup (classic public
  * algorithm). Used for the "nearest" fallback outside the convex hull
  * (scipy griddata(method="nearest") parity) and for broadcast KNN joins.
  */
final class KdTree private (px: Array[Double], py: Array[Double],
                            idx: Array[Int]) {
  // tree is encoded in idx as a balanced implicit structure: node at
  // (lo+hi)/2 after recursive median partitioning, axis alternates by depth
  private def build(lo: Int, hi: Int, depth: Int): Unit = {
    if (hi - lo <= 1) return
    val mid = (lo + hi) / 2
    val byX = depth % 2 == 0
    // nth-element selection
    selectInPlace(lo, hi, mid, byX)
    build(lo, mid, depth + 1)
    build(mid + 1, hi, depth + 1)
  }

  private def key(i: Int, byX: Boolean): Double = if (byX) px(idx(i)) else py(idx(i))

  private def selectInPlace(lo0: Int, hi0: Int, k: Int, byX: Boolean): Unit = {
    var lo = lo0; var hi = hi0
    while (hi - lo > 1) {
      val pivot = key((lo + hi) / 2, byX)
      var i = lo; var j = hi - 1
      while (i <= j) {
        while (key(i, byX) < pivot) i += 1
        while (key(j, byX) > pivot) j -= 1
        if (i <= j) {
          val t = idx(i); idx(i) = idx(j); idx(j) = t
          i += 1; j -= 1
        }
      }
      if (k <= j) hi = j + 1
      else if (k >= i) lo = i
      else return
    }
  }

  /** Index of the nearest point to (x, y). */
  def nearest(x: Double, y: Double): Int = {
    var bestI = -1
    var bestD = Double.MaxValue
    def search(lo: Int, hi: Int, depth: Int): Unit = {
      if (hi <= lo) return
      val mid = (lo + hi) / 2
      val pi = idx(mid)
      val dx = x - px(pi); val dy = y - py(pi)
      val d = dx * dx + dy * dy
      if (d < bestD || (d == bestD && pi < bestI)) { bestD = d; bestI = pi }
      val byX = depth % 2 == 0
      val delta = if (byX) x - px(pi) else y - py(pi)
      val (near, far) =
        if (delta < 0) ((lo, mid), (mid + 1, hi)) else ((mid + 1, hi), (lo, mid))
      search(near._1, near._2, depth + 1)
      if (delta * delta <= bestD) search(far._1, far._2, depth + 1)
    }
    search(0, idx.length, 0)
    bestI
  }
}

object KdTree {
  def apply(px: Array[Double], py: Array[Double]): KdTree = {
    val t = new KdTree(px, py, Array.range(0, px.length))
    t.build(0, px.length, 0)
    t
  }
}
