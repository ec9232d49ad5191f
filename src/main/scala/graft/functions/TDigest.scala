package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests") — the sketch behind the reference's
  * `quantiles` UDA (src/carnot/funcs/builtins/math_sketches.h:42-129).
  * Built from the published algorithm, not the reference code: buffered
  * inserts, k1 scale function, merge-by-sorted-means compression.
  *
  * Mergeable by construction so Spark's partial/final aggregation works
  * across executors — the same property the reference needs for its
  * PEM-partial / Kelvin-finalize split.
  */
final class TDigest(val compression: Double = 100.0) extends Serializable {
  // parallel arrays: centroid means + weights, kept sorted by mean
  var means: ArrayBuffer[Double] = ArrayBuffer.empty
  var weights: ArrayBuffer[Double] = ArrayBuffer.empty
  var totalWeight: Double = 0.0
  private var buffer: ArrayBuffer[Double] = ArrayBuffer.empty

  def add(x: Double): Unit = {
    buffer += x
    if (buffer.length >= 512) compress()
  }

  def merge(other: TDigest): TDigest = {
    compress(); other.compress()
    val out = new TDigest(compression)
    val n = means.length + other.means.length
    val m = new Array[Double](n); val w = new Array[Double](n)
    var i = 0; var j = 0; var k = 0
    while (i < means.length || j < other.means.length) {
      val takeLeft = j >= other.means.length ||
        (i < means.length && means(i) <= other.means(j))
      if (takeLeft) { m(k) = means(i); w(k) = weights(i); i += 1 }
      else { m(k) = other.means(j); w(k) = other.weights(j); j += 1 }
      k += 1
    }
    out.setFromSorted(m, w)
    out
  }

  private def setFromSorted(m: Array[Double], w: Array[Double]): Unit = {
    means = ArrayBuffer.empty; weights = ArrayBuffer.empty
    totalWeight = w.sum
    if (m.isEmpty) return
    // k1 scale: centroid weight cap ~ 4 n sin stuff; use the simpler
    // q-based bound: max weight at quantile q is 4*n*q*(1-q)/compression.
    var curMean = m(0); var curW = w(0); var cum = 0.0
    var idx = 1
    while (idx < m.length) {
      val q = (cum + curW / 2) / totalWeight
      val cap = math.max(1.0, 4.0 * totalWeight * q * (1 - q) / compression)
      if (curW + w(idx) <= cap) {
        curMean = (curMean * curW + m(idx) * w(idx)) / (curW + w(idx))
        curW += w(idx)
      } else {
        means += curMean; weights += curW; cum += curW
        curMean = m(idx); curW = w(idx)
      }
      idx += 1
    }
    means += curMean; weights += curW
  }

  def compress(): Unit = {
    if (buffer.isEmpty && means.length <= 2 * compression) return
    val n = means.length + buffer.length
    val m = new Array[Double](n); val w = new Array[Double](n)
    var k = 0
    for (i <- means.indices) { m(k) = means(i); w(k) = weights(i); k += 1 }
    for (x <- buffer) { m(k) = x; w(k) = 1.0; k += 1 }
    buffer = ArrayBuffer.empty
    val order = m.indices.sortBy(m)
    setFromSorted(order.map(m).toArray, order.map(w).toArray)
  }

  /** Quantile estimate by linear interpolation between centroid means. */
  def quantile(q: Double): Double = {
    compress()
    if (means.isEmpty) return Double.NaN
    if (means.length == 1) return means(0)
    val target = q * totalWeight
    var cum = 0.0
    for (i <- means.indices) {
      val half = weights(i) / 2
      if (cum + half >= target) {
        if (i == 0) return means(0)
        val prevCum = cum - weights(i - 1) / 2
        val frac = (target - prevCum) / ((cum + half) - prevCum)
        return means(i - 1) + frac * (means(i) - means(i - 1))
      }
      cum += weights(i)
    }
    means.last
  }
}
