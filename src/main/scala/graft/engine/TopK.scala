package graft.engine

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k selection — the at-scale replacement for
  * `ROW_NUMBER() OVER (PARTITION BY g ORDER BY ...) <= k` when groups
  * are huge or skewed (the per-DOMAIN document cap every pretraining
  * mixture applies: no single crawl domain may contribute more than K
  * documents, keep the best K by quality).
  *
  * The window formulation shuffles and SORTS every row of every group;
  * one hot domain with 10^9 rows becomes one task sorting 10^9 rows.
  * This aggregator's buffer is a size-k min-heap, so Catalyst's partial
  * aggregation reduces each task's rows into at most k survivors BEFORE
  * the exchange: shuffle bytes are O(tasks * k * 8), per-task state is
  * O(k), and the hot domain costs n * O(log k) comparisons spread
  * across all its input tasks instead of one n-log-n sort on one core.
  *
  * Contract: rows arrive PACKED into one long each, bigger-wins, the
  * caller folds its tie-break into the low bits (e.g. score in the high
  * 32, `0xFFFFFFFF - id` in the low 32 so the smaller id wins ties).
  * Packing keeps the buffer a primitive `Array[Long]` — zero boxing in
  * reduce/merge, same encoder shape as [[Bloom.Agg]].
  */
object TopK {

  /** Buffer layout: slot 0 = count n, slots 1..n = binary min-heap
    * (root at 1, children at 2i/2i+1). finish() returns the survivors
    * sorted descending (rank order). */
  final class Agg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: Array[Long] = new Array[Long](k + 1)

    override def reduce(b: Array[Long], v: Long): Array[Long] = {
      val n = b(0).toInt
      if (n < k) {
        // grow: append then sift up
        var i = n + 1
        b(i) = v
        b(0) = n + 1
        while (i > 1 && b(i >> 1) > b(i)) {
          val t = b(i >> 1); b(i >> 1) = b(i); b(i) = t
          i >>= 1
        }
      } else if (v > b(1)) {
        // full and better than the current min: replace root, sift down
        b(1) = v
        var i = 1
        var done = false
        while (!done) {
          val l = i << 1
          val r = l + 1
          var s = i
          if (l <= k && b(l) < b(s)) s = l
          if (r <= k && b(r) < b(s)) s = r
          if (s == i) done = true
          else {
            val t = b(s); b(s) = b(i); b(i) = t
            i = s
          }
        }
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val nb = b(0).toInt
      var i = 1
      while (i <= nb) { reduce(a, b(i)); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Array[Long] = {
      val n = r(0).toInt
      val out = new Array[Long](n)
      System.arraycopy(r, 1, out, 0, n)
      java.util.Arrays.sort(out)
      // descending = rank order
      var i = 0
      while (i < n - 1 - i) {
        val t = out(i); out(i) = out(n - 1 - i); out(n - 1 - i) = t
        i += 1
      }
      out
    }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
  }
}
