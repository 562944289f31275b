package graft.engine

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

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

  /** Packs (score, id) into one bigger-wins long for [[Agg]]: score in
    * the high 32 bits, `0xFFFFFFFF - id` in the low 32 so the SMALLER
    * id wins ties. The contract's bounds (0 <= score < 2^31,
    * 0 <= id < 2^32) are guarded per row by `assert_true` — two
    * comparisons riding the same codegen projection as the pack — so
    * an out-of-range input fails the job loudly instead of silently
    * borrowing into the score bits and corrupting the ordering. The
    * single pack/unpack definition is shared by batch q95 and the
    * streaming domainCapByWindow so the two shapes cannot diverge. */
  def packDescSmallerId(score: Column, id: Column): Column = {
    val ok = assert_true(
      score >= 0 && score < (1L << 31) && id >= 0 && id <= 0xFFFFFFFFL,
      lit("TopK pack bounds: 0 <= score < 2^31, 0 <= id < 2^32"))
    shiftleft(score.cast("long"), 32) + (lit(0xFFFFFFFFL) - id) +
      coalesce(ok.cast("long"), lit(0L)) // NULL on success: adds 0
  }

  /** Inverse of [[packDescSmallerId]], id half. */
  def unpackId(pk: Column): Column =
    lit(0xFFFFFFFFL) - pk.bitwiseAND(lit(0xFFFFFFFFL))

  /** Inverse of [[packDescSmallerId]], score half. */
  def unpackScore(pk: Column): Column = shiftright(pk, 32)

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
