package graft.engine

import org.apache.spark.sql.expressions.Aggregator

/** MISRA-GRIES heavy-hitter candidates as a typed Aggregator (the
  * SpaceSaving/MG frequent-items sketch — the frequency summary a
  * count-min (q91) cannot give: a GUARANTEED candidate set): a buffer
  * of at most k (key, count) entries; an unseen key beyond capacity
  * decrements every entry instead of entering (dropping zeros), and
  * the merge sums buffers then subtracts the (k+1)-th largest count —
  * both preserve the MG invariant that any key with true count
  * > n/(k+1) is still present, REGARDLESS of partitioning or merge
  * order. q199 pairs the sketch with an exact verification pass, so
  * the final output is the exact heavy-hitter set and the sketch's
  * only job is shrinking pass two to a bounded candidate list — the
  * textbook two-pass shape whose determinism needs exactly the MG
  * no-miss guarantee (a candidate set that DEPENDED on partition
  * layout would make the registered result nondeterministic even
  * with an exact second pass... it does not, because pass two also
  * re-filters by the exact threshold).
  *
  * The buffer is an immutable Map under Kryo encoders (see
  * bufferEncoder below) — fine at the registry's scale; a production
  * deployment would swap the MAP ITSELF for a mutable open hash map
  * (same algebra, same encoders). Decrements cost O(k) but fire at
  * most n/k times: amortized O(1) per element. */
object HeavyHitters {

  final class MgAgg(k: Int)
      extends Aggregator[Long, Map[Long, Long], Array[Long]] {
    require(k >= 1, s"capacity must be >= 1, got $k")

    override def zero: Map[Long, Long] = Map.empty

    override def reduce(b: Map[Long, Long], v: Long): Map[Long, Long] =
      b.get(v) match {
        case Some(c) => b.updated(v, c + 1)
        case None if b.size < k => b.updated(v, 1L)
        case None =>
          b.flatMap { case (key, c) =>
            if (c > 1) Some(key -> (c - 1)) else None
          }
      }

    override def merge(a: Map[Long, Long],
        b: Map[Long, Long]): Map[Long, Long] = {
      val sum = b.foldLeft(a) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count, drop non-positives
        val cut = sum.valuesIterator.toArray.sortInPlace()(
          Ordering.Long.reverse).apply(k)
        sum.flatMap { case (key, c) =>
          if (c > cut) Some(key -> (c - cut)) else None
        }
      }
    }

    override def finish(b: Map[Long, Long]): Array[Long] = {
      val a = b.keysIterator.toArray
      java.util.Arrays.sort(a)
      a
    }

    override def bufferEncoder
        : org.apache.spark.sql.Encoder[Map[Long, Long]] =
      org.apache.spark.sql.Encoders.kryo[Map[Long, Long]]
    override def outputEncoder
        : org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.Encoders.kryo[Array[Long]]
  }
}
