package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.HeavyHitters.MgAgg

/** Unit pins for the Misra-Gries aggregator (q199): the no-miss
  * guarantee under arbitrary partitioning and merge orders — the
  * property the two-pass exactness argument rests on. */
class HeavyHittersSpec extends AnyFunSuite {

  test("no key with count > n/(k+1) is ever evicted, across random " +
    "partition layouts and merge orders") {
    val rnd = new scala.util.Random(9)
    for (trial <- 0 until 10) {
      val k = 8
      // skewed stream: a few hot keys + uniform noise
      val stream = rnd.shuffle(
        Seq.fill(300)(1L) ++ Seq.fill(200)(2L) ++ Seq.fill(150)(3L) ++
          Seq.fill(350)(rnd.nextLong(500) + 100))
      val n = stream.size
      val agg = new MgAgg(k)
      // random partitioning, then a random-order pairwise merge
      val parts = stream.grouped(1 + rnd.nextInt(200)).toSeq
      val buffers = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(buffers).reduce(agg.merge)
      val cands = agg.finish(merged).toSet
      val truth = stream.groupBy(identity).view.mapValues(_.size)
      truth.foreach { case (key, c) =>
        if (c > n / (k + 1))
          assert(cands.contains(key),
            s"trial $trial: heavy key $key (count $c > ${n / (k + 1)}) " +
              s"missing from candidates $cands")
      }
      assert(cands.size <= k, s"capacity violated: ${cands.size} > $k")
    }
  }
}
