package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT distributed order statistics without a global sort — the
  * at-scale shape for "what is the true p50/p95/p99 of 10^12 values":
  * iterative histogram refinement (distributed selection). Each pass
  * histograms every still-unresolved candidate value range into `bins`
  * fixed-width bins — a groupBy whose partial aggregation reduces each
  * task to <= bins rows per range, so the shuffle carries bin counts,
  * never values — then the driver walks cumulative counts to find the
  * bin holding each requested rank and recurses INTO those bins only.
  * Tracking each bin's true (min, max) guarantees progress: a bin
  * either narrows (its value span is < 1/bins of the parent) or
  * resolves on the spot (all values equal — heavy duplicates terminate
  * immediately, they never ping-pong). 10^12 rows resolve in ~3-4
  * passes at 4096 bins; values cross the wire only in the final exact
  * scan of bins whose count <= `collectCap`.
  *
  * All live ranges are histogrammed in ONE job per pass (a range-id
  * when-chain; ranges are identical-or-disjoint by construction), so
  * the pass count stays O(log_bins(spread)) no matter how many ranks
  * are requested — and the SAME multiplexing extends to PER-GROUP
  * selection: a grouped range is (group, lo, hi), every group's live
  * ranges ride the same when-chain, and all groups refine together in
  * one job per pass ([[groupedQuantilesAt]]). No per-group job, no
  * `PARTITION BY grp ORDER BY v` window putting each group's full
  * sort on one reducer. The global API is the one-group case of the
  * grouped core (the StableRowId/GroupRank pattern). Contract: group
  * cardinality must be dimension-like (the when-chain and driver
  * state are O(groups x live ranks), capped at [[MaxGroups]]) — for
  * key-cardinality groups use a mergeable sketch instead.
  *
  * The refinement predicate is a plain range filter on the value
  * column, so parquet row-group min/max stats let later passes also
  * READ less, not just shuffle less.
  *
  * Compare `approx_percentile`: one pass, approximate. This is the
  * complement — a handful of narrow passes, bit-exact answers (q88's
  * oracle is DuckDB row_number() at the same ranks).
  */
object Quantile {

  /** Grouped-core guard: ranges-per-pass and driver state are
    * O(groups x ranks) — dimension-like cardinality only. */
  val MaxGroups = 1024

  private val TmpGrp = "__q_grp"

  /** Unresolved rank of group `g`: the answer for rank `k` is the
    * `localRank`-th smallest value among g's rows with lo <= v <= hi. */
  private final case class RankState(g: Any, k: Long, lo: Double,
      hi: Double, localRank: Long)

  /** k-th smallest (1-based position in the sorted column, ties kept)
    * for every k in `ks`. NULL and NaN rows are excluded (SQL ORDER BY
    * comparability). */
  def kthElements(df: DataFrame, valueCol: String, ks: Seq[Long],
      bins: Int = 4096, collectCap: Int = 1 << 20): Map[Long, Double] = {
    require(ks.nonEmpty, "no ranks requested")
    selectRanks(df.withColumn(TmpGrp, lit(0)), TmpGrp, valueCol,
      (_, _) => ks, bins, collectCap)
      .map { case ((_, k), v) => k -> v }
  }

  /** Quantiles by fraction: one scan computes n, min and max; ranks
    * derive as max(1, floor(q * n)) from the SAME filtered count the
    * selection uses (a caller-side pre-count would both scan the table
    * an extra time and disagree on NaN rows). Returns
    * (label, rank, value) per requested fraction. */
  def quantilesAt(df: DataFrame, valueCol: String,
      fractions: Seq[(String, Double)], bins: Int = 4096,
      collectCap: Int = 1 << 20): Seq[(String, Long, Double)] = {
    checkFractions(fractions)
    var ks = Seq.empty[(String, Long)]
    val resolved = selectRanks(df.withColumn(TmpGrp, lit(0)), TmpGrp,
      valueCol, (_, n) => {
        ks = fractions.map { case (l, q) => l -> rankOf(q, n) }
        ks.map(_._2)
      }, bins, collectCap)
    ks.map { case (l, k) =>
      (l, k, resolved.collectFirst { case ((_, k2), v) if k2 == k => v }.get)
    }
  }

  /** PER-GROUP quantiles by fraction, every group refined in the same
    * jobs (see header). Returns (group, label, rank, value) per
    * (group, fraction); ranks derive from each group's own filtered
    * count. Group values are returned as read from the column. */
  def groupedQuantilesAt(df: DataFrame, grpCol: String, valueCol: String,
      fractions: Seq[(String, Double)], bins: Int = 4096,
      collectCap: Int = 1 << 20): Seq[(Any, String, Long, Double)] = {
    checkFractions(fractions)
    var perG = Map.empty[Any, Seq[(String, Long)]]
    val resolved = selectRanks(df, grpCol, valueCol, (g, n) => {
      val ks = fractions.map { case (l, q) => l -> rankOf(q, n) }
      perG += g -> ks
      ks.map(_._2)
    }, bins, collectCap)
    perG.toSeq.flatMap { case (g, ks) =>
      ks.map { case (l, k) => (g, l, k, resolved((g, k))) }
    }
  }

  private def checkFractions(fractions: Seq[(String, Double)]): Unit = {
    require(fractions.nonEmpty, "no fractions requested")
    fractions.foreach { case (l, q) =>
      require(q >= 0.0 && q <= 1.0, s"fraction $l = $q outside [0, 1]")
    }
  }

  private def rankOf(q: Double, n: Long): Long =
    math.max(1L, math.floor(q * n).toLong)

  /** Shared grouped core: `mkKs` receives each group's value and
    * filtered row count and returns the 1-based ranks to select for
    * that group. Returns (group, k) -> value. */
  private def selectRanks(df: DataFrame, grpCol: String, valueCol: String,
      mkKs: (Any, Long) => Seq[Long], bins: Int, collectCap: Int)
      : Map[(Any, Long), Double] = {
    require(bins >= 2 && collectCap >= 1, s"bad ($bins, $collectCap)")
    val base = df.select(col(grpCol).as("g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull && !col("v").isNaN)

    val heads = base.groupBy("g").agg(count(lit(1)).as("n"),
      min("v").as("lo"), max("v").as("hi")).collect()
    require(heads.nonEmpty, "empty input")
    require(heads.length <= MaxGroups,
      s"${heads.length} groups > $MaxGroups: per-pass state is " +
        "O(groups x ranks) — use a mergeable sketch for key-cardinality " +
        "groups")

    var resolved = Map.empty[(Any, Long), Double]
    var live: Seq[RankState] = heads.toSeq.flatMap { r =>
      val g = r.get(0)
      val n = r.getLong(1)
      val ks = mkKs(g, n)
      require(ks.nonEmpty, s"no ranks requested for group $g")
      ks.foreach(k =>
        require(k >= 1 && k <= n, s"rank $k outside [1, $n] in group $g"))
      ks.distinct.map(k => RankState(g, k, r.getDouble(2), r.getDouble(3), k))
    }
    var pass = 0
    while (live.nonEmpty) {
      pass += 1
      require(pass <= 64,
        s"selection failed to converge after $pass passes")

      // ranges are identical-or-disjoint WITHIN a group: pass 1 has one
      // shared range per group; later ranges are value spans of
      // disjoint bins. Different groups' ranges may overlap in value —
      // the group term in the rid predicate keeps them distinct.
      val ranges = live.map(s => (s.g, s.lo, s.hi)).distinct
        .sortBy(t => (t._2, t._3, String.valueOf(t._1)))
      val ridOf = ranges.zipWithIndex.toMap
      val ridCol = ranges.zipWithIndex
        .foldLeft(lit(-1)) { case (acc, ((g, l, h), i)) =>
          when(col("g") === lit(g) && col("v") >= l && col("v") <= h, i)
            .otherwise(acc)
        }
      val binCol = ranges.zipWithIndex
        .foldLeft(lit(0L)) { case (acc, ((_, l, h), i)) =>
          val b =
            if (l == h) lit(0L)
            else if ((h - l).isInfinity) {
              // span overflows double: (v - l) / (h - l) degenerates
              // to 0-or-NaN and every row lands in bin 0, so no pass
              // would narrow. Split at the (always finite) midpoint
              // instead — each half's span is finite, and the per-bin
              // (min, max) tracking resumes normal refinement next pass
              when(col("v") < l / 2 + h / 2, lit(0L)).otherwise(lit(1L))
            } else least(lit(bins - 1).cast("long"),
              floor((col("v") - l) / (h - l) * bins).cast("long"))
          when(col("rid") === i, b).otherwise(acc)
        }
      // hist: rid -> bins sorted by bin index, each (count, min, max)
      val hist = base.select(ridCol.as("rid"), col("v"))
        .filter(col("rid") >= 0)
        .select(col("rid"), binCol.as("bin"), col("v"))
        .groupBy("rid", "bin")
        .agg(count(lit(1)).as("c"), min("v").as("mn"), max("v").as("mx"))
        .collect()
        .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))))
        .groupBy(_._1)
        .map { case (rid, rows) => rid -> rows.map(_._2).sortBy(_._1) }

      var toCollect = List.empty[RankState]
      var nextLive = List.empty[RankState]
      live.foreach { s =>
        val rows = hist(ridOf((s.g, s.lo, s.hi)))
        // walk cumulative counts to the bin holding localRank
        var before = 0L
        var i = 0
        while (before + rows(i)._2 < s.localRank) {
          before += rows(i)._2; i += 1
        }
        val (_, c, mn, mx) = rows(i)
        val inner = RankState(s.g, s.k, mn, mx, s.localRank - before)
        if (mn == mx) resolved += (s.g, s.k) -> mn
        else if (c <= collectCap) toCollect ::= inner
        else nextLive ::= inner
      }

      if (toCollect.nonEmpty) {
        // one exact job for every capped bin: within a group the bins
        // are disjoint value spans, so a per-(group, range) sort +
        // index lookup resolves each rank
        val cRanges = toCollect.map(s => (s.g, s.lo, s.hi)).distinct
        val keep = cRanges
          .map { case (g, l, h) =>
            col("g") === lit(g) && col("v") >= l && col("v") <= h
          }
          .reduce(_ || _)
        val vals = base.filter(keep).collect()
          .map(r => (r.get(0), r.getDouble(1)))
        cRanges.foreach { case (g, l, h) =>
          val sortedVals = vals
            .collect { case (vg, v) if vg == g && v >= l && v <= h => v }
            .sorted
          toCollect.filter(s => s.g == g && s.lo == l && s.hi == h)
            .foreach { s =>
              resolved += (s.g, s.k) -> sortedVals((s.localRank - 1).toInt)
            }
        }
      }
      live = nextLive
    }
    resolved
  }
}
