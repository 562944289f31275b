package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Cart
import graft.sql.GraftFunctions._
import graft.world.{World, WorldSpec}

/** The model pipeline core (SURVEY.md §3.1 stages 4-9): build the wide
  * feature table from the tile scan, fit per-(region, driver) CART
  * trees on the collected training slice, and score every loss-bearing
  * cell with the vote.
  *
  * Architecture notes (vs the reference):
  *  - the 85-fold join chain (R:209-228/249-269) is ONE decode+explode
  *    pass producing all feature columns — no join at all;
  *  - training is ~5k rows (R:204-205): collected to the driver and fit
  *    there (SURVEY.md §2.9 M1); the 35 fitted trees ship back inside
  *    closed-form `when`-chain Catalyst expressions (M3), so inference
  *    is whole-stage-codegen'd and needs no UDF, no broadcast variable,
  *    and no extra shuffle: the region dispatch + 5 probability columns
  *    + argmax vote evaluate in a single projection over the feature
  *    frame;
  *  - classes 6 and 7 are dropped from training by default (notebook
  *    cell 36 intent; the R script only drops 7 at R:204 — configurable
  *    via `dropClasses`).
  */
object Pipeline {

  val NumDrivers = 5

  final case class Config(
      dropClasses: Set[Int] = Set(6, 7),
      confidenceFloor: Double = 0.5, // strict < keeps the class (R:382)
      lossFloor: Double = 0.005, // R:407
      cartParams: Cart.Params = Cart.Params(),
      pruneCp: Double = 0.02) // R:313

  /** Decoded per-cell frame: (cell_id, loss, b1..b5) from the tile
    * table — the raster->vector scan (S3). */
  def decodedCells(s: SparkSession, spec: WorldSpec): DataFrame =
    decodedCellsFrom(World.tilesDF(s, spec), spec)

  /** Same, from an already-loaded tile table (e.g. a parquet scan).
    * Partial edge tiles (padded specs) contribute only their in-grid
    * pixels — the NaN padding is dropped by a cheap arithmetic guard. */
  def decodedCellsFrom(tiles: DataFrame, spec: WorldSpec): DataFrame = {
    val nb = spec.nBands
    val zipped = arrays_zip((0 until nb).map(b =>
      decode_band(col("bytes"), col("fmt"), spec.pixPerTile, b).as(s"b$b")): _*)
    val C = spec.cols
    val T = spec.tile
    val TX = spec.tilesX
    val gr = floor(col("tile_id") / TX) * T + floor(col("p") / T)
    val gc = (col("tile_id") % TX) * T + col("p") % T
    val exploded = tiles
      .select(col("tile_id"), posexplode(zipped).as(Seq("p", "v")))
    val inGrid = if (!spec.padded) exploded
      else exploded.filter(gr < spec.rows && gc < spec.cols)
    inGrid.select(
        ((gr * C + gc + 1).cast("long").as("cell_id") +:
          col("v.b0").cast("double").as("loss") +:
          (1 until nb).map(b => col(s"v.b$b").cast("double").as(s"b$b"))): _*)
  }

  /** Feature frame with region attached via the PIP expression; rows
    * outside every polygon are dropped (R:273-274). region_explode
    * evaluates the ray-cast once per row AND drops the misses in the
    * same Generate — the withColumn+filter shape would evaluate the PIP
    * twice (pushed Filter + Project). */
  def featuresWithRegion(s: SparkSession, spec: WorldSpec): DataFrame = {
    val px = ((col("cell_id") - 1) % spec.cols).cast("double") + 0.5
    val py = floor((col("cell_id") - 1) / spec.cols).cast("double") + 0.5
    decodedCells(s, spec)
      .select(col("*"),
        region_explode(px, py, World.polygons(spec)).as("region_id"))
  }

  /** Compile a fitted tree into a when-chain Column over feature cols. */
  def treeColumn(t: Cart.Tree, feats: IndexedSeq[Column]): Column = t match {
    case Cart.Leaf(v, _, _) => lit(v)
    case Cart.Split(f, thr, lo, hi, _, _, _) =>
      when(feats(f) < thr, treeColumn(lo, feats))
        .otherwise(treeColumn(hi, feats))
  }

  /** Fit the (region x driver) tree matrix from the collected training
    * slice. Key: (region_id, driver) -> pruned tree. */
  def fitTrees(training: Array[(Int, Int, Array[Double])], nRegions: Int,
      cfg: Config): Map[(Int, Int), Cart.Tree] = {
    (1 to nRegions).flatMap { r =>
      val regional = training.filter(_._1 == r)
      (1 to NumDrivers).map { d =>
        val xs = regional.map(_._3)
        val y = regional.map(t => if (t._2 == d) 1.0 else 0.0)
        val tree =
          if (xs.isEmpty) Cart.Leaf(0.0, 0, 0.0)
          else Cart.prune(Cart.fit(xs, y, cfg.cartParams), cfg.pruneCp)
        (r, d) -> tree
      }
    }.toMap
  }

  /** Full fit-predict-vote over the synthetic world: returns
    * (cell_id, region_id, class, confidence) for loss-bearing cells.
    * Matches reference stages 4-9 (R:191-411). */
  def fitPredictVote(s: SparkSession, spec: WorldSpec,
      cfg: Config = Config()): DataFrame =
    voteFromFeatures(s, spec, featuresWithRegion(s, spec), cfg)

  /** Fit + vote over an already-built feature frame (cell_id, loss,
    * b1..bK, region_id) — the checkpointable core of stages 6-9. */
  def voteFromFeatures(s: SparkSession, spec: WorldSpec, feats: DataFrame,
      cfg: Config = Config()): DataFrame = {

    // training slice: labeled cells, excluded classes dropped (R:204-205
    // vs nb cell 36), collected driver-side.
    val trainLabel =
      when((((col("cell_id") * 13) * World.Knuth) % World.M32) % 64 < 4,
        ((((col("cell_id") * 13 + 1) * World.Knuth) % World.M32) % 7)
          .cast("int") + 1).otherwise(0)
    val nb = spec.nBands
    val featCols = (1 until nb).map(b => col(s"b$b"))
    val training = feats
      .withColumn("tclass", trainLabel)
      .filter(col("tclass") > 0 &&
        !col("tclass").isInCollection(cfg.dropClasses))
      .select(col("region_id") +: col("tclass") +: featCols: _*)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1),
        (2 until 2 + (nb - 1)).map(r.getDouble).toArray))

    val trees = fitTrees(training, spec.nRegions, cfg)

    // single-projection inference: per driver, region-dispatched tree
    // expression; then the vote.
    val probCols = (1 to NumDrivers).map { d =>
      (1 to spec.nRegions).foldLeft(lit(0.0)) { (acc, r) =>
        when(col("region_id") === r,
          treeColumn(trees((r, d)), featCols.toIndexedSeq)).otherwise(acc)
      }.as(s"p$d")
    }
    val scored = feats.filter(col("loss") > 0) // predict loss-bearing cells
      .select(col("cell_id") +: col("region_id") +: col("loss") +: probCols: _*)
    val ps = (1 to NumDrivers).map(d => col(s"p$d"))
    val mx = greatest(ps: _*)
    scored.select(col("cell_id"), col("region_id"),
        when(col("loss") < cfg.lossFloor, 0L)
          .otherwise(when(mx < cfg.confidenceFloor, 0L)
            .otherwise(array_position(array(ps: _*), mx))).as("class"),
        mx.as("confidence"))
  }

  /** The full model pipeline (stages 4-13 of SURVEY.md §3.1) as
    * RESUMABLE checkpointed stages: decode -> PIP features -> fit+vote
    * -> expand -> rasterize. Each stage snapshots to parquet under
    * `dir` keyed by a fingerprint of its upstream + config; rerunning
    * after a kill reloads finished stages and recomputes only the rest
    * (see store.log). Returns (expanded class frame, store). */
  def runCheckpointed(s: SparkSession, spec: WorldSpec, dir: String,
      cfg: Config = Config(), expandIters: Int = 8)
      : (DataFrame, Checkpoint.Store) = {
    val store = new Checkpoint.Store(s, dir)
    val fpCells = Checkpoint.fingerprint("cells", spec)
    val cells = store.stage("cells", fpCells)(decodedCells(s, spec))

    val fpFeat = Checkpoint.fingerprint("features", fpCells, spec.nRegions)
    val features = store.stage("features", fpFeat, Seq("cells")) {
      val px = ((col("cell_id") - 1) % spec.cols).cast("double") + 0.5
      val py = floor((col("cell_id") - 1) / spec.cols).cast("double") + 0.5
      cells.select(col("*"),
        region_explode(px, py, World.polygons(spec)).as("region_id"))
    }

    val fpScored = Checkpoint.fingerprint("scored", fpFeat, cfg)
    val scored = store.stage("scored", fpScored, Seq("features")) {
      voteFromFeatures(s, spec, features, cfg)
    }

    val fpExpanded =
      Checkpoint.fingerprint("expanded", fpScored, expandIters)
    val expanded = store.stage("expanded", fpExpanded, Seq("scored")) {
      // Expand runs over the full grid: absent cells are uncertain (0).
      val full = s.range(1, spec.nCells + 1).toDF("cell_id")
        .join(scored.select(col("cell_id"), col("class")), Seq("cell_id"),
          "left")
        .select(col("cell_id"),
          coalesce(col("class"), lit(0L)).as("final_class"))
      // the ArcGIS-Expand analog is distance-bounded (its NumberCells
      // argument): exactly expandIters rings, documented — not a cap
      Expand.run(s, spec, full, maxIters = expandIters,
        requireConvergence = false)
    }

    val fpRaster = Checkpoint.fingerprint("rasterized", fpExpanded)
    store.stage("rasterized", fpRaster, Seq("expanded")) {
      Rasterize(spec, expanded, "final_class")
    }

    // Stage 13 — the reference's actual DELIVERABLE (R:510-551): dedup
    // the loss observations by cell (group/mean, R:516-520), join the
    // final class (R:521), then fan out per class: one CSV (R:524-549,
    // the K1 sink) and one raster (the six rastOut calls) per class.
    val fpMasks = Checkpoint.fingerprint("loss_masks", fpExpanded)
    store.stage("loss_masks", fpMasks, Seq("expanded")) {
      val lossMean = cells.select(col("cell_id"), col("loss"))
        .groupBy("cell_id").agg(avg("loss").as("loss_mean"))
      val joined = lossMean
        .join(expanded.select("cell_id", "final_class"), Seq("cell_id"))
      graft.sinks.Csv.writeClassMasks(joined, s"$dir/csv", "final_class",
        "loss_mean", classes = 0 to 5)
      Rasterize.byClass(spec, joined, "loss_mean", "final_class")
    }
    (expanded, store)
  }
}
