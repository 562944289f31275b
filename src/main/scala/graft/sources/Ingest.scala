package graft.sources

import java.io.File
import scala.util.chaining._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.core.Polygon

/** Table ingest utilities (SURVEY.md §2.1).
  *
  * S1 — typed CSV scan with a canonical-name ALIAS MAP: the reference's
  * input files exist in the wild with diverging headers (the loss
  * column is `Loss` at `Supplemental_Data_1.R:407` but
  * `Loss_10kMean_20002016` at R:496,517-519; SURVEY.md §1.3 mandates a
  * canonical name + alias map at ingest). The reader peeks the header,
  * renames any known variant to its canonical name, then casts to the
  * expected schema — so both header generations load identically.
  *
  * S2 — variable-manifest discovery: the reference derives its 85
  * predictor columns from a directory listing (`.tif$` filter,
  * non-recursive, sorted; name = strip `Goode_` prefix and `.tif`
  * suffix — R:142-166, 150-152). Sorting fixes the wide-table column
  * order, so it is part of the contract.
  */
object Ingest {

  /** Read a headered CSV, canonicalize column names via `aliases`
    * (variant -> canonical), and cast to `schema` (by canonical name).
    * Unknown extra columns are dropped; missing canonical columns are
    * an error. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      aliases: Map[String, String] = Map.empty): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    val canon = raw.columns.foldLeft(raw) { (df, c) =>
      aliases.get(c).fold(df)(df.withColumnRenamed(c, _))
    }
    val missing = schema.fieldNames.filterNot(canon.columns.contains)
    require(missing.isEmpty,
      s"canonical columns missing after aliasing: ${missing.mkString(",")}")
    canon.select(schema.fields.map(f =>
      canon(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }

  /** S6 — vector/polygon layer scan: the reference loads region
    * boundaries with `readOGR` (R:884,893). The engine reads WKT text —
    * one `<region_id>,POLYGON((x y, x y, ...))` per line — parsed
    * distributed (a Dataset map), collected to the packed edge-array
    * Polygons the PIP expression broadcasts. Polygon layers are
    * dimension-sized (thousands of rows), so the collect is bounded by
    * the same budget as the broadcast itself. Interior rings (holes)
    * and MULTIPOLYGON parts pack into one multi-ring Polygon; each
    * ring's closing vertex (WKT rings repeat the first point) is
    * dropped to match the engine's open-ring convention. */
  def wktPolygons(spark: SparkSession, path: String): Array[Polygon] = {
    import spark.implicits._
    spark.read.textFile(path)
      .filter(l => l.trim.nonEmpty)
      .map(parseWktLine)
      .collect()
      .sortBy(_.regionId)
  }

  /** GeoJSON FeatureCollection boundary layer (the third vector format
    * beside WKT and .shp — see [[GeoJson]] for the supported subset).
    * Same economics as the others: a boundary layer is KB-scale next to
    * the raster, so it collects to the driver and broadcasts into the
    * PIP expression. */
  def geojsonPolygons(spark: SparkSession, path: String): Array[Polygon] = {
    import spark.implicits._
    val text = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]].head()
    GeoJson.decode(new String(text, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** WKB boundary layer (the binary twin of the WKT path — PostGIS /
    * GeoPackage export bytes; see [[Wkb]] for the supported subset).
    * Same dimension-layer economics: collect + broadcast into PIP. */
  def wkbPolygons(spark: SparkSession, path: String): Array[Polygon] = {
    import spark.implicits._
    val bytes = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]].head()
    Wkb.decode(bytes)
  }

  private[graft] def parseWktLine(line: String): Polygon = {
    val comma = line.indexOf(',')
    require(comma > 0,
      s"expected '<region_id>,POLYGON(...)|MULTIPOLYGON(...)': $line")
    val id = line.substring(0, comma).trim.toInt
    val wkt = line.substring(comma + 1).trim
    val up = wkt.toUpperCase
    require(up.startsWith("POLYGON") || up.startsWith("MULTIPOLYGON"),
      s"only POLYGON/MULTIPOLYGON geometries supported: $wkt")
    // every innermost parenthesized group is one ring's vertex list —
    // true for both POLYGON ((outer), (hole)...) and
    // MULTIPOLYGON (((outer), (hole)), ((outer2))); the even-odd
    // ray-cast over all rings' edges makes the two grammars' fill
    // semantics identical, so the flattened ring list loses nothing.
    // STRUCTURE is still validated loudly (never misread a truncated /
    // unbalanced layer): with each ring group reduced to '@', the
    // remainder must be exactly the WKT skeleton.
    val ringRe = """\(([^()]+)\)""".r
    val skeleton = ringRe.replaceAllIn(wkt, "@").replaceAll("\\s+", "")
    val polyGroup = "\\(@(,@)*\\)" // ( ring [, ring]* )
    require(
      skeleton.matches(s"(?i)POLYGON$polyGroup") ||
        skeleton.matches(s"(?i)MULTIPOLYGON\\($polyGroup(,$polyGroup)*\\)"),
      s"malformed (MULTI)POLYGON (unbalanced or truncated): $wkt")
    val ringBodies = ringRe.findAllMatchIn(wkt).map(_.group(1)).toArray
    require(ringBodies.nonEmpty, s"malformed (MULTI)POLYGON: $wkt")
    val rings = ringBodies.map { body =>
      val pts = body.split(",").map { p =>
        val xy = p.trim.split("\\s+")
        require(xy.length == 2, s"bad vertex '$p'")
        (xy(0).toDouble, xy(1).toDouble)
      }
      require(pts.length >= 4, s"ring needs >= 4 vertices (closed): $wkt")
      require(pts.head == pts.last, s"WKT ring must be closed: $wkt")
      pts.dropRight(1) // engine's open-ring convention
    }
    val ringStarts = rings.scanLeft(0)(_ + _.length).dropRight(1)
    val all = rings.flatten
    Polygon(id, all.map(_._1), all.map(_._2), ringStarts)
  }

  /** S6 — the reference's ACTUAL vector format: an ESRI shapefile
    * (`readOGR`, R:884,893). The .shp main file is scanned distributed
    * (binaryFile rows, one per file), parsed by the pure-JVM Shp codec
    * on executors, and collected to the packed Polygons the PIP
    * expression broadcasts — bounded by the same dimension-size budget
    * as wktPolygons. regionId = record number (the layer FID). */
  def shpPolygons(spark: SparkSession, path: String): Array[Polygon] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap(Shp.parse(_))
      .collect()
      .sortBy(_.regionId)
  }

  /** Shapefile layer with region ids taken from a NUMERIC column of the
    * sidecar .dbf attribute table (what readOGR exposes as the layer's
    * data frame) instead of the record-number FID. `path` must name a
    * single `.shp` whose sibling `.dbf` sits beside it; dbf records
    * align with .shp records by order (the shapefile spec's contract). */
  def shpPolygonsWithAttr(spark: SparkSession, path: String,
      idColumn: String): Array[Polygon] = {
    import spark.implicits._
    require(path.endsWith(".shp"), s"expected a single .shp path: $path")
    def bytesOf(p: String): Array[Byte] =
      spark.read.format("binaryFile").load(p)
        .select("content").as[Array[Byte]].head()
    val polys = Shp.parse(bytesOf(path))
    val ids = Shp.dbfColumn(bytesOf(path.stripSuffix("shp") + "dbf"),
      idColumn)
    polys.map { p =>
      require(p.regionId >= 1 && p.regionId <= ids.length,
        s".shp record ${p.regionId} has no .dbf row")
      val id = ids(p.regionId - 1).getOrElse(
        sys.error(s".dbf row ${p.regionId} is deleted or null in $idColumn"))
      // region ids feed the -1-sentinel PIP and Int-keyed joins: refuse
      // values a silent toInt truncation would wrap or collide
      require(id >= 0 && id <= Int.MaxValue,
        s".dbf $idColumn value $id is outside the valid region-id " +
          "range [0, Int.MaxValue]")
      p.copy(regionId = id.toInt)
    }.sortBy(_.regionId).tap { remapped =>
      // duplicate .dbf ids would make the PIP layer ambiguous (lowest-id
      // tie-break silently picks a winner between two DIFFERENT shapes)
      // — fail loudly naming the colliding attribute value instead
      val dups = remapped.groupBy(_.regionId).filter(_._2.length > 1).keys
      require(dups.isEmpty,
        s".dbf $idColumn has duplicate region ids: ${dups.mkString(",")}")
    }
  }

  /** Discover the variable manifest from a directory: non-recursive,
    * `suffix`-filtered, sorted by file name; variable name = file name
    * minus `prefix` and `suffix`. Returns (varName, absolutePath) in
    * column order. */
  def manifest(dir: String, prefix: String = "Goode_",
      suffix: String = ".tif"): Seq[(String, String)] = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
    files.filter(f => f.isFile && f.getName.endsWith(suffix))
      .map(_.getName).sorted
      .map { n =>
        val name = n.stripSuffix(suffix).stripPrefix(prefix)
        (name, new File(dir, n).getAbsolutePath)
      }.toSeq
  }
}
