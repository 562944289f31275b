package graft.sources

import graft.core.Polygon

/** GeoJSON (RFC 7946) polygon-layer codec — the third vector boundary
  * format beside WKT (`Ingest.wktPolygons`) and ESRI shapefile
  * (`Shp`): the interchange format a modern pipeline receives region
  * boundaries in (the reference's layers arrive as shapefiles/KML,
  * `Supplemental_Data_1.R:884,893`; GeoJSON is their web-era sibling).
  *
  * Supported subset (the boundary-layer shape): a `FeatureCollection`
  * whose features carry a numeric `region_id` property and a `Polygon`
  * or `MultiPolygon` geometry. Rings follow the RFC: each linear ring
  * is CLOSED (first position repeated last) — the decoder drops the
  * closing vertex because [[Polygon]] stores open rings and wraps edges
  * itself. A MultiPolygon's parts flatten into one multi-ring
  * [[Polygon]] exactly like `Shp.parse` flattens multi-part records
  * (the even-odd ray-cast handles disjoint islands and holes
  * uniformly). Ring orientation is NOT required — even-odd semantics
  * are orientation-free, so non-RFC winding still decodes correctly.
  *
  * The parser is a self-contained recursive-descent JSON reader (the
  * `Shp` discipline: no library dependency, loud failures with context)
  * covering the full JSON grammar — whitespace, nesting, escapes,
  * signed/exponent numbers — then an interpreter over the generic tree.
  */
object GeoJson {

  // ---- generic JSON tree ----------------------------------------------------

  private sealed trait J
  private final case class JObj(fields: Map[String, J]) extends J
  private final case class JArr(items: Vector[J]) extends J
  private final case class JStr(s: String) extends J
  private final case class JNum(d: Double) extends J
  private final case class JBool(b: Boolean) extends J
  private case object JNull extends J

  private final class Parser(s: String) {
    private var i = 0
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"GeoJSON parse error at offset $i: $msg " +
          s"(near '${s.slice(i, math.min(i + 20, s.length))}')")
    private def ws(): Unit =
      while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    private def peek(): Char = { ws(); if (i >= s.length) fail("eof"); s.charAt(i) }

    def value(): J = peek() match {
      case '{' => obj()
      case '[' => arr()
      case '"' => JStr(str())
      case 't' => lit("true"); JBool(true)
      case 'f' => lit("false"); JBool(false)
      case 'n' => lit("null"); JNull
      case _ => num()
    }
    def parseDocument(): J = {
      val v = value(); ws()
      if (i != s.length) fail("trailing content")
      v
    }
    private def lit(l: String): Unit =
      if (s.startsWith(l, i)) i += l.length else fail(s"expected $l")
    private def obj(): JObj = {
      expect('{')
      if (peek() == '}') { i += 1; return JObj(Map.empty) }
      val b = Map.newBuilder[String, J]
      var go = true
      while (go) {
        ws(); val k = str(); expect(':'); b += k -> value(); ws()
        if (peek() == ',') i += 1 else go = false
      }
      expect('}')
      JObj(b.result())
    }
    private def arr(): JArr = {
      expect('[')
      if (peek() == ']') { i += 1; return JArr(Vector.empty) }
      val b = Vector.newBuilder[J]
      var go = true
      while (go) {
        b += value(); ws()
        if (peek() == ',') i += 1 else go = false
      }
      expect(']')
      JArr(b.result())
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) fail("dangling escape")
          s.charAt(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              if (i + 4 >= s.length) fail("truncated \\u escape")
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case e => fail(s"bad escape \\$e")
          }
        } else sb += c
        i += 1
      }
      expect('"')
      sb.toString
    }
    private def num(): JNum = {
      val start = i
      if (peek() == '-') i += 1
      while (i < s.length && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i))))
        i += 1
      if (i == start) fail("expected a value")
      JNum(java.lang.Double.parseDouble(s.substring(start, i)))
    }
  }

  // ---- GeoJSON interpretation ----------------------------------------------

  private def field(o: J, name: String): J = o match {
    case JObj(f) => f.getOrElse(name,
      throw new IllegalArgumentException(s"GeoJSON: missing '$name'"))
    case _ => throw new IllegalArgumentException(s"GeoJSON: '$name' on non-object")
  }
  private def asArr(j: J, what: String): Vector[J] = j match {
    case JArr(v) => v
    case _ => throw new IllegalArgumentException(s"GeoJSON: $what must be an array")
  }
  private def asNum(j: J, what: String): Double = j match {
    case JNum(d) => d
    case _ => throw new IllegalArgumentException(s"GeoJSON: $what must be a number")
  }
  private def asStr(j: J, what: String): String = j match {
    case JStr(v) => v
    case _ => throw new IllegalArgumentException(s"GeoJSON: $what must be a string")
  }

  /** One linear ring: closed per RFC 7946 — validated, then the closing
    * vertex dropped (Polygon wraps edges itself). */
  private def ring(j: J): (Array[Double], Array[Double]) = {
    val pts = asArr(j, "ring").map { p =>
      val xy = asArr(p, "position")
      require(xy.length >= 2, "GeoJSON: position needs 2 coordinates")
      (asNum(xy(0), "x"), asNum(xy(1), "y"))
    }
    require(pts.length >= 4, s"GeoJSON: ring needs >= 4 positions, got ${pts.length}")
    require(pts.head == pts.last,
      "GeoJSON: ring is not closed (first position must repeat last)")
    val open = pts.dropRight(1)
    (open.map(_._1).toArray, open.map(_._2).toArray)
  }

  /** Decode a FeatureCollection document into a region polygon layer,
    * sorted by region id. */
  def decode(text: String): Array[Polygon] = {
    val doc = new Parser(text).parseDocument()
    require(asStr(field(doc, "type"), "type") == "FeatureCollection",
      "GeoJSON: expected a FeatureCollection")
    val feats = asArr(field(doc, "features"), "features")
    require(feats.nonEmpty, "GeoJSON: empty FeatureCollection")
    feats.map { f =>
      val rid = asNum(field(field(f, "properties"), "region_id"),
        "region_id").toInt
      val geom = field(f, "geometry")
      val coords = field(geom, "coordinates")
      val rings: Vector[(Array[Double], Array[Double])] =
        asStr(field(geom, "type"), "geometry type") match {
          case "Polygon" => asArr(coords, "coordinates").map(ring)
          case "MultiPolygon" =>
            asArr(coords, "coordinates").flatMap(p => asArr(p, "polygon").map(ring))
          case t => throw new IllegalArgumentException(
            s"GeoJSON: unsupported geometry type '$t'")
        }
      val starts = rings.scanLeft(0)(_ + _._1.length).dropRight(1)
      Polygon(rid, rings.flatMap(_._1).toArray, rings.flatMap(_._2).toArray,
        starts.toArray)
    }.sortBy(_.regionId).toArray
  }

  /** Encode a polygon layer as a FeatureCollection: every region is one
    * `Polygon` geometry carrying ALL its rings (ring 2+ in the RFC's
    * hole position), closed per the RFC. Honesty note: [[Polygon]] is
    * an even-odd ring set and does not distinguish holes from disjoint
    * islands, so an archipelago region encodes as a "Polygon" whose
    * later rings sit outside the exterior — even-odd readers (this
    * decoder, the engine's ray-cast) recover identical semantics, but
    * the codec is a layer TRANSPORT, not a topology-preserving RFC
    * writer; the `MultiPolygon` decode path is exercised by
    * hand-written documents in IngestSinkSpec. */
  def encode(polys: Array[Polygon]): String = {
    require(polys.nonEmpty, "GeoJson.encode: empty layer (refusing to " +
      "write a boundary file with no boundaries)")
    def ringStr(p: Polygon, r: Int): String = {
      val (s, e) = p.ringRange(r)
      val pts = (s until e).map(i => s"[${p.xs(i)},${p.ys(i)}]") :+
        s"[${p.xs(s)},${p.ys(s)}]"
      pts.mkString("[", ",", "]")
    }
    val feats = polys.map { p =>
      val rings = (0 until p.nRings).map(r => ringStr(p, r)).mkString(",")
      s"""{"type":"Feature","properties":{"region_id":${p.regionId}},""" +
        s""""geometry":{"type":"Polygon","coordinates":[$rings]}}"""
    }
    s"""{"type":"FeatureCollection","features":[${feats.mkString(",")}]}"""
  }
}
