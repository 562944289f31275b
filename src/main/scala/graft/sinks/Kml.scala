package graft.sinks

import graft.core.{Igh, Polygon}

/** KML polygon export with CRS reprojection (SURVEY.md §2.2 K4): the
  * reference's commented tail reprojects the region shapefile from
  * `+proj=igh` to lon/lat and writes KML (`Supplemental_Data_1.R:884-912`,
  * `spTransform` + `writeOGR(driver="KML")`). Here the transform is the
  * engine's own Goode inverse (pure math, the same code the GridH3
  * expression uses) and the sink is a direct serializer — no GDAL.
  */
object Kml {

  /** Serialize polygons to KML. `toXY` maps polygon coordinates into
    * igh meters (identity if they already are); vertices then reproject
    * through the interrupted-Goode inverse to lon/lat. */
  def render(polys: Seq[Polygon],
      toXY: (Double, Double) => (Double, Double) = (x, y) => (x, y)): String = {
    val placemarks = polys.map { p =>
      // ring 0 is the outer boundary, later rings are inner (KML's
      // outer/inner distinction; the engine's even-odd ray-cast is
      // orientation-free, so ring order carries the roles)
      def ringCoords(r: Int): String = {
        val (s, e) = p.ringRange(r)
        ((s until e) :+ s).map { i => // closed ring
          val (mx, my) = toXY(p.xs(i), p.ys(i))
          val (lon, lat) = Igh.inverse(mx, my)
          f"$lon%.8f,$lat%.8f,0"
        }.mkString(" ")
      }
      val outer =
        s"""<outerBoundaryIs><LinearRing><coordinates>
           |        ${ringCoords(0)}
           |      </coordinates></LinearRing></outerBoundaryIs>""".stripMargin
      val inners = (1 until p.nRings).map { r =>
        s"""<innerBoundaryIs><LinearRing><coordinates>
           |        ${ringCoords(r)}
           |      </coordinates></LinearRing></innerBoundaryIs>""".stripMargin
      }
      s"""    <Placemark>
         |      <name>region_${p.regionId}</name>
         |      <Polygon>${(outer +: inners).mkString}</Polygon>
         |    </Placemark>""".stripMargin
    }.mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<kml xmlns="http://www.opengis.net/kml/2.2">
       |  <Document>
       |$placemarks
       |  </Document>
       |</kml>
       |""".stripMargin
  }

  def write(path: String, polys: Seq[Polygon],
      toXY: (Double, Double) => (Double, Double) = (x, y) => (x, y)): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      render(polys, toXY))
}
