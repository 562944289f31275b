package graft.sql

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.{Codec, Geom, Polygon}

/** Custom Catalyst expressions for the operators Spark lacks
  * (SURVEY.md §2.11): tile decode (image bytes -> pixel array) and
  * ray-cast point-in-polygon. Both are stateless scalar expressions so
  * they live inside the Tungsten row pipeline; PIP additionally
  * generates Java code (the hot path of the spatial join).
  */

/** Decode one band of a tile payload to array<float>.
  * Children: (bytes: binary, fmt: string). nPixels/band are plan-time
  * constants. The reference's eager raster-to-vector read is
  * `Supplemental_Data_1.R:211,216-218`; here decoding happens per tile
  * row inside the scan projection so it pipelines into posexplode
  * without materializing whole rasters. */
case class DecodeBand(left: Expression, right: Expression,
    nPixels: Int, band: Int)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(bytes: Any, fmt: Any): Any = {
    val arr = Codec.decodeBand(fmt.asInstanceOf[UTF8String].toString,
      bytes.asInstanceOf[Array[Byte]], nPixels, band)
    ArrayData.toArrayData(arr)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Ray-cast point-in-polygon region lookup over a broadcast-style packed
  * polygon set (SURVEY.md §2.8 G3). Returns the lowest containing
  * region id, or null when no polygon contains the point (the reference
  * then drops the row, R:273-274).
  *
  * Generates branch-free-ish Java: polygons are embedded as static
  * primitive arrays referenced from the generated class, so the eval
  * loop stays inside whole-stage codegen.
  */
case class RegionOf(left: Expression, right: Expression, polys: Array[Polygon])
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(px: Any, py: Any): Any = {
    val r = Geom.regionOf(polys,
      px.asInstanceOf[Double], py.asInstanceOf[Double])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val polysRef = ctx.addReferenceObj("polys", polys,
      classOf[Polygon].getName + "[]")
    val geom = Geom.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (px, py) => {
      s"""
         |int r = $geom.regionOf($polysRef, $px, $py);
         |if (r < 0) { ${ev.isNull} = true; } else { ${ev.value} = r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn => column, toExpression => expression}

  /** Decode band `band` of an f32/png16 tile payload to array<float>. */
  def decode_band(bytes: Column, fmt: Column, nPixels: Int, band: Int): Column =
    column(DecodeBand(expression(bytes), expression(fmt), nPixels, band))

  /** Region id of point (px, py) among `polys`, null if none. */
  def region_of(px: Column, py: Column, polys: Array[Polygon]): Column =
    column(RegionOf(expression(px), expression(py), polys))
}
