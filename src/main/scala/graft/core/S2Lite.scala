package graft.core

/** S2 cell ids (the second half of the north rule's "H3/S2 index",
  * SURVEY.md §2.8 G1) — a from-scratch implementation of the publicly
  * documented S2 geometry cell-id scheme: the unit sphere is projected
  * onto the six faces of a cube, each face carries a quadratic (s,t)
  * reparameterization that roughly equalizes cell areas, and cells at
  * level k are the k-th subdivision of a face walked in Hilbert-curve
  * order so that numerically close ids are spatially close (the
  * property that makes the id a good range-partitioning key).
  *
  * Id layout follows the public spec exactly (64 bits, unsigned):
  * [face:3][curve position:2*level][1][zeros] — the lone trailing 1 bit
  * marks the level, so `parent` is pure bit math and ids of nested
  * cells share a prefix. Faces 4 and 5 have bit 63 set; interpreted as
  * a signed Long (Spark's LongType) those ids are negative, which is
  * the standard convention when S2 ids ride in int64 columns.
  *
  * Everything here is from the public S2 documentation/source
  * (s2geometry.io, s2coords.h, s2cell_id.cc): the face UV axes, the
  * quadratic ST transform, and the four Hilbert orientation lookup
  * tables. No S2 jar exists in the sandbox; the DuckDB oracle of
  * q67/q68 re-implements this same math as a recursive CTE, giving an
  * independent cross-check of both the tables and the projection.
  */
object S2Lite {
  val MaxLevel = 30

  // Hilbert curve lookup tables (s2cell_id.cc). Orientation is a 2-bit
  // state: bit 0 = swap i/j (kSwapMask), bit 1 = invert both
  // (kInvertMask). PosToIJ(o)(p) = the ij quadrant (i<<1|j) the curve
  // visits at position p under orientation o; IJToPos is its inverse;
  // PosToOrientation(p) XORs into the orientation when descending into
  // position p.
  private val PosToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), // canonical order
    Array(0, 2, 3, 1), // axes swapped
    Array(3, 2, 0, 1), // bits inverted
    Array(3, 1, 0, 2)) // swapped & inverted
  private val IJToPos: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2),
    Array(0, 3, 1, 2),
    Array(2, 3, 1, 0),
    Array(2, 1, 3, 0))
  private val PosToOrientation: Array[Int] = Array(1, 0, 0, 3)

  private val DegToRad = math.Pi / 180.0

  /** The lone set bit marking a level-`level` id. */
  @inline def lsbForLevel(level: Int): Long = 1L << (2 * (MaxLevel - level))

  @inline def level(id: Long): Int =
    MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  @inline def face(id: Long): Int = ((id >>> 61) & 0x7L).toInt

  /** Valid ids have face < 6 and their lone level-marker bit at an even
    * position (the public spec's validity rule). */
  @inline def isValid(id: Long): Boolean =
    face(id) < 6 && (java.lang.Long.lowestOneBit(id) & 0x1555555555555555L) != 0

  /** Hilbert-encode (face, i, j) at `level` into a cell id. Initial
    * orientation is `face & 1` (kSwapMask), which chains the six face
    * curves into one continuous closed curve over the sphere. */
  def fromFaceIJ(f: Int, i: Int, j: Int, lvl: Int): Long = {
    require(f >= 0 && f < 6, s"face $f out of [0,6)")
    require(lvl >= 0 && lvl <= MaxLevel, s"level $lvl out of [0,$MaxLevel]")
    require(i >= 0 && i < (1 << lvl) && j >= 0 && j < (1 << lvl),
      s"ij ($i,$j) out of [0,2^$lvl)")
    var o = f & 1
    var pos = 0L
    var b = lvl - 1
    while (b >= 0) {
      val ij = (((i >> b) & 1) << 1) | ((j >> b) & 1)
      val p = IJToPos(o)(ij)
      pos = (pos << 2) | p
      o ^= PosToOrientation(p)
      b -= 1
    }
    (f.toLong << 61) | (pos << (2 * (MaxLevel - lvl) + 1)) | lsbForLevel(lvl)
  }

  /** Inverse of fromFaceIJ: id -> (face, i, j, level). */
  def toFaceIJ(id: Long): (Int, Int, Int, Int) = {
    val lvl = level(id)
    val f = face(id)
    val pos =
      if (lvl == 0) 0L
      else (id >>> (2 * (MaxLevel - lvl) + 1)) & ((1L << (2 * lvl)) - 1)
    var o = f & 1
    var i = 0
    var j = 0
    var b = lvl - 1
    while (b >= 0) {
      val p = ((pos >>> (2 * b)) & 3L).toInt
      val ij = PosToIJ(o)(p)
      i = (i << 1) | (ij >> 1)
      j = (j << 1) | (ij & 1)
      o ^= PosToOrientation(p)
      b -= 1
    }
    (f, i, j, lvl)
  }

  /** Ancestor of `id` at coarser `toLevel` (pure bit math: clear the
    * position bits below the new level marker, set the marker). */
  def parent(id: Long, toLevel: Int): Long = {
    require(toLevel >= 0 && toLevel <= level(id),
      s"parent level $toLevel finer than id level ${level(id)}")
    val lsb = lsbForLevel(toLevel)
    (id & -lsb) | lsb
  }

  /** Quadratic UV -> ST (the area-equalizing reparameterization). */
  @inline def uvToSt(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1.0 + 3.0 * u)
    else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)

  /** Inverse of uvToSt. */
  @inline def stToUv(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4.0 * s * s - 1.0)
    else (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))

  /** lat/lng (degrees) -> cell id at `level`. The face pick and the UV
    * formulas mirror s2coords.h (GetFace / ValidFaceXYZtoUV) exactly,
    * including tie-break order, so the SQL oracle can reproduce them
    * term for term. */
  def encode(latDeg: Double, lngDeg: Double, lvl: Int): Long = {
    require(lvl >= 0 && lvl <= MaxLevel, s"level $lvl out of [0,$MaxLevel]")
    require(latDeg >= -90.0 && latDeg <= 90.0, // also rejects NaN
      s"latitude $latDeg out of [-90, 90]")
    require(java.lang.Double.isFinite(lngDeg),
      s"longitude $lngDeg is not finite")
    val phi = latDeg * DegToRad
    val lam = lngDeg * DegToRad
    val cosPhi = math.cos(phi)
    val x = cosPhi * math.cos(lam)
    val y = cosPhi * math.sin(lam)
    val z = math.sin(phi)
    val (f, u, v) = xyzToFaceUv(x, y, z)
    val m = 1 << lvl
    val i = math.min(m - 1, math.max(0, math.floor(uvToSt(u) * m).toInt))
    val j = math.min(m - 1, math.max(0, math.floor(uvToSt(v) * m).toInt))
    fromFaceIJ(f, i, j, lvl)
  }

  /** Face axes: (u, v) on `face` -> xyz direction (not normalized),
    * inverting the ValidFaceXYZtoUV formulas per face. */
  private def faceUvToXyz(f: Int, u: Double, v: Double): (Double, Double, Double) =
    f match {
      case 0 => (1.0, u, v)
      case 1 => (-u, 1.0, v)
      case 2 => (-u, -v, 1.0)
      case 3 => (-1.0, -v, -u)
      case 4 => (v, -1.0, -u)
      case 5 => (v, u, -1.0)
    }

  /** xyz -> (face, u, v), same face pick + UV formulas as encode.
    * private[core] so the oracle guard-band test can measure how far
    * each fixture point's s*m / t*m sits from a floor boundary. */
  private[core] def xyzToFaceUv(x: Double, y: Double, z: Double): (Int, Double, Double) = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val axis = if (ax > ay) { if (ax > az) 0 else 2 }
               else { if (ay > az) 1 else 2 }
    val comp = if (axis == 0) x else if (axis == 1) y else z
    val f = if (comp < 0) axis + 3 else axis
    val u = f match {
      case 0 => y / x
      case 1 => -x / y
      case 2 => -x / z
      case 3 => z / x
      case 4 => z / y
      case 5 => -y / z
    }
    val v = f match {
      case 0 => z / x
      case 1 => z / y
      case 2 => -y / z
      case 3 => y / x
      case 4 => -x / y
      case 5 => -x / z
    }
    (f, u, v)
  }

  private val LeafSize = 1 << MaxLevel // 2^30

  /** Leaf-coordinate neighbor that may fall off the face: relocate
    * (face, i, j) with i or j just outside [0, 2^30) onto the adjacent
    * face (the public FromFaceIJWrap algorithm — the linear ST<->UV
    * projection is an identity on the in-range axis, so only the
    * crossing axis moves). Returns a LEAF id. */
  private def fromLeafIJWrap(f: Int, i0: Int, j0: Int): Long = {
    val i = math.max(-1, math.min(LeafSize, i0))
    val j = math.max(-1, math.min(LeafSize, j0))
    val scale = 1.0 / LeafSize
    val limit = 1.0 + java.lang.Math.ulp(1.0)
    val u = math.max(-limit, math.min(limit,
      scale * (2.0 * (i - LeafSize / 2) + 1.0)))
    val v = math.max(-limit, math.min(limit,
      scale * (2.0 * (j - LeafSize / 2) + 1.0)))
    val (x, y, z) = faceUvToXyz(f, u, v)
    val (nf, nu, nv) = xyzToFaceUv(x, y, z)
    def stToLeaf(s: Double): Int =
      math.max(0, math.min(LeafSize - 1, math.floor(s * LeafSize).toInt))
    fromFaceIJ(nf, stToLeaf(0.5 * (nu + 1.0)), stToLeaf(0.5 * (nv + 1.0)),
      MaxLevel)
  }

  /** The four edge-adjacent cells at the same level (down, right, up,
    * left in (i,j) terms), crossing cube-face boundaries where needed —
    * the S2 counterpart of H3Lite.kRing for neighbor joins. */
  def edgeNeighbors(id: Long): Array[Long] = {
    val (f, i, j, lvl) = toFaceIJ(id)
    val shift = MaxLevel - lvl
    val size = 1 << shift
    val li = i << shift
    val lj = j << shift
    val m = 1 << lvl
    def same(ni: Int, nj: Int): Long = fromFaceIJ(f, ni, nj, lvl)
    def wrap(ni: Int, nj: Int): Long = parent(fromLeafIJWrap(f, ni, nj), lvl)
    Array(
      if (j - 1 >= 0) same(i, j - 1) else wrap(li, lj - size),
      if (i + 1 < m) same(i + 1, j) else wrap(li + size, lj),
      if (j + 1 < m) same(i, j + 1) else wrap(li, lj + size),
      if (i - 1 >= 0) same(i - 1, j) else wrap(li - size, lj))
  }

  /** Center of the cell, as (latDeg, lngDeg) — the inverse path
    * (ij -> st center -> uv -> face xyz -> lat/lng), used by tests to
    * pin encode/decode consistency. */
  def centroid(id: Long): (Double, Double) = {
    val (f, i, j, lvl) = toFaceIJ(id)
    val m = (1 << lvl).toDouble
    val u = stToUv((i + 0.5) / m)
    val v = stToUv((j + 0.5) / m)
    val (x, y, z) = faceUvToXyz(f, u, v)
    val lat = math.atan2(z, math.sqrt(x * x + y * y)) / DegToRad
    val lng = math.atan2(y, x) / DegToRad
    (lat, lng)
  }
}
