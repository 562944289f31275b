package graft.core

import org.scalatest.funsuite.AnyFunSuite

class S2Spec extends AnyFunSuite with SeededChecks {
  import S2Lite._

  test("fromFaceIJ <-> toFaceIJ round-trip at all levels") {
    for (lvl <- Seq(0, 1, 5, 10, 17, 30)) {
      checkN(300) { r =>
        val m = 1 << lvl
        (r.nextInt(6), r.nextInt(m), r.nextInt(m))
      } { case (f, i, j) =>
        val id = fromFaceIJ(f, i, j, lvl)
        assert(isValid(id))
        assert(level(id) == lvl)
        assert(face(id) == f)
        assert(toFaceIJ(id) == ((f, i, j, lvl)))
      }
    }
  }

  test("Hilbert curve is continuous within a face: consecutive " +
    "positions are ij-adjacent") {
    val lvl = 6
    val m = 1 << lvl
    for (f <- 0 until 6) {
      // walk the whole face in pos order via toFaceIJ of consecutive ids
      val lsb = lsbForLevel(lvl)
      var prev: (Int, Int) = null
      var pos = 0L
      while (pos < m.toLong * m) {
        val id = (f.toLong << 61) | (pos << (2 * (MaxLevel - lvl) + 1)) | lsb
        val (_, i, j, _) = toFaceIJ(id)
        if (prev != null)
          assert(math.abs(i - prev._1) + math.abs(j - prev._2) == 1,
            s"face $f pos $pos jumped from $prev to ($i,$j)")
        prev = (i, j)
        pos += 1
      }
    }
  }

  test("the face-chained curve is continuous ACROSS faces (the reason " +
    "initial orientation is face & 1): last cell of face f touches " +
    "first cell of face f+1, closing into one loop over the sphere") {
    val lvl = 6
    val m = 1 << lvl
    def xyzOf(id: Long): (Double, Double, Double) = {
      val (lat, lng) = centroid(id)
      val phi = math.toRadians(lat); val lam = math.toRadians(lng)
      (math.cos(phi) * math.cos(lam), math.cos(phi) * math.sin(lam),
        math.sin(phi))
    }
    // max centroid gap between in-face consecutive cells = the scale bar
    var inFaceMax = 0.0
    for (pos <- 0L until (m.toLong * m - 1)) {
      val a = (0L << 61) | (pos << (2 * (MaxLevel - lvl) + 1)) | lsbForLevel(lvl)
      val b = (0L << 61) | ((pos + 1) << (2 * (MaxLevel - lvl) + 1)) | lsbForLevel(lvl)
      val (x1, y1, z1) = xyzOf(a); val (x2, y2, z2) = xyzOf(b)
      val d = math.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2) +
        (z1 - z2) * (z1 - z2))
      inFaceMax = math.max(inFaceMax, d)
    }
    for (f <- 0 until 6) {
      val lastPos = m.toLong * m - 1
      val last = (f.toLong << 61) | (lastPos << (2 * (MaxLevel - lvl) + 1)) |
        lsbForLevel(lvl)
      val nf = (f + 1) % 6
      val next = (nf.toLong << 61) | lsbForLevel(lvl)
      val (x1, y1, z1) = xyzOf(last); val (x2, y2, z2) = xyzOf(next)
      val d = math.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2) +
        (z1 - z2) * (z1 - z2))
      assert(d <= inFaceMax * 1.5,
        s"curve breaks between face $f and face $nf: gap $d vs in-face max $inFaceMax")
    }
  }

  test("parent: shared prefix, ij truncation, level marker") {
    checkN(500) { r =>
      val lvl = 2 + r.nextInt(29)
      val m = 1 << lvl
      (r.nextInt(6), r.nextInt(m), r.nextInt(m), lvl)
    } { case (f, i, j, lvl) =>
      val id = fromFaceIJ(f, i, j, lvl)
      val up = 1 + (i % (lvl - 1)) // some coarser level in [1, lvl-1]
      val p = parent(id, lvl - up)
      assert(level(p) == lvl - up)
      assert(toFaceIJ(p) == ((f, i >> up, j >> up, lvl - up)))
      // prefix property: p and id agree above p's marker bit
      val lsb = lsbForLevel(lvl - up)
      assert((id & -(lsb << 1)) == (p & -(lsb << 1)))
    }
  }

  test("encode lands on the expected face at the axis points") {
    assert(face(encode(0, 0, 10)) == 0)
    assert(face(encode(0, 90, 10)) == 1)
    assert(face(encode(90, 0, 10)) == 2)
    assert(face(encode(0, 180, 10)) == 3)
    assert(face(encode(0, -90, 10)) == 4)
    assert(face(encode(-90, 0, 10)) == 5)
    // level-0 ids are face << 61 | 1 << 60; faces 4/5 negative as signed
    val axisPoints = Seq((0.0, 0.0), (0.0, 90.0), (90.0, 0.0),
      (0.0, 180.0), (0.0, -90.0), (-90.0, 0.0))
    for ((f, (lat, lng)) <- axisPoints.zipWithIndex.map(_.swap))
      assert(parent(encode(lat, lng, 10), 0) == ((f.toLong << 61) | (1L << 60)))
    assert(encode(0, -90, 10) < 0 && encode(-90, 0, 10) < 0)
  }

  test("encode/centroid stability: the cell center re-encodes to the " +
    "same cell") {
    for (lvl <- Seq(4, 10, 16)) {
      checkN(400) { r =>
        (r.nextDouble() * 180 - 90, r.nextDouble() * 360 - 180)
      } { case (lat, lng) =>
        val id = encode(lat, lng, lvl)
        val (clat, clng) = centroid(id)
        assert(encode(clat, clng, lvl) == id,
          s"center of ($lat,$lng)@L$lvl drifted to another cell")
      }
    }
  }

  test("loud contracts: NaN / out-of-range inputs are refused, not " +
    "silently encoded") {
    intercept[IllegalArgumentException](encode(Double.NaN, 0, 10))
    intercept[IllegalArgumentException](encode(0, Double.NaN, 10))
    intercept[IllegalArgumentException](encode(100.0, 0, 10))
    intercept[IllegalArgumentException](encode(0, Double.PositiveInfinity, 10))
    intercept[IllegalArgumentException](encode(0, 0, 31))
    // lng is periodic: any finite value is legal and wraps onto the
    // same cell (level 2 keeps the comparison far from any boundary)
    assert(isValid(encode(0, 540.0, 10)))
    assert(encode(0, 390.0, 2) == encode(0, 30.0, 2))
    intercept[IllegalArgumentException](parent(encode(0, 0, 4), 10))
  }

  test("uvToSt/stToUv are inverse and monotone") {
    checkN(1000)(r => r.nextDouble() * 2 - 1) { u =>
      val s = uvToSt(u)
      assert(s >= 0 && s <= 1)
      assert(math.abs(stToUv(s) - u) < 1e-14)
    }
    assert(uvToSt(-1) == 0.0 && uvToSt(1) == 1.0 && uvToSt(0) == 0.5)
  }

  test("edgeNeighbors: interior cells get ij+-1; all neighbors distinct, " +
    "valid, same level") {
    checkN(300) { r =>
      val lvl = 2 + r.nextInt(12)
      val m = 1 << lvl
      // interior: 1..m-2 on both axes
      (r.nextInt(6), 1 + r.nextInt(m - 2), 1 + r.nextInt(m - 2), lvl)
    } { case (f, i, j, lvl) =>
      val id = fromFaceIJ(f, i, j, lvl)
      val nbrs = edgeNeighbors(id)
      assert(nbrs.length == 4 && nbrs.distinct.length == 4)
      assert(nbrs.forall(n => isValid(n) && level(n) == lvl))
      assert(nbrs.toSet == Set(
        fromFaceIJ(f, i, j - 1, lvl), fromFaceIJ(f, i + 1, j, lvl),
        fromFaceIJ(f, i, j + 1, lvl), fromFaceIJ(f, i - 1, j, lvl)))
    }
  }

  test("edgeNeighbors across face boundaries: symmetric, geometrically " +
    "adjacent, never self") {
    def chord(a: Long, b: Long): Double = {
      def xyz(id: Long) = {
        val (lat, lng) = centroid(id)
        val phi = math.toRadians(lat); val lam = math.toRadians(lng)
        (math.cos(phi) * math.cos(lam), math.cos(phi) * math.sin(lam),
          math.sin(phi))
      }
      val (x1, y1, z1) = xyz(a); val (x2, y2, z2) = xyz(b)
      math.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2) +
        (z1 - z2) * (z1 - z2))
    }
    for (lvl <- Seq(1, 4, 8)) {
      val m = 1 << lvl
      // boundary cells: walk the full edge frame of every face
      for (f <- 0 until 6; k <- 0 until m;
           (i, j) <- Seq((k, 0), (k, m - 1), (0, k), (m - 1, k))) {
        val id = fromFaceIJ(f, i, j, lvl)
        val nbrs = edgeNeighbors(id)
        assert(nbrs.distinct.length == 4 && !nbrs.contains(id))
        // cell edge chord length ~ 2/m..4/m on the unit sphere; adjacency
        // means centroids sit within ~2 cell diagonals
        val bar = 6.0 / m
        for (n <- nbrs) {
          assert(chord(id, n) < bar, s"face $f ($i,$j)@L$lvl nbr too far")
          assert(edgeNeighbors(n).contains(id),
            s"face $f ($i,$j)@L$lvl neighbor relation not symmetric")
        }
      }
    }
    // level 0: each face's neighbors are the four non-opposite faces
    for (f <- 0 until 6) {
      val id0 = (f.toLong << 61) | (1L << 60)
      val got = edgeNeighbors(id0).map(face).toSet
      assert(got == (0 until 6).toSet - f - ((f + 3) % 6))
    }
  }

  test("spatial-locality of the id order (the partition-key property): " +
    "a run of consecutive ids covers a spatially connected patch") {
    // This is the direction Hilbert curves actually guarantee (close
    // ids -> close cells); the converse fails at curve seams, e.g. the
    // first/last-quadrant boundary of a face, where neighboring points
    // sit half the position range apart.
    val lvl = 12
    val m = 1 << lvl
    val posSpan = m.toLong * m
    val runLen = 16
    def xyz(id: Long): (Double, Double, Double) = {
      val (lat, lng) = centroid(id)
      val phi = math.toRadians(lat); val lam = math.toRadians(lng)
      (math.cos(phi) * math.cos(lam), math.cos(phi) * math.sin(lam),
        math.sin(phi))
    }
    // a level-lvl cell edge subtends ~pi/2 / m of arc; consecutive
    // centroids sit within ~2 edge lengths, a run within runLen of them
    val stepBar = 2.0 * (math.Pi / 2) / m
    checkN(200) { r =>
      (r.nextInt(6), (r.nextLong() & Long.MaxValue) % (posSpan - runLen))
    } { case (f, pos0) =>
      val ids = (0 until runLen).map(k =>
        (f.toLong << 61) | ((pos0 + k) << (2 * (MaxLevel - lvl) + 1)) |
          lsbForLevel(lvl))
      val pts = ids.map(xyz)
      for (((x, y, z), k) <- pts.zipWithIndex.drop(1)) {
        val (px, py, pz) = pts(k - 1)
        val step = math.sqrt((x - px) * (x - px) + (y - py) * (y - py) +
          (z - pz) * (z - pz))
        // per-step adjacency implies (triangle inequality) the whole
        // run stays within runLen * stepBar — connected patch
        assert(step <= stepBar, s"face $f pos ${pos0 + k}: step $step")
      }
    }
  }
}
