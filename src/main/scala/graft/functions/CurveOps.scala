package graft.functions

/** Space-filling-curve kernels shared by the interpreted `eval` and the
  * generated code of [[InterleaveBits]] and [[HilbertIndex]] — a Scala
  * object compiles to static forwarders, so whole-stage-generated Java
  * calls these directly (`CurveOps.hilbertN(...)`) and the JIT inlines
  * them; interpreted and codegen paths are bit-identical by
  * construction because they run the SAME method.
  *
  * Two formulations:
  *  - 2-D: the classic quadrant-rotation walk (fixed order-31 frame,
  *    kept verbatim from the original binary expression so existing
  *    layouts/specs are stable).
  *  - n-D (n ≥ 2 generally, used for n ≥ 3): Skilling's transpose
  *    algorithm ("Programming the Hilbert curve", AIP Conf. Proc. 707,
  *    2004) — Gray-decode + bit-exchange sweep turning n axis values of
  *    `bpd` bits each into the transposed Hilbert coordinate, then an
  *    MSB-first interleave packs the transpose into one `n·bpd`-bit
  *    distance. All-integer, loop-only, allocation-free beyond the
  *    caller's coordinate array.
  */
object CurveOps {

  /** Order-31 2-D Hilbert distance via quadrant rotation; inputs must be
    * pre-masked to 31 bits. */
  def hilbert2(x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << 30
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** n-D Hilbert distance (Skilling): `xs` holds one `bpd`-bit axis
    * value per dimension and is DESTROYED in place (callers pass a
    * per-row scratch array). Returns the `xs.length·bpd`-bit curve
    * distance; sorting by it gives the Hilbert traversal order of the
    * n-cube — unit-Manhattan-step adjacency, every dyadic subcube one
    * contiguous index interval (HilbertIndexSpec pins both for n=3). */
  def hilbertN(bpd: Int, xs: Array[Long]): Long = {
    val n = xs.length
    val m = 1L << (bpd - 1)
    // Inverse-undo sweep: high bit to low, exchange/invert low bits so
    // each level's octant is expressed in its canonical orientation.
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((xs(i) & q) != 0) xs(0) ^= p
        else { val t = (xs(0) ^ xs(i)) & p; xs(0) ^= t; xs(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray-encode across dimensions.
    var i = 1
    while (i < n) { xs(i) ^= xs(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((xs(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { xs(i) ^= t; i += 1 }
    // Transpose → distance: MSB-first bit interleave, dimension 0 on the
    // highest bit of each group.
    var d = 0L
    var b = bpd - 1
    while (b >= 0) {
      var j = 0
      while (j < n) { d = (d << 1) | ((xs(j) >> b) & 1L); j += 1 }
      b -= 1
    }
    d
  }

  /** n-D Morton (Z-order) distance: MSB-first interleave of `bpd`-bit
    * axis values, dimension 0 on the highest bit of each group — for
    * n=2 / bpd=31 this is bit-identical to the original two-int
    * interleave (x on the odd bits). */
  def mortonN(bpd: Int, xs: Array[Long]): Long = {
    val n = xs.length
    var z = 0L
    var b = bpd - 1
    while (b >= 0) {
      var j = 0
      while (j < n) { z = (z << 1) | ((xs(j) >> b) & 1L); j += 1 }
      b -= 1
    }
    z
  }
}
