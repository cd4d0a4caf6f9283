package graft

import graft.geom.Cells

/** DuckDB SQL fragment generators for the correctness oracles.
  *
  * The driver's gate re-executes `SparkEntry.oracleSql` in DuckDB and
  * hash-compares against the engine's parquet output. The geometry/engine
  * queries aren't expressible over the star-schema tables alone, so
  * `graft.Verify` dumps the SYNTH INPUTS (surfaces, anchored images,
  * triangles, signatures) as parquet under `<outDir>/inputs/`, and these
  * helpers generate plain-SQL recomputations — Morton cell encoding as bit
  * math, point-in-triangle as sign-of-cross tests, ring validity/area per
  * the reference formulas (polygon3dmodule.py:70-123, 245-261) — over
  * `read_parquet('<outDir>/inputs/…')`. The [[Out]] token is substituted
  * with the absolute outDir by Verify when it writes oracle_sql.json.
  *
  * Float discipline: every fragment mirrors the Spark expression tree
  * operation-for-operation (same literals, same association order), so
  * IEEE-754 doubles come out bit-identical; transcendentals (atan2, sqrt of
  * irrationals) are shielded by explicit round() on BOTH sides.
  */
object OracleSql {

  /** Token Verify replaces with the absolute output directory. */
  final val Out = "__OUT__"

  /** read_parquet reference to a dumped input table (Spark writes a
    * directory of part files — glob inside it).
    */
  def inp(name: String): String =
    s"read_parquet('$Out/inputs/$name.parquet/*.parquet')"

  // ---- Morton cell encoding (graft.geom.Cells, O-55) ----

  /** Bit-spread of the low 24 bits of `e` into even positions — the 5
    * shift-or-mask steps of Cells.spread, decimal masks (DuckDB has no hex
    * literals). Expression doubles per step: ~32 copies of `e`, fine for
    * machine-generated SQL.
    */
  def spread(e: String): String = {
    var v = s"(($e) & 16777215)"
    for ((sh, m) <- Seq((16, 281470681808895L), (8, 71777214294589695L),
      (4, 1085102592571150095L), (2, 3689348814741910323L),
      (1, 6148914691236517205L)))
      v = s"(($v | ($v << $sh)) & $m)"
    v
  }

  /** cell_id of point (x, y) at `level` — (level << 48) | morton(ix, iy),
    * identical to Cells.encode (clamp omitted: synth city is deep inside the
    * domain).
    */
  def cell(x: String, y: String, level: Int): String = {
    val size = Cells.sizeAt(level)
    val ix = s"CAST(floor(($x) / $size) AS BIGINT)"
    val iy = s"CAST(floor(($y) / $size) AS BIGINT)"
    s"((CAST($level AS BIGINT) << ${2 * Cells.MaxLevel}) | ${spread(ix)} | (${spread(iy)} << 1))"
  }

  // ---- point-in-triangle (Geom.pointInTri2D, O-38 refinement) ----

  /** Boundary-inclusive half-plane PIP over flattened triangle corner
    * columns (prefix e.g. "t."), replicating pointInTri2D's exact operand
    * order.
    */
  def pip(px: String, py: String, t: String): String = {
    val d1 = s"(($px - ${t}bx) * (${t}ay - ${t}by) - (${t}ax - ${t}bx) * ($py - ${t}by))"
    val d2 = s"(($px - ${t}cx) * (${t}by - ${t}cy) - (${t}bx - ${t}cx) * ($py - ${t}cy))"
    val d3 = s"(($px - ${t}ax) * (${t}cy - ${t}ay) - (${t}cx - ${t}ax) * ($py - ${t}ay))"
    s"NOT (($d1 < 0 OR $d2 < 0 OR $d3 < 0) AND ($d1 > 0 OR $d2 > 0 OR $d3 > 0))"
  }

  // ---- ring helpers (rings are LIST<STRUCT(x,y,z)>) ----

  /** Geom.cleanRing: first-occurrence dedup of the body (all points except
    * the last), closure re-appended verbatim.
    */
  def clean(r: String): String =
    s"list_append(list_filter(($r)[1:len($r)-1], (p,i) -> NOT list_contains(($r)[1:i-1], p)), ($r)[-1])"

  /** Ring with the closing point dropped when present (EarClip.open). */
  def open(r: String): String =
    s"(CASE WHEN len($r) > 1 AND ($r)[1] = ($r)[-1] THEN ($r)[1:len($r)-1] ELSE ($r) END)"

  /** unitNormal numerator components from the first three points of ring
    * column `r` — the three det3 Laplace expansions of Geom.unitNormal,
    * exact operand order. Emits "… AS <p>nx, … AS <p>ny, … AS <p>nz".
    */
  def normalCols(r: String, p: String = ""): String =
    normalColsPts(s"($r)[1]", s"($r)[2]", s"($r)[3]", p)

  /** [[normalCols]] over three explicit point expressions (struct-typed with
    * .x/.y/.z) — used when the corners are flat columns, e.g. the dumped
    * triangle table.
    */
  def normalColsPts(a: String, b: String, c: String, p: String = ""): String = {
    val nx = s"(1*(($b).y*($c).z - ($b).z*($c).y) - ($a).y*(1*($c).z - ($b).z*1) + ($a).z*(1*($c).y - ($b).y*1))"
    val ny = s"(($a).x*(1*($c).z - ($b).z*1) - 1*(($b).x*($c).z - ($b).z*($c).x) + ($a).z*(($b).x*1 - 1*($c).x))"
    val nz = s"(($a).x*(($b).y*1 - 1*($c).y) - ($a).y*(($b).x*1 - 1*($c).x) + 1*(($b).x*($c).y - ($b).y*($c).x))"
    s"$nx AS ${p}nx, $ny AS ${p}ny, $nz AS ${p}nz"
  }

  /** Raw (unnormalized) Newell-normal component over the OPENED ring column
    * `r` (Geom.newellNormal): left-to-right fold of the wraparound pair
    * terms, starting 0.0-equivalent (list_reduce from the first element —
    * 0.0 + v == v bit-exact). `f` ∈ {"x","y","z"}.
    */
  def newellRaw(r: String, f: String): String = {
    val b = open(r)
    val j = s"(CASE WHEN nw_i = len($b) THEN 1 ELSE nw_i + 1 END)"
    val term = f match {
      case "x" => s"(($b)[nw_i].y - ($b)[$j].y) * (($b)[nw_i].z + ($b)[$j].z)"
      case "y" => s"(($b)[nw_i].z - ($b)[$j].z) * (($b)[nw_i].x + ($b)[$j].x)"
      case _   => s"(($b)[nw_i].x - ($b)[$j].x) * (($b)[nw_i].y + ($b)[$j].y)"
    }
    s"list_reduce(list_transform(range(1, len($b)+1), nw_i -> $term), (nw_a, nw_v) -> nw_a + nw_v)"
  }

  /** xy-shoelace fold over the OPENED ring column `r`: Σ x_i·y_{i+1} −
    * y_i·x_{i+1} with wraparound — the z-component of Geom.area3D's cross
    * accumulation after z := 0 (the x/y components are exactly 0.0 there).
    */
  def shoelaceXY(r: String): String = {
    val b = open(r)
    val j = s"(CASE WHEN sl_i = len($b) THEN 1 ELSE sl_i + 1 END)"
    s"""list_reduce(list_transform(range(1, len($b)+1),
        sl_i -> ($b)[sl_i].x * ($b)[$j].y - ($b)[sl_i].y * ($b)[$j].x),
        (sl_a, sl_v) -> sl_a + sl_v)"""
  }

  /** isPolyValid over ring column `r` given its normal component columns
    * nx/ny/nz (prefix `p`) already in scope: closed, ≥4 points, no
    * consecutive duplicates, planar within eps=0.01 against the first-3
    * unit normal (Geom.isPolyValid / isPolyPlanar).
    */
  def isValid(r: String, p: String = ""): String = {
    val mag = s"sqrt(${p}nx*${p}nx + ${p}ny*${p}ny + ${p}nz*${p}nz)"
    val noDup =
      s"len(list_filter(range(2, len($r)+1), i -> ($r)[i] = ($r)[i-1])) = 0"
    val planar =
      s"""($mag <> 0.0 AND len(list_filter(range(4, len($r)+1),
          i -> abs((($r)[i].x - ($r)[1].x) * (${p}nx/$mag)
             + (($r)[i].y - ($r)[1].y) * (${p}ny/$mag)
             + (($r)[i].z - ($r)[1].z) * (${p}nz/$mag)) > 0.01)) = 0)"""
    s"(len($r) >= 4 AND ($r)[1] = ($r)[-1] AND $noDup AND $planar)"
  }

  /** 3D shoelace area of ring column `r` (Geom.area3D): |Σ cross(v_i,
    * v_{i+1}) · unitNormal(first 3)| / 2 over the opened ring. Callers
    * guarantee validity, so the first-3 normal exists (mag ≠ 0).
    * `p` = prefix of the normal component columns in scope.
    */
  def area(r: String, p: String = ""): String = {
    val b = open(r)
    def comp(f: String) = // f ∈ {x,y,z} cross component via cyclic pairs
      f match {
        case "x" => s"list_aggregate(list_transform(range(1, len($b)+1), i -> ($b)[i].y * ($b)[CASE WHEN i = len($b) THEN 1 ELSE i+1 END].z - ($b)[i].z * ($b)[CASE WHEN i = len($b) THEN 1 ELSE i+1 END].y), 'sum')"
        case "y" => s"list_aggregate(list_transform(range(1, len($b)+1), i -> ($b)[i].z * ($b)[CASE WHEN i = len($b) THEN 1 ELSE i+1 END].x - ($b)[i].x * ($b)[CASE WHEN i = len($b) THEN 1 ELSE i+1 END].z), 'sum')"
        case _   => s"list_aggregate(list_transform(range(1, len($b)+1), i -> ($b)[i].x * ($b)[CASE WHEN i = len($b) THEN 1 ELSE i+1 END].y - ($b)[i].y * ($b)[CASE WHEN i = len($b) THEN 1 ELSE i+1 END].x), 'sum')"
      }
    val mag = s"sqrt(${p}nx*${p}nx + ${p}ny*${p}ny + ${p}nz*${p}nz)"
    s"abs((${comp("x")} * (${p}nx/$mag) + ${comp("y")} * (${p}ny/$mag) + ${comp("z")} * (${p}nz/$mag)) / 2.0)"
  }

  // ---- 60-bit md5-derived hash (cross-engine text hashing) ----

  /** First 15 hex chars of md5(e) as a BIGINT — equals Spark
    * `conv(substring(md5(e), 1, 15), 16, 10).cast("long")` (60 bits, no
    * overflow under ANSI).
    */
  def md5n(e: String): String =
    // lambda vars prefixed mh_/hx to avoid capture collisions when nested
    // inside an outer list_reduce/list_transform (e.g. the rolling
    // fingerprint fold, whose own vars are acc/t)
    s"list_reduce(list_transform(range(1,16), hx -> strpos('0123456789abcdef', substr(md5($e), hx, 1))::BIGINT - 1), (mh_a, mh_d) -> mh_a*16 + mh_d)"

  /** Trailing-zero count of a 52-bit window (SketchOps.rho's bit math):
    * isolate the lowest set bit with (w & -w), then a 52-arm CASE maps the
    * power of two to its exponent — machine-generated like [[spread]], no
    * log2 on either engine. NULL (i.e. never) when w = 0; callers guard.
    */
  def tz52(e: String): String = {
    val cases = (0 until 52).map(i => s"WHEN ${1L << i} THEN $i").mkString(" ")
    s"(CASE (($e) & -($e)) $cases END)"
  }

  /** 64-bit single-bit mask for bit index `e` (0..63) WITHOUT a left shift
    * — DuckDB's checked `1 << 63` overflows, so the mask comes from a
    * 64-entry literal list (bit 63 spelled as min-long arithmetic to stay
    * in BIGINT). Mirrors SketchOps' typedlit mask lookup exactly.
    */
  def bitMask(e: String): String = {
    val masks = (0 until 63).map(i => s"${1L << i}::BIGINT") :+
      "(-9223372036854775807::BIGINT - 1)"
    s"([${masks.mkString(", ")}][CAST($e AS INTEGER) + 1])"
  }

  /** Cosine similarity of two FLOAT[] columns, mirroring AnnOps.cosine's
    * fold exactly: per-element upcast to DOUBLE, sequential left-to-right
    * accumulation (list_reduce guarantees order; Spark's fold from 0.0
    * equals reduce-from-first bit-for-bit since 0.0 + v == v).
    */
  def cos(a: String, b: String): String = {
    def fold(l: String) = s"list_reduce($l, (sa, sv) -> sa + sv)"
    val dot = fold(
      s"list_transform(range(1, len($a)+1), zi -> ($a)[zi]::DOUBLE * ($b)[zi]::DOUBLE)")
    val na = s"sqrt(${fold(s"list_transform($a, zx -> zx::DOUBLE * zx::DOUBLE)")})"
    val nb = s"sqrt(${fold(s"list_transform($b, zx -> zx::DOUBLE * zx::DOUBLE)")})"
    s"($dot / ($na * $nb))"
  }

  /** Surface centroid x/y columns (mean over ALL ext points incl. closure),
    * matching SpatialOps.surfaceCentroids' fold.
    */
  def centroidCols: String =
    """list_aggregate(list_transform(ext, p -> p.x), 'sum') / len(ext) AS cx,
       list_aggregate(list_transform(ext, p -> p.y), 'sum') / len(ext) AS cy"""

  // ---- Sutherland-Hodgman rectangle clip (q109 vector→raster transfer) --

  /** One half-plane clip step of Sutherland-Hodgman over a
    * LIST<STRUCT(x,y)> polygon column `p`: keeps the region where
    * f(pt) ≥ 0, with f = (pt.axis − bound) for the min edge (`isMin`) or
    * (bound − pt.axis) for the max edge. Per directed edge cur→next the
    * step emits [maybe intersection] ++ [next if inside] — the classic SH
    * edge walk — so four chained calls clip against a full rectangle.
    *
    * DIALECT-ABSTRACTED: one template renders the Spark SQL expression
    * (`spark = true`, for `expr(...)` in the query) and the DuckDB
    * expression (false, for the oracle). Both engines therefore evaluate
    * the IDENTICAL IEEE-754 tree — the intersection point's one division
    * and two multiplications come out bit-equal, and clipped areas
    * hash-compare exactly. The intersection divisor is nonzero by
    * construction: it is only evaluated when f changes sign across the
    * edge, which requires the two coordinates to differ.
    */
  def shClip(p: String, axis: Char, isMin: Boolean, bound: String,
             spark: Boolean): String = {
    val size = if (spark) s"size($p)" else s"len($p)"
    def el(i: String) = if (spark) s"element_at($p, $i)" else s"$p[$i]"
    val cur = el("i")
    val nxt = el(s"CASE WHEN i = $size THEN 1 ELSE i + 1 END")
    def f(pt: String) = {
      val v = s"($pt).$axis"
      if (isMin) s"($v - $bound)" else s"($bound - $v)"
    }
    val (fc, fn) = (f(cur), f(nxt))
    val inter =
      if (axis == 'x') {
        val iy = s"($cur).y + ($bound - ($cur).x) * (($nxt).y - ($cur).y)" +
          s" / (($nxt).x - ($cur).x)"
        if (spark) s"named_struct('x', $bound, 'y', $iy)"
        else s"{'x': $bound, 'y': $iy}"
      } else {
        val ix = s"($cur).x + ($bound - ($cur).y) * (($nxt).x - ($cur).x)" +
          s" / (($nxt).y - ($cur).y)"
        if (spark) s"named_struct('x', $ix, 'y', $bound)"
        else s"{'x': $ix, 'y': $bound}"
      }
    def one(e: String) = if (spark) s"array($e)" else s"[$e]"
    val empty = if (spark) s"slice($p, 1, 0)" else s"$p[1:0]"
    val cat = if (spark) "concat" else "list_concat"
    val emit = s"$cat(" +
      s"CASE WHEN ($fc >= 0) <> ($fn >= 0) THEN ${one(inter)} " +
      s"ELSE $empty END, " +
      s"CASE WHEN $fn >= 0 THEN ${one(nxt)} ELSE $empty END)"
    val body =
      if (spark) s"flatten(transform(sequence(1, $size), i -> $emit))"
      else s"flatten(list_transform(range(1, $size + 1), i -> $emit))"
    // guard: Spark's sequence(1, 0) would COUNT DOWN ([1, 0]) on an empty
    // polygon; DuckDB's range(1, 1) is empty — unify via the CASE
    s"CASE WHEN $size = 0 THEN $p ELSE $body END"
  }

  /** |shoelace|/2 of the LIST<STRUCT(x,y)> polygon column `p` (open ring,
    * wraparound), dialect-abstracted like [[shClip]]. Left-to-right float
    * fold both sides (Spark aggregate from 0.0 == DuckDB list_reduce from
    * the first element, since 0.0 + v == v). Degenerate (< 3 points) → 0.
    */
  def shArea(p: String, spark: Boolean): String = {
    val size = if (spark) s"size($p)" else s"len($p)"
    def el(i: String) = if (spark) s"element_at($p, $i)" else s"$p[$i]"
    val cur = el("sl")
    val nxt = el(s"CASE WHEN sl = $size THEN 1 ELSE sl + 1 END")
    val term = s"($cur).x * ($nxt).y - ($cur).y * ($nxt).x"
    val fold =
      if (spark)
        s"aggregate(sequence(1, $size), CAST(0 AS DOUBLE), " +
          s"(sl_a, sl) -> sl_a + ($term))"
      else
        s"list_reduce(list_transform(range(1, $size + 1), sl -> $term), " +
          s"(sl_a, sl_v) -> sl_a + sl_v)"
    s"CASE WHEN $size < 3 THEN 0.0 ELSE abs($fold) / 2.0 END"
  }
}
