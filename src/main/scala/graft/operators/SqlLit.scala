package graft.operators

/** Double → SQL literal that DuckDB parses DIRECTLY as a DOUBLE.
  *
  * A bare decimal literal (`1.3736143586356397`) is typed DECIMAL first,
  * and DuckDB's DECIMAL→DOUBLE conversion can land 1 ulp off the
  * correctly-rounded strtod value (observed round 6:
  * `CAST(1.3736143586356397 AS DOUBLE)` = `…395` while
  * `1.3736143586356397E0` = `…397`, the `Double.toString` value — the
  * conversion divides an int128 mantissa by a power of ten in floating
  * point, which double-rounds once the mantissa passes 2^53). Exponent
  * notation forces the lexer down the DOUBLE path, whose string parse IS
  * correctly rounded, so `Double.toString` + an `E0` suffix round-trips
  * every finite double bit-exactly. Before round 6 the literal-constant
  * oracles survived only because downstream 6-dp rounds / argmins absorbed
  * the ulp; bit-exact gates (q21 export, q24 unrounded silhouette) do not.
  */
object SqlLit {
  def dbl(d: Double): String = {
    val s = d.toString
    if (s.indexOf('E') >= 0 || s.indexOf('e') >= 0) s else s + "E0"
  }
}
