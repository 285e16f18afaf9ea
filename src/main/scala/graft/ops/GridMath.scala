package graft.ops

/** Exact integer-grid division without the overflowing multiply.
  *
  * The suite's ppm/1e6-grid figures are `floor(A * 1000000 / T)` over
  * nonnegative BIGINT counts. Computing `A * 1000000` first overflows
  * once `A > ~9.2e12` — the q179 class of scale bug (r6 soak finding:
  * a 20× month's revenue crossed it). The cure is the STAGED division
  * identity, applied twice for the 10⁶ grid (10⁶ = 10³·10³):
  *
  *   with q  = A div T, r  = A mod T,
  *        q2 = (r·1000) div T, r2 = (r·1000) mod T:
  *   floor(A·10⁶ / T) = q·10⁶ + q2·1000 + (r2·1000) div T
  *
  * Exact for all A ≥ 0, T > 0 (substitute A = q·T + r, r·1000 =
  * q2·T + r2 and expand — every term is an integer identity, no
  * rounding anywhere), so results are bit-identical to the
  * single-multiply form wherever that form doesn't overflow.
  *
  * Headroom: the largest intermediates are `A`, `T`, `(<T)·1000`, and
  * the RESULT's own `q·10⁶` term, so the expression is safe whenever
  * A ≤ Long.Max, T ≤ Long.Max/1000 ≈ 9.2e15, and the result
  * floor(A·10⁶/T) itself fits BIGINT (A/T ≤ ~9.2e12 — inherent to any
  * BIGINT ppm output, and every caller's ratio is bounded by an entity
  * count ≪ 9.2e12). That is a 10⁶× ceiling lift on A versus the naive
  * form, which overflowed at A > 9.2e12 regardless of T. Callers
  * that BUILD A or T from products (q108's max_cnt·n_keys, q171's
  * sup_a·sup_b) inherit those products' own BIGINT bounds; SCALE.md
  * records the per-query ceilings.
  *
  * Both engines truncate BIGINT division toward zero for nonnegative
  * operands and agree on `%` — the same contract q179 relies on
  * (`TimeSeriesOps.scala`) — so the Spark (`div`) and DuckDB (`//`)
  * renderings below are value-identical.
  */
object GridMath {
  private def staged(a: String, t: String, idiv: String): String = {
    val A = s"($a)"
    val T = s"($t)"
    s"($A $idiv $T) * 1000000" +
      s" + ((($A % $T) * 1000) $idiv $T) * 1000" +
      s" + (((($A % $T) * 1000) % $T) * 1000) $idiv $T"
  }

  /** Spark SQL rendering of exact floor(a·10⁶/t). */
  def ppmSpark(a: String, t: String): String = staged(a, t, "div")

  /** DuckDB rendering of exact floor(a·10⁶/t) — same identity, `//`. */
  def ppmDuck(a: String, t: String): String = staged(a, t, "//")
}
