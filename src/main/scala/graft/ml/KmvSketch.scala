package graft.ml

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV ("k minimum values" / theta-sketch) distinct-count sketch: the
  * k smallest DISTINCT values of a uniform hash of the key domain.
  *
  * Why a third sketch family next to HLL (q56/q146) and Count-Min (q55):
  * KMV is the one that supports SET ALGEBRA with a direct estimator —
  * the k smallest hashes of A ∪ B are computable from the two sketches
  * alone (`cap_k(distinct(kmv_A ∪ kmv_B))`), and membership of a union-
  * sketch element in each input sketch is EXACT (x ∈ A ∧ x among the k
  * smallest of A∪B ⇒ x among the k smallest of A), so the intersection
  * ratio ρ = |union-sketch ∩ A ∩ B| / k estimates |A∩B|/|A∪B| without
  * the error compounding of HLL inclusion–exclusion (q176).
  *
  * Estimator contract (mirrored bit-exactly by the DuckDB oracle):
  * with fewer than k distinct values the sketch IS the value set and the
  * estimate is exact; otherwise est = (k−1)·D div h_k where D is the
  * hash codomain size and h_k the largest retained hash (all-integer —
  * truncating BIGINT division is portable per the verify recipe).
  *
  * Scale design: aggregation state is ≤ k longs per group REGARDLESS of
  * group size; partial buffers merge by sorted-merge-dedupe-truncate, so
  * only k-row partials cross the shuffle (map-side combine) — the
  * bounded-state path to COUNT(DISTINCT) set algebra at 100 TB, where
  * the exact pairwise-overlap join (q137-style) is quadratic in the
  * domain. Dedup happens inside `reduce`, so the input needs NO
  * pre-distinct shuffle.
  */
final case class KmvBuf(vs: Seq[Long])

object KmvSketch {

  /** k smallest distinct input values, sorted ascending. */
  def aggregator(k: Int): Aggregator[Long, KmvBuf, Seq[Long]] =
    new Aggregator[Long, KmvBuf, Seq[Long]] {
      def zero: KmvBuf = KmvBuf(Vector.empty)

      def reduce(b: KmvBuf, h: Long): KmvBuf = {
        val vs = b.vs
        // saturated and not smaller than the current k-th value: no-op
        if (vs.size >= k && h >= vs.last) b
        else {
          // binary search: insertion point, or reject an exact duplicate
          var lo = 0
          var hi = vs.size
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (vs(mid) < h) lo = mid + 1 else hi = mid
          }
          if (lo < vs.size && vs(lo) == h) b
          else KmvBuf(vs.patch(lo, Seq(h), 0).take(k))
        }
      }

      def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = {
        // linear sorted merge of two sorted ≤k buffers, dropping dups
        val r1 = b1.vs
        val r2 = b2.vs
        val out = Vector.newBuilder[Long]
        var i = 0
        var j = 0
        var n = 0
        while (n < k && (i < r1.size || j < r2.size)) {
          val take =
            if (j >= r2.size) { val v = r1(i); i += 1; v }
            else if (i >= r1.size) { val v = r2(j); j += 1; v }
            else if (r1(i) < r2(j)) { val v = r1(i); i += 1; v }
            else if (r2(j) < r1(i)) { val v = r2(j); j += 1; v }
            else { val v = r1(i); i += 1; j += 1; v } // equal: emit once
          out += take
          n += 1
        }
        KmvBuf(out.result())
      }

      def finish(r: KmvBuf): Seq[Long] = r.vs
      def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }
}
