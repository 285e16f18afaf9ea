package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state exact top-k aggregate: each partition folds its rows
  * into a ≤ k sorted buffer, partials merge by sorted-merge-truncate —
  * so per-group aggregation state is k rows REGARDLESS of group size,
  * and only k-row partials cross the shuffle (classic map-side combine).
  *
  * This is the scale alternative to the window-rank formulation
  * (`row_number().over(partitionBy(g).orderBy(...)) <= k`), which sorts
  * EVERY group's full row set inside each partition before ranking. For
  * top-k-of-many (k ≪ group size) the aggregator's shuffle volume is
  * k·|groups| rows instead of all rows. The q18/TakeOrdered path does
  * the same for GLOBAL top-k; this is its per-group sibling.
  *
  * Ordering: (value desc, id1 asc, id2 asc) — callers must pass an id
  * pair that makes ties deterministic, or accept that exact-duplicate
  * tuples are interchangeable (output values are identical either way).
  */
final case class TopKRow(c: Long, o: Long, l: Long)
final case class TopKBuf(rows: Seq[TopKRow])

object TopKAgg {

  private def before(a: TopKRow, b: TopKRow): Boolean =
    a.c > b.c || (a.c == b.c && (a.o < b.o || (a.o == b.o && a.l < b.l)))

  def aggregator(k: Int): Aggregator[TopKRow, TopKBuf, TopKBuf] =
    new Aggregator[TopKRow, TopKBuf, TopKBuf] {
      def zero: TopKBuf = TopKBuf(Vector.empty)

      def reduce(b: TopKBuf, a: TopKRow): TopKBuf = {
        // no-op fast path once the buffer is saturated and a can't enter
        if (b.rows.size >= k && !before(a, b.rows.last)) b
        else {
          // binary insertion into the already-sorted buffer: O(log k)
          // compares + one O(k) patch, vs re-sorting the whole buffer
          var lo = 0
          var hi = b.rows.size
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (before(b.rows(mid), a)) lo = mid + 1 else hi = mid
          }
          TopKBuf(b.rows.patch(lo, Seq(a), 0).take(k))
        }
      }

      def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
        // linear sorted-merge of two already-sorted ≤k buffers
        val out = Vector.newBuilder[TopKRow]
        var i = 0
        var j = 0
        var n = 0
        val r1 = b1.rows
        val r2 = b2.rows
        while (n < k && (i < r1.size || j < r2.size)) {
          if (j >= r2.size || (i < r1.size && before(r1(i), r2(j)))) { out += r1(i); i += 1 }
          else { out += r2(j); j += 1 }
          n += 1
        }
        TopKBuf(out.result())
      }

      def finish(r: TopKBuf): TopKBuf = r
      def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
      def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    }
}
