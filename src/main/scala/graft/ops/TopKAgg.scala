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

      def reduce(b: TopKBuf, a: TopKRow): TopKBuf =
        // no-op fast path once the buffer is saturated and a can't enter
        if (b.rows.size >= k && !before(a, b.rows.last)) b
        else TopKBuf((b.rows :+ a).sortWith(before).take(k))

      def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
        TopKBuf((b1.rows ++ b2.rows).sortWith(before).take(k))

      def finish(r: TopKBuf): TopKBuf = r
      def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
      def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    }
}
