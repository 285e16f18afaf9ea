package graft.ml

import graft.text.PortableHash
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min Sketch: fixed-size frequency summary with one-sided error
  * (estimates never undercount; overcount ≤ εN with probability 1-δ for
  * width = e/ε, depth = ln(1/δ)).
  *
  * The mergeable-sketch shape is what large-scale frequency estimation
  * needs: each partition folds its rows into a (depth × width) int array,
  * partials merge by element-wise addition — constant memory per
  * partition regardless of key cardinality, one tiny record per partition
  * crossing the shuffle.
  */
final case class CMSketch(depth: Int, width: Int, table: Array[Long]) {
  def add(key: String, count: Long = 1): CMSketch = {
    var r = 0
    while (r < depth) {
      table(r * width + CMSketch.bucket(key, r, width)) += count
      r += 1
    }
    this
  }

  def merge(other: CMSketch): CMSketch = {
    require(depth == other.depth && width == other.width)
    var i = 0
    while (i < table.length) { table(i) += other.table(i); i += 1 }
    this
  }

  /** Point estimate (never below the true count). */
  def estimate(key: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = table(r * width + CMSketch.bucket(key, r, width))
      if (v < best) best = v
      r += 1
    }
    best
  }

  def totalCount: Long = {
    var s = 0L
    var i = 0
    while (i < width) { s += table(i); i += 1 } // any single row sums to N
    s
  }
}

object CMSketch {
  def empty(depth: Int = 5, width: Int = 2048): CMSketch =
    CMSketch(depth, width, new Array[Long](depth * width))

  /** Row-r bucket for a key — seeded portable hash, so sketches built
    * anywhere (any partitioning, any engine with the same hash) agree. */
  private[ml] def bucket(key: String, row: Int, width: Int): Int =
    (PortableHash.hash60Jvm(s"$row:$key") % width).toInt

  /** Typed Aggregator: fold a column of string keys into a sketch. */
  def aggregator(depth: Int = 5, width: Int = 2048): Aggregator[String, CMSketch, CMSketch] =
    new Aggregator[String, CMSketch, CMSketch] {
      def zero: CMSketch = empty(depth, width)
      def reduce(b: CMSketch, a: String): CMSketch = b.add(a)
      def merge(b1: CMSketch, b2: CMSketch): CMSketch = b1.merge(b2)
      def finish(r: CMSketch): CMSketch = r
      def bufferEncoder: Encoder[CMSketch] = Encoders.product[CMSketch]
      def outputEncoder: Encoder[CMSketch] = Encoders.product[CMSketch]
    }
}
