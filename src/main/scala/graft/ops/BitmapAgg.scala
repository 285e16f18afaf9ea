package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact COUNT(DISTINCT key) as a fixed-width bitmap aggregate — the
  * Doris/ClickHouse "bitmap distinct" trick for bounded integer domains
  * (surrogate keys, dictionary-encoded ids).
  *
  * Spark's exact `COUNT(DISTINCT col)` plans an Expand + second shuffle
  * keyed on (group, col): every distinct pair crosses the wire once, and
  * a hot group's key set lands in one task. This aggregator replaces that
  * with ONE standard aggregation whose per-group state is a fixed
  * `domain/8`-byte bitset: map-side partials OR-merge (associative,
  * commutative, idempotent — replay/skew safe), so the shuffle carries
  * |groups| × bitset-width bytes REGARDLESS of row count. At 100 TB with
  * a 4M-key dimension domain that is |groups| × 512 KiB total, versus an
  * Expand shuffle proportional to the fact table's distinct pairs.
  *
  * The domain bound is a hard `require` at both build and update time
  * (same bounded-driver-value contract as [[graft.catalyst.BloomBuild]]
  * and the IVF codebook): keys outside [0, domain) fail loudly rather
  * than alias. For unbounded/string domains, the HLL sketch (q56/q146)
  * is the estimator escape hatch; this is the EXACT path where a
  * warehouse's surrogate keys make exactness affordable.
  */
object BitmapAgg {
  /** Buffer wrapper so the bitset rides Encoders.product (CMS precedent). */
  final case class Bits(words: Array[Long])

  /** 4M keys = 512 KiB per group buffer — the bounded-state cap. */
  val MaxDomain: Int = 1 << 22

  def aggregator(domain: Int): Aggregator[Long, Bits, Long] = {
    require(domain > 0 && domain <= MaxDomain,
      s"bitmap domain $domain outside (0, $MaxDomain] — use the HLL path")
    val numWords = (domain + 63) >>> 6
    new Aggregator[Long, Bits, Long] {
      def zero: Bits = Bits(new Array[Long](numWords))
      def reduce(b: Bits, key: Long): Bits = {
        require(key >= 0 && key < domain,
          s"bitmap key $key outside [0, $domain)")
        b.words((key >>> 6).toInt) |= (1L << (key & 63))
        b
      }
      def merge(a: Bits, b: Bits): Bits = {
        val w = a.words; val x = b.words
        var i = 0
        while (i < w.length) { w(i) |= x(i); i += 1 }
        a
      }
      def finish(b: Bits): Long = {
        var n = 0L
        var i = 0
        while (i < b.words.length) { n += java.lang.Long.bitCount(b.words(i)); i += 1 }
        n
      }
      def bufferEncoder: Encoder[Bits] = Encoders.product[Bits]
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
  }
}
