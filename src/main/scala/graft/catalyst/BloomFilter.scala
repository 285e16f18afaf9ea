package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._

/** Bloom-filter runtime join pruning — the connector-free half of the
  * shuffle-reduction story Spark's own `InjectRuntimeFilter` implements
  * for row-group skipping.
  *
  * At 100 TB the expensive part of `fact ⋈ dim` is shuffling the fact
  * side: even a selective dimension costs a full-fact exchange before the
  * join can drop non-matching rows. The fix is to ship a compact
  * SUPERSET summary of the dim keys to every fact task and drop rows
  * map-side, BEFORE the exchange:
  *
  *   1. [[BloomBuild.aggregator]] — a typed Aggregator folds the dim key
  *      column into an m-bit bitset (k double-hashed probes per key);
  *      partials OR-merge, so the build is one map-side-combinable pass.
  *      The finished bitset is a BOUNDED driver value (2^16 words =
  *      512 KiB at the default), the same guarded-collect contract as the
  *      IVF codebook.
  *   2. [[BloomMightContain]] — a native codegen predicate probing the
  *      bitset inside whole-stage codegen (the bitset rides along as a
  *      generated-class reference object, not a per-row closure). False
  *      positives pass (superset semantics), false negatives are
  *      impossible — so the filter is SOUND to insert ahead of any
  *      equi-join on the same key.
  *   3. The exact join still runs, now over the pruned fact side; its
  *      exchange carries only `|survivors| ≈ |matches| + ε·|fact|` rows.
  *
  * Hash: Murmur3-style 64-bit finalizer (`splitmix64`) split into two
  * 32-bit halves combined as `h1 + i·h2` (Kirsch–Mitzenmacher double
  * hashing) — deterministic, seed-free, identical between the build and
  * probe sides by construction.
  */
object BloomBuild {
  /** Buffer wrapper so the bitset rides Encoders.product (CMS precedent). */
  final case class Bits(words: Array[Long])

  /** Distributed bitset build over a Long key column. */
  def aggregator(numWords: Int, numHashes: Int): Aggregator[Long, Bits, Bits] = {
    require(numWords > 0 && Integer.bitCount(numWords) == 1,
      s"numWords must be a positive power of two, got $numWords")
    require(numWords <= (1 << 20),
      s"bitset of $numWords words exceeds the bounded-driver-value cap (2^20)")
    new Aggregator[Long, Bits, Bits] {
      def zero: Bits = Bits(new Array[Long](numWords))
      def reduce(b: Bits, v: Long): Bits = {
        BloomKernel.set(b.words, numHashes, v); b
      }
      def merge(a: Bits, b: Bits): Bits = {
        val w = a.words; val x = b.words
        var i = 0
        while (i < w.length) { w(i) |= x(i); i += 1 }
        a
      }
      def finish(b: Bits): Bits = b
      def bufferEncoder: Encoder[Bits] = Encoders.product[Bits]
      def outputEncoder: Encoder[Bits] = Encoders.product[Bits]
    }
  }
}

/** `bloom_might_contain(key)` — codegen predicate over a fixed bitset. */
case class BloomMightContain(child: Expression, words: Array[Long], numHashes: Int)
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires an integral key, got ${other.catalogString}")
  }
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input match {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long    => l.longValue
    }
    BloomKernel.mightContain(words, numHashes, v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the bitset becomes a field of the generated class — one reference,
    // zero per-row boxing
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.catalyst.BloomKernel.mightContain($wordsRef, $numHashes, (long)($c))")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomKernel {
  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  @inline private def bitIndex(h: Long, i: Int, nBits: Int): Int = {
    val h1 = (h & 0xffffffffL).toInt
    val h2 = (h >>> 32).toInt
    // Kirsch–Mitzenmacher: i-th probe = h1 + i*h2 (mod nBits, nBits = 2^k)
    (h1 + i * h2) & (nBits - 1)
  }

  def set(words: Array[Long], k: Int, v: Long): Unit = {
    val h = mix(v)
    val nBits = words.length << 6
    var i = 0
    while (i < k) {
      val b = bitIndex(h, i, nBits)
      words(b >>> 6) |= 1L << (b & 63)
      i += 1
    }
  }

  /** Static probe kernel, callable from generated code. */
  def mightContain(words: Array[Long], k: Int, v: Long): Boolean = {
    val h = mix(v)
    val nBits = words.length << 6
    var i = 0
    while (i < k) {
      val b = bitIndex(h, i, nBits)
      if ((words(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
