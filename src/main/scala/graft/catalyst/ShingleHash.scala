package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(tokens)` — native Catalyst expression computing the
  * distinct 3-gram shingle-hash set of a token array (the MinHash/Jaccard
  * working representation; see graft.text.DedupOps).
  *
  * This is the preferred implementation tier for a hot per-row kernel:
  * it consumes `ArrayData`/`UTF8String` directly (no encoder round-trip
  * like a Scala UDF), participates in whole-stage codegen via a static
  * call, and stays md5-compatible with the DuckDB oracle (hash60 = first
  * 60 bits of md5, affine-combined per 3-gram). The md5 runs once per
  * DISTINCT token via a per-row memo — corpus vocabularies are much
  * smaller than token streams.
  */
case class ShingleHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.catalyst.ShingleHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {
  // constants shared with graft.text.DedupOps and the DuckDB oracles
  val P = 2147483647L
  val A1 = 1000003L
  val A2 = 999983L

  /** hash60: first 60 bits of md5 (identical to the SQL-side
    * conv(substring(md5(x),1,15),16,10)). */
  private def hash60(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Static kernel, callable from generated code. */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val memo = new java.util.HashMap[UTF8String, java.lang.Long]()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val w = toks.getUTF8String(i)
      var cached = memo.get(w)
      if (cached == null) {
        cached = java.lang.Long.valueOf(hash60(w.getBytes) % P)
        memo.put(w, cached)
      }
      th(i) = cached.longValue()
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < n - 2) {
      out.add(java.lang.Long.valueOf(
        ((th(j) * A1 + th(j + 1)) % P * A2 + th(j + 2)) % P))
      j += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator(); var k = 0
    while (it.hasNext) { arr(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(arr)
  }
}
