package graft.catalyst

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The residual-PQ kernels ([[PqEncodeResidual]] / [[PqAdcResidual]])
  * against composed Column formulations — bit-identical by the same
  * contract as every other native kernel (q214's oracle hashes the
  * resulting integers), plus the design claim the residual exists for:
  * at the same byte budget it must not LOSE recall to raw-vector PQ.
  */
class PqResidualSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val M = 4
  private val SubDim = 16

  // tiny deterministic fixture codebooks: 2 cells × 64 dims, 3 codewords
  private val cents: Array[Array[Double]] =
    Array(Array.tabulate(64)(i => 0.01 * i), Array.tabulate(64)(i => -0.02 * i))
  private val books: Array[Array[Array[Double]]] = Array.tabulate(M)(m =>
    Array.tabulate(3)(j => Array.tabulate(SubDim)(i =>
      (j - 1) * 0.005 * (m + 1) + 0.001 * i)))

  private def cellCol = (col("vec_id") % 2).cast("int")

  test("adc table entries are bit-identical to the composed residual fold") {
    val e = Tables.embeddings(spark, sf).limit(64)
      .select(col("vec_id"), col("embedding"), cellCol.as("cell"))
    val tab = GraftColumnBridge.column(PqAdcResidual(
      GraftColumnBridge.expression(col("embedding")),
      GraftColumnBridge.expression(col("cell")), cents, books))
    // composed: residual via zip_with against the per-cell centroid
    // literal, then the l2sq kernel vs the codeword literal — the same
    // ((v−c)−w)² index-order accumulation
    def composed(cell: Int, m: Int, j: Int) = {
      val resid = slice(zip_with(col("embedding"),
          array(cents(cell).map(lit): _*),
          (x, c) => x.cast(DoubleType) - c),
        m * SubDim + 1, SubDim)
      floor(GraftFunctions.l2sqDistance(resid,
        array(books(m)(j).map(lit): _*)) * 1000000 + 0.5).cast("long")
    }
    val bad = e.select(col("cell"), tab.as("tab"),
        array((0 until M).map(m => array((0 until 3).map(j =>
          when(col("cell") === 0, composed(0, m, j))
            .otherwise(composed(1, m, j))): _*)): _*).as("ref"))
      .filter(!(col("tab") <=> col("ref"))).count()
    assert(bad === 0L, s"$bad rows differ between kernel and composed table")
  }

  test("encode picks the argmin codeword with earliest-index ties") {
    val e = Tables.embeddings(spark, sf).limit(64)
      .select(col("vec_id"), col("embedding"), cellCol.as("cell"))
    val codes = GraftColumnBridge.column(PqEncodeResidual(
      GraftColumnBridge.expression(col("embedding")),
      GraftColumnBridge.expression(col("cell")), cents, books))
    val tab = GraftColumnBridge.column(PqAdcResidual(
      GraftColumnBridge.expression(col("embedding")),
      GraftColumnBridge.expression(col("cell")), cents, books))
    // the chosen code's table entry must be the row minimum, and on a
    // ppm tie the chosen index must not exceed any tying index
    val bad = e.select(codes.as("codes"), tab.as("tab"))
      .select(explode(arrays_zip(col("codes"), col("tab"))).as("z"))
      .select(col("z.codes").as("code"), col("z.tab").as("row"))
      .filter(element_at(col("row"), col("code") + 1) =!= array_min(col("row")))
      .count()
    assert(bad === 0L)
    // duplicated codewords force ties: the earlier index must win
    val dupBooks = books.map(b => Array(b(0), b(0), b(0)))
    val dupCodes = GraftColumnBridge.column(PqEncodeResidual(
      GraftColumnBridge.expression(col("embedding")),
      GraftColumnBridge.expression(col("cell")), cents, dupBooks))
    val nonzero = e.select(dupCodes.as("c"))
      .select(explode(col("c")).as("c")).filter(col("c") =!= 0).count()
    assert(nonzero === 0L, "ties must resolve to the earliest codeword")
  }

  test("short input vectors throw instead of reading out of bounds") {
    // r13 ADVICE: a vector shorter than the codebook dim walked
    // unchecked past numElements() — silent garbage codes. Both kernels
    // must refuse loudly.
    import spark.implicits._
    val df = Seq((1L, Array.tabulate(32)(i => i * 0.1f), 0)) // dim 32 vs 64
      .toDF("vec_id", "embedding", "cell")
    for (mk <- Seq(
        () => PqEncodeResidual(
          GraftColumnBridge.expression(col("embedding")),
          GraftColumnBridge.expression(col("cell")), cents, books),
        () => PqAdcResidual(
          GraftColumnBridge.expression(col("embedding")),
          GraftColumnBridge.expression(col("cell")), cents, books))) {
      val e = intercept[Exception] {
        df.select(GraftColumnBridge.column(mk()).as("o")).collect()
      }
      def chain(t: Throwable): Iterator[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      assert(chain(e).exists(c => c.getMessage != null &&
          c.getMessage.contains("codebook dim")),
        s"expected a loud dim-mismatch failure, got: ${e.getMessage}")
    }
  }

  test("heterogeneous subspace widths slice at cumulative offsets") {
    // r13 ADVICE: the old `lo = mi * sd` assumed equal widths; books of
    // widths (16, 48) would have mis-sliced the second subspace at
    // offset 48 instead of 16. Compare the kernel against the composed
    // fold at the CORRECT cumulative offsets.
    val widths = Seq(16, 48)
    val offs = widths.scanLeft(0)(_ + _) // 0, 16, 64
    val hetBooks: Array[Array[Array[Double]]] =
      widths.zipWithIndex.map { case (w, m) =>
        Array.tabulate(3)(j => Array.tabulate(w)(i =>
          (j - 1) * 0.004 * (m + 1) + 0.002 * i))
      }.toArray
    val e = Tables.embeddings(spark, sf).limit(64)
      .select(col("vec_id"), col("embedding"), cellCol.as("cell"))
    val tab = GraftColumnBridge.column(PqAdcResidual(
      GraftColumnBridge.expression(col("embedding")),
      GraftColumnBridge.expression(col("cell")), cents, hetBooks))
    def composed(cell: Int, m: Int, j: Int) = {
      val resid = slice(zip_with(col("embedding"),
          array(cents(cell).map(lit): _*),
          (x, c) => x.cast(DoubleType) - c),
        offs(m) + 1, widths(m))
      floor(GraftFunctions.l2sqDistance(resid,
        array(hetBooks(m)(j).map(lit): _*)) * 1000000 + 0.5).cast("long")
    }
    val bad = e.select(col("cell"), tab.as("tab"),
        array((0 until 2).map(m => array((0 until 3).map(j =>
          when(col("cell") === 0, composed(0, m, j))
            .otherwise(composed(1, m, j))): _*)): _*).as("ref"))
      .filter(!(col("tab") <=> col("ref"))).count()
    assert(bad === 0L, s"$bad rows mis-sliced with heterogeneous widths")
  }

  test("residual encoding does not lose recall to raw-vector PQ (q212 vs q214)") {
    // measured at sf0.01: 9/50 residual vs 6/50 raw on the exact-L2
    // top-5 overlap — the refinement the residual exists for. Pin the
    // non-regression direction plus an above-chance floor (chance is
    // ~0.5/50 here).
    val d = "/root/testdata/sf0.01"
    def hits(q: String): Long =
      graft.SparkEntry.queries(q)(spark, d)
        .filter(col("in_exact_topk")).count()
    val raw = hits("q212_ivfpq_search")
    val res = hits("q214_residual_ivfpq")
    assert(res >= raw, s"residual PQ recall $res fell below raw PQ $raw")
    assert(res >= 5, s"residual PQ recall $res suspiciously near chance")
  }
}
