package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-dimensional data layout: Z-order (Morton) clustering and its
  * file-skipping audit.
  *
  * At 100 TB a table is pruned by per-file min/max statistics, and a
  * single-column sort gives perfect pruning on ONE column and none on
  * any other. Interleaving the bits of two (or more) quantized sort keys
  * — the Delta/Iceberg `ZORDER BY` layout — bounds every file's
  * bounding box in ALL interleaved dimensions at once, so a selective
  * predicate on either column skips most files. The whole operator is
  * engine-native arithmetic: quantize to 16-bit grid with exact integer
  * division, interleave with shift/mask (codegen'd, no UDF), then lay
  * out files by Z-range using the q149 scalable global-rank pattern
  * (range partition + ≤32-row prefix-sum frame — the writer's sort, not
  * a single-partition window).
  *
  * The gate (q177) emits the per-file bounding boxes plus an
  * `overlaps_probe` flag for a fixed 20%-wide band on x — exactly the
  * min/max pruning decision a scan planner would make. ZorderSpec pins
  * the bit-interleave against a reference implementation and the
  * locality win over a one-column layout.
  */
object LayoutOps extends QueryModule {
  import Tables.orders

  /** Files (Z-range buckets) in the audited layout. */
  val ZFiles = 64

  /** 16-bit Morton interleave of two pre-quantized coordinates
    * (0 ≤ xq, yq ≤ 65535): x takes even bits, y odd. Pure shift/mask
    * column arithmetic — stays inside whole-stage codegen.
    */
  def zValue(xq: Column, yq: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc + shiftleft(shiftright(xq, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yq, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }

  /** The same interleave as SQL text for the DuckDB oracle. */
  private def zSql(xc: String, yc: String): String =
    (0 until 16).map { i =>
      s"((($xc >> $i) & 1) << ${2 * i}) + ((($yc >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  // Probe band: the middle 20% of the quantized x domain — the literals
  // are shared by both engines so the overlap flag is exact arithmetic.
  private val ProbeLo = 26214L // floor(0.4 * 65535)
  private val ProbeHi = 39321L // floor(0.6 * 65535)

  register("q177_zorder_layout",
    s"""WITH base AS (
       |  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS x,
       |    CAST(DATEDIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
       |      AS BIGINT) AS y
       |  FROM orders),
       |b AS (SELECT MIN(x) AS xmn, MAX(x) AS xmx,
       |             MIN(y) AS ymn, MAX(y) AS ymx FROM base),
       |qz AS (
       |  SELECT o_orderkey,
       |    ((x - xmn) * 65535) // GREATEST(xmx - xmn, 1) AS xq,
       |    ((y - ymn) * 65535) // GREATEST(ymx - ymn, 1) AS yq
       |  FROM base, b),
       |zz AS (SELECT o_orderkey, xq, yq, ${zSql("xq", "yq")} AS z FROM qz),
       |r AS (
       |  SELECT xq, yq,
       |    ROW_NUMBER() OVER (ORDER BY z, o_orderkey) AS rn,
       |    COUNT(*) OVER () AS n
       |  FROM zz)
       |SELECT ((rn - 1) * $ZFiles) // n AS file_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  MIN(xq) AS x_lo, MAX(xq) AS x_hi,
       |  MIN(yq) AS y_lo, MAX(yq) AS y_hi,
       |  MAX(xq) - MIN(xq) AS x_span, MAX(yq) - MIN(yq) AS y_span,
       |  MAX(xq) >= $ProbeLo AND MIN(xq) <= $ProbeHi AS overlaps_probe
       |FROM r GROUP BY 1""".stripMargin) { (s, d) =>
    val base = orders(s, d).select(col("o_orderkey"),
      col("o_custkey").cast(LongType).as("x"),
      datediff(col("o_orderdate").cast(DateType),
        lit(java.sql.Date.valueOf("1992-01-01"))).cast(LongType).as("y"))
    val bounds = base.agg(min(col("x")).as("xmn"), max(col("x")).as("xmx"),
      min(col("y")).as("ymn"), max(col("y")).as("ymx"))
    val qz = base.crossJoin(broadcast(bounds))
      .select(col("o_orderkey"),
        expr("((x - xmn) * 65535) div greatest(xmx - xmn, 1)").as("xq"),
        expr("((y - ymn) * 65535) div greatest(ymx - ymn, 1)").as("yq"))
    val zz = qz.select(col("o_orderkey"), col("xq"), col("yq"),
      zValue(col("xq"), col("yq")).as("z"))
    // q149 scalable global rank: range partition on (z, key), rank
    // locally, add per-partition offsets (≤32-row prefix-sum frame).
    // MATERIALIZED once (localCheckpoint): the offsets branch and the
    // join branch prune different columns, so without materialization
    // each branch re-evaluates the range exchange — and RangePartitioner
    // re-SAMPLES boundaries per evaluation (seeded by RDD id), leaving
    // offsets inconsistent with local ranks. q149 itself survives on
    // ReuseExchange because both its branches prune to the same child;
    // here the pruning differs, so consistency must be forced. At scale
    // this materialization is the layout write itself — the sorted data
    // is exactly what the writer persists.
    val local = zz.repartitionByRange(32, col("z"), col("o_orderkey"))
      .select(col("xq"), col("yq"), col("z"), col("o_orderkey"),
        spark_partition_id().as("pid"))
      .select(col("xq"), col("yq"), col("pid"), row_number().over(
        Window.partitionBy(col("pid"))
          .orderBy(col("z"), col("o_orderkey"))).as("local_rn"))
      // DISK_ONLY: this frame is DATA-sized (one row per order), and
      // parking it MEMORY_AND_DISK squats in the unified manager's
      // protected storage region — the r12 cold-cache OOM class
      // (GraphOps.diskCheckpoint rationale). Both consumers scan it
      // once, sequentially.
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val counts = local.groupBy("pid").agg(count(lit(1)).as("cnt"))
    val offsets = counts
      .select(col("pid"), coalesce(sum(col("cnt")).over(
        Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("offset"))
    val total = counts.agg(sum(col("cnt")).as("n"))
    local.join(broadcast(offsets), Seq("pid"))
      .crossJoin(broadcast(total))
      .select(col("xq"), col("yq"),
        expr(s"(((offset + local_rn) - 1) * $ZFiles) div n").as("file_id"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("xq")).as("x_lo"), max(col("xq")).as("x_hi"),
        min(col("yq")).as("y_lo"), max(col("yq")).as("y_hi"))
      .select(col("file_id"), col("n_rows"), col("x_lo"), col("x_hi"),
        col("y_lo"), col("y_hi"),
        (col("x_hi") - col("x_lo")).as("x_span"),
        (col("y_hi") - col("y_lo")).as("y_span"),
        (col("x_hi") >= ProbeLo && col("x_lo") <= ProbeHi)
          .as("overlaps_probe"))
  }
}
