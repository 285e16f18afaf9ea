package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector: a deterministic generated table ("graft-range").
  *
  * The reference's sources are externally-landed tables declared in
  * `models/sources/sources.yml:4-16` — the engine side of that contract is
  * a connector that (a) exposes a schema, (b) plans parallel input splits,
  * and (c) cooperates with Catalyst on pushdown. This source implements the
  * full connector surface on a synthetic-but-deterministic table so the
  * pushdown behavior itself is oracle-checkable:
  *
  *   - `SupportsPushDownRequiredColumns` — column pruning reaches the
  *     reader; only requested fields are materialized per row.
  *   - `SupportsPushDownFilters` — range predicates on `id` NARROW THE
  *     GENERATED RANGE (true scan-side skipping, not post-filtering):
  *     `id >= a AND id < b` generates exactly `b - a` rows. Filters the
  *     source can fully enforce are consumed; everything else is returned
  *     as a residual for Spark to evaluate.
  *   - `Batch.planInputPartitions` — the (narrowed) range is split into
  *     `splits` contiguous chunks, each an independent reader: the
  *     1000-executor story is explicit, and a pushed-down point/range
  *     lookup plans only the splits that intersect it.
  *
  * Row content is a pure integer function of `id` (no hashing — DuckDB
  * BIGINT raises on overflow rather than wrapping, so the oracle twin uses
  * the same closed-form arithmetic over `range(lo, hi)`):
  *   bucket   = id % 97
  *   category = "cat" + (id % 5)
  *   amount   = (id * 37 + 11) % 1000003
  *   score    = amount / 1024.0   (exact in binary floating point)
  *
  * Options: `rows` (table size N, ids [0, N)), `splits` (target split
  * count). Usable as `spark.read.format("graft-range")` via the
  * DataSourceRegister service file.
  */
final class RangeDocSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-range"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeDocSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)
    val splits = Option(properties.get("splits")).map(_.toInt).getOrElse(4)
    // `partitionBy=bucket`: the table is stored clustered by `bucket`
    // (one split per residue class id % 97) and reports that layout as a
    // KeyGroupedPartitioning — the connector analogue of Iceberg-style
    // bucketed tables, enabling storage-partitioned (zero-shuffle) joins.
    val bucketed = Option(properties.get("partitionBy")) match {
      case None           => false
      case Some("bucket") => true
      case Some(other) => throw new IllegalArgumentException(
        s"graft-range: unsupported partitionBy=$other (only 'bucket')")
    }
    new RangeDocTable(rows, splits, bucketed)
  }
}

object RangeDocSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("amount", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  /** The row function — shared by the reader and the spec's oracle. */
  def valueOf(field: String, id: Long): Any = field match {
    case "id"       => id
    case "bucket"   => (id % 97).toInt
    case "category" => UTF8String.fromString("cat" + (id % 5))
    case "amount"   => (id * 37 + 11) % 1000003
    case "score"    => ((id * 37 + 11) % 1000003) / 1024.0
  }
}

final class RangeDocTable(rows: Long, splits: Int, bucketed: Boolean = false)
    extends Table with SupportsRead with SupportsMetadataColumns {
  override def name(): String = s"graft_range($rows)"
  override def schema(): StructType = RangeDocSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeDocScanBuilder(rows, splits, bucketed)

  // `_split` = the planned input-partition index a row was read from —
  // the connector analogue of the file source's `_metadata.file_path`
  // (row-level provenance/lineage, resolvable only when referenced, never
  // part of `SELECT *`). The reader emits it from partition context; the
  // oracle twin recomputes it closed-form from the narrowed range's split
  // arithmetic (q159).
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_split"
      override def dataType(): DataType = IntegerType
      override def isNullable: Boolean = false
      override def comment(): String = "planned input-partition index"
    })
}

/** Accumulates pruned columns, the pushed id-range bounds, and (when the
  * whole aggregation is answerable in closed form) a pushed aggregation. */
final class RangeDocScanBuilder(rows: Long, splits: Int, bucketed: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownOffset {

  private var required: StructType = RangeDocSource.schema
  private var lo: Long = 0L
  private var hi: Long = rows
  private var pushed: Array[Filter] = Array.empty
  private var aggKinds: Option[Seq[String]] = None
  private var limitTag: Option[String] = None
  private var partialPush: Boolean = true
  private var offsetVal: Long = 0L

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark passes the pruned top-level fields in schema order; an empty
    // struct (count(*) over the source) is legal — readers emit empty rows.
    required = requiredSchema

  private def lit(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue)
    case _                   => None
  }

  // `x + 1` bounds saturate at Long.MaxValue instead of wrapping negative:
  // a pushed `id <= Long.MaxValue` must mean "no upper bound", not an
  // empty scan. (`id > Long.MaxValue` is vacuously false — an empty range
  // via lo = MaxValue, hi <= rows is the correct answer there.)
  private def succ(x: Long): Long = if (x == Long.MaxValue) x else x + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Reset accumulated state: Spark may call pushFilters more than once on
    // the same builder, and stale bounds from a prior call must not compound.
    lo = 0L
    hi = rows
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", v)        => lit(v).exists { x => lo = math.max(lo, succ(x)); true }
      case GreaterThanOrEqual("id", v) => lit(v).exists { x => lo = math.max(lo, x); true }
      case LessThan("id", v)           => lit(v).exists { x => hi = math.min(hi, x); true }
      case LessThanOrEqual("id", v)    => lit(v).exists { x => hi = math.min(hi, succ(x)); true }
      case EqualTo("id", v)            => lit(v).exists { x => lo = math.max(lo, x); hi = math.min(hi, succ(x)); true }
      case _                           => false
    }
    pushed = accepted
    residual // id-range filters are fully enforced by the narrowed range
  }

  override def pushedFilters(): Array[Filter] = pushed

  // ----------------------------------------------------- agg pushdown
  // COUNT(*)/COUNT(col)/MIN(id)/MAX(id) over the (already filter-
  // narrowed) id range have closed forms: hi-lo, lo, hi-1. An
  // ungrouped aggregation made only of those is answered COMPLETELY by
  // the source — the scan emits the single result row and Spark plans
  // no aggregate at all (the JDBC-connector contract). Anything else
  // (grouping, SUM over the modular columns, distinct counts) is
  // declined and planned normally.
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._

  private def translate(agg: Aggregation): Option[Seq[String]] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val kinds = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      // every source column is non-nullable, so COUNT(col) = COUNT(*)
      case c: Count if !c.isDistinct && fieldOf(c.column).isDefined =>
        Some("count")
      case m: Min => fieldOf(m.column).filter(_ == "id").map(_ => "min_id")
      case m: Max => fieldOf(m.column).filter(_ == "id").map(_ => "max_id")
      case _ => None
    }
    if (kinds.forall(_.isDefined)) Some(kinds.map(_.get)) else None
  }
  private def fieldOf(
      e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames()(0))
      case _ => None
    }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    val t = translate(agg)
    if (t.isDefined) aggKinds = t
    t.isDefined
  }

  // ------------------------------------------------ limit / top-N pushdown
  // LIMIT over an (already filter-narrowed) range is FULLY enforceable by
  // generating only the first `limit` ids — isPartiallyPushed()=false, so
  // Spark plans no Limit operator at all. Top-N is accepted only when the
  // single sort key is `id` (the one column with generation-order
  // semantics): ascending keeps the range head, descending the tail —
  // either way the scan shrinks from N rows to `limit` rows. Top-N stays
  // PARTIALLY pushed (Spark keeps its TakeOrdered above the tiny scan),
  // which is the correct contract for a multi-split source: the narrowing
  // is exact, the final ordering is Spark's.
  override def pushLimit(limit: Int): Boolean =
    aggKinds.isEmpty && {
      // stored, not applied: a later pushOffset shifts the range head,
      // and the pushed limit counts POST-offset rows (applied in build)
      limitVal = Some(limit)
      limitTag = Some(s"limit=$limit")
      partialPush = false
      true
    }
  private var limitVal: Option[Int] = None

  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean =
    aggKinds.isEmpty && offsetVal == 0L && orders.length == 1 &&
      fieldOf(orders(0).expression()).contains("id") && {
        import org.apache.spark.sql.connector.expressions.SortDirection
        if (orders(0).direction() == SortDirection.ASCENDING)
          hi = math.min(hi, math.max(lo, 0L) + limit)
        else lo = math.max(lo, math.min(hi, rows) - limit)
        limitTag = Some(s"topN=$limit")
        partialPush = true
        true
      }

  override def isPartiallyPushed(): Boolean = partialPush

  // OFFSET (pagination) skips the first `offset` generated ids — fully
  // enforced by shifting the range head, composable with a pushed LIMIT
  // (Spark's contract: the limit it pushes is the post-offset row
  // count, so build() applies offset first). Declined once a top-N
  // narrowed the range tail-wise — the offset would then be relative to
  // the sorted result, not the generation order.
  override def pushOffset(offset: Int): Boolean =
    aggKinds.isEmpty && !limitTag.exists(_.startsWith("topN")) && {
      offsetVal = offset
      limitTag = Some(limitTag.fold(s"offset=$offset")(t => s"$t offset=$offset"))
      true
    }

  override def build(): Scan = {
    val (l0, h0) = (math.max(lo, 0L), math.min(hi, rows))
    // MEASURED contract: with both pushed, Spark's limit is the PRE-skip
    // row budget (limit+offset combined) — emit the first `limit` rows,
    // then skip `offset` of them: [l0+offset, l0+limit)
    val h = limitVal.fold(h0)(n => math.min(h0, l0 + n))
    val l = math.min(l0 + offsetVal, h)
    aggKinds match {
      case Some(kinds) => new RangeDocAggScan(l, h, kinds)
      case None if bucketed => new RangeDocBucketedScan(required, l, h)
      case None => new RangeDocScan(required, l, h, splits,
        limitTag.map(t => s" $t").getOrElse(""))
    }
  }
}

/** Complete-pushdown aggregate scan: one partition, one closed-form row. */
final class RangeDocAggScan(lo: Long, hi: Long, kinds: Seq[String])
    extends Scan with Batch {
  // Result fields are matched POSITIONALLY by Spark, but names must still
  // be unique — COUNT(*) plus COUNT(col) would otherwise both land as
  // "count" and trip StructType validation; the ordinal suffix keeps
  // every pushed-agg field distinct.
  override def readSchema(): StructType = StructType(kinds.zipWithIndex.map {
    case ("count", i) => StructField(s"count_$i", LongType, nullable = false)
    case (k, i)       => StructField(s"${k}_$i", LongType, nullable = true) // empty → NULL
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-range-agg id=[$lo,$hi) aggs=${kinds.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(RangeDocPartition(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory =
    RangeDocAggReaderFactory(kinds)
}

/** Top-level (serializable) factory — an inner/anonymous one would drag
  * the non-serializable Scan into the task closure. */
final case class RangeDocAggReaderFactory(kinds: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[RangeDocPartition]
    val n = math.max(part.hi - part.lo, 0L)
    val values: Array[Any] = kinds.map {
      case "count"  => n: Any
      case "min_id" => if (n == 0L) null else part.lo
      case "max_id" => if (n == 0L) null else part.hi - 1
    }.toArray
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = new GenericInternalRow(values)
      override def close(): Unit = ()
    }
  }
}

final class RangeDocScan(required: StructType, lo: Long, hi: Long, splits: Int,
    tag: String = "") extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering with SupportsReportOrdering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-range id=[$lo,$hi) cols=${required.fieldNames.mkString(",")}$tag"

  // Each split generates ids ascending — reported so Catalyst can elide
  // per-partition sorts on `id` (only meaningful when `id` survives
  // column pruning; an empty report is the honest fallback otherwise).
  override def outputOrdering(): Array[
      org.apache.spark.sql.connector.expressions.SortOrder] =
    if (required.fieldNames.contains("id"))
      Array(Expressions.sort(Expressions.column("id"),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
    else Array.empty

  // ------------------------------------------------- runtime filtering
  // Dynamic partition pruning for joins: when this scan is the probe
  // side of a broadcast join on `id`, Spark re-offers the BUILD side's
  // key set as a runtime `In("id", values)` AFTER planning
  // (BatchScanExec re-plans partitions through `filter`). The pushed
  // set is an exact implication of the join, so tightening the
  // generated range to [min(values), max(values)] and dropping splits
  // that contain none of the values skips I/O that static pushdown
  // could never see. At 100 TB this is the file-source DPP story told
  // on a connector: a fact-scan joined to a filtered dimension reads
  // only the id-ranges the dimension actually references.
  private var runtimeIds: Option[Array[Long]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))

  override def filter(filters: Array[Filter]): Unit = {
    val idSets = filters.collect {
      case In("id", vs) =>
        vs.collect { case n: java.lang.Number => n.longValue }.sorted
      case EqualTo("id", n: java.lang.Number) => Array(n.longValue)
    }
    // intersect with any set pushed by an earlier filter() call
    val merged = (runtimeIds.toSeq ++ idSets).reduceOption { (a, b) =>
      a.filter(java.util.Arrays.binarySearch(b, _) >= 0)
    }
    runtimeIds = merged.map(_.filter(v => v >= lo && v < hi))
  }

  // Exact row count and a schema-width byte estimate for the (already
  // filter-narrowed, column-pruned) scan. Without this, DSv2 relations
  // fall back to spark.sql.defaultSizeInBytes (= "huge") and a small
  // narrowed range can never be broadcast — with it, Catalyst picks
  // BroadcastHashJoin for dimension-sized ranges exactly as it does
  // for file sources with footer statistics (spec-pinned).
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(hi - lo, 0L)
    private val rowWidth = required.fields.map(_.dataType.defaultSize).sum
      .max(1)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * rowWidth)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // runtime-filtered bounds: the generated range tightens to the
    // pushed id set's envelope (an empty set is a legal, empty scan)
    val (rlo, rhi) = runtimeIds match {
      case Some(ids) if ids.isEmpty => (lo, lo)
      case Some(ids)                => (math.max(lo, ids.head), math.min(hi, ids.last + 1))
      case None                     => (lo, hi)
    }
    val n = math.max(rhi - rlo, 0L)
    if (n == 0L) return Array.empty
    val k = math.min(splits.toLong, n).toInt
    val step = n / k
    val rem = n % k
    // first `rem` splits get one extra row: contiguous, gap-free cover
    val bounds = (0 until k).scanLeft(rlo) { (acc, i) => acc + step + (if (i < rem) 1 else 0) }
    val parts = bounds.sliding(2).zipWithIndex
      .map { case (Seq(a, b), i) => RangeDocPartition(a, b, i) }.toArray
    runtimeIds match {
      // drop splits containing none of the pushed ids (binary search on
      // the sorted set); surviving splits keep their contiguous bounds
      case Some(ids) => parts.filter { p =>
        val i = java.util.Arrays.binarySearch(ids, p.lo)
        val at = if (i >= 0) i else -i - 1
        at < ids.length && ids(at) < p.hi
      }.map(p => p: InputPartition)
      case None => parts.map(p => p: InputPartition)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeDocReaderFactory(required.fieldNames)
}

/** Bucket-clustered scan: one split per residue class of `bucket = id % 97`,
  * reported to Catalyst as a [[KeyGroupedPartitioning]] over the identity
  * transform of `bucket` — the connector contract behind storage-partitioned
  * joins. Two graft-range tables with `partitionBy=bucket` joined on
  * (bucket, …) plan with NO shuffle exchange on either side
  * (`spark.sql.sources.v2.bucketing.enabled`): Spark zips the aligned
  * residue-class splits directly, exactly as it co-locates Iceberg bucket
  * files. At 100 TB this is the difference between re-shuffling two fact
  * tables per join and reading both pre-clustered — the layout cost is paid
  * once at write time (see the graft-sink clusterBy contract).
  *
  * Per-split rows are generated ascending, and `bucket` is constant within
  * a split, so the reported ordering (bucket, id) is exact — a join on
  * (bucket, id) needs neither exchange NOR sort (spec-pinned).
  */
final class RangeDocBucketedScan(required: StructType, lo: Long, hi: Long)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsReportPartitioning with SupportsReportOrdering {
  import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}

  private val mod = 97

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-range-bucketed id=[$lo,$hi) mod=$mod cols=${required.fieldNames.mkString(",")}"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.identity("bucket")), mod)

  override def outputOrdering(): Array[
      org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING
    val cols = Seq("bucket", "id").takeWhile(required.fieldNames.contains)
    cols.map(c => Expressions.sort(Expressions.column(c), ASCENDING)).toArray
  }

  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(hi - lo, 0L)
    private val rowWidth = required.fields.map(_.dataType.defaultSize).sum.max(1)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * rowWidth)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
  }

  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(mod)(r => RangeDocBucketPartition(lo, hi, mod, r))

  override def createReaderFactory(): PartitionReaderFactory =
    RangeDocBucketReaderFactory(required.fieldNames)
}

/** One residue class: ids in [lo, hi) with id % mod == r. The partition
  * key row makes split↔key alignment explicit for Spark's SPJ planner. */
final case class RangeDocBucketPartition(lo: Long, hi: Long, mod: Int, r: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](r))
}

final case class RangeDocBucketReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangeDocBucketPartition]
    // first id >= lo in this residue class, then stride by the modulus
    val first = p.lo + (((p.r - (p.lo % p.mod)) % p.mod + p.mod) % p.mod)
    new PartitionReader[InternalRow] {
      private var cur = first - p.mod
      override def next(): Boolean = { cur += p.mod; cur < p.hi }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map {
          case "_split" => p.r: Any
          case f        => RangeDocSource.valueOf(f, cur)
        })
      override def close(): Unit = ()
    }
  }
}

final case class RangeDocPartition(lo: Long, hi: Long, idx: Int = -1) extends InputPartition

final class RangeDocReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangeDocPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.lo - 1
      override def next(): Boolean = { cur += 1; cur < p.hi }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map {
          case "_split" => p.idx: Any // metadata column: partition provenance
          case f        => RangeDocSource.valueOf(f, cur)
        })
      override def close(): Unit = ()
    }
  }
}
