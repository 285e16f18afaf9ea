package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path: a clustered, sorted, manifest-tracked sink
  * ("graft-sink").
  *
  * The read-side connector ([[RangeDocSource]]) covers the source half of
  * the reference's declared-table contract (`models/sources/sources.yml`);
  * this sink covers the materialization half (`dbt_project.yml:28-38` —
  * every model lands as a table) at engine grade: the part Spark's built-in
  * `DataFrameWriter.parquet` does NOT let a connector express is
  * WRITE-TIME LAYOUT, and that is exactly what matters at 100 TB.
  *
  *   - `RequiresDistributionAndOrdering` — the sink DECLARES that incoming
  *     data must be clustered by the `clusterBy` column and sorted by
  *     (`clusterBy`, `sortBy`) within each task. Catalyst inserts the
  *     shuffle + sort below the write automatically (the Iceberg/Delta
  *     `WRITE ORDERED BY` pattern): every cluster key lands in exactly one
  *     output file and files are internally sorted, so a later reader can
  *     min/max-prune files without any post-write OPTIMIZE pass.
  *   - Two-phase commit — tasks write to `_tmp/<uuid>`, the driver's
  *     `BatchWrite.commit` atomically renames winners into `data/` and
  *     writes a `_manifest.jsonl` of per-file statistics (rows, cluster-key
  *     and sort-key min/max) plus `_SUCCESS`. Speculative / failed task
  *     attempts are fenced by Spark's commit coordinator
  *     (`useCommitCoordinator = true`) and swept by `abort`. This is the
  *     OutputCommitter protocol connectors must implement to be
  *     exactly-once under retries; on a cluster the `Files.move` would be
  *     a `FileSystem.rename` against HDFS/S3 — the protocol is identical.
  *   - The manifest is the footer-statistics story: per-file min/max of
  *     the cluster key gives a reader the same file-skipping information
  *     parquet footers give a file source (ClusteredSinkSpec checks the
  *     manifest against actual file contents).
  *
  * Rows are written as JSON lines (schema-driven, full string escaping),
  * readable back with `spark.read.schema(...).json(dir + "/data")` — the
  * format is deliberately trivial because the CONNECTOR surface (required
  * distribution, commit protocol, manifest) is the subject here, not the
  * encoding. Supported column types: LONG/INT/DOUBLE/BOOLEAN/STRING;
  * `clusterBy`/`sortBy` must be integral.
  *
  * Options: `path` (output directory), `clusterBy`, `sortBy`,
  * `partitions` (exact shuffle partition count for the write, 0 = let
  * Spark choose). Modes: `append`, `overwrite` (truncates via
  * `SupportsTruncate`).
  */
final class ClusteredSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sink"

  // the write schema is the query's schema, passed through because
  // supportsExternalMetadata = true; inferSchema is only a read-side hook
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ClusteredSink.defaultSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ClusteredSinkTable(schema, properties)
}

object ClusteredSink {
  val defaultSchema: StructType = StructType(Seq(
    StructField("key", LongType),
    StructField("bucket", LongType),
    StructField("payload", StringType)))

  /** Minimal complete JSON string escaper (quote, backslash, control). */
  def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"'           => b.append("\\\"")
        case '\\'          => b.append("\\\\")
        case '\n'          => b.append("\\n")
        case '\r'          => b.append("\\r")
        case '\t'          => b.append("\\t")
        case c if c < ' '  => b.append(f"\\u${c.toInt}%04x")
        case c             => b.append(c)
      }
      i += 1
    }
    b.toString
  }
}

final class ClusteredSinkTable(
    writeSchema: StructType, properties: util.Map[String, String])
    extends Table with SupportsWrite {
  override def name(): String = "graft_sink"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // options arrive on the write info (the getTable `properties` map is
    // empty on the DataFrameWriter save() path)
    def opt(k: String): Option[String] =
      Option(info.options.get(k)).orElse(Option(properties.get(k)))
    val path = opt("path").getOrElse(
      sys.error("graft-sink requires a 'path' option"))
    new ClusteredSinkWriteBuilder(info.schema(), path,
      opt("clusterBy").getOrElse("bucket"),
      opt("sortBy").getOrElse("key"),
      opt("partitions").getOrElse("0").toInt)
  }
}

final class ClusteredSinkWriteBuilder(
    schema: StructType, path: String, clusterBy: String, sortBy: String,
    partitions: Int) extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write =
    new ClusteredSinkWrite(schema, path, clusterBy, sortBy, partitions, truncateFirst)
}

final class ClusteredSinkWrite(
    schema: StructType, path: String, clusterBy: String, sortBy: String,
    partitions: Int, truncateFirst: Boolean)
    extends Write with RequiresDistributionAndOrdering {

  private def idx(col: String): Int = {
    val i = schema.fieldIndex(col)
    require(schema.fields(i).dataType == LongType ||
      schema.fields(i).dataType == IntegerType,
      s"graft-sink clusterBy/sortBy must be integral; $col is ${schema.fields(i).dataType}")
    i
  }

  // Catalyst reads these during write planning (V2Writes /
  // DistributionAndOrderingUtils) and inserts RepartitionByExpression +
  // Sort under the write node — the sink never sees unclustered data.
  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.column(clusterBy)))
  override def requiredOrdering(): Array[SortOrder] = Array(
    Expressions.sort(Expressions.column(clusterBy), SortDirection.ASCENDING),
    Expressions.sort(Expressions.column(sortBy), SortDirection.ASCENDING))
  override def requiredNumPartitions(): Int = partitions

  override def toBatch: BatchWrite =
    new ClusteredSinkBatchWrite(schema, path, idx(clusterBy), idx(sortBy), truncateFirst)

  override def toStreaming: StreamingWrite =
    new ClusteredSinkStreamingWrite(schema, path, idx(clusterBy), idx(sortBy))
}

/** Structured Streaming write path: same files, same manifest, same
  * required distribution — commits are PER-EPOCH and idempotent. File
  * names are keyed by (epoch, partition) and each epoch rewrites its own
  * `_manifest-<epoch>.jsonl` wholesale, so a replayed epoch (failure
  * recovery re-runs the last uncommitted batch) lands byte-identical
  * instead of duplicating — the exactly-once contract a streaming sink
  * must provide OVER an at-least-once execution engine. */
final class ClusteredSinkStreamingWrite(
    schema: StructType, path: String, clusterIdx: Int, sortIdx: Int)
    extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    Files.createDirectories(Paths.get(path, "_tmp"))
    ClusteredSinkStreamingFactory(schema, Paths.get(path, "_tmp").toString,
      clusterIdx, sortIdx)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dataDir = Paths.get(path, "data")
    Files.createDirectories(dataDir)
    val manifest = new StringBuilder
    messages.collect { case m: ClusteredSinkCommit if m.rows > 0 =>
      val name = f"part-$epochId%05d-${m.partitionId}%05d.json"
      Files.move(Paths.get(m.tmpPath), dataDir.resolve(name),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      manifest.append(ClusteredSinkCommit.manifestLine(name, m))
    }
    Files.write(Paths.get(path, f"_manifest-$epochId%05d.jsonl"),
      manifest.toString.getBytes(StandardCharsets.UTF_8))
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: ClusteredSinkCommit => Files.deleteIfExists(Paths.get(m.tmpPath))
      case _                      =>
    }
}

/** Top-level (serializable) streaming factory — epoch id joins the temp
  * name so concurrent epoch attempts never collide. */
final case class ClusteredSinkStreamingFactory(
    schema: StructType, tmpDir: String, clusterIdx: Int, sortIdx: Int)
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new ClusteredSinkDataWriter(schema, tmpDir, partitionId, s"$taskId-e$epochId",
      clusterIdx, sortIdx)
}

final class ClusteredSinkBatchWrite(
    schema: StructType, path: String, clusterIdx: Int, sortIdx: Int,
    truncateFirst: Boolean) extends BatchWrite {

  // Per-JOB commit id: committed file names are namespaced by it, so a
  // second append to the same path can never collide with (and silently
  // REPLACE) a prior job's part files — append is genuinely append.
  // The manifest is appended to (not rewritten) for the same reason.
  private val jobId: String =
    java.util.UUID.randomUUID().toString.take(8)

  override def useCommitCoordinator(): Boolean = true

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val tmp = Paths.get(path, "_tmp")
    Files.createDirectories(tmp)
    ClusteredSinkWriterFactory(schema, tmp.toString, clusterIdx, sortIdx)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dataDir = Paths.get(path, "data")
    val manifestPath = Paths.get(path, "_manifest.jsonl")
    if (truncateFirst && Files.exists(dataDir)) {
      Files.list(dataDir).forEach(f => Files.delete(f))
      Files.deleteIfExists(manifestPath)
    }
    Files.createDirectories(dataDir)
    val manifest = new StringBuilder
    messages.collect { case m: ClusteredSinkCommit if m.rows > 0 =>
      val name = f"part-$jobId-${m.partitionId}%05d.json"
      Files.move(Paths.get(m.tmpPath), dataDir.resolve(name),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      manifest.append(ClusteredSinkCommit.manifestLine(name, m))
    }
    Files.write(manifestPath,
      manifest.toString.getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    Files.write(Paths.get(path, "_SUCCESS"), Array.empty[Byte])
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: ClusteredSinkCommit => Files.deleteIfExists(Paths.get(m.tmpPath))
      case _                      =>
    }
}

/** Top-level (serializable) factory — an anonymous one would capture the
  * non-serializable BatchWrite in the task closure (same trap as the
  * read-side RangeDocAggReaderFactory). */
final case class ClusteredSinkWriterFactory(
    schema: StructType, tmpDir: String, clusterIdx: Int, sortIdx: Int)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ClusteredSinkDataWriter(schema, tmpDir, partitionId, taskId.toString,
      clusterIdx, sortIdx)
}

final class ClusteredSinkDataWriter(
    schema: StructType, tmpDir: String, partitionId: Int, attempt: String,
    clusterIdx: Int, sortIdx: Int) extends DataWriter[InternalRow] {

  private val tmpPath: Path = Paths.get(tmpDir, s"attempt-$partitionId-$attempt")
  private var out: java.io.BufferedWriter = _
  private var rows = 0L
  private var minCluster = Long.MaxValue
  private var maxCluster = Long.MinValue
  private var minSort = Long.MaxValue
  private var maxSort = Long.MinValue

  private def longAt(row: InternalRow, i: Int): Long =
    schema.fields(i).dataType match {
      case LongType => row.getLong(i)
      case _        => row.getInt(i).toLong
    }

  override def write(row: InternalRow): Unit = {
    if (out == null) { // lazy open: empty partitions produce no file
      out = Files.newBufferedWriter(tmpPath, StandardCharsets.UTF_8)
    }
    val b = new StringBuilder(64)
    b.append('{')
    var i = 0
    while (i < schema.length) {
      if (i > 0) b.append(',')
      b.append('"').append(schema.fields(i).name).append("\":")
      if (row.isNullAt(i)) b.append("null")
      else schema.fields(i).dataType match {
        case LongType    => b.append(row.getLong(i))
        case IntegerType => b.append(row.getInt(i))
        case DoubleType  => b.append(row.getDouble(i))
        case BooleanType => b.append(row.getBoolean(i))
        case StringType  =>
          b.append('"').append(ClusteredSink.escape(row.getUTF8String(i).toString)).append('"')
        case dt => sys.error(s"graft-sink: unsupported column type $dt")
      }
      i += 1
    }
    b.append('}').append('\n')
    out.write(b.toString)
    rows += 1
    // null keys contribute NO bound: an InternalRow getter on a null slot
    // returns an arbitrary value (0), which would falsely tighten the
    // manifest's file-skipping range
    if (!row.isNullAt(clusterIdx)) {
      val c = longAt(row, clusterIdx)
      if (c < minCluster) minCluster = c
      if (c > maxCluster) maxCluster = c
    }
    if (!row.isNullAt(sortIdx)) {
      val s = longAt(row, sortIdx)
      if (s < minSort) minSort = s
      if (s > maxSort) maxSort = s
    }
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    ClusteredSinkCommit(partitionId, tmpPath.toString, rows,
      minCluster, maxCluster, minSort, maxSort)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    Files.deleteIfExists(tmpPath)
  }

  override def close(): Unit = if (out != null) out.close()
}

final case class ClusteredSinkCommit(
    partitionId: Int, tmpPath: String, rows: Long,
    minCluster: Long, maxCluster: Long, minSort: Long, maxSort: Long)
    extends WriterCommitMessage

object ClusteredSinkCommit {
  /** One manifest JSONL line. A file whose keys were all null carries
    * `null` bounds (untouched MaxValue/MinValue sentinels) — a reader
    * must treat null as "no bound, cannot skip", never as a real range.
    */
  def manifestLine(name: String, m: ClusteredSinkCommit): String = {
    def bound(lo: Long, hi: Long, v: Long): String =
      if (lo > hi) "null" else v.toString
    s"""{"file":"$name","rows":${m.rows},""" +
      s""""min_cluster":${bound(m.minCluster, m.maxCluster, m.minCluster)},""" +
      s""""max_cluster":${bound(m.minCluster, m.maxCluster, m.maxCluster)},""" +
      s""""min_sort":${bound(m.minSort, m.maxSort, m.minSort)},""" +
      s""""max_sort":${bound(m.minSort, m.maxSort, m.maxSort)}}""" + "\n"
  }
}
