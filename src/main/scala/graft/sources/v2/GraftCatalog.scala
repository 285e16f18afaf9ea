package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal DataSource V2 `TableCatalog` backing [[ClusteredSink]] tables
  * with a warehouse directory — the piece that lets the sink's write
  * modes run END-TO-END through Catalyst SQL instead of only through the
  * path-based `DataFrameWriter` API:
  *
  *   CREATE TABLE graft_cat.db.t (key BIGINT, bucket BIGINT, ...)
  *     PARTITIONED BY (bucket)          -- identity transform = clusterBy
  *   INSERT INTO graft_cat.db.t ...     -- append (BATCH_WRITE)
  *   INSERT OVERWRITE graft_cat.db.t .. -- static: OverwriteByExpression;
  *                                      -- dynamic (partitionOverwriteMode
  *                                      -- =dynamic): OverwritePartitionsDynamic
  *   df.writeTo("graft_cat.db.t").overwrite(cond)  -- filter overwrite
  *
  * Registration (runtime conf, lazily instantiated on first reference):
  *   spark.sql.catalog.<name> = graft.sources.v2.GraftCatalog
  *   spark.sql.catalog.<name>.warehouse = /some/dir
  *
  * Layout: `<warehouse>/<ns...>/<table>/` holding `_table.json` (schema
  * JSON + clusterBy/sortBy) beside the sink's own `data/` +
  * `_manifest.jsonl`. Metadata operations are directory operations; the
  * DATA commit protocol stays entirely in [[ClusteredSinkBatchWrite]] —
  * the catalog resolves identifiers to tables and never touches data
  * files, which is the Iceberg/Delta separation of catalog vs table
  * format.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catName: String = _
  private var warehouse: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Paths.get(Option(options.get("warehouse")).getOrElse(
      sys.error(s"catalog $name requires 'warehouse' option " +
        s"(spark.sql.catalog.$name.warehouse)")))
    Files.createDirectories(warehouse)
  }

  override def name(): String = catName

  private def nsDir(ns: Array[String]): Path =
    ns.foldLeft(warehouse)((p, s) => p.resolve(s))
  private def tblDir(ident: Identifier): Path =
    nsDir(ident.namespace).resolve(ident.name)
  private def metaFile(ident: Identifier): Path =
    tblDir(ident).resolve("_table.json")

  // ------------------------------------------------------------- tables
  override def listTables(ns: Array[String]): Array[Identifier] = {
    val dir = nsDir(ns)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(ns)
    Files.list(dir).iterator.asScala
      .filter(d => Files.exists(d.resolve("_table.json")))
      .map(d => Identifier.of(ns, d.getFileName.toString))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    Files.exists(metaFile(ident))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(metaFile(ident)))
    val schema = DataType.fromJson(n.get("schema").asText).asInstanceOf[StructType]
    val props = new util.HashMap[String, String]()
    props.put("path", tblDir(ident).toString)
    props.put("clusterBy", n.get("clusterBy").asText)
    props.put("sortBy", n.get("sortBy").asText)
    new ClusteredSinkTable(schema, props, ident.toString)
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val idParts = partitions.collect { case t if t.name == "identity" =>
      t.references.head.fieldNames.mkString(".") }
    require(partitions.length == idParts.length && idParts.length <= 1,
      "graft catalog tables support at most one identity PARTITIONED BY " +
        "column (it becomes the sink's clusterBy)")
    def opt(k: String, dflt: String): String =
      Option(properties.get(TableCatalog.OPTION_PREFIX + k))
        .orElse(Option(properties.get(k))).getOrElse(dflt)
    val clusterBy = idParts.headOption.getOrElse(opt("clusterBy", "bucket"))
    val sortBy = opt("sortBy", "key")
    require(schema.fieldNames.contains(clusterBy) &&
      schema.fieldNames.contains(sortBy),
      s"clusterBy/sortBy ($clusterBy/$sortBy) must be table columns")
    Files.createDirectories(tblDir(ident))
    val meta =
      s"""{"schema":${com.fasterxml.jackson.databind.node.TextNode.valueOf(schema.json)},""" +
        s""""clusterBy":"$clusterBy","sortBy":"$sortBy"}"""
    Files.write(metaFile(ident), meta.getBytes(StandardCharsets.UTF_8))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog tables are immutable (drop + recreate)")

  override def dropTable(ident: Identifier): Boolean =
    if (!tableExists(ident)) false
    else {
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p))
          Files.list(p).iterator.asScala.toSeq.foreach(rm)
        Files.deleteIfExists(p); ()
      }
      rm(tblDir(ident)); true
    }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    Files.createDirectories(nsDir(to.namespace))
    Files.move(tblDir(from), tblDir(to))
  }

  // --------------------------------------------------------- namespaces
  override def namespaceExists(ns: Array[String]): Boolean =
    ns.isEmpty || Files.isDirectory(nsDir(ns))

  override def listNamespaces(): Array[Array[String]] =
    Files.list(warehouse).iterator.asScala
      .filter(p => Files.isDirectory(p) && !Files.exists(p.resolve("_table.json")))
      .map(p => Array(p.getFileName.toString)).toArray

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    if (ns.isEmpty) listNamespaces() else Array.empty
  }

  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    util.Collections.emptyMap()
  }

  override def createNamespace(
      ns: Array[String], metadata: util.Map[String, String]): Unit = {
    Files.createDirectories(nsDir(ns)); ()
  }

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog namespaces carry no metadata")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    val dir = nsDir(ns)
    if (!Files.isDirectory(dir)) false
    else {
      require(cascade || !Files.list(dir).iterator.asScala.hasNext,
        s"namespace ${ns.mkString(".")} is not empty")
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p))
          Files.list(p).iterator.asScala.toSeq.foreach(rm)
        Files.deleteIfExists(p); ()
      }
      rm(dir); true
    }
  }
}
