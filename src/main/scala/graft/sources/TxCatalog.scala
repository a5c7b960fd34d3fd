package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL surface for [[TxLog]] tables — a DataSource-V2 `TableCatalog`
  * that maps `<catalog>.<name>` to the transactional table at
  * `<root>/<name>` and serves each read from the LOG's snapshot.
  *
  * Registering
  * {{{
  *   spark.conf.set("spark.sql.catalog.tx", classOf[TxCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.tx.root", "/data/tables")
  * }}}
  * makes plain SQL work, INCLUDING Spark's native time-travel syntax —
  * the parser routes `VERSION AS OF` to [[loadTable(ident,version)]],
  * so no custom parsing exists here at all:
  * {{{
  *   SELECT * FROM tx.events VERSION AS OF 3
  * }}}
  *
  * Scan execution delegates to Spark's own v2 [[ParquetTable]] pinned to
  * the snapshot's exact live-file list and schema: predicate pushdown,
  * column pruning, and vectorized reading are inherited, and the file
  * list comes from one log replay — never a directory listing (the
  * object-store property the log format exists for). Reads only: writes
  * go through the [[TxLog]] API, whose commit protocol (optimistic
  * races, schema checks, txn idempotence) cannot be expressed through
  * the blind V2 write path without weakening it.
  */
class TxCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null, s"catalog $name: set spark.sql.catalog.$name.root")
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String =
    (ident.namespace.toSeq :+ ident.name).mkString(s"$root/", "/", "")

  private def toTable(ident: Identifier, versionAsOf: Option[Long]): Table = {
    val dir = dirOf(ident)
    val snap =
      try TxLog.snapshot(dir, versionAsOf)
      catch {
        case _: TxLog.VersionNotFoundException if versionAsOf.isEmpty =>
          throw new NoSuchTableException((ident.namespace :+ ident.name).toSeq)
      }
    val paths = snap.files.map(f => java.nio.file.Paths.get(dir, f.path).toString)
    val scan = ParquetTable(s"$catalogName.${ident.name}@v${snap.version}",
      SparkSession.active, CaseInsensitiveStringMap.empty(), paths,
      Some(snap.schema), classOf[ParquetFileFormat])
    // delegate scanning to the v2 parquet table but surface the LOG's
    // table properties (tombstoned keys dropped) — SHOW TBLPROPERTIES
    // then shows auto-optimize settings and CHECK constraints from SQL
    new Table with org.apache.spark.sql.connector.catalog.SupportsRead {
      override def name(): String = scan.name
      override def schema(): StructType = snap.schema
      override def capabilities(): util.Set[TableCapability] = scan.capabilities()
      override def newScanBuilder(options: CaseInsensitiveStringMap) =
        scan.newScanBuilder(options)
      override def properties(): util.Map[String, String] =
        snap.props.filter(_._2.nonEmpty).asJava
    }
  }

  override def loadTable(ident: Identifier): Table = toTable(ident, None)

  /** `VERSION AS OF n` — Spark's parser hands the literal through here. */
  override def loadTable(ident: Identifier, version: String): Table =
    toTable(ident, Some(version.toLong))

  /** `TIMESTAMP AS OF t` — Spark hands epoch MICROS; Delta semantics:
    * the latest version committed at or before `t`, error when `t`
    * predates the table. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    toTable(ident, Some(TxLog.versionAtTime(dirOf(ident), timestamp / 1000L)))

  override def tableExists(ident: Identifier): Boolean =
    TxLog.latestVersion(dirOf(ident)) >= 0

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = java.nio.file.Paths.get((root +: namespace.toSeq).mkString("/"))
    if (!java.nio.file.Files.isDirectory(base)) Array.empty
    else {
      val ds = java.nio.file.Files.list(base)
      try ds.iterator.asScala
        .filter(p => java.nio.file.Files.isDirectory(p.resolve("_txlog")))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray
      finally ds.close()
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      s"$catalogName is read-only SQL over TxLog tables; create via TxLog.append")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"$catalogName is read-only SQL over TxLog tables; use TxLog.setProperties")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      s"$catalogName is read-only SQL over TxLog tables")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName is read-only SQL over TxLog tables")
}
