package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Maintenance procedures for [[TxCatalog]] — the `CALL` SQL surface
  * (Spark 4's DSv2 `ProcedureCatalog`, the Iceberg `CALL cat.system.…`
  * idiom) over the format's table-management operations, so OPTIMIZE /
  * VACUUM / history / clone / restore / DV purge are scriptable from
  * pure SQL without touching the Scala API:
  * {{{
  *   CALL tx.optimize(`table` => 't', zorder_by => 'x,y')
  *   CALL tx.optimize_partition(`table` => 't', partition => 'day=2026-01-01', sort_by => 'id')
  *   CALL tx.cleanup_log(`table` => 't', retain_versions => 100)
  *   CALL tx.vacuum(`table` => 't', retain_versions => 4)
  *   CALL tx.vacuum(`table` => 't', dry_run => true)   -- predict only
  *   CALL tx.vacuum(`table` => 't', retain_hours => 168.0) -- time policy
  *   CALL tx.purge_deletes(`table` => 't')
  *   CALL tx.history(`table` => 't')
  *   CALL tx.detail(`table` => 't')   -- DESCRIBE DETAIL: files/bytes/rows/partitioning/protocol
  *   CALL tx.clone(source => 't', target => 'dev_t')
  *   CALL tx.restore(`table` => 't', version => 3)
  *   CALL tx.restore(`table` => 't', timestamp => '2026-08-15 00:00:00')
  *   CALL tx.compute_stats(`table` => 't')  -- ANALYZE: re-derive file stats
  *   CALL tx.set_partitioning(`table` => 't', columns => 'day')  -- partition evolution
  *   CALL tx.generate_manifest(`table` => 't')
  *   CALL tx.convert(`table` => 'raw_parquet_dir')
  * }}}
  * Each returns a result relation (a `LocalScan` of the outcome —
  * Spark renders it like a query result). Table names resolve against
  * the owning catalog's root, like every other identifier. */
private[sources] object TxProcedures {

  private def p(name: String, dt: DataType) = ProcedureParameter.in(name, dt).build()
  private def pd(name: String, dt: DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private def result(schema: StructType, outRows: Seq[InternalRow]): java.util.Iterator[Scan] =
    java.util.List.of[Scan](new LocalScan {
      override def rows(): Array[InternalRow] = outRows.toArray
      override def readSchema(): StructType = schema
    }).iterator()

  /** One procedure: parameters + body over (catalog root, args). */
  private final case class Proc(name: String,
      params: Array[ProcedureParameter],
      out: StructType,
      body: (String, InternalRow) => Seq[InternalRow]) {

    def unbound(root: String): UnboundProcedure = new UnboundProcedure {
      override def name(): String = Proc.this.name
      override def description(): String = s"txlog $name"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = Proc.this.name
        override def description(): String = s"txlog $name"
        override def parameters(): Array[ProcedureParameter] = params
        override def isDeterministic: Boolean = false // side-effecting
        override def call(input: InternalRow): java.util.Iterator[Scan] =
          result(out, body(root, input))
      }
    }
  }

  private def dirOf(root: String, table: String): String = s"$root/$table"

  private val procs: Map[String, Proc] = Seq(
    Proc("optimize",
      Array(p("table", StringType),
        pd("target_bytes", LongType, (128L << 20).toString),
        pd("zorder_by", StringType, "''")),
      StructType(Seq(StructField("files_before", IntegerType),
        StructField("files_after", IntegerType))),
      (root, in) => {
        val dir = dirOf(root, in.getUTF8String(0).toString)
        val zs = in.getUTF8String(2).toString
        val zorder = if (zs.isEmpty) Nil else zs.split(",").map(_.trim).toSeq
        val (b, a) = TxLog.optimize(SparkSession.active, dir,
          targetBytes = in.getLong(1), zorderBy = zorder)
        Seq(new GenericInternalRow(Array[Any](b, a)))
      }),
    Proc("vacuum",
      Array(p("table", StringType), pd("retain_versions", IntegerType, "2"),
        pd("dry_run", BooleanType, "false"),
        // hours, Delta's operator-facing unit; <= 0 = version policy only
        pd("retain_hours", DoubleType, "0.0")),
      StructType(Seq(StructField("deleted_files", LongType))),
      (root, in) => {
        val hours = in.getDouble(3)
        val deleted = TxLog.vacuum(dirOf(root, in.getUTF8String(0).toString),
          retainVersions = in.getInt(1), dryRun = in.getBoolean(2),
          retainMillis =
            if (hours > 0) Some((hours * 3600 * 1000).toLong) else None)
        Seq(new GenericInternalRow(Array[Any](deleted.size.toLong)))
      }),
    Proc("purge_deletes",
      Array(p("table", StringType)),
      StructType(Seq(StructField("dv_files", IntegerType),
        StructField("clean_files", IntegerType))),
      (root, in) => {
        val r = TxLog.purgeDeletes(SparkSession.active,
          dirOf(root, in.getUTF8String(0).toString))
        Seq(new GenericInternalRow(Array[Any](
          r.map(_._1).getOrElse(0), r.map(_._2).getOrElse(0))))
      }),
    Proc("drop_feature",
      Array(p("table", StringType), p("feature", StringType),
        pd("truncate_history", BooleanType, "true")),
      StructType(Seq(StructField("version", LongType))),
      (root, in) => {
        val v = TxLog.dropFeature(SparkSession.active,
          dirOf(root, in.getUTF8String(0).toString),
          in.getUTF8String(1).toString,
          truncateHistory = in.getBoolean(2))
        Seq(new GenericInternalRow(Array[Any](v)))
      }),
    Proc("table_features",
      Array(p("table", StringType)),
      StructType(Seq(StructField("protocol", LongType),
        StructField("features", StringType),
        StructField("wfeatures", StringType))),
      (root, in) => {
        val snap = TxLog.snapshot(dirOf(root, in.getUTF8String(0).toString))
        Seq(new GenericInternalRow(Array[Any](snap.protocol,
          utf8(snap.features.toSeq.sorted.mkString(",")),
          utf8(snap.wfeatures.toSeq.sorted.mkString(",")))))
      }),
    Proc("history",
      Array(p("table", StringType)),
      StructType(Seq(StructField("version", LongType),
        StructField("op", StringType), StructField("ts_millis", LongType),
        StructField("n_files_added", LongType), StructField("rows_added", LongType),
        StructField("n_files_removed", LongType))),
      (root, in) => {
        TxLog.history(SparkSession.active, dirOf(root, in.getUTF8String(0).toString))
          .collect().toSeq.map(r => new GenericInternalRow(Array[Any](
            r.getLong(0), utf8(r.getString(1)), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))))
      }),
    Proc("optimize_partition",
      Array(p("table", StringType), p("partition", StringType),
        pd("target_bytes", LongType, (128L << 20).toString),
        pd("sort_by", StringType, "''")),
      StructType(Seq(StructField("files_before", IntegerType),
        StructField("files_after", IntegerType))),
      (root, in) => {
        // partition spec: "col=val" pairs, comma-separated
        val eq = in.getUTF8String(1).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).map { kv =>
            val i = kv.indexOf('=')
            require(i > 0, s"optimize_partition: bad partition spec '$kv'")
            kv.take(i).trim -> kv.drop(i + 1).trim
          }.toMap
        val ss = in.getUTF8String(3).toString
        val (b, a) = TxLog.optimizePartition(SparkSession.active,
          dirOf(root, in.getUTF8String(0).toString), eq,
          targetBytes = in.getLong(2),
          sortBy = if (ss.isEmpty) Nil else ss.split(",").map(_.trim).toSeq)
        Seq(new GenericInternalRow(Array[Any](b, a)))
      }),
    Proc("cleanup_log",
      Array(p("table", StringType), pd("retain_versions", IntegerType, "100")),
      StructType(Seq(StructField("deleted_log_files", IntegerType))),
      (root, in) => {
        val n = TxLog.cleanupLog(dirOf(root, in.getUTF8String(0).toString),
          retainVersions = in.getInt(1))
        Seq(new GenericInternalRow(Array[Any](n)))
      }),
    Proc("detail",
      Array(p("table", StringType)),
      StructType(Seq(StructField("version", LongType),
        StructField("num_files", LongType), StructField("total_bytes", LongType),
        StructField("total_rows", LongType),
        StructField("partition_columns", StringType),
        StructField("protocol", LongType),
        StructField("num_dv_files", LongType),
        // files predating the CURRENT partitioning (partition evolution):
        // 0 = fully migrated; OPTIMIZE converges it
        StructField("num_legacy_layout_files", LongType))),
      (root, in) => {
        val snap = TxLog.snapshot(dirOf(root, in.getUTF8String(0).toString))
        val parts = TxLog.partitionColsOf(snap)
        val legacy =
          if (parts.isEmpty) 0L
          else snap.files.count(f =>
            f.rows > 0 && !parts.forall(f.pv.contains)).toLong
        Seq(new GenericInternalRow(Array[Any](
          snap.version, snap.files.size.toLong, snap.files.map(_.bytes).sum,
          snap.rows, utf8(parts.mkString(",")),
          snap.protocol, snap.files.count(_.dv.nonEmpty).toLong, legacy)))
      }),
    Proc("clone",
      Array(p("source", StringType), p("target", StringType),
        pd("version", LongType, "-1")),
      StructType(Seq(StructField("version", LongType))),
      (root, in) => {
        val v = in.getLong(2)
        val committed = TxLog.shallowClone(
          dirOf(root, in.getUTF8String(0).toString),
          dirOf(root, in.getUTF8String(1).toString),
          if (v < 0) None else Some(v))
        Seq(new GenericInternalRow(Array[Any](committed)))
      }),
    Proc("restore",
      Array(p("table", StringType), pd("version", LongType, "-1"),
        pd("timestamp", StringType, "''")),
      StructType(Seq(StructField("version", LongType))),
      (root, in) => {
        val dir = dirOf(root, in.getUTF8String(0).toString)
        val v = in.getLong(1)
        val ts = in.getUTF8String(2).toString
        require((v >= 0) != ts.nonEmpty,
          "restore: give exactly one of version or timestamp")
        val committed =
          if (v >= 0) TxLog.restore(SparkSession.active, dir, v)
          else TxLog.restoreAtTime(SparkSession.active, dir,
            TxLog.parseTsMillis(ts))
        Seq(new GenericInternalRow(Array[Any](committed)))
      }),
    Proc("compute_stats",
      Array(p("table", StringType)),
      StructType(Seq(StructField("version", LongType))),
      (root, in) => {
        val committed = TxLog.recomputeStats(SparkSession.active,
          dirOf(root, in.getUTF8String(0).toString))
        Seq(new GenericInternalRow(Array[Any](committed)))
      }),
    // partition evolution: columns => 'a,b' repartitions, '' un-partitions;
    // no data rewritten — OPTIMIZE migrates old-generation files lazily
    Proc("set_partitioning",
      Array(p("table", StringType), pd("columns", StringType, "''")),
      StructType(Seq(StructField("version", LongType),
        StructField("partition_columns", StringType))),
      (root, in) => {
        val dir = dirOf(root, in.getUTF8String(0).toString)
        val cols = in.getUTF8String(1).toString.split(",")
          .map(_.trim).filter(_.nonEmpty).toSeq
        val v = TxLog.setPartitioning(dir, cols)
        Seq(new GenericInternalRow(Array[Any](v, utf8(cols.mkString(",")))))
      }),
    Proc("generate_manifest",
      Array(p("table", StringType)),
      StructType(Seq(StructField("manifest_path", StringType),
        StructField("files", LongType))),
      (root, in) => {
        val dir = dirOf(root, in.getUTF8String(0).toString)
        val mf = TxLog.generateManifest(dir)
        val n = java.nio.file.Files.readAllLines(mf)
          .stream().filter(l => !l.isEmpty).count()
        Seq(new GenericInternalRow(Array[Any](utf8(mf.toString), n)))
      }),
    Proc("convert",
      Array(p("table", StringType)),
      StructType(Seq(StructField("version", LongType),
        StructField("files", IntegerType))),
      (root, in) => {
        val dir = dirOf(root, in.getUTF8String(0).toString)
        val v = TxLog.convertFromParquet(SparkSession.active, dir)
        Seq(new GenericInternalRow(Array[Any](v,
          TxLog.snapshot(dir).files.size)))
      })
  ).map(pr => pr.name -> pr).toMap

  def load(root: String, ident: Identifier): UnboundProcedure =
    procs.getOrElse(ident.name.toLowerCase,
      throw new RuntimeException(
        s"txlog catalog: no procedure ${ident.name}; available: " +
          procs.keys.toSeq.sorted.mkString(", "))).unbound(root)

  def list: Array[Identifier] =
    procs.keys.toArray.sorted.map(n => Identifier.of(Array.empty, n))
}
