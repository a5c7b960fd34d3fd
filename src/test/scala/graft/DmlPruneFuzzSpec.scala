package graft.sources

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BindReferences}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LocalRelation}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.TxLog.{AddFile, ColStats, Snapshot}

/** DML-pruning soundness fuzz (the round-13 lesson, machine-checked):
  * DML discovery decides which rows get REWRITTEN, so a pruned file
  * holding a matching row silently un-deletes/un-updates rows — a
  * different soundness bar than read skipping, and exactly where the
  * typed-literal-canon bug lived. 600 seeded trials drive the REAL
  * chain — SQL condition text → [[TxLog.eqConjuncts]] (typed literal
  * canon under the COLUMN's schema type) → [[TxLog.pruneByFilters]]
  * (stats + pv) — against ground truth from SPARK ITSELF: the
  * condition is parsed and ANALYZED (so Spark's own coercion applies)
  * and the resolved predicate evaluated per row. Column types × literal
  * renderings cover every mismatch class DmlPruneTypeSpec pins
  * deterministically: int/double width, string-vs-datetime bounds,
  * decimal scale, pv typed equality. */
class DmlPruneFuzzSpec extends AnyFunSuite with SparkTestBase {

  private val colTypes: Seq[DataType] = Seq(IntegerType, LongType,
    DoubleType, FloatType, DecimalType(9, 2), StringType, DateType,
    TimestampType)

  /** A value pool per column type, deliberately overlapping across
    * types ("5" vs 5 vs 5.0 vs 5.25; midnight vs 05:00) so cross-type
    * literals actually match rows. */
  private def pool(dt: DataType): Seq[Any] = dt match {
    case IntegerType => Seq(-3, 0, 5, 7, 8)
    case LongType => Seq(-3L, 0L, 5L, 7L, 8L)
    case DoubleType => Seq(-1.5d, 0.0d, 5.0d, 5.25d, 7.0d)
    case FloatType => Seq(-1.5f, 0.0f, 5.0f, 5.25f, 7.0f)
    case _: DecimalType => Seq(new java.math.BigDecimal("-1.50"),
      new java.math.BigDecimal("0.00"), new java.math.BigDecimal("5.00"),
      new java.math.BigDecimal("5.25"), new java.math.BigDecimal("7.10"))
    case StringType => Seq("5", "5.0", "2026-01-02", "v1", "")
    case DateType => Seq("2026-01-01", "2026-01-02", "2026-01-03", "2026-02-01")
      .map(java.sql.Date.valueOf)
    case TimestampType => Seq("2026-01-01 23:59:59", "2026-01-02 00:00:00",
      "2026-01-02 05:00:00", "2026-01-03 00:00:00")
      .map(java.sql.Timestamp.valueOf)
    case other => sys.error(s"no pool for $other")
  }

  /** SQL literal renderings that can hit the pools above, per literal
    * KIND — intentionally often a different type than the column. */
  private val literalKinds: Seq[scala.util.Random => String] = Seq(
    r => Seq("-3", "0", "5", "7", "8")(r.nextInt(5)),
    r => Seq("-1.5", "0.0", "5.0", "5.25", "7.0", "7.1")(r.nextInt(6)),
    r => Seq("'5'", "'5.0'", "'v1'", "'2026-01-02'",
      "'2026-01-02 05:00:00'", "''")(r.nextInt(6)),
    r => Seq("DATE '2026-01-01'", "DATE '2026-01-02'",
      "DATE '2026-02-01'")(r.nextInt(3)),
    r => Seq("TIMESTAMP '2026-01-02 00:00:00'",
      "TIMESTAMP '2026-01-02 05:00:00'",
      "TIMESTAMP '2026-01-01 23:59:59'")(r.nextInt(3)),
    r => s"CAST(${Seq("5", "5.25", "7")(r.nextInt(3))} AS DECIMAL(9,2))")

  /** Stats exactly as the commit path records them: cast-to-string
    * canon ([[TxLog.valueCanon]]), min/max under the stats comparator
    * ([[TxLog.cmpStats]]), `typ` = simpleString. */
  private def statsOf(dt: DataType, rows: Seq[Option[Any]]): Map[String, ColStats] = {
    val typ = dt.simpleString
    val canons = rows.flatten.flatMap(TxLog.valueCanon)
    if (canons.size != rows.count(_.nonEmpty))
      return Map("c" -> ColStats(typ, None, None, rows.count(_.isEmpty).toLong))
    val sorted = canons.sortWith((a, b) =>
      TxLog.cmpStats(typ, a, b).exists(_ < 0))
    Map("c" -> ColStats(typ, sorted.headOption, sorted.lastOption,
      rows.count(_.isEmpty).toLong))
  }

  /** Spark's OWN verdict on whether a row matches: parse + analyze the
    * condition over a one-column relation (the analyzer applies the
    * exact coercions a real DML scan gets), then evaluate the resolved
    * predicate on the driver. */
  private def sparkMatches(condition: String, dt: DataType,
      rows: Seq[Option[Any]]): Seq[Boolean] = {
    val attr = AttributeReference("c", dt, nullable = true)()
    val parsed = spark.sessionState.sqlParser.parseExpression(condition)
    val analyzed = spark.sessionState.analyzer.execute(
      LFilter(parsed, LocalRelation(Seq(attr))))
    val (pred, out) = analyzed match {
      case f: LFilter => (f.condition, f.child.output)
      case other => sys.error(s"unexpected analyzed shape $other")
    }
    val bound = BindReferences.bindReference(pred, out)
    val conv = CatalystTypeConverters.createToCatalystConverter(dt)
    rows.map { v =>
      bound.eval(InternalRow(v.map(conv).orNull)) == true
    }
  }

  /** A trial's live set written out as a SHARDED checkpoint log (2
    * lines per part), so [[TxLog.planScan]] exercises the distributed
    * prune on exactly the files the driver path judged. */
  private def shardedDirOf(trial: Int, schema: StructType,
      files: Seq[AddFile]): String = {
    val dir = graft.Scratch.dir(s"graft-fuzz-shard-$trial").toString + "/t"
    val ld = java.nio.file.Paths.get(dir, "_txlog")
    java.nio.file.Files.createDirectories(ld)
    def put(n: String, c: String): Unit =
      java.nio.file.Files.write(ld.resolve(n), c.getBytes("UTF-8")): Unit
    val ddl = schema.toDDL.replace("\"", "\\\"")
    put("00000000000000000000.json",
      s"""{"version":0,"op":"create","ts":1,"schema":"$ddl","adds":[],"removes":[]}""")
    val parts = files.grouped(2).toSeq // trials always carry >= 1 file
    val n = parts.size
    parts.zipWithIndex.foreach { case (grp, i) =>
      put(f"${0L}%020d.ckpt.part-$i%05d-of-$n%05d.jsonl",
        grp.map(TxLog.shardLine).mkString("", "\n", "\n"))
    }
    put("00000000000000000000.ckpt.json",
      s"""{"version":0,"protocol":1,"schema":"$ddl","txns":{},"props":{},"parts":$n}""")
    put("_last_checkpoint", s"""{"version":0,"parts":$n}""")
    dir
  }

  test("600 seeded trials: DML discovery never prunes a file holding a matching row") {
    val rnd = new scala.util.Random(20260815L)
    var checkedMatches = 0L
    var prunedFiles = 0L
    var shardedTrials = 0L
    (0 until 600).foreach { trial =>
      val dt = colTypes(rnd.nextInt(colTypes.size))
      val vals = pool(dt)
      val schema = StructType(Seq(StructField("c", dt)))
      // 1-4 files × 0-6 rows; ~1 in 4 files is single-valued and gets
      // a pv entry (the typed pv-equality class)
      val files: Seq[(AddFile, Seq[Option[Any]])] =
        (0 until 1 + rnd.nextInt(4)).map { i =>
          val rows = (0 until rnd.nextInt(7)).map { _ =>
            if (rnd.nextInt(6) == 0) None
            else Some(vals(rnd.nextInt(vals.size)))
          }
          val single = rows.flatten.distinct.size == 1 && rnd.nextInt(4) == 0
          val pv =
            if (!single) Map.empty[String, String]
            else TxLog.valueCanon(rows.flatten.head)
              .map(cn => Map("c" -> cn)).getOrElse(Map.empty)
          (AddFile(s"d-z/f$i.parquet", rows.size.toLong, 1L,
            statsOf(dt, rows), pv = pv), rows)
        }
      val lit = literalKinds(rnd.nextInt(literalKinds.size))(rnd)
      val op = Seq("=", "<", "<=", ">", ">=")(rnd.nextInt(5))
      val condition = rnd.nextInt(5) match {
        case 0 =>
          val l2 = literalKinds(rnd.nextInt(literalKinds.size))(rnd)
          s"c IN ($lit, $l2)"
        case 1 =>
          val l2 = literalKinds(rnd.nextInt(literalKinds.size))(rnd)
          s"c $op $lit AND c <= $l2"
        case _ => s"c $op $lit"
      }
      val matchesOpt =
        try Some(sparkMatches(condition, dt, files.flatMap(_._2)))
        catch { case _: Exception => None } // unanalyzable pairing: no DML either
      matchesOpt.foreach { matches =>
        val snap = Snapshot(0L, schema.toDDL, files.map(_._1))
        val filters = TxLog.eqConjuncts(spark, condition, schema)
        val survivors = TxLog.pruneByFilters(snap, filters).map(_.path).toSet
        prunedFiles += files.size - survivors.size
        // ~1 in 10 trials additionally materializes the live set as a
        // SHARDED log and runs the same discovery through the
        // distributed plane — the no-divergence guard for the round-15
        // DML routing (planScan shares mkFilePruner, so any drift here
        // is a wiring bug, not a canon bug)
        if (rnd.nextInt(10) == 0) {
          shardedTrials += 1
          val dir = shardedDirOf(trial, schema, files.map(_._1))
          val distributed = TxLog.planScan(spark, dir, filters).map(_.path).toSet
          assert(distributed === survivors,
            s"trial $trial: sharded-base discovery diverged under " +
              s"[$condition] on ${dt.simpleString} (filters=$filters)")
        }
        var k = 0
        files.foreach { case (f, rows) =>
          val hasMatch = rows.indices.exists(j => matches(k + j))
          if (hasMatch) checkedMatches += 1
          assert(!hasMatch || survivors.contains(f.path),
            s"trial $trial: UNSOUND DML prune of ${f.path} under " +
              s"[$condition] on ${dt.simpleString} " +
              s"(rows=$rows stats=${f.stats} pv=${f.pv} filters=$filters)")
          k += rows.size
        }
      }
    }
    assert(checkedMatches > 200L,
      s"the generator must actually produce matching files (got $checkedMatches)")
    // a fuzz that never prunes can never fail — require real teeth
    assert(prunedFiles > 100L,
      s"the generator must actually exercise pruning (pruned $prunedFiles files)")
    assert(shardedTrials > 20L,
      s"the sharded-base leg must actually run (got $shardedTrials trials)")
  }
}
