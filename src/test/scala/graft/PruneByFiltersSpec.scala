package graft.sources

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog.{AddFile, ColStats, Snapshot}

/** Soundness fuzz for [[TxLog.pruneByFilters]] — the one rule file
  * skipping must never break: a PRUNED file contains no row matching
  * the filter. 500 seeded-random (files, filter) trials build synthetic
  * row sets, derive stats exactly the way the commit path does
  * (min/max/nulls in cast-to-string canon), evaluate the filter row by
  * row in plain Scala, and assert every file holding a matching row
  * SURVIVES. Completeness (pruning enough) is asserted separately on
  * deterministic cases — soundness is the invariant, sharpness the
  * optimization. */
class PruneByFiltersSpec extends AnyFunSuite {

  private case class Row(id: Option[Long], s: Option[String])

  private def statsOf(rows: Seq[Row]): Map[String, ColStats] = {
    val ids = rows.flatMap(_.id)
    val ss = rows.flatMap(_.s)
    Map(
      "id" -> ColStats("bigint",
        ids.minOption.map(_.toString), ids.maxOption.map(_.toString),
        rows.count(_.id.isEmpty).toLong),
      "s" -> ColStats("string", ss.minOption, ss.maxOption,
        rows.count(_.s.isEmpty).toLong))
  }

  private def evalRow(r: Row, f: Filter): Boolean = f match {
    case And(l, rr) => evalRow(r, l) && evalRow(r, rr)
    case Or(l, rr) => evalRow(r, l) || evalRow(r, rr)
    case EqualTo("id", v: java.lang.Long) => r.id.contains(v.longValue)
    case EqualTo("s", v: String) => r.s.contains(v)
    case GreaterThan("id", v: java.lang.Long) => r.id.exists(_ > v.longValue)
    case GreaterThanOrEqual("id", v: java.lang.Long) => r.id.exists(_ >= v.longValue)
    case LessThan("id", v: java.lang.Long) => r.id.exists(_ < v.longValue)
    case LessThanOrEqual("id", v: java.lang.Long) => r.id.exists(_ <= v.longValue)
    case GreaterThan("s", v: String) => r.s.exists(_ > v)
    case LessThan("s", v: String) => r.s.exists(_ < v)
    case In("id", vs) => r.id.exists(x => vs.contains(java.lang.Long.valueOf(x)))
    case In("s", vs) => r.s.exists(x => vs.contains(x))
    case IsNull("id") => r.id.isEmpty
    case IsNull("s") => r.s.isEmpty
    case IsNotNull("id") => r.id.nonEmpty
    case IsNotNull("s") => r.s.nonEmpty
    case other => sys.error(s"unplanned filter $other")
  }

  test("fuzz: a pruned file never holds a matching row (500 seeded trials)") {
    val rnd = new scala.util.Random(20260814L)
    def randFilter(depth: Int): Filter = {
      def leaf(): Filter = rnd.nextInt(8) match {
        case 0 => EqualTo("id", java.lang.Long.valueOf(rnd.nextInt(40).toLong))
        case 1 => EqualTo("s", s"v${rnd.nextInt(20)}")
        case 2 => GreaterThan("id", java.lang.Long.valueOf(rnd.nextInt(40).toLong))
        case 3 => LessThan("id", java.lang.Long.valueOf(rnd.nextInt(40).toLong))
        case 4 => In("id", Array.fill(1 + rnd.nextInt(3))(
          java.lang.Long.valueOf(rnd.nextInt(40).toLong): Any))
        case 5 => IsNull(if (rnd.nextBoolean()) "id" else "s")
        case 6 => IsNotNull(if (rnd.nextBoolean()) "id" else "s")
        case _ => GreaterThanOrEqual("id", java.lang.Long.valueOf(rnd.nextInt(40).toLong))
      }
      if (depth == 0 || rnd.nextInt(3) == 0) leaf()
      else if (rnd.nextBoolean()) And(randFilter(depth - 1), randFilter(depth - 1))
      else Or(randFilter(depth - 1), randFilter(depth - 1))
    }
    (0 until 500).foreach { trial =>
      val files: Seq[(AddFile, Seq[Row])] = (0 until 1 + rnd.nextInt(5)).map { i =>
        val rows = (0 until rnd.nextInt(8)).map { _ =>
          Row(
            if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(40).toLong),
            if (rnd.nextInt(5) == 0) None else Some(s"v${rnd.nextInt(20)}"))
        }
        (AddFile(s"d-x/f$i.parquet", rows.size.toLong, 1L, statsOf(rows)), rows)
      }
      val snap = Snapshot(0L, "id BIGINT, s STRING", files.map(_._1))
      val filter = randFilter(2)
      val survivors = TxLog.pruneByFilters(snap, Seq(filter)).map(_.path).toSet
      files.foreach { case (f, rows) =>
        val hasMatch = rows.exists(evalRow(_, filter))
        assert(!hasMatch || survivors.contains(f.path),
          s"trial $trial: UNSOUND prune of ${f.path} under $filter " +
            s"(rows=$rows stats=${f.stats})")
      }
    }
  }

  test("sharpness on deterministic cases: provably-excluded files prune") {
    def file(path: String, lo: Long, hi: Long, nulls: Long, rows: Long) =
      AddFile(path, rows, 1L, Map(
        "id" -> ColStats("bigint", Some(lo.toString), Some(hi.toString), nulls)))
    val snap = Snapshot(0L, "id BIGINT",
      Seq(file("d-x/a", 0, 9, 0, 10), file("d-x/b", 10, 19, 0, 10),
        file("d-x/c", 20, 29, 0, 10)))
    def surv(f: Filter) = TxLog.pruneByFilters(snap, Seq(f)).map(_.path)
    assert(surv(EqualTo("id", java.lang.Long.valueOf(15L))) === Seq("d-x/b"))
    assert(surv(LessThan("id", java.lang.Long.valueOf(10L))) === Seq("d-x/a"))
    assert(surv(GreaterThanOrEqual("id", java.lang.Long.valueOf(20L))) === Seq("d-x/c"))
    assert(surv(In("id", Array[Any](java.lang.Long.valueOf(5L),
      java.lang.Long.valueOf(25L)))).toSet === Set("d-x/a", "d-x/c"))
    assert(surv(IsNull("id")) === Nil)
    assert(surv(Or(EqualTo("id", java.lang.Long.valueOf(1L)),
      EqualTo("id", java.lang.Long.valueOf(21L)))).toSet === Set("d-x/a", "d-x/c"))
    // pv beats stats: equality pruning with NO stats at all
    val pvSnap = Snapshot(0L, "grp STRING", Seq(
      AddFile("d-x/p0", 5, 1L, Map.empty, pv = Map("grp" -> "g0")),
      AddFile("d-x/p1", 5, 1L, Map.empty, pv = Map("grp" -> "g1"))))
    assert(TxLog.pruneByFilters(pvSnap,
      Seq(EqualTo("grp", "g1"))).map(_.path) === Seq("d-x/p1"))
  }

  test("string comparison follows UTF-8 binary order (supplementary planes)") {
    // Spark's min/max use binary (UTF-8) string order: U+E000 sorts
    // BELOW U+1F600 (emoji) there, while Java's UTF-16 compareTo says
    // the opposite (surrogates < U+E000). A comparator in the wrong
    // collation would prune a file that HOLDS the match.
    assert("".compareTo("😀") > 0, "UTF-16 disagrees (premise)")
    val f = AddFile("d-x/u", 2, 1L, Map(
      "s" -> ColStats("string", Some(""), Some("😀"), 0)))
    val snap = Snapshot(0L, "s STRING", Seq(f))
    assert(TxLog.pruneByFilters(snap,
      Seq(EqualTo("s", "😀"))).nonEmpty,
      "the emoji IS inside the binary-ordered [min,max] — must survive")
    assert(TxLog.pruneByFilters(snap,
      Seq(GreaterThan("s", ""))).nonEmpty,
      "rows above U+E000 exist in binary order")
  }
}
