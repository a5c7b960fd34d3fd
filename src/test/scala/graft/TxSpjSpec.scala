package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Storage-partitioned joins (SPARK-37375) over partition-aligned
  * TxLog tables: the SQL scan reports KeyGroupedPartitioning and tags
  * each input split with its pv key, so a join of two tables
  * partitioned on the join key plans with ZERO exchange — at 100 TB
  * the difference between a co-located merge of partition pairs and a
  * full-table shuffle of both sides. Falls back to the plain scan on
  * any eligibility miss (flag off, mixed-generation pv, aggregate
  * pushdown, partition column pruned away). */
class TxSpjSpec extends AnyFunSuite with SparkTestBase {

  private def freshCat(): (String, String) = {
    val root = graft.Scratch.dir("graft-spj").toString
    val cat = "spj" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i", s"g${i % 3}")).toDF("id", "s", "grp")
  }

  private def shuffles(d: org.apache.spark.sql.DataFrame): Int =
    d.queryExecution.executedPlan.collect { case e: ShuffleExchangeLike => e }.size

  private def withSpj[A](f: => A): A = {
    val olds = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f
    finally olds.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("co-partitioned join: zero exchanges, correct rows") {
    val (cat, root) = freshCat()
    TxLog.appendPartitioned(spark, s"$root/ta", df(0 until 30), Seq("grp"))
    TxLog.appendPartitioned(spark, s"$root/tb", df(0 until 12), Seq("grp"))
    withSpj {
      val q = spark.sql(
        s"""SELECT a.grp AS grp, count(*) AS n
            FROM $cat.ta a JOIN $cat.tb b ON a.grp = b.grp
            GROUP BY a.grp ORDER BY grp""")
      val rows = q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // per-group cross product: |ta_g| * |tb_g| = 10 * 4
      assert(rows === Seq(("g0", 40L), ("g1", 40L), ("g2", 40L)))
      // the join itself is exchange-free; only the final ORDER BY may
      // range-shuffle the 3 grouped rows
      val joinPlan = spark.sql(
        s"SELECT a.id, b.id FROM $cat.ta a JOIN $cat.tb b ON a.grp = b.grp")
      assert(shuffles(joinPlan) === 0,
        s"expected zero exchanges:\n${joinPlan.queryExecution.executedPlan}")
    }
  }

  test("flag off: plain scan, join still correct (with exchanges)") {
    val (cat, root) = freshCat()
    TxLog.appendPartitioned(spark, s"$root/ta", df(0 until 30), Seq("grp"))
    TxLog.appendPartitioned(spark, s"$root/tb", df(0 until 12), Seq("grp"))
    val q = spark.sql(
      s"SELECT count(*) AS n FROM $cat.ta a JOIN $cat.tb b ON a.grp = b.grp")
    assert(q.head().getLong(0) === 120L)
  }

  test("mixed-generation table (partition evolution) falls back soundly") {
    val (cat, root) = freshCat()
    TxLog.append(spark, s"$root/ta", df(0 until 30))        // legacy pv-less
    TxLog.setPartitioning(s"$root/ta", Seq("grp"))
    TxLog.append(spark, s"$root/ta", df(30 until 60))
    TxLog.appendPartitioned(spark, s"$root/tb", df(0 until 12), Seq("grp"))
    withSpj {
      val q = spark.sql(
        s"SELECT count(*) AS n FROM $cat.ta a JOIN $cat.tb b ON a.grp = b.grp")
      // 60 rows / 20 per grp on ta, 4 per grp on tb -> 3 * 20 * 4
      assert(q.head().getLong(0) === 240L)
      // after OPTIMIZE migrates ta, the same join is exchange-free
      TxLog.optimize(spark, s"$root/ta")
      val j = spark.sql(
        s"SELECT a.id, b.id FROM $cat.ta a JOIN $cat.tb b ON a.grp = b.grp")
      assert(shuffles(j) === 0,
        s"expected zero exchanges post-migration:\n${j.queryExecution.executedPlan}")
      assert(j.count() === 240L)
    }
  }

  test("partition column pruned from output: falls back, still correct") {
    val (cat, root) = freshCat()
    TxLog.appendPartitioned(spark, s"$root/ta", df(0 until 30), Seq("grp"))
    withSpj {
      // grp not in output or condition: scan must not report a
      // partitioning catalyst cannot resolve
      val q = spark.sql(s"SELECT sum(id) AS s FROM $cat.ta")
      assert(q.head().getLong(0) === (0L until 30L).sum)
    }
  }

  test("single-table group-by on the partition key: zero exchanges") {
    val (cat, root) = freshCat()
    TxLog.appendPartitioned(spark, s"$root/ta", df(0 until 30), Seq("grp"))
    withSpj {
      val q = spark.sql(
        s"SELECT grp, count(*) AS n FROM $cat.ta GROUP BY grp")
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        Set(("g0", 10L), ("g1", 10L), ("g2", 10L)))
      assert(shuffles(q) === 0,
        s"group-by on the partition key should aggregate in place:\n${q.queryExecution.executedPlan}")
    }
  }
}

/** SPJ robustness: partition value sets that do NOT align between the
  * two sides (one side missing values) must still join correctly —
  * whether Spark pushes the missing values as empty partitions or
  * falls back to a shuffle, the ROWS are the contract. */
class TxSpjMismatchSpec extends AnyFunSuite with SparkTestBase {

  test("mismatched partition value sets join correctly under SPJ") {
    val root = graft.Scratch.dir("graft-spjmm").toString
    val cat = "smm" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    import spark.implicits._
    // ta has g0,g1,g2; tb only g0,g2 (no g1) plus g3 unknown to ta
    TxLog.appendPartitioned(spark, s"$root/ta",
      (0 until 30).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp"), Seq("grp"))
    TxLog.appendPartitioned(spark, s"$root/tb",
      Seq((100L, "g0"), (101L, "g2"), (102L, "g2"), (103L, "g3"))
        .toDF("id", "grp"), Seq("grp"))
    val olds = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val inner = spark.sql(
        s"""SELECT a.grp AS grp, count(*) AS n FROM $cat.ta a
            JOIN $cat.tb b ON a.grp = b.grp GROUP BY a.grp ORDER BY grp""")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(inner === Seq(("g0", 10L), ("g2", 20L)))
      val left = spark.sql(
        s"""SELECT a.grp AS grp, count(b.id) AS n FROM $cat.ta a
            LEFT JOIN $cat.tb b ON a.grp = b.grp GROUP BY a.grp ORDER BY grp""")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(left === Seq(("g0", 10L), ("g1", 0L), ("g2", 20L)))
    } finally olds.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}
