package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Td
import graft.sources.TxLog

/** Parity queries for the log-based transactional table format
  * ([[graft.sources.TxLog]]) — the Delta-style capability the reference
  * gets from its platform's managed tables (table_properties,
  * reference src/diabetes_etl_pipeline.py:49-52): time travel over an
  * append log, OPTIMIZE compaction with range clustering, stats-based
  * file skipping, and VACUUM retention.
  *
  * Each query BUILDS a transactional table in a temp dir from the
  * driver's parquet testdata using deterministic doc-arithmetic splits,
  * exercises the format, and returns an aggregate the DuckDB oracle
  * re-derives from the RAW table with the same arithmetic — so the
  * entire commit/replay/skip machinery is hash-checked end to end.
  */
object TxQueries {

  /** Exact, order-insensitive sum of a double column (CoreQueries idiom):
    * decimal-sum then back to double — bit-stable across engines. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Multiset equality of two same-schema frames in ONE Spark job: a
    * signed union (got +1, want −1) grouped by every column, empty iff
    * the multisets match. Replaces the `got.count == want.count &&
    * got.exceptAll(want).isEmpty` idiom — same boolean (equal counts +
    * one-directional containment ⟺ equality), but three scheduled jobs
    * and TWO evaluations of the recompute plan become one of each (the
    * r18 steal adjudication's job-count × scheduling-latency cost; the
    * protocol family's bench weight is actions, not data). Float
    * columns group under the same NaN/-0.0 normalization exceptAll
    * uses, so the verdict is unchanged on every type in play. */
  private[queries] def multisetEqual(got: DataFrame, want: DataFrame): Boolean = {
    // an existing __w would be silently replaced by withColumn, dropping
    // that column from the equality check (r19 ADVICE item 3)
    require(!got.columns.contains("__w"),
      "multisetEqual: frames must not carry a __w column")
    val cols = got.columns.toSeq.map(col)
    got.withColumn("__w", lit(1L))
      .unionByName(want.withColumn("__w", lit(-1L)))
      .groupBy(cols: _*).agg(sum(col("__w")).as("__s"))
      .where(col("__s") =!= 0L)
      .isEmpty
  }

  val specs: Seq[QuerySpec] = Seq(

    // ---- time travel ----------------------------------------------------
    // Three appends split by pmod(l_orderkey, 3); reading VERSION AS OF 1
    // must see exactly the first two splits — the log replay, not the
    // directory (version 2's files are already on disk when we read).
    QuerySpec("q122_txlog_timetravel", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q122").toString + "/t"
      // Source scanned ONCE for the 3 slice-appends (a real pipeline
      // appending k slices of one frame reads it once too); blocks are
      // released before the format read the query actually returns.
      // a quarter of lineitem: the capability under test is log replay
      // (bench-weight trim, round 14 — q144 exercises the SQL surface)
      val li = Td.load(s, dir, "lineitem")
        .where("l_suppkey % 4 = 0").localCheckpoint(true)
      (0 to 2).foreach { k =>
        TxLog.append(s, root, li.where(pmod(col("l_orderkey"), lit(3)) === k))
      }
      graft.operators.CheckpointBlocks.release(li)
      TxLog.read(s, root, versionAsOf = Some(1L))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag")
    },
      Some("""SELECT l_returnflag, count(*) AS n_rows,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
              FROM lineitem
              WHERE l_suppkey % 4 = 0 AND l_orderkey % 3 IN (0, 1)
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- stats-based file skipping --------------------------------------
    // Unclustered append, then OPTIMIZE clustered on l_orderkey: each
    // output file owns a disjoint key range, so the readRange scan prunes
    // to O(selectivity) files from per-file min/max stats before Spark
    // schedules a single split (TxLogSpec proves the file counts; here
    // the oracle proves the pruned read loses nothing).
    QuerySpec("q123_txlog_skipping", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q123").toString + "/t"
      val li = Td.load(s, dir, "lineitem")
      TxLog.append(s, root, li.repartition(8))
      TxLog.optimize(s, root, targetBytes = 1L, sortBy = Seq("l_orderkey"))
      TxLog.readRange(s, root, "l_orderkey", "1000", "2999")
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_linestatus")
    },
      Some("""SELECT l_linestatus, count(*) AS n_rows,
                     CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
              FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2999
              GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // ---- compaction + retention lifecycle -------------------------------
    // Seven line-number appends → OPTIMIZE → VACUUM(retain 1): the
    // pre-compaction files are reclaimed, and the surviving compacted
    // snapshot must still hold every row of the original table.
    QuerySpec("q124_txlog_lifecycle", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q124").toString + "/t"
      // four of the seven line numbers: the optimize+vacuum lifecycle is
      // the capability; q179/q196 re-exercise the same path (bench-
      // weight trim, round 14)
      val li = Td.load(s, dir, "lineitem").localCheckpoint(true) // q122 rationale
      (1 to 4).foreach { ln =>
        TxLog.append(s, root, li.where(col("l_linenumber") === ln))
      }
      graft.operators.CheckpointBlocks.release(li)
      TxLog.optimize(s, root, sortBy = Seq("l_shipdate"))
      TxLog.vacuum(root, retainVersions = 1)
      TxLog.read(s, root)
        .groupBy(col("l_linenumber").cast(LongType).as("l_linenumber"))
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          max(col("l_shipdate")).as("last_ship"))
        .orderBy("l_linenumber")
    },
      Some("""SELECT CAST(l_linenumber AS BIGINT) AS l_linenumber, count(*) AS n_rows,
                     CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                     max(l_shipdate) AS last_ship
              FROM lineitem WHERE l_linenumber <= 4
              GROUP BY 1 ORDER BY l_linenumber"""))
  ,

    // ---- exactly-once streaming sink ------------------------------------
    // Four txn-tracked batches with batch 1 DELIVERED TWICE (the crash-
    // replay a foreachBatch sink must absorb): if the txn high-water mark
    // failed to skip the redelivery, batch 1's rows double and the hash
    // diverges from the raw table.
    QuerySpec("q127_txlog_stream", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q127").toString + "/t"
      // round-15 weight trim (q143 precedent): the PROTOCOL is the five
      // txn-tracked deliveries with one redelivery — a quarter slice
      // exercises it identically at a quarter of the write volume
      val li = Td.load(s, dir, "lineitem")
        .where(pmod(col("l_partkey"), lit(4)) === 1)
        .localCheckpoint(true) // q122 rationale
      def batch(b: Int) = li.where(pmod(col("l_orderkey"), lit(4)) === b)
      Seq(0, 1, 1, 2, 3).foreach { b => // batch 1 redelivered
        TxLog.appendBatch(s, root, batch(b), appId = "q127", batchId = b.toLong)
      }
      graft.operators.CheckpointBlocks.release(li)
      TxLog.read(s, root)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    },
      Some("""SELECT l_returnflag, count(*) AS n_rows,
                     CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
              FROM lineitem WHERE l_partkey % 4 = 1
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- schema evolution -----------------------------------------------
    // Narrow append (even order keys, 3 columns), then a schema-evolving
    // append of the odd keys carrying l_quantity: the merged read serves
    // the pre-evolution files with NULL quantity, which the aggregate
    // makes visible (null count + quantity sum over odd keys only).
    QuerySpec("q128_txlog_evolve", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q128").toString + "/t"
      val li = Td.load(s, dir, "lineitem")
      TxLog.append(s, root,
        li.where(pmod(col("l_orderkey"), lit(2)) === 0)
          .select("l_orderkey", "l_linenumber", "l_returnflag"))
      TxLog.appendEvolve(s, root,
        li.where(pmod(col("l_orderkey"), lit(2)) === 1)
          .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"))
      TxLog.read(s, root)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("n_null_qty"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    },
      Some("""SELECT l_returnflag, count(*) AS n_rows,
                     CAST(sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_qty,
                     CAST(sum(CASE WHEN l_orderkey % 2 = 1
                                   THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS sum_qty
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- MERGE (keyed upsert) -------------------------------------------
    // Delta-style MERGE INTO on the transactional table: build customer
    // in 3 key-split files, then upsert a source that UPDATES every 7th
    // customer (marked segment, doubled balance) and INSERTS shifted new
    // keys for every 50th. Touched files rewrite copy-on-write; the
    // oracle reconstructs the post-merge table relationally from raw
    // customer, so matched-replace + insert semantics are hash-pinned.
    QuerySpec("q132_txlog_merge", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q132").toString + "/t"
      val cust = Td.load(s, dir, "customer").localCheckpoint(true) // q122 rationale
      (0 to 2).foreach { k =>
        TxLog.append(s, root, cust.where(pmod(col("c_custkey"), lit(3)) === k))
      }
      val updates = cust.where("c_custkey % 7 = 0")
        .selectExpr("c_custkey", "c_name", "c_nationkey",
          "c_acctbal * CAST(2.0 AS DOUBLE) AS c_acctbal", "'merged' AS c_mktsegment")
      val inserts = cust.where("c_custkey % 50 = 0")
        .selectExpr("c_custkey + 1000000 AS c_custkey", "c_name", "c_nationkey",
          "c_acctbal", "'fresh' AS c_mktsegment")
      TxLog.merge(s, root, updates.unionAll(inserts), "c_custkey")
      graft.operators.CheckpointBlocks.release(cust)
      TxLog.read(s, root)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("c_nationkey")).as("n_nations"),
          dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy("c_mktsegment")
    },
      Some("""WITH merged AS (
                SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
                FROM customer WHERE c_custkey % 7 <> 0
                UNION ALL
                SELECT c_custkey, c_name, c_nationkey,
                       c_acctbal * CAST(2.0 AS DOUBLE), 'merged'
                FROM customer WHERE c_custkey % 7 = 0
                UNION ALL
                SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal, 'fresh'
                FROM customer WHERE c_custkey % 50 = 0)
              SELECT c_mktsegment, count(*) AS n_rows,
                     CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
                     CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
              FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment"""))
  ,

    // ---- run-level snapshot-isolated multi-table publish ----------------
    // Two pipeline "runs" over orders, each committing one TxLog version
    // per table and ONE TxPublish run manifest: run 1 sees only even
    // order keys, run 2 everything. The query resolves RUN 0's manifest
    // AFTER run 2 has overwritten both tables and reads both tables
    // through it — the all-old cross-table view. The oracle re-derives
    // run 1's two tables from raw orders with the same arithmetic: if
    // either read resolved "latest" instead of the pinned version (a torn
    // cross-table view), run 2's rows double the counts and the hash
    // diverges.
    QuerySpec("q133_publish_snapshot", { (s, dir) =>
      import graft.sources.TxPublish
      val root = graft.Scratch.dir("graft-q133").toString
      val orders = Td.load(s, dir, "orders").localCheckpoint(true) // q122 rationale
      def runOnce(src: DataFrame): Long = {
        val vs = TxLog.overwrite(s, s"$root/ord_status",
          src.groupBy("o_orderstatus")
            .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_price")))
        val vp = TxLog.overwrite(s, s"$root/ord_prio",
          src.groupBy("o_orderpriority")
            .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_price")))
        TxPublish.publish(root, Map("ord_status" -> vs, "ord_prio" -> vp))
      }
      runOnce(orders.where(pmod(col("o_orderkey"), lit(2)) === 0))
      runOnce(orders)
      graft.operators.CheckpointBlocks.release(orders)
      val run0 = TxPublish.readRun(s, root, runAsOf = Some(0L))
      run0("ord_status")
        .select(lit("status").as("tbl"), col("o_orderstatus").as("k"),
          col("n_rows"), col("sum_price"))
        .unionAll(run0("ord_prio")
          .select(lit("prio").as("tbl"), col("o_orderpriority").as("k"),
            col("n_rows"), col("sum_price")))
        .orderBy("tbl", "k")
    },
      Some("""WITH r1 AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0)
              SELECT * FROM (
                SELECT 'status' AS tbl, o_orderstatus AS k, count(*) AS n_rows,
                       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
                FROM r1 GROUP BY o_orderstatus
                UNION ALL
                SELECT 'prio' AS tbl, o_orderpriority AS k, count(*) AS n_rows,
                       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
                FROM r1 GROUP BY o_orderpriority)
              ORDER BY tbl, k""")),

    // ---- auto-compaction (pipelines.autoOptimize.managed parity) --------
    // Table property, not writer state: 12 single-file appends with
    // graft.autoOptimize=true and a 4-file trigger. The trigger fires
    // after appends 4/7/10 (each compaction folds the small set to one
    // file, which stays in the next round's count), so the live set ends
    // at EXACTLY 3 files and the log at version 15 (12 appends + 1
    // setProperties + 3 autoOptimize commits) — both emitted as columns
    // against oracle constants, so a compaction that misfires, overfires,
    // or drops rows breaks the hash. Thresholds are byte-independent
    // (every file "small", one output file) to keep the count exact
    // across parquet encoder versions.
    QuerySpec("q143_auto_compaction", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q143").toString + "/t"
      // one line number's rows: the 12-commit/3-compaction protocol
      // shape is the capability, not the rewrite volume (bench-weight
      // trim, round 14 — file and version pins unchanged)
      val li = Td.load(s, dir, "lineitem")
        .where("l_linenumber = 1").localCheckpoint(true)
      TxLog.append(s, root,
        li.where(pmod(col("l_orderkey"), lit(12)) === 0).coalesce(1))
      TxLog.setProperties(root, Map(
        TxLog.AutoOptimize.Enabled -> "true",
        TxLog.AutoOptimize.MinSmallFiles -> "4",
        TxLog.AutoOptimize.SmallFileBytes -> (1L << 30).toString,
        TxLog.AutoOptimize.TargetBytes -> (1L << 40).toString))
      (1 to 11).foreach { k =>
        TxLog.append(s, root,
          li.where(pmod(col("l_orderkey"), lit(12)) === k).coalesce(1))
      }
      graft.operators.CheckpointBlocks.release(li)
      val snap = TxLog.snapshot(root)
      TxLog.read(s, root)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .withColumn("n_live_files", lit(snap.files.size.toLong))
        .withColumn("last_version", lit(snap.version))
        .orderBy("l_returnflag")
    },
      Some("""SELECT l_returnflag, count(*) AS n_rows,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                     CAST(3 AS BIGINT) AS n_live_files,
                     CAST(15 AS BIGINT) AS last_version
              FROM lineitem WHERE l_linenumber = 1
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- SQL time travel (VERSION AS OF) --------------------------------
    // The q122 capability through Spark's OWN parser: a TxCatalog
    // registration makes `FROM <cat>.t VERSION AS OF 1` resolve through
    // TableCatalog.loadTable(ident, version) to the pinned snapshot's
    // file list, scanned by the native v2 parquet source. Version 1 and
    // the head are aggregated in one statement; if the time-travel read
    // leaked version 2's files, the v1 arm doubles and the hash breaks.
    // The catalog name is derived from the temp root so re-invocations
    // in one session never hit a stale cached catalog instance.
    QuerySpec("q144_sql_timetravel", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q144").toString
      val li = Td.load(s, dir, "lineitem").localCheckpoint(true) // q122 rationale
      (0 to 2).foreach { k =>
        TxLog.append(s, s"$root/t",
          li.where(pmod(col("l_orderkey"), lit(3)) === k))
      }
      graft.operators.CheckpointBlocks.release(li)
      val cat = "tx" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.TxCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.sql(
        s"""SELECT CAST(1 AS BIGINT) AS version, l_returnflag,
                   count(*) AS n_rows,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
            FROM $cat.t VERSION AS OF 1 GROUP BY l_returnflag
            UNION ALL
            SELECT CAST(2 AS BIGINT), l_returnflag, count(*),
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
            FROM $cat.t GROUP BY l_returnflag
            ORDER BY version, l_returnflag""")
    },
      Some("""SELECT CAST(1 AS BIGINT) AS version, l_returnflag, count(*) AS n_rows,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
              FROM lineitem WHERE l_orderkey % 3 IN (0, 1) GROUP BY l_returnflag
              UNION ALL
              SELECT CAST(2 AS BIGINT), l_returnflag, count(*),
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
              FROM lineitem GROUP BY l_returnflag
              ORDER BY version, l_returnflag""")),

    // ---- streaming CDC upsert (exactly-once keyed merge sink) -----------
    // Two checkpointed passes of a CSV change feed through
    // StreamingTx.upsert → TxLog.mergeBatch: pass 1 carries the base
    // rows PLUS same-batch re-updates of every 7th key (seq 2 must beat
    // seq 1 inside one micro-batch), pass 2 re-updates every 10th key.
    // The oracle reconstructs the final keyed state relationally: a
    // missed in-batch collapse aborts on duplicate keys, a replayed
    // batch doubles balances, a lost update leaves stale segments —
    // all hash-visible.
    QuerySpec("q148_stream_upsert", { (s, dir) =>
      import org.apache.spark.sql.types._
      val root = graft.Scratch.dir("graft-q148").toString
      val cust = Td.load(s, dir, "customer").localCheckpoint(true) // q122 rationale
      val schema = StructType(Seq(
        StructField("c_custkey", LongType), StructField("c_acctbal", DoubleType),
        StructField("c_mktsegment", StringType), StructField("seq", LongType)))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
      def drop(df: DataFrame, name: String): Unit = {
        val stage = s"$root/stage_$name"
        df.coalesce(1).write.option("header", "true").csv(stage)
        val f = new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".csv")).head
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(s"$root/in/$name.csv")): Unit
      }
      drop(cust.selectExpr("c_custkey", "c_acctbal", "c_mktsegment",
          "CAST(1 AS BIGINT) AS seq")
        .unionAll(cust.where("c_custkey % 7 = 0")
          .selectExpr("c_custkey", "c_acctbal * 2.0 AS c_acctbal",
            "'merged' AS c_mktsegment", "CAST(2 AS BIGINT) AS seq")), "drop0")
      graft.streaming.StreamingTx.upsert(s, s"$root/in", s"$root/t",
        s"$root/ckpt", schema, keyCol = "c_custkey", orderCol = "seq", appId = "q148")
      drop(cust.where("c_custkey % 10 = 0")
        .selectExpr("c_custkey", "c_acctbal", "'late' AS c_mktsegment",
          "CAST(3 AS BIGINT) AS seq"), "drop1")
      val fin = graft.streaming.StreamingTx.upsert(s, s"$root/in", s"$root/t",
        s"$root/ckpt", schema, keyCol = "c_custkey", orderCol = "seq", appId = "q148")
      graft.operators.CheckpointBlocks.release(cust)
      fin.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy("c_mktsegment")
    },
      Some("""WITH final AS (
                SELECT c_custkey,
                       CASE WHEN c_custkey % 10 = 0 THEN 'late'
                            WHEN c_custkey % 7 = 0 THEN 'merged'
                            ELSE c_mktsegment END AS c_mktsegment,
                       CASE WHEN c_custkey % 10 = 0 THEN c_acctbal
                            WHEN c_custkey % 7 = 0 THEN c_acctbal * 2.0
                            ELSE c_acctbal END AS c_acctbal
                FROM customer)
              SELECT c_mktsegment, count(*) AS n_rows,
                     CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
              FROM final GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- the table as a streaming SOURCE --------------------------------
    // Delta's readStream.format("delta") capability: offsets are log
    // versions, each micro-batch delivers exactly the dataChange=true
    // adds of its version range. The table is built with 3 appends AND
    // then fully compacted — if the source delivered the compaction's
    // rewrites (or missed an append), every count doubles (or drops)
    // and the hash breaks against the raw-table oracle.
    QuerySpec("q154_txlog_source", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q154").toString + "/t"
      // round-15 weight trim (q143 precedent): the PROTOCOL is three
      // appends + a compaction streamed exactly-once through the
      // source — a quarter slice streams it identically
      val li = Td.load(s, dir, "lineitem")
        .where(pmod(col("l_partkey"), lit(4)) === 2)
        .localCheckpoint(true) // q122 rationale
      (0 to 2).foreach { k =>
        TxLog.append(s, root, li.where(pmod(col("l_orderkey"), lit(3)) === k))
      }
      graft.operators.CheckpointBlocks.release(li)
      TxLog.optimize(s, root) // dataChange=false rewrites: must stream as nothing
      // aggregate IN-STREAM (complete mode): the sink then holds 3
      // aggregate rows, not 600k source rows pinned in driver memory
      // for the rest of the session (the q63 memory-sink discipline)
      val sink = s"graft_stream_src_${System.nanoTime()}"
      val q = s.readStream.format("txlog").option("path", root).load()
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast(DecimalType(18, 4))).as("dq"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink)
        .select(col("l_returnflag"), col("n_rows"),
          col("dq").cast(DoubleType).as("sum_qty"))
        .orderBy("l_returnflag")
    },
      Some("""SELECT l_returnflag, count(*) AS n_rows,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
              FROM lineitem WHERE l_partkey % 4 = 2
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- incremental medallion over the format --------------------------
    // The DLT-style loop built ONLY from engine pieces: a bronze TxLog
    // table streams through format("txlog") (offsets = versions), each
    // micro-batch folds its PARTIAL aggregate into a silver TxLog table
    // via txn-tagged merge — two checkpointed passes over a growing
    // bronze, and silver must equal the one-shot batch aggregate of
    // everything. Partial sums ride DECIMAL in silver (additive across
    // batches must be exact; double addition is not associative) and
    // only the final read casts to DOUBLE. A missed batch, a replayed
    // batch, or a delivered rewrite all corrupt the totals and break
    // the hash.
    QuerySpec("q155_incremental_medallion", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q155").toString
      val (bronze, silver) = (s"$root/bronze", s"$root/silver")
      val li = Td.load(s, dir, "lineitem").localCheckpoint(true) // q122 rationale
      def ingestPass(): Unit = {
        val q = s.readStream.format("txlog").option("path", bronze).load()
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            val s2 = batch.sparkSession
            val partial = batch.groupBy("l_returnflag")
              .agg(count(lit(1)).as("n_rows"),
                sum(col("l_quantity").cast(DecimalType(18, 4))).as("sum_qty"))
            val current =
              if (TxLog.latestVersion(silver) >= 0) TxLog.read(s2, silver)
              else partial.where(lit(false))
            val folded = current.unionByName(partial)
              .groupBy("l_returnflag")
              .agg(sum(col("n_rows")).as("n_rows"),
                sum(col("sum_qty")).cast(DecimalType(18, 4)).as("sum_qty"))
            TxLog.mergeBatch(s2, silver, folded, "l_returnflag",
              appId = "q155", batchId = batchId): Unit
          }
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      (0 to 1).foreach { k =>
        TxLog.append(s, bronze, li.where(pmod(col("l_orderkey"), lit(3)) === k))
      }
      ingestPass() // sees versions 0..1 as one batch
      TxLog.append(s, bronze, li.where(pmod(col("l_orderkey"), lit(3)) === 2))
      graft.operators.CheckpointBlocks.release(li)
      ingestPass() // sees only version 2
      TxLog.read(s, silver)
        .selectExpr("l_returnflag", "CAST(n_rows AS BIGINT) AS n_rows",
          "CAST(sum_qty AS DOUBLE) AS sum_qty")
        .orderBy("l_returnflag")
    },
      Some("""SELECT l_returnflag, count(*) AS n_rows,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- row-level DELETE (predicate + GDPR key-list) --------------------
    // Build the table as 6 files, DELETE a predicate slice, then erase a
    // DISTRIBUTED key list (deleteKeys — the MERGE…WHEN MATCHED THEN
    // DELETE path); copy-on-write rewrites only touched files. The
    // oracle re-derives the surviving set from the raw table with the
    // same arithmetic, so a row lost from an UNtouched file, a survivor
    // dropped from a rewritten one, or an under-deleted key all break
    // the hash. Time travel back to v0 proves deletion is logical.
    QuerySpec("q156_txlog_delete", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q156").toString + "/t"
      val docs = Td.load(s, dir, "documents")
        .select("doc_id", "lang", "text")
      TxLog.append(s, root, docs.repartition(6))
      TxLog.delete(s, root, "lang = 'de' AND doc_id % 7 = 3")
      val erase = Td.load(s, dir, "documents")
        .where("doc_id % 13 = 5").select("doc_id")
      TxLog.deleteKeys(s, root, erase, "doc_id")
      val live = TxLog.read(s, root)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("n_chars"))
      val v0 = TxLog.read(s, root, versionAsOf = Some(0L))
        .agg(count(lit(1)).cast("long").as("v0_docs"))
      live.crossJoin(v0).orderBy("lang")
    },
      Some("""WITH survivors AS (
                SELECT doc_id, lang, text FROM documents
                WHERE NOT (lang = 'de' AND doc_id % 7 = 3)
                  AND NOT (doc_id % 13 = 5)),
              v0 AS (SELECT CAST(count(*) AS BIGINT) AS v0_docs FROM documents)
              SELECT lang, count(*) AS n_docs,
                     CAST(sum(length(text)) AS BIGINT) AS n_chars, v0.v0_docs
              FROM survivors CROSS JOIN v0
              GROUP BY lang, v0.v0_docs ORDER BY lang""")),

    // ---- row-level UPDATE -----------------------------------------------
    // UPDATE SET over a predicate slice where the SET expression reads
    // OTHER columns' pre-update values (SQL UPDATE semantics); schema is
    // invariant (cast-back); untouched rows ride through unchanged. The
    // oracle replays the update as a CASE projection over the raw
    // table — decimal-sum so the totals are bit-stable.
    QuerySpec("q157_txlog_update", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q157").toString + "/t"
      val li = Td.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      TxLog.append(s, root, li.repartition(6))
      TxLog.update(s, root, "l_returnflag = 'R'",
        Map("l_quantity" -> "l_quantity + l_linenumber"))
      TxLog.read(s, root)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    },
      Some("""SELECT l_returnflag, count(*) AS n_rows,
                     CAST(sum(CAST(CASE WHEN l_returnflag = 'R'
                                        THEN l_quantity + l_linenumber
                                        ELSE l_quantity END AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- SQL write path through the catalog ------------------------------
    // CTAS + two INSERT INTOs + ALTER ADD COLUMNS + a post-widening
    // insert, all in PLAIN SQL against the TxCatalog — every statement
    // lands as a log commit (V1Write → TxLog.append, so the SQL path
    // shares the whole commit protocol). The readback aggregates across
    // the widened column; the oracle re-derives the same table state
    // from the raw parquet, so a dropped insert, a mis-aligned CTAS
    // column, or a widening that rewrote history all break the hash.
    QuerySpec("q158_sql_writes", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q158").toString
      val cat = "sqlw" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      Td.load(s, dir, "orders").createOrReplaceTempView("q158_orders")
      s.sql(s"""CREATE TABLE $cat.ord AS
                SELECT o_orderkey, o_orderstatus, o_totalprice
                FROM q158_orders WHERE o_orderkey % 3 = 0""")
      s.sql(s"""INSERT INTO $cat.ord
                SELECT o_orderkey, o_orderstatus, o_totalprice
                FROM q158_orders WHERE o_orderkey % 3 = 1""")
      s.sql(s"ALTER TABLE $cat.ord ADD COLUMNS (price_band BIGINT)")
      s.sql(s"""INSERT INTO $cat.ord
                SELECT o_orderkey, o_orderstatus, o_totalprice,
                       CAST(floor(o_totalprice / 50000) AS BIGINT)
                FROM q158_orders WHERE o_orderkey % 3 = 2""")
      s.sql(s"""SELECT o_orderstatus,
                       count(*) AS n_rows,
                       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                       CAST(sum(coalesce(price_band, -1)) AS BIGINT) AS band_sum
                FROM $cat.ord
                GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    },
      Some("""SELECT o_orderstatus, count(*) AS n_rows,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     CAST(sum(CASE WHEN o_orderkey % 3 = 2
                                   THEN CAST(floor(o_totalprice / 50000) AS BIGINT)
                                   ELSE -1 END) AS BIGINT) AS band_sum
              FROM orders
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- column mapping (rename/drop without rewrite) --------------------
    // Rename a column (metadata-only), DELETE through the NEW name (DML
    // resolves the mapping), drop a column, then RE-ADD the same name:
    // the re-added column must read all-NULL — resurrecting the dropped
    // bytes from old files is the column-mapping failure mode. The
    // oracle re-derives the surviving rows and pins n_names = 0, so a
    // resurrection, a mis-mapped delete, or a rename that lost data all
    // break the hash.
    QuerySpec("q159_column_mapping", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q159").toString + "/t"
      val cust = Td.load(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      TxLog.append(s, root, cust.repartition(4))
      TxLog.renameColumn(root, "c_acctbal", "balance")
      TxLog.delete(s, root, "balance < 0")
      TxLog.dropColumn(root, "c_name")
      TxLog.addColumns(root, Seq(StructField("c_name", StringType)))
      TxLog.read(s, root)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("balance")).as("sum_balance"),
          count(col("c_name")).as("n_names"))
        .orderBy("c_mktsegment")
    },
      Some("""SELECT c_mktsegment, count(*) AS n_rows,
                     CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_balance,
                     CAST(0 AS BIGINT) AS n_names
              FROM customer WHERE NOT (c_acctbal < 0)
              GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- change data feed ------------------------------------------------
    // Enable CDF, then DELETE a slice and UPDATE another: the feed must
    // serve the original inserts (synthesized from data files), the
    // deleted rows, and both update images — aggregated per change type
    // with decimal-exact value sums the oracle re-derives from the raw
    // table. A missed deletion, a double-reported postimage, or an
    // image with post-update values in the preimage all break the hash.
    QuerySpec("q160_change_feed", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q160").toString + "/t"
      val part = Td.load(s, dir, "part")
        .select("p_partkey", "p_type", "p_retailprice")
      TxLog.append(s, root, part.repartition(4))
      TxLog.setProperties(root, Map(TxLog.Cdf.Enabled -> "true"))
      TxLog.delete(s, root, "p_partkey % 11 = 3")
      TxLog.update(s, root, "p_partkey % 11 = 5",
        Map("p_retailprice" -> "p_retailprice + 100.0"))
      TxLog.readChangeFeed(s, root, fromVersionExclusive = -1L)
        .groupBy(col("_change_type"))
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("p_retailprice")).as("sum_price"))
        .orderBy("_change_type")
    },
      Some("""WITH feed AS (
                SELECT 'insert' AS _change_type, p_retailprice FROM part
                UNION ALL
                SELECT 'delete', p_retailprice FROM part WHERE p_partkey % 11 = 3
                UNION ALL
                SELECT 'update_preimage', p_retailprice FROM part WHERE p_partkey % 11 = 5
                UNION ALL
                SELECT 'update_postimage', p_retailprice + 100.0 FROM part WHERE p_partkey % 11 = 5)
              SELECT _change_type, count(*) AS n_rows,
                     CAST(sum(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
              FROM feed GROUP BY _change_type ORDER BY _change_type""")),

    // ---- CDC mirror: the GDPR-propagation loop ---------------------------
    // A downstream mirror maintained ONLY from the source's streaming
    // change feed (readChangeFeed=true, one version per trigger):
    // inserts/update-postimages upsert via txn-tagged mergeBatch
    // (replay-idempotent), deletions propagate via deleteKeys
    // (naturally idempotent — deleting absent keys is a no-op). Two
    // checkpointed passes over a mutating source; the mirror must
    // converge to the source's surviving state, which the oracle
    // re-derives from the raw table — a dropped deletion, a stale
    // update, or a double-applied batch all break the hash.
    QuerySpec("q161_cdf_mirror", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q161").toString
      val (src, mirror, ckpt) = (s"$root/src", s"$root/mirror", s"$root/ckpt")
      val sup = Td.load(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
      TxLog.append(s, src, sup.repartition(4))
      TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
      def sync(): Unit = {
        val q = s.readStream.format("txlog").option("path", src)
          .option("readChangeFeed", "true")
          .option("maxVersionsPerTrigger", "1").load()
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            val s2 = batch.sparkSession
            val ups = batch
              .where(col("_change_type").isin("insert", "update_postimage"))
              .select("s_suppkey", "s_nationkey", "s_acctbal")
            val dels = batch.where(col("_change_type") === "delete")
              .select("s_suppkey")
            if (!ups.isEmpty)
              TxLog.mergeBatch(s2, mirror, ups, "s_suppkey", "q161", batchId): Unit
            if (!dels.isEmpty && TxLog.latestVersion(mirror) >= 0)
              TxLog.deleteKeys(s2, mirror, dels, "s_suppkey"): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      sync() // pass 1: the initial inserts
      TxLog.delete(s, src, "s_suppkey % 9 = 2")
      TxLog.update(s, src, "s_suppkey % 9 = 4",
        Map("s_acctbal" -> "s_acctbal + 50.0"))
      sync() // pass 2: resumes mid-log, applies exactly the DML versions
      TxLog.read(s, mirror)
        .groupBy(col("s_nationkey").cast(LongType).as("s_nationkey"))
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("s_acctbal")).as("sum_bal"))
        .orderBy("s_nationkey")
    },
      Some("""SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
                     count(*) AS n_rows,
                     CAST(sum(CAST(CASE WHEN s_suppkey % 9 = 4
                                        THEN s_acctbal + 50.0
                                        ELSE s_acctbal END AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
              FROM supplier WHERE NOT (s_suppkey % 9 = 2)
              GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // ---- deletion vectors: merge-on-read DML -----------------------------
    // The full DV lifecycle on one table: predicate DELETE and key
    // erasure write POSITION LISTS (no data file is rewritten — the
    // 100 TB GDPR cost model), an UPDATE kills old images via vector
    // and appends new rows, and REORG-PURGE rewrites the DV files clean.
    // The aggregate runs over the POST-PURGE table, so a vector that
    // missed a row, resurrected one through the rewrite, or double-
    // applied through the merged descriptor all break the hash; the
    // v0 time-travel count pins the pre-DML state alongside.
    QuerySpec("q162_txlog_dv", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q162").toString + "/t"
      val docs = Td.load(s, dir, "documents")
        .select("doc_id", "lang", "text")
      TxLog.append(s, root, docs.repartition(6))
      TxLog.setProperties(root, Map(TxLog.DeletionVectors.Enabled -> "true"))
      TxLog.delete(s, root, "lang = 'en' AND doc_id % 5 = 2")
      val erase = Td.load(s, dir, "documents")
        .where("doc_id % 11 = 7").select("doc_id")
      TxLog.deleteKeys(s, root, erase, "doc_id")
      TxLog.update(s, root, "doc_id % 17 = 3",
        Map("lang" -> "concat(lang, '2')"))
      TxLog.purgeDeletes(s, root)
      val live = TxLog.read(s, root)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("n_chars"))
      val v0 = TxLog.read(s, root, versionAsOf = Some(0L))
        .agg(count(lit(1)).cast("long").as("v0_docs"))
      live.crossJoin(v0).orderBy("lang")
    },
      Some("""WITH survivors AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 17 = 3 THEN lang || '2' ELSE lang END AS lang,
                       text
                FROM documents
                WHERE NOT (lang = 'en' AND doc_id % 5 = 2)
                  AND NOT (doc_id % 11 = 7)),
              v0 AS (SELECT CAST(count(*) AS BIGINT) AS v0_docs FROM documents)
              SELECT lang, count(*) AS n_docs,
                     CAST(sum(length(text)) AS BIGINT) AS n_chars, v0.v0_docs
              FROM survivors CROSS JOIN v0
              GROUP BY lang, v0.v0_docs ORDER BY lang""")),

    // ---- shallow clone ---------------------------------------------------
    // Zero-copy CLONE then full divergence: the source takes a DELETE,
    // the clone takes an append — each side must see exactly its own
    // history (a clone that shares live state with its source, or a
    // clone whose files the source's DML mutated, breaks one side's
    // half of the hash). Both sides aggregated with a side label; the
    // oracle re-derives each from the raw table arithmetic.
    QuerySpec("q164_txlog_clone", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q164").toString
      val (src, dst) = (s"$root/src", s"$root/clone")
      val part = Td.load(s, dir, "part")
        .select("p_partkey", "p_type", "p_retailprice")
      TxLog.append(s, src, part.repartition(4))
      TxLog.shallowClone(src, dst)
      TxLog.delete(s, src, "p_partkey % 4 = 1")
      TxLog.append(s, dst, part.where("p_partkey % 9 = 0"))
      def side(dirPath: String, label: String) =
        TxLog.read(s, dirPath).agg(
          count(lit(1)).as("n_rows"),
          dsum(col("p_retailprice")).as("sum_price"))
          .select(lit(label).as("side"), col("n_rows"), col("sum_price"))
      side(src, "src").unionAll(side(dst, "clone")).orderBy("side")
    },
      Some("""SELECT 'clone' AS side,
                     count(*) + (SELECT count(*) FROM part WHERE p_partkey % 9 = 0) AS n_rows,
                     CAST(sum(CAST(p_retailprice AS DECIMAL(18,4)))
                          + (SELECT sum(CAST(p_retailprice AS DECIMAL(18,4)))
                             FROM part WHERE p_partkey % 9 = 0) AS DOUBLE) AS sum_price
              FROM part
              UNION ALL
              SELECT 'src' AS side, count(*) AS n_rows,
                     CAST(sum(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
              FROM part WHERE NOT (p_partkey % 4 = 1)
              ORDER BY side"""))
  ,

    // ---- multi-column z-order + box-query file skipping ------------------
    // OPTIMIZE ZORDER BY three numeric columns, then a conjunctive
    // 3-range box through readRanges: stats pruning picks the candidate
    // files, the residual predicate trims rows — a pruning bug that
    // drops a straddling file loses rows and breaks the hash (the
    // skipped-file path is the one a plain filter query never exercises).
    // The oracle is the same box over the raw table.
    QuerySpec("q166_zorder_box", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q166").toString + "/t"
      val li = Td.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount")
      TxLog.append(s, root, li.repartition(16))
      TxLog.optimize(s, root, targetBytes = 128L * 1024,
        zorderBy = Seq("l_quantity", "l_extendedprice", "l_discount"))
      TxLog.readRanges(s, root, Seq(
          ("l_quantity", "10", "30"),
          ("l_extendedprice", "10000", "40000"),
          ("l_discount", "0.02", "0.06")))
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum(col("l_quantity")).as("sum_qty"))
    },
      Some("""SELECT count(*) AS n_rows,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
              FROM lineitem
              WHERE l_quantity BETWEEN 10 AND 30
                AND l_extendedprice BETWEEN 10000 AND 40000
                AND l_discount BETWEEN 0.02 AND 0.06""")),

    // ---- format-native incremental pipeline (source → sink) --------------
    // bronze txlog → `readStream.format("txlog")` → stateless transform →
    // `writeStream.format("txlog")` in Append mode: the whole medallion
    // hop with ZERO foreachBatch — offsets are log versions on the read
    // side, txn-tagged exactly-once commits on the write side, both from
    // the engine. Two checkpointed passes over a growing bronze; silver
    // must equal the one-shot batch transform of everything (a missed
    // version, replayed batch, or delivered rewrite all corrupt it).
    QuerySpec("q167_stream_sink", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q167").toString
      val (bronze, silver, ckpt) = (s"$root/bronze", s"$root/silver", s"$root/ckpt")
      val ev = Td.load(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      TxLog.append(s, bronze, ev.where("event_id % 2 = 0").repartition(2))
      def pass(): Unit = {
        val q = s.readStream.format("txlog").option("path", bronze).load()
          .where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            (col("user_id") % 10).as("cohort"), col("value"))
          .writeStream.format("txlog")
          .option("path", silver)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      pass() // even half
      TxLog.append(s, bronze, ev.where("event_id % 2 = 1").repartition(2))
      pass() // resumes mid-log, delivers exactly the odd half
      TxLog.read(s, silver)
        .groupBy("cohort")
        .agg(count(lit(1)).as("n_purchases"),
          dsum(col("value")).as("sum_value"))
        .orderBy("cohort")
    },
      Some("""SELECT user_id % 10 AS cohort, count(*) AS n_purchases,
                     CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
              FROM events WHERE event_type = 'purchase'
              GROUP BY 1 ORDER BY cohort""")),

    // ---- the full SQL DML triangle ---------------------------------------
    // UPDATE (planner strategy), MERGE upsert (UPDATE SET * + INSERT *),
    // and MERGE erasure (WHEN MATCHED THEN DELETE) — all in plain SQL
    // against the catalog, all landing through the one Scala commit
    // protocol. The oracle replays the three statements as relational
    // algebra over the raw table: an update that leaked to non-matching
    // rows, an upsert that missed an insert, or an erasure that over- or
    // under-deleted each breaks the hash.
    QuerySpec("q168_sql_dml", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q168").toString
      val cat = "dmlq" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      val cust = Td.load(s, dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      TxLog.append(s, s"$root/c", cust.repartition(4))
      // 1. UPDATE: boost BUILDING balances, reading pre-update values
      s.sql(s"""UPDATE $cat.c SET c_acctbal = c_acctbal + 100.0
                WHERE c_mktsegment = 'BUILDING' AND c_custkey % 3 = 0""")
      // 2. MERGE upsert: re-segment a slice + inject synthetic rows
      Td.load(s, dir, "customer")
        .where("c_custkey % 10 = 4")
        .selectExpr("c_custkey + 1000000 AS c_custkey",
          "'SYNTH' AS c_mktsegment", "c_acctbal")
        .unionAll(Td.load(s, dir, "customer")
          .where("c_custkey % 10 = 7")
          .selectExpr("c_custkey", "'MOVED' AS c_mktsegment",
            "c_acctbal"))
        .createOrReplaceTempView("q168_src")
      s.sql(s"""MERGE INTO $cat.c USING q168_src ON c.c_custkey = q168_src.c_custkey
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""")
      // 3. MERGE erasure: GDPR out a key slice
      Td.load(s, dir, "customer").where("c_custkey % 13 = 2")
        .select("c_custkey").createOrReplaceTempView("q168_erase")
      s.sql(s"""MERGE INTO $cat.c USING q168_erase ON c.c_custkey = q168_erase.c_custkey
                WHEN MATCHED THEN DELETE""")
      s.sql(s"""SELECT c_mktsegment, count(*) AS n_rows,
                       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
                FROM $cat.c GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },
      Some("""WITH merged AS (
                -- %10=7 rows were REPLACED by the merge with raw source
                -- rows (segment MOVED, raw balance — even if the earlier
                -- UPDATE had touched them); otherwise the UPDATE's +100
                -- applies to its BUILDING slice
                SELECT c_custkey,
                       CASE WHEN c_custkey % 10 = 7 THEN 'MOVED'
                            ELSE c_mktsegment END AS c_mktsegment,
                       CASE WHEN c_custkey % 10 = 7 THEN c_acctbal
                            WHEN c_mktsegment = 'BUILDING' AND c_custkey % 3 = 0
                            THEN c_acctbal + 100.0
                            ELSE c_acctbal END AS c_acctbal
                FROM customer
                UNION ALL
                SELECT c_custkey + 1000000, 'SYNTH', c_acctbal
                FROM customer WHERE c_custkey % 10 = 4),
              survivors AS (
                -- the erase list holds RAW custkeys only — a synthetic
                -- key whose offset value happens to hit %13=2 survives
                SELECT * FROM merged WHERE c_custkey NOT IN (
                  SELECT c_custkey FROM customer WHERE c_custkey % 13 = 2))
              SELECT c_mktsegment, count(*) AS n_rows,
                     CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
              FROM survivors GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- CONVERT TO the format -------------------------------------------
    // A plain parquet export (what every existing job already produces)
    // adopted as a transactional table with zero data copy, then
    // exercised as one: a row-level DELETE lands on the converted files
    // and the aggregate runs over the survivors — a conversion that
    // dropped a file, mis-linked one, or produced stats that misprune
    // all break the hash; the v0 count pins the adopted state.
    QuerySpec("q170_convert", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q170").toString + "/t"
      Td.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .repartition(4).write.parquet(root)
      TxLog.convertFromParquet(s, root)
      TxLog.delete(s, root, "o_orderkey % 6 = 2")
      val live = TxLog.read(s, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("o_totalprice")).as("sum_price"))
      val v0 = TxLog.read(s, root, versionAsOf = Some(0L))
        .agg(count(lit(1)).cast("long").as("v0_rows"))
      live.crossJoin(v0).orderBy("o_orderstatus")
    },
      Some("""WITH v0 AS (SELECT CAST(count(*) AS BIGINT) AS v0_rows FROM orders)
              SELECT o_orderstatus, count(*) AS n_rows,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     v0.v0_rows
              FROM orders CROSS JOIN v0
              WHERE NOT (o_orderkey % 6 = 2)
              GROUP BY o_orderstatus, v0.v0_rows
              ORDER BY o_orderstatus""")),

    // ---- optimistic conflict RESOLUTION for DML ----------------------------
    // Interleaved multi-writer history: a DELETE pinned at v0 races an
    // append (v1) and REBASES instead of failing; an UPDATE pinned at the
    // delete's result races another append and rebases too. The oracle
    // replays the SERIAL order the rebase guarantees (each DML applies to
    // exactly its read snapshot's rows; the racing appends' rows ride
    // through untouched even where they match the predicates), and
    // n_versions pins the log shape — a rebase that double-applied,
    // dropped a winner's rows, or silently merged commits breaks the hash.
    QuerySpec("q171_concurrent_dml", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q171").toString + "/t"
      val li = Td.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .localCheckpoint(true)
      TxLog.append(s, root, li.where("l_orderkey % 4 IN (0, 1)").repartition(4)) // v0
      TxLog.append(s, root, li.where("l_orderkey % 4 = 2").repartition(2))       // v1 wins
      // the delete read v0; the rebase lands it at v2
      TxLog.deleteAt(s, root, "l_returnflag = 'R' AND l_linenumber = 1",
        readVersion = 0L)
      TxLog.append(s, root, li.where("l_orderkey % 4 = 3").repartition(2))       // v3 wins
      // the update read v2; the rebase lands it at v4
      TxLog.updateAt(s, root, "l_returnflag = 'A'",
        Map("l_quantity" -> "l_quantity + 1"), readVersion = 2L)
      TxLog.read(s, root)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .withColumn("n_versions", lit(TxLog.latestVersion(root)))
        .orderBy("l_returnflag")
    },
      Some("""WITH base AS (
                SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
                FROM lineitem WHERE l_orderkey % 4 IN (0, 1)),
              w1 AS (
                SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
                FROM lineitem WHERE l_orderkey % 4 = 2),
              w2 AS (
                SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
                FROM lineitem WHERE l_orderkey % 4 = 3),
              after_delete AS (
                -- serial order: DELETE before the v1 append — w1 rows
                -- survive even where they match the delete predicate
                SELECT * FROM base
                WHERE NOT (l_returnflag = 'R' AND l_linenumber = 1)
                UNION ALL SELECT * FROM w1),
              after_update AS (
                -- serial order: UPDATE before the v3 append
                SELECT l_returnflag,
                       CASE WHEN l_returnflag = 'A' THEN l_quantity + 1
                            ELSE l_quantity END AS l_quantity
                FROM after_delete
                UNION ALL SELECT l_returnflag, l_quantity FROM w2)
              SELECT l_returnflag, count(*) AS n_rows,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                     CAST(4 AS BIGINT) AS n_versions
              FROM after_update GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- MERGE with write-path schema evolution ----------------------------
    // An evolving CDC pipeline: batch 0 upserts under the original
    // schema; batch 1 arrives with a NEW column (upstream ALTER TABLE
    // mid-run) and the `graft.autoMerge` table property adopts it in the
    // same commit as the upsert — history and the unmatched remainder
    // read it as NULL. A replayed batch id is skipped (exactly-once
    // holds through the evolving path). The oracle replays both batches
    // as unioned CTEs over the raw table; a widening that rewrote
    // history, a dropped upsert, or a double-applied replay all break
    // the hash.
    QuerySpec("q172_merge_evolve", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q172").toString + "/t"
      val cust = Td.load(s, dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal").localCheckpoint(true)
      TxLog.append(s, root, cust.where("c_custkey % 3 = 0").repartition(4))
      TxLog.setProperties(root, Map(TxLog.AutoMerge.Enabled -> "true"))
      val b0 = cust.where("c_custkey % 6 = 0")
        .withColumn("c_acctbal", col("c_acctbal") + 50.0)
        .unionByName(cust.where("c_custkey % 3 = 1"))
      TxLog.mergeBatch(s, root, b0, "c_custkey", "cdc", 0L)
      val b1 = cust.where("c_custkey % 5 = 2")
        .withColumn("c_tier", floor(col("c_acctbal") / 1000).cast("long"))
      TxLog.mergeBatch(s, root, b1, "c_custkey", "cdc", 1L)
      TxLog.mergeBatch(s, root, b1, "c_custkey", "cdc", 1L) // replay: skipped
      TxLog.read(s, root)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("c_acctbal")).as("sum_bal"),
          sum(coalesce(col("c_tier"), lit(-1L))).cast("long").as("tier_sum"))
        .orderBy("c_mktsegment")
    },
      Some("""WITH state0 AS (
                SELECT c_custkey, c_mktsegment, c_acctbal
                FROM customer WHERE c_custkey % 3 = 0),
              b0 AS (
                SELECT c_custkey, c_mktsegment, c_acctbal + 50.0 AS c_acctbal
                FROM customer WHERE c_custkey % 6 = 0
                UNION ALL
                SELECT c_custkey, c_mktsegment, c_acctbal
                FROM customer WHERE c_custkey % 3 = 1),
              after_b0 AS (
                SELECT * FROM state0
                WHERE c_custkey NOT IN (SELECT c_custkey FROM b0)
                UNION ALL SELECT * FROM b0),
              b1 AS (
                SELECT c_custkey, c_mktsegment, c_acctbal,
                       CAST(floor(c_acctbal / 1000) AS BIGINT) AS c_tier
                FROM customer WHERE c_custkey % 5 = 2),
              after_b1 AS (
                SELECT c_custkey, c_mktsegment, c_acctbal,
                       CAST(NULL AS BIGINT) AS c_tier
                FROM after_b0
                WHERE c_custkey NOT IN (SELECT c_custkey FROM b1)
                UNION ALL SELECT * FROM b1)
              SELECT c_mktsegment, count(*) AS n_rows,
                     CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
                     CAST(sum(coalesce(c_tier, -1)) AS BIGINT) AS tier_sum
              FROM after_b1 GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- full ALTER TABLE surface in plain SQL -----------------------------
    // CTAS → RENAME COLUMN (metadata-only, column mapping) → UPDATE and
    // DELETE through the NEW name → the aggregate reads the renamed
    // column. The whole lifecycle is SQL against the catalog; the oracle
    // replays the UPDATE as a CASE projection and the DELETE as a
    // predicate over it — a rename that lost the mapping, DML that
    // resolved the old physical name, or a rewrite that dropped rows all
    // break the hash.
    QuerySpec("q173_sql_alter", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q173").toString
      val cat = "alt" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      Td.load(s, dir, "orders").createOrReplaceTempView("q173_orders")
      s.sql(s"""CREATE TABLE $cat.ord AS
                SELECT o_orderkey, o_orderstatus, o_totalprice
                FROM q173_orders WHERE o_orderkey % 2 = 0""")
      s.sql(s"ALTER TABLE $cat.ord RENAME COLUMN o_totalprice TO price")
      s.sql(s"UPDATE $cat.ord SET price = price * 1.1 WHERE o_orderstatus = 'F'")
      s.sql(s"DELETE FROM $cat.ord WHERE price < 1000")
      s.sql(s"""SELECT o_orderstatus, count(*) AS n_rows,
                       CAST(sum(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
                FROM $cat.ord
                GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    },
      Some("""WITH renamed AS (
                SELECT o_orderstatus,
                       CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 1.1
                            ELSE o_totalprice END AS price
                FROM orders WHERE o_orderkey % 2 = 0),
              survivors AS (SELECT * FROM renamed WHERE NOT (price < 1000))
              SELECT o_orderstatus, count(*) AS n_rows,
                     CAST(sum(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
              FROM survivors GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- first-class partition columns -------------------------------------
    // A table created with partitionBy stages one file per partition
    // value (pv metadata in the log), a dynamic-partition overwrite
    // replaces the 'F' partition by metadata, and readPartition serves
    // the 'O' slice through O(1) pv pruning — the result folds the
    // pruned read and the full post-overwrite state together, so a
    // mis-assigned pv, an overwrite that leaked into another partition,
    // or pruning that dropped a file all break the hash.
    QuerySpec("q174_partitioned_table", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q174").toString + "/t"
      val ord = Td.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice").localCheckpoint(true)
      TxLog.appendPartitioned(s, root, ord, Seq("o_orderstatus"))
      val replF = ord.where("o_orderstatus = 'F' AND o_orderkey % 2 = 0")
        .withColumn("o_totalprice", col("o_totalprice") * 0.9)
      TxLog.overwritePartitions(s, root, replF)
      val oAgg = TxLog.readPartition(s, root, Map("o_orderstatus" -> "O"))
        .agg(count(lit(1)).as("o_rows"), dsum(col("o_totalprice")).as("o_sum"))
      TxLog.read(s, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_price"))
        .crossJoin(oAgg)
        .orderBy("o_orderstatus")
    },
      Some("""WITH t AS (
                SELECT o_orderkey, o_orderstatus, o_totalprice
                FROM orders WHERE o_orderstatus <> 'F'
                UNION ALL
                SELECT o_orderkey, o_orderstatus, o_totalprice * 0.9
                FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 2 = 0),
              o AS (
                SELECT count(*) AS o_rows,
                       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS o_sum
                FROM t WHERE o_orderstatus = 'O')
              SELECT o_orderstatus, count(*) AS n_rows,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     o.o_rows, o.o_sum
              FROM t CROSS JOIN o
              GROUP BY o_orderstatus, o.o_rows, o.o_sum
              ORDER BY o_orderstatus""")),

    // ---- SQL partition pruning end-to-end ----------------------------------
    // CREATE TABLE … PARTITIONED BY through the catalog, INSERT (stages
    // partition-aligned), then partition- and range-scoped SELECTs whose
    // pushed filters prune the file list via pv/stats before the scan
    // (TxCatalogSpec proves foreign files never open via the
    // corrupt-file probe; this entry hash-gates the ANSWERS the pruned
    // plans produce). The oracle replays both slices over raw parquet.
    QuerySpec("q175_sql_skipping", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q175").toString
      val cat = "skp" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.sql(s"""CREATE TABLE $cat.li (
                  l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE)
                PARTITIONED BY (l_returnflag)""")
      Td.load(s, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity")
        .createOrReplaceTempView("q175_li")
      s.sql(s"INSERT INTO $cat.li SELECT * FROM q175_li")
      s.sql(s"""WITH part AS (
                  SELECT count(*) AS r_rows,
                         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS r_qty
                  FROM $cat.li WHERE l_returnflag = 'R'),
                rng AS (
                  SELECT count(*) AS lo_rows
                  FROM $cat.li WHERE l_returnflag IN ('A', 'N') AND l_orderkey < 1000)
                SELECT part.r_rows, part.r_qty, rng.lo_rows
                FROM part CROSS JOIN rng""")
    },
      Some("""WITH part AS (
                SELECT count(*) AS r_rows,
                       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS r_qty
                FROM lineitem WHERE l_returnflag = 'R'),
              rng AS (
                SELECT count(*) AS lo_rows
                FROM lineitem WHERE l_returnflag IN ('A', 'N') AND l_orderkey < 1000)
              SELECT part.r_rows, part.r_qty, rng.lo_rows
              FROM part CROSS JOIN rng""")),

    // ---- partition maintenance lifecycle, all from SQL ---------------------
    // Two INSERTs build 2 files per partition; INSERT OVERWRITE …
    // PARTITION ('F') replaces that partition wholesale with a
    // discounted slice (static-clause semantics: rows outside the named
    // partition are refused, other partitions never open); CALL
    // optimize_partition compacts + sorts the O partition and its
    // (files_before, files_after) = (2, 1) is pinned into the result —
    // a scoped rewrite that lost rows, leaked into another partition,
    // or failed to compact all break the hash.
    QuerySpec("q176_partition_maintenance", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q176").toString
      val cat = "pmx" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.sql(s"""CREATE TABLE $cat.ord (
                  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
                PARTITIONED BY (o_orderstatus)""")
      Td.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .createOrReplaceTempView("q176_orders")
      s.sql(s"""INSERT INTO $cat.ord SELECT * FROM q176_orders WHERE o_orderkey % 2 = 0""")
      s.sql(s"""INSERT INTO $cat.ord SELECT * FROM q176_orders WHERE o_orderkey % 2 = 1""")
      s.sql(s"""INSERT OVERWRITE $cat.ord PARTITION (o_orderstatus = 'F')
                SELECT o_orderkey, o_totalprice * 0.8
                FROM q176_orders WHERE o_orderstatus = 'F' AND o_orderkey % 3 = 0""")
      val opt = s.sql(
        s"CALL $cat.optimize_partition(`table` => 'ord', partition => 'o_orderstatus=O', sort_by => 'o_orderkey')")
        .head()
      s.sql(s"""SELECT o_orderstatus, count(*) AS n_rows,
                       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
                FROM $cat.ord GROUP BY o_orderstatus ORDER BY o_orderstatus""")
        .withColumn("opt_before", lit(opt.getInt(0)))
        .withColumn("opt_after", lit(opt.getInt(1)))
    },
      Some("""WITH t AS (
                SELECT o_orderkey, o_orderstatus, o_totalprice
                FROM orders WHERE o_orderstatus <> 'F'
                UNION ALL
                SELECT o_orderkey, 'F', o_totalprice * 0.8
                FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 3 = 0)
              SELECT o_orderstatus, count(*) AS n_rows,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     CAST(2 AS INTEGER) AS opt_before, CAST(1 AS INTEGER) AS opt_after
              FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- operation metrics -------------------------------------------------
    // The commit log's own audit trail hash-gated: DELETE and UPDATE
    // record row-count metrics derived from AddFile arithmetic, and the
    // oracle re-derives the SAME counts from the raw table — a metric
    // that over/under-counts (the "how many rows did that GDPR delete
    // erase" number being wrong) breaks the hash, as does any drift in
    // the surviving aggregate itself.
    QuerySpec("q177_dml_metrics", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q177").toString + "/t"
      val part = Td.load(s, dir, "part")
        .select("p_partkey", "p_brand", "p_retailprice")
      TxLog.append(s, root, part.repartition(4))
      TxLog.delete(s, root, "p_partkey % 5 = 2")
      TxLog.update(s, root, "p_retailprice < 1200",
        Map("p_retailprice" -> "p_retailprice + 10"))
      val h = TxLog.history(s, root)
      val del = h.where("version = 1")
        .select(element_at(col("metrics"), "rows_deleted").as("rows_deleted"))
      val upd = h.where("version = 2")
        .select(element_at(col("metrics"), "rows_updated").as("rows_updated"))
      TxLog.read(s, root)
        .agg(count(lit(1)).as("live_rows"),
          dsum(col("p_retailprice")).as("sum_price"))
        .crossJoin(del).crossJoin(upd)
    },
      Some("""WITH survivors AS (
                SELECT p_partkey, p_retailprice FROM part
                WHERE NOT (p_partkey % 5 = 2)),
              updated AS (
                SELECT CASE WHEN p_retailprice < 1200
                            THEN p_retailprice + 10
                            ELSE p_retailprice END AS p_retailprice
                FROM survivors)
              SELECT count(*) AS live_rows,
                     CAST(sum(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     (SELECT count(*) FROM part WHERE p_partkey % 5 = 2) AS rows_deleted,
                     (SELECT count(*) FROM survivors WHERE p_retailprice < 1200) AS rows_updated
              FROM updated"""))
  )

  /** q178 continues in [[TxQueries2.specs]] (file-size hygiene). */
}

/** Streaming-admission parity queries (split from [[TxQueries]]). */
object TxQueries2 {

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  val specs: Seq[QuerySpec] = Seq(

    // ---- file-granular streaming admission ---------------------------------
    // One 12-file commit drained through maxFilesPerTrigger=5: exactly
    // ceil(12/5)=3 micro-batches (pinned into the hash), every row
    // delivered exactly once (count + decimal sum match the raw table —
    // a dropped file, a re-delivered file, or an offset that lost its
    // place across batches all break it). The per-batch sums fold as
    // exact decimals, so the accumulation is order-independent.
    QuerySpec("q178_stream_admission", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q178").toString
      val table = s"$root/t"
      val li = Td.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
      TxLog.append(s, table, li.repartition(12))
      val batches = new java.util.concurrent.atomic.AtomicLong(0L)
      val rows = new java.util.concurrent.atomic.AtomicLong(0L)
      val qtyMicros = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = s.readStream.format("txlog").option("path", table)
        .option("maxFilesPerTrigger", "5").load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val r = b.agg(count(lit(1)),
            sum(col("l_quantity").cast(DecimalType(18, 4)))).head()
          if (r.getLong(0) > 0) {
            batches.incrementAndGet()
            rows.addAndGet(r.getLong(0))
            qtyMicros.addAndGet(
              r.getDecimal(1).movePointRight(4).longValueExact()): Unit
          }
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import s.implicits._
      Seq((batches.get(), rows.get(),
        (BigDecimal(qtyMicros.get()) / 10000).toDouble))
        .toDF("n_batches", "n_rows", "sum_qty")
    },
      Some("""SELECT CAST(3 AS BIGINT) AS n_batches,
                     CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
              FROM lineitem""")),

    // ---- log retention -----------------------------------------------------
    // 12 commits, cleanupLog(retain 3): commits 0-8 delete behind a
    // fresh checkpoint at the cut (n_cleaned = 9 pinned), the head read
    // and time travel AT the cut replay from the checkpoint — a cleanup
    // that cut too deep, lost a checkpoint, or broke replay loses rows
    // and breaks the hash.
    QuerySpec("q179_log_retention", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q179").toString + "/t"
      val cust = Td.load(s, dir, "customer")
        .select("c_custkey", "c_acctbal").localCheckpoint(true)
      (0 until 12).foreach(i =>
        TxLog.append(s, root, cust.where(s"c_custkey % 12 = $i")))
      val cleaned = TxLog.cleanupLog(root, retainVersions = 3)
      val atCut = TxLog.read(s, root, versionAsOf = Some(9L))
        .agg(count(lit(1)).cast("long").as("rows_at_cut"))
      TxLog.read(s, root)
        .agg(count(lit(1)).as("n_rows"), dsum(col("c_acctbal")).as("sum_bal"))
        .withColumn("n_cleaned", lit(cleaned))
        .crossJoin(atCut)
    },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
                     CAST(9 AS INTEGER) AS n_cleaned,
                     (SELECT CAST(count(*) AS BIGINT) FROM customer
                      WHERE c_custkey % 12 <= 9) AS rows_at_cut
              FROM customer"""))
  ,

    // ---- bounded MERGE touch discovery -------------------------------------
    // Four appends of disjoint o_orderkey bands; a CDC batch whose keys
    // all lie in the first band. Touch discovery is bounded by the
    // staged source's own key stats (min/max + ≤64-key IN-list), so the
    // merge's files_scanned metric — pinned into the hash — must be
    // EXACTLY the one band file out of four live. A discovery that
    // scanned the table (the old shape), mis-derived the bounds, or
    // dropped a matching candidate breaks either the count or the
    // post-merge aggregate the oracle replays.
    QuerySpec("q180_merge_prune", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q180").toString + "/t"
      val ord = Td.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice").localCheckpoint(true)
      TxLog.append(s, root, ord.where("o_orderkey <= 100").coalesce(1))
      TxLog.append(s, root,
        ord.where("o_orderkey > 100 AND o_orderkey <= 1000").coalesce(1))
      TxLog.append(s, root,
        ord.where("o_orderkey > 1000 AND o_orderkey <= 5000").coalesce(1))
      TxLog.append(s, root, ord.where("o_orderkey > 5000").coalesce(1))
      val batch = ord.where("o_orderkey <= 64 AND o_orderkey % 2 = 0")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      TxLog.merge(s, root, batch, "o_orderkey")
      val m = TxLog.history(s, root).where("op = 'merge'")
        .select(element_at(col("metrics"), "files_scanned").as("files_scanned"),
          element_at(col("metrics"), "files_live").as("files_live"))
      TxLog.read(s, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_price"))
        .crossJoin(m)
        .orderBy("o_orderstatus")
    },
      Some("""WITH merged AS (
                SELECT o_orderstatus,
                       CASE WHEN o_orderkey <= 64 AND o_orderkey % 2 = 0
                            THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
                FROM orders)
              SELECT o_orderstatus, count(*) AS n_rows,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     CAST(1 AS BIGINT) AS files_scanned,
                     CAST(4 AS BIGINT) AS files_live
              FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- cluster-by-key maintenance ----------------------------------------
    // The same CDC shape WITHOUT manual banding: round-robin appends
    // spread every key range across all four files, so the first merge
    // scans all 4 candidates; then the graft.clusterBy property makes a
    // PLAIN OPTIMIZE range-cluster on the merge key, and the second,
    // equally-narrow batch scans exactly 1 of 4 — both counts pinned.
    // The oracle replays the two upserts sequentially; clustering that
    // lost rows, reordered wrongly, or failed to sharpen the bounds
    // breaks the counts or the aggregate.
    QuerySpec("q181_cluster_merge", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q181").toString + "/t"
      val ord = Td.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice").localCheckpoint(true)
      TxLog.append(s, root, ord.repartition(4))
      val b1 = ord.where("o_orderkey <= 64 AND o_orderkey % 2 = 0")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      TxLog.merge(s, root, b1, "o_orderkey")
      TxLog.setProperties(root, Map(TxLog.ClusterBy.Columns -> "o_orderkey"))
      TxLog.optimize(s, root, targetBytes = 1L)
      val b2 = ord.where("o_orderkey <= 64 AND o_orderkey % 2 = 1")
        .withColumn("o_totalprice", col("o_totalprice") * 3)
      TxLog.merge(s, root, b2, "o_orderkey")
      val scans = TxLog.history(s, root).where("op = 'merge'")
        .orderBy("version")
        .select(element_at(col("metrics"), "files_scanned").as("fs"))
        .collect().map(_.getLong(0))
      TxLog.read(s, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_price"))
        .withColumn("scan_before", lit(scans(0)))
        .withColumn("scan_after", lit(scans(1)))
        .orderBy("o_orderstatus")
    },
      Some("""WITH merged AS (
                SELECT o_orderstatus,
                       CASE WHEN o_orderkey <= 64 AND o_orderkey % 2 = 0
                              THEN o_totalprice * 2
                            WHEN o_orderkey <= 64 AND o_orderkey % 2 = 1
                              THEN o_totalprice * 3
                            ELSE o_totalprice END AS o_totalprice
                FROM orders)
              SELECT o_orderstatus, count(*) AS n_rows,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     CAST(4 AS BIGINT) AS scan_before,
                     CAST(1 AS BIGINT) AS scan_after
              FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- conditional multi-clause MERGE (CDC replay) -----------------------
    // A debezium-shaped op-column feed replayed in ONE conditional MERGE:
    // tombstones delete, the rest of the matched keys update, guarded
    // inserts add negated keys (provably absent), and tombstones for
    // absent keys no-op. The DuckDB oracle replays the same feed
    // relationally; the commit's operation metrics — including the
    // 1-of-4 bounded touch discovery (source key range [-64, 64] hits
    // only the first band) — are pinned into the hash.
    QuerySpec("q182_merge_cdc", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q182").toString + "/t"
      val ord = Td.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice").localCheckpoint(true)
      TxLog.append(s, root, ord.where("o_orderkey <= 100").coalesce(1))
      TxLog.append(s, root,
        ord.where("o_orderkey > 100 AND o_orderkey <= 1000").coalesce(1))
      TxLog.append(s, root,
        ord.where("o_orderkey > 1000 AND o_orderkey <= 5000").coalesce(1))
      TxLog.append(s, root, ord.where("o_orderkey > 5000").coalesce(1))
      // keys start at 0 in the testdata; 0 negates to itself, so the
      // insert band starts at 1 to keep source keys distinct
      val base = ord.where("o_orderkey >= 1 AND o_orderkey <= 64")
      val feed = base
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("op", when(col("o_orderkey") % 5 === 0, lit("d"))
          .otherwise(lit("u")))
        .unionAll(base
          .withColumn("o_orderkey", -col("o_orderkey"))
          .withColumn("o_totalprice", col("o_totalprice") + 1)
          .withColumn("op", when(-col("o_orderkey") <= 32, lit("c"))
            .otherwise(lit("d"))))
      TxLog.mergeClauses(s, root, feed, "o_orderkey", Seq(
        TxLog.WhenMatchedDelete(Some("s.op = 'd'")),
        TxLog.WhenMatchedUpdate(None,
          Map("o_totalprice" -> "s.o_totalprice")),
        TxLog.WhenNotMatchedInsert(Some("s.op <> 'd'"))))
      val m = TxLog.history(s, root).where("op = 'merge'")
        .select(element_at(col("metrics"), "rows_updated").as("n_upd"),
          element_at(col("metrics"), "rows_deleted").as("n_del"),
          element_at(col("metrics"), "rows_inserted").as("n_ins"),
          element_at(col("metrics"), "files_scanned").as("files_scanned"))
      TxLog.read(s, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_price"))
        .crossJoin(m)
        .orderBy("o_orderstatus")
    },
      Some("""WITH feed AS (
                SELECT o_orderkey AS id, o_orderstatus,
                       o_totalprice * 2 AS o_totalprice,
                       CASE WHEN o_orderkey % 5 = 0 THEN 'd' ELSE 'u' END AS op
                FROM orders WHERE o_orderkey BETWEEN 1 AND 64
                UNION ALL
                SELECT -o_orderkey, o_orderstatus, o_totalprice + 1,
                       CASE WHEN o_orderkey <= 32 THEN 'c' ELSE 'd' END
                FROM orders WHERE o_orderkey BETWEEN 1 AND 64),
              merged AS (
                SELECT o.o_orderstatus,
                       CASE WHEN f.op = 'u' THEN f.o_totalprice
                            ELSE o.o_totalprice END AS o_totalprice
                FROM orders o LEFT JOIN feed f ON o.o_orderkey = f.id
                WHERE f.id IS NULL OR f.op <> 'd'
                UNION ALL
                SELECT f.o_orderstatus, f.o_totalprice
                FROM feed f LEFT JOIN orders o ON o.o_orderkey = f.id
                WHERE o.o_orderkey IS NULL AND f.op <> 'd')
              SELECT o_orderstatus, count(*) AS n_rows,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     (SELECT count(*) FROM orders
                      WHERE o_orderkey BETWEEN 1 AND 64 AND o_orderkey % 5 <> 0) AS n_upd,
                     (SELECT count(*) FROM orders
                      WHERE o_orderkey BETWEEN 1 AND 64 AND o_orderkey % 5 = 0) AS n_del,
                     (SELECT count(*) FROM orders
                      WHERE o_orderkey BETWEEN 1 AND 32) AS n_ins,
                     CAST(1 AS BIGINT) AS files_scanned
              FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- metadata-only type widening ---------------------------------------
    // Narrow files (int key, float qty, decimal(12,2) price) widened by
    // three ALTER COLUMN TYPE commits — no rewrite — then a WIDE append
    // whose keys exceed int range. The aggregate reads BOTH file
    // generations through the widened schema: the narrow pages promote
    // in the scan (SPARK-40876), and sum(k) overflows 32 bits iff the
    // promotion actually served longs. The oracle replays the widen as
    // explicit casts.
    QuerySpec("q183_type_widening", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q183").toString + "/t"
      val li = Td.load(s, dir, "lineitem")
        .select(col("l_orderkey").cast("int").as("k"),
          col("l_quantity").cast("float").as("qty"),
          col("l_extendedprice").cast("decimal(12,2)").as("price"),
          col("l_returnflag")).localCheckpoint(true)
      TxLog.append(s, root, li)
      TxLog.alterColumnType(root, "k", LongType)
      TxLog.alterColumnType(root, "qty", DoubleType)
      TxLog.alterColumnType(root, "price", DecimalType(18, 2))
      TxLog.append(s, root, li.select(
        (col("k").cast("long") + 3000000000L).as("k"),
        col("qty").cast("double").as("qty"),
        col("price").cast("decimal(18,2)").as("price"),
        col("l_returnflag")))
      graft.operators.CheckpointBlocks.release(li)
      TxLog.read(s, root)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).as("sum_k"),
          dsum(col("qty")).as("sum_qty"),
          sum(col("price")).cast(DoubleType).as("sum_price"))
        .orderBy("l_returnflag")
    },
      Some("""WITH narrow AS (
                SELECT CAST(l_orderkey AS INTEGER) AS k,
                       CAST(l_quantity AS REAL) AS qty,
                       CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
                       l_returnflag
                FROM lineitem),
              allr AS (
                SELECT CAST(k AS BIGINT) AS k, CAST(qty AS DOUBLE) AS qty,
                       CAST(price AS DECIMAL(18,2)) AS price, l_returnflag
                FROM narrow
                UNION ALL
                SELECT CAST(k AS BIGINT) + 3000000000, CAST(qty AS DOUBLE),
                       CAST(price AS DECIMAL(18,2)), l_returnflag
                FROM narrow)
              SELECT l_returnflag, count(*) AS n_rows,
                     CAST(sum(k) AS BIGINT) AS sum_k,
                     CAST(sum(CAST(qty AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                     CAST(sum(price) AS DOUBLE) AS sum_price
              FROM allr GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- composite-key MERGE -----------------------------------------------
    // lineitem's natural composite PK (l_orderkey, l_linenumber): an
    // upsert keyed on the TUPLE updates existing (k, 1) lines and
    // inserts (k, 99) lines — rows sharing only ONE key column stay
    // untouched (the per-column-vs-tuple distinction the oracle
    // replays). Touch discovery conjoins BOTH columns' staged bounds:
    // the orderkey range [1, 64] alone prunes to 1 of 4 banded files,
    // pinned into the hash.
    QuerySpec("q184_merge_composite", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q184").toString + "/t"
      val li = Td.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .localCheckpoint(true)
      TxLog.append(s, root, li.where("l_orderkey <= 100").coalesce(1))
      TxLog.append(s, root,
        li.where("l_orderkey > 100 AND l_orderkey <= 1000").coalesce(1))
      TxLog.append(s, root,
        li.where("l_orderkey > 1000 AND l_orderkey <= 5000").coalesce(1))
      TxLog.append(s, root, li.where("l_orderkey > 5000").coalesce(1))
      graft.operators.CheckpointBlocks.release(li)
      // the synthetic lineitem repeats (orderkey, linenumber) pairs, so
      // the feed carries one row per DISTINCT tuple — duplicate TARGET
      // rows all match it (legal); duplicate SOURCE keys would refuse
      val baseKeys = TxLog.read(s, root)
        .where("l_orderkey BETWEEN 1 AND 64 AND l_linenumber = 1")
        .select("l_orderkey", "l_linenumber").distinct()
      val feed = baseKeys
        .withColumn("l_quantity", lit(100.0))
        .withColumn("l_returnflag", lit("U"))
        .unionAll(baseKeys.withColumn("l_linenumber", lit(99))
          .withColumn("l_quantity", lit(1.0))
          .withColumn("l_returnflag", lit("Z")))
      TxLog.merge(s, root, feed, Seq("l_orderkey", "l_linenumber"))
      val m = TxLog.history(s, root).where("op = 'merge'")
        .select(element_at(col("metrics"), "files_scanned").as("files_scanned"),
          element_at(col("metrics"), "files_live").as("files_live"))
      TxLog.read(s, root)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .crossJoin(m)
        .orderBy("l_returnflag")
    },
      Some("""WITH keys AS (
                SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem
                WHERE l_orderkey BETWEEN 1 AND 64 AND l_linenumber = 1),
              merged AS (
                SELECT CASE WHEN k.l_orderkey IS NOT NULL THEN 'U'
                            ELSE t.l_returnflag END AS l_returnflag,
                       CASE WHEN k.l_orderkey IS NOT NULL THEN 100.0
                            ELSE t.l_quantity END AS q
                FROM lineitem t LEFT JOIN keys k
                  ON t.l_orderkey = k.l_orderkey
                 AND t.l_linenumber = k.l_linenumber
                UNION ALL
                SELECT 'Z', 1.0 FROM keys)
              SELECT l_returnflag, count(*) AS n_rows,
                     CAST(sum(CAST(q AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                     CAST(1 AS BIGINT) AS files_scanned,
                     CAST(4 AS BIGINT) AS files_live
              FROM merged GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- WHEN NOT MATCHED BY SOURCE (snapshot sync) -------------------------
    // The snapshot-mirror merge: a "today's feed" of keys <= 1000
    // updates its matches, target rows the feed does NOT carry either
    // delete (keys > 5000) or flag stale (the rest) — three clause
    // groups in ONE commit. By definition the by-source clauses may
    // fire on any row, so discovery scans the full live set:
    // files_scanned = files_live = 4 is pinned as the honest cost,
    // alongside the deleted-row count and the surviving aggregate.
    QuerySpec("q185_merge_by_source", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q185").toString + "/t"
      val ord = Td.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice").localCheckpoint(true)
      TxLog.append(s, root, ord.where("o_orderkey <= 100").coalesce(1))
      TxLog.append(s, root,
        ord.where("o_orderkey > 100 AND o_orderkey <= 1000").coalesce(1))
      TxLog.append(s, root,
        ord.where("o_orderkey > 1000 AND o_orderkey <= 5000").coalesce(1))
      TxLog.append(s, root, ord.where("o_orderkey > 5000").coalesce(1))
      graft.operators.CheckpointBlocks.release(ord)
      val feed = TxLog.read(s, root).where("o_orderkey <= 1000")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      TxLog.mergeClauses(s, root, feed, "o_orderkey", Seq(
        TxLog.WhenMatchedUpdate(None,
          Map("o_totalprice" -> "s.o_totalprice")),
        TxLog.WhenNotMatchedBySourceDelete(Some("t.o_orderkey > 5000")),
        TxLog.WhenNotMatchedBySourceUpdate(None,
          Map("o_orderstatus" -> "'X'"))))
      val m = TxLog.history(s, root).where("op = 'merge'")
        .select(element_at(col("metrics"), "rows_deleted").as("n_del"),
          element_at(col("metrics"), "files_scanned").as("files_scanned"),
          element_at(col("metrics"), "files_live").as("files_live"))
      TxLog.read(s, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_price"))
        .crossJoin(m)
        .orderBy("o_orderstatus")
    },
      Some("""WITH src AS (
                SELECT o_orderkey, o_totalprice * 2 AS p
                FROM orders WHERE o_orderkey <= 1000),
              merged AS (
                SELECT CASE WHEN s.o_orderkey IS NULL THEN 'X'
                            ELSE t.o_orderstatus END AS o_orderstatus,
                       CASE WHEN s.o_orderkey IS NOT NULL THEN s.p
                            ELSE t.o_totalprice END AS o_totalprice
                FROM orders t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
                WHERE s.o_orderkey IS NOT NULL OR t.o_orderkey <= 5000)
              SELECT o_orderstatus, count(*) AS n_rows,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     (SELECT count(*) FROM orders WHERE o_orderkey > 5000) AS n_del,
                     CAST(4 AS BIGINT) AS files_scanned,
                     CAST(4 AS BIGINT) AS files_live
              FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- streaming conditional CDC sink (exactly-once clause merge) --------
    // A txlog CHANGE FEED of op-column events drained one commit per
    // micro-batch (maxVersionsPerTrigger=1) through foreachBatch →
    // mergeClausesBatch: tombstones delete, matched keys update,
    // guarded inserts land negated keys — each batch ONE txn-tagged
    // conditional merge, so the at-least-once stream is an exactly-once
    // sink. Pins: exactly 2 batches, and per-commit bounded discovery
    // (each batch's key range opens 1 of the 4 target bands — the
    // negated insert keys keep batch 1's range inside band 1). A
    // replayed batch would double balances; a missed tombstone leaves
    // deleted rows — both hash-visible against the relational replay.
    QuerySpec("q186_stream_cdc_clauses", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q186").toString
      val target = s"$root/t"
      val feed = s"$root/feed"
      val cust = Td.load(s, dir, "customer")
        .select("c_custkey", "c_acctbal", "c_mktsegment").localCheckpoint(true)
      // scale-proportional quartile bands (sf0.001's key space is 10×
      // smaller — absolute bounds would leave feed commit 1 empty)
      val q1 = cust.agg(max(col("c_custkey"))).head().getLong(0) / 4
      val ins = q1 / 2
      TxLog.append(s, target, cust.where(s"c_custkey <= $q1").coalesce(1))
      TxLog.append(s, target,
        cust.where(s"c_custkey > $q1 AND c_custkey <= ${2 * q1}").coalesce(1))
      TxLog.append(s, target,
        cust.where(s"c_custkey > ${2 * q1} AND c_custkey <= ${3 * q1}").coalesce(1))
      TxLog.append(s, target, cust.where(s"c_custkey > ${3 * q1}").coalesce(1))
      // feed commit 0: updates + tombstones of keys 1..q1, inserts at
      // the NEGATED keys (provably absent; keeps the range in band 1)
      TxLog.append(s, feed, cust.where(s"c_custkey BETWEEN 1 AND $q1")
        .selectExpr("c_custkey", "c_acctbal * 2 AS c_acctbal", "c_mktsegment",
          "CASE WHEN c_custkey % 5 = 0 THEN 'd' ELSE 'u' END AS op")
        .unionAll(cust.where(s"c_custkey BETWEEN 1 AND $ins")
          .selectExpr("-c_custkey AS c_custkey", "c_acctbal + 1 AS c_acctbal",
            "'new' AS c_mktsegment", "'c' AS op")).coalesce(1))
      // feed commit 1: late re-segmenting of band-2 keys
      TxLog.append(s, feed,
        cust.where(s"c_custkey > $q1 AND c_custkey <= ${2 * q1} AND c_custkey % 7 = 0")
          .selectExpr("c_custkey", "c_acctbal", "'late' AS c_mktsegment",
            "'u' AS op").coalesce(1))
      graft.operators.CheckpointBlocks.release(cust)
      val batches = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = s.readStream.format("txlog").option("path", feed)
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          if (!b.isEmpty) {
            batches.incrementAndGet()
            TxLog.mergeClausesBatch(s, target, b, Seq("c_custkey"), Seq(
              TxLog.WhenMatchedDelete(Some("s.op = 'd'")),
              TxLog.WhenMatchedUpdate(None, Map(
                "c_acctbal" -> "s.c_acctbal",
                "c_mktsegment" -> "s.c_mktsegment")),
              TxLog.WhenNotMatchedInsert(Some("s.op = 'c'"))),
              "q186", id): Unit
          }
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val scans = TxLog.history(s, target).where("op = 'merge'")
        .orderBy("version")
        .select(element_at(col("metrics"), "files_scanned").as("fs"))
        .collect().map(_.getLong(0))
      TxLog.read(s, target)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"), dsum(col("c_acctbal")).as("sum_bal"))
        .withColumn("n_batches", lit(batches.get()))
        .withColumn("scan_b0", lit(scans(0)))
        .withColumn("scan_b1", lit(scans(1)))
        .orderBy("c_mktsegment")
    },
      Some("""WITH b AS (SELECT max(c_custkey) // 4 AS q1 FROM customer),
              final AS (
                SELECT CASE WHEN c_custkey > (SELECT q1 FROM b)
                                 AND c_custkey <= 2 * (SELECT q1 FROM b)
                                 AND c_custkey % 7 = 0 THEN 'late'
                            ELSE c_mktsegment END AS seg,
                       CASE WHEN c_custkey BETWEEN 1 AND (SELECT q1 FROM b)
                              THEN c_acctbal * 2
                            ELSE c_acctbal END AS bal
                FROM customer
                WHERE NOT (c_custkey BETWEEN 1 AND (SELECT q1 FROM b)
                           AND c_custkey % 5 = 0)
                UNION ALL
                SELECT 'new', c_acctbal + 1 FROM customer
                WHERE c_custkey BETWEEN 1 AND (SELECT q1 FROM b) // 2)
              SELECT seg AS c_mktsegment, count(*) AS n_rows,
                     CAST(sum(CAST(bal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
                     CAST(2 AS BIGINT) AS n_batches,
                     CAST(1 AS BIGINT) AS scan_b0,
                     CAST(1 AS BIGINT) AS scan_b1
              FROM final GROUP BY seg ORDER BY seg""")),

    // ---- merge-on-read MERGE (deletion vectors) -----------------------------
    // With DVs enabled a keyed upsert writes positions + source rows,
    // never the touched file's remainder: all 4 original banded files
    // stay LIVE (the touched one gains a descriptor whose dead count is
    // exactly the matched keys), discovery still opens 1 of 4, and the
    // surviving aggregate reads through the vector. A remainder rewrite
    // (CoW leak), a lost vector (dead rows served), or an over-wide
    // vector (live rows hidden) each break a different pinned column.
    QuerySpec("q187_merge_dv", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q187").toString + "/t"
      val ord = Td.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice").localCheckpoint(true)
      TxLog.append(s, root, ord.where("o_orderkey <= 100").coalesce(1))
      TxLog.append(s, root,
        ord.where("o_orderkey > 100 AND o_orderkey <= 1000").coalesce(1))
      TxLog.append(s, root,
        ord.where("o_orderkey > 1000 AND o_orderkey <= 5000").coalesce(1))
      TxLog.append(s, root, ord.where("o_orderkey > 5000").coalesce(1))
      TxLog.setProperties(root, Map(TxLog.DeletionVectors.Enabled -> "true"))
      val before = TxLog.snapshot(root).files.map(_.path).toSet
      val feed = ord.where("o_orderkey BETWEEN 1 AND 64")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      TxLog.merge(s, root, feed, "o_orderkey")
      graft.operators.CheckpointBlocks.release(ord)
      val snap = TxLog.snapshot(root)
      val origLive = snap.files.count(f => before.contains(f.path))
      val dvFiles = snap.files.count(_.dv.nonEmpty)
      val deadSum = snap.files.flatMap(_.dv).map(_.dead).sum
      val m = TxLog.history(s, root).where("op = 'merge'")
        .select(element_at(col("metrics"), "files_scanned").as("files_scanned"))
      TxLog.read(s, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_price"))
        .withColumn("orig_live", lit(origLive.toLong))
        .withColumn("n_dv_files", lit(dvFiles.toLong))
        .withColumn("n_dead", lit(deadSum))
        .crossJoin(m)
        .orderBy("o_orderstatus")
    },
      Some("""WITH merged AS (
                SELECT o_orderstatus,
                       CASE WHEN o_orderkey BETWEEN 1 AND 64
                              THEN o_totalprice * 2
                            ELSE o_totalprice END AS o_totalprice
                FROM orders)
              SELECT o_orderstatus, count(*) AS n_rows,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     CAST(4 AS BIGINT) AS orig_live,
                     CAST(1 AS BIGINT) AS n_dv_files,
                     (SELECT count(*) FROM orders
                      WHERE o_orderkey BETWEEN 1 AND 64) AS n_dead,
                     CAST(1 AS BIGINT) AS files_scanned
              FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- per-file bloom-filter file skipping --------------------------------
    // The point-lookup complement to min/max stats: a ROUND-ROBIN table
    // (file j holds keys ≡ j mod 4, so every file's range spans the
    // whole key space — range pruning is provably useless here) with
    // graft.bloomFilter.columns=c_custkey. A 3-key upsert (all ≡ 0 mod
    // 4) opens 1 of 4 files: only the sidecar blooms can discriminate,
    // and files_scanned=1 is pinned alongside the post-merge aggregate.
    // A false NEGATIVE (wrongly pruned file) would leave keys
    // un-updated and break the aggregate; a disabled probe would break
    // the pinned scan count.
    QuerySpec("q188_bloom_skip", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q188").toString + "/t"
      val cust = Td.load(s, dir, "customer")
        .select("c_custkey", "c_acctbal", "c_mktsegment").localCheckpoint(true)
      TxLog.create(root, org.apache.spark.sql.types.StructType(
        cust.schema.fields))
      TxLog.setProperties(root, Map(
        TxLog.BloomIndex.Columns -> "c_custkey",
        TxLog.BloomIndex.Bits -> (1 << 20).toString))
      (0 until 4).foreach(j => TxLog.append(s, root,
        cust.where(s"c_custkey % 4 = $j").coalesce(1)))
      graft.operators.CheckpointBlocks.release(cust)
      val feed = TxLog.read(s, root).where("c_custkey IN (8, 16, 24)")
        .withColumn("c_acctbal", col("c_acctbal") * 2)
      TxLog.merge(s, root, feed, "c_custkey")
      val m = TxLog.history(s, root).where("op = 'merge'")
        .select(element_at(col("metrics"), "files_scanned").as("files_scanned"),
          element_at(col("metrics"), "files_live").as("files_live"))
      TxLog.read(s, root)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"), dsum(col("c_acctbal")).as("sum_bal"))
        .crossJoin(m)
        .orderBy("c_mktsegment")
    },
      Some("""WITH merged AS (
                SELECT c_mktsegment,
                       CASE WHEN c_custkey IN (8, 16, 24)
                              THEN c_acctbal * 2
                            ELSE c_acctbal END AS c_acctbal
                FROM customer)
              SELECT c_mktsegment, count(*) AS n_rows,
                     CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
                     CAST(1 AS BIGINT) AS files_scanned,
                     CAST(4 AS BIGINT) AS files_live
              FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment"""))  ,

    // ---- hidden partitioning: days(ts) + predicate derivation --------------
    // Iceberg's hidden partitioning through SQL DDL: CREATE TABLE …
    // PARTITIONED BY (days(ts)) materializes a generated ts_day column
    // (computed on INSERT — the column list below omits it), partitions
    // by it, and DERIVES partition predicates from raw-ts filters. The
    // DELETE below names ONLY ts; its files_scanned must equal the
    // distinct days intersecting the range (oracle-recomputed, so the
    // pin adapts across SFs), files_live the feed's distinct days. A
    // broken derivation scans 30 files; an unsound one loses rows.
    QuerySpec("q189_hidden_partitioning", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q189").toString
      val cat = "hpt" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.sql(s"""CREATE TABLE $cat.ev (
                  event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE)
                PARTITIONED BY (days(ts))""")
      Td.load(s, dir, "events")
        .select("event_id", "ts", "event_type", "value")
        .createOrReplaceTempView("q189_ev")
      s.sql(s"INSERT INTO $cat.ev (event_id, ts, event_type, value) " +
        "SELECT * FROM q189_ev")
      s.sql(s"DELETE FROM $cat.ev WHERE " +
        "ts >= timestamp'2024-01-02 00:00:00' AND " +
        "ts <= timestamp'2024-01-03 23:59:59.999999'")
      val m = TxLog.history(s, s"$root/ev").where("op = 'delete'")
        .select(element_at(col("metrics"), "files_scanned").as("files_scanned"),
          element_at(col("metrics"), "files_live").as("files_live"))
      s.sql(s"SELECT event_type, count(*) AS n_rows FROM $cat.ev GROUP BY event_type")
        .crossJoin(m)
        .orderBy("event_type")
    },
      Some("""WITH kept AS (
                SELECT * FROM events
                WHERE NOT (ts >= TIMESTAMP '2024-01-02 00:00:00'
                           AND ts <= TIMESTAMP '2024-01-03 23:59:59.999999')),
              sc AS (
                SELECT count(DISTINCT CAST(ts AS DATE)) AS files_scanned
                FROM events
                WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
                  AND ts <= TIMESTAMP '2024-01-03 23:59:59.999999'),
              lv AS (
                SELECT count(DISTINCT CAST(ts AS DATE)) AS files_live FROM events)
              SELECT event_type, count(*) AS n_rows, sc.files_scanned, lv.files_live
              FROM kept CROSS JOIN sc CROSS JOIN lv
              GROUP BY event_type, sc.files_scanned, lv.files_live
              ORDER BY event_type""")),

    // ---- bucket transform: derivation is the ONLY discriminator ------------
    // bucket(8, c_custkey) hidden partitioning: every bucket file's raw
    // key range spans the whole key space (hash interleave), so min/max
    // stats CANNOT prune a point lookup — only deriving the bucket of
    // the literal can. A keyed DELETE and a keyed UPDATE each pin
    // files_scanned = 1 of files_live = 8; the final segment aggregate
    // catches any unsound prune (a lost row or a missed update).
    QuerySpec("q190_bucket_pruning", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q190").toString + "/t"
      val cust = Td.load(s, dir, "customer")
        .select("c_custkey", "c_acctbal", "c_mktsegment")
      TxLog.create(root, StructType(cust.schema.fields :+
        StructField("ck_bucket", LongType)), partitionBy = Seq("ck_bucket"))
      TxLog.addGeneratedColumn(s, root, "ck_bucket", "bucket(8, c_custkey)")
      TxLog.append(s, root, cust) // ck_bucket computed, partition-aligned
      TxLog.delete(s, root, "c_custkey = 42")
      TxLog.update(s, root, "c_custkey = 7", Map("c_acctbal" -> "0.0"))
      val m = TxLog.history(s, root).where("op IN ('delete', 'update')")
        .agg(sum(element_at(col("metrics"), "files_scanned")).as("files_scanned_2dml"),
          max(element_at(col("metrics"), "files_live")).as("files_live"))
      TxLog.read(s, root)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"), dsum(col("c_acctbal")).as("sum_bal"))
        .crossJoin(m)
        .orderBy("c_mktsegment")
    },
      Some("""WITH after AS (
                SELECT c_mktsegment,
                       CASE WHEN c_custkey = 7 THEN 0.0 ELSE c_acctbal END AS c_acctbal
                FROM customer WHERE c_custkey <> 42)
              SELECT c_mktsegment, count(*) AS n_rows,
                     CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
                     CAST(2 AS BIGINT) AS files_scanned_2dml,
                     CAST(8 AS BIGINT) AS files_live
              FROM after GROUP BY c_mktsegment ORDER BY c_mktsegment"""))  ,

    // ---- stats policy: string truncation stays exact ------------------------
    // graft.stats.maxStringLen=32 over the documents table (texts run to
    // ~550 chars): every persisted text min/max is pinned ≤ 32 chars
    // (stats_bounded — the log-size win), the count of docs LONGER than
    // the cap is oracle-recomputed (proving truncation actually
    // engaged), and a text range scan over the truncated stats returns
    // exactly the oracle's BETWEEN — a truncation that moved a bound
    // the wrong way loses rows here.
    QuerySpec("q191_stats_policy", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q191").toString + "/t"
      val docs = Td.load(s, dir, "documents")
        .select("doc_id", "text", "lang", "n_chars").localCheckpoint(true)
      TxLog.create(root, StructType(docs.schema.fields))
      TxLog.setProperties(root, Map(TxLog.Stats.MaxStringLen -> "32"))
      (0 until 4).foreach(j => TxLog.append(s, root,
        docs.where(s"doc_id % 4 = $j").coalesce(1)))
      graft.operators.CheckpointBlocks.release(docs)
      val snap = TxLog.snapshot(root)
      val bounded = snap.files.forall(f => f.stats.get("text").forall(cs =>
        cs.min.forall(_.length <= 32) && cs.max.forall(_.length <= 32)))
      val inRange = TxLog.readRange(s, root, "text", "A", "m").count()
      val longDocs = TxLog.read(s, root).where("length(text) > 32").count()
      TxLog.read(s, root)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .crossJoin(s.range(1).select(
          lit(if (bounded) 1L else 0L).as("stats_bounded"),
          lit(inRange).as("text_in_range"),
          lit(longDocs).as("long_docs")))
        .orderBy("lang")
    },
      Some("""WITH rng AS (
                SELECT count(*) AS text_in_range FROM documents
                WHERE text BETWEEN 'A' AND 'm'),
              lng AS (
                SELECT count(*) AS long_docs FROM documents
                WHERE length(text) > 32)
              SELECT lang, count(*) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                     CAST(1 AS BIGINT) AS stats_bounded,
                     rng.text_in_range, lng.long_docs
              FROM documents CROSS JOIN rng CROSS JOIN lng
              GROUP BY lang, rng.text_in_range, lng.long_docs
              ORDER BY lang"""))  ,

    // ---- CDF stream with version-granular byte admission --------------------
    // The change feed as a THROTTLED stream: maxBytesPerTrigger on a
    // readChangeFeed source weighs WHOLE commits (a commit's change set
    // is transactionally whole — file-granular splitting would tear
    // it). A 1-byte budget therefore drains the log as exactly one
    // data-bearing commit per micro-batch: n_batches pins the commit
    // count (a split or merged batch breaks it), and the per-type
    // change totals replay relationally in the oracle.
    QuerySpec("q192_cdf_stream_admission", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q192").toString
      val table = s"$root/t"
      val orders = Td.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice").localCheckpoint(true)
      // v0 creates with the first slice; CDF on (v1, zero-byte); two
      // more slices (v2, v3); then one keyed DELETE + one keyed UPDATE
      TxLog.append(s, table, orders.where("o_orderkey % 3 = 0").coalesce(1))
      TxLog.setProperties(table, Map(TxLog.Cdf.Enabled -> "true"))
      TxLog.append(s, table, orders.where("o_orderkey % 3 = 1").coalesce(1))
      TxLog.append(s, table, orders.where("o_orderkey % 3 = 2").coalesce(1))
      val loKey = orders.agg(min("o_orderkey")).head().getLong(0)
      val hiKey = orders.agg(max("o_orderkey")).head().getLong(0)
      graft.operators.CheckpointBlocks.release(orders)
      TxLog.delete(s, table, s"o_orderkey = $loKey")
      TxLog.update(s, table, s"o_orderkey = $hiKey", Map("o_totalprice" -> "0.0"))

      val types = scala.collection.mutable.Map.empty[String, Long]
      var batches = 0L
      val q = s.readStream.format("txlog").option("path", table)
        .option("readChangeFeed", "true")
        .option("maxBytesPerTrigger", "1").load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val counts = b.groupBy("_change_type").count().collect()
          if (counts.nonEmpty) types.synchronized {
            batches += 1
            counts.foreach(r => types(r.getString(0)) =
              types.getOrElse(r.getString(0), 0L) + r.getLong(1))
          }: Unit
        }
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      import s.implicits._
      types.toSeq.sortBy(_._1).toDF("change_type", "n_changes")
        .crossJoin(s.range(1).select(lit(batches).as("n_batches")))
        .orderBy("change_type")
    },
      Some("""WITH counts AS (
                SELECT 'insert' AS change_type, count(*) AS n_changes FROM orders
                UNION ALL
                SELECT 'delete', count(*) FROM orders
                WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders)
                UNION ALL
                SELECT 'update_preimage', count(*) FROM orders
                WHERE o_orderkey = (SELECT max(o_orderkey) FROM orders)
                UNION ALL
                SELECT 'update_postimage', count(*) FROM orders
                WHERE o_orderkey = (SELECT max(o_orderkey) FROM orders))
              SELECT change_type, n_changes, CAST(5 AS BIGINT) AS n_batches
              FROM counts ORDER BY change_type"""))  ,

    // ---- identity columns: engine-allocated surrogate keys ------------------
    // GENERATED ALWAYS AS IDENTITY: two appends OMIT row_id; the engine
    // allocates from the transactional high-water mark. The pins are
    // order-free (assignment order varies with partitioning, which is
    // why raw ids never appear): n distinct ids = n rows, min = 1,
    // max = n, and sum = n(n+1)/2 — the arithmetic series only a
    // duplicate-free dense allocation produces. A racing double-grant
    // breaks distinct_ids; a skipped block breaks max and the sum.
    QuerySpec("q193_identity", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q193").toString + "/t"
      val orders = Td.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice").localCheckpoint(true)
      TxLog.create(root, StructType(
        StructField("row_id", LongType) +: orders.schema.fields))
      TxLog.addIdentityColumn(s, root, "row_id")
      TxLog.append(s, root, orders.where("o_orderkey % 2 = 0"))
      TxLog.append(s, root, orders.where("o_orderkey % 2 = 1"))
      graft.operators.CheckpointBlocks.release(orders)
      TxLog.read(s, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("row_id")).as("distinct_ids"))
        .crossJoin(TxLog.read(s, root).agg(
          min("row_id").as("min_id"), max("row_id").as("max_id"),
          sum("row_id").as("sum_id")))
        .orderBy("o_orderstatus")
    },
      Some("""WITH n AS (SELECT count(*) AS n FROM orders)
              SELECT o_orderstatus, count(*) AS n_rows,
                     count(*) AS distinct_ids,
                     CAST(1 AS BIGINT) AS min_id,
                     n.n AS max_id,
                     CAST(n.n * (n.n + 1) / 2 AS BIGINT) AS sum_id
              FROM orders CROSS JOIN n
              GROUP BY o_orderstatus, n.n ORDER BY o_orderstatus"""))  ,

    // ---- ANALYZE: metadata-only stats recompute sharpens skipping ----------
    // Files written under graft.stats.numIndexedCols=0 carry NO stats:
    // a keyed DELETE scans all 4 contiguous-band files (pinned). Widen
    // the policy back and run recomputeStats — one distributed pass,
    // one dataChange=false commit, zero bytes rewritten — and the same
    // delete shape scans 1 of 4 (pinned). The final aggregate catches
    // any recompute that mis-derived a bound (rows would be missed).
    QuerySpec("q194_analyze_stats", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q194").toString + "/t"
      val cust = Td.load(s, dir, "customer")
        .select("c_custkey", "c_acctbal", "c_mktsegment").localCheckpoint(true)
      TxLog.create(root, StructType(cust.schema.fields))
      TxLog.setProperties(root, Map(TxLog.Stats.NumIndexed -> "0"))
      val mx = cust.agg(max("c_custkey")).head().getLong(0)
      (0 until 4).foreach(j => TxLog.append(s, root,
        cust.where(s"c_custkey * 4 div ${mx + 1} = $j").coalesce(1)))
      graft.operators.CheckpointBlocks.release(cust)
      TxLog.delete(s, root, "c_custkey = 42") // no stats: all 4 scanned
      TxLog.setProperties(root, Map(TxLog.Stats.NumIndexed -> ""))
      TxLog.recomputeStats(s, root)
      TxLog.delete(s, root, "c_custkey = 87") // fresh stats: 1 of 4
      val m = TxLog.history(s, root).where("op = 'delete'").orderBy("version")
        .select(element_at(col("metrics"), "files_scanned"))
        .collect().map(_.getLong(0))
      TxLog.read(s, root)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"), dsum(col("c_acctbal")).as("sum_bal"))
        .crossJoin(s.range(1).select(
          lit(m(0)).as("scanned_before"), lit(m(1)).as("scanned_after")))
        .orderBy("c_mktsegment")
    },
      Some("""SELECT c_mktsegment, count(*) AS n_rows,
                     CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
                     CAST(4 AS BIGINT) AS scanned_before,
                     CAST(1 AS BIGINT) AS scanned_after
              FROM customer WHERE c_custkey NOT IN (42, 87)
              GROUP BY c_mktsegment ORDER BY c_mktsegment"""))  ,

    // ---- GENERATE manifest: external engines read the live set -------------
    // generateManifest exports the snapshot's live files as absolute
    // paths; a RAW parquet reader over exactly those paths (no log, no
    // TxLog code) must reproduce the table — after a DML rewrite, so a
    // stale or over-complete manifest (dead band, dropped remainder)
    // breaks the aggregate.
    QuerySpec("q195_manifest", { (s, dir) =>
      import scala.jdk.CollectionConverters._
      val root = graft.Scratch.dir("graft-q195").toString + "/t"
      val part = Td.load(s, dir, "part")
        .select("p_partkey", "p_brand", "p_retailprice").localCheckpoint(true)
      (0 until 4).foreach(j => TxLog.append(s, root,
        part.where(s"p_partkey % 4 = $j").coalesce(1)))
      graft.operators.CheckpointBlocks.release(part)
      TxLog.delete(s, root, "p_partkey % 7 = 0")
      val mf = TxLog.generateManifest(root)
      val paths = java.nio.file.Files.readAllLines(mf).asScala
        .filter(_.nonEmpty).toSeq
      val complete =
        if (paths.size == TxLog.snapshot(root).files.size) 1L else 0L
      s.read.parquet(paths: _*) // an external engine's view: raw parquet
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"), dsum(col("p_retailprice")).as("sum_price"))
        .crossJoin(s.range(1).select(lit(complete).as("manifest_complete")))
        .orderBy("p_brand")
    },
      Some("""SELECT p_brand, count(*) AS n_parts,
                     CAST(sum(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     CAST(1 AS BIGINT) AS manifest_complete
              FROM part WHERE p_partkey % 7 <> 0
              GROUP BY p_brand ORDER BY p_brand"""))  ,

    // ---- maintenance from SQL: CALL + per-table checkpoint cadence ---------
    // One lifecycle through the CALL surface: a table created with
    // graft.checkpointInterval=2 checkpoints at v2 (pinned — default
    // cadence 10 would have written nothing by then); stats blanked at
    // write time, CALL compute_stats re-derives them and a keyed DELETE
    // pins 1-of-4 discovery; CALL restore(timestamp => ts) rolls the
    // delete back via the log's own monotonized commit time; CALL
    // generate_manifest exports the restored live set, and a raw
    // parquet read over exactly those paths reproduces the FULL table
    // (any stale manifest, bad restore resolution, or mis-derived stat
    // breaks the aggregate).
    QuerySpec("q196_maintenance_sql", { (s, dir) =>
      import scala.jdk.CollectionConverters._
      val root = graft.Scratch.dir("graft-q196").toString
      val table = s"$root/t"
      val supp = Td.load(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey", "s_acctbal").localCheckpoint(true)
      TxLog.create(table, StructType(supp.schema.fields)) // v0
      TxLog.setProperties(table, Map(
        TxLog.Checkpoints.Interval -> "2",
        TxLog.Stats.NumIndexed -> "0")) // v1
      val mx = supp.agg(max("s_suppkey")).head().getLong(0)
      (0 until 4).foreach(j => TxLog.append(s, table,
        supp.where(s"s_suppkey * 4 div ${mx + 1} = $j").coalesce(1))) // v2..v5
      graft.operators.CheckpointBlocks.release(supp)
      val earlyCkpt = if (java.nio.file.Files.exists(java.nio.file.Paths.get(
        table, "_txlog", "00000000000000000002.ckpt.json"))) 1L else 0L
      val cat = "tx" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.TxCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      TxLog.setProperties(table, Map(TxLog.Stats.NumIndexed -> "")) // v6
      s.sql(s"CALL $cat.compute_stats(`table` => 't')") // v7: stats return
      val tsAnalyze = TxLog.history(s, table)
        .where("op = 'computeStats'").head().getLong(2)
      Thread.sleep(20) // the delete must commit at a LATER millisecond
      TxLog.delete(s, table, "s_suppkey = 1") // v8: sharp 1-of-4
      val scanned = TxLog.history(s, table).where("op = 'delete'")
        .select(element_at(col("metrics"), "files_scanned")).head().getLong(0)
      s.sql(s"CALL $cat.restore(`table` => 't', timestamp => '$tsAnalyze')") // v9
      val m = s.sql(s"CALL $cat.generate_manifest(`table` => 't')").head()
      val paths = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(m.getString(0))).asScala.filter(_.nonEmpty).toSeq
      s.read.parquet(paths: _*) // external engine's view of the restored table
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_supp"), dsum(col("s_acctbal")).as("sum_bal"))
        .crossJoin(s.range(1).select(
          lit(earlyCkpt).as("early_ckpt"),
          lit(scanned).as("scanned_after_analyze"),
          lit(paths.size.toLong).as("manifest_files")))
        .orderBy("s_nationkey")
    },
      Some("""SELECT s_nationkey, count(*) AS n_supp,
                     CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
                     CAST(1 AS BIGINT) AS early_ckpt,
                     CAST(1 AS BIGINT) AS scanned_after_analyze,
                     CAST(4 AS BIGINT) AS manifest_files
              FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""))  ,

    // ---- SQL DDL column specs: identity + generated in CREATE TABLE --------
    // The DSv2-capability path end-to-end: CREATE TABLE declares an
    // engine-allocated surrogate key (GENERATED ALWAYS AS IDENTITY) and
    // a hidden time partition (day GENERATED ALWAYS AS (date(ts)),
    // PARTITIONED BY (day)); the column-list INSERT omits BOTH — the
    // analyzer NULL-pads them, the engine allocates one and computes
    // the other. Pins: per-day counts (the generated column's values),
    // the arithmetic-series identity invariants (distinct = n, min 1,
    // max n, sum n(n+1)/2 — order-free, duplicate-free dense
    // allocation), and pv_days = the oracle's distinct days (the
    // partition layout actually materialized).
    QuerySpec("q197_ddl_identity", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q197").toString
      val cat = "ddq" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.sql(s"""CREATE TABLE $cat.ev (
                  row_id BIGINT GENERATED ALWAYS AS IDENTITY,
                  ts TIMESTAMP, event_type STRING, value DOUBLE,
                  day DATE GENERATED ALWAYS AS (date(ts))
                ) PARTITIONED BY (day)""")
      Td.load(s, dir, "events").select("ts", "event_type", "value")
        .createOrReplaceTempView("q197_ev")
      s.sql(s"INSERT INTO $cat.ev (ts, event_type, value) " +
        "SELECT ts, event_type, value FROM q197_ev")
      val snap = TxLog.snapshot(s"$root/ev")
      val pvDays = snap.files.filter(_.rows > 0)
        .flatMap(_.pv.get("day")).distinct.size.toLong
      s.sql(s"SELECT CAST(day AS STRING) AS day, count(*) AS n_events " +
          s"FROM $cat.ev GROUP BY day")
        .crossJoin(s.sql(
          s"""SELECT count(DISTINCT row_id) AS distinct_ids,
                     min(row_id) AS min_id, max(row_id) AS max_id,
                     sum(row_id) AS sum_id FROM $cat.ev"""))
        .crossJoin(s.range(1).select(lit(pvDays).as("pv_days")))
        .orderBy("day")
    },
      Some("""WITH n AS (SELECT count(*) AS n FROM events),
              d AS (SELECT count(DISTINCT CAST(ts AS DATE)) AS pv_days FROM events)
              SELECT CAST(CAST(ts AS DATE) AS STRING) AS day,
                     count(*) AS n_events,
                     n.n AS distinct_ids,
                     CAST(1 AS BIGINT) AS min_id,
                     n.n AS max_id,
                     CAST(n.n * (n.n + 1) / 2 AS BIGINT) AS sum_id,
                     d.pv_days
              FROM events CROSS JOIN n CROSS JOIN d
              GROUP BY 1, n.n, d.pv_days ORDER BY day"""))
  ,

    // q198: column DEFAULT lifecycle — CREATE TABLE … DEFAULT, analyzer
    // substitution on omitted columns and the DEFAULT keyword, and the
    // rename-migration of the default property mid-stream
    QuerySpec("q198_ddl_defaults", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q198").toString
      val cat = "dfq" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.sql(s"""CREATE TABLE $cat.ev (
                  event_id BIGINT, event_type STRING, value DOUBLE,
                  grade STRING DEFAULT 'unlabeled',
                  weight DOUBLE DEFAULT 1.0
                )""")
      Td.load(s, dir, "events").select("event_id", "event_type", "value")
        .createOrReplaceTempView("q198_ev")
      // explicit grade/weight for the high-value band …
      s.sql(s"""INSERT INTO $cat.ev (event_id, event_type, value, grade, weight)
                SELECT event_id, event_type, value, 'scored', 2.0
                FROM q198_ev WHERE value >= 100""")
      // … defaults fill the rest (column-list INSERT omits both)
      s.sql(s"""INSERT INTO $cat.ev (event_id, event_type, value)
                SELECT event_id, event_type, value
                FROM q198_ev WHERE value < 100 OR value IS NULL""")
      // rename carries the default with the column; the DEFAULT keyword
      // then resolves under the new name
      s.sql(s"ALTER TABLE $cat.ev RENAME COLUMN grade TO label")
      s.sql(s"INSERT INTO $cat.ev VALUES " +
        "(-1, 'synthetic', 50.0, DEFAULT, DEFAULT)")
      s.sql(
        s"""SELECT label, count(*) AS n_rows,
                   round(sum(weight), 3) AS sum_weight,
                   round(sum(coalesce(value, 0)), 3) AS sum_value
            FROM $cat.ev GROUP BY label ORDER BY label""")
    },
      Some("""WITH unioned AS (
                SELECT CASE WHEN value >= 100 THEN 'scored' ELSE 'unlabeled' END AS label,
                       CASE WHEN value >= 100 THEN 2.0 ELSE 1.0 END AS weight,
                       value
                FROM events
                UNION ALL
                SELECT 'unlabeled', 1.0, 50.0
              )
              SELECT label, count(*) AS n_rows,
                     round(sum(weight), 3) AS sum_weight,
                     round(sum(coalesce(value, 0)), 3) AS sum_value
              FROM unioned GROUP BY label ORDER BY label"""))
  ,

    // q199: partition evolution — unpartitioned generation 1, evolve to
    // PARTITIONED BY (event_type), aligned generation 2, mixed-generation
    // partition read completeness, then OPTIMIZE migrates to O(1) pruning
    QuerySpec("q199_partition_evolution", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q199").toString + "/t"
      val ev = Td.load(s, dir, "events").select("event_id", "event_type", "value")
      TxLog.append(s, root, ev.where("event_id % 2 = 0"))   // legacy, pv-less
      TxLog.setPartitioning(root, Seq("event_type"))
      TxLog.append(s, root, ev.where("event_id % 2 = 1"))   // partition-aligned
      // mixed-generation completeness: the partition read must return
      // every click row, old generation included (row-wise guard)
      val mixedClickRows =
        TxLog.readPartition(s, root, Map("event_type" -> "click")).count()
      TxLog.optimize(s, root)                               // migrates layout
      val snap = TxLog.snapshot(root)
      val live = snap.files.filter(_.rows > 0)
      val allAligned = if (live.forall(_.pv.contains("event_type"))) 1 else 0
      val filesClickAfter =
        TxLog.prunedFilesEq(snap, Map("event_type" -> "click"))._1
          .count(_.rows > 0)
      TxLog.read(s, root)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          round(sum(coalesce(col("value"), lit(0.0))), 3).as("sum_value"))
        .crossJoin(s.range(1).select(
          lit(mixedClickRows).as("mixed_click_rows"),
          lit(filesClickAfter).as("files_click_after"),
          lit(allAligned).as("all_aligned")))
        .orderBy("event_type")
    },
      Some("""WITH g AS (SELECT event_type, count(*) AS n_rows,
                     round(sum(coalesce(value, 0)), 3) AS sum_value
                     FROM events GROUP BY 1),
              c AS (SELECT count(*) AS mixed_click_rows FROM events
                    WHERE event_type = 'click')
              SELECT event_type, n_rows, sum_value, c.mixed_click_rows,
                     CAST(1 AS INT) AS files_click_after,
                     CAST(1 AS INT) AS all_aligned
              FROM g CROSS JOIN c ORDER BY event_type"""))
  ,

    // q200: storage-partitioned join — two txlog tables partitioned on
    // the join key; under v2 bucketing the join + aggregation plan with
    // ZERO exchanges (the pv-keyed splits co-locate), pinned as a column
    QuerySpec("q200_storage_partitioned_join", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q200").toString
      val cat = "spq" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      val ev = Td.load(s, dir, "events").select("event_id", "event_type", "value")
      TxLog.appendPartitioned(s, s"$root/facts", ev, Seq("event_type"))
      TxLog.appendPartitioned(s, s"$root/thresholds",
        ev.groupBy("event_type").agg(avg("value").as("thr")), Seq("event_type"))
      val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.adaptive.enabled").map(k => k -> s.conf.getOption(k))
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val q = s.sql(
          s"""SELECT a.event_type AS event_type, count(*) AS n_above
              FROM $cat.facts a JOIN $cat.thresholds b
                ON a.event_type = b.event_type
              WHERE a.value > b.thr
              GROUP BY a.event_type""")
        val nShuffles = q.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }.size
        q.crossJoin(s.range(1).select(lit(nShuffles).as("n_shuffles")))
          .orderBy("event_type")
      } finally saved.foreach { case (k, v) =>
        v.fold(s.conf.unset(k))(s.conf.set(k, _)) }
    },
      Some("""WITH t AS (SELECT event_type, avg(value) AS thr
                         FROM events GROUP BY 1)
              SELECT e.event_type, count(*) AS n_above,
                     CAST(0 AS INT) AS n_shuffles
              FROM events e JOIN t ON e.event_type = t.event_type
              WHERE e.value > t.thr
              GROUP BY 1 ORDER BY 1"""))
  ,

    // q201: DML with IN-subqueries — DELETE and UPDATE whose WHERE
    // carries `k IN (SELECT …)` rewrite onto the semi-join merge
    // machinery; gated against DuckDB running the same statements
    // relationally (expressed as anti-join / conditional update)
    QuerySpec("q201_subquery_dml", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q201").toString
      val cat = "sqq" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      TxLog.append(s, s"$root/ord", Td.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice"))
      Td.load(s, dir, "lineitem").select("l_orderkey", "l_discount", "l_quantity")
        .createOrReplaceTempView("q201_li")
      // DELETE the orders with any deep-discount line…
      s.sql(s"""DELETE FROM $cat.ord WHERE o_orderkey IN
                (SELECT l_orderkey FROM q201_li WHERE l_discount >= 0.09)""")
      // …then flag the surviving heavy orders (any line with quantity
      // >= 45), with a residual condition on the target row
      s.sql(s"""UPDATE $cat.ord SET o_orderstatus = 'H'
                WHERE o_orderkey IN
                  (SELECT l_orderkey FROM q201_li WHERE l_quantity >= 45)
                  AND o_totalprice > 100000""")
      s.sql(s"""SELECT o_orderstatus, count(*) AS n_orders,
                       round(sum(o_totalprice), 2) AS sum_price
                FROM $cat.ord GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    },
      Some("""WITH kept AS (
                SELECT * FROM orders WHERE o_orderkey NOT IN
                  (SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.09)
              ), updated AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey IN (SELECT l_orderkey FROM lineitem
                                                WHERE l_quantity >= 45)
                                 AND o_totalprice > 100000
                            THEN 'H' ELSE o_orderstatus END AS o_orderstatus,
                       o_totalprice
                FROM kept
              )
              SELECT o_orderstatus, count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS sum_price
              FROM updated GROUP BY 1 ORDER BY 1"""))
  ,

    // q202: SHOW PARTITIONS — the pv-metadata listing (zero file opens)
    // matches the data's actual distinct partition values
    QuerySpec("q202_show_partitions", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q202").toString
      val cat = "shq" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      TxLog.appendPartitioned(s, s"$root/ev",
        Td.load(s, dir, "events").select("event_id", "event_type", "value"),
        Seq("event_type"))
      s.sql(s"SHOW PARTITIONS $cat.ev").orderBy("partition")
    },
      Some("""SELECT 'event_type=' || event_type AS partition
              FROM events GROUP BY event_type ORDER BY 1"""))
  ,

    // q203: arbitrary-predicate replaceWhere through the public
    // writeTo(t).overwrite(cond) API — the high-value band atomically
    // replaced by its re-scored form in ONE commit
    QuerySpec("q203_replace_where", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q203").toString
      val cat = "rwq" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      val ev = Td.load(s, dir, "events").select("event_id", "event_type", "value")
      TxLog.append(s, s"$root/ev", ev)
      val v0 = TxLog.latestVersion(s"$root/ev")
      ev.where("value >= 150")
        .select(col("event_id"), col("event_type"),
          (col("value") * 2).as("value"))
        .writeTo(s"$cat.ev").overwrite(col("value") >= 150)
      val oneCommit = if (TxLog.latestVersion(s"$root/ev") == v0 + 1) 1 else 0
      s.sql(s"""SELECT event_type, count(*) AS n_rows,
                       round(sum(coalesce(value, 0)), 3) AS sum_value
                FROM $cat.ev GROUP BY event_type""")
        .crossJoin(s.range(1).select(lit(oneCommit).as("one_commit")))
        .orderBy("event_type")
    },
      Some("""WITH u AS (
                SELECT event_type, value FROM events
                WHERE value < 150 OR value IS NULL
                UNION ALL
                SELECT event_type, value * 2 FROM events WHERE value >= 150
              )
              SELECT event_type, count(*) AS n_rows,
                     round(sum(coalesce(value, 0)), 3) AS sum_value,
                     CAST(1 AS INT) AS one_commit
              FROM u GROUP BY 1 ORDER BY 1"""))
  ,

    // q204: TRUNCATE TABLE — metadata-only remove-all (zero data IO),
    // time travel keeps the pre-truncate version, reload after
    QuerySpec("q204_truncate", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q204").toString
      val cat = "trq" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      val ev = Td.load(s, dir, "events").select("event_id", "event_type", "value")
      TxLog.append(s, s"$root/ev", ev)
      val vPre = TxLog.latestVersion(s"$root/ev")
      s.sql(s"TRUNCATE TABLE $cat.ev")
      val emptyNow = s.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0)
      ev.createOrReplaceTempView("q204_ev")
      s.sql(s"INSERT INTO $cat.ev SELECT * FROM q204_ev WHERE event_type = 'click'")
      val preRows = TxLog.read(s, s"$root/ev", Some(vPre)).count() // time travel
      s.sql(s"""SELECT event_type, count(*) AS n_rows FROM $cat.ev
                GROUP BY event_type""")
        .crossJoin(s.range(1).select(
          lit(preRows).as("pre_truncate_rows"),
          lit(emptyNow).as("post_truncate_rows")))
        .orderBy("event_type")
    },
      Some("""WITH c AS (SELECT count(*) AS pre_truncate_rows FROM events)
              SELECT event_type, count(*) AS n_rows, c.pre_truncate_rows,
                     CAST(0 AS BIGINT) AS post_truncate_rows
              FROM events CROSS JOIN c WHERE event_type = 'click'
              GROUP BY 1, c.pre_truncate_rows ORDER BY 1"""))
  ,

    // q205: metadata-only count(*) — the unfiltered count answers from
    // the log (AddFile.rows, DV-adjusted) as a LocalTableScan plan,
    // zero file opens; pinned against the oracle's real count
    QuerySpec("q205_metadata_count", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q205").toString
      val cat = "mcq" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      val ev = Td.load(s, dir, "events").select("event_id", "event_type", "value")
      TxLog.append(s, s"$root/ev", ev)
      TxLog.setProperties(s"$root/ev", Map(TxLog.DeletionVectors.Enabled -> "true"))
      s.sql(s"DELETE FROM $cat.ev WHERE value >= 150")   // DV, no rewrite
      val q = s.sql(s"SELECT count(*) AS n_rows FROM $cat.ev")
      val logFact =
        if (q.queryExecution.executedPlan.toString.contains("LocalTableScan")) 1 else 0
      q.crossJoin(s.range(1).select(lit(logFact).as("log_fact_plan")))
    },
      Some("""SELECT count(*) AS n_rows, CAST(1 AS INT) AS log_fact_plan
              FROM events WHERE value < 150 OR value IS NULL"""))
  ,

    // q206: change-feed completeness for replace-family commits — a
    // replaceWhere on a CDF table emits the replaced band as deletes
    // and the incoming rows as inserts; the feed totals replay
    // relationally
    QuerySpec("q206_replace_cdf", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q206").toString + "/t"
      val ev = Td.load(s, dir, "events").select("event_id", "event_type", "value")
      TxLog.append(s, root, ev)
      TxLog.setProperties(root, Map(TxLog.Cdf.Enabled -> "true"))
      val v0 = TxLog.latestVersion(root)
      TxLog.replaceWhere(s, root,
        ev.where("value >= 150")
          .select(col("event_id"), col("event_type"),
            (col("value") * 2).as("value")),
        "value >= 150")
      TxLog.readChangeFeed(s, root, v0)
        .groupBy(col(TxLog.ChangeTypeCol).as("change_type"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum("value"), 3).as("sum_value"))
        .orderBy("change_type")
    },
      Some("""WITH band AS (SELECT value FROM events WHERE value >= 150)
              SELECT * FROM (
                SELECT 'delete' AS change_type, count(*) AS n_rows,
                       round(sum(value), 3) AS sum_value FROM band
                UNION ALL
                SELECT 'insert', count(*), round(sum(value * 2), 3) FROM band
              ) ORDER BY change_type"""))
  ,

    // q207: consumed partition filters — on an aligned table,
    // `count(*) WHERE part = v / part IN (…)` answers from the log
    // (pv-pruned survivors' live rows, a LocalTableScan): zero file
    // opens at any table size
    QuerySpec("q207_partition_count", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q207").toString
      val cat = "pcq" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      TxLog.appendPartitioned(s, s"$root/ev",
        Td.load(s, dir, "events").select("event_id", "event_type", "value"),
        Seq("event_type"))
      val q1 = s.sql(s"SELECT count(*) FROM $cat.ev WHERE event_type = 'click'")
      val q2 = s.sql(
        s"SELECT count(*) FROM $cat.ev WHERE event_type IN ('view', 'error')")
      def localPlan(d: org.apache.spark.sql.DataFrame) =
        if (d.queryExecution.executedPlan.toString.contains("LocalTableScan")) 1 else 0
      s.range(1).select(
        lit(q1.head().getLong(0)).as("n_click"),
        lit(q2.head().getLong(0)).as("n_view_error"),
        lit(localPlan(q1)).as("click_log_fact"),
        lit(localPlan(q2)).as("in_log_fact"))
    },
      Some("""SELECT
                (SELECT count(*) FROM events WHERE event_type = 'click') AS n_click,
                (SELECT count(*) FROM events
                 WHERE event_type IN ('view', 'error')) AS n_view_error,
                CAST(1 AS INT) AS click_log_fact,
                CAST(1 AS INT) AS in_log_fact""")),

    // q208: the DISTRIBUTED METADATA PLANE — a table whose replay base
    // is a SHARDED checkpoint plans SQL reads as a Spark job over the
    // shard lines (TxLog.planScanMeta), collecting only survivors.
    // Pinned into the hash: the filtered rows themselves, the metadata
    // count from the distributed fold, files_planned = 1 of 18 for a
    // one-band predicate (stats pruning ran ON THE EXECUTORS), and —
    // the scale proof — that the whole SQL round trip never
    // materialized the snapshot's AddFile list on the driver, the one
    // remaining O(table-file-count) cold-plan cost a 100-TB table
    // cannot afford.
    QuerySpec("q208_distributed_plan", { (s, dir) =>
      val saved = TxLog.ckptPartMaxFiles
      TxLog.ckptPartMaxFiles = 16
      try {
        val root = graft.Scratch.dir("graft-q208").toString
        val cat = "dpq" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
        s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        val t = s"$root/ord"
        val ord = Td.load(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice").localCheckpoint(true)
        val maxK = ord.agg(max("o_orderkey")).head().getLong(0)
        val w = maxK / 18 + 1 // 18 non-empty key bands at every SF
        TxLog.append(s, t, ord.where(col("o_orderkey") < w).coalesce(1))
        TxLog.setProperties(t, Map(TxLog.Checkpoints.Interval -> "18"))
        (1 until 18).foreach { i =>
          TxLog.append(s, t, ord.where(
            col("o_orderkey") >= w * i && col("o_orderkey") < w * (i + 1)).coalesce(1))
        }
        // the head checkpoint holds 18 single-band files > 16 → sharded
        require(TxLog.planningMeta(t, None).exists(_.ckptBase.nonEmpty),
          "q208: expected a sharded replay base")
        val headV = TxLog.latestVersion(t)
        TxLog.invalidateSnapshots(t) // a COLD plan, like a fresh driver
        val q = s.sql(s"SELECT o_orderstatus, count(*) AS n_rows, " +
          s"CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price " +
          s"FROM $cat.ord WHERE o_orderkey < $w GROUP BY o_orderstatus")
        val rows = q.localCheckpoint(true)
        val nAll = s.sql(s"SELECT count(*) FROM $cat.ord").head().getLong(0)
        val planned = TxLog.planScan(s, t,
          Seq(org.apache.spark.sql.sources.LessThan("o_orderkey", w)))
        rows
          .withColumn("n_total", lit(nAll))
          .withColumn("files_planned", lit(planned.size.toLong))
          .withColumn("files_live", lit(18L))
          .withColumn("snapshot_materialized",
            lit(TxLog.snapshotCached(t, headV)))
          .orderBy("o_orderstatus")
      } finally TxLog.ckptPartMaxFiles = saved
    },
      Some("""WITH w AS (SELECT max(o_orderkey) // 18 + 1 AS w FROM orders)
              SELECT o_orderstatus, count(*) AS n_rows,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     (SELECT count(*) FROM orders) AS n_total,
                     CAST(1 AS BIGINT) AS files_planned,
                     CAST(18 AS BIGINT) AS files_live,
                     FALSE AS snapshot_materialized
              FROM orders, w WHERE o_orderkey < w.w
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // q209: VECTORIZED merge-on-read — a SQL read of a DV-bearing table
    // plans as native parquet scans over the log's file index with a
    // codegen'd row-index mask (DvMaskRewrite), not the V1 anti-join
    // bridge. Pinned: the post-delete aggregate (DV semantics exact)
    // and the plan-shape proof (GraftFileIndex present, fallback node
    // absent) — the read path a table lives on between a GDPR delete
    // and its next OPTIMIZE, at any scan width.
    QuerySpec("q209_dv_vectorized", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q209").toString
      val cat = "dvq" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      val t = s"$root/ord"
      val ord = Td.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice").localCheckpoint(true)
      TxLog.append(s, t, ord.repartition(4))
      TxLog.setProperties(t, Map(TxLog.DeletionVectors.Enabled -> "true"))
      TxLog.delete(s, t, "o_orderkey % 10 = 3")
      val q = s.sql(s"SELECT o_orderstatus, count(*) AS n_rows, " +
        s"CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price " +
        s"FROM $cat.ord WHERE o_orderkey % 2 = 0 GROUP BY o_orderstatus")
      val plan = q.queryExecution.executedPlan.toString
      val vectorized =
        if (plan.contains("GraftFileIndex") && !plan.contains("DvFallbackScanBuilder")) 1
        else 0
      q.withColumn("vectorized", lit(vectorized)).orderBy("o_orderstatus")
    },
      Some("""SELECT o_orderstatus, count(*) AS n_rows,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     CAST(1 AS INT) AS vectorized
              FROM orders
              WHERE o_orderkey % 10 <> 3 AND o_orderkey % 2 = 0
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // q210: TABLE FEATURES (FORMAT.md §5) — capability gating by NAMED
    // reader features instead of one monotone int. Pinned: a DV commit
    // surfaces exactly its named feature (not the int's cumulative
    // over-requirement), the masked read still serves exact rows, and
    // a log naming a feature this reader lacks is REFUSED by name (the
    // probe flag) while this table keeps reading — the per-table
    // granularity the int could never express.
    QuerySpec("q210_table_features", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q210").toString
      val t = s"$root/nat"
      val nat = Td.load(s, dir, "nation")
        .select("n_nationkey", "n_name").localCheckpoint(true)
      TxLog.append(s, t, nat)
      TxLog.enableRowTracking(s, t) // writer-only feature joins the set
      TxLog.setProperties(t, Map(TxLog.DeletionVectors.Enabled -> "true"))
      TxLog.delete(s, t, "n_nationkey = 0")
      // the SHOW surface: feature NAMES and protocol through the SQL
      // procedure, not the Scala snapshot — `CALL cat.table_features`
      val cat = "graftq210"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      val fr = s.sql(s"CALL $cat.table_features('nat')").head()
      val (proto, feats, wfeats) = (fr.getLong(0), fr.getString(1), fr.getString(2))
      // a future engine's table: refusal must NAME the feature
      val alien = s"$root/alien/t"
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(alien, "_txlog"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(alien, "_txlog", f"${0L}%020d.json"),
        """{"version":0,"op":"create","ts":0,"schema":"id BIGINT",""" +
          """"adds":[],"removes":[],"features":["rowEncryptionV7"]}""")
      val refused =
        try { TxLog.snapshot(alien); 0 }
        catch {
          case e: TxLog.UnsupportedProtocolException
            if e.getMessage.contains("rowEncryptionV7") => 1
          case _: Throwable => 0
        }
      TxLog.read(s, t).agg(
        count(lit(1)).as("n_live"),
        sum(col("n_nationkey")).as("sum_key"))
        .withColumn("features", lit(feats))
        .withColumn("wfeatures", lit(wfeats))
        .withColumn("protocol", lit(proto))
        .withColumn("refused", lit(refused))
    },
      Some("""SELECT count(*) AS n_live, CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
                     'deletionVectors' AS features,
                     'deletionVectors,identityColumns,rowTracking' AS wfeatures,
                     CAST(3 AS BIGINT) AS protocol, CAST(1 AS INT) AS refused
              FROM nation WHERE n_nationkey <> 0""")),

    // q213: ROW TRACKING — stable row ids surviving layout churn and
    // DML, the row-level-incremental-maintenance handle CDF cannot be
    // (rewrites are dataChange=false there by design). Pinned: the
    // backfill id space (1..n exactly — count/min/max/sum are
    // permutation-invariant, so the oracle needs no assignment order),
    // zero ids changed across OPTIMIZE and across a CoW UPDATE (pre/
    // post joins on the natural key), identity continuation for an
    // append (ids n+1..n+k), and the data aggregates after the update.
    QuerySpec("q213_row_tracking", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q213").toString + "/t"
      val ord = Td.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice").localCheckpoint(true)
      val base = ord.where("o_orderkey <= 4000")
      (0 until 4).foreach(b => TxLog.append(s, root,
        base.where(s"o_orderkey % 4 = $b").coalesce(1)))
      TxLog.enableRowTracking(s, root)
      def idsOf = TxLog.read(s, root)
        .select(col("o_orderkey"), col("_row_id"))
      val pre = idsOf.localCheckpoint(true)
      TxLog.optimize(s, root)
      val postOpt = idsOf.localCheckpoint(true)
      val chgOpt = pre.as("a").join(postOpt.as("b"), "o_orderkey")
        .where("a._row_id <> b._row_id").count()
      TxLog.update(s, root, "o_orderkey % 10 = 1",
        Map("o_totalprice" -> "o_totalprice * 2"))
      val postUpd = idsOf.localCheckpoint(true)
      val chgUpd = postOpt.as("a").join(postUpd.as("b"), "o_orderkey")
        .where("a._row_id <> b._row_id").count()
      TxLog.append(s, root,
        ord.where("o_orderkey > 4000 AND o_orderkey <= 4400"))
      TxLog.read(s, root).agg(
        count(lit(1)).as("n_rows"),
        dsum(col("o_totalprice")).as("sum_price"),
        countDistinct(col("_row_id")).as("n_ids"),
        min("_row_id").as("min_id"),
        max("_row_id").as("max_id"),
        sum("_row_id").as("sum_id"))
        .withColumn("ids_changed_optimize", lit(chgOpt))
        .withColumn("ids_changed_update", lit(chgUpd))
    },
      Some("""WITH base AS (SELECT o_orderkey, o_totalprice FROM orders
                            WHERE o_orderkey <= 4000),
                   extra AS (SELECT o_orderkey, o_totalprice FROM orders
                             WHERE o_orderkey > 4000 AND o_orderkey <= 4400),
                   allr AS (
                     SELECT CASE WHEN o_orderkey % 10 = 1
                                 THEN o_totalprice * 2 ELSE o_totalprice END AS p
                     FROM base
                     UNION ALL SELECT o_totalprice AS p FROM extra),
                   n AS (SELECT count(*) AS total FROM allr)
              SELECT (SELECT total FROM n) AS n_rows,
                     CAST(sum(CAST(p AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     (SELECT total FROM n) AS n_ids,
                     CAST(1 AS BIGINT) AS min_id,
                     (SELECT total FROM n) AS max_id,
                     (SELECT total * (total + 1) // 2 FROM n) AS sum_id,
                     CAST(0 AS BIGINT) AS ids_changed_optimize,
                     CAST(0 AS BIGINT) AS ids_changed_update
              FROM allr""")),

    // q214: ROW-ID-KEYED INCREMENTAL VIEW MAINTENANCE (RowIdView) — the
    // round-15 consumer of stable row ids: a row-level materialized
    // view maintained from the change feed keyed by _row_id, across
    // ONE window carrying a CoW update + a merge-on-read DELETE (the
    // r18-verdict window consolidation — last-image-per-id dispatches
    // each row to exactly one action), a full OPTIMIZE rewrite, and a
    // late batch. Pinned into the hash: the maintained view's
    // aggregates, the recompute diff (the incremental ≡ full claim),
    // per-phase rows_applied (cost ∝ change volume), and the scale
    // fact CDF alone cannot deliver — the OPTIMIZE window, in which
    // every physical row rewrote, was consumed with ZERO data reads
    // (optimize_skipped=1 / optimize_rows_applied=0).
    QuerySpec("q214_rowid_view_maintenance", { (s, dir) =>
      import graft.pipeline.RowIdView
      val root = graft.Scratch.dir("graft-q214").toString
      val src = s"$root/src"; val view = s"$root/view"
      val ord = Td.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice").localCheckpoint(true)
      (0 until 3).foreach(b => TxLog.append(s, src,
        ord.where(s"o_orderkey <= 3000 AND o_orderkey % 3 = $b").coalesce(1)))
      TxLog.enableRowTracking(s, src)
      TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true",
        TxLog.DeletionVectors.Enabled -> "true"))
      val pred = "o_totalprice < 150000"
      val proj = Seq("o_orderkey" -> "o_orderkey",
        "price2" -> "CAST(o_totalprice AS DECIMAL(18,4)) * 2")
      var at = RowIdView.initialize(s, src, view, pred, proj)
      // ONE window: the CoW update and the DV delete (a row hit by
      // both resolves to its last image — delete wins)
      TxLog.update(s, src, "o_orderkey % 7 = 2",
        Map("o_totalprice" -> "o_totalprice + 100000"))
      TxLog.delete(s, src, "o_orderkey % 5 = 3")
      val rUpDel = RowIdView.maintain(s, src, view, at, pred, proj)
      at = rUpDel.srcVersion
      TxLog.optimize(s, src)
      val rOpt = RowIdView.maintain(s, src, view, at, pred, proj); at = rOpt.srcVersion
      TxLog.append(s, src,
        ord.where("o_orderkey > 3000 AND o_orderkey <= 3600"))
      val rApp = RowIdView.maintain(s, src, view, at, pred, proj)
      val got = TxLog.read(s, view).localCheckpoint(true)
      val want = RowIdView.recompute(s, src, pred, proj)
      // one-job signed-union multiset equality (same verdict as the
      // round-16 count+containment trim, one action instead of three)
      val matches = if (TxQueries.multisetEqual(got, want)) 1L else 0L
      got.agg(count(lit(1)).as("n_rows"),
          sum(col("price2")).cast(DoubleType).as("sum_price2"),
          countDistinct(col("_row_id")).as("n_ids"))
        .withColumn("matches_recompute", lit(matches))
        .withColumn("optimize_skipped", lit(if (rOpt.layoutOnlySkip) 1L else 0L))
        .withColumn("optimize_rows_applied", lit(rOpt.rowsApplied))
        .withColumn("updel_rows_applied", lit(rUpDel.rowsApplied))
        .withColumn("append_rows_applied", lit(rApp.rowsApplied))
    },
      Some("""WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p
                            FROM orders WHERE o_orderkey <= 3000),
                   upd AS (SELECT k, CASE WHEN k % 7 = 2 THEN p + 100000
                                          ELSE p END AS p FROM base),
                   surv AS (SELECT k, p FROM upd WHERE k % 5 <> 3),
                   extra AS (SELECT o_orderkey AS k, o_totalprice AS p
                             FROM orders
                             WHERE o_orderkey > 3000 AND o_orderkey <= 3600),
                   unioned AS (SELECT * FROM surv UNION ALL SELECT * FROM extra),
                   finalv AS (SELECT k, CAST(p AS DECIMAL(18,4)) * 2 AS price2
                              FROM unioned WHERE p < 150000)
              SELECT count(*) AS n_rows,
                     CAST(sum(price2) AS DOUBLE) AS sum_price2,
                     count(*) AS n_ids,
                     CAST(1 AS BIGINT) AS matches_recompute,
                     CAST(1 AS BIGINT) AS optimize_skipped,
                     CAST(0 AS BIGINT) AS optimize_rows_applied,
                     (SELECT count(*) FROM base
                      WHERE k % 7 = 2 OR k % 5 = 3) AS updel_rows_applied,
                     (SELECT count(*) FROM extra) AS append_rows_applied
              FROM finalv""")),

    // q217: the DISTRIBUTED WRITE-PATH metadata plane (round 15's
    // headline, the q208 of DML): banded DELETE and UPDATE against a
    // table whose replay base is a SHARDED PARQUET checkpoint. Pinned
    // into the hash: the post-DML table state, each commit's
    // files_scanned=1 / files_live=18 pruning metrics (touch discovery
    // ran DISTRIBUTED over the shard index and opened one band), the
    // parquet shard encoding, and — the scale proof — that the whole
    // cold DML round trip materialized NO snapshot on the driver.
    QuerySpec("q217_distributed_dml_plan", { (s, dir) =>
      val saved = TxLog.ckptPartMaxFiles
      TxLog.ckptPartMaxFiles = 16
      try {
        val root = graft.Scratch.dir("graft-q217").toString
        val t = s"$root/ord"
        val ord = Td.load(s, dir, "orders")
          .select("o_orderkey", "o_totalprice").localCheckpoint(true)
        val maxK = ord.agg(max("o_orderkey")).head().getLong(0)
        val w = maxK / 18 + 1 // 18 non-empty key bands at every SF
        TxLog.append(s, t, ord.where(col("o_orderkey") < w).coalesce(1))
        TxLog.setProperties(t, Map(TxLog.Checkpoints.Interval -> "18"))
        (1 until 18).foreach { i =>
          TxLog.append(s, t, ord.where(
            col("o_orderkey") >= w * i && col("o_orderkey") < w * (i + 1)).coalesce(1))
        }
        val meta0 = TxLog.planningMeta(t, None)
        require(meta0.exists(_.ckptBase.nonEmpty), "q217: expected a sharded base")
        val ckptParquet = if (meta0.exists(_.ckptParquet)) 1L else 0L
        TxLog.invalidateSnapshots(t) // COLD write path, like a fresh driver
        TxLog.delete(s, t, s"o_orderkey >= ${w * 2} AND o_orderkey < ${w * 3}")
        val vDel = TxLog.latestVersion(t)
        TxLog.update(s, t, s"o_orderkey >= ${w * 5} AND o_orderkey < ${w * 6}",
          Map("o_totalprice" -> "o_totalprice * 2"))
        val vUpd = TxLog.latestVersion(t)
        // the proof BEFORE anything else resolves a full snapshot
        val mats = (0L to vUpd).count(v => TxLog.snapshotCached(t, v)).toLong
        val ms: Map[Long, Map[String, Long]] = TxLog.history(s, t)
          .where(col("version").isin(vDel, vUpd))
          .select("version", "metrics").collect()
          .map(r => r.getLong(0) ->
            r.getAs[scala.collection.Map[String, Long]](1).toMap).toMap
        TxLog.read(s, t)
          .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_price"))
          .withColumn("del_files_scanned", lit(ms(vDel)("files_scanned")))
          .withColumn("del_files_live", lit(ms(vDel)("files_live")))
          .withColumn("del_rows", lit(ms(vDel)("rows_deleted")))
          .withColumn("upd_files_scanned", lit(ms(vUpd)("files_scanned")))
          .withColumn("upd_rows", lit(ms(vUpd)("rows_updated")))
          .withColumn("snapshot_materialized", lit(mats))
          .withColumn("ckpt_parquet", lit(ckptParquet))
      } finally TxLog.ckptPartMaxFiles = saved
    },
      Some("""WITH w AS (SELECT max(o_orderkey) // 18 + 1 AS w FROM orders),
                   f AS (SELECT o_orderkey AS k,
                                CASE WHEN o_orderkey >= (SELECT w * 5 FROM w)
                                      AND o_orderkey < (SELECT w * 6 FROM w)
                                     THEN o_totalprice * 2 ELSE o_totalprice END AS p
                         FROM orders
                         WHERE o_orderkey < (SELECT w * 2 FROM w)
                            OR o_orderkey >= (SELECT w * 3 FROM w))
              SELECT count(*) AS n_rows,
                     CAST(sum(CAST(p AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     CAST(1 AS BIGINT) AS del_files_scanned,
                     CAST(18 AS BIGINT) AS del_files_live,
                     (SELECT count(*) FROM orders
                      WHERE o_orderkey >= (SELECT w * 2 FROM w)
                        AND o_orderkey < (SELECT w * 3 FROM w)) AS del_rows,
                     CAST(1 AS BIGINT) AS upd_files_scanned,
                     (SELECT count(*) FROM orders
                      WHERE o_orderkey >= (SELECT w * 5 FROM w)
                        AND o_orderkey < (SELECT w * 6 FROM w)) AS upd_rows,
                     CAST(0 AS BIGINT) AS snapshot_materialized,
                     CAST(1 AS BIGINT) AS ckpt_parquet
              FROM f""")),

    // q218: RESTORE over the distributed metadata plane (round 16's
    // closure of the last driver-materialized seams). Banded DELETE +
    // UPDATE against a sharded-parquet-base table, then a COLD restore
    // to the checkpointed version: the two-way live-set diff runs as
    // distributed anti-joins over the shards. Pinned into the hash:
    // the fully-restored table state, the restore commit's re-add
    // count (exactly the two rewritten band files), that the restore's
    // re-adds are NOT row changes (dataChange=false — readChanges
    // after the DML window sees nothing), and — the scale proof —
    // that restore + readChanges materialized NO snapshot.
    QuerySpec("q218_restore_plan", { (s, dir) =>
      val saved = TxLog.ckptPartMaxFiles
      TxLog.ckptPartMaxFiles = 8
      try {
        val root = graft.Scratch.dir("graft-q218").toString
        val t = s"$root/ord"
        val ord = Td.load(s, dir, "orders")
          .select("o_orderkey", "o_totalprice").localCheckpoint(true)
        val maxK = ord.agg(max("o_orderkey")).head().getLong(0)
        val w = maxK / 12 + 1 // 12 non-empty key bands at every SF
        TxLog.append(s, t, ord.where(col("o_orderkey") < w).coalesce(1))
        TxLog.setProperties(t, Map(TxLog.Checkpoints.Interval -> "12"))
        (1 until 12).foreach { i =>
          TxLog.append(s, t, ord.where(
            col("o_orderkey") >= w * i && col("o_orderkey") < w * (i + 1)).coalesce(1))
        }
        val meta0 = TxLog.planningMeta(t, None)
        require(meta0.exists(_.ckptBase.nonEmpty), "q218: expected a sharded base")
        val ckptParquet = if (meta0.exists(_.ckptParquet)) 1L else 0L
        val vCkpt = TxLog.latestVersion(t)
        TxLog.delete(s, t, s"o_orderkey >= ${w * 2} AND o_orderkey < ${w * 3}")
        TxLog.update(s, t, s"o_orderkey >= ${w * 5} AND o_orderkey < ${w * 6}",
          Map("o_totalprice" -> "o_totalprice * 2"))
        val vDml = TxLog.latestVersion(t)
        TxLog.invalidateSnapshots(t) // COLD restore, like a fresh driver
        val vRest = TxLog.restore(s, t, vCkpt)
        val changesAfter = TxLog.readChanges(s, t, vDml).count()
        // the proof BEFORE anything else resolves a full snapshot
        val mats = (0L to vRest).count(v => TxLog.snapshotCached(t, v)).toLong
        val hist = TxLog.history(s, t).where(col("version") === vRest)
          .select("n_files_added").head()
        TxLog.read(s, t)
          .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_price"))
          .withColumn("restore_files_added", lit(hist.getLong(0)))
          .withColumn("changes_after_restore", lit(changesAfter))
          .withColumn("snapshot_materialized", lit(mats))
          .withColumn("ckpt_parquet", lit(ckptParquet))
      } finally TxLog.ckptPartMaxFiles = saved
    },
      Some("""SELECT count(*) AS n_rows,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     CAST(2 AS BIGINT) AS restore_files_added,
                     CAST(0 AS BIGINT) AS changes_after_restore,
                     CAST(0 AS BIGINT) AS snapshot_materialized,
                     CAST(1 AS BIGINT) AS ckpt_parquet
              FROM orders""")),

    // q219: INCREMENTAL IVF INDEX MAINTENANCE (IvfIndex) — the round-16
    // consumer closing "ANN indexes are rebuild-only": the posting
    // table is a TxLog table keyed by the source's tracked row id and
    // maintained from the change feed, across ONE window carrying an
    // embedding UPDATE (vectors move cells) + a merge-on-read DELETE
    // (the r18-verdict window consolidation), a full OPTIMIZE rewrite,
    // and a late ingest window. Pinned into the hash: the
    // final cell assignment (an integer checksum over cell×vec_id —
    // the DuckDB oracle replays the argmax-cosine quantizer on the
    // final corpus), the maintained ≡ rebuilt diff, per-window
    // rows_applied (only the DELTA is ever scored against the
    // quantizer — cost ∝ batch, never corpus), and the scale fact that
    // the OPTIMIZE window, in which every physical row rewrote, was
    // consumed with ZERO data reads.
    QuerySpec("q219_ann_ivf_incremental", { (s, dir) =>
      import graft.operators.{IvfIndex, Similarity}
      val root = graft.Scratch.dir("graft-q219").toString
      val src = s"$root/src"; val idx = s"$root/idx"
      // corpus capped at 600 ids — the sanctioned bench-weight trim
      // (q214 precedent; the r16 ledger queued this exact cut): a no-op
      // at the gate SFs (500 ids), it bounds the bench SF's corpus so
      // the protocol shape, not corpus size, carries the query's weight
      val ok = Td.load(s, dir, "embeddings").select("vec_id", "embedding")
        .where("vec_id < 600")
        .where(expr(Similarity.validEmbExpr(SparkSql, "embedding")))
        .localCheckpoint(true)
      val cents = ok.where("vec_id % 100 = 7").localCheckpoint(true)
      (0 until 3).foreach(b => TxLog.append(s, src,
        ok.where(s"vec_id % 10 < 8 AND vec_id % 3 = $b").coalesce(1)))
      TxLog.enableRowTracking(s, src)
      TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true",
        TxLog.DeletionVectors.Enabled -> "true"))
      var at = IvfIndex.initialize(s, src, idx, cents)
      // ONE window carries the cell-moving UPDATE and the DV DELETE
      // (the r18-verdict restructure: both change kinds kept, one
      // fewer maintain pass) — last-image-per-id dispatches each row
      // to exactly one of upsert/delete
      TxLog.update(s, src, "vec_id % 11 = 3",
        Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
      TxLog.delete(s, src, "vec_id % 5 = 2")
      val rUpDel = IvfIndex.maintain(s, src, idx, at, cents)
      at = rUpDel.srcVersion
      TxLog.optimize(s, src)
      val rOpt = IvfIndex.maintain(s, src, idx, at, cents); at = rOpt.srcVersion
      TxLog.append(s, src, ok.where("vec_id % 10 >= 8"))
      val rApp = IvfIndex.maintain(s, src, idx, at, cents)
      val got = TxLog.read(s, idx)
        .select("_row_id", "vec_id", "cell", "embedding", "q_bp").localCheckpoint(true)
      val want = IvfIndex.recompute(s, src, cents)
      // one-job signed-union multiset equality (see [[multisetEqual]])
      val matches = if (TxQueries.multisetEqual(got, want)) 1L else 0L
      got.agg(count(lit(1)).as("n_rows"),
          countDistinct(col("cell")).as("n_cells"),
          sum(col("cell") * col("vec_id")).as("cell_id_checksum"))
        .withColumn("matches_rebuild", lit(matches))
        .withColumn("optimize_skipped", lit(if (rOpt.layoutOnlySkip) 1L else 0L))
        .withColumn("optimize_rows_applied", lit(rOpt.rowsApplied))
        .withColumn("updel_rows_applied", lit(rUpDel.rowsApplied))
        .withColumn("append_rows_applied", lit(rApp.rowsApplied))
    }, {
      val d = DuckSql
      def cos(a: String, b: String) =
        s"${d.dsum(d.zipMul(a, b))} / (sqrt(${d.dsum(d.zipMul(a, a))}) * sqrt(${d.dsum(d.zipMul(b, b))}))"
      val vOK = graft.operators.Similarity.validEmbExpr(d, "embedding")
      Some(s"""WITH ok AS (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id < 600 AND $vOK),
               cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
                         FROM ok WHERE vec_id % 100 = 7),
               base AS (SELECT vec_id, embedding FROM ok WHERE vec_id % 10 < 8),
               upd AS (SELECT vec_id,
                              CASE WHEN vec_id % 11 = 3
                                   THEN ${d.map("embedding", "x", "-x")}
                                   ELSE embedding END AS embedding
                       FROM base),
               surv AS (SELECT * FROM upd WHERE vec_id % 5 <> 2),
               late AS (SELECT vec_id, embedding FROM ok WHERE vec_id % 10 >= 8),
               fin AS (SELECT * FROM surv UNION ALL SELECT * FROM late),
               scored AS (SELECT f.vec_id, c.cent_id,
                                 ${cos("f.embedding", "c.cent_emb")} AS c_cos
                          FROM fin f CROSS JOIN cents c),
               assigned AS (SELECT vec_id, cent_id AS cell FROM (
                              SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY c_cos DESC, cent_id) AS rn FROM scored)
                            WHERE rn = 1)
               SELECT count(*) AS n_rows,
                      count(DISTINCT cell) AS n_cells,
                      CAST(sum(cell * vec_id) AS BIGINT) AS cell_id_checksum,
                      CAST(1 AS BIGINT) AS matches_rebuild,
                      CAST(1 AS BIGINT) AS optimize_skipped,
                      CAST(0 AS BIGINT) AS optimize_rows_applied,
                      (SELECT count(*) FROM base
                       WHERE vec_id % 11 = 3 OR vec_id % 5 = 2) AS updel_rows_applied,
                      (SELECT count(*) FROM late) AS append_rows_applied
               FROM assigned""")
    }),

    // q221: STREAMING RowIdView — q214's row-id-keyed incremental view
    // maintained HANDS-FREE as a foreachBatch consumer of the source's
    // CDF stream (the q161 mirror discipline, row-id-keyed and
    // layout-skip-aware). One AvailableNow pass applies the update /
    // OPTIMIZE / delete / append windows; a SECOND checkpointed pass
    // must be a pure no-op (txn-tagged merges — exactly-once across
    // restarts). Pinned into the hash: the view state, the recompute
    // diff, that the view took EXACTLY one commit per DML window
    // (view_commits=3 — the layout-only OPTIMIZE window arrived as an
    // empty batch and burned nothing), and the no-op replay fact.
    QuerySpec("q221_rowid_view_stream", { (s, dir) =>
      import graft.pipeline.RowIdView
      val root = graft.Scratch.dir("graft-q221").toString
      val src = s"$root/src"; val view = s"$root/view"; val ckpt = s"$root/ckpt"
      val ord = Td.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice").localCheckpoint(true)
      (0 until 3).foreach(b => TxLog.append(s, src,
        ord.where(s"o_orderkey <= 1000 AND o_orderkey % 3 = $b").coalesce(1)))
      TxLog.enableRowTracking(s, src)
      TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
      val pred = "o_totalprice < 150000"
      val proj = Seq("o_orderkey" -> "o_orderkey",
        "price2" -> "CAST(o_totalprice AS DECIMAL(18,4)) * 2")
      val at = RowIdView.initialize(s, src, view, pred, proj)
      TxLog.update(s, src, "o_orderkey % 7 = 2",
        Map("o_totalprice" -> "o_totalprice + 100000"))
      TxLog.optimize(s, src)
      TxLog.delete(s, src, "o_orderkey % 5 = 3")
      TxLog.append(s, src,
        ord.where("o_orderkey > 1000 AND o_orderkey <= 1400"))
      RowIdView.stream(s, src, view, ckpt, at, pred, proj)
      val vAfter = TxLog.latestVersion(view)
      RowIdView.stream(s, src, view, ckpt, at, pred, proj) // replay: no-op
      val noop = TxLog.latestVersion(view) - vAfter
      val got = TxLog.read(s, view).localCheckpoint(true)
      val want = RowIdView.recompute(s, src, pred, proj)
      // one-job signed-union multiset equality (see [[multisetEqual]])
      val matches = if (TxQueries.multisetEqual(got, want)) 1L else 0L
      got.agg(count(lit(1)).as("n_rows"),
          sum(col("price2")).cast(DoubleType).as("sum_price2"))
        .withColumn("matches_recompute", lit(matches))
        .withColumn("view_commits", lit(vAfter))
        .withColumn("noop_pass_commits", lit(noop))
    },
      Some("""WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p
                            FROM orders WHERE o_orderkey <= 1000),
                   upd AS (SELECT k, CASE WHEN k % 7 = 2 THEN p + 100000
                                          ELSE p END AS p FROM base),
                   surv AS (SELECT k, p FROM upd WHERE k % 5 <> 3),
                   extra AS (SELECT o_orderkey AS k, o_totalprice AS p
                             FROM orders
                             WHERE o_orderkey > 1000 AND o_orderkey <= 1400),
                   unioned AS (SELECT * FROM surv UNION ALL SELECT * FROM extra),
                   finalv AS (SELECT k, CAST(p AS DECIMAL(18,4)) * 2 AS price2
                              FROM unioned WHERE p < 150000)
              SELECT count(*) AS n_rows,
                     CAST(sum(price2) AS DOUBLE) AS sum_price2,
                     CAST(1 AS BIGINT) AS matches_recompute,
                     CAST(3 AS BIGINT) AS view_commits,
                     CAST(0 AS BIGINT) AS noop_pass_commits
              FROM finalv""")),

    // q222: DROP FEATURE + TRUNCATE HISTORY (the only way a capability
    // leaves a table's requirement set). A table gains live deletion
    // vectors — a LEGACY reader (capability hand-stripped) refuses by
    // name, pinned — then the feature is verifiably retired: disable,
    // purge, drop, truncate. Pinned into the hash: the surviving data
    // (deleted rows STAY deleted through purge + drop), the legacy
    // reader's refusal before and row count after, and the reduced
    // requirement set (features_after=0, protocol_after=1).
    QuerySpec("q222_drop_feature", { (s, dir) =>
      val root = graft.Scratch.dir("graft-q222").toString + "/t"
      val part = Td.load(s, dir, "part").select("p_partkey", "p_retailprice")
      TxLog.append(s, root, part.repartition(4))
      TxLog.setProperties(root, Map(TxLog.DeletionVectors.Enabled -> "true"))
      TxLog.delete(s, root, "p_partkey % 7 = 2") // live DVs gate the table
      def legacy[A](body: => A): A = {
        val prev = TxLog.readerCapabilities
        TxLog.readerCapabilities = TxLog.supportedFeatures - "deletionVectors"
        TxLog.invalidateSnapshots(root) // fresh legacy reader, cold cache
        try body finally TxLog.readerCapabilities = prev
      }
      val refusedBefore =
        try { legacy(TxLog.read(s, root).count()); 0L }
        catch { case _: TxLog.UnsupportedProtocolException => 1L }
      TxLog.setProperties(root, Map(TxLog.DeletionVectors.Enabled -> ""))
      TxLog.purgeDeletes(s, root)
      TxLog.dropFeature(s, root, "deletionVectors")
      val snap = TxLog.snapshot(root)
      val legacyRows = legacy(TxLog.read(s, root).count())
      TxLog.read(s, root)
        .agg(count(lit(1)).as("n_rows"), dsum(col("p_retailprice")).as("sum_price"))
        .withColumn("legacy_refused_before", lit(refusedBefore))
        .withColumn("legacy_rows_after", lit(legacyRows))
        .withColumn("features_after", lit(snap.features.size.toLong))
        .withColumn("wfeatures_after", lit(snap.wfeatures.size.toLong))
        .withColumn("protocol_after", lit(snap.protocol))
    },
      Some("""SELECT count(*) AS n_rows,
                     CAST(sum(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                     CAST(1 AS BIGINT) AS legacy_refused_before,
                     count(*) AS legacy_rows_after,
                     CAST(0 AS BIGINT) AS features_after,
                     CAST(0 AS BIGINT) AS wfeatures_after,
                     CAST(1 AS BIGINT) AS protocol_after
              FROM part WHERE NOT (p_partkey % 7 = 2)""")),

    // q223: INCREMENTAL PQ CODE MAINTENANCE (PqIndex) — the IvfIndex
    // discipline on the compressed tier: the packed code table is a
    // TxLog table keyed by the tracked row id, maintained from the
    // change feed against a FROZEN codebook (codes are pure per-row
    // functions of it, so maintenance is exact by construction — only
    // the delta is ever re-encoded). Pinned into the hash: the final
    // code assignment (an integer checksum over vec_id × subspace ×
    // code the DuckDB oracle replays with the exact subL2 argmin CTEs),
    // maintained ≡ re-encoded, per-window rows_applied, the zero-read
    // OPTIMIZE skip, and — new in r19 — the STREAMED drift
    // accumulators: each window's encode quality rides its merge
    // commit (one commit per window holds; a replayed pass skips data
    // AND accumulators together), so the cum/last counters pinned
    // AFTER the replay pass prove a fully-streamed table drifts
    // honestly and exactly once — the oracle re-derives both counts
    // from its own CTEs. The update and delete arrive in ONE
    // maintenance window (the sanctioned q227-restructure shape: both
    // change kinds kept, one fewer maintain pass) — last-image-per-id
    // dispatches each row to exactly one of upsert/delete.
    QuerySpec("q223_ann_pq_incremental", { (s, dir) =>
      import graft.operators.{PqIndex, Similarity}
      val root = graft.Scratch.dir("graft-q223").toString
      val src = s"$root/src"; val idx = s"$root/idx"
      // corpus capped at 600 ids — the sanctioned bench-weight trim
      // (q214 precedent; the r16 ledger queued this exact cut): a no-op
      // at the gate SFs (500 ids), it bounds the bench SF's corpus so
      // the protocol shape, not corpus size, carries the query's weight
      val ok = Td.load(s, dir, "embeddings").select("vec_id", "embedding")
        .where("vec_id < 600")
        .where(expr(Similarity.validEmbExpr(SparkSql, "embedding")))
        .localCheckpoint(true)
      val cbPlan = Similarity.pqCodebook(ok,
        "vec_id % 29 = 5 AND vec_id % 10 < 8", 16)
      val cb = s.createDataFrame(
        java.util.Arrays.asList(cbPlan.collect(): _*), cbPlan.schema)
        .localCheckpoint(true)
      (0 until 3).foreach(b => TxLog.append(s, src,
        ok.where(s"vec_id % 10 < 8 AND vec_id % 3 = $b").coalesce(1)))
      TxLog.enableRowTracking(s, src)
      TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true",
        TxLog.DeletionVectors.Enabled -> "true"))
      var at = PqIndex.initialize(s, src, idx, cb, 4, 16)
      // ONE window carries the embedding-flip UPDATE and the DV DELETE
      // (a row hit by both resolves to its last image — delete wins)
      TxLog.update(s, src, "vec_id % 11 = 3",
        Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
      TxLog.delete(s, src, "vec_id % 5 = 2")
      val rUpDel = PqIndex.maintain(s, src, idx, at, cb, 4, 16)
      at = rUpDel.srcVersion
      TxLog.optimize(s, src)
      val rOpt = PqIndex.maintain(s, src, idx, at, cb, 4, 16); at = rOpt.srcVersion
      TxLog.append(s, src, ok.where("vec_id % 10 >= 8"))
      val rApp = PqIndex.maintain(s, src, idx, at, cb, 4, 16)
      at = rApp.srcVersion
      // the last window arrives HANDS-FREE through PqIndex.stream (the
      // txn-tagged foreachBatch CDF consumer): exactly one code-table
      // commit for the window, a replayed pass commits nothing — both
      // pinned, and the final state still diffs bit-exact vs recompute
      TxLog.update(s, src, "vec_id % 19 = 6",
        Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
      val ckpt = s"$root/ckpt"
      val vIdx0 = TxLog.latestVersion(idx)
      PqIndex.stream(s, src, idx, ckpt, at, cb, 4, 16)
      val streamCommits = TxLog.latestVersion(idx) - vIdx0
      PqIndex.stream(s, src, idx, ckpt, at, cb, 4, 16)
      val noopCommits = TxLog.latestVersion(idx) - vIdx0 - streamCommits
      // drift counters read AFTER the replay pass: cum = every upsert
      // across the three upsert-bearing windows (streamed one
      // included), last = the streamed window — a double-accumulating
      // replay or a stream-blind accumulator both break these pins
      val drCum = PqIndex.driftReport(idx, 1000L, window = "cum")
      val drLast = PqIndex.driftReport(idx, 1000L)
      val got = TxLog.read(s, idx)
        .select("_row_id", "vec_id", "codes", "q_units").localCheckpoint(true)
      val want = PqIndex.recompute(s, src, cb, 4, 16)
      // one-job signed-union multiset equality (see [[multisetEqual]])
      val matches = if (TxQueries.multisetEqual(got, want)) 1L else 0L
      got.select(col("vec_id"), posexplode(col("codes")).as(Seq("s", "code")))
        .agg((count(lit(1)) / 4).cast(LongType).as("n_rows"),
          sum(col("vec_id") * (col("s") + 1) * (col("code") + 1)).as("code_checksum"))
        .withColumn("matches_rebuild", lit(matches))
        .withColumn("optimize_skipped", lit(if (rOpt.layoutOnlySkip) 1L else 0L))
        .withColumn("optimize_rows_applied", lit(rOpt.rowsApplied))
        .withColumn("updel_rows_applied", lit(rUpDel.rowsApplied))
        .withColumn("append_rows_applied", lit(rApp.rowsApplied))
        .withColumn("stream_commits", lit(streamCommits))
        .withColumn("noop_pass_commits", lit(noopCommits))
        .withColumn("drift_cum_n", lit(drCum.flowN))
        .withColumn("drift_last_n", lit(drLast.flowN))
    }, {
      val d = DuckSql
      def sub(a: String, b: String) =
        graft.operators.Similarity.subL2Expr(d, a, b, 16)
      val vOK = graft.operators.Similarity.validEmbExpr(d, "embedding")
      Some(s"""WITH ok AS (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id < 600 AND $vOK),
               cb AS (SELECT cw_id, cw_emb FROM (
                        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cw_id,
                               embedding AS cw_emb
                        FROM ok WHERE vec_id % 29 = 5 AND vec_id % 10 < 8)
                      WHERE cw_id < 16),
               base AS (SELECT vec_id, embedding FROM ok WHERE vec_id % 10 < 8),
               upd AS (SELECT vec_id,
                              CASE WHEN vec_id % 11 = 3
                                   THEN ${d.map("embedding", "x", "-x")}
                                   ELSE embedding END AS embedding
                       FROM base),
               surv AS (SELECT * FROM upd WHERE vec_id % 5 <> 2),
               late AS (SELECT vec_id, embedding FROM ok WHERE vec_id % 10 >= 8),
               fin0 AS (SELECT * FROM surv UNION ALL SELECT * FROM late),
               fin AS (SELECT vec_id,
                              CASE WHEN vec_id % 19 = 6
                                   THEN ${d.map("embedding", "x", "-x")}
                                   ELSE embedding END AS embedding
                       FROM fin0),
               subs AS (SELECT unnest(generate_series(0, 3)) AS s),
               dists AS (
                 SELECT f.vec_id, sub.s, c.cw_id,
                        ${sub("f.embedding", "c.cw_emb")} AS dist
                 FROM fin f CROSS JOIN subs sub CROSS JOIN cb c),
               codes AS (
                 SELECT vec_id, s, cw_id AS code FROM (
                   SELECT vec_id, s, cw_id,
                          row_number() OVER (PARTITION BY vec_id, s
                               ORDER BY dist, cw_id) AS rn
                   FROM dists) WHERE rn = 1)
               SELECT CAST(count(*) // 4 AS BIGINT) AS n_rows,
                      CAST(sum(vec_id * (s + 1) * (code + 1)) AS BIGINT) AS code_checksum,
                      CAST(1 AS BIGINT) AS matches_rebuild,
                      CAST(1 AS BIGINT) AS optimize_skipped,
                      CAST(0 AS BIGINT) AS optimize_rows_applied,
                      (SELECT count(*) FROM base
                       WHERE vec_id % 11 = 3 OR vec_id % 5 = 2) AS updel_rows_applied,
                      (SELECT count(*) FROM late) AS append_rows_applied,
                      CAST(1 AS BIGINT) AS stream_commits,
                      CAST(0 AS BIGINT) AS noop_pass_commits,
                      (SELECT count(*) FROM base
                       WHERE vec_id % 11 = 3 AND vec_id % 5 <> 2)
                        + (SELECT count(*) FROM late)
                        + (SELECT count(*) FROM fin0 WHERE vec_id % 19 = 6) AS drift_cum_n,
                      (SELECT count(*) FROM fin0 WHERE vec_id % 19 = 6) AS drift_last_n
               FROM codes""")
    }),

    // q224: INCREMENTAL k-NN GRAPH MAINTENANCE (GraphAnnIndex) — the
    // last ANN tier enters the oracle gate. Graph edges are
    // corpus-dependent (the FreshDiskANN trade: maintained ≠ rebuilt
    // byte-wise), so the gate pins INVARIANT and RECALL FACTS instead
    // of edge bytes: dead-edge counts (edges ⊆ live×live) the oracle
    // states as 0 — which is exactly what fails if an eviction misses,
    // including the re-key case where the retiring id exists ONLY in
    // the UPDATE preimage; every appended and every surviving re-keyed
    // node wired in (counts the oracle re-derives from its own CTE
    // replay of the windows — move+rekey+delete CONSOLIDATED into one
    // window per the r18-verdict restructure, then the layout-only
    // OPTIMIZE, the late append, and the LAST window arriving
    // hands-free through GraphAnnIndex.stream with its
    // one-commit/replay-noop pins in the hash); the degree cap; the
    // zero-read OPTIMIZE skip; per-window rows_applied; the EXACT brute-force
    // top-3 truth as an order-insensitive checksum both engines compute
    // independently (exact cosine, vec_id tie-break); and the recall
    // claims — maintained ≥ 3/5 of truth and within 10 points of a
    // full rebuild — as pinned booleans. (The raw recall NUMERATORS are
    // SF-dependent — the embeddings table differs per SF — so the
    // claims, not the numerators, are the SF-stable facts in the hash;
    // the numerators themselves are spec-pinned in GraphAnnIndexSpec.
    // Measured at close (round 18, streamed window included):
    // maintained/rebuilt recall@3 = 0.922/0.987 at sf0.001, 0.915/0.987
    // at sf0.01, 0.910/0.977 at sf0.1 — the floor holds with ≥1.5×
    // margin and the slack with ≥1.39× at every SF.)
    QuerySpec("q224_ann_graph_incremental", { (s, dir) =>
      import graft.operators.{GraphAnn, GraphAnnIndex, Similarity}
      val root = graft.Scratch.dir("graft-q224").toString
      val src = s"$root/src"; val idx = s"$root/idx"
      val gM = 8
      // corpus capped at 600 ids — the sanctioned bench-weight trim
      // (q214 precedent; the r16 ledger queued this exact cut): a no-op
      // at the gate SFs (500 ids), it bounds the bench SF's corpus so
      // the protocol shape, not corpus size, carries the query's weight
      val ok = Td.load(s, dir, "embeddings").select("vec_id", "embedding")
        .where("vec_id < 600")
        .where(expr(Similarity.validEmbExpr(SparkSql, "embedding")))
        .localCheckpoint(true)
      val cents = ok.where("vec_id % 100 = 7")
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
        .localCheckpoint(true)
      (0 until 3).foreach(b => TxLog.append(s, src,
        ok.where(s"vec_id % 10 < 8 AND vec_id % 3 = $b").coalesce(1)))
      TxLog.enableRowTracking(s, src)
      TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true",
        TxLog.DeletionVectors.Enabled -> "true"))
      var at = GraphAnnIndex.initialize(s, src, idx, cents, gM, rounds = 1)
      // ONE window carries all three DML behaviors (the r18-verdict
      // restructure: every behavior kept, one fewer maintain pass —
      // the q227 27.6→12.9 s template): an embedding MOVE (vec_id %
      // 13 = 2 flips sign), a RE-KEY under the same tracked row id
      // (vec_id % 17 = 5 gets +100000) — the re-keyed id retires
      // through the UPDATE PREIMAGE, which is exactly what
      // post-image-only eviction would miss — and a DV DELETE over
      // the post-rekey ids (a row re-keyed AND deleted resolves to
      // its last image; its OLD id still evicts via the preimage)
      TxLog.update(s, src, "vec_id % 13 = 2 OR vec_id % 17 = 5", Map(
        "embedding" -> ("CASE WHEN vec_id % 13 = 2 THEN " +
          "transform(embedding, x -> CAST(-x AS FLOAT)) ELSE embedding END"),
        "vec_id" -> ("CASE WHEN vec_id % 17 = 5 THEN vec_id + 100000 " +
          "ELSE vec_id END")))
      TxLog.delete(s, src, "vec_id % 7 = 3")
      val rUpDel = GraphAnnIndex.maintain(s, src, idx, at, gM,
        beam = 32, hops = 3, entryCount = 8, cents = Some(cents))
      at = rUpDel.srcVersion
      TxLog.optimize(s, src)
      val rOpt = GraphAnnIndex.maintain(s, src, idx, at, gM,
        cents = Some(cents)); at = rOpt.srcVersion
      TxLog.append(s, src, ok.where("vec_id % 10 >= 8"))
      val rApp = GraphAnnIndex.maintain(s, src, idx, at, gM,
        beam = 32, hops = 3, entryCount = 8, cents = Some(cents))
      at = rApp.srcVersion
      // the LAST window arrives HANDS-FREE through GraphAnnIndex.stream
      // (the txn-tagged foreachBatch CDF consumer) — the one family
      // stream path that was outside the oracle gate, and the family
      // whose maintenance is NOT bit-exact, so it needs the gate most:
      // exactly one index commit for the window and a replayed pass
      // committing nothing are both pinned, and the final graph feeds
      // the same invariant + recall pins below
      TxLog.update(s, src, "vec_id % 31 = 11", Map(
        "embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
      val ckpt = s"$root/ckpt"
      val vIdx0 = TxLog.latestVersion(idx)
      GraphAnnIndex.stream(s, src, idx, ckpt, at, gM, beam = 32, hops = 3,
        entryCount = 8, cents = Some(cents))
      val streamCommits = TxLog.latestVersion(idx) - vIdx0
      GraphAnnIndex.stream(s, src, idx, ckpt, at, gM, beam = 32, hops = 3,
        entryCount = 8, cents = Some(cents)) // replay: no-op
      val noopCommits = TxLog.latestVersion(idx) - vIdx0 - streamCommits
      // live count + checksum ride the checkpoint as observe metrics
      // (was: a separate agg job over the materialized frame)
      val obsLive = org.apache.spark.sql.Observation()
      val live = TxLog.read(s, src).select("vec_id", "embedding")
        .observe(obsLive, count(lit(1)).as("n"), sum("vec_id").as("ck"))
        .localCheckpoint(true)
      val edges = TxLog.read(s, idx).select("src", "dst", "cosine")
        .localCheckpoint(true)
      val liveIds = live.select("vec_id")
      // ONE aggregation serves every edge invariant (dead-src/dead-dst
      // edge counts, wired-in distinct-src counts, degree cap) — the
      // five separate edge-scan actions it replaces were pure
      // job-scheduling weight (the r18 steal adjudication's cost
      // model); live vec_ids are unique, so the left joins cannot
      // multiply edges and NULL-ness is exactly anti-join membership
      val eRow = edges
        .join(liveIds.select(col("vec_id").as("src"), lit(1).as("__ls")),
          Seq("src"), "left")
        .join(liveIds.select(col("vec_id").as("dst"), lit(1).as("__ld")),
          Seq("dst"), "left")
        .groupBy("src")
        .agg(count(lit(1)).as("deg"),
          sum(when(col("__ls").isNull, 1L).otherwise(0L)).as("dead_s"),
          sum(when(col("__ld").isNull, 1L).otherwise(0L)).as("dead_d"))
        .agg(coalesce(sum(col("dead_s")), lit(0L)).as("dead_src"),
          coalesce(sum(col("dead_d")), lit(0L)).as("dead_dst"),
          count(when(col("src") < 100000L && col("src") % 10 >= 8, 1))
            .as("wired_late"),
          count(when(col("src") >= 100000L, 1)).as("wired_rekeyed"),
          // coalesced so an empty edge set fails the invariants legibly
          // instead of an opaque getLong NPE (r19 ADVICE item 4)
          coalesce(max(col("deg")), lit(0L)).as("max_deg")).head()
      val deadSrc = eRow.getLong(0); val deadDst = eRow.getLong(1)
      val wiredLate = eRow.getLong(2); val wiredRekeyed = eRow.getLong(3)
      val maxDeg = eRow.getLong(4)
      // live count + checksum came free with the checkpoint (observe)
      val mLive = obsLive.get
      val nLive = mLive("n").asInstanceOf[Long]
      val liveChecksum = mLive("ck").asInstanceOf[Long]
      val queries = live.where("vec_id % 9 = 1").localCheckpoint(true)
      // truth size + checksum ride the truth checkpoint the same way
      val obsT = org.apache.spark.sql.Observation()
      val truth = Similarity.topK(live, queries, 3)
        .observe(obsT, count(lit(1)).as("n"),
          sum(col("q_id") * 1000003L + col("vec_id")).as("ck"))
        .localCheckpoint(true)
      val mT = obsT.get
      val truthPairs = mT("n").asInstanceOf[Long]
      def hits(res: org.apache.spark.sql.DataFrame): Long = res
        .select("q_id", "vec_id").intersect(truth.select("q_id", "vec_id"))
        .count()
      val maintainedHits = hits(GraphAnnIndex.searchTopK(s, src, idx,
        queries, k = 3, beam = 32, hops = 3, entryCount = 8))
      val rebuiltHits = hits(GraphAnn.searchTopK(live,
        GraphAnnIndex.buildFor(live, cents, gM, rounds = 1,
          knownCount = Some(nLive)), queries,
        k = 3, beam = 32, hops = 3, entryCount = 8))
      s.range(1)
        .select(lit(nLive).as("n_live"), lit(liveChecksum).as("live_checksum"))
        .withColumn("truth_pairs", lit(truthPairs))
        .withColumn("truth_checksum", lit(mT("ck").asInstanceOf[Long]))
        .withColumn("dead_src_edges", lit(deadSrc))
        .withColumn("dead_dst_edges", lit(deadDst))
        .withColumn("appended_wired", lit(wiredLate))
        .withColumn("rekeyed_wired", lit(wiredRekeyed))
        .withColumn("degree_cap_ok", lit(if (maxDeg <= gM + 2) 1L else 0L))
        .withColumn("recall_floor_ok",
          lit(if (5L * maintainedHits >= 3L * truthPairs) 1L else 0L))
        .withColumn("recall_slack_ok",
          lit(if (10L * (rebuiltHits - maintainedHits) <= truthPairs) 1L else 0L))
        .withColumn("optimize_skipped", lit(if (rOpt.layoutOnlySkip) 1L else 0L))
        .withColumn("updel_rows_applied", lit(rUpDel.rowsApplied))
        .withColumn("append_rows_applied", lit(rApp.rowsApplied))
        .withColumn("stream_commits", lit(streamCommits))
        .withColumn("noop_pass_commits", lit(noopCommits))
    }, {
      val d = DuckSql
      def cos(a: String, b: String) =
        s"${d.dsum(d.zipMul(a, b))} / (sqrt(${d.dsum(d.zipMul(a, a))}) * sqrt(${d.dsum(d.zipMul(b, b))}))"
      val vOK = graft.operators.Similarity.validEmbExpr(d, "embedding")
      Some(s"""WITH ok AS (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id < 600 AND $vOK),
               base AS (SELECT vec_id, embedding FROM ok WHERE vec_id % 10 < 8),
               upd AS (SELECT vec_id,
                              CASE WHEN vec_id % 13 = 2
                                   THEN ${d.map("embedding", "x", "-x")}
                                   ELSE embedding END AS embedding
                       FROM base),
               rekeyed AS (SELECT CASE WHEN vec_id % 17 = 5
                                       THEN vec_id + 100000
                                       ELSE vec_id END AS vec_id, embedding
                           FROM upd),
               surv AS (SELECT * FROM rekeyed WHERE vec_id % 7 <> 3),
               late AS (SELECT vec_id, embedding FROM ok WHERE vec_id % 10 >= 8),
               fin0 AS (SELECT * FROM surv UNION ALL SELECT * FROM late),
               fin AS (SELECT vec_id,
                              CASE WHEN vec_id % 31 = 11
                                   THEN ${d.map("embedding", "x", "-x")}
                                   ELSE embedding END AS embedding
                       FROM fin0),
               q AS (SELECT vec_id AS q_id, embedding AS q_emb
                     FROM fin WHERE vec_id % 9 = 1),
               scored AS (SELECT q.q_id, f.vec_id,
                                 ${cos("q.q_emb", "f.embedding")} AS cosine
                          FROM fin f CROSS JOIN q WHERE f.vec_id <> q.q_id),
               truth AS (SELECT q_id, vec_id FROM (
                           SELECT q_id, vec_id,
                                  row_number() OVER (PARTITION BY q_id
                                       ORDER BY cosine DESC, vec_id) AS rn
                           FROM scored) WHERE rn <= 3)
               SELECT (SELECT count(*) FROM fin) AS n_live,
                      (SELECT CAST(sum(vec_id) AS BIGINT) FROM fin) AS live_checksum,
                      count(*) AS truth_pairs,
                      CAST(sum(q_id * 1000003 + vec_id) AS BIGINT) AS truth_checksum,
                      CAST(0 AS BIGINT) AS dead_src_edges,
                      CAST(0 AS BIGINT) AS dead_dst_edges,
                      (SELECT count(*) FROM late) AS appended_wired,
                      (SELECT count(*) FROM surv WHERE vec_id >= 100000) AS rekeyed_wired,
                      CAST(1 AS BIGINT) AS degree_cap_ok,
                      CAST(1 AS BIGINT) AS recall_floor_ok,
                      CAST(1 AS BIGINT) AS recall_slack_ok,
                      CAST(1 AS BIGINT) AS optimize_skipped,
                      (SELECT count(*) FROM base
                       WHERE vec_id % 13 = 2 OR vec_id % 17 = 5
                          OR (CASE WHEN vec_id % 17 = 5 THEN vec_id + 100000
                              ELSE vec_id END) % 7 = 3) AS updel_rows_applied,
                      (SELECT count(*) FROM late) AS append_rows_applied,
                      CAST(1 AS BIGINT) AS stream_commits,
                      CAST(0 AS BIGINT) AS noop_pass_commits
               FROM truth""")
    }),

    // q225: INDEX STALENESS / DRIFT REPORT (IvfIndex.driftReport) — the
    // signal that tells you WHEN a frozen quantizer's rebuild is due
    // (freezing is the published IVF trade; production systems pair it
    // with a drift monitor). Every maintained vector's assignment
    // quality (best-cell cosine, integer basis points) is accumulated
    // into index-table PROPERTIES by the init/maintain passes that
    // scored it anyway, so the report is an O(1) driver-side property
    // read — no corpus rescan, no kernel re-runs (its signature takes
    // no SparkSession). Pinned into the hash: the baseline average, a
    // SAME-DISTRIBUTION window's flow average and non-trip, a
    // DELIBERATELY DRIFTED window's collapsed flow average and trip —
    // with the DuckDB oracle replaying the full accumulator arithmetic
    // (argmax-cosine per vector, floor(10000·cos), exact integer sums,
    // floor-division averages, the band comparisons) from the raw
    // corpus, so a drift regression fails the ORACLE, not a spec.
    QuerySpec("q225_index_drift", { (s, dir) =>
      import graft.operators.{IvfIndex, Similarity}
      val root = graft.Scratch.dir("graft-q225").toString
      val src = s"$root/src"; val idx = s"$root/idx"
      val band = 2000L
      // corpus capped at 600 ids — the sanctioned bench-weight trim
      // (q214 precedent; the r16 ledger queued this exact cut): a no-op
      // at the gate SFs (500 ids), it bounds the bench SF's corpus so
      // the protocol shape, not corpus size, carries the query's weight
      val ok = Td.load(s, dir, "embeddings").select("vec_id", "embedding")
        .where("vec_id < 600")
        .where(expr(Similarity.validEmbExpr(SparkSql, "embedding")))
        .localCheckpoint(true)
      val cents = ok.where("vec_id % 100 = 7").localCheckpoint(true)
      // the corpus the quantizer serves WELL: every vector sits ON its
      // block's anchor (the cent) — baseline quality ≈ 10000 bp. The
      // real embeddings table's every-100th-vector quantizer explains
      // too little variance for ANY flow to score much worse than its
      // own baseline (measured: no simple transform trips), so the
      // scenario models the case the drift monitor exists for: a
      // well-fit quantizer meeting an off-distribution ingest window
      def anchored(rows: org.apache.spark.sql.DataFrame) = rows
        .withColumn("__aid", col("vec_id") - col("vec_id") % 100 + 7)
        .join(cents.select(col("vec_id").as("__aid"),
          col("embedding").as("__aemb")), Seq("__aid"))
        .select(col("vec_id"), col("__aemb").as("embedding"))
      TxLog.append(s, src, anchored(ok.where("vec_id % 2 = 0")))
      TxLog.enableRowTracking(s, src)
      TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
      var at = IvfIndex.initialize(s, src, idx, cents)
      // window A: the same (anchored) distribution — the signal stays quiet
      TxLog.append(s, src, anchored(ok.where("vec_id % 2 = 1")))
      val rA = IvfIndex.maintain(s, src, idx, at, cents); at = rA.srcVersion
      val fresh = IvfIndex.driftReport(idx, band)
      // window B: RAW unclustered vectors — the distribution shift the
      // frozen quantizer cannot serve; the per-window signal must trip
      TxLog.append(s, src, ok.where("vec_id % 3 = 1")
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      val rB = IvfIndex.maintain(s, src, idx, at, cents)
      val drifted = IvfIndex.driftReport(idx, band)
      val cum = IvfIndex.driftReport(idx, band, window = "cum")
      s.range(1).select(
        lit(fresh.baseAvgBp).as("base_avg_bp"),
        lit(fresh.flowAvgBp).as("fresh_avg_bp"),
        lit(fresh.driftBp).as("fresh_drift_bp"),
        lit(if (fresh.tripped) 1L else 0L).as("fresh_tripped"),
        lit(fresh.flowN).as("fresh_n"),
        lit(drifted.flowAvgBp).as("drifted_avg_bp"),
        lit(drifted.driftBp).as("drifted_drift_bp"),
        lit(if (drifted.tripped) 1L else 0L).as("drifted_tripped"),
        lit(drifted.flowN).as("drifted_n"),
        lit(cum.flowN).as("cum_n"))
    }, {
      val d = DuckSql
      def cos(a: String, b: String) =
        s"${d.dsum(d.zipMul(a, b))} / (sqrt(${d.dsum(d.zipMul(a, a))}) * sqrt(${d.dsum(d.zipMul(b, b))}))"
      val vOK = graft.operators.Similarity.validEmbExpr(d, "embedding")
      Some(s"""WITH ok AS (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id < 600 AND $vOK),
               cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
                         FROM ok WHERE vec_id % 100 = 7),
               anch AS (SELECT o.vec_id, c.cent_emb AS embedding
                        FROM ok o JOIN cents c
                          ON c.cent_id = o.vec_id - o.vec_id % 100 + 7),
               base AS (SELECT vec_id, embedding FROM anch WHERE vec_id % 2 = 0),
               freshw AS (SELECT vec_id, embedding FROM anch WHERE vec_id % 2 = 1),
               driftw AS (SELECT vec_id, embedding FROM ok WHERE vec_id % 3 = 1),
               bbp AS (SELECT b.vec_id,
                              CAST(floor(10000 * max(${cos("b.embedding", "c.cent_emb")})) AS BIGINT) AS bp
                       FROM base b CROSS JOIN cents c GROUP BY b.vec_id),
               fbp AS (SELECT f.vec_id,
                              CAST(floor(10000 * max(${cos("f.embedding", "c.cent_emb")})) AS BIGINT) AS bp
                       FROM freshw f CROSS JOIN cents c GROUP BY f.vec_id),
               dbp AS (SELECT w.vec_id,
                              CAST(floor(10000 * max(${cos("w.embedding", "c.cent_emb")})) AS BIGINT) AS bp
                       FROM driftw w CROSS JOIN cents c GROUP BY w.vec_id),
               avgs AS (SELECT
                 (SELECT CAST(sum(bp) AS BIGINT) // count(*) FROM bbp) AS base_avg,
                 (SELECT CAST(sum(bp) AS BIGINT) // count(*) FROM fbp) AS fresh_avg,
                 (SELECT CAST(sum(bp) AS BIGINT) // count(*) FROM dbp) AS drift_avg,
                 (SELECT count(*) FROM fbp) AS fresh_n,
                 (SELECT count(*) FROM dbp) AS drift_n)
               SELECT base_avg AS base_avg_bp,
                      fresh_avg AS fresh_avg_bp,
                      base_avg - fresh_avg AS fresh_drift_bp,
                      CASE WHEN base_avg - fresh_avg > 2000 THEN CAST(1 AS BIGINT)
                           ELSE CAST(0 AS BIGINT) END AS fresh_tripped,
                      fresh_n,
                      drift_avg AS drifted_avg_bp,
                      base_avg - drift_avg AS drifted_drift_bp,
                      CASE WHEN base_avg - drift_avg > 2000 THEN CAST(1 AS BIGINT)
                           ELSE CAST(0 AS BIGINT) END AS drifted_tripped,
                      drift_n AS drifted_n,
                      fresh_n + drift_n AS cum_n
               FROM avgs""")
    }),

    // q227: GRAPH RECALL MONITOR (GraphAnnIndex.enableProbes /
    // recallReport) — the staleness signal for the ONE index tier whose
    // maintenance is not bit-exact, so recall can decay SILENTLY across
    // windows. The monitor freezes a small probe benchmark (probe set +
    // exact top-3 truth, stamped into index properties at enable time —
    // the one corpus-sized pass, the IvfIndex baseline discipline);
    // every maintenance window then delta-invalidates exactly the pairs
    // it touches and re-searches ONLY the probes (cost ∝ probes, never
    // the corpus), and recallReport itself is an O(1) property read.
    // The scenario runs the SAME delete-heavy window through BOTH
    // maintenance modes from one build: eagerly-REPAIRED (the delete-
    // consolidation patch) holds recall and must NOT trip; EVICTION-
    // ONLY (repair = false — the published lazy-repair trade) decays
    // and MUST trip. Pinned into the hash: the benchmark sizes before/
    // after (the oracle re-derives them from its own truth CTE — exact
    // cosine top-3, id tie-break, endpoint-survival filter), identical
    // shrinkage across both modes, the three band verdicts, and (r19)
    // the EXHAUSTION leg: a second eviction window churns three
    // quarters of the probes away, the surviving benchmark drops below
    // recallReport's 25% floor, and the exhausted flag must trip while
    // the window-1 verdicts, captured before it, stay pinned unchanged.
    QuerySpec("q227_ann_graph_recall_monitor", { (s, dir) =>
      import graft.operators.{GraphAnnIndex, Similarity}
      val root = graft.Scratch.dir("graft-q227").toString
      val src = s"$root/src"
      val idxR = s"$root/idxr"; val idxL = s"$root/idxl"
      val gM = 8; val band = 1000L
      // corpus capped at 600 ids — the q223/q224/q225 bench-weight trim;
      // the corpus count (buildFor's size dispatch) rides the checkpoint
      // as an observe metric instead of a separate count job
      val obsOk = org.apache.spark.sql.Observation()
      val ok = Td.load(s, dir, "embeddings").select("vec_id", "embedding")
        .where("vec_id < 600")
        .where(expr(Similarity.validEmbExpr(SparkSql, "embedding")))
        .observe(obsOk, count(lit(1)).as("n"))
        .localCheckpoint(true)
      // NOT checkpointed: this scenario never evaluates the quantizer —
      // the ≤ one-cell corpus takes the exact build and every window is
      // arrivals-free (batch-internal wiring never fires) — so an eager
      // materialization here was one pure extra job; a cheap projection
      // of the checkpointed `ok` covers any lazy read
      val cents = ok.where("vec_id % 100 = 7")
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      TxLog.append(s, src, ok)
      TxLog.enableRowTracking(s, src)
      TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
      val at = TxLog.latestVersion(src)
      // ONE build feeds both indexes — the only difference between the
      // two maintenance runs is the repair mode
      val g = GraphAnnIndex.buildFor(ok, cents, gM, rounds = 1,
        knownCount = Some(obsOk.get("n").asInstanceOf[Long]))
        .localCheckpoint(true)
      TxLog.append(s, idxR, g): Unit
      TxLog.append(s, idxL, g): Unit
      GraphAnnIndex.enableProbes(s, src, idxR,
        "vec_id % 37 = 2", k = 3, beam = 8, hops = 3, entryCount = 4)
      // idxL holds the BYTE-IDENTICAL graph over the same source
      // version, so its probe plane (ids/truth/conf/base/last/asof) is
      // identical by construction — stamp it by property copy instead
      // of re-paying the corpus-sized truth pass and the probe search
      // a second time (one enableProbes, not two; ~10 fewer scheduled
      // jobs in the steal-sensitive protocol family)
      locally {
        val pr = TxLog.snapshot(idxR).props
        TxLog.setProperties(idxL, Seq(GraphAnnIndex.Probe.Ids,
          GraphAnnIndex.Probe.Truth, GraphAnnIndex.Probe.Conf,
          GraphAnnIndex.Probe.Base, GraphAnnIndex.Probe.Last,
          GraphAnnIndex.Probe.AsOf).map(k2 => k2 -> pr(k2)).toMap): Unit
      }
      val base = GraphAnnIndex.recallReport(idxR, band)
      // one delete-heavy window AROUND the probes (churn the corpus,
      // keep the benchmark measurable): two-thirds of the non-probe
      // corpus departs — the decay a lazy index accumulates between
      // real-world probe checks, compressed into one window
      TxLog.setProperties(src, Map(TxLog.DeletionVectors.Enabled -> "true"))
      TxLog.delete(s, src, "vec_id % 3 IN (0, 1) AND vec_id % 37 <> 2")
      GraphAnnIndex.maintain(s, src, idxR, at, gM, cents = Some(cents)): Unit
      val atL = GraphAnnIndex.maintain(s, src, idxL, at, gM,
        cents = Some(cents), repair = false).srcVersion
      val rR = GraphAnnIndex.recallReport(idxR, band)
      val rL = GraphAnnIndex.recallReport(idxL, band)
      // (measured at close, band 1000 bp: base recall 6190/6190/8235 bp
      // at sf0.001/0.01/0.1; lazy drop 1815/3690/2941 — trips with
      // ≥1.8× margin; repaired drop −3810/−3185/0 — holds with a full
      // band of distance; base floor 4000 holds with ≥1.5×)
      // CHURN-TO-EXHAUSTION (r19): a second eviction window deletes
      // three quarters of the PROBES themselves — the benchmark decays
      // below recallReport's 25% floor and the monitor must SAY it
      // stopped monitoring (exhausted flag) instead of quietly
      // reporting the baseline forever; the window-1 verdicts above
      // are captured before it and stay pinned unchanged
      TxLog.delete(s, src, "vec_id % 37 = 2 AND vec_id % 4 <> 3")
      GraphAnnIndex.maintain(s, src, idxL, atL, gM, cents = Some(cents),
        repair = false): Unit
      val rExh = GraphAnnIndex.recallReport(idxL, band)
      s.range(1).select(
        lit(base.pairs).as("truth_pairs_init"),
        lit(rR.pairs).as("repaired_pairs"),
        lit(rL.pairs).as("lazy_pairs"),
        lit(if (base.baseRecallBp >= 4000L) 1L else 0L).as("base_floor_ok"),
        lit(if (base.tripped) 1L else 0L).as("base_tripped"),
        lit(if (rR.tripped) 1L else 0L).as("repaired_tripped"),
        lit(if (rL.tripped) 1L else 0L).as("lazy_tripped"),
        lit(if (rL.dropBp > rR.dropBp) 1L else 0L).as("lazy_decays_more"),
        lit(if (base.exhausted || rR.exhausted || rL.exhausted) 1L else 0L)
          .as("pre_exhausted"),
        lit(rExh.pairs).as("churned_pairs"),
        lit(if (rExh.exhausted) 1L else 0L).as("churned_exhausted"))
    }, {
      val d = DuckSql
      def cos(a: String, b: String) =
        s"${d.dsum(d.zipMul(a, b))} / (sqrt(${d.dsum(d.zipMul(a, a))}) * sqrt(${d.dsum(d.zipMul(b, b))}))"
      val vOK = graft.operators.Similarity.validEmbExpr(d, "embedding")
      Some(s"""WITH ok AS (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id < 600 AND $vOK),
               q AS (SELECT vec_id AS q_id, embedding AS q_emb
                     FROM ok WHERE vec_id % 37 = 2),
               scored AS (SELECT q.q_id, o.vec_id,
                                 ${cos("q.q_emb", "o.embedding")} AS cosine
                          FROM ok o CROSS JOIN q WHERE o.vec_id <> q.q_id),
               truth AS (SELECT q_id, vec_id FROM (
                           SELECT q_id, vec_id,
                                  row_number() OVER (PARTITION BY q_id
                                       ORDER BY cosine DESC, vec_id) AS rn
                           FROM scored) WHERE rn <= 3),
               surv AS (SELECT q_id, vec_id FROM truth
                        WHERE vec_id % 37 = 2 OR vec_id % 3 = 2),
               surv2 AS (SELECT q_id, vec_id FROM surv
                         WHERE q_id % 4 = 3
                           AND (CASE WHEN vec_id % 37 = 2
                                THEN vec_id % 4 = 3
                                ELSE vec_id % 3 = 2 END))
               SELECT count(*) AS truth_pairs_init,
                      (SELECT count(*) FROM surv) AS repaired_pairs,
                      (SELECT count(*) FROM surv) AS lazy_pairs,
                      CAST(1 AS BIGINT) AS base_floor_ok,
                      CAST(0 AS BIGINT) AS base_tripped,
                      CAST(0 AS BIGINT) AS repaired_tripped,
                      CAST(1 AS BIGINT) AS lazy_tripped,
                      CAST(1 AS BIGINT) AS lazy_decays_more,
                      CAST(0 AS BIGINT) AS pre_exhausted,
                      (SELECT count(*) FROM surv2) AS churned_pairs,
                      CAST(1 AS BIGINT) AS churned_exhausted
               FROM truth""")
    }),

    // q226: PQ DRIFT REPORT (PqIndex.driftReport) — q225's discipline
    // ported to the compressed tier's quality measure (total
    // quantization distance in integer micro-units; HIGHER is worse,
    // unlike the IVF cosine). The corpus is ANCHORED: every baseline
    // and fresh-window vector sits ON its own codeword (vec_id % 16),
    // so the baseline/fresh averages are EXACTLY zero in both engines
    // and the only cross-engine floats in the hash are the drifted
    // window's own subspace distances — which the DuckDB oracle
    // replays in full (per-subspace argmin distance, DECIMAL(18,6)
    // micro-unit sums, exact integer accumulators, floor-division
    // averages, the band comparisons), so a PQ drift regression fails
    // the ORACLE, not a spec.
    QuerySpec("q226_pq_drift", { (s, dir) =>
      import graft.operators.{PqIndex, Similarity}
      val root = graft.Scratch.dir("graft-q226").toString
      val src = s"$root/src"; val idx = s"$root/idx"
      val band = 1000L
      // corpus capped at 600 ids — the q223/q224/q225 bench-weight trim
      val ok = Td.load(s, dir, "embeddings").select("vec_id", "embedding")
        .where("vec_id < 600")
        .where(expr(Similarity.validEmbExpr(SparkSql, "embedding")))
        .localCheckpoint(true)
      val cbPlan = Similarity.pqCodebook(ok,
        "vec_id % 29 = 5 AND vec_id % 10 < 8", 16)
      val cb = s.createDataFrame(
        java.util.Arrays.asList(cbPlan.collect(): _*), cbPlan.schema)
        .localCheckpoint(true)
      // anchor: vector := its own codeword's embedding (an inner join —
      // an id whose codeword slot is absent at this SF simply drops,
      // replayed identically by the oracle's join)
      def anchored(rows: org.apache.spark.sql.DataFrame) = rows
        .withColumn("__cw", col("vec_id") % 16)
        .join(cb.select(col("cw_id").cast("long").as("__cw"), col("cw_emb")),
          Seq("__cw"))
        .select(col("vec_id"), col("cw_emb").as("embedding"))
      TxLog.append(s, src, anchored(ok.where("vec_id % 2 = 0")))
      TxLog.enableRowTracking(s, src)
      TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
      var at = PqIndex.initialize(s, src, idx, cb, 4, 16)
      // window A: still anchored — the signal stays quiet
      TxLog.append(s, src, anchored(ok.where("vec_id % 2 = 1")))
      val rA = PqIndex.maintain(s, src, idx, at, cb, 4, 16); at = rA.srcVersion
      val fresh = PqIndex.driftReport(idx, band)
      // window B: RAW unanchored vectors — the frozen codebook cannot
      // serve them; the per-window signal must trip
      TxLog.append(s, src, ok.where("vec_id % 3 = 1")
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      PqIndex.maintain(s, src, idx, at, cb, 4, 16): Unit
      val drifted = PqIndex.driftReport(idx, band)
      val cum = PqIndex.driftReport(idx, band, window = "cum")
      s.range(1).select(
        lit(fresh.baseAvgUnits).as("base_avg_units"),
        lit(fresh.flowAvgUnits).as("fresh_avg_units"),
        lit(fresh.driftUnits).as("fresh_drift_units"),
        lit(if (fresh.tripped) 1L else 0L).as("fresh_tripped"),
        lit(fresh.flowN).as("fresh_n"),
        lit(drifted.flowAvgUnits).as("drifted_avg_units"),
        lit(drifted.driftUnits).as("drifted_drift_units"),
        lit(if (drifted.tripped) 1L else 0L).as("drifted_tripped"),
        lit(drifted.flowN).as("drifted_n"),
        lit(cum.flowN).as("cum_n"))
    }, {
      val d = DuckSql
      def sub(a: String, b: String) =
        graft.operators.Similarity.subL2Expr(d, a, b, 16)
      val vOK = graft.operators.Similarity.validEmbExpr(d, "embedding")
      Some(s"""WITH ok AS (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id < 600 AND $vOK),
               cb AS (SELECT cw_id, cw_emb FROM (
                        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cw_id,
                               embedding AS cw_emb
                        FROM ok WHERE vec_id % 29 = 5 AND vec_id % 10 < 8)
                      WHERE cw_id < 16),
               anch AS (SELECT o.vec_id, c.cw_emb AS embedding
                        FROM ok o JOIN cb c ON c.cw_id = o.vec_id % 16),
               base AS (SELECT vec_id, embedding FROM anch WHERE vec_id % 2 = 0),
               freshw AS (SELECT vec_id, embedding FROM anch WHERE vec_id % 2 = 1),
               driftw AS (SELECT vec_id + 1000000 AS vec_id, embedding
                          FROM ok WHERE vec_id % 3 = 1),
               subs AS (SELECT unnest(generate_series(0, 3)) AS s),
               allw AS (SELECT 'b' AS w, vec_id, embedding FROM base
                        UNION ALL SELECT 'f', vec_id, embedding FROM freshw
                        UNION ALL SELECT 'd', vec_id, embedding FROM driftw),
               sdist AS (SELECT a.w, a.vec_id, sub.s,
                                min(${sub("a.embedding", "c.cw_emb")}) AS mind
                         FROM allw a CROSS JOIN subs sub CROSS JOIN cb c
                         GROUP BY a.w, a.vec_id, sub.s),
               units AS (SELECT w, vec_id,
                                CAST(sum(CAST(mind AS DECIMAL(18,6))) * 1000000
                                     AS BIGINT) AS qu
                         FROM sdist GROUP BY w, vec_id),
               avgs AS (SELECT
                 (SELECT CAST(sum(qu) AS BIGINT) // count(*) FROM units WHERE w = 'b') AS base_avg,
                 (SELECT CAST(sum(qu) AS BIGINT) // count(*) FROM units WHERE w = 'f') AS fresh_avg,
                 (SELECT CAST(sum(qu) AS BIGINT) // count(*) FROM units WHERE w = 'd') AS drift_avg,
                 (SELECT count(*) FROM units WHERE w = 'f') AS fresh_n,
                 (SELECT count(*) FROM units WHERE w = 'd') AS drift_n)
               SELECT base_avg AS base_avg_units,
                      fresh_avg AS fresh_avg_units,
                      fresh_avg - base_avg AS fresh_drift_units,
                      CASE WHEN fresh_avg - base_avg > 1000 THEN CAST(1 AS BIGINT)
                           ELSE CAST(0 AS BIGINT) END AS fresh_tripped,
                      fresh_n,
                      drift_avg AS drifted_avg_units,
                      drift_avg - base_avg AS drifted_drift_units,
                      CASE WHEN drift_avg - base_avg > 1000 THEN CAST(1 AS BIGINT)
                           ELSE CAST(0 AS BIGINT) END AS drifted_tripped,
                      drift_n AS drifted_n,
                      fresh_n + drift_n AS cum_n
               FROM avgs""")
    })
  )
}
