package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Td

/** Scale-pattern operators: shapes that exist specifically because of the
  * 100 TB design constraint.
  */
object ScaleQueries {

  val specs: Seq[QuerySpec] = Seq(

    // ---- heavy-hitter detection (mergeable Misra-Gries aggregate) -------
    // The skew toolkit's missing sensor: before choosing a salt width or
    // a broadcast (q65/q90), find the keys that are actually hot — in one
    // pass, k counters per partition, a k-row exchange per group, never a
    // full vocabulary shuffle (functions/HeavyHittersAgg). The parity
    // query runs in the EXACT regime (distinct langs per source << k=64,
    // so no eviction ever fires and every weight is the true count —
    // the only regime with a deterministic oracle; the approximation
    // guarantee n/(k+1) is HeavyHittersSpec's job). inline() explodes the
    // sorted (term, weight) structs into comparable rows.
    QuerySpec("q105_heavy_hitters", { (s, dir) =>
      Td.load(s, dir, "documents")
        .where(col("lang").isNotNull)
        .groupBy("source")
        .agg(expr("heavy_hitters(lang, 64)").as("hh"))
        .selectExpr("source", "inline(hh)")
        .selectExpr("source", "term AS lang", "weight AS n_docs")
        .orderBy("source", "lang")
    }, Some("""SELECT source, lang, count(*) AS n_docs
               FROM documents WHERE lang IS NOT NULL
               GROUP BY source, lang
               ORDER BY source, lang""")),

    // ---- salted two-phase aggregation (hot-key skew pattern) ------------
    // A 3-value group key at 100 TB means 3 reducers own the whole
    // shuffle. Salting fans each hot key across 16 sub-keys (deterministic
    // salt — l_orderkey % 16, NOT rand(): rerunnable and oracle-safe),
    // aggregates partially per (key, salt) on 48 reducers, then merges the
    // 48 partials. Decimal sums survive both phases exactly, so the result
    // is identical to the direct group-by (which is what the oracle runs).
    // Spark's map-side partial aggregation already de-skews pure
    // count/sum aggs — the salt phase matters for skewed HIGH-CARDINALITY
    // payloads (collect_set, exact distinct, large state) and is the
    // documented pattern for them.
    QuerySpec("q65_agg_salted",
      (s, d) => Td.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"), (col("l_orderkey") % 16).as("salt"))
        .agg(
          count(lit(1)).as("cnt_part"),
          sum(col("l_quantity").cast(DecimalType(18, 4))).as("qty_part"))
        .groupBy("l_returnflag")
        .agg(
          sum(col("cnt_part")).as("cnt"),
          sum(col("qty_part")).cast(DoubleType).as("sum_qty"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS cnt,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- feature engineering over embeddings (pure per-row HOFs) --------
    // The standard pre-training vector prep — mean-center, L2-normalize,
    // clip — as codegen'd higher-order functions: zero shuffle, zero UDF,
    // scan-parallel at any scale. All arithmetic routes through DOUBLE
    // with sequential folds (dsum) so both engines produce identical
    // bits; outputs are summarized (norm before/after, clipped-dim count)
    // to keep the compared relation narrow.
    QuerySpec("q95_feature_engineering", { (s, dir) =>
      val d = SparkSql
      Td.load(s, dir, "embeddings")
        .selectExpr("vec_id", "embedding",
          s"${d.dsum(d.map("embedding", "x", "CAST(x AS DOUBLE)"))} / CAST(${d.len("embedding")} AS DOUBLE) AS mu")
        .selectExpr("vec_id", "mu",
          s"${d.map("embedding", "x", "CAST(x AS DOUBLE) - mu")} AS centered")
        .selectExpr("vec_id", "mu", "centered",
          s"sqrt(${d.dsum(d.map("centered", "x", "x * x"))}) AS nrm")
        .selectExpr("vec_id", "round(mu, 9) AS mu", "round(nrm, 9) AS nrm",
          s"${d.len(s"${d.filterBy("centered", "x", "abs(x / nrm) > 0.2")}")} AS n_clipped",
          s"round(${d.dsum(d.map(d.map("centered", "x", "greatest(least(x / nrm, 0.2), -0.2)"), "x", "x * x"))}, 9) AS clipped_energy")
        .orderBy("vec_id")
    }, {
      val d = DuckSql
      Some(s"""WITH c0 AS (
                 SELECT vec_id, embedding,
                        ${d.dsum(d.map("embedding", "x", "CAST(x AS DOUBLE)"))} / CAST(${d.len("embedding")} AS DOUBLE) AS mu
                 FROM embeddings),
               c1 AS (
                 SELECT vec_id, mu,
                        ${d.map("embedding", "x", "CAST(x AS DOUBLE) - mu")} AS centered
                 FROM c0),
               c2 AS (
                 SELECT vec_id, mu, centered,
                        sqrt(${d.dsum(d.map("centered", "x", "x * x"))}) AS nrm
                 FROM c1)
               SELECT vec_id, round(mu, 9) AS mu, round(nrm, 9) AS nrm,
                      ${d.len(s"${d.filterBy("centered", "x", "abs(x / nrm) > 0.2")}")} AS n_clipped,
                      round(${d.dsum(d.map(d.map("centered", "x", "greatest(least(x / nrm, 0.2), -0.2)"), "x", "x * x"))}, 9) AS clipped_energy
               FROM c2 ORDER BY vec_id""")
    }),

    // ---- column profiling: one-pass per-column stats --------------------
    // Every per-column aggregate rides ONE scan (single global hash agg
    // with partials); the unpivot to (column, metric) rows happens on the
    // aggregated scalars driver-side. The oracle is the per-column
    // UNION ALL spelling of the same stats.
    QuerySpec("q97_profile", { (s, dir) =>
      graft.operators.Profiler.profile(
          Td.load(s, dir, "lineitem"),
          Seq("l_returnflag", "l_quantity", "l_shipdate", "l_orderkey"))
        .orderBy("column")
    }, {
      def one(c: String, dtype: String) =
        s"""SELECT '$c' AS "column", '$dtype' AS dtype, count(*) AS n_rows,
                   count(*) - count($c) AS n_nulls,
                   count(DISTINCT $c) AS n_distinct,
                   CAST(min($c) AS VARCHAR) AS min_value,
                   CAST(max($c) AS VARCHAR) AS max_value
            FROM lineitem"""
      Some(Seq(
        one("l_returnflag", "string"), one("l_quantity", "double"),
        one("l_shipdate", "timestamp_ntz"), one("l_orderkey", "bigint"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\""))
    }),

    // ---- sorted array aggregation ---------------------------------------
    // collect_list is unordered by contract; sort_array pins it, making
    // grouped array construction deterministic and oracle-comparable —
    // the pattern for building per-key example lists / token id arrays.
    QuerySpec("q96_array_agg", { (s, dir) =>
      Td.load(s, dir, "documents")
        .where("doc_id < 50")
        .groupBy("lang")
        .agg(
          concat_ws(",", sort_array(collect_list(col("doc_id")))).as("doc_ids"),
          sort_array(collect_list(col("n_chars"))).getItem(0).as("min_chars"))
        .orderBy("lang")
    },
      Some("""SELECT lang,
                     array_to_string(list_sort(list(doc_id)), ',') AS doc_ids,
                     list_sort(list(n_chars))[1] AS min_chars
              FROM documents WHERE doc_id < 50
              GROUP BY lang ORDER BY lang""")),

    // ---- int8 embedding quantization ------------------------------------
    // 100 TB of float32 embeddings becomes 25 TB of int8 + one scale per
    // vector; pure per-row HOFs, no shuffle. Rounding is floor(x+0.5)
    // (round-half-toward-+inf — identical in both engines; round() would
    // hit the cross-engine tie bug, q05). checksum pins the quantized
    // values, max_abs_err pins reconstruction quality (≤ scale/2).
    QuerySpec("q68_embed_quantize", { (s, dir) =>
      val d = SparkSql
      Td.load(s, dir, "embeddings")
        .selectExpr("vec_id", "embedding",
          s"${d.amax(d.map("embedding", "x", "abs(CAST(x AS DOUBLE))"))} / 127.0 AS scale")
        .selectExpr("vec_id", "embedding", "scale",
          s"${d.map("embedding", "x", "CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)")} AS q")
        .selectExpr("vec_id", "round(scale, 9) AS scale",
          s"${d.isum("q")} AS checksum",
          s"${d.amax("zip_with(embedding, q, (x, qi) -> abs(CAST(x AS DOUBLE) - CAST(qi AS DOUBLE) * scale))")} AS raw_err")
        .selectExpr("vec_id", "scale", "checksum", "round(raw_err, 9) AS max_abs_err")
        .orderBy("vec_id")
    }, {
      val d = DuckSql
      Some(s"""WITH s0 AS (
                 SELECT vec_id, embedding,
                        ${d.amax(d.map("embedding", "x", "abs(CAST(x AS DOUBLE))"))} / CAST(127.0 AS DOUBLE) AS scale
                 FROM embeddings),
               s1 AS (
                 SELECT vec_id, embedding, scale,
                        ${d.map("embedding", "x", "CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)")} AS q
                 FROM s0),
               s2 AS (
                 SELECT vec_id, round(scale, 9) AS scale, ${d.isum("q")} AS checksum,
                        ${d.amax("list_transform(list_zip(embedding, q), p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * scale))")} AS raw_err
                 FROM s1)
               SELECT vec_id, scale, checksum, round(raw_err, 9) AS max_abs_err
               FROM s2 ORDER BY vec_id""")
    }),

    // ---- sketch distinct (HyperLogLog++) --------------------------------
    // Exact countDistinct plans an Expand + distinct shuffle of the raw
    // keys — at 100 TB that is the whole key set over the wire. The HLL++
    // sketch is constant-size and mergeable (the only distinct that
    // scales); like q62, the oracle pins the exact value plus the
    // sketch's documented error envelope.
    QuerySpec("q70_approx_distinct",
      (s, d) => Td.load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("exact_distinct"),
          (abs(approx_count_distinct(col("l_partkey")).cast(DoubleType) -
            countDistinct(col("l_partkey")).cast(DoubleType)) /
            countDistinct(col("l_partkey")).cast(DoubleType) < 0.05)
            .as("sketch_within_5pct"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                     count(DISTINCT l_partkey) AS exact_distinct,
                     true AS sketch_within_5pct
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- CDC upsert (MERGE pattern without Delta) -----------------------
    // Classic medallion change-capture: a small update/insert batch merged
    // into the base table via FULL OUTER + coalesce. Scale shape: Spark
    // cannot broadcast a full-outer join (verified: this plans as a
    // SortMergeJoin), so the base DOES shuffle on the key — at 100 TB
    // keep the base key-bucketed (BucketedJoinSpec) so only the small CDC
    // batch moves, or split the merge into a broadcast left-anti insert
    // plus a broadcast left-semi update when full-outer isn't required.
    QuerySpec("q69_upsert", { (s, dir) =>
      val base = Td.load(s, dir, "customer")
      val changes = base.filter(col("c_custkey") < 100)
        .selectExpr("c_custkey", "c_name",
          "round(c_acctbal + 100.0, 2) AS u_acctbal")
        .unionAll(base.filter(col("c_custkey") < 50)
          .selectExpr("c_custkey + 1000000 AS c_custkey",
            "concat('NEW ', c_name) AS c_name", "CAST(0.0 AS DOUBLE) AS u_acctbal"))
      base.withColumnRenamed("c_acctbal", "b_acctbal")
        .withColumnRenamed("c_name", "b_name")
        .join(broadcast(changes.withColumnRenamed("c_name", "u_name")),
          Seq("c_custkey"), "full_outer")
        .selectExpr("c_custkey",
          "coalesce(u_name, b_name) AS c_name",
          "coalesce(u_acctbal, b_acctbal) AS c_acctbal",
          """CASE WHEN u_acctbal IS NULL THEN 'unchanged'
                  WHEN b_acctbal IS NULL THEN 'inserted'
                  ELSE 'updated' END AS change_type""")
        .orderBy("c_custkey")
    },
      Some("""WITH changes AS (
                SELECT c_custkey, c_name AS u_name,
                       round(c_acctbal + CAST(100.0 AS DOUBLE), 2) AS u_acctbal
                FROM customer WHERE c_custkey < 100
                UNION ALL
                SELECT c_custkey + 1000000, concat('NEW ', c_name), CAST(0.0 AS DOUBLE)
                FROM customer WHERE c_custkey < 50)
              SELECT coalesce(b.c_custkey, c.c_custkey) AS c_custkey,
                     coalesce(c.u_name, b.c_name) AS c_name,
                     coalesce(c.u_acctbal, b.c_acctbal) AS c_acctbal,
                     CASE WHEN c.u_acctbal IS NULL THEN 'unchanged'
                          WHEN b.c_acctbal IS NULL THEN 'inserted'
                          ELSE 'updated' END AS change_type
              FROM customer b FULL OUTER JOIN changes c ON b.c_custkey = c.c_custkey
              ORDER BY c_custkey""")),

    // ---- JSONL ingestion with corrupt-record accounting -----------------
    // Documents serialized to JSON-Lines (every 97th line deliberately
    // broken mid-object — the crawl-dump reality), re-ingested under an
    // EXPLICIT schema (no inference pass) in PERMISSIVE mode: broken
    // lines land with NULL fields and the raw text preserved in the
    // corrupt column, so quarantine accounting is a plain filter. The
    // oracle re-derives both populations from doc_id arithmetic — a
    // dropped line, a killed read, or a mis-parsed good line all break
    // the hash.
    QuerySpec("q150_jsonl_ingest", { (s, dir) =>
      import org.apache.spark.sql.types._
      val root = graft.Scratch.dir("graft-q150").toString
      Td.load(s, dir, "documents")
        .selectExpr(
          """CASE WHEN doc_id % 97 = 0
               THEN concat('{"doc_id": ', doc_id, ', BROKEN')
               ELSE to_json(struct(doc_id, lang, source, n_chars))
             END AS value""")
        .coalesce(1).write.text(s"$root/in")
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("source", StringType), StructField("n_chars", LongType)))
      graft.sources.JsonLines.read(s, s"$root/in", schema)
        .selectExpr(
          "CASE WHEN _corrupt_record IS NOT NULL THEN '__corrupt' ELSE lang END AS bucket",
          "n_chars")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_lines"),
          coalesce(sum("n_chars"), lit(0L)).as("sum_chars"))
        .orderBy("bucket")
    },
      Some("""SELECT CASE WHEN doc_id % 97 = 0 THEN '__corrupt' ELSE lang END AS bucket,
                     count(*) AS n_lines,
                     CAST(coalesce(sum(CASE WHEN doc_id % 97 <> 0 THEN n_chars END), 0) AS BIGINT) AS sum_chars
              FROM documents GROUP BY 1 ORDER BY bucket"""))
  )
}
