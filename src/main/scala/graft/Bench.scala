package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark: runs every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and emits machine-readable JSON.
  *
  * Emission contract (round-2 verdict "What's wrong" #1 — the driver's tail
  * capture truncated the single giant per-query line two rounds running, so
  * no official bench number was ever recorded):
  *  - the FULL per-query JSON line prints first;
  *  - a SHORT, total-only JSON line prints LAST, so any stdout tail window
  *    catches a parseable `{"metric":"total",...}` record;
  *  - the full JSON is ALWAYS written to /root/repo/bench_out.json
  *    (and additionally to SPARK_GRAFT_BENCH_OUT when set).
  *
  * Honest-measurement rules (round-1 verdict "What's wrong" #2/#3):
  *  - output goes to raw stdout (build.sbt sets `run / outputStrategy :=
  *    StdoutOutput`, so sbt does not wrap the line in `[info]`);
  *  - execution uses `queryExecution.toRdd.count()`, which runs the real
  *    physical plan — `df.count()` would let Catalyst collapse pure
  *    projections to a scan-count, timing nothing;
  *  - a throwaway warmup query runs first so the alphabetically-first
  *    timed query does not absorb JVM/codegen/session init (~10s);
  *  - a failing query is reported as a NEGATIVE elapsed time and listed in
  *    "errors" (round-2 advice: a swallowed exception must not be
  *    indistinguishable from a fast pass).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    Scratch.install("bench") // before the session: all temp dirs ride one root
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(): Unit

    // Warmup: one grouped agg + one broadcast join, untimed.
    try { exec("q06_agg_group"); exec("q23_join_broadcast") }
    catch { case _: Throwable => () }

    // SPARK_GRAFT_BENCH_ONLY=q55_dedup_minhash,q102_paragraph_dedup runs a
    // subset — the isolated-measurement loop used when adjudicating
    // per-query regressions (round-5 ledger precedent). Unset = all.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val ok = try { exec(name); true } catch { case _: Throwable => false }
      val secs = (System.nanoTime() - t0) / 1e9
      // Session hygiene, UNTIMED (round-3 verdict "What's wrong" #2: q89
      // measured 20.6 s in-run vs 1.95 s isolated — residue accumulated by
      // the ~60 preceding queries, not the plan). Cache-returning
      // operators (Dedup.clusters) and pipeline table caches otherwise
      // stay resident for the rest of the session; clearing between
      // queries makes each measurement start from a comparable state.
      // The persistent-RDD sweep also drops localCheckpoint block stores
      // (clearCache only sees CacheManager entries) — the round-7 q102
      // in-run-vs-isolated 2× gap was exactly this residue. Everything
      // persisted by a finished query is dead by construction here.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      // Memory-sink temp views from finished streaming queries retain
      // their rows for the SESSION (the round-10 close run measured the
      // alphabetically-late CC family 3-4x slower under two corpus-sized
      // retained sinks) — drop them with the rest of the residue.
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_stream_"))
        .foreach(t => spark.catalog.dropTempView(t.name): Unit)
      System.gc()
      (name, if (ok) secs else -secs)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}"""
    val short =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":${results.count(_._2 < 0)},"sf":"$sfDir"}"""
    // File writes are best-effort and must never block stdout emission
    // (a missing directory would otherwise discard minutes of results).
    def tryWrite(path: String): Unit =
      try Files.writeString(Paths.get(path), full + "\n")
      catch { case e: Exception => System.err.println(s"bench: cannot write $path: $e") }
    tryWrite("bench_out.json")
    if (Files.isDirectory(Paths.get("/root/repo"))) tryWrite("/root/repo/bench_out.json")
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach(tryWrite)
    println(full)
    spark.stop()
    // Short total-only line LAST so a bounded tail capture still parses it.
    println(short)
  }
}
