package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev utility: Spark JOB COUNT per named query
  * (`runMain graft.JobProfile q219_ann_ivf_incremental ...`) — the
  * round-19 optimization loop's feedback instrument. The protocol
  * family's bench cost is job count × scheduling latency (the r18
  * steal adjudication), so "how many jobs does this query schedule"
  * is the number to shrink; this prints it next to wall seconds so
  * the two can be diffed across code versions. Mirrors Bench's session
  * config and per-query hygiene (residue unpersist/clearCache) so the
  * counts match what the bench pays.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    Scratch.install("jobprofile")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
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
    val n = new AtomicInteger()
    // SPARK_GRAFT_JOB_SITES=1 additionally aggregates jobs by action
    // call site — the "which line schedules all these jobs" drill-down
    val bySite = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val sites = sys.env.get("SPARK_GRAFT_JOB_SITES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        n.incrementAndGet()
        if (sites) {
          // the result stage's name is the action's short call site
          val s = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
            .getOrElse("<none>")
          bySite.merge(s, 1, (a, b) => a + b): Unit
        }
        ()
      }
    })
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      n.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(): Unit
      // deterministic drain — a fixed sleep is the listener-bleed flake
      // class IndexJobCountSpec fixed with the same call (r19 ADVICE)
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"JOBPROFILE $name%-40s jobs=${n.get}%5d secs=$secs%8.2f")
      if (sites) {
        import scala.jdk.CollectionConverters._
        bySite.asScala.toSeq.sortBy(-_._2).foreach { case (s, c) =>
          println(f"JOBSITE   $name%-40s $c%5d  $s")
        }
        bySite.clear()
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_stream_"))
        .foreach(t => spark.catalog.dropTempView(t.name): Unit)
    }
    spark.stop()
  }
}
