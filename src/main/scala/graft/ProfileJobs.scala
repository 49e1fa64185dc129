package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only attribution profiler: run named queries (staging pass first,
  * then N timed passes) with a listener that prints one line per Spark
  * job — wall time, stage/task counts, and the job's callsite — so a
  * query's seconds can be attributed to its constituent jobs. Mirrors the
  * bench harness session (tuned confs, shuffle.partitions = cpus).
  *
  * Args: sfDir queryName [queryName...]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    GraftSession.installOptimizations(spark)
    spark.sparkContext.setLogLevel("WARN")
    // warm like the bench
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().count()

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stageTasks = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile var collecting = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.map(si =>
          s"${si.name}(${si.numTasks}t)").mkString(" | ")
        jobStart.put(js.jobId, (System.nanoTime(), site))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stageTasks.addAndGet(sc.stageInfo.numTasks)
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val st = jobStart.remove(je.jobId)
        if (st != null && collecting) {
          val dt = (System.nanoTime() - st._1) / 1e9
          lines.add(f"[job] ${je.jobId}%4d ${dt}%8.3f s  ${st._2}")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // per-micro-batch duration breakdown (triggerExecution and its
    // components) — the streaming equivalent of the job lines
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          if (collecting) {
            val p = e.progress
            val d = p.durationMs
            lines.add(s"[batch] ${p.batchId} rows=${p.numInputRows} " +
              s"durationMs=${new java.util.TreeMap(d)}")
          }
      })

    for (n <- names) {
      val q = queries.Registry.byName(n)
      // pass 1: staging + code paths warm (not printed)
      graft.queries.Registry.resetTransientCaches()
      q.run(spark, sfDir).count()
      // pass 2: timed + attributed
      graft.queries.Registry.resetTransientCaches()
      lines.clear()
      collecting = true
      val t0 = System.nanoTime()
      q.run(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      collecting = false
      Thread.sleep(200) // let listener drain
      println(f"== $n total ${dt}%.3f s ==")
      lines.toArray.foreach(println)
    }
    spark.stop()
  }
}
