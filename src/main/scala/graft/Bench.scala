package graft
import org.apache.spark.sql.SparkSession
import java.io.{File, FileInputStream, FileOutputStream}
import java.util.jar.{JarEntry, JarOutputStream}

/** Benchmark entry point. Prints TWO JSON metric lines — the full
  * per-query map first, then a compact summary a bounded tail-capture
  * window can never clip (the summary line is always LAST):
  *   {"metric":"total","value":N,"unit":"sec","queries":{...},
  *    "load1_start":L,"load1_end":L,"sf":...}
  *   {"metric":"summary","value":N,"unit":"sec","n_queries":N,"failed":N,
  *    "load1_start":L,"load1_end":L,"sf":...}
  *
  * The outer invocation (whatever launched us — sbt runMain, plain java)
  * re-launches itself through `spark-submit` and relays the metric line:
  * sbt-forked JVMs on this VM show ~20x multi-thread scheduler noise
  * (round 1 recorded 399 s for a suite that measures ~44 s under
  * spark-submit), so timings are only trustworthy under spark-submit.
  * The child is marked with GRAFT_BENCH_INNER to stop the recursion.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val submit = new File("/opt/spark/bin/spark-submit")
    if (sys.env.contains("GRAFT_BENCH_INNER") || !submit.exists()) runInner()
    else delegate(submit)
  }

  private def delegate(submit: File): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val jar = appJar()
    val cmd = java.util.Arrays.asList(
      submit.getAbsolutePath,
      "--master", s"local[$cpus]",
      // 8g, not bigger: huge heaps (48g) measured ~3x slower on this VM
      // (fresh-page faulting dominates the small-query times).
      "--driver-memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"),
      "--class", "graft.Bench", jar.getAbsolutePath)
    val pb = new ProcessBuilder(cmd)
    pb.environment().put("GRAFT_BENCH_INNER", "1")
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    // Stream-scan stdout (don't buffer the whole child output) and relay
    // every metric line in order: the full per-query line first, then the
    // compact summary. The compact line must be LAST so the caller's
    // tail-capture window always contains a complete, parseable total.
    var sawMetric = false
    scala.io.Source.fromInputStream(proc.getInputStream).getLines().foreach { line =>
      if (line.startsWith("{\"metric\"")) { sawMetric = true; println(line) }
      else System.err.println(line)
    }
    val rc = proc.waitFor()
    if (!sawMetric) {
      System.err.println(s"[bench] inner spark-submit rc=$rc produced no metric line")
      sys.exit(1)
    }
  }

  /** The jar to hand spark-submit: our own code source if it is already a
    * jar; otherwise (a classes directory, e.g. under sbt) zip it up. The
    * Spark jars themselves come from spark-submit's own classpath.
    */
  private def appJar(): File = {
    val src = new File(
      getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
    if (src.isFile) src
    else {
      val out = File.createTempFile("graft-bench-", ".jar")
      out.deleteOnExit()
      val jos = new JarOutputStream(new FileOutputStream(out))
      def add(f: File, prefix: String): Unit = {
        val name = if (prefix.isEmpty) f.getName else s"$prefix/${f.getName}"
        if (f.isDirectory) f.listFiles().foreach(add(_, name))
        else {
          jos.putNextEntry(new JarEntry(name))
          val in = new FileInputStream(f)
          try {
            val buf = new Array[Byte](65536)
            var n = in.read(buf)
            while (n >= 0) { jos.write(buf, 0, n); n = in.read(buf) }
          } finally in.close()
          jos.closeEntry()
        }
      }
      src.listFiles().foreach(add(_, ""))
      jos.close()
      out
    }
  }

  /** 1-minute /proc/loadavg, -1 if unreadable. */
  private def load1(): Double =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  private def runInner(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // ambient load BEFORE we spin up local[32]: the adjudication signal is
    // co-tenant contention, and sampling after our own run would mostly
    // measure ourselves
    val loadStart = load1()
    val spark = GraftSession.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    GraftSession.installOptimizations(spark)
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, parquet footer cache, shuffle machinery)
    // so the first timed query isn't charged for JVM/session init.
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().count()
    // Best of N runs per query, sampled ROUND-ROBIN (N full passes over the
    // suite, not N back-to-back samples per query): this VM carries
    // time-varying co-tenant load, and back-to-back samples put all of one
    // query's samples inside the same ~10 s spike window — round 3 recorded
    // 3×+ "regressions" on the alphabetically-adjacent q33/q34 that way.
    // Spreading a query's samples minutes apart lets min-of-N actually
    // cancel transient load. A failing query reports -1, never a
    // misleading time-to-failure.
    // 5 passes, not 3: this host's contention windows can outlast a whole
    // 3-pass run (round 4 observed 10×+ inflation across consecutive
    // passes with near-zero guest load); two extra ~35 s passes are cheap
    // insurance that min-of-N sees at least one quiet window.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "5").toInt
    // Optional comma-separated query filter for targeted profiling runs.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (pass <- 1 to repeats; (name, fn) <- queries) {
      // memoized per-dir state (q50's centroids) would otherwise be free
      // on samples 2..n and min-of-n would report a partial query
      graft.queries.Registry.resetTransientCaches()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        samples(name) = dt :: samples(name)
        System.err.println(f"[bench] pass $pass $name%-28s $dt%8.3f s")
      } catch { case e: Throwable =>
        System.err.println(s"[bench] pass $pass $name failed: ${e.getMessage}")
      }
    }
    val results = queries.map { case (name, _) =>
      val ts = samples(name)
      name -> (if (ts.nonEmpty) ts.min else -1.0)
    }.toMap
    // one stderr line per final per-query min: stderr is captured unbounded
    // by the driver, so even if a tail-capture window ever clips the big
    // stdout map again, the per-query numbers survive somewhere durable
    results.toSeq.sortBy(_._1).foreach { case (name, v) =>
      System.err.println(f"[bench] min  $name%-28s $v%8.3f s")
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // host 1-min load averages: this VM's documented failure mode is
    // co-tenant contention storms inflating timings 10-40x, and a bench
    // artifact is only adjudicable if it carries the evidence. start =
    // ambient before our executors spun up; end includes our own load.
    val loadEnd = load1()
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"load1_start":$loadStart,"load1_end":$loadEnd,"sf":"$sfDir"}"""
    // Full line (per-query map) first, durable copy on disk, then a short
    // summary line that a bounded tail-capture window can never clip —
    // round 1/2 drivers recorded parsed:null because the 57-query line's
    // head (including the total) fell outside their capture window.
    println(full)
    try {
      val w = new java.io.PrintWriter("bench.json")
      try w.println(full) finally w.close()
    } catch { case e: Throwable =>
      // keep the run alive, but a stale/missing on-disk copy must be visible
      System.err.println(s"[bench] bench.json write failed: $e")
    }
    // "failed" makes a partial run visible in the ONE line a bounded
    // tail-capture consumer parses: total silently excludes failed
    // queries (recorded as -1 in the per-query map), so a smaller total
    // must not read as a performance win. The compact line is named
    // "summary", NOT "total": two same-named lines with different schemas
    // would make a metric-name-matching consumer parse either shape.
    val failed = results.values.count(_ < 0)
    println(s"""{"metric":"summary","value":$total,"unit":"sec","n_queries":${results.size},"failed":$failed,"load1_start":$loadStart,"load1_end":$loadEnd,"sf":"$sfDir"}""")
    spark.stop()
  }
}
