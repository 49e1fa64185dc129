package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling entry: time named queries (twice: cold + warm) with a
  * count() action. Args: sfDir query names... (or 'all'). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.drop(1).isEmpty || args(1) == "all") queries.Registry.all.map(_.name)
      else args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val q = queries.Registry.byName(n)
      for (round <- 1 to 2) {
        val t0 = System.nanoTime()
        val cnt = q.run(spark, sfDir).count()
        println(f"[profile] $n round$round: ${(System.nanoTime() - t0) / 1e9}%.2fs ($cnt rows)")
      }
    }
    spark.stop()
  }
}
