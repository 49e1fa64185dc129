package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Log-planned scans ([[org.apache.spark.sql.graftshim.LogFileIndex]]):
  * versioned reads plan their parquet scan from the commit log's file
  * list (path + `!bytes=` size) instead of re-listing the filesystem.
  * The index must be RESULT-INVISIBLE — identical rows, schema and
  * partition typing to the listed read — and must honor the
  * FileSourceStrategy contract that partition filters prune inside the
  * index (they are removed from the post-scan Filter). */
class LogFileIndexSpec extends SparkSpec {

  import spark.implicits._

  private def listedRead[A](body: => A): A = {
    spark.conf.set("spark.graft.log.fileIndex", "false")
    try body finally spark.conf.unset("spark.graft.log.fileIndex")
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("log-planned read ≡ listed read across typed layouts, evolution, rename and DV deletes") {
    val t = tmpDir("logidx")
    val base = (1 to 120).map { i =>
      (i.toLong, java.sql.Date.valueOf(f"2024-${i % 4 + 1}%02d-01"),
        s"r${i % 3}", i * 1.0)
    }.toDF("id", "d", "r", "v")
    TimeTravel.init(spark, t, base.filter($"id" <= 60), "d,r")
    TimeTravel.append(spark, t, base.filter($"id" > 60), "d,r")
    TimeTravel.append(spark, t,
      Seq((1000L, java.sql.Date.valueOf("2024-01-01"), "r0", 0.5, "x"))
        .toDF("id", "d", "r", "v", "note"), "d,r",
      evolveSchema = true)
    TimeTravel.renameColumn(spark, t, "v", "val")
    TimeTravel.deleteWhereDv(spark, t, $"id" % 10 === 0, "d,r")
    val tip = TimeTravel.latestVersion(spark, t)
    for (ver <- Seq(2, tip)) {
      val logPlanned = TimeTravel.readVersion(spark, t, ver)
      val listed = listedRead(TimeTravel.readVersion(spark, t, ver))
      assert(logPlanned.schema === listed.schema, s"schema at v$ver")
      assert(rows(logPlanned) === rows(listed), s"rows at v$ver")
    }
    // typed partition values survive the log-planned parse
    assert(TimeTravel.readVersion(spark, t, tip).schema("d").dataType ===
      org.apache.spark.sql.types.DateType)
  }

  test("partition filters prune INSIDE the log-backed index (FileSourceStrategy drops them from the plan)") {
    val t = tmpDir("logidx-prune")
    val base = (1 to 120).map { i =>
      (i.toLong, java.sql.Date.valueOf(f"2024-${i % 4 + 1}%02d-01"),
        s"r${i % 3}", i * 1.0)
    }.toDF("id", "d", "r", "v")
    TimeTravel.init(spark, t, base, "d,r")
    val tip = TimeTravel.readVersion(spark, t, 1)
    val filtered = tip
      .filter($"d" === java.sql.Date.valueOf("2024-02-01") && $"r" === "r1")
    assert(filtered.count() === 10) // 120 rows / 4 dates / 3 r-buckets
    filtered.collect()
    val scan = filtered.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    // 12 (d, r) leaf dirs, one file each: the index must serve exactly 1
    assert(scan.metrics("numFiles").value === 1,
      s"expected the partition filter to prune to one file, " +
        s"read ${scan.metrics("numFiles").value}")
  }
}
