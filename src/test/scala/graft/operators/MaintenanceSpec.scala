package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Size-aware compaction ([[TimeTravel.compactSmallFiles]] — Delta
  * OPTIMIZE's minFileSize shape): only undersized files consolidate;
  * right-sized files carry over BY NAME, so maintenance never re-copies
  * data that is already laid out right. */
class MaintenanceSpec extends SparkSpec {

  import spark.implicits._

  /** One big file (900 rows) + three small ones (3 rows each) in one
    * partition dir. */
  private def mixedTable(): (String, String) = {
    val t = tmpDir("maint-mixed")
    TimeTravel.init(spark, t, (0 until 900).map(i =>
      (i.toLong, "a", i * 1.0)).toDF("k", "p", "x").repartition(1), "p")
    (0 until 3).foreach { s =>
      val df = (900 + s * 3 until 900 + s * 3 + 3).map(i =>
        (i.toLong, "a", i * 1.0)).toDF("k", "p", "x").repartition(1)
      TimeTravel.append(spark, t, df, "p")
    }
    val big = TimeTravel.filesAt(spark, t, 1).head
    (t, big)
  }

  private def sizeOf(t: String, f: String): Long =
    new java.io.File(s"$t/data/$f").length()

  test("only undersized files consolidate; the big file carries over by name") {
    val (t, big) = mixedTable()
    val prev = TimeTravel.latestVersion(spark, t)
    // threshold between the small files' and the big file's size
    val thr = sizeOf(t, big) / 2
    val v = TimeTravel.compactSmallFiles(spark, t, "p", thr)
    assert(v === prev + 1)
    val files = TimeTravel.filesAt(spark, t, v)
    assert(files.contains(big), "the right-sized file must not rewrite")
    assert(files.size === 2,
      s"three small files fold into one, plus the big: $files")
    assert(TimeTravel.readVersion(spark, t, v)
      .select("k").as[Long].collect().toSet === (0L until 909L).toSet)
    // idempotent: the consolidated file alone does not re-qualify
    assert(TimeTravel.compactSmallFiles(spark, t, "p", thr) === v)
    // pre-compaction version intact
    assert(TimeTravel.readVersion(spark, t, prev).count() === 909)
  }

  test("a lone small file is left alone; minSmallFiles gates the rewrite") {
    val t = tmpDir("maint-lone")
    TimeTravel.init(spark, t, (0 until 500).map(i =>
      (i.toLong, "a", i * 1.0)).toDF("k", "p", "x").repartition(1), "p")
    TimeTravel.append(spark, t,
      Seq((500L, "a", 500.0)).toDF("k", "p", "x").repartition(1), "p")
    val prev = TimeTravel.latestVersion(spark, t)
    // threshold between the two file sizes: exactly ONE file is small,
    // below the minSmallFiles=2 gate — consolidating a single straggler
    // into a single file gains nothing
    val initFile = TimeTravel.filesAt(spark, t, 1).head
    assert(TimeTravel.compactSmallFiles(spark, t, "p",
      minFileBytes = sizeOf(t, initFile)) === prev)
  }

  test("DV-bound files materialize through the size-aware pass whatever their size") {
    val (t, big) = mixedTable()
    TimeTravel.deleteWhereDv(spark, t, col("k") === 10L, "p")
    val thr = sizeOf(t, big) / 2
    // the big file is DV-bound now: it rewrites (PURGE) along with the
    // smalls, and the output carries no binding
    val v = TimeTravel.compactSmallFiles(spark, t, "p", thr)
    val files = TimeTravel.filesAt(spark, t, v)
    assert(!files.contains(big))
    val raw = spark.read.parquet(files.map(f => s"$t/data/$f"): _*)
    assert(raw.count() === 908, "materialized: the deleted row is gone")
    assert(TimeTravel.readVersion(spark, t, v).count() === 908)
  }

  test("per-dir scope: a dir with no undersized files is untouched") {
    val t = tmpDir("maint-scope")
    TimeTravel.init(spark, t, (0 until 400).map(i =>
      (i.toLong, s"p${i % 2}", i * 1.0)).toDF("k", "p", "x")
      .repartition(1), "p")
    // two small stragglers land only in p0
    (0 until 2).foreach { s =>
      TimeTravel.append(spark, t,
        Seq((500L + s, "p0", 0.0)).toDF("k", "p", "x").repartition(1), "p")
    }
    val before = TimeTravel.filesAt(spark, t,
      TimeTravel.latestVersion(spark, t))
    val p1Files = before.filter(_.startsWith("p=p1/"))
    val bigP0 = before.filter(_.startsWith("p=p0/")).minBy(f =>
      -new java.io.File(s"$t/data/$f").length())
    val thr = new java.io.File(s"$t/data/$bigP0").length() / 2
    val v = TimeTravel.compactSmallFiles(spark, t, "p", thr)
    val after = TimeTravel.filesAt(spark, t, v)
    assert(p1Files.forall(after.contains), "p1 had no smalls — untouched")
    assert(after.contains(bigP0))
    assert(TimeTravel.readVersion(spark, t, v).count() === 402)
  }
}
