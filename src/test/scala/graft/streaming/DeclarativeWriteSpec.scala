package graft.streaming

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TimeTravel

/** Declarative batch write
  * (`df.write.format("graft-versioned")` →
  * [[VersionedTableSourceProvider]]'s `CreatableRelationProvider`):
  * SaveMode semantics, creation vs append, full overwrite with intact
  * history, idempotent txn markers, and partCol inference from the
  * existing layout. */
class DeclarativeWriteSpec extends SparkSpec {

  import spark.implicits._

  private def df(ks: Range) =
    ks.map(i => (i.toLong, s"p${i % 2}", i * 1.0)).toDF("k", "p", "x")
      .repartition(1)

  private def write(t: String, data: org.apache.spark.sql.DataFrame,
      mode: SaveMode, opts: (String, String)*): Unit = {
    val w = data.write.format("graft-versioned").mode(mode)
      .option("path", t)
    opts.foreach { case (k, v) => w.option(k, v) }
    w.save()
  }

  test("append creates then appends; partCol comes from the layout afterwards") {
    val t = tmpDir("declw")
    write(t, df(1 to 10), SaveMode.Append, "partCol" -> "p")
    assert(TimeTravel.latestVersion(spark, t) === 1)
    // no partCol option this time: the log's layout answers it
    write(t, df(11 to 15), SaveMode.Append)
    assert(TimeTravel.readVersion(spark, t, 2).count() === 15)
    // a CREATE without partCol is refused with the reason
    val e = intercept[IllegalArgumentException](
      write(tmpDir("declw-nopart"), df(1 to 3), SaveMode.Append))
    assert(e.getMessage.contains("partCol"))
  }

  test("overwrite replaces the tip in one commit; history stays readable") {
    val t = tmpDir("declw-ow")
    write(t, df(1 to 20), SaveMode.Append, "partCol" -> "p")
    write(t, df(100 to 102), SaveMode.Overwrite)
    assert(TimeTravel.readVersion(spark, t, 2).count() === 3)
    assert(TimeTravel.readVersion(spark, t, 1).count() === 20)
    // the overwrite is a REWRITE for feed purposes: refused loudly
    val e = intercept[IllegalArgumentException](
      TimeTravel.readAppendsSince(spark, t, 1))
    assert(e.getMessage.contains("cannot represent"))
  }

  test("ErrorIfExists and Ignore follow SaveMode semantics") {
    val t = tmpDir("declw-modes")
    write(t, df(1 to 5), SaveMode.ErrorIfExists, "partCol" -> "p")
    intercept[IllegalStateException](
      write(t, df(6 to 9), SaveMode.ErrorIfExists))
    write(t, df(6 to 9), SaveMode.Ignore) // no-op, not an error
    assert(TimeTravel.latestVersion(spark, t) === 1)
    assert(TimeTravel.readVersion(spark, t, 1).count() === 5)
  }

  test("txnAppId/txnVersion make re-delivered batches a no-op") {
    val t = tmpDir("declw-txn")
    write(t, df(1 to 10), SaveMode.Append, "partCol" -> "p",
      "txnAppId" -> "job42", "txnVersion" -> "1")
    write(t, df(11 to 20), SaveMode.Append,
      "txnAppId" -> "job42", "txnVersion" -> "2")
    val v = TimeTravel.latestVersion(spark, t)
    // the retry of batch 2 lands NOTHING
    write(t, df(11 to 20), SaveMode.Append,
      "txnAppId" -> "job42", "txnVersion" -> "2")
    assert(TimeTravel.latestVersion(spark, t) === v)
    assert(TimeTravel.readVersion(spark, t, v).count() === 20)
    // a DIFFERENT app's same version number is not deduped
    write(t, df(21 to 25), SaveMode.Append,
      "txnAppId" -> "other", "txnVersion" -> "2")
    assert(TimeTravel.latestVersion(spark, t) === v + 1)
    // half a pair is refused
    val e = intercept[IllegalArgumentException](
      write(t, df(1 to 2), SaveMode.Append, "txnAppId" -> "job42"))
    assert(e.getMessage.contains("txnAppId and txnVersion"))
  }

  test("schema evolution is opt-in on the declarative path") {
    val t = tmpDir("declw-evolve")
    write(t, df(1 to 5), SaveMode.Append, "partCol" -> "p")
    val widened = (6 to 8).map(i =>
      (i.toLong, s"p${i % 2}", i * 1.0, s"tag$i"))
      .toDF("k", "p", "x", "tag").repartition(1)
    intercept[IllegalArgumentException](
      write(t, widened, SaveMode.Append))
    write(t, widened, SaveMode.Append, "evolveSchema" -> "true")
    val tip = TimeTravel.readVersion(spark, t,
      TimeTravel.latestVersion(spark, t))
    assert(tip.count() === 8)
    assert(tip.filter(col("tag").isNull).count() === 5)
  }
}
