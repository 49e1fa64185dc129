package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-Min sketch contract: never under-estimates, ε·N-bounded above,
  * merges across partitions, both key types, SQL surface. */
class CountMinSpec extends SparkSpec {

  test("estimates are never below exact counts and within the ε·N band") {
    import spark.implicits._
    // skewed corpus: key k occurs k times, k = 1..200 (N = 20100)
    val rows = (1 to 200).flatMap(k => Seq.fill(k)(s"key-$k"))
    val df = rows.toDF("k").repartition(8)
    val n = rows.size
    val eps = 0.001
    val bytes = df.agg(CountMinCols.countMinAgg(col("k"), eps, 0.99, 7))
      .head().getAs[Array[Byte]](0)
    val checked = df.groupBy(col("k")).agg(count(lit(1)).as("exact"))
      .select(col("k"), col("exact"),
        CountMinCols.estimate(lit(bytes), col("k")).as("est"))
      .collect()
    assert(checked.length === 200)
    for (r <- checked) {
      val (exact, est) = (r.getAs[Long]("exact"), r.getAs[Long]("est"))
      assert(est >= exact, s"${r.getString(0)}: CMS under-estimated $est < $exact")
      assert(est <= exact + math.ceil(3 * eps * n).toLong,
        s"${r.getString(0)}: $est too far above $exact")
    }
  }

  test("BIGINT keys, null skip, and the SQL surface") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq[java.lang.Long](1L, 1L, 1L, 2L, null).toDF("k")
    df.createOrReplaceTempView("cms_in")
    val bytes = spark.sql(
      "SELECT count_min_agg(k, 0.01, 0.99, 1) FROM cms_in")
      .head().getAs[Array[Byte]](0)
    val est = Seq(1L, 2L, 99L).toDF("k")
      .select(CountMinCols.estimate(lit(bytes), col("k")))
      .collect().map(_.getLong(0))
    assert(est(0) === 3L)
    assert(est(1) === 1L)
    assert(est(2) <= 1L) // tiny sketch may collide, but null was skipped
  }
}
