package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The n-ary Morton interleave ([[BitInterleaveN]]): bit layout,
  * 2-ary compatibility, null propagation, the SQL registration, and
  * codegen ≡ a straight Scala reimplementation. */
class LayoutInterleaveSpec extends SparkSpec {

  import spark.implicits._

  private def morton(bits: Int, dims: Long*): Long = {
    var z = 0L
    val n = dims.size
    for (j <- 0 until n; i <- 0 until bits)
      z |= ((dims(j) >> i) & 1L) << (n * i + j)
    z
  }

  test("n=2 is bit-identical to bit_interleave; n=3 matches the reference layout; nulls propagate; SQL function works") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map(_ => (rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 12).toLong))
    val df = rows.toDF("x", "y", "w")
    // 2-ary compatibility (the codegen path — a real scan)
    val two = df.select(
      LayoutCols.bitInterleave(col("x"), col("y"), 16).as("a"),
      LayoutCols.bitInterleaveN(Seq(col("x"), col("y")), 16).as("b"))
      .collect()
    assert(two.forall(r => r.getLong(0) == r.getLong(1)))
    // 3-ary against the straight Scala reference
    val three = df.select(col("x"), col("y"), col("w"),
      LayoutCols.bitInterleaveN(
        Seq(col("x"), col("y"), col("w")), 12).as("z")).collect()
    assert(three.forall(r => r.getLong(3) ==
      morton(12, r.getLong(0), r.getLong(1), r.getLong(2))))
    // SQL registration, INT literals widen
    GraftFunctions.register(spark)
    assert(spark.sql(
      "SELECT bit_interleave_n(3, 5, 1, 4) AS z").head.getLong(0) ===
      morton(4, 3L, 5L, 1L))
    // nulls propagate (any null dimension nulls the code)
    val withNull = Seq((Some(1L), None: Option[Long], Some(2L)))
      .toDF("x", "y", "w")
      .select(LayoutCols.bitInterleaveN(
        Seq(col("x"), col("y"), col("w")), 8).as("z"))
    assert(withNull.head.isNullAt(0))
    // arity/width guards
    intercept[IllegalArgumentException](
      LayoutCols.bitInterleaveN(Seq(col("x")), 8))
    intercept[IllegalArgumentException](
      LayoutCols.bitInterleaveN(Seq(col("x"), col("y"), col("w")), 22))
  }
}
