package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** [[SortedIntersectSize]]: merge-walk |A ∩ B| must agree with the built-in
  * `size(array_intersect(...))` on every sorted-distinct input, in both the
  * codegen and interpreted eval paths. */
class SetExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private def sortedDistinct(xs: Seq[String]): Seq[String] = xs.distinct.sorted

  test("matches size(array_intersect) on randomized sorted-distinct arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      val a = sortedDistinct(Seq.fill(rnd.nextInt(60))(s"w${rnd.nextInt(80)}"))
      val b = sortedDistinct(Seq.fill(rnd.nextInt(60))(s"w${rnd.nextInt(80)}"))
      (i, a, b)
    }
    val df = rows.toDF("id", "a", "b")
      .select($"id",
        SetCols.sortedIntersectSize($"a", $"b").as("merge"),
        size(array_intersect($"a", $"b")).cast(LongType).as("builtin"))
    assert(df.filter($"merge" =!= $"builtin").count() === 0)
    // sanity: the corpus actually exercises non-trivial intersections
    assert(df.filter($"merge" > 0).count() > 0)
  }

  test("edge cases: empty, disjoint, identical, subset") {
    val cases = Seq(
      (Seq.empty[String], Seq.empty[String], 0L),
      (Seq("a", "b"), Seq.empty[String], 0L),
      (Seq("a", "b"), Seq("c", "d"), 0L),
      (Seq("a", "b", "c"), Seq("a", "b", "c"), 3L),
      (Seq("a", "c"), Seq("a", "b", "c", "d"), 2L))
    cases.zipWithIndex.foreach { case ((a, b, want), i) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(SetCols.sortedIntersectSize($"a", $"b")).head().getLong(0)
      assert(got === want, s"case $i: $a ∩ $b")
    }
  }

  test("interpreted eval path agrees (nullSafeEval, no codegen)") {
    // force the interpreted path by evaluating the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: Seq[String]) = Literal.create(
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    val e = SortedIntersectSize(arr(Seq("a", "c", "e")), arr(Seq("b", "c", "d", "e")))
    assert(e.eval(null) === 2L)
  }

  test("registered SQL function is callable") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT sorted_intersect_size(array('a','b','c'), array('b','c','d')) AS n")
      .head().getLong(0)
    assert(n === 2L)
  }
}
