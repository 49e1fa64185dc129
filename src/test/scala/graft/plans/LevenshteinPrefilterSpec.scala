package graft.plans

import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkSpec}

/** The bounded-edit-distance prefilter rule: soundness (identical
  * results), plan shape (companion conjunct present), idempotence, and
  * the join-condition path. */
class LevenshteinPrefilterSpec extends SparkSpec {

  import spark.implicits._

  private def optimized(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan

  test("filter gains the length-bound conjunct; results are unchanged") {
    GraftSession.installOptimizations(spark)
    // parquet-backed source: a literal LocalRelation would be folded away
    // by ConvertToLocalRelation before the plan is observable
    val docs = graft.Tables.load(spark, sf, "documents")
    val probe = docs.select(col("text")).as[String].head()
    val q = docs.filter(levenshtein(col("text"), lit(probe)) <= 10)
      .select(col("doc_id"))
    val plan = optimized(q).toString
    assert(plan.contains("abs(") && plan.contains("length("), plan)
    // soundness: identical rows to a reference DP edit distance
    def lev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val raw = docs.collect()
      .filter(r => lev(r.getAs[String]("text"), probe) <= 10)
      .map(_.getAs[Long]("doc_id")).sorted
    assert(q.as[Long].collect().sorted.toSeq === raw.toSeq)
  }

  test("rule is idempotent and rewrites join conditions too") {
    val a = Seq((1L, "abc")).toDF("id", "sa")
    val b = Seq((2L, "abd"), (3L, "abcdefgh")).toDF("id2", "sb")
    val joined = a.join(b, levenshtein(col("sa"), col("sb")) <= 1)
    val once = LevenshteinPrefilter(joined.queryExecution.analyzed)
    val twice = LevenshteinPrefilter(once)
    assert(once.toString === twice.toString) // no conjunct stacking
    assert(once.toString.contains("abs"), once.toString)
    GraftSession.installOptimizations(spark)
    assert(joined.select(col("sb")).as[String].collect().toSeq === Seq("abd"))
  }

  test("non-deterministic levenshtein arguments are NOT rewritten") {
    // duplicating a rand()-bearing argument into the companion bound
    // would re-evaluate it independently and can reject surviving rows;
    // the rule must leave such predicates alone
    val df = Seq("abc").toDF("w")
    val nd = df.filter(
      levenshtein(concat(col("w"), (rand() * 0).cast("string")), lit("abd")) <= 2)
    val before = nd.queryExecution.analyzed
    assert(LevenshteinPrefilter(before) fastEquals before)
    // a deterministic sibling in the same shape still rewrites
    val det = df.filter(
      levenshtein(concat(col("w"), lit("")), lit("abd")) <= 2)
    assert(LevenshteinPrefilter(det.queryExecution.analyzed)
      .toString.contains("abs"))
  }

  test("strict < and non-levenshtein predicates: only the former rewritten") {
    val df = Seq("x").toDF("w")
    val lt = df.filter(levenshtein(col("w"), lit("y")) < 3)
    assert(LevenshteinPrefilter(lt.queryExecution.analyzed)
      .toString.contains("abs"))
    val untouched = df.filter(length(col("w")) <= 3)
    val before = untouched.queryExecution.analyzed
    assert(LevenshteinPrefilter(before) fastEquals before)
  }
}
