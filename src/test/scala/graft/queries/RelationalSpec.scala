package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Invariant checks for the relational query surface at sf0.001 (the
  * cross-engine value check is the DuckDB oracle gate; these pin the
  * semantics that the oracle can't see, e.g. plan-independent identities). */
class RelationalSpec extends SparkSpec {

  private def run(q: Q) = q.run(spark, sf)

  test("q01: group counts sum to the filtered row count") {
    val out = run(Relational.q01).collect()
    val totalFromGroups = out.map(_.getAs[Long]("count_order")).sum
    val direct = Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
      .count()
    assert(totalFromGroups === direct)
    // avg consistency: avg_qty * count == sum_qty (both decimal-exact)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("avg_qty") * r.getAs[Long]("count_order")
        - r.getAs[Double]("sum_qty")) < 1e-6)
    }
  }

  test("q03: top-10 is revenue-descending with key tiebreak") {
    val rows = run(Relational.q03).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("q07: row_number never exceeds 3 and is dense from 1 per customer") {
    val rows = run(Relational.q07).collect()
    assert(rows.forall(_.getAs[Int]("rn") <= 3))
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.sameElements(1 to rs.length))
    }
  }

  test("q09: segments partition the active customer set") {
    val rows = run(Relational.q09).collect()
    val byTag = rows.groupBy(_.getAs[String]("segment")).view.mapValues(_.length).toMap
    val allActive = Tables.load(spark, sf, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(byTag.values.sum.toLong === allActive)
    // no custkey in two segments
    assert(rows.map(_.getAs[Long]("o_custkey")).length === rows.map(r =>
      (r.getAs[String]("segment"), r.getAs[Long]("o_custkey"))).distinct.length)
  }

  test("q10: anti join equals set difference") {
    val viaQuery = run(Relational.q10).select("c_custkey").collect()
      .map(_.getLong(0)).toSet
    val cust = Tables.load(spark, sf, "customer").select(col("c_custkey"))
    val recent = Tables.load(spark, sf, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00")))
      .select(col("o_custkey"))
    val direct = cust.exceptAll(recent.distinct()).collect().map(_.getLong(0)).toSet
    assert(viaQuery === direct)
  }

  test("q11: rollup grand-total row counts every joined customer") {
    val rows = run(Relational.q11).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n_customers") ===
      Tables.load(spark, sf, "customer").count())
    // per-region subtotals present (null nation, non-null region)
    assert(rows.count(r => !r.isNullAt(0) && r.isNullAt(1)) === 5)
  }

  test("q12/q13: events timestamps readable (ns->us) and JSON k extraction non-null") {
    val hourly = run(Relational.q12).collect()
    assert(hourly.nonEmpty)
    val js = run(Relational.q13).collect()
    assert(js.forall(r => !r.isNullAt(r.fieldIndex("sum_k"))))
  }

  test("q15: sorted by retail price desc, then key") {
    val rows = run(Relational.q15).collect()
    assert(rows.length === 20)
    val prices = rows.map(_.getAs[Double]("p_retailprice"))
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q17: monthly counts sum to total orders") {
    val rows = run(Relational.q17).collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum ===
      Tables.load(spark, sf, "orders").count())
  }

  test("flagship entry returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
