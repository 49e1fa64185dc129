package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions deployment path registers the same functions
  * GraftSession.prepare does imperatively. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("a session built with graft.GraftExtensions resolves the injected functions") {
    val base = SparkSpec.session // ensure the shared context exists
    // getOrCreate would hand back the existing session (no extensions), so
    // clear the session registry and build a fresh session on the same
    // SparkContext — exactly what a spark.sql.extensions deployment does.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions is the programmatic twin of the static
      // spark.sql.extensions conf (static confs don't apply when reusing
      // an existing SparkContext, as this test does)
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(s ne base)
      val r = s.sql(
        """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |       vec_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n,
          |       list_element(array('x','y'), 2) AS le,
          |       list_element(array('x','y'), 7) AS oob,
          |       scrub_pii('mail a.b@x.io or +1-555-010-7788') AS scrubbed
          |""".stripMargin).collect().head
      assert(r.getDouble(0) === 11.0)
      assert(r.getDouble(1) === 5.0)
      assert(r.getString(2) === "y")
      assert(r.isNullAt(3))
      assert(r.getString(4) === "mail <EMAIL> or <PHONE>")
      // the custom aggregates and sketch builders ride the same injection
      val agg = s.sql(
        """SELECT minhash(x, 4) AS mh, simhash(x) AS sh,
          |       bloom_agg(x, 100, 0.01) AS bf,
          |       count_min_agg(x, 0.01, 0.99, 1) AS cms,
          |       bit_interleave(5, 3, 4) AS z
          |FROM VALUES ('a'), ('b'), ('a') AS t(x)""".stripMargin).collect().head
      assert(agg.getAs[scala.collection.Seq[Long]]("mh").length === 4)
      assert(agg.getAs[Long]("z") === 27L) // x=0101@even, y=0011@odd
      def hex(b: Array[Byte]) = b.map("%02X".format(_)).mkString
      val probe = s.sql(
        s"""SELECT bloom_might_contain(X'${hex(agg.getAs[Array[Byte]]("bf"))}', 'a') AS hit,
           |       bloom_might_contain(X'${hex(agg.getAs[Array[Byte]]("bf"))}', 'zz') AS miss,
           |       count_min_estimate(X'${hex(agg.getAs[Array[Byte]]("cms"))}', 'a') AS est
           |""".stripMargin).collect().head
      assert(probe.getBoolean(0))
      assert(!probe.getBoolean(1))
      assert(probe.getLong(2) === 2L)
      // the graft.<name> resolution rule rides the same injection:
      // plain spark.sql resolves a registered versioned table — and a
      // DURABLE binding written by another session resolves from the
      // catalog file with no registerTable call on THIS session
      val t = java.nio.file.Files
        .createTempDirectory("ext-resolve").toString
      val cat = java.nio.file.Files
        .createTempDirectory("ext-cat").toString + "/catalog"
      base.conf.set("spark.graft.catalog.path", cat)
      s.conf.set("spark.graft.catalog.path", cat)
      import s.implicits._
      graft.operators.TimeTravel.init(s, t,
        Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "p", "x"), "p")
      GraftSession.registerTable(base, "ext_resolved", t, durable = true)
      assert(s.sql("SELECT count(*) AS n FROM graft.ext_resolved")
        .head.getLong(0) === 2L)
      // plain-SQL time travel on the name rides the same rule
      graft.operators.TimeTravel.append(s, t,
        Seq((3L, "a", 3.0)).toDF("k", "p", "x"), "p")
      assert(s.sql("SELECT count(*) AS n FROM graft.ext_resolved")
        .head.getLong(0) === 3L)
      assert(s.sql(
        "SELECT count(*) AS n FROM graft.ext_resolved VERSION AS OF 1")
        .head.getLong(0) === 2L)
      base.conf.unset("spark.graft.catalog.path")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
