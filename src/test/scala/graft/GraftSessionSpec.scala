package graft

/** End-to-end SQL surface: after prepare(), everything is reachable from
  * plain spark.sql — tables, graft functions, dialect shims. */
class GraftSessionSpec extends SparkSpec {

  test("prepare exposes tables + vector functions + list_element in SQL") {
    GraftSession.prepare(spark, sf)
    // self-cosine is exactly 1.0 through the native expression
    val cos = spark.sql(
      "SELECT vec_cosine(embedding, embedding) AS c FROM embeddings LIMIT 5")
      .collect().map(_.getDouble(0))
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-12))
    // norm/dot consistency: vec_dot(x,x) == vec_norm(x)^2
    val nd = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS d, vec_norm(embedding) AS n FROM embeddings LIMIT 5")
      .collect()
    nd.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1) * r.getDouble(1)) < 1e-9))
    // list_element: 1-based, NULL out of range — on a real table column
    spark.sql("SELECT list_element(array('a','b'), 1) AS x1, list_element(array('a','b'), 9) AS x9")
      .collect().headOption.foreach { r =>
        assert(r.getString(0) === "a")
        assert(r.isNullAt(1))
      }
    // a join across registered views works end-to-end in SQL
    val n = spark.sql(
      """SELECT r_name, COUNT(*) AS n FROM nation JOIN region
         ON n_regionkey = r_regionkey GROUP BY r_name""").count()
    assert(n === 5)
    // custom aggregates from plain SQL: simhash + minhash over tokens
    val agg = spark.sql(
      """SELECT doc_id, simhash(tok) AS sh, minhash(tok, 8) AS mh
         FROM (SELECT doc_id, explode(split(trim(text), '\\s+')) AS tok
               FROM documents)
         GROUP BY doc_id LIMIT 3""").collect()
    assert(agg.length === 3)
    agg.foreach { r =>
      assert(!r.isNullAt(1))
      assert(r.getSeq[Long](2).length === 8)
    }
    // BIGINT k literal accepted; wrong argument type fails at ANALYSIS,
    // not as a runtime ClassCastException on executors
    assert(spark.sql(
      """SELECT minhash(lang, CAST(4 AS BIGINT)) AS m FROM documents""")
      .collect().head.getSeq[Long](0).length === 4)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash(doc_id) FROM documents").collect()
    }
    // topk from plain SQL: highest-score ids, rank-ordered, literal k
    val tk = spark.sql(
      """SELECT topk(CAST(n_chars AS DOUBLE), doc_id, 3) AS t FROM documents""")
      .collect().head.getSeq[Long](0)
    assert(tk.length === 3)
    val byLen = spark.sql(
      """SELECT doc_id FROM documents ORDER BY n_chars DESC, doc_id LIMIT 3""")
      .collect().map(_.getLong(0)).toSeq
    assert(tk === byLen)
  }

  test("describe exposes column names and types (M1/M2)") {
    val d = GraftSession.describe(Tables.load(spark, sf, "embeddings"))
    assert(d.map(_._1) === Seq("vec_id", "embedding", "label"))
    assert(d.toMap.apply("embedding") === "array<float>")
  }

  test("dialectRewrite: bare VARCHAR becomes STRING, VARCHAR(n) untouched") {
    import graft.etl.SqlTransform.dialectRewrite
    assert(dialectRewrite("CAST(x AS VARCHAR)") === "CAST(x AS STRING)")
    assert(dialectRewrite("CAST(x AS varchar)") === "CAST(x AS STRING)")
    assert(dialectRewrite("CAST(x AS VARCHAR(10))") === "CAST(x AS VARCHAR(10))")
    assert(dialectRewrite("myvarchar_col") === "myvarchar_col")
    // lexer-aware: literals, quoted identifiers, and comments pass verbatim
    assert(dialectRewrite("WHERE note = 'VARCHAR'") === "WHERE note = 'VARCHAR'")
    assert(dialectRewrite("SELECT 'it''s VARCHAR' AS v") === "SELECT 'it''s VARCHAR' AS v")
    assert(dialectRewrite("SELECT \"VARCHAR\" FROM t") === "SELECT \"VARCHAR\" FROM t")
    assert(dialectRewrite("-- a VARCHAR note\nCAST(x AS VARCHAR)") ===
      "-- a VARCHAR note\nCAST(x AS STRING)")
    assert(dialectRewrite("/* VARCHAR */ CAST(x AS VARCHAR)") ===
      "/* VARCHAR */ CAST(x AS STRING)")
  }
}
