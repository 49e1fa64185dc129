package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ElementAt, Expression}

/** The user-editable SQL transformation layer (SURVEY.md §2.3/§2.4; the
  * reference's extension model, README.md:77-98: users reshape output by
  * editing `schema.sql`, executed over the `climbs` table).
  *
  * Spark SQL is a strict superset of the dialect subset those schema files
  * use (qualified struct access, CAST, COALESCE, IN, IS NOT NULL, LIMIT) —
  * the one gap is DuckDB's `list_element(arr, i)`, registered here as a
  * native alias of Catalyst's ElementAt: both are 1-based and, with
  * failOnError=false, NULL out of range (verified semantics, SURVEY §2 P3).
  * Being a plain Catalyst expression it stays inside whole-stage codegen —
  * no UDF penalty.
  */
object SqlTransform {

  def registerDialect(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "list_element",
      (args: Seq[Expression]) => ElementAt(args.head, args(1), None, failOnError = false),
      "built-in")

  /** Run a user schema-SQL text over the registered `climbs` view. */
  def apply(spark: SparkSession, schemaSql: String): DataFrame = {
    registerDialect(spark)
    spark.sql(dialectRewrite(schemaSql))
  }

  /** Load a user schema.sql file (SURVEY.md §2.1 S6) and run it. */
  def fromFile(spark: SparkSession, path: String): DataFrame =
    apply(spark, java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** Textual dialect shim: DuckDB's bare `VARCHAR` (no length) is Spark's
    * `STRING` — Spark's parser rejects length-less VARCHAR, so rewrite the
    * token (leaving `VARCHAR(n)` untouched). `--` comments and everything
    * else in the observed schema-file dialect parse identically. */
  private[graft] def dialectRewrite(sql: String): String =
    sql.replaceAll("(?i)\\bVARCHAR\\b(?!\\s*\\()", "STRING")
}
