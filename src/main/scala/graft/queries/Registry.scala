package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** All declared queries (SURVEY.md §2 operator coverage + the LLM-pipeline
  * extension surface), keyed for SparkEntry / Verify / Bench. */
object Registry {
  val all: Seq[Q] =
    Relational.all ++ TextQueries.all ++ VectorQueries.all ++
      PipelineQueries.all ++ MultimodalQueries.all ++ ParityQueries.all ++
      CorpusQueries.all ++ EventQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Data-dependent oracles (Q.oracleGen), built against the live session
    * and scale-factor dir at Verify time. Disjoint from [[oracleSql]]. */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    all.flatMap(q => q.oracleGen.map(g => q.name -> g(spark, sfDir))).toMap

  /** Drops memoized per-dir query state (see VectorQueries.resetCaches);
    * input STAGING caches (ParityQueries' replayed-events dir) are kept —
    * they are test-input setup, not query work. */
  def resetTransientCaches(): Unit = VectorQueries.resetCaches()
}
