package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  * Each module under graft.queries contributes (name -> Q) pairs; a Q bundles
  * the Spark plan with its DuckDB oracle SQL (when SQL-expressible).
  */
object SparkEntry {

  def all: Seq[(String, Q)] =
    _root_.graft.queries.Relational.defs ++
      _root_.graft.queries.TpcH.defs ++
      _root_.graft.queries.Analytics.defs ++
      _root_.graft.queries.Ingestion.defs ++
      _root_.graft.queries.TrainingData.defs ++
      _root_.graft.queries.Curation.defs ++
      _root_.graft.queries.Similarity.defs ++
      _root_.graft.queries.Graph.defs ++
      _root_.graft.queries.Streaming.defs ++
      _root_.graft.queries.HashProbe.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("pipeline_training_data")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) => n -> q.fn }.toMap

  /** DuckDB oracle SQL per query (omitted -> driver does rows-only check). */
  def oracleSql: Map[String, String] =
    all.collect { case (n, q) if q.oracle.isDefined => n -> q.oracle.get }.toMap
}
