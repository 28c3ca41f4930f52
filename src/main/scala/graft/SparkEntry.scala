package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{GraftQueries, RelationalQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query inventory maps 1:1 to the operator inventory in SURVEY.md §2 plus
  * the training-data-pipeline operators (dedup, ANN, text analysis,
  * multimodal plumbing). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full heatmap pipeline (rasterize → k-anon → pyramid) over tracks
    * derived from the events table. */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s: SparkSession = spark
    val tracks = GraftQueries.eventTracks(spark, "/root/testdata/sf0.001")
    graft.pipeline.HeatmapPipeline.run(tracks).pyramid.toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++ GraftQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ TextQueries.oracleSql ++ GraftQueries.oracleSql
}
