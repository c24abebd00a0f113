package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Property-graph persistence (SURVEY.md §2.1 S11/S12): vertices and edges
 * as Parquet partitioned by collection — the Spark-native replacement for
 * ArangoDB collections (OntologyParserLoader.py:1045-1109,
 * ResultsGraphBuilder.java:390-396).
 *
 * Partitioning IS the index: a path query constraining hop i to
 * collection X reads only `from_coll=X` (or `to_coll=X`) directories —
 * Catalyst partition pruning, no custom index code. Idempotent overwrite
 * replaces the reference's insert-if-absent/per-doc-upsert round trips
 * (PhenotypeGraphBuilder.java:166-223): recompute + atomic replace is the
 * batch-native contract.
 */
object GraphStore {

  def writeVertices(vertices: DataFrame, path: String): Unit =
    vertices.write.mode("overwrite")
      .partitionBy("collection")
      .parquet(path)

  def writeEdges(edges: DataFrame, path: String): Unit =
    edges.write.mode("overwrite")
      .partitionBy("from_coll", "to_coll")
      .parquet(path)

  def readVertices(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readEdges(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
