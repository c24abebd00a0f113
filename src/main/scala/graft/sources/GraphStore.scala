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

  /** Persist the undirected edge view TWICE, bucketed+sorted by each hop
    * join key — `<prefix>_by_src` on (src_coll, src_key) and
    * `<prefix>_by_dst` on (dst_coll, dst_key) — so
    * `PathQueries.kHopBucketed` joins hop after hop without ever
    * shuffling the edge table (only the small growing path side moves).
    * Double storage is the classic adjacency-layout trade: at 100 TB the
    * recurring per-hop shuffle of the edge table costs far more than 2×
    * disk. The directed view is recoverable via `orient = 'f'`. */
  def writeHopTables(edges: DataFrame, buckets: Int, prefix: String): Unit = {
    val und = graft.operators.PathQueries.undirected(edges)
    graft.operators.Scale.resetManagedTable(edges.sparkSession, s"${prefix}_by_src")
    graft.operators.Scale.resetManagedTable(edges.sparkSession, s"${prefix}_by_dst")
    und.write.mode("overwrite")
      .bucketBy(buckets, "src_coll", "src_key").sortBy("src_coll", "src_key")
      .format("parquet").saveAsTable(s"${prefix}_by_src")
    und.write.mode("overwrite")
      .bucketBy(buckets, "dst_coll", "dst_key").sortBy("dst_coll", "dst_key")
      .format("parquet").saveAsTable(s"${prefix}_by_dst")
  }
}
