package graft.model

import org.apache.spark.sql.types._

/**
 * Core data model of the engine (SURVEY.md §1).
 *
 * The reference pipeline (NIH-NLM/cell-kn-mvp-etl-results) flows everything
 * through three shapes:
 *
 *  1. semantic tuples — RDF-style triples `(s, p, o)` plus edge-annotation
 *     quadruples `(s, o, p, literal)` (reference:
 *     src/main/java/gov/nih/nlm/ResultsGraphBuilder.java:74-83);
 *  2. a property graph — vertex collections keyed by ontology prefix and
 *     edge collections keyed by prefix pairs (reference:
 *     src/main/python/OntologyParserLoader.py:665-680, 823-843);
 *  3. paths — `{vertices: [...], edges: [...]}` traversal results
 *     (reference: src/main/java/gov/nih/nlm/AqlQuerySetBuilder.java:32-39).
 *
 * Here each is a DataFrame schema. Vertices/edges are plain columnar tables
 * (partition-friendly by `collection` / `(from_coll, to_coll)`), NOT an
 * in-memory graph object — at 100 TB a graph is just two big Parquet tables.
 */
object Model {

  /** A semantic tuple. `lit == null` → arity-3 relation/annotation triple;
    * `lit != null` → arity-4 edge-annotation quadruple `(s, o, p, lit)`. */
  val tupleSchema: StructType = StructType(Seq(
    StructField("s", StringType, nullable = false),
    StructField("p", StringType, nullable = false),
    StructField("o", StringType, nullable = false),
    StructField("lit", StringType, nullable = true),
    // per-source emission ordinal: the reference's golden outputs are
    // order-sensitive lists; Spark DataFrames are unordered, so the order
    // contract is carried as data.
    StructField("ord", LongType, nullable = false)
  ))

  /** Vertex table. `attrs` is the open attribute bag: repeated predicates
    * with distinct values append (Python semantics,
    * OntologyParserLoader.py:911-920 — chosen over the Java overwrite
    * semantics, see SURVEY.md §2.4 A3/A4). */
  val vertexSchema: StructType = StructType(Seq(
    StructField("collection", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("term", StringType, nullable = false),
    StructField("attrs", MapType(StringType, ArrayType(StringType)), nullable = true)
  ))

  /** Edge table. Identity is `(from_coll, to_coll, from_key, to_key)` — the
    * predicate is NOT part of the key; first label wins
    * (ResultsGraphBuilder.java:230-248). */
  val edgeSchema: StructType = StructType(Seq(
    StructField("from_coll", StringType, nullable = false),
    StructField("to_coll", StringType, nullable = false),
    StructField("from_key", StringType, nullable = false),
    StructField("to_key", StringType, nullable = false),
    StructField("label", StringType, nullable = true),
    StructField("attrs", MapType(StringType, ArrayType(StringType)), nullable = true)
  ))

  /** A vertex reference inside a path. */
  val vertexRefType: StructType = StructType(Seq(
    StructField("collection", StringType, nullable = false),
    StructField("key", StringType, nullable = false)
  ))

  /** An edge reference inside a path (directed as traversed). */
  val edgeRefType: StructType = StructType(Seq(
    StructField("from_coll", StringType, nullable = false),
    StructField("from_key", StringType, nullable = false),
    StructField("to_coll", StringType, nullable = false),
    StructField("to_key", StringType, nullable = false),
    StructField("label", StringType, nullable = true)
  ))

  /** Path result: arrays of vertex/edge refs, like AQL's path object. */
  val pathSchema: StructType = StructType(Seq(
    StructField("vertices", ArrayType(vertexRefType), nullable = false),
    StructField("edges", ArrayType(edgeRefType), nullable = false)
  ))
}

/** Typed views for the API boundary (Dataset[T] where type safety helps). */
case class SemTuple(s: String, p: String, o: String, lit: Option[String], ord: Long)
case class VertexRef(collection: String, key: String)
case class EdgeRef(from_coll: String, from_key: String, to_coll: String, to_key: String, label: String)
