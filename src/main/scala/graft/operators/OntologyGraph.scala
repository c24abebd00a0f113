package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Terms

/**
 * Ontology triples (post de-reification) → property graph with the
 * reference's parse_term(ro) semantics (OntologyParserLoader.py:588-1042),
 * as opposed to [[GraphBuilder]] which models the results-graph writer
 * (ResultsGraphBuilder.java) conventions:
 *
 *  - a term is a vertex iff it parses as an OBO class (collection = oid,
 *    key = number, OntologyParserLoader.py:617-624); '#fragment' URIs,
 *    GOREL ids and literals never become vertices;
 *  - an edge requires a class subject AND object and a resolvable
 *    predicate label (:729-744): a '#fragment' predicate labels the edge
 *    with its fragment ("subClassOf"), an OBO-class predicate (RO_*,
 *    BFO_*) with its RO vocabulary label ("develops from") — class
 *    predicates WITHOUT an RO label are skipped;
 *  - edge identity = the (from, to) vertex pair; the FIRST label in input
 *    order wins (:831-838);
 *  - literal triples fold onto the class subject (:846-924): attr key =
 *    the resolved predicate label (so obo:IAO_0000115 folds as
 *    "definition" via RO); the first occurrence is a scalar, ANY
 *    repetition converts to a list of distinct values in first-seen order
 *    (:912-920). Attrs are returned as struct(values, n): n is the
 *    emission count, so callers can reproduce the reference's
 *    scalar-vs-list distinction (n == 1 ⇒ scalar) exactly.
 *
 * Scale: the RO vocabulary is tiny (labels for a few thousand relations)
 * and folds into the plan as ONE map literal — classification and key
 * parsing are narrow projections; the only shuffles are the hash
 * aggregations on the vertex/edge keys. Nothing runs driver-side.
 */
object OntologyGraph {

  /** The reference's predicate resolution (parse_term + the
    * 'predicate-or-labeled-class' guard, OntologyParserLoader.py:729-744,
    * 895-903): fragment for '#' URIs, RO label for OBO-class URIs, null
    * (= skip the triple) otherwise. */
  def predLabel(p: Column, roMap: Column): Column = {
    val pt = Terms.parseTermFull(p)
    when(pt.getField("kind") === "predicate", pt.getField("fragment"))
      .when(pt.getField("kind") === "class",
        element_at(roMap, pt.getField("term")))
  }

  /**
   * @param triples de-reified ontology triples (s, p, o, oKind) —
   *                [[Dereify.triples]] output (no bnodes remain)
   * @param ro      RO term → label map ([[Dereify.labels]] of a parsed
   *                ro.owl, collected — small by contract)
   * @return (vertices(collection, key, term,
   *          attrs map<string, struct<values array<string>, n long>>),
   *          edges(from_coll, from_key, to_coll, to_key, label))
   */
  def build(triples: DataFrame, ro: Map[String, String]): (DataFrame, DataFrame) = {
    val roMap = typedLit(ro)
    // input order for first-wins: ids are monotone within a partition and
    // partitions follow file order, matching the reference's sequential
    // triple loop per document
    val base = triples
      .withColumn("ord", monotonically_increasing_id())
      .withColumn("st", Terms.parseTermFull(col("s")))
      .withColumn("ot", Terms.parseTermFull(col("o")))
      .withColumn("pk", predLabel(col("p"), roMap))

    val isLit = col("oKind") === "literal"

    // --- edges: class subject, resolvable predicate, class object ---
    val rel = base.filter(!isLit &&
      col("st.kind") === "class" && col("pk").isNotNull &&
      col("ot.kind") === "class")
    val edges = rel
      .groupBy(col("st.oid").as("from_coll"), col("st.number").as("from_key"),
        col("ot.oid").as("to_coll"), col("ot.number").as("to_key"))
      .agg(min_by(col("pk"), col("ord")).as("label"))

    // --- vertices: class ends of relation triples (:588-637; created
    // independently of edge validity) + class subjects of literal triples
    // (:884-889, created before the predicate guard) ---
    val relEnds = base.filter(!isLit)
    val verts = relEnds
      .filter(col("st.kind") === "class")
      .select(col("st.oid").as("collection"), col("st.number").as("key"),
        col("st.term").as("term"))
      .unionByName(relEnds.filter(col("ot.kind") === "class")
        .select(col("ot.oid"), col("ot.number"), col("ot.term"))
        .toDF("collection", "key", "term"))
      .unionByName(base.filter(isLit && col("st.kind") === "class")
        .select(col("st.oid"), col("st.number"), col("st.term"))
        .toDF("collection", "key", "term"))
      .dropDuplicates("collection", "key")

    // --- attrs: literal triples on class subjects with resolved keys ---
    val attrs = base
      .filter(isLit && col("st.kind") === "class" && col("pk").isNotNull)
      .select(col("st.oid").as("collection"), col("st.number").as("key"),
        col("pk").as("attr"), col("o").as("value"), col("ord"))
      .groupBy("collection", "key", "attr")
      .agg(
        array_distinct(transform(
          array_sort(collect_list(struct(col("ord"), col("value")))),
          x => x.getField("value"))).as("values"),
        count(lit(1)).as("n"))
      .groupBy("collection", "key")
      .agg(map_from_entries(collect_list(
        struct(col("attr"), struct(col("values"), col("n"))))).as("attrs"))

    (verts.join(attrs, Seq("collection", "key"), "left"), edges)
  }
}
