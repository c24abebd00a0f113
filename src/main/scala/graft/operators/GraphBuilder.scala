package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Terms

/**
 * Semantic tuples → property graph (vertices + edges), re-expressing the
 * reference's graph-construction pass (SURVEY.md §2.4 A1–A5, §3.2) as a
 * declarative Spark plan instead of single-JVM in-memory maps
 * (reference: src/main/java/gov/nih/nlm/ResultsGraphBuilder.java:103-303,
 * src/main/python/OntologyParserLoader.py:639-1042).
 *
 * Semantics preserved:
 *  - vertex identity = (collection, key); first occurrence wins (A1);
 *  - edge identity = (from_coll, to_coll, from_key, to_key) — the predicate
 *    is NOT part of the key; FIRST label in input order wins (A2,
 *    ResultsGraphBuilder.java:230-248) — input order is the `ord` column;
 *  - literal triples fold into vertex attributes; a repeated predicate with
 *    distinct values becomes a list (A3, Python list-append semantics,
 *    OntologyParserLoader.py:911-920 — chosen over Java's overwrite, A4);
 *  - arity-4 quadruples fold onto the edge addressed by vertex pair (A5);
 *    quads addressing a missing edge go to a quarantine channel instead of
 *    throwing (the Java reference throws, ResultsGraphBuilder.java:291-292).
 *
 * Scale notes: every step is a hash aggregation or equi-join on the graph
 * keys — no driver-side maps, no O(n²) containment scans
 * (PhenotypeGraphBuilder.java:125-151 is the anti-pattern). Output written
 * partitioned by `collection` / `(from_coll)` gives partition pruning to
 * every downstream hop-constrained path query.
 */
object GraphBuilder {

  /** Build the vertex table from arity-3 tuples.
    *
    * @param tuples     DataFrame(s, p, o, lit, ord)
    * @param whitelist  allowed vertex collections (F8,
    *                   OntologyParserLoader.py:41-43); None = allow all
    */
  def vertices(tuples: DataFrame, whitelist: Option[Seq[String]] = None,
               attrAppend: Boolean = true): DataFrame = {
    val t3 = tuples.filter(col("lit").isNull)
    val uriUri = t3.filter(Terms.isUri(col("s")) && Terms.isUri(col("o")))

    // every subject and object of a relation triple is a vertex candidate
    val candidates = uriUri
      .select(col("s").as("uri"), col("ord"))
      .unionByName(uriUri.select(col("o").as("uri"), col("ord")))
      .withColumn("ck", parseTerm(col("uri")))
      .select(col("ck.collection"), col("ck.key"), col("ck.term"), col("ord"))

    val whitelisted = whitelist match {
      case Some(ws) => candidates.filter(col("collection").isin(ws: _*))
      case None     => candidates
    }

    // A1: first occurrence wins — min_by over the input ordinal
    val verts = whitelisted
      .groupBy("collection", "key")
      .agg(min_by(col("term"), col("ord")).as("term"))

    // A3: literal triples (s is URI, o is literal) fold into attributes,
    // attribute name = predicate fragment, repeated values append distinct
    val litTriples = t3.filter(Terms.isUri(col("s")) && !Terms.isUri(col("o")))
      .withColumn("ck", parseTerm(col("s")))
      .select(col("ck.collection"), col("ck.key"),
        Terms.uriFragment(col("p")).as("attr"), col("o").as("value"), col("ord"))

    // A3 (append, the Python loader) vs A4 (overwrite, the Java builder,
    // ResultsGraphBuilder.java:260-270: a repeated predicate replaces the
    // value — LAST in input order wins, single-element list out)
    val folded =
      if (attrAppend)
        // sort_array over (ord, value) keeps first-seen order like the
        // reference's list-append, then dedup preserving that order
        array_distinct(transform(
          array_sort(collect_list(struct(col("ord"), col("value")))),
          x => x.getField("value")))
      else array(max_by(col("value"), col("ord")))
    val attrs = litTriples
      .groupBy("collection", "key", "attr")
      .agg(folded.as("values"))
      .groupBy("collection", "key")
      .agg(map_from_entries(collect_list(struct(col("attr"), col("values")))).as("attrs"))

    verts.join(attrs, Seq("collection", "key"), "left")
  }

  /** Build the edge table from arity-3 URI-URI tuples (A2: first-wins label)
    * and fold arity-4 quadruple annotations onto edges (A5).
    *
    * @param roLabels  optional (term, label) map parsed from ro.owl (J6,
    *                  OntologyParserLoader.py:257-259): an edge label that
    *                  is an RO term is replaced by its human label via a
    *                  broadcast join. */
  def edges(tuples: DataFrame, roLabels: Option[DataFrame] = None): DataFrame = {
    val uriUri = tuples.filter(col("lit").isNull &&
      Terms.isUri(col("s")) && Terms.isUri(col("o")))
      .withColumn("sk", parseTerm(col("s")))
      .withColumn("ok", parseTerm(col("o")))
      .select(
        col("sk.collection").as("from_coll"), col("sk.key").as("from_key"),
        col("ok.collection").as("to_coll"), col("ok.key").as("to_key"),
        Terms.uriFragment(col("p")).as("label"), col("ord"))

    // A2: edge key ignores the predicate; first label in input order wins
    val dedup = uriUri
      .groupBy("from_coll", "to_coll", "from_key", "to_key")
      .agg(min_by(col("label"), col("ord")).as("label"))

    // J6: map RO predicate terms to their ontology labels (broadcast —
    // the RO vocabulary is a few hundred rows)
    val e = roLabels match {
      case Some(ro) =>
        dedup.join(
            broadcast(ro.select(col("term").as("__ro_term"),
              col("label").as("__ro_label"))),
            col("label") === col("__ro_term"), "left")
          .withColumn("label", coalesce(col("__ro_label"), col("label")))
          .drop("__ro_term", "__ro_label")
      case None => dedup
    }

    // A5: quadruples (s, o, p, lit) annotate the edge addressed by the pair
    val quads = tuples.filter(col("lit").isNotNull)
      .withColumn("sk", parseTerm(col("s")))
      .withColumn("ok", parseTerm(col("o")))
      .select(
        col("sk.collection").as("from_coll"), col("sk.key").as("from_key"),
        col("ok.collection").as("to_coll"), col("ok.key").as("to_key"),
        Terms.uriFragment(col("p")).as("attr"), col("lit").as("value"), col("ord"))

    val quadAttrs = quads
      .groupBy("from_coll", "to_coll", "from_key", "to_key", "attr")
      .agg(array_distinct(transform(
        array_sort(collect_list(struct(col("ord"), col("value")))),
        x => x.getField("value"))).as("values"))
      .groupBy("from_coll", "to_coll", "from_key", "to_key")
      .agg(map_from_entries(collect_list(struct(col("attr"), col("values")))).as("attrs"))

    e.join(quadAttrs, Seq("from_coll", "to_coll", "from_key", "to_key"), "left")
  }

  /** Quadruples that address a non-existent edge — the quarantine channel
    * (the Java reference throws: ResultsGraphBuilder.java:291-292; the
    * Python one logs: OntologyParserLoader.py:1004-1006). Left anti-join. */
  def orphanQuads(tuples: DataFrame): DataFrame = {
    val e = edges(tuples).select("from_coll", "to_coll", "from_key", "to_key")
    tuples.filter(col("lit").isNotNull)
      .withColumn("sk", parseTerm(col("s")))
      .withColumn("ok", parseTerm(col("o")))
      .withColumn("from_coll", col("sk.collection"))
      .withColumn("from_key", col("sk.key"))
      .withColumn("to_coll", col("ok.collection"))
      .withColumn("to_key", col("ok.key"))
      .join(e, Seq("from_coll", "to_coll", "from_key", "to_key"), "left_anti")
      .select("s", "p", "o", "lit", "ord")
  }

  /** term → struct(collection, key, term); works for both full PURLs and
    * already-parsed `PREFIX_key` names (synthesized vertices like
    * `GS_<gene>`, NSForestResultsTupleWriter.py:59-61).
    * collection = prefix before the FIRST underscore, key = the rest
    * (keys may themselves contain underscores/uuids).
    *
    * Deliberately regex-free: this runs twice per tuple in the graph-build
    * hot path, and Catalyst's struct-field expansion duplicates each field
    * expression — regexp_extract here measured ~90 s at sf0.1 vs ~2 s for
    * the substring_index form (an OBO PURL's term is exactly its last
    * path/fragment segment, OntologyParserLoader.py:40). */
  def parseTerm(c: Column): Column = {
    val frag = substring_index(substring_index(rtrim(c, "/"), "#", -1), "/", -1)
    val term = when(Terms.isUri(c), frag).otherwise(c)
    val prefix = substring_index(term, "_", 1)
    val key = when(term.contains("_"),
      term.substr(length(prefix) + lit(2), length(term))).otherwise(term)
    struct(prefix.as("collection"), key.as("key"), term.as("term"))
  }
}
