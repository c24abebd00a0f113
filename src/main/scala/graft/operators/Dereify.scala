package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * OWL BNode de-reification (SURVEY.md §2.4 A9/A10), re-expressing the
 * reference's driver-side dict grouping (OntologyParserLoader.py:341-556)
 * as groupByKey + flatMapGroups — one shuffle on the bnode id, then pure
 * per-group logic (groups are tiny: an owl:Restriction or owl:Axiom has
 * 3-10 triples).
 *
 * Reference semantics preserved exactly:
 *  - triples where BOTH ends are bnodes are skipped (:369-370);
 *  - a mixed triple is keyed by whichever end is the bnode (:374-384);
 *  - bucket classification by predicate FRAGMENT (the part after '#'):
 *    relation {subClassOf, onProperty, someValuesFrom}; annotation
 *    {annotatedSource, annotatedProperty, annotatedTarget}; literal
 *    {hasDbXref, source}; else 'class' when either end parses as an
 *    ontology class or bnode; else 'other' (:399-413);
 *  - a relation/annotation bucket reconstructs a triple only when it has
 *    EXACTLY 3 triples, one per role; the filled end of each supplies the
 *    value (get_fnode, :559-586);
 *  - a successful annotation set re-emits its literal-bucket triples
 *    against the reconstructed subject (:532-537);
 *  - invalid sets (wrong count or missing role) divert to the ignored
 *    side-channel, annotation failures dragging their literal bucket
 *    along (:539-556); class/other buckets are always ignored.
 */
object Dereify {

  final case class BTriple(bnode: String, s: String, p: String, o: String,
                           sKind: String, oKind: String, bucket: String)
  final case class OutTriple(s: String, p: String, o: String, oKind: String)

  private val relationRoles = Set("subClassOf", "onProperty", "someValuesFrom")
  private val annotationRoles = Set("annotatedSource", "annotatedProperty", "annotatedTarget")
  private val literalFrags = Set("hasDbXref", "source")

  /** Triples with no bnode end — pass through untouched
    * (collect_fnode_triples, OntologyParserLoader.py:315-338). */
  def fnodeTriples(triples: DataFrame): DataFrame =
    triples.filter(col("sKind") =!= "bnode" && col("oKind") =!= "bnode")
      .select("s", "p", "o", "oKind")

  /** Predicate fragment: the part after '#', or null (urlparse().fragment
    * semantics — a plain-path URI has no fragment). */
  private def pFragment(p: org.apache.spark.sql.Column) =
    when(p.contains("#"), substring_index(p, "#", -1))

  /** 'class' test for bucket fallback: an OBO-pattern URI (GOREL excluded,
    * OntologyParserLoader.py:244-249) or a bnode. */
  private def isClassTerm(c: org.apache.spark.sql.Column,
                          kind: org.apache.spark.sql.Column) = {
    val oid = regexp_extract(c, "/obo/([A-Za-z]*)_([A-Za-z0-9-+]*)", 1)
    val num = regexp_extract(c, "/obo/([A-Za-z]*)_([A-Za-z0-9-+]*)", 2)
    kind === "bnode" || (oid =!= "" && num =!= "" && oid =!= "GOREL")
  }

  /** Key mixed triples by their bnode end and classify into buckets. */
  def bnodeTriples(triples: DataFrame): Dataset[BTriple] = {
    import triples.sparkSession.implicits._
    val mixed = triples.filter(
      (col("sKind") === "bnode") =!= (col("oKind") === "bnode"))
    val frag = pFragment(col("p"))
    mixed.select(
      when(col("sKind") === "bnode", col("s")).otherwise(col("o")).as("bnode"),
      col("s"), col("p"), col("o"), col("sKind"), col("oKind"),
      when(frag.isin(relationRoles.toSeq: _*), "relation")
        .when(frag.isin(annotationRoles.toSeq: _*), "annotation")
        .when(frag.isin(literalFrags.toSeq: _*), "literal")
        .when(isClassTerm(col("s"), col("sKind")) ||
          isClassTerm(col("o"), col("oKind")), "class")
        .otherwise("other").as("bucket"))
      .as[BTriple]
  }

  /** De-reify: (reconstructed triples, ignored triples). */
  def dereify(triples: DataFrame): (Dataset[OutTriple], Dataset[OutTriple]) = {
    import triples.sparkSession.implicits._
    val grouped = bnodeTriples(triples).groupByKey(_.bnode)
    // each group emits (isIgnored, triple) rows; split afterwards
    val both = grouped.flatMapGroups { (_, it) =>
      val ts = it.toSeq
      val byBucket = ts.groupBy(_.bucket).withDefaultValue(Seq.empty)
      val outs = scala.collection.mutable.ArrayBuffer.empty[(Boolean, OutTriple)]

      def fnode(t: BTriple): (String, String) =
        if (t.sKind == "bnode") (t.o, t.oKind) else (t.s, t.sKind)

      def frag(p: String): String = {
        val i = p.lastIndexOf('#')
        if (i >= 0) p.substring(i + 1) else ""
      }

      def reconstruct(bucket: String, roles: (String, String, String)): Unit = {
        val set = byBucket(bucket)
        val isAnnotation = bucket == "annotation"
        if (set.length == 3) {
          var cs: Option[(String, String)] = None
          var cp: Option[(String, String)] = None
          var co: Option[(String, String)] = None
          set.foreach { t =>
            val f = frag(t.p)
            if (f == roles._1) cs = Some(fnode(t))
            if (f == roles._2) cp = Some(fnode(t))
            if (f == roles._3) co = Some(fnode(t))
          }
          (cs, cp, co) match {
            case (Some((s, _)), Some((p, _)), Some((o, oKind))) =>
              outs += ((false, OutTriple(s, p, o, oKind)))
              if (isAnnotation)
                byBucket("literal").foreach { lt =>
                  outs += ((false, OutTriple(s, lt.p, lt.o, lt.oKind)))
                }
            case _ =>
              set.foreach(t => outs += ((true, OutTriple(t.s, t.p, t.o, t.oKind))))
              if (isAnnotation)
                byBucket("literal").foreach(t =>
                  outs += ((true, OutTriple(t.s, t.p, t.o, t.oKind))))
          }
        } else if (set.nonEmpty) {
          set.foreach(t => outs += ((true, OutTriple(t.s, t.p, t.o, t.oKind))))
          if (isAnnotation)
            byBucket("literal").foreach(t =>
              outs += ((true, OutTriple(t.s, t.p, t.o, t.oKind))))
        }
      }

      reconstruct("relation", ("subClassOf", "onProperty", "someValuesFrom"))
      reconstruct("annotation", ("annotatedSource", "annotatedProperty", "annotatedTarget"))
      (byBucket("class") ++ byBucket("other")).foreach(t =>
        outs += ((true, OutTriple(t.s, t.p, t.o, t.oKind))))
      outs.iterator
      // read twice (kept/ignored splits) — localCheckpoint instead of
      // cache(): materialized once, lineage cut, and the blocks are
      // reclaimed by ContextCleaner when the caller drops the result
      // (a CacheManager entry would pin memory until clearCache)
    }.localCheckpoint(true)
    (both.filter(!_._1).map(_._2), both.filter(_._1).map(_._2))
  }

  /** Full pipeline: filled triples ∪ reconstructed bnode triples
    * (OntologyParserLoader.py:1292-1293). */
  def triples(raw: DataFrame): DataFrame = {
    val (recon, _) = dereify(raw)
    fnodeTriples(raw).unionByName(recon.toDF())
  }

  /** RO term → label map from a parsed ontology's rdfs:label triples
    * (J6, parse_obo analogue OntologyParserLoader.py:152-215). */
  def labels(raw: DataFrame): DataFrame =
    raw.filter(col("p") === "http://www.w3.org/2000/01/rdf-schema#label" &&
        col("oKind") === "literal")
      .select(
        regexp_extract(col("s"), "/obo/([A-Za-z]+_[A-Za-z0-9-+]+)", 1).as("term"),
        col("o").as("label"))
      .filter(col("term") =!= "")
      .dropDuplicates("term")
}
