package graft

import org.apache.spark.sql.Row
import graft.operators.{Dereify, OntologyGraph}
import graft.sources.OwlSource

/**
 * Real-fixture replay of the reference's ontology parse+load test
 * (OntologyParserLoaderTestCase.py:484-552): parse the committed
 * macrophage.owl + ro.owl through OwlSource → Dereify → OntologyGraph and
 * assert the EXACT expected macrophage vertex (11 dbXrefs, synonym,
 * comment, label, id, definition — with the reference's scalar-vs-list
 * attribute distinction) and its four labeled edge groups.
 */
class MacrophageGoldenSpec extends SparkSpec {

  private val oboDir = "/root/reference/src/test/data/obo"

  private lazy val graph: (Map[String, Row], Map[(String, String, String, String), String]) = {
    val mac = OwlSource.readOwl(spark, s"$oboDir/macrophage.owl")
    val ro = OwlSource.readOwl(spark, s"$oboDir/ro.owl")
    val roMap = Dereify.labels(ro).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val (v, e) = OntologyGraph.build(Dereify.triples(mac), roMap)
    val verts = v.collect()
      .map(r => s"${r.getString(0)}/${r.getString(1)}" -> r).toMap
    val edges = e.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3)) ->
        r.getString(4)).toMap
    (verts, edges)
  }

  private def attr(row: Row, key: String): (Seq[String], Long) = {
    val m = row.getMap[String, Row](row.fieldIndex("attrs"))
    val s = m(key)
    (s.getSeq[String](0), s.getLong(1))
  }

  test("macrophage vertex matches the reference's expected document") {
    val (verts, _) = graph
    val v = verts("CL/0000235")
    assert(v.getString(v.fieldIndex("term")) == "CL_0000235")

    // exactly the reference's expected attribute keys — inSubset (a
    // fragment-URI object) and the bnode machinery must NOT leak through
    val keys = v.getMap[String, Row](v.fieldIndex("attrs")).keySet
    assert(keys == Set("label", "comment", "id", "definition",
      "hasDbXref", "hasExactSynonym"))

    // scalars (single emission, n == 1)
    assert(attr(v, "label") == (Seq("macrophage"), 1L))
    assert(attr(v, "hasExactSynonym") == (Seq("histiocyte"), 1L))
    assert(attr(v, "id") == (Seq("CL:0000235"), 1L))
    val (comment, nComment) = attr(v, "comment")
    assert(nComment == 1L && comment.head.startsWith("Morphology: Diameter") &&
      comment.head.contains("markers: Mouse & Human: CD68"))

    // definition: emitted directly AND re-emitted by its owl:Axiom
    // annotation -> the reference converts it to a (deduplicated) LIST
    val (defs, nDefs) = attr(v, "definition")
    assert(nDefs >= 2L, "definition must be list-typed (re-emitted by axiom)")
    assert(defs == Seq("A mononuclear phagocyte present in variety of " +
      "tissues, typically differentiated from monocytes, capable of " +
      "phagocytosing a variety of extracellular particulate material, " +
      "including immune complexes, microorganisms, and dead cells."))

    // all 11 dbXrefs: 6 direct + 5 re-emitted from axiom literal buckets
    val (xrefs, _) = attr(v, "hasDbXref")
    assert(xrefs.sorted == Seq("BTO:0000801", "CALOHA:TS-0587",
      "FMA:63261", "FMA:83585", "GOC:add", "GOC:tfm", "GO_REF:0000031",
      "MESH:D008264", "PMID:16213494", "PMID:1919437", "ZFA:0009141").sorted)
  }

  test("macrophage edges carry fragment and RO-vocabulary labels") {
    val (_, edges) = graph
    // direct rdfs:subClassOf class-to-class triples
    for (k <- Seq("0000113", "0000145", "0000766"))
      assert(edges(("CL", "0000235", "CL", k)) == "subClassOf")
    // de-reified owl:Restriction relations, labeled via ro.owl (J6)
    assert(edges(("CL", "0000235", "CL", "0000576")) == "develops from")
    assert(edges(("CL", "0000235", "GO", "0031268")) == "capable of")
    // direct OBO-class predicate with an RO label
    assert(edges(("CL", "0000235", "NCBITaxon", "9606")) == "present in taxon")
  }

  test("fragment-URI objects (inSubset slims) never become vertices or edges") {
    val (verts, edges) = graph
    assert(!verts.keys.exists(_.contains("blood_and_immune")))
    assert(!edges.keys.exists(_._4.contains("slim")))
    // rdf:type objects (owl#Class) are fragment URIs too
    assert(!verts.contains("Class/Class"))
  }
}
