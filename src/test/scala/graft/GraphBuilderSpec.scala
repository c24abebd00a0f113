package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphBuilder

/** Graph-construction semantics (SURVEY.md §2.4 A1-A5):
  * vertex/edge identity, first-wins labels, attribute folds, quarantine.
  * Mirrors the reference's create-get-update tests
  * (OntologyParserLoaderTestCase.py:283-436) on hand-built tuples. */
class GraphBuilderSpec extends SparkSpec {
  import spark.implicits._

  private val obo = "http://purl.obolibrary.org/obo/"
  private val rdfsLabel = "http://www.w3.org/2000/01/rdf-schema#label"

  // (s, p, o, lit, ord)
  private def tuples(rows: (String, String, String, String)*) =
    rows.zipWithIndex
      .map { case ((s, p, o, l), i) => (s, p, o, Option(l), i.toLong) }
      .toDF("s", "p", "o", "lit", "ord")

  test("vertices: both endpoints of a relation triple become vertices") {
    val t = tuples((obo + "CL_0000235", obo + "BFO_0000050", obo + "UBERON_0000948", null))
    val v = GraphBuilder.vertices(t).collect()
    assert(v.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("CL", "0000235"), ("UBERON", "0000948")))
  }

  test("vertices: literal triples fold into the attribute bag; repeats append distinct") {
    // Python list-append semantics (OntologyParserLoader.py:911-920)
    val t = tuples(
      (obo + "CL_0000235", obo + "RO_1", obo + "CL_0000236", null),
      (obo + "CL_0000235", rdfsLabel, "macrophage", null),
      (obo + "CL_0000235", rdfsLabel, "macrophage", null), // dup value: kept once
      (obo + "CL_0000235", rdfsLabel, "big eater", null)) // new value: appended
    val v = GraphBuilder.vertices(t)
      .filter($"key" === "0000235")
      .select($"attrs"("label")).head().getSeq[String](0)
    assert(v == Seq("macrophage", "big eater")) // first-seen order
  }

  test("vertices: A4 overwrite fold keeps only the LAST value per attr") {
    // the Java builder's semantics (ResultsGraphBuilder.java:260-270)
    val t = tuples(
      (obo + "CL_0000235", obo + "RO_1", obo + "CL_0000236", null),
      (obo + "CL_0000235", rdfsLabel, "macrophage", null),
      (obo + "CL_0000235", rdfsLabel, "big eater", null))
    val v = GraphBuilder.vertices(t, attrAppend = false)
      .filter($"key" === "0000235")
      .select($"attrs"("label")).head().getSeq[String](0)
    assert(v == Seq("big eater"))
  }

  test("vertices: whitelist filters collections") {
    val t = tuples(
      (obo + "CL_1", obo + "RO_1", obo + "GOREL_2", null),
      (obo + "GO_3", obo + "RO_1", obo + "CL_4", null))
    val colls = GraphBuilder.vertices(t, Some(Seq("CL", "GO")))
      .select("collection").distinct().as[String].collect().toSet
    assert(colls == Set("CL", "GO"))
  }

  test("edges: identity ignores the predicate; FIRST label wins") {
    // A2 (ResultsGraphBuilder.java:230-248): a second predicate between
    // the same vertex pair is dropped
    val t = tuples(
      (obo + "CL_1", "http://x#first_label", obo + "GO_2", null),
      (obo + "CL_1", "http://x#second_label", obo + "GO_2", null))
    val e = GraphBuilder.edges(t).collect()
    assert(e.length == 1)
    assert(e(0).getAs[String]("label") == "first_label")
  }

  test("edges: quadruples fold onto the edge addressed by vertex pair") {
    // quad columns stay (s, p, o, lit) semantically: edge s->o, attr p
    val t = tuples(
      (obo + "CL_1", "http://x#r", obo + "GO_2", null),
      (obo + "CL_1", "http://x#score", obo + "GO_2", "0.93"))
    val e = GraphBuilder.edges(t).head()
    assert(e.getAs[Map[String, scala.collection.Seq[String]]]("attrs")("score") == Seq("0.93"))
  }

  test("orphan quads are quarantined, not thrown") {
    // Java reference throws (ResultsGraphBuilder.java:291-292); we divert
    val t = tuples(
      (obo + "CL_1", "http://x#r", obo + "GO_2", null),
      (obo + "CL_1", "http://x#score", obo + "GO_9", "0.5")) // no CL_1->GO_9 edge
    val q = GraphBuilder.orphanQuads(t).collect()
    assert(q.length == 1)
    assert(q(0).getAs[String]("lit") == "0.5")
  }

  test("macrophage-style golden vertex: term, label, synonyms as lists") {
    // shape of the reference integration expectation
    // (OntologyParserLoaderTestCase.py:484-530)
    val t = tuples(
      (obo + "CL_0000235", obo + "BFO_0000050", obo + "UBERON_0002405", null),
      (obo + "CL_0000235", rdfsLabel, "macrophage", null),
      (obo + "CL_0000235", "http://www.geneontology.org/formats/oboInOwl#hasExactSynonym", "histiocyte", null),
      (obo + "CL_0000235", "http://www.geneontology.org/formats/oboInOwl#hasDbXref", "BTO:0000801", null),
      (obo + "CL_0000235", "http://www.geneontology.org/formats/oboInOwl#hasDbXref", "CALOHA:TS-0587", null))
    val v = GraphBuilder.vertices(t).filter($"term" === "CL_0000235").head()
    val attrs = v.getAs[Map[String, scala.collection.Seq[String]]]("attrs")
    assert(attrs("label") == Seq("macrophage"))
    assert(attrs("hasExactSynonym") == Seq("histiocyte"))
    assert(attrs("hasDbXref") == Seq("BTO:0000801", "CALOHA:TS-0587"))
  }
}
