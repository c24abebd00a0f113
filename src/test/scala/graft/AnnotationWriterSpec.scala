package graft

import graft.writers.AnnotationWriter

/** X6 normalization + annotation tuple emission, mirroring the
  * reference's normalize_term unit cases
  * (AnnotationResultsTupleWriterTestCase.py:32-183). */
class AnnotationWriterSpec extends SparkSpec {
  import spark.implicits._

  private val P = "http://purl.obolibrary.org/obo"
  private val R = "http://www.w3.org/1999/02/22-rdf-syntax-ns"

  private def ann(sType: String, sName: String, sId: String,
                  rel: String, oType: String, oName: String, oId: String) =
    Seq((sType, sName, sId, rel, oType, oName, oId))
      .toDF("subject_type", "subject_name", "subject_identifier", "relation",
        "object_type", "object_name", "object_identifier")

  private val m2m = Seq(("MESH:D001943", "MONDO_0007254")).toDF("mesh", "mondo")

  private def run(df: org.apache.spark.sql.DataFrame) = run2(df, m2m)

  private def run2(df: org.apache.spark.sql.DataFrame,
                   map: org.apache.spark.sql.DataFrame) =
    AnnotationWriter.tuples(df, map).orderBy("ord")
      .select("s", "p", "o", "lit").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))

  test("cell set subject: CS term with hyphenation, uuid prefix, and Label triple") {
    val ts = run(ann("Cell_set", "T cell set", "abc123-rest", "CONTAINS",
      "Cell_type", "T cell", "CL:0000084"))
    assert(ts.length == 3)
    assert(ts(0) == (s"$P/CS_T-cell-set-abc123", s"$R#CONTAINS", s"$P/CL_0000084", null))
    assert(ts(1) == (s"$P/CS_T-cell-set-abc123", s"$R#Source", s"$P/CL_0000084",
      "Manual Annotation"))
    assert(ts(2) == (s"$P/CS_T-cell-set-abc123", s"$R#Label", "T cell set", null))
  }

  test("unicode replacements: gamma-delta and unicode minus") {
    val ts = run(ann("Cell_set", "γδ T", "x−y-rest", "CONTAINS",
      "Cell_type", "T", "CL:1"))
    // identifier "x−y-rest" cleans to "x-y-rest"; split("-")[0] = "x"
    assert(ts(0)._1 == s"$P/CS_gamma-delta-T-x")
  }

  test("cell type object: skos:related strip + colon swap") {
    val ts = run(ann("Cell_set", "s", "u-1", "CONTAINS",
      "Cell_type", "x", "<skos:related>CL:0000084"))
    assert(ts(0)._3 == s"$P/CL_0000084")
  }

  test("disease maps MeSH to MONDO via the broadcast map; unmapped drops the row") {
    val ts = run(ann("Cell_set", "s", "u-1", "ASSOCIATED",
      "Disease", "asthma", "MESH:D001943"))
    assert(ts(0)._3 == s"$P/MONDO_0007254")
    assert(run(ann("Cell_set", "s", "u-1", "ASSOCIATED",
      "Disease", "rare", "MESH:NOPE")).isEmpty)
  }

  test("gene gate: uppercase symbols pass, MBP synonym patched, others dropped") {
    assert(run(ann("Cell_set", "s", "u-1", "EXPRESSES",
      "Gene", "CD19", "g1"))(0)._3 == s"$P/GS_CD19")
    assert(run(ann("Cell_set", "s", "u-1", "EXPRESSES",
      "Gene", "Myelin basic protein", "g2"))(0)._3 == s"$P/GS_MBP")
    assert(run(ann("Cell_set", "s", "u-1", "EXPRESSES",
      "Gene", "NotAGene", "g3")).isEmpty)
  }

  test("publication: hardcoded PMID rewrites; unknown PMIDs drop") {
    val ts = run(ann("Cell_set", "s", "u-1", "REPORTED_IN",
      "Publication", "Jorstad", "37824655"))
    assert(ts(0)._3 == s"$P/PUB_doi.org/10.1126/science.adf6812")
    assert(run(ann("Cell_set", "s", "u-1", "REPORTED_IN",
      "Publication", "x", "99999")).isEmpty)
  }

  test("dataset prefix swap NLP_dataset -> CSD") {
    val ts = run(ann("Cell_set", "s", "u-1", "SOURCE",
      "Cell_set_dataset", "d", "NLP_dataset_42"))
    assert(ts(0)._3 == s"$P/CSD_42")
  }

  test("meshToMondo builds the map from MONDO xrefs with the 4 patches") {
    // J4 construction (LoaderUtilities.py:825-873): first MESH xref per
    // class, last class wins per MESH term, axioms excluded, patches win
    val obo = "http://purl.obolibrary.org/obo/"
    val xml = s"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      | xmlns:owl="http://www.w3.org/2002/07/owl#"
      | xmlns:oio="http://www.geneontology.org/formats/oboInOwl#">
      |<owl:Class rdf:about="${obo}MONDO_0000001">
      | <oio:hasDbXref>UMLS:C1</oio:hasDbXref>
      | <oio:hasDbXref>MESH:D111</oio:hasDbXref>
      | <oio:hasDbXref>MESH:D999</oio:hasDbXref>
      |</owl:Class>
      |<owl:Class rdf:about="${obo}MONDO_0000002">
      | <oio:hasDbXref>MESH:D111</oio:hasDbXref>
      |</owl:Class>
      |<owl:Class rdf:about="${obo}MONDO_0000003">
      | <oio:hasDbXref>MESH:D005355</oio:hasDbXref>
      |</owl:Class>
      |<owl:Class rdf:about="${obo}MONDO_0000004">
      | <oio:hasDbXref>UMLS:C2</oio:hasDbXref>
      |</owl:Class>
      |<owl:Axiom>
      | <oio:hasDbXref>MESH:D777</oio:hasDbXref>
      |</owl:Axiom>
      |</rdf:RDF>""".stripMargin
    val raw = graft.sources.OwlSource
      .parseBytes("mondo-mini", xml.getBytes("UTF-8")).toSeq
      .toDF("s", "p", "o", "sKind", "oKind")
    val m = AnnotationWriter.meshToMondo(raw).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // first-xref-per-class: D999 (second MESH of class 1) never enters
    assert(!m.contains("MESH:D999"))
    // last class wins for a shared MESH xref
    assert(m("MESH:D111") == "MONDO_0000002")
    // the parsed D005355 entry is overridden by the hardcoded patch
    assert(m("MESH:D005355") == "MONDO_0002771")
    // axiom bnode literals are excluded
    assert(!m.contains("MESH:D777"))
    // all 4 patches present (incl. the UBERON-valued one)
    AnnotationWriter.meshPatches.foreach { case (k, v) => assert(m(k) == v) }
    assert(m.size == 1 + 4) // D111 + the 4 patches

    // and the constructed map feeds the writer's Disease resolution
    val out = run2(
      ann("Cell_set", "s", "7-u", "HAS_PHENOTYPE", "Disease", "d", "MESH:D111"),
      AnnotationWriter.meshToMondo(raw))
    assert(out(0)._3 == s"$P/MONDO_0000002")
  }
}
