package graft

import graft.writers.AuthorToClWriter

/** Golden-sequence checks for the AuthorToCl writer, expectations derived
  * from AuthorToClResultsTupleWriter.py:23-361 (PMID metadata injected,
  * like the reference test mocks the PubMed call, :50). */
class AuthorToClWriterSpec extends SparkSpec {
  import spark.implicits._

  private val P = "http://purl.obolibrary.org/obo"
  private val R = "http://www.w3.org/1999/02/22-rdf-syntax-ns"

  private def df(size: Long = 100) = Seq((
    "dv1--dv2", 123L, "PMC9", "10.1/x", "manual", "neuron",
    s"$P/UBERON_0000955", s"$P/CL_0000540", "skos:exact",
    "author set A", "author term A", size,
    "['GeneA']", "['GeneB']", "u1"
  )).toDF("dataset_version_id", "PMID", "PMCID", "DOI", "mapping_method",
    "author_category", "uberon_entity_id", "cell_ontology_id", "match",
    "author_cell_set", "author_cell_term", "clusterSize",
    "NSForest_markers", "binary_genes", "uuid")

  private val cxg = Map("dv2" -> Map(
    "Link_to_publication" -> "https://doi.org/10.1/x",
    "Link_to_CELLxGENE_collection" -> "https://cxg.org/c1",
    "Link_to_CELLxGENE_dataset" -> "https://cxg.org/d1",
    "Dataset_name" -> "Brain atlas"))
  private val pmid = Seq("Citation" -> "Doe 2023")

  private def run(d: org.apache.spark.sql.DataFrame) =
    AuthorToClWriter.tuples(d, cxg, pmid).orderBy("ord")
      .select("s", "p", "o", "lit").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))

  test("header: CSD + PUB annotations per '--'-split dataset id") {
    val ts = run(df())
    // 2 ids x (2 CSD + 1 pmidData key + 3 PUB ids) = 12 header tuples
    assert(ts(0) == (s"$P/CSD_dv1", s"$R#Citation", "Doe 2023", null))
    assert(ts(1) == (s"$P/CSD_dv1", s"$R#Cell_type", "neuron", null))
    assert(ts(2) == (s"$P/PUB_dv1", s"$R#Citation", "Doe 2023", null))
    assert(ts(3) == (s"$P/PUB_dv1", s"$R#PMID", "123", null))
    assert(ts(5) == (s"$P/PUB_dv1", s"$R#DOI", "10.1/x", null))
    assert(ts(6)._1 == s"$P/CSD_dv2")
  }

  test("per-row relations, annotations, and gene loops in reference order") {
    val ts = run(df())
    val cl = s"$P/CL_0000540"; val ub = s"$P/UBERON_0000955"
    val cs = s"$P/CS_author-set-A-u1"; val bgs = s"$P/BGS_u1"
    val body = ts.drop(12)
    assert(body(0) == (cl, s"$P/BFO_0000050", ub, null))
    assert(body(1) == (cl, s"$R#Source", ub, "Manual Mapping"))
    assert(body(2) == (cs, s"$P/RO_0001000", ub, null))
    // exemplars + provenance pair for both dataset ids (the golden
    // fixture's cs -> /dc#Source -> csd emission)
    assert(body(4) == (cl, s"$P/RO_0015001", s"$P/CSD_dv1", null))
    assert(body(6) == (cs, s"$R/dc#Source", s"$P/CSD_dv1", null))
    assert(body(7) == (cs, s"$R#Source", s"$P/CSD_dv1", "Manual Mapping"))
    assert(body(8) == (cl, s"$P/RO_0015001", s"$P/CSD_dv2", null))
    assert(body(10) == (cs, s"$R/dc#Source", s"$P/CSD_dv2", null))
    assert(body(12) == (cs, s"$P/RO_0002473", cl, null))
    assert(body(14) == (cs, s"$P/RO_0002292", bgs, null))
    assert(body(15) == (cs, s"$R#Source", bgs, "NSForest"))
    // node annotations: author term, 4 cellxgene keys (https stripped,
    // read under the LAST dataset id), cell type
    assert(body(16) == (cs, s"$R#Author_cell_term", "author term A", null))
    assert(body(17) == (cs, s"$R#Link_to_publication", "doi.org/10.1/x", null))
    assert(body(20) == (cs, s"$R#Dataset_name", "Brain atlas", null))
    assert(body(21) == (cs, s"$R#Cell_type", "CL_0000540", null))
    // edge annotations
    assert(body(22) == (cs, s"$R#Match", cl, "skos:exact"))
    assert(body(23) == (cs, s"$R#Mapping_method", cl, "manual"))
    // marker loop then markers+binary loop
    assert(body(24) == (s"$P/GS_GeneA", s"$P/BFO_0000050", cl, null))
    assert(body(26) == (cl, s"$R#SELECTIVELY_EXPRESS", s"$P/GS_GeneA", null))
    assert(body(30) == (cl, s"$R#SELECTIVELY_EXPRESS", s"$P/GS_GeneB", null))
    // total: 12 header + 24 + 2 markers*2 + 2 genes*4 = 12 + 34
    assert(ts.length == 46)
  }

  test("min-cluster filter drops the row section but keeps the header") {
    val ts = run(df(size = 5))
    assert(ts.length == 12)
  }

  test("deprecated terms surface in the side channel") {
    val d = AuthorToClWriter.deprecatedTerms(df(), Set("CL_0000540"))
    assert(d.count() == 1)
    assert(AuthorToClWriter.deprecatedTerms(df(), Set("CL_X")).count() == 0)
  }

  test("J2 merge drops left uuid and imports right columns") {
    val ns = Seq(("author set A", 100L, "['G']", "['B']", "uuid-right"))
      .toDF("clusterName", "clusterSize", "NSForest_markers", "binary_genes", "uuid")
    val merged = AuthorToClWriter.mergeNsforest(
      Seq(("author set A", "uuid-left")).toDF("author_cell_set", "uuid"), ns)
    assert(merged.select("uuid").head().getString(0) == "uuid-right")
    assert(merged.count() == 1)
  }
}
