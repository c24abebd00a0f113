package graft

import org.apache.spark.sql.functions.expr
import graft.writers.ExternalApiWriter

/** CELLxGENE + Open Targets sub-writers: F3 thresholds, MONDO/EFO
  * resolution, Python stringification quirks, per-resource loops.
  * Mirrors ExternalApiResultsTupleWriterTestCase.py:122-387 shapes. */
class ExternalApiWriterSpec extends SparkSpec {
  import spark.implicits._

  private val P = "http://purl.obolibrary.org/obo"
  private val R = "http://www.w3.org/1999/02/22-rdf-syntax-ns"

  test("cellxgene: CSD->PUB relation + 13 annotations, https stripped, ints stringified") {
    val ds = Seq(("https://doi.org/x", "https://cxg/c", "https://cxg/d",
      "Retina", 3177310L, "Homo sapiens", "retina", "normal", "c1", "cv1",
      "d1", "dv1", "TBC"))
      .toDF("Link_to_publication",
        "Link_to_CELLxGENE_collection", "Link_to_CELLxGENE_dataset",
        "Dataset_name", "Number_of_cells", "Organism", "Tissue",
        "Disease_status", "Collection_ID", "Collection_version_ID",
        "Dataset_ID", "Dataset_version_ID", "Zenodo/Nextflow_workflow/Notebook")
    val ts = ExternalApiWriter.cellxgene(ds).orderBy("ord")
      .select("s", "p", "o", "lit").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(ts.length == 15)
    assert(ts(0) == (s"$P/CSD_dv1", s"$R/dc#Source", s"$P/PUB_dv1", null))
    assert(ts(1) == (s"$P/CSD_dv1", s"$R#Source", s"$P/PUB_dv1", "Manual Mapping"))
    assert(ts(2) == (s"$P/CSD_dv1", s"$R#Link_to_publication", "doi.org/x", null))
    assert(ts(6) == (s"$P/CSD_dv1", s"$R#Number_of_cells", "3177310", null))
    assert(ts(14)._2 == s"$R#Zenodo/Nextflow_workflow/Notebook")
  }

  private val geneNames = Seq(("ENSG1", "CD19")).toDF("gene_ensembl_id", "gene_name")
  private val e2m = Seq(("EFO_0000270", "MONDO_0004979")).toDF("efo", "mondo")

  test("diseases: score threshold, EFO->MONDO map, MONDO passthrough") {
    val d = Seq(
      ("ENSG1", "MONDO_0005148", "t2d", "a disease", 0.9),   // kept
      ("ENSG1", "EFO_0000270", "asthma", "airway", 0.7),     // mapped, kept
      ("ENSG1", "MONDO_0000001", "low", "low score", 0.4),   // F3 drop
      ("ENSG1", "EFO_9999999", "unmapped", "no mondo", 0.9)  // unmapped drop
    ).toDF("gene_ensembl_id", "disease_id", "disease_name",
      "disease_description", "score")
    val ts = ExternalApiWriter.openTargetsDiseases(d, geneNames, e2m)
      .orderBy("ord").select("s", "p", "o", "lit").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(ts.length == 10) // 2 kept rows x 5 tuples
    val kept = ts.map(_._3).toSet
    assert(kept.contains(s"$P/MONDO_0005148"))
    assert(ts.exists(t => t._3 == s"$P/MONDO_0004979")) // EFO mapped
    assert(ts.exists(t => t._2 == s"$R#Score" && t._4 == "0.9"))
    assert(!ts.exists(_._3.contains("MONDO_0000001")))
  }

  test("drugs: phase/approval gates, CHEMBL_ naming, python str quirks, trials") {
    val drugs = Seq(
      ("ENSG1", "CHEMBL25", "MONDO_0005148", 4L, true, false, "ASPIRIN",
        "small molecule", "inhibitor", "acetyl...", Seq("asa"),
        Seq("Aspirin"), Seq(("MONDO_0005148", 4L), ("MONDO_0001", 2L)),
        Seq("NCT123")),
      ("ENSG1", "CHEMBL99", "MONDO_0005148", 2L, true, false, "LOWPHASE",
        "sm", "x", "y", Seq[String](), Seq[String](),
        Seq[(String, Long)](), Seq[String]())  // phase gate drop
    ).toDF("gene_ensembl_id", "drug_id", "disease_id", "max_phase",
      "is_approved", "has_been_withdrawn", "drug_name", "drug_type",
      "mechanism_of_action", "drug_description", "synonyms", "trade_names",
      "indications_raw", "ct_ids")
      .withColumn("indications", expr(
        "transform(indications_raw, x -> struct(x._1 AS disease_id, x._2 AS max_phase))"))
    val genes = Seq(("ENSG1", "CD19", "CD19_HUMAN", "https://uniprot.org/P15391"))
      .toDF("gene_ensembl_id", "gene_name", "uniprot_name", "link_to_uniprot")
    val c2p = Seq(("CHEMBL25", "2244")).toDF("chembl", "pubchem")
    val ts = ExternalApiWriter.openTargetsDrugs(drugs, genes, e2m, c2p)
      .orderBy("ord").select("s", "p", "o", "lit").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val ch = s"$P/CHEMBL_25"
    assert(ts.forall(_._1 == ch)) // low-phase drug dropped entirely
    assert(ts(0) == (ch, s"$R#IS_SUBSTANCE_THAT_TREATS", s"$P/MONDO_0005148", null))
    assert(ts.exists(t => t._2 == s"$R#MOLECULARLY_INTERACTS_WITH" &&
      t._3 == s"$P/PR_CD19_HUMAN"))
    assert(ts.exists(t => t._2 == s"$R#Indications" && t._3 == "MONDO_0005148"))
    assert(!ts.exists(t => t._2 == s"$R#Indications" && t._3 == "MONDO_0001"))
    assert(ts.exists(t => t._2 == s"$R#EVALUATED_IN" && t._3 == s"$P/NCT_123"))
    assert(ts.exists(t => t._2 == s"$R#Synonyms" && t._3 == "['asa']"))
    assert(ts.exists(t => t._2 == s"$R#Approved" && t._3 == "True"))
    assert(ts.exists(t => t._2 == s"$R#Withdrawn" && t._3 == "False"))
    assert(ts.exists(t => t._2 == s"$R#Link_to_PubChem_record" &&
      t._3 == "pubchem.ncbi.nlm.nih.gov/compound/2244"))
    assert(ts.exists(t => t._2 == s"$R#Link_to_UniProt_ID" &&
      t._3 == "uniprot.org/P15391"))
  }

  test("pharmacogenetics: rs/SO synthesis, null rsId skipped") {
    val rows = Seq(
      ("ENSG1", "rs4244285", "SO_0001583"),
      ("ENSG1", null, "SO_0000001")
    ).toDF("gene_ensembl_id", "variant_rs_id", "variant_consequence_id")
    val ts = ExternalApiWriter.openTargetsPharmacogenetics(rows, geneNames)
      .orderBy("ord").select("s", "p", "o", "lit").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(ts.length == 4)
    assert(ts(0) == (s"$P/GS_CD19", s"$R#HAS_QUALITY", s"$P/RS_4244285", null))
    assert(ts(2) == (s"$P/RS_4244285", s"$R#INVOLVED_IN", s"$P/SO_0001583", null))
  }

  test("gene: PRODUCES when UniProt name present, truthy-key annotations") {
    val g = Seq(
      ("111", "CD19", "111", "CD19", "B-lymphocyte antigen", "protein coding",
        "https://www.uniprot.org/P15391", "human", null, null, null,
        "CD19_HUMAN", null),
      ("222", "XYZ", "222", "XYZ", null, null, null, null, null, null, null,
        null, null) // no uniprot -> no PRODUCES
    ).toDF("gene_entrez_id", "gene_name", "Gene_ID", "Official_symbol",
      "Official_full_name", "Gene_type", "Link_to_UniProt_ID", "Organism",
      "RefSeq_gene_ID", "Also_known_as", "Summary", "UniProt_name",
      "mRNA_(NM)_and_protein_(NP)_sequences")
    val ts = ExternalApiWriter.gene(g).orderBy("ord")
      .select("s", "p", "o", "lit").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val P2 = "http://purl.obolibrary.org/obo"
    val R2 = "http://www.w3.org/1999/02/22-rdf-syntax-ns"
    assert(ts(0) == (s"$P2/GS_CD19", s"$R2#PRODUCES", s"$P2/PR_CD19_HUMAN", null))
    assert(ts.exists(t => t._2 == s"$R2#Link_to_UniProt_ID" &&
      t._3 == "www.uniprot.org/P15391")) // protocol stripped
    assert(!ts.exists(t => t._1 == s"$P2/GS_XYZ" && t._2.endsWith("PRODUCES")))
    assert(ts.exists(t => t._1 == s"$P2/GS_XYZ" && t._2 == s"$R2#Gene_ID"))
  }

  test("uniprot: present-key annotations on the PR term") {
    val u = Seq(("P15391", "B-lymphocyte antigen CD19", "CD19_HUMAN", "CD19",
      556L, null, 5.0, "Homo sapiens"))
      .toDF("protein_accession", "Protein_name", "UniProt_ID", "Gene_name",
        "Number_of_amino_acids", "Function", "Annotation_score", "Organism")
    val ts = ExternalApiWriter.uniprot(u).orderBy("ord")
      .select("s", "p", "o").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val P2 = "http://purl.obolibrary.org/obo"
    val R2 = "http://www.w3.org/1999/02/22-rdf-syntax-ns"
    assert(ts.forall(_._1 == s"$P2/PR_P15391"))
    assert(ts.exists(t => t._2 == s"$R2#Number_of_amino_acids" && t._3 == "556"))
    assert(!ts.exists(t => t._2 == s"$R2#Function")) // null key skipped
  }

  test("hubmap: UBERON part-of relations and semi-joined CL located-in") {
    val structures = Seq(
      ("UBERON:0002405", Seq("UBERON:0001009", "FMA:7088")),
      ("FMA:123", Seq("UBERON:0001009"))  // non-UBERON subject skipped
    ).toDF("id", "ccf_part_of")
    val cellTypes = Seq(
      ("CL:0000235", Seq("UBERON:0002405")),
      ("CL:9999999", Seq("UBERON:0002405")), // not in author->CL set
      ("PCL:0000001", Seq("UBERON:0002405")) // PCL excluded
    ).toDF("id", "ccf_located_in")
    val clTerms = Seq("CL_0000235").toDF("cl_term")
    val ts = ExternalApiWriter.hubmap(structures, cellTypes, clTerms)
      .orderBy("ord").select("s", "p", "o", "lit").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val P2 = "http://purl.obolibrary.org/obo"
    val R2 = "http://www.w3.org/1999/02/22-rdf-syntax-ns"
    assert(ts.length == 4) // 1 anat pair + 1 cell pair
    assert(ts(0) == (s"$P2/UBERON_0002405", s"$R2#PART_OF", s"$P2/UBERON_0001009", null))
    assert(ts(1)._4 == "HuBMAP")
    assert(ts(2) == (s"$P2/CL_0000235", s"$R2#PART_OF", s"$P2/UBERON_0002405", null))
  }

  test("pharmacogenetics: drug effects, stringified annotations with None/list quirks") {
    val rows = Seq(
      ("ENSG1", "rs4244285", "SO_0001583", Seq("CHEMBL1234", null),
        "g1", "AA", null, "poor metabolizer", "1A", "pharmgkb",
        Seq("12345"), "missense_variant")
    ).toDF("gene_ensembl_id", "variant_rs_id", "variant_consequence_id",
      "drugs", "genotype_id", "genotype", "phenotype_text",
      "genotype_annotation_text", "evidence_level", "datasource_id",
      "literature", "variant_consequence_label")
    val ts = ExternalApiWriter.openTargetsPharmacogenetics(rows, geneNames)
      .orderBy("ord").select("s", "p", "o", "lit").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val P2 = "http://purl.obolibrary.org/obo"
    val R2 = "http://www.w3.org/1999/02/22-rdf-syntax-ns"
    val rs = s"$P2/RS_4244285"
    assert(ts(4) == (rs, s"$R2#HAS_PHARMACOLOGICAL_EFFECT", s"$P2/CHEMBL_1234", null))
    assert(ts.count(_._2 == s"$R2#HAS_PHARMACOLOGICAL_EFFECT") == 1) // null drug skipped
    assert(ts.exists(t => t._2 == s"$R2#Phenotype" && t._3 == "None")) // str(None)
    assert(ts.exists(t => t._2 == s"$R2#Literature" && t._3 == "['12345']"))
    assert(ts.exists(t => t._1 == s"$P2/SO_0001583" &&
      t._2 == s"$R2#Variant_consequence_label" && t._3 == "missense_variant"))
  }

  test("expression section warns on deprecated UBERON terms, emits no tuples") {
    // ExternalApiResultsTupleWriter.py:652-714: non-UBERON tissues are
    // skipped, deprecated UBERON tissues warn, and the tuple output is
    // empty (every append is commented out in the reference)
    val rows = Seq(
      ("g1", "UBERON_0002048"), // deprecated -> warning
      ("g1", "UBERON_0000955"), // fine -> silent
      ("g2", "CL_0000000"),     // not UBERON -> skipped before the check
      ("g2", "UBERON_0002048")  // deprecated -> warning
    ).toDF("gene_ensembl_id", "tissue_id")
    val w = ExternalApiWriter.deprecatedExpressionWarnings(rows,
      deprecated = Set("UBERON_0002048", "CL_0000000"))
      .orderBy("gene_ensembl_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(w.toSeq == Seq(
      ("g1", "UBERON_0002048", "Warning: Expression term UBERON_0002048 deprecated"),
      ("g2", "UBERON_0002048", "Warning: Expression term UBERON_0002048 deprecated")))
    assert(ExternalApiWriter.deprecatedExpressionWarnings(rows, Set.empty).count() == 0)
  }
}
