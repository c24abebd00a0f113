package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.writers._

/**
 * Byte-for-byte replays of the reference's committed golden summary
 * fixtures (the JSON files under `src/test/data/summaries` — the
 * reference's own test
 * contract: NSForestResultsTupleWriterTestCase.py:20-57,
 * AuthorToClResultsTupleWriterTestCase.py:21-96,
 * ExternalApiResultsTupleWriterTestCase.py:120-400).
 *
 * Each test builds the writer input from the fixture's raw `results`
 * section (the same normalization a loader performs on fetcher JSON), runs
 * the Spark writer, and compares the emitted tuple stream to the fixture's
 * `tuples` EXACTLY — including order and the reference's mixed arities:
 * a relation triple serializes as [s, p, o]; an edge-annotation quadruple
 * as [s, o, p, literal] (the reference's positional form).
 */
class FixtureReplaySpec extends SparkSpec {
  import spark.implicits._

  private def dir = {
    assumeReference("src/test/data/summaries")
    referencePath("src/test/data/summaries")
  }
  private implicit val fmts: Formats = DefaultFormats

  private def fixture(name: String): JValue = JsonMethods.parse(
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/$name")), "UTF-8"))

  /** Writer output (ordered by the global ordinal) → the reference's
    * string-list serialization. */
  private def emitted(df: DataFrame): Seq[List[String]] =
    df.orderBy("ord").select("s", "p", "o", "lit").collect().toSeq.map { r =>
      if (r.isNullAt(3)) List(r.getString(0), r.getString(1), r.getString(2))
      else List(r.getString(0), r.getString(2), r.getString(1), r.getString(3))
    }

  private def expected(j: JValue): List[List[String]] =
    j.extract[List[List[String]]]

  /** Compare with a first-difference diagnostic. */
  private def assertSame(actual: Seq[List[String]], exp: Seq[List[String]]): Unit = {
    actual.zip(exp).zipWithIndex.foreach { case ((a, e), i) =>
      assert(a == e, s"first mismatch at tuple $i:\n  actual  $a\n  expected $e")
    }
    assert(actual.length == exp.length,
      s"tuple count ${actual.length} != expected ${exp.length}")
  }

  /** Python str() of a list of strings. */
  private def pyList(xs: Seq[String]): String =
    if (xs.isEmpty) "[]" else xs.mkString("['", "', '", "']")

  // -------------------------------------------------------------------
  // NSForest results
  // -------------------------------------------------------------------

  test("NSForest writer replays cell-kn-mvp-nsforest-results-li-2023 exactly") {
    val j = fixture("cell-kn-mvp-nsforest-results-li-2023.json")
    val r = j \ "results"
    def s0(k: String) = (r \ k \ "0").extract[String]
    def l0(k: String) = (r \ k \ "0").extract[Long]
    def d0(k: String) = (r \ k \ "0").extract[Double]
    val results = Seq((
      s0("clusterName"), l0("clusterSize"), d0("f_score"), d0("precision"),
      l0("TN"), l0("FP"), l0("FN"), l0("TP"), l0("marker_count"),
      s0("NSForest_markers"), s0("binary_genes"), s0("uuid")
    )).toDF("clusterName", "clusterSize", "f_score", "precision",
      "TN", "FP", "FN", "TP", "marker_count",
      "NSForest_markers", "binary_genes", "uuid")
    val out = NSForestWriter.tuples(results, Nil, withOrd = true)
    assertSame(emitted(out), expected(j \ "tuples"))
  }

  // -------------------------------------------------------------------
  // Author-to-CL mapping (incl. X13 citation assembly)
  // -------------------------------------------------------------------

  test("AuthorToCl writer replays cell-kn-mvp-map-author-to-cl-li-2023 exactly") {
    val j = fixture("cell-kn-mvp-map-author-to-cl-li-2023.json")
    val r = j \ "results"
    def s0(k: String) = (r \ k \ "0").extract[String]
    def l0(k: String) = (r \ k \ "0").extract[Long]
    val results = Seq((
      s0("dataset_version_id"), l0("PMID"), s0("PMCID"), s0("DOI"),
      s0("mapping_method"), s0("author_category"), s0("uberon_entity_id"),
      s0("cell_ontology_id"), s0("match"), s0("author_cell_set"),
      s0("author_cell_term"), l0("clusterSize"), s0("NSForest_markers"),
      s0("binary_genes"), s0("uuid")
    )).toDF("dataset_version_id", "PMID", "PMCID", "DOI", "mapping_method",
      "author_category", "uberon_entity_id", "cell_ontology_id", "match",
      "author_cell_set", "author_cell_term", "clusterSize",
      "NSForest_markers", "binary_genes", "uuid")

    // cellxgene metadata comes from the external-api fixture, keyed by
    // dataset_version_id (as in the reference test setUp)
    val cx = fixture("cell-kn-mvp-external-api-results.json") \
      "results" \ "cellxgene"
    val cxg = cx.extract[Map[String, JValue]].map { case (dv, md) =>
      dv -> md.extract[Map[String, JValue]].collect {
        case (k, JString(v)) => k -> v
      }
    }

    // X13: the publication metadata the reference mocks get_data_for_pmid
    // with is ASSEMBLED here from its raw E-Utilities fields
    val pmid = AuthorToClWriter.pmidMetadata(
      firstAuthor = "Li", nAuthors = 2, journal = "Res Sq",
      title = "Integrated multi-omics single cell atlas of the human retina.",
      year = "2023")

    val out = AuthorToClWriter.tuples(results, cxg, pmid, withOrd = true)
    assertSame(emitted(out), expected(j \ "tuples"))
  }

  // -------------------------------------------------------------------
  // External API: cellxgene
  // -------------------------------------------------------------------

  test("cellxgene writer replays the external-api fixture exactly") {
    val j = fixture("cell-kn-mvp-external-api-results.json")
    val ds = (j \ "results" \ "cellxgene").extract[Map[String, JValue]]
    val keys = Seq("Link_to_publication", "Link_to_CELLxGENE_collection",
      "Link_to_CELLxGENE_dataset", "Dataset_name", "Number_of_cells",
      "Organism", "Tissue", "Disease_status", "Collection_ID",
      "Collection_version_ID", "Dataset_ID", "Dataset_version_ID",
      "Zenodo/Nextflow_workflow/Notebook")
    val schema = StructType(keys.map {
      case "Number_of_cells" => StructField("Number_of_cells", LongType)
      case k => StructField(k, StringType)
    })
    val rows = ds.values.toSeq.map { md =>
      Row.fromSeq(keys.map {
        case "Number_of_cells" => (md \ "Number_of_cells").extract[Long]
        case k => (md \ k).extract[String]
      })
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    val out = ExternalApiWriter.cellxgene(df, withOrd = true)
    assertSame(emitted(out), expected(j \ "tuples" \ "cellxgene"))
  }

  // -------------------------------------------------------------------
  // External API: opentargets (diseases ++ drugs ++ pharmacogenetics)
  // -------------------------------------------------------------------

  test("opentargets writers replay the external-api fixture exactly") {
    val j = fixture("cell-kn-mvp-external-api-results.json")
    val ens = "ENSG00000001626"
    val ot = j \ "results" \ "opentargets" \ ens

    val geneNames = Seq((ens, "CFTR")).toDF("gene_ensembl_id", "gene_name")
    val efo2mondo = Seq(("EFO_0000684", "MONDO_0005087")).toDF("efo", "mondo")
    val chembl2pubchem = Seq(("CHEMBL2010601", "16220172")).toDF("chembl", "pubchem")
    // the opentargets writer's UniProt lookups use the reference test's
    // inline gene_results for Entrez id 1080
    val genes = Seq((ens, "CFTR", "P13569",
      "https://www.uniprot.org/uniprot/P13569"))
      .toDF("gene_ensembl_id", "gene_name", "uniprot_name", "link_to_uniprot")

    // --- diseases, in input list order (row_ord) ---
    val diseases = {
      val rows = (ot \ "diseases").extract[List[JValue]].zipWithIndex.map {
        case (d, i) => Row(ens, (d \ "disease" \ "id").extract[String],
          (d \ "disease" \ "name").extract[String],
          (d \ "disease" \ "description").extract[String],
          (d \ "score").extract[Double], i)
      }
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava),
        StructType(Seq(
          StructField("gene_ensembl_id", StringType),
          StructField("disease_id", StringType),
          StructField("disease_name", StringType),
          StructField("disease_description", StringType),
          StructField("score", DoubleType),
          StructField("row_ord", IntegerType))))
    }

    // --- drugs ---
    val indType = ArrayType(StructType(Seq(
      StructField("disease_id", StringType),
      StructField("max_phase", DoubleType))))
    val drugRows = (ot \ "drugs").extract[List[JValue]].zipWithIndex.map {
      case (d, i) =>
        val drug = d \ "drug"
        val indications = (drug \ "indications") match {
          case JNull | JNothing => null
          case ind => (ind \ "rows").extract[List[JValue]].map(row =>
            Row((row \ "disease" \ "id").extract[String],
              (row \ "maxPhaseForIndication").extract[Double]))
        }
        Row(ens, (d \ "drugId").extract[String],
          (d \ "diseaseId").extract[String],
          (drug \ "maximumClinicalTrialPhase").extract[Double],
          (drug \ "isApproved").extract[Boolean],
          (drug \ "hasBeenWithdrawn").extract[Boolean],
          (drug \ "name").extract[String],
          (d \ "drugType").extract[String],
          (d \ "mechanismOfAction").extract[String],
          (drug \ "description").extract[String],
          (drug \ "synonyms").extract[List[String]],
          (drug \ "tradeNames").extract[List[String]],
          indications,
          (d \ "ctIds").extract[List[String]], i)
    }
    val drugs = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(drugRows).asJava),
      StructType(Seq(
        StructField("gene_ensembl_id", StringType),
        StructField("drug_id", StringType),
        StructField("disease_id", StringType),
        StructField("max_phase", DoubleType),
        StructField("is_approved", BooleanType),
        StructField("has_been_withdrawn", BooleanType),
        StructField("drug_name", StringType),
        StructField("drug_type", StringType),
        StructField("mechanism_of_action", StringType),
        StructField("drug_description", StringType),
        StructField("synonyms", ArrayType(StringType)),
        StructField("trade_names", ArrayType(StringType)),
        StructField("indications", indType),
        StructField("ct_ids", ArrayType(StringType)),
        StructField("row_ord", IntegerType))))

    // --- pharmacogenetics ---
    val pharmaRows = (ot \ "pharmacogenetics").extract[List[JValue]]
      .zipWithIndex.map { case (p, i) =>
        val label = (p \ "variantFunctionalConsequence" \ "label").extract[String]
        Row(ens, (p \ "variantRsId").extract[String],
          (p \ "variantFunctionalConsequenceId").extract[String],
          (p \ "drugs").extract[List[JValue]]
            .map(d => (d \ "drugId").extractOpt[String].orNull),
          (p \ "genotypeId").extract[String],
          (p \ "genotype").extract[String],
          (p \ "phenotypeText").extract[String],
          (p \ "genotypeAnnotationText").extract[String],
          (p \ "evidenceLevel").extract[String],
          (p \ "datasourceId").extract[String],
          (p \ "literature").extract[List[String]],
          s"{'label': '$label'}", // Python str(dict) of the raw field
          i)
      }
    val pharma = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(pharmaRows).asJava),
      StructType(Seq(
        StructField("gene_ensembl_id", StringType),
        StructField("variant_rs_id", StringType),
        StructField("variant_consequence_id", StringType),
        StructField("drugs", ArrayType(StringType)),
        StructField("genotype_id", StringType),
        StructField("genotype", StringType),
        StructField("phenotype_text", StringType),
        StructField("genotype_annotation_text", StringType),
        StructField("evidence_level", StringType),
        StructField("datasource_id", StringType),
        StructField("literature", ArrayType(StringType)),
        StructField("variant_consequence_label", StringType),
        StructField("row_ord", IntegerType))))

    val actual =
      emitted(ExternalApiWriter.openTargetsDiseases(
        diseases, geneNames, efo2mondo, withOrd = true)) ++
      emitted(ExternalApiWriter.openTargetsDrugs(
        drugs, genes, efo2mondo, chembl2pubchem, withOrd = true,
        indicationEfo2Mondo = Map("EFO_0000684" -> "MONDO_0005087"))) ++
      emitted(ExternalApiWriter.openTargetsPharmacogenetics(
        pharma, geneNames, withOrd = true))
    assertSame(actual, expected(j \ "tuples" \ "opentargets"))
  }

  // -------------------------------------------------------------------
  // External API: gene + uniprot
  // -------------------------------------------------------------------

  test("gene writer replays the external-api fixture exactly") {
    val j = fixture("cell-kn-mvp-external-api-results.json")
    val g = j \ "results" \ "gene" \ "1000"
    val keys = Seq("Gene_ID", "Official_symbol", "Official_full_name",
      "Gene_type", "Link_to_UniProt_ID", "Organism", "RefSeq_gene_ID",
      "Also_known_as", "Summary", "UniProt_name",
      "mRNA_(NM)_and_protein_(NP)_sequences")
    // input boundary: values pre-stringified the way Python str() would
    // (a JSON list like Also_known_as becomes "['a', 'b']")
    val vals = keys.map(k => (g \ k) match {
      case JString(s) => s
      case JArray(xs) => pyList(xs.map(_.extract[String]))
      case JNothing | JNull => null
      case other => other.extract[String]
    })
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(Seq(Row.fromSeq(Seq("1000", "CDH2") ++ vals))).asJava),
      StructType(StructField("gene_entrez_id", StringType) ::
        StructField("gene_name", StringType) ::
        keys.map(StructField(_, StringType)).toList))
    val out = ExternalApiWriter.gene(df, withOrd = true)
    assertSame(emitted(out), expected(j \ "tuples" \ "gene"))
  }

  test("uniprot writer replays the external-api fixture exactly") {
    val j = fixture("cell-kn-mvp-external-api-results.json")
    val u = j \ "results" \ "uniprot" \ "P55017"
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(Seq(Row(
          "P55017",
          (u \ "Protein_name").extract[String],
          (u \ "UniProt_ID").extract[String],
          (u \ "Gene_name").extract[String],
          (u \ "Number_of_amino_acids").extract[Long],
          (u \ "Function").extract[String],
          (u \ "Annotation_score").extract[Double],
          (u \ "Organism").extract[String]))).asJava),
      StructType(Seq(
        StructField("protein_accession", StringType),
        StructField("Protein_name", StringType),
        StructField("UniProt_ID", StringType),
        StructField("Gene_name", StringType),
        StructField("Number_of_amino_acids", LongType),
        StructField("Function", StringType),
        StructField("Annotation_score", DoubleType),
        StructField("Organism", StringType))))
    val out = ExternalApiWriter.uniprot(df, withOrd = true)
    assertSame(emitted(out), expected(j \ "tuples" \ "uniprot"))
  }

  // -------------------------------------------------------------------
  // HuBMAP ASCT+B
  // -------------------------------------------------------------------

  test("hubmap writer replays hubmap-allen-brain-v1.7 exactly") {
    val j = fixture("hubmap-allen-brain-v1.7.json")
    val data = j \ "data" \ "hubmap"
    def table(section: String, listKey: String): DataFrame = {
      val rows = (data \ section).extract[List[JValue]].map { e =>
        Row((e \ "id").extractOpt[String].orNull,
          (e \ listKey) match {
            case JArray(xs) => xs.map(_.extract[String])
            case _ => null
          })
      }
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava),
        StructType(Seq(StructField("id", StringType),
          StructField(listKey, ArrayType(StringType)))))
    }
    val structures = table("anatomical_structures", "ccf_part_of")
    val cellTypes = table("cell_types", "ccf_located_in")
    val clId = (data \ "cell_types")(0) \ "id"
    val clTerms = Seq(clId.extract[String].replace(":", "_")).toDF("cl_term")
    val out = ExternalApiWriter.hubmap(structures, cellTypes, clTerms,
      withOrd = true)
    assertSame(emitted(out), expected(j \ "tuples" \ "hubmap"))
  }
}
