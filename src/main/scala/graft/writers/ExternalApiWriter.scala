package graft.writers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Terms

/**
 * External-API results → semantic tuples, re-expressing the
 * CELLxGENE and Open Targets sub-writers of
 * ExternalApiResultsTupleWriter.py:96-552 declaratively.
 *
 * Input boundary: the fetcher's nested JSON is normalized into flat
 * tables first (spark.read.json + explode — SURVEY §2.1 S4); writers
 * consume the normalized rows. All vocabulary maps (EFO→MONDO,
 * gene name/Entrez/UniProt, ChEMBL→PubChem) are broadcast joins (J3/J4).
 *
 * F3 thresholds preserved exactly: disease score >= 0.5; drugs
 * maximumClinicalTrialPhase >= 3 AND isApproved AND NOT hasBeenWithdrawn;
 * indications maxPhaseForIndication >= 4
 * (ExternalApiResultsTupleWriter.py:290-293, 343-349, 398-401).
 *
 * Python stringification quirks preserved: booleans as "True"/"False",
 * lists as "['a', 'b']" (str() of Python values).
 */
object ExternalApiWriter {

  import NSForestWriter.{PURL, RDFS}

  private def purl(t: Column): Column = concat(lit(PURL + "/"), t)
  private val nullLit = lit(null).cast("string")
  private def tp(s: Column, p: Column, o: Column): Column =
    struct(s.as("s"), p.as("p"), o.as("o"), nullLit.as("lit"))
  private def qd(s: Column, o: Column, p: Column, l: Column): Column =
    struct(s.as("s"), p.as("p"), o.as("o"), l.cast("string").as("lit"))
  private val emptyTuples =
    array().cast("array<struct<s:string,p:string,o:string,lit:string>>")

  /** Python str() of a boolean. */
  def pyBool(c: Column): Column = when(c, "True").otherwise("False")

  /** Python str() of a list of strings: "['a', 'b']" / "[]". */
  def pyList(c: Column): Column =
    when(size(c) === 0, "[]")
      .otherwise(concat(lit("['"), concat_ws("', '", c), lit("']")))

  /** MONDO resolution (ExternalApiResultsTupleWriter.py:36-63): MONDO ids
    * pass through; EFO ids map via the broadcast table; deprecated →
    * null. Caller joins `efo2mondo(efo, mondo)` and passes the resolved
    * column. */
  def mondoTerm(diseaseId: Column, mappedMondo: Column,
                deprecated: Set[String]): Column = {
    val term = when(diseaseId.contains("MONDO"), diseaseId)
      .when(diseaseId.contains("EFO"), mappedMondo)
    if (deprecated.isEmpty) term
    else when(term.isin(deprecated.toSeq: _*), nullLit).otherwise(term)
  }

  /** CELLxGENE dataset metadata → CSD/PUB tuples
    * (ExternalApiResultsTupleWriter.py:96-185).
    * @param datasets one row per dataset; columns = the 13 metadata keys
    *                 (Number_of_cells long, rest string); the
    *                 Dataset_version_ID column doubles as the map key the
    *                 reference dicts are keyed by */
  def cellxgene(datasets: DataFrame, withOrd: Boolean = true): DataFrame = {
    val keys = Seq("Link_to_publication", "Link_to_CELLxGENE_collection",
      "Link_to_CELLxGENE_dataset", "Dataset_name", "Number_of_cells",
      "Organism", "Tissue", "Disease_status", "Collection_ID",
      "Collection_version_ID", "Dataset_ID", "Dataset_version_ID",
      "Zenodo/Nextflow_workflow/Notebook")
    val csd = purl(concat(lit("CSD_"), col("Dataset_version_ID")))
    val pub = purl(concat(lit("PUB_"), col("Dataset_version_ID")))
    val head = array(
      tp(csd, lit(RDFS + "/dc#Source"), pub),
      qd(csd, pub, lit(RDFS + "#Source"), lit("Manual Mapping")))
    val anns = array(keys.map { k =>
      val v = col(s"`$k`")
      val strV =
        if (k == "Number_of_cells") v.cast("string")
        else regexp_replace(v.cast("string"), "https://", "")
      tp(csd, lit(RDFS + "#" + k.replace(" ", "_")), strV)
    }: _*)
    explodeWithOrd(datasets, concat(head, anns),
      Seq(col("Dataset_version_ID")), withOrd)
  }

  /** Open Targets disease associations → gene/disease tuples
    * (ExternalApiResultsTupleWriter.py:288-337).
    * @param diseases  (gene_ensembl_id, disease_id, disease_name,
    *                  disease_description, score)
    * @param geneNames broadcast (gene_ensembl_id, gene_name) — first name
    *                  per id (J3 "take first" rule)
    * @param efo2mondo broadcast (efo, mondo) */
  def openTargetsDiseases(diseases: DataFrame, geneNames: DataFrame,
                          efo2mondo: DataFrame,
                          deprecated: Set[String] = Set.empty,
                          withOrd: Boolean = true): DataFrame = {
    val joined = diseases
      .join(broadcast(geneNames), Seq("gene_ensembl_id")) // inner: no name -> skip
      .join(broadcast(efo2mondo.select(col("efo"), col("mondo").as("__mondo"))),
        col("disease_id") === col("efo"), "left")
    val mondo = mondoTerm(col("disease_id"), col("__mondo"), deprecated)
    val gs = purl(concat(lit("GS_"), col("gene_name")))
    val md = purl(mondo)
    val rows = joined
      .filter(mondo.isNotNull && col("score") >= 0.5)
    val tuples = array(
      tp(gs, lit(RDFS + "#GENETIC_BASIS_FOR"), md),
      qd(gs, md, lit(RDFS + "#Source"), lit("Open Targets")),
      tp(md, lit(RDFS + "#Name"), col("disease_name").cast("string")),
      tp(md, lit(RDFS + "#Description"), col("disease_description").cast("string")),
      qd(gs, md, lit(RDFS + "#Score"), col("score").cast("string")))
    explodeWithOrd(rows, tuples,
      Seq(col("gene_ensembl_id"), col("disease_id")), withOrd)
  }

  /** Gene-annotation expression section
    * (ExternalApiResultsTupleWriter.py:652-714): the reference iterates
    * UBERON expression tissues, WARNS on deprecated terms, and emits NO
    * tuples (every EXPRESSED_IN append is commented out to resolve its
    * issue 105). The warning side channel is reproduced as data — one row
    * per (gene, deprecated UBERON tissue) — and the tuple output is,
    * faithfully, nothing.
    * @param expressions (gene_ensembl_id, tissue_id) rows */
  def deprecatedExpressionWarnings(expressions: DataFrame,
                                   deprecated: Set[String]): DataFrame = {
    val ub = col("tissue_id")
    val hit = if (deprecated.isEmpty) lit(false)
              else ub.isin(deprecated.toSeq: _*)
    expressions.filter(ub.startsWith("UBERON_") && hit)
      .select(col("gene_ensembl_id"), ub.as("term"),
        concat(lit("Warning: Expression term "), ub, lit(" deprecated"))
          .as("warning"))
  }

  /** Open Targets drug rows → drug/disease/protein/trial tuples
    * (ExternalApiResultsTupleWriter.py:339-516).
    * @param drugs (gene_ensembl_id, drug_id, disease_id, max_phase,
    *              is_approved, has_been_withdrawn, drug_name, drug_type,
    *              mechanism_of_action, drug_description,
    *              synonyms array, trade_names array,
    *              indications array<struct<disease_id,max_phase>>,
    *              ct_ids array)
    * @param genes broadcast (gene_ensembl_id, gene_name, uniprot_name,
    *              link_to_uniprot) — uniprot fields nullable */
  def openTargetsDrugs(drugs: DataFrame, genes: DataFrame,
                       efo2mondo: DataFrame, chembl2pubchem: DataFrame,
                       deprecated: Set[String] = Set.empty,
                       withOrd: Boolean = true,
                       indicationEfo2Mondo: Map[String, String] = Map.empty): DataFrame = {
    val e2m = efo2mondo.select(col("efo"), col("mondo"))
    val joined = drugs
      .join(broadcast(genes), Seq("gene_ensembl_id"))
      .join(broadcast(e2m.withColumnRenamed("mondo", "__mondo")),
        col("disease_id") === col("efo"), "left")
      .join(broadcast(chembl2pubchem.select(col("chembl"),
        col("pubchem").as("__pubchem"))),
        col("drug_id") === col("chembl"), "left")

    val mondo = mondoTerm(col("disease_id"), col("__mondo"), deprecated)
    val chembl = purl(regexp_replace(col("drug_id"), "CHEMBL", "CHEMBL_"))
    val md = purl(mondo)
    val gsName = col("gene_name")
    val src = lit(RDFS + "#Source")
    val ot = lit("Open Targets")

    val rows = joined.filter(mondo.isNotNull && col("max_phase") >= 3 &&
      col("is_approved") && !col("has_been_withdrawn"))

    val head = array(
      tp(chembl, lit(RDFS + "#IS_SUBSTANCE_THAT_TREATS"), md),
      qd(chembl, md, src, ot))

    val protein = when(col("uniprot_name").isNotNull,
      array(
        tp(chembl, lit(RDFS + "#MOLECULARLY_INTERACTS_WITH"),
          purl(concat(lit("PR_"), col("uniprot_name")))),
        qd(chembl, purl(concat(lit("PR_"), col("uniprot_name"))), src,
          lit("Open Targets and UniProt"))))
      .otherwise(emptyTuples)

    // indications with a MONDO resolution and phase >= 4; EFO ids resolve
    // through the same get_mondo_term rule as row-level diseases
    // (ExternalApiResultsTupleWriter.py:396-401) — the (small, broadcast-
    // by-contract) vocabulary is folded into the plan as ONE map literal,
    // so the per-element lookup stays narrow
    val indications = coalesce(
      filter(
        transform(col("indications"), ind => {
          val did = ind.getField("disease_id")
          val viaMap =
            if (indicationEfo2Mondo.isEmpty) nullLit
            else element_at(typedLit(indicationEfo2Mondo), did)
          val term0 = when(did.contains("MONDO"), did)
            .when(did.contains("EFO"), viaMap)
          val indMondo =
            if (deprecated.isEmpty) term0
            else when(term0.isin(deprecated.toSeq: _*), nullLit).otherwise(term0)
          when(indMondo.isNotNull && ind.getField("max_phase") >= 4,
            tp(chembl, lit(RDFS + "#Indications"), indMondo))
        }),
        x => x.isNotNull),
      emptyTuples) // null indications -> skip the section, not the drug

    val trials = coalesce(
      flatten(transform(col("ct_ids"), ct => {
        val nct = purl(regexp_replace(ct, "NCT", "NCT_"))
        array(tp(chembl, lit(RDFS + "#EVALUATED_IN"), nct),
          qd(chembl, nct, src, ot))
      })),
      emptyTuples)

    val anns = array(
      tp(chembl, lit(RDFS + "#Name"), col("drug_name").cast("string")),
      tp(chembl, lit(RDFS + "#Target"), gsName),
      tp(chembl, lit(RDFS + "#Type"), col("drug_type").cast("string")),
      tp(chembl, lit(RDFS + "#Mechanism_of_action"),
        col("mechanism_of_action").cast("string")),
      tp(chembl, lit(RDFS + "#Description"), col("drug_description").cast("string")),
      tp(chembl, lit(RDFS + "#Synonyms"), pyList(col("synonyms"))),
      tp(chembl, lit(RDFS + "#Trade_names"), pyList(col("trade_names"))),
      tp(chembl, lit(RDFS + "#Approved"), pyBool(col("is_approved"))),
      tp(chembl, lit(RDFS + "#Withdrawn"), pyBool(col("has_been_withdrawn"))))

    val pubchem = when(col("__pubchem").isNotNull,
      array(tp(chembl, lit(RDFS + "#Link_to_PubChem_record"),
        concat(lit("pubchem.ncbi.nlm.nih.gov/compound/"), col("__pubchem")))))
      .otherwise(emptyTuples)

    val uniprotLink = when(col("link_to_uniprot").isNotNull,
      array(tp(chembl, lit(RDFS + "#Link_to_UniProt_ID"),
        Terms.stripProtocol(col("link_to_uniprot")))))
      .otherwise(emptyTuples)

    explodeWithOrd(rows,
      concat(head, protein, indications, trials, anns, pubchem, uniprotLink),
      Seq(col("gene_ensembl_id"), col("drug_id"), col("disease_id")), withOrd)
  }

  /** Python str() of a nullable value ("None" when null — the reference
    * stringifies fields that may be missing). */
  def pyStr(c: Column): Column = coalesce(c.cast("string"), lit("None"))

  /** Open Targets pharmacogenetics → mutation tuples
    * (ExternalApiResultsTupleWriter.py:517-652): rows without an rsId are
    * skipped (F5); rs/SO term synthesis; per-drug pharmacological-effect
    * relations (null drugIds skipped); stringified annotations ("None"
    * for missing values, "['123']" for the literature list — Python str()
    * quirks); the variant-consequence label annotation.
    *
    * Optional columns (drugs array, the annotation fields) are emitted
    * when present — callers with relation-only data get the 4-tuple core. */
  def openTargetsPharmacogenetics(rows: DataFrame, geneNames: DataFrame,
                                  withOrd: Boolean = true): DataFrame = {
    val gs = purl(concat(lit("GS_"), col("gene_name")))
    val rs = purl(regexp_replace(col("variant_rs_id"), "rs", "RS_"))
    val so = purl(col("variant_consequence_id"))
    val src = lit(RDFS + "#Source")
    val ot = lit("Open Targets")
    val filtered = rows
      .join(broadcast(geneNames), Seq("gene_ensembl_id"))
      .filter(col("variant_rs_id").isNotNull)

    val core = array(
      tp(gs, lit(RDFS + "#HAS_QUALITY"), rs), qd(gs, rs, src, ot),
      tp(rs, lit(RDFS + "#INVOLVED_IN"), so), qd(rs, so, src, ot))

    val has = rows.columns.toSet
    val drugTuples =
      if (has("drugs"))
        flatten(transform(
          filter(coalesce(col("drugs"), array().cast("array<string>")),
            d => d.isNotNull),
          d => {
            val ch = purl(regexp_replace(d, "CHEMBL", "CHEMBL_"))
            array(tp(rs, lit(RDFS + "#HAS_PHARMACOLOGICAL_EFFECT"), ch),
              qd(rs, ch, src, ot))
          }))
      else emptyTuples

    val anns =
      if (has("genotype_id"))
        array(
          tp(rs, lit(RDFS + "#Genotype_ID"), pyStr(col("genotype_id"))),
          tp(rs, lit(RDFS + "#Genotype"), pyStr(col("genotype"))),
          tp(rs, lit(RDFS + "#Phenotype"), pyStr(col("phenotype_text"))),
          tp(rs, lit(RDFS + "#Genotype_annotation"),
            pyStr(col("genotype_annotation_text"))),
          tp(rs, lit(RDFS + "#Evidence_level"), pyStr(col("evidence_level"))),
          tp(rs, lit(RDFS + "#Source"), pyStr(col("datasource_id"))),
          tp(rs, lit(RDFS + "#Literature"),
            when(col("literature").isNull, "None")
              .otherwise(pyList(col("literature")))),
          tp(so, lit(RDFS + "#Variant_consequence_label"),
            pyStr(col("variant_consequence_label"))))
      else emptyTuples

    explodeWithOrd(filtered, concat(core, drugTuples, anns),
      Seq(col("gene_ensembl_id"), col("variant_rs_id")), withOrd)
  }

  /** E-Utilities gene metadata → GS tuples
    * (ExternalApiResultsTupleWriter.py:715-820): PRODUCES relation when a
    * UniProt name exists, then present-and-truthy key annotations with
    * protocols stripped.
    * @param genes (gene_entrez_id, gene_name, + the 11 metadata key
    *              columns, nullable) */
  def gene(genes: DataFrame, withOrd: Boolean = true): DataFrame = {
    val keys = Seq("Gene_ID", "Official_symbol", "Official_full_name",
      "Gene_type", "Link_to_UniProt_ID", "Organism", "RefSeq_gene_ID",
      "Also_known_as", "Summary", "UniProt_name",
      "mRNA_(NM)_and_protein_(NP)_sequences")
    val gs = purl(concat(lit("GS_"), col("gene_name")))
    val produces = when(col("UniProt_name").isNotNull && col("UniProt_name") =!= "",
      array(
        tp(gs, lit(RDFS + "#PRODUCES"), purl(concat(lit("PR_"), col("UniProt_name")))),
        qd(gs, purl(concat(lit("PR_"), col("UniProt_name"))),
          lit(RDFS + "#Source"), lit("UniProt"))))
      .otherwise(emptyTuples)
    val anns = filter(
      array(keys.map { k =>
        val v = col(s"`$k`")
        when(v.isNotNull && v.cast("string") =!= "",
          tp(gs, lit(RDFS + "#" + k.replace(" ", "_")),
            Terms.stripProtocol(v.cast("string"))))
      }: _*),
      x => x.isNotNull)
    explodeWithOrd(genes, concat(produces, anns),
      Seq(col("gene_entrez_id")), withOrd)
  }

  /** UniProt protein metadata → PR annotations
    * (ExternalApiResultsTupleWriter.py:822-887): present keys only. */
  def uniprot(proteins: DataFrame, withOrd: Boolean = true): DataFrame = {
    val keys = Seq("Protein_name", "UniProt_ID", "Gene_name",
      "Number_of_amino_acids", "Function", "Annotation_score", "Organism")
    val pr = purl(concat(lit("PR_"), col("protein_accession")))
    val anns = filter(
      array(keys.map { k =>
        val v = col(s"`$k`")
        when(v.isNotNull, tp(pr, lit(RDFS + "#" + k.replace(" ", "_")),
          v.cast("string")))
      }: _*),
      x => x.isNotNull)
    explodeWithOrd(proteins, anns, Seq(col("protein_accession")), withOrd)
  }

  /** HuBMAP ASCT+B tables → PART_OF tuples
    * (ExternalApiResultsTupleWriter.py:890-1014).
    * @param structures (id, ccf_part_of array<string>) anatomical rows
    * @param cellTypes  (id, ccf_located_in array<string>) cell-type rows
    * @param clTerms    CL terms seen in author→CL results (J10 semi-join
    *                   set, LoaderUtilities.py:42-62) */
  def hubmap(structures: DataFrame, cellTypes: DataFrame,
             clTerms: DataFrame, withOrd: Boolean = true): DataFrame = {
    val src = lit(RDFS + "#Source")
    val hb = lit("HuBMAP")

    // anatomical: UBERON subject, each UBERON member of ccf_part_of
    val sU = translate(col("id"), ":", "_")
    val anat = structures
      .filter(col("id").isNotNull && col("ccf_part_of").isNotNull)
      .filter(sU.contains("UBERON"))
      .select(col("id"), posexplode(col("ccf_part_of")).as(Seq("pos0", "o_id")))
      .filter(col("o_id").contains("UBERON"))
      .select(col("id"), col("pos0"),
        purl(translate(col("id"), ":", "_")).as("__s"),
        purl(translate(col("o_id"), ":", "_")).as("__o"))

    val anatTuples = array(
      tp(col("__s"), lit(RDFS + "#PART_OF"), col("__o")),
      qd(col("__s"), col("__o"), src, hb))

    // cell types: CL (not PCL) subjects kept only when present in the
    // author→CL term set (left semi-join — J10)
    val cT = translate(col("id"), ":", "_")
    val cells = cellTypes
      .filter(col("id").isNotNull && col("ccf_located_in").isNotNull)
      .filter(cT.contains("CL") && !cT.contains("PCL"))
      .join(broadcast(clTerms.select(col("cl_term"))),
        cT === col("cl_term"), "left_semi")
      .select(col("id"), posexplode(col("ccf_located_in")).as(Seq("pos0", "o_id")))
      .filter(col("o_id").contains("UBERON"))
      .select(col("id"), col("pos0"),
        purl(translate(col("id"), ":", "_")).as("__s"),
        purl(translate(col("o_id"), ":", "_")).as("__o"))

    val a = explodeWithOrd2(anat, anatTuples, Seq(lit(0), col("id"), col("pos0")), withOrd = false)
    val c = explodeWithOrd2(cells, anatTuples, Seq(lit(1), col("id"), col("pos0")), withOrd = false)
    val all = a.unionByName(c)
    if (withOrd) {
      val w = Window.orderBy(col("__k0"), col("__k1"), col("__k2"), col("pos"))
      all.withColumn("ord", row_number().over(w) - 1)
        .drop("__k0", "__k1", "__k2")
    } else all.drop("__k0", "__k1", "__k2")
  }

  /** Like explodeWithOrd but keeps the key columns for a caller-side
    * cross-section ordering (hubmap orders anatomical before cell-type). */
  private def explodeWithOrd2(rows: DataFrame, tuples: Column,
                              orderCols: Seq[Column], withOrd: Boolean): DataFrame = {
    val keyed = rows.select(orderCols.zipWithIndex.map {
      case (c, i) => c.as(s"__k$i")
    } :+ posexplode(tuples).as(Seq("pos", "t")): _*)
    keyed.select(
      keyed.columns.filter(_.startsWith("__k")).map(col) ++
        Seq(col("pos"), col("t.s"), col("t.p"), col("t.o"), col("t.lit")): _*)
  }

  private def explodeWithOrd(rows: DataFrame, tuples: Column,
                             orderCols: Seq[Column], withOrd: Boolean): DataFrame = {
    // a caller-provided `row_ord` column overrides the default order keys:
    // the reference emits in INPUT row order (iterrows / list order), which
    // the golden-fixture replays reproduce exactly
    val effCols =
      if (rows.columns.contains("row_ord")) Seq(col("row_ord")) else orderCols
    val keyed = rows.select(effCols.zipWithIndex.map {
      case (c, i) => c.as(s"__k$i")
    } :+ posexplode(tuples).as(Seq("pos", "t")): _*)
    val flat = keyed.select(
      keyed.columns.filter(_.startsWith("__k")).map(col) ++
        Seq(col("pos"), col("t.s"), col("t.p"), col("t.o"), col("t.lit")): _*)
    val out =
      if (withOrd) {
        val keys = flat.columns.filter(_.startsWith("__k")).map(col) :+ col("pos")
        flat.withColumn("ord", row_number().over(Window.orderBy(keys: _*)) - 1)
      } else flat
    out.drop(out.columns.filter(_.startsWith("__k")): _*)
  }
}
