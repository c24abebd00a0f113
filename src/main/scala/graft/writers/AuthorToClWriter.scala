package graft.writers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Terms

/**
 * Author-cell-set → Cell Ontology mapping results → semantic tuples,
 * re-expressing AuthorToClResultsTupleWriter.py:23-361 as one narrow
 * transform (same array<struct> + posexplode shape as NSForestWriter).
 *
 * Structure mirrors the reference exactly:
 *  - a HEADER section derived from the first row: per dataset_version_id
 *    ("--"-split, :44), CSD citation/cell-type annotations and PUB
 *    publication annotations from injected PMID metadata (:48-94 — the
 *    E-Utilities fetch is injected as data, like the reference tests mock
 *    it);
 *  - a PER-ROW section for clusters >= MIN_CLUSTER_SIZE: CL/UBERON
 *    relations, dataset exemplar links, cell-set composition, expression
 *    relations, node + edge annotations, and the marker/binary gene
 *    loops (:96-361).
 *
 * Quirk preserved: the reference reads `cellxgene_results[
 * dataset_version_id]` inside the row loop, where the loop variable
 * retains the LAST dataset id from the header loop (:239-247) — the
 * Spark version does the same.
 *
 * Deprecated CL/UBERON terms produce a side-channel DataFrame
 * ([[deprecatedTerms]]) instead of log warnings (F4).
 */
object AuthorToClWriter {

  import NSForestWriter.{PURL, RDFS}

  private def purl(t: Column): Column = concat(lit(PURL + "/"), t)
  private def purlS(t: String): Column = lit(s"$PURL/$t")
  private def rdfsS(t: String): Column = lit(s"$RDFS$t")
  private val nullLit = lit(null).cast("string")

  private def tp(s: Column, p: Column, o: Column): Column =
    struct(s.as("s"), p.as("p"), o.as("o"), nullLit.as("lit"))
  private def qd(s: Column, o: Column, p: Column, l: Column): Column =
    struct(s.as("s"), p.as("p"), o.as("o"), l.cast("string").as("lit"))

  /** PURL → bare term: the reference's urlparse(x).path.replace("/obo/","")
    * (AuthorToClResultsTupleWriter.py:99, 102). */
  private def purlToTerm(c: Column): Column = substring_index(c, "/obo/", -1)

  /**
   * @param results       author→CL mapping rows (FIXTURES.md §3) with the
   *                      NSForest merge applied (uuid, markers, sizes)
   * @param cellxgene     dataset_version_id → (key → value) metadata
   * @param pmidData      E-Utilities publication fields for the file's
   *                      PMID (key → value), e.g. "Citation" → "..."
   * @param withOrd       attach the global emission ordinal
   */
  def tuples(results: DataFrame,
             cellxgene: Map[String, Map[String, String]],
             pmidData: Seq[(String, String)],
             withOrd: Boolean = true): DataFrame = {
    val spark = results.sparkSession

    // header values come from the first row, like the reference's iloc[0]
    val first = results.select("dataset_version_id", "PMID", "PMCID", "DOI",
      "author_category").head()
    val datasetVersionIds = first.getString(0).split("--").toSeq
    val pmid = first.get(1).toString
    val pmcid = first.get(2).toString
    val doi = first.getString(3)
    val authorCategory = first.get(4).toString

    // ----- header tuples (one set per dataset_version_id) -----
    // pmidData is a Seq: the reference iterates pmid_data.keys() in dict
    // INSERTION order (Author, Journal, Title, Year, Citation —
    // E_Utilities.py:90-98), which a Scala Map over 4 entries would not
    // preserve
    val citation = pmidData.collectFirst { case ("Citation", v) => v }.getOrElse("")
    val headerTuples: Seq[Column] = datasetVersionIds.flatMap { dv =>
      val csd = purlS(s"CSD_$dv")
      val pub = purlS(s"PUB_$dv")
      Seq(
        qdless(csd, rdfsS("#Citation"), lit(citation)),
        qdless(csd, rdfsS("#Cell_type"), lit(authorCategory))) ++
        pmidData.map { case (k, v) =>
          val key = k.capitalize.replace(" ", "_")
          qdless(pub, rdfsS(s"#$key"), lit(v))
        } ++ Seq(
        qdless(pub, rdfsS("#PMID"), lit(pmid)),
        qdless(pub, rdfsS("#PMCID"), lit(pmcid)),
        qdless(pub, rdfsS("#DOI"), lit(doi)))
    }

    // reference quirk: the row loop reads cellxgene under the LAST header id
    val lastDv = datasetVersionIds.last
    val cxg = cellxgene.getOrElse(lastDv, Map.empty)
    val cxgKeys = Seq("Link_to_publication", "Link_to_CELLxGENE_collection",
      "Link_to_CELLxGENE_dataset", "Dataset_name")

    // ----- per-row tuples -----
    val clTerm = purlToTerm(col("cell_ontology_id"))
    val ubTerm = purlToTerm(col("uberon_entity_id"))
    val cl = purl(clTerm)
    val ub = purl(ubTerm)
    val cs = concat(lit(PURL + "/CS_"), Terms.hyphenate(col("author_cell_set")),
      lit("-"), col("uuid"))
    val bgs = purl(concat(lit("BGS_"), col("uuid")))
    val manual = lit("Manual Mapping")
    val nsf = lit("NSForest")
    val srcP = rdfsS("#Source")

    val relations = array(
      tp(cl, purlS("BFO_0000050"), ub), qd(cl, ub, srcP, manual),
      tp(cs, purlS("RO_0001000"), ub), qd(cs, ub, srcP, manual))

    // per dataset: exemplar-data relation AND the cell-set provenance pair
    // (the golden fixture's cs -> /dc#Source -> csd emission,
    // cell-kn-mvp-map-author-to-cl-li-2023.json tuples 16-17)
    val exemplars = array(datasetVersionIds.flatMap { dv =>
      val csd = purlS(s"CSD_$dv")
      Seq(tp(cl, purlS("RO_0015001"), csd), qd(cl, csd, srcP, manual),
        tp(cs, rdfsS("/dc#Source"), csd), qd(cs, csd, srcP, manual))
    }: _*)

    val composition = array(
      tp(cs, purlS("RO_0002473"), cl), qd(cs, cl, srcP, manual),
      tp(cs, purlS("RO_0002292"), bgs), qd(cs, bgs, srcP, nsf))

    val nodeAnn = array(
      Seq(tp(cs, rdfsS("#Author_cell_term"), col("author_cell_term"))) ++
        cxgKeys.map { k =>
          val v = cxg.getOrElse(k, "")
          tp(cs, rdfsS("#" + k.replace(" ", "_")),
            lit(v.replace("https://", "")))
        } ++
        Seq(tp(cs, rdfsS("#Cell_type"), clTerm)): _*)

    val edgeAnn = array(
      qd(cs, cl, rdfsS("#Match"), col("match")),
      qd(cs, cl, rdfsS("#Mapping_method"), col("mapping_method")))

    val markers = Terms.pythonListDecode(col("NSForest_markers"))
    val binary = Terms.pythonListDecode(col("binary_genes"))

    val markerTuples = flatten(transform(markers, g => array(
      tp(purl(concat(lit("GS_"), g)), purlS("BFO_0000050"), cl),
      qd(purl(concat(lit("GS_"), g)), cl, srcP, nsf))))

    val bothGenes = concat(markers, binary)
    val expressTuples = flatten(transform(bothGenes, g => {
      val gs = purl(concat(lit("GS_"), g))
      array(
        tp(cl, rdfsS("#SELECTIVELY_EXPRESS"), gs), qd(cl, gs, srcP, manual),
        tp(gs, purlS("BFO_0000050"), cl), qd(gs, cl, srcP, nsf))
    }))

    val rowTuples = concat(relations, exemplars, composition, nodeAnn,
      edgeAnn, markerTuples, expressTuples)

    val perRow = results.filter(col("clusterSize") >= 10)
      .select(col("author_cell_set").as("__acs"), col("uuid").as("__id"),
        posexplode(rowTuples).as(Seq("pos", "t")))
      .select(col("__acs"), col("__id"), col("pos"),
        col("t.s"), col("t.p"), col("t.o"), col("t.lit"))

    // header rows first (ord < 0 offset), then rows by author_cell_set sort
    // (the reference sorts on author_cell_set, :406-415)
    import spark.implicits._
    val headerDf = spark.range(1).select(
      posexplode(array(headerTuples: _*)).as(Seq("pos", "t")))
      .select(lit("").as("__acs"), lit("").as("__id"), col("pos"),
        col("t.s"), col("t.p"), col("t.o"), col("t.lit"))

    val all = headerDf.unionByName(perRow)
    val out =
      if (withOrd) {
        val w = Window.orderBy(col("__acs"), col("__id"), col("pos"))
        all.withColumn("ord", row_number().over(w) - 1)
      } else all
    out.drop("__acs", "__id")
  }

  /** literal-object triple (header helper; objects are literals here) */
  private def qdless(s: Column, p: Column, o: Column): Column =
    struct(s.as("s"), p.as("p"), o.cast("string").as("o"), nullLit.as("lit"))

  /** X13 — publication metadata + citation assembly from E-Utilities
    * fields (E_Utilities.py:90-98): first author gets " et al." when the
    * author list has more than one entry; Citation = "Author (Year)
    * Journal". Returns the key→value pairs in the reference's dict
    * insertion order, ready for [[tuples]]. */
  def pmidMetadata(firstAuthor: String, nAuthors: Int, journal: String,
                   title: String, year: String): Seq[(String, String)] = {
    val author = if (nAuthors > 1) s"$firstAuthor et al." else firstAuthor
    Seq("Author" -> author, "Journal" -> journal, "Title" -> title,
      "Year" -> year, "Citation" -> s"$author ($year) $journal")
  }

  /** F4 — deprecated-term side channel
    * (AuthorToClResultsTupleWriter.py:99-104): rows whose CL or UBERON
    * term is in the deprecated set, via broadcast isin. */
  def deprecatedTerms(results: DataFrame, deprecated: Set[String]): DataFrame = {
    val cl = purlToTerm(col("cell_ontology_id"))
    val ub = purlToTerm(col("uberon_entity_id"))
    results.select(col("uuid"), cl.as("cl_term"), ub.as("uberon_term"))
      .filter(cl.isin(deprecated.toSeq: _*) || ub.isin(deprecated.toSeq: _*))
  }

  /** J2 — author-mapping merge (AuthorToClResultsTupleWriter.py:404-434):
    * drop the left uuid (right side is the ID authority), inner-join on
    * author_cell_set == clusterName, import uuid/markers/sizes. */
  def mergeNsforest(authorToCl: DataFrame, nsforest: DataFrame): DataFrame =
    authorToCl.drop("uuid").join(
      nsforest.select(col("clusterName"), col("clusterSize"),
        col("NSForest_markers"), col("binary_genes"), col("uuid")),
      col("author_cell_set") === col("clusterName"), "inner")
}
