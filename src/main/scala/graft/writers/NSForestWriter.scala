package graft.writers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Terms

/**
 * NSForest results → semantic tuples, re-expressing the reference's
 * row-loop writer (NSForestResultsTupleWriter.py:20-298) as ONE narrow
 * Spark transform: build an array<struct<s,p,o,lit>> per input row in the
 * exact reference emission order, then posexplode. No driver loop, no
 * shuffle until the optional global-ordinal window.
 *
 * Tuple schema: (s, p, o, lit, ord) — arity-3 triples have lit null;
 * arity-4 edge-annotation quadruples (reference positional form
 * (s, o, p, literal)) are normalized to the same named columns.
 *
 * Semantics preserved:
 *  - clusters below MIN_CLUSTER_SIZE (10) are dropped (LoaderUtilities.py:39);
 *  - cs/bmc/bgs terms synthesized as CS_<hyphenated-cluster>-<uuid>,
 *    BMC_<uuid>, BGS_<uuid> (NSForestResultsTupleWriter.py:59-61);
 *  - markers/binary_genes decoded from stringified Python lists;
 *  - numeric annotations stringified (Literal(str(x)) in the reference);
 *  - median_silhouette emitted only when present AND truthy (non-zero);
 *  - per-row emission order preserved via `pos`; the optional global
 *    `ord` follows the reference's clusterName sort
 *    (NSForestResultsTupleWriter.py:339-341).
 *
 * At scale: everything up to posexplode is per-row codegen; the global
 * ordinal window is a single sort of writer OUTPUT (small relative to
 * input) and can be skipped (withOrd=false) when order doesn't matter.
 */
object NSForestWriter {

  val PURL = "http://purl.obolibrary.org/obo"
  val RDFS = "http://www.w3.org/1999/02/22-rdf-syntax-ns"

  private def purl(t: Column): Column = concat(lit(PURL + "/"), t)
  private def purlS(t: String): Column = lit(s"$PURL/$t")
  private def rdfsS(t: String): Column = lit(s"$RDFS$t")

  private val nullLit = lit(null).cast("string")

  /** Arity-3 triple (object may be a URI or a literal string). */
  private def tp(s: Column, p: Column, o: Column): Column =
    struct(s.as("s"), p.as("p"), o.as("o"), nullLit.as("lit"))

  /** Arity-4 edge-annotation quadruple — reference positional form is
    * (s, o, p, literal); normalized here to named (s, p, o, lit). */
  private def qd(s: Column, o: Column, p: Column, l: Column): Column =
    struct(s.as("s"), p.as("p"), o.as("o"), l.cast("string").as("lit"))

  private val emptyTuples =
    array().cast("array<struct<s:string,p:string,o:string,lit:string>>")

  /**
   * @param results            NSForest results with columns clusterName,
   *                           clusterSize, f_score, precision, TN, FP, FN,
   *                           TP, marker_count, NSForest_markers,
   *                           binary_genes, uuid
   *                           [, median_silhouette]
   * @param datasetVersionIds  ids of the datasets the results derive from
   * @param withOrd            add the global emission ordinal (golden-
   *                           output order contract)
   * @return DataFrame(s, p, o, lit, pos[, ord])
   */
  def tuples(results: DataFrame, datasetVersionIds: Seq[String],
             withOrd: Boolean = true): DataFrame = {
    val markers = Terms.pythonListDecode(col("NSForest_markers"))
    val binary = Terms.pythonListDecode(col("binary_genes"))
    val uuid = col("uuid")
    val clusterName = Terms.hyphenate(col("clusterName"))

    val cs = concat(lit(PURL + "/CS_"), clusterName, lit("-"), uuid)
    val bmc = purl(concat(lit("BMC_"), uuid))
    val bgs = purl(concat(lit("BGS_"), uuid))
    val source = lit("NSForest")
    val srcP = rdfsS("#Source")

    val joinedBinary = concat_ws(" ", binary)
    val joinedMarkers = concat_ws(" ", markers)
    val fScore = col("f_score").cast("string")

    // NSForestResultsTupleWriter.py:66-80
    val head = array(
      tp(bmc, rdfsS("/rdf#type"), purlS("SO_0001260")),
      qd(bmc, purlS("SO_0001260"), srcP, source))

    // gene loop (:84-100): 2 tuples per marker gene, in list order
    val geneTuples = flatten(transform(markers, g => array(
      tp(purl(concat(lit("GS_"), g)), purlS("BFO_0000050"), bmc),
      qd(purl(concat(lit("GS_"), g)), bmc, srcP, source))))

    // :102-135
    val relations = array(
      tp(cs, purlS("RO_0015004"), bmc),
      qd(cs, bmc, srcP, source),
      tp(bmc, purlS("RO_0015003"), bgs),
      qd(bmc, bgs, srcP, source))

    // node annotations (:137-165)
    val nodeAnn = array(
      tp(cs, rdfsS("#F_beta_confidence_score"), fScore),
      tp(cs, rdfsS("#Total_cell_count"), col("clusterSize").cast("string")),
      tp(cs, rdfsS("#Binary_genes"), joinedBinary),
      tp(cs, rdfsS("#Markers"), joinedMarkers))

    // `if median_silhouette:` — present AND truthy (:166-174)
    val silhouette =
      if (results.columns.contains("median_silhouette"))
        when(col("median_silhouette").isNotNull && col("median_silhouette") =!= 0.0,
          array(tp(cs, rdfsS("#Median_silhouette_score"),
            col("median_silhouette").cast("string"))))
          .otherwise(emptyTuples)
      else emptyTuples

    // :176-199
    val moreAnn = array(
      tp(bgs, rdfsS("#Binary_genes"), joinedBinary),
      tp(bmc, rdfsS("#Markers"), joinedMarkers),
      tp(bmc, rdfsS("#F_beta_confidence_score"), fScore))

    // edge annotations cs->bmc (:201-267)
    val edgeAnn = array(
      qd(cs, bmc, lit(PURL + "/#source_algorithm"), lit("NSForest-v4.0_dev")),
      qd(cs, bmc, rdfsS("#F_beta_confidence_score"), fScore),
      qd(cs, bmc, rdfsS("#Precision"), col("precision").cast("string")),
      qd(cs, bmc, rdfsS("#TN"), col("TN").cast("string")),
      qd(cs, bmc, rdfsS("#TP"), col("TP").cast("string")),
      qd(cs, bmc, rdfsS("#FN"), col("FN").cast("string")),
      qd(cs, bmc, rdfsS("#FP"), col("FP").cast("string")),
      qd(cs, bmc, rdfsS("#Marker_count"), col("marker_count").cast("string")))

    // dataset provenance (:269-296), one pair per dataset_version_id
    val csd = datasetVersionIds.flatMap { dv =>
      val csdTerm = purlS(s"CSD_$dv")
      Seq(tp(cs, rdfsS("/dc#Source"), csdTerm),
        qd(cs, csdTerm, srcP, source))
    }
    val csdTuples = if (csd.isEmpty) emptyTuples else array(csd: _*)

    val allTuples = concat(head, geneTuples, relations, nodeAnn, silhouette,
      moreAnn, edgeAnn, csdTuples)

    val filtered = results.filter(col("clusterSize") >= 10)
    val exploded = filtered
      .select(col("clusterName").as("__cn"), col("uuid").as("__id"),
        posexplode(allTuples).as(Seq("pos", "t")))
      .select(col("__cn"), col("__id"), col("pos"),
        col("t.s"), col("t.p"), col("t.o"), col("t.lit"))

    val out =
      if (withOrd) {
        // reference sorts rows by clusterName before emitting — the global
        // ordinal makes that order explicit data (golden-output contract)
        val w = Window.orderBy(col("__cn"), col("__id"), col("pos"))
        exploded.withColumn("ord", row_number().over(w) - 1)
      } else exploded
    out.drop("__cn", "__id")
  }

  /** J1 — silhouette merge (NSForestResultsTupleWriter.py:345-358): inner
    * equi-join on clusterName against the silhouette table, whose join
    * column is NAMED BY THE DATA (first row's cluster_header). The
    * plan-time head() mirrors the reference's data-driven column lookup;
    * results tables are small (one per study). */
  def mergeSilhouette(nsforest: DataFrame, silhouette: DataFrame): DataFrame = {
    val header = nsforest.select("cluster_header").head().getString(0)
    nsforest.join(
      silhouette.select(col(header).as("__sil_key"), col("median_silhouette")),
      col("clusterName") === col("__sil_key"), "inner")
      .drop("__sil_key")
  }
}
