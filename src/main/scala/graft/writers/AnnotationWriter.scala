package graft.writers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Terms

/**
 * NLP-annotation results → semantic tuples, re-expressing
 * AnnotationResultsTupleWriter.py:93-229 declaratively.
 *
 * X6 (SURVEY §2.8) lives here: per-type term normalization as a single
 * `when` cascade — unicode γδ/minus replacements, CURIE colon→underscore,
 * <skos:related> strip, NLP_dataset→CSD prefix swap, the
 * uppercase-symbol gate on genes, MeSH→MONDO via a broadcast join, and
 * the four hardcoded PMID→DOI publication rewrites as a literal map.
 * Rows whose subject or object normalizes to null are dropped
 * (AnnotationResultsTupleWriter.py:212-213 — F5).
 */
object AnnotationWriter {

  import NSForestWriter.{PURL, RDFS}

  /** The four publication rewrites (AnnotationResultsTupleWriter.py:168-186). */
  val pmidToDoi: Map[String, String] = Map(
    "37824655" -> "PUB_doi.org/10.1126/science.adf6812",
    "37516747" -> "PUB_doi.org/10.1038/s41467-023-40173-5",
    "37291214" -> "PUB_doi.org/10.1038/s41591-023-02327-2",
    "38014002" -> "PUB_doi.org/10.1101/2023.11.07.566105")

  /** Unicode cleanup applied to names (γδ → gamma-delta, − → -). */
  def cleanName(c: Column): Column =
    regexp_replace(regexp_replace(c, "γδ", "gamma-delta"), "−", "-")

  /** Unicode minus cleanup applied to identifiers. */
  def cleanId(c: Column): Column = regexp_replace(c, "−", "-")

  /**
   * X6 — normalize one side ("subject" or "object") of an annotation.
   * `mesh2mondo` must have columns (mesh, mondo); broadcast-joined by the
   * caller ([[tuples]]) — here Disease terms expect a `__mondo` column
   * already resolved for this side.
   */
  def normalizeTerm(side: String, mondoCol: Column): Column = {
    val atype = col(s"${side}_type")
    val name = cleanName(col(s"${side}_name"))
    val id = cleanId(col(s"${side}_identifier"))
    val subjIdPrefix = substring_index(cleanId(col("subject_identifier")), "-", 1)
    when(atype === "Anatomical_structure", Terms.curieToTerm(id))
      .when(atype === "Assay", Terms.curieToTerm(id))
      .when(atype === "Biomarker_combination",
        concat(lit("BMC_"), name, lit("-"), subjIdPrefix))
      .when(atype === "Cell_set",
        concat(lit("CS_"), Terms.hyphenate(name), lit("-"), subjIdPrefix))
      .when(atype === "Cell_set_dataset",
        regexp_replace(id, "NLP_dataset", "CSD"))
      .when(atype === "Cell_type",
        Terms.curieToTerm(regexp_replace(id, "<skos:related>", "")))
      .when(atype === "Disease", mondoCol)
      .when(atype === "Gene",
        when(regexp_replace(name, "Myelin basic protein", "MBP") ===
          upper(regexp_replace(name, "Myelin basic protein", "MBP")),
          concat(lit("GS_"), regexp_replace(name, "Myelin basic protein", "MBP"))))
      .when(atype === "Publication",
        // literal lookup map for the hardcoded PMID→DOI rewrites
        pmidToDoi.foldLeft(lit(null).cast("string")) { case (acc, (pmid, doi)) =>
          when(id === pmid, lit(doi)).otherwise(acc)
        })
  }

  /** The four hardcoded MeSH patches appended to the parsed map
    * (LoaderUtilities.py:860-873; note D003643 maps to an UBERON term). */
  val meshPatches: Seq[(String, String)] = Seq(
    "MESH:D000077192" -> "MONDO_0004991",
    "MESH:D000086382" -> "MONDO_0100096",
    "MESH:D003643" -> "UBERON_0000071",
    "MESH:D005355" -> "MONDO_0002771")

  /** J4 — MeSH→MONDO map CONSTRUCTION from a parsed MONDO ontology
    * (LoaderUtilities.py:825-873): for each named owl:Class, the FIRST
    * MESH-containing hasDbXref in document order (`break` after one); a
    * later class with the same MeSH xref overwrites an earlier one (dict
    * insertion); the four hardcoded patches override everything. Input is
    * the RAW OwlSource triples (pre-dereification — the reference iterates
    * direct class children, so owl:Axiom literal buckets must not
    * contribute). Output: (mesh, mondo) ready for [[tuples]]. */
  def meshToMondo(rawTriples: DataFrame): DataFrame = {
    val spark = rawTriples.sparkSession
    import spark.implicits._
    val xr = rawTriples
      // document order: monotone within a partition, partitions follow
      // the file scan order
      .withColumn("ord", monotonically_increasing_id())
      .filter(col("sKind") === "uri" && col("oKind") === "literal" &&
        col("p") === "http://www.geneontology.org/formats/oboInOwl#hasDbXref" &&
        col("o").contains("MESH"))
      .withColumn("st", Terms.parseTermFull(col("s")))
      .filter(col("st.kind") === "class")
    val firstPerClass = xr
      .groupBy(col("st.term").as("mondo"))
      .agg(min_by(struct(col("o"), col("ord")), col("ord")).as("f"))
      .select(col("f.o").as("mesh"), col("mondo"), col("f.ord").as("ord"))
    val lastPerMesh = firstPerClass
      .groupBy("mesh")
      .agg(max_by(col("mondo"), col("ord")).as("mondo"))
    val patchDf = meshPatches.toDF("mesh", "mondo")
    lastPerMesh.join(patchDf.select("mesh"), Seq("mesh"), "left_anti")
      .unionByName(patchDf)
  }

  /**
   * Annotation rows → tuples: relation triple, Source quad, and a Label
   * triple for Cell_set subjects. Null-normalized rows are dropped (F5).
   *
   * @param annotations rows with subject_/object_ type/name/identifier
   *                    and relation columns
   * @param mesh2mondo  (mesh, mondo) map table, broadcast
   */
  def tuples(annotations: DataFrame, mesh2mondo: DataFrame,
             withOrd: Boolean = true): DataFrame = {
    val m2m = broadcast(mesh2mondo.select(col("mesh"), col("mondo")))

    val withMondo = annotations
      .join(m2m.select(col("mesh").as("__sm"), col("mondo").as("__s_mondo")),
        cleanId(col("subject_identifier")) === col("__sm"), "left")
      .join(m2m.select(col("mesh").as("__om"), col("mondo").as("__o_mondo")),
        cleanId(col("object_identifier")) === col("__om"), "left")

    val subject = normalizeTerm("subject", col("__s_mondo"))
    val objectT = normalizeTerm("object", col("__o_mondo"))

    val s = concat(lit(PURL + "/"), subject)
    val p = concat(lit(RDFS + "#"), col("relation"))
    val o = concat(lit(PURL + "/"), objectT)

    val base = array(
      struct(s.as("s"), p.as("p"), o.as("o"),
        lit(null).cast("string").as("lit")),
      struct(s.as("s"), lit(RDFS + "#Source").as("p"), o.as("o"),
        lit("Manual Annotation").as("lit")))
    val label = when(col("subject_type") === "Cell_set",
      array(struct(s.as("s"), lit(RDFS + "#Label").as("p"),
        cleanName(col("subject_name")).as("o"),
        lit(null).cast("string").as("lit"))))
      .otherwise(array().cast("array<struct<s:string,p:string,o:string,lit:string>>"))

    val rows = withMondo
      .withColumn("__rid", monotonically_increasing_id())
      .filter(subject.isNotNull && objectT.isNotNull)
      .select(col("__rid"), posexplode(concat(base, label)).as(Seq("pos", "t")))
      .select(col("__rid"), col("pos"),
        col("t.s"), col("t.p"), col("t.o"), col("t.lit"))

    if (withOrd) {
      val w = Window.orderBy(col("__rid"), col("pos"))
      rows.withColumn("ord", row_number().over(w) - 1).drop("__rid")
    } else rows.drop("__rid")
  }
}
