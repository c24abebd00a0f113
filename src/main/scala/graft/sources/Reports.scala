package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/**
 * Report sinks (SURVEY.md §2.1 S13/S14) — the reference's human-facing
 * summaries, computed distributed and materialized small.
 *
 * S13 (CellKnSchemaUtilities.py:228-298): the schema-triples workbook —
 * unique subject/object/vertex classes plus the name- and CURIE-form
 * triples touching a selected vertex set. Sheets become CSV directories
 * (the same no-Excel-dependency stance as SchemaWriter's S6 input side).
 *
 * S14 (AnnotationResultsTupleWriter.py:19-90): the annotation
 * triple-components text report — unique subject/predicate/object types
 * with their CURIEs, and per-type name/identifier inventories. The
 * reference renders Python set iteration order; here every section is
 * SORTED so the report is deterministic under any parallelism.
 */
object Reports {

  /** S13 — the five report sections, keyed by the reference's sheet
    * names. Input columns mirror the workbook: `Subject Node`,
    * `Object Node`, `Subject Node Type`, `Predicate Relation`,
    * `Object Node Type`, `Subject Node Curie`, `Predicate Relation
    * Curie`, `Object Node Curie`. */
  def schemaTriples(schema: DataFrame,
                    selected: Seq[String]): Seq[(String, DataFrame)] = {
    val sel = col("`Subject Node`").isin(selected: _*) ||
      col("`Object Node`").isin(selected: _*)
    Seq(
      "Subjects" -> schema.select(col("`Subject Node`").as("Subjects"))
        .distinct().orderBy("Subjects"),
      "Objects" -> schema.select(col("`Object Node`").as("Objects"))
        .distinct().orderBy("Objects"),
      "Vertices" -> schema.select(col("`Subject Node`").as("Vertices"))
        .union(schema.select(col("`Object Node`")))
        .distinct().orderBy("Vertices"),
      "Triples with Names" -> schema.filter(sel)
        .select(col("`Subject Node Type`"), col("`Predicate Relation`"),
          col("`Object Node Type`")),
      "Triples with CURIEs" -> schema.filter(sel)
        .select(col("`Subject Node Curie`"), col("`Predicate Relation Curie`"),
          col("`Object Node Curie`")))
  }

  /** S13 sink: one CSV directory per sheet. */
  def writeSchemaTriples(schema: DataFrame, selected: Seq[String],
                         path: String): Unit =
    schemaTriples(schema, selected).foreach { case (sheet, df) =>
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("header", true).csv(s"$path/${sheet.replace(' ', '_')}")
    }

  /** S14 — render the annotation components report. Inventories are
    * computed as distributed distincts; only the (small) distinct sets
    * are collected for rendering. */
  def annotationComponents(annotations: DataFrame, terms: DataFrame): String = {
    val curies: Map[String, Seq[String]] = terms
      .groupBy(col("schema_name"))
      .agg(sort_array(collect_set(col("curie"))).as("cs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap

    def distinctOf(c: String): Seq[String] =
      annotations.select(col(c)).distinct().collect()
        .map(_.getString(0)).toSeq.sorted

    // per-type names/identifiers over both tuple ends
    def inventory(field: String): Seq[(String, Seq[String])] =
      annotations.select(col("subject_type").as("t"),
          col(s"subject_$field").as("v"))
        .union(annotations.select(col("object_type"), col(s"object_$field")))
        .groupBy("t").agg(sort_array(collect_set(col("v"))).as("vs"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1))
        .toSeq.sortBy(_._1)

    val sb = new StringBuilder
    def curieSection(title: String, keys: Seq[String]): Unit = {
      sb.append(s"\n=== $title\n\n")
      keys.foreach { k =>
        sb.append(s"$k, ${curies.getOrElse(k, Nil).mkString("[", " ", "]")}\n")
      }
    }
    curieSection("Subjects and their CURIE", distinctOf("subject_type"))
    curieSection("Predicates and their CURIE", distinctOf("relation"))
    curieSection("Objects and their CURIE", distinctOf("object_type"))
    sb.append("\n=== Types and their names\n\n")
    inventory("name").foreach { case (t, vs) =>
      sb.append(s"$t: ${vs.mkString("{", ", ", "}")}\n")
    }
    sb.append("\n=== Types and their identifiers\n\n")
    inventory("identifier").foreach { case (t, vs) =>
      sb.append(s"$t: ${vs.mkString("{", ", ", "}")}\n")
    }
    sb.toString
  }

  /** S14 sink: single text file. */
  def writeAnnotationComponents(annotations: DataFrame, terms: DataFrame,
                                path: String): Unit = {
    val text = annotationComponents(annotations, terms)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), text)
  }
}
