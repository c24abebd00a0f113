package graft.writers

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Schema-as-data → tuples (SURVEY.md §1.1, CellKnSchemaUtilities.py:
 * 28-160): the schema workbook's (Subject Node, Predicate Relation,
 * Object Node) rows resolve through the term→CURIE sheet, hand-entered
 * multi-valued cells collapse through a literal patch table, CURIEs swap
 * colon for underscore, and each row emits one (s, p, o) triple.
 *
 * The workbook itself arrives as two small DataFrames (CSV exports —
 * S6: no Excel dependency added); both sides broadcast.
 */
object SchemaWriter {

  import NSForestWriter.PURL

  /** The reference's "contingent anachronism" cell patches
    * (CellKnSchemaUtilities.py:128-146), applied in order. */
  val patches: Seq[(String, String)] = Seq(
    "MONDO:0000001 or MONDO:0021178" -> "MONDO:0000001",
    "PATO:0000068, MONDO:0000001 (disease), or MOND..." -> "PATO:0000068",
    "HsapDv:0000000 or MmusDv:0000000" -> "HsapDv:0000000",
    "EFO:0002772 or EFO:0010183" -> "EFO:0002772",
    "PATO:0000068, MONDO:0000001 (disease), or MONDO:0021178 (injury)" -> "PATO:0000068")

  private def patch(c: Column): Column = {
    val patched = patches.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, Pattern.quote(from), to)
    }
    translate(patched, ":", "_")
  }

  /** Resolve a schema-name column to its CURIE via the terms sheet
    * ("NA" when absent — CellKnSchemaUtilities.py:91-108, first match). */
  def resolveCurie(schema: DataFrame, terms: DataFrame,
                   nameCol: String, curieCol: String): DataFrame = {
    val t = broadcast(terms
      .groupBy(col("schema_name"))
      .agg(first(col("curie")).as("__curie")))
    schema.join(t, col(nameCol) === col("schema_name"), "left")
      .withColumn(curieCol, coalesce(col("__curie"), lit("NA")))
      .drop("schema_name", "__curie")
  }

  /** Emit one triple per schema row from the resolved CURIE columns. */
  def tuples(schema: DataFrame, withOrd: Boolean = true): DataFrame = {
    val rows = schema.select(
      concat(lit(PURL + "/"), patch(col("subject_curie"))).as("s"),
      concat(lit(PURL + "/"), patch(col("predicate_curie"))).as("p"),
      concat(lit(PURL + "/"), patch(col("object_curie"))).as("o"),
      lit(null).cast("string").as("lit"))
    if (withOrd)
      rows.withColumn("ord",
        row_number().over(Window.orderBy("s", "p", "o")) - 1)
    else rows
  }
}
