package graft

import graft.sources.Reports

/** S13/S14 report sinks (CellKnSchemaUtilities.py:228-298,
  * AnnotationResultsTupleWriter.py:19-90). */
class ReportsSpec extends SparkSpec {
  import spark.implicits._

  test("S13 schema triples report: sections, selection filter, CSV sink") {
    val schema = Seq(
      ("Cell_set", "Gene", "CS t", "EXPRESSES", "Gene t", "CS:1", "RO:1", "SO:1"),
      ("Assay", "Organism", "A t", "USES", "O t", "AS:1", "RO:2", "OB:1"))
      .toDF("Subject Node", "Object Node", "Subject Node Type",
        "Predicate Relation", "Object Node Type", "Subject Node Curie",
        "Predicate Relation Curie", "Object Node Curie")
    val sections = Reports.schemaTriples(schema, Seq("Cell_set")).toMap
    assert(sections("Subjects").as[String].collect().toSeq ==
      Seq("Assay", "Cell_set"))
    assert(sections("Vertices").as[String].collect().toSeq ==
      Seq("Assay", "Cell_set", "Gene", "Organism"))
    // only the triple touching the selected vertex survives
    assert(sections("Triples with Names").collect()
      .map(_.getString(1)).toSeq == Seq("EXPRESSES"))
    assert(sections("Triples with CURIEs").head().getString(2) == "SO:1")
    val dir = java.nio.file.Files.createTempDirectory("s13").toString
    Reports.writeSchemaTriples(schema, Seq("Cell_set"), dir)
    assert(new java.io.File(s"$dir/Triples_with_CURIEs").exists)
  }

  test("S14 annotation components report renders sorted inventories") {
    val ann = Seq(
      ("Cell_set", "set A", "u1", "CONTAINS", "Gene", "ACTB", "g1"),
      ("Cell_set", "set B", "u2", "CONTAINS", "Gene", "TP53", "g2"))
      .toDF("subject_type", "subject_name", "subject_identifier", "relation",
        "object_type", "object_name", "object_identifier")
    val terms = Seq(("Cell_set", "CS:0"), ("Gene", "SO:0000704"))
      .toDF("schema_name", "curie")
    val text = Reports.annotationComponents(ann, terms)
    assert(text.contains("=== Subjects and their CURIE"))
    assert(text.contains("Cell_set, [CS:0]"))
    assert(text.contains("Gene, [SO:0000704]"))
    assert(text.contains("CONTAINS, []")) // relation with no CURIE mapping
    assert(text.contains("Gene: {ACTB, TP53}"))
    assert(text.contains("Cell_set: {u1, u2}"))
  }
}
