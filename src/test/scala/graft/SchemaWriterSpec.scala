package graft

import graft.writers.SchemaWriter

class SchemaWriterSpec extends SparkSpec {
  import spark.implicits._

  private val P = "http://purl.obolibrary.org/obo"

  test("resolveCurie maps names with NA default and first-match-wins") {
    val schema = Seq(("Cell type", "x"), ("Unknown thing", "y"))
      .toDF("subject_name", "other")
    val terms = Seq(("Cell type", "CL:0000000"), ("Cell type", "CL:DUPE"))
      .toDF("schema_name", "curie")
    val r = SchemaWriter.resolveCurie(schema, terms, "subject_name", "subject_curie")
      .select("subject_name", "subject_curie").as[(String, String)]
      .collect().toMap
    assert(r("Cell type") == "CL:0000000")
    assert(r("Unknown thing") == "NA")
  }

  test("tuples applies cell patches and colon swap, emits one triple per row") {
    val schema = Seq(
      ("CL:0000000", "RO:0000056", "MONDO:0000001 or MONDO:0021178"),
      ("UBERON:0001062", "BFO:0000050", "PATO:0000068, MONDO:0000001 (disease), or MONDO:0021178 (injury)")
    ).toDF("subject_curie", "predicate_curie", "object_curie")
    val ts = SchemaWriter.tuples(schema).orderBy("ord")
      .select("s", "p", "o").as[(String, String, String)].collect()
    assert(ts(0) == (s"$P/CL_0000000", s"$P/RO_0000056", s"$P/MONDO_0000001"))
    assert(ts(1) == (s"$P/UBERON_0001062", s"$P/BFO_0000050", s"$P/PATO_0000068"))
  }
}
