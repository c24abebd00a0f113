package graft

import org.apache.spark.sql.functions._
import graft.operators.SearchIndex

/** N1-N3 analyzer/view lifecycle beyond the q29/q30 gates: the persisted
  * bucketed postings table and its delete/recreate management
  * (ArangoDbUtilities.py:209-358). */
class SearchIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val verts = Seq(
    ("CL", "c1", "naïve T cell"),
    ("CL", "c2", "macrophage"),
    ("ZZZ", "z1", "macrophage decoy"),
    ("GS", "g1", "interferon")
  ).toDF("collection", "key", "label")

  private val fields: Map[String, org.apache.spark.sql.Column => org.apache.spark.sql.Column] =
    Map("label" -> (c => SearchIndex.edgeNgramTokens(c)))

  test("codegen analyzers are value-identical to the HOF formulations") {
    val texts = Seq("naïve T cell", "ab", "", "macrophage activation marker",
      "東京 データ x", "ALL-CAPS and/or punct.,chars")
      .toDF("t")
    val r = texts.select(
        SearchIndex.charNgrams($"t").as("cn"),
        SearchIndex.charNgramsHof($"t").as("cnH"),
        SearchIndex.charNgrams($"t", 2, 5, preserveOriginal = false).as("cn2"),
        SearchIndex.charNgramsHof($"t", 2, 5, preserveOriginal = false).as("cn2H"),
        SearchIndex.edgeNgramTokens($"t").as("en"),
        SearchIndex.edgeNgramTokensHof($"t").as("enH"))
      .as[(Seq[String], Seq[String], Seq[String], Seq[String], Seq[String], Seq[String])]
      .collect()
    r.foreach { case (cn, cnH, cn2, cn2H, en, enH) =>
      assert(cn == cnH); assert(cn2 == cn2H); assert(en == enH)
    }
  }

  test("view lifecycle: create is bucketed, whitelist filters collections") {
    SearchIndex.createView(verts, Seq("collection", "key"), fields,
      "search_view", buckets = 4,
      collections = Some(Seq("CL", "GS")))
    val view = spark.table("search_view")
    // whitelist applied: the decoy collection is not indexed
    assert(view.filter($"collection" === "ZZZ").count() == 0)
    // accent fold + edge n-grams: 'nai' prefix finds the naïve cell
    val hits = SearchIndex.search(view, Seq("nai", "macroph"))
      .select("key").as[String].collect().toSet
    assert(hits == Set("c1", "c2"))
    // bucketing recorded in the catalog (co-located token joins at scale)
    val ddl = spark.sql("DESCRIBE EXTENDED search_view").collect()
      .map(_.mkString(" ")).mkString("\n")
    assert(ddl.contains("token"), s"expected token bucketing in:\n$ddl")
  }

  test("view lifecycle: recreate overwrites, drop removes, drop is idempotent") {
    SearchIndex.recreateView(verts.filter(!$"label".contains("macroph")),
      Seq("collection", "key"), fields, "search_view2", buckets = 2)
    assert(SearchIndex.search(spark.table("search_view2"), Seq("macroph")).count() == 0)
    SearchIndex.recreateView(verts, Seq("collection", "key"), fields,
      "search_view2", buckets = 2)
    assert(SearchIndex.search(spark.table("search_view2"), Seq("macroph")).count() >= 1)
    SearchIndex.dropView(spark, "search_view2")
    assert(!spark.catalog.tableExists("search_view2"))
    SearchIndex.dropView(spark, "search_view2") // ignore-missing
  }
}
