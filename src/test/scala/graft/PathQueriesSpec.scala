package graft

import org.apache.spark.sql.functions._
import graft.operators.PathQueries

/** Path-query semantics (SURVEY.md §2.7, AqlQuerySetBuilder.java):
  * ANY direction, per-position collection constraints, uniqueEdges:path,
  * hierarchy longest-tail, subgraph dedup, enrichment preference. */
class PathQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def verts(rows: (String, String)*) =
    rows.toDF("collection", "key")

  private def edges(rows: (String, String, String, String, String)*) =
    rows.toDF("from_coll", "from_key", "to_coll", "to_key", "label")

  test("1-hop ANY follows edges in BOTH directions") {
    // AQL `FOR v,e,p IN 1 ANY cs` (AqlQuerySetBuilder.java:28-40)
    val v = verts(("CS", "1"), ("GS", "a"), ("GS", "b"))
    val e = edges(
      ("CS", "1", "GS", "a", "x"), // forward from anchor
      ("GS", "b", "CS", "1", "y")) // reverse INTO anchor — must also match
    val p = PathQueries.kHop(v, e, "CS", Seq("GS"))
      .select(element_at($"vertices", 2).getField("key")).as[String]
      .collect().toSet
    assert(p == Set("a", "b"))
  }

  test("per-position collection constraints restrict each hop") {
    val v = verts(("CS", "1"), ("GS", "a"), ("MONDO", "m"), ("PR", "p"))
    val e = edges(
      ("CS", "1", "GS", "a", "x"),
      ("GS", "a", "MONDO", "m", "y"),
      ("GS", "a", "PR", "p", "z")) // wrong collection for hop 2
    val p = PathQueries.kHop(v, e, "CS", Seq("GS", "MONDO"))
      .select(element_at($"vertices", 3).getField("key")).as[String].collect()
    assert(p.toSeq == Seq("m"))
  }

  test("uniqueEdges: the same undirected edge is not traversed twice in one path") {
    // pattern CS->GS->CS can bounce back over the same edge — AQL's
    // default `uniqueEdges: path` forbids exactly that
    val v = verts(("CS", "1"), ("CS", "2"), ("GS", "a"))
    val e = edges(
      ("CS", "1", "GS", "a", "x"),
      ("CS", "2", "GS", "a", "y"))
    val p = PathQueries.kHop(v, e, "CS", Seq("GS", "CS"))
      .select(
        element_at($"vertices", 1).getField("key").as("v0"),
        element_at($"vertices", 3).getField("key").as("v2"))
      .as[(String, String)].collect().toSet
    // 1->a->1 and 2->a->2 would reuse the edge; only the cross pairs remain
    assert(p == Set(("1", "2"), ("2", "1")))
  }

  test("hierarchy extension appends the LONGEST single-label chain") {
    // AqlQuerySetBuilder.java:88-119: OUTBOUND, one label, SORT LENGTH
    // DESC LIMIT 1
    val v = verts(("CS", "1"), ("CL", "a"), ("CL", "b"), ("CL", "c"), ("CL", "d"))
    val e = edges(
      ("CS", "1", "CL", "a", "rel"),
      ("CL", "a", "CL", "b", "SUB_CLASS_OF"),
      ("CL", "b", "CL", "c", "SUB_CLASS_OF"),
      ("CL", "a", "CL", "d", "OTHER")) // wrong label: pruned
    val base = PathQueries.kHop(v, e, "CS", Seq("CL"))
    val p = PathQueries.withHierarchy(base, e, "SUB_CLASS_OF", maxDepth = 8)
      .select(transform($"vertices", x => x.getField("key")))
      .as[Seq[String]].collect()
    assert(p.length == 1)
    assert(p(0) == Seq("1", "a", "b", "c")) // longest chain a->b->c appended
  }

  test("hierarchy extension keeps paths whose last vertex has no outbound chain") {
    val v = verts(("CS", "1"), ("CL", "a"))
    val e = edges(("CS", "1", "CL", "a", "rel"))
    val p = PathQueries.withHierarchy(
      PathQueries.kHop(v, e, "CS", Seq("CL")), e, "SUB_CLASS_OF")
      .select(transform($"vertices", x => x.getField("key")))
      .as[Seq[String]].collect()
    assert(p.length == 1 && p(0) == Seq("1", "a"))
  }

  test("subgraph dedups exploded vertices and edges") {
    // PhenotypeGraphBuilder.java:117-157 without the O(n²) scan
    val v = verts(("CS", "1"), ("CS", "2"), ("GS", "a"))
    val e = edges(
      ("CS", "1", "GS", "a", "x"),
      ("CS", "2", "GS", "a", "y"))
    val paths = PathQueries.kHop(v, e, "CS", Seq("GS"))
    val (vs, es) = PathQueries.subgraph(paths)
    assert(vs.count() == 3) // CS/1, CS/2, GS/a — GS/a once
    assert(es.count() == 2)
  }

  test("enrich prefers the ontology doc and falls back to the path ref") {
    // J11 (PhenotypeGraphBuilder.java:178-191)
    val pathV = verts(("CL", "1"), ("CL", "2"))
    val onto = Seq(("CL", "1", "CL_1", Map("label" -> Seq("one"))))
      .toDF("collection", "key", "term", "attrs")
    val out = PathQueries.enrich(pathV, onto).orderBy("key").collect()
    assert(out(0).getAs[String]("term") == "CL_1") // enriched
    assert(out(1).getAs[String]("term") == "CL_2") // fallback synthesized
    assert(out(1).getAs[Map[String, scala.collection.Seq[String]]]("attrs") == null)
  }
}
