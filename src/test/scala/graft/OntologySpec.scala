package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.OwlSource
import graft.operators.{Dereify, GraphBuilder}

/**
 * OWL ingestion end-to-end (SURVEY.md §2.1 S7, §2.4 A9/A10, §7 step 6):
 * RDF/XML parse → BNode de-reification → graph build, on a hand-authored
 * mini ontology exercising the same constructs as the reference's
 * macrophage integration test (OntologyParserLoaderTestCase.py:448-560):
 * direct subClassOf, an owl:Restriction relation bnode, an owl:Axiom
 * annotation bnode with a dangling literal, multi-valued attributes.
 */
class OntologySpec extends SparkSpec {
  import spark.implicits._

  private val OBO = "http://purl.obolibrary.org/obo/"
  private val OIO = "http://www.geneontology.org/formats/oboInOwl#"

  private val owlXml =
    s"""<?xml version="1.0"?>
       |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
       |         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
       |         xmlns:owl="http://www.w3.org/2002/07/owl#"
       |         xmlns:oboInOwl="$OIO">
       |  <owl:Class rdf:about="${OBO}CL_0000235">
       |    <rdfs:label>macrophage</rdfs:label>
       |    <oboInOwl:hasExactSynonym>histiocyte</oboInOwl:hasExactSynonym>
       |    <oboInOwl:hasDbXref>BTO:0000801</oboInOwl:hasDbXref>
       |    <rdfs:subClassOf rdf:resource="${OBO}CL_0000113"/>
       |    <rdfs:subClassOf>
       |      <owl:Restriction>
       |        <owl:onProperty rdf:resource="${OBO}RO_0002202"/>
       |        <owl:someValuesFrom rdf:resource="${OBO}CL_0000576"/>
       |      </owl:Restriction>
       |    </rdfs:subClassOf>
       |  </owl:Class>
       |  <owl:Axiom>
       |    <owl:annotatedSource rdf:resource="${OBO}CL_0000235"/>
       |    <owl:annotatedProperty rdf:resource="${OIO}hasExactSynonym"/>
       |    <owl:annotatedTarget>histiocyte</owl:annotatedTarget>
       |    <oboInOwl:hasDbXref>PMID:123</oboInOwl:hasDbXref>
       |  </owl:Axiom>
       |  <owl:Class rdf:about="${OBO}CL_0000576">
       |    <rdfs:label>monocyte</rdfs:label>
       |  </owl:Class>
       |  <owl:Class rdf:about="${OBO}CL_0000113">
       |    <rdfs:label>mononuclear phagocyte</rdfs:label>
       |  </owl:Class>
       |</rdf:RDF>""".stripMargin

  private lazy val raw = {
    val rows = OwlSource.parseBytes("mini.owl", owlXml.getBytes("UTF-8")).toSeq
    rows.toDF()
  }

  test("StAX parse emits typed nodes, resource/literal properties, bnodes") {
    val ts = raw.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
    // typing triple from the typed element
    assert(ts.contains((s"${OBO}CL_0000235",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
      "http://www.w3.org/2002/07/owl#Class", "uri", "uri")))
    // literal property
    assert(ts.contains((s"${OBO}CL_0000235",
      "http://www.w3.org/2000/01/rdf-schema#label", "macrophage", "uri", "literal")))
    // resource property
    assert(ts.contains((s"${OBO}CL_0000235",
      "http://www.w3.org/2000/01/rdf-schema#subClassOf", s"${OBO}CL_0000113",
      "uri", "uri")))
    // the restriction bnode: subject of onProperty, object of subClassOf
    val bnodeSubjects = ts.filter(_._4 == "bnode").map(_._1).toSet
    val bnodeObjects = ts.filter(_._5 == "bnode").map(_._3).toSet
    assert(bnodeSubjects.nonEmpty && bnodeObjects.subsetOf(bnodeSubjects))
  }

  test("dereify reconstructs the owl:Restriction relation triple") {
    val (recon, _) = Dereify.dereify(raw)
    val got = recon.collect().map(t => (t.s, t.p, t.o)).toSet
    assert(got.contains((s"${OBO}CL_0000235", s"${OBO}RO_0002202", s"${OBO}CL_0000576")))
  }

  test("dereify reconstructs the owl:Axiom annotation and re-emits its literal bucket") {
    val (recon, _) = Dereify.dereify(raw)
    val got = recon.collect().map(t => (t.s, t.p, t.o)).toSet
    assert(got.contains((s"${OBO}CL_0000235", s"${OIO}hasExactSynonym", "histiocyte")))
    assert(got.contains((s"${OBO}CL_0000235", s"${OIO}hasDbXref", "PMID:123")))
  }

  test("bnode type triples and incomplete sets land in ignored") {
    val (_, ignored) = Dereify.dereify(raw)
    // the rdf:type owl:Restriction / owl:Axiom triples are class-bucket
    assert(ignored.collect().exists(_.p.endsWith("#type")))
  }

  test("full pipeline: triples -> graph matches the macrophage expectation shape") {
    val tuples = Dereify.triples(raw)
      .withColumn("lit", lit(null).cast("string"))
      .withColumn("ord", monotonically_increasing_id())
      .select("s", "p", "o", "lit", "ord")
    val ro = Seq(("RO_0002202", "develops from")).toDF("term", "label")
    val v = GraphBuilder.vertices(tuples, Some(Seq("CL")))
    val e = GraphBuilder.edges(tuples, Some(ro))

    val mac = v.filter($"key" === "0000235").head()
    val attrs = mac.getAs[Map[String, scala.collection.Seq[String]]]("attrs")
    assert(attrs("label") == Seq("macrophage"))
    assert(attrs("hasExactSynonym") == Seq("histiocyte")) // deduped
    assert(attrs("hasDbXref").toSet == Set("BTO:0000801", "PMID:123"))

    val edges = e.select("from_key", "to_key", "label").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(edges.contains(("0000235", "0000113", "subClassOf")))
    assert(edges.contains(("0000235", "0000576", "develops from"))) // RO label join
  }

  test("readOwl reads files through the binaryFile source") {
    val dir = Files.createTempDirectory("owl")
    Files.write(dir.resolve("mini.owl"), owlXml.getBytes("UTF-8"))
    val df = OwlSource.readOwl(spark, dir.toString + "/*.owl")
    assert(df.count() == raw.count())
  }

  test("labels extracts the term->label map") {
    val l = Dereify.labels(raw).as[(String, String)].collect().toMap
    assert(l("CL_0000576") == "monocyte")
  }

  test("dereify: wrong-count and missing-role sets divert to ignored") {
    import graft.sources.OwlSource.RawTriple
    val OBO2 = "http://purl.obolibrary.org/obo/"
    // bnode b1: only 2 relation-bucket triples -> ignored
    // bnode b2: 3 relation triples but two subClassOf, no someValuesFrom
    //           -> reconstruct fails, all 3 ignored
    val rows = Seq(
      RawTriple(s"${OBO2}CL_1", "http://www.w3.org/2000/01/rdf-schema#subClassOf", "_:b1", "uri", "bnode"),
      RawTriple("_:b1", "http://www.w3.org/2002/07/owl#onProperty", s"${OBO2}RO_1", "bnode", "uri"),
      RawTriple(s"${OBO2}CL_2", "http://www.w3.org/2000/01/rdf-schema#subClassOf", "_:b2", "uri", "bnode"),
      RawTriple(s"${OBO2}CL_3", "http://www.w3.org/2000/01/rdf-schema#subClassOf", "_:b2", "uri", "bnode"),
      RawTriple("_:b2", "http://www.w3.org/2002/07/owl#onProperty", s"${OBO2}RO_1", "bnode", "uri")
    ).toDF()
    val (recon, ignored) = Dereify.dereify(rows)
    assert(recon.count() == 0)
    assert(ignored.count() == 5)
  }

  test("dereify: failed annotation set drags its literal bucket to ignored") {
    import graft.sources.OwlSource.RawTriple
    val rows = Seq(
      // annotation bucket has only 1 triple -> invalid
      RawTriple("_:a1", "http://www.w3.org/2002/07/owl#annotatedSource",
        "http://purl.obolibrary.org/obo/CL_9", "bnode", "uri"),
      // its literal-bucket companion must be ignored too (:554-556)
      RawTriple("_:a1", "http://www.geneontology.org/formats/oboInOwl#hasDbXref",
        "PMID:1", "bnode", "literal")
    ).toDF()
    val (recon, ignored) = Dereify.dereify(rows)
    assert(recon.count() == 0)
    assert(ignored.count() == 2)
    assert(ignored.collect().exists(_.o == "PMID:1"))
  }

  test("X11 oboVersion: versionInfo, versionIRI fallback, and absent") {
    assumeReference("src/test/data/obo")
    val dir = referencePath("src/test/data/obo")
    def versionOf(f: String): Option[String] = {
      val raw = OwlSource.readOwl(spark, s"$dir/$f")
      OwlSource.oboVersion(raw).collect().headOption.flatMap(r => Option(r.getString(1)))
    }
    assert(versionOf("version-info-test.owl") == Some("2024-01-15"))
    // macrophage.owl has a versionIRI release date
    assert(versionOf("macrophage.owl") == Some("2024-09-26"))
    assert(versionOf("no-version-test.owl").isEmpty)
  }

  test("S8 refresh lifecycle: install, archive-and-swap, keep-current") {
    import graft.sources.OboRefresh
    import java.nio.file.Files
    def owl(version: Option[String], marker: String): Array[Byte] =
      s"""<?xml version="1.0"?>
         |<rdf:RDF xmlns:owl="http://www.w3.org/2002/07/owl#"
         |     xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
         |    <owl:Ontology rdf:about="http://purl.obolibrary.org/obo/$marker.owl">
         |${version.map(v => s"        <owl:versionInfo>$v</owl:versionInfo>").getOrElse("")}
         |    </owl:Ontology>
         |</rdf:RDF>
         |""".stripMargin.getBytes("UTF-8")
    val dir = Files.createTempDirectory("obo-refresh")
    val cur = dir.resolve("cl.owl")
    val cand = dir.resolve("cl-new.owl")
    val archive = dir.resolve(".archive")

    // no current file: candidate is installed
    Files.write(cand, owl(Some("2024-01-15"), "a"))
    assert(OboRefresh.refresh(cand, cur, archive) == OboRefresh.Installed)
    assert(Files.exists(cur) && !Files.exists(cand))
    assert(OboRefresh.findVersion(cur) == Some("2024-01-15"))

    // newer candidate: old file archived under its version, new swapped in
    Files.write(cand, owl(Some("2024-09-26"), "b"))
    OboRefresh.refresh(cand, cur, archive) match {
      case OboRefresh.Replaced(archived) =>
        assert(archived.getFileName.toString == "cl-2024-01-15.owl")
        assert(OboRefresh.findVersion(archived) == Some("2024-01-15"))
      case other => fail(s"expected Replaced, got $other")
    }
    assert(OboRefresh.findVersion(cur) == Some("2024-09-26"))

    // same/older candidate: discarded, current untouched
    Files.write(cand, owl(Some("2024-01-15"), "c"))
    assert(OboRefresh.refresh(cand, cur, archive) == OboRefresh.KeptCurrent)
    assert(!Files.exists(cand))
    assert(OboRefresh.findVersion(cur) == Some("2024-09-26"))

    // unversioned candidate sorts lowest -> never replaces a versioned one
    Files.write(cand, owl(None, "d"))
    assert(OboRefresh.refresh(cand, cur, archive) == OboRefresh.KeptCurrent)
  }

  test("S8 download leg: loopback GET, failure leaves no candidate, stale .part from a killed run is overwritten") {
    import graft.sources.{LoopbackApi, OboRefresh}
    import java.nio.file.Files
    def owl(version: String): String =
      s"""<?xml version="1.0"?>
         |<rdf:RDF xmlns:owl="http://www.w3.org/2002/07/owl#"
         |     xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
         |    <owl:Ontology rdf:about="http://purl.obolibrary.org/obo/cl.owl">
         |        <owl:versionInfo>$version</owl:versionInfo>
         |    </owl:Ontology>
         |</rdf:RDF>
         |""".stripMargin
    val dir = Files.createTempDirectory("obo-download")
    val cur = dir.resolve("cl.owl")
    val cand = dir.resolve("cl.owl.new")
    val archive = dir.resolve(".archive")
    val api = new LoopbackApi({
      case "cl.owl" => Some(owl("2026-02-03"))
      case _        => None
    })
    try {
      // a 500 upstream: no candidate, no .part left behind
      assert(!OboRefresh.download(s"${api.base}/missing.owl", cand))
      assert(!Files.exists(cand))
      assert(!Files.exists(dir.resolve("cl.owl.new.part")))
      // a transport error (closed port): same containment
      assert(!OboRefresh.download("http://127.0.0.1:1/cl.owl", cand, 500))
      assert(!Files.exists(cand))
      // kill-mid-download simulation: a stale torn .part from a dead
      // run must be truncated by the restart, never installed
      Files.writeString(dir.resolve("cl.owl.new.part"), "<rdf:RDF torn")
      assert(OboRefresh.download(s"${api.base}/cl.owl", cand))
      assert(!Files.exists(dir.resolve("cl.owl.new.part")))
      assert(OboRefresh.findVersion(cand) == Some("2026-02-03"))
      Files.delete(cand)
      // the one-call lifecycle: install, then same-version keep
      assert(OboRefresh.downloadAndRefresh(s"${api.base}/cl.owl", cur, archive)
        == Some(OboRefresh.Installed))
      assert(OboRefresh.findVersion(cur) == Some("2026-02-03"))
      assert(OboRefresh.downloadAndRefresh(s"${api.base}/cl.owl", cur, archive)
        == Some(OboRefresh.KeptCurrent))
      // a failed refresh download keeps serving the installed copy
      assert(OboRefresh.downloadAndRefresh(s"${api.base}/missing.owl", cur,
        archive).isEmpty)
      assert(OboRefresh.findVersion(cur) == Some("2026-02-03"))
    } finally api.close()
  }

  test("S8 findVersion agrees with oboVersion on the reference fixtures") {
    assumeReference("src/test/data/obo")
    import graft.sources.OboRefresh
    import java.nio.file.Paths
    val dir = referencePath("src/test/data/obo")
    assert(OboRefresh.findVersion(Paths.get(dir, "version-info-test.owl"))
      == Some("2024-01-15"))
    assert(OboRefresh.findVersion(Paths.get(dir, "macrophage.owl"))
      == Some("2024-09-26"))
    assert(OboRefresh.findVersion(Paths.get(dir, "no-version-test.owl")).isEmpty)
  }
}
