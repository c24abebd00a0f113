package graft

import org.apache.spark.sql.functions._
import graft.functions.Terms
import org.scalacheck.Gen

/** Unit tests for the scalar term functions (SURVEY.md §2.8 X1-X13),
  * mirroring the reference's LoaderUtilitiesTestCase cases. */
class TermsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq("x").toDF("v").select(c.as("r")).collect()(0).getString(0)

  test("hyphenate replaces space/underscore/comma/slash and collapses runs") {
    // reference: LoaderUtilities.py:263-284
    def h(s: String): String =
      Seq(s).toDF("v").select(Terms.hyphenate($"v")).head().getString(0)
    assert(h("a b_c,d/e") == "a-b-c-d-e")
    assert(h("a  b") == "a-b")
    assert(h("a _,/b") == "a-b")
    assert(h("plain") == "plain")
    assert(h("") == "")
  }

  test("hyphenate output never contains the replaced chars or runs (property)") {
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '_', ',', '/', '-')))
      .map(_.mkString)
    // one Spark job over 200 generated samples (much faster than per-sample)
    val samples = Iterator.continually(gen.sample).flatten.take(200).toSeq
    val outs = samples.toDF("v").select(Terms.hyphenate($"v"))
      .collect().map(_.getString(0))
    outs.foreach { out =>
      assert(!out.exists(c => c == ' ' || c == '_' || c == ',' || c == '/'))
      assert(!out.contains("--"))
    }
  }

  test("pythonListDecode parses the observed single-quoted list form") {
    // reference: NSForestResultsTupleWriter.py:57-58 (ast.literal_eval)
    val r = Seq("['SLC12A7', 'OTOGL']").toDF("v")
      .select(Terms.pythonListDecode($"v")).head().getSeq[String](0)
    assert(r == Seq("SLC12A7", "OTOGL"))
    val empty = Seq("[]").toDF("v")
      .select(Terms.pythonListDecode($"v")).head().getSeq[String](0)
    assert(empty == Seq())
  }

  test("parsePurl extracts prefix/number/term from OBO PURLs") {
    // reference regex: OntologyParserLoader.py:40
    val r = Seq("http://purl.obolibrary.org/obo/CL_0000235").toDF("v")
      .select(Terms.parsePurl($"v").as("p")).select("p.prefix", "p.number", "p.term")
      .head()
    assert(r.getString(0) == "CL")
    assert(r.getString(1) == "0000235")
    assert(r.getString(2) == "CL_0000235")
  }

  test("stripProtocol removes all http(s):// occurrences") {
    // reference: ExternalApiResultsTupleWriter.py:1017-1033
    assert(one(Terms.stripProtocol(lit("https://a.org http://b.org"))) ==
      "a.org b.org")
  }

  test("uriFragment takes the #fragment or last path segment") {
    assert(one(Terms.uriFragment(lit("http://www.w3.org/2000/01/rdf-schema#label"))) == "label")
    assert(one(Terms.uriFragment(lit("http://purl.obolibrary.org/obo/BFO_0000050"))) == "BFO_0000050")
  }

  test("curieToTerm swaps colon for underscore") {
    assert(one(Terms.curieToTerm(lit("CL:0000235"))) == "CL_0000235")
  }

  test("stripVersion drops the Ensembl version suffix") {
    // reference: LoaderUtilities.py:711
    assert(one(Terms.stripVersion(lit("ENSG00000228222.1"))) == "ENSG00000228222")
    assert(one(Terms.stripVersion(lit("ENSG00000228222"))) == "ENSG00000228222")
  }

  test("rowId is deterministic and 16 hex chars") {
    val a = one(Terms.rowId(lit("k1"), lit("k2")))
    val b = one(Terms.rowId(lit("k1"), lit("k2")))
    assert(a == b)
    assert(a.matches("[0-9a-f]{16}"))
    assert(one(Terms.rowId(lit("k1"), lit("k3"))) != a)
  }

  test("filenameIdentity parses tissue-author-year") {
    // reference: LoaderUtilities.py:137-153
    val r = Seq("/x/nsforest-retina-li-2023.csv").toDF("v")
      .select(Terms.filenameIdentity($"v").as("f"))
      .select("f.tissue", "f.author", "f.year").head()
    assert(r.getString(2) == "2023")
  }

  test("parseTermFull mirrors the reference term taxonomy") {
    // mirrors OntologyParserLoaderTestCase.py:33-87
    def p(s: String) = Seq(s).toDF("v")
      .select(Terms.parseTermFull($"v").as("t"))
      .select("t.oid", "t.number", "t.term", "t.fragment", "t.kind")
      .head() match { case r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3), r.getString(4)) }
    assert(p("http://purl.obolibrary.org/obo/CL_0000235") ==
      ("CL", "0000235", "CL_0000235", null, "class"))
    assert(p("http://purl.obolibrary.org/obo/GOREL_0002003") ==
      (null, null, null, null, null)) // GOREL rejected
    assert(p("http://www.w3.org/2000/01/rdf-schema#label") ==
      (null, null, null, "label", "predicate"))
    assert(p("macrophage") == (null, null, null, "macrophage", "literal"))
    assert(p("_:abc1") == ("BNode", "_:abc1", "BNode__:abc1", null, "class"))
  }

  test("pythonListDecode round-trips generated word lists (property)") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val gen = Gen.listOf(word)
    val samples = Iterator.continually(gen.sample).flatten.take(100).toSeq
    val encoded = samples.map { ws =>
      if (ws.isEmpty) "[]" else ws.mkString("['", "', '", "']")
    }
    val decoded = encoded.toDF("v")
      .select(Terms.pythonListDecode($"v")).collect()
      .map(r => Option(r.getSeq[String](0)).map(_.toList).getOrElse(Nil))
    samples.zip(decoded).foreach { case (in, out) => assert(out == in) }
  }

  test("parseTermFull kind partitioning is total over generated URIs (property)") {
    val oid = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    val num = Gen.nonEmptyListOf(Gen.numChar).map(_.mkString)
    val gen = Gen.oneOf(
      Gen.zip(oid, num).map { case (o, n) => s"http://purl.obolibrary.org/obo/${o}_$n" },
      oid.map(f => s"http://www.w3.org/2000/01/rdf-schema#$f"),
      oid) // bare literal
    val samples = Iterator.continually(gen.sample).flatten.take(150).toSeq
    val kinds = samples.toDF("v")
      .select($"v", Terms.parseTermFull($"v").getField("kind"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    kinds.foreach { case (v, k) =>
      if (v.contains("/obo/") && !v.contains("GOREL")) assert(k == "class", v)
      else if (v.contains("#")) assert(k == "predicate", v)
      else assert(k == "literal", v)
    }
  }
}
