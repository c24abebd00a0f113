package graft.sources

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * OWL/RDF XML → triples source (SURVEY.md §2.1 S7).
 *
 * Spark has no RDF source; the reference parses OWL with rdflib
 * (OntologyParserLoader.py:1243-1248). Here each .owl file becomes one
 * task: `binaryFile` scan → StAX streaming parse → triple rows. Files are
 * parsed independently, so a 10-file ontology corpus parallelizes
 * file-per-task; within a file StAX keeps memory flat regardless of
 * document size (no DOM).
 *
 * Supported RDF/XML subset — the "striped" syntax OBO ontology dumps use:
 *  - node elements: rdf:Description or typed (owl:Class, owl:Restriction,
 *    owl:Axiom, ...) with rdf:about / rdf:nodeID / anonymous (fresh bnode);
 *    typed elements emit an rdf:type triple;
 *  - property elements: rdf:resource / rdf:nodeID objects, nested node
 *    elements, or text content (literal); rdf:datatype and xml:lang are
 *    dropped — the reference stringifies every literal on load
 *    (OntologyParserLoader.py:904-906);
 *  - non-rdf attributes on node elements become literal properties.
 *
 * Output columns: s, p, o, sKind ('uri'|'bnode'), oKind
 * ('uri'|'bnode'|'literal').
 */
object OwlSource {

  val RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  final case class RawTriple(s: String, p: String, o: String,
                             sKind: String, oKind: String)

  private sealed trait Frame
  private final case class NodeFrame(subject: String, kind: String) extends Frame
  private final class PropFrame(val predicate: String) extends Frame {
    val text = new StringBuilder
    var objectEmitted = false
  }

  def readOwl(spark: SparkSession, paths: String*): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(paths: _*)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) => parseBytes(path, content) }
      .toDF()
  }

  /** X11 — ontology version from parsed triples (find_obo_version,
    * OntologyParserLoader.py:50-86): the owl:Ontology node's versionInfo
    * literal when it parses strictly as yyyy-MM-dd; else the first
    * yyyy-MM-dd embedded in its versionIRI; else null. `try_to_date` +
    * `date_format` reproduces the reference's strptime→strftime
    * normalization without ANSI exceptions. One row per ontology node. */
  def oboVersion(triples: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val OWL = "http://www.w3.org/2002/07/owl#"
    val onts = triples
      .filter(col("p") === RDF_NS + "type" && col("o") === OWL + "Ontology")
      .select(col("s").as("ont"))
    val vi = triples.filter(col("p") === OWL + "versionInfo")
      .select(col("s").as("ont"), col("o").as("__vi"))
    val viri = triples.filter(col("p") === OWL + "versionIRI")
      .select(col("s").as("ont"),
        regexp_extract(col("o"), "(\\d{4}-\\d{2}-\\d{2})", 1).as("__viri"))
    onts.join(vi, Seq("ont"), "left").join(viri, Seq("ont"), "left")
      .select(col("ont"), coalesce(
        date_format(try_to_date(col("__vi"), "yyyy-MM-dd"), "yyyy-MM-dd"),
        date_format(try_to_date(when(col("__viri") =!= "", col("__viri")),
          "yyyy-MM-dd"), "yyyy-MM-dd")).as("version"))
  }

  /** XMLInputFactory is not thread-safe and newInstance() does a
    * service-loader lookup — per-document instantiation dominated the
    * parse cost on many-small-document corpora (measured ~2× at sf0.1).
    * One factory per executor thread; readers stay per-call. */
  private val factories: ThreadLocal[XMLInputFactory] =
    ThreadLocal.withInitial { () =>
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.IS_COALESCING, true)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      f
    }

  /** Parse one RDF/XML document into triples (used directly in tests). */
  def parseBytes(path: String, content: Array[Byte]): Iterator[RawTriple] = {
    val reader = factories.get()
      .createXMLStreamReader(new ByteArrayInputStream(content))

    val out = scala.collection.mutable.ArrayBuffer.empty[RawTriple]
    var stack = List.empty[Frame]
    var bnodeCounter = 0L
    val filePrefix = Integer.toHexString(path.hashCode)
    def freshBnode(): String = { bnodeCounter += 1; s"_:$filePrefix-b$bnodeCounter" }

    def attr(ns: String, local: String): Option[String] = {
      var i = 0
      var found: Option[String] = None
      while (i < reader.getAttributeCount && found.isEmpty) {
        if (reader.getAttributeLocalName(i) == local &&
          reader.getAttributeNamespace(i) == ns)
          found = Some(reader.getAttributeValue(i))
        i += 1
      }
      found
    }

    def elementUri: String =
      Option(reader.getNamespaceURI).getOrElse("") + reader.getLocalName

    def enclosingNode(frames: List[Frame]): Option[NodeFrame] =
      frames.collectFirst { case n: NodeFrame => n }

    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val uri = elementUri
          val expectsNode = stack.isEmpty || stack.head.isInstanceOf[PropFrame]
          if (expectsNode && uri == RDF_NS + "RDF") {
            // document root: nothing to emit, no frame needed
          } else if (expectsNode) {
            // NODE element
            val (subject, kind) = attr(RDF_NS, "about").map((_, "uri"))
              .orElse(attr(RDF_NS, "ID").map(id => ("#" + id, "uri")))
              .orElse(attr(RDF_NS, "nodeID").map(id => (s"_:$filePrefix-$id", "bnode")))
              .getOrElse((freshBnode(), "bnode"))
            if (uri != RDF_NS + "Description")
              out += RawTriple(subject, RDF_NS + "type", uri, kind, "uri")
            // non-rdf attributes => literal properties
            var i = 0
            while (i < reader.getAttributeCount) {
              val ans = Option(reader.getAttributeNamespace(i)).getOrElse("")
              if (ans != RDF_NS &&
                ans != "http://www.w3.org/XML/1998/namespace" &&
                ans != "http://www.w3.org/2000/xmlns/")
                out += RawTriple(subject, ans + reader.getAttributeLocalName(i),
                  reader.getAttributeValue(i), kind, "literal")
              i += 1
            }
            // this node is the object of the enclosing property element
            (stack.headOption, enclosingNode(stack)) match {
              case (Some(pf: PropFrame), Some(n)) =>
                out += RawTriple(n.subject, pf.predicate, subject, n.kind, kind)
                pf.objectEmitted = true
              case _ =>
            }
            stack = NodeFrame(subject, kind) :: stack
          } else {
            // PROPERTY element under a node frame
            val n = stack.head.asInstanceOf[NodeFrame]
            val pf = new PropFrame(uri)
            attr(RDF_NS, "resource").foreach { r =>
              out += RawTriple(n.subject, uri, r, n.kind, "uri")
              pf.objectEmitted = true
            }
            attr(RDF_NS, "nodeID").foreach { id =>
              out += RawTriple(n.subject, uri, s"_:$filePrefix-$id", n.kind, "bnode")
              pf.objectEmitted = true
            }
            stack = pf :: stack
          }

        case XMLStreamConstants.CHARACTERS =>
          stack.headOption match {
            case Some(pf: PropFrame) if !pf.objectEmitted =>
              pf.text.append(reader.getText)
            case _ =>
          }

        case XMLStreamConstants.END_ELEMENT =>
          stack.headOption match {
            case Some(pf: PropFrame) =>
              if (!pf.objectEmitted && pf.text.toString.trim.nonEmpty) {
                enclosingNode(stack.tail).foreach { nf =>
                  out += RawTriple(nf.subject, pf.predicate, pf.text.toString,
                    nf.kind, "literal")
                }
              }
              stack = stack.tail
            case Some(_: NodeFrame) =>
              stack = stack.tail
            case None => // rdf:RDF close
          }

        case _ =>
      }
    }
    reader.close()
    out.iterator
  }
}
