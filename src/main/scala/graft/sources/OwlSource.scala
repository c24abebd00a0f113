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

  /** Parse one RDF/XML document into triples (used directly in tests). */
  def parseBytes(path: String, content: Array[Byte]): Iterator[RawTriple] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_COALESCING, true)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val reader = factory.createXMLStreamReader(new ByteArrayInputStream(content))

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
