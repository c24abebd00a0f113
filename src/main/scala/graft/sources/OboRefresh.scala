package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/**
 * S8 — ontology download lifecycle: version-compare a freshly fetched OWL
 * file against the installed one, archive the old copy, and atomically
 * swap the new one into place
 * (reference: src/main/python/OntologyParserLoader.py:87-149
 * `update_downloads`). The HTTP fetch itself stays out of engine scope
 * (zero-egress sandbox — a driver-side fetcher writes the `<stem>-new`
 * candidate file); everything from the candidate file onward is
 * reproduced here:
 *
 *  - candidate version parsed with the same versionInfo-then-versionIRI
 *    rule as `find_obo_version` (X11, OwlSource.oboVersion is the
 *    DataFrame twin of [[findVersion]]);
 *  - no current file → candidate becomes current;
 *  - newer candidate → current COPIED to
 *    `<archive>/<stem>-<version><suffix>`, then the candidate atomically
 *    renamed onto the current path — the install location holds a valid
 *    file at every instant (no crash window, unlike the reference's
 *    move-then-move);
 *  - otherwise the candidate is discarded.
 */
object OboRefresh {

  sealed trait Outcome
  /** No current file existed; the candidate was installed. */
  case object Installed extends Outcome
  /** The candidate was newer; the old file was archived at `archived`. */
  final case class Replaced(archived: Path) extends Outcome
  /** The candidate was not newer and was discarded. */
  case object KeptCurrent extends Outcome

  /** Driver-local twin of `OwlSource.oboVersion` (X11): the owl:Ontology
    * node's versionInfo literal when it parses strictly as yyyy-MM-dd,
    * else the first yyyy-MM-dd embedded in its versionIRI, else None —
    * find_obo_version, OntologyParserLoader.py:50-85. */
  def findVersion(file: Path): Option[String] = {
    val OWL = "http://www.w3.org/2002/07/owl#"
    val date = "^(\\d{4}-\\d{2}-\\d{2})$".r
    val embedded = "(\\d{4}-\\d{2}-\\d{2})".r
    val triples = OwlSource
      .parseBytes(file.toString, Files.readAllBytes(file)).toSeq
    val ontNodes = triples.collect {
      case t if t.p == OwlSource.RDF_NS + "type" && t.o == OWL + "Ontology" => t.s
    }.toSet
    def forOnt(pred: String) = triples.collectFirst {
      case t if ontNodes.contains(t.s) && t.p == OWL + pred => t.o
    }
    forOnt("versionInfo").collect { case date(d) => d }
      .orElse(forOnt("versionIRI").flatMap(embedded.findFirstIn))
  }

  /** The GET leg of `update_downloads` (OntologyParserLoader.py:88-149):
    * stream the ontology over HTTP into `<candidate>.part`, then
    * atomically rename onto `candidate` only on a complete 200 response
    * — a download killed mid-stream leaves a stale `.part` and NO
    * candidate, so a restart simply re-fetches (the `.part` is
    * truncated/overwritten); [[refresh]] can never see a torn file.
    * Returns false (candidate untouched, `.part` cleaned) on non-200 or
    * any transport error, mirroring the reference's except-and-continue.
    * Driver-side by design, like the reference: one file per ontology,
    * not a data-plane fetch ([[FetchPlanner]] owns those). */
  def download(url: String, candidate: Path, timeoutMs: Int = 30000): Boolean = {
    val part = candidate.resolveSibling(candidate.getFileName.toString + ".part")
    try {
      val client = HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs.toLong))
        .build()
      val req = HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
        .GET().build()
      // ofFile(TRUNCATE) overwrites any stale .part from a killed run
      val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(part,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
      if (resp.statusCode() == 200) {
        Files.move(part, candidate,
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        true
      } else {
        Files.deleteIfExists(part); false
      }
    } catch {
      case _: InterruptedException =>
        Thread.currentThread().interrupt()
        scala.util.Try(Files.deleteIfExists(part)); false
      case scala.util.control.NonFatal(_) =>
        scala.util.Try(Files.deleteIfExists(part)); false
    }
  }

  /** The full S8 lifecycle in one call: download the candidate from
    * `url`, then version-compare/archive/swap it against `current`.
    * None when the download failed (current untouched — the reference's
    * "keep serving the installed copy" behavior). */
  def downloadAndRefresh(url: String, current: Path,
                         archive: Path): Option[Outcome] = {
    val candidate = current.resolveSibling(
      current.getFileName.toString + ".new")
    if (download(url, candidate)) Some(refresh(candidate, current, archive))
    else None
  }

  /** Compare-and-swap one download. `candidate` is the fetched
    * `<stem>-new<suffix>` file; `current` the installed path; `archive`
    * the archive directory (created on demand). Versions compare as
    * yyyy-MM-dd strings (lexicographic = chronological); an unparseable
    * version sorts lowest, matching the reference's "guaranteed to sort"
    * contract without its None-comparison crash. */
  def refresh(candidate: Path, current: Path, archive: Path): Outcome = {
    require(Files.exists(candidate), s"candidate $candidate does not exist")
    if (!Files.exists(current)) {
      Files.move(candidate, current, StandardCopyOption.ATOMIC_MOVE)
      Installed
    } else {
      val vNew = findVersion(candidate).getOrElse("")
      val vCur = findVersion(current).getOrElse("")
      if (vNew > vCur) {
        Files.createDirectories(archive)
        val name = current.getFileName.toString
        val dot = name.lastIndexOf('.')
        val (stem, suffix) =
          if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot))
        val archived = archive.resolve(
          stem + "-" + (if (vCur.isEmpty) "unversioned" else vCur) + suffix)
        // archive by COPY, then atomically rename the candidate onto the
        // current path — the install location holds a valid file at every
        // instant (the reference's move-then-move sequence has a crash
        // window with no current file at all)
        Files.copy(current, archived, StandardCopyOption.REPLACE_EXISTING)
        Files.move(candidate, current,
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        Replaced(archived)
      } else {
        Files.delete(candidate)
        KeptCurrent
      }
    }
  }
}
