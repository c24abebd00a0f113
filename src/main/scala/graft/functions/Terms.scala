package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Scalar term/normalization functions (SURVEY.md §2.8, X1–X13).
 *
 * Every one is a pure Column expression built from `sql.functions` — they
 * stay inside WholeStageCodegen, vectorize, and push through Catalyst.
 * No UDFs in the hot path.
 */
object Terms {

  /** X1 — hyphenate: replace any of ` _,/` with `-` and collapse runs.
    * Reference: LoaderUtilities.py:263-284. */
  def hyphenate(c: Column): Column =
    regexp_replace(regexp_replace(c, "[ _,/]", "-"), "-+", "-")

  /** X2 — deterministic 16-hex-char row id from a natural key.
    * The reference uses a *random* 12-char uuid persisted back into the
    * input CSV (LoaderUtilities.py:228-260); deterministic hashing is an
    * intentional improvement — stable across runs without file mutation,
    * and computable in parallel at any scale. */
  def rowId(naturalKey: Column*): Column =
    lower(format_string("%016x", xxhash64(naturalKey: _*)))

  /** X3 — decode a stringified Python list `"['A', 'B']"` into array<string>.
    * Reference: NSForestResultsTupleWriter.py:57-58 (ast.literal_eval).
    * Handles the observed single-quoted form by quote-swapping then
    * from_json; null on malformed input rather than error. */
  def pythonListDecode(c: Column): Column =
    from_json(regexp_replace(c, "'", "\""), ArrayType(StringType))

  /** X4 — strip URL protocol (reference strips all occurrences:
    * ExternalApiResultsTupleWriter.py:1017-1033). */
  def stripProtocol(c: Column): Column =
    regexp_replace(c, "https?://", "")

  /** X5 — parse an OBO PURL into (prefix, number, term).
    * Reference regex: `/obo/([A-Za-z]*)_([A-Za-z0-9-+]*)`
    * (OntologyParserLoader.py:40); prefix ⇒ vertex collection,
    * number ⇒ key (OntologyParserLoader.py:617-624). */
  def parsePurl(c: Column): Column = struct(
    regexp_extract(c, "/obo/([A-Za-z]*)_([A-Za-z0-9-+]*)", 1).as("prefix"),
    regexp_extract(c, "/obo/([A-Za-z]*)_([A-Za-z0-9-+]*)", 2).as("number"),
    concat_ws("_",
      regexp_extract(c, "/obo/([A-Za-z]*)_([A-Za-z0-9-+]*)", 1),
      regexp_extract(c, "/obo/([A-Za-z]*)_([A-Za-z0-9-+]*)", 2)).as("term")
  )

  /** X5b — URI fragment (`...#frag` → `frag`), used for predicate labels.
    * Reference: OntologyParserLoader.py:218-283. */
  def uriFragment(c: Column): Column =
    substring_index(substring_index(c, "#", -1), "/", -1)

  /** X6 — CURIE colon→underscore normalization (`CL:0000235` → `CL_0000235`).
    * Reference: AnnotationResultsTupleWriter.py:93-187. */
  def curieToTerm(c: Column): Column = translate(c, ":", "_")

  /** X7 — join a string array into a space-separated literal.
    * Reference: NSForestResultsTupleWriter.py:157-163. */
  def joinWords(c: Column): Column = concat_ws(" ", c)

  /** X8 — Ensembl version strip (`ENSG000.12` → `ENSG000`).
    * Reference: LoaderUtilities.py:711. */
  def stripVersion(c: Column): Column = substring_index(c, ".", 1)

  /** X12 — parse (tissue, author, year) identity from a results filename.
    * Reference: LoaderUtilities.py:137-153. Apply to input_file_name(). */
  def filenameIdentity(c: Column): Column = {
    val re = "([A-Za-z-]+)-([A-Za-z]+)-(\\d{4})"
    struct(
      regexp_extract(c, re, 1).as("tissue"),
      regexp_extract(c, re, 2).as("author"),
      regexp_extract(c, re, 3).as("year"))
  }

  /** Classify a tuple element as URI vs literal, the way the reference's
    * JSON loader does (`contains("http")`, ResultsGraphBuilder.java:60-72). */
  def isUri(c: Column): Column = c.contains("http")

  /** X5 complete — the reference's full term taxonomy
    * (OntologyParserLoader.py:218-283): returns
    * struct(oid, number, term, fragment, kind) where kind ∈
    * {'class', 'predicate', 'literal'} (nulls throughout for rejected
    * GOREL ids). Order of dispatch matches the reference: OBO-pattern
    * URI → class; '#fragment' → predicate; bnode ('_:' prefix, our
    * OwlSource convention for rdflib BNodes) → class with a pseudo id;
    * anything else → literal with the path stem as its value. */
  def parseTermFull(c: Column): Column = {
    val re = "/obo/([A-Za-z]*)_([A-Za-z0-9-+]*)"
    val oid = regexp_extract(c, re, 1)
    val num = regexp_extract(c, re, 2)
    val isObo = oid =!= "" && num =!= "" && oid =!= "GOREL"
    // GOREL ids are rejected outright (all-null row, not a literal) —
    // OntologyParserLoader.py:244-249
    val isGorel = oid === "GOREL"
    val beforeFrag = substring_index(c, "#", 1)
    val hasFrag = c.contains("#") && substring_index(c, "#", -1) =!= ""
    val isBnode = c.startsWith("_:")
    // Python Path(path).stem: last path segment, last dot-suffix removed
    val stem = regexp_replace(
      substring_index(beforeFrag, "/", -1), "\\.[^.]*$", "")
    val nullS = lit(null).cast("string")
    struct(
      when(isObo, oid).when(isBnode, "BNode").otherwise(nullS).as("oid"),
      when(isObo, num).when(isBnode, stem).otherwise(nullS).as("number"),
      when(isObo, concat_ws("_", oid, num))
        .when(isBnode, concat(lit("BNode_"), stem)).otherwise(nullS).as("term"),
      when(isObo || isBnode || isGorel, nullS)
        .when(hasFrag, substring_index(c, "#", -1))
        .otherwise(stem).as("fragment"),
      when(isGorel, nullS)
        .when(isObo || isBnode, "class")
        .when(hasFrag, "predicate")
        .otherwise("literal").as("kind"))
  }
}
