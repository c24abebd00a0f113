package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Full-text index construction + token-match search (SURVEY.md §2.9
 * N1-N3), replacing the reference's ArangoSearch analyzers/views
 * (ArangoDbUtilities.py:209-358) with a materialized inverted-index
 * DataFrame — the Spark-native shape: build is one explode+distinct
 * (narrow then single shuffle for dedup), search is an equi-join on the
 * token, and the postings table partitions/bucketizes by token at scale.
 *
 * Analyzers:
 *  - N1 char n-gram (min 3, max 4, preserveOriginal=true) — substring
 *    search;
 *  - N2 "text" analyzer: lowercase, accent-fold, NO stemming, word
 *    edge-n-grams 3..12 — typeahead/prefix search;
 *  - N3 the index over configured (collection, field) pairs.
 */
object SearchIndex {

  /** Accent fold for the text analyzer (reference: accent=False). */
  def deAccent(c: Column): Column =
    translate(c,
      "àáâãäåçèéêë" +
        "ìíîïñòóôõö" +
        "ùúûüý",
      "aaaaaaceeeeiiiinooooouuuuy")

  /** N1 — char n-grams of every length in [minN, maxN], plus the original
    * string when preserveOriginal (ArangoDbUtilities.py:222-234). One
    * codegen'd call per row (CharNgrams) — the per-position interpreted
    * HOF it replaces is kept as [[charNgramsHof]], spec-pinned equal. */
  def charNgrams(c: Column, minN: Int = 3, maxN: Int = 4,
                 preserveOriginal: Boolean = true): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.CharNgrams(
        org.apache.spark.sql.graft.ColumnShim.expression(c),
        minN, maxN, preserveOriginal))

  private[graft] def charNgramsHof(c: Column, minN: Int = 3, maxN: Int = 4,
                 preserveOriginal: Boolean = true): Column = {
    val grams = (minN to maxN).map { n =>
      filter(
        transform(sequence(lit(1), greatest(length(c) - (n - 1), lit(1))),
          i => when(i + (n - 1) <= length(c), c.substr(i, lit(n)))),
        x => x.isNotNull)
    }
    val all = grams.reduce(concat(_, _))
    array_distinct(if (preserveOriginal) concat(all, array(c)) else all)
  }

  /** N2 — text-analyzer tokens: lowercase, accent-fold, split on
    * non-alphanumerics, edge n-grams 3..12 of each word plus the full
    * word (ArangoDbUtilities.py:235-250). Normalization stays native
    * codegen'd expressions; the per-word prefix fan-out is one generated
    * call (EdgeNgrams), spec-pinned equal to [[edgeNgramTokensHof]]. */
  def edgeNgramTokens(c: Column, minN: Int = 3, maxN: Int = 12): Column = {
    val words = filter(split(deAccent(lower(c)), "[^a-z0-9]+"), w => w =!= "")
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.EdgeNgrams(
        org.apache.spark.sql.graft.ColumnShim.expression(words), minN, maxN))
  }

  private[graft] def edgeNgramTokensHof(c: Column, minN: Int = 3,
                                        maxN: Int = 12): Column = {
    val words = filter(split(deAccent(lower(c)), "[^a-z0-9]+"), w => w =!= "")
    array_distinct(flatten(transform(words, w =>
      concat(
        filter(
          transform(sequence(lit(minN), lit(maxN)),
            n => when(n <= length(w), w.substr(lit(1), n))),
          x => x.isNotNull),
        array(w)))))
  }

  /** N3 — inverted-index build: one posting row per distinct
    * (id, field, token). `fields` maps field column -> analyzer column
    * producing an array of tokens. */
  def postings(df: DataFrame, idCols: Seq[String],
               fields: Map[String, Column => Column]): DataFrame = {
    val perField = fields.map { case (field, analyzer) =>
      df.select(
        idCols.map(col) :+ lit(field).as("field") :+
          explode(analyzer(col(field))).as("token"): _*)
    }
    perField.reduce(_.unionByName(_)).distinct()
  }

  /** Token-match search: distinct ids per query token, with hit counts.
    * The query side is tiny — broadcast; the postings side is pre-built
    * and (at scale) bucketed by token so this is a local join. */
  def search(index: DataFrame, queries: Seq[String]): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    index.join(broadcast(queries.toDF("q")), col("token") === col("q"))
  }

  /** View lifecycle (ArangoDbUtilities.py:209-358 create_analyzers /
    * delete_analyzers / create_view — the delete-then-recreate management
    * the reference runs on every load): the "view" is a persisted
    * postings table bucketed+sorted by token, so repeated searches and
    * index-index joins co-locate without shuffling the postings.
    * `collections` mirrors create_view's per-database link whitelist
    * (ArangoDbUtilities.py:332-352): when set and the source has a
    * `collection` column, only whitelisted collections are indexed. */
  def createView(df: DataFrame, idCols: Seq[String],
                 fields: Map[String, Column => Column], table: String,
                 buckets: Int = 16,
                 collections: Option[Seq[String]] = None): Unit = {
    val src = collections match {
      case Some(allowed) =>
        require(df.columns.contains("collection"),
          "a collections whitelist needs a 'collection' column on the " +
            s"source frame (got: ${df.columns.mkString(", ")})")
        df.filter(col("collection").isin(allowed.map(lit): _*))
      case None => df
    }
    Scale.resetManagedTable(df.sparkSession, table)
    postings(src, idCols, fields).write.mode("overwrite")
      .bucketBy(buckets, "token").sortBy("token")
      .format("parquet").saveAsTable(table)
  }

  /** delete_analyzers semantics: ignore-missing drop. */
  def dropView(spark: org.apache.spark.sql.SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$table`")

  /** The reference's full refresh sequence (delete analyzers + views,
    * recreate both) collapses to drop + overwrite-create. */
  def recreateView(df: DataFrame, idCols: Seq[String],
                   fields: Map[String, Column => Column], table: String,
                   buckets: Int = 16,
                   collections: Option[Seq[String]] = None): Unit = {
    dropView(df.sparkSession, table)
    createView(df, idCols, fields, table, buckets, collections)
  }
}
