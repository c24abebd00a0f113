package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality operators — the checks a 100 TB ingest runs before
 * anything downstream trusts a snapshot (reference analog: the
 * null/shape guards and censuses the writers run before emitting,
 * `AnnotationResultsWriter.py` guard blocks, `Reports.py` censuses).
 *
 * All three are single-plan, shuffle-minimal, and exact:
 *  - [[profile]] — ONE pass over the table computes every column's
 *    null count, approx-free distinct count, and min/max (stringified
 *    for a uniform schema), then melts to one row per column. The
 *    multi-agg is a single partial-aggregated global fold; the melt is
 *    an Expand of the 1-row aggregate.
 *  - [[integrityCheck]] — orphan foreign keys per declared (child,
 *    parent) pair via left-anti joins; each pair is one shuffle (or a
 *    broadcast when the parent key set is small).
 *  - [[snapshotDiff]] — two snapshots full-outer-joined on the key,
 *    rows classified added/removed/changed/unchanged by comparing a
 *    hash of the non-key payload. One shuffle per side; the hash
 *    (xxhash64 of the payload struct) keeps the compare narrow no
 *    matter how wide the table.
 */
object Quality {

  /** One-pass column profile: (column, n_rows, n_null, n_distinct,
    * min_val, max_val) per profiled column, values stringified so one
    * schema fits every column type. Distinct counts are EXACT
    * (count_distinct, one expand-aggregate) — swap for
    * approx_count_distinct at corpus scale if the expand dominates. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, 1)).as(s"__null_$c"),
        count_distinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Referential-integrity census over declared foreign keys: for each
    * (name, child, childKey, parent, parentKey) declaration, the
    * number of child rows whose non-null key has no parent — plus the
    * child's total and null-key counts for rate context. */
  def integrityCheck(
      fks: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(fks.nonEmpty, "integrityCheck needs at least one FK")
    fks.map { case (name, child, ck, parent, pk) =>
      val nonNull = child.filter(col(ck).isNotNull)
      val orphans = nonNull
        .join(parent.select(col(pk).as(ck)).distinct(), Seq(ck), "left_anti")
      val counts = child.agg(
        count(lit(1)).as("n_child"),
        count(when(col(ck).isNull, 1)).as("n_null_key"))
      counts.crossJoin(orphans.agg(count(lit(1)).as("n_orphan")))
        .select(lit(name).as("fk"), col("n_child"), col("n_null_key"),
          col("n_orphan"))
    }.reduce(_ unionByName _)
  }

  /** Snapshot diff: classify every key as added / removed / changed /
    * unchanged between two versions of a table. The payload compare is
    * a single xxhash64 over the named payload columns (wide tables
    * diff at hash width); emit one row per non-unchanged key with its
    * status, keeping the new payload hash for audit. Set
    * `keepUnchanged` to include the unchanged census row-by-row. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      payloadCols: Seq[String], keepUnchanged: Boolean = false): DataFrame = {
    require(payloadCols.nonEmpty, "snapshotDiff needs payload columns")
    def hashed(df: DataFrame, h: String) =
      df.select(col(keyCol),
        xxhash64(payloadCols.map(col): _*).as(h))
    val joined = hashed(oldDf, "__h_old")
      .join(hashed(newDf, "__h_new"), Seq(keyCol), "full_outer")
    val status = when(col("__h_old").isNull, "added")
      .when(col("__h_new").isNull, "removed")
      .when(col("__h_old") =!= col("__h_new"), "changed")
      .otherwise("unchanged")
    val out = joined.select(col(keyCol), status.as("status"),
      col("__h_new").as("new_hash"))
    if (keepUnchanged) out else out.filter(col("status") =!= "unchanged")
  }

  /** k-anonymity / l-diversity census over quasi-identifier columns:
    * one row per equivalence class with its size, the count of
    * distinct sensitive values it holds, and whether it meets the
    * `k` (size) and `l` (diversity) floors — the release-readiness
    * audit before a table leaves the curation boundary, and the
    * suppression plan (every row of a failing class must be dropped
    * or generalized). One groupBy on the quasi columns with a
    * count_distinct expand — both map-side combined; exact integers
    * only. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long = 5L, l: Long = 2L): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs quasi-identifier columns")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_anonymous", col("class_size") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /** t-closeness census (Li–Li–Venkatasubramanian 2007, categorical
    * TVD face): per quasi-identifier class, the total-variation
    * distance between the class's sensitive-value distribution and the
    * GLOBAL one — the privacy bound k-anonymity/l-diversity miss
    * (a class can be diverse yet skewed). Exactness: with class count
    * cᵥ, class size n_c, global count gᵥ, total N,
    * TVD = Σ|cᵥ·N − gᵥ·n_c| / (2·n_c·N) — the numerator an exact
    * DECIMAL(38,0) fold (values absent from the class contribute
    * gᵥ·n_c), ONE division per class. `t_close = tvd ≤ tNum/tDen`
    * decided by exact cross-multiplication, never the double.
    *
    * Shape at 100 TB: two map-side-combined censuses (class×value and
    * value), one broadcast of the |values| global census, one
    * class-keyed aggregation. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, tNum: Long = 1L, tDen: Long = 5L): DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness needs quasi-identifier columns")
    require(tDen > 0 && tNum >= 0, "threshold must be a valid fraction")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cls = df.groupBy(quasiCols.map(col) :+
        col(sensitiveCol).as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val global = df.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1)).as("__g"))
    val tot = df.count()
    // every (class, value) pair, including zero-count ones: the class
    // census right-joins the global value census per class
    val classes = cls.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__c")).as("__nc"))
    val pairs = classes
      .crossJoin(broadcast(global))  // class × |values| expansion
      .join(cls, quasiCols :+ "__v", "left")
      .select((quasiCols.map(col) :+ col("__nc") :+ col("__g") :+
        coalesce(col("__c"), lit(0L)).as("__c")): _*)
    pairs.groupBy(quasiCols.map(col): _*)
      .agg(max(col("__nc")).as("class_size"),
        sum(abs(col("__c").cast(d38) * tot -
          col("__g").cast(d38) * col("__nc"))).as("__num"))
      .select((quasiCols.map(col) :+ col("class_size") :+
        (col("__num").cast("double") /
          (lit(2).cast(d38) * col("class_size") * tot).cast("double"))
          .as("tvd") :+
        (col("__num") * tDen <=
          lit(2).cast(d38) * col("class_size") * tot * tNum)
          .as("t_close")): _*)
  }

  /** Content-addressed dataset fingerprint: per group, the row count and
    * an ORDER-INDEPENDENT digest — the SUM of per-row hashes mod 10¹⁸ —
    * so the digest folds map-side, merges across partitions/snapshots
    * (the monoid property a sorted-concat digest lacks), and any engine
    * reproduces it without a global sort. Two snapshots with equal
    * (n_rows, fingerprint) per group are content-identical up to hash
    * collision; a sum (vs xor) also catches duplicated-row pairs.
    * `rowHash` defaults to the production xxhash64 face; gates pass the
    * md5-prefix face (conv of the first 14 hex chars — 56 bits, exact
    * in BIGINT) so DuckDB replays the digest bit-for-bit. */
  def datasetFingerprint(df: DataFrame, groupCols: Seq[String],
      payloadCols: Seq[String],
      rowHash: Column => Column = null): DataFrame = {
    require(payloadCols.nonEmpty, "datasetFingerprint needs payload columns")
    val payload = concat_ws("|", payloadCols.map(c => col(c).cast("string")): _*)
    val h: Column =
      if (rowHash != null) rowHash(payload)
      else pmod(xxhash64(payload), lit(Long.MaxValue))
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    df.withColumn("__h", h.cast(d38))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__h")) % lit(1000000000000000000L).cast(d38))
          .cast("long").as("fingerprint"))
  }
}
