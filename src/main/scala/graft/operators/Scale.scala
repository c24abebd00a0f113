package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-out join strategies (builder mandate: "broadcast small dims,
 * repartition/bucketing for co-located joins, salting for skew").
 *
 * These are the levers the engine reaches for at 100 TB when AQE's
 * automatic handling isn't enough:
 *
 *  - [[saltedJoin]] — a hot key (one ontology hub vertex, one viral
 *    document hash) funnels an entire join partition to one task. Salting
 *    splits each big-side key into `salts` subkeys and replicates the
 *    small side once per salt: same result, `salts`-way parallelism on
 *    the hot keys, at the cost of a small-side blow-up (keep the
 *    replicated side the smaller one).
 *  - [[writeBucketed]] / co-located joins — both sides persisted
 *    bucketed+sorted by the join key join WITHOUT a shuffle: the
 *    sort-merge join reads co-located buckets. This is the layout for
 *    the vertex/edge tables' recurring joins (hop after hop joins on
 *    (collection, key)).
 */
object Scale {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways.
    * Result is identical to `big.join(small, key)` — verified by test. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Drop a managed table AND its leftover warehouse directory. A fresh
    * session's in-memory catalog forgets tables from previous JVMs while
    * their files survive, and `saveAsTable` then fails with
    * LOCATION_ALREADY_EXISTS — every bucketed-table writer resets
    * through here so overwrite semantics hold across restarts. */
  def resetManagedTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val dbLoc = spark.catalog.getDatabase("default").locationUri
    val path = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(new java.net.URI(dbLoc)), table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** Persist a DataFrame bucketed+sorted by the join key (table name in
    * the session catalog; files under the warehouse dir). */
  def writeBucketed(df: DataFrame, key: String, buckets: Int,
                    table: String): Unit = {
    resetManagedTable(df.sparkSession, table)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketing tables as a sort-merge join — with matching
    * bucketing Catalyst plans NO shuffle exchange on either side
    * (asserted in the spec). The merge hint keeps small test tables from
    * taking the broadcast path, which would hide the co-location. */
  /** Deterministic train/val/test assignment for corpus curation: the
    * first hex nibble of md5(key) allocates each row to one of 16 slots,
    * and slots map to named splits. Stable across runs, clusters, and
    * input order; no RNG state to coordinate; the label is a narrow
    * column expression, so split filters push down to the scan. md5 (not
    * xxhash64) so any engine reproduces the assignment bit-for-bit. */
  def deterministicSplit(key: Column,
                         slots: Seq[(String, Int)] =
                           Seq("train" -> 13, "val" -> 2, "test" -> 1)): Column = {
    require(slots.map(_._2).sum == 16 && slots.forall(_._2 > 0),
      "slots must sum to 16 sixteenths")
    val hex = "0123456789abcdef"
    val nibble = substring(md5(key), 1, 1)
    val starts = slots.scanLeft(0) { case (acc, (_, n)) => acc + n }
    slots.zip(starts).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, n), start)) =>
        when(nibble.isin(hex.slice(start, start + n).map(_.toString): _*), name)
          .otherwise(acc)
    }
  }

  /** W6 — deterministic "random" exemplar rows (the reference prints a
    * random vertex for eyeballing, OntologyParserLoader.py diagnostics):
    * rank by a seeded xxhash64 of the key columns and take n. Same seed →
    * same rows on any cluster/partitioning; no RNG state, no collect of
    * anything but the n winners. */
  def exemplar(df: DataFrame, keyCols: Seq[String], seed: Long,
               n: Int = 1): DataFrame =
    df.orderBy(xxhash64((lit(seed) +: keyCols.map(col)): _*)).limit(n)

  def bucketedJoin(spark: SparkSession, table1: String, table2: String,
                   key: String): DataFrame =
    spark.table(table1).hint("merge").join(spark.table(table2), Seq(key))

  /** Join-key skew report — the diagnostic run before choosing a skew
    * lever ([[saltedJoin]], AQE, hot-bucket salting): per-key counts,
    * the `topK` hottest keys with their corpus share, and each key's
    * ratio to the MEDIAN key count (the skew factor that predicts
    * straggler tasks). One partial-agg census + two 1-row broadcasts.
    * The exact median comes from the count-value FREQUENCY map (smallest
    * count value whose cumulative frequency reaches ceil(nk/2)) — the
    * only window runs over |distinct count values| rows, never per key,
    * so billions of distinct keys don't funnel one sort task (that
    * failure mode is what this report diagnoses). Caveat: when per-key
    * counts are mostly UNIQUE values (possible on near-uniform data),
    * |distinct count values| approaches |keys| and the median window
    * degrades toward a single-task sort again — in that regime swap the
    * window for a two-pass rank (count the frequencies, then filter to
    * the cumulative bucket holding ceil(nk/2)); skew reports are run on
    * suspected-skewed keys, where the frequency map is tiny.
    * Deterministic ties by key make the report oracle-checkable. */
  def skewReport(df: DataFrame, key: String, topK: Int = 5): DataFrame = {
    val counts = df.groupBy(col(key).as("key"))
      .agg(count(lit(1)).as("n"))
    Exec.withPersisted(counts) {
      val total = counts.agg(sum("n").as("total"))
      val nk = counts.agg(count(lit(1)).as("nk"))
      val freq = counts.groupBy("n").agg(count(lit(1)).as("__f"))
      val median = freq.crossJoin(broadcast(nk))
        .withColumn("__cum", sum("__f").over(
          org.apache.spark.sql.expressions.Window.orderBy("n")))
        .filter(col("__cum") >= ceil(lit(0.5) * col("nk")))
        .agg(min("n").as("p50"))
      // asc_nulls_last: Spark sorts nulls FIRST on asc, DuckDB LAST — a
      // null key tying at the topK boundary would otherwise rank
      // differently than the oracle
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("key").asc_nulls_last)
      counts.orderBy(col("n").desc, col("key").asc_nulls_last).limit(topK)
        .withColumn("rank", row_number().over(w))
        .crossJoin(broadcast(total)).crossJoin(broadcast(median))
        .select(col("rank"), col("key"), col("n"),
          (col("n").cast("double") / col("total")).as("share"),
          (col("n").cast("double") / col("p50")).as("skew_vs_median"))
    }
  }

  /** Turn a [[skewReport]] into a hot-key salting threshold — the policy
    * glue between the diagnostic and the `hotBucketThreshold` lever on
    * the LSH/Jaccard self-joins ([[graft.operators.Dedup]]): when the
    * hottest key exceeds `ratio`× the median key count, salt every key
    * above `median × ratio`; otherwise return 0 (= plain join, AQE skew
    * handling is the first line). The report is already ≤ topK rows, so
    * the collect here is bounded by construction. */
  def recommendedThreshold(report: DataFrame, ratio: Double = 8.0): Long = {
    val rows = report.select("n", "skew_vs_median").collect()
    if (rows.isEmpty) return 0L
    val maxSkew = rows.map(_.getDouble(1)).max
    if (maxSkew < ratio) 0L
    else {
      // p50 = n / skew_vs_median of any row (same divisor in all rows)
      val r0 = rows.head
      val p50 = r0.getLong(0) / r0.getDouble(1)
      math.ceil(p50 * ratio).toLong
    }
  }

  /** Quantize a numeric column to an integer cell in [0, 2^bits) over a
    * fixed [min, max] domain (out-of-range values clamp). Fixed literal
    * bounds — not data-driven ranks — keep the cell assignment a narrow
    * deterministic expression any engine reproduces. */
  def quantize(c: Column, min: Double, max: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 16 && max > min, "need 1<=bits<=16, max>min")
    val cells = 1L << bits
    least(lit(cells - 1), greatest(lit(0L),
      floor(((c.cast("double") - lit(min)) / lit(max - min)) * cells)))
  }

  /** Z-order (Morton) key of two quantized cells: bit i of `x` lands at
    * position 2i, bit i of `y` at 2i+1, so sorting by the key interleaves
    * both dimensions — consecutive key ranges are small (x, y) boxes
    * instead of full-width stripes. THE multi-column clustering layout
    * for 100 TB scans: a write sorted by z lets parquet row-group min/max
    * stats prune 2-d box predicates on BOTH columns, where a
    * lexicographic (x, y) sort only ever prunes on x. Pure shift/mask
    * arithmetic — codegen'd, reproducible in any engine. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, "need 1<=bits<=16")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** Persist `df` z-order-clustered on two quantized dimensions:
    * range-partition + sort by the Morton key so every output file covers
    * a compact (x, y) box. `ZOrderSpec` quantifies the effect: an
    * 8×8 box predicate intersects ~4/16 z-ordered files vs ~8/16 under a
    * lexicographic sort — at 100 TB that is the difference between
    * scanning a quarter and half the corpus for the same query. */
  def zorderWrite(df: DataFrame, x: Column, y: Column, bits: Int,
                  files: Int, path: String): Unit = {
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** 2-D skyline (Pareto frontier, minimize both): rows not dominated
    * by any other row — r' dominates r when x' ≤ x, y' ≤ y and one is
    * strict. Expressed as two window minima instead of the naive
    * O(n²) anti-join: a row survives iff no strictly-smaller-x row
    * has y' ≤ y (RANGE … 1 PRECEDING running min) AND it holds the
    * minimum y within its own x group (exact ties both survive —
    * neither dominates). Comparisons only, no float arithmetic, so
    * the q155 gate replays exactly on any engine.
    *
    * `xCol` must be numeric (the RANGE frame's ordering key). Shape
    * at 100 TB: one global sort on x — the same cost class as any
    * final ORDER BY; the equal-x partition min rides the same sort.
    * All input columns pass through. */
  /** Wide→long reshape (melt): each id row fans out to one row per
    * metric column, `(ids..., metric, value)`. Thin face over
    * `Dataset.unpivot`, which Catalyst plans as a single Expand — one
    * narrow stage, no shuffle, |valueCols|× the row count. The
    * inverse of the pivot operator (q76). */
  def unpivotLong(df: DataFrame, idCols: Seq[String],
      valueCols: Seq[String]): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
      "metric", "value")

  def skylineMin(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val w1 = org.apache.spark.sql.expressions.Window.orderBy(col(xCol))
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val w2 = org.apache.spark.sql.expressions.Window.partitionBy(col(xCol))
    df.withColumn("__m1", min(col(yCol)).over(w1))
      .withColumn("__m2", min(col(yCol)).over(w2))
      .filter((col("__m1").isNull || col("__m1") > col(yCol)) &&
        col(yCol) === col("__m2"))
      .drop("__m1", "__m2")
  }

  /** Compaction planner: assign rows (files, docs) to target-size
    * output bins by START-OFFSET binning — a row goes to the bin
    * holding its first byte, bin = (cum − size) div target over the
    * (partition, ord)-ordered running total. Deterministic, exact
    * integers, one window + one groupBy per partition key — this is
    * the small-file compaction / shard-sizing pass a 100 TB writer
    * runs before `write.partitionBy`, and the per-partition window
    * parallelizes across partitions (never a global sort). Bins can
    * overshoot by at most one row's size — the standard streaming
    * bin-packing guarantee. Returns one row per (partition, bin):
    * row count, total size, and the ord-range it covers.
    *
    * CONTRACT: `ordCol` must be a UNIQUE key within each `partCol`
    * group (a file path, a doc id). The running total is a ROWS frame
    * ordered by `ordCol` alone, so ties would make the cumulative sums
    * — and therefore bin assignment — depend on the engine's incidental
    * row order; uniqueness is what makes the plan deterministic and
    * replayable across engines. */
  def compactionBins(df: DataFrame, partCol: String, ordCol: String,
      sizeCol: String, targetSize: Long): DataFrame = {
    require(targetSize >= 1, "targetSize must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(ordCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__cum", sum(col(sizeCol)).over(w))
      .withColumn("bin",
        expr(s"(__cum - $sizeCol) div ${targetSize}L"))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(sizeCol)).as("bytes"),
        min(col(ordCol)).as("ord_from"),
        max(col(ordCol)).as("ord_to"))
  }

  /** Systematic weighted sampling: walk the (ord-sorted) cumulative
    * weight line and keep every row whose weight interval
    * [cum − w, cum) covers a multiple of `step` — the deterministic,
    * exact-integer version of weighted sampling without replacement
    * (expected pick rate w/step, heavy rows always kept, zero RNG, so
    * any engine replays it). The selection predicate is pure integer
    * arithmetic on the running total: first multiple ≥ start is
    * (start + step − 1) div step · step, selected iff < cum. One
    * window sort on the caller's order — at 100 TB order by a
    * partition-friendly key and run per partition.
    *
    * CONTRACT: `ordCol` must be a UNIQUE key over the frame (same
    * rule, and reason, as [[compactionBins]]): the ROWS-frame running
    * weight line is only deterministic when the order is total. */
  def systematicWeightedSample(df: DataFrame, ordCol: String,
      weightCol: String, step: Long): DataFrame = {
    require(step >= 1, "step must be >= 1")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(ordCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__cum", sum(col(weightCol)).over(w))
      .withColumn("__start", col("__cum") - col(weightCol))
      .filter(expr(s"((__start + ${step}L - 1) div ${step}L) * ${step}L") <
        col("__cum"))
      .drop("__start")
      .withColumnRenamed("__cum", "cum_weight")
  }
}
