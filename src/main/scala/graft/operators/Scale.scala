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
}
