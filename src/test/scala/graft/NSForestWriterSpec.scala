package graft

import graft.writers.NSForestWriter

/** Golden-sequence test for the NSForest tuple writer, expectations
  * hand-derived from the reference emission order
  * (NSForestResultsTupleWriter.py:20-298). Mirrors the reference's
  * golden-fixture spot checks (NSForestResultsTupleWriterTestCase.py:41-56):
  * exact count, first tuple, last tuple, plus key positions. */
class NSForestWriterSpec extends SparkSpec {
  import spark.implicits._

  private val P = NSForestWriter.PURL
  private val R = NSForestWriter.RDFS

  private def row(name: String = "B cell", size: Long = 100,
                  sil: java.lang.Double = 0.7) = Seq(
    (name, size, 0.5, 0.25, 1L, 2L, 3L, 4L, 2L,
      "['GeneA', 'GeneB']", "['GeneC']", "abc123def456", sil)
  ).toDF("clusterName", "clusterSize", "f_score", "precision", "TN", "FP",
    "FN", "TP", "marker_count", "NSForest_markers", "binary_genes", "uuid",
    "median_silhouette")

  private def run(df: org.apache.spark.sql.DataFrame,
                  dsv: Seq[String] = Seq("dv1")) =
    NSForestWriter.tuples(df, dsv).orderBy("ord")
      .select("s", "p", "o", "lit").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))

  test("emits the full 28-tuple sequence for one row in reference order") {
    val ts = run(row())
    assert(ts.length == 28)
    val cs = s"$P/CS_B-cell-abc123def456"
    val bmc = s"$P/BMC_abc123def456"
    val bgs = s"$P/BGS_abc123def456"
    // first: BMC typing triple
    assert(ts(0) == (bmc, s"$R/rdf#type", s"$P/SO_0001260", null))
    // quad normalized from reference positional (s, o, p, lit)
    assert(ts(1) == (bmc, s"$R#Source", s"$P/SO_0001260", "NSForest"))
    // gene loop in list order
    assert(ts(2) == (s"$P/GS_GeneA", s"$P/BFO_0000050", bmc, null))
    assert(ts(4) == (s"$P/GS_GeneB", s"$P/BFO_0000050", bmc, null))
    // relations
    assert(ts(6) == (cs, s"$P/RO_0015004", bmc, null))
    assert(ts(8) == (bmc, s"$P/RO_0015003", bgs, null))
    // node annotations: stringified numerics, space-joined lists
    assert(ts(10) == (cs, s"$R#F_beta_confidence_score", "0.5", null))
    assert(ts(11) == (cs, s"$R#Total_cell_count", "100", null))
    assert(ts(12) == (cs, s"$R#Binary_genes", "GeneC", null))
    assert(ts(13) == (cs, s"$R#Markers", "GeneA GeneB", null))
    assert(ts(14) == (cs, s"$R#Median_silhouette_score", "0.7", null))
    assert(ts(15) == (bgs, s"$R#Binary_genes", "GeneC", null))
    // edge annotation quads
    assert(ts(18) == (cs, s"$P/#source_algorithm", bmc, "NSForest-v4.0_dev"))
    assert(ts(20) == (cs, s"$R#Precision", bmc, "0.25"))
    assert(ts(21) == (cs, s"$R#TN", bmc, "1"))
    assert(ts(22) == (cs, s"$R#TP", bmc, "4"))
    // last: dataset provenance quad
    assert(ts(26) == (cs, s"$R/dc#Source", s"$P/CSD_dv1", null))
    assert(ts(27) == (cs, s"$R#Source", s"$P/CSD_dv1", "NSForest"))
  }

  test("clusters below MIN_CLUSTER_SIZE are dropped") {
    assert(run(row(size = 9)).isEmpty) // LoaderUtilities.py:39
    assert(run(row(size = 10)).nonEmpty)
  }

  test("falsy median_silhouette is not emitted (reference `if median_silhouette:`)") {
    val zero = run(row(sil = 0.0))
    assert(zero.length == 27)
    assert(!zero.exists(_._2.endsWith("Median_silhouette_score")))
    val none = run(row(sil = null))
    assert(none.length == 27)
  }

  test("one provenance pair per dataset_version_id") {
    val ts = run(row(), dsv = Seq("dv1", "dv2"))
    assert(ts.length == 30)
    assert(ts(28)._3 == s"$P/CSD_dv2")
  }

  test("rows emit in clusterName order (global ordinal contract)") {
    val two = row("zzz").unionByName(row("aaa"))
    val ts = NSForestWriter.tuples(two, Seq("dv1")).orderBy("ord")
      .select("s").collect().map(_.getString(0))
    assert(ts(0).contains("BMC")) // first row's typing tuple
    // the CS tuples of 'aaa' must come before any of 'zzz'
    val firstZzz = ts.indexWhere(_.contains("CS_zzz"))
    val lastAaa = ts.lastIndexWhere(_.contains("CS_aaa"))
    assert(lastAaa < firstZzz)
  }

  test("silhouette merge joins on the data-named cluster_header column") {
    val ns = Seq(("c1", "cl")).toDF("clusterName", "cluster_header")
    val sil = Seq(("c1", 0.9), ("cX", 0.1)).toDF("cl", "median_silhouette")
    val m = NSForestWriter.mergeSilhouette(ns, sil).collect()
    assert(m.length == 1 && m(0).getAs[Double]("median_silhouette") == 0.9)
  }
}
