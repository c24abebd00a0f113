package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session keeps
  * the test run fast; parallelExecution is off by default in sbt). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark

  /** Root of the reference checkout for golden-fixture replay suites.
    * Overridable via GRAFT_REFERENCE_ROOT so the suite is relocatable;
    * tests that need it call [[assumeReference]] and cancel (not fail)
    * when the checkout is absent, keeping `sbt test` self-contained. */
  def referencePath(rel: String): String =
    sys.env.getOrElse("GRAFT_REFERENCE_ROOT", "/root/reference") + "/" + rel

  def assumeReference(rel: String): Unit = {
    val p = referencePath(rel)
    assume(new java.io.File(p).exists(),
      s"reference fixture $p not present - skipping golden replay")
  }
}
