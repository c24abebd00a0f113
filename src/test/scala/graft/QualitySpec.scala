package graft

import graft.operators.Quality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("profile reports nulls, exact distincts, and stringified bounds") {
    val df = Seq((1L, Some("b")), (2L, None), (3L, Some("a")),
      (3L, Some("a"))).toDF("id", "s")
    val got = Quality.profile(df, Seq("id", "s"))
      .orderBy("column")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(got === Seq(
      ("id", 4L, 0L, 3L, "1", "3"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("integrityCheck counts orphans and null keys per declaration") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("p")
    val got = Quality.integrityCheck(Seq(("c_p", child, "k", parent, "p")))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("c_p", 4L, 1L, 1L))) // 9 is the one orphan
  }

  test("snapshotDiff classifies added/removed/changed and hides " +
    "unchanged by default") {
    val old = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val nw = Seq((2L, "y"), (3L, "Z"), (4L, "w")).toDF("id", "v")
    val got = Quality.snapshotDiff(old, nw, "id", Seq("v"))
      .select("id", "status").orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
    val all = Quality.snapshotDiff(old, nw, "id", Seq("v"),
      keepUnchanged = true).collect()
    assert(all.length === 4)
  }

  test("kAnonymity flags small classes and low sensitive diversity") {
    // class (1,a): 3 rows, 2 sensitive values; (1,b): 1 row;
    // (2,a): 2 rows, 1 sensitive value
    val df = Seq((1, "a", 10L), (1, "a", 10L), (1, "a", 20L),
      (1, "b", 30L), (2, "a", 40L), (2, "a", 40L))
      .toDF("nat", "seg", "bal")
    val got = Quality.kAnonymity(df, Seq("nat", "seg"), "bal",
        k = 2L, l = 2L)
      .orderBy("nat", "seg")
      .as[(Int, String, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(got === Seq((1, "a", 3L, 2L, true, true),
      (1, "b", 1L, 1L, false, false), (2, "a", 2L, 1L, true, false)))
  }

  test("datasetFingerprint is order-independent and change-sensitive") {
    val a = Seq((1L, "x", "g"), (2L, "y", "g"), (3L, "z", "g"))
      .toDF("id", "v", "grp")
    val shuffled = Seq((3L, "z", "g"), (1L, "x", "g"), (2L, "y", "g"))
      .toDF("id", "v", "grp")
    val changed = Seq((1L, "x", "g"), (2L, "Y", "g"), (3L, "z", "g"))
      .toDF("id", "v", "grp")
    def fp(df: org.apache.spark.sql.DataFrame) =
      Quality.datasetFingerprint(df, Seq("grp"), Seq("id", "v"))
        .as[(String, Long, Long)].collect().head
    assert(fp(a) === fp(shuffled))
    assert(fp(a)._2 === 3L)
    assert(fp(a)._3 !== fp(changed)._3)
    // the digest is a fold: union of halves equals the whole
    val h1 = a.filter($"id" <= 1)
    val h2 = a.filter($"id" > 1)
    assert(fp(h1.unionByName(h2)) === fp(a))
  }

  test("tCloseness: skewed classes fail the TVD bound, zero-count " +
    "values counted") {
    // global {1:2, 2:2}; class A=[1,1] misses value 2 entirely:
    // num = |2*4-2*2| + |0*4-2*2| = 8, tvd = 8/16 = 0.5 > 1/5
    val df = Seq(("A", 1L), ("A", 1L), ("B", 2L), ("B", 2L))
      .toDF("qc", "s")
    val got = Quality.tCloseness(df, Seq("qc"), "s")
      .orderBy("qc").as[(String, Long, Double, Boolean)].collect().toSeq
    assert(got === Seq(("A", 2L, 0.5, false), ("B", 2L, 0.5, false)))
    // a class mirroring the global distribution is 0-TVD t-close
    val bal = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L))
      .toDF("qc", "s")
    val g2 = Quality.tCloseness(bal, Seq("qc"), "s")
      .orderBy("qc").as[(String, Long, Double, Boolean)].collect().toSeq
    assert(g2 === Seq(("A", 2L, 0.0, true), ("B", 2L, 0.0, true)))
  }
}
