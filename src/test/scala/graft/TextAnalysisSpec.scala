package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the language with most marker hits, 'und' when none") {
    val r = Seq(
      ("en", "the cat and the dog of it is in that house"),
      ("de", "der hund und die katze ist nicht ein vogel zu"),
      ("fr", "le chat et la maison est une belle chose pas"),
      ("es", "el gato y la casa es una cosa por con"),
      ("und", "zzz qqq xxx")
    ).toDF("expect", "text")
      .select($"expect", TextAnalysis.langId($"text").as("got"))
      .as[(String, String)].collect()
    r.foreach { case (e, g) => assert(e == g, s"expected $e got $g") }
  }

  test("tokenCount counts whitespace tokens, ignoring empties") {
    val r = Seq("a b  c", " a ", "", "one").toDF("t")
      .select(TextAnalysis.tokenCount($"t")).as[Int].collect().toSeq
    assert(r == Seq(3, 1, 0, 1))
  }

  test("subwordCount charges ceil(len/4) per punctuation-split piece") {
    // "hello," -> piece "hello" (2 subwords); "hi" -> 1
    val r = Seq("hello, hi").toDF("t")
      .select(TextAnalysis.subwordCount($"t")).as[Long].head()
    assert(r == 3L)
  }

  test("qualityFeatures computes exact counts and ratios") {
    val f = Seq("the cat. sat!").toDF("t")
      .select(TextAnalysis.qualityFeatures($"t").as("f"))
      .select("f.n_chars", "f.n_tokens", "f.punct_ratio", "f.stopword_ratio")
      .head()
    assert(f.getInt(0) == 13)
    assert(f.getInt(1) == 3)
    assert(f.getDouble(2) == 2.0 / 13) // '.' and '!'
    assert(f.getDouble(3) > 0) // "the"
  }

  test("codegen marker hits equal the per-language HOF witness (property)") {
    import org.scalacheck.Gen
    val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("the", "und", "la", "que", "der", "les", "", "café"))
    val doc = Gen.listOf(word).map(_.mkString(" "))
    val samples = Iterator.continually(doc.sample).flatten.take(120).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = samples.toDF("doc_id", "text")
    for (lang <- TextAnalysis.langMarkers.keys) {
      val both = df.select(
        TextAnalysis.markerHits($"text", lang).as("fast"),
        TextAnalysis.markerHitsHof($"text", lang).as("hof"))
        .as[(Int, Int)].collect()
      both.foreach { case (f, h) => assert(f == h, s"lang=$lang") }
    }
  }

  test("narrow mean-word-len equals the per-token HOF witness (property)") {
    import org.scalacheck.Gen
    val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(7)),
      Gen.oneOf("naïve", "東京", "", "  ", "\t"), Gen.const("a"))
    val doc = Gen.listOf(word).map(_.mkString(" "))
    val samples = Iterator.continually(doc.sample).flatten.take(120).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = samples.toDF("doc_id", "text")
    val both = df.select(
      TextAnalysis.qualityFeatures($"text").getField("mean_word_len").as("narrow"),
      TextAnalysis.meanWordLenHof($"text").as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, h) => assert(n == h) }
  }

  test("codegen fingerprint is value-identical to the HOF xxhash64 form") {
    // unicode text exercises the char-window/byte-offset walk (substr is
    // character-based); short text exercises the n <= gram single window
    val docs = Seq(
      "spark is a unified analytics engine for large scale data",
      "naïve café résumé — ünïcodé windows über alles, 東京 データ",
      "tiny", "", "exactly8!", "repeat repeat repeat repeat repeat"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    for ((gram, k) <- Seq((8, 16), (3, 4), (8, 1000))) {
      val r = docs.select(
          TextAnalysis.fingerprint($"t", gram, k).as("fast"),
          TextAnalysis.fingerprintWith($"t", xxhash64(_), gram, k).as("hof"))
        .as[(Seq[Long], Seq[Long])].collect()
      r.foreach { case (fast, hof) => assert(fast == hof, s"gram=$gram k=$k") }
    }
    // null text -> null fingerprint. (Deliberate divergence: the HOF form
    // is NOT null there because xxhash64 skips null inputs and returns its
    // seed, yielding a bogus [seed-hash] sketch for null docs.)
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(TextAnalysis.fingerprint($"t").isNull,
        TextAnalysis.fingerprintWith($"t", xxhash64(_)).isNull).head()
    assert(n.getBoolean(0) && !n.getBoolean(1))
  }

  test("codegen fingerprint equals HOF on generated unicode text (property)") {
    import org.scalacheck.Gen
    val frag = Gen.oneOf(Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("naïve café", "東京データ", "©®™", "", "!!"))
    val doc = Gen.listOf(frag).map(_.mkString(" "))
    val samples = Iterator.continually(doc.sample).flatten.take(150).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val r = samples.toDF("id", "t").select(
        TextAnalysis.fingerprint($"t", 5, 8).as("fast"),
        TextAnalysis.fingerprintWith($"t", xxhash64(_), 5, 8).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    r.foreach { case (fast, hof) => assert(fast == hof) }
  }

  test("fingerprint is stable and shared between near-identical docs") {
    val a = "spark is a unified analytics engine for large scale data"
    val b = a + " processing" // appended word: most 8-gram hashes shared
    val fps = Seq((1L, a), (2L, a), (3L, b)).toDF("id", "t")
      .select($"id", TextAnalysis.fingerprint($"t").as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L).toSet.intersect(fps(3L).toSet).size >= 12) // of 16
  }

  test("gopherKeep drops exactly the rule-violating documents") {
    import graft.operators.TextAnalysis
    val filler = (1 to 60).map(i => s"word$i").mkString(" ")
    val good = s"the and $filler"                       // every rule holds
    val short = "the and just a few words here"         // < 50 tokens
    val longWords = (1 to 60).map(i => "x" * 12).mkString(" ") +
      " the and"                                        // mean word len > 10
    val hashy = (1 to 30).map(i => s"#tag$i").mkString(" ") +
      " the and " + (1 to 30).map(i => s"w$i").mkString(" ") // symbol ratio
    val numeric = (1 to 60).map(i => s"$i$i$i").mkString(" ") +
      " the and"                                        // alpha ratio < 0.8
    val noStops = (1 to 60).map(i => s"tok$i").mkString(" ") // < 2 stop hits
    val docs = Seq((1L, good), (2L, short), (3L, longWords), (4L, hashy),
      (5L, numeric), (6L, noStops)).toDF("doc_id", "text")
    val kept = docs.filter(TextAnalysis.gopherKeep(col("text")))
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("redact scrubs emails, URLs, and long digit runs in one pass") {
    import org.apache.spark.sql.functions._
    val in = Seq(
      "mail me at jane.doe+x@lab.example.org or see https://ex.org/a?b=1 ref 12345678",
      "short 12345 stays; card 4111111111111111 goes").toDF("t")
    val out = in.select(TextAnalysis.redact($"t")).as[String].collect()
    assert(out(0) == "mail me at <EMAIL> or see <URL> ref <NUM>")
    assert(out(1) == "short 12345 stays; card <NUM> goes")
  }
}
