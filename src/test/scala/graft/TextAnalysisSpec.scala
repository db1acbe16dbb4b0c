package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  def one(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c(col("text"))).collect().head.get(0)

  test("importanceWeights: target-like docs outrank, ratio table broadcasts") {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the rug"),
      (3L, "xx", "zorp blee glarg wibble"),
      (4L, "xx", "the cat sat on the mat") // target-like text in the raw pool
    ).toDF("doc_id", "lang", "text")
    val w = TextAnalysis.importanceWeights(docs,
      docs.filter(col("lang") === "en"), "text", "doc_id", buckets = 256)
    val scores = w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(4L) == scores(1L),
      s"identical text must score identically regardless of label: $scores")
    assert(scores(4L) > scores(3L) && scores(2L) > scores(3L),
      s"target-like bigrams must outrank unseen ones: $scores")
    // scale shape: the <= buckets-row ratio table must broadcast
    val plan = w.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the bucket-ratio table must broadcast:\n$plan")
  }

  test("HTML extraction matrix: nested tags, '>' in attributes, entities, malformed fragments") {
    def x(html: String): String =
      one(html, TextAnalysis.extractHtmlText).asInstanceOf[String]
    // nested + uppercase tags become word-separating spaces
    assert(x("<div><SPAN>nested <b>bold</b> text</SPAN></div>") ==
      "nested bold text")
    assert(x("a<br>b") == "a b")
    // a quoted attribute may hide the '>' — double- and single-quoted
    assert(x("""<div data-x="a>b">keep</div>""") == "keep")
    assert(x("<div data-x='a>b'>keep</div>") == "keep")
    // script/style ELEMENTS drop with their content ('>' and '<' inside)
    assert(x("""a<script>var x = "</div>"; if (1<2) y();</script>b""") == "a b")
    assert(x("a<style>p > em { color: red; }</style>b") == "a b")
    // comments drop even when they hide tags
    assert(x("a<!-- <b>secret</b> \n more -->b") == "a b")
    // entity decode AFTER tag strip; &amp; last so &amp;lt; single-decodes
    assert(x("&amp;lt; &lt;b&gt; &quot;q&quot; &apos;a&apos; &#39;b&#39; x&nbsp;y") ==
      """&lt; <b> "q" 'a' 'b' x y""")
    // bare '<' in prose is not markup
    assert(x("if 1 < 2 then x") == "if 1 < 2 then x")
    // doctype and processing instructions strip
    assert(x("""<!DOCTYPE html><?xml version="1.0"?>x""") == "x")
    // an unmatched closer is a plain tag
    assert(x("a</script>b") == "a b")
    // malformed: an unclosed trailing tag / unterminated quote never finds
    // '>' — its literal text survives instead of swallowing the document
    assert(x("""done<p class="x""") == """done<p class="x""")
    assert(x("""<div class="unclosed rest of doc""") ==
      """<div class="unclosed rest of doc""")
    // whitespace runs collapse; ends trim
    assert(x("  a\n\t b\r\nc  ") == "a b c")
  }

  test("markdown extraction matrix: fences, links, markers, emphasis, malformed") {
    def x(s: String): String =
      one(s, TextAnalysis.extractMarkdownText).asInstanceOf[String]
    assert(x("# Title\nbody text") == "Title body text")
    assert(x("> quote line\nplain") == "quote line plain")
    assert(x("- a\n* b\n+ c\n12. d") == "a b c d")
    assert(x("keep ![alt words](http://x/y) and [link text](http://z)") ==
      "keep alt words and link text")
    // fenced code drops entirely — including markdown syntax hidden inside
    assert(x("a ```\n[hidden](x) *stars*\n``` b") == "a b")
    assert(x("before `code()` after") == "before after")
    assert(x("*em* **strong** _u_ ~~strike~~") == "em strong u strike")
    assert(x("---\ntext\n***") == "text")
    // only 1-3 digit ordinals are list markers; mid-line dashes are prose
    assert(x("1000. not a list marker") == "1000. not a list marker")
    assert(x("mid-dash - stays") == "mid-dash - stays")
    // malformed: with no closing fence the fence regex can't match, so
    // nothing is swallowed to end-of-input — the inline-code rule strips
    // the backtick PAIR from the orphan ``` and the odd backtick survives
    // as literal text alongside the prose
    assert(x("open ```\nno closer here") == "open ` no closer here")
  }

  test("Gopher rules: integer-rational boundaries decide exactly") {
    import org.apache.spark.sql.Row
    def rules(text: String): Row =
      Seq(text).toDF("text")
        .select(TextAnalysis.gopherRules(
          TextAnalysis.tokens(col("text")), col("text")))
        .collect().head.getStruct(0)
    // 50 four-char words with two stopwords: every rule passes exactly
    val base = (1 to 48).map(i => "word").mkString(" ") + " the with"
    val ok = rules(base)
    assert((0 until 6).forall(i => ok.getBoolean(i)), s"all-pass fixture: $ok")
    // one word under the floor flips ONLY r_words (49 words)
    val short = rules((1 to 47).map(_ => "word").mkString(" ") + " the with")
    assert(!short.getBoolean(0) && short.getBoolean(4) && !short.getBoolean(5))
    // mean length boundary: 50 two-char words → mean 2 < 3 fails r_meanlen
    assert(!rules((1 to 48).map(_ => "ab").mkString(" ") + " to of")
      .getBoolean(1))
    // symbol ratio: 6 symbol tokens over 50 words → 60 > 50 fails r_symbols
    val symText = base + " # # # ... ... ..."
    assert(!rules(symText).getBoolean(2))
    // one distinct stopword is not enough, even repeated
    assert(!rules((1 to 46).map(_ => "word").mkString(" ") +
      " the the the the").getBoolean(4))
  }

  test("Gopher repetition stats: grain boundaries, tie-breaks, overlap counted once") {
    import org.apache.spark.sql.Row
    import graft.functions.GopherRepetition
    def st(text: String): Map[String, Long] = {
      val row = Seq(text).toDF("text")
        .select(GopherRepetition.gopherRepetition(col("text")))
        .collect().head.getStruct(0)
      GopherRepetition.schema.fieldNames.zipWithIndex
        .map { case (f, i) => f -> row.getLong(i) }.toMap
    }
    // lines: dups count beyond-first; blank segments are not lines
    val s1 = st("x\ny\nx\n\nx")
    assert(s1("n_lines") == 4L && s1("dup_lines") == 2L &&
      s1("line_chars") == 4L && s1("dup_line_chars") == 2L, s1.toString)
    // paragraphs split on \n\n; "a\n\n\nb" has paragraphs ["a", "\nb"]
    val s2 = st("aa\n\nbb\n\naa")
    assert(s2("n_paras") == 3L && s2("dup_paras") == 1L &&
      s2("para_chars") == 6L && s2("dup_para_chars") == 2L, s2.toString)
    assert(st("a\n\n\nb")("n_paras") == 2L)
    // top n-grams: count first, word-chars as the tie-break
    val s3 = st("aaa b aaa b ccc dd ccc dd")
    // "aaa b" and "ccc dd" both occur twice; "ccc dd" has 5 word chars
    assert(s3("top2_chars") == 10L, s3.toString)
    assert(s3("word_chars") == 18L)
    // duplicate 5-gram coverage: both occurrences' positions covered
    val s4 = st("a b c d e a b c d e x")
    assert(s4("dup5_chars") == 10L && s4("word_chars") == 11L, s4.toString)
    assert(s4("dup6_chars") == 0L, "no 6-gram repeats in the fixture")
    // overlapping duplicate n-grams count each character ONCE
    val s5 = st("a a a a a a")
    assert(s5("dup5_chars") == 6L, s5.toString)
    // degenerate: empty text is all zeros
    val s6 = st("")
    assert(GopherRepetition.schema.fieldNames.forall(f => s6(f) == 0L), s6.toString)
    // whitespace class: tabs/newlines/CR/FF all separate words
    assert(st("a\tb\rc\fd\ne")("word_chars") == 5L)
  }

  test("Gopher repetition rules: integer-rational thresholds decide exactly at the boundary") {
    import graft.functions.GopherRepetition
    def rules(text: String): Map[String, Boolean] = {
      val names = TextAnalysis.GopherRepThresholds.map(t => s"r_${t._1}") :+ "keep"
      val row = Seq(text).toDF("text")
        .select(GopherRepetition.gopherRepetition(col("text")).as("_s"))
        .select(TextAnalysis.gopherRepetitionRules(col("_s")))
        .collect().head.getStruct(0)
      names.zipWithIndex.map { case (f, i) => f -> row.getBoolean(i) }.toMap
    }
    // dup-line fraction boundary: 3 dups of 10 lines = EXACTLY 0.30 → keep;
    // 4 of 11 (0.3636) → drop. Distinct lines are long so the char rule
    // stays clear of its own threshold.
    val distinct6 = (1 to 6).map(i => s"unique line number $i").mkString("\n")
    val pass = rules(distinct6 + "\nx\nx\nx\nx") // 6 distinct + x×4: 10 lines, 3 dups
    assert(pass("r_dup_lines"), pass.toString)
    val fail = rules(distinct6 + "\nx\nx\nx\nx\nx") // 11 lines, 4 dups
    assert(!fail("r_dup_lines") && fail("r_dup_paras"), fail.toString)
    // top-2-gram boundary: 5·top2 ≤ word_chars. "ab ab ab" has the bigram
    // "ab ab" twice → top2 = 2×4 = 8; with 34 one-char fillers word_chars
    // is EXACTLY 40 → keep; one filler fewer (39) → drop.
    val fills = (('c' to 'z') ++ ('A' to 'J')).map(_.toString) // 34 distinct
    assert(rules("ab ab ab " + fills.mkString(" "))("r_top2_chars"))
    assert(!rules("ab ab ab " + fills.tail.mkString(" "))("r_top2_chars"))
    // a clean document (all-distinct words) keeps everything
    val clean = (1 to 60).map(i => s"w$i").mkString(" ")
    assert(rules(clean)("keep"), rules(clean).toString)
  }

  test("gopherGate composes A.1.1 and A.1.2 into one boolean") {
    // passes quality (50+ DISTINCT words — a constant word would trip the
    // top-2-gram rule — plus 2 stopwords) but repeating a 10-word phrase
    // trips the duplicate-n-gram coverage → repetition drops it
    val phrase = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val good = (1 to 50).map(i => s"word$i").mkString(" ") + " the with"
    val repeaty = good + " " + phrase + " " + phrase + " " + phrase
    val df = Seq((1L, good), (2L, repeaty), (3L, "tiny doc"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherGate(df, "text")
      .select(col("doc_id"), col("gopher_keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false), got.toString)
  }

  test("NFC normalization: canonical equivalence unifies fingerprints, ASCII is a no-op") {
    val composed = "café résumé naïve"
    val decomposed = "café résumé naïve"
    assert(one(decomposed, TextAnalysis.normalizeNfc) == composed)
    // idempotent / ASCII fast path
    assert(one(composed, TextAnalysis.normalizeNfc) == composed)
    assert(one("plain ascii", TextAnalysis.normalizeNfc) == "plain ascii")
    // the canonical fingerprint unifies what the byte fingerprint splits
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "text")
    val fps = df.select(
        TextAnalysis.fingerprint(col("text")).as("raw"),
        TextAnalysis.fingerprintCanonical(col("text")).as("canon"))
      .collect()
    assert(fps(0).getString(0) != fps(1).getString(0),
      "byte fingerprints must differ across normal forms")
    assert(fps(0).getString(1) == fps(1).getString(1),
      "canonical fingerprints must agree across normal forms")
    // registered SQL twin of DuckDB's nfc_normalize
    assert(spark.sql("SELECT nfc_normalize('café')")
      .collect().head.getString(0) == "café")
    // expression, not UDF
    val p = df.select(TextAnalysis.fingerprintCanonical(col("text")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), s"NFC must be a Catalyst expression:\n$p")
  }

  test("URL host and registrable-domain extraction") {
    def host(u: String) = one(u, TextAnalysis.urlHost)
    assert(host("https://www.Example.COM/path?q=1") == "www.example.com")
    assert(host("HTTP://user:pw@cdn.static.foo.org:8443/p/1") ==
      "cdn.static.foo.org")
    assert(host("ftp://bare.io") == "bare.io")
    assert(host("https://h.io#frag") == "h.io")
    assert(host("not a url") == "", "non-URLs extract to empty")
    def dom(h: String) = one(h, TextAnalysis.registrableDomain)
    assert(dom("www.example.com") == "example.com")
    assert(dom("cdn.static.foo.org") == "foo.org")
    assert(dom("bare.io") == "bare.io")
    assert(dom("localhost") == "", "single-label hosts have no 2-label domain")
  }

  test("token counts") {
    assert(one("a b  c", TextAnalysis.tokenCount) == 3)
    assert(one("hello, world42!", TextAnalysis.bpeishTokenCount) == 5)
    // hello / , / world / 42 / !
  }

  test("language id picks marker-dominant language deterministically") {
    assert(one("the cat is on the mat and the dog", TextAnalysis.langId) == "en")
    assert(one("el gato y la casa de los perros", TextAnalysis.langId) == "es")
    assert(one("der hund und die katze ist nicht da", TextAnalysis.langId) == "de")
    assert(one("xyzzy qwerty plugh", TextAnalysis.langId) == "und")
    assert(one("你好世界", TextAnalysis.langId) == "zh")
  }

  test("quality score stays in [0,1] and rewards stopword-rich text") {
    val q1 = one("the of and to is in that a " * 10, TextAnalysis.qualityScore)
      .asInstanceOf[Double]
    val q2 = one("zzz", TextAnalysis.qualityScore).asInstanceOf[Double]
    assert(q1 > q2)
    assert(q1 <= 1.0 && q2 >= 0.0)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val a = one("The  Quick   Fox", TextAnalysis.fingerprint)
    val b = one("the quick fox", TextAnalysis.fingerprint)
    assert(a == b)
  }

  test("shingle fingerprint equals min of shingle hashes") {
    val fp = one("a b c d", TextAnalysis.shingleFingerprint).asInstanceOf[Long]
    assert(fp > 0)
    // stable across invocations (pure function of content)
    assert(fp == one("a b c d", TextAnalysis.shingleFingerprint).asInstanceOf[Long])
  }

  test("quality-model scorer equals an independent explode formulation") {
    import graft.operators.{QualityModel, Shingles}
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .limit(80).select(col("doc_id"), col("text"))
    val (n, s) = QualityModel.scoreOfTokens(col("_t"))
    val narrow = docs.withColumn("_t", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), n.as("n"), s.as("s"))
      .as[(Long, Long, Long)].collect().map { case (d, a, b) => d -> (a, b) }.toMap
    // independent path: explode unigrams + bigrams, hash, table lookup, agg
    val t = docs.withColumn("_t", TextAnalysis.tokens(col("text")))
    val uni = t.select(col("doc_id"), explode(col("_t")).as("term"))
    val bi = t.select(col("doc_id"), explode(zip_with(
      slice(col("_t"), lit(1), size(col("_t")) - 1),
      slice(col("_t"), lit(2), size(col("_t")) - 1),
      (a, b) => concat(a, lit(" "), b))).as("term"))
    val w = element_at(typedLit(QualityModel.Weights),
      (pmod(Shingles.hash60(col("term")),
        lit(QualityModel.HashBuckets.toLong)) + 1L).cast("int"))
    val wide = uni.unionByName(bi)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(w).as("s"))
      .as[(Long, Long, Long)].collect().map { case (d, a, b) => d -> (a, b) }.toMap
    assert(narrow == wide)
    // the gate is non-degenerate on the corpus: both labels occur
    val labels = narrow.values.map(_._2 > 0).toSet
    assert(labels == Set(true, false), s"degenerate gate: $labels")
  }

  test("quality-model training matches a local nearest-centroid reference; refusals") {
    import graft.operators.{QualityModel, Shingles}
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
    val label = when(col("n_chars") >= 300, 1L).otherwise(-1L)
    val m = QualityModel.train(docs, TextAnalysis.tokens(col("text")), label)
    // local reference: same closed form over locally-computed features
    val rows = docs.select(label.as("y"), col("text"))
      .as[(Long, String)].collect()
    def bucketOf(term: String): Int = {
      // mirror Shingles.hash60 via the engine (one tiny local frame)
      val df = Seq(term).toDF("t")
      df.select(pmod(Shingles.hash60(col("t")),
        lit(QualityModel.HashBuckets.toLong))).head().getLong(0).toInt
    }
    val cache = scala.collection.mutable.Map.empty[String, Int]
    def b(t: String) = cache.getOrElseUpdate(t, bucketOf(t))
    val cPos = Array.fill(QualityModel.HashBuckets)(0L)
    val cNeg = Array.fill(QualityModel.HashBuckets)(0L)
    var (nPos, nNeg) = (0L, 0L)
    for ((y, text) <- rows) {
      val toks = text.trim.split("\\s+").toSeq
      val terms = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val tgt = if (y == 1L) { nPos += 1; cPos } else { nNeg += 1; cNeg }
      for (t <- terms) tgt(b(t)) += 1
    }
    val wRef = (0 until QualityModel.HashBuckets).map(i =>
      cPos(i) * nNeg - cNeg(i) * nPos)
    val biasRef = (0 until QualityModel.HashBuckets).map { i =>
      BigInt(cPos(i)) * cPos(i) * nNeg * nNeg -
        BigInt(cNeg(i)) * cNeg(i) * nPos * nPos
    }.sum
    val (q, r) = biasRef /% (BigInt(2L) * nPos * nNeg)
    val thrRef = (if (r.signum > 0) q + 1 else q).toLong
    assert(m.weights == wRef && m.threshold == thrRef &&
      m.nPos == nPos && m.nNeg == nNeg)
    // predictions reproduce the rule well above chance on the train set
    val acc = docs.select(label.as("_y"),
        TextAnalysis.tokens(col("text")).as("_t"))
      .select((col("_y") === QualityModel.predictWith(col("_t"), m))
        .cast("long").as("ok"))
      .agg(avg(col("ok"))).head().getDouble(0)
    assert(acc >= 0.9, s"learned model must reproduce the length rule: $acc")
    // refusal: a single-class corpus cannot train
    val oneClass = intercept[IllegalArgumentException](
      QualityModel.train(docs, TextAnalysis.tokens(col("text")), lit(1L)))
    assert(oneClass.getMessage.contains("both classes"))
  }

  test("multiclass quality model: binary labels reproduce the binary model; refusal matrix") {
    import graft.operators.QualityModel
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    val label = when(col("n_chars") >= 300, 1L).otherwise(-1L)
    val toks = TextAnalysis.tokens(col("text"))
    val bin = QualityModel.train(docs, toks, label)
    val multi = QualityModel.trainMulticlass(docs, toks, label)
    assert(multi.classes == IndexedSeq(-1L, 1L))
    // same centroids: the multiclass count vectors ARE the binary model's
    // ingredients (w[b] = c⁺[b]·N⁻ − c⁻[b]·N⁺)
    assert((0 until QualityModel.HashBuckets).forall(b =>
      multi.counts(1)(b) * multi.nDocs(0) -
        multi.counts(0)(b) * multi.nDocs(1) == bin.weights(b)))
    // same decisions doc-by-doc (both are the argmin-distance rule; they
    // can only diverge on an exact distance tie, which would fail here
    // loudly — none exists on this corpus)
    val disagree = docs.select(toks.as("_t"))
      .select(QualityModel.predictWith(col("_t"), bin).as("b"),
        QualityModel.predictMultiWith(col("_t"), multi).as("m"))
      .filter(col("b") =!= col("m")).count()
    assert(disagree == 0L, s"binary and 2-class multiclass diverged on $disagree docs")
    // refusals: a single class cannot train; 65 labels are not a class
    val one = intercept[IllegalArgumentException](
      QualityModel.trainMulticlass(docs, toks, lit(7L)))
    assert(one.getMessage.contains("at least 2 classes"))
    val many = intercept[IllegalArgumentException](
      QualityModel.trainMulticlass(docs, toks, col("doc_id") % 65))
    assert(many.getMessage.contains("not a class column"))
  }

  test("multiclass prediction is the exact nearest centroid on a hand corpus") {
    import graft.operators.QualityModel
    import spark.implicits._
    // three classes with disjoint vocabulary mass; a test doc mixing
    // vocabularies lands on the class whose centroid is closest under
    // the exact integer algebra — verified against a local computation
    val train = Seq(
      (0L, "aa aa aa aa"), (0L, "aa aa ab"),
      (1L, "bb bb bb"), (1L, "bb bc bc bb"), (1L, "bb bb"),
      (2L, "cc cd ce cc cc")).toDF("y", "text")
    val m = QualityModel.trainMulticlass(train,
      TextAnalysis.tokens(col("text")), col("y"))
    assert(m.classes == IndexedSeq(0L, 1L, 2L) &&
      m.nDocs == IndexedSeq(2L, 3L, 1L))
    val probe = Seq("bb bb cc", "aa aa", "cc cd").toDF("text")
    val got = probe.select(col("text"),
        QualityModel.predictMultiWith(
          TextAnalysis.tokens(col("text")), m).as("p"))
      .as[(String, Long)].collect().toMap
    // local argmin over B_c/N_c² with exact BigInt cross-multiplication
    def bucketsOf(text: String): Seq[Long] = {
      val t = text.trim.split("\\s+").toSeq
      val terms = t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val df = terms.toDF("t")
      df.select(pmod(graft.operators.Shingles.hash60(col("t")),
        lit(QualityModel.HashBuckets.toLong))).as[Long].collect().toSeq
    }
    def localPred(text: String): Long = {
      val hist = bucketsOf(text).groupBy(identity).view.mapValues(_.size.toLong)
      val bs = m.classes.indices.map { i =>
        val s = hist.map { case (b, x) => m.counts(i)(b.toInt) * x }.sum
        val norm2 = m.counts(i).map(c => BigInt(c) * c).sum
        norm2 - BigInt(2) * m.nDocs(i) * s
      }
      // exact pairwise argmin with BigInt cross-multiplication
      var best = 0
      for (i <- 1 until m.classes.size)
        if (bs(i) * m.nDocs(best) * m.nDocs(best) <
            bs(best) * m.nDocs(i) * m.nDocs(i)) best = i
      m.classes(best)
    }
    for ((text, p) <- got)
      assert(p == localPred(text), s"'$text': got $p, local ${localPred(text)}")
  }

  test("multiclass wide (DECIMAL) regime: same argmin as the Long path, exact past Long") {
    import graft.operators.QualityModel
    import spark.implicits._
    // (1) regime equivalence: the SAME model evaluated in both regimes
    // agrees on every document — the wide path is the identical algebra
    // in a wider exact type
    val train = Seq(
      (0L, "aa aa aa aa"), (0L, "aa aa ab"),
      (1L, "bb bb bb"), (1L, "bb bc bc bb"), (1L, "bb bb"),
      (2L, "cc cd ce cc cc")).toDF("y", "text")
    val m = QualityModel.trainMulticlass(train,
      TextAnalysis.tokens(col("text")), col("y"))
    assert(!m.wide, "a tiny corpus must train into the Long regime")
    val probe = Seq("bb bb cc", "aa aa", "cc cd", "ce", "ab bc").toDF("text")
    val disagree = probe.select(
        QualityModel.predictMultiWith(
          TextAnalysis.tokens(col("text")), m).as("l"),
        QualityModel.predictMultiWith(
          TextAnalysis.tokens(col("text")), m.copy(wide = true)).as("w"))
      .filter(col("l") =!= col("w")).count()
    assert(disagree == 0L, s"regimes diverged on $disagree docs")
    // (2) a model whose products provably WRAP Long (norm2 ≈ 5.8e20, the
    // cross products ≈ 2e33): the wide regime classifies and matches the
    // exact BigInt argmin computed locally
    val bigC = 3000000000L
    val counts = IndexedSeq(
      IndexedSeq.tabulate(QualityModel.HashBuckets)(b => bigC + b),
      IndexedSeq.tabulate(QualityModel.HashBuckets)(b => 2 * bigC - b))
    val nd = IndexedSeq(1000000L, 2000000L)
    val mw = QualityModel.TrainedMulti(IndexedSeq(10L, 20L), counts, nd,
      safeTerms = 1000L, wide = true)
    val texts = Seq("aa bb cc", "zz", "aa aa aa bb")
    val got = texts.toDF("text")
      .select(col("text"), QualityModel.predictMultiWith(
        TextAnalysis.tokens(col("text")), mw).as("p"))
      .as[(String, Long)].collect().toMap
    def bucketsOf(text: String): Seq[Long] = {
      val t = text.trim.split("\\s+").toSeq
      val terms = t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      terms.toDF("t")
        .select(pmod(graft.operators.Shingles.hash60(col("t")),
          lit(QualityModel.HashBuckets.toLong))).as[Long].collect().toSeq
    }
    def localPred(text: String): Long = {
      val hist = bucketsOf(text).groupBy(identity).view.mapValues(_.size.toLong)
      val bs = mw.classes.indices.map { i =>
        val s = hist.map { case (b, x) => BigInt(mw.counts(i)(b.toInt)) * x }.sum
        mw.counts(i).map(c => BigInt(c) * c).sum - BigInt(2) * mw.nDocs(i) * s
      }
      var best = 0
      for (i <- 1 until mw.classes.size)
        if (bs(i) * mw.nDocs(best) * mw.nDocs(best) <
            bs(best) * mw.nDocs(i) * mw.nDocs(i)) best = i
      mw.classes(best)
    }
    for ((text, p) <- got)
      assert(p == localPred(text), s"'$text': got $p, local ${localPred(text)}")
  }

  test("multiclass wide regime caps safeTerms so the Long score fold cannot wrap") {
    import graft.operators.QualityModel
    // two 1-doc classes with ~1e12 bucket counts: norm2 ≈ 6.4e25 blows the
    // Long regime (→ wide), while the DECIMAL headroom alone would allow
    // safeTerms ≈ 2.5e25 — far past where terms·maxC wraps the Long
    // accumulator inside scoreOfTokensWith. The fix caps safeTerms at
    // min_c ⌊Long.MaxValue / maxC⌋ in the wide regime.
    val big = 1000000000000L // 1e12
    val cnt = IndexedSeq(
      IndexedSeq.tabulate(QualityModel.HashBuckets)(b => big - b),
      IndexedSeq.tabulate(QualityModel.HashBuckets)(b => big + b))
    val n = IndexedSeq(1L, 1L)
    val (safeTerms, wide) = QualityModel.fitRegime(cnt, n)
    assert(wide, "1e12-count corpus must train into the wide regime")
    val maxC = cnt.map(_.max).max
    assert(BigInt(safeTerms) * maxC <= BigInt(Long.MaxValue),
      s"safeTerms $safeTerms × maxC $maxC can wrap the Long accumulator")
    assert(safeTerms == Long.MaxValue / maxC,
      s"cap should bind exactly at Long.MaxValue/maxC, got $safeTerms")
    // the Long regime is unaffected: a small corpus keeps its tighter bound
    val small = IndexedSeq(
      IndexedSeq.tabulate(QualityModel.HashBuckets)(b => (b + 1).toLong),
      IndexedSeq.tabulate(QualityModel.HashBuckets)(b => (2 * b + 1).toLong))
    val (st2, w2) = QualityModel.fitRegime(small, IndexedSeq(3L, 4L))
    assert(!w2 && st2 > 0L)
  }

  test("predictWith refuses documents that could wrap the Long score") {
    import graft.operators.QualityModel
    // a model with near-limit weights makes the per-document safe bound
    // tiny: (Long.MaxValue/2) / (Long.MaxValue/20) = 10 terms
    val big = Long.MaxValue / 20
    val m = QualityModel.Trained(
      IndexedSeq.fill(QualityModel.HashBuckets)(big), 0L, 1L, 1L)
    // 6 tokens → 6 unigrams + 5 bigrams = 11 terms > bound of 10
    val over = Seq((1L, (1 to 6).map(i => s"t$i"))).toDF("id", "toks")
    val e = intercept[Throwable](
      over.select(QualityModel.predictWith(col("toks"), m)).collect())
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(msg =>
      msg != null && msg.contains("too large for Long scoring")),
      s"expected a loud scan-time refusal, got: ${chain(e)}")
    // a document inside the bound still scores: 2 tokens → 3 terms
    val ok = Seq((1L, Seq("a", "b"))).toDF("id", "toks")
    assert(ok.select(QualityModel.predictWith(col("toks"), m))
      .head().getLong(0) == 1L)
  }

  test("compression stats: deflate round-trips and repetition compresses harder") {
    import spark.implicits._
    val prose = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through fields of varied unrepeated vocabulary tokens"
    val docs = Seq(
      (1L, prose),
      (2L, prose + " " + prose + " " + prose + " " + prose), // 4× repetition
      (3L, ""),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val stats = TextAnalysis.compressionStats(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // round-trip: n_deflated bytes inflate back to the original
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(prose.getBytes("UTF-8")); deflater.finish()
    val out = new Array[Byte](64 * 1024)
    val n = deflater.deflate(out)
    assert(stats(1L)._2 == n.toLong, "same zlib stream length as a direct deflate")
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(out, 0, n)
    val back = new Array[Byte](64 * 1024)
    val m = inflater.inflate(back)
    assert(new String(back, 0, m, "UTF-8") == prose, "deflate must round-trip")
    // the repeated copies are back-references: per-byte ratio drops hard
    assert(stats(2L)._3 < stats(1L)._3 * 0.6,
      s"4x-repeated text must compress much harder: ${stats(2L)._3} vs ${stats(1L)._3}")
    // empty and null text degrade to the defined row, not a crash
    assert(stats(3L) == ((0L, 0L, 1.0)) && stats(4L) == ((0L, 0L, 1.0)))
  }

  test("GopherQuality one-pass integers == the builtin chain, bit-exact") {
    // the EXACT formulation gopherRules used before the one-pass
    // expression replaced it — the equivalence oracle for the rewrite
    def builtin(text: org.apache.spark.sql.Column) = {
      val toks = TextAnalysis.tokens(text)
      struct(
        size(toks).cast("long").as("n_words"),
        length(concat_ws("", toks)).cast("long").as("sum_len"),
        (regexp_count(text, lit("#")) +
          regexp_count(text, lit("\\.\\.\\.")) +
          regexp_count(text, lit("\u2026"))).cast("long").as("n_sym"),
        size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("long")
          .as("n_alpha"),
        size(filter(typedLit(TextAnalysis.GopherStopwords),
          s => array_contains(toks, s))).cast("long").as("n_stop"))
    }
    val edge = Seq("", " ", "\t", "\t\t", "\ta", "a\t", " a ", "a  b",
      "the be to of and that have with", "# ... \u2026 .... ..... ......",
      "caf\u00e9 \ud83d\ude00 na\u00efve", "a\nb\r\nc", "  \t  ",
      ". .. ... .... #.# \u2026\u2026", "to to to", "the", "x " * 60)
    val rnd = new scala.util.Random(7)
    val alphabet = "ab .\t\n#\u2026e\u00e9 the of "
    val fuzz = (1 to 300).map(_ => (1 to rnd.nextInt(60))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = (edge ++ fuzz).toDF("text")
    val rows = df.select(
      builtin(col("text")).as("b"),
      graft.functions.GopherQuality.gopherQuality(col("text")).as("g"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getStruct(0) == r.getStruct(1),
        s"diverged on ${r.getString(2).replace("\n", "\\n").replace("\t", "\\t")}: " +
          s"builtin=${r.getStruct(0)} got=${r.getStruct(1)}")
    }
  }

  test("TokenHits one-pass counts == the builtin chain, bit-exact") {
    def toks(text: org.apache.spark.sql.Column) = TextAnalysis.tokens(text)
    def builtin(text: org.apache.spark.sql.Column) = {
      val markers = TextAnalysis.langMarkers.map { case (l, ws) =>
        size(filter(toks(text), t => t.isInCollection(ws))).cast("long")
          .as(s"hits_$l")
      }
      struct((size(toks(text)).cast("long").as("n_tokens") +:
        size(filter(toks(text),
          t => t.isInCollection(TextAnalysis.stopwordsEn))).cast("long")
          .as("stop_hits") +: markers): _*)
    }
    // the double composites must stay IEEE-identical too
    def builtinQuality(text: org.apache.spark.sql.Column) = {
      val tc = size(toks(text))
      val sw = size(filter(toks(text),
        t => t.isInCollection(TextAnalysis.stopwordsEn)))
      val ratio = sw.cast("double") / tc.cast("double")
      val avg = (length(trim(text)) - tc + lit(1)).cast("double") /
        tc.cast("double")
      least(tc.cast("double") / lit(100.0), lit(1.0)) * lit(0.4) +
        ratio * lit(0.3) + least(avg / lit(8.0), lit(1.0)) * lit(0.3)
    }
    val edge = Seq("", " ", "\t", "\ta", "a\t", " a ", "the of to de que",
      "el la de que y los por una", "le la de et un les des est",
      "der die das und ist ein nicht mit", "the " * 30 + "word " * 30)
    val rnd = new scala.util.Random(11)
    val alphabet = "a de la et the of und \t\n "
    val fuzz = (1 to 200).map(_ => (1 to rnd.nextInt(50))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val rows = (edge ++ fuzz).toDF("text").select(
      builtin(col("text")).as("b"),
      graft.functions.TokenHits.tokenHits(col("text")).as("g"),
      builtinQuality(col("text")).as("qb"),
      TextAnalysis.qualityScore(col("text")).as("qg"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getStruct(0) == r.getStruct(1),
        s"counts diverged on '${r.getString(4)}': ${r.getStruct(0)} vs ${r.getStruct(1)}")
      val (qb, qg) = (r.get(2), r.get(3))
      assert(qb == qg || (qb.asInstanceOf[Double].isNaN &&
        qg.asInstanceOf[Double].isNaN),
        s"quality diverged on '${r.getString(4)}': $qb vs $qg")
    }
  }
}
