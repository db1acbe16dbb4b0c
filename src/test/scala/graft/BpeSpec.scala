package graft

import graft.operators.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private val E = Bpe.MergeBase
  private def ids(w: String): Seq[Int] = Bpe.encodeWord(w).toSeq

  test("encodeWord applies merges in rank order, left-to-right non-overlapping") {
    assert(ids("the") == Seq(E + 1), "th then the")
    assert(ids("line") == Seq('l'.toInt, E + 4), "in then ine")
    assert(ids("batch") == Seq('b'.toInt, E + 5, 'c'.toInt, 'h'.toInt),
      "at merges; t,c never forms th")
    assert(ids("order") == Seq('o'.toInt, 'r'.toInt, 'd'.toInt, E + 2))
    assert(ids("query") == Seq(E + 9, E + 2, 'y'.toInt), "qu + er")
    assert(ids("window") ==
      Seq('w'.toInt, E + 3, 'd'.toInt, E + 7), "in + ow")
    assert(ids("x") == Seq('x'.toInt) && ids("") == Seq.empty)
  }

  test("greedy left-to-right tie-breaking matches string replace semantics") {
    // t,h,t,h,e: rank 0 rewrites both 'th's (non-overlapping), THEN rank 1
    // merges the second output with 'e' — same as sequential replace()
    assert(ids("ththe") == Seq(E, E + 1))
    // a,a,a,t: the single 'at' match is at the tail; leading 'aa' untouched
    assert(ids("aaat") == Seq('a'.toInt, 'a'.toInt, E + 5))
    // overlapping candidate pairs resolve leftmost-first: "erer" under er
    assert(ids("erer") == Seq(E + 2, E + 2))
  }

  test("tokenStats aggregates counts and exact id sums per document") {
    val df = Seq((1L, "the line scans fast"), (2L, ""), (3L, "the the"))
      .toDF("doc_id", "text")
    val got = Bpe.tokenStats(df, "text", "doc_id")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val d1 = Seq(Seq(E + 1), Seq('l'.toInt, E + 4),
      Seq('s'.toInt, 'c'.toInt, E + 8, 's'.toInt),
      Seq('f'.toInt, 'a'.toInt, E + 6))
    assert(got(0) == ((1L, 4L, d1.map(_.size).sum.toLong,
      d1.flatten.map(_.toLong).sum)))
    // empty text: one empty whitespace token (TextAnalysis.tokens parity),
    // zero symbols
    assert(got(1) == ((2L, 1L, 0L, 0L)))
    assert(got(2) == ((3L, 2L, 2L, 2L * (E + 1))))
  }

  test("merge outputs never collide with base symbols or whitespace") {
    Bpe.DefaultMerges.foreach { case (l, r, o) =>
      assert(o >= 0xE000 && o < 0xF900, "private use area")
      assert(!Character.isWhitespace(l) && !Character.isWhitespace(r))
    }
    // ranks referenced by later pairs must already exist
    Bpe.DefaultMerges.zipWithIndex.foreach { case ((l, r, _), i) =>
      for (s <- Seq(l, r) if s >= Bpe.MergeBase)
        assert(s - Bpe.MergeBase < i, s"rank $i references unmade merge")
    }
  }

  /** A random WELL-FORMED merge table over `nBase` base letters: each
    * pair's symbols are base characters or outputs of EARLIER merges (the
    * invariant every learned BPE table satisfies, and the precondition of
    * the heap apply's equivalence proof). Distinct pairs only.
    */
  private def buildTable(n: Int, seeds: Seq[Int],
      nBase: Int = 6): IndexedSeq[(Int, Int, Int)] = {
    val pool = scala.collection.mutable.ArrayBuffer.range('a'.toInt, 'a'.toInt + nBase)
    val used = scala.collection.mutable.Set.empty[(Int, Int)]
    val out = IndexedSeq.newBuilder[(Int, Int, Int)]
    var rank = 0
    var s = 0
    while (rank < n && s + 1 < seeds.length) {
      val l = pool(math.abs(seeds(s)) % pool.length)
      val r = pool(math.abs(seeds(s + 1)) % pool.length)
      s += 2
      if (!used.contains((l, r))) {
        used += ((l, r))
        val o = Bpe.MergeBase + rank
        out += ((l, r, o))
        pool += o
        rank += 1
      }
    }
    out.result()
  }

  test("property: heap apply == rank-order apply on random valid tables and words") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genTable = for {
      n <- Gen.choose(0, 48)
      seeds <- Gen.listOfN(3 * n + 2, Gen.choose(0, Int.MaxValue))
    } yield buildTable(n, seeds)
    val genWord = for {
      len <- Gen.choose(0, 40)
      cs <- Gen.listOfN(len, Gen.choose('a', 'f'))
    } yield cs.mkString
    val prop = Prop.forAll(genTable, Gen.listOfN(20, genWord)) { (t, ws) =>
      ws.forall { w =>
        val fast = Bpe.encodeWord(w, t).toSeq
        val ref = Bpe.encodeWordRankOrder(w, t).toSeq
        if (fast != ref)
          System.err.println(s"MISMATCH word=$w table=$t fast=$fast ref=$ref")
        fast == ref
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"property failed: ${res.status}")
    // and the adversarial shapes the heap's lazy deletion must survive
    val t = Bpe.DefaultMerges
    for (w <- Seq("ththththe", "aaaaaat", "ererer", "qqu", "thhe", "")) {
      assert(Bpe.encodeWord(w, t).toSeq ==
        Bpe.encodeWordRankOrder(w, t).toSeq, s"word $w")
    }
  }

  test("heap apply cost is bounded by the word, not the table (8k synthetic merges)") {
    // 8192-merge synthetic table over 26 letters — the production-vocab
    // regime where the O(V·len) rank-order loop is the wrong asymptotic.
    // V-independence is asserted as an OPERATION-COUNT bound (table lookups
    // per word vs word length) on an instrumented table — a wall-clock
    // ratio here flaked under load.
    val rnd = new scala.util.Random(7)
    val big = buildTable(8192,
      IndexedSeq.fill(3 * 8192 + 2)(rnd.nextInt(Int.MaxValue)), nBase = 26)
    assert(big.size == 8192)
    val words = IndexedSeq.fill(2000)(
      (0 until (3 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString)
    val counter = new java.util.concurrent.atomic.AtomicLong
    val table = Bpe.MergeTable.counting(big, counter)
    var sink = 0L
    words.foreach(w => sink += Bpe.encodeWordWith(w, table).length)
    assert(sink > 0)
    val lookups = counter.get()
    val totalChars = words.map(_.length.toLong).sum
    // heap apply: ≤ (len-1) initial offers + ≤2 offers per merge (≤ len-1
    // merges) + ≤1 revalidation per pop (pops ≤ pushes) → ≤ 6·len lookups;
    // assert with slack. A V-proportional regression would need ≥ V = 8192
    // lookups per word — three orders of magnitude over this bound.
    val bound = 8L * totalChars + 8L * words.size
    info(s"8k-merge table, ${words.size} words, $totalChars chars: " +
      s"$lookups table lookups (bound $bound, V·words = ${8192L * words.size})")
    assert(lookups <= bound,
      s"heap apply no longer V-independent: $lookups lookups > bound $bound")
    // results identical at scale too
    words.take(100).foreach { w =>
      assert(Bpe.encodeWordWith(w, table).toSeq ==
        Bpe.encodeWordRankOrder(w, big).toSeq)
    }
  }

  test("custom-table encode builds the MergeTable once per table instance, not per word") {
    val rnd = new scala.util.Random(11)
    val custom = buildTable(256,
      IndexedSeq.fill(3 * 256 + 2)(rnd.nextInt(Int.MaxValue)), nBase = 26)
    val words = IndexedSeq.fill(500)(
      (0 until (3 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString)
    val before = Bpe.MergeTable.builds.get()
    val viaDefault = words.map(w => Bpe.encodeWord(w).toSeq)
    assert(Bpe.MergeTable.builds.get() == before,
      "DefaultMerges path must never rebuild its table")
    words.foreach(w => Bpe.encodeWord(w, custom))
    val afterCustom = Bpe.MergeTable.builds.get()
    assert(afterCustom - before == 1L,
      s"expected ONE table build for ${words.size} words on one custom " +
        s"table instance, got ${afterCustom - before}")
    // memoized path is result-identical to an explicitly built table
    val explicit = Bpe.MergeTable(custom)
    words.take(50).foreach { w =>
      assert(Bpe.encodeWord(w, custom).toSeq ==
        Bpe.encodeWordWith(w, explicit).toSeq)
    }
    // and statsOf (the tokenStats per-row hot path) rides the same memo:
    // another custom instance costs exactly one more build
    val custom2 = buildTable(128,
      IndexedSeq.fill(3 * 128 + 2)(rnd.nextInt(Int.MaxValue)), nBase = 26)
    val base = Bpe.MergeTable.builds.get()
    words.take(100).foreach(w => Bpe.statsOf(w, custom2))
    assert(Bpe.MergeTable.builds.get() - base == 1L,
      "statsOf must reuse the memoized table across rows")
    assert(viaDefault.nonEmpty)
  }

  test("memo holds per thread: concurrent tasks with distinct table " +
      "instances do not evict each other") {
    // Each Spark task deserializes its OWN merges instance and runs on its
    // own executor thread. With a shared single slot, T concurrent tasks
    // ping-pong it and rebuild O(V) per word; the ThreadLocal slot gives
    // each thread a standing hit: total builds == one per (thread, table
    // instance), independent of word count.
    val rnd = new scala.util.Random(17)
    val nThreads = 8
    val wordsPerThread = 400
    val tables = IndexedSeq.fill(nThreads)(buildTable(128,
      IndexedSeq.fill(3 * 128 + 2)(rnd.nextInt(Int.MaxValue)), nBase = 26))
    val words = IndexedSeq.fill(wordsPerThread)(
      (0 until (3 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString)
    val start = new java.util.concurrent.CountDownLatch(1)
    val before = Bpe.MergeTable.builds.get()
    val threads = tables.map { t =>
      val th = new Thread(() => {
        start.await()
        words.foreach(w => Bpe.encodeWord(w, t))
      })
      th.start(); th
    }
    start.countDown()
    threads.foreach(_.join())
    val built = Bpe.MergeTable.builds.get() - before
    assert(built == nThreads.toLong,
      s"expected one build per thread ($nThreads), got $built — the memo " +
        "is being evicted across concurrent tasks")
  }

  // ---------------- merge-table LEARNING ----------------

  test("learnLocal runs Sennrich's greedy recurrence (hand-checked)") {
    // counts: (a,a)=3, (a,b)=6, (b,c)=1 → merge 0 = (a,b)→E
    // vocab: aE×3, E×2, Ec×1 → (a,E)=3, (E,c)=1 → merge 1 = (a,E)→E+1
    // vocab: F×3, E×2, Ec×1 → (E,c)=1 → merge 2 = (E,c)→E+2; then exhausted
    val vocab = Map("aab" -> 3L, "ab" -> 2L, "abc" -> 1L)
    assert(Bpe.learnLocal(vocab, 5) == IndexedSeq(
      ('a'.toInt, 'b'.toInt, E), ('a'.toInt, E, E + 1), (E, 'c'.toInt, E + 2)))
    // tie-break: equal counts resolve (left ASC, right ASC)
    assert(Bpe.learnLocal(Map("ba" -> 1L, "ab" -> 1L), 1) ==
      IndexedSeq(('a'.toInt, 'b'.toInt, E)))
    // overlapping adjacency counting: "aaa" counts (a,a) twice, and the
    // leftmost-non-overlapping rewrite yields Ea
    // merge 1 is then a count tie between (E,a) and (b,c), won by (b,c)
    // on the left-ASC tie-break (b=98 < E=0xE000)
    assert(Bpe.learnLocal(Map("aaa" -> 1L, "bc" -> 1L), 3) ==
      IndexedSeq(('a'.toInt, 'a'.toInt, E), ('b'.toInt, 'c'.toInt, E + 1),
        (E, 'a'.toInt, E + 2)))
  }

  test("property: batched learner == sequential learner over random corpora, widths, truncations") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tiny alphabet forces heavy symbol sharing (conflicts) and count ties
    // — exactly the regimes selectBatch's truncation rules exist for
    val genWord = for {
      len <- Gen.choose(1, 8)
      cs <- Gen.listOfN(len, Gen.choose('a', 'd'))
    } yield cs.mkString
    val genVocab = for {
      n <- Gen.choose(1, 12)
      ws <- Gen.listOfN(n, genWord)
      fs <- Gen.listOfN(n, Gen.choose(1L, 9L))
    } yield ws.zip(fs)
    val prop = Prop.forAll(genVocab, Gen.choose(0, 12), Gen.choose(1, 8),
        Gen.choose(2, 6)) { (vocab, nMerges, maxBatch, topK) =>
      val seq = Bpe.learnLocal(vocab, nMerges)
      val bat = Bpe.learnLocalBatched(vocab, nMerges, maxBatch, topK)
      if (seq != bat)
        System.err.println(s"MISMATCH vocab=$vocab n=$nMerges " +
          s"maxBatch=$maxBatch topK=$topK seq=$seq bat=$bat")
      seq == bat
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("distributed learn == sequential learner, and the learned table round-trips the apply") {
    val docs = Seq(
      "the merge table learns the pairs the corpus repeats",
      "fast scans merge fast batches fast",
      "the the the scan scans scan",
      "a ab abc abcd repeated ab ab abc").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val vocab = docs.flatMap(_._2.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    for ((n, mb, tk) <- Seq((16, 4, 4), (12, 64, 256), (8, 1, 2))) {
      val seq = Bpe.learnLocal(vocab, n)
      val dist = Bpe.learn(df, "text", n, maxBatch = mb, topK = tk)
      assert(dist == seq, s"n=$n maxBatch=$mb topK=$tk")
    }
    // the learned table is well-formed (each pair references base chars or
    // earlier outputs), so the heap apply provably equals rank order on it
    val learned = Bpe.learn(df, "text", 16, maxBatch = 8, topK = 16)
    learned.zipWithIndex.foreach { case ((l, r, o), i) =>
      assert(o == E + i)
      for (s <- Seq(l, r) if s >= E) assert(s - E < i)
    }
    for (w <- Seq("the", "fast", "scans", "abcd", "merge", "zzz", ""))
      assert(Bpe.encodeWord(w, learned).toSeq ==
        Bpe.encodeWordRankOrder(w, learned).toSeq, s"word $w")
    // exhaustion: a corpus with fewer possible merges than requested stops
    // early with exactly the sequential prefix
    val tiny = Seq((0L, "ab ab b a")).toDF("doc_id", "text")
    assert(Bpe.learn(tiny, "text", 10) ==
      Bpe.learnLocal(Map("ab" -> 2L, "b" -> 1L, "a" -> 1L), 10))
  }
}
