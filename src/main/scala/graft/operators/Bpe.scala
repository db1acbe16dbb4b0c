package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer APPLY (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016 — the
  * public algorithm every modern LLM tokenizer descends from): words start
  * as character-symbol sequences and a learned MERGES table is applied in
  * rank order, each merge rewriting every left-to-right non-overlapping
  * occurrence of its symbol pair into one new symbol.
  *
  * Design for exactness and scale:
  *
  *   - merge OUTPUTS are single private-use-area codepoints (U+E000 + rank),
  *     so a symbol sequence is always literally a string with one char per
  *     symbol. Applying merge i is then EXACTLY a leftmost-non-overlapping
  *     string `replace` — which is how the DuckDB oracle reproduces the
  *     whole encoder as a replace chain, hash-identically, with the merges
  *     table as the single source of truth for both engines;
  *   - merge pairs never contain whitespace, so word boundaries need no
  *     special-casing: a pair cannot match across a space;
  *   - the encode runs as ONE mapPartitions pass (narrow, fused with the
  *     scan, no shuffle, no UDF registry) with the merges table in the task
  *     closure — the 100 TB shape is "tokenize at scan speed, aggregate
  *     counts after".
  *
  * Token IDS are the symbol codepoints themselves (base char → its
  * codepoint, merge i → 0xE000+i): stable, engine-reproducible integers.
  */
object Bpe {

  /** Merge output symbol for rank i. */
  val MergeBase = 0xE000

  /** The in-repo merges table, rank order = application order. Later pairs
    * reference earlier outputs by their U+E000+rank symbol (e.g. rank 1
    * merges rank 0's "th" with "e" into "the"). Chosen for the bench
    * corpus's vocabulary, but the operator is table-generic.
    */
  val DefaultMergePairs: IndexedSeq[(String, String)] = IndexedSeq(
    "t" -> "h", // 0: th
    "\uE000" -> "e", // 1: the
    "e" -> "r", // 2: er (order, merge, filter, customer)
    "i" -> "n", // 3: in (window, join, line)
    "\uE003" -> "e", // 4: ine (line)
    "a" -> "t", // 5: at (data, batch)
    "s" -> "t", // 6: st (stream, fast)
    "o" -> "w", // 7: ow (window, row, slow)
    "a" -> "n", // 8: an (scan)
    "q" -> "u") // 9: qu (query)

  /** (left, right, output) codepoint triples in rank order. */
  val DefaultMerges: IndexedSeq[(Int, Int, Int)] =
    DefaultMergePairs.zipWithIndex.map { case ((l, r), i) =>
      require(l.codePointCount(0, l.length) == 1 &&
        r.codePointCount(0, r.length) == 1,
        s"merge pair ($l, $r) must be single-codepoint symbols")
      require(!l.exists(_.isWhitespace) && !r.exists(_.isWhitespace),
        "merge pairs must not contain whitespace")
      (l.codePointAt(0), r.codePointAt(0), MergeBase + i)
    }

  /** Reference apply — the literal Sennrich formulation: one left-to-right
    * non-overlapping rewrite pass PER MERGE, in rank order. O(V·len) per
    * word: correct at any table size but the wrong asymptotic regime at a
    * 32k-merge production vocabulary. Kept as the executable spec the fast
    * apply is property-checked against (BpeSpec).
    */
  def encodeWordRankOrder(word: String,
      merges: IndexedSeq[(Int, Int, Int)] = DefaultMerges): Array[Int] = {
    var syms = word.codePoints().toArray
    merges.foreach { case (l, r, o) =>
      if (syms.length >= 2) {
        val out = new Array[Int](syms.length)
        var i = 0
        var j = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out(j) = o
            i += 2
          } else {
            out(j) = syms(i)
            i += 1
          }
          j += 1
        }
        syms = java.util.Arrays.copyOf(out, j)
      }
    }
    syms
  }

  /** Pair → (rank, output) lookup for the fast apply, built once per table
    * (per task, not per word). Key packs the two symbol codepoints into one
    * Long, value packs rank and output — zero boxing on the hot path.
    */
  final class MergeTable private (
      private val pairs: java.util.HashMap[java.lang.Long, java.lang.Long],
      val size: Int,
      lookupCounter: java.util.concurrent.atomic.AtomicLong) {
    /** rank<<32 | output for the pair (l, r), or -1 when not a merge.
      * Values stay BOXED in the map: an unboxed-typed get would turn the
      * null miss into 0 — a phantom rank-0 merge for every absent pair.
      */
    @inline def lookup(l: Int, r: Int): Long = {
      if (lookupCounter ne null) lookupCounter.incrementAndGet()
      val v = pairs.get((l.toLong << 32) | (r.toLong & 0xffffffffL))
      if (v eq null) -1L else v.longValue()
    }
  }

  object MergeTable {
    /** Total tables ever built in this JVM — the instrumentation the memo
      * contract is asserted on (one build per distinct table instance, not
      * per word).
      */
    private[graft] val builds = new java.util.concurrent.atomic.AtomicLong

    def apply(merges: IndexedSeq[(Int, Int, Int)]): MergeTable =
      build(merges, null)

    /** Test-only: a table whose every [[MergeTable.lookup]] bumps `counter`
      * — the V-independence of the heap apply is asserted as an
      * OPERATION-COUNT bound, not a wall-clock ratio (which flakes under
      * load).
      */
    private[graft] def counting(merges: IndexedSeq[(Int, Int, Int)],
        counter: java.util.concurrent.atomic.AtomicLong): MergeTable =
      build(merges, counter)

    private def build(merges: IndexedSeq[(Int, Int, Int)],
        counter: java.util.concurrent.atomic.AtomicLong): MergeTable = {
      builds.incrementAndGet()
      val m = new java.util.HashMap[java.lang.Long, java.lang.Long](merges.size * 2)
      merges.zipWithIndex.foreach { case ((l, r, o), rank) =>
        // first (lowest) rank wins on duplicate pairs — the rank-order pass
        // would have consumed every occurrence at the earlier rank already
        m.putIfAbsent((l.toLong << 32) | (r.toLong & 0xffffffffL),
          (rank.toLong << 32) | (o.toLong & 0xffffffffL))
      }
      new MergeTable(m, merges.size, counter)
    }
  }

  private val DefaultTable = MergeTable(DefaultMerges)

  /** Single-slot identity memo for CUSTOM tables: the common shape is one
    * `merges` value captured by a task closure and applied to every word of
    * the partition — without the memo each word rebuilt the O(V) hashmap,
    * silently reintroducing the table-proportional cost the heap apply
    * exists to kill. One slot (not an unbounded cache) because each Spark
    * task deserializes its own `merges` instance: an identity-keyed MAP
    * would grow per task for the life of the executor. The slot is
    * PER-THREAD (a Spark task runs on one executor thread): a shared
    * `@volatile` slot would ping-pong between concurrent tasks' distinct
    * deserialized instances on the same executor, rebuilding the O(V)
    * hashmap per word again — the exact cost the memo exists to kill.
    */
  private val memoTable =
    new ThreadLocal[(IndexedSeq[(Int, Int, Int)], MergeTable)] {
      override def initialValue(): (IndexedSeq[(Int, Int, Int)], MergeTable) =
        (DefaultMerges, DefaultTable)
    }

  private def tableFor(merges: IndexedSeq[(Int, Int, Int)]): MergeTable = {
    if (merges eq DefaultMerges) return DefaultTable
    val m = memoTable.get()
    if (m._1 eq merges) m._2
    else {
      val t = MergeTable(merges)
      memoTable.set((merges, t))
      t
    }
  }

  /** Greedy BPE encode of ONE word — the pair-indexed HEAP apply (the
    * standard production formulation, e.g. the original GPT-2 encoder):
    * repeatedly merge the lowest-ranked pair PRESENT in the word,
    * left-to-right within a rank, maintaining a doubly-linked symbol list
    * and a lazy-deletion min-heap of candidate pairs. Only merges whose
    * pair actually occurs are ever touched, so the cost is
    * O(len·log len) INDEPENDENT of the table size V — at a 32k-merge
    * vocabulary this is the difference between tokenizing at scan speed
    * and scanning the merges table per word.
    *
    * Equivalent to [[encodeWordRankOrder]] for every WELL-FORMED table
    * (each pair references only base characters or earlier merge outputs —
    * true of any learned BPE table, enforced for [[DefaultMerges]]):
    * merging rank k can only create pairs containing k's output symbol,
    * whose ranks are all > k, so no lower-ranked pair ever (re)appears
    * after its turn — the iterative lowest-rank-first order visits exactly
    * the rank-order pass's rewrites. Property-checked in BpeSpec over
    * random valid tables and words.
    */
  def encodeWord(word: String,
      merges: IndexedSeq[(Int, Int, Int)] = DefaultMerges): Array[Int] =
    encodeWordWith(word, tableFor(merges))

  def encodeWordWith(word: String, table: MergeTable): Array[Int] = {
    val syms = word.codePoints().toArray
    val n = syms.length
    if (n < 2 || table.size == 0) return syms
    // doubly-linked list over the symbol array; -1 = end, dead nodes have
    // next(i) = -2
    val next = new Array[Int](n)
    val prev = new Array[Int](n)
    var i = 0
    while (i < n) { next(i) = i + 1; prev(i) = i - 1; i += 1 }
    next(n - 1) = -1
    // lazy-deletion min-heap of rank<<32|pos (both non-negative, so Long
    // order = (rank, pos) lexicographic = lowest rank first, leftmost first)
    var heap = new Array[Long](math.max(8, n))
    var heapN = 0
    def push(v: Long): Unit = {
      if (heapN == heap.length) heap = java.util.Arrays.copyOf(heap, heapN * 2)
      var c = heapN; heapN += 1; heap(c) = v
      while (c > 0 && heap((c - 1) >> 1) > heap(c)) {
        val p = (c - 1) >> 1
        val t = heap(p); heap(p) = heap(c); heap(c) = t; c = p
      }
    }
    def pop(): Long = {
      val top = heap(0); heapN -= 1; heap(0) = heap(heapN)
      var c = 0
      while (true) {
        val l = 2 * c + 1
        if (l >= heapN) return top
        val s = if (l + 1 < heapN && heap(l + 1) < heap(l)) l + 1 else l
        if (heap(c) <= heap(s)) return top
        val t = heap(c); heap(c) = heap(s); heap(s) = t; c = s
      }
      top
    }
    def offer(pos: Int): Unit = {
      val nx = next(pos)
      if (nx >= 0) {
        val ro = table.lookup(syms(pos), syms(nx))
        if (ro >= 0)
          push(((ro >>> 32) << 32) | pos.toLong)
      }
    }
    i = 0
    while (i < n - 1) { offer(i); i += 1 }
    var alive = n
    while (heapN > 0 && alive >= 2) {
      val top = pop()
      val pos = (top & 0xffffffffL).toInt
      val nx = next(pos)
      if (nx >= -1) { // node still alive
        if (nx >= 0) {
          val ro = table.lookup(syms(pos), syms(nx))
          // stale entries (symbols changed since push) re-validate here
          if (ro >= 0 && (ro >>> 32) == (top >>> 32)) {
            syms(pos) = (ro & 0xffffffffL).toInt
            // unlink nx
            val nnx = next(nx)
            next(nx) = -2
            next(pos) = nnx
            if (nnx >= 0) prev(nnx) = pos
            alive -= 1
            // the merged symbol forms two fresh candidate pairs
            val pv = prev(pos)
            if (pv >= 0) offer(pv)
            offer(pos)
          }
        }
      }
    }
    val out = new Array[Int](alive)
    var p = 0
    var j = 0
    while (p >= 0) { out(j) = syms(p); j += 1; p = next(p) }
    out
  }

  /** One-pass (n_words, n_tokens_bpe, sum_token_ids) for a document under
    * `merges` — the static helper both [[tokenStats]] paths share. Word
    * split follows [[TextAnalysis.tokens]]: empty text yields one empty
    * token, which encodes to zero symbols.
    */
  def statsOf(text: String,
      merges: IndexedSeq[(Int, Int, Int)]): (Long, Long, Long) = {
    val words = Option(text).getOrElse("").trim.split("\\s+")
    var nTok = 0L
    var sumIds = 0L
    words.foreach { w =>
      val syms = encodeWord(w, merges)
      nTok += syms.length
      var i = 0
      while (i < syms.length) { sumIds += syms(i); i += 1 }
    }
    (words.length.toLong, nTok, sumIds)
  }

  /** [[statsOf]] under the DEFAULT table as an InternalRow — the entry the
    * codegen'd [[graft.functions.BpeStats]] expression calls from generated
    * code (a custom table cannot ride a static call; use the mapPartitions
    * path for those).
    */
  def statsDefault(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val (nw, nt, sum) = statsOf(if (s == null) "" else s.toString, DefaultMerges)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nw, nt, sum))
  }

  /** Per-document BPE token statistics: word count (whitespace split, same
    * contract as [[TextAnalysis.tokens]]), total BPE token count, and the
    * exact integer sum of token ids — the aggregate that proves the id
    * assignment end to end under the oracle.
    *
    * Default table → ONE codegen'd expression fused into the scan
    * ([[graft.functions.BpeStats]] — no Dataset encode/decode, no shuffle);
    * a custom table falls back to the closure-carrying mapPartitions pass.
    */
  def tokenStats(df: DataFrame, textCol: String, idCol: String,
      merges: IndexedSeq[(Int, Int, Int)] = DefaultMerges): DataFrame =
    if (merges eq DefaultMerges) {
      df.select(col(idCol).cast("long").as(idCol),
          graft.functions.TextHashExprs.bpeStats(col(textCol)).as("_s"))
        .select(col(idCol), col("_s.n_words").as("n_words"),
          col("_s.n_tokens_bpe").as("n_tokens_bpe"),
          col("_s.sum_token_ids").as("sum_token_ids"))
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      df.select(col(idCol).cast("long"), col(textCol))
        .as[(Long, String)]
        .mapPartitions { rows =>
          rows.map { case (id, text) =>
            val (nw, nt, sum) = statsOf(text, merges)
            (id, nw, nt, sum)
          }
        }
        .toDF(idCol, "n_words", "n_tokens_bpe", "sum_token_ids")
    }

  /** The DuckDB expression computing the encoded symbol STRING of
    * `textExpr` under `merges` — the oracle side of the exactness contract
    * (each merge = one `replace` with single-char output).
    */
  def replaceChainSql(textExpr: String,
      merges: IndexedSeq[(Int, Int, Int)] = DefaultMerges): String =
    merges.foldLeft(textExpr) { case (acc, (l, r, o)) =>
      s"replace($acc, chr($l) || chr($r), chr($o))"
    }
}
