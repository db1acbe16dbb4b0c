package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Gopher REPETITION signals (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", Appendix
  * A.1.2) as ONE pass over each document — the half of the published
  * Gopher filter that kills boilerplate, complementing the A.1.1
  * document-level rules in [[graft.operators.TextAnalysis.gopherRules]].
  * The alternative formulation (explode lines/n-grams → groupBy → join
  * back) shuffles the corpus ~10× (once per n-gram order); this
  * expression is a narrow projection fused into the scan — zero shuffle
  * at 100 TB, like its sibling [[RepetitionStats]].
  *
  * All outputs are EXACT integers (numerators/denominators), never
  * ratios: thresholds compare cross-multiplied in
  * [[graft.operators.TextAnalysis.gopherRepetitionRules]], so engines
  * can never disagree on a boundary. Character counts are Unicode CODE
  * POINTS (what an external engine's `length()` counts), not UTF-16
  * units.
  *
  * Grain definitions (deterministic, replayable in plain SQL — each a
  * documented choice where the paper is underspecified):
  *
  *   - lines = NONEMPTY segments of split(text, "\n"); paragraphs =
  *     NONEMPTY segments of split(text, "\n\n") (left-to-right,
  *     non-overlapping, so "a\n\n\nb" → ["a", "\nb"]). Blank segments
  *     are structure, not content — counting them would make any
  *     3-paragraph document "contain duplicate lines".
  *   - `dup_*` counts occurrences BEYOND THE FIRST (a line seen 3×
  *     contributes 2), and `dup_*_chars` their character mass — the
  *     standard open reimplementation of the paper's "fraction of
  *     lines/characters in duplicated lines".
  *   - words = nonempty segments of split(text, /[ \t\n\r\f]+/) — the
  *     whitespace class spelled EXPLICITLY (Java \s has \x0B, RE2's
  *     does not). `word_chars` = Σ code points over words (separators
  *     excluded) and is the denominator of every n-gram fraction.
  *   - top n-gram (n = 2, 3, 4): among word n-grams (space-joined,
  *     overlapping), the one with the LEXICOGRAPHICALLY GREATEST
  *     (count, word-chars) pair — count first, char length as the
  *     deterministic tie-break the paper leaves unspecified.
  *     `topN_chars` = count × word-chars of that n-gram (its total
  *     character mass, the paper's numerator).
  *   - duplicate n-grams (n = 5..10): a word POSITION is covered iff
  *     some n-gram occurrence containing it appears ≥ 2 times in the
  *     document; `dupN_chars` = Σ word chars over covered positions.
  *     This counts each character ONCE even under overlapping duplicate
  *     n-grams — the paper's stated intent ("taking care not to count
  *     characters that occur in overlapping n-grams more than once")
  *     without its order-dependent greedy scan, and it is exactly
  *     replayable by a position-coverage join in any SQL engine.
  *
  * Empty/degenerate documents yield all-zero stats (vacuously kept by
  * the ≤-threshold rules — the A.1.1 minimum-word gate is what rejects
  * them).
  */
case class GopherRepetition(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherRepetition.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gopher_repetition expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    GopherRepetition.computeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = GopherRepetition.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.computeUtf8($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherRepetition {

  val TopNgramOrders: Seq[Int] = Seq(2, 3, 4)
  val DupNgramOrders: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)

  val schema: StructType = StructType(
    Seq(
      StructField("n_lines", LongType, nullable = false),
      StructField("dup_lines", LongType, nullable = false),
      StructField("line_chars", LongType, nullable = false),
      StructField("dup_line_chars", LongType, nullable = false),
      StructField("n_paras", LongType, nullable = false),
      StructField("dup_paras", LongType, nullable = false),
      StructField("para_chars", LongType, nullable = false),
      StructField("dup_para_chars", LongType, nullable = false),
      StructField("word_chars", LongType, nullable = false)) ++
      TopNgramOrders.map(n =>
        StructField(s"top${n}_chars", LongType, nullable = false)) ++
      DupNgramOrders.map(n =>
        StructField(s"dup${n}_chars", LongType, nullable = false)))

  private def codePoints(s: String): Long =
    s.codePointCount(0, s.length).toLong

  // String.split(regex) recompiles the Pattern on EVERY call for any
  // multi-char pattern — a per-row constant that dominates short
  // documents. Precompiled once; Pattern.split is semantically identical.
  private val WsPat = java.util.regex.Pattern.compile("[ \t\n\r\f]+")
  private val ParaPat = java.util.regex.Pattern.compile("\n\n")

  /** (n, dups-beyond-first, total chars, dup chars) over nonempty parts. */
  private def dupStats(parts: Array[String]): (Long, Long, Long, Long) = {
    val counts = new java.util.HashMap[String, Int]()
    var n = 0L
    var chars = 0L
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.nonEmpty) {
        n += 1
        chars += codePoints(p)
        counts.merge(p, 1, Integer.sum(_, _))
      }
      i += 1
    }
    var dups = 0L
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > 1) {
        dups += e.getValue - 1L
        dupChars += (e.getValue - 1L) * codePoints(e.getKey)
      }
    }
    (n, dups, chars, dupChars)
  }

  /** Referenced from generated code — keep public + stable.
    *
    * N-gram counting runs over INTERNED word ids (each distinct word
    * mapped to a small int once), so the 9 per-order passes compare and
    * hash int windows instead of building a joined String per gram —
    * words are whitespace-free, so two space-joined n-grams are equal
    * exactly when their word (= id) sequences are equal, and the char
    * mass of a gram is a prefix-sum difference over word code-point
    * lengths (joined length minus the n−1 spaces). Bit-identical outputs
    * to the string formulation, at a fraction of the allocation/hash
    * cost — this expression is the whole cost of the Gopher gate, so its
    * constant factor IS the operator's 100 TB scan speed.
    */
  def computeUtf8(s: UTF8String): InternalRow = {
    val text = s.toString
    val (nLines, dupLines, lineChars, dupLineChars) =
      dupStats(text.split("\n", -1))
    val (nParas, dupParas, paraChars, dupParaChars) =
      dupStats(ParaPat.split(text, -1))

    val words0 = WsPat.split(text)
    val idOf = new java.util.HashMap[String, Integer]()
    val ids = new Array[Int](words0.length)
    val wlen = new Array[Long](words0.length)
    var nWords = 0
    var i = 0
    while (i < words0.length) {
      val w = words0(i)
      if (w.nonEmpty) {
        var id = idOf.get(w)
        if (id == null) { id = Integer.valueOf(idOf.size); idOf.put(w, id) }
        ids(nWords) = id.intValue
        wlen(nWords) = codePoints(w)
        nWords += 1
      }
      i += 1
    }
    // prefix char sums: wpre(i) = Σ wlen[0..i)
    val wpre = new Array[Long](nWords + 1)
    i = 0
    while (i < nWords) { wpre(i + 1) = wpre(i) + wlen(i); i += 1 }
    val wordChars = wpre(nWords)

    /** One open-addressing pass over the order-`n` gram windows.
      * wantTop: argmax (count, char mass) product — [[TopNgramOrders]];
      * else: char mass of positions covered by any gram occurring ≥ 2
      * times — [[DupNgramOrders]]. Exact: slot equality compares the id
      * windows themselves, never just hashes.
      */
    def scan(n: Int, wantTop: Boolean): Long = {
      if (nWords < n) return 0L
      val mGrams = nWords - n + 1
      var cap = 4
      while (cap < mGrams * 2) cap <<= 1
      val slotPos = new Array[Int](cap) // first occurrence position; -1 free
      val slotCnt = new Array[Int](cap)
      java.util.Arrays.fill(slotPos, -1)
      val slotOf = new Array[Int](mGrams)
      var p = 0
      while (p < mGrams) {
        var h = 1
        var j = p
        while (j < p + n) { h = h * 31 + ids(j); j += 1 }
        var slot = h & (cap - 1)
        var done = false
        while (!done) {
          val fp = slotPos(slot)
          if (fp == -1) { slotPos(slot) = p; slotCnt(slot) = 1; done = true }
          else {
            var eq = true
            var q = 0
            while (eq && q < n) { eq = ids(fp + q) == ids(p + q); q += 1 }
            if (eq) { slotCnt(slot) += 1; done = true }
            else slot = (slot + 1) & (cap - 1)
          }
        }
        slotOf(p) = slot
        p += 1
      }
      if (wantTop) {
        var bestCnt = 0L
        var bestCh = 0L
        var sIdx = 0
        while (sIdx < cap) {
          val fp = slotPos(sIdx)
          if (fp != -1) {
            val cnt = slotCnt(sIdx).toLong
            val ch = wpre(fp + n) - wpre(fp)
            if (cnt > bestCnt || (cnt == bestCnt && ch > bestCh)) {
              bestCnt = cnt; bestCh = ch
            }
          }
          sIdx += 1
        }
        bestCnt * bestCh
      } else {
        val covered = new Array[Boolean](nWords)
        p = 0
        while (p < mGrams) {
          if (slotCnt(slotOf(p)) >= 2) {
            var j = p
            while (j < p + n) { covered(j) = true; j += 1 }
          }
          p += 1
        }
        var sum = 0L
        var q = 0
        while (q < nWords) { if (covered(q)) sum += wlen(q); q += 1 }
        sum
      }
    }

    new GenericInternalRow(
      Array[Any](nLines, dupLines, lineChars, dupLineChars,
        nParas, dupParas, paraChars, dupParaChars, wordChars) ++
        TopNgramOrders.map(n => scan(n, wantTop = true): Any) ++
        DupNgramOrders.map(n => scan(n, wantTop = false): Any))
  }

  def gopherRepetition(c: Column): Column =
    ColumnBridge.column(GopherRepetition(ColumnBridge.expression(c)))
}
