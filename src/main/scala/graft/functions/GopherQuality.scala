package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The five Gopher A.1.1 document integers
  * ([[graft.operators.TextAnalysis.gopherRules]]) in ONE pass over the
  * document — replacing a chain of builtins that each re-walked or
  * re-allocated the text (a token ARRAY from `split`, a full
  * re-concatenation under `concat_ws` for the length sum, three
  * `regexp_count` scans, two `filter(array)` materializations):
  *
  *   - `n_words`   = size(split(trim(text), "\\s+")) — including the
  *     single empty token a whitespace-only document yields, exactly like
  *     Spark's `split` (and DuckDB's string_split_regex);
  *   - `sum_len`   = Σ token code-point lengths
  *     (= length(concat_ws("", toks)));
  *   - `n_sym`     = LEFTMOST NON-OVERLAPPING counts of '#', "...", '…'
  *     over the UNTRIMMED text (= the three regexp_count calls summed);
  *   - `n_alpha`   = tokens containing an ASCII letter;
  *   - `n_stop`    = DISTINCT Gopher stopwords present as exact tokens.
  *
  * Trim matches Spark's `trim` exactly: leading/trailing SPACE (0x20)
  * only. The whitespace class matches Java's `\s` ([ \t\n\x0B\f\r]) —
  * what `split` compiles. Bit-identical integers to the builtin chain
  * (property-gated in TextAnalysisSpec), at one walk of the string.
  */
case class GopherQuality(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherQuality.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gopher_quality expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    GopherQuality.computeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = GopherQuality.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.computeUtf8($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherQuality {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_sym", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Referenced from generated code — keep public + stable. */
  def computeUtf8(s: UTF8String): InternalRow = {
    val text = s.toString
    val stop = graft.operators.TextAnalysis.GopherStopwords

    // symbol counts over the UNTRIMMED text: leftmost non-overlapping,
    // exactly regexp_count's semantics for these fixed patterns
    var nSym = 0L
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == '#' || c == '…') { nSym += 1; i += 1 }
      else if (c == '.' && i + 2 < n && text.charAt(i + 1) == '.' &&
        text.charAt(i + 2) == '.') { nSym += 1; i += 3 }
      else i += 1
    }

    // Spark trim(): strip leading/trailing SPACE (0x20) only
    var lo = 0
    var hi = n
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1

    // token walk over [lo, hi): split on \s+ runs with SPARK's
    // split(str, regex) semantics — limit -1, i.e. Pattern.split KEEPING
    // trailing empty segments (unlike Java String.split's default):
    //   - empty trimmed input yields ONE empty token (split("") = [""]);
    //   - a leading separator run yields a leading empty token
    //     ("\ta" → ["", "a"]);
    //   - a trailing separator run yields a trailing empty token
    //     ("a\t" → ["a", ""], "\t" → ["", ""]).
    // (Property-gated against the builtin in TextAnalysisSpec — the gate
    // caught exactly this limit distinction.)
    var nWords = 0L
    var sumLen = 0L
    var nAlpha = 0L
    val stopSeen = new Array[Boolean](stop.length)
    var tokStart = lo
    var p = lo
    def closeToken(endExcl: Int): Unit = {
      nWords += 1
      sumLen += text.codePointCount(tokStart, endExcl)
      var q = tokStart
      var alpha = false
      while (!alpha && q < endExcl) {
        val ch = text.charAt(q)
        alpha = (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')
        q += 1
      }
      if (alpha) nAlpha += 1
      val len = endExcl - tokStart
      var si = 0
      while (si < stop.length) {
        if (!stopSeen(si) && stop(si).length == len &&
          text.regionMatches(tokStart, stop(si), 0, len)) stopSeen(si) = true
        si += 1
      }
    }
    while (p < hi) {
      if (isWs(text.charAt(p))) {
        closeToken(p)
        // skip the whitespace run
        while (p < hi && isWs(text.charAt(p))) p += 1
        tokStart = p
      } else p += 1
    }
    closeToken(hi) // final segment — possibly empty (limit -1 keeps it)
    var nStop = 0L
    var si = 0
    while (si < stopSeen.length) { if (stopSeen(si)) nStop += 1; si += 1 }

    new GenericInternalRow(Array[Any](nWords, sumLen, nSym, nAlpha, nStop))
  }

  def gopherQuality(c: Column): Column =
    ColumnBridge.column(GopherQuality(ColumnBridge.expression(c)))
}
