package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token count plus marker-list hit counts in ONE pass over the document
  * — the shared integer core of [[graft.operators.TextAnalysis]]'s
  * composite text signals (`stopwordRatio`, `avgTokenLen`,
  * `qualityScore`, `langId`). Each of those composed builtins that
  * re-evaluated `split(trim(text), "\\s+")` per consumer (higher-order
  * `filter(array)` nodes are codegen-fallback, so common-subexpression
  * elimination could not merge them); this expression walks the string
  * once and counts, and the composites read its struct fields — the
  * fields share one evaluation via whole-stage codegen subexpression
  * elimination, exactly like [[GopherQuality]].
  *
  * Fields: `n_tokens` = size(split(trim(text), "\\s+")) (Spark split
  * semantics: limit −1, leading/trailing empty segments kept, empty
  * trimmed input = one empty token); `stop_hits` = tokens (WITH
  * multiplicity) ∈ [[graft.operators.TextAnalysis.stopwordsEn]];
  * `hits_<lang>` = tokens ∈ that language's marker list
  * ([[graft.operators.TextAnalysis.langMarkers]] order). Bit-identical
  * to the builtin chain (property-gated in TextAnalysisSpec).
  */
case class TokenHits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenHits.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_hits expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TokenHits.computeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = TokenHits.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.computeUtf8($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenHits {

  /** stopwordsEn first, then the langMarkers lists in declaration order. */
  private def lists: IndexedSeq[Seq[String]] =
    graft.operators.TextAnalysis.stopwordsEn +:
      graft.operators.TextAnalysis.langMarkers.map(_._2).toIndexedSeq

  val schema: StructType = StructType(
    StructField("n_tokens", LongType, nullable = false) +:
      StructField("stop_hits", LongType, nullable = false) +:
      graft.operators.TextAnalysis.langMarkers.map { case (l, _) =>
        StructField(s"hits_$l", LongType, nullable = false)
      })

  // word -> indices of the lists containing it (words overlap across
  // lists: "the"/"to"/"of" are both stopwords and en markers, "de" sits
  // in es AND fr) — built once per JVM
  private lazy val wordLists: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    lists.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }
  private lazy val maxWordLen: Int =
    lists.flatten.map(_.length).max

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Referenced from generated code — keep public + stable. */
  def computeUtf8(s: UTF8String): InternalRow = {
    val text = s.toString
    val nLists = lists.length
    val counts = new Array[Long](nLists)
    // Spark trim(): leading/trailing SPACE (0x20) only
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    var nTokens = 0L
    var tokStart = lo
    var p = lo
    def closeToken(endExcl: Int): Unit = {
      nTokens += 1
      val len = endExcl - tokStart
      if (len > 0 && len <= maxWordLen) {
        val arr = wordLists.get(text.substring(tokStart, endExcl))
        if (arr != null) {
          var j = 0
          while (j < arr.length) { counts(arr(j)) += 1L; j += 1 }
        }
      }
    }
    while (p < hi) {
      if (isWs(text.charAt(p))) {
        closeToken(p)
        while (p < hi && isWs(text.charAt(p))) p += 1
        tokStart = p
      } else p += 1
    }
    closeToken(hi) // final segment, possibly empty (split limit -1 keeps it)
    new GenericInternalRow((nTokens +: counts.toSeq).toArray[Any])
  }

  def tokenHits(c: Column): Column =
    ColumnBridge.column(TokenHits(ColumnBridge.expression(c)))
}
