package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-shingles of a string as a native Catalyst expression: one pass over
  * the text, no HOF lambdas (interpreted), no explode+window shuffle.
  *
  * Semantics (shared with the DuckDB oracles and the window-based
  * formulation in Dedup.shingleStrings):
  *   - tokens = trim(text) split on runs of whitespace;
  *   - m ≥ n tokens → the m−n+1 full shingles, space-joined;
  *   - m < n tokens → ONE partial shingle = all tokens space-joined;
  *   - duplicates kept (callers dedupe at the hash level when needed).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(
      WordShingles.shingle(s, n).map(UTF8String.fromString))
  }

  // Interpreted eval is already a single tight Java loop; wrap it for codegen
  // so the expression participates in whole-stage pipelines without a
  // per-element lambda.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.shingleUtf8($c, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  /** Core shingler — referenced from generated code, keep public + stable. */
  def shingle(s: String, n: Int): Array[String] = {
    val toks = tokenize(s)
    if (toks.length == 0) Array("")
    else if (toks.length < n) Array(toks.mkString(" "))
    else {
      val out = new Array[String](toks.length - n + 1)
      var i = 0
      while (i < out.length) {
        val sb = new java.lang.StringBuilder()
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        out(i) = sb.toString
        i += 1
      }
      out
    }
  }

  def shingleUtf8(s: UTF8String, n: Int): Array[UTF8String] =
    shingle(s.toString, n).map(UTF8String.fromString)

  /** trim + split on whitespace runs, matching String.split("\\s+") on
    * trimmed input (and DuckDB string_split_regex(trim(x), '\s+')).
    * Shared with [[TextHashing.simHash]]'s tokenization.
    */
  // precompiled: String.split("\\s+") recompiles the Pattern per call —
  // a per-row constant on the hottest shingling path. Identical splits.
  private val WsPat = java.util.regex.Pattern.compile("\\s+")

  private[functions] def tokenize(s: String): Array[String] =
    WsPat.split(s.trim)

  def wordShingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))
}
