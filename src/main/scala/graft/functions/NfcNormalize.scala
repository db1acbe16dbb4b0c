package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression (UAX #15 canonical
  * composition via `java.text.Normalizer` — in the JDK, no library). The
  * dedup fingerprints hash BYTES, so without this "é" (U+00E9) and
  * "e"+U+0301 are different documents even though every renderer shows
  * the same glyph — web corpora mix the two freely (different editors,
  * different normalization at the crawler). Normalizing before
  * fingerprinting makes canonical-equivalent texts dedup together;
  * DuckDB's `nfc_normalize` implements the same UAX #15 algorithm, so
  * the oracle replays it exactly.
  *
  * A narrow per-row expression fused into the scan — zero shuffle, and
  * the common all-ASCII case is a single fast-path scan inside the JDK's
  * normalizer (quick-check yes → no allocation).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.normalize($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Referenced from generated code — keep public + stable. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC))
      s // fast path: already NFC (all ASCII always is) — no re-encode
    else
      UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
