package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Catalyst expression: Unicode NFC normalization.
  *
  * Text corpora mix composed and decomposed encodings of the same
  * glyph ("é" as U+00E9 vs "e"+U+0301); every downstream content hash,
  * dedup key, and tokenizer sees them as different documents unless
  * normalization runs first. Spark has no normalization builtin, and a
  * Scala UDF would force ser/de out of Tungsten rows — this is a
  * UnaryExpression with a straight-line `doGenCode`, so it stays inside
  * whole-stage codegen like the shingle/fingerprint family
  * (ShingleHashes.scala).
  *
  * `Normalizer.isNormalized` is checked first: for the overwhelmingly
  * common already-NFC (e.g. pure-ASCII) row it is a cheap scan with no
  * allocation, and the input UTF8String is returned as-is.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Java entry point used by both interpreted and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
