package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for corpus curation — the pass every
  * multilingual text pipeline runs before tokenizing or hashing:
  * byte-different but canonically-equal strings (decomposed "a"+U+0301
  * vs precomposed "á") must dedup, split, and index identically.
  *
  * Spark has no builtin for this (DuckDB ships `nfc_normalize` and
  * `strip_accents`, which the oracle uses). A Scala UDF would work
  * but breaks the surrounding WholeStageCodegen span; these are
  * native expressions with `doGenCode`, so a projection mixing
  * normalization with hashing/tokenization stays in one generated
  * function. The JDK Normalizer is the whole cost either way.
  */
object TextNormalize {

  /** Static-call surface for generated code. */
  private val marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** Accent folding: NFD decomposition, then strip combining marks
    * (U+0300…), then recompose what remains. Matches DuckDB
    * `strip_accents` on Latin-script text. */
  def fold(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      marks.matcher(java.text.Normalizer.normalize(
        s.toString, java.text.Normalizer.Form.NFD)).replaceAll(""),
      java.text.Normalizer.Form.NFC))

  case class NfcExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(s: Any): Any =
      nfc(s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextNormalize.nfc($c)")
    override protected def withNewChildInternal(c: Expression): NfcExpr =
      copy(c)
  }

  case class FoldExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(s: Any): Any =
      fold(s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextNormalize.fold($c)")
    override protected def withNewChildInternal(c: Expression): FoldExpr =
      copy(c)
  }
}
