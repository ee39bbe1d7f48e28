package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Spark has no built-in Unicode-normalization function, and the training
  * -data cleaning pass runs it over every document — a Scala UDF here
  * would box every row and break the WholeStageCodegen span that the rest
  * of the normalization battery (regexp_replace chain, trim) rides in.
  * This expression stays inside codegen and short-circuits on the common
  * case: text that is already NFC (all ASCII in particular) is returned
  * as the SAME UTF8String, no re-encode, no allocation.
  *
  * Reference analog: the cleaning stages applied before dedup in the
  * reference pipeline (reference/transform.go:18-33 — per-record pure
  * transforms); NFC canonical composition per Unicode TR#15 via the JDK's
  * `java.text.Normalizer` (public platform API).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING, got ${other.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    // all-ASCII (numBytes == numChars ⟺ every codepoint is single-byte)
    // is always NFC: skip the String materialization entirely — without
    // this, the dominant pure-ASCII case still paid a full char[] copy
    // per document just to ask isNormalized
    if (u.numBytes == u.numChars) u
    else {
      val s = u.toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |if ($c.numBytes() == $c.numChars()) {
         |  ${ev.value} = $c;
         |} else {
         |  java.lang.String $s = $c.toString();
         |  ${ev.value} = java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
         |    ? $c
         |    : UTF8String.fromString(java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextNorm {
  /** Column face. */
  def nfcNormalize(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))

  /** SQL registration (`SELECT nfc_normalize(text)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "scala_udf")
}
