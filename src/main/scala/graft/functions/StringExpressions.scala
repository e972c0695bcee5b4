package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for per-code-point simple lowercasing
  * (graft.text.PyText.simpleLower — the semantics of DuckDB/utf8proc
  * `lower()`). Spark's built-in `lower` applies JVM full case mapping,
  * whose length-changing cases (U+0130 → 'i' + combining dot) diverge
  * from a one-codepoint-to-one-codepoint SQL oracle.
  *
  * Codegen is a static call into the shared kernel, so the projection
  * stays inside WholeStageCodegen (no lambda, no UDF serialization).
  */
case class SimpleLower(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simple_lower expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    UTF8String.fromString(graft.text.PyText.simpleLower(s.toString))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.text.PyText.simpleLower($x.toString()));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimpleLower =
    copy(child = newChild)
}

object TextExpr {
  /** Column API: simple_lower(s) — DuckDB-lower()-compatible casing. */
  def simpleLower(c: Column): Column =
    GraftColumnBridge.column(SimpleLower(GraftColumnBridge.expression(c)))
}
