package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Expression-position call of an external UDF (reference:
  * src/expr/impl/src/udf/external.rs `UserDefinedFunction` — an
  * expression node whose eval ships a batch to the linked server).
  * Registered into the session function registry by
  * `CREATE FUNCTION … USING LINK`, so the name is callable anywhere in
  * SQL; the analyzer coerces arguments to the declared parameter types.
  *
  * Row-wise with a pooled persistent connection per task thread —
  * correct anywhere an expression can appear (projections, WHERE,
  * join conditions). Hot relational pipelines should go through
  * [[graft.functions.ExternalUdf.applyBatched]], which amortizes the
  * round-trip over row batches (the Arrow-Flight-shaped path).
  */
case class ExternalUdfCall(
    fnName: String,
    ident: String,
    link: String,
    argTypes: Seq[DataType],
    retType: DataType,
    children: Seq[Expression])
  extends Expression with CodegenFallback {

  // argument coercion to `argTypes` happens in the registry builder
  // (Cast inserted there) — AbstractDataType is private[sql], so the
  // ImplicitCastInputTypes route is closed to library code
  override def dataType: DataType = retType
  override def nullable: Boolean = true

  private def toExternal(v: Any): Any = v match {
    case u: UTF8String => u.toString
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case other => other
  }

  private def toCatalyst(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case d: BigDecimal => org.apache.spark.sql.types.Decimal(d)
    case other => other
  }

  override def eval(input: InternalRow): Any = {
    val args = children.map(c => toExternal(c.eval(input)))
    toCatalyst(graft.functions.ExternalUdfClient.call(
      link, ident, args, retType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExternalUdfCall =
    copy(children = newChildren)
  override def prettyName: String = fnName
}
