package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Expression-position call of an embedded python/javascript UDF
  * (reference: src/expr/impl/src/udf/python.rs, quickjs.rs — an
  * expression node evaluating the user's source in an embedded
  * interpreter). Registered by `CREATE FUNCTION … LANGUAGE python AS
  * $$…$$`, so the name is callable anywhere in SQL. The SOURCE BODY is
  * a field of the expression — it serializes with the plan, so every
  * executor's worker pool can lazily define the function on first call
  * with no side-channel registry (the property that makes this correct
  * on a multi-executor cluster).
  *
  * Row-wise over a pooled interpreter pipe — correct anywhere an
  * expression appears; hot relational pipelines should use
  * [[graft.functions.EmbeddedUdf.applyBatched]] (amortized batches).
  */
case class EmbeddedUdfCall(
    fnName: String,
    lang: String,
    body: String,
    argTypes: Seq[DataType],
    retType: DataType,
    children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def dataType: DataType = retType
  override def nullable: Boolean = true

  private def toExternal(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (u: UTF8String, _) => u.toString
    case (d: Decimal, _) => d.toJavaBigDecimal
    case (a: ArrayData, ArrayType(et, _)) =>
      a.toObjectArray(et).toSeq.map(toExternal(_, et))
    case (other, _) => other
  }

  private def toCatalyst(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (s: String, StringType) => UTF8String.fromString(s)
    case (d: BigDecimal, _) => Decimal(d)
    case (s: Seq[_], ArrayType(et, _)) =>
      ArrayData.toArrayData(s.map(toCatalyst(_, et)).toArray)
    case (other, _) => other
  }

  override def eval(input: InternalRow): Any = {
    val args = children.zip(argTypes).map { case (c, t) =>
      toExternal(c.eval(input), t)
    }
    toCatalyst(graft.functions.EmbeddedUdfRuntime.call(
      lang, fnName, body, args, retType), retType)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EmbeddedUdfCall =
    copy(children = newChildren)
  override def prettyName: String = fnName
}
