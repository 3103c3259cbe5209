package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst internal <-> plain-JVM value conversion for the embedded
  * interpreter boundary (shared by the scalar, aggregate, and table
  * variants).
  */
private[plans] object EmbeddedConv {
  def toExternal(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (u: UTF8String, _) => u.toString
    case (d: Decimal, _) => d.toJavaBigDecimal
    case (a: ArrayData, ArrayType(et, _)) =>
      a.toObjectArray(et).toSeq.map(toExternal(_, et))
    case (other, _) => other
  }

  def toCatalyst(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (s: String, StringType) => UTF8String.fromString(s)
    case (d: BigDecimal, _) => Decimal(d)
    case (s: Seq[_], ArrayType(et, _)) =>
      ArrayData.toArrayData(s.map(toCatalyst(_, et)).toArray)
    case (other, _) => other
  }
}

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

  override def eval(input: InternalRow): Any = {
    val args = children.zip(argTypes).map { case (c, t) =>
      EmbeddedConv.toExternal(c.eval(input), t)
    }
    EmbeddedConv.toCatalyst(graft.functions.EmbeddedUdfRuntime.call(
      lang, fnName, body, args, retType), retType)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EmbeddedUdfCall =
    copy(children = newChildren)
  override def prettyName: String = fnName
}

/** Embedded python/javascript UDAF (reference: handler/
  * create_aggregate.rs with an interpreter language — the body defines
  * `create_state`/`accumulate`/[`finish`]). The DISTRIBUTED part stays
  * Spark-side: per-partition buffers collect the group's argument
  * tuples and merge by concatenation (partial aggregation, shuffle of
  * compact serialized buffers), and the interpreter folds each final
  * group exactly ONCE at eval — so a 1000-executor aggregation pays
  * one interpreter exchange per output group, not per row. Input order
  * within a group is partition-dependent, exactly like the reference's
  * unordered aggregate input: bodies must be order-insensitive.
  */
case class EmbeddedAggCall(
    fnName: String,
    lang: String,
    body: String,
    argTypes: Seq[DataType],
    retType: DataType,
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Array[Any]]] {

  override def dataType: DataType = retType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): ArrayBuffer[Array[Any]] =
    ArrayBuffer.empty

  override def update(buffer: ArrayBuffer[Array[Any]],
      input: InternalRow): ArrayBuffer[Array[Any]] = {
    buffer += children.zip(argTypes).map { case (c, t) =>
      EmbeddedConv.toExternal(c.eval(input), t)
    }.toArray
    buffer
  }

  override def merge(b1: ArrayBuffer[Array[Any]],
      b2: ArrayBuffer[Array[Any]]): ArrayBuffer[Array[Any]] = { b1 ++= b2; b1 }

  override def eval(buffer: ArrayBuffer[Array[Any]]): Any =
    EmbeddedConv.toCatalyst(graft.functions.EmbeddedUdfRuntime.callAgg(
      lang, fnName, body, buffer.map(_.toSeq).toSeq, retType), retType)

  // buffers hold plain serializable JVM values (String/Long/BigDecimal/
  // Seq), so Java serialization is correct; compactness matters less
  // than fidelity here (the reference ships pickled python state the
  // same way)
  override def serialize(buffer: ArrayBuffer[Array[Any]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(buffer); oos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Array[Any]] =
    new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[ArrayBuffer[Array[Any]]]

  override def withNewMutableAggBufferOffset(
      newOffset: Int): EmbeddedAggCall =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): EmbeddedAggCall =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EmbeddedAggCall =
    copy(children = newChildren)
  override def prettyName: String = fnName
}

/** Embedded python/javascript table function (reference: src/expr/impl/
  * src/table_function/ UDTF variants — `CREATE FUNCTION … RETURNS
  * TABLE(…) LANGUAGE python`): the body's generator yields output rows
  * per input tuple. A Catalyst [[Generator]], so it binds everywhere
  * Spark generators do — `LATERAL VIEW pyudtf(col) t AS a, b` and
  * generator position in SELECT.
  */
case class EmbeddedGenerate(
    fnName: String,
    lang: String,
    body: String,
    argTypes: Seq[DataType],
    override val elementSchema: StructType,
    children: Seq[Expression])
  extends Generator with CodegenFallback {

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val args = children.zip(argTypes).map { case (c, t) =>
      EmbeddedConv.toExternal(c.eval(input), t)
    }
    graft.functions.EmbeddedUdfRuntime
      .callTable(lang, fnName, body, Seq(args), elementSchema).head
      .map { cells =>
        InternalRow.fromSeq(cells.lazyZip(elementSchema.fields)
          .map((v, f) => EmbeddedConv.toCatalyst(v, f.dataType)))
      }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EmbeddedGenerate =
    copy(children = newChildren)
  override def prettyName: String = fnName
}
