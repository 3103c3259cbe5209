package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native integer gcd/lcm (reference: src/expr/impl/src/scalar/arithmetic_op.rs
  * registers `gcd`; PostgreSQL 13 added both) — Spark has no builtin, and
  * a Scala UDF would box every row. Both are tight codegen'd loops that
  * stay inside whole-stage codegen.
  *
  * Semantics follow PostgreSQL: results are non-negative,
  * gcd(0,0) = lcm(0,0) = 0, and lcm overflow raises (Math.multiplyExact)
  * rather than wrapping.
  */
case class Gcd(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NumericExpressions.gcd(NumericExpressions.toLong(a),
      NumericExpressions.toLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.NumericExpressions.gcd((long) $a, (long) $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Gcd =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_gcd"
}

case class Lcm(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NumericExpressions.lcm(NumericExpressions.toLong(a),
      NumericExpressions.toLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.NumericExpressions.lcm((long) $a, (long) $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Lcm =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_lcm"
}

object NumericExpressions {
  private[plans] def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  /** Euclid on magnitudes; public + JVM-static so codegen can call it. */
  def gcd(a0: Long, b0: Long): Long = {
    var a = math.abs(a0)
    var b = math.abs(b0)
    while (b != 0) { val t = a % b; a = b; b = t }
    a
  }

  def lcm(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0L
    else math.abs(Math.multiplyExact(a / gcd(a, b), b))
}

/** PG pg_sleep(seconds) (reference: scalar/delay.rs registers the same
  * pair for testing long-running queries). Sleeps inside the executor
  * task, so KILL / wire CancelRequest interrupt it like any running
  * job. Nondeterministic + CodegenFallback keeps the optimizer from
  * folding or reordering it. Returns NULL (PG returns an empty void
  * row; NULL text is the closest surface here).
  */
case class PgSleep(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.Nondeterministic
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def initializeInternal(partitionIndex: Int): Unit = ()

  override protected def evalInternal(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v != null) {
      val secs = v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case other => other.toString.toDouble
      }
      try Thread.sleep(math.max(0L, (secs * 1000).toLong))
      catch { case _: InterruptedException =>
        Thread.currentThread().interrupt() }
    }
    null
  }

  override protected def withNewChildInternal(newChild: Expression): PgSleep =
    copy(child = newChild)
  override def prettyName: String = "pg_sleep"
}

/** PG pg_typeof(expr) → the PG spelling of the argument's resolved
  * type (reference surfaces it through the expr framework; psql and
  * ORMs probe it). Foldable: constant folding collapses it to a
  * Literal before execution, so the CodegenFallback never runs hot.
  */
case class PgTypeof(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StringType
  override def foldable: Boolean = true
  override def nullable: Boolean = false

  private def pgName(dt: DataType): String = dt match {
    case LongType => "bigint"
    case IntegerType => "integer"
    case ShortType => "smallint"
    case ByteType => "smallint"
    case StringType => "text"
    case BooleanType => "boolean"
    case DoubleType => "double precision"
    case FloatType => "real"
    case _: DecimalType => "numeric"
    case DateType => "date"
    case TimestampNTZType => "timestamp without time zone"
    case TimestampType => "timestamp with time zone"
    case BinaryType => "bytea"
    case _: org.apache.spark.sql.types.DayTimeIntervalType => "interval"
    case _: org.apache.spark.sql.types.YearMonthIntervalType => "interval"
    case ArrayType(e, _) => pgName(e) + "[]"
    case _: MapType | _: StructType => "record"
    case other => other.simpleString
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(pgName(child.dataType))

  override protected def withNewChildInternal(newChild: Expression): PgTypeof =
    copy(child = newChild)

  override def prettyName: String = "pg_typeof"
}
