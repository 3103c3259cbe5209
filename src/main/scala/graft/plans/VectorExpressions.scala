package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expressions for the embedding hot path.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) are
  * CodegenFallback: every element is boxed and the lambda is interpreted
  * per element — measurable at millions of candidate pairs. `DotProduct`
  * generates a tight primitive loop instead (SURVEY.md §7 "custom
  * Expression beats Scala UDF").
  *
  * Null semantics: a null array yields null; null ELEMENTS contribute 0
  * (embeddings have no null elements; documented divergence from the
  * null-poisoning zip_with formulation).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<float|double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (arrA, arrB) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(arrA.numElements(), arrB.numElements())
    val (ta, tb) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!arrA.isNullAt(i) && !arrB.isNullAt(i)) {
        val x = if (ta == FloatType) arrA.getFloat(i).toDouble else arrA.getDouble(i)
        val y = if (tb == FloatType) arrB.getFloat(i).toDouble else arrB.getDouble(i)
        sum += x * y
      }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getB = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += ((double) $a.$getA($i)) * ((double) $b.$getB($i));
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Squared L2 distance Σ(aᵢ−bᵢ)² — the k-means/IVF probe hot loop.
  * Same sequential left-to-right double fold as the HOF formulation
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, +)`, so values
  * are bit-identical on equal-length arrays with non-null elements
  * (the embedding invariant); same edge semantics as [[DotProduct]]
  * otherwise (truncate to shorter, skip null elements).
  */
case class L2DistanceSq(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_l2distsq expects array<float|double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (arrA, arrB) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(arrA.numElements(), arrB.numElements())
    val (ta, tb) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!arrA.isNullAt(i) && !arrB.isNullAt(i)) {
        val x = if (ta == FloatType) arrA.getFloat(i).toDouble else arrA.getDouble(i)
        val y = if (tb == FloatType) arrB.getFloat(i).toDouble else arrB.getDouble(i)
        val d = x - y
        sum += d * d
      }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getB = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $d = ((double) $a.$getA($i)) - ((double) $b.$getB($i));
         |    $sum += $d * $d;
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistanceSq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_l2distsq"
}

/** Session extension wiring (spark.sql.extensions=graft.plans.GraftExtensions)
  * plus a programmatic hook for already-built sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => NativeVectorRewrite)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions._

  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  val l2DistSqFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_l2distsq"),
    new ExpressionInfo(classOf[L2DistanceSq].getName, "graft_l2distsq"),
    (children: Seq[Expression]) => L2DistanceSq(children(0), children(1)))

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    dotFunction,
    l2DistSqFunction,
    (FunctionIdentifier("graft_gcd"),
      new ExpressionInfo(classOf[Gcd].getName, "graft_gcd"),
      (children: Seq[Expression]) => Gcd(children(0), children(1))),
    (FunctionIdentifier("graft_lcm"),
      new ExpressionInfo(classOf[Lcm].getName, "graft_lcm"),
      (children: Seq[Expression]) => Lcm(children(0), children(1))),
    (FunctionIdentifier("graft_hmac"),
      new ExpressionInfo(classOf[Hmac].getName, "graft_hmac"),
      (children: Seq[Expression]) => Hmac(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_similar_escape"),
      new ExpressionInfo(classOf[SimilarToEscape].getName, "graft_similar_escape"),
      (children: Seq[Expression]) => SimilarToEscape(children(0),
        // PG default escape is backslash; explicit '' disables escaping
        if (children.length > 1) children(1)
        else org.apache.spark.sql.catalyst.expressions.Literal("\\"))),
    // trim_array(arr, n) — PG 14 / reference trim_array.rs: drop the
    // last n elements. Pure composition of codegen'd builtins; n
    // beyond the array length clamps to empty (PG raises; documented).
    (FunctionIdentifier("trim_array"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.Slice].getName,
        "trim_array"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions._
        val size = Size(children(0), legacySizeOfNull = false)
        Slice(children(0), Literal(1),
          Greatest(Seq(Subtract(size, Cast(children(1), IntegerType)),
            Literal(0))))
      }),
    // PG quoting family (reference: src/expr/impl/src/scalar/format.rs
    // binds the same %s/%I/%L specifiers; quote_* are the PG lexical
    // rules). All pure compositions of codegen'd builtins.
    (FunctionIdentifier("quote_literal"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.Concat].getName,
        "quote_literal"),
      (children: Seq[Expression]) => quoteLiteralExpr(children(0))),
    (FunctionIdentifier("quote_ident"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.Concat].getName,
        "quote_ident"),
      (children: Seq[Expression]) => quoteIdentExpr(children(0))),
    (FunctionIdentifier("format"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.Concat].getName,
        "format"),
      (children: Seq[Expression]) => formatExpr(children)),
    (FunctionIdentifier("pg_typeof"),
      new ExpressionInfo(classOf[PgTypeof].getName, "pg_typeof"),
      (children: Seq[Expression]) => PgTypeof(children(0))),
    // rw_int256 lane (reference scalar/int256.rs + common/types/
    // num256.rs): int256(x) is the varchar/integral → rw_int256 cast,
    // hex_to_int256 the 0x-prefixed form; arithmetic is explicit
    // (int256_add/sub/mul/div/mod/neg/abs); comparisons, ORDER BY,
    // GROUP BY, min and max need NO functions — the order-preserving
    // 32-byte encoding makes Spark's native binary ops numerically
    // correct. int256_sum is the declarative aggregate; int256_text /
    // int256_float8 are the out-casts.
    (FunctionIdentifier("int256"),
      new ExpressionInfo(classOf[Int256Unary].getName, "int256"),
      (children: Seq[Expression]) => children(0).dataType match {
        case StringType => Int256Unary(children(0), "fromdec")
        case _ => Int256Unary(children(0), "fromlong")
      }),
    (FunctionIdentifier("hex_to_int256"),
      new ExpressionInfo(classOf[Int256Unary].getName, "hex_to_int256"),
      (children: Seq[Expression]) => Int256Unary(children(0), "fromhex")),
    (FunctionIdentifier("int256_text"),
      new ExpressionInfo(classOf[Int256Unary].getName, "int256_text"),
      (children: Seq[Expression]) => Int256Unary(children(0), "text")),
    (FunctionIdentifier("int256_float8"),
      new ExpressionInfo(classOf[Int256Unary].getName, "int256_float8"),
      (children: Seq[Expression]) => Int256Unary(children(0), "float8")),
    (FunctionIdentifier("int256_neg"),
      new ExpressionInfo(classOf[Int256Unary].getName, "int256_neg"),
      (children: Seq[Expression]) => Int256Unary(children(0), "neg")),
    (FunctionIdentifier("int256_abs"),
      new ExpressionInfo(classOf[Int256Unary].getName, "int256_abs"),
      (children: Seq[Expression]) => Int256Unary(children(0), "abs")),
    (FunctionIdentifier("int256_add"),
      new ExpressionInfo(classOf[Int256Arith].getName, "int256_add"),
      (children: Seq[Expression]) => Int256Arith(children(0), children(1), "add")),
    (FunctionIdentifier("int256_sub"),
      new ExpressionInfo(classOf[Int256Arith].getName, "int256_sub"),
      (children: Seq[Expression]) => Int256Arith(children(0), children(1), "sub")),
    (FunctionIdentifier("int256_mul"),
      new ExpressionInfo(classOf[Int256Arith].getName, "int256_mul"),
      (children: Seq[Expression]) => Int256Arith(children(0), children(1), "mul")),
    (FunctionIdentifier("int256_div"),
      new ExpressionInfo(classOf[Int256Arith].getName, "int256_div"),
      (children: Seq[Expression]) => Int256Arith(children(0), children(1), "div")),
    (FunctionIdentifier("int256_mod"),
      new ExpressionInfo(classOf[Int256Arith].getName, "int256_mod"),
      (children: Seq[Expression]) => Int256Arith(children(0), children(1), "mod")),
    (FunctionIdentifier("int256_sum"),
      new ExpressionInfo(classOf[Int256Sum].getName, "int256_sum"),
      (children: Seq[Expression]) => Int256Sum(children(0))),
    // avg(int256) → float8 exactly as the reference rewrites it
    // (aggregate/general.rs `avg(int256) -> float8, rewritten`):
    // sum/count in float8. Builders must pre-wrap nested aggregates —
    // the analyzer only auto-wraps a top-level AggregateFunction.
    fn1("int256_avg", c => Divide(
      Int256Unary(Int256Sum(c).toAggregateExpression(), "float8"),
      Cast(org.apache.spark.sql.catalyst.expressions.aggregate.Count(c)
        .toAggregateExpression(), DoubleType))),
    // PG/reference spellings Spark lacks, all pure compositions of
    // codegen'd builtins (reference: scalar/trigonometric.rs registers
    // the degree variants; scalar/jsonb_info.rs the jsonb probes;
    // scalar/encdec.rs convert_from/convert_to; scalar/sha.rs the
    // sha224/sha384 digests; string.rs quote_nullable).
    fn1("sind", c => sinExpr(radians(c))),
    fn1("cosd", c => cosExpr(radians(c))),
    fn1("tand", c => tanExpr(radians(c))),
    fn1("cotd", c => divExpr(cosExpr(radians(c)), sinExpr(radians(c)))),
    fn1("asind", c => degrees(asinExpr(c))),
    fn1("acosd", c => degrees(acosExpr(c))),
    fn1("cot", c => divExpr(cosExpr(c), sinExpr(c))),
    fn1("coth", c => divExpr(coshExpr(c), sinhExpr(c))),
    fn1("quote_nullable", c =>
      Coalesce(Seq(quoteLiteralExpr(c), Literal("NULL")))),
    fn1("jsonb_typeof", c => jsonbTypeofExpr(c)),
    fn1("jsonb_array_length", c => LengthOfJsonArray(c)),
    fnN("jsonb_extract_path", cs => jsonbExtractPathExpr(cs)),
    fnN("jsonb_extract_path_text", cs => jsonbExtractPathExpr(cs)),
    fn2("jsonb_exists", (x, k) => ArrayContains(JsonObjectKeys(x), k)),
    fn2("jsonb_exists_any", (x, ks) =>
      ArraysOverlap(JsonObjectKeys(x), ks)),
    fn2("jsonb_exists_all", (x, ks) =>
      EqualTo(Size(ArrayExcept(ks, JsonObjectKeys(x))), Literal(0))),
    fn1("sha224", c => Sha2(c, Literal(224))),
    fn1("sha384", c => Sha2(c, Literal(384))),
    fn2("convert_from", (b, enc) => StringDecode(b, enc)),
    fn2("convert_to", (s, enc) => Encode(s, enc)),
    // reference MAP function spellings over Spark's MapType builtins
    fn1("map_length", c => Size(c)),
    fn2("map_cat", (a, b) => MapConcat(Seq(a, b))),
    fn2("map_contains", (m, k) => ArrayContains(MapKeys(m), k)),
    fn2("map_access", (m, k) => ElementAt(m, k)),
    fnN("map_insert", cs =>
      MapConcat(Seq(cs(0), CreateMap(Seq(cs(1), cs(2)))))),
    fn2("map_delete", (m, k) => {
      val kv = UnresolvedNamedLambdaVariable(Seq("__mk"))
      val vv = UnresolvedNamedLambdaVariable(Seq("__mv"))
      MapFilter(m, LambdaFunction(Not(EqualTo(kv, k)), Seq(kv, vv)))
    }),
    fn1("pg_sleep", c => PgSleep(c)),
    // jsonb_object_agg(k, v) (reference aggregate/jsonb_agg.rs): the
    // entry list sorts by key before the map builds — jsonb stores
    // object keys sorted, so the rendering is deterministic under any
    // aggregation order. Duplicate keys error (Spark's map dedup
    // policy) where PG keeps the last — documented envelope.
    fn2("jsonb_object_agg", (k, v) =>
      StructsToJson(Map.empty[String, String],
        MapFromEntries(new ArraySort(
          org.apache.spark.sql.catalyst.expressions.aggregate
            .CollectList(CreateStruct(Seq(Cast(k, StringType), v)))
            .toAggregateExpression())))),
    // PG to_char over the SQL surface (reference: scalar/to_char.rs).
    // Datetime arguments translate the PG mask (YYYY/MM/DD/HH24/MI/SS…)
    // to a Spark pattern at plan time and rewrite to date_format;
    // everything else delegates to Spark's numeric ToCharacter, so the
    // builtin number-formatting surface is untouched. (Function
    // builders run with RESOLVED children — UnresolvedFunction waits
    // for childrenResolved — so the dataType dispatch is safe here.)
    (FunctionIdentifier("to_char"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.DateFormatClass]
          .getName, "to_char"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions._
        children(0).dataType match {
          case DateType | TimestampType | TimestampNTZType =>
            val mask = children(1) match {
              case Literal(v, StringType) if v != null => v.toString
              case other => throw new IllegalArgumentException(
                s"to_char: the datetime format mask must be a literal, got $other")
            }
            DateFormatClass(children(0),
              Literal(graft.functions.PgFunctions.translateMask(mask)))
          case _ => ToCharacter(children(0), children(1))
        }
      }))

  import org.apache.spark.sql.catalyst.expressions._

  // terse registration helpers for pure-composition functions
  private def fn1(name: String, b: Expression => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(classOf[Concat].getName, name),
      (cs: Seq[Expression]) => b(cs(0)))
  private def fn2(name: String, b: (Expression, Expression) => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(classOf[Concat].getName, name),
      (cs: Seq[Expression]) => b(cs(0), cs(1)))
  private def fnN(name: String, b: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(classOf[Concat].getName, name),
      (cs: Seq[Expression]) => b(cs))

  private def radians(c: Expression): Expression = ToRadians(c)
  private def degrees(c: Expression): Expression = ToDegrees(c)
  private def sinExpr(c: Expression): Expression = Sin(c)
  private def cosExpr(c: Expression): Expression = Cos(c)
  private def tanExpr(c: Expression): Expression = Tan(c)
  private def asinExpr(c: Expression): Expression = Asin(c)
  private def acosExpr(c: Expression): Expression = Acos(c)
  private def sinhExpr(c: Expression): Expression = Sinh(c)
  private def coshExpr(c: Expression): Expression = Cosh(c)
  private def divExpr(a: Expression, b: Expression): Expression = Divide(a, b)

  /** PG jsonb_typeof over the text rendering: the first significant
    * character discriminates well-formed JSON values (object/array/
    * string/boolean/null, else number). NULL input stays NULL.
    */
  private def jsonbTypeofExpr(c: Expression): Expression = {
    val t = StringTrim(Cast(c, StringType))
    CaseWhen(Seq(
      (IsNull(t), Literal.create(null, StringType)),
      (StartsWith(t, Literal("{")), Literal("object")),
      (StartsWith(t, Literal("[")), Literal("array")),
      (StartsWith(t, Literal("\"")), Literal("string")),
      (Or(EqualTo(t, Literal("true")), EqualTo(t, Literal("false"))),
        Literal("boolean")),
      (EqualTo(t, Literal("null")), Literal("null"))),
      Some(Literal("number")))
  }

  /** PG jsonb_extract_path[_text](json, k1, k2, …) → get_json_object
    * with a composed $.k1.k2 path (keys containing '.' need PG's
    * bracket syntax — documented envelope).
    */
  private def jsonbExtractPathExpr(cs: Seq[Expression]): Expression = {
    val path = Concat(Literal("$") +:
      cs.tail.flatMap(k => Seq(Literal("."), Cast(k, StringType))))
    GetJsonObject(cs.head, path)
  }

  private def quoteLiteralExpr(e: Expression): Expression = {
    val s = Cast(e, StringType)
    Concat(Seq(Literal("'"),
      RegExpReplace(s, Literal("'"), Literal("''")), Literal("'")))
  }

  private def quoteIdentExpr(e: Expression): Expression = {
    val s = Cast(e, StringType)
    val quoted = Concat(Seq(Literal("\""),
      RegExpReplace(s, Literal("\""), Literal("\"\"")), Literal("\"")))
    CaseWhen(Seq((RLike(s, Literal("^[a-z_][a-z0-9_]*$")), s)), Some(quoted))
  }

  /** PG format(fmt, args…): fmt must fold to a literal string — the
    * mask is compiled to ONE Concat at plan time so the whole call
    * stays inside whole-stage codegen (PG's runtime-dynamic fmt is a
    * documented divergence).
    */
  private def formatExpr(children: Seq[Expression]): Expression = {
    val fmt = children.head match {
      case Literal(v, StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"format: the format string must be a literal, got $other")
    }
    val args = children.tail
    val parts = scala.collection.mutable.ArrayBuffer[Expression]()
    val sb = new StringBuilder
    var argIdx = 0
    var i = 0
    def flush(): Unit =
      if (sb.nonEmpty) { parts += Literal(sb.toString); sb.clear() }
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case '%' => sb.append('%')
          case spec =>
            flush()
            if (argIdx >= args.length) throw new IllegalArgumentException(
              s"format: too few arguments for format string")
            val a = Cast(args(argIdx), StringType); argIdx += 1
            parts += (spec match {
              // %s on NULL renders empty, %L renders the NULL keyword
              case 's' => Coalesce(Seq(a, Literal("")))
              case 'I' => Coalesce(Seq(quoteIdentExpr(a), Literal("")))
              case 'L' => Coalesce(Seq(quoteLiteralExpr(a), Literal("NULL")))
              case other => throw new IllegalArgumentException(
                s"format: unsupported specifier %$other")
            })
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    flush()
    Concat(parts.toSeq)
  }

  /** Register into an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit = {
    functions.foreach { f =>
      spark.sessionState.functionRegistry.registerFunction(f._1, f._2, f._3)
    }
    if (!spark.experimental.extraOptimizations.contains(NativeVectorRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NativeVectorRewrite
  }
}
