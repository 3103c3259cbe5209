package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `similar_to_escape` — SQL `SIMILAR TO` pattern → Java-regex string
  * (reference: src/expr/impl/src/scalar/similar_to_escape.rs; both it
  * and this adapt PostgreSQL's similar_escape, backend/utils/adt/
  * regexp.c). The frontend rewrites `x SIMILAR TO p [ESCAPE e]` to
  * `x RLIKE graft_similar_escape(p[, e])`, the same split the
  * reference binder performs (`x ~ similar_to_escape(y)`).
  *
  * SQL-pattern surface: `%` → `.*`, `_` → `.`, `(` groups become
  * non-capturing, regex metacharacters that SQL patterns treat as
  * literals (`\ . ^ $`) are escaped, bracket classes pass through,
  * the escape character quotes the next char, and PG's
  * escape-double-quote separators (up to two) delimit the substring
  * capture. Anchored `^(?:…)$` so RLIKE's find() means full match.
  */
case class SimilarToEscape(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  // (pattern, escape-string: "" = no escape char, default "\")
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override protected def nullSafeEval(p: Any, e: Any): Any =
    UTF8String.fromString(PatternExpressions.similarEscape(
      p.asInstanceOf[UTF8String].toString, e.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, e) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.plans.PatternExpressions.similarEscape(
         |    $p.toString(), $e.toString()));""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimilarToEscape =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_similar_escape"
}

object PatternExpressions {
  /** Public + JVM-static so generated code can call it. */
  def similarEscape(pat: String, esc: String): String = {
    val escChar: Option[Char] =
      if (esc.isEmpty) None
      else if (esc.length == 1) Some(esc.charAt(0))
      else throw new IllegalArgumentException(
        "invalid escape string: must be empty or one character")
    val sb = new java.lang.StringBuilder(pat.length + 8)
    sb.append("^(?:")
    var nquotes = 0
    var afterescape = false
    var incharclass = false
    pat.foreach { c =>
      if (afterescape) {
        if (c == '"' && !incharclass) {
          nquotes match {
            case 0 => sb.append("){1,1}?(")
            case 1 => sb.append("){1,1}(?:")
            case _ => throw new IllegalArgumentException(
              "SQL regular expression may not contain more than two " +
                "escape-double-quote separators")
          }
          nquotes += 1
        } else { sb.append('\\'); sb.append(c) }
        afterescape = false
      } else if (escChar.contains(c)) afterescape = true
      else if (incharclass) {
        if (c == '\\') sb.append('\\')
        sb.append(c)
        if (c == ']') incharclass = false
      } else c match {
        case '[' => sb.append(c); incharclass = true
        case '%' => sb.append(".*")
        case '_' => sb.append('.')
        case '(' => sb.append("(?:")
        case '\\' | '.' | '^' | '$' => sb.append('\\'); sb.append(c)
        case _ => sb.append(c)
      }
    }
    sb.append(")$")
    sb.toString
  }
}
