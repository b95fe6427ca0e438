package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{BinaryType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared argument contract of the `(url, html, text, lang)` extraction
  * expressions ([[ExtractDocExpr]], [[ExtractPagesExpr]]): one definition of
  * the analysis-time type check and of the binary/string html coercion, so
  * the two expressions cannot drift. NULL literals are accepted everywhere —
  * eval handles null rows/arguments explicitly. */
private[functions] object ExtractArgs {

  private val expected = Seq[(String, Set[DataType])](
    "url" -> Set(StringType, NullType),
    "html" -> Set(BinaryType, StringType, NullType),
    "text" -> Set(StringType, NullType),
    "lang" -> Set(StringType, NullType))

  def check(fnName: String, children: Seq[Expression]): TypeCheckResult =
    children.zip(expected).zipWithIndex.collectFirst {
      case ((c, (argName, ok)), i) if !ok.contains(c.dataType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$fnName argument $i ($argName) must be " +
          s"${(ok - NullType).map(_.sql).mkString(" or ")}, got ${c.dataType.sql}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  /** Evaluated html value → bytes (defense-in-depth below the analyzer: a
    * hand-built plan can bypass the type check). */
  def htmlBytes(fnName: String, v: Any): Array[Byte] = v match {
    case b: Array[Byte] => b
    case s: UTF8String => s.getBytes
    case null => null
    case other => throw new IllegalArgumentException(
      s"$fnName: html must be BINARY or STRING, got ${other.getClass.getName}")
  }

  def str(v: Any): String =
    if (v == null) "" else v.asInstanceOf[UTF8String].toString
}
