package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.kernel.PdfLite

/** Catalyst expression `pdf_dialect(html)` → string — the writer-dialect
  * census tag set of one payload ([[PdfLite.dialect]]): xref form, stream
  * filters, encryption flavor, font mechanisms, image codecs. The crawl-ops
  * "what formats are actually in my corpus" scan that sizes which parser
  * tiers matter before committing a 100-TB extraction run. Total like every
  * kernel expression: malformed payloads tag, they never throw. */
case class PdfDialectExpr(child: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pdf_dialect expects binary payload, got ${other.catalogString}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val bytes = if (v == null) null else v.asInstanceOf[Array[Byte]]
    UTF8String.fromString(PdfLite.dialect(bytes))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
}

object PdfDialectExpr {
  def pdfDialect(html: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PdfDialectExpr(GraftColumnBridge.expression(html)))
  }
}
