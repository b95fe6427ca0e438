package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.kernel.PdfLite

/** Catalyst expression `pdf_meta(html)` →
  * struct&lt;title,author,producer,created&gt; — the document-information
  * dictionary ([[PdfLite.docInfo]]: trailer `/Info` resolve with a
  * structural fallback for trailer-less files). Producer/creation-date are
  * the provenance signals a training-data pipeline keys dedup cohorts and
  * writer-bug quarantines on. Null struct when the payload is not a PDF or
  * carries no info dict; never throws. */
case class PdfMetaExpr(child: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pdf_meta expects binary payload, got ${other.catalogString}")
    }

  override def dataType: DataType = PdfMetaExpr.schema
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val bytes = if (v == null) null else v.asInstanceOf[Array[Byte]]
    PdfLite.docInfo(bytes) match {
      case None => null
      case Some(di) =>
        val row = new GenericInternalRow(4)
        row.update(0, UTF8String.fromString(di.title))
        row.update(1, UTF8String.fromString(di.author))
        row.update(2, UTF8String.fromString(di.producer))
        row.update(3, UTF8String.fromString(di.created))
        row
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
}

object PdfMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("author", StringType, nullable = false),
    StructField("producer", StringType, nullable = false),
    StructField("created", StringType, nullable = false)))

  def pdfMeta(html: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PdfMetaExpr(GraftColumnBridge.expression(html)))
  }
}
