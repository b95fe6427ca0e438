package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.kernel.{Extractor, Template, Vendor}

/** Catalyst expression `extract_pages(url, html, text, lang)` →
  * `array<struct<page:int, nItems:int, text:string>>` — the S12 multi-page
  * split as a column: `posexplode(extract_pages(...))` turns one document row
  * into per-page rows, replacing the reference's split-into-files-then-loop
  * (`split_pdf.py:3-11`). Generator-shaped per SURVEY §2.11: the built-in
  * posexplode is the generator; this expression only supplies the array. */
case class ExtractPagesExpr(children: Seq[Expression],
                            templates: Map[String, Template] = Vendor.builtinTemplates)
    extends Expression with CodegenFallback {

  require(children.length == 4, "extract_pages(url, html, text, lang)")

  override def checkInputDataTypes(): TypeCheckResult =
    ExtractArgs.check("extract_pages", children)

  override def dataType: DataType = ExtractPagesExpr.pagesType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val u = children(0).eval(input)
    if (u == null) return null
    val html = ExtractArgs.htmlBytes("extract_pages", children(1).eval(input))
    val pages = Extractor.extractPages(
      u.asInstanceOf[UTF8String].toString,
      html,
      ExtractArgs.str(children(2).eval(input)),
      ExtractArgs.str(children(3).eval(input)),
      templates)
    val a = new Array[Any](pages.length)
    var i = 0
    while (i < pages.length) {
      val p = pages(i)
      a(i) = new GenericInternalRow(
        Array[Any](p.page, p.nItems, UTF8String.fromString(p.text)))
      i += 1
    }
    new GenericArrayData(a)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ExtractPagesExpr {

  val pageType: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("nItems", IntegerType, nullable = false),
    StructField("text", StringType)))

  val pagesType: DataType = ArrayType(pageType, containsNull = false)

  def extractPages(url: Column, html: Column, text: Column, lang: Column,
                   templates: Map[String, Template] = Vendor.builtinTemplates): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(ExtractPagesExpr(
      Seq(url, html, text, lang).map(GraftColumnBridge.expression), templates))
  }
}
