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

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq[(String, Set[DataType])](
      "url" -> Set(StringType), "html" -> Set(BinaryType, StringType),
      "text" -> Set(StringType), "lang" -> Set(StringType))
    children.zip(expected).zipWithIndex.collectFirst {
      case ((c, (argName, ok)), i) if !ok.contains(c.dataType) =>
        TypeCheckResult.TypeCheckFailure(
          s"extract_pages argument $i ($argName) must be ${ok.map(_.sql).mkString(" or ")}, " +
          s"got ${c.dataType.sql}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def dataType: DataType = ExtractPagesExpr.pagesType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val u = children(0).eval(input)
    if (u == null) return null
    val html = children(1).eval(input) match {
      case b: Array[Byte] => b
      case s: UTF8String => s.getBytes
      case null => null
      case other => throw new IllegalArgumentException(
        s"extract_pages: html must be BINARY or STRING, got ${other.getClass.getName}")
    }
    val textEv = children(2).eval(input)
    val langEv = children(3).eval(input)
    val pages = Extractor.extractPages(
      u.asInstanceOf[UTF8String].toString,
      html,
      if (textEv == null) "" else textEv.asInstanceOf[UTF8String].toString,
      if (langEv == null) "" else langEv.asInstanceOf[UTF8String].toString,
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
