package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Cross-implementation parity: replays the battery in
  * `src/test/resources/golden_kernel.json` — inputs AND expected outputs
  * produced by the REFERENCE Python implementation itself
  * (tools/gen_golden.py running /root/reference/{slicer,quality,template}.py)
  * — and asserts the Scala kernel reproduces every grid cell, quality metric,
  * similarity ratio and vendor decision exactly. */
class GoldenParitySpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val root: JsonNode = {
    val in = getClass.getResourceAsStream("/golden_kernel.json")
    require(in != null, "golden_kernel.json missing — run tools/gen_golden.py")
    try mapper.readTree(in) finally in.close()
  }

  private def item(n: JsonNode): TextItem = TextItem(
    text = n.get("text").asText(),
    page = if (n.has("page")) n.get("page").asInt() else 1,
    x = n.get("x").asInt(), y = n.get("y").asInt(),
    width = n.get("width").asInt(), height = n.get("height").asInt(),
    confidence = if (n.has("confidence")) n.get("confidence").asInt() else 0)

  private val templates = Map(
    "test" -> Vendor.builtinTemplates("test"),
    "sysco" -> Vendor.builtinTemplates("sysco"),
    "newark" -> Vendor.builtinTemplates("newark"))

  test("slice grids + quality reports match the reference byte-for-byte") {
    val slicer = new Slicer(defaultRowThreshold = 20.0)
    val checker = new QualityChecker()
    var nGrid = 0; var nErr = 0
    for ((c, idx) <- root.get("slice_cases").elements().asScala.zipWithIndex) {
      val t = templates(c.get("template").asText())
      val items = c.get("items").elements().asScala.map(item).toVector
      val page = if (c.get("page").isNull) None else Some(c.get("page").asInt())
      if (c.has("error") && c.get("error").asText() == "ZeroDivisionError") {
        intercept[ArithmeticException] {
          slicer.sliceToTable(items, t.tableBox, t.columns, page)
        }
        nErr += 1
      } else {
        val grid = slicer.sliceToTable(items, t.tableBox, t.columns, page)
        val expected = c.get("grid").elements().asScala
          .map(_.elements().asScala.map(_.asText()).toVector).toVector
        assert(grid == expected, s"case $idx grid mismatch")
        val q = checker.checkExtraction(grid, items)
        val eq = c.get("quality")
        assert(q.emptyRatio == eq.get("empty_ratio").asDouble(), s"case $idx empty_ratio")
        assert(q.confidenceAvg == eq.get("confidence_avg").asDouble(), s"case $idx conf")
        assert(q.rowConsistency == eq.get("row_consistency").asBoolean(), s"case $idx rowcons")
        assert(q.columnAlignment == eq.get("column_alignment").asBoolean(), s"case $idx colalign")
        assert(q.textCoverage == eq.get("text_coverage").asDouble(), s"case $idx coverage")
        assert(q.overallScore == eq.get("overall_score").asDouble(), s"case $idx score")
        val types = eq.get("column_types").elements().asScala.map(_.asText()).toVector
        assert(q.columnTypes == types, s"case $idx column_types")
        val warns = eq.get("warnings").elements().asScala.map(_.asText()).toVector
        assert(q.warnings == warns, s"case $idx warnings")
        nGrid += 1
      }
    }
    info(s"verified $nGrid grids + $nErr expected failures against the reference")
    assert(nGrid > 30)
  }

  test("splittability classifier matches slicer.py:181-194") {
    val slicer = new Slicer()
    root.get("splittable").fields().asScala.foreach { e =>
      assert(slicer.isSplittableText(e.getKey) == e.getValue.asBoolean(),
        s"splittable('${e.getKey}')")
    }
  }

  test("adaptive row threshold matches slicer.py:123-150") {
    val slicer = new Slicer(defaultRowThreshold = 20.0)
    for (c <- root.get("thresholds").elements().asScala) {
      val ys = c.get("ys").elements().asScala.map(_.asInt()).toVector
      val items = ys.map(y => TextItem("t", 1, 0, y, 10, 10, 90))
      assert(slicer.getAdaptiveRowThreshold(items) == c.get("threshold").asDouble(),
        s"ys=$ys")
    }
  }

  test("SequenceMatcher.ratio port matches difflib exactly") {
    for (p <- root.get("ratio_pairs").elements().asScala) {
      val a = p.get("a").asText(); val b = p.get("b").asText()
      assert(SeqMatcher.ratio(a, b) == p.get("ratio").asDouble(), s"ratio('$a','$b')")
    }
  }

  test("get_close_matches port matches difflib (n=1, cutoff=0.8)") {
    val keys = templates.keys.toVector.sorted
    for (c <- root.get("close_matches").elements().asScala) {
      val w = c.get("word").asText()
      val expected = c.get("matches").elements().asScala.map(_.asText()).toVector
      assert(SeqMatcher.getCloseMatches(w, keys, n = 1, cutoff = 0.8) == expected,
        s"close_matches('$w')")
    }
  }

  test("vendor keyword scoring matches template.py:259-306") {
    for (c <- root.get("vendor_cases").elements().asScala) {
      val items = c.get("texts").elements().asScala.zipWithIndex.map { case (t, i) =>
        TextItem(t.asText(), 1, 0, i * 10, 10, 10, 0)
      }.toVector
      val expected = if (c.get("vendor").isNull) None else Some(c.get("vendor").asText())
      assert(Vendor.detectVendor(items) == expected, s"texts=${items.map(_.text)}")
    }
  }
}
