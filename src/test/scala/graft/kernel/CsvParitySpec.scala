package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** S10 cross-implementation parity: the `csv_cases` battery in
  * `golden_kernel.json` carries CSV strings rendered by the reference's own
  * pandas (`df.to_csv(index=False, header=False)`, tools/gen_golden.py) over
  * tricky grids (quotes, commas, embedded newlines, bare CR, lone empty
  * fields, ragged rows, unicode) plus every slicer-produced grid;
  * [[Csv.render]] must match byte-for-byte. */
class CsvParitySpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val root: JsonNode = {
    val in = getClass.getResourceAsStream("/golden_kernel.json")
    require(in != null, "golden_kernel.json missing — run tools/gen_golden.py")
    try mapper.readTree(in) finally in.close()
  }

  test("Csv.render matches pandas to_csv byte-for-byte on the golden battery") {
    val cases = root.get("csv_cases")
    require(cases != null && cases.size() > 60, "csv_cases battery missing/short")
    for ((c, idx) <- cases.elements().asScala.zipWithIndex) {
      val grid = c.get("grid").elements().asScala
        .map(_.elements().asScala.map(_.asText()).toVector).toVector
      val expected = c.get("csv").asText()
      assert(Csv.render(grid) == expected,
        s"case $idx: grid=$grid\n got=${Csv.render(grid)}\nwant=$expected")
    }
  }

  test("quoting corners: CR unquoted, LF quoted, lone empty field quoted") {
    assert(Csv.render(Vector(Vector("a\rb"))) == "a\rb\n")
    assert(Csv.render(Vector(Vector("a\nb"))) == "\"a\nb\"\n")
    assert(Csv.render(Vector(Vector(""))) == "\"\"\n")
    assert(Csv.render(Vector(Vector("", ""))) == ",\n")
    assert(Csv.render(Vector.empty) == "")
    assert(Csv.render(Vector(Vector.empty)) == "\n")
  }
}
