package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** S7/S8 registry lifecycle — the port of the reference's template
  * save/load/reload cycle (`test_gui_sprint.py` template sprint +
  * `template.py:102-169` semantics): load validates and skips invalid
  * entries, save is atomic with backup, missing/corrupt files degrade to the
  * empty registry. */
class TemplateStoreSpec extends AnyFunSuite {

  private def tmpFile(): String =
    Files.createTempDirectory("graft_tstore").resolve("vendor_templates.json").toString

  test("save → load round-trips the builtin registry (validated, lower-cased)") {
    val path = tmpFile()
    assert(TemplateStore.save(path, Vendor.builtinTemplates, nowIso = "2025-09-01T00:00:00"))
    val loaded = TemplateStore.load(path)
    assert(loaded.keySet == Vendor.builtinTemplates.keySet)
    for ((k, t) <- Vendor.builtinTemplates) {
      val l = loaded(k)
      assert(l.tableBox == t.tableBox && l.columns == t.columns &&
        l.confidence == t.confidence, k)
      assert(l.created == "2025-09-01T00:00:00" && l.modified == "2025-09-01T00:00:00")
    }
  }

  test("second save creates an atomic .backup of the previous file") {
    val path = tmpFile()
    assert(TemplateStore.save(path, Map("test" -> Vendor.builtinTemplates("test")),
      nowIso = "t1"))
    val v1 = Files.readString(Paths.get(path))
    assert(TemplateStore.save(path, Vendor.builtinTemplates, nowIso = "t2"))
    assert(Files.readString(Paths.get(path + ".backup")) == v1,
      "backup must hold the previous registry verbatim")
    assert(TemplateStore.load(path).size == 3)
    // save without backup leaves the old backup untouched
    assert(TemplateStore.save(path, Vendor.builtinTemplates,
      makeBackup = false, nowIso = "t3"))
    assert(Files.readString(Paths.get(path + ".backup")) == v1)
  }

  test("invalid entries are skipped, valid ones load (reference failure ladder)") {
    val path = tmpFile()
    Files.writeString(Paths.get(path),
      """{
        |  "good": {"table_box": [0, 0, 100, 100], "columns": [10, 50, 90], "vendor": "good"},
        |  "badbox": {"table_box": [100, 0, 0, 100], "columns": [10, 50], "vendor": "badbox"},
        |  "onecol": {"table_box": [0, 0, 100, 100], "columns": [10], "vendor": "onecol"},
        |  "missing": {"vendor": "missing"},
        |  "UPPER": {"table_box": [0, 0, 9, 9], "columns": [1, 8], "vendor": "UPPER"}
        |}""".stripMargin)
    val loaded = TemplateStore.load(path)
    assert(loaded.keySet == Set("good", "upper"), loaded.keySet)
    // unsorted columns auto-sort, out-of-box ends clamp (template.py:51-60)
    Files.writeString(Paths.get(path),
      """{"v": {"table_box": [10, 0, 100, 50], "columns": [120, 5, 50], "vendor": "v"}}""")
    val v = TemplateStore.load(path)("v")
    assert(v.columns == Vector(10, 50, 100), v.columns)
  }

  test("missing file and corrupt JSON yield the empty registry, never throw") {
    assert(TemplateStore.load("/nonexistent/nowhere.json").isEmpty)
    val path = tmpFile()
    Files.writeString(Paths.get(path), "{ not json ]")
    assert(TemplateStore.load(path).isEmpty)
    Files.writeString(Paths.get(path), "[1, 2, 3]") // valid JSON, wrong shape
    assert(TemplateStore.load(path).isEmpty)
  }

  test("A9 stats port matches template.py:308-336 semantics") {
    val s = TemplateStore.stats(Vendor.builtinTemplates)
    assert(s.count == 3)
    assert(s.vendors == Vector("newark", "sysco", "test"))
    assert(s.minColumns == 3 && s.maxColumns == 16)
    assert(math.abs(s.avgColumns - 29.0 / 3) < 1e-12)
    assert(TemplateStore.stats(Map.empty) ==
      TemplateStore.Stats(0, Vector.empty, 0.0, 0, 0, "", ""))
    // created-date min/max over entries that have one
    val dated = Map(
      "a" -> Template("a", Vector(0, 0, 9, 9), Vector(1, 8), created = "2025-01-02"),
      "b" -> Template("b", Vector(0, 0, 9, 9), Vector(1, 8), created = "2025-03-04"),
      "c" -> Template("c", Vector(0, 0, 9, 9), Vector(1, 8)))
    val ds = TemplateStore.stats(dated)
    assert(ds.newest == "2025-03-04" && ds.oldest == "2025-01-02")
  }

  test("a loaded registry drives extraction end-to-end (broadcast drop-in)") {
    val path = tmpFile()
    assert(TemplateStore.save(path, Vendor.builtinTemplates, nowIso = "t"))
    val loaded = TemplateStore.load(path)
    val p = Corpus.page(4) // a pdf page in the deterministic corpus
    val viaLoaded = Extractor.extract(p.url, p.html, p.text, p.lang, loaded)
    val viaBuiltin = Extractor.extract(p.url, p.html, p.text, p.lang)
    assert(viaLoaded.extractedText == viaBuiltin.extractedText)
    assert(viaLoaded.vendor == viaBuiltin.vendor)
  }
}
