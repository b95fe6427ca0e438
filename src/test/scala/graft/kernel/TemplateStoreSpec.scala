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

  test("create: validate-normalize-persist; update preserves created provenance") {
    val path = tmpFile()
    val t1 = "2025-09-01T00:00:00Z"; val t2 = "2025-09-02T00:00:00Z"
    // messy geometry: unsorted guides, guides outside the box
    val r1 = TemplateStore.create(path, "Acme",
      Vector(100, 200, 900, 1000), Vector(950, 90, 400), nowIso = t1)
    assert(r1.isRight)
    // auto-sort (90,400,950) then clamp head to x1=100 and last to x2=900
    assert(r1.toOption.get.columns == Vector(100, 400, 900))
    val loaded1 = TemplateStore.load(path)
    assert(loaded1.keySet == Set("acme")) // key normalized
    assert(loaded1("acme").created == t1 && loaded1("acme").modified == t1)

    // update under a differently-cased key: geometry replaced, created kept
    val r2 = TemplateStore.create(path, "ACME",
      Vector(50, 50, 800, 900), Vector(60, 300, 700), nowIso = t2)
    assert(r2.isRight)
    val loaded2 = TemplateStore.load(path)
    assert(loaded2("acme").columns == Vector(60, 300, 700))
    assert(loaded2("acme").created == t1, "created provenance must survive updates")
    assert(loaded2("acme").modified == t2)
  }

  test("create: invalid geometry is rejected and never touches the registry") {
    val path = tmpFile()
    assert(TemplateStore.create(path, "good",
      Vector(0, 0, 500, 500), Vector(0, 250, 500), nowIso = "t").isRight)
    val before = Files.readAllBytes(Paths.get(path)).toVector
    // degenerate box
    assert(TemplateStore.create(path, "bad1",
      Vector(9, 9, 9, 9), Vector(1, 2)) == Left("invalid_template"))
    // single column guide
    assert(TemplateStore.create(path, "bad2",
      Vector(0, 0, 100, 100), Vector(50)) == Left("invalid_template"))
    // blank vendor
    assert(TemplateStore.create(path, "  ",
      Vector(0, 0, 100, 100), Vector(0, 100)) == Left("invalid_vendor"))
    assert(Files.readAllBytes(Paths.get(path)).toVector == before,
      "a rejected creation must leave the registry byte-identical")
  }
}
