package graft.kernel

/** Post-extraction quality validation — re-expression of the reference's
  * QualityChecker (`quality.py:64-271`). Pure per-document kernel; fleet-level
  * rollups (avg score, failure rates) are plain Spark aggregations downstream.
  */
final class QualityChecker(
    val emptyThreshold: Double = 0.3,       // quality.py:68
    val confidenceThreshold: Double = 70.0, // quality.py:69
    val coverageThreshold: Double = 0.5) {  // quality.py:70

  /** A8 — all checks + overall score, `check_extraction` quality.py:75-154. */
  def checkExtraction(
      cells: Vector[Vector[String]],
      extracted: Seq[TextItem]): QualityReport = {

    if (cells.isEmpty || cells.head.isEmpty) {
      // empty-frame short circuit, quality.py:94-106
      return ExtractedDoc.emptyQuality.copy(totalTextItems = extracted.length)
    }

    val warnings = Vector.newBuilder[String]

    val emptyRatio = checkEmptyCells(cells)
    if (emptyRatio > emptyThreshold)
      warnings += s"High empty ratio: ${Py.format1f(emptyRatio * 100)}%"

    val confidenceAvg = checkOcrConfidence(extracted)
    if (confidenceAvg < confidenceThreshold)
      warnings += s"Low OCR confidence: ${Py.format1f(confidenceAvg)}%"

    val rowConsistency = checkRowPatterns(cells)
    if (!rowConsistency) warnings += "Inconsistent row patterns"

    val columnAlignment = checkColumnConsistency(cells)
    if (!columnAlignment) warnings += "Poor column alignment"

    val textCoverage = checkCoverage(cells, extracted)
    if (textCoverage < coverageThreshold)
      warnings += s"Low coverage: ${Py.format1f(textCoverage * 100)}%"

    val columnTypes = inferColumnTypes(cells)

    // simple mean of 5 subscores ×100, quality.py:132-140
    val scores = Vector(
      math.max(0.0, 1.0 - (emptyRatio / emptyThreshold)),
      math.min(1.0, confidenceAvg / 100.0),
      if (rowConsistency) 1.0 else 0.0,
      if (columnAlignment) 1.0 else 0.0,
      math.min(1.0, textCoverage / coverageThreshold))
    val overallScore = scores.sum / scores.length * 100.0

    QualityReport(
      emptyRatio = emptyRatio,
      confidenceAvg = confidenceAvg,
      rowConsistency = rowConsistency,
      columnAlignment = columnAlignment,
      textCoverage = textCoverage,
      overallScore = overallScore,
      nRows = cells.length,
      nCols = cells.head.length,
      totalTextItems = extracted.length,
      columnTypes = columnTypes,
      warnings = warnings.result(),
      errors = Vector.empty)
  }

  /** A2 — empty-cell ratio, quality.py:156-162 (cells are never null here). */
  def checkEmptyCells(cells: Vector[Vector[String]]): Double = {
    val total = cells.length * cells.head.length
    if (total == 0) return 1.0
    val empty = cells.iterator.map(_.count(c => c == null || c == "")).sum
    empty.toDouble / total
  }

  /** A3 — mean confidence, quality.py:164-169. */
  def checkOcrConfidence(extracted: Seq[TextItem]): Double =
    if (extracted.isEmpty) 0.0
    else extracted.iterator.map(_.confidence).sum.toDouble / extracted.length

  /** A4 — row-pattern consistency: ≤2 distinct non-empty counts,
    * quality.py:171-177. */
  def checkRowPatterns(cells: Vector[Vector[String]]): Boolean =
    cells.map(_.count(_ != "")).distinct.length <= 2

  /** A5 — column-fill consistency: ≤1 column with fill <0.1 or >0.9,
    * quality.py:179-201. */
  def checkColumnConsistency(cells: Vector[Vector[String]]): Boolean = {
    val nCols = cells.head.length
    val nRows = cells.length
    var extreme = 0
    var c = 0
    while (c < nCols) {
      var filled = 0
      var r = 0
      while (r < nRows) {
        val v = cells(r)(c)
        if (v != null && v != "") filled += 1
        r += 1
      }
      val ratio = filled.toDouble / nRows
      if (ratio < 0.1 || ratio > 0.9) extreme += 1
      c += 1
    }
    extreme <= 1
  }

  /** A6 — text coverage: |words(table) ∩ words(items)| / |words(items)|,
    * set semantics, lower-cased, CPython whitespace split, quality.py:203-223. */
  def checkCoverage(cells: Vector[Vector[String]], extracted: Seq[TextItem]): Double = {
    val tableWords: Set[String] =
      cells.iterator.flatten.flatMap(c => Py.split(c.toLowerCase)).toSet
    val origWords: Set[String] =
      extracted.iterator.flatMap(i => Py.split(i.text.toLowerCase)).toSet
    if (origWords.isEmpty) 0.0
    else (tableWords & origWords).size.toDouble / origWords.size
  }

  /** A7 — per-column logical type by 70% majority, priority
    * currency > numeric > date > text; all-blank → 'empty', quality.py:225-271. */
  def inferColumnTypes(cells: Vector[Vector[String]]): Vector[String] = {
    val nCols = cells.head.length
    (0 until nCols).map { c =>
      val colData = cells.iterator.map(_(c)).filter(v => v != null && v != "").toVector
      if (colData.isEmpty) "empty"
      else {
        var numeric = 0; var currency = 0; var date = 0
        for (v <- colData) {
          val s = Py.strip(v)
          if (s.exists(ch => ch == '$' || ch == '£' || ch == '€' || ch == '¥')) currency += 1
          else if (Py.isDigit(s.replace(",", "").replace(".", "").replace("-", ""))) numeric += 1
          else if (s.contains('/') || s.contains('-')) {
            val parts = s.replace('/', '-').split("-", -1)
            if (parts.length == 3 && parts.forall(Py.isDigit)) date += 1
          }
        }
        val total = colData.length.toDouble
        if (currency / total > 0.7) "currency"
        else if ((numeric + currency) / total > 0.7) "numeric"
        else if (date / total > 0.7) "date"
        else "text"
      }
    }.toVector
  }
}
