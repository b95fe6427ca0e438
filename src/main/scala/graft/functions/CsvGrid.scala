package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column twin of [[graft.kernel.Csv.render]] for RECTANGULAR grids (the
  * slicer guarantees rectangularity — G8 row padding), built entirely from
  * codegen'd builtins (higher-order `transform` + `array_join`), so the
  * fallback sink's render stays inside whole-stage codegen instead of
  * round-tripping through a UDF. Equivalence with the kernel renderer is
  * spec-gated on both the pandas golden battery and live extracted grids
  * (CsvFallbackSpec).
  */
object CsvGrid {

  /** `cells: array<array<string>>` → the pandas-parity CSV text. */
  def column(cells: Column): Column = {
    // pandas quotes a lone empty field only in single-column frames
    val singleCol = size(cells) > 0 && size(element_at(cells, 1)) === 1
    def fld(c0: Column): Column = {
      // null cells render as empty fields (Csv.render pads missing cells);
      // without this, array_join would silently drop the element AND its comma
      val c = coalesce(c0, lit(""))
      when((singleCol && c === "") ||
           c.contains(",") || c.contains("\"") || c.contains("\n"),
        concat(lit("\""), replace(c, lit("\""), lit("\"\"")), lit("\"")))
        .otherwise(c)
    }
    val rows = transform(cells, row => array_join(transform(row, fld(_)), ","))
    when(size(cells) === 0, lit(""))
      .otherwise(concat(array_join(rows, "\n"), lit("\n")))
  }
}
