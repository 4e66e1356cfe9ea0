package graft.tokenize

import graft.functions.Strings
import graft.model.{Cell, Grid, GridRow}

/** Serialized table-grid parsing + row reconstruction.
  *
  * Wire format of a `table_raw` span's text: rows separated by `\n`, cells by
  * `|`; row-prefix markers `H:` (header row), `S:` (separator row), `T:`
  * (total row); unmarked rows are data rows.
  *
  * Reconstruction semantics pinned to the reference's `table_to_rows_dict`
  * (src/pipeline/table_types.py:135-168): header names from the header row
  * (fallback `col_i`), header and separator rows dropped, total rows kept,
  * cells mapped by column index, empty rows dropped.
  */
object TableGrid {

  private val pipeRe = java.util.regex.Pattern.compile("\\|")

  def parse(text: String): Grid = {
    if (text == null || text.trim.isEmpty) return Grid(Seq.empty, Seq.empty, 0)
    val lines = text.split('\n').filter(_.nonEmpty)
    var headers = Seq.empty[String]
    val rows = Seq.newBuilder[GridRow]
    var ri = 0
    lines.foreach { line =>
      val (flags, body) =
        if (line.startsWith("H:")) ((true, false, false), line.substring(2))
        else if (line.startsWith("S:")) ((false, false, true), line.substring(2))
        else if (line.startsWith("T:")) ((false, true, false), line.substring(2))
        else ((false, false, false), line)
      val cells = pipeRe.split(body, -1).toIndexedSeq.zipWithIndex.map {
        case (c, ci) => Cell(ri, ci, c)
      }
      val (isHeader, isTotal, isSep) = flags
      if (isHeader && headers.isEmpty) headers = cells.map(_.text.trim)
      rows += GridRow(ri, cells, isHeader, isTotal, isSep)
      ri += 1
    }
    val built = rows.result()
    val colCount = if (built.isEmpty) 0 else built.map(_.cells.length).max
    Grid(headers, built, colCount)
  }

  /** `table_to_rows_dict` semantics: list of (header name -> cell text) maps. */
  def rowsAsMaps(grid: Grid): Seq[Map[String, String]] = {
    val headerNames =
      if (grid.headers.nonEmpty) grid.headers
      else (0 until grid.columnCount).map(i => s"col_$i")
    grid.rows.iterator
      .filterNot(r => r.isHeaderRow || r.isSeparatorRow)
      .map { row =>
        row.cells.map { c =>
          val name =
            if (c.colIndex < headerNames.length) headerNames(c.colIndex)
            else s"col_${c.colIndex}"
          name -> c.text
        }.toMap
      }
      .filter(_.nonEmpty)
      .toSeq
  }

  /** Row-major cell texts for span emission: header + separator rows dropped,
    * data + total rows kept in order, each cell normalized.
    */
  def cellTexts(grid: Grid): Seq[String] =
    grid.rows.iterator
      .filterNot(r => r.isHeaderRow || r.isSeparatorRow)
      .flatMap(_.cells.iterator.map(c => Strings.normalizeWhitespace(c.text)))
      .toSeq
}
