package graft.model

/** Core data model for the extraction engine.
  *
  * The north-rule input/output row shape (BASELINE.json input_hint):
  * `(doc_id: string, spans: array<struct<kind, text, media_ref, offset>>)`.
  *
  * Raw (input) span kinds:  html | pdf_text | table_raw | media | edi |
  *                          docx | sheet | dicom
  * Extracted (output) kinds: text | heading | table_cell | figure | error
  * (boilerplate blocks are dropped, so they never appear in output).
  *
  * Mirrors the reference's per-page unit of work `PageImage`
  * (reference src/preprocessing/pdf_processor.py:133-211) collapsed into the
  * span representation mandated by the driver.
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

object SpanKind {
  // raw kinds
  val Html = "html"
  val PdfText = "pdf_text"
  val TableRaw = "table_raw"
  val Media = "media"
  val Edi = "edi"
  val Docx = "docx"
  val Sheet = "sheet"
  val Dicom = "dicom"
  // extracted kinds
  val Text = "text"
  val Heading = "heading"
  val TableCell = "table_cell"
  val Figure = "figure"
  val Error = "error"
}

/** A document row: ordered raw spans. */
final case class Doc(doc_id: String, spans: Seq[Span])

/** Extraction output row with lineage (reference Provenance.extraction_path,
  * src/pipeline/provenance.py:132-139: append-only path of processing steps).
  */
final case class ExtractedDoc(
    doc_id: String,
    spans: Seq[Span],
    n_spans: Int,
    n_errors: Int,
    modalities: Seq[String],
    extraction_path: Seq[String])

/** Per-span provenance leaf (reference src/pipeline/provenance.py:66-171:
  * 1-based page, normalized bbox, VLM-style block id `blk_p{page}_{idx}`,
  * append-only extraction path).
  */
final case class Provenance(
    page: Int,
    bbox: Bbox,
    source_block_id: String,
    extraction_path: Seq[String])

/** Normalized bounding box, coords in [0,1] as (x1,y1,x2,y2).
  * Reference: src/pipeline/layout_types.py:11-17 (normalized bbox) and
  * src/agents/reconciler.py:173-199 (IoU over x1y1x2y2 form).
  */
final case class Bbox(x1: Double, y1: Double, x2: Double, y2: Double)

/** One cell of a parsed table grid (reference TableCell,
  * src/pipeline/table_types.py:14-25, reduced to deterministic fields).
  */
final case class Cell(rowIndex: Int, colIndex: Int, text: String)

/** A parsed table grid (reference DetectedTable rows/headers,
  * src/pipeline/table_types.py:28-81). Row flags mirror TableRow.
  */
final case class GridRow(
    rowIndex: Int,
    cells: Seq[Cell],
    isHeaderRow: Boolean,
    isTotalRow: Boolean,
    isSeparatorRow: Boolean)

final case class Grid(headers: Seq[String], rows: Seq[GridRow], columnCount: Int)

/** Per-page/per-media image quality metrics (reference
  * src/preprocessing/image_enhancer.py:855-928). At fixture scale these are
  * derived deterministically from metadata, not decoded pixels.
  */
final case class QualityMetrics(
    blurScore: Double,
    brightness: Double,
    contrast: Double) {
  def lowContrast: Boolean = contrast < 30.0
  def isDark: Boolean = brightness < 100.0
  // composite 0-100: 0.4*sharpness + 0.3*contrast + 0.3*brightness
  // (image_enhancer.py:918-927; sharpness scaled from blur variance)
  def qualityScore: Double = {
    val sharpness = math.min(100.0, blurScore / 5.0)
    val contrastScore = math.min(100.0, contrast * (100.0 / 64.0))
    val brightnessScore = 100.0 - math.abs(brightness - 128.0) * (100.0 / 128.0)
    0.4 * sharpness + 0.3 * contrastScore + 0.3 * brightnessScore
  }
}
