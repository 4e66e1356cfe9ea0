package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._
import graft.model.ExtractedDoc

/** Export sinks (SURVEY.md §2.1 export row; reference
  * src/export/json_exporter.py:105-185, 279): the reference's
  * "dataframe-flat" JSON export is literally our long-format span table, so
  * the exporters are thin writers over the two canonical shapes.
  */
object Export {

  /** Long-format ("dataframe-flat", json_exporter.py:279) span table:
    * one row per span, document order preserved by (doc_id, offset).
    */
  def flatSpans(docs: Dataset[ExtractedDoc]): DataFrame =
    docs.select(col("doc_id"), explode(col("spans")).as("s"),
        col("modalities"), col("extraction_path"))
      .select(col("doc_id"), col("s.offset").as("offset"), col("s.kind").as("kind"),
        col("s.text").as("text"), col("s.media_ref").as("media_ref"),
        col("modalities"), col("extraction_path"))

  /** JSON-lines export of the flat table (minimal profile). */
  def writeJson(docs: Dataset[ExtractedDoc], outDir: String): Unit =
    flatSpans(docs).write.mode(SaveMode.Overwrite).json(outDir)

  /** Nested-document JSON-lines export (standard profile: one object per
    * document with its ordered span array).
    */
  def writeJsonNested(docs: Dataset[ExtractedDoc], outDir: String): Unit =
    docs.toDF().write.mode(SaveMode.Overwrite).json(outDir)

  /** Parquet export of the flat table (the analytics-facing sink). */
  def writeFlatParquet(docs: Dataset[ExtractedDoc], outDir: String): Unit =
    flatSpans(docs).write.mode(SaveMode.Overwrite).parquet(outDir)
}
