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

  /** Markdown rendering of one extracted document (reference
    * src/export/markdown_exporter.py shape: heading levels, paragraph
    * blocks, figures as links, table cells inline) — a pure row formatter,
    * distributable with `.map(renderMarkdown)` over the typed Dataset.
    */
  def renderMarkdown(doc: ExtractedDoc): String = {
    val sb = new StringBuilder(s"# ${doc.doc_id}\n")
    doc.spans.foreach { s =>
      s.kind match {
        case "heading" => sb.append(s"\n## ${s.text}\n")
        case "figure" => sb.append(s"\n![media](${s.media_ref})\n")
        case "table_cell" => sb.append(s"| ${s.text} ")
        case "error" => sb.append(s"\n> ERROR: ${s.text}\n")
        case _ => sb.append(s"\n${s.text}\n")
      }
    }
    sb.append('\n').toString
  }

  /** HMAC-SHA-256 export receipt (reference src/export/signed_receipt.py:
    * 82-190): sha256 per artefact + an HMAC signature over the canonical
    * "name:hash" payload with a shared secret; None key -> unsigned receipt
    * (artefact hashes still present, matching the keyless path).
    */
  final case class Receipt(artefactHashes: Map[String, String], signature: Option[String])

  def mintReceipt(artefacts: Map[String, Array[Byte]],
      signingKey: Option[String]): Receipt = {
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    val hashes = artefacts.map { case (name, bytes) =>
      sha.reset()
      name -> sha.digest(bytes).map("%02x".format(_)).mkString
    }
    val signature = signingKey.map { key =>
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(key.getBytes("UTF-8"), "HmacSHA256"))
      val payload = hashes.toSeq.sorted.map { case (n, h) => s"$n:$h" }.mkString("\n")
      mac.doFinal(payload.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    Receipt(hashes, signature)
  }

  /** Constant-time receipt verification (signed_receipt.py:216-272). */
  def verifyReceipt(receipt: Receipt, artefacts: Map[String, Array[Byte]],
      signingKey: Option[String]): Boolean = {
    val fresh = mintReceipt(artefacts, signingKey)
    fresh.artefactHashes == receipt.artefactHashes &&
      ((fresh.signature, receipt.signature) match {
        case (Some(a), Some(b)) =>
          java.security.MessageDigest.isEqual(a.getBytes, b.getBytes)
        case (None, None) => true
        case _ => false
      })
  }

  /** Markdown export: one .md document per row, written as (doc_id, md)
    * text-friendly parquet (single markdown files per doc would be the
    * classic small-files failure at corpus scale; consumers slice by id).
    */
  def writeMarkdown(docs: Dataset[ExtractedDoc], outDir: String): Unit = {
    import docs.sparkSession.implicits._
    docs.map(d => (d.doc_id, renderMarkdown(d)))
      .toDF("doc_id", "markdown")
      .write.mode(SaveMode.Overwrite).parquet(outDir)
  }
}
