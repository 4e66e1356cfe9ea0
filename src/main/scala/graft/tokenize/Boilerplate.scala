package graft.tokenize

import graft.functions.{Strings, TextAnalysis}
import scala.util.matching.Regex

/** HTML main-content extraction: block segmentation + text-density /
  * link-density boilerplate classification.
  *
  * Algorithm follows the published Boilerpipe/Kohlschütter block-level
  * text-density + link-density approach with a jusText-style stopword-density
  * signal (see PAPERS.md); the reference repo has no HTML stripper — this is
  * the capability-equivalent reinterpretation mandated by SURVEY.md §0.
  */
object Boilerplate {

  final case class Block(tag: String, text: String, linkDensity: Double, words: Int)

  final case class Config(
      linkDensityThreshold: Double = 0.33,
      minWords: Int = 3,
      stopwordDensityFloor: Double = 0.0)

  private val blockRe: Regex =
    "(?is)<(nav|footer|header|h[1-6]|p|li|div)\\b[^>]*>(.*?)</\\1>".r
  private val anchorRe: Regex = "(?is)<a\\b[^>]*>(.*?)</a>".r
  private val tagRe: Regex = "(?s)<[^>]*>".r

  private def decodeEntities(s: String): String =
    s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")

  private def stripTags(html: String): String =
    Strings.normalizeWhitespace(decodeEntities(tagRe.replaceAllIn(html, " ")))

  /** Segment an HTML fragment into classified blocks in document order. */
  def blocks(html: String): Seq[Block] = {
    if (html == null || html.isEmpty) return Seq.empty
    blockRe.findAllMatchIn(html).flatMap { m =>
      val tag = m.group(1).toLowerCase
      val inner = m.group(2)
      // skip container matches that contain nested block tags (children are
      // matched separately; counting the parent would double-count text)
      if (blockRe.findFirstIn(inner).isDefined) None
      else {
        val text = Strings.cleanOcrText(stripTags(inner))
        val linkText = anchorRe.findAllMatchIn(inner).map(a => stripTags(a.group(1))).mkString(" ")
        val tChars = text.length
        val lChars = math.min(linkText.length, tChars)
        val density = if (tChars == 0) 1.0 else lChars.toDouble / tChars
        Some(Block(tag, text, density, TextAnalysis.tokenCountWs(text)))
      }
    }.toSeq
  }

  def isHeading(b: Block): Boolean = b.tag.length == 2 && b.tag.charAt(0) == 'h'

  /** Boilerplate iff: structural chrome tag, OR link density above threshold,
    * OR too few words (headings exempt from the word floor), OR stopword
    * density below the configured floor (jusText signal; 0 disables).
    */
  def isBoilerplate(b: Block, cfg: Config = Config()): Boolean = {
    if (b.tag == "nav" || b.tag == "footer" || b.tag == "header") return true
    if (b.text.isEmpty) return true
    if (b.linkDensity > cfg.linkDensityThreshold) return true
    if (!isHeading(b) && b.words < cfg.minWords) return true
    if (cfg.stopwordDensityFloor > 0.0 && !isHeading(b) &&
      TextAnalysis.stopwordRatio(b.text) < cfg.stopwordDensityFloor) return true
    false
  }

  /** Main-content blocks with their kinds: (kind in {heading, text}, text). */
  def mainContent(html: String, cfg: Config = Config()): Seq[(String, String)] =
    blocks(html).filterNot(isBoilerplate(_, cfg)).map { b =>
      (if (isHeading(b)) "heading" else "text", b.text)
    }
}
