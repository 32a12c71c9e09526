package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → main-text extraction for web-corpus ingestion (the
  * trafilatura/jusText step of a training-data pipeline, reduced to its
  * deterministic core): drop non-content subtrees, strip tags, decode
  * entities, normalize whitespace.
  *
  * Everything is a chain of native `regexp_replace`/`concat` expressions —
  * no UDFs — so the whole extraction stays inside whole-stage codegen and
  * is a map-only pass at 100 TB. The boilerplate heuristic is structural
  * (drop `<script> <style> <head> <nav> <header> <footer> <aside>
  * <noscript> <form> <template>` subtrees and comments), which is the
  * deterministic subset of density-based extractors; a density pass can
  * be layered on the emitted lines with the existing quality operators
  * (`t_quality_score`'s ratios are exactly jusText's line features).
  *
  * The inverse pair [[escape]]/[[mainText]] is exact on any text without
  * control characters, which makes the extraction hash-oracle-able: render
  * a page around a document, extract, and the round trip must reproduce
  * the document byte-for-byte (driver-verified end-to-end by
  * `d_warc_extract`, which runs this extraction over a rendered WARC
  * corpus and hash-matches the whitespace-normalized source text).
  */
object HtmlText {

  /** Subtrees that never contain main content. Matched non-greedily and
    * case-insensitively, with attributes allowed on the opening tag.
    * Nested same-tag subtrees are not a thing for this set in valid HTML
    * (none of these elements may nest inside themselves). */
  private val BoilerplateTags = Seq("script", "style", "head", "nav",
    "header", "footer", "aside", "noscript", "form", "template")

  /** Named entities the decoder understands, decoded AFTER tag stripping
    * (so a literal `&lt;` in the source never turns into a strippable
    * tag) and with `&amp;` LAST (so `&amp;lt;` decodes to the literal
    * string `&lt;`, matching every browser). */
  private val Entities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** HTML-escape `text` for embedding in element content: `&` first, then
    * the angle brackets. The exact inverse of [[decodeEntities]] on the
    * escaped alphabet. */
  def escape(text: Column): Column = {
    val amp = regexp_replace(text, "&", "&amp;")
    val lt = regexp_replace(amp, "<", "&lt;")
    regexp_replace(lt, ">", "&gt;")
  }

  private def dropSubtrees(html: Column): Column =
    BoilerplateTags.foldLeft(html) { (c, tag) =>
      // (?is): case-insensitive + DOTALL so subtrees spanning lines go;
      // \b keeps <header> from also eating <head>'s pattern and vice
      // versa (the tag name must end at a word boundary)
      regexp_replace(c, s"(?is)<$tag\\b[^>]*>.*?</$tag\\s*>", " ")
    }

  private def dropComments(html: Column): Column =
    regexp_replace(html, "(?s)<!--.*?-->", " ")

  /** Strip every remaining tag (incl. DOCTYPE and self-closing tags),
    * replacing with a space so `</p><p>` never glues two words. */
  private def stripTags(html: Column): Column =
    regexp_replace(html, "<[^>]*>", " ")

  /** Decode the named-entity set plus decimal/hex numeric references for
    * the ASCII range (enough for the escaped alphabet and common corpus
    * entities; exotic references pass through untouched — visible, not
    * corrupted). */
  def decodeEntities(c: Column): Column = {
    // numeric first: &#60; / &#x3C; for the escapable chars
    val dec = regexp_replace(c, "&#0*60;", "<")
    val dec2 = regexp_replace(dec, "&#0*62;", ">")
    val dec3 = regexp_replace(dec2, "(?i)&#x0*3c;", "<")
    val dec4 = regexp_replace(dec3, "(?i)&#x0*3e;", ">")
    // the entity strings contain no regex metacharacters and the
    // replacements no '$'/'\', so literal pattern/replacement is safe
    Entities.foldLeft(dec4) { case (acc, (e, ch)) => regexp_replace(acc, e, ch) }
  }

  /** Collapse all whitespace runs to single spaces and trim. */
  def normalizeWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** The full extraction: boilerplate subtrees out, comments out, tags
    * stripped, entities decoded, whitespace normalized. */
  def mainText(html: Column): Column =
    normalizeWs(decodeEntities(stripTags(dropComments(dropSubtrees(html)))))

  /** Deterministic page renderer for round-trip verification and fixtures:
    * wraps `text` in a realistic page skeleton — chrome in every
    * boilerplate position (head/title, header, nav, aside, footer, a
    * script with a bare `<`, a comment) and the escaped document as the
    * single `<main><article><p>` body. `mainText(renderPage(t)) == t`
    * for any single-spaced text. */
  def renderPage(text: Column, title: Column, lang: Column): Column =
    concat(
      lit("<!DOCTYPE html><html lang=\""), lang,
      lit("\"><head><meta charset=\"utf-8\"><title>"), escape(title),
      lit("</title><style>body { margin: 0; }</style></head><body>" +
        "<header><h1>Corpus &amp; Co.</h1></header>" +
        "<nav><a href=\"/\">home</a> <a href=\"/about\">about</a></nav>" +
        "<!-- rendered by graft -->" +
        "<main><article><p>"), escape(text),
      lit("</p></article></main>" +
        "<aside>related &lt;links&gt;</aside>" +
        "<footer>&#169; 2026 example.org</footer>" +
        "<script>if (1 < 2) { console.log(\"<p>not content</p>\"); }</script>" +
        "</body></html>"))
}
