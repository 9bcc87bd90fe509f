package graft.sources.vgsi

import scala.util.matching.Regex

/** Minimal HTML extractor for VGSI parcel pages (flat span/table/img
  * markup — no nesting of same-name tags inside the targets). The
  * environment ships no HTML library, and the full generality of one is not
  * needed: the reference only reads spans by id, imgs by id/alt, and flat
  * tables by id (/root/reference/scrapers/vgsi/source.py:261-268,385-401,
  * 417-501).
  *
  * Text extraction mirrors BeautifulSoup's `get_text(separator=" ",
  * strip=True)`: nested tags become separators, entities decode, whitespace
  * collapses, ends trim.
  */
object Html {

  // &amp; must decode LAST: decoding it first would turn a double-escaped
  // "&amp;lt;" into "&lt;" and then wrongly into "<"
  private val entities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
    "&amp;" -> "&"
  )

  def decode(s: String): String =
    entities.foldLeft(s) { case (acc, (e, c)) => acc.replace(e, c) }

  /** Inner HTML → visible text (tags → separators, collapse, trim). */
  def text(inner: String): String =
    decode(inner.replaceAll("(?s)<[^>]*>", " ")).replaceAll("\\s+", " ").trim

  private def tagRegex(tag: String, attr: String, value: String): Regex =
    ("(?is)<" + tag + "\\b[^>]*\\b" + attr + "\\s*=\\s*[\"']" +
      Regex.quote(value) + "[\"'][^>]*>(.*?)</" + tag + ">").r

  private def openTagRegex(tag: String, attr: String, value: String): Regex =
    ("(?is)<" + tag + "\\b[^>]*\\b" + attr + "\\s*=\\s*[\"']" +
      Regex.quote(value) + "[\"'][^>]*>").r

  /** Inner HTML of the first `tag` with the given attribute value. */
  def innerByAttr(html: String, tag: String, attr: String, value: String): Option[String] =
    tagRegex(tag, attr, value).findFirstMatchIn(html).map(_.group(1))

  def textById(html: String, tag: String, id: String): Option[String] =
    innerByAttr(html, tag, "id", id).map(text)

  /** Attribute value of the first `tag` whose `byAttr`=`byValue`. */
  def attrOf(html: String, tag: String, byAttr: String, byValue: String, wanted: String): Option[String] =
    openTagRegex(tag, byAttr, byValue)
      .findFirstMatchIn(html)
      .flatMap { m =>
        // (?<![\w-]), not \b: \b matches after a hyphen, so a data-src
        // attribute earlier in the tag would be returned as "src" (the
        // lazy-loading markup trap)
        ("(?i)(?<![\\w-])" + wanted + "\\s*=\\s*[\"']([^\"']*)[\"']").r
          .findFirstMatchIn(m.matched)
          .map(a => decode(a.group(1)))
      }

  /** All spans carrying an id → visible text (the reference's span index,
    * source.py:261-268).
    */
  def spanIndex(html: String): Map[String, String] =
    "(?is)<span\\b[^>]*\\bid\\s*=\\s*[\"']([^\"']+)[\"'][^>]*>(.*?)</span>".r
      .findAllMatchIn(html)
      .map(m => m.group(1) -> text(m.group(2)))
      .toMap

  /** Rows (header row included) of the table with the given id, as cell
    * text lists. `cellTags` selects which cells count: "t[dh]" (th+td, the
    * default — header parsing) or "td" (data cells only — mirrors
    * BeautifulSoup's `tr.find_all("td")` used by the reference for body
    * rows, so pages with th-labeled rows don't leak header text as data).
    */
  def tableRows(html: String, tableId: String, cellTags: String = "t[dh]"): Option[Seq[Seq[String]]] =
    innerByAttr(html, "table", "id", tableId).map { inner =>
      val cell = ("(?is)<" + cellTags + "\\b[^>]*>(.*?)</" + cellTags + ">").r
      "(?is)<tr\\b[^>]*>(.*?)</tr>".r
        .findAllMatchIn(inner)
        .map { tr =>
          cell.findAllMatchIn(tr.group(1)).map(td => text(td.group(1))).toSeq
        }
        .toSeq
    }

  def tableText(html: String, tableId: String): Option[String] =
    innerByAttr(html, "table", "id", tableId).map(text)
}
