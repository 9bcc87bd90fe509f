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
    "&apos;" -> "'", "&nbsp;" -> " ",
    "&amp;" -> "&"
  )

  // numeric character references (&#160; / &#x2019;), which the reference
  // gets for free from BeautifulSoup: real VGSI pages emit &#160; after
  // money fields and &#39; in owner names — left literal, they ride into
  // the coercions and silently turn a parsed number into None. Decoded
  // BEFORE the named pass: "&amp;#60;" contains no "&#" substring, so
  // double-escapes stay literal exactly as in the named-entity ordering.
  private val numericEntity = "&#([xX][0-9a-fA-F]{1,6}|[0-9]{1,7});".r

  def decode(s: String): String = {
    val n =
      if (!s.contains("&#")) s
      else
        numericEntity.replaceAllIn(s, m => {
          val g = m.group(1)
          val cp =
            if (g.charAt(0) == 'x' || g.charAt(0) == 'X') Integer.parseInt(g.substring(1), 16)
            else Integer.parseInt(g)
          // surrogate code points are valid-range but unencodable alone
          // (toChars would mint a lone surrogate); leave them literal
          if (Character.isValidCodePoint(cp) && cp != 0 && !(cp >= 0xD800 && cp <= 0xDFFF))
            Regex.quoteReplacement(new String(Character.toChars(cp)))
          else Regex.quoteReplacement(m.matched)
        })
    entities.foldLeft(n) { case (acc, (e, c)) => acc.replace(e, c) }
  }

  /** Inner HTML → visible text (tags → separators, collapse, trim).
    * U+00A0 (raw or via `&#160;`/`&nbsp;`) folds into plain space before
    * the collapse: Java's `\s` and `trim` are ASCII-only, so an NBSP
    * would otherwise survive at a field's edge and break the numeric
    * coercions — BeautifulSoup's `get_text(strip=True)` (the behavior
    * this mirrors) strips it as Unicode whitespace.
    */
  def text(inner: String): String =
    decode(inner.replaceAll("(?s)<[^>]*>", " "))
      .replace('\u00A0', ' ')
      .replaceAll("\\s+", " ").trim

  // (?![\w-]) after the tag name and (?<![\w-]) before the attribute,
  // never \b: '-' is a word boundary, so <span-x> would satisfy <span\b
  // and a greedy [^>]* backtracking onto data-id= would satisfy \bid= —
  // the same hyphen trap attrOf already guards for its wanted attribute
  private def tagRegex(tag: String, attr: String, value: String): Regex =
    ("(?is)<" + tag + "(?![\\w-])[^>]*(?<![\\w-])" + attr + "\\s*=\\s*[\"']" +
      Regex.quote(value) + "[\"'][^>]*>(.*?)</" + tag + ">").r

  private def openTagRegex(tag: String, attr: String, value: String): Regex =
    ("(?is)<" + tag + "(?![\\w-])[^>]*(?<![\\w-])" + attr + "\\s*=\\s*[\"']" +
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
    "(?is)<span(?![\\w-])[^>]*(?<![\\w-])id\\s*=\\s*[\"']([^\"']+)[\"'][^>]*>(.*?)</span>".r
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
      val cell = ("(?is)<" + cellTags + "(?![\\w-])[^>]*>(.*?)</" + cellTags + ">").r
      "(?is)<tr(?![\\w-])[^>]*>(.*?)</tr>".r
        .findAllMatchIn(inner)
        .map { tr =>
          cell.findAllMatchIn(tr.group(1)).map(td => text(td.group(1))).toSeq
        }
        .toSeq
    }

  def tableText(html: String, tableId: String): Option[String] =
    innerByAttr(html, "table", "id", tableId).map(text)
}
