package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction — the intake step between WARC record splitting
  * ([[WarcSupport]]) and the text-quality operators: a crawl payload is
  * markup, and every downstream signal (dedup shingles, quality scores,
  * token counts) wants the rendered text. One deterministic single pass,
  * no DOM build — at 100 TB the extractor IS the scan, so it must be
  * linear, allocation-light, and total (malformed markup degrades to
  * best-effort text, never an error).
  *
  * Semantics (each pinned by HtmlSpec):
  *  - `<script>`, `<style>`: the whole element content is dropped
  *    (case-insensitive close-tag scan; unterminated → rest of input
  *    dropped — markup text must not leak as corpus text).
  *  - `<!-- comments -->` dropped, including any fake tags inside;
  *    unterminated → rest dropped.
  *  - other tags are zero-width for inline tags and a word break for
  *    block-level tags (p, div, li, h1..h6, br, tr, td, table, ul, ol,
  *    nav, header, footer, section, article, blockquote, pre, hr, title,
  *    head, body, html) — so `<b>x</b>y` joins but `<li>a</li><li>b</li>`
  *    does not. Attribute values may contain quoted `>` without ending
  *    the tag.
  *  - character references decoded: the five XML named entities plus
  *    nbsp, and numeric `&#NNN;` / `&#xHH;` forms (invalid or
  *    out-of-range references stay literal — lone `&` is common text).
  *  - whitespace (including NBSP) collapsed to single spaces, trimmed —
  *    canonical for hashing/shingling whatever the markup's indentation.
  */
object HtmlSupport {

  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
      "tr", "td", "th", "table", "nav", "header", "footer", "section", "article",
      "blockquote", "pre", "hr", "title", "head", "body", "html", "form", "dl",
      "dt", "dd").foreach(s.add)
    s
  }

  private def isWs(c: Char): Boolean = c <= ' ' || c == '\u00A0'

  /** Rendered text of an HTML fragment (never null for non-null input). */
  def extract(html: UTF8String): UTF8String = {
    if (html == null) return null
    val s = html.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var i = 0
    // find "-->" from i, end-exclusive position after it; n if unterminated
    def skipComment(from: Int): Int = {
      val e = s.indexOf("-->", from)
      if (e < 0) n else e + 3
    }
    // case-insensitive search for "</name" then its '>'
    def skipElement(from: Int, name: String): Int = {
      var j = from
      val target = "</" + name
      while (j + target.length <= n) {
        if (s.regionMatches(true, j, target, 0, target.length)) {
          val gt = s.indexOf('>', j)
          return if (gt < 0) n else gt + 1
        }
        j += 1
      }
      n
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) { i = skipComment(i + 4) }
        else {
          // tag name: optional '/', then letters/digits
          var j = i + 1
          var closing = false
          if (j < n && s.charAt(j) == '/') { closing = true; j += 1 }
          val ns = j
          while (j < n && (Character.isLetterOrDigit(s.charAt(j)))) j += 1
          val name = s.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
          // scan to the real tag end, honoring quoted attribute values
          var q = 0.toChar
          var end = -1
          var k = j
          while (end < 0 && k < n) {
            val ck = s.charAt(k)
            if (q != 0) { if (ck == q) q = 0.toChar }
            else if (ck == '"' || ck == '\'') q = ck
            else if (ck == '>') end = k
            k += 1
          }
          i = if (end < 0) n else end + 1
          if (!closing && (name == "script" || name == "style") &&
            end >= 0 && s.charAt(end - 1) != '/') {
            i = skipElement(i, name)
          }
          if (name.nonEmpty && BlockTags.contains(name)) sb.append(' ')
        }
      } else if (c == '&') {
        // character reference; invalid forms stay literal
        val semi = s.indexOf(';', i + 1)
        var consumed = false
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          if (body.startsWith("#")) {
            val num = body.substring(1)
            val cp =
              try {
                if ((num.startsWith("x") || num.startsWith("X")) && num.length > 1)
                  Integer.parseInt(num.substring(1), 16)
                else if (num.nonEmpty && num.forall(_.isDigit)) Integer.parseInt(num)
                else -1
              } catch { case _: NumberFormatException => -1 }
            if (cp >= 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff)) {
              sb.appendCodePoint(cp); i = semi + 1; consumed = true
            }
          } else {
            val rep = body.toLowerCase(java.util.Locale.ROOT) match {
              case "amp" => "&"
              case "lt" => "<"
              case "gt" => ">"
              case "quot" => "\""
              case "apos" => "'"
              case "nbsp" => "\u00A0"
              case _ => null
            }
            if (rep != null) { sb.append(rep); i = semi + 1; consumed = true }
          }
        }
        if (!consumed) { sb.append('&'); i += 1 }
      } else {
        sb.append(c); i += 1
      }
    }
    // collapse whitespace runs (incl. NBSP) to single spaces, trim
    val out = new java.lang.StringBuilder(sb.length)
    var m = 0
    var pendingSpace = false
    while (m < sb.length) {
      val ch = sb.charAt(m)
      if (isWs(ch)) pendingSpace = out.length() > 0
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(ch)
      }
      m += 1
    }
    UTF8String.fromString(out.toString)
  }
}

/** string → string rendered-text extraction (codegen-enabled). */
case class HtmlText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_html_text requires string input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HtmlSupport.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlSupport.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

object HtmlExprs {
  def htmlText(html: Column): Column =
    ColumnShim.column(HtmlText(ColumnShim.expression(html)))
}
