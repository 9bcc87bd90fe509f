package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Crawl-payload charset handling — the step BEFORE any text operator can
  * touch fetched bytes: a `cast(payload AS string)` assumes UTF-8, but
  * real crawls carry UTF-16 BOMs, `<meta charset=…>` declarations, and
  * legacy windows-1252 — mis-decoding silently corrupts every accented
  * character, and every downstream hash/shingle/fingerprint with it (the
  * same failure class q132's mojibake repair exists to undo AFTER the
  * fact; this prevents it AT intake).
  *
  * Detection order (WHATWG encoding-sniffing shape, pinned by
  * CharsetSpec):
  *  1. BOM — UTF-8 (EF BB BF), UTF-16LE (FF FE), UTF-16BE (FE FF); a BOM
  *     OVERRIDES any declaration (the document cannot be read to see the
  *     declaration in another encoding anyway).
  *  2. an ASCII-compatible scan of the first 1024 bytes for a
  *     `charset=` declaration (`<meta charset="…">`, the http-equiv
  *     `content="text/html; charset=…"` form, or an XML
  *     `encoding="…"`), case-insensitive, quotes optional.
  *  3. nothing found → null from [[sniff]]; [[decode]] defaults to UTF-8.
  *
  * Decoding recognizes utf-8, utf-16le/utf-16be (BOM stripped),
  * iso-8859-1/latin-1, windows-1252/cp1252, and us-ascii; an unknown or
  * unsupported label falls back to UTF-8. Malformed sequences decode to
  * U+FFFD rather than failing — untrusted bytes must never kill the scan.
  */
object CharsetSupport {

  /** Detected charset label (lowercase), or null when neither BOM nor
    * declaration is present (the caller's default applies).
    */
  def sniff(bytes: Array[Byte]): UTF8String = {
    if (bytes == null) return null
    val label = sniffLabel(bytes)
    if (label == null) null else UTF8String.fromString(label)
  }

  private def sniffLabel(b: Array[Byte]): String = {
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
      (b(2) & 0xff) == 0xbf) return "utf-8"
    if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe) return "utf-16le"
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff) return "utf-16be"
    // ASCII-compatible prefix scan for charset= / encoding=
    val n = math.min(b.length, 1024)
    val head = new String(b, 0, n, java.nio.charset.StandardCharsets.ISO_8859_1)
      .toLowerCase(java.util.Locale.ROOT)
    var idx = head.indexOf("charset=")
    var vs = if (idx >= 0) idx + 8 else {
      val e = head.indexOf("encoding=")
      if (e >= 0) e + 9 else -1
    }
    if (vs < 0) return null
    if (vs < head.length && (head.charAt(vs) == '"' || head.charAt(vs) == '\'')) vs += 1
    var ve = vs
    while (ve < head.length && {
        val c = head.charAt(ve)
        c.isLetterOrDigit || c == '-' || c == '_'
      }) ve += 1
    val label = head.substring(vs, ve)
    if (label.isEmpty) null else label
  }

  /** Bytes → text under the sniffed (or defaulted) charset, BOM stripped,
    * malformed input replaced — never null for non-null input.
    */
  def decode(bytes: Array[Byte]): UTF8String = {
    if (bytes == null) return null
    val label = sniffLabel(bytes)
    val (cs, skip) =
      if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb &&
        (bytes(2) & 0xff) == 0xbf)
        (java.nio.charset.StandardCharsets.UTF_8, 3)
      else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
        (java.nio.charset.StandardCharsets.UTF_16LE, 2)
      else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
        (java.nio.charset.StandardCharsets.UTF_16BE, 2)
      else (charsetFor(label), 0)
    // String(byte[],Charset) substitutes malformed/unmappable input, never throws
    UTF8String.fromString(new String(bytes, skip, bytes.length - skip, cs))
  }

  private def charsetFor(label: String): java.nio.charset.Charset = {
    import java.nio.charset.StandardCharsets._
    label match {
      case null | "utf-8" | "utf8" => UTF_8
      case "utf-16le" | "utf-16" => UTF_16LE
      case "utf-16be" => UTF_16BE
      case "iso-8859-1" | "latin-1" | "latin1" | "iso8859-1" => ISO_8859_1
      case "windows-1252" | "cp1252" =>
        try java.nio.charset.Charset.forName("windows-1252")
        catch { case _: Exception => ISO_8859_1 }
      case "us-ascii" | "ascii" => US_ASCII
      case _ => UTF_8 // unknown declaration: the web's default
    }
  }
}

/** binary → declared/BOM charset label or NULL (codegen-enabled). */
case class SniffCharset(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_sniff_charset requires binary input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharsetSupport.sniff(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("graftSniffed")
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"""
        UTF8String $tmp = graft.functions.CharsetSupport.sniff($c);
        if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): SniffCharset =
    copy(child = newChild)
}

/** binary → decoded text under the sniffed/defaulted charset
  * (codegen-enabled); never null for non-null input.
  */
case class DecodeSniffed(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_decode_sniffed requires binary input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharsetSupport.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharsetSupport.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): DecodeSniffed =
    copy(child = newChild)
}

object CharsetExprs {
  def sniffCharset(bytes: Column): Column =
    ColumnShim.column(SniffCharset(ColumnShim.expression(bytes)))
  def decodeSniffed(bytes: Column): Column =
    ColumnShim.column(DecodeSniffed(ColumnShim.expression(bytes)))
}
