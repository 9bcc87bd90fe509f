package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix-list registered-domain derivation — the data-file form of
  * [[graft.operators.UrlOps.registeredDomain]]'s compact heuristic: the
  * caller supplies the suffix rules (e.g. the Mozilla PSL, or a curated
  * subset) and the expression applies the published PSL algorithm:
  *
  *   1. the LONGEST rule matching a label-suffix of the host prevails
  *      (including the whole host itself);
  *   2. the registered domain is that suffix plus one more label — NULL
  *      when the host IS a public suffix (nothing registrable);
  *   3. when NO rule matches, the prevailing rule is "*" (any TLD is a
  *      public suffix): last two labels, NULL for single-label hosts.
  *
  * Plain rules only — wildcard (`*.ck`) and exception (`!www.ck`) rules
  * are a fraction of the real list and out of scope here; the loader
  * rejects them loudly rather than silently misparsing.
  *
  * The rule set rides the expression as a reference object (the
  * [[BpeSupport.Ranks]] pattern — one HashSet per codegen instance,
  * shipped with the serialized plan to every executor), so each row pays
  * O(labels) hash lookups however large the list is — a 9,000-rule PSL
  * would be hopeless as a regex alternation but is a constant here.
  */
object PslSupport {

  /** Compiled suffix rules: membership set + the deepest rule's label
    * count (bounds the suffix walk).
    */
  final class SuffixSet(val rules: Array[String]) extends Serializable {
    @transient lazy val set: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](rules.length * 2)
      rules.foreach(r => s.add(r))
      s
    }
    @transient lazy val maxLabels: Int =
      if (rules.isEmpty) 0 else rules.map(r => r.count(_ == '.') + 1).max
  }

  def compile(rules: Seq[String]): SuffixSet = {
    rules.foreach { r =>
      require(r.nonEmpty && !r.contains("*") && !r.contains("!"),
        s"suffix rule '$r' is empty or a wildcard/exception rule (unsupported — " +
          "supply plain rules only)")
      require(r == r.toLowerCase(java.util.Locale.ROOT) && !r.exists(_.isWhitespace),
        s"suffix rule '$r' must be lowercase with no whitespace")
    }
    new SuffixSet(rules.toArray)
  }

  /** Parse PSL file content: one rule per line, `//` comments and blanks
    * skipped, ICANN/PRIVATE section markers tolerated (they are comments).
    */
  def parseSuffixList(content: String): Seq[String] =
    content.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .toSeq

  /** The PSL algorithm over a HOST (not a URL). NULL result = no
    * registrable domain (host is itself a public suffix, or single-label
    * with no matching rule).
    */
  def registered(host: UTF8String, sfx: SuffixSet): UTF8String = {
    val h = host.toString
    if (h.isEmpty) return null
    val labels = h.split("\\.", -1)
    val n = labels.length
    // longest matching rule first, whole host included
    var i = math.min(sfx.maxLabels, n)
    while (i >= 1) {
      val suffix = labels.slice(n - i, n).mkString(".")
      if (sfx.set.contains(suffix)) {
        if (i == n) return null // the host IS a public suffix
        return UTF8String.fromString(labels.slice(n - i - 1, n).mkString("."))
      }
      i -= 1
    }
    // default "*" rule: last label is a public suffix
    if (n >= 2) UTF8String.fromString(labels.slice(n - 2, n).mkString("."))
    else null
  }
}

/** Registered domain of a HOST column under a compiled PSL rule set. */
case class RegisteredDomainPsl(child: Expression, suffixes: PslSupport.SuffixSet)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // NULL for public-suffix/bare hosts
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_psl_domain requires a string host, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PslSupport.registered(input.asInstanceOf[UTF8String], suffixes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sfxRef =
      ctx.addReferenceObj("pslSuffixes", suffixes, classOf[PslSupport.SuffixSet].getName)
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"""
        ${ev.value} = graft.functions.PslSupport.registered($c, $sfxRef);
        ${ev.isNull} = (${ev.value} == null);
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): RegisteredDomainPsl =
    copy(child = newChild)
}

object UrlExprs {
  /** PSL registered domain of a host column under `rules`. */
  def pslDomain(host: Column, rules: Seq[String]): Column =
    ColumnShim.column(
      RegisteredDomainPsl(ColumnShim.expression(host), PslSupport.compile(rules)))
}
