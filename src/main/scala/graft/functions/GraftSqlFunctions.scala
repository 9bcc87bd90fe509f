package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the native codegen expressions: the same operators the
  * DataFrame API exposes through [[HashExprs]], callable from plain
  * `spark.sql` (notebooks, the thrift server, BI tools) as `graft_*`
  * functions. Registration is per-session and idempotent; for a cluster-wide
  * install set `spark.sql.extensions=graft.functions.GraftExtensions` and
  * every session the driver builds gets them at construction time.
  *
  * Hyper-parameters (shingle k, signature width, window) must be integer
  * LITERALS — they parameterize code generation, so a per-row value cannot
  * work; the error says so at analysis time rather than at execution.
  */
object GraftSqlFunctions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal (it parameterizes codegen), got $other")
  }

  /** (name, arity description, builder). */
  val functions: Seq[(String, String, PartialFunction[Seq[Expression], Expression])] = Seq(
    ("graft_simhash32", "(text)", {
      case Seq(t) => SimHash32Expr(t)
    }),
    ("graft_simhash64", "(text)", {
      case Seq(t) => SimHash64Expr(t)
    }),
    ("graft_minhash", "(text, shingleK, numHashes)", {
      case Seq(t, k, n) =>
        val width = intLit(n, "graft_minhash", "numHashes")
        val (a, b) = HashExprs.seeds(width)
        MinHashSignature(t, intLit(k, "graft_minhash", "shingleK"), a, b)
    }),
    ("graft_word_ngrams", "(text, n)", {
      case Seq(t, n) => WordNGrams(t, intLit(n, "graft_word_ngrams", "n"))
    }),
    ("graft_winnow", "(text, shingleK, window)", {
      case Seq(t, k, w) =>
        WinnowingFingerprints(t, intLit(k, "graft_winnow", "shingleK"), intLit(w, "graft_winnow", "window"))
    }),
    ("graft_array_dot", "(arrayA, arrayB)", {
      case Seq(a, b) => ArrayDot(a, b)
    }),
    ("graft_sorted_intersect_size", "(sortedArrayA, sortedArrayB)", {
      case Seq(a, b) => SortedIntersectSize(a, b)
    }),
    ("graft_rep_stats", "(text)", {
      case Seq(t) => RepStats(t)
    })
  )

  private def info(name: String, arity: String): ExpressionInfo =
    new ExpressionInfo(
      HashExprs.getClass.getName,
      null,
      name,
      s"$name$arity - graft native codegen expression",
      "")

  private def safeBuilder(
      name: String,
      arity: String,
      b: PartialFunction[Seq[Expression], Expression]
  ): Seq[Expression] => Expression =
    args =>
      if (b.isDefinedAt(args)) b(args)
      else throw new IllegalArgumentException(s"$name expects arguments $arity, got ${args.size}")

  /** Register every graft_* function into an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, arity, b) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        info(name, arity),
        safeBuilder(name, arity, b)
      )
    }

  /** Apply to a [[SparkSessionExtensions]] (the plug-in path). */
  def inject(extensions: SparkSessionExtensions): Unit =
    functions.foreach { case (name, arity, b) =>
      extensions.injectFunction((FunctionIdentifier(name), info(name, arity), safeBuilder(name, arity, b)))
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — the graft_*
  * SQL functions plus the analyzer rule resolving the catalog's derived
  * SCD views (`<table>__current` / `<table>__versions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    GraftSqlFunctions.inject(extensions)
    extensions.injectResolutionRule(s => graft.lake.ResolveScdViews(s))
  }
}
