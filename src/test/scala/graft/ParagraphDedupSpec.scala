package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** [[Dedup.paragraphDedup]] — the RefinedWeb/Dolma paragraph rule: only the
  * globally-first occurrence (by (id, pos)) of each distinct paragraph
  * survives; survivors are re-joined in original order.
  */
class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], sep: String = "\n\n") =
    Dedup
      .paragraphDedup(rows.toDF("id", "t"), "id", "t", sep)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("first occurrence survives; later cross-doc and within-doc copies are cut") {
    val out = run(Seq(
      0L -> "alpha\n\nfooter",
      1L -> "beta\n\nfooter\n\nbeta",
      2L -> "footer\n\ngamma"))
    assert(out(0) == ((0L, 2L, 2L, "alpha\n\nfooter")))
    // doc 1: "beta" kept once (pos 0), its pos-2 copy and the seen footer cut
    assert(out(1) == ((1L, 3L, 1L, "beta")))
    assert(out(2) == ((2L, 2L, 1L, "gamma")))
  }

  test("a doc that is entirely earlier paragraphs keeps nothing: '' and n_kept 0") {
    val out = run(Seq(0L -> "x\n\ny", 1L -> "y\n\nx"))
    assert(out(1) == ((1L, 2L, 0L, "")))
  }

  test("empty paragraphs (leading/trailing/double separators) dedup like any other") {
    // doc 0: ["a", ""] (trailing sep) — first "" occurrence survives;
    // doc 1: ["", "b"] — its leading "" is a duplicate of doc 0's.
    val out = run(Seq(0L -> "a\n\n", 1L -> "\n\nb"))
    assert(out(0) == ((0L, 2L, 2L, "a\n\n")))
    assert(out(1) == ((1L, 2L, 1L, "b")))
  }

  test("separator is literal, not regex (metachars safe)") {
    val out = run(Seq(0L -> "a||b||a", 1L -> "b||c"), sep = "||")
    assert(out(0) == ((0L, 3L, 2L, "a||b")))
    assert(out(1) == ((1L, 2L, 1L, "c")))
  }

  test("tie-break within one doc is by position") {
    val out = run(Seq(5L -> "p\n\np\n\np"))
    assert(out(0) == ((5L, 3L, 1L, "p")))
  }

  test("plan: first-occurrence verdict is a map-side-combinable aggregate, not a window") {
    val df = Seq(0L -> "a\n\nb", 1L -> "b\n\nc").toDF("id", "t")
    val plan = Dedup.paragraphDedup(df, "id", "t").queryExecution.executedPlan.toString
    // a row_number window would ship EVERY occurrence of a hot paragraph
    // to one task; the min-aggregate form collapses them per map task
    assert(!plan.contains("Window"), s"window found in:\n$plan")
    assert(plan.contains("partial_min"), s"no partial (map-side) min in:\n$plan")
  }

  test("a planted hot paragraph (every doc shares it) dedups identically") {
    // the skew shape the plan exists for: one boilerplate paragraph in all
    // docs; only doc 0's copy survives, every doc keeps its unique body
    val rows = (0L until 200L).map(i => i -> s"unique body $i\n\nhome | about | contact")
    val out = run(rows)
    assert(out(0) == ((0L, 2L, 2L, "unique body 0\n\nhome | about | contact")))
    (1 until 200).foreach { i =>
      assert(out(i) == ((i.toLong, 2L, 1L, s"unique body $i")))
    }
  }

  test("output-column clobber guard fires") {
    val df = Seq((1L, "a", 9L)).toDF("id", "t", "n_kept")
    val e = intercept[IllegalArgumentException] {
      Dedup.paragraphDedup(df, "id", "t")
    }
    assert(e.getMessage.contains("n_paras/n_kept/kept_text"))
  }

  test("empty separator is rejected") {
    val df = Seq((1L, "a")).toDF("id", "t")
    intercept[IllegalArgumentException] { Dedup.paragraphDedup(df, "id", "t", "") }
  }
}
