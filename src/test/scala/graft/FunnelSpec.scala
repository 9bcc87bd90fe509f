package graft

import graft.operators.{Funnel, Profile}
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) = rows.toSeq.toDF("user_id", "event_type", "us")

  test("ordering matters: a purchase before signup does not convert") {
    val events = ev(
      (1L, "signup", 10L), (1L, "view", 20L), (1L, "purchase", 30L), // full funnel
      (2L, "purchase", 5L), (2L, "signup", 10L), (2L, "view", 20L),  // purchase too early -> stage 2
      (3L, "signup", 10L),                                           // stage 1
      (4L, "view", 10L), (4L, "purchase", 20L)                       // no signup -> excluded
    )
    val got = Funnel.stages(events, "user_id", "event_type", "us", Seq("signup", "view", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(3 -> 1L, 2 -> 1L, 1 -> 1L))
  }

  test("same-timestamp step counts as reached (at-or-after)") {
    val events = ev((1L, "signup", 10L), (1L, "view", 10L), (1L, "purchase", 10L))
    val got = Funnel.stages(events, "user_id", "event_type", "us", Seq("signup", "view", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(3 -> 1L))
  }

  test("chain picks the earliest valid step, not any step") {
    // view at 5 (too early) and 50; purchase at 40 — purchase must compare
    // against view@50? No: earliest valid view is 50, purchase@40 < 50 -> stage 2.
    val events = ev((1L, "signup", 10L), (1L, "view", 5L), (1L, "view", 50L), (1L, "purchase", 40L))
    val got = Funnel.stages(events, "user_id", "event_type", "us", Seq("signup", "view", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(2 -> 1L))
  }

  test("maxGap converts when ANY chain exists, not only the greedy-earliest one") {
    // A@0, B@1, B@9, C@15 with gap 10: greedy takes B@1 and strands C
    // (window [1,11] empty) — but A@0 -> B@9 -> C@15 is a valid chain, so
    // the user HAS converted. The achievable-set fold finds it.
    val events = ev(
      (1L, "signup", 0L), (1L, "view", 1L), (1L, "view", 9L), (1L, "purchase", 15L))
    val got = Funnel.stages(events, "user_id", "event_type", "us",
        Seq("signup", "view", "purchase"), maxGap = Some(10L))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(3 -> 1L), s"the non-greedy chain must convert: $got")
    // and the gap still BINDS: no view within 10 of any signup -> stage 1
    val stranded = ev((2L, "signup", 0L), (2L, "view", 11L), (2L, "purchase", 12L))
    val got2 = Funnel.stages(stranded, "user_id", "event_type", "us",
        Seq("signup", "view", "purchase"), maxGap = Some(10L))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got2 == Map(1 -> 1L), s"out-of-window steps must not convert: $got2")
  }

  test("Profile.numeric on castable-to-double strings: numeric extremes, not lexicographic") {
    val df = Seq(("9", "1"), ("10", "1.0")).toDF("a", "b")
    val rows = Profile.numeric(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5), r.getLong(3))).toMap
    val (mnA, mxA, _) = rows("a")
    assert(mnA == 9.0 && mxA == 10.0, s"lexicographic extremes leaked: $rows")
    val (_, _, ndB) = rows("b")
    assert(ndB == 1L, "\"1\" and \"1.0\" are one double value")
  }

  test("corpusCard: a null-text doc is not an exact duplicate of nothing") {
    val docs = Seq(
      (1L, "real text here", "s1"),
      (2L, null.asInstanceOf[String], "s1"),
      (3L, null.asInstanceOf[String], "s1")
    ).toDF("doc_id", "text", "source")
    val card = Profile.corpusCard(docs, "text", "source").collect().head
    val dups = card.getLong(card.fieldIndex("n_exact_dup_docs"))
    assert(dups == 0L, s"null-text docs counted as duplicates: $dups")
  }

  test("profile reports nulls, distincts and ranges per column") {
    val df = Seq(
      (Some(1L), Some(1.0)), (Some(2L), None), (Some(2L), Some(3.5)), (None, Some(3.5))
    ).toDF("a", "b")
    val p = Profile.numeric(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(p("a") == ((4L, 3L, 2L, 1.0, 2.0)))
    assert(p("b") == ((4L, 3L, 2L, 1.0, 3.5)))
  }

  test("approx profile mode: no Expand amplification, estimates within 3·rsd of exact") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val cols = Seq("l_partkey", "l_suppkey", "l_quantity")
    val exact = Profile.numeric(li, cols, exact = true)
    val approx = Profile.numeric(li, cols, exact = false)
    // the scale motivation: exact multi-column count-distinct plans through
    // Expand (k× pre-agg row amplification); the approx mode must not
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
    val e = exact.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    approx.collect().foreach { r =>
      val (name, est) = (r.getString(0), r.getLong(3))
      val ex = e(name)
      assert(math.abs(est - ex) <= ex * 0.06, s"$name: approx $est vs exact $ex")
    }
  }
}
