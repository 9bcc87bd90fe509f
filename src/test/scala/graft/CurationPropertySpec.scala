package graft

import graft.operators.{Sampling, Similarity, TextAnalysis}
import graft.functions.{BloomSupport, HashSupport}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants for the round-7 curation operators over
  * generated inputs (the ScdPropertySpec pattern: deterministic seeded
  * generators, whole-input laws, a differential reference model where one
  * is expressible in plain Scala).
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def gen[A](g: Gen[A], seed: Long, fallback: A): A =
    g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(fallback)

  private def md5_60(s: String): Long =
    (BigInt(HashSupport.md5Hex(s).substring(0, 15), 16) % BigInt(Long.MaxValue)).toLong

  test("leakageFreeSplit: across generated dup patterns no group ever straddles a split") {
    Seq(3L, 17L, 271L).foreach { seed =>
      val rows = gen(
        for {
          nGroups <- Gen.choose(20, 120)
          mult <- Gen.listOfN(nGroups, Gen.choose(1, 6))
        } yield mult.zipWithIndex.flatMap { case (m, g) =>
          (0 until m).map(c => (g.toLong * 1000 + c, s"content-$g"))
        },
        seed,
        Seq((1L, "x"))
      )
      val out = Sampling
        .leakageFreeSplit(rows.toDF("id", "body"), "id", md5($"body"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10), 100)
        .select($"body", $"rep", $"split", $"id")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      out.groupBy(_._1).foreach { case (body, members) =>
        assert(members.map(_._3).distinct.length == 1, s"group $body straddles splits (seed $seed)")
        assert(members.forall(_._2 == members.map(_._4).min), s"rep not group-min for $body")
      }
    }
  }

  test("tokenBudgetMixture: boundary law holds for generated budgets and token counts") {
    Seq(5L, 23L).foreach { seed =>
      val (rows, budgets) = gen(
        for {
          n <- Gen.choose(100, 400)
          toks <- Gen.listOfN(n, Gen.choose(1L, 40L))
          b0 <- Gen.choose(50L, 800L)
          b1 <- Gen.choose(50L, 800L)
        } yield (
          toks.zipWithIndex.map { case (t, i) => (i.toLong, s"g${i % 3}", t) },
          Map("g0" -> b0, "g1" -> b1)
        ),
        seed,
        (Seq((1L, "g0", 5L)), Map("g0" -> 100L))
      )
      val maxTok = rows.map(_._3).max
      val kept = Sampling
        .tokenBudgetMixture(rows.toDF("id", "grp", "tok"), $"grp", $"id", $"tok", budgets, numShards = 8)
        .select($"grp", $"tok").collect().map(r => (r.getString(0), r.getLong(1)))
      budgets.foreach { case (g, b) =>
        val total = kept.filter(_._1 == g).map(_._2).sum
        val available = rows.filter(_._2 == g).map(_._3).sum
        if (available >= b)
          assert(total >= b && total < b + maxTok, s"group $g kept $total for budget $b (seed $seed)")
        else
          assert(total == available, s"group $g must keep everything when under budget")
      }
      assert(kept.forall(_._1 != "g2"), "unbudgeted group leaked through")
    }
  }

  test("tokenBudgetMixtureWithRepeats: exact epoch/remainder laws on generated corpora") {
    Seq(7L, 41L).foreach { seed =>
      val (rows, budgets) = gen(
        for {
          n <- Gen.choose(60, 200)
          toks <- Gen.listOfN(n, Gen.choose(1L, 30L))
          b0 <- Gen.choose(200L, 6000L) // spans under- and over-budget regimes
          b1 <- Gen.choose(50L, 800L)
        } yield (
          toks.zipWithIndex.map { case (t, i) => (i.toLong, s"g${i % 3}", t) },
          Map("g0" -> b0, "g1" -> b1)
        ),
        seed,
        (Seq((1L, "g0", 5L)), Map("g0" -> 100L))
      )
      val maxTok = rows.map(_._3).max
      val kept = Sampling
        .tokenBudgetMixtureWithRepeats(
          rows.toDF("id", "grp", "tok"), $"grp", $"id", $"tok", budgets, numShards = 8)
        .select($"grp", $"tok", $"epoch", $"id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      budgets.foreach { case (g, b) =>
        val mine = kept.filter(_._1 == g)
        val groupRows = rows.filter(_._2 == g)
        val total = groupRows.map(_._3).sum
        val epochs = if (total > 0) b / total else 0L
        // every full epoch contains EVERY doc exactly once
        (0L until epochs).foreach { e =>
          assert(mine.count(_._3 == e) == groupRows.size,
            s"group $g epoch $e incomplete (seed $seed)")
        }
        // no row beyond the remainder epoch
        assert(mine.forall(_._3 <= epochs), s"group $g emitted past the remainder (seed $seed)")
        // total upsampled tokens land in [budget, budget + maxDoc) — or
        // everything once if the remainder selection kept all (can't happen:
        // remainder < total by definition when total > 0)
        val keptTok = mine.map(_._2).sum
        if (total > 0)
          assert(keptTok >= b && keptTok < b + maxTok,
            s"group $g kept $keptTok tokens for budget $b (seed $seed)")
      }
      assert(kept.forall(_._1 != "g2"), "unbudgeted group leaked through")
    }
  }

  test("temperatureBudgets: replaying the exact integer derivation matches, budgets sum within target") {
    Seq(11L, 59L).foreach { seed =>
      val totals = gen(
        for {
          n <- Gen.choose(2, 12)
          ts <- Gen.listOfN(n, Gen.choose(0L, 2000000L))
        } yield ts.zipWithIndex.map { case (t, i) => (s"s$i", t) },
        seed,
        Seq(("s0", 100L))
      )
      val rows = totals.map { case (g, t) => (g, t) }
      val b = Sampling.temperatureBudgets(
        rows.toDF("grp", "tok"), $"grp", $"tok", totalTokens = 1000000L)
      // independent replay of the documented derivation
      val w = totals.map { case (g, t) =>
        g -> math.floor(math.sqrt(t.toDouble) * (1L << 26)).toLong
      }.toMap
      val sw = w.values.foldLeft(BigInt(0))(_ + _)
      totals.foreach { case (g, _) =>
        val expect = if (sw == 0) 0L else (BigInt(1000000L) * w(g) / sw).toLong
        assert(b(g) == expect, s"group $g budget ${b(g)} != derived $expect (seed $seed)")
      }
      assert(b.values.sum <= 1000000L, s"floor split exceeded the target (seed $seed)")
    }
  }

  test("fimTransform: pieces reassemble on generated texts; c4LineFilter matches a Scala model") {
    import graft.operators.TextAnalysis
    Seq(13L, 97L).foreach { seed =>
      val texts = gen(
        Gen.listOfN(40, for {
          words <- Gen.choose(0, 30)
          ws <- Gen.listOfN(words, Gen.alphaLowerStr.map(_.take(6)))
          lines <- Gen.choose(0, 3)
        } yield {
          val body = ws.filter(_.nonEmpty).mkString(" ")
          if (lines == 0 || body.isEmpty) body
          else body.split(" ").grouped(math.max(1, body.split(" ").length / (lines + 1)))
            .map(_.mkString(" ")).mkString("\n")
        }),
        seed,
        List("fallback text")
      ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = texts.toDF("id", "body")
      // FIM: every transformed row reassembles to the original
      val fim = TextAnalysis.fimTransform(df, "id", "body", 1, 2, minChars = 5)
        .select($"id", $"body", $"fim", $"fim_text").collect()
      val m = "(?s)^<PRE>(.*)<SUF>(.*)<MID>(.*)$".r
      fim.foreach { r =>
        val (body, isFim, ft) = (r.getString(1), r.getBoolean(2), r.getString(3))
        if (!isFim) assert(ft == body)
        else ft match {
          case m(p, s2, mid) => assert(p + mid + s2 == body, s"id ${r.getLong(0)} (seed $seed)")
          case _ => fail(s"bad PSM layout for id ${r.getLong(0)}")
        }
      }
      // C4 line filter: differential vs a plain-Scala model of the stated rules
      val bad = Seq("qa", "zz")
      val got = TextAnalysis.c4LineFilter(df, "body", minWordsPerLine = 2, badPhrases = bad)
        .select($"id", $"n_lines", $"n_kept_lines", $"kept_text").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
      texts.foreach { case (id, body) =>
        val lines = body.split("\n", -1)
        val kept = lines.filter { l =>
          l.trim.split("\\s+").count(_.nonEmpty) >= 2 &&
            bad.forall(p => !l.toLowerCase.contains(p))
        }
        assert(got(id) == ((lines.length, kept.length, kept.mkString("\n"))),
          s"id $id diverged from the reference model (seed $seed)")
      }
    }
  }

  test("codeHygiene: line stats, license chain order, generated and minified flags") {
    val minified = "x".repeat(600) // one long line, no whitespace
    val apache = "// Licensed under the Apache License, Version 2.0\ncode here\nmore code"
    // apache listed before gpl in the chain: a file naming both tags apache
    val both = "// Apache License\n// GNU General Public License v3\nbody"
    val gen = "//\tCode generated by tool. DO NOT EDIT.\nshort\nlines"
    val plain = "hello world\nfoo bar baz"
    val rows = Seq(
      (1L, minified), (2L, apache), (3L, both), (4L, gen), (5L, plain), (6L, "")
    ).toDF("id", "t")
      .select($"id", TextAnalysis.codeHygiene($"t").as("h"))
      .select($"id", $"h.*")
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    val m = rows(1L)
    assert(m.getLong(1) == 1L && m.getLong(2) == 600L && m.getBoolean(7)) // minified
    assert(m.getLong(4) == 0L) // ws_permille 0: minifiers strip whitespace
    val a = rows(2L)
    assert(a.getString(5) == "apache" && !a.getBoolean(7))
    assert(a.getLong(1) == 3L && a.getLong(2) == 49L)
    assert(rows(3L).getString(5) == "apache") // first match in fixed order wins
    val g = rows(4L)
    assert(g.getBoolean(6) && g.getString(5) == null)
    val p = rows(5L)
    assert(!p.getBoolean(6) && !p.getBoolean(7) && p.getString(5) == null)
    // avg_line_len of plain: (23 - 1) DIV 2 = 11
    assert(p.getLong(3) == 11L)
    val e = rows(6L) // empty text: one empty line, all-zero stats, no flags
    assert(e.getLong(1) == 1L && e.getLong(2) == 0L && e.getLong(4) == 0L)
  }

  test("rrfFuse: input-list order never changes the fusion; scores match the formula") {
    Seq(11L, 47L).foreach { seed =>
      val lists = gen(
        for {
          nLists <- Gen.choose(2, 4)
          ks <- Gen.listOfN(nLists, Gen.choose(3, 12))
          ids <- Gen.sequence[Seq[Seq[Long]], Seq[Long]](
            ks.map(k => Gen.pick(k, 1L to 40L).map(_.toSeq)))
        } yield ids.map(_.zipWithIndex.map { case (id, i) => (id, i + 1) }),
        seed,
        Seq(Seq((1L, 1), (2L, 2)))
      )
      val dfs = lists.map(l => l.toDF("doc_id", "rank"))
      val fused = Similarity.rrfFuse(dfs, "doc_id", k = 50)
        .select($"doc_id", $"rrf_score").as[(Long, Long)].collect().toMap
      val reversed = Similarity.rrfFuse(dfs.reverse, "doc_id", k = 50)
        .select($"doc_id", $"rrf_score").as[(Long, Long)].collect().toMap
      assert(fused == reversed, s"retriever order changed the fusion (seed $seed)")
      val expected = lists.flatten
        .groupBy(_._1).view
        .mapValues(_.map { case (_, r) => 1000L / (60L + r) }.sum)
        .toMap
      assert(fused == expected.filter { case (_, s) => s > 0 } || fused == expected,
        s"fused scores diverge from the formula (seed $seed): $fused vs $expected")
    }
  }

  test("hashedLinearScore: differential vs a plain-Scala reference model on generated texts") {
    val numBuckets = 97
    val weights = Array.tabulate(numBuckets)(b => (md5_60(s"pw:$b") % 501) - 250)
    def reference(text: String): Long = {
      val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
      def grams(n: Int): Seq[String] = {
        val m = math.max(toks.length - n + 1, 1)
        (0 until m).map(i => toks.slice(i, math.min(i + n, toks.length)).mkString(" "))
      }
      (grams(1) ++ grams(2)).map { f =>
        weights((md5_60(f) % numBuckets).toInt)
      }.sum
    }
    Seq(2L, 31L, 404L).foreach { seed =>
      val texts = gen(
        Gen.listOfN(
          40,
          Gen.listOf(Gen.oneOf("Alpha", "beta", "GAMMA", "d", "ee", "", "zz9")).map(_.mkString(" "))
        ),
        seed,
        List("alpha beta")
      )
      val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
        .select($"id", TextAnalysis.hashedLinearScore($"t", weights).as("s"))
        .as[(Long, Long)].collect().toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == reference(t),
          s"score mismatch on ${t.take(40).mkString}... (seed $seed): ${got(i.toLong)} vs ${reference(t)}")
      }
    }
  }

  test("semanticDedup: differential vs a plain-Scala reference model on generated vectors") {
    import graft.operators.Dedup
    def refModel(
        vecs: Seq[(Long, Array[Double])],
        cents: Array[Array[Double]],
        tau: Double
    ): Map[Long, (Int, Boolean)] = {
      def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
      def assign(v: Array[Double]): Int =
        cents.zipWithIndex
          .map { case (c, i) => (dot(c, c) - 2.0 * dot(v, c), i) }
          .minBy { case (d, i) => (d, i) } // argmin distance, centroid-id tiebreak
          ._2
      val assigned = vecs.map { case (id, v) => (id, v, assign(v)) }
      assigned.map { case (id, v, cl) =>
        val dropped = assigned.exists { case (id2, v2, cl2) =>
          cl2 == cl && id2 < id && {
            val c = dot(v, v2) / (math.sqrt(dot(v, v)) * math.sqrt(dot(v2, v2)))
            !c.isNaN && c >= tau
          }
        }
        id -> ((cl, !dropped))
      }.toMap
    }
    Seq(19L, 83L, 911L).foreach { seed =>
      val (vecs, cents) = gen(
        for {
          n <- Gen.choose(10, 60)
          dims = 4
          vs <- Gen.listOfN(n, Gen.listOfN(dims, Gen.choose(-3, 3).map(_.toDouble)))
          nc <- Gen.choose(2, 5)
          cs <- Gen.listOfN(nc, Gen.listOfN(dims, Gen.choose(-3, 3).map(_.toDouble)))
        } yield (
          vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) },
          cs.map(_.toArray).toArray
        ),
        seed,
        (Seq((1L, Array(1.0, 0.0, 0.0, 0.0))), Array(Array(1.0, 0.0, 0.0, 0.0)))
      )
      val expected = refModel(vecs, cents, 0.9)
      val got = Dedup
        .semanticDedup(
          vecs.map { case (id, v) => (id, v.toSeq) }.toDF("id", "emb"),
          "id", "emb", cents, threshold = 0.9)
        .as[(Long, Int, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected, s"seed $seed: diverged at ${got.toSet.diff(expected.toSet)}")
    }
  }

  test("bloom: no false negatives over generated key sets; OR-merge equals sequential build") {
    Seq(13L, 77L).foreach { seed =>
      val keys = gen(Gen.listOfN(300, Gen.choose(Long.MinValue, Long.MaxValue)), seed, List(1L, 2L))
      val whole = BloomSupport.emptyBuffer(1 << 10, 6)
      keys.foreach(BloomSupport.add(whole, _))
      assert(keys.forall(BloomSupport.mightContain(whole, _)), s"false negative (seed $seed)")
      val (l, r) = keys.splitAt(keys.size / 2)
      val a = BloomSupport.emptyBuffer(1 << 10, 6)
      val b = BloomSupport.emptyBuffer(1 << 10, 6)
      l.foreach(BloomSupport.add(a, _)); r.foreach(BloomSupport.add(b, _))
      assert(java.util.Arrays.equals(BloomSupport.or(a, b), whole),
        s"partitioned OR-merge diverged from the sequential build (seed $seed)")
    }
  }

  test("repeatedSpans: differential vs a brute-force coverage model on generated corpora") {
    // plain-Scala reference: a position p of doc d is covered iff the
    // L-gram at p occurs in >= 2 distinct docs; spans are the maximal
    // contiguous covered char runs. Generated docs share planted runs at
    // random offsets, so accidental overlaps are exercised too.
    val L = 12
    Seq(5L, 89L, 1331L).foreach { seed =>
      val shared = gen(Gen.listOfN(3, Gen.listOfN(20, Gen.alphaLowerChar).map(_.mkString)),
        seed, List("aaaaaaaaaaaaaaaaaaaa", "bbbbbbbbbbbbbbbbbbbb", "cccccccccccccccccccc"))
      val docs = (0 until 12).map { i =>
        val base = gen(Gen.listOfN(40, Gen.alphaLowerChar).map(_.mkString), seed * 100 + i, "z" * 40)
        val planted = if (i % 3 != 2) shared(i % 3) else ""
        val cut = gen(Gen.choose(0, base.length), seed * 200 + i, 20)
        (i.toLong, base.substring(0, cut) + planted + base.substring(cut))
      }
      // reference model over the NORMALIZED texts (all-lowercase already)
      val texts = docs.map { case (id, t) => id -> t }.toMap
      def gramsOf(t: String): Seq[(Int, String)] =
        if (t.length < L) Nil else (0 to t.length - L).map(p => (p + 1, t.substring(p, p + L)))
      val gramDocs = texts.toSeq
        .flatMap { case (id, t) => gramsOf(t).map { case (_, g) => (g, id) } }
        .distinct.groupBy(_._1).view.mapValues(_.size).toMap
      val expected = texts.toSeq.flatMap { case (id, t) =>
        val covered = Array.fill(t.length + 2)(false) // 1-based chars
        gramsOf(t).foreach { case (p, g) =>
          if (gramDocs(g) >= 2) (p until p + L).foreach(covered(_) = true)
        }
        // maximal runs of covered chars
        val runs = scala.collection.mutable.ArrayBuffer[(Long, Int, Int)]()
        var s = -1
        for (p <- 1 to t.length + 1) {
          if (p <= t.length && covered(p)) { if (s < 0) s = p }
          else if (s >= 0) { runs += ((id, s, p - 1)); s = -1 }
        }
        runs
      }.sorted
      val got = graft.operators.Dedup
        .repeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", minLen = L)
        .select($"doc_id", $"span_start", $"span_end")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq.sorted
      assert(got == expected, s"span coverage diverged from the brute-force model (seed $seed)")
    }
  }
}
