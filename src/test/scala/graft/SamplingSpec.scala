package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 2000L).map(i => (i, s"doc$i", (i % 7).toString)).toDF("id", "body", "grp")

  test("bernoulli membership is invariant to partition layout") {
    val a = Sampling.bernoulli(docs.repartition(1), $"id", 10, 100).select($"id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.bernoulli(docs.repartition(17, $"grp"), $"id", 10, 100).select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("disjoint bands partition the keyspace (no train/validation leakage)") {
    val ids = docs.select($"id")
    val train = Sampling.bernoulli(ids, $"id", 90, 100).collect().map(_.getLong(0)).toSet
    val valid = ids.filter(Sampling.hash60($"id") % 100 >= 90).collect().map(_.getLong(0)).toSet
    assert(train.intersect(valid).isEmpty)
    assert(train.size + valid.size == 2000)
  }

  test("bernoulli fraction lands near the nominal rate") {
    val n = Sampling.bernoulli(docs, $"id", 10, 100).count()
    assert(n > 120 && n < 280, s"10% of 2000 should be ~200, got $n") // md5 mixing, generous band
  }

  test("stratified returns exactly n per stratum (fewer when stratum is smaller)") {
    val out = Sampling.stratified(docs, Seq($"grp"), $"id", 25)
    val sizes = out.groupBy($"grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ == 25L) && sizes.size == 7)
    val tiny = Sampling.stratified(docs.filter($"id" <= 3), Seq($"grp"), $"id", 25)
    assert(tiny.count() == 3)
    // skew defense: the rn <= n filter must plan as WindowGroupLimit (the
    // PARTIAL limit below the exchange bounds a hot stratum by sample
    // size × map tasks, not stratum size)
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("WindowGroupLimit"),
      s"stratified should plan its rank filter as WindowGroupLimit:\n$physical")
  }

  test("stratified choice is deterministic across partitionings") {
    val a = Sampling.stratified(docs.repartition(3), Seq($"grp"), $"id", 10).select($"id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.stratified(docs.repartition(23, $"id"), Seq($"grp"), $"id", 10).select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("weighted sampling: zero weight keeps nothing, one keeps everything, rate tracks weight") {
    val w = docs.withColumn("w", ($"id" % 2).cast("double")) // half 0.0, half 1.0
    val kept = Sampling.weighted(w, $"id", $"w").collect().map(_.getLong(0)).toSet
    assert(kept.forall(_ % 2 == 1) && kept.size == 1000)
    val half = Sampling.weighted(docs.withColumn("w", lit(0.5)), $"id", $"w").count()
    assert(half > 880 && half < 1120, s"p=0.5 of 2000 should be ~1000, got $half")
  }

  test("mixture applies per-group rates and drops unlisted groups") {
    val byGrp = Sampling
      .mixture(docs, $"grp", $"id", Map("0" -> 100, "1" -> 50, "2" -> 0), denominator = 100)
      .groupBy($"grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy($"grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp("0") == full("0"))                  // 100%
    assert(byGrp.getOrElse("2", 0L) == 0L)           // explicit 0%
    assert(!byGrp.contains("3"))                     // unlisted -> dropped
    assert(byGrp("1") > full("1") / 4 && byGrp("1") < full("1") * 3 / 4) // ~50%
  }

  test("mixture membership is consistent with bernoulli on the same band") {
    // a group at rate n/d keeps exactly the rows bernoulli(n/d) keeps
    val g0 = docs.filter($"grp" === "4")
    val viaMixture = Sampling.mixture(docs, $"grp", $"id", Map("4" -> 30), 100)
      .select($"id").collect().map(_.getLong(0)).toSet
    val viaBernoulli = Sampling.bernoulli(g0, $"id", 30, 100)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(viaMixture == viaBernoulli)
  }

  test("bernoulli filter stays a scan-side map (no shuffle in the plan)") {
    val plan = Sampling.bernoulli(docs, $"id", 5, 100).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("shard covers every row with dense 1..n positions per shard") {
    val out = Sampling.shard(docs, $"id", 8).cache()
    assert(out.count() == 2000)
    val byShard = out.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"pos").as("lo"), max($"pos").as("hi"),
           countDistinct($"pos").as("nd"))
      .collect()
    assert(byShard.length == 8)
    byShard.foreach { r =>
      val (n, lo, hi, nd) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo == 1L && hi == n && nd == n, s"shard ${r.getInt(0)}: positions not dense 1..$n")
    }
    out.unpersist()
  }

  test("shard assignment and order are invariant to partition layout") {
    def runOn(d: org.apache.spark.sql.DataFrame) =
      Sampling.shard(d, $"id", 8).select($"id", $"shard", $"pos")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(runOn(docs.repartition(1)) == runOn(docs.repartition(13, $"grp")))
  }

  test("output-column collision guards: shard/packSequences/stratified/similarityOrderedPack refuse") {
    // the house rule (leakageFreeSplit, the repeats epoch guard): writing
    // over a caller's existing column is silent data loss, not a default
    val hasShard = Seq((1L, 9)).toDF("k", "shard")
    intercept[IllegalArgumentException](Sampling.shard(hasShard, $"k", 4))
    val hasPos = Seq((1L, 9L)).toDF("k", "pos")
    intercept[IllegalArgumentException](Sampling.shard(hasPos, $"k", 4))
    val hasBin = Seq((1L, 3L, 7)).toDF("k", "t", "bin")
    intercept[IllegalArgumentException](Sampling.packSequences(hasBin, $"k", $"t", 4, 64L))
    val hasRn = Seq((1L, "a", 2)).toDF("k", "s", "__rn")
    intercept[IllegalArgumentException](Sampling.stratified(hasRn, Seq($"s"), $"k", 1))
    val hasComp = Seq((1L, 3L, "x")).toDF("doc_id", "tok", "comp")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    intercept[IllegalArgumentException](
      Sampling.similarityOrderedPack(hasComp, "doc_id", $"tok", noPairs, 4, 64L))
  }

  test("packSequences: bins fill to capacity, respect document boundaries, and are deterministic") {
    val sized = docs.withColumn("ntok", ($"id" % 37 + 3).cast("long"))
    val out = Sampling.packSequences(sized, $"id", $"ntok", numShards = 4, maxTokens = 100L).cache()
    assert(out.count() == 2000)
    val perBin = out.groupBy($"shard", $"bin")
      .agg(sum($"n_tokens").as("tok"), max($"n_tokens").as("biggest"))
      .collect()
    perBin.foreach { r =>
      // a bin can only exceed capacity by the tail of its last document
      assert(r.getLong(2) < 100L + r.getLong(3),
        s"shard ${r.getInt(0)} bin ${r.getLong(1)} holds ${r.getLong(2)} tokens")
    }
    // bins are contiguous from 0 within every shard
    out.groupBy($"shard").agg(min($"bin").as("lo"), max($"bin").as("hi"), countDistinct($"bin").as("nd"))
      .collect().foreach { r =>
        assert(r.getLong(1) == 0L && r.getLong(3) == r.getLong(2) + 1, s"holes in shard ${r.getInt(0)}")
      }
    val again = Sampling.packSequences(sized.repartition(11, $"grp"), $"id", $"ntok", 4, 100L)
      .select($"id", $"shard", $"bin").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    val first = out.select($"id", $"shard", $"bin").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(first == again)
    out.unpersist()
  }

  test("leakageFreeSplit: every duplicate group moves as one unit; bands are exhaustive") {
    // 400 distinct texts, each duplicated under 5 different ids
    val dup = (1L to 2000L).map(i => (i, s"text${i % 400}")).toDF("id", "body")
    val out = Sampling
      .leakageFreeSplit(dup, "id", md5($"body"), Seq("train" -> 90, "val" -> 5, "test" -> 5), 100)
      .select($"id", $"body", $"rep", $"split")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(out.length == 2000 && out.forall(_._4 != null))
    val perText = out.groupBy(_._2)
    assert(perText.forall { case (_, rows) => rows.map(_._4).distinct.length == 1 },
      "two copies of one text landed in different splits — leakage")
    assert(perText.forall { case (_, rows) => rows.forall(_._3 == rows.map(_._1).min) },
      "representative must be the group's min id")
    val splits = out.map(_._4).distinct.toSet
    assert(splits == Set("train", "val", "test"), s"400 groups must hit all bands, got $splits")
    val trainFrac = out.count(_._4 == "train").toDouble / out.length
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction $trainFrac far from 0.9")
  }

  test("tokenBudgetMixture: two-phase prefix equals the naive window; boundary law holds") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 600L)
      .map(i => (i, s"g${i % 3}", 5L + i % 7)) // groups g0/g1/g2, token counts 5..11
      .toDF("id", "grp", "tok")
    val budgets = Map("g0" -> 200L, "g1" -> 50L)
    val kept = Sampling
      .tokenBudgetMixture(docs, $"grp", $"id", $"tok", budgets, numShards = 8)
      .select($"id", $"grp", $"tok")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // g2 absent from budgets → dropped entirely
    assert(kept.forall(_._2 != "g2"))
    // boundary law: kept tokens land in [budget, budget + maxDoc)
    val perGroup = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(perGroup("g0") >= 200L && perGroup("g0") < 200L + 11,
      s"g0 kept ${perGroup("g0")} tokens for budget 200")
    assert(perGroup("g1") >= 50L && perGroup("g1") < 50L + 11)
    // equivalence to the naive one-window-per-group formulation under the
    // same shard-major total order — the scalable algorithm changes the
    // plan, never the selection
    val h = Sampling.hash60($"id")
    val w = Window.partitionBy($"grp")
      .orderBy(pmod(h, lit(8)).asc, h.asc, $"id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs
      .withColumn("budget",
        when($"grp" === "g0", 200L).when($"grp" === "g1", 50L).otherwise(-1L))
      .filter($"budget" >= 0)
      .withColumn("cum", sum($"tok").over(w))
      .filter($"cum" - $"tok" < $"budget")
      .select($"id").as[Long].collect().toSet
    assert(kept.map(_._1).toSet == naive, "two-phase selection diverged from the naive window")
    // partition-layout invariance
    val repart = Sampling
      .tokenBudgetMixture(docs.repartition(13, $"tok"), $"grp", $"id", $"tok", budgets, numShards = 8)
      .select($"id").as[Long].collect().toSet
    assert(repart == kept.map(_._1).toSet)
  }

  test("tokenBudgetMixtureWithRepeats: full epochs + remainder; generalizes the plain mixture") {
    val docs = (1L to 600L)
      .map(i => (i, s"g${i % 3}", 5L + i % 7))
      .toDF("id", "grp", "tok")
    // natural totals: each group ~200 docs × ~8 tokens ≈ 1600
    val naturalG0 = docs.filter($"grp" === "g0").agg(sum($"tok")).head.getLong(0)
    val budgets = Map(
      "g0" -> (naturalG0 * 2 + 100L), // 2 full epochs + a remainder prefix
      "g1" -> 50L // pure down-selection
    )
    val kept = Sampling
      .tokenBudgetMixtureWithRepeats(docs, $"grp", $"id", $"tok", budgets, numShards = 8)
      .select($"id", $"grp", $"tok", $"epoch")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(kept.forall(_._2 != "g2"), "unbudgeted groups drop")
    // g0: every doc appears at epochs 0 and 1; epoch 2 is a strict prefix
    val g0 = kept.filter(_._2 == "g0")
    val g0docs = docs.filter($"grp" === "g0").count()
    assert(g0.count(_._4 == 0L) == g0docs && g0.count(_._4 == 1L) == g0docs,
      "full epochs must contain every doc exactly once")
    val e2 = g0.filter(_._4 == 2L)
    assert(e2.nonEmpty && e2.length < g0docs, "remainder epoch is a proper prefix")
    assert(g0.forall(_._4 <= 2L))
    // boundary law on the TOTAL upsampled tokens
    val g0tok = g0.map(_._3).sum
    assert(g0tok >= budgets("g0") && g0tok < budgets("g0") + 11,
      s"g0 kept $g0tok tokens for budget ${budgets("g0")}")
    // generalization law: a group under its budget reduces to the plain
    // mixture's selection at epoch 0
    val g1 = kept.filter(_._2 == "g1")
    assert(g1.forall(_._4 == 0L))
    val plainG1 = Sampling
      .tokenBudgetMixture(docs, $"grp", $"id", $"tok", Map("g1" -> 50L), numShards = 8)
      .select($"id").as[Long].collect().toSet
    assert(g1.map(_._1).toSet == plainG1, "epoch-0 selection must equal the plain mixture")
    // partition-layout invariance of the full (id, epoch) multiset
    val repart = Sampling
      .tokenBudgetMixtureWithRepeats(
        docs.repartition(13, $"tok"), $"grp", $"id", $"tok", budgets, numShards = 8)
      .select($"id", $"epoch").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(repart == kept.map(k => (k._1, k._4)).sorted.toSeq)
  }

  test("temperatureBudgets: sqrt-proportional split, exact integer arithmetic, NULL rejected") {
    val docs = Seq(
      ("big", 900L), ("big", 0L),  // total 900 -> sqrt 30
      ("small", 100L)              // total 100 -> sqrt 10
    ).toDF("grp", "tok")
    val b = Sampling.temperatureBudgets(docs, $"grp", $"tok", totalTokens = 4000L)
    // weights 30:10 -> budgets 3000/1000 exactly (sqrt of perfect squares)
    assert(b == Map("big" -> 3000L, "small" -> 1000L), s"got $b")
    // flattening law: the head group's share shrinks vs natural proportions
    assert(b("big").toDouble / 4000 < 900.0 / 1000)
    // budgets never exceed the target in total (floor division)
    assert(b.values.sum <= 4000L)
    // all-empty corpus: zero budgets, no divide-by-zero
    val z = Sampling.temperatureBudgets(
      Seq(("a", 0L)).toDF("grp", "tok"), $"grp", $"tok", 100L)
    assert(z == Map("a" -> 0L))
    // NULL group is a config error, loudly
    intercept[IllegalArgumentException] {
      Sampling.temperatureBudgets(
        Seq((null: String, 5L)).toDF("grp", "tok"), $"grp", $"tok", 100L)
    }
  }

  test("tokenBudgetMixture: NULL group + defaultBudget is kept and capped as ONE bucket") {
    // the ADVICE round-10 finding: the offsets join must be null-safe, or
    // NULL-group rows pass the budget filter but vanish at the join
    val docs = ((1L to 20L).map(i => (i, if (i % 2 == 0) "g0" else null, 10L)))
      .toDF("id", "grp", "tok")
    val kept = Sampling
      .tokenBudgetMixture(docs, $"grp", $"id", $"tok", Map("g0" -> 1000L),
        numShards = 4, defaultBudget = Some(35L))
      .select($"id", $"grp", $"tok")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    val nulls = kept.filter(_._2.isEmpty)
    assert(nulls.nonEmpty, "NULL-group rows with a defaultBudget must survive the offsets join")
    // capped together: 10 null docs x 10 tokens vs budget 35 -> exactly 4 kept (boundary law)
    val nullTok = nulls.map(_._3).sum
    assert(nullTok >= 35L && nullTok < 35L + 10L, s"NULL bucket kept $nullTok tokens for budget 35")
    assert(kept.count(_._2.contains("g0")) == 10, "budgeted group under budget keeps everything")
  }

  test("tokenBudgetMixtureWithRepeats: NULL group reaches the epoch math (null-safe totals join)") {
    val docs = ((1L to 10L).map(i => (i, if (i <= 5) "g0" else null, 10L)))
      .toDF("id", "grp", "tok")
    // NULL bucket: total 50, budget 120 -> 2 full epochs + 20-token remainder prefix
    val kept = Sampling
      .tokenBudgetMixtureWithRepeats(docs, $"grp", $"id", $"tok", Map("g0" -> 30L),
        numShards = 4, defaultBudget = Some(120L))
      .select($"id", $"grp", $"epoch")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    val nulls = kept.filter(_._2.isEmpty)
    assert(nulls.count(_._3 == 0L) == 5 && nulls.count(_._3 == 1L) == 5,
      "NULL bucket must contribute its full epochs")
    assert(nulls.count(_._3 == 2L) == 2, "NULL bucket remainder: 20 tokens = 2 docs")
  }

  test("tokenBudgetMixtureWithRepeats: maxEpochs guard fails loudly on runaway budgets") {
    val docs = Seq((1L, "tiny", 10L), (2L, "tiny", 10L)).toDF("id", "grp", "tok")
    // budget 10^9 over 20 tokens -> 5*10^7 epochs: a config error, not a fan-out
    val e = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetMixtureWithRepeats(
        docs, $"grp", $"id", $"tok", Map("tiny" -> 1000000000L), numShards = 4)
    }
    assert(e.getMessage.contains("tiny") && e.getMessage.contains("maxEpochs"),
      s"guard must name the group and the knob: ${e.getMessage}")
    // raising the cap explicitly is the documented escape hatch
    val ok = Sampling.tokenBudgetMixtureWithRepeats(
      docs, $"grp", $"id", $"tok", Map("tiny" -> 100L), numShards = 4, maxEpochs = 5)
    assert(ok.count() == 10L, "5 epochs x 2 docs, no remainder")
    // output-column clobber guard
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetMixtureWithRepeats(
        docs.withColumn("epoch", lit(9L)), $"grp", $"id", $"tok", Map("tiny" -> 10L), numShards = 4)
    }
  }

  test("budget map above the join threshold: broadcast-join form, identical selection") {
    val docs = (1L to 600L)
      .map(i => (i, s"g${i % 3}", 5L + i % 7))
      .toDF("id", "grp", "tok")
    val small = Map("g0" -> 200L, "g1" -> 50L)
    // pad with groups absent from the data: selection must not change
    val big = small ++ (1 to (Sampling.budgetMapJoinThreshold * 4))
      .map(i => s"pad_$i" -> 0L).toMap
    assert(big.size > Sampling.budgetMapJoinThreshold)
    val viaChain = Sampling
      .tokenBudgetMixture(docs, $"grp", $"id", $"tok", small, numShards = 8)
      .select($"id").as[Long].collect().toSet
    val joined = Sampling.tokenBudgetMixture(docs, $"grp", $"id", $"tok", big, numShards = 8)
    val viaJoin = joined.select($"id").as[Long].collect().toSet
    assert(viaChain == viaJoin, "when-chain and broadcast-join forms must select identically")
    // the join form actually engages (and broadcasts) above the threshold
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected a broadcast join in:\n$plan")
    // ... and a genuinely large map compiles (the when-chain would blow codegen depth)
    val huge = small ++ (1 to 10000).map(i => s"pad_$i" -> 0L).toMap
    val viaHuge = Sampling
      .tokenBudgetMixture(docs, $"grp", $"id", $"tok", huge, numShards = 8)
      .select($"id").as[Long].collect().toSet
    assert(viaHuge == viaChain)
  }

  test("non-string group columns match budgets on the STRING form under both strategies") {
    // budgets are string-keyed by contract: both the when-chain and the
    // broadcast-join form compare cast(group AS STRING) = key. The chain's
    // explicit cast is load-bearing — a bare === would let Spark coerce
    // the KEY to the group's numeric type ("07" matching int 7), so which
    // rows matched would flip when the map size crosses the threshold.
    val docs = (1L to 40L).map(i => (i, (i % 2 + 7).toInt, 5L)).toDF("id", "grp", "tok")
    // grp ∈ {7, 8} as INTEGER; "07" (budget 0) must match NEITHER group
    val small = Map("7" -> 1000L, "07" -> 0L)
    val viaChain = Sampling
      .tokenBudgetMixture(docs, $"grp", $"id", $"tok", small, numShards = 4)
      .select($"id").as[Long].collect().toSet
    val big = small ++ (1 to Sampling.budgetMapJoinThreshold * 2).map(i => s"pad_$i" -> 0L).toMap
    val viaJoin = Sampling
      .tokenBudgetMixture(docs, $"grp", $"id", $"tok", big, numShards = 4)
      .select($"id").as[Long].collect().toSet
    // group 7 matches key "7" (kept whole: 100 tokens under the 1000
    // budget; NOT the coerced "07" zero budget); group 8 has no key and no
    // default, so it drops — identically under both compilation strategies
    val expected = (1L to 40L).filter(_ % 2 == 0).toSet
    assert(viaChain == expected, s"when-chain selection: $viaChain")
    assert(viaJoin == expected, "broadcast-join form must select identically")
  }

  test("tokenBudgetMixtureWithRepeats: zero-token groups keep one copy, never loop") {
    val docs = Seq((1L, "z", 0L), (2L, "z", 0L)).toDF("id", "grp", "tok")
    val kept = Sampling
      .tokenBudgetMixtureWithRepeats(docs, $"grp", $"id", $"tok", Map("z" -> 100L), numShards = 4)
      .select($"id", $"epoch").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(kept == Seq((1L, 0L), (2L, 0L)), "all-zero-token group: plain selection, epoch 0")
  }

  test("leakageFreeSplit rejects a negative band even when the sum covers the space") {
    // train=110/val=-10 sums to 100 but assigns EVERY row to train and
    // leaves val silently empty — the typo'd holdout must fail loudly
    intercept[IllegalArgumentException] {
      Sampling.leakageFreeSplit(docs, "id", $"body", Seq("train" -> 110, "val" -> -10), 100)
    }
  }

  test("mixture: non-string group columns compare on the string form (no literal coercion)") {
    // a bare === coerces the literal "07" to int 7; membership must agree
    // with tokenBudgetMixture's string-keyed lookup instead
    val intGroups = Seq((7, 1L), (7, 2L), (8, 3L)).toDF("g", "id")
    val kept = Sampling.mixture(intGroups, $"g", $"id", Map("07" -> 1000), 1000)
    assert(kept.count() == 0, "string key \"07\" must NOT match int group 7")
    val kept7 = Sampling.mixture(intGroups, $"g", $"id", Map("7" -> 1000), 1000)
    assert(kept7.count() == 2)
  }

  test("tokenBudgetMixture: a NULL sort key neither vanishes nor steals budget") {
    val rows = Seq(
      (Some("k1"), "g", 10L), (Some("k2"), "g", 10L), (None, "g", 60L)
    ).toDF("id", "grp", "tok")
    val kept = Sampling.tokenBudgetMixture(rows, $"grp", $"id", $"tok", Map("g" -> 100L))
    // all 80 tokens fit the 100 budget: every row survives, INCLUDING the
    // null-key row (previously counted in the shard prefix sums — pushing
    // real rows past the budget — yet dropped by the null-unsafe join)
    assert(kept.count() == 3, s"null-key row lost or budget stolen: ${kept.collect().toSeq}")
  }

  test("leakageFreeSplit rejects bands that do not cover the hash space") {
    intercept[IllegalArgumentException] {
      Sampling.leakageFreeSplit(docs, "id", $"body", Seq("train" -> 50, "val" -> 10), 100)
    }
  }

  test("leakageFreeSplit refuses inputs that already carry its output columns") {
    // the output claims 'rep' and 'split'; silently clobbering a caller's
    // column of the same name would corrupt data — reject up front instead
    val bands = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    intercept[IllegalArgumentException] {
      Sampling.leakageFreeSplit(docs.withColumn("rep", lit(1)), "id", $"body", bands, 100)
    }
    intercept[IllegalArgumentException] {
      Sampling.leakageFreeSplit(docs.withColumn("split", lit("x")), "id", $"body", bands, 100)
    }
  }

  test("tokenBudgetMixture: duplicate keys keep a deterministic (key, tokens) multiset") {
    // keys deliberately collide; the window's final token-count tiebreaker
    // makes the kept (key, tokens) multiset stable across partitionings
    val dups = (1L to 60L).flatMap(i => Seq((i % 7, 10L + i % 3), (i % 7, 10L + (i + 1) % 3)))
      .map { case (k, t) => (k, "g", t) }
    def keptMultiset(parts: Int) = Sampling
      .tokenBudgetMixture(
        dups.toDF("id", "grp", "tok").repartition(parts),
        $"grp", $"id", $"tok", Map("g" -> 300L), numShards = 4)
      .groupBy($"id", $"tok").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(keptMultiset(3) == keptMultiset(17))
  }

  test("importance resample: target-like raw docs score high, alien docs score zero, target never kept") {
    // target vocabulary: "spark query engine"; raw pool: two docs in the
    // target's vocabulary, two in a disjoint one
    val docs = Seq(
      (0L, "spark query engine spark query", "target"),
      (1L, "query engine spark engine", "target"),
      (10L, "spark query engine query", "raw"), // fully target-vocab
      (11L, "spark query alpha", "raw"), // mixed
      (12L, "zebra yak xylophone walrus", "raw"), // disjoint
      (13L, "quokka vole umbrellabird", "raw")
    ).toDF("id", "text", "kind")
    val out = Sampling
      .hashedImportanceResample(docs, "id", "text", $"kind" === "target", numBuckets = 1 << 20)
      .collect().map(r => (r.getLong(0),
        (r.getAs[Boolean]("is_target"), r.getAs[Long]("score_permille"), r.getAs[Boolean]("keep"))))
      .toMap
    // with a collision-free bucket space, disjoint-vocab docs share no
    // buckets with the target -> exact zero score, never kept
    assert(out(12L)._2 == 0L && !out(12L)._3)
    assert(out(13L)._2 == 0L && !out(13L)._3)
    // the fully-target-vocab raw doc outscores the mixed one
    assert(out(10L)._2 > out(11L)._2)
    // target rows are flagged and never kept (resampling draws from raw)
    assert(out(0L)._1 && !out(0L)._3 && out(1L)._1 && !out(1L)._3)
    // determinism: a repartitioned input yields identical rows
    val again = Sampling
      .hashedImportanceResample(docs.repartition(7), "id", "text", $"kind" === "target",
        numBuckets = 1 << 20)
      .collect().map(r => (r.getLong(0),
        (r.getAs[Boolean]("is_target"), r.getAs[Long]("score_permille"), r.getAs[Boolean]("keep"))))
      .toMap
    assert(again == out)
  }
}
