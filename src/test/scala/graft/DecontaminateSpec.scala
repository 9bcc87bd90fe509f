package graft

import graft.operators.{Decontaminate, Pii}
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val benchText = "the quick brown fox jumps over the lazy dog near the river bank today"

  private def corpus = Seq(
    (1L, s"intro words then $benchText and some trailing content here"), // embedded contamination
    (2L, "completely unrelated text about spark catalyst optimizer internals and shuffles"),
    (3L, benchText),                                                     // verbatim copy
    (4L, "short overlap near the river maybe but nothing substantial beyond that phrase")
  ).toDF("doc_id", "text")

  private def bench = Seq((100L, benchText)).toDF("doc_id", "text")

  test("flags embedded and verbatim contamination, not incidental short overlap") {
    val flagged = Decontaminate
      .overlaps(corpus, bench, "doc_id", "text", minShared = 5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(flagged == Seq(1L, 3L))
  }

  test("clean drops exactly the contaminated docs") {
    val kept = Decontaminate
      .clean(corpus, bench, "doc_id", "text", minShared = 5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 4L))
  }

  test("overlap evidence grows with shared substring length") {
    val o = Decontaminate
      .overlaps(corpus, bench, "doc_id", "text", minShared = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shared")).toMap
    assert(o(3L) >= o(1L))      // full copy shares at least as much as embedded
    assert(o.getOrElse(4L, 0L) < o(1L))
  }

  test("corpus side of the plan has no shuffle before the benchmark probe") {
    val fpsPlan = Decontaminate
      .overlaps(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(fpsPlan.contains("BroadcastHashJoin") || fpsPlan.contains("BroadcastExchange"))
  }

  test("overlapsViaBloom is bit-identical to overlaps, even with a lossy 16-byte filter") {
    val exact = Decontaminate
      .overlaps(corpus, bench, "doc_id", "text", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // 8 usable bytes = 64 bits for ~14 bench fps → plenty of false
    // positives; the exact confirm join must absorb every one of them
    val viaBloom = Decontaminate
      .overlapsViaBloom(corpus, bench, "doc_id", "text", minShared = 1, numBytes = 16, numHashes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(viaBloom == exact)
    assert(
      Decontaminate
        .cleanViaBloom(corpus, bench, "doc_id", "text", minShared = 5, numBytes = 16, numHashes = 2)
        .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L)
    )
  }

  test("shared counts DISTINCT fingerprints: repeated substrings never inflate evidence") {
    // a doc that embeds the benchmark text THREE times: multiplicity-weighted
    // join counting would let the repeats multiply the evidence; distinct
    // counting bounds shared by the benchmark's own fingerprint vocabulary —
    // the bound that makes the streaming bloom pregate sound
    val repeated = Seq((7L, s"$benchText again $benchText again $benchText")).toDF("doc_id", "text")
    val benchFpCount = bench
      .select(explode(graft.operators.TextAnalysis.winnowingFingerprints($"text", 5, 8)))
      .distinct().count()
    val shared = Decontaminate
      .overlaps(repeated, bench, "doc_id", "text", minShared = 1)
      .agg(max($"shared")).head.getLong(0)
    assert(shared <= benchFpCount,
      s"shared=$shared exceeds the benchmark's $benchFpCount distinct fps — evidence was multiplicity-inflated")
    // and the fps stream itself is duplicate-free per doc (the structural
    // invariant array_distinct asserts)
    val maxDup = repeated
      .select($"doc_id",
        explode(array_distinct(graft.operators.TextAnalysis.winnowingFingerprints($"text", 5, 8))).as("fp"))
      .groupBy($"doc_id", $"fp").count().agg(max($"count")).head.getLong(0)
    assert(maxDup == 1L)
  }

  test("broadcast-bits probe path is bit-identical to the Literal path") {
    import graft.functions.{BloomExprs, BloomSupport}
    val keys = (1L to 400L).map(_ * 6151L)
    val bits = BloomSupport.emptyBuffer(1 << 9, 4)
    keys.foreach(BloomSupport.add(bits, _))
    val probeSpace = spark.range(3000).select(($"id" * 6151L).as("k"))
    val viaLit = probeSpace.filter(BloomExprs.mightContain(lit(bits), $"k"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val viaBcast = probeSpace
      .filter(BloomExprs.mightContainBcast(spark.sparkContext.broadcast(bits), $"k"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaBcast == viaLit, "broadcast and Literal probes must agree bit-for-bit")
    // the broadcast probe stays inside whole-stage codegen like the Literal one
    val plan = probeSpace
      .filter(BloomExprs.mightContainBcast(spark.sparkContext.broadcast(bits), $"k"))
      .queryExecution.executedPlan.toString
    val filterLine = plan.linesIterator.find(_.toLowerCase.contains("bloommightcontainbcast")).getOrElse("")
    assert(filterLine.trim.matches("""^(\+- )?\*\(\d+\) Filter .*"""),
      s"the broadcast probe must stay inside codegen, got: $filterLine")
    // and end-to-end: forcing the broadcast vehicle changes nothing
    val exact = Decontaminate
      .overlaps(corpus, bench, "doc_id", "text", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val viaBcastBloom = Decontaminate
      .overlapsViaBloom(corpus, bench, "doc_id", "text", minShared = 1,
        numBytes = 16, numHashes = 2, broadcastBitsOver = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(viaBcastBloom == exact)
  }

  test("bloom sketch laws: no false negatives, merge is union, geometry mismatch refuses") {
    import graft.functions.BloomSupport
    val keys = (1L to 500L).map(_ * 7919L)
    val buf = BloomSupport.emptyBuffer(1 << 10, 5)
    keys.foreach(BloomSupport.add(buf, _))
    assert(keys.forall(BloomSupport.mightContain(buf, _)), "a bloom filter never false-negatives")
    val a = BloomSupport.emptyBuffer(1 << 10, 5)
    val b = BloomSupport.emptyBuffer(1 << 10, 5)
    BloomSupport.add(a, 42L); BloomSupport.add(b, 99L)
    val m = BloomSupport.or(a, b)
    assert(BloomSupport.mightContain(m, 42L) && BloomSupport.mightContain(m, 99L))
    intercept[IllegalArgumentException] {
      BloomSupport.or(BloomSupport.emptyBuffer(64, 5), BloomSupport.emptyBuffer(64, 7))
    }
    // sized correctly, the FP rate is actually low: < 5% misses on 2000 probes
    val fp = (100000L to 102000L).count(BloomSupport.mightContain(buf, _))
    assert(fp < 100, s"$fp false positives out of 2001 at 10 bits/key")
  }

  test("mightContain answers false on garbage bytes instead of throwing (untrusted-input rule)") {
    import graft.functions.BloomSupport
    assert(!BloomSupport.mightContain(null, 1L))
    assert(!BloomSupport.mightContain(Array.empty[Byte], 1L))
    assert(!BloomSupport.mightContain(Array[Byte](5, 0, 0), 1L)) // shorter than the header
    val badK = BloomSupport.emptyBuffer(64, 5); badK(0) = 77 // hash count out of range
    assert(!BloomSupport.mightContain(badK, 1L))
    // and through SQL, where any binary column can reach the probe
    val r = spark.sql("SELECT graft_bloom_might_contain(CAST('junk' AS BINARY), 7L) AS v").head()
    assert(!r.getBoolean(0))
  }

  test("bloomAgg distributes: partitioned build equals local build; probe is codegen") {
    import graft.functions.{BloomExprs, BloomSupport}
    val keys = (1L to 300L).map(i => i * 104729L)
    val distributed = keys.toDF("k").repartition(7)
      .agg(BloomExprs.bloomAgg($"k", 1 << 10, 5)).head.getAs[Array[Byte]](0)
    val local = BloomSupport.emptyBuffer(1 << 10, 5)
    keys.foreach(BloomSupport.add(local, _))
    assert(java.util.Arrays.equals(distributed, local),
      "merge order must not change the bits (OR is commutative/associative)")
    // a local relation would be constant-folded whole (ConvertToLocalRelation
    // evaluates the probe at optimization time); range() keeps a real scan
    val probed = spark.range(300)
      .select(($"id" * 104729L).as("k"))
      .filter(BloomExprs.mightContain(lit(distributed), $"k"))
    // the `*(n)` node prefix is the whole-stage-codegen marker in the
    // simple plan string; the Filter node itself must carry it
    val filterLine = probed.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("bloommightcontain")).getOrElse("")
    assert(filterLine.trim.matches("""^(\+- )?\*\(\d+\) Filter .*"""),
      s"the probe must stay inside codegen, got: $filterLine")
    assert(probed.count() >= 300 - 1, "every built key must survive its own probe")
  }
}

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("counts and scrubs emails and phones, leaves clean text alone") {
    val df = Seq(
      (1L, "mail a.b-c_d%x+1@sub.example.co.uk and call 555-123-4567 twice 555-000-1111"),
      (2L, "no pii here at all"),
      (3L, "edge: not-a-phone 12-345-6789 and half@email@ and a@b.io")
    ).toDF("id", "t")
    val out = df.select(
      $"id",
      Pii.emailCount($"t").as("e"),
      Pii.phoneCount($"t").as("p"),
      Pii.scrub($"t").as("s")
    ).orderBy($"id").collect()

    assert(out(0).getAs[Int]("e") == 1 && out(0).getAs[Int]("p") == 2)
    assert(out(0).getAs[String]("s") == "mail <EMAIL> and call <PHONE> twice <PHONE>")
    assert(out(1).getAs[Int]("e") == 0 && out(1).getAs[Int]("p") == 0)
    assert(out(1).getAs[String]("s") == "no pii here at all")
    // "half@email@" has no TLD; "a@b.io" qualifies; 12-345-6789 is not a NANP shape
    assert(out(2).getAs[Int]("e") == 1 && out(2).getAs[Int]("p") == 0)
    assert(out(2).getAs[String]("s") == "edge: not-a-phone 12-345-6789 and half@email@ and <EMAIL>")
  }

  test("scrub is idempotent") {
    val df = Seq((1L, "x y@z.com 555-123-4567")).toDF("id", "t")
    val once = df.select(Pii.scrub($"t").as("s"))
    val twice = once.select(Pii.scrub($"s").as("s"))
    assert(once.head.getString(0) == twice.head.getString(0))
  }
}
