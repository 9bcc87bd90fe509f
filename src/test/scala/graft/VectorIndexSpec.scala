package graft

import graft.operators.{Similarity, VectorIndex}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Persistent IVF-PQ index: build → reopen round-trip, partition-pruned
  * probe reads, and recall on clustered data.
  */
@org.scalatest.tags.Slow
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  // 4 tight clusters in 16-d, 50 points each (ANN-friendly geometry)
  private def clustered: Seq[(Long, Seq[Float])] = {
    val rnd = new Random(7)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    (0 until 200).map { i =>
      (i.toLong, centers(i % 4).map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
  }

  test("build → open round-trip; probe results identical; partition pruning active") {
    val dir = tmpDir("vindex")
    val corpus = clustered.toDF("vec_id", "embedding")
    val built = VectorIndex.build(corpus, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    val reopened = VectorIndex.open(spark, dir)
    assert(reopened.centroids.map(_.toSeq).toSeq == built.centroids.map(_.toSeq).toSeq)
    assert(reopened.codebooks.flatten.map(_.toSeq).toSeq == built.codebooks.flatten.map(_.toSeq).toSeq)

    // the realistic probe shape: a FILTERED SCAN of a query table — the
    // selective predicate is what dynamic partition pruning keys on (an
    // in-memory literal query set constant-folds to a LocalRelation and
    // leaves nothing for the DPP rule to see)
    corpus.write.parquet(s"$dir/queries_src")
    val queries = spark.read
      .parquet(s"$dir/queries_src")
      .filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val a = VectorIndex.query(built, queries, nProbe = 2, k = 5)
    val b = VectorIndex.query(reopened, queries, nProbe = 2, k = 5)
    val rows = a.select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(rows == b.select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet)
    assert(rows.nonEmpty)

    // the probe must not read the whole postings table: the cluster join
    // key is a partition column, so dynamic partition pruning kicks in
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"expected a DPP filter on the postings scan:\n$plan")
  }

  test("top-1 on tight clusters: same-cluster recall ≥ 0.9 through the persisted index") {
    val dir = tmpDir("vindex_recall")
    val corpus = clustered.toDF("vec_id", "embedding")
    val h = VectorIndex.build(corpus, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    val queries = corpus.filter($"vec_id" < 20).select($"vec_id".as("qid"), $"embedding".as("qe"))
    val top1 = VectorIndex
      .query(h, queries, nProbe = 1, k = 1)
      .select($"qid", $"vec_id")
      .as[(Long, Long)]
      .collect()
    assert(top1.length == 20)
    val hits = top1.count { case (q, v) => q % 4 == v % 4 }
    assert(hits >= 18, s"same-cluster top-1 hits: $hits/20")
  }

  test("probe-everything through the index equals in-memory PQ ADC ranking (flat mode)") {
    val dir = tmpDir("vindex_exact")
    val corpus = clustered.toDF("vec_id", "embedding")
    // flat encoding is what Similarity.pqEncode/pqTopK compute, so only the
    // residual=false build can be equivalence-checked against them
    val h = VectorIndex.build(corpus, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8,
      residual = false)
    val queries = corpus.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding".as("qe"))
    val viaIndex = VectorIndex
      .query(h, queries, nProbe = 4, k = 5)
      .select($"qid", $"vec_id", $"rank")
      .as[(Long, Long, Int)]
      .collect()
      .toSet
    val encoded = Similarity.pqEncode(corpus, "embedding", h.codebooks).select($"vec_id", $"codes")
    val inMemory = Similarity
      .pqTopK(queries, encoded, h.codebooks, 5)
      .select($"qid", $"vec_id", $"rank")
      .as[(Long, Long, Int)]
      .collect()
      .toSet
    assert(viaIndex == inMemory)
  }

  test("append: incremental vectors land in the right lists and are findable") {
    val data = clustered
    val dir = tmpDir("vindex_append")
    val (first, rest) = data.partition(_._1 < 150)
    val h = VectorIndex.build(first.toDF("vec_id", "embedding"), "vec_id", "embedding", dir,
      kLists = 4, m = 4, ksub = 8)
    assert(VectorIndex.stats(h, spark).agg(sum($"n_vectors")).head().getLong(0) == 150)

    VectorIndex.append(h, rest.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val st = VectorIndex.stats(h, spark).as[(Int, Long)].collect().toMap
    assert(st.values.sum == 200)
    assert(st.size == 4, s"appends must stay within the existing 4 lists, got ${st.keys}")

    // an external query identical to an APPENDED vector must find it
    // (probe-everything, excludeSelf=false since qid 9999 is external)
    val target = rest.head
    val queries = Seq((9999L, target._2)).toDF("qid", "qe")
    val top = VectorIndex
      .query(h, queries, nProbe = 4, k = 5, excludeSelf = false)
      .select($"vec_id")
      .as[Long]
      .collect()
      .toSet
    assert(top.contains(target._1), s"appended vector ${target._1} not in top-5: $top")

    // appending in chunks is equivalent to appending at once: same rows
    val dir2 = tmpDir("vindex_append2")
    val h2 = VectorIndex.build(first.toDF("vec_id", "embedding"), "vec_id", "embedding", dir2,
      kLists = 4, m = 4, ksub = 8)
    rest.grouped(17).foreach { chunk =>
      VectorIndex.append(h2, chunk.toDF("vec_id", "embedding"), "vec_id", "embedding")
    }
    def postings(d: String) = spark.read.parquet(s"$d/postings")
      .select($"vec_id", $"cluster", $"codes").as[(Long, Int, Seq[Int])].collect().toSet
    assert(postings(dir) == postings(dir2))
  }

  test("remove: victims vanish from probes, untouched partitions' files are never rewritten") {
    val dir = tmpDir("vindex_remove")
    val corpus = clustered.toDF("vec_id", "embedding")
    val h = VectorIndex.build(corpus, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    val st0 = VectorIndex.stats(h, spark).as[(Int, Long)].collect().toMap

    // victims: three vectors from one cluster family + one id not indexed
    val victims = Seq(0L, 4L, 8L, 99999L).toDF("vec_id")
    val victimLists = spark.read.parquet(s"$dir/postings")
      .filter($"vec_id".isin(0L, 4L, 8L)).select($"cluster").distinct().as[Int].collect().toSet
    def partFiles(l: Int): Set[String] =
      Option(new java.io.File(s"$dir/postings/cluster=$l").listFiles())
        .fold(Set.empty[String])(_.map(_.getName).toSet)
    val untouchedBefore =
      (st0.keySet -- victimLists).map(l => l -> partFiles(l)).toMap

    assert(VectorIndex.remove(h, victims, "vec_id") == 3L)
    // idempotent: removing again is a no-op
    assert(VectorIndex.remove(h, victims, "vec_id") == 0L)

    val st1 = VectorIndex.stats(h, spark).as[(Int, Long)].collect().toMap
    assert(st1.values.sum == st0.values.sum - 3)
    // locality: partitions without a victim keep their exact files
    untouchedBefore.foreach { case (l, files) =>
      assert(partFiles(l) == files, s"untouched partition $l was rewritten")
    }
    // probes never return a removed vector; survivors still rank
    val queries = corpus.filter($"vec_id" < 20).select($"vec_id".as("qid"), $"embedding".as("qe"))
    val got = VectorIndex.query(h, queries, nProbe = 4, k = 5, excludeSelf = false)
      .select($"vec_id").as[Long].collect().toSet
    assert(got.nonEmpty && Set(0L, 4L, 8L).intersect(got).isEmpty, s"removed ids still probed: $got")
  }

  test("remove on a string-keyed index: victims actually leave (no silent long-cast no-op)") {
    // build/append accept any id type; remove must cast victims to the
    // index's own vec_id type — a hardcoded long cast turns 'doc-3' into
    // null, matches nothing, and reports success while victims stay probeable
    val dir = tmpDir("vindex_remove_str")
    val corpus = clustered.map { case (i, e) => (s"doc-$i", e) }.toDF("vec_id", "embedding")
    val h = VectorIndex.build(corpus, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    val victims = Seq("doc-0", "doc-4", "doc-8", "doc-nope").toDF("vec_id")
    assert(VectorIndex.remove(h, victims, "vec_id") == 3L)
    val left = spark.read.parquet(s"$dir/postings").select($"vec_id").as[String].collect().toSet
    assert(left.size == 197 && Set("doc-0", "doc-4", "doc-8").intersect(left).isEmpty)
  }

  test("remove re-run repairs a crash between the survivor append and the file delete") {
    val dir = tmpDir("vindex_remove_crash")
    val corpus = clustered.toDF("vec_id", "embedding")
    val h = VectorIndex.build(corpus, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    val victims = Seq(0L, 4L, 8L).toDF("vec_id")
    val victimLists = spark.read.parquet(s"$dir/postings")
      .filter($"vec_id".isin(0L, 4L, 8L)).select($"cluster").distinct().as[Int].collect().toSet

    // snapshot the victim partitions' pre-remove files, run remove to
    // completion, then restore the snapshot alongside the new files: the
    // partition now holds old files (survivors+victims) AND new files
    // (survivors) — byte-for-byte the state a crash after the append but
    // before the delete leaves behind
    val snap = victimLists.map { l =>
      val d = new java.io.File(s"$dir/postings/cluster=$l")
      l -> d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath); (f.getName, bytes)
      }.toSeq
    }.toMap
    assert(VectorIndex.remove(h, victims, "vec_id") == 3L)
    snap.foreach { case (l, files) =>
      files.foreach { case (name, bytes) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/postings/cluster=$l", s"crashed-$name"), bytes)
      }
    }
    val dup = spark.read.parquet(s"$dir/postings")
      .groupBy($"vec_id").count().filter($"count" > 1).count()
    assert(dup > 0, "crash state should hold duplicated survivors")

    // the re-run collapses the duplicates and removes the restored victims
    // exactly once — survivors end up exactly-once, not doubled
    VectorIndex.remove(h, victims, "vec_id")
    val rows = spark.read.parquet(s"$dir/postings").select($"vec_id").as[Long].collect()
    assert(rows.length == rows.distinct.length, "survivors duplicated after repair re-run")
    assert(rows.length == 197 && Set(0L, 4L, 8L).intersect(rows.toSet).isEmpty)
  }

  test("rebalance repairs an interrupted predecessor: cross-list duplicates collapse") {
    // a crash between a rebalance's postings append and its old-file delete
    // leaves moved vectors in TWO lists — and a re-run allocates different
    // fresh ids, so only the explicit repair pre-pass can ever collapse
    // them (they'd double-count in every probe forever otherwise)
    val dir = tmpDir("vindex_rebal_crash")
    val corpus = clustered.toDF("vec_id", "embedding")
    val h = VectorIndex.build(corpus, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    val movedRows = spark.read.parquet(s"$dir/postings")
      .filter($"cluster" === 0).select($"vec_id", $"codes").limit(3)
      .as[(Long, Seq[Int])].collect().toSeq
    val movedIds = movedRows.map(_._1).toSet
    movedRows.map { case (id, codes) => (id, 3, codes) }.toDF("vec_id", "cluster", "codes")
      .write.mode("append").partitionBy("cluster").parquet(s"$dir/postings")
    val dupCount = spark.read.parquet(s"$dir/postings")
      .groupBy($"vec_id").count().filter($"count" > 1).count()
    assert(dupCount == 3, "precondition: crashed state holds cross-list duplicates")

    // nothing is hot (huge skew bound) — the call is repair-only
    VectorIndex.rebalanceIfNeeded(h, corpus, "vec_id", "embedding", maxSkew = 1000.0)
    val after = spark.read.parquet(s"$dir/postings")
      .select($"vec_id", $"cluster").as[(Long, Int)].collect()
    assert(after.length == 200 && after.map(_._1).distinct.length == 200,
      s"duplicates survived the repair: ${after.length} rows")
    // the NEWEST placement wins (maintenance only moves vectors to newer lists)
    val placed = after.toMap
    movedIds.foreach(id => assert(placed(id) == 3, s"vec $id not at its newest placement"))
  }

  test("rebalanceIfNeeded: drift-heavy appends degrade recall, rebalance restores it to ~fresh-build") {
    // build on mode A (4 tight clusters), then append a mode B the build
    // never saw (4 NEW clusters) — B's 400 vectors pour into whichever of
    // A's lists are least-wrong, exactly the skew the maintenance policy
    // exists for
    val rnd = new Random(13)
    val centersA = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    val centersB = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    val a: Seq[(Long, Seq[Float])] = (0 until 200).map { i =>
      (i.toLong, centersA(i % 4).map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
    val b: Seq[(Long, Seq[Float])] = (200 until 600).map { i =>
      (i.toLong, centersB(i % 4).map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
    val all = a ++ b
    val dir = tmpDir("vindex_rebal")
    val h0 = VectorIndex.build(a.toDF("vec_id", "embedding"), "vec_id", "embedding", dir,
      kLists = 4, m = 4, ksub = 8)
    VectorIndex.append(h0, b.toDF("vec_id", "embedding"), "vec_id", "embedding")

    // ground truth: exact L2 top-10 over A∪B for 30 mode-B queries
    val vecs = all.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def l2(x: Array[Double], y: Array[Double]): Double =
      x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
    val qids = (200L until 230L).toSeq
    val exact: Map[Long, Set[Long]] = qids.map { q =>
      q -> vecs.keys.filter(_ != q).toSeq.sortBy(v => (l2(vecs(q), vecs(v)), v)).take(10).toSet
    }.toMap
    val queries = all.filter(r => qids.contains(r._1)).toDF("vec_id", "embedding")
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    def recallAt10(h: VectorIndex.Handle): Double = {
      val got = VectorIndex
        .query(h, queries, nProbe = 1, k = 10)
        .select($"qid", $"vec_id")
        .as[(Long, Long)]
        .collect()
        .groupBy(_._1)
        .view
        .mapValues(_.map(_._2).toSet)
        .toMap
      exact.map { case (q, t) => got.getOrElse(q, Set.empty).intersect(t).size / 10.0 }.sum / exact.size
    }

    val rAppended = recallAt10(h0)
    val h1 = VectorIndex.rebalanceIfNeeded(
      h0, all.toDF("vec_id", "embedding"), "vec_id", "embedding", maxSkew = 1.5)
    assert(h1.centroids.length > 4, "hot lists should have split into new posting lists")
    // no vector lost or duplicated by the partition swap
    val st = VectorIndex.stats(h1, spark).as[(Int, Long)].collect()
    assert(st.map(_._2).sum == 600, s"posting occupancy after rebalance: ${st.toSeq}")
    val rRebalanced = recallAt10(h1)
    val hFresh = VectorIndex.build(all.toDF("vec_id", "embedding"), "vec_id", "embedding",
      tmpDir("vindex_rebal_fresh"), kLists = h1.centroids.length, m = 4, ksub = 8)
    val rFresh = recallAt10(hFresh)
    info(s"recall@10: appended=$rAppended rebalanced=$rRebalanced fresh=$rFresh lists=${h1.centroids.length}")
    assert(rRebalanced > rAppended + 0.1, s"rebalance must measurably restore recall ($rAppended → $rRebalanced)")
    assert(rRebalanced >= rFresh - 0.15, s"rebalanced recall $rRebalanced not within ε of fresh build $rFresh")
    // a reopened session observes the rebalanced geometry (meta version bumped)
    val reopened = VectorIndex.open(spark, dir)
    assert(reopened.centroids.length == h1.centroids.length)
    assert(spark.read.parquet(s"$dir/meta").select($"version").as[Int].head() == 2)
    // idempotence: nothing hot anymore → same handle back
    val h2 = VectorIndex.rebalanceIfNeeded(
      h1, all.toDF("vec_id", "embedding"), "vec_id", "embedding", maxSkew = 1.5)
    assert(h2 eq h1)
  }

  test("residual encoding beats flat encoding at fixed nProbe (recall@10 vs exact L2)") {
    // 8 clusters so cluster identity alone consumes all ksub=8 sub-centroids
    // of a flat codebook — the textbook geometry where flat PQ has zero
    // resolution left for within-list ranking and residual encoding shines
    val rnd = new Random(11)
    val centers = Seq.fill(8)(Array.fill(16)(rnd.nextGaussian() * 5))
    val data: Seq[(Long, Seq[Float])] = (0 until 320).map { i =>
      (i.toLong, centers(i % 8).map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
    val corpus = data.toDF("vec_id", "embedding")
    val hR = VectorIndex.build(corpus, "vec_id", "embedding", tmpDir("vindex_res"),
      kLists = 8, m = 4, ksub = 8, residual = true)
    val hF = VectorIndex.build(corpus, "vec_id", "embedding", tmpDir("vindex_flat"),
      kLists = 8, m = 4, ksub = 8, residual = false)
    val queries = corpus.filter($"vec_id" < 30).select($"vec_id".as("qid"), $"embedding".as("qe"))

    // exact L2 top-10 (self excluded) — ground truth, computed on the
    // 320-point fixture directly
    val vecs = data.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact: Map[Long, Set[Long]] = (0L until 30L).map { q =>
      q -> vecs.keys.filter(_ != q).toSeq.sortBy(v => (l2(vecs(q), vecs(v)), v)).take(10).toSet
    }.toMap

    def recallAt10(h: VectorIndex.Handle): Double = {
      val got = VectorIndex
        .query(h, queries, nProbe = 1, k = 10)
        .select($"qid", $"vec_id")
        .as[(Long, Long)]
        .collect()
        .groupBy(_._1)
        .view
        .mapValues(_.map(_._2).toSet)
        .toMap
      exact.map { case (q, truth) => got.getOrElse(q, Set.empty).intersect(truth).size / 10.0 }
        .sum / exact.size
    }

    val rR = recallAt10(hR)
    val rF = recallAt10(hF)
    // both probe the SAME single list (same IVF centroids/seed), so the gap
    // is purely ADC ranking quality: flat codes collapse a tight cluster's
    // members to near-identical codes, residual codes spend all their
    // resolution on the within-list variation
    info(s"recall@10: residual=$rR flat=$rF")
    assert(rR > rF + 0.1, s"residual recall@10 $rR not measurably better than flat $rF")
    assert(rR >= 0.4, s"residual recall@10 unexpectedly low: $rR")
  }

  test("retrainIfDrifted: distribution shift degrades ADC fit; retrain restores it to ~fresh-build") {
    // mode A: 4 tight clusters (0.1-σ residuals near the centroid). mode B:
    // 0.5-σ clusters OFFSET by a fixed norm-8 vector inside the SAME
    // posting lists (inter-center distance ~57 ≫ 8, so assignment is
    // unchanged and occupancy stays balanced — rebalance sees NOTHING).
    // The build-time residual codebooks were trained on ~0-centered 0.1-σ
    // residuals, so every B residual (≈ the offset) maps to the same
    // near-zero code: B candidates become mutually indistinguishable to
    // ADC. Exactly the "new encoder version" staleness retrain exists for.
    // B's wider spread matters: it makes exact nearest neighbors
    // PQ-resolvable (codebooks fit on the mixture can rank them), so the
    // recall gap between stale and retrained codes is a real signal rather
    // than a sub-quantization-resolution coin flip.
    val rnd = new Random(17)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian() * 10))
    // ONE shared drift vector — an encoder-version bump shifts every
    // cluster the same way, and it keeps the retrained codebooks' capacity
    // on two modes per subspace (A at 0, B at delta) instead of five
    val delta = {
      val d = Array.fill(16)(rnd.nextGaussian())
      val n = math.sqrt(d.map(x => x * x).sum); d.map(_ / n * 8.0)
    }
    val a: Seq[(Long, Seq[Float])] = (0 until 200).map { i =>
      (i.toLong, centers(i % 4).map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
    val b: Seq[(Long, Seq[Float])] = (200 until 600).map { i =>
      (i.toLong,
        centers(i % 4).zip(delta).map { case (c, o) =>
          (c + o + rnd.nextGaussian() * 0.5).toFloat
        }.toSeq)
    }
    val all = a ++ b
    val dir = tmpDir("vindex_retrain")
    val corpusA = a.toDF("vec_id", "embedding")
    val corpusAll = all.toDF("vec_id", "embedding")
    val h0 = VectorIndex.build(corpusA, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    val baselineErr = VectorIndex.quantizationError(h0, corpusA, "vec_id", "embedding")
    VectorIndex.append(h0, b.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val driftedErr = VectorIndex.quantizationError(h0, corpusAll, "vec_id", "embedding")
    info(s"qerr: baseline=$baselineErr drifted=$driftedErr (${driftedErr / baselineErr}x)")
    assert(driftedErr > 1.5 * baselineErr, "the shifted corpus must measurably exceed the baseline")
    // observability twin: driftStats reports exactly the condition
    // retrainIfDrifted acts on, without acting
    val ds = VectorIndex.driftStats(h0, corpusAll, "vec_id", "embedding", tolerance = 1.5)
      .as[(Option[Double], Double, Option[Double], Boolean)].head()
    assert(ds._4 && ds._3.exists(_ > 1.5) && ds._1.contains(baselineErr),
      s"driftStats must flag the planted drift: $ds")

    // recall with nProbe = ALL lists: coarse geometry can't hide anything —
    // what's measured is purely how well the codes rank candidates
    val vecs = all.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def l2(x: Array[Double], y: Array[Double]): Double =
      x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
    val qids = (200L until 230L).toSeq
    val exact: Map[Long, Set[Long]] = qids.map { q =>
      q -> vecs.keys.filter(_ != q).toSeq.sortBy(v => (l2(vecs(q), vecs(v)), v)).take(10).toSet
    }.toMap
    val queries = all.filter(r => qids.contains(r._1)).toDF("vec_id", "embedding")
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    def recallAt10(h: VectorIndex.Handle): Double = {
      val got = VectorIndex
        .query(h, queries, nProbe = 4, k = 10)
        .select($"qid", $"vec_id")
        .as[(Long, Long)]
        .collect()
        .groupBy(_._1)
        .view
        .mapValues(_.map(_._2).toSet)
        .toMap
      exact.map { case (q, t) => got.getOrElse(q, Set.empty).intersect(t).size / 10.0 }.sum / exact.size
    }

    val rDrifted = recallAt10(h0)
    val h1 = VectorIndex.retrainIfDrifted(h0, corpusAll, "vec_id", "embedding", tolerance = 1.5)
    assert(!(h1 eq h0), "drift past tolerance must retrain")
    assert(h1.centroids.map(_.toSeq).toSeq == h0.centroids.map(_.toSeq).toSeq,
      "retrain repairs codes, never the coarse geometry")
    assert(h1.codebooks.flatten.map(_.toSeq) != h0.codebooks.flatten.map(_.toSeq),
      "codebooks must actually change")
    val rRetrained = recallAt10(h1)
    val hFresh = VectorIndex.build(corpusAll, "vec_id", "embedding",
      tmpDir("vindex_retrain_fresh"), kLists = 4, m = 4, ksub = 8)
    val rFresh = recallAt10(hFresh)
    info(s"recall@10 (probe-all): drifted=$rDrifted retrained=$rRetrained fresh=$rFresh")
    assert(rRetrained > rDrifted + 0.1, s"retrain must measurably restore recall ($rDrifted → $rRetrained)")
    assert(rRetrained >= rFresh - 0.15, s"retrained recall $rRetrained not within ε of fresh build $rFresh")

    // no vector lost/duplicated by the swap; meta carries version 2 + the
    // NEW baseline; a reopened session probes identically to h1
    val st = VectorIndex.stats(h1, spark).as[(Int, Long)].collect()
    assert(st.map(_._2).sum == 600, s"posting occupancy after retrain: ${st.toSeq}")
    val meta = spark.read.parquet(s"$dir/meta")
    assert(meta.select($"version").as[Int].head() == 2)
    val newBaseline = meta.select($"baseline_qerr").as[Option[Double]].head().get
    assert(newBaseline < driftedErr, "the retrained fit is the new reference point")
    val reopened = VectorIndex.open(spark, dir)
    val p1 = VectorIndex.query(h1, queries, nProbe = 4, k = 10)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val p2 = VectorIndex.query(reopened, queries, nProbe = 4, k = 10)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(p1 == p2)
    // converged: the next check sees no drift and returns the same handle,
    // and the observability twin agrees
    val h2 = VectorIndex.retrainIfDrifted(h1, corpusAll, "vec_id", "embedding", tolerance = 1.5)
    assert(h2 eq h1)
    assert(!VectorIndex.driftStats(h1, corpusAll, "vec_id", "embedding", tolerance = 1.5)
      .select($"drifted").as[Boolean].head(),
      "after retrain the drift report must clear")
  }

  test("retrain crash safety: pre-marker stages are discarded, post-marker stages roll forward") {
    import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}
    def copyTree(src: JPath, dst: JPath): Unit = {
      Files.walk(src).forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val rnd = new Random(19)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian() * 10))
    val a: Seq[(Long, Seq[Float])] = (0 until 200).map { i =>
      (i.toLong, centers(i % 4).map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
    val b: Seq[(Long, Seq[Float])] = (200 until 600).map { i =>
      (i.toLong, centers(i % 4).map(x => (x + rnd.nextGaussian() * 4.0).toFloat).toSeq)
    }
    val all = (a ++ b).toDF("vec_id", "embedding")
    val d1 = tmpDir("vindex_crash_live")
    val h0 = VectorIndex.build(a.toDF("vec_id", "embedding"), "vec_id", "embedding", d1,
      kLists = 4, m = 4, ksub = 8)
    VectorIndex.append(h0, b.toDF("vec_id", "embedding"), "vec_id", "embedding")

    // CRASH BEFORE THE MARKER: a stray staged postings dir with no staged
    // meta is a pre-marker crash — the live set was never touched, so the
    // stage is discarded and the index reads exactly as before
    copyTree(Paths.get(d1, "postings"), Paths.get(d1, "postings.__retrain"))
    val preRepair = VectorIndex.open(spark, d1)
    assert(!Files.exists(Paths.get(d1, "postings.__retrain")), "pre-marker stage must be discarded")
    assert(spark.read.parquet(s"$d1/postings").count() == 600)
    assert(preRepair.codebooks.flatten.map(_.toSeq).toSeq == h0.codebooks.flatten.map(_.toSeq).toSeq)

    // CRASH AFTER THE MARKER: d2 is a byte-identical clone of d1, so d2's
    // COMPLETED retrain artifacts are exactly what d1's retrain would have
    // staged (same centroids, deterministic seeds). Plant them as d1's
    // staged set and crash "before any swap" — open() must roll forward.
    val d2 = tmpDir("vindex_crash_clone")
    copyTree(Paths.get(d1), Paths.get(d2))
    // a second pristine pre-retrain clone, for the stale-handle scenario at
    // the end (d1 itself gets promoted below)
    val d4Src = tmpDir("vindex_crash_pristine")
    copyTree(Paths.get(d1), Paths.get(d4Src))
    val h2 = VectorIndex.retrainIfDrifted(
      VectorIndex.open(spark, d2), all, "vec_id", "embedding", tolerance = 1.5)
    assert(!(h2.codebooks.flatten.map(_.toSeq).toSeq == h0.codebooks.flatten.map(_.toSeq).toSeq),
      "precondition: the clone's retrain actually fired")
    for (n <- Seq("postings", "codebooks", "meta"))
      copyTree(Paths.get(d2, n), Paths.get(d1, s"$n.__retrain"))
    val rolled = VectorIndex.open(spark, d1)
    for (n <- Seq("postings", "codebooks", "meta"))
      assert(!Files.exists(Paths.get(d1, s"$n.__retrain")), s"$n stage must have been promoted")
    assert(rolled.codebooks.flatten.map(_.toSeq).toSeq == h2.codebooks.flatten.map(_.toSeq).toSeq,
      "rolled-forward index must carry the retrained codebooks")
    assert(spark.read.parquet(s"$d1/meta").select($"version").as[Int].head() == 2)
    val queries = a.take(5).toDF("vec_id", "embedding").select($"vec_id".as("qid"), $"embedding".as("qe"))
    val want = VectorIndex.query(h2, queries, nProbe = 2, k = 5)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val got = VectorIndex.query(rolled, queries, nProbe = 2, k = 5)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(got == want && got.nonEmpty)

    // STALE HANDLE ACROSS THE ROLL-FORWARD: a caller who opened the index
    // BEFORE the interrupted retrain and mutates through that handle after
    // the marker exists must not write pre-retrain encodings into the
    // promoted postings. d3: pre-retrain clone, handle captured, THEN the
    // completed stage is planted; append through the stale handle. The
    // appended codes must equal what the post-retrain index (d4) encodes
    // for the same vectors — byte-for-byte.
    val d3 = tmpDir("vindex_crash_stale")
    copyTree(Paths.get(d4Src), Paths.get(d3))
    val hStale = VectorIndex.open(spark, d3) // pre-retrain codebooks
    for (n <- Seq("postings", "codebooks", "meta"))
      copyTree(Paths.get(d2, n), Paths.get(d3, s"$n.__retrain"))
    val extra = (10000 until 10005).map { i =>
      (i.toLong, centers(i % 4).map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
    VectorIndex.append(hStale, extra.toDF("vec_id", "embedding"), "vec_id", "embedding")
    assert(!Files.exists(Paths.get(d3, "postings.__retrain")),
      "append through a stale handle must promote the staged commit first")
    VectorIndex.append(h2, extra.toDF("vec_id", "embedding"), "vec_id", "embedding")
    def codesOf(dir: String): Map[Long, Seq[Int]] = spark.read
      .parquet(s"$dir/postings")
      .filter($"vec_id" >= 10000L)
      .select($"vec_id", $"codes")
      .as[(Long, Seq[Int])]
      .collect()
      .toMap
    val viaStale = codesOf(d3)
    val viaFresh = codesOf(d2)
    assert(viaStale.keySet.size == 5 && viaStale == viaFresh,
      s"stale-handle append must encode under the PROMOTED codebooks: $viaStale vs $viaFresh")
  }

  test("lifecycle soak: append → rebalance → retrain → remove → append composes with invariants held") {
    // every maintenance operation in sequence on ONE index, with the
    // conservation invariants checked after each step — the individual
    // operations are spec'd above; this catches their INTERACTIONS
    // (rebalance after retrain must re-encode with the retrained
    // codebooks, retrain after remove must tolerate corpus ⊋ indexed,
    // appends must land correctly whatever came before).
    val rnd = new Random(23)
    val dim = 16
    val centers = Seq.fill(4)(Array.fill(dim)(rnd.nextGaussian() * 10))
    val delta = {
      val d = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(d.map(x => x * x).sum); d.map(_ / n * 8.0)
    }
    def mk(ids: Range, drifted: Boolean): Seq[(Long, Seq[Float])] = ids.map { i =>
      val c = centers(i % 4)
      val v =
        if (drifted) c.zip(delta).map { case (x, o) => (x + o + rnd.nextGaussian() * 0.5).toFloat }
        else c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat)
      (i.toLong, v.toSeq)
    }
    val gen0 = mk(0 until 200, drifted = false)
    val gen1 = mk(200 until 600, drifted = true) // same lists, shifted mode
    val gen2 = mk(600 until 650, drifted = true)
    val dir = tmpDir("vindex_soak")

    var corpus = gen0
    def corpusDF = corpus.toDF("vec_id", "embedding")
    def occupancy(h: VectorIndex.Handle): Long =
      VectorIndex.stats(h, spark).as[(Int, Long)].collect().map(_._2).sum
    def distinctIndexed(h: VectorIndex.Handle): Long =
      spark.read.parquet(s"${h.dir}/postings").select($"vec_id").distinct().count()

    var h = VectorIndex.build(corpusDF, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)

    // 1. drifted append (same coarse lists, shifted residual mode)
    corpus = corpus ++ gen1
    VectorIndex.append(h, gen1.toDF("vec_id", "embedding"), "vec_id", "embedding")
    assert(occupancy(h) == 600 && distinctIndexed(h) == 600)

    // 2. rebalance (may split — occupancy conserved either way)
    h = VectorIndex.rebalanceIfNeeded(h, corpusDF, "vec_id", "embedding", maxSkew = 1.5)
    assert(occupancy(h) == 600 && distinctIndexed(h) == 600, "rebalance must conserve vectors")

    // 3. retrain (codes repaired against the current mixture)
    val before = h.codebooks.flatten.map(_.toSeq).toSeq
    h = VectorIndex.retrainIfDrifted(h, corpusDF, "vec_id", "embedding", tolerance = 1.5)
    assert(h.codebooks.flatten.map(_.toSeq).toSeq != before, "the planted drift must trigger retrain")
    assert(occupancy(h) == 600 && distinctIndexed(h) == 600, "retrain must conserve vectors")

    // 4. remove a slice (takedowns) — victims gone, survivors intact
    val victims = (0L until 50L)
    val removed = VectorIndex.remove(h, victims.toDF("vec_id"), "vec_id")
    corpus = corpus.filterNot(r => victims.contains(r._1))
    assert(removed == 50 && occupancy(h) == 550 && distinctIndexed(h) == 550)

    // 5. retrain check AFTER remove: corpus ⊇ indexed is the contract —
    // feed the full remaining corpus; must not throw, must conserve
    h = VectorIndex.retrainIfDrifted(h, corpusDF, "vec_id", "embedding", tolerance = 1.5)
    assert(occupancy(h) == 550)

    // 6. append a final generation; everything probes coherently
    corpus = corpus ++ gen2
    VectorIndex.append(h, gen2.toDF("vec_id", "embedding"), "vec_id", "embedding")
    assert(occupancy(h) == 600 && distinctIndexed(h) == 600)

    // probes: victims never surface; a reopened session agrees exactly;
    // recall against exact L2 is fresh-build-grade after all that churn
    val vecs = corpus.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def l2(x: Array[Double], y: Array[Double]): Double =
      x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
    val qids = corpus.map(_._1).filter(i => i % 37 == 0).take(20)
    val queries = corpus.filter(r => qids.contains(r._1)).toDF("vec_id", "embedding")
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val probed = VectorIndex.query(h, queries, nProbe = 4, k = 10)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect()
    assert(!probed.exists(p => victims.contains(p._2)), "removed vectors must never surface")
    val reopened = VectorIndex.open(spark, dir)
    val probed2 = VectorIndex.query(reopened, queries, nProbe = 4, k = 10)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect()
    assert(probed.toSet == probed2.toSet, "a reopened session must probe identically")
    val exact: Map[Long, Set[Long]] = qids.map { q =>
      q -> vecs.keys.filter(_ != q).toSeq.sortBy(v => (l2(vecs(q), vecs(v)), v)).take(10).toSet
    }.toMap
    val got = probed.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.map { case (q, t) => got.getOrElse(q, Set.empty).intersect(t).size / 10.0 }.sum / exact.size
    val hFresh = VectorIndex.build(corpusDF, "vec_id", "embedding",
      tmpDir("vindex_soak_fresh"), kLists = 4, m = 4, ksub = 8)
    val gotF = VectorIndex.query(hFresh, queries, nProbe = 4, k = 10)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recallF = exact.map { case (q, t) => gotF.getOrElse(q, Set.empty).intersect(t).size / 10.0 }.sum / exact.size
    info(s"soak recall@10: maintained=$recall fresh=$recallF")
    assert(recall >= recallF - 0.15,
      s"a fully-maintained index must probe at fresh-build grade: $recall vs $recallF")
  }

  test("writer lease: a held lease fails a second maintenance op fast; release unblocks it") {
    val dir = tmpDir("vindex_lease")
    val corpus = clustered.toDF("vec_id", "embedding")
    val h = VectorIndex.build(corpus, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    // simulate a concurrent writer: its lease marker exists with a fresh mtime
    val lease = new java.io.File(dir, "__writer_lease")
    java.nio.file.Files.writeString(lease.toPath, "op=retrain pid=99999 at=now")
    val extra = Seq((9001L, Seq.fill(16)(0.5f))).toDF("vec_id", "embedding")
    val e1 = intercept[IllegalStateException] {
      VectorIndex.append(h, extra, "vec_id", "embedding")
    }
    assert(e1.getMessage.contains("writer lease"), e1.getMessage)
    intercept[IllegalStateException] {
      VectorIndex.remove(h, Seq(1L).toDF("vec_id"), "vec_id")
    }
    intercept[IllegalStateException] {
      VectorIndex.rebalanceIfNeeded(h, corpus, "vec_id", "embedding")
    }
    intercept[IllegalStateException] {
      VectorIndex.retrainIfDrifted(h, corpus, "vec_id", "embedding")
    }
    // exactly one proceeds: the holder releases, the blocked op now succeeds
    // and releases its own lease on exit
    assert(lease.delete())
    VectorIndex.append(h, extra, "vec_id", "embedding")
    assert(!lease.exists(), "a completed op must release its lease")
    val found = VectorIndex
      .query(h, Seq((9001L, Seq.fill(16)(0.5f))).toDF("qid", "qe"), nProbe = 4, k = 5,
        excludeSelf = false)
      .filter($"vec_id" === 9001L)
      .count()
    assert(found == 1L)
  }

  test("writer lease ownership: release never deletes a usurper's lease; heartbeat fails loudly") {
    val dir = tmpDir("vindex_lease_own")
    val leaseFile = java.nio.file.Paths.get(dir, "__writer_lease")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))

    // our lease, our token: release deletes it
    java.nio.file.Files.writeString(leaseFile, "op=append pid=1 at=1")
    val ours = VectorIndex.leaseHandle(dir, spark, "op=append pid=1 at=1")
    ours.heartbeat() // ours → refresh succeeds silently
    ours.release()
    assert(!java.nio.file.Files.exists(leaseFile), "owner release must delete its own lease")

    // stale-window takeover happened mid-op: the file now carries the
    // USURPER's token. Our release must leave it alone (deleting it would
    // hand the next op a free acquisition while the usurper still writes),
    // and our heartbeat must abort loudly instead of refreshing THEIR mtime.
    java.nio.file.Files.writeString(leaseFile, "op=retrain pid=2 at=2")
    val usurped = VectorIndex.leaseHandle(dir, spark, "op=append pid=1 at=1")
    val before = java.nio.file.Files.getLastModifiedTime(leaseFile)
    val e = intercept[IllegalStateException](usurped.heartbeat())
    assert(e.getMessage.contains("taken over"), e.getMessage)
    usurped.release()
    assert(java.nio.file.Files.exists(leaseFile), "release must not delete a usurper's lease")
    assert(java.nio.file.Files.getLastModifiedTime(leaseFile) == before,
      "a failed heartbeat must not refresh the usurper's mtime")

    // lease file GONE mid-op (takeover delete window): not provably ours —
    // heartbeat aborts, release no-ops without recreating or throwing
    java.nio.file.Files.delete(leaseFile)
    val orphan = VectorIndex.leaseHandle(dir, spark, "op=append pid=1 at=1")
    intercept[IllegalStateException](orphan.heartbeat())
    orphan.release()
    assert(!java.nio.file.Files.exists(leaseFile))
  }

  test("writer lease: a crashed holder is taken over after the staleness window") {
    val dir = tmpDir("vindex_lease_stale")
    val corpus = clustered.toDF("vec_id", "embedding")
    val h = VectorIndex.build(corpus, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    val lease = new java.io.File(dir, "__writer_lease")
    java.nio.file.Files.writeString(lease.toPath, "op=rebalance pid=99999 at=crashed")
    assert(lease.setLastModified(System.currentTimeMillis() - 3600 * 1000L))
    spark.conf.set("spark.graft.vectorIndex.leaseStaleMs", "60000") // 1 min window
    try {
      val extra = Seq((9002L, Seq.fill(16)(0.25f))).toDF("vec_id", "embedding")
      VectorIndex.append(h, extra, "vec_id", "embedding") // takes over the dead lease
      assert(!lease.exists())
    } finally spark.conf.unset("spark.graft.vectorIndex.leaseStaleMs")
  }

  test("stale-handle probes fail loudly after an out-of-band retrain/rebalance") {
    // distribution shift large enough that retrainIfDrifted really retrains
    val rnd = new Random(31)
    val centersB = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5 + 40))
    val a = clustered
    val b = (1000 until 1200).map { i =>
      (i.toLong, centersB(i % 4).map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
    val dir = tmpDir("vindex_stale_handle")
    val corpusA = a.toDF("vec_id", "embedding")
    val h0 = VectorIndex.build(corpusA, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    VectorIndex.append(h0, b.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val corpusAll = (a ++ b).toDF("vec_id", "embedding")
    // out-of-band maintenance: another session retrains; h0 predates it
    val h1 = VectorIndex.retrainIfDrifted(h0, corpusAll, "vec_id", "embedding", tolerance = 1.2)
    assert(h1.version > h0.version, "the retrain must have rolled the index forward")
    val queries = corpusA.limit(3).select($"vec_id".as("qid"), $"embedding".as("qe"))
    val e = intercept[IllegalStateException] {
      VectorIndex.query(h0, queries, nProbe = 2, k = 5).count()
    }
    assert(e.getMessage.contains("stale") && e.getMessage.contains(s"handle version ${h0.version}"),
      e.getMessage)
    val ePruned = intercept[IllegalStateException] {
      VectorIndex.scoredCandidatesPruned(h0, queries, nProbe = 2).count()
    }
    assert(ePruned.getMessage.contains("stale"), ePruned.getMessage)
    // the rolled-forward handle and a reopened one both probe fine
    assert(VectorIndex.query(h1, queries, nProbe = 2, k = 5).count() > 0)
    assert(VectorIndex.query(VectorIndex.open(spark, dir), queries, nProbe = 2, k = 5).count() > 0)
  }

  test("stale-handle MUTATIONS self-heal: append via a pre-retrain handle uses the new geometry") {
    // same setup: h0 predates an out-of-band retrain that bumped the
    // version. A mutating call must NOT encode with h0's stale codebooks
    // (mixed encodings in one list, silently wrong distances forever) —
    // freshHandle reloads on ANY version drift, not only after an
    // interrupted commit it rolled forward itself.
    val rnd = new Random(37)
    val centersB = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5 + 40))
    val a = clustered
    val b = (1000 until 1200).map { i =>
      (i.toLong, centersB(i % 4).map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
    val dir = tmpDir("vindex_stale_mutate")
    val h0 = VectorIndex.build(a.toDF("vec_id", "embedding"), "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    VectorIndex.append(h0, b.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val h1 = VectorIndex.retrainIfDrifted(
      h0, (a ++ b).toDF("vec_id", "embedding"), "vec_id", "embedding", tolerance = 1.2)
    assert(h1.version > h0.version)
    // append THROUGH THE STALE handle: a new vector near the shifted
    // distribution must still be findable as its own nearest neighbor
    // through a fresh handle (stale-codebook encoding would garble it)
    // Pin the law DIRECTLY on the written bytes, not on PQ recall (the
    // planted point is out-of-distribution, so quantization cannot be
    // relied on to rank it): the codes the stale-handle append writes
    // must equal what encoding under the FRESH post-retrain geometry
    // produces — cluster assignment from the new centroids, codes from
    // the new codebooks.
    val extra = Seq((9999L, centersB(0).map(x => (x + 3.0).toFloat).toSeq))
    VectorIndex.append(h0, extra.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val h2 = VectorIndex.open(spark, dir)
    val written = spark.read.parquet(s"$dir/postings")
      .filter($"vec_id" === 9999L)
      .select($"cluster", $"codes")
      .collect()
    assert(written.length == 1, s"appended row missing or duplicated: ${written.toSeq}")
    val expected = graft.operators.Similarity
      .pqEncode(
        extra.toDF("vec_id", "embedding")
          .withColumn("cluster",
            element_at(graft.operators.Similarity.nearestCentroids($"embedding", h2.centroids, 1), 1))
          .withColumn("rvec", {
            // residualCol's exact expression (private in VectorIndex):
            // element-wise vec − centroids[cluster], float→double widened
            val centArr = array(h2.centroids.map(c => array(c.map(lit): _*)): _*)
            zip_with($"embedding", element_at(centArr, $"cluster" + lit(1)),
              (a, b) => a.cast("double") - b)
          }),
        "rvec", h2.codebooks)
      .select($"cluster", $"codes")
      .collect()
    assert(written.head.getAs[Int]("cluster") == expected.head.getAs[Int]("cluster") &&
      written.head.getSeq[Int](1) == expected.head.getSeq[Int](1),
      s"stale-handle append used stale geometry: wrote ${written.head} expected ${expected.head}")
  }

  test("build over a crashed retrain's staging discards it (no stale roll-forward over the rebuild)") {
    val dir = tmpDir("vindex_rebuild_staging")
    val h0 = VectorIndex.build(clustered.toDF("vec_id", "embedding"), "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    // plant a crashed retrain: a meta.__retrain marker (the roll-forward
    // promise) plus staged postings that do NOT match the rebuild
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def p(x: String) = new org.apache.hadoop.fs.Path(s"$dir/$x")
    fs.mkdirs(p("postings.__retrain"))
    assert(fs.rename(p("meta"), p("meta.__retrain"))) // marker present, live meta gone
    // rebuild: must clear the staging FIRST — otherwise the next open()
    // would promote the stale staged set OVER this fresh build
    val h1 = VectorIndex.build(clustered.toDF("vec_id", "embedding"), "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    assert(!fs.exists(p("meta.__retrain")) && !fs.exists(p("postings.__retrain")))
    val q = clustered.take(3).toDF("qid", "qe")
    assert(VectorIndex.query(VectorIndex.open(spark, dir), q, nProbe = 4, k = 1).count() > 0)
  }

  test("meta swap recovery: interrupted live-meta rewrite rolls forward; corrupt meta fails loudly") {
    val dir = tmpDir("vindex_meta_swap")
    val corpus = clustered.toDF("vec_id", "embedding")
    val h = VectorIndex.build(corpus, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    val metaDir = new java.io.File(dir, "meta")
    val swapDir = new java.io.File(dir, "meta.__swap")

    // simulate a crash BETWEEN the delete and the rename of a meta swap:
    // live meta gone, fully-written staged copy present
    assert(metaDir.renameTo(swapDir))
    val reopened = VectorIndex.open(spark, dir) // recovery promotes the swap
    assert(metaDir.exists() && !swapDir.exists(), "open() must promote the staged meta")
    assert(reopened.residual == h.residual && reopened.version == h.version)

    // corrupt-present meta must be LOUD, not the silent residual=false
    // legacy fallback (which would flat-decode a residual index)
    val metaFiles = metaDir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(metaFiles.nonEmpty)
    metaFiles.foreach(f => java.nio.file.Files.writeString(f.toPath, "not parquet at all"))
    new java.io.File(metaDir, "_SUCCESS").delete()
    val e = intercept[IllegalStateException] { VectorIndex.open(spark, dir) }
    assert(e.getMessage.contains("unreadable"), e.getMessage)
  }

  test("commit-window probes fail loudly: the retrain marker supersedes live meta") {
    import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}
    def copyTree(src: JPath, dst: JPath): Unit = {
      Files.walk(src).forEach { q =>
        val t = dst.resolve(src.relativize(q))
        if (Files.isDirectory(q)) Files.createDirectories(t)
        else Files.copy(q, t, StandardCopyOption.REPLACE_EXISTING)
      }
    }
    def rmTree(d: JPath): Unit = if (Files.exists(d))
      Files.walk(d).sorted(java.util.Comparator.reverseOrder()).forEach(Files.delete(_))
    val rnd = new Random(23)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian() * 10))
    val a = (0 until 200).map { i =>
      (i.toLong, centers(i % 4).map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
    val b = (200 until 600).map { i =>
      (i.toLong, centers(i % 4).map(x => (x + rnd.nextGaussian() * 4.0).toFloat).toSeq)
    }
    val d1 = tmpDir("vindex_window_live")
    val h0 = VectorIndex.build(a.toDF("vec_id", "embedding"), "vec_id", "embedding", d1,
      kLists = 4, m = 4, ksub = 8)
    VectorIndex.append(h0, b.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val d2 = tmpDir("vindex_window_clone")
    copyTree(Paths.get(d1), Paths.get(d2))
    val h2 = VectorIndex.retrainIfDrifted(
      VectorIndex.open(spark, d2), (a ++ b).toDF("vec_id", "embedding"),
      "vec_id", "embedding", tolerance = 1.5)
    assert(h2.version == 2, "precondition: the clone's retrain fired")

    // THE WINDOW: commitRetrain swapped postings but crashed before the
    // meta swap — live meta still says v1 while meta.__retrain (v2) marks
    // the staged set authoritative. A v1 handle's probe would score the
    // NEW codes with OLD codebooks; readMeta must prefer the marker so
    // requireFresh fails loudly instead.
    val hStale = VectorIndex.open(spark, d1) // v1, pre-window
    rmTree(Paths.get(d1, "postings"))
    copyTree(Paths.get(d2, "postings"), Paths.get(d1, "postings"))
    copyTree(Paths.get(d2, "meta"), Paths.get(d1, "meta.__retrain"))
    val queries = a.take(3).toDF("vec_id", "embedding")
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val e = intercept[IllegalStateException] {
      VectorIndex.query(hStale, queries, nProbe = 2, k = 5).collect()
    }
    assert(e.getMessage.contains("stale"), e.getMessage)
    // and a reopen heals: the recovery promotes the marker set
    val healed = VectorIndex.open(spark, d1)
    assert(healed.version == 2)
    assert(VectorIndex.query(healed, queries, nProbe = 2, k = 5).count() > 0)
  }

  test("open-time recovery runs under the writer lease; healthy opens stay lock-free") {
    import java.nio.file.{Files, Paths}
    val dir = tmpDir("vindex_open_lease")
    val h = VectorIndex.build(clustered.toDF("vec_id", "embedding"), "vec_id", "embedding", dir,
      kLists = 4, m = 4, ksub = 8)
    // a held lease does NOT block a healthy open (no recovery to do)
    Files.write(Paths.get(dir, "__writer_lease"), "op=test".getBytes("UTF-8"))
    assert(VectorIndex.open(spark, dir).version == h.version)
    // but with recovery pending, open must take the lease — two sessions
    // recovering concurrently would race commitRetrain's delete+rename and
    // destroy the live postings; the holder failing fast is the contract
    Files.createDirectories(Paths.get(dir, "codebooks.__retrain"))
    val e = intercept[IllegalStateException] { VectorIndex.open(spark, dir) }
    assert(e.getMessage.contains("writer lease"), e.getMessage)
    Files.delete(Paths.get(dir, "__writer_lease"))
    assert(VectorIndex.open(spark, dir).version == h.version) // recovers + discards the stray
    assert(!Files.exists(Paths.get(dir, "codebooks.__retrain")))
  }

  test("a crashed rebuild's tombstone makes every reader refuse the mixed-generation index") {
    import java.nio.file.{Files, Paths}
    val dir = tmpDir("vindex_tomb")
    val df = clustered.toDF("vec_id", "embedding")
    val h = VectorIndex.build(df, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    Files.write(Paths.get(dir, "__rebuild"), Array.empty[Byte])
    val queries = clustered.take(3).toDF("vec_id", "embedding")
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    // probes, opens, and maintenance all refuse — the artifacts read fine
    // individually, which is exactly why only the tombstone can tell
    assert(intercept[IllegalStateException] { VectorIndex.open(spark, dir) }
      .getMessage.contains("rebuild"))
    assert(intercept[IllegalStateException] {
      VectorIndex.query(h, queries, nProbe = 2, k = 3).collect()
    }.getMessage.contains("rebuild"))
    // rebuilding (what the message says to do) clears it
    val h2 = VectorIndex.build(df, "vec_id", "embedding", dir, kLists = 4, m = 4, ksub = 8)
    assert(!Files.exists(Paths.get(dir, "__rebuild")))
    assert(VectorIndex.query(h2, queries, nProbe = 2, k = 3).count() > 0)

    // FIRST builds drop the tombstone too: a crash between the codebooks
    // write and the meta write (quantizationError runs in between) leaves
    // artifacts readMeta's pre-meta-era fallback would open as
    // residual=false — silently flat-decoding residual codes. Simulate
    // that exact crash state on a fresh dir: artifacts, no meta, tombstone.
    val dir2 = tmpDir("vindex_tomb_first")
    VectorIndex.build(df, "vec_id", "embedding", dir2, kLists = 4, m = 4, ksub = 8)
    def deleteRec(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).forEach(c => deleteRec(c))
      Files.deleteIfExists(p)
    }
    deleteRec(Paths.get(dir2, "meta"))
    Files.write(Paths.get(dir2, "__rebuild"), Array.empty[Byte])
    assert(intercept[IllegalStateException] { VectorIndex.open(spark, dir2) }
      .getMessage.contains("rebuild"),
      "a crashed FIRST build must refuse loudly, not open via the legacy no-meta fallback")
  }

  test("null embeddings never index: no NULL-adist rank-1 poisoning") {
    val dir = tmpDir("vindex_null")
    val withNulls = clustered ++ Seq((9000L, null.asInstanceOf[Seq[Float]]))
    val h = VectorIndex.build(withNulls.toDF("vec_id", "embedding"), "vec_id", "embedding", dir,
      kLists = 4, m = 4, ksub = 8)
    assert(spark.read.parquet(s"$dir/postings").filter($"vec_id" === 9000L).count() == 0,
      "a null vector must not be indexed")
    VectorIndex.append(h, Seq((9001L, null.asInstanceOf[Seq[Float]]), (9002L, clustered.head._2))
      .toDF("vec_id", "embedding"), "vec_id", "embedding")
    val posted = spark.read.parquet(s"$dir/postings")
    assert(posted.filter($"vec_id" === 9001L).count() == 0)
    assert(posted.filter($"vec_id" === 9002L).count() == 1)
    val queries = clustered.take(5).toDF("vec_id", "embedding")
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val top = VectorIndex.query(h, queries, nProbe = 4, k = 3)
    assert(top.filter($"adist".isNull).count() == 0, "no NULL distance may rank")
  }

  test("excludeSelf across incomparable id types fails loudly instead of emptying results") {
    val dir = tmpDir("vindex_idtype")
    val h = VectorIndex.build(clustered.toDF("vec_id", "embedding"), "vec_id", "embedding", dir,
      kLists = 4, m = 4, ksub = 8)
    val extQueries = clustered.take(3).map { case (id, v) => (s"q$id", v) }
      .toDF("qid", "qe")
    val e = intercept[IllegalArgumentException] {
      VectorIndex.query(h, extQueries, nProbe = 2, k = 3).collect()
    }
    assert(e.getMessage.contains("excludeSelf"), e.getMessage)
    // the documented external-set spelling works
    assert(VectorIndex.query(h, extQueries, nProbe = 2, k = 3, excludeSelf = false).count() > 0)
  }

  test("interrupted centroid-refit swap recovers: promote when live absent, discard stray") {
    import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}
    def copyTree(src: JPath, dst: JPath): Unit = {
      Files.walk(src).forEach { q =>
        val t = dst.resolve(src.relativize(q))
        if (Files.isDirectory(q)) Files.createDirectories(t)
        else Files.copy(q, t, StandardCopyOption.REPLACE_EXISTING)
      }
    }
    def rmTree(d: JPath): Unit = if (Files.exists(d))
      Files.walk(d).sorted(java.util.Comparator.reverseOrder()).forEach(Files.delete(_))
    val dir = tmpDir("vindex_centswap")
    VectorIndex.build(clustered.toDF("vec_id", "embedding"), "vec_id", "embedding", dir,
      kLists = 4, m = 4, ksub = 8)
    // crash between delete(live) and rename(stage): only the stage exists —
    // without recovery the index is bricked (k-means artifacts are not
    // regenerable); open must promote it
    copyTree(Paths.get(dir, "centroids"), Paths.get(dir, "centroids.__swap"))
    rmTree(Paths.get(dir, "centroids"))
    val h = VectorIndex.open(spark, dir)
    assert(h.centroids.length == 4)
    assert(!Files.exists(Paths.get(dir, "centroids.__swap")))
    // stray stage next to a live copy (pre-delete crash): discarded
    copyTree(Paths.get(dir, "centroids"), Paths.get(dir, "centroids.__swap"))
    assert(VectorIndex.open(spark, dir).centroids.length == 4)
    assert(!Files.exists(Paths.get(dir, "centroids.__swap")))
  }
}
