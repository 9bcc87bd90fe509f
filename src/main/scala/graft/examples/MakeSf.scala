package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize a k×-scaled copy of a TESTDATA scale-factor directory — the
  * sf1 bench point: the headline suite has only ever run at sf0.1, and the
  * shuffle-inventory claims in docs/SCALE.md deserve a data point where
  * exchanges dominate scan setup. The driver's generator is not available
  * to re-seed, so the scale-up derives from the largest committed SF the
  * way ScaleBench's corpora do — replication that preserves each query's
  * PROBLEM GEOMETRY, never verbatim duplication where an operator would
  * see it:
  *
  *  - relational tables replicate with per-copy key offsets sized to the
  *    base table's key space, so foreign keys stay within-copy consistent
  *    (orders⋈lineitem⋈part/supplier/customer all resolve) and key
  *    cardinalities grow exactly k× — the join/agg cost model of a real
  *    sf1. Non-key attributes repeat across copies, which matches TPC-H
  *    itself (attribute domains are fixed; only keys scale).
  *  - documents get ScaleBench's fold-bijective substitution cipher (no
  *    manufactured cross-copy near-dups — a verbatim copy would hand every
  *    dedup operator a quadratic duplicate blow-up the real corpus does
  *    not have), embeddings its coordinate rotation, events its disjoint
  *    URL/user spaces. region/nation copy as-is (fixed dimension tables at
  *    every TPC-H scale).
  *
  * Usage: runMain graft.examples.MakeSf [baseSfDir] [outDir] [k]
  * (defaults: /root/testdata/sf0.1 → java.io.tmpdir/graft_sf1 at k=10 —
  * i.e. sf1: ~6M lineitem, 1.5M orders, 150k customers, 50k docs).
  * Idempotent via the same base-fingerprint _READY marker as ScaleBench.
  */
object MakeSf {

  private def replicate(df: DataFrame, k: Int, offsets: (String, Long)*): DataFrame =
    (0 until k).map { c =>
      if (c == 0) df
      else offsets.foldLeft(df) { case (d, (key, span)) =>
        d.withColumn(key, col(key) + c * span)
      }
    }.reduce(_ unionByName _)

  /** (mtime:length) of every base table the corpus derives from — a
    * lineitem-only fingerprint let a regenerated documents.parquet reuse a
    * stale scaled corpus labeled fresh, so the two-point bench compared
    * DIFFERENT corpora across scales.
    */
  private[examples] def baseFingerprint(baseDir: String, tables: Seq[String]): String =
    tables.map { t =>
      val f = new java.io.File(s"$baseDir/$t.parquet")
      s"$t=${f.lastModified}:${f.length}"
    }.mkString(",")

  private val BaseTables = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def materialize(spark: SparkSession, baseDir: String, outDir: String, k: Int): String = {
    val marker = new java.io.File(s"$outDir/_READY")
    val baseFp = baseFingerprint(baseDir, BaseTables)
    val tag = s"$baseDir@$baseFp*$k#v4" // v4: full-base fingerprint
    val fresh = marker.exists() &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == tag
    if (fresh) return outDir

    def read(t: String) = spark.read.parquet(s"$baseDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    // key spans = the base table's key-space size (keys are 0..n-1 in the
    // committed testdata; asserted so a regenerated layout cannot silently
    // produce overlapping copies)
    def span(df: DataFrame, key: String): Long = {
      val r = df.agg(min(col(key)).cast("long"), max(col(key)).cast("long")).head()
      require(r.getLong(0) == 0L, s"$key does not start at 0 — offsets would collide")
      r.getLong(1) + 1L
    }
    val (customer, supplier, part, orders, lineitem) =
      (read("customer"), read("supplier"), read("part"), read("orders"), read("lineitem"))
    val nCust = span(customer, "c_custkey")
    val nSupp = span(supplier, "s_suppkey")
    val nPart = span(part, "p_partkey")
    val nOrd = span(orders, "o_orderkey")

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(replicate(customer, k, "c_custkey" -> nCust), "customer")
    write(replicate(supplier, k, "s_suppkey" -> nSupp), "supplier")
    write(replicate(part, k, "p_partkey" -> nPart), "part")
    write(replicate(orders, k, "o_orderkey" -> nOrd, "o_custkey" -> nCust), "orders")
    write(
      replicate(lineitem, k,
        "l_orderkey" -> nOrd, "l_partkey" -> nPart, "l_suppkey" -> nSupp),
      "lineitem")
    // events: disjoint event_id spaces (q156/q159's URL key is
    // event_id DIV 4 — ScaleBench's scaleEvents semantics: a bigger web,
    // not deeper histories) and disjoint user spaces (funnel/retention see
    // k× users with the base behavior, not users with k× duplicate events).
    // The fixed strides carry the same silent-collision risk span() guards
    // against for the relational keys, so assert the base fits them — a
    // regenerated larger base (or chaining MakeSf onto a prior scaled
    // output, where event_id reaches k×1e9) would otherwise merge copy
    // c's URL/user histories into copy c+1's with no error.
    val events = read("events")
    val (evStride, usrStride) = (1000000000L, 100000000L)
    locally {
      val r = events.agg(
        min(col("event_id")).cast("long"), max(col("event_id")).cast("long"),
        min(col("user_id")).cast("long"), max(col("user_id")).cast("long")).head()
      require(r.getLong(0) >= 0L && r.getLong(1) < evStride,
        s"event_id range [${r.getLong(0)}, ${r.getLong(1)}] exceeds the $evStride copy stride")
      require(r.getLong(2) >= 0L && r.getLong(3) < usrStride,
        s"user_id range [${r.getLong(2)}, ${r.getLong(3)}] exceeds the $usrStride copy stride")
    }
    write(replicate(events, k, "event_id" -> evStride, "user_id" -> usrStride), "events")
    // CONTIGUOUS doc/vec id spaces (per-copy stride = base row count), not
    // ScaleBench's disjoint 100M ones: the media fixtures pack doc_id into
    // bounded code spaces (audio tones < 7^6, video frames < 8^7) and a
    // 100M offset overflows them — measured as q115/q127 failing at sf1.
    // Contiguous ids are also what the driver's own sf scaling produces.
    val nDocs = span(read("documents"), "doc_id")
    // the contiguous embeddings stride silently requires vec_id ⊂ [0, nDocs)
    // (base pairs vec_id i with doc_id i — see the embeddings note below);
    // assert it instead of trusting today's 1999 < 5000 layout
    locally {
      val r = read("embeddings")
        .agg(min(col("vec_id")).cast("long"), max(col("vec_id")).cast("long")).head()
      require(r.getLong(0) >= 0L && r.getLong(1) < nDocs,
        s"vec_id range [${r.getLong(0)}, ${r.getLong(1)}] escapes the documents stride $nDocs")
    }
    write(ScaleBench.scaleDocs(spark, baseDir, k, idOffset = nDocs), "documents")
    // embeddings replicate with the DOCUMENTS' stride, not their own row
    // count: the base corpus pairs vec_id i with doc_id i (vecs 0..1999 of
    // docs 0..4999), and queries join on vec_id = doc_id (q76's metadata
    // filter). A per-copy offset of nVecs (2000) would hand copy-1's
    // vectors the ids of copy-0's docs 2000..4999 — a scrambled
    // doc-embedding association, not a k-scaled copy of the base problem.
    // The resulting vec_id gaps (c·5000 + 0..1999) are harmless: nothing
    // packs vec_id into a bounded code space (that constraint is doc_id's,
    // see above).
    write(ScaleBench.scaleEmbeddings(spark, baseDir, k, idOffset = nDocs), "embeddings")
    java.nio.file.Files.write(marker.toPath, tag.getBytes("UTF-8"))
    outDir
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir =
      if (args.length > 1) args(1) else s"${sys.props("java.io.tmpdir")}/graft_sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val dir = materialize(spark, baseDir, outDir, k)
    println(s"""{"make_sf":"$dir","k":$k,"base":"$baseDir"}""")
    spark.stop()
  }
}
