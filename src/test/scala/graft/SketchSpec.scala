package graft

import org.apache.spark.sql.functions._

/** Cross-validation for the approximation queries (q39/q84 are rows-only in
  * the driver's oracle check because sketch estimates legitimately differ
  * across engines): estimates must land within the configured error bound
  * of the exact answers, and sketch UNION must equal sketch-of-union.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables(spark, "/root/testdata/sf0.001").documents

  test("per-source HLL estimates match exact distinct counts within the bound") {
    val exact = docs.groupBy($"source").agg(countDistinct($"doc_id").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = docs.groupBy($"source")
      .agg(hll_sketch_estimate(hll_sketch_agg($"doc_id", lit(14))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (src, x) =>
      assert(math.abs(est(src) - x).toDouble / x < 0.05, s"$src: est ${est(src)} vs exact $x")
    }
  }

  test("union of per-source sketches equals the estimate over the whole corpus") {
    val viaUnion = docs.groupBy($"source").agg(hll_sketch_agg($"doc_id", lit(14)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk"))).head().getLong(0)
    val direct = docs.agg(hll_sketch_estimate(hll_sketch_agg($"doc_id", lit(14)))).head().getLong(0)
    assert(viaUnion == direct, s"merge must be lossless: $viaUnion vs $direct")
    val exact = docs.select($"doc_id").distinct().count()
    assert(math.abs(viaUnion - exact).toDouble / exact < 0.05)
  }

  test("the mergeable-sketch query exposes per-source rows plus the union row") {
    val out = SparkEntry.queries("q84_mergeable_sketches")(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    val all = rows.filter(_.getString(0) == "__all__")
    assert(all.length == 1 && rows.length == 21) // 20 sources + union row
    assert(all.head.getLong(2) == 500L)          // n sums exactly
  }
}
