package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Bucketized interval join ≡ the naive non-equi join, including bucket-
  * boundary edges (point on a bucket edge, interval spanning buckets,
  * inclusive endpoints, empty matches).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval equals naive BETWEEN join across bucket boundaries") {
    val points = Seq(
      (1L, 0L), (2L, 9L), (3L, 10L), (4L, 15L), (5L, 19L), (6L, 20L), (7L, 35L), (8L, 99L)
    ).toDF("pid", "t")
    val intervals = Seq(
      (100L, 0L, 9L),   // exactly one bucket (width 10)
      (200L, 5L, 25L),  // spans 3 buckets
      (300L, 10L, 10L), // degenerate single-point on a bucket edge
      (400L, 36L, 40L), // matches nothing
      (500L, 18L, 21L)  // crosses one boundary
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin
      .pointInInterval(points, "t", intervals, "lo", "hi", bucketWidth = 10L)
      .select($"pid", $"iid")
      .as[(Long, Long)].collect().toSet
    val naive = points
      .join(intervals, $"t" >= $"lo" && $"t" <= $"hi")
      .select($"pid", $"iid")
      .as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(naive.contains((1L, 100L)) && naive.contains((3L, 300L)) && naive.contains((6L, 500L)))
    assert(!naive.exists(_._2 == 400L))
  }

  test("column collision between sides is rejected") {
    val p = Seq((1L, 2L)).toDF("t", "x")
    val iv = Seq((1L, 2L, 3L)).toDF("lo", "hi", "x")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, "t", iv, "lo", "hi", 10L)
    }
  }

  test("intervalOverlap equals the naive overlap join and emits each pair exactly once") {
    val a = Seq(
      (1L, 0L, 9L),   // one bucket
      (2L, 5L, 35L),  // spans 4 buckets
      (3L, 40L, 40L), // degenerate point on a bucket edge
      (4L, 90L, 95L)  // overlaps nothing
    ).toDF("aid", "a_lo", "a_hi")
    val b = Seq(
      (10L, 8L, 12L),  // crosses a boundary; overlaps 1 and 2
      (20L, 30L, 45L), // overlaps 2 and 3 — shares MULTIPLE buckets with 2
      (30L, 50L, 60L)  // overlaps nothing
    ).toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin
      .intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", bucketWidth = 10L)
      .select($"aid", $"bid")
      .as[(Long, Long)].collect().toSeq // NOT a set: duplicates must show up
    val naive = a
      .join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select($"aid", $"bid")
      .as[(Long, Long)].collect().toSet
    assert(got.size == got.toSet.size, s"pair emitted more than once: $got")
    assert(got.toSet == naive)
    assert(naive == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L)))
  }

  test("an inverted interval (end < start) matches nothing — never a descending bucket blowup") {
    val points = Seq(Tuple1(5L)).toDF("p")
    val ivs = Seq((100L, 0L, "corrupt"), (0L, 10L, "ok")).toDF("s", "e", "tag")
    val got = RangeJoin.pointInInterval(points, "p", ivs, "s", "e", 4L)
      .select($"tag").as[String].collect().toSeq
    assert(got == Seq("ok"),
      "generate_series semantics: an inverted interval generates NOTHING " +
        s"(sequence() would have auto-stepped -1 into O(range) buckets): $got")
  }

  test("property: random intervals — bucketized results equal naive for several widths") {
    val rnd = new scala.util.Random(42)
    def randIntervals(n: Int, tag: String) = (1 to n).map { i =>
      val lo = rnd.nextInt(200).toLong
      (i.toLong, lo, lo + rnd.nextInt(40).toLong)
    }
    for (trial <- 1 to 3; width <- Seq(1L, 7L, 64L, 1000L)) {
      val a = randIntervals(40, "a").toDF("aid", "a_lo", "a_hi")
      val b = randIntervals(40, "b").toDF("bid", "b_lo", "b_hi")
      val got = RangeJoin
        .intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", width)
        .select($"aid", $"bid").as[(Long, Long)].collect().toSeq
      val naive = a
        .join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
        .select($"aid", $"bid").as[(Long, Long)].collect().toSet
      assert(got.size == got.toSet.size, s"trial $trial width $width: duplicate emission")
      assert(got.toSet == naive, s"trial $trial width $width")

      val pts = randIntervals(60, "p").map(t => (t._1, t._2)).toDF("pid", "t")
      val gotP = RangeJoin
        .pointInInterval(pts, "t", b, "b_lo", "b_hi", width)
        .select($"pid", $"bid").as[(Long, Long)].collect().toSet
      val naiveP = pts
        .join(b, $"t" >= $"b_lo" && $"t" <= $"b_hi")
        .select($"pid", $"bid").as[(Long, Long)].collect().toSet
      assert(gotP == naiveP, s"trial $trial width $width (points)")
    }
  }

  test("property: NEGATIVE bounds — floor division buckets correctly around zero") {
    // SQL DIV truncates toward zero, merging buckets -1 and 0; the floor-
    // division fix must make spans straddling zero behave like any other
    val rnd = new scala.util.Random(7)
    def randIntervals(n: Int) = (1 to n).map { i =>
      val lo = (rnd.nextInt(200) - 100).toLong // [-100, 100)
      (i.toLong, lo, lo + rnd.nextInt(40).toLong)
    }
    for (trial <- 1 to 3; width <- Seq(1L, 7L, 64L)) {
      val a = randIntervals(40).toDF("aid", "a_lo", "a_hi")
      val b = randIntervals(40).toDF("bid", "b_lo", "b_hi")
      val got = RangeJoin
        .intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", width)
        .select($"aid", $"bid").as[(Long, Long)].collect().toSeq
      val naive = a
        .join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
        .select($"aid", $"bid").as[(Long, Long)].collect().toSet
      assert(got.size == got.toSet.size, s"trial $trial width $width: duplicate emission")
      assert(got.toSet == naive, s"trial $trial width $width")

      val pts = randIntervals(60).map(t => (t._1, t._2)).toDF("pid", "t")
      val gotP = RangeJoin
        .pointInInterval(pts, "t", b, "b_lo", "b_hi", width)
        .select($"pid", $"bid").as[(Long, Long)].collect().toSet
      val naiveP = pts
        .join(b, $"t" >= $"b_lo" && $"t" <= $"b_hi")
        .select($"pid", $"bid").as[(Long, Long)].collect().toSet
      assert(gotP == naiveP, s"trial $trial width $width (points)")
    }
  }
}
