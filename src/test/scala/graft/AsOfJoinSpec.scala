package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: probe events per user; right: reference quotes per user
  private def left = Seq(
    (1L, 100L, "a"), (1L, 200L, "b"), (1L, 50L, "c"),
    (2L, 100L, "d"),
    (3L, 100L, "e")
  ).toDF("user_id", "ts", "tag")

  private def right = Seq(
    (1L, 90L, 10L, 1.0), (1L, 100L, 11L, 2.0), (1L, 150L, 12L, 3.0),
    (2L, 300L, 20L, 4.0)
  ).toDF("user_id", "q_ts", "q_id", "q_val")

  test("backward picks most recent right row at-or-before each left row") {
    val out = AsOfJoin
      .backward(left, right, Seq("user_id"), "ts", "q_ts", "q_id")
      .orderBy($"user_id", $"ts")
      .select($"user_id", $"ts", $"tag", $"q_id", $"q_val")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4)))
      .toSeq
    assert(out == Seq(
      (1L, 50L, "c", -1L, -1.0),       // nothing at-or-before 50
      (1L, 100L, "a", 11L, 2.0),       // inclusive: q_ts == ts matches
      (1L, 200L, "b", 12L, 3.0),       // latest preceding
      (2L, 100L, "d", -1L, -1.0),      // right row is in the future
      (3L, 100L, "e", -1L, -1.0)       // key absent on right side
    ))
  }

  test("ties among equal right timestamps resolve to the greatest tiebreak") {
    val dupRight = Seq((1L, 100L, 5L, 1.0), (1L, 100L, 9L, 2.0)).toDF("user_id", "q_ts", "q_id", "q_val")
    val probe = Seq((1L, 100L, "x")).toDF("user_id", "ts", "tag")
    val out = AsOfJoin.backward(probe, dupRight, Seq("user_id"), "ts", "q_ts", "q_id").collect()
    assert(out.length == 1 && out.head.getAs[Long]("q_id") == 9L)
  }

  test("matches the rank-filtered inequality-join formulation on random data") {
    val rnd = new scala.util.Random(7)
    val l = Seq.tabulate(300)(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toLong)).toDF("k", "ts", "lid")
    val r = Seq.tabulate(300)(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toLong, rnd.nextDouble())).toDF("k", "r_ts", "rid", "v")
    val fast = AsOfJoin.backward(l, r, Seq("k"), "ts", "r_ts", "rid")
      .select($"k", $"ts", $"lid", $"rid")
    // naive: inequality join + top-1 per left row (BroadcastNestedLoopJoin — fine at test scale)
    val joined = l.join(r, l("k") === r("k") && r("r_ts") <= l("ts"), "left")
      .select(l("k"), $"ts", $"lid", $"r_ts", $"rid")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lid").orderBy($"r_ts".desc_nulls_last, $"rid".desc_nulls_last)
    val naive = joined.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"k", $"ts", $"lid", $"rid")
    val a = fast.orderBy($"lid").collect().toSeq
    val b = naive.orderBy($"lid").collect().toSeq
    assert(a == b)
  }

  test("a NULL right timestamp matches nothing (at-or-before semantics, not nulls-first)") {
    import spark.implicits._
    val l = Seq((1L, 100L, 10L)).toDF("k", "ts", "lid")
    val r = Seq((1L, Option.empty[Long], 5L)).toDF("k", "r_ts", "rid")
    val out = AsOfJoin.backward(l, r, Seq("k"), "ts", "r_ts", "rid").collect()
    assert(out.length == 1 && out.head.isNullAt(3), "null-ts right row must not attach")
  }

  test("fractional tiebreaks keep their native precision; NULL keys follow equi-join semantics") {
    // the old cast("long") collided 2.9 and 2.1 on tie=2 and the pick
    // became partition-layout-dependent
    val left = Seq(("k", 10L)).toDF("k", "ts")
    val right = Seq(("k", 5L, 2.1, "low"), ("k", 5L, 2.9, "high"))
      .toDF("k", "rts", "tie", "pay")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", "tie")
      .select($"pay").as[String].head()
    assert(got == "high", s"greatest NATIVE tie must win: $got")
    // NULL keys: a null-keyed left row attaches nothing; a null-keyed
    // right row matches nothing (the window's partitionBy WOULD have
    // grouped them together)
    val lN = Seq((null.asInstanceOf[String], 10L), ("k", 10L)).toDF("k", "ts")
    val rN = Seq((null.asInstanceOf[String], 5L, 1.0, "ghost"), ("k", 5L, 1.0, "real"))
      .toDF("k", "rts", "tie", "pay")
    val rows = AsOfJoin.backward(lN, rN, Seq("k"), "ts", "rts", "tie")
      .select($"k", $"pay").collect()
      .map(r => Option(r.getString(0)) -> Option(r.getString(1))).toMap
    assert(rows(Some("k")).contains("real"))
    assert(rows(None).isEmpty, s"NULL = NULL must not match: $rows")
  }

  test("a non-numeric tiebreak column is rejected instead of silently cast to NULL") {
    import spark.implicits._
    val l = Seq((1L, 100L, 10L)).toDF("k", "ts", "lid")
    val r = Seq((1L, 50L, "uuid-a")).toDF("k", "r_ts", "rid")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, Seq("k"), "ts", "r_ts", "rid")
    }
    assert(e.getMessage.contains("numeric"))
  }

  test("plan has no nested-loop join — single hash shuffle + window") {
    val plan = AsOfJoin.backward(left, right, Seq("user_id"), "ts", "q_ts", "q_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
