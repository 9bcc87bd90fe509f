package graft

import graft.scd.Scd
import org.apache.spark.sql.functions._

/** SCD2 query-time semantics — mirrors the reference's versioning scenarios
  * (/root/reference/tests/test_database.py:465-562).
  */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  // (uuid, scraped_at-ordinal, row_hash, value)
  private def lake = Seq(
    ("u1", 1, "h1", 100),
    ("u1", 2, "h1", 100), // unchanged re-scrape
    ("u1", 3, "h2", 200), // changed
    ("u2", 1, "h9", 900)
  ).toDF("uuid", "t", "row_hash", "value")

  test("currentState returns latest row per key (W1)") {
    val cur = Scd.currentState(lake, $"uuid", $"t")
    val got = cur.select($"uuid", $"value").as[(String, Int)].collect().toMap
    assert(got == Map("u1" -> 200, "u2" -> 900))
  }

  test("qualify filters by a window predicate (DuckDB QUALIFY sugar)") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"uuid").orderBy($"t".desc)
    val cur = Scd.qualify(lake, row_number().over(w) === 1)
    assert(cur.columns.toSeq == lake.columns.toSeq) // helper column dropped
    val got = cur.select($"uuid", $"value").as[(String, Int)].collect().toMap
    assert(got == Map("u1" -> 200, "u2" -> 900))
    // agrees with currentState on the same lake
    assert(cur.collect().toSet == Scd.currentState(lake, $"uuid", $"t").collect().toSet)
  }

  test("withVersions numbers only content changes (W2+W3)") {
    val v = Scd.withVersions(lake, $"uuid", $"row_hash", $"t")
    val got = v.select($"uuid", $"t", $"version").as[(String, Int, Int)].collect().toSet
    // u1: t=1 (v1), t=3 (v2) — the t=2 duplicate content is not a version
    assert(got == Set(("u1", 1, 1), ("u1", 3, 2), ("u2", 1, 1)))
  }

  test("history for one entity is version-ordered (W4)") {
    val h = Scd.history(lake, $"uuid", "u1", $"row_hash", $"t")
    assert(h.select($"version").as[Int].collect().toSeq == Seq(1, 2))
  }

  test("changedSince returns only real changes after cutoff (W5)") {
    val c = Scd.changedSince(lake, $"uuid", $"row_hash", lit(2), $"t")
    val got = c.select($"uuid", $"t").as[(String, Int)].collect().toSeq
    assert(got == Seq(("u1", 3))) // t=2 is unchanged content; u2 never changed
  }

  test("refreshDedup drops rows whose hash already exists (J2)") {
    val incoming = Seq(("u1", 4, "h2", 200), ("u1", 5, "h3", 300)).toDF("uuid", "t", "row_hash", "value")
    val kept = Scd.refreshDedup(incoming, lake)
    assert(kept.select($"row_hash").as[String].collect().toSeq == Seq("h3"))
  }

  test("fieldChanges reports the exact changed columns, null-safely") {
    val obs = Seq(
      ("u1", 1, Some("a"), Some(10)),
      ("u1", 2, Some("a"), Some(20)), // value changed
      ("u1", 3, None, Some(20)), // name -> null (null-safe: a change)
      ("u1", 4, None, Some(20)) // nothing changed
    ).toDF("uuid", "t", "name", "value")
    val got = Scd
      .fieldChanges(obs, $"uuid", Seq("name", "value"), $"t")
      .select($"t", $"is_first", $"changed_fields")
      .as[(Int, Boolean, Seq[String])]
      .collect()
      .sortBy(_._1)
      .toSeq
    assert(got == Seq(
      (1, true, Nil),
      (2, false, Seq("value")),
      (3, false, Seq("name")),
      (4, false, Nil)
    ))
  }

  test("upsert keeps newest row per key (S9)") {
    val base = Seq(("k1", 1, "old"), ("k2", 1, "keep")).toDF("key", "t", "v")
    val updates = Seq(("k1", 2, "new"), ("k3", 1, "ins")).toDF("key", "t", "v")
    val got = Scd
      .upsert(base, updates, $"key", $"t")
      .select($"key", $"v")
      .as[(String, String)]
      .collect()
      .toMap
    assert(got == Map("k1" -> "new", "k2" -> "keep", "k3" -> "ins"))
  }

  test("upsert: updates beat base at order ties; duplicate update keys resolve stably") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-06-01 00:00:00")
    val base = Seq(("k1", "https://old.example.org/", t0)).toDF("city_key", "url", "updated_at")
    val updates = Seq(("k1", "https://new.example.org/", t0)).toDF("city_key", "url", "updated_at")
    // ON CONFLICT DO UPDATE always takes the update — CityRegistry stamps
    // a whole batch with ONE timestamp, so the tie is the normal case
    val won = Scd.upsert(base, updates, $"city_key", $"updated_at")
      .select($"url").as[String].head()
    assert(won == "https://new.example.org/", s"the update must win the tie, got $won")
    // duplicate keys WITHIN one updates batch at the same order value:
    // stable winner across runs (content-hash tiebreak, not arrival order)
    val dups = Seq(
      ("k2", "https://a.example.org/", t0),
      ("k2", "https://b.example.org/", t0)).toDF("city_key", "url", "updated_at")
    val winners = (1 to 3).map { _ =>
      Scd.upsert(base, dups, $"city_key", $"updated_at")
        .filter($"city_key" === "k2").select($"url").as[String].head()
    }
    assert(winners.distinct.size == 1, s"tie winner must be run-stable: $winners")
  }
}
