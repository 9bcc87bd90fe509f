package graft

import graft.scd.Scd
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style SCD invariants over generated append-only histories:
  * whatever the observation pattern, currentState is one-row-per-entity with
  * the max timestamp, version numbering is dense and change-aligned, and
  * refreshDedup is idempotent.
  */
class ScdPropertySpec extends SparkSpec {
  import spark.implicits._

  // generated lake: entities observe a random walk of content values over
  // ordered timestamps (duplicates common — re-scrapes of unchanged pages)
  private def genLake(seed: Long): Seq[(String, Int, String)] = {
    val g = for {
      nEntities <- Gen.choose(3, 12)
      rows <- Gen.sequence[Seq[Seq[(String, Int, String)]], Seq[(String, Int, String)]](
        (1 to nEntities).map { e =>
          for {
            n <- Gen.choose(1, 15)
            contents <- Gen.listOfN(n, Gen.choose(0, 3)) // small alphabet -> many dups
          } yield contents.zipWithIndex.map { case (c, t) => (s"e$e", t, s"h$c") }
        }
      )
    } yield rows.flatten
    g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Seq(("e1", 1, "h1")))
  }

  private def invariants(seed: Long): Unit = {
    val rows = genLake(seed)
    val df = rows.toDF("uuid", "t", "row_hash")
    val nEntities = rows.map(_._1).distinct.size

    // W1: one row per entity, carrying that entity's max t
    val cur = Scd.currentState(df, $"uuid", $"t").select($"uuid", $"t").as[(String, Int)].collect().toMap
    assert(cur.size == nEntities)
    val maxT = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    assert(cur == maxT)

    // W3: versions dense from 1, count == number of content changes + 1 per entity
    val versions = Scd
      .withVersions(df, $"uuid", $"row_hash", $"t")
      .select($"uuid", $"version")
      .as[(String, Int)]
      .collect()
    val perEntity = versions.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    rows.groupBy(_._1).foreach { case (e, obs) =>
      val ordered = obs.sortBy(_._2).map(_._3)
      val changes = 1 + ordered.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
      assert(perEntity(e) == (1 to changes), s"entity $e: ${perEntity(e)} vs $changes changes")
    }

    // J2: anti-join drops everything on self; idempotent on disjoint sets
    assert(Scd.refreshDedup(df, df).count() == 0)
    val once = Scd.refreshDedup(df.withColumn("row_hash", concat($"row_hash", lit("x"))), df)
    assert(once.count() == rows.size)
  }

  test("SCD invariants hold across generated histories") {
    Seq(1L, 7L, 42L, 1234L, 99999L).foreach(invariants)
  }
}
