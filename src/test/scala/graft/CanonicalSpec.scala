package graft

import graft.functions.Canonical
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Canonical hash / UUID properties — the Spark analogues of the reference's
  * determinism tests (/root/reference/tests/test_scraper.py:77-111,
  * tests/test_database.py:565-585).
  */
class CanonicalSpec extends SparkSpec {
  import spark.implicits._

  test("rowHash is deterministic and 32 hex chars") {
    val df = Seq(("a", 1), ("b", 2)).toDF("name", "v")
    val h1 = df.select(Canonical.rowHash(df).as("h")).as[String].collect()
    val h2 = df.select(Canonical.rowHash(df).as("h")).as[String].collect()
    assert(h1.toSeq == h2.toSeq)
    assert(h1.forall(_.matches("[0-9a-f]{32}")))
  }

  test("rowHash is field-order independent") {
    val df1 = Seq(("x", 1.5)).toDF("name", "v")
    val df2 = Seq((1.5, "x")).toDF("v", "name")
    val h1 = df1.select(Canonical.rowHash(df1).as("h")).as[String].head()
    val h2 = df2.select(Canonical.rowHash(df2).as("h")).as[String].head()
    assert(h1 == h2)
  }

  test("rowHash drops NULLs (row with null == row without the field)") {
    val withNull = Canonical.canonicalJsonOf("a" -> lit("x"), "b" -> lit(null).cast("string"))
    val without = Canonical.canonicalJsonOf("a" -> lit("x"))
    val r = spark.range(1).select(withNull.as("wn"), without.as("wo")).head()
    assert(r.getString(0) == r.getString(1))
  }

  test("rowHash excludes metadata columns") {
    val df1 = Seq(("a", "2024-01-01")).toDF("name", "scraped_at")
    val df2 = Seq(("a", "2099-12-31")).toDF("name", "scraped_at")
    val h1 = df1.select(Canonical.rowHash(df1).as("h")).as[String].head()
    val h2 = df2.select(Canonical.rowHash(df2).as("h")).as[String].head()
    assert(h1 == h2)
  }

  test("content change changes the hash; pid participates in content") {
    val a = spark.range(1).select(Canonical.rowHashOf("pid" -> lit(1), "v" -> lit("x")).as("h")).as[String].head()
    val b = spark.range(1).select(Canonical.rowHashOf("pid" -> lit(2), "v" -> lit("x")).as("h")).as[String].head()
    val c = spark.range(1).select(Canonical.rowHashOf("pid" -> lit(1), "v" -> lit("y")).as("h")).as[String].head()
    assert(a != b && a != c && b != c)
  }

  test("deterministicUuid has UUID shape for generated pids") {
    val pids = Gen
      .listOfN(20, Gen.choose(0L, 1000000L))
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(Seq(1L, 2L, 3L))
    val df = pids.toDF("pid")
    val us = df.select(Canonical.deterministicUuid($"pid", lit("{}")).as("u")).as[String].collect()
    assert(us.forall(_.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
    assert(us.distinct.length == pids.distinct.length)
  }

  test("uuidFromHex: NULL digest yields NULL, never the empty-string identity") {
    // concat_ws skips null arguments, so a null digest (null pid
    // upstream) used to produce "" — collapsing every null-keyed row
    // onto one shared identity instead of a NULL the caller can handle
    val out = Seq(Tuple1(null.asInstanceOf[String])).toDF("h")
      .select(Canonical.uuidFromHex($"h")).head()
    assert(out.isNullAt(0), s"null digest must map to NULL, got '${out.get(0)}'")
  }

  test("money parser: strip $/commas, empty/garbage -> NULL") {
    val df = Seq("$350,000.00", " 12.5 ", "", "abc", null).toDF("m")
    val got = df.select(Canonical.money($"m").as("v")).as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(350000.0), Some(12.5), None, None, None))
  }

  test("cleanString trims and nullifies empties") {
    val df = Seq("  x ", "", "   ", null).toDF("s")
    val got = df.select(Canonical.cleanString($"s").as("v")).as[Option[String]].collect().toSeq
    assert(got == Seq(Some("x"), None, None, None))
  }

  test("normalizeName: lowercase, spaces->_, &->and, strip colon") {
    assert(Canonical.normalizeName("Sale Price:") == "sale_price")
    assert(Canonical.normalizeName("Heat & AC") == "heat_and_ac")
  }
}
