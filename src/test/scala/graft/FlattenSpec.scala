package graft

import graft.lake.Lake
import graft.sources.{Building, Flatten, SubArea}
import graft.sources.vgsi.VgsiParser
import org.apache.spark.sql.functions._

/** Flatten fan-out: CNS_MAPPING construction columns + unknown-key
  * extra_fields (the reference's never-drop-fields contract for child
  * tables, vgsi/source.py:614-624), including survival through a
  * write → mergeSchema read round trip.
  */
class FlattenSpec extends SparkSpec {
  import spark.implicits._

  private val html =
    s"""<html><body><form id="form1" action="./Parcel.aspx"><span id="lblTownName">Testville</span>
    <span id="MainContent_lblPid">7</span>
    <span id="MainContent_lblBldCount">1</span>
    <span id="MainContent_ctl02_lblYearBuilt">1950</span>
    <table id="MainContent_ctl02_grdCns">
      <tr><td>Style:</td><td>Colonial</td></tr>
      <tr><td>Heat Type</td><td>Forced Air</td></tr>
      <tr><td>AC &amp; Vent</td><td>Central</td></tr>
      <tr><td>Zz Later Key</td><td>zlast</td></tr>
    </table>
    </form></body></html>"""

  test("known construction keys become typed columns; unknown keys fold into sorted extra_fields JSON") {
    val parsed = VgsiParser.parse(html, 7L)
    assert(parsed.buildings.head.construction("ac_and_vent") == "Central") // unknown key reaches flatten
    val tables = Flatten.flatten(spark.createDataset(Seq(parsed)))
    val b = tables("buildings").head()
    val get = (c: String) => b.getAs[String](c)
    assert(get("style") == "Colonial")
    assert(get("heat_type") == "Forced Air")
    assert(get("grade") == null) // known but absent -> null column, not extras
    // unknown keys only, keys sorted (json.dumps(sort_keys=True) dual)
    assert(get("extra_fields") == """{"ac_and_vent":"Central","zz_later_key":"zlast"}""")
  }

  test("interior_flr_1 / interior_floor_1 spellings coalesce last-write-wins like the reference's dict loop") {
    def bld(cns: Map[String, String]) = graft.sources.ScrapeResult(
      property = VgsiParser.parse(html, 8L).property,
      buildings = Seq(Building(0, Some(1950), None, None, None, None, None, cns,
        Seq(SubArea("BAS", None, None, None))))
    )
    val both = Flatten.flatten(spark.createDataset(Seq(
      bld(Map("interior_flr_1" -> "old", "interior_floor_1" -> "new"))
    )))("buildings").head()
    assert(both.getAs[String]("interior_floor_1") == "new")
    val onlyOld = Flatten.flatten(spark.createDataset(Seq(
      bld(Map("interior_flr_1" -> "old"))
    )))("buildings").head()
    assert(onlyOld.getAs[String]("interior_floor_1") == "old")
  }

  test("building extra_fields survive write -> mergeSchema read") {
    val root = tmpDir("lake")
    val parsed = VgsiParser.parse(html, 7L)
    val tables = Flatten.flatten(spark.createDataset(Seq(parsed)))
    Lake.append(Lake.stampMetadata(tables("buildings"), new java.sql.Timestamp(0L)), root, "tv", "buildings")
    val back = Lake.read(spark, root, "tv", "buildings")
    val row = back.filter($"pid" === 7L).select($"style", $"extra_fields").head()
    assert(row.getString(0) == "Colonial")
    assert(row.getString(1) == """{"ac_and_vent":"Central","zz_later_key":"zlast"}""")
  }

  test("in-batch uuid dedup is deterministic and never tears the parent/child snapshot") {
    // two scrapes of ONE entity (same identity -> same uuid) with
    // different content: the survivor must be the same scrape in EVERY
    // table and on every re-execution — dropDuplicates' arrival-order
    // first() could hand properties scrape A and buildings scrape B
    val a = FakeSource.prop(42L, "alice", 100.0)
    val b = FakeSource.prop(42L, "bob", 200.0)
      .copy(buildings = FakeSource.prop(42L, "bob", 200.0).buildings ++
        FakeSource.prop(42L, "bob", 200.0).buildings.map(x => x.copy(year_built = Some(1902))))
    def snapshot(): (String, Long) = {
      val t = Flatten.flatten(spark.createDataset(Seq(a, b)))
      val owner = t("properties").select($"owner").as[String].head()
      val nBuildings = t("buildings").count()
      (owner, nBuildings)
    }
    val runs = (1 to 3).map(_ => snapshot())
    assert(runs.distinct.size == 1, s"survivor must be stable across executions: $runs")
    val (owner, nb) = runs.head
    // the pair must be INTERNALLY consistent: alice has 1 building, bob 2
    assert((owner == "alice" && nb == 1L) || (owner == "bob" && nb == 2L),
      s"torn snapshot: properties from one scrape, buildings from the other ($owner, $nb)")
  }
}
