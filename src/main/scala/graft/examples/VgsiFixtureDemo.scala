package graft.examples

import graft.GraftSession
import graft.ingest.{Engine, IngestConfig}
import graft.lake.Lake
import graft.sources.vgsi.VgsiSource

/** Drives the full VGSI path — fetch → parse → flatten → lake — through the
  * public API with fixture HTML standing in for the network (the reference
  * test suite's pattern; this environment is zero-egress by design).
  *
  * Run: sbt "runMain graft.examples.VgsiFixtureDemo /tmp/vgsi_lake"
  */
object VgsiFixtureDemo {

  def fixtureHtml(pid: Long): String =
    if (pid % 7 == 0)
      // every 7th pid is an invalid parcel -> error form
      s"""<html><form id="form1" action="./Error.aspx?Message=There+was+an+error+loading+the+parcel."></form></html>"""
    else s"""
      <html><body><form id="form1" action="./Parcel.aspx">
      <span id="lblTownName">Fixtureville</span>
      <span id="MainContent_lblPid">$pid</span>
      <span id="MainContent_lblLocation">$pid ELM ST</span>
      <span id="MainContent_lblGenOwner">OWNER $pid</span>
      <span id="MainContent_lblPrice">$$${pid * 1000},000.00</span>
      <span id="MainContent_lblGenAssessment">$$${pid * 700},000</span>
      <span id="MainContent_lblBldCount">1</span>
      <span id="MainContent_lblLndAcres">0.${pid % 9 + 1}</span>
      <span id="MainContent_lblZip">0651$pid</span>
      <span id="MainContent_ctl02_lblYearBuilt">19${50 + pid % 40}</span>
      <span id="MainContent_ctl02_lblBldArea">${pid},500</span>
      <table id="MainContent_ctl02_grdCns">
        <tr><td>Style:</td><td>Colonial</td></tr>
        <tr><td>Heat Type:</td><td>Forced Air</td></tr>
      </table>
      <table id="MainContent_ctl02_grdSub">
        <tr><th>Code</th><th>Description</th><th>Gross Area</th><th>Living Area</th></tr>
        <tr><td>BAS</td><td>Base</td><td>1,${pid}00</td><td>900</td></tr>
        <tr><td></td><td>Total</td><td>1,${pid}00</td><td>900</td></tr>
      </table>
      <table id="MainContent_grdSales">
        <tr><th>Owner</th><th>Sale Price</th><th>Sale Date</th></tr>
        <tr><td>OWNER $pid</td><td>$$${pid * 1000},000</td><td>01/0$pid/2020</td></tr>
      </table>
      </form></body></html>"""

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/vgsi_fixture_lake")
    val spark = GraftSession.local(4, 4)
    import spark.implicits._

    val source = VgsiSource("https://fixture.test/", (_, pid) => fixtureHtml(pid), ratePerSec = 0)
    val stats = Engine.runLoad(spark, source, 1L to 9L, root, "fixtureville",
      IngestConfig(workers = 2, checkpoint = false))
    println(s"scraped=${stats.scraped} invalid=${stats.invalid} errors=${stats.errors}")
    println(s"written=${stats.rowsWritten.toSeq.sorted.filter(_._2 > 0)}")

    val props = Lake.read(spark, root, "fixtureville", "properties")
    props
      .select($"pid", $"owner", $"sale_price", $"assessment_value", $"land_size_acres", $"extra_fields")
      .orderBy($"pid")
      .show(4, truncate = false)
    Lake.read(spark, root, "fixtureville", "buildings")
      .select($"pid", $"year_built", $"building_area", $"construction_json")
      .orderBy($"pid")
      .show(3, truncate = false)
    Lake.read(spark, root, "fixtureville", "ownership")
      .select($"pid", $"owner", $"sale_price", $"sale_date")
      .orderBy($"pid")
      .show(3, truncate = false)
    spark.stop()
  }
}
