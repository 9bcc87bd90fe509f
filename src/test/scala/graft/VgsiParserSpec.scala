package graft

import graft.ingest.InvalidEntryException
import graft.sources.vgsi.{Html, VgsiParser, VgsiSource}
import org.scalatest.funsuite.AnyFunSuite

/** Parser unit tests with inline HTML fixtures mirroring the reference's
  * suite (/root/reference/tests/test_scraper.py:114-652).
  */
class VgsiParserSpec extends AnyFunSuite {

  private def page(body: String) =
    s"""<html><body><form id="form1" action="./Parcel.aspx"><span id="lblTownName">Testville</span>$body</form></body></html>"""

  private val propertyPage = page("""
    <span id="MainContent_lblPid">42</span>
    <span id="MainContent_lblAcctNum"> ACC-99 </span>
    <span id="MainContent_lblLocation">12 MAIN ST</span>
    <span id="MainContent_lblGenOwner">DOE JOHN</span>
    <span id="MainContent_lblPrice">$350,000.00</span>
    <span id="MainContent_lblGenAssessment">$210,500</span>
    <span id="MainContent_lblGenAppraisal">$320,000.50</span>
    <span id="MainContent_lblBldCount">1</span>
    <span id="MainContent_lblLndAcres">1.50</span>
    <span id="MainContent_lblSaleDate">05/15/2020</span>
    <span id="MainContent_lblNewMystery">surprise value</span>
    <span id="MainContent_ctl02_lblYearBuilt">1950</span>
    <span id="MainContent_ctl02_lblBldArea">2,000</span>
    <span id="MainContent_ctl02_lblRcn">$400,000</span>
    <span id="MainContent_ctl02_lblRcnld">$350,000</span>
    <span id="MainContent_ctl02_lblPctGood">85</span>
    <img id="MainContent_ctl02_imgPhoto" src="photos/42.jpg"/>
    <table id="MainContent_ctl02_grdCns">
      <tr><td>Style:</td><td>Colonial</td></tr>
      <tr><td>Heat Type</td><td>Forced Air</td></tr>
      <tr><td>AC &amp; Vent</td><td>Central</td></tr>
      <tr><td>Empty Val:</td><td></td></tr>
    </table>
    <table id="MainContent_ctl02_grdSub">
      <tr><th>Code</th><th>Description</th><th>Gross Area</th><th>Living Area</th></tr>
      <tr><td>BAS</td><td>Base</td><td>1,000</td><td>800</td></tr>
      <tr><td></td><td>Total</td><td>1,000</td><td>800</td></tr>
    </table>
    <table id="MainContent_grdSales">
      <tr><th>Owner</th><th>Sale Price</th><th>Sale Date</th></tr>
      <tr><td>DOE JOHN</td><td>$350,000</td><td>05/15/2020</td></tr>
      <tr><td>SMITH A</td><td></td><td>01/01/1999</td></tr>
    </table>
    <table id="MainContent_grdHistoryValuesAppr">
      <tr><th>Valuation Year</th><th>Improvements</th><th>Land</th><th>Total</th></tr>
      <tr><td>2023</td><td>$200,000</td><td>$100,000</td><td>$300,000</td></tr>
    </table>
    <table id="MainContent_grdXf">
      <tr><th>Code</th><th>Description</th><th>Value</th></tr>
      <tr><td colspan="3">No Data for Parcel</td></tr>
    </table>
  """)

  test("property fields parse with money/int/float coercion") {
    val r = VgsiParser.parse(propertyPage, 42L)
    val p = r.property
    assert(p.pid == 42L)
    assert(p.town_name.contains("Testville"))
    assert(p.account_number.contains("ACC-99")) // trimmed
    assert(p.address.contains("12 MAIN ST"))
    assert(p.owner.contains("DOE JOHN"))
    assert(p.sale_price.contains(350000.0))
    assert(p.assessment_value.contains(210500.0))
    assert(p.appraisal_value.contains(320000.5))
    assert(p.building_count.contains(1))
    assert(p.land_size_acres.contains(1.5))
  }

  test("unknown MainContent_lbl spans preserved in extra_fields; known tags typed") {
    val r = VgsiParser.parse(propertyPage, 42L)
    val extra = r.property.extra_fields.get
    assert(extra.contains(""""MainContent_lblNewMystery": "surprise value""""))
    assert(!extra.contains("sale_date")) // known tag is a typed column now
    assert(r.property.sale_date.contains("05/15/2020"))
  }

  test("building parses with comma-number area and photo url") {
    val b = VgsiParser.parse(propertyPage, 42L).buildings.head
    assert(b.bid == 0)
    assert(b.year_built.contains(1950))
    assert(b.building_area.contains(2000.0))
    assert(b.replacement_cost.contains(400000.0))
    assert(b.less_depreciation.contains(350000.0))
    assert(b.pct_good.contains(85))
    assert(b.photo_url.contains("photos/42.jpg"))
  }

  test("default.jpg photo becomes None") {
    val html = page("""
      <span id="MainContent_lblBldCount">1</span>
      <span id="MainContent_ctl02_lblYearBuilt">1990</span>
      <img id="MainContent_ctl02_imgPhoto" src="images/default.jpg"/>""")
    assert(VgsiParser.parse(html, 1L).buildings.head.photo_url.isEmpty)
  }

  test("construction table: normalized keys, empty values dropped") {
    val cns = VgsiParser.parse(propertyPage, 42L).buildings.head.construction
    assert(cns == Map("style" -> "Colonial", "heat_type" -> "Forced Air", "ac_and_vent" -> "Central"))
  }

  test("construction table th header row contributes nothing (td-only, like the reference)") {
    val html = page("""
      <span id="MainContent_lblBldCount">1</span>
      <span id="MainContent_ctl02_lblYearBuilt">1990</span>
      <table id="MainContent_ctl02_grdCns">
        <tr><th>Field</th><th>Value</th></tr>
        <tr><td>Style:</td><td>Ranch</td></tr>
      </table>""")
    val cns = VgsiParser.parse(html, 1L).buildings.head.construction
    assert(cns == Map("style" -> "Ranch")) // no phantom "field" -> "Value"
  }

  test("sub-areas skip the empty-code Total footer") {
    val subs = VgsiParser.parse(propertyPage, 42L).buildings.head.sub_areas
    assert(subs.map(_.code) == Seq("BAS"))
    assert(subs.head.gross_area.contains(1000.0))
    assert(subs.head.living_area.contains(800.0))
  }

  test("sales table: normalized headers, empty cells null, both rows kept") {
    val own = VgsiParser.parse(propertyPage, 42L).ownership
    assert(own.length == 2)
    assert(own.head.owner.contains("DOE JOHN"))
    assert(own.head.sale_price.contains(350000.0))
    assert(own.head.sale_date.contains("05/15/2020"))
    assert(own(1).sale_price.isEmpty)
  }

  test("appraisals parse; No Data sentinel yields empty extra_features") {
    val r = VgsiParser.parse(propertyPage, 42L)
    assert(r.appraisals.head == graft.sources.Valuation(Some("2023"), Some(200000.0), Some(100000.0), Some(300000.0)))
    assert(r.extra_features.isEmpty)
  }

  test("error-form page raises InvalidEntryException") {
    val html =
      s"""<html><form id="form1" action="${VgsiParser.ErrorAction}"></form></html>"""
    intercept[InvalidEntryException](VgsiParser.parse(html, 7L))
  }

  test("zero/absent building count yields no buildings when no spans") {
    val r = VgsiParser.parse(page("""<span id="MainContent_lblPid">1</span>"""), 1L)
    assert(r.buildings.isEmpty)
  }

  test("attrOf: a data-src attribute cannot answer for src (hyphen is not a word boundary)") {
    // lazy-loading markup serves data-src before the real src; \b matches
    // after a hyphen, so the old pattern returned the placeholder
    val html = """<img id="MainContent_ctl02_imgPhoto" data-src="lazy.gif" src="photo123.jpg">"""
    assert(Html.attrOf(html, "img", "id", "MainContent_ctl02_imgPhoto", "src")
      .contains("photo123.jpg"))
  }

  test("html text extraction: nested tags, entities, whitespace") {
    assert(Html.text("<b>Hello</b>&nbsp;<i>World &amp; Co</i>") == "Hello World & Co")
    assert(Html.textById("<span id=\"x\">  a  <br/> b </span>", "span", "x").contains("a b"))
  }

  test("city list regex extracts city keys from index hrefs (S8)") {
    val html = """
      <a href="https://gis.vgsi.com/newhavenct/">New Haven</a>
      <a href="https://gis.vgsi.com/hartfordct/">Hartford</a>
      <a href="https://other.com/nothere/">x</a>"""
    val cities = VgsiSource.parseCityList(html)
    assert(cities("newhaven") == "https://gis.vgsi.com/newhavenct/")
    assert(cities("hartford") == "https://gis.vgsi.com/hartfordct/")
    assert(cities.size == 2)
  }

  test("numeric character references decode and NBSP folds away (BS4 text parity)") {
    // real VGSI pages emit &#160; after money fields: left literal it
    // rides into money() and turns the parsed number into None
    val html = "<span id=\"MainContent_lblGenAssessment\">$253,700&#160;</span>"
    val got = Html.textById(html, "span", "MainContent_lblGenAssessment")
    assert(got.contains("$253,700"), s"got $got")
    assert(got.flatMap(VgsiParser.money).contains(253700.0))
    assert(Html.text("O&#39;Brien&#x2019;s") == "O'Brien\u2019s")
    // out-of-range and surrogate references stay literal, never a crash
    assert(Html.text("&#1114112; &#55296; &#xD800;") == "&#1114112; &#55296; &#xD800;")
    // double-escapes still decode exactly one layer
    assert(Html.decode("&amp;#60;") == "&#60;")
    // raw NBSP (already decoded upstream) trims like BS4's get_text(strip=True)
    assert(Html.text("42\u00A0") == "42")
  }

  test("hyphenated attributes and custom elements never satisfy the selectors") {
    // data-id must not be read as id (hyphen is a \b word boundary — the
    // trap the guards exist for), wherever it sits relative to the real id
    assert(Html.spanIndex("<span id=\"real\" data-id=\"x\">42</span>") == Map("real" -> "42"))
    assert(Html.spanIndex("<span data-id=\"x\" id=\"real\">42</span>") == Map("real" -> "42"))
    // <span-x> is not a span
    assert(Html.spanIndex("<span-x id=\"nope\">1</span-x><span id=\"y\">2</span>") == Map("y" -> "2"))
    // same guard on attrOf's selector side
    assert(Html.attrOf("<img data-id=\"p\" id=\"photo\" src=\"a.jpg\">", "img", "id", "photo", "src")
      .contains("a.jpg"))
    assert(Html.attrOf("<img data-id=\"p\" src=\"a.jpg\">", "img", "id", "p", "src").isEmpty)
  }

  test("toInt is integer-only, the reference's _handle_int exactly") {
    assert(VgsiParser.toInt("75").contains(75))
    assert(VgsiParser.toInt(" 75 ").contains(75))
    assert(VgsiParser.toInt("-3").contains(-3))
    // int('75.0') raises ValueError in the reference -> None; a via-double
    // parse here would make the two lakes' row hashes diverge
    assert(VgsiParser.toInt("75.0").isEmpty)
    assert(VgsiParser.toInt("1,000").isEmpty)
    assert(VgsiParser.toInt(null).isEmpty)
    assert(VgsiParser.toInt("  ").isEmpty)
  }

  test("parseCities mirrors the reference: gis-link filter, whole-href search, name+state") {
    val html = """
      <a href="/contact">Contact</a>
      <a href="https://gis.vgsi.com/newhavenct/Default.aspx">New Haven</a>
      <a href="https://gis.vgsi.com/hartfordct/">Hartford</a>
      <a href="https://example.com/westhartfordct/">Nope</a>"""
    val cities = VgsiSource.parseCities(html)
    // '/contact' matches the bare city regex ('conta'+'ct') and a real
    // link's LAST path segment is Default.aspx: only filter-then-search-
    // the-whole-href (the reference's exact selection) gets both right
    assert(cities.map(_._1) == Seq("newhaven", "hartford"), s"got $cities")
    assert(cities.head ==
      (("newhaven", "New Haven", "ct", "https://gis.vgsi.com/newhavenct/Default.aspx")))
    assert(VgsiSource.parseCityList(html) == Map(
      "newhaven" -> "https://gis.vgsi.com/newhavenct/Default.aspx",
      "hartford" -> "https://gis.vgsi.com/hartfordct/"))
  }

  test("sub-area body cells are td-only: a th footer/label row cannot shift columns or forge a code") {
    val html = """
      <span id="MainContent_lblPid">7</span>
      <span id="MainContent_ctl02_lblYearBuilt">1980</span>
      <table id="MainContent_ctl02_grdSub">
        <tr><th>Code</th><th>Description</th><th>Gross Area</th><th>Living Area</th></tr>
        <tr><td>BAS</td><td>Base</td><td>1,000</td><td>800</td></tr>
        <tr><th>Total:</th><td></td><td>2,400</td><td>1,800</td></tr>
        <tr><th>Label</th><td>FOP</td><td>Porch</td><td>120</td></tr>
      </table>
    """
    val subs = VgsiParser.parseSubAreas(html, "MainContent_ctl02")
    // the reference's tr.find_all("td") sees 3 cells in both th-led rows
    // and skips them (<4); a th+td read minted SubArea(code="Total:",
    // gross_area=2400) and shifted the label row's columns left by one
    assert(subs.map(_.code) == Seq("BAS"), subs.toString)
    assert(subs.head.gross_area.contains(1000.0))
  }

  test("buildings at slots >= 10 parse via zero-padded ctl ids (the reference drops them)") {
    // a 9-building parcel: slot 8 -> ctl10 under ASP.NET's zero-padded
    // auto-ids; the reference's literal "ctl0"+str probe looks for
    // "ctl010" and silently loses every building past the 8th
    val spans9 = (0 until 9).map { b =>
      val p = f"MainContent_ctl${b + 2}%02d"
      s"""<span id="${p}_lblYearBuilt">${1950 + b}</span>
          <span id="${p}_lblBldArea">${1000 + b}</span>"""
    }.mkString("\n")
    val html = s"""<span id="MainContent_lblPid">9</span>$spans9"""
    val bs = VgsiParser.parseBuildings(html, graft.sources.vgsi.Html.spanIndex(html), 9)
    assert(bs.length == 9, s"expected all 9 buildings, got ${bs.map(_.bid)}")
    assert(bs.map(_.year_built.get) == (1950 until 1959))
    assert(bs.last.bid == 8) // the slot the reference's ctl010 probe loses
  }

  test("ownership keeps unmapped sales-grid columns as extra_fields JSON") {
    val html = """
      <span id="MainContent_lblPid">11</span>
      <span id="MainContent_lblAddress">1 Elm</span>
      <table id="MainContent_grdSales">
        <tr><th>Owner</th><th>Sale Price</th><th>Certificate</th><th>Book &amp; Page</th><th>Instrument</th><th>Sale Date</th></tr>
        <tr><td>DOE JOHN</td><td>$350,000</td><td>C-12</td><td>1024/ 33</td><td>WD</td><td>05/15/2020</td></tr>
        <tr><td>SMITH A</td><td>$100</td><td></td><td></td><td></td><td>01/01/1999</td></tr>
      </table>
    """
    val r = VgsiParser.parse(html, 11L)
    val first = r.ownership.head
    assert(first.owner.contains("DOE JOHN") && first.sale_price.contains(350000.0))
    val extras = first.extra_fields.getOrElse(fail("extra_fields must carry the unmapped columns"))
    assert(extras.contains("\"certificate\": \"C-12\""), extras)
    assert(extras.contains("book_and_page") && extras.contains("instrument"), extras)
    // a row with no extra values carries NULL (and hashes like a legacy row)
    assert(r.ownership(1).extra_fields.isEmpty, r.ownership(1).toString)
  }
}
