package graft.sources.vgsi

import graft.ingest.InvalidEntryException
import graft.sources._

/** VGSI parcel-page parser — behavioral port of the reference's parse layer
  * (/root/reference/scrapers/vgsi/source.py:256-579): span-indexed property
  * extraction with the PROPERTY_TAGS mapping, indexed building blocks with
  * construction/sub-area tables, generic normalized-header tables with
  * "No Data" sentinel, money/int/float coercion, unknown-span capture into
  * extra_fields.
  *
  * All 30 PROPERTY_TAGS land in typed [[Property]] columns; genuinely
  * unknown MainContent_lbl* spans are preserved — never dropped — in the
  * extra_fields JSON (queryable with from_json). The lake tolerates schema
  * drift regardless (mergeSchema).
  */
object VgsiParser {

  val PropertyTags: Map[String, String] = Map(
    "MainContent_lblPid" -> "pid",
    "MainContent_lblAcctNum" -> "account_number",
    "MainContent_lblMblu" -> "mblu",
    "lblTownName" -> "town_name",
    "MainContent_lblLocation" -> "address",
    "MainContent_lblGenOwner" -> "owner",
    "MainContent_lblAddr1" -> "owner_address",
    "MainContent_lblCoOwner" -> "co_owner",
    "MainContent_lblPrice" -> "sale_price",
    "MainContent_lblCertificate" -> "certificate",
    "MainContent_lblSaleDate" -> "sale_date",
    "MainContent_lblBp" -> "book_page",
    "MainContent_lblBookLabel" -> "book_label",
    "MainContent_lblBook" -> "book",
    "MainContent_lblPageLabel" -> "page_label",
    "MainContent_lblPage" -> "page",
    "MainContent_lblInstrument" -> "label_instrument",
    "MainContent_lblGenAssessment" -> "assessment_value",
    "MainContent_lblGenAppraisal" -> "appraisal_value",
    "MainContent_lblBldCount" -> "building_count",
    "MainContent_lblUseCode" -> "land_use_code",
    "MainContent_lblUseCodeDescription" -> "building_use",
    "MainContent_lblAltApproved" -> "land_alt_approved",
    "MainContent_lblZone" -> "land_zone",
    "MainContent_lblNbhd" -> "land_neighborhood_code",
    "MainContent_lblLndFront" -> "land_frontage",
    "MainContent_lblDepth" -> "land_depth",
    "MainContent_lblLndAsmt" -> "land_assessed_value",
    "MainContent_lblLndAppr" -> "land_appraised_value",
    "MainContent_lblZip" -> "zip_code"
  )

  private val LandSizeIds = Seq("MainContent_lblLndSize", "MainContent_lblLndAcres")
  private val KnownSpanIds = PropertyTags.keySet ++ LandSizeIds

  val ErrorAction = "./Error.aspx?Message=There+was+an+error+loading+the+parcel."

  // --- coercions (F1-F5, source.py:134-174) ---
  def cleanString(v: String): Option[String] = Option(v).map(_.trim).filter(_.nonEmpty)
  def money(v: String): Option[Double] =
    cleanString(v).map(_.replace("$", "").replace(",", "")).flatMap(s => s.toDoubleOption)
  def toDouble(v: String): Option[Double] = cleanString(v).flatMap(_.toDoubleOption)
  // integer-ONLY parse, the reference's `_handle_int` exactly
  // (source.py:160-168 — `int('75.0')` raises, so a fractional pct_good
  // stores None there; a via-double parse here would store Some(75) and
  // the two lakes' row hashes would silently diverge on such pages)
  def toInt(v: String): Option[Int] = cleanString(v).flatMap(_.toIntOption)
  def normalizeHeader(h: String): String =
    // Locale.ROOT — header-derived keys must not vary with the host locale
    h.trim.toLowerCase(java.util.Locale.ROOT).stripSuffix(":").replace(" ", "_").replace("&", "and")

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def toJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s""""${jsonEscape(k)}": "${jsonEscape(v)}"""" }
      .mkString("{", ", ", "}")

  /** Throws [[InvalidEntryException]] when the page is the VGSI error form
    * (source.py:225-228).
    */
  def checkValid(html: String, pid: Long): Unit =
    Html.attrOf(html, "form", "id", "form1", "action").foreach { action =>
      if (action == ErrorAction) throw new InvalidEntryException(s"PID $pid doesn't exist")
    }

  def parse(html: String, pid: Long): ScrapeResult = {
    checkValid(html, pid)
    val spans = Html.spanIndex(html)

    val raw: Map[String, String] = PropertyTags.flatMap { case (id, field) =>
      spans.get(id).map(field -> _)
    }
    val landSize = LandSizeIds.collectFirst { case id if spans.contains(id) => spans(id) }

    // unknown MainContent_lbl* spans → extra_fields (never dropped,
    // vgsi/source.py:301-311); all known tags land in typed columns
    val unknownSpans = spans.collect {
      case (id, t) if id.startsWith("MainContent_lbl") && !KnownSpanIds(id) && t.nonEmpty => id -> t
    }
    val extraJson = if (unknownSpans.nonEmpty) Some(toJson(unknownSpans)) else None

    def str(f: String): Option[String] = raw.get(f).flatMap(cleanString)
    def mon(f: String): Option[Double] = raw.get(f).flatMap(money)

    val property = Property(
      pid = pid,
      town_name = str("town_name"),
      address = str("address"),
      owner = str("owner"),
      account_number = str("account_number"),
      sale_price = mon("sale_price"),
      assessment_value = mon("assessment_value"),
      appraisal_value = mon("appraisal_value"),
      building_count = raw.get("building_count").flatMap(toInt),
      land_size_acres = landSize.flatMap(toDouble),
      extra_fields = extraJson,
      mblu = str("mblu"),
      owner_address = str("owner_address"),
      co_owner = str("co_owner"),
      certificate = str("certificate"),
      sale_date = str("sale_date"),
      book_page = str("book_page"),
      book_label = str("book_label"),
      book = str("book"),
      page_label = str("page_label"),
      page = str("page"),
      label_instrument = str("label_instrument"),
      land_use_code = str("land_use_code"),
      building_use = str("building_use"),
      land_alt_approved = str("land_alt_approved"),
      land_zone = str("land_zone"),
      land_neighborhood_code = str("land_neighborhood_code"),
      land_frontage = raw.get("land_frontage").flatMap(toDouble),
      land_depth = raw.get("land_depth").flatMap(toDouble),
      land_assessed_value = mon("land_assessed_value"),
      land_appraised_value = mon("land_appraised_value"),
      zip_code = str("zip_code")
    )

    val buildings = parseBuildings(html, spans, property.building_count.getOrElse(0))

    ScrapeResult(
      property = property,
      buildings = buildings,
      ownership = tableRows(html, "MainContent_grdSales").map { r =>
        // unmapped sales-grid columns (certificate, book & page,
        // instrument, …) ride extra_fields JSON instead of being dropped:
        // the reference's parse_table_rows keeps every header-keyed value
        // (schema-on-read), so a typed model that discards them loses
        // ownership-history data the reference lake carries
        val extras = r.view.filterKeys(k => !Set("owner", "sale_price", "sale_date")(k)).toMap
        Ownership(
          owner = r.get("owner").flatMap(cleanString),
          sale_price = r.get("sale_price").flatMap(money),
          sale_date = r.get("sale_date").flatMap(cleanString),
          extra_fields = if (extras.nonEmpty) Some(toJson(extras)) else None
        )
      },
      appraisals = tableRows(html, "MainContent_grdHistoryValuesAppr").map(valuation),
      assessments = tableRows(html, "MainContent_grdHistoryValuesAsmt").map(valuation),
      extra_features = tableRows(html, "MainContent_grdXf").map(feature),
      outbuildings = tableRows(html, "MainContent_grdOb").map(feature)
    )
  }

  private def valuation(r: Map[String, String]): Valuation = Valuation(
    valuation_year = r.get("valuation_year").orElse(r.get("year")).flatMap(cleanString),
    improvements = r.get("improvements").flatMap(money),
    land = r.get("land").flatMap(money),
    total = r.get("total").flatMap(money)
  )

  private def feature(r: Map[String, String]): Feature = Feature(
    code = r.get("code").flatMap(cleanString),
    sub_code = r.get("sub_code").flatMap(cleanString),
    description = r.get("description").flatMap(cleanString),
    value = r.get("value").orElse(r.get("assessed_value")).flatMap(money)
  )

  /** Indexed building blocks: zero-padded two-digit prefixes
    * MainContent_ctl02..ctl09, ctl10, ... probing up to building_count+3
    * slots; a block with neither year nor area is skipped
    * (source.py:340-411). DELIBERATE DIVERGENCE from the reference's
    * literal `"ctl0" + str(i)` (source.py:350): that spelling yields
    * "ctl010"/"ctl011" for slots >= 10, which can never match ASP.NET's
    * actual zero-padded auto-ids (ctl10, ctl11, ...), so the reference
    * silently drops every building past the 8th on large parcels (condo
    * complexes) with no error. %02d matches both ranges.
    */
  def parseBuildings(html: String, spans: Map[String, String], buildingCount: Int): Seq[Building] =
    (0 until buildingCount + 3).flatMap { bid =>
      val prefix = f"MainContent_ctl${bid + 2}%02d"
      val year = spans.get(s"${prefix}_lblYearBuilt")
      val area = spans.get(s"${prefix}_lblBldArea")
      if (year.isEmpty && area.isEmpty) None
      else {
        val photo = Html
          .attrOf(html, "img", "id", s"${prefix}_imgPhoto", "src")
          .filter(src => src.nonEmpty && !src.toLowerCase.contains("default.jpg"))
        Some(
          Building(
            bid = bid,
            year_built = year.flatMap(toInt),
            building_area = area.map(_.replace(",", "")).flatMap(toDouble),
            replacement_cost = spans.get(s"${prefix}_lblRcn").flatMap(money),
            less_depreciation = spans.get(s"${prefix}_lblRcnld").flatMap(money),
            pct_good = spans.get(s"${prefix}_lblPctGood").flatMap(toInt),
            photo_url = photo,
            construction = parseConstruction(html, prefix),
            sub_areas = parseSubAreas(html, prefix),
            sketch_url = Html.attrOf(html, "img", "alt", "Building Layout", "src")
          )
        )
      }
    }

  /** Key/value construction table — td cells only, like the reference's
    * `tr.find_all("td")` (source.py:414-431): a th header row contributes
    * nothing.
    */
  def parseConstruction(html: String, prefix: String): Map[String, String] =
    Html
      .tableRows(html, s"${prefix}_grdCns", cellTags = "td")
      .getOrElse(Nil)
      .collect {
        case cells if cells.length >= 2 && cells(1).trim.nonEmpty =>
          normalizeHeader(cells.head) -> cells(1).trim
      }
      .toMap

  /** Sub-area rows; empty code (the "Total" footer) skipped
    * (source.py:434-459). Body cells are td-ONLY like the reference's
    * `tr.find_all("td")` and the sibling [[parseConstruction]]: a
    * footer/label th (`<th>Total:</th>`) must neither shift every column
    * left by one nor smuggle a non-empty "Total:" code past the
    * empty-code filter — with td-only cells such a row drops to < 4
    * cells and is skipped, exactly as the reference skips it.
    */
  def parseSubAreas(html: String, prefix: String): Seq[SubArea] =
    Html.tableRows(html, s"${prefix}_grdSub").getOrElse(Nil) match {
      case rows if rows.length < 2 => Nil
      case _ =>
        // the th+td list above proves a header row exists; the body is
        // re-read td-only (the header row yields an empty cell list,
        // dropped by tail — the tableRows pattern)
        Html.tableRows(html, s"${prefix}_grdSub", cellTags = "td")
          .getOrElse(Nil)
          .tail
          .collect {
            case cells if cells.length >= 4 && cells.head.trim.nonEmpty =>
              SubArea(
                code = cells.head.trim,
                description = cleanString(cells(1)),
                gross_area = toDouble(cells(2).replace(",", "")),
                living_area = toDouble(cells(3).replace(",", ""))
              )
          }
    }

  /** Generic normalized-header table (source.py:462-501): header row
    * normalized (lowercase, spaces→_, &→and), "No Data" sentinel → empty,
    * all-empty rows dropped. Returns raw string maps; the money coercion
    * that the reference does inline here happens in the typed converters
    * ([[valuation]]/[[feature]]/ownership mapping) instead.
    */
  def tableRows(html: String, tableId: String): Seq[Map[String, String]] = {
    if (Html.tableText(html, tableId).exists(_.contains("No Data"))) return Nil
    // headers from the first row's th+td (reference rows[0].find_all(["th",
    // "td"])); body values from td only (reference tr.find_all("td"))
    Html.tableRows(html, tableId).getOrElse(Nil) match {
      case rows if rows.length < 2 => Nil
      case rows =>
        val headers = rows.head.map(normalizeHeader)
        if (headers.isEmpty) Nil
        else {
          // same <tr> list, td-only cells: the header row yields an empty
          // cell list and is dropped by tail; any other all-th row filters
          // out as an empty map
          Html.tableRows(html, tableId, cellTags = "td")
            .getOrElse(Nil)
            .tail
            .map(cells => headers.zip(cells).filter(_._2.trim.nonEmpty).toMap)
            .filter(_.nonEmpty)
        }
    }
  }

  def vgsiUrl(baseUrl: String, pid: Long): String = s"${baseUrl}Parcel.aspx?pid=$pid"
}
