package graft.sources

/** In-flight nested scrape-result model — the typed dual of the reference's
  * per-entry result dict (/root/reference/scrapers/vgsi/source.py:571-579,
  * building nest :363-401). `Dataset[ScrapeResult]` carries this shape with
  * a product Encoder: property as a struct, children as array<struct>,
  * construction as map<string,string>.
  */
final case class SubArea(
    code: String,
    description: Option[String],
    gross_area: Option[Double],
    living_area: Option[Double]
)

final case class Building(
    bid: Int,
    year_built: Option[Int],
    building_area: Option[Double],
    replacement_cost: Option[Double],
    less_depreciation: Option[Double],
    pct_good: Option[Int],
    photo_url: Option[String],
    construction: Map[String, String],
    sub_areas: Seq[SubArea],
    sketch_url: Option[String] = None
)

final case class Ownership(
    owner: Option[String],
    sale_price: Option[Double],
    sale_date: Option[String],
    /** Unmapped grdSales columns (certificate, book & page, instrument, …)
      * as sorted-key JSON — the reference's schema-on-read keeps every
      * header-keyed value, so dropping them was silent data loss vs the
      * port target. NULL when the grid has no extra columns, and NULLs are
      * excluded from the canonical hash surface, so legacy rows' hashes
      * are unchanged.
      */
    extra_fields: Option[String] = None
)

final case class Valuation(
    valuation_year: Option[String],
    improvements: Option[Double],
    land: Option[Double],
    total: Option[Double]
)

final case class Feature(
    code: Option[String],
    sub_code: Option[String],
    description: Option[String],
    value: Option[Double]
)

/** Full typed PROPERTY_TAGS column set
  * (/root/reference/scrapers/vgsi/source.py:43-74 + land_size_acres):
  * 29 tag fields + pid + extra_fields. Fields beyond the analytic core
  * default to None so fixtures/demos stay terse. (Scala 2.13 case classes
  * over 22 fields lose tupled/unapply, which nothing here uses; Spark
  * product encoders reflect on constructor parameters and are unaffected.)
  */
final case class Property(
    pid: Long,
    town_name: Option[String],
    address: Option[String],
    owner: Option[String],
    account_number: Option[String],
    sale_price: Option[Double],
    assessment_value: Option[Double],
    appraisal_value: Option[Double],
    building_count: Option[Int],
    land_size_acres: Option[Double],
    extra_fields: Option[String],
    mblu: Option[String] = None,
    owner_address: Option[String] = None,
    co_owner: Option[String] = None,
    certificate: Option[String] = None,
    sale_date: Option[String] = None,
    book_page: Option[String] = None,
    book_label: Option[String] = None,
    book: Option[String] = None,
    page_label: Option[String] = None,
    page: Option[String] = None,
    label_instrument: Option[String] = None,
    land_use_code: Option[String] = None,
    building_use: Option[String] = None,
    land_alt_approved: Option[String] = None,
    land_zone: Option[String] = None,
    land_neighborhood_code: Option[String] = None,
    land_frontage: Option[Double] = None,
    land_depth: Option[Double] = None,
    land_assessed_value: Option[Double] = None,
    land_appraised_value: Option[Double] = None,
    zip_code: Option[String] = None
)

final case class ScrapeResult(
    property: Property,
    buildings: Seq[Building] = Nil,
    ownership: Seq[Ownership] = Nil,
    appraisals: Seq[Valuation] = Nil,
    assessments: Seq[Valuation] = Nil,
    extra_features: Seq[Feature] = Nil,
    outbuildings: Seq[Feature] = Nil
)
