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
    sub_areas: Seq[SubArea]
)

final case class Ownership(
    owner: Option[String],
    sale_price: Option[Double],
    sale_date: Option[String]
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
    extra_fields: Option[String]
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
