package graft.sources

import graft.functions.Canonical
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Flattening — the Spark dual of the reference's table-generating
  * `flatten_fn` UDTF (/root/reference/scrapers/vgsi/source.py:587-639):
  * one nested `Dataset[ScrapeResult]` fans out to 8 relational DataFrames
  * via `explode`, each child carrying the `(property_uuid, pid)` FK pair
  * (source.py:529-569,629-634).
  *
  * The deterministic `uuid` is derived once on the property struct
  * (MD5(pid + canonical JSON), source.py:182-194) and propagated to
  * children by the explode — no join needed.
  *
  * Everything is narrow (select/explode): zero shuffles; flattening runs at
  * scan speed no matter the corpus size, and each output table is written
  * independently.
  */
object Flatten {

  /** Business columns of the property struct (metadata excluded per
    * /root/reference/src/engine/hash.py:7-24) — the full typed
    * PROPERTY_TAGS set.
    */
  private val propertyHashFields = Seq(
    "town_name", "address", "owner", "account_number", "sale_price",
    "assessment_value", "appraisal_value", "building_count",
    "land_size_acres", "extra_fields",
    "mblu", "owner_address", "co_owner", "certificate", "sale_date",
    "book_page", "book_label", "book", "page_label", "page",
    "label_instrument", "land_use_code", "building_use",
    "land_alt_approved", "land_zone", "land_neighborhood_code",
    "land_frontage", "land_depth", "land_assessed_value",
    "land_appraised_value", "zip_code"
  )

  /** Deliberate divergence from the reference: vgsi/source.py:332 derives
    * the uuid from pid + the FULL parsed content dict, so any content change
    * mints a new uuid — silently detaching the uuid-keyed SCD2 history the
    * same file queries (source.py:813-837). We keep the uuid contract
    * (deterministic MD5 of pid + canonical JSON, order-independent) but feed
    * it only the entity's immutable identity (pid, town_name), so version
    * chains stay attached across re-scrapes.
    */
  private val identityFields = Seq("town_name")

  def flatten(ds: Dataset[ScrapeResult]): Map[String, DataFrame] = {
    val base = ds.toDF()
    val canon = Canonical.canonicalJsonOf(
      ("pid" -> col("property.pid")) +:
        identityFields.map(f => f -> col(s"property.$f")): _*
    )
    // U2 — in-batch dedup on uuid BEFORE fan-out (the reference's
    // seen_uuids skip, vgsi/source.py:595-601): a duplicate scrape of one
    // entity within a batch is dropped entirely — children included.
    val withUuid = base
      .withColumn("uuid", Canonical.deterministicUuid(col("property.pid"), canon))
      .dropDuplicates("uuid")

    val properties = withUuid.select(
      col("uuid") +: col("property.pid").as("pid") +:
        propertyHashFields.map(f => col(s"property.$f").as(f)): _*
    )

    def child(arrayCol: String, fields: Seq[String]): DataFrame = {
      val exploded = withUuid
        .select(col("uuid").as("property_uuid"), col("property.pid").as("pid"), explode(col(arrayCol)).as("c"))
      exploded.select(
        col("property_uuid") +: col("pid") +: fields.map(f => col(s"c.$f").as(f)): _*
      )
    }

    // construction map → JSON string column (unknown keys preserved —
    // the extra_fields escape hatch of vgsi/source.py:614-624)
    val buildings = withUuid
      .select(col("uuid").as("property_uuid"), col("property.pid").as("pid"), explode(col("buildings")).as("c"))
      .select(
        col("property_uuid"),
        col("pid"),
        col("c.bid").as("bid"),
        col("c.year_built").as("year_built"),
        col("c.building_area").as("building_area"),
        col("c.replacement_cost").as("replacement_cost"),
        col("c.less_depreciation").as("less_depreciation"),
        col("c.pct_good").as("pct_good"),
        col("c.photo_url").as("photo_url"),
        col("c.sketch_url").as("sketch_url"),
        when(size(map_keys(col("c.construction"))) > 0, to_json(col("c.construction")))
          .otherwise(lit(null).cast("string"))
          .as("construction_json")
      )

    val subAreas = withUuid
      .select(col("uuid").as("property_uuid"), col("property.pid").as("pid"), explode(col("buildings")).as("b"))
      .select(col("property_uuid"), col("pid"), col("b.bid").as("bid"), explode(col("b.sub_areas")).as("s"))
      .select(
        col("property_uuid"), col("pid"), col("bid"),
        col("s.code").as("code"), col("s.description").as("description"),
        col("s.gross_area").as("gross_area"), col("s.living_area").as("living_area")
      )
      // drop empty-code rows (the "Total" footer skip, vgsi/source.py:444-446)
      .filter(col("code").isNotNull && col("code") =!= "")

    Map(
      "properties" -> properties,
      "buildings" -> buildings,
      "sub_areas" -> subAreas,
      "ownership" -> child("ownership", Seq("owner", "sale_price", "sale_date")),
      "appraisals" -> child("appraisals", Seq("valuation_year", "improvements", "land", "total")),
      "assessments" -> child("assessments", Seq("valuation_year", "improvements", "land", "total")),
      "extra_features" -> child("extra_features", Seq("code", "sub_code", "description", "value")),
      "outbuildings" -> child("outbuildings", Seq("code", "sub_code", "description", "value"))
    )
  }
}
