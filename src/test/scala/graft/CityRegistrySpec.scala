package graft

import graft.lake.CityRegistry

class CityRegistrySpec extends SparkSpec {
  import spark.implicits._

  test("upsert inserts, updates on conflict, preserves created_at; point lookup") {
    val root = tmpDir("cities")
    val v1 = Seq(
      ("newhaven", "New Haven", "ct", "https://gis.vgsi.com/newhavenct/", "vgsi"),
      ("hartford", "Hartford", "ct", "https://gis.vgsi.com/hartfordct/", "vgsi")
    ).toDF("city_key", "city_name", "state", "url", "type")
    CityRegistry.upsert(spark, root, v1)
    assert(CityRegistry.cityUrl(spark, root, "newhaven").contains("https://gis.vgsi.com/newhavenct/"))
    assert(CityRegistry.cityUrl(spark, root, "nowhere").isEmpty)
    val created0 = CityRegistry.load(spark, root).get
      .filter($"city_key" === "newhaven").select($"created_at").head().getTimestamp(0)

    Thread.sleep(5)
    val v2 = Seq(
      ("newhaven", "New Haven", "ct", "https://gis.vgsi.com/newhaven2ct/", "vgsi"), // changed url
      ("stamford", "Stamford", "ct", "https://gis.vgsi.com/stamfordct/", "vgsi") // new key
    ).toDF("city_key", "city_name", "state", "url", "type")
    CityRegistry.upsert(spark, root, v2)

    val after = CityRegistry.load(spark, root).get
    assert(after.count() == 3)
    assert(CityRegistry.cityUrl(spark, root, "newhaven").contains("https://gis.vgsi.com/newhaven2ct/"))
    val created1 = after.filter($"city_key" === "newhaven").select($"created_at").head().getTimestamp(0)
    assert(created1 == created0) // created_at survives the update
  }

  test("a NULL stored url is a lookup MISS, never Some(null)") {
    // the CLI's --base-url .orElse(cityUrl(...)) would treat Some(null) as
    // a hit and hand the scraper a null base URL
    val root = tmpDir("cities_null")
    CityRegistry.upsert(spark, root,
      Seq(("ghost", "Ghost", "ct", null.asInstanceOf[String], "vgsi"))
        .toDF("city_key", "city_name", "state", "url", "type"))
    assert(CityRegistry.cityUrl(spark, root, "ghost").isEmpty)
  }

  test("crashed swap: readers serve from .__old WITHOUT mutating; the next writer heals") {
    val root = tmpDir("cities")
    val v1 = Seq(("a", "A", "ct", "http://a/", "vgsi")).toDF("city_key", "city_name", "state", "url", "type")
    CityRegistry.upsert(spark, root, v1)
    // simulate a swap crash: the live dir was moved aside, new never landed
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$root/_meta/cities")
    val old = new org.apache.hadoop.fs.Path(s"$root/_meta/cities.__old")
    assert(fs.rename(p, old))
    // reads serve the stranded copy but must NOT promote it — a reader
    // cannot tell a crashed swap from a live upsert mid-window, and a
    // reader-side rename racing the writer's second rename nests the tmp
    // dir inside the restored one (silent lost update)
    assert(CityRegistry.cityUrl(spark, root, "a").contains("http://a/"))
    assert(!fs.exists(p) && fs.exists(old), "a READER must not mutate the swap state")
    // the next WRITER promotes the stranded copy and keeps its rows
    CityRegistry.upsert(spark, root,
      Seq(("b", "B", "ct", "http://b/", "vgsi")).toDF("city_key", "city_name", "state", "url", "type"))
    assert(fs.exists(p) && !fs.exists(old), "the writer heals the swap")
    assert(CityRegistry.load(spark, root).get.count() == 2)
  }
}
