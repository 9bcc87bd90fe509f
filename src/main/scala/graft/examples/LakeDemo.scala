package graft.examples

import graft.GraftSession
import graft.ingest.{Engine, IngestConfig, Source}
import graft.lake.{Checkpoints, Lake}
import graft.scd.Scd
import graft.sources._
import org.apache.spark.sql.functions._

/** Usage example + demo driver: the full lake lifecycle through the public
  * API — load a scope from a (fake) source, refresh with one changed entity,
  * then answer the reference's flagship queries (current state, history,
  * changed-since) over the append-only lake.
  *
  * Run: sbt "runMain graft.examples.LakeDemo /tmp/demo_lake"
  */
object LakeDemo {

  private final class DemoSource(change: Boolean) extends Source {
    override def name = "demo"
    override def ratePerSec = 0
    override def scrapeOne(pid: Long): ScrapeResult = {
      val value = if (change && pid == 3) 999999.0 else 1000.0 * pid
      ScrapeResult(
        property = Property(
          pid = pid,
          town_name = Some("Demoville"),
          address = Some(s"$pid Main St"),
          owner = Some(s"Owner $pid"),
          account_number = Some(s"ACC$pid"),
          sale_price = Some(value * 1.1),
          assessment_value = Some(value),
          appraisal_value = Some(value * 1.05),
          building_count = Some(1),
          land_size_acres = Some(0.5),
          extra_fields = None
        ),
        buildings = Seq(
          Building(0, Some(1950), Some(2000.0), None, None, Some(85), None,
            Map("style" -> "Colonial"), Seq(SubArea("BAS", None, Some(1000.0), Some(800.0))))
        )
      )
    }
  }

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft_demo_lake")
    val spark = GraftSession.local(cores = 4, shufflePartitions = 4)
    import spark.implicits._

    println(s"== load 10 properties into $root/demoville")
    val s1 = Engine.runLoad(spark, new DemoSource(false), 1L to 10L, root, "demoville")
    println(s"   scraped=${s1.scraped} errors=${s1.errors} written=${s1.rowsWritten.toSeq.sorted}")

    println("== refresh: pid 3 changed upstream")
    val s2 = Engine.runRefresh(spark, new DemoSource(true), root, "demoville")
    println(s"   written=${s2.rowsWritten.toSeq.sorted.filter(_._2 > 0)} (hash-dedup dropped the unchanged 9)")

    val props = Lake.read(spark, root, "demoville", "properties")
    println(s"== lake now holds ${props.count()} property rows (append-only)")

    println("== current state (W1):")
    Scd
      .currentState(props, $"uuid", $"scraped_at", $"row_hash")
      .select($"pid", $"owner", $"assessment_value")
      .orderBy($"pid")
      .show(3, truncate = false)

    println("== history of pid 3 (W4) — 2 versions:")
    Scd
      .withVersions(props.filter($"pid" === 3), $"uuid", $"row_hash", $"scraped_at", $"row_hash")
      .select($"version", $"assessment_value", $"scraped_at")
      .orderBy($"version")
      .show(truncate = false)

    // The reference README's flagship SQL (README.md:125-136) through
    // spark.sql — QUALIFY is DuckDB sugar Spark lacks, so it's spelled as
    // the window+filter rewrite (same plan Scd.currentState/qualify build);
    // the changed-rows LAG query runs verbatim.
    println("== flagship SQL via spark.sql: current state + changed rows")
    spark.sql(s"""
      SELECT pid, owner, assessment_value FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY uuid ORDER BY scraped_at DESC) AS rn
        FROM parquet.`$root/demoville/properties`
      ) WHERE rn = 1 ORDER BY pid
    """).show(3, truncate = false)
    spark.sql(s"""
      SELECT pid, row_hash, prev_hash FROM (
          SELECT *,
              LAG(row_hash) OVER (PARTITION BY uuid ORDER BY scraped_at) AS prev_hash
          FROM parquet.`$root/demoville/properties`
      )
      WHERE prev_hash IS NOT NULL AND row_hash != prev_hash
    """).show(truncate = false)

    println(s"== scopes: ${Lake.scopes(spark, root)}  checkpoint: ${Checkpoints.load(spark, root, "demoville")}")

    println("== streaming refresh (AvailableNow): staged batch -> hash-dedup append")
    val staging = s"$root/_staging/properties"
    val ts = new java.sql.Timestamp(System.currentTimeMillis())
    // stage a batch: one row duplicating lake content, one genuinely new
    val cur = Scd.currentState(props, $"uuid", $"scraped_at", $"row_hash")
    val dupRow = cur.filter($"pid" === 5).drop("scraped_at", "row_hash")
    // the new ENTITY needs its own content-derived uuid (Flatten's identity
    // contract): reusing pid 5's uuid would land the row as a fake new
    // VERSION of entity 5 — pid 5 would vanish from current-state results
    val newRow = dupRow
      .withColumn("pid", lit(99L))
      .withColumn("assessment_value", lit(123.0))
      .withColumn(
        "uuid",
        graft.functions.Canonical.deterministicUuid(
          col("pid"),
          graft.functions.Canonical
            .canonicalJsonOf("pid" -> col("pid"), "town_name" -> col("town_name"))))
    Lake.append(Lake.stampMetadata(dupRow.unionByName(newRow), ts), root, "_staging", "properties")
    val schema = Lake.read(spark, root, "_staging", "properties").schema
    val q = graft.streaming.Streams.refreshStream(
      spark, schema, staging,
      root, "demoville", "properties", s"$root/_cp/properties")
    q.awaitTermination()
    println(s"   lake after streamed refresh: ${Lake.read(spark, root, "demoville", "properties").count()} rows")
    spark.stop()
  }
}
