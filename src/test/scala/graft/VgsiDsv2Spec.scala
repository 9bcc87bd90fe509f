package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.examples.VgsiFixtureDemo

class VgsiDsv2Spec extends SparkSpec {
  import spark.implicits._

  /** Write <pid>.html fixture pages (every 7th pid is the invalid form). */
  private def pageDir(ids: Range): String = {
    val dir = tmpDir("dsv2pages")
    ids.foreach { pid =>
      Files.write(
        Paths.get(dir, s"$pid.html"),
        VgsiFixtureDemo.fixtureHtml(pid.toLong).getBytes(StandardCharsets.UTF_8))
    }
    dir
  }

  test("short-name format resolves and parses valid parcels, skipping error forms") {
    val dir = pageDir(1 to 20)
    val df = spark.read.format("graft-vgsi").load(dir)
    val got = df.select($"pid", $"address", $"owner").orderBy($"pid").collect()
    // 7 and 14 are invalid forms -> skipped like Engine D6
    assert(got.map(_.getLong(0)).toSeq == (1 to 20).filterNot(p => p % 7 == 0).map(_.toLong))
    assert(got.head.getString(1) == "1 ELM ST" && got.head.getString(2) == "OWNER 1")
  }

  test("numPartitions option controls input-partition planning") {
    val dir = pageDir(1 to 40)
    val df = spark.read.format("graft-vgsi").option("numPartitions", 5).load(dir)
    assert(df.rdd.getNumPartitions == 5)
    assert(df.count() == (1 to 40).count(_ % 7 != 0))
    val one = spark.read.format("graft-vgsi").option("numPartitions", 1).load(dir)
    assert(one.rdd.getNumPartitions == 1)
  }

  test("column pruning reaches the reader (narrow ReadSchema, values correct)") {
    val dir = pageDir(1 to 10)
    val narrow = spark.read.format("graft-vgsi").load(dir).select($"pid", $"zip_code")
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.contains("pid") && !plan.contains("assessment_value"),
      s"pruned scan must not carry unselected columns:\n$plan")
    val r = narrow.orderBy($"pid").head()
    assert(r.getLong(0) == 1L && r.getString(1) == "06511")
    // full-width read still materializes every Property column
    assert(spark.read.format("graft-vgsi").load(dir).columns.length ==
      graft.sources.dsv2.VgsiHtmlDataSource.schema.fields.length)
  }

  test("the table composes with the relational surface (join + aggregate over parsed pages)") {
    val dir = pageDir(1 to 20)
    val df = spark.read.format("graft-vgsi").load(dir)
    val n = df.filter($"assessment_value" > 0)
      .groupBy(($"pid" % 2 === 0).as("even"))
      .count().collect().map(_.getLong(1)).sum
    assert(n == (1 to 20).count(_ % 7 != 0))
  }

  test("pid filters push down to file listing: pruned pages are never opened") {
    val dir = pageDir(1 to 30)
    // plant a poison "page" whose pid is outside the filter range: it is a
    // DIRECTORY, so any attempt to open it fails the task — the query can
    // only succeed if pushdown pruned it at listing time
    Files.createDirectory(Paths.get(dir, "999.html"))
    val df = spark.read.format("graft-vgsi").load(dir)
      .filter($"pid" >= 10 && $"pid" < 20)
    val got = df.select($"pid").orderBy($"pid").collect().map(_.getLong(0)).toSeq
    assert(got == (10 to 19).filterNot(_ % 7 == 0).map(_.toLong))
    // without a pid filter the poison IS opened and the task fails —
    // proving the green run above came from pruning, not from tolerance
    intercept[Exception] {
      spark.read.format("graft-vgsi").load(dir).count()
    }
    // a residual non-pid filter still evaluates above the scan
    val mixed = spark.read.format("graft-vgsi").load(dir)
      .filter($"pid" < 5 && $"owner" === "OWNER 2")
    assert(mixed.select($"pid").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("empty directory yields an empty table, missing path is a clear error") {
    val empty = tmpDir("dsv2empty")
    assert(spark.read.format("graft-vgsi").load(empty).count() == 0)
    val e = intercept[Exception] {
      spark.read.format("graft-vgsi").options(Map.empty[String, String]).load().count()
    }
    assert(e.getMessage.toLowerCase.contains("path"))
  }
}
