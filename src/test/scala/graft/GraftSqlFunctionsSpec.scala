package graft

import graft.functions.{GraftExtensions, GraftSqlFunctions, HashSupport}
import org.apache.spark.sql.SparkSessionExtensions

class GraftSqlFunctionsSpec extends SparkSpec {

  GraftSqlFunctions.register(spark)

  test("graft_simhash64 from SQL equals the Scala implementation") {
    val got = spark.sql("SELECT graft_simhash64('the quick brown fox') AS h").head().getLong(0)
    assert(got == HashSupport.simhash64("the quick brown fox"))
  }

  test("graft_minhash yields the same signature as the DataFrame API") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq("a rose is a rose is a rose").toDF("t")
    val viaSql = spark.sql("SELECT graft_minhash('a rose is a rose is a rose', 5, 12) AS s")
      .head().getSeq[Long](0)
    val viaDf = df.select(graft.functions.HashExprs.minhashSignature(col("t"), 5, 12).as("s"))
      .head().getSeq[Long](0)
    assert(viaSql == viaDf && viaSql.length == 12)
  }

  test("graft_sorted_intersect_size and graft_array_dot work on SQL arrays") {
    val r = spark.sql(
      """SELECT graft_sorted_intersect_size(array(1L,2L,3L,9L), array(2L,3L,5L)) AS i,
        |       graft_array_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                       array(CAST(3.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d""".stripMargin).head()
    assert(r.getLong(0) == 2L)
    assert(math.abs(r.getDouble(1) - 4.0) < 1e-9)
  }

  test("graft_rep_stats exposes the repetition struct in SQL") {
    val r = spark.sql("SELECT graft_rep_stats('go go go stop').n_bigrams AS nb").head()
    assert(r.getInt(0) == 3)
  }

  test("hyper-parameters must be literals; wrong arity is a clear error") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_minhash('x', 1 + CAST(rand() AS INT), 12)").collect()
    }
    assert(e1.getMessage.contains("integer literal"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_simhash64('x', 3)").collect()
    }
    assert(e2.getMessage.contains("expects arguments"))
  }

  test("codegen survives the SQL path (whole-stage works over a table)") {
    import spark.implicits._
    val df = (1 to 100).map(i => s"row text number $i with words").toDF("t")
    df.createOrReplaceTempView("gsf_t")
    val n = spark.sql("SELECT count(DISTINCT graft_simhash32(t)) FROM gsf_t").head().getLong(0)
    assert(n > 1)
  }

  test("the extensions plug-in registers working builders into a function registry") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    import org.apache.spark.sql.catalyst.expressions.Literal
    // exercise the exact path a session built with
    // spark.sql.extensions=GraftExtensions runs at construction time:
    // inject into a SparkSessionExtensions, materialize its registry, and
    // evaluate a looked-up builder end to end
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.GraftExtensionsTestHook
      .materializeFunctions(ext, new SimpleFunctionRegistry)
    GraftSqlFunctions.functions.foreach { case (n, _, _) =>
      assert(reg.functionExists(FunctionIdentifier(n)), s"$n missing from injected registry")
    }
    val e = reg.lookupFunction(FunctionIdentifier("graft_simhash64"), Seq(Literal("plug-in path")))
    assert(e.eval(null) == HashSupport.simhash64("plug-in path"))
  }
}
