package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge into the `private[sql]` registry-materialization step a
  * SparkSession performs when it applies `spark.sql.extensions` — lets the
  * spec verify the plug-in path without constructing a second session.
  */
object GraftExtensionsTestHook {
  def materializeFunctions(ext: SparkSessionExtensions, reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)
}
