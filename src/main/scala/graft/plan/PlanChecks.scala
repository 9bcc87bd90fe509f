package graft.plan

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning

/** Plan contracts as a first-class API: the properties that decide whether a
  * pipeline survives a 100× scale-up — shuffle counts, join strategies,
  * scan multiplicity — queryable from the physical plan, so they can be
  * ASSERTED in CI instead of eyeballed in `.explain` output.
  *
  * {{{
  *   val report = PlanChecks.inspect(df)
  *   assert(report.hashExchanges <= 1, report.render)   // one shuffle budget
  *   assert(!report.hasAllPairsJoin)                    // no O(n²) trap
  * }}}
  *
  * Checks run against the pre-execution physical plan (inside the AQE
  * wrapper when present): adaptive execution may still coalesce partitions
  * or upgrade a sort-merge join to broadcast at runtime, but it never ADDS
  * a shuffle or an all-pairs join — so a plan that passes here can only get
  * better, never worse. This is the same altitude the engine's own
  * PlanInvariantsSpec asserts at.
  */
object PlanChecks {

  final case class Report(
      hashExchanges: Int,
      totalExchanges: Int,
      broadcastHashJoins: Int,
      sortMergeJoins: Int,
      nestedLoopJoins: Int,
      cartesianProducts: Int,
      parquetScans: Int,
      skewedJoins: Int,
      planString: String
  ) {
    /** An O(left×right) join — a scale-killer unless one side is tiny by
      * construction (e.g. a handful of broadcast query vectors).
      */
    def hasAllPairsJoin: Boolean = nestedLoopJoins > 0 || cartesianProducts > 0

    /** No shuffle of ANY kind: hash, range (global sort), or round-robin
      * repartition. Based on totalExchanges — a RangePartitioning exchange
      * is just as much a full shuffle as a hash one, and a "shuffle-free"
      * contract that ignored it would be a hole in the guarantee.
      */
    def shuffleFree: Boolean = totalExchanges == 0

    def render: String =
      s"hashExchanges=$hashExchanges totalExchanges=$totalExchanges " +
        s"broadcastHashJoins=$broadcastHashJoins " +
        s"sortMergeJoins=$sortMergeJoins nestedLoopJoins=$nestedLoopJoins " +
        s"cartesianProducts=$cartesianProducts parquetScans=$parquetScans " +
        s"skewedJoins=$skewedJoins\n$planString"
  }

  /** Every node of the plan, recursing through BOTH the AQE wrappers and
    * subquery plans. With AQE on, each subquery is its own
    * AdaptiveSparkPlanExec and that wrapper is a LEAF node — a plain
    * `collectWithSubqueries` never sees inside it, so a scalar subquery
    * hiding a full shuffle (or a cartesian join) would be invisible to the
    * counts. `executedPlan` inside a wrapper is the CURRENT physical plan —
    * post-EnsureRequirements, so exchanges are present (`inputPlan` is the
    * tree before they're inserted, useless for shuffle accounting).
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
    // materialized AQE stages are LEAF wrappers — the executed subtree hangs
    // off .plan, not .children, so a post-execution inspection that skipped
    // this case would report an empty plan (zero joins, zero exchanges)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: allNodes(q.plan)
    case other =>
      other +: (other.children.flatMap(allNodes) ++ other.subqueries.flatMap(allNodes))
  }

  def inspect(df: DataFrame): Report = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val all = allNodes(plan)
    Report(
      hashExchanges = all.count {
        case e: ShuffleExchangeExec => e.outputPartitioning.isInstanceOf[HashPartitioning]
        case _ => false
      },
      totalExchanges = all.count(_.isInstanceOf[ShuffleExchangeExec]),
      broadcastHashJoins = all.count(_.isInstanceOf[BroadcastHashJoinExec]),
      sortMergeJoins = all.count(_.isInstanceOf[SortMergeJoinExec]),
      nestedLoopJoins = all.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      cartesianProducts = all.count(_.isInstanceOf[CartesianProductExec]),
      // startsWith, not ==: Spark 4's BatchScanExec.nodeName is
      // "BatchScan <table>", so an exact match counted every DSv2/catalog
      // scan as zero and a scan-budget assert passed vacuously
      parquetScans = all.count(n =>
        n.nodeName.startsWith("Scan parquet") || n.nodeName.startsWith("BatchScan")),
      // isSkewJoin is set by AQE's OptimizeSkewedJoin when it split a hot
      // partition — only visible in the FINAL adaptive plan, i.e. when
      // inspect() runs AFTER an action on the frame
      skewedJoins = all.count {
        case s: SortMergeJoinExec => s.isSkewJoin
        case s: ShuffledHashJoinExec => s.isSkewJoin
        case _ => false
      },
      planString = plan.toString
    )
  }
}
