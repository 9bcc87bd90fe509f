package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier

/** Analyzer rule that resolves the derived SCD view names
  * (`<catalog>.<scope>.<table>__current` / `...__versions`) served by
  * [[GraftCatalog.loadView]].
  *
  * Why a rule at all: OSS Spark's relation resolution consults only
  * `TableCatalog.loadTable` — the `ViewCatalog` SPI [[GraftCatalog]]
  * implements is not in the SELECT path (it exists for external engines).
  * So the catalog's view definitions are surfaced to the analyzer here: an
  * `UnresolvedRelation` whose name carries a view suffix and whose catalog
  * resolves to a [[GraftCatalog]] is replaced by the PARSED view SQL (the
  * same text `loadView` serves), aliased under the view name. The parsed
  * subtree references the BASE table three-part name, which the normal
  * resolution path picks up on the next analyzer iteration — scans, pushdown
  * and pruning are untouched, and Catalyst pushes entity-key predicates
  * below the view's window ([[org.apache.spark.sql.catalyst.optimizer.PushDownPredicates]]),
  * so a point query through `__current` still prunes at the parquet scan.
  *
  * A REAL table whose directory happens to end in `__current` wins over the
  * derived view (the rule steps aside when `tableExists`) — layout names
  * are user-controlled and must never be shadowed by magic.
  *
  * Injected by [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`, set by
  * [[graft.GraftSession.configure]]).
  */
case class ResolveScdViews(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftCatalog(name: String): Option[GraftCatalog] =
    try spark.sessionState.catalogManager.catalog(name) match {
      case g: GraftCatalog => Some(g)
      case _               => None
    } catch { case _: Exception => None }

  private def viewPlan(g: GraftCatalog, ident: Identifier): Option[LogicalPlan] =
    if (g.tableExists(ident) || !g.viewExists(ident)) None
    else {
      val view = g.loadView(ident)
      Some(SubqueryAlias(ident.name, spark.sessionState.sqlParser.parsePlan(view.query())))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation
        if u.multipartIdentifier.nonEmpty &&
          GraftCatalog.viewSuffixes.exists(u.multipartIdentifier.last.endsWith) =>
      val resolved = u.multipartIdentifier match {
        case Seq(cat, ns, table) =>
          graftCatalog(cat).flatMap(g => viewPlan(g, Identifier.of(Array(ns), table)))
        case Seq(ns, table) =>
          // two-part name: against the session's CURRENT catalog
          spark.sessionState.catalogManager.currentCatalog match {
            case g: GraftCatalog => viewPlan(g, Identifier.of(Array(ns), table))
            case _               => None
          }
        case Seq(table) =>
          // one-part name after `USE graft.<scope>`: current catalog +
          // current namespace — `SELECT * FROM properties__current` must
          // resolve wherever bare `properties` does
          spark.sessionState.catalogManager.currentCatalog match {
            case g: GraftCatalog =>
              val ns = spark.sessionState.catalogManager.currentNamespace
              if (ns.nonEmpty) viewPlan(g, Identifier.of(ns, table)) else None
            case _ => None
          }
        case _ => None
      }
      resolved.getOrElse(u)
  }
}
