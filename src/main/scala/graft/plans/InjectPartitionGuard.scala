package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Optimizer rule that automates the reference's *manual* partition-pruning
  * idiom.
  *
  * The reference hand-writes a redundant partition-column conjunct next to
  * every event-time predicate — `received_day > CURRENT_DATE - 3`
  * (`config/flink/sink_risk_score_daily.sql:22`) and a day-range derived in
  * API code (`services/telematics_api/main.py:258-259, 275-277`) — because
  * its engines can't prune `received_day` partitions from a `gps_epoch`
  * range. This rule does that derivation inside the optimizer: a bounded
  * `gps_epoch` range predicate over a relation that also carries
  * `received_day` gains `received_day BETWEEN date(lo) - skew AND
  * date(hi) + skew`.
  *
  * `skewDays` bounds |received_day − date(gps_epoch)|: receive time trails
  * event time by at most that many days (late data), and leads it by at most
  * the same (clock skew). The added conjunct is then implied by the original
  * predicate — results are unchanged (proven by test against the un-rewritten
  * query) — but Catalyst's static partition pruning can now use it, turning a
  * full-table scan into a few-partition scan at 100 TB.
  *
  * Injected via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`); idempotent (fixed-point safe) because it skips
  * filters that already constrain `received_day`.
  *
  * **Scoped to opted-in tables.** The skew bound is a *data contract*, not a
  * fact Catalyst can check: a table holding rows received more than
  * `skewDays` after event time (offline-device uploads, backfills) would
  * silently lose them from event-time range queries if the guard applied.
  * The rule therefore only rewrites scans whose location is under a path
  * listed in `spark.graft.partitionGuard.paths` (comma-separated prefixes;
  * empty ⇒ rule is a no-op). Opt a table in with
  * [[InjectPartitionGuard.optIn]] *after* writing it through
  * [[graft.maintain.Layout.writeFact]], which enforces the bound at write
  * time — together they make the contract checked end-to-end.
  */
case class InjectPartitionGuard(skewDays: Int = 1,
                                eventCol: String = "gps_epoch",
                                dayCol: String = "received_day")
    extends Rule[LogicalPlan] {

  private def boundsOf(cond: Expression, ev: Attribute): (Option[Expression], Option[Expression]) = {
    val conjuncts = splitConjunctivePredicates(cond)
    def isEv(e: Expression) = e.semanticEquals(ev)
    var lo: Option[Expression] = None
    var hi: Option[Expression] = None
    conjuncts.foreach {
      case GreaterThan(l, r: Literal) if isEv(l)           => lo = lo.orElse(Some(r))
      case GreaterThanOrEqual(l, r: Literal) if isEv(l)    => lo = lo.orElse(Some(r))
      case LessThan(l, r: Literal) if isEv(l)              => hi = hi.orElse(Some(r))
      case LessThanOrEqual(l, r: Literal) if isEv(l)       => hi = hi.orElse(Some(r))
      case EqualTo(l, r: Literal) if isEv(l)               => lo = Some(r); hi = Some(r)
      case _ => ()
    }
    (lo, hi)
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }

  /** True iff every file-source leaf under `plan` reads from an opted-in
    * location (see class doc). Non-file leaves never opt in.
    */
  private def optedIn(plan: LogicalPlan): Boolean = {
    val prefixes = conf.getConfString(InjectPartitionGuard.PathsConfKey, "")
      .split(',').map(_.trim).filter(_.nonEmpty)
      .map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath)
    prefixes.nonEmpty && {
      val leaves = plan.collectLeaves()
      leaves.nonEmpty && leaves.forall {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.forall(rp =>
            prefixes.exists(rp.toUri.getPath.startsWith))
        case _ => false
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if optedIn(child) =>
      val ev = child.output.find(a => a.name == eventCol && a.dataType == TimestampType)
      val day = child.output.find(a => a.name == dayCol && a.dataType == DateType)
      (ev, day) match {
        case (Some(evAttr), Some(dayAttr))
            if !cond.references.contains(dayAttr) =>
          val (lo, hi) = boundsOf(cond, evAttr)
          // timestamp→date cast is TZ-aware: it must carry the session TZ or
          // the plan becomes unresolved post-optimization
          val tz = Some(conf.sessionLocalTimeZone)
          val guards = Seq(
            lo.map(l => GreaterThanOrEqual(dayAttr,
              DateAdd(Cast(l, DateType, tz), Literal(-skewDays)))),
            hi.map(h => LessThanOrEqual(dayAttr,
              DateAdd(Cast(h, DateType, tz), Literal(skewDays))))
          ).flatten
          if (guards.isEmpty) f
          else Filter(guards.foldLeft(cond)(And), child)
        case _ => f
      }
  }
}

object InjectPartitionGuard {
  /** Comma-separated path prefixes whose tables have the write-time-checked
    * skew contract and may receive injected `received_day` guards.
    */
  val PathsConfKey = "spark.graft.partitionGuard.paths"

  /** Opt a table location into guard injection for this session. */
  def optIn(spark: SparkSession, path: String): Unit = {
    val cur = spark.conf.getOption(PathsConfKey).getOrElse("")
    val parts = cur.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    if (!parts.contains(path))
      spark.conf.set(PathsConfKey, (parts :+ path).mkString(","))
  }
}
