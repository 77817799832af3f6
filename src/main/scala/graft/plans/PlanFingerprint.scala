package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.{InputAdapter, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec, ShuffledHashJoinExec}

/** Canonical physical-plan fingerprint — the swing-vs-drift attribution
  * tool (VERDICT r12 ask #1). Rounds 9–12 each spent a forensics pass
  * deciding whether a bench mover was a real plan regression or
  * measurement swing; the only durable evidence was "the defining file's
  * diffstat is empty", which cannot see a plan flip caused by an AQE
  * default change, a statistics shift, or a Spark upgrade. This module
  * renders a NORMALIZED physical-plan tree — operator kinds, exchange
  * kinds, join strategies + build sides, nothing volatile (no expression
  * IDs, no partition counts, no file paths, no codegen wrapper noise) —
  * and digests it. `PLANSHAPES.json` (committed, regenerated via
  * `SPARK_GRAFT_REGEN_PLANSHAPES=1 sbt "testOnly graft.PlanShapeSpec"`)
  * pins the digest per watched query; the spec recomputes at HEAD, so
  * "file untouched + fingerprint identical" closes a mover in seconds and
  * a silent plan flip is caught the round it happens.
  */
object PlanFingerprint {

  /** Preorder rendering of the physical tree with volatile detail
    * stripped. AQE wrappers are descended (pre-execution this is the
    * initial plan — deterministic for fixed input files and session
    * conf); `WholeStageCodegenExec`/`InputAdapter` are transparent
    * (codegen span boundaries move with cosmetic expression edits and
    * would false-positive the gate); partition COUNTS are excluded
    * (the spec session and the bench session size them differently)
    * while partitioning KINDS are kept.
    */
  def normalizedTree(df: DataFrame): String =
    render(df.queryExecution.executedPlan, 0).mkString("\n")

  private def render(p: SparkPlan, depth: Int): Seq[String] = p match {
    case a: AdaptiveSparkPlanExec => render(a.executedPlan, depth)
    case q: QueryStageExec => render(q.plan, depth)
    case w: WholeStageCodegenExec => render(w.child, depth)
    case i: InputAdapter => render(i.child, depth)
    case _ =>
      val name = p.getClass.getSimpleName.stripSuffix("Exec")
      val extra = p match {
        case j: BroadcastHashJoinExec => s"[${j.joinType}, build=${j.buildSide}]"
        case j: ShuffledHashJoinExec => s"[${j.joinType}, build=${j.buildSide}]"
        case j: BaseJoinExec => s"[${j.joinType}]"
        case e: ShuffleExchangeExec =>
          s"[${e.outputPartitioning.getClass.getSimpleName}]"
        case _: BroadcastExchangeExec => "[broadcast]"
        case _ => ""
      }
      (("  " * depth) + name + extra) +:
        (p.children ++ p.innerChildren.collect { case sp: SparkPlan => sp })
          .flatMap(render(_, depth + 1))
  }

  /** First 12 hex chars of the MD5 of the normalized tree. */
  def digest(tree: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(tree.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }

  final case class Shape(digest: String, exchanges: Int, joins: Seq[String], tree: String)

  /** Fingerprint + the two headline shape counters the judge reads. */
  def shape(df: DataFrame): Shape = {
    val tree = normalizedTree(df)
    val lines = tree.linesIterator.map(_.trim).toSeq
    Shape(
      digest(tree),
      lines.count(l => l.startsWith("ShuffleExchange") || l.startsWith("BroadcastExchange")),
      lines.filter(l => l.contains("Join[") || l.contains("CartesianProduct")).distinct,
      tree)
  }
}
