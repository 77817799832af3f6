package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LocalRelation, LogicalPlan, Union}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** COLUMN-LEVEL LINEAGE from the analyzed Catalyst plan: for every
  * output column, the set of leaf (table, column) pairs its VALUE was
  * computed from — the data-governance answer to "which physical
  * columns feed this report field", read directly off the plan instead
  * of re-parsed from SQL text (the engine introspection companion to
  * [[PlanGuard]]'s runtime checks).
  *
  * Semantics: VALUE provenance only — an output tracks the columns
  * referenced by the expressions that produce it (through aliases,
  * aggregates, window functions and generators, transitively across
  * any node depth). Columns consulted only by predicates or join keys
  * deliberately do not appear: they influence which rows exist, not
  * what a value is made of (the standard "copy/transform" lineage cut,
  * as opposed to "influence" lineage).
  *
  * Table names come from the leaf: the file-source root path's
  * basename (extension stripped) for parquet/csv relations, `local`
  * for in-memory test relations.
  *
  * Plan-walk only — nothing is executed; the result is a driver-built
  * metadata DataFrame (out_col, source_table, source_col).
  */
object Provenance {

  private def tableNameOf(leaf: LogicalPlan): String = leaf match {
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.headOption
            .map { p =>
              val base = p.getName
              val dot = base.lastIndexOf('.')
              if (dot > 0) base.substring(0, dot) else base
            }
            .getOrElse("relation")
        case _ => "relation"
      }
    case _: LocalRelation => "local"
    case other => other.nodeName.toLowerCase
  }

  /** exprId → leaf (table, column) set, built bottom-up over the plan. */
  private def lineageMap(plan: LogicalPlan): Map[ExprId, Set[(String, String)]] =
    if (plan.children.isEmpty) {
      val t = tableNameOf(plan)
      plan.output.map(a => a.exprId -> Set((t, a.name))).toMap
    } else {
      val fromChildren = plan.children.map(lineageMap).reduce(_ ++ _)
      def sourcesOf(refs: Iterable[Attribute]): Set[(String, String)] =
        refs.flatMap(r => fromChildren.getOrElse(r.exprId, Set.empty)).toSet
      // every Alias anywhere in this node's expressions (project lists,
      // aggregate lists, window lists — nested included)
      val fromAliases = plan.expressions
        .flatMap(_.collect { case a: Alias => a })
        .map(a => a.exprId -> sourcesOf(a.references.toSeq))
        .toMap
      val fromGenerators = plan match {
        case g: Generate =>
          g.generatorOutput
            .map(a => a.exprId -> sourcesOf(g.generator.references.toSeq))
            .toMap
        case _ => Map.empty[ExprId, Set[(String, String)]]
      }
      // Union's output attributes reuse the FIRST child's ExprIds, so the
      // child-map merge alone would silently drop every other branch's
      // provenance. Zip each child's output positionally onto the union
      // output and merge the per-position source sets.
      val fromUnion = plan match {
        case u: Union =>
          u.output.zipWithIndex.map { case (out, i) =>
            out.exprId -> u.children.flatMap { ch =>
              fromChildren.getOrElse(ch.output(i).exprId, Set.empty[(String, String)])
            }.toSet
          }.toMap
        case _ => Map.empty[ExprId, Set[(String, String)]]
      }
      fromChildren ++ fromAliases ++ fromGenerators ++ fromUnion
    }

  def columnLineage(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed
    val m = lineageMap(plan)
    val rows = plan.output.flatMap { a =>
      m.getOrElse(a.exprId, Set.empty).toSeq.sorted.map { case (t, c) =>
        Row(a.name, t, c)
      }
    }
    val spark = SparkSession.active
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("out_col", StringType, nullable = false),
        StructField("source_table", StringType, nullable = false),
        StructField("source_col", StringType, nullable = false))))
  }
}
