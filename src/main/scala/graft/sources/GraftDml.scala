package graft.sources

import graft.operators.Snapshot

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, Between, EqualTo => CEqualTo, Expression, GreaterThanOrEqual => CGte, LessThanOrEqual => CLte, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, expr}

/**
 * SQL `UPDATE` and `MERGE INTO` for graft catalog tables — the last
 * two verbs of the DML triangle the DSv2 connector opened (INSERT →
 * transactional merge, DELETE → predicate DML commit).
 *
 * Spark's own row-level-operation rewrite
 * (`SupportsRowLevelOperations`) plans a generic
 * read-join-replace-groups pipeline; graft already HAS transactional
 * primitives with exactly UPDATE/MERGE semantics
 * ([[Snapshot.updateWhere]], [[Snapshot.merge]]) — pruned
 * file-granularity rewrites under the commit lock with constraints /
 * guards enforced. So, like the major lakehouse engines, the commands
 * are intercepted at ANALYSIS (a post-hoc resolution rule registered
 * by [[graft.GraftExtensions]]) and routed onto those primitives:
 *
 * {{{
 *   UPDATE corpus SET n_chars = n_chars + 1000, lang = 'xx'
 *   WHERE doc_id >= 300 AND doc_id <= 349        -- Snapshot.updateWhere
 *
 *   MERGE INTO corpus t USING staged s ON t.doc_id = s.doc_id
 *   WHEN MATCHED THEN UPDATE SET *
 *   WHEN NOT MATCHED THEN INSERT *               -- Snapshot.merge
 * }}}
 *
 * REFUSE-DON'T-APPROXIMATE, the same contract as SQL DELETE:
 *  - UPDATE conditions must be conjunctions of bounded ranges /
 *    equality on stats-provable columns (`>=`/`<=`/`=`/BETWEEN —
 *    what [[Snapshot.pruneAll]] can prove); anything else errors at
 *    analysis with a rewrite hint, it is never silently widened.
 *  - MERGE supports the keyed canonical forms: ON equality over the
 *    TABLE KEY, unconditioned `UPDATE SET * / INSERT * / DELETE`
 *    actions. Conditioned actions, non-key join conditions, partial
 *    column assignments and NOT-MATCHED-BY-SOURCE clauses are refused
 *    (the Scala API composes those explicitly).
 *  - A `versionAsOf`/`tag`/`timestampAsOf`-pinned reference refuses
 *    both verbs (no writing to the past).
 */
object GraftDml {

  /** The graft table under an UPDATE/MERGE target, unwrapped through
    * aliases only — a join or projection in between is not a direct
    * table reference and stays with Spark. */
  @scala.annotation.tailrec
  private[sources] def graftTarget(p: LogicalPlan): Option[GraftTable] = p match {
    case SubqueryAlias(_, child) => graftTarget(child)
    case r: DataSourceV2Relation => r.table match {
      case g: GraftTable => Some(g)
      case _ => None
    }
    case _ => None
  }

  /** A comparison side that is a compile-time constant — a literal or
    * a foldable expression (type coercion wraps literals in casts:
    * `id >= 5` arrives as `id >= CAST(5 AS BIGINT)`), evaluated to
    * its EXTERNAL value. None for NULL (a NULL bound never matches —
    * refuse rather than reason about three-valued logic here). */
  private def constValue(e: Expression): Option[Any] = e match {
    case _ if !e.foldable || e.exists(_.isInstanceOf[SubqueryExpression]) => None
    case _ => Option(e.eval(null))
      .map(CatalystTypeConverters.convertToScala(_, e.dataType))
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
    // BETWEEN survives analysis as a RuntimeReplaceable node (its
    // replacement hides the column behind common-subexpression refs);
    // decompose it to the primitive >= AND <= form directly
    case Between(input, lower, upper, _) =>
      conjuncts(CGte(input, lower)) ++ conjuncts(CLte(input, upper))
    case x => Seq(x)
  }

  /** Render an expression as re-parseable SQL with attribute
    * QUALIFIERS stripped: resolved attrs render as
    * `spark_catalog`.`default`.`t`.`col`, which cannot re-resolve
    * against the bare table frame the command executes over. */
  private def unqualifiedSql(e: Expression): String =
    e.transform {
      case ar: AttributeReference => ar.withQualifier(Seq.empty)
    }.sql

  /** Catalyst condition → [[Snapshot.updateWhere]]'s bounded
    * (col, lo, hi) ranges; None refuses. Mirrors
    * [[GraftFilters.toRangePreds]] on v1 Filters. */
  private[graft] def toRangePreds(cond: Expression): Option[Seq[(String, Any, Any)]] = {
    val bounds = scala.collection.mutable.LinkedHashMap[String, (Option[Any], Option[Any])]()
    def upd(c: String, lo: Option[Any], hi: Option[Any]): Boolean = {
      val (l0, h0) = bounds.getOrElse(c, (None, None))
      if ((lo.isDefined && l0.isDefined) || (hi.isDefined && h0.isDefined))
        return false // conflicting double bounds — refuse, don't guess
      bounds(c) = (lo.orElse(l0), hi.orElse(h0))
      true
    }
    val ok = conjuncts(cond).forall {
      case CEqualTo(a: AttributeReference, c) if constValue(c).isDefined =>
        val v = constValue(c).get; upd(a.name, Some(v), Some(v))
      case CEqualTo(c, a: AttributeReference) if constValue(c).isDefined =>
        val v = constValue(c).get; upd(a.name, Some(v), Some(v))
      case CGte(a: AttributeReference, c) if constValue(c).isDefined =>
        upd(a.name, constValue(c), None)
      case CLte(c, a: AttributeReference) if constValue(c).isDefined =>
        upd(a.name, constValue(c), None)
      case CLte(a: AttributeReference, c) if constValue(c).isDefined =>
        upd(a.name, None, constValue(c))
      case CGte(c, a: AttributeReference) if constValue(c).isDefined =>
        upd(a.name, None, constValue(c))
      case _ => false
    }
    if (!ok || bounds.isEmpty) None
    else {
      val ranges = bounds.toSeq.map { case (c, (lo, hi)) =>
        for (l <- lo; h <- hi) yield (c, l, h)
      }
      if (ranges.exists(_.isEmpty)) None else Some(ranges.flatten)
    }
  }

  // refusals surface at analysis time, same style as the connector's
  // canDeleteWhere contract: a clear error, never an approximation
  private def refuse(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  // ------------------------------------------------------------ UPDATE

  private[graft] def rewriteUpdate(u: UpdateTable, g: GraftTable): LogicalPlan = {
    if (g.pinned) refuse(
      "graft: cannot UPDATE through a versionAsOf/tag-pinned reference")
    val preds = u.condition match {
      case None => refuse("graft: UPDATE without WHERE would rewrite the " +
        "whole table — give a bounded range/equality condition, or use " +
        "the Scala relayout/compact commits for full rewrites")
      case Some(c) => toRangePreds(c).getOrElse(refuse(
        "graft: UPDATE supports conjunctions of bounded ranges and " +
          "equality on stats-provable columns (col = v, col >= lo AND " +
          "col <= hi, BETWEEN) — rewrite the predicate or use the Scala " +
          s"DML API (got: ${c.sql})"))
    }
    val sets = u.assignments.flatMap { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name
        case other => refuse(s"graft: UPDATE of a nested field " +
          s"(${other.sql}) is not supported")
      }
      a.value match {
        // alignment may have padded identity assignments (col = col);
        // dropping them keeps key/partition columns legal to omit
        case ar: AttributeReference if ar.name == name => None
        case v =>
          if (!v.deterministic) refuse(
            s"graft: non-deterministic UPDATE expression for '$name'")
          if (v.exists(_.isInstanceOf[SubqueryExpression])) refuse(
            s"graft: subquery in UPDATE expression for '$name' — " +
              "materialize it and use the Scala API")
          Some(name -> unqualifiedSql(v))
      }
    }
    if (sets.isEmpty) refuse("graft: UPDATE with no effective assignments")
    GraftUpdateCommand(g.path, preds, sets)
  }

  // ------------------------------------------------------------- MERGE

  /** The per-target-column source expressions of a resolved star
    * action: every assignment must be `target.col := <source expr>`
    * with all value attributes from the SOURCE side. */
  private def starAssignments(as: Seq[Assignment], target: LogicalPlan,
                              source: LogicalPlan): Seq[(String, String)] = {
    val tgtIds = target.outputSet
    as.map { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name
        case other => refuse(s"graft: MERGE assignment to a nested field " +
          s"(${other.sql}) is not supported")
      }
      if (a.value.references.exists(tgtIds.contains)) refuse(
        s"graft: MERGE assignment for '$name' references the TARGET — " +
          "only source-side UPDATE SET * / INSERT * forms are supported")
      if (!a.value.deterministic ||
          a.value.exists(_.isInstanceOf[SubqueryExpression])) refuse(
        s"graft: non-deterministic/subquery MERGE assignment for '$name'")
      name -> unqualifiedSql(a.value)
    }
  }

  private[graft] def rewriteMerge(m: MergeIntoTable, g: GraftTable): LogicalPlan = {
    if (g.pinned) refuse(
      "graft: cannot MERGE into a versionAsOf/tag-pinned reference")
    if (m.notMatchedBySourceActions.nonEmpty) refuse(
      "graft: WHEN NOT MATCHED BY SOURCE is not supported — the Scala " +
        "API composes source-absence deletes explicitly")
    val tgtIds = m.targetTable.outputSet
    val srcIds = m.sourceTable.outputSet
    // ON condition: equality over the table key (either side order)
    val key = Snapshot.readManifest(g.path,
      Snapshot.currentVersion(g.path)).key
    val keyCond = m.mergeCondition match {
      case CEqualTo(a: AttributeReference, b: AttributeReference) =>
        val (t, s) =
          if (tgtIds.contains(a) && srcIds.contains(b)) (a, b)
          else if (tgtIds.contains(b) && srcIds.contains(a)) (b, a)
          else refuse("graft: MERGE ON must compare a target column " +
            "with a source column")
        if (t.name != key) refuse(s"graft: MERGE ON must be equality on " +
          s"the table key '$key' (got '${t.name}') — the format's merge " +
          "primitive is keyed")
        s.name
      case other => refuse("graft: MERGE ON supports only `target.key = " +
        s"source.col` equality (got: ${other.sql})")
    }
    def only[A](as: Seq[MergeAction], what: String)(
        pf: PartialFunction[MergeAction, A]): Option[A] = as match {
      case Nil => None
      case Seq(one) =>
        if (one.condition.isDefined) refuse(
          s"graft: conditioned $what MERGE actions are not supported")
        Some(pf.applyOrElse(one, (x: MergeAction) => refuse(
          s"graft: unsupported $what MERGE action ${x.getClass.getSimpleName}" +
            " — only UPDATE SET * / INSERT * / DELETE")))
      case _ => refuse(s"graft: at most one $what MERGE action is supported")
    }
    val matched: Option[Either[Seq[(String, String)], Unit]] =
      only(m.matchedActions, "MATCHED") {
        case UpdateAction(_, as, _) =>
          Left(starAssignments(as, m.targetTable, m.sourceTable))
        case _: DeleteAction => Right(())
      }
    val inserted: Option[Seq[(String, String)]] =
      only(m.notMatchedActions, "NOT MATCHED") {
        case InsertAction(_, as) =>
          starAssignments(as, m.targetTable, m.sourceTable)
      }
    if (matched.isEmpty && inserted.isEmpty)
      refuse("graft: MERGE with no supported actions")
    GraftMergeCommand(g.path, key, keyCond, m.sourceTable,
      updateCols = matched.collect { case Left(as) => as },
      delete = matched.contains(Right(())),
      insertCols = inserted)
  }
}

/** `UPDATE` executed as the pruned copy-on-write commit
  * ([[Snapshot.updateWhere]]): manifest stats name the candidate
  * files, only those rewrite, one atomic version. SET expressions are
  * carried as SQL text (re-resolved against the table frame — a
  * resolved Column would drag foreign expression ids across plans). */
case class GraftUpdateCommand(path: String,
                              preds: Seq[(String, Any, Any)],
                              sets: Seq[(String, String)])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    Snapshot.updateWhere(spark, path, preds,
      sets.map { case (c, sql) => c -> expr(sql) }.toMap)
    Seq.empty
  }
}

/** `MERGE INTO` executed as ONE transactional [[Snapshot.merge]]
  * commit. The source plan is already analyzed; matched/not-matched
  * membership is decided against the table's CURRENT keys inside the
  * commit — by the ON key, via semi/anti joins (never a driver-side
  * collect) — then upserts and deletes land in a single atomic
  * version. A full upsert whose UPDATE and INSERT assignments differ
  * shapes each membership side with ITS OWN expressions (matched rows
  * get the UPDATE values, new rows the INSERT values); only when the
  * two assignment lists are identical does it collapse to one pass. */
case class GraftMergeCommand(path: String, key: String, sourceKeyCol: String,
                             @transient sourcePlan: LogicalPlan,
                             updateCols: Option[Seq[(String, String)]],
                             delete: Boolean,
                             insertCols: Option[Seq[(String, String)]])
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(sourcePlan)

  override def run(spark: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.graft.SqlBridge.ofRows(spark, sourcePlan)
    def shapedOf(df: DataFrame, cols: Seq[(String, String)]) =
      df.select(cols.map { case (c, sql) => expr(sql).as(c) }: _*)
    val target = Snapshot.readLatest(spark, path)
    val targetKeys = target.select(col(key))
    val srcKeys = src.select(expr(sourceKeyCol).as(key))
    // matched/unmatched is the ON condition's verdict: join the RAW
    // source on its ON-key column (renamed on the build side so a
    // same-named source column never ambiguates), not on whatever the
    // assignments later write into the key
    val tk = targetKeys.withColumnRenamed(key, "__graft_tk")
    def srcSide(joinType: String) =
      src.join(tk, expr(sourceKeyCol) === col("__graft_tk"), joinType)
    val upserts = (updateCols, insertCols) match {
      case (Some(u), Some(i)) =>
        if (u == i) shapedOf(src, u) // identical assignments: one pass
        else shapedOf(srcSide("left_semi"), u)
          .unionByName(shapedOf(srcSide("left_anti"), i))
      case (Some(u), None) => // update only: matched source rows
        shapedOf(srcSide("left_semi"), u)
      case (None, Some(i)) => // insert only: unmatched source rows
        shapedOf(srcSide("left_anti"), i)
      case (None, None) => target.limit(0) // delete-only: full-schema empty
    }
    val deleteKeys =
      if (delete) srcKeys.join(targetKeys, Seq(key), "left_semi")
      else srcKeys.limit(0)
    Snapshot.merge(spark, path, upserts, deleteKeys, op = "sql-merge")
    Seq.empty
  }
}

/** The analysis-time interception rule (see [[GraftDml]]), registered
  * by [[graft.GraftExtensions]] as a post-hoc resolution rule. Only
  * UPDATE/MERGE whose direct target is a graft table are touched;
  * everything else flows to Spark's own row-level machinery. */
class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(tbl, assignments, condition)
        if tbl.resolved && assignments.forall(_.resolved) &&
          condition.forall(_.resolved) =>
      GraftDml.graftTarget(tbl).map(GraftDml.rewriteUpdate(u, _)).getOrElse(u)
    case m: MergeIntoTable
        if m.targetTable.resolved && m.sourceTable.resolved &&
          m.mergeCondition.resolved =>
      GraftDml.graftTarget(m.targetTable)
        .map(GraftDml.rewriteMerge(m, _)).getOrElse(m)
    case other => other
  }
}
