package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute,
  UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteFromTable, InsertStarAction, LogicalPlan, MergeIntoTable,
  SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.functions.expr

/** SQL-text DML for the manifest store — the `DELETE FROM` / `UPDATE`
  * / `MERGE INTO` front every Delta/Iceberg deployment gives the
  * reference's lakehouse user (reference docker-compose.yml:335-345
  * ships a Trino+Iceberg pair whose whole point is SQL writes).
  *
  * Statements are parsed by Spark's OWN parser — no second grammar, no
  * dialect drift — and dispatched on the parsed logical plan:
  * [[DeleteFromTable]] / [[UpdateTable]] route to the store's
  * stats-bounded copy-on-write DML, [[MergeIntoTable]] (the
  * `UPDATE SET * / INSERT *` upsert form) to its keyed CoW merge.
  * Predicates and assignment values travel as the parsed expressions'
  * own SQL rendering, so anything Spark can parse inside a WHERE/SET
  * reaches the store unchanged. A MERGE source is any registered view
  * or table — resolved through the session catalog exactly like a
  * read-side FROM.
  */
object StoreSql {

  /** Execute one DML statement against `tables` (view name → store).
    * `batchId` is the commit id a MERGE's inserted rows land under
    * (replay-refused like any append; unused by DELETE/UPDATE).
    */
  def exec(spark: SparkSession, tables: Map[String, ManifestTableStore],
      sql: String, batchId: Long = 0L): Unit = {
    def storeOf(rel: LogicalPlan): ManifestTableStore = {
      val name = relationName(rel).getOrElse(
        throw new IllegalArgumentException(
          s"DML target must be a bare table name, got: $rel"))
      tables.getOrElse(name, throw new IllegalArgumentException(
        s"unknown DML target '$name' (known: ${tables.keys.mkString(", ")})"))
    }
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case d: DeleteFromTable =>
        val store = storeOf(d.table)
        store.morDeleteKey match {
          case Some(keyCol) =>
            store.deleteMoR(spark, d.condition.sql, keyCol)
          case None => store.delete(spark, d.condition.sql)
        }
      case u: UpdateTable =>
        val pred = u.condition.getOrElse(
          throw new IllegalArgumentException(
            "UPDATE without WHERE is refused (full-table rewrite); " +
              "add an explicit TRUE predicate if intended")).sql
        val set = u.assignments.map { case Assignment(k, v) =>
          attrName(k) -> expr(v.sql)
        }.toMap
        storeOf(u.table).update(spark, pred, set)
      case m: MergeIntoTable =>
        require(m.matchedActions == Seq(UpdateStarAction(None)),
          "MERGE supports exactly WHEN MATCHED THEN UPDATE SET *")
        require(m.notMatchedActions == Seq(InsertStarAction(None)),
          "MERGE supports exactly WHEN NOT MATCHED THEN INSERT *")
        require(m.notMatchedBySourceActions.isEmpty,
          "WHEN NOT MATCHED BY SOURCE is not supported")
        val key = m.mergeCondition match {
          case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
              if a.nameParts.last == b.nameParts.last =>
            a.nameParts.last
          case other => throw new IllegalArgumentException(
            "MERGE condition must be target.k = source.k on one key " +
              s"column, got: ${other.sql}")
        }
        val srcName = relationName(m.sourceTable).getOrElse(
          throw new IllegalArgumentException(
            s"MERGE source must be a named view/table, got: ${m.sourceTable}"))
        storeOf(m.targetTable).merge(spark, spark.table(srcName), key,
          batchId)
      case other => throw new IllegalArgumentException(
        s"not a store DML statement: ${other.getClass.getSimpleName}")
    }
  }

  private def relationName(plan: LogicalPlan): Option[String] = plan match {
    case r: UnresolvedRelation => Some(r.multipartIdentifier.last)
    case SubqueryAlias(_, child) => relationName(child)
    case _ => None
  }

  private def attrName(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case other => throw new IllegalArgumentException(
      s"SET target must be a column name, got: ${other.sql}")
  }
}
