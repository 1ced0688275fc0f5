package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, expr, lit, not}

/** Table CHECK constraints (Delta's `ALTER TABLE ADD CONSTRAINT`
  * shape): a named SQL predicate persisted in the manifest meta and
  * validated against every incoming batch — `write` (append AND
  * overwrite) and `upsert` reject a batch containing a row where the
  * predicate is FALSE (NULL passes, SQL CHECK semantics). Copy-on-write
  * DML routes through `write`, so UPDATE/MERGE rewrites are covered;
  * compactions re-arrange already-validated rows and skip the check.
  *
  * Cost model: zero when no constraints are declared; one extra pass
  * over the BATCH (never the table) per write otherwise. Declaring a
  * constraint validates the EXISTING table once — the same contract
  * Delta enforces, so a constraint can never be born violated.
  */
private[lake] object LakeChecks {
  val KeyPrefix = "graft.check:"
  def key(name: String): String = KeyPrefix + name

  def of(snap: Snapshot): Map[String, String] =
    snap.meta.collect { case (k, v) if k.startsWith(KeyPrefix) =>
      k.substring(KeyPrefix.length) -> v
    }

  /** Column names referenced by a constraint expression (unresolved
    * parse — enough to guard rename/drop of a constrained column).
    */
  def referencedCols(spark: org.apache.spark.sql.SparkSession, sqlExpr: String): Set[String] =
    spark.sessionState.sqlParser.parseExpression(sqlExpr)
      .collect { case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.name
      }.toSet

  /** Throw if any row of `df` violates a constraint (predicate FALSE;
    * NULL/unknown passes). One combined pass for all constraints.
    */
  def enforce(df: DataFrame, checks: Map[String, String], table: String): Unit = {
    if (checks.isEmpty) return
    // ONE aggregate job for all constraints: the clean batch (the
    // common case) must be fully scanned to prove cleanliness anyway,
    // so per-constraint early-exit jobs would only pay off on failure
    val ordered = checks.toSeq
    import org.apache.spark.sql.functions.{max, when}
    val aggs = ordered.zipWithIndex.map { case ((_, sqlExpr), i) =>
      max(when(not(coalesce(expr(sqlExpr), lit(true))), 1).otherwise(0)).as(s"_c$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    ordered.zipWithIndex.foreach { case ((name, sqlExpr), i) =>
      if (!row.isNullAt(i) && row.getInt(i) > 0) throw new IllegalArgumentException(
        s"CHECK constraint '$name' ($sqlExpr) violated by the batch written to $table")
    }
  }
}
