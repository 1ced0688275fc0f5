package graft.sources

import org.apache.spark.sql.DataFrame

/** Batch JDBC sink — the reference's declared-but-never-implemented
  * warehouse load (S10: test-backup.pyc's DAG description "loading
  * Gold to ClickHouse"; only the `clickhouse_driver` import survives).
  *
  * Spark's `df.write.jdbc` already gives the distributed INSERT path
  * (per-partition batched statements). What it does NOT give is an
  * atomic, idempotent publish: `mode("overwrite")` drops and refills
  * the LIVE table, so warehouse readers see an empty or half-loaded
  * table mid-write, and a failed job leaves the table destroyed.
  * [[replace]] restores the lake-style commit contract over a plain
  * SQL warehouse: the batch INSERTs into a fresh staging table at
  * full write parallelism, then ONE transaction swaps staging into
  * place — readers see the old rows or the new rows, never a state in
  * between, and a re-run after any failure converges because staging
  * is always rebuilt from scratch (a leftover orphan staging table is
  * simply overwritten).
  *
  * At scale the swap cost is constant (two DDL statements) regardless
  * of batch size; the data path shards per partition with
  * `batchsize`-row inserts exactly like any Spark JDBC write.
  */
object JdbcSink {

  /** Regular (unquoted) SQL identifier. The name is interpolated into
    * DDL here AND into Spark's own JDBC writer (`dbtable`), both
    * unquoted — quoting on just one side would desync against the
    * database's case-folded stored name, so instead of quoting we
    * REQUIRE names that resolve identically quoted or not, and fail
    * loudly on mixed-case/reserved/injection-shaped input.
    */
  private val RegularIdent = "^[A-Za-z_][A-Za-z0-9_$]*$".r

  private def requireRegular(table: String): Unit = {
    val parts = table.split('.')
    require(parts.length <= 2, s"table must be NAME or SCHEMA.NAME: $table")
    parts.foreach(p => require(RegularIdent.matches(p),
      s"'$p' is not a regular SQL identifier; quoted/reserved/mixed-case " +
        s"names are not supported by the staged-swap publish"))
  }

  /** Idempotent atomic replace of `table` (optionally
    * `SCHEMA.TABLE`-qualified) with the contents of `df`.
    */
  def replace(df: DataFrame, url: String, table: String, driver: String,
              batchSize: Int = 1000): Unit = {
    requireRegular(table)
    val stg = s"${table}_STG"
    df.write.format("jdbc")
      .option("url", url).option("dbtable", stg)
      .option("driver", driver)
      .option("batchsize", batchSize.toString)
      .mode("overwrite").save()
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // Derby DDL is transactional: DROP + RENAME commit together, so
      // a reader connection sees the pre-swap table until the commit
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      if (exists(conn, table)) st.execute(s"DROP TABLE $table")
      // RENAME targets take the bare (unqualified) name
      st.execute(s"RENAME TABLE $stg TO ${table.split('.').last}")
      conn.commit()
      st.close()
    } finally conn.close()
  }

  private def exists(conn: java.sql.Connection, table: String): Boolean = {
    val parts = table.split('.')
    // unqualified names resolve in the CURRENT schema — probing with a
    // null schema would match a same-named table in any schema and send
    // the swap down a DROP the unqualified statement cannot resolve
    val (schema, name) =
      if (parts.length == 2) (parts(0).toUpperCase, parts(1).toUpperCase)
      else (conn.getSchema, table.toUpperCase)
    // several drivers return null from getSchema; probing with a null
    // schema would match a same-named table in ANY schema and send the
    // swap down a DROP the unqualified statement cannot resolve —
    // demand a qualified name instead of guessing
    require(schema != null,
      s"driver reports no current schema for connection; qualify the " +
        s"table as SCHEMA.$name")
    val rs = conn.getMetaData.getTables(null, schema, name, Array("TABLE"))
    try rs.next() finally rs.close()
  }
}
