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

  /** Exactly-once streaming publish of a (typically complete-mode
    * aggregated) stream: every micro-batch atomically [[replace]]s the
    * warehouse table, and the epoch id commits in the SAME transaction
    * as the swap into `<table>_EPOCHS` — so a foreachBatch replay of an
    * already-published batch (the at-least-once channel's only failure
    * mode) is detected and skipped, upgrading the sink to exactly-once.
    * Readers see complete states only: old rows or new rows, never a
    * half-published epoch, across any crash/restart point.
    */
  def replaceStream(stream: DataFrame, url: String, table: String, driver: String,
                    checkpoint: String, outputMode: String = "complete",
                    batchSize: Int = 1000,
                    trigger: org.apache.spark.sql.streaming.Trigger =
                      org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(outputMode)
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, id: Long) => {
        replaceEpoch(batch, url, table, driver, id, batchSize); ()
      })
      .start()

  /** One epoch's atomic replace. Returns false (and touches nothing)
    * when `batchId` already committed — the idempotent replay path. A
    * crash between staging and swap leaves only an orphan staging
    * table that the retry overwrites; a crash after the swap's commit
    * is exactly the replay the epoch record absorbs.
    */
  def replaceEpoch(df: DataFrame, url: String, table: String, driver: String,
                   batchId: Long, batchSize: Int = 1000): Boolean = {
    requireRegular(table)
    val epochs = s"${table}_EPOCHS"
    val pre = java.sql.DriverManager.getConnection(url)
    try {
      ensureEpochs(pre, epochs)
      if (epochDone(pre, epochs, batchId)) return false
    } finally pre.close()
    // stage OUTSIDE the transaction at full write parallelism
    val stg = s"${table}_STG"
    df.write.format("jdbc")
      .option("url", url).option("dbtable", stg)
      .option("driver", driver)
      .option("batchsize", batchSize.toString)
      .mode("overwrite").save()
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      if (exists(conn, table)) st.execute(s"DROP TABLE $table")
      st.execute(s"RENAME TABLE $stg TO ${table.split('.').last}")
      val ps = conn.prepareStatement(s"INSERT INTO $epochs VALUES (?)")
      ps.setLong(1, batchId)
      ps.executeUpdate()
      ps.close()
      conn.commit()
      st.close()
      true
    } finally conn.close()
  }

  private def ensureEpochs(conn: java.sql.Connection, epochs: String): Unit = {
    val st = conn.createStatement()
    try st.execute(s"CREATE TABLE $epochs (batch_id BIGINT PRIMARY KEY)")
    catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
    finally st.close()
  }

  private def epochDone(conn: java.sql.Connection, epochs: String, batchId: Long): Boolean = {
    val ps = conn.prepareStatement(s"SELECT 1 FROM $epochs WHERE batch_id = ?")
    ps.setLong(1, batchId)
    val rs = ps.executeQuery()
    val hit = rs.next()
    rs.close(); ps.close()
    hit
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
