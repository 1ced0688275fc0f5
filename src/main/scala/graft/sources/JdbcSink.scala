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
  *
  * The swap DDL is dialect-pluggable ([[SwapDialect]]): `Ansi` is the
  * transactional DROP+RENAME proven e2e against embedded Derby;
  * `ClickHouse` renders the warehouse shape the reference declared —
  * `EXCHANGE TABLES` (single-statement atomic under the Atomic
  * database engine) with the epoch record landing after the swap,
  * since ClickHouse DDL has no multi-statement transactions.
  */
object JdbcSink {

  /** The atomic-publish DDL differs per warehouse; a dialect renders
    * the statement plan so the swap executor stays engine-agnostic and
    * the DDL shape is unit-testable without a server.
    *
    * @param statements    DDL to run, in order
    * @param transactional run all statements (plus the epoch record)
    *                      in ONE local transaction. Engines without
    *                      multi-statement DDL transactions (ClickHouse)
    *                      set false: their swap is a single atomic
    *                      statement, and the epoch record lands AFTER
    *                      it — a crash in between replays as re-stage +
    *                      re-swap of the same batch, which converges.
    */
  final case class SwapPlan(statements: Seq[String], transactional: Boolean)

  sealed trait SwapDialect {
    /** Publish `staging` as `live` atomically; `bareLive` is the
      * unqualified live name (some engines' RENAME targets take it).
      */
    def swapPlan(live: String, bareLive: String, staging: String,
                 liveExists: Boolean): SwapPlan
  }

  object SwapDialect {
    /** ANSI/Derby shape: transactional DDL, so DROP + RENAME commit
      * together and readers see the old table until the commit point.
      */
    case object Ansi extends SwapDialect {
      def swapPlan(live: String, bareLive: String, staging: String,
                   liveExists: Boolean): SwapPlan = SwapPlan(
        (if (liveExists) Seq(s"DROP TABLE $live") else Nil) :+
          s"RENAME TABLE $staging TO $bareLive",
        transactional = true)
    }

    /** ClickHouse shape (Atomic database engine): `EXCHANGE TABLES` is
      * the single-statement atomic swap — readers on the live name see
      * old rows or new rows, never a drop window — and the swapped-out
      * staging (now holding the PREVIOUS live rows) is dropped after.
      * First publish (no live table yet) is a plain atomic RENAME.
      * ClickHouse DDL is non-transactional, hence transactional=false;
      * see [[SwapPlan.transactional]] for why exactly-once still holds.
      */
    case object ClickHouse extends SwapDialect {
      def swapPlan(live: String, bareLive: String, staging: String,
                   liveExists: Boolean): SwapPlan = SwapPlan(
        if (liveExists)
          Seq(s"EXCHANGE TABLES $staging AND $live",
            s"DROP TABLE IF EXISTS $staging")
        else Seq(s"RENAME TABLE $staging TO $live"),
        transactional = false)
    }
  }

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
    * `createTableOptions` passes engine DDL through to the staging
    * CREATE (ClickHouse needs e.g. `ENGINE = MergeTree ORDER BY
    * tuple()`); empty means the driver's default.
    */
  def replace(df: DataFrame, url: String, table: String, driver: String,
              batchSize: Int = 1000,
              dialect: SwapDialect = SwapDialect.Ansi,
              createTableOptions: String = ""): Unit = {
    requireRegular(table)
    val stg = s"${table}_STG"
    stage(df, url, stg, driver, batchSize, createTableOptions)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      runSwap(conn, dialect.swapPlan(table, table.split('.').last, stg,
        exists(conn, table)), epoch = None)
    } finally conn.close()
  }

  private def stage(df: DataFrame, url: String, stg: String, driver: String,
                    batchSize: Int, createTableOptions: String): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url).option("dbtable", stg)
      .option("driver", driver)
      .option("batchsize", batchSize.toString)
    (if (createTableOptions.nonEmpty)
      w.option("createTableOptions", createTableOptions) else w)
      .mode("overwrite").save()
  }

  /** Execute a swap plan; `epoch = Some((epochsTable, batchId))` also
    * records the epoch — inside the same transaction when the dialect
    * is transactional, immediately after the (single-statement-atomic)
    * swap otherwise.
    */
  private def runSwap(conn: java.sql.Connection, plan: SwapPlan,
                      epoch: Option[(String, Long)]): Unit = {
    if (plan.transactional) conn.setAutoCommit(false)
    val st = conn.createStatement()
    try {
      plan.statements.foreach(st.execute)
      epoch.foreach { case (epochs, batchId) =>
        val ps = conn.prepareStatement(s"INSERT INTO $epochs VALUES (?)")
        ps.setLong(1, batchId)
        ps.executeUpdate()
        ps.close()
      }
      if (plan.transactional) conn.commit()
    } finally st.close()
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
                      org.apache.spark.sql.streaming.Trigger.AvailableNow(),
                    dialect: SwapDialect = SwapDialect.Ansi,
                    createTableOptions: String = "")
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(outputMode)
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, id: Long) => {
        replaceEpoch(batch, url, table, driver, id, batchSize,
          dialect, createTableOptions); ()
      })
      .start()

  /** One epoch's atomic replace. Returns false (and touches nothing)
    * when `batchId` already committed — the idempotent replay path. A
    * crash between staging and swap leaves only an orphan staging
    * table that the retry overwrites; a crash after the swap's commit
    * is exactly the replay the epoch record absorbs.
    */
  def replaceEpoch(df: DataFrame, url: String, table: String, driver: String,
                   batchId: Long, batchSize: Int = 1000,
                   dialect: SwapDialect = SwapDialect.Ansi,
                   createTableOptions: String = ""): Boolean = {
    requireRegular(table)
    val epochs = s"${table}_EPOCHS"
    val pre = java.sql.DriverManager.getConnection(url)
    try {
      ensureEpochs(pre, epochs)
      if (epochDone(pre, epochs, batchId)) return false
    } finally pre.close()
    // stage OUTSIDE the transaction at full write parallelism
    val stg = s"${table}_STG"
    stage(df, url, stg, driver, batchSize, createTableOptions)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      runSwap(conn, dialect.swapPlan(table, table.split('.').last, stg,
        exists(conn, table)), epoch = Some((epochs, batchId)))
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
