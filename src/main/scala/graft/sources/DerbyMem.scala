package graft.sources

import org.apache.spark.sql.DataFrame

/** Embedded in-memory Derby lifecycle for the JDBC demo queries and
  * specs: a uuid-named database per invocation (bench loops re-run
  * queries; Derby retains every in-memory db in driver heap for the
  * JVM's lifetime, so each use must drop its db) plus the
  * materialize-before-drop pattern for frames whose lineage still
  * points at the db.
  */
object DerbyMem {
  val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  /** Derby engine-boot properties are frozen at FIRST connection in
    * the JVM, whoever makes it — so every Derby user routes through
    * this object, and the home dir + statement log location become
    * deterministic regardless of suite/query ordering (the statement
    * log is what the JDBC e2e spec reads to prove pushdown crossed
    * the wire).
    */
  lazy val systemHome: java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("derby-home-")
    System.setProperty("derby.system.home", dir.toString)
    System.setProperty("derby.language.logStatementText", "true")
    dir
  }

  /** Run `f` against a fresh in-memory database url; always drops the
    * database afterwards (SQLState 08006 on drop = success).
    */
  def withDb[T](prefix: String)(f: String => T): T = {
    systemHome // pin engine-boot properties before any connection
    val db = prefix + java.util.UUID.randomUUID().toString.replace("-", "")
    val url = s"jdbc:derby:memory:$db;create=true"
    try f(url)
    finally {
      try java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true")
      catch { case _: java.sql.SQLException => () }
    }
  }

  /** Detach a (dimension-sized) JDBC-backed frame from its database so
    * the db can be dropped: collect + re-parallelize under the same
    * schema. Callers keep the REAL JDBC scan; only the returned handle
    * is db-independent.
    */
  def materialize(df: DataFrame): DataFrame = {
    val rows = df.collect().toSeq
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows, 1), df.schema)
  }
}
