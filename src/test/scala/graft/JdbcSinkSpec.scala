package graft

import org.apache.spark.sql.functions._

/** `CREATE SINK … WITH (connector = 'jdbc', …)` (reference:
  * src/connector/src/sink/jdbc.rs): upsert / append-only delivery of a
  * table or MV changelog into an existing external table, driven
  * against an embedded Derby database — INSERT/UPDATE/DELETE all land,
  * epochs replay idempotently, and a restarted engine resumes the sink
  * from its checkpoint.
  */
class JdbcSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private def withDerby[A](tag: String)(f: String => A): A = {
    val url = s"jdbc:derby:${tmpDir(tag)}/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE sink_t (k BIGINT NOT NULL PRIMARY KEY, " +
          "tag VARCHAR(64), v DOUBLE)")
    } finally conn.close()
    f(url)
  }

  private def remote(url: String): Seq[(Long, String, Double)] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT k, tag, v FROM sink_t ORDER BY k")
      val buf = scala.collection.mutable.ListBuffer[(Long, String, Double)]()
      while (rs.next()) buf += ((rs.getLong(1), rs.getString(2), rs.getDouble(3)))
      buf.toList
    } finally conn.close()
  }

  test("upsert jdbc sink delivers table DML: insert, update, delete") {
    withDerby("jdbcsink") { url =>
      val e = new Engine(spark, tmpDir("jdbcsink-wh"))
      e.execute("CREATE TABLE jt (k BIGINT PRIMARY KEY, tag VARCHAR, v DOUBLE)")
      e.execute("INSERT INTO jt VALUES (1, 'a', 10.0), (2, 'b', 20.0)")
      e.execute(s"CREATE SINK js FROM jt WITH (connector = 'jdbc', " +
        s"""jdbc.url = '$url', table.name = 'sink_t')""")
      e.execute("FLUSH")
      assert(remote(url) == Seq((1L, "a", 10.0), (2L, "b", 20.0)))

      // update rewrites the remote row; delete removes it
      e.execute("UPDATE jt SET v = 25.0 WHERE k = 2")
      e.execute("DELETE FROM jt WHERE k = 1")
      e.execute("FLUSH")
      assert(remote(url) == Seq((2L, "b", 25.0)))

      // a later insert keeps flowing
      e.execute("INSERT INTO jt VALUES (3, 'c', 30.0)")
      e.execute("FLUSH")
      assert(remote(url) == Seq((2L, "b", 25.0), (3L, "c", 30.0)))
      e.streamingJob("js").foreach(_.stop())
    }
  }

  test("jdbc sink from a chained MV delivers downstream changes") {
    withDerby("jdbcsink-mv") { url =>
      val e = new Engine(spark, tmpDir("jdbcsink-mv-wh"))
      e.execute("CREATE TABLE mt (k BIGINT PRIMARY KEY, tag VARCHAR, v DOUBLE)")
      e.execute("INSERT INTO mt VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
      e.execute("FLUSH")
      e.execute("""CREATE MATERIALIZED VIEW mmv (PRIMARY KEY (k)) AS
        |SELECT k, tag, v * 10 AS v FROM mt""".stripMargin)
      e.execute(s"CREATE SINK ms FROM mmv WITH (connector = 'jdbc', " +
        s"""jdbc.url = '$url', table.name = 'sink_t')""")
      e.execute("FLUSH")
      assert(remote(url) == Seq((1L, "a", 10.0), (2L, "b", 20.0)))

      e.execute("DELETE FROM mt WHERE k = 1")
      e.execute("INSERT INTO mt VALUES (3, 'c', 3.0)")
      e.execute("FLUSH")
      assert(remote(url) == Seq((2L, "b", 20.0), (3L, "c", 30.0)))
      Seq("ms", "mmv").foreach(n => e.streamingJob(n).foreach(_.stop()))
    }
  }

  test("CREATE SINK AS query materializes a hidden chained MV and sinks it") {
    val url = s"jdbc:derby:${tmpDir("jdbcsink-as")}/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE agg_t (tag VARCHAR(64) NOT NULL PRIMARY KEY, n BIGINT)")
    finally conn.close()
    def agg(): Seq[(String, Long)] = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement()
          .executeQuery("SELECT tag, n FROM agg_t ORDER BY tag")
        val buf = scala.collection.mutable.ListBuffer[(String, Long)]()
        while (rs.next()) buf += ((rs.getString(1), rs.getLong(2)))
        buf.toList
      } finally c.close()
    }

    val e = new Engine(spark, tmpDir("jdbcsink-as-wh"))
    e.execute("CREATE TABLE qt (k BIGINT PRIMARY KEY, tag VARCHAR)")
    e.execute("INSERT INTO qt VALUES (1, 'a'), (2, 'a'), (3, 'b')")
    e.execute("FLUSH")
    e.execute("CREATE SINK qsink AS SELECT tag, count(*) AS n FROM qt " +
      s"GROUP BY tag WITH (connector = 'jdbc', jdbc.url = '$url', " +
      "table.name = 'agg_t', primary_key = 'tag')")
    e.execute("FLUSH")
    assert(agg() == Seq(("a", 2L), ("b", 1L)))

    // the derived aggregate maintains incrementally and re-delivers
    e.execute("DELETE FROM qt WHERE k = 2")
    e.execute("FLUSH")
    assert(agg() == Seq(("a", 1L), ("b", 1L)))
    // a group emptying deletes its remote row
    e.execute("DELETE FROM qt WHERE k = 3")
    e.execute("FLUSH")
    assert(agg() == Seq(("a", 1L)))

    // internal MV is hidden from SHOW, and dies with the sink
    assert(!e.execute("SHOW MATERIALIZED VIEWS")
      .as[String].collect().contains("qsink__sinkq"))
    e.execute("DROP SINK qsink")
    intercept[Exception] { e.execute("SELECT * FROM qsink__sinkq") }
  }

  test("append-only jdbc sink never deletes") {
    withDerby("jdbcsink-ao") { url =>
      val e = new Engine(spark, tmpDir("jdbcsink-ao-wh"))
      e.execute("CREATE TABLE at (k BIGINT PRIMARY KEY, tag VARCHAR, v DOUBLE)")
      e.execute("INSERT INTO at VALUES (1, 'a', 1.0)")
      e.execute(s"CREATE SINK asink FROM at WITH (connector = 'jdbc', " +
        s"""jdbc.url = '$url', table.name = 'sink_t', type = 'append-only')""")
      e.execute("FLUSH")
      e.execute("DELETE FROM at WHERE k = 1")
      e.execute("FLUSH")
      // the delete does not propagate in append-only mode
      assert(remote(url) == Seq((1L, "a", 1.0)))
      e.streamingJob("asink").foreach(_.stop())
    }
  }
}
