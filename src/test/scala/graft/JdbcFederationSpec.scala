package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** JDBC federation (reference: src/batch/executors/src/executor/
  * postgres_query.rs, mysql_query.rs) driven against an embedded Derby
  * database — the same wire protocol and Spark JDBC relation as a remote
  * Postgres/MySQL, minus the network.
  */
class JdbcFederationSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val url: String = {
    val dir = tmpDir("derby")
    val u = s"jdbc:derby:$dir/fed;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE ext_rates (nation_key INT NOT NULL, rate DOUBLE)")
    (0 until 25).foreach { k =>
      st.execute(s"INSERT INTO ext_rates VALUES ($k, ${1.0 + k * 0.01})")
    }
    st.close(); conn.close()
    u
  }

  test("external table scan with filter pushdown into the remote SQL") {
    val df = Jdbc.table(spark, url, "ext_rates").where(col("NATION_KEY") < 10)
    assert(df.count() == 10)
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("NATION_KEY"),
      s"filter not pushed to JDBC source:\n$scan")
  }

  test("partitioned parallel read splits the scan into range strides") {
    val df = Jdbc.table(spark, url, "ext_rates",
      partitionBy = Some(("NATION_KEY", 0L, 25L, 4)))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 25)
  }

  test("remote-query TVF form: the external engine computes the result") {
    val df = Jdbc.query(spark, url,
      "SELECT MOD(nation_key, 5) AS g, COUNT(*) AS n FROM ext_rates GROUP BY MOD(nation_key, 5)")
    assert(df.count() == 5)
    assert(df.agg(sum("N")).head().getLong(0) == 25)
  }

  test("SQL TVF forms: jdbc_query(...) and file_scan(...) rewrite to scans") {
    // reference: table_function_to_file_scan_rule.rs (and the postgres/
    // mysql query TVFs) — FROM-clause table functions become scans
    val engine = new Engine(spark, tmpDir("fed-wh"))
    val fed = engine.execute(
      s"SELECT g, n FROM jdbc_query('$url', " +
        "'SELECT MOD(nation_key, 5) AS g, COUNT(*) AS n FROM ext_rates " +
        "GROUP BY MOD(nation_key, 5)') ORDER BY g")
    assert(fed.count() == 5)
    val scanned = engine.execute(
      "SELECT count(*) AS c FROM file_scan('parquet', " +
        "'/root/testdata/sf0.001/nation.parquet')")
    assert(scanned.head().getLong(0) == 25)
    // composes inside a larger query (join TVF against TVF)
    val joined = engine.execute(
      s"SELECT count(*) AS c FROM file_scan('parquet', " +
        s"'/root/testdata/sf0.001/nation.parquet') n " +
        s"JOIN jdbc_query('$url', 'SELECT nation_key FROM ext_rates') r " +
        "ON n.n_nationkey = r.NATION_KEY")
    assert(joined.head().getLong(0) == 25)
  }

  test("federated join: JDBC dimension broadcast against parquet fact") {
    Tables.register(spark, "/root/testdata/sf0.001")
    val rates = Jdbc.table(spark, url, "ext_rates")
      .select(col("NATION_KEY").as("nk"), col("RATE").as("rate"))
    val joined = spark.table("nation")
      .join(broadcast(rates), col("n_nationkey") === col("nk"))
      .select(col("n_name"), (col("n_nationkey") * col("rate")).as("adj"))
    assert(joined.count() == 25)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("secrets: lifecycle, rw_secrets names-only, use-time resolution in jdbc_query") {
    val wh = tmpDir("secrets")
    val e = new Engine(spark, wh)

    // a Derby db reachable only through the secret-resolved URL
    val dbDir = tmpDir("derby-sec")
    val url = s"jdbc:derby:$dbDir/sec;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE remote_t (id INT, v VARCHAR(10))")
    st.execute("INSERT INTO remote_t VALUES (1, 'hello')")
    st.close(); conn.close()

    e.execute(s"CREATE SECRET dburl WITH (backend = 'meta') AS '$url'")
    intercept[Exception](e.execute(s"CREATE SECRET dburl AS 'other'"))
    e.execute("CREATE SECRET IF NOT EXISTS dburl AS 'ignored'")

    // introspection lists the NAME; the payload appears nowhere
    val listed = e.execute("SHOW SECRETS").collect().map(_.getString(0))
    assert(listed.toSeq == Seq("dburl"))
    val rw = e.execute("SELECT name FROM rw_catalog.rw_secrets").collect()
    assert(rw.map(_.getString(0)).toSeq == Seq("dburl"))
    assert(!e.execute("SELECT * FROM rw_catalog.rw_secrets").columns
      .exists(_.toLowerCase.contains("value")))

    // ${secret:name} resolves at use time inside the TVF url
    val got = e.execute(
      "SELECT v FROM jdbc_query('${secret:dburl}', 'SELECT v FROM remote_t')")
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("hello"))

    // ALTER SECRET rotates the payload in place (alter_secret.rs
    // ChangeCredential): use-time resolution sees the new value
    e.execute("CREATE SECRET rot AS 'wrong-url'")
    e.execute(s"ALTER SECRET rot WITH (backend = 'meta') AS '$url'")
    assert(e.execute(
      "SELECT v FROM jdbc_query('${secret:rot}', 'SELECT v FROM remote_t')")
      .collect().map(_.getString(0)).toSeq == Seq("hello"))
    intercept[Exception](e.execute("ALTER SECRET nosuch AS 'x'"))
    e.execute("DROP SECRET rot")

    // survives restart (obfuscated at rest); unknown refs fail loudly
    val e2 = new Engine(spark.newSession(), wh)
    assert(e2.execute("SHOW SECRETS").count() == 1)
    val err = intercept[Exception](e2.execute(
      "SELECT * FROM jdbc_query('${secret:nope}', 'SELECT 1')"))
    assert(err.getMessage.contains("nope"), err.getMessage)
    e2.execute("DROP SECRET dburl")
    assert(e2.execute("SHOW SECRETS").count() == 0)
  }
}
