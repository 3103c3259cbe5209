package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Engine, GraftSession, PgWireServer}

/** Serve an engine over the Postgres wire protocol — the reference's
  * server-binary analog (reference: src/cmd_all/ starts frontend+meta+
  * compute; here one JVM hosts Spark + engine + pgwire).
  *
  * Usage: runMain graft.tools.PgServe [port] [warehouseDir]
  * Then: `psql -h 127.0.0.1 -p <port> -d dev` — DDL/DML/queries and
  * psql introspection (\dt, \d, \dn ...) run against the live engine;
  * the durable catalog recovers the warehouse on restart.
  */
object PgServe {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(5433)
    val wh = if (args.length > 1) args(1) else "/tmp/graft-warehouse"
    val spark = GraftSession.configure(
      SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"))
      .getOrCreate()
    GraftSession.init(spark)
    spark.sparkContext.setLogLevel("WARN")
    val engine = new Engine(spark, wh)
    val srv = new PgWireServer(engine, port)
    srv.start()
    println(s"[pgserve] listening on 127.0.0.1:${srv.port}, warehouse=$wh")
    Thread.currentThread().join() // serve until killed
  }
}
