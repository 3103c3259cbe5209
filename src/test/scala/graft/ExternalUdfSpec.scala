package graft

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** External UDF runtime (reference: src/expr/impl/src/udf/external.rs +
  * handler/create_function.rs): the engine is the CLIENT of a
  * user-hosted function server. The test server below is a from-scratch
  * implementation of the newline-JSON protocol — multi-connection,
  * restartable — standing in for the Arrow Flight server a deploy
  * would run.
  */
class ExternalUdfSpec extends SparkSpecBase {
  import spark.implicits._

  /** Tiny threaded UDF server: gcd(a,b), rev_upper(s), halve(x). */
  private final class TestUdfServer {
    val socket = new ServerSocket(0)
    def port: Int = socket.getLocalPort
    @volatile private var running = true

    private def evalFn(fn: String, args: List[JValue]): JValue = fn match {
      case "gcd" =>
        val (a, b) = (num(args(0)), num(args(1)))
        if (args.exists(_ == JNull)) JNull
        else JLong(BigInt(a).gcd(BigInt(b)).toLong)
      case "rev_upper" => args.head match {
        case JString(s) => JString(s.reverse.toUpperCase)
        case JNull => JNull
        case other => throw new IllegalArgumentException(s"not a string: $other")
      }
      case "halve" => args.head match {
        case JNull => JNull
        case j => JDouble(num(j).toDouble / 2.0)
      }
      case other => throw new IllegalArgumentException(s"unknown function $other")
    }

    private def num(j: JValue): Long = j match {
      case JLong(l) => l
      case JInt(i) => i.toLong
      case JDouble(d) => d.toLong
      case JDecimal(d) => d.toLong
      case _ => 0L
    }

    private val acceptThread = new Thread(() => {
      while (running) {
        try {
          val client = socket.accept()
          new Thread(() => {
            val in = new BufferedReader(new InputStreamReader(
              client.getInputStream, StandardCharsets.UTF_8))
            val out = new BufferedWriter(new OutputStreamWriter(
              client.getOutputStream, StandardCharsets.UTF_8))
            try {
              var line = in.readLine()
              while (line != null) {
                val req = JsonMethods.parse(line)
                val resp =
                  try {
                    val JString(fn) = (req \ "fn"): @unchecked
                    val JArray(rows) = (req \ "args"): @unchecked
                    JObject("results" -> JArray(rows.map {
                      case JArray(args) => evalFn(fn, args)
                      case _ => JNull
                    }))
                  } catch {
                    case e: Exception =>
                      JObject("error" -> JString(e.getMessage))
                  }
                out.write(JsonMethods.compact(JsonMethods.render(resp)))
                out.write("\n"); out.flush()
                line = in.readLine()
              }
            } catch { case _: Exception => }
            finally client.close()
          }).start()
        } catch { case _: Exception => }
      }
    })
    acceptThread.setDaemon(true)
    acceptThread.start()

    def stop(): Unit = { running = false; socket.close() }
  }

  test("CREATE FUNCTION … USING LINK: SQL-callable, typed, durable") {
    val srv = new TestUdfServer
    val wh = tmpDir("extudf")
    try {
      val e = new Engine(spark, wh)
      e.execute("CREATE TABLE nums (id BIGINT PRIMARY KEY, a BIGINT, b BIGINT)")
      e.execute("INSERT INTO nums VALUES (1, 12, 18), (2, 270, 192), (3, 7, 0)")
      e.execute("FLUSH")
      e.execute(
        s"""CREATE FUNCTION remote_gcd (a BIGINT, b BIGINT) RETURNS BIGINT
           |LANGUAGE python AS 'gcd'
           |USING LINK '127.0.0.1:${srv.port}'""".stripMargin)
      e.execute(
        s"""CREATE FUNCTION rev_upper (VARCHAR) RETURNS VARCHAR
           |AS rev_upper USING LINK '127.0.0.1:${srv.port}'""".stripMargin)

      // expression position: projection + WHERE, with implicit casts
      val got = e.execute(
        """SELECT id, remote_gcd(a, b) AS g FROM nums
          |WHERE remote_gcd(a, b) > 2 ORDER BY id""".stripMargin)
        .as[(Long, Long)].collect().toSeq
      assert(got == Seq((1L, 6L), (2L, 6L), (3L, 7L)))
      assert(e.execute("SELECT rev_upper('graft') AS r").as[String].head()
        == "TFARG")
      // NULL argument passes through (server decides; ours returns null)
      assert(e.execute("SELECT remote_gcd(NULL, 3) AS g").head().isNullAt(0))

      // unknown remote identifier propagates the server's error message
      e.execute(
        s"""CREATE FUNCTION nope (a BIGINT) RETURNS BIGINT
           |AS missing_fn USING LINK '127.0.0.1:${srv.port}'""".stripMargin)
      val err = intercept[Exception] {
        e.execute("SELECT nope(1)").collect()
      }
      assert(err.getMessage.contains("missing_fn") ||
        Option(err.getCause).exists(_.getMessage.contains("missing_fn")))

      // pg_proc surfaces the registered signature (psql \df)
      val df = e.execute(
        """SELECT proname FROM pg_catalog.pg_proc
          |WHERE proname = 'remote_gcd'""".stripMargin)
      assert(df.count() == 1)

      // durable: a fresh engine re-binds the name from the catalog
      val e2 = new Engine(spark.newSession(), wh)
      assert(e2.execute("SELECT remote_gcd(21, 6) AS g")
        .head().getLong(0) == 3L)
      // DROP removes it
      e2.execute("DROP FUNCTION remote_gcd")
      intercept[Exception] { e2.execute("SELECT remote_gcd(21, 6)").collect() }
      val e3 = new Engine(spark.newSession(), wh)
      intercept[Exception] { e3.execute("SELECT remote_gcd(21, 6)").collect() }
    } finally srv.stop()
  }

  test("batched relational path amortizes round-trips and parallelizes") {
    val srv = new TestUdfServer
    try {
      val df = spark.range(0, 1000).repartition(8)
        .select(col("id"), (col("id") % 97).as("a"), lit(51L).as("b"))
      val out = graft.functions.ExternalUdf.applyBatched(
        df, s"127.0.0.1:${srv.port}", "gcd", Seq("a", "b"), "g",
        LongType, batchSize = 64)
      val got = out.select("a", "g").distinct().as[(Long, Long)]
        .collect().toMap
      (0L until 97L).foreach { a =>
        assert(got(a) == BigInt(a).gcd(BigInt(51)).toLong,
          s"gcd($a, 51)")
      }
    } finally srv.stop()
  }

  test("pooled connection survives a server restart between batches") {
    val srv1 = new TestUdfServer
    val port = srv1.port
    val link = s"127.0.0.1:$port"
    assert(graft.functions.ExternalUdfClient.call(
      link, "halve", Seq(8.0), DoubleType) == 4.0)
    srv1.stop()
    // rebind the SAME port (the pooled socket is now dead); the old
    // listener may linger briefly — retry with SO_REUSEADDR
    val srv2 = new ServerSocket()
    srv2.setReuseAddress(true)
    var bound = false
    var tries = 0
    while (!bound && tries < 100) {
      try { srv2.bind(new java.net.InetSocketAddress(port)); bound = true }
      catch { case _: java.net.BindException =>
        tries += 1; Thread.sleep(100) }
    }
    assert(bound, s"could not rebind port $port")
    val replacement = new Thread(() => {
      try {
        val c = srv2.accept()
        val in = new BufferedReader(new InputStreamReader(c.getInputStream))
        val out = new BufferedWriter(new OutputStreamWriter(c.getOutputStream))
        val line = in.readLine()
        if (line != null) {
          out.write("""{"results": [21.0]}"""); out.write("\n"); out.flush()
        }
        c.close()
      } catch { case _: Exception => }
    })
    replacement.setDaemon(true); replacement.start()
    try {
      val v = graft.functions.ExternalUdfClient.call(
        link, "halve", Seq(42.0), DoubleType)
      assert(v == 21.0)
    } finally srv2.close()
  }
}
