package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Drives [[PgWireServer]] with a from-scratch Postgres frontend client
  * (raw sockets, wire bytes assembled against the public protocol spec —
  * not the server's own code), covering SSL negotiation, startup, simple
  * queries, DDL/DML through the engine, NULLs, and the error path.
  */
class PgWireSpec extends SparkSpecBase {

  private case class Msg(tpe: Char, body: Array[Byte])

  private final class Client(port: Int, user: String = "graft",
      db: String = "dev") {
    private val sock = new Socket("127.0.0.1", port)
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))

    def startup(): Seq[Msg] = {
      out.writeInt(8); out.writeInt(80877103); out.flush() // SSLRequest
      assert(in.readByte() == 'N', "expected cleartext refusal")
      val params = (s"user\u0000${user}\u0000database\u0000$db\u0000\u0000").getBytes(UTF_8)
      out.writeInt(8 + params.length); out.writeInt(196608)
      out.write(params); out.flush()
      drainUntilReady()
    }

    private def readMsg(): Msg = {
      val t = in.readByte().toChar
      val len = in.readInt()
      val b = new Array[Byte](len - 4)
      in.readFully(b)
      Msg(t, b)
    }

    private def drainUntilReady(): Seq[Msg] = {
      val buf = scala.collection.mutable.ArrayBuffer[Msg]()
      var m = readMsg()
      while (m.tpe != 'Z') { buf += m; m = readMsg() }
      buf += m
      buf.toSeq
    }

    def query(sql: String): Seq[Msg] = {
      val b = (sql + "\u0000").getBytes(UTF_8)
      out.writeByte('Q'); out.writeInt(4 + b.length); out.write(b); out.flush()
      drainUntilReady()
    }

    def close(): Unit = {
      out.writeByte('X'); out.writeInt(4); out.flush()
      sock.close()
    }

    // ---- COPY sub-protocol ----

    /** Send a COPY … FROM STDIN query; returns the CopyInResponse. */
    def copyBegin(sql: String): Msg = {
      val b = (sql + "\u0000").getBytes(UTF_8)
      out.writeByte('Q'); out.writeInt(4 + b.length); out.write(b); out.flush()
      readMsg()
    }
    def copyData(s: String): Unit = {
      val b = s.getBytes(UTF_8)
      out.writeByte('d'); out.writeInt(4 + b.length); out.write(b)
    }
    def copyDone(): Seq[Msg] = {
      out.writeByte('c'); out.writeInt(4); out.flush()
      drainUntilReady()
    }
    def copyFail(msg: String): Seq[Msg] = {
      val b = (msg + "\u0000").getBytes(UTF_8)
      out.writeByte('f'); out.writeInt(4 + b.length); out.write(b); out.flush()
      drainUntilReady()
    }

    // ---- extended protocol ----

    private def send(tpe: Char)(body: DataOutputStream => Unit): Unit = {
      val buf = new java.io.ByteArrayOutputStream()
      body(new DataOutputStream(buf))
      out.writeByte(tpe); out.writeInt(4 + buf.size()); buf.writeTo(out)
    }
    private def c(b: DataOutputStream, s: String): Unit = {
      b.write(s.getBytes(UTF_8)); b.writeByte(0)
    }

    def parse(name: String, sql: String): Unit = send('P') { b =>
      c(b, name); c(b, sql); b.writeShort(0)
    }
    def bind(portal: String, stmt: String, params: Seq[Option[String]]): Unit =
      send('B') { b =>
        c(b, portal); c(b, stmt)
        b.writeShort(0) // param format codes: default text
        b.writeShort(params.size)
        params.foreach {
          case Some(v) =>
            val bytes = v.getBytes(UTF_8)
            b.writeInt(bytes.length); b.write(bytes)
          case None => b.writeInt(-1)
        }
        b.writeShort(0) // result formats: default text
      }
    def describePortal(portal: String): Unit = send('D') { b =>
      b.writeByte('P'); c(b, portal)
    }
    def describeStatement(stmt: String): Unit = send('D') { b =>
      b.writeByte('S'); c(b, stmt)
    }
    def executePortal(portal: String, maxRows: Int = 0): Unit = send('E') { b =>
      c(b, portal); b.writeInt(maxRows)
    }
    /** A Parse whose body lies about its param-oid count — the server
      * must error without corrupting the statement namespace.
      */
    def parseTruncated(name: String, sql: String): Unit = send('P') { b =>
      c(b, name); c(b, sql); b.writeShort(2) // declares 2 oids, sends none
    }
    /** Parse with declared parameter type OIDs (binary params need them). */
    def parseTyped(name: String, sql: String, oids: Seq[Int]): Unit =
      send('P') { b =>
        c(b, name); c(b, sql)
        b.writeShort(oids.size); oids.foreach(b.writeInt)
      }
    /** Bind with binary parameter values and one result-format code. */
    def bindBin(portal: String, stmt: String, params: Seq[Array[Byte]],
        resFmt: Int): Unit = send('B') { b =>
      c(b, portal); c(b, stmt)
      b.writeShort(1); b.writeShort(1) // all params binary
      b.writeShort(params.size)
      params.foreach { p => b.writeInt(p.length); b.write(p) }
      b.writeShort(1); b.writeShort(resFmt)
    }
    def sendBinaryBind(portal: String, stmt: String, v: String): Unit =
      send('B') { b =>
        c(b, portal); c(b, stmt)
        b.writeShort(1); b.writeShort(1) // one format code: binary
        b.writeShort(1)
        val bytes = v.getBytes(UTF_8)
        b.writeInt(bytes.length); b.write(bytes)
        b.writeShort(0)
      }
    def sync(): Seq[Msg] = {
      out.writeByte('S'); out.writeInt(4); out.flush()
      drainUntilReady()
    }

    /** Startup answering cleartext/MD5 password requests. Returns
      * Right(startup messages) on AuthenticationOk, Left(SQLSTATE) on
      * refusal. `sawMethod` records the server's auth request code.
      */
    var sawMethod: Int = -1
    def startupPassword(password: String): Either[String, Seq[Msg]] = {
      val params =
        (s"user\u0000${user}\u0000database\u0000dev\u0000\u0000").getBytes(UTF_8)
      out.writeInt(8 + params.length); out.writeInt(196608)
      out.write(params); out.flush()
      var m = readMsg()
      while (m.tpe == 'R' &&
          java.nio.ByteBuffer.wrap(m.body).getInt != 0) {
        val code = java.nio.ByteBuffer.wrap(m.body).getInt
        sawMethod = code
        def md5hex(b: Array[Byte]) = java.security.MessageDigest
          .getInstance("MD5").digest(b).map("%02x".format(_)).mkString
        val answer = code match {
          case 3 => password
          case 5 =>
            val salt = m.body.slice(4, 8)
            "md5" + md5hex(
              md5hex((password + user).getBytes(UTF_8)).getBytes(UTF_8) ++ salt)
          case other => fail(s"unexpected auth request $other")
        }
        val b = (answer + "\u0000").getBytes(UTF_8)
        out.writeByte('p'); out.writeInt(4 + b.length); out.write(b); out.flush()
        m = readMsg()
      }
      if (m.tpe == 'E') Left(errCode(m))
      else {
        val buf = scala.collection.mutable.ArrayBuffer[Msg](m)
        while (buf.last.tpe != 'Z') buf += readMsg()
        Right(buf.toSeq)
      }
    }
  }

  /** ErrorResponse body -> SQLSTATE (the 'C' field). */
  private def errCode(m: Msg): String = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(m.body))
    var code = ""
    var t = in.readByte()
    while (t != 0) {
      val sb = new StringBuilder
      var c = in.readByte()
      while (c != 0) { sb.append(c.toChar); c = in.readByte() }
      if (t == 'C') code = sb.toString
      t = in.readByte()
    }
    code
  }

  /** BackendKeyData body -> (pid, secret). */
  private def keyDataOf(msgs: Seq[Msg]): (Int, Int) = {
    val m = msgs.find(_.tpe == 'K').getOrElse(fail("no BackendKeyData"))
    val bb = java.nio.ByteBuffer.wrap(m.body)
    (bb.getInt, bb.getInt)
  }

  /** Fire a raw CancelRequest (its own short-lived socket, per spec). */
  private def sendCancel(port: Int, pid: Int, secret: Int): Unit = {
    val sock = new Socket("127.0.0.1", port)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      out.writeInt(16); out.writeInt(80877102)
      out.writeInt(pid); out.writeInt(secret); out.flush()
    } finally sock.close()
  }

  /** RowDescription body → (name, typeOid, formatCode) per column. */
  private def parseRowDescFull(m: Msg): Seq[(String, Int, Int)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(m.body))
    val n = in.readShort()
    (0 until n).map { _ =>
      val name = new StringBuilder
      var c = in.readByte()
      while (c != 0) { name.append(c.toChar); c = in.readByte() }
      in.readInt(); in.readShort()
      val oid = in.readInt()
      in.readShort(); in.readInt()
      val fmt = in.readShort()
      (name.toString, oid, fmt.toInt)
    }
  }

  private def parseRowDesc(m: Msg): Seq[(String, Int)] =
    parseRowDescFull(m).map(t => (t._1, t._2))

  /** DataRow body → raw column bytes (None = SQL NULL). */
  private def parseDataRowRaw(m: Msg): Seq[Option[Array[Byte]]] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(m.body))
    val n = in.readShort()
    (0 until n).map { _ =>
      val len = in.readInt()
      if (len < 0) None
      else { val b = new Array[Byte](len); in.readFully(b); Some(b) }
    }
  }

  /** DataRow body → column values (None = SQL NULL). */
  private def parseDataRow(m: Msg): Seq[Option[String]] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(m.body))
    val n = in.readShort()
    (0 until n).map { _ =>
      val len = in.readInt()
      if (len < 0) None
      else {
        val b = new Array[Byte](len)
        in.readFully(b)
        Some(new String(b, UTF_8))
      }
    }
  }

  private def tagOf(msgs: Seq[Msg]): String =
    msgs.find(_.tpe == 'C').map(m =>
      new String(m.body, UTF_8).stripSuffix("\u0000")).getOrElse("")

  test("pgwire: handshake, typed result sets, DDL+DML, error recovery") {
    val e = new Engine(spark, tmpDir("pgwire"))
    val srv = new PgWireServer(e)
    srv.start()
    try {
      val c = new Client(srv.port)
      val hello = c.startup()
      assert(hello.exists(m => m.tpe == 'R'), "missing AuthenticationOk")
      assert(hello.exists(m => m.tpe == 'S'), "missing ParameterStatus")
      assert(hello.last.tpe == 'Z')

      // typed SELECT with a NULL: row description carries pg OIDs,
      // values travel as text, NULL as length -1
      val sel = c.query(
        "SELECT CAST(1 AS BIGINT) AS one, 'ab' AS s, " +
          "CAST(NULL AS INT) AS n, true AS f")
      val cols = parseRowDesc(sel.find(_.tpe == 'T').get)
      assert(cols.map(_._1) == Seq("one", "s", "n", "f"))
      assert(cols.map(_._2) == Seq(20, 25, 23, 16)) // int8, text, int4, bool
      val rows = sel.filter(_.tpe == 'D').map(parseDataRow)
      assert(rows == Seq(Seq(Some("1"), Some("ab"), None, Some("t"))))
      assert(tagOf(sel) == "SELECT 1")

      // the whole SQL frontend is behind the socket: DDL + DML + readback
      c.query("CREATE TABLE pw (id BIGINT PRIMARY KEY, v DOUBLE)")
      val ins = c.query("INSERT INTO pw VALUES (1, 1.5), (2, 2.5)")
      assert(tagOf(ins).startsWith("INSERT"))
      val back = c.query("SELECT id, v FROM pw ORDER BY id")
      assert(back.filter(_.tpe == 'D').map(parseDataRow) ==
        Seq(Seq(Some("1"), Some("1.5")), Seq(Some("2"), Some("2.5"))))

      // an error mid-session answers ErrorResponse and stays usable
      val err = c.query("SELECT definitely not sql !!!")
      assert(err.exists(_.tpe == 'E'), "expected ErrorResponse")
      assert(err.last.tpe == 'Z')
      val again = c.query("SELECT 2 AS two")
      assert(again.filter(_.tpe == 'D').map(parseDataRow) ==
        Seq(Seq(Some("2"))))

      // empty query → EmptyQueryResponse
      assert(c.query("").exists(_.tpe == 'I'))

      // two concurrent clients share one engine safely
      val c2 = new Client(srv.port)
      c2.startup()
      assert(c2.query("SELECT count(*) AS n FROM pw")
        .filter(_.tpe == 'D').map(parseDataRow) == Seq(Seq(Some("2"))))
      c2.close()

      // ---- extended protocol: Parse/Bind/Describe/Execute/Sync (the
      // flow pgjdbc/psycopg drive for prepared statements) ----
      c.parse("st1", "SELECT id, v FROM pw WHERE id >= $1 ORDER BY id")
      c.bind("p1", "st1", Seq(Some("2")))
      c.describePortal("p1")
      c.executePortal("p1")
      val ext = c.sync()
      assert(ext.exists(_.tpe == '1'), "missing ParseComplete")
      assert(ext.exists(_.tpe == '2'), "missing BindComplete")
      val extCols = parseRowDesc(ext.find(_.tpe == 'T').get)
      assert(extCols.map(_._1) == Seq("id", "v"))
      // Execute must NOT repeat RowDescription after Describe
      assert(ext.count(_.tpe == 'T') == 1)
      assert(ext.filter(_.tpe == 'D').map(parseDataRow) ==
        Seq(Seq(Some("2"), Some("2.5"))))

      // re-Bind the same prepared statement with a different parameter —
      // and a string parameter goes through quoted (injection-safe)
      c.parse("st2", "SELECT $1 AS s")
      c.bind("p2", "st2", Seq(Some("o'brien")))
      c.executePortal("p2")
      val ext2 = c.sync()
      assert(ext2.filter(_.tpe == 'D').map(parseDataRow) ==
        Seq(Seq(Some("o'brien"))))

      // NULL parameter
      c.bind("p3", "st2", Seq(None))
      c.executePortal("p3")
      assert(c.sync().filter(_.tpe == 'D').map(parseDataRow) ==
        Seq(Seq(None)))

      // a parameter value CONTAINING "$1" must not be re-substituted
      // (single-pass splice — sequential replace would corrupt it)
      c.bind("p4", "st2", Seq(Some("costs $1 total")))
      c.executePortal("p4")
      assert(c.sync().filter(_.tpe == 'D').map(parseDataRow) ==
        Seq(Seq(Some("costs $1 total"))))

      // Describe on a parameterized STATEMENT: ParameterDescription ('t')
      // then NoData (un-bound placeholders cannot be planned)
      c.describeStatement("st2")
      val descS = c.sync()
      assert(descS.exists(_.tpe == 't'), "missing ParameterDescription")
      assert(descS.exists(_.tpe == 'n'), "expected NoData for unbound statement")

      // a malformed Bind (binary format code) answers ErrorResponse and
      // the connection stays usable
      c.sendBinaryBind("p5", "st2", "x")
      val bad = c.sync()
      assert(bad.exists(_.tpe == 'E'), "expected ErrorResponse for binary bind")
      assert(c.query("SELECT 3 AS three").filter(_.tpe == 'D')
        .map(parseDataRow) == Seq(Seq(Some("3"))))

      c.close()
    } finally srv.stop()
  }

  test("pgwire: SET reports reportable GUCs via ParameterStatus") {
    val e = new Engine(spark, tmpDir("pgwire-ps"))
    val srv = new PgWireServer(e)
    srv.start()
    try {
      val c = new Client(srv.port)
      c.startup()
      val msgs = c.query("SET application_name = 'wire client'")
      // CommandComplete plus ParameterStatus frames before ReadyForQuery
      assert(msgs.exists(_.tpe == 'C'))
      val statuses = msgs.filter(_.tpe == 'S').map { m =>
        val s = new String(m.body, UTF_8).split(" ")
        (s(0), s.lift(1).getOrElse(""))
      }
      assert(statuses.contains(("application_name", "wire client")))
      assert(statuses.exists(_._1 == "TimeZone"))
      // SHOW through the wire reads the same store
      val show = c.query("SHOW application_name")
      val data = show.filter(_.tpe == 'D')
      assert(data.nonEmpty)
      c.close()
    } finally {
      srv.stop()
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
  }

  test("pgwire: pg_catalog/information_schema answer psql's introspection") {
    val e = new Engine(spark, tmpDir("pgcat"))
    val srv = new PgWireServer(e)
    srv.start()
    try {
      val c = new Client(srv.port)
      c.startup()
      c.query("CREATE TABLE inv (id BIGINT PRIMARY KEY, qty INT, tag VARCHAR)")
      c.query("INSERT INTO inv VALUES (1, 5, 'a')")
      c.query("CREATE MATERIALIZED VIEW inv_mv (PRIMARY KEY (id)) AS " +
        "SELECT id, qty FROM inv")

      // psql 15's \dt, verbatim (double-quoted aliases, OPERATOR(~),
      // COLLATE, !~, pg_catalog helper functions)
      val dt = c.query(
        """SELECT n.nspname as "Schema",
          |  c.relname as "Name",
          |  CASE c.relkind WHEN 'r' THEN 'table' WHEN 'v' THEN 'view' WHEN 'm' THEN 'materialized view' WHEN 'i' THEN 'index' WHEN 'S' THEN 'sequence' WHEN 't' THEN 'TOAST table' WHEN 'f' THEN 'foreign table' WHEN 'p' THEN 'partitioned table' WHEN 'I' THEN 'partitioned index' END as "Type",
          |  pg_catalog.pg_get_userbyid(c.relowner) as "Owner"
          |FROM pg_catalog.pg_class c
          |     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
          |WHERE c.relkind IN ('r','p','')
          |      AND n.nspname <> 'pg_catalog'
          |      AND n.nspname !~ '^pg_toast'
          |      AND n.nspname <> 'information_schema'
          |  AND pg_catalog.pg_table_is_visible(c.oid)
          |ORDER BY 1,2;""".stripMargin)
      val dtRows = dt.filter(_.tpe == 'D').map(parseDataRow)
      assert(dtRows == Seq(Seq(Some("public"), Some("inv"), Some("table"),
        Some("graft"))), s"\\dt rows: $dtRows")

      // psql's name→oid resolution, then the \d column query shape
      val oid = {
        val r = c.query(
          """SELECT c.oid, n.nspname, c.relname
            |FROM pg_catalog.pg_class c
            |     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
            |WHERE c.relname OPERATOR(pg_catalog.~) '^(inv)$' COLLATE pg_catalog.default
            |  AND pg_catalog.pg_table_is_visible(c.oid)
            |ORDER BY 2, 3;""".stripMargin)
        parseDataRow(r.filter(_.tpe == 'D').head).head.get
      }
      val cols = c.query(
        s"""SELECT a.attname,
           |  pg_catalog.format_type(a.atttypid, a.atttypmod),
           |  a.attnotnull
           |FROM pg_catalog.pg_attribute a
           |WHERE a.attrelid = '$oid' AND a.attnum > 0 AND NOT a.attisdropped
           |ORDER BY a.attnum;""".stripMargin)
      assert(cols.filter(_.tpe == 'D').map(parseDataRow) == Seq(
        Seq(Some("id"), Some("bigint"), Some("f")),
        Seq(Some("qty"), Some("integer"), Some("f")),
        Seq(Some("tag"), Some("text"), Some("f"))))

      // information_schema: the ORM/JDBC introspection path
      val ist = c.query("SELECT table_name, table_type FROM " +
        "information_schema.tables ORDER BY table_name")
      assert(ist.filter(_.tpe == 'D').map(parseDataRow) == Seq(
        Seq(Some("inv"), Some("BASE TABLE")),
        Seq(Some("inv_mv"), Some("MATERIALIZED VIEW"))))
      val isc = c.query("SELECT column_name, data_type, is_nullable FROM " +
        "information_schema.columns WHERE table_name = 'inv_mv' " +
        "ORDER BY ordinal_position")
      assert(isc.filter(_.tpe == 'D').map(parseDataRow) == Seq(
        Seq(Some("id"), Some("bigint"), Some("YES")),
        Seq(Some("qty"), Some("integer"), Some("YES"))))

      // matviews are discoverable the PG way too
      val dm = c.query("SELECT schemaname, matviewname FROM pg_matviews")
      assert(dm.filter(_.tpe == 'D').map(parseDataRow) ==
        Seq(Seq(Some("public"), Some("inv_mv"))))

      // probes against unmodeled catalog concepts (policies, triggers …)
      // answer EMPTY, not an error — psql's \d flow must complete
      val pol = c.query(s"SELECT pol.polname FROM pg_catalog.pg_policy pol " +
        s"WHERE pol.polrelid = '$oid' ORDER BY 1")
      assert(!pol.exists(_.tpe == 'E') && !pol.exists(_.tpe == 'D'))

      // pg_proc: psql 15's \df, verbatim — registered functions surface
      // (native expressions, CREATE AGGREGATE UDAFs, SQL UDFs); the
      // catalog's own shims hide in pg_catalog like PG builtins
      c.query("CREATE AGGREGATE inv_hll (value ANY, op INT) " +
        "RETURNS BIGINT LANGUAGE native AS 'retractable_hll'")
      c.query("CREATE TEMPORARY FUNCTION inv_tax(x DOUBLE) " +
        "RETURNS DOUBLE RETURN x * 1.1")
      val df = c.query(
        """SELECT n.nspname as "Schema",
          |  p.proname as "Name",
          |  pg_catalog.pg_get_function_result(p.oid) as "Result data type",
          |  pg_catalog.pg_get_function_arguments(p.oid) as "Argument data types",
          | CASE p.prokind
          |  WHEN 'a' THEN 'agg'
          |  WHEN 'w' THEN 'window'
          |  WHEN 'p' THEN 'proc'
          |  ELSE 'func'
          | END as "Type"
          |FROM pg_catalog.pg_proc p
          |     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = p.pronamespace
          |WHERE pg_catalog.pg_function_is_visible(p.oid)
          |      AND n.nspname <> 'pg_catalog'
          |      AND n.nspname <> 'information_schema'
          |ORDER BY 1, 2, 4;""".stripMargin)
      val dfRows = df.filter(_.tpe == 'D').map(parseDataRow)
      val byName = dfRows.map(r => r(1).get -> r).toMap
      assert(byName.contains("graft_dot") && byName.contains("inv_hll") &&
        byName.contains("inv_tax"), s"\\df rows: $dfRows")
      assert(byName("inv_hll")(4) == Some("agg") &&
        byName("inv_hll")(2) == Some("BIGINT"), s"\\df rows: $dfRows")
      assert(byName("graft_dot")(2) == Some("double precision") &&
        byName("graft_dot")(3).exists(_.contains("double precision[]")))
      assert(!byName.contains("pg_table_is_visible"),
        "catalog shims must hide in pg_catalog")

      c.close()
    } finally srv.stop()
  }

  test("pgwire: a real psql session introspects and queries the engine") {
    val psql = new java.io.File("/usr/bin/psql")
    assume(psql.canExecute, "psql not installed — skipping live-client test")
    val e = new Engine(spark, tmpDir("pgpsql"))
    val srv = new PgWireServer(e)
    srv.start()
    try {
      def run(cmds: String*): String = {
        val pb = new ProcessBuilder(
          (Seq("/usr/bin/psql", "-h", "127.0.0.1", "-p", srv.port.toString,
            "-d", "dev", "-X", "-A") ++ cmds.flatMap(Seq("-c", _))): _*)
        pb.redirectErrorStream(true)
        val p = pb.start()
        val outS = new String(p.getInputStream.readAllBytes(), UTF_8)
        p.waitFor()
        outS
      }
      run("CREATE TABLE pt (id BIGINT PRIMARY KEY, v DOUBLE)",
        "INSERT INTO pt VALUES (1, 2.5)")
      val out = run("\\dt", "\\d pt", "SELECT id, v FROM pt")
      assert(out.contains("public|pt|table|graft"), out)
      assert(out.contains("id|bigint") && out.contains("v|double precision"), out)
      assert(out.contains("1|2.5"), out)
      assert(!out.toLowerCase.contains("error"), out)
      val dfOut = run("\\df graft_*")
      assert(dfOut.contains("graft_dot") && dfOut.contains("graft_gcd"), dfOut)
      assert(!dfOut.toLowerCase.contains("error"), dfOut)

      // schema + user UX: \dn lists schemas, \du lists roles, and a
      // schema-qualified table round-trips through psql verbatim
      run("CREATE SCHEMA psq", "CREATE USER psuser",
        "CREATE TABLE psq.pt2 (id BIGINT PRIMARY KEY, v DOUBLE)",
        "INSERT INTO psq.pt2 VALUES (7, 1.5)")
      val nsOut = run("\\dn", "\\du",
        "SELECT id, v FROM psq.pt2", "\\dt psq.*")
      assert(nsOut.contains("psq"), nsOut)
      assert(nsOut.contains("psuser"), nsOut)
      assert(nsOut.contains("7|1.5"), nsOut)
      assert(nsOut.contains("psq|pt2"), nsOut)
      assert(!nsOut.toLowerCase.contains("error"), nsOut)
    } finally srv.stop()
  }

  test("pgwire: binary result and parameter formats (psycopg3/pgjdbc binary mode)") {
    val e = new Engine(spark, tmpDir("pgbin"))
    val srv = new PgWireServer(e)
    srv.start()
    try {
      val c = new Client(srv.port)
      c.startup()

      // -- binary RESULTS: golden bytes per the public send-function
      // formats (int8/int4/int2/bool/float8/text/date/timestamp/numeric)
      c.parse("", "SELECT CAST(7 AS BIGINT) AS l, CAST(3 AS INT) AS i, " +
        "CAST(2 AS SMALLINT) AS s, true AS b, CAST(2.5 AS DOUBLE) AS d, " +
        "'ab' AS t, DATE '2000-01-02' AS dt, " +
        "TIMESTAMP '2000-01-01 00:00:01' AS ts, " +
        "CAST(-12345.678 AS DECIMAL(10,3)) AS n")
      c.bindBin("", "", Seq.empty, resFmt = 1)
      c.describePortal("")
      c.executePortal("")
      val bin = c.sync()
      val desc = parseRowDescFull(bin.find(_.tpe == 'T').get)
      assert(desc.forall(_._3 == 1), s"all columns binary-capable: $desc")
      val row = parseDataRowRaw(bin.filter(_.tpe == 'D').head).map(_.get)
      def be(n: Long, w: Int): Seq[Byte] =
        (w - 1 to 0 by -1).map(i => ((n >> (8 * i)) & 0xff).toByte)
      assert(row(0).toSeq == be(7, 8), "int8")
      assert(row(1).toSeq == be(3, 4), "int4")
      assert(row(2).toSeq == be(2, 2), "int2")
      assert(row(3).toSeq == Seq[Byte](1), "bool")
      assert(row(4).toSeq == be(java.lang.Double.doubleToLongBits(2.5), 8),
        "float8")
      assert(new String(row(5), UTF_8) == "ab", "text")
      assert(row(6).toSeq == be(1, 4), "date: days since 2000-01-01")
      assert(row(7).toSeq == be(1000000L, 8), "timestamp: µs since 2000")
      // numeric -12345.678: 3 base-10000 digits [1, 2345, 6780],
      // weight 1, sign 0x4000 (negative), dscale 3
      assert(row(8).toSeq ==
        (be(3, 2) ++ be(1, 2) ++ be(0x4000, 2) ++ be(3, 2) ++
          be(1, 2) ++ be(2345, 2) ++ be(6780, 2)), "numeric")

      // -- binary PARAMETERS: declared OIDs drive the decode
      c.parseTyped("stp", "SELECT $1 + 1 AS x, $2 AS d2", Seq(20, 1082))
      c.bindBin("pp", "stp",
        Seq(be(41, 8).toArray, be(370, 4).toArray), resFmt = 0) // 370 days → 2001-01-05
      c.executePortal("pp")
      val pr = c.sync()
      assert(pr.filter(_.tpe == 'D').map(parseDataRow) ==
        Seq(Seq(Some("42"), Some("2001-01-05"))))

      // -- a type with no binary encoding downgrades THAT column to
      // text and advertises format 0 (psycopg3 reads per-column codes)
      c.parse("sta", "SELECT array(1, 2) AS a, CAST(9 AS BIGINT) AS l9")
      c.bindBin("pa", "sta", Seq.empty, resFmt = 1)
      c.describePortal("pa")
      c.executePortal("pa")
      val mixed = c.sync()
      val mdesc = parseRowDescFull(mixed.find(_.tpe == 'T').get)
      assert(mdesc.map(_._3) == Seq(0, 1), s"array text, bigint binary: $mdesc")
      val mrow = parseDataRowRaw(mixed.filter(_.tpe == 'D').head).map(_.get)
      assert(new String(mrow(0), UTF_8) == "{1,2}")
      assert(mrow(1).toSeq == be(9, 8))

      c.close()
    } finally srv.stop()
  }

  test("pgwire: extended-protocol error recovery, maxRows, literal-aware splice") {
    val e = new Engine(spark, tmpDir("pgwire2"))
    val srv = new PgWireServer(e)
    srv.start()
    try {
      val c = new Client(srv.port)
      c.startup()
      c.query("CREATE TABLE pw2 (id BIGINT PRIMARY KEY, v DOUBLE)")
      c.query("INSERT INTO pw2 VALUES (1,1.0),(2,2.0),(3,3.0),(4,4.0),(5,5.0)")

      // -- error recovery: a failed Parse of the unnamed statement must
      // not leave the PREVIOUS query bound to '', and the pipelined
      // Bind/Execute sent before the client saw the error must be
      // DISCARDED until Sync (not answer the old query's rows)
      c.parse("", "SELECT 111 AS a")
      c.bind("", "", Seq.empty)
      c.executePortal("")
      assert(c.sync().filter(_.tpe == 'D').map(parseDataRow) ==
        Seq(Seq(Some("111"))))
      c.parseTruncated("", "SELECT 222 AS b")
      c.bind("", "", Seq.empty) // pipelined before seeing the error
      c.executePortal("")
      val rec = c.sync()
      assert(rec.exists(_.tpe == 'E'), "expected ErrorResponse")
      assert(rec.count(_.tpe == 'E') == 1, "pipelined tail must be discarded")
      assert(!rec.exists(_.tpe == 'D'),
        s"stale statement executed after failed Parse: ${rec.map(_.tpe)}")
      assert(!rec.exists(_.tpe == '2'), "Bind must be discarded in error state")
      // the failed name is gone — binding it reports unknown statement,
      // not the stale 111 query
      c.bind("", "", Seq.empty)
      val gone = c.sync()
      assert(gone.exists(_.tpe == 'E') && !gone.exists(_.tpe == 'D'))
      // and the connection is fully usable again
      c.parse("", "SELECT 333 AS cx")
      c.bind("", "", Seq.empty)
      c.executePortal("")
      assert(c.sync().filter(_.tpe == 'D').map(parseDataRow) ==
        Seq(Seq(Some("333"))))

      // -- Execute maxRows: rows arrive in chunks with PortalSuspended,
      // final chunk carries CommandComplete with the TOTAL count
      c.parse("stm", "SELECT id FROM pw2 ORDER BY id")
      c.bind("pm", "stm", Seq.empty)
      c.executePortal("pm", maxRows = 2)
      c.executePortal("pm", maxRows = 2)
      c.executePortal("pm") // drain the rest
      val chunks = c.sync()
      assert(chunks.count(_.tpe == 's') == 2, "expected two PortalSuspended")
      assert(chunks.filter(_.tpe == 'D').map(parseDataRow).flatten.flatten ==
        Seq("1", "2", "3", "4", "5"))
      assert(chunks.count(_.tpe == 'T') == 1, "one RowDescription total")
      assert(tagOf(chunks) == "SELECT 5")

      // -- a '$1' INSIDE a quoted literal in the query text is not a
      // parameter; the real $1 outside still splices
      c.parse("stl", "SELECT '$1' AS lit, $1 AS v")
      c.bind("pl", "stl", Seq(Some("X")))
      c.executePortal("pl")
      assert(c.sync().filter(_.tpe == 'D').map(parseDataRow) ==
        Seq(Seq(Some("$1"), Some("X"))))

      // -- backslashes in bound text survive byte-identically (Spark's
      // parser escape processing must not eat or weaponize them)
      c.parse("stb", "SELECT $1 AS s")
      for (v <- Seq("C:\\temp\\new", "\\' OR 1=1 --", "a\\nb")) {
        c.bind("pb", "stb", Seq(Some(v)))
        c.executePortal("pb")
        assert(c.sync().filter(_.tpe == 'D').map(parseDataRow) ==
          Seq(Seq(Some(v))), s"backslash value corrupted: $v")
      }

      c.close()
    } finally srv.stop()
  }

  test("pgwire: subscription cursor consumes table DML across epochs and survives restart") {
    // the reference's subscription consumption pattern end-to-end over
    // the wire (handler/create_subscription.rs, fetch_cursor.rs): one
    // client writes, a second client periodically FETCHes change rows
    // with _op; the cursor frontier is durable across an engine restart
    // mid-consumption.
    val wh = tmpDir("pgsub")
    val e = new Engine(spark, wh)
    val srv = new PgWireServer(e)
    srv.start()
    val writer = new Client(srv.port)
    val reader = new Client(srv.port)
    try {
      writer.startup()
      reader.startup()
      writer.query("CREATE TABLE acct (id BIGINT PRIMARY KEY, bal DOUBLE)")
      reader.query("CREATE SUBSCRIPTION acct_sub FROM acct")
      reader.query("DECLARE acur SUBSCRIPTION CURSOR FOR acct_sub")
      assert(!reader.query("FETCH NEXT FROM acur").exists(_.tpe == 'D'),
        "fresh cursor must be empty")

      def fetchRows(): Seq[Seq[Option[String]]] = {
        val msgs = reader.query("FETCH NEXT FROM acur")
        assert(!msgs.exists(_.tpe == 'E'), s"FETCH errored: $msgs")
        val fields = msgs.find(_.tpe == 'T').map(m => parseRowDesc(m).map(_._1))
          .getOrElse(Seq.empty)
        val rows = msgs.filter(_.tpe == 'D').map(parseDataRow)
        // project to (id, bal, _op) in a fixed order, sorted for compare
        rows.map { r =>
          Seq("id", "bal", "_op").map(c => r(fields.indexOf(c)))
        }.sortBy(r => (r.head.map(_.toLong), r.last.map(_.toInt)))
      }

      // epoch 1: two inserts in one statement
      writer.query("INSERT INTO acct VALUES (1, 10.0), (2, 20.0)")
      assert(fetchRows() == Seq(
        Seq(Some("1"), Some("10.0"), Some("1")),
        Seq(Some("2"), Some("20.0"), Some("1"))))

      // epoch 2+3: an update and a delete — the update delivers its
      // FULL image pair (UPDATE_INSERT=3 with the new value,
      // UPDATE_DELETE=4 with the old — reference proto/data.proto op
      // numbering), and the already-consumed inserts do NOT re-deliver
      writer.query("UPDATE acct SET bal = 25.0 WHERE id = 2")
      writer.query("DELETE FROM acct WHERE id = 1")
      assert(fetchRows() == Seq(
        Seq(Some("1"), Some("10.0"), Some("2")),
        Seq(Some("2"), Some("25.0"), Some("3")),
        Seq(Some("2"), Some("20.0"), Some("4"))))
      assert(fetchRows().isEmpty, "consumed epochs must not re-deliver")

      // unconsumed DML lands, then the engine restarts mid-consumption
      writer.query("INSERT INTO acct VALUES (3, 30.0)")
      writer.close()
      reader.close()
      srv.stop()
      val e2 = new Engine(spark.newSession(), wh)
      val srv2 = new PgWireServer(e2)
      srv2.start()
      try {
        val r2 = new Client(srv2.port)
        r2.startup()
        val msgs = r2.query("FETCH NEXT FROM acur")
        assert(!msgs.exists(_.tpe == 'E'), s"recovered FETCH errored: $msgs")
        val fields = msgs.find(_.tpe == 'T').map(m => parseRowDesc(m).map(_._1))
          .getOrElse(Seq.empty)
        val rows = msgs.filter(_.tpe == 'D').map(parseDataRow)
          .map(r => Seq("id", "bal", "_op").map(c => r(fields.indexOf(c))))
        assert(rows == Seq(Seq(Some("3"), Some("30.0"), Some("1"))),
          s"recovered cursor must resume exactly after the durable frontier: $rows")
        assert(!r2.query("FETCH NEXT FROM acur").exists(_.tpe == 'D'))
        r2.close()
      } finally srv2.stop()
    } finally srv.stop()
  }

  test("pgwire: rw_catalog relations answer the reference's introspection") {
    // the reference's own operational surface (rw_catalog/*): users list
    // relations, read definitions, follow chain dependencies, check
    // streaming-job status — all from plain SQL over the wire
    val e = new Engine(spark, tmpDir("rwcat"))
    val srv = new PgWireServer(e)
    srv.start()
    try {
      val c = new Client(srv.port)
      c.startup()
      c.query("CREATE TABLE rwt (id BIGINT PRIMARY KEY, g BIGINT, v BIGINT)")
      c.query("CREATE MATERIALIZED VIEW rwm (PRIMARY KEY (g)) AS " +
        "SELECT g, count(*) AS n FROM rwt GROUP BY g")
      c.query("CREATE VIEW rwv AS SELECT id FROM rwt")

      def rows(sql: String): Seq[Seq[Option[String]]] =
        c.query(sql).filter(_.tpe == 'D').map(parseDataRow)

      val t = rows("SELECT name, definition FROM rw_catalog.rw_tables")
      assert(t.length == 1 && t.head.head == Some("rwt"))
      assert(t.head(1).exists(_.startsWith("CREATE TABLE rwt")),
        s"definition must be re-issuable DDL: ${t.head(1)}")

      val m = rows("SELECT name, definition FROM rw_materialized_views")
      assert(m.length == 1 && m.head.head == Some("rwm"))
      assert(m.head(1).exists(_.contains("GROUP BY g")))

      val rel = rows("SELECT name, relation_type FROM rw_catalog.rw_relations " +
        "ORDER BY name")
      assert(rel.map(r => (r(0).get, r(1).get)) == Seq(
        ("rwm", "materialized view"), ("rwt", "table"), ("rwv", "view")))

      // chain dependency: rwm depends on rwt
      val dep = rows(
        """SELECT o.name, r.name FROM rw_depend d
          |JOIN rw_relations o ON o.id = d.objid
          |JOIN rw_relations r ON r.id = d.refobjid""".stripMargin)
      assert(dep == Seq(Seq(Some("rwm"), Some("rwt"))))

      // streaming job is live
      val jobs = rows("SELECT name, status FROM rw_streaming_jobs")
      assert(jobs.exists(r => r(0) == Some("rwm") && r(1) == Some("RUNNING")))

      // columns: PK flag + hidden flag with reference column names
      val cols = rows(
        """SELECT c.name, c.is_primary_key FROM rw_columns c
          |JOIN rw_tables t ON t.id = c.relation_id
          |ORDER BY c.position""".stripMargin)
      assert(cols == Seq(Seq(Some("id"), Some("t")),
        Seq(Some("g"), Some("f")), Seq(Some("v"), Some("f"))))

      // runtime-physical rw internals answer empty, not an error
      assert(rows("SELECT * FROM rw_catalog.rw_fragments").isEmpty)
      assert(rows("SELECT * FROM rw_hummock_version").isEmpty)

      // registered functions surface with language/link
      c.query("CREATE FUNCTION rwfn (a BIGINT) RETURNS BIGINT " +
        "AS some_fn USING LINK '127.0.0.1:1'")
      val fns = rows("SELECT name, language, link FROM rw_functions")
      assert(fns.exists(r => r(0) == Some("rwfn") &&
        r(2) == Some("127.0.0.1:1")))
      c.close()
    } finally {
      e.streamingJob("rwm").foreach(_.stop())
      srv.stop()
    }
  }

  test("pgwire: COPY FROM STDIN / TO STDOUT (text and csv sub-protocol)") {
    val e = new Engine(spark, tmpDir("pgcopy"))
    val srv = new PgWireServer(e)
    srv.start()
    try {
      val c = new Client(srv.port)
      c.startup()
      c.query("CREATE TABLE cp (id BIGINT PRIMARY KEY, name VARCHAR, v DOUBLE)")

      // text format: tab-separated, \N nulls; CopyInResponse advertises
      // one text-format column per COPY column
      val g = c.copyBegin("COPY cp FROM STDIN")
      assert(g.tpe == 'G', s"expected CopyInResponse, got ${g.tpe}")
      c.copyData("1\talpha\t1.5\n2\tbe")
      c.copyData("ta\t\\N\n") // rows may split across CopyData messages
      c.copyData("3\tgamma\t3.5\n")
      val done = c.copyDone()
      assert(tagOf(done) == "COPY 3", s"got '${tagOf(done)}'")
      val back = c.query("SELECT id, name, v FROM cp ORDER BY id")
        .filter(_.tpe == 'D').map(parseDataRow)
      assert(back == Seq(
        Seq(Some("1"), Some("alpha"), Some("1.5")),
        Seq(Some("2"), Some("beta"), None),
        Seq(Some("3"), Some("gamma"), Some("3.5"))))

      // csv format with HEADER and a column subset: unnamed columns null
      val g2 = c.copyBegin("COPY cp (id, name) FROM STDIN WITH (FORMAT csv, HEADER)")
      assert(g2.tpe == 'G')
      c.copyData("id,name\n4,\"de,lta\"\n5,\"say \"\"hi\"\"\"\n")
      assert(tagOf(c.copyDone()) == "COPY 2")
      val r4 = c.query("SELECT name, v FROM cp WHERE id = 4")
        .filter(_.tpe == 'D').map(parseDataRow)
      assert(r4 == Seq(Seq(Some("de,lta"), None)))
      val r5 = c.query("SELECT name FROM cp WHERE id = 5")
        .filter(_.tpe == 'D').map(parseDataRow)
      assert(r5 == Seq(Seq(Some("say \"hi\""))))

      // CopyFail aborts: nothing lands, connection stays usable
      assert(c.copyBegin("COPY cp FROM STDIN").tpe == 'G')
      c.copyData("9\tzeta\t9.9\n")
      val failed = c.copyFail("client changed its mind")
      assert(failed.exists(_.tpe == 'E'), "expected ErrorResponse after CopyFail")
      assert(c.query("SELECT count(*) AS n FROM cp").filter(_.tpe == 'D')
        .map(parseDataRow) == Seq(Seq(Some("5"))))

      // COPY TO STDOUT: CopyOutResponse, data lines, CopyDone, COPY n
      val outMsgs = c.query("COPY cp (id, name) TO STDOUT")
      assert(outMsgs.exists(_.tpe == 'H'), "expected CopyOutResponse")
      val lines = outMsgs.filter(_.tpe == 'd')
        .map(m => new String(m.body, UTF_8)).mkString
      assert(lines.contains("1\talpha\n") && lines.contains("4\tde,lta\n"))
      assert(outMsgs.exists(_.tpe == 'c'), "expected CopyDone")
      assert(tagOf(outMsgs) == "COPY 5")

      // COPY (query) TO STDOUT with csv rendering quotes the comma
      val q = c.query("COPY (SELECT name FROM cp WHERE id = 4) TO STDOUT (FORMAT csv)")
      assert(q.filter(_.tpe == 'd').map(m => new String(m.body, UTF_8))
        == Seq("\"de,lta\"\n"))

      // unknown table errors before any CopyInResponse; session survives
      val bad = c.query("COPY nope FROM STDIN")
      assert(bad.exists(_.tpe == 'E'))
      assert(c.query("SELECT 1 AS one").exists(_.tpe == 'D'))
      c.close()
    } finally srv.stop()
  }

  test("pgwire: startup user drives privilege checks; SET ROLE persists") {
    val e = new Engine(spark, tmpDir("pgwire-priv"))
    val srv = new PgWireServer(e)
    srv.start()
    try {
      // superuser connection seeds the world
      val admin = new Client(srv.port)
      admin.startup()
      admin.query("CREATE TABLE secrets (k BIGINT PRIMARY KEY, v STRING)")
      admin.query("INSERT INTO secrets VALUES (1, 'x')")
      admin.query("CREATE USER mallory")
      admin.query("CREATE USER intern")
      admin.query("GRANT SELECT ON secrets TO intern")

      // the startup message's user IS the session identity
      val mallory = new Client(srv.port, user = "mallory")
      mallory.startup()
      val denied = mallory.query("SELECT * FROM secrets")
      assert(denied.exists(_.tpe == 'E'), "expected permission denied")
      val asWho = mallory.query("SELECT current_user AS me")
      assert(new String(asWho.find(_.tpe == 'D').get.body, UTF_8)
        .contains("mallory"))

      val intern = new Client(srv.port, user = "intern")
      intern.startup()
      assert(intern.query("SELECT v FROM secrets").exists(_.tpe == 'D'))
      assert(intern.query("INSERT INTO secrets VALUES (2, 'y')")
        .exists(_.tpe == 'E'), "INSERT not granted")

      // SET ROLE persists across the connection's statements
      admin.query("SET ROLE intern")
      assert(admin.query("SELECT current_user AS me").find(_.tpe == 'D')
        .exists(m => new String(m.body, UTF_8).contains("intern")))
      assert(admin.query("DROP TABLE secrets").exists(_.tpe == 'E'),
        "intern must not drop graft's table")
      admin.query("RESET ROLE")
      assert(admin.query("DROP TABLE secrets").exists(m => m.tpe == 'C'))

      admin.close(); mallory.close(); intern.close()
    } finally srv.stop()
  }

  test("pgwire: multi-statement simple Query (psql -c 'a; b') and dollar quotes") {
    val e = new Engine(spark, tmpDir("pgwire-multi"))
    val srv = new PgWireServer(e)
    srv.start()
    try {
      val c = new Client(srv.port)
      c.startup()
      // three statements in ONE Query message: three CommandCompletes,
      // one ReadyForQuery, data rows from the SELECT
      val ms = c.query(
        "CREATE TABLE ms_t (k BIGINT PRIMARY KEY, v STRING); " +
          "INSERT INTO ms_t VALUES (1, 'a;b'); SELECT k, v FROM ms_t")
      assert(ms.count(_.tpe == 'C') == 3, ms.map(_.tpe).mkString)
      assert(ms.count(_.tpe == 'Z') == 1)
      assert(ms.exists(m => m.tpe == 'D' &&
        new String(m.body, UTF_8).contains("a;b")))

      // an error mid-batch skips the remaining statements
      val err = c.query(
        "INSERT INTO ms_t VALUES (2, 'x'); SELECT * FROM missing_tbl; " +
          "INSERT INTO ms_t VALUES (3, 'y')")
      assert(err.count(_.tpe == 'E') == 1)
      assert(err.count(_.tpe == 'C') == 1, "third statement must not run")
      val cnt = c.query("SELECT count(*) AS n FROM ms_t")
      assert(cnt.exists(m => m.tpe == 'D' &&
        new String(m.body, UTF_8).contains("2")))

      // dollar-quoted function body with semicolons survives splitting
      if (graft.functions.EmbeddedUdfRuntime.available("javascript")) {
        val fn = c.query(
          "CREATE FUNCTION msf(x BIGINT) RETURNS BIGINT LANGUAGE javascript " +
            "AS $$ function msf(x) { var y = BigInt(x) + 1n; return y; } $$; " +
            "SELECT msf(41) AS a")
        assert(fn.count(_.tpe == 'E') == 0, fn.map(m =>
          new String(m.body, UTF_8)).mkString(" / "))
        assert(fn.exists(m => m.tpe == 'D' &&
          new String(m.body, UTF_8).contains("42")))
      }
      c.close()
    } finally srv.stop()
  }

  test("pgwire: processlist, pg_stat_activity, KILL, database validation") {
    val e = new Engine(spark, tmpDir("pgwire-proc"))
    val srv = new PgWireServer(e)
    srv.start()
    try {
      val a = new Client(srv.port)
      a.startup()
      val b = new Client(srv.port)
      b.startup()

      // two live backends with pids, users, hosts
      val pl = a.query("SHOW PROCESSLIST")
      assert(pl.count(_.tpe == 'D') >= 2, pl.map(_.tpe).mkString)
      val act = a.query(
        "SELECT pid, usename, state FROM pg_stat_activity ORDER BY pid")
      assert(act.count(_.tpe == 'D') >= 2)
      assert(act.exists(m => m.tpe == 'D' &&
        new String(m.body, UTF_8).contains("graft")))

      // KILL the second backend: its socket dies, the first survives
      val pids = e.execute("SHOW PROCESSLIST")
        .select("id").collect().map(_.getInt(0)).sorted
      a.query(s"KILL ${pids.last}")
      Thread.sleep(200)
      assert(a.query("SELECT 1 AS x").exists(_.tpe == 'D'))
      assert(e.execute("SHOW PROCESSLIST").count() == 1)

      // database registry: unknown db refused at startup with 3D000,
      // created databases accepted and listed
      val bad = new Client(srv.port, user = "graft")
      intercept[Throwable] { // ErrorResponse then close → assert fails in startup
        badStartupDb(srv.port, "nope")
      }
      a.query("CREATE DATABASE extra")
      badStartupDb(srv.port, "extra") // connects fine now
      val dbs = a.query("SELECT datname FROM pg_database ORDER BY datname")
      assert(dbs.exists(m => m.tpe == 'D' &&
        new String(m.body, UTF_8).contains("extra")))
      bad.close(); a.close()
    } finally srv.stop()
  }

  test("pgwire: per-database catalog isolation across two connections") {
    val e = new Engine(spark, tmpDir("pgwire-dbiso"))
    val srv = new PgWireServer(e)
    srv.start()
    try {
      val dev = new Client(srv.port)
      dev.startup()
      dev.query("CREATE DATABASE appdb")
      val app = new Client(srv.port, db = "appdb")
      app.startup()

      def rows(ms: Seq[Msg]): Seq[String] =
        ms.filter(_.tpe == 'D').map(m => new String(m.body, UTF_8))

      // the same table name on both connections — two distinct objects
      dev.query("CREATE TABLE acct (k BIGINT PRIMARY KEY, v BIGINT)")
      dev.query("INSERT INTO acct VALUES (1, 10)")
      app.query("CREATE TABLE acct (k BIGINT PRIMARY KEY, v BIGINT)")
      app.query("INSERT INTO acct VALUES (1, 77), (2, 78)")
      assert(rows(dev.query("SELECT v FROM acct ORDER BY v"))
        .mkString.contains("10"))
      val appVals = rows(app.query("SELECT v FROM acct ORDER BY v")).mkString
      assert(appVals.contains("77") && appVals.contains("78") &&
        !appVals.contains("10"))

      // appdb's schema surface is its own: a schema created there is
      // invisible on the dev connection
      app.query("CREATE SCHEMA s1")
      app.query("CREATE TABLE s1.t (k BIGINT PRIMARY KEY)")
      assert(rows(app.query(
        "SELECT count(*) AS n FROM information_schema.tables " +
          "WHERE table_schema = 's1'")).mkString.contains("1"))
      assert(rows(dev.query(
        "SELECT count(*) AS n FROM information_schema.tables " +
          "WHERE table_schema = 's1'")).mkString.contains("0"))
      val err = dev.query("SELECT * FROM s1.t")
      assert(err.exists(_.tpe == 'E'), "dev must not see appdb's schema")

      // pg_database lists both on either connection (\l)
      Seq(dev, app).foreach { c =>
        val dbs = rows(c.query("SELECT datname FROM pg_database")).mkString
        assert(dbs.contains("dev") && dbs.contains("appdb"))
      }
      app.close(); dev.close()
    } finally srv.stop()
  }

  /** Raw startup against database `db`; throws if the server answers
    * ErrorResponse instead of AuthenticationOk.
    */
  private def badStartupDb(port: Int, db: String): Unit = {
    val sock = new Socket("127.0.0.1", port)
    try {
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val params = (s"user\u0000graft\u0000database\u0000$db\u0000\u0000").getBytes(UTF_8)
      out.writeInt(8 + params.length); out.writeInt(196608)
      out.write(params); out.flush()
      val t = in.readByte().toChar
      if (t == 'E') throw new RuntimeException("refused")
      assert(t == 'R', s"expected AuthenticationOk, got $t")
    } finally sock.close()
  }

  test("pgwire: session variables are per-connection (PG GUC semantics)") {
    val e = new Engine(spark, tmpDir("pgwire-guc"))
    val srv = new PgWireServer(e)
    srv.start()
    try {
      val a = new Client(srv.port)
      a.startup()
      val b = new Client(srv.port)
      b.startup()

      a.query("SET application_name = 'conn-a'")
      a.query("SET statement_timeout = 5000")
      def shown(c: Client, v: String): String = {
        val ms = c.query(s"SHOW $v")
        new String(ms.find(_.tpe == 'D').get.body, UTF_8)
          .replaceAll("[^ -~]", "")
      }
      assert(shown(a, "application_name").contains("conn-a"))
      // b still sees the defaults
      assert(!shown(b, "application_name").contains("conn-a"))
      assert(shown(b, "statement_timeout").contains("0"))
      // b's own SET does not leak back into a
      b.query("SET application_name = 'conn-b'")
      assert(shown(a, "application_name").contains("conn-a"))
      // RESET on a stays scoped to a
      a.query("RESET application_name")
      assert(!shown(a, "application_name").contains("conn-a"))
      assert(shown(b, "application_name").contains("conn-b"))
      a.close(); b.close()
    } finally srv.stop()
  }

  test("pgwire: password authentication — md5 and cleartext, 28P01 on mismatch") {
    val e = new Engine(spark, tmpDir("pgwire-auth"))
    e.execute("CREATE USER secured PASSWORD 'hunter2'")
    e.execute("CREATE USER open_user")
    e.execute("CREATE USER shutout NOLOGIN")

    val md5Srv = new PgWireServer(e) // md5 is the default method
    md5Srv.start()
    try {
      val ok = new Client(md5Srv.port, user = "secured")
      val r = ok.startupPassword("hunter2")
      assert(r.isRight, r)
      assert(ok.sawMethod == 5, s"expected MD5 request, got ${ok.sawMethod}")
      assert(ok.query("SELECT 7 AS x").exists(_.tpe == 'D'))
      ok.close()

      val bad = new Client(md5Srv.port, user = "secured")
      assert(bad.startupPassword("wrong") == Left("28P01"))

      // a role with no stored password connects on trust (no 'R' code 3/5)
      val open = new Client(md5Srv.port, user = "open_user")
      val ro = open.startupPassword("ignored")
      assert(ro.isRight && open.sawMethod == -1, (ro, open.sawMethod))
      open.close()

      // NOLOGIN refused before any password exchange
      val no = new Client(md5Srv.port, user = "shutout")
      assert(no.startupPassword("whatever") == Left("28000"))
    } finally md5Srv.stop()

    val clearSrv = new PgWireServer(e, 0, authMethod = "cleartext")
    clearSrv.start()
    try {
      val ok = new Client(clearSrv.port, user = "secured")
      assert(ok.startupPassword("hunter2").isRight)
      assert(ok.sawMethod == 3, s"expected cleartext request, got ${ok.sawMethod}")
      assert(ok.query("SELECT 8 AS x").exists(_.tpe == 'D'))
      ok.close()
      val bad = new Client(clearSrv.port, user = "secured")
      assert(bad.startupPassword("hunter3") == Left("28P01"))
    } finally clearSrv.stop()
  }

  test("pgwire: CancelRequest aborts the active statement, connection survives") {
    val e = new Engine(spark, tmpDir("pgwire-cancel"))
    val srv = new PgWireServer(e)
    srv.start()
    try {
      val a = new Client(srv.port)
      val hello = a.startup()
      val (pid, secret) = keyDataOf(hello)
      assert(secret != 0, "BackendKeyData must carry a real cancel secret")

      // a deliberately huge cartesian count (~1e10 pairs) — far longer
      // than the cancel round-trip
      val longSql =
        "SELECT count(*) AS c FROM (SELECT explode(sequence(1, 100000)) a) x, " +
          "(SELECT explode(sequence(1, 100000)) b) y"
      @volatile var result: Seq[Msg] = Seq.empty
      val t = new Thread(() => { result = a.query(longSql) })
      t.start()
      Thread.sleep(1500) // let planning finish and the job start

      // wrong secret: silently ignored, query keeps running
      sendCancel(srv.port, pid, secret + 1)
      Thread.sleep(300)
      assert(t.isAlive, "wrong cancel key must not abort the query")

      sendCancel(srv.port, pid, secret)
      t.join(60000)
      assert(!t.isAlive, "query did not stop after CancelRequest")
      val err = result.find(_.tpe == 'E').getOrElse(fail("expected an error"))
      assert(errCode(err) == "57014", errCode(err))

      // the connection survives a cancel (PG semantics)
      assert(a.query("SELECT 1 AS x").exists(_.tpe == 'D'))
      a.close()
    } finally srv.stop()
  }
}
