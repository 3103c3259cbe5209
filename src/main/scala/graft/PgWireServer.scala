package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** PostgreSQL wire-protocol (v3) server — the reference's actual client
  * surface (reference: src/utils/pgwire/src/pg_protocol.rs — startup,
  * simple query, row description/data/command-complete framing; any psql
  * or Postgres driver connects to it). This is the same protocol spoken
  * here over `java.net` sockets, with [[Engine.execute]] as the handler
  * behind the `Query` message, so every DDL/DML/SELECT in the SQL
  * frontend is reachable from a vanilla Postgres client.
  *
  * Protocol subset (the public spec,
  * https://www.postgresql.org/docs/current/protocol-message-formats.html):
  *  - SSLRequest / GSSENCRequest → 'N' (cleartext), then StartupMessage
  *  - AuthenticationOk (trust), ParameterStatus, BackendKeyData,
  *    ReadyForQuery
  *  - Simple query: 'Q' → RowDescription / DataRow* / CommandComplete /
  *    ReadyForQuery; empty string → EmptyQueryResponse; failures →
  *    ErrorResponse (severity/code/message) + ReadyForQuery
  *  - Extended protocol: Parse/Bind/Describe/Execute/Close/Sync/Flush,
  *    text-format parameters spliced literal-aware into `$n`, Execute's
  *    maxRows honored with PortalSuspended, and error recovery per the
  *    spec (after an error, messages are discarded until Sync)
  *  - Terminate 'X'
  * All values travel in text format (format code 0), NULL as length −1;
  * binary format codes are a documented divergence.
  *
  * Statements plan serially under the engine lock (one engine, many
  * connections); rows stream to the socket via toLocalIterator, so
  * client-bound delivery never materializes a full result server-side.
  */
final class PgWireServer(engine: Engine, requestedPort: Int = 0,
    authMethod: String = "md5") {

  private val server = new ServerSocket(requestedPort)
  @volatile private var running = false

  /** Per-connection session user (each connection runs on its own
    * thread): startup's `user` parameter seeds it; SET ROLE inside the
    * engine writes back through [[runEngine]] so the identity persists
    * across the connection's statements.
    */
  private val connUser: ThreadLocal[String] =
    ThreadLocal.withInitial(() => "graft")
  // the authenticated startup identity: SET ROLE can never move this,
  // and RESET ROLE restores it (no in-band privilege escalation)
  private val connStartupUser: ThreadLocal[String] =
    ThreadLocal.withInitial(() => "graft")
  private val connDb: ThreadLocal[String] =
    ThreadLocal.withInitial(() => "dev")
  private val connPid: ThreadLocal[Integer] =
    ThreadLocal.withInitial(() => Integer.valueOf(0))
  // each connection owns its session-variable state (PG: GUCs are
  // per-backend); installed before and captured after every statement
  private val connVars: ThreadLocal[Map[String, String]] =
    ThreadLocal.withInitial(() => Map.empty[String, String])

  /** All engine execution goes through here: one engine, many
    * connections — planning serializes on the engine monitor, and the
    * connection's user is installed for privilege checks.
    */
  private def runEngine(sql: String): DataFrame = engine.synchronized {
    engine.sessionUser = connUser.get
    engine.startupUser = connStartupUser.get
    engine.sessionDatabase = connDb.get
    engine.installSessionVars(connVars.get)
    engine.wireSessionQuery(connPid.get, sql)
    try engine.execute(sql) finally {
      connUser.set(engine.sessionUser)
      // USE <db> (reference handler/use_db.rs) re-homes the CONNECTION
      connDb.set(engine.sessionDatabase)
      connVars.set(engine.snapshotSessionVars())
      engine.wireSessionQuery(connPid.get, "")
    }
  }

  /** The bound port (useful with requestedPort = 0). */
  def port: Int = server.getLocalPort

  def start(): Unit = {
    running = true
    val t = new Thread(() => acceptLoop(), s"pgwire-accept-$port")
    t.setDaemon(true)
    t.start()
  }

  def stop(): Unit = {
    running = false
    try server.close() catch { case _: IOException => }
  }

  private def acceptLoop(): Unit =
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), s"pgwire-conn-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => // closed in stop()
        case _: IOException if !running =>
      }
    }

  // ------------------------------------------------------------ framing

  private def writeMsg(out: DataOutputStream, tpe: Byte)(body: DataOutputStream => Unit): Unit = {
    val buf = new java.io.ByteArrayOutputStream()
    body(new DataOutputStream(buf))
    out.writeByte(tpe)
    out.writeInt(4 + buf.size())
    buf.writeTo(out)
  }

  private def cstr(out: DataOutputStream, s: String): Unit = {
    out.write(s.getBytes(UTF_8)); out.writeByte(0)
  }

  private def readCString(in: DataInputStream): String = {
    val b = new java.io.ByteArrayOutputStream()
    var c = in.readByte()
    while (c != 0) { b.write(c); c = in.readByte() }
    new String(b.toByteArray, UTF_8)
  }

  // ------------------------------------------------------ type mapping

  /** Spark type → Postgres type OID (shared with the pg_catalog
    * relations so RowDescription and pg_attribute always agree).
    */
  private def oidOf(dt: DataType): Int = SystemCatalog.oidOf(dt)

  // ------------------------------------------------- binary wire format

  private val Epoch2000Micros = 946684800000000L // 2000-01-01 in µs
  private val Epoch2000Days = 10957 // days 1970-01-01 → 2000-01-01

  /** Types with a binary send/recv implemented here (the set psycopg3 /
    * pgjdbc request in binary mode). Anything else stays text and the
    * RowDescription advertises format 0 for that column.
    */
  private def binarySupported(dt: DataType): Boolean = dt match {
    case BooleanType | ShortType | ByteType | IntegerType | LongType |
         FloatType | DoubleType | StringType | BinaryType | DateType |
         TimestampType | TimestampNTZType | _: DecimalType => true
    case _ => false
  }

  /** Resolved format code for column `i` (protocol: zero codes = all
    * text, one code = applies to all, else per-column), downgraded to
    * text when no binary encoding exists for the type.
    */
  private def fmtOf(resFmts: Seq[Int], i: Int, dt: DataType): Int = {
    val raw =
      if (resFmts.isEmpty) 0
      else if (resFmts.size == 1) resFmts.head
      else resFmts(i)
    if (raw == 1 && binarySupported(dt)) 1 else 0
  }

  /** Postgres binary wire encoding (network order; pg_type send
    * functions — public format documented in the protocol spec).
    */
  private def binEncode(dt: DataType, v: Any): Array[Byte] = {
    import java.nio.ByteBuffer
    def bb(n: Int)(f: ByteBuffer => Unit): Array[Byte] = {
      val b = ByteBuffer.allocate(n); f(b); b.array()
    }
    (dt, v) match {
      case (BooleanType, b: Boolean) => Array[Byte](if (b) 1 else 0)
      case (ShortType, s: Short) => bb(2)(_.putShort(s))
      case (ByteType, x: Byte) => bb(2)(_.putShort(x.toShort))
      case (IntegerType, i: Int) => bb(4)(_.putInt(i))
      case (LongType, l: Long) => bb(8)(_.putLong(l))
      case (FloatType, f: Float) => bb(4)(_.putFloat(f))
      case (DoubleType, d: Double) => bb(8)(_.putDouble(d))
      case (StringType, s: String) => s.getBytes(UTF_8)
      case (BinaryType, a: Array[Byte]) => a
      case (DateType, d: java.sql.Date) =>
        bb(4)(_.putInt((d.toLocalDate.toEpochDay - Epoch2000Days).toInt))
      case (DateType, d: java.time.LocalDate) =>
        bb(4)(_.putInt((d.toEpochDay - Epoch2000Days).toInt))
      case (TimestampType | TimestampNTZType, t: java.sql.Timestamp) =>
        bb(8)(_.putLong(
          t.getTime * 1000L + t.getNanos / 1000L % 1000L - Epoch2000Micros))
      case (TimestampType, t: java.time.Instant) =>
        bb(8)(_.putLong(t.getEpochSecond * 1000000L +
          t.getNano / 1000L - Epoch2000Micros))
      case (TimestampNTZType, t: java.time.LocalDateTime) =>
        bb(8)(_.putLong(
          t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            t.getNano / 1000L - Epoch2000Micros))
      case (_: DecimalType, d: java.math.BigDecimal) => numericBin(d)
      case (_, other) => // declared-vs-runtime mismatch: text bytes
        render(other).getBytes(UTF_8)
    }
  }

  /** pg `numeric` binary: i16 ndigits, i16 weight (base-10000 exponent
    * of the FIRST digit group), i16 sign, i16 dscale, then base-10000
    * digit groups.
    */
  private def numericBin(d0: java.math.BigDecimal): Array[Byte] = {
    val dscale = math.max(d0.scale, 0)
    val d = if (d0.scale < 0) d0.setScale(0) else d0
    val neg = d.signum < 0
    val plain = d.abs.toPlainString
    val (intPart0, fracPart0) = plain.indexOf('.') match {
      case -1 => (plain, "")
      case i => (plain.substring(0, i), plain.substring(i + 1))
    }
    val intPart = "0" * ((4 - intPart0.length % 4) % 4) + intPart0
    val fracPart = fracPart0 + "0" * ((4 - fracPart0.length % 4) % 4)
    var groups = (intPart + fracPart).grouped(4).map(_.toShort).toVector
    var weight = intPart.length / 4 - 1
    while (groups.headOption.contains(0.toShort) && groups.size > 1) {
      groups = groups.tail; weight -= 1
    }
    while (groups.lastOption.contains(0.toShort) && groups.size > 1)
      groups = groups.dropRight(1)
    if (groups == Vector(0.toShort)) { groups = Vector.empty; weight = 0 }
    val buf = java.nio.ByteBuffer.allocate(8 + 2 * groups.size)
    buf.putShort(groups.size.toShort)
    buf.putShort(weight.toShort)
    buf.putShort(if (neg) 0x4000.toShort else 0.toShort)
    buf.putShort(dscale.toShort)
    groups.foreach(buf.putShort)
    buf.array()
  }

  /** Binary Bind parameter → its text-equivalent value (spliceParams
    * then quotes/bares it exactly like a text-format parameter).
    */
  private def binParam(oid: Int, b: Array[Byte]): String = {
    val buf = java.nio.ByteBuffer.wrap(b)
    oid match {
      case 16 => if (b.nonEmpty && b(0) != 0) "true" else "false"
      case 21 => buf.getShort.toString
      case 23 => buf.getInt.toString
      case 20 => buf.getLong.toString
      case 700 => buf.getFloat.toString
      case 701 => buf.getDouble.toString
      case 25 | 1043 | 19 | 18 => new String(b, UTF_8)
      case 1082 =>
        java.time.LocalDate.ofEpochDay(buf.getInt.toLong + Epoch2000Days)
          .toString
      case 1114 | 1184 =>
        val micros = buf.getLong + Epoch2000Micros
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
          .toString.replace('T', ' ')
      case other => throw new IllegalArgumentException(
        s"binary parameter format not supported for type oid $other")
    }
  }

  private def render(v: Any): String = v match {
    case null => null
    case b: Boolean => if (b) "t" else "f"
    // collection.Seq, not the immutable default: Row.get returns
    // mutable.ArraySeq for array columns
    case s: scala.collection.Seq[_] =>
      s.map(x => if (x == null) "NULL" else x.toString)
        .mkString("{", ",", "}") // pg array text form
    case a: Array[_] => render(a.toSeq)
    case m: Map[_, _] => m.map { case (k, x) => s"$k=>$x" }.mkString(",")
    case other => other.toString
  }

  // ------------------------------------------------------- connection

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    // extended-protocol session state: prepared statements ("" = unnamed)
    // and portals (bound statement + spliced SQL)
    val statements = scala.collection.mutable.Map[String, String]()
    val stmtParamOids = scala.collection.mutable.Map[String, Seq[Int]]()
    // portal → (spliced sql, requested result-format codes)
    val portals = scala.collection.mutable.Map[String, (String, Seq[Int])]()
    val described = scala.collection.mutable.Set[String]() // portals with 'T' sent
    // suspended portal iterators (Execute with maxRows → PortalSuspended)
    val suspended = scala.collection.mutable.Map[
      String, (java.util.Iterator[org.apache.spark.sql.Row], StructType, Long)]()
    // after an ErrorResponse inside the extended protocol, the backend
    // must discard everything until Sync (protocol spec, error recovery)
    var inErrorState = false
    var pid = 0
    try {
      if (!handshake(sock, in, out)) return
      pid = connPid.get.intValue
      // every Spark job this connection submits joins one job group so
      // a CancelRequest can abort the active statement (psql Ctrl-C);
      // interruptOnCancel reaches straggler tasks too
      engine.spark.sparkContext.setJobGroup(s"pgwire-$pid",
        s"pgwire backend $pid", interruptOnCancel = true)
      var open = true
      while (open) {
        val tpe = try in.readByte() catch { case _: EOFException => 'X'.toByte }
        val len = if (tpe == 'X') 4 else in.readInt()
        val body = new Array[Byte](math.max(len - 4, 0))
        in.readFully(body)
        val msg = new DataInputStream(new java.io.ByteArrayInputStream(body))
        // extended-protocol error → swallow the pipelined tail: a Bind/
        // Execute the client sent before seeing the error must NOT run
        // (it would bind whatever statement the name held previously)
        def extErr(code: String, m: String): Unit = {
          inErrorState = true
          errorResponse(out, code, m)
        }
        // each message body is fully consumed above, so a handler failure
        // cannot desync the stream - answer ErrorResponse and keep the
        // connection (the client's Sync gets its ReadyForQuery as usual)
        def guarded(handler: => Unit): Unit =
          try handler catch {
            case scala.util.control.NonFatal(e)
                if engine.consumeCancelFlag(connPid.get) =>
              extErr("57014", "canceling statement due to user request")
            case scala.util.control.NonFatal(e) => extErr("XX000",
              Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
          }
        /** Run (or resume) a portal, honoring Execute's maxRows with
          * PortalSuspended; rows stream via toLocalIterator — the full
          * result never materializes server-side.
          */
        def executePortal(portal: String, sql: String, maxRows: Int,
            resFmts: Seq[Int]): Unit = {
          val (it, schema, prior) = suspended.get(portal) match {
            case Some(t) => t
            case None =>
              val df = runEngine(sql)
              if (!described.contains(portal))
                rowDescription(out, df.schema, resFmts)
              (df.toLocalIterator(), df.schema, 0L)
          }
          var n = 0L
          while (it.hasNext && (maxRows <= 0 || n < maxRows)) {
            dataRow(out, schema, it.next(), resFmts); n += 1
          }
          if (it.hasNext) {
            suspended(portal) = (it, schema, prior + n)
            described += portal // a resume must not resend RowDescription
            writeMsg(out, 's') { _ => } // PortalSuspended
          } else {
            suspended.remove(portal)
            writeMsg(out, 'C')(cstr(_, commandTag(sql, prior + n)))
          }
        }
        if (inErrorState && tpe != 'S' && tpe != 'Q' && tpe != 'X') {
          // discarded: waiting for Sync
        } else tpe match {
          case 'Q' =>
            inErrorState = false // simple query resets extended-proto state
            val sql = new String(body, UTF_8).stripSuffix("\u0000").trim
            // a simple Query may carry SEVERAL ;-separated statements
            // (psql -c, migration scripts): each gets its own
            // CommandComplete, an error skips the rest, ONE ReadyForQuery
            val parts = PgWireServer.splitStatements(sql)
            if (parts.isEmpty) writeMsg(out, 'I') { _ => } // EmptyQueryResponse
            else {
              var ok = true
              parts.foreach { st =>
                if (ok) st match {
                  case PgWireServer.CopyInStmt(tbl, colList, opts) =>
                    copyIn(in, out, tbl, Option(colList), Option(opts))
                  case PgWireServer.CopyOutStmt(innerQ, tbl, colList, opts) =>
                    val q = Option(innerQ).getOrElse {
                      val cols = Option(colList).map(_.trim).filter(_.nonEmpty)
                        .getOrElse("*")
                      s"SELECT $cols FROM $tbl"
                    }
                    copyOut(out, q, Option(opts))
                  case _ => ok = runQuery(out, st)
                }
              }
            }
            readyForQuery(out)

          // ---- extended protocol (Parse/Bind/Describe/Execute/Sync) ----
          case 'P' => // Parse: name, query, declared param oids
            var name: String = null
            try {
              name = readCString(msg)
              val query = readCString(msg)
              val nTypes = msg.readShort()
              stmtParamOids(name) = (0 until nTypes).map(_ => msg.readInt())
              statements(name) = query
              writeMsg(out, '1') { _ => } // ParseComplete
            } catch {
              case scala.util.control.NonFatal(e) =>
                // a failed Parse must not leave the name bound to the
                // PREVIOUS statement — a pipelined Bind would run it
                if (name != null) {
                  statements.remove(name); stmtParamOids.remove(name)
                }
                extErr("42601",
                  Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
            }
          case 'B' => guarded { // Bind: portal, statement, formats, params
            val portal = readCString(msg)
            val stmt = readCString(msg)
            val nFmt = msg.readShort()
            val fmts = (0 until nFmt).map(_ => msg.readShort())
            val declaredOids = stmtParamOids.getOrElse(stmt, Seq.empty)
            val nParams = msg.readShort()
            val params = (0 until nParams).map { i =>
              val plen = msg.readInt()
              if (plen < 0) null
              else {
                val b = new Array[Byte](plen)
                msg.readFully(b)
                val fmt =
                  if (fmts.isEmpty) 0
                  else fmts(math.min(i, fmts.size - 1)).toInt
                if (fmt == 0) new String(b, UTF_8)
                else {
                  // binary parameter: decode by the Parse-declared OID
                  val oid = declaredOids.lift(i).filter(_ != 0).getOrElse(
                    throw new IllegalArgumentException(
                      s"binary parameter $$${i + 1} needs a declared type " +
                        "oid in Parse"))
                  binParam(oid, b)
                }
              }
            }
            // trailing result-format codes (0 text / 1 binary per column)
            val nRes = msg.readShort()
            val resFmts = (0 until nRes).map(_ => msg.readShort().toInt)
            statements.get(stmt) match {
              case Some(q) =>
                portals(portal) = (spliceParams(q, params), resFmts)
                suspended.remove(portal); described -= portal
                writeMsg(out, '2') { _ => } // BindComplete
              case None =>
                extErr("26000", s"unknown prepared statement '$stmt'")
            }
          }
          case 'D' => guarded { // Describe statement/portal
            val kind = msg.readByte().toChar
            val name = readCString(msg)
            val sqlOpt =
              if (kind == 'P') portals.get(name)
              else statements.get(name).map((_, Seq.empty[Int]))
            sqlOpt match {
              case Some((sql, resFmts)) =>
                if (kind == 'S') {
                  // ParameterDescription precedes the row description on
                  // statement describes: declared OIDs, or 0 (unspecified)
                  // per placeholder actually used in the text
                  val declared = stmtParamOids.getOrElse(name, Seq.empty)
                  val used = "\\$(\\d+)".r.findAllMatchIn(sql)
                    .map(_.group(1).toInt).maxOption.getOrElse(0)
                  val oids = if (declared.nonEmpty) declared
                    else Seq.fill(used)(0)
                  writeMsg(out, 't') { b =>
                    b.writeShort(oids.size); oids.foreach(b.writeInt)
                  }
                }
                val unbound = kind == 'S' && sql.contains("$")
                if (!isPureQuery(sql) || unbound) writeMsg(out, 'n') { _ => }
                else // schema from the analyzed plan only - no job runs
                  try {
                    val schema = runEngine(sql).schema
                    rowDescription(out, schema, resFmts)
                    if (kind == 'P') described += name
                  } catch {
                    case e: Throwable => extErr("XX000",
                      Option(e.getMessage).getOrElse("describe failed"))
                  }
              case None => extErr("34000", s"unknown $kind '$name'")
            }
          }
          case 'E' => guarded { // Execute portal (maxRows honored)
            val portal = readCString(msg)
            val maxRows = msg.readInt()
            portals.get(portal) match {
              case Some((sql, resFmts)) =>
                if (sql.trim.isEmpty) writeMsg(out, 'I') { _ => }
                else executePortal(portal, sql, maxRows, resFmts)
              case None =>
                extErr("34000", s"unknown portal '$portal'")
            }
          }
          case 'C' => guarded { // Close statement/portal
            val kind = msg.readByte().toChar
            val name = readCString(msg)
            if (kind == 'P') {
              portals.remove(name); described -= name; suspended.remove(name)
            } else { statements.remove(name); stmtParamOids.remove(name) }
            writeMsg(out, '3') { _ => } // CloseComplete
          }
          case 'S' => // Sync: end of extended-protocol batch
            inErrorState = false
            readyForQuery(out)
          case 'H' => out.flush() // Flush
          case 'X' => open = false
          case _ =>
            errorResponse(out, "0A000",
              s"unsupported frontend message '${tpe.toChar}'")
            readyForQuery(out)
        }
      }
    } catch {
      case _: EOFException | _: SocketException => // client went away
    } finally {
      if (pid != 0) engine.unregisterWireSession(pid)
      try sock.close() catch { case _: IOException => }
    }
  }

  /** Statements with no side effects - safe to plan for Describe. */
  private def isPureQuery(sql: String): Boolean =
    Seq("SELECT", "WITH", "VALUES", "TABLE", "EXPLAIN")
      .contains(sql.trim.split("\\s+").headOption.getOrElse("").toUpperCase)

  /** Splice text-format parameters into `$n` placeholders in ONE
    * left-to-right scan: spliced values are appended to the output and
    * never rescanned (a `$1` inside a bound string cannot be
    * re-substituted), and `$n` sequences INSIDE single-quoted literals
    * in the query text are left untouched (`SELECT '$1'` stays a
    * string). Numeric values go in bare (so `$1 + 1` stays arithmetic);
    * everything else as a single-quoted literal with quote doubling AND
    * backslash doubling — Spark's parser treats backslash as an escape
    * in string literals, so an unescaped `C:\temp` would gain a tab and
    * a crafted `\' OR …` would escape the literal. NULL → literal NULL.
    */
  private def spliceParams(query: String, params: Seq[String]): String = {
    if (params.isEmpty) return query
    def litOf(i: Int): String = {
      require(i >= 1 && i <= params.size,
        s"parameter $$$i out of range (${params.size} bound)")
      val v = params(i - 1)
      if (v == null) "NULL"
      else if (v.matches("[+-]?\\d+(\\.\\d+)?([eE][+-]?\\d+)?")) v
      else "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
    }
    val sb = new StringBuilder(query.length + 16)
    var i = 0
    var inQuote = false
    while (i < query.length) {
      val c = query.charAt(i)
      if (inQuote) {
        // '' doubling closes then immediately reopens — handled naturally
        sb.append(c)
        if (c == '\'') inQuote = false
        i += 1
      } else if (c == '\'') {
        sb.append(c); inQuote = true; i += 1
      } else if (c == '$' && i + 1 < query.length && query.charAt(i + 1).isDigit) {
        var j = i + 1
        while (j < query.length && query.charAt(j).isDigit) j += 1
        sb.append(litOf(query.substring(i + 1, j).toInt))
        i = j
      } else {
        sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** SSL/GSS negotiation + StartupMessage → auth ok + parameters. */
  private def handshake(sock: Socket, in: DataInputStream,
      out: DataOutputStream): Boolean = {
    var negotiating = true
    while (negotiating) {
      val len = in.readInt()
      val code = in.readInt()
      code match {
        case 80877103 | 80877104 => // SSLRequest / GSSENCRequest
          out.writeByte('N'); out.flush()
        case 196608 => // protocol 3.0: key\0value\0 … \0
          // body is NUL-separated key/value pairs (user, database, …) —
          // trust auth accepts any identity; the user name becomes the
          // connection's session user (privilege checks key off it)
          val body = new Array[Byte](len - 8)
          in.readFully(body)
          // -1: keep empty values so key/value pairing stays aligned
          new String(body, "UTF-8").split("\u0000", -1).grouped(2).foreach {
            case Array("user", u) if u.nonEmpty =>
              connUser.set(u); connStartupUser.set(u)
            case Array("database", d) if d.nonEmpty => connDb.set(d)
            case _ =>
          }
          // PG semantics: the target database must exist (3D000)
          if (!engine.databaseExists(connDb.get)) {
            errorResponse(out, "3D000",
              s"database \"${connDb.get}\" does not exist")
            out.flush()
            return false
          }
          // PG semantics: an unknown role cannot connect (28000) --
          // trust auth skips only the password, never the identity
          if (!engine.userExists(connUser.get)) {
            errorResponse(out, "28000",
              s"role \"${connUser.get}\" does not exist")
            out.flush()
            return false
          }
          if (!engine.userCanLogin(connUser.get)) {
            errorResponse(out, "28000",
              s"role \"${connUser.get}\" is not permitted to log in")
            out.flush()
            return false
          }
          // password authentication (reference pg_protocol.rs:592-596
          // AuthenticationCleartextPassword/MD5Password + pg_server.rs
          // UserAuthenticator): a role with a stored password must prove
          // it; a role without one connects on trust
          engine.userPassword(connUser.get) match {
            case Some(stored) if authMethod == "scram-sha-256" =>
              // SCRAM-SHA-256 (RFC 5802/7677, PG's default since v10 —
              // the reference speaks only cleartext/md5; this goes one
              // step further so a stock libpq with default settings
              // connects). Server-side keys derive from the stored
              // password at auth time.
              if (!scramExchange(in, out, stored)) {
                errorResponse(out, "28P01",
                  s"password authentication failed for user \"${connUser.get}\"")
                out.flush()
                return false
              }
            case Some(stored) =>
              val expected =
                if (authMethod == "cleartext") {
                  writeMsg(out, 'R')(_.writeInt(3))
                  out.flush()
                  stored
                } else { // md5: md5(md5(password + user) + salt), hex
                  val salt = new Array[Byte](4)
                  new java.security.SecureRandom().nextBytes(salt)
                  writeMsg(out, 'R') { b => b.writeInt(5); b.write(salt) }
                  out.flush()
                  "md5" + md5hex(
                    md5hex((stored + connUser.get).getBytes(UTF_8))
                      .getBytes(UTF_8) ++ salt)
                }
              val ptpe = in.readByte()
              val plen = in.readInt()
              val pbody = new Array[Byte](math.max(plen - 4, 0))
              in.readFully(pbody)
              val given = new String(pbody, UTF_8).takeWhile(_ != 0.toChar)
              if (ptpe != 'p' || given != expected) {
                errorResponse(out, "28P01",
                  s"password authentication failed for user \"${connUser.get}\"")
                out.flush()
                return false
              }
            case None => ()
          }
          negotiating = false
        case 80877102 =>
          // CancelRequest (reference pg_protocol.rs process_cancel_msg):
          // validate the BackendKeyData pair and abort the target
          // backend's active statement; never acknowledged either way
          val cpid = in.readInt()
          val csecret = in.readInt()
          engine.cancelWireQuery(cpid, csecret)
          return false
        case other =>
          errorResponse(out, "08P01", s"unsupported protocol $other")
          out.flush()
          return false
      }
    }
    writeMsg(out, 'R')(_.writeInt(0)) // AuthenticationOk (trust)
    Seq("server_version" -> "14.0 (graft)", "server_encoding" -> "UTF8",
      "client_encoding" -> "UTF8", "DateStyle" -> "ISO",
      "integer_datetimes" -> "on").foreach { case (k, v) =>
      writeMsg(out, 'S') { b => cstr(b, k); cstr(b, v) }
    }
    // BackendKeyData: the real backend pid (pg_stat_activity / KILL
    // target) + the cancel secret a CancelRequest must echo
    val pid = engine.registerWireSession(connUser.get,
      String.valueOf(sock.getRemoteSocketAddress), connDb.get,
      () => { try sock.close() catch { case _: IOException => } })
    connPid.set(Integer.valueOf(pid))
    writeMsg(out, 'K') { b =>
      b.writeInt(pid); b.writeInt(engine.wireSessionSecret(pid))
    }
    readyForQuery(out)
    true
  }

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  // ------------------------------------------------ SCRAM-SHA-256

  private def hmac256(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg)
  }

  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  /** RFC 5802 Hi() = PBKDF2-HMAC-SHA256. */
  private def saltedPassword(password: String, salt: Array[Byte],
      iters: Int): Array[Byte] = {
    val spec = new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, salt, iters, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  /** One full SCRAM-SHA-256 exchange (RFC 7677 over the PG SASL
    * messages: AuthenticationSASL → SASLInitialResponse →
    * AuthenticationSASLContinue → SASLResponse →
    * AuthenticationSASLFinal). Returns false on any mismatch; the
    * caller emits 28P01.
    */
  private def scramExchange(in: DataInputStream, out: DataOutputStream,
      password: String): Boolean = {
    val b64e = java.util.Base64.getEncoder
    val b64d = java.util.Base64.getDecoder
    // AuthenticationSASL: advertised mechanism list, NUL-terminated
    writeMsg(out, 'R') { b =>
      b.writeInt(10); cstr(b, "SCRAM-SHA-256"); b.writeByte(0)
    }
    out.flush()
    // SASLInitialResponse: mechanism cstring + int32 + client-first
    val t1 = in.readByte()
    val l1 = in.readInt()
    val body1 = new Array[Byte](math.max(l1 - 4, 0))
    in.readFully(body1)
    if (t1 != 'p') return false
    val mechEnd = body1.indexOf(0.toByte)
    if (mechEnd < 0 ||
        new String(body1, 0, mechEnd, UTF_8) != "SCRAM-SHA-256") return false
    val clientFirst = new String(body1, mechEnd + 5,
      body1.length - mechEnd - 5, UTF_8)
    // gs2 header "n,," (or "y,,"): client-first-bare follows
    val bareIdx = clientFirst.indexOf(",,")
    if (bareIdx < 0) return false
    val clientFirstBare = clientFirst.substring(bareIdx + 2)
    val clientNonce = clientFirstBare.split(",").collectFirst {
      case a if a.startsWith("r=") => a.drop(2)
    }.getOrElse(return false)

    val rnd = new java.security.SecureRandom()
    val serverNonceBytes = new Array[Byte](18); rnd.nextBytes(serverNonceBytes)
    val nonce = clientNonce + b64e.encodeToString(serverNonceBytes)
    val salt = new Array[Byte](16); rnd.nextBytes(salt)
    val iters = 4096
    val serverFirst =
      s"r=$nonce,s=${b64e.encodeToString(salt)},i=$iters"
    writeMsg(out, 'R') { b =>
      b.writeInt(11); b.write(serverFirst.getBytes(UTF_8))
    }
    out.flush()
    // SASLResponse: client-final-message
    val t2 = in.readByte()
    val l2 = in.readInt()
    val body2 = new Array[Byte](math.max(l2 - 4, 0))
    in.readFully(body2)
    if (t2 != 'p') return false
    val clientFinal = new String(body2, UTF_8)
    val attrs = clientFinal.split(",").toSeq
    val finalNonce = attrs.collectFirst {
      case a if a.startsWith("r=") => a.drop(2) }.getOrElse("")
    val proofB64 = attrs.collectFirst {
      case a if a.startsWith("p=") => a.drop(2) }.getOrElse(return false)
    if (finalNonce != nonce) return false
    val withoutProof = clientFinal.substring(0, clientFinal.indexOf(",p="))
    val authMessage =
      s"$clientFirstBare,$serverFirst,$withoutProof".getBytes(UTF_8)

    val salted = saltedPassword(password, salt, iters)
    val clientKey = hmac256(salted, "Client Key".getBytes(UTF_8))
    val storedKey = sha256(clientKey)
    val clientSig = hmac256(storedKey, authMessage)
    val proof = try b64d.decode(proofB64) catch { case _: Exception => return false }
    if (proof.length != clientSig.length) return false
    // recovered ClientKey = proof XOR signature; must hash to StoredKey
    val recovered = proof.zip(clientSig).map { case (a, b) => (a ^ b).toByte }
    if (!java.security.MessageDigest.isEqual(sha256(recovered), storedKey))
      return false
    val serverKey = hmac256(salted, "Server Key".getBytes(UTF_8))
    val serverSig = hmac256(serverKey, authMessage)
    writeMsg(out, 'R') { b =>
      b.writeInt(12)
      b.write(s"v=${b64e.encodeToString(serverSig)}".getBytes(UTF_8))
    }
    out.flush()
    true
  }

  private def readyForQuery(out: DataOutputStream): Unit = {
    writeMsg(out, 'Z')(_.writeByte('I'))
    out.flush()
  }

  private def errorResponse(out: DataOutputStream, code: String, msg: String): Unit =
    writeMsg(out, 'E') { b =>
      b.writeByte('S'); cstr(b, "ERROR")
      b.writeByte('C'); cstr(b, code)
      b.writeByte('M'); cstr(b, msg)
      b.writeByte(0)
    }

  private def commandTag(sql: String, rows: Long): String = {
    val head = sql.trim.split("\\s+").headOption.getOrElse("").toUpperCase
    head match {
      case "INSERT" => s"INSERT 0 $rows"
      case "UPDATE" => s"UPDATE $rows"
      case "DELETE" => s"DELETE $rows"
      case "SELECT" | "FETCH" | "SHOW" | "VALUES" | "WITH" | "DESCRIBE" |
           "DESC" | "EXPLAIN" | "TABLE" => s"SELECT $rows"
      case "" => "OK"
      case verb => verb // CREATE/DROP/FLUSH/…: pg answers the verb phrase
    }
  }

  private def rowDescription(out: DataOutputStream, schema: StructType,
      resFmts: Seq[Int] = Seq.empty): Unit =
    writeMsg(out, 'T') { b =>
      b.writeShort(schema.fields.length)
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        cstr(b, f.name)
        b.writeInt(0); b.writeShort(0) // origin table/attr: none
        b.writeInt(oidOf(f.dataType))
        b.writeShort(-1); b.writeInt(-1) // typlen/typmod: variable
        // advertised format matches what dataRow will send — binary
        // only where requested AND implemented for the type
        b.writeShort(fmtOf(resFmts, i, f.dataType))
      }
    }

  private def dataRow(out: DataOutputStream, schema: StructType,
      row: org.apache.spark.sql.Row, resFmts: Seq[Int] = Seq.empty): Unit =
    writeMsg(out, 'D') { b => // DataRow
      b.writeShort(schema.fields.length)
      var i = 0
      while (i < schema.fields.length) {
        val v = row.get(i)
        if (v == null) b.writeInt(-1)
        else if (fmtOf(resFmts, i, schema.fields(i).dataType) == 1) {
          val bytes = binEncode(schema.fields(i).dataType, v)
          b.writeInt(bytes.length); b.write(bytes)
        } else {
          val bytes = render(v).getBytes(UTF_8)
          b.writeInt(bytes.length); b.write(bytes)
        }
        i += 1
      }
    }

  /** Execute + stream the result row by row (`toLocalIterator` — one
    * partition resident at a time, so a large SELECT from one client
    * cannot OOM the shared engine process).
    */
  /** Run one statement of a simple-Query message; false on error (the
    * remaining statements of a multi-statement message must be skipped,
    * per the protocol spec).
    */
  private def runQuery(out: DataOutputStream, sql: String): Boolean =
    try {
      // one engine, many connections: serialize statement planning; row
      // delivery streams outside the lock (Spark jobs are thread-safe)
      val df: DataFrame = runEngine(sql)
      val schema = df.schema
      rowDescription(out, schema)
      val it = df.toLocalIterator()
      var n = 0L
      while (it.hasNext) { dataRow(out, schema, it.next()); n += 1 }
      writeMsg(out, 'C')(cstr(_, commandTag(sql, n)))
      // PG reports reportable-GUC changes via ParameterStatus after a
      // successful SET/RESET — psql/pgjdbc track TimeZone etc. this way
      if (sql.matches("(?is)\\s*(SET|RESET)\\b.*")) reportParameters(out)
      true
    } catch {
      case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
        if (engine.consumeCancelFlag(connPid.get))
          errorResponse(out, "57014",
            "canceling statement due to user request")
        else
          errorResponse(out, "XX000", msg.linesIterator.take(4).mkString(" | "))
        false
    }

  /** PG's reportable GUCs (protocol name casing preserved). */
  private val ReportableVars = Seq(
    "client_encoding" -> "client_encoding",
    "datestyle" -> "DateStyle",
    "timezone" -> "TimeZone",
    "application_name" -> "application_name",
    "intervalstyle" -> "IntervalStyle",
    "standard_conforming_strings" -> "standard_conforming_strings")

  private def reportParameters(out: DataOutputStream): Unit =
    ReportableVars.foreach { case (n, wire) =>
      engine.sessionVariable(n).foreach { v =>
        writeMsg(out, 'S') { b => cstr(b, wire); cstr(b, v) }
      }
    }

  // ------------------------------------------------------------ COPY
  // (reference: handler/copy.rs — COPY routes through the DML plan; the
  // wire sub-protocol is the PG spec's CopyInResponse/CopyData/CopyDone
  // flow that psql's \copy and pgjdbc's CopyManager bulk loads ride on)

  /** COPY table [(cols)] FROM STDIN [WITH (...)]: stream CopyData into
    * a buffer, parse with Spark's CSV reader (text format = tab
    * delimiter + \N nulls + no quoting; csv format = PG's doubled
    * quotes), land through [[Engine.copyInto]] under one DML epoch.
    */
  private def copyIn(in: DataInputStream, out: DataOutputStream,
      table: String, colList: Option[String], opts: Option[String]): Unit = {
    import org.apache.spark.sql.types.StructType
    val schemaE =
      try Right(engine.synchronized(engine.table(table).schema))
      catch { case e: Exception =>
        Left(Option(e.getMessage).getOrElse(e.toString)) }
    schemaE match {
      case Left(msg) =>
        errorResponse(out, "42P01", msg.linesIterator.take(2).mkString(" | "))
      case Right(schema) =>
        val cols = colList.map(_.split(",").map(_.trim).toSeq)
          .getOrElse(schema.fieldNames.toSeq)
        val optsL = opts.map(_.toLowerCase).getOrElse("")
        val csv = optsL.contains("csv")
        val header = optsL.contains("header")
        writeMsg(out, 'G') { b => // CopyInResponse, all-text columns
          b.writeByte(0); b.writeShort(cols.length)
          cols.foreach(_ => b.writeShort(0))
        }
        out.flush()
        val buf = new java.io.ByteArrayOutputStream()
        var done = false
        var failed: Option[String] = None
        while (!done) {
          val tpe = in.readByte()
          val len = in.readInt()
          val body = new Array[Byte](math.max(len - 4, 0))
          in.readFully(body)
          tpe match {
            case 'd' => buf.write(body)
            case 'c' => done = true
            case 'f' =>
              failed = Some(new String(body, UTF_8).takeWhile(_ != '\u0000'))
              done = true
            case _ => // Flush/Sync mid-copy: ignore
          }
        }
        failed match {
          case Some(msg) =>
            errorResponse(out, "57014", s"COPY aborted by client: $msg")
          case None => try {
            val lines0 = new String(buf.toByteArray, UTF_8)
              .split("\n").toSeq.map(_.stripSuffix("\r"))
              .filter(l => l.nonEmpty && l != "\\.")
            val lines = if (header) lines0.drop(1) else lines0
            val subSchema = StructType(cols.map(c =>
              schema.find(_.name == c).getOrElse(
                throw new IllegalArgumentException(
                  s"COPY $table: no such column $c"))))
            val spark = engine.spark
            import spark.implicits._
            val reader = spark.read.schema(subSchema)
            val parsed =
              (if (csv) reader.option("escape", "\"")
               else reader.option("delimiter", "\t")
                 .option("nullValue", "\\N").option("quote", "\u0000"))
                .csv(spark.createDataset(lines))
            val n = engine.synchronized {
              engine.sessionUser = connUser.get
              engine.startupUser = connStartupUser.get
              engine.sessionDatabase = connDb.get
              engine.copyInto(table, parsed)
            }
            writeMsg(out, 'C')(cstr(_, s"COPY $n"))
          } catch {
            case e: Throwable => errorResponse(out, "XX000",
              Option(e.getMessage).getOrElse(e.toString)
                .linesIterator.take(4).mkString(" | "))
          }
        }
    }
  }

  /** COPY {table [(cols)] | (query)} TO STDOUT [WITH (...)]: stream the
    * result as CopyData lines (text or csv rendering), CopyDone,
    * `COPY n`. Rows stream via toLocalIterator like plain queries.
    */
  private def copyOut(out: DataOutputStream, query: String,
      opts: Option[String]): Unit =
    try {
      val df: DataFrame = runEngine(query)
      val schema = df.schema
      val csv = opts.exists(_.toLowerCase.contains("csv"))
      writeMsg(out, 'H') { b => // CopyOutResponse, all-text columns
        b.writeByte(0); b.writeShort(schema.length)
        schema.foreach(_ => b.writeShort(0))
      }
      val it = df.toLocalIterator()
      var n = 0L
      while (it.hasNext) {
        val row = it.next()
        val line = schema.indices.map { i =>
          if (row.isNullAt(i)) { if (csv) "" else "\\N" }
          else {
            val v = render(row.get(i))
            if (csv) {
              if (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
                "\"" + v.replace("\"", "\"\"") + "\""
              else v
            } else v.replace("\\", "\\\\").replace("\t", "\\t")
              .replace("\n", "\\n").replace("\r", "\\r")
          }
        }.mkString(if (csv) "," else "\t") + "\n"
        writeMsg(out, 'd')(_.write(line.getBytes(UTF_8)))
        n += 1
      }
      writeMsg(out, 'c') { _ => } // CopyDone
      writeMsg(out, 'C')(cstr(_, s"COPY $n"))
    } catch {
      case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
        errorResponse(out, "XX000", msg.linesIterator.take(4).mkString(" | "))
    }
}

object PgWireServer {

  /** Split a simple-Query payload into its ;-separated statements,
    * honoring single-quoted literals ('' doubling), double-quoted
    * identifiers, and dollar-quoted bodies ($$…$$ / $tag$…$tag$ — the
    * quoting CREATE FUNCTION bodies arrive in).
    */
  private[graft] def splitStatements(sql: String): Seq[String] = {
    val stmts = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    var inSingle = false
    var inDouble = false
    var dollarTag: String = null
    val DollarRe = java.util.regex.Pattern.compile("\\$[A-Za-z_0-9]*\\$")
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inSingle) { cur.append(c); if (c == '\'') inSingle = false; i += 1 }
      else if (inDouble) { cur.append(c); if (c == '"') inDouble = false; i += 1 }
      else if (dollarTag != null) {
        if (c == '$' && sql.startsWith(dollarTag, i)) {
          cur.append(dollarTag); i += dollarTag.length; dollarTag = null
        } else { cur.append(c); i += 1 }
      } else c match {
        case '\'' => inSingle = true; cur.append(c); i += 1
        case '"' => inDouble = true; cur.append(c); i += 1
        case '$' =>
          val m = DollarRe.matcher(sql); m.region(i, sql.length)
          if (m.lookingAt()) {
            dollarTag = m.group(); cur.append(dollarTag); i += dollarTag.length
          } else { cur.append(c); i += 1 }
        case ';' => stmts += cur.toString; cur.clear(); i += 1
        case _ => cur.append(c); i += 1
      }
    }
    stmts += cur.toString
    stmts.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private[graft] val CopyInStmt =
    """(?is)\s*COPY\s+(\w+)\s*(?:\(([^)]*)\))?\s+FROM\s+STDIN\s*(?:WITH\s*)?(?:\(([^)]*)\))?\s*;?\s*""".r
  private[graft] val CopyOutStmt =
    """(?is)\s*COPY\s+(?:\((.+)\)|(\w+)\s*(?:\(([^)]*)\))?)\s+TO\s+STDOUT\s*(?:WITH\s*)?(?:\(([^)]*)\))?\s*;?\s*""".r
}
