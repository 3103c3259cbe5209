package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.IterativeFixpoint

/** SQL frontend for the statements Spark SQL does not speak natively —
  * the entry-point surface of the reference
  * (reference: src/frontend/src/handler/{create_source.rs,create_mv.rs},
  * src/frontend/src/session.rs:1168 `run_statement`):
  *
  *  - `CREATE SOURCE s [(WATERMARK FOR c AS c - INTERVAL '…')]
  *     WITH (path = '…', format = 'parquet')` — a streaming file source
  *     registered as a (streaming) temp view, watermark applied
  *     (reference: create_source.rs:594-616 bind_source_watermark);
  *  - `CREATE MATERIALIZED VIEW m (PRIMARY KEY (k, …)) AS SELECT …` —
  *     handled by [[Engine.execute]] using [[parseCreateMv]]; whether the
  *     plan is streaming is decided by what the SELECT reads;
  *  - `WITH RECURSIVE … SELECT …` — evaluated by the driver-side
  *     fixpoint loop (reference: logical_recursive_union.rs).
  *
  * Parsing is structural (paren/quote-aware scanning), not a full
  * grammar: exactly the statement shapes above, everything else falls
  * through to `spark.sql`.
  */
object SqlFrontend {

  // ------------------------------------------------------------- scanning

  /** Index of the ')' matching the '(' at `open`, honoring nesting and
    * single-quoted strings.
    */
  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          while (i < s.length && s.charAt(i) != '\'') i += 1
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parentheses in: $s")
  }

  /** Split on a separator at paren-depth 0 (outside quotes). */
  private[graft] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          while (i < s.length && s.charAt(i) != '\'') i += 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if c == sep && depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  /** First occurrence of word-boundary `word` (case-insensitive) at
    * paren-depth 0, or -1.
    */
  private def indexOfTopLevelWord(s: String, word: String): Int = {
    val upper = s.toUpperCase
    val w = word.toUpperCase
    var depth = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          while (i < s.length && s.charAt(i) != '\'') i += 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && upper.startsWith(w, i) &&
            (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))) &&
            (i + w.length >= s.length ||
              !Character.isLetterOrDigit(s.charAt(i + w.length))))
            return i
      }
      i += 1
    }
    -1
  }

  /** `a = b, c = d` at paren-depth 0 → (col, expr) pairs (UPDATE … SET). */
  def splitAssignments(s: String): Seq[(String, String)] =
    splitTopLevel(s, ',').map { a =>
      a.split("=", 2) match {
        case Array(c, e) => (c.trim, e.trim)
        case _ => throw new IllegalArgumentException(s"bad assignment: $a")
      }
    }

  // ----------------------------------------------------- CREATE SOURCE

  /** `encodeClause`: the reference's trailing `FORMAT f ENCODE e`
    * (create_source.rs bind_source_format) — payload decoding through
    * the [[graft.sources.Formats]] codec matrix; absent = parquet rows.
    * `declaredSchema`: the DDL column list, required for FORMAT/ENCODE
    * payload decoding.
    */
  final case class SourceDef(name: String, path: String, format: String,
      watermarkCol: Option[String], watermarkDelay: Option[String],
      connector: String = "file", options: Map[String, String] = Map.empty,
      declaredSchema: Option[org.apache.spark.sql.types.StructType] = None,
      encodeClause: Option[(String, String)] = None)

  private val CreateSourceHeadRe =
    """(?is)^\s*CREATE\s+SOURCE\s+(\w+)\s*""".r

  private val WatermarkRe =
    """(?is)\s*WATERMARK\s+FOR\s+(\w+)\s+AS\s+\w+\s*-\s*INTERVAL\s*'([^']+)'\s*(\w+)?\s*""".r

  private val ColDefRe = """(?is)\s*(\w+)\s+([\w()\[\]<>0-9, ]+?)\s*""".r

  private val FormatEncodeRe =
    """(?is)^\s*FORMAT\s+(\w+)\s+ENCODE\s+(\w+)\s*;?\s*$""".r

  private[graft] def sqlType(t: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    val up = t.trim.replaceAll("\\s+", " ")
    // PG array suffix: `T[]` (any nesting depth)
    if (up.endsWith("[]"))
      return ArrayType(sqlType(up.dropRight(2)))
    // type-argument splitter: ',' at zero paren AND angle depth (local —
    // splitTopLevel must not treat '<' as nesting, expressions use it
    // as an operator)
    def splitTypeArgs(s: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var depth = 0; var start = 0; var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '(' | '<' => depth += 1
          case ')' | '>' => depth -= 1
          case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
          case _ =>
        }
        i += 1
      }
      out += s.substring(start)
      out.result()
    }
    // reference STRUCT<a T, b U> (handler/create_table.rs struct types)
    if (up.toUpperCase.startsWith("STRUCT<") && up.endsWith(">")) {
      val inner = up.substring(7, up.length - 1)
      val fields = splitTypeArgs(inner).map(_.trim).map { f =>
        val sp = f.indexOf(' ')
        require(sp > 0, s"malformed struct field $f")
        StructField(f.substring(0, sp).trim, sqlType(f.substring(sp + 1)))
      }
      return StructType(fields)
    }
    // reference MAP(K, V)
    if (up.toUpperCase.startsWith("MAP(") && up.endsWith(")")) {
      val inner = up.substring(4, up.length - 1)
      val kv = splitTypeArgs(inner).map(_.trim)
      require(kv.size == 2, s"MAP needs two type args: $up")
      return MapType(sqlType(kv(0)), sqlType(kv(1)))
    }
    t.trim.toUpperCase.replaceAll("\\s+", " ") match {
      case "BIGINT" | "INT8" => LongType
      case "INT" | "INTEGER" | "INT4" => IntegerType
      case "SMALLINT" | "INT2" => ShortType
      case "VARCHAR" | "TEXT" | "STRING" | "CHARACTER VARYING" => StringType
      case "DOUBLE" | "DOUBLE PRECISION" | "FLOAT8" => DoubleType
      case "REAL" | "FLOAT4" => FloatType
      case "BOOLEAN" | "BOOL" => BooleanType
      case "TIMESTAMP" | "TIMESTAMPTZ" => TimestampType
      case "DATE" => DateType
      case "BYTEA" | "BINARY" => BinaryType
      // jsonb travels as its text rendering (the jsonb function pack
      // operates on strings end-to-end)
      case "JSONB" | "JSON" => StringType
      // PG interval: day-time precision is parquet-storable
      case "INTERVAL" => DayTimeIntervalType()
      // reference serial = engine-generated row id (BIGINT)
      case "SERIAL" => LongType
      // rw_int256 travels as its 32-byte order-preserving encoding
      // (plans/Int256Expressions.scala)
      case "RW_INT256" | "INT256" => BinaryType
      case d if d.startsWith("DECIMAL") || d.startsWith("NUMERIC") =>
        val ps = "\\d+".r.findAllIn(d).toSeq
        if (ps.size == 2) DecimalType(ps(0).toInt, ps(1).toInt)
        else DecimalType(38, 18)
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }
  }

  // ------------------------------------------------------ CREATE TABLE

  /** `CREATE TABLE name (col type …, PRIMARY KEY (…))` — the reference's
    * user-table DDL (reference: src/frontend/src/handler/create_table.rs):
    * a PK-merged table users INSERT/UPDATE/DELETE into. `CREATE TABLE …
    * AS SELECT` (no column list) is NOT handled here — it falls through
    * to Spark SQL's native CTAS.
    */
  final case class TableDef(name: String,
      schema: org.apache.spark.sql.types.StructType, pk: Seq[String],
      defaults: Map[String, String] = Map.empty,
      // `col type AS expr` — computed at INSERT/UPDATE, never directly
      // writable (reference: generated columns, handler/create_table.rs)
      generated: Map[String, String] = Map.empty,
      // ON CONFLICT OVERWRITE (default) | IGNORE | DO UPDATE IF NOT NULL
      // (reference: create_table.rs on_conflict behaviors)
      onConflict: Option[String] = None)

  private val DefaultColRe =
    """(?is)\s*(\w+)\s+([\w()\[\]<>0-9, ]+?)\s+DEFAULT\s+(.+?)\s*""".r
  private val GeneratedColRe =
    """(?is)\s*(\w+)\s+([\w()\[\]<>0-9, ]+?)\s+AS\s+(.+?)\s*""".r

  private val CreateTableHeadRe =
    """(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*""".r
  private val PkConstraintRe = """(?is)\s*PRIMARY\s+KEY\s*\(([^)]*)\)\s*""".r
  /** Column-list splitter: ',' at zero paren depth AND outside any
    * STRUCT<...> type-argument block. '<' opens nesting only directly
    * after the word STRUCT (or while already inside one) — expression
    * positions (DEFAULT clauses) use < as an operator.
    */
  private def splitColumnDefs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var paren = 0; var angle = 0; var start = 0; var i = 0
    def wordBefore(j: Int): String = {
      var e = j
      while (e > 0 && Character.isWhitespace(s.charAt(e - 1))) e -= 1
      var b = e
      while (b > 0 && (Character.isLetterOrDigit(s.charAt(b - 1)) ||
        s.charAt(b - 1) == '_')) b -= 1
      s.substring(b, e).toUpperCase
    }
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i += 1; while (i < s.length && s.charAt(i) != '\'') i += 1
        case '(' => paren += 1
        case ')' => paren -= 1
        case '<' if angle > 0 || wordBefore(i) == "STRUCT" => angle += 1
        case '>' if angle > 0 => angle -= 1
        case ',' if paren == 0 && angle == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  private val InlinePkRe = """(?is)^(.*?)\s+PRIMARY\s+KEY\s*$""".r
  private val OnConflictTailRe =
    """(?is)^ON\s+CONFLICT\s+(OVERWRITE|IGNORE|DO\s+UPDATE\s+IF\s+NOT\s+NULL)\s*;?$""".r

  def parseCreateTable(stmt: String): Option[TableDef] =
    CreateTableHeadRe.findPrefixMatchOf(stmt).flatMap { m =>
      val name = m.group(1)
      val rest = stmt.substring(m.end).trim
      if (!rest.startsWith("(")) None // CTAS etc. → Spark SQL
      else {
        val close = matchingParen(rest, 0)
        var pk = Vector.empty[String]
        var schema = Vector.empty[org.apache.spark.sql.types.StructField]
        var defaults = Map.empty[String, String]
        var generated = Map.empty[String, String]
        splitColumnDefs(rest.substring(1, close)).foreach {
          case PkConstraintRe(cols) =>
            pk ++= cols.split(",").map(_.trim)
          case DefaultColRe(cname, ctype, dflt) =>
            // `col type DEFAULT expr` (reference: table_with_default_
            // columns.slt; evaluated at INSERT for unprovided columns)
            schema :+= org.apache.spark.sql.types.StructField(cname, sqlType(ctype))
            defaults += cname -> dflt
          case GeneratedColRe(cname, ctype, genExpr) =>
            // `col type AS expr` (reference generated column): computed
            // from the row's other columns at write time
            schema :+= org.apache.spark.sql.types.StructField(cname, sqlType(ctype))
            generated += cname -> genExpr
          case ColDefRe(cname, ctype) =>
            ctype match {
              case InlinePkRe(t) =>
                pk :+= cname
                schema :+= org.apache.spark.sql.types.StructField(cname, sqlType(t))
              case t =>
                schema :+= org.apache.spark.sql.types.StructField(cname, sqlType(t))
            }
          case blank if blank.trim.isEmpty =>
          case other =>
            throw new IllegalArgumentException(s"bad column def: $other")
        }
        val tail = rest.substring(close + 1).trim
        val onConflict = tail match {
          case "" | ";" => None
          case OnConflictTailRe(b) =>
            Some(b.toLowerCase.replaceAll("\\s+", " "))
          case other =>
            throw new IllegalArgumentException(
              s"unexpected clause after column list: $other")
        }
        Some(TableDef(name, org.apache.spark.sql.types.StructType(schema),
          pk, defaults, generated, onConflict))
      }
    }

  def parseCreateSource(stmt: String): Option[SourceDef] =
    CreateSourceHeadRe.findPrefixMatchOf(stmt).map { m =>
      var rest = stmt.substring(m.end).trim
      val name = m.group(1)
      // optional (col defs / WATERMARK) block before WITH
      var wmCol: Option[String] = None
      var wmDelay: Option[String] = None
      var schema = Vector.empty[org.apache.spark.sql.types.StructField]
      if (rest.startsWith("(")) {
        val close = matchingParen(rest, 0)
        splitColumnDefs(rest.substring(1, close)).foreach {
          case WatermarkRe(c, delay, unit) =>
            wmCol = Some(c)
            wmDelay = Some(
              if (unit != null && unit.nonEmpty) s"$delay $unit" else delay)
          case ColDefRe(cname, ctype) =>
            schema :+= org.apache.spark.sql.types.StructField(cname, sqlType(ctype))
          case blank if blank.trim.isEmpty =>
          case other =>
            throw new IllegalArgumentException(s"bad column def: $other")
        }
        rest = rest.substring(close + 1).trim
      }
      // WITH ( options )
      val withAt = indexOfTopLevelWord(rest, "WITH")
      require(withAt >= 0, "CREATE SOURCE requires a WITH (…) clause")
      val afterWith = rest.substring(withAt + 4)
      val open = afterWith.indexOf('(')
      val close = matchingParen(afterWith, open)
      val opts = splitTopLevel(afterWith.substring(open + 1, close), ',').flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) =>
            Some(k.trim.toLowerCase -> v.trim.stripPrefix("'").stripSuffix("'"))
          case _ => None
        }
      }.toMap
      // optional trailing FORMAT f ENCODE e
      val tail = afterWith.substring(close + 1)
      val encodeClause = tail match {
        case FormatEncodeRe(f, e) => Some((f.toUpperCase, e.toUpperCase))
        case t if t.trim.isEmpty || t.trim == ";" => None
        case t => throw new IllegalArgumentException(s"unexpected clause: $t")
      }
      val connector = opts.getOrElse("connector", "file").toLowerCase
      SourceDef(name,
        if (connector == "kafka") opts.getOrElse("topic",
          throw new IllegalArgumentException(
            "CREATE SOURCE connector='kafka' requires topic = '…'"))
        else opts.getOrElse("path",
          throw new IllegalArgumentException("CREATE SOURCE requires path = '…'")),
        opts.getOrElse("format", "parquet"),
        wmCol, wmDelay, connector, opts,
        if (schema.nonEmpty)
          Some(org.apache.spark.sql.types.StructType(schema)) else None,
        encodeClause)
    }

  /** Plan a [[SourceDef]]: schema from the existing files (the backfill
    * snapshot), then a file stream, then the watermark.
    */
  def planSource(spark: SparkSession, d: SourceDef): DataFrame = {
    val stream = d.connector match {
      case "kafka" =>
        // `WITH (connector='kafka', properties.bootstrap.server='…',
        // topic='…')` — the reference's Kafka WITH clause
        // (src/connector/src/source/kafka/mod.rs KafkaProperties)
        graft.sources.Kafka.source(spark,
          d.options.getOrElse("properties.bootstrap.server",
            throw new IllegalArgumentException(
              "kafka source requires properties.bootstrap.server = '…'")),
          d.path,
          d.options.getOrElse("scan.startup.mode", "earliest"))
      case _ =>
        // SOURCE_RATE_LIMIT (reference alter_streaming_rate_limit.rs /
        // source WITH option): per-micro-batch admission cap. Spark's
        // file sources meter by FILES per trigger — the honest analog
        // of the reference's rows/s barrier config (documented unit
        // divergence); each micro-batch admits at most this many files.
        val rateLimit = d.options.get("source_rate_limit")
          .map(v => math.max(1, v.toInt))
        def reader = {
          val r = spark.readStream
          rateLimit.fold(r)(n => r.option("maxFilesPerTrigger", n))
        }
        d.encodeClause match {
        case Some((fmt, enc)) =>
          // payload files (one payload per line) decoded by the declared
          // schema through the codec matrix — the reference's
          // FORMAT/ENCODE source binding (create_source.rs)
          import graft.sources.Formats
          val rowSchema = d.declaredSchema.getOrElse(
            throw new IllegalArgumentException(
              "FORMAT … ENCODE … requires a declared column list"))
          val raw = reader.text(d.path)
          (fmt, enc) match {
            case ("PLAIN", "JSON") => Formats.decodeJson(raw, "value", rowSchema)
            case ("PLAIN", "CSV") => Formats.decodeCsv(raw, "value", rowSchema)
            case ("DEBEZIUM", "JSON") => Formats.decodeDebezium(raw, "value", rowSchema)
            case ("MAXWELL", "JSON") => Formats.decodeMaxwell(raw, "value", rowSchema)
            case ("CANAL", "JSON") => Formats.decodeCanal(raw, "value", rowSchema)
            case other => throw new IllegalArgumentException(
              s"unsupported FORMAT/ENCODE $other")
          }
        case None =>
          require(d.format.equalsIgnoreCase("parquet"),
            s"CREATE SOURCE format '${d.format}' not supported (parquet only; " +
              "json/csv payloads decode via graft.sources.Formats)")
          val schema = d.declaredSchema.getOrElse(spark.read.parquet(d.path).schema)
          reader.schema(schema).parquet(d.path)
      }
    }
    (d.watermarkCol, d.watermarkDelay) match {
      case (Some(c), Some(delay)) => stream.withWatermark(c, delay)
      case _ => stream
    }
  }

  // ------------------------------------------------------------ CREATE SINK

  /** `CREATE SINK s FROM mv WITH (path='…', format='debezium|upsert|json')`
    * — the reference's sink DDL (reference:
    * src/frontend/src/handler/create_sink.rs; formats
    * src/connector/src/sink/catalog/mod.rs:132-154). The sink subscribes
    * to the MV's CHANGELOG (not its storage) and emits encoded payloads.
    */
  final case class SinkDef(name: String, from: String, options: Map[String, String])

  private val CreateSinkRe =
    """(?is)\s*CREATE\s+SINK\s+(\w+)\s+FROM\s+(\w+)\s+WITH\s*\((.*)\)\s*;?\s*""".r

  def parseCreateSink(stmt: String): Option[SinkDef] = stmt match {
    case CreateSinkRe(name, from, withOpts) =>
      val opts = splitTopLevel(withOpts, ',').flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) =>
            Some(k.trim.toLowerCase -> v.trim.stripPrefix("'").stripSuffix("'"))
          case _ => None
        }
      }.toMap
      Some(SinkDef(name, from, opts))
    case _ => None
  }

  /** `CREATE SINK s AS <query> WITH (…)` — the reference's sink-over-
    * derived-query form (handler/create_sink.rs binds FROM-relation and
    * AS-query the same way). The options block must END the statement;
    * the query itself may contain WITH (CTEs), so the parser takes the
    * LAST `WITH (…)` whose parens close at the statement end.
    */
  final case class SinkQueryDef(name: String, query: String,
      options: Map[String, String])

  private val CreateSinkAsRe =
    """(?is)\s*CREATE\s+SINK\s+(\w+)\s+AS\s+(.*)""".r

  def parseCreateSinkAs(stmt: String): Option[SinkQueryDef] = stmt match {
    case CreateSinkAsRe(name, rest0) =>
      val rest = rest0.replaceAll("[;\\s]+$", "")
      val m = java.util.regex.Pattern.compile("(?is)\\bWITH\\s*\\(").matcher(rest)
      var lastStart = -1
      while (m.find()) lastStart = m.start()
      if (lastStart < 0) None
      else {
        val open = rest.indexOf('(', lastStart)
        var depth = 0; var i = open; var end = -1
        while (i < rest.length && end < 0) {
          rest.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = i
            case _ =>
          }
          i += 1
        }
        if (end != rest.length - 1) None
        else {
          val opts = splitTopLevel(rest.substring(open + 1, end), ',')
            .flatMap { kv =>
              kv.split("=", 2) match {
                case Array(k, v) => Some(k.trim.toLowerCase ->
                  v.trim.stripPrefix("'").stripSuffix("'"))
                case _ => None
              }
            }.toMap
          Some(SinkQueryDef(name, rest.substring(0, lastStart).trim, opts))
        }
      }
    case _ => None
  }

  // ---------------------------------------------- CREATE MATERIALIZED VIEW

  /** `emitOnClose`: the reference's `EMIT ON WINDOW CLOSE` clause
    * (reference: src/frontend/src/handler/create_mv.rs EmitMode) — the
    * MV emits only watermark-finalized rows (append mode) instead of
    * per-batch updates.
    */
  final case class CreateMvDef(name: String, pk: Option[Seq[String]],
      query: String, emitOnClose: Boolean = false,
      ifNotExists: Boolean = false)

  private val CreateMvRe =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s*(?:\(\s*PRIMARY\s+KEY\s*\(([^)]*)\)\s*\))?\s+AS\s+(.*)""".r

  private val EmitRe = """(?is)(.*?)\s*EMIT\s+ON\s+WINDOW\s+CLOSE\s*;?\s*$""".r

  def parseCreateMv(stmt: String): Option[CreateMvDef] = stmt match {
    case CreateMvRe(ine, name, pkList, query0) =>
      val (query, eowc) = query0.trim.stripSuffix(";") match {
        case EmitRe(q) => (q, true)
        case q => (q, false)
      }
      Some(CreateMvDef(name,
        Option(pkList).map(_.split(",").map(_.trim).toSeq.filter(_.nonEmpty)),
        query, eowc, ifNotExists = ine != null))
    case _ => None
  }

  // -------------------------------------------------------- WITH RECURSIVE

  def isRecursiveCte(stmt: String): Boolean =
    stmt.trim.toUpperCase.replaceAll("\\s+", " ").startsWith("WITH RECURSIVE")

  private final case class Cte(name: String, cols: Option[Seq[String]], body: String)

  /** Evaluate `WITH RECURSIVE a AS (…), b(c1,c2) AS (base UNION step) …
    * SELECT …`. Non-self-referencing CTEs bind as plain temp views; a
    * self-referencing CTE runs as a distinct-union fixpoint
    * ([[IterativeFixpoint.fixpoint]]) with the CTE name bound to the
    * frontier inside the step term (standard working-table semantics).
    * UNION ALL recursion is rejected: with cycles it has no fixpoint.
    */
  def executeRecursive(spark: SparkSession, stmt: String): DataFrame = {
    val body = stmt.trim.replaceFirst("(?is)^\\s*WITH\\s+RECURSIVE\\s+", "")
    // peel CTE definitions: name[(cols)] AS ( … ) [, …] then final SELECT
    var rest = body
    var ctes = Vector.empty[Cte]
    val HeadRe = """(?is)^\s*(\w+)\s*(\(([^)]*)\))?\s*AS\s*""".r
    var done = false
    while (!done) {
      HeadRe.findPrefixMatchOf(rest) match {
        case Some(m) if rest.drop(m.end).trim.startsWith("(") =>
          val after = rest.drop(m.end)
          val open = after.indexOf('(')
          val close = matchingParen(after, open)
          ctes :+= Cte(m.group(1),
            Option(m.group(3)).map(_.split(",").map(_.trim).toSeq),
            after.substring(open + 1, close))
          val tail = after.substring(close + 1).trim
          if (tail.startsWith(",")) rest = tail.drop(1)
          else { rest = tail; done = true }
        case _ => done = true
      }
    }
    val registered = scala.collection.mutable.ListBuffer[String]()
    try {
      ctes.foreach { cte =>
        val selfRef = indexOfTopLevelWord(cte.body, cte.name) >= 0 ||
          cte.body.toUpperCase.matches(s"(?s).*\\b${cte.name.toUpperCase}\\b.*")
        val df =
          if (!selfRef) spark.sql(cte.body)
          else {
            val unionAt = indexOfTopLevelWord(cte.body, "UNION")
            require(unionAt >= 0,
              s"recursive CTE ${cte.name} must be <base> UNION <step>")
            val afterUnion = cte.body.substring(unionAt + "UNION".length)
            require(!afterUnion.trim.toUpperCase.startsWith("ALL"),
              "recursive UNION ALL is not supported (no fixpoint under cycles)")
            val baseSql = cte.body.substring(0, unionAt)
            val stepSql = afterUnion
            // the declared column list binds INSIDE the recursion — the
            // step term references the CTE's columns by those names, and
            // the fixpoint anti-join matches rows by column name
            val base0 = spark.sql(baseSql)
            val base = cte.cols.map(cs => base0.toDF(cs: _*)).getOrElse(base0)
            val result = IterativeFixpoint.fixpoint(base, frontier => {
              frontier.createOrReplaceTempView(cte.name)
              spark.sql(stepSql).toDF(base.columns: _*)
            })
            spark.catalog.dropTempView(cte.name)
            result
          }
        val named =
          if (df.columns.toSeq == cte.cols.getOrElse(df.columns.toSeq)) df
          else df.toDF(cte.cols.get: _*)
        named.createOrReplaceTempView(cte.name)
        registered += cte.name
      }
      spark.sql(rest)
    } finally {
      // final SELECT is already planned; views can unbind
      registered.foreach(v => spark.catalog.dropTempView(v))
    }
  }
}
