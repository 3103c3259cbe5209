package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Minimal `pg_catalog` + `information_schema` over the engine's durable
  * catalog (reference: src/frontend/src/catalog/system_catalog/ — the
  * reference materializes pg_type/pg_class/pg_namespace/pg_attribute etc.
  * so psql's `\dt`, pgjdbc's `getTables`, and ORM introspection work).
  *
  * Approach: the system relations are tiny driver-built DataFrames
  * (dozens of rows) (re)registered as temp views when — and only when —
  * a statement references them, so they always reflect the live catalog.
  * A dialect rewriter maps the Postgres-isms psql/pgjdbc actually emit
  * (double-quoted identifiers, `~`/`!~` regex operators,
  * `OPERATOR(pg_catalog.~)`, `::text`-style casts, `E'...'` strings)
  * onto Spark SQL, and UDF shims cover the catalog helper functions
  * (`pg_table_is_visible`, `format_type`, `pg_get_userbyid`, ...).
  * Everything here is metadata-plane: no data-path query ever routes
  * through these relations.
  */
object SystemCatalog {

  /** One engine object as the system catalog sees it.
    * kind: r = table, m = materialized view, v = view, i = index,
    * f = source (surfaced as a foreign table).
    */
  /** `name` is the engine-internal flat name (`s__t` for schema `s`);
    * `ns`/`rel` carry the user-facing namespace and bare relation name
    * (rel empty → same as name, the public-schema common case).
    */
  final case class Obj(name: String, kind: String, schema: Option[StructType],
      ns: String = "public", rel: String = "") {
    def bare: String = if (rel.isEmpty) name else rel
  }

  /** One callable as pg_proc sees it. kind: f = function, a = aggregate,
    * w = window; system shims live in pg_catalog (hidden from psql's
    * default `\df`, like PG builtins), user functions in public.
    */
  final case class Func(name: String, kind: String, args: String,
    result: String, inPgCatalog: Boolean)

  private val SysNames = Seq("pg_class", "pg_namespace", "pg_attribute",
    "pg_type", "pg_description", "pg_database", "pg_tables", "pg_views",
    "pg_matviews", "pg_am", "pg_attrdef", "pg_collation", "pg_index",
    "pg_inherits", "pg_roles", "pg_user", "pg_proc", "pg_settings",
    "pg_stat_activity")
  private val Trigger =
    ("(?i)\\b(pg_catalog|information_schema|rw_catalog|rw_\\w+|" +
      SysNames.mkString("|") + ")\\b").r

  /** Does the statement touch any system relation / schema? */
  def referenced(stmt: String): Boolean = Trigger.findFirstIn(stmt).isDefined

  /** Catalog relations psql/ORMs probe that this engine deliberately
    * does not model (policies, publications, inheritance, …). Probes
    * against them answer an EMPTY result instead of an error, so a
    * `\d`/introspection flow completes: every one of these concepts is
    * "none defined" here, which an empty relation states truthfully.
    */
  private val Unmodeled = ("(?i)\\b(pg_policy|pg_publication\\w*|pg_rules|" +
    "pg_statistic\\w*|pg_trigger|pg_rewrite|pg_constraint|pg_depend|" +
    "pg_event_trigger|pg_extension|pg_foreign_\\w+|pg_partitioned_table|" +
    "pg_sequence\\w*|pg_seclabel\\w*|pg_enum|pg_operator|" +
    "pg_cast|pg_language|pg_largeobject\\w*|pg_replication\\w*|" +
    "pg_shdepend|pg_tablespace|pg_ts_\\w+|pg_user_mapping|" +
    // rw_catalog internals tied to the reference's physical runtime
    // (actors/fragments/hummock LSM/meta cluster) — concepts this
    // engine delegates to Spark; "none defined" is the truthful answer
    "rw_actor\\w*|rw_fragment_id_to_ddl|rw_fragment_parallelism|" +
    "rw_hummock_\\w+|" +
    "rw_event_logs|rw_ddl_progress|rw_meta_snapshot|" +
    "rw_rate_limit|rw_internal_table\\w*|rw_iceberg_\\w+|" +
    "rw_worker_actor_count|" +
    "rw_parallel_units|rw_system_tables)\\b").r

  def probesUnmodeled(stmt: String): Boolean =
    Unmodeled.findFirstIn(stmt).isDefined

  // ------------------------------------------------------------ rewrite

  /** Apply `f` to the segments of `sql` OUTSIDE single-quoted string
    * literals; double-quoted spans (PG identifiers) become backticked
    * identifiers; `E'...'` escape-string prefixes drop (Spark's string
    * parser already processes backslash escapes the way E'' does).
    */
  private def mapOutsideLiterals(sql: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var state = 0 // 0 plain, 1 in '...', 2 in "..."
    def flush(): Unit = { out.append(f(seg.toString)); seg.clear() }
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      state match {
        case 0 =>
          if (c == '\'') {
            // E'…' / e'…': drop the prefix, keep the literal
            if (seg.nonEmpty && (seg.last == 'E' || seg.last == 'e') &&
                (seg.length == 1 ||
                  !Character.isLetterOrDigit(seg.charAt(seg.length - 2)) &&
                  seg.charAt(seg.length - 2) != '_'))
              seg.deleteCharAt(seg.length - 1)
            flush(); out.append(c); state = 1
          } else if (c == '"') { flush(); out.append('`'); state = 2 }
          else seg.append(c)
        case 1 =>
          out.append(c)
          if (c == '\'') state = 0 // '' doubling closes+reopens, harmless
        case 2 =>
          if (c == '"') { out.append('`'); state = 0 } else out.append(c)
      }
      i += 1
    }
    flush()
    out.toString
  }

  /** Postgres introspection dialect → Spark SQL. Only ever applied to
    * statements that reference a system relation (`referenced`).
    */
  def rewrite(stmt: String): String = mapOutsideLiterals(stmt) { s0 =>
    var s = s0
    // psql pattern operators: OPERATOR(pg_catalog.~) etc.
    s = s.replaceAll("(?i)OPERATOR\\s*\\(\\s*pg_catalog\\.(!?~\\*?)\\s*\\)", " $1 ")
    s = s.replaceAll("(?i)\\bCOLLATE\\s+pg_catalog\\.\"?default\"?", "")
    s = s.replaceAll("(?i)\\bCOLLATE\\s+\"?default\"?", "")
    // strip schema qualification: relations AND helper functions resolve flat
    s = s.replaceAll("(?i)\\bpg_catalog\\.", "")
    s = s.replaceAll("(?i)\\brw_catalog\\.", "")
    s = s.replaceAll("(?i)\\binformation_schema\\.(\\w+)", "information_schema_$1")
    // regex match operators (case-insensitive variants approximated)
    s = s.replaceAll("!~\\*?", " NOT RLIKE ")
    s = s.replaceAll("~\\*", " RLIKE ")
    s = s.replaceAll("(?<![<>!=^|~-])~", " RLIKE ")
    // ::casts psql sprinkles around — the values are already the right
    // shape on our side, so the casts erase
    s = s.replaceAll("(?i)::(text|name|varchar|bpchar|char|regclass|regtype|" +
      "regproc|oid|int4|int8|int2)\\b", "")
    // pg_get_expr's optional 3rd arg (pretty-print) — one shim arity
    s = s.replaceAll("(?i)\\bpg_get_expr\\s*\\(([^()]*?),\\s*(?:true|false)\\s*\\)",
      "pg_get_expr($1)")
    // psql \du: ARRAY(SELECT … pg_auth_members …) memberof — Spark has
    // no ARRAY(subquery), and role membership is not modeled (every
    // role stands alone), so the truthful answer is the empty list
    s = s.replaceAll(
      "(?is)ARRAY\\s*\\(\\s*SELECT\\b.*?pg_auth_members.*?\\)\\s+as\\s+memberof",
      "array() as memberof")
    s
  }

  // ------------------------------------------------------ type mapping

  /** Spark type → Postgres type OID (pg_type.dat, public catalog). */
  def oidOf(dt: DataType): Int = dt match {
    case BooleanType => 16
    case BinaryType => 17
    case LongType => 20
    case ShortType | ByteType => 21
    case IntegerType => 23
    case FloatType => 700
    case DoubleType => 701
    case DateType => 1082
    case TimestampType | TimestampNTZType => 1114
    case _: DecimalType => 1700
    case _ => 25 // text for strings and anything rendered as text
  }

  /** (oid, typname, typcategory, information_schema data_type). */
  private val pgTypes: Seq[(Long, String, String, String)] = Seq(
    (16L, "bool", "B", "boolean"),
    (17L, "bytea", "U", "bytea"),
    (18L, "char", "S", "\"char\""),
    (19L, "name", "S", "name"),
    (20L, "int8", "N", "bigint"),
    (21L, "int2", "N", "smallint"),
    (23L, "int4", "N", "integer"),
    (25L, "text", "S", "text"),
    (26L, "oid", "N", "oid"),
    (114L, "json", "U", "json"),
    (700L, "float4", "N", "real"),
    (701L, "float8", "N", "double precision"),
    (1042L, "bpchar", "S", "character"),
    (1043L, "varchar", "S", "character varying"),
    (1082L, "date", "D", "date"),
    (1083L, "time", "D", "time without time zone"),
    (1114L, "timestamp", "D", "timestamp without time zone"),
    (1184L, "timestamptz", "D", "timestamp with time zone"),
    (1186L, "interval", "T", "interval"),
    (1700L, "numeric", "N", "numeric"),
    (2950L, "uuid", "U", "uuid"),
    (3802L, "jsonb", "U", "jsonb"),
    // the reference's own OID for its 256-bit integer
    // (common/types/postgres_type.rs: Int256 => 1301)
    (1301L, "rw_int256", "N", "rw_int256"))

  private val typNameOf: Map[Long, String] =
    pgTypes.map(t => t._1 -> t._2).toMap
  private val dataTypeNameOf: Map[Long, String] =
    pgTypes.map(t => t._1 -> t._4).toMap

  /** information_schema.columns `data_type` name for a Spark type. */
  private def dataTypeName(dt: DataType): String = dt match {
    case StringType => "text"
    case ArrayType(_, _) => "ARRAY"
    case _: MapType | _: StructType => "jsonb"
    case other => dataTypeNameOf.getOrElse(oidOf(other).toLong, "text")
  }

  // ---------------------------------------------------------- binding

  private val NsPgCatalog = 11L
  private val NsPublic = 2200L
  private val NsInfoSchema = 13000L
  private val FirstUserNsOid = 16000L
  private val FirstUserRoleOid = 16100L
  private val FirstUserOid = 16384L
  private val Owner = 10L // the bootstrap role ("graft")

  /** (Re)register every system relation + helper-function shim. Cheap:
    * all relations are driver-local rows; call per introspection query
    * so the views always reflect the live catalog.
    */
  def bind(spark: SparkSession, objs0: Seq[Obj],
      comments: Map[String, String] = Map.empty,
      funcs: Seq[Func] = Seq.empty,
      settings: Seq[(String, String, String, String)] = Seq.empty,
      userSchemas: Seq[String] = Seq.empty,
      userRows: Seq[(String, Boolean, Boolean, Boolean)] = Seq.empty,
      // (pid, usename, datname, client_addr, backend_start ms, query)
      activity: Seq[(Int, String, String, String, Long, String)] = Seq.empty,
      databases: Seq[String] = Seq.empty): Unit = {
    val s = spark
    import s.implicits._

    // stable oid per object: position in name-sorted order
    val objs = objs0.sortBy(_.name)
    val oidByName = objs.zipWithIndex
      .map { case (o, i) => o.name -> (FirstUserOid + i) }.toMap
    // user schemas get oids after the base namespaces, name-sorted
    val nsOid: Map[String, Long] =
      Map("pg_catalog" -> NsPgCatalog, "public" -> NsPublic,
        "information_schema" -> NsInfoSchema) ++
        userSchemas.sorted.zipWithIndex
          .map { case (n, i) => n -> (FirstUserNsOid + i) }

    (Seq((NsPgCatalog, "pg_catalog", Owner), (NsPublic, "public", Owner),
      (NsInfoSchema, "information_schema", Owner)) ++
      userSchemas.sorted.map(n => (nsOid(n), n, Owner)))
      .toDF("oid", "nspname", "nspowner")
      .createOrReplaceTempView("pg_namespace")

    objs.map { o =>
      (oidByName(o.name), o.bare, nsOid.getOrElse(o.ns, NsPublic), o.kind, Owner,
        2L /*relam: heap*/, 0 /*relpages*/, 0.0f /*reltuples*/,
        false /*relhasindex*/, "p" /*relpersistence*/, 0 /*relchecks*/,
        false /*relhasrules*/, false /*relhastriggers*/,
        false /*relrowsecurity*/, false /*relforcerowsecurity*/,
        false /*relispartition*/, 0L /*reltablespace*/,
        // STRING "0": psql CASEs reloftype against '' — a bigint would
        // make Spark coerce '' to bigint and fail the cast
        "0" /*reloftype*/,
        "d" /*relreplident*/, 0L /*reltoastrelid*/,
        Option.empty[String] /*relpartbound*/, Option.empty[String] /*relacl*/)
    }.toDF("oid", "relname", "relnamespace", "relkind", "relowner",
        "relam", "relpages", "reltuples", "relhasindex", "relpersistence",
        "relchecks", "relhasrules", "relhastriggers", "relrowsecurity",
        "relforcerowsecurity", "relispartition", "reltablespace",
        "reloftype", "relreplident", "reltoastrelid", "relpartbound",
        "relacl")
      .createOrReplaceTempView("pg_class")

    objs.flatMap { o =>
      o.schema.toSeq.flatMap(_.fields.zipWithIndex.map { case (f, i) =>
        (oidByName(o.name), f.name, oidOf(f.dataType).toLong, -1 /*typmod*/,
          -1 /*attlen*/, i + 1, !f.nullable, false /*atthasdef*/,
          false /*attisdropped*/, "" /*attidentity*/, "" /*attgenerated*/,
          0L /*attcollation*/)
      })
    }.toDF("attrelid", "attname", "atttypid", "atttypmod", "attlen",
        "attnum", "attnotnull", "atthasdef", "attisdropped", "attidentity",
        "attgenerated", "attcollation")
      .createOrReplaceTempView("pg_attribute")

    pgTypes.map { case (oid, name, cat, _) =>
      (oid, name, NsPgCatalog, -1, "b", cat, 0L /*typelem*/,
        0L /*typrelid*/, 0L /*typbasetype*/, -1 /*typtypmod*/,
        0L /*typcollation*/)
    }.toDF("oid", "typname", "typnamespace", "typlen", "typtype",
        "typcategory", "typelem", "typrelid", "typbasetype", "typtypmod",
        "typcollation")
      .createOrReplaceTempView("pg_type")

    // COMMENT ON text: objsubid 0 = the object, n = its n-th column
    // (classoid 1259 = pg_class, what psql \d+ filters on)
    comments.toSeq.sorted.flatMap { case (key, text) =>
      val (obj, col) = key.split("\\.", 2) match {
        case Array(o, c) => (o, Some(c))
        case Array(o) => (o, None)
      }
      oidByName.get(obj).flatMap { oid =>
        col match {
          case None => Some((oid.toLong, 1259L, 0, text))
          case Some(c) => objs.find(_.name == obj).flatMap(_.schema)
            .flatMap(s => s.fieldNames.zipWithIndex.collectFirst {
              case (n, i) if n == c => (oid.toLong, 1259L, i + 1, text)
            })
        }
      }
    }.toDF("objoid", "classoid", "objsubid", "description")
      .createOrReplaceTempView("pg_description")
    Seq.empty[(Long, Int, String)].toDF("adrelid", "adnum", "adbin")
      .createOrReplaceTempView("pg_attrdef")
    Seq.empty[(Long, String)].toDF("oid", "collname")
      .createOrReplaceTempView("pg_collation")
    Seq.empty[(Long, Long, Boolean, Boolean, Boolean)]
      .toDF("indexrelid", "indrelid", "indisunique", "indisprimary",
        "indisvalid")
      .createOrReplaceTempView("pg_index")
    Seq.empty[(Long, Long, Int, Boolean)]
      .toDF("inhrelid", "inhparent", "inhseqno", "inhdetachpending")
      .createOrReplaceTempView("pg_inherits")

    Seq((2L, "heap")).toDF("oid", "amname")
      .createOrReplaceTempView("pg_am")
    // (name, super, createdb, login); graft is the bootstrap superuser
    val allUsers = (("graft", true, true, true) +:
      userRows.filterNot(_._1 == "graft")).sortBy(_._1)
    allUsers.zipWithIndex.map { case ((n, sup, cdb, login), i) =>
      (if (n == "graft") Owner else FirstUserRoleOid + i, n, sup, true,
        false, cdb, login, false, -1, Option.empty[String], false)
    }.toDF("oid", "rolname", "rolsuper", "rolinherit", "rolcreaterole",
        "rolcreatedb", "rolcanlogin", "rolreplication", "rolconnlimit",
        "rolvaliduntil", "rolbypassrls")
      .createOrReplaceTempView("pg_roles")
    allUsers.zipWithIndex.map { case ((n, sup, cdb, _), i) =>
      (n, if (n == "graft") Owner else FirstUserRoleOid + i, cdb, sup)
    }.toDF("usename", "usesysid", "usecreatedb", "usesuper")
      .createOrReplaceTempView("pg_user")
    (("dev", 1L) +: databases.sorted.filterNot(_ == "dev").zipWithIndex
        .map { case (d, i) => (d, 100L + i) })
      .map { case (d, oid) => (oid, d, Owner, 6 /*UTF8*/, "C", "C",
        false, true, Option.empty[Seq[String]]) }
      .toDF("oid", "datname", "datdba", "encoding", "datcollate",
        "datctype", "datistemplate", "datallowconn", "datacl")
      .createOrReplaceTempView("pg_database")

    // live backends (psql \watch dashboards, ORM pool health checks)
    activity.sortBy(_._1).map { case (pid, u, d, addr, startMs, q) =>
      (pid, u, d, addr, new java.sql.Timestamp(startMs),
        if (q.isEmpty) "idle" else "active", q, "client backend")
    }.toDF("pid", "usename", "datname", "client_addr", "backend_start",
        "state", "query", "backend_type")
      .createOrReplaceTempView("pg_stat_activity")

    def ofKind(k: String) = objs.filter(_.kind == k)
    ofKind("r").map(o => (o.ns, o.bare, "graft",
        Option.empty[String], false, false, false))
      .toDF("schemaname", "tablename", "tableowner", "tablespace",
        "hasindexes", "hasrules", "hastriggers")
      .createOrReplaceTempView("pg_tables")
    ofKind("m").map(o => (o.ns, o.bare, "graft", true, ""))
      .toDF("schemaname", "matviewname", "matviewowner", "ispopulated",
        "definition")
      .createOrReplaceTempView("pg_matviews")
    ofKind("v").map(o => (o.ns, o.bare, "graft", ""))
      .toDF("schemaname", "viewname", "viewowner", "definition")
      .createOrReplaceTempView("pg_views")

    // session-config registry (psql \dconfig, `SELECT … FROM pg_settings`;
    // reference: handler/variable.rs SHOW ALL over session_config) —
    // (name, setting, boot_val, short_desc) from the live variable store
    settings.map { case (n, v, boot, desc) =>
      (n, v, Option.empty[String], "Client Connection Defaults", desc,
        "user", "string", "session", boot, v, false)
    }.toDF("name", "setting", "unit", "category", "short_desc", "context",
        "vartype", "source", "boot_val", "reset_val", "pending_restart")
      .createOrReplaceTempView("pg_settings")

    val isTables = objs.filter(o => "rmvf".contains(o.kind)).map { o =>
      val tt = o.kind match {
        case "r" => "BASE TABLE"
        case "v" => "VIEW"
        case "f" => "FOREIGN"
        case _ => "MATERIALIZED VIEW" // info-schema extension, like the reference
      }
      ("dev", o.ns, o.bare, tt)
    }
    isTables.toDF("table_catalog", "table_schema", "table_name", "table_type")
      .createOrReplaceTempView("information_schema_tables")

    objs.flatMap { o =>
      o.schema.toSeq.flatMap(_.fields.zipWithIndex.map { case (f, i) =>
        ("dev", o.ns, o.bare, f.name, i + 1, Option.empty[String],
          if (f.nullable) "YES" else "NO", dataTypeName(f.dataType),
          typNameOf.getOrElse(oidOf(f.dataType).toLong, "text"))
      })
    }.toDF("table_catalog", "table_schema", "table_name", "column_name",
        "ordinal_position", "column_default", "is_nullable", "data_type",
        "udt_name")
      .createOrReplaceTempView("information_schema_columns")

    (Seq(("public", Owner), ("pg_catalog", Owner),
        ("information_schema", Owner)) ++
      userSchemas.sorted.map(n => (n, Owner)))
      .toDF("schema_name", "schema_owner")
      .createOrReplaceTempView("information_schema_schemata")

    // pg_proc: the engine's registered callables (CREATE AGGREGATE UDAFs,
    // SQL UDFs, native Catalyst expressions; catalog shims hidden in
    // pg_catalog). psql's \df renders via the pg_get_function_* shims,
    // which read the oid→signature map refreshed here per bind.
    val fs = funcs.sortBy(_.name).zipWithIndex.map { case (f, i) =>
      (FirstFuncOid + i, f)
    }
    funcSigs.set(fs.map { case (oid, f) => oid -> (f.args, f.result) }.toMap)
    fs.map { case (oid, f) =>
      val retOid = oidOfTypeName.getOrElse(f.result.toLowerCase, 25L)
      (oid, f.name, if (f.inPgCatalog) NsPgCatalog else NsPublic, Owner,
        f.kind, retOid, false /*proretset*/, "v" /*provolatile*/,
        "u" /*proparallel*/, false /*prosecdef*/, false /*proleakproof*/,
        false /*proisstrict*/, 0 /*pronargs*/)
    }.toDF("oid", "proname", "pronamespace", "proowner", "prokind",
        "prorettype", "proretset", "provolatile", "proparallel",
        "prosecdef", "proleakproof", "proisstrict", "pronargs")
      .createOrReplaceTempView("pg_proc")
    fs.filterNot(_._2.inPgCatalog).map { case (_, f) =>
      ("dev", "public", f.name, "FUNCTION",
        if (f.result.isEmpty) "text" else f.result)
    }.toDF("routine_catalog", "routine_schema", "routine_name",
        "routine_type", "data_type")
      .createOrReplaceTempView("information_schema_routines")

    registerShims(spark)
  }

  /** rw_catalog subset (reference: src/frontend/src/catalog/
    * system_catalog/rw_catalog/ — 52 relations). The LOGICAL-catalog
    * relations are modeled with the reference's column names; the
    * runtime-physical ones (actors, fragments, hummock LSM, meta
    * cluster) are concepts this engine delegates to Spark and answer
    * EMPTY through the Unmodeled fence. Timestamps/cluster-version
    * columns exist (reference shape) and read NULL.
    */
  def bindRw(spark: SparkSession, objs0: Seq[Obj],
      pks: Map[String, Seq[String]],
      defs: Map[String, String],
      deps: Seq[(String, String)],
      jobs: Map[String, String],
      sinks: Seq[String],
      fns: Seq[(String, String, String, String)],
      userSchemas: Seq[String] = Seq.empty,
      userRows: Seq[(String, Boolean, Boolean, Boolean)] = Seq.empty,
      secretNames: Seq[String] = Seq.empty,
      epochRows: Seq[(String, Long, Long)] = Seq.empty,
      comments: Map[String, String] = Map.empty,
      subs: Seq[(String, String)] = Seq.empty,
      jobParallelism: Map[String, Int] = Map.empty,
      connectionRows: Seq[(String, String)] = Seq.empty): Unit = {
    val s = spark
    import s.implicits._
    val none: Option[java.sql.Timestamp] = None
    val objs = objs0.sortBy(_.name)
    val oidByName = (objs.map(_.name) ++ sinks.sorted).zipWithIndex
      .map { case (n, i) => n -> (FirstUserOid + i).toInt }.toMap
    val owner = Owner.toInt
    val acl = Seq.empty[String]
    def dOf(n: String) = defs.getOrElse(n, "")
    val nsIdOf: Map[String, Int] =
      Map("public" -> NsPublic.toInt) ++ userSchemas.sorted.zipWithIndex
        .map { case (n, i) => n -> (FirstUserNsOid + i).toInt }
    def nsOf(o: Obj): Int = nsIdOf.getOrElse(o.ns, NsPublic.toInt)

    Seq((0, "dev", owner, acl))
      .toDF("id", "name", "owner", "acl")
      .createOrReplaceTempView("rw_databases")
    (Seq((NsPgCatalog.toInt, "pg_catalog", 0, owner, acl),
        (NsPublic.toInt, "public", 0, owner, acl),
        (NsInfoSchema.toInt, "information_schema", 0, owner, acl),
        (13100, "rw_catalog", 0, owner, acl)) ++
      userSchemas.sorted.map(n => (nsIdOf(n), n, 0, owner, acl)))
      .toDF("id", "name", "database_id", "owner", "acl")
      .createOrReplaceTempView("rw_schemas")

    def baseRows(kind: String) = objs.filter(_.kind == kind).map { o =>
      (oidByName(o.name), o.bare, nsOf(o), owner, dOf(o.name))
    }
    baseRows("r").map { case (id, n, sc, ow, df) =>
      (id, n, sc, ow, df, false, acl, none, none,
        Option.empty[String], Option.empty[String])
    }.toDF("id", "name", "schema_id", "owner", "definition", "append_only",
        "acl", "initialized_at", "created_at",
        "initialized_at_cluster_version", "created_at_cluster_version")
      .createOrReplaceTempView("rw_tables")
    baseRows("m").map { case (id, n, sc, ow, df) =>
      (id, n, sc, ow, df, false, acl, none, none,
        Option.empty[String], Option.empty[String], false)
    }.toDF("id", "name", "schema_id", "owner", "definition", "append_only",
        "acl", "initialized_at", "created_at",
        "initialized_at_cluster_version", "created_at_cluster_version",
        "background_ddl")
      .createOrReplaceTempView("rw_materialized_views")
    baseRows("v").map { case (id, n, sc, ow, df) => (id, n, sc, ow, df, acl) }
      .toDF("id", "name", "schema_id", "owner", "definition", "acl")
      .createOrReplaceTempView("rw_views")
    baseRows("f").map { case (id, n, sc, ow, df) =>
      (id, n, sc, ow, "filesystem", df, true, acl)
    }.toDF("id", "name", "schema_id", "owner", "connector", "definition",
        "append_only", "acl")
      .createOrReplaceTempView("rw_sources")
    sinks.sorted.map { n =>
      (oidByName(n), n, NsPublic.toInt, owner, "filesystem", "upsert",
        dOf(n), acl)
    }.toDF("id", "name", "schema_id", "owner", "connector", "sink_type",
        "definition", "acl")
      .createOrReplaceTempView("rw_sinks")
    baseRows("i").map { case (id, n, sc, ow, df) => (id, n, sc, ow, df, acl) }
      .toDF("id", "name", "schema_id", "owner", "definition", "acl")
      .createOrReplaceTempView("rw_indexes")

    val relType = Map("r" -> "table", "m" -> "materialized view",
      "v" -> "view", "f" -> "source", "i" -> "index")
    (objs.map(o => (oidByName(o.name), o.bare,
        relType.getOrElse(o.kind, "table"), nsOf(o), owner,
        dOf(o.name), acl)) ++
      sinks.sorted.map(n => (oidByName(n), n, "sink", NsPublic.toInt,
        owner, dOf(n), acl)))
      .toDF("id", "name", "relation_type", "schema_id", "owner",
        "definition", "acl")
      .createOrReplaceTempView("rw_relations")

    objs.flatMap { o =>
      val pk = pks.getOrElse(o.name, Seq.empty)
      o.schema.toSeq.flatMap(_.fields.zipWithIndex.map { case (f, i) =>
        (oidByName(o.name), f.name, i + 1, f.name.startsWith("_"),
          pk.contains(f.name), false, false, Option.empty[String],
          dataTypeName(f.dataType), oidOf(f.dataType))
      })
    }.toDF("relation_id", "name", "position", "is_hidden",
        "is_primary_key", "is_distribution_key", "is_generated",
        "generation_expression", "data_type", "type_oid")
      .createOrReplaceTempView("rw_columns")

    deps.flatMap { case (obj, ref) =>
      for (a <- oidByName.get(obj); b <- oidByName.get(ref)) yield (a, b)
    }.toDF("objid", "refobjid").createOrReplaceTempView("rw_depend")

    jobs.toSeq.sorted.map { case (n, st) =>
      (oidByName.getOrElse(n, 0), n, st, 32)
    }.toDF("job_id", "name", "status", "parallelism")
      .createOrReplaceTempView("rw_streaming_jobs")

    fns.sortBy(_._1).zipWithIndex.map { case ((n, kind, lang, link), i) =>
      ((FirstFuncOid + i).toInt, n, NsPublic.toInt, owner, kind, lang,
        link, acl)
    }.toDF("id", "name", "schema_id", "owner", "kind", "language",
        "link", "acl")
      .createOrReplaceTempView("rw_functions")

    (("graft", true, true, true) +: userRows.filterNot(_._1 == "graft"))
      .sortBy(_._1).zipWithIndex.map { case ((n, sup, cdb, login), i) =>
        (if (n == "graft") owner else (FirstUserRoleOid + i).toInt,
          n, sup, cdb, sup /*create_user*/, login)
      }.toDF("id", "name", "is_super", "create_db", "create_user",
        "can_login")
      .createOrReplaceTempView("rw_users")

    // secret NAMES only (reference rw_secrets never exposes payloads)
    secretNames.sorted.zipWithIndex
      .map { case (n, i) => (31000 + i, n, NsPublic.toInt, owner, acl) }
      .toDF("id", "name", "schema_id", "owner", "acl")
      .createOrReplaceTempView("rw_secrets")

    // connection objects (reference rw_catalog/rw_connections.rs):
    // name + type; property values stay out of the catalog surface
    connectionRows.sortBy(_._1).zipWithIndex
      .map { case ((n, t), i) =>
        (31500 + i, n, NsPublic.toInt, owner, t, "", acl) }
      .toDF("id", "name", "schema_id", "owner", "type", "provider", "acl")
      .createOrReplaceTempView("rw_connections")

    // published-epoch timeline per relation — the binding surface for
    // `FOR SYSTEM_TIME AS OF` (the reference exposes its meta snapshots
    // through rw_catalog the same way)
    epochRows
      .map { case (n, e, ms) => (n, e, new java.sql.Timestamp(ms)) }
      .toDF("relation_name", "epoch", "committed_at")
      .createOrReplaceTempView("rw_epochs")

    // COMMENT ON text, rw-side (reference rw_description.rs): classoid
    // names the owning rw catalog relation; objsubid NULL = the object,
    // n = its n-th column
    val classOidOf = Map("r" -> 13110, "m" -> 13111, "v" -> 13112,
      "f" -> 13113, "i" -> 13114)
    comments.toSeq.sorted.flatMap { case (key, text) =>
      val (obj, colName) = key.split("\\.", 2) match {
        case Array(o, c) => (o, Some(c))
        case Array(o) => (o, None)
      }
      for {
        oid <- oidByName.get(obj)
        o <- objs.find(_.name == obj)
        sub <- colName match {
          case None => Some(Option.empty[Int])
          case Some(c) => o.schema.flatMap(s =>
            s.fieldNames.zipWithIndex.collectFirst {
              case (n, i) if n == c => Some(i + 1)
            })
        }
      } yield (oid, classOidOf.getOrElse(o.kind, 13110), sub, text)
    }.toDF("objoid", "classoid", "objsubid", "description")
      .createOrReplaceTempView("rw_description")

    subs.sortBy(_._1).zipWithIndex.map { case ((n, from), i) =>
      (32000 + i, n, NsPublic.toInt, owner,
        s"CREATE SUBSCRIPTION $n FROM $from", acl, none, none,
        Option.empty[String], Option.empty[String])
    }.toDF("id", "name", "schema_id", "owner", "definition", "acl",
        "initialized_at", "created_at", "initialized_at_cluster_version",
        "created_at_cluster_version")
      .createOrReplaceTempView("rw_subscriptions")

    // parallelism here IS the MV store's bucket count (ALTER … SET
    // PARALLELISM re-buckets); ADAPTIVE when the job never pinned one
    val jobSeq = jobs.toSeq.sorted
    jobSeq.map { case (n, _) =>
      (oidByName.getOrElse(n, 0), n, "materialized view",
        jobParallelism.get(n).map(p => s"FIXED($p)").getOrElse("ADAPTIVE"),
        32)
    }.toDF("id", "name", "relation_type", "parallelism", "max_parallelism")
      .createOrReplaceTempView("rw_streaming_parallelism")

    // one fragment per streaming job — this engine's chain hop is the
    // fragment analog; upstreams are the chained-from jobs
    val jobOids = jobSeq.flatMap(j => oidByName.get(j._1).map(j._1 -> _)).toMap
    jobSeq.map { case (n, _) =>
      val oid = jobOids.getOrElse(n, 0)
      val ups = deps.collect { case (o, r) if o == n && jobOids.contains(r) =>
        jobOids(r) }
      (oid, oid, "HASH", Seq(oid), ups, Seq("MVIEW"),
        jobParallelism.getOrElse(n, 32), 32)
    }.toDF("fragment_id", "table_id", "distribution_type",
        "state_table_ids", "upstream_fragment_ids", "flags",
        "parallelism", "max_parallelism")
      .createOrReplaceTempView("rw_fragments")

    // single-process runtime: one compute worker (local[N])
    Seq((0, Option("localhost"), Option("0"), "COMPUTE", "RUNNING",
        Option(java.lang.Runtime.getRuntime.availableProcessors()),
        Option(true), Option(true), Option(false)))
      .toDF("id", "host", "port", "type", "state", "parallelism",
        "is_streaming", "is_serving", "is_unschedulable")
      .createOrReplaceTempView("rw_worker_nodes")

    pgTypes.map { case (oid, name, _, _) =>
      (oid.toInt, name, name + "in", 0, 0)
    }.toDF("id", "name", "input_oid", "typelem", "typarray")
      .createOrReplaceTempView("rw_types")
  }

  private val FirstFuncOid = 30000L

  /** oid→(argument list, result type) for the pg_get_function_* shims —
    * the once-registered UDFs read through this reference, so each bind
    * refreshes what they answer.
    */
  private val funcSigs = new java.util.concurrent.atomic.AtomicReference(
    Map.empty[Long, (String, String)])

  private val oidOfTypeName: Map[String, Long] =
    pgTypes.flatMap(t => Seq(t._2 -> t._1, t._4 -> t._1)).toMap

  /** Names the catalog layer itself registers — surfaced in pg_proc under
    * pg_catalog (so `\df` without a pattern shows only user functions,
    * like PG hides its builtins).
    */
  val shimNames: Set[String] = Set(
    "pg_table_is_visible", "pg_get_userbyid", "pg_encoding_to_char",
    "obj_description", "col_description", "shobj_description",
    "pg_get_expr", "pg_get_indexdef", "pg_get_viewdef", "pg_backend_pid",
    "pg_postmaster_start_time", "current_schemas", "has_schema_privilege",
    "has_table_privilege", "array_to_string", "format_type",
    "pg_function_is_visible", "pg_get_function_result",
    "pg_get_function_arguments", "pg_get_function_identity_arguments")

  @volatile private var shimsDone = false

  /** Catalog helper functions psql/pgjdbc call. Registered once per JVM
    * (Spark UDF registry is session-wide).
    */
  private def registerShims(spark: SparkSession): Unit = {
    if (shimsDone) return
    shimsDone = true
    spark.udf.register("pg_table_is_visible", (_: Long) => true)
    spark.udf.register("pg_get_userbyid", (_: Long) => "graft")
    spark.udf.register("pg_encoding_to_char", (_: Int) => "UTF8")
    spark.udf.register("obj_description",
      (_: Long, _: String) => null: String)
    spark.udf.register("col_description",
      (_: Long, _: Int) => null: String)
    spark.udf.register("shobj_description",
      (_: Long, _: String) => null: String)
    spark.udf.register("pg_get_expr",
      (adbin: String, _: Long) => adbin)
    spark.udf.register("pg_get_indexdef",
      (_: Long, _: Int, _: Boolean) => null: String)
    spark.udf.register("pg_get_viewdef", (_: Long, _: Boolean) => "")
    spark.udf.register("pg_backend_pid", () => 1)
    spark.udf.register("pg_function_is_visible", (_: Long) => true)
    spark.udf.register("pg_get_function_result",
      (oid: Long) => funcSigs.get.get(oid).map(_._2).orNull)
    spark.udf.register("pg_get_function_arguments",
      (oid: Long) => funcSigs.get.get(oid).map(_._1).orNull)
    spark.udf.register("pg_get_function_identity_arguments",
      (oid: Long) => funcSigs.get.get(oid).map(_._1).orNull)
    spark.udf.register("pg_postmaster_start_time", () => "")
    spark.udf.register("current_schemas",
      (_: Boolean) => Seq("pg_catalog", "public"))
    spark.udf.register("has_schema_privilege",
      (_: String, _: String) => true)
    spark.udf.register("has_table_privilege",
      (_: String, _: String) => true)
    // PG's array_to_string (Spark spells it array_join); psql \l uses it
    spark.udf.register("array_to_string",
      (a: Seq[String], sep: String) => if (a == null) null else a.mkString(sep))
    spark.udf.register("format_type", (oid: Long, typmod: Integer) => {
      val base = dataTypeNameOf.getOrElse(oid, "text")
      if (base == "numeric" && typmod != null && typmod >= 4) {
        val m = typmod - 4
        s"numeric(${m >> 16},${m & 0xffff})"
      } else base
    })
  }
}
