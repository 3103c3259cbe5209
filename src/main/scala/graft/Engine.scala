package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{MaterializedView, MvCatalog}
import graft.SqlFrontend.{CreateMvDef, SourceDef}

/** User-facing facade — the session surface a reference user lands on
  * after switching (reference: frontend `SessionImpl.run_statement`,
  * src/frontend/src/session.rs:1168): SQL over registered tables, plus
  * CREATE-MATERIALIZED-VIEW as a first-class operation.
  *
  * Every definition created through [[execute]] persists in a
  * [[DurableCatalog]] under the warehouse; a fresh Engine over the same
  * warehouse recovers all of them — tables read with their declared
  * schemas, streaming MVs resume maintenance from their surviving
  * checkpoints, cursors resume at their committed frontiers (the
  * reference's meta-store recovery, docs/dev/src/design/meta-service.md).
  */
final class Engine(val spark: SparkSession, warehouseDir: String) {

  val mvs = new MvCatalog(spark, warehouseDir)

  private val catalog = new DurableCatalog(warehouseDir)

  /** User-visible NOTICE lines (PG-style) from the last statements —
    * e.g. the "maintained as BATCH REFRESH" degradation fence. Printed
    * to stderr as they happen; kept here so clients/specs can read them.
    */
  val notices = scala.collection.mutable.Buffer[String]()

  private def notice(msg: String): Unit = {
    notices += msg
    System.err.println(s"[graft] NOTICE: $msg")
  }

  GraftSession.init(spark)

  /** Register the driver test tables (or any parquet dir laid out the
    * same way) into the session catalog. Also retries any catalog
    * recoveries that were waiting on these tables (an MV whose defining
    * query scans them cannot re-plan before they exist).
    */
  def attachTables(dir: String): Unit = {
    Tables.register(spark, dir)
    retryPendingRecovery()
  }

  /** Ad-hoc batch SQL — parse/bind/plan/optimize/execute are Catalyst. */
  def sql(query: String): DataFrame = spark.sql(query)

  /** CREATE MATERIALIZED VIEW over a streaming DataFrame: starts the
    * maintenance job (micro-batch merge by PK) and registers the MV so
    * [[table]] and downstream MVs can read it.
    *
    * `queryText` (the defining SQL, when the MV came in through
    * [[execute]]) is what recovery re-plans to resume maintenance; an MV
    * created from a raw DataFrame has no re-plannable text — its storage
    * still recovers, maintenance needs re-issuing.
    */
  def createMaterializedView(
      name: String, pk: Seq[String], transformed: DataFrame,
      nBuckets: Int = -1, outputMode: String = "update",
      queryText: Option[String] = None): StreamingQuery = {
    val mv = mvs.define(name, pk, nBuckets)
    catalog.save("mvs", name, DurableCatalog.MvEntry(
      pk, queryText, streaming = true, outputMode, mv.nBuckets))
    mv.start(transformed, mvs.checkpointDir(name), outputMode = outputMode)
  }

  /** Batch-refresh MV (CREATE MATERIALIZED VIEW over a batch query):
    * materializes once; re-call to refresh incrementally by PK.
    */
  def refreshMaterializedView(
      name: String, pk: Seq[String], result: DataFrame,
      nBuckets: Int = -1, queryText: Option[String] = None): MaterializedView = {
    val mv = mvs.get(name).getOrElse(mvs.define(name, pk, nBuckets))
    if (catalog.load[DurableCatalog.MvEntry]("mvs", name).isEmpty)
      catalog.save("mvs", name, DurableCatalog.MvEntry(
        pk, queryText, streaming = false, "update", mv.nBuckets))
    mv.merge(result)
    mv
  }

  /** Declared schemas of `CREATE TABLE` tables — consulted while the
    * backing store is still empty (a fresh table has no parquet footer
    * to read a schema from).
    */
  private val tableSchemas =
    scala.collection.mutable.Map[String, org.apache.spark.sql.types.StructType]()

  /** `CREATE TABLE … AS SELECT` tables without a declared PK carry a
    * generated `_row_id` PK (reference: handler/create_table_as.rs +
    * stream row_id_gen) — hidden from star expansion like the
    * reference's hidden column.
    */
  private val hiddenRowIdTables = scala.collection.mutable.Set[String]()

  /** Read a table or registered MV; a fresh (never-inserted) CREATE
    * TABLE table reads as empty WITH its declared schema.
    */
  def table(name: String, keepRowId: Boolean = false): DataFrame = {
    val df0 = mvs.get(name).map { mv =>
      val df = mv.read()
      if (df.schema.nonEmpty) df
      else tableSchemas.get(name).map { s =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      }.getOrElse(df)
    }.getOrElse(spark.table(name))
    // temporal-filter MV: residual horizon filter — reads are exact at
    // any instant, eviction (at barrier drains) only reclaims state
    val df1 = temporalFilters.get(name) match {
      case Some((c, ms, incl)) if df0.columns.contains(c) =>
        val cutoff = new java.sql.Timestamp(temporalNowMs - ms)
        val cc = org.apache.spark.sql.functions.col(c)
        val cv = org.apache.spark.sql.functions.lit(cutoff)
        df0.where(if (incl) cc >= cv else cc > cv)
      case _ => df0
    }
    if (hiddenRowIdTables.contains(name) && !keepRowId)
      df1.drop(Engine.RowIdCol)
    else df1
  }

  /** Streaming sources registered by `CREATE SOURCE`. */
  private val sources = scala.collection.mutable.Map[String, DataFrame]()

  /** Snapshot of every user-visible object for the pg_catalog /
    * information_schema system relations (reference:
    * src/frontend/src/catalog/system_catalog/). Schemas come from the
    * declared table schema / the MV or source plan — metadata only, no
    * job runs.
    */
  private def systemObjects: Seq[SystemCatalog.Obj] = {
    def schemaOf(df: => DataFrame) = scala.util.Try(df.schema).toOption
    // the catalog surface is scoped to the SESSION DATABASE: another
    // database's objects are invisible (the reference's per-database
    // catalog isolation), and a non-dev database's objects display
    // under their user-facing schema names
    def obj(n: String, kind: String, schema: Option[org.apache.spark.sql.types.StructType]) = {
      val (nsi, bare) = splitNs(n)
      val us = dbOfSchema(nsi)._2
      SystemCatalog.Obj(n, kind, schema, us,
        if (nsi == "public") "" else bare)
    }
    // internal suffixes hide AFTER the schema prefix is stripped — a
    // schema-qualified table whose bare name happens to be `base` must
    // not vanish from the catalog
    def hiddenInternal(n: String): Boolean = {
      val bare = splitNs(n)._2
      bare.endsWith("__base") || bare.endsWith("__keys") ||
      bare.contains("__casc") ||
        bare.endsWith("__sinkq")
    }
    // the hidden `_row_id` PK stays out of the catalog column listing
    // (reference: ColumnCatalog::row_id_column is_hidden)
    val tableObjs = tableSchemas.keys.toSeq.sorted.map(n =>
      obj(n, "r", Some(
        if (hiddenRowIdTables.contains(n))
          org.apache.spark.sql.types.StructType(
            tableSchemas(n).filterNot(_.name == Engine.RowIdCol))
        else tableSchemas(n))))
    val mvObjs = mvs.list
      .filterNot(n => tableSchemas.contains(n) || hiddenInternal(n))
      .map(n => obj(n, "m", schemaOf(table(n))))
    val viewObjs = catalog.list[DurableCatalog.ViewEntry]("views")
      .map { case (n, _) => obj(n, "v", schemaOf(spark.table(n))) }
    val srcObjs = sources.keys.toSeq.sorted.map(n =>
      obj(n, "f", schemaOf(sources(n))))
    val idxObjs = indexes.keys.toSeq.sorted.map(n => obj(n, "i", None))
    (tableObjs ++ mvObjs ++ viewObjs ++ srcObjs ++ idxObjs)
      .filter(o => inSessionDb(o.name))
  }

  /** The session database's schemas, user-facing names (for
    * pg_namespace / SHOW SCHEMAS — other databases' schemas are
    * invisible; the pseudo-public root is rendered by the base
    * "public" row, not listed again).
    */
  /** Listing filter for SHOW surfaces: session-database objects only,
    * rendered internal in dev (legacy surface) and user-facing in a
    * named database (whose internal prefix is an implementation
    * detail).
    */
  private def showListing(ns: Seq[String]): Seq[String] = {
    val mine = ns.filter(inSessionDb)
    if (sessionDatabase == "dev") mine.sorted
    else mine.map(displayName).sorted
  }

  private def sessionSchemaNames: Seq[String] =
    schemaNames.toSeq.flatMap { sn =>
      val (db, us) = dbOfSchema(sn)
      if (db == sessionDatabase && us != "public") Some(us) else None
    }

  /** Populate the rw_catalog relations from the live engine state
    * (reference: rw_catalog/ system tables — its users' operational
    * introspection surface: SHOW-ish metadata, definitions, chain
    * dependencies, streaming-job status).
    */
  private def rwBind(): Unit = {
    val objs = systemObjects
    val kindWord = Map("r" -> "TABLE", "m" -> "MATERIALIZED VIEW",
      "v" -> "VIEW", "f" -> "SOURCE", "i" -> "INDEX")
    val defs = (objs.map(o => o.name -> scala.util.Try(
        createDdl(kindWord(o.kind), o.name)).getOrElse("")) ++
      sinkNames.toSeq.map(n => n -> scala.util.Try(
        createDdl("SINK", n)).getOrElse(""))).toMap
    val pks = objs.flatMap(o =>
      mvs.get(o.name).map(mv => o.name -> mv.primaryKey)).toMap
    val deps = catalog.list[DurableCatalog.MvEntry]("mvs")
      .flatMap { case (n, e) =>
        (e.chainedFrom.toSeq ++ e.chainedFromRight.toSeq).map(u => n -> u)
      } ++ indexes.toSeq.map { case (n, d) => n -> d.table }
    val jobStatus = jobs.toSeq.map { case (n, q) =>
      n -> (if (q.isActive) "RUNNING" else "STOPPED")
    }.toMap
    val fns = externalFns.toSeq.map { case (n, e) =>
        (n, "f", e.lang.getOrElse("external"), e.link)
      } ++ embeddedFns.toSeq.map { case (n, e) =>
        (n, "f", e.lang, "")
      } ++ embeddedUdtfs.toSeq.map { case (n, e) =>
        (n, "f", e.lang, "")
      } ++ aggregates.toSeq.map { case (n, (impl, _)) =>
        (n, "a", "native", "")
      } ++ embeddedAggs.toSeq.map { case (n, e) =>
        (n, "a", e.lang, "")
      }
    // published-epoch timeline per engine-managed relation — what
    // `FOR SYSTEM_TIME AS OF` binds against (the reference exposes its
    // meta snapshots the same way, rw_catalog/rw_hummock_* relations)
    val epochRows = objs.filter(o => o.kind == "r" || o.kind == "m")
      .flatMap(o => mvs.get(o.name).toSeq.flatMap(
        _.epochCommitTimes.map { case (e, ms) => (displayName(o.name), e, ms) }))
    SystemCatalog.bindRw(spark, objs, pks, defs, deps, jobStatus,
      sinkNames.toSeq.filter(inSessionDb), fns, sessionSchemaNames,
      users.toSeq.map { case (n, e) => (n, e.superuser, e.createdb, e.login) },
      secrets.keys.toSeq, epochRows,
      comments = catalog.list[DurableCatalog.CommentEntry]("comments")
        .map { case (k, e) => k.replace('-', '.') -> e.text }.toMap,
      subs = subscriptions.toSeq,
      jobParallelism = mvs.list
        .flatMap(n => mvs.get(n).map(n -> _.nBuckets)).toMap,
      connectionRows = connections.toSeq.map { case (n, p) =>
        (n, p.getOrElse("type", "generic")) })
  }

  /** The engine's registered callables for pg_proc (psql `\df`, ORM
    * function introspection): everything in the session function registry
    * that is not a Spark builtin — CREATE AGGREGATE UDAFs, SQL UDFs
    * (Spark CREATE TEMPORARY FUNCTION), native Catalyst expressions
    * (graft_dot, graft_gcd, …) — plus the catalog's own shims, which sort
    * into pg_catalog so a bare `\df` lists only user functions.
    */
  private def systemFunctions: Seq[SystemCatalog.Func] = {
    val reg = spark.sessionState.functionRegistry
    val builtin = org.apache.spark.sql.catalyst.analysis.FunctionRegistry
      .builtin.listFunction().map(_.funcName).toSet
    reg.listFunction()
      .filterNot(f => builtin.contains(f.funcName))
      .map { f =>
        val name = f.funcName
        val (args, result) = aggregates.get(name).map(_._2) match {
          // CREATE AGGREGATE signatures read "(args) RETURNS type [— …]"
          case Some(sig) =>
            val args = sig.takeWhile(_ != ')').dropWhile(_ == '(')
            val ret = sig.split("(?i)RETURNS").lift(1)
              .map(_.trim.takeWhile(c => c.isLetterOrDigit || c == ' ').trim)
              .getOrElse("")
            (args, ret)
          case None => externalFns.get(name)
            .map(e => (e.argTypes.map(_.toLowerCase).mkString(", "),
              e.retType.toLowerCase))
            .orElse((embeddedFns.get(name) orElse embeddedAggs.get(name)
                orElse embeddedUdtfs.get(name))
              .map(e => (e.argTypes.map(_.toLowerCase).mkString(", "),
                e.retType.toLowerCase)))
            .getOrElse(Engine.NativeFunctionSigs.getOrElse(name, ("", "")))
        }
        val kind =
          if (aggregates.contains(name)) "a"
          else if (reg.lookupFunction(f)
            .exists(i => Option(i.getClassName).exists(_.contains("Agg"))))
            "a"
          else "f"
        SystemCatalog.Func(name, kind, args, result,
          inPgCatalog = SystemCatalog.shimNames.contains(name))
      }
      .sortBy(_.name)
  }

  /** Maintenance jobs of streaming MVs created through [[execute]] —
    * exposed so callers can await/stop them (the reference's
    * SHOW/DROP stream-job surface).
    */
  // concurrent: read by the background-compactor daemon while the
  // engine thread mutates during CREATE/DROP (advice r8)
  private val jobs = scala.collection.concurrent.TrieMap[String, StreamingQuery]()

  def streamingJob(name: String): Option[StreamingQuery] = jobs.get(name)

  private def statusDf(kind: String, name: String): DataFrame = {
    import spark.implicits._
    Seq((kind, name)).toDF("statement", "name")
  }

  /** `CREATE TABLE name [(PRIMARY KEY (cols))] AS <query>` (reference:
    * handler/create_table_as.rs). Without a PK clause, rows get a
    * generated hidden `_row_id` PK like the reference's append-only
    * tables. Must be matched BEFORE the column-list CREATE TABLE parser.
    */
  private val CreateTableAs =
    """(?is)\s*CREATE\s+TABLE\s+(\w+)\s*(?:\(\s*PRIMARY\s+KEY\s*\(([\w\s,]+)\)\s*\))?\s+AS\s+((?:SELECT|WITH|VALUES)\s.*)""".r
  /** `COMMENT ON <kind> obj[.col] IS '…' | NULL` (reference:
    * handler/comment.rs) — durable, surfaced via pg_description.
    */
  private val CommentOn =
    """(?is)\s*COMMENT\s+ON\s+(TABLE|MATERIALIZED\s+VIEW|VIEW|COLUMN|INDEX|SOURCE)\s+([\w.]+)\s+IS\s+(?:'((?:[^']|'')*)'|(NULL))\s*;?\s*""".r
  /** `DISCARD ALL/…` (reference: handler/discard.rs; issued by psql and
    * poolers on session reset) — this engine keeps no per-connection
    * session state to reset, so it is a successful no-op.
    */
  private val Discard =
    """(?is)\s*DISCARD\s+(ALL|PLANS|SEQUENCES|TEMP|TEMPORARY)\s*;?\s*""".r

  private val DropMv =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(\w+)\s*;?\s*""".r
  private val Flush = """(?is)\s*FLUSH\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM(?:\s+(?:FULL|ANALYZE|\(\s*\w+\s*\)))*(?:\s+(\w+))?\s*;?\s*""".r
  private val InsertValues =
    """(?is)\s*INSERT\s+INTO\s+(\w+)\s*(?:\(([\w\s,]+)\))?\s+(VALUES\s+.*|SELECT\s+.*)""".r
  private val DeleteFrom =
    """(?is)\s*DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*?))?\s*;?\s*""".r
  private val UpdateSet =
    """(?is)\s*UPDATE\s+(\w+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*?))?\s*;?\s*""".r

  /** DML over a registered MV-backed table (the reference's
    * table DML path, src/frontend/src/handler/dml.rs): routed through
    * [[graft.operators.Dml]] so deletes/updates publish changelog ops.
    * DML naming a plain catalog table falls through to Spark SQL.
    */
  /** DEFAULT expressions declared on CREATE TABLE columns. */
  private val tableDefaults =
    scala.collection.mutable.Map[String, Map[String, String]]()

  /** Generated columns (`col type AS expr`, reference: create_table.rs)
    * — recomputed from the row's other columns on every INSERT/UPDATE,
    * never directly writable. */
  private val tableGenerated =
    scala.collection.mutable.Map[String, Map[String, String]]()

  /** ON CONFLICT behavior per table: "overwrite" (default merge
    * semantics), "ignore", "do update if not null". */
  private val tableOnConflict = scala.collection.mutable.Map[String, String]()

  /** The default (or null) fill for an INSERT's unprovided column. */
  private def defaultFill(tbl: String, f: org.apache.spark.sql.types.StructField) =
    tableDefaults.get(tbl).flatMap(_.get(f.name))
      .map(org.apache.spark.sql.functions.expr)
      .getOrElse(org.apache.spark.sql.functions.lit(null))
      .cast(f.dataType)

  /** Next free generated-row-id base: stored max + 1. One column-pruned
    * aggregate per INSERT into a row-id table — the ids a statement
    * generates are `base + monotonically_increasing_id()` (unique across
    * partitions; sparse, like the reference's vnode-stamped serial).
    */
  private def nextRowIdBase(tbl: String): Long =
    mvs.get(tbl).map { mv =>
      val df = mv.read()
      if (!df.columns.contains(Engine.RowIdCol)) 0L
      else {
        val r = df.agg(org.apache.spark.sql.functions
          .max(org.apache.spark.sql.functions.col(Engine.RowIdCol))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0) + 1L
      }
    }.getOrElse(0L)

  /** Fill one unprovided INSERT column: generated row id for a hidden
    * `_row_id` PK, the declared DEFAULT (or null) otherwise.
    */
  private def fillColumn(tbl: String, d: DataFrame,
      f: org.apache.spark.sql.types.StructField): DataFrame = {
    import org.apache.spark.sql.functions.{lit, monotonically_increasing_id}
    if (f.name == Engine.RowIdCol && hiddenRowIdTables.contains(tbl))
      d.withColumn(f.name,
        lit(nextRowIdBase(tbl)) + monotonically_increasing_id())
    else d.withColumn(f.name, defaultFill(tbl, f))
  }

  /** `RETURNING *` suffix on DML (reference: dml_returning.slt) —
    * stripped before matching; the affected rows become the statement's
    * result set.
    */
  private val ReturningSuffix = """(?is)^(.*?)\s+RETURNING\s+\*\s*;?\s*$""".r

  /** Freeze a result set: RETURNING reports pre-statement-visible rows,
    * so they must be materialized before the store is rewritten (a lazy
    * DataFrame would re-read post-update state). Client-bound by
    * definition — this collect is the result-set delivery, not a
    * data-path operation.
    */
  private def freeze(df: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(df.collect().toSeq.asJava, df.schema)
  }

  private def tryDml(statement0: String): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col, expr, lit}
    import graft.operators.Dml
    val (statement, returning) = statement0 match {
      case ReturningSuffix(body) => (body, true)
      case s => (s, false)
    }
    statement match {
      case InsertValues(name, colList, body) if mvs.get(name).isDefined =>
        val mv = mvs.get(name).get
        val df0 =
          if (body.trim.toUpperCase.startsWith("VALUES")) spark.sql(s"SELECT * FROM ($body)")
          else spark.sql(body)
        // target shape: stored schema, or the declared CREATE TABLE
        // schema while the store is still empty
        val target = {
          val stored = mv.read().schema
          if (stored.nonEmpty) stored
          else tableSchemas.getOrElse(name, stored)
        }
        // explicit column list: name the provided columns; unnamed
        // columns fill from their DEFAULT (or null). A positional row
        // narrower than the table fills the tail the same way
        // (reference: insert_unaligned.slt, table_with_default_columns.slt).
        val genCols = tableGenerated.getOrElse(name, Map.empty)
        val named = Option(colList) match {
          case Some(cl) =>
            val provided = cl.split(",").map(_.trim).toSeq
            provided.find(genCols.contains).foreach(g =>
              throw new IllegalArgumentException(
                s"INSERT INTO $name: column $g is generated and " +
                  "cannot be inserted into"))
            val renamed = df0.toDF(provided: _*)
            target.fields.foldLeft(renamed) { (d, f) =>
              if (provided.contains(f.name)) d else fillColumn(name, d, f)
            }
          case None =>
            // positional values map onto the VISIBLE columns — a hidden
            // row-id PK or a generated column is never positionally
            // addressable (reference: generated columns are skipped in
            // INSERT binding)
            val visible = target.fields.filterNot(f =>
              (f.name == Engine.RowIdCol && hiddenRowIdTables.contains(name))
                || genCols.contains(f.name))
            require(df0.columns.size <= visible.size,
              s"INSERT INTO $name: ${df0.columns.size} values for " +
                s"${visible.size} columns")
            val renamed = df0.toDF(
              visible.take(df0.columns.size).map(_.name).toSeq: _*)
            (visible.drop(df0.columns.size) ++
              target.fields.filterNot(visible.contains))
              .foldLeft(renamed) { (d, f) => fillColumn(name, d, f) }
        }
        // generated columns compute from the incoming row's values,
        // overriding any default/null fill
        val withGen = genCols.foldLeft(named) { case (d, (g, ge)) =>
          d.withColumn(g, expr(ge)) }
        // align VALUES literal types (e.g. INT literals into a BIGINT
        // column) with the target schema so merges never fork the
        // stored parquet schema
        val df = withGen.select(target.fields.map(f =>
          col(f.name).cast(f.dataType)).toSeq: _*)
        // ON CONFLICT (reference: create_table.rs on_conflict): default
        // merge semantics are OVERWRITE; IGNORE keeps the stored row;
        // DO UPDATE IF NOT NULL keeps stored values where the incoming
        // image is NULL
        val resolved = tableOnConflict.getOrElse(name, "overwrite") match {
          case "ignore" =>
            df.dropDuplicates(mv.primaryKey)
              .join(mv.read().select(mv.primaryKey.map(col): _*),
                mv.primaryKey, "left_anti")
          case "do update if not null" =>
            val old = mv.read()
            if (old.columns.isEmpty || old.isEmpty) df
            else {
              val dataCols = df.columns.toSeq.filterNot(mv.primaryKey.contains)
              df.alias("n").join(old.alias("o"), mv.primaryKey, "left")
                .select(mv.primaryKey.map(col) ++ dataCols.map(c =>
                  org.apache.spark.sql.functions.coalesce(
                    col(s"n.$c"), col(s"o.$c")).as(c)): _*)
                .select(df.columns.toSeq.map(col): _*)
            }
          case _ => df
        }
        Dml.insertInto(mv, resolved)
        Some(if (returning) resolved else statusDf("INSERT", name))
      case DeleteFrom(name, cond) if mvs.get(name).isDefined =>
        val mv = mvs.get(name).get
        val condCol = Option(cond).map(expr).getOrElse(lit(true))
        val returned = if (returning) Some(freeze(mv.read().where(condCol))) else None
        Dml.deleteWhere(mv, condCol)
        Some(returned.getOrElse(statusDf("DELETE", name)))
      case UpdateSet(name, sets, cond) if mvs.get(name).isDefined =>
        val mv = mvs.get(name).get
        val assignments = SqlFrontend.splitAssignments(sets).map {
          case (c, e) => c -> expr(e)
        }.toMap
        val genCols = tableGenerated.getOrElse(name, Map.empty)
        assignments.keys.find(genCols.contains).foreach(g =>
          throw new IllegalArgumentException(
            s"UPDATE $name: column $g is generated and cannot be SET"))
        // generated columns recompute from the POST-assignment row
        val post = genCols.toSeq.map { case (g, ge) => g -> expr(ge) }
        val condCol = Option(cond).map(expr).getOrElse(lit(true))
        // post-update image of the rows the predicate selected PRE-update
        val returned = if (returning) Some(freeze({
          val assigned = mv.read().where(condCol)
            .select(mv.read().columns.toSeq.map(c =>
              assignments.getOrElse(c, col(c)).as(c)): _*)
          post.foldLeft(assigned) { case (d, (g, ge)) => d.withColumn(g, ge) }
        })) else None
        Dml.updateWhere(mv, condCol, assignments, post)
        Some(returned.getOrElse(statusDf("UPDATE", name)))
      case _ => None
    }
  }
  /** MV-on-MV chain eligibility: the query must reference exactly ONE
    * relation, that relation must be a plain streaming-maintained MV
    * (not OVER-window — its maintenance publishes ad-hoc merges, not
    * epoch-published changelog entries), and the planned transform must
    * be per-row (Project/Filter only) — a per-delta replay of anything
    * stateful (agg/join/window/distinct) would not equal the delta of
    * the result. Stateful MV-on-MV stays on the programmatic
    * IncrementalAgg/IncrementalOver path.
    */
  /** Relation names a query's FROM clauses reference (parse-only). */
  /** Every relation a query reads — including those inside SUBQUERY
    * EXPRESSIONS (scalar, IN, EXISTS), which hang off expressions, not
    * plan children, and so are invisible to a plain plan traversal. The
    * chain planner keys its eligibility checks on this: a relation
    * hiding in a scalar subquery is a second streaming upstream whose
    * changes the chained replay would never see (the threshold moves,
    * rows already materialized never re-qualify) — found by
    * NexmarkChainSpec's q102 shape, which must FENCE, not chain.
    */
  private def referencedRelations(query: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    def walk(p: LogicalPlan): Seq[String] =
      p.collect { case n =>
        val here = n match {
          case r: UnresolvedRelation => Seq(r.multipartIdentifier.last)
          case _ => Nil
        }
        here ++ n.expressions.flatMap(_.collect {
          case s: SubqueryExpression => walk(s.plan)
        }.flatten)
      }.flatten
    walk(spark.sessionState.sqlParser.parsePlan(query)).distinct
  }

  /** Per-row plans (Project/Filter over a relation) are the shapes whose
    * per-delta replay equals the delta of the result — the only shapes
    * changelog rows may flow through unchanged. Generate (explode /
    * LATERAL VIEW — the reference's StreamProjectSet,
    * src/stream/src/executor/project_set.rs) is row-LINEAR too:
    * Δ(explode(R)) = explode(ΔR), and an update's U-/U+ before/after
    * images explode to exactly the rows to retract/insert even when the
    * element count changed. Each exploded row inherits its input row's
    * op/seq.
    */
  private def isPerRowPlan(planned: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    planned.queryExecution.analyzed.collect { case n => n }.forall {
      case _: Project | _: Filter | _: SubqueryAlias | _: View => true
      case _: Generate => true
      // hop-window assignment (TimeWindowing lowers sliding window() to
      // Expand): row-linear like Generate — each row lands in a FIXED
      // set of windows, so Δ(expand(R)) = expand(ΔR)
      case _: Expand => true
      case _: EventTimeWatermark => true
      case _: LeafNode => true
      case _ => false
    }
  }

  private def prefixSelect(query: String, extras: Seq[String]): String =
    query.replaceFirst("(?i)^\\s*SELECT\\s",
      "SELECT " + extras.mkString(", ") + ", ")

  /** A per-row streaming MV over a changelog-carrying source whose
    * SELECT list dropped `_op`/`_seq` would silently turn deletes into
    * upserts — re-plan with the changelog columns carried through
    * (reference semantics: any projection of a changelog keeps being a
    * changelog). Stateful plans and plain append sources are unchanged.
    */
  private def withChangelogOps(query: String, planned: DataFrame): DataFrame = {
    import graft.streaming.Changelog
    if (planned.columns.contains(Changelog.OpCol) || !isPerRowPlan(planned))
      return planned
    val opSources = referencedRelations(query).flatMap(sources.get)
      .filter(_.columns.contains(Changelog.OpCol))
    if (opSources.isEmpty) return planned
    // `_seq` is optional on a source (a transport without a native order
    // emits none; the MV merge assigns a per-batch ordinal) — prefix
    // only the changelog columns the source actually carries
    val extras = Changelog.OpCol +:
      Some(Changelog.SeqCol).filter(c => opSources.exists(_.columns.contains(c))).toSeq
    try {
      val out = spark.sql(Engine.TemporalJoinClause.replaceAllIn(
        prefixSelect(query, extras), ""))
      if (out.columns.distinct.length != out.columns.length) planned else out
    } catch { case scala.util.control.NonFatal(_) => planned }
  }

  /** A chain-subscribable upstream and its PK: a plain streaming-
    * maintained MV, or a user TABLE — tables are PK-merged MVs whose
    * DML merges publish real changelog epochs (Dml.mergeEpoch), so a
    * downstream MV snapshots + tails them exactly like an MV. This is
    * the reference's core create-MV-over-table behavior: tables and MVs
    * share the materialize/changelog machinery, and an MV over a table
    * advances with every INSERT/UPDATE/DELETE (reference:
    * src/stream/src/executor/dml.rs + mview/materialize.rs:45).
    */
  private def chainableSourcePk(name: String): Option[Seq[String]] =
    catalog.load[DurableCatalog.MvEntry]("mvs", name)
      .filter(e => e.streaming && !e.over.contains(true)).map(_.pk)
      .orElse(catalog.load[DurableCatalog.TableEntry]("tables", name)
        .map(_.pk).filter(_.nonEmpty))

  private def chainableUpstream(query: String, planned: DataFrame)
      : Option[String] =
    referencedRelations(query) match {
      case Seq(up) if isPerRowPlan(planned) =>
        Some(up).filter(n => chainableSourcePk(n).isDefined)
      case _ => None
    }

  /** Aggregate MV-on-MV eligibility (reference: docs/dev/src/design/
    * mv-on-mv.md — the reference chains aggregates the same way it
    * chains projections; here the per-epoch maintenance is the
    * [[graft.streaming.IncrementalAgg]] touched-group recompute): the
    * query must reference exactly ONE streaming-maintained plain MV,
    * plan as a single Aggregate whose grouping keys are plain upstream
    * columns (so the delta rows locate their touched groups by name),
    * the rest per-row, and the declared PK must be exactly the group
    * keys (the aggregate row's identity — a narrower PK would merge
    * distinct groups into one stored row).
    */
  private def chainableAggUpstream(query: String, planned: DataFrame,
      pk: Seq[String]): Option[(String, Seq[String])] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val nodes = planned.queryExecution.analyzed.collect { case n => n }
    val aggs = nodes.collect { case a: Aggregate => a }
    val dists = nodes.collect { case d: Distinct => d }
    val restPerRow = nodes.forall {
      case _: Aggregate | _: Distinct => true
      case _: Project | _: Filter | _: SubqueryAlias | _: View => true
      case _: Generate => true // agg over explode: StreamProjectSet feed
      case _: Expand => true // hop-window assignment: row-linear
      case _: EventTimeWatermark => true
      case _: LeafNode => true
      case _ => false
    }
    if (aggs.length + dists.length != 1 || !restPerRow) return None
    // SELECT DISTINCT ≡ GROUP BY every output column
    val groupNames =
      if (dists.nonEmpty) planned.columns.toSeq
      else aggs.head.groupingExpressions.map {
        case a: AttributeReference => a.name
        case _ => return None
      }
    val recomputeCols: Seq[String] =
      if (groupNames.nonEmpty && groupNames.toSet == pk.toSet &&
          groupNames.forall(planned.columns.contains))
        groupNames // plain grouped aggregate: touched groups = group keys
      else if (groupNames.contains("session_window") &&
          !planned.columns.contains("session_window")) {
        // SESSION windows (reference: the SESSION frame,
        // src/frontend/src/expr/window_function.rs session semantics):
        // grouping = plain attrs + the SessionWindowing rule's generated
        // `session_window` attribute. Gap-merge is NOT per-group
        // incremental — a delta row can merge/split its key's whole
        // session chain — so the recompute partitions on the PLAIN attr
        // group cols only: every touched key's sessions recompute whole
        // (IncrementalAgg retracts all old session rows of the touched
        // keys and re-emits). PK must cover the attrs plus the
        // window-derived output cols that identify a session row.
        val attrCols = groupNames.filterNot(_ == "session_window")
        // pk must STRICTLY contain attrCols: a PK of just the plain
        // attrs (e.g. PRIMARY KEY (bidder) for GROUP BY bidder,
        // session_window(...)) would collapse a key's distinct session
        // rows into one stored row on merge — at least one extra
        // window-derived output column is required to identify the
        // session (advice r9)
        if (attrCols.isEmpty || !attrCols.forall(pk.contains) ||
            pk.toSet == attrCols.toSet ||
            !pk.forall(planned.columns.contains)) return None
        attrCols
      } else if (groupNames.isEmpty) {
        // GLOBAL aggregate: the single-group materialized-input path
        // (reference: simple_agg.rs:43 — min/max/percentile keep their
        // input rows as state and re-derive per barrier). One output
        // row; any declared PK over the output columns identifies it.
        if (!pk.forall(planned.columns.contains)) return None
        Seq.empty
      } else return None
    referencedRelations(query) match {
      case Seq(up) =>
        Some(up).filter(n => chainableSourcePk(n).isDefined)
          .map(n => (n, recomputeCols))
      case _ => None
    }
  }

  /** Join MV-on-MV eligibility (reference: docs/dev/src/design/
    * delta-join.md): the query references exactly TWO distinct
    * streaming-maintained plain MVs, plans as a single join whose
    * condition has an EQUI PREFIX (≥1 attribute-equality conjunct;
    * remaining conjuncts may be any deterministic theta — band ranges,
    * inequalities, expressions), the rest per-row, and the declared PK
    * is exactly leftPK ∪ rightPK appearing unaliased in the output —
    * the joined row's identity, addressable from either side for
    * retraction.
    *
    * Theta conjuncts ride for free on two facts: (a) the delta algebra
    * Δ(A⋈θB) = ΔA⋈θB ∪ A⋈θΔB holds for ANY join predicate (the
    * IncrementalJoin recompute re-runs the ORIGINAL query text over
    * slices), and (b) Catalyst's ExtractEquiJoinKeys hashes on the equi
    * conjuncts and applies the rest as post-filters — the same trick the
    * reference uses (src/stream/src/executor/hash_join.rs keeps non-equi
    * conditions as `cond` evaluated after the arrangement probe). The
    * equi prefix is required so each epoch's delta probe is a KEYED join
    * against the other side's storage, not a per-epoch nested loop; a
    * pure-theta join stays on batch refresh with an explicit notice.
    */
  private def chainableJoinUpstream(query: String, planned: DataFrame,
      pk: Seq[String]): Option[(String, String, String)] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftOuter, RightOuter}
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression}
    val nodes = planned.queryExecution.analyzed.collect { case n => n }
    val joins = nodes.collect { case j: Join => j }
    val restPerRow = nodes.forall {
      case _: Join => true
      case _: Project | _: Filter | _: SubqueryAlias | _: View => true
      case _: EventTimeWatermark => true
      case _: LeafNode => true
      case _ => false
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    if (joins.length != 1 || !restPerRow) return None
    val j = joins.head
    val joinKind = j.joinType match {
      case Inner => "inner"
      case LeftOuter => "left"
      case RightOuter => "right"
      case FullOuter => "full"
      case _ => return None
    }
    val cs = j.condition.map(conjuncts).getOrElse(Nil)
    // an equi conjunct is any deterministic equality whose two sides
    // each read exactly one input — precisely what Catalyst's
    // ExtractEquiJoinKeys hashes on, so expression keys (the Nexmark
    // q13 `mod(auction, N) = key` lookup) shuffle-hash like plain
    // attribute keys (the reference's delta join dispatches on
    // expression keys the same way, delta_join rule)
    val (lOut, rOut) = (j.left.outputSet, j.right.outputSet)
    def oneSided(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(lOut) && b.references.subsetOf(rOut)) ||
        (a.references.subsetOf(rOut) && b.references.subsetOf(lOut))
    val (equi, theta) = cs.partition {
      case EqualTo(a, b) => a.deterministic && b.deterministic &&
        a.references.nonEmpty && b.references.nonEmpty && oneSided(a, b)
      case _ => false
    }
    if (equi.isEmpty || !theta.forall(_.deterministic)) return None
    referencedRelations(query) match {
      case Seq(l, r) if l != r =>
        (chainableSourcePk(l), chainableSourcePk(r)) match {
          case (Some(lpk), Some(rpk)) =>
            val ok = lpk.nonEmpty && rpk.nonEmpty &&
              lpk.intersect(rpk).isEmpty &&
              pk.toSet == (lpk ++ rpk).toSet &&
              (lpk ++ rpk).forall(planned.columns.contains)
            if (ok) Some((l, r, joinKind)) else None
          case _ => None
        }
      case _ => None
    }
  }

  /** Dynamic-filter MV-on-MV eligibility (reference:
    * src/stream/src/executor/dynamic_filter.rs + the planner rule that
    * pairs a comparison-against-scalar-subquery with a DynamicFilter
    * node, logical_optimization.rs): the query is a plain-column
    * projection of ONE chain-subscribable relation whose WHERE is
    * EXACTLY one comparison between a column and a scalar aggregate
    * subquery over ONE OTHER chain-subscribable relation — the Nexmark
    * q102 class. Maintained by [[graft.streaming.DynamicFilter]]: left
    * rows are state (an internal `<name>__base` store of the projected
    * rows), the scalar re-evaluates when the right side publishes an
    * epoch, and a threshold move re-scans only the swept band
    * (parquet-stats-pruned). Declared PK must be the left relation's PK
    * passed through unaliased.
    *
    * Returns (lhs, rhs, valueCol-in-OUTPUT-names, op, colMap out→src).
    */
  private def chainableDynFilterUpstream(query: String, planned: DataFrame,
      pk: Seq[String])
      : Option[(String, String, String, String, Seq[(String, String)])] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical._
    val analyzed = planned.queryExecution.analyzed
    val nodes = analyzed.collect { case n => n }
    val filters = nodes.collect { case f: Filter => f }
    val restPerRow = nodes.forall {
      case _: Project | _: Filter | _: SubqueryAlias | _: View => true
      case _: LeafNode => true
      case _ => false
    }
    if (filters.length != 1 || !restPerRow) return None
    def stripCast(e: Expression): Expression = e match {
      case c: Cast => stripCast(c.child)
      case x => x
    }
    // CORRELATED subqueries (outer refs into the left relation) cannot
    // chain: the dynamic-filter maintenance evaluates the subplan
    // standalone, where an outer reference is unresolvable — they must
    // keep the batch-refresh fence (advice r8)
    def asDyn(l: Expression, r: Expression, op: String, flip: String)
        : Option[(AttributeReference, String)] =
      (stripCast(l), stripCast(r)) match {
        case (a: AttributeReference, s: ScalarSubquery)
            if s.outerAttrs.isEmpty => Some((a, op))
        case (s: ScalarSubquery, a: AttributeReference)
            if s.outerAttrs.isEmpty => Some((a, flip))
        case _ => None
      }
    val cmp = filters.head.condition match {
      case GreaterThan(l, r) => asDyn(l, r, ">", "<")
      case GreaterThanOrEqual(l, r) => asDyn(l, r, ">=", "<=")
      case LessThan(l, r) => asDyn(l, r, "<", ">")
      case LessThanOrEqual(l, r) => asDyn(l, r, "<=", ">=")
      case _ => None
    }
    val (attr, op) = cmp.getOrElse(return None)
    // outer vs subquery relations, from a fresh parse (the analyzed
    // plan's leaves no longer carry the user-facing names)
    val parsed = scala.util.Try(
      spark.sessionState.sqlParser.parsePlan(query)).getOrElse(return None)
    val outerRels = scala.collection.mutable.ArrayBuffer[String]()
    val subRels = scala.collection.mutable.ArrayBuffer[String]()
    parsed.foreach { n =>
      n match {
        case r: UnresolvedRelation =>
          outerRels += r.multipartIdentifier.last.toLowerCase
        case _ =>
      }
      n.expressions.foreach(_.foreach {
        case s: SubqueryExpression => s.plan.foreach {
          case r: UnresolvedRelation =>
            subRels += r.multipartIdentifier.last.toLowerCase
          case _ =>
        }
        case _ =>
      })
    }
    (outerRels.distinct.toSeq, subRels.distinct.toSeq) match {
      case (Seq(lhs), Seq(rhs)) if lhs != rhs &&
          chainableSourcePk(rhs).isDefined =>
        val lhsPk = chainableSourcePk(lhs).getOrElse(return None)
        // plain-column projection only: the state/result rows ARE the
        // projected rows, so every output maps to one source column
        val colMap: Seq[(String, String)] = analyzed match {
          case Project(list, _) => list.map {
            case a: AttributeReference => (a.name, a.name)
            case Alias(a: AttributeReference, n) => (n, a.name)
            case _ => return None
          }
          case _ => planned.columns.toSeq.map(c => (c, c))
        }
        val valueOut = colMap.collectFirst {
          case (out, src) if src.equalsIgnoreCase(attr.name) => out
        }.getOrElse(return None)
        val pkOk = pk.toSet == lhsPk.toSet &&
          lhsPk.forall(p => colMap.exists { case (o, s) => o == p && s == p })
        if (pkOk) Some((lhs, rhs, valueOut, op, colMap)) else None
      case _ => None
    }
  }

  /** Dynamic-SET filter eligibility — the IN / NOT IN sibling of
    * [[chainableDynFilterUpstream]] (Nexmark q103/q104: `WHERE id
    * [NOT] IN (SELECT auction FROM bid GROUP BY auction HAVING …)`).
    * Same outer envelope (plain-column projection of one
    * chain-subscribable relation, single-Filter, one other
    * chain-subscribable relation inside the subquery); the filter is a
    * single [NOT] IN over a one-column subquery. The reference plans
    * this as a streaming semi/anti join against the subquery's
    * arrangement; here the subquery's key set is maintained as state
    * and its per-epoch diff drives row membership (see
    * [[createChainedDynSetMv]]).
    *
    * Returns (lhs, rhs, attr-in-OUTPUT-names, negated, colMap out→src).
    */
  private def chainableDynSetUpstream(query: String, planned: DataFrame,
      pk: Seq[String])
      : Option[(String, String, String, Boolean, Seq[(String, String)])] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical._
    val analyzed = planned.queryExecution.analyzed
    val nodes = analyzed.collect { case n => n }
    val filters = nodes.collect { case f: Filter => f }
    val restPerRow = nodes.forall {
      case _: Project | _: Filter | _: SubqueryAlias | _: View => true
      case _: LeafNode => true
      case _ => false
    }
    if (filters.length != 1 || !restPerRow) return None
    def stripCast(e: Expression): Expression = e match {
      case c: Cast => stripCast(c.child)
      case x => x
    }
    // correlated IN-subqueries (ListQuery with outer refs) keep the
    // batch-refresh fence — see the ScalarSubquery guard in
    // [[chainableDynFilterUpstream]] (advice r8)
    val (attr0, negated) = filters.head.condition match {
      case Not(InSubquery(Seq(v), l)) if l.outerAttrs.isEmpty =>
        (stripCast(v), true)
      case InSubquery(Seq(v), l) if l.outerAttrs.isEmpty =>
        (stripCast(v), false)
      case _ => return None
    }
    val attr = attr0 match {
      case a: AttributeReference => a
      case _ => return None
    }
    val parsed = scala.util.Try(
      spark.sessionState.sqlParser.parsePlan(query)).getOrElse(return None)
    val outerRels = scala.collection.mutable.ArrayBuffer[String]()
    val subRels = scala.collection.mutable.ArrayBuffer[String]()
    parsed.foreach { n =>
      n match {
        case r: UnresolvedRelation =>
          outerRels += r.multipartIdentifier.last.toLowerCase
        case _ =>
      }
      n.expressions.foreach(_.foreach {
        case s: SubqueryExpression => s.plan.foreach {
          case r: UnresolvedRelation =>
            subRels += r.multipartIdentifier.last.toLowerCase
          case _ =>
        }
        case _ =>
      })
    }
    (outerRels.distinct.toSeq, subRels.distinct.toSeq) match {
      case (Seq(lhs), Seq(rhs)) if lhs != rhs &&
          chainableSourcePk(rhs).isDefined =>
        val lhsPk = chainableSourcePk(lhs).getOrElse(return None)
        val colMap: Seq[(String, String)] = analyzed match {
          case Project(list, _) => list.map {
            case a: AttributeReference => (a.name, a.name)
            case Alias(a: AttributeReference, n) => (n, a.name)
            case _ => return None
          }
          case _ => planned.columns.toSeq.map(c => (c, c))
        }
        val attrOut = colMap.collectFirst {
          case (out, src) if src.equalsIgnoreCase(attr.name) => out
        }.getOrElse(return None)
        val pkOk = pk.toSet == lhsPk.toSet &&
          lhsPk.forall(p => colMap.exists { case (o, s) => o == p && s == p })
        if (pkOk) Some((lhs, rhs, attrOut, negated, colMap)) else None
      case _ => None
    }
  }

  /** The chained MV's transform over (a) the upstream snapshot at
    * subscribe time and (b) the upstream changelog stream: the defining
    * query re-targeted at the input DataFrame, with the changelog
    * op/seq columns carried through when present so deletes propagate.
    */
  /** Retarget relation REFERENCES — and only those — on the PARSED
    * statement: each `UnresolvedRelation` whose name is in `mapping`
    * re-binds to its replacement, aliased back to the original name so
    * qualified column references keep resolving. A column, alias, or
    * string literal spelled like an upstream is untouched — the old
    * `\b<name>\b` text replace captured those (the r5 audit's token-
    * capture envelope). Subquery expressions are covered.
    */
  private def retargetRelations(query: String,
      mapping: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
    val norm = mapping.map { case (k, v) => (k.toLowerCase, v) }
    val plan = spark.sessionState.sqlParser.parsePlan(query)
      .transformUpWithSubqueries {
        case r: UnresolvedRelation
            if norm.contains(r.multipartIdentifier.last.toLowerCase) =>
          SubqueryAlias(r.multipartIdentifier.last,
            UnresolvedRelation(Seq(norm(r.multipartIdentifier.last.toLowerCase))))
      }
    org.apache.spark.sql.GraftPlans.ofRows(spark, plan)
  }

  private def chainTransform(name: String, query: String, upName: String)
      (df: DataFrame): DataFrame = {
    val extras = Seq(graft.streaming.Changelog.OpCol,
      graft.streaming.Changelog.SeqCol).filter(df.columns.contains)
    val view = s"__chain_src_$name"
    df.createOrReplaceTempView(view)
    def retarget(q: String) = retargetRelations(q, Map(upName -> view))
    if (extras.isEmpty) retarget(query)
    else {
      val out = retarget(prefixSelect(query, extras))
      // `SELECT *` already passed the op/seq columns through — the
      // explicit prefix then duplicates them; fall back to the plain form
      if (out.columns.distinct.length != out.columns.length) retarget(query)
      else out
    }
  }

  /** FLUSH ordering for chained MVs: depth 0 = fed by sources/DML,
    * depth n+1 = tails a depth-n MV's changelog.
    */
  private val chainDepth = scala.collection.concurrent.TrieMap[String, Int]()

  /** Chain edges: downstream MV → the upstream store(s) whose changelog
    * it tails. Background compaction drains an upstream's transitive
    * downstream set before expiring history (see
    * [[maybeBackgroundCompact]]); populated at every chain-creation /
    * chain-recovery site alongside [[chainDepth]].
    */
  private val chainUpstreams =
    scala.collection.concurrent.TrieMap[String, Set[String]]()

  /** All MVs that (transitively) tail `upName`'s changelog, shallowest
    * first — the drain order that settles a whole chain in one pass.
    */
  private def downstreamOf(upName: String): Seq[String] = {
    val out = scala.collection.mutable.Set[String]()
    var frontier = Set(upName)
    while (frontier.nonEmpty) {
      val next = chainUpstreams.collect {
        case (d, ups) if ups.exists(frontier) && !out(d) => d
      }.toSet
      out ++= next
      frontier = next
    }
    out.toSeq.sortBy(chainDepth.getOrElse(_, 0))
  }

  // --- temporal filter (reference: `WHERE ts > now() - interval`,
  // src/stream/src/executor/now.rs + dynamic_filter.rs; plan rule
  // logical_optimization.rs:275-285 "Push down filter with now"). A
  // per-row chained MV whose defining filter compares a column against
  // a now()-anchored horizon is registered here: inserts are filtered
  // at merge time by the defining query itself (each epoch's replay
  // evaluates now() fresh), READS apply the residual horizon filter so
  // results are exact at any instant, and the barrier-drain (FLUSH)
  // EVICTS aged-out rows as real delete epochs — downstream chained
  // MVs retract exactly as the reference's DynamicFilter emits
  // retractions when the Now bound advances. name → (tsCol, horizonMs).
  // name -> (tsCol, horizonMs, inclusive): inclusive=true when the
  // defining comparison was >= (the boundary row at exactly the horizon
  // stays visible and must not be evicted)
  private val temporalFilters =
    scala.collection.mutable.Map[String, (String, Long, Boolean)]()

  /** Test hook: the temporal "now" in millis (reads and eviction).
    * None = wall clock. */
  @volatile var temporalNowOverrideMs: Option[Long] = None

  private val TemporalFilterPat =
    ("""(?i)\b([A-Za-z_]\w*)\s*(>=?)\s*(?:now\s*\(\s*\)|current_timestamp""" +
      """(?:\s*\(\s*\))?)\s*-\s*interval\s+'([^']+)'\s*([A-Za-z]*)""").r

  /** Detect `col > now() - interval '…' [unit]` in a defining query.
    * Both Spark spellings bind: `interval '1' hour` and `interval '1 hour'`.
    */
  private[graft] def detectTemporalFilter(
      query: String): Option[(String, Long, Boolean)] =
    TemporalFilterPat.findFirstMatchIn(query).flatMap { m =>
      val inclusive = m.group(2) == ">="
      val quoted = m.group(3).trim
      val unitOut = Option(m.group(4)).map(_.trim.toLowerCase).filter(_.nonEmpty)
      val parts = unitOut match {
        case Some(u) => Some((quoted, u))
        case None => quoted.split("\\s+") match {
          case Array(n, u) => Some((n, u.toLowerCase))
          case _ => None
        }
      }
      parts.flatMap { case (nStr, unit) =>
        val unitMs = unit.stripSuffix("s") match {
          case "millisecond" => Some(1L)
          case "second" => Some(1000L)
          case "minute" => Some(60000L)
          case "hour" => Some(3600000L)
          case "day" => Some(86400000L)
          case "week" => Some(604800000L)
          case _ => None
        }
        val n = scala.util.Try(nStr.trim.toDouble).toOption
        for (u <- unitMs; v <- n) yield (m.group(1), (v * u).toLong, inclusive)
      }
    }

  private def temporalNowMs: Long =
    temporalNowOverrideMs.getOrElse(System.currentTimeMillis())

  /** Register a per-row chained MV's temporal horizon (no-op when the
    * query has none, or when the MV's output drops the time column —
    * then there is nothing addressable to evict and the defining
    * query's own merge-time filter is the entire semantics). */
  private def registerTemporalFilter(name: String, query: String,
      outputCols: Seq[String]): Unit =
    detectTemporalFilter(query)
      .filter { case (c, _, _) => outputCols.contains(c) }
      .foreach(temporalFilters(name) = _)

  /** Age out rows past the horizon as REAL delete epochs (the
    * reference's retraction when the Now bound advances past a row).
    * Runs at barrier drains; reads are exact in between via the
    * residual filter in [[table]]. */
  private def evictTemporal(name: String): Unit =
    for ((c, ms, incl) <- temporalFilters.get(name); mv <- mvs.get(name)) {
      val cutoff = new java.sql.Timestamp(temporalNowMs - ms)
      val base = mv.read()
      if (base.columns.contains(c)) {
        // evict the exact complement of the read filter: >= keeps the
        // boundary row, so eviction is strict <; > evicts <=
        val cc = org.apache.spark.sql.functions.col(c)
        val cv = org.apache.spark.sql.functions.lit(cutoff)
        val cond = if (incl) cc < cv else cc <= cv
        if (!base.where(cond).isEmpty)
          graft.operators.Dml.deleteWhere(mv, cond)
      }
    }

  private def createChainedMv(name: String, pk: Seq[String], query: String,
      upName: String): DataFrame = {
    val up = mvs.get(upName).getOrElse(throw new IllegalArgumentException(
      s"chained upstream MV $upName is not registered"))
    // the subscription needs the upstream's changelog schema — drain the
    // upstream job once so at least one epoch has published (the
    // reference's create-MV barrier plays the same role)
    jobs.get(upName).foreach(_.processAllAvailable())
    val down = mvs.define(name, pk)
    val frontier = up.latestChangelogBatchId
    catalog.save("mvs", name, DurableCatalog.MvEntry(
      pk, Some(query), streaming = true, "update", down.nBuckets,
      chainedFrom = Some(upName), chainFrontier = Some(frontier)))
    chainDepth(name) = chainDepth.getOrElse(upName, 0) + 1
    chainUpstreams(name) = Set(upName)
    jobs(name) = up.subscribeWithBackfill(down, mvs.checkpointDir(name),
      chainTransform(name, query, upName))
    val outCols = scala.util.Try(spark.sql(Engine.rewritePgSelect(
      Engine.TemporalJoinClause.replaceAllIn(query, ""))).columns.toSeq)
      .getOrElse(down.read().columns.toSeq)
    registerTemporalFilter(name, query, outCols)
    statusDf("CREATE MATERIALIZED VIEW (streaming chain)", name)
  }

  /** OVER-window MV-on-MV eligibility: the query has Window nodes, the
    * rest is per-row (partition-local results — the IncrementalOver
    * recompute re-runs the query over touched-partition slices), and
    * the single FROM relation is a streaming plain MV.
    */
  private def chainableOverUpstream(query: String, planned: DataFrame)
      : Option[String] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val nodes = planned.queryExecution.analyzed.collect { case n => n }
    val hasWindow = nodes.exists { case _: Window => true; case _ => false }
    val restPerRow = nodes.forall {
      case _: Window => true
      case _: Project | _: Filter | _: SubqueryAlias | _: View => true
      case _: EventTimeWatermark => true
      case _: LeafNode => true
      case _ => false
    }
    // a multi-window query (fused group-top-1 + framed aggregate, the
    // Nexmark q6 statement) is maintainable only when the specs share a
    // common attribute partition key — see commonOverPartitionCols
    if (!hasWindow || !restPerRow ||
        Engine.commonOverPartitionCols(planned.queryExecution.analyzed).isEmpty)
      None
    else referencedRelations(query) match {
      case Seq(up) =>
        Some(up).filter(n => chainableSourcePk(n).isDefined)
      case _ => None
    }
  }

  /** Chain an OVER-window MV off an upstream streaming MV: same
    * [[graft.streaming.IncrementalOver]] maintenance as the source-fed
    * path (own base copy — the operator's private state, per the
    * reference's over_window state table), fed by the upstream
    * changelog with a snapshot backfill.
    */
  private def createChainedOverMv(name: String, pk: Seq[String],
      query: String, upName: String, resume: Boolean = false,
      resumeFrontier: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical
    val up = mvs.get(upName).getOrElse(throw new IllegalArgumentException(
      s"chained upstream MV $upName is not registered"))
    jobs.get(upName).foreach(_.processAllAvailable())
    val tmp = s"__${name}_over_base"
    val windowFn: DataFrame => DataFrame = df => {
      df.createOrReplaceTempView(tmp)
      retargetRelations(query, Map(upName -> tmp))
    }
    val upSchema = up.read().schema
    require(upSchema.nonEmpty,
      s"CREATE MATERIALIZED VIEW $name: upstream MV $upName has no schema " +
        "yet (never written) — FLUSH it first")
    val emptyBase = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], upSchema)
    val partCols = Engine.commonOverPartitionCols(
      windowFn(emptyBase).queryExecution.analyzed).getOrElse(
      throw new IllegalArgumentException(
        s"CREATE MATERIALIZED VIEW $name: streaming OVER requires a common " +
          "attribute PARTITION BY across every window (an unpartitioned or " +
          "expression-partitioned window cannot be maintained incrementally)"))
    // The base copy holds UPSTREAM rows, so it must be keyed by the
    // upstream's row identity — keying it by the downstream MV's pk
    // (which a group top-1 narrows to the partition key) collapses the
    // partition to one arbitrary row per key and the window recompute
    // ranks a single survivor (found by NexmarkChainSpec m_q9/m_q18).
    val upPk = chainableSourcePk(upName).getOrElse(up.primaryKey)
    val baseMv = mvs.define(s"${name}__base", upPk, bucketKeys = partCols)
    val resultMv = mvs.define(name, pk, bucketKeys = partCols)
    val iow = new graft.streaming.IncrementalOver(
      baseMv, resultMv, partCols, windowFn, pk)
    val frontier =
      if (resume) resumeFrontier.getOrElse(-1L)
      else up.withReadLock {
        val f = up.latestChangelogBatchId
        val snap = up.read()
        if (snap.columns.nonEmpty && !snap.isEmpty) iow.applyDelta(snap)
        f
      }
    chainDepth(name) = chainDepth.getOrElse(upName, 0) + 1
    chainUpstreams(name) = Set(upName)
    if (!resume)
      catalog.save("mvs", name, DurableCatalog.MvEntry(
        pk, Some(query), streaming = true, "update", resultMv.nBuckets, over = Some(true),
        chainedFrom = Some(upName), chainFrontier = Some(frontier)))
    jobs(name) = up.changelogStreamFrom(frontier).writeStream
      .option("checkpointLocation", mvs.checkpointDir(name))
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .foreachBatch((batch: DataFrame, _: Long) => iow.applyDelta(batch))
      .start()
    statusDf("CREATE MATERIALIZED VIEW (streaming over-window chain)", name)
  }

  /** The aggregate chain's recompute function: the defining query
    * re-targeted at a view over whatever slice of the upstream the
    * maintenance hands it (full snapshot at backfill, touched-group
    * survivors per epoch).
    */
  private def chainAggFn(name: String, query: String, upName: String)
      (df: DataFrame): DataFrame = {
    val view = s"__chainagg_src_$name"
    df.createOrReplaceTempView(view)
    retargetRelations(query, Map(upName -> view))
  }

  /** The keys-replay variant of [[chainAggFn]] for generate mode: same
    * query over the delta slice, but with every Filter ABOVE the
    * aggregate (HAVING) stripped from the analyzed plan. A group whose
    * delta-local aggregate fails the HAVING still needs recompute — its
    * full-base aggregate may cross the threshold in either direction
    * (enter ⇒ insert, leave ⇒ the stored row must be retracted) — so
    * the touched-key derivation must see ALL groups the delta touches,
    * not just the ones whose delta slice happens to pass.
    */
  private def chainAggKeysFn(name: String, query: String, upName: String)
      (df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val full = chainAggFn(name, query, upName)(df)
    def aboveAgg(p: LogicalPlan): Boolean = p.exists {
      case _: Aggregate | _: Distinct => true
      case _ => false
    }
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case f: Filter if aboveAgg(f.child) => strip(f.child)
      case other => other.withNewChildren(other.children.map(strip))
    }
    org.apache.spark.sql.GraftPlans.ofRows(
      spark, strip(full.queryExecution.analyzed))
  }

  /** Multiset-exactness of `name`'s published changelog epochs: true
    * when every image in an epoch is a true before/after row — DML
    * epochs (exact U-/U+ pairs), a plain MV republishing its source's
    * transition log, per-row chains republishing an exact feed 1:1, and
    * agg chains (one true old/new pair per touched group, regardless of
    * their own upstream). Join / union / dynamic-filter / TopN / OVER
    * chains publish PK-RESOLUTION deltas — an epoch may carry several
    * images per PK, with phantom or arbitrarily-chosen retract images
    * that only a PK-keyed merge resolves correctly — so feeds passing
    * through them are NOT exact. Gates the ValueStateAgg ±fold (which
    * consumes deltas as multisets); the touched-group recompute only
    * needs the touched KEYS and stays correct on any feed.
    */
  private def exactChangelogFeed(name: String): Boolean =
    catalog.load[DurableCatalog.TableEntry]("tables", name) match {
      case Some(_) => true
      case None => catalog.load[DurableCatalog.MvEntry]("mvs", name) match {
        case Some(e) if e.streaming && !e.over.contains(true) &&
            e.chainedFromRight.isEmpty && e.chainJoinType.isEmpty =>
          if (e.chainAggGroups.isDefined) true
          else e.chainedFrom match {
            case Some(up) => exactChangelogFeed(up)
            case None => true // plain MV over a source: the log itself
          }
        case _ => false
      }
    }

  /** Tail `up`'s changelog and maintain the chained aggregate MV via
    * touched-group recompute ([[graft.streaming.IncrementalAgg]] with a
    * borrowed base: the upstream maintains its own storage). Each epoch
    * re-publishes the aggregate delta on `down`'s changelog, so chains
    * stack to any depth.
    */
  private def startChainedAggJob(name: String, down: MaterializedView,
      up: MaterializedView, query: String, upName: String,
      groupCols: Seq[String], frontier: Long)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val inc = new graft.streaming.IncrementalAgg(
      up, down, groupCols, chainAggFn(name, query, upName), ownsBase = false,
      // group keys born inside the query (agg over explode): derive a
      // delta's touched groups by replaying the query on the delta
      // slice — HAVING stripped so threshold-crossing groups are seen
      keysOf = Some(chainAggKeysFn(name, query, upName)),
      exactFeed = exactChangelogFeed(upName))
    up.changelogStreamFrom(frontier).writeStream
      .option("checkpointLocation", mvs.checkpointDir(name))
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .foreachBatch((batch: DataFrame, id: Long) => inc.applyDelta(batch, id))
      .start()
  }

  private def createChainedAggMv(name: String, pk: Seq[String],
      query: String, upName: String, groupCols: Seq[String]): DataFrame = {
    val up = mvs.get(upName).getOrElse(throw new IllegalArgumentException(
      s"chained upstream MV $upName is not registered"))
    jobs.get(upName).foreach(_.processAllAvailable())
    val down = mvs.define(name, pk)
    // frontier + backfill snapshot under the upstream's read lock: the
    // pair must be consistent (epochs after the frontier re-apply through
    // the tail; the touched-group recompute is idempotent over them)
    val frontier = up.withReadLock {
      val f = up.latestChangelogBatchId
      val snapshot = up.read()
      if (snapshot.columns.nonEmpty)
        down.merge(chainAggFn(name, query, upName)(snapshot))
      f
    }
    catalog.save("mvs", name, DurableCatalog.MvEntry(
      pk, Some(query), streaming = true, "update", down.nBuckets,
      chainedFrom = Some(upName), chainFrontier = Some(frontier),
      chainAggGroups = Some(groupCols)))
    chainDepth(name) = chainDepth.getOrElse(upName, 0) + 1
    chainUpstreams(name) = Set(upName)
    jobs(name) = startChainedAggJob(name, down, up, query, upName,
      groupCols, frontier)
    statusDf("CREATE MATERIALIZED VIEW (streaming agg chain)", name)
  }

  /** The join chain's recompute: the defining query re-targeted at views
    * over the two input slices (a delta on one side, the other side's
    * storage — or both snapshots at backfill).
    */
  private val chainViewSeq = new java.util.concurrent.atomic.AtomicLong

  private def chainJoinFn(name: String, query: String, leftName: String,
      rightName: String)(leftDf: DataFrame, rightDf: DataFrame): DataFrame = {
    // UNIQUE view names per invocation: the two maintenance tails run
    // concurrently in one session — shared names would let one tail
    // plan against the other's slices. spark.sql analyzes eagerly (the
    // views inline into the plan), so they drop right after.
    val n = chainViewSeq.incrementAndGet()
    val lv = s"__chainjoin_l_${name}_$n"
    val rv = s"__chainjoin_r_${name}_$n"
    leftDf.createOrReplaceTempView(lv)
    rightDf.createOrReplaceTempView(rv)
    try retargetRelations(query, Map(leftName -> lv, rightName -> rv))
    finally {
      spark.catalog.dropTempView(lv)
      spark.catalog.dropTempView(rv)
    }
  }

  /** The single maintenance job of a chained join MV: both upstream
    * changelog tails side-tagged and unioned into ONE stream — one
    * epoch sequence (stackable downstream), one writer (no stage-dir
    * races), the reference's barrier-aligned two-input executor.
    */
  private def startChainedJoinJob(name: String,
      inc: graft.streaming.IncrementalJoin, left: MaterializedView,
      right: MaterializedView, fL: Long, fR: Long)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.IncrementalJoin.taggedUnion(
        left.changelogStreamFrom(fL), right.changelogStreamFrom(fR))
      .writeStream
      .option("checkpointLocation", mvs.checkpointDir(name))
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .foreachBatch((batch: DataFrame, id: Long) => inc.applyDelta(batch, id))
      .start()

  private def createChainedJoinMv(name: String, pk: Seq[String],
      query: String, leftName: String, rightName: String,
      joinKind: String): DataFrame = {
    val left = mvs.get(leftName).getOrElse(throw new IllegalArgumentException(
      s"chained upstream MV $leftName is not registered"))
    val right = mvs.get(rightName).getOrElse(throw new IllegalArgumentException(
      s"chained upstream MV $rightName is not registered"))
    jobs.get(leftName).foreach(_.processAllAvailable())
    jobs.get(rightName).foreach(_.processAllAvailable())
    // bucket the joined MV by the LEFT side's PK: left-side retraction
    // lookups prune to touched buckets (the right side pays a full
    // downstream scan — the reference keeps one arrangement per side;
    // one pruned side is the single-layout compromise)
    val down = mvs.define(name, pk, bucketKeys = left.primaryKey)
    val fn = chainJoinFn(name, query, leftName, rightName) _
    // both frontiers + the backfill snapshot under both read locks: one
    // consistent cut across the diamond (epochs after either frontier
    // re-apply through that side's tail, idempotently)
    val (fL, fR) = left.withReadLock { right.withReadLock {
      val fl = left.latestChangelogBatchId
      val fr = right.latestChangelogBatchId
      // a NEVER-written side reads as a zero-column frame the query
      // can't resolve against — skip the backfill (the tail fills in);
      // an EMPTIED side reads schema-correct via the _schema sidecar
      val (lr, rr) = (left.read(), right.read())
      if (lr.columns.nonEmpty && rr.columns.nonEmpty) {
        val snap = fn(lr, rr)
        if (snap.columns.nonEmpty) down.merge(snap)
      }
      (fl, fr)
    } }
    catalog.save("mvs", name, DurableCatalog.MvEntry(
      pk, Some(query), streaming = true, "update", down.nBuckets,
      chainedFrom = Some(leftName), chainFrontier = Some(fL),
      chainedFromRight = Some(rightName), chainFrontierRight = Some(fR),
      chainJoinType = Some(joinKind)))
    chainDepth(name) = math.max(chainDepth.getOrElse(leftName, 0),
      chainDepth.getOrElse(rightName, 0)) + 1
    chainUpstreams(name) = Set(leftName, rightName)
    val inc = new graft.streaming.IncrementalJoin(left, right, down,
      left.primaryKey, right.primaryKey, fn, joinKind)
    jobs(name) = startChainedJoinJob(name, inc, left, right, fL, fR)
    statusDf("CREATE MATERIALIZED VIEW (streaming join chain)", name)
  }

  /** Evaluate the dynamic filter's scalar RHS against `rhsName`'s
    * CURRENT store: the first scalar-subquery plan from a fresh parse
    * of the defining query, with the rhs relation rebound to a PRIVATE
    * temp view (never the shared bindMvTables name — this runs on the
    * maintenance thread, racing engine statements). None ⇔ the scalar
    * evaluates NULL (e.g. max over an empty rhs).
    */
  private def dynScalarEval(name: String, query: String,
      rhsName: String): Option[Double] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
    val parsed = spark.sessionState.sqlParser.parsePlan(query)
    var subPlan: Option[LogicalPlan] = None
    parsed.foreach { n =>
      n.expressions.foreach(_.foreach {
        case s: SubqueryExpression if subPlan.isEmpty => subPlan = Some(s.plan)
        case _ =>
      })
    }
    subPlan.flatMap { p =>
      val priv = s"__dynrhs_$name"
      table(rhsName).createOrReplaceTempView(priv)
      val rebound = p.transformUpWithSubqueries {
        case r: UnresolvedRelation
            if r.multipartIdentifier.last.equalsIgnoreCase(rhsName) =>
          SubqueryAlias(rhsName, UnresolvedRelation(Seq(priv)))
      }
      org.apache.spark.sql.GraftPlans.ofRows(spark, rebound)
        .collect().headOption.flatMap { row =>
          if (row.isNullAt(0)) None
          else Some(row.get(0) match {
            case d: java.math.BigDecimal => d.doubleValue
            case b: BigDecimal => b.doubleValue
            case n: Number => n.doubleValue
            case other => other.toString.toDouble
          })
        }
    }
  }

  /** Evaluate the dynamic-set filter's subquery against `rhsName`'s
    * CURRENT store: one column renamed to `attrOut`, NULLs kept (the
    * NOT-IN null rule needs them). Same private-view discipline as
    * [[dynScalarEval]].
    */
  private def dynSetEval(name: String, query: String, rhsName: String,
      attrOut: String): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
    import org.apache.spark.sql.functions.col
    val parsed = spark.sessionState.sqlParser.parsePlan(query)
    var subPlan: Option[LogicalPlan] = None
    parsed.foreach { n =>
      n.expressions.foreach(_.foreach {
        case s: SubqueryExpression if subPlan.isEmpty => subPlan = Some(s.plan)
        case _ =>
      })
    }
    val p = subPlan.getOrElse(throw new IllegalStateException(
      s"$name: IN-subquery plan no longer derivable"))
    val priv = s"__dynrhs_$name"
    table(rhsName).createOrReplaceTempView(priv)
    val rebound = p.transformUpWithSubqueries {
      case r: UnresolvedRelation
          if r.multipartIdentifier.last.equalsIgnoreCase(rhsName) =>
        SubqueryAlias(rhsName, UnresolvedRelation(Seq(priv)))
    }
    val df = org.apache.spark.sql.GraftPlans.ofRows(spark, rebound)
    df.select(col(df.columns.head).as(attrOut))
  }

  private def startChainedDynSetJob(name: String,
      dyn: graft.streaming.DynamicSetFilter, lhsUp: MaterializedView,
      rhsUp: MaterializedView, fL: Long, fR: Long,
      colMap: Seq[(String, String)], query: String, rhsName: String,
      attrOut: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions.col
    import graft.streaming.{Changelog, IncrementalJoin}
    IncrementalJoin.taggedUnion(
        lhsUp.changelogStreamFrom(fL), rhsUp.changelogStreamFrom(fR))
      .writeStream
      .option("checkpointLocation", mvs.checkpointDir(name))
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .foreachBatch { (batch0: DataFrame, id: Long) =>
        val batch =
          if (batch0.sparkSession eq spark) batch0
          else spark.createDataFrame(batch0.rdd, batch0.schema)
        def side(prefix: String, tag: String): DataFrame = {
          val cols = batch.columns.filter(_.startsWith(prefix))
          batch.where(col(IncrementalJoin.SideCol) === tag)
            .select(cols.map(c => col(c).as(c.stripPrefix(prefix))).toSeq: _*)
        }
        val l = side(IncrementalJoin.LPrefix, "L")
        val r = side(IncrementalJoin.RPrefix, "R")
        val proj = l.select(
          colMap.map { case (out, src) => col(src).as(out) } ++
            Seq(col(Changelog.OpCol), col(Changelog.SeqCol)): _*)
        // key-set eval pinned under the rhs READ lock and materialized
        // there (localCheckpoint) — same bucket-rewrite race as the
        // scalar eval above, but the frame is consumed lazily downstream
        val keys =
          if (r.isEmpty) None
          else Some(rhsUp.withReadLock(
            dynSetEval(name, query, rhsName, attrOut).localCheckpoint()))
        dyn.applyDelta(proj, keys, id)
        keys.foreach(_.queryExecution.logical match {
          // free the pinned key set promptly (one per right-side epoch)
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(false)
          case _ =>
        })
      }
      .start()
  }

  /** CREATE MV for the dynamic-SET filter shape (see
    * [[chainableDynSetUpstream]]); `resume` re-wires after recovery.
    */
  private def createChainedDynSetMv(name: String, pk: Seq[String],
      query: String, resume: Boolean = false,
      resumeFrontiers: Option[(Long, Long)] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    bindMvTables(query)
    val planned = spark.sql(Engine.rewritePgSelect(query))
    val (lhsName, rhsName, attrOut, negated, colMap) =
      chainableDynSetUpstream(query, planned, pk).getOrElse(
        throw new IllegalStateException(
          s"$name: dynamic-set chain shape no longer derivable"))
    val lhsUp = mvs.get(lhsName).getOrElse(throw new IllegalArgumentException(
      s"chained upstream $lhsName is not registered"))
    val rhsUp = mvs.get(rhsName).getOrElse(throw new IllegalArgumentException(
      s"chained upstream $rhsName is not registered"))
    if (!resume) {
      jobs.get(lhsName).foreach(_.processAllAvailable())
      jobs.get(rhsName).foreach(_.processAllAvailable())
    }
    // the base state store is bucketed by the MEMBERSHIP key (not the
    // PK): a set-move repair then reads only the entering/leaving keys'
    // buckets (readTouched) — O(Δkeys) per right-side epoch instead of
    // O(left store). Merge stays PK-correct: the upstream changelog is
    // retraction-complete (UpdateDelete old image / UpdateInsert new),
    // so a key-moving row deletes from its old bucket and lands in the
    // new one.
    val state = mvs.define(s"${name}__base", pk, bucketKeys = Seq(attrOut))
    val keys = mvs.define(s"${name}__keys", Seq(attrOut))
    val down = mvs.define(name, pk, bucketKeys = lhsUp.primaryKey)
    val dyn = new graft.streaming.DynamicSetFilter(
      state, keys, down, attrOut, negated)
    val (fL, fR) = resumeFrontiers.getOrElse {
      lhsUp.withReadLock { rhsUp.withReadLock {
        val fl = lhsUp.latestChangelogBatchId
        val fr = rhsUp.latestChangelogBatchId
        val snap = lhsUp.read()
        if (snap.columns.nonEmpty) {
          val projected = snap.select(
            colMap.map { case (out, src) => col(src).as(out) }: _*)
          dyn.applyDelta(projected,
            Some(dynSetEval(name, query, rhsName, attrOut)))
        }
        (fl, fr)
      } }
    }
    if (!resume)
      catalog.save("mvs", name, DurableCatalog.MvEntry(
        pk, Some(query), streaming = true, "update", down.nBuckets,
        chainedFrom = Some(lhsName), chainFrontier = Some(fL),
        chainedFromRight = Some(rhsName), chainFrontierRight = Some(fR),
        chainJoinType = Some(
          s"dynset:$attrOut:${if (negated) "notin" else "in"}")))
    chainDepth(name) = math.max(chainDepth.getOrElse(lhsName, 0),
      chainDepth.getOrElse(rhsName, 0)) + 1
    chainUpstreams(name) = Set(lhsName, rhsName)
    jobs(name) = startChainedDynSetJob(name, dyn, lhsUp, rhsUp, fL, fR,
      colMap, query, rhsName, attrOut)
    statusDf("CREATE MATERIALIZED VIEW (streaming dynamic-set chain)", name)
  }

  private def startChainedDynFilterJob(name: String,
      dyn: graft.streaming.DynamicFilter, lhsUp: MaterializedView,
      rhsUp: MaterializedView, fL: Long, fR: Long,
      colMap: Seq[(String, String)], query: String, rhsName: String,
      op: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions.col
    import graft.streaming.{Changelog, IncrementalJoin}
    // NULL scalar ⇒ nothing qualifies (a comparison with NULL is never
    // true), rendered as an infinity threshold so a later real value
    // band-rescans exactly the re-qualifying range
    val sentinel =
      if (op == ">" || op == ">=") Double.PositiveInfinity
      else Double.NegativeInfinity
    IncrementalJoin.taggedUnion(
        lhsUp.changelogStreamFrom(fL), rhsUp.changelogStreamFrom(fR))
      .writeStream
      .option("checkpointLocation", mvs.checkpointDir(name))
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .foreachBatch { (batch0: DataFrame, id: Long) =>
        val batch = // re-bind to the engine session (see IncrementalJoin)
          if (batch0.sparkSession eq spark) batch0
          else spark.createDataFrame(batch0.rdd, batch0.schema)
        def side(prefix: String, tag: String): DataFrame = {
          val cols = batch.columns.filter(_.startsWith(prefix))
          batch.where(col(IncrementalJoin.SideCol) === tag)
            .select(cols.map(c => col(c).as(c.stripPrefix(prefix))).toSeq: _*)
        }
        val l = side(IncrementalJoin.LPrefix, "L")
        val r = side(IncrementalJoin.RPrefix, "R")
        val proj = l.select(
          colMap.map { case (out, src) => col(src).as(out) } ++
            Seq(col(Changelog.OpCol), col(Changelog.SeqCol)): _*)
        // the scalar re-reads only when the right side moved this epoch;
        // under the rhs READ lock — the eval runs on the maintenance
        // thread while the rhs's own merges rewrite its buckets, and an
        // unpinned read can hit a just-deleted file mid-footer-merge
        val thr: Option[Double] =
          if (r.isEmpty) None
          else Some(rhsUp.withReadLock(
            dynScalarEval(name, query, rhsName)).getOrElse(sentinel))
        dyn.applyDelta(proj, thr, id)
      }
      .start()
  }

  /** CREATE MV for the dynamic-filter shape (see
    * [[chainableDynFilterUpstream]]); `resume` re-wires after recovery
    * (storage on disk, stream checkpoint dedups replayed epochs).
    */
  private def createChainedDynFilterMv(name: String, pk: Seq[String],
      query: String, resume: Boolean = false,
      resumeFrontiers: Option[(Long, Long)] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    bindMvTables(query)
    val planned = spark.sql(Engine.rewritePgSelect(query))
    val (lhsName, rhsName, valueCol, op, colMap) =
      chainableDynFilterUpstream(query, planned, pk).getOrElse(
        throw new IllegalStateException(
          s"$name: dynamic-filter chain shape no longer derivable"))
    val lhsUp = mvs.get(lhsName).getOrElse(throw new IllegalArgumentException(
      s"chained upstream $lhsName is not registered"))
    val rhsUp = mvs.get(rhsName).getOrElse(throw new IllegalArgumentException(
      s"chained upstream $rhsName is not registered"))
    if (!resume) {
      jobs.get(lhsName).foreach(_.processAllAvailable())
      jobs.get(rhsName).foreach(_.processAllAvailable())
    }
    // state copy of the PROJECTED upstream rows (the reference's
    // dynamic_filter left state table); result bucketed by the lhs PK,
    // matching the recovery-time binding for chainedFromRight entries
    val state = mvs.define(s"${name}__base", pk)
    val down = mvs.define(name, pk, bucketKeys = lhsUp.primaryKey)
    val dyn = new graft.streaming.DynamicFilter(state, down, valueCol, op)
    val (fL, fR) = resumeFrontiers.getOrElse {
      lhsUp.withReadLock { rhsUp.withReadLock {
        val fl = lhsUp.latestChangelogBatchId
        val fr = rhsUp.latestChangelogBatchId
        val snap = lhsUp.read()
        if (snap.columns.nonEmpty) {
          val projected = snap.select(
            colMap.map { case (out, src) => col(src).as(out) }: _*)
          // backfill = the first applyDelta: seeds the state copy and
          // inserts the qualifying prefix under the current scalar
          dyn.applyDelta(projected, dynScalarEval(name, query, rhsName))
        }
        (fl, fr)
      } }
    }
    if (!resume)
      catalog.save("mvs", name, DurableCatalog.MvEntry(
        pk, Some(query), streaming = true, "update", down.nBuckets,
        chainedFrom = Some(lhsName), chainFrontier = Some(fL),
        chainedFromRight = Some(rhsName), chainFrontierRight = Some(fR),
        chainJoinType = Some(s"dynfilter:$valueCol:$op")))
    chainDepth(name) = math.max(chainDepth.getOrElse(lhsName, 0),
      chainDepth.getOrElse(rhsName, 0)) + 1
    chainUpstreams(name) = Set(lhsName, rhsName)
    jobs(name) = startChainedDynFilterJob(name, dyn, lhsUp, rhsUp, fL, fR,
      colMap, query, rhsName, op)
    statusDf("CREATE MATERIALIZED VIEW (streaming dynamic-filter chain)", name)
  }

  /** The trailing `ORDER BY … LIMIT k` of a top-n defining query —
    * stripping it leaves the PER-ROW query the delta maintenance
    * replays (the chain's state rows). The envelope guarantees the tail
    * is plain identifiers + directions + a literal limit, so the text
    * form is unambiguous.
    */
  private val TopNTail =
    """(?is)\s+ORDER\s+BY\s+[\w"\s,.]+?(?:\s+(?:ASC|DESC|NULLS\s+(?:FIRST|LAST)))*\s+LIMIT\s+\d+(?:\s+OFFSET\s+\d+)?\s*;?\s*$""".r

  /** Streaming global TopN eligibility (reference:
    * src/stream/src/executor/top_n/top_n_plain.rs:79 — the reference
    * streams `ORDER BY … LIMIT k` with all input rows as state plus a
    * top-k cache): the query is a per-row (deterministic
    * projection/filter) transform of ONE chain-subscribable relation
    * under ONE global Sort + Limit, every sort key a plain OUTPUT
    * column, LIMIT a positive literal, no OFFSET, and the declared PK =
    * the upstream PK passed through unaliased. The maintenance replays
    * the tail-stripped query over each delta (filters and computed
    * columns apply themselves per row — exactly the per-row chain
    * rule), then [[graft.streaming.IncrementalTopN]] maintains the cut.
    *
    * Returns (upstream, k, (outCol, asc, nullsFirst) per sort key,
    * tail-stripped per-row query).
    */
  private def chainableTopNUpstream(query: String, planned: DataFrame,
      pk: Seq[String])
      : Option[(String, Int, Int, Seq[(String, Boolean, Boolean)], String)] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical._
    val analyzed = planned.queryExecution.analyzed
    val nodes = analyzed.collect { case n => n }
    val glimits = nodes.collect { case g: GlobalLimit => g }
    val sorts = nodes.collect { case s: Sort => s }
    val offsets = nodes.collect { case o: Offset => o }
    val restPerRow = nodes.forall {
      case _: GlobalLimit | _: LocalLimit | _: Sort | _: Offset => true
      case _: Project | _: Filter | _: SubqueryAlias | _: View => true
      case _: LeafNode => true
      case _ => false
    }
    if (glimits.length != 1 || sorts.length != 1 || offsets.length > 1 ||
        !restPerRow) return None
    if (!nodes.forall(_.expressions.forall(_.deterministic))) return None
    val k = glimits.head.limitExpr match {
      case Literal(v: Int, _) if v > 0 => v
      case _ => return None
    }
    // OFFSET o: the maintenance keeps the top (o + k) and emits the k
    // visible rows (the reference TopN executor's offset mode)
    val off = offsets.headOption.map(_.offsetExpr match {
      case Literal(v: Int, _) if v >= 0 => v
      case _ => return None
    }).getOrElse(0)
    val sort = sorts.head
    if (!sort.global) return None
    // the PK pass-through check reads the top-level Project under the
    // limit/sort spine only — the bound relation's own view expansion
    // may carry inner Projects of its own
    def stripSpine(p: LogicalPlan): LogicalPlan = p match {
      case GlobalLimit(_, c) => stripSpine(c)
      case LocalLimit(_, c) => stripSpine(c)
      case Offset(_, c) => stripSpine(c)
      case s: Sort => stripSpine(s.child)
      case other => other
    }
    val passThrough: Set[String] = stripSpine(analyzed) match {
      case Project(list, _) => list.collect {
        case a: AttributeReference => a.name
        case Alias(a: AttributeReference, n) if n == a.name => a.name
      }.toSet
      case _ => planned.columns.toSet
    }
    // sort keys resolve at OUTPUT scope (Sort above the Project) — and
    // must BE output attributes by exprId, not merely share a name: a
    // qualified sort over a shadowed input column (`SELECT k, x AS v
    // FROM t ORDER BY t.v`) resolves to an added-missing INPUT attr
    // that the analyzer strips with a top Project; a name check would
    // chain it and IncrementalTopN would silently order by the alias
    // instead (advice r9). Fence on exprId mismatch.
    val outAttrs = analyzed.output
    val ordering: Seq[(String, Boolean, Boolean)] = sort.order.map { so =>
      val name = so.child match {
        case a: AttributeReference =>
          outAttrs.find(_.exprId == a.exprId).getOrElse(return None).name
        case _ => return None
      }
      (name, so.direction == Ascending, so.nullOrdering == NullsFirst)
    }
    // the per-row replay needs the ORDER BY/LIMIT tail gone from the
    // TEXT (the envelope makes the tail unambiguous); no strip → fence
    val stripped = TopNTail.replaceAllIn(query, "")
    if (stripped == query) return None
    referencedRelations(query) match {
      case Seq(up) =>
        val upPk = chainableSourcePk(up).getOrElse(return None)
        val pkOk = pk.toSet == upPk.toSet && upPk.forall(passThrough)
        if (pkOk) Some((up, k, off, ordering, stripped)) else None
      case _ => None
    }
  }

  /** CREATE MV for the streaming global TopN shape (see
    * [[chainableTopNUpstream]]); `resume` re-wires after recovery.
    */
  private def createChainedTopNMv(name: String, pk: Seq[String],
      query: String, resume: Boolean = false,
      resumeFrontier: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    bindMvTables(query)
    val planned = spark.sql(Engine.rewritePgSelect(query))
    val (upName, k, off, ordering, strippedQuery) =
      chainableTopNUpstream(query, planned, pk).getOrElse(
        throw new IllegalStateException(
          s"$name: top-n chain shape no longer derivable"))
    val up = mvs.get(upName).getOrElse(throw new IllegalArgumentException(
      s"chained upstream $upName is not registered"))
    if (!resume) jobs.get(upName).foreach(_.processAllAvailable())
    // cluster the state by the sort keys within each bucket file (r10):
    // the boundary-region read (`first key ⪰ old k-th`) prunes on
    // parquet row-group stats, which on unsorted buckets exclude almost
    // nothing — sorted files give the read the reference's
    // sorted-state-table locality (asc/desc is irrelevant to min/max
    // stats)
    val state = mvs.define(s"${name}__base", pk,
      sortWithinBuckets = ordering.map(_._1))
    val down = mvs.define(name, pk)
    val inc = new graft.streaming.IncrementalTopN(state, down, k, ordering,
      pk, off)
    // the delta path replays the tail-stripped PER-ROW query over each
    // slice (filters/computed columns apply themselves; op/seq carried
    // through) — the same transform the per-row chain uses
    val perRow = chainTransform(name, strippedQuery, upName) _
    val frontier = resumeFrontier.getOrElse {
      up.withReadLock {
        val f = up.latestChangelogBatchId
        val snap = up.read()
        if (snap.columns.nonEmpty) inc.applyDelta(perRow(snap))
        f
      }
    }
    if (!resume)
      catalog.save("mvs", name, DurableCatalog.MvEntry(
        pk, Some(query), streaming = true, "update", down.nBuckets,
        chainedFrom = Some(upName), chainFrontier = Some(frontier),
        chainJoinType = Some(s"topn:$k")))
    chainDepth(name) = chainDepth.getOrElse(upName, 0) + 1
    chainUpstreams(name) = Set(upName)
    jobs(name) = up.changelogStreamFrom(frontier).writeStream
      .option("checkpointLocation", mvs.checkpointDir(name))
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .foreachBatch { (batch0: DataFrame, id: Long) =>
        val batch =
          if (batch0.sparkSession eq spark) batch0
          else spark.createDataFrame(batch0.rdd, batch0.schema)
        inc.applyDelta(perRow(batch), id)
      }
      .start()
    statusDf("CREATE MATERIALIZED VIEW (streaming top-n chain)", name)
  }

  /** UNION ALL MV-on-MV eligibility: the query is a two-branch UNION
    * ALL whose branches are per-row over two DISTINCT streaming MVs.
    * UNION DISTINCT (a Distinct over the union) is not linear in its
    * inputs and stays on the batch-refresh path.
    */
  private def chainableUnionUpstream(query: String, planned: DataFrame,
      pk: Seq[String]): Option[(String, String)] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val nodes = planned.queryExecution.analyzed.collect { case n => n }
    val unions = nodes.collect { case u: Union => u }
    val restPerRow = nodes.forall {
      case _: Union => true
      case _: Project | _: Filter | _: SubqueryAlias | _: View => true
      case _: LeafNode => true
      case _ => false
    }
    if (unions.length != 1 || unions.head.children.length != 2 || !restPerRow)
      return None
    if (!pk.forall(planned.columns.contains)) return None
    referencedRelations(query) match {
      case Seq(l, r) if l != r =>
        if (Seq(l, r).forall(n => chainableSourcePk(n).isDefined))
          Some((l, r))
        else None
      case _ => None
    }
  }

  /** Aggregate-over-UNION-ALL eligibility, incl. UNION DISTINCT (≡
    * GROUP BY every output column — the reference rewrites it exactly
    * so, union_to_distinct_rule.rs): exactly one 2-input Union below
    * exactly one Aggregate/Distinct, rest per-row, group keys plain
    * attributes equal to the declared PK, both relations
    * chain-subscribable. Maintained by [[graft.streaming.IncrementalUnionAgg]].
    *
    * INTERSECT / EXCEPT (distinct forms) qualify through the same
    * machinery: the reference plans them as joins-over-distinct
    * (rewrite rules around union_to_distinct_rule.rs turn `A INTERSECT
    * B` into agg+semi shapes), and here a set-op row's group IS the
    * full output row, so group keys = every output column and the
    * touched-key replay substitutes Union for the set-op node
    * ([[chainJoinKeysFn]]) — a delta image on EITHER side names exactly
    * the output rows whose membership may flip (an EXCEPT right-side
    * insert can retract a left row; its key is that row). ALL variants
    * carry multiplicities that a PK-keyed store cannot hold (the
    * reference does not stream them either) → batch-refresh fence.
    */
  private def chainableAggUnionUpstream(query: String, planned: DataFrame,
      pk: Seq[String]): Option[(String, String, Seq[String])] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val nodes = planned.queryExecution.analyzed.collect { case n => n }
    val unions = nodes.collect { case u: Union => u }
    val aggs = nodes.collect { case a: Aggregate => a }
    val dists = nodes.collect { case d: Distinct => d }
    val setops = nodes.collect {
      case i: Intersect if !i.isAll => i
      case e: Except if !e.isAll => e
    }
    val restPerRow = nodes.forall {
      case _: Union | _: Aggregate | _: Distinct => true
      case i: Intersect => !i.isAll
      case e: Except => !e.isAll
      case _: Project | _: Filter | _: SubqueryAlias | _: View => true
      case _: LeafNode => true
      case _ => false
    }
    val unionAggShape = unions.length == 1 &&
      unions.head.children.length == 2 &&
      aggs.length + dists.length == 1 && setops.isEmpty
    val setopShape = setops.length == 1 && unions.isEmpty &&
      aggs.isEmpty && dists.isEmpty
    if (!restPerRow || (!unionAggShape && !setopShape)) return None
    val groupNames =
      if (setopShape || dists.nonEmpty) planned.columns.toSeq
      else aggs.head.groupingExpressions.map {
        case a: AttributeReference => a.name
        case _ => return None
      }
    if (groupNames.isEmpty || groupNames.toSet != pk.toSet) return None
    if (!groupNames.forall(planned.columns.contains)) return None
    referencedRelations(query) match {
      case Seq(l, r) if l != r &&
          Seq(l, r).forall(n => chainableSourcePk(n).isDefined) =>
        Some((l, r, groupNames))
      case _ => None
    }
  }

  /** Two-input analog of [[chainAggKeysFn]]: the defining query over
    * the given slices with every Filter ABOVE the aggregate (HAVING)
    * stripped from the analyzed plan.
    */
  private def chainJoinKeysFn(name: String, query: String, leftName: String,
      rightName: String)(ldf: DataFrame, rdf: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val full = chainJoinFn(name, query, leftName, rightName)(ldf, rdf)
    def aboveAgg(p: LogicalPlan): Boolean = p.exists {
      case _: Aggregate | _: Distinct | _: Intersect | _: Except => true
      case _ => false
    }
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case f: Filter if aboveAgg(f.child) => strip(f.child)
      // set-op → UNION ALL for the touched-key replay: keysOf2 runs the
      // query with one side's delta slice and the other side EMPTY, and
      // `Δl INTERSECT ∅` / `∅ EXCEPT Δr` would name no keys at all —
      // the union of branch rows is exactly the candidate set whose
      // membership the full recompute then re-decides
      case i: Intersect if !i.isAll =>
        Union(Seq(strip(i.left), strip(i.right)))
      case e: Except if !e.isAll =>
        Union(Seq(strip(e.left), strip(e.right)))
      case other => other.withNewChildren(other.children.map(strip))
    }
    org.apache.spark.sql.GraftPlans.ofRows(
      spark, strip(full.queryExecution.analyzed))
  }

  private def startChainedUnionAggJob(name: String,
      inc: graft.streaming.IncrementalUnionAgg, left: MaterializedView,
      right: MaterializedView, fL: Long, fR: Long)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.IncrementalJoin.taggedUnion(
        left.changelogStreamFrom(fL), right.changelogStreamFrom(fR))
      .writeStream
      .option("checkpointLocation", mvs.checkpointDir(name))
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .foreachBatch((batch: DataFrame, id: Long) => inc.applyDelta(batch, id))
      .start()

  private def createChainedAggUnionMv(name: String, pk: Seq[String],
      query: String, leftName: String, rightName: String,
      groupCols: Seq[String]): DataFrame = {
    val left = mvs.get(leftName).getOrElse(throw new IllegalArgumentException(
      s"chained upstream MV $leftName is not registered"))
    val right = mvs.get(rightName).getOrElse(throw new IllegalArgumentException(
      s"chained upstream MV $rightName is not registered"))
    jobs.get(leftName).foreach(_.processAllAvailable())
    jobs.get(rightName).foreach(_.processAllAvailable())
    val down = mvs.define(name, pk)
    val fn = chainJoinFn(name, query, leftName, rightName) _
    val (fL, fR) = left.withReadLock { right.withReadLock {
      val (lr, rr) = (left.read(), right.read())
      require(lr.columns.nonEmpty && rr.columns.nonEmpty,
        s"CREATE MATERIALIZED VIEW $name: both UNION upstreams must " +
          "have a published schema — FLUSH them first")
      val snap = fn(lr, rr)
      if (snap.columns.nonEmpty) down.merge(snap)
      (left.latestChangelogBatchId, right.latestChangelogBatchId)
    } }
    catalog.save("mvs", name, DurableCatalog.MvEntry(
      pk, Some(query), streaming = true, "update", down.nBuckets,
      chainedFrom = Some(leftName), chainFrontier = Some(fL),
      chainedFromRight = Some(rightName), chainFrontierRight = Some(fR),
      chainJoinType = Some("unionagg"), chainAggGroups = Some(groupCols)))
    chainDepth(name) = math.max(chainDepth.getOrElse(leftName, 0),
      chainDepth.getOrElse(rightName, 0)) + 1
    chainUpstreams(name) = Set(leftName, rightName)
    val inc = new graft.streaming.IncrementalUnionAgg(left, right, down,
      groupCols, fn, chainJoinKeysFn(name, query, leftName, rightName) _)
    jobs(name) = startChainedUnionAggJob(name, inc, left, right, fL, fR)
    statusDf("CREATE MATERIALIZED VIEW (streaming union-agg chain)", name)
  }

  private def startChainedUnionJob(name: String,
      inc: graft.streaming.IncrementalUnion, left: MaterializedView,
      right: MaterializedView, fL: Long, fR: Long)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.IncrementalJoin.taggedUnion(
        left.changelogStreamFrom(fL), right.changelogStreamFrom(fR))
      .writeStream
      .option("checkpointLocation", mvs.checkpointDir(name))
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .foreachBatch((batch: DataFrame, id: Long) => inc.applyDelta(batch, id))
      .start()

  private def createChainedUnionMv(name: String, pk: Seq[String],
      query: String, leftName: String, rightName: String): DataFrame = {
    val left = mvs.get(leftName).getOrElse(throw new IllegalArgumentException(
      s"chained upstream MV $leftName is not registered"))
    val right = mvs.get(rightName).getOrElse(throw new IllegalArgumentException(
      s"chained upstream MV $rightName is not registered"))
    jobs.get(leftName).foreach(_.processAllAvailable())
    jobs.get(rightName).foreach(_.processAllAvailable())
    val down = mvs.define(name, pk)
    val fn = chainJoinFn(name, query, leftName, rightName) _
    // backfill snapshot + both frontiers under both read locks: one
    // consistent cut (epochs after either frontier re-apply through
    // that side's tail, idempotently). Running Q(ΔA, ∅) needs BOTH
    // view schemas, so both sides must have published at least once.
    val (fL, fR) = left.withReadLock { right.withReadLock {
      val (lr, rr) = (left.read(), right.read())
      require(lr.columns.nonEmpty && rr.columns.nonEmpty,
        s"CREATE MATERIALIZED VIEW $name: both UNION ALL upstreams must " +
          "have a published schema — FLUSH them first")
      val snap = fn(lr, rr)
      if (snap.columns.nonEmpty) down.merge(snap)
      (left.latestChangelogBatchId, right.latestChangelogBatchId)
    } }
    catalog.save("mvs", name, DurableCatalog.MvEntry(
      pk, Some(query), streaming = true, "update", down.nBuckets,
      chainedFrom = Some(leftName), chainFrontier = Some(fL),
      chainedFromRight = Some(rightName), chainFrontierRight = Some(fR),
      chainJoinType = Some("unionall")))
    chainDepth(name) = math.max(chainDepth.getOrElse(leftName, 0),
      chainDepth.getOrElse(rightName, 0)) + 1
    chainUpstreams(name) = Set(leftName, rightName)
    val inc = new graft.streaming.IncrementalUnion(left, right, down,
      left.primaryKey, right.primaryKey, fn)
    jobs(name) = startChainedUnionJob(name, inc, left, right, fL, fR)
    statusDf("CREATE MATERIALIZED VIEW (streaming union chain)", name)
  }

  /** Resume a streaming MV's maintenance job from its surviving
    * checkpoint — the single dispatch recovery AND rename share: plain
    * source-fed MVs re-plan their SQL; chained MVs (per-row, aggregate,
    * join, union-all, union-agg) re-tail their upstream changelogs from
    * the durable frontiers. No-op when no checkpoint exists.
    */
  /** Drop torn metadata-log temp files from a streaming checkpoint
    * before resuming it. HDFSMetadataLog writes `.<batch>.<uuid>.tmp`
    * then renames; a kill -9 that lands between the write and the
    * rename (found by the crash-point fuzz — the halt tears whichever
    * OTHER stream is mid-offsets-write) leaves a checkpoint whose only
    * offsets entry is the temp file. On restart Spark sees no committed
    * batch (a fresh run) but a non-empty directory and refuses with
    * STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY. A never-renamed temp
    * was never visible to any reader, so deleting it (and its CRC
    * sibling) is exactly what the log's own next rename-over would do.
    */
  private def sanitizeCheckpoint(ckpt: String): Unit = {
    val root = java.nio.file.Paths.get(ckpt)
    if (!java.nio.file.Files.exists(root)) return
    val it = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      it.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith(".") && (n.endsWith(".tmp") || n.endsWith(".tmp.crc"))
        }
        .toSeq
        .foreach(p => try java.nio.file.Files.deleteIfExists(p)
          catch { case _: java.io.IOException => () })
    } finally it.close()
  }

  private def resumeMvMaintenance(name: String, mv: MaterializedView,
      e: DurableCatalog.MvEntry, q: String): Unit = {
    val ckpt = mvs.checkpointDir(name)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(ckpt))) return
    sanitizeCheckpoint(ckpt)
    e.chainedFrom match {
      case Some(upName) =>
        // MV-on-MV chain: re-tail the upstream changelog from
        // the original frontier — the checkpoint's file log
        // dedups epochs already absorbed, so no re-backfill
        val upMv = mvs.get(upName).getOrElse(
          throw new IllegalStateException(
            s"chained upstream $upName not yet recovered"))
        chainDepth(name) = chainDepth.getOrElse(upName, 0) + 1
        chainUpstreams(name) = Set(upName)
        e.chainJoinType.filter(_.startsWith("changelog:")).foreach { t =>
          jobs(name) = startChangelogChainJob(name, mv, upMv, q,
            t.stripPrefix("changelog:"), e.chainFrontier.getOrElse(-1L))
          return
        }
        e.chainJoinType.filter(_.startsWith("dynfilter:")).foreach { _ =>
          // re-derives the shape from the persisted query, re-defines
          // the __base state + result stores over their on-disk data,
          // resumes the tagged-union job from the original frontiers
          createChainedDynFilterMv(name, e.pk, q, resume = true,
            resumeFrontiers = Some((e.chainFrontier.getOrElse(-1L),
              e.chainFrontierRight.getOrElse(-1L))))
          return
        }
        e.chainJoinType.filter(_.startsWith("dynset:")).foreach { _ =>
          createChainedDynSetMv(name, e.pk, q, resume = true,
            resumeFrontiers = Some((e.chainFrontier.getOrElse(-1L),
              e.chainFrontierRight.getOrElse(-1L))))
          return
        }
        e.chainJoinType.filter(_.startsWith("topn:")).foreach { _ =>
          createChainedTopNMv(name, e.pk, q, resume = true,
            resumeFrontier = Some(e.chainFrontier.getOrElse(-1L)))
          return
        }
        jobs(name) = (e.chainedFromRight, e.chainAggGroups) match {
          case (Some(rightName), _) =>
            val rightMv = mvs.get(rightName).getOrElse(
              throw new IllegalStateException(
                s"chained upstream $rightName not yet recovered"))
            chainDepth(name) = math.max(
              chainDepth.getOrElse(upName, 0),
              chainDepth.getOrElse(rightName, 0)) + 1
            chainUpstreams(name) = Set(upName, rightName)
            if (e.chainJoinType.contains("unionagg")) {
              val inc = new graft.streaming.IncrementalUnionAgg(
                upMv, rightMv, mv,
                e.chainAggGroups.getOrElse(Seq.empty),
                chainJoinFn(name, q, upName, rightName) _,
                chainJoinKeysFn(name, q, upName, rightName) _)
              startChainedUnionAggJob(name, inc, upMv, rightMv,
                e.chainFrontier.getOrElse(-1L),
                e.chainFrontierRight.getOrElse(-1L))
            } else if (e.chainJoinType.contains("unionall")) {
              val inc = new graft.streaming.IncrementalUnion(
                upMv, rightMv, mv, upMv.primaryKey,
                rightMv.primaryKey,
                chainJoinFn(name, q, upName, rightName) _)
              startChainedUnionJob(name, inc, upMv, rightMv,
                e.chainFrontier.getOrElse(-1L),
                e.chainFrontierRight.getOrElse(-1L))
            } else {
              val inc = new graft.streaming.IncrementalJoin(
                upMv, rightMv, mv, upMv.primaryKey,
                rightMv.primaryKey,
                chainJoinFn(name, q, upName, rightName) _,
                e.chainJoinType.getOrElse("inner"))
              startChainedJoinJob(name, inc, upMv, rightMv,
                e.chainFrontier.getOrElse(-1L),
                e.chainFrontierRight.getOrElse(-1L))
            }
          case (None, Some(groups)) => startChainedAggJob(name,
            mv, upMv, q, upName, groups,
            e.chainFrontier.getOrElse(-1L))
          case (None, None) =>
            // per-row chain: re-derive any temporal horizon from the
            // persisted defining query (detection is deterministic text)
            registerTemporalFilter(name, q, mv.read().columns.toSeq)
            mv.start(
              chainTransform(name, q, upName)(
                upMv.changelogStreamFrom(e.chainFrontier.getOrElse(-1L))),
              ckpt, outputMode = e.outputMode)
        }
      case None =>
        bindMvTables(q) // the MV may join engine-managed tables
        val result = spark.sql(Engine.rewritePgSelect(
          Engine.TemporalJoinClause.replaceAllIn(q, "")))
        if (isPerRowPlan(result))
          registerTemporalFilter(name, q, result.columns.toSeq)
        jobs(name) = mv.start(withChangelogOps(q, result), ckpt,
          outputMode = e.outputMode)
    }
  }

  /** N-way (≥3) INNER join MV decomposed into a cascade of binary delta
    * joins — how the reference plans multi-way streaming joins (a tree
    * of binary StreamHashJoins, proto/stream_plan.proto: every join
    * node is binary; the frontend's multi-join reorder emits a
    * left-deep binary tree). Each internal step
    * `<name>__casc<k>` is created through the NORMAL execute() path, so
    * it gets the full binary-chain machinery and validation (equi
    * prefix, PK = side-PK union, restart recovery); the user-visible MV
    * is the last binary join. Internal steps carry only the columns the
    * remaining joins/output need, plus every leaf PK.
    *
    * Envelope (else None → the caller's batch-refresh fence): left-deep
    * spine of plain relations, every step INNER/LEFT/RIGHT/FULL with a
    * condition (outer steps compose exactly as the left-deep SQL
    * reads), every leaf chain-subscribable, every referenced column
    * name unique across the leaves (the rewrite unqualifies references
    * — `a.k` would dangle once `a` is folded into a cascade step),
    * declared PK = union of all leaf PKs, no SELECT *.
    */
  private def createCascadedJoinMv(name: String, pk: Seq[String],
      query: String, dryRun: Boolean = false): Option[DataFrame] = try {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedRelation, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
    import org.apache.spark.sql.catalyst.plans.Inner
    import org.apache.spark.sql.catalyst.plans.logical._

    val parsed = spark.sessionState.sqlParser.parsePlan(query)
    val (selectList, afterProj) = parsed match {
      case Project(list, child) => (list, child)
      case _ => return None
    }
    if (selectList.exists(_.exists(_.isInstanceOf[UnresolvedStar]))) return None
    val (whereOpt, joinTree) = afterProj match {
      case Filter(cond, child) => (Some(cond), child)
      case child => (None, child)
    }
    // left-deep spine over plain relations; each step keeps its own
    // join type — outer steps compose exactly as the left-deep SQL
    // reads, and every binary step's chain machinery handles all four
    // types (null-extension repair included)
    import org.apache.spark.sql.catalyst.plans.{FullOuter, LeftOuter, RightOuter}
    def kindSql(jt: org.apache.spark.sql.catalyst.plans.JoinType): Option[String] =
      jt match {
        case Inner => Some("JOIN")
        case LeftOuter => Some("LEFT JOIN")
        case RightOuter => Some("RIGHT JOIN")
        case FullOuter => Some("FULL JOIN")
        case _ => None
      }
    def spine(p: LogicalPlan): Option[(Seq[String], Seq[(String, Expression)])] =
      p match {
        case j: Join if j.condition.isDefined && kindSql(j.joinType).isDefined =>
          val rname = j.right match {
            case u: UnresolvedRelation => u.multipartIdentifier.last
            case _ => return None
          }
          spine(j.left).map { case (rels, conds) =>
            (rels :+ rname, conds :+ (kindSql(j.joinType).get, j.condition.get))
          }
        case u: UnresolvedRelation => Some((Seq(u.multipartIdentifier.last), Nil))
        case _ => None
      }
    val (rels, conds0) = spine(joinTree).getOrElse(return None)
    val (kinds, conds) = (conds0.map(_._1), conds0.map(_._2))
    val n = rels.size
    if (n < 3 || rels.distinct.size != n) return None
    val leafPk = rels.map(r => r -> chainableSourcePk(r).getOrElse(return None)).toMap
    if (pk.toSet != rels.flatMap(leafPk).toSet) return None
    val colsOf = rels.map(r => r -> table(r).columns.toSet).toMap

    def refs(e: Expression): Seq[String] =
      e.collect { case ua: UnresolvedAttribute => ua.nameParts.last }
    val needed = (selectList.flatMap(refs) ++ conds.flatMap(refs) ++
      whereOpt.toSeq.flatMap(refs) ++ rels.flatMap(leafPk)).distinct
    // every needed name must live in exactly ONE leaf — the rewrite
    // drops qualifiers, so an ambiguous name would silently re-bind
    if (!needed.forall(nm => rels.count(r => colsOf(r)(nm)) == 1)) return None

    def unq(e: Expression): Expression = e.transformUp {
      case ua: UnresolvedAttribute => UnresolvedAttribute(Seq(ua.nameParts.last))
    }
    def renderItem(e: Expression): String = e match {
      case al: Alias => s"${unq(al.child).sql} AS ${al.name}"
      case ua: UnresolvedAttribute => unq(ua).sql
      case UnresolvedAlias(child, _) => unq(child).sql
      case other => unq(other).sql
    }

    if (dryRun) {
      // classification passed — report the cascade shape without
      // creating anything (EXPLAIN CREATE MATERIALIZED VIEW)
      import spark.implicits._
      return Some(Seq(
        s"maintenance: ${n}-way delta-join cascade — left-deep binary " +
          s"StreamDeltaJoin steps over ${rels.mkString(" ⋈ ")} " +
          s"(${kinds.mkString(", ")})").toDF("plan"))
    }

    val created = scala.collection.mutable.ArrayBuffer[String]()
    def rollback(): Unit = created.reverse.foreach { c =>
      jobs.remove(c).foreach(_.stop())
      mvs.drop(c)
      catalog.delete("mvs", c)
      spark.catalog.dropTempView(c)
    }
    try {
      var curName = rels.head
      var curCols = colsOf(rels.head)
      for (i <- 1 until n - 1) {
        val step = s"${name}__casc$i"
        val carry = needed.filter(nm => curCols(nm) || colsOf(rels(i))(nm))
        val stepPk = rels.take(i + 1).flatMap(leafPk)
        execute(s"CREATE MATERIALIZED VIEW $step " +
          s"(PRIMARY KEY (${stepPk.mkString(", ")})) AS " +
          s"SELECT ${carry.map(c => s"`$c`").mkString(", ")} " +
          s"FROM $curName ${kinds(i - 1)} ${rels(i)} ON ${unq(conds(i - 1)).sql}")
        created += step
        if (streamingJob(step).isEmpty)
          throw new IllegalStateException(s"cascade step $step did not chain")
        curName = step
        curCols = carry.toSet
      }
      val finalSql = s"SELECT ${selectList.map(renderItem).mkString(", ")} " +
        s"FROM $curName ${kinds(n - 2)} ${rels(n - 1)} ON ${unq(conds(n - 2)).sql}" +
        whereOpt.map(w => s" WHERE ${unq(w).sql}").getOrElse("")
      val out = execute(s"CREATE MATERIALIZED VIEW $name " +
        s"(PRIMARY KEY (${pk.mkString(", ")})) AS $finalSql")
      if (streamingJob(name).isEmpty) {
        created += name
        throw new IllegalStateException(s"cascade tail $name did not chain")
      }
      Some(out)
    } catch {
      case scala.util.control.NonFatal(_) => rollback(); None
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  // `CREATE MATERIALIZED VIEW m AS WITH sub AS CHANGELOG FROM t
  //  SELECT … FROM sub` (reference: e2e_test/streaming/changelog.slt +
  // src/stream/src/executor/changelog.rs): an APPEND-ONLY MV of change
  // events — every upstream change lands as a permanent row tagged
  // `changelog_op` (1 insert, 2 delete, 3 update-old, 4 update-new; the
  // engine's own op codes) plus a hidden `_changelog_row_id`.
  private val CreateChangelogMvStmt =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s+AS\s+WITH\s+(\w+)\s+AS\s+CHANGELOG\s+FROM\s+(\w+)\s+(SELECT\s+.*?)\s*;?\s*""".r

  private val ChangelogIdStride = 1L << 33

  /** One epoch's changelog rows → the MV's append rows: assign the
    * deterministic `_changelog_row_id` (epoch-stride + rank over a total
    * row ordering — identical rows permuting ranks yield the same SET,
    * so a foreachBatch retry merges idempotently), rename `_op` to the
    * user-visible `changelog_op`, apply the per-row SELECT with the
    * hidden row id carried through as the storage PK.
    */
  private def changelogChainRows(name: String, selectSql: String,
      subName: String, epochRows0: DataFrame, idEpoch: Long): DataFrame = {
    import graft.streaming.Changelog
    import org.apache.spark.sql.functions._
    val epochRows =
      if (epochRows0.sparkSession eq spark) epochRows0
      else spark.createDataFrame(epochRows0.rdd, epochRows0.schema)
    val withSeq =
      if (epochRows.columns.contains(Changelog.SeqCol)) epochRows
      else epochRows.withColumn(Changelog.SeqCol, monotonically_increasing_id())
    val w = org.apache.spark.sql.expressions.Window.orderBy(
      withSeq.columns.map(col).toSeq: _*)
    val dataCols = withSeq.columns.toSeq
      .filterNot(Seq(Changelog.OpCol, Changelog.SeqCol).contains)
    val sub = withSeq
      .withColumn("changelog_op", col(Changelog.OpCol))
      .withColumn("_changelog_row_id",
        lit(idEpoch * ChangelogIdStride) + row_number().over(w).cast("long"))
      .drop(Changelog.OpCol, Changelog.SeqCol)
    val view = s"__chlog_$name"
    sub.createOrReplaceTempView(view)
    // `SELECT *` means the reference's visible changelog columns (data +
    // changelog_op), NOT the hidden row id — expand it explicitly
    val starExpanded = selectSql.replaceFirst("(?is)^\\s*SELECT\\s+\\*",
      "SELECT " + (dataCols :+ "changelog_op").map(c => s"`$c`").mkString(", "))
    val bound = prefixSelect(starExpanded,
      Seq(s"`_changelog_row_id` AS `${Engine.RowIdCol}`"))
      .replaceAll("(?i)\\b" + java.util.regex.Pattern.quote(subName) + "\\b", view)
    spark.sql(bound)
  }

  private def startChangelogChainJob(name: String, down: MaterializedView,
      up: MaterializedView, selectSql: String, subName: String,
      frontier: Long): org.apache.spark.sql.streaming.StreamingQuery =
    up.changelogStreamFrom(frontier).writeStream
      .option("checkpointLocation", mvs.checkpointDir(name))
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .foreachBatch((batch: DataFrame, id: Long) =>
        down.merge(changelogChainRows(name, selectSql, subName, batch, id), id))
      .start()

  private def createChangelogMv(name: String, subName: String,
      relName: String, selectSql: String): DataFrame = {
    val up = mvs.get(relName).filter(_ => chainableSourcePk(relName).isDefined)
      .getOrElse(throw new IllegalArgumentException(
        s"CHANGELOG FROM $relName requires an epoch-published table or " +
          "streaming materialized view"))
    jobs.get(relName).foreach(_.processAllAvailable())
    // validate the user SELECT is per-row against a plain probe of the
    // sub's shape (data + changelog_op + _changelog_row_id) — the live
    // transform's own id-assignment window must not trip the check
    locally {
      val subSchema = org.apache.spark.sql.types.StructType(
        up.read().schema.fields :+
          org.apache.spark.sql.types.StructField("changelog_op",
            org.apache.spark.sql.types.IntegerType) :+
          org.apache.spark.sql.types.StructField("_changelog_row_id",
            org.apache.spark.sql.types.LongType))
      val probeView = s"__chlog_probe_$name"
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], subSchema)
        .createOrReplaceTempView(probeView)
      val probe = spark.sql(selectSql.replaceAll(
        "(?i)\\b" + java.util.regex.Pattern.quote(subName) + "\\b", probeView))
      require(isPerRowPlan(probe),
        s"CHANGELOG view $name: the SELECT over $subName must be per-row " +
          "(projection/filter only)")
      spark.catalog.dropTempView(probeView)
    }
    val down = mvs.define(name, Seq(Engine.RowIdCol))
    hiddenRowIdTables += name
    // backfill: the current snapshot enters the log as op-1 inserts in
    // a reserved pre-stream epoch (ids below every streamed epoch)
    val frontier = up.withReadLock {
      val f = up.latestChangelogBatchId
      val snap = up.read()
      if (snap.columns.nonEmpty) {
        val seeded = graft.streaming.Changelog.ofInserts(snap)
        down.merge(changelogChainRows(name, selectSql, subName, seeded, -1L))
      }
      f
    }
    catalog.save("mvs", name, DurableCatalog.MvEntry(
      Seq(Engine.RowIdCol), Some(selectSql), streaming = true, "update", down.nBuckets,
      chainedFrom = Some(relName), chainFrontier = Some(frontier),
      chainJoinType = Some(s"changelog:$subName")))
    chainDepth(name) = chainDepth.getOrElse(relName, 0) + 1
    chainUpstreams(name) = Set(relName)
    jobs(name) = startChangelogChainJob(name, down, up, selectSql, subName,
      frontier)
    statusDf("CREATE MATERIALIZED VIEW (changelog chain)", name)
  }

  /** Re-plan a source from an edited DDL: fresh reader, re-registered
    * view, durable entry updated (ALTER SOURCE's shared tail).
    */
  private def replanSource(name: String, newDdl: String,
      status: String): DataFrame = {
    val d = SqlFrontend.parseCreateSource(newDdl).getOrElse(
      throw new IllegalStateException(
        s"ALTER SOURCE $name: stored DDL no longer parses"))
    val stream = SqlFrontend.planSource(spark, d)
    sources(name) = stream
    stream.createOrReplaceTempView(name)
    catalog.save("sources", name, DurableCatalog.SourceEntry(newDdl))
    statusDf(status, name)
  }

  private val AlterSourceAddCol =
    """(?is)\s*ALTER\s+SOURCE\s+(\w+)\s+ADD\s+(?:COLUMN\s+)?(\w+)\s+([\w()\[\]<>0-9, ]+?)\s*;?\s*""".r

  private val AlterRateLimitStmt =
    ("""(?is)\s*ALTER\s+(SOURCE|TABLE|MATERIALIZED\s+VIEW)\s+(\w+)\s+SET\s+""" +
      """(SOURCE_RATE_LIMIT|STREAMING_RATE_LIMIT|BACKFILL_RATE_LIMIT)""" +
      """\s+TO\s+(\d+|DEFAULT)\s*;?\s*""").r

  private val AlterRename =
    """(?is)\s*ALTER\s+(TABLE|MATERIALIZED\s+VIEW)\s+(\w+)\s+RENAME\s+TO\s+(\w+)\s*;?\s*""".r

  /** `ALTER TABLE/MATERIALIZED VIEW x RENAME TO y` (reference:
    * handler/alter_rename.rs): storage dir, catalog entry, declared
    * schema/defaults, and the session binding all move. A streaming
    * MV's maintenance job is stopped and resumed under the new name
    * from the moved checkpoint (same dispatch as recovery — plain,
    * chained, join, union shapes all re-wire); OVER-window MVs
    * re-create under the new name. Renaming an object OTHER MVs chain
    * from is fenced: their defining SQL names the old relation, so the
    * rename would silently orphan their maintenance.
    */
  /** DDL that re-shapes or re-names a relation other MVs CHAIN from is
    * fenced: the dependents' defining SQL and subscribed changelog
    * schema name/assume the current shape — proceeding would silently
    * orphan their maintenance or drift the changelog schema mid-stream.
    */
  private def fenceChainedDependents(name: String, op: String): Unit = {
    val dependents = catalog.list[DurableCatalog.MvEntry]("mvs").collect {
      case (n, me) if me.chainedFrom.contains(name) ||
          me.chainedFromRight.contains(name) => n
    }
    require(dependents.isEmpty,
      s"$op: ${dependents.mkString(", ")} chain(s) from $name — drop or " +
        "re-create the dependents first")
  }

  private def renameObject(kindS: String, from: String, to0: String,
      keepSchema: Boolean = true): DataFrame = {
    val isTable = kindS.equalsIgnoreCase("TABLE")
    // PG semantics: RENAME keeps the object's schema — a bare new name
    // for a schema-qualified object stays in that schema (SET SCHEMA,
    // which passes keepSchema = false, is the explicit move)
    val to =
      if (keepSchema && splitNs(to0)._1 == "public" &&
          splitNs(from)._1 != "public" && !to0.contains("__"))
        splitNs(from)._1 + "__" + to0
      else to0
    require(mvs.get(to).isEmpty && !tableSchemas.contains(to),
      s"RENAME: $to already exists")
    fenceChainedDependents(from, "RENAME")
    // quiesce, then stop: draining first guarantees the checkpoint's
    // last batch is COMMITTED — stopping mid-batch leaves offsets
    // without a commit, and the resumed query under the new name would
    // trip Spark's fresh-start-vs-nonempty-checkpoint validation
    // (the reference pauses the job at a barrier before catalog moves)
    jobs.get(from).foreach { j =>
      if (j.isActive) { j.processAllAvailable(); j.stop() }
    }
    require(mvs.get(s"${from}__base").isEmpty,
      s"RENAME: $from is an over-window MV — re-create it under the new name")
    val old = mvs.get(from).getOrElse(
      throw new IllegalArgumentException(s"RENAME: no such $kindS $from"))
    val fromDir = java.nio.file.Paths.get(warehouseDir, from)
    val toDir = java.nio.file.Paths.get(warehouseDir, to)
    if (java.nio.file.Files.exists(fromDir))
      java.nio.file.Files.move(fromDir, toDir)
    mvs.drop(from)
    // bucket layout travels with the rename: the on-disk files are the
    // old layout, so the new binding must keep nBuckets AND bucketKeys
    // (a mismatch would silently break bucket-pruned reads/merges)
    val newMv = mvs.define(to, old.primaryKey, old.nBuckets, old.bucketKeys)
    temporalFilters.remove(from).foreach(temporalFilters(to) = _)
    if (isTable) {
      tableSchemas.remove(from).foreach(s => tableSchemas(to) = s)
      tableDefaults.remove(from).foreach(d => tableDefaults(to) = d)
      tableGenerated.remove(from).foreach(g => tableGenerated(to) = g)
      tableOnConflict.remove(from).foreach(c => tableOnConflict(to) = c)
      catalog.load[DurableCatalog.TableEntry]("tables", from).foreach { e =>
        catalog.delete("tables", from); catalog.save("tables", to, e)
      }
    } else {
      jobs.remove(from)
      chainDepth.remove(from).foreach(d => chainDepth(to) = d)
      catalog.load[DurableCatalog.MvEntry]("mvs", from).foreach { e =>
        catalog.delete("mvs", from); catalog.save("mvs", to, e)
        // restart streaming maintenance under the new name — the moved
        // checkpoint dir resumes source offsets / chain frontiers
        // (the exact recovery dispatch, so chained shapes re-wire too)
        if (e.streaming && !e.over.contains(true))
          e.query.foreach(q => resumeMvMaintenance(to, newMv, e, q))
      }
    }
    // ownership and ACLs travel with the object
    objectOwners.remove(from).foreach { u =>
      objectOwners(to) = u
      catalog.delete("owners", from)
      catalog.save("owners", to, DurableCatalog.OwnerEntry(u))
    }
    acls.remove(from).foreach { g =>
      acls(to) = g
      catalog.delete("acls", from)
      catalog.save("acls", to, DurableCatalog.AclEntry(g))
    }
    spark.catalog.dropTempView(from)
    statusDf(s"ALTER ${kindS.toUpperCase.replaceAll("\\s+", " ")} RENAME",
      s"$from -> $to")
  }

  private val AlterParallelism =
    ("""(?is)\s*ALTER\s+(TABLE|MATERIALIZED\s+VIEW)\s+(\w+)\s+SET\s+""" +
      """PARALLELISM\s*=?\s*(\d+|ADAPTIVE)\s*;?\s*""").r

  /** `ALTER TABLE/MV x SET PARALLELISM = n` (reference:
    * handler/alter_parallelism.rs — re-distributes a streaming job).
    * Here parallelism IS the store's bucket count (the distribution
    * unit every bucket-pruned read/merge keys off), so the statement
    * re-buckets the store: quiesce, stage the full image, clear the old
    * layout, merge under the new one, persist it, resume maintenance.
    * O(table) once — the price of a layout change, same as the
    * reference's shuffle re-distribution.
    */
  private def alterParallelism(kindS: String, name: String,
      nStr: String): DataFrame = {
    val target = if (nStr.equalsIgnoreCase("ADAPTIVE")) 32 else nStr.toInt
    require(target > 0 && target <= 4096,
      s"PARALLELISM must be in [1, 4096], got $target")
    val old = mvs.get(name).getOrElse(throw new IllegalArgumentException(
      s"no such ${kindS.toLowerCase} $name"))
    require(isSuperuser(sessionUser) || ownerOf(name) == sessionUser,
      s"must be owner of ${displayName(name)} (as $sessionUser)")
    if (old.nBuckets == target)
      return statusDf("ALTER", s"$name parallelism unchanged")
    require(mvs.get(s"${name}__base").isEmpty,
      s"$name is an over-window MV — re-create it under the new parallelism")
    jobs.get(name).foreach { j =>
      if (j.isActive) { j.processAllAvailable(); j.stop() }
    }
    // the bucketed store lives at <warehouse>/<name>/data (the sibling
    // data.changelog must survive the re-bucket untouched)
    val dir = java.nio.file.Paths.get(warehouseDir, name, "data")
    val staging = java.nio.file.Paths.get(warehouseDir, s".$name.rebucket")
    val content = old.read()
    val hasRows = content.schema.nonEmpty
    if (hasRows)
      content.write.mode("overwrite").parquet(staging.toString)
    // old-layout bucket dirs must go: dynamic partition overwrite only
    // replaces buckets the new write touches, and a shrink would leave
    // stale high-bucket dirs double-counting every read
    if (java.nio.file.Files.exists(dir)) {
      FsList.list(dir)
        .filter(_.getFileName.toString.startsWith("__bucket="))
        .foreach(p => org.apache.commons.io.FileUtils
          .deleteDirectory(p.toFile))
    }
    mvs.drop(name)
    val fresh = mvs.define(name, old.primaryKey, target, old.bucketKeys)
    if (hasRows) {
      fresh.merge(spark.read.parquet(staging.toString))
      org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
    }
    // persist the layout and resume maintenance under it
    if (tableSchemas.contains(name)) saveTableEntry(name)
    else catalog.load[DurableCatalog.MvEntry]("mvs", name).foreach { e0 =>
      val e = e0.copy(nBuckets = target)
      catalog.save("mvs", name, e)
      if (e.streaming && !e.over.contains(true))
        e.query.foreach(q => resumeMvMaintenance(name, fresh, e, q))
    }
    statusDf(s"ALTER ${kindS.toUpperCase.replaceAll("\\s+", " ")}",
      s"$name parallelism ${old.nBuckets} -> $target")
  }

  private val AlterOwner =
    ("""(?is)\s*ALTER\s+(TABLE|MATERIALIZED\s+VIEW|VIEW|SOURCE|SINK|""" +
      """SCHEMA|DATABASE)\s+(\w+)\s+OWNER\s+TO\s+(\w+)\s*;?\s*""").r
  private val AlterSetSchema =
    """(?is)\s*ALTER\s+(TABLE|MATERIALIZED\s+VIEW)\s+(\w+)\s+SET\s+SCHEMA\s+(\w+)\s*;?\s*""".r
  private val AlterSwap =
    """(?is)\s*ALTER\s+(TABLE|MATERIALIZED\s+VIEW)\s+(\w+)\s+SWAP\s+WITH\s+(\w+)\s*;?\s*""".r

  /** `ALTER <kind> x OWNER TO u` (reference: handler/alter_owner.rs). */
  private def alterOwner(kindS: String, name: String, user: String): DataFrame = {
    require(userExists(user), s"user \"$user\" does not exist")
    if (kindS.equalsIgnoreCase("SCHEMA")) {
      require(schemaNames.contains(dbSchema(name)),
        s"schema \"$name\" does not exist")
      require(isSuperuser(sessionUser),
        s"permission denied to alter schema owner (as $sessionUser)")
      catalog.save("schemas", dbSchema(name), DurableCatalog.SchemaEntry(user))
    } else if (kindS.equalsIgnoreCase("DATABASE")) {
      require(isSuperuser(sessionUser), "permission denied")
    } else {
      require(allObjectNames.contains(name),
        s"relation \"$name\" does not exist")
      require(isSuperuser(sessionUser) || ownerOf(name) == sessionUser,
        s"must be owner of ${displayName(name)} (as $sessionUser)")
      objectOwners(name) = user
      catalog.save("owners", name, DurableCatalog.OwnerEntry(user))
    }
    statusDf(s"ALTER ${kindS.toUpperCase.replaceAll("\\s+", " ")}", name)
  }

  /** `ALTER TABLE/MV x SET SCHEMA s` (reference: alter_set_schema.rs) —
    * an internal rename to the target namespace; storage, catalog
    * entries, jobs, ownership and ACLs all move with it.
    */
  private def alterSetSchema(kindS: String, name: String,
      target: String): DataFrame = {
    require(schemaExists(target), s"schema \"$target\" does not exist")
    require(isSuperuser(sessionUser) || ownerOf(name) == sessionUser,
      s"must be owner of ${displayName(name)} (as $sessionUser)")
    val bare = splitNs(name)._2
    val ti = dbSchema(target)
    val to = if (ti.equalsIgnoreCase("public")) bare else ti + "__" + bare
    if (to == name) return statusDf("ALTER", name) // already there
    renameObject(kindS, name, to, keepSchema = false)
    statusDf(s"ALTER ${kindS.toUpperCase.replaceAll("\\s+", " ")}",
      displayName(to))
  }

  /** `ALTER TABLE/MV a SWAP WITH b` (reference: alter_swap_rename.rs):
    * both objects exchange names atomically from the session's view —
    * three renames through a temp name under the engine lock.
    */
  private def alterSwap(kindS: String, a: String, b: String): DataFrame = {
    require(a != b, "SWAP WITH requires two distinct objects")
    Seq(a, b).foreach(n =>
      require(isSuperuser(sessionUser) || ownerOf(n) == sessionUser,
        s"must be owner of ${displayName(n)} (as $sessionUser)"))
    val tmp = s"__swap_${a}"
    renameObject(kindS, a, tmp)
    try renameObject(kindS, b, a)
    catch {
      case e: Throwable => renameObject(kindS, tmp, a); throw e
    }
    renameObject(kindS, tmp, b)
    statusDf(s"ALTER ${kindS.toUpperCase.replaceAll("\\s+", " ")} SWAP",
      s"$a <-> $b")
  }

  private val AlterAddCol =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+(?:COLUMN\s+)?(\w+)\s+([\w()\[\]<>0-9, ]+?)(?:\s+DEFAULT\s+(.+?))?\s*;?\s*""".r
  private val AlterDropCol =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+(?:COLUMN\s+)?(\w+)\s*;?\s*""".r

  private val ShowMv = """(?is)\s*SHOW\s+MATERIALIZED\s+VIEWS\s*;?\s*""".r
  private val ShowCreate =
    """(?is)\s*SHOW\s+CREATE\s+(TABLE|MATERIALIZED\s+VIEW|VIEW|SOURCE|SINK|INDEX)\s+(\w+)\s*;?\s*""".r

  /** `SHOW CREATE <kind> <name>` (reference: handler/show.rs
    * handle_show_create_object): one (name, create_sql) row reconstructed
    * from the durable catalog — the DDL a user would re-issue to recreate
    * the object.
    */
  private def showCreate(kind: String, name: String): DataFrame = {
    import spark.implicits._
    Seq((displayName(name), createDdl(kind, name))).toDF("name", "create_sql")
  }

  /** The re-issuable DDL of one object (SHOW CREATE's payload; also the
    * `definition` column of the rw_catalog relations).
    */
  private def createDdl(kind: String, name: String): String = {
    import DurableCatalog._
    val k = kind.toUpperCase.replaceAll("\\s+", " ")
    val ddl: String = k match {
      case "TABLE" =>
        val e = catalog.load[TableEntry]("tables", name).getOrElse(
          throw new IllegalArgumentException(s"no such table $name"))
        val schema = org.apache.spark.sql.types.DataType.fromJson(e.schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val gen = e.generated.getOrElse(Map.empty)
        val cols = schema.fields.map { f =>
          val d = e.defaults.get(f.name).map(x => s" DEFAULT $x").getOrElse("")
          val g = gen.get(f.name).map(x => s" AS $x").getOrElse("")
          s"${f.name} ${f.dataType.sql}$d$g"
        }
        val conflict = e.onConflict
          .map(c => s" ON CONFLICT ${c.toUpperCase}").getOrElse("")
        s"CREATE TABLE ${displayName(name)} (${cols.mkString(", ")}, " +
          s"PRIMARY KEY (${e.pk.mkString(", ")}))$conflict"
      case "MATERIALIZED VIEW" =>
        val e = catalog.load[MvEntry]("mvs", name).getOrElse(
          throw new IllegalArgumentException(s"no such materialized view $name"))
        val q = e.query.getOrElse(
          throw new IllegalArgumentException(
            s"$name was defined programmatically — no SQL text to show"))
        s"CREATE MATERIALIZED VIEW ${displayName(name)} (PRIMARY KEY (${e.pk.mkString(", ")})) AS $q"
      case "VIEW" =>
        val e = catalog.load[ViewEntry]("views", name).getOrElse(
          throw new IllegalArgumentException(s"no such view $name"))
        s"CREATE VIEW ${displayName(name)} AS ${e.query}"
      case "SOURCE" =>
        catalog.load[SourceEntry]("sources", name).getOrElse(
          throw new IllegalArgumentException(s"no such source $name")).ddl.trim
      case "SINK" =>
        val e = catalog.load[SinkEntry]("sinks", name).getOrElse(
          throw new IllegalArgumentException(s"no such sink $name"))
        val opts = e.options.toSeq.sortBy(_._1)
          .map { case (ok, ov) => s"$ok = '$ov'" }.mkString(", ")
        s"CREATE SINK ${displayName(name)} FROM ${displayName(e.from)} WITH ($opts)"
      case "INDEX" =>
        val e = catalog.load[IndexEntry]("indexes", name).getOrElse(
          throw new IllegalArgumentException(s"no such index $name"))
        s"CREATE INDEX ${displayName(name)} ON ${displayName(e.table)} " +
          s"(${e.keys.mkString(", ")})"
    }
    ddl
  }
  private val ShowTables = """(?is)\s*SHOW\s+TABLES\s*;?\s*""".r
  private val DropTable =
    """(?is)\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\w+)\s*;?\s*""".r
  /** The maintenance strategy CREATE MATERIALIZED VIEW would pick for
    * this definition, as one EXPLAIN line — the same classifier cascade
    * the real dispatch runs (reference: handler/explain.rs prints the
    * stream plan for explain-create-mv; here the load-bearing decision
    * is WHICH incremental shape maintains the MV, or the loud
    * batch-refresh fence). Nothing is created.
    */
  private def explainMvStrategy(d: SqlFrontend.CreateMvDef, query: String,
      result: DataFrame): String = {
    val pk = d.pk.getOrElse(Nil)
    if (result.isStreaming) {
      val hasOver = result.queryExecution.analyzed.collectFirst {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.isDefined
      if (hasOver)
        "maintenance: source-fed incremental over-window (base copy + " +
          "partition-granular recompute)"
      else if (d.emitOnClose)
        "maintenance: streaming append — EMIT ON WINDOW CLOSE " +
          "(watermark-finalized rows only)"
      else
        "maintenance: continuous streaming upsert over source " +
          "(micro-batch merge by PK)"
    } else chainableUpstream(query, result) match {
      case Some(up) =>
        s"maintenance: incremental per-row chain over $up " +
          s"(Δ(query) = query(Δ$up))"
      case None => chainableAggUpstream(query, result, pk) match {
      case Some((up, gcols)) if gcols.isEmpty =>
        s"maintenance: incremental global aggregate over $up " +
          "(single-group materialized-input recompute)"
      case Some((up, gcols)) =>
        s"maintenance: incremental grouped aggregate over $up " +
          s"(touched-group recompute, groups = ${gcols.mkString(", ")})"
      case None => chainableJoinUpstream(query, result, pk) match {
      case Some((l, r, kind)) =>
        s"maintenance: $kind delta join of $l ⋈ $r " +
          "(Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB)"
      case None => chainableDynFilterUpstream(query, result, pk) match {
      case Some((l, r, v, op, _)) =>
        s"maintenance: dynamic filter over $l ($v $op scalar of $r — " +
          "band re-scan on threshold moves)"
      case None => chainableDynSetUpstream(query, result, pk) match {
      case Some((l, r, v, neg, _)) =>
        s"maintenance: dynamic ${if (neg) "anti-" else ""}set filter " +
          s"over $l ($v ${if (neg) "NOT IN" else "IN"} keys of $r — " +
          "entering/leaving key diff flips membership)"
      case None => chainableTopNUpstream(query, result, pk) match {
      case Some((up, k, _, _, _)) =>
        s"maintenance: streaming top-$k over $up " +
          "(boundary-pruned recompute, full TakeOrdered refill on deletes)"
      case None => chainableOverUpstream(query, result) match {
      case Some(up) =>
        s"maintenance: incremental over-window over $up " +
          "(partition-granular recompute)"
      case None => chainableUnionUpstream(query, result, pk) match {
      case Some((l, r)) =>
        s"maintenance: chained UNION ALL of $l and $r " +
          "(linear — per-side delta replay)"
      case None => chainableAggUnionUpstream(query, result, pk) match {
      case Some((l, r, gcols)) =>
        s"maintenance: incremental aggregate over union of $l, $r " +
          s"(touched groups = ${gcols.mkString(", ")})"
      case None =>
        createCascadedJoinMv(d.name, pk, query, dryRun = true) match {
          case Some(df) => df.collect().head.getString(0)
          case None =>
            val streamingUps = referencedRelations(query)
              .filter(n => chainableSourcePk(n).isDefined)
            if (streamingUps.nonEmpty)
              "maintenance: BATCH REFRESH fence — streaming upstream(s) " +
                s"${streamingUps.mkString(", ")} with no supported chain " +
                "shape; REFRESH MATERIALIZED VIEW to update"
            else
              "maintenance: one-shot batch materialization " +
                "(no streaming upstreams)"
        }
    } } } } } } } } }
  }

  private val Describe =
    """(?is)\s*(?:DESC(?:RIBE)?\s+(?:TABLE\s+)?|SHOW\s+COLUMNS\s+FROM\s+)(\w+)\s*;?\s*""".r
  private val ExplainAnalyze =
    """(?is)\s*EXPLAIN\s+ANALYZE\s+(.+)""".r
  private val Explain = """(?is)\s*EXPLAIN\s+(?:\((?:\w+[,\s]*)+\)\s+)?(.+)""".r
  private val DropSink = """(?is)\s*DROP\s+SINK\s+(\w+)\s*;?\s*""".r
  private val ShowSources = """(?is)\s*SHOW\s+SOURCES\s*;?\s*""".r
  private val ShowJobs = """(?is)\s*SHOW\s+JOBS\s*;?\s*""".r
  private val CancelJobs =
    """(?is)\s*CANCEL\s+JOBS?\s+([\w,\s]+?)\s*;?\s*""".r
  private val WaitStmt = """(?is)\s*WAIT\s*;?\s*""".r
  private val RecoverStmt = """(?is)\s*RECOVER\s*;?\s*""".r

  /** rw_streaming_jobs ids → job names (the bindRw oid assignment:
    * FirstUserOid + position among name-sorted objects + sinks).
    */
  private def jobIdMap: Map[Int, String] = {
    val names = systemObjects.sortBy(_.name).map(_.name) ++
      sinkNames.toSeq.sorted
    names.zipWithIndex.map { case (n, i) => (16384 + i) -> n }.toMap
  }
  private val CreateView =
    """(?is)\s*CREATE\s+VIEW\s+(\w+)\s+AS\s+(.*?)\s*;?\s*""".r
  private val DropView =
    """(?is)\s*DROP\s+VIEW\s+(?:IF\s+EXISTS\s+)?(\w+)\s*;?\s*""".r
  // optional reference clauses (handler/create_index.rs): INCLUDE
  // limits the covered columns (this engine's index stores the full
  // row — a covering superset, so INCLUDE is validated and accepted);
  // DISTRIBUTED BY picks the distribution key (here always the index
  // key — a DISTRIBUTED BY that is a prefix of the key is the only
  // form the reference allows anyway). Sort directions (ASC/DESC/
  // NULLS …) on key columns parse and are dropped: bucket pruning is
  // hash-based and in-bucket sorting is an access-path detail.
  private val CreateIndexStmt =
    ("""(?is)\s*CREATE\s+INDEX\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+ON\s+(\w+)""" +
      """\s*\(\s*([\w\s,]+?)\s*\)""" +
      """(?:\s+INCLUDE\s*\(\s*([\w\s,]+?)\s*\))?""" +
      """(?:\s+DISTRIBUTED\s+BY\s*\(\s*([\w\s,]+?)\s*\))?\s*;?\s*""").r
  private val DropIndexStmt =
    """(?is)\s*DROP\s+INDEX\s+(\w+)\s*;?\s*""".r
  private val ShowIndexes = """(?is)\s*SHOW\s+INDEXES\s*;?\s*""".r

  private case class IndexDef(table: String, keys: Seq[String], path: String, nBuckets: Int,
                              keyTypes: Seq[org.apache.spark.sql.types.DataType])
  private val indexes = scala.collection.mutable.Map[String, IndexDef]()

  /** `CREATE INDEX i ON t (k, …)`: a hash-bucket-partitioned, key-sorted
    * copy of the table (reference: handler/create_index.rs — an index IS
    * an MV with key-reordered distribution). Point lookups through
    * [[indexLookup]] prune to ONE bucket partition (plan-visible
    * PartitionFilters) and row-group-skip inside it via the sort — the
    * BatchLookupJoin access path. One-shot materialization: refresh by
    * re-issuing CREATE INDEX (the reference maintains indexes
    * continuously as streaming MVs — divergence documented in COVERAGE).
    */
  private def createIndex(name: String, tbl: String, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val df = table(tbl)
    require(keys.forall(df.columns.contains),
      s"CREATE INDEX $name: key not in $tbl(${df.columns.mkString(",")})")
    val n = 16
    val path = s"$warehouseDir/indexes/$name"
    df.withColumn("__idx_bucket", pmod(hash(keys.map(col): _*), lit(n)))
      .repartition(col("__idx_bucket"))
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").partitionBy("__idx_bucket").parquet(path)
    val keyTypes = keys.map(k => df.schema(k).dataType)
    indexes(name) = IndexDef(tbl, keys, path, n, keyTypes)
    catalog.save("indexes", name, DurableCatalog.IndexEntry(tbl, keys, path, n,
      org.apache.spark.sql.types.StructType(
        keys.map(k => df.schema(k))).json))
    statusDf("CREATE INDEX", name)
  }

  /** Equality lookup through an index: reads exactly one bucket
    * partition. `values` pair positionally with the index keys.
    *
    * Probe values are cast to the STORED key types before hashing: the
    * bucket is `pmod(hash(key), n)` over the stored column, and Spark's
    * `hash` is type-sensitive (an Int literal and a Long column with the
    * same value hash differently), so an uncast mistyped probe would
    * silently pick the wrong bucket and return 0 rows. Incompatible or
    * lossy probes fail loudly instead.
    */
  def indexLookup(index: String, values: Any*): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    val d = indexes.getOrElse(index,
      throw new IllegalArgumentException(s"unknown index $index"))
    require(values.size == d.keys.size, s"index $index has keys ${d.keys}")
    val probes = d.keys.lazyZip(values).lazyZip(d.keyTypes).map { (k, v, t) =>
      val l = Literal(v)
      require(Cast.canCast(l.dataType, t),
        s"index $index key $k: probe type ${l.dataType.simpleString} cannot cast to stored ${t.simpleString}")
      require(v == null || Cast(l, t, Some("UTC")).eval() != null,
        s"index $index key $k: probe value $v does not convert to stored ${t.simpleString}")
      lit(v).cast(t)
    }.toSeq
    val bucket = pmod(hash(probes: _*), lit(d.nBuckets))
    spark.read.parquet(d.path)
      .where(col("__idx_bucket") === bucket &&
        d.keys.zip(probes).map { case (k, p) => col(k) === p }
          .reduce(_ && _))
      .drop("__idx_bucket")
  }
  // --- CREATE AGGREGATE (reference: handler/create_aggregate.rs — a
  // named UDAF; external runtimes there, the native Aggregator registry
  // here). The created name is immediately callable from SQL text.
  private val CreateAggregateStmt =
    """(?is)\s*CREATE\s+AGGREGATE\s+(\w+)\s*\(([^)]*)\)\s+RETURNS\s+([\w ]+?)\s+LANGUAGE\s+(\w+)\s+AS\s+'([\w.]+)'\s*(?:WITH\s*\(([^)]*)\))?\s*;?\s*""".r
  private val DropAggregateStmt =
    """(?is)\s*DROP\s+AGGREGATE\s+(\w+)\s*;?\s*""".r
  private val ShowAggregates = """(?is)\s*SHOW\s+AGGREGATES\s*;?\s*""".r

  private val aggregates =
    scala.collection.mutable.Map[String, (String, String)]() // name -> (impl, signature)

  private def createAggregate(name: String, lang: String, impl: String,
      opts: String): DataFrame = {
    require(lang.equalsIgnoreCase("native"),
      s"CREATE AGGREGATE $name: LANGUAGE '$lang' not supported (native only " +
        "— python/js/wasm UDAF runtimes are a documented divergence)")
    val options = Option(opts).map(SqlFrontend.splitAssignments(_).map {
      case (k, v) => k.toLowerCase -> v.stripPrefix("'").stripSuffix("'")
    }.toMap).getOrElse(Map.empty)
    val sig = graft.functions.AggregateRegistry.register(
      spark, name, impl.toLowerCase, options)
    aggregates(name) = (impl.toLowerCase, sig)
    catalog.save("aggregates", name,
      DurableCatalog.AggregateEntry(impl.toLowerCase, options))
    statusDf("CREATE AGGREGATE", name)
  }

  // --- CREATE FUNCTION … USING LINK (reference: handler/
  // create_function.rs + src/expr/impl/src/udf/external.rs — a UDF the
  // user hosts behind a server, any language behind it; the embedded
  // python/js/wasm runtimes remain a documented divergence). The name
  // becomes callable anywhere in SQL; arguments coerce to the declared
  // parameter types; the link is only dialed at first call.
  private val CreateExternalFunctionStmt =
    """(?is)\s*CREATE\s+FUNCTION\s+(\w+)\s*\(((?:[^()]|\([^()]*\))*)\)\s+RETURNS\s+([\w ,()0-9]+?)\s+(?:LANGUAGE\s+(\w+)\s+)?AS\s+'?([\w.]+)'?\s+USING\s+LINK\s+'([^']+)'\s*;?\s*""".r
  private val DropFunctionStmt =
    """(?is)\s*DROP\s+FUNCTION\s+(\w+)\s*;?\s*""".r

  private val externalFns =
    scala.collection.mutable.Map[String, DurableCatalog.ExternalFnEntry]()

  private val PgArrayTypeRe = "(?is)^([\\w ]+?)\\s*\\[\\]$".r

  private def parseSqlType(t0: String): org.apache.spark.sql.types.DataType =
    t0.trim match {
      // PG `elem[]` array syntax, recursing so TEXT[] normalizes too
      case PgArrayTypeRe(inner) =>
        org.apache.spark.sql.types.ArrayType(parseSqlType(inner))
      case t =>
        // PG spellings Spark's parser rejects bare: VARCHAR/TEXT w/o length
        val n = t.replaceAll("(?i)^varchar$", "string")
          .replaceAll("(?i)^text$", "string")
        spark.sessionState.sqlParser.parseDataType(n)
    }

  // --- CREATE FUNCTION … LANGUAGE python/javascript AS $$body$$
  // (reference: handler/create_function.rs + src/expr/impl/src/udf/
  // python.rs, quickjs.rs — embedded interpreter UDFs). The dollar-
  // quoted body is stored verbatim, serialized into the plan, and
  // evaluated by per-executor interpreter worker pools
  // (EmbeddedUdfRuntime); wasm remains a documented divergence.
  // --- CREATE AGGREGATE … LANGUAGE python/javascript AS $$body$$
  // (reference: handler/create_aggregate.rs — UDAFs in interpreter
  // languages; body defines create_state/accumulate/[finish]). The
  // distributed half stays Spark-side (partial buffers + merge), the
  // interpreter folds each final group once (EmbeddedAggCall).
  private val CreateEmbeddedAggregateStmt =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?AGGREGATE\s+(\w+)\s*\(((?:[^()]|\([^()]*\))*)\)\s+RETURNS\s+([\w ,()\[\]0-9<>]+?)\s+LANGUAGE\s+(python|javascript|js)\s+AS\s+\$\$(.*?)\$\$\s*;?\s*""".r

  private val embeddedAggs =
    scala.collection.mutable.Map[String, DurableCatalog.EmbeddedFnEntry]()

  private def registerEmbeddedAggregate(name: String,
      e: DurableCatalog.EmbeddedFnEntry): Unit = {
    graft.functions.EmbeddedRegistration.aggregate(spark, name, e.lang,
      e.body, e.argTypes.map(parseSqlType), parseSqlType(e.retType))
    embeddedAggs(name) = e
  }

  // --- CREATE FUNCTION … RETURNS TABLE(…) LANGUAGE python/javascript
  // (reference: table-function UDF variants, src/expr/impl/src/
  // table_function/ + create_function.rs `RETURNS TABLE`): registers a
  // Catalyst Generator, usable in LATERAL VIEW and generator position.
  private val CreateEmbeddedUdtfStmt =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?FUNCTION\s+(\w+)\s*\(((?:[^()]|\([^()]*\))*)\)\s+RETURNS\s+TABLE\s*\(((?:[^()]|\([^()]*\))*)\)\s+LANGUAGE\s+(python|javascript|js)\s+AS\s+\$\$(.*?)\$\$\s*;?\s*""".r

  private val embeddedUdtfs =
    scala.collection.mutable.Map[String, DurableCatalog.EmbeddedFnEntry]()

  private def registerEmbeddedUdtf(name: String,
      e: DurableCatalog.EmbeddedFnEntry): Unit = {
    graft.functions.EmbeddedRegistration.table(spark, name, e.lang,
      e.body, e.argTypes.map(parseSqlType),
      parseSqlType(e.retType)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    embeddedUdtfs(name) = e
  }

  private def embeddedArgTypes(argSpec: String): Seq[String] =
    SqlFrontend.splitTopLevel(argSpec, ',')
      .map(_.trim).filter(_.nonEmpty)
      .map { a =>
        try parseSqlType(a).sql
        catch { case scala.util.control.NonFatal(_)
            if a.split("\\s+", 2).length == 2 =>
          parseSqlType(a.split("\\s+", 2)(1)).sql }
      }

  private def createEmbeddedAggregate(name: String, argSpec: String,
      retSpec: String, lang: String, body: String): DataFrame = {
    val entry = DurableCatalog.EmbeddedFnEntry(
      graft.functions.EmbeddedUdfRuntime.normalize(lang), body.trim,
      embeddedArgTypes(argSpec), parseSqlType(retSpec).sql)
    registerEmbeddedAggregate(name, entry)
    catalog.save("embeddedaggs", name, entry)
    statusDf("CREATE AGGREGATE", name)
  }

  private def createEmbeddedUdtf(name: String, argSpec: String,
      colSpec: String, lang: String, body: String): DataFrame = {
    val fields = SqlFrontend.splitTopLevel(colSpec, ',')
      .map(_.trim).filter(_.nonEmpty)
      .map { c =>
        val Array(cn, ct) = c.split("\\s+", 2)
        org.apache.spark.sql.types.StructField(cn, parseSqlType(ct))
      }
    val entry = DurableCatalog.EmbeddedFnEntry(
      graft.functions.EmbeddedUdfRuntime.normalize(lang), body.trim,
      embeddedArgTypes(argSpec),
      org.apache.spark.sql.types.StructType(fields).sql)
    registerEmbeddedUdtf(name, entry)
    catalog.save("embeddedudtfs", name, entry)
    statusDf("CREATE FUNCTION", name)
  }

  // the parameter list allows one paren-nesting level (DECIMAL(12,2))
  private val CreateEmbeddedFunctionStmt =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?FUNCTION\s+(\w+)\s*\(((?:[^()]|\([^()]*\))*)\)\s+RETURNS\s+([\w ,()\[\]0-9<>]+?)\s+LANGUAGE\s+(python|javascript|js)\s+AS\s+\$\$(.*?)\$\$\s*;?\s*""".r

  private val embeddedFns =
    scala.collection.mutable.Map[String, DurableCatalog.EmbeddedFnEntry]()

  private def registerEmbeddedFunction(name: String,
      e: DurableCatalog.EmbeddedFnEntry): Unit = {
    graft.functions.EmbeddedRegistration.scalar(spark, name, e.lang,
      e.body, e.argTypes.map(parseSqlType), parseSqlType(e.retType))
    embeddedFns(name) = e
  }

  private def createEmbeddedFunction(name: String, argSpec: String,
      retSpec: String, lang: String, body: String): DataFrame = {
    val entry = DurableCatalog.EmbeddedFnEntry(
      graft.functions.EmbeddedUdfRuntime.normalize(lang), body.trim,
      embeddedArgTypes(argSpec), parseSqlType(retSpec).sql)
    registerEmbeddedFunction(name, entry)
    catalog.save("embeddedfns", name, entry)
    statusDf("CREATE FUNCTION", name)
  }

  private def registerExternalFunction(name: String,
      e: DurableCatalog.ExternalFnEntry): Unit = {
    val argTypes = e.argTypes.map(parseSqlType)
    val retType = parseSqlType(e.retType)
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.plans.ExternalUdfCall].getName, name),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == argTypes.length,
          s"$name expects ${argTypes.length} argument(s), " +
            s"got ${children.length}")
        // arguments coerce to the declared parameter types (builders run
        // once children are resolved, so dataType is available)
        val coerced = children.zip(argTypes).map { case (c, t) =>
          if (c.resolved && c.dataType == t) c
          else org.apache.spark.sql.catalyst.expressions.Cast(c, t)
        }
        graft.plans.ExternalUdfCall(name, e.ident, e.link, argTypes,
          retType, coerced)
      })
    externalFns(name) = e
  }

  private def createExternalFunction(name: String, argSpec: String,
      retSpec: String, lang: String, ident: String, link: String): DataFrame = {
    val argTypes = SqlFrontend.splitTopLevel(argSpec, ',')
      .map(_.trim).filter(_.nonEmpty)
      .map { a =>
        // declared as "x BIGINT" or bare "BIGINT" — try the whole spec
        // as a type first so multi-word types (DOUBLE PRECISION) bind
        try parseSqlType(a).sql
        catch { case scala.util.control.NonFatal(_)
            if a.split("\\s+", 2).length == 2 =>
          parseSqlType(a.split("\\s+", 2)(1)).sql }
      }
    val entry = DurableCatalog.ExternalFnEntry(ident, link, argTypes,
      parseSqlType(retSpec).sql, Option(lang).map(_.toLowerCase))
    registerExternalFunction(name, entry)
    catalog.save("externalfns", name, entry)
    statusDf("CREATE FUNCTION", name)
  }

  /** Bulk-load a parsed batch into a table through the DML channel —
    * the pgwire COPY FROM STDIN landing point (reference:
    * handler/copy.rs routes COPY through the same DML plan as INSERT).
    * Columns absent from `rows` fill from their DEFAULT (or null) like
    * a narrow INSERT; all values cast to the stored schema. Returns
    * the loaded row count.
    */
  def copyInto(name0: String, rows: DataFrame): Long = {
    import org.apache.spark.sql.functions.col
    val name = resolveSchemas(name0) // COPY s.t arrives unresolved
    require(objAllowed(sessionUser, name, "INSERT"),
      s"permission denied for ${displayName(name)} (as $sessionUser)")
    val mv = mvs.get(name).getOrElse(throw new IllegalArgumentException(
      s"COPY: no such table $name"))
    val target = {
      val stored = mv.read().schema
      if (stored.nonEmpty) stored else tableSchemas.getOrElse(name, stored)
    }
    rows.columns.foreach(c => require(target.fieldNames.contains(c),
      s"COPY $name: no such column $c"))
    val filled = target.fields.filterNot(f => rows.columns.contains(f.name))
      .foldLeft(rows) { (d, f) => fillColumn(name, d, f) }
    val df = filled.select(target.fields.map(f =>
      col(f.name).cast(f.dataType)).toSeq: _*)
    val n = df.count()
    graft.operators.Dml.insertInto(mv, df)
    n
  }

  private val RefreshMvStmt =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\w+)\s*;?\s*""".r

  /** Full batch refresh of a fenced (non-streaming) MV: re-plan the
    * stored query, upsert the new image AND delete vanished keys (a
    * merge alone would leave rows whose PK left the result), under a
    * fresh epoch so chained/subscribed consumers see the change set.
    */
  private def refreshMvStatement(name: String): DataFrame = {
    val e = catalog.load[DurableCatalog.MvEntry]("mvs", name).getOrElse(
      throw new IllegalArgumentException(
        s"REFRESH MATERIALIZED VIEW: no such materialized view $name"))
    require(!e.streaming,
      s"REFRESH MATERIALIZED VIEW $name: continuously maintained — " +
        "nothing to refresh")
    val q = e.query.getOrElse(throw new IllegalArgumentException(
      s"REFRESH MATERIALIZED VIEW $name: no stored defining query"))
    bindMvTables(q)
    val result = spark.sql(Engine.rewritePgSelect(
      Engine.TemporalJoinClause.replaceAllIn(q, "")))
    val mv = mvs.get(name).getOrElse(mvs.define(name, e.pk, e.nBuckets))
    import graft.streaming.Changelog
    import org.apache.spark.sql.functions.{col => fcol, lit => flit}
    val old = mv.read()
    val upserts = result
      .withColumn(Changelog.OpCol, flit(Changelog.UpdateInsert))
      .withColumn(Changelog.SeqCol, flit(1L))
    val delta =
      if (old.columns.isEmpty) upserts
      else upserts.unionByName(
        old.join(result.select(e.pk.map(fcol): _*), e.pk, "left_anti")
          .withColumn(Changelog.OpCol, flit(Changelog.Delete))
          .withColumn(Changelog.SeqCol, flit(0L)))
    mv.synchronized { mv.merge(delta, mv.nextEpoch) }
    statusDf("REFRESH MATERIALIZED VIEW", name)
  }

  private val TxnStmt =
    """(?is)\s*(BEGIN|START\s+TRANSACTION|COMMIT|ABORT|ROLLBACK)(\s+READ\s+ONLY)?\s*;?\s*""".r
  private val ShowSinks = """(?is)\s*SHOW\s+SINKS\s*;?\s*""".r

  private val sinkNames = scala.collection.mutable.SortedSet[String]()

  // --- session variables (reference: handler/variable.rs — SET/SHOW/
  // RESET over the session config registry, src/common/src/session_config/).
  // Defaults mirror the reference's Postgres-compatible surface plus its
  // own rw_* knobs; `SHOW ALL` lists (name, setting, description) like
  // psql expects. Unknown names error with PG's exact message so driver
  // probes behave identically.
  private val SetTimeZoneStmt =
    """(?is)\s*SET\s+(?:SESSION\s+|LOCAL\s+)?TIME\s+ZONE\s+(.+?)\s*;?\s*""".r
  private val SetTransactionStmt =
    """(?is)\s*SET\s+(?:SESSION\s+CHARACTERISTICS\s+AS\s+)?TRANSACTION\s+.*""".r
  private val AlterSystemSet =
    """(?is)\s*ALTER\s+SYSTEM\s+SET\s+([A-Za-z_][\w.]*)\s*(?:=|\s+TO\s+)\s*(.+?)\s*;?\s*""".r
  private val AlterSystemReset =
    """(?is)\s*ALTER\s+SYSTEM\s+RESET\s+(ALL|[A-Za-z_][\w.]*)\s*;?\s*""".r
  private val SetVarStmt =
    """(?is)\s*SET\s+(?:SESSION\s+|LOCAL\s+)?([A-Za-z_][\w.]*)\s*(?:=|\s+TO\s+)\s*(.+?)\s*;?\s*""".r
  private val ResetVarStmt =
    """(?is)\s*RESET\s+(ALL|[A-Za-z_][\w.]*)\s*;?\s*""".r
  private val ShowVarStmt =
    """(?is)\s*SHOW\s+([A-Za-z_][\w.]*(?:\s+[A-Za-z_][\w.]*){0,2})\s*;?\s*""".r
  private val ShowParameters = """(?is)\s*SHOW\s+PARAMETERS\s*;?\s*""".r
  private val ShowInternalTables =
    """(?is)\s*SHOW\s+INTERNAL\s+TABLES\s*;?\s*""".r
  private val ShowDatabases = """(?is)\s*SHOW\s+DATABASES\s*;?\s*""".r
  private val ShowSchemas = """(?is)\s*SHOW\s+SCHEMAS\s*;?\s*""".r

  /** (default, description) per variable; insertion order = SHOW ALL order. */
  private val varDefaults: scala.collection.immutable.ListMap[String, (String, String)] =
    scala.collection.immutable.ListMap(
      "application_name" -> ("", "Sets the application name to be reported in statistics and logs."),
      "batch_parallelism" -> ("0", "Sets the parallelism for batch queries (0 = adaptive)."),
      "changelog_retention_epochs" -> ("0", "Trailing changelog epochs retained past the compaction frontier (time travel below it errors)."),
      // non-zero DEFAULT (the reference compacts by default —
      // src/storage/compactor/ runs unattended): an untended long-running
      // MV under default config keeps its changelog bounded at ~64 epochs
      // past the newest snapshot. 0 is the explicit opt-out.
      "changelog_snapshot_interval" -> ("64", "Compact each store's changelog into a snapshot checkpoint once it grows N epochs past its newest snapshot - continuously in the background at epoch publish, and at every FLUSH (0 = opt out; compaction then only on explicit VACUUM)."),
      "client_encoding" -> ("UTF8", "Sets the client's character set encoding."),
      "client_min_messages" -> ("notice", "Sets the message levels that are sent to the client."),
      "datestyle" -> ("ISO, MDY", "Sets the display format for date and time values."),
      "extra_float_digits" -> ("1", "Sets the number of digits displayed for floating-point values."),
      "idle_in_transaction_session_timeout" -> ("0", "Sets the maximum allowed idle time between queries, when in a transaction."),
      "intervalstyle" -> ("postgres", "Sets the display format for interval values."),
      "lock_timeout" -> ("0", "Sets the maximum allowed duration of any wait for a lock."),
      "query_mode" -> ("auto", "Selects batch/local execution mode for queries."),
      // Reference planner GUCs (src/common/src/session_config/mod.rs) —
      // accepted so reference scripts run unchanged (the nexmark suite
      // issues `SET rw_force_two_phase_agg = true` etc.). Advisory here:
      // Catalyst already provides the behavior each knob forces (every
      // aggregate plans two-phase with a map-side partial;
      // RewriteDistinctAggregates performs the distinct split; CBO/AQE
      // reorder joins), so accepting-and-reporting is the faithful
      // rendering, same as the reference treating them as hints its
      // optimizer may fold away.
      "rw_batch_enable_lookup_join" -> ("true", "Enables index lookup joins in batch queries (advisory: CREATE INDEX point-lookup rewrites apply when eligible)."),
      "rw_batch_enable_sort_agg" -> ("true", "Enables sort-based aggregation in batch queries (advisory: Catalyst picks hash vs sort aggregate)."),
      "rw_enable_join_ordering" -> ("true", "Enables join reordering (advisory: Catalyst CBO/AQE reorder)."),
      "rw_enable_share_plan" -> ("true", "Enables common sub-plan sharing (advisory: Catalyst reuses exchanges/subqueries)."),
      "rw_enable_two_phase_agg" -> ("true", "Enables two-phase aggregation (always on here: Spark aggregates plan a map-side partial)."),
      "rw_force_split_distinct_agg" -> ("false", "Forces the distinct-aggregate split rewrite (advisory: RewriteDistinctAggregates splits whenever distinct aggregates appear)."),
      "rw_force_two_phase_agg" -> ("false", "Forces two-phase aggregation (always satisfied: Spark aggregates plan a map-side partial)."),
      "rw_implicit_flush" -> ("false", "Flushes stream jobs after every DML statement, so reads observe the write."),
      "rw_streaming_enable_delta_join" -> ("true", "Enables delta joins for streaming MVs (advisory: the chain planner takes the delta-join path whenever the shape allows)."),
      "search_path" -> ("\"$user\", public", "Sets the schema search order for names that are not schema-qualified."),
      "server_encoding" -> ("UTF8", "Sets the server (database) character set encoding."),
      "server_version" -> ("14.0", "Shows the server version."),
      "server_version_num" -> ("140000", "Shows the server version as an integer."),
      "standard_conforming_strings" -> ("on", "Causes '...' strings to treat backslashes literally."),
      "statement_timeout" -> ("0", "Sets the maximum allowed duration of any statement."),
      "streaming_parallelism" -> ("ADAPTIVE", "Sets the parallelism for newly created streaming jobs."),
      "timezone" -> ("UTC", "Sets the time zone for displaying and interpreting time stamps."),
      "transaction_isolation" -> ("read committed", "Shows the current transaction's isolation level."))

  /** Variables psql/PG reject SET on (server-decided). */
  private val readOnlyVars =
    Set("server_version", "server_version_num", "server_encoding",
      "transaction_isolation")

  /** First-word SHOW forms that are statements, not variables — the
    * ShowVarStmt case must never swallow them. */
  private val showStatementWords =
    Set("tables", "materialized", "sources", "jobs", "sinks", "indexes",
      "aggregates", "subscriptions", "create", "columns", "databases",
      "schemas", "functions", "connections", "views", "cursors",
      "processlist", "parameters", "internal")

  // TrieMap, not mutable.Map: the background compactor thread reads
  // config through varValue (changelog_snapshot_interval & co.) while
  // the session thread SETs — the last cross-thread plain map from the
  // r8 advice sweep (r9 "what's wrong #5")
  private val sessionVars =
    new scala.collection.concurrent.TrieMap[String, String]()

  /** Instance-wide defaults set by `ALTER SYSTEM SET` (reference
    * handler/alter_system.rs; PG's postgresql.auto.conf layer): they sit
    * between a session's own SETs and the boot defaults, durable across
    * restarts. Concurrent for the same compactor-vs-session reason as
    * [[sessionVars]].
    */
  private val systemDefaults =
    new scala.collection.concurrent.TrieMap[String, String]()

  private def defaultOf(name: String): String =
    systemDefaults.getOrElse(name, varDefaults(name)._1)

  private def varValue(name: String): String =
    sessionVars.getOrElse(name, defaultOf(name))

  /** Normalize SHOW's spaced aliases to the canonical variable name. */
  private def canonicalVar(raw: String): String =
    raw.trim.toLowerCase.replaceAll("\\s+", " ") match {
      case "time zone" => "timezone"
      case "transaction isolation level" => "transaction_isolation"
      case "all" => "all"
      case w => w.replace(' ', '_')
    }

  /** SET's value surface: quoted strings unquote, bare words/numbers pass,
    * comma lists (search_path, datestyle) keep their text, DEFAULT resets. */
  private def parseVarValue(raw: String): Option[String] = {
    val t = raw.trim
    if (t.equalsIgnoreCase("DEFAULT")) None
    else Some(t.split(",").map { piece =>
      val p = piece.trim
      if (p.length >= 2 && p.startsWith("'") && p.endsWith("'"))
        p.substring(1, p.length - 1).replace("''", "'")
      else p
    }.mkString(", "))
  }

  /** The handful of variables with live engine behavior behind them. */
  private def applyVarBehavior(name: String, value: String): Unit = name match {
    case "timezone" =>
      // instant-preserving display/parse zone (Spark session-scoped conf)
      java.time.ZoneId.of(value) // validate before applying
      spark.conf.set("spark.sql.session.timeZone", value)
    case "streaming_parallelism" if value.matches("\\d+") && value.toInt > 0 =>
      // governs new streaming jobs: shuffle width AND the bucket count
      // of newly created stores (existing layouts are persisted per
      // object and never change under it — the reference's semantics
      // for ALTER-free parallelism changes)
      spark.conf.set("spark.sql.shuffle.partitions", value)
      mvs.defaultBuckets = math.min(value.toInt, 4096)
    case "streaming_parallelism" => // ADAPTIVE/default: restore
      mvs.defaultBuckets = 32
    case "batch_parallelism" if value.matches("\\d+") && value.toInt > 0 =>
      spark.conf.set("spark.sql.shuffle.partitions", value)
    case _ => ()
  }

  private def setVariable(rawName: String, rawValue: String): DataFrame = {
    val name = canonicalVar(rawName)
    require(varDefaults.contains(name),
      s"unrecognized configuration parameter \"$name\"")
    require(!readOnlyVars.contains(name),
      s"parameter \"$name\" cannot be changed")
    parseVarValue(rawValue) match {
      case Some(v) =>
        val norm = name match {
          // PG normalizes booleans; the reference does too
          case "rw_implicit_flush" | "standard_conforming_strings" =>
            if (Set("on", "true", "1", "yes", "t").contains(v.toLowerCase)) "true"
            else "false"
          case _ => v
        }
        applyVarBehavior(name, norm)
        sessionVars(name) = norm
      case None =>
        sessionVars.remove(name)
        applyVarBehavior(name, defaultOf(name))
    }
    statusDf("SET", name)
  }

  private def showVariable(name: String): DataFrame = {
    import spark.implicits._
    require(varDefaults.contains(name),
      s"unrecognized configuration parameter \"$name\"")
    Seq(varValue(name)).toDF(name)
  }

  private def showAllVariables(): DataFrame = {
    import spark.implicits._
    varDefaults.toSeq
      .map { case (n, (_, desc)) => (n, varValue(n), desc) }
      .toDF("name", "setting", "description")
  }

  private def implicitFlushEnabled: Boolean =
    varValue("rw_implicit_flush") == "true"

  /** Public read of one session variable (pgwire's ParameterStatus
    * reporting); None for unknown names. */
  /** Install one connection's session-variable state (reference: each
    * pgwire session owns its config — src/common/src/session_config/).
    * Diff-applied through [[setVariable]]-equivalent behavior hooks so
    * live knobs (timezone, shuffle width, implicit flush) follow the
    * connection that is about to execute.
    */
  private[graft] def installSessionVars(vars: Map[String, String]): Unit = {
    val live = sessionVars.toMap
    if (live == vars) return
    (live.keySet -- vars.keySet).foreach { n =>
      sessionVars.remove(n)
      applyVarBehavior(n, defaultOf(n))
    }
    vars.foreach { case (n, v) =>
      if (!live.get(n).contains(v)) {
        sessionVars(n) = v
        applyVarBehavior(n, v)
      }
    }
  }

  /** Snapshot of the non-default session variables (per-connection
    * save/restore around each pgwire statement).
    */
  private[graft] def snapshotSessionVars(): Map[String, String] =
    sessionVars.toMap

  def sessionVariable(name: String): Option[String] =
    Some(canonicalVar(name)).filter(varDefaults.contains).map(varValue)

  /** Drain every stream job in chain-depth order (FLUSH's body).
    * Temporal-filter MVs evict aged rows right after their own drain —
    * the delete epochs land before deeper chained MVs drain, so one
    * pass settles eviction retractions through the whole chain. */
  private def drainAllJobs(): Unit =
    jobs.toSeq.sortBy { case (n, _) => chainDepth.getOrElse(n, 0) }
      .foreach { case (n, j) =>
        j.processAllAvailable()
        if (temporalFilters.contains(n)) evictTemporal(n)
      }

  // --- changelog compaction (reference: Hummock checkpoint + compaction
  // + vacuum, docs/dev/src/design/state-store-overview.md,
  // src/storage/compactor/, src/meta/src/hummock/): periodic snapshot
  // checkpoints bound each store's changelog to O(table + retained
  // epochs) instead of O(lifetime history), and AS-OF reads to
  // O(epochs-since-snapshot). The reference compacts continuously in the
  // background; here the deterministic quiescent point right after a
  // full drain (FLUSH / VACUUM) plays that role, which is also what
  // makes expiry safe for chained subscribers (see retentionFrontier).

  /** The newest epoch of `internalName`'s store that may be compacted
    * away: min(latest − changelog_retention_epochs, oldest unconsumed
    * subscription-cursor position). A cursor's position is the epoch it
    * has consumed THROUGH (a partially-fetched epoch pins the position
    * just below itself), so expiring at or below the minimum never drops
    * an unconsumed epoch. Chained-MV subscribers are file-stream
    * checkpoints that never re-request files they have logged; callers
    * compact only at quiescence (after a full drain), where every
    * published file is logged. A subscription with no declared cursor
    * pins nothing — like the reference, where subscription retention is
    * its own time-based budget, a consumer that has not started reading
    * is not a reason to hold history forever; a later FULL cursor
    * replays the RETAINED log.
    */
  private def retentionFrontier(internalName: String): Long = {
    val mv = mvs.get(internalName).getOrElse(return -1L)
    val latest = mv.latestChangelogBatchId
    if (latest < 0) return -1L
    val retain = math.max(
      varValue("changelog_retention_epochs").toLongOption.getOrElse(0L), 0L)
    val subNames =
      subscriptions.collect { case (s, m) if m == internalName => s }.toSet
    val cursorMin = cursors.values
      .collect { case (s, pos) if subNames(s) => pos }
      .minOption.getOrElse(Long.MaxValue)
    math.min(latest - retain, cursorMin)
  }

  /** FLUSH-time automatic compaction, enabled by
    * `changelog_snapshot_interval` > 0: any store whose changelog grew
    * at least that many epochs past its newest snapshot is checkpointed
    * at its retention frontier and its history below expired. Called
    * only right after [[drainAllJobs]] (the quiescence contract above).
    */
  private def autoCompactStores(): Unit = {
    val interval =
      varValue("changelog_snapshot_interval").toLongOption.getOrElse(0L)
    if (interval <= 0) return
    mvs.list.foreach { n =>
      mvs.get(n).foreach { mv =>
        compactionGate.synchronized {
          val frontier = retentionFrontier(n)
          if (frontier > mv.latestSnapshotEpoch &&
              mv.latestChangelogBatchId - mv.latestSnapshotEpoch >= interval)
            mv.compactTo(frontier)
        }
      }
    }
  }

  // --- continuous background compaction (reference: the compactor runs
  // in the background, src/storage/compactor/ — not only at barriers).
  // Every epoch publication enqueues a check; a store whose changelog
  // has grown `changelog_snapshot_interval` epochs past its newest
  // snapshot is compacted on a dedicated daemon thread WITHOUT waiting
  // for a FLUSH, so an untended long-running MV's history stays bounded.
  // The FLUSH-path quiescence contract is localized per store: before
  // expiring, the task drains exactly this store's transitive DOWNSTREAM
  // tails (they are the only readers of the epochs being expired), with
  // the frontier capped at the epoch count captured before the drain —
  // everything the drain delivers is at or below that cap, so a chained
  // subscriber can never lose an unconsumed epoch. Subscription cursors
  // re-pin the frontier at compaction time as on the FLUSH path.
  private val compactorPending =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val compactorExec =
    java.util.concurrent.Executors.newSingleThreadExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-background-compactor")
        t.setDaemon(true)
        t
      })

  private def maybeBackgroundCompact(name: String, epoch: Long): Unit = {
    val interval =
      varValue("changelog_snapshot_interval").toLongOption.getOrElse(0L)
    if (interval <= 0) return
    val quick = mvs.get(name).getOrElse(return)
    if (epoch - quick.latestSnapshotEpoch < interval) return
    if (!compactorPending.add(name)) return // a pass is already queued
    compactorExec.submit(new Runnable {
      def run(): Unit =
        try {
          mvs.get(name).foreach { mv =>
            val latest0 = mv.latestChangelogBatchId
            downstreamOf(name)
              .foreach(d => jobs.get(d).foreach(_.processAllAvailable()))
            // frontier re-read + expiry under the gate: a cursor
            // declared after the drain cannot lose epochs (advice r8)
            compactionGate.synchronized {
              val frontier = math.min(retentionFrontier(name), latest0)
              if (frontier > mv.latestSnapshotEpoch) mv.compactTo(frontier)
            }
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            // derived-data maintenance: safe to skip, retried on the
            // next interval-crossing publication (or FLUSH/VACUUM)
            System.err.println(
              s"[graft] background compaction of $name skipped: " +
                e.getMessage)
        } finally compactorPending.remove(name)
    })
  }

  // wire the enqueue into every store this catalog defines
  mvs.onEpochPublished = maybeBackgroundCompact

  // --- subscriptions / cursors (reference: CREATE SUBSCRIPTION +
  // DECLARE … SUBSCRIPTION CURSOR + FETCH, handler/create_subscription.rs
  // and session/cursor_manager.rs): a pull-based reader over an MV's
  // epoch-published changelog. The cursor holds only a frontier batch id.
  // concurrent (compactor-read, see jobs above); NEW cursor pins are
  // additionally serialized against frontier computation through
  // `compactionGate` so a compaction can never expire epochs a cursor
  // declared mid-pass still needs (advice r8)
  private val subscriptions = scala.collection.concurrent.TrieMap[String, String]()
  private val cursors = scala.collection.concurrent.TrieMap[String, (String, Long)]()
  private val compactionGate = new Object

  private val CreateSubscription =
    """(?is)\s*CREATE\s+SUBSCRIPTION\s+(\w+)\s+FROM\s+(\w+)\s*(?:WITH\s*\(.*?\))?\s*;?\s*""".r
  private val DropSubscription =
    """(?is)\s*DROP\s+SUBSCRIPTION\s+(\w+)\s*;?\s*""".r
  private val ShowCursorsStmt =
    """(?is)\s*SHOW\s+(SUBSCRIPTION\s+)?CURSORS\s*;?\s*""".r
  private val ShowSubscriptions =
    """(?is)\s*SHOW\s+SUBSCRIPTIONS\s*;?\s*""".r
  private val DeclareCursor =
    ("""(?is)\s*DECLARE\s+(\w+)\s+SUBSCRIPTION\s+CURSOR\s+FOR\s+(\w+)""" +
      """\s*(FULL|SINCE\s+begin\s*\(\s*\)|SINCE\s+now\s*\(\s*\)|SINCE\s+\d+)?""" +
      """\s*;?\s*""").r
  /** Batch query cursor (reference: handler/declare_cursor.rs
    * `handle_declare_query_cursor`) — the Postgres pagination contract
    * psql's FETCH_COUNT and pgjdbc's setFetchSize ride on.
    */
  private val DeclareQueryCursor =
    """(?is)\s*DECLARE\s+(\w+)\s+CURSOR\s+FOR\s+((?:SELECT|WITH|VALUES)\s.*?)\s*;?\s*""".r
  private val FetchCursor =
    """(?is)\s*FETCH\s+(?:(NEXT|ALL|\d+|FORWARD\s+ALL|FORWARD\s+\d+)\s+)?(?:FROM\s+|IN\s+)?(\w+)\s*;?\s*""".r
  private val CloseCursor =
    """(?is)\s*CLOSE\s+(\w+)\s*;?\s*""".r

  /** Open query cursors: result schema + a partition-lazy row iterator.
    * Session-scoped like the reference's cursor manager (not durable);
    * `toLocalIterator` keeps only one partition in driver memory however
    * large the result.
    */
  private val queryCursors = scala.collection.mutable
    .Map[String, (org.apache.spark.sql.types.StructType,
      java.util.Iterator[org.apache.spark.sql.Row])]()

  /** FETCH from a batch query cursor: the next `n` unread rows (empty
    * frame once exhausted, like Postgres).
    */
  private def fetchQueryCursor(cur: String, count: String): DataFrame = {
    val (schema, it) = queryCursors(cur)
    val spec = Option(count).map(_.toUpperCase.replace("FORWARD", "").trim)
      .getOrElse("NEXT")
    val n = spec match {
      case "NEXT" => 1L
      case "ALL" => Long.MaxValue
      case d => d.toLong
    }
    val rows = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    while (rows.length < n && it.hasNext) rows += it.next()
    spark.createDataFrame(java.util.Arrays.asList(rows.toArray: _*), schema)
  }

  /** Rows already consumed within the first pending epoch per cursor
    * (row-limited FETCH pagination; durable via CursorEntry.skip). */
  private val cursorSkip = scala.collection.mutable.Map[String, Long]()

  /** FETCH: changelog rows past the cursor's frontier, ordered by
    * (epoch, seq, row image) — each row one change with its `_op`.
    * Non-blocking: an up-to-date cursor returns an empty frame.
    * `FETCH <n>` (reference: session/cursor_manager.rs fetch with count)
    * delivers exactly n rows and persists an intra-epoch offset, so a
    * client can drain a large epoch in bounded pages; NEXT/ALL keep
    * delivering everything pending. The offset always addresses the
    * FIRST pending epoch — a partially-consumed epoch pins `pos` just
    * below itself, and epoch ids only grow.
    */
  private def fetchCursor(cur: String, countSpec: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (sub, pos) = cursors.getOrElse(cur,
      throw new IllegalArgumentException(s"unknown cursor $cur"))
    val skip = cursorSkip.getOrElse(cur, 0L)
    val mvName = subscriptions(sub)
    val mv = mvs.get(mvName).get
    val (df, frontier) = mv.changelogAfter(pos)
    val n = Option(countSpec).map(_.toUpperCase.replace("FORWARD", "").trim)
      .filter(_.forall(_.isDigit)).filter(_.nonEmpty).map(_.toLong)
    if (df.columns.isEmpty) {
      cursors(cur) = (sub, frontier)
      catalog.save("cursors", cur,
        DurableCatalog.CursorEntry(sub, frontier, Some(skip)))
      return df
    }
    // deterministic total order: epoch, seq, then the full row image
    // (an UPDATE epoch reuses seq 0/1 across its U-/U+ rows)
    val ordered = df.orderBy(
      (Seq("_epoch", graft.streaming.Changelog.SeqCol) ++
        df.columns.filterNot(Seq("_epoch",
          graft.streaming.Changelog.SeqCol).contains)).map(col): _*)
    n match {
      case None => // NEXT / ALL: everything pending (minus any offset)
        cursors(cur) = (sub, frontier)
        cursorSkip.remove(cur)
        catalog.save("cursors", cur, DurableCatalog.CursorEntry(sub, frontier))
        if (skip > 0) ordered.offset(skip.toInt) else ordered
      case Some(count) =>
        // epoch sizes drive the (pos, skip) advance — small aggregate,
        // no row collect; delivery itself stays a lazy offset+limit
        val sizes = df.groupBy(col("_epoch")).count()
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        val total = sizes.map(_._2).sum
        val consumed = math.min(skip + count, total)
        // walk fully-consumed epochs IN ORDER and stop at the first
        // partial one — the leftover becomes its intra-epoch offset
        var acc = 0L
        var newPos = pos
        var partial = false
        sizes.foreach { case (ep, sz) =>
          if (!partial) {
            if (acc + sz <= consumed) { acc += sz; newPos = ep }
            else partial = true
          }
        }
        var newSkip = consumed - acc
        if (consumed == total) { newPos = frontier; newSkip = 0L }
        cursors(cur) = (sub, newPos)
        if (newSkip > 0) cursorSkip(cur) = newSkip else cursorSkip.remove(cur)
        catalog.save("cursors", cur,
          DurableCatalog.CursorEntry(sub, newPos, Some(newSkip)))
        ordered.offset(skip.toInt).limit(count.toInt)
    }
  }

  /** `CREATE SINK s AS <query> WITH (…)` (reference: handler/
    * create_sink.rs — FROM-relation and AS-query bind the same way):
    * materialize the query as a hidden internal MV `<s>__sinkq` through
    * the ordinary CREATE MV path — it chains incrementally whenever the
    * query shape allows — then sink its changelog. The PK comes from
    * the `primary_key` option, the reference's downstream_pk
    * requirement for upsert sinks over queries.
    */
  private def startSinkFromQuery(d: SqlFrontend.SinkQueryDef): DataFrame = {
    val pk = d.options.getOrElse("primary_key",
      throw new IllegalArgumentException(s"CREATE SINK ${d.name} AS " +
        "<query> requires primary_key = 'c1[, c2…]'"))
    val internal = s"${d.name}__sinkq"
    execute(s"CREATE MATERIALIZED VIEW $internal (PRIMARY KEY ($pk)) " +
      s"AS ${d.query}")
    startSink(SqlFrontend.SinkDef(d.name, internal, d.options))
  }

  /** `CREATE SINK s FROM mv WITH (path='…', format='…')`: subscribe to
    * the MV's changelog channel, encode each delta (Debezium envelope /
    * upsert tombstones / plain JSON), and append to the sink path as one
    * payload line per change — the reference's sink executor semantics
    * (changelog in, encoded stream out; reference:
    * src/stream/src/executor/sink.rs:42).
    */
  private def startSink(d: SqlFrontend.SinkDef): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.sources.Formats
    import graft.streaming.Changelog
    val mv = mvs.get(d.from).getOrElse(throw new IllegalArgumentException(
      s"CREATE SINK ${d.name}: unknown materialized view ${d.from}"))
    // restart/recovery may find a torn metadata-log temp from a crash
    sanitizeCheckpoint(s"$warehouseDir/sinks/${d.name}/checkpoint")
    // external-database sink (reference: src/connector/src/sink/jdbc.rs
    // — upsert / append-only delivery into an existing remote table)
    if (d.options.get("connector").contains("jdbc")) {
      val url = resolveSecretRefs(d.options.getOrElse("jdbc.url",
        throw new IllegalArgumentException(
          "CREATE SINK connector='jdbc' requires jdbc.url = '…'")))
      val tbl = d.options.getOrElse("table.name", d.from)
      val upsert =
        d.options.getOrElse("type", "upsert").toLowerCase != "append-only"
      val sinkPk = d.options.get("primary_key")
        .map(_.split(",").map(_.trim).toSeq).getOrElse(mv.primaryKey)
      val q = mv.changelogStream().writeStream
        .option("checkpointLocation",
          s"$warehouseDir/sinks/${d.name}/checkpoint")
        .foreachBatch((b: DataFrame, _: Long) =>
          graft.sources.JdbcSink.applyEpoch(b, sinkPk, url, tbl, upsert))
        .start()
      jobs(d.name) = q
      // FLUSH order: the sink drains after the MV feeding it
      chainDepth(d.name) = chainDepth.getOrElse(d.from, 0) + 1
      sinkNames += d.name
      catalog.save("sinks", d.name, DurableCatalog.SinkEntry(d.from, d.options))
      return statusDf("CREATE SINK", d.name)
    }
    val path = d.options.getOrElse("path", throw new IllegalArgumentException(
      "CREATE SINK requires path = '…'"))
    val stream = mv.changelogStream()
    val encoded = d.options.getOrElse("format", "debezium").toLowerCase match {
      case "debezium" => Formats.encodeDebezium(stream)
      case "upsert" =>
        Formats.encodeUpsert(stream, mv.primaryKey)
          .select(to_json(struct(col("key"), col("value"))).as("value"))
      case "json" => // append-only plain payloads: adds only
        val dataCols = stream.columns
          .filterNot(Seq(Changelog.OpCol, Changelog.SeqCol).contains)
        stream.where(Changelog.isAdd(col(Changelog.OpCol)))
          .select(to_json(struct(dataCols.map(col): _*)).as("value"))
      case other =>
        throw new IllegalArgumentException(s"CREATE SINK format '$other' " +
          "not supported (debezium | upsert | json)")
    }
    val q = encoded.writeStream.format("text")
      .option("path", path)
      .option("checkpointLocation", s"$warehouseDir/sinks/${d.name}/checkpoint")
      .start()
    jobs(d.name) = q
    sinkNames += d.name
    catalog.save("sinks", d.name, DurableCatalog.SinkEntry(d.from, d.options))
    statusDf("CREATE SINK", d.name)
  }

  /** `CREATE MATERIALIZED VIEW … AS SELECT …, f() OVER (PARTITION BY …)`
    * on a STREAMING source — the reference's StreamOverWindow
    * (src/stream/src/executor/over_window/general.rs). Structured
    * Streaming rejects non-time windows outright, so the maintenance
    * loop is [[graft.streaming.IncrementalOver]]: each micro-batch delta
    * merges into a base MV and recomputes only the touched partitions
    * (frame-granular when the plan's RANGE frames are bounded). The
    * window query itself is re-planned per batch as BATCH SQL over the
    * base table — identical semantics to running it on the full input.
    */
  private def createOverMv(name: String, pk: Seq[String], query: String,
      resume: Boolean = false): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical
    val srcName = sources.keys.find(sn =>
      java.util.regex.Pattern.compile(s"(?i)\\b$sn\\b").matcher(query).find())
      .getOrElse(throw new IllegalArgumentException(
        s"CREATE MATERIALIZED VIEW $name: OVER-window MV requires a " +
          "registered streaming source in FROM"))
    val stream = sources(srcName)
    val tmp = s"__${name}_over_base"
    val windowFn: DataFrame => DataFrame = df => {
      df.createOrReplaceTempView(tmp)
      retargetRelations(query, Map(srcName -> tmp))
    }
    // window partition columns from the analyzed plan (drives bucket
    // layout + touched-partition pruning)
    val emptyBase = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stream.schema)
    val partCols = Engine.commonOverPartitionCols(
      windowFn(emptyBase).queryExecution.analyzed).getOrElse(
      throw new IllegalArgumentException(
        s"CREATE MATERIALIZED VIEW $name: streaming OVER requires a common " +
          "attribute PARTITION BY across every window (an unpartitioned or " +
          "expression-partitioned window cannot be maintained incrementally)"))
    // The base copy holds SOURCE rows; a bare CREATE SOURCE declares no
    // PK, so full-row identity keys it — keying by the downstream MV's
    // pk would collapse each partition to one arbitrary row whenever
    // the declared pk is narrower than the source's row identity (the
    // group-top-1 shape; see the chained variant below).
    val baseMv = mvs.define(s"${name}__base",
      stream.schema.fieldNames.toSeq, bucketKeys = partCols)
    val resultMv = mvs.define(name, pk, bucketKeys = partCols)
    val iow = new graft.streaming.IncrementalOver(
      baseMv, resultMv, partCols, windowFn, pk)
    val q = stream.writeStream
      .option("checkpointLocation", mvs.checkpointDir(name))
      .foreachBatch((batch: DataFrame, _: Long) => iow.applyDelta(batch))
      .start()
    jobs(name) = q
    if (!resume)
      catalog.save("mvs", name, DurableCatalog.MvEntry(
        pk, Some(query), streaming = true, "update", resultMv.nBuckets, over = Some(true)))
    statusDf("CREATE MATERIALIZED VIEW (streaming over-window)", name)
  }

  /** SQL entry point — the reference's `run_statement`
    * (src/frontend/src/session.rs:1168):
    *
    *  - `CREATE SOURCE name (…) WITH (path='…')`: registers a streaming
    *    file source (plus optional `WATERMARK FOR c AS c - INTERVAL '…'`)
    *    as a streaming temp view — what the SELECT of a downstream MV
    *    reads decides whether that MV streams;
    *  - `CREATE MATERIALIZED VIEW name (PRIMARY KEY (…)) AS SELECT …`:
    *    plans the SELECT; a streaming plan starts the incremental
    *    maintenance job ([[createMaterializedView]]); a batch plan
    *    materializes once ([[refreshMaterializedView]]). The PRIMARY KEY
    *    clause is REQUIRED: silently guessing a PK would make the merge
    *    dedup arbitrary rows (silent data loss);
    *  - `WITH RECURSIVE …`: driver-side fixpoint
    *    ([[SqlFrontend.executeRecursive]]);
    *  - `DROP MATERIALIZED VIEW` / `SHOW MATERIALIZED VIEWS`;
    *  - anything else: Spark SQL.
    */
  /** Scan-rewriting table functions in SQL text — the reference lowers
    * `file_scan(...)` / `postgres_query(...)` / `mysql_query(...)` TVFs
    * to scans before planning (reference: src/frontend/src/optimizer/
    * rule/table_function_to_file_scan_rule.rs and siblings). Here each
    * call site binds to a temp view backed by the corresponding Spark
    * relation: `file_scan('<format>', '<path>')` → `spark.read`, and
    * `jdbc_query('<jdbc-url>', '<sql>')` → [[graft.sources.Jdbc.query]]
    * (the engine-neutral spelling of postgres_query/mysql_query — the
    * url carries the dialect).
    */
  private val JdbcQueryTvf =
    """(?i)\bjdbc_query\s*\(\s*'([^']*)'\s*,\s*'([^']*)'\s*\)""".r
  private val FileScanTvf =
    """(?i)\bfile_scan\s*\(\s*'([^']*)'\s*,\s*'([^']*)'\s*\)""".r
  // Time-window TVFs (reference: src/frontend/src/binder/relation/
  // table_function.rs binds TUMBLE/HOP in FROM position; assignment is
  // src/expr/impl/src/scalar/tumble.rs and hop_window.rs). Lowered to a
  // derived table over Spark's `window()` — the same operator the
  // streaming MVs aggregate over, so a windowed aggregate over a
  // streaming MV chains through the generate-mode agg path (the group
  // key `window_start` is born inside the window assignment).
  // Both interval spellings bind: `INTERVAL '10 minutes'` and the PG
  // unit-outside form the reference's own suites use
  // (`INTERVAL '10' SECOND`, ci/scripts/sql/nexmark/q12.sql)
  private val IvalRe = """INTERVAL\s+'([^']+)'(?:\s+(\w+))?"""
  private val TumbleTvf =
    s"""(?i)\\bTUMBLE\\s*\\(\\s*(\\w+)\\s*,\\s*(\\w+)\\s*,\\s*$IvalRe\\s*(?:,\\s*$IvalRe\\s*)?\\)""".r
  private val HopTvf = // HOP(rel, col, slide, size) — reference arg order
    s"""(?i)\\bHOP\\s*\\(\\s*(\\w+)\\s*,\\s*(\\w+)\\s*,\\s*$IvalRe\\s*,\\s*$IvalRe\\s*\\)""".r

  /** Join an interval's quoted body with its optional outside unit. */
  private def ival(value: String, unit: String): String =
    Option(unit).fold(value)(u => s"$value $u")
  // jsonb_to_record[set](expr) AS alias(col type, …) — the arg tolerates
  // one paren-nesting level and quoted strings; the column list tolerates
  // parenthesized type args (DECIMAL(10,2))
  private val JsonbRecordTvf =
    ("""(?i)(,\s*)?\bjsonb_to_record(set)?\s*\(""" +
      """((?:[^()']|'(?:[^']|'')*'|\([^()]*\))*)\)\s+""" +
      """(?:AS\s+)?([A-Za-z_]\w*)\s*\(((?:[^()]|\([^()]*\))*)\)""").r
  // _pg_expandarray(arr) [AS alias[(x, n)]] — value + 1-based index
  private val PgExpandArrayTvf =
    ("""(?i)(,\s*)?\b_pg_expandarray\s*\(""" +
      """((?:[^()']|'(?:[^']|'')*'|\([^()]*\))*)\)""" +
      """(?:\s+(?:AS\s+)?(?!WHERE\b|GROUP\b|ORDER\b|LIMIT\b|ON\b|JOIN\b|UNION\b|EXCEPT\b|INTERSECT\b|EMIT\b|LEFT\b|RIGHT\b|INNER\b|CROSS\b)([A-Za-z_]\w*)""" +
      """(?:\s*\(\s*([A-Za-z_]\w*)\s*,\s*([A-Za-z_]\w*)\s*\))?)?""").r
  private val PgGetKeywordsTvf =
    """(?i)\bpg_get_keywords\s*\(\s*\)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?""".r
  private var tvfCounter = 0

  private def windowedRelation(rel: String, col: String,
      windowArgs: Seq[String], keepStruct: Boolean): String = {
    tvfCounter += 1
    val w = s"__gtw_$tvfCounter"
    val call = (s"`$col`" +: windowArgs.map(a => s"'$a'")).mkString(", ")
    // keepStruct: the raw window struct stays an (internal-named) output
    // column — EMIT ON WINDOW CLOSE plans in append mode, and only the
    // struct carries the event-time watermark metadata append-mode
    // aggregation requires (extracting `.start` drops it); the GROUP BY
    // gains the struct alongside the user's window_start (same groups)
    val keep = if (keepStruct) s", $w" else ""
    s"(SELECT * EXCEPT ($w), $w.start AS window_start, " +
      s"$w.end AS window_end$keep FROM (SELECT *, window($call) AS $w FROM $rel))"
  }

  private def rewriteTvfs(stmt: String): String = {
    var out = JdbcQueryTvf.replaceAllIn(stmt, m => {
      tvfCounter += 1
      val v = s"__jdbc_tvf_$tvfCounter"
      graft.sources.Jdbc.query(spark, resolveSecretRefs(m.group(1)),
          m.group(2))
        .createOrReplaceTempView(v)
      v
    })
    out = FileScanTvf.replaceAllIn(out, m => {
      tvfCounter += 1
      val v = s"__file_scan_$tvfCounter"
      spark.read.format(m.group(1).toLowerCase).load(m.group(2))
        .createOrReplaceTempView(v)
      v
    })
    // jsonb_to_record / jsonb_to_recordset (reference: src/expr/impl/
    // src/scalar/jsonb_record.rs) — the PG `AS alias(col type, …)`
    // column-definition form binds to Spark's inline(from_json(…)):
    // comma-joined after a relation → LATERAL VIEW (arg may reference
    // the outer row); sole FROM item → an aliased subquery (literal
    // arg). jsonb_populate_record needs named composite TYPES, which
    // this engine does not model (documented divergence).
    out = JsonbRecordTvf.replaceAllIn(out, m => {
      val lateral = m.group(1) != null
      val isSet = m.group(2) != null
      val arg = m.group(3).trim
      val alias = m.group(4)
      val cols = SqlFrontend.splitTopLevel(m.group(5), ',')
        .map(_.trim).filter(_.nonEmpty).map { c =>
          val sp = c.indexOf(' ')
          require(sp > 0, s"jsonb_to_record: malformed column def '$c'")
          org.apache.spark.sql.types.StructField(c.substring(0, sp).trim,
            SqlFrontend.sqlType(c.substring(sp + 1)))
        }
      val struct = org.apache.spark.sql.types.StructType(cols)
      val gen =
        if (isSet)
          s"inline(from_json($arg, '${org.apache.spark.sql.types.ArrayType(struct).catalogString}'))"
        else s"inline(array(from_json($arg, '${struct.catalogString}')))"
      java.util.regex.Matcher.quoteReplacement(
        if (lateral) s" LATERAL VIEW $gen $alias AS ${cols.map(_.name).mkString(", ")}"
        else s"(SELECT $gen) $alias")
    })
    // _pg_expandarray (reference table_function/pg_expandarray.rs — PG's
    // information_schema helper): one row per element, 1-based index.
    // Lowered to inline(transform(arr, (x, i) -> struct)) — the indexed
    // lambda keeps empty/null arrays at zero rows.
    out = PgExpandArrayTvf.replaceAllIn(out, m => {
      val lateral = m.group(1) != null
      val arg = m.group(2).trim
      val alias = Option(m.group(3)).getOrElse {
        tvfCounter += 1; s"__pgexp_$tvfCounter" }
      val cx = Option(m.group(4)).getOrElse("x")
      val cn = Option(m.group(5)).getOrElse("n")
      val gen = s"inline(transform($arg, (__x, __i) -> " +
        s"named_struct('$cx', __x, '$cn', __i + 1)))"
      java.util.regex.Matcher.quoteReplacement(
        if (lateral) s" LATERAL VIEW $gen $alias AS $cx, $cn"
        else s"(SELECT $gen) $alias")
    })
    // pg_get_keywords() (reference table_function/pg_get_keywords.rs —
    // derives from ITS parser's keyword list): derive from Spark's own
    // sql_keywords() TVF the same way. Uncorrelated, so the subquery
    // form works both sole-FROM and comma-joined.
    out = PgGetKeywordsTvf.replaceAllIn(out, m => {
      val alias = Option(m.group(1)).getOrElse {
        tvfCounter += 1; s"__pgkw_$tvfCounter" }
      java.util.regex.Matcher.quoteReplacement(
        "(SELECT lower(keyword) AS word, " +
          "CASE WHEN reserved THEN 'R' ELSE 'U' END AS catcode, " +
          "CASE WHEN reserved THEN 'reserved' ELSE 'unreserved' END AS catdesc " +
          s"FROM sql_keywords()) $alias")
    })
    val eowc = "(?i)EMIT\\s+ON\\s+WINDOW\\s+CLOSE".r.findFirstIn(out).isDefined
    var lastW: Option[String] = None
    out = TumbleTvf.replaceAllIn(out, m => {
      val size = ival(m.group(3), m.group(4))
      val r = windowedRelation(m.group(1), m.group(2),
        // optional 4th arg = window offset → window(col, size, size, off)
        Option(m.group(5)).fold(Seq(size))(off =>
          Seq(size, size, ival(off, m.group(6)))), keepStruct = eowc)
      lastW = Some(s"__gtw_$tvfCounter")
      java.util.regex.Matcher.quoteReplacement(r)
    })
    out = HopTvf.replaceAllIn(out, m => {
      val r = windowedRelation(m.group(1), m.group(2),
        Seq(ival(m.group(5), m.group(6)), ival(m.group(3), m.group(4))),
        keepStruct = eowc)
      lastW = Some(s"__gtw_$tvfCounter")
      java.util.regex.Matcher.quoteReplacement(r)
    })
    if (eowc) lastW.foreach { w =>
      out = out.replaceFirst("(?i)\\bGROUP\\s+BY\\b", s"GROUP BY $w,")
    }
    out
  }

  /** Bind every engine-managed table/MV the statement mentions as a
    * fresh temp view, so plain Spark SQL (the fall-through branch, CREATE
    * MV/VIEW bodies, INSERT … SELECT sources) resolves them. Re-bound per
    * statement because MV merges rewrite the backing files — a view
    * created once would pin a stale file listing. Registration is
    * metadata-only (no materialization).
    */
  private def bindMvTables(stmt: String): Unit = {
    // `_row_id` is hidden from star expansion but explicitly addressable
    // (reference: ColumnCatalog::row_id_column is_hidden — q13-by-row-id
    // joins on mod(_row_id, n)): a statement that names it binds views
    // WITH the column, every other statement gets the starred shape
    // SQL identifiers are case-insensitive and the probe must not fire
    // on the name inside a string literal (WHERE s = '_row_id'):
    // word-bounded match over the statement with quoted literals blanked
    val wantsRowId = java.util.regex.Pattern
      .compile(s"(?i)\\b${Engine.RowIdCol}\\b")
      .matcher(stmt.replaceAll("'[^']*'", "''")).find()
    mvs.list.foreach { n =>
      if (java.util.regex.Pattern.compile(s"(?i)\\b$n\\b").matcher(stmt).find()) {
        val df =
          if (wantsRowId && hiddenRowIdTables.contains(n))
            table(n, keepRowId = true)
          else table(n)
        df.createOrReplaceTempView(n)
      }
    }
  }

  // ------------------------------------------------- batch time travel
  //
  // Reference: `FOR SYSTEM_TIME AS OF` on batch scans
  // (src/frontend/src/binder/relation/mod.rs:353-425 — binds an epoch,
  // a timestamp, or a now()-relative expression). Here the historical
  // image reconstructs from the epoch-complete changelog
  // (MaterializedView.imageAt) and binds as a temp view standing in for
  // the relation, so the surrounding query plans unchanged.

  private val AsOfScanRe =
    ("""(?i)\b([A-Za-z_]\w*)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+""" +
      """(?:(\d+)|'([^']+)'|now\s*\(\s*\)\s*-\s*interval\s+'([^']+)'\s*((?!(?i:AS)\b)[A-Za-z]*))""" +
      """(?:\s+AS\s+([A-Za-z_]\w*))?""").r

  private def intervalToMs(quoted: String, unitOut: String): Long = {
    val (nStr, unit) = Option(unitOut).map(_.trim).filter(_.nonEmpty) match {
      case Some(u) => (quoted.trim, u.toLowerCase)
      case None => quoted.trim.split("\\s+") match {
        case Array(n, u) => (n, u.toLowerCase)
        case _ => throw new IllegalArgumentException(
          s"FOR SYSTEM_TIME AS OF: cannot parse interval '$quoted'")
      }
    }
    val unitMs = unit.stripSuffix("s") match {
      case "second" => 1000L
      case "minute" => 60000L
      case "hour" => 3600000L
      case "day" => 86400000L
      case u => throw new IllegalArgumentException(
        s"FOR SYSTEM_TIME AS OF: unsupported interval unit $u")
    }
    (nStr.toDouble * unitMs).toLong
  }

  /** Resolve a target wall-time onto the newest commit at or before it:
    * the store's birth (persisted `_birth_ms` sidecar, pseudo-epoch -1)
    * and every published epoch (persisted `_commit_ms` markers) form
    * the timeline — both survive a warehouse copy/restore, unlike the
    * file mtimes they fall back to for pre-sidecar stores.
    */
  private def epochAtTime(mv: graft.streaming.MaterializedView,
      rel: String, targetMs: Long): Long = {
    val birth = mv.birthMs.map((-1L, _)).toSeq
    (birth ++ mv.epochCommitTimes).filter(_._2 <= targetMs)
      .map(_._1).sorted.lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"$rel FOR SYSTEM_TIME AS OF: no committed state at or before " +
            new java.sql.Timestamp(targetMs)))
  }

  /** Replace each `rel FOR SYSTEM_TIME AS OF <epoch|'ts'|now()-interval>`
    * with a bound historical view (aliased back to the relation name, so
    * qualified column references keep resolving). Unknown relations
    * error loudly — time travel over a non-engine relation has no
    * changelog to reconstruct from.
    *
    * Literal-safe: a match STARTING inside a single-quoted string
    * literal is data, not syntax, and is left verbatim (the clause's own
    * timestamp literal sits mid-match, so literals can't just be masked
    * away before matching); replacements splice by offset, never by
    * matched-text search, so equal text inside a literal elsewhere can't
    * be clobbered.
    */
  private def rewriteTimeTravel(stmt: String): String =
    if (!"(?i)FOR\\s+SYSTEM_TIME".r.findFirstIn(stmt).isDefined) stmt
    else {
      val matches = AsOfScanRe.findAllMatchIn(stmt).toSeq
        .filterNot(m => Engine.insideLiteral(stmt, m.start))
      if (matches.isEmpty) return stmt
      val out = new StringBuilder
      var pos = 0
      matches.zipWithIndex.foreach { case (m, k) =>
        if (m.start < pos) () // overlapping artifact — keep earlier splice
        else {
          val rel = m.group(1)
          val mv = mvs.get(rel).getOrElse(throw new IllegalArgumentException(
            s"FOR SYSTEM_TIME AS OF: $rel is not an engine-managed table " +
              "or materialized view"))
          val epoch: Long =
            if (m.group(2) != null) m.group(2).toLong
            else if (m.group(3) != null) {
              val s0 = m.group(3).trim
              val s = if (s0.contains(":")) s0 else s0 + " 00:00:00"
              val ms = java.time.LocalDateTime
                .parse(s.replace(' ', 'T'))
                .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
              epochAtTime(mv, rel, ms)
            } else epochAtTime(mv, rel,
              System.currentTimeMillis() - intervalToMs(m.group(4), m.group(5)))
          val view = s"__asof_${rel}_$k"
          mv.imageAt(epoch).createOrReplaceTempView(view)
          // an explicit alias wins; otherwise alias back to the relation
          // name so qualified column references keep resolving
          val as = Option(m.group(6)).getOrElse(rel)
          out.append(stmt.substring(pos, m.start)).append(s"$view AS $as")
          pos = m.end
        }
      }
      out.append(stmt.substring(pos))
      out.toString
    }

  // ------------------------------------------------------------ schemas
  //
  // Reference: handler/create_schema.rs + frontend catalog — objects
  // live in named schemas, and unqualified names resolve through the
  // `search_path` session variable. This engine stores an object of
  // schema `s` under the internal flat name `s__<name>` (`public` keeps
  // bare names, so every pre-schema artifact and programmatic API call
  // is unchanged); [[resolveSchemas]] rewrites qualified and
  // search_path-resolved names to that internal form at the single
  // statement entry, so every statement parser (DDL regexes, Spark SQL,
  // DML, COMMENT, SHOW CREATE) sees flat names and needs no change.

  private val schemaNames = scala.collection.mutable.SortedSet[String]()

  private[graft] def schemaExists(s: String): Boolean =
    s.equalsIgnoreCase("public") || schemaNames.contains(dbSchema(s))

  /** Internal name → (schema, bare name) for display/introspection. */
  private[graft] def splitNs(n: String): (String, String) = {
    val i = n.indexOf("__")
    if (i > 0 && schemaNames.contains(n.substring(0, i)))
      (n.substring(0, i), n.substring(i + 2))
    else ("public", n)
  }

  /** Internal name → user-facing `schema.name` (bare when public —
    * including a database's pseudo-public, whose objects display bare
    * inside their own database).
    */
  private[graft] def displayName(n: String): String = {
    val (s, b) = splitNs(n)
    val us = dbOfSchema(s)._2
    if (us == "public") b else us + "." + b
  }

  /** Current user for `"$user"` in search_path (pgwire sets it from the
    * startup message; the reference's session user).
    */
  private[graft] var sessionUser: String = "graft"

  /** The connection's authenticated identity (pgwire startup `user`).
    * SET ROLE may only escalate from this, never past it: a
    * non-superuser startup identity can assume only itself, and RESET
    * ROLE restores this identity — the reference gates identity at
    * auth and has no in-band escalation path at all.
    */
  private[graft] var startupUser: String = "graft"

  /** The session's database (pgwire startup `database`; default `dev`,
    * the reference's default database — common/src/catalog/mod.rs
    * DEFAULT_DATABASE_NAME). The reference isolates catalogs per
    * database; here databases COMPOSE ON THE SCHEMA MACHINERY: database
    * `x`'s namespace is the pseudo-schema family `x_0db` (its public) /
    * `x_0db_<schema>` (its named schemas), so one flat catalog holds
    * every database with disjoint internal prefixes and
    * [[resolveSchemas]] needs no second mechanism. `dev` keeps bare
    * names — every pre-database artifact and programmatic API call is
    * unchanged. `_0db` is reserved out of schema and database names at
    * creation, so the prefixes cannot collide with user names.
    */
  private[graft] var sessionDatabase: String = "dev"

  /** User-facing schema name → internal pseudo-schema for the session's
    * database (identity in `dev`).
    */
  private def dbSchema(userSchema: String): String =
    if (sessionDatabase == "dev") userSchema
    else if (userSchema.equalsIgnoreCase("public")) sessionDatabase + "_0db"
    else sessionDatabase + "_0db_" + userSchema

  /** Internal pseudo-schema → (database, user-facing schema name). */
  private[graft] def dbOfSchema(internal: String): (String, String) = {
    val i = internal.indexOf("_0db")
    if (i < 0) ("dev", internal)
    else {
      val rest = internal.substring(i + 4)
      (internal.substring(0, i),
        if (rest.isEmpty) "public" else rest.stripPrefix("_"))
    }
  }

  /** Does internal object `n` belong to the session's database? */
  private def inSessionDb(n: String): Boolean =
    dbOfSchema(splitNs(n)._1)._1 == sessionDatabase

  /** search_path entries, `$user` substituted, in declared order. */
  private def searchPathEntries: Seq[String] =
    varValue("search_path").split(",").toSeq
      .map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .map(e => if (e == "$user") sessionUser else e)
      .filter(_.nonEmpty)

  /** Every user-visible object name (internal form), all kinds. */
  private def allObjectNames: Set[String] =
    tableSchemas.keySet.toSet ++ mvs.list ++ sources.keys ++
      indexes.keys ++ sinkNames ++
      catalog.list[DurableCatalog.ViewEntry]("views").map(_._1) ++
      catalog.list[DurableCatalog.SubEntry]("subscriptions").map(_._1)

  // --------------------------------------------- wire-session registry
  //
  // Reference: handler/show.rs SHOW PROCESSLIST + handler/kill_process.rs
  // + pg_stat_activity. pgwire registers each connection here (pid,
  // user, client address, live query text, a kill closure); KILL <pid>
  // closes the socket, introspection renders the rows.

  final case class WireSession(user: String, clientAddr: String,
      database: String, startedAtMs: Long,
      @volatile var query: String = "",
      @volatile var queryStartMs: Long = 0L,
      kill: () => Unit = () => (),
      secret: Int = 0,
      @volatile var cancelRequested: Boolean = false)

  private[graft] val wireSessions =
    new java.util.concurrent.ConcurrentHashMap[Int, WireSession]()
  private val nextPid = new java.util.concurrent.atomic.AtomicInteger(1000)
  private val secretRng = new java.security.SecureRandom()

  private[graft] def registerWireSession(user: String, addr: String,
      database: String, kill: () => Unit): Int = {
    val pid = nextPid.getAndIncrement()
    wireSessions.put(pid,
      WireSession(user, addr, database, System.currentTimeMillis(),
        kill = kill, secret = secretRng.nextInt()))
    pid
  }

  /** BackendKeyData secret for CancelRequest validation. */
  private[graft] def wireSessionSecret(pid: Int): Int =
    Option(wireSessions.get(pid)).map(_.secret).getOrElse(0)

  /** CancelRequest (reference: pg_protocol.rs process_cancel_msg):
    * validates the (pid, secret) pair and cancels the backend's active
    * Spark jobs WITHOUT taking the engine monitor — the target thread
    * holds it while executing. Wrong key = silent no-op (PG semantics:
    * cancellation is never acknowledged to the requester).
    */
  private[graft] def cancelWireQuery(pid: Int, secret: Int): Unit =
    Option(wireSessions.get(pid))
      .filter(s => s.secret == secret && s.secret != 0)
      .foreach { s =>
        s.cancelRequested = true
        spark.sparkContext.cancelJobGroup(s"pgwire-$pid")
      }

  /** True exactly once after a cancel hit this backend (the connection
    * thread turns the aborted job into SQLSTATE 57014).
    */
  private[graft] def consumeCancelFlag(pid: Int): Boolean =
    Option(wireSessions.get(pid)).exists { s =>
      val was = s.cancelRequested; s.cancelRequested = false; was
    }

  private[graft] def wireSessionQuery(pid: Int, sql: String): Unit =
    Option(wireSessions.get(pid)).foreach { s =>
      // never hold credential payloads in the live-query registry:
      // CREATE USER … PASSWORD '…' / CREATE SECRET … AS '…' would
      // otherwise surface through processlist/pg_stat_activity
      s.query = sql
        .replaceAll("(?is)(PASSWORD\\s+)'(?:[^']|'')*'", "$1'***'")
        .replaceAll("(?is)(\\bAS\\s+)'(?:[^']|'')*'(\\s*;?\\s*$)", "$1'***'$2")
      s.queryStartMs = System.currentTimeMillis()
    }

  /** PG semantics: other backends' in-flight query text is visible only
    * to superusers and the backend's own user.
    */
  private def visibleQuery(owner: String, q: String): String =
    if (q.isEmpty || isSuperuser(sessionUser) || owner == sessionUser) q
    else "<insufficient privilege>"

  private[graft] def unregisterWireSession(pid: Int): Unit =
    wireSessions.remove(pid)

  private val ShowProcessList =
    """(?is)\s*SHOW\s+PROCESSLIST\s*;?\s*""".r
  private val KillStmt = """(?is)\s*KILL\s+(?:QUERY\s+)?(\d+)\s*;?\s*""".r

  // ------------------------------------------------------------ databases
  //
  // Reference: handler/create_database.rs / drop_database.rs. The
  // registry is durable and validates pgwire's startup `database`
  // parameter (unknown → 3D000, PG semantics). DOCUMENTED DIVERGENCE:
  // all databases share this engine's one catalog — the reference
  // isolates catalogs per database; here CREATE DATABASE provides the
  // connectable namespace, and schema-level namespacing provides the
  // isolation layer.

  private val CreateDatabaseStmt =
    """(?is)\s*CREATE\s+DATABASE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(\w+)\s*;?\s*""".r
  private val DropDatabaseStmt =
    """(?is)\s*DROP\s+DATABASE\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*;?\s*""".r

  private val databases = scala.collection.mutable.SortedSet[String]()

  private[graft] def databaseExists(d: String): Boolean =
    d == "dev" || databases.contains(d)

  // reference handler/use_db.rs: re-home the session to another
  // database mid-connection (the wire layer captures the switch back
  // into its per-connection state)
  private val UseDbStmt = """(?is)\s*USE\s+(\w+)\s*;?\s*""".r

  // ------------------------------------------------------------ secrets
  //
  // Reference: handler/create_secret.rs + secret catalog. Values store
  // obfuscated in the durable catalog and resolve ONLY at connector use
  // time (`${secret:name}` inside a WITH option value / jdbc_query url),
  // so persisted DDL keeps the placeholder, never the payload.

  private val secrets = scala.collection.mutable.Map[String, String]()

  private val CreateSecretStmt =
    ("""(?is)\s*CREATE\s+SECRET\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(\w+)""" +
      """(?:\s+WITH\s*\([^)]*\))?\s+AS\s+'([^']*)'\s*;?\s*""").r
  private val DropSecretStmt =
    """(?is)\s*DROP\s+SECRET\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*;?\s*""".r
  private val AlterSecretStmt =
    ("""(?is)\s*ALTER\s+SECRET\s+(\w+)""" +
      """(?:\s+WITH\s*\([^)]*\))?\s+AS\s+'([^']*)'\s*;?\s*""").r
  private val ShowSecrets = """(?is)\s*SHOW\s+SECRETS\s*;?\s*""".r

  /** Substitute `${secret:name}` placeholders with live secret values
    * (use-time only — callers are connector option consumers).
    */
  private[graft] def resolveSecretRefs(v: String): String =
    if (!v.contains("${secret:")) v
    else """\$\{secret:(\w+)\}""".r.replaceAllIn(v, m =>
      java.util.regex.Matcher.quoteReplacement(
        secrets.getOrElse(m.group(1), throw new IllegalArgumentException(
          s"secret \"${m.group(1)}\" does not exist"))))

  // ------------------------------------------------------- connections
  //
  // Reference: handler/create_connection.rs — a named connector
  // property set; CREATE SOURCE/SINK reference it with
  // `connection = name` and the stored properties splice into the WITH
  // clause at bind time (`type` validates against the statement's
  // connector). Splice-at-bind means a later DROP CONNECTION does not
  // cascade to already-created sources — documented divergence from
  // the reference's dependency tracking.

  private val connections =
    scala.collection.mutable.Map[String, Map[String, String]]()

  private val CreateConnectionStmt =
    ("""(?is)\s*CREATE\s+CONNECTION\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(\w+)""" +
      """\s+WITH\s*\(([^)]*)\)\s*;?\s*""").r
  private val DropConnectionStmt =
    """(?is)\s*DROP\s+CONNECTION\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*;?\s*""".r
  private val ShowConnections = """(?is)\s*SHOW\s+CONNECTIONS\s*;?\s*""".r

  private val ConnectionRef =
    """(?i)\bconnection\s*=\s*'?([A-Za-z_]\w*)'?""".r

  /** Splice `connection = name` into the stored property set. Always
    * emits `connection_name = '<name>'` first (the reference records
    * the reference the same way), then the connection's properties
    * minus `type`.
    */
  private def resolveConnectionRefs(stmt: String): String =
    if (!stmt.toLowerCase.contains("connection")) stmt
    else ConnectionRef.replaceAllIn(stmt, m => {
      val n = m.group(1)
      val props = connections.getOrElse(n,
        throw new IllegalArgumentException(
          s"connection \"$n\" does not exist"))
      val connectorRe = """(?i)\bconnector\s*=\s*'(\w+)'""".r
      for (t <- props.get("type");
           c <- connectorRe.findFirstMatchIn(stmt))
        require(t.equalsIgnoreCase(c.group(1)),
          s"connection \"$n\" is type $t but the statement's " +
            s"connector is ${c.group(1)}")
      val spliced = (s"connection_name = '$n'" +:
        props.toSeq.filterNot(_._1 == "type").sortBy(_._1)
          .map { case (k, v) => s"$k = '${v.replace("'", "''")}'" })
        .mkString(", ")
      java.util.regex.Matcher.quoteReplacement(spliced)
    })

  private val CreateSchemaStmt =
    """(?is)\s*CREATE\s+SCHEMA\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(\w+)\s*;?\s*""".r
  private val DropSchemaStmt =
    """(?is)\s*DROP\s+SCHEMA\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*(?:(CASCADE|RESTRICT)\s*)?;?\s*""".r

  private val ReservedSchemas = Set("public", "pg_catalog",
    "information_schema", "rw_catalog", "pg_temp", "pg_toast")

  private def createSchema(name: String, ifNotExists: Boolean): DataFrame = {
    val internal = dbSchema(name)
    if (schemaNames.contains(internal) ||
        ReservedSchemas.contains(name.toLowerCase)) {
      if (ifNotExists) return statusDf("CREATE SCHEMA", name)
      throw new IllegalArgumentException(s"schema \"$name\" already exists")
    }
    require(!name.contains("__"),
      s"schema name $name may not contain '__' (reserved separator)")
    require(!name.toLowerCase.contains("_0db"),
      s"schema name $name may not contain '_0db' (reserved database marker)")
    catalog.save("schemas", internal, DurableCatalog.SchemaEntry(sessionUser))
    schemaNames += internal
    statusDf("CREATE SCHEMA", name)
  }

  /** CASCADE a set of internal objects through their ordinary DROP
    * paths (storage, jobs, catalog entries die with them). Chain fences
    * can refuse an upstream drop while a downstream lives, so loop
    * until a pass makes no progress, then surface what's left.
    */
  private def dropContained(label: String, contained0: Seq[String]): Unit = {
    var left = contained0
    var progress = true
    while (left.nonEmpty && progress) {
      progress = false
      left = left.filterNot { n =>
        val kind =
          if (tableSchemas.contains(n)) "TABLE"
          else if (sinkNames.contains(n)) "SINK"
          else if (catalog.load[DurableCatalog.ViewEntry]("views", n).isDefined) "VIEW"
          else if (sources.contains(n)) "SOURCE"
          else if (indexes.contains(n)) "INDEX"
          else if (catalog.load[DurableCatalog.SubEntry]("subscriptions", n).isDefined)
            "SUBSCRIPTION"
          else "MATERIALIZED VIEW"
        val ok = scala.util.Try(execute(s"DROP $kind $n")).isSuccess
        if (ok) progress = true
        ok
      }
    }
    require(left.isEmpty,
      s"$label could not drop: ${left.mkString(", ")}")
  }

  private def dropSchema(name: String, ifExists: Boolean,
      mode: String): DataFrame = {
    val internal = dbSchema(name)
    if (!schemaNames.contains(internal)) {
      if (ifExists) return statusDf("DROP SCHEMA", name)
      throw new IllegalArgumentException(s"schema \"$name\" does not exist")
    }
    def contained: Seq[String] =
      allObjectNames.filter(_.startsWith(internal + "__")).toSeq.sorted
    if (contained.nonEmpty && (mode == null || mode.equalsIgnoreCase("RESTRICT")))
      throw new IllegalArgumentException(
        s"cannot drop schema $name because other objects depend on it (" +
          contained.map(displayName).mkString(", ") + ") — add CASCADE")
    dropContained(s"DROP SCHEMA $name CASCADE", contained)
    catalog.delete("schemas", internal)
    schemaNames -= internal
    statusDf("DROP SCHEMA", name)
  }

  // ------------------------------------------------- users / privileges
  //
  // Reference: handler/create_user.rs, alter_user.rs, drop_user.rs,
  // handle_privilege.rs + user::UserAuthentication. Users and ACLs are
  // durable catalog entries mirrored in memory; every statement passes
  // [[checkPrivileges]] at the single entry. The bootstrap user `graft`
  // is a superuser (the reference's `root`); object creators own their
  // objects, owners and superusers bypass ACLs.

  private val users =
    scala.collection.mutable.Map[String, DurableCatalog.UserEntry]()
  private val objectOwners = scala.collection.mutable.Map[String, String]()
  // object key → user → privileges ("SELECT"/"INSERT"/"UPDATE"/
  // "DELETE"/"CREATE"/"ALL"); schema keys are "s-<schema>", the
  // database key "db-dev"
  private val acls =
    scala.collection.mutable.Map[String, Map[String, Seq[String]]]()

  /** Bootstrap superusers: `graft` plus the reference's defaults
    * (common/src/catalog/mod.rs DEFAULT_SUPER_USER "root" /
    * DEFAULT_SUPER_USER_FOR_PG "postgres") so stock clients connect.
    */
  private val BootstrapSuperusers = Set("graft", "root", "postgres")

  private[graft] def userExists(u: String): Boolean =
    BootstrapSuperusers.contains(u) || users.contains(u)

  /** The stored password (pgwire auth; None = trust for this user —
    * the reference's UserAuthenticator::None vs ClearText/MD5,
    * src/utils/pgwire/src/pg_server.rs).
    */
  private[graft] def userPassword(u: String): Option[String] =
    users.get(u).flatMap(_.password)

  /** NOLOGIN users cannot connect (28000, PG semantics). */
  private[graft] def userCanLogin(u: String): Boolean =
    BootstrapSuperusers.contains(u) || users.get(u).exists(_.login)

  private def isSuperuser(u: String): Boolean =
    BootstrapSuperusers.contains(u) || users.get(u).exists(_.superuser)

  private def ownerOf(obj: String): String =
    objectOwners.getOrElse(obj, "graft")

  private def aclAllows(u: String, key: String, priv: String): Boolean =
    acls.get(key).exists(_.get(u).exists(ps =>
      ps.contains(priv) || ps.contains("ALL")))

  /** May `u` exercise `priv` on object `obj` (internal name)? */
  private def objAllowed(u: String, obj: String, priv: String): Boolean =
    isSuperuser(u) || ownerOf(obj) == u || aclAllows(u, obj, priv)

  private val CreateUserStmt =
    """(?is)^\s*CREATE\s+USER\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)((?:\s+WITH)?(?:\s+(?:\w+|PASSWORD\s+(?:'[^']*'|NULL)))*)\s*;?\s*$""".r
  private val AlterUserStmt =
    """(?is)^\s*ALTER\s+USER\s+(\w+)\s+(?:RENAME\s+TO\s+(\w+)|((?:\s*WITH)?(?:\s*(?:\w+|PASSWORD\s+(?:'[^']*'|NULL)))*))\s*;?\s*$""".r
  private val DropUserStmt =
    """(?is)^\s*DROP\s+USER\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*;?\s*$""".r
  private val GrantStmt =
    """(?is)^\s*GRANT\s+(.+?)\s+ON\s+(.+?)\s+TO\s+(\w+)(\s+WITH\s+GRANT\s+OPTION)?\s*;?\s*$""".r
  private val RevokeStmt =
    """(?is)^\s*REVOKE\s+(?:GRANT\s+OPTION\s+FOR\s+)?(.+?)\s+ON\s+(.+?)\s+FROM\s+(\w+)\s*;?\s*$""".r
  private val SetRoleStmt =
    """(?is)^\s*SET\s+(?:ROLE\s+|SESSION\s+AUTHORIZATION\s+)(\w+)\s*;?\s*$""".r
  private val ResetRoleStmt =
    """(?is)^\s*RESET\s+(?:ROLE|SESSION\s+AUTHORIZATION)\s*;?\s*$""".r

  private def parseUserOptions(optText: String,
      base: DurableCatalog.UserEntry): DurableCatalog.UserEntry = {
    var e = base
    val PasswordRe = """(?is)PASSWORD\s+('[^']*'|NULL)""".r
    PasswordRe.findFirstMatchIn(optText).foreach { m =>
      e = e.copy(password =
        if (m.group(1).equalsIgnoreCase("NULL")) None
        else Some(m.group(1).stripPrefix("'").stripSuffix("'")))
    }
    PasswordRe.replaceAllIn(optText, " ").split("\\s+")
      .map(_.trim.toUpperCase).filter(_.nonEmpty).foreach {
        case "SUPERUSER" => e = e.copy(superuser = true)
        case "NOSUPERUSER" => e = e.copy(superuser = false)
        case "CREATEDB" => e = e.copy(createdb = true)
        case "NOCREATEDB" => e = e.copy(createdb = false)
        case "LOGIN" => e = e.copy(login = true)
        case "NOLOGIN" => e = e.copy(login = false)
        case "WITH" | "CREATEUSER" | "NOCREATEUSER" => ()
        case other =>
          throw new IllegalArgumentException(s"unknown user option $other")
      }
    e
  }

  private def handleUserStatement(stmt: String): Option[DataFrame] =
    stmt match {
      case CreateUserStmt(name, opts) =>
        require(isSuperuser(sessionUser) ||
          users.get(sessionUser).exists(_.createdb),
          s"permission denied to create user (as $sessionUser)")
        if (userExists(name)) {
          if (stmt.toUpperCase.contains("IF NOT EXISTS"))
            return Some(statusDf("CREATE USER", name))
          throw new IllegalArgumentException(s"user \"$name\" already exists")
        }
        val e = parseUserOptions(opts,
          DurableCatalog.UserEntry(superuser = false, createdb = false,
            login = true, password = None))
        users(name) = e
        catalog.save("users", name, e)
        Some(statusDf("CREATE USER", name))
      case AlterUserStmt(name, renameTo, opts) =>
        require(isSuperuser(sessionUser) || sessionUser == name,
          s"permission denied to alter user (as $sessionUser)")
        val cur = users.getOrElse(name,
          throw new IllegalArgumentException(s"user \"$name\" does not exist"))
        if (renameTo != null) {
          users.remove(name); users(renameTo) = cur
          catalog.delete("users", name)
          catalog.save("users", renameTo, cur)
          objectOwners.filter(_._2 == name).foreach { case (k, _) =>
            objectOwners(k) = renameTo
            catalog.save("owners", k, DurableCatalog.OwnerEntry(renameTo))
          }
        } else {
          val e = parseUserOptions(Option(opts).getOrElse(""), cur)
          users(name) = e
          catalog.save("users", name, e)
        }
        Some(statusDf("ALTER USER", name))
      case DropUserStmt(ifEx, name) =>
        require(isSuperuser(sessionUser),
          s"permission denied to drop user (as $sessionUser)")
        if (!users.contains(name)) {
          if (ifEx != null) return Some(statusDf("DROP USER", name))
          throw new IllegalArgumentException(s"user \"$name\" does not exist")
        }
        // stale entries for dropped objects don't block (recordOwner
        // can leave one behind when the CREATE itself failed)
        val live = allObjectNames
        val owned = objectOwners.filter(_._2 == name).keys.toSeq
          .filter(live.contains).sorted
        require(owned.isEmpty,
          s"user $name owns objects (${owned.map(displayName).mkString(", ")})" +
            " — drop or reassign them first")
        objectOwners.filter(_._2 == name).keys.toSeq.foreach { k =>
          objectOwners.remove(k); catalog.delete("owners", k)
        }
        users.remove(name)
        catalog.delete("users", name)
        acls.keys.toSeq.foreach { k =>
          if (acls(k).contains(name)) {
            acls(k) = acls(k) - name
            catalog.save("acls", k, DurableCatalog.AclEntry(acls(k)))
          }
        }
        Some(statusDf("DROP USER", name))
      case SetRoleStmt(name) =>
        require(userExists(name), s"role \"$name\" does not exist")
        // PG gates SET ROLE on membership; with no role grants the
        // rendering is: superuser startup identity may assume anyone,
        // everyone else only themselves (no in-band escalation).
        require(isSuperuser(startupUser) || name == startupUser,
          s"permission denied to set role \"$name\" (as $startupUser)")
        sessionUser = name
        Some(statusDf("SET", "role"))
      case ResetRoleStmt() =>
        sessionUser = startupUser
        Some(statusDf("RESET", "role"))
      case GrantStmt(privText, target, user, _) =>
        Some(applyGrant(privText, target, user, revoke = false))
      case RevokeStmt(privText, target, user) =>
        Some(applyGrant(privText, target, user, revoke = true))
      case _ => None
    }

  private def applyGrant(privText: String, target0: String, user: String,
      revoke: Boolean): DataFrame = {
    require(userExists(user), s"user \"$user\" does not exist")
    val privs = privText.split(",").toSeq
      .map(_.trim.toUpperCase.replaceAll("\\s+", " "))
      .map { case "ALL PRIVILEGES" => "ALL"; case p => p }
    val ok = Set("SELECT", "INSERT", "UPDATE", "DELETE", "CREATE",
      "USAGE", "CONNECT", "ALL")
    privs.foreach(p => require(ok.contains(p), s"unknown privilege $p"))
    val target = target0.trim.replaceAll("\\s+", " ")
    val AllInSchema = "(?is)ALL\\s+TABLES\\s+IN\\s+SCHEMA\\s+(\\w+)".r
    val SchemaT = "(?is)SCHEMA\\s+(\\w+)".r
    val DatabaseT = "(?is)DATABASE\\s+(\\w+)".r
    val RelT = "(?is)(?:TABLE\\s+|MATERIALIZED\\s+VIEW\\s+|SOURCE\\s+)?([\\w,\\s]+)".r
    val keys: Seq[String] = target match {
      case AllInSchema(s) =>
        require(schemaExists(s), s"schema \"$s\" does not exist")
        val si = dbSchema(s)
        val pre = if (si.equalsIgnoreCase("public")) "" else si + "__"
        allObjectNames.filter { n =>
          if (pre.isEmpty) splitNs(n)._1 == "public" else n.startsWith(pre)
        }.toSeq.sorted
      case SchemaT(s) =>
        require(schemaExists(s), s"schema \"$s\" does not exist")
        Seq("s-" + dbSchema(s))
      case DatabaseT(d) => Seq("db-" + d)
      case RelT(list) =>
        list.split(",").toSeq.map(_.trim).map { n =>
          require(allObjectNames.contains(n),
            s"relation \"$n\" does not exist")
          n
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported GRANT target $other")
    }
    // only the owner (or a superuser) can grant on an object
    keys.foreach { k =>
      val owner =
        if (k.startsWith("s-"))
          catalog.load[DurableCatalog.SchemaEntry]("schemas",
            k.stripPrefix("s-")).map(_.owner).getOrElse("graft")
        else if (k.startsWith("db-")) "graft"
        else ownerOf(k)
      require(isSuperuser(sessionUser) || owner == sessionUser,
        s"permission denied for ${k.stripPrefix("s-")} (as $sessionUser)")
    }
    keys.foreach { k =>
      val cur = acls.getOrElse(k, Map.empty)
      val had = cur.getOrElse(user, Seq.empty)
      val next =
        if (revoke)
          if (privs.contains("ALL")) Seq.empty
          else had.filterNot(privs.contains)
        else (had ++ privs).distinct
      val updated = if (next.isEmpty) cur - user else cur + (user -> next)
      if (updated.isEmpty) { acls.remove(k); catalog.delete("acls", k) }
      else { acls(k) = updated
        catalog.save("acls", k, DurableCatalog.AclEntry(updated)) }
    }
    statusDf(if (revoke) "REVOKE" else "GRANT", user)
  }

  /** Enforce privileges for `stmt` (post-resolution, internal names) as
    * `sessionUser`. Superusers and owners bypass; everyone may read the
    * system catalogs.
    */
  private def checkPrivileges(stmt: String): Unit = {
    val u = sessionUser
    if (isSuperuser(u)) return
    val known = allObjectNames
    def referenced: Seq[String] = known.toSeq.filter(n =>
      java.util.regex.Pattern.compile("(?i)(?<![\\w.])" +
        java.util.regex.Pattern.quote(n) + "\\b").matcher(stmt).find())
    val CreateRe = ("(?is)^\\s*CREATE\\s+(?:TABLE|MATERIALIZED\\s+VIEW|VIEW|" +
      "SOURCE|SINK|INDEX|SUBSCRIPTION)\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?(\\w+).*").r
    val DropRe = ("(?is)^\\s*DROP\\s+(?:TABLE|MATERIALIZED\\s+VIEW|VIEW|" +
      "SOURCE|SINK|INDEX|SUBSCRIPTION)\\s+(?:IF\\s+EXISTS\\s+)?(\\w+).*").r
    val DmlRe =
      """(?is)^\s*(INSERT\s+INTO|UPDATE|DELETE\s+FROM|COPY)\s+(\w+).*""".r
    stmt match {
      case CreateRe(name) =>
        val ns = splitNs(name)._1
        val schemaOwner =
          if (ns == "public") "graft"
          else catalog.load[DurableCatalog.SchemaEntry]("schemas", ns)
            .map(_.owner).getOrElse("graft")
        require(schemaOwner == u || aclAllows(u, "s-" + ns, "CREATE") ||
          aclAllows(u, "db-" + sessionDatabase, "CREATE"),
          s"permission denied for schema $ns (as $u)")
        // CREATE … AS SELECT also reads
        referenced.filterNot(_ == name).foreach { n =>
          require(objAllowed(u, n, "SELECT"),
            s"permission denied for ${displayName(n)} (as $u)")
        }
      case DropRe(name) =>
        require(ownerOf(name) == u,
          s"must be owner of ${displayName(name)} (as $u)")
      case DmlRe(verb, name) =>
        val priv = verb.trim.split("\\s+")(0).toUpperCase match {
          case "COPY" => "INSERT"
          case v => v
        }
        require(objAllowed(u, name, priv),
          s"permission denied for ${displayName(name)} (as $u)")
        referenced.filterNot(_ == name).foreach { n =>
          require(objAllowed(u, n, "SELECT"),
            s"permission denied for ${displayName(n)} (as $u)")
        }
      case _ =>
        referenced.foreach { n =>
          require(objAllowed(u, n, "SELECT"),
            s"permission denied for ${displayName(n)} (as $u)")
        }
    }
  }

  /** Record ownership after a successful CREATE (single post-hook; the
    * reference records owner ids in every catalog entry).
    */
  private def recordOwner(stmt: String): Unit = {
    if (sessionUser == "graft") return // bootstrap owner is the default
    val CreateRe = ("(?is)^\\s*CREATE\\s+(?:TABLE|MATERIALIZED\\s+VIEW|VIEW|" +
      "SOURCE|SINK|INDEX|SUBSCRIPTION)\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?(\\w+).*").r
    stmt match {
      case CreateRe(name) if !allObjectNames.contains(name) =>
        // never reassign a live name: a failing CREATE (duplicate) or
        // IF NOT EXISTS on an existing object must not hijack the
        // current owner's entry (the issuer could then DROP/GRANT it)
        objectOwners(name) = sessionUser
        catalog.save("owners", name, DurableCatalog.OwnerEntry(sessionUser))
      case _ => ()
    }
  }

  /** Rewrite schema-qualified (`s.t` → `s__t`, `public.t` → `t`) and
    * search_path-resolved unqualified names to the internal flat form,
    * outside string literals. Creation statements without a schema land
    * in the first existing schema on the search_path (PG semantics).
    */
  private def resolveSchemas(stmt: String): String = {
    // explicit `public.x` stays qualified until the search_path phases
    // ran — stripping it first would let the path re-capture the name.
    // In a non-dev database, "public" means the database's pseudo-public
    // schema, so the explicit qualifier maps to that internal prefix.
    def stripPublic(s: String): String =
      if (!s.toLowerCase.contains("public.")) s
      else {
        val repl =
          if (sessionDatabase == "dev") "$1"
          else java.util.regex.Matcher.quoteReplacement(
            dbSchema("public") + "__") + "$1"
        Engine.mapOutsideLiterals(s)(
          _.replaceAll("(?i)(?<![\\w.\"])public\\.([A-Za-z_]\\w*)", repl))
      }
    if (schemaNames.isEmpty) return stripPublic(stmt)
    var out = stmt
    if (out.contains(".")) {
      // qualified names resolve against the SESSION DATABASE's schemas
      // only (match on the user-facing name, rewrite to the internal
      // pseudo-schema) — another database's schemas are invisible
      val qualifiable = schemaNames.toSeq.flatMap { sn =>
        val (db, us) = dbOfSchema(sn)
        if (db == sessionDatabase && us != "public") Some(us -> sn) else None
      }
      out = Engine.mapOutsideLiterals(out) { seg0 =>
        var seg = seg0
        qualifiable.foreach { case (us, sn) =>
          if (seg.toLowerCase.contains(us.toLowerCase + ".")) {
            val repl = java.util.regex.Matcher.quoteReplacement(sn + "__") + "$1"
            seg = seg.replaceAll(
              "(?i)(?<![\\w.\"])" + us + "\\.([A-Za-z_]\\w*)", repl)
          }
        }
        seg
      }
    }
    val path = searchPathEntries
    val userPath = path.filter(e => schemaNames.contains(dbSchema(e)))
    if (userPath.isEmpty) return stripPublic(out)
    val known = allObjectNames
    // creation target: first existing schema on the path (dev public =
    // flat; a non-dev database's public is its pseudo-schema prefix)
    val createTarget =
      dbSchema(path.find(schemaExists).getOrElse("public"))
    if (createTarget != "public") {
      val CreateName = ("(?is)^(\\s*CREATE\\s+(?:TABLE|MATERIALIZED\\s+VIEW|" +
        "VIEW|SOURCE|SINK|INDEX|SUBSCRIPTION)\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?)" +
        "([A-Za-z_]\\w*)((?![\\w.]).*)").r
      out = out match {
        case CreateName(head, name, rest)
            if splitNs(name)._1 == "public" && !name.contains("__") =>
          head + createTarget + "__" + name + rest
        case _ => out
      }
    }
    // reads: for each bare name visible through the path, the FIRST
    // path entry owning it wins (public participates in order).
    val bareCandidates = userPath.flatMap { s =>
      val pre = dbSchema(s) + "__"
      known.filter(_.startsWith(pre)).map(_.stripPrefix(pre))
    }.distinct
    def winnerOf(bare: String): Option[String] = path.collectFirst {
      case p if dbSchema(p) == "public" && known.contains(bare) => bare
      case p if schemaNames.contains(dbSchema(p)) &&
          known.contains(dbSchema(p) + "__" + bare) =>
        dbSchema(p) + "__" + bare
    }.filter(_ != bare)
    // When the statement's query surface PARSES, rewrite ONLY at the
    // exact character spans the parser reports for relation identifiers
    // (Origin.startIndex/stopIndex) — a column or alias spelled like a
    // path-resolved table name is untouchable even when the SAME token
    // is also a relation elsewhere in the statement (`SELECT t AS c
    // FROM t`), and CTE names shadow catalog objects like in PG.
    // Unparseable statements (graft DDL/DML dialect) keep the legacy
    // token rewrite, gated on the parser-derived relation scope where
    // one applies.
    bareRelationSpans(out) match {
      case Some(spans) =>
        val repls = spans.flatMap { case (s, e, ident) =>
          bareCandidates.find(_.equalsIgnoreCase(ident))
            .flatMap(winnerOf)
            .map(internal => (s, e, internal))
        }.sortBy(-_._1)
        if (repls.nonEmpty) {
          val sb = new java.lang.StringBuilder(out)
          repls.foreach { case (s, e, internal) =>
            sb.replace(s, e + 1, internal)
          }
          out = sb.toString
        }
      case None =>
        val relationScope = queryRelationScope(out)
        bareCandidates.foreach { bare =>
          winnerOf(bare)
            .filter(_ => relationScope.forall(_.contains(bare.toLowerCase)))
            .foreach { internal =>
              val re = "(?i)(?<![\\w.\"])" + bare + "\\b(?!\\s*\\()"
              out = Engine.mapOutsideLiterals(out)(
                _.replaceAll(re,
                  java.util.regex.Matcher.quoteReplacement(internal)))
            }
        }
    }
    stripPublic(out)
  }

  /** Character spans (start, stop inclusive, identifier) of every
    * SINGLE-part name in RELATION position on the statement's parseable
    * query surface — the parser's own Origin offsets, adjusted for any
    * EXPLAIN / `CREATE … AS` prefix. CTE-defined names are excluded
    * (they shadow catalog objects, PG semantics). None when no parser
    * applies — the caller falls back to the token rewrite.
    */
  private def bareRelationSpans(stmt: String): Option[Seq[(Int, Int, String)]] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}
    val CreateAs =
      """(?is)^(\s*CREATE\s+(?:TABLE|MATERIALIZED\s+VIEW|(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?VIEW|SINK)\s+.*?\bAS\b)(.*)$""".r
    val Explain =
      """(?is)^(\s*EXPLAIN(?:\s+(?:ANALYZE|VERBOSE|FORMATTED|EXTENDED|CODEGEN|COST))*\s+)(.*)$""".r
    val surface: Option[(Int, String)] = stmt match {
      case Explain(head, q) => Some((head.length, q))
      case s if s.matches(
        "(?is)\\s*(SELECT|WITH|VALUES|TABLE|INSERT|UPDATE|DELETE|MERGE)\\b.*") =>
        Some((0, s))
      case CreateAs(head, q) => Some((head.length, q))
      case _ => None
    }
    surface.flatMap { case (base, q) =>
      scala.util.Try {
        val plan = spark.sessionState.sqlParser.parsePlan(q)
        val cteNames = plan.collect {
          case w: UnresolvedWith => w.cteRelations.map(_._1.toLowerCase)
        }.flatten.toSet
        val spans = scala.collection.mutable.ArrayBuffer[(Int, Int, String)]()
        def walk(p: LogicalPlan): Unit = p.foreach { n =>
          n match {
            case r: UnresolvedRelation if r.multipartIdentifier.length == 1 =>
              for {
                s <- r.origin.startIndex
                e <- r.origin.stopIndex
                ident = r.multipartIdentifier.head
                if !cteNames.contains(ident.toLowerCase)
              } spans += ((base + s, base + e, ident))
            // the INSERT target hangs off a FIELD, not a child
            case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement =>
              walk(i.table)
            case _ =>
          }
          n.expressions.foreach(_.foreach {
            case sq: SubqueryExpression => walk(sq.plan)
            case _ =>
          })
        }
        walk(plan)
        spans.distinct.toSeq
      }.toOption
    }
  }

  /** The set of names used in RELATION position on the statement's
    * parseable query surface (lowercased), or None when no parser
    * applies: the whole statement for SELECT/DML forms, the `AS` tail
    * for CREATE …​ AS. Subquery-expression relations included. Names on
    * a DDL prefix (creation target, PK columns) are deliberately OUT of
    * scope — the creation-target rule above handles the target, and
    * nothing else on a prefix is a read relation.
    */
  private def queryRelationScope(stmt: String): Option[Set[String]] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    val CreateAs =
      """(?is)^\s*CREATE\s+(?:TABLE|MATERIALIZED\s+VIEW|(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?VIEW|SINK)\s+.*?\bAS\b(.*)$""".r
    // EXPLAIN parses to a leaf command holding its query as a FIELD, not
    // a child — strip the prefix so the traversal sees the inner plan
    val Explain = """(?is)^\s*EXPLAIN(?:\s+(?:ANALYZE|VERBOSE|FORMATTED|EXTENDED|CODEGEN|COST))*\s+(.*)$""".r
    val surface: Option[String] = stmt match {
      case Explain(q) => Some(q)
      case s if s.matches(
        "(?is)\\s*(SELECT|WITH|VALUES|TABLE|INSERT|UPDATE|DELETE|MERGE)\\b.*") =>
        Some(s)
      case CreateAs(q) => Some(q)
      case _ => None
    }
    def walk(p: LogicalPlan): Seq[String] =
      p.collect { case n =>
        val here = n match {
          case r: UnresolvedRelation => Seq(r.multipartIdentifier.last)
          // the INSERT target hangs off a FIELD, not a child — a plain
          // collect would miss it and the scope gate would wrongly
          // block the target's rewrite
          case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement =>
            walk(i.table)
          case _ => Nil
        }
        here ++ n.expressions.flatMap(_.collect {
          case s: SubqueryExpression => walk(s.plan)
        }.flatten)
      }.flatten
    surface.flatMap { q =>
      scala.util.Try(
        walk(spark.sessionState.sqlParser.parsePlan(q))
          .map(_.toLowerCase).toSet).toOption
    }
  }

  def execute(statement00: String): DataFrame = {
    // interactive clients (psql) terminate statements with ';' — most
    // frontend regexes tolerate it, but DML and passthrough SQL don't
    val statement0 = statement00.replaceAll("[;\\s]+$", "")
    val statement1a = {
      val t = rewriteTvfs(statement0)
      // PG-only SELECT forms (ASOF JOIN, DISTINCT ON) rewrite on the
      // query surface; DDL/DML statements pass through untouched.
      // `FOR SYSTEM_TIME AS OF PROCTIME()` erases: a batch read of a
      // temporal join IS the current-snapshot join (the reference binds
      // proctime to now() in batch the same way, binder/relation/join.rs)
      if (t.matches("(?is)\\s*(SELECT|WITH|VALUES)\\b.*"))
        Engine.rewritePgSelect(Engine.TemporalJoinClause.replaceAllIn(t, ""))
      else t
    }
    // PG's current_setting('name') (psql \dconfig, ORM probes) splices
    // the live session-variable value as a literal
    val statement1 =
      if (statement1a.toLowerCase.contains("current_setting("))
        Engine.CurrentSettingRe.replaceAllIn(statement1a, m => {
          val n = canonicalVar(m.group(1))
          if (varDefaults.contains(n))
            java.util.regex.Matcher.quoteReplacement(
              "'" + varValue(n).replace("'", "''") + "'")
          else m.matched
        })
      else statement1a
    // PG's bare `current_user` / `session_user` keywords (ORM probes,
    // psql \conninfo flows) splice the live session user as a literal
    val statement1u =
      if ("(?i)\\b(current_user|session_user)\\b".r
          .findFirstIn(statement1).isDefined)
        Engine.mapOutsideLiterals(statement1)(_.replaceAll(
          "(?i)\\b(?:current_user|session_user)\\b(?!\\s*\\()",
          "'" + sessionUser + "'"))
      else statement1
    // introspection (psql \dt, pgjdbc getTables, ORMs): (re)bind the
    // pg_catalog/information_schema relations from the live catalog and
    // translate the Postgres dialect bits those clients emit
    val statement2 =
      if (SystemCatalog.referenced(statement1u)) {
        SystemCatalog.bind(spark, systemObjects,
          catalog.list[DurableCatalog.CommentEntry]("comments")
            .map { case (k, e) => k.replace('-', '.') -> e.text }.toMap,
          systemFunctions,
          varDefaults.toSeq.map { case (n, (boot, desc)) =>
            (n, varValue(n), boot, desc) },
          sessionSchemaNames,
          users.toSeq.map { case (n, e) =>
            (n, e.superuser, e.createdb, e.login) },
          {
            import scala.jdk.CollectionConverters._
            wireSessions.entrySet().iterator().asScala.toSeq.map { en =>
              val s = en.getValue
              (en.getKey, s.user, s.database, s.clientAddr,
                s.startedAtMs, visibleQuery(s.user, s.query))
            }
          },
          databases.toSeq)
        rwBind()
        val rw = SystemCatalog.rewrite(statement1u)
        // probes against catalog concepts this engine does not model
        // (policies, publications, …) answer empty, so psql's \d flow
        // and ORM introspection complete instead of erroring midway
        if (SystemCatalog.probesUnmodeled(rw))
          return try spark.sql(rw)
            catch { case scala.util.control.NonFatal(_) => spark.emptyDataFrame }
        rw
      } else statement1u
    // CREATE/DROP SCHEMA act on the namespace itself (their identifiers
    // must not resolve); everything else resolves schema-qualified and
    // search_path names to internal flat names at this single entry
    statement2 match {
      case CreateSchemaStmt(ifNot, name) =>
        return createSchema(name, ifNot != null)
      case DropSchemaStmt(ifEx, name, mode) =>
        return dropSchema(name, ifEx != null, mode)
      case UseDbStmt(name) =>
        if (!databaseExists(name)) throw new IllegalArgumentException(
          s"database \"$name\" does not exist")
        sessionDatabase = name
        // the session's search_path re-anchors to the new database's
        // namespace (its entries resolve through dbSchema per statement,
        // so the stored path text stays valid as-is)
        return statusDf("USE", name)
      case CreateDatabaseStmt(ifNot, name) =>
        if (databaseExists(name)) {
          if (ifNot == null) throw new IllegalArgumentException(
            s"database \"$name\" already exists")
        } else {
          require(isSuperuser(sessionUser) ||
            users.get(sessionUser).exists(_.createdb),
            s"permission denied to create database (as $sessionUser)")
          require(!name.contains("__") && !name.toLowerCase.contains("_0db"),
            s"database name $name may not contain '__' or '_0db' " +
              "(reserved markers)")
          databases += name
          catalog.save("databases", name, DurableCatalog.SchemaEntry(sessionUser))
          // the database's namespace root: its pseudo-public schema
          // (see [[sessionDatabase]] — databases compose on the schema
          // machinery, so creating one registers its public prefix)
          catalog.save("schemas", name + "_0db",
            DurableCatalog.SchemaEntry(sessionUser))
          schemaNames += name + "_0db"
        }
        return statusDf("CREATE DATABASE", name)
      case DropDatabaseStmt(ifEx, name) =>
        if (name == "dev") throw new IllegalArgumentException(
          "cannot drop the current database dev")
        if (name == sessionDatabase) throw new IllegalArgumentException(
          s"cannot drop the currently open database $name")
        if (!databases.contains(name)) {
          if (ifEx == null) throw new IllegalArgumentException(
            s"database \"$name\" does not exist")
        } else {
          require(isSuperuser(sessionUser), "permission denied")
          // PG drops a database's storage wholesale: cascade every
          // object in every one of its pseudo-schemas, then the schema
          // entries themselves
          val pseudo = schemaNames.toSeq.filter(dbOfSchema(_)._1 == name)
          val contained = allObjectNames.filter(n =>
            pseudo.exists(p => n.startsWith(p + "__"))).toSeq.sorted
          dropContained(s"DROP DATABASE $name", contained)
          pseudo.foreach { sn =>
            catalog.delete("schemas", sn)
            schemaNames -= sn
          }
          databases -= name
          catalog.delete("databases", name)
        }
        return statusDf("DROP DATABASE", name)
      case CreateSecretStmt(ifNot, name, value) =>
        require(isSuperuser(sessionUser) ||
          users.get(sessionUser).exists(_.createdb),
          s"permission denied to create secret (as $sessionUser)")
        if (secrets.contains(name)) {
          if (ifNot == null) throw new IllegalArgumentException(
            s"secret \"$name\" already exists")
        } else {
          secrets(name) = value
          catalog.save("secrets", name, DurableCatalog.SecretEntry(
            java.util.Base64.getEncoder.encodeToString(
              value.getBytes("UTF-8")), sessionUser))
        }
        return statusDf("CREATE SECRET", name)
      case AlterSecretStmt(name, value) =>
        // reference handler/alter_secret.rs ChangeCredential: rotate the
        // payload in place — connectors resolve at USE time, so every
        // later ${secret:name} substitution sees the new value
        require(secrets.contains(name), s"secret \"$name\" does not exist")
        require(isSuperuser(sessionUser) ||
          users.get(sessionUser).exists(_.createdb),
          s"permission denied to alter secret (as $sessionUser)")
        secrets(name) = value
        catalog.save("secrets", name, DurableCatalog.SecretEntry(
          java.util.Base64.getEncoder.encodeToString(
            value.getBytes("UTF-8")), sessionUser))
        return statusDf("ALTER SECRET", name)
      case DropSecretStmt(ifEx, name) =>
        if (!secrets.contains(name)) {
          if (ifEx == null) throw new IllegalArgumentException(
            s"secret \"$name\" does not exist")
        } else {
          require(isSuperuser(sessionUser),
            s"permission denied to drop secret (as $sessionUser)")
          secrets.remove(name)
          catalog.delete("secrets", name)
        }
        return statusDf("DROP SECRET", name)
      case ShowSecrets() =>
        // names only — the payload never crosses any result surface
        import spark.implicits._
        return secrets.keys.toSeq.sorted.map(n => (n, "meta"))
          .toDF("name", "backend")
      case CreateConnectionStmt(ifNot, name, optList) =>
        require(isSuperuser(sessionUser) ||
          users.get(sessionUser).exists(_.createdb),
          s"permission denied to create connection (as $sessionUser)")
        if (connections.contains(name)) {
          if (ifNot == null) throw new IllegalArgumentException(
            s"connection \"$name\" already exists")
        } else {
          val props = SqlFrontend.splitTopLevel(optList, ',').flatMap { kv =>
            kv.split("=", 2) match {
              case Array(k, v) => Some(k.trim.toLowerCase ->
                v.trim.stripPrefix("'").stripSuffix("'"))
              case _ => None
            }
          }.toMap
          require(props.nonEmpty,
            s"CREATE CONNECTION $name: WITH (…) must set properties")
          connections(name) = props
          catalog.save("connections", name,
            DurableCatalog.ConnectionEntry(props, sessionUser))
        }
        return statusDf("CREATE CONNECTION", name)
      case DropConnectionStmt(ifEx, name) =>
        if (!connections.contains(name)) {
          if (ifEx == null) throw new IllegalArgumentException(
            s"connection \"$name\" does not exist")
        } else {
          connections.remove(name)
          catalog.delete("connections", name)
        }
        return statusDf("DROP CONNECTION", name)
      case ShowConnections() =>
        import spark.implicits._
        // property VALUES stay out of the listing (they may carry
        // ${secret:…} refs or endpoints) — name, type, key names only
        return connections.toSeq.sortBy(_._1).map { case (n, p) =>
          (n, p.getOrElse("type", "generic"),
            p.keys.toSeq.sorted.mkString(","))
        }.toDF("name", "type", "properties")
      case ShowProcessList() =>
        import spark.implicits._
        val now = System.currentTimeMillis()
        return {
          import scala.jdk.CollectionConverters._
          wireSessions.entrySet().iterator().asScala.toSeq
            .sortBy(_.getKey)
            .map { e =>
              val s = e.getValue
              (e.getKey, s.user, s.clientAddr, s.database,
                if (s.query.nonEmpty) (now - s.queryStartMs) / 1000 else 0L,
                visibleQuery(s.user, s.query))
            }
            .toDF("id", "user", "host", "database", "time", "info")
        }
      case KillStmt(pidS) =>
        require(isSuperuser(sessionUser),
          s"permission denied to kill backends (as $sessionUser)")
        val pid = pidS.toInt
        val s = Option(wireSessions.get(pid)).getOrElse(
          throw new IllegalArgumentException(s"no backend with pid $pid"))
        s.kill()
        wireSessions.remove(pid)
        return statusDf("KILL", pidS)
      case _ =>
    }
    val statement =
      rewriteTimeTravel(resolveSchemas(Engine.rewritePatternOps(statement2)))
    handleUserStatement(statement) match {
      case Some(df) => return df
      case None =>
    }
    checkPrivileges(statement)
    // owner records before dispatch: a failed CREATE leaves a stale
    // entry keyed by a non-existent object (harmless, next CREATE of
    // that name overwrites)
    recordOwner(statement)
    bindMvTables(statement)
    statement match {
      case Discard(kind) =>
        // PG semantics: DISCARD ALL resets session state (GUCs back to
        // defaults, role back to the connection identity); the narrower
        // forms have nothing engine-side to release and just ack
        if (kind.equalsIgnoreCase("ALL")) {
          sessionVars.keys.toSeq
            .foreach(n => applyVarBehavior(n, defaultOf(n)))
          sessionVars.clear()
        }
        return statusDf("DISCARD", "")
      case CommentOn(_, target, text, nul) =>
        // catalog keys are \w+; object names are too, so the dot of a
        // column target encodes unambiguously as '-'
        val key = target.replace('.', '-')
        if (nul != null) catalog.delete("comments", key)
        else catalog.save("comments", key,
          DurableCatalog.CommentEntry(text.replace("''", "'")))
        return statusDf("COMMENT", target)
      case CreateTableAs(name, pkList, query) =>
        bindMvTables(query)
        val q = spark.sql(query)
        require(!q.isStreaming,
          s"CREATE TABLE $name AS requires a batch query (use CREATE " +
            "MATERIALIZED VIEW for streaming input)")
        val (df, pk) = Option(pkList) match {
          case Some(cols) =>
            val p = cols.split(",").map(_.trim).toSeq
            require(p.forall(q.columns.contains),
              s"CREATE TABLE $name: PRIMARY KEY names columns absent " +
                "from the query output")
            (q, p)
          case None =>
            hiddenRowIdTables += name
            (graft.operators.Dml.withRowId(q), Seq(Engine.RowIdCol))
        }
        val mv = mvs.define(name, pk)
        mv.merge(df)
        tableSchemas(name) = mv.read().schema
        catalog.save("tables", name,
          DurableCatalog.TableEntry(tableSchemas(name).json, pk, Map.empty,
            Some(mv.nBuckets)))
        return statusDf("CREATE TABLE", name)
      case _ =>
    }
    SqlFrontend.parseCreateTable(statement) match {
      case Some(SqlFrontend.TableDef(name, schema, pk, defaults,
          generated, onConflict)) =>
        // a user table IS a PK-merged MV with DML as its only writer
        // (reference: handler/create_table.rs — tables are materialized
        // states fed by DML/source, same storage as MVs)
        if (allObjectNames.contains(name)) {
          // PG semantics: duplicate names error (42P07); IF NOT EXISTS
          // is a no-op — never silently redefine over live storage
          if ("(?is)^\\s*CREATE\\s+TABLE\\s+IF\\s+NOT\\s+EXISTS\\b".r
              .findPrefixMatchOf(statement).isDefined)
            return statusDf("CREATE TABLE", name)
          throw new IllegalArgumentException(
            s"relation \"${displayName(name)}\" already exists")
        }
        require(pk.forall(schema.fieldNames.contains),
          s"CREATE TABLE $name: PRIMARY KEY names undeclared columns")
        require(!pk.exists(generated.contains),
          s"CREATE TABLE $name: a generated column cannot be the PRIMARY KEY")
        // No declared PK → append-only table keyed by a generated hidden
        // `_row_id` (reference: handler/create_table.rs:476-517
        // bind_pk_and_row_id_on_relation adds the row_id column when
        // pk_column_ids is empty) — hidden from star expansion, filled
        // by the INSERT path, addressable in queries (`mod(_row_id, n)`
        // lookup keys, nexmark q13-by-row-id).
        val (schemaK, pkK) =
          if (pk.nonEmpty) (schema, pk)
          else {
            hiddenRowIdTables += name
            (schema.add(Engine.RowIdCol,
              org.apache.spark.sql.types.LongType), Seq(Engine.RowIdCol))
          }
        val tmv = mvs.define(name, pkK)
        tmv.declareSchema(schemaK)
        tableSchemas(name) = schemaK
        if (defaults.nonEmpty) tableDefaults(name) = defaults
        if (generated.nonEmpty) tableGenerated(name) = generated
        onConflict.foreach(tableOnConflict(name) = _)
        catalog.save("tables", name,
          DurableCatalog.TableEntry(schemaK.json, pkK, defaults,
            Some(tmv.nBuckets),
            Some(generated).filter(_.nonEmpty), onConflict))
        statusDf("CREATE TABLE", name)
      case None =>
    // connection objects splice into source/sink WITH clauses here
    val statementC =
      if ("(?is)^\\s*CREATE\\s+(SOURCE|SINK|TABLE)\\b".r
          .findFirstIn(statement).isDefined)
        resolveConnectionRefs(statement)
      else statement
    SqlFrontend.parseCreateSource(statementC) match {
      case Some(d: SourceDef) =>
        val stream = SqlFrontend.planSource(spark, d)
        sources(d.name) = stream
        stream.createOrReplaceTempView(d.name)
        catalog.save("sources", d.name, DurableCatalog.SourceEntry(statementC))
        statusDf("CREATE SOURCE", d.name)
      case None => SqlFrontend.parseCreateSink(statementC) match {
      case Some(d: SqlFrontend.SinkDef) => startSink(d)
      case None if SqlFrontend.parseCreateSinkAs(statementC).isDefined =>
        startSinkFromQuery(SqlFrontend.parseCreateSinkAs(statementC).get)
      case None if CreateChangelogMvStmt.pattern.matcher(statement).matches() =>
        val CreateChangelogMvStmt(name, subName, relName, selectSql) = statement
        createChangelogMv(name, subName, relName, selectSql)
      case None => SqlFrontend.parseCreateMv(statement) match {
        case Some(CreateMvDef(name, pkOpt, query, emitOnClose, ifNotExists)) =>
          // PG semantics (42P07): a duplicate name errors, IF NOT EXISTS
          // is a no-op. Silent redefinition would be worse than the
          // usual reasons here: re-creating a CHAINED MV re-subscribes
          // at the CURRENT upstream frontier, dropping any published-
          // but-not-yet-consumed epochs on the floor (found by
          // CrashRecoverySpec's reordered-publish probe).
          if (allObjectNames.contains(name)) {
            if (ifNotExists)
              return statusDf("CREATE MATERIALIZED VIEW", name)
            throw new IllegalArgumentException(
              s"relation \"${displayName(name)}\" already exists")
          }
          // a query over a just-created streaming MV would plan against
          // an empty zero-column binding — drain referenced MV jobs once
          // (the reference's create-MV barrier), then re-bind
          referencedRelations(query)
            .foreach(n => jobs.get(n).foreach(_.processAllAvailable()))
          bindMvTables(query)
          // the reference's temporal-join clause (`JOIN dim FOR SYSTEM_TIME
          // AS OF PROCTIME() ON …`, src/frontend/src/binder/relation/join.rs):
          // in Spark a stream-static join already has lookup semantics —
          // the dim side is re-scanned per micro-batch — so the clause
          // erases to a plain join of the registered batch table
          val result = spark.sql(Engine.rewritePgSelect(
            Engine.TemporalJoinClause.replaceAllIn(query, "")))
          val pk = pkOpt.getOrElse(throw new IllegalArgumentException(
            s"CREATE MATERIALIZED VIEW $name requires an explicit " +
              "(PRIMARY KEY (…)) clause — merging on a guessed key would " +
              "silently drop rows"))
          if (result.isStreaming) {
            val hasOver = result.queryExecution.analyzed.collectFirst {
              case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
            }.isDefined
            if (hasOver) createOverMv(name, pk, query)
            else {
              // EMIT ON WINDOW CLOSE → append mode: only watermark-
              // finalized rows reach the MV (reference EmitMode::OnWindowClose)
              val mode = if (emitOnClose) "append" else "update"
              jobs(name) = createMaterializedView(name, pk,
                withChangelogOps(query, result),
                outputMode = mode, queryText = Some(query))
              // a per-row now()-horizon over a streaming source gets the
              // same eviction/read semantics as the chained form
              if (isPerRowPlan(result))
                registerTemporalFilter(name, query, result.columns.toSeq)
              statusDf("CREATE MATERIALIZED VIEW (streaming)", name)
            }
          } else {
            // SQL-level MV-on-MV (reference: docs/dev/src/design/
            // mv-on-mv.md): when the single upstream relation is itself
            // a streaming-maintained MV and the transform is per-row,
            // chain continuously through the upstream's changelog —
            // `CREATE MV b AS SELECT … FROM a` then advances with `a`,
            // no manual refresh.
            // The temporal-join clause erases HERE too (chain planners
            // re-parse the text): in a chain, the dim side is re-read
            // per epoch AND its own changes re-join — per-epoch-current
            // semantics, the chain-consistent rendering of PROCTIME()
            val queryC = Engine.TemporalJoinClause.replaceAllIn(query, "")
            chainableUpstream(queryC, result) match {
              case Some(upName) => createChainedMv(name, pk, queryC, upName)
              case None => chainableAggUpstream(queryC, result, pk) match {
              case Some((upName, groupCols)) =>
                createChainedAggMv(name, pk, queryC, upName, groupCols)
              case None => chainableJoinUpstream(queryC, result, pk) match {
              case Some((leftName, rightName, joinKind)) =>
                createChainedJoinMv(name, pk, queryC, leftName, rightName,
                  joinKind)
              case None => chainableDynFilterUpstream(queryC, result, pk) match {
              case Some(_) =>
                createChainedDynFilterMv(name, pk, queryC)
              case None => chainableDynSetUpstream(queryC, result, pk) match {
              case Some(_) =>
                createChainedDynSetMv(name, pk, queryC)
              case None => chainableTopNUpstream(queryC, result, pk) match {
              case Some(_) =>
                createChainedTopNMv(name, pk, queryC)
              case None => chainableOverUpstream(queryC, result) match {
              case Some(upName) =>
                createChainedOverMv(name, pk, queryC, upName)
              case None => chainableUnionUpstream(queryC, result, pk) match {
              case Some((leftName, rightName)) =>
                createChainedUnionMv(name, pk, queryC, leftName, rightName)
              case None => chainableAggUnionUpstream(queryC, result, pk) match {
              case Some((leftName, rightName, groupCols)) =>
                createChainedAggUnionMv(name, pk, queryC, leftName, rightName,
                  groupCols)
              case None => createCascadedJoinMv(name, pk, queryC) match {
              case Some(df) => df
              case None =>
                // explicit fence (reference delta-join boundary): a query
                // over STREAMING upstreams that no incremental-chain shape
                // accepts (pure-theta join with no equi prefix, 3+-way
                // joins in one statement, …) degrades to batch refresh —
                // say so loudly instead of silently going stale
                // tables count: a DML table is a live upstream too — an
                // MV over one that cannot chain goes stale just the same
                val streamingUps = referencedRelations(query)
                  .filter(n => chainableSourcePk(n).isDefined)
                if (streamingUps.nonEmpty)
                  notice(s"materialized view $name over streaming " +
                    s"upstream(s) ${streamingUps.mkString(", ")} is not " +
                    "incrementally maintainable (no supported chain shape " +
                    "— e.g. a non-equi join needs at least one equality " +
                    "conjunct); maintained as BATCH REFRESH — run REFRESH " +
                    s"MATERIALIZED VIEW $name to update")
                refreshMaterializedView(name, pk, result,
                  queryText = Some(query)).read()
            } } } } } } } } } }
          }
        case None if SqlFrontend.isRecursiveCte(statement) =>
          SqlFrontend.executeRecursive(spark, statement)
        case None => statement match {
          case DropMv(name) =>
            // reference: dropping a relation other MVs depend on is
            // rejected (catalog dependency check, meta/src/controller/)
            fenceChainedDependents(name, "DROP MATERIALIZED VIEW")
            jobs.remove(name).foreach(_.stop())
            temporalFilters.remove(name)
            mvs.drop(name)
            mvs.drop(s"${name}__base") // OVER-window / dyn-filter state
            mvs.drop(s"${name}__keys") // dyn-set filter's key-set state
            catalog.delete("mvs", name)
            // the bindMvTables temp view must die with the definition, or
            // the dropped MV stays silently queryable with stale data
            spark.catalog.dropTempView(name)
            // cascade-join internals die with their user-visible MV
            // (reverse order — step k+1 chains from step k)
            mvs.list.filter(_.startsWith(s"${name}__casc"))
              .sorted.reverse.foreach { c =>
                jobs.remove(c).foreach(_.stop())
                mvs.drop(c)
                catalog.delete("mvs", c)
                spark.catalog.dropTempView(c)
              }
            statusDf("DROP MATERIALIZED VIEW", name)
          case DropSink(name) =>
            jobs.remove(name).foreach(_.stop())
            sinkNames -= name
            val sinkFrom =
              catalog.load[DurableCatalog.SinkEntry]("sinks", name).map(_.from)
            catalog.delete("sinks", name)
            // an AS-query sink's hidden internal MV dies with it
            sinkFrom.filter(_ == s"${name}__sinkq").foreach(internal =>
              execute(s"DROP MATERIALIZED VIEW $internal"))
            statusDf("DROP SINK", name)
          case ShowMv() =>
            import spark.implicits._
            // tables are PK-merged MV stores internally, but SHOW
            // MATERIALIZED VIEWS lists only real MVs (reference
            // handler/show.rs filters by relation kind)
            showListing(mvs.list.filterNot(n => n.endsWith("__base") ||
              n.endsWith("__keys") || n.contains("__casc") ||
              n.endsWith("__sinkq") ||
              tableSchemas.contains(n))).toDF("name")
          case ShowCreate(kind, name) => showCreate(kind, name)
          case ShowSources() =>
            import spark.implicits._
            showListing(sources.keys.toSeq).toDF("name")
          case CreateIndexStmt(name, tbl, colList, include, distBy) =>
            val keys = colList.split(",").map(_.trim)
              .map(_.split("\\s+")(0)).toSeq // strip ASC/DESC/NULLS …
            Seq(Option(include), Option(distBy)).flatten.foreach { cl =>
              val cols = cl.split(",").map(_.trim.split("\\s+")(0))
              val have = table(tbl).columns.toSet
              val bad = cols.filterNot(have)
              require(bad.isEmpty,
                s"CREATE INDEX $name: unknown columns ${bad.mkString(",")}")
            }
            Option(distBy).foreach { d =>
              val dk = d.split(",").map(_.trim).toSeq
              require(keys.startsWith(dk),
                s"CREATE INDEX $name: DISTRIBUTED BY must be a prefix " +
                  s"of the index key (got $dk vs $keys)")
            }
            if ("(?i)IF\\s+NOT\\s+EXISTS".r.findFirstIn(statement).isDefined &&
                indexes.contains(name)) statusDf("CREATE INDEX", name)
            else createIndex(name, tbl, keys)
          case DropIndexStmt(name) if indexes.contains(name) =>
            indexes.remove(name)
            catalog.delete("indexes", name)
            statusDf("DROP INDEX", name)
          case ShowIndexes() =>
            import spark.implicits._
            indexes.toSeq.filter(kv => inSessionDb(kv._1)).sortBy(_._1)
              .map { case (n, d) => (n, d.table, d.keys.mkString(",")) }
              .toDF("name", "on_table", "keys")
          case CreateView(name, query) =>
            // reference: handler/create_view.rs — a non-materialized view
            // is a bound query replayed at read. Session tables here live
            // in the temp catalog, so the view is a temp view (a
            // permanent Spark view cannot reference temp relations).
            spark.sql(query).createOrReplaceTempView(name)
            catalog.save("views", name, DurableCatalog.ViewEntry(query))
            statusDf("CREATE VIEW", name)
          case DropView(name) =>
            catalog.delete("views", name)
            spark.sql(statement) // keep Spark's errors (unknown view etc.)
          case TxnStmt(kw, _) =>
            // reference: handler/transaction.rs — transactions are
            // single-query read-only snapshots; BEGIN/COMMIT bracket
            // statements without changing semantics. Acknowledged as
            // no-ops (every graft statement already reads a consistent
            // parquet snapshot).
            statusDf(kw.toUpperCase.replaceAll("\\s+", " "), "")
          case ShowJobs() =>
            // reference: SHOW JOBS (handler/show.rs) — the streaming-job
            // observability surface; status from the live query handle
            import spark.implicits._
            jobs.toSeq.sortBy(_._1)
              .map { case (n, q) => (n, q.isActive, q.status.message) }
              .toDF("name", "active", "status")
          case CancelJobs(list) =>
            // reference: handler/cancel_job.rs — stop the named (or
            // rw_streaming_jobs-id'd) streaming jobs; each stops at a
            // batch boundary (processAllAvailable first would block on a
            // busy source — CANCEL is the impatient path)
            import spark.implicits._
            val byId = jobIdMap
            val targets = list.split(",").toSeq.map(_.trim).map { t =>
              if (t.forall(_.isDigit)) byId.getOrElse(t.toInt,
                throw new IllegalArgumentException(s"no job with id $t"))
              else t
            }
            targets.map { n =>
              val q = jobs.getOrElse(n,
                throw new IllegalArgumentException(s"no such job $n"))
              if (q.isActive) q.stop()
              n
            }.toDF("canceled")
          case WaitStmt() =>
            // reference: handler/wait.rs — block until every streaming
            // job has processed all available input (a global barrier)
            drainAllJobs()
            statusDf("WAIT", "")
          case RecoverStmt() =>
            // reference: handler/recover.rs — ad-hoc recovery trigger;
            // here: retry every parked catalog recovery (e.g. sources
            // whose backing files appeared after startup)
            retryPendingRecovery()
            statusDf("RECOVER", "")
          case AlterParallelism(kindS, name, n) =>
            alterParallelism(kindS, name, n)
          case AlterRateLimitStmt(kindS, name, limitKind, value) =>
            // reference alter_streaming_rate_limit.rs. SOURCE is real:
            // the option re-plans the reader with a per-micro-batch
            // admission cap (files/trigger — see planSource); running
            // downstream jobs pick it up on their next (re)start, the
            // same way the reference applies it at the next barrier.
            // TABLE/MV forms fence loudly: DML here is batch-atomic and
            // backfill is one consistent batch — there is no admission
            // stream to meter.
            if (!kindS.equalsIgnoreCase("SOURCE"))
              throw new IllegalArgumentException(
                s"ALTER ${kindS.toUpperCase} SET $limitKind is not " +
                  "applicable: table DML and MV backfill run batch-atomic " +
                  "in this engine; only ALTER SOURCE meters admission")
            val entry = catalog.load[DurableCatalog.SourceEntry](
              "sources", name).getOrElse(throw new IllegalArgumentException(
                s"ALTER SOURCE: no such source $name"))
            val stripped = entry.ddl.replaceAll(
              "(?i)source_rate_limit\\s*=\\s*'?\\d+'?\\s*,?\\s*", "")
            val newDdl =
              if (value.equalsIgnoreCase("DEFAULT")) stripped
              else stripped.replaceFirst("(?i)WITH\\s*\\(",
                s"WITH (source_rate_limit = '$value', ")
            replanSource(name, newDdl, s"ALTER SOURCE SET $limitKind")
          case AlterSourceAddCol(name, cname, ctype)
              if sources.contains(name) =>
            // reference alter_source_column.rs: schema evolution on a
            // declared-column source — the stored DDL's column block
            // gains the field and the reader re-plans. Inferred-schema
            // sources (no declared block) fence loudly: their shape IS
            // the files', there is nothing to evolve engine-side.
            SqlFrontend.sqlType(ctype) // validate the type spelling
            val entry = catalog.load[DurableCatalog.SourceEntry](
              "sources", name).getOrElse(throw new IllegalArgumentException(
                s"ALTER SOURCE: no such source $name"))
            val ddl = entry.ddl
            val headEnd = "(?is)^\\s*CREATE\\s+SOURCE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?\\w+"
              .r.findFirstMatchIn(ddl).map(_.end).getOrElse(
                throw new IllegalStateException(s"unparseable DDL for $name"))
            val openAt = ddl.indexWhere(!_.isWhitespace, headEnd)
            require(openAt >= 0 && ddl.charAt(openAt) == '(',
              s"ALTER SOURCE $name ADD COLUMN: the source has no declared " +
                "column list (schema is inferred from its files) — " +
                "re-create it with explicit columns to evolve the schema")
            // find the matching close (types like DECIMAL(10,2) nest)
            var depth = 0; var i = openAt; var closeAt = -1
            while (closeAt < 0 && i < ddl.length) {
              ddl.charAt(i) match {
                case '(' => depth += 1
                case ')' => depth -= 1; if (depth == 0) closeAt = i
                case _ =>
              }
              i += 1
            }
            require(closeAt > openAt, s"unbalanced column list in $name DDL")
            val block = ddl.substring(openAt + 1, closeAt)
            require(!("(?i)(?<![\\w])" + cname + "\\s").r
              .findFirstIn(block).isDefined,
              s"ALTER SOURCE $name: column $cname already exists")
            val newDdl = ddl.substring(0, closeAt) +
              s", $cname $ctype" + ddl.substring(closeAt)
            replanSource(name, newDdl, "ALTER SOURCE ADD COLUMN")
          case AlterOwner(kindS, name, user) => alterOwner(kindS, name, user)
          case AlterSetSchema(kindS, name, target) =>
            alterSetSchema(kindS, name, target)
          case AlterSwap(kindS, a, b) => alterSwap(kindS, a, b)
          case ShowSinks() =>
            import spark.implicits._
            showListing(sinkNames.toSeq).toDF("name")
          case DropTable(name) if mvs.get(name).isDefined =>
            fenceChainedDependents(name, "DROP TABLE")
            mvs.drop(name)
            tableSchemas.remove(name)
            tableDefaults.remove(name)
            tableGenerated.remove(name)
            tableOnConflict.remove(name)
            catalog.delete("tables", name)
            spark.catalog.dropTempView(name) // see DropMv
            statusDf("DROP TABLE", name)
          case ShowTables() if tableSchemas.nonEmpty =>
            import spark.implicits._
            showListing(tableSchemas.keys.toSeq).toDF("name")
          case Describe(name) if mvs.get(name).isDefined =>
            // reference: handler/describe.rs — column name/type rows plus
            // the trailing "primary key" / "distribution key" /
            // "table description" summary rows psql users see; MVs are
            // not in the Spark catalog, so describe off the stored schema
            // (or the declared CREATE TABLE schema while still empty)
            import spark.implicits._
            val mv = mvs.get(name).get
            val cols = table(name).schema.fields.toSeq
              .map(f => (f.name, f.dataType.simpleString))
            val distKeys =
              if (mv.bucketKeys.nonEmpty) mv.bucketKeys else mv.primaryKey
            (cols ++ Seq(
              ("primary key", mv.primaryKey.mkString(", ")),
              ("distribution key", distKeys.mkString(", ")),
              ("table description", name)))
              .toDF("name", "type")
          case ShowInternalTables() =>
            // reference: SHOW INTERNAL TABLES (handler/show.rs) — the
            // hidden state relations behind visible objects: cascade
            // steps, AS-query sink MVs, OVER-window base copies
            import spark.implicits._
            mvs.list.filter(n => n.endsWith("__base") ||
              n.endsWith("__keys") || n.contains("__casc") ||
              n.endsWith("__sinkq")).toDF("name")
          case ExplainAnalyze(rest) =>
            // reference: handler/explain_analyze.rs — run the query to
            // completion, then render the FINAL physical plan (post-AQE)
            // with each operator's actual runtime metrics (rows, sizes,
            // times) from Spark's SQLMetrics
            import spark.implicits._
            bindMvTables(rest)
            val df = spark.sql(rest)
            // run THE instrumented plan (df.foreach would execute a
            // separate copy, leaving these metrics at zero); count() on
            // the InternalRow RDD keeps rows off the driver
            df.queryExecution.executedPlan.execute().count()
            import org.apache.spark.sql.execution.SparkPlan
            import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
            def finalPlan(p: SparkPlan): SparkPlan = p match {
              case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
              case q: QueryStageExec => finalPlan(q.plan) // AQE stage wrapper
              case other => other
            }
            def render(p: SparkPlan, depth: Int): Seq[String] = {
              val ms = p.metrics.toSeq
                .filter { case (_, m) => m.value > 0 }
                .sortBy(_._1)
                .map { case (k, m) => s"$k=${m.value}" }
              val line = ("  " * depth) + p.nodeName +
                (if (ms.nonEmpty) ms.mkString(" [", ", ", "]") else "")
              line +: p.children.flatMap(c => render(finalPlan(c), depth + 1))
            }
            render(finalPlan(df.queryExecution.executedPlan), 0).toDF("plan")
          case Explain(rest) =>
            // reference: handler/explain.rs — EXPLAIN CREATE MATERIALIZED
            // VIEW reports the MAINTENANCE STRATEGY the chain planner
            // would pick (the reference prints its stream plan) and then
            // the inner SELECT's batch plan; plain EXPLAIN plans the
            // query. One plan line per row, like the reference's output.
            import spark.implicits._
            val (strategy, planned) = SqlFrontend.parseCreateMv(rest) match {
              case Some(d: CreateMvDef) =>
                val q = Engine.TemporalJoinClause.replaceAllIn(d.query, "")
                referencedRelations(q)
                  .foreach(n => jobs.get(n).foreach(_.processAllAvailable()))
                bindMvTables(q)
                val df = spark.sql(Engine.rewritePgSelect(q))
                (Seq(explainMvStrategy(d, q, df)), df)
              case None => (Nil, spark.sql(rest))
            }
            (strategy ++ planned.queryExecution
              .explainString(org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
              .split("\n").toSeq).toDF("plan")
          // schema evolution on CREATE TABLE tables (reference:
          // handler/alter_table_column.rs): declared schema updates +
          // eager store rewrite so merges stay schema-uniform
          case AlterRename(kindS, from, to) if mvs.get(from).isDefined =>
            renameObject(kindS, from, to)
          case AlterAddCol(name, cname, ctype, dflt) if tableSchemas.contains(name) =>
            val t = SqlFrontend.sqlType(ctype)
            require(!tableSchemas(name).fieldNames.contains(cname),
              s"ALTER TABLE $name: column $cname already exists")
            fenceChainedDependents(name, "ALTER TABLE")
            tableSchemas(name) = org.apache.spark.sql.types.StructType(
              tableSchemas(name).fields :+
                org.apache.spark.sql.types.StructField(cname, t))
            // DEFAULT: existing rows backfill with the expression NOW
            // (PG semantics for a constant default) and future narrow
            // INSERTs keep filling it via the declared-default path
            val fill = Option(dflt)
              .map(d => org.apache.spark.sql.functions.expr(d).cast(t))
              .getOrElse(org.apache.spark.sql.functions.lit(null).cast(t))
            mvs.get(name).foreach(_.rewriteSchema(_.withColumn(cname, fill)))
            Option(dflt).foreach { d =>
              tableDefaults(name) =
                tableDefaults.getOrElse(name, Map.empty) + (cname -> d)
            }
            saveTableEntry(name)
            statusDf("ALTER TABLE", name)
          case AlterDropCol(name, cname) if tableSchemas.contains(name) =>
            require(tableSchemas(name).fieldNames.contains(cname),
              s"ALTER TABLE $name: no such column $cname")
            fenceChainedDependents(name, "ALTER TABLE")
            require(!mvs.get(name).exists(_.primaryKey.contains(cname)),
              s"ALTER TABLE $name: cannot drop PRIMARY KEY column $cname")
            tableSchemas(name) = org.apache.spark.sql.types.StructType(
              tableSchemas(name).fields.filterNot(_.name == cname))
            mvs.get(name).foreach(_.rewriteSchema(_.drop(cname)))
            saveTableEntry(name)
            statusDf("ALTER TABLE", name)
          case RefreshMvStmt(name) =>
            refreshMvStatement(name)
          case CreateEmbeddedUdtfStmt(name, args, cols, lang, body) =>
            createEmbeddedUdtf(name, args, cols, lang, body)
          case CreateEmbeddedFunctionStmt(name, args, ret, lang, body) =>
            createEmbeddedFunction(name, args, ret, lang, body)
          case CreateExternalFunctionStmt(name, args, ret, lang, ident, link) =>
            createExternalFunction(name, args, ret, lang, ident, link)
          case DropFunctionStmt(name) if embeddedFns.contains(name) =>
            embeddedFns.remove(name)
            spark.sessionState.functionRegistry.dropFunction(
              org.apache.spark.sql.catalyst.FunctionIdentifier(name))
            catalog.delete("embeddedfns", name)
            statusDf("DROP FUNCTION", name)
          case DropFunctionStmt(name) if embeddedUdtfs.contains(name) =>
            embeddedUdtfs.remove(name)
            spark.sessionState.functionRegistry.dropFunction(
              org.apache.spark.sql.catalyst.FunctionIdentifier(name))
            catalog.delete("embeddedudtfs", name)
            statusDf("DROP FUNCTION", name)
          case DropFunctionStmt(name) if externalFns.contains(name) =>
            externalFns.remove(name)
            spark.sessionState.functionRegistry.dropFunction(
              org.apache.spark.sql.catalyst.FunctionIdentifier(name))
            catalog.delete("externalfns", name)
            statusDf("DROP FUNCTION", name)
          case CreateEmbeddedAggregateStmt(name, args, ret, lang, body) =>
            createEmbeddedAggregate(name, args, ret, lang, body)
          case CreateAggregateStmt(name, _, _, lang, impl, opts) =>
            createAggregate(name, lang, impl, opts)
          case DropAggregateStmt(name) if embeddedAggs.contains(name) =>
            embeddedAggs.remove(name)
            spark.sessionState.functionRegistry.dropFunction(
              org.apache.spark.sql.catalyst.FunctionIdentifier(name))
            catalog.delete("embeddedaggs", name)
            statusDf("DROP AGGREGATE", name)
          case DropAggregateStmt(name) if aggregates.contains(name) =>
            aggregates.remove(name)
            spark.sessionState.catalog.dropTempFunction(name, ignoreIfNotExists = true)
            catalog.delete("aggregates", name)
            statusDf("DROP AGGREGATE", name)
          case ShowAggregates() =>
            import spark.implicits._
            (aggregates.toSeq
              .map { case (n, (impl, sig)) => (n, impl, sig) } ++
              embeddedAggs.toSeq.map { case (n, e) =>
                (n, e.lang,
                  s"(${e.argTypes.mkString(", ")}) RETURNS ${e.retType}")
              }).sortBy(_._1)
              .toDF("name", "implementation", "signature")
          case CreateSubscription(name, from) =>
            require(mvs.get(from).isDefined,
              s"CREATE SUBSCRIPTION $name: unknown materialized view $from")
            subscriptions(name) = from
            catalog.save("subscriptions", name, DurableCatalog.SubEntry(from))
            statusDf("CREATE SUBSCRIPTION", name)
          case DropSubscription(name) =>
            subscriptions.remove(name)
            cursors.filterInPlace { case (cur, (sub, _)) =>
              if (sub == name) catalog.delete("cursors", cur)
              sub != name
            }
            catalog.delete("subscriptions", name)
            statusDf("DROP SUBSCRIPTION", name)
          case ShowSubscriptions() =>
            import spark.implicits._
            subscriptions.keys.toSeq.sorted.toDF("name")
          case ShowCursorsStmt(subWord) =>
            // reference handler/show.rs ShowObject::Cursor /
            // ::SubscriptionCursor — session/user identity plus, for
            // subscription cursors, the subscription and frontier state
            import spark.implicits._
            if (subWord != null)
              cursors.toSeq.sortBy(_._1).map { case (cur, (sub, pos)) =>
                (sessionUser, sessionDatabase, cur, sub,
                  s"frontier=$pos" +
                    cursorSkip.get(cur).map(s => s" skip=$s").getOrElse(""))
              }.toDF("user", "database", "cursor_name",
                "subscription_name", "state")
            else
              queryCursors.keys.toSeq.sorted
                .map(c => (sessionUser, sessionDatabase, c))
                .toDF("user", "database", "cursor_name")
          case DeclareCursor(cur, sub, mode0) =>
            val mvName = subscriptions.getOrElse(sub,
              throw new IllegalArgumentException(s"unknown subscription $sub"))
            // starting frontier (reference e2e_test/subscription/main.py
            // drives all four forms): FULL / SINCE begin() replay the
            // entire retained log; default / SINCE now() deliver only
            // changes after declaration; SINCE <unix_ms> starts at the
            // first epoch committed at or after that wall time
            val mv = mvs.get(mvName).get
            val mode = Option(mode0).map(
              _.trim.toLowerCase.replaceAll("\\s+", "")).getOrElse("")
            // pin under the compaction gate: a compactor pass that
            // already computed its frontier must not expire epochs this
            // brand-new cursor still needs (advice r8)
            val pos = compactionGate.synchronized {
              val p =
                if (mode == "full" || mode.startsWith("sincebegin")) -1L
                else if (mode.isEmpty || mode.startsWith("sincenow"))
                  mv.latestChangelogBatchId
                else {
                  val ms = mode.stripPrefix("since").takeWhile(_.isDigit).toLong
                  mv.epochCommitTimes.filter(_._2 < ms)
                    .map(_._1).sorted.lastOption.getOrElse(-1L)
                }
              cursors(cur) = (sub, p)
              p
            }
            catalog.save("cursors", cur, DurableCatalog.CursorEntry(sub, pos))
            statusDf("DECLARE CURSOR", cur)
          case DeclareQueryCursor(cur, query) =>
            bindMvTables(query)
            val df = spark.sql(query)
            require(!df.isStreaming,
              s"DECLARE $cur CURSOR requires a batch query")
            queryCursors(cur) = (df.schema, df.toLocalIterator())
            statusDf("DECLARE CURSOR", cur)
          case CloseCursor(cur) if cursors.contains(cur) =>
            cursors.remove(cur)
            catalog.delete("cursors", cur)
            statusDf("CLOSE", cur)
          case CloseCursor(cur) if queryCursors.contains(cur) =>
            queryCursors.remove(cur)
            statusDf("CLOSE", cur)
          case FetchCursor(count, cur) if cursors.contains(cur) =>
            fetchCursor(cur, count)
          case FetchCursor(count, cur) if queryCursors.contains(cur) =>
            fetchQueryCursor(cur, count)
          case Flush() =>
            // the reference's FLUSH: block until every stream job has
            // processed all available input (barrier-completion analog).
            // Chained MVs drain AFTER their upstream — depth order —
            // so one pass settles a whole a→b→c chain
            drainAllJobs()
            autoCompactStores()
            statusDf("FLUSH", "")
          case Vacuum(name) =>
            // PG's VACUUM verb driving the reference's checkpoint +
            // vacuum cycle: drain to quiescence, snapshot at the
            // retention frontier, expire history below it. Bare VACUUM
            // sweeps every store.
            drainAllJobs()
            val targets = Option(name) match {
              case Some(n) =>
                require(mvs.get(n).isDefined,
                  s"VACUUM: $n is not an engine-managed table or " +
                    "materialized view")
                Seq(n)
              case None => mvs.list
            }
            targets.foreach { n =>
              mvs.get(n).foreach { mv =>
                val frontier = retentionFrontier(n)
                if (frontier > mv.latestSnapshotEpoch) mv.compactTo(frontier)
              }
            }
            statusDf("VACUUM", Option(name).getOrElse(""))
          case AlterSystemSet(rawName, rawValue) =>
            // reference handler/alter_system.rs / PG's auto.conf layer:
            // a durable instance-wide default under any session SETs
            val name = canonicalVar(rawName)
            require(isSuperuser(sessionUser),
              s"permission denied: ALTER SYSTEM requires superuser " +
                s"(as $sessionUser)")
            require(varDefaults.contains(name),
              s"unrecognized configuration parameter \"$name\"")
            require(!readOnlyVars.contains(name),
              s"parameter \"$name\" cannot be changed")
            parseVarValue(rawValue) match {
              case Some(v) =>
                systemDefaults(name) = v
                catalog.save("sysvars", name, DurableCatalog.SysVarEntry(v))
              case None => // SET x TO DEFAULT == RESET
                systemDefaults.remove(name)
                catalog.delete("sysvars", name)
            }
            if (!sessionVars.contains(name))
              applyVarBehavior(name, defaultOf(name))
            statusDf("ALTER SYSTEM", name)
          case AlterSystemReset(rawName) =>
            require(isSuperuser(sessionUser),
              s"permission denied: ALTER SYSTEM requires superuser " +
                s"(as $sessionUser)")
            val which =
              if (canonicalVar(rawName) == "all") systemDefaults.keys.toSeq
              else Seq(canonicalVar(rawName))
            which.foreach { n =>
              systemDefaults.remove(n)
              catalog.delete("sysvars", n)
              if (!sessionVars.contains(n)) applyVarBehavior(n, defaultOf(n))
            }
            statusDf("ALTER SYSTEM", rawName.toLowerCase)
          case SetTimeZoneStmt(tz) => setVariable("timezone", tz)
          case SetTransactionStmt() =>
            // single-snapshot reads make every isolation request a no-op
            // (same contract as the TxnStmt acknowledgements)
            statusDf("SET", "transaction")
          // dotted names are Spark conf keys (`SET spark.sql.…=v`) —
          // they keep falling through to Spark's own SET surface
          case SetVarStmt(name, value) if !name.contains(".") =>
            setVariable(name, value)
          case ResetVarStmt(name) if canonicalVar(name) == "all" =>
            sessionVars.keys.toSeq
              .foreach(n => applyVarBehavior(n, defaultOf(n)))
            sessionVars.clear()
            statusDf("RESET", "all")
          case ResetVarStmt(name) =>
            setVariable(name, "DEFAULT")
            statusDf("RESET", canonicalVar(name))
          case ShowDatabases() =>
            import spark.implicits._
            ("dev" +: databases.toSeq).toDF("name")
          case ShowSchemas() =>
            import spark.implicits._
            (Seq("public", "pg_catalog", "information_schema", "rw_catalog")
              ++ sessionSchemaNames).toDF("name")
          case ShowParameters() => showAllVariables()
          case ShowVarStmt(raw)
              if !raw.contains(".") && !showStatementWords.contains(
                raw.trim.split("\\s+")(0).toLowerCase) =>
            canonicalVar(raw) match {
              case "all" => showAllVariables()
              case v => showVariable(v)
            }
          case other =>
            tryDml(other) match {
              case Some(df) =>
                // reference: rw_implicit_flush — every DML statement is
                // followed by a barrier drain, so an immediate read
                // observes the write through any chained MV
                if (implicitFlushEnabled) drainAllJobs()
                df
              case None => spark.sql(other)
            }
        }
      }
      }
    }
    }
  }

  private def saveTableEntry(name: String): Unit =
    catalog.save("tables", name, DurableCatalog.TableEntry(
      tableSchemas(name).json,
      mvs.get(name).map(_.primaryKey).getOrElse(Seq.empty),
      tableDefaults.getOrElse(name, Map.empty),
      mvs.get(name).map(_.nBuckets),
      tableGenerated.get(name).filter(_.nonEmpty),
      tableOnConflict.get(name)))

  // ------------------------------------------------------------ recovery
  //
  // Re-create every persisted definition from $warehouse/_catalog — the
  // reference's meta-store recovery (src/meta/src/controller/): tables
  // first (their declared schemas), then sources (temp views the MV
  // queries read), then views, then MVs (streaming ones re-plan their
  // SQL and resume maintenance from the surviving checkpoint), then
  // indexes/sinks/subscriptions/cursors. A definition that cannot
  // recover yet — typically an MV whose query scans tables the session
  // hasn't attached — parks in `pendingRecovery` and retries after
  // [[attachTables]]; anything still unrecovered surfaces through
  // [[recoveryPending]] rather than failing construction.

  private val pendingRecovery =
    scala.collection.mutable.Map[String, () => Unit]()

  /** Catalog entries that have not finished recovering (name-qualified
    * by kind); empty once recovery is complete.
    */
  def recoveryPending: Seq[String] = pendingRecovery.keys.toSeq.sorted

  private def retryPendingRecovery(): Unit = {
    // parked entries can depend on EACH OTHER (a view over a source, an
    // MV over a view) and the map iterates in arbitrary order — loop
    // until a full pass makes no progress so chains resolve regardless
    // of ordering
    var progressed = true
    while (progressed) {
      progressed = false
      pendingRecovery.toSeq.foreach { case (key, attempt) =>
        try { attempt(); pendingRecovery.remove(key); progressed = true }
        catch { case scala.util.control.NonFatal(_) => } // still blocked
      }
    }
  }

  private def recoverOrPark(key: String)(attempt: => Unit): Unit =
    try attempt
    catch {
      case scala.util.control.NonFatal(_) =>
        pendingRecovery(key) = () => attempt
    }

  private def recoverCatalog(): Unit = {
    import DurableCatalog._
    import org.apache.spark.sql.types.{DataType, StructType}

    // schemas first — name resolution for every later object depends
    // on knowing the namespace set
    schemaNames ++= catalog.list[SchemaEntry]("schemas").map(_._1)
    databases ++= catalog.list[SchemaEntry]("databases").map(_._1)
    // a database's pseudo-public schema rides in the "schemas" family;
    // backfill for registries written before databases were namespaced
    databases.foreach(d => schemaNames += d + "_0db")
    secrets ++= catalog.list[SecretEntry]("secrets").map { case (n, e) =>
      n -> new String(java.util.Base64.getDecoder.decode(e.valueB64), "UTF-8")
    }
    connections ++= catalog.list[ConnectionEntry]("connections")
      .map { case (n, e) => n -> e.props }
    // ALTER SYSTEM defaults: restore, then push live knobs (timezone,
    // shuffle width, implicit flush) through their behavior hooks
    systemDefaults ++= catalog.list[SysVarEntry]("sysvars")
      .map { case (n, e) => n -> e.value }
    systemDefaults.keys.foreach(n => applyVarBehavior(n, defaultOf(n)))
    users ++= catalog.list[UserEntry]("users")
    objectOwners ++= catalog.list[OwnerEntry]("owners")
      .map { case (k, e) => k -> e.user }
    acls ++= catalog.list[AclEntry]("acls")
      .map { case (k, e) => k -> e.grants }

    catalog.list[TableEntry]("tables").foreach { case (name, e) =>
      mvs.define(name, e.pk, e.nBuckets.getOrElse(32))
      tableSchemas(name) = DataType.fromJson(e.schemaJson).asInstanceOf[StructType]
      if (e.defaults.nonEmpty) tableDefaults(name) = e.defaults
      e.generated.filter(_.nonEmpty).foreach(tableGenerated(name) = _)
      e.onConflict.foreach(tableOnConflict(name) = _)
      if (e.pk == Seq(Engine.RowIdCol)) hiddenRowIdTables += name
    }

    catalog.list[SourceEntry]("sources").foreach { case (name, e) =>
      recoverOrPark(s"source:$name") {
        val d = SqlFrontend.parseCreateSource(e.ddl).getOrElse(
          throw new IllegalStateException(s"unparseable source DDL for $name"))
        val stream = SqlFrontend.planSource(spark, d)
        sources(name) = stream
        stream.createOrReplaceTempView(name)
      }
    }

    catalog.list[ViewEntry]("views").foreach { case (name, e) =>
      recoverOrPark(s"view:$name") {
        bindMvTables(e.query) // the view may read engine-managed tables
        spark.sql(e.query).createOrReplaceTempView(name)
      }
    }

    catalog.list[MvEntry]("mvs").foreach { case (name, e) =>
      if (e.over.contains(true)) {
        // OVER-window MV: rebuild the IncrementalOver maintenance loop;
        // the checkpoint resumes the source offsets, the base/result MV
        // storage is already on disk
        e.query.foreach { q =>
          recoverOrPark(s"mv:$name") {
            if (java.nio.file.Files.exists(
                java.nio.file.Paths.get(mvs.checkpointDir(name))))
              e.chainedFrom match {
                case Some(upName) =>
                  if (mvs.get(upName).isEmpty)
                    throw new IllegalStateException(
                      s"chained upstream $upName not yet recovered")
                  createChainedOverMv(name, e.pk, q, upName,
                    resume = true, resumeFrontier = e.chainFrontier)
                case None => createOverMv(name, e.pk, q, resume = true)
              }
            else mvs.define(name, e.pk, e.nBuckets)
          }
        }
      } else {
        // a chained-JOIN MV is bucketed by its LEFT upstream's PK — the
        // binding must match the on-disk layout (catalog, not mvs: the
        // upstream may not have been re-defined yet at this point).
        // Union chains (unionall/unionagg) are bucketed by their OWN PK:
        // binding them to the left PK here would route post-restart
        // merges into different buckets than the pre-restart layout and
        // duplicate rows on delete.
        val bucketKeys = e.chainedFromRight
          .filter(_ => !e.chainJoinType.exists(_.startsWith("union")))
          .flatMap(_ => e.chainedFrom)
          .flatMap(l => catalog.load[MvEntry]("mvs", l).map(_.pk)
            .orElse(catalog.load[TableEntry]("tables", l).map(_.pk)))
          .getOrElse(Seq.empty)
        val mv = mvs.define(name, e.pk, e.nBuckets, bucketKeys)
        // a changelog MV's storage PK is the hidden row id
        if (e.pk == Seq(Engine.RowIdCol)) hiddenRowIdTables += name
        if (e.streaming) e.query.foreach { q =>
          recoverOrPark(s"mv:$name") { resumeMvMaintenance(name, mv, e, q) }
        }
      }
    }

    catalog.list[IndexEntry]("indexes").foreach { case (name, e) =>
      val keySchema = DataType.fromJson(e.keySchemaJson).asInstanceOf[StructType]
      indexes(name) = IndexDef(e.table, e.keys, e.path, e.nBuckets,
        e.keys.map(k => keySchema(k).dataType))
    }

    catalog.list[SinkEntry]("sinks").foreach { case (name, e) =>
      recoverOrPark(s"sink:$name") {
        startSink(SqlFrontend.SinkDef(name, e.from, e.options))
      }
    }

    catalog.list[SubEntry]("subscriptions").foreach { case (name, e) =>
      subscriptions(name) = e.from
    }

    catalog.list[CursorEntry]("cursors").foreach { case (name, e) =>
      cursors(name) = (e.sub, e.pos)
      e.skip.filter(_ > 0).foreach(cursorSkip(name) = _)
    }

    catalog.list[AggregateEntry]("aggregates").foreach { case (name, e) =>
      recoverOrPark(s"aggregate:$name") {
        val sig = graft.functions.AggregateRegistry.register(
          spark, name, e.impl, e.options)
        aggregates(name) = (e.impl, sig)
      }
    }

    catalog.list[ExternalFnEntry]("externalfns").foreach { case (name, e) =>
      recoverOrPark(s"externalfn:$name") { registerExternalFunction(name, e) }
    }

    catalog.list[EmbeddedFnEntry]("embeddedfns").foreach { case (name, e) =>
      recoverOrPark(s"embeddedfn:$name") { registerEmbeddedFunction(name, e) }
    }

    catalog.list[EmbeddedFnEntry]("embeddedaggs").foreach { case (name, e) =>
      recoverOrPark(s"embeddedagg:$name") { registerEmbeddedAggregate(name, e) }
    }

    catalog.list[EmbeddedFnEntry]("embeddedudtfs").foreach { case (name, e) =>
      recoverOrPark(s"embeddedudtf:$name") { registerEmbeddedUdtf(name, e) }
    }
  }

  recoverCatalog() // runs last: every field above is initialized
  // intra-catalog dependencies (an MV chained on a later-sorted MV, a
  // view over a source …) park during the first pass — resolve them now;
  // only entries needing EXTERNAL tables stay parked for attachTables
  retryPendingRecovery()
}

object Engine {
  /** `FOR SYSTEM_TIME AS OF PROCTIME()` — erased before planning; see
    * [[Engine.execute]]'s CREATE MATERIALIZED VIEW branch.
    */
  private[graft] val TemporalJoinClause =
    """(?i)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+PROCTIME\s*\(\s*\)""".r

  /** `current_setting('name')` → session-variable value literal. */
  private[graft] val CurrentSettingRe =
    """(?i)\bcurrent_setting\s*\(\s*'([\w. ]+)'\s*\)""".r

  /** Apply `f` to the chunks of `s` OUTSIDE single-quoted string
    * literals (quote-doubling aware), preserving literals verbatim —
    * so identifier rewrites can never corrupt string data.
    */
  private[graft] def mapOutsideLiterals(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val cur = new StringBuilder
    var i = 0; var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (!inStr && c == '\'') {
        out.append(f(cur.toString)); cur.clear(); inStr = true; out.append(c)
      } else if (inStr && c == '\'') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
          out.append("''"); i += 1
        } else { inStr = false; out.append(c) }
      } else if (inStr) out.append(c)
      else cur.append(c)
      i += 1
    }
    out.append(f(cur.toString))
    out.toString
  }

  /** Recompute key for an incrementally-maintained OVER plan: the
    * INTERSECTION of every Window node's partition attributes. Sound
    * because each window's partitioning then REFINES the key — selecting
    * whole key-groups always captures complete partitions of every
    * window, so a touched-group recompute misses nothing (the round-7
    * fuzz caught the old union-of-attrs key under-recomputing the fused
    * two-window Nexmark q6 statement: a change in one (id, seller)
    * group must re-emit downstream frame rows of the WHOLE seller).
    * None when any spec is empty or carries a non-attribute expression
    * (grouping by e(x) is coarser than by x, so no attribute key can
    * cover its partitions), or when the intersection is empty — the
    * caller fences.
    */
  private[graft] def commonOverPartitionCols(
      analyzed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[Seq[String]] = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val specs = analyzed.collect { case w: Window => w.partitionSpec }
    val keySets = specs.map { spec =>
      val attrs = spec.map {
        case a: AttributeReference => Some(a.name)
        case _ => None
      }
      if (attrs.nonEmpty && attrs.forall(_.isDefined)) Some(attrs.flatten)
      else None
    }
    if (keySets.isEmpty || keySets.exists(_.isEmpty)) None
    else {
      val common = keySets.flatten
        .reduce((a, b) => a.filter(b.toSet))
      Some(common.distinct).filter(_.nonEmpty)
    }
  }

  /** Whether position `pos` of `s` sits inside a single-quoted string
    * literal (quote-doubling aware) — guards syntax rewrites whose own
    * grammar CONTAINS literals, where [[mapOutsideLiterals]]'s masking
    * would break the match itself.
    */
  private[graft] def insideLiteral(s: String, pos: Int): Boolean = {
    var i = 0; var inStr = false
    while (i < pos && i < s.length) {
      if (s.charAt(i) == '\'') {
        if (inStr && i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
        else inStr = !inStr
      }
      i += 1
    }
    inStr
  }

  // ---- PG/reference SQL forms Spark's parser lacks, rewritten
  // textually into Spark-executable SQL. Envelope documented per form;
  // a query outside it fails loudly at analysis (malformed rewrite or
  // unresolved reference), never silently computes something else.

  /** First index of `kw` (word-bounded) at paren depth 0 outside string
    * literals, from `from`; -1 if absent.
    */
  private def topLevelIndex(s: String, kw: String, from: Int = 0): Int = {
    val p = java.util.regex.Pattern.compile("(?is)" + kw)
    var depth = 0; var i = from; var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          val boundary = i == 0 ||
            (!Character.isLetterOrDigit(s.charAt(i - 1)) &&
              s.charAt(i - 1) != '_')
          if (depth == 0 && boundary) {
            val m = p.matcher(s)
            m.region(i, s.length)
            if (m.lookingAt()) return i
          }
      }
      i += 1
    }
    -1
  }

  /** Split a conjunction on top-level ANDs. */
  private def splitAnd(cond: String): Seq[String] = {
    var rest = cond
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var idx = topLevelIndex(rest, "AND\\b")
    while (idx >= 0) {
      out += rest.substring(0, idx).trim
      rest = rest.substring(idx + 3)
      idx = topLevelIndex(rest, "AND\\b")
    }
    out += rest.trim
    out.toSeq
  }

  private val AsofPattern = java.util.regex.Pattern.compile(
    """(?is)\bASOF\s+(LEFT\s+)?JOIN\s+(\w+)(?:\s+(?:AS\s+)?(?!ON\b)(\w+))?\s+ON\s+""")
  private val IneqPattern = java.util.regex.Pattern.compile(
    """(?s)^\s*(.+?)\s*(<=|>=|<|>)\s*(.+?)\s*$""")

  /** `A ASOF [LEFT] JOIN B [alias] ON eqConds AND ineq` (reference
    * batch/stream AsOfJoin; RisingWave SQL surface) → a correlated
    * LATERAL subquery picking, per left row, the single right row at
    * the extremal ordering value the inequality admits. Envelope: the
    * right side is a named relation, ON is a conjunction with exactly
    * one inequality conjunct naming the right alias, and no further
    * JOIN follows the ON clause.
    */
  private[graft] def rewriteAsofJoin(q0: String): String = {
    val m = AsofPattern.matcher(q0)
    if (!m.find()) return q0
    val left = q0.substring(0, m.start())
    val isLeft = m.group(1) != null
    val rel = m.group(2)
    val alias = Option(m.group(3)).getOrElse(rel)
    val rest = q0.substring(m.end())
    val endIdx = topLevelIndex(rest,
      "(WHERE|GROUP|ORDER|LIMIT|HAVING|UNION|INTERSECT|EXCEPT|WINDOW|JOIN|ASOF)\\b")
    val (cond, tail) =
      if (endIdx < 0) (rest.trim, "")
      else (rest.substring(0, endIdx).trim, rest.substring(endIdx))
    val refsAlias = (s: String) => java.util.regex.Pattern
      .compile(s"(?i)(^|[^\\w.])$alias\\.").matcher(s).find()
    val ineq = splitAnd(cond).flatMap { c =>
      val im = IneqPattern.matcher(c)
      if (im.matches() && (refsAlias(im.group(1)) || refsAlias(im.group(3))))
        Some((im.group(1), im.group(2), im.group(3)))
      else None
    }
    require(ineq.length == 1,
      s"ASOF JOIN requires exactly one inequality conjunct on the right " +
        s"relation's ordering column; found ${ineq.length} in: $cond")
    val (lhs, op, rhs) = ineq.head
    val rightOnLhs = refsAlias(lhs)
    val ord = if (rightOnLhs) lhs else rhs
    // right ≤ left → latest admissible right row (DESC); mirrored
    // operands and directions flip accordingly
    val dir = op match {
      case "<=" | "<" => if (rightOnLhs) "DESC" else "ASC"
      case _ => if (rightOnLhs) "ASC" else "DESC"
    }
    val lateral =
      s"(SELECT * FROM $rel $alias WHERE $cond ORDER BY $ord $dir LIMIT 1) $alias"
    val joined =
      if (isLeft) s"$left LEFT JOIN LATERAL $lateral ON true"
      else s"$left JOIN LATERAL $lateral"
    rewriteAsofJoin(joined + " " + tail)
  }

  /** PG `SELECT DISTINCT ON (keys) list FROM … [ORDER BY …]` (reference
    * binder; StreamGroupTopN k=1 in streaming plans) → row_number()-
    * over-partition ≤ 1. Envelope: statement-leading SELECT, unqualified
    * column references in the select list (the subquery flattens FROM
    * aliases), window order = the query's ORDER BY (PG's survivor rule)
    * or the keys when absent.
    */
  private[graft] def rewriteDistinctOn(q0: String): String = {
    val m = java.util.regex.Pattern
      .compile("(?is)^\\s*SELECT\\s+DISTINCT\\s+ON\\s*\\(").matcher(q0)
    if (!m.find()) return q0
    // the keys list ends at the matching close paren
    var depth = 1; var i = m.end()
    while (depth > 0 && i < q0.length) {
      q0.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      i += 1
    }
    require(depth == 0, s"unbalanced DISTINCT ON parens in: $q0")
    val keys = q0.substring(m.end(), i - 1).trim
    val rest = q0.substring(i)
    val fromIdx = topLevelIndex(rest, "FROM\\b")
    require(fromIdx >= 0, s"DISTINCT ON without FROM: $q0")
    val selectList0 = rest.substring(0, fromIdx).trim
    val selectList =
      if (selectList0 == "*") "* EXCEPT (__distinct_on)" else selectList0
    val fromPart0 = rest.substring(fromIdx)
    val obIdx = topLevelIndex(fromPart0, "ORDER\\s+BY\\b")
    val (fromPart, orderBy) =
      if (obIdx < 0) (fromPart0, None)
      else (fromPart0.substring(0, obIdx), Some(fromPart0.substring(obIdx)))
    val winOrder = orderBy
      .map(_.replaceFirst("(?is)^ORDER\\s+BY\\s*", "")).getOrElse(keys)
    s"""SELECT $selectList FROM (
       |  SELECT *, row_number() OVER (PARTITION BY $keys
       |    ORDER BY $winOrder) AS __distinct_on
       |  $fromPart
       |) __don WHERE __distinct_on = 1 ${orderBy.getOrElse("")}""".stripMargin
  }

  private[graft] def rewritePgSelect(q: String): String =
    rewriteDistinctOn(rewriteAsofJoin(q))

  /** Generated hidden PK of `CREATE TABLE … AS` tables without a
    * declared key (reference: the stream RowIdGen's `_row_id`).
    */
  private[graft] val RowIdCol = "_row_id"

  /** pg_proc signatures of the native Catalyst expressions — the
    * registry holds only names, the signatures live with the docs here.
    */
  /** PG pattern surface Spark's parser lacks, split the way the
    * reference binder splits them (binder/expr/binary_op.rs):
    * `x [NOT] SIMILAR TO p [ESCAPE e]` → `x [NOT] RLIKE
    * graft_similar_escape(p[, e])` (pattern/escape as literals — the
    * overwhelmingly common form; a computed pattern can call
    * graft_similar_escape directly), and the reference's
    * `array_transform(arr, |x| expr)` lambda form → Spark's
    * `transform(arr, x -> expr)`.
    */
  private val SimilarToRe =
    ("""(?i)\b(NOT\s+)?SIMILAR\s+TO\s+('(?:[^']|'')*')""" +
      """(?:\s+ESCAPE\s+('(?:[^']|'')*'))?""").r

  private[graft] def rewritePatternOps(stmt: String): String = {
    val low = stmt.toLowerCase
    var out = stmt
    if (low.contains("similar"))
      out = SimilarToRe.replaceAllIn(out, m => {
        val not = if (m.group(1) != null) "NOT " else ""
        val esc = Option(m.group(3)).map(e => s", $e").getOrElse("")
        java.util.regex.Matcher.quoteReplacement(
          s"${not}RLIKE graft_similar_escape(${m.group(2)}$esc)")
      })
    if (low.contains("array_transform")) {
      out = out.replaceAll("(?i)\\barray_transform\\s*\\(", "transform(")
      // the |x| lambda head: only directly after an argument comma, so
      // `||` concatenation can never be captured
      out = out.replaceAll(",\\s*\\|\\s*([A-Za-z_]\\w*)\\s*\\|", ", $1 ->")
    }
    // make_timestamptz (reference: scalar/make_time.rs) = Spark's
    // make_timestamp (session-tz TimestampType, optional tz argument)
    if (low.contains("make_timestamptz"))
      out = out.replaceAll("(?i)\\bmake_timestamptz\\s*\\(", "make_timestamp(")
    // rw_int256 cast spellings (reference: '123'::rw_int256, CAST(x AS
    // rw_int256)) → the int256() in-cast. Envelope: the CAST operand
    // must be paren-free and the :: operand a simple column/literal —
    // the same literal-operand envelope as SIMILAR TO above; computed
    // operands call int256() directly.
    if (low.contains("rw_int256")) {
      out = out.replaceAll(
        "(?i)\\bCAST\\s*\\(([^()]+?)\\s+AS\\s+rw_int256\\s*\\)", "int256($1)")
      out = out.replaceAll(
        "(?i)([\\w.]+|'(?:[^']|'')*')\\s*::\\s*rw_int256", "int256($1)")
    }
    // The reference's ordered-set spelling of approx_percentile
    // (src/expr/impl/src/aggregate/approx_percentile.rs: direct args
    // percentile + relative_error) → Spark's positional
    // approx_percentile(col, percentage, accuracy). relative_error is
    // value-space, Spark's accuracy bounds rank error at n/accuracy —
    // accuracy = 100/err keeps rank noise two orders below the asked
    // error band at any group size. DESC order flips the percentile.
    if (low.contains("approx_percentile") && low.contains("within")) {
      out = ApproxPercentileWithinGroupRe.replaceAllIn(out, m => {
        val frac0 = m.group(1).toDouble
        val err = Option(m.group(2)).map(_.toDouble).getOrElse(0.01)
        val desc = m.group(4) != null && m.group(4).equalsIgnoreCase("DESC")
        val frac = if (desc) 1.0 - frac0 else frac0
        val accuracy = math.min(1e7, math.max(100.0, 100.0 / err)).toLong
        java.util.regex.Matcher.quoteReplacement(
          s"approx_percentile(${m.group(3).trim}, $frac, $accuracy)")
      })
    }
    out
  }

  /** `approx_percentile(frac[, err]) WITHIN GROUP (ORDER BY expr [dir])`
    * — literal direct args (the reference requires them too:
    * binder/expr/function/aggregate.rs "invalid direct args"), the sort
    * expression tolerant of one paren-nesting level.
    */
  private val ApproxPercentileWithinGroupRe =
    ("""(?i)\bapprox_percentile\s*\(\s*([0-9.]+)\s*(?:,\s*([0-9.]+)\s*)?\)""" +
      """\s*WITHIN\s+GROUP\s*\(\s*ORDER\s+BY\s+""" +
      """((?:[^()]|\([^()]*\))+?)\s*(?:\b(ASC|DESC)\s*)?\)""").r

  private[graft] val NativeFunctionSigs: Map[String, (String, String)] = Map(
    "graft_dot" -> ("a double precision[], b double precision[]",
      "double precision"),
    "graft_gcd" -> ("a bigint, b bigint", "bigint"),
    "graft_lcm" -> ("a bigint, b bigint", "bigint"),
    "graft_hmac" -> ("payload text, secret text, algo text", "text"),
    "graft_similar_escape" -> ("pattern text [, escape text]", "text"),
    "trim_array" -> ("arr anyarray, n integer", "anyarray"),
    "int256" -> ("v text | bigint", "rw_int256"),
    "hex_to_int256" -> ("hex text", "rw_int256"),
    "int256_add" -> ("a rw_int256, b rw_int256", "rw_int256"),
    "int256_sub" -> ("a rw_int256, b rw_int256", "rw_int256"),
    "int256_mul" -> ("a rw_int256, b rw_int256", "rw_int256"),
    "int256_div" -> ("a rw_int256, b rw_int256", "rw_int256"),
    "int256_mod" -> ("a rw_int256, b rw_int256", "rw_int256"),
    "int256_neg" -> ("a rw_int256", "rw_int256"),
    "int256_abs" -> ("a rw_int256", "rw_int256"),
    "int256_sum" -> ("a rw_int256", "rw_int256"),
    "int256_avg" -> ("a rw_int256", "double precision"),
    "pg_sleep" -> ("seconds double precision", "void"),
    "jsonb_object_agg" -> ("k text, v anyelement", "jsonb"),
    "int256_text" -> ("a rw_int256", "text"),
    "int256_float8" -> ("a rw_int256", "double precision"),
    "sind" -> ("x double precision", "double precision"),
    "cosd" -> ("x double precision", "double precision"),
    "tand" -> ("x double precision", "double precision"),
    "cotd" -> ("x double precision", "double precision"),
    "asind" -> ("x double precision", "double precision"),
    "acosd" -> ("x double precision", "double precision"),
    "cot" -> ("x double precision", "double precision"),
    "coth" -> ("x double precision", "double precision"),
    "quote_nullable" -> ("v anyelement", "text"),
    "jsonb_typeof" -> ("j jsonb", "text"),
    "jsonb_array_length" -> ("j jsonb", "integer"),
    "jsonb_extract_path" -> ("j jsonb, VARIADIC path text[]", "jsonb"),
    "jsonb_extract_path_text" -> ("j jsonb, VARIADIC path text[]", "text"),
    "jsonb_exists" -> ("j jsonb, key text", "boolean"),
    "jsonb_exists_any" -> ("j jsonb, keys text[]", "boolean"),
    "jsonb_exists_all" -> ("j jsonb, keys text[]", "boolean"),
    "sha224" -> ("b bytea", "text"),
    "sha384" -> ("b bytea", "text"),
    "convert_from" -> ("b bytea, encoding text", "text"),
    "convert_to" -> ("s text, encoding text", "bytea"),
    "map_length" -> ("m anymap", "integer"),
    "map_cat" -> ("a anymap, b anymap", "anymap"),
    "map_contains" -> ("m anymap, k anyelement", "boolean"),
    "map_access" -> ("m anymap, k anyelement", "anyelement"),
    "map_insert" -> ("m anymap, k anyelement, v anyelement", "anymap"),
    "map_delete" -> ("m anymap, k anyelement", "anymap"))
}
