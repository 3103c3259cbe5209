package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.json4s.{DefaultFormats, Formats, NoTypeHints}
import org.json4s.jackson.Serialization

/** Durable object catalog — the meta-store analog (reference:
  * src/meta/src/controller/ and docs/dev/src/design/meta-service.md: every
  * CREATE persists its definition in the meta store, and recovery
  * re-creates the catalog and resumes stream jobs from their checkpoints).
  *
  * Layout: one JSON document per object at
  * `$warehouse/_catalog/<kind>/<name>.json`, written atomically
  * (temp file + ATOMIC_MOVE) so a crash mid-DDL never leaves a torn
  * definition. The catalog stores DEFINITIONS only — data lives in the
  * MV/table stores and streaming checkpoints, which already survive
  * restarts; this class is what lets a fresh [[Engine]] over the same
  * warehouse find them again.
  */
final class DurableCatalog(warehouseDir: String) {

  implicit private val formats: Formats =
    Serialization.formats(NoTypeHints)

  private val root = Paths.get(warehouseDir, "_catalog")

  private def fileOf(kind: String, name: String): Path = {
    require(name.matches("[\\w-]+"), s"unsafe catalog object name: $name")
    root.resolve(kind).resolve(s"$name.json")
  }

  /** Atomically persist one object definition (idempotent overwrite). */
  def save[A <: AnyRef](kind: String, name: String, entry: A): Unit = {
    val f = fileOf(kind, name)
    Files.createDirectories(f.getParent)
    val tmp = f.resolveSibling(s".${name}.tmp")
    Files.write(tmp, Serialization.write(entry).getBytes("UTF-8"))
    Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def delete(kind: String, name: String): Unit = {
    val f = fileOf(kind, name)
    if (Files.exists(f)) Files.delete(f)
  }

  def load[A <: AnyRef: Manifest](kind: String, name: String): Option[A] = {
    val f = fileOf(kind, name)
    if (!Files.exists(f)) None
    else Some(Serialization.read[A](new String(Files.readAllBytes(f), "UTF-8")))
  }

  /** All persisted objects of one kind, name-sorted (deterministic
    * recovery order within a kind).
    */
  def list[A <: AnyRef: Manifest](kind: String): Seq[(String, A)] = {
    val dir = root.resolve(kind)
    if (!Files.exists(dir)) Seq.empty
    else FsList.list(dir).iterator
      .filter(_.getFileName.toString.endsWith(".json"))
      .map { p =>
        val name = p.getFileName.toString.stripSuffix(".json")
        name -> Serialization.read[A](
          new String(Files.readAllBytes(p), "UTF-8"))
      }
      .toSeq.sortBy(_._1)
  }
}

object DurableCatalog {
  // One entry shape per object kind. Schemas travel as Spark's own
  // DataType JSON (StructType.json / DataType.fromJson) — version-stable
  // and round-trip exact.

  /** CREATE TABLE: declared schema + PK + DEFAULT expressions.
    * `nBuckets` records the store layout when it differs from the
    * session default at creation (Option for forward/backward entry
    * compatibility); recovery must re-define with the same count or
    * bucket-pruned reads/merges would silently mis-route. */
  final case class TableEntry(schemaJson: String, pk: Seq[String],
      defaults: Map[String, String], nBuckets: Option[Int] = None,
      generated: Option[Map[String, String]] = None,
      onConflict: Option[String] = None)

  /** CREATE MATERIALIZED VIEW: the defining SQL (None for MVs defined
    * through the programmatic API, which have no SQL text to re-plan —
    * their storage recovers but maintenance needs re-issuing), whether
    * the plan streamed, and the sink output mode. Recovery re-plans
    * `query` and re-starts maintenance iff `streaming` and the
    * checkpoint dir survives.
    */
  final case class MvEntry(pk: Seq[String], query: Option[String],
      streaming: Boolean, outputMode: String, nBuckets: Int,
      over: Option[Boolean] = None, // Some(true): OVER-window MV
      // (maintained by IncrementalOver, not a plain streaming sink)
      // MV-on-MV chain: the upstream MV whose changelog this MV tails,
      // and the changelog frontier the original subscription started
      // after (recovery re-filters from it; the checkpoint's file log
      // dedups anything already absorbed)
      chainedFrom: Option[String] = None,
      chainFrontier: Option[Long] = None,
      // aggregate MV-on-MV: the GROUP BY column names the chained
      // recompute touches per epoch (None = per-row chain)
      chainAggGroups: Option[Seq[String]] = None,
      // join MV-on-MV (delta join): the RIGHT upstream + its frontier
      // (chainedFrom/chainFrontier hold the left side); type =
      // "inner" | "left" | "right" | "full" (None = inner)
      chainedFromRight: Option[String] = None,
      chainFrontierRight: Option[Long] = None,
      chainJoinType: Option[String] = None)

  /** CREATE SOURCE / CREATE SINK / CREATE VIEW / CREATE SUBSCRIPTION:
    * definitions small enough to persist as their raw DDL or parts.
    */
  final case class SourceEntry(ddl: String)
  final case class SinkEntry(from: String, options: Map[String, String])
  final case class ViewEntry(query: String)
  final case class SubEntry(from: String)

  /** CREATE INDEX: layout of the materialized index copy; `keySchemaJson`
    * is a StructType over the key columns (stored types drive probe
    * casting in [[Engine.indexLookup]]).
    */
  final case class IndexEntry(table: String, keys: Seq[String],
      path: String, nBuckets: Int, keySchemaJson: String)

  /** DECLARE … SUBSCRIPTION CURSOR: subscription + committed frontier.
    * The frontier re-persists on every FETCH, so a restarted engine
    * resumes the cursor exactly where the last fetch left it.
    */
  final case class CursorEntry(sub: String, pos: Long,
      // rows already consumed WITHIN the first pending epoch after `pos`
      // (row-limited `FETCH n` pagination, reference fetch_cursor.rs)
      skip: Option[Long] = None)

  /** CREATE AGGREGATE: implementation key + WITH options — recovery
    * re-binds the name in the session function registry.
    */
  final case class AggregateEntry(impl: String, options: Map[String, String])

  /** CREATE FUNCTION … USING LINK (external UDF server): remote
    * function identifier + link address + declared signature —
    * recovery re-binds the name in the session function registry
    * (no connection is made until the first call).
    */
  final case class ExternalFnEntry(ident: String, link: String,
      argTypes: Seq[String], retType: String, lang: Option[String])

  /** CREATE FUNCTION … LANGUAGE python/javascript AS $$body$$ (embedded
    * interpreter UDF): the language, the verbatim source body, and the
    * declared signature — recovery re-binds the name in the session
    * function registry (no interpreter spawns until the first call).
    */
  final case class EmbeddedFnEntry(lang: String, body: String,
      argTypes: Seq[String], retType: String)

  /** COMMENT ON TABLE/COLUMN (reference: handler/comment.rs) — keyed by
    * `object` or `object.column`; surfaced through pg_description.
    */
  final case class CommentEntry(text: String)

  /** CREATE SCHEMA (reference: handler/create_schema.rs). Schemas are
    * pure namespaces: objects in schema `s` store under the internal
    * flat name `s__<object>`; `public` objects keep their bare name.
    */
  final case class SchemaEntry(owner: String)

  /** CREATE USER (reference: handler/create_user.rs + user catalog). */
  final case class UserEntry(superuser: Boolean, createdb: Boolean,
      login: Boolean, password: Option[String])

  /** Object creator (reference keeps owner ids in each catalog entry). */
  final case class OwnerEntry(user: String)

  /** GRANT/REVOKE state for one object key: user → privilege list
    * (reference: handler/handle_privilege.rs).
    */
  final case class AclEntry(grants: Map[String, Seq[String]])

  /** CREATE SECRET (reference: handler/create_secret.rs): the payload
    * stores base64-obfuscated (the reference encrypts in its meta
    * store); it is resolved only at connector use time and never
    * surfaced by any introspection relation.
    */
  final case class SecretEntry(valueB64: String, owner: String)

  /** CREATE CONNECTION: a named connector property set (reference
    * handler/create_connection.rs) — sources/sinks reference it with
    * `connection = name` and the properties splice in at bind time.
    */
  final case class ConnectionEntry(props: Map[String, String], owner: String)

  /** ALTER SYSTEM SET — an instance-wide session-variable default. */
  final case class SysVarEntry(value: String)
}
