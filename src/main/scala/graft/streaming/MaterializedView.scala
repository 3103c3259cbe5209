package graft.streaming

import java.nio.file.{Files, Paths}

import graft.FsList

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incrementally-maintained materialized view: a Structured Streaming query
  * whose micro-batch deltas are merged by primary key into a bucketed
  * parquet table.
  *
  * Reference shape: CREATE MATERIALIZED VIEW → stream job →
  * MaterializeExecutor upsert (src/frontend/src/handler/create_mv.rs:87,
  * src/stream/src/executor/mview/materialize.rs:45). Spark shape:
  * readStream → transform → foreachBatch(merge) with a checkpoint dir
  * (micro-batch boundary = the reference's barrier/epoch).
  *
  * Scale design: the table is hash-bucketed on the PK
  * (`__bucket = pmod(hash(pk), nBuckets)`) and written with dynamic
  * partition overwrite — a merge rewrites ONLY the buckets containing
  * changed keys, so merge cost is O(delta × table/nBuckets), not O(table).
  * At 100 TB this maps 1:1 onto Delta/Iceberg MERGE with the same bucket
  * layout; nothing above this class changes.
  */
final class MaterializedView(
    val spark: SparkSession,
    val name: String,
    pk: Seq[String],
    val targetDir: String,
    val nBuckets: Int = 32,
    val bucketKeys: Seq[String] = Seq.empty,
    // Physical CLUSTERING within each bucket's files (r10): rows are
    // sorted by these columns on every bucket rewrite, so parquet
    // row-group min/max stats become selective for range predicates on
    // them — the IncrementalTopN boundary-region read's layout backing
    // (the reference's TopN state table is sort-ordered for the same
    // bounded range refill). Order inside a store file is semantically
    // irrelevant (PK resolution happens before the write), so this is
    // layout-only.
    val sortWithinBuckets: Seq[String] = Seq.empty) {

  private val bucketCol = "__bucket"

  /** Serializes storage rewrites against in-JVM readers that must see a
    * consistent file set across plan+execute (a chained aggregate MV's
    * touched-group recompute reads THIS MV's buckets while this MV's own
    * job keeps rewriting them). [[merge]] holds the write lock for the
    * bucket-rewrite window; [[withReadLock]] lets such readers pin the
    * file set for the duration of a lazy plan's execution. Keyed by
    * storage path so two Engine instances over one warehouse in the same
    * JVM (restart tests) share the lock. On a real cluster the same role
    * is played by the table format's snapshot isolation (Delta/Iceberg
    * MERGE), per the class doc.
    */
  private val storeLock = MaterializedView.lockFor(targetDir)

  /** Run `f` with this MV's storage pinned against concurrent [[merge]]
    * rewrites — required around any action that executes a plan over
    * [[read]]/[[readTouched]] while this MV's maintenance job may run.
    */
  def withReadLock[T](f: => T): T = {
    storeLock.readLock().lock()
    try f finally storeLock.readLock().unlock()
  }

  /** Called after each epoch publication commits (batchId >= 0 merges
    * only, post-rename) with the published epoch — the engine wires
    * continuous background compaction here (the reference compacts in
    * the background, not only at barriers). Runs on the maintenance
    * thread, so implementations must only ENQUEUE work; the merge is
    * already committed when it fires, so hook failures are swallowed.
    */
  @volatile var onEpochPublished: Long => Unit = _ => ()

  private def withWriteLock[T](f: => T): T = {
    storeLock.writeLock().lock()
    try f finally storeLock.writeLock().unlock()
  }

  /** The PK the merge dedups on — sink encoders key payloads by it. */
  def primaryKey: Seq[String] = pk

  /** Physical bucketing key: defaults to the PK; override with a coarser
    * key (e.g. a window-partition or group column) to make
    * touched-key recompute reads bucket-pruned ([[readTouched]]) —
    * the IncrementalOver / IncrementalAgg O(delta) layout.
    */
  private val bucketCols: Seq[String] = if (bucketKeys.nonEmpty) bucketKeys else pk

  private def bucketOf(df: DataFrame) =
    pmod(hash(bucketCols.map(col): _*), lit(nBuckets))

  private val changelogDir = s"$targetDir.changelog"

  /** Filesystem location of the epoch-published changelog — operators
    * that commit per-epoch sidecar state (e.g. [[DynamicFilter]]'s
    * threshold) read it back from here.
    */
  def changelogLocation: String = changelogDir

  /** Append-only changelog feed of this MV — the MV-on-MV channel
    * (reference: docs/dev/src/design/mv-on-mv.md — downstream MVs
    * subscribe to the upstream's changelog, NOT its storage: the storage
    * is rewritten in place, which no file-tailing source can consume).
    * Each merge publishes its delta here (one `batch-N` directory per
    * epoch, atomically renamed in — see [[merge]]); downstream MVs
    * `readStream` it.
    */
  def changelogStream(): DataFrame = {
    // a never-written upstream (fresh CREATE TABLE) has no changelog
    // files yet — tail with the declared schema + changelog columns
    // (every published entry carries _op/_seq) so subscribing before
    // the first DML works
    val schema = scala.util.Try(readChangelog().schema).toOption
      .filter(_.nonEmpty)
      .orElse(storedSchema.map(s => org.apache.spark.sql.types.StructType(
        s.fields :+
          org.apache.spark.sql.types.StructField(
            Changelog.OpCol, org.apache.spark.sql.types.IntegerType) :+
          org.apache.spark.sql.types.StructField(
            Changelog.SeqCol, org.apache.spark.sql.types.LongType))))
      .getOrElse(throw new IllegalStateException(
        s"MV $name has neither changelog entries nor a declared schema"))
    Files.createDirectories(Paths.get(changelogDir))
    spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(changelogDir)
  }

  /** Batch view of the accumulated changelog. */
  def readChangelog(): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(changelogDir)

  /** Highest published changelog epoch, or -1 (epoch dirs only — ad-hoc
    * DML appends carry no epoch and sort below every batch-N).
    */
  def latestChangelogBatchId: Long = {
    val dir = Paths.get(changelogDir)
    if (!Files.exists(dir)) -1L
    else {
      import scala.jdk.CollectionConverters._
      FsList.list(dir).iterator
        .flatMap(p => p.getFileName.toString.stripPrefix("batch-").toLongOption)
        .foldLeft(-1L)(math.max)
    }
  }

  /** The changelog stream restricted to epochs AFTER `afterBatchId` —
    * rows from older (retained but already-seeded) epochs are filtered by
    * provenance, so a late subscriber never double-applies history it
    * took from the snapshot.
    */
  def changelogStreamFrom(afterBatchId: Long): DataFrame = {
    // non-epoch files (ad-hoc DML / backfill appends sit directly in the
    // changelog dir) extract as '' → null epoch → excluded, per the
    // contract that tails deliver epoch-published batches only
    val epoch = regexp_extract(col("__src_file"), "batch-(\\d+)", 1)
    changelogStream()
      .withColumn("__src_file", input_file_name())
      .where(when(epoch === "", lit(null)).otherwise(epoch)
        .cast("long") > afterBatchId)
      .drop("__src_file")
  }

  /** Subscribe a NEW downstream MV after this MV's changelog was
    * compacted ([[expireChangelog]]): expired epochs are unrecoverable
    * from the log, so the subscriber seeds from the STORAGE snapshot and
    * tails only strictly-newer epochs — the reference's
    * backfill-then-subscribe bootstrap (snapshot read + changelog chase,
    * reference: src/stream/src/executor/backfill/). Epochs published
    * between the frontier capture and the snapshot read re-apply through
    * the tail; PK last-write-wins makes the overlap idempotent.
    *
    * Contract: the upstream must be epoch-published (stream-maintained —
    * every merge carries a batchId). Ad-hoc DML appends carry no epoch:
    * the backfill tail cannot order them against the snapshot, so they
    * are visible only to full [[changelogStream]] subscribers.
    */
  def subscribeWithBackfill(down: MaterializedView, checkpointDir: String,
      transform: DataFrame => DataFrame = identity): StreamingQuery = {
    val frontier = latestChangelogBatchId
    val snapshot = read()
    if (snapshot.columns.nonEmpty) down.merge(transform(snapshot))
    down.start(transform(changelogStreamFrom(frontier)), checkpointDir)
  }

  /** One-shot full-store schema rewrite (ALTER TABLE ADD/DROP COLUMN,
    * reference: src/frontend/src/handler/alter_table_column.rs): read
    * the whole store, transform, rewrite every bucket through a staging
    * swap. Eager and O(table) — at 100 TB the lazy alternative (schema
    * versioning, pad at read, compact in the background — what the
    * reference's column catalog does) trades that one-time cost for
    * per-read branching; eager rewrite keeps every downstream reader
    * schema-uniform, the right call while stores are bucketed parquet.
    * Bucketing is PK-hash based, so non-PK column changes never move
    * rows between buckets.
    */
  def rewriteSchema(f: DataFrame => DataFrame): Unit =
    readBuckets().foreach { stored =>
      val rewritten = f(stored.drop(bucketCol))
      val staging = s"$targetDir.alter-staging"
      val out = rewritten.withColumn(bucketCol, bucketOf(rewritten))
      out.repartition(col(bucketCol)).write.mode("overwrite")
        .partitionBy(bucketCol).parquet(staging)
      spark.read.parquet(staging).write.mode("overwrite")
        .partitionBy(bucketCol).parquet(targetDir)
      deleteRecursively(Paths.get(staging))
    }

  /** Batch read of epoch-published changelog entries with id >
    * `afterBatchId`: returns (rows + `_epoch` column, new frontier) —
    * the pull side of a subscription cursor (reference: FETCH on a
    * subscription cursor reads the MV's log store,
    * src/frontend/src/session/cursor_manager.rs). Table DML merges
    * through Dml.mergeEpoch with a real epoch, so a subscription on a
    * TABLE delivers its writes; only epoch-less merges (raw
    * [[merge]] callers) stay cursor-invisible.
    */
  def changelogAfter(afterBatchId: Long): (DataFrame, Long) = {
    val frontier = latestChangelogBatchId
    val dir = Paths.get(changelogDir)
    if (frontier <= afterBatchId || !Files.exists(dir))
      (spark.emptyDataFrame, math.max(frontier, afterBatchId))
    else {
      import scala.jdk.CollectionConverters._
      val dirs = FsList.list(dir).iterator
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("batch-") &&
          n.stripPrefix("batch-").toLongOption.exists(_ > afterBatchId))
        .map(n => s"$changelogDir/$n").toSeq.sorted
      if (dirs.isEmpty) (spark.emptyDataFrame, frontier)
      else
        // every dir in range may have been emptied by expireChangelog
        // (dirs outlive their files — see there) → nothing to infer from
        try {
          val df = spark.read.parquet(dirs: _*)
            .withColumn("_epoch",
              regexp_extract(input_file_name(), "batch-(\\d+)", 1).cast("long"))
          (df, frontier)
        } catch {
          case _: org.apache.spark.sql.AnalysisException =>
            (spark.emptyDataFrame, frontier)
        }
    }
  }

  /** Publish wall-times of the committed epochs, ascending: (epoch,
    * millis). Each publication drops a `_commit_ms` marker into its
    * batch dir right after the atomic rename (underscore-prefixed, so
    * parquet readers and file-stream sources never see it) — the
    * timestamp axis of `FOR SYSTEM_TIME AS OF <timestamp>` binds against
    * it and SURVIVES a warehouse copy/restore, which refreshes file
    * mtimes (the reference maps a timestamp onto its
    * physical-time-encoding epoch the same way,
    * src/frontend/src/binder/relation/mod.rs:353-425). Epochs published
    * before the marker existed (or whose publish crashed between rename
    * and marker) fall back to the dir mtime — the rename instant.
    */
  def epochCommitTimes: Seq[(Long, Long)] = {
    val dir = Paths.get(changelogDir)
    if (!Files.exists(dir)) Nil
    else {
      import scala.jdk.CollectionConverters._
      FsList.list(dir).iterator
        .flatMap { p =>
          p.getFileName.toString.stripPrefix("batch-").toLongOption
            .map((_, commitMsOf(p)))
        }
        .toSeq.sortBy(_._1)
    }
  }

  private def commitMsOf(batchDir: java.nio.file.Path): Long = {
    val marker = batchDir.resolve("_commit_ms")
    (if (Files.exists(marker))
       scala.util.Try(
         new String(Files.readAllBytes(marker), "UTF-8").trim.toLong).toOption
     else None)
      .getOrElse(Files.getLastModifiedTime(batchDir).toMillis)
  }

  /** Wall-time of the store's birth (CTAS seed / CREATE TABLE commit) —
    * pseudo-epoch -1 on the time-travel timeline. Persisted in the
    * `_birth_ms` sidecar at first schema declaration, so it survives a
    * warehouse copy/restore; pre-sidecar stores fall back to the oldest
    * changelog root file's mtime (the CTAS seed write).
    */
  def birthMs: Option[Long] = {
    val persisted =
      if (!Files.exists(birthFile)) None
      else scala.util.Try(
        new String(Files.readAllBytes(birthFile), "UTF-8").trim.toLong).toOption
    persisted.orElse {
      val dir = Paths.get(changelogDir)
      if (!Files.exists(dir)) None
      else {
        import scala.jdk.CollectionConverters._
        FsList.list(dir).iterator
          .filter(p => Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
          .map(p => Files.getLastModifiedTime(p).toMillis)
          .toSeq.sorted.headOption
      }
    }
  }

  /** The table image as of `epoch` (inclusive) — batch time travel
    * (reference: `FOR SYSTEM_TIME AS OF`, binder/relation/mod.rs:353).
    *
    * Reconstruction is FORWARD from the nearest snapshot checkpoint at
    * or below E ([[writeSnapshot]] — the reference's Hummock checkpoint,
    * docs/dev/src/design/state-store-overview.md), replaying only the
    * changelog suffix (S, E]: O(table + epochs-since-snapshot) files,
    * never O(full history). With no snapshot the changelog is complete
    * from the store's birth: ad-hoc merges (a CTAS seed) append their
    * row images at the changelog root (ordered before every epoch),
    * and every DML / streaming / refresh epoch publishes `batch-N`.
    * The image at E = last change per PK across {base} ∪ {batch-N :
    * S < N ≤ E}, dropping keys whose last op is a delete — one shuffle
    * on the PK, same plan shape as [[Changelog.applyToSnapshot]].
    *
    * The replayed suffix must still be on disk: an epoch dir in range
    * emptied by [[expireChangelog]] makes the reconstruction unsound,
    * so it throws (the reference's "time travel too far back" error
    * class). Epochs at or below a snapshot don't constrain reads ABOVE
    * the snapshot — that is exactly what compaction exploits.
    */
  def imageAt(epoch: Long): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.{desc, row_number}
    import org.apache.spark.sql.expressions.Window
    val dir = Paths.get(changelogDir)
    val snap = snapshotEpochs.filter(_ <= epoch)
      .sorted.lastOption
    require(Files.exists(dir) || snap.isDefined,
      s"$name: no changelog — nothing to travel to")
    val entries =
      if (!Files.exists(dir)) Nil
      else FsList.list(dir).iterator.toSeq
    val floor = snap.getOrElse(-1L) // replay strictly above the snapshot
    val epochDirs = entries
      .flatMap(p => p.getFileName.toString.stripPrefix("batch-").toLongOption
        .map((_, p)))
      .filter { case (id, _) => id > floor && id <= epoch }
    val expired = epochDirs.filter { case (_, p) =>
      !FsList.list(p).iterator.exists(f =>
        f.getFileName.toString.endsWith(".parquet"))
    }
    require(expired.isEmpty,
      s"$name FOR SYSTEM_TIME AS OF $epoch: history expired — epoch(s) " +
        s"${expired.map(_._1).sorted.mkString(", ")} were compacted away")
    val base: Option[DataFrame] = snap match {
      case Some(s) =>
        // snapshot rows ARE the image at s: insert ops below any suffix
        // epoch's sequence numbers
        Some(spark.read.parquet(snapshotDir(s).toString)
          .withColumn(Changelog.OpCol, lit(Changelog.Insert))
          .withColumn(Changelog.SeqCol, lit(Long.MinValue))
          .withColumn("__e", lit(s)))
      case None =>
        val rootFiles = entries
          .filter(p => Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
          .map(_.toString)
        if (rootFiles.isEmpty) None
        else Some(spark.read.parquet(rootFiles: _*)
          .withColumn("__e", lit(-1L)))
    }
    val suffix: Option[DataFrame] =
      if (epochDirs.isEmpty) None
      else Some(spark.read.parquet(epochDirs.map(_._2.toString): _*)
        .withColumn("__e",
          regexp_extract(input_file_name(), "batch-(\\d+)", 1).cast("long")))
    val df = (base, suffix) match {
      case (Some(b), Some(s)) => b.unionByName(s, allowMissingColumns = true)
      case (Some(b), None) => b
      case (None, Some(s)) => s
      case (None, None) => return read().where(lit(false))
    }
    val dataCols = df.columns.toSeq
      .filterNot(Seq(Changelog.OpCol, Changelog.SeqCol, "__e").contains)
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy(desc("__e"), desc(Changelog.SeqCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && Changelog.isAdd(col(Changelog.OpCol)))
      .select(dataCols.map(col): _*)
  }

  // ------------------------------------------------ snapshot checkpoints
  // Periodic compacted image of the store (reference: Hummock checkpoint
  // + compaction + vacuum — docs/dev/src/design/state-store-overview.md,
  // src/storage/compactor/, src/meta/src/hummock/). A `snapshot-N` dir
  // under `<store>.snapshots` holds the FULL image at epoch N; imageAt
  // replays only the changelog suffix above it, and [[compactTo]] may
  // then expire everything at or below N — bounding changelog storage to
  // O(table + retained epochs) instead of O(lifetime history).

  private val snapshotsRoot = Paths.get(s"$targetDir.snapshots")
  private def snapshotDir(epoch: Long) = snapshotsRoot.resolve(s"snapshot-$epoch")

  /** Epochs with a committed snapshot, ascending. */
  def snapshotEpochs: Seq[Long] =
    if (!Files.exists(snapshotsRoot)) Nil
    else {
      import scala.jdk.CollectionConverters._
      FsList.list(snapshotsRoot).iterator
        .flatMap(p =>
          p.getFileName.toString.stripPrefix("snapshot-").toLongOption)
        .toSeq.sorted
    }

  def latestSnapshotEpoch: Long = snapshotEpochs.foldLeft(-1L)(math.max)

  /** Materialize the image at `epoch` as a snapshot checkpoint:
    * stage → atomic rename, same crash discipline as every other commit
    * here (a torn `.tmp-` dir is swept by [[recoverWal]]; the snapshot
    * is derived data, so losing an uncommitted one costs nothing).
    * Incremental by construction — [[imageAt]] itself reads the nearest
    * OLDER snapshot plus the suffix, so snapshot k+1 never replays
    * history snapshot k already folded in.
    */
  def writeSnapshot(epoch: Long): Unit = {
    require(epoch >= 0, s"$name: snapshot epoch must be a committed epoch")
    if (Files.exists(snapshotDir(epoch))) return
    val image = imageAt(epoch) // plan BEFORE the tmp dir exists
    Files.createDirectories(snapshotsRoot)
    graft.CrashPoints.hit("snapshot.write")
    val tmp = snapshotsRoot.resolve(s".tmp-$epoch")
    deleteRecursively(tmp)
    image.write.mode("overwrite").parquet(tmp.toString)
    graft.CrashPoints.hit("snapshot.rename")
    try Files.move(tmp, snapshotDir(epoch),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { // lost a race with a concurrent compactor: theirs is equivalent
      case _: java.nio.file.FileAlreadyExistsException => deleteRecursively(tmp)
    }
  }

  /** Checkpoint-then-compact: snapshot the image at `frontier`, then
    * expire every epoch at or below it, the changelog root (the CTAS
    * seed image — superseded by the snapshot), and older snapshots
    * (their replay suffixes are gone, so they can serve no read).
    *
    * Caller contract — the retention frontier: `frontier` must be an
    * epoch every subscriber has consumed PAST (cursor positions, chained
    * MVs at quiescence — see [[expireChangelog]]). Time travel to
    * epochs below `frontier` throws "history expired" afterwards; at or
    * above it stays exact. Crash-safe at every step: each is
    * individually idempotent and a re-run converges (snapshot rename is
    * atomic; expiry and root cleanup only delete data a committed
    * snapshot supersedes).
    */
  def compactTo(frontier: Long): Unit = synchronized {
    // The monitor (shared with [[mergeStreamBatch]] and the ad-hoc merge
    // branch) excludes concurrent root-level changelog appends for the
    // whole snapshot+cleanup window: a root file appended between the
    // snapshot's plan and the root sweep would be deleted without ever
    // being folded into a snapshot. Epoch merges publish only NEW
    // batch-N dirs above `frontier`, so they never conflict.
    if (frontier < 0 || frontier > latestChangelogBatchId) return
    writeSnapshot(frontier)
    expireChangelog(frontier)
    // the birth image is folded into the snapshot; drop the root files
    val dir = Paths.get(changelogDir)
    if (Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      FsList.list(dir).iterator
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .toSeq.foreach(Files.delete)
    }
    snapshotEpochs.filter(_ < frontier)
      .foreach(e => deleteRecursively(snapshotDir(e)))
    graft.CrashPoints.hit("snapshot.compacted")
  }

  /** Retention: drop changelog epochs ≤ `upToBatchId`.
    *
    * Contract: only call with a batch id every subscriber's checkpoint
    * has committed PAST — a file-stream source never re-requests files it
    * has logged, so deleting them is invisible to existing subscribers.
    * A subscriber created after expiry starts from the surviving epochs
    * only (backfill from the MV storage instead). This is the
    * subscriber-checkpoint retention the reference applies to its shared
    * log (reference: docs/dev/src/design/checkpoint.md).
    *
    * Only the DATA FILES inside an expired epoch dir are deleted; the
    * `batch-N` directory itself stays, as do its underscore-prefixed
    * markers (`_commit_ms`, operator sidecars) — invisible to parquet
    * readers, and keeping them preserves the commit-time axis and any
    * epoch-pinned operator state past compaction. A live subscriber
    * re-lists the whole log every micro-batch, and on a local
    * filesystem a directory vanishing between its parent listing and
    * its own enumeration is a hard IOException (not the FileNotFound
    * that `spark.sql.files.ignoreMissingFiles` absorbs) — it would kill
    * the subscription. Empty epoch dirs are a few inodes each, and
    * keeping them means [[latestChangelogBatchId]] never regresses
    * after a full expiry, so late backfill subscribers still see the
    * true frontier.
    */
  def expireChangelog(upToBatchId: Long): Unit = {
    val dir = Paths.get(changelogDir)
    if (Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      FsList.list(dir).iterator
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("batch-") &&
            n.stripPrefix("batch-").toLongOption.exists(_ <= upToBatchId)
        }
        .toSeq.foreach { epochDir =>
          FsList.list(epochDir).iterator.toSeq
            .filterNot(_.getFileName.toString.startsWith("_"))
            .foreach(deleteRecursively)
        }
    }
  }

  /** Current MV contents. A fully-emptied store (every row deleted)
    * still reads with its SCHEMA — from the `_schema.json` sidecar each
    * merge maintains — so joins/chains over a momentarily-empty MV keep
    * resolving instead of seeing a zero-column frame.
    */
  def read(): DataFrame = {
    def emptyWithSchema = storedSchema
      .map(s => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s))
      .getOrElse(spark.emptyDataFrame)
    if (!Files.exists(Paths.get(targetDir))) emptyWithSchema
    else
      try spark.read.parquet(targetDir).drop(bucketCol)
      catch {
        // fully-deleted MV: directory exists but holds no parquet files
        case _: org.apache.spark.sql.AnalysisException => emptyWithSchema
      }
  }

  private def schemaFile = Paths.get(targetDir, "_schema.json")
  private def birthFile = Paths.get(targetDir, "_birth_ms")

  /** Record the store's birth instant once, alongside the schema
    * sidecar — the persisted pseudo-epoch -1 commit time [[birthMs]]
    * reads (file mtimes shift on a warehouse copy; this doesn't).
    */
  private def recordBirth(): Unit =
    if (!Files.exists(birthFile)) {
      Files.createDirectories(birthFile.getParent)
      Files.write(birthFile,
        System.currentTimeMillis().toString.getBytes("UTF-8"))
    }

  /** Declare the row schema before any merge has run — a chained
    * subscriber's backfill snapshot of a never-written TABLE must read
    * with its DDL columns, not a zero-column frame. First merge keeps
    * the declared schema (write-once).
    */
  def declareSchema(schema: org.apache.spark.sql.types.StructType): Unit = {
    if (!Files.exists(schemaFile)) {
      Files.createDirectories(schemaFile.getParent)
      Files.write(schemaFile, schema.json.getBytes("UTF-8"))
    }
    recordBirth()
  }

  private def storedSchema: Option[org.apache.spark.sql.types.StructType] =
    if (!Files.exists(schemaFile)) None
    else scala.util.Try(
      org.apache.spark.sql.types.DataType.fromJson(
        new String(Files.readAllBytes(schemaFile), "UTF-8"))
        .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption

  private def readBuckets(): Option[DataFrame] =
    if (!Files.exists(Paths.get(targetDir))) None
    else
      try Some(spark.read.parquet(targetDir))
      catch { // only the _schema sidecar present — no data files yet
        case _: org.apache.spark.sql.AnalysisException => None
      }

  /** Rows from ONLY the storage buckets that can contain `keys` — the
    * O(delta × table/nBuckets) read that makes per-batch recompute
    * incremental. `keys` must carry the bucket columns; the distinct
    * touched bucket ids are collected on the driver (bounded by the
    * delta's distinct-key count, itself ≤ nBuckets values). Falls back
    * to a full read when `keys` lacks the bucket columns or the MV is
    * empty.
    */
  def readTouched(keys: DataFrame): DataFrame = {
    val stored = readBuckets()
    if (stored.isEmpty) read()
    else if (!bucketCols.forall(keys.columns.contains)) read()
    else {
      val touched = keys
        .select(pmod(hash(bucketCols.map(col): _*), lit(nBuckets)).as(bucketCol))
        .distinct().collect().map(_.getInt(0)).toSeq
      if (touched.isEmpty) read().where(lit(false))
      else stored.get.where(col(bucketCol).isin(touched: _*)).drop(bucketCol)
    }
  }

  // ---------------------------------------------------------------- WAL
  // Journal of epochs whose storage rewrite may be in flight: an epoch
  // merge writes its delta here FIRST, rewrites storage, then publishes
  // by atomically renaming the journal into the changelog. recoverWal()
  // re-drives anything orphaned between those steps after a crash.
  private val walRoot = Paths.get(s"$targetDir.wal")
  private def walEpochDir(id: Long) = walRoot.resolve(s"epoch-$id")

  private def latestWalEpoch: Long =
    if (!Files.exists(walRoot)) -1L
    else {
      import scala.jdk.CollectionConverters._
      FsList.list(walRoot).iterator
        .flatMap(p => p.getFileName.toString.stripPrefix("epoch-").toLongOption)
        .foldLeft(-1L)(math.max)
    }

  /** Next free epoch across published AND journaled-but-unpublished
    * epochs — every allocator (DML, temporal eviction, the micro-batch
    * epoch map) draws from here so a crash-orphaned journal can never
    * collide with a freshly allocated epoch.
    */
  def nextEpoch: Long = math.max(latestChangelogBatchId, latestWalEpoch) + 1

  /** Publication = one atomic rename of the journal into the changelog.
    * Losing the rename race to a concurrent retry means theirs carried
    * the same delta — drop ours.
    */
  private def publishWal(batchId: Long): Unit = {
    val wal = walEpochDir(batchId)
    val batchDir = Paths.get(changelogDir, s"batch-$batchId")
    Files.createDirectories(batchDir.getParent)
    try {
      Files.move(wal, batchDir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      // commit-time marker for the timestamp axis (see epochCommitTimes);
      // written after the rename — a crash in between falls back to the
      // dir mtime, which at that point IS the rename instant
      Files.write(batchDir.resolve("_commit_ms"),
        System.currentTimeMillis().toString.getBytes("UTF-8"))
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => deleteRecursively(wal)
    }
  }

  /** Complete epochs that crashed between journal and publication: for
    * each surviving `<store>.wal/epoch-<id>`, re-apply the journaled
    * delta to storage (idempotent — deltas are PK-keyed row IMAGES, not
    * increments, so applyToSnapshot's last-write-wins absorbs a replay
    * over a partially- or fully-rewritten store) and publish it, in
    * epoch order. Journals whose epoch already published are duplicate
    * losers of the rename race and are dropped, as are incomplete
    * `.tmp-*` scratch dirs — a crash mid-journal loses the un-acked
    * statement entirely (at-most-once before the journal commits,
    * exactly-once after). Called on (re)attach via [[MvCatalog.define]];
    * no-op unless a crash left orphans.
    */
  def recoverWal(): Unit = {
    // a snapshot write torn before its atomic rename is pure garbage —
    // the committed history it derives from is intact
    if (Files.exists(snapshotsRoot)) {
      import scala.jdk.CollectionConverters._
      FsList.list(snapshotsRoot).iterator.toSeq
        .filter(_.getFileName.toString.startsWith(".tmp-"))
        .foreach(deleteRecursively)
    }
    if (Files.exists(walRoot)) recoverWalEpochs()
  }

  private def recoverWalEpochs(): Unit = {
    import scala.jdk.CollectionConverters._
    val entries = FsList.list(walRoot).iterator.toSeq
    entries.filter(_.getFileName.toString.startsWith(".tmp-"))
      .foreach(deleteRecursively)
    entries
      .flatMap(p =>
        p.getFileName.toString.stripPrefix("epoch-").toLongOption.map((_, p)))
      .sortBy(_._1)
      .foreach { case (id, wal) =>
        if (Files.exists(Paths.get(changelogDir, s"batch-$id")))
          deleteRecursively(wal)
        else {
          val delta = spark.read.parquet(wal.toString)
          applyDeltaToStorage(delta.withColumn(bucketCol, bucketOf(delta)))
          publishWal(id)
        }
      }
  }

  /** Merge one delta (latest row per PK wins over stored rows). Rows in
    * `delta` with a Changelog op column are applied with delete support;
    * plain DataFrames are treated as upserts.
    *
    * Epoch merges (`batchId >= 0`) commit in three crash-ordered steps —
    * a write-ahead shape that makes the statement's effects atomic
    * across storage AND the changelog under kill -9:
    *
    *   1. JOURNAL — the delta (+ sidecar) is staged and atomically
    *      renamed to `<store>.wal/epoch-<id>`. Nothing is visible to any
    *      reader yet.
    *   2. STORAGE — the touched buckets are rewritten
    *      ([[applyDeltaToStorage]]). Idempotent per the journal replay
    *      contract above, so a crash anywhere inside re-drives cleanly.
    *   3. PUBLISH — the journal dir is renamed to `changelog/batch-<id>`,
    *      the signal downstream subscribers act on. Publication stays
    *      strictly AFTER the storage rewrite: a chained-aggregate
    *      recompute reads THIS MV's storage when the epoch arrives, and
    *      publish-first would let it observe pre-rewrite state and
    *      resurrect stale groups. Storage newer than the consumed epoch
    *      is safe (later epochs re-touch their own groups on delivery).
    *
    * [[recoverWal]] finishes any epoch that crashed between 1 and 3, so
    * there is no reachable state where storage has a delta the changelog
    * never will (or vice versa) — the exactly-once epoch contract
    * (reference: docs/dev/src/design/checkpoint.md) under mid-epoch
    * crashes, attacked point-by-point by CrashRecoverySpec. An
    * already-published epoch short-circuits the whole merge, which is
    * what makes foreachBatch retries and post-recovery stream replays
    * no-ops.
    *
    * `sidecar` entries (name → content) ride inside the journal dir, so
    * operator state that must move in lock-step with the delta (a
    * dynamic-filter threshold, a frontier) commits in the SAME atomic
    * rename — a crash can never publish the delta without its sidecar or
    * vice versa. Names must be underscore-prefixed (hidden from parquet
    * readers); only meaningful with an epoch (`batchId >= 0`).
    */
  def merge(delta: DataFrame, batchId: Long = -1L,
      sidecar: Map[String, String] = Map.empty,
      // DataFrame-valued sidecars: parquet SUBDIRS of the epoch dir
      // (underscore-prefixed → invisible to every changelog reader),
      // committed in the same atomic rename as the delta. Used by
      // operators whose auxiliary state must move in lock-step with the
      // published epoch (DynamicSetFilter's key-set delta).
      sidecarDf: Map[String, DataFrame] = Map.empty): Unit = {
    require((sidecar.isEmpty && sidecarDf.isEmpty) || batchId >= 0,
      "sidecar state requires an epoch (batchId >= 0)")
    require((sidecar.keys ++ sidecarDf.keys).forall(_.startsWith("_")),
      "sidecar names must be underscore-prefixed (hidden from readers)")
    // committed end-to-end already (journal → storage → publish): a
    // replayed micro-batch / retried DML has nothing left to do
    if (batchId >= 0 && Files.exists(Paths.get(changelogDir, s"batch-$batchId")))
      return
    val hasOps = delta.columns.contains(Changelog.OpCol)
    val norm0 =
      if (!hasOps) Changelog.ofInserts(delta)
      // ops without a sequence: assign one (partition-ordered) so
      // multi-change-per-PK deltas resolve deterministically
      else if (!delta.columns.contains(Changelog.SeqCol))
        delta.withColumn(Changelog.SeqCol, monotonically_increasing_id())
      else delta
    // remember the row schema (underscore name — invisible to parquet
    // readers) so an emptied store still reads with its columns
    if (!Files.exists(schemaFile)) {
      val dataSchema = org.apache.spark.sql.types.StructType(
        norm0.schema.fields.filterNot(f =>
          Seq(Changelog.OpCol, Changelog.SeqCol, bucketCol).contains(f.name)))
      Files.createDirectories(schemaFile.getParent)
      Files.write(schemaFile, dataSchema.json.getBytes("UTF-8"))
    }
    recordBirth()
    if (batchId >= 0) {
      // 1. JOURNAL: stage the delta + sidecar, atomic rename into the
      // WAL. The journal doubles as the PINNED copy of the delta: the
      // delta's lineage often reads THIS MV's storage (DML update/
      // delete deltas, a chained aggregate's retraction rows) which the
      // rewrite below invalidates, so the rest of the merge reads the
      // journaled parquet back — one materializing write instead of a
      // localCheckpoint job PLUS the journal write.
      val wal = walEpochDir(batchId)
      if (!Files.exists(wal)) {
        graft.CrashPoints.hit("wal.journal")
        val tmp = walRoot.resolve(s".tmp-$batchId")
        deleteRecursively(tmp)
        norm0.write.mode("overwrite").parquet(tmp.toString)
        sidecar.foreach { case (fname, content) =>
          Files.write(tmp.resolve(fname), content.getBytes)
        }
        sidecarDf.foreach { case (fname, df) =>
          df.write.mode("overwrite").parquet(tmp.resolve(fname).toString)
        }
        try Files.move(tmp, wal,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { // lost a race with a concurrent retry: theirs is equivalent
          case _: java.nio.file.FileAlreadyExistsException =>
            deleteRecursively(tmp)
        }
      }
      graft.CrashPoints.hit("wal.journaled")
      val journaled = spark.read.parquet(wal.toString)
      val norm = journaled.withColumn(bucketCol, bucketOf(journaled))
      // 2. STORAGE (insert-only deltas cannot empty a bucket — skip
      // the post-merge empty-bucket probe)
      applyDeltaToStorage(norm, deleteFree = !hasOps)
      graft.CrashPoints.hit("publish.rename")
      // 3. PUBLISH
      publishWal(batchId)
      graft.CrashPoints.hit("publish.done")
      try onEpochPublished(batchId)
      catch { case scala.util.control.NonFatal(_) => () }
    } else synchronized {
      // ad-hoc merge outside a streaming epoch: no journal, so pin the
      // delta with a localCheckpoint before the storage its lineage may
      // read is rewritten; then a plain changelog append
      // (cursor-invisible — no epoch to order by)
      val norm = norm0.withColumn(bucketCol, bucketOf(norm0)).localCheckpoint()
      try {
        applyDeltaToStorage(norm, deleteFree = !hasOps)
        norm.drop(bucketCol).write.mode("append").parquet(changelogDir)
      } finally norm.queryExecution.logical match {
        // free the checkpointed delta promptly (Dataset.unpersist does
        // not reach a localCheckpoint's RDD; ContextCleaner would be late)
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(false)
        case _ =>
      }
    }
  }

  /** The storage half of a merge: rewrite exactly the buckets the delta
    * touches. `norm` must carry op/seq and the bucket column. The merged
    * buckets overwrite in place (dynamic partition overwrite); buckets
    * whose content became empty (all rows deleted) are removed
    * explicitly since an empty partition never appears in the writer's
    * output. Idempotent for a fixed delta: re-running over any prefix of
    * its own effects converges to the same bucket contents
    * (PK-last-write-wins over row images).
    */
  private def applyDeltaToStorage(norm: DataFrame,
      deleteFree: Boolean = false): Unit = {
    val affected = norm.select(bucketCol).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (affected.nonEmpty) withWriteLock {
      val existingOpt = readBuckets().map(_.where(col(bucketCol).isin(affected: _*)))
      val dataCols = norm.columns.toSeq
        .filterNot(Seq(Changelog.OpCol, Changelog.SeqCol, bucketCol).contains)
      val snapshot = existingOpt
        .map(_.select(dataCols.map(col) :+ col(bucketCol): _*))
        .getOrElse(norm.where(lit(false)).select(dataCols.map(col) :+ col(bucketCol): _*))
      val merged = Changelog.applyToSnapshot(
        snapshot.drop(bucketCol),
        norm.drop(bucketCol),
        pk)
      // Pin the merged rows BEFORE overwriting the storage their
      // lineage reads (same localCheckpoint trick as the delta above;
      // spills to executor disk, so memory profile matches the old
      // staging-dir double write it replaces, minus a full parquet
      // encode + listing + re-read per epoch).
      val pinned = merged.withColumn(bucketCol, bucketOf(merged))
        .localCheckpoint()
      try {
        // an insert-only delta cannot empty a bucket: every affected
        // bucket keeps at least the inserted rows, so the post-merge
        // probe (one Spark job) is skipped
        val nonEmpty =
          if (deleteFree) affected.toSet
          else pinned.select(bucketCol).distinct()
            .collect().map(_.getInt(0)).toSet
        // dynamic partition overwrite rewrites exactly the buckets
        // present in the output; buckets whose last row was deleted
        // produce nothing and are removed explicitly below
        if (nonEmpty.nonEmpty) {
          val oneFilePerBucket = pinned.repartition(col(bucketCol))
          val clustered =
            if (sortWithinBuckets.isEmpty) oneFilePerBucket
            else oneFilePerBucket.sortWithinPartitions(
              (bucketCol +: sortWithinBuckets).map(col): _*)
          clustered.write.mode("overwrite")
            .partitionBy(bucketCol)
            .parquet(targetDir)
        }
        graft.CrashPoints.hit("storage.buckets")
        (affected.toSet -- nonEmpty).foreach { b =>
          deleteRecursively(Paths.get(targetDir, s"$bucketCol=$b"))
        }
      } finally pinned.queryExecution.logical match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(false)
        case _ =>
      }
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      FsList.walk(p).reverse.foreach(Files.delete)
    }

  /** Start the MV maintenance job over a streaming source. Update mode
    * suits grouped-aggregate plans (changed groups re-emit per batch);
    * append mode is required for stream-stream join plans, whose
    * finalized rows merge as plain upserts.
    */
  def start(
      transformed: DataFrame,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      outputMode: String = "update"): StreamingQuery =
    transformed.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, id: Long) => mergeStreamBatch(batch, id))
      .start()

  /** Published-epoch allocation for the maintenance stream's micro-
    * batches. A micro-batch id is NOT used as the epoch directly: DML
    * and temporal-filter-eviction merges on the same MV allocate
    * `latestChangelogBatchId + 1`, and a raw micro-batch id catching up
    * to one of those would hit an existing `batch-<id>` dir and
    * silently SKIP its changelog publication (losing the delta for
    * every downstream subscriber). Instead each micro-batch durably
    * maps to a fresh epoch from the same monotone sequence all writers
    * share; a foreachBatch RETRY of an already-mapped micro-batch
    * replays under its original epoch, keeping the exactly-once
    * publication contract (batch-dir existence dedups it).
    */
  private val epochMapDir = Paths.get(s"$targetDir.epochmap")

  def mergeStreamBatch(batch: DataFrame, microBatchId: Long): Unit =
    synchronized {
      val entry = epochMapDir.resolve(s"mb-$microBatchId")
      if (!Files.exists(entry)) {
        val e = nextEpoch
        Files.createDirectories(epochMapDir)
        val tmp = epochMapDir.resolve(s"mb-$microBatchId.tmp")
        Files.write(tmp, e.toString.getBytes("UTF-8"))
        try Files.move(tmp, entry,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { // lost a same-JVM race: the winner's mapping is canonical
          case _: java.nio.file.FileAlreadyExistsException =>
            Files.deleteIfExists(tmp)
        }
      }
      graft.CrashPoints.hit("epochmap.entry")
      val epoch = new String(Files.readAllBytes(entry), "UTF-8").trim.toLong
      merge(batch, epoch)
    }
}

object MaterializedView {
  private val locks =
    scala.collection.concurrent.TrieMap
      .empty[String, java.util.concurrent.locks.ReentrantReadWriteLock]

  private def lockFor(dir: String) = locks.getOrElseUpdate(
    dir, new java.util.concurrent.locks.ReentrantReadWriteLock())
}

/** Catalog of MVs — the meta-node analog (reference: src/meta/ catalog).
  * MV-on-MV is expressed by pointing a downstream MV's source at an
  * upstream MV's target directory (file-stream over its parquet).
  */
final class MvCatalog(spark: SparkSession, baseDir: String) {
  private val views = scala.collection.mutable.Map[String, MaterializedView]()

  /** Session default for new stores' bucket counts — the reference's
    * `streaming_parallelism` session variable governs the parallelism
    * of NEWLY created streaming jobs the same way (existing stores keep
    * the layout they were created with; it is persisted per object).
    */
  @volatile var defaultBuckets: Int = 32

  /** Catalog-wide epoch-publication listener, fanned into every store
    * this catalog defines — the engine's background-compaction enqueue.
    */
  @volatile var onEpochPublished: (String, Long) => Unit = (_, _) => ()

  def define(name: String, pk: Seq[String], nBuckets: Int = -1,
      bucketKeys: Seq[String] = Seq.empty,
      sortWithinBuckets: Seq[String] = Seq.empty): MaterializedView = {
    val buckets = if (nBuckets > 0) nBuckets else defaultBuckets
    val mv = new MaterializedView(spark, name, pk, s"$baseDir/$name/data",
      buckets, bucketKeys, sortWithinBuckets)
    mv.onEpochPublished = e => onEpochPublished(name, e)
    // finish any epoch a crash stranded between journal and publication
    // (no-op unless the store carries WAL orphans)
    mv.recoverWal()
    views(name) = mv
    mv
  }

  def get(name: String): Option[MaterializedView] = views.get(name)
  def drop(name: String): Unit = views.remove(name)
  def checkpointDir(name: String): String = s"$baseDir/$name/checkpoint"
  def list: Seq[String] = views.keys.toSeq.sorted
}
