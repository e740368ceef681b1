package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal Delta-style transactional table on plain parquet: an ordered
  * commit log of immutable JSON entries under `_graft_log/`, each
  * pointing at the immutable data directory its commit wrote. Readers
  * reconstruct any version by replaying the log (last `overwrite` +
  * subsequent `append`s); writers race for the next version number with
  * an ATOMIC create — the Delta Lake commit protocol (Armbrust et al.,
  * "Delta Lake: High-Performance ACID Table Storage over Cloud Object
  * Stores", VLDB 2020, §3.1) re-expressed over a filesystem with
  * O_EXCL semantics.
  *
  * Commit protocol (optimistic concurrency):
  *   1. stage: write the DataFrame as parquet into `data/<uuid>/` —
  *      invisible to readers until a log entry references it.
  *   2. claim: `Files.createFile(_graft_log/<v>.json)` — atomic
  *      create-if-absent (POSIX O_EXCL / HDFS create w/o overwrite). A
  *      loser gets FileAlreadyExistsException and retries at v+1;
  *      the staged data dir is never re-written.
  *   3. publish: write the entry to a temp file and ATOMIC_MOVE it over
  *      the claimed (empty) slot. Readers treat an empty/unparsable
  *      newest entry as in-flight and fall back one version.
  * On S3-class stores without atomic create, step 2 needs a commit
  * coordinator (as Delta itself does); the log/data layout is unchanged.
  *
  * Scale notes: the log is metadata — entries are O(100 bytes); data
  * dirs are whole parquet directories, so commit cost is one rename-
  * free reference regardless of table size. Reads prune to exactly the
  * dirs the replayed version references (a snapshot read never lists
  * dead versions' files). Compaction ([[compact]]) is a normal commit:
  * old versions stay time-travelable until [[vacuum]] drops them.
  * Two growth dimensions and their mitigations, both the same moves
  * Delta makes: (1) the log listing is O(total commits) — at high
  * commit rates production Delta snapshots the replay state into
  * parquet checkpoint files every ~10 commits so readers list only the
  * tail; here [[vacuum]] bounds the listing by dropping dead entries.
  * (2) a long append chain makes the snapshot a deep scan-union — the
  * small-files problem — which [[compact]]/[[compactZorder]] collapse
  * into one overwrite without losing history.
  */
object VersionedTable {

  final case class Commit(version: Long, mode: String, dataDir: String,
                          txn: Option[Long] = None)

  private val LogDir = "_graft_log"
  private val DataDir = "data"

  private def logPath(table: String): Path = Paths.get(table, LogDir)

  private def entryName(v: Long): String = f"$v%020d.json"

  /** Parse the strict single-line entry this object writes. Returns
    * None for in-flight (empty or partially published) entries.
    */
  private def parse(p: Path): Option[Commit] = {
    val name = p.getFileName.toString
    if (!name.endsWith(".json")) return None
    val bytes = Files.readAllBytes(p)
    if (bytes.isEmpty) return None
    val s = new String(bytes, "UTF-8")
    val re =
      """\{"version":(\d+),"mode":"(overwrite|append)"(?:,"txn":(-?\d+))?,"dataDir":"([^"]+)"\}""".r
    s.trim match {
      case re(v, m, t, d) =>
        Some(Commit(v.toLong, m, d, Option(t).map(_.toLong)))
      case _ => None
    }
  }

  /** All committed entries, version-ascending. In-flight entries
    * (claimed but not yet published) are excluded — normally only the
    * trailing version, though a loser that re-claimed above a
    * still-publishing winner can leave a TRANSIENT mid-log gap; replay
    * never requires contiguity, so readers are unaffected.
    */
  def history(table: String): Seq[Commit] = {
    import scala.jdk.CollectionConverters._
    val dir = logPath(table)
    if (!Files.isDirectory(dir)) return Seq.empty
    val it = Files.list(dir)
    try it.iterator().asScala.flatMap(parse).toSeq.sortBy(_.version)
    finally it.close()
  }

  /** Latest committed version, or -1 for an empty/absent table. */
  def latestVersion(table: String): Long =
    history(table).lastOption.map(_.version).getOrElse(-1L)

  /** Stage `df` and commit it as the next version. `mode` is
    * "overwrite" (snapshot replaces the table) or "append" (adds to
    * it). Returns the committed version. Thread/process-safe: losers of
    * a version race retry at the next number with the SAME staged data,
    * so every commit lands exactly once.
    */
  def commit(df: DataFrame, table: String, mode: String): Long =
    commit(df, table, mode, txn = None)

  /** [[commit]] carrying a transaction identity — the Delta
    * `txnAppId/txnVersion` idempotency device: a committer that may
    * replay (a restarted streaming batch) tags its commit, and
    * [[streamingCommitSink]] skips any batch whose txn already appears
    * in the log.
    */
  def commit(df: DataFrame, table: String, mode: String,
             txn: Option[Long]): Long = {
    require(mode == "overwrite" || mode == "append",
      s"mode must be overwrite|append, got $mode")
    // schema-on-write (Delta's append contract): an append whose
    // columns don't match the current snapshot would poison every later
    // read with a union error — fail at the write, name the drift.
    // Overwrites may change schema freely (they truncate the replay).
    if (mode == "append" && latestVersion(table) >= 0) {
      val want = read(df.sparkSession, table).schema
        .fields.map(f => (f.name, f.dataType)).toSet
      val got = df.schema.fields.map(f => (f.name, f.dataType)).toSet
      require(got == want,
        s"append schema mismatch: appending ${df.schema.simpleString} " +
          s"to a table whose snapshot schema differs — overwrite to evolve")
    }
    val uuid = java.util.UUID.randomUUID().toString
    val staged = Paths.get(table, DataDir, uuid)
    df.write.mode("errorifexists").parquet(staged.toString)
    Files.createDirectories(logPath(table))
    var v = latestVersion(table) + 1
    while (true) {
      val slot = logPath(table).resolve(entryName(v))
      try {
        Files.createFile(slot) // atomic claim (O_EXCL)
        val txnField = txn.map(t => s""","txn":$t""").getOrElse("")
        val entry =
          s"""{"version":$v,"mode":"$mode"$txnField,"dataDir":"$DataDir/$uuid"}"""
        val tmp = Files.createTempFile(logPath(table), s".$v-", ".tmp")
        Files.write(tmp, entry.getBytes("UTF-8"))
        Files.move(tmp, slot, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING) // we own the claimed slot
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          v += 1 // another writer claimed this version — retry above it
      }
    }
    v // unreachable
  }

  /** Snapshot at `version` (default: latest): the last overwrite at or
    * below it plus every append after that overwrite. The union is a
    * plan-level concat of parquet scans — partition pruning and filter
    * pushdown reach every member dir.
    */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame = {
    val upTo = history(table).filter(_.version <= version)
    require(upTo.nonEmpty, s"no committed version <= $version in $table")
    val fromLastOverwrite = upTo.lastIndexWhere(_.mode == "overwrite") match {
      case -1 => upTo
      case i => upTo.drop(i)
    }
    fromLastOverwrite.map(c =>
        spark.read.parquet(Paths.get(table, c.dataDir).toString))
      .reduce(_.unionByName(_))
  }

  /** Latest committed snapshot. */
  def read(spark: SparkSession, table: String): DataFrame =
    readVersion(spark, table, Long.MaxValue)

  /** MERGE INTO: apply a CDC change set to the latest snapshot via
    * [[graft.operators.Cdc.applyChanges]] and commit the result as an
    * overwrite — the plain-parquet equivalent of Delta MERGE, with the
    * old snapshot still time-travelable.
    */
  def merge(spark: SparkSession, table: String, changes: DataFrame,
            keyCol: String, seqCol: String, opCol: String): Long = {
    val next = graft.operators.Cdc.applyChanges(
      read(spark, table), changes, keyCol, seqCol, opCol)
    commit(next, table, "overwrite")
  }

  /** Change data feed between two committed versions — Delta
    * `table_changes`: keyed added/removed/changed rows, computed by
    * [[graft.operators.SnapshotDiff.diff]] over the two replayed
    * snapshots, so the join carries (key, payload-hash), never
    * payloads, and the output is churn-sized.
    */
  def changesBetween(spark: SparkSession, table: String,
                     fromVersion: Long, toVersion: Long, keyCol: String,
                     payloadCols: Seq[String]): DataFrame =
    graft.operators.SnapshotDiff.diff(
      readVersion(spark, table, fromVersion),
      readVersion(spark, table, toVersion), keyCol, payloadCols)

  /** Streaming sink: commit every micro-batch as one `mode` commit
    * tagged with its batch id as the txn identity, so a REPLAYED batch
    * (restart from checkpoint) is recognized in the log and skipped —
    * exactly-once table contents over at-least-once batch delivery,
    * the Delta idempotent-writes recipe.
    */
  def streamingCommitSink(df: DataFrame, table: String,
                          mode: String = "append")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!history(table).exists(_.txn.contains(batchId))) {
          commit(batch, table, mode, txn = Some(batchId))
          ()
        }
    }

  /** OPTIMIZE: rewrite the current snapshot as one overwrite commit
    * with `targetFiles` output files — collapses append chains (and
    * their small-files problem) without losing history.
    */
  def compact(spark: SparkSession, table: String, targetFiles: Int = 1): Long =
    commit(read(spark, table).coalesce(targetFiles), table, "overwrite")

  /** OPTIMIZE ... ZORDER BY (dimA, dimB): rewrite the current snapshot
    * range-partitioned and sorted by the Morton interleave of the two
    * dimensions (the [[graft.operators.Compaction.zorderWrite]] layout)
    * as one overwrite commit — 2-D box predicates then prune to a few
    * files via parquet min/max footer stats, and every prior version
    * stays time-travelable.
    */
  def compactZorder(spark: SparkSession, table: String, dimA: String,
                    dimB: String, files: Int): Long = {
    import org.apache.spark.sql.functions.col
    val z = read(spark, table)
      .withColumn("__z", graft.functions.InterleaveBits.interleaveBits(
        col(dimA).cast("long"), col(dimB).cast("long")))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
    commit(z, table, "overwrite")
  }

  /** Drop data dirs unreachable from versions > `keepAfter` and their
    * log entries — Delta VACUUM. Time travel to <= keepAfter stops
    * working; concurrent readers of dropped versions are the caller's
    * contract to exclude (Delta's retention-window rule).
    */
  def vacuum(table: String, keepAfter: Long): Unit = {
    val all = history(table)
    val keep = all.filter(_.version > keepAfter)
    // dirs referenced by ANY kept version's replay — a kept version's
    // base overwrite (and the appends above it) may sit at or below
    // keepAfter and must survive, log entry included
    val live = keep.map(_.version).flatMap { w =>
      val upTo = all.filter(_.version <= w)
      val i = upTo.lastIndexWhere(_.mode == "overwrite")
      (if (i == -1) upTo else upTo.drop(i)).map(_.dataDir)
    }.toSet
    val dead = all.filterNot(c => live.contains(c.dataDir))
    dead.foreach { c =>
      val dir = Paths.get(table, c.dataDir)
      if (Files.isDirectory(dir)) {
        val it = Files.walk(dir)
        try it.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
        finally it.close()
      }
      Files.deleteIfExists(logPath(table).resolve(entryName(c.version)))
    }
  }
}
