package graft.mv

import java.time.LocalDate

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Bitmaps

/** A persisted partial-aggregate state table — the Spark-native analog of a
  * ReplicatedAggregatingMergeTree store behind a materialized view
  * (ref scripts/sql/dwm.mainpage_stat_mv_dis.sql:2-25; SURVEY.md §1.1).
  *
  * Storage: day-partitioned Parquet (`<path>/<partitionCol>=YYYY-MM-DD/...`),
  * rows sorted within partitions by the grouping keys — the MergeTree
  * PARTITION BY + ORDER BY layout that makes partition pruning and row-group
  * min/max skipping effective (ref ods.action_001_dis.sql:18-22).
  *
  * Lifecycle mirrors the reference exactly:
  *  - [[append]]: each insert batch's partial aggregates land as new rows
  *    (MV insert trigger, doc:298-301) — history is never recomputed, late
  *    rows land in whatever day partition they carry (no watermark drop,
  *    SURVEY §2.8 ST2).
  *  - [[merged]]/[[finalized]]: merge-on-read collapses equal keys (the
  *    SELECT ... -Merge read path, ref dwm.mainpage_stat_mv_dis.sql:60-70);
  *    coarser `groupKeys` give the dws-style rollups (re-aggregation from
  *    finer states replaces CUBE, SURVEY §2.4).
  *  - [[compact]]: background-merge analog (OPTIMIZE FINAL, doc:953-995) —
  *    rewrites each partition with equal keys pre-merged, atomically,
  *    read-equivalent before and after.
  *  - [[expire]]: TTL retention (ref ods.action_001_dis.sql:21) — drops
  *    whole day partitions past the horizon.
  *
  * At cluster scale every operation here is partition-parallel: append is a
  * map-side partial aggregate of the batch (no shuffle of history), reads
  * prune to the queried days, and compaction shuffles only the keys within
  * each rewritten partition.
  */
final class StateTable(
    spark: SparkSession,
    val path: String,
    val keys: Seq[String],
    val partitionCol: String,
    val metrics: Seq[Metric]) {

  Bitmaps.register(spark)
  graft.functions.MapAggregates.register(spark)
  graft.functions.QuantileSketch.register(spark)
  graft.functions.StatAggregates.register(spark)
  recoverFromCompact()
  recoverInFlightIngest()

  private def stateCols = metrics.map(_.state)
  private def mergeCols = metrics.map(_.merge)

  /** Aggregate a raw batch to state rows (the MV SELECT over one insert). */
  def toStates(batch: DataFrame): DataFrame =
    batch.groupBy(keys.map(col): _*).agg(stateCols.head, stateCols.tail: _*)

  /** Append pre-aggregated state rows for one batch. */
  def append(states: DataFrame): Unit = Projection.suppress {
    // suppress: if this table is registered as a projection of `states`'
    // source, the ingest aggregate must NOT route onto the table itself —
    // the table is out of sync with the source for exactly this batch, so
    // a routed read would lose the batch (new partition) or double it
    states
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("append").partitionBy(partitionCol).parquet(path)
    invalidateSchema() // new parts may widen the union schema
  }

  /** Aggregate + append a raw batch (insert-trigger semantics). */
  def appendBatch(batch: DataFrame): Unit = append(toStates(batch))

  /** Exactly-once append: the ClickHouse inserted-block dedup analog for
    * foreachBatch retries. A batch is written to `_staging/<batchId>`,
    * its files MOVED into the table under `batch-<batchId>-` names (renames,
    * no data copy), and only then is the `_ledger/batch-<batchId>` marker
    * created — the commit point. Replays of a committed id return false and
    * touch nothing; a crash anywhere before the marker leaves only
    * batch-tagged orphans that [[recoverInFlightIngest]] removes on the
    * next open, after which the retry re-ingests cleanly. Underscore paths
    * are invisible to Spark's file listing, so staging and ledger never
    * pollute reads. Requires a stable batchId across retries — exactly what
    * a checkpointed foreachBatch provides.
    */
  /** The ledger token of (namespace, batchId). `ns` keeps independent
    * writers apart: two MVs streaming into the SAME wide table each run
    * their own foreachBatch id sequence starting at 0, so an un-namespaced
    * ledger would drop the second writer's batch 0 as a "replay" of the
    * first's. No '-' allowed (the recovery parser splits on it).
    * MIGRATION NOTE: tables written before namespacing hold bare-id
    * markers; those dedup only writers using the same empty namespace —
    * a resumed stream whose MV now passes its name will re-ingest ids the
    * old ledger committed. Re-create the checkpoint (or the table) when
    * upgrading a live multi-writer pipeline.
    */
  private def batchTok(batchId: Long, ns: String): String = {
    val clean = ns.replaceAll("[^A-Za-z0-9_.]", "_")
    // Sanitizing can collapse distinct raw names ("mv-1" vs "mv_1") into one
    // token; a shared token would silently drop the second writer's batches
    // as replays. Disambiguate with a short hash of the RAW name whenever the
    // sanitizer changed anything (unchanged names keep their old tokens, so
    // existing ledgers stay valid).
    val tag =
      if (clean == ns) clean
      else f"$clean.h${scala.util.hashing.MurmurHash3.stringHash(ns) & 0xFFFFFFFFL}%08x"
    if (tag.isEmpty) s"$batchId" else s"$tag.$batchId"
  }

  def appendExactlyOnce(states: DataFrame, batchId: Long, ns: String = ""): Boolean =
      Projection.suppress {
    val fs = fileSystem()
    val tok = batchTok(batchId, ns)
    val marker = new Path(path, s"_ledger/batch-$tok")
    if (fs.exists(marker)) return false
    cleanIngest(fs, tok) // a previous attempt of this id may have died mid-move
    val staging = new Path(path, s"_staging/$tok")
    states
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(staging.toString)
    for (dayDir <- fs.listStatus(staging).toSeq
         if dayDir.isDirectory && dayDir.getPath.getName.contains("=")) {
      val target = new Path(path, dayDir.getPath.getName)
      fs.mkdirs(target)
      for (f <- fs.listStatus(dayDir.getPath).toSeq
           if !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith(".")) {
        if (!fs.rename(f.getPath, new Path(target, s"batch-$tok-${f.getPath.getName}")))
          sys.error(s"exactly-once append: failed to move ${f.getPath} into $target")
      }
    }
    fs.delete(staging, true)
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
    invalidateSchema()
    true
  }

  /** Aggregate + exactly-once append of a raw batch. */
  def appendBatchExactlyOnce(batch: DataFrame, batchId: Long, ns: String = ""): Boolean =
    appendExactlyOnce(toStates(batch), batchId, ns)

  /** Remove every trace of an uncommitted batch token: its staging dir and
    * any batch-tagged files already moved into partition dirs.
    */
  private def cleanIngest(fs: FileSystem, tok: String): Unit = {
    fs.delete(new Path(path, s"_staging/$tok"), true)
    val root = new Path(path)
    if (fs.exists(root))
      for (day <- fs.listStatus(root).toSeq if day.isDirectory && day.getPath.getName.contains("=");
           f <- fs.listStatus(day.getPath).toSeq
           if f.getPath.getName.startsWith(s"batch-$tok-"))
        fs.delete(f.getPath, false)
  }

  /** Open-time recovery for [[appendExactlyOnce]]: every batch id seen in
    * staging or in batch-tagged data files whose ledger marker is missing
    * was an in-flight ingest at crash time — remove its traces so the
    * stream's retry re-ingests from scratch.
    */
  private def recoverInFlightIngest(): Unit = {
    val fs = fileSystem()
    val root = new Path(path)
    if (!fs.exists(root)) return
    val stagingIds = {
      val st = new Path(path, "_staging")
      if (fs.exists(st)) fs.listStatus(st).toSeq.map(_.getPath.getName)
      else Nil
    }
    val movedIds = for {
      day <- fs.listStatus(root).toSeq if day.isDirectory && day.getPath.getName.contains("=")
      f <- fs.listStatus(day.getPath).toSeq if f.getPath.getName.startsWith("batch-")
    } yield f.getPath.getName.drop("batch-".length).takeWhile(_ != '-')
    for (tok <- (stagingIds ++ movedIds).distinct
         if !fs.exists(new Path(path, s"_ledger/batch-$tok")))
      cleanIngest(fs, tok)
  }

  // merged part schema, computed once per (instance, table state): the
  // footer-listing merge job is paid on the first read after open/append,
  // not on every merge-on-read. The cache tracks THIS instance's writes
  // only — a reader instance that must observe another writer's ALTER
  // widening calls [[refresh]] (same contract as re-opening).
  @volatile private var cachedSchema: Option[org.apache.spark.sql.types.StructType] = None

  /** Drop the cached part-schema union so the next read re-merges part
    * footers — call after another process/instance widened the table.
    */
  def refresh(): Unit = invalidateSchema()

  /** Raw state rows as stored (pre-merge). Part schemas are unioned so an
    * ALTER-style widening works on live tables (the reference's
    * `add column if not exists` flow, ref dwm.mainpage_stat_mv_dis.sql:78-96,
    * 157-182): parts that predate a metric surface it as NULL, which every
    * merge treats as identity.
    */
  def read(): DataFrame = cachedSchema match {
    case Some(schema) => spark.read.schema(schema).parquet(path)
    case None =>
      try {
        val df = spark.read.option("mergeSchema", "true").parquet(path)
        cachedSchema = Some(df.schema)
        df
      } catch {
        // a table whose every live partition was dropped/detached/
        // truncated has nothing to infer from — the PERSISTED schema
        // marker (written by captureSchema before the destructive op)
        // keeps it readable as EMPTY across reopens and rebuilds, the CH
        // semantics. Any other analysis error propagates untouched.
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("UNABLE_TO_INFER_SCHEMA") =>
          loadSchemaMarker() match {
            case Some(s) =>
              cachedSchema = Some(s)
              spark.read.schema(s).parquet(path)
            case None => throw e
          }
      }
  }

  private def schemaMarker = new Path(path, "_schema")

  private def loadSchemaMarker(): Option[org.apache.spark.sql.types.StructType] = {
    val fs = fileSystem()
    if (!fs.exists(schemaMarker)) return None
    val in = fs.open(schemaMarker)
    val json =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    Some(org.apache.spark.sql.types.DataType.fromJson(json)
      .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** Merge-on-read at the given (possibly coarser) keys; metric columns
    * remain states (binary sketches / arrays / partial sums).
    */
  def merged(groupKeys: Seq[String] = keys): DataFrame =
    read().groupBy(groupKeys.map(col): _*).agg(mergeCols.head, mergeCols.tail: _*)

  /** Merge-on-read + finalize to scalar values (UV counts, medians, sums). */
  def finalized(groupKeys: Seq[String] = keys): DataFrame = {
    val m = merged(groupKeys)
    m.select(groupKeys.map(col) ++ metrics.map(x => x.finish(col(x.name)).as(x.name)): _*)
  }

  /** Background-merge analog: rewrite the table with equal keys pre-merged.
    * Write-to-temp + atomic rename per the doc's OPTIMIZE FINAL invariant —
    * readers see the old or the new table, never a mix.
    *
    * Single-writer discipline (like a MergeTree part set): concurrent
    * compact/append calls are not coordinated. Between the two renames the
    * live path briefly doesn't exist; a crash in that window strands the
    * table at `.compact.old` — [[recoverFromCompact]] restores it on the
    * next open.
    */
  def compact(): Unit = Projection.suppress {
    val tmp = path + ".compact.tmp"
    val old = path + ".compact.old"
    merged(keys)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(tmp)
    val fs = fileSystem()
    val p = new Path(path); val t = new Path(tmp); val o = new Path(old)
    if (fs.exists(o)) fs.delete(o, true)
    if (!fs.rename(p, o)) sys.error(s"compact: failed to stage $path -> $old")
    if (!fs.rename(t, p)) { fs.rename(o, p); sys.error(s"compact: failed to swap $tmp -> $path") }
    // the exactly-once ledger must survive the rewrite, or a late replay of
    // a pre-compact batch would re-ingest rows the compacted parts contain
    finishSwapCleanup("compact", o)
    cachedSchema = None
  }

  /** Final step of every staged swap: move the exactly-once ledger from
    * the superseded `.old` copy into the freshly-swapped live table, then
    * drop the old copy. A FAILED ledger move must never reach the delete:
    * the `.old` dir (ledger inside) is left in place, where
    * [[recoverStagedSwap]] rescues the ledger on the next open — deleting
    * it would erase the batch markers and let replayed batches re-ingest
    * (duplicates), the exact failure the ledger exists to prevent.
    */
  /** The hidden artifacts that must SURVIVE every whole-table staged swap
    * (the rewrite's tmp never contains them): the exactly-once ledger
    * (losing it lets replayed batches re-ingest), the detached partitions
    * (losing them destroys quarantined data), and the persisted schema
    * marker (losing it breaks empty-table reads after a restart).
    */
  private val swapArtifacts = Seq("_ledger", ".detached", "_schema")

  /** Move each swap artifact present in the superseded copy `o` back into
    * the live table (skipping ones the live table already has — a crashed
    * earlier cleanup may have moved some). Returns the first artifact
    * whose move FAILED — the caller must then leave `o` in place, or the
    * artifact is destroyed.
    */
  private def rescueSwapArtifacts(o: Path): Option[String] = {
    val fs = fileSystem()
    swapArtifacts.find { a =>
      val src = new Path(o, a)
      val dst = new Path(path, a)
      fs.exists(src) && !fs.exists(dst) && !fs.rename(src, dst)
    }
  }

  private def finishSwapCleanup(op: String, o: Path): Unit = {
    rescueSwapArtifacts(o).foreach(a =>
      sys.error(s"$op: failed to move the swap artifact $a from $o back " +
        s"into $path; superseded copy preserved at $o (recovered on next open)"))
    fileSystem().delete(o, true): Unit
  }

  /** MV-on-MV cascade — the reference's dwm → dws layering as a state-to-
    * state rollup: re-aggregate THIS table's stored states at the (coarser)
    * keys of `target` and append the result to it. No raw data is touched
    * and nothing is finalized — states merge directly into states (bitmaps
    * OR, HLL union, sums re-sum), so the cascade costs one scan of the
    * source states, which are already ≪ raw.
    *
    * `target.metrics` must be a subset of this table's metrics by name
    * (same state encodings — they merge with this table's merge
    * expressions); `target.keys` must be a subset of this table's keys.
    *
    * Each `rollupTo` call APPENDS (insert-trigger semantics, like a CH MV
    * firing on insert): roll a given slice up exactly once — the `where`
    * filter scopes the slice (e.g. one closed day). Re-running a slice
    * double-counts, exactly as re-inserting into a CH MV would; pair with
    * the target's exactly-once ledger when the cascade is driven from a
    * retried stream.
    */
  def rollupTo(target: StateTable, where: org.apache.spark.sql.Column = lit(true)): Unit =
    target.append(reaggregateFor(target, read().filter(where)))

  /** Per-batch cascade (the MV-on-MV insert trigger firing for ONE inserted
    * block): `states` — rows in THIS table's state encoding, e.g. the batch
    * just appended here — re-aggregated at `target`'s keys and appended.
    */
  def cascadeBatch(target: StateTable, states: DataFrame): Unit =
    target.append(reaggregateFor(target, states))

  /** Exactly-once per-batch cascade: the target's own ledger dedups the
    * batchId independently of this table's, so a crash between the two
    * commits heals on replay (each table re-ingests only what it missed).
    */
  def cascadeBatchExactlyOnce(target: StateTable, states: DataFrame, batchId: Long,
      ns: String = ""): Boolean =
    target.appendExactlyOnce(reaggregateFor(target, states), batchId, ns)

  private def reaggregateFor(target: StateTable, states: DataFrame): DataFrame = {
    val missing = target.metrics.map(_.name).filterNot(n => metrics.exists(_.name == n))
    require(missing.isEmpty, s"rollupTo: target metrics not in source: ${missing.mkString(",")}")
    val badKeys = target.keys.filterNot(keys.contains)
    require(badKeys.isEmpty, s"rollupTo: target keys not in source: ${badKeys.mkString(",")}")
    val cols = metrics.filter(m => target.metrics.exists(_.name == m.name)).map(_.merge)
    states.groupBy(target.keys.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  private def fileSystem(): FileSystem =
    FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Recovery for the staged-rename window of [[compact]] AND the
    * [[updateWhere]]/[[deleteWhere]] mutations (same swap protocol,
    * different staging suffix). If a swap crashed after staging the live
    * table away but before renaming the rewrite in, the staged copy is
    * authoritative: restore it. Leftover `.tmp` / `.old` dirs from a
    * completed or failed swap are deleted. This makes the swaps
    * crash-recoverable at startup, not merely failure-atomic in-process.
    */
  private def recoverFromCompact(): Unit = {
    recoverStagedSwap(".compact")
    recoverStagedSwap(".mutate")
    recoverPartitionCompacts()
  }

  /** Recovery for [[compactPartition]]'s swap window. The staging dirs live
    * BESIDE the table (`<table>.pcompact.<value>.{tmp,old}`) — an `.old`
    * dir INSIDE the table would read as a bogus partition value during the
    * window — so recovery scans the parent: a live-partition-missing `.old`
    * is authoritative and moves back; anything else is superseded debris.
    */
  private def recoverPartitionCompacts(): Unit = {
    val fs = fileSystem()
    val base = new Path(path).getName + ".pcompact."
    // globStatus on the table's OWN prefix, not a full parent listing — a
    // warehouse directory with thousands of sibling tables must not make
    // every open O(siblings). (Escaped partition values are %-encoded,
    // never glob metacharacters.) A TABLE PATH containing glob
    // metacharacters would misparse the pattern (or throw) — fall back to
    // the literal parent listing for those.
    val debris =
      if ("*?[]{}\\^".exists(path.contains(_))) {
        val parent = new Path(path).getParent
        if (parent == null || !fs.exists(parent)) return
        fs.listStatus(parent).filter(_.getPath.getName.startsWith(base))
      } else
        try fs.globStatus(new Path(path + ".pcompact.*"))
        catch { case _: java.io.FileNotFoundException => null }
    if (debris == null) return
    debris.foreach { st =>
      val nm = st.getPath.getName
      if (nm.startsWith(base) && nm.endsWith(".old")) {
        // <escaped-value> between the markers — already the exact dirname
        val ev = nm.substring(base.length, nm.length - ".old".length)
        val live = new Path(path, s"$partitionCol=$ev")
        if (!fs.exists(live)) {
          if (!fs.rename(st.getPath, live))
            sys.error(s"recover: failed to restore ${st.getPath} -> $live")
        } else fs.delete(st.getPath, true): Unit
      } else if (nm.startsWith(base) && nm.endsWith(".tmp"))
        fs.delete(st.getPath, true): Unit
    }
  }

  /** `OPTIMIZE TABLE ... PARTITION 'v' FINAL` — [[compact]] scoped to one
    * partition directory: only that partition's states are re-merged and
    * only its directory is rewritten (the partition-pruned scan and the
    * rewrite both touch ~1/|partitions| of the table — CH's own reason for
    * partition-scoped OPTIMIZE). Same staged-swap discipline as [[compact]];
    * the exactly-once ledger lives at the table root and is untouched.
    * No-op on a partition that doesn't exist (CH parity).
    */
  def compactPartition(value: String): Unit = Projection.suppress {
    val fs = fileSystem()
    // the directory name is the HIVE-ESCAPED value (see [[escVal]]); the
    // staging sibling names reuse the escaped form so recovery maps back
    // to the exact dirname
    val ev = escVal(value)
    val live = new Path(path, s"$partitionCol=$ev")
    if (!fs.exists(live)) return
    val tmp = new Path(path + s".pcompact.$ev.tmp")
    val old = new Path(path + s".pcompact.$ev.old")
    // filter on the partition key ABOVE the merge: partitionCol is a
    // grouping key, so Catalyst pushes it below the Aggregate into the
    // scan's PartitionFilters — one partition read, not a full-table merge
    merged(keys)
      .filter(col(partitionCol) === lit(value).cast(
        read().schema(partitionCol).dataType))
      .drop(partitionCol) // hive layout: the value lives in the dirname
      .sortWithinPartitions(keys.filterNot(_ == partitionCol).map(col): _*)
      .write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(live, old))
      sys.error(s"compactPartition: failed to stage $live -> $old")
    if (!fs.rename(tmp, live)) {
      fs.rename(old, live)
      sys.error(s"compactPartition: failed to swap $tmp -> $live")
    }
    fs.delete(old, true)
    cachedSchema = None
  }

  private def recoverStagedSwap(suffix: String): Unit = {
    val fs = fileSystem()
    val p = new Path(path)
    val t = new Path(path + suffix + ".tmp")
    val o = new Path(path + suffix + ".old")
    if (!fs.exists(p) && fs.exists(o)) {
      if (!fs.rename(o, p)) sys.error(s"recover: failed to restore $o -> $path")
    } else if (fs.exists(o)) {
      // swap completed but cleanup didn't — rescue the swap artifacts the
      // crash left behind, then the old copy is superseded. A FAILED
      // rescue must keep `o` (the artifact lives only there).
      rescueSwapArtifacts(o).foreach(a =>
        sys.error(s"recover: failed to rescue the swap artifact $a from $o"))
      fs.delete(o, true)
    }
    if (fs.exists(t)) fs.delete(t, true)
  }

  /** TTL: drop day partitions older than `days` before `today`
    * (ref `TTL day + toIntervalDay(N)`, ods.action_001_dis.sql:21).
    */
  def expire(days: Int, today: LocalDate = LocalDate.now()): Seq[String] =
    expire(days, 0, today.atStartOfDay)

  /** `ALTER TABLE ... DROP PARTITION 'v'` — drop one partition directory
    * outright (metadata-only, no rewrite; CH's partition drop). */
  def dropPartition(value: String): Boolean = {
    captureSchema()
    val fs = fileSystem()
    val p = new Path(path, s"$partitionCol=${escVal(value)}")
    val existed = fs.exists(p)
    if (existed) fs.delete(p, true): Unit
    existed
  }

  /** PERSIST the table's schema (the `_schema` marker, underscore-prefixed
    * so readers never see it) before an operation that can remove the LAST
    * live partition: an empty table must still read (as empty, with its
    * definition — CH semantics) — including from a REOPENED or rebuilt
    * instance, so an in-memory cache alone is not enough. Cost discipline:
    * when the marker already matches the known schema this is ONE
    * exists()/tiny-read; the full footer scan happens at most once per
    * table lifetime (only when neither the cache nor the marker knows the
    * schema yet). A widened schema (ALTER ADD COLUMN) refreshes the marker
    * the next time a destructive op runs with the wider cache in hand.
    */
  private def captureSchema(): Unit = {
    val fs = fileSystem()
    // FRESHNESS INVARIANT: every schema-changing write (append, staged
    // ingest, attach, external refresh()) DELETES the marker — so a
    // present marker was written after the last such write and is
    // current; trust it without a scan.
    if (fs.exists(schemaMarker)) return
    if (cachedSchema.isEmpty)
      try cachedSchema = Some(read().schema)
      catch { case _: org.apache.spark.sql.AnalysisException => return }
    val tmp = new Path(path, "_schema.tmp")
    val out = fs.create(tmp, true)
    try out.write(cachedSchema.get.json.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, schemaMarker))
      sys.error(s"captureSchema: failed to publish $schemaMarker")
  }

  /** Drop the cached schema AND the persisted `_schema` marker — call
    * after any write that can change the file-union schema (see
    * [[captureSchema]]'s freshness invariant).
    */
  private def invalidateSchema(): Unit = {
    cachedSchema = None
    val fs = fileSystem()
    if (fs.exists(schemaMarker)) fs.delete(schemaMarker, false): Unit
  }

  /** The hive-escaped directory form of a partition value — the SAME
    * encoding the partitionBy writer used (':' '/' '%' ... are %-encoded
    * in dirnames); matching on the raw value would silently miss any
    * value containing a special character.
    */
  private def escVal(value: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(value)

  /** Move every part file under `src` into `dir` (renames, so .crc
    * sidecars follow on a checksummed fs), refusing on a name collision
    * (Spark's UUID part names make one practically impossible — a real
    * one means two DIFFERENT parts claim one identity, which must not
    * silently overwrite), then remove the emptied `src`.
    */
  private def mergePartDirInto(fs: org.apache.hadoop.fs.FileSystem,
      src: Path, dir: Path, op: String): Unit = {
    fs.mkdirs(dir)
    for (f <- fs.listStatus(src)) {
      val t = new Path(dir, f.getPath.getName)
      if (fs.exists(t))
        sys.error(s"$op: ${dir.getName} already holds a part named " +
          s"${f.getPath.getName}")
      if (!fs.rename(f.getPath, t))
        sys.error(s"$op: failed to move ${f.getPath} -> $t")
    }
    fs.delete(src, true): Unit
  }

  /** `ALTER TABLE ... DETACH PARTITION 'v'` — move the partition directory
    * into the table's own hidden `.detached` area (the CH detached/ dir):
    * reads stop seeing it immediately (dot-prefixed paths are invisible to
    * Spark's file index), the bytes stay put for a later [[attachPartition]].
    * Returns whether the partition existed. Detached parts of a value
    * ACCUMULATE, as in CH — when a detached copy already exists (e.g. an
    * interrupted FETCH/ATTACH left part files there), the live parts merge
    * in file-by-file instead of wedging the statement.
    */
  def detachPartition(value: String): Boolean = {
    captureSchema()
    val fs = fileSystem()
    val ev = escVal(value)
    val live = new Path(path, s"$partitionCol=$ev")
    if (!fs.exists(live)) return false
    val dst = new Path(path, s".detached/$partitionCol=$ev")
    if (!fs.exists(dst)) {
      fs.mkdirs(dst.getParent)
      if (!fs.rename(live, dst))
        sys.error(s"detachPartition: failed to move $live -> $dst")
    } else mergePartDirInto(fs, live, dst, "detachPartition")
    true
  }

  /** `ALTER TABLE ... ATTACH PARTITION 'v'` — move the detached parts of
    * `v` back into the live set. Returns whether a detached copy existed.
    * As in CH, attached parts JOIN an already-live partition (rows add —
    * for an aggregating table the copies merge on read); the previous
    * refuse-when-live behavior wedged valid rebalance sequences once
    * PART-granularity states existed.
    */
  def attachPartition(value: String): Boolean = {
    val fs = fileSystem()
    val ev = escVal(value)
    val src = new Path(path, s".detached/$partitionCol=$ev")
    if (!fs.exists(src)) return false
    val live = new Path(path, s"$partitionCol=$ev")
    if (!fs.exists(live)) {
      if (!fs.rename(src, live))
        sys.error(s"attachPartition: failed to move $src -> $live")
    } else mergePartDirInto(fs, src, live, "attachPartition")
    invalidateSchema() // the attached copy may carry columns the marker lacks
    true
  }

  /** `ALTER TABLE ... DROP DETACHED PARTITION 'v'` — delete a detached
    * copy outright. Returns whether one existed. */
  def dropDetachedPartition(value: String): Boolean = {
    val fs = fileSystem()
    val p = new Path(path, s".detached/$partitionCol=${escVal(value)}")
    val existed = fs.exists(p)
    if (existed) fs.delete(p, true): Unit
    existed
  }

  /** A part name must be a PLAIN FILE NAME — path separators or dot
    * traversals would make the exists-probes resolve OUTSIDE the claimed
    * side (e.g. `DROP DETACHED PART '../../day=x/f'` deleting LIVE data
    * while reporting a detached-side op). CH likewise rejects names
    * outside its part-name grammar.
    */
  private def requirePlainPartName(op: String, part: String): Unit =
    if (part.isEmpty || part.contains('/') || part.contains('\\') ||
        part.startsWith("."))
      sys.error(s"$op: malformed part name '$part' — a part is a plain " +
        "data-file name (no path separators, no leading dot)")

  /** The partition directory holding the data file named `part` on one
    * side of the table (`""` = live, `".detached"`) — one parquet data
    * file IS one part, the same definition system.parts publishes, so
    * the PART statements and the views can never disagree on what a
    * name means. Part file names are unique per table (Spark writes
    * `part-NNNNN-<uuid>` names), so the first hit is the only hit.
    */
  private def findPartDir(sub: String, part: String): Option[Path] = {
    val root = if (sub.isEmpty) new Path(path) else new Path(path, sub)
    findPartDirUnder(fileSystem(), root, part)
  }

  /** The ONE "which partition dir under `root` holds this part file"
    * definition — shared by this table's own sides and [[fetchPart]]'s
    * donor scan, so the two can never drift.
    */
  private def findPartDirUnder(fs: org.apache.hadoop.fs.FileSystem,
      root: Path, part: String): Option[Path] = {
    if (!fs.exists(root)) return None
    fs.listStatus(root).iterator
      .filter(d => d.isDirectory && d.getPath.getName.contains("="))
      .map(_.getPath)
      .find(d => fs.exists(new Path(d, part)))
  }

  /** Remove a partition directory a part-level move just EMPTIED (no
    * data files left — .crc sidecars don't count). A leftover empty dir
    * would wrongly block later whole-partition DETACH/ATTACH ("already
    * exists") while being invisible to reads and the parts views — in
    * CH a partition with no parts simply does not exist.
    */
  private def pruneEmptyPartDir(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Unit =
    if (fs.exists(dir) && graft.engine.Rebalance.dataFiles(fs, dir).isEmpty)
      fs.delete(dir, true): Unit

  /** `ALTER TABLE ... DETACH PART 'name'` (ref data_rebalance.py:184) —
    * move ONE data file into the same partition's `.detached` mirror.
    * Unknown names error, as in CH (`No part <name>`): the rebalance
    * flow checks existence first (part_is_exists), so a miss here is an
    * operator mistake, never a tolerated no-op.
    */
  def detachPart(part: String): Unit = {
    requirePlainPartName("detachPart", part)
    captureSchema()
    val fs = fileSystem()
    val dir = findPartDir("", part).getOrElse(
      sys.error(s"detachPart: no live part '$part'"))
    val dst = new Path(path, s".detached/${dir.getName}/$part")
    if (fs.exists(dst))
      sys.error(s"detachPart: a detached copy of '$part' already exists — " +
        "ATTACH or DROP DETACHED it first")
    fs.mkdirs(dst.getParent)
    if (!fs.rename(new Path(dir, part), dst))
      sys.error(s"detachPart: failed to move $part -> $dst")
    pruneEmptyPartDir(fs, dir)
  }

  /** `ALTER TABLE ... ATTACH PART 'name'` (ref data_rebalance.py:181) —
    * mount a detached data file back into its live partition (creating
    * the partition directory if the part is the first occupant, the
    * FETCH-then-ATTACH rebalance flow's normal case).
    */
  def attachPart(part: String): Unit = {
    requirePlainPartName("attachPart", part)
    captureSchema()
    val fs = fileSystem()
    val dir = findPartDir(".detached", part).getOrElse(
      sys.error(s"attachPart: no detached part '$part'"))
    val live = new Path(path, dir.getName)
    val dst = new Path(live, part)
    if (fs.exists(dst))
      sys.error(s"attachPart: a live part named '$part' already exists")
    fs.mkdirs(live)
    if (!fs.rename(new Path(dir, part), dst))
      sys.error(s"attachPart: failed to move $part -> $dst")
    pruneEmptyPartDir(fs, dir)
    invalidateSchema() // the attached part may carry columns the marker lacks
  }

  /** `ALTER TABLE ... DROP DETACHED PART 'name'` (ref
    * data_rebalance.py:179) — delete one detached data file outright.
    */
  def dropDetachedPart(part: String): Unit = {
    requirePlainPartName("dropDetachedPart", part)
    val fs = fileSystem()
    val dir = findPartDir(".detached", part).getOrElse(
      sys.error(s"dropDetachedPart: no detached part '$part'"))
    // a failed delete must refuse loudly like every other part op — a
    // silent no-op would report the copy gone while it occupies disk
    if (!fs.delete(new Path(dir, part), false))
      sys.error(s"dropDetachedPart: failed to delete ${new Path(dir, part)}")
    pruneEmptyPartDir(fs, dir)
  }

  /** `ALTER TABLE ... FETCH PART 'name' FROM '<donor>'` (ref
    * data_rebalance.py:175) — COPY one live data file from a donor
    * table's storage into THIS table's `.detached` area, under the same
    * partition directory name; an ATTACH PART then mounts it, exactly
    * the tool's fetch-then-attach sequence. The donor keeps its copy
    * (CH fetches from a replica without removing it); the detach+drop
    * on the source is the tool's own follow-up statement pair.
    */
  def fetchPart(donorPath: String, part: String): Unit = {
    requirePlainPartName("fetchPart", part)
    val fs = fileSystem()
    val donorRoot = new Path(donorPath)
    if (!fs.exists(donorRoot))
      sys.error(s"fetchPart: donor path $donorPath does not exist")
    val srcDir = findPartDirUnder(fs, donorRoot, part)
      .getOrElse(sys.error(s"fetchPart: donor has no live part '$part'"))
    // structure check, as CH does at FETCH time: a donor partitioned by a
    // DIFFERENT column would plant a foreign <col>=<v> dir that corrupts
    // every later read of this table (conflicting partition columns) —
    // refuse now, not at the delayed read
    if (!srcDir.getName.startsWith(s"$partitionCol="))
      sys.error(s"fetchPart: donor partitions by " +
        s"'${srcDir.getName.takeWhile(_ != '=')}' but this table " +
        s"partitions by '$partitionCol' — structures must match")
    // and the part's COLUMNS must match this table's data schema (name +
    // type), or the mismatch would surface far away as a schema-merge or
    // cast failure on a later ATTACH+read. Both footers are metadata
    // reads. Skipped only when this table has neither data nor a schema
    // marker to compare against (nothing yet to corrupt).
    val donorSchema = spark.read
      .parquet(new Path(srcDir, part).toString).schema
    val mySchema =
      try Some(read().schema.filter(_.name != partitionCol))
      catch { case _: Exception => None }
    mySchema.foreach { mine =>
      val donorFields = donorSchema.map(f => (f.name, f.dataType)).toSet
      val myFields = mine.map(f => (f.name, f.dataType)).toSet
      if (donorFields != myFields)
        sys.error(s"fetchPart: donor part schema ${donorSchema.simpleString} " +
          s"does not match this table's ${mine.map(_.toString).mkString("[", ", ", "]")} " +
          "— structures must match")
    }
    val dst = new Path(path, s".detached/${srcDir.getName}/$part")
    if (fs.exists(dst))
      sys.error(s"fetchPart: a detached copy of '$part' already exists")
    fs.mkdirs(dst.getParent)
    if (!org.apache.hadoop.fs.FileUtil.copy(fs, new Path(srcDir, part),
        fs, dst, false /* keep source */, fs.getConf))
      sys.error(s"fetchPart: copy ${new Path(srcDir, part)} -> $dst failed")
  }

  /** `TRUNCATE TABLE` — drop every live partition AND the exactly-once
    * ledger (a truncated table starts fresh: replaying an old batch
    * re-ingests, which is what an empty table means; CH's TRUNCATE drops
    * data the same way). Detached partitions survive, as in CH.
    */
  def truncate(): Unit = {
    captureSchema()
    val fs = fileSystem()
    val root = new Path(path)
    if (fs.exists(root))
      fs.listStatus(root).foreach { st =>
        val nm = st.getPath.getName
        if (nm.startsWith(s"$partitionCol=") || nm == "_ledger")
          fs.delete(st.getPath, true): Unit
      }
  }

  /** `ALTER TABLE ... UPDATE a = e WHERE cond` — the CH column mutation:
    * rewrite with each assignment applied on matching rows (others kept
    * verbatim), same atomic swap as [[deleteWhere]]. */
  def updateWhere(assignments: Seq[(String, org.apache.spark.sql.Column)],
      cond: org.apache.spark.sql.Column): Unit = Projection.suppress {
    val tmp = path + ".mutate.tmp"
    val old = path + ".mutate.old"
    val src = read()
    val updated = assignments.foldLeft(src) { case (df, (name, e)) =>
      df.withColumn(name, when(cond, e.cast(src.schema(name).dataType))
        .otherwise(col(name)))
    }
    updated.write.mode("overwrite").partitionBy(partitionCol).parquet(tmp)
    val fs = fileSystem()
    val p = new Path(path); val t = new Path(tmp); val o = new Path(old)
    if (fs.exists(o)) fs.delete(o, true)
    if (!fs.rename(p, o)) sys.error(s"updateWhere: failed to stage $path -> $old")
    if (!fs.rename(t, p)) {
      // a rollback that itself fails must be LOUD: the table is now absent
      // at its path and only recoverable from $old (recoverStagedSwap does
      // exactly that on next startup)
      val restored = fs.rename(o, p)
      sys.error(s"updateWhere: failed to swap $tmp -> $path" +
        (if (restored) " (rolled back)"
         else s"; ROLLBACK ALSO FAILED — table preserved at $old, restored on next open"))
    }
    finishSwapCleanup("updateWhere", o)
    cachedSchema = None
  }

  /** `ALTER TABLE ... DELETE WHERE cond` — the CH mutation: rewrite the
    * table keeping only rows NOT matching `cond`, with the same atomic
    * staged swap (and ledger preservation) as [[compact]]. Returns the
    * number of rows removed. Partition-parallel rewrite; states are kept
    * as stored (no merge), so part granularity is unchanged.
    */
  def deleteWhere(cond: org.apache.spark.sql.Column): Long = Projection.suppress {
    val before = read().count()
    val tmp = path + ".mutate.tmp"
    val old = path + ".mutate.old"
    // delete only rows where cond is TRUE — a NULL predicate keeps the
    // row (CH mutation semantics), so the negation must null-guard
    read().filter(!coalesce(cond, lit(false)))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(tmp)
    val fs = fileSystem()
    val p = new Path(path); val t = new Path(tmp); val o = new Path(old)
    if (fs.exists(o)) fs.delete(o, true)
    if (!fs.rename(p, o)) sys.error(s"deleteWhere: failed to stage $path -> $old")
    if (!fs.rename(t, p)) {
      val restored = fs.rename(o, p)
      sys.error(s"deleteWhere: failed to swap $tmp -> $path" +
        (if (restored) " (rolled back)"
         else s"; ROLLBACK ALSO FAILED — table preserved at $old, restored on next open"))
    }
    finishSwapCleanup("deleteWhere", o)
    cachedSchema = None
    before - read().count()
  }

  /** TTL at the reference's full granularity — `TTL day +
    * toIntervalDay(days) + toIntervalHour(hours)`
    * (ref ods.action_001_dis.sql:21): a day partition's rows all expire at
    * the same instant `day 00:00 + days + hours` (the TTL expression uses
    * the partition date), so the whole partition drops once `now` passes
    * it. Day-granularity callers get exactly the old behavior via the
    * overload above.
    */
  def expire(days: Int, hours: Int, now: java.time.LocalDateTime): Seq[String] = {
    captureSchema() // TTL can expire the LAST partition; empty must still read
    val fs = FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    if (!fs.exists(root)) return Nil
    val dropped = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith(partitionCol + "=") &&
          (try LocalDate.parse(p.getName.drop(partitionCol.length + 1))
             .atStartOfDay.plusDays(days.toLong).plusHours(hours.toLong)
             .isBefore(now)
           catch { case _: Exception => false })
      }
    // a false return (no exception) would silently report the partition
    // dropped while its files keep serving rows — refuse loudly instead
    dropped.foreach { p =>
      if (!fs.delete(p, true) && fs.exists(p))
        sys.error(s"expire: failed to delete partition directory $p")
    }
    dropped.map(_.getName)
  }
}
