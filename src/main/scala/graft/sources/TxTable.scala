package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-writer DATA-table commits (r13 — the Delta/Iceberg commit protocol
  * in miniature, composing the two single-sided pieces the lake already had:
  * [[Catalog]]'s pointer-CAS transaction log for *metadata* and Lake's WAP
  * for single-writer *data* promotion).
  *
  * Layout:
  * {{{
  *   root/<table>/data/<uuid>/        immutable parquet batch dirs
  *   root/<table>/_log/v00000001      commit manifest (text, one per version)
  *   root/<table>/_log/_claim_vN      create-exclusive commit claim (the CAS)
  *   root/<table>/_log/_CURRENT       live-version pointer
  * }}}
  *
  * A manifest records the commit's action, the batch dirs it added/removed,
  * and the FULL live file set after the commit — so a snapshot read is one
  * manifest, never a log replay. Data dirs are immutable once committed:
  * snapshot reads at any retained version stay valid while later commits
  * land (snapshot isolation by construction).
  *
  * Commit protocol (optimistic concurrency):
  *   1. stage data OUTSIDE the lock (parquet write of the new batch);
  *   2. read the current version's file set, apply the edit;
  *   3. create-exclusive `_claim_v{N+1}` — the compare-and-swap. Exactly one
  *      of two racing writers creates it; the loser re-reads the winner's
  *      manifest and checks FILE-SET OVERLAP: if the loser's removed dirs
  *      are untouched by the winner (e.g. two appends, or compactions of
  *      disjoint regions), it REBASES onto the new current and retries; if
  *      they overlap (both rewrote the same batch), it aborts with
  *      `ConcurrentModificationException` — the caller must re-plan against
  *      the new table state, exactly Delta's conflict rule;
  *   4. manifest lands via write-temp + same-dir rename, then the `_CURRENT`
  *      pointer swaps the same way (the atomic primitive every HDFS-like
  *      store guarantees).
  *
  * Scale: the log is O(commits) tiny text files and each manifest is
  * O(live batch dirs) — metadata-scale, never O(data). Appends stage their
  * parquet fully parallel and only serialize on the (driver-side, O(files))
  * claim/rename section, so N concurrent appenders cost N staging writes +
  * N tiny rebase loops, not N table rewrites. Same-JVM racers additionally
  * serialize on a per-root monitor ([[Catalog]]'s r11 lesson: local-FS
  * create-exclusive is exists+create, not atomic; on HDFS/object stores the
  * claim file alone carries cross-process safety).
  */
final case class TxTable(spark: SparkSession, root: String, name: String) {

  private val dir = s"$root/$name"
  private val logDir = new Path(dir, "_log")
  private val dataDir = new Path(dir, "data")
  private val currentPtr = new Path(logDir, "_CURRENT")

  private def fs: FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** FileContext for the ATOMIC overwrite rename (`Options.Rename.OVERWRITE`)
    * — the old FileSystem.rename path needed delete-then-rename for the
    * pointer swap, opening a window where readers saw no `_CURRENT` at all
    * (r13 review finding). FileContext's overwrite rename is the real
    * same-directory atomic primitive on HDFS-like stores AND local FS.
    */
  private def fc: org.apache.hadoop.fs.FileContext =
    org.apache.hadoop.fs.FileContext.getFileContext(
      new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)

  /** One committed version: the action tag, the batch dirs this commit
    * added/removed, the full live set after it, and the optional idempotency
    * token (`writerId:batchId`) of an [[appendIdempotent]] commit.
    */
  final case class Manifest(version: Long, action: String,
      added: Seq[String], removed: Seq[String], files: Seq[String],
      txn: Option[String] = None)

  def currentVersion: Long =
    if (!fs.exists(currentPtr)) 0L
    else {
      val in = fs.open(currentPtr)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.stripPrefix("v").toLong
      finally in.close()
    }

  private def manifestPath(v: Long): Path = new Path(logDir, f"v$v%08d")

  def manifest(v: Long): Manifest = {
    val p = manifestPath(v)
    require(fs.exists(p), s"table $name has no manifest v$v")
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    def section(tag: String): Seq[String] =
      lines.filter(_.startsWith(tag + " ")).map(_.drop(tag.length + 1))
    Manifest(v, lines.head.stripPrefix("action="),
      section("A"), section("R"), section("F"), section("T").headOption)
  }

  /** All retained manifests, oldest first. */
  def history: Seq[Manifest] = (1L to currentVersion).map(manifest)

  /** The table at version `v` (default: live). Reads only the manifest's
    * immutable batch dirs — a plain parquet scan, pushdown intact.
    */
  def snapshot(v: Long = currentVersion): DataFrame = {
    require(v > 0, s"table $name has no committed version")
    val m = manifest(v)
    if (m.files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(m.files: _*)
  }

  /** Append a batch: stage parquet, commit (add=the new dir, remove=∅).
    * Appends never truly conflict — a CAS loss always rebases and retries.
    */
  def append(df: DataFrame, partitions: Int = 1): Long = {
    val staged = stage(df, partitions)
    commit("append", add = Seq(staged), remove = Nil).get
  }

  /** Idempotent append keyed by (writerId, batchId) — the Delta
    * txnAppId/txnVersion pattern in miniature, and exactly the
    * `foreachBatch` sink contract: a micro-batch REDELIVERED after a
    * failure/restart (same writer, same batch id) must not double-append.
    * The token rides the commit manifest, so the dedup check and the commit
    * are one atomic step: the token is re-checked against the LIVE history
    * inside the commit lock on every (rebase) attempt — two racing
    * deliveries of one batch can never both land. Returns the committed
    * version, or None when the token was already committed (the staged
    * parquet is discarded).
    */
  def appendIdempotent(df: DataFrame, writerId: String, batchId: Long,
      partitions: Int = 1): Option[Long] = {
    val tag = s"$writerId:$batchId"
    if (committedTxns.contains(tag)) return None // cheap pre-check, no staging
    val staged = stage(df, partitions)
    val v = commit("append", add = Seq(staged), remove = Nil, txn = Some(tag))
    if (v.isEmpty) fs.delete(new Path(staged), true) // lost the txn race
    v
  }

  /** All idempotency tokens in the retained history, incrementally cached:
    * only manifests beyond the last cached version are read, so the
    * inside-the-lock token check is O(new commits), not O(all history) per
    * attempt (r13 review finding).
    */
  def committedTxns: Set[String] = TxTable.rootLock(dir).synchronized {
    val v = currentVersion
    val (cachedV, cachedSet) = txnCache
    if (v == cachedV) cachedSet
    else {
      val merged = cachedSet ++ ((cachedV + 1) to v).flatMap(manifest(_).txn)
      txnCache = (v, merged)
      merged
    }
  }

  @volatile private var txnCache: (Long, Set[String]) = (0L, Set.empty)

  /** Compact the given batch dirs (default: all live) into one rewritten
    * batch: the remove side is what makes two compactions of the same dirs
    * CONFLICT rather than silently double-apply.
    */
  def compact(target: Option[Seq[String]] = None, partitions: Int = 1): Long = {
    val v = currentVersion
    val victims = target.getOrElse(manifest(v).files)
    require(victims.nonEmpty, "nothing to compact")
    val staged = stage(spark.read.parquet(victims: _*), partitions)
    commit("compact", add = Seq(staged), remove = victims).get
  }

  /** Physically delete batch dirs no retained manifest references — safe
    * because [[history]] is the full retained log. Run after readers of
    * pruned versions have drained (the VACUUM contract).
    */
  def vacuum(retentionMs: Long = 3600000L): Seq[String] = {
    // manifests record writer-side path strings; listStatus returns
    // FS-qualified URIs — compare on the scheme-free path component.
    // The retention window protects STAGED-BUT-UNCOMMITTED batches of
    // in-flight writers (r13 review finding: an ageless vacuum could delete
    // a dir between a writer's stage() and its commit, and the subsequent
    // commit would then reference a dead dir) — the Delta retention rule.
    val live = history.flatMap(_.files).map(f => new Path(f).toUri.getPath).toSet
    val cutoff = System.currentTimeMillis() - retentionMs
    if (!fs.exists(dataDir)) Seq.empty
    else fs.listStatus(dataDir)
      .filter(st => st.getModificationTime < cutoff && !live(st.getPath.toUri.getPath))
      .map { st => fs.delete(st.getPath, true); st.getPath.toString }.toSeq
  }

  private def stage(df: DataFrame, partitions: Int): String = {
    val staged = new Path(dataDir, java.util.UUID.randomUUID().toString.take(12))
    df.repartition(partitions).write.parquet(staged.toString)
    staged.toString
  }

  /** Returns Some(version) on commit, or None when `txn` is set and its
    * token already rides a retained manifest (the idempotent-skip). The
    * token check happens INSIDE the lock on every attempt, so it sees every
    * interleaved commit.
    */
  private def commit(action: String, add: Seq[String], remove: Seq[String],
      txn: Option[String] = None): Option[Long] = {
    var attempt = 0
    while (true) {
      // outer None = CAS lost (retry/rebase); Some(None) = txn already
      // committed (idempotent skip); Some(Some(v)) = committed as v
      val committed: Option[Option[Long]] = TxTable.rootLock(dir).synchronized {
        val v = currentVersion
        if (txn.exists(t => committedTxns.contains(t))) Some(None)
        else {
          val base = if (v == 0) Seq.empty[String] else manifest(v).files
          val missing = remove.filterNot(base.contains)
          if (missing.nonEmpty)
            throw new java.util.ConcurrentModificationException(
              s"table $name commit conflict: batch(es) ${missing.mkString(", ")} " +
                "no longer live (rewritten or removed by a concurrent commit)")
          val next = v + 1
          val claim = new Path(logDir, f"_claim_v$next%08d")
          if (!fs.exists(logDir)) fs.mkdirs(logDir)
          val claimed =
            try { fs.create(claim, false).close(); true }
            catch { case _: java.io.IOException => false }
          if (claimed) {
            val files = base.filterNot(remove.toSet) ++ add
            val body = (s"action=$action" +: (add.map("A " + _) ++
              remove.map("R " + _) ++ files.map("F " + _) ++
              txn.map("T " + _).toSeq)).mkString("\n")
            val tmp = new Path(logDir, s".v$next.tmp.${ProcessHandle.current().pid()}")
            val out = fs.create(tmp, true)
            try out.write(body.getBytes("UTF-8")) finally out.close()
            // rename failures on Hadoop FileSystems report as `false`, not
            // exceptions — an unchecked failed manifest rename followed by a
            // pointer swap would corrupt the table permanently
            if (!fs.rename(tmp, manifestPath(next)))
              throw new java.io.IOException(
                s"table $name: manifest rename failed for v$next")
            val ptrTmp = new Path(logDir, s"_CURRENT.tmp.${ProcessHandle.current().pid()}")
            val pout = fs.create(ptrTmp, true)
            try pout.write(f"v$next%08d".getBytes("UTF-8")) finally pout.close()
            // ATOMIC overwrite rename: readers either see the old pointer or
            // the new one, never a missing-pointer window
            fc.rename(ptrTmp, currentPtr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
            Some(Some(next))
          } else None
        }
      }
      committed match {
        case Some(result) => return result
        case None =>
          // CAS lost: rebase if our removes are untouched by the interleaved
          // commits, else surface the conflict (the overlap rule). The
          // missing-batch check at the top of the next iteration enforces
          // remove-overlap; appends (remove = ∅) always pass and retry.
          attempt += 1
          if (attempt > 16)
            throw new java.util.ConcurrentModificationException(
              s"table $name commit conflict: claim contention persisted for $attempt attempts")
          // exponential backoff before rebasing: a cross-process loser spins
          // sub-millisecond per attempt, faster than the winner's
          // manifest-write + renames — without a wait, 16 retries can
          // exhaust while the winner is still mid-commit (r13 review)
          Thread.sleep(math.min(200L, 2L << math.min(attempt, 6)))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object TxTable {
  // one commit monitor per table dir within this JVM (see Catalog.rootLock)
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def rootLock(dir: String): Object =
    locks.computeIfAbsent(dir, _ => new Object)
}
