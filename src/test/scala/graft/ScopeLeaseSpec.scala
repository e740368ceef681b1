package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CheckpointScope, MaintenanceLease, VersionedTable}

/** Lifecycle + orchestration primitives added in r14: the batch-scoped
  * checkpoint release (the production streamingSink lifecycle) and the
  * maintenance lease (loud serialization of concurrent index
  * maintenance).
  */
class ScopeLeaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("CheckpointScope releases everything persisted inside it, nothing persisted before") {
    val sc = spark.sparkContext
    // a pre-existing checkpoint must SURVIVE the scope
    val keeper = Seq(1, 2, 3).toDF("x").localCheckpoint()
    val before = sc.getPersistentRDDs.size
    CheckpointScope.withScope(sc) {
      val a = Seq(4, 5).toDF("x").localCheckpoint()
      val b = a.select((col("x") * 2).as("x")).localCheckpoint()
      assert(b.collect().map(_.getInt(0)).sorted.toSeq == Seq(8, 10))
      assert(sc.getPersistentRDDs.size >= before + 2)
    }
    assert(sc.getPersistentRDDs.size == before,
      s"scope leaked: ${sc.getPersistentRDDs.size} vs $before")
    // the keeper's blocks are intact — still readable after the close
    assert(keeper.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    keeper.unpersist()
  }

  test("CheckpointScope releases on failure too; close is idempotent") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    intercept[RuntimeException] {
      CheckpointScope.withScope(sc) {
        Seq(1).toDF("x").localCheckpoint()
        throw new RuntimeException("batch failed")
      }
    }
    assert(sc.getPersistentRDDs.size == before)
    val s = new CheckpointScope(sc)
    s.close(); s.close() // second close must be a no-op
  }

  test("maintenance lease: concurrent claims serialize loudly, release reopens, re-entrancy holds") {
    val t = fresh("graft-lease")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(t))
    // re-entrant: nested withLease on one thread must not self-deadlock
    // (compactIndex calls rebuildPostings under its own lease)
    val nested = MaintenanceLease.withLease(t, "outer") {
      MaintenanceLease.withLease(t, "inner") { 42 }
    }
    assert(nested == 42)
    // released after the nested call — claimable again
    assert(MaintenanceLease.withLease(t, "again") { 1 } == 1)

    // two threads race one lease: exactly one runs, one refuses loudly
    val started = new java.util.concurrent.CountDownLatch(1)
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val refused = new java.util.concurrent.atomic.AtomicInteger(0)
    def worker(): Runnable = () =>
      try MaintenanceLease.withLease(t, "race") {
        ran.incrementAndGet(); started.countDown()
        Thread.sleep(300)
      } catch {
        case e: IllegalStateException =>
          assert(e.getMessage.contains("lease"), e.getMessage)
          refused.incrementAndGet()
      }
    val t1 = new Thread(worker()); t1.start()
    started.await()
    val t2 = new Thread(worker()); t2.start()
    t1.join(); t2.join()
    assert(ran.get() == 1 && refused.get() == 1, s"${ran.get()}/${refused.get()}")
    // and the loser can claim after the winner released
    assert(MaintenanceLease.withLease(t, "after") { 7 } == 7)
  }

  test("maintenance lease: a crashed holder's stale lease is broken; a fresh one is not") {
    val t = fresh("graft-lease-stale")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(t))
    val p = MaintenanceLease.leasePath(t)
    java.nio.file.Files.write(p, "crashed pid=0".getBytes("UTF-8"))
    // fresh: refuse
    intercept[IllegalStateException] {
      MaintenanceLease.withLease(t, "x") { () }
    }
    // stale: break and claim
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - MaintenanceLease.DefaultStaleMs - 1000))
    assert(MaintenanceLease.withLease(t, "x") { 9 } == 9)
  }

  test("racing compactIndex runs: one wins, one refuses, the index stays valid") {
    val t = fresh("graft-lease-compact")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    graft.dedup.IncrementalDedup.processBatch(spark, docs, "text",
      "doc_id", t, threshold = 0.6, batchId = 0L)
    val rowsBefore = VersionedTable.read(spark, t).count()
    val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 2).map { _ =>
      new Thread(() =>
        try graft.dedup.IncrementalDedup.compactIndex(spark, t)
        catch { case _: IllegalStateException => refusals.incrementAndGet() })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // the race is real concurrency: 0, 1 or 2 refusals are possible
    // (the loser may start after the winner released) — what must hold
    // is that whoever REFUSED did no work and the table is intact
    assert(refusals.get() <= 1)
    assert(VersionedTable.read(spark, t).count() == rowsBefore)
    // lease released: a sequential compaction succeeds
    graft.dedup.IncrementalDedup.compactIndex(spark, t)
    assert(VersionedTable.read(spark, t).count() == rowsBefore)
  }
}
