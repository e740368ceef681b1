package graft.tools

import graft.sources.VersionedTable

/** Forked-JVM commit racer: drives the Spark-free log side of the
  * [[VersionedTable]] commit protocol ([[VersionedTable.claimSlot]])
  * so SourcesSpec can prove the O_EXCL hard-link claim is safe ACROSS
  * PROCESSES, not just threads — every commit must land exactly once
  * with no version gaps. args: table dir, writer id, commit count.
  */
object CommitRace {
  def main(args: Array[String]): Unit = {
    val Array(table, writer, nStr) = args
    val n = nStr.toInt
    var i = 0
    while (i < n) {
      VersionedTable.claimSlot(table, "append", s"data/fake-$writer-$i",
        txn = Some(i.toLong), txnApp = Some(writer), expectedVersion = None)
      i += 1
    }
  }
}
