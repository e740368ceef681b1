package graft

/** Switch for in-plan precondition certificates (q_dedup_simhash's recall
  * margin, q_ann_ivf's probe coverage).
  *
  * Correctness runs keep them ON (the default): there the DuckDB oracle
  * makes a silently-violated data precondition indistinguishable from a
  * code regression, and the certificate turns it into a named failure.
  *
  * Bench turns them OFF: throughput should time the production plan
  * (`Ivf.searchTopK`, the verified simhash pipeline) rather than the
  * certificate subtree — and at bench-only scale factors, where no oracle
  * runs, a regime violation would otherwise turn the measurement into a
  * meaningless time-to-exception (observed at sf0.1: the jaccard>=0.3
  * pair population's signature-hamming tail reaches 12, so the maxDist=7
  * margin certificate correctly fires — incomplete recall is a real,
  * documented property of fixed-radius simhash there, not a bug the
  * bench should crash on).
  */
object Certificates {
  @volatile var enforce: Boolean = true
}
