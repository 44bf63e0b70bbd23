package graft.plans

import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/**
 * Per-round plan-size telemetry for iterative operators — the
 * structural guard for the "loop re-references a lazy subplan" bug
 * class (the HITS / Markov-removal / k-center regressions: a
 * twice-referenced unmaterialized state frame replays the whole
 * upstream pipeline every round, growing the plan geometrically until
 * the bench — not the test suite — notices).
 *
 * Every iterative loop calls [[record]] with its state DataFrame at
 * the end of each round. In production the hook is a single atomic
 * read (disabled, no analysis cost); specs enable it, run the
 * operator, and assert the recorded per-round ANALYZED-plan node
 * counts stay flat-to-linear — a geometric replan blows the adjacent
 * delta within two rounds and fails in test rather than in the bench.
 */
object IterationAudit {

  private val on = new AtomicBoolean(false)
  private val sizes = TrieMap.empty[String, Vector[Int]]

  def enable(): Unit = on.set(true)
  def disable(): Unit = { on.set(false); sizes.clear() }
  def reset(): Unit = sizes.clear()

  /** Record one round's state-plan size for `op` (no-op when disabled). */
  def record(op: String, state: DataFrame): Unit = if (on.get) {
    var n = 0
    state.queryExecution.analyzed.foreach(_ => n += 1)
    sizes.updateWith(op) {
      case Some(v) => Some(v :+ n)
      case None    => Some(Vector(n))
    }
  }

  /** Recorded per-round plan node counts for `op`, in round order. */
  def sizesOf(op: String): Vector[Int] = sizes.getOrElse(op, Vector.empty)

  /** All operators that recorded at least one round. */
  def recordedOps: Set[String] = sizes.keySet.toSet
}
