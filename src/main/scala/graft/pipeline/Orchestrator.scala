package graft.pipeline

import java.util.concurrent.locks.ReentrantLock

/** Scheduler-policy layer reproducing the reference DAG's run
  * semantics (`dags/sky_safe_dag.py:18-33`): each task retries once
  * after a fixed delay (`retries=1, retry_delay=1min`), and runs of
  * the whole pipeline are serialized (`max_active_runs=1`) — a tick
  * that fires while the previous run is still active is SKIPPED, not
  * queued (the reference schedules every minute with catchup=False;
  * queuing would build an unbounded backlog behind one slow run).
  *
  * Engine-agnostic by design: the policy wraps any `=> T` body, so it
  * composes with [[PipelineRunner.runOnce]] without the runner knowing
  * about retries. The sleeper is injected for deterministic tests.
  */
final class Orchestrator(
    retries: Int = 1,
    retryDelayMs: Long = 60000L,
    sleeper: Long => Unit = Thread.sleep) {
  require(retries >= 0 && retryDelayMs >= 0)

  private val active = new ReentrantLock()

  /** Run `body`, retrying up to `retries` times after `retryDelayMs`
    * on failure — the reference's per-task retry policy. Throws the
    * LAST failure once attempts are exhausted.
    */
  def withRetry[T](taskId: String)(body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: Throwable =>
          attempt += 1
          if (attempt > retries) throw e
          sleeper(retryDelayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** max_active_runs=1: run `body` only if no other run is active;
    * returns None (skipped tick) otherwise. Non-blocking by design —
    * see class doc.
    */
  def runSerialized[T](body: => T): Option[T] = {
    if (!active.tryLock()) return None
    try Some(body) finally active.unlock()
  }
}
