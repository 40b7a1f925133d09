package graft.pipeline

import java.util.concurrent.Semaphore

import scala.util.control.NonFatal

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

  // a Semaphore, NOT a ReentrantLock: the admission check must be
  // non-reentrant — a tick fired synchronously from inside the active
  // run (re-entrant scheduler callback) must be SKIPPED like any
  // other concurrent tick, but a ReentrantLock would admit it
  private val active = new Semaphore(1)

  /** Run `body`, retrying up to `retries` times after `retryDelayMs`
    * on failure — the reference's per-task retry policy. Throws the
    * LAST failure once attempts are exhausted. Only non-fatal task
    * failures are retried: interrupts (cancellation) and VM errors
    * propagate immediately.
    */
  def withRetry[T](taskId: String)(body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case NonFatal(e) =>
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
    if (!active.tryAcquire()) return None
    try Some(body) finally active.release()
  }
}
