package graft.pipeline

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

class OrchestratorSpec extends AnyFunSuite {

  test("withRetry: first failure retried after the delay, then succeeds") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val o = new Orchestrator(retries = 1, retryDelayMs = 60000L, sleeper = sleeps += _)
    var calls = 0
    val got = o.withRetry("t") {
      calls += 1
      if (calls == 1) sys.error("transient") else 42
    }
    assert(got == 42 && calls == 2 && sleeps.toSeq == Seq(60000L))
  }

  test("withRetry: attempts exhausted rethrows the LAST failure") {
    val o = new Orchestrator(retries = 1, retryDelayMs = 0L, sleeper = _ => ())
    var calls = 0
    val e = intercept[RuntimeException](o.withRetry("t") {
      calls += 1; sys.error(s"boom $calls")
    })
    assert(calls == 2 && e.getMessage == "boom 2")
  }

  test("withRetry: success on first attempt never sleeps") {
    var slept = false
    val o = new Orchestrator(sleeper = _ => slept = true)
    assert(o.withRetry("t")(7) == 7 && !slept)
  }

  test("runSerialized: blocked ticks collapse into ONE trailing run") {
    val o = new Orchestrator()
    val inside = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val ran = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(2)
    val first = pool.submit(new Runnable {
      def run(): Unit = o.runSerialized {
        inside.countDown(); release.await(5, TimeUnit.SECONDS); ran.incrementAndGet()
      }
    })
    assert(inside.await(5, TimeUnit.SECONDS))
    // ticks while the first is active → not run by THIS caller (None),
    // but they occupy the single pending slot (Airflow catchup=False:
    // three missed intervals still collapse into one trailing run)
    assert(o.runSerialized(ran.incrementAndGet()).isEmpty)
    assert(o.runSerialized(ran.incrementAndGet()).isEmpty)
    assert(o.runSerialized(ran.incrementAndGet()).isEmpty)
    release.countDown()
    first.get(5, TimeUnit.SECONDS)
    pool.shutdown()
    // the active runner executed exactly one trailing run: 1 + 1
    assert(ran.get() == 2)
    // after everything drains, the next tick runs directly
    assert(o.runSerialized(ran.incrementAndGet()).contains(3))
  }
}
