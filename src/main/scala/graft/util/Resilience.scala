package graft.util

import java.util.concurrent.Semaphore
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong, AtomicReference}

/** Operational-hardening primitives wrapped around source access, ported
  * from the reference's runtime layer:
  *  - retry with exponential backoff  (crates/common/src/retry.rs)
  *  - circuit breaker (Closed/Open/HalfOpen)
  *    (crates/common/src/circuit_breaker.rs:21-60)
  *  - concurrency budget semaphore
  *    (crates/runtime/src/federation.rs:372-377, default 100 /
  *     crates/common/src/config.rs:18)
  *
  * On a cluster these guard the *driver-side* acts of scan creation and
  * remote-connection setup — executor-side parallelism stays governed by
  * Spark's own scheduler.
  */
object Resilience {

  final class RetryPolicy(
      maxAttempts: Int = 3,
      baseDelayMillis: Long = 50,
      maxDelayMillis: Long = 2000) {
    def apply[T](op: () => T): T = {
      var attempt = 0
      var delay = baseDelayMillis
      while (true) {
        try return op()
        catch {
          case e: Throwable =>
            attempt += 1
            if (attempt >= maxAttempts) throw e
            Thread.sleep(delay)
            delay = math.min(delay * 2, maxDelayMillis)
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  sealed trait BreakerState
  case object Closed extends BreakerState
  case object Open extends BreakerState
  case object HalfOpen extends BreakerState

  final case class CircuitOpen(source: String)
      extends RuntimeException(s"circuit breaker open for source: $source")

  /** Trips after `failureThreshold` consecutive failures; after
    * `cooldownMillis` allows one probe (HalfOpen); probe success closes. */
  final class CircuitBreaker(
      source: String,
      failureThreshold: Int = 5,
      cooldownMillis: Long = 30000) {
    private val failures = new AtomicInteger(0)
    private val openedAt = new AtomicLong(0)
    private val state = new AtomicReference[BreakerState](Closed)

    def currentState: BreakerState = {
      if (state.get() == Open &&
        System.currentTimeMillis() - openedAt.get() >= cooldownMillis)
        state.compareAndSet(Open, HalfOpen)
      state.get()
    }

    def apply[T](op: () => T): T = {
      currentState match {
        case Open => throw CircuitOpen(source)
        case _ =>
          try {
            val r = op()
            failures.set(0); state.set(Closed); r
          } catch {
            case e: Throwable =>
              if (failures.incrementAndGet() >= failureThreshold ||
                state.get() == HalfOpen) {
                state.set(Open); openedAt.set(System.currentTimeMillis())
              }
              throw e
          }
      }
    }
  }

  /** Global/per-source concurrency budget. */
  final class ConcurrencyBudget(permits: Int) {
    private val sem = new Semaphore(permits, true)
    def apply[T](op: () => T): T = {
      sem.acquire()
      try op() finally sem.release()
    }
    def available: Int = sem.availablePermits()
  }
}
