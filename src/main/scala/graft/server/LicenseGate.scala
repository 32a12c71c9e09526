package graft.server

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import scala.util.control.NonFatal

/** License-state gating for the serving edge — the analog of the
  * reference's `LicenseCache`/`spawn_license_monitor`
  * (/root/reference/crates/server/src/license.rs:7-88) and its
  * enforcement points (flight_sql.rs:131-143, api.rs:238-244):
  *
  *  - the query hot path does ONE atomic read, never a validation call;
  *  - `Invalid` refuses execution with a permission error;
  *  - `Degraded` executes but attaches a warning;
  *  - a background monitor re-validates on an interval, keeping the
  *    CACHED state when a validation attempt itself fails (an
  *    unreachable license service must not take the serving edge down).
  */
object LicenseGate {

  sealed trait LicenseState
  case object Valid extends LicenseState
  case object Degraded extends LicenseState
  case object Invalid extends LicenseState

  final class LicenseCache {
    private val state = new AtomicReference[LicenseState](Valid)
    private val lastCheck = new AtomicLong(0L)

    /** Hot path: one volatile read. */
    def currentState: LicenseState = state.get()

    def updateState(s: LicenseState): Unit = {
      state.set(s)
      lastCheck.set(System.currentTimeMillis())
    }

    def lastCheckMillis: Long = lastCheck.get()
  }

  /** Always-valid cache for deployments without license enforcement
    * (the default — the open-source reference behaves the same until a
    * validator is wired). */
  val alwaysValid: LicenseCache = new LicenseCache

  trait LicenseValidator {
    /** Returns the current state; throwing keeps the cached state. */
    def validate(): LicenseState
  }

  /** Daemon monitor polling the validator: immediate first check, then
    * one check per interval; failures keep the cached state. Returns a
    * handle that stops the loop. */
  def spawnMonitor(validator: LicenseValidator, cache: LicenseCache,
      intervalMillis: Long): AutoCloseable = {
    @volatile var running = true
    val t = new Thread(() => {
      try cache.updateState(validator.validate())
      catch { case NonFatal(_) => () } // initial failure: stay at default
      while (running) {
        try Thread.sleep(intervalMillis)
        catch { case _: InterruptedException => () }
        if (running) {
          try {
            // update on EVERY success (not only transitions): lastCheck
            // is the staleness signal, and a monitor that keeps
            // succeeding with the same state is not stale
            cache.updateState(validator.validate())
          } catch { case NonFatal(_) => () } // keep using cached state
        }
      }
    }, "graft-license-monitor")
    t.setDaemon(true)
    t.start()
    () => { running = false; t.interrupt() }
  }
}
