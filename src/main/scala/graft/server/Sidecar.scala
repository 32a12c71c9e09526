package graft.server

import java.util.concurrent.TimeUnit
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

/** Supervisor for an out-of-process sidecar (the reference runs its MCP
  * agent server as a supervised Python child process —
  * /root/reference/crates/runtime/src/sidecar.rs:90-329).
  *
  * Behavior reproduced:
  *  - supervision loop: spawn, health-check on an interval, restart on
  *    crash or failed health probe;
  *  - consecutive-failure counter with **jittered exponential backoff**
  *    between restart attempts (base 1 s doubling to a 30 s cap, ±25%
  *    jitter so a fleet of restarting sidecars doesn't thundering-herd);
  *  - **circuit-break cooldown**: after `maxRetries` consecutive failures
  *    stop retrying for `cooldownMs` (a permanently misconfigured
  *    environment must not spin CPU or spam logs), then reset and retry;
  *  - graceful shutdown: SIGTERM (`destroy`), bounded wait, then SIGKILL
  *    (`destroyForcibly`).
  *
  * The health probe and sleep function are injected so specs can drive
  * the loop deterministically with millisecond delays.
  */
final case class SidecarConfig(
    command: Seq[String],
    env: Map[String, String] = Map.empty,
    healthIntervalMs: Long = 1000L,
    maxRetries: Int = 3,
    cooldownMs: Long = 30000L,
    baseBackoffMs: Long = 1000L,
    maxBackoffMs: Long = 30000L,
    shutdownTimeoutMs: Long = 2000L)

final class SidecarSupervisor(
    config: SidecarConfig,
    healthCheck: () => Boolean = () => true,
    log: String => Unit = _ => (),
    sleep: Long => Unit = Thread.sleep(_)) {

  private val consecutiveFailures = new AtomicInteger(0)
  private val starts = new AtomicInteger(0)
  private val cooldowns = new AtomicInteger(0)
  private val current = new AtomicReference[Process](null)
  @volatile private var shuttingDown = false

  private val rng = new scala.util.Random()

  /** Jittered exponential backoff: base·2^n capped, ±25% jitter. */
  def backoffMs(failures: Int): Long = {
    val exp = math.min(failures, 10)
    val capped = math.min(config.baseBackoffMs * (1L << exp), config.maxBackoffMs)
    val jitter = (capped * 0.25).toLong
    if (jitter > 0) capped - jitter + rng.nextLong(jitter * 2) else capped
  }

  private val loop = new Thread(() => {
    while (!shuttingDown) {
      if (consecutiveFailures.get() >= config.maxRetries) {
        cooldowns.incrementAndGet()
        log(s"sidecar: ${consecutiveFailures.get()} consecutive failures; " +
          s"cooling down ${config.cooldownMs}ms")
        sleep(config.cooldownMs)
        consecutiveFailures.set(0)
      }
      if (!shuttingDown) runOnce()
    }
  }, "graft-sidecar-supervisor")
  loop.setDaemon(true)

  /** One spawn → monitor → exit cycle. */
  private def runOnce(): Unit = {
    val proc =
      try {
        val pb = new ProcessBuilder(config.command: _*)
        pb.redirectErrorStream(true)
        pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
        config.env.foreach { case (k, v) => pb.environment().put(k, v) }
        val p = pb.start()
        starts.incrementAndGet()
        p
      } catch {
        case e: Exception =>
          log(s"sidecar: spawn failed: ${e.getMessage}")
          consecutiveFailures.incrementAndGet()
          sleep(backoffMs(consecutiveFailures.get()))
          return
      }
    current.set(proc)
    var healthyOnce = false
    while (proc.isAlive && !shuttingDown) {
      sleep(config.healthIntervalMs)
      if (proc.isAlive && !shuttingDown) {
        if (healthCheck()) {
          if (!healthyOnce) { healthyOnce = true; consecutiveFailures.set(0) }
        } else {
          log("sidecar: health check failed; restarting")
          proc.destroy()
          if (!proc.waitFor(config.shutdownTimeoutMs, TimeUnit.MILLISECONDS))
            proc.destroyForcibly()
        }
      }
    }
    current.set(null)
    if (!shuttingDown) {
      val code = if (proc.isAlive) -1 else proc.exitValue()
      log(s"sidecar: exited with code $code")
      val n = consecutiveFailures.incrementAndGet()
      sleep(backoffMs(n))
    }
  }

  def start(): this.type = { loop.start(); this }

  def isRunning: Boolean = Option(current.get()).exists(_.isAlive)
  def startCount: Int = starts.get()
  def cooldownCount: Int = cooldowns.get()
  def failureCount: Int = consecutiveFailures.get()

  /** SIGTERM, bounded wait, SIGKILL; then stop the supervision loop. */
  def shutdown(): Unit = {
    shuttingDown = true
    Option(current.get()).foreach { p =>
      p.destroy()
      if (!p.waitFor(config.shutdownTimeoutMs, TimeUnit.MILLISECONDS)) {
        log("sidecar: did not exit in time; killing")
        p.destroyForcibly()
        p.waitFor(config.shutdownTimeoutMs, TimeUnit.MILLISECONDS)
      }
    }
    loop.interrupt()
    loop.join(5000)
  }
}
