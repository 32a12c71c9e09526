package graft

import graft.server.{SidecarConfig, SidecarSupervisor}
import org.scalatest.concurrent.Eventually
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Millis, Span}

class SidecarSpec extends AnyFunSuite with Eventually {

  implicit override val patienceConfig: PatienceConfig =
    PatienceConfig(timeout = Span(10000, Millis), interval = Span(50, Millis))

  private def fastCfg(cmd: Seq[String], maxRetries: Int = 3) = SidecarConfig(
    command = cmd,
    healthIntervalMs = 20L,
    maxRetries = maxRetries,
    cooldownMs = 200L,
    baseBackoffMs = 5L,
    maxBackoffMs = 40L,
    shutdownTimeoutMs = 500L)

  test("healthy sidecar stays up and resets the failure counter") {
    val sup = new SidecarSupervisor(fastCfg(Seq("sh", "-c", "sleep 30"))).start()
    try {
      eventually(assert(sup.isRunning))
      eventually(assert(sup.failureCount == 0))
      assert(sup.startCount == 1)
    } finally sup.shutdown()
    assert(!sup.isRunning)
  }

  test("crashing sidecar is restarted with backoff, then circuit-breaks into cooldown") {
    val logs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val sup = new SidecarSupervisor(
      fastCfg(Seq("sh", "-c", "exit 7"), maxRetries = 3), log = logs.add(_)).start()
    try {
      eventually(assert(sup.cooldownCount >= 1))
      // 3 failed starts before the first cooldown
      assert(sup.startCount >= 3)
      assert(logs.asScala.exists(_.contains("cooling down")))
      // cooldown elapses and it tries again
      eventually(assert(sup.startCount >= 4))
    } finally sup.shutdown()
  }

  test("failed health probe restarts the process") {
    val healthy = new java.util.concurrent.atomic.AtomicBoolean(true)
    val sup = new SidecarSupervisor(
      fastCfg(Seq("sh", "-c", "sleep 30")),
      healthCheck = () => healthy.get()).start()
    try {
      eventually(assert(sup.isRunning))
      healthy.set(false)
      eventually(assert(sup.startCount >= 2))
    } finally sup.shutdown()
  }

  test("shutdown force-kills a child that ignores SIGTERM") {
    val sup = new SidecarSupervisor(
      fastCfg(Seq("sh", "-c", "trap '' TERM; sleep 30")).copy(shutdownTimeoutMs = 100L))
      .start()
    eventually(assert(sup.isRunning))
    sup.shutdown()
    assert(!sup.isRunning)
  }

  test("backoff is exponential, capped, and jittered within 25%") {
    val sup = new SidecarSupervisor(SidecarConfig(Seq("true"),
      baseBackoffMs = 1000L, maxBackoffMs = 30000L))
    val b1 = Seq.fill(50)(sup.backoffMs(1))
    assert(b1.forall(m => m >= 1500L && m <= 2500L), s"n=1 out of band: ${b1.max}")
    val b20 = Seq.fill(50)(sup.backoffMs(20))
    assert(b20.forall(m => m >= 22500L && m <= 37500L), s"capped out of band: ${b20.max}")
  }

  private implicit class QAsScala(q: java.util.concurrent.ConcurrentLinkedQueue[String]) {
    def asScala: Iterator[String] = {
      import scala.jdk.CollectionConverters._
      q.iterator().asScala
    }
  }
}
