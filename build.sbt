ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "strakespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
val commonJvmOpts = jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Process launch mechanism, env-overridable for diagnostics. Default
  // POSIX_SPAWN (the JDK default): Hadoop's RawLocalFileSystem shells
  // out (chmod) on every local file create, and an A/B over the
  // write-heavy bench rows measured FORK at 3-5x the row time (csv
  // roundtrip 1.72 s vs 0.51 s, warc 6.9 s vs 1.3 s — forking a
  // multi-GB-heap JVM per exec'd chmod) with non-exec rows identical.
  // r19's one-off "Failed to exec spawn helper: signal 15" under the
  // driver is mitigated by the 8g test heap below, not by FORK.
  s"-Djdk.lang.Process.launchMechanism=${
    sys.env.getOrElse("SPARK_GRAFT_LAUNCH", "POSIX_SPAWN")}",
  // Throughput GC for the batch JVMs (bench/verify/tests): JDK-17-default
  // G1 optimizes pause time, which this workload never needs, and its
  // concurrent cycles degrade the multi-threaded codec/codegen allocation
  // bursts badly — measured at sf5.0 in round 18 (9.3 ms/doc under G1 vs
  // 0.53 ms/doc under ParallelGC, same code; tools/sweep50.sh) and again
  // at sf0.1 in round 19 (top-15 bench rows, min-of-passes over 2×2 runs:
  // ParallelGC wins 12/15 rows by 10-25%, per-row gc_ms total 0.45 s vs
  // 1.1-1.5 s — OPTIMIZATION_r19.md). Its stop-the-world full pauses can
  // stall the in-process executor heartbeat, so the Bench/Verify sessions
  // carry matching heartbeat/network tolerance (Bench.scala).
  "-XX:+UseParallelGC",
)
// Bench/Verify JVM heap: adaptive — min(16g, max(8g, MemTotal/4)). The
// registry's 200 queries at local[32] hold 2-3.5 GB live mid-run; an 8 GB
// old gen filled every few dozen rows (one observed 15.5 s monolithic
// full pause under a steal burst, telemetry gc_n=1/gc_ms=15497). 16g on
// this 128 GiB host halves full-GC frequency with an unchanged live set;
// smaller hosts degrade gracefully instead of over-reserving.
val benchHeapMb: Long = {
  val memTotalMb =
    try {
      val line = scala.io.Source.fromFile("/proc/meminfo").getLines()
        .find(_.startsWith("MemTotal:"))
      line.map(_.split("\\s+")(1).toLong / 1024).getOrElse(64L * 1024)
    } catch { case _: Throwable => 64L * 1024 }
  math.min(16L * 1024, math.max(8L * 1024, memTotalMb / 4))
}
javaOptions ++= commonJvmOpts ++ {
  val mx = sys.env.getOrElse("SPARK_DRIVER_MEM", s"${benchHeapMb}m")
  // -Xms = -Xmx for the bench/verify JVMs: ParallelGC's adaptive sizing
  // expands the heap far too slowly under this workload's allocation
  // bursts — measured at sf5.0, one row spent 480 s in GC at -Xmx32g
  // with the default ~2 GB -Xms (iterations 363/215/30 s as the heap
  // grew), vs 17.6 s in a pre-sized JVM. Standard benchmarking practice;
  // commit-on-start is harmless on a dedicated run host.
  // (AlwaysPreTouch was trialled against the cold first iterations and
  // rejected: cross-pass data shows the cold cost is codegen/JIT, not
  // page faults — q1's first iteration is ~2.5-3.3 s under default Xms
  // and under Xms=Xmx alike.)
  Seq(s"-Xmx$mx", s"-Xms${sys.env.getOrElse("SPARK_GRAFT_XMS", mx)}")
}
// Test JVMs never need the bench heap: the suite was green for 18 rounds
// at 8g, and a flat 16g reservation per forked test JVM is what pushed
// the driver host into the spawn-helper kill (VERIFY_r19 tests_ok=false).
Test / javaOptions := commonJvmOpts :+
  s"-Xmx${sys.env.getOrElse("SPARK_TEST_MEM", "8g")}"

// HiveThriftServer2 can only be started once per JVM, so the CUSTOM-auth
// wire suite gets its own forked test JVM; everything else shares one.
Test / testGrouping := {
  // the settings-derived forkOptions carries javaOptions AND working
  // directory / env vars / log routing — a bare ForkOptions() would not
  val fo = (Test / forkOptions).value
  def group(name: String, ts: Seq[TestDefinition]) =
    Tests.Group(name, ts, Tests.SubProcess(fo))
  val (solo, rest) = (Test / definedTests).value
    .partition(_.name == "graft.JdbcCustomAuthSpec")
  group("main", rest) +: (if (solo.nonEmpty) Seq(group("jdbc-custom-auth", solo)) else Nil)
}
