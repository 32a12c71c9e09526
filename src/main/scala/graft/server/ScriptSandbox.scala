package graft.server

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.concurrent.TimeUnit

/** Sandboxed script execution for the agent layer — the "Code Mode" half
  * of the reference's MCP surface (`run_python`,
  * /root/reference/python/strake/mcp.py:258-296): an agent submits a
  * script; the script talks back to the engine through the serving API
  * (where the prompt-injection guard and permission checks run in agent
  * mode) and ONLY its stdout is returned.
  *
  * Isolation layers, mirroring sandbox/core.py + native.py semantics with
  * JVM-available mechanisms (no seccomp/Landlock bindings in-process):
  *
  *  1. fast-path validation before any process spawns — code-size cap
  *     (1 MiB) and an import allowlist (core.py ALLOWED_IMPORTS, enforced
  *     there at AST level + runtime import shim; here as a whole-script token
  *     scan incl. `__import__` so mid-line or branch-nested imports reject);
  *  2. OS resource limits on the child — address-space and CPU-seconds
  *     rlimits via `ulimit` in the launching shell (native.py applies the
  *     same via setrlimit; defaults 512 MiB / 30 s, env-overridable with
  *     SANDBOX_MEMORY_LIMIT / SANDBOX_TIMEOUT_SECS like native.py:54-67);
  *  3. wall-clock timeout with a hard kill of the whole process group;
  *  4. a scrubbed environment — the child sees ONLY an allowlist
  *     (PATH/HOME/LANG/TZ) plus the explicitly injected GRAFT_* context,
  *     never the server JVM's environment (native.py pops STRAKE_TOKEN
  *     etc. for the same reason);
  *  5. output caps (10 MiB) so a runaway print loop can't exhaust the
  *     server (core.py MAX_OUTPUT_SIZE).
  *
  * The engine callback is injected as a `graft` object in the script
  * prelude: `graft.sql("SELECT ...")` posts to the ApiServer's
  * /api/v1/query with the sandbox session's bearer token — the HTTP twin
  * of the reference's injected `strake` module (core.py's Table proxy).
  */
object ScriptSandbox {

  final case class Result(stdout: String, stderr: String, durationMs: Long,
      timedOut: Boolean,
      attestation: Option[SandboxAttestation] = None) {
    /** Reference `SandboxResult.to_str`: stderr wins if present. */
    def toStr: String =
      if (stderr.nonEmpty) stderr else if (stdout.isEmpty) "(No output)" else stdout
  }

  /** Policy DSL — the portable subset of the reference's `SandboxPolicy`
    * (/root/reference/python/strake/policy.py:76-110). The JVM has no
    * seccomp/Landlock/Seatbelt bindings, so `strict = true` (which the
    * reference defines as "fail initialization if OS-level isolation
    * primitives are unavailable") honestly REFUSES to run here rather
    * than silently degrading. */
  final case class SandboxPolicy(
      // defaults honor the same env knobs as the policy-free path
      // (native.py:54-67), so a deployment's SANDBOX_MEMORY_LIMIT /
      // SANDBOX_TIMEOUT_SECS keep applying when a policy is introduced
      memoryLimitMb: Int = sys.env.get("SANDBOX_MEMORY_LIMIT")
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .map(b => (b / (1024 * 1024)).toInt).getOrElse(512),
      cpuSeconds: Int = sys.env.get("SANDBOX_TIMEOUT_SECS")
        .flatMap(s => scala.util.Try(s.toDouble).toOption)
        .map(_.ceil.toInt).getOrElse(30),
      strict: Boolean = false,
      workspaceRoot: Option[String] = None,
      extraImports: Set[String] = Set.empty)

  /** Audit record of the constraints actually applied — the reference's
    * `SandboxAttestation` (policy.py:41-73): a plain SHA-256 over the
    * constraint list, explicitly NOT cryptographic attestation. */
  final case class SandboxAttestation(
      sandboxId: String,
      constraintsApplied: Seq[String],
      timestampMillis: Long) {
    def digest: String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest((sandboxId + constraintsApplied.mkString(",") + timestampMillis)
          .getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
  }

  val MaxOutputBytes: Int = 10 * 1024 * 1024
  val MaxCodeBytes: Int = 1024 * 1024

  /** Port of core.py ALLOWED_IMPORTS (minus firecracker-only entries). */
  val AllowedImports: Set[String] = Set(
    "pandas", "numpy", "pyarrow", "sklearn", "scipy", "statsmodels",
    "matplotlib",
    "json", "math", "statistics", "datetime", "collections", "itertools",
    "functools", "decimal", "fractions", "re", "string",
    "typing", "typing_extensions", "abc", "dataclasses", "enum", "__future__",
    "graft")

  // `from X import ...` — only X names a module (imported attributes are
  // members of an already-allowed module, same as the reference's
  // ImportFrom AST check)
  private val FromImport = """\bfrom\s+([A-Za-z_][\w.]*)\s+import\b""".r
  // `import a.b as c, d` — every comma-separated root counts, anywhere in
  // the script (after `;`, inside branches, mid-line)
  private val PlainImport =
    """\bimport\s+([A-Za-z_][\w.]*(?:\s+as\s+\w+)?(?:\s*,\s*[A-Za-z_][\w.]*(?:\s+as\s+\w+)?)*)""".r

  /** Fast-path validation (before any process spawns). Returns an error
    * message, or None when the script is admissible. Deliberately
    * over-strict (an "import" inside a string rejects too): false
    * positives are acceptable for a sandbox gate, false negatives are
    * not. */
  def validate(script: String,
      allowedImports: Set[String] = AllowedImports): Option[String] = {
    if (script.getBytes(StandardCharsets.UTF_8).length > MaxCodeBytes)
      return Some("Security Error: Code size exceeds limit.")
    if (script.contains("__import__"))
      return Some("Security Error: Import of '__import__' is not permitted in the sandbox.")
    FromImport.findAllMatchIn(script).foreach { m =>
      val root = m.group(1).split("\\.")(0)
      if (!allowedImports.contains(root))
        return Some(s"Security Error: Import of '$root' is not permitted in the sandbox.")
    }
    // strip from-imports so their `import` keyword isn't re-scanned as a
    // plain import of the imported NAME
    val stripped = FromImport.replaceAllIn(script, "FROM_IMPORT")
    PlainImport.findAllMatchIn(stripped).foreach { m =>
      m.group(1).split(",").foreach { item =>
        val root = item.trim.split("\\s+")(0).split("\\.")(0)
        if (root.nonEmpty && !allowedImports.contains(root))
          return Some(s"Security Error: Import of '$root' is not permitted in the sandbox.")
      }
    }
    None
  }

  /** Child environment: allowlisted parent vars + injected context ONLY. */
  def scrubbedEnv(extra: Map[String, String]): Map[String, String] = {
    val keep = Seq("PATH", "HOME", "LANG", "LC_ALL", "TZ")
    val base = keep.flatMap(k => sys.env.get(k).map(k -> _)).toMap
    base ++ extra + ("PYTHONDONTWRITEBYTECODE" -> "1")
  }

  /** Prelude injected above the user script (trusted, not subject to the
    * allowlist): the engine-callback object. */
  private def prelude: String =
    """import json as _json, os as _os, urllib.request as _rq
      |class _Graft:
      |    def sql(self, q):
      |        req = _rq.Request(_os.environ["GRAFT_URL"] + "/api/v1/query",
      |            data=_json.dumps({"sql": q}).encode("utf-8"),
      |            headers={"Authorization": "Bearer " + _os.environ.get("GRAFT_TOKEN", ""),
      |                     "Content-Type": "application/json"})
      |        with _rq.urlopen(req) as r:
      |            return _json.loads(r.read().decode("utf-8"))
      |graft = _Graft()
      |""".stripMargin

  /** Policy-driven entry (the `run_python(script, policy)` surface):
    * maps the portable policy fields onto the mechanisms below and
    * returns an attestation of what was actually applied. */
  def runWithPolicy(script: String, policy: SandboxPolicy,
      context: Map[String, String] = Map.empty): Result = {
    if (policy.strict)
      return Result("", "Security Error: strict policy requires OS-level " +
        "isolation primitives (seccomp/Landlock/Seatbelt), which are not " +
        "available to this runtime — refusing to run degraded.",
        0L, timedOut = false)
    val allowed = AllowedImports ++ policy.extraImports
    val res = run(script,
      timeoutSecs = policy.cpuSeconds.toDouble,
      memoryLimitBytes = policy.memoryLimitMb.toLong * 1024 * 1024,
      context = context,
      workspaceRoot = policy.workspaceRoot,
      allowedImports = allowed)
    // the attestation records what was ACTUALLY applied: a script the
    // validator rejected (or an internal spawn failure) never saw the
    // process-level constraints, and the rlimit has a 64 MB floor — an
    // audit record that lists constraints that never existed is worse
    // than none
    val spawned = !res.stderr.startsWith("Security Error:") &&
      !res.stderr.startsWith("Runtime Error: Internal sandbox failure")
    val effectiveMb = math.max(policy.memoryLimitMb, 64)
    val constraints =
      if (!spawned) Seq("code-size-cap", s"import-allowlist:${allowed.size}")
      else Seq(
        s"rlimit-as:${effectiveMb}mb",
        s"rlimit-cpu:${policy.cpuSeconds}s",
        "process-group-kill", "scrubbed-env",
        s"import-allowlist:${allowed.size}",
        s"output-cap:$MaxOutputBytes") ++
        policy.workspaceRoot.map(w => s"workspace-cwd:$w")
    res.copy(attestation = Some(SandboxAttestation(
      java.util.UUID.randomUUID().toString, constraints,
      System.currentTimeMillis())))
  }

  def run(script: String,
      timeoutSecs: Double = sys.env.get("SANDBOX_TIMEOUT_SECS")
        .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(30.0),
      memoryLimitBytes: Long = sys.env.get("SANDBOX_MEMORY_LIMIT")
        .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(512L * 1024 * 1024),
      context: Map[String, String] = Map.empty,
      workspaceRoot: Option[String] = None,
      allowedImports: Set[String] = AllowedImports): Result = {
    validate(script, allowedImports)
      .foreach(msg => return Result("", msg, 0L, timedOut = false))

    val start = System.nanoTime()
    var file: Path = null
    try {
      file = Files.createTempFile("graft-sandbox", ".py")
      Files.writeString(file, prelude + "\n" + script)
      val memKb = math.max(memoryLimitBytes / 1024, 64 * 1024)
      val cpuSecs = math.max(timeoutSecs.ceil.toLong, 1L)
      // setsid puts the child in its own process group so the kill below
      // takes helpers with it; ulimits bound address space + CPU seconds.
      val pb = new ProcessBuilder("setsid", "bash", "-c",
        s"ulimit -v $memKb; ulimit -t $cpuSecs; exec python3 ${file.toAbsolutePath}")
      // the policy's single writable directory becomes the child's cwd
      // and TMPDIR (write confinement beyond that needs Landlock — see
      // runWithPolicy's strict refusal)
      workspaceRoot.foreach { w =>
        val dir = java.nio.file.Paths.get(w)
        Files.createDirectories(dir)
        pb.directory(dir.toFile)
      }
      pb.environment().clear()
      val env = scrubbedEnv(context) ++
        workspaceRoot.map(w => "TMPDIR" -> w).toMap
      env.foreach { case (k, v) => pb.environment().put(k, v) }
      val proc = pb.start()
      proc.getOutputStream.close()
      val outBuf = new java.io.ByteArrayOutputStream()
      val errBuf = new java.io.ByteArrayOutputStream()
      val pump = Seq(proc.getInputStream -> outBuf, proc.getErrorStream -> errBuf)
        .map { case (in, buf) =>
          val t = new Thread(() => {
            val chunk = new Array[Byte](8192)
            var n = in.read(chunk)
            while (n >= 0) {
              if (buf.size() < MaxOutputBytes)
                buf.write(chunk, 0, math.min(n, MaxOutputBytes - buf.size()))
              n = in.read(chunk)
            }
          })
          t.setDaemon(true); t.start(); t
        }
      val finished = proc.waitFor((timeoutSecs * 1000).toLong, TimeUnit.MILLISECONDS)
      if (!finished) {
        proc.descendants().forEach(h => { h.destroyForcibly(); () })
        proc.destroyForcibly()
        proc.waitFor(5, TimeUnit.SECONDS)
      }
      pump.foreach(_.join(1000))
      val ms = (System.nanoTime() - start) / 1000000L
      val stdout = outBuf.toString(StandardCharsets.UTF_8)
      val stderr0 = errBuf.toString(StandardCharsets.UTF_8)
      if (!finished)
        Result(stdout, "Resource Error: Execution timed out.", ms, timedOut = true)
      else if (outBuf.size() >= MaxOutputBytes)
        Result(stdout,
          s"Resource Error: Output exceeded maximum size of $MaxOutputBytes bytes",
          ms, timedOut = false)
      else Result(stdout, stderr0, ms, timedOut = false)
    } catch {
      case e: Exception =>
        Result("", s"Runtime Error: Internal sandbox failure: ${e.getMessage}",
          (System.nanoTime() - start) / 1000000L, timedOut = false)
    } finally {
      if (file != null) { Files.deleteIfExists(file); () }
    }
  }
}
