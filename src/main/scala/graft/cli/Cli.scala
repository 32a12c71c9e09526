package graft.cli

import java.nio.file.{Files, Paths}
import scala.util.control.NonFatal
import scala.util.matching.Regex

import graft.sources.SourcesConfig

/** `graft-cli` — the GitOps configuration CLI, porting the reference's
  * `strake-cli` surface (/root/reference/crates/cli/src/main.rs and
  * docs/cli-reference.md):
  *
  *  - project lifecycle: `init [file] [--template t] [--sources-only]`
  *  - GitOps: `validate [file] [--offline]`, `diff [file]`,
  *    `apply [file] [--force] [--dry-run] [--expected-version n]`
  *  - discovery: `search <source> [file]` (`introspect` alias),
  *    `add <source> <table> [file]`, `test-connection [file]`,
  *    `describe [file] [--domain d]`
  *  - domain lifecycle: `domain list`, `domain history [name]`,
  *    `domain rollback [name] --to-version n`
  *
  * Global options: `--format json|human`, `--metadata <dir>` (the
  * embedded metadata database, default `.graft-metadata` beside the
  * config file — the reference's SQLite store, metadata/sqlite.rs).
  * Exit codes mirror exit_codes.rs: 0 ok, 2 usage, 3 config, 4
  * connection, 5 validation, 6 conflict.
  *
  * Secrets: `${VAR}` placeholders expand from the environment before
  * parsing (helpers.rs:43-50); unresolved ones stay verbatim, and a
  * plaintext `password:` option in a source draws the reference's
  * warning (apply.rs:74-86).
  */
object Cli {

  // exit_codes.rs parity
  val Success = 0
  val GeneralError = 1
  val UsageError = 2
  val ConfigError = 3
  val ConnectionError = 4
  val ValidationError = 5
  val ConflictError = 6

  private val SecretRe: Regex = raw"\$$\{([A-Za-z_][A-Za-z0-9_]*)\}".r

  /** `${VAR}` → env value; unresolved placeholders stay verbatim. */
  def expandSecrets(content: String,
      env: String => Option[String] = sys.env.get): String =
    SecretRe.replaceAllIn(content, m =>
      Regex.quoteReplacement(env(m.group(1)).getOrElse(m.matched)))

  def main(args: Array[String]): Unit = sys.exit(run(args, Console.out, Console.err))

  /** Testable entry: returns the exit code, prints to the given streams. */
  def run(args: Array[String], out: java.io.PrintStream,
      err: java.io.PrintStream): Int = {
    // flag parsing happens before the JSON-mode flag is known, so a parse
    // failure reports plain-text to stderr
    val (flags, positional) =
      try parseArgs(args.toList)
      catch { case e: UsageException =>
        err.println(s"error: ${e.getMessage}"); return UsageError
      }
    val json = flags.get("format").contains("json")
    def fail(code: Int, msg: String): Int = {
      if (json) out.println(s"""{"ok": false, "error": ${quote(msg)}}""")
      else err.println(s"error: $msg")
      code
    }
    if (positional.isEmpty) return fail(UsageError, usage)

    val cmd = positional.head
    val rest = positional.tail
    try cmd match {
      case "init" => cmdInit(rest, flags, json, out)
      case "validate" => cmdValidate(rest, flags, json, out)
      case "diff" => withStore(rest, flags)(cmdDiff(_, _, flags, json, out))
      case "apply" => withStore(rest, flags)(cmdApply(_, _, flags, json, out))
      case "test-connection" => cmdTestConnection(rest, flags, json, out)
      case "search" | "introspect" => cmdSearch(rest, flags, json, out)
      case "add" => cmdAdd(rest, flags, json, out)
      case "describe" => withStore(rest.drop(0), flags)(cmdDescribe(_, _, flags, json, out))
      case "domain" => rest match {
        case "list" :: _ => withStoreAt(flags, ".")(cmdDomainList(_, json, out))
        case "history" :: t => withStoreAt(flags, ".")(cmdDomainHistory(_, t.headOption.getOrElse("default"), json, out))
        case "rollback" :: t => withStoreAt(flags, ".")(cmdRollback(_, t.headOption.getOrElse("default"), flags, json, out))
        case other => fail(UsageError, s"unknown domain subcommand: ${other.headOption.getOrElse("")}")
      }
      case other => fail(UsageError, s"unknown command: $other\n$usage")
    } catch {
      case e: UsageException => fail(UsageError, e.getMessage)
      case e: VersionConflictException => fail(ConflictError, e.getMessage)
      case e: ForceRequiredException => fail(ConflictError, e.getMessage)
      case e: ConfigException => fail(ConfigError, e.getMessage)
      case e: ConnectException => fail(ConnectionError, e.getMessage)
      case e: ValidateException => fail(ValidationError, e.getMessage)
      case NonFatal(e) => fail(GeneralError, String.valueOf(e.getMessage))
    }
  }

  final class ConfigException(msg: String) extends RuntimeException(msg)
  final class ConnectException(msg: String) extends RuntimeException(msg)
  final class ValidateException(msg: String) extends RuntimeException(msg)

  // ------------------------------------------------------------- commands

  private def cmdInit(rest: List[String], flags: Map[String, String],
      json: Boolean, out: java.io.PrintStream): Int = {
    val file = rest.headOption.getOrElse("sources.yaml")
    val p = Paths.get(file)
    if (Files.exists(p))
      throw new ConfigException(s"$file already exists — refusing to overwrite")
    val template = flags.getOrElse("template", "file")
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p, templateYaml(template))
    if (!flags.contains("sources-only")) {
      val dir = Option(p.getParent).map(_.toString).getOrElse(".")
      val engine = Paths.get(dir, "graft.yaml")
      if (!Files.exists(engine))
        Files.writeString(engine,
          "# graft engine settings\ndefensive_limit: 1000\nquery_timeout_seconds: 300\n")
      val readme = Paths.get(dir, "README.md")
      if (!Files.exists(readme))
        Files.writeString(readme,
          s"# graft project\n\nEdit `$file`, then `validate` / `diff` / `apply`.\n")
    }
    if (json) out.println(s"""{"ok": true, "created": ${quote(file)}, "template": ${quote(template)}}""")
    else out.println(s"Created $file (template: $template)")
    Success
  }

  private def cmdValidate(rest: List[String], flags: Map[String, String],
      json: Boolean, out: java.io.PrintStream): Int = {
    val file = rest.headOption.getOrElse("sources.yaml")
    val cfg = loadConfig(file)
    val problems = validateConfig(cfg, offline = flags.contains("offline"))
    if (problems.nonEmpty)
      throw new ValidateException(problems.mkString("; "))
    if (json) out.println(s"""{"ok": true, "sources": ${cfg.sources.size}, "tables": ${cfg.sources.map(_.tables.size).sum}}""")
    else out.println(s"OK: ${cfg.sources.size} sources, " +
      s"${cfg.sources.map(_.tables.size).sum} tables")
    Success
  }

  private def cmdDiff(store: MetadataStore, file: String,
      flags: Map[String, String], json: Boolean,
      out: java.io.PrintStream): Int = {
    val changes = diffAgainstStore(store, file, flags)
    if (json) {
      val items = changes.map(c =>
        s"""{"change": ${quote(c.change)}, "path": ${quote(c.path)}""" +
          c.previous.map(p => s""", "previous": ${quote(p)}""").getOrElse("") +
          c.current.map(p => s""", "current": ${quote(p)}""").getOrElse("") + "}")
      out.println(s"""{"ok": true, "changes": [${items.mkString(", ")}]}""")
    } else if (changes.isEmpty) out.println("No changes.")
    else changes.foreach { c =>
      val sigil = c.change match {
        case "added" => "+"; case "deleted" => "-"; case _ => "~"
      }
      val detail = (c.previous, c.current) match {
        case (Some(p), Some(n)) => s" ($p -> $n)"
        case _ => ""
      }
      out.println(s"$sigil ${c.path}$detail")
    }
    Success
  }

  private def cmdApply(store: MetadataStore, file: String,
      flags: Map[String, String], json: Boolean,
      out: java.io.PrintStream): Int = {
    val raw = readFile(file)
    warnPlaintextPasswords(raw, json, out)
    val expanded = expandSecrets(raw)
    val cfg = parseConfig(expanded, file)
    val problems = validateConfig(cfg, offline = true)
    if (problems.nonEmpty) throw new ValidateException(problems.mkString("; "))
    val domain = domainOf(cfg, flags)
    if (flags.contains("dry-run")) {
      val changes = diffAgainstStore(store, file, flags)
      if (json)
        out.println(s"""{"ok": true, "dry_run": true, "domain": ${quote(domain)}, "version": ${store.getDomainVersion(domain)}, "pending_changes": ${changes.size}}""")
      else {
        out.println(s"--- DRY RUN --- domain: $domain")
        out.println(s"${changes.size} pending change(s); nothing persisted.")
      }
      return Success
    }
    // persist the RAW yaml, placeholders intact (reference apply.rs:153,
    // 165): expanded secrets must never land on disk in the metadata
    // store, and the audit hash must not change just because env changed
    val outcome = store.applySources(domain, raw, currentUser(),
      force = flags.contains("force"),
      expectedVersion = flags.get("expected-version").map(intFlag("expected-version", _)))
    if (json)
      out.println(s"""{"ok": true, "domain": ${quote(outcome.domain)}, "version": ${outcome.version}, "added": [${outcome.sourcesAdded.map(quote).mkString(", ")}], "deleted": [${outcome.sourcesDeleted.map(quote).mkString(", ")}]}""")
    else out.println(s"Applied '$file' to domain '${outcome.domain}' " +
      s"(v${outcome.version}; +${outcome.sourcesAdded.size} " +
      s"-${outcome.sourcesDeleted.size} sources)")
    // post-apply cache-invalidation webhook (apply.rs:192-211): best
    // effort — a failed notification warns but NEVER fails the apply,
    // which has already been durably persisted
    flags.get("notify-url").foreach { url =>
      if (!json) out.println(s"Notifying server at $url...")
      try {
        val conn = new java.net.URI(url).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(10000)
        conn.setDoOutput(true)
        conn.getOutputStream.close() // empty body, like the reference
        val code = conn.getResponseCode
        conn.disconnect()
        if (code >= 200 && code < 300) {
          if (!json) out.println("Server notification successful.")
        } else warn(s"warning: server returned error: $code", json, out)
      } catch { case scala.util.control.NonFatal(e) =>
        warn(s"warning: failed to notify server: ${e.getMessage}", json, out)
      }
    }
    Success
  }

  private def cmdTestConnection(rest: List[String],
      flags: Map[String, String], json: Boolean,
      out: java.io.PrintStream): Int = {
    val file = rest.headOption.getOrElse("sources.yaml")
    val cfg = loadConfig(file)
    val results = cfg.sources.map(s => s.name -> testSource(s))
    val failures = results.collect { case (n, Some(msg)) => s"$n: $msg" }
    if (json) {
      val items = results.map { case (n, r) =>
        s"""{"source": ${quote(n)}, "ok": ${r.isEmpty}""" +
          r.map(m => s""", "error": ${quote(m)}""").getOrElse("") + "}"
      }
      out.println(s"""{"ok": ${failures.isEmpty}, "results": [${items.mkString(", ")}]}""")
      if (failures.isEmpty) Success else ConnectionError
    } else {
      results.foreach { case (n, r) =>
        out.println(s"${if (r.isEmpty) "ok  " else "FAIL"} $n${r.map(": " + _).getOrElse("")}")
      }
      if (failures.isEmpty) Success
      else throw new ConnectException(failures.mkString("; "))
    }
  }

  private def cmdSearch(rest: List[String], flags: Map[String, String],
      json: Boolean, out: java.io.PrintStream): Int = {
    val source = rest.headOption.getOrElse(
      throw new ConfigException("search requires a <source> argument"))
    val file = rest.drop(1).headOption.getOrElse("sources.yaml")
    val cfg = loadConfig(file)
    val src = cfg.sources.find(_.name == source).getOrElse(
      throw new ValidateException(s"source '$source' not found in $file"))
    val tables = discoverTables(src)
    if (json)
      out.println(s"""{"ok": true, "source": ${quote(source)}, "tables": [${tables.map(quote).mkString(", ")}]}""")
    else tables.foreach(out.println)
    Success
  }

  private def cmdAdd(rest: List[String], flags: Map[String, String],
      json: Boolean, out: java.io.PrintStream): Int = {
    val (source, table) = rest match {
      case s :: t :: _ => (s, t)
      case _ => throw new ConfigException("add requires <source> <table>")
    }
    val file = rest.drop(2).headOption.getOrElse("sources.yaml")
    val raw = readFile(file)
    val cfg = parseConfig(expandSecrets(raw), file)
    val src = cfg.sources.find(_.name == source).getOrElse(
      throw new ValidateException(s"source '$source' not found in $file"))
    if (src.tables.exists(_.name == table))
      throw new ValidateException(s"table '$table' already declared for '$source'")
    if (!discoverTables(src).contains(table))
      throw new ValidateException(
        s"table '$table' not discoverable in source '$source'")
    // minimal, format-preserving append: indent under the source's tables
    val updated = appendTableYaml(raw, source, table)
    Files.writeString(Paths.get(file), updated)
    if (json) out.println(s"""{"ok": true, "source": ${quote(source)}, "added": ${quote(table)}}""")
    else out.println(s"Added table '$table' to source '$source' in $file")
    Success
  }

  private def cmdDescribe(store: MetadataStore, file: String,
      flags: Map[String, String], json: Boolean,
      out: java.io.PrintStream): Int = {
    val domain = flags.getOrElse("domain",
      if (Files.exists(Paths.get(file))) domainOf(loadConfig(file), flags)
      else "default")
    val version = store.getDomainVersion(domain)
    if (version == 0)
      throw new ValidateException(s"domain '$domain' has never been applied")
    val yaml = store.getSources(domain)
    val cfg = parseConfig(yaml, s"stored config v$version")
    if (json)
      out.println(s"""{"ok": true, "domain": ${quote(domain)}, "version": $version, "sources": ${cfg.sources.size}, "tables": ${cfg.sources.map(_.tables.size).sum}}""")
    else {
      out.println(s"domain: $domain (v$version)")
      cfg.sources.foreach { s =>
        out.println(s"  ${s.name} (${s.sourceType}): " +
          s.tables.map(_.name).mkString(", "))
      }
    }
    Success
  }

  private def cmdDomainList(store: MetadataStore, json: Boolean,
      out: java.io.PrintStream): Int = {
    val ds = store.listDomains()
    if (json) {
      val items = ds.map(d =>
        s"""{"name": ${quote(d.name)}, "version": ${d.version}, "created_at": ${quote(d.createdAt.map(_.toString).getOrElse(""))}}""")
      out.println(s"""{"ok": true, "domains": [${items.mkString(", ")}]}""")
    } else {
      out.println(f"${"DOMAIN"}%-20s ${"VERSION"}%-10s CREATED AT")
      ds.foreach(d => out.println(
        f"${d.name}%-20s v${d.version}%-9s ${d.createdAt.map(_.toString).getOrElse("N/A")}"))
    }
    Success
  }

  private def cmdDomainHistory(store: MetadataStore, domain: String,
      json: Boolean, out: java.io.PrintStream): Int = {
    val hist = store.getHistory(domain, 10)
    if (json) {
      val items = hist.map(h =>
        s"""{"version": ${h.version}, "user": ${quote(h.userId)}, "added": [${h.sourcesAdded.map(quote).mkString(", ")}], "deleted": [${h.sourcesDeleted.map(quote).mkString(", ")}], "config_hash": ${quote(h.configHash)}}""")
      out.println(s"""{"ok": true, "domain": ${quote(domain)}, "history": [${items.mkString(", ")}]}""")
    } else hist.foreach(h => out.println(
      s"v${h.version}  ${h.userId}  +${h.sourcesAdded.size} " +
        s"-${h.sourcesDeleted.size}  ${h.configHash.take(12)}"))
    Success
  }

  private def cmdRollback(store: MetadataStore, domain: String,
      flags: Map[String, String], json: Boolean,
      out: java.io.PrintStream): Int = {
    val toVersion = flags.get("to-version").map(intFlag("to-version", _)).getOrElse(
      throw new ConfigException("rollback requires --to-version <n>"))
    // rollback = re-apply the old config as a NEW version (domain.rs:39-:
    // history stays append-only; the audit trail records the revert)
    val oldYaml = store.getHistoryConfig(domain, toVersion)
    val outcome = store.applySources(domain, oldYaml,
      currentUser() + s" (rollback to v$toVersion)", force = true,
      expectedVersion = None)
    if (json)
      out.println(s"""{"ok": true, "domain": ${quote(domain)}, "rolled_back_to": $toVersion, "version": ${outcome.version}}""")
    else out.println(
      s"Domain '$domain' rolled back to v$toVersion (new version: v${outcome.version}).")
    Success
  }

  // ------------------------------------------------------------- helpers

  final case class DiffChange(change: String, path: String,
      previous: Option[String], current: Option[String])

  /** Local config vs the domain's stored config (diff.rs:77-230):
    * added/deleted sources, per-source type/url changes, added/deleted
    * tables, per-table column changes. Both sides diff RAW (placeholders
    * intact) — the store persists raw YAML, and expanding only the local
    * side would report phantom url changes whenever env vars are set. */
  def diffAgainstStore(store: MetadataStore, file: String,
      flags: Map[String, String] = Map.empty): Seq[DiffChange] = {
    val local = parseConfig(readFile(file), file)
    val domain = domainOf(local, flags)
    val storedYaml = store.getSources(domain)
    val stored =
      if (storedYaml.isEmpty) SourcesConfig(Nil)
      else parseConfig(storedYaml, "stored config")
    val changes = Seq.newBuilder[DiffChange]
    val storedBy = stored.sources.map(s => s.name -> s).toMap
    val localBy = local.sources.map(s => s.name -> s).toMap
    local.sources.filterNot(s => storedBy.contains(s.name)).foreach(s =>
      changes += DiffChange("added", s"sources[${s.name}]", None, None))
    stored.sources.filterNot(s => localBy.contains(s.name)).foreach(s =>
      changes += DiffChange("deleted", s"sources[${s.name}]", None, None))
    for (l <- local.sources; d <- storedBy.get(l.name)) {
      if (l.sourceType != d.sourceType)
        changes += DiffChange("modified", s"sources[${l.name}].type",
          Some(d.sourceType), Some(l.sourceType))
      if (l.url != d.url)
        changes += DiffChange("modified", s"sources[${l.name}].url",
          d.url, l.url)
      val dTables = d.tables.map(t => t.name -> t).toMap
      l.tables.filterNot(t => dTables.contains(t.name)).foreach(t =>
        changes += DiffChange("added", s"sources[${l.name}].tables[${t.name}]", None, None))
      d.tables.filterNot(t => l.tables.exists(_.name == t.name)).foreach(t =>
        changes += DiffChange("deleted", s"sources[${l.name}].tables[${t.name}]", None, None))
      for (lt <- l.tables; dt <- dTables.get(lt.name)) {
        if (lt.columns.map(c => (c.name, c.dataType, c.notNull)) !=
            dt.columns.map(c => (c.name, c.dataType, c.notNull)))
          changes += DiffChange("modified",
            s"sources[${l.name}].tables[${lt.name}].columns",
            Some(dt.columns.map(_.name).mkString(",")),
            Some(lt.columns.map(_.name).mkString(",")))
      }
    }
    changes.result()
  }

  /** Schema-level validation (validate.rs): names are safe identifiers,
    * types resolve, no duplicate sources/tables; offline=false adds the
    * reachability checks of test-connection. */
  def validateConfig(cfg: SourcesConfig, offline: Boolean): Seq[String] = {
    val problems = Seq.newBuilder[String]
    val dupSrc = cfg.sources.groupBy(_.name).collect { case (n, ss) if ss.size > 1 => n }
    dupSrc.foreach(n => problems += s"duplicate source name '$n'")
    cfg.sources.foreach { s =>
      try graft.util.Sanitize.validateIdentifier(s.name)
      catch { case NonFatal(e) => problems += s"source '${s.name}': ${e.getMessage}" }
      val dupT = s.tables.groupBy(_.name).collect { case (n, ts) if ts.size > 1 => n }
      dupT.foreach(n => problems += s"source '${s.name}': duplicate table '$n'")
      s.tables.foreach { t =>
        try graft.util.Sanitize.validateIdentifier(t.name)
        catch { case NonFatal(e) => problems += s"table '${t.name}': ${e.getMessage}" }
        t.columns.foreach { c =>
          try graft.sources.TypeMapper.fromConfig(c.dataType)
          catch { case NonFatal(e) =>
            problems += s"${t.name}.${c.name}: ${e.getMessage}" }
        }
      }
      if (!offline) testSource(s).foreach(m => problems += s"${s.name}: $m")
    }
    problems.result()
  }

  /** Reachability probe per source type; None = ok, Some(msg) = failure. */
  private def testSource(s: graft.sources.SourceDef): Option[String] =
    s.sourceType.toLowerCase match {
      case "parquet" | "csv" | "json" | "file" =>
        val missing = s.tables.flatMap(_.path)
          .filterNot(p => Files.exists(Paths.get(p)))
        if (missing.isEmpty) None
        else Some(s"missing paths: ${missing.mkString(", ")}")
      case "jdbc" | "derby" =>
        s.url match {
          case None => Some("jdbc source has no url")
          case Some(u) =>
            try { DriverManagerShim.probe(u); None }
            catch { case NonFatal(e) => Some(String.valueOf(e.getMessage)) }
        }
      case "rest" | "grpc" | "arrowhttp" =>
        s.url match {
          case None => Some(s"${s.sourceType} source has no url")
          case Some(u) =>
            try {
              val conn = new java.net.URI(u).toURL
                .openConnection().asInstanceOf[java.net.HttpURLConnection]
              conn.setConnectTimeout(5000)
              conn.setReadTimeout(5000)
              conn.setRequestMethod("GET")
              conn.getResponseCode // any HTTP answer proves reachability
              conn.disconnect()
              None
            } catch { case NonFatal(e) => Some(String.valueOf(e.getMessage)) }
        }
      case other => Some(s"unknown source type '$other'")
    }

  /** Table discovery per source (discovery.rs `search`): declared tables
    * plus what the upstream itself reports — directory data files for
    * file sources, the JDBC catalog (DatabaseMetaData) for databases. */
  private def discoverTables(s: graft.sources.SourceDef): Seq[String] = {
    val declared = s.tables.map(_.name)
    val upstream = s.sourceType.toLowerCase match {
      case "jdbc" | "derby" =>
        // engine catalogs describe the engine, not the data — exact-name
        // deny set (a prefix match would hide user schemas like
        // 'sysadmin'); table names keep their case: lowercasing would
        // corrupt `add` on case-sensitive databases
        val systemSchemas = Set("SYS", "SYSIBM", "SYSCAT", "SYSFUN",
          "SYSPROC", "SYSSTAT", "SYSCS_DIAG", "SYSCS_UTIL", "NULLID",
          "SQLJ", "INFORMATION_SCHEMA", "PG_CATALOG", "MYSQL",
          "PERFORMANCE_SCHEMA")
        s.url.toSeq.flatMap { u =>
          val conn =
            try { DriverManagerShim.connect(u) }
            catch { case NonFatal(e) =>
              throw new ConnectException(
                s"source '${s.name}' unreachable: ${e.getMessage}") }
          try {
            val rs = conn.getMetaData.getTables(null, null, "%",
              Array("TABLE", "VIEW"))
            try {
              val out = Seq.newBuilder[String]
              while (rs.next()) {
                val schema = rs.getString("TABLE_SCHEM")
                if (schema == null ||
                    !systemSchemas.contains(schema.toUpperCase))
                  out += rs.getString("TABLE_NAME")
              }
              out.result()
            } finally rs.close()
          } finally conn.close()
        }
      case _ =>
        s.url.map(Paths.get(_)).filter(Files.isDirectory(_)) match {
          case Some(dir) =>
            val exts = Set(".parquet", ".csv", ".json")
            val stream = Files.list(dir)
            try stream.iterator().asScala
              .map(_.getFileName.toString)
              .filter(n => exts.exists(n.endsWith))
              .map(n => n.substring(0, n.lastIndexOf('.')))
              .toSeq
            finally stream.close()
          case None => Nil
        }
    }
    (declared ++ upstream).distinct.sorted
  }

  private def appendTableYaml(raw: String, source: String,
      table: String): String = {
    val lines = raw.linesIterator.toVector
    val nameRe = s"""\\s*-\\s*name:\\s*"?${Regex.quote(source)}"?\\s*""".r
    // source entries are the SHALLOWEST `- name:` items: matching by name
    // alone could hit a same-named TABLE nested under an earlier source
    val entryIndents = lines.collect {
      case l if l.trim.startsWith("- name:") => l.indexOf('-')
    }
    require(entryIndents.nonEmpty, "no sources in YAML text")
    val topIndent = entryIndents.min
    val idx = lines.indexWhere(l =>
      nameRe.matches(l) && l.indexOf('-') == topIndent)
    require(idx >= 0, s"source '$source' not found in YAML text")
    val srcIndent = topIndent
    val end = lines.indexWhere(
      l => l.trim.startsWith("- name:") && l.indexOf('-') == srcIndent,
      idx + 1) match { case -1 => lines.size; case e => e }
    val tIdx = (idx until end).find(i => lines(i).trim == "tables:")
    val entry = s"${" " * (srcIndent + 4)}- name: $table"
    val updated = tIdx match {
      case Some(ti) => lines.patch(ti + 1, Seq(entry), 0)
      case None => lines.patch(end,
        Seq(s"${" " * (srcIndent + 2)}tables:", entry), 0)
    }
    updated.mkString("", "\n", "\n")
  }

  /** Diagnostics must not corrupt `--format json` stdout (consumers parse
    * it); in json mode they go to stderr instead of being dropped. */
  private def warn(msg: String, json: Boolean,
      out: java.io.PrintStream): Unit =
    if (json) System.err.println(msg) else out.println(msg)

  private def warnPlaintextPasswords(raw: String, json: Boolean,
      out: java.io.PrintStream): Unit = {
    val pw = raw.linesIterator.exists { l =>
      val t = l.trim
      t.startsWith("password:") && !t.contains("${")
    }
    if (pw && !json)
      out.println("warning: plaintext password in config — use ${VAR} " +
        "environment substitution instead")
  }

  private def loadConfig(file: String): SourcesConfig =
    parseConfig(expandSecrets(readFile(file)), file)

  private def parseConfig(yaml: String, what: String): SourcesConfig =
    try SourcesConfig.fromYamlString(yaml)
    catch { case NonFatal(e) =>
      throw new ConfigException(s"failed to parse $what: ${e.getMessage}") }

  private def readFile(file: String): String = {
    val p = Paths.get(file)
    if (!Files.exists(p)) throw new ConfigException(s"no such file: $file")
    Files.readString(p)
  }

  /** Domain resolution: --domain flag, then a top-level `domain:` key in
    * the YAML (the reference's SourcesConfig.domain), then "default". */
  private def domainOf(cfg: SourcesConfig, flags: Map[String, String]): String =
    flags.get("domain").orElse(cfg.domain).getOrElse("default")

  private def currentUser(): String =
    sys.env.getOrElse("USER", "unknown")

  private def withStore(rest: List[String], flags: Map[String, String])(
      f: (MetadataStore, String) => Int): Int = {
    val file = rest.headOption.getOrElse("sources.yaml")
    val dir = Option(Paths.get(file).getParent).map(_.toString).getOrElse(".")
    withStoreAt(flags, dir)(st => f(st, file))
  }

  private def withStoreAt(flags: Map[String, String], dir: String)(
      f: MetadataStore => Int): Int = {
    val dbDir = flags.getOrElse("metadata",
      Paths.get(dir, ".graft-metadata").toString)
    val store = new DerbyMetadataStore(dbDir)
    try { store.init(); f(store) } finally store.close()
  }

  /** `--flag value` and `--flag` (boolean) args; the rest positional.
    * Value-taking flags MUST have an argument: `--format` alone or
    * `--metadata --force` would otherwise silently bind "true" (JSON mode
    * ignored; a Derby store created in a directory literally named `true`). */
  private def parseArgs(args: List[String]): (Map[String, String], List[String]) = {
    val flags = Map.newBuilder[String, String]
    val positional = List.newBuilder[String]
    var rest = args
    val boolFlags = Set("force", "dry-run", "offline", "sources-only")
    val valueFlags = Set("format", "template", "expected-version", "domain",
      "to-version", "metadata", "notify-url")
    while (rest.nonEmpty) {
      rest match {
        case flag :: tail if flag.startsWith("--") =>
          val name = flag.drop(2)
          if (boolFlags(name)) { flags += name -> "true"; rest = tail }
          else if (tail.isEmpty || tail.head.startsWith("--")) {
            if (valueFlags(name))
              throw new UsageException(s"--$name requires a value")
            flags += name -> "true"; rest = tail
          } else { flags += name -> tail.head; rest = tail.tail }
        case p :: tail => positional += p; rest = tail
        case Nil => // unreachable: loop guard is rest.nonEmpty
      }
    }
    (flags.result(), positional.result())
  }

  private def templateYaml(template: String): String = template match {
    case "sql" =>
      """domain: default
        |sources:
        |  - name: warehouse
        |    type: jdbc
        |    url: jdbc:postgresql://localhost:5432/db?user=${DB_USER}&password=${DB_PASSWORD}
        |    tables:
        |      - name: example
        |        columns:
        |          - {name: id, type: int64, not_null: true}
        |""".stripMargin
    case "rest" =>
      """domain: default
        |sources:
        |  - name: api
        |    type: rest
        |    url: https://api.example.com/v1/items
        |    options: {pagination: offset}
        |    tables:
        |      - name: items
        |""".stripMargin
    case "grpc" =>
      """domain: default
        |sources:
        |  - name: svc
        |    type: grpc
        |    url: http://localhost:50051
        |    options: {descriptor_set: ./service.desc, method: pkg.Svc/List}
        |    tables:
        |      - name: rows
        |""".stripMargin
    case _ =>
      """domain: default
        |sources:
        |  - name: files
        |    type: parquet
        |    tables:
        |      - name: example
        |        path: ./data/example.parquet
        |""".stripMargin
  }

  /** A numeric flag value; anything else is a usage error (exit 2), not
    * a general failure with a raw NumberFormatException message. */
  private def intFlag(name: String, v: String): Int =
    try v.toInt catch {
      case _: NumberFormatException =>
        throw new UsageException(s"--$name requires an integer, got '$v'")
    }

  final class UsageException(msg: String) extends RuntimeException(msg)

  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private val usage: String =
    """usage: graft-cli <command> [args] [--format json] [--metadata dir]
      |  init [file] [--template sql|rest|file|grpc] [--sources-only]
      |  validate [file] [--offline]
      |  diff [file]
      |  apply [file] [--force] [--dry-run] [--expected-version n]
      |  test-connection [file]
      |  search <source> [file]        (alias: introspect)
      |  add <source> <table> [file]
      |  describe [file] [--domain d]
      |  domain list | domain history [name] | domain rollback [name] --to-version n""".stripMargin

  private object DriverManagerShim {
    def connect(url: String): java.sql.Connection = {
      if (url.startsWith("jdbc:derby:"))
        Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
      java.sql.DriverManager.getConnection(url)
    }
    def probe(url: String): Unit = connect(url).close()
  }

  private implicit class IterShim[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
