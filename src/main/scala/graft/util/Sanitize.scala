package graft.util

/** Identifier safety for any SQL this engine generates (JDBC pushdown,
  * remote federation): reject dangerous characters, bound length, and
  * double-quote. Port of the reference's sanitizer contract
  * (/root/reference/crates/sql/src/sql_generator/sanitize.rs:4-36):
  * no quotes, NUL, `;`, backtick, or backslash; ≤128 chars.
  */
object Sanitize {
  private val MaxLen = 128
  private val Banned = Set('"', '\'', '\u0000', ' ', ';', '`', '\\')

  final case class UnsafeIdentifier(name: String)
      extends IllegalArgumentException(
        s"unsafe SQL identifier: ${name.take(64)}")

  def validateIdentifier(name: String): String = {
    if (name.isEmpty || name.length > MaxLen || name.exists(Banned))
      throw UnsafeIdentifier(name)
    name
  }

  /** Validated + double-quoted, for embedding in generated SQL. */
  def quoteIdentifier(name: String): String =
    "\"" + validateIdentifier(name) + "\""
}
