package graft.session

/** Authenticated-user data model, mirroring the reference's
  * `AuthenticatedUser { id, permissions, rules }` carried through the
  * session (/root/reference/crates/common/src/auth.rs:6-15,77-104).
  */
final case class AuthenticatedUser(
    id: String,
    permissions: Set[String] = Set.empty,
    rules: Map[String, TablePolicy] = Map.empty) {

  /** Stable cache-key component: id + sorted permissions
    * (mirrors CacheKey user hashing, crates/runtime/src/query/cache.rs). */
  def cacheKey: String =
    id + "|" + permissions.toSeq.sorted.mkString(",")

  /** Permission check with the reference's semantics
    * (crates/common/src/auth.rs:113-155):
    *  - `admin` or `system:admin` grants everything;
    *  - `*` grants everything;
    *  - exact match;
    *  - hierarchical wildcard: `foo:*` matches `foo:bar` and
    *    `foo:bar:baz` but not `foo` itself nor `foobar:x`.
    */
  def hasPermission(permission: String): Boolean =
    permissions.contains("admin") ||
      permissions.contains("system:admin") ||
      permissions.contains("*") ||
      permissions.contains(permission) ||
      permissions.exists { p =>
        p.endsWith(":*") && {
          val prefix = p.dropRight(2)
          permission.length > prefix.length &&
            permission.startsWith(prefix) &&
            permission.charAt(prefix.length) == ':'
        }
      }
}

object AuthenticatedUser {
  val anonymous: AuthenticatedUser = AuthenticatedUser("anonymous")
}

/** Per-table row-level-security filter + column masking rules
  * (/root/reference/crates/common/src/auth.rs:158-181,
  * example policies config/policies.yaml:1-14). */
final case class TablePolicy(
    rlsFilter: Option[String] = None,
    masking: Map[String, MaskingRule] = Map.empty)

/** Masking rule variants (auth.rs MaskingRule enum). */
sealed trait MaskingRule
object MaskingRule {
  /** Replace with a fixed redaction token. */
  case object Redact extends MaskingRule
  /** Replace with sha2-256 hex of the value. */
  case object Hash extends MaskingRule
  /** Keep the first n characters, mask the rest. */
  final case class KeepFirst(n: Int) extends MaskingRule
  /** Replace with a constant default. */
  final case class Default(value: String) extends MaskingRule
}
