package graft.util

/** Best-effort PII scrubbing for query logs — same category coverage as the
  * reference's scrubber (/root/reference/crates/common/src/scrubber.rs:
  * email, US SSN, 13-16-digit card numbers, common phone formats), with the
  * same caveat: regex defense-in-depth, not a compliance guarantee.
  */
object Scrubber {
  private val Email = "(?i)[A-Z0-9._%+-]+@[A-Z0-9.-]+\\.[A-Z]{2,}".r
  private val Ssn = "\\b\\d{3}-\\d{2}-\\d{4}\\b".r
  private val CreditCard = "\\b(?:\\d[ -]*?){13,16}\\b".r
  private val Phone = "(?:\\+?1[-. ]?)?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}".r

  def scrub(input: String): String = {
    var s = input
    s = Email.replaceAllIn(s, "[EMAIL]")
    s = Ssn.replaceAllIn(s, "[SSN]")
    s = CreditCard.replaceAllIn(s, "[CREDIT_CARD]")
    s = Phone.replaceAllIn(s, "[PHONE]")
    s
  }
}
