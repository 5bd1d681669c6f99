package graft

import org.apache.spark.sql.functions._

/** q_pii_scrub dialect-parity pins (VERDICT r8 item 4).
  *
  * The scrub's correctness story is a cross-engine one: Spark evaluates
  * the patterns through java.util.regex, the DuckDB oracle through RE2.
  * The CORRECTNESS gate pins the two engines agreeing on the fixture;
  * this spec pins the ENGINE's behavior on adversarial strings the
  * fixture can't contain, against hand-computed expectations — so a
  * pattern edit that drifts outside the Java ∩ RE2 common subset
  * (lookaround, \b, lazy quantifiers, backrefs — features where the
  * dialects disagree or RE2 refuses the pattern) fails here with a
  * readable diff instead of as an opaque oracle hash mismatch.
  */
class RegexDialectSpec extends SparkSpec {

  // the production patterns themselves, not copies — an edit to the
  // query's patterns is automatically re-pinned here
  private val email = graft.ops.TextOps.PiiEmail
  private val id = graft.ops.TextOps.PiiId
  private val num = graft.ops.TextOps.PiiNum

  private def scrub(rows: Seq[String]): Seq[(String, Long, Long, Long, String)] = {
    import spark.implicits._
    rows.toDF("t")
      .select(
        $"t",
        regexp_count($"t", lit(email)).cast("long").as("n_email"),
        regexp_count($"t", lit(id)).cast("long").as("n_id"),
        regexp_count($"t", lit(num)).cast("long").as("n_num"),
        regexp_replace(regexp_replace(regexp_replace(
          $"t", email, "[EMAIL]"), id, "[ID]"), num, "[NUM]").as("s"))
      .as[(String, Long, Long, Long, String)].collect().toSeq
  }

  test("patterns stay inside the Java ∩ RE2 common subset") {
    // RE2 rejects lookaround/backrefs outright and treats lazy
    // quantifiers differently under leftmost-longest — the shared
    // subset used here must contain none of those constructs
    for (p <- Seq(email, id, num)) {
      assert(!p.contains("(?"), s"group options/lookaround in $p")
      assert(!p.matches(""".*\\[1-9].*"""), s"backreference in $p")
      assert(!p.contains("\\b"), s"word boundary in $p")
      assert(!p.contains("*?") && !p.contains("+?") && !p.contains("}?"),
        s"lazy quantifier in $p")
    }
  }

  test("span counting: non-overlapping left-to-right, hand-computed") {
    val got = scrub(Seq(
      // two emails, back-to-back ids (non-overlapping scan), 7 vs 8 digits
      "a@b.co and c.d+x@e-f.org meet",
      "111-22-3333444-55-6666",     // ids adjacent: both match
      "1234567 12345678 123456789", // 7 digits no, 8 yes, 9 yes
      "dot@trail.com.",             // trailing dot: [a-z0-9.-]+ is greedy but
                                    // \.[a-z]{2,} must still close → 'com' matched,
                                    // final '.' left behind
      "no pii here at all"))
    assert(got.map(r => (r._2, r._3, r._4)) === Seq(
      (2L, 0L, 0L), (0L, 2L, 0L), (0L, 0L, 2L), (1L, 0L, 0L), (0L, 0L, 0L)))
    assert(got(1)._5 === "[ID][ID]")
    assert(got(2)._5 === "1234567 [NUM] [NUM]")
    assert(got(3)._5 === "[EMAIL].")
  }

  test("replacement nesting: classes are disjoint, order email→id→num") {
    // a card number inside an email's local part is consumed by the
    // EMAIL mask (leftmost span wins before the num pass ever runs) —
    // the one overlap the nesting order resolves, pinned so a reorder
    // of the regexp_replace nest shows up as a failure here
    val got = scrub(Seq("pay 41111111111111112@bank.com or 41111111111111112"))
    assert(got.head._2 === 1L)           // one email
    assert(got.head._4 === 2L)           // num counts run on the RAW text
    assert(got.head._5 === "pay [EMAIL] or [NUM]")
  }

  test("greedy bounded repetition: {2,} extends as far as possible") {
    val got = scrub(Seq("x@y.abcde rest"))
    // [a-z]{2,} greedily takes 'abcde' — both Java and RE2 are greedy
    // here; divergence would appear as a partial mask
    assert(got.head._5 === "[EMAIL] rest")
  }
}
