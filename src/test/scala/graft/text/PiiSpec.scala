package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def counts(text: String): (Int, Int, Int, String) = {
    val toks = Pii.rawTokens(col("t"))
    Seq(text).toDF("t").select(
      Pii.emailCount(toks), Pii.phoneCount(toks), Pii.ipCount(toks),
      Pii.redact(col("t")))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))).head
  }

  test("classification: email, phone, ip, with precedence") {
    val (e, p, i, red) =
      counts("mail me at bob@example.com or +1-555-0199 from 10.0.0.1 thanks")
    assert((e, p, i) == (1, 1, 1))
    assert(red == "mail me at <PII> or <PII> from <PII> thanks")
  }

  test("negative cases survive unredacted") {
    val (e, p, i, red) = counts("a@b @x.com x@. 12-34 1.2.3 version 1.2.3.4.5 trailing@dot.")
    // a@b: no dot in domain; @x.com: empty local; x@.: domain too short;
    // 12-34: 4 digits; 1.2.3: three groups; 1.2.3.4.5: five groups and
    // only 5 digits among 9 chars (4 separators ≤ 5 but 5 digits < 7);
    // trailing@dot.: domain ends with '.'.
    assert((e, p, i) == (0, 0, 0))
    assert(red == "a@b @x.com x@. 12-34 1.2.3 version 1.2.3.4.5 trailing@dot.")
  }

  test("email precedence: an address with many digits is not also a phone") {
    val (e, p, i, _) = counts("user1234567@mail9.example.com")
    assert((e, p, i) == (1, 0, 0))
  }

  test("case is preserved; whitespace normalized to single spaces") {
    val (_, _, _, red) = counts("Hello   World\tuser@ex.com")
    assert(red == "Hello World <PII>")
  }
}
