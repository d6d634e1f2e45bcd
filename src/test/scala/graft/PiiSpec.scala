package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** PII detection + redaction (TextOps.piiScrubRows / pii_scrub): the
  * declared query's oracle pins the all-zero report on the PII-free
  * fixture; THIS spec drives a constructed dirty fixture through the
  * same expressions and pins exact per-class counts and the redacted
  * output, including the class-priority interactions (an email
  * containing a digit run counts for both classes but redacts as one
  * [EMAIL] token — counts are over the ORIGINAL text by contract).
  */
class PiiSpec extends SparkTestBase {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "contact alice.smith+spam@example.co.uk for details", "en"),
      (2L, "server at 192.168.1.200 and backup at 10.0.0.1 are up", "en"),
      (3L, "order 123456789 shipped, ref 000042 pending 9999999", "de"),
      (4L, "mixed: bob@corp.io from 172.16.254.3 card 4111111111111111", "en"),
      (5L, "clean text with the usual words and a number 12345", "fr"), // 5 digits: NOT PII
      (6L, "user123456@host.net embeds a long digit run", "de"),
      (7L, "", "fr"))
      .toDF("doc_id", "text", "lang")
  }

  test("per-class detection counts are exact") {
    val r = TextOps.piiScrubRows(fixture).orderBy("doc_id")
      .select("doc_id", "n_email", "n_ip", "n_num").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getInt(3))).toSeq
    assert(r == Seq(
      (1L, 1, 0, 0),
      (2L, 0, 2, 0),
      (3L, 0, 0, 3), // 123456789, 000042, 9999999 — all runs of 6+ digits
      (4L, 1, 1, 1),
      (5L, 0, 0, 0), // 12345 is below the 6-digit threshold
      (6L, 1, 0, 1), // the email's local part ALSO contains a 6+ digit run
      (7L, 0, 0, 0)), s"got $r")
  }

  test("redaction replaces every match and nothing else") {
    val m = TextOps.piiScrubRows(fixture)
      .select("doc_id", "scrubbed").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "contact [EMAIL] for details")
    assert(m(2L) == "server at [IP] and backup at [IP] are up")
    assert(m(4L) == "mixed: [EMAIL] from [IP] card [NUM]")
    assert(m(5L) == "clean text with the usual words and a number 12345")
    // email redaction swallows its embedded digit run (email runs first)
    assert(m(6L) == "[EMAIL] embeds a long digit run")
    assert(m(7L) == "")
  }

  test("the declared rollup aggregates the same rows (no double counting)") {
    fixture.createOrReplaceTempView("pii_fixture_docs")
    val agg = TextOps.piiScrubRows(fixture)
      .groupBy("lang")
      .agg(sum(col("n_email") + col("n_ip") + col("n_num")).as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // en: doc1 (1 email) + doc2 (2 ips) + doc4 (email+ip+num) = 6
    // de: doc3 (3 nums) + doc6 (email + embedded num) = 5
    assert(agg == Map("en" -> 6L, "de" -> 5L, "fr" -> 0L), s"got $agg")
  }
}
