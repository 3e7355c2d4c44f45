package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Pii.maskPii]] hand fixtures: the class patterns, the fixed masking
  * sequence (overlap attribution), NULL/empty behavior, the density
  * gate, and the fresh-column guard. The engine-parity claim (counts +
  * masked md5 hash-match DuckDB) is the `q_pii_mask` oracle's job.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def masked(text: String): (Long, Long, Long, String) = {
    val r = Pii.maskPii(Seq((1L, text)).toDF("id", "t"), "t")
      .select("n_emails", "n_ipv4", "n_phones", "t_masked").collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("each class masks and counts on its own") {
    assert(masked("mail me at a.b+c%d@sub.example.co today")
      === ((1L, 0L, 0L, "mail me at <EMAIL> today")))
    assert(masked("server 192.168.0.1 and 10.0.0.254 up")
      === ((0L, 2L, 0L, "server <IP> and <IP> up")))
    assert(masked("call 555-123-4567 or 555.987.6543!")
      === ((0L, 0L, 2L, "call <PHONE> or <PHONE>!")))
    // parenthesized NANP, with and without the single space
    assert(masked("call (555) 123-4567 or (555)987-6543.")
      === ((0L, 0L, 2L, "call <PHONE> or <PHONE>.")))
  }

  test("overlap attribution: an IP-shaped local part is ONE email, zero IPs") {
    assert(masked("from 1.2.3.4@ex.io please")
      === ((1L, 0L, 0L, "from <EMAIL> please")))
    // ...but a freestanding IP right before an email stays an IP
    assert(masked("1.2.3.4 mails x@ex.io")
      === ((1L, 1L, 0L, "<IP> mails <EMAIL>")))
  }

  test("syntactic matcher, not a validator (the documented Dolma rule)") {
    // out-of-range octets still mask — recall over precision
    assert(masked("bogus 999.999.999.999 addr")._2 === 1L)
    // separator REQUIRED for phones: a bare 10-digit id is not a phone
    assert(masked("order 5551234567 shipped")._3 === 0L)
  }

  test("NULL and empty text: zero counts, mask passes through") {
    val df = Seq(1L).toDF("id").withColumn("t", lit(null).cast("string"))
      .unionByName(Seq((2L, "")).toDF("id", "t"))
    val out = Pii.maskPii(df, "t")
      .select("id", "n_emails", "n_ipv4", "n_phones", "t_masked")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4))))).toMap
    assert(out(1L) === ((0L, 0L, 0L, None)))
    assert(out(2L) === ((0L, 0L, 0L, Some(""))))
  }

  test("filterByPii gates on total density; guards stay loud") {
    val df = Seq(
      (1L, "clean text"),
      (2L, "one a@b.co hit"),
      (3L, "a@b.co and 1.2.3.4 and 555-123-4567")).toDF("id", "t")
    assert(Pii.filterByPii(df, "t", maxPiiHits = 1).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(Pii.filterByPii(df, "t", maxPiiHits = 0).select("id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    intercept[IllegalArgumentException] {
      Pii.filterByPii(df, "t", maxPiiHits = -1)
    }
    intercept[IllegalArgumentException] {
      Pii.maskPii(df.withColumn("n_ipv4", lit(1L)), "t")
    }
  }
}
