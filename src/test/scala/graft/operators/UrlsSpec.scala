package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Urls.canonicalUrl]] hand fixtures, one per rule, plus the
  * passthrough/NULL contract and the min-id dedup. Engine parity is
  * the `q_url_canon`/`q_url_dedup` oracles' job.
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): Option[String] =
    Option(Seq(Option(u)).toDF("u")
      .select(Urls.canonicalUrl(col("u"))).collect()(0).getString(0))

  test("scheme + host casefold, default port stripped, other ports kept") {
    assert(canon("HTTPS://Example.COM:443/a") === Some("https://example.com/a"))
    assert(canon("HTTP://ex.io:80/a") === Some("http://ex.io/a"))
    assert(canon("http://ex.io:8080/a") === Some("http://ex.io:8080/a"))
    // :443 is only default for https — an http URL on 443 keeps it
    assert(canon("http://ex.io:443/a") === Some("http://ex.io:443/a"))
  }

  test("path rules: empty -> /, trailing slashes stripped except root") {
    assert(canon("https://ex.io") === Some("https://ex.io/"))
    assert(canon("https://ex.io/") === Some("https://ex.io/"))
    assert(canon("https://ex.io/a/b///") === Some("https://ex.io/a/b"))
  }

  test("query rules: tracking dropped, empties dropped, rest sorted; fragment dropped") {
    assert(canon("https://ex.io/p?b=2&utm_source=x&a=1&gclid=g#sec")
      === Some("https://ex.io/p?a=1&b=2"))
    assert(canon("https://ex.io/p?utm_campaign=x") === Some("https://ex.io/p"))
    assert(canon("https://ex.io/p?&&a=1&") === Some("https://ex.io/p?a=1"))
    // sorting makes param order irrelevant — the dedup-key property
    assert(canon("https://ex.io/p?a=1&b=2") === canon("https://ex.io/p?b=2&a=1"))
  }

  test("syntactic contract: non-URLs pass through, NULL stays NULL, userinfo case-folds") {
    assert(canon("not a url") === Some("not a url"))
    assert(canon("mailto:x@y.z") === Some("mailto:x@y.z")) // no ://
    assert(canon(null) === None)
    // userinfo is DELIBERATELY case-folded with the host (dedup-key
    // choice documented on [[Urls]]; RFC 3986 would keep its case)
    assert(canon("https://User@Ex.IO/a") === Some("https://user@ex.io/a"))
  }

  test("dedupByUrl keeps the min id per canonical url") {
    val df = Seq(
      (3L, "https://ex.io/p?b=2&a=1"),
      (1L, "HTTPS://EX.IO:443/p/?a=1&b=2&utm_source=x#f"),
      (2L, "https://ex.io/q")).toDF("id", "url")
    assert(Urls.dedupByUrl(df, "id", "url").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("dedupByUrl exempts NULL urls: every url-less row survives") {
    val df = Seq(
      (1L, Some("https://ex.io/p")),
      (2L, Some("HTTPS://EX.IO/p/")), // dup of 1
      (3L, None),
      (4L, None),
      (5L, None)).toDF("id", "url")
    assert(Urls.dedupByUrl(df, "id", "url").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 4L, 5L))
  }

  test("dedupByUrl loud guards: fresh __curl, integral id, NULL id raises") {
    val df = Seq((1L, "https://ex.io/p")).toDF("id", "url")
    intercept[IllegalArgumentException] {
      Urls.dedupByUrl(df.withColumn("__curl", lit("x")), "id", "url")
    }
    intercept[IllegalArgumentException] {
      Urls.dedupByUrl(
        Seq(("a", "https://ex.io/p")).toDF("id", "url"), "id", "url")
    }
    val nullId = Seq((Some(1L), "https://ex.io/p"), (None, "https://ex.io/q"))
      .toDF("id", "url")
    val e = intercept[Exception] {
      Urls.dedupByUrl(nullId, "id", "url").collect()
    }
    assert(e.getMessage.contains("NULL id") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL id")))
  }
}
