package graft

import org.apache.spark.sql.functions._
import graft.functions.Normalize

/** Hand-built URL equivalence classes for
  * [[graft.functions.Normalize.canonicalUrl]] — each rule exercised
  * with a positive AND a must-not-touch case, since the canonical key
  * feeds keep-first dedup where a false collapse DELETES a document.
  */
class UrlCanonSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    val sp = spark; import sp.implicits._
    urls.toDF("url").select(Normalize.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("case-mangled authority, default port, fragment, and tracking " +
      "params all collapse to one canonical form") {
    val got = canon(
      "https://Ex.COM/a",
      "HTTPS://EX.com:443/a",
      "https://ex.com/a#section-2",
      "https://ex.com/a?utm_source=feed",
      "https://ex.com/a?gclid=xyz#frag",
    )
    assert(got.forall(_ == "https://ex.com/a"), got.mkString(" | "))
  }

  test("non-tracking params survive, in original order, separators intact") {
    assert(canon("https://ex.com/a?x=1&utm_medium=m&y=2")
      == Seq("https://ex.com/a?x=1&y=2"))
    assert(canon("https://ex.com/a?utm_source=s&x=1")
      == Seq("https://ex.com/a?x=1"))
    assert(canon("https://ex.com/a?utm_source=s&utm_term=t&x=1")
      == Seq("https://ex.com/a?x=1"))
    assert(canon("https://ex.com/a?x=1&fbclid=f")
      == Seq("https://ex.com/a?x=1"))
  }

  test("a tracking NAME inside another param name must not strip (no false collapse)") {
    // href/xref contain "ref" but the rule anchors on the ?/& delimiter
    assert(canon("https://ex.com/p?href=z") == Seq("https://ex.com/p?href=z"))
    assert(canon("https://ex.com/p?xref=1&y=2")
      == Seq("https://ex.com/p?xref=1&y=2"))
    // and a tracking name as a PREFIX of another name must not bleed:
    // "ref" must not eat the front of "referrer=x" (the regex-scan
    // hazard the structural split/rejoin strip exists to rule out)
    assert(canon("https://ex.com/p?referrer=x")
      == Seq("https://ex.com/p?referrer=x"))
    assert(canon("https://ex.com/p?utm_sourcey=1&a=2")
      == Seq("https://ex.com/p?utm_sourcey=1&a=2"))
  }

  test("valueless and case-mangled tracking params strip; valueless " +
      "NON-tracking params survive") {
    // real crawls carry ?utm_source with no '=' and UTM_SOURCE=x —
    // param names compare case-insensitively and the value is optional
    assert(canon("https://ex.com/a?utm_source") == Seq("https://ex.com/a"))
    assert(canon("https://ex.com/a?utm_source&x=1")
      == Seq("https://ex.com/a?x=1"))
    assert(canon("https://ex.com/a?x=1&fbclid")
      == Seq("https://ex.com/a?x=1"))
    assert(canon("https://ex.com/a?UTM_SOURCE=x") == Seq("https://ex.com/a"))
    assert(canon("https://ex.com/a?Ref=1&b=2") == Seq("https://ex.com/a?b=2"))
    // kept params are reassembled verbatim — case preserved
    assert(canon("https://ex.com/a?Beta=1&GCLID=z")
      == Seq("https://ex.com/a?Beta=1"))
    // a valueless param that merely RESEMBLES a tracking name survives
    assert(canon("https://ex.com/a?reference")
      == Seq("https://ex.com/a?reference"))
  }

  test("param rules touch only the query: path '&' and in-value '?' survive") {
    // '&' is a legal path character (RFC 3986 §3.3): /a&ref=1 is a
    // PATH, not a tracking param — stripping it would collapse this
    // URL onto https://ex.com/a and delete a document downstream
    assert(canon("https://ex.com/a&ref=1") == Seq("https://ex.com/a&ref=1"))
    assert(canon("https://ex.com/a&&b") == Seq("https://ex.com/a&&b"))
    // '?' is legal inside a query VALUE (§3.4): ?q=a?ref=1 is one
    // param whose value contains "?ref=1" — not a strippable param
    assert(canon("https://ex.com/s?q=a?ref=1")
      == Seq("https://ex.com/s?q=a?ref=1"))
    // while a genuinely ?-led tracking param still strips
    assert(canon("https://ex.com/a?ref=1") == Seq("https://ex.com/a"))
    assert(canon("https://ex.com/a?ref=1&x=2") == Seq("https://ex.com/a?x=2"))
  }

  test("no post-hoc separator repair: in-value '?&', trailing '?', and " +
      "pre-existing empty params survive") {
    // each strip consumes its own separator, so there is nothing to
    // "repair" — a global ?&→?, &&→&, or trailing-[?&] pass would
    // rewrite all three of these LEGAL queries onto other URLs'
    // canonical keys (and keep-first dedup would delete a document)
    assert(canon("https://ex.com/s?q=a?&b=1")
      == Seq("https://ex.com/s?q=a?&b=1"))
    assert(canon("https://ex.com/s?q=a?") == Seq("https://ex.com/s?q=a?"))
    assert(canon("https://ex.com/a?a=1&&x=3")
      == Seq("https://ex.com/a?a=1&&x=3"))
    // and the separator-consuming strips still compose: leading AND
    // middle AND trailing tracking params all vanish cleanly
    assert(canon("https://ex.com/a?gclid=1&x=2&utm_term=t")
      == Seq("https://ex.com/a?x=2"))
    assert(canon("https://ex.com/a?gclid=1&fbclid=2")
      == Seq("https://ex.com/a"))
  }

  test("non-default ports are identity-bearing and survive") {
    assert(canon("https://ex.com:8443/a") == Seq("https://ex.com:8443/a"))
    // :443 is only default for https; on http it stays
    assert(canon("http://ex.com:443/a") == Seq("http://ex.com:443/a"))
    assert(canon("http://ex.com:80/a") == Seq("http://ex.com/a"))
  }

  test("empty path normalizes to / so bare-host forms collide") {
    assert(canon("https://ex.com", "https://ex.com/",
        "https://ex.com?utm_source=s").distinct == Seq("https://ex.com/"))
  }

  test("path and query case is significant (RFC 3986: only the authority folds)") {
    assert(canon("https://ex.com/Path?Q=V") == Seq("https://ex.com/Path?Q=V"))
  }

  test("urlHost lowercases and drops port/path/userinfo") {
    val sp = spark; import sp.implicits._
    def host(u: String): String = Seq(u).toDF("url")
      .select(Normalize.urlHost(col("url"))).collect().head.getString(0)
    assert(host("HTTPS://Ex.COM:8443/a?x=1") == "ex.com")
    // RFC 3986 §3.2.1 userinfo is skipped — alice@ex.com is NOT a host
    assert(host("https://alice@ex.com/a") == "ex.com")
    assert(host("https://alice:pw@ex.com:8443/a") == "ex.com")
    // '@' AFTER the authority (in the path) must not trigger the skip
    assert(host("https://ex.com/a@b") == "ex.com")
  }

  test("∀ generated URLs: canonicalization is IDEMPOTENT and host-stable") {
    // adversarial generator over the grammar the rules parse:
    // case-mangled scheme/authority, optional userinfo and ports
    // (default and identity-bearing), paths with legal '&', query
    // params mixing tracked/untracked/valueless/empty names and
    // values containing '=' / '?', optional fragments — plus
    // scheme-less junk, which must still canonicalize deterministically
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val scheme = Gen.oneOf("https", "HTTPS", "http", "HtTp")
    val host = Gen.oneOf("Ex.COM", "ex.com", "A.b.ORG")
    val user = Gen.oneOf("", "Alice@", "bob:PW@")
    val port = Gen.oneOf("", ":443", ":80", ":8443")
    val seg = Gen.oneOf("", "/a", "/A&b", "/p-1/q_2")
    val param = Gen.oneOf("utm_source=f", "UTM_SOURCE", "x=1", "q=a?ref=1",
      "ref=z", "REF", "refx=2", "", "k=v=w", "gclid=G", "a=1")
    val query = Gen.oneOf(
      Gen.const(""),
      Gen.nonEmptyListOf(param).map(ps => "?" + ps.take(4).mkString("&")))
    val frag = Gen.oneOf("", "#f", "#A?b&c")
    val urlGen = Gen.oneOf(
      for { s <- scheme; u <- user; h <- host; p <- port; g <- seg;
            q <- query; f <- frag } yield s"$s://$u$h$p$g$q$f",
      Gen.oneOf("foo/bar", "foo?utm_source=1", "", "just text", "a#b"))
    val urls = (1 to 400).flatMap(i =>
      urlGen.apply(Gen.Parameters.default, Seed(1234L + i)))
    val sp = spark; import sp.implicits._
    val once = urls.toDF("url")
      .select(col("url"), Normalize.canonicalUrl(col("url")).as("c1"),
        Normalize.urlHost(col("url")).as("h0"))
    val twice = once.select(col("url"), col("c1"), col("h0"),
      Normalize.canonicalUrl(col("c1")).as("c2"),
      Normalize.urlHost(col("c1")).as("h1"))
    val bad = twice.filter(col("c1") =!= col("c2") || col("h0") =!= col("h1"))
      .collect()
    assert(bad.isEmpty,
      bad.take(5).map(r => s"url=${r.getString(0)} c1=${r.getString(1)} " +
        s"c2=${r.getString(3)} h0=${r.getString(2)} h1=${r.getString(4)}")
        .mkString("\n"))
  }

  test("split_host_disjoint: every host lands in exactly ONE split; " +
      "deterministic; train dominates at the 90% threshold") {
    val rows = SparkEntry.queries("split_host_disjoint")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // host-disjointness IS the operator's contract: zero site leakage
    val byHost = rows.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    assert(byHost.nonEmpty && byHost.values.forall(_.size == 1),
      byHost.filter(_._2.size > 1).toString)
    assert(rows.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    val trainHosts = byHost.count(_._2 == Set("train"))
    assert(trainHosts.toDouble / byHost.size >= 0.5,
      s"$trainHosts/${byHost.size} hosts in train — thresholds broken?")
    // deterministic: a rerun assigns identically
    val again = SparkEntry.queries("split_host_disjoint")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(again.toSet == rows.toSet)
  }

  test("dedup_by_url keep-first: min doc_id survives, variants counted") {
    val df = SparkEntry.queries("dedup_by_url")(spark, sfDir)
    val rows = df.collect()
    // every group's keeper is its minimum doc_id by construction (min
    // aggregate) — sanity-check collapse really happened: the fixture
    // walks all 5 cosmetic variants inside each (host, path) class
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Long]("n_urls") > 1),
      "URL canonicalization collapsed nothing — fixture misaligned")
    val total = rows.map(_.getAs[Long]("n_urls")).sum
    val docs = SparkEntry.queries("text_url_canonical")(spark, sfDir).count()
    assert(total == docs, s"partition property violated: $total != $docs")
  }
}
