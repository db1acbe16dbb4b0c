package graft

import graft.operators.Psl
import org.apache.spark.sql.functions._

class PslSpec extends SparkTestBase {
  import spark.implicits._

  private def dom(hosts: String*): Seq[String] =
    hosts.toDF("host")
      .select(Psl.registrableDomain(col("host")))
      .as[String].collect().toSeq

  test("PSL parse: sections, comments, wildcard and exception grouping") {
    val r = Psl.PslRules.snapshot
    assert(r.exact(2).contains("co.uk"))
    assert(r.exact(3) == Seq("s3.amazonaws.com"))
    assert(r.wildcard(1).toSet == Set("ck", "bd"))
    assert(r.exceptions(2) == Seq("www.ck"))
    assert(r.maxK == 3)
    // comment lines and section markers never become rules
    assert(!r.exact.values.flatten.exists(_.startsWith("//")))
  }

  test("registrable domains: ccSLD, private section, wildcard, exception, defaults") {
    val cases = Seq(
      // the ccSLD cases the 2-label heuristic gets wrong
      "bbc.co.uk" -> "bbc.co.uk",
      "news.bbc.co.uk" -> "bbc.co.uk",
      "a.gov.au" -> "a.gov.au",
      // generic TLDs agree with the heuristic
      "www.example.com" -> "example.com",
      "example.com" -> "example.com",
      // private-section rules, including the 3-label one
      "foo.github.io" -> "foo.github.io",
      "x.b.s3.amazonaws.com" -> "b.s3.amazonaws.com",
      "me.blogspot.com" -> "me.blogspot.com",
      // wildcard *.ck: any single label is part of the public suffix
      "a.b.example.ck" -> "b.example.ck",
      "example.ck" -> "",
      // exception !www.ck beats the wildcard
      "www.ck" -> "www.ck",
      // default rule: unknown TLD keeps its last label as public suffix
      "host.internal" -> "host.internal",
      "deep.host.internal" -> "host.internal",
      // hosts that ARE public suffixes (or too short) have no domain
      "co.uk" -> "",
      "com" -> "",
      "localhost" -> "",
      "" -> "")
    val got = dom(cases.map(_._1): _*)
    cases.zip(got).foreach { case ((h, want), g) =>
      assert(g == want, s"host '$h': expected '$want', got '$g'")
    }
  }

  test("the PSL resolution is a codegen'd projection — no UDF, no join, no shuffle") {
    val df = (1L to 100L).map(i => s"w$i.bbc.co.uk").toDF("host")
      .select(Psl.registrableDomain(col("host")).as("d"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join") &&
      !p.contains("ScalaUDF"), s"PSL lookup must stay in the scan:\n$p")
  }
}
