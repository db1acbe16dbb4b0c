package graft

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import graft.operators.Warc
import org.apache.spark.sql.functions._

class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def bytes(s: String): Array[Byte] = s.getBytes(US_ASCII)

  test("WARC round trip: build → parse recovers every record field") {
    val html = "<html><body><p>hello crawl</p></body></html>"
    val file =
      Warc.record("warcinfo",
        Seq("Content-Type" -> "application/warc-fields"),
        bytes("software: test\r\n")) ++
        Warc.record("response",
          Seq("WARC-Target-URI" -> "https://ex.org/a",
            "Content-Type" -> "application/http; msgtype=response"),
          Warc.httpResponse(html.getBytes(UTF_8))) ++
        Warc.record("metadata",
          Seq("WARC-Target-URI" -> "https://ex.org/a"),
          bytes("fetch-ms: 12"))
    val rs = Warc.parseWarc(file)
    assert(rs.map(_.warc_type) == Seq("warcinfo", "response", "metadata"))
    assert(rs.map(_.record_idx) == Seq(0, 1, 2))
    val resp = rs(1)
    assert(resp.target_uri == "https://ex.org/a")
    assert(resp.http_status == 200)
    assert(new String(resp.body, UTF_8) == html,
      "the HTTP envelope must peel off exactly")
    assert(resp.content_length ==
      Warc.httpResponse(html.getBytes(UTF_8)).length.toLong)
    // non-HTTP payloads keep raw bytes, status -1
    assert(rs(0).http_status == -1 &&
      new String(rs(0).body, US_ASCII) == "software: test\r\n")
    assert(rs(2).http_status == -1)
  }

  test("malformed containers stop cleanly at the documented boundaries") {
    val good = Warc.record("response",
      Seq("WARC-Target-URI" -> "https://ex.org/ok"),
      Warc.httpResponse(bytes("<p>x</p>")))
    // garbage that is not WARC at all → no records
    assert(Warc.parseWarc(bytes("HTTP/1.1 200 OK\r\n\r\nnope")).isEmpty)
    assert(Warc.parseWarc(Array.emptyByteArray).isEmpty)
    // torn header block on the SECOND record → first survives, tail drops
    assert(Warc.parseWarc(
      good ++ bytes("WARC/1.0\r\nWARC-Type: response\r\nno-terminator"))
      .map(_.target_uri) == Seq("https://ex.org/ok"))
    // missing Content-Length → record refused, scan stops
    assert(Warc.parseWarc(
      good ++ bytes("WARC/1.0\r\nWARC-Type: response\r\n\r\npayload"))
      .size == 1)
    // TRUNCATED payload (declared length past end-of-file) → dropped:
    // a partial payload must never masquerade as a complete document
    assert(Warc.parseWarc(
      good ++ bytes("WARC/1.0\r\nWARC-Type: response\r\n" +
        "Content-Length: 99999\r\n\r\nshort")).size == 1)
    // header names are case-insensitive per ISO 28500
    val odd = bytes("WARC/1.0\r\nwarc-type: response\r\n" +
      "content-LENGTH: 4\r\n\r\nbody\r\n\r\n")
    val r = Warc.parseWarc(odd)
    assert(r.size == 1 && r.head.warc_type == "response" &&
      new String(r.head.body, US_ASCII) == "body")
    // extra inter-record CRLFs are tolerated
    assert(Warc.parseWarc(good ++ bytes("\r\n\r\n") ++ good).size == 2)
    // an HTTP payload whose headers never terminate keeps status, no body
    val noSep = Warc.record("response", Nil,
      bytes("HTTP/1.1 404 NF\r\nContent-Type: text/html"))
    val n = Warc.parseWarc(noSep)
    assert(n.head.http_status == 404 && n.head.body.isEmpty)
  }

  test("demux keys records by file and runs as a narrow flatMap") {
    val docs = Seq((7L, "some crawl text"), (8L, "other page words"))
      .toDF("doc_id", "text")
    val recs = Warc.warcRecords(Warc.syntheticWarcs(docs, "doc_id", "text"))
    val got = recs.toDF()
      .select(col("doc_id"), col("record_idx"), col("warc_type"))
      .as[(Long, Int, String)].collect().toSet
    assert(got == Set((7L, 0, "warcinfo"), (7L, 1, "response"),
      (8L, 0, "warcinfo"), (8L, 1, "response")))
    // no shuffle: the demux plan has no exchange
    val p = recs.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"record demux must be a narrow flatMap:\n$p")
  }
}
