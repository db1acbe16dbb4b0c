package graft.operators

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record demux — the REAL crawl on-ramp: web corpora
  * arrive as WARC container files, not as an html column. This is the
  * container layer between the `binaryFile` reader
  * ([[graft.sources.Readers]]) and [[TextAnalysis.extractHtmlText]]:
  * parse record headers, split payloads, peel the HTTP envelope off
  * response records, and hand the bodies to the markup front door. The
  * same discipline as the mp4/ISO-BMFF box walk in [[Multimodal]]: a
  * JDK-only byte-format parser at a genuine codec boundary (no Catalyst
  * expression parses binary containers), partition-parallel via
  * `mapPartitions`, with an arithmetic SQL oracle over a deterministic
  * generated fixture.
  *
  * Scale shape (100 TB): crawl archives are written as ~1 GB WARC files
  * precisely so that THE FILE is the unit of parallelism — one task per
  * file, records demuxed streaming within the task, no shuffle anywhere
  * (the demux is a narrow flatMap). `binaryFile` caps at
  * `spark.sql.files.maxPartitionBytes`-sized whole files; for larger
  * archives the production seam is a record-aligned split reader (scan
  * for "\r\n\r\nWARC/" sync points), same as every distributed WARC
  * processor.
  *
  * Malformed-input contract (deterministic, spec-pinned):
  *   - a record whose header block never terminates ("\r\n\r\n" absent),
  *     whose version line is not "WARC/…", or whose Content-Length is
  *     missing/unparsable ends the file scan: records BEFORE it are
  *     returned, the malformed tail is dropped (a container with a torn
  *     record has no trustworthy resync point without the sync-scan
  *     seam above);
  *   - a TRUNCATED final record (declared Content-Length runs past
  *     end-of-file) is dropped the same way — a partial payload must
  *     never masquerade as a complete document;
  *   - response records whose payload is not an HTTP message (no
  *     "HTTP/" status line) keep the raw payload as `body` with
  *     `http_status = -1`.
  */
object Warc {

  // precompiled: a 2-char separator takes String.split's regex path,
  // recompiling the Pattern per header block
  private val CrlfPat = java.util.regex.Pattern.compile("\r\n")

  /** One demuxed record. `body` is the HTTP message body for records
    * carrying an HTTP envelope, the raw WARC payload otherwise.
    */
  final case class WarcRecord(
      doc_id: Long,
      record_idx: Int,
      warc_type: String,
      target_uri: String,
      content_type: String,
      content_length: Long,
      http_status: Int,
      body: Array[Byte])

  /** A synthetic WARC container keyed by the doc that produced it. */
  final case class WarcFile(doc_id: Long, payload: Array[Byte])

  private val Crlf = "\r\n"

  // HTTP envelope literals — shared with the oracle generator, which
  // reconstructs the exact response payload length from them
  private[graft] val HttpStatusLine = "HTTP/1.1 200 OK"
  private[graft] val HttpCtHeader = "Content-Type: text/html"

  /** Serialize one WARC/1.0 record: version line, named headers, the
    * mandatory Content-Length, one blank line, the payload, and the
    * record-terminating double CRLF (ISO 28500 §4).
    */
  def record(warcType: String, headers: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0").append(Crlf)
    sb.append("WARC-Type: ").append(warcType).append(Crlf)
    headers.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append(Crlf)
    }
    sb.append("Content-Length: ").append(payload.length).append(Crlf)
    sb.append(Crlf)
    sb.toString.getBytes(US_ASCII) ++ payload ++
      (Crlf + Crlf).getBytes(US_ASCII)
  }

  /** An HTTP/1.1 200 response envelope around an html body — what a
    * crawl's `response` record payload looks like.
    */
  def httpResponse(body: Array[Byte]): Array[Byte] =
    (HttpStatusLine + Crlf + HttpCtHeader + Crlf +
      s"Content-Length: ${body.length}" + Crlf + Crlf)
      .getBytes(US_ASCII) ++ body

  /** Demux one WARC container into its records. See the object scaladoc
    * for the malformed/truncation contract.
    */
  def parseWarc(payload: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer[WarcRecord]()
    var off = 0
    var idx = 0
    def indexOfCrlfCrlf(from: Int): Int = {
      var i = from
      while (i + 3 < payload.length) {
        if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') return i
        i += 1
      }
      -1
    }
    while (off < payload.length) {
      // skip inter-record CRLFs (tolerates a missing/extra terminator)
      while (off + 1 < payload.length &&
        payload(off) == '\r' && payload(off + 1) == '\n') off += 2
      if (off >= payload.length) return out.toSeq
      val hdrEnd = indexOfCrlfCrlf(off)
      if (hdrEnd < 0) return out.toSeq // torn header block: stop cleanly
      val block = new String(payload, off, hdrEnd - off, US_ASCII)
      val lines = CrlfPat.split(block, -1)
      if (lines.isEmpty || !lines(0).startsWith("WARC/")) return out.toSeq
      val hdrs = lines.drop(1).flatMap { l =>
        val i = l.indexOf(':')
        if (i <= 0) None
        else Some(l.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT) ->
          l.substring(i + 1).trim)
      }.toMap
      val len = hdrs.get("content-length").flatMap(_.toLongOption)
        .getOrElse(-1L)
      if (len < 0) return out.toSeq // mandatory header absent: stop
      val bodyStart = hdrEnd + 4
      if (bodyStart + len > payload.length) return out.toSeq // truncated
      val raw = java.util.Arrays.copyOfRange(payload, bodyStart,
        bodyStart + len.toInt)
      // peel an HTTP envelope when present
      val isHttp = raw.length >= 5 &&
        new String(raw, 0, 5, US_ASCII) == "HTTP/"
      val (status, body) =
        if (!isHttp) (-1, raw)
        else {
          var sep = -1
          var i = 0
          while (sep < 0 && i + 3 < raw.length) {
            if (raw(i) == '\r' && raw(i + 1) == '\n' &&
              raw(i + 2) == '\r' && raw(i + 3) == '\n') sep = i
            i += 1
          }
          val statusLine = new String(raw, 0,
            raw.indexWhere(_ == 0x0d.toByte) match {
              case -1 => raw.length
              case n => n
            }, US_ASCII)
          val st = statusLine.split(" ").lift(1)
            .flatMap(_.toIntOption).getOrElse(-1)
          if (sep < 0) (st, Array.emptyByteArray) // headers never end: no body
          else (st, java.util.Arrays.copyOfRange(raw, sep + 4, raw.length))
        }
      out += WarcRecord(0L, idx, hdrs.getOrElse("warc-type", ""),
        hdrs.getOrElse("warc-target-uri", ""),
        hdrs.getOrElse("content-type", ""), len, status, body)
      idx += 1
      off = bodyStart + len.toInt
    }
    out.toSeq
  }

  // ---- deterministic fixture (StressGen discipline: every parsed field
  // is predictable arithmetically from doc_id + text) ----

  private[graft] val FixHtmlPre1 = "<html><head><title>doc "
  private[graft] val FixHtmlPre2 = "</title></head><body><p>"
  private[graft] val FixHtmlSuf = "</p></body></html>"
  private[graft] val FixInfoPayload = "software: graft-synthetic\r\n"
  private[graft] def fixUri(docId: Long): String =
    s"https://w${docId % 7}.example.com/doc/$docId"

  /** One synthetic WARC per document: a `warcinfo` record followed by a
    * `response` record whose HTTP body wraps the document text in the
    * fixture markup. ASCII throughout, so byte lengths equal character
    * lengths and a SQL oracle can reconstruct every Content-Length.
    */
  def syntheticWarcs(df: DataFrame, idCol: String,
      textCol: String): Dataset[WarcFile] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)].mapPartitions { rows =>
      rows.map { case (id, text) =>
        val html = FixHtmlPre1 + id + FixHtmlPre2 + text + FixHtmlSuf
        val info = record("warcinfo",
          Seq("Content-Type" -> "application/warc-fields",
            "WARC-Date" -> "2024-01-01T00:00:00Z"),
          FixInfoPayload.getBytes(US_ASCII))
        val resp = record("response",
          Seq("WARC-Target-URI" -> fixUri(id),
            "WARC-Date" -> "2024-01-01T00:00:00Z",
            "Content-Type" -> "application/http; msgtype=response"),
          httpResponse(html.getBytes(UTF_8)))
        WarcFile(id, info ++ resp)
      }
    }
  }

  /** Partition-parallel record demux over WARC containers — one narrow
    * flatMap, no shuffle; each file's records inherit its key.
    */
  def warcRecords(files: Dataset[WarcFile]): Dataset[WarcRecord] = {
    import files.sparkSession.implicits._
    files.mapPartitions { fs =>
      fs.flatMap(f => parseWarc(f.payload).map(_.copy(doc_id = f.doc_id)))
    }
  }
}
