package graft.bank

import java.net.http.HttpRequest
import java.nio.charset.StandardCharsets.UTF_8
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signer — the `sign` hook that turns
  * [[HttpConditionalPutClaimStore]] into a working S3 (and
  * S3-compatible) claim store without a vendor SDK. Implemented from
  * the public specification (AWS General Reference, "Signature
  * Version 4 signing process"): canonical request → string-to-sign →
  * HMAC-SHA256 key chain (date → region → service → aws4_request) →
  * `Authorization` header. Verified against the published
  * documentation example vectors in SigV4Spec (signing key, canonical
  * request hash, final signature all pinned byte-for-byte).
  *
  * Usage:
  * {{{
  * TxTable.registerClaimStore("s3a", (_, _) =>
  *   new HttpConditionalPutClaimStore(new URI("https://bucket.s3.amazonaws.com"),
  *     sign = SigV4(accessKey, secretKey, "us-east-1")))
  * }}}
  *
  * Design notes:
  *   - The hook reads the half-built request via `Builder.build()`
  *     (which does not consume the builder), computes the signature
  *     over its method/URI/headers, and stamps `x-amz-date`,
  *     `x-amz-content-sha256` and `Authorization` onto the SAME
  *     builder. The claim store constructs a fresh builder per retry
  *     attempt, so each retry gets a fresh timestamp and a single set
  *     of auth headers.
  *   - The payload is signed as `UNSIGNED-PAYLOAD` by default — the
  *     standard choice for S3 PUTs over TLS (the body is covered by
  *     the channel, the headers by the signature); pass an explicit
  *     hex SHA-256 to bind the body cryptographically.
  *   - `host` is taken from the URI (never set as a header —
  *     `java.net.http` reserves it and fills the identical value).
  *   - Every header already present on the request is signed, so a
  *     conditional `If-None-Match: *` is covered by the signature.
  */
final class SigV4(accessKey: String, secretKey: String, region: String,
                  service: String = "s3",
                  payloadHash: Option[String] = None,
                  addContentSha256: Boolean = true,
                  now: () => Instant = () => Instant.now())
    extends (HttpRequest.Builder => HttpRequest.Builder) with Serializable {
  import SigV4._

  override def apply(b: HttpRequest.Builder): HttpRequest.Builder = {
    val req = b.build()
    val t = now()
    val amzDate = AmzDateFmt.format(t.atOffset(ZoneOffset.UTC))
    val dateStamp = amzDate.take(8)
    val uri = req.uri()
    val host = uri.getHost +
      (if (uri.getPort > 0) s":${uri.getPort}" else "")
    val pHash = payloadHash.getOrElse("UNSIGNED-PAYLOAD")

    // headers to sign: everything on the request, plus host and the
    // ones this signer adds; lowercase names, trimmed values, sorted
    val fromReq: Seq[(String, String)] = {
      val m = req.headers().map()
      val it = m.entrySet().iterator()
      val buf = Seq.newBuilder[(String, String)]
      while (it.hasNext) {
        val e = it.next()
        val vs = e.getValue
        buf += e.getKey.toLowerCase -> (0 until vs.size())
          .map(i => vs.get(i).trim).mkString(",")
      }
      buf.result()
    }
    val added =
      Seq("host" -> host, "x-amz-date" -> amzDate) ++
        (if (addContentSha256) Seq("x-amz-content-sha256" -> pHash) else Nil)
    val headers = (fromReq ++ added).sortBy(_._1)
    val signedHeaders = headers.map(_._1).mkString(";")
    val canonicalHeaders = headers.map { case (k, v) => s"$k:$v\n" }.mkString

    val canonicalUri =
      if (uri.getRawPath == null || uri.getRawPath.isEmpty) "/"
      else uri.getRawPath
    // SigV4 canonical query: each key and value percent-decoded then
    // re-encoded with ONLY unreserved chars (A-Za-z0-9 -._~) literal,
    // sorted by encoded key then value. Idempotent for already-
    // canonical queries; normalizes '+', '/', '~', stray '=' etc.
    val canonicalQuery = Option(uri.getRawQuery).fold("") { q =>
      q.split("&").filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        val (k, v) = if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
        (uriEncode(pctDecode(k)), uriEncode(pctDecode(v)))
      }.sortBy(identity).map { case (k, v) => s"$k=$v" }.mkString("&")
    }

    val canonicalRequest = Seq(
      req.method(), canonicalUri, canonicalQuery,
      canonicalHeaders, signedHeaders, pHash).mkString("\n")

    val scope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      hex(sha256(canonicalRequest.getBytes(UTF_8)))).mkString("\n")

    val signature = hex(hmac(signingKey(secretKey, dateStamp, region, service),
      stringToSign))

    var out = b.header("x-amz-date", amzDate)
    if (addContentSha256) out = out.header("x-amz-content-sha256", pHash)
    out.header("Authorization",
      s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
        s"SignedHeaders=$signedHeaders, Signature=$signature")
  }
}

object SigV4 {
  def apply(accessKey: String, secretKey: String, region: String,
            service: String = "s3"): SigV4 =
    new SigV4(accessKey, secretKey, region, service)

  private val AmzDateFmt = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")

  /** The SigV4 key chain: HMAC("AWS4"+secret, date) → region →
    * service → "aws4_request".
    */
  private[graft] def signingKey(secret: String, dateStamp: String,
                               region: String, service: String): Array[Byte] =
    hmac(hmac(hmac(hmac(("AWS4" + secret).getBytes(UTF_8), dateStamp),
      region), service), "aws4_request")

  private[graft] def hmac(key: Array[Byte], msg: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(msg.getBytes(UTF_8))
  }

  private[graft] def sha256(bytes: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)

  private[graft] def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  /** SigV4's URI-encoding: unreserved chars (RFC 3986 §2.3) literal,
    * everything else %XX uppercase-hex per UTF-8 byte. Unlike HTML
    * form encoding, space is %20 (never '+').
    */
  private[graft] def uriEncode(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xFF).toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~')
        sb.append(c)
      else sb.append(f"%%${b & 0xFF}%02X")
    }
    sb.toString
  }

  /** Percent-decode %XX sequences only — '+' stays a literal plus
    * (query strings are RFC 3986, not HTML forms; URLDecoder would
    * corrupt it). Malformed escapes pass through untouched so a
    * non-canonical input still produces a deterministic signature.
    */
  private[graft] def pctDecode(s: String): String = {
    if (!s.contains('%')) return s
    val bytes = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        Character.digit(s.charAt(i + 1), 16) >= 0 &&
        Character.digit(s.charAt(i + 2), 16) >= 0) {
        bytes.write(Character.digit(s.charAt(i + 1), 16) * 16 +
          Character.digit(s.charAt(i + 2), 16))
        i += 3
      } else {
        val cb = UTF_8.encode(java.nio.CharBuffer.wrap(Array(c)))
        while (cb.hasRemaining) bytes.write(cb.get())
        i += 1
      }
    }
    new String(bytes.toByteArray, UTF_8)
  }
}
