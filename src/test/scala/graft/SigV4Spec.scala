package graft

import graft.bank.SigV4
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.HttpRequest
import java.time.Instant

/** SigV4 against the published AWS documentation example (the
  * GET-ListUsers vector from the "Signature Version 4 signing
  * process" guide): the derived signing key, the canonical-request
  * hash, and the final Authorization header are pinned byte-for-byte.
  * Then the signer is raced through the HTTP claim store against an
  * in-process object store that enforces the auth surface per request.
  */
class SigV4Spec extends AnyFunSuite {

  // --- the documented example's inputs (public test vector) ---
  private val AccessKey = "AKIDEXAMPLE"
  private val SecretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
  private val VectorInstant = Instant.parse("2015-08-30T12:36:00Z")

  test("signing key chain matches the published derivation vector") {
    val k = SigV4.signingKey(SecretKey, "20150830", "us-east-1", "iam")
    assert(SigV4.hex(k) ==
      "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9")
  }

  test("full request signature matches the published example vector") {
    val signer = new SigV4(AccessKey, SecretKey, "us-east-1", service = "iam",
      payloadHash = Some(SigV4.hex(SigV4.sha256(Array.emptyByteArray))),
      addContentSha256 = false,
      now = () => VectorInstant)
    val b = HttpRequest.newBuilder(
      URI.create("https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"))
      .header("Content-Type", "application/x-www-form-urlencoded; charset=utf-8")
      .GET()
    val req = signer(b).build()
    assert(req.headers().firstValue("x-amz-date").get() == "20150830T123600Z")
    assert(req.headers().firstValue("Authorization").get() ==
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("signature responds to every canonical-request ingredient") {
    def sigOf(uri: String, method: String = "PUT",
              extra: Option[(String, String)] = None): String = {
      val b = HttpRequest.newBuilder(URI.create(uri))
      val b2 = extra.fold(b) { case (k, v) => b.header(k, v) }
      val b3 = if (method == "PUT")
        b2.PUT(HttpRequest.BodyPublishers.ofString("x")) else b2.GET()
      val signer = new SigV4(AccessKey, SecretKey, "us-east-1",
        now = () => VectorInstant)
      signer(b3).build().headers().firstValue("Authorization").get()
        .split("Signature=").last
    }
    val base = sigOf("https://b.s3.amazonaws.com/k/v1.json")
    assert(base != sigOf("https://b.s3.amazonaws.com/k/v2.json"), "path")
    assert(base != sigOf("https://b.s3.amazonaws.com/k/v1.json", "GET"), "method")
    assert(base != sigOf("https://b.s3.amazonaws.com/k/v1.json",
      extra = Some("If-None-Match" -> "*")), "conditional header is signed")
    assert(base == sigOf("https://b.s3.amazonaws.com/k/v1.json"), "deterministic")
  }

  test("canonical query string is SigV4 percent-encoded (keys and values)") {
    // unreserved chars stay literal; everything else %XX upper hex; '+'
    // is a literal plus in RFC 3986 queries, never a space
    assert(SigV4.uriEncode("AZaz09-._~") == "AZaz09-._~")
    assert(SigV4.uriEncode("a+b/c=d e") == "a%2Bb%2Fc%3Dd%20e")
    assert(SigV4.uriEncode("é") == "%C3%A9")
    assert(SigV4.pctDecode("a%2Bb+c%7E") == "a+b+c~")
    assert(SigV4.pctDecode("bad%zz%2") == "bad%zz%2", "malformed escapes pass through")

    def sigOf(uri: String): String = {
      val signer = new SigV4(AccessKey, SecretKey, "us-east-1",
        now = () => VectorInstant)
      signer(HttpRequest.newBuilder(URI.create(uri)).GET()).build()
        .headers().firstValue("Authorization").get().split("Signature=").last
    }
    // pre-encoded and equivalently-decodable raw forms sign identically:
    // %7E (tilde) must normalize to the unreserved literal '~'
    assert(sigOf("https://b.s3.amazonaws.com/k?prefix=a%7Eb") ==
      sigOf("https://b.s3.amazonaws.com/k?prefix=a~b"))
    // a value needing encoding ('/' in a prefix) changes the signature
    // vs its sibling — i.e. it is actually part of the canonical form
    assert(sigOf("https://b.s3.amazonaws.com/k?prefix=x%2Fy") !=
      sigOf("https://b.s3.amazonaws.com/k?prefix=xy"))
    // the documented vector query still canonicalizes unchanged
    assert(sigOf("https://b.s3.amazonaws.com/?Action=ListUsers&Version=2010-05-08")
      .nonEmpty)
  }

  test("claim store + SigV4: racing writers, signed conditional puts, one winner") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val lock = new Object
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    @volatile var authFailures = List.empty[String]
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        ex.getRequestBody.readAllBytes()
        val h = ex.getRequestHeaders
        def one(name: String): Option[String] = {
          val vs = h.get(name)
          if (vs == null || vs.size() != 1) None else Some(vs.get(0))
        }
        // the server-side auth surface a real store enforces
        val auth = one("Authorization")
        val ok = auth.exists(_.startsWith(
          s"AWS4-HMAC-SHA256 Credential=$AccessKey/")) &&
          auth.exists(_.contains("SignedHeaders=")) &&
          auth.exists(a => a.contains("host") && a.contains("x-amz-date")) &&
          auth.exists(_.split("Signature=").last.matches("[0-9a-f]{64}")) &&
          one("x-amz-date").exists(_.matches("\\d{8}T\\d{6}Z")) &&
          one("x-amz-content-sha256").contains("UNSIGNED-PAYLOAD") &&
          // the conditional header must be COVERED by the signature
          (!h.containsKey("If-None-Match") ||
            auth.exists(_.contains("if-none-match")))
        if (!ok) {
          authFailures ::= h.entrySet().toString
          ex.sendResponseHeaders(403, -1); return
        }
        val key = ex.getRequestURI.getPath
        val conditional = one("If-None-Match").contains("*")
        val status = lock.synchronized {
          if (conditional && !seen.add(key)) 412 else { seen.add(key); 200 }
        }
        ex.sendResponseHeaders(status, -1)
      } finally ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try {
      val ep = new URI(s"http://127.0.0.1:${server.getAddress.getPort}")
      val mk = () => new graft.bank.HttpConditionalPutClaimStore(ep,
        sign = new SigV4(AccessKey, SecretKey, "us-east-1"))
      // 8 writers race the same version key through real signed HTTP
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val target = new Path("/claims/7.json")
        val wins = (0 until 8).map { i =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            override def call(): Boolean =
              mk().putIfAbsent(target, s"writer$i".getBytes)
          })
        }.count(_.get())
        assert(wins == 1, s"exactly one signed writer may win, got $wins")
        assert(authFailures.isEmpty, authFailures.mkString("\n"))
        // unconditional signed put succeeds on the existing key
        mk().put(target, "checkpoint".getBytes)
      } finally pool.shutdown()
    } finally server.stop(0)
  }
}
