package graft.sources

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import java.io.ByteArrayInputStream

/** Minimal XML tree built on the JDK's StAX pull parser — no external
  * dependency. Event/station documents are small (KB–MB per file); the
  * 100 TB scale axis is file count, parallelized by Spark partitions,
  * so a per-file DOM-style tree keeps extraction code readable without
  * a memory hazard.
  *
  * External entities and DTDs are disabled (untrusted input).
  */
final case class XNode(
    name: String,
    attrs: Map[String, String],
    children: Vector[XNode],
    text: String) {

  /** First child with the given local name. */
  def \(child: String): Option[XNode] = children.find(_.name == child)

  /** All children with the given local name. */
  def \\(child: String): Vector[XNode] = children.filter(_.name == child)

  /** All descendant elements with the given local name, document order
    * (the tree-walk behind the reference's `get_instances_from_tree`).
    */
  def descendants(name: String): Vector[XNode] =
    children.flatMap { c =>
      (if (c.name == name) Vector(c) else Vector.empty) ++ c.descendants(name)
    }

  /** Text of a child path, e.g. `node.textAt("time", "value")`. */
  def textAt(path: String*): Option[String] = {
    var cur: Option[XNode] = Some(this)
    path.foreach(p => cur = cur.flatMap(_ \ p))
    cur.map(_.text.trim).filter(_.nonEmpty)
  }

  def doubleAt(path: String*): Option[Double] =
    textAt(path: _*).flatMap(s => scala.util.Try(s.toDouble).toOption)

  def attr(name: String): Option[String] = attrs.get(name)
}

object Xml {

  private def newFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    f
  }

  /** Parse a full document into a tree; throws on malformed input
    * (callers decide permissive vs strict).
    */
  def parse(bytes: Array[Byte]): XNode = {
    val r = newFactory().createXMLStreamReader(new ByteArrayInputStream(bytes))
    try {
      while (r.next() != XMLStreamConstants.START_ELEMENT) {}
      readElement(r)
    } finally r.close()
  }

  def parse(s: String): XNode = parse(s.getBytes("UTF-8"))

  /** Reads the element the reader is positioned on (START_ELEMENT),
    * consuming through its END_ELEMENT.
    */
  private def readElement(r: javax.xml.stream.XMLStreamReader): XNode = {
    val name = r.getLocalName
    val attrs = (0 until r.getAttributeCount)
      .map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i)).toMap
    val children = Vector.newBuilder[XNode]
    val text = new StringBuilder
    var done = false
    while (!done) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => children += readElement(r)
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => done = true
        case XMLStreamConstants.END_DOCUMENT =>
          throw new IllegalStateException(s"unclosed element <$name>")
        case _ => ()
      }
    }
    XNode(name, attrs, children.result(), text.toString)
  }

  /** Escape a string for use in XML text or attribute content. */
  def escape(s: String): String = {
    val b = new StringBuilder(s.length)
    s.foreach {
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '&' => b.append("&amp;")
      case '"' => b.append("&quot;")
      case '\'' => b.append("&apos;")
      case c => b.append(c)
    }
    b.toString
  }

  /** ISO-8601 UTC instant (optional fractional seconds to ns, optional
    * trailing Z) → epoch nanoseconds. The reference keeps all times as
    * int64 epoch-ns (obsplus `utils/time.py:128-226`); QuakeML carries
    * them as ISO strings.
    */
  def isoToNs(s: String): Option[Long] = {
    val t = s.trim
    // an explicit zone is 'Z', '+hh:mm', or '-hh:mm' — the '-' search
    // starts past the date part (hyphens at 4 and 7) so calendar
    // hyphens don't read as a negative offset
    val hasZone = t.endsWith("Z") || t.indexOf('+', 10) >= 0 || t.indexOf('-', 10) >= 0
    val withZone = if (hasZone) t else t + "Z"
    scala.util.Try {
      val inst = java.time.OffsetDateTime.parse(withZone).toInstant
      Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000000L),
        inst.getNano.toLong)
    }.toOption
  }

  /** Epoch nanoseconds → ISO-8601 UTC with 9-digit fraction (lossless
    * round trip through [[isoToNs]]).
    */
  def nsToIso(ns: Long): String = {
    val sec = Math.floorDiv(ns, 1000000000L)
    val nano = Math.floorMod(ns, 1000000000L)
    val inst = java.time.Instant.ofEpochSecond(sec, nano)
    val base = java.time.format.DateTimeFormatter
      .ofPattern("uuuu-MM-dd'T'HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC).format(inst)
    f"$base.$nano%09dZ"
  }
}
