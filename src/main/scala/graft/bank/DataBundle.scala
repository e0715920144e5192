package graft.bank

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** Named, hash-verified data bundles — the reference's dataset
  * distribution surface (`datasets/dataset.py:48-620`, sha256 hashing
  * `utils/misc.py:437-504`) re-expressed for this engine: a bundle is
  * a directory holding bank data (`waveforms/`, `events/`,
  * `stations/`) plus a sha256 manifest and a version stamp. Loading a
  * registered bundle resolves the cache directory, runs the fetch
  * hook once (the offline counterpart of the reference's per-type
  * downloaders), verifies every manifest hash, and hands back the
  * three query clients.
  *
  * Scale note: hashing walks files on the driver — bundles are
  * fixture/benchmark-sized by definition (the reference ships test
  * datasets this way). Production-scale tables get integrity from the
  * [[TxTable]] commit log instead; a bundle is how a *small named
  * dataset* travels between environments reproducibly.
  */
object DataBundle {

  /** A registered bundle: `fetch` materializes the content into the
    * cache directory on first load (or after a version change) — the
    * "download" hook, which offline deployments point at a local
    * source tree and online ones at whatever transport they use.
    */
  final case class BundleSpec(name: String, version: String,
                              fetch: Path => Unit) {
    require(name.nonEmpty && name == name.toLowerCase,
      s"bundle name must be non-empty lowercase, got '$name'")
    require(version.matches("""\d+\.\d+\.\d+"""),
      s"bundle version must be MAJOR.MINOR.PATCH, got '$version'")
  }

  /** The loaded clients. A side whose subdirectory the bundle doesn't
    * ship is None (the reference warns and returns None likewise).
    */
  final case class LoadedBundle(name: String, version: String, path: String,
                                waveBank: Option[WaveBank],
                                eventBank: Option[EventBank],
                                stationBank: Option[graft.stations.StationBank])

  val ManifestFile = "bundle_manifest.json"
  val VersionFile = "bundle_version.txt"
  private val HashExcludes = Set(ManifestFile, VersionFile, "readme.txt")

  private val registry = TrieMap.empty[String, BundleSpec]

  /** Register a bundle under its (lowercase) name — the counterpart of
    * the reference's subclass/entry-point discovery. Last write wins,
    * so tests can re-register.
    */
  def register(spec: BundleSpec): Unit = registry.put(spec.name, spec)

  def registered: Seq[String] = registry.keys.toSeq.sorted

  /** Cache root resolution, mirroring the reference's priority order:
    * explicit argument > GRAFT_DATA_PATH env > ~/.graft-data.
    */
  def resolveBase(explicit: Option[String]): Path =
    Paths.get(explicit
      .orElse(sys.env.get("GRAFT_DATA_PATH"))
      .getOrElse(sys.props("user.home") + "/.graft-data"))

  /** Load a registered bundle: fetch into the cache if absent or if
    * the cached version differs, then verify every manifest hash and
    * construct the clients. Hash mismatches fail loudly with the full
    * list — silent corruption is the one thing a bundle must never
    * pass through.
    */
  def load(spark: SparkSession, name: String,
           basePath: Option[String] = None): LoadedBundle = {
    val spec = registry.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(
        s"unknown bundle '$name'; registered: ${registered.mkString(", ")}"))
    val dir = resolveBase(basePath).resolve(spec.name)
    Files.createDirectories(dir)
    val cachedVersion = {
      val vf = dir.resolve(VersionFile)
      if (Files.exists(vf)) Files.readString(vf).trim else ""
    }
    if (cachedVersion != spec.version) {
      // refetch starts from an empty directory: leftovers from the
      // previous version would otherwise be hashed into the new
      // manifest as if they were shipped content
      clearDir(dir)
      spec.fetch(dir)
      Files.writeString(dir.resolve(VersionFile), spec.version)
      writeManifest(dir)
    }
    val bad = verify(dir)
    require(bad.isEmpty,
      s"bundle '${spec.name}' failed hash verification: ${bad.mkString(", ")}")
    def sub(s: String): Option[String] = {
      val p = dir.resolve(s)
      if (Files.isDirectory(p)) Some(p.toString) else None
    }
    LoadedBundle(spec.name, spec.version, dir.toString,
      sub("waveforms").map(new WaveBank(spark, _)),
      sub("events").map(new EventBank(spark, _)),
      sub("stations").map(p =>
        new graft.stations.StationBank(spark.read.parquet(p))))
  }

  /** sha256 of every regular file under `dir` (relative path → hex),
    * excluding the manifest/version/readme bookkeeping — the
    * reference's `hash_directory`.
    */
  def hashDirectory(dir: Path): Map[String, String] = {
    val walk = Files.walk(dir)
    try walk.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        !HashExcludes.contains(p.getFileName.toString))
      .map(p => dir.relativize(p).toString -> sha256(p))
      .toMap
    finally walk.close()
  }

  /** Write the manifest for the bundle content currently in `dir`. */
  def writeManifest(dir: Path): Unit = {
    val entries = hashDirectory(dir).toSeq.sorted
      .map { case (p, h) => s"""  "${escape(p)}": "$h"""" }
    Files.writeString(dir.resolve(ManifestFile),
      entries.mkString("{\n", ",\n", "\n}\n"))
  }

  /** Relative paths whose content no longer matches the manifest
    * (changed or deleted). Files NOT in the manifest are ignored —
    * banks legitimately add index/checkpoint files next to shipped
    * data, exactly like the reference's post-download artifacts.
    */
  def verify(dir: Path): Seq[String] = {
    val mf = dir.resolve(ManifestFile)
    if (!Files.exists(mf)) return Seq(s"missing $ManifestFile")
    val expected = parseManifest(Files.readString(mf))
    expected.toSeq.sortBy(_._1).collect {
      case (rel, h)
        if !Files.exists(dir.resolve(rel)) => s"$rel (deleted)"
      case (rel, h)
        if sha256(dir.resolve(rel)) != h => s"$rel (hash changed)"
    }
  }

  /** Copy a verified bundle directory to `dest` and re-verify there —
    * the reference's `copy_dataset`.
    */
  def copyTo(bundleDir: Path, dest: Path): Unit = {
    require(verify(bundleDir).isEmpty,
      s"refusing to copy unverified bundle at $bundleDir")
    val walk = Files.walk(bundleDir)
    try walk.iterator().asScala.foreach { p =>
      val t = dest.resolve(bundleDir.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else {
        Files.createDirectories(t.getParent)
        Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally walk.close()
    val bad = verify(dest)
    require(bad.isEmpty, s"copy to $dest corrupted: ${bad.mkString(", ")}")
  }

  private def clearDir(dir: Path): Unit = {
    val walk = Files.walk(dir)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.filter(_ != dir).foreach(Files.delete)
    finally walk.close()
  }

  private def sha256(p: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = Files.newInputStream(p)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Minimal parser for the flat string→string JSON object the
    * manifest writer emits (keys are escaped relative paths).
    */
  private def parseManifest(json: String): Map[String, String] = {
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"([0-9a-f]{64})"""".r
    entry.findAllMatchIn(json).map { m =>
      m.group(1).replace("\\\"", "\"").replace("\\\\", "\\") -> m.group(2)
    }.toMap
  }
}
