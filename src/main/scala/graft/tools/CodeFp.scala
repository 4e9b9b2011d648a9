package graft.tools

/** Canonical code fingerprint: MD5 over the graft build's .class
  * files — each entry's RELATIVE path then its bytes, in sorted
  * relative-path order — truncated to 6 bytes hex.
  *
  * Runner-independence is the whole point (r19): sbt's forked `run`
  * executes the project from a PACKAGED JAR under `target/bg-jobs/`,
  * while a plain `java -cp classes` run executes the directory — the
  * pre-r19 fingerprint hashed whatever the protection domain pointed
  * at (the jar's raw bytes under sbt, the dir walk under java), so
  * the same code produced different fingerprints per runner and a
  * PairedBench record could never match the sweep history. This form
  * hashes the class CONTENT identically through either container:
  * jar entries and directory files with the same relative paths and
  * bytes digest the same.
  *
  * The root is resolved through the classloader's own resolution of
  * `graft/SparkEntry.class`, so under a mixed classpath (PairedBench
  * old-side runs) it fingerprints the build that actually serves the
  * graft classes.
  */
object CodeFp {
  def fingerprint(cl: ClassLoader): String = try {
    val url = cl.getResource("graft/SparkEntry.class")
    val md = java.security.MessageDigest.getInstance("MD5")
    url.getProtocol match {
      case "jar" =>
        // getPath is file:/abs/path.jar!/graft/SparkEntry.class — the part
        // before '!' is itself a file: URI. Resolve it through URI→File
        // (not URLDecoder, whose application/x-www-form-urlencoded rules
        // turn '+' into a space — '+' is common in ivy/sbt cache paths and
        // a mangled path would degrade the fingerprint to "unknown")
        val jarPath = new java.io.File(
          new java.net.URI(url.getPath.takeWhile(_ != '!')))
        val jf = new java.util.jar.JarFile(jarPath)
        try {
          val entries = scala.jdk.CollectionConverters
            .EnumerationHasAsScala(jf.entries()).asScala
            .filter(e => !e.isDirectory && e.getName.endsWith(".class"))
            .toSeq.sortBy(_.getName)
          for (e <- entries) {
            md.update(e.getName.getBytes("UTF-8"))
            val in = jf.getInputStream(e)
            try md.update(in.readAllBytes()) finally in.close()
          }
        } finally jf.close()
      case _ =>
        val root = new java.io.File(url.toURI).getParentFile.getParentFile
        val base = root.toPath
        def collect(f: java.io.File): Seq[java.io.File] = {
          val cs = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          cs.filter(_.isDirectory).toSeq.flatMap(collect) ++
            cs.filter(c => c.isFile && c.getName.endsWith(".class")).toSeq
        }
        val files = collect(root)
          .map(c => base.relativize(c.toPath).toString.replace('\\', '/') -> c)
          .sortBy(_._1)
        for ((rel, c) <- files) {
          md.update(rel.getBytes("UTF-8"))
          md.update(java.nio.file.Files.readAllBytes(c.toPath))
        }
    }
    md.digest().take(6).map("%02x".format(_)).mkString
  } catch { case scala.util.control.NonFatal(_) => "unknown" }
}
