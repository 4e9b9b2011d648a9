package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** CodeFp's contract is runner-independence: the same class content
  * digests identically through a jar or a classes directory, and the
  * jar path is resolved through URI→File, not URLDecoder (r19 ADVICE:
  * form-urlencoding rules turn '+' into a space, and '+' is common in
  * ivy/sbt cache paths — a mangled path degraded the fingerprint to
  * "unknown" exactly where comparability mattered).
  */
class CodeFpSpec extends AnyFunSuite {

  private val classBytes = Array.tabulate[Byte](64)(i => (i * 7).toByte)

  private def writeJar(path: java.nio.file.Path): Unit = {
    val out = new java.util.jar.JarOutputStream(
      java.nio.file.Files.newOutputStream(path))
    try {
      out.putNextEntry(new java.util.jar.JarEntry("graft/SparkEntry.class"))
      out.write(classBytes)
      out.closeEntry()
    } finally out.close()
  }

  private def fpOfJar(jar: java.nio.file.Path): String = {
    val cl = new java.net.URLClassLoader(Array(jar.toUri.toURL), null)
    try CodeFp.fingerprint(cl) finally cl.close()
  }

  test("a jar under a '+'-bearing directory fingerprints, and matches the plain-path jar") {
    val base = java.nio.file.Files.createTempDirectory("codefp")
    val plusDir = base.resolve("scala-2.13+cache")
    java.nio.file.Files.createDirectories(plusDir)
    val plain = base.resolve("code.jar")
    val plussed = plusDir.resolve("code.jar")
    try {
      writeJar(plain); writeJar(plussed)
      val fpPlain = fpOfJar(plain)
      val fpPlus = fpOfJar(plussed)
      assert(fpPlain != "unknown")
      // same content, different container location -> same fingerprint
      assert(fpPlus == fpPlain)
    } finally {
      java.nio.file.Files.deleteIfExists(plain)
      java.nio.file.Files.deleteIfExists(plussed)
      java.nio.file.Files.deleteIfExists(plusDir)
      java.nio.file.Files.deleteIfExists(base)
      ()
    }
  }

  test("a classes DIRECTORY with the same relative paths and bytes matches the jar") {
    val base = java.nio.file.Files.createTempDirectory("codefp-dir")
    val pkg = base.resolve("graft")
    java.nio.file.Files.createDirectories(pkg)
    val cls = pkg.resolve("SparkEntry.class")
    val jar = base.resolve("same.jar")
    try {
      java.nio.file.Files.write(cls, classBytes)
      writeJar(jar)
      val dirCl = new java.net.URLClassLoader(Array(base.toUri.toURL), null)
      val fpDir = try CodeFp.fingerprint(dirCl) finally dirCl.close()
      assert(fpDir != "unknown")
      assert(fpDir == fpOfJar(jar)) // the runner-independence pin
    } finally {
      java.nio.file.Files.deleteIfExists(cls)
      java.nio.file.Files.deleteIfExists(pkg)
      java.nio.file.Files.deleteIfExists(jar)
      java.nio.file.Files.deleteIfExists(base)
      ()
    }
  }
}
