package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Every reference citation in `src/main` (`src/<file>.ts:N[-M]` or the
  * `/root/reference/src/...` long form) must resolve to a file that
  * actually exists in the reference checkout, and every cited line
  * number must be within that file. Exists because round 9 shipped
  * three doc-comments anchored to files (`embeddings.ts`, `store.ts`)
  * and lines (`index.ts:131-149` of a 119-line file) that do not exist
  * — in a repo whose correctness story is auditability, an invented
  * anchor is a defect even when the surrounding claim is sound. This
  * spec makes the next one fail CI instead of shipping.
  */
class CitationSpec extends AnyFunSuite {

  private val refSrc = Paths.get("/root/reference/src")
  private val mainSrc = Paths.get("src/main/scala")

  // src/<name>.<ext> optionally followed by :N, :N-M, or :N,M,K-L
  private val cite =
    """src/([A-Za-z0-9_\-]+\.(?:ts|html|css))((?::\d+(?:-\d+)?(?:,\d+(?:-\d+)?)*)?)""".r

  private def scalaFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala.filter(_.toString.endsWith(".scala")).toSeq

  test("all reference citations in src/main resolve to real files and lines") {
    assume(Files.isDirectory(refSrc), "reference checkout not present")
    val lineCounts = scala.collection.mutable.Map.empty[String, Long]
    def linesOf(name: String): Long =
      lineCounts.getOrElseUpdate(name, Files.lines(refSrc.resolve(name)).count())

    val bad = scala.collection.mutable.ListBuffer.empty[String]
    var found = 0
    for (f <- scalaFiles(mainSrc); (line, ln) <- Files.readAllLines(f).asScala.zipWithIndex) {
      for (m <- cite.findAllMatchIn(line)) {
        found += 1
        val name = m.group(1)
        val where = s"$f:${ln + 1} cites ${m.matched}"
        if (!Files.exists(refSrc.resolve(name))) bad += s"$where — no such reference file"
        else {
          val max = linesOf(name)
          val nums = Option(m.group(2)).getOrElse("").split("[:,\\-]").filter(_.nonEmpty)
          for (n <- nums if n.toLong > max)
            bad += s"$where — line $n beyond $name's $max lines"
        }
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
    // guard against the regex silently matching nothing (vacuous pass)
    assert(found > 50, s"only $found citations found — scanner broken?")
  }
}
