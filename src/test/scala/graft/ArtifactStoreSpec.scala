package graft

import graft.core.ArtifactStore
import org.scalatest.funsuite.AnyFunSuite

/** Pointer semantics of the versioned artifact store — no Spark needed:
  * unbuilt detection, publish-then-flip atomicity surface, cross-call
  * build-once, and old-version survival after republish.
  */
class ArtifactStoreSpec extends AnyFunSuite {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("store").toString + "/artifact"

  test("current: missing dir, missing pointer, dangling pointer are all unbuilt") {
    val dir = freshDir()
    assert(ArtifactStore.current(dir).isEmpty)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    assert(ArtifactStore.current(dir).isEmpty)
    // a pointer naming a version that does not exist must not resolve
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "CURRENT"), "v_gone")
    assert(ArtifactStore.current(dir).isEmpty)
  }

  test("publish flips the pointer; republish leaves the old version on disk") {
    val dir = freshDir()
    val v1 = ArtifactStore.publish(dir) { target =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(target))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(target, "a"), "1")
    }
    assert(ArtifactStore.current(dir).contains(v1))
    val v2 = ArtifactStore.publish(dir) { target =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(target))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(target, "a"), "2")
    }
    assert(v2 !== v1)
    assert(ArtifactStore.current(dir).contains(v2))
    // a reader that resolved v1 before the flip still has intact files
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(v1, "a")) === "1")
  }

  test("ensure builds exactly once across calls") {
    val dir = freshDir()
    var builds = 0
    def build(target: String): Unit = {
      builds += 1
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(target))
    }
    val p1 = ArtifactStore.ensure(dir)(build)
    val p2 = ArtifactStore.ensure(dir)(build)
    assert(builds === 1 && p1 === p2)
  }

  test("a failed build leaves the artifact unbuilt — no half-published version") {
    val dir = freshDir()
    intercept[RuntimeException] {
      ArtifactStore.publish(dir) { _ => throw new RuntimeException("build died") }
    }
    assert(ArtifactStore.current(dir).isEmpty,
      "pointer must not move when the build throws")
  }
}
