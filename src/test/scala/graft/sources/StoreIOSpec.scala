package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The link-clone primitive every per-rep artifact clone rides
 * (BucketedUpsert.cloneTo, GcdIncremental.SnapshotStore.cloneTo, the
 * ANN/sketch RepClones): hard links must be observationally a deep
 * copy for write-new/retire-by-delete stores, and any failure of the
 * link path must DEGRADE to the byte copy, never fail the clone. */
class StoreIOSpec extends SparkSpec {

  private def writeTree(root: String): Unit = {
    Files.createDirectories(Paths.get(s"$root/a/b"))
    Files.writeString(Paths.get(s"$root/top.txt"), "top")
    Files.writeString(Paths.get(s"$root/a/one.txt"), "one")
    Files.writeString(Paths.get(s"$root/a/b/two.txt"), "two")
  }

  private def read(p: String): String =
    Files.readString(Paths.get(p))

  test("cloneDir link-clones a nested tree; mutating/deleting the " +
    "clone never disturbs the source") {
    val src = Scratch.dir("storeio_src")
    val dst = Scratch.dir("storeio_dst") + "/clone"
    writeTree(src)
    StoreIO.cloneDir(spark, src, dst)
    assert(read(s"$dst/top.txt") == "top")
    assert(read(s"$dst/a/one.txt") == "one")
    assert(read(s"$dst/a/b/two.txt") == "two")
    // hard links on a local FS: same inode, so no byte duplication...
    assert(Files.getAttribute(Paths.get(s"$dst/a/one.txt"),
      "unix:nlink").asInstanceOf[Int] >= 2)
    // ...but the store contract is write-new/retire-by-DELETE, and
    // unlinking one name must leave the other intact
    StoreIO.delete(spark, s"$dst/a")
    Files.writeString(Paths.get(s"$dst/top2.txt"), "clone-only")
    assert(read(s"$src/a/one.txt") == "one")
    assert(read(s"$src/a/b/two.txt") == "two")
    assert(!Files.exists(Paths.get(s"$src/top2.txt")))
  }

  test("cloneDir degrades to the byte copy when the link path fails " +
    "mid-walk (partial tree cleaned, clone complete)") {
    val src = Scratch.dir("storeio_fb_src")
    val dst = Scratch.dir("storeio_fb_dst") + "/clone"
    writeTree(src)
    // force a link failure: a conflicting regular file already at a
    // target path makes Files.createLink throw FileAlreadyExists
    // (an IOException), which must fall back to copyDir — after
    // cleaning whatever the link walk already created
    Files.createDirectories(Paths.get(s"$dst/a"))
    Files.writeString(Paths.get(s"$dst/a/one.txt"), "stale")
    StoreIO.cloneDir(spark, src, dst)
    assert(read(s"$dst/top.txt") == "top")
    assert(read(s"$dst/a/one.txt") == "one")
    assert(read(s"$dst/a/b/two.txt") == "two")
  }
}
