package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-rep artifact provisioning shared by the lifecycle gates (ANN
 * index, sketch store): LINK-CLONE a committed per-JVM template into a
 * fresh scratch root (StoreIO.cloneDir — artifact files are immutable:
 * maintenance appends new files and retires by rename/delete, so hard
 * links are observationally a fresh build at metadata cost) and keep
 * ONE live clone per gate — the previous rep's lazily-forced plan has
 * already run when the next rep provisions, so its clone is deleted
 * then (the AnnIndex deadRoots cadence). */
private[queries] object RepClones {
  private val last = scala.collection.mutable.Map.empty[String, String]

  def fresh(s: SparkSession, template: String, tag: String): String =
    last.synchronized {
      last.remove(tag).foreach(graft.sources.Scratch.deleteNow)
      val root = graft.sources.Scratch.dir(tag)
      graft.StageTimer.time(tag, "clone") {
        graft.sources.StoreIO.cloneDir(s, template, root)
      }
      last(tag) = root
      root
    }
}
