package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE registered query end-to-end (setup thunk + run +
 * bench forcing) with a SparkListener that records every JOB — wall,
 * description — plus the GAPS between jobs (driver-side work: planning,
 * commit protocol, FS metadata). The output attributes a gate's cost to
 * job execution vs driver think-time, which the stage walls alone
 * cannot. Usage: runMain graft.tools.JobProfile <name> [sfDir] [reps]. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val b0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    // ad-hoc A/B knobs: -Dgraft.profile.conf=k=v,k=v
    val spark = sys.props.get("graft.profile.conf").toSeq
      .flatMap(_.split(",")).map(_.split("=", 2))
      .foldLeft(b0)((b, kv) => b.config(kv(0), kv(1)))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, (js.time, desc)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, desc) =>
          done.add((je.jobId, t0, je.time, desc)); ()
        }
      }
    })
    val q = graft.SparkEntry.registry.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name"))
    q.setup.foreach { f =>
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      done.clear()
      val t0 = System.nanoTime()
      f(ss, dir)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val js = done.asScala.toSeq.sortBy(_._2)
      val jobWall = js.map(j => j._3 - j._2).sum / 1e3
      println(f"== setup done in $wall%.3f s, ${js.size} jobs, " +
        f"job-exec $jobWall%.3f s, driver-gap ${wall - jobWall}%.3f s")
      js.filter(j => j._3 - j._2 > 150).foreach { case (id, t0j, t1, desc) =>
        println(f"   setup job $id%4d ${(t1 - t0j) / 1e3}%7.3f s  ${desc.take(90)}")
      }
    }
    (1 to reps).foreach { i =>
      done.clear()
      val t0 = System.nanoTime()
      graft.Bench.force(q.run(spark, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      // settle listener events
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      val js = done.asScala.toSeq.sortBy(_._2)
      val jobWall = js.map(j => j._3 - j._2).sum / 1e3
      println(f"== $name rep $i: wall $wall%.3f s, ${js.size} jobs, " +
        f"job-exec $jobWall%.3f s, driver-gap ${wall - jobWall}%.3f s")
      if (i == reps) js.foreach { case (id, t0j, t1, desc) =>
        println(f"   job $id%4d ${(t1 - t0j) / 1e3}%7.3f s  ${desc.take(90)}")
      }
    }
    if (graft.StageTimer.json != "{}")
      println(s"== stages (last rep): ${graft.StageTimer.json}")
    spark.stop()
  }
}
