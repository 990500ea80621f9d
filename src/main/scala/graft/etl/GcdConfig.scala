package graft.etl

import java.io.{FileInputStream, InputStream}
import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml
import GcdSchemas.GcdFlags

/**
 * S5 (SURVEY.md §2.1): the YAML config source. Same document shape as the
 * reference's `example.yml` / `GcdConfiguration` bean (reference
 * Main.java:62-64, GcdConfiguration.java:3-18, Gcdatabase.java:4-47):
 *
 * {{{
 * gcdatabase:
 *   url: jdbc:mysql://HOST/DATABASE          # or a tables directory
 *   user: USERNAME
 *   password: PASSWORD
 *   gcdSchema:                               # optional capability flags
 *     publicationType: true
 *     volumeNotPrinted: true
 *     seriesIsSingleton: true
 *     storyFirstLine: true
 *     storyCredit: true
 * }}}
 *
 * `url` may be a `jdbc:` URL (read via spark.read.jdbc) or a local/dfs
 * directory of per-table parquet files — the engine's contract starts at
 * "tables available" (SURVEY.md §3 E3).
 */
final case class GcdConfig(url: String, user: Option[String],
    password: Option[String], flags: GcdFlags)

object GcdConfig {

  def load(path: String): GcdConfig = {
    val in = new FileInputStream(path)
    try load(in) finally in.close()
  }

  def load(in: InputStream): GcdConfig = {
    val root = new Yaml().load[java.util.Map[String, Object]](in)
      .asScala
    val db = root.get("gcdatabase") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asInstanceOf[java.util.Map[String, Object]].asScala
      case _ => throw new IllegalArgumentException(
        "config missing 'gcdatabase' section")
    }
    def str(k: String): Option[String] =
      db.get(k).map(_.toString)
    val flags = db.get("gcdSchema") match {
      case Some(m: java.util.Map[_, _]) =>
        val f = m.asInstanceOf[java.util.Map[String, Object]].asScala
        def b(k: String): Boolean =
          f.get(k).forall(_.toString.toBoolean) // absent → true (reference default)
        GcdFlags(b("publicationType"), b("volumeNotPrinted"),
          b("seriesIsSingleton"), b("storyFirstLine"), b("storyCredit"))
      case _ => GcdFlags()
    }
    GcdConfig(
      str("url").getOrElse(throw new IllegalArgumentException(
        "gcdatabase.url is required")),
      str("user"), str("password"), flags)
  }
}
