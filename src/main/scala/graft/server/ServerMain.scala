package graft.server

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.catalog.GraftCatalog

/** File-based bootstrap for the standalone REST server — the analogue of
  * the reference's config loading (`/root/reference/main.go:43-100`):
  * config path precedence is explicit argument > `$GRAFT_HOME/.graft.json`
  * > `~/.graft.json`, the served catalog is chosen by `default-catalog`
  * (default "default"), and `server.defaults` / `server.overrides` become
  * the GET /v1/config maps. JSON instead of YAML — json4s is already on
  * the Spark classpath; the shape mirrors `configs/.iceberg-go.yaml`:
  *
  * {{{
  * { "default-catalog": "default",
  *   "catalog": { "default": { "warehouse": "/path/to/wh" } },
  *   "server": { "defaults": {"k":"v"}, "overrides": {"k":"v"} },
  *   "host": "127.0.0.1", "port": 8080 }
  * }}}
  */
object ServerMain {

  final case class Config(
      defaultCatalog: String,
      catalogs: Map[String, Map[String, String]],
      defaults: Map[String, String],
      overrides: Map[String, String],
      host: String,
      port: Int)

  private val CfgFile = ".graft.json"

  /** Resolve the config path like `fromConfigFiles` (`main.go:83-90`). */
  def resolvePath(explicit: Option[String]): String =
    explicit.getOrElse {
      sys.env.get("GRAFT_HOME") match {
        case Some(dir) if dir.nonEmpty => Paths.get(dir, CfgFile).toString
        case _ => Paths.get(sys.props("user.home"), CfgFile).toString
      }
    }

  def load(path: String): Config = {
    val j = JsonMethods.parse(new String(Files.readAllBytes(Paths.get(path)), UTF_8))
    implicit val formats: Formats = DefaultFormats
    def strMap(v: JValue): Map[String, String] =
      v.toOption.map(_.extract[Map[String, String]]).getOrElse(Map.empty)
    Config(
      defaultCatalog = (j \ "default-catalog").extractOpt[String].getOrElse("default"),
      catalogs = (j \ "catalog").toOption
        .map(_.extract[Map[String, Map[String, String]]]).getOrElse(Map.empty),
      defaults = strMap(j \ "server" \ "defaults"),
      overrides = strMap(j \ "server" \ "overrides"),
      host = (j \ "host").extractOpt[String].getOrElse("127.0.0.1"),
      port = (j \ "port").extractOpt[Int].getOrElse(8080))
  }

  /** Build the catalog named by `default-catalog` and serve it. Returns
    * (server, boundPort) so tests can drive a full lifecycle. */
  def startFromConfig(cfg: Config, portOverride: Option[Int] = None): (RestServer, Int) = {
    val props = cfg.catalogs.getOrElse(cfg.defaultCatalog,
      throw new IllegalArgumentException(s"catalog ${cfg.defaultCatalog} not found"))
    val opts = new java.util.HashMap[String, String]()
    props.foreach { case (k, v) => opts.put(k, v) }
    cfg.defaults.foreach { case (k, v) => opts.put(s"defaults.$k", v) }
    cfg.overrides.foreach { case (k, v) => opts.put(s"overrides.$k", v) }
    val catalog = new GraftCatalog
    catalog.initialize(cfg.defaultCatalog,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts))
    val server = new RestServer(catalog, portOverride.getOrElse(cfg.port), cfg.host)
    val bound = server.start()
    (server, bound)
  }

  def main(args: Array[String]): Unit = {
    val path = resolvePath(args.headOption)
    val (_, port) = startFromConfig(load(path))
    println(s"graft REST catalog serving on port $port")
    Thread.currentThread().join() // serve until killed, like the reference
  }
}
