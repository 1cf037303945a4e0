package graft.config

import scala.jdk.CollectionConverters._

/** Pipeline configuration, mirroring the reference's YAML model
  * (`/root/reference/config/config.go:11-37`) with one deliberate fix:
  * column order is deterministic (sorted by target column name) instead of
  * Go-map-iteration order (`config.go:31-37` is nondeterministic across
  * runs; see SURVEY §1.3).
  *
  * @param logFormat        nginx `log_format` template (`config.go:20`)
  * @param logTimeFormat    Go reference-time layout for `$time_local`
  *                         (`config.go:19`)
  * @param customCasts      target-type overrides by LOG FIELD name
  *                         (`config.go:17`, applied before native types —
  *                         `caster.go:76-113`)
  * @param customCastsEnable gate for customCasts (`config.go:24`)
  * @param removeHyphen     `-`→`""` normalization flag. The reference
  *                         plumbs it but never reads it (always-on,
  *                         `caster.go:72-75`); we honor it, defaulting true.
  * @param columns          target column → source log-field alias
  *                         (`config.go:27`)
  * @param logsTable        insert-target table name (`config.go:28`)
  * @param emptyTimePolicy  what an empty/`-` Date/DateTime value becomes:
  *                         reference semantics are wall-clock `now()`
  *                         (`caster.go:293-296`, nondeterministic); `Null`
  *                         is the oracle-checkable policy (SURVEY §1.2).
  */
final case class GraftConfig(
    logFormat: String,
    logTimeFormat: String = "02/Jan/2006:15:04:05 -0700",
    customCasts: Map[String, String] = Map.empty,
    customCastsEnable: Boolean = true,
    removeHyphen: Boolean = true,
    columns: Map[String, String] = Map.empty,
    logsTable: String = "access_log",
    emptyTimePolicy: EmptyTimePolicy = EmptyTimePolicy.Null
) {
  /** Deterministic column order (fixes `config.go:31-37`). */
  def orderedColumns: Seq[(String, String)] = columns.toSeq.sortBy(_._1)

  /** Port of load-time validation (`config.go:49-57`). */
  def validate(): Either[String, GraftConfig] =
    if (logsTable.isEmpty) Left("logs table is not provided")
    else if (columns.isEmpty) Left("table schema is empty")
    else if (logFormat.isEmpty) Left("log format is empty")
    else Right(this)
}

sealed trait EmptyTimePolicy
object EmptyTimePolicy {
  /** Reference behavior: empty time value → wall clock (`caster.go:295`). */
  case object Now extends EmptyTimePolicy
  /** Deterministic alternative for oracle-checked runs. */
  case object Null extends EmptyTimePolicy
}

object GraftConfig {
  /** Load from the reference's YAML layout (`nginx.*` / `scheme.*`,
    * `/root/reference/sample_test.yaml`). Uses snakeyaml from the Spark
    * classpath; no extra dependency.
    */
  def fromYaml(yaml: String): Either[String, GraftConfig] = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](yaml)
    def section(name: String): Map[String, Object] =
      Option(root.get(name)) match {
        case Some(m: java.util.Map[_, _]) =>
          m.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[Object] }.toMap
        case _ => Map.empty
      }
    def str(m: Map[String, Object], k: String, dflt: String = ""): String =
      m.get(k).map(_.toString).getOrElse(dflt)
    def bool(m: Map[String, Object], k: String, dflt: Boolean): Boolean =
      m.get(k).map(_.toString.toBoolean).getOrElse(dflt)
    def strMap(m: Map[String, Object], k: String): Map[String, String] =
      m.get(k) match {
        case Some(mm: java.util.Map[_, _]) =>
          mm.asScala.map { case (a, b) => a.toString -> b.toString }.toMap
        case _ => Map.empty
      }
    val nginx = section("nginx")
    val scheme = section("scheme")
    GraftConfig(
      logFormat = str(nginx, "log_format"),
      logTimeFormat = str(nginx, "log_time_format", "02/Jan/2006:15:04:05 -0700"),
      customCasts = strMap(nginx, "log_custom_casts"),
      customCastsEnable = bool(nginx, "log_custom_casts_enable", dflt = true),
      removeHyphen = bool(nginx, "log_remove_hyphen", dflt = true),
      columns = strMap(scheme, "columns"),
      logsTable = str(scheme, "logs_table", "access_log")
    ).validate()
  }

  def fromYamlFile(path: String): Either[String, GraftConfig] =
    fromYaml(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
