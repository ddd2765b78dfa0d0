package graft.mmeds

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A config file failed to load or validate (errors.py
  * InvalidConfigError); messages mirror the reference's so callers can
  * pattern-match the same failure classes. */
final case class InvalidConfigException(message: String)
  extends Exception(message)

/** Analysis-config surface (util.py:323-505): `loadConfig` /
  * `parseParameters` / `getValidColumns` / `writeConfig`.
  *
  * A config is a YAML document of analysis parameters; loading fills
  * defaults, validates the parameter set against the chosen workflow,
  * expands `all`/`none` list shorthands, and resolves the `metadata`
  * option to the columns of the study metadata that are statistically
  * usable (non-null, non-constant, not all-unique categorical —
  * util.py:414-465). Column profiling runs as ONE Spark aggregation
  * over the metadata sheet ([[AnalysisOps.columnProfile]]); everything
  * else is driver-side config plumbing on a YAML-sized object.
  */
object AnalysisConfig {

  /** Parameter lists per workflow (config.py:270-289 WORKFLOWS). */
  val workflows: Map[String, Seq[String]] = Map(
    "core_pipeline_taxonomic" -> Seq("sampling_depth", "metadata",
      "alpha_metrics", "beta_metrics", "taxonomic_database",
      "sequencing_runs", "taxa_levels"),
    "lefse" -> Seq("tables", "classes", "subclasses"),
    "test" -> Seq.empty)

  /** Parameters whose value may be a list or the shorthands
    * `all`/`none` (config.py:378-387 CONFIG_LISTS). */
  val configLists: Seq[String] = Seq("metadata", "taxa_levels",
    "alpha_metrics", "beta_metrics", "sequencing_runs", "tables",
    "classes", "subclasses")

  /** Default core-pipeline config used when none is provided
    * (resources/config_file.yaml semantics). */
  val defaultConfig: String =
    """sampling_depth: 1000
      |metadata:
      |  - SpecimenBodySite
      |  - Nationality
      |taxa_levels:
      |  - 2
      |  - 6
      |sequencing_runs:
      |  - test_run_single
      |alpha_metrics:
      |  - observed_features
      |beta_metrics:
      |  - bray_curtis
      |taxonomic_database: test
      |""".stripMargin

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => (String.valueOf(k), toScala(x)) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toList
    case other => other
  }

  /** Load + validate an analysis config (util.py:323-365 load_config).
    * `configText` None -> the default config; `workflowType` "test" ->
    * an empty config, unvalidated (the reference's blank-config path).
    * Throws [[InvalidConfigException]] with the reference's message
    * classes: "YAML format", "Invalid parameter", "Missing parameter",
    * "Invalid metadata column". */
  def loadConfig(configText: Option[String], metadata: DataFrame,
      workflowType: String,
      ignoreBadCols: Boolean = false): Map[String, Any] = {
    if (workflowType == "test" && configText.isEmpty)
      return Map.empty
    val page = configText.getOrElse(defaultConfig)
    val parsed =
      try toScala(new org.yaml.snakeyaml.Yaml().load[Any](page))
      catch { case _: Exception => throw InvalidConfigException(
        "There was an error loading your config. " +
          "Config files must be in YAML format.") }
    var config: Map[String, Any] = parsed match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => throw InvalidConfigException(
        "There was an error loading your config. " +
          "Config files must be in YAML format.")
    }
    val params = workflows.getOrElse(workflowType,
      throw InvalidConfigException(s"Unknown workflow $workflowType"))
    // sequencing runs come from the metadata, not the file (util.py:359)
    if (params.contains("sequencing_runs"))
      config += "sequencing_runs" -> sequencingRunNames(metadata)
    // record which list params were the 'all' shorthand (util.py:362-364)
    configLists.foreach { p =>
      if (config.contains(p))
        config += s"${p}_all" -> (config(p) == "all")
    }
    parseParameters(config, metadata, workflowType, ignoreBadCols)
  }

  /** Per-parameter expansion + presence check (util.py:368-408
    * parse_parameters). */
  def parseParameters(config0: Map[String, Any], metadata: DataFrame,
      workflowType: String,
      ignoreBadCols: Boolean = false): Map[String, Any] = {
    val params = workflows(workflowType)
    val unknown = config0.keySet.diff(params.toSet)
      .filterNot(_.contains("_all"))
    if (unknown.nonEmpty)
      throw InvalidConfigException(
        s"Invalid parameter(s) $unknown in config file")
    var config = config0
    params.foreach { option =>
      def missing() = throw InvalidConfigException(
        s"Missing parameter $option in config file")
      option match {
        case "metadata" =>
          val (cols, types) = getValidColumns(metadata,
            config.getOrElse(option, missing()), ignoreBadCols)
          config += option -> cols
          config += "metadata_continuous" -> types
        case "taxa_levels" =>
          if (!config.contains(option)) missing()
          if (config(option) == "all") {
            config += option -> (1 to 7).toList
            config += "taxa_levels_all" -> true
          } else config += "taxa_levels_all" -> false
        case _ =>
          config.getOrElse(option, missing()) match {
            case "False" => config += option -> false
            case "True" => config += option -> true
            // the reference's `assert config[option]` truthiness check
            case null => missing()
            case "" => missing()
            case l: List[_] if l.isEmpty => missing()
            case _ => ()
          }
      }
    }
    config
  }

  /** Plain column-name view of a metadata sheet — the reference reads
    * config metadata with the COLUMN header row as the only header
    * (util.py:411,436: `header=0, skiprows=[0,2,3,4]`), so config
    * options reference bare column names; colliding names across
    * tables uniquify with the same `__dupN` scheme as the reader. */
  def plainView(sheet: MetadataSheet): DataFrame = {
    val seen = scala.collection.mutable.Map[String, Int]()
    val cols = sheet.df.columns.filter(_ != "_row").map { n =>
      val plain0 = n.indexOf(MetadataTsv.flatSep) match {
        case -1 => n
        case i => n.substring(i + MetadataTsv.flatSep.length)
      }
      val k = seen.getOrElse(plain0, 0); seen(plain0) = k + 1
      val plain = if (k == 0) plain0 else s"${plain0}__dup$k"
      col(n).as(plain)
    }
    sheet.df.select(cols.toIndexedSeq: _*)
  }

  /** Distinct sequencing-run names, deterministically ordered
    * (util.py:411-413
    * get_sequencing_run_names over RawDataProtocolID). */
  def sequencingRunNames(metadata: DataFrame,
      runCol: String = "RawDataProtocolID"): Seq[String] =
    if (!metadata.columns.contains(runCol)) Seq.empty
    else metadata.select(col(runCol)).na.drop()
      .distinct().collect().map(_.getString(0)).sorted.toSeq

  /** Metadata columns usable for analysis + their continuous/discrete
    * classification (util.py:414-465 get_valid_columns). `option` is
    * "all", "none", or an explicit column list. Rules: all-null or
    * single-valued columns are invalid (skipped under "all" /
    * `ignoreBadCols`, error when explicitly chosen) except the
    * Together/Separate markers which pass as discrete; all-unique
    * CATEGORICAL columns are silently excluded (they identify rather
    * than group); unknown names error unless `ignoreBadCols`. */
  def getValidColumns(metadata: DataFrame, option: Any,
      ignoreBadCols: Boolean = false): (Seq[String], Map[String, Boolean]) = {
    if (option == "none") return (Seq.empty, Map.empty)
    val requested: Seq[String] = option match {
      case "all" => metadata.columns.toSeq
      case l: Seq[_] => l.map(String.valueOf)
      case other => throw InvalidConfigException(
        s"Invalid metadata option $other in config file")
    }
    val isAll = option == "all"
    val known = requested.filter(metadata.columns.contains)
    requested.filterNot(metadata.columns.contains).foreach { c =>
      if (!ignoreBadCols)
        throw InvalidConfigException(
          s"Invalid metadata column $c in config file")
    }
    // one aggregation pass for every column's profile
    val profile = AnalysisOps.columnProfile(metadata, known)
      .collect().map { r =>
      r.getAs[String]("column") ->
        ((r.getAs[Boolean]("all_null"), r.getAs[Boolean]("single_valued"),
          r.getAs[Boolean]("all_unique"), r.getAs[Boolean]("continuous")))
    }.toMap
    val picked = known.flatMap { c =>
      val (allNull, single, allUnique, continuous) = profile(c)
      if (allNull || single) {
        if (c == "Together" || c == "Separate") Some(c -> false)
        else if (isAll || ignoreBadCols) None
        else throw InvalidConfigException(
          s"Invalid metadata column $c selected for analysis")
      } else if (continuous || !allUnique) Some(c -> continuous)
      else None
    }
    (picked.map(_._1), picked.toMap)
  }

  /** Render a loaded config back to YAML (util.py:468-489
    * write_config): derived keys (Together/Separate,
    * metadata_continuous, *_all flags) are dropped; list params write
    * back as 'all' when they were the shorthand, 'none' when empty. */
  def writeConfig(config: Map[String, Any]): String = {
    val skip = Set("Together", "Separate", "metadata_continuous") ++
      configLists.map(c => s"${c}_all")
    val out = new java.util.LinkedHashMap[String, Any]()
    config.toSeq.sortBy(_._1).foreach { case (key, value) =>
      if (!skip.contains(key)) {
        val rendered: Any =
          if (configLists.contains(key)) {
            if (config.getOrElse(s"${key}_all", false) == true) "all"
            else value match {
              case l: Seq[_] if l.isEmpty => "none"
              case l: Seq[_] => l.asJava
              case null => "none"
              case other => other
            }
          } else value match {
            case l: Seq[_] => l.asJava
            case m: Map[_, _] =>
              m.map { case (k, v) => (String.valueOf(k), v) }.asJava
            case other => other
          }
        out.put(key, rendered)
      }
    }
    new org.yaml.snakeyaml.Yaml().dump(out)
  }
}
