package graft.mmeds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MIxS ⇄ MMEDS metadata interchange (config.py:819-860 `MMEDS_MAP` /
  * `MIXS_MAP`; the file-level converters were deprecated in the
  * reference — mmeds/tests/unit/test_util.py:150 — so the surviving
  * contract is the column mapping itself, applied here as pure
  * projections).
  *
  * MIxS (Minimum Information about any (x) Sequence) is the Genomic
  * Standards Consortium's public metadata checklist; `knownMap` carries
  * the reference's published correspondences. Unknown MIxS columns land
  * in `AdditionalMetaData` (MMEDS's catch-all table), matching how the
  * reference ingests unrecognized metadata. Composite targets
  * (`Latitude:Longitude`, `Name:Version`) split into their component
  * columns on the way in and re-join on the way out, so a round trip is
  * the identity on mapped columns.
  */
object Mixs {

  /** MIxS term -> MMEDS (table, column); None = no MMEDS equivalent
    * (config.py:819-840). */
  val knownMap: Seq[(String, Option[(String, String)])] = Seq(
    "investigation_type" -> Some(("Study", "StudyType")),
    "project_name" -> Some(("Study", "StudyName")),
    "experimental_factor" -> None,
    "collection_date" -> Some(("Specimen", "CollectionDate")),
    "lat_lon" -> Some(("CollectionSite", "Latitude:Longitude")),
    "geo_loc_name" -> Some(("CollectionSite", "Name")),
    "biome" -> Some(("CollectionSite", "Biome")),
    "feature" -> Some(("CollectionSite", "Feature")),
    "material" -> Some(("CollectionSite", "Material")),
    "env_package" -> Some(("CollectionSite", "Environment")),
    "depth" -> Some(("CollectionSite", "Depth")),
    "lib_reads_seqd" -> None,
    "target_gene" -> Some(("RawDataProtocols", "TargetGene")),
    "pcr_primers" -> Some(("RawDataProtocols", "Primer")),
    "pcr_cond" -> Some(("RawDataProtocols", "Conditions")),
    "sequencing_meth" -> Some(("RawDataProtocols", "SequencingMethod")),
    "url" -> Some(("Study", "RelevantLinks")),
    "assembly" -> Some(("ResultsProtocols", "Method")),
    "assembly_name" -> Some(("ResultsProtocols", "Name:Version")),
    "isol_growth_condt" -> Some(("SampleProtocols", "Conditions")))

  private val toMmeds: Map[String, Option[(String, String)]] = knownMap.toMap

  /** Flat MMEDS column name `Table__Column`. */
  private def flat(t: String, c: String) = s"${t}__$c"

  /** MIxS frame -> MMEDS flat-named frame. Mapped terms rename to their
    * `Table__Column`; composite targets split on the first space of the
    * value (`"40.7 -74.0"` -> Latitude, Longitude); unmapped / None
    * terms become `AdditionalMetaData__<term>`. */
  def mixsToMmeds(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq.flatMap { name =>
      toMmeds.get(name).flatten match {
        case Some((t, c)) if c.contains(":") =>
          val Array(c1, c2) = c.split(":", 2)
          Seq(
            substring_index(col(name), " ", 1).as(flat(t, c1)),
            when(col(name).contains(" "),
              substring_index(col(name), " ", -1)).as(flat(t, c2)))
        case Some((t, c)) => Seq(col(name).as(flat(t, c)))
        case None => Seq(col(name).as(s"AdditionalMetaData__$name"))
      }
    }
    df.select(cols: _*)
  }

  /** MMEDS flat-named frame -> MIxS frame: the inverse projection
    * (`MIXS_MAP`, config.py:860). Component pairs of a composite target
    * re-join with a single space; columns with no MIxS equivalent keep
    * their flat MMEDS name (round-trippable). */
  def mmedsToMixs(df: DataFrame): DataFrame = {
    val inverse: Map[String, String] = knownMap.collect {
      case (mixs, Some((t, c))) if !c.contains(":") => flat(t, c) -> mixs
    }.toMap
    val composites: Seq[(String, String, String, String)] =
      knownMap.collect {
        case (mixs, Some((t, c))) if c.contains(":") =>
          val Array(c1, c2) = c.split(":", 2)
          (mixs, flat(t, c1), flat(t, c2), t)
      }
    val present = df.columns.toSet
    val compCols = composites.filter { case (_, f1, f2, _) =>
      present.contains(f1) && present.contains(f2)
    }
    val consumed = compCols.flatMap { case (_, f1, f2, _) => Seq(f1, f2) }.toSet
    val simple = df.columns.toSeq.filterNot(consumed.contains).map { name =>
      inverse.get(name) match {
        case Some(mixs) => col(name).as(mixs)
        case None if name.startsWith("AdditionalMetaData__") =>
          col(name).as(name.stripPrefix("AdditionalMetaData__"))
        case None => col(name)
      }
    }
    val joined = compCols.map { case (mixs, f1, f2, _) =>
      when(col(f2).isNotNull, concat_ws(" ", col(f1), col(f2)))
        .otherwise(col(f1)).as(mixs)
    }
    df.select(simple ++ joined: _*)
  }
}
