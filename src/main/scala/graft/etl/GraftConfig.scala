package graft.etl

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Pipeline configuration, file-compatible with the reference's config.yaml
  * (api_url, regions, output filename + compression — config.yaml:1-13). */
final case class GraftConfig(
    apiUrl: String = "",
    regions: Seq[String] = Seq.empty,
    outputFilename: String = "output.parquet",
    compression: String = "snappy")

object GraftConfig {

  def fromYamlFile(path: String): GraftConfig =
    fromYaml(Files.readString(Paths.get(path)))

  def fromYaml(text: String): GraftConfig = {
    val root = new org.yaml.snakeyaml.Yaml().load(text)
      .asInstanceOf[java.util.Map[String, Object]]
    val top: Map[String, Object] =
      Option(root).map(_.asScala.toMap).getOrElse(Map.empty)
    // the reference nests everything under an `export:` root key
    // (config.yaml:3, read as config["export"][...] at export.py:285);
    // accept that layout and the flat one
    val m: Map[String, Object] = top.get("export") match {
      case Some(e: java.util.Map[_, _]) =>
        e.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
      case _ => top
    }
    def str(k: String, dflt: String) =
      m.get(k).map(String.valueOf).getOrElse(dflt)
    val out = m.get("output") match {
      case Some(o: java.util.Map[_, _]) =>
        o.asInstanceOf[java.util.Map[String, Object]].asScala
      case _ => scala.collection.Map.empty[String, Object]
    }
    GraftConfig(
      apiUrl = str("api_url", ""),
      regions = m.get("regions") match {
        case Some(l: java.util.List[_]) => l.asScala.map(String.valueOf).toSeq
        case _ => Seq.empty
      },
      outputFilename = out.get("filename").map(String.valueOf)
        .getOrElse(str("filename", "output.parquet")),
      compression = out.get("compression").map(String.valueOf)
        .getOrElse(str("compression", "snappy")))
  }
}
