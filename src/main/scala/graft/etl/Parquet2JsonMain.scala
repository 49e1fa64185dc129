package graft.etl

import org.apache.spark.sql.SparkSession

/** The parquet→JSON/GeoJSON converter CLI (reference parquet2json.py:15-42):
  * output extension picks the format — `.geojson` produces a
  * FeatureCollection (null-coordinate rows dropped, [lng,lat] point order,
  * coordinates removed from properties), anything else a single JSON array
  * file. Defaults to `openbeta-climbs.parquet` as input like the reference.
  */
object Parquet2JsonMain {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "Usage: Parquet2JsonMain <output.json|output.geojson> [input.parquet]")
      sys.exit(1)
    }
    val spark = graft.GraftSession.create()
    // System.exit does not unwind the stack, so stop() must happen first
    val code =
      try run(spark, args(0), args.lift(1).getOrElse("openbeta-climbs.parquet"))
      finally spark.stop()
    sys.exit(code)
  }

  /** Convert `input` parquet to `output`; returns the exit code. */
  def run(spark: SparkSession, output: String, input: String): Int =
    try {
      val df = spark.read.parquet(input)
      if (output.endsWith(".geojson")) Sinks.geoJsonFile(df, output)
      else Sinks.jsonArrayFile(df, output)
      println(s"Wrote $output")
      0
    } catch {
      case e: Exception =>
        System.err.println(s"ERROR: convert failed: ${e.getMessage}")
        1
    }
}
