package graft.etl

import org.apache.spark.sql.Row
import org.scalacheck.Gen

import graft.SparkSpec

/** Property-based check of the enrichment semantics (reference
  * export.py:133-146): for ANY area/climb configuration,
  *  - every climb appears exactly once after flattening (E2),
  *  - pathTokens inherit from the area iff the climb has none (E1),
  *  - lat+lng inherit together iff the climb's lat is missing (E1's
  *    both-or-neither rule).
  */
class EnrichPropertySpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private val genClimb: Gen[(String, Option[Seq[String]], Option[(Double, Double)])] =
    for {
      id <- Gen.uuid.map(_.toString)
      path <- Gen.option(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))
        .map(_.take(4).toSeq))
      meta <- Gen.option(Gen.zip(Gen.chooseNum(-80.0, 80.0), Gen.chooseNum(-170.0, 170.0)))
    } yield (id, path, meta)

  private val genArea: Gen[(String, Seq[String], (Double, Double),
      List[(String, Option[Seq[String]], Option[(Double, Double)])])] =
    for {
      id <- Gen.uuid.map(_.toString)
      path <- Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty)).map(_.take(3).toSeq)
      meta <- Gen.zip(Gen.chooseNum(-80.0, 80.0), Gen.chooseNum(-170.0, 170.0))
      climbs <- Gen.listOfN(3, genClimb)
    } yield (id, path, meta, climbs)

  test("flattening preserves every climb and applies the inheritance rules") {
    val gen = Gen.listOfN(4, genArea)
    for (trial <- 1 to 10) {
      val areas = gen.apply(Gen.Parameters.default.withSize(20),
        org.scalacheck.rng.Seed(trial.toLong)).getOrElse(List.empty)
      import scala.jdk.CollectionConverters._
      val rows = areas.map { case (aid, apath, (alat, alng), climbs) =>
        Row(aid, apath, Row(alat, alng), climbs.map {
          case (cid, cpath, cmeta) =>
            Row(cid, null, null, null, null, null, null, null,
              cmeta.map { case (la, ln) => Row(la, ln) }.orNull,
              null, cpath.orNull)
        })
      }
      val df = spark.createDataFrame(rows.asJava, ClimbSchema.area)
      val flat = Enrich.flattenAreas(df).collect()
        .map(r => r.getAs[String]("uuid") -> r).toMap

      val expected = areas.flatMap(_._4.map(_._1))
      assert(flat.keySet === expected.toSet && expected.size == flat.size)

      for ((aid, apath, (alat, alng), climbs) <- areas; (cid, cpath, cmeta) <- climbs) {
        val r = flat(cid)
        val gotPath = Option(r.getAs[Seq[String]]("pathTokens"))
        assert(gotPath === cpath.orElse(Some(apath)))
        val meta = r.getStruct(r.fieldIndex("metadata"))
        cmeta match {
          case Some((la, ln)) =>
            assert(meta.getDouble(0) === la && meta.getDouble(1) === ln)
          case None =>
            assert(meta.getDouble(0) === alat && meta.getDouble(1) === alng)
        }
      }
    }
  }
}
