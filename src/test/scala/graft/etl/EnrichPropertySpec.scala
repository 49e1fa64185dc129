package graft.etl

import org.apache.spark.sql.Row
import org.scalacheck.Gen

import graft.SparkSpec

/** Property-based check of the enrichment semantics (reference
  * export.py:133-146): for ANY area/climb configuration,
  *  - every climb appears exactly once after flattening (E2),
  *  - pathTokens inherit from the area iff the climb's list is missing OR
  *    empty (the reference's FALSY `not climb.get("pathTokens")`), with an
  *    empty-list default when the area has none (E1),
  *  - lat+lng inherit together iff the climb's lat is missing or 0.0 AND
  *    the area's lat is present and non-zero (falsy both ways); otherwise
  *    the climb keeps its own metadata untouched, including a null struct.
  */
class EnrichPropertySpec extends SparkSpec {

  // generators deliberately hit the falsy edge cases: 0.0 coordinates and
  // empty pathTokens lists, which the reference treats as "missing"
  private val genLat: Gen[Double] =
    Gen.frequency(1 -> Gen.const(0.0), 4 -> Gen.chooseNum(-80.0, 80.0))
  private val genPath: Gen[Seq[String]] =
    Gen.frequency(
      1 -> Gen.const(Seq.empty[String]),
      4 -> Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty)).map(_.take(4).toSeq))

  private val genClimb: Gen[(String, Option[Seq[String]], Option[(Double, Double)])] =
    for {
      id <- Gen.uuid.map(_.toString)
      path <- Gen.option(genPath)
      meta <- Gen.option(Gen.zip(genLat, Gen.chooseNum(-170.0, 170.0)))
    } yield (id, path, meta)

  private val genArea: Gen[(String, Seq[String], (Double, Double),
      List[(String, Option[Seq[String]], Option[(Double, Double)])])] =
    for {
      id <- Gen.uuid.map(_.toString)
      path <- Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty)).map(_.take(3).toSeq)
      meta <- Gen.zip(genLat, Gen.chooseNum(-170.0, 170.0))
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
        // falsy pathTokens rule: None/empty inherits; area path is always
        // non-empty in the generator so the empty-default branch is covered
        // by the dedicated unit test
        val expPath = cpath.filter(_.nonEmpty).getOrElse(apath)
        assert(r.getAs[Seq[String]]("pathTokens") === expPath)

        val climbLatFalsy = cmeta.forall(_._1 == 0.0)
        val areaLatFalsy = alat == 0.0
        val meta = r.getStruct(r.fieldIndex("metadata"))
        if (climbLatFalsy && !areaLatFalsy) {
          assert(meta.getDouble(0) === alat && meta.getDouble(1) === alng)
        } else cmeta match {
          case Some((la, ln)) =>
            assert(meta.getDouble(0) === la && meta.getDouble(1) === ln)
          case None =>
            // no inheritable area coords: the climb's (null) metadata is kept
            assert(meta == null)
        }
      }
    }
  }
}
