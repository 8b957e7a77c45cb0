package graft

import graft.product.CodexProduct
import org.scalatest.funsuite.AnyFunSuite

case class Entry(grouping_concept_preferred_term: String,
                 data_value: String, preferred_term: String)

class DonorPivotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // concept strings are the reference's EXACT grouping_concept_preferred_term
  // values (make_uuids_tsv.py:123-135): sentence case 'Body mass index' /
  // 'Cause of death', NOT title case.
  def donors = Seq(
    // d1: organ data only; cause of death must route to preferred_term
    ("d1",
      Seq(Entry("Age", "61", "61 years"), Entry("Sex", "M", "Male"),
        Entry("Race", "W", "White"),
        Entry("Cause of death", "C50", "Natural causes")),
      null.asInstanceOf[Seq[Entry]]),
    // d2: living overrides organ (Age appears in both — living wins)
    ("d2",
      Seq(Entry("Age", "40", "40 years"), Entry("Sex", "F", "Female")),
      Seq(Entry("Age", "41", "41 years"),
        Entry("Body mass index", "22.5", "22.5 kg/m^2"))),
    // d3: no data at all
    ("d3", null.asInstanceOf[Seq[Entry]], null.asInstanceOf[Seq[Entry]])
  ).toDF("donor_id", "organ_donor_data", "living_donor_data")

  test("F-13 donor pivot: concept routing, living-overrides-organ, nulls") {
    val out = CodexProduct.donorPivot(donors, "donor_id")
      .orderBy("donor_id").collect()
    assert(out.length == 3)
    val d1 = out(0)
    // numeric concept takes data_value; term concepts take preferred_term
    assert(d1.getAs[String]("Age") == "61")
    assert(d1.getAs[String]("Sex") == "Male")
    assert(d1.getAs[String]("Race") == "White")
    // 'Cause of death' routes through preferred_term, not data_value
    assert(d1.getAs[String]("Cause of death") == "Natural causes")
    assert(d1.isNullAt(d1.fieldIndex("Height")))
    val d2 = out(1)
    assert(d2.getAs[String]("Age") == "41") // living overrides organ
    assert(d2.getAs[String]("Sex") == "Female") // organ value survives
    assert(d2.getAs[String]("Body mass index") == "22.5")
    val d3 = out(2)
    CodexProduct.donorConcepts.foreach(c =>
      assert(d3.isNullAt(d3.fieldIndex(c))))
  }
}
