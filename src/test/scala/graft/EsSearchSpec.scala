package graft

import graft.sources.EsSearch
import org.scalatest.funsuite.AnyFunSuite

/** The S-9/S-10 discovery front-end lifecycle against a pre-fetched-JSON
  * transport double: query payload shape, the 303-redirect-in-body
  * convention, hit parsing and the donor-metadata precedence rules.
  */
class EsSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val response =
    """{"hits":{"hits":[
      |{"_source":{"uuid":"u1","hubmap_id":"HBM1",
      |  "immediate_ancestor_ids":["a1","a2"],
      |  "immediate_descendant_ids":[],
      |  "donor":{"metadata":{
      |    "organ_donor_data":[
      |      {"grouping_concept_preferred_term":"Age","data_value":"61"},
      |      {"grouping_concept_preferred_term":"Sex",
      |       "preferred_term":"Female"},
      |      {"grouping_concept_preferred_term":"Race",
      |       "preferred_term":"White"}],
      |    "living_donor_data":[
      |      {"grouping_concept_preferred_term":"Age","data_value":"62"},
      |      {"grouping_concept_preferred_term":"Body mass index",
      |       "data_value":"27.1"}]}}}},
      |{"_source":{"uuid":"u2","hubmap_id":"HBM2",
      |  "immediate_ancestor_ids":[],
      |  "immediate_descendant_ids":["d1"]}}
      |]}}""".stripMargin

  test("query payload: CODEX + public musts, revision must_not, organ opt") {
    val bare = EsSearch.codexQueryPayload(None)
    assert(bare.contains(""""match":{"dataset_type":"CODEX"}"""))
    assert(bare.contains(""""match":{"data_access_level":"public"}"""))
    assert(bare.contains(
      """"must_not":[{"exists":{"field":"next_revision_uuid"}}]"""))
    assert(!bare.contains("origin_samples"))
    val organ = EsSearch.codexQueryPayload(Some("HT"))
    assert(organ.contains(""""match":{"origin_samples.organ":"HT"}"""))
  }

  test("200 path: hits parse; ancestor=first, empty descendants=NULL, " +
    "living donor entries override organ donor entries") {
    val transport: EsSearch.Transport = {
      case ("POST", "http://es/search", body) =>
        assert(body.contains("CODEX")); (200, response)
      case other => fail(s"unexpected call $other")
    }
    val rows = EsSearch.search(spark, transport, "http://es/search")
      .orderBy("uuid").collect()
    assert(rows.length == 2)
    val r1 = rows(0)
    assert(r1.getString(0) == "u1" && r1.getString(1) == "HBM1")
    assert(r1.getString(2) == "a1") // first ancestor
    assert(r1.isNullAt(3)) // [] descendants → NULL, like the reference
    assert(r1.getString(4) == "62") // living-donor Age wins over 61
    assert(r1.getString(5) == "Female") // Sex via preferred_term
    assert(r1.isNullAt(6) && r1.isNullAt(7)) // height/weight absent
    assert(r1.getString(8) == "27.1") // BMI from living-donor data
    assert(r1.isNullAt(9)) // cause_of_death absent
    assert(r1.getString(10) == "White")
    val r2 = rows(1)
    assert(r2.isNullAt(2)) // [] ancestors → NULL
    assert(r2.getSeq[String](3) == Seq("d1"))
    assert((4 to 10).forall(r2.isNullAt)) // no donor metadata at all
  }

  test("303 path: redirect URL arrives in the BODY and is GET-followed") {
    var followed = ""
    val transport: EsSearch.Transport = {
      case ("POST", _, _) => (303, "http://mirror/results\n")
      case ("GET", url, _) => followed = url; (200, response)
    }
    val n = EsSearch.search(spark, transport, "http://es/search").count()
    assert(followed == "http://mirror/results") // trimmed body
    assert(n == 2)
  }

  test("non-200/303 and failed redirect both yield empty results") {
    val err: EsSearch.Transport = (_, _, _) => (500, "boom")
    assert(EsSearch.search(spark, err, "http://es/search").count() == 0)
    val deadRedirect: EsSearch.Transport = {
      case ("POST", _, _) => (303, "http://mirror/results")
      case ("GET", _, _) => (404, "gone")
    }
    assert(EsSearch.search(spark, deadRedirect, "http://es/search")
      .count() == 0)
  }

  test("shipped java.net.http adapter satisfies the Transport type " +
      "(constructed, never invoked — the build stays zero-egress)") {
    val t: EsSearch.Transport = EsSearch.httpTransport()
    assert(t != null)
  }
}
