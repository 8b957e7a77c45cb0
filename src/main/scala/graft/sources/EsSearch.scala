package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-edge client for the reference's dataset-discovery front-end
  * (S-9/S-10): the search POST of `make_uuids_tsv.py:12-59` — ES bool
  * query for public CODEX datasets (optionally organ-filtered), with the
  * API's 303-redirect-in-BODY convention — and the hit parsing /
  * donor-metadata extraction of `make_uuids_tsv.py:62-154`, re-expressed
  * over Spark's JSON machinery instead of a driver-side dict loop.
  *
  * The HTTP transport is INJECTED (`Transport`): the engine owns query
  * construction, redirect semantics and response parsing — everything
  * that has testable behavior — while the caller brings the actual
  * socket I/O (this library runs zero-egress; in production a 5-line
  * java.net.http adapter satisfies the signature). A pre-fetched-JSON
  * test double drives the full lifecycle in `EsSearchSpec`.
  */
object EsSearch {

  /** (method, url, jsonBody) → (statusCode, responseBody). `body` is
    * defined for POST, empty for GET. */
  type Transport = (String, String, String) => (Int, String)

  /** The promised production adapter, shipped: a `java.net.http`-backed
    * [[Transport]]. Redirect-following is OFF — the API's 303 convention
    * puts the redirect URL in the response BODY, which [[search]] itself
    * handles; a client-level follow would GET the Location header
    * instead and break that contract. Nothing in this library invokes
    * it (tests run on a pre-fetched-JSON double; the build stays
    * zero-egress) — callers hand `httpTransport()` to [[search]] to make
    * the front-end runnable out of the box.
    */
  def httpTransport(timeout: java.time.Duration =
      java.time.Duration.ofSeconds(30)): Transport = {
    val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NEVER)
      .connectTimeout(timeout)
      .build()
    (method, url, body) => {
      val b = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(url)).timeout(timeout)
      val req = (method match {
        case "POST" => b.header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        case _ => b.GET()
      }).build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
  }

  /** The search payload of `make_uuids_tsv.py:15-34`: public CODEX
    * datasets, superseded revisions excluded (`next_revision_uuid` must
    * not exist), optionally filtered to one organ CODE (the caller maps
    * organ name → code via the S-8 YAML lookup, reversing the
    * description mapping like `make_uuids_tsv.py:13`).
    */
  def codexQueryPayload(organCode: Option[String] = None): String = {
    // JSON-escape the code: organ codes come from caller-mapped YAML
    // descriptions — an embedded quote/backslash/control char would
    // otherwise yield malformed JSON and a silently empty result
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val organMust = organCode
      .map(c => s""",{"match":{"origin_samples.organ":"${esc(c)}"}}""")
      .getOrElse("")
    s"""{"from":0,"size":10000,"query":{"bool":{
       |"must":[{"match":{"dataset_type":"CODEX"}},
       |{"match":{"data_access_level":"public"}}$organMust],
       |"must_not":[{"exists":{"field":"next_revision_uuid"}}]}}}"""
      .stripMargin.replace("\n", "")
  }

  /** POST the search; follow the API's 303 convention (redirect URL in
    * the response BODY, fetched with a plain GET —
    * `make_uuids_tsv.py:45-54`); any other status yields an empty
    * result like the reference's error branch (`:57-59`).
    */
  def search(spark: SparkSession, transport: Transport,
             url: String, organCode: Option[String] = None): DataFrame = {
    val (status, body) = transport("POST", url, codexQueryPayload(organCode))
    status match {
      case 200 => parseHits(spark, body)
      case 303 =>
        val redirect = body.trim
        val (st2, body2) = transport("GET", redirect, "")
        if (st2 == 200) parseHits(spark, body2)
        else parseHits(spark, """{"hits":{"hits":[]}}""")
      case _ => parseHits(spark, """{"hits":{"hits":[]}}""")
    }
  }

  private val donorItem = StructType(Seq(
    StructField("grouping_concept_preferred_term", StringType),
    StructField("data_value", StringType),
    StructField("preferred_term", StringType)))

  private val sourceSchema = StructType(Seq(
    StructField("uuid", StringType),
    StructField("hubmap_id", StringType),
    StructField("immediate_ancestor_ids", ArrayType(StringType)),
    StructField("immediate_descendant_ids", ArrayType(StringType)),
    StructField("donor", StructType(Seq(
      StructField("metadata", StructType(Seq(
        StructField("organ_donor_data", ArrayType(donorItem)),
        StructField("living_donor_data", ArrayType(donorItem))))))))))

  private val responseSchema = StructType(Seq(
    StructField("hits", StructType(Seq(
      StructField("hits", ArrayType(StructType(Seq(
        StructField("_source", sourceSchema))))))))))

  /** One row per hit: (uuid, hubmap_id, first ancestor or NULL, the
    * descendant id list or NULL when empty — `make_uuids_tsv.py:80-90`)
    * plus the seven donor-metadata fields (`:104-154`). Donor concepts
    * are resolved by scanning organ_donor_data THEN living_donor_data
    * with later entries winning — exactly the reference's two
    * sequential assignment loops — expressed as last-match over the
    * concatenated array. Age/Height/Weight/BMI read `data_value`;
    * Sex/Cause of death/Race read `preferred_term`.
    */
  def parseHits(spark: SparkSession, responseJson: String): DataFrame = {
    import spark.implicits._
    val src = spark.read.schema(responseSchema)
      .json(Seq(responseJson).toDS())
      .select(explode_outer(col("hits.hits")).as("hit"))
      .filter(col("hit").isNotNull)
      .select(col("hit._source.*"))
    // organ-donor entries first, living-donor entries second: the
    // reference overwrites fields in that order, so LAST match wins
    val meta = concat(
      coalesce(col("donor.metadata.organ_donor_data"),
        array().cast(ArrayType(donorItem))),
      coalesce(col("donor.metadata.living_donor_data"),
        array().cast(ArrayType(donorItem))))
    // try_element_at: NULL (not an ANSI error) when no entry matches
    def lastMatch(concept: String) = try_element_at(
      filter(meta, x =>
        x.getField("grouping_concept_preferred_term") === concept), lit(-1))
    def byValue(concept: String) = lastMatch(concept).getField("data_value")
    def byTerm(concept: String) = lastMatch(concept).getField("preferred_term")
    src.select(
      col("uuid"), col("hubmap_id"),
      try_element_at(col("immediate_ancestor_ids"), lit(1))
        .as("immediate_ancestor_id"),
      when(size(col("immediate_descendant_ids")) > 0,
        col("immediate_descendant_ids")).as("immediate_descendant_ids"),
      byValue("Age").as("age"),
      byTerm("Sex").as("sex"),
      byValue("Height").as("height"),
      byValue("Weight").as("weight"),
      byValue("Body mass index").as("bmi"),
      byTerm("Cause of death").as("cause_of_death"),
      byTerm("Race").as("race"))
  }
}
