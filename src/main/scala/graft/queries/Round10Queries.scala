package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Round-10 additions: the REAL image-decode path (the engine's last
  * stubbed component, retired with the in-JDK `javax.imageio` codec)
  * and IVF index lifecycle maintenance (occupancy drift + recenter).
  */
object Round10Queries {

  def all: Seq[Q] = Seq(

    Q("m_image_decode",
      "REAL image decode via the in-JDK codec (javax.imageio — zero new " +
        "dependencies): deterministic 8-bit gray PNGs are generated " +
        "in-engine from table data (per doc: dims from doc_id, pixel " +
        "(x,y) = (7x+13y+doc_id) mod 256), encoded with ImageIO.write, " +
        "then decoded by the production `Multimodal.decodeImages` " +
        "mapPartitions path — matched reader, raw raster samples, " +
        "integer-exact features (n_px, luma_sum, max_luma). Docs with " +
        "doc_id % 50 = 0 carry a CORRUPT payload and must decode to the " +
        "ok=false sentinel row instead of failing the stage (at 100 TB " +
        "some payloads WILL be truncated). The oracle replays dims and " +
        "pixel sums in closed form from the same generator, so the " +
        "codec round-trip itself — not a fake — rides the exact-hash " +
        "gate.",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).select($"doc_id").as[Long]
        val assets = ids.map { id =>
          val corrupt = id % 50 == 0
          val w = 8 + (id % 16).toInt
          val h = 8 + ((id / 16) % 16).toInt
          val payload =
            if (corrupt) s"not an image $id".getBytes("UTF-8")
            else Multimodal.encodeGrayPng(w, h,
              (x, y) => ((x * 7 + y * 13 + id) % 256).toInt)
          (id, payload)
        }.toDF("asset_id", "payload")
        Multimodal.decodeImages(assets).toDF().orderBy($"asset_id")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, (doc_id % 50 <> 0) AS ok,
             |    8 + (doc_id % 16) AS w,
             |    8 + ((doc_id // 16) % 16) AS h
             |  FROM documents),
             |px AS (
             |  SELECT doc_id, ok, w, h,
             |    flatten(list_transform(range(h), y ->
             |      list_transform(range(w),
             |        x -> (x*7 + y*13 + doc_id) % 256))) AS ps
             |  FROM g)
             |SELECT doc_id AS asset_id, ok,
             |  CASE WHEN ok THEN 'png' ELSE '' END AS format,
             |  CAST(CASE WHEN ok THEN w ELSE -1 END AS BIGINT) AS width,
             |  CAST(CASE WHEN ok THEN h ELSE -1 END AS BIGINT) AS height,
             |  CAST(CASE WHEN ok THEN 1 ELSE 0 END AS BIGINT) AS n_bands,
             |  CAST(CASE WHEN ok THEN w*h ELSE 0 END AS BIGINT) AS n_px,
             |  CAST(CASE WHEN ok THEN list_sum(ps) ELSE 0 END AS BIGINT)
             |    AS luma_sum,
             |  CAST(CASE WHEN ok THEN list_max(ps) ELSE 0 END AS BIGINT)
             |    AS max_luma
             |FROM px ORDER BY asset_id""".stripMargin)),
  )
}
