package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-9 additions: the occupancy-auto-scaled SemDeDup variant — the
  * knob the r8 review flagged as the one thing that did not grow with
  * the corpus.
  */
object Round9Queries {

  def all: Seq[Q] = Seq(

    Q("d_semdedup_auto",
      "SemDeDup with the cluster count DERIVED from the corpus size " +
        "(`Dedup.semDedupAuto`): one cell per ~128 vectors, " +
        "clamp(ceil(n/128), 2, 65536) — the quadratic within-cell knob " +
        "now grows with the corpus (at sf0.01's 500 vectors this gives " +
        "4 cells; at 100 TB it rides the cap and cells stay " +
        "~occupancy-sized), the missing piece flagged by the r8 " +
        "review. The oracle derives the SAME count via a scalar " +
        "subquery LIMIT, so the auto-scaling itself is under the " +
        "exact-hash gate, not just one pinned cluster count.",
      (s, d) => {
        import s.implicits._
        graft.dedup.Dedup.semDedupAuto(Tables.embeddings(s, d),
            "vec_id", "embedding", threshold = 0.5)
          .orderBy($"vec_id")
      },
      Some(OracleGen.semDedupAutoSql(dim = 64, occupancy = 128,
        threshold = "0.5"))),
  )
}
