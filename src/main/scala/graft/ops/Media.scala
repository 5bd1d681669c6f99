package graft.ops

import graft.QueryDef
import graft.functions.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal surface as declared (rows-only) queries (SURVEY.md §2.9):
  * binary payloads are not DuckDB-oracle-checkable by design, so the
  * driver records the weaker rows-only check while MultimodalSpec pins
  * the decode/resize/frame semantics. The synthetic media generator is
  * deterministic, so outputs are stable run-to-run. */
object Media {

  /** Batched decode over 200 deterministic media payloads. */
  private val mediaDecode = QueryDef(
    (s, _) => {
      import s.implicits._
      Multimodal.decode(Multimodal.syntheticMedia(s, 200)).toDF()
        .orderBy($"media_id")
    },
    None)

  /** Payload → embedding features, bridged into the vector inventory:
    * cosine top-3 neighbors per query media item via the same kernels
    * the embedding queries use. */
  private val mediaFeatures = QueryDef(
    (s, _) => {
      import s.implicits._
      val feats = Multimodal.features(Multimodal.syntheticMedia(s, 200))
      val dotf: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
          org.apache.spark.sql.Column =
        if (s.catalog.functionExists("graft_dot"))
          (a, b) => call_function("graft_dot", a, b)
        else (a, b) => aggregate(zip_with(a, b, (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x)
      val q = feats.filter($"media_id" < 5)
        .select($"media_id".as("qid"), $"embedding".as("qv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"cos".desc, $"nid")
      feats.select($"media_id".as("nid"), $"embedding".as("nv"))
        .join(broadcast(q), $"nid" =!= $"qid")
        .withColumn("cos", dotf($"qv", $"nv"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 3)
        .select($"qid", $"nid", round($"cos", 4).as("cos"), $"rk")
        .orderBy($"qid", $"rk")
    },
    None)

  val defs: Seq[(String, QueryDef)] = Seq(
    "q_media_decode" -> mediaDecode,
    "q_media_features" -> mediaFeatures)
}
