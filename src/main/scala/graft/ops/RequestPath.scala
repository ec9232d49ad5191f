package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Request-path endpoint clustering (reference:
  * src/carnot/funcs/builtins/request_path_ops.cc —
  * `_build_request_path_clusters` UDA + `_predict_request_path_cluster`
  * scalar). The reference clusters HTTP paths into endpoint templates,
  * wildcarding high-cardinality (parameter-like) segments.
  *
  * Re-expressed as a fully declarative, shuffle-parallel pipeline instead
  * of a UDA: explode paths into (position, segment), measure per-position
  * cardinality within a (depth, first-segment) family, wildcard positions
  * whose cardinality exceeds the threshold, and fold the template back.
  * No driver-side loops, no collect — scales to arbitrarily many paths.
  */
object RequestPath {

  /** (path, template) for every distinct path in `pathCol`; a position
    * becomes '*' when its family has > maxCard distinct segments there.
    */
  def templates(df: DataFrame, pathCol: Column, maxCard: Int): DataFrame = {
    val paths = df.select(pathCol.as("path")).distinct()
    val segs = paths
      .withColumn("segs", split(regexp_replace(col("path"), "^/", ""), "/"))
      .withColumn("depth", size(col("segs")))
      .withColumn("seg0", col("segs").getItem(0))
      .select(col("path"), col("depth"), col("seg0"),
        posexplode(col("segs")).as(Seq("pos", "seg")))
    // cards is tiny (one row per family-position): broadcast it back so
    // the exploded segment stream never shuffles for this join.
    val cards = segs.groupBy("depth", "seg0", "pos")
      .agg(countDistinct("seg").as("card"))
    segs.join(broadcast(cards), Seq("depth", "seg0", "pos"))
      .withColumn("tseg", when(col("card") > maxCard, lit("*")).otherwise(col("seg")))
      .groupBy("path")
      .agg(concat(lit("/"), array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tseg")))),
          s => s.getField("tseg")), "/")).as("template"))
  }

  /** Endpoint rollup: one row per inferred endpoint template with its
    * distinct-path count — the cluster view the reference UDA emits.
    */
  def clusters(df: DataFrame, pathCol: Column, maxCard: Int): DataFrame =
    templates(df, pathCol, maxCard)
      .groupBy("template")
      .agg(countDistinct("path").as("n_paths"))
}
