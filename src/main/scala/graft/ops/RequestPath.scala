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

/** The PxL-callable request-path clustering trio (reference
  * request_path_ops.cc:35-40 registrations; semantics .h:95-257):
  * `_build_request_path_clusters` (UDA fit), `_predict_request_path_cluster`
  * (scalar), `_match_endpoint` (scalar).
  *
  * Model semantics (RequestPathClustering::Update, .cc:285-293): paths
  * cluster per depth; a path merges into its max-similarity cluster when
  * positional-agreement/depth >= 0.5, else founds a new one; a merge
  * wildcards disagreeing centroid positions with '*'; unique members are
  * tracked until the set EXCEEDS min_cardinality (5), then cleared
  * (.cc:158-169). Predict (.cc:171-177) returns the matching member while
  * the member set survives (below-cardinality clusters act as singletons)
  * and the centroid after. The serialized model is engine-internal in the
  * reference (rapidjson) and here (unit-separator records) — scripts drop
  * the column before display, so only fit->predict round-trip semantics
  * are observable.
  *
  * Scale: UDA state is the distinct-path set, exactly like the
  * reference's UDA; partial aggregation dedups per partition before the
  * merge, and fit runs once on the merged set (sorted, so the result is
  * deterministic under any partitioning).
  */
object RequestPathClustering {
  import org.apache.spark.sql.expressions.Aggregator
  import org.apache.spark.sql.{Encoder, Encoders}

  private val MinCardinality = 5
  private val Rec = '\u001e'; private val Fld = '\u001f'

  private[ops] def toSegs(path: String): Array[String] = {
    val noParams = path.indexOf('?') match {
      case -1 => path
      case i => path.substring(0, i)
    }
    noParams.stripPrefix("/").split("/", -1)
  }

  private def sim(a: Array[String], b: Array[String]): Double = {
    var n = 0; var i = 0
    while (i < a.length) {
      if (a(i) != "*" && b(i) != "*" && a(i) == b(i)) n += 1
      i += 1
    }
    n.toDouble / a.length
  }

  /** Deterministic fit over the distinct path set (sorted iteration —
    * the reference's outcome for separable path families, independent of
    * row order).
    */
  def fitModel(paths: Seq[String]): String = {
    final case class Cl(var centroid: Array[String], var members: Set[String])
    val clusters = scala.collection.mutable.ArrayBuffer.empty[Cl]
    paths.distinct.sorted.foreach { p =>
      val s = toSegs(p)
      var best: Cl = null; var bestSim = 0.0
      clusters.foreach { c =>
        if (c.centroid.length == s.length) {
          val x = sim(c.centroid, s)
          if (x > bestSim) { bestSim = x; best = c }
        }
      }
      if (best == null || bestSim < 0.5) {
        clusters += Cl(s, Set(p))
      } else {
        best.centroid = best.centroid.zip(s).map { case (a, b) =>
          if (a == b) a else "*" }
        if (best.members.nonEmpty) {
          best.members += p
          if (best.members.size > MinCardinality) best.members = Set.empty
        }
      }
    }
    clusters.map(c => ("/" + c.centroid.mkString("/")) +
      c.members.toSeq.sorted.map(Fld + _).mkString).mkString(Rec.toString)
  }

  def predict(model: String, path: String): String = {
    if (model == null || model.isEmpty || path == null) return path
    val segs = toSegs(path)
    var bestCentroid: String = null
    var bestMembers: Set[String] = Set.empty
    var bestSim = 0.0
    model.split(Rec).foreach { rec =>
      val parts = rec.split(Fld)
      val cs = toSegs(parts(0))
      if (cs.length == segs.length) {
        val x = sim(cs, segs)
        if (x > bestSim) {
          bestSim = x; bestCentroid = parts(0)
          bestMembers = parts.drop(1).toSet
        }
      }
    }
    if (bestCentroid == null) path
    else if (bestMembers.contains(path)) path
    else bestCentroid
  }

  /** _match_endpoint (RequestPath::Matches, .cc:128-141): same depth and
    * every template component '*' or equal.
    */
  def matches(path: String, endpoint: String): Boolean = {
    if (path == null || endpoint == null) return false
    val a = toSegs(path); val t = toSegs(endpoint)
    a.length == t.length && a.indices.forall(i => t(i) == "*" || a(i) == t(i))
  }

  final case class RPBuf(paths: Array[String])

  class FitAgg extends Aggregator[String, RPBuf, String] {
    def zero: RPBuf = RPBuf(Array.empty)
    def reduce(b: RPBuf, p: String): RPBuf =
      if (p == null || b.paths.contains(p)) b else RPBuf(b.paths :+ p)
    def merge(a: RPBuf, b: RPBuf): RPBuf = RPBuf((a.paths ++ b.paths).distinct)
    def finish(b: RPBuf): String = fitModel(b.paths.toSeq)
    def bufferEncoder: Encoder[RPBuf] = Encoders.product[RPBuf]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  def fitAgg(c: Column): Column = udaf(new FitAgg).apply(c)
  val predictUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((path: String, model: String) => predict(model, path))
  val matchUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((path: String, endpoint: String) => matches(path, endpoint))
}
