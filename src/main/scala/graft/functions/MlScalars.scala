package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar ML surface (reference: src/carnot/funcs/builtins/ml_ops.cc —
  * `_kmeans_inference`, `_encode_sentence_piece`, `_text_embedding`;
  * src/carnot/funcs/builtins/request_path_ops.cc —
  * `_predict_request_path_cluster`).
  *
  * Everything here is declarative higher-order-function Spark (codegen'd,
  * no UDFs). The reference's sentence-piece/transformer models
  * (exec/ml/transformer_executor.h) are embedded ONNX models we cannot
  * ship — those two are DETERMINISTIC STUBS with the real Spark plumbing
  * (types, shapes, cross-engine-reproducible hashing) and a swap-in point
  * for a real model UDF.
  */
object MlScalars {

  /** _kmeans_inference: index of the nearest centroid (squared L2) in a
    * centroids array-of-arrays column (as produced by
    * MlAggregators.kmeans after from_json).
    */
  def kmeansInference(vec: Column, centroids: Column): Column = {
    val dists = transform(centroids, c =>
      aggregate(zip_with(vec, c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d))
    array_position(dists, array_min(dists)) - 1
  }

  /** Parse a centroids JSON string ("[[1.0,2.0],...]") into
    * array<array<double>> for kmeansInference.
    */
  def parseCentroids(json: Column): Column =
    from_json(json, org.apache.spark.sql.types.DataTypes.createArrayType(
      org.apache.spark.sql.types.DataTypes.createArrayType(
        org.apache.spark.sql.types.DataTypes.DoubleType)))

  /** _predict_request_path_cluster: first template in `templates` that
    * matches `path` segment-wise ('*' matches any one segment); null if
    * none. Structural match, not regex — no per-row pattern compilation.
    */
  def predictRequestPathCluster(path: Column, templates: Column): Column = {
    val segs = split(regexp_replace(path, "^/", ""), "/")
    try_element_at(
      filter(templates, t => {
        val ts = split(regexp_replace(t, "^/", ""), "/")
        size(ts) === size(segs) &&
          forall(zip_with(ts, segs, (a, b) => a === lit("*") || a === b),
            x => x)
      }), lit(1))
  }

  /** Cross-engine-exact 60-bit string hash scaled to [-1, 1). */
  private def h1(c: Column): Column =
    (graft.expressions.Md5Long60.column(c.cast("binary"))
      % 2000001L - 1000000L) / 1000000.0

  /** _text_embedding STUB: the reference runs an embedded transformer
    * (ml_ops.cc TransformerUDF -> exec/ml/transformer_executor.h). No
    * model ships here, so the embedding is a deterministic per-dimension
    * md5 feature hash — same column type (array<double>), same pipeline
    * shape, reproducible in any engine. Swap `h1` for an ONNX-session UDF
    * to make it real.
    */
  def textEmbedding(text: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => h1(concat(text, lit("#"), i)))

  /** _encode_sentence_piece STUB: the reference tokenizes with an
    * embedded sentencepiece model (ml_ops.cc SentencePieceUDF). Stub
    * policy: whitespace words split into <=4-char pieces, first piece of
    * each word marked with the sentencepiece word-boundary marker. Real
    * BPE drops in behind the same array<string> signature. Empty words
    * (consecutive spaces) are dropped BEFORE the per-word transform —
    * length 0 would make sequence(0, -1) count down and emit bogus
    * pieces.
    */
  def encodeSentencePiece(text: Column): Column =
    flatten(transform(filter(split(text, " "), w => length(w) > 0), w =>
      transform(sequence(lit(0), floor((length(w) - 1) / lit(4)).cast("int")),
        j => concat(
          when(j === 0, lit("▁")).otherwise(lit("")),
          w.substr(j * 4 + 1, lit(4))))))
}
