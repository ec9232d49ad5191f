package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Exact.zround

/** Shared closed-form least-squares scaffolding: given the five exact
  * integer sums (n, Sx, Sy, Sxy, Sxx) plus Syy, append slope /
  * intercept / r2 via the normal-equation determinants — each output
  * is ONE final double formula over exact longs, rounded at 1e-6, so
  * every engine computes the identical value ([[Events.olsTrend]] and
  * [[TextOps.zipfFit]] both fit through here; their oracles mirror
  * the same staged expressions). Degenerate inputs (zero variance in
  * x, or in y for r2) yield nulls, never a division blow-up. The
  * determinant PRODUCTS are computed after the double cast — dxy^2
  * and dxx*dyy overflow long on real grids.
  */
private[graft] object Fit {

  def olsSelect(n: Column, sx: Column, sy: Column, sxy: Column,
                sxx: Column, syy: Column): Seq[Column] = {
    val dxx = n * sxx - sx * sx
    val dyy = n * syy - sy * sy
    val dxy = n * sxy - sx * sy
    Seq(
      when(dxx =!= 0L,
        zround(dxy.cast("double") / dxx.cast("double"), 6)).as("slope"),
      when(dxx =!= 0L,
        zround((sy * sxx - sx * sxy).cast("double") / dxx.cast("double"), 6))
        .as("intercept"),
      when(dxx =!= 0L && dyy =!= 0L,
        round(dxy.cast("double") * dxy.cast("double")
          / (dxx.cast("double") * dyy.cast("double")), 6)).as("r2"))
  }

  /** Pairwise Pearson correlation matrix over `cols` — the feature-
    * dependence profile a training pipeline audits before fitting
    * (collinear features, leaky proxies). Each column is integer-
    * quantized PER ROW at its own scale, all moments (S, SS, and every
    * cross SP) come from ONE scan as exact DECIMAL(38,0) sums (the
    * squares overflow long at ~1e19 — decimal sums are exact and
    * DuckDB's HUGEINT mirrors them; both cast to the same nearest
    * double only in the final formula), and
    * r = (n·Sxy − SxSy) / (√(n·Sxx−Sx²)·√(n·Syy−Sy²)) is a fixed
    * IEEE expression per pair ("sqrt of a double product" contract).
    * Zero-variance columns yield null r, never a blow-up.
    *
    * Scale: one map pass + one global aggregate carrying
    * O(k²) partials per partition; output is k·(k−1)/2 rows. No
    * shuffle of data rows at all (partial aggregation collapses each
    * partition to one moment vector).
    */
  def corrMatrix(df: DataFrame,
                 cols: Seq[(String, Column, Double)]): DataFrame = {
    require(cols.size >= 2, "corrMatrix: need at least two columns")
    require(cols.map(_._1).distinct.size == cols.size,
      "corrMatrix: column names must be distinct")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    // LISTWISE deletion: a row with a null/NaN in ANY column is
    // dropped entirely — mixing a listwise n with pairwise
    // null-skipping sums would silently skew every r touching the
    // gappy column (Sx/Sxx lose the row, n keeps it). Pairwise-
    // complete correlation is a different (and inconsistent) estimator
    // — callers wanting it should pre-impute.
    val complete = cols.map { case (_, c, _) =>
      c.isNotNull && !isnan(c.cast("double")) }.reduce(_ && _)
    // index-based internal aliases (a name containing '_' could
    // collide in a name-concatenated alias); products are formed in
    // DECIMAL — a long q*q would silently wrap past |q| ~ 3e9
    val base = df.where(complete)
      .select(cols.zipWithIndex.map { case ((_, c, scale), i) =>
        floor(c * scale + 0.5).cast("long").cast(dec).as(s"__q_$i") }: _*)
    def q(i: Int) = col(s"__q_$i")
    val idx = cols.indices
    val aggs =
      idx.flatMap { i => Seq(
        sum(q(i)).as(s"__s_$i"),
        sum(q(i) * q(i)).as(s"__ss_$i")) } ++
      idx.combinations(2).map { case Seq(i, j) =>
        sum(q(i) * q(j)).as(s"__sp_${i}_$j") }.toSeq
    val m = base.agg(count(lit(1)).as("n"), aggs: _*)
    val pairRows = idx.combinations(2).map { case Seq(i, j) =>
      val dxx = col("n") * col(s"__ss_$i") - col(s"__s_$i") * col(s"__s_$i")
      val dyy = col("n") * col(s"__ss_$j") - col(s"__s_$j") * col(s"__s_$j")
      val dxy = col("n") * col(s"__sp_${i}_$j") -
        col(s"__s_$i") * col(s"__s_$j")
      struct(lit(cols(i)._1).as("col_a"), lit(cols(j)._1).as("col_b"),
        col("n"),
        when(dxx > 0 && dyy > 0,
          zround(dxy.cast("double")
            / (sqrt(dxx.cast("double")) * sqrt(dyy.cast("double"))), 6))
          .as("r"))
    }.toSeq
    m.select(inline(array(pairRows: _*)))
  }
}
