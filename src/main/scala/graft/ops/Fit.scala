package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
private[ops] object Fit {

  def olsSelect(n: Column, sx: Column, sy: Column, sxy: Column,
                sxx: Column, syy: Column): Seq[Column] = {
    val dxx = n * sxx - sx * sx
    val dyy = n * syy - sy * sy
    val dxy = n * sxy - sx * sy
    Seq(
      when(dxx =!= 0L,
        round(dxy.cast("double") / dxx.cast("double"), 6)).as("slope"),
      when(dxx =!= 0L,
        round((sy * sxx - sx * sxy).cast("double") / dxx.cast("double"), 6))
        .as("intercept"),
      when(dxx =!= 0L && dyy =!= 0L,
        round(dxy.cast("double") * dxy.cast("double")
          / (dxx.cast("double") * dyy.cast("double")), 6)).as("r2"))
  }
}
