package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PxL DataFrame operator surface (reference:
  * src/carnot/planner/objects/dataframe.h) as a thin façade over Spark
  * DataFrames. Each method encodes a *semantic* the reference guarantees
  * (suffix handling, right->left join normalization, union-by-name with
  * time ordering, implicit result caps) and otherwise stays declarative so
  * Catalyst owns optimization (pushdown, pruning, join strategy, AQE).
  */
final case class PxTable(df: DataFrame) {

  /** Map: add/replace a column (dataframe.h:118-156). */
  def withCol(name: String, e: Column): PxTable = PxTable(df.withColumn(name, e))

  /** Map: full projection (N exprs -> N columns), like the physical Map
    * operator (plan.proto:233-239).
    */
  def mapCols(cols: (String, Column)*): PxTable =
    PxTable(df.select(cols.map { case (n, c) => c.as(n) }: _*))

  /** df[['a','b']] — keep columns (dataframe.h:157-176). */
  def keep(cols: String*): PxTable = PxTable(df.select(cols.map(col): _*))

  /** df.drop (dataframe.h:177-205); IR Drop compiles to Map in the
    * reference (drop_to_map_rule.h) — Spark's drop is already a Project.
    */
  def dropCols(cols: String*): PxTable = PxTable(df.drop(cols: _*))

  /** Filter (dataframe.h:206-229). Filter expr must be boolean — Catalyst
    * analysis enforces what VerifyFilterExpressionRule does.
    */
  def where(cond: Column): PxTable = PxTable(df.filter(cond))

  /** groupby().agg(out=(col, fn)) (dataframe.h:230-262). Spark plans
    * partial + final HashAggregate automatically — the reference's
    * partial_agg/finalize split (splitter/partial_op_mgr) is free here.
    */
  def groupbyAgg(keys: Seq[String], aggs: (String, Column)*): PxTable =
    // agg() with no aggregates = distinct groups (dataframe.h:230-248)
    if (aggs.isEmpty) distinctGroups(keys: _*)
    else PxTable(df.groupBy(keys.map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1),
           aggs.tail.map { case (n, c) => c.as(n) }: _*))

  /** Skew-resilient two-phase aggregation: pre-aggregate under a
    * deterministic salt derived from the row content, then combine per
    * key. For a hot key at 100 TB this spreads the partial aggregation
    * over `salt` reducers instead of one; AQE's skew handling covers
    * joins, but a single pathological group-by key still needs salting.
    * Each agg is (outName, phase1Expr, phase2Combiner-of-partial).
    */
  def saltedGroupbyAgg(keys: Seq[String], salt: Int,
                       aggs: (String, Column, Column => Column)*): PxTable = {
    val saltCol = pmod(xxhash64(df.columns.map(col): _*), lit(salt))
    val phase1 = df.groupBy((keys.map(col) :+ saltCol.as("__salt")): _*)
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, c, _) => c.as(s"__p_$n") }: _*)
    val phase2 = phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head._3(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, _, f) => f(col(s"__p_$n")).as(n) }: _*)
    PxTable(phase2)
  }

  /** Salted equijoin for a SKEWED key: the left (fact) side salts each
    * row into one of `salt` sub-keys, the right (dim) side replicates
    * every row across all `salt` sub-keys, and the equijoin runs on
    * (key, salt) — a hot key's rows spread over `salt` reducers instead
    * of serializing on one. Semantics identical to `join(right, keys)`
    * for any 1:N fact⋈dim join; the right side grows ×salt, so use it
    * when the dim is small-but-not-broadcastable or AQE's skew split
    * is unavailable (AQE skew-join is the first choice — this is the
    * deterministic fallback a pipeline pins when it must).
    */
  def saltedJoin(right: DataFrame, keys: Seq[String], salt: Int): PxTable = {
    require(salt > 0, s"salt must be positive, got $salt")
    val saltCol = pmod(xxhash64(df.columns.map(col): _*), lit(salt))
    val l = df.withColumn("__salt", saltCol)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    PxTable(l.join(r, keys :+ "__salt").drop("__salt"))
  }

  /** groupby().agg() with no aggregates = distinct groups
    * (dataframe.h:230-248 docstring).
    */
  def distinctGroups(keys: String*): PxTable =
    PxTable(df.select(keys.map(col): _*).distinct())

  /** head(n) (dataframe.h:263-283). Spark's LocalLimit/GlobalLimit split
    * subsumes the reference's Limit + abortable-source early termination.
    */
  def head(n: Int): PxTable = PxTable(df.limit(n))

  /** merge (dataframe.h:284-329): equijoin with pandas-style suffix
    * disambiguation of non-key duplicate columns. `how` ∈
    * inner|left|right|outer. The reference compiler rewrites RIGHT to LEFT
    * by swapping inputs (setup_join_type_rule.h) — we do the same so only
    * 3 physical join types exist, then restore the user's column order.
    */
  def merge(right: PxTable, how: String, leftOn: Seq[String],
            rightOn: Seq[String], suffixes: (String, String) = ("_x", "_y")): PxTable = {
    require(leftOn.length == rightOn.length, "merge: key arity mismatch")
    if (how == "right")
      return right.merge(this, "left", rightOn, leftOn, (suffixes._2, suffixes._1))
    val joinType = how match {
      case "inner" => "inner"; case "left" => "left_outer"
      case "outer" => "full_outer"
      case other => throw new IllegalArgumentException(s"merge: how=$other")
    }
    // Same-named key pairs collapse to one output column (coalesced for
    // full outer, pandas `on=` style); other overlapping columns get
    // suffixes (dataframe.h merge docstring). Both sides are renamed to
    // disjoint temp names before the join so self-joins (shared lineage,
    // e.g. per-window totals joined back) are never ambiguous.
    val sharedKeys = leftOn.zip(rightOn).filter { case (a, b) => a == b }.map(_._1).toSet
    val overlap = (df.columns.toSet & right.df.columns.toSet) -- sharedKeys
    def out(side: String, c: String): String =
      if (overlap(c)) c + (if (side == "l") suffixes._1 else suffixes._2) else c
    val l = df.toDF(df.columns.map("graft_l__" + _): _*)
    val r = right.df.toDF(right.df.columns.map("graft_r__" + _): _*)
    // merge(left_on=[], right_on=[]) is the reference's scalar-broadcast
    // idiom (a 1-row global-agg table joined onto every row, e.g.
    // net_flow_graph's time_window; service_endpoints spells it
    // how="outer"). Carnot's equijoin with zero keys matches every row
    // pair, so it is a cross join for 'inner' — but outer variants keep
    // the non-empty side (null-padded) when the other side is empty.
    // `join(cond = true)` reproduces exactly that for every join type,
    // and Spark plans it as BroadcastNestedLoopJoin either way — free
    // when the keyless side is one row.
    val joined =
      if (leftOn.isEmpty) l.join(r, lit(true), joinType)
      else l.join(r,
        leftOn.zip(rightOn)
          .map { case (a, b) => col("graft_l__" + a) === col("graft_r__" + b) }
          .reduce(_ && _),
        joinType)
    val outCols = df.columns.map { c =>
      if (sharedKeys(c) && joinType == "full_outer")
        coalesce(col("graft_l__" + c), col("graft_r__" + c)).as(c)
      else col("graft_l__" + c).as(out("l", c))
    } ++ right.df.columns.filterNot(sharedKeys).map(c => col("graft_r__" + c).as(out("r", c)))
    PxTable(joined.select(outCols.toSeq: _*))
  }

  /** append (dataframe.h:354-380): n-ary union by column name. The
    * reference preserves time_ order through the union (plan.proto:302);
    * Spark has no order invariant, so callers observing time order sort
    * explicitly via [[orderedByTime]] — the documented policy, not an
    * accident (SURVEY §2.8).
    */
  def append(others: PxTable*): PxTable =
    PxTable(others.foldLeft(df)((a, b) => a.unionByName(b.df)))

  /** The observable time-order contract at result boundaries. */
  def orderedByTime(timeCol: String, tieBreak: String*): PxTable =
    PxTable(df.orderBy((timeCol +: tieBreak).map(col): _*))

  /** Top-k by an ordering — absent from the reference engine (§2.8:
    * scripts emulate it UI-side) but free and scale-correct in Spark:
    * orderBy+limit plans TakeOrderedAndProject (per-partition heaps, no
    * global sort/shuffle of the full input).
    */
  def topK(n: Int, ordering: Column*): PxTable =
    PxTable(df.orderBy(ordering: _*).limit(n))

  /** df.rolling(window) (dataframe.h:381-403) — declared but NOT
    * executable in the reference (ir/rolling_ir.cc:55-56). Spark executes
    * it: event-time sliding windows over the epoch-ns long time column.
    * slideSeconds == widthSeconds degenerates to the tumbling px.bin.
    */
  def rollingAgg(timeCol: String, widthSeconds: Long, slideSeconds: Long,
                 keys: Seq[String], aggs: (String, Column)*): PxTable = {
    import graft.functions.PixieFunctions.nsToUs
    val w = window(timestamp_micros(nsToUs(col(timeCol))),
      s"$widthSeconds seconds", s"$slideSeconds seconds")
    PxTable(df
      .groupBy(w.as("w") +: keys.map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1),
           aggs.tail.map { case (n, c) => c.as(n) }: _*)
      .withColumn("window_start_ns", unix_micros(col("w.start")) * 1000L)
      .drop("w"))
  }

  /** df.ctx['property'] sugar (dataframe.h:422; §2.9 ConvertMetadataRule):
    * resolve a metadata property through the dimension snapshot.
    */
  def ctx(dims: Map[String, DataFrame], property: String,
          factKey: String, tsCol: String): PxTable =
    PxTable(graft.meta.K8sMetadata.ctx(df, dims, property, factKey, tsCol))

  /** AddLimitToBatchResultSinkRule: every batch result is capped
    * (add_limit_to_batch_result_sink_rule.cc:55-66; clamps larger user
    * limits). Engine policy applied at sink time.
    */
  def resultCap(maxRows: Int = PxTable.MaxOutputRowsPerTable): PxTable =
    PxTable(df.limit(maxRows))
}

object PxTable {
  /** Reference default broker config for max_output_rows_per_table. */
  val MaxOutputRowsPerTable = 10000

  def apply(spark: SparkSession, dir: String, name: String): PxTable =
    PxTable(graft.core.Tables(spark, dir, name))

  /** px.DataFrame(table, select, start_time, end_time)
    * (objects/pixie_module.h:48): source + time-range scan over the
    * engine's epoch-ns long time column. The predicate lands in
    * PushedFilters on the parquet scan; at 100 TB this is the
    * partition-pruning hook (time-partitioned tables).
    */
  /** EmptySource (plan.proto:354-360): one empty batch with a schema. */
  def empty(spark: SparkSession, schema: org.apache.spark.sql.types.StructType): PxTable =
    PxTable(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))

  /** df.stream() (dataframe.h:404-420): streaming tail of a named table. */
  def stream(spark: SparkSession, dir: String, name: String): PxTable =
    PxTable(graft.core.Tables.stream(spark, dir, name))

  def timeRange(spark: SparkSession, dir: String, name: String,
                timeCol: String, start: String, stop: String): PxTable = {
    import graft.functions.PixieFunctions.tsNsLit
    PxTable(graft.core.Tables(spark, dir, name)
      .filter(col(timeCol) >= lit(tsNsLit(start)) &&
              col(timeCol) < lit(tsNsLit(stop))))
  }
}
