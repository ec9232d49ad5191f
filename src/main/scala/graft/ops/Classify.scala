package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Exact.zround
import graft.functions.PixieFunctions.idiv

/** Distributed text classification for corpus curation — the
  * quality-classifier stage every large-scale pretraining pipeline
  * runs between crawl and training set (CCNet/GPT-3-style "does this
  * look like the reference domain" scoring).
  *
  * The model is multinomial Naive Bayes over hashed unigram features:
  * the fastText-style linear classifier reduced to its counting core,
  * which makes both phases pure relational algebra —
  *
  *  - TRAINING is one groupBy pass over the labeled grams
  *    (class × bucket counts + class totals + class priors); the
  *    fitted model is a dense (class × bucket) grid small enough to
  *    broadcast (classes × buckets rows).
  *  - SCORING is explode → broadcast-join the model → per-(doc, class)
  *    sum → per-doc argmax. One shuffle keyed by doc.
  *
  * Determinism contract (the oracle-parity rules of [[Corpus]]):
  * log-probabilities are quantized to integer micro-nats BEFORE any
  * sum, so scores are exact integers — order-independent at any
  * partitioning — and the argmax tie-breaks to the lexicographically
  * greatest class in every engine (max(struct) here ==
  * row_number OVER (ORDER BY score DESC, class DESC) in SQL).
  */
object Classify {

  /** Train on `train` (textCol labeled by labelCol), score `test`:
    * one row per test doc with the argmax class and its total
    * log-probability. Laplace-smoothed: an unseen (class, bucket)
    * pair contributes ln(1/(tot_c + buckets)).
    */
  def naiveBayes(train: DataFrame, test: DataFrame, textCol: String,
                 labelCol: String, idCol: String,
                 buckets: Int = 256): DataFrame = {
    def bucket(g: Column) = pmod(Dedup.h60(g), lit(buckets.toLong))
    val tg = train.select(col(labelCol).as("cls"),
        explode(Dedup.shingles(col(textCol), 1)).as("g"))
      .select(col("cls"), bucket(col("g")).as("b"))
    val cnt = tg.groupBy("cls", "b").agg(count(lit(1)).as("c"))
    val totc = tg.groupBy("cls").agg(count(lit(1)).as("tot"))
    // dense (class × bucket) grid: missing pairs take the Laplace floor.
    // The grid is MODEL-sized (classes × buckets), never data-sized —
    // totc is broadcast explicitly so the densification is a local
    // product of two tiny inputs, not a shuffle.
    val grid = train.sparkSession.range(buckets).select(col("id").as("b"))
      .crossJoin(broadcast(totc))
      .join(cnt, Seq("cls", "b"), "left").na.fill(0L, Seq("c"))
      .select(col("cls"), col("b"),
        floor((log(col("c") + 1.0) - log(col("tot") + buckets.toDouble))
          * 1000000.0 + 0.5).cast("long").as("lp_q"))
    val ndoc = train.agg(count(lit(1)).as("n"))
    val priorQ = train.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(ndoc))
      .select(col("cls"),
        floor((log(col("nd").cast("double")) - log(col("n").cast("double")))
          * 1000000.0 + 0.5).cast("long").as("prior_q"))
    val sg = test.select(col(idCol),
        explode(Dedup.shingles(col(textCol), 1)).as("g"))
      .select(col(idCol), bucket(col("g")).as("b"))
    val scores = sg.join(broadcast(grid), "b")
      .groupBy(col(idCol), col("cls")).agg(sum(col("lp_q")).as("ll_q"))
      .join(broadcast(priorQ), "cls")
      .select(col(idCol), col("cls"),
        (col("ll_q") + col("prior_q")).as("score_q"))
    scores.groupBy(col(idCol))
      .agg(max(struct(col("score_q"), col("cls"))).as("t"))
      .select(col(idCol), col("t.cls").as("predicted"),
        zround(col("t.score_q") / 1000000.0, 6).as("log_prob"))
  }

  /** Rocchio / nearest-class-centroid classifier over embeddings: each
    * class's centroid is the per-dimension mean of its labeled
    * vectors; a test vector takes the class whose centroid it is most
    * cosine-similar to (ties to the smaller label).
    *
    * Determinism: components are quantized to integer micro-units
    * BEFORE the per-class sum, so centroids are exact rationals
    * (sum_q / 1e6 / n) at any partitioning and re-derivable in SQL.
    * Scale shape: the fit is explode-by-dimension → one keyed sum
    * (classes × dim rows — model-sized); the centroid matrix
    * broadcasts as a single row and classification is a map-only HOF
    * argmax — [[Similarity.knnClassify]]'s shape without even the vote
    * shuffle.
    */
  def nearestCentroid(labeled: DataFrame, test: DataFrame, idCol: String,
                      vecCol: String, labelCol: String): DataFrame = {
    import graft.ops.Similarity.{dot, norm}
    val eq = transform(col(vecCol).cast("array<double>"),
      x => floor(x * 1000000.0 + lit(0.5)).cast("long"))
    val dims = labeled.select(col(labelCol).cast("int").as("lab"),
        posexplode(eq).as(Seq("i", "q")))
      .groupBy("lab", "i").agg(sum("q").as("sq"), count(lit(1)).as("n"))
    val cents = dims.groupBy("lab")
      .agg(array_sort(collect_list(struct(col("i"),
        (col("sq") / 1000000.0 / col("n")).as("x")))).as("cs"))
      .select(col("lab"),
        transform(col("cs"), c => c.getField("x")).as("ce"))
      .withColumn("cnrm", norm(col("ce")))
    val model = cents
      .agg(collect_list(struct(col("ce"), col("cnrm"), col("lab"))).as("M"))
    test.select(col(idCol), col(vecCol).cast("array<double>").as("e"))
      .withColumn("nrm", norm(col("e")))
      .crossJoin(broadcast(model))
      .select(col(idCol),
        array_min(transform(col("M"), m =>
          struct((-dot(col("e"), m.getField("ce")) /
              (col("nrm") * m.getField("cnrm"))).as("neg_cos"),
            m.getField("lab").as("lab")))).as("t"))
      .select(col(idCol), col("t.lab").as("label_pred"),
        zround(-col("t.neg_cos"), 6).as("cos"))
  }

  /** Classifier evaluation report — per-class support / TP / FP / FN
    * with precision, recall, and F1 as exact integer ratios (F1 is
    * derived DIRECTLY from the counts, 2tp/(2tp+fp+fn), never from the
    * rounded p/r doubles). The held-out scorecard every deployed
    * quality classifier publishes next to its predictions. Classes =
    * the union of truth and predicted labels, so a class the model
    * never emits (recall 0) and a hallucinated class (precision 0)
    * both get a row. Two tiny keyed aggregates + a class-sized join —
    * output is O(#classes) at any corpus size.
    */
  def evalReport(pred: DataFrame, truth: DataFrame, idCol: String,
                 predCol: String, labelCol: String): DataFrame = {
    // LEFT join from truth: a doc the model never predicted (an
    // abstaining/confidence-filtered classifier) must still count in
    // its class's support and FN — an inner join would silently shrink
    // the eval set and overstate recall.
    val j = truth.select(col(idCol).as("__id"), col(labelCol).as("y"))
      .join(pred.select(col(idCol).as("__id"), col(predCol).as("p")),
        Seq("__id"), "left")
    val classes = j.select(col("y").as("cls"))
      .unionByName(j.where(col("p").isNotNull).select(col("p").as("cls")))
      .distinct()
    val byTruth = j.groupBy(col("y").as("cls"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("p") === col("y"), 1L).otherwise(0L)).as("tp"))
    val byPred = j.where(col("p").isNotNull).groupBy(col("p").as("cls"))
      .agg(count(lit(1)).as("n_pred"))
    classes.join(byTruth, Seq("cls"), "left")
      .join(byPred, Seq("cls"), "left")
      .na.fill(0L, Seq("support", "tp", "n_pred"))
      .select(col("cls"), col("support"), col("tp"),
        (col("n_pred") - col("tp")).as("fp"),
        (col("support") - col("tp")).as("fn"))
      .withColumn("precision", when(col("tp") + col("fp") > 0,
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
        .otherwise(lit(0.0)))
      .withColumn("recall", when(col("support") > 0,
        round(col("tp").cast("double") / col("support"), 6))
        .otherwise(lit(0.0)))
      .withColumn("f1", when(col("tp") * 2 + col("fp") + col("fn") > 0,
        round(col("tp").cast("double") * 2 /
          (col("tp") * 2 + col("fp") + col("fn")), 6))
        .otherwise(lit(0.0)))
  }

  /** Reliability diagram + expected calibration error for a
    * probability-scored binary classifier — the standard "is the
    * quality filter's confidence trustworthy" audit run before using
    * scores as sampling weights (a miscalibrated filter silently skews
    * the mixture).
    *
    * Input contract: `probPpmCol` is the predicted P(positive) already
    * ppm-quantized to a long in [0, 1e6] (per-row quantization is
    * deterministic; see [[Corpus]] exactness rules), `labelCol` is 0/1.
    * Docs are binned by equal-width confidence bins; each bin reports
    * mean confidence vs empirical positive rate (both exact integer
    * ratios) and every row carries the corpus-level `ece_ppm` =
    * sum_b n_b * |conf_b - acc_b| / N.
    *
    * Shape: one bin-keyed aggregate (map-side combinable) + a second
    * aggregate over the O(bins) frame, broadcast back — output is
    * O(bins) at any corpus size.
    */
  def calibration(df: DataFrame, probPpmCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    val b = least(idiv(col(probPpmCol) * bins, lit(1000000L)),
      lit(bins - 1L)).as("bin")
    val perBin = df.groupBy(b)
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        sum(col(probPpmCol).cast("long")).as("__conf_sum"))
      .select(col("bin"), col("n"), col("n_pos"),
        idiv(col("__conf_sum"), col("n")).as("conf_ppm"),
        idiv(col("n_pos") * 1000000L, col("n")).as("acc_ppm"))
      .withColumn("gap_ppm", abs(col("conf_ppm") - col("acc_ppm")))
    val ece = perBin.agg(
      idiv(sum(col("n") * col("gap_ppm")), sum(col("n"))).as("ece_ppm"))
    perBin.crossJoin(broadcast(ece))
  }

  /** Cohen's kappa: chance-corrected agreement between two label
    * columns (two annotators, or a predictor vs ground truth). The
    * label-noise / weak-supervision audit for classifier-labeled
    * training data.
    *
    * kappa = (po - pe) / (1 - pe) computed as the exact integer
    * rational (agree*N - sum_c a_c*b_c) / (N^2 - sum_c a_c*b_c),
    * ppm-quantized only at the end; null when pe = 1 (both raters
    * constant and identical — kappa undefined). Two class-keyed
    * aggregates + one class-sized join; output is one row.
    */
  def kappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.select(col(aCol).as("a"), col(bCol).as("b"))
    val tot = base.agg(count(lit(1)).as("n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
    val margins = base.groupBy("a").agg(count(lit(1)).as("na"))
      .join(base.groupBy(col("b").as("a")).agg(count(lit(1)).as("nb")),
        Seq("a"), "full_outer")
      .na.fill(0L, Seq("na", "nb"))
      .agg(sum(col("na") * col("nb")).as("pe_num"))
    tot.crossJoin(broadcast(margins))
      .select(col("n"), col("agree"),
        idiv(col("agree") * 1000000L, col("n")).as("po_ppm"),
        idiv(col("pe_num") * 1000000L, col("n") * col("n")).as("pe_ppm"),
        when(col("n") * col("n") === col("pe_num"), lit(null).cast("long"))
          .otherwise(idiv((col("agree") * col("n") - col("pe_num")) * 1000000L,
            col("n") * col("n") - col("pe_num"))).as("kappa_ppm"))
  }

  /** ROC-AUC via the rank-sum (Mann-Whitney U) identity with exact
    * tie handling: AUC = P(score⁺ > score⁻) + ½·P(tie)
    * = (R₊ − n₊(n₊+1)/2) / (n₊·n₋), with R₊ the sum of AVERAGE ranks
    * of the positives. Everything stays integral by carrying DOUBLED
    * ranks: a tied block occupying ranks [lo, hi] contributes
    * p·(lo+hi) to 2R₊, with lo/hi from one cumulative count over the
    * DISTINCT micro-quantized scores — so AUC needs no per-row
    * window, no sampling, and one final double division.
    *
    * Scale: one score-keyed aggregate collapses the corpus to the
    * distinct-score table; the running count windows over THAT (swap
    * in the banded two-level prefix sum past ~1e8 distinct scores).
    * 2R₊ ≤ 2n² bounds the exact path to ~2e9 rows; carry the rank sum
    * as decimal beyond.
    */
  def rocAuc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // filter the RAW score: a post-cast filter would let NaN slip
    // through as a real rank (non-ANSI cast NaN -> 0L) while the
    // oracle's CAST raises — engine/oracle divergence either way
    val q = df.where(scoreCol.isNotNull && !isnan(scoreCol.cast("double")))
      .select(floor(scoreCol * 1e6 + 0.5).cast("long").as("__s"),
        when(labelCol, 1L).otherwise(0L).as("__y"))
    val g = q.groupBy("__s")
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__p"))
    val w = Window.orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // block at ranks [cum-c+1, cum]: doubled-rank sum = p*(2*(cum-c)+c+1)
    val r2 = g.withColumn("__cum", sum(col("__c")).over(w))
      .select(sum(col("__p") *
        (lit(2L) * (col("__cum") - col("__c")) + col("__c") + 1L))
        .as("__r2"),
        sum(col("__p")).as("n_pos"),
        sum(col("__c") - col("__p")).as("n_neg"))
    r2.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round((col("__r2") - col("n_pos") * (col("n_pos") + 1L))
          .cast("double")
          / (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }
}
