package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Events, Quality, Scale, TextOps}

/** Round-8 batch-4 specs: TF-IDF keywords, Flesch readability,
  * l-diversity, t-closeness, association rules, key-space-sharded
  * distinct (+ its HLL sketch twin), Pareto/ABC. References are
  * independent in-memory implementations, seeded where random.
  */
class Round8dSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("plan pins: tranche 28 ops are keyed shuffles, no stray cartesians") {
    val sf = "/root/testdata/sf0.001"
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    def bnlj(p: String): Int =
      p.sliding("BroadcastNestedLoopJoin".length)
        .count(_ == "BroadcastNestedLoopJoin")
    val docs = graft.core.Tables(spark, sf, "documents")
    val ev = graft.core.Tables(spark, sf, "events")
    // tfidf: word-keyed tf/df aggregates + ONE 1-row broadcast N
    val tk = plan(TextOps.tfidfKeywords(docs, "text", "doc_id"))
    assert(!tk.contains("CartesianProduct"), tk.take(1500))
    assert(bnlj(tk) <= 1, tk.take(1500))
    // readability is map-only: ZERO exchanges of any kind
    val rd = plan(TextOps.readability(docs, "text", "doc_id"))
    assert(!rd.contains("Exchange"), rd.take(1500))
    // t-closeness: sparse cells only — no class x sensitive cross
    // join; the only BNLJs are copies of the SAME 1-row N and G
    // scalars, fanned by lineage reuse across the global/gTotal
    // branches (the ksDrift precedent)
    val proj = ev.select(col("event_type"),
      floor(col("value") / 100.0).cast("long").as("vb"))
    val tc = plan(Quality.tCloseness(proj, "vb", Seq("event_type")))
    assert(!tc.contains("CartesianProduct"), tc.take(1500))
    assert(bnlj(tc) <= 3, tc.take(1500))
    // assoc rules: basket-keyed self-join, item-keyed count joins,
    // 1-row broadcast N
    val ar = plan(Events.assocRules(ev, "user_id", "event_type"))
    assert(!ar.contains("CartesianProduct"), ar.take(1500))
    assert(bnlj(ar) <= 1, ar.take(1500))
    // sharded distinct: keyed aggregates only
    val sd = plan(Scale.shardedDistinct(ev, "event_type", "user_id"))
    assert(!sd.contains("CartesianProduct") && !sd.contains("Nested"))
    assert(sd.contains("Exchange hashpartitioning"), sd.take(1500))
    // pareto: the window runs over the PER-KEY aggregate (an
    // aggregate feeds the window, never raw fact rows)
    val li = graft.core.Tables(spark, sf, "lineitem")
    val pa = plan(Quality.paretoAbc(li, "l_partkey",
      col("l_extendedprice") * (lit(1) - col("l_discount"))))
    assert(!pa.contains("CartesianProduct"), pa.take(1500))
    assert(bnlj(pa) <= 1, pa.take(1500))
    assert(pa.contains("Window"), pa.take(1500))
  }

  test("tfidfKeywords == in-memory nano-quantized reference") {
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("data", "spark", "query", "plan", "join",
        "scan", "agg")
      val docs = (1L to 30L).map { id =>
        val words = (1 to 25).map(_ => vocab(rnd.nextInt(vocab.size))) ++
          (if (id % 7 == 0) Seq("rareword" + id) else Nil)
        (id, words.mkString(" "))
      }
      val got = TextOps.tfidfKeywords(
          docs.toDF("doc_id", "text"), "text", "doc_id", k = 3)
        .select("doc_id", "rank", "word", "tf")
        .as[(Long, Long, String, Long)].collect().toSet
      // independent reference
      val toks = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
      val dfreq = toks.values.flatMap(_.distinct)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.count(_._2.nonEmpty).toLong
      val want = toks.flatMap { case (id, ws) =>
        val scored = ws.groupBy(identity).view.mapValues(_.size.toLong)
          .toSeq.map { case (w, tf) =>
            val idf = math.floor(
              math.log(n.toDouble / dfreq(w)) * 1e9 + 0.5).toLong
            (w, tf, tf * idf)
          }
          .sortBy { case (w, _, s) => (-s, w) }.take(3)
        scored.zipWithIndex.map { case ((w, tf, _), i) =>
          (id, (i + 1).toLong, w, tf) }
      }.toSet
      assert(got == want)
      // a doc's planted unique word must be its #1 keyword
      val tops = got.filter(t => t._2 == 1L && t._1 % 7 == 0)
      assert(tops.forall(t => t._3 == "rareword" + t._1))
    }
  }

  test("readability: exact counts and Flesch on crafted docs") {
    val docs = Seq(
      (1L, "The cat sat on the mat. It was fun!"),
      (2L, "grr brr."),         // no-vowel words still count 1 syllable
      (3L, "no terminator here"), // fragment -> 1 sentence
      (4L, "")).toDF("doc_id", "text")
    val got = TextOps.readability(docs, "text", "doc_id")
      .select("doc_id", "n_words", "n_sentences", "n_syllables", "flesch")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(!got.contains(4L)) // empty doc excluded
    assert(got(1L)._2 == 9L && got(1L)._3 == 2L && got(1L)._4 == 9L)
    assert(math.abs(got(1L)._5 -
      (206.835 - 1.015 * 9.0 / 2 - 84.6 * 9.0 / 9)) < 1e-6)
    assert(got(2L) == ((2L, 2L, 1L, 2L,
      math.rint((206.835 - 1.015 * 2.0 - 84.6) * 1e6) / 1e6)))
    assert(got(3L)._3 == 1L) // min 1 sentence
  }

  test("lDiversity flags homogeneous classes, excludes null sensitive") {
    val rows = Seq[(String, java.lang.Long)](
      ("homog", 1L), ("homog", 1L), ("homog", 1L),
      ("diverse", 1L), ("diverse", 2L), ("diverse", 3L),
      ("nully", null), ("nully", null), ("nully", 9L))
      .toDF("cls", "s")
    val got = Quality.lDiversity(rows, "s", Seq("cls"), l = 3L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set("homog", "nully"))
    assert(got("homog") == (("homog", 3L, 1L)))
    // nulls dropped up front: 1 surviving row, 1 distinct value
    assert(got("nully") == (("nully", 1L, 1L)))
  }

  test("tCloseness: 0 when class == global, 0.5 on disjoint halves, in [0,1]") {
    val same = Seq(("only", 1L), ("only", 1L), ("only", 2L), ("only", 2L))
      .toDF("cls", "s")
    val g0 = Quality.tCloseness(same, "s", Seq("cls"))
      .select("tvd").as[Double].head()
    assert(g0 == 0.0)
    val split = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L))
      .toDF("cls", "s")
    val g1 = Quality.tCloseness(split, "s", Seq("cls"))
      .select("cls", "tvd").as[(String, Double)].collect().toMap
    assert(g1("a") == 0.5 && g1("b") == 0.5)
    val rnd = new scala.util.Random(5)
    val rand = (1 to 400).map(_ =>
      ("c" + rnd.nextInt(6), rnd.nextInt(9).toLong)).toDF("cls", "s")
    val tvds = Quality.tCloseness(rand, "s", Seq("cls"))
      .select("tvd").as[Double].collect()
    assert(tvds.forall(t => t >= 0.0 && t <= 1.0))
  }

  test("assocRules == in-memory truncating-division reference") {
    val rnd = new scala.util.Random(13)
    val items = Vector("x", "y", "z", "w")
    val baskets = (1L to 50L).flatMap { b =>
      items.filter(_ => rnd.nextInt(3) > 0).map(i => (b, i))
    }
    val got = Events.assocRules(baskets.toDF("u", "i"), "u", "i",
        minBaskets = 2L)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val sets = baskets.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val n = sets.size.toLong
    val cnt = items.map(i =>
      i -> sets.values.count(_.contains(i)).toLong).toMap
    for (a <- items; b <- items if a != b) {
      val cab = sets.values.count(s => s.contains(a) && s.contains(b)).toLong
      if (cab >= 2) {
        val want = (a, b, cab, cab * 1000000L / n, cab * 1000000L / cnt(a),
          cab * n * 1000L / (cnt(a) * cnt(b)))
        assert(got((a, b)) == want, s"rule $a->$b")
      } else assert(!got.contains((a, b)))
    }
  }

  test("shardedDistinct == plain countDistinct, invariant to shard count; HLL twin within tolerance") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 5000).map(_ =>
      ("g" + rnd.nextInt(4), rnd.nextInt(700).toLong)).toDF("g", "k")
    val exact = rows.groupBy("g").agg(countDistinct(col("k")).as("n"))
      .as[(String, Long)].collect().toMap
    for (shards <- Seq(1, 64)) {
      val got = Scale.shardedDistinct(rows, "g", "k", shards)
        .select("g", "n_unique").as[(String, Long)].collect().toMap
      assert(got == exact, s"nShards=$shards")
    }
    val hit = Scale.shardedDistinct(rows, "g", "k", 64)
      .as[(String, Long, Long)].collect()
    assert(hit.forall(r => r._3 <= math.min(64L, r._2)))
    // sketch twin: per-shard HLL sketches merged with hll_union_agg.
    // NOT asserted equal to the direct global sketch — datasketches
    // HLL serves the stream-order-dependent HIP estimator for
    // directly-fed sketches and falls back to the plain estimator
    // after a union, so merged and direct estimates legitimately
    // differ by a few counts. The contract is accuracy: BOTH paths
    // land within 5% of the exact cardinality.
    val sharded = rows
      .withColumn("shard", pmod(xxhash64(col("k")), lit(64L)))
      .groupBy("g", "shard").agg(hll_sketch_agg(col("k")).as("sk"))
      .groupBy("g").agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("est"))
      .as[(String, Long)].collect().toMap
    val global = rows.groupBy("g")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("k"))).as("est"))
      .as[(String, Long)].collect().toMap
    for ((g, est) <- sharded ++ global)
      assert(math.abs(est - exact(g)).toDouble / exact(g) < 0.05,
        s"$g: est=$est exact=${exact(g)}")
  }

  test("paretoAbc: reference cum shares, class cuts, final row at 1e6 ppm") {
    // revenues: 790, 150, 40, 20 cents -> total 1000 cents
    val rows = Seq((1L, 7.90), (2L, 1.50), (3L, 0.40), (4L, 0.20))
      .toDF("k", "v")
    val got = Quality.paretoAbc(rows, "k", col("v"))
      .select("k", "rank", "cents", "cum_ppm", "abc_class")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._2)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.map(_._4).toSeq == Seq(790000L, 940000L, 980000L, 1000000L))
    assert(got.map(_._5).toSeq == Seq("A", "B", "C", "C"))
    // ties break key-ascending, deterministic ranks
    val ties = Seq((9L, 1.0), (3L, 1.0), (5L, 1.0)).toDF("k", "v")
    val tg = Quality.paretoAbc(ties, "k", col("v"))
      .select("k", "rank").as[(Long, Long)].collect().toMap
    assert(tg == Map(3L -> 1L, 5L -> 2L, 9L -> 3L))
  }
}
