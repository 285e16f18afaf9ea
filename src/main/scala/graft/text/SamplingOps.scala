package graft.text

import graft.ops.{QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling operators for training-data pipelines:
  * stratified downsampling (corpus rebalancing), hash-based
  * train/val/test splits, and per-stratum balanced top-k sampling.
  *
  * All "randomness" is a seeded portable hash of the row's stable id
  * ([[PortableHash.hash60]]) — never `rand()`: retried tasks must land
  * rows identically, reruns must produce the same splits (training-data
  * lineage), and the DuckDB oracle must agree bit-for-bit.
  *
  * Scale design: every operator here is a map-only pass (stratified
  * sample, split assignment) or one shuffle on the stratum key (balanced
  * top-k via window) — no global sort, no driver-side state. At 100 TB
  * the split assignment stays a pure projection that fuses into
  * whole-stage codegen with the downstream write.
  */
object SamplingOps extends QueryModule {
  import Tables.documents
  import PortableHash._

  /** Per-language keep rates: downsample the dominant language, keep the
    * tail (the classic corpus-rebalancing shape). */
  val StratumRates: Seq[(String, Int)] = // rate in basis points of 10000
    Seq("en" -> 2000, "de" -> 8000, "fr" -> 8000, "es" -> 8000, "zh" -> 8000)
  val DefaultRate = 5000

  // ============================================================ stratified
  // deterministic stratified sample: keep iff h(doc_id) mod 10000 < rate(lang)
  register("q63_stratified_sample", {
    val cases = StratumRates.map { case (l, r) => s"WHEN '$l' THEN $r" }
      .mkString(" ")
    s"""SELECT doc_id, lang, source, n_chars
       |FROM documents
       |WHERE ${oHash60Seeded(7, "CAST(doc_id AS VARCHAR)")} % 10000
       |      < CASE lang $cases ELSE $DefaultRate END""".stripMargin
  }) { (s, d) =>
    val rate = StratumRates.foldLeft(lit(DefaultRate)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    documents(s, d)
      .filter(hash60Seeded(7, col("doc_id").cast(StringType)) % 10000 < rate)
      .select("doc_id", "lang", "source", "n_chars")
  }

  // ============================================================ split
  // hash-based train/val/test assignment (80/10/10) + per-split stats;
  // the assignment is a pure per-row projection — at scale it fuses into
  // the scan/write with no shuffle, and is stable across reruns
  register("q64_dataset_split",
    s"""WITH assigned AS (
       |  SELECT *, ${oHash60Seeded(13, "CAST(doc_id AS VARCHAR)")} % 100 AS bucket
       |  FROM documents)
       |SELECT CASE WHEN bucket < 80 THEN 'train'
       |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       |  COUNT(DISTINCT lang) AS n_langs
       |FROM assigned GROUP BY 1""".stripMargin) { (s, d) =>
    documents(s, d)
      .withColumn("bucket",
        hash60Seeded(13, col("doc_id").cast(StringType)) % 100)
      .groupBy(when(col("bucket") < 80, "train")
        .when(col("bucket") < 90, "val").otherwise("test").as("split"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"),
        countDistinct(col("lang")).as("n_langs"))
  }

  // ============================================================ balanced
  // per-stratum balanced sample: exactly k docs per language, chosen by
  // hash order (deterministic "random" without replacement); one shuffle
  // on the stratum key, early-pruned by the rank filter
  val PerStratumK = 20
  register("q65_balanced_sample",
    s"""WITH ranked AS (
       |  SELECT doc_id, lang, source,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY ${oHash60Seeded(29, "CAST(doc_id AS VARCHAR)")}, doc_id)
       |      AS pick
       |  FROM documents)
       |SELECT doc_id, lang, source, pick FROM ranked
       |WHERE pick <= $PerStratumK""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("lang"))
      .orderBy(hash60Seeded(29, col("doc_id").cast(StringType)), col("doc_id"))
    documents(s, d)
      .withColumn("pick", row_number().over(w))
      .filter(col("pick") <= PerStratumK)
      .select("doc_id", "lang", "source", "pick")
  }

  // ============================================================== mixture
  /** Declared target mixture for [[q119]]: basis points of the token
    * budget per source (a named few upweighted, the long tail default).
    * Mirrors an LLM pre-training data-mixture config (domain weights). */
  val MixtureWeights: Seq[(String, Int)] =
    Seq("src0" -> 1200, "src1" -> 1000, "src2" -> 900, "src3" -> 700)
  val MixtureDefaultBp = 200
  val MixtureBudgetTokens = 40000L

  // Data-mixture manifest: the plan a trainer consumes to materialize a
  // weighted corpus. Per source: token inventory (tokens ≈ ceil(chars/4),
  // exact integer arithmetic), target tokens from the declared weight,
  // the repeat plan (full epochs + remainder sampling rate in basis
  // points — "oversample 2.3×" becomes epochs=2, rem_rate_bp=3000), and
  // a curriculum phase (NTILE(3) over avg doc length: short docs first).
  // Everything is integer math so both engines agree bit-for-bit; the
  // only float is the final avg length (single division, IEEE-stable).
  // Scale: one partial-aggregated shuffle on source; the NTILE window is
  // global but runs POST-aggregation on |sources| rows (q45/W3
  // precedent) — never on the corpus.
  register("q119_mixture_manifest", {
    val cases = MixtureWeights.map { case (src, w) => s"WHEN '$src' THEN $w" }
      .mkString(" ")
    s"""WITH avail AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM((n_chars + 3) // 4) AS BIGINT) AS avail_tokens
       |  FROM documents GROUP BY source),
       |planned AS (
       |  SELECT source, n_docs, avail_tokens,
       |    CASE source $cases ELSE $MixtureDefaultBp END AS weight_bp,
       |    CAST($MixtureBudgetTokens * (CASE source $cases
       |      ELSE $MixtureDefaultBp END) // 10000 AS BIGINT) AS target_tokens
       |  FROM avail)
       |SELECT source, n_docs, avail_tokens, weight_bp, target_tokens,
       |  target_tokens // avail_tokens AS epochs,
       |  (target_tokens % avail_tokens) * 10000 // avail_tokens
       |    AS rem_rate_bp,
       |  CAST(target_tokens >= avail_tokens AS INTEGER) AS oversampled,
       |  NTILE(3) OVER (ORDER BY CAST(avail_tokens AS DOUBLE) / n_docs,
       |                 source) AS curriculum_phase
       |FROM planned""".stripMargin
  }) { (s, d) =>
    val weightBp = MixtureWeights.foldLeft(lit(MixtureDefaultBp)) {
      case (acc, (src, w)) => when(col("source") === src, lit(w)).otherwise(acc)
    }
    val w = Window.orderBy(
      col("avail_tokens").cast(DoubleType) / col("n_docs"), col("source"))
    documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("(n_chars + 3) div 4")).as("avail_tokens"))
      .withColumn("weight_bp", weightBp)
      .withColumn("target_tokens",
        expr(s"${MixtureBudgetTokens}L * weight_bp div 10000"))
      .withColumn("epochs", expr("target_tokens div avail_tokens"))
      .withColumn("rem_rate_bp",
        expr("(target_tokens % avail_tokens) * 10000 div avail_tokens"))
      .withColumn("oversampled",
        (col("target_tokens") >= col("avail_tokens")).cast(IntegerType))
      .withColumn("curriculum_phase", ntile(3).over(w))
  }

  // ========================================================== systematic
  /** Sample count for [[q126]] — one doc per `total_weight / K` weight. */
  val SystematicK = 40L

  // Weighted systematic sampling: pick ~K docs with probability
  // proportional to size (weight = n_chars) by walking the cumulative
  // weight axis and keeping every row whose span crosses a multiple of
  // step = total/K — the classic PPS/systematic design (token-budget
  // subsampling where big docs must be proportionally represented).
  // All integer math (BIGINT cumsum, truncating div on non-negative
  // operands) so both engines agree exactly.
  //
  // Scale: the global cumulative sum is NOT a global window. It is the
  // two-pass distributed prefix sum — docs bucket by doc_id div 64
  // (monotone in the global order), per-bucket totals aggregate to
  // |buckets| rows, the offset window runs over that tiny frame, and
  // offsets broadcast back onto an intra-bucket window partitioned by
  // bucket. At 100 TB the only data-sized shuffle is the per-bucket
  // window; everything global happens on the bucket summary.
  register("q126_weighted_systematic", {
    s"""WITH c AS (
       |  SELECT doc_id, n_chars AS weight,
       |    CAST(SUM(n_chars) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum
       |  FROM documents),
       |t AS (SELECT GREATEST(CAST(MAX(cum) AS BIGINT) // $SystematicK, 1)
       |        AS step FROM c)
       |SELECT doc_id, weight, cum, cum // t.step AS tick
       |FROM c, t
       |WHERE (cum - weight) // t.step < cum // t.step""".stripMargin
  }) { (s, d) =>
    val docs = documents(s, d).select(col("doc_id"),
      col("n_chars").as("weight"), expr("doc_id div 64").as("pbkt"))
    val bucketTotals = docs.groupBy("pbkt").agg(sum("weight").as("bt"))
    val wOff = Window.orderBy("pbkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals.select(col("pbkt"),
      coalesce(sum(col("bt")).over(wOff), lit(0L)).as("off"))
    val total = bucketTotals.agg(sum("bt").as("total"))
    val wIn = Window.partitionBy("pbkt").orderBy("doc_id")
    docs.join(broadcast(offsets), Seq("pbkt"))
      .withColumn("cum", col("off") + sum(col("weight")).over(wIn))
      .crossJoin(broadcast(total))
      .withColumn("step", greatest(expr(s"total div $SystematicK"), lit(1L)))
      .filter(expr("(cum - weight) div step < cum div step"))
      .select(col("doc_id"), col("weight"), col("cum"),
        expr("cum div step").as("tick"))
  }

  // ================================== temporal split + leakage audit
  // Time-based train/val/test split over the event stream — the split
  // discipline that prevents future leakage into training — plus the
  // audit every eval pipeline should run: how many users appear in
  // MORE THAN ONE split (cross-split user overlap is exactly what
  // invalidates a per-user holdout built on top of a temporal split).
  // Output is a flat (metric, n) inventory: per-split event and user
  // counts plus the three pairwise user overlaps.
  //
  // Scale: split assignment is a map-only projection; user counts and
  // overlaps shuffle once on user_id (the per-user split mask is one
  // boolean triple per user — bounded aggregation state).
  val SplitT1 = "2024-01-20 00:00:00" // train < t1
  val SplitT2 = "2024-01-26 00:00:00" // val [t1, t2); test >= t2

  register("q155_temporal_split",
    s"""WITH tagged AS (
       |  SELECT user_id,
       |    CASE WHEN ts < TIMESTAMP '$SplitT1' THEN 'train'
       |         WHEN ts < TIMESTAMP '$SplitT2' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM events),
       |per_user AS (
       |  SELECT user_id,
       |    MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
       |    MAX(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS in_val,
       |    MAX(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_test
       |  FROM tagged GROUP BY user_id)
       |SELECT 'events_' || split AS metric, CAST(COUNT(*) AS BIGINT) AS n
       |FROM tagged GROUP BY split
       |UNION ALL
       |SELECT 'users_train', CAST(SUM(in_train) AS BIGINT) FROM per_user
       |UNION ALL
       |SELECT 'users_val', CAST(SUM(in_val) AS BIGINT) FROM per_user
       |UNION ALL
       |SELECT 'users_test', CAST(SUM(in_test) AS BIGINT) FROM per_user
       |UNION ALL
       |SELECT 'leak_train_val', CAST(SUM(in_train * in_val) AS BIGINT)
       |FROM per_user
       |UNION ALL
       |SELECT 'leak_val_test', CAST(SUM(in_val * in_test) AS BIGINT)
       |FROM per_user
       |UNION ALL
       |SELECT 'leak_train_test', CAST(SUM(in_train * in_test) AS BIGINT)
       |FROM per_user""".stripMargin) { (s, d) =>
    val tagged = Tables.events(s, d).select(col("user_id"),
      when(col("ts") < lit(java.sql.Timestamp.valueOf(SplitT1)), "train")
        .when(col("ts") < lit(java.sql.Timestamp.valueOf(SplitT2)), "val")
        .otherwise("test").as("split"))
    val perUser = tagged.groupBy("user_id").agg(
      max(when(col("split") === "train", 1L).otherwise(0L)).as("in_train"),
      max(when(col("split") === "val", 1L).otherwise(0L)).as("in_val"),
      max(when(col("split") === "test", 1L).otherwise(0L)).as("in_test"))
    val eventCounts = tagged.groupBy("split")
      .agg(count(lit(1)).as("n"))
      .select(concat(lit("events_"), col("split")).as("metric"), col("n"))
    val scalars = Seq(
      ("users_train", sum(col("in_train"))),
      ("users_val", sum(col("in_val"))),
      ("users_test", sum(col("in_test"))),
      ("leak_train_val", sum(col("in_train") * col("in_val"))),
      ("leak_val_test", sum(col("in_val") * col("in_test"))),
      ("leak_train_test", sum(col("in_train") * col("in_test"))))
    // one aggregation pass computes every scalar; unpivot to rows
    val agged = perUser.agg(scalars.head._2.as(scalars.head._1),
      scalars.tail.map { case (n, e) => e.as(n) }: _*)
    val unpivoted = agged.selectExpr(
      s"stack(${scalars.size}, " + scalars.map { case (n, _) =>
        s"'$n', $n" }.mkString(", ") + ") AS (metric, n)")
    eventCounts.unionAll(unpivoted)
  }
}
