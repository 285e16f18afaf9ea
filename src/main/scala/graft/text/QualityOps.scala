package graft.text

import graft.ops.{QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-quality operators a training-data pipeline runs before
  * anything else touches the text: repetition filtering (the
  * Gopher-rules family: documents dominated by repeated n-grams or one
  * token are boilerplate/spam) and benchmark-contamination screening
  * (n-gram overlap against a held-out eval set — leaked eval documents
  * must not reach a training corpus).
  *
  * Scale design:
  *  - repetition stats are per-row array folds (map-only) plus ONE
  *    shuffle keyed by doc_id for the top-term count — never a
  *    self-join;
  *  - contamination shuffles 8-byte shingle hashes, never text; the
  *    benchmark side is DISTINCT hashes (tiny) and broadcasts, so the
  *    corpus pass is map-side semi-join + one partial-aggregated count.
  */
object QualityOps extends QueryModule {
  import Tables.documents
  import TextOps.{tokens, oTokens}

  // ==================================================== repetition quality
  // Gopher-style: duplicate-bigram fraction > 30% or top-token fraction
  // > 20% → drop. Flags use INTEGER arithmetic (dup*10 <= n*3) so the
  // threshold comparison can't straddle a float rounding edge between
  // engines; the reported ratios are single int/int double divisions
  // (deterministic IEEE in both engines).
  register("q93_repetition_quality",
    raw"""WITH toks AS (
       |  SELECT doc_id, $oTokens AS t FROM documents),
       |big AS (
       |  SELECT doc_id, len(t) AS n_tokens,
       |    list_transform(range(1, greatest(len(t) - 1, 0) + 1),
       |      i -> t[i] || ' ' || t[i + 1]) AS bigrams
       |  FROM toks),
       |stats AS (
       |  SELECT doc_id, n_tokens, len(bigrams) AS n_bigrams,
       |    len(bigrams) - len(list_distinct(bigrams)) AS dup_bigrams
       |  FROM big),
       |tc AS (SELECT doc_id, unnest(t) AS term FROM toks),
       |top AS (
       |  SELECT doc_id, MAX(c) AS top_term_count
       |  FROM (SELECT doc_id, term, COUNT(*) AS c FROM tc GROUP BY doc_id, term)
       |  GROUP BY doc_id)
       |SELECT s.doc_id, s.n_tokens, s.n_bigrams, s.dup_bigrams,
       |  p.top_term_count,
       |  CASE WHEN s.n_bigrams > 0
       |       THEN CAST(s.dup_bigrams AS DOUBLE) / s.n_bigrams
       |       ELSE CAST(0 AS DOUBLE) END AS dup_bigram_ratio,
       |  CAST(p.top_term_count AS DOUBLE) / s.n_tokens AS top_term_ratio,
       |  CASE WHEN s.dup_bigrams * 10 <= s.n_bigrams * 3
       |        AND p.top_term_count * 5 <= s.n_tokens
       |       THEN 1 ELSE 0 END AS keep_flag
       |FROM stats s JOIN top p ON s.doc_id = p.doc_id""".stripMargin) { (s, d) =>
    val t = tokens(col("text"))
    val n = size(t)
    val nb = greatest(n - 1, lit(0))
    // total bigram list via aligned slices (total function: n<2 → empty;
    // NOT sequence(1, n-1), which runs DESCENDING when n-1 < 1)
    val bigrams = zip_with(slice(t, lit(1), nb), slice(t, lit(2), nb),
      (a, b) => concat(a, lit(" "), b))
    val stats = documents(s, d).select(col("doc_id"),
      n.as("n_tokens"),
      size(bigrams).as("n_bigrams"),
      (size(bigrams) - size(array_distinct(bigrams))).as("dup_bigrams"))
    // top-term count: ONE shuffle on (doc_id, term) with map-side partial
    // aggregation, then per-doc max — never a per-doc array histogram
    val top = documents(s, d)
      .select(col("doc_id"), explode(t).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_term_count"))
    stats.join(top, Seq("doc_id")) // every doc has >= 1 token
      .select(col("doc_id"), col("n_tokens"), col("n_bigrams"),
        col("dup_bigrams"), col("top_term_count"),
        when(col("n_bigrams") > 0,
          col("dup_bigrams").cast(DoubleType) / col("n_bigrams"))
          .otherwise(lit(0.0)).as("dup_bigram_ratio"),
        (col("top_term_count").cast(DoubleType) / col("n_tokens"))
          .as("top_term_ratio"),
        when(col("dup_bigrams") * 10 <= col("n_bigrams") * 3 &&
          col("top_term_count") * 5 <= col("n_tokens"), 1)
          .otherwise(0).as("keep_flag"))
  }

  // ============================================================== manifest
  // Round-3 capstone: the per-document KEEP decision a curation pipeline
  // actually ships — repetition quality (q93), benchmark contamination
  // (q94), and exact-dedup canonical selection (q23) composed into one
  // manifest over the corpus slice. Every stage reuses the gate-proven
  // kernels; the only shuffles are the (doc_id, term) top-term count,
  // the broadcast-semi contamination probe, and the fingerprint groupBy.
  register("q100_corpus_manifest", {
    s"""WITH corpus_docs AS (
       |  SELECT * FROM documents WHERE doc_id % 23 <> 0),
       |rtoks AS (SELECT doc_id, $oTokens AS t FROM corpus_docs),
       |rbig AS (
       |  SELECT doc_id, len(t) AS n_tokens,
       |    list_transform(range(1, greatest(len(t) - 1, 0) + 1),
       |      i -> t[i] || ' ' || t[i + 1]) AS bigrams
       |  FROM rtoks),
       |rstats AS (
       |  SELECT doc_id, n_tokens, len(bigrams) AS n_bigrams,
       |    len(bigrams) - len(list_distinct(bigrams)) AS dup_bigrams
       |  FROM rbig),
       |rtc AS (SELECT doc_id, unnest(t) AS term FROM rtoks),
       |rtop AS (
       |  SELECT doc_id, MAX(c) AS top_term_count
       |  FROM (SELECT doc_id, term, COUNT(*) AS c FROM rtc GROUP BY doc_id, term)
       |  GROUP BY doc_id),
       |rep AS (
       |  SELECT s.doc_id,
       |    CASE WHEN s.dup_bigrams * 10 <= s.n_bigrams * 3
       |          AND p.top_term_count * 5 <= s.n_tokens
       |         THEN 1 ELSE 0 END AS keep_repetition
       |  FROM rstats s JOIN rtop p ON s.doc_id = p.doc_id),
       |${DedupOps.oTokenHashCte},
       |sh AS (SELECT doc_id, ${DedupOps.oShingleHashes} AS shl FROM th_t2),
       |bench AS (
       |  SELECT DISTINCT unnest(shl) AS h FROM sh WHERE doc_id % 23 = 0),
       |contn AS (
       |  SELECT doc_id, COUNT(*) AS nc
       |  FROM (SELECT doc_id, unnest(shl) AS h FROM sh WHERE doc_id % 23 <> 0)
       |  WHERE h IN (SELECT h FROM bench) GROUP BY doc_id),
       |cont AS (
       |  SELECT t.doc_id,
       |    CASE WHEN t.ns > 0 AND 2 * COALESCE(c.nc, 0) >= t.ns
       |         THEN 1 ELSE 0 END AS contaminated
       |  FROM (SELECT doc_id, len(shl) AS ns FROM sh WHERE doc_id % 23 <> 0) t
       |  LEFT JOIN contn c ON t.doc_id = c.doc_id),
       |fp AS (
       |  SELECT doc_id,
       |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
       |  FROM corpus_docs),
       |win AS (SELECT fingerprint, MIN(doc_id) AS w FROM fp GROUP BY fingerprint),
       |dup AS (
       |  SELECT f.doc_id,
       |    CASE WHEN f.doc_id = w.w THEN 1 ELSE 0 END AS dedup_winner
       |  FROM fp f JOIN win w ON f.fingerprint = w.fingerprint)
       |SELECT r.doc_id, r.keep_repetition, c.contaminated, d.dedup_winner,
       |  CASE WHEN r.keep_repetition = 1 AND c.contaminated = 0
       |        AND d.dedup_winner = 1 THEN 1 ELSE 0 END AS final_keep
       |FROM rep r
       |JOIN cont c ON r.doc_id = c.doc_id
       |JOIN dup d ON r.doc_id = d.doc_id""".stripMargin
  }) { (s, d) =>
    val docs = documents(s, d).filter(col("doc_id") % 23 =!= 0)
    val t = tokens(col("text"))
    val n = size(t)
    val nb = greatest(n - 1, lit(0))
    val bigrams = zip_with(slice(t, lit(1), nb), slice(t, lit(2), nb),
      (a, b) => concat(a, lit(" "), b))
    val stats = docs.select(col("doc_id"), n.as("n_tokens"),
      size(bigrams).as("n_bigrams"),
      (size(bigrams) - size(array_distinct(bigrams))).as("dup_bigrams"))
    val top = docs.select(col("doc_id"), explode(t).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_term_count"))
    val rep = stats.join(top, Seq("doc_id"))
      .select(col("doc_id"),
        when(col("dup_bigrams") * 10 <= col("n_bigrams") * 3 &&
          col("top_term_count") * 5 <= col("n_tokens"), 1)
          .otherwise(0).as("keep_repetition"))
    val sh = documents(s, d).select(col("doc_id"),
      DedupOps.shingleHashes(col("text")).as("shl"))
    val bench = sh.filter(col("doc_id") % 23 === 0)
      .select(explode(col("shl")).as("h")).distinct()
    val nc = sh.filter(col("doc_id") % 23 =!= 0)
      .select(col("doc_id"), explode(col("shl")).as("h"))
      .join(broadcast(bench), Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("nc"))
    val cont = sh.filter(col("doc_id") % 23 =!= 0)
      .select(col("doc_id"), size(col("shl")).as("ns"))
      .join(nc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ns") > 0 &&
          lit(2) * coalesce(col("nc"), lit(0L)) >= col("ns"), 1)
          .otherwise(0).as("contaminated"))
    val fp = docs.select(col("doc_id"),
      md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
        .as("fingerprint"))
    val win = fp.groupBy("fingerprint").agg(min(col("doc_id")).as("w"))
    val dup = fp.join(win, Seq("fingerprint"))
      .select(col("doc_id"),
        when(col("doc_id") === col("w"), 1).otherwise(0).as("dedup_winner"))
    rep.join(cont, Seq("doc_id")).join(dup, Seq("doc_id"))
      .select(col("doc_id"), col("keep_repetition"), col("contaminated"),
        col("dedup_winner"),
        when(col("keep_repetition") === 1 && col("contaminated") === 0 &&
          col("dedup_winner") === 1, 1).otherwise(0).as("final_keep"))
  }

  // ================================================ benchmark contamination
  // Every 23rd document plays the held-out benchmark; a corpus document
  // is contaminated when >= half of its distinct 3-gram shingle hashes
  // appear anywhere in the benchmark set. Reuses the DedupOps shingle
  // hash kernel (native expression + its DuckDB twin), so overlap is
  // computed on int64 hashes on both sides.
  register("q94_contamination", {
    s"""WITH ${DedupOps.oTokenHashCte},
       |sh AS (SELECT doc_id, ${DedupOps.oShingleHashes} AS shl FROM th_t2),
       |corpus AS (
       |  SELECT doc_id, unnest(shl) AS h FROM sh WHERE doc_id % 23 <> 0),
       |bench AS (
       |  SELECT DISTINCT unnest(shl) AS h FROM sh WHERE doc_id % 23 = 0),
       |cont AS (
       |  SELECT doc_id, COUNT(*) AS n_contaminated
       |  FROM corpus WHERE h IN (SELECT h FROM bench)
       |  GROUP BY doc_id),
       |totals AS (
       |  SELECT doc_id, len(shl) AS n_shingles FROM sh WHERE doc_id % 23 <> 0)
       |SELECT t.doc_id, t.n_shingles,
       |  COALESCE(c.n_contaminated, 0) AS n_contaminated,
       |  CASE WHEN t.n_shingles > 0
       |       THEN CAST(COALESCE(c.n_contaminated, 0) AS DOUBLE) / t.n_shingles
       |       ELSE CAST(0 AS DOUBLE) END AS contamination_ratio,
       |  CASE WHEN t.n_shingles > 0
       |        AND 2 * COALESCE(c.n_contaminated, 0) >= t.n_shingles
       |       THEN 1 ELSE 0 END AS contaminated_flag
       |FROM totals t LEFT JOIN cont c ON t.doc_id = c.doc_id""".stripMargin
  }) { (s, d) =>
    val sh = documents(s, d).select(col("doc_id"),
      DedupOps.shingleHashes(col("text")).as("shl"))
    val corpus = sh.filter(col("doc_id") % 23 =!= 0)
    val bench = sh.filter(col("doc_id") % 23 === 0)
      .select(explode(col("shl")).as("h")).distinct()
    val cont = corpus
      .select(col("doc_id"), explode(col("shl")).as("h")) // shl is distinct per doc
      .join(broadcast(bench), Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    corpus.select(col("doc_id"), size(col("shl")).as("n_shingles"))
      .join(cont, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        when(col("n_shingles") > 0,
          coalesce(col("n_contaminated"), lit(0L)).cast(DoubleType)
            / col("n_shingles"))
          .otherwise(lit(0.0)).as("contamination_ratio"),
        when(col("n_shingles") > 0 &&
          lit(2) * coalesce(col("n_contaminated"), lit(0L)) >= col("n_shingles"), 1)
          .otherwise(0).as("contaminated_flag"))
  }

  // ====================================== LM-perplexity quality filter
  // CCNet-style language-model quality scoring: train an add-one-
  // smoothed bigram LM on the corpus itself, score every document by
  // its average token log-probability, and flag the far-out tail.
  // Low-likelihood documents are gibberish/boilerplate candidates; in a
  // production mix the LM trains on a trusted reference corpus — the
  // plumbing is identical (counts come from whichever frame you point
  // the count CTEs at).
  //
  // Determinism: p = (c(w1,w2)+1)/(c(w1)+V) is a ratio of exact integer
  // counts, so both engines feed IDENTICAL doubles to LN; each log is
  // snapped to the 1e-6 grid as a BIGINT *before* the per-document sum
  // (integer addition is order-independent — no FP-summation-order
  // hazard), and the reported average is two IEEE divisions at the end.
  //
  // Scale: bigram extraction is a map-only generator; the count tables
  // shuffle once on (w1,w2) / w1 with map-side combine; scoring re-joins
  // the bigram stream to the count tables on those same keys (hash
  // joins, no broadcast of anything corpus-sized); V is a 1-row
  // broadcast scalar. Nothing is ever collected.

  /** Average-log-prob floor below which a document is flagged: a fixed
    * policy constant (a data-dependent decile would need a corpus-sized
    * global window); compared against the exact computed double, so the
    * flag is as deterministic as the score. */
  val PerplexityFloor = -7.5

  register("q141_lm_perplexity",
    s"""WITH tok AS (SELECT doc_id, $oTokens AS t FROM documents),
       |bi AS (
       |  SELECT doc_id, t[s.s] AS w1, t[s.s + 1] AS w2
       |  FROM tok, LATERAL (
       |    SELECT unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS s) s),
       |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n2
       |  FROM bi GROUP BY w1, w2),
       |c1 AS (SELECT w1, CAST(SUM(n2) AS BIGINT) AS n1 FROM c2 GROUP BY w1),
       |v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab
       |  FROM (SELECT unnest($oTokens) AS w FROM documents)),
       |scored AS (
       |  SELECT bi.doc_id,
       |    CAST(ROUND(LN((c2.n2 + 1.0) / (c1.n1 + v.vocab)) * 1000000)
       |      AS BIGINT) AS lp_micro
       |  FROM bi JOIN c2 ON bi.w1 = c2.w1 AND bi.w2 = c2.w2
       |          JOIN c1 ON bi.w1 = c1.w1 CROSS JOIN v)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |  CAST(CAST(SUM(lp_micro) AS BIGINT) AS DOUBLE) / COUNT(*) / 1000000.0
       |    AS avg_logp,
       |  CAST(CAST(SUM(lp_micro) AS BIGINT) AS DOUBLE) / COUNT(*) / 1000000.0
       |    < ${QualityOps.PerplexityFloor} AS low_quality
       |FROM scored GROUP BY doc_id""".stripMargin) { (s, d) =>
    val t = col("t")
    val bi = documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), t, explode(sequence(lit(1),
        greatest(size(t) - 1, lit(1)).cast(IntegerType))).as("st"))
      .filter(col("st") <= size(t) - 1)
      .select(col("doc_id"), element_at(t, col("st")).as("w1"),
        element_at(t, col("st") + 1).as("w2"))
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
    val c1 = c2.groupBy(col("w1").as("cw1")).agg(sum(col("n2")).as("n1"))
    val v = documents(s, d)
      .select(explode(tokens(col("text"))).as("w"))
      .agg(count_distinct(col("w")).as("vocab"))
    val scored = bi
      .join(c2, Seq("w1", "w2"))
      .join(c1, col("w1") === col("cw1"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        round(log((col("n2") + 1.0) / (col("n1") + col("vocab"))) * 1000000)
          .cast(LongType).as("lp_micro"))
    val avg = col("sum_lp").cast(DoubleType) / col("n_bigrams") / 1000000.0
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_micro")).as("sum_lp"))
      .select(col("doc_id"), col("n_bigrams"), avg.as("avg_logp"),
        (avg < PerplexityFloor).as("low_quality"))
  }

  // ================================== hashed-feature linear classifier
  // Fasttext-shaped quality classifier scoring: each token is hashed to
  // one of [[ClassifierBuckets]] feature buckets (the hashing trick —
  // memory is fixed regardless of vocabulary), each bucket carries a
  // weight from a deterministic pseudo-trained table, and a document's
  // score is the mean bucket weight of its token bag. The weight table
  // here is derived from the bucket id (this container trains nothing);
  // swapping in learned weights changes one join, not the plan.
  //
  // Determinism: the token hash is q57's base-131 rolling fingerprint
  // (proven byte-identical across engines); bucketing and weights are
  // integer arithmetic on it; the per-document sum is an exact BIGINT;
  // score = two IEEE divisions at the end; the label compares the
  // INTEGER sum against zero. Hash-exact with no rounding anywhere.
  //
  // Scale: entirely map-side until the per-doc_id aggregation (one
  // shuffle, map-side combined). With a learned table the weights
  // become a ClassifierBuckets-row broadcast join — still no
  // corpus-sized state anywhere.
  val ClassifierBuckets = 4096

  register("q142_hashed_classifier",
    s"""WITH tok AS (SELECT doc_id, unnest($oTokens) AS w FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(w, ''),
       |        c -> CAST(ord(c) AS BIGINT))),
       |      (a, b) -> (a * 131 + b) % 2147483647) AS fp
       |  FROM tok),
       |wt AS (
       |  SELECT doc_id,
       |    ((fp % $ClassifierBuckets) * 2654435761 + 12345) % 2001 - 1000
       |      AS weight
       |  FROM f)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(CAST(SUM(weight) AS BIGINT) AS DOUBLE) / COUNT(*) / 1000.0
       |    AS score,
       |  CAST(SUM(weight) AS BIGINT) > 0 AS positive
       |FROM wt GROUP BY doc_id""".stripMargin) { (s, d) =>
    val fp = aggregate(split(col("w"), ""), lit(0L),
      (acc, c) => (acc * 131 + ascii(c)) % 2147483647L)
    val weight = (fp % ClassifierBuckets) * 2654435761L + 12345
    documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"), (weight % 2001 - 1000).as("weight"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("weight")).as("sum_w"))
      .select(col("doc_id"), col("n_tokens"),
        (col("sum_w").cast(DoubleType) / col("n_tokens") / 1000.0)
          .as("score"),
        (col("sum_w") > 0).as("positive"))
  }

  // ================================== classifier calibration audit
  // Reliability diagram for the q142 hashed classifier: bin documents
  // by score decile and compare the bin's predicted level against the
  // observed rate of a ground-truth proxy (long documents, n_chars ≥
  // [[CalibLongChars]]). The audit a quality-filter pipeline runs
  // before trusting a score threshold at corpus scale. All-integer:
  // score_mil = (Σw·1000) div n_tokens ∈ [−10⁶, 10⁶] maps to a decile
  // by exact integer arithmetic; rates ride the ppm grid.
  //
  // Scale: reuses q142's map-side scoring pass (one doc_id shuffle),
  // then a 10-group rollup. Nothing new materializes.
  val CalibLongChars = 500L

  register("q185_calibration",
    s"""WITH tok AS (SELECT doc_id, unnest($oTokens) AS w FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(w, ''),
       |        c -> CAST(ord(c) AS BIGINT))),
       |      (a, b) -> (a * 131 + b) % 2147483647) AS fp
       |  FROM tok),
       |wt AS (
       |  SELECT doc_id,
       |    ((fp % $ClassifierBuckets) * 2654435761 + 12345) % 2001 - 1000
       |      AS weight
       |  FROM f),
       |scored AS (
       |  SELECT doc_id,
       |    (CAST(SUM(weight) AS BIGINT) * 1000) // COUNT(*) AS score_mil
       |  FROM wt GROUP BY doc_id),
       |binned AS (
       |  SELECT s.doc_id,
       |    LEAST(GREATEST(((s.score_mil + 1000000) * 10) // 2000001, 0), 9)
       |      AS bin,
       |    s.score_mil,
       |    CASE WHEN d.n_chars >= $CalibLongChars THEN 1 ELSE 0 END AS pos
       |  FROM scored s JOIN documents d ON s.doc_id = d.doc_id)
       |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(pos) AS BIGINT) AS n_pos,
       |  (CAST(SUM(pos) AS BIGINT) * 1000000) // COUNT(*) AS pos_rate_ppm,
       |  CAST(SUM(score_mil) AS BIGINT) // COUNT(*) AS avg_score_mil
       |FROM binned GROUP BY bin""".stripMargin) { (s, d) =>
    val fp = aggregate(split(col("w"), ""), lit(0L),
      (acc, c) => (acc * 131 + ascii(c)) % 2147483647L)
    val weight = (fp % ClassifierBuckets) * 2654435761L + 12345
    val scored = documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"), (weight % 2001 - 1000).as("weight"))
      .groupBy("doc_id")
      .agg(expr("(sum(weight) * 1000) div count(1)").as("score_mil"))
    scored
      .join(documents(s, d).select(col("doc_id"), col("n_chars")),
        Seq("doc_id"))
      .select(
        least(greatest(
          expr("((score_mil + 1000000) * 10) div 2000001"), lit(0L)),
          lit(9L)).as("bin"),
        col("score_mil"),
        when(col("n_chars") >= CalibLongChars, 1L).otherwise(0L).as("pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("pos")).as("n_pos"),
        expr("(sum(pos) * 1000000) div count(1)").as("pos_rate_ppm"),
        expr("sum(score_mil) div count(1)").as("avg_score_mil"))
  }

  // ============================================== exact ROC AUC
  // Threshold-free ranking quality for the q142 classifier against the
  // q185 ground-truth proxy: AUC as the exact Mann–Whitney rank-sum,
  // tie-correct (tied scores contribute ½). Computed WITHOUT ranking
  // rows: group by distinct score (the score_mil domain is ≤ 2·10⁶+1
  // cells by construction), then over the score census
  //   2·U = Σ_s  pos_at(s) · (2·cum_neg≤s − neg_at(s))
  // — all BIGINT, summed in DECIMAL(38,0) (q173 contract). The only
  // float is the final u2/(2·P·N) division, snapped to the ppm grid.
  //
  // Scale: one doc_id shuffle (scoring), one score-keyed census
  // aggregation, then the q149/q172 two-pass cumsum over the bounded
  // census (pid-partitioned local windows + a ≤32-row offsets frame).
  // A rank-based AUC would need a global sort of the corpus; this shape
  // never ranks a row.
  register("q189_auc",
    s"""WITH tok AS (SELECT doc_id, unnest($oTokens) AS w FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(w, ''),
       |        c -> CAST(ord(c) AS BIGINT))),
       |      (a, b) -> (a * 131 + b) % 2147483647) AS fp
       |  FROM tok),
       |wt AS (
       |  SELECT doc_id,
       |    ((fp % $ClassifierBuckets) * 2654435761 + 12345) % 2001 - 1000
       |      AS weight
       |  FROM f),
       |scored AS (
       |  SELECT doc_id,
       |    (CAST(SUM(weight) AS BIGINT) * 1000) // COUNT(*) AS score_mil
       |  FROM wt GROUP BY doc_id),
       |lab AS (
       |  SELECT s.score_mil,
       |    CASE WHEN d.n_chars >= $CalibLongChars THEN 1 ELSE 0 END AS pos
       |  FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
       |cen AS (
       |  SELECT score_mil, CAST(SUM(pos) AS BIGINT) AS p,
       |    CAST(COUNT(*) - SUM(pos) AS BIGINT) AS q
       |  FROM lab GROUP BY 1),
       |cum AS (
       |  SELECT p, q,
       |    CAST(SUM(q) OVER (ORDER BY score_mil) AS BIGINT) AS cq
       |  FROM cen),
       |a AS (
       |  SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
       |    CAST(SUM(q) AS BIGINT) AS n_neg,
       |    SUM(CAST(p * (2 * cq - q) AS DECIMAL(38,0))) AS u2
       |  FROM cum)
       |SELECT n_pos, n_neg, CAST(u2 AS BIGINT) AS u2,
       |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
       |    ELSE CAST(FLOOR(CAST(u2 AS DOUBLE)
       |      / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE) * 2)
       |      * 1000000 + 0.5) AS BIGINT) END AS auc_ppm
       |FROM a""".stripMargin) { (s, d) =>
    val fp = aggregate(split(col("w"), ""), lit(0L),
      (acc, c) => (acc * 131 + ascii(c)) % 2147483647L)
    val weight = (fp % ClassifierBuckets) * 2654435761L + 12345
    val scored = documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"), (weight % 2001 - 1000).as("weight"))
      .groupBy("doc_id")
      .agg(expr("(sum(weight) * 1000) div count(1)").as("score_mil"))
    val cen = scored
      .join(documents(s, d).select(col("doc_id"), col("n_chars")),
        Seq("doc_id"))
      .select(col("score_mil"),
        when(col("n_chars") >= CalibLongChars, 1L).otherwise(0L).as("pos"))
      .groupBy("score_mil")
      .agg(sum(col("pos")).as("p"),
        (count(lit(1)) - sum(col("pos"))).as("q"))
    // q149/q172 two-pass global cumsum over the bounded score census
    val local = cen.repartitionByRange(32, col("score_mil"))
      .select(col("score_mil"), col("p"), col("q"),
        spark_partition_id().as("pid"))
    val wloc = Window.partitionBy(col("pid")).orderBy(col("score_mil"))
    val cumLocal = local.select(col("p"), col("q"), col("pid"),
      sum(col("q")).over(wloc).as("lq"))
    val woff = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("pid").agg(sum(col("q")).as("pq"))
      .select(col("pid"),
        coalesce(sum(col("pq")).over(woff), lit(0L)).as("oq"))
    val a = cumLocal.join(broadcast(offsets), Seq("pid"))
      .select(col("p"), col("q"), (col("oq") + col("lq")).as("cq"))
      .agg(sum(col("p")).as("n_pos"), sum(col("q")).as("n_neg"),
        sum((col("p") * (lit(2L) * col("cq") - col("q")))
          .cast(DecimalType(38, 0))).as("u2"))
    a.select(col("n_pos"), col("n_neg"), col("u2").cast(LongType).as("u2"),
      when(col("n_pos") === 0 || col("n_neg") === 0, lit(null))
        .otherwise(floor(col("u2").cast(DoubleType)
          / (col("n_pos").cast(DoubleType) * col("n_neg").cast(DoubleType)
            * lit(2.0)) * 1000000 + 0.5).cast(LongType)).as("auc_ppm"))
  }
}
