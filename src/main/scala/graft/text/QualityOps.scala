package graft.text

import graft.ops.{QueryModule, Tables}
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
}
