package graft.text

import graft.ops.{QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Context-window preparation for LLM training: overlapping document
  * chunking and shard-wise sequence packing (the concat-and-chunk token
  * budgeting step).
  *
  * Scale design: chunking is per-row (explode chunk starts, slice the
  * token array — no shuffle; chunk text re-joins from the already-split
  * tokens). Packing needs a running token offset, which is inherently
  * sequential — so it runs per SHARD: documents scatter to K hash
  * shards, the cumulative sum is a window within the shard, and every
  * shard packs independently (exactly how distributed tokenizer
  * pipelines shard their corpora). No global ordering, no single
  * partition anywhere.
  */
object ChunkingOps extends QueryModule {
  import Tables.documents
  import TextOps.{tokens, oTokens}
  import PortableHash._

  val ChunkSize = 64  // tokens per chunk
  val ChunkStride = 48 // overlap = ChunkSize - ChunkStride
  val CtxLen = 512     // packed sequence length
  val Shards = 64

  // ============================================================ chunking
  // overlapping windows: starts at 1, 1+stride, ... while start <= n
  // (every doc yields >= 1 chunk; the last chunk may be short)
  register("q74_doc_chunks",
    s"""WITH tok AS (SELECT doc_id, $oTokens AS t FROM documents),
       |chunks AS (
       |  SELECT doc_id, len(t) AS n_tokens,
       |    CAST(s.s AS INTEGER) AS chunk_start,
       |    array_to_string(t[s.s : s.s + ${ChunkSize - 1}], ' ') AS chunk_text,
       |    CAST(least(len(t) - s.s + 1, $ChunkSize) AS INTEGER) AS chunk_len
       |  FROM tok, LATERAL (
       |    SELECT unnest(range(1, greatest(len(t) - 1, 1) + 1, $ChunkStride)) AS s) s)
       |SELECT doc_id, n_tokens, chunk_start, chunk_len, chunk_text
       |FROM chunks""".stripMargin) { (s, d) =>
    val t = col("t")
    documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), size(t).as("n_tokens"), t,
        explode(sequence(lit(1), greatest(size(t) - 1, lit(1)),
          lit(ChunkStride))).as("chunk_start"))
      .select(col("doc_id"), col("n_tokens"),
        col("chunk_start").cast(IntegerType).as("chunk_start"),
        least(col("n_tokens") - col("chunk_start") + 1, lit(ChunkSize))
          .cast(IntegerType).as("chunk_len"),
        concat_ws(" ", slice(t, col("chunk_start"), lit(ChunkSize)))
          .as("chunk_text"))
  }

  // ============================================================ capstone
  // The full training-corpus preparation pipeline in one declarative
  // plan: seed PII + an exact-duplicate slice (deterministically, same
  // arithmetic both engines) → redact → quality-gate → exact-dedup
  // (min-doc_id representative per fingerprint) → overlapping chunking.
  // Everything is narrow except the dedup window — one shuffle on the
  // fingerprint — and the chunk explode; at 100 TB the plan shape is a
  // scan-to-chunk stream with a single exchange.
  register("q92_training_corpus", {
    import TextOps.{emailRe, phoneRe}
    s"""WITH seeded AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN
       |           text || ' contact user' || doc_id || '@example.com now'
       |         WHEN doc_id % 5 = 0 THEN
       |           text || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
       |                || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |         ELSE text END AS text
       |  FROM documents),
       |dupped AS (
       |  SELECT doc_id, text FROM seeded
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text FROM seeded WHERE doc_id % 17 = 0),
       |red AS (
       |  SELECT doc_id,
       |    regexp_replace(regexp_replace(text, '$emailRe', '[EMAIL]', 'g'),
       |      '$phoneRe', '[PHONE]', 'g') AS text
       |  FROM dupped),
       |qual AS (
       |  SELECT doc_id, text, $oTokens AS t FROM red
       |  WHERE len($oTokens) BETWEEN 20 AND 10000
       |    AND CAST(len(list_distinct($oTokens)) AS DOUBLE) / len($oTokens) > 0.1),
       |dedup AS (
       |  SELECT doc_id, t FROM (
       |    SELECT doc_id, t,
       |      ROW_NUMBER() OVER (
       |        PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
       |        ORDER BY doc_id ASC) AS rn
       |    FROM qual) WHERE rn = 1),
       |chunks AS (
       |  SELECT doc_id, len(t) AS n_tokens,
       |    CAST(s.s AS INTEGER) AS chunk_start,
       |    array_to_string(t[s.s : s.s + ${ChunkSize - 1}], ' ') AS chunk_text,
       |    CAST(least(len(t) - s.s + 1, $ChunkSize) AS INTEGER) AS chunk_len
       |  FROM dedup, LATERAL (
       |    SELECT unnest(range(1, greatest(len(t) - 1, 1) + 1, $ChunkStride)) AS s) s)
       |SELECT doc_id, n_tokens, chunk_start, chunk_len, chunk_text
       |FROM chunks""".stripMargin
  }) { (s, d) =>
    import TextOps.{emailRe, phoneRe}
    val base = documents(s, d).select(col("doc_id"), col("text"))
    val seeded = base.select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com now")))
        .when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" call 555-"),
            lpad((col("doc_id") % 1000).cast(StringType), 3, "0"),
            lit("-"),
            lpad((col("doc_id") % 10000).cast(StringType), 4, "0")))
        .otherwise(col("text")).as("text"))
    val dupped = seeded.unionAll(
      seeded.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val red = dupped.select(col("doc_id"),
      regexp_replace(regexp_replace(col("text"), emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]").as("text"))
    val t = tokens(col("text"))
    val qual = red
      .filter(size(t).between(20, 10000) &&
        size(array_distinct(t)).cast(DoubleType) / size(t) > 0.1)
      .select(col("doc_id"), col("text"), t.as("t"))
    val wFp = Window
      .partitionBy(md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      .orderBy(col("doc_id").asc)
    val dedup = qual.withColumn("rn", row_number().over(wFp))
      .filter(col("rn") === 1).select(col("doc_id"), col("t"))
    dedup
      .select(col("doc_id"), size(col("t")).as("n_tokens"), col("t"),
        explode(sequence(lit(1), greatest(size(col("t")) - 1, lit(1)),
          lit(ChunkStride))).as("chunk_start"))
      .select(col("doc_id"), col("n_tokens"),
        col("chunk_start").cast(IntegerType).as("chunk_start"),
        least(col("n_tokens") - col("chunk_start") + 1, lit(ChunkSize))
          .cast(IntegerType).as("chunk_len"),
        concat_ws(" ", slice(col("t"), col("chunk_start"), lit(ChunkSize)))
          .as("chunk_text"))
  }


  // ==================== training corpus over the CLEANED corpus (q240)
  // The exact-substring REMOVAL pass (q239) feeding the corpus-assembly
  // capstone (r17 verdict task 3): cleaned text → quality filter →
  // exact-fingerprint dedup → overlapping chunk emission — q92's
  // assembly tail, with the input corpus exact-substring-deduped
  // instead of raw. The oracle replays the ENTIRE chain (span census →
  // witness ranking → interval union → segment rebuild → tokenize →
  // chunk), so a single character lost or duplicated by the removal
  // writer shifts a chunk boundary and breaks the hash.
  register("q240_cleaned_training_corpus", {
    s"""WITH ${DedupOps.oCleanedCtes},
       |corpus AS (
       |  SELECT d.doc_id,
       |    COALESCE(c.cleaned_text,
       |      CASE WHEN r.doc_id IS NULL THEN d.text ELSE '' END) AS text
       |  FROM d
       |  LEFT JOIN cleaned c ON d.doc_id = c.doc_id
       |  LEFT JOIN rmc r ON d.doc_id = r.doc_id),
       |qual AS (
       |  SELECT doc_id, text, $oTokens AS t FROM corpus
       |  WHERE len($oTokens) BETWEEN 20 AND 10000
       |    AND CAST(len(list_distinct($oTokens)) AS DOUBLE) / len($oTokens) > 0.1),
       |dedup AS (
       |  SELECT doc_id, t FROM (
       |    SELECT doc_id, t,
       |      ROW_NUMBER() OVER (
       |        PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
       |        ORDER BY doc_id ASC) AS rn
       |    FROM qual) WHERE rn = 1),
       |chunks AS (
       |  SELECT doc_id, len(t) AS n_tokens,
       |    CAST(s.s AS INTEGER) AS chunk_start,
       |    array_to_string(t[s.s : s.s + ${ChunkSize - 1}], ' ') AS chunk_text,
       |    CAST(least(len(t) - s.s + 1, $ChunkSize) AS INTEGER) AS chunk_len
       |  FROM dedup, LATERAL (
       |    SELECT unnest(range(1, greatest(len(t) - 1, 1) + 1, $ChunkStride)) AS s) s)
       |SELECT doc_id, n_tokens, chunk_start, chunk_len, chunk_text
       |FROM chunks""".stripMargin
  }) { (s, d) =>
    val corpus = DedupOps.cleanedCorpus(s, d)
      .select(col("doc_id"), col("cleaned_text").as("text"))
    val t = tokens(col("text"))
    val qual = corpus
      .filter(size(t).between(20, 10000) &&
        size(array_distinct(t)).cast(DoubleType) / size(t) > 0.1)
      .select(col("doc_id"), col("text"), t.as("t"))
    val wFp = Window
      .partitionBy(md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      .orderBy(col("doc_id").asc)
    val dedup = qual.withColumn("rn", row_number().over(wFp))
      .filter(col("rn") === 1).select(col("doc_id"), col("t"))
    dedup
      .select(col("doc_id"), size(col("t")).as("n_tokens"), col("t"),
        explode(sequence(lit(1), greatest(size(col("t")) - 1, lit(1)),
          lit(ChunkStride))).as("chunk_start"))
      .select(col("doc_id"), col("n_tokens"),
        col("chunk_start").cast(IntegerType).as("chunk_start"),
        least(col("n_tokens") - col("chunk_start") + 1, lit(ChunkSize))
          .cast(IntegerType).as("chunk_len"),
        concat_ws(" ", slice(col("t"), col("chunk_start"), lit(ChunkSize)))
          .as("chunk_text"))
  }

  // ============================================================ packing
  // shard-wise concat-and-chunk: token offsets from a per-shard running
  // sum (ordered by doc_id — stable), sequence id = floor(offset/CtxLen).
  // Output: per packed sequence, its doc span and fill statistics.
  register("q75_sequence_packing", {
    val h = oHash60Seeded(31, "CAST(doc_id AS VARCHAR)")
    s"""WITH tok AS (
       |  SELECT doc_id, len($oTokens) AS n_tokens,
       |    CAST($h % $Shards AS INTEGER) AS shard
       |  FROM documents),
       |offsets AS (
       |  SELECT doc_id, n_tokens, shard,
       |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
       |      AS start_offset
       |  FROM tok),
       |assigned AS (
       |  SELECT shard, CAST(start_offset // $CtxLen AS BIGINT) AS seq_id,
       |    doc_id, n_tokens
       |  FROM offsets)
       |SELECT shard, seq_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       |  CAST(SUM(n_tokens) AS BIGINT) AS span_tokens
       |FROM assigned GROUP BY shard, seq_id""".stripMargin
  }) { (s, d) =>
    val shard = (hash60Seeded(31, col("doc_id").cast(StringType)) % Shards)
      .cast(IntegerType)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = sum(col("n_tokens")).over(w) - col("n_tokens")
    documents(s, d)
      .select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"),
        shard.as("shard"))
      .withColumn("start_offset", us)
      .withColumn("seq_id",
        ((col("start_offset") - pmod(col("start_offset"), lit(CtxLen.toLong)))
          / CtxLen).cast(LongType))
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        sum(col("n_tokens")).as("span_tokens"))
  }

  // ================================================ length bucketing
  // Sequence-length bucket audit — the batch-efficiency planning step
  // for bucketed batching: documents bucket to the next power-of-two
  // token length; per bucket, the padded-token bill (bucket·docs) and
  // the waste it implies. The power-of-two ladder is a CASE chain of
  // integer comparisons (no log2 — transcendental-free, identical in
  // both engines); everything else is exact integer sums with one
  // final division. Map-only until one |buckets|-row aggregation.
  val LenBuckets: Seq[Int] = Seq(8, 16, 32, 64, 128, 256, 512, 1024,
    2048, 4096, 8192)

  register("q153_length_buckets", {
    val ladder = LenBuckets.map(b => s"WHEN n <= $b THEN $b")
      .mkString("CASE ", " ", " ELSE -1 END")
    s"""WITH lens AS (
       |  SELECT CAST(len($oTokens) AS BIGINT) AS n FROM documents),
       |bucketed AS (SELECT n, CAST($ladder AS BIGINT) AS bucket FROM lens)
       |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n) AS BIGINT) AS total_tokens,
       |  bucket * CAST(COUNT(*) AS BIGINT) AS padded_tokens,
       |  bucket * CAST(COUNT(*) AS BIGINT) - CAST(SUM(n) AS BIGINT)
       |    AS wasted_tokens,
       |  CAST(bucket * CAST(COUNT(*) AS BIGINT) - CAST(SUM(n) AS BIGINT)
       |    AS DOUBLE) / (bucket * CAST(COUNT(*) AS BIGINT)) AS waste_ratio
       |FROM bucketed GROUP BY bucket""".stripMargin
  }) { (s, d) =>
    val n = col("n")
    val ladder = LenBuckets.reverse.foldLeft(lit(-1L)) { (acc, b) =>
      when(n <= b, b.toLong).otherwise(acc) }
    val padded = col("bucket") * col("n_docs")
    documents(s, d)
      .select(size(tokens(col("text"))).cast(LongType).as("n"))
      .select(n, ladder.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(n).as("total_tokens"))
      .select(col("bucket"), col("n_docs"), col("total_tokens"),
        padded.as("padded_tokens"),
        (padded - col("total_tokens")).as("wasted_tokens"),
        ((padded - col("total_tokens")).cast(DoubleType) / padded)
          .as("waste_ratio"))
  }

  /** Shards for the balanced-writer audit (q198) — a writer fleet size,
    * deliberately independent of [[Shards]] (the packing scatter). */
  val WriterShards = 16

  // ===================================== token-balanced shard assignment
  // The training-data WRITER step: assign every document to one of
  // [[WriterShards]] output shards so the per-shard token bill is
  // near-equal (straggler-free downstream tokenization), and make the
  // assignment DETERMINISTIC — rerunning the pipeline reproduces the
  // same shards bit-for-bit (no rand(), no partition-order dependence).
  // Longest-processing-time-first round-robin: rank docs by (tokens
  // DESC, doc_id), shard = (rank-1) mod S. LPT round-robin bounds the
  // shard spread by the largest document's share, and the rank comes
  // from the q149 two-pass decomposition — range-partition on the sort
  // key, rank within partitions, add partition-count prefix offsets —
  // so there is NO global-sort single partition anywhere: this is the
  // operator a 100 TB corpus writer actually runs. Output is the
  // S-row balance audit (doc/token bill per shard + each shard's token
  // share in ppm), the quantity an operator pages on.
  register("q198_shard_packing",
    s"""WITH t AS (SELECT doc_id,
       |    CAST(len($oTokens) AS BIGINT) AS tokens FROM documents),
       |r AS (SELECT doc_id, tokens, ROW_NUMBER() OVER (
       |        ORDER BY tokens DESC, doc_id ASC) AS rn FROM t),
       |g AS (SELECT (rn - 1) % $WriterShards AS shard,
       |        CAST(COUNT(*) AS BIGINT) AS n_docs,
       |        CAST(SUM(tokens) AS BIGINT) AS token_sum
       |      FROM r GROUP BY 1),
       |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens FROM t)
       |SELECT shard, n_docs, token_sum,
       |  (token_sum * 1000000) // total_tokens AS share_ppm
       |FROM g, tot""".stripMargin) { (s, d) =>
    val t = documents(s, d)
      .select(col("doc_id"), size(tokens(col("text"))).cast(LongType).as("tokens"))
    // q149 two-pass global rank on (tokens DESC, doc_id): range
    // partitions follow the sort key, so pid order IS rank order and
    // the offsets window rides the ≤32-row partition-count frame.
    val local = t.repartitionByRange(32, col("tokens").desc, col("doc_id").asc)
      .select(col("doc_id"), col("tokens"), spark_partition_id().as("pid"))
      .select(col("doc_id"), col("tokens"), col("pid"),
        row_number().over(Window.partitionBy(col("pid"))
          .orderBy(col("tokens").desc, col("doc_id").asc)).as("local_rn"))
    val offsets = local.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .select(col("pid"), coalesce(sum(col("cnt")).over(
        Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("offset"))
    val sharded = local.join(broadcast(offsets), Seq("pid"))
      .select(col("tokens"),
        ((col("offset") + col("local_rn") - 1) % WriterShards).as("shard"))
    val g = sharded.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("token_sum"))
    // corpus total as an unbounded window over the 16-row shard frame —
    // NOT a second corpus scan (a separate t.agg doubles the rank
    // lineage in the plan) and NOT a cross join; the single-partition
    // exchange this plans moves exactly WriterShards rows
    g.select(col("shard"), col("n_docs"), col("token_sum"),
        sum(col("token_sum")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))
          .as("total_tokens"))
      .select(col("shard"), col("n_docs"), col("token_sum"),
        expr("(token_sum * 1000000) div total_tokens")
          .as("share_ppm"))
  }
}
