package graft.queries

import graft.llm.Corpus

/** Corpus-preparation operators (graft.llm.Corpus) under the oracle
  * gate: chunking, stratified sampling, token-stream packing, mixture
  * accounting, decontamination — all deterministic by construction
  * (md5-derived sampling hash, doc_id-ordered packing), so every query
  * carries a FULL DuckDB oracle that re-derives the same pipeline.
  */
object CorpusPack extends QueryPack {

  val queries: Map[String, Q] = Map(
    "q77_chunking" -> ((s, d) =>
      Corpus.chunk(t("documents")(s, d), chunkTokens = 32, overlap = 8)),
    "q78_sample_stratified" -> ((s, d) =>
      Corpus.stratifiedSample(t("documents")(s, d),
        rates = Map("en" -> 0.25, "zh" -> 0.75))),
    "q79_pack_stream" -> ((s, d) =>
      Corpus.packStream(t("documents")(s, d), budget = 256)),
    "q80_mix_weights" -> ((s, d) => Corpus.mixWeights(t("documents")(s, d))),
    "q81_decontam" -> ((s, d) => Corpus.decontaminate(t("documents")(s, d))),
    // Deterministic epoch shuffle: md5-derived shard + in-shard
    // position, fully re-derivable by the oracle (no rand()).
    "q86_shard_shuffle" -> ((s, d) => Corpus.shardShuffle(t("documents")(s, d))))

  private val tokCte =
    """tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      |        FROM documents)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q77_chunking" ->
      s"""WITH $tokCte,
         |n AS (SELECT doc_id, w, CAST(len(w) AS INTEGER) AS n FROM tok),
         |c AS (SELECT doc_id, w, n, (greatest(n - 8, 1) + 23) // 24 AS nc
         |      FROM n),
         |e AS (SELECT doc_id, w, n, CAST(unnest(range(nc)) AS INTEGER)
         |        AS chunk_id
         |      FROM c)
         |SELECT doc_id, chunk_id,
         |       array_to_string(
         |         list_slice(w, chunk_id * 24 + 1, chunk_id * 24 + 32), ' ')
         |         AS chunk,
         |       CAST(least(n - chunk_id * 24, 32) AS INTEGER) AS chunk_tokens
         |FROM e""".stripMargin,

    "q78_sample_stratified" ->
      """WITH h AS (SELECT doc_id, lang, source,
        |             md5('smp:' || CAST(doc_id AS VARCHAR)) AS m
        |           FROM documents),
        |u AS (SELECT doc_id, lang, source, CAST(
        |    (strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
        |  + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1) AS INTEGER)
        |    AS h16 FROM h)
        |SELECT doc_id, lang, source, h16 FROM u
        |WHERE CAST(h16 AS DOUBLE) / CAST(65536 AS DOUBLE) <
        |      CASE lang WHEN 'en' THEN CAST(0.25 AS DOUBLE)
        |                WHEN 'zh' THEN CAST(0.75 AS DOUBLE)
        |                ELSE CAST(1 AS DOUBLE) END""".stripMargin,

    "q79_pack_stream" ->
      """WITH s AS (SELECT doc_id, lang,
        |        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER)
        |          AS n_tok
        |      FROM documents),
        |c AS (SELECT doc_id, lang, n_tok,
        |        CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id)
        |             AS BIGINT) AS cum
        |      FROM s)
        |SELECT doc_id, lang, n_tok,
        |       (cum - n_tok) // 256 AS pack_id,
        |       ((cum - 1) // 256) - ((cum - n_tok) // 256) + 1 AS n_windows,
        |       CAST(cum - n_tok - ((cum - n_tok) // 256) * 256 AS INTEGER)
        |         AS pack_offset
        |FROM c""".stripMargin,

    "q80_mix_weights" ->
      """WITH s AS (SELECT lang,
        |             len(regexp_split_to_array(trim(text), '\s+')) AS n
        |           FROM documents),
        |g AS (SELECT lang, count(*) AS n_docs, CAST(sum(n) AS BIGINT)
        |        AS n_tokens FROM s GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM g)
        |SELECT lang, n_docs, n_tokens,
        |       CAST(round(CAST(n_tokens AS DOUBLE) / total_tokens, 6) AS REAL)
        |         AS share,
        |       CAST(round(CAST(0.2 AS DOUBLE) /
        |            (CAST(n_tokens AS DOUBLE) / total_tokens), 4) AS REAL)
        |         AS weight
        |FROM g, t""".stripMargin,

    "q81_decontam" ->
      s"""WITH $tokCte,
         |idx AS (SELECT doc_id, generate_subscripts(w, 1) AS i, w FROM tok),
         |sh AS (SELECT DISTINCT doc_id,
         |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
         |           || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6]
         |           || ' ' || w[i+7] AS s
         |       FROM idx WHERE i + 7 <= len(w)),
         |bench AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id % 50 = 0),
         |corp AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
         |SELECT c.doc_id, count(DISTINCT c.s) AS n_contaminated,
         |       min(b.bench_id) AS first_bench
         |FROM corp c JOIN bench b ON c.s = b.s
         |GROUP BY 1""".stripMargin,

    // Re-derives shard = md5 high 16 bits mod 8 and the in-shard md5
    // order; hex ordering is plain byte order in both engines.
    "q86_shard_shuffle" ->
      """WITH h AS (SELECT doc_id,
        |             md5('ep0:' || CAST(doc_id AS VARCHAR)) AS h
        |           FROM documents),
        |s AS (SELECT doc_id, h, CAST((
        |    (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
        |  + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) % 8
        |    AS INTEGER) AS shard FROM h)
        |SELECT doc_id, shard,
        |       CAST(row_number() OVER (PARTITION BY shard
        |         ORDER BY h, doc_id) AS INTEGER) AS pos
        |FROM s""".stripMargin)
}
