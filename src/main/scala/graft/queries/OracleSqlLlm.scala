package graft.queries

/** DuckDB oracle SQL for the text-analysis + dedup inventory
  * (SURVEY.md §2.4-H and the LLM-pipeline north star). Seams beyond
  * §2.2: string_split ↔ split, unnest ↔ explode, list_* lambdas ↔
  * higher-order functions, 1-based t[i] ↔ 0-based t[i],
  * range(1,n) (end-exclusive) ↔ sequence(0,n) (inclusive),
  * CAST('0x…' AS BIGINT) ↔ conv(…,16,10) for the md5-derived token
  * hash, list_reduce(list_prepend(0,…)) ↔ aggregate(…, 0, …).
  */
object OracleSqlLlm {


  /** Shared ExactSubstr span-detection CTE chain (w/shared/m/b/i) over
    * a prior CTE `src` holding (doc_id, t) with len(t) >= 20 —
    * single-sourced so the q_dedup_substring and q_scrub_substring
    * oracles cannot drift apart (the r12 ContainmentDecomp re-spelling
    * lesson applied to oracle SQL; r13 self-review). */
  private def spanCtes(src: String): String =
    s"""w AS (SELECT doc_id, s,
       |        CAST(concat('0x', substring(md5(
       |          array_to_string(t[s:s+19], ' ')),1,8)) AS BIGINT) AS h
       |      FROM (SELECT doc_id, t, unnest(range(1, len(t)-20+2)) AS s
       |            FROM $src) e),
       |shared AS (SELECT h FROM w GROUP BY h
       |           HAVING count(DISTINCT doc_id) >= 2),
       |m AS (SELECT doc_id, s FROM w SEMI JOIN shared USING(h)),
       |b AS (SELECT doc_id, s,
       |        CASE WHEN s > lag(s) OVER (PARTITION BY doc_id ORDER BY s)
       |                      + 20 THEN 1 ELSE 0 END AS brk
       |      FROM m),
       |i AS (SELECT doc_id, s,
       |        sum(brk) OVER (PARTITION BY doc_id ORDER BY s
       |                       ROWS UNBOUNDED PRECEDING) AS isl
       |      FROM b)""".stripMargin

  /** Weighted adjacent-pair counts CTE over a wrapped-symbol
    * vocabulary CTE `src` (s, f) — the DuckDB twin of
    * TextOps.bpePairCounts (len >= 2 guards the empty range exactly
    * like the engine's size >= 2). */
  private def bpePairCte(name: String, src: String): String =
    s"""$name AS (
       |  SELECT p.a AS a, p.b AS b, CAST(sum(f) AS BIGINT) AS cnt FROM (
       |    SELECT f, unnest(list_transform(range(1, len(t)),
       |      i -> struct_pack(a := t[i], b := t[i+1]))) AS p
       |    FROM (SELECT f, string_split(trim(s), '  ') AS t FROM $src) q
       |    WHERE len(t) >= 2) e
       |  GROUP BY p.a, p.b)""".stripMargin

  /** One unrolled BPE merge round (r14): pair counts over v{i-1},
    * best pair b$i by (cnt desc, a, b), greedy merge into v$i via the
    * wrapped-symbol replace (see TextOps.qBpeMerges — replace-all's
    * left-to-right no-rescan pass IS the BPE merge). Generated so the
    * rounds cannot drift from each other (spanCtes discipline).
    *
    * Exhaustion guard (r15 review): when pc$i is EMPTY (vocabulary
    * fully merged before round i) the old `CROSS JOIN b$i` zeroed the
    * vocabulary while the engine's bpeLearn early-returns it
    * unchanged — the merge list rides a 1-row aggregate CTE and a
    * guarded replace instead (the batched generator's m$i shape), so
    * an empty round is the identity on both sides. The fixtures never
    * exhaust at 4 rounds, so emitted values are unchanged there. */
  private def bpeRoundCtes(i: Int): String =
    s"""${bpePairCte(s"pc$i", s"v${i - 1}")},
       |b$i AS (SELECT a, b, cnt FROM pc$i ORDER BY cnt DESC, a, b LIMIT 1),
       |mb$i AS (SELECT list(struct_pack(a := a, b := b)) AS ms FROM b$i),
       |v$i AS (SELECT CASE WHEN len(ms) >= 1 THEN
       |          replace(s, ' '||ms[1].a||'  '||ms[1].b||' ',
       |                  ' '||ms[1].a||ms[1].b||' ')
       |        ELSE s END AS s, f
       |        FROM v${i - 1} CROSS JOIN mb$i)""".stripMargin

  /** One unrolled BATCHED merge round (r15): top-B ranked candidates
    * t$i, the symbol-disjoint anti-chain s$i (NOT EXISTS on any
    * strictly higher rank sharing a symbol), the rank-ordered merge
    * list m$i, and the vocabulary rewrite v$i as `batch` nested
    * guarded replaces — the SQL spelling of the engine's rank-ordered
    * `aggregate` fold (ms[k] guarded by len(ms) >= k, so a short
    * selection list leaves the tail replaces as identity). */
  private def bpeBatchRoundCtes(i: Int, batch: Int): String = {
    val folded = (1 to batch).foldLeft("s") { (acc, k) =>
      s"""(CASE WHEN len(ms) >= $k THEN replace($acc,
         |  ' '||ms[$k].a||'  '||ms[$k].b||' ', ' '||ms[$k].a||ms[$k].b||' ')
         | ELSE $acc END)""".stripMargin
    }
    s"""${bpePairCte(s"pc$i", s"v${i - 1}")},
       |t$i AS (SELECT a, b, cnt, row_number() OVER (ORDER BY cnt DESC, a, b) AS rk
       |        FROM (SELECT a, b, cnt FROM pc$i
       |              ORDER BY cnt DESC, a, b LIMIT $batch) z$i),
       |s$i AS (SELECT rk, a, b, cnt FROM t$i i WHERE NOT EXISTS (
       |          SELECT 1 FROM t$i j WHERE j.rk < i.rk AND
       |            (j.a = i.a OR j.a = i.b OR j.b = i.a OR j.b = i.b))),
       |m$i AS (SELECT list(struct_pack(a := a, b := b) ORDER BY rk) AS ms FROM s$i),
       |v$i AS (SELECT $folded AS s, f FROM v${i - 1} CROSS JOIN m$i)""".stripMargin
  }

  val text: Map[String, String] = Map(
    // BATCHED BPE learning (r15): TextOps.BpeBatchRounds unrolled
    // rounds of top-BpeBatchSize symbol-disjoint merges — the
    // scalable-BPE shape (see qBpeMergesBatched scaladoc)
    "q_bpe_merges_batched" -> {
      val r = TextOps.BpeBatchRounds
      val b = TextOps.BpeBatchSize
      val mergeRows = (1 to r).map(i =>
        if (i == 1) s"SELECT 1 AS round, rk, a, b, cnt FROM s1"
        else s"UNION ALL SELECT $i, rk, a, b, cnt FROM s$i").mkString("\n  ")
      s"""WITH wc AS (SELECT w, CAST(count(*) AS BIGINT) AS f
         |            FROM (SELECT unnest(string_split(text,' ')) AS w
         |                  FROM documents) x
         |            GROUP BY w),
         |v0 AS (SELECT regexp_replace(w, '(.)', ' \\1 ', 'g') AS s, f FROM wc),
         |${(1 to r).map(bpeBatchRoundCtes(_, b)).mkString(",\n")}
         |SELECT round, CAST(rk AS INTEGER) AS rk, a, b, cnt FROM (
         |  $mergeRows
         |) u ORDER BY round, rk""".stripMargin
    },

    // BPE ENCODE of novel words (r17): recompute the batched merge
    // table (same unrolled rounds), collect it rank-ordered
    // (round-major, rk-minor), and fold it over each doubled corpus
    // word as rounds×batch guarded nested replaces — the SQL spelling
    // of the engine's single `aggregate` fold over the global list.
    "q_bpe_encode" -> {
      val r = TextOps.BpeBatchRounds
      val b = TextOps.BpeBatchSize
      // LINEAR fold, not the batch-round CASE shape: CASE duplicates
      // `acc` in its ELSE branch, which doubles the generated SQL per
      // level — fine at batch 8 (2⁸), an OOM at the 32-entry global
      // list (2³², found the hard way). Past-the-end list entries are
      // NULL; coalescing each side to ' ' makes the pattern carry ≥ 3
      // consecutive spaces, which a wrapped symbol string (single
      // space, symbol, double space) can never contain — replace
      // becomes the identity without branching, `acc` appears once,
      // and the SQL stays linear in the merge count.
      val folded = (1 to r * b).foldLeft("s") { (acc, k) =>
        s"""replace($acc,
           |  ' '||coalesce(ms[$k].a,' ')||'  '||coalesce(ms[$k].b,' ')||' ',
           |  ' '||coalesce(ms[$k].a,'')||coalesce(ms[$k].b,'')||' ')""".stripMargin
      }
      val mergeRows = (1 to r).map(i =>
        if (i == 1) s"SELECT 1 AS round, rk, a, b FROM s1"
        else s"UNION ALL SELECT $i, rk, a, b FROM s$i").mkString("\n  ")
      s"""WITH wc AS (SELECT w, CAST(count(*) AS BIGINT) AS f
         |            FROM (SELECT unnest(string_split(text,' ')) AS w
         |                  FROM documents) x
         |            GROUP BY w),
         |v0 AS (SELECT regexp_replace(w, '(.)', ' \\1 ', 'g') AS s, f FROM wc),
         |${(1 to r).map(bpeBatchRoundCtes(_, b)).mkString(",\n")},
         |gm AS (SELECT list(struct_pack(a := a, b := b) ORDER BY round, rk) AS ms
         |       FROM ($mergeRows) u),
         |nw AS (SELECT w || reverse(w) AS w FROM (
         |  SELECT DISTINCT w FROM (SELECT unnest(string_split(text,' ')) AS w
         |                          FROM documents) x
         |  WHERE length(w) > 0) d),
         |enc AS (SELECT w, $folded AS s FROM (
         |  SELECT w, regexp_replace(w, '(.)', ' \\1 ', 'g') AS s FROM nw) e
         |  CROSS JOIN gm)
         |SELECT w, CAST(len(string_split(trim(s), '  ')) AS INTEGER) AS n_sym,
         |       trim(s) AS spelling
         |FROM enc ORDER BY w LIMIT 300""".stripMargin
    },

    // BPE merge table + surviving pair counts: wordcount → wrapped
    // char symbols → TextOps.BpeMergeRounds unrolled merge rounds
    // (the kmeans/pagerank iteration-unrolling precedent); every
    // value is an exact integer or a symbol string.
    "q_bpe_merges" -> {
      val r = TextOps.BpeMergeRounds
      val mergeRows = (1 to r).map(i =>
        if (i == 1) s"SELECT 1 AS round, a, b, cnt FROM b1"
        else s"UNION ALL SELECT $i, a, b, cnt FROM b$i").mkString("\n  ")
      s"""WITH wc AS (SELECT w, CAST(count(*) AS BIGINT) AS f
         |            FROM (SELECT unnest(string_split(text,' ')) AS w
         |                  FROM documents) x
         |            GROUP BY w),
         |v0 AS (SELECT regexp_replace(w, '(.)', ' \\1 ', 'g') AS s, f FROM wc),
         |${(1 to r).map(bpeRoundCtes).mkString(",\n")},
         |${bpePairCte(s"pc${r + 1}", s"v$r")}
         |SELECT round, a, b, cnt FROM (
         |  $mergeRows
         |  UNION ALL SELECT ${r + 1}, a, b, cnt FROM (
         |    SELECT a, b, cnt FROM pc${r + 1}
         |    ORDER BY cnt DESC, a, b LIMIT 15) sv
         |) u ORDER BY round, cnt DESC, a, b""".stripMargin
    },

    // BPE tokenize (r14): the learn chain's final vocabulary IS every
    // word's tokenization — symbol stats explode it weighted by the
    // wordcount, no second corpus pass.
    "q_bpe_tokenize" -> {
      val r = TextOps.BpeMergeRounds
      s"""WITH wc AS (SELECT w, CAST(count(*) AS BIGINT) AS f
         |            FROM (SELECT unnest(string_split(text,' ')) AS w
         |                  FROM documents) x
         |            GROUP BY w),
         |v0 AS (SELECT regexp_replace(w, '(.)', ' \\1 ', 'g') AS s, f FROM wc),
         |${(1 to r).map(bpeRoundCtes).mkString(",\n")}
         |SELECT sym, CAST(sum(f) AS BIGINT) AS n_tok,
         |       CAST(count(DISTINCT s) AS BIGINT) AS n_words
         |FROM (SELECT s, f, unnest(string_split(trim(s), '  ')) AS sym
         |      FROM v$r) e
         |GROUP BY sym ORDER BY n_tok DESC, sym LIMIT 30""".stripMargin
    },
    // BM25: per-term fragments generated so the three terms cannot
    // drift from the Spark side's list; constants are the literals
    // 2.2/1.2/0.25/0.75 in both engines (see qTextBm25 scaladoc)
    "q_text_bm25" -> {
      val terms = Seq("query", "join", "scan")
      val tfCols = terms.map(t =>
        s"len(list_filter(string_split(text, ' '), x -> x = '$t')) AS tf_$t")
        .mkString(",\n    ")
      val dfCols = terms.map(t =>
        s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t")
        .mkString(",\n    ")
      val scoreSum = terms.map(t =>
        s"(CASE WHEN tf_$t > 0 THEN ln(1 + (nd - df_$t + 0.5)/(df_$t + 0.5))" +
        s" * tf_$t * 2.2 / (tf_$t + 1.2 * (0.25 + 0.75 * dl / avgdl)) ELSE 0 END)")
        .mkString("\n    + ")
      s"""WITH base AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         |    $tfCols
         |  FROM documents),
         |stats AS (
         |  SELECT count(*) AS nd, round(avg(dl), 6) AS avgdl,
         |    $dfCols
         |  FROM base),
         |scored AS (
         |  SELECT doc_id, round($scoreSum, 4) AS bm25 FROM base, stats)
         |SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
    },
    "q_text_wordcount" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(text,' ')) AS word FROM documents) t
        |GROUP BY word ORDER BY n DESC, word LIMIT 100""".stripMargin,

    "q_text_tfidf" ->
      """WITH toks AS (SELECT lang, doc_id, unnest(string_split(text,' ')) AS word FROM documents),
        |tf AS (SELECT lang, word, count(*) AS tf FROM toks GROUP BY 1,2),
        |dfw AS (SELECT word, count(*) AS df
        |        FROM (SELECT DISTINCT doc_id, word FROM toks) x GROUP BY 1),
        |nd AS (SELECT count(*) AS nd FROM documents),
        |s AS (SELECT lang, word, round(tf * ln(CAST(nd AS DOUBLE)/df), 4) AS tfidf
        |      FROM tf JOIN dfw USING(word) CROSS JOIN nd),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY tfidf DESC, word) AS rk FROM s)
        |SELECT lang, word, tfidf, rk FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,

    "q_text_profile" ->
      """SELECT lang, source, count(*) AS n, round(avg(n_chars),2) AS avg_chars,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |       round(avg(CAST(len(string_split(text,' ')) AS DOUBLE)),2) AS avg_toks
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q_text_tokens" ->
      """SELECT doc_id, n_chars, len(string_split(text,' ')) AS n_ws,
        |       len(regexp_extract_all(text,'[a-z]+')) AS n_words,
        |       len(regexp_extract_all(text,'[a-z]{1,4}')) AS n_bpe,
        |       round(length(replace(text,' ','')) /
        |             CAST(len(string_split(text,' ')) AS DOUBLE), 4) AS avg_wlen
        |FROM documents ORDER BY doc_id LIMIT 300""".stripMargin,

    "q_text_quality" ->
      """SELECT doc_id, n_tok, ttr, stop_ratio, short_flag,
        |       round(ttr * (1.0 - stop_ratio), 4) AS score FROM (
        |  SELECT doc_id, len(t) AS n_tok,
        |    round(len(list_distinct(t)) / CAST(len(t) AS DOUBLE), 4) AS ttr,
        |    round(len(list_filter(t, w -> w IN ('the','a','of','and','to','in')))
        |          / CAST(len(t) AS DOUBLE), 4) AS stop_ratio,
        |    n_chars < 100 AS short_flag
        |  FROM (SELECT doc_id, n_chars, string_split(text,' ') AS t FROM documents) x) y
        |ORDER BY doc_id LIMIT 300""".stripMargin,

    "q_text_langid" ->
      """WITH s AS (
        |  SELECT lang,
        |    len(list_filter(t, w -> w IN ('the','a','of'))) AS s_en,
        |    len(list_filter(t, w -> w IN ('der','die','und'))) AS s_de,
        |    len(list_filter(t, w -> w IN ('el','los','de'))) AS s_es,
        |    len(list_filter(t, w -> w IN ('le','les','et'))) AS s_fr
        |  FROM (SELECT lang, string_split(text,' ') AS t FROM documents) x)
        |SELECT lang,
        |       CASE WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
        |            WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
        |            WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred,
        |       count(*) AS n
        |FROM s GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin,

    "q_text_bigrams" ->
      """WITH bi AS (
        |  SELECT t[i] AS w1, t[i+1] AS w2 FROM (
        |    SELECT t, unnest(range(1, len(t))) AS i
        |    FROM (SELECT string_split(text,' ') AS t FROM documents) d) x),
        |counts AS (SELECT w1, w2, count(*) AS n FROM bi GROUP BY w1, w2),
        |marg AS (SELECT w1, count(*) AS n_w1 FROM bi GROUP BY w1)
        |SELECT counts.w1, w2, n, n_w1 FROM counts JOIN marg USING(w1)
        |ORDER BY n DESC, w1, w2 LIMIT 100""".stripMargin,

    "q_text_chunk" ->
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS t
        |           FROM documents WHERE doc_id < 100),
        |e AS (SELECT doc_id, t, unnest(range(1, len(t)+1, 10)) AS s FROM d)
        |SELECT doc_id, s AS chunk_start,
        |       array_to_string(t[s:s+19], ' ') AS chunk,
        |       len(t[s:s+19]) AS chunk_toks
        |FROM e ORDER BY doc_id, chunk_start""".stripMargin,

    "q_text_sample" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents
        |WHERE CAST(concat('0x', substring(md5(text),1,4)) AS INTEGER) % 100 < 10
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_text_contamination" ->
      """WITH g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
        |         i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS gs
        |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents) x),
        |e AS (SELECT doc_id, unnest(gs) AS gram FROM g),
        |bench AS (SELECT DISTINCT gram, doc_id AS bench_doc FROM e WHERE doc_id < 5)
        |SELECT c.doc_id, bench_doc, count(DISTINCT c.gram) AS shared
        |FROM e c JOIN bench b USING(gram) WHERE c.doc_id >= 5
        |GROUP BY 1, 2 ORDER BY shared DESC, doc_id, bench_doc""".stripMargin,

    // single-window twin of the engine's two-pass distributed prefix
    // sum — the cumsum is partition-layout-independent so they agree
    "q_pack_shards" ->
      """WITH t AS (SELECT doc_id,
        |       CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok FROM documents),
        |c AS (SELECT doc_id, n_tok, sum(n_tok) OVER
        |        (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t)
        |SELECT CAST((cum - n_tok) // 2000 AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // sequence-packing twin of GraftOps.packSequences: the single
    // global window is FINE in DuckDB at fixture scale — the engine
    // side is the two-pass prefix sum; span arithmetic is integer on
    // both sides. range() is end-exclusive, hence the (cum-1)//B + 1.
    // n_tok > 0 mirrors the engine's zero-token-doc filter: without
    // it range() emits one zero-width row when n_tok = 0 lands
    // mid-sequence — unreachable on the fixtures, but the pair must
    // agree for all inputs (r14, ADVICE r13).
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, n_tok, sum(n_tok) OVER (ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t),
        |s AS (SELECT doc_id, cum - n_tok AS st, cum,
        |        unnest(range(CAST((cum - n_tok) // 256 AS BIGINT),
        |                     CAST((cum - 1) // 256 + 1 AS BIGINT)))
        |          AS seq_id
        |      FROM c WHERE n_tok > 0)
        |SELECT seq_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(least(cum, (seq_id + 1) * 256) -
        |           greatest(st, seq_id * 256)) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM s GROUP BY seq_id ORDER BY seq_id""".stripMargin,

    // data-mixing twin of GraftOps.mixSources: one window per source
    // is FINE here (DuckDB, small SFs) — the engine side replaces it
    // with the grouped two-pass prefix sum so a giant source never
    // becomes a single-task sort; both accumulate integer token
    // counts over the same md5∥doc_id shuffle order, so the keep rule
    // is exact on both sides
    "q_mix_sources" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok,
        |    concat(md5(CAST(doc_id AS VARCHAR)),
        |           lpad(CAST(doc_id AS VARCHAR), 20, '0')) AS h
        |  FROM documents),
        |c AS (SELECT *, sum(n_tok) OVER (PARTITION BY source ORDER BY h
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t),
        |b AS (SELECT *, CASE WHEN CAST(substring(source, 4) AS INT) % 2 = 0
        |        THEN 4000 ELSE 2000 END AS budget FROM c)
        |SELECT source, CAST(max(budget) AS BIGINT) AS budget,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS tokens
        |FROM b WHERE cum - n_tok < budget
        |GROUP BY source ORDER BY source""".stripMargin,

    // same fixed bucket hash on both sides — the depth rows are the 4
    // disjoint 8-hex-char slices of one md5; a CMS is deterministic
    // relational algebra, unlike randomized sketches
    "q_sketch_cms" ->
      """WITH toks AS (SELECT unnest(string_split(text,' ')) AS token FROM documents),
        |entries AS (SELECT token, d,
        |    CAST(concat('0x', substring(md5(token), 1 + d * 8, 8)) AS BIGINT) % 16 AS b
        |  FROM toks, range(0,4) r(d)),
        |sketch AS (SELECT d, b, count(*) AS c FROM entries GROUP BY d, b),
        |exact AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_n FROM toks
        |          GROUP BY token ORDER BY exact_n DESC, token LIMIT 15),
        |cand AS (SELECT token, exact_n, d,
        |    CAST(concat('0x', substring(md5(token), 1 + d * 8, 8)) AS BIGINT) % 16 AS b
        |  FROM exact, range(0,4) r(d))
        |SELECT token, exact_n, CAST(min(c) AS BIGINT) AS est_n
        |FROM cand JOIN sketch USING (d, b)
        |GROUP BY token, exact_n ORDER BY exact_n DESC, token""".stripMargin,

    // τ=0.5 temperature mixing: integer isqrt weights keep the rule
    // bucket·W·cnt < K·w·10⁴ exact — no doubles near the boundary
    "q_sample_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS cnt,
        |             CAST(floor(sqrt(count(*))) AS BIGINT) AS w
        |           FROM documents GROUP BY lang),
        |tw AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM c),
        |k AS (SELECT d.lang, cnt, w, tw,
        |        CAST(concat('0x', substring(md5(text),1,4)) AS BIGINT) % 10000 AS bucket
        |      FROM documents d JOIN c USING (lang) CROSS JOIN tw)
        |SELECT lang, CAST(max(cnt) AS BIGINT) AS n_total,
        |  CAST(max(w) AS BIGINT) AS weight,
        |  CAST(sum(CASE WHEN bucket * tw * cnt < 100 * w * 10000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    // same exact-integer keep rule (bucket·cnt < 20·10⁴) as the engine
    "q_sample_stratified" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |k AS (SELECT d.lang, cnt, n_chars,
        |        CAST(concat('0x', substring(md5(text),1,4)) AS BIGINT) % 10000 AS bucket
        |      FROM documents d JOIN c USING (lang))
        |SELECT lang, CAST(max(cnt) AS BIGINT) AS n_total,
        |  CAST(sum(CASE WHEN bucket * cnt < 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN bucket * cnt < 200000 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    "q_pii_scrub" ->
      """WITH u AS (
        |  SELECT c_custkey AS key, 'customer' AS entity, c_name AS name FROM customer
        |  UNION ALL
        |  SELECT s_suppkey, 'supplier', s_name FROM supplier)
        |SELECT key, entity,
        |  regexp_replace(name, '[0-9]', '#', 'g') AS name_masked,
        |  CAST(regexp_extract(name, '([0-9]+)', 1) AS BIGINT) AS id_num,
        |  substring(md5(name), 1, 12) AS id_token,
        |  len(regexp_extract_all(name, '[0-9]')) AS n_digits
        |FROM u ORDER BY entity, key LIMIT 300""".stripMargin,

    // chr(769) = U+0301 combining acute: the decomposed suffix the
    // engine adds as a literal; nfc_normalize composes it so the
    // accent-fold replace ('é' composed) fires on both engines.
    "q_text_normalize" ->
      """SELECT p_partkey, length(raw) AS raw_len,
        |  length(nfc_normalize(raw)) AS nfc_len,
        |  trim(regexp_replace(regexp_replace(
        |    replace(lower(nfc_normalize(raw)), 'é', 'e'),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
        |FROM (SELECT p_partkey,
        |        concat_ws(' ', p_name, p_brand, p_type) || ' e' || chr(769) AS raw
        |      FROM part) x
        |ORDER BY p_partkey LIMIT 300""".stripMargin,

    // ExactSubstr twin of GraftOps.sharedSpans: stride-1 20-token
    // windows hashed md5-32 (the engine's cross-engine collision rule),
    // doc-distinct df >= 2, overlapping/abutting duplicated windows
    // merged per doc by the same lag/sum gaps-and-islands CASE (NULL
    // lag on a doc's first window falls to ELSE 0 in both engines).
    "q_dedup_substring" ->
      ("""WITH d AS (SELECT doc_id, string_split(text,' ') AS t
        |           FROM documents WHERE len(string_split(text,' ')) >= 20),
        |""".stripMargin + spanCtes("d") + """
        |SELECT doc_id, min(s) AS span_start,
        |  max(s) - min(s) + 20 AS span_toks,
        |  count(*) AS n_windows
        |FROM i GROUP BY doc_id, isl
        |ORDER BY doc_id, span_start""".stripMargin),

    // Removal twin of GraftOps.scrubSharedSpans: the q_dedup_substring
    // span chain (same hash, same islands merge), spans listed per doc
    // as (a, b) structs, then every token position covered by a span
    // is cut via the same nested-lambda position filter the engine
    // evaluates (exists ↔ len(list_filter) = 0); span-free and
    // sub-width docs coalesce to an empty span list and pass through.
    "q_scrub_substring" ->
      ("""WITH d AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |dd AS (SELECT doc_id, t FROM d WHERE len(t) >= 20),
        |""".stripMargin + spanCtes("dd") + """,
        |spans AS (SELECT doc_id, min(s) AS a,
        |        min(s) + (max(s) - min(s) + 20) - 1 AS bb
        |      FROM i GROUP BY doc_id, isl),
        |sp AS (SELECT doc_id, list(struct_pack(a := a, b := bb)) AS sps
        |       FROM spans GROUP BY doc_id),
        |j AS (SELECT d.doc_id, d.t, coalesce(sp.sps, []) AS sps
        |      FROM d LEFT JOIN sp USING (doc_id)),
        |k AS (SELECT doc_id, t,
        |        list_filter(range(1, len(t)+1),
        |          p -> len(list_filter(sps, x -> p >= x.a AND p <= x.b)) = 0)
        |          AS keep
        |      FROM j)
        |SELECT doc_id,
        |  coalesce(array_to_string(list_transform(keep, p -> t[p]), ' '), '')
        |    AS clean_text,
        |  len(t) AS n_tokens, len(t) - len(keep) AS n_removed
        |FROM k ORDER BY doc_id""".stripMargin),

    // Gopher rule-filter twin of TextOps.qQualityGopher: every
    // signal is an integer and every rule an integer comparison
    // (cross-multiplied ratio bounds) — nothing to round, nothing to
    // drift.
    "q_quality_gopher" ->
      """WITH s AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |a AS (SELECT doc_id,
        |        CAST(count(*) AS BIGINT) AS n_tok,
        |        CAST(sum(length(tok)) AS BIGINT) AS csum,
        |        CAST(sum(CASE WHEN regexp_matches(tok, '[a-z]')
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
        |        CAST(sum(CASE WHEN tok IN ('the','a','of','and','to','in')
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
        |      FROM s GROUP BY doc_id)
        |SELECT doc_id, n_tok, csum, n_alpha, n_stop,
        |  (n_tok >= 30 AND n_tok <= 100000 AND
        |   csum >= n_tok * 3 AND csum <= n_tok * 10 AND
        |   n_alpha * 5 >= n_tok * 4 AND n_stop >= 2) AS keep
        |FROM a ORDER BY doc_id""".stripMargin,

    // Hashed-linear scorer twin of GraftOps.hashedLinearScore: tokens
    // hash md5-32 mod 1024, the weight of bucket b is a deterministic
    // md5 derivation on the INTEGER [-1000, 1000] grid (mirrored
    // bit-for-bit). The per-doc sum stays bigint — exact and
    // order-free; the r13 sf10 sweep caught the double-sum spelling
    // flipping 18 round-4 boundaries across 500 k docs. One /1000.0 +
    // sigmoid per doc AFTER the exact sum.
    "q_quality_linear" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substring(md5(tok),1,8)) AS BIGINT) % 1024
        |      AS bucket
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS tok
        |        FROM documents) e),
        |wt AS (SELECT bucket,
        |    CAST(concat('0x', substring(md5(CAST(bucket AS VARCHAR)),1,8))
        |        AS BIGINT) % 2001 - 1000 AS wi
        |  FROM (SELECT unnest(range(0, 1024)) AS bucket) b),
        |sc AS (SELECT doc_id, count(*) AS n_tok, sum(wi) AS swi
        |       FROM toks JOIN wt USING (bucket) GROUP BY doc_id)
        |SELECT doc_id,
        |  round(1.0 / (1.0 + exp(-(swi / (1000.0 * n_tok)))), 4) AS score,
        |  n_tok,
        |  round(1.0 / (1.0 + exp(-(swi / (1000.0 * n_tok)))), 4) >= 0.5 AS keep
        |FROM sc ORDER BY doc_id""".stripMargin,

    // DSIR importance-resampling twin of GraftOps.importanceResample:
    // hashed-unigram bucket distributions for target (lang='en') and
    // raw corpus fit in one pass, Laplace-smoothed log-ratios snapped
    // to the 1e-6 integer grid at the model side (single-ln spelling;
    // factors convert to double BEFORE multiplying — a bigint
    // cross-product would wrap int64 near 1e11 corpus tokens; both
    // engines round the identical IEEE product identically, and its
    // ≤~2^-52 relative error moves 1e6·ln(x) by ~1e-10, far under
    // the grid) so the
    // per-doc sum is an exact bigint — order-free across engines. Selection is
    // gumbel-top-100 with md5-derived noise, ordered on the ROUNDED
    // gscore + doc_id so the cutoff is a total order both engines agree
    // on. logw rounds to 4 dp in INTEGER space ((|swi|+50)//100): the
    // exact 6-decimal swi/1e6 sits on the round-4 half boundary for
    // ~1% of docs, where Spark (shortest-decimal HALF_UP) and DuckDB
    // (binary double) disagree — caught at sf0.01, doc 305.
    "q_sample_importance" ->
      """WITH toks AS (
        |  SELECT doc_id, tgt,
        |    CAST(concat('0x', substring(md5(tok),1,8)) AS BIGINT) % 1024
        |      AS bucket
        |  FROM (SELECT doc_id, lang = 'en' AS tgt,
        |               unnest(string_split(text,' ')) AS tok
        |        FROM documents) e),
        |cnt AS (SELECT bucket, count(*) AS cq,
        |               sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS cp
        |        FROM toks GROUP BY bucket),
        |tot AS (SELECT sum(cq) AS tq, sum(cp) AS tp FROM cnt),
        |model AS (SELECT b.bucket,
        |    CAST(round(1000000.0 * ln(
        |      (CAST(coalesce(cp,0) + 1 AS DOUBLE) * CAST(tq + 1024 AS DOUBLE)) /
        |      (CAST(coalesce(cq,0) + 1 AS DOUBLE) * CAST(tp + 1024 AS DOUBLE))))
        |      AS BIGINT) AS lri
        |  FROM (SELECT unnest(range(0, 1024)) AS bucket) b
        |  LEFT JOIN cnt USING (bucket) CROSS JOIN tot),
        |sc AS (SELECT doc_id, sum(lri) AS swi
        |       FROM toks JOIN model USING (bucket) GROUP BY doc_id)
        |SELECT doc_id,
        |  (CASE WHEN swi < 0 THEN -1 ELSE 1 END) *
        |    ((abs(swi) + 50) // 100) / 10000.0 AS logw,
        |  round(swi / 1000000.0 - ln(-ln(
        |    (CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),1,8))
        |       AS BIGINT) % 1000000 + 0.5) / 1000000.0)), 4) AS gscore
        |FROM sc ORDER BY gscore DESC, doc_id LIMIT 100""".stripMargin,

    // Boilerplate scrub twin of GraftOps.removeBoilerplate: aligned
    // 10-token passages, doc-distinct counts BY md5-32 HASH (the
    // engine never shuffles passage strings; mirroring the hash keeps
    // collision behaviour identical), string_agg skips the NULLed
    // removed passages exactly as concat_ws does, and coalesce('')
    // matches concat_ws's empty result for an all-boilerplate doc.
    "q_scrub_boilerplate" ->
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |c AS (SELECT doc_id, s AS chunk_start,
        |             array_to_string(t[s:s+9], ' ') AS chunk
        |      FROM (SELECT doc_id, t, unnest(range(1, len(t)+1, 10)) AS s
        |            FROM d) e),
        |hs AS (SELECT doc_id, chunk_start, chunk,
        |              CAST(concat('0x', substring(md5(chunk),1,8)) AS BIGINT) AS h
        |       FROM c),
        |bp AS (SELECT h, 1 AS bp FROM hs GROUP BY h
        |       HAVING count(DISTINCT doc_id) >= 2)
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN bp IS NULL THEN chunk END,
        |                      ' ' ORDER BY chunk_start), '') AS clean_text,
        |  count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN bp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed
        |FROM hs LEFT JOIN bp USING(h)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // 1-indexed twin of TextOps.qTextRepetition: same run-start /
    // difference arithmetic, same exact-integer verdict; DuckDB's
    // out-of-range t[0] is NULL so '<>' filters it, i=1 admitted by
    // the explicit arm — mirroring Spark's t[-1] behaviour.
    "q_text_repetition" ->
      """WITH x AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |s AS (SELECT doc_id, t, len(t) AS n_tok,
        |    list_max(list_transform(list_distinct(t),
        |                            u -> len(list_filter(t, w -> w = u)))) AS top1,
        |    greatest(len(t)-1, 0) AS bi_tot,
        |    CASE WHEN len(t) >= 2 THEN len(list_distinct(list_transform(
        |      range(1, len(t)), i -> concat_ws(' ', t[i], t[i+1])))) ELSE 0 END AS bi_dis,
        |    greatest(len(t)-2, 0) AS tri_tot,
        |    CASE WHEN len(t) >= 3 THEN len(list_distinct(list_transform(
        |      range(1, len(t)-1), i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) ELSE 0 END AS tri_dis,
        |    list_filter(range(1, len(t)+1), i -> i = 1 OR t[i] <> t[i-1]) AS b
        |  FROM x)
        |SELECT doc_id, n_tok,
        |  ((20000 * top1 + n_tok) // (2 * n_tok)) / CAST(10000 AS DOUBLE) AS top1_frac,
        |  CASE WHEN bi_tot > 0
        |       THEN ((20000 * (bi_tot - bi_dis) + bi_tot) // (2 * bi_tot)) / CAST(10000 AS DOUBLE)
        |       ELSE 0.0 END AS dup_bi_frac,
        |  CASE WHEN tri_tot > 0
        |       THEN ((20000 * (tri_tot - tri_dis) + tri_tot) // (2 * tri_tot)) / CAST(10000 AS DOUBLE)
        |       ELSE 0.0 END AS dup_tri_frac,
        |  list_max(list_transform(range(1, len(b)+1),
        |    j -> (CASE WHEN j+1 <= len(b) THEN b[j+1] ELSE n_tok+1 END) - b[j])) AS max_run,
        |  (top1 * 5 > n_tok OR (tri_tot - tri_dis) * 10 > tri_tot * 3) AS repetitive
        |FROM s ORDER BY doc_id LIMIT 300""".stripMargin,

    "q_text_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_md5, substring(sha256(text),1,16) AS fp_sha,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(text,' '),
        |           w -> CAST(concat('0x', substring(md5(w),1,8)) AS BIGINT))),
        |         (a,b) -> (a*131 + b) % 2147483647) AS fp_poly
        |FROM documents ORDER BY doc_id LIMIT 300""".stripMargin
  )

  /** Shared MinHash prologue + CAP-AWARE candidate CTEs for the three
    * minhash-family keys (pairs / clusters / keep) — r12. The pre-r12
    * spelling joined the signature table against itself on
    * `band1-match OR band2-match` with NO bucket cap, which diverged
    * from the engine in two ways the sf10 spot-sweep exposed
    * (VERDICT r11 #1's "investigate before re-declaring" finding):
    *  - semantically: the engine drops band buckets over
    *    [[DedupOps.MaxBandBucket]] from candidate generation (its
    *    declared skew guard); the oracle kept them, so the two sides
    *    agreed only while no fixture bucket exceeded the cap — true
    *    at sf ≤ 1 (max observed 20), FALSE at sf10 (99 over-cap
    *    buckets, max 860). The oracle now models the full declared
    *    semantics, cap included, so it matches at EVERY fixture SF;
    *  - operationally: DuckDB cannot hash-join an OR of two band
    *    equalities — it planned a blockwise nested loop, quadratic in
    *    corpus size (hours at sf10's 500 k docs). The capped rewrite
    *    is two equi joins + a distinct union (the same dedup the
    *    engine does map-side via its first-common-band predicate —
    *    spelled SELECT DISTINCT over UNION ALL because under `WITH
    *    RECURSIVE` DuckDB 1.0 gives any CTE whose body is a
    *    top-level UNION the recursive anchor/step treatment, which
    *    does NOT dedup across the two branches),
    *    and the jacc estimate re-derives from one join-back per side
    *    (doc_id is unique in mh, so values are unchanged).
    * `WITH RECURSIVE` up front: inert for the pairs key, required by
    * the reach() closure clusters/keep append. */
  private def mhPairCtes: String =
    s"""WITH RECURSIVE
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
       |         i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
       |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents) x),
       |hs AS (SELECT doc_id, CAST(concat('0x', substring(md5(s),1,8)) AS BIGINT) AS h
       |       FROM (SELECT doc_id, unnest(shingles) AS s FROM sh) y),
       |mh AS (SELECT doc_id,
       |    min((1*h+7) % 2147483647) AS mh1, min((3*h+11) % 2147483647) AS mh2,
       |    min((5*h+13) % 2147483647) AS mh3, min((7*h+17) % 2147483647) AS mh4
       |  FROM hs GROUP BY doc_id),
       |big1 AS (SELECT mh1, mh2 FROM mh GROUP BY mh1, mh2
       |         HAVING count(*) > ${DedupOps.MaxBandBucket}),
       |big2 AS (SELECT mh3, mh4 FROM mh GROUP BY mh3, mh4
       |         HAVING count(*) > ${DedupOps.MaxBandBucket}),
       |cand AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |    FROM mh a JOIN mh b ON a.mh1 = b.mh1 AND a.mh2 = b.mh2
       |                       AND a.doc_id < b.doc_id
       |    WHERE NOT EXISTS (SELECT 1 FROM big1 g
       |                      WHERE g.mh1 = a.mh1 AND g.mh2 = a.mh2)
       |    UNION ALL
       |    SELECT a.doc_id, b.doc_id
       |    FROM mh a JOIN mh b ON a.mh3 = b.mh3 AND a.mh4 = b.mh4
       |                       AND a.doc_id < b.doc_id
       |    WHERE NOT EXISTS (SELECT 1 FROM big2 g
       |                      WHERE g.mh3 = a.mh3 AND g.mh4 = a.mh4)) u),
       |pairs AS (
       |  SELECT doc_a, doc_b, jacc_est FROM (
       |    SELECT c.doc_a, c.doc_b,
       |      ((CASE WHEN a.mh1=b.mh1 THEN 1 ELSE 0 END)+(CASE WHEN a.mh2=b.mh2 THEN 1 ELSE 0 END)
       |      +(CASE WHEN a.mh3=b.mh3 THEN 1 ELSE 0 END)+(CASE WHEN a.mh4=b.mh4 THEN 1 ELSE 0 END))/4.0 AS jacc_est
       |    FROM cand c JOIN mh a ON a.doc_id = c.doc_a
       |                JOIN mh b ON b.doc_id = c.doc_b) z
       |  WHERE jacc_est >= 0.5)""".stripMargin

  /** The clusters CTE chain shared by q_dedup_clusters / q_dedup_keep:
    * connected components of the capped pair graph by transitive
    * closure + min over the reachable set. */
  private def mhClusterCtes: String =
    s"""$mhPairCtes,
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(a, b) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT reach.a, e.dst FROM reach JOIN edges e ON reach.b = e.src),
       |cl AS (SELECT a AS doc_id, min(b) AS cluster FROM reach GROUP BY a)""".stripMargin

  val dedup: Map[String, String] = Map(
    "q_dedup_minhash" ->
      s"""$mhPairCtes
         |SELECT doc_a, doc_b, jacc_est FROM pairs
         |ORDER BY jacc_est DESC, doc_a, doc_b LIMIT 200""".stripMargin,

    // incremental dedup: the engine joins only the increment's bands
    // against the base index (linear in the increment), with cap
    // guards on the FULL population — so the answer IS the batch pair
    // set restricted to cross pairs, which is exactly how the oracle
    // spells it
    "q_dedup_incremental" ->
      s"""$mhPairCtes
         |SELECT doc_a, doc_b, jacc_est FROM pairs
         |WHERE (doc_a % 10 = 0) != (doc_b % 10 = 0)
         |ORDER BY jacc_est DESC, doc_a, doc_b LIMIT 200""".stripMargin,

    // connected components of the same (capped) candidate graph, no
    // limit, by transitive closure + min over reachable set — the
    // recursive-CTE twin of the engine's iterative min-label
    // propagation fixpoint. Cap-aware since r12 (see [[mhPairCtes]]);
    // MinhashCapSpec separately pins that capped ≡ uncapped wherever
    // no bucket exceeds the cap.
    "q_dedup_clusters" ->
      s"""$mhClusterCtes
         |SELECT doc_id, cluster FROM cl
         |ORDER BY cluster, doc_id""".stripMargin,

    // survivor selection: the clusters CTE chain + the q_text_quality
    // score arithmetic (same 4dp roundings) + a rank-1 window; the
    // engine side computes the same survivor with a max(struct)
    // partial+final aggregate instead of a window sort
    "q_dedup_keep" ->
      s"""$mhClusterCtes,
        |q AS (
        |  SELECT doc_id, round(
        |    round(len(list_distinct(t)) / CAST(len(t) AS DOUBLE), 4) *
        |    (1 - round(len(list_filter(t, w -> w IN ('the','a','of','and','to','in')))
        |               / CAST(len(t) AS DOUBLE), 4)), 4) AS score
        |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents) x),
        |ranked AS (
        |  SELECT cl.cluster, cl.doc_id, q.score,
        |    row_number() OVER (PARTITION BY cl.cluster
        |                       ORDER BY q.score DESC, cl.doc_id) AS rk,
        |    count(*) OVER (PARTITION BY cl.cluster) AS n_dups
        |  FROM cl JOIN q USING (doc_id))
        |SELECT cluster, doc_id AS keep_doc, score AS keep_score, n_dups
        |FROM ranked WHERE rk = 1 ORDER BY cluster""".stripMargin,

    "q_dedup_simhash" ->
      """WITH hs AS (SELECT doc_id, CAST(concat('0x', substring(md5(w),1,8)) AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents) y),
        |bits AS (SELECT doc_id,
        |    sum(CASE WHEN (h >> 0) & 1 = 1 THEN 1 ELSE -1 END) AS b0,
        |    sum(CASE WHEN (h >> 1) & 1 = 1 THEN 1 ELSE -1 END) AS b1,
        |    sum(CASE WHEN (h >> 2) & 1 = 1 THEN 1 ELSE -1 END) AS b2,
        |    sum(CASE WHEN (h >> 3) & 1 = 1 THEN 1 ELSE -1 END) AS b3,
        |    sum(CASE WHEN (h >> 4) & 1 = 1 THEN 1 ELSE -1 END) AS b4,
        |    sum(CASE WHEN (h >> 5) & 1 = 1 THEN 1 ELSE -1 END) AS b5,
        |    sum(CASE WHEN (h >> 6) & 1 = 1 THEN 1 ELSE -1 END) AS b6,
        |    sum(CASE WHEN (h >> 7) & 1 = 1 THEN 1 ELSE -1 END) AS b7
        |  FROM hs GROUP BY doc_id),
        |sig AS (SELECT doc_id,
        |    (CASE WHEN b0>0 THEN 1 ELSE 0 END)+(CASE WHEN b1>0 THEN 2 ELSE 0 END)
        |   +(CASE WHEN b2>0 THEN 4 ELSE 0 END)+(CASE WHEN b3>0 THEN 8 ELSE 0 END)
        |   +(CASE WHEN b4>0 THEN 16 ELSE 0 END)+(CASE WHEN b5>0 THEN 32 ELSE 0 END)
        |   +(CASE WHEN b6>0 THEN 64 ELSE 0 END)+(CASE WHEN b7>0 THEN 128 ELSE 0 END) AS simhash
        |  FROM bits)
        |SELECT simhash, count(*) AS n, min(doc_id) AS keep FROM sig GROUP BY simhash
        |HAVING count(*) > 1 ORDER BY n DESC, simhash LIMIT 100""".stripMargin,

    "q_dedup_levenshtein" ->
      """WITH d AS (SELECT doc_id, text, lower(substring(text,1,60)) AS k FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       levenshtein(a.text, b.text) AS dist,
        |       greatest(length(a.text), length(b.text)) - levenshtein(a.text, b.text) AS overlap
        |FROM d a JOIN d b ON a.k = b.k AND a.doc_id < b.doc_id
        |ORDER BY dist, doc_a, doc_b""".stripMargin,

    "q_dedup_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, lower(substring(text,1,60)) AS k,
        |           list_distinct(string_split(text,' ')) AS ts FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       round(len(list_intersect(a.ts, b.ts)) /
        |             CAST(len(list_distinct(list_concat(a.ts, b.ts))) AS DOUBLE), 4) AS jac
        |FROM d a JOIN d b ON a.k = b.k AND a.doc_id < b.doc_id
        |ORDER BY jac DESC, doc_a, doc_b""".stripMargin
  )

  val eventsExt: Map[String, String] = Map(
    "q_events_sliding" ->
      """SELECT ws, event_type, count(*) AS n, round(sum(value),2) AS sv FROM (
        |  SELECT make_timestamp((epoch_us(ts) // 900000000 - u) * 900000000) AS ws,
        |         event_type, value
        |  FROM events, unnest([0,1,2,3]) AS t(u))
        |GROUP BY ws, event_type ORDER BY ws, event_type LIMIT 300""".stripMargin,

    "q_events_session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL
        |    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 30*60*1000000 THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                                         ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        |SELECT min(ts) AS ss, max(ts) + INTERVAL 30 MINUTE AS se, user_id,
        |       count(*) AS n
        |FROM s GROUP BY user_id, sid ORDER BY user_id, ss LIMIT 300""".stripMargin
  )

  /** Shared by q_stream_join and q_stream_join_ordered — the two keys
    * execute the same interval join over the same rows (single-batch
    * replay vs event-time-ordered multi-batch feed), so their oracles
    * are one string by construction. */
  private val streamJoinSql: String =
    """SELECT p.user_id AS user_id, p.event_id AS purchase_id,
      |       c.event_id AS click_id, p.ts AS p_ts, c.ts AS c_ts
      |FROM events p JOIN events c ON p.user_id = c.user_id
      | AND p.event_type = 'purchase' AND c.event_type = 'click'
      | AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
      | AND epoch_us(c.ts) <= epoch_us(p.ts)
      |ORDER BY purchase_id, click_id LIMIT 300""".stripMargin

  val analytics: Map[String, String] = Map(
    // the streaming execution of the tumbling aggregate must equal the
    // batch oracle — same SQL as q_events_tumbling
    "q_stream_tumbling" -> OracleSql.seed("q_events_tumbling"),

    // ingestion-time near-dup: every unordered pair surfaces exactly
    // once, when its smaller member arrives from the stream — the
    // streamed pair set IS the batch q_dedup_minhash pair set
    "q_stream_neardup" -> dedup("q_dedup_minhash"),

    // ingestion-time quality filter: the per-row fused dot product is
    // the SAME exact bigint sum as the batch broadcast-join spelling,
    // so the streamed scores ARE the batch q_quality_linear rows
    "q_stream_quality" -> text("q_quality_linear"),

    // online IVF-cell assignment: the streamed partition audit must
    // equal the batch quantizer build — same unrolled-Lloyd oracle as
    // q_kmeans_build (assignment is the build's own argmin metric)
    "q_stream_assign" ->
      s"""${kmCtes()}
         |SELECT cell, count(*) AS n, min(vec_id) AS rep
         |FROM af GROUP BY cell ORDER BY cell""".stripMargin,

    // flatMapGroupsWithState sessionize replayed as a stream must equal
    // the batch lag+cumsum sessionize — same SQL as q_events_sessionize
    "q_stream_sessionize" -> OracleSql.seed("q_events_sessionize"),

    // the streaming interval join must equal the batch epoch-µs
    // interval self-join (§2.2-4: epoch subtraction, not date_diff)
    "q_stream_join" -> streamJoinSql,

    // the event-time-ordered multi-batch feed (r14;
    // StreamOps.StreamJoinOrderedFiles batches) joins the SAME row
    // set: the staged files are time-contiguous and arrive in event-
    // time order, so the advancing watermark only EVICTS already-
    // matched state and never drops a late row — the oracle is
    // therefore identical (StreamJoinScale proved exact ≡ batch at
    // sf1 AND sf10 with per-batch eviction metrics)
    "q_stream_join_ordered" -> streamJoinSql,

    // the CSV write→read round-trip must equal the same aggregate over
    // the original parquet — text serialization is lossless
    "q_csv_roundtrip" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |       min(o_orderdate) AS d0, max(o_orderdate) AS d1
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // the JSON write→read round-trip must equal the same aggregate
    // over the original parquet (ns ts → µs truncation on both sides)
    "q_json_roundtrip" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       round(sum(value), 2) AS sv,
        |       min(ts) AS t0, max(ts) AS t1
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // the bucketed write→co-located merge-join round-trip must equal
    // the same join aggregate over the raw parquet tables
    "q_bucket_join" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |       round(sum(l_quantity), 2) AS q
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the salted two-stage aggregation must equal the plain GROUP BY —
    // salting is an execution-strategy change, not a semantic one
    "q_skew_salted" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS q,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(min(l_extendedprice), 2) AS min_price,
        |       round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // the partitioned write→pruned read round-trip must equal the same
    // aggregate over the unpartitioned table
    "q_part_pruned" ->
      """SELECT o_orderpriority, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
        |FROM orders WHERE month(o_orderdate) = 3
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_events_session_ids" ->
      """WITH g AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR (epoch_us(ts) - epoch_us(lag(ts) OVER w))/60000000.0 > 30
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id,
        |       CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |FROM g ORDER BY user_id, event_id LIMIT 300""".stripMargin,

    "q_events_retention" ->
      """WITH e AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS first_d FROM e GROUP BY user_id)
        |SELECT date_diff('day', CAST(first_d AS DATE), CAST(d AS DATE)) AS day_n,
        |       count(*) AS active
        |FROM e JOIN f USING(user_id)
        |GROUP BY day_n ORDER BY day_n LIMIT 31""".stripMargin,

    "q_events_funnel" ->
      """WITH m AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type='view' THEN ts END) AS t_v,
        |    min(CASE WHEN event_type='click' THEN ts END) AS t_c,
        |    min(CASE WHEN event_type='purchase' THEN ts END) AS t_p
        |  FROM events GROUP BY user_id)
        |SELECT CASE WHEN t_v IS NOT NULL AND t_c > t_v AND t_p > t_c THEN 'full_funnel'
        |            WHEN t_v IS NOT NULL AND t_c > t_v THEN 'view_click'
        |            WHEN t_v IS NOT NULL THEN 'view_only'
        |            ELSE 'no_view' END AS stage, count(*) AS users
        |FROM m GROUP BY 1 ORDER BY stage""".stripMargin
  )

  // ---- k-means unrolled-Lloyd CTE machinery, shared by
  // q_kmeans_build and q_knn_ivf_kmeans: one generator per Lloyd
  // fragment so the two keys' rounds are the same strings and cannot
  // drift apart. Mirrors GraftOps.kmeansModel: hash-picked seeds,
  // argmin of round(||c||^2 - 2 v.c, 6) with ties to the smaller
  // cell, per-dim means re-rounded to 4 dp. ----
  // vName/dim parameterized r14 for the PQ per-subspace builds; with
  // the defaults the emitted SQL is semantically identical to the
  // pre-r14 strings (the v CTE now carries an explicit `v` alias),
  // so the four existing kmeans-family oracles are untouched in
  // meaning — re-verified by the round's full sweep.
  private def kmAssign(cent: String, vName: String = "v") =
    s"""SELECT vec_id, ev, cell FROM (
       |  SELECT v.vec_id, v.ev, c.cell,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      round(round(list_dot_product(c.cv, c.cv), 6)
       |            - 2 * list_dot_product(v.ev, c.cv), 6), c.cell) AS rk
       |  FROM $vName v CROSS JOIN $cent c) x WHERE rk = 1""".stripMargin

  /** Memory-lean [[kmAssign]] — IDENTICAL semantics (the window's
    * ORDER BY (metric, cell) argmin, proven row-equal on the real
    * fixture AND on adversarial data with forced exact metric ties),
    * spelled as a plain MIN aggregation so NO window operator runs at
    * all. The (metric, cell) order is packed into one exact BIGINT:
    * metric is already on the 1e-6 grid (both operands round(·,6)),
    * so `round(metric·1e6)` recovers its grid integer exactly
    * (|met6| < 1.3e8 here, float error ≪ 0.5), and
    * `(met6 + 1e9)·65536 + cell` is strictly order-isomorphic to the
    * window's sort key (offset keeps it positive; cell < 65536; max
    * ≈ 7e13 ≪ 2^53, all exact). min() over that composite IS the
    * rank-1 row, and `% 65536` decodes the winning cell; `ev` joins
    * back on the N winners. Why not a window at all: at the scaled
    * key's sf10 replay (200 k × 640 cells = 128 M rank rows) the
    * ev-carrying window was ~65 GB of sort payload and the bare
    * (vec_id, cell, metric) spelling STILL hit DuckDB's 100 GiB pin
    * ceiling (windows sort; sorts spill poorly at this width×depth),
    * while the hash agg is 200 k groups of 8 bytes — it streams.
    * Used by the dynamic-k [[kmCtes]] path only; the fixed-k oracles
    * keep the original window string (their k ≤ 128 windows are small
    * and their committed artifacts were produced by it). */
  private def kmAssignLean(cent: String, vName: String = "v") =
    s"""SELECT v2.vec_id, v2.ev, x.cell FROM (
       |  SELECT vec_id, min(
       |      (CAST(round((round(round(list_dot_product(c.cv, c.cv), 6)
       |             - 2 * list_dot_product(v.ev, c.cv), 6)) * 1e6) AS BIGINT)
       |       + 1000000000) * 65536 + c.cell) % 65536 AS cell
       |  FROM $vName v CROSS JOIN $cent c GROUP BY vec_id) x
       |JOIN $vName v2 USING (vec_id)""".stripMargin

  private def kmUpdate(a: String, dim: Int = 64) =
    s"""SELECT cell, list(cx ORDER BY p) AS cv FROM (
       |  SELECT cell, i AS p, round(avg(ev[i]), 4) AS cx
       |  FROM $a, unnest(range(1, ${dim + 1})) t(i) GROUP BY cell, i) y
       |GROUP BY cell""".stripMargin

  /** [[kmCtes]] for a VECTOR SLICE with a CTE-name prefix, for the
    * per-subspace PQ codebook builds: emits ${p}v / ${p}c0 / ${p}a$i /
    * ${p}c$i / ${p}af over `embedding[$lo:$hi]` (dim = hi−lo+1). Same
    * seed hash, same rounding, same argmin as the full-vector chain —
    * one fragment family, so the PQ oracle cannot drift from the
    * kmeans one.
    *
    * r15: `trainSrc`/`encodeSrc` split for the PRODUCTION sampled
    * build — the Lloyd chain (seeds + rounds) reads `trainSrc`, while
    * the final corpus assignment `${p}af` reads `encodeSrc`. When the
    * two differ an extra full-slice CTE `${p}f` is emitted (also the
    * LUT probe source — probes live in the corpus, not the sample);
    * with equal sources the emitted SQL is the pre-r15 string
    * unchanged. */
  private def kmCtesAt(p: String, lo: Int, hi: Int, k: Int,
                       iters: Int, trainSrc: String = "embeddings",
                       encodeSrc: String = "embeddings"): String = {
    val h = "CAST(concat('0x', substring(md5(CAST(vec_id AS VARCHAR)),1,8)) AS BIGINT)"
    val rounds = (1 to iters).map(i =>
      s"""${p}a$i AS (${kmAssign(s"${p}c${i - 1}", s"${p}v")}),
         |${p}c$i AS (${kmUpdate(s"${p}a$i", hi - lo + 1)})""".stripMargin)
      .mkString(",\n")
    val split = trainSrc != encodeSrc
    val fullCte =
      if (split)
        s"""${p}f AS (SELECT vec_id, CAST(embedding[$lo:$hi] AS DOUBLE[]) AS ev
           |          FROM $encodeSrc),
           |""".stripMargin
      else ""
    s"""${p}v AS (SELECT vec_id, CAST(embedding[$lo:$hi] AS DOUBLE[]) AS ev
       |          FROM $trainSrc),
       |$fullCte${p}c0 AS (
       |  SELECT row_number() OVER (ORDER BY $h, vec_id) - 1 AS cell,
       |         list_transform(ev, x -> round(x, 4)) AS cv
       |  FROM ${p}v ORDER BY $h, vec_id LIMIT $k),
       |$rounds,
       |${p}af AS (${kmAssign(s"${p}c$iters", if (split) s"${p}f" else s"${p}v")})""".stripMargin
  }

  /** WITH-prefix ending at `af`, the final corpus (vec_id, ev, cell)
    * assignment after `iters` unrolled Lloyd rounds over `k` seeds.
    * The final centroid CTE is always `c$iters` — probe-side
    * consumers rank against [[kmFinalCentroids]]. r11: parameterized
    * (was fixed k = 8, iters = 2; defaults produce the identical
    * string) so q_knn_ivf_mp's fine-cell geometry (k = 64) comes from
    * the SAME generator as the k = 8 family and the Lloyd fragments
    * still cannot drift apart. */
  /** r15: optional trainSrc/encodeSrc split for the SAMPLED coarse
    * gate in the IVF-PQ keys — the Lloyd chain (seeds + rounds) reads
    * `trainSrc`; when the sources differ a full-vector CTE `vf` is
    * emitted and the final corpus assignment `af` reads it (probe
    * ranking must then also read `vf`, see [[pcCte]]). Defaults emit
    * the pre-r15 string byte-identically — the standalone kmeans/IVF
    * keys are untouched. */
  /** r19: `kWhere` makes the SEED COUNT a runtime SQL expression (the
    * k ∝ N gate of q_knn_ivf_pq_rerank_scaled computes k from
    * count(embeddings) — a static LIMIT literal cannot express a rule
    * the engine evaluates per-fixture). The dynamic form keeps the
    * identical seed ORDER (hash, vec_id) and 0-based cell ids — it
    * only swaps `LIMIT k` for `cell < <expr>` over the same
    * row_number; with kWhere = None the emitted SQL is the pre-r19
    * string byte-identically. */
  private def kmCtes(k: Int = 8, iters: Int = 2,
                     trainSrc: String = "embeddings",
                     encodeSrc: String = "embeddings",
                     kWhere: Option[String] = None): String = {
    val h = "CAST(concat('0x', substring(md5(CAST(vec_id AS VARCHAR)),1,8)) AS BIGINT)"
    // dynamic-k replays use the memory-lean assign (k scales with N —
    // the ev-carrying window would be O(N·k·d) sort payload)
    val assign: (String, String) => String =
      if (kWhere.isDefined) kmAssignLean(_, _) else kmAssign(_, _)
    val rounds = (1 to iters).map(i =>
      s"""a$i AS (${assign(s"c${i - 1}", "v")}),
         |c$i AS (${kmUpdate(s"a$i")})""".stripMargin).mkString(",\n")
    val split = trainSrc != encodeSrc
    val fullCte =
      if (split)
        s"""vf AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM $encodeSrc),
           |""".stripMargin
      else ""
    val c0 = kWhere match {
      case None =>
        s"""c0 AS (
           |  SELECT row_number() OVER (ORDER BY $h, vec_id) - 1 AS cell,
           |         list_transform(ev, x -> round(x, 4)) AS cv
           |  FROM v ORDER BY $h, vec_id LIMIT $k)""".stripMargin
      case Some(w) =>
        s"""c0 AS (
           |  SELECT cell, cv FROM (
           |    SELECT row_number() OVER (ORDER BY $h, vec_id) - 1 AS cell,
           |           list_transform(ev, x -> round(x, 4)) AS cv
           |    FROM v) s0k WHERE cell < $w)""".stripMargin
    }
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM $trainSrc),
       |$fullCte$c0,
       |$rounds,
       |af AS (${assign(s"c$iters", if (split) "vf" else "v")})""".stripMargin
  }

  /** Name of the final-centroid CTE [[kmCtes]] emits for `iters`. */
  private def kmFinalCentroids(iters: Int = 2): String = s"c$iters"

  /** PQ-ADC oracle generator (r14, generalized r15): the three PQ
    * keys from ONE fragment family — `sampled` trains the subspace
    * codebooks on the engine's [[VectorOps.PqSamplePct]]% md5
    * hash-sample (the samp CTE is GraftOps.sampleByHash's exact rule)
    * while ENCODE/LUT read the full corpus via the split kmCtesAt;
    * `ivf` prepends the coarse full-vector Lloyd gate + [[pcCte]] and
    * restricts ADC scoring to each probe's probed cells — mirroring
    * VectorOps.pqAdc term-for-term. */
  private def pqAdcSql(sampled: Boolean, ivf: Boolean,
                       rerank: Boolean = false): String = {
    val m = VectorOps.PqM; val sub = VectorOps.PqSub; val k = VectorOps.PqK
    val iters = VectorOps.PqIters
    val trainSrc = if (sampled) "samp" else "embeddings"
    val subs = (0 until m)
      .map(s => kmCtesAt(s"s$s", s * sub + 1, (s + 1) * sub, k, iters,
        trainSrc = trainSrc, encodeSrc = "embeddings"))
      .mkString(",\n")
    // probes live in the CORPUS, not the sample — LUTs read the full
    // slice CTE under a sampled build
    val lutSrc = if (sampled) "f" else "v"
    val luts = (0 until m).map(s =>
      s"""lut$s AS (
         |  SELECT p.vec_id AS p$s, c.cell AS c$s,
         |         round(list_dot_product(p.ev, c.cv), 6) AS d$s
         |  FROM s$s$lutSrc p CROSS JOIN s${s}c$iters c WHERE p.vec_id < 10)""".stripMargin)
      .mkString(",\n")
    val sampCte =
      if (sampled)
        s"""samp AS (
           |  SELECT vec_id, embedding FROM embeddings
           |  WHERE (CAST(concat('0x', substring(md5(CAST(vec_id AS VARCHAR)),1,4))
           |         AS BIGINT) % 100) < ${VectorOps.PqSamplePct}),
           |""".stripMargin
      else ""
    val gcell = if (ivf) ",\n         g.cell AS gcell" else ""
    val gjoin = if (ivf) "\n       JOIN af g USING (vec_id)" else ""
    val codes =
      s"""codes AS (
         |  SELECT a0.vec_id, a0.cell AS pq0, a1.cell AS pq1,
         |         a2.cell AS pq2, a3.cell AS pq3$gcell
         |  FROM s0af a0 JOIN s1af a1 USING (vec_id)
         |       JOIN s2af a2 USING (vec_id) JOIN s3af a3 USING (vec_id)$gjoin)""".stripMargin
    val head =
      if (ivf) {
        // samp must precede the coarse chain (its v CTE reads it
        // under a sampled gate — r15); kmCtes' own WITH is stripped
        // so the samp CTE can lead the clause
        val coarse = kmCtes(VectorOps.IvfPqCells, iters,
          trainSrc = trainSrc, encodeSrc = "embeddings")
          .stripPrefix("WITH ")
        s"""WITH $sampCte$coarse,
           |${pcCte(VectorOps.IvfPqNprobe, iters,
                    src = if (sampled) "vf" else "v")},
           |$subs""".stripMargin
      } else s"WITH $sampCte$subs"
    val scGate = if (ivf) "\n  JOIN pc p ON p.cell = kk.gcell" else ""
    val l0Cond = if (ivf) " AND l0.p0 = p.vec_id" else ""
    val tail =
      if (!rerank)
        s"""
           |SELECT p0 AS vec_id, neighbor, adc FROM (
           |  SELECT *, row_number() OVER (PARTITION BY p0
           |                              ORDER BY adc DESC, neighbor) AS rk
           |  FROM sc) z
           |WHERE rk <= 3 ORDER BY vec_id, adc DESC, neighbor""".stripMargin
      else
        s""",
           |shortlist AS (SELECT p0, neighbor FROM (
           |  SELECT p0, neighbor, row_number() OVER (PARTITION BY p0
           |                    ORDER BY adc DESC, neighbor) AS crk,
           |         count(*) OVER (PARTITION BY p0) AS nc
           |  FROM sc) z
           |  WHERE crk <= greatest(${VectorOps.IvfPqRerankDepth}, nc / 5)),
           |rr AS (
           |  SELECT s.p0, s.neighbor,
           |    round(CAST(list_dot_product(CAST(pe.embedding AS DOUBLE[]),
           |          CAST(te.embedding AS DOUBLE[])) AS DOUBLE), 4) AS cos
           |  FROM shortlist s JOIN embeddings pe ON pe.vec_id = s.p0
           |                   JOIN embeddings te ON te.vec_id = s.neighbor)
           |SELECT p0 AS vec_id, neighbor, cos FROM (
           |  SELECT *, row_number() OVER (PARTITION BY p0
           |                              ORDER BY cos DESC, neighbor) AS rk
           |  FROM rr) y
           |WHERE rk <= 3 ORDER BY vec_id, cos DESC, neighbor""".stripMargin
    s"""$head,
       |$codes,
       |$luts,
       |sc AS (
       |  SELECT l0.p0, kk.vec_id AS neighbor,
       |         round(l0.d0 + l1.d1 + l2.d2 + l3.d3, 4) AS adc
       |  FROM codes kk$scGate
       |  JOIN lut0 l0 ON l0.c0 = kk.pq0$l0Cond
       |  JOIN lut1 l1 ON l1.c1 = kk.pq1 AND l1.p1 = l0.p0
       |  JOIN lut2 l2 ON l2.c2 = kk.pq2 AND l2.p2 = l0.p0
       |  JOIN lut3 l3 ON l3.c3 = kk.pq3 AND l3.p3 = l0.p0
       |  WHERE kk.vec_id <> l0.p0)$tail""".stripMargin
  }

  /** Oracle for q_knn_ivf_pq_rerank_scaled (r19, VERDICT r18 missing
    * #1): the measured k ∝ N recipe — the coarse gate's seed count is
    * computed FROM THE DATA (`kp`: greatest(8, (count(*)·64) // 20000),
    * integer arithmetic matching [[VectorOps.scaledGateCells]]
    * exactly), the gate trains on the same 25% hash sample as the
    * production build, and the EXACT rerank consumes the ENTIRE gated
    * candidate set — so no ADC term appears at all: the subspace
    * codebook chains, LUTs and shortlist windows of [[pqAdcSql]]
    * vanish with the scoring they existed to replay, mirroring the
    * engine's rerank-all plan (codes table read purely as the
    * inverted list). Same Lloyd fragments ([[kmCtes]] dynamic-k form,
    * [[pcCte]]), same 4-dp exact cosine as the ladder key's rr CTE. */
  private def pqRerankAllScaledSql: String = {
    val iters = VectorOps.PqIters
    val sampCte =
      s"""samp AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  WHERE (CAST(concat('0x', substring(md5(CAST(vec_id AS VARCHAR)),1,4))
         |         AS BIGINT) % 100) < ${VectorOps.PqSamplePct}),
         |""".stripMargin
    val coarse = kmCtes(iters = iters, trainSrc = "samp",
      encodeSrc = "embeddings", kWhere = Some("(SELECT kcells FROM kp)"))
      .stripPrefix("WITH ")
    s"""WITH kp AS (
       |  SELECT greatest(8, (count(*) * 64) // 20000) AS kcells FROM embeddings),
       |$sampCte$coarse,
       |${pcCte(VectorOps.IvfPqNprobe, iters, src = "vf")},
       |cand AS (
       |  SELECT p.vec_id AS p0, t.vec_id AS neighbor
       |  FROM pc p JOIN af t ON t.cell = p.cell AND t.vec_id <> p.vec_id),
       |rr AS (
       |  SELECT c.p0, c.neighbor,
       |    round(CAST(list_dot_product(CAST(pe.embedding AS DOUBLE[]),
       |          CAST(te.embedding AS DOUBLE[])) AS DOUBLE), 4) AS cos
       |  FROM cand c JOIN embeddings pe ON pe.vec_id = c.p0
       |              JOIN embeddings te ON te.vec_id = c.neighbor)
       |SELECT p0 AS vec_id, neighbor, cos FROM (
       |  SELECT *, row_number() OVER (PARTITION BY p0
       |                              ORDER BY cos DESC, neighbor) AS rk
       |  FROM rr) y
       |WHERE rk <= 3 ORDER BY vec_id, cos DESC, neighbor""".stripMargin
  }

  /** The probe → top-nprobe-cells CTE over the full-vector Lloyd
    * build's [[kmCtes]] names — shared by [[ivfKmeansSql]] and the
    * IVF-PQ generator ([[pqAdcSql]]), so the gate metric (the build's
    * own 6-dp argmin, ties to the smaller cell) is spelled once. */
  private def pcCte(nprobe: Int, iters: Int, src: String = "v"): String =
    s"""pc AS (
       |  SELECT vec_id, ev, cell FROM (
       |    SELECT v.vec_id, v.ev, c.cell,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |        round(round(list_dot_product(c.cv, c.cv), 6)
       |              - 2 * list_dot_product(v.ev, c.cv), 6), c.cell) AS rk
       |    FROM $src v CROSS JOIN ${kmFinalCentroids(iters)} c
       |    WHERE v.vec_id < 10) x WHERE rk <= $nprobe)""".stripMargin

  /** The unsupervised IVF retrieval SQL at any (k, iters, nprobe)
    * geometry — probe cells ranked by the build's own argmin metric
    * over the final centroids, top-3 per probe over the probed cells'
    * members. */
  private def ivfKmeansSql(k: Int, iters: Int, nprobe: Int): String =
    s"""${kmCtes(k, iters)},
       |${pcCte(nprobe, iters)},
       |pairs AS (
       |  SELECT p.vec_id, t.vec_id AS neighbor,
       |    round(CAST(list_dot_product(p.ev, t.ev) AS DOUBLE), 4) AS cos
       |  FROM pc p JOIN af t ON t.cell = p.cell AND t.vec_id <> p.vec_id)
       |SELECT vec_id, neighbor, cos FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY cos DESC, neighbor) AS rk FROM pairs) z
       |WHERE rk <= 3 ORDER BY vec_id, cos DESC, neighbor""".stripMargin

  val vector: Map[String, String] = Map(
    // Three formulations, one semantics — same oracle as q_cosine_topk.
    "q_cosine_expr" -> OracleSql.seed("q_cosine_topk"),
    "q_cosine_udf"  -> OracleSql.seed("q_cosine_topk"),

    // band keys generated from the SAME ±1 hyperplane source as the
    // Spark side (EmbLsh) — identical arithmetic, identical rounding
    "q_dedup_embedding" ->
      s"""WITH keyed AS (
        |  SELECT vec_id, unnest(${EmbLsh.duckKeysSql}) AS k FROM embeddings),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM keyed a JOIN keyed b ON a.k = b.k AND a.vec_id < b.vec_id),
        |scored AS (
        |  SELECT vec_a, vec_b,
        |    round(CAST(list_dot_product(CAST(ea.embedding AS DOUBLE[]),
        |          CAST(eb.embedding AS DOUBLE[])) AS DOUBLE),4) AS cos
        |  FROM cand JOIN embeddings ea ON ea.vec_id = cand.vec_a
        |            JOIN embeddings eb ON eb.vec_id = cand.vec_b)
        |SELECT vec_a, vec_b, cos FROM scored
        |WHERE cos >= 0.4 ORDER BY cos DESC, vec_a, vec_b""".stripMargin,

    // production-geometry near-dup (r13): 12 bits × 24 bands, τ=0.85,
    // over the corpus augmented with one deterministic twin per vector
    // (dim 0 negated — exact float sign flip, cos = 1 − 2·x₀²; the
    // isotropic fixtures have ZERO native pairs at cos ≥ 0.85, so the
    // augmentation is what makes the answer non-vacuous). Same plane
    // stream as q_dedup_embedding via duckKeysSql(12, 24).
    "q_dedup_embedding_scaled" ->
      s"""WITH aug AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000000, [-embedding[1]] || embedding[2:64] AS embedding
        |  FROM embeddings),
        |keyed AS (
        |  SELECT vec_id, unnest(${EmbLsh.duckKeysSql(12, 24)}) AS k FROM aug),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM keyed a JOIN keyed b ON a.k = b.k AND a.vec_id < b.vec_id),
        |scored AS (
        |  SELECT vec_a, vec_b,
        |    round(CAST(list_dot_product(CAST(ea.embedding AS DOUBLE[]),
        |          CAST(eb.embedding AS DOUBLE[])) AS DOUBLE),4) AS cos
        |  FROM cand JOIN aug ea ON ea.vec_id = cand.vec_a
        |            JOIN aug eb ON eb.vec_id = cand.vec_b)
        |SELECT vec_a, vec_b, cos FROM scored
        |WHERE cos >= 0.85 ORDER BY cos DESC, vec_a, vec_b""".stripMargin,

    "q_knn_bucketed" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    (CASE WHEN round(CAST(list_sum(CAST(embedding[1:32] AS DOUBLE[])) AS DOUBLE)
        |              - CAST(list_sum(CAST(embedding[33:64] AS DOUBLE[])) AS DOUBLE), 6) > 0
        |          THEN 1 ELSE 0 END)
        |   +(CASE WHEN round(CAST(list_sum(CAST(embedding[17:48] AS DOUBLE[])) AS DOUBLE)
        |              - (CAST(list_sum(CAST(embedding[1:16] AS DOUBLE[])) AS DOUBLE)
        |               + CAST(list_sum(CAST(embedding[49:64] AS DOUBLE[])) AS DOUBLE)), 6) > 0
        |          THEN 2 ELSE 0 END) AS bucket
        |  FROM embeddings),
        |pairs AS (
        |  SELECT p.vec_id, t.vec_id AS neighbor,
        |    round(CAST(list_dot_product(CAST(p.embedding AS DOUBLE[]),
        |          CAST(t.embedding AS DOUBLE[])) AS DOUBLE),4) AS cos
        |  FROM e p JOIN e t ON p.bucket = t.bucket AND t.vec_id <> p.vec_id
        |  WHERE p.vec_id < 10)
        |SELECT vec_id, neighbor, cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |                               ORDER BY cos DESC, neighbor) AS rk FROM pairs) x
        |WHERE rk <= 3 ORDER BY vec_id, cos DESC, neighbor""".stripMargin,

    // custom plan-node top-k ≡ the window idiom; reuse its oracle
    "q_topk_custom" -> OracleSql.seed("q_window_topk"),

    // k-means build: both Lloyd rounds unrolled as CTEs (the pagerank
    // fixed-iteration precedent) from the same seed/rounding/argmin
    // discipline as GraftOps.kmeans (assign/update fragments generated
    // by the shared kmCtes builder below so this key and
    // q_knn_ivf_kmeans cannot drift apart)
    "q_kmeans_build" ->
      s"""${kmCtes()}
         |SELECT cell, count(*) AS n, min(vec_id) AS rep
         |FROM af GROUP BY cell ORDER BY cell""".stripMargin,

    // unsupervised end-to-end IVF: the SAME unrolled Lloyd build, then
    // probes rank cells by the build's own argmin metric and search
    // only their cells' members — mirrors VectorOps.qKnnIvfKmeansGeo
    // exactly. One generator, two declared geometries (r11): the
    // coarse (8, 2, 2) key and the fine-cell multi-probe (64, 2, 16)
    // key — SAME quarter-corpus scan fraction, recall 0.47 → 0.80 at
    // the driver SF (tools.AnnDialBench; SCALE.md §ANN dial).
    "q_knn_ivf_kmeans" -> ivfKmeansSql(8, 2, 2),
    "q_knn_ivf_mp" -> ivfKmeansSql(64, 2, 16),

    // PQ-ADC retrieval (r14): four prefixed per-subspace Lloyd chains
    // (kmCtesAt — the SAME fragment family as the kmeans keys, over
    // embedding[lo:hi] slices), codes join the four final
    // assignments, probe lookup tables precompute subspace dots at
    // 6 dp, and the ADC estimate is the fixed left-associated 4-term
    // sum re-rounded at 4 dp — mirroring VectorOps.qKnnPq term order
    // exactly.
    "q_knn_pq" -> pqAdcSql(sampled = false, ivf = false),
    // r15: the PRODUCTION sampled-codebook build and the full Faiss
    // IVF-PQ composition — same generator, so the three PQ keys'
    // Lloyd/LUT/ADC fragments cannot drift apart
    "q_knn_pq_sampled" -> pqAdcSql(sampled = true, ivf = false),
    "q_knn_ivf_pq" -> pqAdcSql(sampled = true, ivf = true),
    // the complete ladder: gate → codes → exact rerank (r15)
    "q_knn_ivf_pq_rerank" -> pqAdcSql(sampled = true, ivf = true, rerank = true),
    // r19: the measured k ∝ N + full-candidate-rerank recipe as a
    // declared key — dynamic seed count, rerank consumes the gate
    "q_knn_ivf_pq_rerank_scaled" -> pqRerankAllScaledSql,
    // r13: the high-recall half-scan point (128, 2, 64) — recall 0.97
    // at sf10 where the quarter-scan diagonal plateaus at 0.77
    "q_knn_ivf_hr" -> ivfKmeansSql(128, 2, 64),

    // SemDeDup: same unrolled Lloyd build, candidates = within-cell
    // pairs, same τ/rounding as q_dedup_embedding
    "q_dedup_semantic" ->
      s"""${kmCtes()},
         |pairs AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    round(CAST(list_dot_product(a.ev, b.ev) AS DOUBLE), 4) AS cos
         |  FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, cos FROM pairs
         |WHERE cos >= 0.4 ORDER BY cos DESC, vec_a, vec_b""".stripMargin,

    // multi-probe SemDeDup: same unrolled Lloyd build; each vector
    // blocks on its TOP-2 cells under the build's own argmin metric
    // (the q_knn_ivf_kmeans pc-CTE ranking, rank <= 2 over the final
    // c2 centroids); a pair is a candidate if the probe sets
    // intersect — DISTINCT here plays the role of the Spark side's
    // smallest-shared-cell exactly-once predicate (same SET)
    "q_dedup_semantic_mp" ->
      s"""${kmCtes()},
         |a2c AS (
         |  SELECT vec_id, ev, cell FROM (
         |    SELECT v.vec_id, v.ev, c.cell,
         |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |        round(round(list_dot_product(c.cv, c.cv), 6)
         |              - 2 * list_dot_product(v.ev, c.cv), 6), c.cell) AS rk
         |    FROM v CROSS JOIN c2 c) x WHERE rk <= 2),
         |pairs AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    round(CAST(list_dot_product(a.ev, b.ev) AS DOUBLE), 4) AS cos
         |  FROM a2c a JOIN a2c b ON a.cell = b.cell AND a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, cos FROM pairs
         |WHERE cos >= 0.4 ORDER BY cos DESC, vec_a, vec_b""".stripMargin,

    "q_emb_centroid" ->
      """SELECT label, i AS pos, round(avg(CAST(embedding[i] AS DOUBLE)),4) AS c
        |FROM embeddings, unnest(range(1,65)) t(i)
        |GROUP BY label, i ORDER BY label, pos""".stripMargin,

    "q_knn_ivf" ->
      """WITH cent AS (
        |  SELECT label AS c_label, list(c ORDER BY pos) AS cvec FROM (
        |    SELECT label, i AS pos, round(avg(CAST(embedding[i] AS DOUBLE)),4) AS c
        |    FROM embeddings, unnest(range(1,65)) t(i) GROUP BY label, i) x
        |  GROUP BY label),
        |assigned AS (
        |  SELECT p.vec_id, p.embedding,
        |         list_dot_product(CAST(p.embedding AS DOUBLE[]), cvec) AS cos_c, c_label
        |  FROM embeddings p CROSS JOIN cent WHERE p.vec_id < 10),
        |cell AS (
        |  SELECT vec_id, embedding, c_label AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |                                 ORDER BY cos_c DESC, c_label) AS rk FROM assigned) y
        |  WHERE rk <= 2),
        |pairs AS (
        |  SELECT p.vec_id, t.vec_id AS neighbor,
        |         round(CAST(list_dot_product(CAST(p.embedding AS DOUBLE[]),
        |               CAST(t.embedding AS DOUBLE[])) AS DOUBLE),4) AS cos
        |  FROM cell p JOIN embeddings t ON t.label = p.cell AND t.vec_id <> p.vec_id)
        |SELECT vec_id, neighbor, cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |                               ORDER BY cos DESC, neighbor) AS rk FROM pairs) z
        |WHERE rk <= 3 ORDER BY vec_id, cos DESC, neighbor""".stripMargin,

    "q_agg_udaf_wavg" ->
      """SELECT l_returnflag,
        |       round(sum(l_extendedprice*l_quantity)/sum(l_quantity),4) AS wavg_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )

  def all: Map[String, String] = text ++ dedup ++ vector ++ eventsExt ++ analytics
}
