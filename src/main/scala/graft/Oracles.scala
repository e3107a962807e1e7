package graft

import scala.collection.immutable.ListMap

/** DuckDB-equivalent ANSI SQL for each entry in [[TestQueries.all]] (driver
  * t2 gate). Queries with no SQL-expressible oracle (hash-seeded LSH /
  * MinHash / SimHash internals) are intentionally absent → the driver
  * records a rows-only check for them.
  *
  * Engine-difference notes encoded here:
  *  - DuckDB `dayofweek` is 0=Sunday vs Spark 1=Sunday → `+1`;
  *  - DuckDB `sum(INTEGER)` widens to HUGEINT → explicit CAST to BIGINT;
  *  - DuckDB `generate_series(DATE,...)` yields timestamps → CAST to DATE;
  *  - `regexp_replace` needs the 'g' flag to match Spark's replace-all;
  *  - vector dot products accumulate CAST-to-DOUBLE in array order, exactly
  *    like [[graft.functions.Vectors.dot]].
  */
object Oracles {

  /** Cosine over two FLOAT[] operands with the exact accumulation recipe of
    * [[graft.functions.Vectors.cosine]] (CAST-to-DOUBLE, array order) —
    * bit-identical across engines, shared by q39/q39d/q84/q87.
    */
  private def cosSql(a: String, b: String): String =
    s"(list_sum(list_transform(list_zip($a, $b), " +
      "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / " +
      s"(sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
      s"sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))"

  private val tod =
    "CASE WHEN hour(ts) BETWEEN 5 AND 11 THEN 'morning' " +
      "WHEN hour(ts) BETWEEN 12 AND 16 THEN 'afternoon' " +
      "WHEN hour(ts) BETWEEN 17 AND 21 THEN 'evening' ELSE 'night' END"

  /** Shared CTE prefix: exact pairwise Jaccard over per-doc distinct
    * 3-token shingle sets, identical to Spark's `Text.shingles(text, 3)`
    * (lowercase, \s+ tokenization), docs with < 3 tokens excluded — the
    * same population the LSH path shingles. INVERTED-INDEX formulation
    * (join on the shingle, J = i/(na+nb−i)): linear in shared-shingle
    * pairs instead of all-pairs-quadratic, so the oracle itself stays
    * tractable beyond the gate scale (all-pairs list_intersect timed out
    * at sf0.1's 5000 docs; this runs in seconds and is value-identical —
    * same integer counts, same double division).
    */
  /** q202/q203 record-linkage corpus + the engine's multi-pass blocking,
    * replayed verbatim: titles (first six words), a one-char-deleted dirty
    * copy, then candidate pairs from prefix-4 ∪ suffix-4 ∪ middle-token
    * block keys (empty block keys abstain, id_a < id_b, distinct).
    */
  /** q262/q263's token-slice transcript shape (mirrors
    * TestQueries.chatCorpus): per-turn token counts c1..c4 and the
    * joined slice strings s1..s4.
    */
  private val chatSliceCtes =
    "docs AS (SELECT doc_id, list_filter(string_split(text, ' '), " +
      "x -> len(x) > 0) AS ts FROM documents), " +
      "m AS (SELECT doc_id, " +
      "least(len(ts), 8) AS c1, " +
      "greatest(least(len(ts), 16) - 8, 0) AS c2, " +
      "greatest(least(len(ts), 24) - 16, 0) AS c3, " +
      "greatest(least(len(ts), 32) - 24, 0) AS c4, " +
      "coalesce(array_to_string(list_slice(ts, 1, 8), ' '), '') AS s1, " +
      "coalesce(array_to_string(list_slice(ts, 9, 16), ' '), '') AS s2, " +
      "coalesce(array_to_string(list_slice(ts, 17, 24), ' '), '') AS s3, " +
      "coalesce(array_to_string(list_slice(ts, 25, 32), ' '), '') AS s4 FROM docs)"

  /** Exact top-3 cosine pair CTE at a given embedding expression (the
    * q39 formulation, parameterized for q273's truncation widths).
    */
  private def topkPairsCte(name: String, expr: String): String =
    s"$name AS (SELECT query_id, nbr_id FROM (SELECT query_id, nbr_id, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, " +
      "nbr_id) AS rnk FROM (SELECT q.qid AS query_id, c.nid AS nbr_id, " +
      "list_sum(list_transform(list_zip(qv, cv), " +
      "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / " +
      "(sqrt(list_sum(list_transform(qv, " +
      "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
      "sqrt(list_sum(list_transform(cv, " +
      "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos " +
      s"FROM (SELECT vec_id AS qid, $expr AS qv FROM embeddings " +
      "WHERE vec_id <= 20) q, " +
      s"(SELECT vec_id AS nid, $expr AS cv FROM embeddings) c " +
      "WHERE q.qid <> c.nid)) WHERE rnk <= 3)"

  /** q271/q272's privacy frame (mirrors TestQueries.privacyFrame):
    * (quasi=(event_type, user bucket), sensitive=floor(value) mod 7)
    * collapsed to per-cell counts.
    */
  private val privacyCtes =
    "cells AS (SELECT event_type, user_id % 20 AS ubucket, " +
      "CAST(CAST(floor(value) AS BIGINT) % 7 AS INT) AS sv, " +
      "count(*) AS n FROM events GROUP BY 1, 2, 3)"

  /** q265/q266's preference corpus (mirrors TestQueries.prefCorpus):
    * chosen = first 16 + (doc_id % 5)·4 tokens, rejected = tokens 9..28,
    * identical pairs planted at doc_id % 11 == 0; ct/rt are the pair's
    * token lists re-split from the assembled strings (the round trip the
    * engine also takes).
    */
  private val prefCtes =
    "docs AS (SELECT doc_id, list_filter(string_split(text, ' '), " +
      "x -> len(x) > 0) AS ts FROM documents), " +
      "p0 AS (SELECT doc_id, " +
      "coalesce(array_to_string(list_slice(ts, 1, " +
      "16 + CAST(doc_id % 5 AS INT) * 4), ' '), '') AS chosen, " +
      "coalesce(array_to_string(list_slice(ts, 9, 28), ' '), '') " +
      "AS rejected0 FROM docs), " +
      "pairs AS (SELECT doc_id, chosen, " +
      "CASE WHEN doc_id % 11 = 0 THEN chosen ELSE rejected0 END " +
      "AS rejected, " +
      "list_filter(string_split(chosen, ' '), x -> len(x) > 0) AS ct, " +
      "list_filter(string_split(CASE WHEN doc_id % 11 = 0 THEN chosen " +
      "ELSE rejected0 END, ' '), x -> len(x) > 0) AS rt FROM p0)"

  /** q260/q261's planted-span corpus (mirrors TestQueries.spanCorpus):
    * documents ∪ clones (doc_id+10000) carrying a 3-token marker + the
    * original's first 40 tokens.
    */
  private val spanCorpusCtes =
    "base AS (SELECT doc_id, text FROM documents " +
      "UNION ALL SELECT doc_id + 10000 AS doc_id, " +
      "'inj' || CAST(doc_id AS VARCHAR) || ' marker0 marker1 ' || " +
      "array_to_string(list_slice(list_filter(string_split(text, ' '), " +
      "x -> len(x) > 0), 1, 40), ' ') AS text " +
      "FROM documents WHERE doc_id % 7 = 0), " +
      "docs AS (SELECT doc_id, list_filter(string_split(text, ' '), " +
      "x -> len(x) > 0) AS ts FROM base)"

  /** 20-token window table + duplicated-occurrence covered positions —
    * shared by the q260 span merge and the q261 scrub.
    */
  private val spanWindowCtes =
    "win AS (SELECT doc_id, i - 1 AS s, " +
      "array_to_string(list_slice(ts, i, i + 19), chr(1)) AS w FROM " +
      "(SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 19)) AS i " +
      "FROM docs WHERE len(ts) >= 20)), " +
      "marked AS (SELECT doc_id, s, count(*) OVER (PARTITION BY w) AS c, " +
      "row_number() OVER (PARTITION BY w ORDER BY doc_id, s) AS rn " +
      "FROM win), " +
      "pos AS (SELECT DISTINCT doc_id, s + o AS p FROM " +
      "(SELECT doc_id, s, unnest(generate_series(0, 19)) AS o " +
      "FROM marked WHERE c > 1 AND rn > 1)), "

  private val linkageCtes =
    "clean AS (SELECT doc_id AS id, array_to_string(list_slice(" +
      "string_split_regex(lower(trim(text)), '\\s+'), 1, 6), ' ') AS key " +
      "FROM documents), " +
      "dirty AS (SELECT id + 1000000 AS id, " +
      "substr(key, 1, p) || substr(key, p + 2) AS key FROM " +
      "(SELECT id, key, CAST(id % length(key) AS INT) AS p FROM clean)), " +
      "allr AS (SELECT * FROM clean UNION ALL SELECT * FROM dirty), " +
      "b1 AS (SELECT id, key, substr(key, 1, 4) AS blk FROM allr), " +
      "b2 AS (SELECT id, key, substr(key, length(key) - 3) AS blk FROM allr), " +
      "b3 AS (SELECT id, key, array_to_string(list_slice(" +
      "string_split_regex(key, '\\s+'), 3, 4), ' ') AS blk FROM allr), " +
      "cand AS (SELECT DISTINCT id_a, id_b, ka, kb FROM (" +
      "SELECT a.id AS id_a, b.id AS id_b, a.key AS ka, b.key AS kb " +
      "FROM b1 a JOIN b1 b ON a.blk = b.blk AND a.id < b.id WHERE a.blk <> '' " +
      "UNION ALL SELECT a.id, b.id, a.key, b.key " +
      "FROM b2 a JOIN b2 b ON a.blk = b.blk AND a.id < b.id WHERE a.blk <> '' " +
      "UNION ALL SELECT a.id, b.id, a.key, b.key " +
      "FROM b3 a JOIN b3 b ON a.blk = b.blk AND a.id < b.id WHERE a.blk <> ''))"

  private val exactPairCtes =
    "toks AS (SELECT doc_id, " +
      "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
      "sh AS (SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ') " +
      "for i in range(1, len(t) - 1)])) AS s FROM toks WHERE len(t) >= 3), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), " +
      "shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i " +
      "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "jp AS (SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j " +
      "FROM shared JOIN sizes sa ON id_a = sa.doc_id " +
      "JOIN sizes sb ON id_b = sb.doc_id)"

  /** Spark `Text.qualityScore` transliterated: identical double arithmetic
    * (divide → scale → clamp → combine, in the same order both engines
    * evaluate IEEE-deterministically).
    */
  private val qualitySql = {
    def classCount(re: String) =
      s"(length(text) - length(regexp_replace(text, '$re', '', 'g')))"
    def penalty(re: String, w: String) =
      "least(CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
        s"CAST(${classCount(re)} AS DOUBLE) / CAST(length(text) AS DOUBLE) END * $w, 1.0)"
    "greatest(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) - (" +
      penalty("[.,;:!?]", "5.0") + " + " + penalty("[0-9]", "3.0") + " + " +
      penalty("[A-Z]", "2.0") + ") / 3.0, 0.0)"
  }

  /** Spark `Text.languageId` tie-break order (en > de > fr > es, 'und' when
    * no stopword hits) as a CASE — shared by q35 and the q45b pipeline.
    */
  private val langCase =
    "CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und' " +
      "WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en' " +
      "WHEN s_de >= s_fr AND s_de >= s_es THEN 'de' " +
      "WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END"

  private val langScoreCtes =
    "ltoks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS lt " +
      "FROM documents), " +
      "lsc AS (SELECT doc_id, " +
      "len(list_filter(lt, t -> t IN ('the','and','of','to','in','is','that','for','with'))) AS s_en, " +
      "len(list_filter(lt, t -> t IN ('der','die','und','das','ist','nicht','ein','mit','für'))) AS s_de, " +
      "len(list_filter(lt, t -> t IN ('le','la','et','les','des','est','pas','pour','que'))) AS s_fr, " +
      "len(list_filter(lt, t -> t IN ('el','la','que','de','los','es','por','con','para'))) AS s_es " +
      "FROM ltoks)"

  /** One unrolled BPE training iteration (the q102b oracle): pair counts
    * over the 0x1F-joined symbol strings of stage i-1, the best pair under
    * the exact `bpeMerges` tie-break (count desc, then left, then right),
    * and re-segmentation by left-to-right non-overlapping `replace` —
    * which IS the merge loop's single-pass application, since a merged
    * symbol can never re-match its own pair.
    */
  private def bpeStage(i: Int): String =
    s"p$i AS (SELECT string_split(p, chr(31))[1] AS l, " +
      "string_split(p, chr(31))[2] AS r, sum(c) AS pc " +
      "FROM (SELECT unnest([sp[i] || chr(31) || sp[i+1] " +
      "for i in range(1, len(sp))]) AS p, c " +
      s"FROM (SELECT string_split(s, chr(31)) AS sp, c FROM v${i - 1})) " +
      "GROUP BY 1, 2), " +
      s"m$i AS (SELECT l, r FROM p$i ORDER BY pc DESC, l, r LIMIT 1), " +
      s"v$i AS (SELECT replace(s, (SELECT l || chr(31) || r FROM m$i), " +
      s"(SELECT l || r FROM m$i)) AS s, c FROM v${i - 1})"

  /** Chained merge application for the q103b oracle: each fixed merge
    * (l, r) collapses `l<US>r` → `lr` over the whole symbol string; words
    * are joined by the RECORD separator so no merge crosses a word
    * boundary. Same left-to-right replace equivalence as [[bpeStage]].
    */
  private def bpeApply(merges: Seq[(String, String)]): String =
    merges.foldLeft("s") { case (acc, (l, r)) =>
      s"replace($acc, '$l' || chr(31) || '$r', '$l$r')"
    }

  /** Unrolled fixed-iteration PageRank over the q141 derived doc graph —
    * one CTE per round (recursive CTEs disallow the aggregate in the
    * recursive term), mirroring `Graphs.pageRank`'s float recipe exactly:
    * contribution = pr * (1.0/outdeg), new pr = (1.0-d)/N + d * Σ.
    */
  /** Markov-attribution replay: journey transitions (touches strictly
    * before the first conversion), transition probabilities, then `iters`
    * power steps as ONE recursive CTE keyed by (blocked-state, state) —
    * blk '' is the base chain, each touch type's chain pins its own state
    * to 0. Mirrors `EventAnalytics.markovAttribution` exactly.
    *
    * Recursive, not unrolled: DuckDB plans a 40-deep unrolled chain
    * super-linearly (measured ~×2 per 2 rounds), while the recursive form
    * runs the whole thing in ~4 s. The anchor's v MUST be cast to DOUBLE —
    * a bare `0.0` literal types the recursion's union as DECIMAL(2,1) and
    * silently rounds every generation to one decimal. Every (blk, state)
    * row joins the previous generation on blk alone (then filters via the
    * transition join) so absorbing states — which have no outgoing
    * transitions — still carry a non-null iteration counter.
    */
  /** Shared journey-extraction + transition-probability CTEs for the
    * Markov-chain oracles (q237/q241).
    */
  private val markovHeadSql: String =
    "WITH RECURSIVE scoped AS (SELECT user_id AS u, ts, event_id AS o, " +
      "event_type AS t FROM events WHERE event_type IN " +
      "('click', 'signup', 'view', 'purchase')), " +
      "fc AS (SELECT u, ts AS fts, o AS fo FROM (SELECT u, ts, o, " +
      "row_number() OVER (PARTITION BY u ORDER BY ts, o) AS rn " +
      "FROM scoped WHERE t = 'purchase') WHERE rn = 1), " +
      "tch AS (SELECT s.u, s.ts, s.o, s.t FROM scoped s LEFT JOIN fc " +
      "ON s.u = fc.u WHERE s.t <> 'purchase' AND (fc.u IS NULL OR " +
      "s.ts < fc.fts OR (s.ts = fc.fts AND s.o < fc.fo))), " +
      "sq AS (SELECT u, t, lag(t) OVER (PARTITION BY u ORDER BY ts, o) " +
      "AS prev FROM tch), " +
      "tt AS (SELECT COALESCE(prev, '__START__') AS frm, t AS dst " +
      "FROM sq), " +
      "lt AS (SELECT u, t AS lastt FROM (SELECT u, t, row_number() " +
      "OVER (PARTITION BY u ORDER BY ts DESC, o DESC) AS rn FROM tch) " +
      "WHERE rn = 1), " +
      "cv AS (SELECT DISTINCT u FROM scoped WHERE t = 'purchase'), " +
      "term AS (SELECT COALESCE(lt.lastt, '__START__') AS frm, " +
      "CASE WHEN cv.u IS NOT NULL THEN '__CONV__' ELSE '__NULL__' END " +
      "AS dst FROM cv FULL JOIN lt ON cv.u = lt.u), " +
      "tr AS (SELECT frm, dst, count(*) AS c FROM " +
      "(SELECT * FROM tt UNION ALL SELECT * FROM term) GROUP BY 1, 2), " +
      "ot AS (SELECT frm, sum(c) AS oc FROM tr GROUP BY 1), " +
      "p AS (SELECT tr.frm, tr.dst, CAST(tr.c AS DOUBLE) / ot.oc AS p " +
      "FROM tr JOIN ot USING (frm)), "

  /** Exact Shapley over subset-bitmask chains: blk m ∈ 0..7, bit 1 =
    * click, 2 = signup, 4 = view; a state is blocked when its bit is NOT
    * set. Mirrors `EventAnalytics.markovShapley` (same fixed-iteration
    * recursion as markovSql, bitmask-keyed).
    */
  private def markovShapleySql(iters: Int): String = {
    markovHeadSql +
      "masks AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS m), " +
      "sball AS (SELECT m AS b, x.s, " +
      "CASE WHEN x.s = 'click' THEN (m & 1) = 0 " +
      "WHEN x.s = 'signup' THEN (m & 2) = 0 " +
      "WHEN x.s = 'view' THEN (m & 4) = 0 ELSE FALSE END AS blocked " +
      "FROM masks, (SELECT unnest(['__START__', 'click', 'signup', " +
      "'view', '__CONV__', '__NULL__']) AS s) x), " +
      "it AS (" +
      "SELECT 0 AS k, b, s, CAST(CASE WHEN s = '__CONV__' THEN 1.0 " +
      "ELSE 0.0 END AS DOUBLE) AS v FROM sball " +
      "UNION ALL " +
      "SELECT ni.k, ni.b, ni.s, ni.v FROM (" +
      "SELECT any_value(prev.k) + 1 AS k, sball.b, sball.s, " +
      "CASE WHEN sball.s = '__CONV__' THEN CAST(1.0 AS DOUBLE) " +
      "WHEN sball.s = '__NULL__' THEN 0.0 " +
      "WHEN sball.blocked THEN 0.0 " +
      "ELSE COALESCE(sum(p.p * prev.v), 0.0) END AS v " +
      "FROM sball JOIN it prev ON prev.b = sball.b " +
      "LEFT JOIN p ON p.frm = sball.s AND p.dst = prev.s " +
      "GROUP BY sball.b, sball.s, sball.blocked) ni " +
      s"WHERE ni.k <= $iters), " +
      s"vv AS (SELECT b, v FROM it WHERE k = $iters AND " +
      "s = '__START__'), " +
      "ch AS (SELECT unnest(['click', 'signup', 'view']) AS t, " +
      "unnest([1, 2, 4]) AS bit), " +
      "shap AS (SELECT ch.t AS touch_type, sum(" +
      "CASE ((m.m & 1) + ((m.m >> 1) & 1) + ((m.m >> 2) & 1)) " +
      "WHEN 0 THEN 1.0 / 3 WHEN 1 THEN 1.0 / 6 ELSE 1.0 / 3 END * " +
      "(v1.v - v0.v)) AS phi FROM ch JOIN masks m ON (m.m & ch.bit) = 0 " +
      "JOIN vv v0 ON v0.b = m.m " +
      "JOIN vv v1 ON v1.b = (m.m | ch.bit) GROUP BY 1), " +
      "ps AS (SELECT sum(phi) AS sp FROM shap), " +
      "nc AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM cv), " +
      "va AS (SELECT v FROM vv WHERE b = 7), " +
      "vn AS (SELECT v FROM vv WHERE b = 0) " +
      "SELECT touch_type, round(phi, 6) AS shapley, " +
      "round(CASE WHEN ps.sp > 0 THEN phi / ps.sp END, 6) AS share, " +
      "round(CASE WHEN ps.sp > 0 THEN phi / ps.sp * nc.n END, 6) " +
      "AS credited_conversions, round(va.v, 6) AS v_all, " +
      "round(vn.v, 6) AS v_none " +
      "FROM shap, ps, nc, va, vn ORDER BY touch_type"
  }

  private def markovSql(iters: Int): String = {
    markovHeadSql +
      "blk AS (SELECT unnest(['', 'click', 'signup', 'view']) AS b), " +
      "sball AS (SELECT b, unnest(['__START__', 'click', 'signup', " +
      "'view', '__CONV__', '__NULL__']) AS s FROM blk), " +
      "it AS (" +
      "SELECT 0 AS k, b, s, CAST(CASE WHEN s = '__CONV__' THEN 1.0 " +
      "ELSE 0.0 END AS DOUBLE) AS v FROM sball " +
      "UNION ALL " +
      "SELECT ni.k, ni.b, ni.s, ni.v FROM (" +
      "SELECT any_value(prev.k) + 1 AS k, sball.b, sball.s, " +
      "CASE WHEN sball.s = '__CONV__' THEN CAST(1.0 AS DOUBLE) " +
      "WHEN sball.s = '__NULL__' THEN 0.0 " +
      "WHEN sball.s = sball.b THEN 0.0 " +
      "ELSE COALESCE(sum(p.p * prev.v), 0.0) END AS v " +
      "FROM sball JOIN it prev ON prev.b = sball.b " +
      "LEFT JOIN p ON p.frm = sball.s AND p.dst = prev.s " +
      "GROUP BY sball.b, sball.s) ni " +
      s"WHERE ni.k <= $iters), " +
      s"bs AS (SELECT v AS b FROM it WHERE k = $iters AND b = '' AND " +
      "s = '__START__'), " +
      s"rm AS (SELECT b AS touch_type, v FROM it WHERE k = $iters AND " +
      "b <> '' AND s = '__START__'), " +
      "re AS (SELECT touch_type, CASE WHEN bs.b > 0 THEN " +
      "1.0 - rm.v / bs.b ELSE 0.0 END AS r FROM rm, bs), " +
      "rs AS (SELECT sum(r) AS sr FROM re), " +
      "nc AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM cv) " +
      "SELECT touch_type, round(bs.b, 6) AS base_p, " +
      "round(re.r, 6) AS removal_effect, " +
      "round(CASE WHEN rs.sr > 0 THEN re.r / rs.sr END, 6) AS share, " +
      "round(CASE WHEN rs.sr > 0 THEN re.r / rs.sr * nc.n END, 6) " +
      "AS credited_conversions FROM re, bs, rs, nc ORDER BY touch_type"
  }

  private def pageRankSql(iters: Int): String = {
    val head =
      "WITH mn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), " +
      "e AS (SELECT doc_id AS src, (doc_id + 1) % mn.n AS dst " +
      "FROM documents, mn " +
      "UNION ALL SELECT doc_id, (doc_id + 7) % mn.n FROM documents, mn " +
      "WHERE doc_id % 2 = 0 " +
      "UNION ALL SELECT doc_id, (doc_id + 101) % mn.n FROM documents, mn " +
      "WHERE doc_id % 3 = 0), " +
      "od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1), " +
      "r0 AS (SELECT doc_id AS node, 1.0 / mn.n AS pr FROM documents, mn)"
    val rounds = (1 to iters).map { k =>
      s"r$k AS (SELECT d.doc_id AS node, " +
        "(1.0 - 0.85) / mn.n + 0.85 * COALESCE(s.m, 0.0) AS pr " +
        "FROM documents d CROSS JOIN mn LEFT JOIN " +
        "(SELECT e.dst AS dst, sum(r.pr * (1.0 / od.outdeg)) AS m " +
        s"FROM e JOIN r${k - 1} r ON e.src = r.node " +
        "JOIN od ON e.src = od.src GROUP BY e.dst) s ON d.doc_id = s.dst)"
    }.mkString(", ", ", ", "")
    head + rounds +
      s" SELECT node, round(pr, 9) AS pr FROM r$iters ORDER BY node"
  }

  /** q321's MMR greedy, unrolled: per round an anti-join of the pool
    * against the selections, a max-cosine aggregate (q39's list-lambda
    * recipe), and a per-query (mmr desc, id) argmax — selected frames
    * MATERIALIZED (each round reads the previous selections twice:
    * anti-join and similarity sides).
    */
  private def mmrSql(k: Int, lambda: Double): String = {
    def cos(a: String, b: String): String =
      s"list_sum(list_transform(list_zip($a, $b), " +
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / " +
        s"(sqrt(list_sum(list_transform($a, " +
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
        s"sqrt(list_sum(list_transform($b, " +
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
    val head =
      "WITH cand AS MATERIALIZED (SELECT vec_id % 4 AS q, " +
      "vec_id AS id, CAST(vec_id * 31 % 97 AS DOUBLE) / 97.0 AS s, " +
      "embedding AS v FROM embeddings WHERE vec_id < 80), " +
      s"sel1 AS MATERIALIZED (SELECT q, id, v, 1 AS rank, " +
      s"$lambda * s - (1.0 - $lambda) * 0.0 AS mmr FROM (" +
      "SELECT *, row_number() OVER (PARTITION BY q " +
      s"ORDER BY ($lambda * s - (1.0 - $lambda) * 0.0) DESC, id) AS rn " +
      "FROM cand) WHERE rn = 1)"
    val rounds = (2 to k).map { r =>
      s"u$r AS (SELECT c.* FROM cand c LEFT JOIN sel${r - 1} p " +
        "ON c.q = p.q AND c.id = p.id WHERE p.id IS NULL), " +
        s"m$r AS (SELECT u.q, u.id, u.s, " +
        s"max(${cos("u.v", "p.v")}) AS ms " +
        s"FROM u$r u JOIN sel${r - 1} p ON u.q = p.q " +
        "GROUP BY 1, 2, 3), " +
        s"pc$r AS (SELECT m$r.q, m$r.id, c.v, " +
        s"$lambda * m$r.s - (1.0 - $lambda) * m$r.ms AS mmr " +
        s"FROM m$r JOIN cand c ON m$r.q = c.q AND m$r.id = c.id), " +
        s"p$r AS (SELECT q, id, v, $r AS rank, mmr FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY q " +
        s"ORDER BY mmr DESC, id) AS rn FROM pc$r) WHERE rn = 1), " +
        s"sel$r AS MATERIALIZED (SELECT * FROM sel${r - 1} " +
        s"UNION ALL SELECT * FROM p$r)"
    }.mkString(", ", ", ", "")
    head + rounds +
      s" SELECT q, id, rank, round(mmr, 6) AS mmr FROM sel$k " +
      "ORDER BY q, rank"
  }

  /** q329's k-center greedy coreset: unrolled farthest-first rounds —
    * seed = min id, per-round running-min distance carry (d_i =
    * least(d_{i−1}, 1 − cos(·, c_i))), argmax by (d desc, id) — the
    * operator's exact recipe with the q39/mmr cosine formulation.
    */
  private def kCenterSql(k: Int): String = {
    def cos(a: String, b: String): String =
      s"list_sum(list_transform(list_zip($a, $b), " +
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / " +
        s"(sqrt(list_sum(list_transform($a, " +
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
        s"sqrt(list_sum(list_transform($b, " +
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
    val head =
      "WITH pool AS MATERIALIZED (SELECT vec_id AS id, embedding AS v " +
        "FROM embeddings WHERE vec_id < 100), " +
        "sel1 AS MATERIALIZED (SELECT id, v, 1 AS rank, " +
        "CAST(NULL AS DOUBLE) AS radius FROM pool ORDER BY id LIMIT 1), " +
        "d1 AS MATERIALIZED (SELECT p.id, p.v, " +
        s"1.0 - ${cos("p.v", "s.v")} AS d FROM pool p, sel1 s)"
    val rounds = (2 to k).map { r =>
      s"p$r AS MATERIALIZED (SELECT id, v, $r AS rank, d AS radius " +
        s"FROM d${r - 1} WHERE id NOT IN (SELECT id FROM sel${r - 1}) " +
        "ORDER BY d DESC, id LIMIT 1), " +
        s"sel$r AS MATERIALIZED (SELECT * FROM sel${r - 1} " +
        s"UNION ALL SELECT * FROM p$r)" +
        (if (r < k)
          s", d$r AS MATERIALIZED (SELECT a.id, a.v, " +
            s"least(a.d, 1.0 - ${cos("a.v", "p.v")}) AS d " +
            s"FROM d${r - 1} a, p$r p)"
        else "")
    }.mkString(", ", ", ", "")
    head + rounds +
      s" SELECT id AS vec_id, rank, round(radius, 6) AS radius " +
      s"FROM sel$k ORDER BY rank"
  }

  /** q331's facility-location greedy, unrolled: pairwise cosines ONCE
    * (the operator's pinned pair frame), then per round a marginal-gain
    * sum Σ_p greatest(s − cm, 0) over the running best-coverage carry,
    * argmax by (gain desc, id), and a greatest() coverage fold — the
    * kCenter/mmr unroll pattern with a sum objective instead of max/min.
    */
  private def facilityLocationSql(k: Int): String = {
    def cos(a: String, b: String): String =
      s"list_sum(list_transform(list_zip($a, $b), " +
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / " +
        s"(sqrt(list_sum(list_transform($a, " +
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
        s"sqrt(list_sum(list_transform($b, " +
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
    val head =
      "WITH pool AS MATERIALIZED (SELECT vec_id AS id, embedding AS v " +
        "FROM embeddings WHERE vec_id < 100), " +
        "pairs AS MATERIALIZED (SELECT c.id AS cid, p.id AS pid, " +
        s"${cos("c.v", "p.v")} AS s FROM pool c, pool p), " +
        "sel1 AS MATERIALIZED (SELECT cid AS id, 1 AS rank, gain FROM (" +
        "SELECT cid, sum(greatest(s, 0.0)) AS gain FROM pairs " +
        "GROUP BY 1) ORDER BY gain DESC, cid LIMIT 1), " +
        "cov1 AS MATERIALIZED (SELECT p.pid, greatest(p.s, 0.0) AS cm " +
        "FROM pairs p JOIN sel1 w ON p.cid = w.id)"
    val rounds = (2 to k).map { r =>
      s"p$r AS MATERIALIZED (SELECT cid AS id, $r AS rank, gain FROM (" +
        "SELECT p.cid, sum(greatest(p.s - c.cm, 0.0)) AS gain " +
        s"FROM pairs p JOIN cov${r - 1} c ON p.pid = c.pid " +
        s"WHERE p.cid NOT IN (SELECT id FROM sel${r - 1}) GROUP BY 1) " +
        "ORDER BY gain DESC, cid LIMIT 1), " +
        s"sel$r AS MATERIALIZED (SELECT * FROM sel${r - 1} " +
        s"UNION ALL SELECT * FROM p$r)" +
        (if (r < k)
          s", cov$r AS MATERIALIZED (SELECT c.pid, " +
            "greatest(c.cm, p.s) AS cm " +
            s"FROM cov${r - 1} c JOIN (SELECT pr.pid, pr.s FROM pairs pr " +
            s"JOIN p$r w ON pr.cid = w.id) p ON p.pid = c.pid)"
        else "")
    }.mkString(", ", ", ", "")
    head + rounds +
      s" SELECT id AS vec_id, rank, round(gain, 6) AS gain " +
      s"FROM sel$k ORDER BY rank"
  }

  /** q332's TextRank, unrolled: q123's manufactured sentences, distinct
    * lowercase alphanumeric tokens, the paper's overlap/(ln+ln) edge
    * weights out-normalized once, then `iters` MATERIALIZED score rounds
    * of WS = (1−d) + d·Σ wn·WS (q141's unroll pattern with the constant
    * teleport and per-doc graphs). Damping is the gate's dyadic 7/8 and
    * (1.0 - 0.875) stays textual so both engines subtract the identical
    * doubles (see q332Textrank's scaladoc for the half-boundary story).
    */
  private def textRankSql(iters: Int): String = {
    val head =
      "WITH d AS (SELECT doc_id, replace(text, ' the ', '. The ') " +
        "AS text FROM documents), " +
        "sp AS (SELECT doc_id, list_filter(string_split_regex(" +
        "trim(text), '[.!?]+\\s+'), x -> length(x) > 0)[1:64] AS ss " +
        "FROM d), " +
        "ix AS (SELECT doc_id, ss, unnest(range(1, len(ss) + 1)) AS sid " +
        "FROM sp WHERE len(ss) >= 1), " +
        "st AS MATERIALIZED (SELECT doc_id, CAST(sid AS BIGINT) AS sid, " +
        "toks, CAST(len(toks) AS BIGINT) AS ntok FROM (" +
        "SELECT doc_id, sid, list_distinct(list_filter(" +
        "string_split_regex(lower(ss[sid]), '[^a-z0-9]+'), " +
        "x -> length(x) > 0)) AS toks FROM ix)), " +
        "e AS (SELECT a.doc_id, a.sid AS i, b.sid AS j, " +
        "CAST(len(list_filter(a.toks, x -> list_contains(b.toks, x))) " +
        "AS DOUBLE) AS ov, " +
        "ln(CAST(a.ntok AS DOUBLE)) + ln(CAST(b.ntok AS DOUBLE)) AS den " +
        "FROM st a JOIN st b ON a.doc_id = b.doc_id AND a.sid <> b.sid), " +
        "ef AS (SELECT doc_id, i, j, ov / den AS w FROM e " +
        "WHERE ov > 0 AND den > 0), " +
        "ew AS MATERIALIZED (SELECT ef.doc_id, ef.i AS src, " +
        "ef.j AS dst, ef.w / o.os AS wn FROM ef JOIN (" +
        "SELECT doc_id, i, sum(w) AS os FROM ef GROUP BY 1, 2) o " +
        "ON ef.doc_id = o.doc_id AND ef.i = o.i), " +
        "s0 AS MATERIALIZED (SELECT doc_id, sid, " +
        "CAST(1.0 AS DOUBLE) AS sc FROM st)"
    val rounds = (1 to iters).map { r =>
      s"s$r AS MATERIALIZED (SELECT st.doc_id, st.sid, " +
        "(1.0 - 0.875) + 0.875 * COALESCE(m.mm, 0.0) AS sc " +
        "FROM st LEFT JOIN (SELECT ew.doc_id, ew.dst AS sid, " +
        s"sum(ew.wn * p.sc) AS mm FROM ew JOIN s${r - 1} p " +
        "ON ew.doc_id = p.doc_id AND ew.src = p.sid GROUP BY 1, 2) m " +
        "ON st.doc_id = m.doc_id AND st.sid = m.sid)"
    }.mkString(", ", ", ", "")
    head + rounds +
      " SELECT st.doc_id, st.sid AS sent_idx, st.ntok AS n_tokens, " +
      s"round(f.sc, 6) AS score FROM st JOIN s$iters f " +
      "ON st.doc_id = f.doc_id AND st.sid = f.sid " +
      "ORDER BY st.doc_id, st.sid"
  }

  /** q317's scaling-law fit: per-candidate conditional log-moment sums
    * (the temperatureScaling pattern) + closed-form OLS per c, argmin by
    * least() with an ascending-c CASE scan (the operator's struct-min
    * tie rule).
    */
  private def scalingLawSql(fracs: Seq[Double]): String = {
    val sums = fracs.zipWithIndex.map { case (f, i) =>
      val y = s"ln(loss - $f * lmin)"
      s"sum($y) AS sy$i, sum(x * $y) AS sxy$i, sum($y * $y) AS syy$i"
    }.mkString(", ")
    val derived = fracs.indices.map { i =>
      s"sxy$i / nd - mx * (sy$i / nd) AS cov$i, " +
        s"syy$i / nd - (sy$i / nd) * (sy$i / nd) AS vy$i"
    }.mkString(", ")
    val sses = fracs.indices.map { i =>
      s"nd * (vy$i - cov$i * cov$i / vx) AS sse$i"
    }.mkString(", ")
    val least = fracs.indices.map(i => s"sse$i")
      .mkString("least(", ", ", ")")
    def pick(expr: Int => String): String =
      fracs.zipWithIndex.map { case (_, i) =>
        s"WHEN sse$i = best THEN ${expr(i)}"
      }.mkString("CASE ", " ", " END")
    "WITH pu AS (SELECT user_id, " +
      "floor(min(floor(epoch(ts))) / 3600) AS bin FROM events " +
      "GROUP BY user_id), " +
      "pb AS (SELECT bin, CAST(count(*) AS BIGINT) AS nu FROM pu " +
      "GROUP BY 1), " +
      "pts AS (SELECT CAST(sum(nu) OVER (ORDER BY bin) AS BIGINT) " +
      "AS n_scale FROM pb), " +
      "p2 AS (SELECT n_scale, 2.0 + 10.0 * " +
      "power(CAST(n_scale AS DOUBLE), -0.3) AS loss FROM pts), " +
      "lm AS (SELECT min(loss) AS lmin FROM p2), " +
      "d AS (SELECT p2.*, lm.lmin, " +
      "ln(CAST(n_scale AS DOUBLE)) AS x FROM p2, lm), " +
      "a AS (SELECT CAST(count(*) AS BIGINT) AS n_points, " +
      s"min(lmin) AS lmin, sum(x) AS sx, sum(x * x) AS sxx, $sums " +
      "FROM d), " +
      "b AS (SELECT *, CAST(n_points AS DOUBLE) AS nd, " +
      "sx / CAST(n_points AS DOUBLE) AS mx FROM a), " +
      "b2 AS (SELECT *, sxx / nd - mx * mx AS vx FROM b), " +
      s"c AS (SELECT *, $derived FROM b2), " +
      s"e AS (SELECT *, $sses FROM c), " +
      s"f AS (SELECT *, $least AS best FROM e) " +
      "SELECT n_points, " +
      s"round(${pick(i => s"${fracs(i)} * lmin")}, 4) AS c, " +
      s"round(${pick(i =>
        s"exp(sy$i / nd - (cov$i / vx) * mx)")}, 4) AS a, " +
      s"round(${pick(i => s"-(cov$i / vx)")}, 4) AS b, " +
      s"round(${pick(i =>
        s"cov$i * cov$i / (vx * vy$i)")}, 6) AS r2 FROM f"
  }

  /** Unrolled personalized weighted PageRank (random walk with restart)
    * over the q141 ring graph, mirroring `Graphs.pageRankPersonalized`
    * exactly: weights normalize once per source, ranks start AT the
    * restart distribution, teleport and dangling mass both land on r.
    * The q311 embodiment is dyadic-exact (out-weight sums of exactly 8,
    * a 32-node seed set, damping 7/8), so both engines compute
    * bit-identical doubles — RWR rationals land exactly on decimal
    * half-boundaries, where no rounding precision can absorb ulp drift.
    * Per-round state CTEs are MATERIALIZED (each round reads the
    * previous rank frame twice — contribs and dangling; the hitsSql
    * inliner lesson).
    */
  private def pprSql(iters: Int): String = {
    val head =
      "WITH mn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), " +
      "e0 AS (SELECT doc_id AS src, (doc_id + 1) % mn.n AS dst, " +
      "CAST(8 - 2 * (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) " +
      "- 3 * (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS DOUBLE) " +
      "AS w FROM documents, mn " +
      "UNION ALL SELECT doc_id, (doc_id + 7) % mn.n, 2.0 " +
      "FROM documents, mn WHERE doc_id % 2 = 0 " +
      "UNION ALL SELECT doc_id, (doc_id + 101) % mn.n, 3.0 " +
      "FROM documents, mn WHERE doc_id % 3 = 0), " +
      "e AS MATERIALIZED (SELECT src, dst, w FROM e0 WHERE w > 0), " +
      "nd AS MATERIALIZED (SELECT src AS node FROM e " +
      "UNION SELECT dst FROM e), " +
      "rs AS MATERIALIZED (SELECT node, CASE WHEN node < 32 " +
      "THEN 1 ELSE 0 END AS in_r FROM nd), " +
      "nr AS (SELECT CAST(sum(in_r) AS DOUBLE) AS k FROM rs), " +
      "rr AS MATERIALIZED (SELECT node, CASE WHEN in_r = 1 " +
      "THEN 1.0 / nr.k ELSE 0.0 END AS r FROM rs, nr), " +
      "ow AS MATERIALIZED (SELECT src, sum(w) AS ow FROM e GROUP BY 1), " +
      "ew AS MATERIALIZED (SELECT e.src, e.dst, e.w / ow.ow AS w " +
      "FROM e JOIN ow USING (src)), " +
      "dang AS MATERIALIZED (SELECT rr.node FROM rr LEFT JOIN ow " +
      "ON rr.node = ow.src WHERE ow.src IS NULL), " +
      "p0 AS MATERIALIZED (SELECT node, r AS pr FROM rr)"
    val rounds = (1 to iters).map { k =>
      s"c$k AS (SELECT ew.dst AS node, sum(p.pr * ew.w) AS m " +
        s"FROM ew JOIN p${k - 1} p ON ew.src = p.node GROUP BY 1), " +
        s"d$k AS (SELECT COALESCE(sum(p.pr), 0.0) AS dm " +
        s"FROM dang JOIN p${k - 1} p USING (node)), " +
        s"p$k AS MATERIALIZED (SELECT rr.node, " +
        s"(1.0 - 0.875) * rr.r + 0.875 * (COALESCE(c$k.m, 0.0) + " +
        s"d$k.dm * rr.r) AS pr " +
        s"FROM rr LEFT JOIN c$k USING (node), d$k)"
    }.mkString(", ", ", ", "")
    head + rounds +
      s" SELECT node, round(pr, 9) AS pr FROM p$iters ORDER BY node"
  }

  /** Unrolled synchronous HITS over the q141 derived graph — one
    * (raw-sum, coalesce-to-all-nodes, L1-normalize) CTE triple per score
    * per round, mirroring `Graphs.hits` exactly: deduped directed edges,
    * hub⁰ = 1, authority from hubs then hub from authorities.
    */
  private def hitsSql(iters: Int): String = {
    val head =
      "WITH mn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), " +
      "e0 AS (SELECT doc_id AS src, (doc_id + 1) % mn.n AS dst " +
      "FROM documents, mn " +
      "UNION ALL SELECT doc_id, (doc_id + 7) % mn.n FROM documents, mn " +
      "WHERE doc_id % 2 = 0 " +
      "UNION ALL SELECT doc_id, (doc_id + 101) % mn.n FROM documents, mn " +
      "WHERE doc_id % 3 = 0), " +
      // MATERIALIZED + window normalizers: every CTE is referenced once
      // per consumer, so the 5-round unroll stays linear — a scalar
      // `(SELECT sum(s) FROM af_k)` would reference each frame twice and
      // the inliner expands 2^rounds copies (measured: "Too many open
      // files" from re-opened parquet scans)
      "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0 " +
      "WHERE src <> dst), " +
      "nd AS MATERIALIZED (SELECT src AS node FROM e " +
      "UNION SELECT dst FROM e), " +
      "h0 AS (SELECT node, 1.0 AS hub FROM nd)"
    val rounds = (1 to iters).map { k =>
      s"ar$k AS (SELECT e.dst AS node, sum(h.hub) AS s " +
        s"FROM e JOIN h${k - 1} h ON e.src = h.node GROUP BY 1), " +
        s"af$k AS (SELECT nd.node, COALESCE(ar$k.s, 0.0) AS s " +
        s"FROM nd LEFT JOIN ar$k USING (node)), " +
        s"a$k AS (SELECT node, s / sum(s) OVER () AS authority " +
        s"FROM af$k), " +
        s"hr$k AS (SELECT e.src AS node, sum(a.authority) AS s " +
        s"FROM e JOIN a$k a ON e.dst = a.node GROUP BY 1), " +
        s"hf$k AS (SELECT nd.node, COALESCE(hr$k.s, 0.0) AS s " +
        s"FROM nd LEFT JOIN hr$k USING (node)), " +
        s"h$k AS (SELECT node, s / sum(s) OVER () AS hub FROM hf$k)"
    }.mkString(", ", ", ", "")
    head + rounds +
      s" SELECT node, round(h$iters.hub, 9) AS hub, " +
      s"round(a$iters.authority, 9) AS authority " +
      s"FROM h$iters JOIN a$iters USING (node) ORDER BY node"
  }

  /** Unrolled Bradley–Terry MM over the q295 synthetic preference log.
    * Every θ CTE is MATERIALIZED — each round references the previous θ
    * twice (both join sides), so the plain inliner would expand 2^rounds
    * copies (the hitsSql lesson); the normalizer is a window sum for the
    * same reason.
    */
  private def bradleyTerrySql(iters: Int): String = {
    val head =
      "WITH src AS (SELECT user_id % 16 AS a, (user_id * 31) % 16 AS b, " +
      "event_id FROM events), " +
      "p AS MATERIALIZED (SELECT CASE WHEN event_id % 3 = 0 " +
      "THEN least(a, b) ELSE greatest(a, b) END AS w, " +
      "CASE WHEN event_id % 3 = 0 THEN greatest(a, b) " +
      "ELSE least(a, b) END AS l FROM src WHERE a <> b), " +
      "g AS MATERIALIZED (SELECT i, j, CAST(count(*) AS BIGINT) AS n " +
      "FROM (SELECT w AS i, l AS j FROM p " +
      "UNION ALL SELECT l, w FROM p) GROUP BY 1, 2), " +
      "it AS MATERIALIZED (SELECT DISTINCT i AS item FROM g), " +
      "wn AS MATERIALIZED (SELECT it.item, " +
      "CAST(COALESCE(x.n, 0) AS BIGINT) AS wins FROM it LEFT JOIN " +
      "(SELECT w AS item, count(*) AS n FROM p GROUP BY 1) x " +
      "USING (item)), " +
      "t0 AS (SELECT item, 1.0 AS t FROM it)"
    val rounds = (1 to iters).map { k =>
      s"d$k AS (SELECT g.i AS item, sum(g.n / (ti.t + tj.t)) AS d " +
        s"FROM g JOIN t${k - 1} ti ON g.i = ti.item " +
        s"JOIN t${k - 1} tj ON g.j = tj.item GROUP BY 1), " +
        s"r$k AS (SELECT wn.item, wn.wins / d$k.d AS t " +
        s"FROM wn JOIN d$k USING (item)), " +
        s"t$k AS MATERIALIZED (SELECT item, t / sum(t) OVER () AS t " +
        s"FROM r$k)"
    }.mkString(", ", ", ", "")
    head + rounds +
      " SELECT wn.item, wn.wins, gt.games, " +
      s"round(t$iters.t, 9) AS strength " +
      "FROM wn JOIN (SELECT i AS item, CAST(sum(n) AS BIGINT) AS games " +
      s"FROM g GROUP BY 1) gt USING (item) JOIN t$iters USING (item) " +
      "ORDER BY item"
  }

  /** Unrolled Dawid–Skene EM over q296's three synthetic raters. The
    * posterior CTEs are MATERIALIZED (each round reads the previous one
    * from the prior, denominator AND numerator — 3^rounds inlining
    * otherwise); the E-step normalization splits into two CTEs because a
    * window cannot nest inside another window's argument.
    */
  private def dawidSkeneSql(iters: Int, eps: Double): String = {
    val head =
      "WITH d AS (SELECT doc_id, lang FROM documents), " +
      "rt AS MATERIALIZED (SELECT doc_id AS item, 1 AS rater, " +
      "lang AS label FROM d " +
      "UNION ALL SELECT doc_id, 2, CASE WHEN doc_id % 7 = 0 THEN 'zz' " +
      "ELSE lang END FROM d " +
      "UNION ALL SELECT doc_id, 3, CASE WHEN doc_id % 13 = 0 THEN 'yy' " +
      "ELSE lang END FROM d), " +
      "cls AS MATERIALIZED (SELECT DISTINCT label AS c FROM rt), " +
      "cc AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS cnt " +
      "FROM cls), " +
      "mi AS MATERIALIZED (SELECT item, CAST(count(*) AS BIGINT) AS m " +
      "FROM rt GROUP BY 1), " +
      "ni AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM mi), " +
      "nir AS MATERIALIZED (SELECT item, rater, " +
      "CAST(count(*) AS BIGINT) AS nir FROM rt GROUP BY 1, 2), " +
      "t0 AS MATERIALIZED (SELECT v.item, v.c, " +
      "v.v / CAST(mi.m AS DOUBLE) AS t FROM " +
      "(SELECT item, label AS c, CAST(count(*) AS BIGINT) AS v FROM rt " +
      "GROUP BY 1, 2) v JOIN mi USING (item))"
    val rounds = (1 to iters).map { k =>
      s"pr$k AS (SELECT c, s / ni.n AS p FROM " +
        s"(SELECT c, sum(t) AS s FROM t${k - 1} GROUP BY 1), ni), " +
        s"den$k AS (SELECT nir.rater, t.c, sum(nir.nir * t.t) AS den " +
        s"FROM nir JOIN t${k - 1} t USING (item) GROUP BY 1, 2), " +
        s"num$k AS (SELECT rt.rater, t.c, rt.label AS k, sum(t.t) AS num " +
        s"FROM rt JOIN t${k - 1} t USING (item) GROUP BY 1, 2, 3), " +
        s"e$k AS (SELECT rt.item, cls.c, " +
        s"sum(ln((COALESCE(n.num, 0.0) + $eps) / " +
        s"(COALESCE(dd.den, 0.0) + $eps * cc.cnt))) AS lsum " +
        s"FROM rt CROSS JOIN cls CROSS JOIN cc " +
        s"LEFT JOIN num$k n ON n.rater = rt.rater AND n.c = cls.c " +
        s"AND n.k = rt.label " +
        s"LEFT JOIN den$k dd ON dd.rater = rt.rater AND dd.c = cls.c " +
        s"GROUP BY 1, 2), " +
        s"s$k AS (SELECT e.item, e.c, ln(p.p) + e.lsum AS sc " +
        s"FROM e$k e JOIN pr$k p USING (c)), " +
        s"sx$k AS (SELECT item, c, " +
        s"exp(sc - max(sc) OVER (PARTITION BY item)) AS ex FROM s$k), " +
        s"t$k AS MATERIALIZED (SELECT item, c, " +
        s"ex / sum(ex) OVER (PARTITION BY item) AS t FROM sx$k)"
    }.mkString(", ", ", ", "")
    head + rounds +
      s" SELECT item, c AS label, round(t, 6) AS posterior, " +
      "(row_number() OVER (PARTITION BY item ORDER BY t DESC, c) = 1) " +
      s"AS is_map FROM t$iters ORDER BY item, label"
  }

  /** q302's hash-permutation test: one aggregate carrying the observed
    * split plus 2k md5-parity conditional sums (generated, like the
    * operator's expression list), then row arithmetic and the add-one
    * p-value. Outcomes are integer counts, so every double is exact and
    * the extreme count replays bit-for-bit.
    */
  private def permutationTestSql(k: Int): String = {
    def par(s: Int): String = {
      val a = s"ascii(substr(md5(CAST(user_id AS VARCHAR) || chr(1) || " +
        s"'p${s}r0'), 1, 1))"
      s"(CASE WHEN $a >= 97 THEN $a - 87 ELSE $a - 48 END) % 2 = 1"
    }
    val saltAggs = (0 until k).map { s =>
      s"sum(CASE WHEN ${par(s)} THEN CAST(y AS DOUBLE) ELSE 0.0 END) " +
        s"AS ss$s, " +
        s"CAST(sum(CASE WHEN ${par(s)} THEN 1 ELSE 0 END) AS BIGINT) " +
        s"AS ns$s"
    }.mkString(", ")
    val extremes = (0 until k).map { s =>
      s"(CASE WHEN ns$s > 0 AND ns$s < n AND " +
        s"abs(ss$s / ns$s - (stot - ss$s) / (n - ns$s)) >= abs(obs) " +
        s"THEN 1 ELSE 0 END)"
    }.mkString(" + ")
    "WITH pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS y " +
      "FROM events GROUP BY 1), " +
      "a AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
      "sum(CAST(y AS DOUBLE)) AS stot, " +
      "sum(CASE WHEN user_id % 2 = 0 THEN CAST(y AS DOUBLE) ELSE 0.0 " +
      "END) AS st, " +
      "CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) " +
      s"AS nt, $saltAggs FROM pu), " +
      "d AS (SELECT *, st / nt AS mean_t, " +
      "(stot - st) / (n - nt) AS mean_c FROM a), " +
      "d2 AS (SELECT *, mean_t - mean_c AS obs FROM d), " +
      s"e AS (SELECT *, CAST($extremes AS BIGINT) AS n_extreme FROM d2) " +
      "SELECT n, round(mean_t, 4) AS mean_t, round(mean_c, 4) AS mean_c, " +
      "round(obs, 4) AS observed_diff, " +
      s"CAST($k AS INTEGER) AS k, n_extreme, " +
      s"round((1.0 + n_extreme) / ${k + 1}.0, 6) AS p_value FROM e"
  }

  /** q304's temperature grid search: per-T conditional NLL sums (the
    * permutationTestSql pattern) + a LEAST/CASE argmin that matches the
    * operator's (nll, then smaller T) struct-min tie rule because the
    * CASE scans the grid in ascending-T order.
    */
  private def temperatureScalingSql(grid: Seq[Double]): String = {
    // softplus form (mirrors the operator): max(x,0) + ln(1+exp(-|x|)) —
    // finite for every z; the direct -ln(1-q) errors on ln(0) in DuckDB
    // when sigma rounds to 1.0
    val nlls = grid.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN y = 1 THEN " +
        s"greatest(-(z / $t), 0.0) + ln(1.0 + exp(-abs(-(z / $t)))) " +
        s"ELSE greatest(z / $t, 0.0) + ln(1.0 + exp(-abs(z / $t))) " +
        s"END) AS s$i"
    }.mkString(", ")
    val least = grid.indices.map(i => s"s$i / n").mkString("least(", ", ", ")")
    // CAST: a bare DuckDB decimal literal would type the column DECIMAL
    val bestT = grid.zipWithIndex.map { case (t, i) =>
      s"WHEN s$i / n = bn THEN CAST($t AS DOUBLE)"
    }.mkString("CASE ", " ", " END")
    val ref = grid.indexOf(1.0)
    "WITH d AS (SELECT CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS y, " +
      "CASE WHEN doc_id % 3 = 0 THEN 0.9 ELSE 0.1 END + " +
      "(CAST(doc_id * 17 % 100 AS DOUBLE) - 50.0) / 1000.0 AS score " +
      "FROM documents), " +
      "z AS (SELECT y, ln(least(0.999999, greatest(0.000001, score)) / " +
      "(1.0 - least(0.999999, greatest(0.000001, score)))) AS z FROM d), " +
      s"a AS (SELECT CAST(count(*) AS BIGINT) AS n, $nlls FROM z), " +
      s"b AS (SELECT *, $least AS bn FROM a) " +
      s"SELECT n, $bestT AS best_t, " +
      s"round(s$ref / n, 6) AS nll_uncalibrated, " +
      "round(bn, 6) AS nll_calibrated, " +
      s"round(s$ref / n - bn, 6) AS nll_reduction FROM b"
  }

  /** q218's 6-hex-digit uniform as reusable SQL: digits of `h` parsed by
    * ascii code into the scaled polynomial, identical in any engine.
    */
  private def hexPoly(h: String): String =
    (1 to 6).map { i =>
      val a = s"ascii(substr($h, $i, 1))"
      s"(CASE WHEN $a >= 97 THEN $a - 87 ELSE $a - 48 END) * " +
        s"${math.pow(16.0, 6 - i)}"
    }.mkString(" + ")

  /** Unrolled synchronous label propagation over the q141 derived graph —
    * one (count, arg-max) CTE pair per round mirroring
    * `Graphs.labelPropagation` exactly: symmetrized deduped edges,
    * init label = node id, adopt by (neighbour-label count desc, label).
    */
  private def labelPropSql(iters: Int): String = {
    val head =
      "WITH mn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), " +
      "e0 AS (SELECT doc_id AS src, (doc_id + 1) % mn.n AS dst " +
      "FROM documents, mn " +
      "UNION ALL SELECT doc_id, (doc_id + 7) % mn.n FROM documents, mn " +
      "WHERE doc_id % 2 = 0 " +
      "UNION ALL SELECT doc_id, (doc_id + 101) % mn.n FROM documents, mn " +
      "WHERE doc_id % 3 = 0), " +
      "und AS (SELECT DISTINCT src, dst FROM (" +
      "SELECT src, dst FROM e0 WHERE src <> dst " +
      "UNION ALL SELECT dst, src FROM e0 WHERE src <> dst)), " +
      "l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM und)"
    val rounds = (1 to iters).map { k =>
      s"c$k AS (SELECT u.src, l.lbl, count(*) AS c FROM und u " +
        s"JOIN l${k - 1} l ON u.dst = l.node GROUP BY 1, 2), " +
        s"l$k AS (SELECT src AS node, lbl FROM (SELECT src, lbl, " +
        "row_number() OVER (PARTITION BY src ORDER BY c DESC, lbl) AS rn " +
        s"FROM c$k) WHERE rn = 1)"
    }.mkString(", ", ", ", "")
    head + rounds +
      s" SELECT node, CAST(lbl AS BIGINT) AS community FROM l$iters " +
      "ORDER BY node"
  }

  /** BM25 top-10 for the shared ('spark','join','window') query — the
    * q139 recipe, also the q162 oracle: search over the materialized
    * inverted index must equal search over the corpus row for row.
    */
  private val bm25TopSql: String =
    "WITH base AS (SELECT doc_id, CAST(len(list_filter(" +
      "string_split(text, ' '), x -> len(x) > 0)) AS DOUBLE) AS dl " +
      "FROM documents), " +
      "stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base), " +
      "terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term " +
      "FROM documents), " +
      "tf AS (SELECT doc_id, term, count(*) AS tf FROM terms " +
      "WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2), " +
      "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
      "c AS (SELECT tf.doc_id, round(" +
      "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2 / " +
      "(tf + 1.2 * (0.25 + 0.75 * b.dl / avgdl)), 6) AS c " +
      "FROM tf JOIN df USING (term) JOIN base b ON tf.doc_id = b.doc_id " +
      "CROSS JOIN stats) " +
      "SELECT doc_id, round(sum(c), 4) AS score, " +
      "count(*) AS n_terms_matched FROM c GROUP BY 1 " +
      "ORDER BY score DESC, doc_id LIMIT 10"

  /** Shingle-convention tokens of a string expression — trim → lower →
    * whitespace split → drop empties, exactly `Text.shingles`' tokenizer
    * (the q256 recipe plus the empty-string guard splitWs applies).
    */
  private def shingleToks(expr: String): String =
    s"list_filter(string_split_regex(lower(trim($expr)), '\\s+'), " +
      "x -> len(x) > 0)"

  /** The q324/q325/q327 pair derivation: cand = raw text, ref = text
    * minus its last two tokens (the Spark gates' slice recipe).
    */
  private val pairCtes: String =
    "WITH tkn AS (SELECT doc_id, text, list_filter(string_split(text, " +
      "' '), x -> len(x) > 0) AS t FROM documents), " +
      "pr AS (SELECT doc_id, text AS cand, " +
      "array_to_string(list_slice(t, 1, greatest(len(t) - 2, 0)), ' ') " +
      "AS ref FROM tkn)"

  private def evalPairHead(ns: Seq[Int]): String = {
    val head = pairCtes +
      s", base AS (SELECT doc_id, ${shingleToks("cand")} AS ct, " +
        s"${shingleToks("ref")} AS rt FROM pr), " +
        "lens AS (SELECT doc_id, CAST(len(ct) AS BIGINT) AS cand_len, " +
        "CAST(len(rt) AS BIGINT) AS ref_len FROM base)"
    val perN = ns.map { n =>
      def grams(src: String) =
        s"[array_to_string($src[i:i+${n - 1}], ' ') " +
          s"for i in range(1, len($src) - ${n - 1} + 1)]"
      s"cg$n AS (SELECT doc_id, unnest(${grams("ct")}) AS g FROM base), " +
        s"cc$n AS (SELECT doc_id, g, count(*) AS cc FROM cg$n " +
        "GROUP BY 1, 2), " +
        s"rg$n AS (SELECT doc_id, unnest(${grams("rt")}) AS g FROM base), " +
        s"rc$n AS (SELECT doc_id, g, count(*) AS rc FROM rg$n " +
        "GROUP BY 1, 2), " +
        s"a$n AS (SELECT doc_id, " +
        "sum(least(coalesce(cc, 0), coalesce(rc, 0))) AS clip, " +
        "sum(coalesce(cc, 0)) AS ctot, sum(coalesce(rc, 0)) AS rtot " +
        s"FROM cc$n FULL JOIN rc$n USING (doc_id, g) GROUP BY 1)"
    }.mkString(", ", ", ", "")
    head + perN
  }

  /** Segment BLEU: modified precisions p1..pmaxN from the clipped
    * overlaps, BP on the shingle token lengths, geometric mean in log
    * space — op order mirrors `Quality.bleu`.
    */
  private def bleuSql(maxN: Int): String = {
    val ps = (1 to maxN).map { n =>
      s"CASE WHEN coalesce(a$n.ctot, 0) > 0 THEN " +
        s"CAST(coalesce(a$n.clip, 0) AS DOUBLE) / a$n.ctot END AS p$n"
    }.mkString(", ")
    val joins = (1 to maxN)
      .map(n => s"LEFT JOIN a$n ON lens.doc_id = a$n.doc_id").mkString(" ")
    val allPos = (1 to maxN).map(n => s"p$n > 0").mkString(" AND ")
    val logSum = (1 to maxN).map(n => s"ln(p$n)").mkString(" + ")
    evalPairHead(1 to maxN) +
      s", ff AS (SELECT lens.doc_id, cand_len, ref_len, $ps " +
      s"FROM lens $joins), " +
      "gg AS (SELECT *, CASE WHEN cand_len >= ref_len THEN 1.0 " +
      "WHEN cand_len > 0 THEN exp(1.0 - CAST(ref_len AS DOUBLE) / " +
      "cand_len) ELSE 0.0 END AS bp FROM ff), " +
      s"hh AS (SELECT *, CASE WHEN $allPos THEN " +
      s"bp * exp(($logSum) / $maxN) ELSE 0.0 END AS bleu FROM gg) " +
      "SELECT doc_id, cand_len, ref_len, " +
      (1 to maxN).map(n => s"round(p$n, 6) AS p$n").mkString(", ") +
      ", round(bp, 6) AS bp, round(bleu, 6) AS bleu FROM hh " +
      "ORDER BY doc_id"
  }

  /** ROUGE-N recall: the same clipped overlap over the REFERENCE total. */
  private def rougeSql(n: Int): String =
    evalPairHead(Seq(n)) +
      s" SELECT lens.doc_id, " +
      s"CAST(coalesce(a$n.clip, 0) AS BIGINT) AS n_overlap, " +
      s"CAST(coalesce(a$n.rtot, 0) AS BIGINT) AS n_ref, " +
      s"round(CASE WHEN coalesce(a$n.rtot, 0) > 0 THEN " +
      s"CAST(coalesce(a$n.clip, 0) AS DOUBLE) / a$n.rtot END, 6) " +
      s"AS recall FROM lens LEFT JOIN a$n ON lens.doc_id = a$n.doc_id " +
      "ORDER BY lens.doc_id"

  /** chrF: char n-gram clipped overlaps over whitespace-stripped
    * lowercased text, macro-averaged P/R over orders with grams, F_β —
    * op order mirrors `Quality.chrF` (β = 2 literals 5.0/4.0).
    */
  private def chrfSql(maxN: Int): String = {
    val head = pairCtes +
      ", base AS (SELECT doc_id, " +
      "regexp_replace(lower(trim(cand)), '\\s+', '', 'g') AS ct, " +
      "regexp_replace(lower(trim(ref)), '\\s+', '', 'g') AS rt FROM pr)"
    val perN = (1 to maxN).map { n =>
      def grams(src: String) =
        s"[substr($src, i, $n) for i in range(1, len($src) - $n + 2)]"
      s"cg$n AS (SELECT doc_id, unnest(${grams("ct")}) AS g FROM base), " +
        s"cc$n AS (SELECT doc_id, g, count(*) AS cc FROM cg$n " +
        "GROUP BY 1, 2), " +
        s"rg$n AS (SELECT doc_id, unnest(${grams("rt")}) AS g FROM base), " +
        s"rc$n AS (SELECT doc_id, g, count(*) AS rc FROM rg$n " +
        "GROUP BY 1, 2), " +
        s"a$n AS (SELECT doc_id, " +
        "sum(least(coalesce(cc, 0), coalesce(rc, 0))) AS clip, " +
        "sum(coalesce(cc, 0)) AS ctot, sum(coalesce(rc, 0)) AS rtot " +
        s"FROM cc$n FULL JOIN rc$n USING (doc_id, g) GROUP BY 1)"
    }.mkString(", ", ", ", "")
    def avgOver(tot: String): String = {
      val num = (1 to maxN).map { n =>
        s"CASE WHEN coalesce(a$n.$tot, 0) > 0 THEN " +
          s"CAST(coalesce(a$n.clip, 0) AS DOUBLE) / a$n.$tot " +
          "ELSE 0.0 END"
      }.mkString(" + ")
      val den = (1 to maxN).map { n =>
        s"CASE WHEN coalesce(a$n.$tot, 0) > 0 THEN 1.0 ELSE 0.0 END"
      }.mkString(" + ")
      s"CASE WHEN ($den) > 0 THEN ($num) / ($den) ELSE 0.0 END"
    }
    val joins = (1 to maxN)
      .map(n => s"LEFT JOIN a$n ON base.doc_id = a$n.doc_id").mkString(" ")
    head + perN +
      s", f AS (SELECT base.doc_id, ${avgOver("ctot")} AS chr_p, " +
      s"${avgOver("rtot")} AS chr_r FROM base $joins), " +
      "g AS (SELECT *, CASE WHEN chr_p + chr_r > 0 THEN " +
      "5.0 * chr_p * chr_r / (4.0 * chr_p + chr_r) ELSE 0.0 END " +
      "AS chrf FROM f) " +
      "SELECT doc_id, round(chr_p, 6) AS chr_p, " +
      "round(chr_r, 6) AS chr_r, round(chrf, 6) AS chrf FROM g " +
      "ORDER BY doc_id"
  }

  /** Unrolled synchronous k-core peeling over the q160 planted-core graph
    * (ring + ids < 40 chorded to +2/+3/+4 mod 40) — one (keep, filter)
    * CTE pair per round mirroring `Graphs.kCore`; rounds past
    * convergence peel nothing, so a fixed unroll replays an until-stable
    * run exactly.
    */
  private def kCoreSql(k: Int, rounds: Int): String = {
    val head =
      "WITH mn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), " +
      "e0 AS (SELECT doc_id AS src, (doc_id + 1) % mn.n AS dst " +
      "FROM documents, mn " +
      "UNION ALL SELECT doc_id, (doc_id + j) % 40 " +
      "FROM documents, (VALUES (2), (3), (4)) v(j) WHERE doc_id < 40), " +
      "u0 AS (SELECT DISTINCT src, dst FROM (" +
      "SELECT src, dst FROM e0 WHERE src <> dst " +
      "UNION ALL SELECT dst, src FROM e0 WHERE src <> dst))"
    val peels = (1 to rounds).map { r =>
      s"k$r AS (SELECT src FROM u${r - 1} GROUP BY src " +
        s"HAVING count(*) >= $k), " +
        s"u$r AS (SELECT src, dst FROM u${r - 1} " +
        s"WHERE src IN (SELECT src FROM k$r) " +
        s"AND dst IN (SELECT src FROM k$r))"
    }.mkString(", ", ", ", "")
    head + peels +
      s" SELECT src AS node, CAST(count(*) AS BIGINT) AS core_degree " +
      s"FROM u$rounds GROUP BY src HAVING count(*) >= $k ORDER BY node"
  }

  /** Unrolled batch gradient descent for the q142 logistic regression —
    * one CTE per round mirroring `Classify.trainLogistic`'s float recipe:
    * zero init, margin as the left-assoc 4-term dot product, update
    * `w − 1.0·avg((σ(w·x) − y)·x)`; `max(w)` reads the constant weight row
    * without a GROUP BY.
    */
  private def logRegSql(iters: Int): String = {
    val ntok =
      "greatest(len(list_filter(string_split(text, ' '), x -> len(x) > 0)), 1)"
    val uniq =
      "len(list_distinct(list_filter(string_split(text, ' '), x -> len(x) > 0)))"
    val dot = "(w0 * f0 + w1 * f1 + w2 * f2 + w3 * f3)"
    val sig = s"1.0 / (1.0 + exp(-$dot))"
    val head =
      "WITH f AS (SELECT doc_id, 1.0 AS f0, " +
      s"CAST($ntok AS DOUBLE) / 100.0 AS f1, " +
      s"CAST(length(text) AS DOUBLE) / (CAST($ntok AS DOUBLE) * 10.0) AS f2, " +
      s"CAST($uniq AS DOUBLE) / CAST($ntok AS DOUBLE) AS f3, " +
      "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y FROM documents), " +
      "w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"
    val rounds = (1 to iters).map { k =>
      val upd = (0 to 3).map(j =>
        s"max(w$j) - 1.0 * avg(($sig - y) * f$j) AS w$j").mkString(", ")
      s"w$k AS (SELECT $upd FROM f, w${k - 1})"
    }.mkString(", ", ", ", "")
    head + rounds +
      s" SELECT doc_id, round($sig, 6) AS p, y FROM f, w$iters ORDER BY doc_id"
  }

  val sql: ListMap[String, String] = ListMap(
    "q01_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",

    "q02_conform_rename_cast" ->
      ("SELECT CAST(l_orderkey AS VARCHAR) AS okey, CAST(l_linenumber AS BIGINT) AS ln, " +
        "l_returnflag AS rflag FROM lineitem"),

    "q03_filter_predicates" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem " +
        "WHERE l_returnflag = 'R' AND l_quantity BETWEEN 10 AND 20 " +
        "AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'"),

    "q04_case_bucket_tod" ->
      (s"SELECT $tod AS tod, count(*) AS n, round(sum(value), 2) AS total_value " +
        "FROM events GROUP BY 1"),

    "q05_agg_returnflag" ->
      ("SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, " +
        "round(avg(l_extendedprice), 4) AS avg_price, " +
        "min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price, " +
        "count(*) AS n FROM lineitem GROUP BY 1"),

    "q06_agg_multikey" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n, " +
        "round(sum(l_extendedprice), 2) AS revenue FROM lineitem GROUP BY 1, 2"),

    "q07_global_minmax" ->
      ("SELECT min(o_orderdate) AS dmin, max(o_orderdate) AS dmax, " +
        "min(o_totalprice) AS pmin, max(o_totalprice) AS pmax, count(*) AS n " +
        "FROM orders"),

    "q08_join_orders_customer" ->
      ("SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total_price " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1"),

    "q09_join_filtered_dim" ->
      ("SELECT c_nationkey, count(*) AS n, round(avg(o_totalprice), 2) AS avg_price " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' GROUP BY 1"),

    "q10_join_fanout" ->
      ("SELECT a.o_custkey AS o_custkey, count(*) AS n_pairs, " +
        "round(sum(b.o_totalprice), 2) AS fan_total " +
        "FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey GROUP BY 1"),

    "q11_star_join" ->
      ("SELECT r_name, count(*) AS n, " +
        "round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY 1"),

    "q12_topk_suppliers" ->
      ("SELECT l_suppkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue " +
        "FROM lineitem GROUP BY 1 ORDER BY revenue DESC, l_suppkey LIMIT 10"),

    "q13_sort_limit" ->
      ("SELECT event_id, CAST(date_trunc('minute', ts) AS TIMESTAMP) AS ts_min, value " +
        "FROM events ORDER BY ts, event_id LIMIT 100"),

    "q14_date_spine" ->
      ("WITH mm AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo, " +
        "CAST(max(o_orderdate) AS DATE) AS hi FROM orders), " +
        "d AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), " +
        "CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS date_id FROM mm) " +
        "SELECT date_id, CAST(month(date_id) AS BIGINT) AS month, " +
        "CAST(quarter(date_id) AS BIGINT) AS quarter, " +
        "CAST(year(date_id) AS BIGINT) AS year FROM d"),

    "q15_dow_hour" ->
      ("SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, " +
        "CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n FROM events GROUP BY 1, 2"),

    "q16_datediff_monthly" ->
      ("SELECT CAST(month(o_orderdate) AS BIGINT) AS m, " +
        "round(avg(date_diff('day', CAST(o_orderdate AS DATE), " +
        "CAST(l_shipdate AS DATE))), 4) AS avg_delay, count(*) AS n " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1"),

    "q17_year_quarter" ->
      ("SELECT CAST(year(o_orderdate) AS BIGINT) AS y, " +
        "CAST(quarter(o_orderdate) AS BIGINT) AS q, count(*) AS n, " +
        "round(sum(o_totalprice), 2) AS total FROM orders GROUP BY 1, 2"),

    "q18_rollup" ->
      ("WITH o AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y, " +
        "CAST(quarter(o_orderdate) AS BIGINT) AS q, o_totalprice FROM orders) " +
        "SELECT y, q, count(*) AS n, round(sum(o_totalprice), 2) AS total " +
        "FROM o GROUP BY ROLLUP(y, q)"),

    "q19_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q20_union" ->
      "SELECT r_name AS name FROM region UNION SELECT n_name AS name FROM nation",

    "q21_semi_join" ->
      ("SELECT c_custkey FROM customer c " +
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"),

    "q22_anti_join" ->
      ("SELECT c_custkey FROM customer c " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"),

    "q23_window_rank" ->
      ("WITH rev AS (SELECT l_returnflag, l_suppkey, " +
        "round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue " +
        "FROM lineitem GROUP BY 1, 2), " +
        "r AS (SELECT l_returnflag, l_suppkey, revenue, row_number() OVER " +
        "(PARTITION BY l_returnflag ORDER BY revenue DESC, l_suppkey) AS rnk FROM rev) " +
        "SELECT l_returnflag, l_suppkey, revenue, CAST(rnk AS BIGINT) AS \"rank\" " +
        "FROM r WHERE rnk <= 3"),

    "q24_window_running_sum" ->
      ("SELECT o_custkey, o_orderkey, round(sum(o_totalprice) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running " +
        "FROM orders"),

    "q25_having" ->
      "SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1 HAVING count(*) >= 2",

    "q26_conditional_agg" ->
      ("SELECT l_returnflag, " +
        "CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc, " +
        "CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big " +
        "FROM lineitem GROUP BY 1"),

    "q27_sql_entry" ->
      ("SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total " +
        "FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority"),

    "q28_count_distinct" ->
      ("SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_parts, " +
        "count(DISTINCT l_suppkey) AS nd_supp FROM lineitem GROUP BY 1"),

    "q29_cube" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n, " +
        "round(sum(l_quantity), 2) AS qty FROM lineitem " +
        "GROUP BY CUBE(l_returnflag, l_linestatus)"),

    "q30_dedup_exact" ->
      "SELECT min(doc_id) AS doc_id, count(*) AS n_dups FROM documents GROUP BY text",

    "q31_dedup_normalized" ->
      ("SELECT min(doc_id) AS doc_id, count(*) AS n_dups FROM documents " +
        "GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"),

    "q32_text_quality" ->
      ("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_txt, " +
        "CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct, " +
        "CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit, " +
        "CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper, " +
        "round(CASE WHEN length(trim(text)) = 0 THEN 0.0 " +
        "WHEN len(string_split_regex(trim(text), '\\s+')) = 0 THEN 0.0 " +
        "ELSE CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) " +
        "/ len(string_split_regex(trim(text), '\\s+')) END, 4) AS mean_wlen " +
        "FROM documents"),

    "q33_token_counts" ->
      ("SELECT doc_id, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(text), '\\s+')) " +
        "+ CAST(floor(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) / 4) AS BIGINT) " +
        "END AS BIGINT) AS n_subwords FROM documents"),

    "q34_fingerprint_md5" ->
      "SELECT doc_id, md5(text) AS fp FROM documents",

    "q35_lang_id" ->
      ("WITH s AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks " +
        "FROM documents), " +
        "sc AS (SELECT doc_id, " +
        "len(list_filter(toks, t -> t IN ('the','and','of','to','in','is','that','for','with'))) AS s_en, " +
        "len(list_filter(toks, t -> t IN ('der','die','und','das','ist','nicht','ein','mit','für'))) AS s_de, " +
        "len(list_filter(toks, t -> t IN ('le','la','et','les','des','est','pas','pour','que'))) AS s_fr, " +
        "len(list_filter(toks, t -> t IN ('el','la','que','de','los','es','por','con','para'))) AS s_es " +
        "FROM s) " +
        "SELECT doc_id, CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und' " +
        "WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en' " +
        "WHEN s_de >= s_fr AND s_de >= s_es THEN 'de' " +
        "WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS lang_pred FROM sc"),

    // Exact MinHash truth: DuckDB recomputes the MD5 minhash signature
    // (coordinate i = lexicographic min of md5(i || ':' || shingle) hex
    // over the distinct shingle set — fixed-width lowercase hex, so string
    // min == numeric min in both engines), then takes exact all-pairs with
    // the banding predicate "some 4-wide band agrees". The Spark side is
    // the band-BUCKETED candidate path — hash equality proves both the
    // signature and that bucketing emits exactly the agreeing-band pairs.
    "q36b_minhash_exact" ->
      ("WITH toks AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents " +
        "WHERE doc_id % 3 = 0), " +
        "sh2 AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') " +
        "for i in range(1, len(t) - 1)]) AS s FROM toks WHERE len(t) >= 3), " +
        "sg AS (SELECT doc_id, [list_min(list_transform(s, " +
        "x -> md5(CAST(i AS VARCHAR) || ':' || x))) for i in range(0, 16)] AS g FROM sh2) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sg a JOIN sg b " +
        "ON a.doc_id < b.doc_id " +
        "WHERE a.g[1:4] = b.g[1:4] OR a.g[5:8] = b.g[5:8] " +
        "OR a.g[9:12] = b.g[9:12] OR a.g[13:16] = b.g[13:16]"),

    // Exact SimHash truth: DuckDB recomputes the MD5-token-hash simhash
    // signature nibble-for-nibble (tokens → 2-shingles → per-bit ±1 votes
    // over the first 16 md5 hex chars → sign), then takes exact all-pairs
    // Hamming ≤ 3. The Spark side is the block-BUCKETED candidate path
    // post-filtered to ≤ 3 — hash equality proves both the signature and
    // the pigeonhole recall of the bucketing.
    "q37b_simhash_exact" ->
      ("WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents WHERE (CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(text), '\\s+')) END) >= 2), " +
        "sh AS (SELECT doc_id, list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS s FROM tk), " +
        "nb AS (SELECT doc_id, list_transform(s, x -> list_transform(range(1, 17), " +
        "k -> strpos('0123456789abcdef', substr(md5(x), CAST(k AS INTEGER), 1)) - 1)) AS h FROM sh), " +
        "sg AS (SELECT doc_id, list_transform(range(0, 64), b -> CASE WHEN " +
        "list_sum(list_transform(h, v -> CASE WHEN ((v[CAST(16 - b // 4 AS INTEGER)] >> (b % 4)) & 1) = 1 " +
        "THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END) AS g FROM nb), " +
        "hp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(list_sum(list_transform(range(1, 65), i -> CASE WHEN a.g[CAST(i AS INTEGER)] <> b.g[CAST(i AS INTEGER)] THEN 1 ELSE 0 END)) AS BIGINT) AS hamming " +
        "FROM sg a JOIN sg b ON a.doc_id < b.doc_id) " +
        "SELECT id_a, id_b, hamming FROM hp WHERE hamming <= 3"),

    // Exact all-pairs truth: q38's LSH→verify output hash-matching this is
    // a 100%-recall gate on the candidate generation (any banding bug that
    // drops a >=0.5-Jaccard pair fails the compare).
    "q38_jaccard_dups" ->
      (s"WITH $exactPairCtes " +
        "SELECT id_a, id_b, round(j, 4) AS jaccard FROM jp WHERE j >= 0.5"),

    // Exact connected components over exact-Jaccard pairs via recursive
    // CTE — survivors are docs from which no smaller doc is reachable.
    "q77_transitive_dedup" ->
      (s"WITH RECURSIVE $exactPairCtes, " +
        "p AS (SELECT id_a, id_b FROM jp WHERE j >= 0.5), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM p " +
        "UNION ALL SELECT id_b, id_a FROM p), " +
        "reach AS (SELECT a AS src, b AS dst FROM edges " +
        "UNION SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a) " +
        "SELECT doc_id FROM documents WHERE doc_id NOT IN " +
        "(SELECT src FROM reach GROUP BY src HAVING min(dst) < src)"),

    // annotate → filter → exact-normalized dedup → select: the full q45b
    // pipeline composition in SQL.
    "q45b_corpus_pipeline_exact" ->
      (s"WITH $langScoreCtes, " +
        "ann AS (SELECT d.doc_id, d.text, " +
        "CAST(CASE WHEN length(trim(d.text)) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(d.text), '\\s+')) END AS BIGINT) AS n_tokens, " +
        s"$qualitySql AS quality, " +
        s"$langCase AS lang_pred, " +
        "regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g') AS norm " +
        "FROM documents d JOIN lsc ON d.doc_id = lsc.doc_id), " +
        "f AS (SELECT * FROM ann WHERE n_tokens >= 5 AND quality >= 0.05 " +
        "AND lang_pred IN ('en')), " +
        "k AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY norm) " +
        "SELECT doc_id, lang_pred, n_tokens, round(quality, 4) AS quality " +
        "FROM f WHERE doc_id IN (SELECT doc_id FROM k)"),

    // Read-only z-order cell statistics: range-quarter buckets from global
    // min/max scalars, Morton interleave (bit i of col c -> position
    // i*ncols + c; for 2 cols x 2 bits: (bp&1) + (bp&2)*2 + (be&1)*2 +
    // (be&2)*4), per-cell counts and extents.
    "q66_zorder_stats" ->
      ("WITH mm AS (SELECT min(l_partkey) AS pk_lo, max(l_partkey) AS pk_hi, " +
        "min(l_extendedprice) AS pr_lo, max(l_extendedprice) AS pr_hi FROM lineitem), " +
        "b AS (SELECT l_partkey, l_extendedprice, " +
        "((CASE WHEN CAST(l_partkey AS DOUBLE) > CAST(pk_lo AS DOUBLE) + 1 * ((CAST(pk_hi AS DOUBLE) - CAST(pk_lo AS DOUBLE)) / 4.0) THEN 1 ELSE 0 END) + " +
        "(CASE WHEN CAST(l_partkey AS DOUBLE) > CAST(pk_lo AS DOUBLE) + 2 * ((CAST(pk_hi AS DOUBLE) - CAST(pk_lo AS DOUBLE)) / 4.0) THEN 1 ELSE 0 END) + " +
        "(CASE WHEN CAST(l_partkey AS DOUBLE) > CAST(pk_lo AS DOUBLE) + 3 * ((CAST(pk_hi AS DOUBLE) - CAST(pk_lo AS DOUBLE)) / 4.0) THEN 1 ELSE 0 END)) AS bp, " +
        "((CASE WHEN l_extendedprice > pr_lo + 1 * ((pr_hi - pr_lo) / 4.0) THEN 1 ELSE 0 END) + " +
        "(CASE WHEN l_extendedprice > pr_lo + 2 * ((pr_hi - pr_lo) / 4.0) THEN 1 ELSE 0 END) + " +
        "(CASE WHEN l_extendedprice > pr_lo + 3 * ((pr_hi - pr_lo) / 4.0) THEN 1 ELSE 0 END)) AS be " +
        "FROM lineitem CROSS JOIN mm) " +
        "SELECT CAST((bp & 1) + (bp & 2) * 2 + (be & 1) * 2 + (be & 2) * 4 AS BIGINT) AS zcell, " +
        "count(*) AS n, min(l_partkey) AS pk_min, max(l_partkey) AS pk_max, " +
        "min(l_extendedprice) AS price_min, max(l_extendedprice) AS price_max " +
        "FROM b GROUP BY 1"),

    "q39_embedding_topk" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings " +
        "WHERE vec_id <= 20), " +
        "c AS (SELECT vec_id AS nbr_id, embedding AS cv FROM embeddings), " +
        "s AS (SELECT query_id, nbr_id, " +
        "list_sum(list_transform(list_zip(qv, cv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / " +
        "(sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
        "sqrt(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos " +
        "FROM q, c WHERE query_id <> nbr_id), " +
        "r AS (SELECT query_id, nbr_id, cos, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rnk FROM s) " +
        "SELECT query_id, nbr_id, CAST(rnk AS BIGINT) AS \"rank\", " +
        "round(cos, 6) AS cos_r FROM r WHERE rnk <= 3"),

    // identical SQL to q39: nprobe = numCells makes IVF exactly brute force
    "q39d_ivf_topk" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings " +
        "WHERE vec_id <= 20), " +
        "c AS (SELECT vec_id AS nbr_id, embedding AS cv FROM embeddings), " +
        "s AS (SELECT query_id, nbr_id, " +
        "list_sum(list_transform(list_zip(qv, cv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / " +
        "(sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
        "sqrt(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos " +
        "FROM q, c WHERE query_id <> nbr_id), " +
        "r AS (SELECT query_id, nbr_id, cos, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rnk FROM s) " +
        "SELECT query_id, nbr_id, CAST(rnk AS BIGINT) AS \"rank\", " +
        "round(cos, 6) AS cos_r FROM r WHERE rnk <= 3"),

    // identical SQL to q39: an exhaustive refine pool makes PQ+re-rank
    // exactly brute force (the approximate stage only ORDERS candidates)
    "q95_pq_topk" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings " +
        "WHERE vec_id <= 20), " +
        "c AS (SELECT vec_id AS nbr_id, embedding AS cv FROM embeddings), " +
        "s AS (SELECT query_id, nbr_id, " +
        "list_sum(list_transform(list_zip(qv, cv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / " +
        "(sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
        "sqrt(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos " +
        "FROM q, c WHERE query_id <> nbr_id), " +
        "r AS (SELECT query_id, nbr_id, cos, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rnk FROM s) " +
        "SELECT query_id, nbr_id, CAST(rnk AS BIGINT) AS \"rank\", " +
        "round(cos, 6) AS cos_r FROM r WHERE rnk <= 3"),

    // identical SQL to q39: all cells probed + exhaustive refine ≡ brute force
    "q96_ivfpq_topk" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings " +
        "WHERE vec_id <= 20), " +
        "c AS (SELECT vec_id AS nbr_id, embedding AS cv FROM embeddings), " +
        "s AS (SELECT query_id, nbr_id, " +
        "list_sum(list_transform(list_zip(qv, cv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / " +
        "(sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
        "sqrt(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos " +
        "FROM q, c WHERE query_id <> nbr_id), " +
        "r AS (SELECT query_id, nbr_id, cos, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rnk FROM s) " +
        "SELECT query_id, nbr_id, CAST(rnk AS BIGINT) AS \"rank\", " +
        "round(cos, 6) AS cos_r FROM r WHERE rnk <= 3"),

    "q39b_embedding_norms" ->
      ("SELECT vec_id, round(sqrt(list_sum(list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm FROM embeddings"),

    "q40_events_hourly" ->
      ("SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type, " +
        "count(*) AS n, round(sum(value), 2) AS total_value FROM events GROUP BY 1, 2"),

    "q97_resample_ffill" ->
      ("WITH b AS (SELECT user_id, " +
        "CAST(floor(epoch(ts)) AS BIGINT) // 300 * 300 AS bin_sec, " +
        "count(*) AS n, avg(value) AS v FROM events GROUP BY 1, 2), " +
        "e AS (SELECT user_id, min(bin_sec) AS lo, max(bin_sec) AS hi " +
        "FROM b GROUP BY 1), " +
        "s AS (SELECT user_id, unnest(range(lo, hi + 300, 300)) AS bin_sec FROM e), " +
        "j AS (SELECT s.user_id, s.bin_sec, coalesce(b.n, 0) AS n, b.v " +
        "FROM s LEFT JOIN b ON s.user_id = b.user_id AND s.bin_sec = b.bin_sec) " +
        "SELECT user_id, bin_sec, n, round(v, 6) AS v_r, " +
        "round(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id " +
        "ORDER BY bin_sec ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) " +
        "AS v_ffill_r FROM j"),

    // seed-anchored semantic clusters: nearest of the first-8 embeddings by
    // L2, accumulation in double and array order exactly like NearestCells;
    // (dist, cell) tie order matches the expression's stable argsort
    "q98_semantic_clusters" ->
      ("WITH seeds AS (SELECT CAST(vec_id AS INTEGER) AS cell, " +
        "embedding AS cv FROM embeddings WHERE vec_id <= 8), " +
        "d AS (SELECT e.vec_id, s.cell, " +
        "sqrt(list_sum(list_transform(list_zip(e.embedding, s.cv), " +
        "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
        "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))) AS dist " +
        "FROM embeddings e CROSS JOIN seeds s), " +
        "a AS (SELECT vec_id, cell, dist, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM d) " +
        "SELECT cell, count(*) AS n, round(min(dist), 6) AS min_dist, " +
        "round(max(dist), 6) AS max_dist, round(avg(dist), 4) AS avg_dist_r " +
        "FROM a WHERE rn = 1 GROUP BY cell"),

    "q99_vocab_topn" ->
      ("WITH t AS (SELECT unnest(string_split(text, ' ')) AS token " +
        "FROM documents), " +
        "c AS (SELECT token, count(*) AS n FROM t WHERE length(token) > 0 " +
        "GROUP BY 1) " +
        "SELECT token, n FROM c ORDER BY n DESC, token LIMIT 100"),

    // balanced downsample: per-source cap in md5-of-key order — the same
    // proven cross-engine recipe as q85's stratified sample
    "q100_balance_sources" ->
      ("WITH r AS (SELECT source, n_chars, row_number() OVER " +
        "(PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) " +
        "AS rn FROM documents) " +
        "SELECT source, count(*) AS n_kept, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM r WHERE rn <= 80 GROUP BY 1"),

    // snapshot diff: Spark classifies via one xxhash64 of the value tuple;
    // the oracle compares columns directly (IS NOT DISTINCT FROM) — the
    // hash shortcut must reach identical classifications
    "q101_snapshot_diff" ->
      ("WITH b AS (SELECT * FROM documents WHERE doc_id % 3 <> 0), " +
        "a AS (SELECT doc_id, text, CASE WHEN doc_id % 7 = 0 THEN 'xx' " +
        "ELSE lang END AS lang, source, n_chars FROM documents " +
        "WHERE doc_id % 2 <> 0) " +
        "SELECT coalesce(b.doc_id, a.doc_id) AS doc_id, " +
        "CASE WHEN b.doc_id IS NULL THEN 'added' " +
        "WHEN a.doc_id IS NULL THEN 'removed' " +
        "WHEN b.text IS NOT DISTINCT FROM a.text " +
        "AND b.lang IS NOT DISTINCT FROM a.lang " +
        "AND b.source IS NOT DISTINCT FROM a.source " +
        "AND b.n_chars IS NOT DISTINCT FROM a.n_chars THEN 'unchanged' " +
        "ELSE 'changed' END AS change " +
        "FROM b FULL OUTER JOIN a ON b.doc_id = a.doc_id"),

    // contrastive negatives: identical modulo arithmetic both engines, then
    // the shared exact-cosine recipe; (id+1+mix mod (n-1)) mod n is
    // self-exclusion by construction
    "q104_negative_pairs" ->
      ("WITH n AS (SELECT count(*) AS n FROM embeddings), " +
        "a AS (SELECT vec_id AS anchor_id, embedding AS av FROM embeddings " +
        "WHERE vec_id <= 20), " +
        "s AS (SELECT anchor_id, av, CAST(unnest(range(1, 6)) AS BIGINT) " +
        "AS slot FROM a), " +
        "p AS (SELECT anchor_id, slot, av, " +
        "(anchor_id + 1 + (anchor_id * 2654435761 + slot * 40503) % (n.n - 1)) " +
        "% n.n AS neg_id FROM s CROSS JOIN n) " +
        "SELECT p.anchor_id, p.slot, p.neg_id, " +
        s"round(${cosSql("p.av", "e.embedding")}, 6) AS cos_r " +
        "FROM p JOIN embeddings e ON e.vec_id = p.neg_id"),

    // hard negatives: the q39 brute-force recipe, taking the rank band
    // (m, m+k] instead of the top-k
    "q105_hard_negatives" ->
      ("WITH q AS (SELECT vec_id AS anchor_id, embedding AS qv FROM embeddings " +
        "WHERE vec_id <= 20), " +
        "c AS (SELECT vec_id AS nbr_id, embedding AS cv FROM embeddings), " +
        "s AS (SELECT anchor_id, nbr_id, " +
        s"${cosSql("qv", "cv")} AS cos FROM q, c WHERE anchor_id <> nbr_id), " +
        "r AS (SELECT anchor_id, nbr_id, cos, row_number() OVER " +
        "(PARTITION BY anchor_id ORDER BY cos DESC, nbr_id) AS rnk FROM s) " +
        "SELECT anchor_id, nbr_id AS hard_neg_id, CAST(rnk AS BIGINT) AS \"rank\", " +
        "round(cos, 6) AS cos_r FROM r WHERE rnk > 3 AND rnk <= 8"),

    // per-source unigram KL vs the corpus distribution, add-one smoothing
    // over the corpus vocabulary
    "q106_unigram_kl" ->
      ("WITH t AS (SELECT source, unnest(string_split_regex(lower(trim(text)), " +
        "'\\s+')) AS tok FROM documents), " +
        "t2 AS (SELECT source, tok FROM t WHERE length(tok) > 0), " +
        "bs AS (SELECT source, tok, count(*) AS c FROM t2 GROUP BY 1, 2), " +
        "corpus AS (SELECT tok, count(*) AS cc FROM t2 GROUP BY 1), " +
        "v AS (SELECT count(*) AS v, CAST(sum(cc) AS DOUBLE) AS n FROM corpus), " +
        "st AS (SELECT source, CAST(sum(c) AS DOUBLE) AS sn FROM bs GROUP BY 1) " +
        "SELECT bs.source, round(sum((bs.c / st.sn) * " +
        "ln((bs.c / st.sn) / ((corpus.cc + 1.0) / (v.n + v.v)))), 6) AS kl " +
        "FROM bs JOIN corpus USING (tok) JOIN st ON bs.source = st.source " +
        "CROSS JOIN v GROUP BY 1"),

    // diversity sampling = q98's seed assignment composed with q100's
    // md5-order cap, per cluster
    "q107_diverse_sample" ->
      ("WITH seeds AS (SELECT CAST(vec_id AS INTEGER) AS cell, " +
        "embedding AS cv FROM embeddings WHERE vec_id <= 8), " +
        "d AS (SELECT e.vec_id, s.cell, " +
        "sqrt(list_sum(list_transform(list_zip(e.embedding, s.cv), " +
        "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
        "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))) AS dist " +
        "FROM embeddings e CROSS JOIN seeds s), " +
        "a AS (SELECT vec_id, cell, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM d), " +
        "asg AS (SELECT vec_id, cell FROM a WHERE rn = 1), " +
        "r AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY cell " +
        "ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS krn FROM asg) " +
        "SELECT cell, count(*) AS n_kept, CAST(sum(vec_id) AS BIGINT) " +
        "AS sum_ids FROM r WHERE krn <= 20 GROUP BY cell"),

    // DSIR importance weights: hashed-unigram (md5-prefix, 256 buckets)
    // add-1-smoothed log-likelihood ratio, target = src0/src1
    "q108_dsir_weights" ->
      ("WITH tk AS (SELECT doc_id, source, " +
        "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok " +
        "FROM documents WHERE length(trim(text)) > 0), " +
        "bk AS (SELECT doc_id, source, " +
        "(strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16 + " +
        "(strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS b FROM tk), " +
        "tc AS (SELECT b, count(*) AS ct FROM bk " +
        "WHERE source IN ('src0', 'src1') GROUP BY 1), " +
        "rc AS (SELECT b, count(*) AS cr FROM bk " +
        "WHERE source NOT IN ('src0', 'src1') GROUP BY 1), " +
        "tot AS (SELECT (SELECT CAST(coalesce(sum(ct), 0) AS DOUBLE) FROM tc) AS nt, " +
        "(SELECT CAST(coalesce(sum(cr), 0) AS DOUBLE) FROM rc) AS nr), " +
        "llr AS (SELECT coalesce(tc.b, rc.b) AS b, " +
        "ln((coalesce(ct, 0) + 1.0) / (nt + 256.0)) - " +
        "ln((coalesce(cr, 0) + 1.0) / (nr + 256.0)) AS llr " +
        "FROM tc FULL OUTER JOIN rc ON tc.b = rc.b CROSS JOIN tot) " +
        "SELECT bk.doc_id, round(sum(llr.llr), 4) AS weight, " +
        "CAST(count(*) AS BIGINT) AS n_toks FROM bk JOIN llr ON bk.b = llr.b " +
        "WHERE bk.source NOT IN ('src0', 'src1') GROUP BY 1 ORDER BY 1"),

    // unicode hygiene: suffix every 'a' with a combining acute (U+0301 =
    // chr(769)); NFC must re-compose, strip_accents must fold back
    "q109_unicode_norm" ->
      ("WITH d AS (SELECT doc_id, text, " +
        "replace(text, 'a', 'a' || chr(769)) AS troubled FROM documents) " +
        "SELECT doc_id, md5(nfc_normalize(troubled)) AS nfc_hash, " +
        "md5(strip_accents(troubled)) AS folded_hash, " +
        "strip_accents(troubled) = text AS refolds " +
        "FROM d ORDER BY doc_id"),

    // bigram stupid-backoff NLL vs the src0-src4 reference slice:
    // seen bigram → c2/c1(w1); unseen → 0.4·(c1(w2)+1)/(N+V)
    "q110_bigram_nll" ->
      ("WITH rt AS (SELECT string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents WHERE source IN ('src0','src1','src2','src3','src4') " +
        "AND length(trim(text)) > 0), " +
        "c1 AS (SELECT tok, count(*) AS c FROM " +
        "(SELECT unnest(t) AS tok FROM rt) GROUP BY 1), " +
        "c2 AS (SELECT bg, count(*) AS c FROM " +
        "(SELECT unnest([array_to_string(t[i:i+1], ' ') " +
        "for i in range(1, len(t))]) AS bg FROM rt WHERE len(t) >= 2) GROUP BY 1), " +
        "s AS (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS n, " +
        "CAST(count(*) AS DOUBLE) AS v FROM c1), " +
        "dt AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents WHERE length(trim(text)) > 0), " +
        "db AS (SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ') " +
        "for i in range(1, len(t))]) AS bg FROM dt WHERE len(t) >= 2) " +
        "SELECT db.doc_id, round(avg(-ln(CASE WHEN c2.c IS NOT NULL " +
        "THEN CAST(c2.c AS DOUBLE) / c1a.c " +
        "ELSE 0.4 * (coalesce(c1b.c, 0) + 1.0) / (s.n + s.v) END)), 4) AS nll_bg, " +
        "CAST(count(*) AS BIGINT) AS n_bigrams " +
        "FROM db LEFT JOIN c2 ON db.bg = c2.bg " +
        "LEFT JOIN c1 c1a ON split_part(db.bg, ' ', 1) = c1a.tok " +
        "LEFT JOIN c1 c1b ON split_part(db.bg, ' ', 2) = c1b.tok " +
        "CROSS JOIN s GROUP BY 1 ORDER BY 1"),

    // CCNet tiers: q110's NLL CTE + tertile thresholds (quantile_cont
    // interpolates over 4dp-rounded values, matching Spark percentile)
    "q126_perplexity_tiers" ->
      ("WITH rt AS (SELECT string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents WHERE source IN ('src0','src1','src2','src3','src4') " +
        "AND length(trim(text)) > 0), " +
        "c1 AS (SELECT tok, count(*) AS c FROM " +
        "(SELECT unnest(t) AS tok FROM rt) GROUP BY 1), " +
        "c2 AS (SELECT bg, count(*) AS c FROM " +
        "(SELECT unnest([array_to_string(t[i:i+1], ' ') " +
        "for i in range(1, len(t))]) AS bg FROM rt WHERE len(t) >= 2) GROUP BY 1), " +
        "s AS (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS n, " +
        "CAST(count(*) AS DOUBLE) AS v FROM c1), " +
        "dt AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents WHERE length(trim(text)) > 0), " +
        "db AS (SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ') " +
        "for i in range(1, len(t))]) AS bg FROM dt WHERE len(t) >= 2), " +
        "nll AS (SELECT db.doc_id, round(avg(-ln(CASE WHEN c2.c IS NOT NULL " +
        "THEN CAST(c2.c AS DOUBLE) / c1a.c " +
        "ELSE 0.4 * (coalesce(c1b.c, 0) + 1.0) / (s.n + s.v) END)), 4) AS nll_bg " +
        "FROM db LEFT JOIN c2 ON db.bg = c2.bg " +
        "LEFT JOIN c1 c1a ON split_part(db.bg, ' ', 1) = c1a.tok " +
        "LEFT JOIN c1 c1b ON split_part(db.bg, ' ', 2) = c1b.tok " +
        "CROSS JOIN s GROUP BY 1), " +
        "th AS (SELECT quantile_cont(nll_bg, [1.0/3, 2.0/3]) AS t FROM nll) " +
        "SELECT doc_id, nll_bg, " +
        "CAST(len(list_filter(th.t, x -> nll_bg > x)) AS INTEGER) AS tier_idx, " +
        "CASE len(list_filter(th.t, x -> nll_bg > x)) WHEN 0 THEN 'head' " +
        "WHEN 1 THEN 'middle' ELSE 'tail' END AS tier " +
        "FROM nll CROSS JOIN th ORDER BY doc_id"),

    // tokenizer fertility: GPT-2-ish RE2 pre-token split per lang
    "q127_tokenizer_fertility" ->
      ("WITH p AS (SELECT lang, " +
        "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE " +
        "len(string_split_regex(trim(text), '\\s+')) END AS w, " +
        "len(regexp_extract_all(text, " +
        "'''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s'']+')) AS t, " +
        "length(text) AS c FROM documents) " +
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(w) AS BIGINT) AS n_words, " +
        "CAST(sum(t) AS BIGINT) AS n_tokens, " +
        "round(CAST(sum(t) AS DOUBLE) / sum(w), 4) AS fertility, " +
        "round(CAST(sum(c) AS DOUBLE) / sum(t), 4) AS chars_per_token " +
        "FROM p GROUP BY 1 ORDER BY 1"),

    // repeat allocation: waterfill λ over cap-sorted prefix sums,
    // budget = floor(1.2 × unique tokens)
    "q128_repeat_allocation" ->
      ("WITH m AS (SELECT source, CAST(sum(CASE WHEN length(trim(text)) = 0 " +
        "THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END) " +
        "AS BIGINT) AS u FROM documents GROUP BY 1), " +
        "c AS (SELECT source, u, CAST(CASE " +
        "WHEN source IN ('src0','src1') THEN 4.0 " +
        "WHEN source IN ('src2','src3') THEN 2.0 ELSE 1.0 END AS DOUBLE) " +
        "AS cap FROM m), " +
        "t AS (SELECT CAST(sum(u) AS BIGINT) AS utot, " +
        "CAST(floor(CAST(sum(u) AS DOUBLE) * 1.2) AS BIGINT) AS b FROM m), " +
        "s AS (SELECT source, u, cap, " +
        "row_number() OVER (ORDER BY cap, source) AS rn, " +
        "coalesce(sum(cap * u) OVER (ORDER BY cap, source " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS capprev, " +
        "coalesce(sum(u) OVER (ORDER BY cap, source " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS uprev " +
        "FROM c), " +
        "l AS (SELECT min_by(lam, rn) AS lamstar FROM " +
        "(SELECT rn, cap, (t.b - capprev) / (t.utot - uprev) AS lam " +
        "FROM s, t) WHERE lam <= cap) " +
        "SELECT source, u AS n_tokens, cap AS epoch_cap, " +
        "round(least(cap, coalesce(l.lamstar, cap)), 4) AS epochs, " +
        "round(least(cap, coalesce(l.lamstar, cap)) * u, 4) AS alloc_tokens, " +
        "l.lamstar IS NOT NULL AS budget_met " +
        "FROM s, l ORDER BY source"),

    // char entropy: H = ln(n) − Σ c·ln(c)/n over per-doc char counts
    "q111_char_entropy" ->
      ("WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c " +
        "FROM documents WHERE length(text) >= 1), " +
        "cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2), " +
        "agg AS (SELECT doc_id, CAST(sum(n) AS DOUBLE) AS n, " +
        "sum(n * ln(n)) AS clogc FROM cc GROUP BY 1) " +
        "SELECT doc_id, round(ln(n) - clogc / n, 4) AS entropy, " +
        "CAST(n AS BIGINT) AS n_chars FROM agg ORDER BY doc_id"),

    // pack materialization: q79's floor(cumulative-before / budget)
    // assignment, then texts string_agg'd in doc order per pack
    "q112_pack_concat" ->
      ("WITH d AS (SELECT doc_id, lang, text, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens " +
        "FROM documents), " +
        "p AS (SELECT lang, doc_id, text, n_tokens, " +
        "CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 500) " +
        "AS BIGINT) AS pack_id FROM d) " +
        "SELECT lang, pack_id, count(*) AS n_docs, " +
        "CAST(sum(n_tokens) AS BIGINT) AS sum_tokens, " +
        "md5(string_agg(text, chr(10) || chr(10) ORDER BY doc_id)) AS seq_hash " +
        "FROM p GROUP BY 1, 2 ORDER BY 1, 2"),

    // curriculum buckets: quartile thresholds (quantile_cont ≡ Spark's
    // exact percentile: linear interpolation at p·(n−1)), bucket = count
    // of thresholds strictly below the value
    "q113_curriculum" ->
      ("WITH t AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75]) AS ths " +
        "FROM documents) " +
        "SELECT doc_id, CAST(len(list_filter(t.ths, x -> n_chars > x)) AS INTEGER) " +
        "AS bucket FROM documents, t ORDER BY doc_id"),

    // source signature keywords: q63's TF-IDF at the source grain, top-5
    // per source over the ROUNDED score, term-tiebroken
    "q114_source_keywords" ->
      ("WITH terms AS (SELECT source, unnest(string_split(text, ' ')) AS term " +
        "FROM documents), " +
        "t2 AS (SELECT source, term FROM terms WHERE length(term) > 0), " +
        "tf AS (SELECT source, term, count(*) AS tf FROM t2 GROUP BY 1, 2), " +
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
        "n AS (SELECT count(DISTINCT source) AS n_src FROM documents), " +
        "scored AS (SELECT source, term, " +
        "round(tf * ln((n_src + 1) / (df + 1.0)), 6) AS tfidf " +
        "FROM tf JOIN df USING (term) CROSS JOIN n), " +
        "r AS (SELECT source, term, tfidf, row_number() OVER " +
        "(PARTITION BY source ORDER BY tfidf DESC, term) AS rn FROM scored) " +
        "SELECT source, CAST(rn AS BIGINT) AS rank, term, tfidf " +
        "FROM r WHERE rn <= 5 ORDER BY source, rank"),

    // dedup survivors: q77's transitive closure, but the longest member of
    // each component survives (tie → min id); singletons keep themselves
    "q115_dedup_survivors" ->
      (s"WITH RECURSIVE $exactPairCtes, " +
        "p AS (SELECT id_a, id_b FROM jp WHERE j >= 0.5), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM p " +
        "UNION ALL SELECT id_b, id_a FROM p), " +
        "reach AS (SELECT a AS src, b AS dst FROM edges " +
        "UNION SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a), " +
        "lab AS (SELECT src AS id, least(src, min(dst)) AS cl " +
        "FROM reach GROUP BY src), " +
        "ad AS (SELECT d.doc_id, d.n_chars, coalesce(l.cl, d.doc_id) AS cl " +
        "FROM documents d LEFT JOIN lab l ON d.doc_id = l.id), " +
        "r AS (SELECT doc_id, cl, row_number() OVER " +
        "(PARTITION BY cl ORDER BY n_chars DESC, doc_id) AS rn, " +
        "count(*) OVER (PARTITION BY cl) AS n_dups FROM ad) " +
        "SELECT doc_id, CAST(n_dups AS BIGINT) AS n_dups FROM r " +
        "WHERE rn = 1 ORDER BY doc_id"),

    // exact containment (directed |A∩B|/|A|) on the doc_id<80 slice
    "q116_containment" ->
      ("WITH toks AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents " +
        "WHERE doc_id < 80), " +
        "sh AS (SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ') " +
        "for i in range(1, len(t) - 1)])) AS s FROM toks WHERE len(t) >= 3), " +
        "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), " +
        "shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i " +
        "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id GROUP BY 1, 2) " +
        "SELECT id_a, id_b, round(CAST(i AS DOUBLE) / sa.n, 4) AS containment " +
        "FROM shared JOIN sizes sa ON id_a = sa.doc_id " +
        "WHERE CAST(i AS DOUBLE) / sa.n >= 0.5 ORDER BY id_a, id_b"),

    // materialized mixture sample: binding group kept whole, others cut to
    // target_g × min_g(mass_g / target_g) in md5 order (q100's idiom)
    "q117_mixture_sample" ->
      ("WITH d AS (SELECT doc_id, lang, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens " +
        "FROM documents), " +
        "m AS (SELECT lang, CAST(sum(n_tokens) AS DOUBLE) AS n, " +
        "CASE lang WHEN 'en' THEN 0.3 WHEN 'de' THEN 0.2 WHEN 'fr' THEN 0.2 " +
        "WHEN 'es' THEN 0.2 WHEN 'zh' THEN 0.1 ELSE 0.0 END AS t " +
        "FROM d GROUP BY 1), " +
        "mt AS (SELECT lang, n, t FROM m WHERE t > 0), " +
        "sc AS (SELECT min(n / t) AS total FROM mt), " +
        "caps AS (SELECT lang, t * total AS cap FROM mt CROSS JOIN sc), " +
        "r AS (SELECT d.doc_id, d.lang, d.n_tokens, caps.cap, " +
        "sum(d.n_tokens) OVER (PARTITION BY d.lang " +
        "ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS run " +
        "FROM d JOIN caps USING (lang)) " +
        "SELECT doc_id, lang, n_tokens FROM r WHERE run <= cap ORDER BY doc_id"),

    // Temperature mixture: pow(mass, tau) shares over per-lang token
    // masses, caps = share x (budgetFraction x total mass), md5-ordered
    // per-lang running-sum quota — q117's replay with tempered shares
    "q277_temperature_sample" ->
      ("WITH d AS (SELECT doc_id, lang, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens " +
        "FROM documents), " +
        "m AS (SELECT lang, CAST(sum(n_tokens) AS DOUBLE) AS n FROM d " +
        "GROUP BY 1 HAVING sum(n_tokens) > 0), " +
        "mw AS (SELECT lang, n, pow(n, 0.5) AS w FROM m), " +
        "tt AS (SELECT sum(w) AS tw, sum(n) AS tn FROM mw), " +
        "caps AS (SELECT lang, w / tw * 0.3 * tn AS cap FROM mw CROSS JOIN tt), " +
        "r AS (SELECT d.doc_id, d.lang, d.n_tokens, caps.cap, " +
        "sum(d.n_tokens) OVER (PARTITION BY d.lang " +
        "ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS run " +
        "FROM d JOIN caps USING (lang)) " +
        "SELECT doc_id, lang, n_tokens FROM r WHERE run <= cap ORDER BY doc_id"),

    // Ingest near-dup screen: the q36b md5-minhash signature replayed on
    // both sides, batch (odd) x corpus (even) band agreement, batch docs
    // with no hit survive; short docs never shingle and pass through
    "q278_ingest_newdocs" ->
      ("WITH toks AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents " +
        "WHERE doc_id % 3 = 0), " +
        "sh2 AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') " +
        "for i in range(1, len(t) - 1)]) AS s FROM toks WHERE len(t) >= 3), " +
        "sg AS (SELECT doc_id, [list_min(list_transform(s, " +
        "x -> md5(CAST(i AS VARCHAR) || ':' || x))) for i in range(0, 16)] AS g FROM sh2), " +
        "hit AS (SELECT DISTINCT a.doc_id FROM sg a JOIN sg c " +
        "ON a.doc_id % 2 = 1 AND c.doc_id % 2 = 0 AND " +
        "(a.g[1:4] = c.g[1:4] OR a.g[5:8] = c.g[5:8] " +
        "OR a.g[9:12] = c.g[9:12] OR a.g[13:16] = c.g[13:16])) " +
        "SELECT doc_id, lang FROM documents WHERE doc_id % 3 = 0 " +
        "AND doc_id % 2 = 1 " +
        "AND doc_id NOT IN (SELECT doc_id FROM hit) ORDER BY doc_id"),

    // Snapshot diff: null-safe full-outer reconciliation with the
    // changed-column list in declaration order
    "q279_snapshot_diff" ->
      ("WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders), " +
        "b AS (SELECT o_orderkey, o_orderstatus, " +
        "CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0 " +
        "ELSE o_totalprice END AS o_totalprice FROM o WHERE o_orderkey % 11 <> 3), " +
        "a AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM o " +
        "WHERE o_orderkey % 11 <> 5), " +
        "j AS (SELECT coalesce(b.o_orderkey, a.o_orderkey) AS o_orderkey, " +
        "b.o_orderkey IS NULL AS miss_b, a.o_orderkey IS NULL AS miss_a, " +
        "list_filter([CASE WHEN NOT (b.o_orderstatus IS NOT DISTINCT FROM a.o_orderstatus) " +
        "THEN 'o_orderstatus' END, " +
        "CASE WHEN NOT (b.o_totalprice IS NOT DISTINCT FROM a.o_totalprice) " +
        "THEN 'o_totalprice' END], x -> x IS NOT NULL) AS cl " +
        "FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey), " +
        "st AS (SELECT o_orderkey, CASE WHEN miss_b THEN 'added' " +
        "WHEN miss_a THEN 'removed' WHEN len(cl) > 0 THEN 'changed' " +
        "ELSE 'unchanged' END AS status, " +
        "CASE WHEN NOT miss_b AND NOT miss_a AND len(cl) > 0 " +
        "THEN array_to_string(cl, ',') ELSE '' END AS changed_cols FROM j) " +
        "SELECT o_orderkey, status, changed_cols FROM st " +
        "WHERE status <> 'unchanged' ORDER BY o_orderkey"),

    // Wilson interval: same closed-form double arithmetic, same op order
    "q280_proportion_ci" ->
      ("WITH g AS (SELECT event_type, count(*) AS n, " +
        "sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS successes " +
        "FROM events GROUP BY 1), " +
        "w AS (SELECT event_type, CAST(n AS BIGINT) AS n, " +
        "CAST(successes AS BIGINT) AS successes, " +
        "CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) AS p, " +
        "CAST(n AS DOUBLE) AS nd FROM g) " +
        "SELECT event_type, n, successes, round(p, 6) AS p_hat, " +
        "round((p + (1.96*1.96) / (2*nd) - 1.96 * sqrt(p*(1-p)/nd + " +
        "(1.96*1.96)/(4*nd*nd))) / (1 + (1.96*1.96)/nd), 6) AS ci_lo, " +
        "round((p + (1.96*1.96) / (2*nd) + 1.96 * sqrt(p*(1-p)/nd + " +
        "(1.96*1.96)/(4*nd*nd))) / (1 + (1.96*1.96)/nd), 6) AS ci_hi " +
        "FROM w ORDER BY event_type"),

    // SemDeDup: q107's seed assignment + within-cell cosine pairs (q87's
    // cosine) + q77's transitive closure, min-id survivor
    "q118_semdedup" ->
      (s"WITH RECURSIVE seeds AS (SELECT CAST(vec_id AS INTEGER) AS cell, " +
        "embedding AS cv FROM embeddings WHERE vec_id <= 8), " +
        "dd AS (SELECT e.vec_id, s.cell, " +
        "sqrt(list_sum(list_transform(list_zip(e.embedding, s.cv), " +
        "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
        "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))) AS dist " +
        "FROM embeddings e CROSS JOIN seeds s), " +
        "ar AS (SELECT vec_id, cell, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM dd), " +
        "asg AS (SELECT vec_id, cell FROM ar WHERE rn = 1), " +
        "p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b " +
        "FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id " +
        "JOIN embeddings ea ON ea.vec_id = x.vec_id " +
        "JOIN embeddings eb ON eb.vec_id = y.vec_id " +
        s"WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.3), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM p " +
        "UNION ALL SELECT id_b, id_a FROM p), " +
        "reach AS (SELECT a AS src, b AS dst FROM edges " +
        "UNION SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a) " +
        "SELECT vec_id FROM embeddings WHERE vec_id NOT IN " +
        "(SELECT src FROM reach GROUP BY src HAVING min(dst) < src) " +
        "ORDER BY vec_id"),

    // prototypicality: q98's assignment + per-cell percent_rank of dist
    // (desc → 1.0 = most central), vec_id-tiebroken
    "q119_prototypicality" ->
      ("WITH seeds AS (SELECT CAST(vec_id AS INTEGER) AS cell, " +
        "embedding AS cv FROM embeddings WHERE vec_id <= 8), " +
        "dd AS (SELECT e.vec_id, s.cell, " +
        "sqrt(list_sum(list_transform(list_zip(e.embedding, s.cv), " +
        "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
        "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))) AS dist " +
        "FROM embeddings e CROSS JOIN seeds s), " +
        "ar AS (SELECT vec_id, cell, dist, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM dd), " +
        "asg AS (SELECT vec_id, cell, dist FROM ar WHERE rn = 1) " +
        "SELECT vec_id, cell, round(dist, 4) AS dist_r, " +
        "round(percent_rank() OVER (PARTITION BY cell " +
        "ORDER BY dist DESC, vec_id), 6) AS proto " +
        "FROM asg ORDER BY vec_id"),

    // padding waste per 64-token dynamic-batching bucket
    "q120_padding_waste" ->
      ("WITH d AS (SELECT CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tok " +
        "FROM documents), " +
        "b AS (SELECT ((n_tok + 63) // 64) * 64 AS bucket_len, n_tok FROM d), " +
        "g AS (SELECT bucket_len, count(*) AS n_docs, " +
        "CAST(sum(n_tok) AS BIGINT) AS sum_tokens FROM b GROUP BY 1) " +
        "SELECT bucket_len, n_docs, sum_tokens, " +
        "CAST(bucket_len * n_docs - sum_tokens AS BIGINT) AS pad_tokens, " +
        "round(CASE WHEN bucket_len = 0 THEN 0.0 " +
        "ELSE CAST(bucket_len * n_docs - sum_tokens AS DOUBLE) / " +
        "(bucket_len * n_docs) END, 6) AS waste_frac " +
        "FROM g ORDER BY bucket_len"),

    // temperature mixture: p_g = share^0.7 / Σ share^0.7, alloc out of 1M
    "q121_temperature_mix" ->
      ("WITH d AS (SELECT lang, CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tok " +
        "FROM documents), " +
        "m AS (SELECT lang, CAST(sum(n_tok) AS DOUBLE) AS n FROM d GROUP BY 1), " +
        "t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM m), " +
        "sh AS (SELECT lang, n, n / tot AS share, pow(n / tot, 0.7) AS pt " +
        "FROM m CROSS JOIN t), " +
        "z AS (SELECT sum(pt) AS z FROM sh) " +
        "SELECT lang, CAST(n AS BIGINT) AS n_tokens, round(share, 6) AS share, " +
        "round(pt / z, 6) AS temp_share, " +
        "CAST(floor(pt / z * 1000000) AS BIGINT) AS alloc_tokens " +
        "FROM sh CROSS JOIN z ORDER BY lang"),

    // Gopher rules: word count / mean word length / symbol ratio /
    // stopword hits, with per-rule flags
    "q122_gopher_rules" ->
      ("WITH d AS (SELECT doc_id, text, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_words, " +
        "CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) AS n_letters, " +
        "CAST(length(text) - length(regexp_replace(text, '[#@%^*{}|~]', '', 'g')) " +
        "AS DOUBLE) AS n_sym FROM documents), " +
        "s AS (SELECT doc_id, n_words, " +
        "CASE WHEN n_words = 0 THEN 0.0 ELSE n_letters / n_words END AS mean_wlen, " +
        "CASE WHEN length(text) = 0 THEN 0.0 ELSE n_sym / length(text) END AS sym_ratio, " +
        "CAST(CASE WHEN n_words = 0 THEN 0 ELSE " +
        "len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), " +
        "x -> list_contains(['the','and','of','to','a','in','is','that'], x))) " +
        "END AS BIGINT) AS stop_hits FROM d) " +
        "SELECT doc_id, n_words, round(mean_wlen, 4) AS mean_wlen, " +
        "round(sym_ratio, 6) AS sym_ratio, stop_hits, " +
        "n_words BETWEEN 5 AND 100000 AS ok_words, " +
        "mean_wlen BETWEEN 3.0 AND 10.0 AS ok_wlen, " +
        "sym_ratio < 0.1 AS ok_sym, stop_hits >= 2 AS ok_stop, " +
        "(n_words BETWEEN 5 AND 100000) AND (mean_wlen BETWEEN 3.0 AND 10.0) " +
        "AND sym_ratio < 0.1 AND stop_hits >= 2 AS passes " +
        "FROM s ORDER BY doc_id"),

    // sentence chunks: sentences split on [.!?]+\s+ (terminator consumed),
    // windows of 3 starting every 2, '. '-joined, hashed
    "q123_sentence_chunks" ->
      ("WITH d AS (SELECT doc_id, " +
        "replace(text, ' the ', '. The ') AS text FROM documents), " +
        "sp AS (SELECT doc_id, list_filter(" +
        "string_split_regex(trim(text), '[.!?]+\\s+'), x -> length(x) > 0) AS ss " +
        "FROM d), " +
        "w AS (SELECT doc_id, ss, unnest(range(1, len(ss) + 1, 2)) AS st " +
        "FROM sp WHERE len(ss) >= 1), " +
        "c AS (SELECT doc_id, CAST((st - 1) / 2 AS BIGINT) AS chunk_idx, " +
        "ss[st:st+2] AS chunk FROM w) " +
        "SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS n_sentences, " +
        "md5(array_to_string(chunk, '. ')) AS chunk_hash " +
        "FROM c WHERE len(chunk) >= 1 ORDER BY doc_id, chunk_idx"),

    // boilerplate: units recurring in >= 3 distinct docs dropped, survivors
    // rejoined in order ('. '), hashed
    "q124_boilerplate" ->
      ("WITH d AS (SELECT doc_id, replace(text || " +
        "' Accept all cookies to continue. Subscribe to the newsletter.', " +
        "' the ', '. The ') AS text FROM documents), " +
        "sp AS (SELECT doc_id, list_filter(" +
        "string_split_regex(trim(text), '[.!?]+\\s+'), x -> length(x) > 0) AS ss " +
        "FROM d), " +
        "u AS (SELECT doc_id, st - 1 AS pos, ss[st] AS unit FROM " +
        "(SELECT doc_id, ss, unnest(range(1, len(ss) + 1)) AS st FROM sp)), " +
        "f AS (SELECT md5(unit) AS uh FROM u GROUP BY 1 " +
        "HAVING count(DISTINCT doc_id) >= 3), " +
        "j AS (SELECT u.doc_id, u.pos, u.unit, f.uh IS NOT NULL AS boiler " +
        "FROM u LEFT JOIN f ON md5(u.unit) = f.uh) " +
        "SELECT doc_id, md5(coalesce(string_agg(unit, '. ' ORDER BY pos) " +
        "FILTER (WHERE NOT boiler), '')) AS clean_hash, " +
        "CAST(count(*) FILTER (WHERE NOT boiler) AS BIGINT) AS n_kept, " +
        "CAST(count(*) FILTER (WHERE boiler) AS BIGINT) AS n_dropped " +
        "FROM j GROUP BY 1 ORDER BY 1"),

    // C4 line rules: terminal punct + >=5 words + no 'javascript' per line;
    // lorem/brace/minLines doc flags
    "q125_c4_clean" ->
      ("WITH d AS (SELECT doc_id, replace(text, ' the ', " +
        "'.' || chr(10) || 'The ') AS text FROM documents), " +
        "c AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls, " +
        "list_filter(string_split(text, chr(10)), l -> " +
        "regexp_matches(rtrim(l), '[.!?\"]$') AND " +
        "len(string_split_regex(trim(l), '\\s+')) >= 5 AND " +
        "NOT contains(lower(l), 'javascript')) AS ks FROM d) " +
        "SELECT doc_id, md5(coalesce(array_to_string(ks, chr(10)), '')) " +
        "AS clean_hash, " +
        "CAST(len(ks) AS BIGINT) AS n_kept, " +
        "CAST(len(ls) AS BIGINT) AS n_lines, " +
        "contains(lower(text), 'lorem ipsum') AS has_lorem, " +
        "contains(text, '{') AS has_brace, " +
        "NOT contains(lower(text), 'lorem ipsum') AND " +
        "NOT contains(text, '{') AND len(ks) >= 3 AS passes " +
        "FROM c ORDER BY doc_id"),

    "q41_sessionize" ->
      ("WITH e AS (SELECT user_id, event_id, ts, lag(ts) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), " +
        "f AS (SELECT user_id, CASE WHEN prev_ts IS NULL " +
        "OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS ns FROM e) " +
        "SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions, count(*) AS n_events " +
        "FROM f GROUP BY 1"),

    "q44_conform_agg" ->
      ("SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty " +
        "FROM lineitem GROUP BY 1"),

    "q46_asof_join" ->
      ("WITH clicks AS (SELECT event_id AS click_id, user_id, ts FROM events " +
        "WHERE event_type = 'click'), " +
        "views AS (SELECT user_id, ts AS vts, max(event_id) AS view_id " +
        "FROM events WHERE event_type = 'view' GROUP BY user_id, ts) " +
        "SELECT c.click_id, c.user_id, v.view_id, " +
        "date_diff('second', v.vts, c.ts) AS lag_sec " +
        "FROM clicks c ASOF JOIN views v " +
        "ON c.user_id = v.user_id AND c.ts >= v.vts"),

    // Bounded backward as-of: native ASOF JOIN + a µs-exact INTERVAL
    // bound (date_diff('second') would floor and over-admit sub-second
    // overshoot — the operator compares at microsecond precision)
    "q281_asof_tolerance" ->
      ("WITH clicks AS (SELECT event_id AS click_id, user_id, ts FROM events " +
        "WHERE event_type = 'click'), " +
        "views AS (SELECT user_id, ts AS vts, max(event_id) AS view_id " +
        "FROM events WHERE event_type = 'view' GROUP BY user_id, ts) " +
        "SELECT c.click_id, c.user_id, v.view_id, " +
        "date_diff('second', v.vts, c.ts) AS lag_sec " +
        "FROM clicks c ASOF JOIN views v " +
        "ON c.user_id = v.user_id AND c.ts >= v.vts " +
        "WHERE c.ts - v.vts <= INTERVAL 3600 SECOND ORDER BY click_id"),

    // Adjusted Rand Index: contingency pair-counting — Σ C(n_ij,2) vs the
    // marginal-product expectation; the same (double × (n−1)) / 2.0 op
    // order the Spark operator uses, so the ratio hash-matches at 6dp.
    "q282_adjusted_rand" ->
      ("WITH c AS (SELECT CAST(lang AS VARCHAR) AS a, " +
        "CAST(source AS VARCHAR) AS b, count(*) AS n " +
        "FROM documents GROUP BY 1, 2), " +
        "i AS (SELECT sum(CAST(n AS DOUBLE) * (n - 1) / 2.0) AS idx, " +
        "CAST(sum(n) AS BIGINT) AS nn FROM c), " +
        "ma AS (SELECT sum(CAST(m AS DOUBLE) * (m - 1) / 2.0) AS pa " +
        "FROM (SELECT sum(n) AS m FROM c GROUP BY a)), " +
        "mb AS (SELECT sum(CAST(m AS DOUBLE) * (m - 1) / 2.0) AS pb " +
        "FROM (SELECT sum(n) AS m FROM c GROUP BY b)) " +
        "SELECT nn AS n, round((idx - pa * pb / " +
        "(CAST(nn AS DOUBLE) * (nn - 1) / 2.0)) / ((pa + pb) / 2.0 - " +
        "pa * pb / (CAST(nn AS DOUBLE) * (nn - 1) / 2.0)), 6) AS ari " +
        "FROM i, ma, mb"),

    // Hamilton apportionment: quotas (1000000.0 · mass / total), floors,
    // largest-remainder ranking (desc, key-tiebroken), top-up cut — the
    // integer allocations must match EXACTLY, not just at rounding.
    "q283_apportion_budget" ->
      ("WITH m AS (SELECT lang, source, " +
        "CAST(sum(n_chars) AS DOUBLE) AS mass FROM documents GROUP BY 1, 2), " +
        "t AS (SELECT sum(CASE WHEN mass > 0 THEN mass ELSE 0.0 END) AS tm " +
        "FROM m), " +
        "q AS (SELECT lang, source, mass, CASE WHEN mass > 0 AND tm > 0 " +
        "THEN 1000000.0 * mass / tm ELSE 0.0 END AS quota FROM m, t), " +
        "f AS (SELECT *, CAST(floor(quota) AS BIGINT) AS fl, " +
        "quota - floor(quota) AS rem FROM q), " +
        "s AS (SELECT CAST(1000000 - sum(fl) AS BIGINT) AS short FROM f), " +
        "r AS (SELECT *, row_number() OVER " +
        "(ORDER BY rem DESC, lang, source) AS rk FROM f) " +
        "SELECT lang, source, CAST(mass AS BIGINT) AS mass, " +
        "round(quota, 6) AS quota, " +
        "CAST(fl + CASE WHEN rem > 0 AND rk <= short THEN 1 ELSE 0 END " +
        "AS BIGINT) AS allocation " +
        "FROM r, s ORDER BY lang, source"),

    // Rank-biased overlap: both rankings replayed (row_number over the
    // same tie order), intersection entry depth = max(rank_a, rank_b),
    // X_d running count over a 1..20 spine, the (1.0−0.9)·0.9^(d−1)·X_d/d
    // series + the extrapolation tail — same literals, same op order.
    "q284_rbo" ->
      ("WITH ra AS (SELECT source, doc_id, row_number() OVER " +
        "(PARTITION BY source ORDER BY n_chars DESC, doc_id) AS r " +
        "FROM documents), " +
        "rb AS (SELECT source, doc_id, row_number() OVER " +
        "(PARTITION BY source ORDER BY " +
        "len(string_split_regex(trim(text), '\\s+')) DESC, doc_id) AS r " +
        "FROM documents), " +
        "e AS (SELECT ra.source, greatest(ra.r, rb.r) AS d, count(*) AS c " +
        "FROM ra JOIN rb ON ra.source = rb.source AND ra.doc_id = rb.doc_id " +
        "WHERE ra.r <= 20 AND rb.r <= 20 GROUP BY 1, 2), " +
        "g AS (SELECT DISTINCT source FROM documents), " +
        "spine AS (SELECT g.source, t.d FROM g, " +
        "(SELECT CAST(range AS INTEGER) AS d FROM range(1, 21)) t), " +
        "x AS (SELECT spine.source, spine.d, " +
        "sum(coalesce(e.c, 0)) OVER (PARTITION BY spine.source " +
        "ORDER BY spine.d) AS x " +
        "FROM spine LEFT JOIN e ON spine.source = e.source " +
        "AND spine.d = e.d) " +
        "SELECT source, " +
        "CAST(max(CASE WHEN d = 20 THEN x END) AS BIGINT) AS overlap_at_k, " +
        "round(sum((1.0 - 0.9) * power(0.9, d - 1) * x / d) + " +
        "power(0.9, 20) * max(CASE WHEN d = 20 THEN x END) / 20, 6) AS rbo " +
        "FROM x GROUP BY source ORDER BY source"),

    // DoReMi reweighting: per-domain mean loss + token-share reference,
    // log-sum-exp-stabilized exponentials, (1.0 − 0.1) smoothing — every
    // literal and op order mirrors the Spark operator.
    "q285_domain_reweight" ->
      ("WITH p AS (SELECT source, count(*) AS n_rows, " +
        "CAST(sum(n_chars) AS DOUBLE) AS mass, " +
        "avg(n_chars / 100.0) AS avg_loss FROM documents GROUP BY 1), " +
        "s AS (SELECT sum(mass) AS tm, max(avg_loss) AS lm, " +
        "count(*) AS ng FROM p), " +
        "r AS (SELECT *, mass / tm AS ref_share, " +
        "(mass / tm) * exp(1.0 * (avg_loss - lm)) AS u FROM p, s), " +
        "z AS (SELECT sum(u) AS zz FROM r) " +
        "SELECT source, n_rows, CAST(mass AS BIGINT) AS mass, " +
        "round(ref_share, 6) AS ref_share, round(avg_loss, 6) AS avg_loss, " +
        "round((1.0 - 0.1) * u / zz + 0.1 / ng, 6) AS weight " +
        "FROM r, z ORDER BY source"),

    // Log-rank: q198's subjects split into even/odd cohorts; both risk
    // sets replayed as running sums, χ² with the same (n−1) ≥ 1 guard.
    "q286_log_rank" ->
      ("WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) " +
        "AS BIGINT) AS t FROM events), " +
        "h AS (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS hmax " +
        "FROM events), " +
        "g AS (SELECT user_id, t, lead(t) OVER (PARTITION BY user_id " +
        "ORDER BY t, event_id) AS nxt FROM e), " +
        "s AS (SELECT floor((COALESCE(nxt, hmax) - t) / 600) AS d, " +
        "CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev, " +
        "CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS grp " +
        "FROM g, h), " +
        "per AS (SELECT d, " +
        "CAST(sum(CASE WHEN grp = 'even' THEN ev ELSE 0 END) AS BIGINT) AS d1, " +
        "CAST(sum(CASE WHEN grp = 'even' THEN 1 - ev ELSE 0 END) AS BIGINT) AS c1, " +
        "CAST(sum(CASE WHEN grp = 'odd' THEN ev ELSE 0 END) AS BIGINT) AS d2, " +
        "CAST(sum(CASE WHEN grp = 'odd' THEN 1 - ev ELSE 0 END) AS BIGINT) AS c2 " +
        "FROM s GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(d1 + c1) AS BIGINT) AS n1tot, " +
        "CAST(sum(d2 + c2) AS BIGINT) AS n2tot FROM per), " +
        "rk AS (SELECT *, " +
        "CAST(n1tot - sum(d1 + c1) OVER (ORDER BY d) + d1 + c1 AS DOUBLE) AS n1, " +
        "CAST(n2tot - sum(d2 + c2) OVER (ORDER BY d) + d2 + c2 AS DOUBLE) AS n2 " +
        "FROM per, tot), " +
        "st AS (SELECT *, CAST(d1 + d2 AS DOUBLE) AS dd, n1 + n2 AS nn " +
        "FROM rk), " +
        "fin AS (SELECT max(n1tot) AS n_a, max(n2tot) AS n_b, " +
        "CAST(sum(d1) AS BIGINT) AS observed_a, " +
        "CAST(sum(d2) AS BIGINT) AS observed_b, " +
        "sum(dd * n1 / nn) AS expected_a, sum(dd * n2 / nn) AS expected_b, " +
        "sum(CASE WHEN nn > 1.0 THEN " +
        "dd * (n1 / nn) * (n2 / nn) * (nn - dd) / (nn - 1.0) " +
        "ELSE 0.0 END) AS var_sum FROM st WHERE d1 + d2 > 0) " +
        "SELECT n_a, n_b, observed_a, observed_b, " +
        "round(expected_a, 6) AS expected_a, " +
        "round(expected_b, 6) AS expected_b, round(var_sum, 6) AS var_sum, " +
        "round(power(observed_a - expected_a, 2) / var_sum, 6) AS chi2 " +
        "FROM fin"),

    // Adamic–Adar: q145's edge construction, brokered self-join with the
    // same degree cap, existing-edge anti-join, identical cut order.
    "q287_adamic_adar" ->
      ("WITH mn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), " +
        "e0 AS (SELECT doc_id AS s, (doc_id + 1) % mn.n AS t " +
        "FROM documents, mn " +
        "UNION ALL SELECT doc_id, (doc_id + 7) % mn.n FROM documents, mn " +
        "WHERE doc_id % 2 = 0 " +
        "UNION ALL SELECT doc_id, (doc_id + 13) % mn.n FROM documents, mn " +
        "WHERE doc_id % 3 = 0), " +
        "und AS (SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b " +
        "FROM e0 WHERE s <> t), " +
        "adj AS (SELECT a AS w, b AS e FROM und " +
        "UNION ALL SELECT b, a FROM und), " +
        "deg AS (SELECT w, count(*) AS d FROM adj GROUP BY 1), " +
        "br AS (SELECT adj.w, adj.e, deg.d FROM adj JOIN deg USING (w) " +
        "WHERE d BETWEEN 2 AND 1000), " +
        "pr AS (SELECT b1.e AS u, b2.e AS v, " +
        "CAST(count(*) AS BIGINT) AS n_common, " +
        "sum(1.0 / ln(CAST(b1.d AS DOUBLE))) AS score " +
        "FROM br b1 JOIN br b2 ON b1.w = b2.w WHERE b1.e < b2.e " +
        "GROUP BY 1, 2), " +
        "na AS (SELECT pr.u, pr.v, pr.n_common, pr.score FROM pr " +
        "LEFT JOIN und ON pr.u = und.a AND pr.v = und.b " +
        "WHERE und.a IS NULL) " +
        "SELECT u, v, n_common, round(score, 6) AS score FROM na " +
        "ORDER BY na.score DESC, u, v LIMIT 50"),

    // Vocabulary coverage: q106's tokenization, frequency-of-frequencies,
    // Good–Turing + bias-corrected Chao1 closed forms in the same order.
    "q288_vocab_coverage" ->
      ("WITH t AS (SELECT source, " +
        "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok " +
        "FROM documents), " +
        "t2 AS (SELECT source, tok FROM t WHERE length(tok) > 0), " +
        "c AS (SELECT source, tok, count(*) AS n FROM t2 GROUP BY 1, 2), " +
        "a AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens, " +
        "count(*) AS vocab, " +
        "CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax, " +
        "CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis " +
        "FROM c GROUP BY 1) " +
        "SELECT source, n_tokens, vocab, n_hapax, n_dis, " +
        "round(CAST(n_hapax AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) " +
        "AS unseen_mass, " +
        "round(1.0 - CAST(n_hapax AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) " +
        "AS coverage, " +
        "round(CAST(vocab AS DOUBLE) + CAST(n_hapax AS DOUBLE) * " +
        "(CAST(n_hapax AS DOUBLE) - 1.0) / " +
        "(2.0 * (CAST(n_dis AS DOUBLE) + 1.0)), 6) AS chao1 " +
        "FROM a ORDER BY source"),

    // Propensity matching: per-(stratum, score) control collapse (struct
    // minimum = min outcome), global-nearest pick (|Δ| then lower score)
    // THEN the µ-exact caliper filter — the operator's order.
    "q289_propensity_match" ->
      ("WITH pu AS (SELECT user_id, sum(value) AS y, " +
        "CAST(user_id * 48271 % 999983 AS DOUBLE) / 999983.0 AS score, " +
        "(user_id * 16807 % 97) < 30 AS is_treated, " +
        "count(*) % 4 AS stratum FROM events GROUP BY user_id), " +
        "tr AS (SELECT user_id AS uid, stratum, floor(score * 1e6) AS su, " +
        "y FROM pu WHERE is_treated), " +
        "ct AS (SELECT stratum, floor(score * 1e6) AS su, min(y) AS yc " +
        "FROM pu WHERE NOT is_treated GROUP BY 1, 2), " +
        "tot AS (SELECT CAST(sum(CASE WHEN is_treated THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_treated, " +
        "CAST(sum(CASE WHEN NOT is_treated THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_control FROM pu), " +
        "m AS (SELECT t.uid, t.y AS yt, c.yc, c.su AS csu, t.su AS tsu, " +
        "row_number() OVER (PARTITION BY t.uid " +
        "ORDER BY abs(c.su - t.su), c.su) AS rn " +
        "FROM tr t JOIN ct c ON t.stratum = c.stratum), " +
        "mm AS (SELECT yt, yc FROM m WHERE rn = 1 " +
        "AND abs(csu - tsu) <= 50000), " +
        "fin AS (SELECT CAST(count(*) AS BIGINT) AS n_matched, " +
        "avg(yt) AS myt, avg(yc) AS myc, avg(yt - yc) AS att, " +
        "stddev_samp(yt - yc) / sqrt(CAST(count(*) AS DOUBLE)) AS se " +
        "FROM mm) " +
        "SELECT n_treated, n_control, n_matched, " +
        "round(CAST(n_matched AS DOUBLE) / n_treated, 6) AS match_rate, " +
        "round(myt, 4) AS mean_y_treated, round(myc, 4) AS mean_y_control, " +
        "round(att, 4) AS att, round(se, 4) AS se_att FROM fin, tot"),

    // Diff-in-diff: q219's epoch midpoint, four conditional cells (avg /
    // var_samp skip the CASE's implicit NULLs exactly like when() does),
    // Welch-style SE.
    "q290_diff_in_diff" ->
      ("WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) " +
        "AS ep, value FROM events), " +
        "md AS (SELECT CAST(floor((min(ep) + max(ep)) / 2.0) AS BIGINT) " +
        "AS mid FROM e), " +
        "pp AS (SELECT user_id, ep > mid AS is_post, sum(value) AS y " +
        "FROM e, md GROUP BY 1, 2), " +
        "m AS (SELECT " +
        "CAST(sum(CASE WHEN user_id % 2 = 0 AND NOT is_post THEN 1 ELSE 0 " +
        "END) AS BIGINT) AS n_t_pre, " +
        "CAST(sum(CASE WHEN user_id % 2 = 0 AND is_post THEN 1 ELSE 0 " +
        "END) AS BIGINT) AS n_t_post, " +
        "CAST(sum(CASE WHEN user_id % 2 <> 0 AND NOT is_post THEN 1 ELSE 0 " +
        "END) AS BIGINT) AS n_c_pre, " +
        "CAST(sum(CASE WHEN user_id % 2 <> 0 AND is_post THEN 1 ELSE 0 " +
        "END) AS BIGINT) AS n_c_post, " +
        "avg(CASE WHEN user_id % 2 = 0 AND NOT is_post THEN y END) AS mtpr, " +
        "avg(CASE WHEN user_id % 2 = 0 AND is_post THEN y END) AS mtpo, " +
        "avg(CASE WHEN user_id % 2 <> 0 AND NOT is_post THEN y END) AS mcpr, " +
        "avg(CASE WHEN user_id % 2 <> 0 AND is_post THEN y END) AS mcpo, " +
        "var_samp(CASE WHEN user_id % 2 = 0 AND NOT is_post THEN y END) " +
        "AS vtpr, " +
        "var_samp(CASE WHEN user_id % 2 = 0 AND is_post THEN y END) " +
        "AS vtpo, " +
        "var_samp(CASE WHEN user_id % 2 <> 0 AND NOT is_post THEN y END) " +
        "AS vcpr, " +
        "var_samp(CASE WHEN user_id % 2 <> 0 AND is_post THEN y END) " +
        "AS vcpo FROM pp) " +
        "SELECT n_t_pre, n_t_post, n_c_pre, n_c_post, " +
        "round(mtpr, 4) AS mean_t_pre, round(mtpo, 4) AS mean_t_post, " +
        "round(mcpr, 4) AS mean_c_pre, round(mcpo, 4) AS mean_c_post, " +
        "round(mtpo - mtpr, 4) AS trend_treated, " +
        "round(mcpo - mcpr, 4) AS trend_control, " +
        "round(mtpo - mtpr - (mcpo - mcpr), 4) AS did, " +
        "round(sqrt(vtpr / n_t_pre + vtpo / n_t_post + vcpr / n_c_pre " +
        "+ vcpo / n_c_post), 4) AS se_did FROM m"),

    // HITS: 5 unrolled rounds over the q141 graph, 9dp like PageRank.
    "q291_hits" -> hitsSql(5),

    // Bradley–Terry: 5 unrolled MM rounds, 9dp.
    "q295_bradley_terry" -> bradleyTerrySql(5),

    // Dawid–Skene: 2 unrolled EM rounds, posteriors 6dp + MAP flags.
    "q297_dawid_skene" -> dawidSkeneSql(2, 0.01),

    // Always-valid monitor: daily cumulative arm counts (exact integers,
    // so every derived double is bit-identical), pooled variance and the
    // log mixture e-value in the operator's op order.
    "q298_always_valid" ->
      ("WITH per AS (SELECT floor(floor(epoch(ts)) / 86400) AS bin, " +
        "CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS na, " +
        "CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS nb, " +
        "CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase' " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS ca, " +
        "CAST(sum(CASE WHEN user_id % 2 <> 0 AND event_type = 'purchase' " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS cb FROM events GROUP BY 1), " +
        "cum AS (SELECT bin, " +
        "CAST(sum(na) OVER (ORDER BY bin) AS BIGINT) AS n_a, " +
        "CAST(sum(nb) OVER (ORDER BY bin) AS BIGINT) AS n_b, " +
        "CAST(sum(ca) OVER (ORDER BY bin) AS BIGINT) AS conv_a, " +
        "CAST(sum(cb) OVER (ORDER BY bin) AS BIGINT) AS conv_b " +
        "FROM per), " +
        "f AS (SELECT *, conv_a / CAST(n_a AS DOUBLE) AS p_a, " +
        "conv_b / CAST(n_b AS DOUBLE) AS p_b, " +
        "conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE) " +
        "AS diff, " +
        "CAST(conv_a + conv_b AS DOUBLE) / " +
        "(CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pool FROM cum), " +
        "v AS (SELECT *, pool * (1.0 - pool) * " +
        "(1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) AS vv " +
        "FROM f), " +
        "ev AS (SELECT *, CASE WHEN n_a > 0 AND n_b > 0 AND vv > 0 THEN " +
        "0.5 * ln(vv / (vv + 0.0001)) + diff * diff * 0.0001 / " +
        "(2.0 * vv * (vv + 0.0001)) END AS log_e FROM v) " +
        "SELECT CAST(bin AS BIGINT) AS bin, n_a, n_b, conv_a, conv_b, " +
        "round(p_a, 6) AS p_a, round(p_b, 6) AS p_b, " +
        "round(diff, 6) AS diff, round(log_e, 6) AS log_e_value, " +
        "log_e >= ln(1.0 / 0.05) AS can_stop FROM ev ORDER BY bin"),

    // McNemar: four paired cells in one aggregate, discordant χ².
    "q300_mcnemar" ->
      ("WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN doc_id % 7 <> 0 AND doc_id % 5 <> 0 THEN 1 " +
        "ELSE 0 END) AS BIGINT) AS both_correct, " +
        "CAST(sum(CASE WHEN doc_id % 7 <> 0 AND doc_id % 5 = 0 THEN 1 " +
        "ELSE 0 END) AS BIGINT) AS a_only_correct, " +
        "CAST(sum(CASE WHEN doc_id % 7 = 0 AND doc_id % 5 <> 0 THEN 1 " +
        "ELSE 0 END) AS BIGINT) AS b_only_correct, " +
        "CAST(sum(CASE WHEN doc_id % 7 = 0 AND doc_id % 5 = 0 THEN 1 " +
        "ELSE 0 END) AS BIGINT) AS neither_correct FROM documents) " +
        "SELECT n, both_correct, a_only_correct, b_only_correct, " +
        "neither_correct, " +
        "round(CASE WHEN a_only_correct + b_only_correct > 0 THEN " +
        "power(a_only_correct - b_only_correct, 2) / " +
        "CAST(a_only_correct + b_only_correct AS DOUBLE) ELSE 0.0 END, 6) " +
        "AS chi2 FROM m"),

    // Uplift deciles: quantile_cont tiering (the q113 strictly-below
    // convention), per-tier rates, cumulative Qini from the top tier.
    "q301_uplift_deciles" ->
      ("WITH pu AS (SELECT sum(value) AS y, " +
        "CAST(user_id * 48271 % 999983 AS DOUBLE) / 999983.0 AS score, " +
        "(user_id * 16807 % 97) < 30 AS tr FROM events GROUP BY user_id), " +
        "th AS (SELECT quantile_cont(score, [0.1, 0.2, 0.3, 0.4, 0.5, " +
        "0.6, 0.7, 0.8, 0.9]) AS t FROM pu), " +
        "b AS (SELECT pu.*, CAST(len(list_filter(th.t, x -> score > x)) " +
        "AS INTEGER) AS bucket FROM pu, th), " +
        "per AS (SELECT bucket, " +
        "CAST(sum(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS n_t, " +
        "CAST(sum(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT) AS n_c, " +
        "sum(CASE WHEN tr THEN y ELSE 0.0 END) AS syt, " +
        "sum(CASE WHEN NOT tr THEN y ELSE 0.0 END) AS syc " +
        "FROM b GROUP BY 1), " +
        "c AS (SELECT *, " +
        "CAST(sum(n_t) OVER (ORDER BY bucket DESC) AS BIGINT) AS ct, " +
        "CAST(sum(n_c) OVER (ORDER BY bucket DESC) AS BIGINT) AS cc, " +
        "sum(syt) OVER (ORDER BY bucket DESC) AS cst, " +
        "sum(syc) OVER (ORDER BY bucket DESC) AS csc FROM per), " +
        "f AS (SELECT *, " +
        "CASE WHEN n_t > 0 THEN syt / n_t END AS mean_y_t, " +
        "CASE WHEN n_c > 0 THEN syc / n_c END AS mean_y_c FROM c) " +
        "SELECT bucket, n_t, n_c, round(mean_y_t, 4) AS mean_y_t, " +
        "round(mean_y_c, 4) AS mean_y_c, " +
        "round(mean_y_t - mean_y_c, 4) AS uplift, " +
        "round(CASE WHEN cc > 0 THEN cst - csc * CAST(ct AS DOUBLE) / cc " +
        "END, 4) AS qini FROM f ORDER BY bucket DESC"),

    // Permutation test: 64 md5-parity pseudo-arms, generated SQL.
    "q302_permutation_test" -> permutationTestSql(64),

    // Heaps law: prefix-quantile slicing, first-appearance vocabulary
    // sums, ln-ln closed-form regression (the q167 regr_* pattern).
    "q303_heaps_law" ->
      ("WITH d AS (SELECT CAST(doc_id AS DOUBLE) AS o, text " +
        "FROM documents), " +
        "th AS (SELECT quantile_cont(o, [" +
        (1 until 32).map(b => s"$b/32.0").mkString(", ") +
        "]) AS ths FROM d), " +
        "tk AS (SELECT CAST(len(list_filter(th.ths, x -> o > x)) " +
        "AS INTEGER) AS b, " +
        "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok " +
        "FROM d, th), " +
        "t2 AS (SELECT b, tok FROM tk WHERE length(tok) > 0), " +
        "pb AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM t2 " +
        "GROUP BY 1), " +
        "fs AS (SELECT b, CAST(count(*) AS BIGINT) AS nw FROM " +
        "(SELECT tok, min(b) AS b FROM t2 GROUP BY 1) GROUP BY 1), " +
        "c AS (SELECT pb.b, " +
        "CAST(sum(pb.n) OVER (ORDER BY pb.b) AS BIGINT) AS nc, " +
        "CAST(sum(COALESCE(fs.nw, 0)) OVER (ORDER BY pb.b) AS BIGINT) " +
        "AS vc FROM pb LEFT JOIN fs USING (b)), " +
        "a AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets, " +
        "max(nc) AS n_tokens, max(vc) AS vocab, min(vc) AS vmin, " +
        "regr_slope(ln(CAST(vc AS DOUBLE)), ln(CAST(nc AS DOUBLE))) " +
        "AS beta, " +
        "regr_intercept(ln(CAST(vc AS DOUBLE)), ln(CAST(nc AS DOUBLE))) " +
        "AS ic, " +
        "regr_r2(ln(CAST(vc AS DOUBLE)), ln(CAST(nc AS DOUBLE))) AS r2 " +
        "FROM c) " +
        // flat-curve guard mirrors the operator: saturated vocab → the
        // r2 ratio is 0/0 fp dust; the integer test replays exactly
        "SELECT n_buckets, n_tokens, vocab, " +
        "round(CASE WHEN vmin = vocab THEN 0.0 ELSE beta END, 6) " +
        "AS beta, " +
        "round(CASE WHEN vmin = vocab THEN CAST(vocab AS DOUBLE) " +
        "ELSE exp(ic) END, 6) AS k_coef, " +
        "round(CASE WHEN vmin = vocab THEN 1.0 ELSE r2 END, 6) AS r2 " +
        "FROM a"),

    // Temperature scaling: generated grid NLLs + ascending-T argmin.
    "q304_temperature_scaling" ->
      temperatureScalingSql(Seq(0.25, 0.5, 0.75, 1.0, 1.25, 1.5, 2.0,
        2.5, 3.0, 4.0)),

    // Best threshold: prCurve machinery + exact-integer cost argmin,
    // ties to the higher threshold.
    "q306_best_threshold" ->
      ("WITH d AS (SELECT (CAST(doc_id * 13 % 1000 AS DOUBLE) / 1000.0 " +
        "+ CASE WHEN doc_id % 4 = 0 THEN 0.5 ELSE 0.0 END) / 1.5 " +
        "AS score, CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS y " +
        "FROM documents), " +
        "per AS (SELECT score AS threshold, CAST(sum(y) AS BIGINT) " +
        "AS pos, CAST(sum(1 - y) AS BIGINT) AS neg FROM d GROUP BY 1), " +
        "c AS (SELECT threshold, " +
        "CAST(sum(pos) OVER (ORDER BY threshold DESC) AS BIGINT) AS tp, " +
        "CAST(sum(neg) OVER (ORDER BY threshold DESC) AS BIGINT) AS fp " +
        "FROM per), " +
        "t AS (SELECT CAST(sum(pos) AS BIGINT) AS p, " +
        "CAST(sum(neg) AS BIGINT) AS nn FROM per), " +
        "f AS (SELECT c.*, t.p - tp AS fn, t.nn - fp AS tn, " +
        "1.0 * fp + 5.0 * (t.p - tp) AS cost, " +
        "tp / (tp + fp) AS precision, tp / t.p AS recall FROM c, t), " +
        "g AS (SELECT *, CASE WHEN precision + recall > 0 THEN " +
        "2.0 * precision * recall / (precision + recall) ELSE 0.0 END " +
        "AS f1 FROM f) " +
        "SELECT round(threshold, 6) AS threshold, tp, fp, fn, tn, " +
        "round(cost, 4) AS cost, round(precision, 6) AS precision, " +
        "round(recall, 6) AS recall, round(f1, 6) AS f1 FROM g " +
        "ORDER BY g.cost, g.threshold DESC LIMIT 1"),

    // DP noisy means: the q218 md5-digit Laplace scheme twice (count
    // b = 2, clipped sum b = 200), ratio after.
    "q307_dp_noisy_mean" ->
      ("WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_true, " +
        "sum(least(100.0, greatest(0.0, value))) AS s, " +
        "md5(event_type || chr(1) || 'cr0') AS hc, " +
        "md5(event_type || chr(1) || 'sr0') AS hs FROM events " +
        "GROUP BY 1), " +
        s"d AS (SELECT event_type, n_true, s, (${hexPoly("hc")}) AS pc, " +
        s"(${hexPoly("hs")}) AS ps FROM g), " +
        "u AS (SELECT event_type, n_true, s, " +
        "(pc + 0.5) / 16777216.0 - 0.5 AS uc, " +
        "(ps + 0.5) / 16777216.0 - 0.5 AS us FROM d), " +
        "z AS (SELECT event_type, n_true, s / n_true AS mean_true, " +
        "n_true + -2.0 * sign(uc) * ln(1 - 2 * abs(uc)) AS n_noisy, " +
        "s + -200.0 * sign(us) * ln(1 - 2 * abs(us)) AS sum_noisy " +
        "FROM u) " +
        "SELECT event_type, n_true, round(mean_true, 6) AS mean_true, " +
        "round(n_noisy, 4) AS n_noisy, round(sum_noisy, 4) AS sum_noisy, " +
        "round(sum_noisy / n_noisy, 4) AS mean_noisy FROM z " +
        "ORDER BY event_type"),

    // Capture–recapture: one conditional-cell aggregate + Chapman closed
    // forms in the operator's op order (all inputs exact integers).
    "q308_capture_recapture" ->
      ("WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_a, " +
        "CAST(sum(CASE WHEN (doc_id * 7 + 1) % 5 < 2 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_b, " +
        "CAST(sum(CASE WHEN doc_id % 3 = 0 AND (doc_id * 7 + 1) % 5 < 2 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_both FROM documents), " +
        "e AS (SELECT *, " +
        "(n_a + 1.0) * (n_b + 1.0) / (n_both + 1.0) - 1.0 AS n_est, " +
        "sqrt((n_a + 1.0) * (n_b + 1.0) * (n_a - n_both) * " +
        "(n_b - n_both) / ((n_both + 1.0) * (n_both + 1.0) * " +
        "(n_both + 2.0))) AS se_est FROM m) " +
        "SELECT n, n_a, n_b, n_both, round(n_est, 4) AS n_est, " +
        "round(se_est, 4) AS se_est, " +
        "round(n_a / n_est, 6) AS recall_a, " +
        "round(n_b / n_est, 6) AS recall_b FROM e"),

    // Variance-reduced always-valid monitor: per-user integer counts →
    // per-bin conditional moments → cumulative window sums → running
    // theta, adjusted diff/variance, and the q298 mixture e-process on
    // both statistics, all in the operator's exact op order.
    "q309_alwaysvalid_cuped" ->
      ("WITH pu AS (SELECT user_id, " +
        "CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) " +
        "AS DOUBLE) AS x, " +
        "CAST(sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) " +
        "AS DOUBLE) AS y, " +
        "floor(min(floor(epoch(ts))) / 3600) AS bin, " +
        "(user_id * 16807 % 97) < 30 AS arma FROM events " +
        "GROUP BY user_id), " +
        "per AS (SELECT bin, " +
        "CAST(sum(CASE WHEN arma THEN 1 ELSE 0 END) AS BIGINT) AS na, " +
        "CAST(sum(CASE WHEN NOT arma THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS nb, " +
        "sum(CASE WHEN arma THEN y ELSE 0.0 END) AS bya, " +
        "sum(CASE WHEN NOT arma THEN y ELSE 0.0 END) AS byb, " +
        "sum(CASE WHEN arma THEN x ELSE 0.0 END) AS bxa, " +
        "sum(CASE WHEN NOT arma THEN x ELSE 0.0 END) AS bxb, " +
        "sum(y * y) AS byy, sum(x * x) AS bxx, sum(x * y) AS bxy " +
        "FROM pu GROUP BY 1), " +
        "cum AS (SELECT bin, " +
        "na AS bna, nb AS bnb, bya AS bbya, byb AS bbyb, " +
        "bxa AS bbxa, bxb AS bbxb, bxx AS bbxx, bxy AS bbxy, " +
        "CAST(sum(na) OVER (ORDER BY bin) AS BIGINT) AS n_a, " +
        "CAST(sum(nb) OVER (ORDER BY bin) AS BIGINT) AS n_b, " +
        "sum(bya) OVER (ORDER BY bin) AS sya, " +
        "sum(byb) OVER (ORDER BY bin) AS syb, " +
        "sum(bxa) OVER (ORDER BY bin) AS sxa, " +
        "sum(bxb) OVER (ORDER BY bin) AS sxb, " +
        "sum(byy) OVER (ORDER BY bin) AS syy, " +
        "sum(bxx) OVER (ORDER BY bin) AS sxx, " +
        "sum(bxy) OVER (ORDER BY bin) AS sxy FROM per), " +
        "a AS (SELECT *, CAST(n_a AS DOUBLE) AS dna, " +
        "CAST(n_b AS DOUBLE) AS dnb, " +
        "CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS n, " +
        "sxa + sxb AS sx, sya + syb AS sy, " +
        // lagged (exclusive-prefix) moments, cumulative minus the bin's
        // own contribution in the operator's exact arithmetic order —
        // bin t's theta must be fit on bins < t only (predictable plug-in)
        "(CAST(n_a AS DOUBLE) - CAST(bna AS DOUBLE)) + " +
        "(CAST(n_b AS DOUBLE) - CAST(bnb AS DOUBLE)) AS ln, " +
        "(sxa + sxb) - bbxa - bbxb AS lsx, " +
        "(sya + syb) - bbya - bbyb AS lsy, " +
        "sxx - bbxx AS lsxx, sxy - bbxy AS lsxy FROM cum), " +
        "b AS (SELECT *, sxx / n - (sx / n) * (sx / n) AS varx, " +
        "syy / n - (sy / n) * (sy / n) AS var_y, " +
        "sxy / n - (sx / n) * (sy / n) AS covxy, " +
        "CASE WHEN ln > 0 THEN lsxx / ln - (lsx / ln) * (lsx / ln) " +
        "ELSE 0.0 END AS varxl FROM a), " +
        "c AS (SELECT *, CASE WHEN ln > 0 AND varxl > 0 THEN " +
        "(lsxy / ln - (lsx / ln) * (lsy / ln)) / varxl ELSE 0.0 END " +
        "AS theta, " +
        "sya / dna - syb / dnb AS diff_raw FROM b), " +
        "dd AS (SELECT *, " +
        "diff_raw - theta * (sxa / dna - sxb / dnb) AS diff_adj, " +
        "var_y - 2.0 * theta * covxy + theta * theta * varx " +
        "AS var_adj FROM c), " +
        "ee AS (SELECT *, var_y * (1.0 / dna + 1.0 / dnb) AS vr, " +
        "var_adj * (1.0 / dna + 1.0 / dnb) AS va FROM dd), " +
        "ff AS (SELECT *, CASE WHEN n_a > 0 AND n_b > 0 AND vr > 0 " +
        "THEN 0.5 * ln(vr / (vr + 0.0001)) + diff_raw * diff_raw * " +
        "0.0001 / (2.0 * vr * (vr + 0.0001)) END AS le_raw, " +
        "CASE WHEN n_a > 0 AND n_b > 0 AND va > 0 " +
        "THEN 0.5 * ln(va / (va + 0.0001)) + diff_adj * diff_adj * " +
        "0.0001 / (2.0 * va * (va + 0.0001)) END AS le_adj FROM ee) " +
        "SELECT CAST(bin AS BIGINT) AS bin, n_a, n_b, " +
        "round(theta, 6) AS theta, round(diff_raw, 6) AS diff_raw, " +
        "round(diff_adj, 6) AS diff_adj, round(var_y, 4) AS var_y, " +
        "round(var_adj, 4) AS var_adj, round(le_raw, 6) AS log_e_raw, " +
        "round(le_adj, 6) AS log_e_adj, " +
        "le_adj >= ln(1.0 / 0.05) AS can_stop FROM ff ORDER BY bin"),

    // Stratified CMH McNemar: per-stratum discordant cells (exact longs)
    // + the pooled CMH and the three-moment homogeneity rollup, same op
    // order as the operator.
    "q310_mcnemar_strat" ->
      ("WITH per AS (SELECT lang, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN doc_id % 7 <> 0 AND doc_id % 5 = 0 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS b, " +
        "CAST(sum(CASE WHEN doc_id % 7 = 0 AND doc_id % 5 <> 0 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS c " +
        "FROM documents GROUP BY 1), " +
        "s AS (SELECT *, CASE WHEN b + c > 0 THEN " +
        "power(b - c, 2) / CAST(b + c AS DOUBLE) ELSE 0.0 END AS chi2 " +
        "FROM per), " +
        "r AS (SELECT CAST(count(*) AS BIGINT) AS n_strata, " +
        "CAST(sum(CASE WHEN b + c > 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_informative, " +
        "CAST(sum(b) AS BIGINT) AS tb, CAST(sum(c) AS BIGINT) AS tc, " +
        "sum(CASE WHEN b + c > 0 THEN b * b / CAST(b + c AS DOUBLE) " +
        "ELSE 0.0 END) AS sb2n, " +
        "CAST(sum(b + c) AS BIGINT) AS tn FROM s), " +
        "r2 AS (SELECT *, CASE WHEN tb + tc > 0 THEN " +
        "power(tb - tc, 2) / CAST(tb + tc AS DOUBLE) ELSE 0.0 END " +
        "AS cmh_chi2, " +
        "tb / CAST(tb + tc AS DOUBLE) AS p FROM r), " +
        "r3 AS (SELECT *, CASE WHEN tn > 0 AND p > 0.0 AND p < 1.0 " +
        "THEN (sb2n - 2.0 * p * tb + p * p * tn) / (p * (1.0 - p)) " +
        "ELSE 0.0 END AS hom_chi2 FROM r2) " +
        "SELECT s.lang, s.n, s.b AS a_only_correct, " +
        "s.c AS b_only_correct, round(s.chi2, 6) AS chi2, " +
        "r3.n_strata, r3.n_informative, " +
        "round(r3.cmh_chi2, 6) AS cmh_chi2, " +
        "round(r3.hom_chi2, 6) AS hom_chi2 FROM s, r3 ORDER BY lang"),

    // Personalized weighted PageRank: 3 unrolled RWR rounds over the
    // q141 ring graph with integer weights and a doc_id%17 seed set.
    "q311_personalized_pagerank" -> pprSql(3),

    // Delta-method ratio metric: per-arm unit moments + the delta
    // variance, same op order (var = (vyy − 2R·vxy + R²·vxx)/(n·mx²)).
    "q312_ratio_metric" ->
      ("WITH pu AS (SELECT user_id, " +
        "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) " +
        "AS DOUBLE) AS y, " +
        "CAST(count(*) AS DOUBLE) AS x, " +
        "(user_id * 16807 % 97) < 30 AS arma FROM events " +
        "GROUP BY user_id), " +
        "m AS (SELECT " +
        "CAST(sum(CASE WHEN arma THEN 1 ELSE 0 END) AS BIGINT) AS n_a, " +
        "CAST(sum(CASE WHEN NOT arma THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_b, " +
        "sum(CASE WHEN arma THEN y ELSE 0.0 END) AS sya, " +
        "sum(CASE WHEN NOT arma THEN y ELSE 0.0 END) AS syb, " +
        "sum(CASE WHEN arma THEN x ELSE 0.0 END) AS sxa, " +
        "sum(CASE WHEN NOT arma THEN x ELSE 0.0 END) AS sxb, " +
        "sum(CASE WHEN arma THEN y * y ELSE 0.0 END) AS syya, " +
        "sum(CASE WHEN NOT arma THEN y * y ELSE 0.0 END) AS syyb, " +
        "sum(CASE WHEN arma THEN x * x ELSE 0.0 END) AS sxxa, " +
        "sum(CASE WHEN NOT arma THEN x * x ELSE 0.0 END) AS sxxb, " +
        "sum(CASE WHEN arma THEN x * y ELSE 0.0 END) AS sxya, " +
        "sum(CASE WHEN NOT arma THEN x * y ELSE 0.0 END) AS sxyb " +
        "FROM pu), " +
        "r AS (SELECT *, " +
        "CASE WHEN sxa <> 0.0 THEN sya / sxa END AS ratio_a, " +
        "CASE WHEN sxb <> 0.0 THEN syb / sxb END AS ratio_b, " +
        "CAST(n_a AS DOUBLE) AS dna, CAST(n_b AS DOUBLE) AS dnb " +
        "FROM m), " +
        "v AS (SELECT *, " +
        "CASE WHEN n_a > 0 AND sxa <> 0.0 THEN " +
        "(syya / dna - (sya / dna) * (sya / dna) - " +
        "2.0 * ratio_a * (sxya / dna - (sxa / dna) * (sya / dna)) + " +
        "ratio_a * ratio_a * (sxxa / dna - (sxa / dna) * (sxa / dna))) " +
        "/ (dna * (sxa / dna) * (sxa / dna)) END AS va, " +
        "CASE WHEN n_b > 0 AND sxb <> 0.0 THEN " +
        "(syyb / dnb - (syb / dnb) * (syb / dnb) - " +
        "2.0 * ratio_b * (sxyb / dnb - (sxb / dnb) * (syb / dnb)) + " +
        "ratio_b * ratio_b * (sxxb / dnb - (sxb / dnb) * (sxb / dnb))) " +
        "/ (dnb * (sxb / dnb) * (sxb / dnb)) END AS vb FROM r), " +
        "f AS (SELECT *, ratio_a - ratio_b AS diff, " +
        "sqrt(va + vb) AS se FROM v) " +
        "SELECT n_a, n_b, round(ratio_a, 6) AS ratio_a, " +
        "round(ratio_b, 6) AS ratio_b, round(diff, 6) AS diff, " +
        "round(se, 6) AS se, " +
        "round(CASE WHEN se > 0.0 THEN diff / se END, 4) AS z FROM f"),

    // MDE sizing curve: one moment scan broadcast onto the horizons
    // list, literal z quantiles (no normal-inverse in either engine).
    "q313_mde_curve" ->
      ("WITH pu AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS y, " +
        "floor(min(floor(epoch(ts))) / 86400) AS bin FROM events " +
        "GROUP BY user_id), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(y) AS sy, " +
        "sum(y * y) AS syy, " +
        "CAST(count(DISTINCT bin) AS BIGINT) AS periods FROM pu), " +
        "h AS (SELECT unnest([1, 2, 4, 8, 16]) AS horizon), " +
        "a AS (SELECT h.horizon, m.*, sy / n AS mean, " +
        "syy / n - (sy / n) * (sy / n) AS vr, " +
        "CAST(n AS DOUBLE) / periods AS rate FROM h, m), " +
        "b AS (SELECT *, rate * horizon / 2.0 AS n_per_arm FROM a), " +
        "c AS (SELECT *, CASE WHEN n_per_arm > 0.0 THEN " +
        "(1.959964 + 0.841621) * sqrt(2.0 * vr / n_per_arm) END " +
        "AS mde_abs FROM b) " +
        "SELECT CAST(horizon AS INTEGER) AS horizon, " +
        "round(n_per_arm, 4) AS n_per_arm, round(mean, 6) AS mean, " +
        "round(sqrt(vr), 6) AS sd, round(mde_abs, 6) AS mde_abs, " +
        "round(CASE WHEN mean <> 0.0 THEN mde_abs / mean END, 6) " +
        "AS mde_rel FROM c ORDER BY horizon"),

    // MMR diversification: 3 unrolled greedy rounds, q39's cosine.
    "q321_mmr" -> mmrSql(3, 0.7),

    // IPW: clipped-weight conditional moments + Hájek normalization,
    // same op order (1.0 - 0.01 computed in-engine on both sides).
    "q319_ipw" ->
      ("WITH pu AS (SELECT CAST(count(*) AS DOUBLE) AS y, " +
        "CAST(user_id * 48271 % 999983 AS DOUBLE) / 999983.0 AS score, " +
        "(user_id * 16807 % 97) < 30 AS tr FROM events " +
        "GROUP BY user_id), " +
        "w AS (SELECT y, tr, least(1.0 - 0.01, greatest(0.01, score)) " +
        "AS e FROM pu), " +
        "m AS (SELECT " +
        "CAST(sum(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS n_t, " +
        "CAST(sum(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_c, " +
        "sum(CASE WHEN tr THEN 1.0 / e ELSE 0.0 END) AS swt, " +
        "sum(CASE WHEN NOT tr THEN 1.0 / (1.0 - e) ELSE 0.0 END) " +
        "AS swc, " +
        "sum(CASE WHEN tr THEN (1.0 / e) * (1.0 / e) ELSE 0.0 END) " +
        "AS swt2, " +
        "sum(CASE WHEN NOT tr THEN (1.0 / (1.0 - e)) * " +
        "(1.0 / (1.0 - e)) ELSE 0.0 END) AS swc2, " +
        "sum(CASE WHEN tr THEN (1.0 / e) * y ELSE 0.0 END) AS swyt, " +
        "sum(CASE WHEN NOT tr THEN (1.0 / (1.0 - e)) * y ELSE 0.0 END) " +
        "AS swyc, " +
        "sum(CASE WHEN tr THEN y ELSE 0.0 END) AS syt, " +
        "sum(CASE WHEN NOT tr THEN y ELSE 0.0 END) AS syc FROM w) " +
        "SELECT n_t, n_c, " +
        "round(swt * swt / swt2, 4) AS ess_t, " +
        "round(swc * swc / swc2, 4) AS ess_c, " +
        "round(swyt / swt, 6) AS mean_t_ipw, " +
        "round(swyc / swc, 6) AS mean_c_ipw, " +
        "round(swyt / swt - swyc / swc, 6) AS ate_ipw, " +
        "round(syt / n_t - syc / n_c, 6) AS ate_naive FROM m"),

    // Pseudo-relevance expansion: the bm25TopSql machinery as the
    // feedback pass, then the relevance-model term weighting.
    "q320_prf" ->
      ("WITH base AS (SELECT doc_id, CAST(len(list_filter(" +
        "string_split(text, ' '), x -> len(x) > 0)) AS DOUBLE) AS dl " +
        "FROM documents), " +
        "stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl " +
        "FROM base), " +
        "terms AS (SELECT doc_id, unnest(string_split(text, ' ')) " +
        "AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM terms " +
        "WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2), " +
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
        "c AS (SELECT tf.doc_id, round(" +
        "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2 / " +
        "(tf + 1.2 * (0.25 + 0.75 * b.dl / avgdl)), 6) AS c " +
        "FROM tf JOIN df USING (term) JOIN base b " +
        "ON tf.doc_id = b.doc_id CROSS JOIN stats), " +
        "hits AS (SELECT doc_id, round(sum(c), 4) AS score FROM c " +
        "GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 5), " +
        "fb AS (SELECT d.doc_id, hits.score, base.dl, d.text " +
        "FROM documents d JOIN hits USING (doc_id) " +
        "JOIN base ON d.doc_id = base.doc_id), " +
        "ft AS (SELECT doc_id, dl, score, " +
        "unnest(string_split(text, ' ')) AS term FROM fb), " +
        "ft2 AS (SELECT doc_id, dl, score, term, count(*) AS tf " +
        "FROM ft WHERE len(term) > 0 AND term NOT IN " +
        "('spark', 'join', 'window') GROUP BY 1, 2, 3, 4), " +
        "wt AS (SELECT term, sum(tf / dl * score) AS w, " +
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_fb_docs " +
        "FROM ft2 GROUP BY 1), " +
        "tot AS (SELECT sum(w) AS t FROM wt) " +
        "SELECT term, n_fb_docs, round(wt.w / tot.t, 6) AS weight " +
        "FROM wt, tot ORDER BY wt.w / tot.t DESC, term LIMIT 10"),

    // BM25F: title/body derived by the same slice recipe, per-field
    // normalized tf combined BEFORE saturation, document-level idf —
    // arithmetic order mirrors Retrieval.bm25f term for term.
    "q322_bm25f" ->
      ("WITH tk AS (SELECT doc_id, list_filter(string_split(text, ' '), " +
        "x -> len(x) > 0) AS t FROM documents), " +
        "fld AS (SELECT doc_id, " +
        "array_to_string(list_slice(t, 1, 4), ' ') AS title, " +
        "array_to_string(list_slice(t, 5, len(t)), ' ') AS body " +
        "FROM tk), " +
        "tb AS (SELECT doc_id, " +
        "string_split(title, ' ') AS tt, " +
        "string_split(body, ' ') AS bt FROM fld), " +
        "ln_ AS (SELECT doc_id, " +
        "CAST(len(list_filter(tt, x -> len(x) > 0)) AS DOUBLE) AS lt, " +
        "CAST(len(list_filter(bt, x -> len(x) > 0)) AS DOUBLE) AS lb " +
        "FROM tb), " +
        "av AS (SELECT avg(lt) AS avt, avg(lb) AS avb FROM ln_), " +
        "tft AS (SELECT doc_id, term, count(*) AS tf FROM " +
        "(SELECT doc_id, unnest(tt) AS term FROM tb) " +
        "WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2), " +
        "tfb AS (SELECT doc_id, term, count(*) AS tf FROM " +
        "(SELECT doc_id, unnest(bt) AS term FROM tb) " +
        "WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2), " +
        "wf AS (SELECT f.doc_id, term, " +
        "2.0 * tf / (0.25 + 0.75 * l.lt / av.avt) AS wtf " +
        "FROM tft f JOIN ln_ l USING (doc_id) CROSS JOIN av " +
        "UNION ALL SELECT f.doc_id, term, " +
        "1.0 * tf / (0.25 + 0.75 * l.lb / av.avb) AS wtf " +
        "FROM tfb f JOIN ln_ l USING (doc_id) CROSS JOIN av), " +
        "comb AS (SELECT doc_id, term, sum(wtf) AS tfw FROM wf " +
        "GROUP BY 1, 2), " +
        "nd AS (SELECT count(*) AS n_docs FROM documents), " +
        "dfq AS (SELECT term, count(*) AS df FROM comb GROUP BY 1), " +
        "c AS (SELECT comb.doc_id, round(" +
        "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tfw * 2.2 / " +
        "(tfw + 1.2), 6) AS c " +
        "FROM comb JOIN dfq USING (term) CROSS JOIN nd) " +
        "SELECT doc_id, round(sum(c), 4) AS score, " +
        "count(*) AS n_terms_matched FROM c GROUP BY 1 " +
        "ORDER BY score DESC, doc_id LIMIT 10"),

    // Sequential SRM guard: per-hour arm counts (exact longs), one
    // cumulative window, the closed-form mixture e-process on
    // share_a − 30/97 with the H0 binomial variance.
    "q323_alwaysvalid_srm" ->
      ("WITH per AS (SELECT floor(floor(epoch(ts)) / 3600) AS bin, " +
        "CAST(sum(CASE WHEN (user_id * 16807 % 97) < 30 THEN 1 ELSE 0 " +
        "END) AS BIGINT) AS ba, " +
        "CAST(sum(CASE WHEN (user_id * 16807 % 97) < 30 THEN 0 ELSE 1 " +
        "END) AS BIGINT) AS bb FROM events GROUP BY 1), " +
        "cum AS (SELECT bin, " +
        "CAST(sum(ba) OVER (ORDER BY bin) AS BIGINT) AS n_a, " +
        "CAST(sum(bb) OVER (ORDER BY bin) AS BIGINT) AS n_b FROM per), " +
        "a AS (SELECT *, CAST(n_a + n_b AS DOUBLE) AS n, " +
        "30.0 / 97 AS p0 FROM cum), " +
        "b AS (SELECT *, n_a / n AS share_a, " +
        "p0 * (1.0 - p0) / n AS v FROM a), " +
        "c AS (SELECT *, share_a - p0 AS diff FROM b), " +
        "d AS (SELECT *, CASE WHEN n > 0 AND v > 0 THEN " +
        "0.5 * ln(v / (v + 0.0001)) + diff * diff * 0.0001 / " +
        "(2.0 * v * (v + 0.0001)) END AS le FROM c) " +
        "SELECT CAST(bin AS BIGINT) AS bin, n_a, n_b, " +
        "round(share_a, 6) AS share_a, " +
        "round(p0, 6) AS expected_share_a, round(diff, 6) AS diff, " +
        "round(le, 6) AS log_e_value, " +
        "le >= ln(1.0 / 0.05) AS srm_detected FROM d ORDER BY bin"),

    // Segment BLEU / ROUGE-2: generated pair derivation + per-n clipped
    // overlap FULL-join machinery (evalPairHead), op order mirrored.
    // Dirichlet query likelihood: scan-side per-term tf (list_filter
    // counts), one-row cf totals, ln arithmetic mirrored term for term.
    "q328_query_likelihood" -> {
      val ts = Seq("spark", "join", "window")
      def tfOf(t: String) = s"len(list_filter(t, x -> x = '$t'))"
      val cfs = ts.zipWithIndex.map { case (t, i) =>
        s"CAST(sum(${tfOf(t)}) AS BIGINT) AS cf$i"
      }.mkString(", ")
      // CASE mirrors the operator's OOV guard (cf = 0 → uniform 0.0).
      val logs = ts.zipWithIndex.map { case (t, i) =>
        s"CASE WHEN cf$i = 0 THEN 0.0 ELSE " +
          s"ln((CAST(${tfOf(t)} AS DOUBLE) + 300.0 * " +
          s"(CAST(cf$i AS DOUBLE) / ctot)) / (dl + 300.0)) END"
      }.mkString(" + ")
      val nm = ts.map(t => s"CASE WHEN ${tfOf(t)} > 0 THEN 1 ELSE 0 END")
        .mkString(" + ")
      "WITH base AS (SELECT doc_id, list_filter(string_split(text, ' '), " +
        "x -> len(x) > 0) AS t FROM documents), " +
        "b2 AS (SELECT doc_id, t, CAST(len(t) AS DOUBLE) AS dl " +
        "FROM base), " +
        s"cf AS (SELECT $cfs, CAST(sum(len(t)) AS BIGINT) AS ctot " +
        "FROM b2), " +
        s"s AS (SELECT doc_id, $logs AS score, $nm AS nm FROM b2, cf) " +
        "SELECT doc_id, round(score, 6) AS score, " +
        "CAST(nm AS BIGINT) AS n_terms_matched FROM s " +
        "ORDER BY score DESC, doc_id LIMIT 10"
    },

    "q324_bleu" -> bleuSql(4),
    "q325_rouge" -> rougeSql(2),
    "q327_chrf" -> chrfSql(6),
    "q329_kcenter_coreset" -> kCenterSql(4),

    "q331_facility_location" -> facilityLocationSql(4),

    "q332_textrank" -> textRankSql(5),

    // DBSCAN: degrees over the exact eps-pair table, core flag at
    // minPts 3 (the point counts itself), recursive closure over
    // core-core edges (q84's reach pattern, min-id labels), min-label
    // border attachment, noise = the rest. All-integer output.
    "q333_dbscan" ->
      ("WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings " +
        "WHERE vec_id < 150), " +
        "p AS (SELECT a.vec_id AS ia, b.vec_id AS ib " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id " +
        s"WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.30), " +
        "und AS (SELECT ia AS id, ib AS nb FROM p " +
        "UNION ALL SELECT ib, ia FROM p), " +
        "deg AS (SELECT e.vec_id AS id, CAST(COALESCE(d.n, 0) AS BIGINT) " +
        "AS n FROM e LEFT JOIN (SELECT id, count(*) AS n FROM und " +
        "GROUP BY 1) d ON e.vec_id = d.id), " +
        "core AS (SELECT id FROM deg WHERE n + 1 >= 3), " +
        "ce AS (SELECT ia, ib FROM p WHERE ia IN (SELECT id FROM core) " +
        "AND ib IN (SELECT id FROM core)), " +
        "edges AS (SELECT ia AS a, ib AS b FROM ce " +
        "UNION ALL SELECT ib, ia FROM ce), " +
        "reach AS (SELECT a AS src, b AS dst FROM edges " +
        "UNION SELECT r.src, e2.b FROM reach r JOIN edges e2 " +
        "ON r.dst = e2.a), " +
        "lbl AS (SELECT c.id, LEAST(c.id, COALESCE(m.mn, c.id)) " +
        "AS cluster FROM core c LEFT JOIN (SELECT src, min(dst) AS mn " +
        "FROM reach GROUP BY 1) m ON c.id = m.src), " +
        "bl AS (SELECT u.id, min(l.cluster) AS bcl FROM und u " +
        "JOIN lbl l ON u.nb = l.id " +
        "WHERE u.id NOT IN (SELECT id FROM core) GROUP BY 1) " +
        "SELECT deg.id AS vec_id, deg.n AS n_neighbors, " +
        "deg.n + 1 >= 3 AS is_core, " +
        "COALESCE(l.cluster, bl.bcl) AS cluster, " +
        "CASE WHEN deg.n + 1 >= 3 THEN 'core' " +
        "WHEN bl.bcl IS NOT NULL THEN 'border' ELSE 'noise' END AS role " +
        "FROM deg LEFT JOIN lbl l ON deg.id = l.id " +
        "LEFT JOIN bl ON deg.id = bl.id ORDER BY vec_id"),

    // Benjamini–Hochberg: ascending (p, test) rank, m·p/rank suffix min,
    // cap at 1 — rejected computed on the UNROUNDED p_adj like the op.
    "q326_bh_fdr" ->
      ("WITH tests AS (SELECT floor(doc_id / 8) AS test, " +
        "CAST(min(doc_id * 37 % 997) AS DOUBLE) / 996.0 AS p " +
        "FROM documents GROUP BY 1), " +
        "mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM tests), " +
        "r AS (SELECT test, p, CAST(row_number() OVER " +
        "(ORDER BY p, test) AS BIGINT) AS rank FROM tests), " +
        "raw AS (SELECT *, CAST(m AS DOUBLE) * p / rank AS rw " +
        "FROM r, mm), " +
        "s AS (SELECT *, min(rw) OVER (ORDER BY p, test " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS sfx " +
        "FROM raw), " +
        "f AS (SELECT *, least(sfx, 1.0) AS p_adj FROM s) " +
        "SELECT CAST(test AS BIGINT) AS test, round(p, 6) AS p, rank, " +
        "m, round(p_adj, 6) AS p_adj, p_adj <= 0.2 AS rejected " +
        "FROM f ORDER BY test"),

    // Scaling-law fit: planted loss curve, generated per-candidate OLS.
    "q317_scaling_law" ->
      scalingLawSql(Seq(0.0, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)),

    // LSH S-curve planner: pure closed-form grid, CAST keeps doubles.
    "q318_lsh_plan" ->
      ("WITH b AS (SELECT unnest([1, 2, 4, 8, 16]) AS bands), " +
        "g AS (SELECT CAST(unnest([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, " +
        "0.8, 0.9, 0.95]) AS DOUBLE) AS sim), " +
        "c AS (SELECT bands, CAST(16 / bands AS INTEGER) " +
        "AS rows_per_band, sim FROM b, g) " +
        "SELECT bands, rows_per_band, " +
        "round(power(1.0 - power(0.5, 1.0 / bands), " +
        "1.0 / rows_per_band), 6) AS s50, sim, " +
        "round(1.0 - power(1.0 - power(sim, rows_per_band), bands), 6) " +
        "AS p_collision FROM c ORDER BY bands, sim"),

    // Modularity: symmetrized q141 graph vs the 64-block partition —
    // degree/intra cells are exact longs, same term order as the
    // operator (intra/2m − (dc/2m)²).
    "q314_modularity" ->
      ("WITH mn AS (SELECT CAST(count(*) AS BIGINT) AS n " +
        "FROM documents), " +
        "e0 AS (SELECT doc_id AS src, (doc_id + 1) % mn.n AS dst " +
        "FROM documents, mn " +
        "UNION ALL SELECT doc_id, (doc_id + 7) % mn.n FROM documents, " +
        "mn WHERE doc_id % 2 = 0 " +
        "UNION ALL SELECT doc_id, (doc_id + 101) % mn.n FROM documents, " +
        "mn WHERE doc_id % 3 = 0), " +
        "und AS MATERIALIZED (SELECT DISTINCT src, dst FROM (" +
        "SELECT src, dst FROM e0 WHERE src <> dst " +
        "UNION ALL SELECT dst, src FROM e0 WHERE src <> dst)), " +
        "deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d " +
        "FROM und GROUP BY 1), " +
        "wl AS MATERIALIZED (SELECT deg.node, deg.d, " +
        "COALESCE(l.lbl, deg.node) AS lbl FROM deg LEFT JOIN " +
        "(SELECT doc_id AS node, floor(doc_id / 64) AS lbl " +
        "FROM documents) l USING (node)), " +
        "dc AS (SELECT lbl, CAST(sum(d) AS BIGINT) AS dc FROM wl " +
        "GROUP BY 1), " +
        "m2 AS (SELECT CAST(count(*) AS DOUBLE) AS m2 FROM und), " +
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM wl), " +
        "intra AS (SELECT w1.lbl, CAST(count(*) AS BIGINT) AS i " +
        "FROM und JOIN wl w1 ON und.src = w1.node " +
        "JOIN wl w2 ON und.dst = w2.node " +
        "WHERE w1.lbl = w2.lbl GROUP BY 1), " +
        "q AS (SELECT dc.lbl, COALESCE(intra.i, 0) / m2.m2 - " +
        "(dc.dc / m2.m2) * (dc.dc / m2.m2) AS q " +
        "FROM dc LEFT JOIN intra USING (lbl), m2) " +
        "SELECT nn.n AS n_nodes, CAST(m2.m2 / 2 AS BIGINT) AS n_edges, " +
        "CAST(count(*) AS BIGINT) AS n_communities, " +
        "round(sum(q.q), 6) AS modularity FROM q, nn, m2 " +
        "GROUP BY 1, 2"),

    // Degree assortativity: endpoint-degree Pearson over both
    // orientations, integer moments — same op order as the operator.
    "q315_assortativity" ->
      ("WITH mn AS (SELECT CAST(count(*) AS BIGINT) AS n " +
        "FROM documents), " +
        "e0 AS (SELECT doc_id AS src, (doc_id + 1) % mn.n AS dst " +
        "FROM documents, mn " +
        "UNION ALL SELECT doc_id, (doc_id + 7) % mn.n FROM documents, " +
        "mn WHERE doc_id % 2 = 0 " +
        "UNION ALL SELECT doc_id, (doc_id + 101) % mn.n FROM documents, " +
        "mn WHERE doc_id % 3 = 0), " +
        "und AS MATERIALIZED (SELECT DISTINCT src, dst FROM (" +
        "SELECT src, dst FROM e0 WHERE src <> dst " +
        "UNION ALL SELECT dst, src FROM e0 WHERE src <> dst)), " +
        "deg AS MATERIALIZED (SELECT src AS node, " +
        "CAST(count(*) AS BIGINT) AS d FROM und GROUP BY 1), " +
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg), " +
        "p AS (SELECT CAST(dx.d AS DOUBLE) AS x, " +
        "CAST(dy.d AS DOUBLE) AS y FROM und " +
        "JOIN deg dx ON und.src = dx.node " +
        "JOIN deg dy ON und.dst = dy.node), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS cnt, sum(x) AS sx, " +
        "sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx, " +
        "sum(y * y) AS syy FROM p), " +
        "v AS (SELECT *, sxx / cnt - (sx / cnt) * (sx / cnt) AS vx, " +
        "syy / cnt - (sy / cnt) * (sy / cnt) AS vy, " +
        "sxy / cnt - (sx / cnt) * (sy / cnt) AS cov FROM m) " +
        "SELECT nn.n AS n_nodes, CAST(cnt / 2 AS BIGINT) AS n_edges, " +
        "round(CASE WHEN vx > 0.0 AND vy > 0.0 THEN " +
        "cov / sqrt(vx * vy) END, 6) AS assortativity FROM v, nn"),

    // Reciprocity: flip-join semi count over deduped directed edges;
    // the planted construction makes the answer exactly 2/3.
    "q316_reciprocity" ->
      ("WITH mn AS (SELECT CAST(count(*) AS BIGINT) AS n " +
        "FROM documents), " +
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (" +
        "SELECT doc_id AS src, (doc_id + 1) % mn.n AS dst " +
        "FROM documents, mn " +
        "UNION ALL SELECT (doc_id + 1) % mn.n, doc_id FROM documents, " +
        "mn WHERE doc_id % 2 = 0) WHERE src <> dst), " +
        "r AS (SELECT CAST(count(*) AS BIGINT) AS rec FROM e " +
        "WHERE EXISTS (SELECT 1 FROM e e2 " +
        "WHERE e2.src = e.dst AND e2.dst = e.src)), " +
        "t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e) " +
        "SELECT t.n AS n_edges, r.rec AS n_reciprocal, " +
        "round(r.rec / CAST(t.n AS DOUBLE), 6) AS reciprocity FROM t, r"),

    // Intra-doc paragraph dedup: first-occurrence index filter replayed
    // with list_position (1-based, like the lambda's i).
    "q305_dedupe_paragraphs" ->
      ("WITH d AS (SELECT doc_id, COALESCE(text, '') || chr(10) || " +
        "'-- footer --' || chr(10) || COALESCE(text, '') || chr(10) || " +
        "'-- footer --' AS body FROM documents), " +
        "p AS (SELECT doc_id, string_split(body, chr(10)) AS parts " +
        "FROM d), " +
        "k AS (SELECT doc_id, parts, list_filter(parts, " +
        "(x, i) -> list_position(parts, x) = i) AS kept FROM p) " +
        "SELECT doc_id, CAST(len(parts) AS BIGINT) AS n_units, " +
        "CAST(len(parts) - len(kept) AS BIGINT) AS n_dropped, " +
        "md5(array_to_string(kept, chr(10))) AS fp FROM k " +
        "ORDER BY doc_id"),

    // EB shrinkage: per-group moments, the G-row rollup and the
    // precision-weighted blend, same op order.
    "q299_eb_shrink" ->
      ("WITH per AS (SELECT doc_id % 251 AS g, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "avg(CAST(n_chars AS DOUBLE)) AS mean, " +
        "var_samp(CAST(n_chars AS DOUBLE)) / CAST(count(*) AS DOUBLE) " +
        "AS se2 FROM documents GROUP BY 1), " +
        "roll AS (SELECT avg(mean) AS center, var_samp(mean) AS vb, " +
        "avg(se2) AS mse2 FROM per), " +
        "f AS (SELECT per.*, center, " +
        "greatest(0.0, vb - mse2) AS tau2 FROM per, roll), " +
        "s AS (SELECT g, n, mean, se2, center, " +
        "CASE WHEN se2 IS NULL OR tau2 + se2 = 0.0 THEN 0.0 " +
        "ELSE tau2 / (tau2 + se2) END " +
        "AS w FROM f) " +
        "SELECT g, n, round(mean, 6) AS mean, round(se2, 6) AS se2, " +
        "round(w * mean + (1.0 - w) * center, 6) AS shrunk_mean, " +
        "round(w, 6) AS shrink_weight FROM s ORDER BY g"),

    // Krippendorff alpha: per-item disagreement + marginal closed forms,
    // single-rating items dropped before BOTH rollups.
    "q296_krippendorff" ->
      ("WITH d AS (SELECT doc_id, lang FROM documents), " +
        "rt AS (SELECT doc_id, lang AS label FROM d " +
        "UNION ALL SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 'zz' " +
        "ELSE lang END FROM d " +
        "UNION ALL SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN 'yy' " +
        "ELSE lang END FROM d), " +
        "rc AS (SELECT doc_id AS u, label AS c, count(*) AS r FROM rt " +
        "GROUP BY 1, 2), " +
        "pi AS (SELECT u, CAST(sum(r) AS BIGINT) AS m, " +
        "CAST(sum(r * r) AS BIGINT) AS r2 FROM rc GROUP BY 1), " +
        "agg AS (SELECT CAST(count(*) AS BIGINT) AS n_items, " +
        "CAST(sum(m) AS BIGINT) AS n_ratings, " +
        "sum((CAST(m AS DOUBLE) * m - r2) / (CAST(m AS DOUBLE) - 1.0)) " +
        "AS dnum FROM pi WHERE m >= 2), " +
        "marg AS (SELECT CAST(sum(nc) AS BIGINT) AS n, " +
        "sum(CAST(nc AS DOUBLE) * nc) AS nc2 FROM " +
        "(SELECT rc.c, CAST(sum(rc.r) AS BIGINT) AS nc FROM rc " +
        "JOIN pi ON rc.u = pi.u WHERE pi.m >= 2 GROUP BY 1)), " +
        "fin AS (SELECT n_items, n_ratings, " +
        "dnum / CAST(n AS DOUBLE) AS d_o, " +
        "(CAST(n AS DOUBLE) * n - nc2) / " +
        "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS d_e " +
        "FROM agg, marg) " +
        "SELECT n_items, n_ratings, round(d_o, 6) AS d_o, " +
        "round(d_e, 6) AS d_e, " +
        "round(CASE WHEN d_e > 0.0 THEN 1.0 - d_o / d_e ELSE 1.0 END, 6) " +
        "AS alpha FROM fin"),

    // Nelson–Aalen: q198's subjects and risk sets; hazard and variance
    // running sums, same casts and op order as the operator.
    "q292_nelson_aalen" ->
      ("WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) " +
        "AS BIGINT) AS t FROM events), " +
        "h AS (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS hmax " +
        "FROM events), " +
        "g AS (SELECT t, lead(t) OVER (PARTITION BY user_id " +
        "ORDER BY t, event_id) AS nxt FROM e), " +
        "s AS (SELECT floor((COALESCE(nxt, hmax) - t) / 600) AS d, " +
        "CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev FROM g, h), " +
        "per AS (SELECT d AS t, CAST(sum(ev) AS BIGINT) AS n_events, " +
        "CAST(sum(1 - ev) AS BIGINT) AS n_censored FROM s GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(n_events + n_censored) AS BIGINT) " +
        "AS total FROM per), " +
        "rk AS (SELECT t, n_events, n_censored, " +
        "CAST(total - sum(n_events + n_censored) OVER (ORDER BY t) " +
        "+ n_events + n_censored AS BIGINT) AS n_at_risk FROM per, tot), " +
        "hz AS (SELECT *, " +
        "sum(CAST(n_events AS DOUBLE) / CAST(n_at_risk AS DOUBLE)) " +
        "OVER (ORDER BY t) AS cumhaz, " +
        "sum(CAST(n_events AS DOUBLE) / (CAST(n_at_risk AS DOUBLE) * " +
        "CAST(n_at_risk AS DOUBLE))) OVER (ORDER BY t) AS cv FROM rk) " +
        "SELECT CAST(t AS BIGINT) AS t, n_at_risk, n_events, n_censored, " +
        "round(cumhaz, 6) AS cumhaz, round(sqrt(cv), 6) AS se_cumhaz " +
        "FROM hz WHERE n_events > 0 ORDER BY t"),

    // Cohort LTV: first-event cohort weeks, (cohort, offset) cells, the
    // per-cohort running value sum and per-user LTV.
    "q293_cohort_ltv" ->
      ("WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) " +
        "AS ep, value FROM events), " +
        "m0 AS (SELECT min(ep) AS m0 FROM e), " +
        "f AS (SELECT user_id, min(ep) AS fep FROM e GROUP BY 1), " +
        "sz AS (SELECT floor((fep - m0) / 604800) AS cohort_week, " +
        "CAST(count(*) AS BIGINT) AS cohort_size FROM f, m0 GROUP BY 1), " +
        "cells AS (SELECT floor((f.fep - m0) / 604800) AS cohort_week, " +
        "floor((e.ep - f.fep) / 604800) AS week_offset, " +
        "CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active, " +
        "sum(e.value) AS value " +
        "FROM e JOIN f USING (user_id) CROSS JOIN m0 GROUP BY 1, 2), " +
        "w AS (SELECT c.*, sz.cohort_size, sum(value) OVER " +
        "(PARTITION BY c.cohort_week ORDER BY week_offset) AS cum_value " +
        "FROM cells c JOIN sz USING (cohort_week)) " +
        "SELECT CAST(cohort_week AS BIGINT) AS cohort_week, " +
        "CAST(week_offset AS BIGINT) AS week_offset, cohort_size, " +
        "n_active, round(value, 4) AS value, " +
        "round(cum_value, 4) AS cum_value, " +
        "round(cum_value / CAST(cohort_size AS DOUBLE), 6) " +
        "AS ltv_per_user FROM w ORDER BY 1, 2"),

    // RFM: per-user rollup, three quantile_cont threshold lists, bucket
    // = count of thresholds strictly below (the q113 convention), scores
    // oriented higher-is-better, segment as the concatenated code.
    "q294_rfm" ->
      ("WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) " +
        "AS ep, value FROM events), " +
        "nw AS (SELECT max(ep) AS nowep FROM e), " +
        "pu AS (SELECT user_id, max(ep) AS lastep, " +
        "CAST(count(*) AS BIGINT) AS frequency, sum(value) AS monetary " +
        "FROM e GROUP BY 1), " +
        "per AS (SELECT user_id, floor((nowep - lastep) / 86400) " +
        "AS recency_days, frequency, monetary FROM pu, nw), " +
        "th AS (SELECT " +
        "quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rt, " +
        "quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS ft, " +
        "quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mt FROM per), " +
        "s AS (SELECT user_id, recency_days, frequency, monetary, " +
        "5 - CAST(len(list_filter(th.rt, x -> recency_days > x)) " +
        "AS INTEGER) AS r_score, " +
        "CAST(len(list_filter(th.ft, x -> frequency > x)) AS INTEGER) " +
        "+ 1 AS f_score, " +
        "CAST(len(list_filter(th.mt, x -> monetary > x)) AS INTEGER) " +
        "+ 1 AS m_score FROM per, th) " +
        "SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days, " +
        "frequency, round(monetary, 4) AS monetary, r_score, f_score, " +
        "m_score, CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) " +
        "|| CAST(m_score AS VARCHAR) AS segment FROM s ORDER BY user_id"),

    "q91_asof_forward" ->
      ("WITH clicks AS (SELECT event_id AS click_id, user_id, ts FROM events " +
        "WHERE event_type = 'click'), " +
        "views AS (SELECT user_id, ts AS vts, max(event_id) AS view_id " +
        "FROM events WHERE event_type = 'view' GROUP BY user_id, ts) " +
        "SELECT c.click_id, c.user_id, v.view_id, " +
        "date_diff('second', c.ts, v.vts) AS lead_sec " +
        "FROM clicks c ASOF JOIN views v " +
        "ON c.user_id = v.user_id AND c.ts <= v.vts"),

    "q92_html_strip" ->
      ("WITH h AS (SELECT doc_id, '<html><body onload=\"f()\"><h1>' || source || " +
        "'</h1> <p class=\"a\">' || text || " +
        "'</p><script>var x = 1 < 2;</script> &lt;tail&gt; &amp;amp;' AS html " +
        "FROM documents), " +
        "s1 AS (SELECT doc_id, regexp_replace(html, " +
        "'(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS t FROM h), " +
        "s2 AS (SELECT doc_id, regexp_replace(t, '(?s)<[^>]+>', ' ', 'g') AS t FROM s1), " +
        "s3 AS (SELECT doc_id, replace(replace(replace(replace(replace(t, " +
        "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''), '&amp;', '&') AS t " +
        "FROM s2), " +
        "s4 AS (SELECT doc_id, trim(regexp_replace(t, '\\s+', ' ', 'g')) AS clean FROM s3) " +
        "SELECT doc_id, CAST(length(clean) AS BIGINT) AS n_chars, md5(clean) AS clean_hash " +
        "FROM s4"),

    "q93_expanding_cv" ->
      ("WITH ev AS (SELECT date_trunc('second', ts) AS ts FROM events), " +
        "per_ts AS (SELECT ts, count(*) AS n FROM ev GROUP BY ts), " +
        "tiled AS (SELECT ts, n, ntile(5) OVER (ORDER BY ts) AS tile FROM per_ts), " +
        "per_tile AS (SELECT tile, sum(n) AS rows_, max(ts) AS end_ts " +
        "FROM tiled GROUP BY tile), " +
        "folds AS (SELECT tile, " +
        "sum(rows_) OVER (ORDER BY tile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS train_rows, " +
        "lead(rows_, 1) OVER (ORDER BY tile) AS test_rows, end_ts FROM per_tile) " +
        "SELECT CAST(tile AS BIGINT) AS fold, CAST(train_rows AS BIGINT) AS train_rows, " +
        "CAST(test_rows AS BIGINT) AS test_rows, " +
        "CAST(floor(epoch(end_ts)) AS BIGINT) AS train_end_s FROM folds WHERE tile <= 4"),

    "q102b_bpe_train_exact" ->
      ("WITH words AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM (" +
        "SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), " +
        "x -> x <> '')) AS w FROM documents) GROUP BY w " +
        "ORDER BY c DESC, w LIMIT 100000), " +
        "v0 AS (SELECT array_to_string(string_split(w, ''), chr(31)) AS s, c FROM words), " +
        (1 to 5).map(bpeStage).mkString(", ") + " " +
        (1 to 5).map(i => s"SELECT CAST(${i - 1} AS BIGINT) AS rank, " +
          s"""l AS "left", r AS "right", l || r AS merged FROM m$i""")
          .mkString(" UNION ALL ")),

    "q103b_bpe_segment_exact" ->
      ("WITH s0 AS (SELECT doc_id, array_to_string([" +
        "array_to_string(string_split(w, ''), chr(31)) for w in " +
        "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')" +
        "], chr(30)) AS s FROM documents), " +
        "seg AS (SELECT doc_id, " +
        bpeApply(Seq("e" -> "r", "i" -> "n", "t" -> "h", "th" -> "e",
          "o" -> "n", "a" -> "n", "an" -> "d", "er" -> "s")) +
        " AS s FROM s0) " +
        "SELECT doc_id, CAST(CASE WHEN s = '' THEN 0 ELSE " +
        "len(string_split(replace(s, chr(30), chr(31)), chr(31))) END AS BIGINT) " +
        "AS n_subwords, " +
        "md5(replace(replace(s, chr(30), ' '), chr(31), ' ')) AS seg_hash FROM seg"),

    // Trained-BPE compression audit: the q103b segmentation replay (s0 →
    // chained replace) grouped per source, with quantile_cont matching
    // Spark's exact percentile and the same null-ratio/zero-token guards.
    "q330_bpe_compression" ->
      ("WITH s0 AS (SELECT source, CAST(strlen(text) AS BIGINT) AS b, " +
        "array_to_string([" +
        "array_to_string(string_split(w, ''), chr(31)) for w in " +
        "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')" +
        "], chr(30)) AS s FROM documents), " +
        "seg AS (SELECT source, b, " +
        bpeApply(Seq("e" -> "r", "i" -> "n", "t" -> "h", "th" -> "e",
          "o" -> "n", "a" -> "n", "an" -> "d", "er" -> "s")) +
        " AS s FROM s0), " +
        "cnt AS (SELECT source, b, CAST(CASE WHEN s = '' THEN 0 ELSE " +
        "len(string_split(replace(s, chr(30), chr(31)), chr(31))) END " +
        "AS BIGINT) AS t FROM seg), " +
        "r AS (SELECT source, b, t, CASE WHEN t > 0 THEN " +
        "CAST(b AS DOUBLE) / t END AS r FROM cnt) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(b) AS BIGINT) AS n_bytes, " +
        "CAST(sum(t) AS BIGINT) AS n_tokens, " +
        "CASE WHEN sum(t) > 0 THEN " +
        "round(CAST(sum(b) AS DOUBLE) / sum(t), 6) END AS bytes_per_token, " +
        "round(quantile_cont(r, 0.5), 6) AS p50_doc_bpt, " +
        "round(quantile_cont(r, 0.95), 6) AS p95_doc_bpt " +
        "FROM r GROUP BY 1 ORDER BY source"),

    "q94_token_chunks" ->
      ("WITH tk AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
        "x -> x <> '') AS toks FROM documents), " +
        "n AS (SELECT doc_id, toks, len(toks) AS nt FROM tk), " +
        "c AS (SELECT doc_id, toks, nt, GREATEST(1, " +
        "CAST(ceil((nt - 16) / 48.0) AS INTEGER)) AS nc FROM n), " +
        "e AS (SELECT doc_id, toks, nt, unnest(generate_series(0, nc - 1)) AS ci FROM c), " +
        "s AS (SELECT doc_id, ci, toks[ci * 48 + 1 : LEAST(ci * 48 + 64, nt)] AS chunk " +
        "FROM e) " +
        "SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx, " +
        "CAST(len(chunk) AS BIGINT) AS n_tokens, " +
        "md5(array_to_string(chunk, ' ')) AS chunk_hash FROM s"),

    "q47_salted_join" ->
      ("SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total_price " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1"),

    "q48_json_extract" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
        "CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k " +
        "FROM events GROUP BY 1"),

    // Exact chunk-dedup truth: DuckDB replays the token-windowed MD5 cut
    // rule (cut after token j iff the first md5 nibble of the last-4-token
    // window has low 2 bits zero, or j ends the doc), fingerprints the
    // spans between cuts, and re-counts shared chunks per doc pair under
    // the same >1 / <=64 bucket bound.
    // Group-level MD5 minhash union: coordinate i = lexicographic min of
    // md5(i:shingle) over the UNION of a source's doc shingle sets (the
    // q36b hash family lifted to groups — min over the exploded multiset
    // equals min over the union), then pairwise agreement / numHashes.
    "q49_source_similarity" ->
      ("WITH toks AS (SELECT source, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "sh2 AS (SELECT source, list_distinct([array_to_string(t[i:i+2], ' ') " +
        "for i in range(1, len(t) - 1)]) AS s FROM toks WHERE len(t) >= 3), " +
        "e AS (SELECT source, unnest(s) AS sh FROM sh2), " +
        "sg AS (SELECT source, [" +
        (0 until 16).map(i => s"min(md5('$i:' || sh))").mkString(", ") +
        "] AS g FROM e GROUP BY source) " +
        "SELECT a.source AS group_a, b.source AS group_b, " +
        "round(CAST(list_sum(list_transform(range(1, 17), i -> " +
        "CASE WHEN a.g[CAST(i AS INTEGER)] = b.g[CAST(i AS INTEGER)] " +
        "THEN 1 ELSE 0 END)) AS DOUBLE) / 16, 4) AS est_jaccard " +
        "FROM sg a JOIN sg b ON a.source < b.source"),

    // Byte-rolling CDC replay: the production chunker cuts where the low 6
    // bits of a window-16 Rabin-Karp hash (base 1000003, Long wrap) are
    // zero. 64 divides 2^64, so h mod 64 has the closed form
    // sum(cu[j-k] * 3^k mod 64, k = 0..15) — the coefficient list below is
    // 3^k mod 64 (base 1000003 ≡ 3, window power 3^15 ≡ 43). Chunks are
    // the text slices between cuts (+ the tail), fingerprinted here by
    // md5 (the engine uses xxhash64 — fingerprints never reach the
    // output, only shared-chunk COUNTS, so any injective-on-corpus
    // fingerprint replays them); bucket/pair counting replays q50b.
    "q50_chunk_dedup" ->
      ("WITH cs AS (SELECT doc_id, text, " +
        "list_transform(split(text, ''), c -> unicode(c)) AS cu FROM documents), " +
        "ct AS (SELECT doc_id, text, [CAST(j AS INTEGER) " +
        "for j in range(16, len(cu) + 1) " +
        "if list_sum(list_transform(range(0, 16), k -> " +
        "cu[CAST(j - k AS INTEGER)] * " +
        "[1,3,9,27,17,51,25,11,33,35,41,59,49,19,57,43][CAST(k + 1 AS INTEGER)]" +
        ")) % 64 = 0] AS rc FROM cs), " +
        "cc AS (SELECT doc_id, text, CASE WHEN len(rc) = 0 " +
        "OR rc[len(rc)] < length(text) " +
        "THEN list_append(rc, length(text)) ELSE rc END AS c FROM ct), " +
        "ch AS (SELECT doc_id, list_distinct([md5(substr(text, " +
        "CASE WHEN k = 1 THEN 1 ELSE c[CAST(k - 1 AS INTEGER)] + 1 END, " +
        "c[CAST(k AS INTEGER)] - " +
        "(CASE WHEN k = 1 THEN 0 ELSE c[CAST(k - 1 AS INTEGER)] END))) " +
        "for k in range(1, len(c) + 1)]) AS chunks FROM cc), " +
        "e AS (SELECT doc_id, unnest(chunks) AS chunk FROM ch), " +
        "sb AS (SELECT chunk FROM e GROUP BY 1 " +
        "HAVING count(*) > 1 AND count(*) <= 64), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM e a " +
        "JOIN e b ON a.chunk = b.chunk AND a.doc_id < b.doc_id " +
        "JOIN sb ON a.chunk = sb.chunk) " +
        "SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_shared_chunks " +
        "FROM p GROUP BY 1, 2"),

    "q50b_chunk_dedup_exact" ->
      ("WITH tk AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents " +
        "WHERE length(trim(text)) > 0), " +
        "ct AS (SELECT doc_id, t, [CAST(j AS INTEGER) for j in range(1, len(t) + 1) " +
        "if ((strpos('0123456789abcdef', substr(md5(array_to_string(" +
        "t[greatest(1, CAST(j AS INTEGER) - 3):CAST(j AS INTEGER)], ' ')), 1, 1)) - 1) & 3) = 0 " +
        "OR j = len(t)] AS c FROM tk), " +
        "ch AS (SELECT doc_id, list_distinct([md5(array_to_string(" +
        "t[(CASE WHEN k = 1 THEN 1 ELSE c[CAST(k AS INTEGER) - 1] + 1 END):c[CAST(k AS INTEGER)]], ' ')) " +
        "for k in range(1, len(c) + 1)]) AS chunks FROM ct), " +
        "e AS (SELECT doc_id, unnest(chunks) AS chunk FROM ch), " +
        "sb AS (SELECT chunk FROM e GROUP BY 1 " +
        "HAVING count(*) > 1 AND count(*) <= 64), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM e a " +
        "JOIN e b ON a.chunk = b.chunk AND a.doc_id < b.doc_id " +
        "JOIN sb ON a.chunk = sb.chunk) " +
        "SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_shared_chunks " +
        "FROM p GROUP BY 1, 2"),

    "q51_percentiles" ->
      ("SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) AS p50, " +
        "round(quantile_cont(l_extendedprice, 0.95), 4) AS p95, count(*) AS n " +
        "FROM lineitem GROUP BY 1"),

    "q80_collect_agg" ->
      ("SELECT l_returnflag, array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses, " +
        "count(*) AS n_rows, count(DISTINCT l_suppkey) AS n_supp " +
        "FROM lineitem GROUP BY 1"),

    "q52_string_funcs" ->
      ("SELECT p_partkey, upper(p_brand) AS brand_u, substring(p_name, 1, 8) AS name8, " +
        "concat_ws('|', p_brand, p_type) AS bt, " +
        "regexp_extract(p_name, '^([a-z]+)', 1) AS first_word, " +
        "CAST(length(p_name) AS BIGINT) AS name_len FROM part"),

    "q53_null_handling" ->
      ("SELECT o_orderkey, coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2, " +
        "CAST(CASE WHEN nullif(o_orderpriority, o_orderpriority) IS NULL " +
        "THEN 1 ELSE 0 END AS BIGINT) AS always_one FROM orders"),

    "q54_window_lag_ntile" ->
      ("SELECT o_custkey, o_orderkey, round(lag(o_totalprice, 1) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price, " +
        "CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) " +
        "AS BIGINT) AS tile FROM orders"),

    "q55_pivot" ->
      ("SELECT l_returnflag, " +
        "CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS \"F\", " +
        "CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS \"O\" " +
        "FROM lineitem GROUP BY 1"),

    "q56_posexplode" ->
      ("SELECT vec_id, CAST(unnest(range(1, len(embedding) + 1)) AS BIGINT) AS pos, " +
        "round(CAST(unnest(embedding) AS DOUBLE), 6) AS xr " +
        "FROM embeddings WHERE vec_id <= 3"),

    "q42_binary_meta" ->
      ("SELECT CAST(doc_id AS BIGINT) AS media_id, 'image' AS modality, " +
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents"),

    "q57_range_join" ->
      ("WITH bands AS (SELECT CAST(i AS BIGINT) AS band_id, i * 50.0 AS lo, " +
        "(i + 1) * 50.0 AS hi FROM range(0, 10) t(i)) " +
        "SELECT band_id, count(*) AS n, round(sum(value), 2) AS total_value " +
        "FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi " +
        "GROUP BY 1"),

    "q58_scd2" ->
      ("WITH o AS (SELECT user_id, event_id, ts, event_type, " +
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev " +
        "FROM events), " +
        "c AS (SELECT user_id, event_id, ts, event_type FROM o " +
        "WHERE prev IS NULL OR prev <> event_type) " +
        "SELECT user_id, event_type, " +
        "CAST(date_trunc('second', ts) AS TIMESTAMP) AS valid_from, " +
        "CAST(date_trunc('second', lead(ts) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id)) AS TIMESTAMP) AS valid_to, " +
        "(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) " +
        "AS is_current FROM c"),

    "q59_grouping_sets" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n, " +
        "round(sum(l_quantity), 2) AS sum_qty FROM lineitem " +
        "GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())"),

    "q60_array_funcs" ->
      ("WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) " +
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks, " +
        "CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq, " +
        "list_contains(toks, 'spark') AS has_spark, " +
        "list_sort(toks)[1] AS first_tok FROM d"),

    "q61_date_arith" ->
      ("SELECT o_orderkey, " +
        "CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month, " +
        "last_day(CAST(o_orderdate AS DATE)) AS month_end, " +
        // DATE + integer (day add) — NOT "+ INTERVAL 30 DAY": DuckDB 1.0's
        // subexpression elimination wrongly merges two `date + INTERVAL`
        // terms with different constants, so plus30 would inherit 1 MONTH.
        "CAST(o_orderdate AS DATE) + 30 AS plus30, " +
        "CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') " +
        "AS BIGINT) AS days_to_98 FROM orders"),

    "q62_unixtime" ->
      ("SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, " +
        "strftime(to_timestamp(floor(epoch(ts))), '%Y-%m-%d %H:%M:%S') AS ts_str " +
        "FROM events"),

    "q63_tfidf" ->
      ("WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term " +
        "FROM documents), " +
        "t2 AS (SELECT doc_id, term FROM terms WHERE length(term) > 0), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM t2 GROUP BY 1, 2), " +
        "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t2 GROUP BY 1), " +
        "n AS (SELECT count(*) AS n_docs FROM documents), " +
        "scored AS (SELECT doc_id, term, " +
        "round(tf * ln((n_docs + 1) / (df + 1.0)), 6) AS tfidf " +
        "FROM tf JOIN df USING (term) CROSS JOIN n), " +
        "r AS (SELECT doc_id, term, tfidf, row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn FROM scored) " +
        "SELECT doc_id, term AS top_term, tfidf FROM r WHERE rn = 1"),

    "q64_hash_split" ->
      ("WITH s AS (SELECT source, CASE WHEN doc_id % 100 < 80 THEN 'train' " +
        "WHEN doc_id % 100 < 90 THEN 'val' ELSE 'test' END AS split, n_chars " +
        "FROM documents) " +
        "SELECT source, split, count(*) AS n, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM s GROUP BY 1, 2"),

    "q67_data_quality" ->
      ("SELECT 'o_orderkey_not_null' AS check_name, CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_failed " +
        "FROM orders " +
        "UNION ALL SELECT 'o_totalprice_in_range', CAST(count(*) AS BIGINT), " +
        "CAST(sum(CASE WHEN o_totalprice BETWEEN 0.0 AND 100000.0 THEN 0 ELSE 1 END) " +
        "AS BIGINT) FROM orders " +
        "UNION ALL SELECT 'o_orderstatus_in_set', CAST(count(*) AS BIGINT), " +
        "CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1 END) " +
        "AS BIGINT) FROM orders"),

    "q68_hash_sample" ->
      ("SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM documents WHERE doc_id % 100 < 10 GROUP BY 1"),

    "q69_auto_range_join" ->
      ("WITH bands AS (SELECT CAST(i AS BIGINT) AS band_id, i * 50.0 AS lo, " +
        "(i + 1) * 50.0 AS hi FROM range(0, 10) t(i)) " +
        "SELECT band_id, count(*) AS n, round(sum(value), 2) AS total_value " +
        "FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi " +
        "GROUP BY 1"),

    "q70_histogram" ->
      ("SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket, " +
        "count(*) AS n FROM lineitem GROUP BY 1"),

    "q71_corr" ->
      ("SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6) " +
        "AS qty_price_corr, round(covar_samp(l_quantity, l_discount), 6) " +
        "AS qty_disc_covar, count(*) AS n FROM lineitem GROUP BY 1"),

    "q72_pii_redact" ->
      ("SELECT doc_id, " +
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        "concat_ws(' ', text, concat(source, '@example.com'), " +
        "'call 555-123-4567 or 555.987.6543'), " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
        "'\\b\\d(?:[ -]?\\d){12,15}\\b', '<CARD>', 'g'), " +
        "'\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'), " +
        "'(?:\\+?1[ .-]?)?(?:\\(\\d{3}\\)|\\d{3})[ .-]?\\d{3}[ .-]?\\d{4}\\b', " +
        "'<PHONE>', 'g') AS clean_text " +
        "FROM documents"),

    "q73_skew_report" ->
      ("WITH c AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1), " +
        "t AS (SELECT sum(n) AS tot FROM c) " +
        "SELECT l_suppkey, n, round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) " +
        "AS share FROM c CROSS JOIN t ORDER BY n DESC, l_suppkey LIMIT 10"),

    "q74_kfold" ->
      ("SELECT CAST(doc_id % 5 AS INTEGER) AS fold, count(*) AS n, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents GROUP BY 1"),

    "q75_jaccard_exact" ->
      // string_split_regex, not string_split(' '): Spark's shingle
      // tokenizer splits on \s+, and a fixture with a double space or
      // newline would silently diverge on a plain single-space split
      ("WITH toks AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents WHERE doc_id < 50), " +
        "sh AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') " +
        "for i in range(1, len(t) - 1)]) AS s FROM toks) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / " +
        "CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 4) AS jaccard " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
        "ORDER BY jaccard DESC, id_a, id_b LIMIT 20"),

    "q78_contamination" ->
      ("WITH ttoks AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents " +
        "WHERE doc_id >= 100), " +
        "tsh AS (SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ') " +
        "for i in range(1, len(t) - 1)])) AS sh FROM ttoks WHERE len(t) >= 3), " +
        "etoks AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents " +
        "WHERE doc_id < 20), " +
        "esh AS (SELECT DISTINCT unnest(list_distinct([array_to_string(t[i:i+2], ' ') " +
        "for i in range(1, len(t) - 1)])) AS sh FROM etoks WHERE len(t) >= 3) " +
        "SELECT doc_id, count(*) AS n_shared FROM tsh " +
        "WHERE sh IN (SELECT sh FROM esh) GROUP BY 1 HAVING count(*) >= 1"),

    "q79_pack_budget" ->
      ("WITH d AS (SELECT doc_id, lang, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens " +
        "FROM documents), " +
        "p AS (SELECT lang, n_tokens, " +
        "CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 500) " +
        "AS BIGINT) AS pack_id FROM d) " +
        "SELECT lang, pack_id, count(*) AS n_docs, " +
        "CAST(sum(n_tokens) AS BIGINT) AS sum_tokens FROM p GROUP BY 1, 2"),

    "q81_range_frame" ->
      ("SELECT user_id, event_id, round(sum(value) OVER " +
        "(PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) " +
        "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS rolling_1h " +
        "FROM events"),

    "q82_rank_family" ->
      ("SELECT event_type, event_id, " +
        "round(percent_rank() OVER w, 6) AS pr, " +
        "round(cume_dist() OVER w, 6) AS cd, " +
        "CAST(dense_rank() OVER w AS BIGINT) AS dr " +
        "FROM events WINDOW w AS " +
        "(PARTITION BY event_type ORDER BY value, event_id)"),

    // the bloom sketch is value-transparent: the oracle is the plain
    // anti-join of the re-crawl batch against the standing corpus
    "q83_bloom_increment" ->
      ("WITH corpus AS (SELECT DISTINCT md5(text) AS fp FROM documents " +
        "WHERE doc_id < 400), " +
        "batch AS (SELECT doc_id, md5(text) AS fp FROM documents " +
        "WHERE doc_id >= 450 OR doc_id < 30) " +
        "SELECT b.doc_id, b.fp FROM batch b ANTI JOIN corpus c ON b.fp = c.fp " +
        "ORDER BY b.doc_id"),

    "q84_embedding_dedup" ->
      (s"WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings " +
        "WHERE vec_id < 150), " +
        "p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id " +
        s"WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.30), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM p " +
        "UNION ALL SELECT id_b, id_a FROM p), " +
        "reach AS (SELECT a AS src, b AS dst FROM edges " +
        "UNION SELECT r.src, e2.b FROM reach r JOIN edges e2 ON r.dst = e2.a) " +
        "SELECT vec_id FROM e WHERE vec_id NOT IN " +
        "(SELECT src FROM reach GROUP BY src HAVING min(dst) < src) " +
        "ORDER BY vec_id"),

    "q85_stratified_sample" ->
      ("WITH c AS (SELECT doc_id, lang, " +
        "row_number() OVER (PARTITION BY lang " +
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn, " +
        "count(*) OVER (PARTITION BY lang) AS cnt FROM documents) " +
        "SELECT doc_id, lang FROM c WHERE rn <= ceil(0.2 * cnt) " +
        "ORDER BY doc_id"),

    "q86_source_jaccard_exact" ->
      ("WITH toks AS (SELECT source, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "sh AS (SELECT DISTINCT source, s FROM (SELECT source, " +
        "unnest(list_distinct([array_to_string(t[i:i+2], ' ') " +
        "for i in range(1, len(t) - 1)])) AS s FROM toks WHERE len(t) >= 3)), " +
        "sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY 1), " +
        "shared AS (SELECT a.source AS group_a, b.source AS group_b, " +
        "count(*) AS i FROM sh a JOIN sh b ON a.s = b.s " +
        "AND a.source < b.source GROUP BY 1, 2) " +
        "SELECT group_a, group_b, round(CAST(i AS DOUBLE) / " +
        "(sa.n + sb.n - i), 4) AS jaccard FROM shared " +
        "JOIN sizes sa ON group_a = sa.source " +
        "JOIN sizes sb ON group_b = sb.source " +
        "ORDER BY group_a, group_b"),

    "q87_cosine_pairs" ->
      ("WITH e AS (SELECT vec_id, embedding FROM embeddings " +
        "WHERE vec_id < 150), " +
        "s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        s"${cosSql("a.embedding", "b.embedding")} AS cos " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id) " +
        "SELECT id_a, id_b, round(cos, 6) AS cos_r FROM s " +
        "WHERE cos >= 0.30 ORDER BY id_a, id_b"),

    "q88_repetition" ->
      ("WITH toks AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "g AS (SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ') " +
        "for i in range(1, len(t))]) AS g FROM toks WHERE len(t) >= 2), " +
        "per AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2), " +
        "agg AS (SELECT doc_id, sum(c) AS tot, max(c) AS mx, " +
        "count(*) AS nd FROM per GROUP BY 1) " +
        "SELECT doc_id, round(1.0 - CAST(nd AS DOUBLE) / tot, 4) AS dup_frac, " +
        "round(CAST(mx AS DOUBLE) / tot, 4) AS top_frac FROM agg " +
        "ORDER BY doc_id"),

    "q89_unigram_nll" ->
      ("WITH toks AS (SELECT doc_id, " +
        "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok " +
        "FROM documents WHERE length(trim(text)) > 0), " +
        "freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq) " +
        "SELECT doc_id, round(avg(-ln(CAST(c AS DOUBLE) / t)), 4) AS nll, " +
        "CAST(count(*) AS BIGINT) AS n_toks " +
        "FROM toks JOIN freq USING (tok), tot GROUP BY doc_id ORDER BY doc_id"),

    "q90_mixture_weights" ->
      ("WITH d AS (SELECT lang, CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens " +
        "FROM documents), " +
        "a AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM d GROUP BY 1), " +
        "t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot FROM a), " +
        "w AS (SELECT lang, n_tokens, CAST(n_tokens AS DOUBLE) / tot AS ashare, " +
        "CASE lang WHEN 'en' THEN 0.3 WHEN 'de' THEN 0.2 WHEN 'fr' THEN 0.2 " +
        "WHEN 'es' THEN 0.2 WHEN 'zh' THEN 0.1 ELSE 0.0 END AS tshare FROM a, t) " +
        "SELECT lang, n_tokens, round(ashare, 6) AS actual_share, " +
        "round(tshare, 6) AS target_share, round(tshare / ashare, 6) AS weight " +
        "FROM w ORDER BY lang"),

    // Verified transitive chunk dedup: replay the md5 cut rule (q50b) for
    // candidates, verify each candidate pair with the exact overlap
    // coefficient |A∩B| / min(|A|,|B|) over distinct 3-gram shingles, close
    // the verified edges recursively, keep component minima + unpaired docs.
    "q131_chunk_dedup_verified" ->
      ("WITH RECURSIVE tk AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents " +
        "WHERE length(trim(text)) > 0 AND doc_id % 3 = 0), " +
        "ct AS (SELECT doc_id, t, [CAST(j AS INTEGER) for j in range(1, len(t) + 1) " +
        "if ((strpos('0123456789abcdef', substr(md5(array_to_string(" +
        "t[greatest(1, CAST(j AS INTEGER) - 3):CAST(j AS INTEGER)], ' ')), 1, 1)) - 1) & 3) = 0 " +
        "OR j = len(t)] AS c FROM tk), " +
        "ch AS (SELECT doc_id, list_distinct([md5(array_to_string(" +
        "t[(CASE WHEN k = 1 THEN 1 ELSE c[CAST(k AS INTEGER) - 1] + 1 END):c[CAST(k AS INTEGER)]], ' ')) " +
        "for k in range(1, len(c) + 1)]) AS chunks FROM ct), " +
        "e AS (SELECT doc_id, unnest(chunks) AS chunk FROM ch), " +
        "sb AS (SELECT chunk FROM e GROUP BY 1 " +
        "HAVING count(*) > 1 AND count(*) <= 64), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM e a " +
        "JOIN e b ON a.chunk = b.chunk AND a.doc_id < b.doc_id " +
        "JOIN sb ON a.chunk = sb.chunk), " +
        "sh AS (SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ') " +
        "for i in range(1, len(t) - 1)])) AS s FROM tk WHERE len(t) >= 3), " +
        "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), " +
        "shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i " +
        "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "ver AS (SELECT c.id_a, c.id_b FROM cand c " +
        "JOIN shared s ON c.id_a = s.id_a AND c.id_b = s.id_b " +
        "JOIN sizes sa ON c.id_a = sa.doc_id " +
        "JOIN sizes sb2 ON c.id_b = sb2.doc_id " +
        "WHERE CAST(s.i AS DOUBLE) / least(sa.n, sb2.n) >= 0.5), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM ver " +
        "UNION ALL SELECT id_b, id_a FROM ver), " +
        "reach AS (SELECT a AS src, b AS dst FROM edges " +
        "UNION SELECT r.src, e2.b FROM reach r JOIN edges e2 ON r.dst = e2.a) " +
        "SELECT doc_id FROM documents WHERE doc_id % 3 = 0 AND doc_id NOT IN " +
        "(SELECT src FROM reach GROUP BY src HAVING min(dst) < src) " +
        "ORDER BY doc_id"),

    // First-touch funnel: per-stage conditional minima — first view, first
    // click strictly after it, first purchase strictly after that.
    "q134_funnel" ->
      ("WITH v AS (SELECT user_id, min(ts) AS t_view FROM events " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e " +
        "JOIN v ON e.user_id = v.user_id " +
        "WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1), " +
        "p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e " +
        "JOIN c ON e.user_id = c.user_id " +
        "WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1) " +
        "SELECT v.user_id, v.t_view, c.t_click, p.t_purchase FROM v " +
        "LEFT JOIN c ON v.user_id = c.user_id " +
        "LEFT JOIN p ON v.user_id = p.user_id ORDER BY v.user_id"),

    // Weekly retention: cohort = floor-7-day bucket of first activity
    // since the global earliest event; distinct active users per offset.
    // floor(epoch) everywhere: DuckDB epoch() keeps fractional seconds,
    // Spark unix_timestamp truncates — both sides must bucket on the
    // truncated value or a sub-second straddle flips a week boundary
    "q135_retention" ->
      ("WITH e0 AS (SELECT min(CAST(floor(epoch(ts)) AS BIGINT)) AS e0 FROM events), " +
        "f AS (SELECT user_id, CAST(floor((min(CAST(floor(epoch(ts)) AS BIGINT)) - e0) / 604800) AS INTEGER) " +
        "AS cohort FROM events, e0 GROUP BY user_id, e0), " +
        "a AS (SELECT DISTINCT user_id, " +
        "CAST(floor((CAST(floor(epoch(ts)) AS BIGINT) - e0) / 604800) AS INTEGER) AS week " +
        "FROM events, e0) " +
        "SELECT cohort, week - cohort AS k, count(DISTINCT f.user_id) AS n_users " +
        "FROM f JOIN a USING (user_id) " +
        "WHERE week - cohort BETWEEN 0 AND 4 " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),

    // Event-path transitions: lead() over (user, ts, event_id), adjacent
    // type pairs counted corpus-wide.
    "q136_transitions" ->
      ("WITH s AS (SELECT user_id, event_type AS from_type, " +
        "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
        "AS to_type FROM events) " +
        "SELECT from_type, to_type, count(*) AS n_transitions FROM s " +
        "WHERE to_type IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"),

    // Last-touch attribution: per purchase, the latest view/click
    // at-or-before it (ties at one ts resolved by max event_id, matching
    // the Spark side's pre-dedup); inner as-of — untouched purchases drop.
    "q137_attribution" ->
      ("WITH p AS (SELECT user_id, ts, value FROM events " +
        "WHERE event_type = 'purchase'), " +
        "t AS (SELECT user_id, ts, max_by(event_type, event_id) AS touch_type " +
        "FROM events WHERE event_type IN ('view', 'click') GROUP BY 1, 2), " +
        "j AS (SELECT p.user_id, p.ts, p.value, t.touch_type, " +
        "row_number() OVER (PARTITION BY p.user_id, p.ts ORDER BY t.ts DESC) " +
        "AS rk FROM p JOIN t ON p.user_id = t.user_id AND t.ts <= p.ts) " +
        "SELECT touch_type, count(*) AS n_conversions, " +
        "round(sum(value), 4) AS total_value FROM j WHERE rk = 1 " +
        "GROUP BY 1 ORDER BY 1"),

    // A/B lift: variant = user_id % 2, converted = any purchase; pooled
    // two-proportion z. One row.
    "q138_ab_lift" ->
      ("WITH u AS (SELECT user_id, CAST(user_id % 2 AS INTEGER) AS variant, " +
        "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted " +
        "FROM events GROUP BY 1, 2), " +
        "a AS (SELECT count(*) FILTER (variant = 0) AS n_a, " +
        "count(*) FILTER (variant = 1) AS n_b, " +
        "CAST(sum(converted) FILTER (variant = 0) AS BIGINT) AS conv_a, " +
        "CAST(sum(converted) FILTER (variant = 1) AS BIGINT) AS conv_b FROM u) " +
        "SELECT n_a, n_b, conv_a, conv_b, " +
        "round(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a, " +
        "round(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b, " +
        "round(conv_b / CAST(n_b AS DOUBLE) - conv_a / CAST(n_a AS DOUBLE), 6) AS lift, " +
        "round((conv_b / CAST(n_b AS DOUBLE) - conv_a / CAST(n_a AS DOUBLE)) / " +
        "sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)) * " +
        "(1.0 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)) * " +
        "(1.0 / n_a + 1.0 / n_b)), 6) AS z FROM a"),

    // BM25: smoothed idf ln(1+(N-df+0.5)/(df+0.5)), k1=1.2 b=0.75,
    // dl = non-empty whitespace tokens; contributions rounded 6dp,
    // totals 4dp; top-10 by (score desc, doc_id).
    "q139_bm25" -> bm25TopSql,

    // Search over the materialized inverted index must equal search over
    // the corpus row for row — the oracle is literally q139's.
    "q162_index_search" -> bm25TopSql,

    // Per-source curation report: md5-of-text corpus-wide collision flag,
    // composition share, char/token volume and means.
    "q140_source_report" ->
      ("WITH base AS (SELECT source, md5(text) AS fp, " +
        "CAST(length(text) AS BIGINT) AS chars, " +
        "CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) " +
        "AS BIGINT) AS ntok FROM documents), " +
        "fpc AS (SELECT fp, count(*) AS fp_n FROM base GROUP BY 1), " +
        "ps AS (SELECT source, count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN fp_n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs, " +
        "CAST(sum(chars) AS BIGINT) AS sum_chars, " +
        "CAST(sum(ntok) AS BIGINT) AS sum_tokens " +
        "FROM base JOIN fpc USING (fp) GROUP BY 1), " +
        "t AS (SELECT count(*) AS total FROM documents) " +
        "SELECT source, n_docs, " +
        "round(n_docs / CAST(total AS DOUBLE), 6) AS share, n_dup_docs, " +
        "round(n_dup_docs / CAST(n_docs AS DOUBLE), 6) AS dup_rate, " +
        "sum_chars, sum_tokens, " +
        "round(sum_chars / CAST(n_docs AS DOUBLE), 4) AS mean_chars, " +
        "round(sum_tokens / CAST(n_docs AS DOUBLE), 4) AS mean_tokens " +
        "FROM ps CROSS JOIN t ORDER BY source"),

    // PageRank over the derived doc graph (see q141 scaladoc): 10 unrolled
    // rounds, 9dp.
    "q141_pagerank" -> pageRankSql(10),

    // Logistic-regression language filter: 5 unrolled GD rounds over the
    // shallow text features, per-doc scores 6dp.
    "q142_logreg" -> logRegSql(5),

    // Embedding covariance: E[xi·xj] − E[xi]·E[xj] from an unnest
    // self-join, 0-based indices, 8dp.
    "q143_embed_cov" ->
      ("WITH x AS (SELECT vec_id, unnest(range(1, len(embedding) + 1)) " +
        "AS idx, embedding FROM embeddings), " +
        "xe AS (SELECT vec_id, CAST(idx - 1 AS INTEGER) AS i, " +
        "CAST(embedding[idx] AS DOUBLE) AS xi FROM x), " +
        "m AS (SELECT i, avg(xi) AS mi FROM xe GROUP BY 1), " +
        "p AS (SELECT a.i AS i, b.i AS j, avg(a.xi * b.xi) AS eij " +
        "FROM xe a JOIN xe b USING (vec_id) GROUP BY 1, 2) " +
        "SELECT p.i, p.j, round(eij - ma.mi * mb.mi, 8) AS cov " +
        "FROM p JOIN m ma ON p.i = ma.i JOIN m mb ON p.j = mb.i " +
        "ORDER BY 1, 2"),

    // A-Res weighted sample: priority u^(1/weight) from the
    // multiplicative-modulo uniform, top-20 by (priority, doc_id).
    "q144_weighted_sample" ->
      ("WITH w AS (SELECT doc_id, n_chars, " +
        "power(CAST((doc_id * 2654435761) % 1000003 AS DOUBLE) / 1000003.0, " +
        "1.0 / n_chars) AS p FROM documents WHERE n_chars > 0) " +
        "SELECT doc_id, n_chars, round(p, 9) AS priority FROM w " +
        "ORDER BY p DESC, doc_id LIMIT 20"),

    // Per-group A-Res: same uniform as q144, rank within source by
    // (priority DESC, doc_id), keep the top 5 per source.
    "q274_group_weighted_sample" ->
      ("WITH w AS (SELECT source, doc_id, n_chars, " +
        "power(CAST((doc_id * 2654435761) % 1000003 AS DOUBLE) / 1000003.0, " +
        "1.0 / n_chars) AS p FROM documents WHERE n_chars > 0), " +
        "r AS (SELECT *, row_number() OVER " +
        "(PARTITION BY source ORDER BY p DESC, doc_id) AS rn FROM w) " +
        "SELECT source, doc_id, n_chars, round(p, 9) AS priority " +
        "FROM r WHERE rn <= 5 ORDER BY source, p DESC, doc_id"),

    // Triangle stats: degree-oriented closure replayed; wedge total is the
    // center-counted sum C(deg, 2).
    "q145_triangles" ->
      ("WITH mn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), " +
        "e0 AS (SELECT doc_id AS s, (doc_id + 1) % mn.n AS t " +
        "FROM documents, mn " +
        "UNION ALL SELECT doc_id, (doc_id + 2) % mn.n FROM documents, mn " +
        "WHERE doc_id % 2 = 0 " +
        "UNION ALL SELECT doc_id, (doc_id + 3) % mn.n FROM documents, mn " +
        "WHERE doc_id % 3 = 0), " +
        "und AS (SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b " +
        "FROM e0 WHERE s <> t), " +
        "deg AS (SELECT v, count(*) AS d FROM " +
        "(SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY 1), " +
        "o AS (SELECT CASE WHEN (da.d, a) < (db.d, b) THEN a ELSE b END AS u, " +
        "CASE WHEN (da.d, a) < (db.d, b) THEN b ELSE a END AS w, " +
        "CASE WHEN (da.d, a) < (db.d, b) THEN db.d ELSE da.d END AS dw " +
        "FROM und JOIN deg da ON und.a = da.v JOIN deg db ON und.b = db.v), " +
        "cand AS (SELECT o1.w AS u, o2.w AS w FROM o o1 JOIN o o2 " +
        "ON o1.u = o2.u WHERE (o1.dw, o1.w) < (o2.dw, o2.w)), " +
        "tri AS (SELECT count(*) AS nt FROM cand JOIN " +
        "(SELECT u, w FROM o) x USING (u, w)), " +
        "agg AS (SELECT (SELECT count(*) FROM und) AS n_edges, " +
        "(SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges, " +
        "(SELECT nt FROM tri) AS n_triangles) " +
        "SELECT n_edges, n_wedges, n_triangles, " +
        "round(3.0 * n_triangles / n_wedges, 6) AS clustering_coeff FROM agg"),

    // Local clustering: q145's closure with the apex carried; each
    // triangle credits all three corners; coeff = nt / C(deg, 2).
    "q146_local_clustering" ->
      ("WITH mn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), " +
        "e0 AS (SELECT doc_id AS s, (doc_id + 1) % mn.n AS t " +
        "FROM documents, mn " +
        "UNION ALL SELECT doc_id, (doc_id + 2) % mn.n FROM documents, mn " +
        "WHERE doc_id % 2 = 0 " +
        "UNION ALL SELECT doc_id, (doc_id + 3) % mn.n FROM documents, mn " +
        "WHERE doc_id % 3 = 0), " +
        "und AS (SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b " +
        "FROM e0 WHERE s <> t), " +
        "deg AS (SELECT v, count(*) AS d FROM " +
        "(SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY 1), " +
        "o AS (SELECT CASE WHEN (da.d, a) < (db.d, b) THEN a ELSE b END AS u, " +
        "CASE WHEN (da.d, a) < (db.d, b) THEN b ELSE a END AS w, " +
        "CASE WHEN (da.d, a) < (db.d, b) THEN db.d ELSE da.d END AS dw " +
        "FROM und JOIN deg da ON und.a = da.v JOIN deg db ON und.b = db.v), " +
        "cand AS (SELECT o1.u AS apex, o1.w AS w1, o2.w AS w2 " +
        "FROM o o1 JOIN o o2 ON o1.u = o2.u " +
        "WHERE (o1.dw, o1.w) < (o2.dw, o2.w)), " +
        "closed AS (SELECT c.apex, c.w1, c.w2 FROM cand c " +
        "JOIN o ON c.w1 = o.u AND c.w2 = o.w), " +
        "pv AS (SELECT v, count(*) AS nt FROM " +
        "(SELECT apex AS v FROM closed UNION ALL SELECT w1 FROM closed " +
        "UNION ALL SELECT w2 FROM closed) GROUP BY 1) " +
        "SELECT d.v, d.d AS degree, COALESCE(pv.nt, 0) AS n_triangles, " +
        "round(COALESCE(pv.nt, 0) / (d.d * (d.d - 1) / 2), 6) " +
        "AS clustering_coeff FROM deg d LEFT JOIN pv USING (v) " +
        "WHERE d.d >= 2 " +
        "ORDER BY COALESCE(pv.nt, 0) / (d.d * (d.d - 1) / 2) DESC, d.v " +
        "LIMIT 20"),

    // Exact Jaccard join ground truth over the SHARED 3-shingle
    // population: FULL inverted-index pair join (no prefix filter), so a
    // hash match proves the prefix filter lost no pair.
    "q147_jaccard_join" ->
      (s"WITH $exactPairCtes " +
        "SELECT id_a, id_b, round(j, 6) AS jaccard FROM jp " +
        "WHERE j >= 0.9 ORDER BY 1, 2"),

    // Edit-distance≤1 ground truth: brute-force levenshtein over all
    // ordered pairs — a hash match proves the deletion-neighborhood
    // blocking (SymSpell) generated every candidate.
    "q149_edit_distance" ->
      ("SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, " +
        "CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist " +
        "FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey " +
        "WHERE levenshtein(a.c_name, b.c_name) <= 1 ORDER BY 1, 2"),

    // Rolling z-score anomalies: the same strictly-trailing 20-row keyed
    // frame, (ts, event_id) total order, n ≥ 5 and sigma > 0 guards.
    "q150_anomaly" ->
      ("WITH w AS (SELECT user_id, event_id, value, " +
        "avg(value) OVER win AS mu, stddev_samp(value) OVER win AS sigma, " +
        "count(value) OVER win AS n " +
        "FROM events WINDOW win AS (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)) " +
        "SELECT user_id, event_id, value, " +
        "round((value - mu) / sigma, 4) AS zscore " +
        "FROM w WHERE n >= 5 AND sigma > 0 " +
        "AND abs((value - mu) / sigma) > 3.0 ORDER BY 1, 2"),

    // Token↔source MI: occurrence-count joint/marginals, natural log,
    // rank on the unrounded MI, final order by token.
    "q151_token_mi" ->
      ("WITH occ AS (SELECT source AS cls, " +
        "unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) " +
        "AS tok FROM documents), " +
        "j AS (SELECT tok, cls, count(*) AS ntc FROM occ GROUP BY 1, 2), " +
        "tm AS (SELECT tok, sum(ntc) AS nt FROM j GROUP BY 1 " +
        "HAVING sum(ntc) >= 50), " +
        "cm AS (SELECT cls, sum(ntc) AS nc FROM j GROUP BY 1), " +
        "tot AS (SELECT sum(ntc) AS ntot FROM j), " +
        "mi AS (SELECT j.tok, tm.nt, " +
        "sum((ntc / ntot) * ln((CAST(ntc AS DOUBLE) * ntot) / " +
        "(CAST(nt AS DOUBLE) * nc))) AS mi " +
        "FROM j JOIN tm USING (tok) JOIN cm USING (cls) CROSS JOIN tot " +
        "GROUP BY 1, 2), " +
        "top AS (SELECT tok, nt, mi, row_number() OVER " +
        "(ORDER BY mi DESC, tok) AS rk FROM mi) " +
        "SELECT tok, CAST(nt AS BIGINT) AS n, round(mi, 6) AS mi " +
        "FROM top WHERE rk <= 50 ORDER BY tok"),

    // Robust scaling: exact interpolated quantiles (quantile_cont ≡
    // Spark percentile), median/IQR z clipped to ±3, IQR 0 → 0.
    "q152_robust_scale" ->
      ("WITH st AS (SELECT source, " +
        "quantile_cont(n_chars, 0.25) AS q25, " +
        "quantile_cont(n_chars, 0.5) AS med, " +
        "quantile_cont(n_chars, 0.75) AS q75 FROM documents GROUP BY 1) " +
        "SELECT doc_id, d.source, n_chars, " +
        "round(CASE WHEN q75 = q25 THEN 0.0 ELSE " +
        "greatest(-3.0, least(3.0, (n_chars - med) / (q75 - q25))) END, 4) " +
        "AS robust_z FROM documents d JOIN st USING (source) " +
        "ORDER BY doc_id"),

    "q153_communities" -> labelPropSql(5),

    // RRF hybrid retrieval: the q139 BM25 recipe at top-50 + cosine
    // top-50 around vector 0, fused as sum(1/(60+rank)) — the two-term
    // sum is IEEE-commutative, so no rounding is needed before ranking.
    "q154_rrf_fusion" ->
      ("WITH base AS (SELECT doc_id, CAST(len(list_filter(" +
        "string_split(text, ' '), x -> len(x) > 0)) AS DOUBLE) AS dl " +
        "FROM documents), " +
        "stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base), " +
        "terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term " +
        "FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM terms " +
        "WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2), " +
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
        "c AS (SELECT tf.doc_id, round(" +
        "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2 / " +
        "(tf + 1.2 * (0.25 + 0.75 * b.dl / avgdl)), 6) AS c " +
        "FROM tf JOIN df USING (term) JOIN base b ON tf.doc_id = b.doc_id " +
        "CROSS JOIN stats), " +
        "lexs AS (SELECT doc_id, round(sum(c), 4) AS score FROM c " +
        "GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 50), " +
        "lex AS (SELECT doc_id, row_number() OVER " +
        "(ORDER BY score DESC, doc_id) AS rank FROM lexs), " +
        "qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0), " +
        s"cs AS (SELECT vec_id AS doc_id, ${cosSql("q", "embedding")} " +
        "AS cos FROM embeddings, qv WHERE vec_id <> 0), " +
        "sem AS (SELECT doc_id, rank FROM (SELECT doc_id, row_number() " +
        "OVER (ORDER BY cos DESC, doc_id) AS rank FROM cs) " +
        "WHERE rank <= 50), " +
        "u AS (SELECT doc_id, rank FROM lex " +
        "UNION ALL SELECT doc_id, rank FROM sem), " +
        "f AS (SELECT doc_id, sum(1.0 / (60 + rank)) AS s, " +
        "count(*) AS n_systems FROM u GROUP BY 1), " +
        "top AS (SELECT doc_id, s, n_systems, row_number() OVER " +
        "(ORDER BY s DESC, doc_id) AS rk FROM f) " +
        "SELECT doc_id, round(s, 6) AS rrf_score, " +
        "CAST(n_systems AS BIGINT) AS n_systems FROM top WHERE rk <= 10 " +
        "ORDER BY doc_id"),

    // Bigram PMI collocations: list_zip-offset bigrams, double-product
    // PMI (the operator's overflow-safe form), rank on unrounded PMI.
    "q155_collocations" ->
      ("WITH tk AS (SELECT list_filter(string_split(text, ' '), " +
        "x -> len(x) > 0) AS toks FROM documents), " +
        "uni AS (SELECT unnest(toks) AS tok FROM tk), " +
        "un AS (SELECT tok, count(*) AS nx FROM uni GROUP BY 1), " +
        "ut AS (SELECT sum(nx) AS nu FROM un), " +
        "bg AS (SELECT unnest(list_filter(list_zip(toks, toks[2:]), " +
        "p -> p[2] IS NOT NULL)) AS p FROM tk WHERE len(toks) >= 2), " +
        "bn AS (SELECT p[1] AS w1, p[2] AS w2, count(*) AS nxy FROM bg " +
        "GROUP BY 1, 2 HAVING count(*) >= 25), " +
        "bt AS (SELECT sum(len(toks) - 1) AS nb FROM tk " +
        "WHERE len(toks) >= 2), " +
        "j AS (SELECT w1, w2, nxy, " +
        "ln((CAST(nxy AS DOUBLE) * nu * nu) / " +
        "(CAST(nb AS DOUBLE) * u1.nx * u2.nx)) AS pmi " +
        "FROM bn JOIN un u1 ON bn.w1 = u1.tok " +
        "JOIN un u2 ON bn.w2 = u2.tok CROSS JOIN ut CROSS JOIN bt), " +
        "top AS (SELECT w1, w2, nxy, pmi, row_number() OVER " +
        "(ORDER BY pmi DESC, w1, w2) AS rk FROM j) " +
        "SELECT w1, w2, CAST(nxy AS BIGINT) AS n, round(pmi, 6) AS pmi " +
        "FROM top WHERE rk <= 50 ORDER BY w1, w2"),

    // Column dependencies: one joint-count CTE per pair, entropies from
    // the joint, U(A|B) = (H(A) − H(A|B)) / H(A).
    // PSI drift: reference-decile edges (quantile_cont ≡ Spark
    // percentile), CASE bucketing on the same edge doubles, +0.5
    // smoothing over a dense bucket spine.
    "q158_psi_drift" -> {
      val caseOf = (1 to 9).map(i =>
        s"WHEN v <= qs[$i] THEN ${i - 1}").mkString(
        "CASE ", " ", " ELSE 9 END")
      "WITH ref AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents " +
        "WHERE doc_id % 2 = 0), " +
        "cur AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents " +
        "WHERE doc_id % 2 = 1), " +
        "ed AS (SELECT quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, " +
        "0.7, 0.8, 0.9]) AS qs FROM ref), " +
        s"rb AS (SELECT $caseOf AS bucket FROM ref, ed), " +
        s"cb AS (SELECT $caseOf AS bucket FROM cur, ed), " +
        "rn AS (SELECT bucket, count(*) AS n FROM rb GROUP BY 1), " +
        "cn AS (SELECT bucket, count(*) AS n FROM cb GROUP BY 1), " +
        "rt AS (SELECT count(*) AS t FROM rb), " +
        "ct AS (SELECT count(*) AS t FROM cb), " +
        "sp AS (SELECT CAST(range AS INTEGER) AS bucket FROM range(10)), " +
        "sh AS (SELECT sp.bucket, " +
        "(COALESCE(rn.n, 0) + 0.5) / (rt.t + 5.0) AS ref_share, " +
        "(COALESCE(cn.n, 0) + 0.5) / (ct.t + 5.0) AS cur_share " +
        "FROM sp LEFT JOIN rn USING (bucket) LEFT JOIN cn USING (bucket), " +
        "rt, ct) " +
        "SELECT bucket, round(ref_share, 6) AS ref_share, " +
        "round(cur_share, 6) AS cur_share, " +
        "round((cur_share - ref_share) * ln(cur_share / ref_share), 6) " +
        "AS psi_term FROM sh ORDER BY bucket"
    },

    // Association rules over (user × day) distinct baskets: support /
    // confidence / lift with the operator's exact arithmetic.
    "q159_association_rules" ->
      ("WITH bi AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, " +
        "event_type AS item FROM events), " +
        "nb AS (SELECT count(*) AS n FROM " +
        "(SELECT DISTINCT user_id, d FROM bi)), " +
        "m AS (SELECT item, count(*) AS n_item FROM bi GROUP BY 1), " +
        "p AS (SELECT a.item AS ante, b.item AS cons, count(*) AS n_both " +
        "FROM bi a JOIN bi b ON a.user_id = b.user_id AND a.d = b.d " +
        "AND a.item <> b.item GROUP BY 1, 2 HAVING count(*) >= 5) " +
        "SELECT ante, cons, CAST(n_both AS BIGINT) AS n_both, " +
        "round(n_both / n, 6) AS support, " +
        "round(n_both / ma.n_item, 6) AS confidence, " +
        "round(n_both * n / (CAST(ma.n_item AS DOUBLE) * mc.n_item), 6) " +
        "AS lift FROM p JOIN m ma ON ante = ma.item " +
        "JOIN m mc ON cons = mc.item CROSS JOIN nb ORDER BY 1, 2"),

    // k-core over the planted-core graph, peel rounds unrolled (rounds
    // past convergence are no-ops, so 5 covers the 2-3 round run).
    "q160_kcore" -> kCoreSql(k = 5, rounds = 5),

    // Categorical drift: union categories, +0.5 smoothing, chi-square
    // with explicit multiply (mirrors Spark's (d)*(d)/exp), JS terms.
    "q163_categorical_drift" ->
      ("WITH r AS (SELECT lang AS category, count(*) AS rn FROM documents " +
        "WHERE doc_id % 2 = 0 GROUP BY 1), " +
        "c AS (SELECT lang AS category, count(*) AS cn FROM documents " +
        "WHERE doc_id % 2 = 1 GROUP BY 1), " +
        "j AS (SELECT category, COALESCE(rn, 0) AS rn, " +
        "COALESCE(cn, 0) AS cn FROM r FULL OUTER JOIN c USING (category)), " +
        "kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM j), " +
        "t AS (SELECT sum(rn) AS rt, sum(cn) AS ct FROM j), " +
        "s AS (SELECT category, cn, ct, k, " +
        "(rn + 0.5) / (rt + 0.5 * k) AS ref_share, " +
        "(cn + 0.5) / (ct + 0.5 * k) AS cur_share FROM j, t, kk), " +
        "e AS (SELECT category, ref_share, cur_share, " +
        "ref_share * (ct + 0.5 * k) AS ex, cn, " +
        "(ref_share + cur_share) / 2.0 AS m FROM s) " +
        "SELECT category, round(ref_share, 6) AS ref_share, " +
        "round(cur_share, 6) AS cur_share, " +
        "round(((cn + 0.5) - ex) * ((cn + 0.5) - ex) / ex, 6) " +
        "AS chi2_term, " +
        "round(0.5 * ref_share * ln(ref_share / m) + " +
        "0.5 * cur_share * ln(cur_share / m), 6) AS js_term " +
        "FROM e ORDER BY category"),

    // Flesch readability: identical tokenization and vowel-group regex,
    // score arithmetic replayed in the same operation order.
    "q166_readability" ->
      ("WITH w AS (SELECT doc_id, list_filter(string_split_regex(" +
        "lower(text), '\\s+'), x -> len(x) > 0) AS ws, " +
        "CAST(len(list_filter(string_split_regex(text, '[.!?]+'), " +
        "s -> len(trim(s)) > 0)) AS BIGINT) AS n_sentences " +
        "FROM documents), " +
        "a AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, " +
        "n_sentences, CAST(list_sum(list_transform(ws, " +
        "x -> len(regexp_extract_all(x, '[aeiouy]+')))) AS BIGINT) " +
        "AS n_syllables FROM w) " +
        "SELECT doc_id, n_words, n_sentences, n_syllables, " +
        "round(206.835 - 1.015 * (n_words / n_sentences) " +
        "- 84.6 * (n_syllables / n_words), 4) AS flesch FROM a " +
        "WHERE n_words > 0 AND n_sentences > 0 ORDER BY doc_id"),

    // Zipf fit: ln-freq on ln-rank closed-form regression, (n desc, tok)
    // rank order shared with the Spark window.
    "q167_zipf_fit" ->
      ("WITH c AS (SELECT tok, count(*) AS n FROM " +
        "(SELECT unnest(list_filter(string_split(text, ' '), " +
        "x -> len(x) > 0)) AS tok FROM documents) GROUP BY 1 " +
        "ORDER BY n DESC, tok LIMIT 1000), " +
        "r AS (SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, tok) " +
        "AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y FROM c) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_tokens, " +
        "round(regr_slope(y, x), 5) AS slope, " +
        "round(regr_intercept(y, x), 5) AS intercept, " +
        "round(regr_r2(y, x), 5) AS r2 FROM r"),

    // Margin bitext mining: cosine top-4 retrieval, both-direction
    // neighbour-level denominators, margin re-rank, best pair per src.
    "q165_margin_mining" ->
      ("WITH s AS (SELECT vec_id AS src_id, embedding AS sv " +
        "FROM embeddings WHERE vec_id % 2 = 0), " +
        "g AS (SELECT vec_id AS tgt_id, embedding AS tv " +
        "FROM embeddings WHERE vec_id % 2 = 1), " +
        s"sc AS (SELECT src_id, tgt_id, ${cosSql("sv", "tv")} AS cos " +
        "FROM g CROSS JOIN s), " +
        "r AS (SELECT src_id, tgt_id, cos, " +
        "row_number() OVER (PARTITION BY src_id " +
        "ORDER BY cos DESC, tgt_id) AS rs, " +
        "row_number() OVER (PARTITION BY tgt_id " +
        "ORDER BY cos DESC, src_id) AS rt FROM sc), " +
        "da AS (SELECT src_id, avg(cos) AS da FROM r WHERE rs <= 4 " +
        "GROUP BY 1), " +
        "db AS (SELECT tgt_id, avg(cos) AS db FROM r WHERE rt <= 4 " +
        "GROUP BY 1), " +
        "m AS (SELECT r.src_id, r.tgt_id, cos, " +
        "cos / ((da + db) / 2.0) AS margin FROM r " +
        "JOIN da USING (src_id) JOIN db USING (tgt_id) WHERE rs <= 4), " +
        "b AS (SELECT src_id, tgt_id, cos, margin, row_number() OVER " +
        "(PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rb FROM m) " +
        "SELECT src_id, tgt_id, round(cos, 6) AS cos, " +
        "round(margin, 5) AS margin FROM b WHERE rb = 1 AND margin >= 1.0 " +
        "ORDER BY src_id"),

    // Neyman allocation: budget · N_h·S_h / Σ(N_h·S_h), fractional.
    "q164_neyman_allocation" ->
      ("WITH per AS (SELECT source, count(*) AS n_rows, " +
        "stddev_samp(CAST(n_chars AS DOUBLE)) AS sd FROM documents " +
        "GROUP BY 1), " +
        "w AS (SELECT source, n_rows, sd, " +
        "n_rows * COALESCE(sd, 0.0) AS w FROM per), " +
        "t AS (SELECT sum(w) AS tw FROM w) " +
        "SELECT source, CAST(n_rows AS BIGINT) AS n_rows, " +
        "round(sd, 6) AS stddev, " +
        "round(CASE WHEN tw > 0 THEN 1000.0 * w / tw ELSE 0.0 END, 4) " +
        "AS allocation FROM w, t ORDER BY source"),

    // Heap top-k per group == the window formulation (rank order total).
    "q161_topk_per_group" ->
      ("SELECT source, CAST(rn AS BIGINT) AS rank, " +
        "CAST(n_chars AS BIGINT) AS n_chars, doc_id FROM " +
        "(SELECT source, n_chars, doc_id, row_number() OVER " +
        "(PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn " +
        "FROM documents) WHERE rn <= 3 ORDER BY source, rank"),

    "q156_column_deps" -> {
      // Mirrors Quality.columnDependencies' log-identity embodiment:
      // H(A) = ln n − (Σ na·ln na)/n, H(A|B) = (Σ nb·ln nb − Σ nab·ln nab)/n,
      // with the same integer degenerate tests (ka/kb = 1, cjoint = kb).
      def pairSql(a: String, b: String): String =
        s"(WITH j AS (SELECT $a AS a, $b AS b, count(*) AS nab " +
          "FROM orders GROUP BY 1, 2), " +
          "ja AS (SELECT a, sum(nab) AS na, sum(nab * ln(nab)) AS sj, " +
          "count(*) AS cj FROM j GROUP BY 1), " +
          "fa AS (SELECT sum(na) AS n, sum(na * ln(na)) AS sa, " +
          "sum(sj) AS sjoint, count(*) AS ka, sum(cj) AS cjoint FROM ja), " +
          "jb AS (SELECT b, sum(nab) AS nb FROM j GROUP BY 1), " +
          "fb AS (SELECT sum(nb * ln(nb)) AS sb, count(*) AS kb FROM jb), " +
          "h AS (SELECT CASE WHEN ka = 1 THEN 0.0 ELSE ln(n) - sa / n END " +
          "AS h_a, CASE WHEN kb = 1 THEN 0.0 ELSE ln(n) - sb / n END " +
          "AS h_b, CASE WHEN cjoint = kb THEN 0.0 ELSE " +
          "(sb - sjoint) / n END AS h_a_given_b FROM fa, fb) " +
          s"SELECT '$a' AS col_a, '$b' AS col_b, " +
          "round(h_a, 6) AS h_a, round(h_b, 6) AS h_b, " +
          "round(h_a_given_b, 6) AS h_a_given_b, " +
          "round(CASE WHEN h_a = 0 THEN 1.0 ELSE " +
          "(h_a - h_a_given_b) / h_a END, 6) AS uncertainty_coef " +
          "FROM h)"
      Seq(("o_orderstatus", "o_orderpriority"),
        ("o_orderpriority", "o_orderstatus"),
        ("o_orderstatus", "o_custkey"))
        .map { case (a, b) => pairSql(a, b) }
        .mkString("", " UNION ALL ", " ORDER BY col_a, col_b")
    },

    // kNN label propagation: unlabeled pool (vec_id % 5 = 0) scored against
    // the labeled seeds (the rest) with the shared cosine recipe; top-5 by
    // (cos desc, nbr id), majority vote with ties to the smallest label.
    "q132_knn_labels" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings " +
        "WHERE vec_id % 5 = 0), " +
        "l AS (SELECT vec_id AS nid, embedding AS lv, label FROM embeddings " +
        "WHERE vec_id % 5 <> 0), " +
        s"s AS (SELECT query_id, nid, label, ${cosSql("qv", "lv")} AS cos " +
        "FROM q, l WHERE query_id <> nid), " +
        "r AS (SELECT query_id, label, cos, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY cos DESC, nid) AS rnk FROM s), " +
        "v AS (SELECT query_id, label, count(*) AS votes FROM r " +
        "WHERE rnk <= 5 GROUP BY 1, 2), " +
        "m AS (SELECT query_id, label, votes, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY votes DESC, label) AS mk FROM v) " +
        "SELECT query_id, label AS predicted_label, votes FROM m " +
        "WHERE mk = 1 ORDER BY query_id"),

    // Centroid-margin mislabel screen: per-label element-wise mean
    // embeddings (double accumulation), cosine of each vector to every
    // centroid via the shared recipe, own-vs-best-other margin.
    "q133_centroid_margin" ->
      ("WITH ex AS (SELECT label, unnest(range(1, len(embedding) + 1)) AS idx, " +
        "CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings), " +
        "ce AS (SELECT label, idx, avg(x) AS m FROM ex GROUP BY 1, 2), " +
        "cent AS (SELECT label AS clab, list(m ORDER BY idx) AS cv " +
        "FROM ce GROUP BY 1), " +
        "s AS (SELECT e.vec_id, e.label, c.clab, " +
        s"${cosSql("e.embedding", "c.cv")} AS cos " +
        "FROM embeddings e CROSS JOIN cent c), " +
        "agg AS (SELECT vec_id, label, " +
        "max(CASE WHEN label = clab THEN cos END) AS own_cos, " +
        "max_by(clab, CASE WHEN label <> clab THEN cos END) AS other_lab, " +
        "max(CASE WHEN label <> clab THEN cos END) AS other_cos " +
        "FROM s GROUP BY 1, 2) " +
        "SELECT vec_id, label, round(own_cos, 4) AS own_cos, " +
        "other_lab AS nearest_other_label, round(other_cos, 4) AS other_cos, " +
        "round(own_cos - other_cos, 4) AS margin " +
        "FROM agg ORDER BY vec_id"),

    // Delta-log replay truth: the staged 2-commit log's live file set
    // reconstructs exactly the original region rows (remove tombstones one
    // file, a re-add restores its rows), so the oracle is region itself.
    "q130_delta_read" ->
      "SELECT r_regionkey, r_name FROM region",

    "q65_normalize" ->
      ("WITH mm AS (SELECT l_returnflag, min(l_extendedprice) AS lo, " +
        "max(l_extendedprice) AS hi FROM lineitem GROUP BY 1) " +
        "SELECT l_returnflag, " +
        "round(avg((l_extendedprice - lo) / (hi - lo)), 4) AS avg_norm, " +
        "round(stddev_samp((l_extendedprice - lo) / (hi - lo)), 4) AS sd_norm, " +
        "count(*) AS n FROM lineitem JOIN mm USING (l_returnflag) GROUP BY 1"),

    // Ranked-retrieval metrics: per-source length ranking, doc_id%7
    // relevance, recall@10 / MRR / NDCG@10 with the binary-gain IDCG
    // prefix table rebuilt from range().
    "q169_ranking_metrics" ->
      ("WITH r AS (SELECT source, doc_id, row_number() OVER " +
        "(PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank, " +
        "CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS rel " +
        "FROM documents), " +
        "h AS (SELECT CAST(range + 1 AS BIGINT) AS m, " +
        "sum(1.0 / log2(range + 2.0)) OVER (ORDER BY range) AS idcg " +
        "FROM range(10)), " +
        "a AS (SELECT source, CAST(sum(rel) AS BIGINT) AS n_rel, " +
        "CAST(sum(CASE WHEN rank <= 10 THEN rel ELSE 0 END) AS BIGINT) " +
        "AS hits_k, " +
        "min(CASE WHEN rel = 1 THEN rank END) AS first_rel, " +
        "sum(CASE WHEN rank <= 10 THEN rel / log2(rank + 1.0) " +
        "ELSE 0 END) AS dcg FROM r GROUP BY 1) " +
        "SELECT source, n_rel, hits_k, " +
        "round(CASE WHEN n_rel > 0 THEN CAST(hits_k AS DOUBLE) / n_rel " +
        "ELSE 0 END, 6) AS recall_k, " +
        "round(CASE WHEN first_rel IS NOT NULL THEN 1.0 / first_rel " +
        "ELSE 0 END, 6) AS mrr, " +
        "round(CASE WHEN n_rel > 0 THEN dcg / h.idcg ELSE 0 END, 6) " +
        "AS ndcg_k " +
        "FROM a LEFT JOIN h ON h.m = least(a.n_rel, 10) ORDER BY source"),

    // Reliability bins / ECE: deterministic modular pseudo-score,
    // quantity-threshold label, unrounded bin stats feed the ece term.
    "q170_calibration" ->
      ("WITH s AS (SELECT ((l_orderkey * 7 + l_linenumber) % 100) / 100.0 " +
        "AS score, CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS label " +
        "FROM lineitem), " +
        "b AS (SELECT least(CAST(floor(score * 10) AS INT), 9) AS bin, " +
        "count(*) AS n, avg(score) AS confidence, " +
        "avg(CAST(label AS DOUBLE)) AS accuracy FROM s GROUP BY 1), " +
        "t AS (SELECT sum(n) AS total FROM b) " +
        "SELECT bin, CAST(n AS BIGINT) AS n, " +
        "round(confidence, 6) AS confidence, " +
        "round(accuracy, 6) AS accuracy, " +
        "round(n / CAST(total AS DOUBLE) * abs(confidence - accuracy), 6) " +
        "AS ece_term FROM b, t ORDER BY bin"),

    // Cohen's kappa: marginal-product chance agreement, same guard-free
    // region (pe < 1 on this data).
    "q171_kappa" ->
      ("WITH d AS (SELECT lang AS a, CASE WHEN doc_id % 7 = 0 THEN 'en' " +
        "ELSE lang END AS b FROM documents), " +
        "n AS (SELECT count(*) AS n, " +
        "sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree FROM d), " +
        "ma AS (SELECT a AS c, count(*) AS na FROM d GROUP BY 1), " +
        "mb AS (SELECT b AS c, count(*) AS nb FROM d GROUP BY 1), " +
        "pe AS (SELECT sum(CAST(na AS DOUBLE) * nb) AS pesum " +
        "FROM ma JOIN mb USING (c)) " +
        "SELECT CAST(n AS BIGINT) AS n, " +
        "round(agree / CAST(n AS DOUBLE), 6) AS po, " +
        "round(pesum / (CAST(n AS DOUBLE) * n), 6) AS pe, " +
        "round((agree / CAST(n AS DOUBLE) - pesum / (CAST(n AS DOUBLE) * n)) " +
        "/ (1 - pesum / (CAST(n AS DOUBLE) * n)), 6) AS kappa " +
        "FROM n, pe"),

    // Chi-squared independence: full margin cross-product (zero-observed
    // cells carry expected mass), Cramér's V effect size.
    "q172_chisq" ->
      ("WITH d AS (SELECT event_type AS a, " +
        "CAST(user_id % 3 AS VARCHAR) AS b FROM events), " +
        "o AS (SELECT a, b, count(*) AS o FROM d GROUP BY 1, 2), " +
        "ma AS (SELECT a, count(*) AS ra FROM d GROUP BY 1), " +
        "mb AS (SELECT b, count(*) AS rb FROM d GROUP BY 1), " +
        "t AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d), " +
        "cell AS (SELECT COALESCE(o.o, 0) AS o, " +
        "CAST(ma.ra AS DOUBLE) * mb.rb / t.n AS e " +
        "FROM ma CROSS JOIN mb CROSS JOIN t " +
        "LEFT JOIN o ON o.a = ma.a AND o.b = mb.b) " +
        "SELECT CAST((SELECT n FROM t) AS BIGINT) AS n, " +
        "CAST(((SELECT count(*) FROM ma) - 1) * " +
        "((SELECT count(*) FROM mb) - 1) AS BIGINT) AS dof, " +
        "round(sum((o - e) * (o - e) / e), 4) AS chi2, " +
        "round(sqrt(sum((o - e) * (o - e) / e) / ((SELECT n FROM t) * " +
        "least((SELECT count(*) FROM ma) - 1, " +
        "(SELECT count(*) FROM mb) - 1))), 6) AS cramers_v FROM cell"),

    // Mann-Whitney U: per-distinct-value count collapse, running-sum
    // average ranks, tie-corrected sigma — U exact (all terms halves).
    "q173_mannwhitney" ->
      ("WITH d AS (SELECT CAST(l_quantity AS DOUBLE) AS v, " +
        "CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS ia, " +
        "CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS ib " +
        "FROM lineitem WHERE l_linestatus IN ('O', 'F')), " +
        "p AS (SELECT v, sum(ia) AS ca, sum(ib) AS cb, count(*) AS t " +
        "FROM d GROUP BY 1), " +
        "r AS (SELECT *, sum(t) OVER (ORDER BY v) AS cum FROM p), " +
        "a AS (SELECT sum(ca) AS na, sum(cb) AS nb, " +
        "sum(ca * ((cum - t) + (t + 1) / 2.0)) AS rsa, " +
        "sum(CAST(t AS DOUBLE) * t * t - t) AS tie3 FROM r), " +
        "f AS (SELECT na, nb, rsa - na * (na + 1) / 2.0 AS u, " +
        "sqrt(na * nb / 12.0 * ((na + nb + 1) - tie3 / " +
        "(CAST(na + nb AS DOUBLE) * (na + nb - 1)))) AS sig FROM a) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "round(u, 2) AS u, " +
        "round(CASE WHEN sig > 0 THEN (u - na * nb / 2.0) / sig " +
        "ELSE 0 END, 6) AS z FROM f"),

    // Sample ACF: hourly bin means, lag self-joins, shared Σx²−nμ²
    // denominator. Bin = floor(seconds/3600): explicit floor — DuckDB's
    // `//` does NOT floor doubles and CAST(double AS BIGINT) rounds,
    // while Spark's cast truncates.
    "q174_acf" ->
      ("WITH s AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bin, " +
        "avg(value) AS x FROM events GROUP BY 1), " +
        "m AS (SELECT avg(x) AS mu, sum(x * x) AS sxx, " +
        "CAST(count(*) AS DOUBLE) AS n FROM s), " +
        "l AS (SELECT a.bin, (a.x - m.mu) AS c, " +
        "CAST(range + 1 AS BIGINT) AS lag FROM s a, m, range(5)), " +
        "j AS (SELECT l.lag, count(*) AS n_pairs, " +
        "sum(l.c * (b.x - m.mu)) AS num " +
        "FROM l JOIN s b ON l.bin + l.lag = b.bin, m GROUP BY 1) " +
        "SELECT lag, CAST(n_pairs AS BIGINT) AS n_pairs, " +
        "round(num / (m.sxx - m.n * m.mu * m.mu), 6) AS acf " +
        "FROM j, m ORDER BY lag"),

    // k-anonymity audit over (nation, segment) at k = 5.
    "q175_kanonymity" ->
      ("WITH c AS (SELECT c_nationkey, c_mktsegment, count(*) AS sz " +
        "FROM customer GROUP BY 1, 2) " +
        "SELECT CAST(sum(sz) AS BIGINT) AS n_rows, " +
        "CAST(count(*) AS BIGINT) AS n_classes, " +
        "CAST(min(sz) AS BIGINT) AS min_class_size, " +
        "CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS classes_below_k, " +
        "CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) " +
        "AS rows_below_k, " +
        "round(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) / " +
        "CAST(sum(sz) AS DOUBLE), 6) AS at_risk_share FROM c"),

    // Multinomial NB replay: Laplace-1 token likelihoods, class OOV mass,
    // doc-frequency priors, arg-max with (posterior desc, class) ties.
    "q176_naive_bayes" ->
      ("WITH tok AS (SELECT lang AS class, " +
        "unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) " +
        "AS token FROM documents), " +
        "cnt AS (SELECT class, token, count(*) AS c FROM tok GROUP BY 1, 2), " +
        "tot AS (SELECT class, sum(c) AS tot FROM cnt GROUP BY 1), " +
        "v AS (SELECT CAST(count(DISTINCT token) AS DOUBLE) AS v FROM cnt), " +
        "model AS (SELECT class, token, ln((c + 1.0) / (tot + v)) AS lp " +
        "FROM cnt JOIN tot USING (class), v), " +
        "nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents), " +
        "pri AS (SELECT class, ln(cd / n) AS log_prior, " +
        "ln(1.0 / (tot + v)) AS log_oov FROM " +
        "(SELECT lang AS class, CAST(count(*) AS DOUBLE) AS cd " +
        "FROM documents GROUP BY 1) JOIN tot USING (class), v, nd), " +
        "dt AS (SELECT doc_id, token, count(*) AS m FROM " +
        "(SELECT doc_id, unnest(list_filter(string_split(text, ' '), " +
        "x -> len(x) > 0)) AS token FROM documents WHERE doc_id % 10 = 0) " +
        "GROUP BY 1, 2), " +
        "sc AS (SELECT dt.doc_id, p.class, " +
        "sum(dt.m * COALESCE(model.lp, p.log_oov)) AS s " +
        "FROM dt CROSS JOIN (SELECT class, log_oov FROM pri) p " +
        "LEFT JOIN model ON model.token = dt.token " +
        "AND model.class = p.class GROUP BY 1, 2), " +
        "post AS (SELECT doc_id, sc.class, s + pri.log_prior AS post " +
        "FROM sc JOIN pri ON sc.class = pri.class) " +
        "SELECT doc_id, class AS predicted_class, " +
        "round(post, 4) AS log_posterior FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY post DESC, class) AS rn FROM post) " +
        "WHERE rn = 1 ORDER BY doc_id"),

    // k-means, two unrolled Lloyd rounds: arg-min by (d2, cid), means,
    // final assignment under the twice-updated centroids.
    "q177_kmeans" -> {
      def assign(cents: String) =
        s"(SELECT id, x, y, cid FROM (SELECT p.id, p.x, p.y, c.cid, " +
          "row_number() OVER (PARTITION BY p.id ORDER BY " +
          "(p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy), " +
          s"c.cid) AS rn FROM pts p CROSS JOIN $cents c) WHERE rn = 1)"
      "WITH pts AS (SELECT c_custkey AS id, " +
        "CAST(c_acctbal AS DOUBLE) AS x, " +
        "CAST(c_nationkey AS DOUBLE) AS y FROM customer), " +
        "c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) " +
        "AS cid, x AS cx, y AS cy FROM " +
        "(SELECT * FROM pts ORDER BY id LIMIT 3)), " +
        s"a1 AS ${assign("c0")}, " +
        "c1 AS (SELECT cid, avg(x) AS cx, avg(y) AS cy FROM a1 GROUP BY 1), " +
        s"a2 AS ${assign("c1")}, " +
        "c2 AS (SELECT cid, avg(x) AS cx, avg(y) AS cy FROM a2 GROUP BY 1), " +
        s"fin AS ${assign("c2")} " +
        "SELECT cid AS cluster, CAST(count(*) AS BIGINT) AS n_points, " +
        "round(avg(x), 4) AS mean_acctbal, " +
        "round(avg(y), 6) AS mean_nation FROM fin GROUP BY 1 ORDER BY cluster"
    },

    // Simplified silhouette on the q177 chain: a = distance to the own
    // FINAL centroid, b = min distance to the others, cluster roll-up.
    "q252_silhouette" -> {
      def assign(cents: String) =
        s"(SELECT id, x, y, cid FROM (SELECT p.id, p.x, p.y, c.cid, " +
          "row_number() OVER (PARTITION BY p.id ORDER BY " +
          "(p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy), " +
          s"c.cid) AS rn FROM pts p CROSS JOIN $cents c) WHERE rn = 1)"
      "WITH pts AS (SELECT c_custkey AS id, " +
        "CAST(c_acctbal AS DOUBLE) AS x, " +
        "CAST(c_nationkey AS DOUBLE) AS y FROM customer), " +
        "c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) " +
        "AS cid, x AS cx, y AS cy FROM " +
        "(SELECT * FROM pts ORDER BY id LIMIT 3)), " +
        s"a1 AS ${assign("c0")}, " +
        "c1 AS (SELECT cid, avg(x) AS cx, avg(y) AS cy FROM a1 GROUP BY 1), " +
        s"a2 AS ${assign("c1")}, " +
        "c2 AS (SELECT cid, avg(x) AS cx, avg(y) AS cy FROM a2 GROUP BY 1), " +
        s"fin AS ${assign("c2")}, " +
        "c3 AS (SELECT cid, avg(x) AS cx, avg(y) AS cy FROM fin " +
        "GROUP BY 1), " +
        "da AS (SELECT f.id, f.cid, sqrt((f.x - o.cx) * (f.x - o.cx) + " +
        "(f.y - o.cy) * (f.y - o.cy)) AS a FROM fin f JOIN c3 o " +
        "ON f.cid = o.cid), " +
        "db AS (SELECT f.id, min(sqrt((f.x - o.cx) * (f.x - o.cx) + " +
        "(f.y - o.cy) * (f.y - o.cy))) AS b FROM fin f JOIN c3 o " +
        "ON f.cid <> o.cid GROUP BY 1), " +
        "sil AS (SELECT da.cid, CASE WHEN greatest(a, b) > 0 THEN " +
        "(b - a) / greatest(a, b) ELSE 0.0 END AS s FROM da JOIN db " +
        "USING (id)) " +
        "SELECT cid AS cluster, CAST(count(*) AS BIGINT) AS n_points, " +
        "round(avg(s), 6) AS mean_silhouette, " +
        "round(min(s), 6) AS min_silhouette FROM sil GROUP BY 1 " +
        "ORDER BY cluster"
    },

    // Two-predictor OLS closed form from population moments; r2 from
    // explained covariance over var_pop.
    "q178_ols" ->
      ("WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "avg(l_extendedprice) AS my, var_pop(l_extendedprice) AS vy, " +
        "avg(l_quantity) AS m1, avg(l_discount) AS m2, " +
        "covar_pop(l_quantity, l_extendedprice) AS cy1, " +
        "covar_pop(l_discount, l_extendedprice) AS cy2, " +
        "var_pop(l_quantity) AS s11, " +
        "covar_pop(l_quantity, l_discount) AS s12, " +
        "var_pop(l_discount) AS s22 FROM lineitem), " +
        "b AS (SELECT *, " +
        "(cy1 * s22 - cy2 * s12) / (s11 * s22 - s12 * s12) AS b1, " +
        "(cy2 * s11 - cy1 * s12) / (s11 * s22 - s12 * s12) AS b2 FROM m) " +
        "SELECT n, round(my - b1 * m1 - b2 * m2, 2) AS intercept, " +
        "round(b1, 3) AS beta_quantity, round(b2, 2) AS beta_discount, " +
        "round((b1 * cy1 + b2 * cy2) / vy, 6) AS r2 FROM b"),

    // Leave-one-out target encoding: category sums minus own target,
    // m=10 shrinkage toward the global mean.
    "q179_target_encode" ->
      ("WITH per AS (SELECT o_orderpriority, sum(o_totalprice) AS s, " +
        "count(*) AS n FROM orders GROUP BY 1), " +
        "g AS (SELECT avg(o_totalprice) AS gm FROM orders) " +
        "SELECT o_orderkey, round((per.s - o_totalprice + 10.0 * g.gm) / " +
        "(per.n - 1 + 10.0), 4) AS te " +
        "FROM orders JOIN per USING (o_orderpriority), g " +
        "ORDER BY o_orderkey"),

    // Benford audit: clamped first-digit derivation (floor before any
    // int cast — DuckDB CAST(double AS INT) rounds), log10 expected
    // shares, chi2 terms.
    "q180_benford" ->
      ("WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x " +
        "FROM lineitem WHERE l_extendedprice > 0), " +
        "d AS (SELECT least(greatest(CAST(floor(x / power(10, " +
        "floor(log10(x)))) AS INT), 1), 9) AS digit FROM v), " +
        "per AS (SELECT digit, count(*) AS n FROM d GROUP BY 1), " +
        "sp AS (SELECT CAST(range AS INT) AS digit FROM range(1, 10)), " +
        "t AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM per), " +
        "e AS (SELECT sp.digit, COALESCE(per.n, 0) AS n, t.t, " +
        "log10(1 + 1.0 / sp.digit) AS es " +
        "FROM sp LEFT JOIN per USING (digit), t) " +
        "SELECT digit, CAST(n AS BIGINT) AS n, " +
        "round(n / t, 6) AS obs_share, round(es, 6) AS exp_share, " +
        "round((n - t * es) * (n - t * es) / (t * es), 4) AS chi2_term " +
        "FROM e ORDER BY digit"),

    // Multi-source BFS over the ring+core graph: 4 unrolled synchronous
    // min-relaxation rounds from seeds {0,1,2}.
    "q181_bfs" -> {
      def relax(prev: String, next: String) =
        s"$next AS (SELECT node, min(dist) AS dist FROM " +
          s"(SELECT u.dst AS node, d.dist + 1 AS dist FROM und u " +
          s"JOIN $prev d ON u.src = d.node " +
          s"UNION ALL SELECT node, dist FROM $prev) GROUP BY 1)"
      "WITH docs AS (SELECT doc_id FROM documents), " +
        "nn AS (SELECT count(*) AS n FROM docs), " +
        "ring AS (SELECT doc_id AS src, (doc_id + 1) % n AS dst " +
        "FROM docs, nn), " +
        "core AS (SELECT src, (src + j) % 40 AS dst FROM " +
        "(SELECT doc_id AS src FROM docs WHERE doc_id < 40), " +
        "(SELECT unnest([2, 3, 4]) AS j)), " +
        "e0 AS (SELECT src, dst FROM ring UNION ALL " +
        "SELECT src, dst FROM core), " +
        "und AS (SELECT DISTINCT src, dst FROM " +
        "(SELECT src, dst FROM e0 WHERE src <> dst " +
        "UNION ALL SELECT dst AS src, src AS dst FROM e0 " +
        "WHERE src <> dst)), " +
        "d0 AS (SELECT doc_id AS node, CAST(0 AS BIGINT) AS dist " +
        "FROM docs WHERE doc_id < 3), " +
        s"${relax("d0", "d1")}, ${relax("d1", "d2")}, " +
        s"${relax("d2", "d3")}, ${relax("d3", "d4")} " +
        "SELECT node, dist FROM d4 ORDER BY node"
    },

    // ROC-AUC via the rank-sum identity: tied-rank U of positives over
    // negatives divided by n+·n−.
    "q199_auc" ->
      ("WITH d AS (SELECT ((l_orderkey * 7 + l_linenumber) % 100) / 100.0 " +
        "AS v, CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS ia, " +
        "CASE WHEN l_quantity > 25 THEN 0 ELSE 1 END AS ib " +
        "FROM lineitem), " +
        "p AS (SELECT v, sum(ia) AS ca, sum(ib) AS cb, count(*) AS t " +
        "FROM d GROUP BY 1), " +
        "r AS (SELECT *, sum(t) OVER (ORDER BY v) AS cum FROM p), " +
        "a AS (SELECT sum(ca) AS na, sum(cb) AS nb, " +
        "sum(ca * ((cum - t) + (t + 1) / 2.0)) AS rsa FROM r) " +
        "SELECT CAST(na AS BIGINT) AS n_pos, CAST(nb AS BIGINT) AS n_neg, " +
        "round((rsa - na * (na + 1) / 2.0) / " +
        "(CAST(na AS DOUBLE) * nb), 6) AS auc FROM a"),

    // PR curve: per-threshold descending cumulative TP/FP, precision /
    // recall / F1.
    "q200_pr_curve" ->
      ("WITH d AS (SELECT ((l_orderkey * 7 + l_linenumber) % 100) / 100.0 " +
        "AS threshold, CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS y " +
        "FROM lineitem), " +
        "p AS (SELECT threshold, CAST(sum(y) AS BIGINT) AS pos, " +
        "CAST(sum(1 - y) AS BIGINT) AS neg FROM d GROUP BY 1), " +
        "t AS (SELECT CAST(sum(pos) AS DOUBLE) AS ptot FROM p), " +
        "c AS (SELECT threshold, " +
        "CAST(sum(pos) OVER (ORDER BY threshold DESC) AS BIGINT) AS tp, " +
        "CAST(sum(neg) OVER (ORDER BY threshold DESC) AS BIGINT) AS fp " +
        "FROM p), " +
        "f AS (SELECT threshold, tp, fp, " +
        "tp / CAST(tp + fp AS DOUBLE) AS prec, tp / ptot AS rec " +
        "FROM c, t) " +
        "SELECT round(threshold, 2) AS threshold, tp, fp, " +
        "round(prec, 6) AS precision, round(rec, 6) AS recall, " +
        "round(CASE WHEN prec + rec > 0 THEN 2.0 * prec * rec / " +
        "(prec + rec) ELSE 0.0 END, 6) AS f1 " +
        "FROM f ORDER BY threshold"),

    // Spearman: tied-average ranks via value-domain collapse, Pearson
    // of ranks.
    "q197_spearman" ->
      ("WITH d AS (SELECT CAST(l_quantity AS DOUBLE) AS x, " +
        "CAST(l_discount AS DOUBLE) AS y FROM lineitem), " +
        "rx AS (SELECT x AS v, count(*) AS t FROM d GROUP BY 1), " +
        "rxx AS (SELECT v, (sum(t) OVER (ORDER BY v) - t) + (t + 1) / 2.0 " +
        "AS r FROM rx), " +
        "ry AS (SELECT y AS v, count(*) AS t FROM d GROUP BY 1), " +
        "ryy AS (SELECT v, (sum(t) OVER (ORDER BY v) - t) + (t + 1) / 2.0 " +
        "AS r FROM ry) " +
        "SELECT CAST(count(*) AS BIGINT) AS n, " +
        "round(corr(rxx.r, ryy.r), 6) AS rho " +
        "FROM d JOIN rxx ON d.x = rxx.v JOIN ryy ON d.y = ryy.v"),

    // Kaplan-Meier over inter-event gaps (10-min grain, final gap to the
    // horizon censored): risk-set running sums, survival product with
    // the explicit zero-factor pin.
    "q198_kaplan_meier" ->
      ("WITH e AS (SELECT user_id, event_id, floor(epoch(ts)) AS t " +
        "FROM events), " +
        "h AS (SELECT floor(epoch(max(ts))) AS hmax FROM events), " +
        "g AS (SELECT t, lead(t) OVER (PARTITION BY user_id " +
        "ORDER BY t, event_id) AS nxt FROM e), " +
        "s AS (SELECT floor((COALESCE(nxt, hmax) - t) / 600) AS d, " +
        "CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev FROM g, h), " +
        "per AS (SELECT d AS t, CAST(sum(ev) AS BIGINT) AS n_events, " +
        "CAST(sum(1 - ev) AS BIGINT) AS n_censored FROM s GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(n_events + n_censored) AS BIGINT) " +
        "AS total FROM per), " +
        "rk AS (SELECT t, n_events, n_censored, " +
        "CAST(total - sum(n_events + n_censored) OVER (ORDER BY t) " +
        "+ n_events + n_censored AS BIGINT) AS n_at_risk FROM per, tot), " +
        "sv AS (SELECT *, sum(CASE WHEN n_events >= n_at_risk THEN 1 " +
        "ELSE 0 END) OVER (ORDER BY t) AS hz, " +
        "exp(sum(CASE WHEN n_events > 0 AND n_events < n_at_risk THEN " +
        "ln(1.0 - n_events / CAST(n_at_risk AS DOUBLE)) ELSE 0.0 END) " +
        "OVER (ORDER BY t)) AS sraw FROM rk) " +
        "SELECT CAST(t AS BIGINT) AS t, n_at_risk, n_events, n_censored, " +
        "round(CASE WHEN hz > 0 THEN 0.0 ELSE sraw END, 6) AS survival " +
        "FROM sv WHERE n_events > 0 ORDER BY t"),

    // Geo proximity: the oracle is the PLAIN all-pairs cross join with
    // the identical haversine grouping — hash match proves the grid
    // blocking loses no pair.
    "q196_geo_pairs" ->
      ("WITH p AS (SELECT c_custkey AS id, " +
        "c_custkey % 1000 * 0.01 AS lat, " +
        "floor(c_custkey / 1000.0) * 0.5 AS lon " +
        "FROM customer), " +
        "j AS (SELECT a.id AS id_a, b.id AS id_b, " +
        "2 * 6371.0 * asin(sqrt(power(sin((b.lat - a.lat) * (PI() / 180) " +
        "/ 2), 2) + cos(a.lat * (PI() / 180)) * cos(b.lat * (PI() / 180)) " +
        "* power(sin((b.lon - a.lon) * (PI() / 180) / 2), 2))) AS km " +
        "FROM p a JOIN p b ON a.id < b.id) " +
        "SELECT id_a, id_b, round(km, 4) AS km FROM j WHERE km <= 5.0 " +
        "ORDER BY 1, 2"),

    // MV rewrite: the oracle is the PLAIN base-table aggregation — the
    // engine answers it from the materialized rollup (plan-asserted in
    // the query), so the hash match proves navigation correctness.
    "q195_mv_rewrite" ->
      ("SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "round(avg(l_extendedprice), 4) AS avg_price, " +
        "round(min(l_extendedprice), 2) AS min_price, " +
        "round(max(l_extendedprice), 2) AS max_price " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),

    // Observed metrics: the CollectMetrics side channel must equal the
    // plain aggregates (sum rounded half-up to match the driver render).
    "q194_observe" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(count(*) - count(o_orderpriority) AS BIGINT) " +
        "AS n_null_priority, " +
        "round(sum(o_totalprice), 2) AS sum_totalprice FROM orders"),

    // Column profile: per-column counts + native-type extremes rendered
    // as VARCHAR (int/string columns only — double rendering differs).
    "q193_profile" -> {
      // "column" is reserved in DuckDB → quoted alias
      def one(c: String) =
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n, """ +
          s"CAST(count(*) - count($c) AS BIGINT) AS n_null, " +
          s"CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct, " +
          s"CAST(min($c) AS VARCHAR) AS min_value, " +
          s"CAST(max($c) AS VARCHAR) AS max_value FROM customer"
      Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
        .map(one).mkString("", " UNION ALL ", """ ORDER BY "column"""")
    },

    // OOV rate: top-500 vocab of even docs (shared head-cut order),
    // token-marked left join, per-doc rollup.
    "q188_oov_rate" ->
      ("WITH v AS (SELECT tok AS token FROM (SELECT tok, count(*) AS n " +
        "FROM (SELECT unnest(list_filter(string_split(text, ' '), " +
        "x -> len(x) > 0)) AS tok FROM documents WHERE doc_id % 2 = 0) " +
        "GROUP BY 1 ORDER BY n DESC, tok LIMIT 500)), " +
        "t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), " +
        "x -> len(x) > 0)) AS token FROM documents WHERE doc_id % 2 = 1), " +
        "m AS (SELECT doc_id, CASE WHEN v.token IS NULL THEN 1 ELSE 0 END " +
        "AS oov FROM t LEFT JOIN v USING (token)) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "CAST(sum(oov) AS BIGINT) AS n_oov, " +
        "round(sum(oov) / CAST(count(*) AS DOUBLE), 6) AS oov_rate " +
        "FROM m GROUP BY 1 ORDER BY doc_id"),

    // Trimmed mean: quantile_cont cuts (≡ Spark percentile), inclusive
    // band membership, conditional mean.
    "q189_trimmed_mean" ->
      ("WITH c AS (SELECT l_returnflag, " +
        "quantile_cont(l_extendedprice, 0.05) AS lo_cut, " +
        "quantile_cont(l_extendedprice, 0.95) AS hi_cut " +
        "FROM lineitem GROUP BY 1) " +
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN l_extendedprice BETWEEN lo_cut AND hi_cut " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
        "round(lo_cut, 4) AS lo_cut, round(hi_cut, 4) AS hi_cut, " +
        "round(avg(CASE WHEN l_extendedprice BETWEEN lo_cut AND hi_cut " +
        "THEN l_extendedprice END), 4) AS trimmed_mean " +
        "FROM lineitem JOIN c USING (l_returnflag) " +
        "GROUP BY 1, lo_cut, hi_cut ORDER BY 1"),

    // Blocked linear MMD²: 8-id blocks, two smallest ids per side, RBF
    // kernel on double-cast elements in array order.
    "q190_mmd_drift" -> {
      def l2(a: String, b: String): String =
        s"list_sum(list_transform(list_zip($a, $b), " +
          "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
          "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
      def side(par: Int, tag: String): String =
        s"$tag AS (SELECT blk, " +
          s"first(embedding) FILTER (rn = 1) AS ${tag}1, " +
          s"first(embedding) FILTER (rn = 2) AS ${tag}2 FROM " +
          "(SELECT vec_id // 8 AS blk, embedding, row_number() OVER " +
          "(PARTITION BY vec_id // 8 ORDER BY vec_id) AS rn " +
          s"FROM embeddings WHERE vec_id % 2 = $par) " +
          s"WHERE rn <= 2 GROUP BY 1 HAVING count(*) = 2)"
      s"WITH ${side(0, "x")}, ${side(1, "y")}, " +
        "h AS (SELECT " +
        s"exp(-0.02 * ${l2("x1", "x2")}) + exp(-0.02 * ${l2("y1", "y2")}) " +
        s"- exp(-0.02 * ${l2("x1", "y2")}) - exp(-0.02 * ${l2("x2", "y1")}) " +
        "AS h FROM x JOIN y USING (blk)) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_blocks, " +
        "round(avg(h), 8) AS mmd2 FROM h"
    },

    // Gini over the top-1000 vocabulary: shared (n desc, tok) head cut,
    // ascending-rank Σ(2i−n−1)xᵢ arithmetic.
    "q183_gini" ->
      ("WITH c AS (SELECT tok, count(*) AS n FROM " +
        "(SELECT unnest(list_filter(string_split(text, ' '), " +
        "x -> len(x) > 0)) AS tok FROM documents) GROUP BY 1 " +
        "ORDER BY n DESC, tok LIMIT 1000), " +
        "r AS (SELECT n, row_number() OVER (ORDER BY n ASC, tok ASC) " +
        "AS i FROM c), " +
        "t AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens, " +
        "CAST(sum(n) AS BIGINT) AS total_count FROM c) " +
        "SELECT n_tokens, total_count, " +
        "round(sum((2 * i - n_tokens - 1) * CAST(n AS DOUBLE)) / " +
        "(n_tokens * total_count), 6) AS gini " +
        "FROM r, t GROUP BY 1, 2"),

    // Mahalanobis via the 2×2 closed-form inverse from the same
    // population moments (det factored last; 5dp absorbs the grouping).
    "q184_mahalanobis" ->
      ("WITH m AS (SELECT avg(c_acctbal) AS m1, " +
        "avg(CAST(c_nationkey AS DOUBLE)) AS m2, " +
        "var_pop(c_acctbal) AS s11, " +
        "covar_pop(c_acctbal, CAST(c_nationkey AS DOUBLE)) AS s12, " +
        "var_pop(CAST(c_nationkey AS DOUBLE)) AS s22 FROM customer), " +
        "p AS (SELECT c_custkey, c_acctbal AS x1, " +
        "CAST(c_nationkey AS DOUBLE) AS x2 FROM customer) " +
        "SELECT c_custkey, " +
        "round(((x1 - m1) * (s22 * (x1 - m1) - s12 * (x2 - m2)) + " +
        "(x2 - m2) * (s11 * (x2 - m2) - s12 * (x1 - m1))) / " +
        "(s11 * s22 - s12 * s12), 5) AS md2 " +
        "FROM p, m ORDER BY c_custkey"),

    // Delta-join maintenance identity: the oracle is the PLAIN full
    // join — the Spark side assembles it as snapshot-join ∪ the three
    // delta terms, so the hash match proves the algebra.
    "q185_delta_join" ->
      ("SELECT o_orderstatus, c_mktsegment, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "round(sum(o_totalprice), 2) AS total " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),

    // Int8 min-max quantization: per-dim extents from unnest +
    // generate_subscripts (DuckDB 1.0 lacks WITH ORDINALITY), identical
    // floor(+0.5) code rule, exploded to scalar (vec_id, dim, code) rows
    // — the driver comparator cannot sort array cells (r10 q186 err).
    // Spark dims are 0-based posexplode, so subtract 1 from the subscript.
    "q186_quantize_int8" ->
      ("WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x, " +
        "generate_subscripts(embedding, 1) AS i FROM embeddings), " +
        "st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM e GROUP BY 1) " +
        "SELECT vec_id, CAST(e.i - 1 AS INT) AS dim, " +
        "CASE WHEN mx - mn > 0 THEN " +
        "CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS INT) " +
        "ELSE 0 END AS code FROM e JOIN st USING (i) " +
        "ORDER BY vec_id, dim"),

    // Finite-window normalized EWMA via the offset self-join formulation
    // (weights power(0.7, offset) over the trailing 10 rows per user).
    "q182_ewma" ->
      ("WITH r AS (SELECT event_id, user_id, value, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events), " +
        "p AS (SELECT a.event_id, power(0.7, a.rn - b.rn) AS w, " +
        "b.value AS x FROM r a JOIN r b ON a.user_id = b.user_id " +
        "AND b.rn BETWEEN a.rn - 10 AND a.rn) " +
        "SELECT event_id, round(sum(w * x) / sum(w), 4) AS ewma " +
        "FROM p GROUP BY 1 ORDER BY event_id"),

    // Native Jaro/Jaro-Winkler vs DuckDB's own implementations over the
    // distinct part-name vocabulary — the expression-equivalence anchor.
    "q201_jaro_winkler" ->
      ("WITH n AS (SELECT DISTINCT p_name AS name FROM part), " +
        "j AS (SELECT a.name AS name_a, b.name AS name_b, " +
        "round(jaro_similarity(a.name, b.name), 6) AS jaro, " +
        "round(jaro_winkler_similarity(a.name, b.name), 6) AS jw " +
        "FROM n a JOIN n b ON a.name < b.name) " +
        "SELECT * FROM j WHERE jw >= 0.5 ORDER BY 1, 2"),

    // Record linkage: the oracle replays the engine's multi-pass blocking
    // (prefix-4, suffix-4, middle-tokens) verbatim, so the hash match is
    // an equivalence proof of the blocking join + native JW + threshold.
    "q202_entity_match" ->
      (s"WITH $linkageCtes " +
        "SELECT id_a, id_b, " +
        "round(jaro_winkler_similarity(ka, kb), 6) AS jw FROM cand " +
        "WHERE round(jaro_winkler_similarity(ka, kb), 6) >= 0.9 " +
        "ORDER BY 1, 2"),

    // Entity resolution: recursive-CTE closure (q77 pattern) over the
    // identically-blocked JW >= 0.94 pair set; entity = min reachable id,
    // golden record = the min id's key.
    "q203_entity_resolve" ->
      (s"WITH RECURSIVE $linkageCtes, " +
        "p AS (SELECT id_a, id_b FROM cand " +
        "WHERE round(jaro_winkler_similarity(ka, kb), 6) >= 0.94), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM p " +
        "UNION ALL SELECT id_b, id_a FROM p), " +
        "reach AS (SELECT id AS src, id AS dst FROM allr " +
        "UNION SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a), " +
        "lab AS (SELECT src AS id, min(dst) AS entity FROM reach GROUP BY 1), " +
        "sz AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_records " +
        "FROM lab GROUP BY 1) " +
        "SELECT l.id, k.key, l.entity, sz.n_records, g.key AS golden_key " +
        "FROM lab l JOIN allr k ON l.id = k.id " +
        "JOIN sz ON l.entity = sz.entity " +
        "JOIN allr g ON l.entity = g.id ORDER BY l.id"),

    // Aho-Corasick termlist tagging: oracle is the k-way `contains` join
    // over the same top-20 shingle termlist — single-pass automaton ≡ k
    // substring scans.
    "q204_phrase_match" ->
      ("WITH toks AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "sh AS (SELECT doc_id, unnest([array_to_string(t[i:i+2], ' ') " +
        "for i in range(1, len(t) - 1)]) AS s FROM toks WHERE len(t) >= 3), " +
        "terms AS (SELECT s AS term FROM sh GROUP BY s " +
        "ORDER BY count(*) DESC, s LIMIT 20), " +
        "m AS (SELECT d.doc_id, t.term FROM documents d " +
        "JOIN terms t ON contains(lower(d.text), t.term)) " +
        "SELECT d.doc_id, CAST(count(m.term) AS BIGINT) AS n_matched, " +
        "coalesce(array_to_string(list_sort(list(m.term) " +
        "FILTER (WHERE m.term IS NOT NULL)), '|'), '') AS matched " +
        "FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id " +
        "GROUP BY 1 ORDER BY 1"),

    // Seasonal decomposition: hourly grid aggregate + period-partitioned
    // window mean (bin % 24), residual from the unrounded parts.
    "q205_seasonal" ->
      ("WITH s AS (SELECT CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) " +
        "AS bin, avg(value) AS observed FROM events GROUP BY 1), " +
        "p AS (SELECT bin, CAST(bin % 24 AS INT) AS pos, observed, " +
        "avg(observed) OVER (PARTITION BY bin % 24) AS seasonal FROM s) " +
        "SELECT bin, pos, round(observed, 6) AS observed, " +
        "round(seasonal, 6) AS seasonal, " +
        "round(round(observed, 6) - round(seasonal, 6), 6) AS residual " +
        "FROM p ORDER BY bin"),

    // Seasonally-adjusted anomalies: z vs the hour-of-day baseline
    // (mean/σ_pop per period position), membership on the 6dp-rounded z.
    "q206_seasonal_anomaly" ->
      ("WITH s AS (SELECT CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) " +
        "AS bin, avg(value) AS observed FROM events GROUP BY 1), " +
        "p AS (SELECT bin, CAST(bin % 24 AS INT) AS pos, observed, " +
        "avg(observed) OVER (PARTITION BY bin % 24) AS mu, " +
        "stddev_pop(observed) OVER (PARTITION BY bin % 24) AS sd FROM s) " +
        "SELECT bin, pos, round(observed, 6) AS observed, " +
        "round((observed - mu) / sd, 6) AS z FROM p " +
        "WHERE sd > 0 AND abs(round((observed - mu) / sd, 6)) >= 1.5 " +
        "ORDER BY bin"),

    // CUSUM closed form: S_i = P_i − min(0, running-min P) per direction
    // over per-type daily standardized means.
    "q207_cusum" ->
      ("WITH s AS (SELECT event_type AS key, " +
        "CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS bin, " +
        "avg(value) AS x FROM events GROUP BY 1, 2), " +
        "m AS (SELECT *, avg(x) OVER (PARTITION BY key) AS mu, " +
        "stddev_pop(x) OVER (PARTITION BY key) AS sd FROM s), " +
        "d AS (SELECT key, bin, x, (x - mu) / sd - 0.5 AS dp, " +
        "-((x - mu) / sd) - 0.5 AS dn FROM m WHERE sd > 0), " +
        "r AS (SELECT key, bin, x, " +
        "sum(dp) OVER (PARTITION BY key ORDER BY bin) AS pp, " +
        "sum(dn) OVER (PARTITION BY key ORDER BY bin) AS pn FROM d), " +
        "f AS (SELECT key, bin, x, " +
        "round(pp - least(0.0, min(pp) OVER (PARTITION BY key ORDER BY bin)), 6) AS s_pos, " +
        "round(pn - least(0.0, min(pn) OVER (PARTITION BY key ORDER BY bin)), 6) AS s_neg " +
        "FROM r) " +
        "SELECT key, bin, round(x, 6) AS x, s_pos, s_neg, " +
        "CAST(s_pos > 4.0 OR s_neg > 4.0 AS INT) AS change " +
        "FROM f ORDER BY 1, 2"),

    // Two-sample KS: per-value counts → ECDF running sums → sup gap →
    // the 50-term Kolmogorov series. Every stage mirrors Stats.ksTest;
    // the series terms are exact ±1 powers times exp() of identical
    // doubles, so round-4 on p is far outside any libm ulp drift.
    "q208_ks_test" ->
      ("WITH f AS (SELECT floor(value) AS v, event_type FROM events " +
        "WHERE event_type IN ('purchase', 'view')), " +
        "p AS (SELECT v, " +
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb " +
        "FROM f GROUP BY 1), " +
        "c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS fa, " +
        "sum(cb) OVER (ORDER BY v) AS fb FROM p), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM p), " +
        "d AS (SELECT max(na) AS na, max(nb) AS nb, " +
        "max(abs(CAST(fa AS DOUBLE) / na - CAST(fb AS DOUBLE) / nb)) " +
        "AS dstat FROM c, t), " +
        "m AS (SELECT *, (sqrt(ne) + 0.12 + 0.11 / sqrt(ne)) * dstat " +
        "AS lam FROM (SELECT *, " +
        "na * CAST(nb AS DOUBLE) / (na + nb) AS ne FROM d)), " +
        "s AS (SELECT na, nb, dstat, " +
        "2 * sum(power(-1.0, k - 1) * exp(-2.0 * k * k * lam * lam)) " +
        "AS ser FROM m, range(1, 51) r(k) GROUP BY 1, 2, 3) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "round(dstat, 6) AS d_stat, " +
        "round(least(1.0, greatest(0.0, ser)), 4) AS p_value FROM s"),

    // Kendall τ-b from the joint contingency table — the oracle is the
    // SAME domain²-cell-pair join the engine runs (never O(N²) rows);
    // all pair products are integer-valued doubles < 2^53 at oracle
    // scale, so the sums are exact in any order.
    "q209_kendall_tau" ->
      ("WITH j AS (SELECT CAST(l_quantity AS DOUBLE) AS x, " +
        "CAST(l_discount AS DOUBLE) AS y, count(*) AS n " +
        "FROM lineitem GROUP BY 1, 2), " +
        "p AS (SELECT " +
        "sum(CASE WHEN b.y > a.y THEN CAST(a.n AS DOUBLE) * b.n " +
        "ELSE 0 END) AS c, " +
        "sum(CASE WHEN b.y < a.y THEN CAST(a.n AS DOUBLE) * b.n " +
        "ELSE 0 END) AS d " +
        "FROM j a JOIN j b ON b.x > a.x AND b.y <> a.y), " +
        "tx AS (SELECT sum(CAST(m AS DOUBLE) * (m - 1) / 2) AS t FROM " +
        "(SELECT x, sum(n) AS m FROM j GROUP BY 1)), " +
        "ty AS (SELECT sum(CAST(m AS DOUBLE) * (m - 1) / 2) AS t FROM " +
        "(SELECT y, sum(n) AS m FROM j GROUP BY 1)), " +
        "tot AS (SELECT sum(n) AS n FROM j) " +
        "SELECT CAST(tot.n AS BIGINT) AS n, " +
        "round((p.c - p.d) / sqrt(" +
        "(CAST(tot.n AS DOUBLE) * (tot.n - 1) / 2 - tx.t) * " +
        "(CAST(tot.n AS DOUBLE) * (tot.n - 1) / 2 - ty.t)), 6) AS tau_b " +
        "FROM p, tx, ty, tot"),

    // Decile lift/gain: same deterministic score/label as q170/q199,
    // descending-threshold running sums, each decile picks the first
    // threshold whose cumulative rows reach k·N/10 (cum_rows is strictly
    // increasing across thresholds, so the join-back is unique).
    "q210_lift_gain" ->
      ("WITH s AS (SELECT ((l_orderkey * 7 + l_linenumber) % 100) / 100.0 " +
        "AS v, CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS lbl " +
        "FROM lineitem), " +
        "p AS (SELECT v, count(*) AS t, sum(lbl) AS pos FROM s GROUP BY 1), " +
        "c AS (SELECT v, sum(t) OVER (ORDER BY v DESC) AS cum_rows, " +
        "sum(pos) OVER (ORDER BY v DESC) AS cum_pos FROM p), " +
        "tot AS (SELECT max(cum_rows) AS n, max(cum_pos) AS np FROM c), " +
        "pick AS (SELECT CAST(k AS INT) AS decile, " +
        "min(cum_rows) AS cr FROM range(1, 11) r(k), tot, c " +
        "WHERE cum_rows * 10 >= k * tot.n GROUP BY 1) " +
        "SELECT decile, CAST(pick.cr AS BIGINT) AS cum_rows, " +
        "CAST(c.cum_pos AS BIGINT) AS cum_pos, " +
        "round(CAST(c.cum_pos AS DOUBLE) / tot.np, 6) AS gain, " +
        "round((CAST(c.cum_pos AS DOUBLE) / pick.cr) / " +
        "(CAST(tot.np AS DOUBLE) / tot.n), 6) AS lift " +
        "FROM pick, tot, c WHERE c.cum_rows = pick.cr ORDER BY decile"),

    // URL curation: the oracle replays EVERY regexp of Urls.canonicalize
    // / registeredDomain plus the q100 md5 cap — a per-row equivalence
    // proof of the whole canonicalization chain. DuckDB regexp_replace
    // needs the explicit 'g' flag where Spark replaces all matches (the
    // tracking-param strip is the only multi-match pattern here).
    "q211_url_curation" ->
      ("WITH raw AS (SELECT doc_id, 'HTTPS://WWW.' || source || " +
        "CASE WHEN doc_id % 3 = 0 THEN '.Example.COM:443' " +
        "WHEN doc_id % 3 = 1 THEN '.sample.CO.UK:443' " +
        "ELSE '.test.ORG' END || " +
        "'/Docs/' || CAST(doc_id AS VARCHAR) || " +
        "CASE WHEN doc_id % 4 = 0 THEN '/?utm_source=feed&utm_campaign=c' " +
        "|| CAST(doc_id % 5 AS VARCHAR) " +
        "WHEN doc_id % 4 = 1 THEN '?id=' || CAST(doc_id % 7 AS VARCHAR) " +
        "|| '&utm_medium=email' " +
        "WHEN doc_id % 4 = 2 THEN '/' ELSE '?a=1&b=2' END || " +
        "CASE WHEN doc_id % 3 = 0 THEN '#sec' ELSE '' END AS u0 " +
        "FROM documents), " +
        "s1 AS (SELECT doc_id, regexp_replace(u0, '#.*$', '') AS u " +
        "FROM raw), " +
        "parsed AS (SELECT doc_id, " +
        "lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) " +
        "AS sch, " +
        "lower(regexp_extract(u, " +
        "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hp, " +
        "regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1) " +
        "AS rest FROM s1), " +
        "parts AS (SELECT doc_id, sch, " +
        "regexp_replace(regexp_replace(hp, ':[0-9]+$', ''), " +
        "'^www\\.', '') AS host, " +
        "regexp_extract(hp, ':([0-9]+)$', 1) AS prt, " +
        "regexp_extract(rest, '^([^?]*)', 1) AS path, " +
        "regexp_extract(rest, '\\?(.*)$', 1) AS query FROM parsed), " +
        "clean AS (SELECT doc_id, sch, host, prt, " +
        "CASE WHEN regexp_replace(path, '/$', '') = '' THEN '/' " +
        "ELSE regexp_replace(path, '/$', '') END AS cpath, " +
        "regexp_replace(regexp_replace(query, " +
        "'(?:^|&)(?:utm_[A-Za-z]+|fbclid|gclid|msclkid|mc_eid|igshid)" +
        "=[^&]*', '', 'g'), '^&', '') AS cq FROM parts), " +
        "canon AS (SELECT doc_id, sch || '://' || host || " +
        "CASE WHEN prt <> '' AND NOT ((sch = 'https' AND prt = '443') " +
        "OR (sch = 'http' AND prt = '80')) THEN ':' || prt ELSE '' END " +
        "|| cpath || CASE WHEN cq <> '' THEN '?' || cq ELSE '' END " +
        "AS url, " +
        "CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1) IN " +
        "('co.uk', 'org.uk', 'ac.uk', 'gov.uk', 'com.au', 'net.au', " +
        "'org.au', 'co.jp', 'or.jp', 'ne.jp', 'com.br', 'com.cn', " +
        "'com.mx', 'co.in', 'co.kr', 'co.za', 'com.tr', 'com.ar') " +
        "AND regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1) <> '' " +
        "THEN regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1) " +
        "WHEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1) <> '' " +
        "THEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1) " +
        "ELSE host END AS domain FROM clean), " +
        "capped AS (SELECT doc_id, url, domain, row_number() OVER " +
        "(PARTITION BY domain ORDER BY md5(CAST(doc_id AS VARCHAR)), " +
        "doc_id) AS rn FROM canon) " +
        "SELECT doc_id, url, domain FROM capped WHERE rn <= 60 " +
        "ORDER BY doc_id"),

    // Top 3-step paths: one user-keyed window, two leads, support by
    // distinct users; (n_users DESC, path) is a total order so the
    // top-20 cut is deterministic in both engines.
    "q212_top_paths" ->
      ("WITH o AS (SELECT user_id, event_type AS s1, " +
        "lead(event_type, 1) OVER w AS s2, " +
        "lead(event_type, 2) OVER w AS s3 FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "p AS (SELECT user_id, s1 || '>' || s2 || '>' || s3 AS path " +
        "FROM o WHERE s2 IS NOT NULL AND s3 IS NOT NULL) " +
        "SELECT path, count(DISTINCT user_id) AS n_users, " +
        "count(*) AS n_occurrences FROM p GROUP BY 1 " +
        "ORDER BY n_users DESC, path LIMIT 20"),

    // Signed random projection: DuckDB rebuilds the quadratic-
    // congruential ±1 matrix with integer mod arithmetic and replays the
    // dot product as an in-order list_transform/list_sum — same ascending
    // element order as Spark's aggregate() fold, so the double sums are
    // bit-compatible well inside round-6.
    "q213_random_projection" ->
      ("SELECT vec_id, CAST(j AS INT) AS dim, " +
        "round(list_sum(list_transform(range(1, 65), i -> " +
        "(CASE WHEN ((i-1)*(i-1)*7919 + (i-1+42)*(j+13)*104729 " +
        "+ j*j*131) % 10007 < 5004 THEN 1.0 ELSE -1.0 END) * " +
        "CAST(embedding[i] AS DOUBLE))), 6) AS proj " +
        "FROM embeddings, range(0, 16) r(j) ORDER BY vec_id, dim"),

    // Interpolated Kneser–Ney: q110's n-gram CTEs plus the two fertility
    // tables (distinct continuations per context, distinct contexts per
    // word); the +1/(B+V)-smoothed continuation term matches the engine's
    // documented deviation from the textbook formula.
    "q214_kneser_ney" ->
      ("WITH rt AS (SELECT string_split_regex(lower(trim(text)), '\\s+') " +
        "AS t FROM documents WHERE source IN " +
        "('src0','src1','src2','src3','src4') " +
        "AND length(trim(text)) > 0), " +
        "c1 AS (SELECT tok, count(*) AS c FROM " +
        "(SELECT unnest(t) AS tok FROM rt) GROUP BY 1), " +
        "c2 AS (SELECT bg, count(*) AS c FROM " +
        "(SELECT unnest([array_to_string(t[i:i+1], ' ') " +
        "for i in range(1, len(t))]) AS bg FROM rt WHERE len(t) >= 2) " +
        "GROUP BY 1), " +
        "fert AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS f " +
        "FROM c2 GROUP BY 1), " +
        "cont AS (SELECT split_part(bg, ' ', 2) AS w2, count(*) AS f " +
        "FROM c2 GROUP BY 1), " +
        "s AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM c2) AS b, " +
        "(SELECT CAST(count(*) AS DOUBLE) FROM c1) AS v), " +
        "dt AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents WHERE length(trim(text)) > 0), " +
        "db AS (SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ') " +
        "for i in range(1, len(t))]) AS bg FROM dt WHERE len(t) >= 2) " +
        "SELECT db.doc_id, round(avg(-ln(" +
        "CASE WHEN c1a.c IS NULL OR fert.f IS NULL " +
        "THEN (coalesce(cont.f, 0) + 1.0) / (s.b + s.v) " +
        "ELSE greatest(coalesce(c2.c, 0) - 0.75, 0) / c1a.c " +
        "+ 0.75 * fert.f / c1a.c * " +
        "((coalesce(cont.f, 0) + 1.0) / (s.b + s.v)) END)), 4) AS nll_kn, " +
        "CAST(count(*) AS BIGINT) AS n_bigrams " +
        "FROM db LEFT JOIN c2 ON db.bg = c2.bg " +
        "LEFT JOIN c1 c1a ON split_part(db.bg, ' ', 1) = c1a.tok " +
        "LEFT JOIN fert ON split_part(db.bg, ' ', 1) = fert.w1 " +
        "LEFT JOIN cont ON split_part(db.bg, ' ', 2) = cont.w2 " +
        "CROSS JOIN s GROUP BY 1 ORDER BY 1"),

    // Quantile normalization: per-group midpoint ECDF, global ECDF over
    // the same distinct-value table, inverse CDF via min-over-inequality
    // — every division is the same exact-integer-over-double quotient in
    // both engines, so the >= boundary decisions agree bitwise.
    "q215_quantile_norm" ->
      ("WITH per AS (SELECT event_type AS g, floor(value) AS v, " +
        "count(*) AS t FROM events GROUP BY 1, 2), " +
        "grp AS (SELECT g, v, t, " +
        "sum(t) OVER (PARTITION BY g ORDER BY v) AS cum, " +
        "sum(t) OVER (PARTITION BY g) AS n FROM per), " +
        "gp AS (SELECT g, v, (cum - t / 2.0) / n AS p FROM grp), " +
        "gl AS (SELECT v AS gv, sum(t) AS gt FROM per GROUP BY 1), " +
        "ge AS (SELECT gv, CAST(sum(gt) OVER (ORDER BY gv) AS DOUBLE) / " +
        "(SELECT sum(gt) FROM gl) AS gecdf FROM gl) " +
        "SELECT g AS event_type, v, round(p, 6) AS p, min(gv) AS mapped " +
        "FROM gp JOIN ge ON gecdf >= p GROUP BY 1, 2, 3 ORDER BY 1, 2"),

    // Mutual kNN: q39's cosine ranking on the vec_id%10 subset, then the
    // reciprocity self-join — pairs emit once with both ranks.
    "q216_mutual_knn" ->
      ("WITH c AS (SELECT vec_id, embedding FROM embeddings " +
        "WHERE vec_id % 10 = 0), " +
        "s AS (SELECT a.vec_id AS qid, b.vec_id AS nid, " +
        "list_sum(list_transform(list_zip(a.embedding, b.embedding), " +
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / " +
        "(sqrt(list_sum(list_transform(a.embedding, " +
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
        "sqrt(list_sum(list_transform(b.embedding, " +
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos " +
        "FROM c a, c b WHERE a.vec_id <> b.vec_id), " +
        "r AS (SELECT qid, nid, cos, row_number() OVER " +
        "(PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM s), " +
        "k AS (SELECT * FROM r WHERE rnk <= 5) " +
        "SELECT x.qid AS id_a, x.nid AS id_b, round(x.cos, 6) AS cos, " +
        "CAST(x.rnk AS BIGINT) AS rank_ab, " +
        "CAST(y.rnk AS BIGINT) AS rank_ba " +
        "FROM k x JOIN k y ON x.qid = y.nid AND x.nid = y.qid " +
        "WHERE x.qid < x.nid ORDER BY 1, 2"),

    // Welch's t + Cohen's d from one conditional-moment aggregate.
    "q217_welch_t" ->
      ("WITH m AS (SELECT " +
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS na, " +
        "sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS nb, " +
        "avg(CASE WHEN event_type = 'purchase' THEN value END) AS ma, " +
        "avg(CASE WHEN event_type = 'view' THEN value END) AS mb, " +
        "var_samp(CASE WHEN event_type = 'purchase' THEN value END) " +
        "AS va, " +
        "var_samp(CASE WHEN event_type = 'view' THEN value END) AS vb " +
        "FROM events WHERE event_type IN ('purchase', 'view')), " +
        "d AS (SELECT *, va / na AS sa, vb / nb AS sb FROM m) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "round(ma, 6) AS mean_a, round(mb, 6) AS mean_b, " +
        "round((ma - mb) / sqrt(sa + sb), 6) AS t, " +
        "round(power(sa + sb, 2) / (power(sa, 2) / (na - 1) + " +
        "power(sb, 2) / (nb - 1)), 4) AS df_welch, " +
        "round((ma - mb) / sqrt(((na - 1) * va + (nb - 1) * vb) / " +
        "(na + nb - 2)), 6) AS cohen_d FROM d"),

    // DP noisy counts: md5 of the \x01-joined (group, salt) key — the
    // same separator the engine uses so multi-column group keys cannot
    // collide on concat — hex digits parsed by ascii code rebuild the
    // identical uniform, then the inverse-CDF Laplace.
    "q218_dp_counts" ->
      ("WITH g AS (SELECT event_type, count(*) AS n_true, " +
        "md5(event_type || chr(1) || 'r0') AS h FROM events GROUP BY 1), " +
        "d AS (SELECT event_type, n_true, " +
        "(CASE WHEN ascii(substr(h, 1, 1)) >= 97 " +
        "THEN ascii(substr(h, 1, 1)) - 87 " +
        "ELSE ascii(substr(h, 1, 1)) - 48 END) * 1048576.0 + " +
        "(CASE WHEN ascii(substr(h, 2, 1)) >= 97 " +
        "THEN ascii(substr(h, 2, 1)) - 87 " +
        "ELSE ascii(substr(h, 2, 1)) - 48 END) * 65536.0 + " +
        "(CASE WHEN ascii(substr(h, 3, 1)) >= 97 " +
        "THEN ascii(substr(h, 3, 1)) - 87 " +
        "ELSE ascii(substr(h, 3, 1)) - 48 END) * 4096.0 + " +
        "(CASE WHEN ascii(substr(h, 4, 1)) >= 97 " +
        "THEN ascii(substr(h, 4, 1)) - 87 " +
        "ELSE ascii(substr(h, 4, 1)) - 48 END) * 256.0 + " +
        "(CASE WHEN ascii(substr(h, 5, 1)) >= 97 " +
        "THEN ascii(substr(h, 5, 1)) - 87 " +
        "ELSE ascii(substr(h, 5, 1)) - 48 END) * 16.0 + " +
        "(CASE WHEN ascii(substr(h, 6, 1)) >= 97 " +
        "THEN ascii(substr(h, 6, 1)) - 87 " +
        "ELSE ascii(substr(h, 6, 1)) - 48 END) * 1.0 AS poly FROM g), " +
        "u AS (SELECT event_type, n_true, " +
        "(poly + 0.5) / 16777216.0 - 0.5 AS uu FROM d) " +
        "SELECT event_type, CAST(n_true AS BIGINT) AS n_true, " +
        "round(n_true - 1.0 * sign(uu) * ln(1 - 2 * abs(uu)), 4) " +
        "AS n_noisy FROM u ORDER BY 1"),

    // CUPED: per-user pre/post sums split at the corpus midpoint epoch,
    // then the raw-moment algebra replayed division-for-division.
    "q219_cuped" ->
      ("WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) " +
        "AS ep, value FROM events), " +
        "md AS (SELECT CAST(floor((min(ep) + max(ep)) / 2.0) AS BIGINT) " +
        "AS mid FROM e), " +
        "pu AS (SELECT user_id, " +
        "sum(CASE WHEN ep <= mid THEN value ELSE 0.0 END) AS x, " +
        "sum(CASE WHEN ep > mid THEN value ELSE 0.0 END) AS y " +
        "FROM e, md GROUP BY 1), " +
        "m AS (SELECT count(*) AS n, " +
        "sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS na, " +
        "sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS nb, " +
        "sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, " +
        "sum(x * x) AS sxx, sum(y * y) AS syy, " +
        "sum(CASE WHEN user_id % 2 = 0 THEN y ELSE 0.0 END) AS sya, " +
        "sum(CASE WHEN user_id % 2 = 0 THEN x ELSE 0.0 END) AS sxa " +
        "FROM pu), " +
        "t AS (SELECT *, sxx / n - (sx / n) * (sx / n) AS varx FROM m), " +
        "t2 AS (SELECT *, CASE WHEN varx > 0 THEN " +
        "(sxy / n - (sx / n) * (sy / n)) / varx ELSE 0.0 END AS theta " +
        "FROM t), " +
        "f AS (SELECT *, sya / na AS mean_a, (sy - sya) / nb AS mean_b, " +
        "(sya - theta * sxa) / na + theta * (sx / n) AS ama, " +
        "((sy - sya) - theta * (sx - sxa)) / nb + theta * (sx / n) " +
        "AS amb, syy / n - (sy / n) * (sy / n) AS vary FROM t2) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "round(theta, 4) AS theta, round(mean_a, 4) AS mean_a, " +
        "round(mean_b, 4) AS mean_b, " +
        "round(mean_a - mean_b, 4) AS diff, " +
        "round(ama - amb, 4) AS adj_diff, " +
        "round(CASE WHEN vary > 0 THEN " +
        "1.0 - (vary - theta * theta * varx) / vary ELSE 0.0 END, 4) " +
        "AS var_reduction FROM f"),

    // Theil–Sen: daily bins, all bin-pair slopes, interpolated medians
    // (quantile_cont matches Spark's exact percentile convention).
    "q220_theil_sen" ->
      ("WITH b AS (SELECT event_type AS k, " +
        "CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS bin, " +
        "avg(value) AS v FROM events GROUP BY 1, 2), " +
        "s AS (SELECT a.k, (b2.v - a.v) / (b2.bin - a.bin) AS sl " +
        "FROM b a JOIN b b2 ON a.k = b2.k AND b2.bin > a.bin), " +
        "m AS (SELECT k, quantile_cont(sl, 0.5) AS slope " +
        "FROM s GROUP BY 1), " +
        "i AS (SELECT b.k, count(*) AS n_bins, " +
        "quantile_cont(b.v - m.slope * b.bin, 0.5) AS intercept " +
        "FROM b JOIN m ON b.k = m.k GROUP BY 1) " +
        "SELECT i.k AS event_type, CAST(n_bins AS BIGINT) AS n_bins, " +
        "round(m.slope, 6) AS slope, round(intercept, 6) AS intercept " +
        "FROM i JOIN m ON i.k = m.k ORDER BY 1"),

    // Sparse TF-IDF cosine join: tf/idf/norms/pair-dots rebuilt from the
    // standard tokenization CTE; the 30% df stopword cap mirrors the
    // engine's maxDfRatio prune exactly.
    "q221_tfidf_cosine" ->
      ("WITH dt AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents WHERE length(trim(text)) > 0), " +
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM " +
        "(SELECT doc_id, unnest(t) AS tok FROM dt) GROUP BY 1, 2), " +
        "nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n " +
        "FROM tf), " +
        "idf AS (SELECT tok, ln(nn.n / count(*)) AS idf FROM tf, nn " +
        "GROUP BY tok, nn.n HAVING count(*) <= nn.n * 0.3), " +
        "w AS (SELECT tf.doc_id, tf.tok, tf.tf * idf.idf AS w " +
        "FROM tf JOIN idf USING (tok)), " +
        "nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nm " +
        "FROM w GROUP BY 1), " +
        "d AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "count(*) AS n_shared_terms, sum(a.w * b.w) AS dot " +
        "FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2) " +
        "SELECT doc_a, doc_b, " +
        "CAST(n_shared_terms AS BIGINT) AS n_shared_terms, " +
        "round(dot / (x.nm * y.nm), 6) AS cos " +
        "FROM d JOIN nrm x ON d.doc_a = x.doc_id " +
        "JOIN nrm y ON d.doc_b = y.doc_id " +
        "WHERE dot / (x.nm * y.nm) >= 0.3 ORDER BY 1, 2"),

    // Split conformal: midrange predictor (exact selections), quantized
    // residual value-domain, order-statistic rank k = ceil((n+1)(1-α)),
    // eval-side coverage.
    "q222_conformal" ->
      ("WITH mn AS (SELECT event_type, (min(value) + max(value)) / 2 " +
        "AS pred FROM events GROUP BY 1), " +
        "b AS (SELECT e.event_id, round(abs(e.value - mn.pred), 6) " +
        "AS res, e.event_id % 2 = 0 AS calib " +
        "FROM events e JOIN mn USING (event_type)), " +
        "p AS (SELECT res, count(*) AS t FROM b WHERE calib GROUP BY 1), " +
        "tt AS (SELECT sum(t) AS n, " +
        "CAST(least(ceil((sum(t) + 1) * 0.9), sum(t)) AS BIGINT) AS k " +
        "FROM p), " +
        "c AS (SELECT res, sum(t) OVER (ORDER BY res) AS cum FROM p), " +
        "q AS (SELECT max(tt.n) AS n_calib, max(tt.k) AS k, " +
        "min(c.res) AS q_hat FROM c, tt WHERE c.cum >= tt.k) " +
        "SELECT CAST(q.n_calib AS BIGINT) AS n_calib, " +
        "CAST(q.k AS BIGINT) AS k, round(q.q_hat, 6) AS q_hat, " +
        "CAST(count(*) AS BIGINT) AS n_eval, " +
        "round(avg(CASE WHEN b.res <= q.q_hat THEN 1.0 ELSE 0.0 END), 6) " +
        "AS coverage FROM b, q WHERE NOT b.calib GROUP BY 1, 2, 3"),

    // Seasonal-naive backtest: bin-keyed season join (never a positional
    // lag — gaps must not shift the season), arithmetic fold edges from
    // per-key min/max bins, sMAPE with the zero-denominator guard.
    "q223_backtest" ->
      ("WITH b AS (SELECT event_type AS k, " +
        "CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS bin, " +
        "avg(value) AS o FROM events GROUP BY 1, 2), " +
        "j AS (SELECT a.k, a.bin, a.o, s.f FROM b a LEFT JOIN " +
        "(SELECT k, bin + 24 AS bin2, o AS f FROM b) s " +
        "ON a.k = s.k AND a.bin = s.bin2), " +
        "e AS (SELECT k, bin, o, f, " +
        "min(bin) OVER (PARTITION BY k) AS lo, " +
        "max(bin) OVER (PARTITION BY k) AS hi FROM j), " +
        "g AS (SELECT k, CAST(least(2, floor((bin - lo) * 3 / " +
        "(hi - lo + 1))) AS INT) AS fold, o, f FROM e " +
        "WHERE f IS NOT NULL AND abs(f) + abs(o) > 0) " +
        "SELECT k AS event_type, fold, " +
        "CAST(count(*) AS BIGINT) AS n_scored, " +
        "round(avg(2.0 * abs(f - o) / (abs(f) + abs(o))), 6) AS smape " +
        "FROM g GROUP BY 1, 2 ORDER BY 1, 2"),

    // Murphy decomposition over the q170/q199 score/label convention;
    // the within-bin gap is reported, not absorbed.
    "q224_brier" ->
      ("WITH s AS (SELECT ((l_orderkey * 7 + l_linenumber) % 100) / 100.0 " +
        "AS sc, CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END AS y " +
        "FROM lineitem), " +
        "p AS (SELECT least(CAST(floor(sc * 10) AS INT), 9) AS bin, " +
        "count(*) AS n, avg(sc) AS conf, avg(y) AS acc, " +
        "sum((sc - y) * (sc - y)) AS se FROM s GROUP BY 1), " +
        "a AS (SELECT sum(n) AS n, sum(se) / sum(n) AS brier, " +
        "sum(n * (conf - acc) * (conf - acc)) / sum(n) AS rel, " +
        "sum(n * acc) / sum(n) AS ybar, " +
        "sum(n * acc * acc) AS nacc2 FROM p), " +
        "f AS (SELECT *, nacc2 / n - ybar * ybar AS res, " +
        "ybar * (1.0 - ybar) AS unc FROM a) " +
        "SELECT CAST(n AS BIGINT) AS n, round(brier, 6) AS brier, " +
        "round(rel, 6) AS reliability, round(res, 6) AS resolution, " +
        "round(unc, 6) AS uncertainty, " +
        "round(brier - rel + res - unc, 6) AS decomposition_gap FROM f"),

    // Interval overlap: the grid join's contract IS the plain inequality
    // join — DuckDB runs it directly (IEJoin); half-open [s, e).
    "q225_interval_overlap" ->
      ("WITH iv AS (SELECT event_id AS id, user_id, " +
        "CAST(floor(epoch(ts)) AS BIGINT) AS s, " +
        "CAST(floor(epoch(ts)) AS BIGINT) + 60 + " +
        "CAST(floor(value * 10) AS BIGINT) AS e FROM events) " +
        "SELECT a.id AS a_id, b.id AS b_id, " +
        "least(a.e, b.e) - greatest(a.s, b.s) AS overlap_sec " +
        "FROM iv a JOIN iv b ON a.user_id = b.user_id AND a.id < b.id " +
        "AND a.s < b.e AND b.s < a.e ORDER BY 1, 2"),

    // MAD outliers: both LOWER medians (smallest value whose doubled
    // cumulative count reaches n) replayed over the quantized domain.
    "q226_mad_outliers" ->
      ("WITH e AS (SELECT event_id, event_type, value FROM events), " +
        "m1 AS (SELECT event_type, round(value, 6) AS v, count(*) AS c " +
        "FROM e GROUP BY 1, 2), " +
        "m2 AS (SELECT event_type, v, " +
        "sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum, " +
        "sum(c) OVER (PARTITION BY event_type) AS n FROM m1), " +
        "med AS (SELECT event_type, min(v) AS med FROM m2 " +
        "WHERE cum * 2 >= n GROUP BY 1), " +
        "r1 AS (SELECT e.event_type, " +
        "round(abs(e.value - med.med), 6) AS v, count(*) AS c " +
        "FROM e JOIN med USING (event_type) GROUP BY 1, 2), " +
        "r2 AS (SELECT event_type, v, " +
        "sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum, " +
        "sum(c) OVER (PARTITION BY event_type) AS n FROM r1), " +
        "mad AS (SELECT event_type, min(v) AS mad FROM r2 " +
        "WHERE cum * 2 >= n GROUP BY 1) " +
        "SELECT e.event_id, e.event_type, round(e.value, 6) AS value, " +
        "round(med.med, 6) AS med, round(mad.mad, 6) AS mad, " +
        "round(CASE WHEN mad.mad > 0 THEN (e.value - med.med) / " +
        "(1.4826 * mad.mad) END, 6) AS robust_z, " +
        "CASE WHEN mad.mad > 0 THEN abs((e.value - med.med) / " +
        "(1.4826 * mad.mad)) > 2.5 " +
        "ELSE round(abs(e.value - med.med), 6) > 0 END AS is_outlier " +
        "FROM e JOIN med USING (event_type) JOIN mad USING (event_type) " +
        "ORDER BY e.event_id"),

    // Padding waste: one bucket-domain aggregate; waste vs bucket max.
    "q227_padding_waste" ->
      ("WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) " +
        "AS n_tokens FROM documents), " +
        "b AS (SELECT CAST(floor(n_tokens / 32) AS BIGINT) AS bucket, " +
        "CAST(count(*) AS BIGINT) AS n_seqs, sum(n_tokens) AS sum_tokens, " +
        "max(n_tokens) AS max_tokens FROM d GROUP BY 1) " +
        "SELECT bucket, bucket * 32 AS bucket_lo, n_seqs, " +
        "CAST(sum_tokens AS BIGINT) AS sum_tokens, max_tokens, " +
        "CAST(n_seqs * max_tokens - sum_tokens AS BIGINT) " +
        "AS padded_tokens, " +
        "round(CAST(n_seqs * max_tokens - sum_tokens AS DOUBLE) / " +
        "(n_seqs * max_tokens), 6) AS waste_ratio " +
        "FROM b ORDER BY bucket"),

    // Linear attribution: same-ts conversions pre-merge, equal split
    // across in-window touches, per-channel fold.
    "q228_linear_attribution" ->
      ("WITH c AS (SELECT user_id, " +
        "CAST(floor(epoch(ts)) AS BIGINT) AS cts, " +
        "count(*) AS nconv, sum(value) AS v FROM events " +
        "WHERE event_type = 'purchase' GROUP BY 1, 2), " +
        "t AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tts, " +
        "event_type AS touch_type FROM events " +
        "WHERE event_type IN ('view', 'click', 'signup')), " +
        "p AS (SELECT c.user_id, c.cts, c.nconv, c.v, t.touch_type " +
        "FROM c JOIN t ON c.user_id = t.user_id " +
        "AND t.tts <= c.cts AND t.tts >= c.cts - 604800), " +
        "s AS (SELECT user_id, cts, count(*) AS n FROM p GROUP BY 1, 2) " +
        "SELECT p.touch_type, " +
        "round(sum(CAST(p.nconv AS DOUBLE) / s.n), 6) " +
        "AS credited_conversions, " +
        "round(sum(p.v / s.n), 6) AS credited_value " +
        "FROM p JOIN s ON p.user_id = s.user_id AND p.cts = s.cts " +
        "GROUP BY 1 ORDER BY 1"),

    // Prefix groups: every md5 at every geometric level replayed; the
    // per-doc max level via arg_max.
    "q229_prefix_groups" ->
      ("WITH d AS (SELECT doc_id, '[' || source || " +
        "'] corpus preamble: license cc-by-4.0, schema v2, " +
        "generator graft, shard 0; ' || text AS t FROM documents), " +
        "l AS (SELECT * FROM (VALUES (32), (64), (128), (256)) " +
        "AS v(len)), " +
        "f AS (SELECT doc_id, len, md5(substr(t, 1, len)) AS fp " +
        "FROM d JOIN l ON length(t) >= len), " +
        "g AS (SELECT len, fp, count(*) AS n FROM f GROUP BY 1, 2 " +
        "HAVING count(*) >= 2), " +
        "j AS (SELECT f.doc_id, f.len, f.fp, g.n " +
        "FROM f JOIN g USING (len, fp)) " +
        "SELECT doc_id, CAST(max(len) AS INT) AS prefix_len, " +
        "arg_max(fp, len) AS group_id, " +
        "CAST(arg_max(n, len) AS BIGINT) AS group_size " +
        "FROM j GROUP BY 1 ORDER BY 1"),

    // Out-of-order audit on the jittered feed: lag + running max over
    // the arrival order, then per-user fold.
    "q230_out_of_order" ->
      ("WITH e AS (SELECT user_id, event_id, " +
        "CAST(floor(epoch(ts)) AS BIGINT) + " +
        "(event_id % 5 - 2) * 90 AS ts FROM events), " +
        "x AS (SELECT user_id, ts, " +
        "lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev, " +
        "max(ts) OVER (PARTITION BY user_id ORDER BY event_id " +
        "ROWS UNBOUNDED PRECEDING) AS hwm FROM e) " +
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, " +
        "CAST(sum(CASE WHEN ts < prev THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_inversions, " +
        "round(CAST(sum(CASE WHEN ts < prev THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / greatest(count(prev), 1), 6) AS inversion_rate, " +
        "CAST(max(CASE WHEN ts < prev THEN prev - ts ELSE 0 END) " +
        "AS BIGINT) AS max_backstep_sec, " +
        "CAST(max(hwm - ts) AS BIGINT) AS max_watermark_lag_sec " +
        "FROM x GROUP BY 1 ORDER BY 1"),

    // Winsorize: lower-value-at-rank cuts at ceil(p*n), clamp.
    "q231_winsorize" ->
      ("WITH e AS (SELECT event_id, event_type, value FROM events), " +
        "p AS (SELECT event_type, round(value, 6) AS v, count(*) AS c " +
        "FROM e GROUP BY 1, 2), " +
        "r AS (SELECT event_type, v, " +
        "sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum, " +
        "sum(c) OVER (PARTITION BY event_type) AS n FROM p), " +
        "cuts AS (SELECT event_type, " +
        "min(CASE WHEN cum >= greatest(ceil(0.05 * n), 1) THEN v END) " +
        "AS lo_cut, " +
        "min(CASE WHEN cum >= greatest(ceil(0.95 * n), 1) THEN v END) " +
        "AS hi_cut FROM r GROUP BY 1) " +
        "SELECT e.event_id, e.event_type, round(e.value, 6) AS value, " +
        "round(c.lo_cut, 6) AS lo_cut, round(c.hi_cut, 6) AS hi_cut, " +
        "round(least(greatest(round(e.value, 6), c.lo_cut), c.hi_cut), 6) " +
        "AS winsorized " +
        "FROM e JOIN cuts c USING (event_type) ORDER BY e.event_id"),

    // Percentile bands: the same rank selection per (type, day bin).
    "q232_percentile_bands" ->
      ("WITH e AS (SELECT event_type, CAST(floor(floor(epoch(ts)) / " +
        "86400) AS BIGINT) AS bin, round(value, 6) AS v FROM events), " +
        "p AS (SELECT event_type, bin, v, count(*) AS c " +
        "FROM e GROUP BY 1, 2, 3), " +
        "r AS (SELECT event_type, bin, v, " +
        "sum(c) OVER (PARTITION BY event_type, bin ORDER BY v) AS cum, " +
        "sum(c) OVER (PARTITION BY event_type, bin) AS n FROM p) " +
        "SELECT event_type, bin, CAST(max(n) AS BIGINT) AS n, " +
        "round(min(CASE WHEN cum >= ceil(0.5 * n) THEN v END), 6) AS p50, " +
        "round(min(CASE WHEN cum >= ceil(0.9 * n) THEN v END), 6) AS p90, " +
        "round(min(CASE WHEN cum >= ceil(0.99 * n) THEN v END), 6) " +
        "AS p99 FROM r GROUP BY 1, 2 ORDER BY 1, 2"),

    // OLS trend: quantized bin means, one moment pass, the same
    // slope/intercept/r2 algebra division-for-division.
    "q233_ols_trend" ->
      ("WITH b0 AS (SELECT event_type AS k, " +
        "CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS bin, " +
        "round(avg(value), 6) AS v FROM events GROUP BY 1, 2), " +
        "b AS (SELECT k, bin, v, min(bin) OVER (PARTITION BY k) AS bin0 " +
        "FROM b0), " +
        "m AS (SELECT k, count(*) AS nb, min(bin0) AS bin0, " +
        "sum(CAST(bin - bin0 AS DOUBLE)) AS sx, sum(v) AS sy, " +
        "sum(CAST(bin - bin0 AS DOUBLE) * CAST(bin - bin0 AS DOUBLE)) " +
        "AS sxx, sum(v * v) AS syy, " +
        "sum(CAST(bin - bin0 AS DOUBLE) * v) AS sxy FROM b GROUP BY 1), " +
        "f AS (SELECT k, nb, bin0, " +
        "CAST(nb AS DOUBLE) * sxx - sx * sx AS dxx, " +
        "CAST(nb AS DOUBLE) * syy - sy * sy AS dyy, " +
        "CAST(nb AS DOUBLE) * sxy - sx * sy AS dxy, sx, sy FROM m) " +
        "SELECT k AS event_type, CAST(nb AS BIGINT) AS n_bins, bin0, " +
        "round(CASE WHEN dxx > 0 THEN dxy / dxx END, 6) AS slope, " +
        "round(CASE WHEN dxx > 0 THEN " +
        "(sy - (dxy / dxx) * sx) / CAST(nb AS DOUBLE) END, 6) " +
        "AS intercept, " +
        "round(CASE WHEN dxx > 0 AND dyy > 0 THEN " +
        "dxy * dxy / (dxx * dyy) END, 6) AS r2 FROM f ORDER BY 1"),

    // Binned MI: equi-width cells over observed ranges, joint and
    // marginal histograms, entropies — all double-for-double.
    "q234_binned_mi" ->
      ("WITH r AS (SELECT min(CAST(l_quantity AS DOUBLE)) AS xlo, " +
        "max(CAST(l_quantity AS DOUBLE)) AS xhi, " +
        "min(CAST(l_extendedprice AS DOUBLE)) AS ylo, " +
        "max(CAST(l_extendedprice AS DOUBLE)) AS yhi FROM lineitem), " +
        "j AS (SELECT least(CAST(floor((CAST(l_quantity AS DOUBLE) - " +
        "r.xlo) / ((r.xhi - r.xlo) / 16)) AS INT), 15) AS bx, " +
        "least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - r.ylo) / " +
        "((r.yhi - r.ylo) / 16)) AS INT), 15) AS by2, " +
        "count(*) AS c FROM lineitem, r GROUP BY 1, 2), " +
        "mx AS (SELECT bx, sum(c) AS cx FROM j GROUP BY 1), " +
        "my AS (SELECT by2, sum(c) AS cy FROM j GROUP BY 1), " +
        "t AS (SELECT sum(c) AS n FROM j), " +
        "mi AS (SELECT max(t.n) AS n, " +
        "sum((CAST(c AS DOUBLE) / t.n) * " +
        "ln((CAST(c AS DOUBLE) * CAST(t.n AS DOUBLE)) / " +
        "(CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)))) AS mi " +
        "FROM j JOIN mx USING (bx) JOIN my USING (by2), t), " +
        "hx AS (SELECT sum((CAST(cx AS DOUBLE) / t.n) * " +
        "-ln(CAST(cx AS DOUBLE) / t.n)) AS h_x FROM mx, t), " +
        "hy AS (SELECT sum((CAST(cy AS DOUBLE) / t.n) * " +
        "-ln(CAST(cy AS DOUBLE) / t.n)) AS h_y FROM my, t) " +
        "SELECT CAST(mi.n AS BIGINT) AS n, round(mi.mi, 6) AS mi, " +
        "round(hx.h_x, 6) AS h_x, round(hy.h_y, 6) AS h_y, " +
        "round(CASE WHEN hx.h_x > 0 AND hy.h_y > 0 THEN " +
        "mi.mi / sqrt(hx.h_x * hy.h_y) END, 6) AS nmi " +
        "FROM mi, hx, hy"),

    // Isotonic calibration: the PAV fit via its minimax characterization
    // fit(k) = max_{i<=k} min_{j>=k} wmean(label, bins i..j) — segment
    // means from cumulative differences, replayed join-for-join.
    "q235_isotonic" ->
      ("WITH s AS (SELECT ((l_orderkey * 7 + l_linenumber) % 100) / 100.0 " +
        "AS score, CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS label " +
        "FROM lineitem), " +
        "b AS (SELECT least(CAST(floor(score * 10) AS INT), 9) AS bin, " +
        "count(*) AS n, avg(score) AS score_mean, " +
        "sum(CAST(label AS DOUBLE)) AS sy FROM s GROUP BY 1), " +
        "c AS (SELECT bin, n, sy, sum(n) OVER (ORDER BY bin) AS cw, " +
        "sum(sy) OVER (ORDER BY bin) AS cs FROM b), " +
        "seg AS (SELECT lo.bin AS i, hi.bin AS j, " +
        "(hi.cs - (lo.cs - lo.sy)) / (hi.cw - (lo.cw - lo.n)) AS a " +
        "FROM c lo JOIN c hi ON lo.bin <= hi.bin), " +
        "mn AS (SELECT k.bin AS k, seg.i, min(seg.a) AS mn FROM c k " +
        "JOIN seg ON seg.i <= k.bin AND k.bin <= seg.j GROUP BY 1, 2), " +
        "f AS (SELECT k AS bin, max(mn) AS fit FROM mn GROUP BY 1) " +
        "SELECT b.bin, CAST(b.n AS BIGINT) AS n, " +
        "round(b.score_mean, 6) AS score_mean, " +
        "round(b.sy / b.n, 6) AS label_mean, round(f.fit, 6) AS fit " +
        "FROM b JOIN f USING (bin) ORDER BY bin"),

    // WOE/IV: exact per-category counts, the identical smoothing algebra.
    "q236_woe_iv" ->
      ("WITH d AS (SELECT source, CASE WHEN n_chars > 306 THEN 1 ELSE 0 " +
        "END AS y FROM documents), " +
        "per AS (SELECT source, count(*) AS n, " +
        "CAST(sum(CAST(y AS DOUBLE)) AS BIGINT) AS events FROM d " +
        "GROUP BY 1), " +
        "p2 AS (SELECT source, n, events, n - events AS nonevents " +
        "FROM per), " +
        "t AS (SELECT CAST(sum(events) AS BIGINT) AS tev, " +
        "CAST(sum(nonevents) AS BIGINT) AS tne FROM p2) " +
        "SELECT source, CAST(n AS BIGINT) AS n, events, nonevents, " +
        "round(CASE WHEN tev > 0 AND tne > 0 THEN " +
        "ln(((events + 0.5) / tev) / ((nonevents + 0.5) / tne)) END, 6) " +
        "AS woe, " +
        "round(CASE WHEN tev > 0 AND tne > 0 THEN " +
        "((events + 0.5) / tev - (nonevents + 0.5) / tne) * " +
        "ln(((events + 0.5) / tev) / ((nonevents + 0.5) / tne)) END, 6) " +
        "AS iv_term FROM p2, t ORDER BY source"),

    // Markov removal-effect attribution: unrolled 40-step absorption
    // chains, one per blocked channel (see markovSql above).
    "q237_markov_attribution" -> markovSql(40),

    // Confident joint: per-class self-confidence thresholds, argmax over
    // qualifying classes (ties to the lower index), K²-bounded cells.
    "q238_confident_joint" ->
      ("WITH s AS (SELECT CASE WHEN l_returnflag = 'A' THEN 0 " +
        "WHEN l_returnflag = 'N' THEN 1 ELSE 2 END AS lab, " +
        "((l_orderkey * 7 + l_linenumber) % 100) / 100.0 AS s0, " +
        "((l_orderkey * 13 + l_linenumber) % 100) / 100.0 AS s1, " +
        "((l_orderkey * 29 + l_linenumber) % 100) / 100.0 AS s2 " +
        "FROM lineitem), " +
        "t AS (SELECT avg(CASE WHEN lab = 0 THEN s0 END) AS t0, " +
        "avg(CASE WHEN lab = 1 THEN s1 END) AS t1, " +
        "avg(CASE WHEN lab = 2 THEN s2 END) AS t2 FROM s), " +
        "q AS (SELECT lab, s0, s1, s2, " +
        "COALESCE(s0 >= t.t0, FALSE) AS q0, " +
        "COALESCE(s1 >= t.t1, FALSE) AS q1, " +
        "COALESCE(s2 >= t.t2, FALSE) AS q2 FROM s, t), " +
        "c AS (SELECT lab AS given_label, CASE " +
        "WHEN q0 AND (NOT q1 OR s0 >= s1) AND (NOT q2 OR s0 >= s2) " +
        "THEN 0 " +
        "WHEN q1 AND (NOT q2 OR s1 >= s2) THEN 1 " +
        "WHEN q2 THEN 2 END AS latent FROM q), " +
        "conf AS (SELECT given_label, latent AS latent_label, " +
        "count(*) AS n FROM c WHERE latent IS NOT NULL GROUP BY 1, 2), " +
        "unc AS (SELECT CAST(sum(CASE WHEN latent IS NULL THEN 1 " +
        "ELSE 0 END) AS BIGINT) AS nu FROM c), " +
        "gt AS (SELECT given_label, CAST(sum(n) AS BIGINT) AS n_given " +
        "FROM conf GROUP BY 1) " +
        "SELECT conf.given_label, conf.latent_label, " +
        "CAST(conf.n AS BIGINT) AS n, gt.n_given, " +
        "round(CAST(conf.n AS DOUBLE) / gt.n_given, 6) AS frac_of_given, " +
        "unc.nu AS n_unconfident FROM conf " +
        "JOIN gt USING (given_label), unc ORDER BY 1, 2"),

    // Duplication spectrum: md5-keyed cluster sizes bucketed 1/2/3-5/...
    "q239_dup_spectrum" ->
      ("WITH d AS (SELECT text FROM documents " +
        "UNION ALL SELECT text FROM documents WHERE doc_id % 10 = 0 " +
        "UNION ALL SELECT text FROM documents WHERE doc_id % 10 = 0), " +
        "sz AS (SELECT md5(CAST(text AS VARCHAR)) AS k, count(*) AS n " +
        "FROM d GROUP BY 1), " +
        "b AS (SELECT CASE WHEN n = 1 THEN '1' WHEN n = 2 THEN '2' " +
        "WHEN n <= 5 THEN '3-5' WHEN n <= 10 THEN '6-10' ELSE '11+' END " +
        "AS bucket, count(*) AS n_clusters, sum(n) AS n_docs FROM sz " +
        "GROUP BY 1), " +
        "t AS (SELECT sum(n_docs) AS tot FROM b) " +
        "SELECT bucket, CAST(n_clusters AS BIGINT) AS n_clusters, " +
        "CAST(n_docs AS BIGINT) AS n_docs, " +
        "round(CAST(n_docs AS DOUBLE) / CAST(tot AS DOUBLE), 6) " +
        "AS docs_share, CAST(n_docs - n_clusters AS BIGINT) AS n_excess " +
        "FROM b, t ORDER BY bucket"),

    // Component strengths: OLS detrend over the hourly grid, period-24
    // subseries seasonal means, variance-ratio F_T/F_S — the identical
    // centered-moment algebra.
    "q240_component_strengths" ->
      ("WITH g0 AS (SELECT CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) " +
        "AS bin, avg(value) AS obs FROM events GROUP BY 1), " +
        "b0 AS (SELECT min(bin) AS b0 FROM g0), " +
        "gx AS (SELECT bin, obs, CAST(bin % 24 AS INT) AS pos, " +
        "CAST(bin - b0.b0 AS DOUBLE) AS x FROM g0, b0), " +
        "fit AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, " +
        "sum(obs) AS sy, sum(x * x) AS sxx, sum(x * obs) AS sxy FROM gx), " +
        "f2 AS (SELECT n, sx, sy, CASE WHEN n * sxx - sx * sx > 0 THEN " +
        "(n * sxy - sx * sy) / (n * sxx - sx * sx) ELSE 0.0 END AS slope " +
        "FROM fit), " +
        "f3 AS (SELECT slope, (sy - slope * sx) / n AS icept FROM f2), " +
        "c AS (SELECT gx.bin, gx.pos, gx.obs, " +
        "gx.obs - (f3.icept + f3.slope * gx.x) AS det FROM gx, f3), " +
        "c2 AS (SELECT bin, pos, obs, det, " +
        "avg(det) OVER (PARTITION BY pos) AS seasonal FROM c), " +
        "c3 AS (SELECT obs, det, det - seasonal AS rem, " +
        "obs - seasonal AS deseas FROM c2), " +
        "a AS (SELECT count(*) AS n_bins, " +
        "avg(obs * obs) - avg(obs) * avg(obs) AS var_obs, " +
        "avg(det * det) - avg(det) * avg(det) AS var_det, " +
        "avg(rem * rem) - avg(rem) * avg(rem) AS var_rem, " +
        "avg(deseas * deseas) - avg(deseas) * avg(deseas) AS var_deseas " +
        "FROM c3) " +
        "SELECT CAST(n_bins AS BIGINT) AS n_bins, " +
        "round(var_obs, 6) AS var_obs, " +
        "round(var_det, 6) AS var_detrended, " +
        "round(var_rem, 6) AS var_remainder, " +
        "round(CASE WHEN var_deseas > 0 THEN " +
        "greatest(0.0, 1.0 - var_rem / var_deseas) END, 6) " +
        "AS trend_strength, " +
        "round(CASE WHEN var_det > 0 THEN " +
        "greatest(0.0, 1.0 - var_rem / var_det) END, 6) " +
        "AS seasonal_strength FROM a"),

    // Exact Shapley over the Markov chain: 2³ subset chains in one
    // bitmask-keyed recursion (see markovShapleySql above).
    "q241_markov_shapley" -> markovShapleySql(40),

    // Mixed-language screen: 40-token windows, the q35 stopword scorer
    // per window, majority vote with (count desc, lang asc) ties.
    "q242_lang_consistency" ->
      ("WITH s AS (SELECT doc_id, list_filter(string_split_regex(" +
        "lower(trim(text)), '\\s+'), t -> len(t) > 0) AS toks " +
        "FROM documents), " +
        "w AS (SELECT doc_id, toks, unnest(range(1, " +
        "greatest(len(toks), 1) + 1, 40)) AS st FROM s), " +
        "sc AS (SELECT doc_id, list_slice(toks, st, st + 39) AS wt " +
        "FROM w), " +
        "lg AS (SELECT doc_id, " +
        "len(list_filter(wt, t -> t IN ('the','and','of','to','in'," +
        "'is','that','for','with'))) AS s_en, " +
        "len(list_filter(wt, t -> t IN ('der','die','und','das','ist'," +
        "'nicht','ein','mit','für'))) AS s_de, " +
        "len(list_filter(wt, t -> t IN ('le','la','et','les','des'," +
        "'est','pas','pour','que'))) AS s_fr, " +
        "len(list_filter(wt, t -> t IN ('el','la','que','de','los'," +
        "'es','por','con','para'))) AS s_es FROM sc), " +
        "lang AS (SELECT doc_id, " +
        "CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und' " +
        "WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en' " +
        "WHEN s_de >= s_fr AND s_de >= s_es THEN 'de' " +
        "WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS lang FROM lg), " +
        "pl AS (SELECT doc_id, lang, count(*) AS c FROM lang " +
        "GROUP BY 1, 2), " +
        "rn AS (SELECT doc_id, lang, c, row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY c DESC, lang) AS rn FROM pl), " +
        "agg AS (SELECT doc_id, sum(c) AS n_windows, " +
        "max(CASE WHEN rn = 1 THEN lang END) AS top_lang, " +
        "max(CASE WHEN rn = 1 THEN c END) AS topc, " +
        "count(*) AS n_langs FROM rn GROUP BY 1) " +
        "SELECT doc_id, CAST(n_windows AS BIGINT) AS n_windows, " +
        "top_lang, round(CAST(topc AS DOUBLE) / n_windows, 6) " +
        "AS top_share, CAST(n_langs AS BIGINT) AS n_langs FROM agg " +
        "ORDER BY doc_id"),

    // Source affinity: per-(source, dim) centroid means → pair dots.
    "q257_source_affinity" ->
      ("WITH e AS (SELECT vec_id, unnest(range(1, len(embedding) + 1)) " +
        "AS idx, embedding FROM embeddings), " +
        "x AS (SELECT e.vec_id, CAST(idx - 1 AS INTEGER) AS d, " +
        "CAST(embedding[idx] AS DOUBLE) AS v FROM e), " +
        "j AS (SELECT doc.source, x.d, x.v FROM x JOIN documents doc " +
        "ON x.vec_id = doc.doc_id), " +
        "c AS (SELECT source, d, avg(v) AS m FROM j GROUP BY 1, 2), " +
        "n AS (SELECT source, sqrt(sum(m * m)) AS nn FROM c GROUP BY 1), " +
        "p AS (SELECT a.source AS group_a, b.source AS group_b, " +
        "sum(a.m * b.m) AS dot FROM c a JOIN c b ON a.d = b.d " +
        "AND a.source < b.source GROUP BY 1, 2) " +
        "SELECT group_a, group_b, " +
        "round(CASE WHEN na.nn > 0 AND nb.nn > 0 THEN " +
        "dot / (na.nn * nb.nn) END, 6) AS cosine FROM p " +
        "JOIN n na ON p.group_a = na.source " +
        "JOIN n nb ON p.group_b = nb.source ORDER BY 1, 2"),

    // N-gram novelty: per-doc distinct shingles vs the reference set.
    "q256_ngram_novelty" ->
      ("WITH ctoks AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents WHERE doc_id >= 100), " +
        "csh AS (SELECT doc_id, unnest(list_distinct(" +
        "[array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]" +
        ")) AS sh FROM ctoks WHERE len(t) >= 3), " +
        "rtoks AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents WHERE doc_id < 100), " +
        "rsh AS (SELECT DISTINCT unnest(list_distinct(" +
        "[array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]" +
        ")) AS sh FROM rtoks WHERE len(t) >= 3), " +
        "tot AS (SELECT doc_id, count(*) AS n_shingles FROM csh " +
        "GROUP BY 1), " +
        "seen AS (SELECT doc_id, count(*) AS s FROM csh " +
        "WHERE sh IN (SELECT sh FROM rsh) GROUP BY 1) " +
        "SELECT d.doc_id, " +
        "CAST(COALESCE(t.n_shingles, 0) AS BIGINT) AS n_shingles, " +
        "CAST(COALESCE(t.n_shingles, 0) - COALESCE(seen.s, 0) AS BIGINT) " +
        "AS n_novel, " +
        "round(CASE WHEN COALESCE(t.n_shingles, 0) > 0 THEN " +
        "CAST(COALESCE(t.n_shingles, 0) - COALESCE(seen.s, 0) AS DOUBLE) " +
        "/ t.n_shingles END, 6) AS novelty " +
        "FROM (SELECT doc_id FROM documents WHERE doc_id >= 100) d " +
        "LEFT JOIN tot t ON d.doc_id = t.doc_id " +
        "LEFT JOIN seen ON d.doc_id = seen.doc_id ORDER BY d.doc_id"),

    // Mix-shift decomposition: per-(segment, period) weights/means, the
    // within/mix identity term-for-term.
    "q255_mix_shift" ->
      ("WITH s AS (SELECT event_type AS seg, " +
        "CAST(event_id % 2 AS VARCHAR) AS period, value AS v FROM events " +
        "WHERE CAST(event_id % 2 AS VARCHAR) IN ('0', '1')), " +
        "per AS (SELECT seg AS segment, " +
        "sum(CASE WHEN period = '0' THEN 1 ELSE 0 END) AS na, " +
        "sum(CASE WHEN period = '1' THEN 1 ELSE 0 END) AS nb, " +
        "sum(CASE WHEN period = '0' THEN v ELSE 0.0 END) AS sa, " +
        "sum(CASE WHEN period = '1' THEN v ELSE 0.0 END) AS sb " +
        "FROM s GROUP BY 1), " +
        "t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM per), " +
        "m AS (SELECT segment, na / CAST(t.ta AS DOUBLE) AS w_a, " +
        "nb / CAST(t.tb AS DOUBLE) AS w_b, " +
        "CASE WHEN na > 0 THEN sa / na ELSE 0.0 END AS r_a, " +
        "CASE WHEN nb > 0 THEN sb / nb ELSE 0.0 END AS r_b " +
        "FROM per, t) " +
        "SELECT segment, round(w_a, 6) AS w_a, round(w_b, 6) AS w_b, " +
        "round(r_a, 6) AS r_a, round(r_b, 6) AS r_b, " +
        "round(w_a * (r_b - r_a), 6) AS within_effect, " +
        "round((w_b - w_a) * r_b, 6) AS mix_effect FROM m " +
        "ORDER BY segment"),

    // SCD2 validity audit on the poisoned q58 dim: lead() over
    // (vf, vt NULLS FIRST) — Spark sorts nulls first ascending.
    "q254_scd_audit" ->
      ("WITH o AS (SELECT user_id, event_id, ts, event_type, " +
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, " +
        "event_id) AS prev FROM events), " +
        "c AS (SELECT user_id, event_id, ts, event_type FROM o " +
        "WHERE prev IS NULL OR prev <> event_type), " +
        "dim AS (SELECT user_id, ts AS vf, lead(ts) OVER (PARTITION BY " +
        "user_id ORDER BY ts, event_id) AS vt FROM c), " +
        "p AS (SELECT user_id, vf, CASE WHEN user_id % 10 = 0 THEN vf " +
        "ELSE vt END AS vt FROM dim), " +
        "x AS (SELECT user_id, vf, vt, lead(vf) OVER (PARTITION BY " +
        "user_id ORDER BY vf, vt NULLS FIRST) AS nf FROM p), " +
        "a AS (SELECT user_id, count(*) AS n_versions, " +
        "sum(CASE WHEN nf IS NOT NULL AND (vt IS NULL OR nf < vt) " +
        "THEN 1 ELSE 0 END) AS n_overlaps, " +
        "sum(CASE WHEN nf IS NOT NULL AND vt IS NOT NULL AND nf > vt " +
        "THEN 1 ELSE 0 END) AS n_gaps, " +
        "sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS n_current " +
        "FROM x GROUP BY 1) " +
        "SELECT user_id % 10 = 0 AS poisoned, " +
        "CAST(count(*) AS BIGINT) AS n_keys, " +
        "CAST(sum(n_overlaps) AS BIGINT) AS n_overlaps, " +
        "CAST(sum(n_gaps) AS BIGINT) AS n_gaps, " +
        "CAST(sum(CASE WHEN n_current <> 1 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_bad_current FROM a GROUP BY 1 " +
        "ORDER BY poisoned"),

    // FK audit: child key counts, anti-join orphans, null FKs separate.
    "q253_fk_audit" ->
      ("WITH pk AS (SELECT o_orderkey AS k FROM orders " +
        "WHERE o_orderkey % 7 <> 0 GROUP BY 1), " +
        "ck AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem " +
        "GROUP BY 1), " +
        "t AS (SELECT COALESCE(CAST(sum(CASE WHEN k IS NOT NULL THEN c " +
        "END) AS BIGINT), 0) AS n_child_rows, " +
        "CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_child_keys, " +
        "COALESCE(CAST(sum(CASE WHEN k IS NULL THEN c END) AS BIGINT), " +
        "0) AS n_null_rows FROM ck), " +
        "o AS (SELECT COALESCE(CAST(sum(ck.c) AS BIGINT), 0) " +
        "AS n_orphan_rows, CAST(count(*) AS BIGINT) AS n_orphan_keys " +
        "FROM ck LEFT JOIN pk ON ck.k = pk.k " +
        "WHERE ck.k IS NOT NULL AND pk.k IS NULL) " +
        "SELECT t.n_child_rows, t.n_child_keys, o.n_orphan_rows, " +
        "o.n_orphan_keys, t.n_null_rows, " +
        "round(CASE WHEN t.n_child_rows > 0 THEN " +
        "CAST(o.n_orphan_rows AS DOUBLE) / t.n_child_rows ELSE 0.0 END, " +
        "6) AS orphan_row_rate FROM t, o"),

    // Leakage-free split: q77's verified-pair closure → min-reachable
    // cluster label → label-keyed split buckets.
    "q251_leak_free_split" ->
      (s"WITH RECURSIVE $exactPairCtes, " +
        "p AS (SELECT id_a, id_b FROM jp WHERE j >= 0.5), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM p " +
        "UNION ALL SELECT id_b, id_a FROM p), " +
        "reach AS (SELECT a AS src, b AS dst FROM edges " +
        "UNION SELECT r.src, e.b FROM reach r JOIN edges e " +
        "ON r.dst = e.a), " +
        "lab AS (SELECT d.doc_id, " +
        "LEAST(d.doc_id, COALESCE(r.mn, d.doc_id)) AS grp " +
        "FROM documents d LEFT JOIN (SELECT src, min(dst) AS mn " +
        "FROM reach GROUP BY 1) r ON d.doc_id = r.src), " +
        "sp AS (SELECT CASE WHEN grp % 100 < 80 THEN 'train' " +
        "WHEN grp % 100 < 90 THEN 'val' ELSE 'test' END AS split, grp " +
        "FROM lab) " +
        "SELECT split, CAST(count(DISTINCT grp) AS BIGINT) AS n_groups, " +
        "CAST(count(*) AS BIGINT) AS n_docs FROM sp GROUP BY 1 " +
        "ORDER BY 1"),

    // Dispersion index: per-key bin-count moments over the full span
    // (empty bins as zeros, algebraically).
    "q250_dispersion" ->
      ("WITH b AS (SELECT event_type AS key, " +
        "CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS bin, " +
        "count(*) AS c FROM events GROUP BY 1, 2), " +
        "a AS (SELECT key, max(bin) - min(bin) + 1 AS n_bins, " +
        "CAST(sum(c) AS BIGINT) AS n_events, " +
        "sum(CAST(c AS DOUBLE) * c) AS s2 FROM b GROUP BY 1), " +
        "m AS (SELECT key, n_bins, n_events, " +
        "n_events / CAST(n_bins AS DOUBLE) AS mean_count, " +
        "s2 / n_bins - (n_events / CAST(n_bins AS DOUBLE)) * " +
        "(n_events / CAST(n_bins AS DOUBLE)) AS var_count FROM a) " +
        "SELECT key, CAST(n_bins AS BIGINT) AS n_bins, n_events, " +
        "round(mean_count, 6) AS mean_count, " +
        "round(var_count, 6) AS var_count, " +
        "round(CASE WHEN n_bins > 1 AND mean_count > 0 THEN " +
        "var_count / mean_count END, 6) AS vmr, " +
        "round(CASE WHEN n_bins > 1 AND mean_count > 0 THEN " +
        "n_bins * var_count / mean_count END, 6) AS d_stat FROM m " +
        "ORDER BY key"),

    // CMH: per-stratum 2×2 cells, pooled E/Var, MH + crude odds ratios.
    "q249_cmh" ->
      ("WITH s AS (SELECT event_type AS st, " +
        "CAST(user_id % 2 AS VARCHAR) AS arm, " +
        "CASE WHEN value > 50 THEN 1 ELSE 0 END AS y FROM events " +
        "WHERE CAST(user_id % 2 AS VARCHAR) IN ('0', '1')), " +
        "per AS (SELECT st, " +
        "sum(CASE WHEN arm = '0' AND y = 1 THEN 1 ELSE 0 END) AS a, " +
        "sum(CASE WHEN arm = '0' AND y = 0 THEN 1 ELSE 0 END) AS b, " +
        "sum(CASE WHEN arm = '1' AND y = 1 THEN 1 ELSE 0 END) AS c, " +
        "sum(CASE WHEN arm = '1' AND y = 0 THEN 1 ELSE 0 END) AS d " +
        "FROM s GROUP BY 1), " +
        "p2 AS (SELECT *, a + b + c + d AS nn FROM per), " +
        "k AS (SELECT * FROM p2 WHERE nn >= 2), " +
        "sk AS (SELECT CAST(count(*) AS BIGINT) AS n_strata_skipped " +
        "FROM p2 WHERE nn < 2), " +
        "agg AS (SELECT CAST(count(*) AS BIGINT) AS n_strata, " +
        "CAST(sum(nn) AS BIGINT) AS n, CAST(sum(a) AS BIGINT) AS sum_a, " +
        "sum(CAST((a + b) * (a + c) AS DOUBLE) / nn) AS sum_e, " +
        "sum(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d) / " +
        "(CAST(nn AS DOUBLE) * nn * (nn - 1.0))) AS sum_var, " +
        "sum(CAST(a AS DOUBLE) * d / nn) AS mh_num, " +
        "sum(CAST(b AS DOUBLE) * c / nn) AS mh_den, " +
        "CAST(sum(a) AS DOUBLE) AS ta, CAST(sum(b) AS DOUBLE) AS tb, " +
        "CAST(sum(c) AS DOUBLE) AS tc, CAST(sum(d) AS DOUBLE) AS td " +
        "FROM k) " +
        "SELECT n_strata, sk.n_strata_skipped, n, sum_a, " +
        "round(sum_e, 6) AS sum_e, " +
        "round(CASE WHEN sum_var > 0 THEN " +
        "(sum_a - sum_e) * (sum_a - sum_e) / sum_var END, 6) " +
        "AS cmh_chi2, " +
        "round(CASE WHEN tb * tc > 0 THEN ta * td / (tb * tc) END, 6) " +
        "AS or_crude, " +
        "round(CASE WHEN mh_den > 0 THEN mh_num / mh_den END, 6) " +
        "AS or_mh FROM agg, sk"),

    // BH-FDR: p-sorted ranks, reverse running min of p·n/rank, clamp 1.
    "q248_bh_adjust" ->
      ("WITH t AS (SELECT doc_id, ((doc_id * 7919) % 1000) / 1000.0 " +
        "AS p FROM documents), " +
        "n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t), " +
        "r AS (SELECT doc_id, p, row_number() OVER (ORDER BY p, doc_id) " +
        "AS rank FROM t), " +
        "q AS (SELECT doc_id, p, rank, least(1.0, " +
        "min(p * n.n / rank) OVER (ORDER BY p, doc_id ROWS BETWEEN " +
        "CURRENT ROW AND UNBOUNDED FOLLOWING)) AS q_value FROM r, n) " +
        "SELECT doc_id, round(p, 6) AS p_value, " +
        "CAST(rank AS BIGINT) AS rank, round(q_value, 6) AS q_value, " +
        "q_value <= 0.05 AS significant FROM q ORDER BY doc_id"),

    // Funnel latency: q134's strictly-advancing first-touch times, gap
    // buckets (floor(epoch) both sides — Spark unix_timestamp truncates),
    // rank percentiles per transition.
    "q247_funnel_latency" ->
      ("WITH v AS (SELECT user_id, min(ts) AS t_view FROM events " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e " +
        "JOIN v ON e.user_id = v.user_id " +
        "WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1), " +
        "p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e " +
        "JOIN c ON e.user_id = c.user_id " +
        "WHERE e.event_type = 'purchase' AND e.ts > c.t_click " +
        "GROUP BY 1), " +
        "g AS (SELECT 1 AS i, CAST(floor((floor(epoch(c.t_click)) - " +
        "floor(epoch(v.t_view))) / 3600) * 3600 AS BIGINT) AS gap " +
        "FROM v JOIN c USING (user_id) " +
        "UNION ALL SELECT 2, CAST(floor((floor(epoch(p.t_purchase)) - " +
        "floor(epoch(c.t_click))) / 3600) * 3600 AS BIGINT) " +
        "FROM c JOIN p USING (user_id)), " +
        "per AS (SELECT i, gap, count(*) AS c FROM g GROUP BY 1, 2), " +
        "t AS (SELECT i, sum(c) AS n FROM per GROUP BY 1), " +
        "cum AS (SELECT per.i, per.gap, sum(per.c) OVER (PARTITION BY " +
        "per.i ORDER BY per.gap) AS cum, t.n FROM per JOIN t " +
        "USING (i)), " +
        "a AS (SELECT i, CAST(max(n) AS BIGINT) AS n_advanced, " +
        "min(CASE WHEN cum >= ceil(n * 5 / 10.0) THEN gap END) " +
        "AS p50_sec, " +
        "min(CASE WHEN cum >= ceil(n * 9 / 10.0) THEN gap END) " +
        "AS p90_sec FROM cum GROUP BY 1) " +
        "SELECT CASE i WHEN 1 THEN 'view' ELSE 'click' END " +
        "AS stage_from, CASE i WHEN 1 THEN 'click' ELSE 'purchase' END " +
        "AS stage_to, n_advanced, p50_sec, p90_sec FROM a " +
        "ORDER BY stage_from"),

    // QTE: per-arm lower-value-at-rank deciles over the floored domain.
    "q246_qte" ->
      ("WITH s AS (SELECT CAST(user_id % 2 AS VARCHAR) AS g, " +
        "CAST(floor(value) AS DOUBLE) AS v FROM events " +
        "WHERE CAST(user_id % 2 AS VARCHAR) IN ('0', '1')), " +
        "per AS (SELECT g, v, count(*) AS c FROM s GROUP BY 1, 2), " +
        "t AS (SELECT g, sum(c) AS n FROM per GROUP BY 1), " +
        "cum AS (SELECT per.g, per.v, sum(per.c) OVER (PARTITION BY " +
        "per.g ORDER BY per.v) AS cum, t.n FROM per JOIN t USING (g)), " +
        "q AS (SELECT g, " +
        (1 to 9).map(d => "min(CASE WHEN cum >= ceil(n * " + d +
          s" / 10.0) THEN v END) AS q$d").mkString(", ") +
        " FROM cum GROUP BY 1), " +
        "u AS (SELECT g, unnest([" +
        (1 to 9).map(_ * 10).mkString(", ") + "]) AS pct, unnest([" +
        (1 to 9).map(d => s"q$d").mkString(", ") + "]) AS q FROM q) " +
        "SELECT pct, round(max(CASE WHEN g = '0' THEN q END), 6) " +
        "AS q_a, round(max(CASE WHEN g = '1' THEN q END), 6) AS q_b, " +
        "round(max(CASE WHEN g = '1' THEN q END) - " +
        "max(CASE WHEN g = '0' THEN q END), 6) AS qte FROM u " +
        "GROUP BY 1 ORDER BY 1"),

    // SRM: declared-allocation join, per-arm deviation z, chi² GOF.
    "q245_srm" ->
      ("WITH v AS (SELECT CAST(user_id % 2 AS VARCHAR) AS variant " +
        "FROM events), " +
        "exp AS (SELECT unnest(['0', '1']) AS variant, " +
        "unnest([0.5, 0.5]) AS expected_share), " +
        "c AS (SELECT variant, count(*) AS n_obs FROM v GROUP BY 1), " +
        "j AS (SELECT exp.variant, exp.expected_share, " +
        "COALESCE(c.n_obs, 0) AS n_obs FROM exp LEFT JOIN c " +
        "USING (variant)), " +
        "u AS (SELECT COALESCE(CAST(sum(n_obs) AS BIGINT), 0) " +
        "AS n_unexpected FROM c WHERE variant IS NULL OR " +
        "variant NOT IN ('0', '1')), " +
        "t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM j), " +
        "a AS (SELECT j.variant, j.n_obs, j.expected_share, " +
        "t.n * j.expected_share AS n_expected FROM j, t), " +
        "b AS (SELECT *, (n_obs - n_expected) / " +
        "sqrt(n_expected * (1.0 - expected_share)) AS dev_z, " +
        "(n_obs - n_expected) * (n_obs - n_expected) / n_expected " +
        "AS ct FROM a), " +
        "x AS (SELECT sum(ct) AS chi2 FROM b) " +
        "SELECT b.variant, CAST(b.n_obs AS BIGINT) AS n_obs, " +
        "round(b.expected_share, 6) AS expected_share, " +
        "round(b.n_expected, 6) AS n_expected, " +
        "round(b.dev_z, 6) AS dev_z, round(x.chi2, 6) AS chi2, " +
        "CAST(1 AS BIGINT) AS dof, u.n_unexpected FROM b, x, u " +
        "ORDER BY variant"),

    // 1-D Wasserstein: ECDF running sums over the floored value domain,
    // per-step |F_a − F_b|·Δv, normalized by the merged range.
    "q244_wasserstein" ->
      ("WITH s AS (SELECT CAST(floor(value) AS DOUBLE) AS v, event_type " +
        "FROM events WHERE event_type IN ('purchase', 'view')), " +
        "per AS (SELECT v, sum(CASE WHEN event_type = 'purchase' THEN 1 " +
        "ELSE 0 END) AS ca, sum(CASE WHEN event_type = 'view' THEN 1 " +
        "ELSE 0 END) AS cb FROM s GROUP BY 1), " +
        "t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, " +
        "CAST(sum(cb) AS BIGINT) AS nb, max(v) - min(v) AS r FROM per), " +
        "e AS (SELECT v, sum(ca) OVER (ORDER BY v) AS fa, " +
        "sum(cb) OVER (ORDER BY v) AS fb, " +
        "lead(v) OVER (ORDER BY v) - v AS dv FROM per), " +
        "a AS (SELECT max(t.na) AS na, max(t.nb) AS nb, " +
        "sum(CASE WHEN dv IS NOT NULL THEN " +
        "abs(CAST(fa AS DOUBLE) / t.na - CAST(fb AS DOUBLE) / t.nb) * dv " +
        "ELSE 0.0 END) AS w1, max(t.r) AS r FROM e, t) " +
        "SELECT na AS n_a, nb AS n_b, round(w1, 6) AS w1, " +
        "round(CASE WHEN r > 0 THEN w1 / r ELSE 0.0 END, 6) " +
        "AS w1_normalized FROM a"),

    // ChiMerge: quantile prebins, then a recursive CTE that replays the
    // exact merge sequence — per generation, lead() windows pair each bin
    // with its right neighbour, the min-chi² pair (ties to lower rn)
    // merges, and recursion stops when targetBins remain.
    "q243_chi_merge" ->
      ("WITH RECURSIVE th AS (SELECT quantile_cont(" +
        "CAST(l_extendedprice AS DOUBLE), [" +
        (1 until 12).map(i => s"$i/12.0").mkString(", ") + "]) AS ths " +
        "FROM lineitem), " +
        "pre AS (SELECT CAST(len(list_filter(th.ths, x -> " +
        "CAST(l_extendedprice AS DOUBLE) > x)) AS INTEGER) AS b, " +
        "CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS y " +
        "FROM lineitem, th), " +
        "h AS (SELECT b, count(*) AS n, " +
        "CAST(sum(CAST(y AS DOUBLE)) AS BIGINT) AS e FROM pre " +
        "GROUP BY 1), " +
        "it AS (" +
        "SELECT 0 AS step, b AS lo, b AS hi, n, e FROM h " +
        "UNION ALL " +
        "SELECT d.step, " +
        "CASE WHEN d.rn = d.mrn THEN d.lo ELSE d.lo END AS lo, " +
        "CASE WHEN d.rn = d.mrn THEN d.nhi ELSE d.hi END AS hi, " +
        "CASE WHEN d.rn = d.mrn THEN d.n + d.nn ELSE d.n END AS n, " +
        "CASE WHEN d.rn = d.mrn THEN d.e + d.ne ELSE d.e END AS e " +
        "FROM (SELECT *, min(CASE WHEN chi = mchi THEN rn END) OVER () " +
        "AS mrn FROM (SELECT *, min(chi) OVER () AS mchi FROM (" +
        "SELECT step + 1 AS step, lo, hi, n, e, rn, cnt, nhi, nn, ne, " +
        "CASE WHEN nn IS NULL THEN NULL ELSE " +
        "(CASE WHEN (CAST(n AS DOUBLE) * (e + ne)) / (n + nn) > 0 THEN " +
        "(e - (CAST(n AS DOUBLE) * (e + ne)) / (n + nn)) * " +
        "(e - (CAST(n AS DOUBLE) * (e + ne)) / (n + nn)) / " +
        "((CAST(n AS DOUBLE) * (e + ne)) / (n + nn)) ELSE 0.0 END + " +
        "CASE WHEN (CAST(n AS DOUBLE) * ((n + nn) - (e + ne))) / " +
        "(n + nn) > 0 THEN " +
        "((n - e) - (CAST(n AS DOUBLE) * ((n + nn) - (e + ne))) / " +
        "(n + nn)) * ((n - e) - (CAST(n AS DOUBLE) * ((n + nn) - " +
        "(e + ne))) / (n + nn)) / ((CAST(n AS DOUBLE) * ((n + nn) - " +
        "(e + ne))) / (n + nn)) ELSE 0.0 END + " +
        "CASE WHEN (CAST(nn AS DOUBLE) * (e + ne)) / (n + nn) > 0 THEN " +
        "(ne - (CAST(nn AS DOUBLE) * (e + ne)) / (n + nn)) * " +
        "(ne - (CAST(nn AS DOUBLE) * (e + ne)) / (n + nn)) / " +
        "((CAST(nn AS DOUBLE) * (e + ne)) / (n + nn)) ELSE 0.0 END + " +
        "CASE WHEN (CAST(nn AS DOUBLE) * ((n + nn) - (e + ne))) / " +
        "(n + nn) > 0 THEN " +
        "((nn - ne) - (CAST(nn AS DOUBLE) * ((n + nn) - (e + ne))) / " +
        "(n + nn)) * ((nn - ne) - (CAST(nn AS DOUBLE) * ((n + nn) - " +
        "(e + ne))) / (n + nn)) / ((CAST(nn AS DOUBLE) * ((n + nn) - " +
        "(e + ne))) / (n + nn)) ELSE 0.0 END) END AS chi " +
        "FROM (SELECT prev.step, lo, hi, n, e, " +
        "row_number() OVER (ORDER BY lo) AS rn, " +
        "count(*) OVER () AS cnt, " +
        "lead(hi) OVER (ORDER BY lo) AS nhi, " +
        "lead(n) OVER (ORDER BY lo) AS nn, " +
        "lead(e) OVER (ORDER BY lo) AS ne FROM it prev) a) b) c) d " +
        "WHERE d.cnt > 5 AND d.rn <> d.mrn + 1), " +
        "fin AS (SELECT * FROM it WHERE step = " +
        "(SELECT max(step) FROM it)) " +
        "SELECT CAST(row_number() OVER (ORDER BY lo) - 1 AS INTEGER) " +
        "AS bin, lo AS lo_prebin, hi AS hi_prebin, " +
        "CAST(n AS BIGINT) AS n, CAST(e AS BIGINT) AS events, " +
        "round(CAST(e AS DOUBLE) / n, 6) AS event_rate FROM fin " +
        "ORDER BY bin"),

    // Exact-substring span dedup: DuckDB groups the 20-token windows by
    // their CONTENT (chr(1)-joined — doubles as the collision check on
    // the engine's xxhash64 buckets), ranks occurrences by (doc_id,
    // start), and merges non-first duplicated windows' positions into
    // maximal spans via gaps-and-islands.
    "q260_repeated_spans" ->
      (s"WITH $spanCorpusCtes, " +
        spanWindowCtes +
        "isl AS (SELECT doc_id, p, p - row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY p) AS g FROM pos) " +
        "SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start, " +
        "CAST(max(p) + 1 AS BIGINT) AS span_end, " +
        "CAST(count(*) AS BIGINT) AS n_tokens " +
        "FROM isl GROUP BY doc_id, g ORDER BY doc_id, span_start"),

    // Span scrubbing: tokens at covered positions drop, the rest
    // reassemble in order (string_agg ORDER BY position).
    "q261_scrub_spans" ->
      (s"WITH $spanCorpusCtes, " +
        spanWindowCtes +
        "toksp AS (SELECT doc_id, i - 1 AS p, ts[i] AS tok FROM " +
        "(SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i " +
        "FROM docs)), " +
        "kept AS (SELECT t.doc_id, count(*) AS n_kept, " +
        "string_agg(t.tok, ' ' ORDER BY t.p) AS clean_text " +
        "FROM toksp t ANTI JOIN pos q " +
        "ON t.doc_id = q.doc_id AND t.p = q.p GROUP BY t.doc_id) " +
        "SELECT d.doc_id, CAST(len(d.ts) AS BIGINT) AS n_tokens, " +
        "CAST(len(d.ts) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed, " +
        "coalesce(k.clean_text, '') AS clean_text " +
        "FROM docs d LEFT JOIN kept k ON d.doc_id = k.doc_id " +
        "ORDER BY d.doc_id"),

    // Span decontamination: clone windows (doc_id >= 10000) semi-joined
    // against the originals' DISTINCT window contents, island-merged.
    "q267_contaminated_spans" ->
      (s"WITH $spanCorpusCtes, " +
        "win AS (SELECT doc_id, i - 1 AS s, " +
        "array_to_string(list_slice(ts, i, i + 19), chr(1)) AS w FROM " +
        "(SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 19)) " +
        "AS i FROM docs WHERE len(ts) >= 20)), " +
        "flagged AS (SELECT c.doc_id, c.s FROM " +
        "(SELECT * FROM win WHERE doc_id >= 10000) c SEMI JOIN " +
        "(SELECT DISTINCT w FROM win WHERE doc_id < 10000) r " +
        "ON c.w = r.w), " +
        "pos AS (SELECT DISTINCT doc_id, s + o AS p FROM " +
        "(SELECT doc_id, s, unnest(generate_series(0, 19)) AS o " +
        "FROM flagged)), " +
        "isl AS (SELECT doc_id, p, p - row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY p) AS g FROM pos) " +
        "SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start, " +
        "CAST(max(p) + 1 AS BIGINT) AS span_end, " +
        "CAST(count(*) AS BIGINT) AS n_tokens " +
        "FROM isl GROUP BY doc_id, g ORDER BY doc_id, span_start"),

    // Oracle-anchored Poisson bootstrap: md5-hex uniforms (digit-parsed
    // polynomial), Poisson(1) CDF thresholds, per-replicate weighted
    // means, quantile_cont bounds — the full resample replayed.
    "q192b_bootstrap_exact" ->
      ("WITH r AS (SELECT event_id, CAST(value AS DOUBLE) AS x, " +
        "unnest(generate_series(0, 99)) AS b FROM events), " +
        "h AS (SELECT x, b, md5(CAST(event_id AS VARCHAR) || ':' || " +
        "CAST(b AS VARCHAR)) AS k FROM r), " +
        "u AS (SELECT x, b, (" +
        (1 to 6).map(i =>
          s"(CASE WHEN ascii(substr(k, $i, 1)) >= 97 THEN " +
            s"ascii(substr(k, $i, 1)) - 87 ELSE " +
            s"ascii(substr(k, $i, 1)) - 48 END) * ${math.pow(16.0, 6 - i)}")
          .mkString(" + ") +
        s" + 0.5) / ${math.pow(16.0, 6)} AS uu FROM h), " +
        "w AS (SELECT x, b, CASE WHEN uu < exp(-1) THEN 0 " +
        "WHEN uu < 2 * exp(-1) THEN 1 WHEN uu < 2.5 * exp(-1) THEN 2 " +
        "WHEN uu < exp(-1) * (2.5 + 1.0/6) THEN 3 ELSE 4 END AS wt " +
        "FROM u), " +
        "m AS (SELECT b, sum(wt * x) / sum(wt) AS mb FROM w GROUP BY 1), " +
        "base AS (SELECT avg(CAST(value AS DOUBLE)) AS mean FROM events) " +
        "SELECT round(base.mean, 6) AS mean, " +
        "round(quantile_cont(mb, 0.025), 6) AS ci_lo, " +
        "round(quantile_cont(mb, 0.975), 6) AS ci_hi, " +
        "CAST(count(*) AS INT) AS replicates FROM m, base " +
        "GROUP BY base.mean"),

    // l-diversity: distinct sensitive values per quasi class, rollup.
    "q271_l_diversity" ->
      (s"WITH $privacyCtes, " +
        "cl AS (SELECT event_type, ubucket, sum(n) AS sz, " +
        "count(*) AS div FROM cells GROUP BY 1, 2) " +
        "SELECT CAST(sum(sz) AS BIGINT) AS n_rows, " +
        "CAST(count(*) AS BIGINT) AS n_classes, " +
        "CAST(min(div) AS BIGINT) AS min_diversity, " +
        "CAST(sum(CASE WHEN div < 3 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS classes_below_l, " +
        "CAST(sum(CASE WHEN div < 3 THEN sz ELSE 0 END) AS BIGINT) " +
        "AS rows_below_l, " +
        "round(CAST(sum(CASE WHEN div < 3 THEN sz ELSE 0 END) AS DOUBLE) " +
        "/ sum(sz), 6) AS at_risk_share FROM cl"),

    // t-closeness: per-class TVD vs the corpus distribution, the absent
    // -value mass in closed form ((1 - sum present p_g) / 2 term).
    "q272_t_closeness" ->
      (s"WITH $privacyCtes, " +
        "tt AS (SELECT sum(n) AS t FROM cells), " +
        "gd AS (SELECT sv, sum(n) AS gn FROM cells GROUP BY 1), " +
        "cl AS (SELECT event_type, ubucket, sum(n) AS sz FROM cells " +
        "GROUP BY 1, 2), " +
        "term AS (SELECT c.event_type, c.ubucket, cl.sz, " +
        "abs(CAST(c.n AS DOUBLE) / cl.sz - CAST(g.gn AS DOUBLE) / tt.t) " +
        "AS ad, CAST(g.gn AS DOUBLE) / tt.t AS pg " +
        "FROM cells c JOIN cl USING (event_type, ubucket) " +
        "JOIN gd g USING (sv), tt) " +
        "SELECT event_type, ubucket, CAST(max(sz) AS BIGINT) AS n, " +
        "round((sum(ad) + (1 - sum(pg))) / 2, 6) AS t " +
        "FROM term GROUP BY 1, 2 ORDER BY 1, 2"),

    // Dataset card: token/char totals, exact median (quantile_cont ==
    // Spark percentile), md5-distinct dup pressure — unpivoted tall.
    "q275_corpus_card" ->
      ("WITH layered AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 20000, text FROM documents " +
        "WHERE doc_id % 9 = 0), " +
        "per AS (SELECT len(list_filter(string_split(" +
        "coalesce(text, ''), ' '), x -> len(x) > 0)) AS tk, " +
        "len(coalesce(text, '')) AS ch, md5(coalesce(text, '')) AS h " +
        "FROM layered), " +
        "a AS (SELECT count(*) AS n_docs, " +
        "sum(CASE WHEN tk = 0 THEN 1 ELSE 0 END) AS n_empty, " +
        "sum(tk) AS total_tokens, avg(tk) AS mean_tokens, " +
        "quantile_cont(tk, 0.5) AS p50_tokens, sum(ch) AS total_chars, " +
        "count(DISTINCT h) AS dh FROM per) " +
        "SELECT metric, round(value, 6) AS value FROM (" +
        "SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM a " +
        "UNION ALL SELECT 'n_empty', CAST(n_empty AS DOUBLE) FROM a " +
        "UNION ALL SELECT 'total_tokens', CAST(total_tokens AS DOUBLE) FROM a " +
        "UNION ALL SELECT 'mean_tokens', mean_tokens FROM a " +
        "UNION ALL SELECT 'p50_tokens', p50_tokens FROM a " +
        "UNION ALL SELECT 'total_chars', CAST(total_chars AS DOUBLE) FROM a " +
        "UNION ALL SELECT 'exact_dup_excess', " +
        "CAST(n_docs - dh AS DOUBLE) FROM a " +
        "UNION ALL SELECT 'exact_dup_share', " +
        "CAST(n_docs - dh AS DOUBLE) / n_docs FROM a) " +
        "ORDER BY metric"),

    // Hot-key diagnostic: per-key counts, top-10 cut, shares and the
    // mean-normalized skew factor.
    "q276_key_skew" ->
      ("WITH per AS (SELECT user_id % 137 AS ubucket, count(*) AS n " +
        "FROM events GROUP BY 1), " +
        "t AS (SELECT sum(n) AS rows_, count(*) AS n_keys FROM per), " +
        "top AS (SELECT ubucket, n, row_number() OVER " +
        "(ORDER BY n DESC, ubucket) AS rnk FROM per) " +
        "SELECT ubucket, CAST(n AS BIGINT) AS n, " +
        "round(CAST(n AS DOUBLE) / rows_, 6) AS share, " +
        "CAST(rnk AS INT) AS \"rank\", CAST(n_keys AS BIGINT) AS n_keys, " +
        "round(CAST(n AS DOUBLE) * n_keys / rows_, 6) AS skew_factor " +
        "FROM top, t WHERE rnk <= 10 ORDER BY rnk"),

    // Matryoshka truncation recall: full-width truth and each truncated
    // top-3 replayed exactly (sliced-list cosine, q39 tie order).
    "q273_truncation_recall" ->
      ("WITH " + topkPairsCte("tr", "embedding") + ", " +
        Seq(48, 32, 16).map(d =>
          topkPairsCte(s"h$d", s"list_slice(embedding, 1, $d)"))
          .mkString(", ") + " " +
        "SELECT dim, n_truth, n_hits, " +
        "round(CAST(n_hits AS DOUBLE) / n_truth, 6) AS recall FROM (" +
        Seq(48, 32, 16).map(d =>
          s"SELECT CAST($d AS INT) AS dim, " +
            "(SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_truth, " +
            s"(SELECT CAST(count(*) AS BIGINT) FROM h$d x SEMI JOIN tr t " +
            "ON x.query_id = t.query_id AND x.nbr_id = t.nbr_id) AS n_hits")
          .mkString(" UNION ALL ") +
        ") ORDER BY dim"),

    // Nearest join: the inequality-join argmin with the engine's exact
    // tie order (abs distance, then earlier rts; equal-ts views reduced
    // to min id first). Tolerance-before-argmin equals tolerance-after:
    // if the nearest is out of bounds, everything farther is too.
    "q270_nearest_join" ->
      ("WITH p AS (SELECT event_id, user_id, " +
        "epoch_us(ts) AS lts FROM events " +
        "WHERE event_type = 'purchase'), " +
        "v0 AS (SELECT user_id, epoch_us(ts) AS rts, " +
        "min(event_id) AS view_id FROM events WHERE event_type = 'view' " +
        "GROUP BY 1, 2), " +
        "j AS (SELECT p.event_id, p.user_id, v0.view_id, " +
        "v0.rts - p.lts AS dt, row_number() OVER (PARTITION BY p.event_id " +
        "ORDER BY abs(v0.rts - p.lts), v0.rts) AS rn " +
        "FROM p JOIN v0 USING (user_id) " +
        "WHERE abs(v0.rts - p.lts) <= 7200 * CAST(1000000 AS BIGINT)) " +
        "SELECT event_id, user_id, view_id AS nearest_view_id, " +
        "round(CAST(dt AS DOUBLE) / 1e6, 6) AS nearest_dt_sec " +
        "FROM j WHERE rn = 1 ORDER BY event_id"),

    // PII census: the same RE2-safe pattern families (identical regex
    // text) plus the Luhn mod-10 checksum replayed with list algebra.
    "q268_pii_scan" ->
      ("WITH planted AS (SELECT doc_id, text || " +
        "CASE WHEN doc_id % 4 = 0 THEN ' contact 4111 1111 1111 1111 " +
        "now' ELSE '' END || " +
        "CASE WHEN doc_id % 4 = 1 THEN ' ref 4111-1111-1111-1112 x' " +
        "ELSE '' END || " +
        "CASE WHEN doc_id % 3 = 0 THEN ' mail bob' || " +
        "CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END || " +
        "CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-6789' ELSE '' END " +
        "|| CASE WHEN doc_id % 7 = 0 THEN ' call (555) 867-5309 now' " +
        "ELSE '' END AS text FROM documents), " +
        "c AS (SELECT doc_id, " +
        "regexp_extract_all(text, " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}') AS em, " +
        "regexp_extract_all(text, '\\b\\d(?:[ -]?\\d){12,15}\\b') " +
        "AS cards, " +
        "regexp_extract_all(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b') AS ssn, " +
        "regexp_extract_all(text, '(?:\\+?1[ .-]?)?(?:\\(\\d{3}\\)|" +
        "\\d{3})[ .-]?\\d{3}[ .-]?\\d{4}\\b') AS ph FROM planted), " +
        "v AS (SELECT doc_id, em, cards, ssn, ph, " +
        "list_filter(list_transform(cards, x -> " +
        "regexp_replace(x, '[ -]', '', 'g')), d -> " +
        "len(d) BETWEEN 13 AND 19 AND " +
        "list_sum(list_transform(generate_series(1, len(d)), i -> " +
        "CASE WHEN i % 2 = 1 THEN CAST(substr(reverse(d), i, 1) AS INT) " +
        "WHEN CAST(substr(reverse(d), i, 1) AS INT) * 2 > 9 THEN " +
        "CAST(substr(reverse(d), i, 1) AS INT) * 2 - 9 " +
        "ELSE CAST(substr(reverse(d), i, 1) AS INT) * 2 END)) % 10 = 0) " +
        "AS valid FROM c) " +
        "SELECT doc_id, CAST(len(em) AS BIGINT) AS n_emails, " +
        "CAST(len(ssn) AS BIGINT) AS n_ssns, " +
        "CAST(len(ph) AS BIGINT) AS n_phones, " +
        "CAST(len(cards) AS BIGINT) AS n_card_candidates, " +
        "CAST(len(valid) AS BIGINT) AS n_cards_valid " +
        "FROM v ORDER BY doc_id"),

    // Chat transcript stats: the closed-form replay of the planted
    // 4-turn (3-turn broken) token-slice transcripts — every tally
    // derives from min/max arithmetic on the doc's token count.
    "q262_chat_stats" ->
      (s"WITH $chatSliceCtes " +
        "SELECT doc_id, true AS parse_ok, " +
        "CAST(CASE WHEN doc_id % 5 = 0 THEN 3 ELSE 4 END AS BIGINT) " +
        "AS n_turns, CAST(2 AS BIGINT) AS n_user, " +
        "CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 2 END AS BIGINT) " +
        "AS n_assistant, CAST(0 AS BIGINT) AS n_system, " +
        "CAST(0 AS BIGINT) AS n_other, true AS starts_user, " +
        "doc_id % 5 <> 0 AS alternates, " +
        "CASE WHEN doc_id % 5 = 0 THEN (c1 = 0 OR c2 = 0 OR c3 = 0) " +
        "ELSE (c1 = 0 OR c2 = 0 OR c3 = 0 OR c4 = 0) END " +
        "AS has_empty_content, " +
        "CAST(CASE WHEN doc_id % 5 = 0 THEN c1 + c2 + c3 " +
        "ELSE c1 + c2 + c3 + c4 END AS BIGINT) AS n_tokens, " +
        "CAST(CASE WHEN doc_id % 5 = 0 THEN c3 ELSE c2 + c4 END " +
        "AS BIGINT) AS assistant_tokens " +
        "FROM m ORDER BY doc_id"),

    // Transcript flattening: the role-sentinel string rebuilt from the
    // same token slices, newline-joined.
    "q263_chat_flatten" ->
      (s"WITH $chatSliceCtes " +
        "SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN " +
        "'<|user|>' || s1 || chr(10) || '<|user|>' || s2 || chr(10) || " +
        "'<|assistant|>' || s3 ELSE " +
        "'<|user|>' || s1 || chr(10) || '<|assistant|>' || s2 || " +
        "chr(10) || '<|user|>' || s3 || chr(10) || '<|assistant|>' || " +
        "s4 END AS training_text FROM m ORDER BY doc_id"),

    // SFT mask spans: assistant token ranges from the closed-form
    // per-turn counts (each turn occupies max(count, 1) tokens).
    "q269_mask_spans" ->
      (s"WITH $chatSliceCtes, " +
        "g AS (SELECT doc_id, greatest(c1, 1) AS g1, " +
        "greatest(c2, 1) AS g2, greatest(c3, 1) AS g3, " +
        "greatest(c4, 1) AS g4 FROM m) " +
        "SELECT doc_id, CAST(0 AS INT) AS seg_idx, " +
        "CAST(CASE WHEN doc_id % 5 = 0 THEN g1 + g2 ELSE g1 END " +
        "AS BIGINT) AS tok_start, " +
        "CAST(CASE WHEN doc_id % 5 = 0 THEN g1 + g2 + g3 " +
        "ELSE g1 + g2 END AS BIGINT) AS tok_end FROM g " +
        "UNION ALL " +
        "SELECT doc_id, CAST(1 AS INT) AS seg_idx, " +
        "CAST(g1 + g2 + g3 AS BIGINT) AS tok_start, " +
        "CAST(g1 + g2 + g3 + g4 AS BIGINT) AS tok_end FROM g " +
        "WHERE doc_id % 5 <> 0 " +
        "ORDER BY doc_id, seg_idx"),

    // Preference-pair structure: slices, lengths and distinct-token
    // Jaccard replayed with DuckDB list algebra.
    "q265_pref_stats" ->
      (s"WITH $prefCtes " +
        "SELECT doc_id, CAST(len(ct) AS BIGINT) AS len_chosen, " +
        "CAST(len(rt) AS BIGINT) AS len_rejected, " +
        "len(ct) > len(rt) AS chosen_longer, " +
        "round(CASE WHEN len(rt) > 0 THEN " +
        "CAST(len(ct) AS DOUBLE) / len(rt) END, 6) AS len_ratio, " +
        "round(CASE WHEN len(list_distinct(ct)) + len(list_distinct(rt)) " +
        "- len(list_intersect(list_distinct(ct), list_distinct(rt))) > 0 " +
        "THEN CAST(len(list_intersect(list_distinct(ct), " +
        "list_distinct(rt))) AS DOUBLE) / (len(list_distinct(ct)) + " +
        "len(list_distinct(rt)) - len(list_intersect(list_distinct(ct), " +
        "list_distinct(rt)))) END, 6) AS jaccard, " +
        "chosen = rejected AS identical " +
        "FROM pairs ORDER BY doc_id"),

    // Preference length-bias audit: the same per-pair terms rolled into
    // one row (avg skips null ratios/jaccards in both engines).
    "q266_pref_audit" ->
      (s"WITH $prefCtes, " +
        "st AS (SELECT doc_id, len(ct) AS lc, len(rt) AS lr, " +
        "CASE WHEN len(list_distinct(ct)) + len(list_distinct(rt)) - " +
        "len(list_intersect(list_distinct(ct), list_distinct(rt))) > 0 " +
        "THEN CAST(len(list_intersect(list_distinct(ct), " +
        "list_distinct(rt))) AS DOUBLE) / (len(list_distinct(ct)) + " +
        "len(list_distinct(rt)) - len(list_intersect(list_distinct(ct), " +
        "list_distinct(rt)))) END AS j, " +
        "chosen = rejected AS idp FROM pairs) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        "round(avg(CASE WHEN lc > lr THEN 1.0 ELSE 0.0 END), 6) " +
        "AS frac_chosen_longer, " +
        "round(avg(CASE WHEN lr > 0 THEN CAST(lc AS DOUBLE) / lr END), 6) " +
        "AS mean_len_ratio, " +
        "round(avg(CASE WHEN idp THEN 1.0 ELSE 0.0 END), 6) " +
        "AS frac_identical, " +
        "round(avg(CASE WHEN j IS NULL THEN NULL " +
        "WHEN j >= 0.8 THEN 1.0 ELSE 0.0 END), 6) AS frac_high_overlap, " +
        "round(avg(j), 6) AS mean_jaccard FROM st"),

    // Transcript validation: survivors = non-broken transcripts whose
    // every turn is non-empty (>= 25 tokens fills the 4th slice).
    "q264_valid_chats" ->
      ("SELECT doc_id FROM (SELECT doc_id, " +
        "len(list_filter(string_split(text, ' '), x -> len(x) > 0)) " +
        "AS l FROM documents) WHERE doc_id % 5 <> 0 AND l >= 25 " +
        "ORDER BY doc_id"),
  )
}
