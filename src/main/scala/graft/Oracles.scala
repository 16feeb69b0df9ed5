package graft

/** DuckDB oracle SQL for each entry in [[Queries]] (SparkEntry
  * contract). Each statement mirrors its Spark query column-for-column
  * (identical aliases) and uses the same exact-arithmetic shape
  * (DECIMAL-internal sums, single final DOUBLE casts, single-division
  * ratios) so results are bit-identical, not merely approximately
  * equal. Table names are the driver's parquet views.
  */
object Oracles {

  /** Effective validity predicate of the change-log scan (SURVEY S3). */
  private val V = "user_id IS NOT NULL AND event_type IS NOT NULL"

  /** The change-log column mapping (FIXTURES.md role mapping). */
  private val LOG =
    s"""SELECT event_id AS log_id, user_id AS rsbsa_no, event_type AS "table", ts, value, props FROM events WHERE $V"""

  /** Brute-force cosine top-10 for the fixed probe set — shared by
    * `sim_cosine_topk` and, at their full-recall settings, by the ANN
    * queries: `sim_lsh_topk` runs 9-probe multi-probe (own + every
    * Hamming-1 bucket) and `sim_ivf_topk` probes nprobe = nlist cells,
    * so both provably/empirically return the exact brute-force top-k
    * (SURVEY §8) — making the recall claim driver-visible instead of
    * test-only.
    */
  /** Shared PCA prelude: quantize → exact scatter moments → 20-round
    * power iteration (recursive CTE) → component `vfin.v` + mean
    * correction `c0.c`. Callers prepend `WITH RECURSIVE`.
    */
  private val PCA_CTES =
    """q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |nn AS (SELECT count(*) AS n FROM q),
      |ex AS (
      |  SELECT vec_id, u.i AS i, u.v AS vi FROM (
      |    SELECT vec_id,
      |      unnest(list_transform(range(1, 65),
      |        i -> {'i': i - 1, 'v': qv[i]})) AS u
      |    FROM q)),
      |s AS (SELECT i, CAST(sum(vi) AS BIGINT) AS si FROM ex GROUP BY i),
      |sl AS (SELECT list(si ORDER BY i) AS sv FROM s),
      |g AS (
      |  SELECT a.i AS i, b.i AS j, CAST(sum(a.vi * b.vi) AS BIGINT) AS gij
      |  FROM ex a JOIN ex b USING (vec_id) GROUP BY a.i, b.i),
      |br AS (
      |  SELECT g.i AS i,
      |    list(CAST(nn.n * g.gij - sa.si * sb.si AS DOUBLE) ORDER BY g.j) AS row
      |  FROM g JOIN s sa ON sa.i = g.i JOIN s sb ON sb.i = g.j CROSS JOIN nn
      |  GROUP BY g.i),
      |bm AS (SELECT list(row ORDER BY i) AS m FROM br),
      |it AS (
      |  SELECT 0 AS t, m,
      |    list_transform(range(1, 65),
      |      i -> CAST(1.0 AS DOUBLE) / sqrt(CAST(64 AS DOUBLE))) AS v
      |  FROM bm
      |  UNION ALL
      |  SELECT t + 1, m,
      |    list_transform(
      |      list_transform(range(1, 65), i ->
      |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |          list_transform(range(1, 65), j -> m[i][j] * v[j])),
      |          (a, b) -> a + b)),
      |      x -> x / sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |        list_transform(
      |          list_transform(range(1, 65), i2 ->
      |            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |              list_transform(range(1, 65), j2 -> m[i2][j2] * v[j2])),
      |              (a2, b2) -> a2 + b2)),
      |          y -> y * y)), (a3, b3) -> a3 + b3)))
      |  FROM it WHERE t < 20),
      |vfin AS (SELECT v FROM it WHERE t = 20),
      |c0 AS (
      |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, 65),
      |        i -> CAST(sl.sv[i] AS DOUBLE) / CAST(nn.n AS DOUBLE) * vfin.v[i])),
      |      (a, b) -> a + b) AS c
      |  FROM sl CROSS JOIN nn CROSS JOIN vfin)""".stripMargin

  /** Greedy k-center coreset, all 8 rounds unrolled: round r picks the
    * max-min-squared-L2 row (ties by vec_id) of state s_{r-1}, then
    * s_r folds the new center into every remaining row's min distance
    * — exact integer arithmetic end to end, mirroring
    * `Similarity.kCenterCoreset` bit for bit. CTE chain shared with
    * the contrastive-set composition (ends in `kc(rank, vec_id,
    * dist_sq)` plus the quantized table `q(vec_id, qv, nsq)`).
    */
  private val KCENTER_CTES: String = {
    val k = 8
    def dotTo(alias: String): String =
      s"CAST(list_sum(list_transform(range(1, len(x.qv) + 1), " +
        s"i -> x.qv[i] * $alias.qv[i])) AS BIGINT)"
    val head =
      """n AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM n),
        |c1 AS (SELECT vec_id, qv, nsq FROM q
        |       WHERE vec_id = (SELECT min(vec_id) FROM q)),
        |s1 AS (
        |  SELECT x.vec_id, x.qv, x.nsq,
        |    x.nsq + c.nsq - 2 * """.stripMargin + dotTo("c") +
        " AS d\n  FROM q x, c1 c WHERE x.vec_id != c.vec_id)"
    val rounds = (2 to k).flatMap { r =>
      val f = s"f$r AS (SELECT vec_id, qv, nsq, d FROM s${r - 1} " +
        "ORDER BY d DESC, vec_id LIMIT 1)"
      val s = if (r < k)
        Some(s"s$r AS (\n  SELECT x.vec_id, x.qv, x.nsq,\n" +
          s"    least(x.d, x.nsq + f.nsq - 2 * ${dotTo("f")}) AS d\n" +
          s"  FROM s${r - 1} x, f$r f WHERE x.vec_id != f.vec_id)")
      else None
      f +: s.toSeq
    }
    val out = (Seq(
      "SELECT 1 AS rank, vec_id, CAST(0 AS BIGINT) AS dist_sq FROM c1") ++
      (2 to k).map(r => s"SELECT $r AS rank, vec_id, d AS dist_sq FROM f$r"))
      .mkString("\nUNION ALL\n")
    (head +: rounds).mkString(",\n") + s",\nkc AS (\n$out)"
  }

  /** URL fixture + canonicalization CTE chain shared by the URL-family
    * queries — replays `Normalize.canonicalUrl` rule for rule:
    * lowercase authority, default-port strip (`:80` iff http, `:443`
    * iff https), fragment drop, STRUCTURAL query-scoped tracking-param
    * removal (split the query body on `&`, drop params whose
    * lowercased name — the part before the first `=` — is tracked,
    * rejoin survivors verbatim; the same split/filter/rejoin as the
    * engine, which regex scans cannot express safely — see the engine
    * scaladoc's three hazards), empty path → `/`. Ends in
    * `canon(doc_id, url, canon_url, host)` — the host emitted ONCE
    * here (userinfo-skipping rule included) so the URL queries cannot
    * drift from each other.
    */
  private val URL_CANON_CTES: String = {
    val trackedIn = Seq("utm_source", "utm_medium", "utm_campaign",
      "utm_term", "utm_content", "gclid", "fbclid", "ref")
      .map(n => s"'$n'").mkString(", ")
    s"""base AS (
       |  SELECT doc_id, source || '.example.com' AS host,
       |    '/page-' ||
       |      CAST(CAST(floor(doc_id / 100.0) AS BIGINT) AS VARCHAR) AS path,
       |    CAST(floor(doc_id / 20.0) AS BIGINT) % 5 AS v
       |  FROM documents),
       |u AS (
       |  SELECT doc_id,
       |    CASE v
       |      WHEN 0 THEN 'https://' || host || path
       |      WHEN 1 THEN 'HTTPS://' || upper(host) || path
       |      WHEN 2 THEN 'https://' || host || ':443' || path
       |      WHEN 3 THEN 'https://' || host || path || '?utm_source=feed&x=1'
       |      ELSE 'https://' || host || path || '?x=1&fbclid=abc#frag'
       |    END AS url
       |  FROM base),
       |pre AS (
       |  SELECT doc_id, url,
       |    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)
       |      AS prefix
       |  FROM u),
       |parts AS (
       |  SELECT doc_id, url, lower(prefix) AS auth,
       |    substr(url, length(prefix) + 1) AS rest
       |  FROM pre),
       |nofrag AS (
       |  SELECT doc_id, url,
       |    CASE WHEN starts_with(auth, 'http://')
       |           THEN regexp_replace(auth, ':80\\z', '')
       |         WHEN starts_with(auth, 'https://')
       |           THEN regexp_replace(auth, ':443\\z', '')
       |         ELSE auth END AS noport,
       |    regexp_replace(rest, '(?s)#.*', '') AS nf
       |  FROM parts),
       |splitq AS (
       |  SELECT doc_id, url, noport,
       |    CASE WHEN strpos(nf, '?') = 0 THEN nf
       |         ELSE substr(nf, 1, strpos(nf, '?') - 1) END AS path,
       |    CASE WHEN strpos(nf, '?') = 0 THEN ''
       |         ELSE substr(nf, strpos(nf, '?')) END AS query
       |  FROM nofrag),
       |cleaned AS (
       |  SELECT doc_id, url, noport, path,
       |    CASE WHEN query = '' THEN ''
       |         ELSE '?' || array_to_string(list_filter(
       |           string_split(substr(query, 2), '&'),
       |           p -> lower(split_part(p, '=', 1))
       |             NOT IN ($trackedIn)), '&') END AS q0
       |  FROM splitq),
       |canon AS (
       |  SELECT doc_id, url,
       |    noport || (CASE WHEN path = '' THEN '/' ELSE path END) ||
       |      (CASE WHEN q0 = '?' THEN '' ELSE q0 END) AS canon_url,
       |    regexp_extract(lower(url),
       |      '^[a-z0-9+.-]+://(?:[^/?#@]*@)?([^/:?#@]+)', 1)
       |      AS host
       |  FROM cleaned)""".stripMargin
  }

  private val KCENTER: String =
    s"WITH $KCENTER_CTES\nSELECT rank, vec_id, dist_sq FROM kc"

  private val BRUTE_TOPK =
    """WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, qv,
      |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
      |  FROM q),
      |probes AS (SELECT vec_id AS qid, qv AS pv, nsq AS pn FROM n
      |           WHERE vec_id IN (0, 1, 2, 3, 4)),
      |scored AS (
      |  SELECT p.qid, c.vec_id AS nid,
      |    CAST(CAST(list_sum(list_transform(range(1, len(c.qv) + 1),
      |        i -> c.qv[i] * p.pv[i])) AS BIGINT) AS DOUBLE)
      |      / (sqrt(CAST(c.nsq AS DOUBLE)) * sqrt(CAST(p.pn AS DOUBLE))) AS cos
      |  FROM n c, probes p WHERE c.vec_id != p.qid)
      |SELECT qid, rank, nid, round(cos, 6) AS cos FROM (
      |  SELECT qid, nid, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
      |  FROM scored)
      |WHERE rank <= 10""".stripMargin

  /** SimHash fingerprint + Hamming-pair oracle, generated: token hashes
    * are md5-portable (first 8 bytes signed — identical to the
    * `graft_tokenhashes` kernel by construction), then 64 per-bit vote
    * sums rebuild the fingerprint (bit b set iff strictly more set than
    * unset votes — the kernel's `votes(b) > 0` rule), and the pair join
    * is ALL-pairs `bit_count(xor) <= 3` — the complete form the
    * engine's pigeonhole banding provably equals. HUGEINT assembles the
    * unsigned fingerprint; the sign fold subtracts 2^64.
    */
  private val SIMHASH_PAIRS: String = {
    val votes = (0 until 64).map(b =>
      s"CASE WHEN 2 * sum((h >> $b) & 1) > count(*) THEN (1::HUGEINT << $b) ELSE 0::HUGEINT END")
      .mkString("\n      + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS t
       |  FROM documents),
       |th AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(t), 1, 16)) AS UBIGINT) AS uh
       |  FROM tok),
       |hs AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN uh >= 9223372036854775808::HUGEINT
       |      THEN CAST(uh AS HUGEINT) - 18446744073709551616::HUGEINT
       |      ELSE CAST(uh AS HUGEINT) END AS BIGINT) AS h
       |  FROM th),
       |fpu AS (
       |  SELECT doc_id,
       |    ($votes) AS ufp
       |  FROM hs GROUP BY doc_id),
       |fp AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN ufp >= 9223372036854775808::HUGEINT
       |      THEN ufp - 18446744073709551616::HUGEINT
       |      ELSE ufp END AS BIGINT) AS f
       |  FROM fpu)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.f, b.f)) <= 3""".stripMargin
  }

  /** Banded cosine-LSH near-dup oracle, generated: rebuilds the 64-bit
    * hyperplane signature from the md5-portable plane weights
    * ([[graft.plans.TextKernels.planeWeight]]: first 4 bytes of
    * `md5("p_i")` mod 2000, shifted to ±1), slices it into 8 bands of
    * 8 bits, joins pairs colliding in ANY band, and verifies with the
    * same quantized-integer cosine as `dedup_cosine_pairs`. This
    * verifies the LSH CANDIDATE GENERATION itself bit-for-bit, not
    * just that the output is some subset of the exact pairs. The
    * weights CTE computes each md5 once (64 planes × 64 dims); the
    * per-plane dot uses `list_transform` in ascending element order —
    * the kernel's exact FP accumulation order.
    */
  private val COSINE_LSH_PAIRS: String =
    """WITH w AS (
      |  SELECT p.p,
      |    list((CAST(CAST(concat('0x', substr(md5(concat(p.p, '_', i.i)), 1, 8)) AS UBIGINT) % 2000 AS BIGINT) - 1000) / 1000.0
      |      ORDER BY i.i) AS wl
      |  FROM range(0, 64) p(p), range(0, 64) i(i) GROUP BY p.p),
      |dots AS (
      |  SELECT e.vec_id, w.p,
      |    list_sum(list_transform(range(1, 65),
      |      i -> e.embedding[i] * w.wl[i])) AS dot
      |  FROM embeddings e, w),
      |sig AS (
      |  SELECT vec_id,
      |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
      |      THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS sg
      |  FROM (SELECT vec_id,
      |          sum(CASE WHEN dot > 0 THEN (1::HUGEINT << p) ELSE 0::HUGEINT END) AS s
      |        FROM dots GROUP BY vec_id)),
      |banded AS (
      |  SELECT vec_id, b.band, (sg >> (b.band * 8)) & 255 AS bk
      |  FROM sig, range(0, 8) b(band)),
      |cands AS (
      |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bk = b.bk AND a.vec_id < b.vec_id),
      |q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, qv,
      |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
      |  FROM q)
      |SELECT c.a_id, c.b_id,
      |  round(CAST(list_sum(list_transform(range(1, 65),
      |      i -> a.qv[i] * b.qv[i])) AS DOUBLE)
      |    / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))), 6) AS cos
      |FROM cands c
      |JOIN n a ON a.vec_id = c.a_id
      |JOIN n b ON b.vec_id = c.b_id
      |WHERE CAST(list_sum(list_transform(range(1, 65),
      |      i -> a.qv[i] * b.qv[i])) AS DOUBLE)
      |    / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) >= 0.4""".stripMargin

  /** KNN-graph oracle, generated: the same banded-signature rebuild as
    * [[COSINE_LSH_PAIRS]], but candidates flow BOTH directions
    * (qid ≠ nid) and the tail is a per-qid ranking window instead of a
    * threshold — verifying the graph semantics (top-k OF THE CANDIDATE
    * SET) bit-for-bit, candidates included.
    */
  private val KNN_GRAPH: String =
    """WITH w AS (
      |  SELECT p.p,
      |    list((CAST(CAST(concat('0x', substr(md5(concat(p.p, '_', i.i)), 1, 8)) AS UBIGINT) % 2000 AS BIGINT) - 1000) / 1000.0
      |      ORDER BY i.i) AS wl
      |  FROM range(0, 64) p(p), range(0, 64) i(i) GROUP BY p.p),
      |dots AS (
      |  SELECT e.vec_id, w.p,
      |    list_sum(list_transform(range(1, 65),
      |      i -> e.embedding[i] * w.wl[i])) AS dot
      |  FROM embeddings e, w),
      |sig AS (
      |  SELECT vec_id,
      |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
      |      THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS sg
      |  FROM (SELECT vec_id,
      |          sum(CASE WHEN dot > 0 THEN (1::HUGEINT << p) ELSE 0::HUGEINT END) AS s
      |        FROM dots GROUP BY vec_id)),
      |banded AS (
      |  SELECT vec_id, b.band, (sg >> (b.band * 8)) & 255 AS bk
      |  FROM sig, range(0, 8) b(band)),
      |cands AS (
      |  SELECT DISTINCT a.vec_id AS qid, b.vec_id AS nid
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bk = b.bk AND a.vec_id <> b.vec_id),
      |q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, qv,
      |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
      |  FROM q),
      |scored AS (
      |  SELECT c.qid, c.nid,
      |    CAST(list_sum(list_transform(range(1, 65),
      |        i -> a.qv[i] * b.qv[i])) AS DOUBLE)
      |      / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cs
      |  FROM cands c
      |  JOIN n a ON a.vec_id = c.qid
      |  JOIN n b ON b.vec_id = c.nid)
      |SELECT qid, rank, nid, round(cs, 6) AS cos FROM (
      |  SELECT qid, nid, cs,
      |    row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid) AS rank
      |  FROM scored)
      |WHERE rank <= 3""".stripMargin

  /** Shared CTE chain for the repeated-substring family: per-position
    * md5 8-gram hashes (identical to `graft_gramhashes` by
    * construction), corpus-wide counts, hot positions (count ≥ 2), and
    * gaps-and-islands span merging. The island id is computed in two
    * window stages (lag gap, then running sum) exactly like the
    * engine's two projections.
    */
  private def hotSpanCtes(rel: String): String =
    // NB: the s-interpolator processes escapes even in triple quotes —
    // \\s here reaches the SQL as \s
    s"""tok AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      |  FROM $rel),
      |gl AS (
      |  SELECT doc_id,
      |    list_transform(range(1, greatest(len(toks) - 8, 0) + 2),
      |      s -> md5(array_to_string(toks[s : least(s + 7, len(toks))], ' '))) AS gs
      |  FROM tok),
      |g AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(gs) + 1),
      |      p -> {'pos': p - 1, 'h': gs[p]})) AS u
      |  FROM gl),
      |g2 AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM g),
      |c AS (SELECT h, count(*) AS n FROM g2 GROUP BY h),
      |hot AS (
      |  SELECT g2.doc_id, g2.pos FROM g2 JOIN c USING (h) WHERE c.n >= 2),
      |gaps AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
      |      THEN 1 ELSE 0 END AS gap
      |  FROM hot),
      |isl AS (
      |  SELECT doc_id, pos,
      |    sum(gap) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM gaps),
      |spans AS (
      |  SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
      |    CAST(max(pos) + 8 AS BIGINT) AS span_end,
      |    count(*) AS n_hot_grams
      |  FROM isl GROUP BY doc_id, island)""".stripMargin

  /** [[hotSpanCtes]] at CHARACTER granularity (the `graft_chargrams`
    * kernel's semantics: per-code-point-position 20-char grams of the
    * RAW text, hot ≥ 2 corpus-wide, islands merge at gap > 20),
    * ending in `spans(doc_id, span_start, span_end, n_hot_grams)`.
    */
  private def charSpanCtes(rel: String): String =
    s"""g AS (
      |  SELECT doc_id,
      |    unnest(list_transform(
      |      range(1, greatest(length(text) - 20, 0) + 2),
      |      s -> {'pos': s - 1, 'h': md5(substr(text, s, 20))})) AS u
      |  FROM $rel),
      |g2 AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM g),
      |c AS (SELECT h, count(*) AS n FROM g2 GROUP BY h),
      |hot AS (
      |  SELECT g2.doc_id, g2.pos FROM g2 JOIN c USING (h) WHERE c.n >= 2),
      |gaps AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 20
      |      THEN 1 ELSE 0 END AS gap
      |  FROM hot),
      |isl AS (
      |  SELECT doc_id, pos,
      |    sum(gap) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM gaps),
      |spans AS (
      |  SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
      |    CAST(max(pos) + 20 AS BIGINT) AS span_end,
      |    count(*) AS n_hot_grams
      |  FROM isl GROUP BY doc_id, island)""".stripMargin

  /** Content-defined chunking CTEs (the `Dedup.cdcChunks` semantics):
    * cut where the 8-char window's md5-first-8-bytes hash ≡ 0 mod 64,
    * chunks between consecutive boundaries of [0, cuts…, len]. Ends in
    * `ch(doc_id, c{ln, h})`.
    */
  private val CDC_CHUNK_CTES: String =
    """d AS (
      |  SELECT doc_id, text, length(text) AS n
      |  FROM documents WHERE length(text) > 0),
      |cut AS (
      |  SELECT doc_id, text, n,
      |    list_filter(
      |      list_transform(range(1, greatest(n - 8, 0) + 2), s -> s - 1),
      |      i -> i > 0 AND
      |        CAST(concat('0x', substr(md5(substr(text, CAST(i + 1 AS INT), 8)), 1, 16))
      |          AS UBIGINT) % 64 = 0) AS cuts
      |  FROM d),
      |b AS (
      |  SELECT doc_id, text,
      |    list_concat(list_concat([CAST(0 AS BIGINT)], cuts),
      |      [CAST(n AS BIGINT)]) AS bs
      |  FROM cut),
      |ch AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(bs)), i ->
      |      {'ln': bs[i + 1] - bs[i],
      |       'h': md5(substr(text, CAST(bs[i] + 1 AS INT),
      |                 CAST(bs[i + 1] - bs[i] AS INT)))})) AS c
      |  FROM b)""".stripMargin

  /** [[hotSpanCtes]] plus the token-cut rewrite, ending in
    * `removal(doc_id, clean_text, n_removed_tokens)`.
    */
  private def spanRemovalCtes(rel: String): String =
    s"""${hotSpanCtes(rel)},
       |otok AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS toks
       |  FROM $rel),
       |ot AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(toks) + 1),
       |      p -> {'pos': p - 1, 'tok': toks[p]})) AS u
       |  FROM otok),
       |ot2 AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM ot),
       |cover AS (
       |  SELECT t.doc_id, t.pos, t.tok,
       |    max(CASE WHEN s.doc_id IS NOT NULL
       |      AND t.pos >= s.span_start AND t.pos < s.span_end
       |      THEN 1 ELSE 0 END) AS covered
       |  FROM ot2 t LEFT JOIN spans s ON s.doc_id = t.doc_id
       |  GROUP BY t.doc_id, t.pos, t.tok),
       |removal AS (
       |  SELECT doc_id,
       |    COALESCE(string_agg(CASE WHEN covered = 0 THEN tok END, ' '
       |      ORDER BY pos), '') AS clean_text,
       |    CAST(sum(covered) AS BIGINT) AS n_removed_tokens
       |  FROM cover GROUP BY doc_id)""".stripMargin

  /** One BM25 term's contribution — the EXACT expression tree
    * `TextAnalysis.bm25TopK` builds (idf × tf·(k1+1) / (tf + k1·norm)),
    * k1 = 1.2, b = 0.75, literals cast to DOUBLE so DuckDB's DECIMAL
    * literal arithmetic cannot fold differently from Spark's Scala
    * doubles.
    */
  private def bm25Term(t: String, df: String): String =
    s"""ln((CAST(n_docs AS DOUBLE) - CAST($df AS DOUBLE) + 0.5)
       |        / (CAST($df AS DOUBLE) + 0.5) + 1.0)
       |      * (CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE)
       |        * (CAST(1.2 AS DOUBLE) + 1.0))
       |      / (CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE)
       |        + CAST(1.2 AS DOUBLE) * ((1.0 - 0.75)
       |          + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)
       |            * CAST(n_docs AS DOUBLE) / CAST(total_dl AS DOUBLE)))""".stripMargin

  /** Gap-based (30 min) sessionization CTE chain over `events`,
    * ending in `s(rsbsa_no, ts, sid)`. Callers prepend `WITH` and
    * aggregate per (rsbsa_no, sid).
    */
  private def sessionCtes: String =
    s"""e AS (SELECT user_id AS rsbsa_no, ts FROM events WHERE $V),
       |m AS (SELECT rsbsa_no, ts,
       |  CASE WHEN lag(ts) OVER w IS NULL
       |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1
       |       ELSE 0 END AS new_s
       |  FROM e WINDOW w AS (PARTITION BY rsbsa_no ORDER BY ts)),
       |s AS (SELECT rsbsa_no, ts,
       |  sum(new_s) OVER (PARTITION BY rsbsa_no ORDER BY ts
       |                   ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM m)""".stripMargin

  /** Rolling z-score CTE chain over `events`, ending in
    * `z(log_id, rsbsa_no, ts, value, n_base, zr, vr)` — exact
    * DECIMAL(18,2) window sums, one fixed FP tree (see `ts_zscore`).
    * Callers prepend `WITH`.
    */
  private def zscoreCtes: String =
    s"""e AS (
       |  SELECT event_id AS log_id, user_id AS rsbsa_no, ts, value,
       |    CAST(value AS DECIMAL(18,2)) AS dv
       |  FROM events WHERE $V AND value IS NOT NULL),
       |w AS (
       |  SELECT log_id, rsbsa_no, ts, value,
       |    count(dv) OVER fr AS n_base,
       |    CAST(sum(dv) OVER fr AS DOUBLE) AS s,
       |    CAST(sum(dv * dv) OVER fr AS DOUBLE) AS ss
       |  FROM e
       |  WINDOW fr AS (PARTITION BY rsbsa_no ORDER BY ts, log_id
       |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
       |z AS (
       |  SELECT log_id, rsbsa_no, ts, value, n_base,
       |    (value - s / CAST(n_base AS DOUBLE))
       |      / sqrt((ss - s * s / CAST(n_base AS DOUBLE))
       |             / (CAST(n_base AS DOUBLE) - CAST(1.0 AS DOUBLE))) AS zr,
       |    (ss - s * s / CAST(n_base AS DOUBLE))
       |      / (CAST(n_base AS DOUBLE) - CAST(1.0 AS DOUBLE)) AS vr
       |  FROM w)""".stripMargin

  /** Recursive-CTE connected components over the exact-Jaccard
    * near-dup pairs of `documents`, ending in
    * `comp(doc_id, component)`. Callers prepend `WITH RECURSIVE`.
    */
  private def componentCtes: String =
    """tok AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      range(1, greatest(len(toks) - 3, 0) + 2),
      |      s -> concat_ws(' ', toks[s], toks[s+1], toks[s+2]))) AS shingles
      |  FROM tok),
      |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
      |  HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5),
      |edges AS (
      |  SELECT a_id AS u, b_id AS v FROM pairs
      |  UNION SELECT b_id, a_id FROM pairs),
      |reach(id, r) AS (
      |  SELECT DISTINCT u, u FROM edges
      |  UNION
      |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r),
      |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id)""".stripMargin

  /** Bigram-LM cross-entropy CTE chain over `rel(doc_id, text)`,
    * ending in `lmscore(doc_id, n_bigrams, xent)` — see
    * `text_lm_score` for the determinism rules.
    */
  /** Shared label-propagation CTE chain (3 unrolled synchronous
    * rounds over the repeat co-purchase graph with every-10th-part
    * brand seeds) — used by graph_labelprop and graph_modularity.
    * Majority vote = row_number over (count DESC, label ASC), the
    * same deterministic argmax as Spark's min(struct(−count, label)).
    */
  private val LABELPROP_CTES: String = {
    def round(prev: String, v: String, i: String, out: String): String =
      s"""$v AS (SELECT ed.dst AS node, l.label, count(*) AS cnt
         |  FROM ed JOIN $prev l ON l.node = ed.src
         |  GROUP BY ed.dst, l.label),
         |$i AS (SELECT node, label FROM (
         |  SELECT node, label, row_number() OVER (
         |    PARTITION BY node ORDER BY cnt DESC, label) AS rn FROM $v)
         |  WHERE rn = 1),
         |$out AS (SELECT * FROM seed UNION ALL
         |  SELECT * FROM $i WHERE node NOT IN (SELECT node FROM seed))""".stripMargin
    s"""d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |r AS (SELECT l_orderkey, l_partkey, row_number() OVER (
       |    PARTITION BY l_orderkey ORDER BY l_partkey) AS rn FROM d),
       |c AS (SELECT l_orderkey, l_partkey FROM r WHERE rn <= 32),
       |p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb FROM c a
       |  JOIN c b ON a.l_orderkey = b.l_orderkey
       |          AND a.l_partkey < b.l_partkey),
       |g AS (SELECT pa, pb, count(*) AS n FROM p GROUP BY pa, pb),
       |e0 AS (SELECT pa, pb FROM g WHERE n >= 2),
       |ed AS (SELECT pa AS src, pb AS dst FROM e0
       |  UNION ALL SELECT pb, pa FROM e0),
       |seed AS (SELECT DISTINCT p_partkey AS node, p_brand AS label
       |  FROM part WHERE p_partkey % 10 = 0),
       |${round("seed", "v1", "i1", "l1")},
       |${round("l1", "v2", "i2", "l2")},
       |${round("l2", "v3", "i3", "l3")}""".stripMargin
  }

  private def lmCtes(rel: String): String =
    s"""lmtok AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
       |  FROM $rel),
       |uni AS (
       |  SELECT t AS w1, count(*) AS c1
       |  FROM (SELECT unnest(toks) AS t FROM lmtok) GROUP BY t),
       |v AS (SELECT count(*) AS vv FROM uni),
       |bgl AS (
       |  SELECT doc_id,
       |    list_transform(range(1, len(toks)),
       |      i -> {'pos': i - 1, 'w1': toks[i], 'w2': toks[i + 1]}) AS bl
       |  FROM lmtok WHERE len(toks) >= 2),
       |bg AS (SELECT doc_id, unnest(bl) AS u FROM bgl),
       |bg2 AS (SELECT doc_id, u.pos AS pos, u.w1 AS w1, u.w2 AS w2 FROM bg),
       |bi AS (SELECT w1, w2, count(*) AS c2 FROM bg2 GROUP BY w1, w2),
       |lp AS (
       |  SELECT bg2.doc_id, bg2.pos,
       |    round(ln(CAST(uni.c1 AS DOUBLE) + CAST(v.vv AS DOUBLE))
       |      - ln(CAST(bi.c2 AS DOUBLE) + 1.0), 9) AS lp
       |  FROM bg2
       |  JOIN uni ON uni.w1 = bg2.w1
       |  JOIN bi ON bi.w1 = bg2.w1 AND bi.w2 = bg2.w2
       |  CROSS JOIN v),
       |lmscore AS (
       |  SELECT doc_id,
       |    count(*) AS n_bigrams,
       |    round(list_sum(list(lp ORDER BY pos)) / count(*), 4) AS xent
       |  FROM lp GROUP BY doc_id)""".stripMargin

  /** Shared CTE chain for the DSIR family (mirrors
    * `Selection.weightsRaw` exactly): hashed-bigram features
    * (md5-derived bucket mod 1024 — portable), one-pass raw/target
    * bucket counts, per-feature log ratios joined back, ordered-fold
    * per-doc sum plus the folded-normalizer term. `dsw` ends with the
    * UNROUNDED `logw_raw` so the sample oracle can rank on it.
    */
  private val DSIR_CTES: String =
    """dstok AS (
      |  SELECT doc_id, (lang = 'en') AS t,
      |    string_split_regex(lower(text), '\s+') AS toks
      |  FROM documents),
      |dsbg AS (
      |  SELECT doc_id, t,
      |    list_transform(range(1, len(toks)),
      |      i -> {'pos': i - 1, 'g': concat(toks[i], ' ', toks[i + 1])}) AS bl
      |  FROM dstok WHERE len(toks) >= 2),
      |dsf0 AS (SELECT doc_id, t, unnest(bl) AS u FROM dsbg),
      |dsf AS (
      |  SELECT doc_id, t, u.pos AS pos,
      |    CAST(CAST(concat('0x', substr(md5(u.g), 1, 16)) AS UBIGINT)
      |      % 1024 AS BIGINT) AS b
      |  FROM dsf0),
      |dscnt AS (
      |  SELECT b, count(*) AS cr,
      |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct
      |  FROM dsf GROUP BY b),
      |dstot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM dscnt),
      |dslp AS (
      |  SELECT f.doc_id, f.pos,
      |    ln(CAST(c.ct AS DOUBLE) + 1.0) - ln(CAST(c.cr AS DOUBLE) + 1.0) AS lp
      |  FROM dsf f JOIN dscnt c ON c.b = f.b),
      |dsws AS (
      |  SELECT doc_id, count(*) AS n_feats,
      |    list_sum(list(lp ORDER BY pos)) AS s
      |  FROM dslp GROUP BY doc_id),
      |dsw AS (
      |  SELECT doc_id, n_feats,
      |    s + CAST(n_feats AS DOUBLE)
      |      * (ln(CAST(nr AS DOUBLE) + 1024.0) - ln(CAST(nt AS DOUBLE) + 1024.0))
      |      AS logw_raw
      |  FROM dsws CROSS JOIN dstot)""".stripMargin

  /** Shared PQ CTEs (`sim_pq_topk` / `sim_ivfpq_topk`): rebuild the
    * WHOLE product-quantization computation bit-for-bit — quantized
    * vectors, seed codebooks from the 16 lowest vec_ids, per-subspace
    * integer argmin encode, per-query distance tables. All exact
    * integers; m=8 subspaces × 8 dims; slice bounds are 1-based
    * inclusive in DuckDB list syntax. Leaves CTEs `q` (quantized),
    * `enc` (codes), `dt` (query tables) in scope.
    */
  private val PQ_CTES: String =
    """q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |seed AS (
      |  SELECT qv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c
      |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 16)),
      |cw AS (
      |  SELECT seed.c, CAST(r.j AS INT) AS j,
      |    qv[(r.j * 8 + 1):(r.j * 8 + 8)] AS w
      |  FROM seed CROSS JOIN range(0, 8) r(j)),
      |cwn AS (
      |  SELECT c, j, w,
      |    CAST(list_sum(list_transform(w, x -> x * x)) AS BIGINT) AS wn
      |  FROM cw),
      |sub AS (
      |  SELECT vec_id, CAST(r.j AS INT) AS j,
      |    qv[(r.j * 8 + 1):(r.j * 8 + 8)] AS s
      |  FROM q CROSS JOIN range(0, 8) r(j)),
      |enc0 AS (
      |  SELECT s.vec_id, s.j, w.c,
      |    w.wn - 2 * CAST(list_sum(list_transform(range(1, 9),
      |      i -> s.s[i] * w.w[i])) AS BIGINT) AS d
      |  FROM sub s JOIN cwn w ON w.j = s.j),
      |enc AS (
      |  SELECT vec_id, j, c FROM (
      |    SELECT vec_id, j, c,
      |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
      |    FROM enc0) WHERE rn = 1),
      |qsub AS (
      |  SELECT vec_id AS qid, j, s FROM sub WHERE vec_id IN (0, 1, 2, 3, 4)),
      |dt AS (
      |  SELECT qs.qid, qs.j, w.c,
      |    CAST(list_sum(list_transform(qs.s, x -> x * x)) AS BIGINT) + w.wn
      |      - 2 * CAST(list_sum(list_transform(range(1, 9),
      |        i -> qs.s[i] * w.w[i])) AS BIGINT) AS d
      |  FROM qsub qs JOIN cwn w ON w.j = qs.j)""".stripMargin

  /** Shared 3-round WordPiece training chain (word table -> v0..v2,
    * likelihood-scored winners m0..m2) - used by the trainer oracle
    * and by the trained-encode oracle that consumes the fused pieces.
    * No leading WITH; margin already embedded.
    */
  private val WP_TRAIN_CTES =
    """wc AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents)
        |  WHERE length(word) > 0 GROUP BY word
        |  ORDER BY n DESC, word LIMIT 65536),
        |v0 AS (
        |  SELECT ' ' || array_to_string(list_transform(range(1, length(word) + 1),
        |      i -> CASE WHEN i = 1 THEN word[i] ELSE '##' || word[i] END), ' ') || ' ' AS s, n
        |  FROM wc),
        |sc0 AS (
        |  SELECT sym, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(string_split(trim(s), ' ')) AS sym, n FROM v0)
        |  GROUP BY sym),
        |pc0 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v0) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m0 AS (
        |  SELECT p.a, p.b, p.a || regexp_replace(p.b, '^##', '') AS fused,
        |    p.cnt AS cnt_ab, sa.cnt AS cnt_a, sb.cnt AS cnt_b
        |  FROM pc0 p JOIN sc0 sa ON sa.sym = p.a JOIN sc0 sb ON sb.sym = p.b
        |  ORDER BY CAST(p.cnt AS DOUBLE) / (CAST(sa.cnt AS DOUBLE) * CAST(sb.cnt AS DOUBLE)) DESC, p.a, p.b
        |  LIMIT 1),
        |v1 AS (
        |  SELECT replace(replace(s,
        |      ' ' || (SELECT a FROM m0) || ' ' || (SELECT b FROM m0) || ' ',
        |      ' ' || (SELECT fused FROM m0) || ' '),
        |      ' ' || (SELECT a FROM m0) || ' ' || (SELECT b FROM m0) || ' ',
        |      ' ' || (SELECT fused FROM m0) || ' ') AS s, n
        |  FROM v0),
        |sc1 AS (
        |  SELECT sym, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(string_split(trim(s), ' ')) AS sym, n FROM v1)
        |  GROUP BY sym),
        |pc1 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v1) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m1 AS (
        |  SELECT p.a, p.b, p.a || regexp_replace(p.b, '^##', '') AS fused,
        |    p.cnt AS cnt_ab, sa.cnt AS cnt_a, sb.cnt AS cnt_b
        |  FROM pc1 p JOIN sc1 sa ON sa.sym = p.a JOIN sc1 sb ON sb.sym = p.b
        |  ORDER BY CAST(p.cnt AS DOUBLE) / (CAST(sa.cnt AS DOUBLE) * CAST(sb.cnt AS DOUBLE)) DESC, p.a, p.b
        |  LIMIT 1),
        |v2 AS (
        |  SELECT replace(replace(s,
        |      ' ' || (SELECT a FROM m1) || ' ' || (SELECT b FROM m1) || ' ',
        |      ' ' || (SELECT fused FROM m1) || ' '),
        |      ' ' || (SELECT a FROM m1) || ' ' || (SELECT b FROM m1) || ' ',
        |      ' ' || (SELECT fused FROM m1) || ' ') AS s, n
        |  FROM v1),
        |sc2 AS (
        |  SELECT sym, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(string_split(trim(s), ' ')) AS sym, n FROM v2)
        |  GROUP BY sym),
        |pc2 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v2) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m2 AS (
        |  SELECT p.a, p.b, p.a || regexp_replace(p.b, '^##', '') AS fused,
        |    p.cnt AS cnt_ab, sa.cnt AS cnt_a, sb.cnt AS cnt_b
        |  FROM pc2 p JOIN sc2 sa ON sa.sym = p.a JOIN sc2 sb ON sb.sym = p.b
        |  ORDER BY CAST(p.cnt AS DOUBLE) / (CAST(sa.cnt AS DOUBLE) * CAST(sb.cnt AS DOUBLE)) DESC, p.a, p.b
        |  LIMIT 1)""".stripMargin

  /** The no-split next-fit pack as CTEs (t0/w/t1/t2/st): whitespace
    * token counts, the engine's bucket width rule (max(doc_id) div 16
    * + 1), then the sequential next-fit recursion one row per bucket
    * per round — `st` carries (bucket, rn, doc_id, n_tokens, seq,
    * fill). Shared by pack_no_split and pack_efficiency. No leading
    * WITH RECURSIVE.
    */
  private val PACK_NO_SPLIT_CTES =
    """t0 AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |w AS (SELECT greatest(max(doc_id) // 16 + 1, 1) AS width FROM t0),
        |t1 AS (SELECT doc_id, n_tokens,
        |         doc_id // (SELECT width FROM w) AS bucket FROM t0),
        |t2 AS (SELECT doc_id, n_tokens, bucket,
        |         row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
        |       FROM t1),
        |st(bucket, rn, doc_id, n_tokens, seq, fill) AS (
        |  SELECT bucket, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
        |  FROM t2 WHERE rn = 1
        |  UNION ALL
        |  SELECT t.bucket, t.rn, t.doc_id, t.n_tokens,
        |    CASE WHEN s.fill + t.n_tokens > 2048 THEN s.seq + 1 ELSE s.seq END,
        |    CASE WHEN s.fill + t.n_tokens > 2048 THEN t.n_tokens
        |         ELSE s.fill + t.n_tokens END
        |  FROM st s JOIN t2 t ON t.bucket = s.bucket AND t.rn = s.rn + 1)""".stripMargin

  /** The fixture WordPiece vocabulary as a `vocab(piece)` CTE —
    * letters/digits minus q/x/z as start + `##` continuation pieces
    * (generated via chr so the list can't drift from a typo'd VALUES)
    * plus the multi-char fixture pieces; must mirror
    * `WordPiece.fixtureVocab` exactly. No leading WITH RECURSIVE.
    */
  private val WP_FIXTURE_VOCAB =
    """vocab(piece) AS (
        |  SELECT chr(CAST(x AS INT)) FROM range(97, 123) t1(x)
        |    WHERE chr(CAST(x AS INT)) NOT IN ('q', 'x', 'z')
        |  UNION ALL SELECT chr(CAST(x AS INT)) FROM range(48, 58) t2(x)
        |  UNION ALL SELECT '##' || chr(CAST(x AS INT)) FROM range(97, 123) t3(x)
        |    WHERE chr(CAST(x AS INT)) NOT IN ('q', 'x', 'z')
        |  UNION ALL SELECT '##' || chr(CAST(x AS INT)) FROM range(48, 58) t4(x)
        |  UNION ALL SELECT * FROM (VALUES ('the'),('ta'),('tab'),('##le'),('##er'),('##st'),
        |    ('##ing'),('##ed'),('##es'),('##al'),('##ow'),('##an'),('##on')) vm(vp))""".stripMargin

  /** Shared WordPiece greedy-encode chain (base/dw/st/wp/docw/agg):
    * recursive longest-match of every distinct corpus word against a
    * `vocab(piece)` CTE the caller supplies. No leading WITH.
    */
  private val WP_GREEDY_CTES =
    """base AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> length(w) > 0) AS words
        |  FROM documents),
        |dw AS (SELECT DISTINCT unnest(words) AS word FROM base),
        |st(word, pos, toks, dead) AS (
        |  SELECT word, 1, CAST([] AS VARCHAR[]), false FROM dw
        |  UNION ALL
        |  SELECT s.word,
        |    CASE WHEN m.mlen IS NULL THEN len(s.word) + 1 ELSE s.pos + m.mlen END,
        |    CASE WHEN m.mlen IS NULL THEN s.toks ELSE list_append(s.toks, m.piece) END,
        |    m.mlen IS NULL
        |  FROM st s LEFT JOIN LATERAL (
        |    SELECT v.piece,
        |      len(CASE WHEN s.pos > 1 THEN substr(v.piece, 3) ELSE v.piece END) AS mlen
        |    FROM vocab v
        |    WHERE (s.pos = 1 AND v.piece NOT LIKE '##%'
        |           AND substr(s.word, s.pos, len(v.piece)) = v.piece)
        |       OR (s.pos > 1 AND v.piece LIKE '##%'
        |           AND len(v.piece) > 2
        |           AND substr(s.word, s.pos, len(v.piece) - 2) = substr(v.piece, 3))
        |    ORDER BY mlen DESC, v.piece LIMIT 1) m ON true
        |  WHERE s.pos <= len(s.word) AND NOT s.dead),
        |wp AS (
        |  SELECT word, CASE WHEN dead THEN ['[UNK]'] ELSE toks END AS wtoks
        |  FROM st WHERE dead OR pos = len(word) + 1),
        |docw AS (
        |  SELECT doc_id, unnest(words) AS word, generate_subscripts(words, 1) AS ord
        |  FROM base),
        |agg AS (
        |  SELECT d.doc_id, flatten(list(w.wtoks ORDER BY d.ord)) AS flat
        |  FROM docw d JOIN wp w ON w.word = d.word
        |  GROUP BY d.doc_id)""".stripMargin

  val sql: Map[String, String] = Map(
    "dedup_simhash" -> SIMHASH_PAIRS,
    "dedup_cosine_lsh" -> COSINE_LSH_PAIRS,
    "sim_knn_graph" -> KNN_GRAPH,

    // DSIR weights: every corpus statistic an exact integer; lp values
    // summed in position order; normalizer folded in as one fixed
    // expression; rounded once.
    "corpus_dsir_weights" ->
      s"""WITH $DSIR_CTES
         |SELECT doc_id, n_feats, round(logw_raw, 4) AS logw FROM dsw""".stripMargin,

    // DSIR Gumbel top-k: rank on the UNROUNDED key (logw + gumbel),
    // noise from the same md5-uniform u both engines compute.
    "corpus_dsir_sample" ->
      s"""WITH $DSIR_CTES,
         |dsg AS (
         |  SELECT doc_id, logw_raw,
         |    logw_raw - ln(-ln(
         |      (CAST(CAST(concat('0x', substr(md5(concat('dsir:',
         |         CAST(doc_id AS VARCHAR))), 1, 8)) AS UBIGINT) AS DOUBLE)
         |        + 0.5) / 4294967296.0)) AS skey_raw
         |  FROM dsw),
         |dsr AS (
         |  SELECT doc_id, logw_raw, skey_raw,
         |    row_number() OVER (ORDER BY skey_raw DESC, doc_id) AS rank
         |  FROM dsg)
         |SELECT doc_id, rank, round(logw_raw, 4) AS logw,
         |  round(skey_raw, 4) AS skey
         |FROM dsr WHERE rank <= 100""".stripMargin,

    // Per-source cap: same md5-hex ordering as the Spark window; the
    // doc_id tiebreaker is unreachable (md5 collisions) but mirrored.
    "corpus_cap_source" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY substr(md5(concat('cap:', CAST(doc_id AS VARCHAR))), 1, 16),
        |        doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10""".stripMargin,

    // Bigram-LM cross-entropy: identical count joins; the per-doc mean
    // sums lp in POSITION order on both engines (ordered list fold) and
    // rounds once at the end, so libm last-ulp differences in ln()
    // cannot reorder-accumulate into the hash.
    "text_lm_score" ->
      s"""WITH ${lmCtes("documents")}
         |SELECT doc_id, n_bigrams, xent FROM lmscore""".stripMargin,

    // Zipf fit: top-100 frequencies, regression sums as 0.0-seeded
    // ordered folds in rank order (list_sum ≡ Spark's aggregate fold),
    // slope/intercept the identical fixed trees.
    "corpus_zipf" ->
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
        |  FROM documents),
        |c AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |top AS (SELECT w, c FROM c ORDER BY c DESC, w LIMIT 100),
        |rk AS (SELECT w, c,
        |  row_number() OVER (ORDER BY c DESC, w) AS rank FROM top),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  list_sum(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(round(ln(CAST(rank AS DOUBLE)), 9) ORDER BY rank))) AS sx,
        |  list_sum(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(round(ln(CAST(c AS DOUBLE)), 9) ORDER BY rank))) AS sy,
        |  list_sum(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(round(ln(CAST(rank AS DOUBLE)), 9) * round(ln(CAST(c AS DOUBLE)), 9)
        |      ORDER BY rank))) AS sxy,
        |  list_sum(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(round(ln(CAST(rank AS DOUBLE)), 9) * round(ln(CAST(rank AS DOUBLE)), 9)
        |      ORDER BY rank))) AS sxx
        |  FROM rk),
        |s2 AS (SELECT n, sx, sy,
        |  (CAST(n AS DOUBLE) * sxy - sx * sy) /
        |    (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope
        |  FROM s)
        |SELECT n AS n_top, slope,
        |  (sy - slope * sx) / CAST(n AS DOUBLE) AS intercept
        |FROM s2""".stripMargin,

    // Interpolated Kneser–Ney (D = 0.75): model statistics are exact
    // integer aggregates of the bigram TABLE; the per-bigram
    // probability is the identical fixed FP tree as
    // TextAnalysis.knCrossEntropy; per-doc sum ordered by position.
    "text_kn_score" ->
      s"""WITH lmtok AS (
         |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
         |  FROM documents),
         |bgl AS (
         |  SELECT doc_id,
         |    list_transform(range(1, len(toks)),
         |      i -> {'pos': i - 1, 'w1': toks[i], 'w2': toks[i + 1]}) AS bl
         |  FROM lmtok WHERE len(toks) >= 2),
         |bg AS (SELECT doc_id, unnest(bl) AS u FROM bgl),
         |bg2 AS (SELECT doc_id, u.pos AS pos, u.w1 AS w1, u.w2 AS w2 FROM bg),
         |bi AS (SELECT w1, w2, count(*) AS c2 FROM bg2 GROUP BY w1, w2),
         |fw AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS ctx,
         |  count(*) AS n1fw FROM bi GROUP BY w1),
         |bw AS (SELECT w2, count(*) AS n1bw FROM bi GROUP BY w2),
         |bt AS (SELECT count(*) AS bb FROM bi),
         |sc AS (
         |  SELECT bi.w1, bi.w2,
         |    round(-ln((CAST(c2 AS DOUBLE) - 0.75) / CAST(ctx AS DOUBLE)
         |      + (0.75 * CAST(n1fw AS DOUBLE) / CAST(ctx AS DOUBLE))
         |        * (CAST(n1bw AS DOUBLE) / CAST(bb AS DOUBLE))), 9) AS lp
         |  FROM bi JOIN fw ON fw.w1 = bi.w1 JOIN bw ON bw.w2 = bi.w2
         |  CROSS JOIN bt)
         |SELECT bg2.doc_id, count(*) AS n_bigrams,
         |  round(list_sum(list(lp ORDER BY pos)) / count(*), 4) AS kn_xent
         |FROM bg2 JOIN sc ON sc.w1 = bg2.w1 AND sc.w2 = bg2.w2
         |GROUP BY bg2.doc_id""".stripMargin,

    // Interpolated Kneser–Ney TRIGRAM (D = 0.75 at every level):
    // token counts at the top level, continuation (type) counts at
    // both lower levels — seven exact integer aggregates of the
    // trigram/bigram TYPE tables; the per-trigram probability is the
    // identical fixed FP tree as TextAnalysis.kn3CrossEntropy,
    // operation for operation; per-doc sum ordered by position.
    "text_kn3_score" ->
      s"""WITH lmtok AS (
         |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
         |  FROM documents),
         |tgl AS (
         |  SELECT doc_id,
         |    list_transform(range(1, len(toks) - 1),
         |      i -> {'pos': i - 1, 'w1': toks[i], 'w2': toks[i + 1],
         |            'w3': toks[i + 2]}) AS tl
         |  FROM lmtok WHERE len(toks) >= 3),
         |tgu AS (SELECT doc_id, unnest(tl) AS u FROM tgl),
         |tg AS (SELECT doc_id, u.pos AS pos, u.w1 AS w1, u.w2 AS w2,
         |  u.w3 AS w3 FROM tgu),
         |bgl AS (
         |  SELECT list_transform(range(1, len(toks)),
         |    i -> {'w1': toks[i], 'w2': toks[i + 1]}) AS bl
         |  FROM lmtok WHERE len(toks) >= 2),
         |bgu AS (SELECT unnest(bl) AS u FROM bgl),
         |bi AS (SELECT DISTINCT u.w1 AS w1, u.w2 AS w2 FROM bgu),
         |tri AS (SELECT w1, w2, w3, count(*) AS c3 FROM tg GROUP BY 1, 2, 3),
         |ctx12 AS (SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS ctx,
         |  count(*) AS n1fw12 FROM tri GROUP BY 1, 2),
         |mid23 AS (SELECT w2, w3, count(*) AS n1bw23 FROM tri GROUP BY 1, 2),
         |mid2 AS (SELECT w2, count(*) AS nmid FROM tri GROUP BY 1),
         |fw2 AS (SELECT w1 AS w2, count(*) AS n1fw2 FROM bi GROUP BY 1),
         |bw3 AS (SELECT w2 AS w3, count(*) AS n1bw3 FROM bi GROUP BY 1),
         |bt AS (SELECT count(*) AS bb FROM bi),
         |sc AS (
         |  SELECT tri.w1, tri.w2, tri.w3,
         |    round(-ln(
         |      (CAST(c3 AS DOUBLE) - 0.75) / CAST(ctx AS DOUBLE)
         |      + (0.75 * CAST(n1fw12 AS DOUBLE) / CAST(ctx AS DOUBLE))
         |        * ((CAST(n1bw23 AS DOUBLE) - 0.75) / CAST(nmid AS DOUBLE)
         |           + (0.75 * CAST(n1fw2 AS DOUBLE) / CAST(nmid AS DOUBLE))
         |             * (CAST(n1bw3 AS DOUBLE) / CAST(bb AS DOUBLE)))), 9) AS lp
         |  FROM tri
         |  JOIN ctx12 ON ctx12.w1 = tri.w1 AND ctx12.w2 = tri.w2
         |  JOIN mid23 ON mid23.w2 = tri.w2 AND mid23.w3 = tri.w3
         |  JOIN mid2 ON mid2.w2 = tri.w2
         |  JOIN fw2 ON fw2.w2 = tri.w2
         |  JOIN bw3 ON bw3.w3 = tri.w3
         |  CROSS JOIN bt)
         |SELECT tg.doc_id, count(*) AS n_trigrams,
         |  round(list_sum(list(lp ORDER BY pos)) / count(*), 4) AS kn3_xent
         |FROM tg JOIN sc ON sc.w1 = tg.w1 AND sc.w2 = tg.w2 AND sc.w3 = tg.w3
         |GROUP BY tg.doc_id""".stripMargin,

    // Interpolated Kneser–Ney 5-GRAM (D = 0.75 at every level, the
    // KenLM production order): token counts at the top, continuation
    // (type) counts at levels 4/3/2/1 — numerator+denominator from the
    // corpus (k+1)-gram TYPE table, backoff-weight numerator from the
    // k-gram type table (TextAnalysis.knNCrossEntropy's convention).
    // The per-5-gram probability is the identical fixed FP tree,
    // innermost level first, operation for operation; lp quantized to
    // 9 decimals; per-doc sum ordered by position.
    "text_kn5_score" ->
      s"""WITH lmtok AS (
         |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
         |  FROM documents),
         |g5l AS (
         |  SELECT doc_id,
         |    list_transform(range(1, len(toks) - 3),
         |      i -> {'pos': i - 1, 'w1': toks[i], 'w2': toks[i + 1],
         |            'w3': toks[i + 2], 'w4': toks[i + 3],
         |            'w5': toks[i + 4]}) AS gl
         |  FROM lmtok WHERE len(toks) >= 5),
         |g5u AS (SELECT doc_id, unnest(gl) AS u FROM g5l),
         |g5 AS (SELECT doc_id, u.pos AS pos, u.w1 AS w1, u.w2 AS w2,
         |  u.w3 AS w3, u.w4 AS w4, u.w5 AS w5 FROM g5u),
         |t5 AS (SELECT w1, w2, w3, w4, w5, count(*) AS cn
         |  FROM g5 GROUP BY 1, 2, 3, 4, 5),
         |ctx AS (SELECT w1, w2, w3, w4, CAST(sum(cn) AS BIGINT) AS ctx,
         |  count(*) AS n1fw_top FROM t5 GROUP BY 1, 2, 3, 4),
         |b4l AS (
         |  SELECT list_transform(range(1, len(toks) - 2),
         |    i -> {'v1': toks[i], 'v2': toks[i + 1], 'v3': toks[i + 2],
         |          'v4': toks[i + 3]}) AS bl
         |  FROM lmtok WHERE len(toks) >= 4),
         |b4u AS (SELECT unnest(bl) AS u FROM b4l),
         |b4 AS (SELECT DISTINCT u.v1 AS v1, u.v2 AS v2, u.v3 AS v3,
         |  u.v4 AS v4 FROM b4u),
         |b3l AS (
         |  SELECT list_transform(range(1, len(toks) - 1),
         |    i -> {'v1': toks[i], 'v2': toks[i + 1], 'v3': toks[i + 2]}) AS bl
         |  FROM lmtok WHERE len(toks) >= 3),
         |b3u AS (SELECT unnest(bl) AS u FROM b3l),
         |b3 AS (SELECT DISTINCT u.v1 AS v1, u.v2 AS v2, u.v3 AS v3 FROM b3u),
         |b2l AS (
         |  SELECT list_transform(range(1, len(toks)),
         |    i -> {'v1': toks[i], 'v2': toks[i + 1]}) AS bl
         |  FROM lmtok WHERE len(toks) >= 2),
         |b2u AS (SELECT unnest(bl) AS u FROM b2l),
         |b2 AS (SELECT DISTINCT u.v1 AS v1, u.v2 AS v2 FROM b2u),
         |cc4 AS (SELECT w2 AS w2, w3 AS w3, w4 AS w4, w5 AS w5,
         |  count(*) AS cc4 FROM t5 GROUP BY 1, 2, 3, 4),
         |den4 AS (SELECT w2 AS w2, w3 AS w3, w4 AS w4, count(*) AS den4
         |  FROM t5 GROUP BY 1, 2, 3),
         |lam4 AS (SELECT v1 AS w2, v2 AS w3, v3 AS w4, count(*) AS lam4
         |  FROM b4 GROUP BY 1, 2, 3),
         |cc3 AS (SELECT v2 AS w3, v3 AS w4, v4 AS w5, count(*) AS cc3
         |  FROM b4 GROUP BY 1, 2, 3),
         |den3 AS (SELECT v2 AS w3, v3 AS w4, count(*) AS den3
         |  FROM b4 GROUP BY 1, 2),
         |lam3 AS (SELECT v1 AS w3, v2 AS w4, count(*) AS lam3
         |  FROM b3 GROUP BY 1, 2),
         |cc2 AS (SELECT v2 AS w4, v3 AS w5, count(*) AS cc2
         |  FROM b3 GROUP BY 1, 2),
         |den2 AS (SELECT v2 AS w4, count(*) AS den2 FROM b3 GROUP BY 1),
         |lam2 AS (SELECT v1 AS w4, count(*) AS lam2 FROM b2 GROUP BY 1),
         |bw AS (SELECT v2 AS w5, count(*) AS n1bw FROM b2 GROUP BY 1),
         |bt AS (SELECT count(*) AS bb FROM b2),
         |sc AS (
         |  SELECT t5.w1, t5.w2, t5.w3, t5.w4, t5.w5,
         |    round(-ln(
         |      (CAST(cn AS DOUBLE) - 0.75) / CAST(ctx AS DOUBLE)
         |      + (0.75 * CAST(n1fw_top AS DOUBLE) / CAST(ctx AS DOUBLE))
         |        * ((CAST(cc4 AS DOUBLE) - 0.75) / CAST(den4 AS DOUBLE)
         |          + (0.75 * CAST(lam4 AS DOUBLE) / CAST(den4 AS DOUBLE))
         |            * ((CAST(cc3 AS DOUBLE) - 0.75) / CAST(den3 AS DOUBLE)
         |              + (0.75 * CAST(lam3 AS DOUBLE) / CAST(den3 AS DOUBLE))
         |                * ((CAST(cc2 AS DOUBLE) - 0.75) / CAST(den2 AS DOUBLE)
         |                  + (0.75 * CAST(lam2 AS DOUBLE) / CAST(den2 AS DOUBLE))
         |                    * (CAST(n1bw AS DOUBLE) / CAST(bb AS DOUBLE)))))),
         |      9) AS lp
         |  FROM t5
         |  JOIN ctx ON ctx.w1 = t5.w1 AND ctx.w2 = t5.w2
         |    AND ctx.w3 = t5.w3 AND ctx.w4 = t5.w4
         |  JOIN cc4 ON cc4.w2 = t5.w2 AND cc4.w3 = t5.w3
         |    AND cc4.w4 = t5.w4 AND cc4.w5 = t5.w5
         |  JOIN den4 ON den4.w2 = t5.w2 AND den4.w3 = t5.w3
         |    AND den4.w4 = t5.w4
         |  JOIN lam4 ON lam4.w2 = t5.w2 AND lam4.w3 = t5.w3
         |    AND lam4.w4 = t5.w4
         |  JOIN cc3 ON cc3.w3 = t5.w3 AND cc3.w4 = t5.w4 AND cc3.w5 = t5.w5
         |  JOIN den3 ON den3.w3 = t5.w3 AND den3.w4 = t5.w4
         |  JOIN lam3 ON lam3.w3 = t5.w3 AND lam3.w4 = t5.w4
         |  JOIN cc2 ON cc2.w4 = t5.w4 AND cc2.w5 = t5.w5
         |  JOIN den2 ON den2.w4 = t5.w4
         |  JOIN lam2 ON lam2.w4 = t5.w4
         |  JOIN bw ON bw.w5 = t5.w5
         |  CROSS JOIN bt)
         |SELECT g5.doc_id, count(*) AS n_5grams,
         |  round(list_sum(list(lp ORDER BY pos)) / count(*), 4) AS kn5_xent
         |FROM g5 JOIN sc ON sc.w1 = g5.w1 AND sc.w2 = g5.w2
         |  AND sc.w3 = g5.w3 AND sc.w4 = g5.w4 AND sc.w5 = g5.w5
         |GROUP BY g5.doc_id""".stripMargin,

    // Stratified sample: per-lang rank over the salted hash order.
    "sample_stratified" ->
      """WITH r AS (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 16),
        |               doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, source FROM r WHERE rn <= 50""".stripMargin,

    // Token-budget systematic sampling: integer positions on the
    // cumulative token axis (window sum cast to BIGINT; `//` is exact
    // integer division, mirroring Spark's `div`).
    "sample_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_end
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  (cum_end // 500) - ((cum_end - n_tokens) // 500) AS n_hits
        |FROM c
        |WHERE (cum_end // 500) - ((cum_end - n_tokens) // 500) >= 1""".stripMargin,

    // Novelty: same string-shingle derivation as the Jaccard oracles;
    // df over distinct per-doc grams, unique = df 1.
    "text_novelty" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(toks) - 3, 0) + 2),
        |      s -> concat_ws(' ', toks[s], toks[s+1], toks[s+2]))) AS shingles
        |  FROM tok),
        |ex AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
        |df AS (SELECT g, count(*) AS c FROM ex GROUP BY g)
        |SELECT ex.doc_id, count(*) AS n_grams,
        |  count(CASE WHEN df.c = 1 THEN 1 END) AS n_unique,
        |  round(CAST(count(CASE WHEN df.c = 1 THEN 1 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 4) AS novelty
        |FROM ex JOIN df ON df.g = ex.g
        |GROUP BY ex.doc_id""".stripMargin,

    // TF-IDF keywords: integer tf/df/N feed one division + one ln +
    // one multiply (the PMI FP-parity pattern); rank on the UNROUNDED
    // score with a term tiebreak; round once for display.
    // Bayardo APSS cosine: the oracle is the NAIVE all-pairs form —
    // a prefix-filter completeness bug on the engine side hash-fails
    // here. Exact-integer threshold 100·dot² ≥ 81·‖a‖²·‖b‖² (τ=9/10),
    // cosine one division by one sqrt.
    "dedup_apss_cosine" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |nrm AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS nrm
        |  FROM tf GROUP BY 1),
        |dt AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
        |  FROM tf a JOIN tf b ON a.term = b.term AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id, dot, na.nrm AS a_nrm, nb.nrm AS b_nrm,
        |  CAST(dot AS DOUBLE) / sqrt(CAST(na.nrm * nb.nrm AS DOUBLE)) AS cosine
        |FROM dt
        |JOIN nrm na ON na.doc_id = a_id
        |JOIN nrm nb ON nb.doc_id = b_id
        |WHERE dot * dot * 100 >= 81 * na.nrm * nb.nrm""".stripMargin,

    "text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
        |    CAST(tf.tf AS DOUBLE) *
        |      (ln((CAST(n.n_docs AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
        |          (CAST(dfc.df AS DOUBLE) + CAST(1.0 AS DOUBLE))) + CAST(1.0 AS DOUBLE))
        |      AS score
        |  FROM tf JOIN dfc USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        |  FROM scored)
        |SELECT doc_id, rn AS rnk, term, tf, df, round(score, 4) AS tfidf
        |FROM r WHERE rn <= 5""".stripMargin,

    // PMI collocations: exact integer counts, ONE ratio inside ln
    // (single division), unrounded (pmi, w1, w2) total order for the
    // LIMIT — bit-exact against the engine.
    // RAKE keyphrases: candidates are chr(1)-delimited stopword-free
    // runs (the Spark side joins tokens on ' ' with chr(1) markers and
    // re-splits — mirrored verbatim); wscore is one double division of
    // exact integer deg/freq; the phrase score replays Spark's ordered
    // left fold (init 0.0 via list_prepend) in phrase position order.
    "text_rake" ->
      """WITH tok AS (SELECT lower(text) AS lt FROM documents),
        |run AS (
        |  SELECT unnest(string_split(array_to_string(list_transform(
        |    string_split_regex(lt, '\s+'),
        |    t -> CASE WHEN t IN ('the','of','and','to','in','is','that','for')
        |      THEN chr(1) ELSE t END), ' '), chr(1))) AS praw
        |  FROM tok),
        |ph AS (SELECT trim(praw) AS phrase FROM run WHERE trim(praw) <> ''),
        |phr AS (SELECT phrase, len(string_split(phrase, ' ')) AS plen FROM ph
        |        WHERE len(string_split(phrase, ' ')) <= 4),
        |w AS (SELECT unnest(string_split(phrase, ' ')) AS w, plen FROM phr),
        |sc AS (SELECT w,
        |    CAST(sum(plen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS wscore
        |  FROM w GROUP BY w),
        |dp AS (SELECT phrase, count(*) AS n_occ FROM phr GROUP BY phrase),
        |pw AS (
        |  SELECT phrase, n_occ,
        |    unnest(list_transform(range(1, len(string_split(phrase, ' ')) + 1),
        |      p -> {'pos': p - 1, 'w': string_split(phrase, ' ')[p]})) AS u
        |  FROM dp),
        |pw2 AS (SELECT phrase, n_occ, u.pos AS pos, u.w AS w FROM pw),
        |ps AS (
        |  SELECT phrase, n_occ,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(sc.wscore ORDER BY pw2.pos)), (a, b) -> a + b) AS score
        |  FROM pw2 JOIN sc USING (w) GROUP BY phrase, n_occ)
        |SELECT phrase, n_occ, score FROM ps
        |ORDER BY score DESC, phrase LIMIT 50""".stripMargin,

    "text_collocations" ->
      """WITH tok AS (
        |  SELECT string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |bg AS (
        |  SELECT b.w1 AS w1, b.w2 AS w2 FROM (
        |    SELECT unnest(list_transform(range(1, len(toks)),
        |      i -> {'w1': toks[i], 'w2': toks[i+1]})) AS b
        |    FROM tok WHERE len(toks) >= 2)),
        |uni AS (
        |  SELECT t AS w, count(*) AS c
        |  FROM (SELECT unnest(toks) AS t FROM tok) GROUP BY t),
        |pairs AS (
        |  SELECT w1, w2, count(*) AS n_pair FROM bg GROUP BY w1, w2
        |  HAVING count(*) >= 5),
        |tot AS (
        |  SELECT (SELECT sum(c) FROM uni) AS n_tokens,
        |         (SELECT count(*) FROM bg) AS n_bigrams),
        |scored AS (
        |  SELECT p.w1, p.w2, p.n_pair,
        |    ln(CAST(p.n_pair AS DOUBLE) * CAST(t.n_tokens AS DOUBLE)
        |       * CAST(t.n_tokens AS DOUBLE)
        |       / (CAST(t.n_bigrams AS DOUBLE) * CAST(u1.c AS DOUBLE)
        |          * CAST(u2.c AS DOUBLE))) AS pmi_raw
        |  FROM pairs p
        |  JOIN uni u1 ON u1.w = p.w1
        |  JOIN uni u2 ON u2.w = p.w2
        |  CROSS JOIN tot t)
        |SELECT w1, w2, n_pair, round(pmi_raw, 4) AS pmi
        |FROM scored ORDER BY pmi_raw DESC, w1, w2 LIMIT 20""".stripMargin,

    // Quality banding: fixed xent cutoffs (DOUBLE-cast literals), then
    // the salted ("qb:") hex-threshold keep rule per band — mirrors
    // TextAnalysis.rateSampleKeep exactly (0.5 → 80000000, 0.1 →
    // 19999999; head keeps all).
    "corpus_quality_buckets" ->
      s"""WITH ${lmCtes("documents")},
         |b AS (
         |  SELECT doc_id, xent,
         |    CASE WHEN xent < CAST(3.39 AS DOUBLE) THEN 'head'
         |         WHEN xent < CAST(3.42 AS DOUBLE) THEN 'middle'
         |         ELSE 'tail' END AS bucket
         |  FROM lmscore)
         |SELECT doc_id, xent, bucket,
         |  CASE WHEN bucket = 'head' THEN TRUE
         |       WHEN bucket = 'middle'
         |         THEN substr(md5('qb:' || CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
         |       ELSE substr(md5('qb:' || CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
         |  END AS kept
         |FROM b""".stripMargin,

    // Competence-based curriculum: quartile cutoffs over the composite
    // quality score (quantile_cont ≡ Spark's interpolated percentile —
    // the daily_ops_report p95 convention), stage = 4 minus cutoffs
    // cleared counting c1..c3 with the engine's `cut <= quality` rule,
    // position = salted-md5 row_number inside each stage.
    "corpus_curriculum" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    round((least(CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) / 64.0, 1.0)
        |         + least(CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |             t -> t IN ('the','of','and','to','in','is','that','for'))) AS DOUBLE) * 8
        |             / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE), 1.0)) / 2, 4) AS quality
        |  FROM documents),
        |c AS (
        |  SELECT quantile_cont(quality, 0.25) AS c1,
        |         quantile_cont(quality, 0.50) AS c2,
        |         quantile_cont(quality, 0.75) AS c3
        |  FROM q),
        |st AS (
        |  SELECT q.doc_id, q.quality,
        |    CAST(4 - (CASE WHEN c.c1 <= q.quality THEN 1 ELSE 0 END)
        |           - (CASE WHEN c.c2 <= q.quality THEN 1 ELSE 0 END)
        |           - (CASE WHEN c.c3 <= q.quality THEN 1 ELSE 0 END)
        |      AS BIGINT) AS stage
        |  FROM q CROSS JOIN c)
        |SELECT doc_id, stage,
        |  CAST(row_number() OVER (PARTITION BY stage
        |    ORDER BY md5('cur:' || CAST(doc_id AS VARCHAR)), doc_id)
        |    AS BIGINT) AS pos,
        |  quality
        |FROM st""".stripMargin,

    // BM25 top-20: every corpus statistic is an exact integer; the
    // per-doc double arithmetic is the SAME expression tree the engine
    // builds (term contributions added in declared order, literals
    // cast to DOUBLE so DuckDB's DECIMAL literal folding can't drift),
    // rounded once before the (score desc, doc_id) tiebreak.
    "text_bm25" ->
      s"""WITH tk AS (
         |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
         |  FROM documents),
         |tl AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM tk),
         |st AS (
         |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl,
         |    ${Seq("spark", "window", "shuffle").zipWithIndex.map { case (t, i) =>
                s"sum(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS df_$i"
              }.mkString(",\n    ")}
         |  FROM tl),
         |sc AS (
         |  SELECT doc_id, round(
         |    ${Seq("spark", "window", "shuffle").zipWithIndex.map { case (t, i) =>
                bm25Term(t, s"df_$i")
              }.mkString("\n    + ")}, 4) AS score
         |  FROM tl CROSS JOIN st)
         |SELECT doc_id, score FROM sc WHERE score > 0
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // Posting-list heads: exact df over distinct (doc, token) pairs;
    // the head is the 20 smallest doc_ids, string-joined on both
    // engines to keep the hashed column scalar.
    "text_postings" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(lower(text), '\s+')) AS token
        |    FROM documents)),
        |p AS (
        |  SELECT token, count(*) AS df,
        |    array_to_string(
        |      list_transform(list_sort(list(doc_id))[1:20],
        |        x -> CAST(x AS VARCHAR)), ',') AS postings
        |  FROM tok GROUP BY token)
        |SELECT token, CAST(df AS BIGINT) AS df, postings
        |FROM p WHERE df >= 300""".stripMargin,

    "corpus_stats" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT lang) AS n_langs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  round(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE), 2)
        |    AS avg_chars,
        |  CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT)
        |    AS total_tokens
        |FROM documents GROUP BY source""".stripMargin,

    // Round-4 flagship: cap → exact dedup → span removal → LM scoring
    // of the CLEANED text → length + relative-xent filter → split tag.
    // Each stage is the same CTE chain its standalone oracle uses,
    // re-rooted on the previous stage's output.
    "prepare_pretraining_full" ->
      s"""WITH capped AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |      row_number() OVER (PARTITION BY source
         |        ORDER BY substr(md5(concat('cap:', CAST(doc_id AS VARCHAR))), 1, 16),
         |          doc_id) AS rn
         |    FROM documents) WHERE rn <= 15),
         |winners AS (
         |  SELECT min(doc_id) AS doc_id FROM capped GROUP BY md5(text)),
         |deduped AS (
         |  SELECT c2.doc_id, c2.text FROM capped c2 JOIN winners USING (doc_id)),
         |${spanRemovalCtes("deduped")},
         |cleandocs AS (
         |  SELECT doc_id, clean_text AS text FROM removal),
         |${lmCtes("cleandocs")}
         |SELECT rm.doc_id,
         |  CAST(len(string_split_regex(rm.clean_text, '\\s+')) AS BIGINT) AS n_tokens,
         |  rm.n_removed_tokens,
         |  m.xent,
         |  CASE WHEN substr(md5(CAST(rm.doc_id AS VARCHAR)), 1, 2) < 'e6'
         |       THEN 'train' ELSE 'val' END AS split
         |FROM removal rm
         |JOIN lmscore m USING (doc_id)
         |CROSS JOIN (SELECT min(xent) AS fl FROM lmscore) f
         |WHERE len(string_split_regex(rm.clean_text, '\\s+')) >= 10
         |  AND m.xent <= f.fl + 0.3""".stripMargin,

    // Sliding-window chunking: same chunk-count formula, 1-based
    // inclusive list slices mirror Spark's (start, length) slices.
    "chunk_overlap" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |nn AS (SELECT doc_id, toks, len(toks) AS n FROM tk),
        |cc AS (SELECT doc_id, toks, n,
        |  CASE WHEN n <= 64 THEN 1
        |       ELSE CAST(ceil(CAST(n - 64 AS DOUBLE) / 48) AS INT) + 1 END AS nchunks
        |  FROM nn),
        |x AS (SELECT doc_id,
        |  unnest(list_transform(range(0, nchunks), i ->
        |    {'cn': i, 'ch': toks[i * 48 + 1 : least(i * 48 + 64, n)]})) AS u
        |  FROM cc)
        |SELECT doc_id, CAST(u.cn AS BIGINT) AS chunk_no,
        |  CAST(len(u.ch) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(u.ch, ' ') AS chunk_text
        |FROM x""".stripMargin,

    "dedup_hot_spans" ->
      s"""WITH ${hotSpanCtes("documents")}
         |SELECT doc_id, span_start, span_end, n_hot_grams FROM spans""".stripMargin,

    // Character-level repeated-substring spans: per-CHARACTER-position
    // 20-char grams of the RAW text (no lowercasing, no tokenization;
    // DuckDB substr/length count code points, matching the kernel),
    // corpus-wide counts, hot positions (>= 2), gaps-and-islands merge
    // (gap > 20 starts a new island) — the hotSpanCtes chain at char
    // granularity. Sub-20-char docs contribute one whole-text gram
    // (range upper bound greatest(len-20,0)+2 = 2 -> one position).
    "dedup_char_spans" ->
      s"""WITH ${charSpanCtes("documents")}
         |SELECT doc_id, span_start, span_end, n_hot_grams FROM spans""".stripMargin,

    // Content-defined chunking (LBFS): cut positions are gram starts
    // i > 0 whose rolling 8-char window hash has 6 low zero bits —
    // the hash is the SAME md5-first-8-bytes value the graft_chargrams
    // kernel emits (low 6 bits of the signed long == uh % 64 of the
    // unsigned assembly), so the boundary sets agree exactly. Chunks
    // are consecutive boundary pairs over [0, cuts..., len]; identity
    // is md5 of the chunk text. Duplicate table: hashes seen >= 2x.
    "dedup_cdc_chunks" ->
      s"""WITH $CDC_CHUNK_CTES
         |SELECT c.h AS chunk_hash, CAST(min(c.ln) AS BIGINT) AS chunk_len,
         |  count(*) AS n_copies, count(DISTINCT doc_id) AS n_docs
         |FROM ch GROUP BY 1 HAVING count(*) >= 2""".stripMargin,

    // Store-once savings over the same chunking: per-hash (len, copies)
    // first, then one corpus-level roll-up; the ratio divides once.
    "dedup_cdc_ratio" ->
      s"""WITH $CDC_CHUNK_CTES,
         |per AS (
         |  SELECT c.h AS h, min(c.ln) AS ln, count(*) AS n
         |  FROM ch GROUP BY 1)
         |SELECT CAST(sum(n) AS BIGINT) AS n_chunks,
         |  count(*) AS n_unique,
         |  CAST(sum(ln * n) AS BIGINT) AS chars_total,
         |  CAST(sum(ln) AS BIGINT) AS chars_unique,
         |  round(CAST(1 AS DOUBLE) - CAST(sum(ln) AS DOUBLE)
         |    / CAST(sum(ln * n) AS DOUBLE), 6) AS dedup_ratio
         |FROM per""".stripMargin,

    // Char-span removal: spans of one doc are strictly disjoint (islands
    // merge everything <= 20 apart), so the rewrite keeps the segment
    // before each span (cursor = previous span_end via lag, seeded 0)
    // plus the tail after the last span; substr clamps the sub-20-doc
    // whole-text span, and least(e, length) clamps the removed count.
    "dedup_char_removal" ->
      s"""WITH ${charSpanCtes("documents")},
         |sp AS (
         |  SELECT doc_id, span_start AS s, span_end AS e,
         |    coalesce(lag(span_end) OVER (PARTITION BY doc_id ORDER BY span_start), 0) AS prev_e
         |  FROM spans),
         |pieces AS (
         |  SELECT d.doc_id, CAST(sp.s AS BIGINT) AS ord,
         |    substr(d.text, CAST(sp.prev_e + 1 AS INT), CAST(sp.s - sp.prev_e AS INT)) AS piece
         |  FROM sp JOIN documents d USING (doc_id)
         |  UNION ALL
         |  SELECT d.doc_id, CAST(9223372036854775807 AS BIGINT) AS ord,
         |    substr(d.text, CAST(m.mx + 1 AS INT)) AS piece
         |  FROM (SELECT doc_id, max(span_end) AS mx FROM spans GROUP BY doc_id) m
         |  JOIN documents d USING (doc_id)),
         |agg AS (
         |  SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS clean_text
         |  FROM pieces GROUP BY doc_id),
         |rem AS (
         |  SELECT sp.doc_id,
         |    CAST(sum(least(sp.e, length(d.text)) - sp.s) AS BIGINT) AS n_removed
         |  FROM sp JOIN documents d USING (doc_id) GROUP BY sp.doc_id)
         |SELECT d.doc_id,
         |  COALESCE(a.clean_text, d.text) AS clean_text,
         |  CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed_chars
         |FROM documents d
         |LEFT JOIN agg a USING (doc_id)
         |LEFT JOIN rem r USING (doc_id)""".stripMargin,

    "dedup_span_removal" ->
      s"""WITH ${spanRemovalCtes("documents")}
         |SELECT doc_id, clean_text, n_removed_tokens FROM removal""".stripMargin,

    // CCNet keep-first: units are non-overlapping 10-token windows,
    // identity is md5(lower(unit)), global keep order (doc_id,
    // unit_idx); DuckDB list slices are 1-based INCLUSIVE (Spark's
    // slice(toks, i*10+1, 10) ≡ toks[i*10+1 : i*10+10], both clamp the
    // final short unit).
    "dedup_keep_first" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |u AS (
        |  SELECT doc_id,
        |    unnest(list_transform(
        |      range(0, CAST(ceil(len(toks) / CAST(10 AS DOUBLE)) AS BIGINT)),
        |      i -> {'ui': i,
        |            'uh': md5(lower(array_to_string(
        |                    toks[i * 10 + 1 : i * 10 + 10], ' ')))})) AS e
        |  FROM t),
        |u2 AS (SELECT doc_id, e.ui AS unit_idx, e.uh AS uh FROM u),
        |k AS (
        |  SELECT doc_id, unit_idx,
        |    row_number() OVER (PARTITION BY uh ORDER BY doc_id, unit_idx) AS rn
        |  FROM u2),
        |kidx AS (SELECT doc_id, unit_idx FROM k WHERE rn = 1)
        |SELECT t.doc_id,
        |  CAST(ceil(len(t.toks) / CAST(10 AS DOUBLE)) AS BIGINT) AS n_units,
        |  CAST(count(ki.unit_idx) AS BIGINT) AS n_kept,
        |  COALESCE(string_agg(
        |    array_to_string(t.toks[ki.unit_idx * 10 + 1 : ki.unit_idx * 10 + 10], ' '),
        |    ' ' ORDER BY ki.unit_idx), '') AS clean_text
        |FROM t LEFT JOIN kidx ki ON ki.doc_id = t.doc_id
        |GROUP BY t.doc_id, t.toks""".stripMargin,
    // C4 boilerplate strip: same unit construction as
    // dedup_keep_first; hot units (count >= 3) are removed from every
    // document instead of keeping a first owner.
    "text_boilerplate" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |u AS (
        |  SELECT doc_id,
        |    unnest(list_transform(
        |      range(0, CAST(ceil(len(toks) / CAST(10 AS DOUBLE)) AS BIGINT)),
        |      i -> {'ui': i,
        |            'uh': md5(lower(array_to_string(
        |                    toks[i * 10 + 1 : i * 10 + 10], ' ')))})) AS e
        |  FROM t),
        |u2 AS (SELECT doc_id, e.ui AS unit_idx, e.uh AS uh FROM u),
        |hot AS (SELECT uh FROM u2 GROUP BY uh HAVING count(*) >= 3),
        |kidx AS (SELECT doc_id, unit_idx FROM u2
        |  WHERE uh NOT IN (SELECT uh FROM hot))
        |SELECT t.doc_id,
        |  CAST(ceil(len(t.toks) / CAST(10 AS DOUBLE)) AS BIGINT) AS n_units,
        |  CAST(count(ki.unit_idx) AS BIGINT) AS n_kept,
        |  COALESCE(string_agg(
        |    array_to_string(t.toks[ki.unit_idx * 10 + 1 : ki.unit_idx * 10 + 10], ' '),
        |    ' ' ORDER BY ki.unit_idx), '') AS clean_text
        |FROM t LEFT JOIN kidx ki ON ki.doc_id = t.doc_id
        |GROUP BY t.doc_id, t.toks""".stripMargin,

    "s1_changelog_count" ->
      s"SELECT count(*) AS cnt FROM events WHERE $V",

    "s2_changelog_page" ->
      s"""SELECT log_id, rsbsa_no, "table" FROM ($LOG) ORDER BY log_id LIMIT 100 OFFSET 50""",

    "s3_changelog_scan" ->
      s"""SELECT log_id, rsbsa_no, "table" FROM ($LOG)""",

    "s4_keyed_extract" ->
      s"""SELECT * FROM orders WHERE o_custkey IN (SELECT DISTINCT user_id FROM events WHERE $V)""",

    "s5_bridge_extract" ->
      s"""SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey IN (SELECT DISTINCT user_id FROM events WHERE $V)""",

    "s6_two_hop" ->
      s"""SELECT * FROM lineitem WHERE l_orderkey IN (
         |  SELECT o_orderkey FROM orders WHERE o_custkey IN (
         |    SELECT DISTINCT user_id FROM events WHERE $V))""".stripMargin,

    // Cascade (S7/J5): the sparse batch names ONLY ownership rows
    // (click, value < 1); the cascade relabels them as parcel keys,
    // then the standard two-hop orders→lineitem extract runs.
    "s7_cascade_extract" ->
      s"""SELECT * FROM lineitem WHERE l_orderkey IN (
         |  SELECT o_orderkey FROM orders WHERE o_custkey IN (
         |    SELECT DISTINCT user_id FROM events
         |    WHERE user_id IS NOT NULL AND event_type = 'click' AND value < 1))""".stripMargin,

    "s8_point_lookup" ->
      "SELECT * FROM orders WHERE o_orderkey = 1 LIMIT 1",

    "j3_exists_updates" ->
      s"""SELECT * FROM customer
         |WHERE c_custkey IN (SELECT DISTINCT user_id FROM events WHERE $V)
         |  AND c_custkey IN (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0)""".stripMargin,

    "j3_exists_inserts" ->
      s"""SELECT * FROM customer
         |WHERE c_custkey IN (SELECT DISTINCT user_id FROM events WHERE $V)
         |  AND c_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0)""".stripMargin,

    "upsert_merge" ->
      s"""WITH keys AS (SELECT DISTINCT user_id FROM events WHERE $V),
         |incoming AS (
         |  SELECT c_custkey, upper(c_name) AS c_name, c_nationkey, c_acctbal,
         |         upper(c_mktsegment) AS c_mktsegment
         |  FROM customer WHERE c_custkey IN (SELECT user_id FROM keys))
         |SELECT * FROM customer
         |WHERE c_custkey NOT IN (SELECT c_custkey FROM incoming)
         |UNION ALL SELECT * FROM incoming""".stripMargin,

    "refresh_merge" ->
      s"""WITH keys AS (SELECT DISTINCT user_id FROM events
         |              WHERE event_type = 'purchase' AND user_id IS NOT NULL),
         |tord AS (SELECT o_orderkey FROM orders
         |         WHERE o_custkey IN (SELECT user_id FROM keys)),
         |incoming AS (
         |  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
         |         l_quantity * 2 AS l_quantity, l_extendedprice, l_discount,
         |         l_tax, l_returnflag, l_linestatus, l_shipdate
         |  FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM tord))
         |SELECT * FROM lineitem
         |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM tord)
         |UNION ALL SELECT * FROM incoming""".stripMargin,

    "f1_normalize_upper" ->
      """SELECT c_custkey, upper(c_name) AS c_name, c_nationkey, c_acctbal,
        |       upper(c_mktsegment) AS c_mktsegment FROM customer""".stripMargin,

    "a2_work_units" ->
      s"""SELECT DISTINCT event_type AS "table", user_id AS rsbsa_no FROM events WHERE $V""",

    "a3_distinct_keys" ->
      s"SELECT DISTINCT user_id AS rsbsa_no FROM events WHERE $V",

    "a6_latest_wins" ->
      s"""SELECT log_id, rsbsa_no, "table" FROM ($LOG)
         |QUALIFY row_number() OVER (PARTITION BY rsbsa_no ORDER BY log_id DESC) = 1""".stripMargin,

    "w3_top100" ->
      s"""SELECT log_id, rsbsa_no, "table", ts, value FROM ($LOG)
         |ORDER BY ts DESC, log_id DESC LIMIT 100""".stripMargin,

    "t1_except_keys" ->
      s"""SELECT c_custkey AS key FROM customer
         |EXCEPT SELECT user_id AS key FROM events WHERE $V""".stripMargin,

    "t2_intersect_keys" ->
      s"""SELECT c_custkey AS key FROM customer
         |INTERSECT SELECT user_id AS key FROM events WHERE $V""".stripMargin,

    "f2_composite_key" ->
      s"""SELECT event_id AS log_id,
         |       event_type || ':' || CAST(user_id AS VARCHAR) AS composite
         |FROM events WHERE $V""".stripMargin,

    "f3_key_split" ->
      s"""SELECT event_id AS log_id,
         |       split_part(event_type || ':' || CAST(user_id AS VARCHAR), ':', 2) AS key_part
         |FROM events WHERE $V""".stripMargin,

    "a7_error_rate" ->
      s"""SELECT user_id AS rsbsa_no, count(*) AS total,
         |       count(CASE WHEN event_type = 'error' THEN 1 END) AS errors,
         |       (100.0 * count(CASE WHEN event_type = 'error' THEN 1 END)) / count(*) AS err_pct
         |FROM events WHERE $V GROUP BY user_id""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
        |      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
        |      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
        |      * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q9_profit_by_nation" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
        |      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN nation ON n_nationkey = s_nationkey
        |GROUP BY n_name, year(o_orderdate)""".stripMargin,

    "q17_small_qty_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#1'
        |JOIN (
        |  SELECT l_partkey AS t_partkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 0.2 AS qty_thresh
        |  FROM lineitem GROUP BY l_partkey
        |) t ON t_partkey = l_partkey
        |WHERE CAST(l_quantity AS DOUBLE) < qty_thresh""".stripMargin,

    "join_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q3_top_orders" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
        |    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus != 'F'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    // The Bloom pre-filter's oracle IS the plain semi-join: the filter
    // admits (matches + false positives) map-side; the exact semi-join
    // behind it removes the false positives, so Bloom parameters trade
    // only shuffle volume, never results.
    "j7_bloom_semi" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_custkey IN (
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "skew_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // The salted join's oracle IS the plain join: salt changes reducer
    // placement, never semantics.
    "skew_salted_join" ->
      s"""SELECT e.event_id AS log_id, e.user_id AS rsbsa_no,
         |  e.event_type AS "table", c.c_name, c.c_mktsegment
         |FROM (SELECT * FROM events WHERE $V) e
         |JOIN customer c ON e.user_id = c.c_custkey""".stripMargin,

    // Behavior sequences: DuckDB's ordered list() mirrors the sorted
    // collect; slice to the first 10 (ts, log_id)-ordered events.
    "user_event_sequence" ->
      s"""SELECT user_id AS rsbsa_no,
         |  array_to_string((list(event_type ORDER BY ts, event_id))[1:10], ',')
         |    AS event_seq,
         |  least(count(*), 10) AS seq_len
         |FROM events WHERE $V
         |GROUP BY user_id""".stripMargin,

    // Trajectory similarity: per-user event-type sequence (the
    // user_event_sequence ordering), then the dedup_ngram_jaccard
    // chain at w=3 / θ=0.4 over the synthesized sequence text (2-grams
    // saturate the fixture's 5-type alphabet — see the query doc).
    "seq_trajectory_sim" ->
      s"""WITH seqs AS (
         |  SELECT user_id AS doc_id,
         |    array_to_string(list(event_type ORDER BY ts, event_id), ' ') AS text
         |  FROM events WHERE $V GROUP BY user_id),
         |tok AS (
         |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM seqs),
         |sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(
         |      range(1, greatest(len(toks) - 3, 0) + 2),
         |      s -> concat_ws(' ', toks[s], toks[s+1], toks[s+2]))) AS shingles
         |  FROM tok),
         |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh)
         |SELECT a.doc_id AS user_a, b.doc_id AS user_b, count(*) AS inter,
         |  round(CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)), 4) AS jaccard
         |FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
         |HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.4""".stripMargin,

    // RFM: integer recency (epoch µs) / frequency, DECIMAL-summed
    // monetary cast to DOUBLE once; quantile_cont mirrors Spark
    // percentile (the agg_percentiles parity pattern); scores compare
    // against the same three cut points.
    "rfm_segments" ->
      """WITH base AS (
        |  SELECT o_custkey AS custkey, max(o_orderdate) AS last_order,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m,
        |    CAST(epoch_us(max(o_orderdate)) AS DOUBLE) AS rec
        |  FROM orders GROUP BY o_custkey),
        |q AS (
        |  SELECT quantile_cont(rec, [0.25, 0.5, 0.75]) AS rq,
        |    quantile_cont(CAST(frequency AS DOUBLE), [0.25, 0.5, 0.75]) AS fq,
        |    quantile_cont(m, [0.25, 0.5, 0.75]) AS mq
        |  FROM base),
        |s AS (
        |  SELECT b.custkey, b.last_order, b.frequency, b.m,
        |    1 + CAST(b.rec > q.rq[1] AS INTEGER)
        |      + CAST(b.rec > q.rq[2] AS INTEGER)
        |      + CAST(b.rec > q.rq[3] AS INTEGER) AS r_score,
        |    1 + CAST(CAST(b.frequency AS DOUBLE) > q.fq[1] AS INTEGER)
        |      + CAST(CAST(b.frequency AS DOUBLE) > q.fq[2] AS INTEGER)
        |      + CAST(CAST(b.frequency AS DOUBLE) > q.fq[3] AS INTEGER) AS f_score,
        |    1 + CAST(b.m > q.mq[1] AS INTEGER)
        |      + CAST(b.m > q.mq[2] AS INTEGER)
        |      + CAST(b.m > q.mq[3] AS INTEGER) AS m_score
        |  FROM base b CROSS JOIN q)
        |SELECT custkey, last_order, frequency, round(m, 2) AS monetary,
        |  r_score, f_score, m_score,
        |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
        |    || CAST(m_score AS VARCHAR) AS segment
        |FROM s""".stripMargin,

    // Co-purchase: the capped sorted-prefix basket (rn <= 32) mirrors
    // the engine's slice(array_sort(collect_set), 1, cap) exactly;
    // (n DESC, pa, pb) is a unique total order for the LIMIT.
    "graph_copurchase" ->
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |r AS (SELECT l_orderkey, l_partkey, row_number() OVER (
        |    PARTITION BY l_orderkey ORDER BY l_partkey) AS rn FROM d),
        |c AS (SELECT l_orderkey, l_partkey FROM r WHERE rn <= 32),
        |p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb FROM c a
        |  JOIN c b ON a.l_orderkey = b.l_orderkey
        |          AND a.l_partkey < b.l_partkey),
        |g AS (SELECT pa, pb, count(*) AS n FROM p GROUP BY pa, pb),
        |t AS (SELECT * FROM g ORDER BY n DESC, pa, pb LIMIT 50)
        |SELECT t.pa AS part_a, t.pb AS part_b,
        |  na.p_name AS name_a, nb.p_name AS name_b, t.n
        |FROM t JOIN part na ON na.p_partkey = t.pa
        |       JOIN part nb ON nb.p_partkey = t.pb""".stripMargin,

    // Bounded BFS from customer node 0: recursive CTE carries
    // (node, d) pairs with UNION-dedup; min(d) per node = hop
    // distance. Depth guard keeps recursion finite.
    "graph_khop" ->
      """WITH RECURSIVE d AS (
        |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS su
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |edges AS (SELECT c AS src, su AS dst FROM d
        |  UNION ALL SELECT su, c FROM d),
        |r(node, dd) AS (
        |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |  UNION
        |  SELECT e.dst, r.dd + 1 FROM r JOIN edges e ON e.src = r.node
        |  WHERE r.dd < 4)
        |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
        |    AS kind,
        |  node // 2 AS id, min(dd) AS dist
        |FROM r GROUP BY node""".stripMargin,

    // Triangle census: same capped co-purchase pair derivation as
    // graph_copurchase; the oracle counts id-ordered (a<b<c) 3-way
    // join closures — orientation-free but triangle-equivalent to the
    // degree-ordered Spark count (each triangle counted once either
    // way).
    "graph_triangles" ->
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |r AS (SELECT l_orderkey, l_partkey, row_number() OVER (
        |    PARTITION BY l_orderkey ORDER BY l_partkey) AS rn FROM d),
        |c AS (SELECT l_orderkey, l_partkey FROM r WHERE rn <= 32),
        |p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb FROM c a
        |  JOIN c b ON a.l_orderkey = b.l_orderkey
        |          AND a.l_partkey < b.l_partkey),
        |g AS (SELECT pa, pb, count(*) AS n FROM p GROUP BY pa, pb),
        |e AS (SELECT pa, pb FROM g WHERE n >= 2),
        |nn AS (SELECT count(DISTINCT x) AS n_nodes FROM
        |  (SELECT pa AS x FROM e UNION ALL SELECT pb FROM e)),
        |ne AS (SELECT count(*) AS n_edges FROM e),
        |t AS (SELECT count(*) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e1.pb = e2.pa
        |    JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
        |SELECT nn.n_nodes, ne.n_edges, t.n_triangles FROM nn, ne, t""".stripMargin,

    // Label propagation, 3 unrolled synchronous rounds: majority vote
    // = row_number over (count DESC, label ASC) — the same
    // deterministic argmax as Spark's min(struct(−count, label));
    // seeds clamp by exclusion each round.
    "graph_labelprop" ->
      s"""WITH $LABELPROP_CTES
         |SELECT node AS part, label,
         |  node IN (SELECT node FROM seed) AS is_seed
         |FROM l3""".stripMargin,

    // Convergence certificates: replay the SAME unrolled kcore peel /
    // labelprop rounds / recursive BFS as their parent oracles, then
    // emit one row per op — edges removed by the final peel, labels
    // changed by the final vote (left join round3→round2, IS DISTINCT
    // FROM), frontier size at the BFS horizon (min-dist = maxHops).
    "graph_convergence" -> {
      def peel(inEd: String, d: String, kk: String, outEd: String) =
        s"""$d AS (SELECT src AS node, count(*) AS deg FROM $inEd GROUP BY src),
           |$kk AS (SELECT node FROM $d WHERE deg >= 3),
           |$outEd AS (SELECT src, dst FROM $inEd
           |  WHERE src IN (SELECT node FROM $kk)
           |    AND dst IN (SELECT node FROM $kk))""".stripMargin
      s"""WITH RECURSIVE $LABELPROP_CTES,
         |${peel("ed", "dg1", "kp1", "ed1")},
         |${peel("ed1", "dg2", "kp2", "ed2")},
         |${peel("ed2", "dg3", "kp3", "ed3")},
         |td AS (
         |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS su
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |tedges AS (SELECT c AS src, su AS dst FROM td
         |  UNION ALL SELECT su, c FROM td),
         |bfsr(node, dd) AS (
         |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |  UNION
         |  SELECT e.dst, bfsr.dd + 1 FROM bfsr JOIN tedges e ON e.src = bfsr.node
         |  WHERE bfsr.dd < 4),
         |bfsmin AS (SELECT node, min(dd) AS dist FROM bfsr GROUP BY node),
         |kc AS (SELECT CAST((SELECT count(*) FROM ed2) -
         |    (SELECT count(*) FROM ed3) AS BIGINT) AS changed),
         |lp AS (SELECT CAST(count(*) AS BIGINT) AS changed
         |  FROM l3 LEFT JOIN l2 ON l3.node = l2.node
         |  WHERE l3.label IS DISTINCT FROM l2.label),
         |bf AS (SELECT CAST(count(*) AS BIGINT) AS changed
         |  FROM bfsmin WHERE dist = 4)
         |SELECT 'kcore' AS op, CAST(3 AS BIGINT) AS rounds,
         |  changed AS changed_last_round, changed = 0 AS converged FROM kc
         |UNION ALL
         |SELECT 'labelprop', CAST(3 AS BIGINT), changed, changed = 0 FROM lp
         |UNION ALL
         |SELECT 'bfs', CAST(4 AS BIGINT), changed, changed = 0 FROM bf""".stripMargin
    },

    // 3-core by 3 unrolled peeling rounds over the same co-purchase
    // graph: per round, symmetric degree count → keep deg >= 3 →
    // restrict edges to kept endpoints — mirrors Graphs.kCore.
    // SCC over the directed nation trade graph: the oracle is GROUND
    // TRUTH — full transitive closure, mutual pairs, scc = min mutual
    // partner (the engine's FW-BW peeling must land on exactly this
    // table; no trajectory replication, the algorithm is exact by
    // construction). Edge derivation mirrors the engine: directed
    // nation flows, self-trade dropped, top-3 outbound partners by
    // (line count desc, partner asc).
    "graph_scc" ->
      """WITH RECURSIVE l AS (
        |  SELECT c.c_nationkey AS cn, s.s_nationkey AS sn,
        |    li.l_returnflag AS rf
        |  FROM orders o
        |  JOIN lineitem li ON li.l_orderkey = o.o_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN supplier s ON s.s_suppkey = li.l_suppkey),
        |cnt AS (
        |  SELECT CAST(CASE WHEN rf = 'R' THEN sn ELSE cn END AS BIGINT) AS src,
        |         CAST(CASE WHEN rf = 'R' THEN cn ELSE sn END AS BIGINT) AS dst,
        |         count(*) AS n
        |  FROM l
        |  WHERE (CASE WHEN rf = 'R' THEN sn ELSE cn END)
        |     != (CASE WHEN rf = 'R' THEN cn ELSE sn END)
        |  GROUP BY 1, 2),
        |e AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src ORDER BY n DESC, dst) AS rk
        |    FROM cnt) WHERE rk <= 3),
        |nn AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |reach(a, b) AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT r.a, e2.dst FROM reach r JOIN e e2 ON e2.src = r.b),
        |mutual AS (
        |  SELECT r1.a AS v, r1.b AS w FROM reach r1 JOIN reach r2
        |    ON r1.a = r2.b AND r1.b = r2.a),
        |scc AS (
        |  SELECT nn.node, least(nn.node, coalesce(min(m.w), nn.node)) AS scc
        |  FROM nn LEFT JOIN mutual m ON m.v = nn.node
        |  GROUP BY nn.node)
        |SELECT scc.node AS nation, na.n_name, scc.scc
        |FROM scc JOIN nation na ON na.n_nationkey = scc.node""".stripMargin,

    "graph_kcore" -> {
      def peel(inEd: String, d: String, kk: String, outEd: String) =
        s"""$d AS (SELECT src AS node, count(*) AS deg FROM $inEd GROUP BY src),
           |$kk AS (SELECT node FROM $d WHERE deg >= 3),
           |$outEd AS (SELECT src, dst FROM $inEd
           |  WHERE src IN (SELECT node FROM $kk)
           |    AND dst IN (SELECT node FROM $kk))""".stripMargin
      s"""WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |r AS (SELECT l_orderkey, l_partkey, row_number() OVER (
         |    PARTITION BY l_orderkey ORDER BY l_partkey) AS rn FROM d),
         |c AS (SELECT l_orderkey, l_partkey FROM r WHERE rn <= 32),
         |p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb FROM c a
         |  JOIN c b ON a.l_orderkey = b.l_orderkey
         |          AND a.l_partkey < b.l_partkey),
         |g AS (SELECT pa, pb, count(*) AS n FROM p GROUP BY pa, pb),
         |e0 AS (SELECT pa, pb FROM g WHERE n >= 2),
         |ed AS (SELECT pa AS src, pb AS dst FROM e0
         |  UNION ALL SELECT pb, pa FROM e0),
         |${peel("ed", "dg1", "kp1", "ed1")},
         |${peel("ed1", "dg2", "kp2", "ed2")},
         |${peel("ed2", "dg3", "kp3", "ed3")}
         |SELECT src AS part, CAST(count(*) AS BIGINT) AS degree
         |FROM ed3 GROUP BY 1""".stripMargin
    },

    // Modularity of the label-propagation partition over the same
    // co-purchase graph: Q = Σ_c (e_c/m − (d_c/2m)²); within-edge and
    // degree sums are exact integers, each community term ONE fixed
    // FP tree, cross-community sum an ordered fold by community.
    "graph_modularity" ->
      s"""WITH $LABELPROP_CTES,
         |und AS (SELECT pa AS u, pb AS v FROM e0),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
         |deg AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
         |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
         |  GROUP BY node),
         |lab AS (SELECT node, label FROM l3),
         |nc AS (
         |  SELECT deg.node, deg.d,
         |    COALESCE(lab.label, 'node:' || CAST(deg.node AS VARCHAR)) AS comm
         |  FROM deg LEFT JOIN lab ON lab.node = deg.node),
         |wi AS (
         |  SELECT a.comm, CAST(count(*) AS BIGINT) AS within
         |  FROM und JOIN nc a ON a.node = und.u JOIN nc b ON b.node = und.v
         |  WHERE a.comm = b.comm GROUP BY a.comm),
         |dc AS (SELECT comm, CAST(sum(d) AS BIGINT) AS dsum
         |  FROM nc GROUP BY comm),
         |terms AS (
         |  SELECT dc.comm,
         |    CAST(COALESCE(wi.within, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
         |      - (CAST(dc.dsum AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE)))
         |        * (CAST(dc.dsum AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE))) AS t,
         |    m.m AS m
         |  FROM dc LEFT JOIN wi ON wi.comm = dc.comm CROSS JOIN m)
         |SELECT m AS n_edges, CAST(count(*) AS BIGINT) AS n_communities,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(t ORDER BY comm)), (a, b) -> a + b) AS modularity
         |FROM terms GROUP BY m""".stripMargin,

    // Integer-cents histogram: all-integer binning (round→BIGINT
    // cents, ceil width, floor-div bin) — bit-exact in both engines.
    "stat_histogram" ->
      s"""WITH c AS (
         |  SELECT CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE $V AND value IS NOT NULL),
         |b AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c),
         |w AS (SELECT lo, greatest((hi - lo + 20) // 20, 1) AS wd FROM b)
         |SELECT (cents - lo) // wd AS bin,
         |  lo + ((cents - lo) // wd) * wd AS lo_cents,
         |  lo + ((cents - lo) // wd + 1) * wd - 1 AS hi_cents,
         |  count(*) AS n
         |FROM c, w GROUP BY 1, 2, 3""".stripMargin,

    // Pairwise correlation: exact decimal moments, each cast to
    // DOUBLE once, correlation as the identical fixed FP tree
    // (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²)·√(n·Syy − Sy²)). Pair rows
    // union in the Spark explode's order.
    // Welch t-test: per-group exact DECIMAL moments, pair join on the
    // aggregated table, each stat ONE fixed FP tree mirroring
    // Profile.welchTTest's Column expressions subtree-for-subtree.
    "stat_ttest" -> {
      def d(x: String) = s"CAST($x AS DOUBLE)"
      def mean(x: String) = s"${d(s"s_$x")} / ${d(s"n_$x")}"
      def vr(x: String) =
        s"(${d(s"ss_$x")} - ${d(s"s_$x")} * ${d(s"s_$x")} / ${d(s"n_$x")}) / " +
          s"(${d(s"n_$x")} - CAST(1.0 AS DOUBLE))"
      def vn(x: String) = s"(${vr(x)}) / ${d(s"n_$x")}"
      val se2 = s"(${vn("a")} + ${vn("b")})"
      val guard = s"n_a >= 2 AND n_b >= 2 AND $se2 > CAST(0.0 AS DOUBLE)"
      s"""WITH m AS (
         |  SELECT lang AS grp, count(*) AS n,
         |    sum(CAST(n_chars AS DECIMAL(18,2))) AS s,
         |    sum(CAST(n_chars AS DECIMAL(18,2)) * CAST(n_chars AS DECIMAL(18,2))) AS ss
         |  FROM documents GROUP BY lang),
         |p AS (
         |  SELECT a.grp AS lang_a, b.grp AS lang_b,
         |    a.n AS n_a, b.n AS n_b, a.s AS s_a, b.s AS s_b,
         |    a.ss AS ss_a, b.ss AS ss_b
         |  FROM m a JOIN m b ON a.grp < b.grp)
         |SELECT lang_a, lang_b, n_a, n_b,
         |  ${mean("a")} AS mean_a, ${mean("b")} AS mean_b,
         |  CASE WHEN $guard
         |    THEN (${mean("a")} - ${mean("b")}) / sqrt($se2) END AS t_stat,
         |  CASE WHEN $guard
         |    THEN ($se2 * $se2) / ((${vn("a")}) * (${vn("a")}) / (${d("n_a")} - CAST(1.0 AS DOUBLE))
         |      + (${vn("b")}) * (${vn("b")}) / (${d("n_b")} - CAST(1.0 AS DOUBLE))) END AS df
         |FROM p""".stripMargin
    },

    // Per-group mode with the deterministic (count desc, value asc)
    // tie-break — mirrors the min(struct(−n, v)) argmax.
    "agg_mode" ->
      """WITH c AS (
        |  SELECT lang, source, count(*) AS n
        |  FROM documents GROUP BY lang, source),
        |r AS (
        |  SELECT lang, source, n,
        |    CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_docs,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n DESC, source) AS rn
        |  FROM c)
        |SELECT lang, source AS top_source, n AS n_top, n_docs
        |FROM r WHERE rn = 1""".stripMargin,

    // Chi-square independence: exact-integer contingency + marginals,
    // each cell term the identical fixed FP tree (O·N − R·C)²/(R·C·N),
    // cross-cell sum an ordered fold over (ra, cb) — mirrors
    // Profile.chiSquare subtree-for-subtree.
    "stat_chisq" -> {
      def d(x: String) = s"CAST($x AS DOUBLE)"
      s"""WITH obs AS (
         |  SELECT lang AS ra, source AS cb, count(*) AS o
         |  FROM documents GROUP BY 1, 2),
         |rt AS (SELECT ra, CAST(sum(o) AS BIGINT) AS rt FROM obs GROUP BY ra),
         |ct AS (SELECT cb, CAST(sum(o) AS BIGINT) AS ct FROM obs GROUP BY cb),
         |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
         |  count(DISTINCT ra) AS nr, count(DISTINCT cb) AS nc FROM obs),
         |grid AS (
         |  SELECT rt.ra, ct.cb, n, nr, nc,
         |    (${d("COALESCE(obs.o, 0)")} * ${d("n")} - ${d("rt")} * ${d("ct")})
         |      * (${d("COALESCE(obs.o, 0)")} * ${d("n")} - ${d("rt")} * ${d("ct")})
         |      / (${d("rt")} * ${d("ct")} * ${d("n")}) AS t
         |  FROM rt CROSS JOIN ct
         |  LEFT JOIN obs ON obs.ra = rt.ra AND obs.cb = ct.cb
         |  CROSS JOIN tot),
         |s AS (
         |  SELECT n, nr, nc,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(t ORDER BY ra, cb)), (a, b) -> a + b) AS chi2
         |  FROM grid GROUP BY n, nr, nc)
         |SELECT n AS n_rows, (nr - 1) * (nc - 1) AS dof, chi2,
         |  sqrt(chi2 / (${d("n")} * ${d("least(nr, nc) - 1")})) AS cramers_v
         |FROM s""".stripMargin
    },

    // Kolmogorov–Smirnov: exact integer D-numerator
    // max |F1·n2 − F2·n1| over cumulative per-value counts; ONE final
    // division — mirrors Profile.ksTest exactly.
    "stat_ks" ->
      """WITH base AS (
        |  SELECT lang AS g, CAST(n_chars AS BIGINT) AS v FROM documents),
        |gs AS (SELECT DISTINCT g FROM base),
        |pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
        |bt AS (
        |  SELECT p.ga, p.gb, base.g, base.v
        |  FROM base JOIN pairs p ON base.g = p.ga OR base.g = p.gb),
        |pv AS (
        |  SELECT ga, gb, v,
        |    CAST(sum(CASE WHEN g = ga THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN g = gb THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM bt GROUP BY ga, gb, v),
        |cum AS (
        |  SELECT ga, gb, v,
        |    CAST(sum(c1) OVER (PARTITION BY ga, gb ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
        |    CAST(sum(c2) OVER (PARTITION BY ga, gb ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f2
        |  FROM pv),
        |tot AS (
        |  SELECT ga, gb,
        |    CAST(sum(CASE WHEN g = ga THEN 1 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN g = gb THEN 1 END) AS BIGINT) AS n_b
        |  FROM bt GROUP BY ga, gb),
        |d AS (
        |  SELECT cum.ga, cum.gb, tot.n_a, tot.n_b,
        |    max(abs(f1 * n_b - f2 * n_a)) AS d_num
        |  FROM cum JOIN tot ON tot.ga = cum.ga AND tot.gb = cum.gb
        |  GROUP BY cum.ga, cum.gb, tot.n_a, tot.n_b)
        |SELECT ga AS lang_a, gb AS lang_b, n_a, n_b,
        |  CAST(d_num AS BIGINT) AS d_num,
        |  CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS d_stat
        |FROM d""".stripMargin,

    // OLS: exact BIGINT moments (integral quantity, floored price),
    // then the same fixed IEEE tree as Profile.olsFit — n·Σxy − Σx·Σy
    // over n·Σx² − Σx·Σx, intercept (Σy − slope·Σx)/n, r² num²/(dx·dy).
    "stat_ols" -> {
      def d(x: String) = s"CAST($x AS DOUBLE)"
      val num = s"(${d("n")} * ${d("sxy")} - ${d("sx")} * ${d("sy")})"
      val denx = s"(${d("n")} * ${d("sxx")} - ${d("sx")} * ${d("sx")})"
      val deny = s"(${d("n")} * ${d("syy")} - ${d("sy")} * ${d("sy")})"
      s"""WITH b AS (
         |  SELECT l_returnflag, l_linestatus,
         |    CAST(l_quantity AS BIGINT) AS x,
         |    CAST(floor(l_extendedprice) AS BIGINT) AS y
         |  FROM lineitem),
         |m AS (
         |  SELECT l_returnflag, l_linestatus, count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM b GROUP BY 1, 2)
         |SELECT l_returnflag, l_linestatus, n,
         |  CASE WHEN n >= 2 AND $denx <> 0.0 THEN $num / $denx END AS slope,
         |  CASE WHEN n >= 2 AND $denx <> 0.0
         |    THEN (${d("sy")} - ($num / $denx) * ${d("sx")}) / ${d("n")} END
         |    AS intercept,
         |  CASE WHEN n >= 2 AND $denx <> 0.0 AND $deny <> 0.0
         |    THEN ($num * $num) / ($denx * $deny) END AS r2
         |FROM m""".stripMargin
    },

    // Benford: string-arithmetic first digit of the floored BIGINT
    // (no data-dependent log10 — libm-portable), literal 9-decimal
    // expected probabilities shared verbatim with Profile.benford,
    // per-digit χ² term (O − N·p)²/(N·p) as the same fixed tree.
    "stat_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders),
        |o AS (
        |  SELECT digit, count(*) AS n_obs FROM d
        |  WHERE digit >= 1 GROUP BY digit),
        |e(digit, p_exp) AS (VALUES
        |  (1, CAST(0.301029996 AS DOUBLE)), (2, CAST(0.176091259 AS DOUBLE)),
        |  (3, CAST(0.124938737 AS DOUBLE)), (4, CAST(0.096910013 AS DOUBLE)),
        |  (5, CAST(0.079181246 AS DOUBLE)), (6, CAST(0.06694679 AS DOUBLE)),
        |  (7, CAST(0.057991947 AS DOUBLE)), (8, CAST(0.051152522 AS DOUBLE)),
        |  (9, CAST(0.045757491 AS DOUBLE))),
        |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_rows FROM o)
        |SELECT e.digit, CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
        |  n_rows, e.p_exp,
        |  (CAST(COALESCE(o.n_obs, 0) AS DOUBLE)
        |     - CAST(n_rows AS DOUBLE) * e.p_exp)
        |  * (CAST(COALESCE(o.n_obs, 0) AS DOUBLE)
        |     - CAST(n_rows AS DOUBLE) * e.p_exp)
        |  / (CAST(n_rows AS DOUBLE) * e.p_exp) AS chi_term
        |FROM e LEFT JOIN o ON o.digit = e.digit CROSS JOIN t""".stripMargin,

    // Reservoir sample: salted-md5 rank inside each group, first k —
    // the deterministic distributed reservoir; identical hash string
    // and (hash, id) tie order as Selection.reservoirSample.
    "sample_reservoir" ->
      """WITH h AS (
        |  SELECT source, doc_id,
        |    md5(concat('rsv:', CAST(doc_id AS VARCHAR))) AS hk
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id,
        |    CAST(row_number() OVER (
        |      PARTITION BY source ORDER BY hk, doc_id) AS BIGINT) AS rk
        |  FROM h)
        |SELECT source, doc_id, rk FROM r WHERE rk <= 20""".stripMargin,

    // Spearman: doubled average ranks 2·rank + ties − 1 centered by
    // the exact doubled mean n + 1; the three moments are plain BIGINT
    // sums, ρ is one fixed tree sxy/(√sxx·√syy) — mirrors
    // Profile.spearman operand-for-operand.
    "stat_spearman" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem),
        |r AS (
        |  SELECT g,
        |    2 * CAST(rank() OVER (PARTITION BY g ORDER BY x) AS BIGINT)
        |      + CAST(count(*) OVER (PARTITION BY g, x) AS BIGINT) - 1 AS dx,
        |    2 * CAST(rank() OVER (PARTITION BY g ORDER BY y) AS BIGINT)
        |      + CAST(count(*) OVER (PARTITION BY g, y) AS BIGINT) - 1 AS dy,
        |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS nn
        |  FROM b),
        |c AS (SELECT g, dx - nn - 1 AS cx, dy - nn - 1 AS cy FROM r),
        |m AS (
        |  SELECT g, count(*) AS n,
        |    CAST(sum(cx * cy) AS BIGINT) AS sxy,
        |    CAST(sum(cx * cx) AS BIGINT) AS sxx,
        |    CAST(sum(cy * cy) AS BIGINT) AS syy
        |  FROM c GROUP BY g)
        |SELECT g AS l_returnflag, n,
        |  CASE WHEN sxx > 0 AND syy > 0 THEN
        |    CAST(sxy AS DOUBLE)
        |      / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE)))
        |  END AS rho
        |FROM m""".stripMargin,

    // One-way ANOVA: exact BIGINT per-group moments, the cross-group
    // Σ s_g²/n_g as a g-ordered list_reduce fold (FP addition does not
    // commute), then the fixed F and η² trees of Profile.anovaF.
    // Kruskal–Wallis: 2×midranks are exact integers (2·prefix + c + 1
    // over the distinct-value counts), per-group rank sums exact
    // BIGINTs, and the per-group double terms fold in g-order (the
    // stat_anova list_reduce convention) — bit-identical trees.
    "stat_kruskal" -> {
      def dd(x: String) = s"CAST($x AS DOUBLE)"
      s"""WITH base AS (
         |  SELECT lang AS g, CAST(n_chars AS BIGINT) AS v FROM documents),
         |vc AS (SELECT v, count(*) AS c FROM base GROUP BY v),
         |mr AS (
         |  SELECT v, c,
         |    2 * (sum(c) OVER (ORDER BY v) - c) + c + 1 AS m2
         |  FROM vc),
         |per AS (
         |  SELECT g, CAST(sum(m) AS BIGINT) AS ng,
         |    CAST(sum(m * m2) AS BIGINT) AS r2
         |  FROM (SELECT g, v, count(*) AS m FROM base GROUP BY g, v) gv
         |  JOIN mr USING (v) GROUP BY g),
         |terms AS (
         |  SELECT g, ng, r2,
         |    ${dd("r2")} * ${dd("r2")} / (4.0 * ${dd("ng")}) AS t
         |  FROM per),
         |tt AS (SELECT CAST(sum(c * c * c - c) AS BIGINT) AS tie3 FROM vc),
         |a AS (
         |  SELECT count(*) AS k, CAST(sum(ng) AS BIGINT) AS n_rows,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(t ORDER BY g)), (x, y) -> x + y) AS rsum
         |  FROM terms)
         |SELECT k, n_rows,
         |  CASE WHEN n_rows >= 2 THEN
         |    12.0 * rsum / (${dd("n_rows")} * (${dd("n_rows")} + 1.0))
         |      - 3.0 * (${dd("n_rows")} + 1.0) END AS h_stat,
         |  CASE WHEN n_rows >= 2 AND
         |      1.0 - ${dd("tie3")}
         |        / (${dd("n_rows")} * ${dd("n_rows")} * ${dd("n_rows")}
         |           - ${dd("n_rows")}) > 0.0 THEN
         |    (12.0 * rsum / (${dd("n_rows")} * (${dd("n_rows")} + 1.0))
         |      - 3.0 * (${dd("n_rows")} + 1.0))
         |    / (1.0 - ${dd("tie3")}
         |        / (${dd("n_rows")} * ${dd("n_rows")} * ${dd("n_rows")}
         |           - ${dd("n_rows")})) END AS h_corrected
         |FROM a CROSS JOIN tt""".stripMargin
    },

    "stat_anova" -> {
      def d(x: String) = s"CAST($x AS DOUBLE)"
      val ssb = s"(bsum - ${d("s")} * ${d("s")} / ${d("n_rows")})"
      val ssw = s"(${d("q")} - bsum)"
      s"""WITH g AS (
         |  SELECT lang AS g, count(*) AS ng,
         |    CAST(sum(n_chars) AS BIGINT) AS sg,
         |    CAST(sum(n_chars * n_chars) AS BIGINT) AS qg
         |  FROM documents GROUP BY lang),
         |terms AS (
         |  SELECT g, ng, sg, qg,
         |    ${d("sg")} * ${d("sg")} / ${d("ng")} AS t
         |  FROM g),
         |a AS (
         |  SELECT count(*) AS k, CAST(sum(ng) AS BIGINT) AS n_rows,
         |    CAST(sum(sg) AS BIGINT) AS s, CAST(sum(qg) AS BIGINT) AS q,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(t ORDER BY g)), (x, y) -> x + y) AS bsum
         |  FROM terms)
         |SELECT k, n_rows,
         |  CASE WHEN k >= 2 AND n_rows > k AND $ssw > 0.0 THEN
         |    ($ssb / (${d("k")} - CAST(1.0 AS DOUBLE)))
         |      / ($ssw / (${d("n_rows")} - ${d("k")}))
         |  END AS f_stat,
         |  CASE WHEN $ssb + $ssw > 0.0 THEN $ssb / ($ssb + $ssw)
         |  END AS eta_sq
         |FROM a""".stripMargin
    },

    // Mann–Whitney U: doubled-integer average ranks (2·rank + ties − 1
    // is exact), U and the rank sums never touch FP; z is the single
    // fixed tree (U − n_a·n_b/2)/σ_U with the standard tie correction,
    // mirroring Profile.mannWhitney operand-for-operand.
    "stat_mannwhitney" -> {
      def d(x: String) = s"CAST($x AS DOUBLE)"
      val dn = s"(${d("n_a")} + ${d("n_b")})"
      val sigma2 = s"${d("n_a")} * ${d("n_b")} / CAST(12.0 AS DOUBLE) * " +
        s"(($dn + CAST(1.0 AS DOUBLE)) - ${d("tie3")} / " +
        s"($dn * ($dn - CAST(1.0 AS DOUBLE))))"
      val u2a = s"(r2a - n_a * (n_a + 1))"
      s"""WITH base AS (
         |  SELECT lang AS g, CAST(n_chars AS BIGINT) AS v FROM documents),
         |gs AS (SELECT DISTINCT g FROM base),
         |pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
         |bt AS (
         |  SELECT p.ga, p.gb, base.g, base.v
         |  FROM base JOIN pairs p ON base.g = p.ga OR base.g = p.gb),
         |rk AS (
         |  SELECT ga, gb, g, v,
         |    CAST(rank() OVER (PARTITION BY ga, gb ORDER BY v) AS BIGINT) AS rk,
         |    CAST(count(*) OVER (PARTITION BY ga, gb, v) AS BIGINT) AS tie
         |  FROM bt),
         |sums AS (
         |  SELECT ga, gb,
         |    CAST(sum(CASE WHEN g = ga THEN 2 * rk + tie - 1 END) AS BIGINT) AS r2a,
         |    CAST(sum(CASE WHEN g = ga THEN 1 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN g = gb THEN 1 END) AS BIGINT) AS n_b
         |  FROM rk GROUP BY ga, gb),
         |ties AS (
         |  SELECT ga, gb, CAST(sum(t * t * t - t) AS BIGINT) AS tie3
         |  FROM (SELECT ga, gb, v, count(*) AS t FROM bt GROUP BY ga, gb, v)
         |  GROUP BY ga, gb)
         |SELECT ga AS lang_a, gb AS lang_b, n_a, n_b,
         |  ${d(u2a)} / CAST(2.0 AS DOUBLE) AS u_stat,
         |  CASE WHEN n_a >= 1 AND n_b >= 1 AND $sigma2 > CAST(0.0 AS DOUBLE)
         |    THEN (${d(u2a)} - ${d("n_a")} * ${d("n_b")}) /
         |      (CAST(2.0 AS DOUBLE) * sqrt($sigma2)) END AS z_stat
         |FROM sums JOIN ties USING (ga, gb)""".stripMargin
    },

    "stat_corr" -> {
      val cols = Seq("l_quantity" -> "q", "l_extendedprice" -> "p",
        "l_discount" -> "d")
      val moments = cols.map { case (c, a) =>
        s"sum(CAST($c AS DECIMAL(18,2))) AS s_$a,\n" +
          s"    sum(CAST($c AS DECIMAL(18,2)) * CAST($c AS DECIMAL(18,2))) AS ss_$a"
      }.mkString(",\n    ")
      val pairs = for {
        i <- cols.indices; j <- (i + 1) until cols.size
      } yield (cols(i), cols(j))
      val crosses = pairs.map { case ((ca, a), (cb, b)) =>
        s"sum(CAST($ca AS DECIMAL(18,2)) * CAST($cb AS DECIMAL(18,2))) AS sx_$a$b"
      }.mkString(",\n    ")
      val arms = pairs.map { case ((ca, a), (cb, b)) =>
        val n = "CAST(n AS DOUBLE)"
        val num = s"$n * CAST(sx_$a$b AS DOUBLE) - " +
          s"CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE)"
        val den = s"sqrt($n * CAST(ss_$a AS DOUBLE) - " +
          s"CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)) * " +
          s"sqrt($n * CAST(ss_$b AS DOUBLE) - " +
          s"CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))"
        s"""SELECT grp AS l_returnflag, '$ca' AS col_a, '$cb' AS col_b,
           |  n AS n_rows,
           |  CASE WHEN $den <> 0 THEN ($num) / ($den) END AS corr
           |FROM m""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH m AS (
         |  SELECT l_returnflag AS grp, count(*) AS n,
         |    $moments,
         |    $crosses
         |  FROM lineitem GROUP BY l_returnflag)
         |$arms""".stripMargin
    },

    // Integer PageRank, 3 unrolled iterations. DuckDB sum(BIGINT)
    // goes HUGEINT — cast each iteration's rank back to BIGINT; `//`
    // is floor division (all operands positive → identical to
    // Spark's `div`).
    "graph_pagerank" -> {
      def iter(prev: String, out: String): String =
        s"$out AS (SELECT e.dst AS node, " +
          s"CAST(150000000 + (85 * sum(p.r // dg.deg)) // 100 AS BIGINT) AS r " +
          s"FROM edges e JOIN $prev p ON p.node = e.src " +
          s"JOIN deg dg ON dg.src = e.src GROUP BY e.dst)"
      s"""WITH d AS (
         |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS su
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |edges AS (SELECT c AS src, su AS dst FROM d
         |  UNION ALL SELECT su, c FROM d),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |r0 AS (SELECT DISTINCT src AS node,
         |  CAST(1000000000 AS BIGINT) AS r FROM edges),
         |${iter("r0", "i1")},
         |${iter("i1", "i2")},
         |${iter("i2", "i3")}
         |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         |    AS kind,
         |  node // 2 AS id, r AS rank
         |FROM i3""".stripMargin
    },

    // Personalized PageRank from every 50th customer: teleport lands
    // on seed nodes only (full join vs the seed set per round); same
    // integer floor arithmetic and 3-round unroll as graph_pagerank.
    "graph_ppr_seeds" -> {
      def iter(prev: String, out: String): String =
        s"""$out AS (
           |  SELECT COALESCE(c.node, s.node) AS node,
           |    COALESCE(c.rc, 0)
           |      + CASE WHEN s.node IS NOT NULL THEN 150000000 ELSE 0 END AS r
           |  FROM (SELECT e.dst AS node,
           |          CAST((85 * sum(p.r // dg.deg)) // 100 AS BIGINT) AS rc
           |        FROM edges e JOIN $prev p ON p.node = e.src
           |        JOIN deg dg ON dg.src = e.src GROUP BY e.dst) c
           |  FULL JOIN seeds s ON s.node = c.node)""".stripMargin
      s"""WITH d AS (
         |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS su
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |edges AS (SELECT c AS src, su AS dst FROM d
         |  UNION ALL SELECT su, c FROM d),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |seeds AS (SELECT DISTINCT c_custkey * 2 AS node FROM customer
         |  WHERE c_custkey % 50 = 0),
         |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM seeds),
         |${iter("r0", "i1")},
         |${iter("i1", "i2")},
         |${iter("i2", "i3")}
         |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         |    AS kind,
         |  node // 2 AS id, CAST(r AS BIGINT) AS rank
         |FROM i3""".stripMargin
    },

    // Fixpoint-delta certificates: pagerank rounds 2-vs-3 and HITS
    // rounds 1-vs-2 replayed with the SAME unrolled builders as
    // graph_pagerank / graph_hits, reduced to changed-node counts.
    "graph_fixpoint_delta" -> {
      val r0h = 1000000L
      def iter(prev: String, out: String): String =
        s"$out AS (SELECT e.dst AS node, " +
          s"CAST(150000000 + (85 * sum(p.r // dg.deg)) // 100 AS BIGINT) AS r " +
          s"FROM edges e JOIN $prev p ON p.node = e.src " +
          s"JOIN deg dg ON dg.src = e.src GROUP BY e.dst)"
      def auth(h: String, out: String): String =
        s"""${out}raw AS (SELECT e.dst AS node, CAST(sum(p.h) AS BIGINT) AS ar
           |  FROM edges e JOIN $h p ON p.node = e.src GROUP BY e.dst),
           |$out AS (SELECT node,
           |  CAST((ar * $r0h) // (SELECT max(ar) FROM ${out}raw) AS BIGINT) AS a
           |  FROM ${out}raw)""".stripMargin
      def hubStep(a: String, out: String): String =
        s"""${out}raw AS (SELECT e.src AS node, CAST(sum(p.a) AS BIGINT) AS hr
           |  FROM edges e JOIN $a p ON p.node = e.dst GROUP BY e.src),
           |$out AS (SELECT node,
           |  CAST((hr * $r0h) // (SELECT max(hr) FROM ${out}raw) AS BIGINT) AS h
           |  FROM ${out}raw)""".stripMargin
      val hitsChanged =
        """(SELECT count(*) FROM nodes n
          |    LEFT JOIN h1 ON h1.node = n.node LEFT JOIN h2 ON h2.node = n.node
          |    LEFT JOIN a1 ON a1.node = n.node LEFT JOIN a2 ON a2.node = n.node
          |    WHERE COALESCE(h2.h, 0) <> COALESCE(h1.h, 0)
          |       OR COALESCE(a2.a, 0) <> COALESCE(a1.a, 0))""".stripMargin
      val prChanged =
        """(SELECT count(*) FROM i3 FULL JOIN i2 ON i3.node = i2.node
          |        WHERE i3.r IS DISTINCT FROM i2.r)""".stripMargin
      s"""WITH d AS (
         |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS su
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |edges AS (SELECT c AS src, su AS dst FROM d
         |  UNION ALL SELECT su, c FROM d),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |r0 AS (SELECT DISTINCT src AS node,
         |  CAST(1000000000 AS BIGINT) AS r FROM edges),
         |${iter("r0", "i1")},
         |${iter("i1", "i2")},
         |${iter("i2", "i3")},
         |nodes AS (SELECT DISTINCT src AS node FROM edges
         |  UNION SELECT DISTINCT dst FROM edges),
         |h0 AS (SELECT node, CAST($r0h AS BIGINT) AS h FROM nodes),
         |${auth("h0", "a1")},
         |${hubStep("a1", "h1")},
         |${auth("h1", "a2")},
         |${hubStep("a2", "h2")}
         |SELECT 'pagerank' AS op, CAST(3 AS BIGINT) AS rounds,
         |  CAST($prChanged AS BIGINT) AS changed_last_round,
         |  $prChanged = 0 AS converged
         |UNION ALL
         |SELECT 'hits', 2, CAST($hitsChanged AS BIGINT), $hitsChanged = 0""".stripMargin
    },

    // HITS: 2 unrolled rounds of max-rescaled floor-integer
    // half-steps — auth = Σ hub over in-edges then ·r0 // max, hub
    // symmetric over out-edges; node universe left-joined with 0 fill.
    // Mirrors Graphs.hits bit-for-bit.
    "graph_hits" -> {
      val r0 = 1000000L
      def auth(h: String, out: String): String =
        s"""${out}raw AS (SELECT e.dst AS node, CAST(sum(p.h) AS BIGINT) AS ar
           |  FROM edges e JOIN $h p ON p.node = e.src GROUP BY e.dst),
           |$out AS (SELECT node,
           |  CAST((ar * $r0) // (SELECT max(ar) FROM ${out}raw) AS BIGINT) AS a
           |  FROM ${out}raw)""".stripMargin
      def hubStep(a: String, out: String): String =
        s"""${out}raw AS (SELECT e.src AS node, CAST(sum(p.a) AS BIGINT) AS hr
           |  FROM edges e JOIN $a p ON p.node = e.dst GROUP BY e.src),
           |$out AS (SELECT node,
           |  CAST((hr * $r0) // (SELECT max(hr) FROM ${out}raw) AS BIGINT) AS h
           |  FROM ${out}raw)""".stripMargin
      s"""WITH d AS (
         |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS su
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |edges AS (SELECT c AS src, su AS dst FROM d
         |  UNION ALL SELECT su, c FROM d),
         |nodes AS (SELECT DISTINCT src AS node FROM edges
         |  UNION SELECT DISTINCT dst FROM edges),
         |h0 AS (SELECT node, CAST($r0 AS BIGINT) AS h FROM nodes),
         |${auth("h0", "a1")},
         |${hubStep("a1", "h1")},
         |${auth("h1", "a2")},
         |${hubStep("a2", "h2")}
         |SELECT CASE WHEN n.node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         |    AS kind,
         |  n.node // 2 AS id,
         |  COALESCE(h2.h, 0) AS hub, COALESCE(a2.a, 0) AS auth
         |FROM nodes n
         |LEFT JOIN h2 ON h2.node = n.node
         |LEFT JOIN a2 ON a2.node = n.node""".stripMargin
    },

    // Incremental agg maintenance: the oracle is the ONE-SHOT group
    // by — the Spark side must reach the identical result via
    // base+delta state merge (decimal sums are fold-order-free).
    "inc_agg_merge" ->
      s"""SELECT user_id AS rsbsa_no, count(*) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events
         |WHERE $V AND value IS NOT NULL
         |GROUP BY user_id""".stripMargin,

    // Blocked fuzzy ER: DuckDB's unbounded levenshtein mirrors the
    // bounded-kernel-then-filter Spark side exactly on emitted rows
    // (rows above the bound are filtered either way).
    "er_fuzzy_pairs" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS nm,
        |    c_nationkey AS nk, c_mktsegment AS seg FROM customer)
        |SELECT a.id AS a_id, b.id AS b_id, a.nm AS a_val, b.nm AS b_val,
        |  levenshtein(a.nm, b.nm) AS dist
        |FROM c a JOIN c b ON a.nk = b.nk AND a.seg = b.seg AND a.id < b.id
        |WHERE levenshtein(a.nm, b.nm) <= 2""".stripMargin,

    // Sorted-neighborhood matching: the oracle's single row_number
    // over the total (name, id) order equals the Spark side's
    // two-phase range-partitioned index by construction.
    "er_sorted_neighbors" ->
      """WITH s AS (SELECT c_custkey AS id, c_name AS nm,
        |    row_number() OVER (ORDER BY c_name, c_custkey) AS idx
        |  FROM customer)
        |SELECT a.id AS a_id, b.id AS b_id, a.nm AS a_val, b.nm AS b_val,
        |  levenshtein(a.nm, b.nm) AS dist
        |FROM s a JOIN s b ON b.idx - a.idx BETWEEN 1 AND 9
        |WHERE levenshtein(a.nm, b.nm) <= 1""".stripMargin,

    // ER entities: recursive-CTE transitive closure over the same
    // blocked pair set; entity id = component min.
    "er_entities" ->
      """WITH RECURSIVE c AS (SELECT c_custkey AS id, c_name AS nm,
        |    c_nationkey AS nk, c_mktsegment AS seg FROM customer),
        |p AS (
        |  SELECT a.id AS a_id, b.id AS b_id
        |  FROM c a JOIN c b ON a.nk = b.nk AND a.seg = b.seg AND a.id < b.id
        |  WHERE levenshtein(a.nm, b.nm) <= 2),
        |edges AS (SELECT a_id AS u, b_id AS v FROM p
        |  UNION SELECT b_id, a_id FROM p),
        |reach(id, r) AS (
        |  SELECT DISTINCT u, u FROM edges
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r),
        |comp AS (SELECT id AS rec_id, min(r) AS entity_id FROM reach GROUP BY id)
        |SELECT rec_id, entity_id,
        |  count(*) OVER (PARTITION BY entity_id) AS n_recs
        |FROM comp""".stripMargin,

    // Golden record: the er_entities reachability CTE, then the
    // survivorship aggregates — decimal-exact merged balance, distinct
    // segment count, survivor name from the component-min record.
    "er_golden_record" ->
      """WITH RECURSIVE c AS (SELECT c_custkey AS id, c_name AS nm,
        |    c_nationkey AS nk, c_mktsegment AS seg,
        |    c_acctbal AS bal FROM customer),
        |p AS (
        |  SELECT a.id AS a_id, b.id AS b_id
        |  FROM c a JOIN c b ON a.nk = b.nk AND a.seg = b.seg AND a.id < b.id
        |  WHERE levenshtein(a.nm, b.nm) <= 2),
        |edges AS (SELECT a_id AS u, b_id AS v FROM p
        |  UNION SELECT b_id, a_id FROM p),
        |reach(id, r) AS (
        |  SELECT DISTINCT u, u FROM edges
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r),
        |comp AS (SELECT id AS rec_id, min(r) AS entity_id FROM reach GROUP BY id),
        |merged AS (
        |  SELECT comp.entity_id, count(*) AS n_recs,
        |    CAST(sum(CAST(c.bal AS DECIMAL(12,2))) AS DOUBLE) AS merged_acctbal,
        |    count(DISTINCT c.seg) AS n_segments
        |  FROM comp JOIN c ON c.id = comp.rec_id
        |  GROUP BY comp.entity_id)
        |SELECT m.entity_id, s.nm AS survivor_name, m.n_recs,
        |  m.merged_acctbal, m.n_segments
        |FROM merged m JOIN c s ON s.id = m.entity_id""".stripMargin,

    // Incremental dedup: delta (odd ids) fingerprints anti-joined
    // against history (even ids), first-wins within the delta.
    "dedup_incremental" ->
      """WITH hist AS (
        |  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 2 = 0),
        |delta AS (
        |  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 2 = 1)
        |SELECT d.fp, min(d.doc_id) AS keep_id, count(*) AS n_delta_copies
        |FROM delta d ANTI JOIN hist h ON h.fp = d.fp
        |GROUP BY d.fp""".stripMargin,

    // Markov transitions: exact counts; window sum cast to BIGINT
    // before the single double division (DuckDB window sums go
    // HUGEINT).
    "seq_transitions" ->
      s"""WITH nxt AS (
         |  SELECT event_type AS from_state,
         |    lead(event_type) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) AS to_state
         |  FROM events WHERE $V),
         |c AS (
         |  SELECT from_state, to_state, count(*) AS n FROM nxt
         |  WHERE to_state IS NOT NULL GROUP BY from_state, to_state)
         |SELECT from_state, to_state, n,
         |  round(CAST(n AS DOUBLE) /
         |    CAST(CAST(sum(n) OVER (PARTITION BY from_state) AS BIGINT)
         |      AS DOUBLE), 4) AS prob
         |FROM c""".stripMargin,

    // EWMA: list() over the same 20-row frame, list_reduce left-fold
    // seeded with the first element — identical IEEE multiply-add
    // chain as the engine's ordered aggregate(); (1-α) is the SAME
    // double subtraction both sides.
    // Seasonal decomposition: exact-cents hour-of-day means (one
    // integer sum, divided once), residual = the same two
    // correctly-rounded IEEE ops as the engine.
    "ts_seasonal" ->
      s"""WITH base AS (
         |  SELECT event_id AS log_id, event_type AS "table", hour(ts) AS hh,
         |    CAST(value AS DOUBLE) AS value,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM events WHERE $V AND value IS NOT NULL),
         |prof AS (
         |  SELECT "table", hh, CAST(sum(c) AS BIGINT) AS s, count(*) AS n
         |  FROM base GROUP BY 1, 2),
         |j AS (
         |  SELECT b.log_id, b."table", b.hh, b.value,
         |    p.s * 100 AS p1, (b.c * p.n - p.s) * 100 AS p2, p.n
         |  FROM base b JOIN prof p ON p."table" = b."table" AND p.hh = b.hh)
         |SELECT log_id, "table", CAST(hh AS BIGINT) AS hh, value,
         |  CAST(CASE WHEN p1 >= 0 THEN (2 * p1 + n) // (2 * n)
         |       ELSE -((2 * (-p1) + n) // (2 * n)) END AS DOUBLE) / 10000.0 AS seasonal,
         |  CAST(CASE WHEN p2 >= 0 THEN (2 * p2 + n) // (2 * n)
         |       ELSE -((2 * (-p2) + n) // (2 * n)) END AS DOUBLE) / 10000.0 AS resid
         |FROM j""".stripMargin,

    // CUSUM changepoint: scaled exact-integer deviation n*S_t - t*T
    // over cents, peak per series (ties to earliest ts/id).
    "ts_cusum" ->
      s"""WITH b AS (
         |  SELECT event_id AS log_id, event_type AS tbl, ts,
         |    CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE $V AND value IS NOT NULL),
         |sc AS (
         |  SELECT log_id, tbl, ts,
         |    CAST(row_number() OVER (PARTITION BY tbl ORDER BY ts, log_id) AS BIGINT) AS t,
         |    CAST(sum(cents) OVER (PARTITION BY tbl ORDER BY ts, log_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s,
         |    CAST(count(*) OVER (PARTITION BY tbl) AS BIGINT) AS n,
         |    CAST(sum(cents) OVER (PARTITION BY tbl) AS BIGINT) AS tot
         |  FROM b),
         |d AS (SELECT log_id, tbl, ts, n, CAST(abs(n * s - t * tot) AS BIGINT) AS dev FROM sc)
         |SELECT tbl AS "table", log_id AS peak_log_id, ts AS peak_ts,
         |  n AS n_obs, dev AS peak_dev
         |FROM (SELECT d.*, row_number() OVER (PARTITION BY tbl ORDER BY dev DESC, ts, log_id) AS r FROM d)
         |WHERE r = 1""".stripMargin,

    "ts_ewma" ->
      s"""WITH v AS (
         |  SELECT event_id, user_id, ts, value,
         |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vals
         |  FROM events WHERE $V AND value IS NOT NULL)
         |SELECT event_id AS log_id, user_id AS rsbsa_no, ts, value,
         |  len(vals) AS n_obs,
         |  round(list_reduce(vals, (acc, x) ->
         |    CAST(0.3 AS DOUBLE) * x +
         |    (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * acc), 4) AS ewma
         |FROM v""".stripMargin,

    // Hampel MAD outliers: even-cents median (integer-valued double),
    // exact deviations, MAD on .0/.5 halves — single-tree threshold
    // and robust-z division.
    // Theil–Sen: daily exact-cents totals, every pairwise slope one
    // IEEE division, DISCRETE lower-median selection via row_number
    // ordered (slope, xa, xb) / (ic, x) — mirrors TimeSeries.theilSen.
    "ts_theil_sen" ->
      s"""WITH daily AS (
         |  SELECT event_type AS k,
         |    CAST(ts AS DATE) - DATE '1970-01-01' AS x,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
         |      AS BIGINT) AS yc
         |  FROM events WHERE $V AND value IS NOT NULL
         |  GROUP BY 1, 2),
         |pr AS (
         |  SELECT a.k, a.x AS xa, b.x AS xb,
         |    CAST(b.yc - a.yc AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
         |  FROM daily a JOIN daily b ON a.k = b.k AND a.x < b.x),
         |med AS (
         |  SELECT k, np AS n_pairs, slope AS sc FROM (
         |    SELECT k, slope,
         |      row_number() OVER (PARTITION BY k ORDER BY slope, xa, xb) AS rn,
         |      count(*) OVER (PARTITION BY k) AS np
         |    FROM pr) WHERE rn = (np + 1) // 2),
         |res AS (
         |  SELECT daily.k, med.n_pairs, med.sc,
         |    CAST(daily.yc AS DOUBLE) - med.sc * CAST(daily.x AS DOUBLE) AS ic,
         |    daily.x
         |  FROM daily JOIN med ON daily.k = med.k),
         |pick AS (
         |  SELECT k, n_pairs, sc, nd, ic FROM (
         |    SELECT k, n_pairs, sc, ic,
         |      row_number() OVER (PARTITION BY k ORDER BY ic, x) AS rn,
         |      count(*) OVER (PARTITION BY k) AS nd
         |    FROM res) WHERE rn = (nd + 1) // 2)
         |SELECT k AS "table", CAST(nd AS BIGINT) AS n_days,
         |  CAST(n_pairs AS BIGINT) AS n_pairs,
         |  sc / 100.0 AS slope_per_day, ic / 100.0 AS intercept
         |FROM pick""".stripMargin,

    // Binary-segmentation changepoint: daily exact-cents totals,
    // HUGEINT prefix/total squared sums (the decimal(38,0) twin of the
    // engine side), per-split cost one fixed tree, argmin by
    // (cost, day) — mirrors TimeSeries.changepoint.
    "ts_changepoint" -> {
      def d(x: String) = s"CAST($x AS DOUBLE)"
      val cost = s"(${d("ql")} - ${d("sl")} * ${d("sl")} / ${d("t")})" +
        s" + ((${d("q")} - ${d("ql")}) - (${d("s")} - ${d("sl")})" +
        s" * (${d("s")} - ${d("sl")}) / (${d("n")} - ${d("t")}))"
      s"""WITH daily AS (
         |  SELECT event_type AS k,
         |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INT) AS x,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
         |      AS BIGINT) AS yc
         |  FROM events WHERE $V AND value IS NOT NULL
         |  GROUP BY 1, 2),
         |pre AS (
         |  SELECT k, x,
         |    CAST(row_number() OVER (PARTITION BY k ORDER BY x) AS BIGINT) AS t,
         |    CAST(sum(yc) OVER (PARTITION BY k ORDER BY x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sl,
         |    sum(CAST(yc AS HUGEINT) * CAST(yc AS HUGEINT))
         |      OVER (PARTITION BY k ORDER BY x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ql,
         |    CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
         |    CAST(sum(yc) OVER (PARTITION BY k) AS BIGINT) AS s,
         |    sum(CAST(yc AS HUGEINT) * CAST(yc AS HUGEINT))
         |      OVER (PARTITION BY k) AS q
         |  FROM daily),
         |sc AS (
         |  SELECT k, x, t, n, sl, s, $cost AS cost
         |  FROM pre WHERE t < n),
         |pick AS (
         |  SELECT k, n, x, t, cost, sl, s,
         |    row_number() OVER (PARTITION BY k ORDER BY cost, x) AS rn
         |  FROM sc)
         |SELECT k AS "table", n AS n_days, x AS split_x, t AS n_left,
         |  cost AS sse,
         |  ${d("sl")} / ${d("t")} / CAST(100.0 AS DOUBLE) AS mean_left,
         |  (${d("s")} - ${d("sl")}) / (${d("n")} - ${d("t")})
         |    / CAST(100.0 AS DOUBLE) AS mean_right
         |FROM pick WHERE rn = 1""".stripMargin
    },

    "ts_mad_outliers" ->
      s"""WITH e AS (
         |  SELECT event_type AS tbl, event_id, value,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * 2 AS c2
         |  FROM events WHERE $V AND value IS NOT NULL),
         |m AS (SELECT tbl, quantile_cont(c2, 0.5) AS med2 FROM e GROUP BY tbl),
         |d AS (
         |  SELECT e.tbl, e.event_id, e.value,
         |    abs(CAST(e.c2 AS DOUBLE) - m.med2) AS dev2
         |  FROM e JOIN m USING (tbl)),
         |md AS (SELECT tbl, quantile_cont(dev2, 0.5) AS mad2 FROM d GROUP BY tbl)
         |SELECT d.tbl AS "table", d.event_id AS log_id, d.value,
         |  d.dev2 / (CAST(1.4826 AS DOUBLE) * md.mad2) AS robust_z
         |FROM d JOIN md USING (tbl)
         |WHERE md.mad2 > CAST(0.0 AS DOUBLE)
         |  AND d.dev2 > (CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE)) * md.mad2""".stripMargin,

    // Classical additive decomposition: interior 25-row centered MA,
    // scaled detrended integers, hour-profile join-back — each double
    // one fixed tree over exact integers.
    "ts_decompose" ->
      s"""WITH e AS (
         |  SELECT event_type AS tbl, ts, event_id, value,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         |    hour(ts) AS hh
         |  FROM events WHERE $V AND value IS NOT NULL),
         |w AS (
         |  SELECT tbl, ts, event_id, value, c, hh,
         |    CAST(sum(c) OVER fr AS BIGINT) AS sw,
         |    count(c) OVER fr AS nw
         |  FROM e
         |  WINDOW fr AS (PARTITION BY tbl ORDER BY ts, event_id
         |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
         |i AS (
         |  SELECT *, 25 * c - sw AS det FROM w WHERE nw = 25),
         |p AS (
         |  SELECT tbl, hh, CAST(sum(det) AS BIGINT) AS sd, count(*) AS nh
         |  FROM i GROUP BY tbl, hh)
         |SELECT i.tbl AS "table", i.ts, i.event_id AS log_id, i.value,
         |  CAST(i.sw AS DOUBLE) / CAST(2500 AS DOUBLE) AS trend,
         |  CAST(p.sd AS DOUBLE) / (CAST(p.nh AS DOUBLE) * CAST(2500 AS DOUBLE))
         |    AS seasonal,
         |  CAST(i.det AS DOUBLE) / CAST(2500 AS DOUBLE)
         |    - CAST(p.sd AS DOUBLE) / (CAST(p.nh AS DOUBLE) * CAST(2500 AS DOUBLE))
         |    AS remainder
         |FROM i JOIN p ON p.tbl = i.tbl AND p.hh = i.hh""".stripMargin,

    // Holt double exponential smoothing: the same trailing-window left
    // fold as ts_ewma, replayed step-by-step in a RECURSIVE CTE (the
    // tok_bpe_merges unroll pattern) rather than list_reduce — DuckDB
    // v1.0.0's struct-accumulator lambda reads a MUTATED accumulator on
    // iterations after the first (the 'b' field sees the freshly
    // written 'l'), so only scalar-expression recursion replays Spark's
    // fold bit-for-bit. The l_t subtree is duplicated inside the b_t
    // update, mirroring the Spark lambda's IEEE tree exactly.
    // ACF at lags 1..4: the n²-cleared exact-integer estimator —
    // HUGEINT here mirrors Spark's DECIMAL(38,0); the single double
    // division is the only FP op.
    "ts_acf" -> {
      def d(x: String) = s"CAST($x AS HUGEINT)"
      val den = s"(${d("n")} * ${d("n")} * ${d("ss")} - ${d("n")} * ${d("s")} * ${d("s")})"
      val arms = (1 to 4).map { l =>
        val num = s"(${d("n")} * ${d("n")} * ${d(s"p$l")} - " +
          s"${d("n")} * ${d("s")} * (${d(s"a$l")} + ${d(s"b$l")}) + " +
          s"${d(s"m$l")} * ${d("s")} * ${d("s")})"
        s"""SELECT tbl AS "table", CAST($l AS BIGINT) AS lag,
           |  m$l AS n_pairs,
           |  CASE WHEN $den <> 0 AND m$l > 0
           |    THEN CAST($num AS DOUBLE) / CAST($den AS DOUBLE) END AS acf
           |FROM g""".stripMargin
      }.mkString("\nUNION ALL\n")
      val leadCols = (1 to 4).map(l => s"lead(c, $l) OVER w AS l$l").mkString(",\n    ")
      val lagAggs = (1 to 4).map(l =>
        s"count(l$l) AS m$l,\n    sum(CASE WHEN l$l IS NOT NULL THEN c END) AS a$l,\n" +
          s"    sum(l$l) AS b$l,\n    sum(c * l$l) AS p$l").mkString(",\n    ")
      s"""WITH e AS (
         |  SELECT event_type AS tbl, ts, event_id,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM events WHERE $V AND value IS NOT NULL),
         |l AS (
         |  SELECT tbl, c,
         |    $leadCols
         |  FROM e WINDOW w AS (PARTITION BY tbl ORDER BY ts, event_id)),
         |g AS (
         |  SELECT tbl, count(*) AS n, sum(c) AS s, sum(c * c) AS ss,
         |    $lagAggs
         |  FROM l GROUP BY tbl)
         |$arms""".stripMargin
    },

    "ts_holt" ->
      s"""WITH RECURSIVE v AS (
         |  SELECT event_id, user_id, ts, value,
         |    list(CAST(value AS DOUBLE)) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vals
         |  FROM events WHERE $V AND value IS NOT NULL),
         |steps AS (
         |  SELECT event_id, user_id, ts, value, vals, 1 AS j,
         |    vals[1] AS l, CAST(0.0 AS DOUBLE) AS b
         |  FROM v
         |  UNION ALL
         |  SELECT event_id, user_id, ts, value, vals, j + 1,
         |    CAST(0.3 AS DOUBLE) * vals[j + 1]
         |      + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * (l + b),
         |    CAST(0.1 AS DOUBLE)
         |      * ((CAST(0.3 AS DOUBLE) * vals[j + 1]
         |          + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * (l + b)) - l)
         |      + (CAST(1.0 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * b
         |  FROM steps WHERE j < len(vals))
         |SELECT event_id AS log_id, user_id AS rsbsa_no, ts, value,
         |  CAST(len(vals) AS BIGINT) AS n_obs,
         |  l AS level, b AS trend, l + b AS forecast
         |FROM steps WHERE j = len(vals)""".stripMargin,

    "w7_daily_share" ->
      s"""WITH d AS (
         |  SELECT event_type AS tbl,
         |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n
         |  FROM events WHERE $V GROUP BY 1, 2)
         |SELECT tbl AS "table", day, n,
         |  round(CAST(n AS DOUBLE)
         |    / CAST(sum(n) OVER (PARTITION BY day) AS DOUBLE), 4) AS share
         |FROM d""".stripMargin,

    "w6_lag_delta" ->
      s"""SELECT event_id AS log_id, user_id AS rsbsa_no, ts, value,
         |  value - lag(value) OVER w AS value_delta,
         |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS micros_since_prev
         |FROM events WHERE $V AND value IS NOT NULL
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "agg_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.9) AS p90,
        |  min(l_quantity) AS qmin,
        |  max(l_quantity) AS qmax
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // Quantile-sketch error-bound contract: exact side recomputed;
    // booleans are Spark's claim the KLL-style sketch stayed inside
    // its documented rank-error envelope.
    "agg_approx_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS exact_p50,
        |  quantile_cont(l_quantity, 0.9) AS exact_p90,
        |  true AS p50_in_envelope,
        |  true AS p90_in_envelope
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,

    // Bag fingerprint: sorted token multiset, md5 over the
    // space-rejoined bag; window count is BIGINT in both engines.
    "dedup_bag" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    md5(array_to_string(
        |      list_sort(string_split_regex(lower(text), '\s+')), ' ')) AS bag_hash
        |  FROM documents)
        |SELECT doc_id, bag_hash,
        |  count(*) OVER (PARTITION BY bag_hash) AS n_same_bag,
        |  count(*) OVER (PARTITION BY bag_hash) > 1 AS is_dup
        |FROM b""".stripMargin,

    "dedup_exact_survivors" ->
      """SELECT doc_id, text FROM documents WHERE doc_id IN (
        |  SELECT min(doc_id) FROM documents GROUP BY md5(text))""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(toks) - 3, 0) + 2),
        |      s -> concat_ws(' ', toks[s], toks[s+1], toks[s+2]))) AS shingles
        |  FROM tok),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter,
        |  round(CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)), 4) AS jaccard
        |FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5""".stripMargin,

    // Incremental near-dup screen: the dedup_ngram_jaccard computation
    // with the pair predicate sided (delta = odd doc_ids, history =
    // even) instead of a_id < b_id.
    "dedup_incremental_neardup" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(toks) - 3, 0) + 2),
        |      s -> concat_ws(' ', toks[s], toks[s+1], toks[s+2]))) AS shingles
        |  FROM tok),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh)
        |SELECT a.doc_id AS delta_id, b.doc_id AS history_id, count(*) AS inter,
        |  round(CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)), 4) AS jaccard
        |FROM ex a JOIN ex b ON a.sh = b.sh
        |  AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        |GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5""".stripMargin,

    // MinHash estimate contract: the exact side (pair set +
    // inter/jaccard) is the dedup_ngram_jaccard computation verbatim;
    // est_in_envelope is Spark's claim the k=128 signature estimate
    // landed within Hoeffding ±0.25 — pinned true here, same pattern
    // as the HLL/CMS/quantile sketch contracts.
    "dedup_minhash_est" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(toks) - 3, 0) + 2),
        |      s -> concat_ws(' ', toks[s], toks[s+1], toks[s+2]))) AS shingles
        |  FROM tok),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter,
        |  round(CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)), 4) AS jaccard,
        |  true AS est_in_envelope
        |FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5""".stripMargin,

    // Directional containment: brute-force shared-shingle group-count,
    // thresholded on |∩|/|inner| — single DOUBLE division, mirrored in
    // the Spark filter (unrounded threshold, display-only round).
    "dedup_containment" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(toks) - 3, 0) + 2),
        |      s -> concat_ws(' ', toks[s], toks[s+1], toks[s+2]))) AS shingles
        |  FROM tok),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh)
        |SELECT a.doc_id AS inner_id, b.doc_id AS outer_id, count(*) AS inter,
        |  round(CAST(count(*) AS DOUBLE) / CAST(a.n_sh AS DOUBLE), 4) AS containment
        |FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id <> b.doc_id
        |GROUP BY a.doc_id, b.doc_id, a.n_sh
        |HAVING CAST(count(*) AS DOUBLE) / CAST(a.n_sh AS DOUBLE)
        |  >= CAST(0.8 AS DOUBLE)""".stripMargin,

    // Containment pruning: survivors = docs never ≥ t-contained in
    // another (same brute pair derivation, anti-joined).
    "dedup_containment_survivors" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(toks) - 3, 0) + 2),
        |      s -> concat_ws(' ', toks[s], toks[s+1], toks[s+2]))) AS shingles
        |  FROM tok),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh),
        |contained AS (
        |  SELECT a.doc_id
        |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id <> b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / CAST(a.n_sh AS DOUBLE)
        |    >= CAST(0.8 AS DOUBLE))
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM contained)""".stripMargin,

    // Components of the near-dup pair graph, oracled by brute-force
    // recursive-CTE reachability over the same exact-Jaccard pair set
    // (component label = min reachable doc_id).
    "dedup_components" ->
      s"""WITH RECURSIVE $componentCtes
         |SELECT doc_id, component FROM comp""".stripMargin,

    // Cluster-size histogram over the same recursive-CTE components.
    "dedup_cluster_sizes" ->
      s"""WITH RECURSIVE $componentCtes,
         |sizes AS (SELECT component, count(*) AS sz FROM comp GROUP BY component)
         |SELECT sz AS cluster_size, count(*) AS n_clusters
         |FROM sizes GROUP BY sz""".stripMargin,

    // Leakage-safe split: near-duplicate CLUSTERS split as one unit —
    // the split hash keys on the cluster's canonical id (component
    // min; singletons are their own unit), so a near-dup of a train
    // doc cannot land in val. Singleton assignments coincide with
    // split_train_val by construction (same unsalted rule on the id).
    "split_leakage_safe" ->
      s"""WITH RECURSIVE $componentCtes
         |SELECT d.doc_id,
         |  coalesce(c.component, d.doc_id) AS unit,
         |  CASE WHEN substr(md5(CAST(coalesce(c.component, d.doc_id) AS VARCHAR)), 1, 2) < 'e6'
         |       THEN 'train' ELSE 'val' END AS split
         |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id""".stripMargin,

    // Decontamination: 8-gram construction mirrors the shingle kernel's
    // short-doc trim (greatest(len-8,0)+1 grams, whole text when
    // shorter); counts are distinct-gram overlaps per test doc.
    "decontaminate" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(toks) - 8, 0) + 2),
        |      s -> concat_ws(' ', toks[s], toks[s+1], toks[s+2], toks[s+3],
        |                     toks[s+4], toks[s+5], toks[s+6], toks[s+7]))) AS shingles
        |  FROM tok),
        |ex AS (SELECT doc_id, source, unnest(shingles) AS sh FROM sh),
        |tr AS (SELECT DISTINCT sh FROM ex
        |       WHERE source IN ('src0', 'src1', 'src2')),
        |te AS (SELECT doc_id, sh FROM ex
        |       WHERE source NOT IN ('src0', 'src1', 'src2'))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
        |FROM te JOIN tr USING (sh) GROUP BY doc_id""".stripMargin,

    // Exact-substring decontamination: needles = first 16 chars of the
    // deterministic eval sample, capped at 512 in doc_id order (the
    // Spark face's driver-memory bound; does not bind at fixture
    // scale); per train doc, count of distinct needles contained
    // verbatim.
    "decon_substring" ->
      """WITH nl AS (
        |  SELECT list_sort(list_distinct(list(n))) AS ns
        |  FROM (SELECT substr(text, 1, 16) AS n FROM documents
        |        WHERE source NOT IN ('src0', 'src1', 'src2')
        |          AND doc_id % 5 = 0 AND length(text) >= 16
        |        ORDER BY doc_id LIMIT 512))
        |SELECT d.doc_id,
        |  CAST(len(list_filter((SELECT ns FROM nl),
        |    n -> contains(d.text, n))) AS BIGINT) AS n_matches,
        |  len(list_filter((SELECT ns FROM nl),
        |    n -> contains(d.text, n))) > 0 AS contaminated
        |FROM documents d
        |WHERE d.source IN ('src0', 'src1', 'src2')""".stripMargin,

    // Survivors after component collapse: everything except non-min
    // members of each duplicate cluster.
    "dedup_survivors_cc" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(toks) - 3, 0) + 2),
        |      s -> concat_ws(' ', toks[s], toks[s+1], toks[s+2]))) AS shingles
        |  FROM tok),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach(id, r) AS (
        |  SELECT DISTINCT u, u FROM edges
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
        |SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id != component)""".stripMargin,

    // Corpus-prep flagship: component collapse + lang filter + 50%
    // md5 reweight + PII redaction + concat-and-chunk packing, all
    // from the already-verified per-operator oracles.
    "prepare_pretraining" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(toks) - 3, 0) + 2),
        |      s -> concat_ws(' ', toks[s], toks[s+1], toks[s+2]))) AS shingles
        |  FROM tok),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach(id, r) AS (
        |  SELECT DISTINCT u, u FROM edges
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
        |kept AS (
        |  SELECT d.doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(d.text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |      '\b\d{3}[- .]\d{3}[- .]\d{4}\b', '<PHONE>', 'g'),
        |      '\+\d{7,15}\b', '<PHONE>', 'g') AS clean_text
        |  FROM documents d
        |  WHERE d.lang = 'en'
        |    AND d.doc_id NOT IN (SELECT id FROM comp WHERE id != component)
        |    AND substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < '80000000'),
        |toks2 AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(clean_text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM kept),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS t_start
        |  FROM toks2)
        |SELECT doc_id, n_tokens, t_start,
        |  t_start // 2048 AS first_chunk,
        |  (t_start + n_tokens - 1) // 2048 AS last_chunk,
        |  t_start % 2048 AS chunk_offset
        |FROM c""".stripMargin,

    // MinHash+LSH is sketch-based, but at k=128/32 bands the miss
    // probability for the fixtures' duplicate pairs (all Jaccard ≥ 0.8)
    // is ≤ 5e-8 — the verified output equals the exact-Jaccard pair set,
    // so it shares that oracle (minus the inter count).
    "dedup_minhash_lsh" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(toks) - 3, 0) + 2),
        |      s -> concat_ws(' ', toks[s], toks[s+1], toks[s+2]))) AS shingles
        |  FROM tok),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)), 4) AS jaccard
        |FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5""".stripMargin,

    // Exact embedding-cosine near-dup pairs: same quantized-integer
    // dot/norm arithmetic as sim_cosine_topk; threshold on the
    // unrounded cosine, rounding display-only. (dedup_cosine_lsh is
    // recall-bounded by design → rows-only, tested vs this baseline.)
    "dedup_cosine_pairs" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM q)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(CAST(list_sum(list_transform(range(1, 65),
        |      i -> a.qv[i] * b.qv[i])) AS DOUBLE)
        |    / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))), 6) AS cos
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE CAST(list_sum(list_transform(range(1, 65),
        |      i -> a.qv[i] * b.qv[i])) AS DOUBLE)
        |    / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) >= 0.4""".stripMargin,

    // Components over the exact-cosine pair graph (same recursive-CTE
    // reachability as dedup_components, embedding side).
    "dedup_cosine_components" ->
      """WITH RECURSIVE q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM q),
        |pairs AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id
        |  WHERE CAST(list_sum(list_transform(range(1, 65),
        |        i -> a.qv[i] * b.qv[i])) AS DOUBLE)
        |      / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) >= 0.4),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach(id, r) AS (
        |  SELECT DISTINCT u, u FROM edges
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r)
        |SELECT id AS vec_id, min(r) AS component FROM reach GROUP BY id""".stripMargin,

    // K-means assignment with the deterministic seed centroid set (the
    // 8 lowest vec_ids): argmin over -2·q·c + |c|² (ties to the lowest
    // cell), true squared L2 = nsq + d. All-integer arithmetic — exact
    // in both engines.
    "emb_kmeans_assign" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM q),
        |cent AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
        |    qv AS cv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS cnorm
        |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 8)),
        |scored AS (
        |  SELECT n.vec_id, n.nsq, c.cell,
        |    -2 * CAST(list_sum(list_transform(range(1, 65),
        |      i -> n.qv[i] * c.cv[i])) AS BIGINT) + c.cnorm AS d
        |  FROM n CROSS JOIN cent c),
        |best AS (
        |  SELECT vec_id, nsq, cell, d,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |  FROM scored)
        |SELECT vec_id, cell, nsq + d AS l2sq FROM best WHERE rn = 1""".stripMargin,

    // SemDeDup: same seed-centroid assignment, near-dup pairs only
    // WITHIN a cell (exact quantized cosine on the unrounded value),
    // then the recursive-CTE component collapse.
    "dedup_semantic" ->
      """WITH RECURSIVE q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM q),
        |cent AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
        |    qv AS cv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS cnorm
        |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 8)),
        |scored AS (
        |  SELECT n.vec_id, n.qv, n.nsq, c.cell,
        |    -2 * CAST(list_sum(list_transform(range(1, 65),
        |      i -> n.qv[i] * c.cv[i])) AS BIGINT) + c.cnorm AS d
        |  FROM n CROSS JOIN cent c),
        |ranked AS (
        |  SELECT vec_id, qv, nsq, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |  FROM scored),
        |assign AS (SELECT vec_id, qv, nsq, cell FROM ranked WHERE rn = 1),
        |pairs AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM assign a JOIN assign b
        |    ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE CAST(list_sum(list_transform(range(1, 65),
        |        i -> a.qv[i] * b.qv[i])) AS DOUBLE)
        |      / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) >= 0.4),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach(id, r) AS (
        |  SELECT DISTINCT u, u FROM edges
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
        |SELECT c.id AS vec_id, a.cell, c.component
        |FROM comp c JOIN assign a ON a.vec_id = c.id""".stripMargin,

    // CLIP-gate: image docs (doc_id % 3 = 0) joined to their quantized
    // embedding, md5-salted into 16 buckets, bucket-successor negative
    // (wrapping; size-1 buckets self-pair), image tower = adjacent-pair
    // swap of the caption vector (1-based: odd i ↔ i+1), cosines the
    // same fixed tree as BRUTE_TOPK — mirrors Multimodal.alignmentGate.
    "mm_align_gate" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM q),
        |img AS (
        |  SELECT d.doc_id AS media_id, n.qv, n.nsq,
        |    CAST(CAST(concat('0x', substr(md5(concat('mm:',
        |      CAST(d.doc_id AS VARCHAR))), 1, 16)) AS UBIGINT) % 16
        |      AS BIGINT) AS b
        |  FROM documents d JOIN n ON n.vec_id = d.doc_id
        |  WHERE d.doc_id % 3 = 0),
        |p AS (
        |  SELECT media_id, b, qv, nsq,
        |    COALESCE(lead(media_id) OVER (PARTITION BY b ORDER BY media_id),
        |      min(media_id) OVER (PARTITION BY b)) AS neg_id,
        |    list_transform(range(1, len(qv) + 1),
        |      i -> qv[CASE WHEN i % 2 = 1 THEN i + 1 ELSE i - 1 END]) AS pv
        |  FROM img),
        |s AS (
        |  SELECT p.media_id, p.b, p.neg_id,
        |    CAST(CAST(list_sum(list_transform(range(1, len(p.qv) + 1),
        |        i -> p.pv[i] * p.qv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(p.nsq AS DOUBLE)) * sqrt(CAST(p.nsq AS DOUBLE)))
        |      AS cos_true,
        |    CAST(CAST(list_sum(list_transform(range(1, len(p.qv) + 1),
        |        i -> p.pv[i] * g.qv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(p.nsq AS DOUBLE)) * sqrt(CAST(g.nsq AS DOUBLE)))
        |      AS cos_neg
        |  FROM p JOIN img g ON g.media_id = p.neg_id)
        |SELECT media_id, b, neg_id,
        |  round(cos_true, 6) AS cos_true, round(cos_neg, 6) AS cos_neg,
        |  round(cos_true - cos_neg, 6) AS margin,
        |  cos_true >= CAST(0.1 AS DOUBLE) AS kept
        |FROM s""".stripMargin,

    "sim_cosine_topk" -> BRUTE_TOPK,
    "sample_kcenter" -> KCENTER,

    // Contrastive-set composition: the shared k-center CTE chain picks
    // the anchors, then the semi-hard mining logic (same trees as
    // sim_hard_negatives) runs with those anchors as the probe set.
    "sim_contrastive_set" ->
      s"""WITH $KCENTER_CTES,
         |anchors AS (SELECT rank AS anchor_rank, vec_id AS qid FROM kc),
         |probes AS (
         |  SELECT a.anchor_rank, a.qid, qq.qv AS pv, qq.nsq AS pn,
         |    el.label AS qlabel
         |  FROM anchors a
         |  JOIN q qq ON qq.vec_id = a.qid
         |  JOIN embeddings el ON el.vec_id = a.qid),
         |scored AS (
         |  SELECT p.anchor_rank, p.qid, p.qlabel, c.vec_id AS nid,
         |    ce.label,
         |    CAST(CAST(list_sum(list_transform(range(1, len(c.qv) + 1),
         |        i -> c.qv[i] * p.pv[i])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(c.nsq AS DOUBLE)) * sqrt(CAST(p.pn AS DOUBLE)))
         |      AS cos
         |  FROM q c
         |  JOIN embeddings ce ON ce.vec_id = c.vec_id
         |  CROSS JOIN probes p
         |  WHERE c.vec_id != p.qid),
         |pos AS (
         |  SELECT qid, min(cos) AS pos_cos FROM scored
         |  WHERE label = qlabel GROUP BY qid)
         |SELECT anchor_rank, qid, rank, nid, round(cos, 6) AS cos,
         |  round(pos_cos, 6) AS pos_cos FROM (
         |  SELECT s.anchor_rank, s.qid, s.nid, s.cos, p.pos_cos,
         |    row_number() OVER (PARTITION BY s.qid
         |      ORDER BY s.cos DESC, s.nid) AS rank
         |  FROM scored s JOIN pos p ON s.qid = p.qid
         |  WHERE s.label != s.qlabel AND s.cos < p.pos_cos)
         |WHERE rank <= 5""".stripMargin,

    // Semi-hard negative mining (FaceNet §3.3): brute scored pairs as
    // BRUTE_TOPK (exact integer dots — bit-identical doubles), the
    // anchor's positive radius is min cosine over same-label rows, and
    // the mined set is other-label rows STRICTLY below that radius,
    // ranked closest-first. The WHERE runs before the window (SQL
    // semantics) exactly as the engine filters before row_number.
    "sim_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, label, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM q),
        |probes AS (
        |  SELECT vec_id AS qid, label AS qlabel, qv AS pv, nsq AS pn FROM n
        |  WHERE vec_id IN (0, 1, 2, 3, 4)),
        |scored AS (
        |  SELECT p.qid, p.qlabel, c.vec_id AS nid, c.label,
        |    CAST(CAST(list_sum(list_transform(range(1, len(c.qv) + 1),
        |        i -> c.qv[i] * p.pv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(c.nsq AS DOUBLE)) * sqrt(CAST(p.pn AS DOUBLE))) AS cos
        |  FROM n c, probes p WHERE c.vec_id != p.qid),
        |pos AS (
        |  SELECT qid, min(cos) AS pos_cos FROM scored
        |  WHERE label = qlabel GROUP BY qid)
        |SELECT qid, rank, nid, round(cos, 6) AS cos,
        |  round(pos_cos, 6) AS pos_cos FROM (
        |  SELECT s.qid, s.nid, s.cos, p.pos_cos,
        |    row_number() OVER (PARTITION BY s.qid
        |      ORDER BY s.cos DESC, s.nid) AS rank
        |  FROM scored s JOIN pos p ON s.qid = p.qid
        |  WHERE s.label != s.qlabel AND s.cos < p.pos_cos)
        |WHERE rank <= 10""".stripMargin,
    "sim_lsh_topk" -> BRUTE_TOPK,
    "sim_ivf_topk" -> BRUTE_TOPK,
    // Registered at candidates ≥ corpus (screening passes everything)
    // → provably brute-equal; partial budgets are spec-tested.
    "sim_rerank_topk" -> BRUTE_TOPK,

    // MMR diverse re-rank: 10 greedy rounds unrolled — relevance and
    // pairwise similarity are exact integer dots of the quantized
    // vectors, scores the exact integers 70·rel − 30·maxSim, ties by
    // vec_id; replays Similarity.mmrRerank's trajectory bit-for-bit.
    "sim_mmr_rerank" -> {
      def round(r: Int): String = {
        val prev = s"sel${r - 1}"
        s"""c$r AS MATERIALIZED (
           |  SELECT p.vec_id, p.rel, CAST(max(s.s) AS BIGINT) AS ms
           |  FROM pq p JOIN sims s ON s.va = p.vec_id
           |    AND s.vb IN (SELECT vec_id FROM $prev)
           |  WHERE p.vec_id NOT IN (SELECT vec_id FROM $prev)
           |  GROUP BY p.vec_id, p.rel),
           |p$r AS (
           |  SELECT $r AS rank, vec_id, rel, ms AS max_sim,
           |    70 * rel - 30 * ms AS mmr
           |  FROM c$r ORDER BY 70 * rel - 30 * ms DESC, vec_id LIMIT 1),
           |sel$r AS MATERIALIZED (SELECT * FROM $prev UNION ALL SELECT * FROM p$r)""".stripMargin
      }
      s"""WITH q AS (
         |  SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |p0 AS (SELECT qv AS pv FROM q WHERE vec_id = 0),
         |rl AS (
         |  SELECT c.vec_id, c.qv,
         |    CAST(list_sum(list_transform(range(1, len(c.qv) + 1),
         |      i -> c.qv[i] * p.pv[i])) AS BIGINT) AS rel
         |  FROM q c, p0 p WHERE c.vec_id <> 0),
         |pq AS MATERIALIZED (SELECT vec_id, qv, rel FROM rl
         |  ORDER BY rel DESC, vec_id LIMIT 50),
         |sims AS MATERIALIZED (
         |  SELECT a.vec_id AS va, b.vec_id AS vb,
         |    CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
         |      i -> a.qv[i] * b.qv[i])) AS BIGINT) AS s
         |  FROM pq a JOIN pq b ON a.vec_id <> b.vec_id),
         |sel1 AS MATERIALIZED (
         |  SELECT 1 AS rank, vec_id, rel, CAST(NULL AS BIGINT) AS max_sim,
         |    70 * rel AS mmr
         |  FROM pq ORDER BY rel DESC, vec_id LIMIT 1),
         |${(2 to 10).map(round).mkString(",\n")}
         |SELECT rank, vec_id, rel, max_sim, mmr FROM sel10""".stripMargin
    },

    // PQ ADC top-k over the shared PQ_CTES — `adist` is an exact
    // integer, no FP anywhere.
    "sim_pq_topk" ->
      s"""WITH $PQ_CTES,
        |ad AS (
        |  SELECT dt.qid, e.vec_id AS nid, CAST(sum(dt.d) AS BIGINT) AS adist
        |  FROM enc e JOIN dt ON dt.j = e.j AND dt.c = e.c
        |  WHERE e.vec_id <> dt.qid
        |  GROUP BY dt.qid, e.vec_id),
        |r AS (
        |  SELECT qid, nid, adist,
        |    row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rank
        |  FROM ad)
        |SELECT qid, rank, nid, adist FROM r WHERE rank <= 10""".stripMargin,

    // LSH top-k at a PARTIAL probe (own bucket + two single-bit
    // flips): the md5-portable plane weights rebuild the 8-bit
    // signature, probes, candidates and exact-cosine ranking — the
    // approximation itself is certified. Queries can return < k rows.
    "sim_lsh_partial" ->
      """WITH w AS (
        |  SELECT p.p,
        |    list((CAST(CAST(concat('0x', substr(md5(concat(p.p, '_', i.i)), 1, 8)) AS UBIGINT) % 2000 AS BIGINT) - 1000) / 1000.0
        |      ORDER BY i.i) AS wl
        |  FROM range(0, 8) p(p), range(0, 64) i(i) GROUP BY p.p),
        |dots AS (
        |  SELECT e.vec_id, w.p,
        |    list_sum(list_transform(range(1, 65),
        |      i -> e.embedding[i] * w.wl[i])) AS dot
        |  FROM embeddings e, w),
        |sig AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN dot > 0 THEN 1 << CAST(p AS INT) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM dots GROUP BY vec_id),
        |q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM q),
        |probes AS (
        |  SELECT s.vec_id AS qid, unnest([s.bucket, xor(s.bucket, 1), xor(s.bucket, 2)]) AS bucket
        |  FROM sig s WHERE s.vec_id IN (0, 1, 2, 3, 4)),
        |scored AS (
        |  SELECT DISTINCT p.qid, c.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(range(1, 65),
        |        i -> cn.qv[i] * pn.qv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(cn.nsq AS DOUBLE)) * sqrt(CAST(pn.nsq AS DOUBLE))) AS cos
        |  FROM probes p
        |  JOIN sig c ON c.bucket = p.bucket
        |  JOIN n cn ON cn.vec_id = c.vec_id
        |  JOIN n pn ON pn.vec_id = p.qid
        |  WHERE c.vec_id != p.qid)
        |SELECT qid, rank, nid, round(cos, 6) AS cos FROM (
        |  SELECT qid, nid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |  FROM scored)
        |WHERE rank <= 10""".stripMargin,

    // ANN recall contract: rebuild the 8-plane signatures, the ranked
    // probe list (own bucket = rank 1, flip of bit b = rank b+2), each
    // candidate's minprobe, the per-budget top-10, the brute-force
    // ground truth, and the per-(budget, query) hit counts — the
    // whole accuracy/cost frontier replayed in SQL.
    "sim_recall_report" ->
      """WITH w AS (
        |  SELECT p.p,
        |    list((CAST(CAST(concat('0x', substr(md5(concat(p.p, '_', i.i)), 1, 8)) AS UBIGINT) % 2000 AS BIGINT) - 1000) / 1000.0
        |      ORDER BY i.i) AS wl
        |  FROM range(0, 8) p(p), range(0, 64) i(i) GROUP BY p.p),
        |dots AS (
        |  SELECT e.vec_id, w.p,
        |    list_sum(list_transform(range(1, 65),
        |      i -> e.embedding[i] * w.wl[i])) AS dot
        |  FROM embeddings e, w),
        |sig AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN dot > 0 THEN 1 << CAST(p AS INT) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM dots GROUP BY vec_id),
        |q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM q),
        |pr AS (
        |  SELECT vec_id AS qid, CAST(u['prank'] AS BIGINT) AS prank,
        |    CAST(u['bk'] AS BIGINT) AS bucket
        |  FROM (
        |    SELECT s.vec_id, unnest(list_transform(range(0, 8),
        |      j -> {'prank': j + 1,
        |            'bk': CASE WHEN j = 0 THEN s.bucket
        |                  ELSE xor(s.bucket, 1 << CAST(j - 1 AS INT)) END})) AS u
        |    FROM sig s WHERE s.vec_id IN (0, 1, 2, 3, 4))),
        |cand AS (
        |  SELECT p.qid, c.vec_id AS nid, min(p.prank) AS minprobe,
        |    max(CAST(CAST(list_sum(list_transform(range(1, 65),
        |        i -> cn.qv[i] * pn.qv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(cn.nsq AS DOUBLE)) * sqrt(CAST(pn.nsq AS DOUBLE)))) AS cos
        |  FROM pr p
        |  JOIN sig c ON c.bucket = p.bucket
        |  JOIN n cn ON cn.vec_id = c.vec_id
        |  JOIN n pn ON pn.vec_id = p.qid
        |  WHERE c.vec_id != p.qid
        |  GROUP BY p.qid, c.vec_id),
        |bud AS (SELECT CAST(b AS BIGINT) AS probes FROM (VALUES (1), (2), (4), (8)) v(b)),
        |rk AS (
        |  SELECT b.probes, c.qid, c.nid,
        |    row_number() OVER (PARTITION BY b.probes, c.qid
        |      ORDER BY c.cos DESC, c.nid) AS rnk
        |  FROM cand c JOIN bud b ON b.probes >= c.minprobe),
        |sel AS (SELECT probes, qid, nid FROM rk WHERE rnk <= 10),
        |bscored AS (
        |  SELECT p.qid, c.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(range(1, len(c.qv) + 1),
        |        i -> c.qv[i] * p.pv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(c.nsq AS DOUBLE)) * sqrt(CAST(p.pn AS DOUBLE))) AS cos
        |  FROM n c, (SELECT vec_id AS qid, qv AS pv, nsq AS pn FROM n
        |             WHERE vec_id IN (0, 1, 2, 3, 4)) p
        |  WHERE c.vec_id != p.qid),
        |truth AS (
        |  SELECT qid, nid FROM (
        |    SELECT qid, nid,
        |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
        |    FROM bscored)
        |  WHERE rnk <= 10),
        |hits AS (
        |  SELECT s.probes, s.qid, CAST(count(*) AS BIGINT) AS nh
        |  FROM sel s JOIN truth t ON t.qid = s.qid AND t.nid = s.nid
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT b.probes, qq.qid FROM bud b
        |  CROSS JOIN (SELECT DISTINCT vec_id AS qid FROM embeddings
        |              WHERE vec_id IN (0, 1, 2, 3, 4)) qq)
        |SELECT g.probes, g.qid, coalesce(h.nh, CAST(0 AS BIGINT)) AS n_hit,
        |  round(CAST(coalesce(h.nh, 0) AS DOUBLE) / 10, 6) AS recall
        |FROM grid g LEFT JOIN hits h ON h.probes = g.probes AND h.qid = g.qid""".stripMargin,

    // PQ reconstruction error over the shared PQ_CTES: chosen-codeword
    // squared deviation per subspace, summed per vector, bucketed.
    "sim_pq_error" ->
      s"""WITH $PQ_CTES,
        |perr AS (
        |  SELECT e.vec_id,
        |    CAST(sum(CAST(list_sum(list_transform(range(1, 9),
        |      i -> (s.s[i] - w.w[i]) * (s.s[i] - w.w[i]))) AS BIGINT)) AS BIGINT) AS err
        |  FROM enc e
        |  JOIN sub s ON s.vec_id = e.vec_id AND s.j = e.j
        |  JOIN cwn w ON w.j = e.j AND w.c = e.c
        |  GROUP BY e.vec_id)
        |SELECT err // 100000 AS err_bucket, CAST(count(*) AS BIGINT) AS n_vectors,
        |  min(err) AS min_err, max(err) AS max_err
        |FROM perr GROUP BY 1""".stripMargin,

    // SQ8 reconstruction-error distribution: same trained ranges,
    // codes, and midpoint reconstruction as sim_sq_topk, error against
    // the vector ITSELF, bucketed by err div 10.
    "sim_sq_error" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |st AS (
        |  SELECT CAST(r.d AS INT) AS d,
        |    min(qv[CAST(r.d AS INT) + 1]) AS lo,
        |    max(qv[CAST(r.d AS INT) + 1]) - min(qv[CAST(r.d AS INT) + 1]) + 1 AS w
        |  FROM q CROSS JOIN range(0, 64) r(d)
        |  GROUP BY 1),
        |enc AS (
        |  SELECT q.vec_id, s.d, s.lo, s.w, qv[s.d + 1] AS v,
        |    greatest(0, least(255, ((qv[s.d + 1] - s.lo) * 256) // s.w)) AS code
        |  FROM q CROSS JOIN st s),
        |pererr AS (
        |  SELECT vec_id,
        |    CAST(sum((v - (lo + ((2 * code + 1) * w) // 512))
        |           * (v - (lo + ((2 * code + 1) * w) // 512))) AS BIGINT) AS err
        |  FROM enc GROUP BY vec_id)
        |SELECT err // 10 AS err_bucket, CAST(count(*) AS BIGINT) AS n_vectors,
        |  min(err) AS min_err, max(err) AS max_err
        |FROM pererr GROUP BY 1""".stripMargin,

    // IVF index manifest: seed-cell assignment + per-cell count,
    // md5-xor id checksum (shard_manifest convention) and exact mean
    // quantized norm (one integer-sum division).
    "sim_ivf_manifest" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM q),
        |cseed AS (
        |  SELECT qv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 8)),
        |cseedn AS (
        |  SELECT cell, qv AS cv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS cn
        |  FROM cseed),
        |cdist AS (
        |  SELECT q.vec_id, s.cell,
        |    s.cn - 2 * CAST(list_sum(list_transform(range(1, 65),
        |      i -> q.qv[i] * s.cv[i])) AS BIGINT) AS d
        |  FROM q CROSS JOIN cseedn s),
        |asg AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |    FROM cdist) WHERE rn = 1)
        |SELECT CAST(a.cell AS BIGINT) AS cell,
        |  CAST(count(*) AS BIGINT) AS n_vectors,
        |  bit_xor(CAST(CAST(concat('0x', substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)) AS id_checksum,
        |  round(CAST(sum(nn.nsq) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_nsq
        |FROM asg a JOIN n nn ON nn.vec_id = a.vec_id
        |GROUP BY a.cell""".stripMargin,

    // IVF recall contract: seed-cell assignment + full per-query cell
    // ranking rebuilt exactly; a neighbor's probe rank is its cell's
    // rank, budget membership = crank <= nprobe; per-budget top-10 vs
    // the brute ground truth.
    "sim_recall_report_ivf" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM q),
        |cseed AS (
        |  SELECT qv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 8)),
        |cseedn AS (
        |  SELECT cell, qv AS cv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS cn
        |  FROM cseed),
        |cdist AS (
        |  SELECT q.vec_id, s.cell,
        |    s.cn - 2 * CAST(list_sum(list_transform(range(1, 65),
        |      i -> q.qv[i] * s.cv[i])) AS BIGINT) AS d
        |  FROM q CROSS JOIN cseedn s),
        |cellasg AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |    FROM cdist) WHERE rn = 1),
        |prnk AS (
        |  SELECT vec_id AS qid, cell, CAST(rn AS BIGINT) AS crank FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |    FROM cdist WHERE vec_id IN (0, 1, 2, 3, 4))),
        |cand AS (
        |  SELECT p.qid, c.vec_id AS nid, p.crank,
        |    CAST(CAST(list_sum(list_transform(range(1, 65),
        |        i -> cn2.qv[i] * pn.qv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(cn2.nsq AS DOUBLE)) * sqrt(CAST(pn.nsq AS DOUBLE))) AS cos
        |  FROM prnk p
        |  JOIN cellasg c ON c.cell = p.cell
        |  JOIN n cn2 ON cn2.vec_id = c.vec_id
        |  JOIN n pn ON pn.vec_id = p.qid
        |  WHERE c.vec_id != p.qid),
        |bud AS (SELECT CAST(b AS BIGINT) AS nprobe FROM (VALUES (1), (2), (4), (8)) v(b)),
        |rk AS (
        |  SELECT b.nprobe, c.qid, c.nid,
        |    row_number() OVER (PARTITION BY b.nprobe, c.qid
        |      ORDER BY c.cos DESC, c.nid) AS rnk
        |  FROM cand c JOIN bud b ON b.nprobe >= c.crank),
        |sel AS (SELECT nprobe, qid, nid FROM rk WHERE rnk <= 10),
        |bscored AS (
        |  SELECT p.qid, c.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(range(1, len(c.qv) + 1),
        |        i -> c.qv[i] * p.pv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(c.nsq AS DOUBLE)) * sqrt(CAST(p.pn AS DOUBLE))) AS cos
        |  FROM n c, (SELECT vec_id AS qid, qv AS pv, nsq AS pn FROM n
        |             WHERE vec_id IN (0, 1, 2, 3, 4)) p
        |  WHERE c.vec_id != p.qid),
        |truth AS (
        |  SELECT qid, nid FROM (
        |    SELECT qid, nid,
        |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
        |    FROM bscored)
        |  WHERE rnk <= 10),
        |hits AS (
        |  SELECT s.nprobe, s.qid, CAST(count(*) AS BIGINT) AS nh
        |  FROM sel s JOIN truth t ON t.qid = s.qid AND t.nid = s.nid
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT b.nprobe, qq.qid FROM bud b
        |  CROSS JOIN (SELECT DISTINCT vec_id AS qid FROM embeddings
        |              WHERE vec_id IN (0, 1, 2, 3, 4)) qq)
        |SELECT g.nprobe, g.qid, coalesce(h.nh, CAST(0 AS BIGINT)) AS n_hit,
        |  round(CAST(coalesce(h.nh, 0) AS DOUBLE) / 10, 6) AS recall
        |FROM grid g LEFT JOIN hits h ON h.nprobe = g.nprobe AND h.qid = g.qid""".stripMargin,

    // PCA first component: exact-integer scatter moments (n·G − S·Sᵀ),
    // then the ENTIRE power-iteration trajectory (20 rounds, 0.0-seeded
    // ascending left folds, matvec duplicated inside the norm exactly
    // as the driver recomputes nothing) replayed in a recursive CTE;
    // projection and mean-correction use the same fold convention.
    "emb_pca1" ->
      s"""WITH RECURSIVE $PCA_CTES
        |SELECT q.vec_id,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(range(1, 65),
        |      i -> CAST(q.qv[i] AS DOUBLE) * vf.v[i])), (a, b) -> a + b)
        |    - c0.c AS pc1
        |FROM q CROSS JOIN vfin vf CROSS JOIN c0""".stripMargin,

    // All-but-the-top residuals: the PCA prelude plus a per-row pc1
    // CTE, then per-dim (q_i − S_i/n) − pc1·v_i — each term the same
    // division/product the Spark literals carry.
    "emb_abtt" ->
      s"""WITH RECURSIVE $PCA_CTES,
        |proj AS (
        |  SELECT q.vec_id, q.qv,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, 65),
        |        i -> CAST(q.qv[i] AS DOUBLE) * vf.v[i])), (a, b) -> a + b)
        |      - c0.c AS pc1
        |  FROM q CROSS JOIN vfin vf CROSS JOIN c0)
        |SELECT vec_id, CAST(u.d AS BIGINT) AS dim, u.r AS resid FROM (
        |  SELECT p.vec_id,
        |    unnest(list_transform(range(1, 65), i -> {'d': i - 1,
        |      'r': (CAST(p.qv[i] AS DOUBLE)
        |              - CAST(sl.sv[i] AS DOUBLE) / CAST(nn.n AS DOUBLE))
        |            - p.pc1 * vf2.v[i]})) AS u
        |  FROM proj p CROSS JOIN sl CROSS JOIN nn CROSS JOIN vfin vf2)""".stripMargin,

    // Exact MIPS: rank by the raw integer dot product (BRUTE_TOPK's
    // shape minus the cosine normalization).
    "sim_mips_topk" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |probes AS (SELECT vec_id AS qid, qv AS pv FROM q
        |           WHERE vec_id IN (0, 1, 2, 3, 4)),
        |scored AS (
        |  SELECT p.qid, c.vec_id AS nid,
        |    CAST(list_sum(list_transform(range(1, len(c.qv) + 1),
        |        i -> c.qv[i] * p.pv[i])) AS BIGINT) AS dot
        |  FROM q c, probes p WHERE c.vec_id != p.qid)
        |SELECT qid, rank, nid, dot FROM (
        |  SELECT qid, nid, dot,
        |    row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rank
        |  FROM scored)
        |WHERE rank <= 10""".stripMargin,

    // MIPS via norm augmentation + seed-centroid IVF at a partial
    // probe (2 of 8): corpus vectors append floor(sqrt(max_nsq - nsq)),
    // cells are Voronoi regions of the AUGMENTED vectors, queries
    // probe through the zero pad (prefix dot, full centroid norm),
    // candidates score by the exact integer dot — every stage integer
    // or correctly-rounded sqrt/floor, fully replayed.
    "sim_mips_ivf" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM q),
        |m AS (SELECT max(nsq) AS m2 FROM n),
        |aug AS (
        |  SELECT n.vec_id, n.qv,
        |    list_append(n.qv,
        |      CAST(floor(sqrt(CAST(m.m2 - n.nsq AS DOUBLE))) AS BIGINT)) AS qa
        |  FROM n CROSS JOIN m),
        |cseed AS (
        |  SELECT qa AS cv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM (SELECT vec_id, qa FROM aug ORDER BY vec_id LIMIT 8)),
        |cseedn AS (
        |  SELECT cell, cv,
        |    CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn
        |  FROM cseed),
        |cdist AS (
        |  SELECT a.vec_id, s.cell,
        |    s.cn - 2 * CAST(list_sum(list_transform(range(1, len(a.qa) + 1),
        |      i -> a.qa[i] * s.cv[i])) AS BIGINT) AS d
        |  FROM aug a CROSS JOIN cseedn s),
        |cellasg AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |    FROM cdist) WHERE rn = 1),
        |qdist AS (
        |  SELECT nq.vec_id, s.cell,
        |    s.cn - 2 * CAST(list_sum(list_transform(range(1, len(nq.qv) + 1),
        |      i -> nq.qv[i] * s.cv[i])) AS BIGINT) AS d
        |  FROM (SELECT vec_id, qv FROM q WHERE vec_id IN (0, 1, 2, 3, 4)) nq
        |  CROSS JOIN cseedn s),
        |probes AS (
        |  SELECT vec_id AS qid, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |    FROM qdist) WHERE rn <= 2),
        |scored AS (
        |  SELECT p.qid, c.vec_id AS nid,
        |    CAST(list_sum(list_transform(range(1, len(c.qv) + 1),
        |        i -> c.qv[i] * pq.qv[i])) AS BIGINT) AS dot
        |  FROM probes p
        |  JOIN cellasg ca ON ca.cell = p.cell
        |  JOIN q c ON c.vec_id = ca.vec_id
        |  JOIN q pq ON pq.vec_id = p.qid
        |  WHERE c.vec_id != p.qid)
        |SELECT qid, rank, nid, dot FROM (
        |  SELECT qid, nid, dot,
        |    row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rank
        |  FROM scored)
        |WHERE rank <= 10""".stripMargin,

    // MIPS recall contract: the sim_mips_ivf CTEs with the full query
    // cell ranking (crank), the budget grid of sim_recall_report_ivf,
    // and exact-dot truth — every arm integer, fully replayed.
    "sim_mips_recall" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM q),
        |m AS (SELECT max(nsq) AS m2 FROM n),
        |aug AS (
        |  SELECT n.vec_id, n.qv,
        |    list_append(n.qv,
        |      CAST(floor(sqrt(CAST(m.m2 - n.nsq AS DOUBLE))) AS BIGINT)) AS qa
        |  FROM n CROSS JOIN m),
        |cseed AS (
        |  SELECT qa AS cv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM (SELECT vec_id, qa FROM aug ORDER BY vec_id LIMIT 8)),
        |cseedn AS (
        |  SELECT cell, cv,
        |    CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn
        |  FROM cseed),
        |cdist AS (
        |  SELECT a.vec_id, s.cell,
        |    s.cn - 2 * CAST(list_sum(list_transform(range(1, len(a.qa) + 1),
        |      i -> a.qa[i] * s.cv[i])) AS BIGINT) AS d
        |  FROM aug a CROSS JOIN cseedn s),
        |cellasg AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |    FROM cdist) WHERE rn = 1),
        |qdist AS (
        |  SELECT nq.vec_id, s.cell,
        |    s.cn - 2 * CAST(list_sum(list_transform(range(1, len(nq.qv) + 1),
        |      i -> nq.qv[i] * s.cv[i])) AS BIGINT) AS d
        |  FROM (SELECT vec_id, qv FROM q WHERE vec_id IN (0, 1, 2, 3, 4)) nq
        |  CROSS JOIN cseedn s),
        |prnk AS (
        |  SELECT vec_id AS qid, cell, CAST(rn AS BIGINT) AS crank FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |    FROM qdist)),
        |cand AS (
        |  SELECT p.qid, c.vec_id AS nid, p.crank,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> cn2.qv[i] * pq.qv[i])) AS BIGINT) AS dot
        |  FROM prnk p
        |  JOIN cellasg c ON c.cell = p.cell
        |  JOIN q cn2 ON cn2.vec_id = c.vec_id
        |  JOIN q pq ON pq.vec_id = p.qid
        |  WHERE c.vec_id != p.qid),
        |bud AS (SELECT CAST(b AS BIGINT) AS nprobe FROM (VALUES (1), (2), (4), (8)) v(b)),
        |rk AS (
        |  SELECT b.nprobe, c.qid, c.nid,
        |    row_number() OVER (PARTITION BY b.nprobe, c.qid
        |      ORDER BY c.dot DESC, c.nid) AS rnk
        |  FROM cand c JOIN bud b ON b.nprobe >= c.crank),
        |sel AS (SELECT nprobe, qid, nid FROM rk WHERE rnk <= 10),
        |bscored AS (
        |  SELECT p.qid, c.vec_id AS nid,
        |    CAST(list_sum(list_transform(range(1, len(c.qv) + 1),
        |      i -> c.qv[i] * p.pv[i])) AS BIGINT) AS dot
        |  FROM q c, (SELECT vec_id AS qid, qv AS pv FROM q
        |             WHERE vec_id IN (0, 1, 2, 3, 4)) p
        |  WHERE c.vec_id != p.qid),
        |truth AS (
        |  SELECT qid, nid FROM (
        |    SELECT qid, nid,
        |      row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rnk
        |    FROM bscored) WHERE rnk <= 10),
        |hits AS (
        |  SELECT s.nprobe, s.qid, CAST(count(*) AS BIGINT) AS nh
        |  FROM sel s JOIN truth t ON t.qid = s.qid AND t.nid = s.nid
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT b.nprobe, qq.qid FROM bud b
        |  CROSS JOIN (SELECT DISTINCT vec_id AS qid FROM embeddings
        |              WHERE vec_id IN (0, 1, 2, 3, 4)) qq)
        |SELECT g.nprobe, g.qid, coalesce(h.nh, CAST(0 AS BIGINT)) AS n_hit,
        |  round(CAST(coalesce(h.nh, 0) AS DOUBLE) / 10, 6) AS recall
        |FROM grid g LEFT JOIN hits h ON h.nprobe = g.nprobe AND h.qid = g.qid""".stripMargin,

    // IVF-flat at a PARTIAL probe (2 of 8 seed cells): assignment and
    // probe ranking exact-integer, within-cell scoring the exact
    // quantized cosine — the approximation itself is oracle-certified
    // (the sim_ivfpq_topk convention on the flat path).
    "sim_ivf_partial" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM q),
        |cseed AS (
        |  SELECT qv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 8)),
        |cseedn AS (
        |  SELECT cell, qv AS cv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS cn
        |  FROM cseed),
        |cdist AS (
        |  SELECT q.vec_id, s.cell,
        |    s.cn - 2 * CAST(list_sum(list_transform(range(1, 65),
        |      i -> q.qv[i] * s.cv[i])) AS BIGINT) AS d
        |  FROM q CROSS JOIN cseedn s),
        |cellasg AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |    FROM cdist) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS qid, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |    FROM cdist WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 2),
        |scored AS (
        |  SELECT p.qid, c.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(range(1, len(c.qv) + 1),
        |        i -> c.qv[i] * pq.qv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(c.nsq AS DOUBLE)) * sqrt(CAST(pn.nsq AS DOUBLE))) AS cos
        |  FROM probes p
        |  JOIN cellasg ca ON ca.cell = p.cell
        |  JOIN n c ON c.vec_id = ca.vec_id
        |  JOIN q pq ON pq.vec_id = p.qid
        |  JOIN n pn ON pn.vec_id = p.qid
        |  WHERE c.vec_id != p.qid)
        |SELECT qid, rank, nid, round(cos, 6) AS cos FROM (
        |  SELECT qid, nid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |  FROM scored)
        |WHERE rank <= 10""".stripMargin,

    // SQ8 asymmetric top-k: per-dim (min, width) trained from the
    // quantized corpus, one-byte codes, bucket-midpoint
    // reconstruction — every stage exact NONNEGATIVE integers, where
    // DuckDB //, Spark div and JVM / coincide.
    "sim_sq_topk" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |st AS (
        |  SELECT CAST(r.d AS INT) AS d,
        |    min(qv[CAST(r.d AS INT) + 1]) AS lo,
        |    max(qv[CAST(r.d AS INT) + 1]) - min(qv[CAST(r.d AS INT) + 1]) + 1 AS w
        |  FROM q CROSS JOIN range(0, 64) r(d)
        |  GROUP BY 1),
        |enc AS (
        |  SELECT q.vec_id, s.d, s.lo, s.w,
        |    greatest(0, least(255, ((qv[s.d + 1] - s.lo) * 256) // s.w)) AS code
        |  FROM q CROSS JOIN st s),
        |qq AS (SELECT vec_id AS qid, qv FROM q WHERE vec_id IN (0, 1, 2, 3, 4)),
        |ad AS (
        |  SELECT qq.qid, e.vec_id AS nid,
        |    CAST(sum((qq.qv[e.d + 1] - (e.lo + ((2 * e.code + 1) * e.w) // 512))
        |           * (qq.qv[e.d + 1] - (e.lo + ((2 * e.code + 1) * e.w) // 512))) AS BIGINT) AS adist
        |  FROM enc e JOIN qq ON qq.qid <> e.vec_id
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT qid, nid, adist,
        |    row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rank
        |  FROM ad)
        |SELECT qid, rank, nid, adist FROM r WHERE rank <= 10""".stripMargin,

    // IVF+PQ, RESIDUAL encoding (the actual FAISS IVFPQ): a coarse
    // quantizer — cells from the 8 lowest vec_ids, exact-integer
    // argmin assignment (tie → lowest cell) — then PQ over the
    // RESIDUAL (vector − its cell centroid); residual seed codebooks
    // from the residuals of the 16 lowest vec_ids; each query probes
    // its 2 nearest cells with a PER-(query, cell) distance table
    // built from the query's residual against THAT cell. Every stage
    // exact-integer, so PARTIAL-probe output is bit-reproducible
    // (unlike IVF-flat's nprobe=nlist-only oracle).
    "sim_ivfpq_topk" ->
      s"""WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |cseed AS (
        |  SELECT qv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
        |    AS cell
        |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 8)),
        |cseedn AS (
        |  SELECT cell, qv AS cv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS cn
        |  FROM cseed),
        |cdist AS (
        |  SELECT q.vec_id, s.cell,
        |    s.cn - 2 * CAST(list_sum(list_transform(range(1, 65),
        |      i -> q.qv[i] * s.cv[i])) AS BIGINT) AS d
        |  FROM q CROSS JOIN cseedn s),
        |cellasg AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |    FROM cdist) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS qid, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |    FROM cdist WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 2),
        |res AS (
        |  SELECT q.vec_id, ca.cell,
        |    list_transform(range(1, 65), i -> q.qv[i] - c.cv[i]) AS rv
        |  FROM q
        |  JOIN cellasg ca ON ca.vec_id = q.vec_id
        |  JOIN cseedn c ON c.cell = ca.cell),
        |rseed AS (
        |  SELECT rv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c
        |  FROM (SELECT vec_id, rv FROM res ORDER BY vec_id LIMIT 16)),
        |rcw AS (
        |  SELECT rseed.c, CAST(r.j AS INT) AS j,
        |    rv[(r.j * 8 + 1):(r.j * 8 + 8)] AS w
        |  FROM rseed CROSS JOIN range(0, 8) r(j)),
        |rcwn AS (
        |  SELECT c, j, w,
        |    CAST(list_sum(list_transform(w, x -> x * x)) AS BIGINT) AS wn
        |  FROM rcw),
        |rsub AS (
        |  SELECT vec_id, CAST(r.j AS INT) AS j,
        |    rv[(r.j * 8 + 1):(r.j * 8 + 8)] AS s
        |  FROM res CROSS JOIN range(0, 8) r(j)),
        |enc0 AS (
        |  SELECT s.vec_id, s.j, w.c,
        |    w.wn - 2 * CAST(list_sum(list_transform(range(1, 9),
        |      i -> s.s[i] * w.w[i])) AS BIGINT) AS d
        |  FROM rsub s JOIN rcwn w ON w.j = s.j),
        |enc AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
        |    FROM enc0) WHERE rn = 1),
        |qres AS (
        |  SELECT p.qid, p.cell,
        |    list_transform(range(1, 65), i -> q.qv[i] - c.cv[i]) AS rv
        |  FROM probes p
        |  JOIN q ON q.vec_id = p.qid
        |  JOIN cseedn c ON c.cell = p.cell),
        |qsub AS (
        |  SELECT qid, cell, CAST(r.j AS INT) AS j,
        |    rv[(r.j * 8 + 1):(r.j * 8 + 8)] AS s
        |  FROM qres CROSS JOIN range(0, 8) r(j)),
        |dtr AS (
        |  SELECT qs.qid, qs.cell, qs.j, w.c,
        |    CAST(list_sum(list_transform(qs.s, x -> x * x)) AS BIGINT) + w.wn
        |      - 2 * CAST(list_sum(list_transform(range(1, 9),
        |        i -> qs.s[i] * w.w[i])) AS BIGINT) AS d
        |  FROM qsub qs JOIN rcwn w ON w.j = qs.j),
        |ad AS (
        |  SELECT dtr.qid, e.vec_id AS nid, CAST(sum(dtr.d) AS BIGINT) AS adist
        |  FROM enc e
        |  JOIN cellasg ca ON ca.vec_id = e.vec_id
        |  JOIN dtr ON dtr.cell = ca.cell AND dtr.j = e.j AND dtr.c = e.c
        |  WHERE e.vec_id <> dtr.qid
        |  GROUP BY dtr.qid, e.vec_id),
        |r AS (
        |  SELECT qid, nid, adist,
        |    row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rank
        |  FROM ad)
        |SELECT qid, rank, nid, adist FROM r WHERE rank <= 10""".stripMargin,

    // Trained-residual IVFPQ: the sim_ivfpq_topk pipeline with the
    // residual codebooks refined by TWO unrolled exact-integer EM
    // rounds (assignment = |w|^2 - 2 s.w argmin, ties to lowest code;
    // update = half-away-from-zero integer mean sign(s)*((2|s|+n)//(2n));
    // empty codes keep their codeword) — the tok_unigram_train
    // unrolled-training convention.
    "sim_ivfpq_trained" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |cseed AS (
        |  SELECT qv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
        |    AS cell
        |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 8)),
        |cseedn AS (
        |  SELECT cell, qv AS cv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS cn
        |  FROM cseed),
        |cdist AS (
        |  SELECT q.vec_id, s.cell,
        |    s.cn - 2 * CAST(list_sum(list_transform(range(1, 65),
        |      i -> q.qv[i] * s.cv[i])) AS BIGINT) AS d
        |  FROM q CROSS JOIN cseedn s),
        |cellasg AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |    FROM cdist) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS qid, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        |    FROM cdist WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 2),
        |res AS (
        |  SELECT q.vec_id, ca.cell,
        |    list_transform(range(1, 65), i -> q.qv[i] - c.cv[i]) AS rv
        |  FROM q
        |  JOIN cellasg ca ON ca.vec_id = q.vec_id
        |  JOIN cseedn c ON c.cell = ca.cell),
        |rseed AS (
        |  SELECT rv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c
        |  FROM (SELECT vec_id, rv FROM res ORDER BY vec_id LIMIT 16)),
        |w0 AS (
        |  SELECT rseed.c, CAST(r.j AS INT) AS j,
        |    rv[(r.j * 8 + 1):(r.j * 8 + 8)] AS w
        |  FROM rseed CROSS JOIN range(0, 8) r(j)),
        |rsub AS (
        |  SELECT vec_id, CAST(r.j AS INT) AS j,
        |    rv[(r.j * 8 + 1):(r.j * 8 + 8)] AS s
        |  FROM res CROSS JOIN range(0, 8) r(j)),
        |a1 AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT s.vec_id, s.j, w.c,
        |      row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
        |        CAST(list_sum(list_transform(w.w, x -> x * x)) AS BIGINT)
        |        - 2 * CAST(list_sum(list_transform(range(1, 9),
        |            i -> s.s[i] * w.w[i])) AS BIGINT), w.c) AS rn
        |    FROM rsub s JOIN w0 w ON w.j = s.j) WHERE rn = 1),
        |u1 AS (
        |  SELECT a.j, a.c, CAST(r.i AS INT) AS i,
        |    CAST(sum(s.s[CAST(r.i AS INT)]) AS BIGINT) AS sm,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM a1 a JOIN rsub s ON s.vec_id = a.vec_id AND s.j = a.j
        |  CROSS JOIN range(1, 9) r(i)
        |  GROUP BY a.j, a.c, r.i),
        |w1 AS (
        |  SELECT w.j, w.c, coalesce(u.wl, w.w) AS w
        |  FROM w0 w LEFT JOIN (
        |    SELECT j, c, list(CASE WHEN sm >= 0 THEN (2 * sm + n) // (2 * n)
        |                           ELSE -((-2 * sm + n) // (2 * n)) END
        |                      ORDER BY i) AS wl
        |    FROM u1 GROUP BY j, c) u ON u.j = w.j AND u.c = w.c),
        |a2 AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT s.vec_id, s.j, w.c,
        |      row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
        |        CAST(list_sum(list_transform(w.w, x -> x * x)) AS BIGINT)
        |        - 2 * CAST(list_sum(list_transform(range(1, 9),
        |            i -> s.s[i] * w.w[i])) AS BIGINT), w.c) AS rn
        |    FROM rsub s JOIN w1 w ON w.j = s.j) WHERE rn = 1),
        |u2 AS (
        |  SELECT a.j, a.c, CAST(r.i AS INT) AS i,
        |    CAST(sum(s.s[CAST(r.i AS INT)]) AS BIGINT) AS sm,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM a2 a JOIN rsub s ON s.vec_id = a.vec_id AND s.j = a.j
        |  CROSS JOIN range(1, 9) r(i)
        |  GROUP BY a.j, a.c, r.i),
        |w2 AS (
        |  SELECT w.j, w.c, coalesce(u.wl, w.w) AS w
        |  FROM w1 w LEFT JOIN (
        |    SELECT j, c, list(CASE WHEN sm >= 0 THEN (2 * sm + n) // (2 * n)
        |                           ELSE -((-2 * sm + n) // (2 * n)) END
        |                      ORDER BY i) AS wl
        |    FROM u2 GROUP BY j, c) u ON u.j = w.j AND u.c = w.c),
        |rcwn AS (
        |  SELECT c, j, w,
        |    CAST(list_sum(list_transform(w, x -> x * x)) AS BIGINT) AS wn
        |  FROM w2),
        |enc0 AS (
        |  SELECT s.vec_id, s.j, w.c,
        |    w.wn - 2 * CAST(list_sum(list_transform(range(1, 9),
        |      i -> s.s[i] * w.w[i])) AS BIGINT) AS d
        |  FROM rsub s JOIN rcwn w ON w.j = s.j),
        |enc AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
        |    FROM enc0) WHERE rn = 1),
        |qres AS (
        |  SELECT p.qid, p.cell,
        |    list_transform(range(1, 65), i -> q.qv[i] - c.cv[i]) AS rv
        |  FROM probes p
        |  JOIN q ON q.vec_id = p.qid
        |  JOIN cseedn c ON c.cell = p.cell),
        |qsub AS (
        |  SELECT qid, cell, CAST(r.j AS INT) AS j,
        |    rv[(r.j * 8 + 1):(r.j * 8 + 8)] AS s
        |  FROM qres CROSS JOIN range(0, 8) r(j)),
        |dtr AS (
        |  SELECT qs.qid, qs.cell, qs.j, w.c,
        |    CAST(list_sum(list_transform(qs.s, x -> x * x)) AS BIGINT) + w.wn
        |      - 2 * CAST(list_sum(list_transform(range(1, 9),
        |        i -> qs.s[i] * w.w[i])) AS BIGINT) AS d
        |  FROM qsub qs JOIN rcwn w ON w.j = qs.j),
        |ad AS (
        |  SELECT dtr.qid, e.vec_id AS nid, CAST(sum(dtr.d) AS BIGINT) AS adist
        |  FROM enc e
        |  JOIN cellasg ca ON ca.vec_id = e.vec_id
        |  JOIN dtr ON dtr.cell = ca.cell AND dtr.j = e.j AND dtr.c = e.c
        |  WHERE e.vec_id <> dtr.qid
        |  GROUP BY dtr.qid, e.vec_id),
        |r AS (
        |  SELECT qid, nid, adist,
        |    row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rank
        |  FROM ad)
        |SELECT qid, rank, nid, adist FROM r WHERE rank <= 10""".stripMargin,

    "text_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4) AS BIGINT) AS n_bpe_tokens
        |FROM documents""".stripMargin,

    // BPE round-1 pair statistics: word counts → char symbolization
    // (+ `</w>`) → corpus-weighted adjacent-pair counts. DuckDB's
    // 1-indexed lists step positions with range(1, len) — the same
    // (a,b) pair table whose argmax is the first learned merge.
    "tok_bpe_pairs" ->
      """WITH words AS (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents),
        |wc AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM words
        |  WHERE length(word) > 0 GROUP BY word
        |  ORDER BY n DESC, word LIMIT 65536),
        |sym AS (
        |  SELECT list_append(string_split(word, ''), '</w>') AS s, n FROM wc),
        |pairs AS (
        |  SELECT n, unnest(list_transform(range(1, len(s)), i -> {'a': s[i], 'b': s[i+1]})) AS p
        |  FROM sym WHERE len(s) >= 2)
        |SELECT p.a AS a, p.b AS b, CAST(SUM(n) AS BIGINT) AS cnt
        |FROM pairs GROUP BY p.a, p.b""".stripMargin,

    // BPE encode under the fixed rank-ordered fixture merges. Each
    // merge (x,y)→xy is applied to the space-joined, space-padded
    // symbol string as TWO chained `replace(' x y ', ' xy ')` passes:
    // pass 1's leftmost scan consumes the shared delimiter of
    // back-to-back occurrences (…x y x y…), so exactly the starved
    // occurrences remain — never adjacent — and pass 2 fuses them in
    // place. For x ≠ y (all fixture merges; adjacencies can't overlap
    // on a symbol) this provably equals the engine's leftmost
    // non-overlapping fold. An x == y merge (run-ambiguous) would NOT
    // be faithful here — the engine fold handles it, this SQL doesn't.
    "tok_bpe_encode" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> length(w) > 0) AS words
        |  FROM documents WHERE doc_id < 50),
        |enc AS (
        |  SELECT doc_id, array_to_string(list_transform(words, w ->
        |    trim(
        |      replace(replace(
        |        replace(replace(
        |          replace(replace(
        |            replace(replace(
        |              ' ' || array_to_string(list_append(string_split(w, ''), '</w>'), ' ') || ' ',
        |              ' a </w> ', ' a</w> '), ' a </w> ', ' a</w> '),
        |            ' e </w> ', ' e</w> '), ' e </w> ', ' e</w> '),
        |          ' t a ', ' ta '), ' t a ', ' ta '),
        |        ' s c ', ' sc '), ' s c ', ' sc ')
        |    )), ' ') AS toks
        |  FROM base)
        |SELECT doc_id,
        |  CAST(CASE WHEN toks = '' THEN 0 ELSE len(string_split(toks, ' ')) END AS BIGINT) AS n_tokens,
        |  toks
        |FROM enc""".stripMargin,

    // BYTE-level BPE encode: pieces are alternating whitespace /
    // non-whitespace runs (regexp_extract_all keeps EVERY char), the
    // byte→unicode alphabet is identity on the pure-printable-ASCII
    // fixture except space → 'Ġ' (chr(288), GPT-2's mapped byte 32),
    // and the rank-ordered byte merges replay via the two-pass
    // replace-chain convention (all fixture pairs x ≠ y). No
    // lowercase, no </w> — rank 2 ('th','e') fires only after rank 1
    // built 'th'.
    "tok_bpe_bytes" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_extract_all(text, '\s+|\S+') AS pieces
        |  FROM documents WHERE doc_id < 50),
        |enc AS (
        |  SELECT doc_id, array_to_string(list_transform(pieces, p ->
        |    trim(
        |      replace(replace(
        |        replace(replace(
        |          replace(replace(
        |            replace(replace(
        |              ' ' || array_to_string(string_split(replace(p, ' ', chr(288)), ''), ' ') || ' ',
        |              ' t h ', ' th '), ' t h ', ' th '),
        |            ' th e ', ' the '), ' th e ', ' the '),
        |          ' i n ', ' in '), ' i n ', ' in '),
        |        ' a n ', ' an '), ' a n ', ' an ')
        |    )), ' ') AS toks
        |  FROM base)
        |SELECT doc_id,
        |  CAST(CASE WHEN toks = '' THEN 0 ELSE len(string_split(toks, ' ')) END AS BIGINT) AS n_tokens,
        |  toks
        |FROM enc""".stripMargin,

    // BPE-dropout encode: the tok_bpe_encode replace-chain where each
    // merge rank r applies to word w only when
    // substr(md5('bpedrop:' || w || ':r'), 1, 2) >= '40' (keep prob
    // 192/256 — two-lowercase-hex-digit strings compare lexically the
    // same as numerically, and the engine kernel compares the first
    // digest BYTE against 0x40). Words ride through one CTE per merge
    // rank (the CASE references its input twice, so a column ref per
    // stage beats 2^4 nested lambda copies), then re-join in word
    // order; empty docs re-enter via the left join.
    "tok_bpe_dropout" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> length(w) > 0) AS words
        |  FROM documents WHERE doc_id < 50),
        |wx AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) + 1),
        |    i -> {'wi': i, 'w': words[i]})) AS u
        |  FROM base),
        |w0 AS (SELECT doc_id, u.wi AS wi, u.w AS w,
        |  ' ' || array_to_string(list_append(string_split(u.w, ''), '</w>'), ' ') || ' ' AS s
        |  FROM wx),
        |w1 AS (SELECT doc_id, wi, w,
        |  CASE WHEN substr(md5('bpedrop:' || w || ':0'), 1, 2) >= '40'
        |    THEN replace(replace(s, ' a </w> ', ' a</w> '), ' a </w> ', ' a</w> ')
        |    ELSE s END AS s FROM w0),
        |w2 AS (SELECT doc_id, wi, w,
        |  CASE WHEN substr(md5('bpedrop:' || w || ':1'), 1, 2) >= '40'
        |    THEN replace(replace(s, ' e </w> ', ' e</w> '), ' e </w> ', ' e</w> ')
        |    ELSE s END AS s FROM w1),
        |w3 AS (SELECT doc_id, wi, w,
        |  CASE WHEN substr(md5('bpedrop:' || w || ':2'), 1, 2) >= '40'
        |    THEN replace(replace(s, ' t a ', ' ta '), ' t a ', ' ta ')
        |    ELSE s END AS s FROM w2),
        |w4 AS (SELECT doc_id, wi, w,
        |  CASE WHEN substr(md5('bpedrop:' || w || ':3'), 1, 2) >= '40'
        |    THEN replace(replace(s, ' s c ', ' sc '), ' s c ', ' sc ')
        |    ELSE s END AS s FROM w3),
        |enc AS (
        |  SELECT doc_id, string_agg(trim(s), ' ' ORDER BY wi) AS toks
        |  FROM w4 GROUP BY doc_id)
        |SELECT b.doc_id,
        |  CAST(CASE WHEN e.toks IS NULL OR e.toks = '' THEN 0
        |       ELSE len(string_split(e.toks, ' ')) END AS BIGINT) AS n_tokens,
        |  COALESCE(e.toks, '') AS toks
        |FROM base b LEFT JOIN enc e USING (doc_id)""".stripMargin,

    // Tokenizer fertility report: the tok_bpe_encode replace-chain
    // encode over the FULL corpus, folded to per-language exact
    // integer totals with one final division each.
    "tok_fertility" ->
      """WITH base AS (
        |  SELECT lang, CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |      w -> length(w) > 0)) AS BIGINT) AS n_words,
        |    array_to_string(list_transform(
        |      list_filter(string_split_regex(lower(text), '\s+'), w -> length(w) > 0), w ->
        |      trim(
        |        replace(replace(
        |          replace(replace(
        |            replace(replace(
        |              replace(replace(
        |                ' ' || array_to_string(list_append(string_split(w, ''), '</w>'), ' ') || ' ',
        |                ' a </w> ', ' a</w> '), ' a </w> ', ' a</w> '),
        |              ' e </w> ', ' e</w> '), ' e </w> ', ' e</w> '),
        |            ' t a ', ' ta '), ' t a ', ' ta '),
        |          ' s c ', ' sc '), ' s c ', ' sc ')
        |      )), ' ') AS toks
        |  FROM documents),
        |per AS (
        |  SELECT lang, n_chars, n_words,
        |    CAST(CASE WHEN toks = '' THEN 0 ELSE len(string_split(toks, ' ')) END AS BIGINT) AS n_subwords
        |  FROM base)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS n_words,
        |  CAST(sum(n_subwords) AS BIGINT) AS n_subwords,
        |  round(CAST(sum(n_subwords) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE), 6) AS fertility,
        |  round(CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_subwords) AS DOUBLE), 6) AS chars_per_subword
        |FROM per GROUP BY lang""".stripMargin,

    // Corpus datasheet: per-source exact-integer data card — token
    // totals, language spread, corpus-wide exact-dup membership
    // (md5 text fingerprint count >= 2), Gopher prose-rule passes.
    "corpus_datasheet" ->
      """WITH fp AS (
        |  SELECT doc_id, source, lang,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS tok,
        |    md5(text) AS f
        |  FROM documents),
        |dups AS (SELECT f FROM fp GROUP BY f HAVING count(*) >= 2),
        |tk AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks, text
        |  FROM documents),
        |keepf AS (
        |  SELECT doc_id,
        |    (CAST(len(toks) AS BIGINT) BETWEEN 50 AND 100000)
        |      AND CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks) >= 3
        |      AND CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks) <= 10
        |      AND CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS DOUBLE) / len(toks) <= 0.1
        |      AND CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(toks) > 0.8
        |      AND (CAST(list_contains(toks, 'the') AS INT) + CAST(list_contains(toks, 'be') AS INT)
        |        + CAST(list_contains(toks, 'to') AS INT) + CAST(list_contains(toks, 'of') AS INT)
        |        + CAST(list_contains(toks, 'and') AS INT) + CAST(list_contains(toks, 'that') AS INT)
        |        + CAST(list_contains(toks, 'have') AS INT) + CAST(list_contains(toks, 'with') AS INT)) >= 2
        |      AS keep
        |  FROM tk)
        |SELECT fp.source, count(*) AS n_docs,
        |  CAST(sum(fp.tok) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT fp.lang) AS BIGINT) AS n_langs,
        |  CAST(sum(CASE WHEN fp.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        |  CAST(sum(CASE WHEN fp.f IN (SELECT f FROM dups) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        |  CAST(sum(CASE WHEN keepf.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_keep
        |FROM fp JOIN keepf ON keepf.doc_id = fp.doc_id
        |GROUP BY fp.source""".stripMargin,

    // Embedding-space drift: per-dimension exact integer component
    // sums over the two vec_id halves; mean-shift numerator
    // |s1*n2 - s2*n1| exact, one division (then /1000 de-quantize).
    "emb_drift" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |m AS (SELECT (max(vec_id) + 1) // 2 AS mid FROM embeddings),
        |d AS (
        |  SELECT vec_id, CAST(generate_subscripts(qv, 1) - 1 AS BIGINT) AS dim,
        |    unnest(qv) AS qx, (SELECT mid FROM m) AS mid
        |  FROM q)
        |SELECT dim,
        |  CAST(sum(CASE WHEN vec_id < mid THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |  CAST(sum(CASE WHEN vec_id >= mid THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |  CAST(sum(CASE WHEN vec_id < mid THEN qx ELSE 0 END) AS BIGINT) AS s1,
        |  CAST(sum(CASE WHEN vec_id >= mid THEN qx ELSE 0 END) AS BIGINT) AS s2,
        |  abs(CAST(sum(CASE WHEN vec_id < mid THEN qx ELSE 0 END) AS BIGINT)
        |      * CAST(sum(CASE WHEN vec_id >= mid THEN 1 ELSE 0 END) AS BIGINT)
        |    - CAST(sum(CASE WHEN vec_id >= mid THEN qx ELSE 0 END) AS BIGINT)
        |      * CAST(sum(CASE WHEN vec_id < mid THEN 1 ELSE 0 END) AS BIGINT)) AS drift_num,
        |  round(CAST(abs(CAST(sum(CASE WHEN vec_id < mid THEN qx ELSE 0 END) AS BIGINT)
        |      * CAST(sum(CASE WHEN vec_id >= mid THEN 1 ELSE 0 END) AS BIGINT)
        |    - CAST(sum(CASE WHEN vec_id >= mid THEN qx ELSE 0 END) AS BIGINT)
        |      * CAST(sum(CASE WHEN vec_id < mid THEN 1 ELSE 0 END) AS BIGINT)) AS DOUBLE)
        |    / CAST(sum(CASE WHEN vec_id < mid THEN 1 ELSE 0 END)
        |           * sum(CASE WHEN vec_id >= mid THEN 1 ELSE 0 END) AS DOUBLE)
        |    / 1000.0, 9) AS mean_shift
        |FROM d GROUP BY dim""".stripMargin,

    // Tokenizer-publication flagship: the tok_bpe_encode two-pass
    // replace chain yields per-doc subword counts, the pack_no_split
    // recursive CTE replays next-fit over them, and the manifest tail
    // groups per packed sequence with the shard_manifest checksum
    // idiom (0x-prefixed md5 window → UBIGINT → BIGINT, bit_xor).
    "tokenize_publish" ->
      """WITH RECURSIVE enc AS (
        |  SELECT doc_id, array_to_string(list_transform(
        |    list_filter(string_split_regex(lower(text), '\s+'), w -> length(w) > 0), w ->
        |    trim(
        |      replace(replace(
        |        replace(replace(
        |          replace(replace(
        |            replace(replace(
        |              ' ' || array_to_string(list_append(string_split(w, ''), '</w>'), ' ') || ' ',
        |              ' a </w> ', ' a</w> '), ' a </w> ', ' a</w> '),
        |            ' e </w> ', ' e</w> '), ' e </w> ', ' e</w> '),
        |          ' t a ', ' ta '), ' t a ', ' ta '),
        |        ' s c ', ' sc '), ' s c ', ' sc ')
        |    )), ' ') AS toks
        |  FROM documents),
        |t0 AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN toks = '' THEN 0 ELSE len(string_split(toks, ' ')) END AS BIGINT) AS n_tokens
        |  FROM enc),
        |w AS (SELECT greatest(max(doc_id) // 16 + 1, 1) AS width FROM t0),
        |t1 AS (SELECT doc_id, n_tokens,
        |         doc_id // (SELECT width FROM w) AS bucket FROM t0),
        |t2 AS (SELECT doc_id, n_tokens, bucket,
        |         row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
        |       FROM t1),
        |st(bucket, rn, doc_id, n_tokens, seq, fill) AS (
        |  SELECT bucket, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
        |  FROM t2 WHERE rn = 1
        |  UNION ALL
        |  SELECT t.bucket, t.rn, t.doc_id, t.n_tokens,
        |    CASE WHEN s.fill + t.n_tokens > 2048 THEN s.seq + 1 ELSE s.seq END,
        |    CASE WHEN s.fill + t.n_tokens > 2048 THEN t.n_tokens
        |         ELSE s.fill + t.n_tokens END
        |  FROM st s JOIN t2 t ON t.bucket = s.bucket AND t.rn = s.rn + 1)
        |SELECT bucket, seq AS seq_in_bucket, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_seq_tokens,
        |  bit_xor(CAST(CAST(concat('0x', substr(md5(concat('doc:',
        |    CAST(doc_id AS VARCHAR))), 1, 15)) AS UBIGINT) AS BIGINT)) AS checksum
        |FROM st GROUP BY bucket, seq""".stripMargin,

    // The induced VOCABULARY after the 3 learned merges — the same
    // training CTE chain as tok_bpe_merges, plus one more apply (v3)
    // and the symbol explode/agg tail.
    "tok_bpe_vocab" ->
      """WITH wc AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents)
        |  WHERE length(word) > 0 GROUP BY word
        |  ORDER BY n DESC, word LIMIT 65536),
        |v0 AS (
        |  SELECT ' ' || array_to_string(list_append(string_split(word, ''), '</w>'), ' ') || ' ' AS s, n
        |  FROM wc),
        |pc0 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v0) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m0 AS (SELECT a, b FROM pc0 ORDER BY cnt DESC, a, b LIMIT 1),
        |v1 AS (
        |  SELECT replace(replace(s,
        |      ' ' || (SELECT a FROM m0) || ' ' || (SELECT b FROM m0) || ' ',
        |      ' ' || (SELECT a FROM m0) || (SELECT b FROM m0) || ' '),
        |      ' ' || (SELECT a FROM m0) || ' ' || (SELECT b FROM m0) || ' ',
        |      ' ' || (SELECT a FROM m0) || (SELECT b FROM m0) || ' ') AS s, n
        |  FROM v0),
        |pc1 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v1) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m1 AS (SELECT a, b FROM pc1 ORDER BY cnt DESC, a, b LIMIT 1),
        |v2 AS (
        |  SELECT replace(replace(s,
        |      ' ' || (SELECT a FROM m1) || ' ' || (SELECT b FROM m1) || ' ',
        |      ' ' || (SELECT a FROM m1) || (SELECT b FROM m1) || ' '),
        |      ' ' || (SELECT a FROM m1) || ' ' || (SELECT b FROM m1) || ' ',
        |      ' ' || (SELECT a FROM m1) || (SELECT b FROM m1) || ' ') AS s, n
        |  FROM v1),
        |pc2 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v2) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m2 AS (SELECT a, b FROM pc2 ORDER BY cnt DESC, a, b LIMIT 1),
                |v3 AS (
        |  SELECT replace(replace(s,
        |      ' ' || (SELECT a FROM m2) || ' ' || (SELECT b FROM m2) || ' ',
        |      ' ' || (SELECT a FROM m2) || (SELECT b FROM m2) || ' '),
        |      ' ' || (SELECT a FROM m2) || ' ' || (SELECT b FROM m2) || ' ',
        |      ' ' || (SELECT a FROM m2) || (SELECT b FROM m2) || ' ') AS s, n
        |  FROM v2),
        |syms AS (
        |  SELECT unnest(string_split(trim(s), ' ')) AS symbol, n FROM v3)
        |SELECT symbol, CAST(sum(n) AS BIGINT) AS cnt, CAST(count(*) AS BIGINT) AS n_words
        |FROM syms GROUP BY symbol""".stripMargin,


    // The BPE training LOOP, unrolled three rounds: each round is
    // pair-count → argmax (cnt desc, then (a,b) — the engine's
    // tie-break) → the two-pass delimiter-replace apply (valid while
    // every learned merge has a≠b, which this corpus's do; the apply
    // is data-dependent — the pattern comes from the previous round's
    // argmax scalar subquery).
    "tok_bpe_merges" ->
      """WITH wc AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents)
        |  WHERE length(word) > 0 GROUP BY word
        |  ORDER BY n DESC, word LIMIT 65536),
        |v0 AS (
        |  SELECT ' ' || array_to_string(list_append(string_split(word, ''), '</w>'), ' ') || ' ' AS s, n
        |  FROM wc),
        |pc0 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v0) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m0 AS (SELECT a, b FROM pc0 ORDER BY cnt DESC, a, b LIMIT 1),
        |v1 AS (
        |  SELECT replace(replace(s,
        |      ' ' || (SELECT a FROM m0) || ' ' || (SELECT b FROM m0) || ' ',
        |      ' ' || (SELECT a FROM m0) || (SELECT b FROM m0) || ' '),
        |      ' ' || (SELECT a FROM m0) || ' ' || (SELECT b FROM m0) || ' ',
        |      ' ' || (SELECT a FROM m0) || (SELECT b FROM m0) || ' ') AS s, n
        |  FROM v0),
        |pc1 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v1) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m1 AS (SELECT a, b FROM pc1 ORDER BY cnt DESC, a, b LIMIT 1),
        |v2 AS (
        |  SELECT replace(replace(s,
        |      ' ' || (SELECT a FROM m1) || ' ' || (SELECT b FROM m1) || ' ',
        |      ' ' || (SELECT a FROM m1) || (SELECT b FROM m1) || ' '),
        |      ' ' || (SELECT a FROM m1) || ' ' || (SELECT b FROM m1) || ' ',
        |      ' ' || (SELECT a FROM m1) || (SELECT b FROM m1) || ' ') AS s, n
        |  FROM v1),
        |pc2 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v2) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m2 AS (SELECT a, b FROM pc2 ORDER BY cnt DESC, a, b LIMIT 1)
        |SELECT CAST(0 AS BIGINT) AS rank, a, b FROM m0
        |UNION ALL SELECT CAST(1 AS BIGINT), a, b FROM m1
        |UNION ALL SELECT CAST(2 AS BIGINT), a, b FROM m2""".stripMargin,

    // Byte-level BPE trainer, 3 rounds replayed (the tok_bpe_merges
    // convention over the BYTE face): pieces are whitespace-preserving
    // runs (regexp_extract_all keeps every char), symbolized through
    // the byte alphabet — identity on the printable-ASCII fixture
    // except space → chr(288) ('Ġ') — with NO lowercase and NO </w>;
    // each round pair-counts, argmaxes with the (cnt desc, a, b)
    // tie-break, and applies via the two-pass delimiter-replace.
    "tok_bpe_bytes_merges" ->
      """WITH wc AS (
        |  SELECT piece, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(regexp_extract_all(text, '\s+|\S+')) AS piece FROM documents)
        |  WHERE length(piece) > 0 GROUP BY piece
        |  ORDER BY n DESC, piece LIMIT 65536),
        |v0 AS (
        |  SELECT ' ' || array_to_string(string_split(replace(piece, ' ', chr(288)), ''), ' ') || ' ' AS s, n
        |  FROM wc),
        |pc0 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v0) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m0 AS (SELECT a, b FROM pc0 ORDER BY cnt DESC, a, b LIMIT 1),
        |v1 AS (
        |  SELECT replace(replace(s,
        |      ' ' || (SELECT a FROM m0) || ' ' || (SELECT b FROM m0) || ' ',
        |      ' ' || (SELECT a FROM m0) || (SELECT b FROM m0) || ' '),
        |      ' ' || (SELECT a FROM m0) || ' ' || (SELECT b FROM m0) || ' ',
        |      ' ' || (SELECT a FROM m0) || (SELECT b FROM m0) || ' ') AS s, n
        |  FROM v0),
        |pc1 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v1) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m1 AS (SELECT a, b FROM pc1 ORDER BY cnt DESC, a, b LIMIT 1),
        |v2 AS (
        |  SELECT replace(replace(s,
        |      ' ' || (SELECT a FROM m1) || ' ' || (SELECT b FROM m1) || ' ',
        |      ' ' || (SELECT a FROM m1) || (SELECT b FROM m1) || ' '),
        |      ' ' || (SELECT a FROM m1) || ' ' || (SELECT b FROM m1) || ' ',
        |      ' ' || (SELECT a FROM m1) || (SELECT b FROM m1) || ' ') AS s, n
        |  FROM v1),
        |pc2 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v2) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m2 AS (SELECT a, b FROM pc2 ORDER BY cnt DESC, a, b LIMIT 1)
        |SELECT CAST(0 AS BIGINT) AS rank, a, b FROM m0
        |UNION ALL SELECT CAST(1 AS BIGINT), a, b FROM m1
        |UNION ALL SELECT CAST(2 AS BIGINT), a, b FROM m2""".stripMargin,

    // Unigram Viterbi-EM trainer, BOTH rounds replayed: substring
    // seeding (top-48 weighted 2..4-grams), round-1 DP under seed
    // costs -> usage counts -> re-priced inventory, round-2 DP under
    // those -> final counts/costs. Integer arithmetic throughout.
    // DuckDB shape notes (1.0.0): CTEs downstream of a recursion must
    // NOT be MATERIALIZED (silently empty), and a recursive term that
    // references such a CTE re-evaluates it EVERY iteration — so the
    // walk CTEs carry their backpointer lists in-state, and round 2's
    // inventory rides into the recursion as a one-row list pulled in
    // the anchor (evaluated exactly once).
    "tok_unigram_train" ->
      """WITH RECURSIVE wc AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents)
        |  WHERE length(word) > 0 GROUP BY word
        |  ORDER BY n DESC, word LIMIT 65536),
        |subs AS (
        |  SELECT u AS piece, CAST(SUM(n) AS BIGINT) AS scnt FROM (
        |    SELECT n, unnest(flatten(list_transform([2, 3, 4], l ->
        |      list_transform(range(1, greatest(length(word) - l + 2, 1)),
        |        i -> substr(word, CAST(i AS INT), CAST(l AS INT)))))) AS u
        |    FROM wc)
        |  WHERE length(u) >= 2 GROUP BY u),
        |seed AS (SELECT piece FROM subs ORDER BY scnt DESC, piece LIMIT 48),
        |chars AS (
        |  SELECT DISTINCT ch AS piece FROM (
        |    SELECT unnest(string_split(word, '')) AS ch FROM wc)
        |  WHERE length(ch) = 1),
        |inv1 AS (
        |  SELECT piece, CAST(length(piece) AS INT) AS plen,
        |    CAST(2200 - 500 * length(piece) AS BIGINT) AS pcost FROM seed
        |  UNION ALL
        |  SELECT piece, 1, CAST(2000 AS BIGINT) FROM chars),
        |st1(word, pos, best, bp) AS (
        |  SELECT word, 0, [CAST(0 AS BIGINT)], CAST([] AS INT[]) FROM wc
        |  UNION ALL
        |  SELECT s.word, s.pos + 1, list_append(s.best, m.c), list_append(s.bp, m.l)
        |  FROM st1 s JOIN LATERAL (
        |    SELECT s.best[s.pos + 2 - v.plen] + v.pcost AS c, v.plen AS l
        |    FROM inv1 v
        |    WHERE v.plen <= s.pos + 1
        |      AND v.piece = substr(s.word, s.pos + 2 - v.plen, v.plen)
        |    ORDER BY c, l DESC LIMIT 1) m ON true
        |  WHERE s.pos < len(s.word)),
        |fin1 AS (SELECT word, bp FROM st1 WHERE pos = len(word)),
        |walk1(word, pos, toks, wbp) AS (
        |  SELECT word, CAST(len(word) AS INT), CAST([] AS VARCHAR[]), bp FROM fin1
        |  UNION ALL
        |  SELECT w.word, w.pos - w.wbp[w.pos],
        |    list_prepend(substr(w.word, w.pos - w.wbp[w.pos] + 1, w.wbp[w.pos]), w.toks),
        |    w.wbp
        |  FROM walk1 w WHERE w.pos > 0),
        |seg1 AS (SELECT word, toks FROM walk1 WHERE pos = 0),
        |cnt1 AS (
        |  SELECT sd.piece, CAST(COALESCE(SUM(t.n), 0) AS BIGINT) AS cnt
        |  FROM seed sd LEFT JOIN (
        |    SELECT unnest(g.toks) AS piece, w2.n
        |    FROM seg1 g JOIN wc w2 ON w2.word = g.word) t
        |    ON t.piece = sd.piece
        |  GROUP BY sd.piece),
        |inv2 AS (
        |  SELECT c.piece, CAST(length(c.piece) AS INT) AS plen,
        |    CAST(greatest(1, 2200 - 500 * length(c.piece)
        |      - (600 * c.cnt) // ((SELECT max(cnt) FROM cnt1) + 1)) AS BIGINT) AS pcost
        |  FROM cnt1 c
        |  UNION ALL
        |  SELECT piece, 1, CAST(2000 AS BIGINT) FROM chars),
        |st2(word, pos, best, bp, cl) AS (
        |  SELECT word, 0, [CAST(0 AS BIGINT)], CAST([] AS INT[]),
        |    (SELECT list(struct_pack(pp := piece, pl := plen, pc := pcost)) FROM inv2)
        |  FROM wc
        |  UNION ALL
        |  SELECT s.word, s.pos + 1, list_append(s.best, m.cc), list_append(s.bp, m.l), s.cl
        |  FROM st2 s JOIN LATERAL (
        |    SELECT s.best[s.pos + 2 - CAST(c['pl'] AS INT)] + c['pc'] AS cc,
        |      CAST(c['pl'] AS INT) AS l
        |    FROM unnest(s.cl) u(c)
        |    WHERE CAST(c['pl'] AS INT) <= s.pos + 1
        |      AND c['pp'] = substr(s.word, s.pos + 2 - CAST(c['pl'] AS INT), CAST(c['pl'] AS INT))
        |    ORDER BY cc, l DESC LIMIT 1) m ON true
        |  WHERE s.pos < len(s.word)),
        |fin2 AS (SELECT word, bp FROM st2 WHERE pos = len(word)),
        |walk2(word, pos, toks, wbp) AS (
        |  SELECT word, CAST(len(word) AS INT), CAST([] AS VARCHAR[]), bp FROM fin2
        |  UNION ALL
        |  SELECT w.word, w.pos - w.wbp[w.pos],
        |    list_prepend(substr(w.word, w.pos - w.wbp[w.pos] + 1, w.wbp[w.pos]), w.toks),
        |    w.wbp
        |  FROM walk2 w WHERE w.pos > 0),
        |seg2 AS (SELECT word, toks FROM walk2 WHERE pos = 0),
        |cnt2 AS (
        |  SELECT sd.piece, CAST(COALESCE(SUM(t.n), 0) AS BIGINT) AS cnt
        |  FROM seed sd LEFT JOIN (
        |    SELECT unnest(g.toks) AS piece, w2.n
        |    FROM seg2 g JOIN wc w2 ON w2.word = g.word) t
        |    ON t.piece = sd.piece
        |  GROUP BY sd.piece)
        |SELECT c2.piece, CAST(length(c2.piece) AS BIGINT) AS plen, c2.cnt,
        |  CAST(greatest(1, 2200 - 500 * length(c2.piece)
        |    - (600 * c2.cnt) // ((SELECT max(cnt) FROM cnt2) + 1)) AS BIGINT) AS cost
        |FROM cnt2 c2""".stripMargin,


    // Trained-unigram corpus encode: the FULL train chain (shared
    // shape with tok_unigram_train) -> final clamped costs as inv3 ->
    // a third Viterbi DP over the corpus words (inventory carried into
    // the recursion anchor) -> per-doc token streams and exact cost
    // totals.
    "tok_unigram_trained" ->
      """WITH RECURSIVE wc AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents)
        |  WHERE length(word) > 0 GROUP BY word
        |  ORDER BY n DESC, word LIMIT 65536),
        |subs AS (
        |  SELECT u AS piece, CAST(SUM(n) AS BIGINT) AS scnt FROM (
        |    SELECT n, unnest(flatten(list_transform([2, 3, 4], l ->
        |      list_transform(range(1, greatest(length(word) - l + 2, 1)),
        |        i -> substr(word, CAST(i AS INT), CAST(l AS INT)))))) AS u
        |    FROM wc)
        |  WHERE length(u) >= 2 GROUP BY u),
        |seed AS (SELECT piece FROM subs ORDER BY scnt DESC, piece LIMIT 48),
        |chars AS (
        |  SELECT DISTINCT ch AS piece FROM (
        |    SELECT unnest(string_split(word, '')) AS ch FROM wc)
        |  WHERE length(ch) = 1),
        |inv1 AS (
        |  SELECT piece, CAST(length(piece) AS INT) AS plen,
        |    CAST(2200 - 500 * length(piece) AS BIGINT) AS pcost FROM seed
        |  UNION ALL
        |  SELECT piece, 1, CAST(2000 AS BIGINT) FROM chars),
        |st1(word, pos, best, bp) AS (
        |  SELECT word, 0, [CAST(0 AS BIGINT)], CAST([] AS INT[]) FROM wc
        |  UNION ALL
        |  SELECT s.word, s.pos + 1, list_append(s.best, m.c), list_append(s.bp, m.l)
        |  FROM st1 s JOIN LATERAL (
        |    SELECT s.best[s.pos + 2 - v.plen] + v.pcost AS c, v.plen AS l
        |    FROM inv1 v
        |    WHERE v.plen <= s.pos + 1
        |      AND v.piece = substr(s.word, s.pos + 2 - v.plen, v.plen)
        |    ORDER BY c, l DESC LIMIT 1) m ON true
        |  WHERE s.pos < len(s.word)),
        |fin1 AS (SELECT word, bp FROM st1 WHERE pos = len(word)),
        |walk1(word, pos, toks, wbp) AS (
        |  SELECT word, CAST(len(word) AS INT), CAST([] AS VARCHAR[]), bp FROM fin1
        |  UNION ALL
        |  SELECT w.word, w.pos - w.wbp[w.pos],
        |    list_prepend(substr(w.word, w.pos - w.wbp[w.pos] + 1, w.wbp[w.pos]), w.toks),
        |    w.wbp
        |  FROM walk1 w WHERE w.pos > 0),
        |seg1 AS (SELECT word, toks FROM walk1 WHERE pos = 0),
        |cnt1 AS (
        |  SELECT sd.piece, CAST(COALESCE(SUM(t.n), 0) AS BIGINT) AS cnt
        |  FROM seed sd LEFT JOIN (
        |    SELECT unnest(g.toks) AS piece, w2.n
        |    FROM seg1 g JOIN wc w2 ON w2.word = g.word) t
        |    ON t.piece = sd.piece
        |  GROUP BY sd.piece),
        |inv2 AS (
        |  SELECT c.piece, CAST(length(c.piece) AS INT) AS plen,
        |    CAST(greatest(1, 2200 - 500 * length(c.piece)
        |      - (600 * c.cnt) // ((SELECT max(cnt) FROM cnt1) + 1)) AS BIGINT) AS pcost
        |  FROM cnt1 c
        |  UNION ALL
        |  SELECT piece, 1, CAST(2000 AS BIGINT) FROM chars),
        |st2(word, pos, best, bp, cl) AS (
        |  SELECT word, 0, [CAST(0 AS BIGINT)], CAST([] AS INT[]),
        |    (SELECT list(struct_pack(pp := piece, pl := plen, pc := pcost)) FROM inv2)
        |  FROM wc
        |  UNION ALL
        |  SELECT s.word, s.pos + 1, list_append(s.best, m.cc), list_append(s.bp, m.l), s.cl
        |  FROM st2 s JOIN LATERAL (
        |    SELECT s.best[s.pos + 2 - CAST(c['pl'] AS INT)] + c['pc'] AS cc,
        |      CAST(c['pl'] AS INT) AS l
        |    FROM unnest(s.cl) u(c)
        |    WHERE CAST(c['pl'] AS INT) <= s.pos + 1
        |      AND c['pp'] = substr(s.word, s.pos + 2 - CAST(c['pl'] AS INT), CAST(c['pl'] AS INT))
        |    ORDER BY cc, l DESC LIMIT 1) m ON true
        |  WHERE s.pos < len(s.word)),
        |fin2 AS (SELECT word, bp FROM st2 WHERE pos = len(word)),
        |walk2(word, pos, toks, wbp) AS (
        |  SELECT word, CAST(len(word) AS INT), CAST([] AS VARCHAR[]), bp FROM fin2
        |  UNION ALL
        |  SELECT w.word, w.pos - w.wbp[w.pos],
        |    list_prepend(substr(w.word, w.pos - w.wbp[w.pos] + 1, w.wbp[w.pos]), w.toks),
        |    w.wbp
        |  FROM walk2 w WHERE w.pos > 0),
        |seg2 AS (SELECT word, toks FROM walk2 WHERE pos = 0),
        |cnt2 AS (
        |  SELECT sd.piece, CAST(COALESCE(SUM(t.n), 0) AS BIGINT) AS cnt
        |  FROM seed sd LEFT JOIN (
        |    SELECT unnest(g.toks) AS piece, w2.n
        |    FROM seg2 g JOIN wc w2 ON w2.word = g.word) t
        |    ON t.piece = sd.piece
        |  GROUP BY sd.piece),
        |inv3 AS (
        |  SELECT c2.piece, CAST(length(c2.piece) AS INT) AS plen,
        |    CAST(greatest(1, 2200 - 500 * length(c2.piece)
        |      - (600 * c2.cnt) // ((SELECT max(cnt) FROM cnt2) + 1)) AS BIGINT) AS pcost
        |  FROM cnt2 c2
        |  UNION ALL
        |  SELECT piece, 1, CAST(2000 AS BIGINT) FROM chars),
        |st3(word, pos, best, bp, cl) AS (
        |  SELECT word, 0, [CAST(0 AS BIGINT)], CAST([] AS INT[]),
        |    (SELECT list(struct_pack(pp := piece, pl := plen, pc := pcost)) FROM inv3)
        |  FROM wc
        |  UNION ALL
        |  SELECT s.word, s.pos + 1, list_append(s.best, m.cc), list_append(s.bp, m.l), s.cl
        |  FROM st3 s JOIN LATERAL (
        |    SELECT s.best[s.pos + 2 - CAST(c['pl'] AS INT)] + c['pc'] AS cc,
        |      CAST(c['pl'] AS INT) AS l
        |    FROM unnest(s.cl) u(c)
        |    WHERE CAST(c['pl'] AS INT) <= s.pos + 1
        |      AND c['pp'] = substr(s.word, s.pos + 2 - CAST(c['pl'] AS INT), CAST(c['pl'] AS INT))
        |    ORDER BY cc, l DESC LIMIT 1) m ON true
        |  WHERE s.pos < len(s.word)),
        |fin3 AS (SELECT word, best[len(word) + 1] AS wcost, bp FROM st3 WHERE pos = len(word)),
        |walk3(word, pos, toks, wbp) AS (
        |  SELECT word, CAST(len(word) AS INT), CAST([] AS VARCHAR[]), bp FROM fin3
        |  UNION ALL
        |  SELECT w.word, w.pos - w.wbp[w.pos],
        |    list_prepend(substr(w.word, w.pos - w.wbp[w.pos] + 1, w.wbp[w.pos]), w.toks),
        |    w.wbp
        |  FROM walk3 w WHERE w.pos > 0),
        |seg3 AS (SELECT word, toks FROM walk3 WHERE pos = 0),
        |base AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> length(w) > 0) AS words
        |  FROM documents),
        |docw AS (
        |  SELECT doc_id, unnest(words) AS word, generate_subscripts(words, 1) AS ord FROM base),
        |agg AS (
        |  SELECT d.doc_id, flatten(list(g.toks ORDER BY d.ord)) AS flat,
        |    CAST(sum(f.wcost) AS BIGINT) AS tc
        |  FROM docw d JOIN seg3 g ON g.word = d.word JOIN fin3 f ON f.word = d.word
        |  GROUP BY d.doc_id)
        |SELECT b.doc_id,
        |  CAST(COALESCE(len(a.flat), 0) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(a.tc, 0) AS BIGINT) AS total_cost,
        |  COALESCE(array_to_string(a.flat, ' '), '') AS toks
        |FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id""".stripMargin,

    // Composed flagship: classifier gate (hashed-linear score > 0) ->
    // exact dedup (min doc_id per md5) -> Unigram Viterbi tokenize
    // (fixture inventory, md5 costs) -> 8-shard manifest with exact
    // token/cost totals and md5-xor checksums. Each stage reuses its
    // own proven oracle construction; this entry certifies the chain.
    "publish_unigram" ->
      """WITH RECURSIVE ctoks AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS tl
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id, text,
        |    list_concat(tl,
        |      CASE WHEN len(tl) < 2 THEN CAST([] AS VARCHAR[])
        |           ELSE list_transform(range(1, len(tl)),
        |                  i -> tl[i] || ' ' || tl[i + 1]) END) AS fl
        |  FROM ctoks),
        |scored AS (
        |  SELECT doc_id, text, CAST(len(fl) AS BIGINT) AS nf,
        |    CAST(list_sum(list_transform(fl, f ->
        |      CAST(CAST(concat('0x', substr(md5(concat('qw_',
        |        CAST(CAST(concat('0x', substr(md5(concat('qf_', f)), 1, 8)) AS UBIGINT) % 1024 AS VARCHAR))), 1, 8)) AS UBIGINT) % 2001 AS BIGINT) - 1000))
        |      AS BIGINT) AS tot
        |  FROM feats),
        |kept AS (SELECT doc_id, text FROM scored WHERE nf > 0 AND tot > 0),
        |ded AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text,
        |      min(doc_id) OVER (PARTITION BY md5(text)) AS keepid
        |    FROM kept) WHERE doc_id = keepid),
        |pc AS (
        |  SELECT p.piece, CAST(length(p.piece) AS INT) AS plen,
        |    2200 - 500 * length(p.piece)
        |      + CAST(CAST(concat('0x', substr(md5(concat('uc_', p.piece)), 1, 8)) AS UBIGINT) % 400 AS BIGINT) AS pcost
        |  FROM (VALUES ('th'),('the'),('he'),('er'),('st'),('est'),('ta'),('tab'),('ble'),('le'),('ab'),('ion'),('ing'),('ed'),('an'),('on'),('en'),('at'),('ll'),('ow'),('low'),('re'),('ter'),('al'),('ar'),('ro'),('li'),('ne')) p(piece)),
        |base AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> length(w) > 0) AS words
        |  FROM ded),
        |dw AS (SELECT DISTINCT unnest(words) AS word FROM base),
        |chars AS (
        |  SELECT DISTINCT ch AS piece, 1 AS plen, CAST(2000 AS BIGINT) AS pcost FROM (
        |    SELECT unnest(string_split(word, '')) AS ch FROM dw)
        |  WHERE length(ch) = 1
        |    AND ch NOT IN (SELECT piece FROM pc WHERE plen = 1)),
        |inv AS (SELECT * FROM pc UNION ALL SELECT * FROM chars),
        |st(word, pos, best, bp) AS (
        |  SELECT word, 0, [CAST(0 AS BIGINT)], CAST([] AS INT[]) FROM dw
        |  UNION ALL
        |  SELECT s.word, s.pos + 1, list_append(s.best, m.c), list_append(s.bp, m.l)
        |  FROM st s JOIN LATERAL (
        |    SELECT s.best[s.pos + 2 - v.plen] + v.pcost AS c, v.plen AS l
        |    FROM inv v
        |    WHERE v.plen <= s.pos + 1
        |      AND v.piece = substr(s.word, s.pos + 2 - v.plen, v.plen)
        |    ORDER BY c, l DESC LIMIT 1) m ON true
        |  WHERE s.pos < len(s.word)),
        |fin AS (SELECT word, best[len(word) + 1] AS wcost, bp FROM st WHERE pos = len(word)),
        |walk(word, pos, toks, wbp) AS (
        |  SELECT word, CAST(len(word) AS INT), CAST([] AS VARCHAR[]), bp FROM fin
        |  UNION ALL
        |  SELECT w.word, w.pos - w.wbp[w.pos],
        |    list_prepend(substr(w.word, w.pos - w.wbp[w.pos] + 1, w.wbp[w.pos]), w.toks),
        |    w.wbp
        |  FROM walk w WHERE w.pos > 0),
        |seg AS (SELECT word, toks FROM walk WHERE pos = 0),
        |docw AS (
        |  SELECT doc_id, unnest(words) AS word FROM base),
        |agg AS (
        |  SELECT d.doc_id,
        |    CAST(sum(len(g.toks)) AS BIGINT) AS ntok,
        |    CAST(sum(f.wcost) AS BIGINT) AS tcost
        |  FROM docw d JOIN seg g ON g.word = d.word JOIN fin f ON f.word = d.word
        |  GROUP BY d.doc_id),
        |perdoc AS (
        |  SELECT b.doc_id,
        |    COALESCE(a.ntok, 0) AS ntok, COALESCE(a.tcost, 0) AS tcost,
        |    CAST(CAST(concat('0x', substr(md5(concat('shard_', CAST(b.doc_id AS VARCHAR))), 1, 8)) AS UBIGINT) % 8 AS BIGINT) AS shard,
        |    CAST(CAST(concat('0x', substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS h
        |  FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  CAST(sum(tcost) AS BIGINT) AS total_cost,
        |  bit_xor(h) AS checksum
        |FROM perdoc GROUP BY shard""".stripMargin,

    // Unigram-LM Viterbi: the WHOLE dynamic program replayed per
    // distinct word — best-cost list built position by position (ties
    // ORDER BY cost, len DESC = kernel's longest-wins), backpointer
    // walk reconstructs the path, doc totals from exact integer word
    // costs. Inventory costs replay the md5 formula; every corpus
    // char is a 2000-cost fallback piece.
    "tok_unigram" ->
      """WITH RECURSIVE pc AS (
        |  SELECT p.piece, CAST(length(p.piece) AS INT) AS plen,
        |    2200 - 500 * length(p.piece)
        |      + CAST(CAST(concat('0x', substr(md5(concat('uc_', p.piece)), 1, 8)) AS UBIGINT) % 400 AS BIGINT) AS pcost
        |  FROM (VALUES ('th'),('the'),('he'),('er'),('st'),('est'),('ta'),('tab'),('ble'),('le'),('ab'),('ion'),('ing'),('ed'),('an'),('on'),('en'),('at'),('ll'),('ow'),('low'),('re'),('ter'),('al'),('ar'),('ro'),('li'),('ne')) p(piece)),
        |base AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> length(w) > 0) AS words
        |  FROM documents),
        |dw AS (SELECT DISTINCT unnest(words) AS word FROM base),
        |chars AS (
        |  SELECT DISTINCT ch AS piece, 1 AS plen, CAST(2000 AS BIGINT) AS pcost FROM (
        |    SELECT unnest(string_split(word, '')) AS ch FROM dw)
        |  WHERE length(ch) = 1
        |    AND ch NOT IN (SELECT piece FROM pc WHERE plen = 1)),
        |inv AS (SELECT * FROM pc UNION ALL SELECT * FROM chars),
        |st(word, pos, best, bp) AS (
        |  SELECT word, 0, [CAST(0 AS BIGINT)], CAST([] AS INT[]) FROM dw
        |  UNION ALL
        |  SELECT s.word, s.pos + 1,
        |    list_append(s.best, m.c), list_append(s.bp, m.l)
        |  FROM st s JOIN LATERAL (
        |    SELECT s.best[s.pos + 2 - v.plen] + v.pcost AS c, v.plen AS l
        |    FROM inv v
        |    WHERE v.plen <= s.pos + 1
        |      AND v.piece = substr(s.word, s.pos + 2 - v.plen, v.plen)
        |    ORDER BY c, l DESC LIMIT 1) m ON true
        |  WHERE s.pos < len(s.word)),
        |fin AS (SELECT word, best[len(word) + 1] AS wcost, bp FROM st WHERE pos = len(word)),
        |walk(word, pos, toks, wbp) AS (
        |  SELECT word, CAST(len(word) AS INT), CAST([] AS VARCHAR[]), bp FROM fin
        |  UNION ALL
        |  SELECT w.word, w.pos - w.wbp[w.pos],
        |    list_prepend(substr(w.word, w.pos - w.wbp[w.pos] + 1, w.wbp[w.pos]), w.toks),
        |    w.wbp
        |  FROM walk w WHERE w.pos > 0),
        |seg AS (SELECT word, toks FROM walk WHERE pos = 0),
        |docw AS (
        |  SELECT doc_id, unnest(words) AS word, generate_subscripts(words, 1) AS ord FROM base),
        |agg AS (
        |  SELECT d.doc_id, flatten(list(s2.toks ORDER BY d.ord)) AS flat,
        |    CAST(sum(f.wcost) AS BIGINT) AS tc
        |  FROM docw d JOIN seg s2 ON s2.word = d.word JOIN fin f ON f.word = d.word
        |  GROUP BY d.doc_id)
        |SELECT b.doc_id,
        |  CAST(COALESCE(len(a.flat), 0) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(a.tc, 0) AS BIGINT) AS total_cost,
        |  COALESCE(array_to_string(a.flat, ' '), '') AS toks
        |FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id""".stripMargin,

    // Unigram subword sampling: the tok_unigram Viterbi replay with
    // one extra term — every candidate piece's cost is perturbed by
    // md5 noise keyed on (word, piece), '0x'||substr(md5(...),1,8)
    // % 301 (the kernel reads the same first 4 digest bytes), then
    // the same argmin/longest-tie DP and backpointer walk.
    "tok_unigram_sampled" ->
      """WITH RECURSIVE pc AS (
        |  SELECT p.piece, CAST(length(p.piece) AS INT) AS plen,
        |    2200 - 500 * length(p.piece)
        |      + CAST(CAST(concat('0x', substr(md5(concat('uc_', p.piece)), 1, 8)) AS UBIGINT) % 400 AS BIGINT) AS pcost
        |  FROM (VALUES ('th'),('the'),('he'),('er'),('st'),('est'),('ta'),('tab'),('ble'),('le'),('ab'),('ion'),('ing'),('ed'),('an'),('on'),('en'),('at'),('ll'),('ow'),('low'),('re'),('ter'),('al'),('ar'),('ro'),('li'),('ne')) p(piece)),
        |base AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> length(w) > 0) AS words
        |  FROM documents),
        |dw AS (SELECT DISTINCT unnest(words) AS word FROM base),
        |chars AS (
        |  SELECT DISTINCT ch AS piece, 1 AS plen, CAST(2000 AS BIGINT) AS pcost FROM (
        |    SELECT unnest(string_split(word, '')) AS ch FROM dw)
        |  WHERE length(ch) = 1
        |    AND ch NOT IN (SELECT piece FROM pc WHERE plen = 1)),
        |inv AS (SELECT * FROM pc UNION ALL SELECT * FROM chars),
        |st(word, pos, best, bp) AS (
        |  SELECT word, 0, [CAST(0 AS BIGINT)], CAST([] AS INT[]) FROM dw
        |  UNION ALL
        |  SELECT s.word, s.pos + 1,
        |    list_append(s.best, m.c), list_append(s.bp, m.l)
        |  FROM st s JOIN LATERAL (
        |    SELECT s.best[s.pos + 2 - v.plen] + v.pcost
        |      + CAST(CAST(concat('0x', substr(md5(concat('useg_', s.word, '_', v.piece)), 1, 8)) AS UBIGINT) % 301 AS BIGINT) AS c,
        |      v.plen AS l
        |    FROM inv v
        |    WHERE v.plen <= s.pos + 1
        |      AND v.piece = substr(s.word, s.pos + 2 - v.plen, v.plen)
        |    ORDER BY c, l DESC LIMIT 1) m ON true
        |  WHERE s.pos < len(s.word)),
        |fin AS (SELECT word, best[len(word) + 1] AS wcost, bp FROM st WHERE pos = len(word)),
        |walk(word, pos, toks, wbp) AS (
        |  SELECT word, CAST(len(word) AS INT), CAST([] AS VARCHAR[]), bp FROM fin
        |  UNION ALL
        |  SELECT w.word, w.pos - w.wbp[w.pos],
        |    list_prepend(substr(w.word, w.pos - w.wbp[w.pos] + 1, w.wbp[w.pos]), w.toks),
        |    w.wbp
        |  FROM walk w WHERE w.pos > 0),
        |seg AS (SELECT word, toks FROM walk WHERE pos = 0),
        |docw AS (
        |  SELECT doc_id, unnest(words) AS word, generate_subscripts(words, 1) AS ord FROM base),
        |agg AS (
        |  SELECT d.doc_id, flatten(list(s2.toks ORDER BY d.ord)) AS flat,
        |    CAST(sum(f.wcost) AS BIGINT) AS tc
        |  FROM docw d JOIN seg s2 ON s2.word = d.word JOIN fin f ON f.word = d.word
        |  GROUP BY d.doc_id)
        |SELECT b.doc_id,
        |  CAST(COALESCE(len(a.flat), 0) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(a.tc, 0) AS BIGINT) AS total_cost,
        |  COALESCE(array_to_string(a.flat, ' '), '') AS toks
        |FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id""".stripMargin,

    // Trained-BPE corpus encode: the tok_bpe_merges train chain with
    // the WORD carried through every apply round, a final apply of the
    // rank-2 merge, then per-doc reassembly of each word's subword
    // string in order.
    "tok_bpe_trained" ->
      """WITH wc AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents)
        |  WHERE length(word) > 0 GROUP BY word
        |  ORDER BY n DESC, word LIMIT 65536),
        |v0 AS (
        |  SELECT word, ' ' || array_to_string(list_append(string_split(word, ''), '</w>'), ' ') || ' ' AS s, n
        |  FROM wc),
        |pc0 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v0) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m0 AS (SELECT a, b FROM pc0 ORDER BY cnt DESC, a, b LIMIT 1),
        |v1 AS (
        |  SELECT word, replace(replace(s,
        |      ' ' || (SELECT a FROM m0) || ' ' || (SELECT b FROM m0) || ' ',
        |      ' ' || (SELECT a FROM m0) || (SELECT b FROM m0) || ' '),
        |      ' ' || (SELECT a FROM m0) || ' ' || (SELECT b FROM m0) || ' ',
        |      ' ' || (SELECT a FROM m0) || (SELECT b FROM m0) || ' ') AS s, n
        |  FROM v0),
        |pc1 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v1) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m1 AS (SELECT a, b FROM pc1 ORDER BY cnt DESC, a, b LIMIT 1),
        |v2 AS (
        |  SELECT word, replace(replace(s,
        |      ' ' || (SELECT a FROM m1) || ' ' || (SELECT b FROM m1) || ' ',
        |      ' ' || (SELECT a FROM m1) || (SELECT b FROM m1) || ' '),
        |      ' ' || (SELECT a FROM m1) || ' ' || (SELECT b FROM m1) || ' ',
        |      ' ' || (SELECT a FROM m1) || (SELECT b FROM m1) || ' ') AS s, n
        |  FROM v1),
        |pc2 AS (
        |  SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(sy)), i -> {'a': sy[i], 'b': sy[i+1]})) AS p
        |    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM v2) WHERE len(sy) >= 2)
        |  GROUP BY 1, 2),
        |m2 AS (SELECT a, b FROM pc2 ORDER BY cnt DESC, a, b LIMIT 1),
        |v3 AS (
        |  SELECT word, replace(replace(s,
        |      ' ' || (SELECT a FROM m2) || ' ' || (SELECT b FROM m2) || ' ',
        |      ' ' || (SELECT a FROM m2) || (SELECT b FROM m2) || ' '),
        |      ' ' || (SELECT a FROM m2) || ' ' || (SELECT b FROM m2) || ' ',
        |      ' ' || (SELECT a FROM m2) || (SELECT b FROM m2) || ' ') AS s, n
        |  FROM v2),
        |wmap AS (SELECT word, string_split(trim(s), ' ') AS syms FROM v3),
        |base AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> length(w) > 0) AS words
        |  FROM documents),
        |docw AS (
        |  SELECT doc_id, unnest(words) AS word, generate_subscripts(words, 1) AS ord FROM base),
        |agg AS (
        |  SELECT d.doc_id, flatten(list(w.syms ORDER BY d.ord)) AS flat
        |  FROM docw d JOIN wmap w ON w.word = d.word
        |  GROUP BY d.doc_id)
        |SELECT b.doc_id,
        |  CAST(COALESCE(len(a.flat), 0) AS BIGINT) AS n_tokens,
        |  COALESCE(array_to_string(a.flat, ' '), '') AS toks
        |FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id""".stripMargin,

    // WordPiece trainer, 3 rounds unrolled (the tok_bpe_merges
    // convention): same frequency-capped word table, symbols = first
    // char + ##-continuations (no </w>), winner = max LIKELIHOOD
    // score cnt_ab/(cnt_a*cnt_b) — one IEEE double division of exact
    // integers, bit-identical across engines — ties to (a, b); fusion
    // strips the right side's ## marker. Output carries the integer
    // counts, so the compared table is FP-free.
    "tok_wordpiece_train" ->
      s"""WITH $WP_TRAIN_CTES
        |SELECT CAST(0 AS BIGINT) AS rank, a, b, fused, cnt_ab, cnt_a, cnt_b FROM m0
        |UNION ALL SELECT CAST(1 AS BIGINT), a, b, fused, cnt_ab, cnt_a, cnt_b FROM m1
        |UNION ALL SELECT CAST(2 AS BIGINT), a, b, fused, cnt_ab, cnt_a, cnt_b FROM m2""".stripMargin,

    // The full trained tokenizer replayed: 3-round likelihood training
    // (shared WP_TRAIN_CTES) -> induced vocab (corpus char alphabet as
    // bare + ## pieces, from the SAME capped word table, plus the three
    // fused pieces) -> the shared greedy longest-match encode. n_fused
    // counts tokens where a trained multi-char piece fired.
    "tok_wordpiece_trained" ->
      s"""WITH RECURSIVE $WP_TRAIN_CTES,
        |alpha AS (
        |  SELECT DISTINCT ch FROM (
        |    SELECT unnest(string_split(word, '')) AS ch FROM wc)
        |  WHERE length(ch) > 0),
        |vocab(piece) AS (
        |  SELECT ch FROM alpha
        |  UNION SELECT '##' || ch FROM alpha
        |  UNION SELECT fused FROM m0
        |  UNION SELECT fused FROM m1
        |  UNION SELECT fused FROM m2),
        |$WP_GREEDY_CTES
        |SELECT b.doc_id,
        |  CAST(COALESCE(len(a.flat), 0) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(len(list_filter(a.flat,
        |    tk -> length(regexp_replace(tk, '^##', '')) >= 2)), 0) AS BIGINT) AS n_fused,
        |  COALESCE(array_to_string(a.flat, ' '), '') AS toks
        |FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id""".stripMargin,

    // WordPiece ids: the SAME recursive-CTE pieces as tok_wordpiece,
    // then ids = 1-based position in the ORDERED vocab list (built to
    // mirror WordPiece.fixtureVocab element order exactly: filtered
    // a–z, digits, ## forms of both, multi pieces), 0 for [UNK]/miss.
    // vl rides a CROSS JOIN because DuckDB lambdas cannot contain
    // subqueries — the list must arrive as a plain column.
    "tok_wordpiece_ids" ->
      """WITH RECURSIVE vocab(piece) AS (
        |  SELECT chr(CAST(x AS INT)) FROM range(97, 123) t1(x)
        |    WHERE chr(CAST(x AS INT)) NOT IN ('q', 'x', 'z')
        |  UNION ALL SELECT chr(CAST(x AS INT)) FROM range(48, 58) t2(x)
        |  UNION ALL SELECT '##' || chr(CAST(x AS INT)) FROM range(97, 123) t3(x)
        |    WHERE chr(CAST(x AS INT)) NOT IN ('q', 'x', 'z')
        |  UNION ALL SELECT '##' || chr(CAST(x AS INT)) FROM range(48, 58) t4(x)
        |  UNION ALL SELECT * FROM (VALUES ('the'),('ta'),('tab'),('##le'),('##er'),('##st'),
        |    ('##ing'),('##ed'),('##es'),('##al'),('##ow'),('##an'),('##on')) vm(vp)),
        |vl AS (SELECT
        |  (SELECT list(chr(CAST(x AS INT)) ORDER BY x) FROM range(97,123) t5(x)
        |     WHERE chr(CAST(x AS INT)) NOT IN ('q','x','z'))
        |  || (SELECT list(chr(CAST(x AS INT)) ORDER BY x) FROM range(48,58) t6(x))
        |  || (SELECT list('##' || chr(CAST(x AS INT)) ORDER BY x) FROM range(97,123) t7(x)
        |     WHERE chr(CAST(x AS INT)) NOT IN ('q','x','z'))
        |  || (SELECT list('##' || chr(CAST(x AS INT)) ORDER BY x) FROM range(48,58) t8(x))
        |  || ['the','ta','tab','##le','##er','##st','##ing','##ed','##es','##al','##ow','##an','##on'] AS v),
        |base AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> length(w) > 0) AS words
        |  FROM documents WHERE doc_id < 100),
        |dw AS (SELECT DISTINCT unnest(words) AS word FROM base),
        |st(word, pos, toks, dead) AS (
        |  SELECT word, 1, CAST([] AS VARCHAR[]), false FROM dw
        |  UNION ALL
        |  SELECT s.word,
        |    CASE WHEN m.mlen IS NULL THEN len(s.word) + 1 ELSE s.pos + m.mlen END,
        |    CASE WHEN m.mlen IS NULL THEN s.toks ELSE list_append(s.toks, m.piece) END,
        |    m.mlen IS NULL
        |  FROM st s LEFT JOIN LATERAL (
        |    SELECT v.piece,
        |      len(CASE WHEN s.pos > 1 THEN substr(v.piece, 3) ELSE v.piece END) AS mlen
        |    FROM vocab v
        |    WHERE (s.pos = 1 AND v.piece NOT LIKE '##%'
        |           AND substr(s.word, s.pos, len(v.piece)) = v.piece)
        |       OR (s.pos > 1 AND v.piece LIKE '##%'
        |           AND len(v.piece) > 2
        |           AND substr(s.word, s.pos, len(v.piece) - 2) = substr(v.piece, 3))
        |    ORDER BY mlen DESC, v.piece LIMIT 1) m ON true
        |  WHERE s.pos <= len(s.word) AND NOT s.dead),
        |wp AS (
        |  SELECT word, CASE WHEN dead THEN ['[UNK]'] ELSE toks END AS wtoks
        |  FROM st WHERE dead OR pos = len(word) + 1),
        |docw AS (
        |  SELECT doc_id, unnest(words) AS word, generate_subscripts(words, 1) AS ord
        |  FROM base),
        |agg AS (
        |  SELECT d.doc_id, flatten(list(w.wtoks ORDER BY d.ord)) AS flat
        |  FROM docw d JOIN wp w ON w.word = d.word
        |  GROUP BY d.doc_id)
        |SELECT b.doc_id,
        |  CAST(COALESCE(len(a.flat), 0) AS BIGINT) AS n_tokens,
        |  COALESCE(array_to_string(list_transform(a.flat,
        |    tk -> CAST(COALESCE(list_position(vl.v, tk), 0) AS BIGINT)), ' '), '') AS ids
        |FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id CROSS JOIN vl""".stripMargin,

    // Expectations: one scalar-subquery pair per rule (NULL predicate
    // = FAIL via NOT COALESCE(p, false), mirroring the engine's
    // conservative convention); uniqueness as surplus-over-distinct;
    // FK as null-extended-join orphan count.
    "dq_expectations" ->
      """WITH tot AS (SELECT count(*) AS n FROM orders)
        |SELECT 'not_null:o_custkey' AS rule, tot.n AS n_rows,
        |  (SELECT count(*) FROM orders WHERE NOT COALESCE(o_custkey IS NOT NULL, false)) AS n_fail,
        |  (SELECT count(*) FROM orders WHERE NOT COALESCE(o_custkey IS NOT NULL, false)) = 0 AS passed
        |FROM tot
        |UNION ALL
        |SELECT 'range:o_totalprice', tot.n,
        |  (SELECT count(*) FROM orders WHERE NOT COALESCE(o_totalprice >= 0 AND o_totalprice <= 400000, false)),
        |  (SELECT count(*) FROM orders WHERE NOT COALESCE(o_totalprice >= 0 AND o_totalprice <= 400000, false)) = 0
        |FROM tot
        |UNION ALL
        |SELECT 'in_set:o_orderstatus', tot.n,
        |  (SELECT count(*) FROM orders WHERE NOT COALESCE(o_orderstatus IN ('O','F','P'), false)),
        |  (SELECT count(*) FROM orders WHERE NOT COALESCE(o_orderstatus IN ('O','F','P'), false)) = 0
        |FROM tot
        |UNION ALL
        |SELECT 'pattern:o_orderpriority', tot.n,
        |  (SELECT count(*) FROM orders WHERE NOT COALESCE(regexp_matches(o_orderpriority, '^[1-5]-'), false)),
        |  (SELECT count(*) FROM orders WHERE NOT COALESCE(regexp_matches(o_orderpriority, '^[1-5]-'), false)) = 0
        |FROM tot
        |UNION ALL
        |SELECT 'date_max:o_orderdate', tot.n,
        |  (SELECT count(*) FROM orders WHERE NOT COALESCE(o_orderdate < TIMESTAMP '2001-01-01', false)),
        |  (SELECT count(*) FROM orders WHERE NOT COALESCE(o_orderdate < TIMESTAMP '2001-01-01', false)) = 0
        |FROM tot
        |UNION ALL
        |SELECT 'unique:o_orderkey', tot.n,
        |  tot.n - (SELECT count(DISTINCT o_orderkey) FROM orders),
        |  tot.n - (SELECT count(DISTINCT o_orderkey) FROM orders) = 0
        |FROM tot
        |UNION ALL
        |SELECT 'fk:o_custkey->customer.c_custkey', tot.n,
        |  (SELECT count(*) FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL),
        |  (SELECT count(*) FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) = 0
        |FROM tot""".stripMargin,

    // Hilbert layout stats: same quantizer/slabs as layout_zorder;
    // the xy→d rotate/flip loop (HilbertKernel.xy2d) unrolled as one
    // CTE per level, s = 2^11 … 1 — each level adds s²·((3rx) xor ry)
    // and conditionally flips+swaps the (hx, hy) state, so the curve
    // index is replayed bit-exactly in plain integer SQL.
    "layout_hilbert" -> {
      def level(prev: String, out: String, s: Long): String = {
        val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
        val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
        s"""$out AS (
           |  SELECT x, y,
           |    d + ${s * s} * (CASE WHEN $rx = 1 AND $ry = 0 THEN 3
           |      WHEN $rx = 1 AND $ry = 1 THEN 2
           |      WHEN $ry = 1 THEN 1 ELSE 0 END) AS d,
           |    CASE WHEN $ry = 0
           |      THEN (CASE WHEN $rx = 1 THEN ${s - 1} - hy ELSE hy END)
           |      ELSE hx END AS hx,
           |    CASE WHEN $ry = 0
           |      THEN (CASE WHEN $rx = 1 THEN ${s - 1} - hx ELSE hx END)
           |      ELSE hy END AS hy
           |  FROM $prev)""".stripMargin
      }
      val levels = (11 to 0 by -1).zipWithIndex.map { case (b, i) =>
        level(if (i == 0) "q" else s"h${i - 1}", s"h$i", 1L << b)
      }.mkString(",\n")
      s"""WITH k AS (
         |  SELECT CAST(l_orderkey AS BIGINT) AS x, CAST(l_partkey AS BIGINT) AS y FROM lineitem),
         |mm AS (
         |  SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax FROM k),
         |q AS (
         |  SELECT x, y, CAST(0 AS BIGINT) AS d,
         |    ((x - mm.xmin) * 4096) // (mm.xmax - mm.xmin + 1) AS hx,
         |    ((y - mm.ymin) * 4096) // (mm.ymax - mm.ymin + 1) AS hy
         |  FROM k, mm),
         |$levels
         |SELECT d // 262144 AS file_id, count(*) AS n_rows,
         |  min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
         |FROM h11 GROUP BY 1""".stripMargin
    },

    // Z-order layout stats: exact-integer quantization (integer //,
    // never a double), Morton interleave as a per-bit shift/mask sum
    // (all terms ≤ 2^23, exact), fixed-z-space file slabs.
    "layout_zorder" ->
      """WITH k AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS x, CAST(l_partkey AS BIGINT) AS y FROM lineitem),
        |mm AS (
        |  SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax FROM k),
        |q AS (
        |  SELECT x, y,
        |    ((x - mm.xmin) * 4096) // (mm.xmax - mm.xmin + 1) AS qx,
        |    ((y - mm.ymin) * 4096) // (mm.ymax - mm.ymin + 1) AS qy
        |  FROM k, mm),
        |z AS (
        |  SELECT x, y,
        |    (SELECT CAST(sum((((qx >> CAST(i AS INT)) & 1) << CAST(2 * i AS INT))
        |               + (((qy >> CAST(i AS INT)) & 1) << CAST(2 * i + 1 AS INT))) AS BIGINT)
        |     FROM range(0, 12) t(i)) AS zv
        |  FROM q)
        |SELECT zv // 262144 AS file_id, count(*) AS n_rows,
        |  min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
        |FROM z GROUP BY 1""".stripMargin,

    // Zone-map pruning audit: the layout_zorder Morton rebuild plus a
    // linear (qx-slab) layout, probe bounds the same integer eighths
    // formula, overlap/selectivity all exact counts — mirrors
    // Layout.skippingReport (bits=12, nfiles=64, slab 262144 / 64).
    "layout_skipping" ->
      """WITH k AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS x, CAST(l_partkey AS BIGINT) AS y FROM lineitem),
        |mm AS (
        |  SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax FROM k),
        |q AS (
        |  SELECT x, y,
        |    ((x - mm.xmin) * 4096) // (mm.xmax - mm.xmin + 1) AS qx,
        |    ((y - mm.ymin) * 4096) // (mm.ymax - mm.ymin + 1) AS qy
        |  FROM k, mm),
        |z AS (
        |  SELECT x, y, qx,
        |    (SELECT CAST(sum((((qx >> CAST(i AS INT)) & 1) << CAST(2 * i AS INT))
        |               + (((qy >> CAST(i AS INT)) & 1) << CAST(2 * i + 1 AS INT))) AS BIGINT)
        |     FROM range(0, 12) t(i)) AS zv
        |  FROM q),
        |a AS (SELECT x, y, zv // 262144 AS zf, qx // 64 AS lf FROM z),
        |st AS (
        |  SELECT 'zorder' AS layout, zf AS file_id, count(*) AS n_rows,
        |    min(x) AS xmn, max(x) AS xmx, min(y) AS ymn, max(y) AS ymx
        |  FROM a GROUP BY 2
        |  UNION ALL
        |  SELECT 'linear', lf, count(*), min(x), max(x), min(y), max(y)
        |  FROM a GROUP BY 2),
        |pr AS (SELECT * FROM (VALUES
        |  ('l_orderkey:1-2', 'x', 1, 2),
        |  ('l_partkey:3-4', 'y', 3, 4),
        |  ('l_partkey:0-8', 'y', 0, 8)) p(probe, pc, lo8, hi8)),
        |pb AS (
        |  SELECT probe, pc,
        |    CASE WHEN pc = 'x' THEN mm.xmin + ((mm.xmax - mm.xmin + 1) * lo8) // 8
        |         ELSE mm.ymin + ((mm.ymax - mm.ymin + 1) * lo8) // 8 END AS plo,
        |    CASE WHEN pc = 'x' THEN mm.xmin + ((mm.xmax - mm.xmin + 1) * hi8) // 8 - 1
        |         ELSE mm.ymin + ((mm.ymax - mm.ymin + 1) * hi8) // 8 - 1 END AS phi
        |  FROM pr, mm),
        |sel AS (
        |  SELECT pb.probe,
        |    CAST(count(*) FILTER (WHERE
        |      (CASE WHEN pb.pc = 'x' THEN a.x ELSE a.y END)
        |        BETWEEN pb.plo AND pb.phi) AS BIGINT) AS rows_sel
        |  FROM a, pb GROUP BY 1),
        |audit AS (
        |  SELECT st.layout, pb.probe,
        |    count(*) AS files_total,
        |    CAST(sum(CASE WHEN pb.plo <= (CASE WHEN pb.pc = 'x' THEN st.xmx ELSE st.ymx END)
        |          AND pb.phi >= (CASE WHEN pb.pc = 'x' THEN st.xmn ELSE st.ymn END)
        |        THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
        |    CAST(sum(CASE WHEN pb.plo <= (CASE WHEN pb.pc = 'x' THEN st.xmx ELSE st.ymx END)
        |          AND pb.phi >= (CASE WHEN pb.pc = 'x' THEN st.xmn ELSE st.ymn END)
        |        THEN st.n_rows ELSE 0 END) AS BIGINT) AS rows_read
        |  FROM st, pb GROUP BY 1, 2)
        |SELECT audit.layout, audit.probe, CAST(files_total AS BIGINT) AS files_total,
        |  files_read, rows_read, sel.rows_sel
        |FROM audit JOIN sel USING (probe)""".stripMargin,

    // WordPiece greedy longest-match as a recursive CTE over DISTINCT
    // words: each step LATERAL-probes the vocab for the longest piece
    // matching at the cursor (## continuations past position 1); a
    // failed position marks the word dead → whole-word [UNK]. Vocab =
    // letters/digits minus q/x/z (start + ## forms, generated via chr)
    // plus the multi-char fixture pieces — must mirror
    // WordPiece.fixtureVocab exactly.
    "tok_wordpiece" ->
      s"""WITH RECURSIVE $WP_FIXTURE_VOCAB,
        |$WP_GREEDY_CTES
        |SELECT b.doc_id,
        |  CAST(COALESCE(len(a.flat), 0) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(len(list_filter(a.flat, tk -> tk = '[UNK]')), 0) AS BIGINT) AS n_unk,
        |  COALESCE(array_to_string(a.flat, ' '), '') AS toks
        |FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id""".stripMargin,

    // Coverage / OOV report: the same greedy-encode replay aggregated
    // into the rollout go/no-go metrics — every ratio recomputed from
    // the oracle's own integer counts ([UNK]s excluded from fertility
    // on both faces), NULL where a denominator is zero.
    "tok_coverage" ->
      s"""WITH RECURSIVE $WP_FIXTURE_VOCAB,
        |$WP_GREEDY_CTES,
        |cov AS (
        |  SELECT b.doc_id,
        |    CAST(len(b.words) AS BIGINT) AS n_words,
        |    CAST(COALESCE(len(a.flat), 0) AS BIGINT) AS n_tokens,
        |    CAST(COALESCE(len(list_filter(a.flat, tk -> tk = '[UNK]')), 0) AS BIGINT) AS n_oov_words
        |  FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id)
        |SELECT doc_id, n_words, n_tokens, n_oov_words,
        |  CASE WHEN n_words > 0
        |    THEN round(CAST(n_oov_words AS DOUBLE) / n_words, 4) END AS oov_rate,
        |  CASE WHEN n_words - n_oov_words > 0
        |    THEN round(CAST(n_tokens - n_oov_words AS DOUBLE)
        |      / (n_words - n_oov_words), 4) END AS fertility
        |FROM cov""".stripMargin,

    // BPE invertibility from outside the tokenizer: the oracle builds
    // the decode(encode(x)) fixed point straight from the raw text —
    // lowercased words joined by single spaces — without modeling a
    // single merge (merges only concatenate, so they cancel).
    "tok_bpe_roundtrip" ->
      """SELECT doc_id,
        |  array_to_string(list_filter(string_split_regex(lower(text), '\s+'),
        |    w -> length(w) > 0), ' ') AS rebuilt
        |FROM documents""".stripMargin,

    "text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
        |  round(CAST(length(text) AS DOUBLE)
        |    / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE), 4) AS chars_per_token,
        |  round(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        |    / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
        |  round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        |    / CAST(length(text) AS DOUBLE), 4) AS digit_ratio,
        |  round(CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t IN ('the','of','and','to','in','is','that','for'))) AS DOUBLE)
        |    / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE), 4) AS stopword_ratio
        |FROM documents""".stripMargin,

    "text_fingerprint" ->
      "SELECT doc_id, md5(text) AS fp_md5 FROM documents",

    // No-split packing: next-fit is prefix-recursive, so the oracle
    // steps one row per bucket per recursion round (bounded by the
    // largest bucket's row count). Same bucket width rule as the
    // engine: max(doc_id) div buckets + 1.
    "pack_no_split" ->
      s"""WITH RECURSIVE $PACK_NO_SPLIT_CTES
        |SELECT doc_id, n_tokens, bucket, seq AS seq_in_bucket,
        |  fill - n_tokens AS offset_in_seq
        |FROM st""".stripMargin,

    // Best-fit-decreasing packing: recursive CTE carrying the open-bin
    // load/count LISTS per bucket — one recursion step per doc in
    // (n_tokens DESC, doc_id) order; placement = fullest fitting bin
    // (list_max of the fitting loads, first index on ties), append on
    // no fit. Mirrors Packing.packBfdCounts decision-for-decision.
    "pack_bfd" -> {
      val fits = "list_filter(s.loads, x -> x + t.n_tokens <= 256)"
      val idx = s"list_indexof(s.loads, list_max($fits))"
      s"""WITH RECURSIVE t0 AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |w AS (SELECT greatest(max(doc_id) // 16 + 1, 1) AS width FROM t0),
         |t1 AS (SELECT doc_id, n_tokens,
         |         doc_id // (SELECT width FROM w) AS bucket FROM t0),
         |t2 AS (SELECT doc_id, n_tokens, bucket,
         |         row_number() OVER (PARTITION BY bucket
         |           ORDER BY n_tokens DESC, doc_id) AS rn
         |       FROM t1),
         |st(bucket, rn, loads, counts) AS (
         |  SELECT bucket, 1, [n_tokens], [CAST(1 AS BIGINT)]
         |  FROM t2 WHERE rn = 1
         |  UNION ALL
         |  SELECT t.bucket, t.rn,
         |    CASE WHEN list_max($fits) IS NULL
         |      THEN list_append(s.loads, t.n_tokens)
         |      ELSE list_transform(range(1, len(s.loads) + 1),
         |        j -> CASE WHEN j = $idx
         |          THEN s.loads[j] + t.n_tokens ELSE s.loads[j] END) END,
         |    CASE WHEN list_max($fits) IS NULL
         |      THEN list_append(s.counts, CAST(1 AS BIGINT))
         |      ELSE list_transform(range(1, len(s.counts) + 1),
         |        j -> CASE WHEN j = $idx
         |          THEN s.counts[j] + 1 ELSE s.counts[j] END) END
         |  FROM st s JOIN t2 t ON t.bucket = s.bucket AND t.rn = s.rn + 1),
         |fin AS (SELECT bucket, loads, counts,
         |  row_number() OVER (PARTITION BY bucket ORDER BY rn DESC) AS rr
         |  FROM st),
         |f2 AS (SELECT bucket, loads, counts FROM fin WHERE rr = 1),
         |ex AS (SELECT bucket,
         |  unnest(list_transform(range(1, len(loads) + 1),
         |    j -> {'bin_idx': j - 1, 'bin_load': loads[j],
         |          'n_docs': counts[j]})) AS e
         |  FROM f2)
         |SELECT bucket, CAST(e.bin_idx AS BIGINT) AS bin_idx,
         |  e.bin_load, e.n_docs
         |FROM ex""".stripMargin
    },

    // Packing-efficiency report: the same next-fit recursion, then an
    // independent per-(bucket, seq) re-aggregation into the padding /
    // fill-ratio audit (padding floored at 0 for oversize singles).
    "pack_efficiency" ->
      s"""WITH RECURSIVE $PACK_NO_SPLIT_CTES
        |SELECT bucket, seq AS seq_in_bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS tokens_used,
        |  CAST(greatest(0, 2048 - sum(n_tokens)) AS BIGINT) AS padding,
        |  round(CAST(sum(n_tokens) AS DOUBLE) / 2048.0, 4) AS fill_ratio
        |FROM st GROUP BY bucket, seq""".stripMargin,

    // Concat-and-chunk packing: the oracle uses the naive global
    // running sum (fine at oracle scale); the engine computes the same
    // offsets with a distributed two-phase prefix sum.
    "pack_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS t_start
        |  FROM toks)
        |SELECT doc_id, n_tokens, t_start,
        |  t_start // 2048 AS first_chunk,
        |  (t_start + n_tokens - 1) // 2048 AS last_chunk,
        |  t_start % 2048 AS chunk_offset
        |FROM c""".stripMargin,

    // Gopher quality rules: identical int-exact numerators and double
    // divisions both sides; keep flag thresholds the unrounded values.
    "text_gopher_filter" ->
      """WITH tok AS (
        |  SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
        |      / len(toks) AS mean_len,
        |    CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS DOUBLE)
        |      / len(toks) AS sym,
        |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
        |      / len(toks) AS alpha,
        |    CAST(list_contains(toks, 'the') AS INT) + CAST(list_contains(toks, 'be') AS INT)
        |      + CAST(list_contains(toks, 'to') AS INT) + CAST(list_contains(toks, 'of') AS INT)
        |      + CAST(list_contains(toks, 'and') AS INT) + CAST(list_contains(toks, 'that') AS INT)
        |      + CAST(list_contains(toks, 'have') AS INT) + CAST(list_contains(toks, 'with') AS INT)
        |      AS sd
        |  FROM tok)
        |SELECT doc_id, n_words,
        |  round(mean_len, 4) AS mean_word_len,
        |  round(sym, 4) AS symbol_ratio,
        |  round(alpha, 4) AS alpha_word_ratio,
        |  CAST(sd AS BIGINT) AS stop_distinct,
        |  (n_words BETWEEN 50 AND 100000) AND mean_len >= 3 AND mean_len <= 10
        |    AND sym <= 0.1 AND alpha > 0.8 AND sd >= 2 AS keep
        |FROM s""".stripMargin,

    // Repetition: bigram construction mirrors zip_with over adjacent
    // token slices; docs with <2 tokens have no bigrams → share 0.
    "text_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |base AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS nd
        |  FROM tok),
        |gr AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(toks)),
        |      s -> concat_ws(' ', toks[s], toks[s+1]))) AS g
        |  FROM tok),
        |gc AS (SELECT doc_id, g, count(*) AS c FROM gr GROUP BY doc_id, g),
        |gm AS (SELECT doc_id, max(c) AS maxc, sum(c) AS tot FROM gc GROUP BY doc_id)
        |SELECT b.doc_id, b.n AS n_tokens,
        |  round(1 - CAST(nd AS DOUBLE) / b.n, 4) AS dup_token_frac,
        |  round(COALESCE(CAST(maxc AS DOUBLE) / tot, 0), 4) AS top_bigram_frac
        |FROM base b LEFT JOIN gm ON b.doc_id = gm.doc_id""".stripMargin,

    // PII redaction: same pattern order as TextAnalysis.piiPatterns,
    // each stage counting on the previous stage's redacted text.
    // Patterns are in the Java-regex ∩ RE2 common subset.
    "text_pii_redact" ->
      """WITH s0 AS (SELECT doc_id, text AS t0, CAST(0 AS BIGINT) AS n0 FROM documents),
        |s1 AS (SELECT doc_id,
        |  regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1,
        |  n0 + len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n1 FROM s0),
        |s2 AS (SELECT doc_id,
        |  regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2,
        |  n1 + len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n2 FROM s1),
        |s3 AS (SELECT doc_id,
        |  regexp_replace(t2, '\b\d{3}[- .]\d{3}[- .]\d{4}\b', '<PHONE>', 'g') AS t3,
        |  n2 + len(regexp_extract_all(t2, '\b\d{3}[- .]\d{3}[- .]\d{4}\b')) AS n3 FROM s2),
        |s4 AS (SELECT doc_id,
        |  regexp_replace(t3, '\+\d{7,15}\b', '<PHONE>', 'g') AS t4,
        |  n3 + len(regexp_extract_all(t3, '\+\d{7,15}\b')) AS n4 FROM s3)
        |SELECT doc_id, t4 AS clean_text, CAST(n4 AS BIGINT) AS n_pii FROM s4""".stripMargin,

    // Per-source PII audit: the text_pii_redact sequential-count chain
    // with PER-TYPE counts carried per doc (both phone patterns fold
    // into one type), grouped by source with single-division rates.
    "text_pii_audit" ->
      """WITH s0 AS (SELECT doc_id, source, text AS t0 FROM documents),
        |s1 AS (SELECT doc_id, source,
        |  regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1,
        |  len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne FROM s0),
        |s2 AS (SELECT doc_id, source, ne,
        |  regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2,
        |  len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS nip FROM s1),
        |s3 AS (SELECT doc_id, source, ne, nip,
        |  regexp_replace(t2, '\b\d{3}[- .]\d{3}[- .]\d{4}\b', '<PHONE>', 'g') AS t3,
        |  len(regexp_extract_all(t2, '\b\d{3}[- .]\d{3}[- .]\d{4}\b')) AS np1 FROM s2),
        |s4 AS (SELECT doc_id, source, ne, nip, np1,
        |  len(regexp_extract_all(t3, '\+\d{7,15}\b')) AS np2 FROM s3)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ne) AS BIGINT) AS n_email,
        |  CAST(sum(nip) AS BIGINT) AS n_ip,
        |  CAST(sum(np1 + np2) AS BIGINT) AS n_phone,
        |  CAST(sum(CASE WHEN ne + nip + np1 + np2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
        |  round(CAST(sum(CASE WHEN ne + nip + np1 + np2 > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 9) AS pii_doc_rate
        |FROM s4 GROUP BY source""".stripMargin,

    // Unicode normalization: the oracle rebuilds the identical
    // decomposed decoration (every 'e' → 'e' + U+0301) and applies
    // DuckDB's own nfc_normalize / strip_accents — the hash match
    // certifies the native kernels against an independent UAX #15
    // implementation (utf8proc), not a replay of our own.
    "text_normalize" ->
      """WITH raw AS (
        |  SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS r
        |  FROM documents),
        |n AS (SELECT doc_id, r, nfc_normalize(r) AS nf FROM raw)
        |SELECT doc_id, CAST(length(r) AS BIGINT) AS n_raw,
        |  CAST(length(nf) AS BIGINT) AS n_nfc,
        |  CAST(length(strip_accents(nf)) AS BIGINT) AS n_stripped,
        |  substr(nf, 1, 60) AS nfc_head,
        |  substr(strip_accents(nf), 1, 60) AS stripped_head
        |FROM n""".stripMargin,

    "text_vocab" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 500""".stripMargin,

    "corpus_reweight" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CASE
        |  WHEN lang = 'en' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
        |  WHEN lang = 'es' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'c0000000'
        |  ELSE TRUE END""".stripMargin,

    // Target-mix resampling: per-lang rates from exact integer counts
    // (single fixed double expression, DOUBLE-cast literals), hex
    // threshold recomputed per row — identical tree to the engine's.
    "corpus_mix_target" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |t AS (SELECT count(*) AS total FROM documents),
        |r AS (SELECT lang, least(CAST(1.0 AS DOUBLE),
        |    CASE lang WHEN 'en' THEN CAST(0.3 AS DOUBLE)
        |              WHEN 'zh' THEN CAST(0.2 AS DOUBLE)
        |              WHEN 'es' THEN CAST(0.1 AS DOUBLE) ELSE NULL END
        |      * CAST(total AS DOUBLE) / CAST(cnt AS DOUBLE)) AS rate
        |  FROM c CROSS JOIN t)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
        |WHERE r.rate IS NULL OR r.rate >= 1.0
        |  OR substr(md5(concat('mix:', CAST(d.doc_id AS VARCHAR))), 1, 8)
        |     < lpad(lower(hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT))), 8, '0')""".stripMargin,

    // Temperature mix: rate = round(pow(cnt/min, alpha-1), 6) — the
    // 6-decimal round (both engines) absorbs last-ulp libm pow skew
    // before the 2^32 keep threshold.
    "corpus_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |m AS (SELECT min(cnt) AS minc FROM c),
        |r AS (SELECT lang,
        |    round(pow(CAST(cnt AS DOUBLE) / CAST(minc AS DOUBLE),
        |      CAST(-0.7 AS DOUBLE)), 6) AS rate
        |  FROM c CROSS JOIN m)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
        |WHERE r.rate >= 1.0
        |  OR substr(md5(concat('temp:', CAST(d.doc_id AS VARCHAR))), 1, 8)
        |     < lpad(lower(hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT))), 8, '0')""".stripMargin,

    // Length buckets: the same integer CASE ladder (no FP log2); sums
    // cast back to BIGINT (DuckDB widens to HUGEINT).
    "pack_length_buckets" ->
      """WITH d AS (
        |  SELECT CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |b AS (
        |  SELECT n, CASE
        |    WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32 WHEN n <= 64 THEN 64
        |    WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256
        |    WHEN n <= 512 THEN 512 ELSE 1024 END AS bucket
        |  FROM d)
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  CAST(sum(bucket - least(n, bucket)) AS BIGINT) AS n_padding
        |FROM b GROUP BY bucket""".stripMargin,

    // Shard manifest: 60-bit md5 prefixes (shard key and content
    // checksum), bit_xor is order-independent on both engines; sums
    // cast back to BIGINT (DuckDB widens to HUGEINT).
    "shard_manifest" ->
      """WITH d AS (
        |  SELECT CAST(CAST(concat('0x', substr(md5(concat('shard:',
        |        CAST(doc_id AS VARCHAR))), 1, 15)) AS UBIGINT) % 32 AS BIGINT)
        |      AS shard,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS tok,
        |    CAST(CAST(concat('0x', substr(md5(text), 1, 15)) AS UBIGINT)
        |      AS BIGINT) AS h
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  bit_xor(h) AS checksum
        |FROM d GROUP BY shard""".stripMargin,

    // JL ±1 projection: sign(r,i) = parity of the first 4 md5 bytes of
    // 'rp:r_i' (the Scala driver builds the identical matrix); comps
    // are exact integer sums.
    "emb_rp_project" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |s AS (
        |  SELECT CAST(r.r AS BIGINT) AS dim, CAST(i.i AS INT) AS i,
        |    CASE WHEN CAST(concat('0x', substr(md5(concat('rp:', r.r, '_', i.i)),
        |        1, 8)) AS UBIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sgn
        |  FROM range(0, 16) r(r), range(0, 64) i(i))
        |SELECT q.vec_id, s.dim,
        |  CAST(sum(s.sgn * q.qv[s.i + 1]) AS BIGINT) AS comp
        |FROM q CROSS JOIN s
        |GROUP BY q.vec_id, s.dim""".stripMargin,

    // Shard-publication flagship: temperature mix → exact-dedup
    // survivors → shard manifest, each stage the already-verified CTE.
    "publish_shards" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |m AS (SELECT min(cnt) AS minc FROM c),
        |r AS (SELECT lang,
        |    round(pow(CAST(cnt AS DOUBLE) / CAST(minc AS DOUBLE),
        |      CAST(-0.7 AS DOUBLE)), 6) AS rate
        |  FROM c CROSS JOIN m),
        |kept AS (
        |  SELECT d.doc_id, d.text FROM documents d JOIN r USING (lang)
        |  WHERE r.rate >= 1.0
        |    OR substr(md5(concat('temp:', CAST(d.doc_id AS VARCHAR))), 1, 8)
        |       < lpad(lower(hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT))), 8, '0')),
        |surv AS (
        |  SELECT doc_id, text FROM kept WHERE doc_id IN (
        |    SELECT min(doc_id) FROM kept GROUP BY md5(text))),
        |sh AS (
        |  SELECT CAST(CAST(concat('0x', substr(md5(concat('shard:',
        |        CAST(doc_id AS VARCHAR))), 1, 15)) AS UBIGINT) % 32 AS BIGINT)
        |      AS shard,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS tok,
        |    CAST(CAST(concat('0x', substr(md5(text), 1, 15)) AS UBIGINT)
        |      AS BIGINT) AS h
        |  FROM surv)
        |SELECT shard, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  bit_xor(h) AS checksum
        |FROM sh GROUP BY shard""".stripMargin,

    // Directed exact-cosine screen (decontamination): same quantized
    // cosine as dedup_cosine_pairs, corpus ≥ 25 vs eval < 25.
    "decon_semantic" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        |  FROM q)
        |SELECT a.vec_id, b.vec_id AS eval_id,
        |  round(CAST(list_sum(list_transform(range(1, 65),
        |      i -> a.qv[i] * b.qv[i])) AS DOUBLE)
        |    / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))), 6) AS cos
        |FROM n a JOIN n b ON b.vec_id < 25 AND a.vec_id >= 25
        |WHERE CAST(list_sum(list_transform(range(1, 65),
        |      i -> a.qv[i] * b.qv[i])) AS DOUBLE)
        |    / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) >= 0.35""".stripMargin,

    "split_train_val" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |       THEN 'train' ELSE 'val' END AS split
        |FROM documents""".stripMargin,

    // Winnowing: per-window min of md5 3-GRAM hashes (rightmost tie-
    // break via the negated position in the struct ordering), full
    // windows only, distinct selections. Gram construction matches the
    // ngram-dedup oracle (concat_ws skips the NULLs past a short doc's
    // end → whole-text gram, same as the kernel's trim).
    "text_winnow" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |gr AS (
        |  SELECT doc_id,
        |    CAST(greatest(len(toks) - 3, 0) + 1 AS BIGINT) AS n_gr,
        |    unnest(list_transform(range(1, greatest(len(toks) - 3, 0) + 2),
        |      s -> concat_ws(' ', toks[s], toks[s+1], toks[s+2]))) AS gram,
        |    CAST(unnest(range(1, greatest(len(toks) - 3, 0) + 2)) - 1 AS BIGINT) AS pos
        |  FROM tok),
        |sel AS (
        |  SELECT doc_id, n_gr, pos,
        |    min(struct_pack(h := md5(gram), np := -pos)) OVER (
        |      PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS s
        |  FROM gr)
        |SELECT DISTINCT doc_id, s.h AS fp, -s.np AS fp_pos
        |FROM sel WHERE pos <= n_gr - 4""".stripMargin,

    "s9_log_parse" ->
      s"""WITH lines AS (
         |  SELECT '[' || strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') || 'Z] table='
         |    || event_type || ' id=' || CAST(event_id AS VARCHAR) AS value
         |  FROM events WHERE $V)
         |SELECT regexp_extract(value, '^\\[(.*?)\\]', 1) AS ts_str,
         |       trim(regexp_replace(value, '^\\[(.*?)\\]\\s*', '')) AS message
         |FROM lines""".stripMargin,

    "f5_manila_iso" ->
      s"""SELECT event_id AS log_id,
         |  strftime(ts + INTERVAL 8 HOUR, '%Y-%m-%dT%H:%M:%S.%g') || '+08:00' AS manila_ts
         |FROM events WHERE $V""".stripMargin,

    "f6_uptime" ->
      s"""WITH m AS (
         |  SELECT event_id AS log_id,
         |    event_id * 100000 + CAST(floor(value) AS BIGINT) * 10 AS uptime_ms
         |  FROM events WHERE $V)
         |SELECT log_id, uptime_ms,
         |  CAST(floor(CAST(floor(uptime_ms / 1000) AS BIGINT) / 3600) AS BIGINT) AS up_h,
         |  CAST(floor((CAST(floor(uptime_ms / 1000) AS BIGINT) % 3600) / 60) AS BIGINT) AS up_m,
         |  CAST(floor(uptime_ms / 1000) AS BIGINT) % 60 AS up_s
         |FROM m""".stripMargin,

    "f7_zero_pad" ->
      s"""SELECT event_id AS log_id,
         |  lpad(CAST(user_id % 1000 AS VARCHAR), 3, '0') AS geo_code
         |FROM events WHERE $V""".stripMargin,

    "f8_json_extract" ->
      s"""SELECT event_id AS log_id,
         |  json_extract_string(props, '$$.k') AS k_val
         |FROM events WHERE $V""".stripMargin,

    "p6_skip_counting" ->
      """WITH log AS (
        |  SELECT user_id AS rsbsa_no,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS "table"
        |  FROM events)
        |SELECT count(*) AS total,
        |  count(CASE WHEN rsbsa_no IS NOT NULL AND "table" IS NOT NULL THEN 1 END) AS valid,
        |  count(CASE WHEN rsbsa_no IS NULL OR "table" IS NULL THEN 1 END) AS skipped
        |FROM log""".stripMargin,

    "w4_sample_errors" ->
      s"""SELECT event_id AS log_id, user_id AS rsbsa_no, event_type AS "table"
         |FROM events WHERE $V AND event_type = 'error'
         |ORDER BY log_id LIMIT 5""".stripMargin,

    "w5_running_sum" ->
      """SELECT l_orderkey, l_linenumber,
        |  row_number() OVER w AS line_rank,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)""".stripMargin,

    // Sketch error-bound contract: the exact side is recomputed by
    // DuckDB; the booleans are Spark's claim that HLL++ landed within
    // its documented 5% rsd of that exact answer.
    "a1_approx_distinct" ->
      s"""SELECT count(DISTINCT user_id) AS exact_keys,
         |  count(DISTINCT event_type) AS exact_tables,
         |  true AS keys_within_5pct,
         |  true AS tables_within_5pct
         |FROM events WHERE $V""".stripMargin,

    // Same sketch contract, grouped: per-source exact distinct plus
    // Spark's claim the HLL estimate landed within 5%.
    // CMS heavy hitters: the oracle certifies the exact top-20 (ties
    // by token) and the bound booleans — true iff the fixed-seed
    // sketch honored exact ≤ est ≤ exact + ceil(eps*N) on every hit.
    "agg_heavy_hitters" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS token FROM documents),
        |c AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS n_exact FROM w
        |  WHERE length(token) > 0 GROUP BY token)
        |SELECT token, n_exact, true AS cms_within_bound
        |FROM c ORDER BY n_exact DESC, token LIMIT 20""".stripMargin,

    // Scale twin's full replay: same raw-split token enumeration WITH
    // ordinality (Spark posexplode pos+1), md5-portable CMS buckets
    // and occurrence sample, est = min over the 4 sketch rows — the
    // single-pass approximation itself is what's certified.
    "agg_heavy_hitters_sketch" ->
      """WITH toks AS (
        |  SELECT doc_id, u['tok'] AS tok, CAST(u['ord'] AS BIGINT) AS ord FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(arr) + 1),
        |      i -> {'tok': arr[i], 'ord': i})) AS u
        |    FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS arr
        |          FROM documents) src)
        |  WHERE length(u['tok']) > 0),
        |cms AS (
        |  SELECT r.r,
        |    CAST(CAST(concat('0x', substr(md5(concat('cms', r.r, '_', tok)), 1, 8)) AS UBIGINT) % 4096 AS BIGINT) AS k,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks CROSS JOIN range(0, 4) r(r)
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT tok FROM toks
        |  WHERE CAST(concat('0x', substr(md5(concat('smp_', doc_id, '_', ord, '_', tok)), 1, 8)) AS UBIGINT) % 64 = 0),
        |est AS (
        |  SELECT c.tok, min(m.cnt) AS est_n
        |  FROM cand c CROSS JOIN range(0, 4) r(r)
        |  JOIN cms m ON m.r = r.r
        |    AND m.k = CAST(CAST(concat('0x', substr(md5(concat('cms', r.r, '_', c.tok)), 1, 8)) AS UBIGINT) % 4096 AS BIGINT)
        |  GROUP BY 1)
        |SELECT tok AS token, est_n FROM est
        |ORDER BY est_n DESC, tok LIMIT 20""".stripMargin,

    // Stride-scheduled interleave: per-source ordinal (plain window -
    // equals the engine's two-phase bucketed numbering by construction),
    // virtual time (n - 0.5)/w with the same IEEE division, first 200
    // positions of the stream.
    "corpus_interleave" ->
      """WITH wsrc AS (
        |  SELECT doc_id, source,
        |    CAST(CAST(substr(source, 4) AS INT) % 4 + 1 AS DOUBLE) AS wt,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, source, CAST(rn AS BIGINT) AS n,
        |    (CAST(rn AS DOUBLE) - 0.5) / wt AS vkey
        |  FROM wsrc),
        |top AS (SELECT * FROM k ORDER BY vkey, doc_id LIMIT 200)
        |SELECT CAST(row_number() OVER (ORDER BY vkey, doc_id) AS BIGINT) AS pos,
        |  doc_id, source, n, round(vkey, 6) AS stride_key
        |FROM top""".stripMargin,

    // Hashed-linear classifier: feature -> md5 bucket -> md5 integer
    // weight in [-1000, 1000]; BIGINT sum (order-independent), one
    // final division. Bigrams join adjacent kept tokens with a space.
    "text_quality_classifier" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS tl
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id,
        |    list_concat(tl,
        |      CASE WHEN len(tl) < 2 THEN CAST([] AS VARCHAR[])
        |           ELSE list_transform(range(1, len(tl)),
        |                  i -> tl[i] || ' ' || tl[i + 1]) END) AS fl
        |  FROM toks),
        |scored AS (
        |  SELECT doc_id, CAST(len(fl) AS BIGINT) AS nf,
        |    CAST(list_sum(list_transform(fl, f ->
        |      CAST(CAST(concat('0x', substr(md5(concat('qw_',
        |        CAST(CAST(concat('0x', substr(md5(concat('qf_', f)), 1, 8)) AS UBIGINT) % 1024 AS VARCHAR))), 1, 8)) AS UBIGINT) % 2001 AS BIGINT) - 1000))
        |      AS BIGINT) AS tot
        |  FROM feats)
        |SELECT doc_id,
        |  CASE WHEN nf = 0 THEN 0.0
        |       ELSE round(CAST(tot AS DOUBLE) / (1000.0 * CAST(nf AS DOUBLE)), 6) END AS clf_score,
        |  CASE WHEN nf = 0 THEN false
        |       ELSE CAST(tot AS DOUBLE) / (1000.0 * CAST(nf AS DOUBLE)) > 0 END AS keep
        |FROM scored""".stripMargin,

    // C4 badwords blocklist: occurrence counts over the token and
    // adjacent-bigram arrays (the classifier's token/bigram idiom),
    // keep = zero hits.
    "text_blocklist" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS tl
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(tl,
        |      t -> list_contains(['slow', 'spark'], t))) AS BIGINT) AS word_hits,
        |    CAST(len(list_filter(
        |      CASE WHEN len(tl) < 2 THEN CAST([] AS VARCHAR[])
        |           ELSE list_transform(range(1, len(tl)),
        |                  i -> tl[i] || ' ' || tl[i + 1]) END,
        |      g -> list_contains(['table table', 'big big'], g))) AS BIGINT) AS phrase_hits
        |  FROM toks)
        |SELECT doc_id, word_hits, phrase_hits,
        |  word_hits + phrase_hits AS n_hits,
        |  word_hits + phrase_hits = 0 AS keep
        |FROM h""".stripMargin,

    // Mojibake signal: every 7th doc deterministically decorated with
    // a UTF-8-read-as-Latin-1 prefix; marker counts via per-character
    // length-after-replace deltas (character-counting length both
    // engines), one division for the rate.
    "text_mojibake" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |         THEN 'cafÃ© naÃ¯ve vÃ¼ rÃ©sumÃ© ' || text
        |         ELSE text END AS t
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    CAST((length(t) - length(replace(t, 'Ã', '')))
        |       + (length(t) - length(replace(t, 'Â', '')))
        |       + (length(t) - length(replace(t, '�', ''))) AS BIGINT) AS mojibake_hits,
        |    CAST(length(t) AS BIGINT) AS n_chars
        |  FROM d)
        |SELECT doc_id, mojibake_hits, n_chars,
        |  CASE WHEN n_chars = 0 THEN 0.0
        |       ELSE round(CAST(mojibake_hits AS DOUBLE)
        |                  / CAST(n_chars AS DOUBLE), 9) END AS mojibake_rate,
        |  mojibake_hits > 0 AS suspect
        |FROM h""".stripMargin,

    // Classifier calibration: the text_quality_classifier score
    // replay, a len>=30 weak label, and per-threshold exact confusion
    // counts from one grid cross join; single divisions for P/R.
    "text_classifier_pr" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS tl
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id, len(tl) >= 30 AS lbl,
        |    list_concat(tl,
        |      CASE WHEN len(tl) < 2 THEN CAST([] AS VARCHAR[])
        |           ELSE list_transform(range(1, len(tl)),
        |                  i -> tl[i] || ' ' || tl[i + 1]) END) AS fl
        |  FROM toks),
        |scored AS (
        |  SELECT doc_id, lbl, CAST(len(fl) AS BIGINT) AS nf,
        |    CAST(list_sum(list_transform(fl, f ->
        |      CAST(CAST(concat('0x', substr(md5(concat('qw_',
        |        CAST(CAST(concat('0x', substr(md5(concat('qf_', f)), 1, 8)) AS UBIGINT) % 1024 AS VARCHAR))), 1, 8)) AS UBIGINT) % 2001 AS BIGINT) - 1000))
        |      AS BIGINT) AS tot
        |  FROM feats),
        |sc AS (
        |  SELECT lbl,
        |    CASE WHEN nf = 0 THEN 0.0
        |         ELSE CAST(tot AS DOUBLE) / (1000.0 * CAST(nf AS DOUBLE)) END AS score
        |  FROM scored),
        |g AS (SELECT CAST(unnest([-0.02, -0.01, -0.005, 0.0, 0.005, 0.01, 0.02]) AS DOUBLE) AS threshold),
        |c AS (
        |  SELECT g.threshold,
        |    CAST(sum(CASE WHEN score > g.threshold AND lbl THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN score > g.threshold AND NOT lbl THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN score <= g.threshold AND lbl THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN score <= g.threshold AND NOT lbl THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM sc CROSS JOIN g GROUP BY g.threshold)
        |SELECT threshold, tp, fp, fn, tn,
        |  CASE WHEN tp + fp > 0
        |       THEN round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 9) END AS precision,
        |  CASE WHEN tp + fn > 0
        |       THEN round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 9) END AS recall
        |FROM c""".stripMargin,

    // Curation funnel: the five screens' flags replayed per doc
    // (langid argmax with the engine's tie rule, blocklist counts,
    // the Gopher rule, classifier sign, keep-first digest rank), then
    // cumulative conjunctive counts unioned into stage rows.
    "curation_funnel" ->
      """WITH tl AS (
        |  SELECT doc_id, text,
        |    string_split_regex(lower(text), '\s+') AS toks,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> length(t) > 0) AS ftl
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, t -> t IN ('der','die','und','das','von','zu','mit','den'))) AS s_de,
        |    len(list_filter(toks, t -> t IN ('the','of','and','to','in','is','that','for'))) AS s_en,
        |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','los','del'))) AS s_es,
        |    len(list_filter(toks, t -> t IN ('le','la','de','et','les','des','un','une'))) AS s_fr
        |  FROM tl),
        |fl AS (
        |  SELECT doc_id,
        |    (s_en > 0 AND s_en >= s_de AND s_en > s_es AND s_en > s_fr) AS f_lang
        |  FROM sc),
        |fb AS (
        |  SELECT doc_id,
        |    len(list_filter(
        |      CASE WHEN len(ftl) < 2 THEN CAST([] AS VARCHAR[])
        |           ELSE list_transform(range(1, len(ftl)),
        |                  i -> ftl[i] || ' ' || ftl[i + 1]) END,
        |      g -> list_contains(['table table', 'big big'], g))) = 0 AS f_block
        |  FROM tl),
        |fg AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) BETWEEN 30 AND 100000 AS f_band
        |  FROM tl),
        |fc0 AS (
        |  SELECT doc_id,
        |    list_concat(ftl,
        |      CASE WHEN len(ftl) < 2 THEN CAST([] AS VARCHAR[])
        |           ELSE list_transform(range(1, len(ftl)),
        |                  i -> ftl[i] || ' ' || ftl[i + 1]) END) AS fl2
        |  FROM tl),
        |fc AS (
        |  SELECT doc_id,
        |    len(fl2) > 0 AND CAST(list_sum(list_transform(fl2, f ->
        |      CAST(CAST(concat('0x', substr(md5(concat('qw_',
        |        CAST(CAST(concat('0x', substr(md5(concat('qf_', f)), 1, 8)) AS UBIGINT) % 1024 AS VARCHAR))), 1, 8)) AS UBIGINT) % 2001 AS BIGINT) - 1000))
        |      AS BIGINT) > 0 AS f_clf
        |  FROM fc0),
        |fd AS (
        |  SELECT doc_id,
        |    row_number() OVER (PARTITION BY md5(substr(text, 1, 48))
        |                       ORDER BY doc_id) = 1 AS f_first
        |  FROM documents),
        |j AS (
        |  SELECT fl.f_lang AS c1,
        |    fl.f_lang AND fb.f_block AS c2,
        |    fl.f_lang AND fb.f_block AND fg.f_band AS c3,
        |    fl.f_lang AND fb.f_block AND fg.f_band AND fc.f_clf AS c4,
        |    fl.f_lang AND fb.f_block AND fg.f_band AND fc.f_clf AND fd.f_first AS c5
        |  FROM fl
        |  JOIN fb USING (doc_id) JOIN fg USING (doc_id)
        |  JOIN fc USING (doc_id) JOIN fd USING (doc_id)),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
        |    CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
        |    CAST(sum(CASE WHEN c5 THEN 1 ELSE 0 END) AS BIGINT) AS n5
        |  FROM j),
        |st AS (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'lang_id' AS name, n0 AS n_in, n1 AS n_kept FROM a
        |  UNION ALL SELECT 2, 'blocklist', n1, n2 FROM a
        |  UNION ALL SELECT 3, 'length_band', n2, n3 FROM a
        |  UNION ALL SELECT 4, 'classifier', n3, n4 FROM a
        |  UNION ALL SELECT 5, 'prefix_dedup', n4, n5 FROM a)
        |SELECT stage, name, n_in, n_kept,
        |  CASE WHEN n_in = 0 THEN 0.0
        |       ELSE round(CAST(n_in - n_kept AS DOUBLE)
        |                  / CAST(n_in AS DOUBLE), 9) END AS drop_rate
        |FROM st""".stripMargin,

    // Drift monitor: exact-integer TV deviation |c1*N2 - c2*N1| over
    // the merged vocabulary of the two snapshot halves; one division
    // per emitted row.
    "corpus_drift" ->
      """WITH ca AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS c1 FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
        |    FROM documents WHERE doc_id < 250)
        |  WHERE length(token) > 0 GROUP BY token),
        |cb AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS c2 FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
        |    FROM documents WHERE doc_id >= 250)
        |  WHERE length(token) > 0 GROUP BY token),
        |j AS (
        |  SELECT COALESCE(ca.token, cb.token) AS token,
        |    COALESCE(ca.c1, 0) AS c1, COALESCE(cb.c2, 0) AS c2
        |  FROM ca FULL JOIN cb ON cb.token = ca.token),
        |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM j)
        |SELECT token, c1, c2,
        |  round(CAST(abs(c1 * t.n2 - c2 * t.n1) AS DOUBLE)
        |    / (2.0 * CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)), 9) AS tv_contrib
        |FROM j, t
        |ORDER BY abs(c1 * t.n2 - c2 * t.n1) DESC, token LIMIT 20""".stripMargin,

    "agg_grouped_distinct" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS exact_texts,
        |  true AS texts_within_5pct
        |FROM documents GROUP BY source""".stripMargin,

    "a1_distinct_count" ->
      s"""SELECT count(*) AS total,
         |  count(DISTINCT user_id) AS n_keys,
         |  count(DISTINCT event_type) AS n_tables
         |FROM events WHERE $V""".stripMargin,

    "t3_union_totals" ->
      s"""SELECT event_type AS "table", count(*) AS n FROM events WHERE $V GROUP BY event_type
         |UNION ALL SELECT 'ALL' AS "table", count(*) AS n FROM events WHERE $V""".stripMargin,

    "window_tumbling" ->
      s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
         |  event_type AS "table", count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM events WHERE $V GROUP BY 1, 2""".stripMargin,

    // Hourly resample + forward fill: same grid (generate_series per
    // key over its occupied-bucket span), same IGNORE NULLS running
    // last; the hourly totals are exact DECIMAL sums cast once.
    "ts_gapfill" ->
      s"""WITH e AS (
         |  SELECT event_type AS tbl, time_bucket(INTERVAL '1 hour', ts) AS bucket,
         |    CAST(value AS DECIMAL(18,2)) AS dv
         |  FROM events WHERE $V),
         |h AS (SELECT tbl, bucket, CAST(sum(dv) AS DOUBLE) AS v
         |  FROM e GROUP BY tbl, bucket),
         |b AS (SELECT tbl, min(bucket) AS h0, max(bucket) AS h1 FROM h GROUP BY tbl),
         |g AS (SELECT tbl, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket FROM b),
         |j AS (SELECT g.tbl, g.bucket, h.v
         |  FROM g LEFT JOIN h ON h.tbl = g.tbl AND h.bucket = g.bucket)
         |SELECT tbl AS "table", bucket AS w_start, v IS NULL AS is_gap,
         |  last_value(v IGNORE NULLS) OVER (PARTITION BY tbl ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
         |FROM j""".stripMargin,

    // Rolling z-score: sums on exact DECIMAL(18,2) (order-independent,
    // so the segment-tree window here and Spark's running frame agree
    // bit-for-bit); the FP steps after are the same expression tree as
    // the Spark side, rounded once. Flag thresholds on the UNROUNDED z.
    "ts_zscore" ->
      s"""WITH $zscoreCtes
         |SELECT log_id, rsbsa_no, ts, value, n_base,
         |  round(zr, 4) AS z, abs(zr) > CAST(3.0 AS DOUBLE) AS is_anomaly
         |FROM z WHERE n_base >= 10 AND vr > CAST(0.0 AS DOUBLE)""".stripMargin,

    // Sliding 1h/30m windows: each event lands in exactly the two
    // half-hour-aligned window starts covering it.
    "window_sliding" ->
      s"""WITH e AS (SELECT event_type AS tbl, ts, value FROM events WHERE $V),
         |x AS (SELECT tbl, value,
         |  unnest([time_bucket(INTERVAL '30 minutes', ts),
         |          time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE])
         |    AS w_start
         |  FROM e)
         |SELECT w_start, w_start + INTERVAL 60 MINUTE AS w_end, tbl AS "table",
         |  count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM x GROUP BY tbl, w_start""".stripMargin,

    // Analytics flagship: base rollup + anomaly counts (shared z-score
    // chain), day kept DATE for the join, cast to TIMESTAMP once.
    "daily_ops_report" ->
      s"""WITH $zscoreCtes,
         |an AS (
         |  SELECT e2.event_type AS tbl, date_trunc('day', e2.ts) AS day,
         |    count(*) AS n_anomalies
         |  FROM (SELECT log_id FROM z
         |        WHERE n_base >= 10 AND vr > CAST(0.0 AS DOUBLE)
         |          AND abs(zr) > CAST(3.0 AS DOUBLE)) a
         |  JOIN (SELECT event_id, event_type, ts FROM events WHERE $V) e2
         |    ON e2.event_id = a.log_id
         |  GROUP BY 1, 2),
         |base AS (
         |  SELECT event_type AS tbl, date_trunc('day', ts) AS day,
         |    count(*) AS n_events, count(DISTINCT user_id) AS n_users,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         |    quantile_cont(value, 0.95) AS p95_value
         |  FROM events WHERE $V GROUP BY 1, 2)
         |SELECT base.tbl AS "table", CAST(base.day AS TIMESTAMP) AS day,
         |  n_events, n_users, total_value, p95_value,
         |  coalesce(n_anomalies, 0) AS n_anomalies
         |FROM base LEFT JOIN an ON an.tbl = base.tbl AND an.day = base.day""".stripMargin,

    // Hourly OHLC: first/last made deterministic via row_number over
    // the (ts, log_id) total order, mirrored exactly.
    "ts_ohlc" ->
      s"""WITH e AS (
         |  SELECT event_type AS tbl, date_trunc('hour', ts) AS bucket,
         |    ts, event_id AS log_id, value
         |  FROM events WHERE $V AND value IS NOT NULL),
         |r AS (
         |  SELECT tbl, bucket, value,
         |    row_number() OVER (PARTITION BY tbl, bucket
         |      ORDER BY ts ASC, log_id ASC) AS rna,
         |    row_number() OVER (PARTITION BY tbl, bucket
         |      ORDER BY ts DESC, log_id DESC) AS rnd
         |  FROM e)
         |SELECT tbl AS "table", bucket,
         |  max(CASE WHEN rna = 1 THEN value END) AS open,
         |  max(value) AS high, min(value) AS low,
         |  max(CASE WHEN rnd = 1 THEN value END) AS close,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM r GROUP BY tbl, bucket""".stripMargin,

    "session_windows" ->
      s"""WITH $sessionCtes
         |SELECT min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end,
         |       rsbsa_no, count(*) AS n_events
         |FROM s GROUP BY rsbsa_no, sid""".stripMargin,

    // Concurrent sessions: brute overlap left-join over the same
    // session derivation (half-open [s_start, s_end) overlap, self
    // excluded by the composite session id).
    "concurrent_sessions" ->
      s"""WITH $sessionCtes,
         |sess AS (
         |  SELECT rsbsa_no, min(ts) AS s_start,
         |         max(ts) + INTERVAL 30 MINUTE AS s_end
         |  FROM s GROUP BY rsbsa_no, sid)
         |SELECT a.rsbsa_no, a.s_start, count(b.rsbsa_no) AS n_concurrent
         |FROM sess a LEFT JOIN sess b
         |  ON (b.rsbsa_no <> a.rsbsa_no OR b.s_start <> a.s_start)
         |  AND a.s_start < b.s_end AND b.s_start < a.s_end
         |GROUP BY a.rsbsa_no, a.s_start""".stripMargin,

    // Code-vs-prose screen: both signals are exact counts (regex class
    // [{}();=<>] is literal-safe in Java regex and RE2 alike; keyword
    // hits are exact token equality), so the only doubles are the two
    // saturating ratios — same expression tree both sides.
    "text_code_detect" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(length(text) - length(regexp_replace(text, '[{}();=<>]', '', 'g')) AS BIGINT) AS n_symbols,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t IN ('def','return','import','class','function',
        |                 'void','struct','lambda','elif','printf'))) AS BIGINT) AS kw_hits,
        |    greatest(CAST(length(text) AS DOUBLE), 1.0) AS n
        |  FROM documents)
        |SELECT doc_id, n_symbols,
        |  round(CAST(n_symbols AS DOUBLE) / n, 4) AS symbol_ratio,
        |  kw_hits,
        |  round((least(CAST(n_symbols AS DOUBLE) / n * 20, 1.0)
        |       + least(CAST(kw_hits AS DOUBLE) / 4.0, 1.0)) / 2, 4) AS code_score,
        |  round((least(CAST(n_symbols AS DOUBLE) / n * 20, 1.0)
        |       + least(CAST(kw_hits AS DOUBLE) / 4.0, 1.0)) / 2, 4) >= 0.5 AS is_code
        |FROM s""".stripMargin,

    // URL canonicalization: the fixture CTE derives the same five
    // cosmetic variants per doc_id both engines build, and the
    // canonical form replays Normalize.canonicalUrl's rule chain with
    // DuckDB's regex built-ins (RE2 'g' flag where Spark's
    // regexp_replace is implicitly global). The shared canon CTE also
    // emits the host ONCE, so the three URL queries cannot drift from
    // each other on the host rule.
    "text_url_canonical" ->
      s"""WITH $URL_CANON_CTES
         |SELECT doc_id, url, canon_url, host,
         |  md5(canon_url) AS canon_key
         |FROM canon""".stripMargin,

    // Keep-first URL dedup over the canonical key; min over the
    // per-group-constant canon_url/host picks the representative.
    "dedup_by_url" ->
      s"""WITH $URL_CANON_CTES
         |SELECT md5(canon_url) AS canon_key,
         |  min(canon_url) AS canon_url,
         |  min(host) AS host,
         |  min(doc_id) AS keeper,
         |  count(*) AS n_urls
         |FROM canon GROUP BY 1""".stripMargin,

    // Host-level dedup report: two-phase distinct over (host, md5
    // canonical key), dup ratio one division on the host row.
    "dedup_url_hosts" ->
      s"""WITH $URL_CANON_CTES
         |SELECT host,
         |  count(*) AS n_urls,
         |  count(DISTINCT md5(canon_url)) AS n_canonical,
         |  round(1.0 - CAST(count(DISTINCT md5(canon_url)) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE), 4) AS dup_ratio
         |FROM canon GROUP BY 1""".stripMargin,

    // Host-disjoint split: salted-md5 hex-prefix thresholds on the
    // HOST (the splitTrainVal rule family keyed one level up), so
    // every document of a host shares the assignment.
    "split_host_disjoint" ->
      s"""WITH $URL_CANON_CTES
         |SELECT doc_id, host,
         |  CASE WHEN substr(md5('hostsplit:' || host), 1, 2) < 'e6'
         |         THEN 'train'
         |       WHEN substr(md5('hostsplit:' || host), 1, 2) < 'f3'
         |         THEN 'val'
         |       ELSE 'test' END AS split
         |FROM canon""".stripMargin,

    // Ratio-driven per-host cap: cap = max(1, floor(8·(1 − dup_ratio)))
    // on the ROUNDED ratio (both engines round to 4 first — one shared
    // fixed FP tree); winners ranked by the salted-md5 order with a
    // doc_id tiebreak, the sample_stratified convention.
    "corpus_host_cap" ->
      s"""WITH $URL_CANON_CTES,
         |hosts AS (
         |  SELECT host, round(1.0
         |    - CAST(count(DISTINCT md5(canon_url)) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE), 4) AS dup_ratio
         |  FROM canon GROUP BY 1),
         |caps AS (
         |  SELECT host, greatest(CAST(1 AS BIGINT),
         |    CAST(floor(8.0 * (1.0 - dup_ratio)) AS BIGINT)) AS cap
         |  FROM hosts),
         |rk AS (
         |  SELECT doc_id, host,
         |    row_number() OVER (PARTITION BY host
         |      ORDER BY substr(md5('hostcap:' || CAST(doc_id AS VARCHAR)), 1, 16),
         |               doc_id) AS rn
         |  FROM canon)
         |SELECT rk.doc_id, rk.host, caps.cap
         |FROM rk JOIN caps ON caps.host = rk.host
         |WHERE rn <= cap""".stripMargin,

    "text_quality_score" ->
      """SELECT doc_id,
        |  round((least(CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) / 64.0, 1.0)
        |       + least(CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |           t -> t IN ('the','of','and','to','in','is','that','for'))) AS DOUBLE) * 8
        |           / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE), 1.0)) / 2, 4) AS quality
        |FROM documents""".stripMargin,

    // Left-outer interval join face: views with no in-band click.
    "j6_unconverted_views" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, ts
         |  FROM events WHERE $V),
         |v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
         |  FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id, ts AS click_ts
         |  FROM e WHERE event_type = 'click')
         |SELECT v.user_id AS rsbsa_no, view_id, view_ts
         |FROM v LEFT JOIN c ON v.user_id = c.user_id
         |  AND c.click_ts > v.view_ts
         |  AND c.click_ts <= v.view_ts + INTERVAL 15 MINUTE
         |WHERE c.click_ts IS NULL""".stripMargin,

    // SCD2: one lead() per (key, table) version chain.
    "scd2_history" ->
      s"""SELECT user_id AS rsbsa_no, event_type AS "table",
         |  event_id AS version_id, ts AS valid_from,
         |  lead(ts) OVER w AS valid_to,
         |  lead(ts) OVER w IS NULL AS is_current
         |FROM events WHERE $V
         |WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)""".stripMargin,

    // Point-in-time SCD2 lookup: click-history versions joined to
    // view facts on key + half-open validity residual; the window in
    // the Spark side partitions by (user, table) so the click-only
    // subset here is identical.
    "scd2_lookup" ->
      s"""WITH hist AS (
         |  SELECT user_id AS dim_key, event_id AS version_id,
         |    ts AS valid_from,
         |    lead(ts) OVER w AS valid_to,
         |    lead(ts) OVER w IS NULL AS is_current
         |  FROM events WHERE $V AND event_type = 'click'
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |f AS (SELECT event_id AS log_id, user_id AS rsbsa_no, ts
         |  FROM events WHERE $V AND event_type = 'view')
         |SELECT f.log_id, f.rsbsa_no, h.version_id, h.valid_from,
         |  h.is_current
         |FROM f JOIN hist h ON h.dim_key = f.rsbsa_no
         |  AND h.valid_from <= f.ts
         |  AND (f.ts < h.valid_to OR h.valid_to IS NULL)""".stripMargin,

    // Reconciliation: full-outer key audit, presence flags → status.
    "reconcile_sources" ->
      s"""WITH e AS (SELECT DISTINCT user_id AS k FROM events WHERE $V),
         |c AS (SELECT DISTINCT c_custkey AS k FROM customer)
         |SELECT CASE WHEN e.k IS NOT NULL AND c.k IS NOT NULL THEN 'both'
         |            WHEN e.k IS NOT NULL THEN 'events_only'
         |            ELSE 'dim_only' END AS status,
         |  count(*) AS n_keys
         |FROM e FULL OUTER JOIN c ON e.k = c.k
         |GROUP BY 1""".stripMargin,

    // DQ profile: per-column counts; UNION ALL of four single-row
    // aggregates (DuckDB reads the 10k-row fixture four times where
    // the engine scans once — the oracle is brute, not the shape).
    "dq_profile" ->
      s"""WITH e AS (SELECT event_id AS log_id, user_id AS rsbsa_no,
         |    event_type AS "table", value FROM events WHERE $V)
         |SELECT 'log_id' AS "column", count(*) AS n_rows,
         |  count(CASE WHEN log_id IS NULL THEN 1 END) AS n_null,
         |  count(DISTINCT log_id) AS n_distinct FROM e
         |UNION ALL
         |SELECT 'rsbsa_no', count(*),
         |  count(CASE WHEN rsbsa_no IS NULL THEN 1 END),
         |  count(DISTINCT rsbsa_no) FROM e
         |UNION ALL
         |SELECT 'table', count(*),
         |  count(CASE WHEN "table" IS NULL THEN 1 END),
         |  count(DISTINCT "table") FROM e
         |UNION ALL
         |SELECT 'value', count(*),
         |  count(CASE WHEN value IS NULL THEN 1 END),
         |  count(DISTINCT value) FROM e""".stripMargin,

    // Ordered funnel: each stage anchored strictly after the previous
    // stage's first occurrence.
    "funnel_conversion" ->
      s"""WITH e AS (SELECT user_id, event_type, ts FROM events WHERE $V),
         |v AS (SELECT user_id, min(ts) AS v_ts FROM e
         |  WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, min(ts) AS c_ts
         |  FROM e JOIN v ON e.user_id = v.user_id
         |  WHERE event_type = 'click' AND ts > v_ts GROUP BY e.user_id),
         |p AS (SELECT e.user_id, min(ts) AS p_ts
         |  FROM e JOIN c ON e.user_id = c.user_id
         |  WHERE event_type = 'purchase' AND ts > c_ts GROUP BY e.user_id)
         |SELECT '1_view' AS stage, count(*) AS n_users FROM v
         |UNION ALL SELECT '2_click_after_view', count(*) FROM c
         |UNION ALL SELECT '3_purchase_after_click', count(*) FROM p""".stripMargin,

    // Weekly cohorts: exact integer week offsets from epoch-micros of
    // week-truncated timestamps.
    "cohort_retention" ->
      s"""WITH e AS (SELECT user_id, event_type, ts FROM events WHERE $V),
         |-- DuckDB date_trunc('week') yields DATE; cast back to match
         |-- the engine's TIMESTAMP output
         |coh AS (SELECT user_id,
         |    CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
         |  FROM e WHERE event_type = 'signup' GROUP BY user_id),
         |act AS (SELECT DISTINCT user_id,
         |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS act_week FROM e)
         |SELECT cohort_week,
         |  (epoch_us(act_week) - epoch_us(cohort_week)) // 604800000000 AS weeks_since,
         |  count(*) AS n_active_users
         |FROM act JOIN coh ON act.user_id = coh.user_id
         |WHERE act_week >= cohort_week
         |GROUP BY 1, 2""".stripMargin,

    // Interval-join attribution: plain equi-join + half-open time band
    // — the brute form of the watermarked stream-stream join.
    "j6_click_attribution" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, ts
         |  FROM events WHERE $V),
         |v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
         |  FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
         |  FROM e WHERE event_type = 'click')
         |SELECT v.user_id AS rsbsa_no, view_id, view_ts, click_id, click_ts
         |FROM v JOIN c ON v.user_id = c.user_id
         |  AND c.click_ts > v.view_ts
         |  AND c.click_ts <= v.view_ts + INTERVAL 15 MINUTE""".stripMargin,

    "asof_join" ->
      s"""WITH j AS (
         |  SELECT e.event_id AS log_id, e.user_id AS rsbsa_no,
         |         o.o_orderkey, o.o_orderdate,
         |    row_number() OVER (PARTITION BY e.event_id
         |      ORDER BY (o.o_orderdate IS NULL), o.o_orderdate DESC,
         |               o.o_orderkey DESC) AS rn
         |  FROM (SELECT * FROM events WHERE $V) e
         |  LEFT JOIN orders o
         |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
         |SELECT log_id, rsbsa_no, o_orderkey, o_orderdate FROM j WHERE rn = 1""".stripMargin,

    "pivot_counts" ->
      s"""SELECT user_id AS rsbsa_no,
         |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
         |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
         |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
         |FROM events WHERE $V GROUP BY user_id""".stripMargin,

    "unpivot_counts" ->
      s"""WITH p AS (
         |  SELECT user_id AS rsbsa_no,
         |    count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         |    count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
         |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         |    count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
         |    count(CASE WHEN event_type = 'view' THEN 1 END) AS view
         |  FROM events WHERE $V GROUP BY user_id)
         |SELECT rsbsa_no, 'click' AS "table", click AS n FROM p
         |UNION ALL SELECT rsbsa_no, 'error', error FROM p
         |UNION ALL SELECT rsbsa_no, 'purchase', purchase FROM p
         |UNION ALL SELECT rsbsa_no, 'signup', signup FROM p
         |UNION ALL SELECT rsbsa_no, 'view', view FROM p""".stripMargin,

    "f_string_funcs" ->
      """SELECT doc_id,
        |  substr(text, 1, 12) AS prefix,
        |  trim(substr(text, 1, 12), ' ') AS trimmed,
        |  regexp_replace(lang, 'h', 'H', 'g') AS replaced,
        |  lang || '-' || source AS tag,
        |  CAST(length(source) AS BIGINT) AS src_len,
        |  CAST(levenshtein(lang, 'en') AS BIGINT) AS lang_dist
        |FROM documents""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,

    "w8_ntile_deciles" ->
      """WITH d AS (
        |  SELECT o_totalprice,
        |    ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        |  FROM orders)
        |SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_orders,
        |  min(o_totalprice) AS price_lo, max(o_totalprice) AS price_hi
        |FROM d GROUP BY decile""".stripMargin,

    "rollup_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,

    "cube_revenue" ->
      """SELECT r_name, o_orderpriority,
        |  CAST(GROUPING(r_name) AS INTEGER) AS g_region,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE(r_name, o_orderpriority)""".stripMargin,

    "emb_norm_stats" ->
      """WITH q AS (
        |  SELECT label,
        |    CAST(list_sum(list_transform(
        |      list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |      x -> x * x)) AS BIGINT) AS nsq
        |  FROM embeddings)
        |SELECT label, count(*) AS n,
        |  CAST(sum(nsq) AS DOUBLE) / count(*) AS avg_norm_sq
        |FROM q GROUP BY label""".stripMargin,

    "media_profile" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |    octet_length(CAST(text AS BLOB)) AS n_bytes,
        |    CAST((doc_id % 1920) + 1 AS INTEGER) AS meta_width,
        |    n_chars * 40 AS meta_duration_ms
        |  FROM documents)
        |SELECT kind, count(*) AS n,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  max(meta_width) AS max_width,
        |  max(meta_duration_ms) AS max_duration_ms
        |FROM m GROUP BY kind""".stripMargin,

    // The four decode-bearing media queries (real PNG/WAV decodes —
    // pixels and PCM samples are beyond any SQL re-derivation) check
    // against GOLDEN PARQUET FIXTURES committed in-repo: the expected
    // (id, digest/feature) outputs at the driver's verification scale
    // (sf0.01), snapshotted once and pinned — rows/schema/hash all
    // evaluate instead of the former rows-only check. Semantics are
    // property-pinned in MultimodalSpec (re-encode invariance, resize
    // proximity, gain invariance, unrelated-distance); the fixture
    // pins REGRESSION: any decode/hash/banding change shows up as a
    // hash mismatch here. Regenerate (deliberately manual) by copying
    // a verified /tmp/graft_verify_out/<name>/part-*.parquet over the
    // fixture after auditing the diff.
    "media_phash" ->
      """SELECT media_id, phash, n_neardup_pairs
        |FROM read_parquet('/root/repo/fixtures/media_phash.parquet')""".stripMargin,
    "media_audio_fp" ->
      """SELECT media_id, afp, n_neardup_pairs
        |FROM read_parquet('/root/repo/fixtures/media_audio_fp.parquet')""".stripMargin,
    "media_features" ->
      """SELECT media_id, kind, n_bytes, checksum, feat_w, feat_h
        |FROM read_parquet('/root/repo/fixtures/media_features.parquet')""".stripMargin,
    "media_frames" ->
      """SELECT media_id, frame_no, frame_len
        |FROM read_parquet('/root/repo/fixtures/media_frames.parquet')""".stripMargin,

    // North-star composition: exact-dedup survivors minus near-dup
    // losers, English-only, quality-thresholded — each stage the same
    // SQL as its standalone oracle above.
    "curate_corpus" ->
      """WITH surv AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id IN (
        |    SELECT min(doc_id) FROM documents GROUP BY md5(text))),
        |tok AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |shg AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(toks) - 3, 0) + 2),
        |      s -> concat_ws(' ', toks[s], toks[s+1], toks[s+2]))) AS shingles
        |  FROM tok),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM shg),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5),
        |losers AS (SELECT DISTINCT b_id AS doc_id FROM pairs),
        |sc AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t IN ('der','die','und','das','von','zu','mit','den'))) AS s_de,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t IN ('the','of','and','to','in','is','that','for'))) AS s_en,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t IN ('el','la','de','que','y','en','los','del'))) AS s_es,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t IN ('le','la','de','et','les','des','un','une'))) AS s_fr
        |  FROM documents),
        |lang AS (
        |  SELECT doc_id,
        |    CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
        |         WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
        |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
        |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
        |         ELSE 'de' END AS lang_pred
        |  FROM sc),
        |qual AS (
        |  SELECT doc_id,
        |    round((least(CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) / 64.0, 1.0)
        |         + least(CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |             t -> t IN ('the','of','and','to','in','is','that','for'))) AS DOUBLE) * 8
        |             / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE), 1.0)) / 2, 4) AS quality
        |  FROM documents)
        |SELECT s.doc_id, lang_pred, quality
        |FROM surv s JOIN lang ON lang.doc_id = s.doc_id
        |JOIN qual ON qual.doc_id = s.doc_id
        |WHERE s.doc_id NOT IN (SELECT doc_id FROM losers)
        |  AND lang_pred = 'en' AND quality >= 0.5""".stripMargin,

    "text_lang_id" ->
      """WITH sc AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t IN ('der','die','und','das','von','zu','mit','den'))) AS s_de,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t IN ('the','of','and','to','in','is','that','for'))) AS s_en,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t IN ('el','la','de','que','y','en','los','del'))) AS s_es,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t IN ('le','la','de','et','les','des','un','une'))) AS s_fr
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
        |       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
        |       WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
        |       WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
        |       ELSE 'de' END AS lang_pred
        |FROM sc""".stripMargin,
  )
}
