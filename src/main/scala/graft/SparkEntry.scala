package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry runs a dialect query through [[GraftEngine]] (or a library
  * operator) against the driver-generated parquet tables; `oracleSql` holds
  * the DuckDB-equivalent ANSI SQL the driver uses as the correctness oracle.
  *
  * Float-aggregate outputs are `round`ed on BOTH sides so that
  * partition-order-dependent double summation cannot flip the comparison.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GraftEngine.sql(
      "SELECT event_type, count(*) AS cnt, round(avg(value), 4) AS avg_value, " +
        "window_start() AS ws FROM stream " +
        "GROUP BY event_type, TumblingWindow('1d') WITH (TIMESTAMP='ts') " +
        "ORDER BY ws, event_type",
      Tables.load(spark, "/root/testdata/sf0.001"))

  private final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def gq(name: String, graftSql: String, oracle: String): Q =
    Q(name, (s, dir) => GraftEngine.sql(graftSql, Tables.load(s, dir)),
      Option(oracle).filter(_.nonEmpty))

  /** Shared DuckDB replay of the DSIR featurize-census-λ-score chain
    * ([[operators.Sampling.importanceWeights]], buckets=512, alpha=1,
    * target = lang='en' docs, raw = all docs): non-distinct uni+bigrams
    * of normalized text, portable md5 bucket hash, add-1-smoothed bucket
    * log-ratios, per-doc sum. */
  private val dsirOracleCte: String = """
    WITH t AS (
      SELECT doc_id, lang,
        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      FROM documents
    ), g AS (
      SELECT doc_id, lang, unnest(list_concat(w,
        CASE WHEN len(w) >= 2
          THEN [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
          ELSE []::VARCHAR[] END)) AS gram
      FROM t
    ), gg AS (
      SELECT doc_id, lang,
        ('0x' || substr(md5(gram), 1, 15))::BIGINT % 512 AS b
      FROM g WHERE length(gram) > 0
    ), tot AS (
      SELECT CAST(count(*) FILTER (WHERE lang = 'en') AS DOUBLE) AS tt,
        CAST(count(*) AS DOUBLE) AS tr
      FROM gg
    ), lam AS (
      SELECT b,
        ln((count(*) FILTER (WHERE lang = 'en') + 1.0) / (tot.tt + 512.0)) -
        ln((count(*) + 1.0) / (tot.tr + 512.0)) AS l
      FROM gg, tot GROUP BY b, tot.tt, tot.tr
    ), sc AS (
      SELECT gg.doc_id, sum(lam.l) AS s, count(*) AS n
      FROM gg JOIN lam USING (b) GROUP BY gg.doc_id
    )
  """

  /** DuckDB replica of [[operators.Profile.psiReport]] (exact mode,
    * B=10, α=0.5) over even/odd l_orderkey halves of lineitem: per
    * column — 6dp-rounded quantile_cont edges, strictly-greater bucket
    * census on both sides, zero-filled bucket spine, smoothed fractions
    * and PSI terms recomputed with the identical expressions. */
  private lazy val psiOracleSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val fr = (1 until 10).map(i => (i / 10.0).toString)
      .mkString("[", ", ", "]")
    val per = cols.zipWithIndex.map { case (c, i) =>
      s"""ed_$i AS (SELECT list_transform(quantile_cont($c, $fr), x -> round(x, 6)) AS ed FROM ref),
      rc_$i AS (SELECT len(list_filter((SELECT ed FROM ed_$i), e -> $c > e)) AS bucket, count(*) AS n
        FROM ref WHERE $c IS NOT NULL GROUP BY 1),
      cc_$i AS (SELECT len(list_filter((SELECT ed FROM ed_$i), e -> $c > e)) AS bucket, count(*) AS n
        FROM cur WHERE $c IS NOT NULL GROUP BY 1),
      d_$i AS (SELECT '$c' AS col_name, sp.bucket, coalesce(rc.n, 0) AS n_ref, coalesce(cc.n, 0) AS n_cur
        FROM sp LEFT JOIN rc_$i rc ON rc.bucket = sp.bucket LEFT JOIN cc_$i cc ON cc.bucket = sp.bucket)"""
    }.mkString(",\n      ")
    val dAll = cols.indices.map(i => s"SELECT * FROM d_$i")
      .mkString(" UNION ALL ")
    s"""
      WITH ref AS (SELECT * FROM lineitem WHERE l_orderkey % 2 = 0),
      cur AS (SELECT * FROM lineitem WHERE l_orderkey % 2 = 1),
      sp AS (SELECT CAST(unnest(range(10)) AS INT) AS bucket),
      $per,
      d AS ($dAll),
      t AS (SELECT col_name, sum(n_ref) AS tr, sum(n_cur) AS tc FROM d GROUP BY col_name)
      SELECT d.col_name, d.bucket,
        CAST(d.n_ref AS BIGINT) AS n_ref, CAST(d.n_cur AS BIGINT) AS n_cur,
        round((d.n_ref + 0.5) / (t.tr + 5.0), 6) AS ref_frac,
        round((d.n_cur + 0.5) / (t.tc + 5.0), 6) AS cur_frac,
        round(((d.n_cur + 0.5) / (t.tc + 5.0) - (d.n_ref + 0.5) / (t.tr + 5.0)) *
          ln(((d.n_cur + 0.5) / (t.tc + 5.0)) / ((d.n_ref + 0.5) / (t.tr + 5.0))), 6) AS psi_term
      FROM d JOIN t USING (col_name)""".trim
  }

  /** DuckDB replica of [[operators.Packing.zorderKey]] on
    * (l_partkey, l_suppkey) at 8 bits/dim: the same exact-long rescale
    * (integer division) and the interleave as an explicit 16-term bit
    * sum. */
  private lazy val zorderOracleSql: String = {
    val terms = (for { b <- 0 until 8; j <- 0 until 2 } yield {
      val src = if (j == 0) "b1" else "b2"
      s"((($src >> $b) & 1) << ${b * 2 + j})"
    }).mkString(" + ")
    s"""
      WITH mm AS (SELECT min(l_partkey) AS lo1, max(l_partkey) AS hi1,
          min(l_suppkey) AS lo2, max(l_suppkey) AS hi2 FROM lineitem),
      b AS (SELECT l_orderkey, l_linenumber,
          ((l_partkey - lo1) * 255) // greatest(1, hi1 - lo1) AS b1,
          ((l_suppkey - lo2) * 255) // greatest(1, hi2 - lo2) AS b2
        FROM lineitem, mm)
      SELECT l_orderkey, l_linenumber, CAST($terms AS BIGINT) AS zkey
      FROM b""".trim
  }

  /** DuckDB replica of [[operators.Similarity.topKBucketed]] (planesN=12,
    * chunks=4, seed=42, 64-dim): the operator's seeded hyperplanes are
    * inlined as literals, signatures and chunk-bucket candidate join are
    * recomputed in SQL. fp-parity of list_inner_product with the Spark
    * sequential fold is established by q_embed_topk. */
  private lazy val annLshOracleSql: String = {
    val planes = operators.Similarity.hyperplanes(12, 64, 42L)
    val rows = planes.zipWithIndex
      .map { case (p, i) => s"($i, [${p.mkString(", ")}]::DOUBLE[])" }
      .mkString(",\n          ")
    val chunkMatch = (0 until 4)
      .map(c => s"((c.sig >> ${c * 3}) & 7) = ((q.sig >> ${c * 3}) & 7)")
      .mkString(" OR ")
    s"""
      WITH planes(plane, w) AS (VALUES $rows),
      sg AS (SELECT e.vec_id,
          sum(CASE WHEN list_inner_product(e.embedding::DOUBLE[], p.w) >= 0
                   THEN (1::BIGINT << p.plane) ELSE 0::BIGINT END)::BIGINT AS sig
        FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id),
      c AS (SELECT s.vec_id, s.sig, e.embedding FROM sg s JOIN embeddings e USING (vec_id)),
      cand AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
          round(list_inner_product(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
            (sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) *
             sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 6) AS sim
        FROM c JOIN c AS q ON q.vec_id < 5 AND c.vec_id <> q.vec_id AND ($chunkMatch)),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank FROM cand)
      SELECT query_id, vec_id, sim, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= 10""".trim
  }

  /** DuckDB replica of [[operators.Similarity.topKIvf]] (nlist=16, nprobe=4,
    * seed=42): centroid directions inlined as literals; cell assignment and
    * probe ranking replayed with the same (dot DESC, cell DESC) tie order
    * Spark's sort_array uses on (d, cell) structs. */
  private lazy val annIvfOracleSql: String = {
    val cents = operators.Similarity.hyperplanes(16, 64, 42L)
    val rows = cents.zipWithIndex
      .map { case (c, i) => s"($i, [${c.mkString(", ")}]::DOUBLE[])" }
      .mkString(",\n          ")
    s"""
      WITH cents(cell, w) AS (VALUES $rows),
      a AS (SELECT vec_id, cell FROM (
          SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id
            ORDER BY list_inner_product(e.embedding::DOUBLE[], c.w) DESC, c.cell DESC) AS rk
          FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
      p AS (SELECT vec_id AS query_id, cell FROM (
          SELECT q.vec_id, c.cell, row_number() OVER (PARTITION BY q.vec_id
            ORDER BY list_inner_product(q.embedding::DOUBLE[], c.w) DESC, c.cell DESC) AS rk
          FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5) WHERE rk <= 4),
      cand AS (SELECT p.query_id, a.vec_id,
          round(list_inner_product(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
            (sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) *
             sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 6) AS sim
        FROM p JOIN a ON p.cell = a.cell AND a.vec_id <> p.query_id
        JOIN embeddings c ON c.vec_id = a.vec_id
        JOIN embeddings q ON q.vec_id = p.query_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank FROM cand)
      SELECT query_id, vec_id, sim, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= 10""".trim
  }

  /** DuckDB replica of [[operators.Similarity.topKPq]] (m=8, ksub=16,
    * rerank=2, iters=0, seed=42): sub-codebooks inlined as literals; code
    * assignment replays the kernel's strict-< argmin (dist ASC, code ASC),
    * the ADC lookup table replays the fixed-point `floor(dot·1e6 + 0.5)`
    * (≡ JVM Math.round), the integer shortlist sum is order-independent,
    * and the final ranking is the exact-cosine rerank. */
  private lazy val annPqOracleSql: String = {
    val books = operators.Similarity.pqSeedBooks(
      m = 8, ksub = 16, subdim = 8, seed = 42L)
    val rows = (for {
      s <- books.indices; c <- books(s).indices
    } yield s"($s, $c, [${books(s)(c).mkString(", ")}]::DOUBLE[])")
      .mkString(",\n          ")
    s"""
      WITH cb(sub, code, w) AS (VALUES $rows),
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      codes AS (SELECT vec_id, sub, code FROM (
          SELECT e.vec_id, cb.sub, cb.code, row_number() OVER (
            PARTITION BY e.vec_id, cb.sub
            ORDER BY list_distance(list_slice(e.v, cb.sub * 8 + 1, cb.sub * 8 + 8), cb.w) ASC,
              cb.code ASC) AS rk
          FROM e CROSS JOIN cb) WHERE rk = 1),
      lut AS (SELECT q.vec_id AS query_id, cb.sub, cb.code,
          CAST(floor(list_inner_product(
            list_slice(q.v, cb.sub * 8 + 1, cb.sub * 8 + 8), cb.w) * 1000000 + 0.5) AS BIGINT) AS fx
        FROM e q CROSS JOIN cb WHERE q.vec_id < 5),
      adc AS (SELECT l.query_id, c.vec_id, sum(l.fx) AS score
        FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
        WHERE c.vec_id <> l.query_id
        GROUP BY l.query_id, c.vec_id),
      short AS (SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id, row_number() OVER (
            PARTITION BY query_id ORDER BY score DESC, vec_id) AS rk FROM adc)
        WHERE rk <= 20),
      cand AS (SELECT s.query_id, s.vec_id,
          round(list_inner_product(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
            (sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) *
             sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 6) AS sim
        FROM short s JOIN embeddings c ON c.vec_id = s.vec_id
        JOIN embeddings q ON q.vec_id = s.query_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank FROM cand)
      SELECT query_id, vec_id, sim, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= 10""".trim
  }

  /** DuckDB replica of [[operators.Similarity.randomProject]] (outDims=8,
    * seed=42, normalize): direction literals inlined; the norm replays the
    * kernel's left-to-right accumulation via an i-ordered list self
    * inner-product, then the 6-dp rounding. */
  private lazy val annProjectOracleSql: String = {
    val planes = operators.Similarity.hyperplanes(8, 64, 42L)
    val rows = planes.zipWithIndex.map { case (w, i) =>
      s"($i, [${w.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n          ")
    s"""
      WITH pl(i, w) AS (VALUES $rows),
      p AS (SELECT e.vec_id, pl.i,
          list_inner_product(e.embedding::DOUBLE[], pl.w) AS raw
        FROM embeddings e CROSS JOIN pl),
      l AS (SELECT vec_id, list(raw ORDER BY i) AS lr FROM p GROUP BY vec_id)
      SELECT vec_id, CAST(unnest(range(8)) AS INTEGER) AS i,
        round(unnest(lr) / sqrt(list_inner_product(lr, lr)), 6) AS p_val
      FROM l""".trim
  }

  /** DuckDB replica of [[operators.Similarity.semanticPairs]] (nlist=16,
    * seed=42, kmeansIter=0): centroid directions inlined, cell assignment
    * replayed with the operator's (dot DESC, cell DESC) argmax tie order,
    * then within-cell ordered pairs verified by exact cosine. */
  private lazy val semanticPairsOracleSql: String = {
    val cents = operators.Similarity.hyperplanes(16, 64, 42L)
    val rows = cents.zipWithIndex
      .map { case (c, i) => s"($i, [${c.mkString(", ")}]::DOUBLE[])" }
      .mkString(",\n          ")
    s"""
      WITH cents(cell, w) AS (VALUES $rows),
      a AS (SELECT vec_id, cell FROM (
          SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id
            ORDER BY list_inner_product(e.embedding::DOUBLE[], c.w) DESC, c.cell DESC) AS rk
          FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
      p AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
            FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id),
      v AS (SELECT p.vec_a, p.vec_b,
          round(list_inner_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) /
            (sqrt(list_inner_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[])) *
             sqrt(list_inner_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]))), 6) AS sim
        FROM p JOIN embeddings ea ON ea.vec_id = p.vec_a
        JOIN embeddings eb ON eb.vec_id = p.vec_b)
      SELECT vec_a, vec_b, sim FROM v WHERE sim >= 0.3""".trim
  }

  /** DuckDB replica of [[operators.Curation.curateSemantic]]: the
    * semantic-pair CTEs from [[semanticPairsOracleSql]] feed a
    * recursive-CTE transitive closure; each cluster keeps the max-label
    * member (ties to lowest id). */
  private lazy val semanticKeepOracleSql: String = {
    val cents = operators.Similarity.hyperplanes(16, 64, 42L)
    val rows = cents.zipWithIndex
      .map { case (c, i) => s"($i, [${c.mkString(", ")}]::DOUBLE[])" }
      .mkString(",\n          ")
    s"""
      WITH RECURSIVE cents(cell, w) AS (VALUES $rows),
      a AS (SELECT vec_id, cell FROM (
          SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id
            ORDER BY list_inner_product(e.embedding::DOUBLE[], c.w) DESC, c.cell DESC) AS rk
          FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
      p AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
            FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id
            JOIN embeddings ea ON ea.vec_id = x.vec_id
            JOIN embeddings eb ON eb.vec_id = y.vec_id
            WHERE round(list_inner_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) /
              (sqrt(list_inner_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[])) *
               sqrt(list_inner_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]))), 6) >= 0.3),
      e AS (SELECT vec_a AS src, vec_b AS dst FROM p UNION SELECT vec_b, vec_a FROM p),
      reach(src, dst) AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src WHERE e2.dst <> r.src),
      comps AS (SELECT src AS vec_id, least(src, min(dst)) AS comp FROM reach GROUP BY src),
      scored AS (SELECT c.vec_id, c.comp, em.label FROM comps c
                 JOIN embeddings em USING (vec_id)),
      winners AS (SELECT comp, (list(vec_id ORDER BY label DESC, vec_id ASC))[1] AS keep
                  FROM scored GROUP BY comp)
      SELECT em.vec_id FROM embeddings em
      WHERE em.vec_id NOT IN (
        SELECT s.vec_id FROM scored s JOIN winners w USING (comp)
        WHERE s.vec_id <> w.keep)""".trim
  }

  // ----------------------------------------------------------------- queries

  private lazy val defs: List[Q] = List(
    // --- §2.2 projection / filter / predicates -----------------------------
    gq("q_filter_project",
      "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem " +
        "WHERE l_quantity > 45",
      "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem " +
        "WHERE l_quantity > 45"),

    gq("q_transform_case",
      // per-row double arithmetic is bit-identical across engines — no rounding
      "SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS net, " +
        "CASE WHEN l_quantity > 30 THEN 'big' WHEN l_quantity > 10 THEN 'mid' ELSE 'small' END AS sz " +
        "FROM lineitem WHERE l_returnflag = 'R'",
      "SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS net, " +
        "CASE WHEN l_quantity > 30 THEN 'big' WHEN l_quantity > 10 THEN 'mid' ELSE 'small' END AS sz " +
        "FROM lineitem WHERE l_returnflag = 'R'"),

    gq("q_predicates",
      "SELECT p_partkey, p_name FROM part WHERE p_size BETWEEN 10 AND 20 " +
        "AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') AND p_name LIKE '%a%' " +
        "AND p_retailprice IS NOT NULL",
      "SELECT p_partkey, p_name FROM part WHERE p_size BETWEEN 10 AND 20 " +
        "AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') AND p_name LIKE '%a%' " +
        "AND p_retailprice IS NOT NULL"),

    gq("q_null_eq",
      // `= nil` / `!= null` are null TESTS (reference Go-nil comparison,
      // test/e2e/null_test.go:696-707); nulls derived via null_if since
      // the fixtures carry none natively
      "SELECT event_id, null_if(event_type, 'click') AS et FROM events " +
        "WHERE null_if(event_type, 'click') = nil AND value > 400",
      "SELECT event_id, nullif(event_type, 'click') AS et FROM events " +
        "WHERE nullif(event_type, 'click') IS NULL AND value > 400"),

    // --- §2.4 aggregations -------------------------------------------------
    gq("q_agg_basic",
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_price, round(avg(l_discount), 6) AS avg_disc, " +
        "count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus",
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_price, round(avg(l_discount), 6) AS avg_disc, " +
        "count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus"),

    gq("q_agg_stats",
      "SELECT l_returnflag, round(stddev(l_quantity), 6) AS sd_pop, " +
        "round(stddevs(l_quantity), 6) AS sd_samp, round(var(l_quantity), 6) AS var_pop, " +
        "round(vars(l_quantity), 6) AS var_samp, round(median(l_quantity), 4) AS med, " +
        "round(percentile(l_quantity, 0.9), 4) AS p90 FROM lineitem GROUP BY l_returnflag",
      "SELECT l_returnflag, round(stddev_pop(l_quantity), 6) AS sd_pop, " +
        "round(stddev_samp(l_quantity), 6) AS sd_samp, round(var_pop(l_quantity), 6) AS var_pop, " +
        "round(var_samp(l_quantity), 6) AS var_samp, round(median(l_quantity), 4) AS med, " +
        "round(quantile_cont(l_quantity, 0.9), 4) AS p90 FROM lineitem GROUP BY l_returnflag"),

    gq("q_agg_minmax_distinct",
      "SELECT o_orderstatus, min(o_totalprice) AS mn, max(o_totalprice) AS mx, " +
        "count(DISTINCT o_custkey) AS ncust FROM orders GROUP BY o_orderstatus",
      "SELECT o_orderstatus, min(o_totalprice) AS mn, max(o_totalprice) AS mx, " +
        "count(DISTINCT o_custkey) AS ncust FROM orders GROUP BY o_orderstatus"),

    gq("q_post_agg_having",
      "SELECT l_returnflag, round(max(l_extendedprice) - min(l_extendedprice), 2) AS rng, " +
        "round(sum(l_quantity) / count(*), 4) AS manual_avg FROM lineitem " +
        "GROUP BY l_returnflag HAVING rng > 0",
      "SELECT l_returnflag, round(max(l_extendedprice) - min(l_extendedprice), 2) AS rng, " +
        "round(sum(l_quantity) / count(*), 4) AS manual_avg FROM lineitem " +
        "GROUP BY l_returnflag HAVING round(max(l_extendedprice) - min(l_extendedprice), 2) > 0"),

    gq("q_having_hidden_agg",
      "SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY o_orderpriority " +
        "HAVING max(o_totalprice) > 100000",
      "SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY o_orderpriority " +
        "HAVING max(o_totalprice) > 100000"),

    gq("q_group_scalar_key",
      "SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, count(*) AS cnt, " +
        "round(sum(o_totalprice), 2) AS total FROM orders " +
        "GROUP BY year(o_orderdate), month(o_orderdate)",
      "SELECT CAST(year(o_orderdate) AS INTEGER) AS y, CAST(month(o_orderdate) AS INTEGER) AS m, " +
        "count(*) AS cnt, round(sum(o_totalprice), 2) AS total FROM orders " +
        "GROUP BY 1, 2"),

    gq("q_rollup",
      // grouping sets (SURVEY §2.4: absent in the reference, free on
      // Catalyst) — one shuffle covers all levels via partial aggregation
      "SELECT l_returnflag, l_linestatus, count(*) AS cnt, " +
        "round(sum(l_quantity), 2) AS sq FROM lineitem " +
        "GROUP BY ROLLUP(l_returnflag, l_linestatus)",
      "SELECT l_returnflag, l_linestatus, count(*) AS cnt, " +
        "round(sum(l_quantity), 2) AS sq FROM lineitem " +
        "GROUP BY ROLLUP(l_returnflag, l_linestatus)"),

    gq("q_cube",
      "SELECT o_orderstatus, o_orderpriority, count(*) AS cnt, " +
        "round(avg(o_totalprice), 4) AS ap FROM orders " +
        "GROUP BY CUBE(o_orderstatus, o_orderpriority)",
      "SELECT o_orderstatus, o_orderpriority, count(*) AS cnt, " +
        "round(avg(o_totalprice), 4) AS ap FROM orders " +
        "GROUP BY CUBE(o_orderstatus, o_orderpriority)"),

    gq("q_first_last_collect",
      "SELECT user_id, first_value(event_type) AS first_ev, last_value(event_type) AS last_ev, " +
        "count(*) AS cnt FROM events GROUP BY user_id " +
        "WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "SELECT user_id, arg_min(event_type, ts) AS first_ev, arg_max(event_type, ts) AS last_ev, " +
        "count(*) AS cnt FROM events GROUP BY user_id"),

    gq("q_merge_dedup_agg",
      // deduplicate() (array-valued) joined to a string post-aggregation:
      // the driver's pandas compare cannot hash ndarray cells
      "SELECT user_id, merge_agg(event_type) AS evs, " +
        "array_join(deduplicate(event_type), ',') AS uniq " +
        "FROM events WHERE event_id < 200 GROUP BY user_id " +
        "WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "WITH e AS (SELECT user_id, event_type, ts FROM events WHERE event_id < 200), " +
        "m AS (SELECT user_id, string_agg(event_type, ',' ORDER BY ts) AS evs FROM e GROUP BY user_id), " +
        "d AS (SELECT user_id, array_to_string(list(event_type ORDER BY min_ts), ',') AS uniq FROM " +
        "(SELECT user_id, event_type, min(ts) AS min_ts FROM e GROUP BY user_id, event_type) " +
        "GROUP BY user_id) " +
        "SELECT m.user_id AS user_id, m.evs AS evs, d.uniq AS uniq FROM m JOIN d ON m.user_id = d.user_id"),

    gq("q_collect_nth",
      // collect() in event order + nth_value (functions_aggregation.go:564,
      // functions_window.go:232); array output stringified for the comparator
      "SELECT user_id, array_join(collect(event_type), '|') AS evs, " +
        "nth_value(event_type, 2) AS second, count(*) AS cnt " +
        "FROM events WHERE event_id < 400 GROUP BY user_id " +
        "WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "SELECT user_id, array_to_string(list(event_type ORDER BY ts, event_id), '|') AS evs, " +
        "(list(event_type ORDER BY ts, event_id))[2] AS second, count(*) AS cnt " +
        "FROM events WHERE event_id < 400 GROUP BY user_id"),

    gq("q_agg_stats2",
      // higher-moment aggregates (Spark-first extensions, SURVEY §2.4):
      // DuckDB kurtosis is sample-corrected → kurtosis_pop; no skewness_pop
      // → population skewness recomputed from raw moments
      "SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6) AS cr, " +
        "round(covar_pop(l_quantity, l_extendedprice), 4) AS cvp, " +
        "round(covar_samp(l_quantity, l_extendedprice), 4) AS cvs, " +
        "round(skewness(l_quantity), 6) AS sk, round(kurtosis(l_quantity), 6) AS ku " +
        "FROM lineitem GROUP BY l_returnflag",
      "WITH m AS (SELECT l_returnflag AS rf, avg(l_quantity) AS mu, " +
        "stddev_pop(l_quantity) AS sg FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l.l_returnflag, round(corr(l_quantity, l_extendedprice), 6) AS cr, " +
        "round(covar_pop(l_quantity, l_extendedprice), 4) AS cvp, " +
        "round(covar_samp(l_quantity, l_extendedprice), 4) AS cvs, " +
        "round(avg(pow(l_quantity - mu, 3)) / pow(sg, 3), 6) AS sk, " +
        "round(kurtosis_pop(l_quantity), 6) AS ku " +
        "FROM lineitem l JOIN m ON l.l_returnflag = m.rf " +
        "GROUP BY l.l_returnflag, mu, sg"),

    // --- §2.6 sort / limit / top-k ----------------------------------------
    gq("q_topk",
      "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25",
      "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25"),

    gq("q_distinct",
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"),

    gq("q_group_null_keys",
      // NULL group keys collapse into one NULL group (reference:
      // aggregator/group_aggregator.go:14-22,212-227 — sentinel key)
      "SELECT null_if(event_type, 'error') AS et, count(*) AS cnt, " +
        "round(sum(value), 2) AS sv FROM events GROUP BY null_if(event_type, 'error')",
      "SELECT nullif(event_type, 'error') AS et, count(*) AS cnt, " +
        "round(sum(value), 2) AS sv FROM events GROUP BY nullif(event_type, 'error')"),

    gq("q_window_first_last",
      // order-sensitive aggregates inside a time window (event order via
      // TIMESTAMP+TIEBREAK; reference feeds accumulators in arrival order)
      "SELECT user_id, first_value(value) AS fv, last_value(value) AS lv, " +
        "window_start() AS ws FROM events " +
        "GROUP BY user_id, TumblingWindow('7d') WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      // ordered-list indexing honors the full (ts, event_id) tiebreak —
      // arg_min(value, ts) alone would be nondeterministic on equal ts
      "SELECT user_id, (list(value ORDER BY ts, event_id))[1] AS fv, " +
        "(list(value ORDER BY ts, event_id))[-1] AS lv, " +
        "CAST(floor(epoch(ts) / 604800) * 604800000 AS BIGINT) AS ws " +
        "FROM events GROUP BY user_id, floor(epoch(ts) / 604800)"),

    gq("q_like_wildcards",
      // '_' single-char wildcard alongside '%' (reference LIKE matcher,
      // functions/expr_bridge.go:633-660)
      "SELECT p_partkey, p_name FROM part " +
        "WHERE p_name LIKE '%r_d%' OR p_type LIKE 'a%d' OR p_brand LIKE 'Brand#_'",
      "SELECT p_partkey, p_name FROM part " +
        "WHERE p_name LIKE '%r_d%' OR p_type LIKE 'a%d' OR p_brand LIKE 'Brand#_'"),

    gq("q_full_clause_stack",
      // WHERE → GROUP BY → HAVING (alias) → ORDER BY → LIMIT in one query
      // (the reference pipeline end-to-end, stream/processor_data.go:383-493)
      "SELECT l_returnflag, l_linestatus, count(*) AS cnt, " +
        "round(avg(l_extendedprice), 2) AS ap FROM lineitem " +
        "WHERE l_quantity > 10 GROUP BY l_returnflag, l_linestatus " +
        "HAVING cnt > 1000 ORDER BY cnt DESC, l_returnflag, l_linestatus LIMIT 3",
      "SELECT l_returnflag, l_linestatus, count(*) AS cnt, " +
        "round(avg(l_extendedprice), 2) AS ap FROM lineitem " +
        "WHERE l_quantity > 10 GROUP BY l_returnflag, l_linestatus " +
        "HAVING count(*) > 1000 ORDER BY cnt DESC, l_returnflag, l_linestatus LIMIT 3"),

    gq("q_distinct_expr",
      // SELECT DISTINCT over computed columns (dedup after projection,
      // reference: stream/processor_data.go:496-514)
      "SELECT DISTINCT cast(value / 100, 'int') AS bucket, event_type " +
        "FROM events WHERE value > 20",
      "SELECT DISTINCT CAST(floor(value / 100) AS BIGINT) AS bucket, event_type " +
        "FROM events WHERE value > 20"),

    // --- §2.3 joins --------------------------------------------------------
    gq("q_join_inner",
      "SELECT l_orderkey, l_linenumber, o.o_orderstatus, o.o_totalprice FROM lineitem " +
        "JOIN orders o ON l_orderkey = o.o_orderkey WHERE l_quantity > 48",
      "SELECT l_orderkey, l_linenumber, o.o_orderstatus, o.o_totalprice FROM lineitem " +
        "JOIN orders o ON l_orderkey = o.o_orderkey WHERE l_quantity > 48"),

    gq("q_join_multi_agg",
      "SELECT n.n_name AS nation, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
        "count(*) AS cnt FROM lineitem " +
        "JOIN supplier s ON l_suppkey = s.s_suppkey " +
        "JOIN nation n ON s.s_nationkey = n.n_nationkey " +
        "GROUP BY n.n_name",
      "SELECT n.n_name AS nation, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
        "count(*) AS cnt FROM lineitem " +
        "JOIN supplier s ON l_suppkey = s.s_suppkey " +
        "JOIN nation n ON s.s_nationkey = n.n_nationkey " +
        "GROUP BY n.n_name"),

    gq("q_join_left_null",
      "SELECT o_orderkey, c.c_name FROM orders " +
        "LEFT JOIN customer c ON o_custkey = c.c_custkey WHERE o_totalprice > 300000",
      "SELECT o_orderkey, c.c_name FROM orders " +
        "LEFT JOIN customer c ON o_custkey = c.c_custkey WHERE o_totalprice > 300000"),

    gq("q_join_window_agg",
      // enrichment JOIN feeding a time-windowed aggregation — the reference
      // pipeline order enrich → WHERE → window.Add
      // (stream/processor_data.go:94-104, test/e2e/join_aggregation_test.go)
      "SELECT s.s_name AS sname, count(*) AS cnt, round(sum(l_extendedprice), 2) AS rev, " +
        "window_start() AS ws FROM lineitem " +
        "JOIN supplier s ON l_suppkey = s.s_suppkey " +
        "WHERE l_quantity > 30 " +
        "GROUP BY s.s_name, TumblingWindow('365d') WITH (TIMESTAMP='l_shipdate')",
      "SELECT s.s_name AS sname, count(*) AS cnt, round(sum(l_extendedprice), 2) AS rev, " +
        "CAST(floor(epoch(l_shipdate) / 31536000) * 31536000000 AS BIGINT) AS ws " +
        "FROM lineitem JOIN supplier s ON l_suppkey = s.s_suppkey " +
        "WHERE l_quantity > 30 GROUP BY s.s_name, floor(epoch(l_shipdate) / 31536000)"),

    gq("q_join_analytic",
      // enrichment JOIN before per-event analytics (stream/stream.go:640-671
      // — the direct path enriches, then runs the state machines)
      "SELECT user_id, event_id, c.c_name AS cname, " +
        "round(lag(value, 1, 0) OVER (PARTITION BY user_id), 2) AS pv FROM events " +
        "JOIN customer c ON user_id = c.c_custkey " +
        "WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "SELECT user_id, event_id, c.c_name AS cname, " +
        "round(lag(value, 1, 0) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS pv " +
        "FROM events JOIN customer c ON user_id = c.c_custkey"),

    // --- §2.8 scalar function library -------------------------------------
    gq("q_string_funcs",
      "SELECT p_partkey, upper(p_brand) AS ub, lower(p_type) AS lt, " +
        "concat(p_brand, '_', p_type) AS ct, substring(p_name, 0, 8) AS sub, " +
        "replace(p_type, ' ', '-') AS rep, length(p_name) AS len, " +
        "indexof(p_name, 'a') AS idx, lpad(p_brand, 12, '*') AS pad, " +
        "trim(p_name) AS tr FROM part WHERE p_partkey <= 500",
      "SELECT p_partkey, upper(p_brand) AS ub, lower(p_type) AS lt, " +
        "concat(p_brand, '_', p_type) AS ct, substr(p_name, 1, 8) AS sub, " +
        "replace(p_type, ' ', '-') AS rep, CAST(length(p_name) AS INTEGER) AS len, " +
        "CAST(strpos(p_name, 'a') - 1 AS INTEGER) AS idx, lpad(p_brand, 12, '*') AS pad, " +
        "trim(p_name) AS tr FROM part WHERE p_partkey <= 500"),

    gq("q_math_funcs",
      "SELECT l_orderkey, l_linenumber, abs(l_discount - 0.05) AS a, " +
        "round(sqrt(l_quantity), 6) AS sq, floor(l_extendedprice / 1000) AS fl, " +
        "ceil(l_quantity / 7) AS ce, mod(l_orderkey, 7) AS md, " +
        "round(exp(l_discount), 6) AS ex, round(ln(l_quantity + 1), 6) AS lg, " +
        "sign(l_discount - 0.05) AS sg FROM lineitem WHERE l_partkey < 100",
      "SELECT l_orderkey, l_linenumber, abs(l_discount - 0.05) AS a, " +
        "round(sqrt(l_quantity), 6) AS sq, CAST(floor(l_extendedprice / 1000) AS BIGINT) AS fl, " +
        "CAST(ceil(l_quantity / 7) AS BIGINT) AS ce, CAST(mod(l_orderkey, 7) AS BIGINT) AS md, " +
        "round(exp(l_discount), 6) AS ex, round(ln(l_quantity + 1), 6) AS lg, " +
        "CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg FROM lineitem WHERE l_partkey < 100"),

    gq("q_datetime_funcs",
      "SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m, " +
        "day(o_orderdate) AS d, dayofweek(o_orderdate) AS dw, " +
        "date_format(o_orderdate, 'yyyy-MM-dd') AS fmt FROM orders WHERE o_orderkey < 3000",
      "SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS y, " +
        "CAST(month(o_orderdate) AS INTEGER) AS m, CAST(day(o_orderdate) AS INTEGER) AS d, " +
        "CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dw, " +
        "strftime(o_orderdate, '%Y-%m-%d') AS fmt FROM orders WHERE o_orderkey < 3000"),

    gq("q_json_funcs",
      "SELECT event_id, cast(json_extract(props, '$.k'), 'int') AS k, " +
        "json_valid(props) AS ok, json_type(props) AS jt FROM events WHERE event_id < 500",
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, " +
        "props IS NOT NULL AND json_valid(props) AS ok, " +
        "CASE WHEN trim(props) LIKE '{%' THEN 'object' ELSE 'other' END AS jt " +
        "FROM events WHERE event_id < 500"),

    gq("q_json_format_funcs",
      "SELECT event_id, json_length(props) AS jl, format(value / 3, '0.00') AS fv, " +
        "date_parse(date_format(ts, 'yyyy-MM-dd HH:mm:ss')) AS rt " +
        "FROM events WHERE event_id < 350",
      "SELECT event_id, CAST(len(json_keys(props)) AS INTEGER) AS jl, " +
        "printf('%.2f', value / 3) AS fv, " +
        "strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS rt " +
        "FROM events WHERE event_id < 350"),

    gq("q_hash_conv_funcs",
      "SELECT p_partkey, md5(p_name) AS h1, sha256(p_brand) AS h2, " +
        "dec2hex(p_partkey) AS hx, hex2dec(dec2hex(p_partkey)) AS rt, " +
        "cast(p_size, 'string') AS ss FROM part WHERE p_partkey <= 300",
      "SELECT p_partkey, md5(p_name) AS h1, sha256(p_brand) AS h2, " +
        "lower(hex(p_partkey)) AS hx, CAST(p_partkey AS BIGINT) AS rt, " +
        "CAST(p_size AS VARCHAR) AS ss FROM part WHERE p_partkey <= 300"),

    gq("q_conditional_funcs",
      "SELECT event_id, if_null(null_if(event_type, 'error'), 'was_error') AS et, " +
        "coalesce(null_if(value, 0), -1) AS v, " +
        "least(value, 100) AS lo, greatest(value, 100) AS hi " +
        "FROM events WHERE event_id < 400",
      "SELECT event_id, ifnull(nullif(event_type, 'error'), 'was_error') AS et, " +
        "coalesce(nullif(value, 0), -1) AS v, " +
        "least(value, 100) AS lo, greatest(value, 100) AS hi " +
        "FROM events WHERE event_id < 400"),

    gq("q_trig_funcs",
      // transcendentals rounded on BOTH sides: Java Math.* and libm may
      // differ in the last ulp (sinh/cosh/tanh have no DuckDB builtin →
      // exp formulation)
      "SELECT l_orderkey, l_linenumber, round(sin(l_quantity), 6) AS sn, " +
        "round(cos(l_quantity), 6) AS cs, round(tan(l_discount), 6) AS tn, " +
        "round(atan(l_discount), 6) AS at, round(atan2(l_quantity, l_discount + 1), 6) AS at2, " +
        "round(sinh(l_discount), 6) AS sh, round(cosh(l_discount), 6) AS ch, " +
        "round(tanh(l_discount), 6) AS th, round(asin(l_discount), 6) AS asn, " +
        "round(acos(l_discount), 6) AS acs, round(power(l_quantity, 2), 2) AS pw " +
        "FROM lineitem WHERE l_partkey < 80",
      "SELECT l_orderkey, l_linenumber, round(sin(l_quantity), 6) AS sn, " +
        "round(cos(l_quantity), 6) AS cs, round(tan(l_discount), 6) AS tn, " +
        "round(atan(l_discount), 6) AS at, round(atan2(l_quantity, l_discount + 1), 6) AS at2, " +
        "round((exp(l_discount) - exp(-l_discount)) / 2, 6) AS sh, " +
        "round((exp(l_discount) + exp(-l_discount)) / 2, 6) AS ch, " +
        "round((exp(l_discount) - exp(-l_discount)) / (exp(l_discount) + exp(-l_discount)), 6) AS th, " +
        "round(asin(l_discount), 6) AS asn, round(acos(l_discount), 6) AS acs, " +
        "round(pow(l_quantity, 2), 2) AS pw " +
        "FROM lineitem WHERE l_partkey < 80"),

    gq("q_string_funcs2",
      "SELECT p_partkey, rpad(p_brand, 12, '*') AS rp, " +
        "ltrim(concat(' ', p_name)) AS lt, rtrim(concat(p_name, ' ')) AS rt, " +
        "endswith(p_type, 'd') AS ew, startswith(p_type, 'a') AS sw, " +
        "array_join(split(p_type, ' '), '_') AS sp, chr(65 + mod(p_size, 26)) AS ch " +
        "FROM part WHERE p_partkey <= 350",
      "SELECT p_partkey, rpad(p_brand, 12, '*') AS rp, " +
        "ltrim(' ' || p_name) AS lt, rtrim(p_name || ' ') AS rt, " +
        "ends_with(p_type, 'd') AS ew, starts_with(p_type, 'a') AS sw, " +
        "array_to_string(string_split(p_type, ' '), '_') AS sp, " +
        "chr(65 + p_size % 26) AS ch " +
        "FROM part WHERE p_partkey <= 350"),

    gq("q_array_funcs2",
      // position/remove/except/union/intersect (functions_array.go:71-312);
      // set-valued results sorted+stringified (list_distinct order differs)
      "SELECT doc_id, array_position(split(text, ' '), 'the') AS pos, " +
        "array_join(array_remove(slice(split(text, ' '), 1, 6), 'the'), '|') AS rem, " +
        "array_join(array_sort(array_except(slice(split(text, ' '), 1, 8), slice(split(text, ' '), 1, 4))), '|') AS exc, " +
        "array_join(array_sort(array_union(slice(split(text, ' '), 1, 3), slice(split(text, ' '), 4, 3))), '|') AS uni, " +
        "array_join(array_sort(array_intersect(split(text, ' '), array('the', 'and', 'of'))), '|') AS its " +
        "FROM documents WHERE doc_id < 120",
      // coalesce to '': DuckDB array_to_string of an EMPTY list yields NULL,
      // Spark array_join yields ''
      "SELECT doc_id, CAST(coalesce(list_position(string_split(text, ' '), 'the'), 0) AS BIGINT) AS pos, " +
        "coalesce(array_to_string(list_filter(string_split(text, ' ')[1:6], x -> x != 'the'), '|'), '') AS rem, " +
        "coalesce(array_to_string(list_sort(list_distinct(list_filter(string_split(text, ' ')[1:8], " +
        "x -> NOT list_contains(string_split(text, ' ')[1:4], x)))), '|'), '') AS exc, " +
        "coalesce(array_to_string(list_sort(list_distinct(list_concat(string_split(text, ' ')[1:3], " +
        "string_split(text, ' ')[4:6]))), '|'), '') AS uni, " +
        "coalesce(array_to_string(list_sort(list_distinct(list_intersect(string_split(text, ' '), " +
        "['the', 'and', 'of']))), '|'), '') AS its " +
        "FROM documents WHERE doc_id < 120"),

    gq("q_pipeline_funcs2",
      // round-7 pipeline kernels on the dialect surface: html extraction,
      // Luhn validation, canonical-URL normalization — all through the
      // parser, oracle derives expectations from the constructions
      "SELECT doc_id, " +
        "html_text(concat('<p>', text, '</p><script>var x;</script>')) AS ht, " +
        "html_title(concat('<title> T ', cast(doc_id, 'string'), ' </title>')) AS t, " +
        "luhn_valid('4111111111111111') AS lv1, " +
        "luhn_valid('4111111111111112') AS lv2, " +
        "canonical_url(concat('HTTP://', source, '.COM:80/A/b/?utm_q=1&b=2#f')) AS cu " +
        "FROM documents",
      "SELECT doc_id, " +
        "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text, " +
        "'[ \t\r\f]+', ' ', 'g'), ' ?\n ?', chr(10), 'g'), '\n+', chr(10), 'g'), " +
        "'^\n+|\n+$', '', 'g')) AS ht, " +
        "'T ' || doc_id AS t, true AS lv1, false AS lv2, " +
        "'http://' || source || '.com/A/b?b=2' AS cu " +
        "FROM documents"),

    gq("q_pipeline_funcs3",
      // r10 hygiene kernels on the dialect surface: NFC, invisible-strip,
      // de-hyphenation — decomposed accents and zero-width chars built
      // IN-QUERY from concat'd char literals so the parser path is tested
      // chr() is byte-mod-256 on this side, so multi-byte specials build
      // from their UTF-8 bytes via the dialect's decode(x, 'hex')
      "SELECT doc_id, " +
        "nfc_normalize(concat('cafe', decode('CC81', 'hex'), ' ', text)) AS nfc, " +
        "strip_invisible(concat('a', decode('E2808B', 'hex'), 'b', " +
        "decode('C2AD', 'hex'), text)) AS si, " +
        "dehyphenate(concat('exam-', chr(10), 'ple ', text)) AS dh " +
        "FROM documents WHERE doc_id < 100",
      "SELECT doc_id, " +
        "nfc_normalize('cafe' || chr(769) || ' ' || text) AS nfc, " +
        "regexp_replace('a' || chr(8203) || 'b' || chr(173) || text, " +
        "'[\\x{200B}\\x{200C}\\x{200D}\\x{2060}\\x{FEFF}\\x{00AD}]', '', 'g') AS si, " +
        "regexp_replace('exam-' || chr(10) || 'ple ' || text, " +
        "'(\\p{L})-[ \\t]*\\n[ \\t]*(\\p{L})', '\\1\\2', 'g') AS dh " +
        "FROM documents WHERE doc_id < 100"),

    gq("q_pipeline_funcs4",
      // r13/r14 analytics kernels on the dialect surface: entropy gates
      // (incl. in WHERE — analytic-grade functions must compose as
      // filters), repetition collapse, registered-domain/URL-depth
      // lexical features, page-level crawl directives. The oracle
      // replays the entropy distributions from scratch (the q_entropy
      // CTE) and derives everything else from the constructions
      "SELECT doc_id, round(char_entropy(text), 6) AS ce, " +
        "collapse_repeats(concat('go go go go stop ', cast(doc_id, 'string'))) AS cr, " +
        "registered_domain(concat('http://www.', source, '.co.uk/a/b')) AS rd, " +
        "url_depth(concat('http://', source, '.com/a/b/', cast(doc_id, 'string'))) AS ud, " +
        "robots_noindex(CASE WHEN mod(doc_id, 2) = 0 " +
        "THEN '<meta name=\"robots\" content=\"noindex\">' ELSE '<p>x</p>' END) AS rni, " +
        "html_canonical('<link rel=\"canonical\" href=\"https://e.com/c\">') AS hc, " +
        "nofollow_links('<a href=\"/a\" rel=\"nofollow\">a</a>" +
        "<area href=\"/b\" rel=\"nofollow\">') AS nfl " +
        "FROM documents WHERE word_entropy(text) > 2",
      """
        WITH n AS (
          SELECT doc_id, source, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
          FROM documents
        ), cg AS (
          SELECT doc_id, ch, count(*) AS c
          FROM (SELECT doc_id, unnest(string_split(t, '')) AS ch FROM n)
          GROUP BY 1, 2
        ), ct AS (SELECT doc_id, sum(c) AS tot FROM cg GROUP BY 1),
        ce AS (
          SELECT cg.doc_id,
            sum(-(c::DOUBLE / tot) * ln(c::DOUBLE / tot) / ln(2)) AS h
          FROM cg JOIN ct USING (doc_id) GROUP BY 1
        ), wg AS (
          SELECT doc_id, w, count(*) AS c
          FROM (SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM n)
          GROUP BY 1, 2
        ), wt AS (SELECT doc_id, sum(c) AS tot FROM wg GROUP BY 1),
        we AS (
          SELECT wg.doc_id,
            sum(-(c::DOUBLE / tot) * ln(c::DOUBLE / tot) / ln(2)) AS h
          FROM wg JOIN wt USING (doc_id) GROUP BY 1
        )
        SELECT n.doc_id, round(ce.h, 6) AS ce,
          'go go stop ' || n.doc_id AS cr,
          n.source || '.co.uk' AS rd,
          CAST(3 AS INTEGER) AS ud,
          n.doc_id % 2 = 0 AS rni,
          'https://e.com/c' AS hc,
          CAST(1 AS INTEGER) AS nfl
        FROM n JOIN ce ON ce.doc_id = n.doc_id JOIN we ON we.doc_id = n.doc_id
        WHERE we.h > 2""".stripMargin.trim),

    gq("q_misc_funcs",
      // dialect log is base-10 (functions_math.go:419-436); bit ops on keys
      "SELECT l_orderkey, l_linenumber, round(log(l_quantity), 6) AS lg10, " +
        "round(log2(l_quantity), 6) AS lg2, " +
        "bitand(l_orderkey, 255) AS ba, bitor(l_linenumber, 8) AS bo, " +
        "bitxor(l_orderkey, l_linenumber) AS bx, bitnot(l_linenumber) AS bn, " +
        "regexp_substring(cast(l_shipdate, 'string'), '[0-9]{4}') AS rs, " +
        "from_unixtime(l_orderkey + 1000000) AS fu " +
        "FROM lineitem WHERE l_partkey < 60",
      "SELECT l_orderkey, l_linenumber, round(log(l_quantity), 6) AS lg10, " +
        "round(log2(l_quantity), 6) AS lg2, " +
        "l_orderkey & 255 AS ba, CAST(l_linenumber | 8 AS INTEGER) AS bo, " +
        "xor(l_orderkey, l_linenumber) AS bx, CAST(~l_linenumber AS INTEGER) AS bn, " +
        "regexp_extract(l_shipdate::VARCHAR, '[0-9]{4}') AS rs, " +
        "strftime(to_timestamp(l_orderkey + 1000000), '%Y-%m-%d %H:%M:%S') AS fu " +
        "FROM lineitem WHERE l_partkey < 60"),

    gq("q_datetime_funcs2",
      "SELECT event_id, hour(ts) AS hh, minute(ts) AS mi, second(ts) AS ss, " +
        "dayofyear(ts) AS dy, weekofyear(ts) AS wy FROM events WHERE event_id < 800",
      "SELECT event_id, CAST(hour(ts) AS INTEGER) AS hh, CAST(minute(ts) AS INTEGER) AS mi, " +
        "CAST(second(ts) AS INTEGER) AS ss, CAST(dayofyear(ts) AS INTEGER) AS dy, " +
        "CAST(weekofyear(ts) AS INTEGER) AS wy FROM events WHERE event_id < 800"),

    // --- §2.8 unnest (multi-row) ------------------------------------------
    gq("q_unnest",
      "SELECT doc_id, unnest(split(text, ' ')) AS word FROM documents WHERE doc_id < 50",
      "SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents WHERE doc_id < 50"),

    gq("q_word_ngrams",
      // kernel n-grams from dialect SQL (n is a plan-time literal)
      "SELECT doc_id, unnest(word_ngrams(text, 2)) AS gram FROM documents " +
        "WHERE doc_id < 30",
      "SELECT doc_id, unnest(CASE WHEN len(w) >= 2 THEN " +
        "[array_to_string(w[i:i+1], ' ') for i in range(1, len(w))] " +
        "ELSE [] END) AS gram FROM (SELECT doc_id, " +
        "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w " +
        "FROM documents WHERE doc_id < 30)"),

    gq("q_sentence_unnest",
      // sentence_split composes with the dialect's unnest — one row per
      // sentence straight from SQL (terminators injected by construction)
      "SELECT doc_id, unnest(sentence_split(concat('Alpha. ', text, ' Omega!'))) " +
        "AS sentence FROM documents WHERE doc_id < 50",
      "SELECT doc_id, unnest(list_filter(list_transform(regexp_extract_all(" +
        "regexp_replace('Alpha. ' || text || ' Omega!', '[ \t\n\r\f]+', ' ', 'g'), " +
        "'[^.!?]+[.!?]*'), x -> trim(x)), x -> x <> '')) AS sentence " +
        "FROM documents WHERE doc_id < 50"),

    Q("q_nested_access",
      // array subscripts (0-based, negative-from-end) and map-key lookup of
      // the dialect (reference: docs/NESTED_FIELD_ACCESS.md) on a derived
      // table with array/map columns
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val t = Tables.load(s, dir)("documents").select(col("doc_id"),
          split(col("text"), " ").as("words"),
          map(lit("chars"), col("n_chars")).as("meta"))
        GraftEngine.sql(
          "SELECT doc_id, words[0] AS w0, words[-1] AS wlast, " +
            "meta['chars'] AS chars FROM t WHERE doc_id < 300",
          Map("t" -> t))
      },
      Some("SELECT doc_id, string_split(text, ' ')[1] AS w0, " +
        "string_split(text, ' ')[-1] AS wlast, n_chars AS chars " +
        "FROM documents WHERE doc_id < 300")),

    // --- §2.9 windows (batch analog of streaming semantics) ---------------
    gq("q_window_tumbling",
      "SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sv, " +
        "window_start() AS ws, window_end() AS we FROM events " +
        "GROUP BY event_type, TumblingWindow('1d') WITH (TIMESTAMP='ts')",
      "SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sv, " +
        "CAST(floor(epoch(ts) / 86400) * 86400000 AS BIGINT) AS ws, " +
        "CAST((floor(epoch(ts) / 86400) + 1) * 86400000 AS BIGINT) AS we " +
        "FROM events GROUP BY event_type, floor(epoch(ts) / 86400)"),

    gq("q_window_sliding",
      "SELECT count(*) AS cnt, round(avg(value), 4) AS av, window_start() AS ws " +
        "FROM events GROUP BY SlidingWindow('1d', '12h') WITH (TIMESTAMP='ts')",
      "SELECT count(*) AS cnt, round(avg(value), 4) AS av, " +
        "CAST((floor(epoch(ts) / 43200) - k) * 43200000 AS BIGINT) AS ws " +
        "FROM events CROSS JOIN (VALUES (0), (1)) t(k) " +
        "GROUP BY (floor(epoch(ts) / 43200) - k)"),

    gq("q_window_session",
      "SELECT user_id, count(*) AS cnt, window_start() AS ws FROM events " +
        "GROUP BY user_id, SessionWindow('1h') WITH (TIMESTAMP='ts')",
      "WITH g AS (SELECT user_id, ts, CASE WHEN ts - lag(ts) OVER " +
        "(PARTITION BY user_id ORDER BY ts) >= INTERVAL 1 HOUR OR lag(ts) OVER " +
        "(PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS brk FROM events), " +
        "s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM g) " +
        "SELECT user_id, count(*) AS cnt, epoch_ms(min(ts)) AS ws FROM s GROUP BY user_id, sid"),

    gq("q_window_counting",
      "SELECT user_id, count(*) AS cnt, round(sum(value), 2) AS sv FROM events " +
        "GROUP BY user_id, CountingWindow(5) WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "WITH r AS (SELECT user_id, value, " +
        "CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) / 5) AS BIGINT) AS wid " +
        "FROM events) " +
        "SELECT user_id, count(*) AS cnt, round(sum(value), 2) AS sv FROM r GROUP BY user_id, wid " +
        "HAVING count(*) = 5"),

    // --- §2.5 analytics / CDC ---------------------------------------------
    gq("q_lag",
      "SELECT user_id, event_id, round(value - lag(value, 1, 0) " +
        "OVER (PARTITION BY user_id), 2) AS dv FROM events " +
        "WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "SELECT user_id, event_id, round(value - lag(value, 1, 0) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS dv FROM events"),

    gq("q_latest",
      "SELECT user_id, event_id, latest(null_if(value, 0)) " +
        "OVER (PARTITION BY user_id) AS lv FROM events " +
        "WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "SELECT user_id, event_id, last_value(nullif(value, 0) IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS lv " +
        "FROM events"),

    gq("q_acc_running",
      "SELECT user_id, event_id, round(acc_sum(value) OVER (PARTITION BY user_id), 2) AS rs, " +
        "acc_count(value) OVER (PARTITION BY user_id) AS rc, " +
        "round(acc_max(value) OVER (PARTITION BY user_id), 2) AS rm FROM events " +
        "WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "SELECT user_id, event_id, round(sum(value) OVER w, 2) AS rs, " +
        "count(value) OVER w AS rc, round(max(value) OVER w, 2) AS rm FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)"),

    gq("q_had_changed",
      "SELECT user_id, event_id, had_changed(true, event_type) " +
        "OVER (PARTITION BY user_id) AS h FROM events " +
        "WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "SELECT user_id, event_id, CASE WHEN row_number() OVER w = 1 THEN true " +
        "ELSE event_type IS DISTINCT FROM lag(event_type) OVER w END AS h FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"),

    gq("q_had_changed_star",
      // * expands to the whole row by column name (stream/analytic.go:
      // 155-166); event_id is per-row unique so every event reports a
      // change — the oracle pins the expansion itself, the column-list
      // variant (q_had_changed) pins the comparison logic
      "SELECT user_id, event_id, had_changed(true, *) " +
        "OVER (PARTITION BY user_id) AS h FROM events " +
        "WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "SELECT user_id, event_id, TRUE AS h FROM events"),

    gq("q_over_when",
      // WHEN-gated analytic state (reference: stream/analytic.go:142-148):
      // lag updates only at 'click' rows; other rows replay the last result
      "SELECT user_id, event_id, lag(value) " +
        "OVER (PARTITION BY user_id WHEN event_type = 'click') AS pv FROM events " +
        "WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "WITH b AS (SELECT user_id, event_id, ts, " +
        "CASE WHEN event_type = 'click' THEN value END AS x FROM events), " +
        "c AS (SELECT *, last_value(x IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevg FROM b), " +
        "d AS (SELECT *, CASE WHEN x IS NOT NULL THEN struct_pack(v := prevg) END AS resu FROM c) " +
        "SELECT user_id, event_id, (last_value(resu IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)).v AS pv FROM d"),

    gq("q_global_trigger",
      // GLOBAL WINDOW fire-and-purge (reference: window/global_window.go:
      // 197-253): count(*)>=3 fires at every 3rd row per key and purges, so
      // the emitted aggregates equal complete 3-row blocks in event order
      "SELECT user_id, count(*) AS cnt, round(sum(value), 2) AS sv FROM events " +
        "GROUP BY user_id, GLOBAL WINDOW TRIGGER WHEN count(*) >= 3 " +
        "WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "WITH r AS (SELECT user_id, value, " +
        "CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) / 3) AS BIGINT) AS wid " +
        "FROM events) " +
        "SELECT user_id, count(*) AS cnt, round(sum(value), 2) AS sv FROM r " +
        "GROUP BY user_id, wid HAVING count(*) = 3"),

    gq("q_analytic_where",
      // analytic call inside WHERE: extracted, evaluated per event, THEN
      // filtered (reference: rsql/ast.go:314-320, stream/stream.go:657-671)
      "SELECT user_id, event_id, value FROM events " +
        "WHERE had_changed(true, event_type) OVER (PARTITION BY user_id) " +
        "AND value > 10 WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "SELECT user_id, event_id, value FROM (" +
        "SELECT user_id, event_id, value, " +
        "CASE WHEN row_number() OVER w = 1 THEN true " +
        "ELSE event_type IS DISTINCT FROM lag(event_type) OVER w END AS h " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
        "WHERE h AND value > 10"),

    gq("q_changed_col",
      // CDC changed_col: value when changed vs previous event, else NULL;
      // first event counts as a change (functions_analytical.go:58-76)
      "SELECT user_id, event_id, changed_col(true, event_type) " +
        "OVER (PARTITION BY user_id) AS chg FROM events " +
        "WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      // outer filter: the reference SUPPRESSES rows where no changed_col
      // fired (omit-empty, stream/stream.go:551-567) — ours does too
      "SELECT * FROM (SELECT user_id, event_id, CASE WHEN row_number() OVER w = 1 " +
        "OR event_type IS DISTINCT FROM lag(event_type) OVER w " +
        "THEN event_type END AS chg FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) WHERE chg IS NOT NULL"),

    gq("q_changed_cols",
      // changed_cols fan-out: one prefix-named changed_col per argument
      // column; a row where EVERY fan-out output is empty is suppressed
      // (reference: stream/analytic.go:236-289 + stream/stream.go:551-567)
      "SELECT user_id, event_id, changed_cols('c_', true, event_type, props) " +
        "OVER (PARTITION BY user_id) FROM events " +
        "WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "SELECT user_id, event_id, c_event_type, c_props FROM (" +
        "SELECT user_id, event_id, " +
        "CASE WHEN row_number() OVER w = 1 " +
        "OR event_type IS DISTINCT FROM lag(event_type) OVER w " +
        "THEN event_type END AS c_event_type, " +
        "CASE WHEN row_number() OVER w = 1 " +
        "OR props IS DISTINCT FROM lag(props) OVER w " +
        "THEN props END AS c_props FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
        "WHERE c_event_type IS NOT NULL OR c_props IS NOT NULL"),

    gq("q_window_analytic_combo",
      // analytic across successive windows, auto-partitioned by group key
      // (reference: rsql/ast.go:142-205)
      "SELECT user_id, round(avg(value), 4) AS av, " +
        "round(acc_sum(avg(value)), 4) AS running FROM events " +
        "GROUP BY user_id, CountingWindow(10) WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "WITH r AS (SELECT user_id, value, ts, event_id, " +
        "CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) / 10) AS BIGINT) AS wid " +
        "FROM events), a AS (SELECT user_id, wid, round(avg(value), 4) AS av, avg(value) AS av_raw " +
        "FROM r GROUP BY user_id, wid HAVING count(*) = 10) " +
        "SELECT user_id, av, round(sum(av_raw) OVER (PARTITION BY user_id ORDER BY wid " +
        "ROWS UNBOUNDED PRECEDING), 4) AS running FROM a"),

    // --- §2.10 CEP MATCH_RECOGNIZE ----------------------------------------
    gq("q_cep_pattern",
      // 3 consecutive high-value events per user (PATTERN A{3}, skip past
      // last row); t0 emitted as epoch-ms via timestamp arithmetic
      "SELECT * FROM events MATCH_RECOGNIZE ( PARTITION BY user_id ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, LAST(A.value) AS lastv, FIRST(A.ts) - 0 AS t0 " +
        "ONE ROW PER MATCH PATTERN (A{3}) WITHIN '60d' DEFINE A AS value > 50 )",
      """
        WITH s AS (SELECT user_id, ts, value, row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn FROM events),
        q AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY ts) AS grp FROM s WHERE value > 50),
        i AS (SELECT *, row_number() OVER (PARTITION BY user_id, grp ORDER BY ts) - 1 AS idx FROM q),
        t AS (SELECT user_id, grp, CAST(floor(idx / 3) AS BIGINT) AS trip,
              count(*) AS cnt, arg_max(value, idx) AS lastv, epoch_ms(min(ts)) AS t0
              FROM i GROUP BY user_id, grp, floor(idx / 3) HAVING count(*) = 3)
        SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY t0) AS mn, lastv, t0 FROM t""".stripMargin.trim),

    gq("q_cep_skip_next",
      // AFTER MATCH SKIP TO NEXT ROW → overlapping matches: every position
      // in a >50-run that still has 2 successors starts a match
      "SELECT * FROM events MATCH_RECOGNIZE ( PARTITION BY user_id ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, FIRST(A.ts) - 0 AS t0, LAST(A.value) AS lastv " +
        "ONE ROW PER MATCH AFTER MATCH SKIP TO NEXT ROW PATTERN (A{3}) WITHIN '60d' " +
        "DEFINE A AS value > 50 )",
      """
        WITH s AS (SELECT user_id, ts, value, row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn FROM events),
        q AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY ts) AS grp FROM s WHERE value > 50),
        i AS (SELECT *, row_number() OVER (PARTITION BY user_id, grp ORDER BY ts) - 1 AS idx,
               count(*) OVER (PARTITION BY user_id, grp) AS glen FROM q),
        m AS (SELECT a.user_id AS user_id, epoch_ms(a.ts) AS t0, c.value AS lastv
              FROM i a JOIN i c ON a.user_id = c.user_id AND a.grp = c.grp AND c.idx = a.idx + 2
              WHERE a.idx <= a.glen - 3)
        SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY t0) AS mn, t0, lastv FROM m""".stripMargin.trim),

    gq("q_cep_all_rows",
      // ALL ROWS PER MATCH emits every matched row with its measures
      "SELECT user_id, value, mn, cls FROM events MATCH_RECOGNIZE ( " +
        "PARTITION BY user_id ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, CLASSIFIER() AS cls ALL ROWS PER MATCH " +
        "PATTERN (A{3}) WITHIN '60d' DEFINE A AS value > 50 )",
      """
        WITH s AS (SELECT user_id, ts, value, row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn FROM events),
        q AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY ts) AS grp FROM s WHERE value > 50),
        i AS (SELECT *, row_number() OVER (PARTITION BY user_id, grp ORDER BY ts) - 1 AS idx FROM q),
        t AS (SELECT user_id, grp, CAST(floor(idx / 3) AS BIGINT) AS trip, min(ts) AS t0
              FROM i GROUP BY user_id, grp, floor(idx / 3) HAVING count(*) = 3),
        n AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY t0) AS mn FROM t)
        SELECT i.user_id AS user_id, i.value AS value, n.mn AS mn, 'A' AS cls
        FROM i JOIN n ON i.user_id = n.user_id AND i.grp = n.grp
          AND CAST(floor(i.idx / 3) AS BIGINT) = n.trip""".stripMargin.trim),

    gq("q_cep_two_sym",
      // two-symbol sequence A B (value spike then drop); conditions are
      // disjoint so SKIP PAST LAST ROW equals the all-adjacent-pairs set
      "SELECT * FROM events MATCH_RECOGNIZE ( PARTITION BY user_id ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, FIRST(A.ts) - 0 AS t0, " +
        "LAST(A.value) AS av, LAST(B.value) AS bv " +
        "ONE ROW PER MATCH PATTERN (A B) WITHIN '60d' " +
        "DEFINE A AS value > 80, B AS value < 20 )",
      """
        WITH s AS (SELECT user_id, ts, value, lead(value) OVER (PARTITION BY user_id ORDER BY ts) AS nv FROM events),
        m AS (SELECT user_id, epoch_ms(ts) AS t0, value AS av, nv AS bv FROM s WHERE value > 80 AND nv < 20)
        SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY t0) AS mn, t0, av, bv FROM m""".stripMargin.trim),

    gq("q_cep_alternation",
      // alternation A | B with greedy preference A-first; conditions are
      // disjoint so CLASSIFIER() is a pure CASE (cep/pattern.go alternation)
      "SELECT user_id, value, cls FROM events MATCH_RECOGNIZE ( " +
        "PARTITION BY user_id ORDER BY ts " +
        "MEASURES CLASSIFIER() AS cls ALL ROWS PER MATCH " +
        "PATTERN (A | B) WITHIN '60d' DEFINE A AS value > 90, B AS value < 5 )",
      "SELECT user_id, value, CASE WHEN value > 90 THEN 'A' ELSE 'B' END AS cls " +
        "FROM events WHERE value > 90 OR value < 5"),

    gq("q_cep_plus",
      // greedy A+ consumes each maximal >50 run whole; measures aggregate
      // over the pattern variable (cep/eval.go:131-137 SUM/AVG/COUNT/...)
      "SELECT * FROM events MATCH_RECOGNIZE ( PARTITION BY user_id ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, count(A.value) AS n, " +
        "FIRST(A.ts) - 0 AS t0, round(avg(A.value), 4) AS av " +
        "ONE ROW PER MATCH PATTERN (A+) WITHIN '60d' DEFINE A AS value > 50 )",
      """
        WITH s AS (SELECT user_id, ts, value, row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn FROM events),
        q AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY ts) AS grp FROM s WHERE value > 50),
        t AS (SELECT user_id, count(*) AS n, epoch_ms(min(ts)) AS t0, round(avg(value), 4) AS av
              FROM q GROUP BY user_id, grp)
        SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY t0) AS mn, n, t0, av FROM t""".stripMargin.trim),

    gq("q_cep_permute",
      // PERMUTE(A, B) = A B | B A (cep/pattern.go:134-166); SKIP TO NEXT ROW
      // emits every adjacent pair in either order (disjoint conditions)
      "SELECT * FROM events MATCH_RECOGNIZE ( PARTITION BY user_id ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, LAST(A.value) AS av, LAST(B.value) AS bv " +
        "ONE ROW PER MATCH AFTER MATCH SKIP TO NEXT ROW " +
        "PATTERN (PERMUTE(A, B)) WITHIN '60d' " +
        "DEFINE A AS value > 80, B AS value < 20 )",
      """
        WITH s AS (SELECT user_id, ts, value, lead(value) OVER (PARTITION BY user_id ORDER BY ts) AS nv FROM events),
        m AS (SELECT user_id, ts,
                CASE WHEN value > 80 THEN value ELSE nv END AS av,
                CASE WHEN value > 80 THEN nv ELSE value END AS bv
              FROM s WHERE (value > 80 AND nv < 20) OR (value < 20 AND nv > 80))
        SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY ts) AS mn, av, bv FROM m""".stripMargin.trim),

    gq("q_cep_running_measures",
      // RUNNING aggregate semantics under ALL ROWS PER MATCH: each output
      // row sees the prefix of its match (cep/eval.go RUNNING vs FINAL)
      "SELECT user_id, value, mn, rcnt, fcnt FROM events MATCH_RECOGNIZE ( " +
        "PARTITION BY user_id ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, RUNNING count(A.value) AS rcnt, " +
        "FINAL count(A.value) AS fcnt ALL ROWS PER MATCH " +
        "PATTERN (A{3}) WITHIN '60d' DEFINE A AS value > 50 )",
      """
        WITH s AS (SELECT user_id, ts, value, row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn FROM events),
        q AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY ts) AS grp FROM s WHERE value > 50),
        i AS (SELECT *, row_number() OVER (PARTITION BY user_id, grp ORDER BY ts) - 1 AS idx FROM q),
        t AS (SELECT user_id, grp, CAST(floor(idx / 3) AS BIGINT) AS trip, min(ts) AS t0
              FROM i GROUP BY user_id, grp, floor(idx / 3) HAVING count(*) = 3),
        n AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY t0) AS mn FROM t)
        SELECT i.user_id AS user_id, i.value AS value, n.mn AS mn,
               i.idx - n.trip * 3 + 1 AS rcnt, CAST(3 AS BIGINT) AS fcnt
        FROM i JOIN n ON i.user_id = n.user_id AND i.grp = n.grp
          AND CAST(floor(i.idx / 3) AS BIGINT) = n.trip""".stripMargin.trim),

    gq("q_cep_quant_range",
      // bounded quantifier A{2,3}, greedy: each match takes 3 when 3+ rows
      // remain in the run, else 2; a trailing single row stays unmatched
      // (cep/engine.go:33-35 greedy-longest)
      "SELECT * FROM events MATCH_RECOGNIZE ( PARTITION BY user_id ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, count(A.value) AS n, FIRST(A.ts) - 0 AS t0 " +
        "ONE ROW PER MATCH PATTERN (A{2,3}) WITHIN '60d' DEFINE A AS value > 50 )",
      """
        WITH s AS (SELECT user_id, ts, value, row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn FROM events),
        q AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY ts) AS grp FROM s WHERE value > 50),
        i AS (SELECT *, row_number() OVER (PARTITION BY user_id, grp ORDER BY ts) - 1 AS idx FROM q),
        isl AS (SELECT user_id, grp, count(*) AS len FROM i GROUP BY user_id, grp),
        -- greedy chunks: floor(len/3) threes, then a final two if len%3=2
        mt AS (
          SELECT user_id, grp, CAST(3 AS BIGINT) AS n, CAST(j.j * 3 AS BIGINT) AS sidx
          FROM isl CROSS JOIN LATERAL (SELECT unnest(range(0, (len // 3)::INTEGER)) AS j) j
          UNION ALL
          SELECT user_id, grp, CAST(2 AS BIGINT) AS n, CAST((len // 3) * 3 AS BIGINT) AS sidx
          FROM isl WHERE len % 3 = 2),
        r AS (SELECT m.user_id AS user_id, m.n, epoch_ms(i.ts) AS t0
              FROM mt m JOIN i ON i.user_id = m.user_id AND i.grp = m.grp AND i.idx = m.sidx)
        SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY t0) AS mn, n, t0 FROM r""".stripMargin.trim),

    gq("q_cep_reluctant",
      // reluctant A{2,3}? takes the SHORTEST (2) every time — runs chunk
      // into pairs, trailing singles unmatched (cep/engine.go:33-35)
      "SELECT * FROM events MATCH_RECOGNIZE ( PARTITION BY user_id ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, count(A.value) AS n, FIRST(A.ts) - 0 AS t0 " +
        "ONE ROW PER MATCH PATTERN (A{2,3}?) WITHIN '60d' DEFINE A AS value > 50 )",
      """
        WITH s AS (SELECT user_id, ts, value, row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn FROM events),
        q AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY ts) AS grp FROM s WHERE value > 50),
        i AS (SELECT *, row_number() OVER (PARTITION BY user_id, grp ORDER BY ts) - 1 AS idx FROM q),
        isl AS (SELECT user_id, grp, count(*) AS len FROM i GROUP BY user_id, grp),
        mt AS (SELECT user_id, grp, CAST(2 AS BIGINT) AS n, CAST(j.j * 2 AS BIGINT) AS sidx
               FROM isl CROSS JOIN LATERAL (SELECT unnest(range(0, (len // 2)::INTEGER)) AS j) j),
        r AS (SELECT m.user_id AS user_id, m.n, epoch_ms(i.ts) AS t0
              FROM mt m JOIN i ON i.user_id = m.user_id AND i.grp = m.grp AND i.idx = m.sidx)
        SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY t0) AS mn, n, t0 FROM r""".stripMargin.trim),

    gq("q_cep_prev_define",
      // PREV() navigation inside DEFINE (cep/eval.go:155-248 placeholder
      // rewriting): B matches only when its value dropped vs the previous
      // row; SKIP TO NEXT ROW makes matches start-independent so the
      // all-adjacent-pairs oracle applies
      "SELECT * FROM events MATCH_RECOGNIZE ( PARTITION BY user_id ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, FIRST(A.ts) - 0 AS t0, " +
        "LAST(A.value) AS av, LAST(B.value) AS bv " +
        "ONE ROW PER MATCH AFTER MATCH SKIP TO NEXT ROW PATTERN (A B) WITHIN '60d' " +
        "DEFINE A AS value > 80, B AS value < PREV(value) )",
      """
        WITH s AS (SELECT user_id, ts, value, lead(value) OVER (PARTITION BY user_id ORDER BY ts) AS nv FROM events),
        m AS (SELECT user_id, epoch_ms(ts) AS t0, value AS av, nv AS bv FROM s WHERE value > 80 AND nv < value)
        SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY t0) AS mn, t0, av, bv FROM m""".stripMargin.trim),

    gq("q_cep_subset",
      // SUBSET U = (A, B): measures aggregate over the union of symbols
      // (types/match_recognize.go:86-90, cep/eval.go subsets)
      "SELECT * FROM events MATCH_RECOGNIZE ( PARTITION BY user_id ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, FIRST(A.ts) - 0 AS t0, " +
        "round(avg(U.value), 4) AS uavg, count(U.value) AS un " +
        "ONE ROW PER MATCH PATTERN (A B) SUBSET U = (A, B) WITHIN '60d' " +
        "DEFINE A AS value > 80, B AS value < 20 )",
      """
        WITH s AS (SELECT user_id, ts, value, lead(value) OVER (PARTITION BY user_id ORDER BY ts) AS nv FROM events),
        m AS (SELECT user_id, epoch_ms(ts) AS t0, round((value + nv) / 2, 4) AS uavg, CAST(2 AS BIGINT) AS un
              FROM s WHERE value > 80 AND nv < 20)
        SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY t0) AS mn, t0, uavg, un FROM m""".stripMargin.trim),

    // --- LLM-pipeline operators: text analysis ----------------------------
    gq("q_doc_stats",
      "SELECT lang, source, count(*) AS cnt, round(avg(n_chars), 4) AS avg_chars, " +
        "max(n_chars) AS mx FROM documents GROUP BY lang, source",
      "SELECT lang, source, count(*) AS cnt, round(avg(n_chars), 4) AS avg_chars, " +
        "max(n_chars) AS mx FROM documents GROUP BY lang, source"),

    gq("q_text_sql_funcs",
      // the text-curation kernels exposed as dialect scalars: a filter rule
      // in dialect SQL (lang/quality gates + redaction) — the SQL-first way
      // to run the curation filters
      "SELECT doc_id, lang_id(text) AS lang_pred, token_count(text) AS tc, " +
        "token_count_bpe(text) AS bpe, quality_score(text) AS q, " +
        "redact_pii(concat(text, ' id 123-45-6789 ip 10.2.3.9')) AS clean " +
        "FROM documents WHERE quality_score(text) >= 0.5",
      """
        WITH b AS (
          SELECT doc_id, text,
            CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS INTEGER) AS tc0,
            length(text) AS n,
            length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS npunct,
            length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS nalpha,
            ' ' || lower(text) || ' ' AS padded
          FROM documents
        ), h AS (
          SELECT *,
            len(regexp_extract_all(padded, ' (the|and|is|of|to|that|with) ')) AS en,
            len(regexp_extract_all(padded, ' (der|die|das|und|ist|nicht|mit) ')) AS de,
            len(regexp_extract_all(padded, ' (le|la|les|et|est|dans|pour) ')) AS fr,
            len(regexp_extract_all(padded, ' (el|los|las|es|en|que|por) ')) AS es,
            length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS zh,
            length(regexp_replace(text, '[^\x{0400}-\x{04ff}]', '', 'g')) AS ru,
            length(regexp_replace(text, '[^\x{0600}-\x{06ff}]', '', 'g')) AS ar,
            length(regexp_replace(text, '[^\x{ac00}-\x{d7af}]', '', 'g')) AS ko,
            length(regexp_replace(text, '[^\x{3040}-\x{30ff}]', '', 'g')) AS ja,
            length(regexp_replace(text, '[^\x{0900}-\x{097f}]', '', 'g')) AS hi,
            round((CASE WHEN n BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.3 END) * 0.4 +
                  (CASE WHEN (CASE WHEN n = 0 THEN 0 ELSE npunct::DOUBLE / n END) < 0.2 THEN 1.0 ELSE 0.4 END) * 0.3 +
                  (CASE WHEN (CASE WHEN n = 0 THEN 0 ELSE nalpha::DOUBLE / n END) > 0.5 THEN 1.0 ELSE 0.5 END) * 0.3, 4) AS qs
          FROM b
        )
        SELECT doc_id,
          CASE WHEN greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) = 0 THEN 'und'
               WHEN ja = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ja'
               WHEN zh = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'zh'
               WHEN ru = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ru'
               WHEN ar = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ar'
               WHEN ko = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ko'
               WHEN hi = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'hi'
               WHEN en = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'en'
               WHEN de = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'de'
               WHEN fr = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'fr'
               ELSE 'es' END AS lang_pred,
          tc0 AS tc,
          CAST(len(string_split_regex(trim(text), '\s+')) +
            floor(length(regexp_replace(text, '\s+', '', 'g')) / 4) AS BIGINT) AS bpe,
          qs AS q,
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(concat(text, ' id 123-45-6789 ip 10.2.3.9'),
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<ID>', 'g'),
              '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
            '\+?[0-9][0-9()./ -]{6,}[0-9]', '<PHONE>', 'g') AS clean
        FROM h WHERE qs >= 0.5""".stripMargin.trim),

    Q("q_text_analysis",
      (s, dir) => {
        val t = Tables.load(s, dir)
        operators.TextOps.analyze(t("documents"))
          .select("doc_id", "token_count", "punct_ratio", "alpha_ratio",
            "mean_word_len", "stopword_ratio", "quality", "lang_pred")
      },
      Some("""
        WITH b AS (
          SELECT doc_id, text,
            CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS token_count,
            length(text) AS n,
            length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS npunct,
            length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS nalpha,
            length(regexp_replace(text, '\s+', '', 'g')) AS nws,
            len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|it)\b')) AS nstop,
            ' ' || lower(text) || ' ' AS padded
          FROM documents
        ), h AS (
          SELECT *,
            len(regexp_extract_all(padded, ' (the|and|is|of|to|that|with) ')) AS en,
            len(regexp_extract_all(padded, ' (der|die|das|und|ist|nicht|mit) ')) AS de,
            len(regexp_extract_all(padded, ' (le|la|les|et|est|dans|pour) ')) AS fr,
            len(regexp_extract_all(padded, ' (el|los|las|es|en|que|por) ')) AS es,
            length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS zh,
            length(regexp_replace(text, '[^\x{0400}-\x{04ff}]', '', 'g')) AS ru,
            length(regexp_replace(text, '[^\x{0600}-\x{06ff}]', '', 'g')) AS ar,
            length(regexp_replace(text, '[^\x{ac00}-\x{d7af}]', '', 'g')) AS ko,
            length(regexp_replace(text, '[^\x{3040}-\x{30ff}]', '', 'g')) AS ja,
            length(regexp_replace(text, '[^\x{0900}-\x{097f}]', '', 'g')) AS hi
          FROM b
        )
        SELECT doc_id, token_count,
          round(CASE WHEN n = 0 THEN 0 ELSE npunct::DOUBLE / n END, 6) AS punct_ratio,
          round(CASE WHEN n = 0 THEN 0 ELSE nalpha::DOUBLE / n END, 6) AS alpha_ratio,
          round(CASE WHEN token_count = 0 THEN 0 ELSE nws::DOUBLE / token_count END, 6) AS mean_word_len,
          round(CASE WHEN token_count = 0 THEN 0 ELSE nstop::DOUBLE / token_count END, 6) AS stopword_ratio,
          round((CASE WHEN n BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.3 END) * 0.4 +
                (CASE WHEN (CASE WHEN n = 0 THEN 0 ELSE npunct::DOUBLE / n END) < 0.2 THEN 1.0 ELSE 0.4 END) * 0.3 +
                (CASE WHEN (CASE WHEN n = 0 THEN 0 ELSE nalpha::DOUBLE / n END) > 0.5 THEN 1.0 ELSE 0.5 END) * 0.3, 4) AS quality,
          CASE WHEN greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) = 0 THEN 'und'
               WHEN ja = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ja'
               WHEN zh = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'zh'
               WHEN ru = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ru'
               WHEN ar = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ar'
               WHEN ko = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ko'
               WHEN hi = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'hi'
               WHEN en = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'en'
               WHEN de = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'de'
               WHEN fr = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'fr'
               ELSE 'es' END AS lang_pred
        FROM h""".stripMargin.trim)),

    Q("q_curation_report",
      // per-language corpus audit: doc counts, mean quality, token
      // percentiles — the before/after table of every curation run
      (s, dir) => operators.TextOps.curationReport(
        Tables.load(s, dir)("documents")),
      Some("""
        WITH b AS (
          SELECT doc_id, text,
            CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS token_count,
            length(text) AS n,
            length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS npunct,
            length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS nalpha,
            ' ' || lower(text) || ' ' AS padded
          FROM documents
        ), h AS (
          SELECT *,
            len(regexp_extract_all(padded, ' (the|and|is|of|to|that|with) ')) AS en,
            len(regexp_extract_all(padded, ' (der|die|das|und|ist|nicht|mit) ')) AS de,
            len(regexp_extract_all(padded, ' (le|la|les|et|est|dans|pour) ')) AS fr,
            len(regexp_extract_all(padded, ' (el|los|las|es|en|que|por) ')) AS es,
            length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS zh,
            length(regexp_replace(text, '[^\x{0400}-\x{04ff}]', '', 'g')) AS ru,
            length(regexp_replace(text, '[^\x{0600}-\x{06ff}]', '', 'g')) AS ar,
            length(regexp_replace(text, '[^\x{ac00}-\x{d7af}]', '', 'g')) AS ko,
            length(regexp_replace(text, '[^\x{3040}-\x{30ff}]', '', 'g')) AS ja,
            length(regexp_replace(text, '[^\x{0900}-\x{097f}]', '', 'g')) AS hi
          FROM b
        ), a AS (
          SELECT token_count,
            round((CASE WHEN n BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.3 END) * 0.4 +
                  (CASE WHEN (CASE WHEN n = 0 THEN 0 ELSE npunct::DOUBLE / n END) < 0.2 THEN 1.0 ELSE 0.4 END) * 0.3 +
                  (CASE WHEN (CASE WHEN n = 0 THEN 0 ELSE nalpha::DOUBLE / n END) > 0.5 THEN 1.0 ELSE 0.5 END) * 0.3, 4) AS quality,
            CASE WHEN greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) = 0 THEN 'und'
                 WHEN ja = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ja'
                 WHEN zh = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'zh'
                 WHEN ru = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ru'
                 WHEN ar = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ar'
                 WHEN ko = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ko'
                 WHEN hi = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'hi'
                 WHEN en = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'en'
                 WHEN de = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'de'
                 WHEN fr = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'fr'
                 ELSE 'es' END AS lang_pred
          FROM h
        )
        SELECT lang_pred, count(*) AS n_docs, round(avg(quality), 6) AS avg_quality,
          round(median(token_count), 4) AS med_tokens,
          round(quantile_cont(token_count, 0.9), 4) AS p90_tokens,
          CAST(sum(token_count) AS BIGINT) AS total_tokens
        FROM a GROUP BY lang_pred""".stripMargin.trim)),

    Q("q_curate",
      // full curation pipeline in one call: quality/lang/token filters →
      // minhash near-dup pairs on the filtered set → canonical keep
      (s, dir) => operators.Curation.curate(Tables.load(s, dir)("documents"))
        .select("doc_id", "lang_pred", "quality", "token_count"),
      Some("""
        WITH RECURSIVE b AS (
          SELECT doc_id, text,
            CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS token_count,
            length(text) AS n,
            length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS npunct,
            length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS nalpha,
            ' ' || lower(text) || ' ' AS padded
          FROM documents
        ), h AS (
          SELECT *,
            len(regexp_extract_all(padded, ' (the|and|is|of|to|that|with) ')) AS en,
            len(regexp_extract_all(padded, ' (der|die|das|und|ist|nicht|mit) ')) AS de,
            len(regexp_extract_all(padded, ' (le|la|les|et|est|dans|pour) ')) AS fr,
            len(regexp_extract_all(padded, ' (el|los|las|es|en|que|por) ')) AS es,
            length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS zh,
            length(regexp_replace(text, '[^\x{0400}-\x{04ff}]', '', 'g')) AS ru,
            length(regexp_replace(text, '[^\x{0600}-\x{06ff}]', '', 'g')) AS ar,
            length(regexp_replace(text, '[^\x{ac00}-\x{d7af}]', '', 'g')) AS ko,
            length(regexp_replace(text, '[^\x{3040}-\x{30ff}]', '', 'g')) AS ja,
            length(regexp_replace(text, '[^\x{0900}-\x{097f}]', '', 'g')) AS hi
          FROM b
        ), a AS (
          SELECT doc_id, text, token_count,
            round((CASE WHEN n BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.3 END) * 0.4 +
                  (CASE WHEN (CASE WHEN n = 0 THEN 0 ELSE npunct::DOUBLE / n END) < 0.2 THEN 1.0 ELSE 0.4 END) * 0.3 +
                  (CASE WHEN (CASE WHEN n = 0 THEN 0 ELSE nalpha::DOUBLE / n END) > 0.5 THEN 1.0 ELSE 0.5 END) * 0.3, 4) AS quality,
            CASE WHEN greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) = 0 THEN 'und'
                 WHEN ja = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ja'
                 WHEN zh = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'zh'
                 WHEN ru = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ru'
                 WHEN ar = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ar'
                 WHEN ko = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ko'
                 WHEN hi = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'hi'
                 WHEN en = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'en'
                 WHEN de = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'de'
                 WHEN fr = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'fr'
                 ELSE 'es' END AS lang_pred
          FROM h
        ), f AS (
          SELECT * FROM a WHERE lang_pred = 'en' AND quality >= 0.7
            AND token_count BETWEEN 5 AND 100000
        ), n2 AS (
          SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w FROM f
        ), sh AS (
          SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) END AS sh FROM n2
        ), p AS (
          SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM sh x JOIN sh y ON x.doc_id < y.doc_id
          WHERE len(list_intersect(x.sh, y.sh))::DOUBLE / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.7
        ), e AS (
          SELECT doc_a AS src, doc_b AS dst FROM p UNION SELECT doc_b, doc_a FROM p
        ), reach(src, dst) AS (
          SELECT src, dst FROM e
          UNION
          SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src WHERE e2.dst <> r.src
        )
        SELECT f.doc_id, f.lang_pred, f.quality, f.token_count FROM f
        WHERE f.doc_id NOT IN (
          SELECT src FROM (SELECT src, least(src, min(dst)) AS comp FROM reach GROUP BY src)
          WHERE src <> comp)""".stripMargin.trim)),

    Q("q_gate_report",
      // curation-funnel audit: independent per-gate pass counts (language
      // / quality / token bounds) plus the conjunction, one analyze scan
      // + one single-row agg unpivoted; the oracle replays the analyze
      // kernels (same CTE as q_curate) and aggregates independently
      (s, dir) => operators.Curation.gateReport(
        Tables.load(s, dir)("documents")),
      Some("""
        WITH b AS (
          SELECT doc_id, text,
            CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS token_count,
            length(text) AS n,
            length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS npunct,
            length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS nalpha,
            ' ' || lower(text) || ' ' AS padded
          FROM documents
        ), h AS (
          SELECT *,
            len(regexp_extract_all(padded, ' (the|and|is|of|to|that|with) ')) AS en,
            len(regexp_extract_all(padded, ' (der|die|das|und|ist|nicht|mit) ')) AS de,
            len(regexp_extract_all(padded, ' (le|la|les|et|est|dans|pour) ')) AS fr,
            len(regexp_extract_all(padded, ' (el|los|las|es|en|que|por) ')) AS es,
            length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS zh,
            length(regexp_replace(text, '[^\x{0400}-\x{04ff}]', '', 'g')) AS ru,
            length(regexp_replace(text, '[^\x{0600}-\x{06ff}]', '', 'g')) AS ar,
            length(regexp_replace(text, '[^\x{ac00}-\x{d7af}]', '', 'g')) AS ko,
            length(regexp_replace(text, '[^\x{3040}-\x{30ff}]', '', 'g')) AS ja,
            length(regexp_replace(text, '[^\x{0900}-\x{097f}]', '', 'g')) AS hi
          FROM b
        ), a AS (
          SELECT doc_id, token_count,
            round((CASE WHEN n BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.3 END) * 0.4 +
                  (CASE WHEN (CASE WHEN n = 0 THEN 0 ELSE npunct::DOUBLE / n END) < 0.2 THEN 1.0 ELSE 0.4 END) * 0.3 +
                  (CASE WHEN (CASE WHEN n = 0 THEN 0 ELSE nalpha::DOUBLE / n END) > 0.5 THEN 1.0 ELSE 0.5 END) * 0.3, 4) AS quality,
            CASE WHEN greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) = 0 THEN 'und'
                 WHEN ja = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ja'
                 WHEN zh = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'zh'
                 WHEN ru = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ru'
                 WHEN ar = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ar'
                 WHEN ko = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ko'
                 WHEN hi = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'hi'
                 WHEN en = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'en'
                 WHEN de = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'de'
                 WHEN fr = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'fr'
                 ELSE 'es' END AS lang_pred
          FROM h
        ), g AS (
          SELECT count(*) AS total,
            sum(CASE WHEN lang_pred = 'en' THEN 1 ELSE 0 END) AS lang_p,
            sum(CASE WHEN quality >= 0.7 THEN 1 ELSE 0 END) AS q_p,
            sum(CASE WHEN token_count BETWEEN 5 AND 100000 THEN 1 ELSE 0 END) AS t_p,
            sum(CASE WHEN lang_pred = 'en' AND quality >= 0.7
                      AND token_count BETWEEN 5 AND 100000 THEN 1 ELSE 0 END) AS all_p
          FROM a)
        SELECT 'total' AS gate, CAST(total AS BIGINT) AS pass_docs,
          round(1.0, 6) AS pass_frac FROM g
        UNION ALL SELECT 'language', CAST(lang_p AS BIGINT), round(lang_p::DOUBLE / total, 6) FROM g
        UNION ALL SELECT 'quality', CAST(q_p AS BIGINT), round(q_p::DOUBLE / total, 6) FROM g
        UNION ALL SELECT 'tokens', CAST(t_p AS BIGINT), round(t_p::DOUBLE / total, 6) FROM g
        UNION ALL SELECT 'all', CAST(all_p AS BIGINT), round(all_p::DOUBLE / total, 6) FROM g""".stripMargin.trim)),

    // --- LLM-pipeline operators: deterministic sampling -------------------
    // (membership depends only on the row's key hash — reproducible across
    // reshards, exactly replayable by the DuckDB oracle via md5)
    Q("q_sample_hash",
      (s, dir) => operators.Sampling.byHash(
          Tables.load(s, dir)("documents"), org.apache.spark.sql.functions.col("doc_id"), 0.3)
        .select("doc_id", "lang", "source"),
      Some("SELECT doc_id, lang, source FROM documents " +
        "WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000 < 3000")),

    gq("q_sample_sql",
      // the same deterministic sample from dialect SQL (sample_hash fn)
      "SELECT doc_id, lang FROM documents WHERE sample_hash(doc_id, 0.25)",
      "SELECT doc_id, lang FROM documents " +
        "WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000 < 2500"),

    Q("q_sample_stratified",
      (s, dir) => operators.Sampling.stratified(
          Tables.load(s, dir)("documents"), org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang"),
          Map("en" -> 0.5, "zh" -> 1.0, "de" -> 0.25))
        .select("doc_id", "lang"),
      Some("SELECT doc_id, lang FROM documents " +
        "WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000 < " +
        "CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 10000 WHEN 'de' THEN 2500 ELSE 0 END")),

    Q("q_sample_split",
      (s, dir) => operators.Sampling.split(
          Tables.load(s, dir)("documents"), org.apache.spark.sql.functions.col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt")),
      Some("SELECT CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' " +
        "ELSE 'test' END AS split, count(*) AS cnt FROM (SELECT " +
        "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000 AS b " +
        "FROM documents) GROUP BY 1")),

    Q("q_sample_pergroup",
      (s, dir) => operators.Sampling.perGroup(
          Tables.load(s, dir)("documents"), org.apache.spark.sql.functions.col("source"),
          org.apache.spark.sql.functions.col("doc_id"), 10)
        .select("doc_id", "source"),
      Some("SELECT doc_id, source FROM (SELECT doc_id, source, " +
        "row_number() OVER (PARTITION BY source ORDER BY " +
        "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT, doc_id) AS rk " +
        "FROM documents) WHERE rk <= 10")),

    Q("q_sample_pergroup_agg",
      // sort-free variant: mergeable min-k-by-hash summaries + broadcast
      // semi-join must select the same rows as the ranked window (keys
      // are unique per group here), so it shares the window oracle.
      (s, dir) => operators.Sampling.perGroupAgg(
          Tables.load(s, dir)("documents"), org.apache.spark.sql.functions.col("source"),
          org.apache.spark.sql.functions.col("doc_id"), 10)
        .select("doc_id", "source"),
      Some("SELECT doc_id, source FROM (SELECT doc_id, source, " +
        "row_number() OVER (PARTITION BY source ORDER BY " +
        "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT, doc_id) AS rk " +
        "FROM documents) WHERE rk <= 10")),

    Q("q_tokens_bpe",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val d = Tables.load(s, dir)("documents")
        d.select(col("doc_id"),
          operators.TextOps.tokenCount(col("text")).as("tok_ws"),
          operators.TextOps.tokenCountBpe(col("text")).as("tok_bpe"))
      },
      Some("SELECT doc_id, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(string_split_regex(trim(text), '\\s+')) END AS INTEGER) AS tok_ws, " +
        "CAST(len(string_split_regex(trim(text), '\\s+')) + " +
        "floor(length(regexp_replace(text, '\\s+', '', 'g')) / 4) AS BIGINT) AS tok_bpe " +
        "FROM documents")),

    Q("q_unigram_encode",
      // unigram-LM (SentencePiece-family) Viterbi encoding under a
      // hand-specified model (a-z at -5, composites at known log-probs)
      // over four planted word shapes: whole-piece-wins, best-split,
      // all-chars, and an unknown-char unk fallback — the oracle is the
      // hand-computed segmentation table (the trainer is spec-pinned;
      // encode is the scan-speed 100 TB path, so IT carries the oracle)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val base = ('a' to 'z').map(c => c.toString -> -5.0)
        val m = operators.Unigram.Model(
          (base ++ Seq("data" -> -1.0, "base" -> -1.0, "database" -> -1.5,
            "na" -> -2.5, "tion" -> -2.0)).map(_._1),
          (base ++ Seq("data" -> -1.0, "base" -> -1.0, "database" -> -1.5,
            "na" -> -2.5, "tion" -> -2.0)).map(_._2))
        val mm = pmod(col("doc_id"), lit(4))
        val txt = when(mm === 0, lit("database"))
          .when(mm === 1, lit("basedata nation"))
          .when(mm === 2, lit("zebra"))
          .otherwise(lit("xq7"))
        val d = Tables.load(s, dir)("documents")
          .select(col("doc_id"), txt.as("text"))
        operators.Unigram.tokenize(d, m)
          .select(col("doc_id"),
            posexplode(col("unigram_pieces")).as(Seq("pos", "piece")))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, CASE doc_id % 4
            WHEN 0 THEN ['database']
            WHEN 1 THEN ['base', 'data', 'na', 'tion']
            WHEN 2 THEN ['z', 'e', 'b', 'r', 'a']
            ELSE ['x', 'q', '7'] END AS ps
          FROM documents)
        SELECT doc_id, CAST(unnest(range(len(ps))) AS INT) AS pos,
          unnest(ps) AS piece
        FROM t""".stripMargin.trim)),

    Q("q_collapse_repeats",
      // repeated-run collapse (n=1, keep=2): a 4-copy spam run is planted
      // on every doc; the oracle replays the keep-first-2 rule with a
      // DuckDB index lambda (kept unless both predecessors are equal —
      // equivalent to the kernel's greedy run walk at n=1)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir)("documents").select(col("doc_id"),
          operators.TextOps.collapseRepeats(
            concat(col("text"), lit(" spam spam spam spam end")),
            maxN = 1, keep = 2).as("cleaned"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
            string_split(trim(regexp_replace(lower(text || ' spam spam spam spam end'), '\s+', ' ', 'g')), ' ') AS w
          FROM documents
        )
        SELECT doc_id,
          array_to_string(list_filter(w,
            (e, i) -> i <= 2 OR NOT (e = w[i-1] AND e = w[i-2])), ' ') AS cleaned
        FROM t""".stripMargin.trim)),

    Q("q_collapse_phrases",
      // multi-word phrase-run collapse (maxN=3, keep=1) over four planted
      // shapes: bigram run, word run, word-run-inside-phrase-context, and
      // a trigram run — the oracle is the hand-computed result table
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val m = pmod(col("doc_id"), lit(4))
        val t = when(m === 0, lit("click here click here click here now"))
          .when(m === 1, lit("a a a a b"))
          .when(m === 2, lit("go go go stop go go go stop done"))
          .otherwise(lit("one two three one two three one two three end"))
        Tables.load(s, dir)("documents").select(col("doc_id"),
          operators.TextOps.collapseRepeats(t, maxN = 3, keep = 1)
            .as("cleaned"))
      },
      Some("""
        SELECT doc_id, CASE doc_id % 4
          WHEN 0 THEN 'click here now'
          WHEN 1 THEN 'a b'
          WHEN 2 THEN 'go stop done'
          ELSE 'one two three end' END AS cleaned
        FROM documents""".stripMargin.trim)),

    Q("q_repetition",
      // Gopher-style repetition signals (one-pass kernel)
      (s, dir) => operators.TextOps.repetitionMetrics(Tables.load(s, dir)("documents"))
        .select("doc_id", "dup_word_frac", "dup_bigram_frac", "dup_trigram_frac",
          "top_word_frac", "dup_line_frac"),
      Some("""
        WITH n AS (
          SELECT doc_id, text, length(trim(text)) = 0 AS empty,
            string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w,
            string_split(text, chr(10)) AS ln
          FROM documents
        ), g AS (
          SELECT doc_id, empty, w, ln, text, len(w) AS words,
            CASE WHEN len(w) >= 2 THEN [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))] ELSE [] END AS bg,
            CASE WHEN len(w) >= 3 THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] ELSE [] END AS tg
          FROM n
        )
        SELECT doc_id,
          CASE WHEN empty THEN 0 ELSE round(1 - len(list_distinct(w))::DOUBLE / words, 6) END AS dup_word_frac,
          CASE WHEN empty OR len(bg) = 0 THEN 0 ELSE round(1 - len(list_distinct(bg))::DOUBLE / len(bg), 6) END AS dup_bigram_frac,
          CASE WHEN empty OR len(tg) = 0 THEN 0 ELSE round(1 - len(list_distinct(tg))::DOUBLE / len(tg), 6) END AS dup_trigram_frac,
          CASE WHEN empty THEN 0 ELSE round(list_max(list_transform(list_distinct(w), x -> len(list_filter(w, y -> y = x))))::DOUBLE / words, 6) END AS top_word_frac,
          CASE WHEN length(text) = 0 THEN 0 ELSE round(1 - len(list_distinct(ln))::DOUBLE / len(ln), 6) END AS dup_line_frac
        FROM g""".stripMargin.trim)),

    Q("q_gopher_quality",
      // Gopher rule-set flags + keep conjunction
      (s, dir) => operators.TextOps.gopherFlags(Tables.load(s, dir)("documents"))
        .select("doc_id", "flag_word_count", "flag_mean_word_len",
          "flag_symbol_ratio", "flag_bullet_ratio", "flag_stopwords",
          "flag_repetition", "gopher_keep"),
      Some("""
        WITH n AS (
          SELECT doc_id, text, length(trim(text)) = 0 AS empty,
            CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS words,
            length(regexp_replace(text, '\s+', '', 'g')) AS nws,
            len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|it)\b')) AS nstop,
            len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')) AS nsym,
            string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
          FROM documents
        ), g AS (
          SELECT *,
            CASE WHEN len(w) >= 3 THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] ELSE [] END AS tg
          FROM n
        ), f AS (
          SELECT doc_id,
            words BETWEEN 50 AND 100000 AS flag_word_count,
            (CASE WHEN words = 0 THEN 0 ELSE nws::DOUBLE / words END) BETWEEN 3.0 AND 10.0 AS flag_mean_word_len,
            (CASE WHEN words = 0 THEN 1.0 ELSE nsym::DOUBLE / words END) < 0.1 AS flag_symbol_ratio,
            (len(list_filter(string_split(text, chr(10)), l -> regexp_matches(l, '^[-*•]')))::DOUBLE
              / len(string_split(text, chr(10)))) < 0.9 AS flag_bullet_ratio,
            nstop >= 2 AS flag_stopwords,
            (CASE WHEN empty THEN 0 ELSE 1 - len(list_distinct(w))::DOUBLE / len(w) END) < 0.9 AND
            (CASE WHEN empty OR len(tg) = 0 THEN 0 ELSE 1 - len(list_distinct(tg))::DOUBLE / len(tg) END) < 0.9 AND
            (CASE WHEN empty THEN 0 ELSE list_max(list_transform(list_distinct(w), x -> len(list_filter(w, y -> y = x))))::DOUBLE / len(w) END) < 0.3 AS flag_repetition
          FROM g
        )
        SELECT *, flag_word_count AND flag_mean_word_len AND flag_symbol_ratio
          AND flag_bullet_ratio AND flag_stopwords AND flag_repetition AS gopher_keep
        FROM f""".stripMargin.trim)),

    Q("q_redaction_report",
      // corpus PII audit over the same planted strings as q_redact:
      // per-type match totals and affected-doc counts, counted in
      // redact's sequential masking order (emails masked before phone
      // counting, so the digits inside them never double-count)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        val synth = concat(col("text"),
          lit(" reach user"), col("doc_id"), lit("@mail.example.com"),
          lit(" or +1 (555) 01"), pmod(col("doc_id"), lit(100)),
          lit(" ip 10.2."), pmod(col("doc_id"), lit(256)), lit(".9"),
          lit(" id 123-45-6789"))
        operators.TextOps.redactionReport(
          d.select(col("doc_id"), synth.as("text")))
      },
      Some("""
        WITH s AS (
          SELECT concat(text, ' reach user', doc_id::VARCHAR, '@mail.example.com',
            ' or +1 (555) 01', (doc_id % 100)::VARCHAR,
            ' ip 10.2.', (doc_id % 256)::VARCHAR, '.9',
            ' id 123-45-6789') AS t
          FROM documents
        ), m AS (
          SELECT t,
            regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
          FROM s
        ), m2 AS (
          SELECT t, t1, regexp_replace(t1, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<ID>', 'g') AS t2 FROM m
        ), m3 AS (
          SELECT t, t1, t2,
            regexp_replace(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS t3
          FROM m2
        ), c AS (
          SELECT
            len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
            len(regexp_extract_all(t1, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS s_,
            len(regexp_extract_all(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS i,
            len(regexp_extract_all(t3, '\+?[0-9][0-9()./ -]{6,}[0-9]')) AS p
          FROM m3)
        SELECT 'email' AS pii_type, CAST(sum(e) AS BIGINT) AS matches,
          CAST(sum(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs FROM c
        UNION ALL SELECT 'id', CAST(sum(s_) AS BIGINT),
          CAST(sum(CASE WHEN s_ > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM c
        UNION ALL SELECT 'ip', CAST(sum(i) AS BIGINT),
          CAST(sum(CASE WHEN i > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM c
        UNION ALL SELECT 'phone', CAST(sum(p) AS BIGINT),
          CAST(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM c""".stripMargin.trim)),

    Q("q_redact",
      // PII redaction; the synthetic corpus carries no PII, so the query
      // plants deterministic email/phone/IP/SSN strings first — both
      // engines build and redact the same bytes.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        val synth = concat(col("text"),
          lit(" reach user"), col("doc_id"), lit("@mail.example.com"),
          lit(" or +1 (555) 01"), pmod(col("doc_id"), lit(100)),
          lit(" ip 10.2."), pmod(col("doc_id"), lit(256)), lit(".9"),
          lit(" id 123-45-6789"))
        d.select(col("doc_id"), operators.TextOps.redact(synth).as("clean"))
      },
      Some("""
        WITH s AS (
          SELECT doc_id, concat(text, ' reach user', doc_id::VARCHAR, '@mail.example.com',
            ' or +1 (555) 01', (doc_id % 100)::VARCHAR,
            ' ip 10.2.', (doc_id % 256)::VARCHAR, '.9',
            ' id 123-45-6789') AS t
          FROM documents
        )
        SELECT doc_id,
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<ID>', 'g'),
              '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
            '\+?[0-9][0-9()./ -]{6,}[0-9]', '<PHONE>', 'g') AS clean
        FROM s""".stripMargin.trim)),

    Q("q_sample_quantile",
      // quantile bucketing by score (perplexity-band sampling prep):
      // exact percentile path so the oracle can replay thresholds via
      // quantile_cont (same p·(n-1) linear interpolation)
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        operators.Sampling.scoreBuckets(
          Tables.load(s, dir)("documents"), col("n_chars"),
          Seq(0.25, 0.5, 0.75), exact = true)
          .select("doc_id", "n_chars", "score_bucket")
      },
      Some("""
        WITH thr AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75]) AS q FROM documents)
        SELECT d.doc_id, d.n_chars,
          CAST(1 + len(list_filter(thr.q, t -> t < d.n_chars)) AS INTEGER) AS score_bucket
        FROM documents d CROSS JOIN thr""".stripMargin.trim)),

    Q("q_sample_mixture",
      // temperature-flattened domain mixture (tau=0.5): rates from one
      // partial-agg groupBy, broadcast back, deterministic hash keep
      (s, dir) => operators.Sampling.temperatureMixture(
          Tables.load(s, dir)("documents"), org.apache.spark.sql.functions.col("source"),
          org.apache.spark.sql.functions.col("doc_id"), tau = 0.5)
        .select("doc_id", "source", "mix_rate"),
      Some("""
        WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
        r AS (SELECT source, round(pow(cnt::DOUBLE / (SELECT min(cnt) FROM c), -0.5), 6) AS mix_rate FROM c)
        SELECT d.doc_id, d.source, r.mix_rate
        FROM documents d JOIN r ON d.source IS NOT DISTINCT FROM r.source
        WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 10000 < floor(r.mix_rate * 10000)""".stripMargin.trim)),

    Q("q_dsir_weights",
      // DSIR importance weights: hashed uni+bigram census on target
      // (lang='en' docs) and raw (all docs), add-1-smoothed bucket
      // log-ratios, per-doc gram-sum score. B=512 so bucket collisions
      // are exercised; the oracle recomputes the whole chain (census →
      // λ table → per-doc sum) with the portable md5 bucket hash
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir)("documents")
        operators.Sampling.importanceWeights(
            docs, docs.where(col("lang") === "en"), buckets = 512)
          .select(col("doc_id"), col("n_grams"),
            round(col("dsir_score"), 6).as("dsir_score"))
      },
      Some(dsirOracleCte + """
        SELECT d.doc_id, CAST(coalesce(sc.n, 0) AS INT) AS n_grams,
          round(coalesce(sc.s, 0.0), 6) AS dsir_score
        FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""".stripMargin)),

    Q("q_dsir_select",
      // the DSIR selection step: top-40 raw docs by 1e-6-quantized
      // importance weight, ties to lowest doc_id
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir)("documents")
        operators.Sampling.selectByImportance(
            docs, docs.where(col("lang") === "en"), k = 40, buckets = 512)
          .select(col("doc_id"), round(col("dsir_score"), 6).as("dsir_score"))
      },
      Some(dsirOracleCte + """
        SELECT d.doc_id, round(coalesce(sc.s, 0.0), 6) AS dsir_score
        FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
        ORDER BY round(coalesce(sc.s, 0.0), 6) DESC, d.doc_id
        LIMIT 40""".stripMargin)),

    Q("q_gumbel_topk",
      // Gumbel top-k weighted sampling without replacement: log-weight
      // ln(n_chars) + derived Gumbel noise from the portable (seed, id)
      // hash, 1e-6-quantized keys, deterministic tie order — the oracle
      // replays noise, key and ranking verbatim
      (s, dir) => {
        import org.apache.spark.sql.functions._
        operators.Sampling.gumbelTopK(
            Tables.load(s, dir)("documents"),
            log(col("n_chars").cast("double")), k = 60)
          .select("doc_id", "sample_key")
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
            round(ln(n_chars::DOUBLE) - ln(-ln(
              ((('0x' || substr(md5('42:' || doc_id::VARCHAR), 1, 15))::BIGINT
                % 1000000) + 0.5) / 1000000.0)), 6) AS sample_key
          FROM documents)
        SELECT doc_id, sample_key FROM t
        ORDER BY sample_key DESC, doc_id LIMIT 60""".stripMargin.trim)),

    Q("q_sample_budget",
      // token-budget data mix: per-group keep rates min(1, frac·budget/T_g)
      // from one groupBy, broadcast hash keep; src1 saturates (rate 1),
      // src2/src3 downsample — the oracle recomputes rates from its own
      // token totals
      (s, dir) => operators.Sampling.toTokenBudget(
          Tables.load(s, dir)("documents"),
          org.apache.spark.sql.functions.col("source"),
          org.apache.spark.sql.functions.col("doc_id"),
          Map("src1" -> 0.5, "src2" -> 0.3, "src3" -> 0.2),
          totalTokens = 4000)
        .select("doc_id", "source", "mix_rate"),
      Some("""
        WITH t AS (
          SELECT source,
            sum(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END) AS toks
          FROM documents GROUP BY source),
        r AS (
          SELECT source, round(least(1.0,
            (CASE source WHEN 'src1' THEN 0.5 WHEN 'src2' THEN 0.3
                         WHEN 'src3' THEN 0.2 ELSE 0 END * 4000) / toks), 6)
            AS mix_rate
          FROM t)
        SELECT d.doc_id, d.source, r.mix_rate
        FROM documents d JOIN r ON d.source IS NOT DISTINCT FROM r.source
        WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 10000 < floor(r.mix_rate * 10000)""".stripMargin.trim)),

    Q("q_mixture_plan",
      // data-recipe audit: per-domain avail/target/rate/planned tokens;
      // src1 hits the 2.5-epoch cap (starved), src2/src3 upsample
      // fractionally, src4 downsamples, unlisted sources plan at rate 0
      (s, dir) => operators.Sampling.mixturePlan(
        Tables.load(s, dir)("documents"),
        org.apache.spark.sql.functions.col("source"),
        Map("src1" -> 0.5, "src2" -> 0.3, "src3" -> 0.15, "src4" -> 0.05),
        totalTokens = 10000, maxEpochs = 2.5),
      Some("""
        WITH t AS (
          SELECT source AS grp, count(*) AS n_docs,
            CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS avail_tokens
          FROM documents GROUP BY source)
        SELECT grp, n_docs, avail_tokens,
          (CASE grp WHEN 'src1' THEN 0.5 WHEN 'src2' THEN 0.3
                    WHEN 'src3' THEN 0.15 WHEN 'src4' THEN 0.05 ELSE 0.0 END)::DOUBLE AS frac,
          CAST(round(frac * 10000) AS BIGINT) AS target_tokens,
          round(least(2.5::DOUBLE, frac * 10000 / avail_tokens), 6) AS rate,
          CAST(round(rate * avail_tokens) AS BIGINT) AS planned_tokens
        FROM t""".stripMargin.trim)),

    Q("q_mixture_epochs",
      // epoch-aware mixture materialization: rate-2+ domains emit full
      // epoch copies plus a deterministic hash-subset partial epoch;
      // rate<1 degrades to plain hash downsampling; the oracle replays
      // copies = floor(rate) + fractional-bucket test, fanned out by range
      (s, dir) => operators.Sampling.epochMixture(
          Tables.load(s, dir)("documents"),
          org.apache.spark.sql.functions.col("source"),
          org.apache.spark.sql.functions.col("doc_id"),
          Map("src1" -> 0.5, "src2" -> 0.3, "src3" -> 0.15, "src4" -> 0.05),
          totalTokens = 10000, maxEpochs = 2.5)
        .select("doc_id", "source", "epoch", "mix_rate"),
      Some("""
        WITH t AS (
          SELECT source,
            sum(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END) AS toks
          FROM documents GROUP BY source),
        r AS (SELECT source, round(least(2.5::DOUBLE,
            (CASE source WHEN 'src1' THEN 0.5 WHEN 'src2' THEN 0.3
                         WHEN 'src3' THEN 0.15 WHEN 'src4' THEN 0.05
                         ELSE 0.0 END)::DOUBLE * 10000 / toks), 6) AS mix_rate
          FROM t),
        c AS (SELECT d.doc_id, d.source, r.mix_rate,
            CAST(floor(r.mix_rate) AS INT) +
            CASE WHEN ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 10000
                      < floor((r.mix_rate - floor(r.mix_rate)) * 10000)
                 THEN 1 ELSE 0 END AS copies
          FROM documents d JOIN r ON d.source IS NOT DISTINCT FROM r.source)
        SELECT doc_id, source, CAST(unnest(range(0, copies)) AS INT) AS epoch, mix_rate
        FROM c WHERE copies > 0""".stripMargin.trim)),

    Q("q_robots_allowed",
      // parse → decide composed: the q_robots fixture files plus a
      // wildcard host and an own-UA-crawl-delay-only host gate a
      // frontier under two user agents — group selection over ALL
      // directives (own group beats *, even when the own group carries
      // only crawl-delay: RFC 9309 says that means allow-all, never
      // fall-through to *), longest-rule precedence,
      // allow-beats-disallow ties, empty values match nothing, RFC
      // wildcards ('*' any-run, trailing '$' end anchor) matched
      // against path+query; the oracle is the hand-computed decision
      // table
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import s.implicits._
        val files = Seq(
          ("a.com",
            "# politeness\nUser-agent: *\nDisallow: /private/\n" +
              "Allow: /private/ok.html\nCrawl-delay: 2\n\n" +
              "User-agent: fastbot\nUser-agent: speedbot\nDisallow: /\n\n" +
              "Sitemap: https://a.com/sitemap.xml"),
          ("b.com",
            "Disallow: /orphan/\nUSER-AGENT: GoodBot\n" +
              "Disallow: /tmp/\nAllow:"),
          ("c.org",
            "User-agent: *\nDisallow: /*?sessionid=\nDisallow: /*.pdf$\n" +
              "Allow: /docs/*.pdf$"),
          ("d.com",
            "User-agent: mybot\nCrawl-delay: 5\n\n" +
              "User-agent: *\nDisallow: /"),
          // RFC 9309 product-token PREFIX election: crawler 'mybot'
          // matches both the 'my' and 'mybot' groups — the LONGEST
          // prefix wins, so only /long/ is blocked; 'fastbot' matches
          // neither and falls to '*'
          ("e.com",
            "User-agent: my\nDisallow: /short/\n\n" +
              "User-agent: mybot\nDisallow: /long/\n\n" +
              "User-agent: *\nDisallow: /"),
          // own-PREFIX group carrying only crawl-delay still beats '*'
          // (allow-all): crawler 'fastbot' starts with token 'fast'
          ("f.com",
            "User-agent: fast\nCrawl-delay: 3\n\n" +
              "User-agent: *\nDisallow: /")).toDF("host", "content")
        val rules = operators.WebOps.parseRobots(files)
        val frontier = Seq(
          "http://a.com/public/page", "http://a.com/private/secret",
          "http://a.com/private/ok.html", "http://b.com/tmp/x",
          "http://c.com/anything",
          "http://c.org/page?sessionid=99", "http://c.org/file.pdf",
          "http://c.org/docs/guide.pdf", "http://c.org/file.pdf?x=1",
          "http://d.com/anything",
          "http://e.com/short/x", "http://e.com/long/x",
          "http://e.com/other", "http://f.com/page").toDF("url")
        operators.WebOps.robotsAllowed(frontier, rules, "mybot")
          .withColumn("ua", lit("mybot"))
          .unionByName(operators.WebOps
            .robotsAllowed(frontier, rules, "FastBot")
            .withColumn("ua", lit("FastBot")))
      },
      Some("""
        SELECT * FROM (VALUES
          ('http://a.com/public/page',    true,  'mybot'),
          ('http://a.com/private/secret', false, 'mybot'),
          ('http://a.com/private/ok.html', true, 'mybot'),
          ('http://b.com/tmp/x',          true,  'mybot'),
          ('http://c.com/anything',       true,  'mybot'),
          ('http://c.org/page?sessionid=99', false, 'mybot'),
          ('http://c.org/file.pdf',       false, 'mybot'),
          ('http://c.org/docs/guide.pdf', true,  'mybot'),
          ('http://c.org/file.pdf?x=1',   true,  'mybot'),
          ('http://d.com/anything',       true,  'mybot'),
          ('http://e.com/short/x',        true,  'mybot'),
          ('http://e.com/long/x',         false, 'mybot'),
          ('http://e.com/other',          true,  'mybot'),
          ('http://f.com/page',           false, 'mybot'),
          ('http://a.com/public/page',    false, 'FastBot'),
          ('http://a.com/private/secret', false, 'FastBot'),
          ('http://a.com/private/ok.html', false, 'FastBot'),
          ('http://b.com/tmp/x',          true,  'FastBot'),
          ('http://c.com/anything',       true,  'FastBot'),
          ('http://c.org/page?sessionid=99', false, 'FastBot'),
          ('http://c.org/file.pdf',       false, 'FastBot'),
          ('http://c.org/docs/guide.pdf', true,  'FastBot'),
          ('http://c.org/file.pdf?x=1',   true,  'FastBot'),
          ('http://d.com/anything',       false, 'FastBot'),
          ('http://e.com/short/x',        false, 'FastBot'),
          ('http://e.com/long/x',         false, 'FastBot'),
          ('http://e.com/other',          false, 'FastBot'),
          ('http://f.com/page',           true,  'FastBot')
        ) AS t(url, allowed, ua)""".stripMargin.trim)),

    Q("q_crawl_delay",
      // per-host politeness rate under RFC group election: own-UA group
      // beats * even when its delay is the smaller one; several elected
      // delays take the max (most conservative); non-numeric ignored; an
      // elected group with no delay yields null; hosts with no
      // applicable group are absent
      (s, dir) => {
        import s.implicits._
        val rules = Seq(
          ("a.com", "*", "crawl-delay", "2", 1),
          ("a.com", "*", "disallow", "/x", 2),
          ("b.com", "mybot", "crawl-delay", "5", 1),
          ("b.com", "*", "crawl-delay", "1", 2),
          ("c.com", "mybot", "disallow", "/y", 1), // elected, no delay
          ("c.com", "*", "crawl-delay", "9", 2),
          ("d.com", "otherbot", "crawl-delay", "4", 1), // no group for mybot
          ("e.com", "*", "crawl-delay", "fast", 1), // non-numeric → null
          ("f.com", "*", "crawl-delay", "1.5", 1),
          ("f.com", "*", "crawl-delay", "3", 2))
          .toDF("host", "user_agent", "directive", "value", "line_no")
        operators.WebOps.crawlDelay(rules, "MyBot")
      },
      Some("""
        SELECT * FROM (VALUES
          ('a.com', 2.0), ('b.com', 5.0), ('c.com', NULL),
          ('e.com', NULL), ('f.com', 3.0)
        ) AS t(host, crawl_delay)""".stripMargin.trim)),

    Q("q_frontier_schedule",
      // politeness-scheduled frontier: robots decision + elected
      // crawl-delay composed into per-host fetch slots — allowed URLs
      // rank within their host in URL order and offset by (seq-1)*delay,
      // hosts without a declared delay pace at the default, disallowed
      // and malformed URLs stay unscheduled; the oracle is the
      // hand-computed slot table
      (s, dir) => {
        import s.implicits._
        val rules = Seq(
          ("a.com", "*", "crawl-delay", "2", 1),
          ("a.com", "*", "disallow", "/private/", 2))
          .toDF("host", "user_agent", "directive", "value", "line_no")
        val frontier = Seq(
          "http://a.com/a", "http://a.com/b", "http://a.com/private/x",
          "http://a.com/z", "http://b.com/q", "http://b.com/r",
          "not a url").toDF("url")
        operators.WebOps.frontierSchedule(frontier, rules, "mybot")
      },
      Some("""
        SELECT * FROM (VALUES
          ('http://a.com/a',         true,  2.0, 1,    0.0),
          ('http://a.com/b',         true,  2.0, 2,    2.0),
          ('http://a.com/private/x', false, 2.0, NULL, NULL),
          ('http://a.com/z',         true,  2.0, 3,    4.0),
          ('http://b.com/q',         true,  1.0, 1,    0.0),
          ('http://b.com/r',         true,  1.0, 2,    1.0),
          ('not a url',              true,  1.0, NULL, NULL)
        ) AS t(url, allowed, crawl_delay, fetch_seq, fetch_offset_sec)""".stripMargin.trim)),

    Q("q_sitemap",
      // sitemaps.org parsing over adversarial literal files: a urlset
      // with entity-escaped and CDATA locs, attribute-carrying tags,
      // missing-loc, garbage-priority and non-W3C-lastmod entries, and
      // a sitemapindex;
      // the oracle is the hand-computed expected table
      (s, dir) => {
        import s.implicits._
        val files = Seq(
          ("a.com",
            "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
              "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
              " <url>\n  <loc>https://a.com/page?x=1&amp;y=2</loc>\n" +
              "  <lastmod>2026-01-05</lastmod>\n  <changefreq>Daily</changefreq>\n" +
              "  <priority>0.8</priority>\n </url>\n" +
              " <url><loc><![CDATA[https://a.com/cdata&raw]]></loc>" +
              "<priority>high</priority></url>\n" +
              " <url><lastmod>2026-01-01</lastmod></url>\n" + // no loc → drop
              " <URL><LOC> https://a.com/upper </LOC></URL>\n" +
              " <url><loc>https://a.com/badmod</loc>" +
              "<lastmod>last week</lastmod></url>\n" + // non-W3C → null
              "</urlset>"),
          ("b.com",
            "<sitemapindex>\n <sitemap>\n" +
              "  <loc>https://b.com/sitemap-1.xml</loc>\n" +
              "  <lastmod>2026-02-01T10:00:00Z</lastmod>\n </sitemap>\n" +
              " <sitemap><loc>https://b.com/sitemap-2.xml</loc></sitemap>\n" +
              "</sitemapindex>")).toDF("host", "content")
        operators.WebOps.parseSitemap(files)
          .select("host", "entry_no", "kind", "loc", "lastmod",
            "changefreq", "priority")
      },
      Some("""
        SELECT * FROM (VALUES
          ('a.com', 0, 'url', 'https://a.com/page?x=1&y=2', '2026-01-05', 'daily', 0.8),
          ('a.com', 1, 'url', 'https://a.com/cdata&raw', NULL, NULL, NULL),
          ('a.com', 3, 'url', 'https://a.com/upper', NULL, NULL, NULL),
          ('a.com', 4, 'url', 'https://a.com/badmod', NULL, NULL, NULL),
          ('b.com', 0, 'sitemap', 'https://b.com/sitemap-1.xml', '2026-02-01T10:00:00Z', NULL, NULL),
          ('b.com', 1, 'sitemap', 'https://b.com/sitemap-2.xml', NULL, NULL, NULL)
        ) AS t(host, entry_no, kind, loc, lastmod, changefreq, priority)""".stripMargin.trim)),

    Q("q_recrawl",
      // recrawl scheduling from sitemap lastmod/changefreq + fetch
      // history: new > modified (day-granularity lastmod vs fetch date;
      // for 'never' pages lastmod >= fetch date counts — their stale
      // path is disabled, so a same-day bump would otherwise be
      // permanently unseen: u8 pins it) > stale (changefreq interval
      // elapsed; 'never' disables it; missing paces at the weekly
      // default; partial lastmod like bare '2026' is not comparable)
      // > fresh; the oracle is the hand-computed decision table
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import s.implicits._
        val files = Seq(("a.com",
          "<urlset>" +
            "<url><loc>http://a.com/u1</loc><lastmod>2026-01-20</lastmod><changefreq>daily</changefreq></url>" +
            "<url><loc>http://a.com/u2</loc><lastmod>2026-01-25</lastmod><changefreq>never</changefreq></url>" +
            "<url><loc>http://a.com/u3</loc><lastmod>2026-01-05</lastmod><changefreq>never</changefreq></url>" +
            "<url><loc>http://a.com/u4</loc></url>" +
            "<url><loc>http://a.com/u5</loc><changefreq>monthly</changefreq></url>" +
            "<url><loc>http://a.com/u6</loc><changefreq>hourly</changefreq></url>" +
            "<url><loc>http://a.com/u7</loc><lastmod>2026</lastmod><changefreq>yearly</changefreq></url>" +
            "<url><loc>http://a.com/u8</loc><lastmod>2026-01-15</lastmod><changefreq>never</changefreq></url>" +
            "</urlset>")).toDF("host", "content")
        val pages = operators.WebOps.parseSitemap(files)
        val history = Seq(
          ("http://a.com/u1", "2026-01-10 00:00:00"),
          ("http://a.com/u2", "2026-01-20 00:00:00"),
          ("http://a.com/u3", "2026-01-10 00:00:00"),
          ("http://a.com/u4", "2026-01-28 00:00:00"),
          ("http://a.com/u6", "2026-01-31 23:00:00"),
          ("http://a.com/u7", "2025-01-01 00:00:00"),
          ("http://a.com/u8", "2026-01-15 12:00:00")).toDF("loc", "lf")
          .select(col("loc"), col("lf").cast("timestamp").as("last_fetch"))
        operators.WebOps.recrawlDue(pages, history, "2026-02-01 00:00:00")
          .select("loc", "last_fetch", "reason", "due")
      },
      Some("""
        SELECT * FROM (VALUES
          ('http://a.com/u1', TIMESTAMP '2026-01-10 00:00:00', 'modified', true),
          ('http://a.com/u2', TIMESTAMP '2026-01-20 00:00:00', 'modified', true),
          ('http://a.com/u3', TIMESTAMP '2026-01-10 00:00:00', 'fresh', false),
          ('http://a.com/u4', TIMESTAMP '2026-01-28 00:00:00', 'fresh', false),
          ('http://a.com/u5', CAST(NULL AS TIMESTAMP), 'new', true),
          ('http://a.com/u6', TIMESTAMP '2026-01-31 23:00:00', 'stale', true),
          ('http://a.com/u7', TIMESTAMP '2025-01-01 00:00:00', 'stale', true),
          ('http://a.com/u8', TIMESTAMP '2026-01-15 12:00:00', 'modified', true)
        ) AS t(loc, last_fetch, reason, due)""".stripMargin.trim)),

    Q("q_domain_psl",
      // Public-Suffix-List registered-domain lookup over a fixture PSL
      // (plain suffixes, a private-registry suffix github.io, a wildcard
      // *.ck, an exception !www.ck) and adversarial URLs — the exact
      // semantics the builtin ccSLD heuristic approximates; IPs and
      // unlisted TLDs fall back to the builtin; the oracle is the
      // hand-computed PSL-algorithm decision table
      (s, dir) => {
        import s.implicits._
        val psl = Seq("// comment line", "", "com", "uk", "co.uk", "io",
          "github.io", "ck", "*.ck", "!www.ck", "au", "com.au")
          .toDF("suffix")
        val urls = Seq(
          "http://a.b.example.co.uk/x", "https://user.github.io/repo",
          "http://github.io/", "http://www.ck/page",
          "http://foo.bar.ck/", "http://example.com",
          "http://sub.example.com/y", "http://shop.example.com.au",
          "http://x.y.example.zz/unlisted", "http://192.168.0.1/ip",
          "not a url").toDF("url")
        operators.WebOps.registeredDomainPsl(urls, psl)
      },
      Some("""
        SELECT * FROM (VALUES
          ('http://a.b.example.co.uk/x',   'example.co.uk'),
          ('https://user.github.io/repo',  'user.github.io'),
          ('http://github.io/',            NULL),
          ('http://www.ck/page',           'www.ck'),
          ('http://foo.bar.ck/',           'foo.bar.ck'),
          ('http://example.com',           'example.com'),
          ('http://sub.example.com/y',     'example.com'),
          ('http://shop.example.com.au',   'example.com.au'),
          ('http://x.y.example.zz/unlisted', 'example.zz'),
          ('http://192.168.0.1/ip',        '192.168.0.1'),
          ('not a url',                    NULL)
        ) AS t(url, registered_domain)""".stripMargin.trim)),

    Q("q_code_flags",
      // code-vs-prose router signals over documents plus planted code
      // rows (python def/indent, C-style braces+semicolons, plain
      // prose): line-signature fraction, symbol density, and the
      // flag_code decision; the oracle replays the line filter and
      // counts in DuckDB
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import s.implicits._
        val extra = Seq(
          (1000001L, "def main():\n    print('hi')\n    return 0"),
          (1000002L, "short prose line\nanother line of plain text"),
          (1000003L, "int x = 1;\nif (x) {\n  y();\n}"))
          .toDF("doc_id", "text")
        val d = Tables.load(s, dir)("documents")
          .select(col("doc_id"), col("text")).unionByName(extra)
        operators.TextOps.codeFlags(d)
          .select("doc_id", "n_lines", "code_line_frac", "symbol_frac",
            "flag_code")
      },
      Some("""
        WITH docs2 AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT 1000001, 'def main():' || chr(10) ||
            '    print(''hi'')' || chr(10) || '    return 0'
          UNION ALL SELECT 1000002, 'short prose line' || chr(10) ||
            'another line of plain text'
          UNION ALL SELECT 1000003, 'int x = 1;' || chr(10) ||
            'if (x) {' || chr(10) || '  y();' || chr(10) || '}'
        ), d AS (
          SELECT doc_id, text,
            list_filter(string_split(coalesce(text, ''), chr(10)),
              l -> trim(l) <> '') AS ls
          FROM docs2
        ), c AS (
          SELECT doc_id, text, len(ls) AS nl,
            len(list_filter(ls, l -> regexp_matches(l,
              '^( {4,}|\t)|[;{}][ \t]*$|^[ \t]*(def |class |import |from |#include|function |var |let |const |public |private |return |if \(|for \(|while \()')))
              AS ncode
          FROM d)
        SELECT doc_id, CAST(nl AS BIGINT) AS n_lines,
          CASE WHEN nl > 0 THEN round(ncode::DOUBLE / nl, 6) ELSE 0.0 END AS code_line_frac,
          CASE WHEN length(text) > 0
               THEN round(len(regexp_extract_all(text, '[{}();=<>\[\]]'))::DOUBLE / length(text), 6)
               ELSE 0.0 END AS symbol_frac,
          (code_line_frac >= 0.3 OR symbol_frac >= 0.05) AS flag_code
        FROM c""".stripMargin.trim)),

    Q("q_markdown",
      // markdown → visible text (README/docs/issue corpora): fences drop,
      // links/images/autolinks reduce to their text, headers/quotes/
      // bullets/tables/setext strip, emphasis unwraps — synthesized
      // markdown wraps every document so both engines extract the same
      // bytes; the DuckDB oracle replays the RE2-portable chain verbatim
      // (hand-computed expectations live in the spec)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        val md = concat(lit("# Doc "), col("doc_id"),
          lit("\n\n**intro** with *star* and [link "), col("doc_id"),
          lit("](http://ex.com/"), col("doc_id"),
          lit(") plus ![alt "), col("doc_id"),
          lit("](i.png) and <http://auto.ex> and `code()`\n\n```\nfenced "),
          col("doc_id"),
          lit("\n```\n\n- bullet one\n2. bullet two\n\n| a | b"), col("doc_id"),
          lit(" |\n| --- | --- |\n\n> quote _q_\n\nSetext\n===\ntail "),
          substring(col("text"), 1, 40))
        d.select(col("doc_id"),
          operators.TextOps.markdownToText(md).as("clean"))
      },
      Some("""
        WITH s0 AS (
          SELECT doc_id,
            '# Doc ' || doc_id::VARCHAR || chr(10) || chr(10) ||
            '**intro** with *star* and [link ' || doc_id::VARCHAR ||
            '](http://ex.com/' || doc_id::VARCHAR ||
            ') plus ![alt ' || doc_id::VARCHAR ||
            '](i.png) and <http://auto.ex> and `code()`' || chr(10) || chr(10) ||
            '```' || chr(10) || 'fenced ' || doc_id::VARCHAR || chr(10) ||
            '```' || chr(10) || chr(10) ||
            '- bullet one' || chr(10) || '2. bullet two' || chr(10) || chr(10) ||
            '| a | b' || doc_id::VARCHAR || ' |' || chr(10) ||
            '| --- | --- |' || chr(10) || chr(10) ||
            '> quote _q_' || chr(10) || chr(10) ||
            'Setext' || chr(10) || '===' || chr(10) || 'tail ' || substr(text, 1, 40) AS t
          FROM documents
        ), s1 AS (
          SELECT doc_id, regexp_replace(t, '(?s)```.*?(```|$)', ' ', 'g') AS t FROM s0
        ), s2 AS (
          SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
            '!\[([^\]]*)\]\([^)]*\)', '\1', 'g'),
            '\[([^\]]*)\]\([^)]*\)', '\1', 'g'),
            '\[([^\]]*)\]\[[^\]]*\]', '\1', 'g'),
            '<(https?://[^>]*)>', '\1', 'g'),
            '`([^`]*)`', '\1', 'g') AS t FROM s1
        ), s3 AS (
          SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
            '(?m)^[ \t]{0,3}#{1,6}[ \t]+', '', 'g'),
            '(?m)^[ \t]{0,3}(=+|-{3,})[ \t]*$', '', 'g'),
            '(?m)^[ \t]*>[ \t]?', '', 'g'),
            '(?m)^[ \t]*([-*+]|[0-9]+\.)[ \t]+', '', 'g') AS t FROM s2
        ), s4 AS (
          SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
            '\*\*([^*]+)\*\*', '\1', 'g'),
            '__([^_]+)__', '\1', 'g'),
            '~~([^~]+)~~', '\1', 'g'),
            '\*([^*\n]+)\*', '\1', 'g'),
            '(?m)(^|[^A-Za-z0-9])_([^_\n]+)_($|[^A-Za-z0-9])', '\1\2\3', 'g') AS t FROM s3
        ), s5 AS (
          SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(t,
            '(?m)^[|:* \t-]+$', '', 'g'),
            '[ \t]*\|[ \t]*', ' ', 'g'),
            '[ \t]+', ' ', 'g') AS t FROM s4
        )
        SELECT doc_id, regexp_replace(t, '^\s+|\s+$', '', 'g') AS clean FROM s5""".stripMargin.trim)),

    Q("q_text_hygiene",
      // NFC + invisible-strip + de-hyphenation over documents plus
      // adversarial rows (decomposed accents, zero-width chars, soft
      // hyphens, line-break hyphenation); the oracle replays NFC via
      // DuckDB's conformant utf8proc and the cleanups via the same RE2
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import s.implicits._
        val extra = Seq(
          (1000001L, "cafe\u0301 and caf\u00e9 are the same word"),
          (1000002L, "zero\u200Bwidth\u200C and soft\u00ADhyphen\uFEFF"),
          (1000003L, "exam-\nple hyphen-\n  ation but stays-inline and end-\n9digit"))
          .toDF("doc_id", "text")
        val d = Tables.load(s, dir)("documents")
          .select(col("doc_id"), col("text")).unionByName(extra)
        d.select(col("doc_id"),
          operators.TextOps.nfcNormalize(col("text")).as("nfc_text"),
          operators.TextOps.dehyphenate(
            operators.TextOps.stripInvisible(col("text"))).as("clean_text"))
      },
      Some("""
        WITH d AS (SELECT doc_id, text FROM documents
          UNION ALL SELECT 1000001,
            'cafe' || chr(769) || ' and caf' || chr(233) || ' are the same word'
          UNION ALL SELECT 1000002,
            'zero' || chr(8203) || 'width' || chr(8204) || ' and soft' ||
            chr(173) || 'hyphen' || chr(65279)
          UNION ALL SELECT 1000003, 'exam-' || chr(10) || 'ple hyphen-' ||
            chr(10) || '  ation but stays-inline and end-' || chr(10) || '9digit')
        SELECT doc_id, nfc_normalize(text) AS nfc_text,
          regexp_replace(
            regexp_replace(text,
              '[\x{200B}\x{200C}\x{200D}\x{2060}\x{FEFF}\x{00AD}]', '', 'g'),
            '(\p{L})-[ \t]*\n[ \t]*(\p{L})', '\1\2', 'g') AS clean_text
        FROM d""".stripMargin.trim)),

    Q("q_robots",
      // RFC 9309 robots.txt parsing over adversarial literal files:
      // multi-UA groups, comments, mixed-case directives, first-colon
      // value split (sitemap URLs keep their colons), orphan rules
      // dropped, group-independent sitemaps; the oracle is the
      // hand-computed expected table
      (s, dir) => {
        import s.implicits._
        val files = Seq(
          ("a.com",
            "# politeness\nUser-agent: *\nDisallow: /private/\n" +
              "Allow: /private/ok.html\nCrawl-delay: 2\n\n" +
              "User-agent: fastbot\nUser-agent: speedbot\nDisallow: /\n\n" +
              "Sitemap: https://a.com/sitemap.xml"),
          ("b.com",
            "Disallow: /orphan/\nUSER-AGENT: GoodBot\n" +
              "Disallow: /tmp/ # temp\nAllow:")).toDF("host", "content")
        operators.WebOps.parseRobots(files)
      },
      Some("""
        SELECT * FROM (VALUES
          ('a.com', '*', 'disallow', '/private/', 2),
          ('a.com', '*', 'allow', '/private/ok.html', 3),
          ('a.com', '*', 'crawl-delay', '2', 4),
          ('a.com', 'fastbot', 'disallow', '/', 8),
          ('a.com', 'speedbot', 'disallow', '/', 8),
          ('a.com', NULL, 'sitemap', 'https://a.com/sitemap.xml', 10),
          ('b.com', 'GoodBot', 'disallow', '/tmp/', 2),
          ('b.com', 'GoodBot', 'allow', '', 3)
        ) AS t(host, user_agent, directive, value, line_no)""".stripMargin.trim)),

    Q("q_byte_proxy",
      // byte-level-BPE input representation: every UTF-8 byte of the
      // normalized text as one proxy char (space/printable ASCII =
      // themselves, the rest in the PUA at U+E000+byte); the oracle
      // replays the mapping from hex-encoded bytes, incl. an adversarial
      // multi-byte row (accents, en dash, an astral emoji)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import s.implicits._
        val extra = Seq(
          (1000001L, "héllo – ümlaut 😀"))
          .toDF("doc_id", "text")
        val d = Tables.load(s, dir)("documents")
          .select(col("doc_id"), col("text")).unionByName(extra)
        d.select(col("doc_id"),
          posexplode(split(operators.Bpe.byteProxyText(col("text")), ""))
            .as(Seq("i", "ch")))
      },
      Some("""
        WITH d AS (SELECT doc_id, text FROM documents
          UNION ALL SELECT 1000001, 'h' || chr(233) || 'llo ' || chr(8211) ||
            ' ' || chr(252) || 'mlaut ' || chr(128512)),
        n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM d),
        b AS (SELECT doc_id, to_hex(encode(t)) AS h, octet_length(encode(t)) AS nb FROM n),
        e AS (SELECT doc_id, unnest(range(nb)) AS i, h FROM b),
        byt AS (SELECT doc_id, i,
            ('0x' || substr(h, CAST(i * 2 + 1 AS INT), 2))::INT AS bv FROM e)
        SELECT doc_id, CAST(i AS INTEGER) AS i,
          CASE WHEN bv = 32 OR bv BETWEEN 33 AND 126 THEN chr(bv)
               ELSE chr(57344 + bv) END AS ch
        FROM byt""".stripMargin.trim)),

    Q("q_join_interval",
      // interval-overlap join via bucketized equi-join + canonical-bucket
      // election; the oracle is the direct theta join (same IEEE interval
      // arithmetic on both sides), so any duplicate or lost pair goes red
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.load(s, dir)("events")
        val l = ev.select(col("event_id").as("l_id"), col("user_id"),
          (col("value") * 100).as("ls"), (col("value") * 100 + 300).as("le"))
        val r = ev.filter(pmod(col("event_id"), lit(10)) === 0)
          .select(col("event_id").as("r_id"), col("user_id"),
            (col("value") * 100 - 200).as("rs"),
            (col("value") * 100 + 100).as("re"))
        operators.Joins.intervalOverlap(l, r, Seq("user_id"),
            "ls", "le", "rs", "re", bucketWidth = 250)
          .select("user_id", "l_id", "r_id")
      },
      Some("""
        SELECT a.user_id, a.event_id AS l_id, b.event_id AS r_id
        FROM events a JOIN events b ON a.user_id = b.user_id
        WHERE b.event_id % 10 = 0
          AND a.value * 100 <= b.value * 100 + 100
          AND b.value * 100 - 200 <= a.value * 100 + 300""".stripMargin.trim)),

    Q("q_dedup_paragraphs",
      // corpus-wide paragraph dedup over synthetic 3-paragraph docs built
      // from overlapping document triples — every interior paragraph
      // occurs in 3 synth docs, so first-occurrence election does real
      // work; the oracle replays census, election, and per-doc rebuild on
      // the raw normalized keys (Spark shuffles 60-bit hashes —
      // collision-freedom is part of the check)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents").select(col("doc_id"), col("text"))
        val b = d.select((col("doc_id") - 1).as("doc_id"), col("text").as("bt"))
        val c = d.select((col("doc_id") - 2).as("doc_id"), col("text").as("ct"))
        val synth = d.join(b, "doc_id").join(c, "doc_id")
          .select(col("doc_id"),
            concat_ws("\n\n", col("text"), col("bt"), col("ct")).as("text"))
        operators.Dedup.dropDupParagraphs(synth, minChars = 10)
      },
      Some("""
        WITH d AS (SELECT doc_id, text FROM documents),
        synth AS (SELECT a.doc_id,
            a.text || chr(10) || chr(10) || b.text || chr(10) || chr(10) || c.text AS text
          FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
                   JOIN d c ON c.doc_id = a.doc_id + 2),
        sp AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps FROM synth),
        p AS (SELECT doc_id, unnest(ps) AS para,
                generate_subscripts(ps, 1) - 1 AS i FROM sp),
        k AS (SELECT doc_id, i,
                trim(regexp_replace(lower(para), '\s+', ' ', 'g')) AS key
              FROM p WHERE length(trim(para)) >= 10),
        m AS (SELECT doc_id, i, count(*) OVER (PARTITION BY key) AS occ,
                first_value(doc_id) OVER (PARTITION BY key ORDER BY doc_id, i) AS fd,
                first_value(i) OVER (PARTITION BY key ORDER BY doc_id, i) AS fi
              FROM k),
        r AS (SELECT doc_id, i FROM m WHERE occ > 1 AND NOT (doc_id = fd AND i = fi)),
        keep AS (SELECT p.doc_id, p.i, p.para, r.i IS NOT NULL AS rm
          FROM p LEFT JOIN r ON p.doc_id = r.doc_id AND p.i = r.i)
        SELECT doc_id,
          coalesce(string_agg(CASE WHEN NOT rm THEN para END,
            chr(10) || chr(10) ORDER BY i), '') AS clean_text,
          count(*) AS n_paras,
          count(CASE WHEN rm THEN 1 END) AS n_removed
        FROM keep GROUP BY doc_id""".stripMargin.trim)),

    Q("q_paragraphs_incr",
      // incremental paragraph dedup against stored corpus signatures:
      // corpus = every 7th document's paragraphs (hashed, text never
      // stored), batch = overlapping 3-paragraph synth docs — a batch
      // paragraph deletes when corpus-owned (wherever it occurs) or as
      // a non-first within-batch occurrence; short paragraphs exempt;
      // the oracle replays census, corpus join, election and rebuild on
      // the normalized keys
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents").select(col("doc_id"), col("text"))
        val sigs = operators.Dedup.paragraphSignatures(
          d.filter(pmod(col("doc_id"), lit(7)) === 0))
        val b = d.select((col("doc_id") - 1).as("doc_id"), col("text").as("bt"))
        val c = d.select((col("doc_id") - 2).as("doc_id"), col("text").as("ct"))
        val synth = d.filter(col("doc_id") < 300).join(b, "doc_id").join(c, "doc_id")
          .select(col("doc_id"),
            concat_ws("\n\n", col("text"), col("bt"), col("ct")).as("text"))
        operators.Dedup.dropDupParagraphsAgainst(synth, sigs)
      },
      Some("""
        WITH d AS (SELECT doc_id, text FROM documents),
        corpus AS (SELECT DISTINCT
            trim(regexp_replace(lower(para), '\s+', ' ', 'g')) AS key
          FROM (SELECT unnest(string_split(text, chr(10) || chr(10))) AS para
                FROM d WHERE doc_id % 7 = 0)
          WHERE length(trim(para)) >= 30),
        synth AS (SELECT a.doc_id,
            a.text || chr(10) || chr(10) || b.text || chr(10) || chr(10) || c.text AS text
          FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
                   JOIN d c ON c.doc_id = a.doc_id + 2
          WHERE a.doc_id < 300),
        sp AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps FROM synth),
        p AS (SELECT doc_id, unnest(ps) AS para,
                generate_subscripts(ps, 1) - 1 AS i FROM sp),
        k AS (SELECT doc_id, i,
                trim(regexp_replace(lower(para), '\s+', ' ', 'g')) AS key
              FROM p WHERE length(trim(para)) >= 30),
        m AS (SELECT doc_id, i, key, count(*) OVER (PARTITION BY key) AS occ,
                first_value(doc_id) OVER (PARTITION BY key ORDER BY doc_id, i) AS fd,
                first_value(i) OVER (PARTITION BY key ORDER BY doc_id, i) AS fi
              FROM k),
        r AS (SELECT doc_id, i FROM m
              WHERE key IN (SELECT key FROM corpus)
                 OR (occ > 1 AND NOT (doc_id = fd AND i = fi))),
        keep AS (SELECT p.doc_id, p.i, p.para, r.i IS NOT NULL AS rm
          FROM p LEFT JOIN r ON p.doc_id = r.doc_id AND p.i = r.i)
        SELECT doc_id,
          coalesce(string_agg(CASE WHEN NOT rm THEN para END,
            chr(10) || chr(10) ORDER BY i), '') AS clean_text,
          count(*) AS n_paras,
          count(CASE WHEN rm THEN 1 END) AS n_removed
        FROM keep GROUP BY doc_id""".stripMargin.trim)),

    Q("q_lines_incr",
      // incremental boilerplate-line removal against stored corpus line
      // FREQUENCIES (the count-carrying member of the stored-signature
      // family): corpus = every 7th document's per-line doc counts,
      // batch = overlapping 3-doc synth rows (each source line lands in
      // up to 3 batch docs, so combined df = batch 3 + corpus 0/1
      // straddles maxDf=3 exactly at the corpus membership boundary —
      // count-inclusive crossing is the thing under test); the oracle
      // replays census, store join, threshold and rebuild on the raw
      // line text (the Spark side joins 60-bit hashes, so
      // collision-freedom is part of the check)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents").select(col("doc_id"), col("text"))
        val counts = operators.Dedup.lineCounts(
          d.filter(pmod(col("doc_id"), lit(7)) === 0))
        val b = d.select((col("doc_id") - 1).as("doc_id"), col("text").as("bt"))
        val c = d.select((col("doc_id") - 2).as("doc_id"), col("text").as("ct"))
        val synth = d.filter(col("doc_id") < 300).join(b, "doc_id").join(c, "doc_id")
          .select(col("doc_id"),
            concat_ws("\n", col("text"), col("bt"), col("ct")).as("text"))
        operators.Dedup.dropCommonLinesAgainst(synth, counts, maxDf = 3)
      },
      Some("""
        WITH d AS (SELECT doc_id, text FROM documents),
        corpus AS (SELECT line, count(DISTINCT doc_id) AS sdf
          FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
                FROM d WHERE doc_id % 7 = 0)
          GROUP BY line),
        synth AS (SELECT a.doc_id,
            a.text || chr(10) || b.text || chr(10) || c.text AS text
          FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
                   JOIN d c ON c.doc_id = a.doc_id + 2
          WHERE a.doc_id < 300),
        sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM synth),
        l AS (SELECT doc_id, unnest(ls) AS line,
                generate_subscripts(ls, 1) - 1 AS i FROM sp),
        bdf AS (SELECT line, count(DISTINCT doc_id) AS bdf FROM l GROUP BY line),
        hot AS (SELECT b.line FROM bdf b LEFT JOIN corpus c ON b.line = c.line
                WHERE b.bdf + coalesce(c.sdf, 0) > 3)
        SELECT doc_id,
          coalesce(string_agg(CASE WHEN hot.line IS NULL THEN l.line END,
            chr(10) ORDER BY i), '') AS clean_text,
          count(*) AS n_lines,
          count(hot.line) AS n_removed
        FROM l LEFT JOIN hot ON l.line = hot.line
        GROUP BY doc_id""".stripMargin.trim)),

    Q("q_lsh_plan",
      // banding planner: the p(j) curve per (bands, rows) split of a
      // 64-position signature at j = 0.7 / 0.5 / 0.8 — pure arithmetic,
      // replayed with power() (4-dp rounding absorbs last-ulp pow drift)
      (s, dir) => operators.Sketches.lshPlan(s, k = 64, threshold = 0.7),
      Some("""
        SELECT CAST(r AS INTEGER) AS rows_per_band,
          CAST(64 // r AS INTEGER) AS bands,
          CAST((64 // r) * r AS INTEGER) AS positions_used,
          round(1 - power(1 - power(0.7, r), 64 // r), 4) AS p_at_threshold,
          round(1 - power(1 - power(0.7 - 0.2, r), 64 // r), 4) AS p_below,
          round(1 - power(1 - power(0.7 + 0.1, r), 64 // r), 4) AS p_above
        FROM range(1, 65) t(r)""".stripMargin.trim)),

    Q("q_sketch_cm",
      // count-min cell table over an unbounded key space: md5-portable
      // hash family, so every cell is exactly replayable; the shuffle is
      // sketch-sized (depth x width cells), never corpus-sized
      (s, dir) => operators.Sketches.countMin(
        Tables.load(s, dir)("events"),
        org.apache.spark.sql.functions.col("user_id"),
        depth = 4, width = 256),
      Some("""
        SELECT t.row AS row,
          ('0x' || substr(md5(t.row::VARCHAR || ':' || e.user_id::VARCHAR), 1, 15))::BIGINT % 256 AS bucket,
          count(*) AS cnt
        FROM events e CROSS JOIN range(4) t(row)
        GROUP BY 1, 2""".stripMargin.trim)),

    Q("q_sketch_cm_query",
      // point estimates: min over each key's depth cells, missing = 0;
      // the oracle replays build + probe end-to-end
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.load(s, dir)("events")
        val sk = operators.Sketches.countMin(ev, col("user_id"), 4, 256)
        val keys = ev.select(col("user_id")).distinct()
          .filter(pmod(col("user_id"), lit(25)) === 0)
        operators.Sketches.countMinQuery(sk, keys, col("user_id"), 4, 256)
      },
      Some("""
        WITH c AS (SELECT t.row AS row,
            ('0x' || substr(md5(t.row::VARCHAR || ':' || e.user_id::VARCHAR), 1, 15))::BIGINT % 256 AS bucket,
            count(*) AS cnt
          FROM events e CROSS JOIN range(4) t(row) GROUP BY 1, 2),
        k AS (SELECT DISTINCT user_id FROM events WHERE user_id % 25 = 0),
        q AS (SELECT k.user_id, t.row AS row,
            ('0x' || substr(md5(t.row::VARCHAR || ':' || k.user_id::VARCHAR), 1, 15))::BIGINT % 256 AS bucket
          FROM k CROSS JOIN range(4) t(row))
        SELECT q.user_id, min(coalesce(c.cnt, 0)) AS cm_est
        FROM q LEFT JOIN c USING (row, bucket) GROUP BY 1""".stripMargin.trim)),

    Q("q_interleave",
      // stride-scheduled mixture order: per-source rank by portable hash,
      // vtime = (rank - 0.5) / weight — every prefix of the vtime order
      // realizes the weights; unlisted sources drop
      (s, dir) => {
        import org.apache.spark.sql.functions._
        operators.Sampling.interleaveByWeight(
            Tables.load(s, dir)("documents"),
            col("source"), col("doc_id"),
            Map("src1" -> 0.6, "src2" -> 0.3, "src3" -> 0.1))
          .select("doc_id", "source", "pos_in_source", "vtime")
      },
      Some("""
        SELECT doc_id, source,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT, doc_id)
            AS INTEGER) AS pos_in_source,
          round((pos_in_source - 0.5) /
            (CASE source WHEN 'src1' THEN 0.6 WHEN 'src2' THEN 0.3
                         ELSE 0.1 END), 6) AS vtime
        FROM documents WHERE source IN ('src1', 'src2', 'src3')""".stripMargin.trim)),

    Q("q_warc_ingest",
      // WARC round trip: serialize documents into multi-record WARC files
      // (plus three adversarial rows — a payload embedding a fake record
      // header that a blank-line splitter would shatter into an extra row,
      // a non-ASCII payload pinning byte-counted Content-Length, and an
      // empty payload), then parse back with Ingest.warc; the oracle
      // replays the serialize∘parse identity straight from documents, so
      // any framing error shifts rows or fields red
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import s.implicits._
        val extra = Seq(
          (1000001L, "x\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nabc"),
          (1000002L, "héllo – ümlaut"),
          (1000003L, "")).toDF("doc_id", "text")
        val docs = Tables.load(s, dir)("documents")
          .select(col("doc_id"), col("text")).filter(col("text").isNotNull)
          .unionByName(extra)
        val files = docs
          .withColumn("__rec0", sources.Ingest.warcRecord(
            lit("response"), concat(lit("http://ex.com/"), col("doc_id")),
            lit("2026-01-01T00:00:00Z"), col("text")))
          .groupBy(pmod(col("doc_id"), lit(20)).as("file_id"))
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("doc_id"), col("__rec0")))),
            x => x.getField("__rec0")), "").as("content"))
        sources.Ingest.warc(files, "content")
          .select(col("file_id"), col("rec_index"), col("warc_type"),
            col("target_uri"), col("content_length"), col("payload"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id, text FROM documents WHERE text IS NOT NULL
          UNION ALL SELECT 1000001, 'x' || chr(13) || chr(10) || chr(13) || chr(10) ||
            'WARC/1.0' || chr(13) || chr(10) || 'Content-Length: 3' ||
            chr(13) || chr(10) || chr(13) || chr(10) || 'abc'
          UNION ALL SELECT 1000002,
            'h' || chr(233) || 'llo ' || chr(8211) || ' ' || chr(252) || 'mlaut'
          UNION ALL SELECT 1000003, '')
        SELECT doc_id % 20 AS file_id,
          CAST(row_number() OVER (PARTITION BY doc_id % 20 ORDER BY doc_id) - 1 AS INTEGER) AS rec_index,
          'response' AS warc_type,
          'http://ex.com/' || doc_id::VARCHAR AS target_uri,
          CAST(strlen(text) AS BIGINT) AS content_length,
          text AS payload
        FROM d""".stripMargin.trim)),

    Q("q_corpus_diff",
      // snapshot diff between two deterministic slices of the corpus:
      // prev = ids not divisible by 3, next = ids not divisible by 5 with
      // every 7th text modified; the oracle derives statuses straight from
      // the modular construction, never touching fingerprints
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        val prev = d.filter(pmod(col("doc_id"), lit(3)) =!= 0)
        val next = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(7)) === 0,
              concat(col("text"), lit(" xmod"))).otherwise(col("text")))
        operators.Dedup.corpusDiff(prev, next)
      },
      Some("""
        SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN 'added'
               WHEN doc_id % 5 = 0 THEN 'removed'
               ELSE 'changed' END AS status
        FROM documents
        WHERE (doc_id % 3 = 0 AND doc_id % 5 <> 0)
           OR (doc_id % 3 <> 0 AND doc_id % 5 = 0)
           OR (doc_id % 3 <> 0 AND doc_id % 5 <> 0 AND doc_id % 7 = 0)""".stripMargin.trim)),

    Q("q_pack_sequences",
      // token-budget sequence packing: 16 parallel packing streams by id
      // hash, window cumsum lays documents out contiguously
      (s, dir) => operators.Packing.packSequences(
          Tables.load(s, dir)("documents"), budget = 512, buckets = 16)
        .select("doc_id", "pack_bucket", "token_count", "seq_id", "seq_offset"),
      Some("""
        WITH t AS (
          SELECT doc_id,
            ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 16 AS pack_bucket,
            CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS token_count
          FROM documents
        ), s AS (
          SELECT *, COALESCE(sum(token_count) OVER (
            PARTITION BY pack_bucket ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
          FROM t
        )
        SELECT doc_id, pack_bucket, token_count,
          pack_bucket * 1099511627776 + CAST(st AS BIGINT) // 512 AS seq_id,
          CAST(st AS BIGINT) % 512 AS seq_offset
        FROM s""".stripMargin.trim)),

    Q("q_pack_greedy",
      // whole-document greedy packing: no doc ever splits across sequences;
      // oracle replays the per-bucket greedy fold as a linear recursion
      (s, dir) => operators.Packing.packGreedy(
          Tables.load(s, dir)("documents"), budget = 512, buckets = 16)
        .select("doc_id", "pack_bucket", "token_count", "seq_id"),
      Some("""
        WITH RECURSIVE t AS (
          SELECT doc_id,
            ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 16 AS pack_bucket,
            CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS token_count,
            row_number() OVER (PARTITION BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 16 ORDER BY doc_id) AS rn
          FROM documents
        ), r AS (
          SELECT doc_id, pack_bucket, token_count, rn, 0::BIGINT AS bin, token_count AS fill
          FROM t WHERE rn = 1
          UNION ALL
          SELECT t.doc_id, t.pack_bucket, t.token_count, t.rn,
            CASE WHEN r.fill + t.token_count > 512 THEN r.bin + 1 ELSE r.bin END,
            CASE WHEN r.fill + t.token_count > 512 THEN t.token_count ELSE r.fill + t.token_count END
          FROM r JOIN t ON t.pack_bucket = r.pack_bucket AND t.rn = r.rn + 1
        )
        SELECT doc_id, pack_bucket, token_count,
          pack_bucket * 1099511627776 + bin AS seq_id
        FROM r""".stripMargin.trim)),

    Q("q_license_gate",
      // SPDX license identification from canonical license phrases (the
      // code-corpus permissive gate); the oracle replays the normalized
      // contains-chain verbatim — unknown reads NULL and is NOT
      // permission
      (s, dir) => {
        import s.implicits._
        val docs = Seq(
          (1L, "Licensed under the Apache License, Version 2.0 (the " +
            "\"License\"); you may not use this file except in compliance"),
          (2L, "Permission is hereby granted, free of charge, to any " +
            "person obtaining a copy of this software"),
          (3L, "Redistribution and use in source and binary forms are " +
            "permitted provided that ... Neither the name of the " +
            "copyright holder may be used"),
          (4L, "Redistribution and use in source and binary forms, with " +
            "or without modification, are permitted"),
          (5L, "This program is free software: you can redistribute it " +
            "under the terms of the GNU General Public License, either " +
            "version 3 of the License"),
          (6L, "under the GNU Lesser General Public License as published " +
            "by the Free Software Foundation; either version 2.1"),
          (7L, "This work is licensed under " +
            "https://creativecommons.org/licenses/by-sa/4.0/"),
          (8L, "just ordinary source code with no license header at all")
        ).toDF("doc_id", "text")
        val t = Tables.load(s, dir) + ("code" -> docs)
        GraftEngine.sql(
          "SELECT doc_id, license_id(text) AS license, " +
            "license_permissive(text) AS permissive FROM code", t)
      },
      Some("""
        WITH n AS (
          SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS t
          FROM (VALUES
            (CAST(1 AS BIGINT), 'Licensed under the Apache License, Version 2.0 (the "License"); you may not use this file except in compliance'),
            (2, 'Permission is hereby granted, free of charge, to any person obtaining a copy of this software'),
            (3, 'Redistribution and use in source and binary forms are permitted provided that ... Neither the name of the copyright holder may be used'),
            (4, 'Redistribution and use in source and binary forms, with or without modification, are permitted'),
            (5, 'This program is free software: you can redistribute it under the terms of the GNU General Public License, either version 3 of the License'),
            (6, 'under the GNU Lesser General Public License as published by the Free Software Foundation; either version 2.1'),
            (7, 'This work is licensed under https://creativecommons.org/licenses/by-sa/4.0/'),
            (8, 'just ordinary source code with no license header at all')
          ) AS d(doc_id, text)
        ), lic AS (
          SELECT doc_id, CASE
            WHEN t LIKE '%apache license, version 2.0%' OR
                 t LIKE '%licensed under the apache license%' THEN 'apache-2.0'
            WHEN t LIKE '%permission is hereby granted, free of charge%' THEN 'mit'
            WHEN t LIKE '%permission to use, copy, modify, and/or distribute%' THEN 'isc'
            WHEN t LIKE '%redistribution and use in source and binary forms%' THEN
              CASE WHEN t LIKE '%neither the name%' THEN 'bsd-3-clause'
                   ELSE 'bsd-2-clause' END
            WHEN t LIKE '%gnu lesser general public license%' THEN
              CASE WHEN t LIKE '%version 3%' THEN 'lgpl-3.0' ELSE 'lgpl-2.1' END
            WHEN t LIKE '%gnu general public license%' THEN
              CASE WHEN t LIKE '%version 3%' THEN 'gpl-3.0' ELSE 'gpl-2.0' END
            WHEN t LIKE '%gnu affero general public license%' THEN 'agpl-3.0'
            WHEN t LIKE '%mozilla public license%' THEN 'mpl-2.0'
            WHEN t LIKE '%this is free and unencumbered software%' THEN 'unlicense'
            WHEN t LIKE '%creativecommons.org/publicdomain/zero%' THEN 'cc0-1.0'
            WHEN t LIKE '%creativecommons.org/licenses/by-nc%' THEN 'cc-by-nc-4.0'
            WHEN t LIKE '%creativecommons.org/licenses/by-sa%' THEN 'cc-by-sa-4.0'
            WHEN t LIKE '%creativecommons.org/licenses/by%' THEN 'cc-by-4.0'
            END AS license
          FROM n
        )
        SELECT doc_id, license,
          coalesce(license IN ('apache-2.0','mit','isc','bsd-3-clause',
            'bsd-2-clause','mpl-2.0','unlicense','cc0-1.0','cc-by-4.0'),
            false) AS permissive
        FROM lic""".stripMargin.trim)),

    Q("q_code_file_gates",
      // The-Stack-style code-file keep gates: line-length bounds kill
      // minified bundles, alnum fraction kills blob/art files, autogen
      // banners kill generated code; every stat replays in SQL (all-
      // lines split pinned, 6dp rounding)
      (s, dir) => {
        import s.implicits._
        val code = Seq(
          (1L, "def f(x):\n    return x + 1\n\nprint(f(2))"),
          (2L, "var a=1;" + "x".repeat(2000) + ";\nshort"),
          (3L, "/* AUTO-GENERATED, DO NOT EDIT */\nint main() { return 0; }"),
          (4L, ";;;;;;;;;;\n(((())))\n[[[[]]]]"),
          (5L, "")
        ).toDF("doc_id", "text")
        operators.TextOps.codeFileStats(code)
      },
      Some("""
        WITH d(doc_id, text) AS (VALUES
          (CAST(1 AS BIGINT), 'def f(x):' || chr(10) ||
           '    return x + 1' || chr(10) || chr(10) || 'print(f(2))'),
          (2, 'var a=1;' || repeat('x', 2000) || ';' || chr(10) || 'short'),
          (3, '/* AUTO-GENERATED, DO NOT EDIT */' || chr(10) ||
           'int main() { return 0; }'),
          (4, ';;;;;;;;;;' || chr(10) || '(((())))' || chr(10) || '[[[[]]]]'),
          (5, '')
        ), s AS (
          SELECT doc_id, text,
            string_split(text, chr(10)) AS lines,
            CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS BIGINT) AS alnum
          FROM d
        ), m AS (
          SELECT doc_id, text,
            CAST(coalesce(list_max(list_transform(lines, x -> length(x))), 0) AS INTEGER) AS max_line_len,
            round(CAST(list_sum(list_transform(lines, x -> length(x))) AS DOUBLE) / len(lines), 6) AS avg_line_len,
            CASE WHEN length(text) > 0
              THEN round(CAST(alnum AS DOUBLE) / length(text), 6)
              ELSE 0.0 END AS alnum_frac,
            regexp_matches(lower(text), 'auto-?generated|do not edit|generated by') AS flag_autogen
          FROM s
        )
        SELECT doc_id, text, max_line_len, avg_line_len, alnum_frac,
          flag_autogen,
          (max_line_len <= 1000 AND avg_line_len <= 100.0 AND
           alnum_frac >= 0.25 AND NOT flag_autogen) AS flag_code_keep
        FROM m""".stripMargin.trim)),

    Q("q_json_census",
      // JSONL corpus audit before any schema is imposed: top-level key
      // frequencies with invalid/empty rows as the NULL-key row; the
      // oracle replays via DuckDB's json extension (json_type gates
      // non-objects the way Spark's json_object_keys nulls them)
      (s, dir) => {
        import s.implicits._
        val docs = Seq(
          (1L, """{"a":1,"b":"x"}"""),
          (2L, """{"a":2,"c":[1,2]}"""),
          (3L, "not json at all"),
          (4L, """{"a":3}"""),
          (5L, "{}")
        ).toDF("doc_id", "json")
        operators.Profile.jsonKeyCensus(docs)
      },
      Some("""
        WITH d(doc_id, j) AS (VALUES
          (CAST(1 AS BIGINT), '{"a":1,"b":"x"}'),
          (2, '{"a":2,"c":[1,2]}'),
          (3, 'not json at all'),
          (4, '{"a":3}'),
          (5, '{}')
        ), k AS (
          SELECT CASE WHEN json_valid(j) AND json_type(j) = 'OBJECT'
            THEN json_keys(j) ELSE NULL END AS ks
          FROM d
        ), e AS (
          SELECT unnest(CASE WHEN ks IS NULL OR len(ks) = 0
            THEN list_value(NULL::VARCHAR) ELSE ks END) AS key
          FROM k
        )
        SELECT key, count(*) AS n_docs,
          round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM d), 6) AS frac
        FROM e GROUP BY key""".stripMargin.trim)),

    Q("q_compaction",
      // small-file compaction planning (the lakehouse maintenance
      // shape): greedy byte-budget bin assignment over a file census,
      // whole files only, oversized files alone in their bin; oracle
      // replays the per-bucket fold as the same linear recursion as
      // q_pack_greedy, keyed on the path hash
      (s, dir) => {
        import s.implicits._
        val files = Seq(
          ("part-000", 90L), ("part-001", 40L), ("part-002", 200L),
          ("part-003", 10L), ("part-004", 60L), ("part-005", 128L),
          ("part-006", 5L), ("part-007", 70L)
        ).toDF("path", "bytes")
        operators.Packing.compactionPlan(files, targetBytes = 128, buckets = 4)
      },
      Some("""
        WITH RECURSIVE t AS (
          SELECT path,
            ('0x' || substr(md5(path), 1, 15))::BIGINT % 4 AS pack_bucket,
            bytes,
            row_number() OVER (
              PARTITION BY ('0x' || substr(md5(path), 1, 15))::BIGINT % 4
              ORDER BY path) AS rn
          FROM (VALUES
            ('part-000', CAST(90 AS BIGINT)), ('part-001', 40),
            ('part-002', 200), ('part-003', 10), ('part-004', 60),
            ('part-005', 128), ('part-006', 5), ('part-007', 70)
          ) AS f(path, bytes)
        ), r AS (
          SELECT path, pack_bucket, bytes, rn, 0::BIGINT AS bin,
            bytes AS fill
          FROM t WHERE rn = 1
          UNION ALL
          SELECT t.path, t.pack_bucket, t.bytes, t.rn,
            CASE WHEN r.fill + t.bytes > 128 THEN r.bin + 1 ELSE r.bin END,
            CASE WHEN r.fill + t.bytes > 128 THEN t.bytes
                 ELSE r.fill + t.bytes END
          FROM r JOIN t ON t.pack_bucket = r.pack_bucket AND t.rn = r.rn + 1
        )
        SELECT path, bytes, pack_bucket,
          pack_bucket * 1099511627776 + bin AS bin_id
        FROM r""".stripMargin.trim)),

    Q("q_pack_emit",
      // materialized packed training sequences: token ids are a
      // SQL-replayable word-hash mapping (the BPE-id path is pinned by
      // specs; what this oracle checks is the EMISSION — greedy
      // assignment, id-ordered concatenation, right-padding), posexploded
      // to scalar rows for the driver's canonicalization
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        // `words` doubles as the assignment side's token count: the
        // census pass needs only size(token_ids), and size(transform(X))
        // == size(X), so it counts the word array WITHOUT the per-word
        // md5 hashing (the expensive half of the tokenizer expression)
        val words =
          filter(split(operators.TextOps.normalize(col("text")), " "), w => w =!= "")
        val ids = d.select(col("doc_id"),
          transform(words,
            w => (pmod(operators.TextOps.portableHash60(w), lit(97)) + 1).cast("int"))
            .as("token_ids"), col("text"))
        operators.Packing.emitPackedIds(ids, budget = 128, buckets = 8, tokens = Some(size(words)))
          .select(col("seq_id"), col("n_docs"), col("n_tokens"),
            posexplode(col("token_ids")).as(Seq("pos", "token_id")))
      },
      Some("""
        WITH RECURSIVE t AS (
          SELECT doc_id,
            list_transform(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), w -> w <> ''),
              w -> CAST(('0x' || substr(md5(w), 1, 15))::BIGINT % 97 + 1 AS INTEGER)) AS ids,
            ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS pack_bucket
          FROM documents),
        t2 AS (SELECT doc_id, ids, pack_bucket, len(ids)::BIGINT AS n,
               row_number() OVER (PARTITION BY pack_bucket ORDER BY doc_id) AS rn FROM t),
        r AS (
          SELECT doc_id, ids, pack_bucket, n, rn, 0::BIGINT AS bin, n AS fill FROM t2 WHERE rn = 1
          UNION ALL
          SELECT t2.doc_id, t2.ids, t2.pack_bucket, t2.n, t2.rn,
            CASE WHEN r.fill + t2.n > 128 THEN r.bin + 1 ELSE r.bin END,
            CASE WHEN r.fill + t2.n > 128 THEN t2.n ELSE r.fill + t2.n END
          FROM r JOIN t2 ON t2.pack_bucket = r.pack_bucket AND t2.rn = r.rn + 1),
        agg AS (SELECT pack_bucket * 1099511627776 + bin AS seq_id,
                  count(*) AS n_docs, flatten(list(ids ORDER BY doc_id)) AS cat
                FROM r GROUP BY 1),
        p AS (SELECT seq_id, n_docs, CAST(len(cat) AS INTEGER) AS n_tokens,
                list_concat(cat, [0 for i in range(greatest(0, 128 - len(cat)))]) AS tid
              FROM agg)
        SELECT seq_id, n_docs, n_tokens,
          CAST(unnest(range(len(tid))) AS INTEGER) AS pos,
          unnest(tid) AS token_id
        FROM p""".stripMargin.trim)),

    Q("q_pack_stats",
      // fill-rate audit of the packed table: the oracle replays the whole
      // greedy emission (same chain as q_pack_emit) and aggregates — pad
      // fractions are raw-double divisions of exact longs
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        // `words` doubles as the assignment side's token count: the
        // census pass needs only size(token_ids), and size(transform(X))
        // == size(X), so it counts the word array WITHOUT the per-word
        // md5 hashing (the expensive half of the tokenizer expression)
        val words =
          filter(split(operators.TextOps.normalize(col("text")), " "), w => w =!= "")
        val ids = d.select(col("doc_id"),
          transform(words,
            w => (pmod(operators.TextOps.portableHash60(w), lit(97)) + 1).cast("int"))
            .as("token_ids"), col("text"))
        operators.Packing.packStats(
          operators.Packing.emitPackedIds(ids, budget = 128, buckets = 8, tokens = Some(size(words))),
          budget = 128)
      },
      Some("""
        WITH RECURSIVE t AS (
          SELECT doc_id,
            list_transform(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), w -> w <> ''),
              w -> CAST(('0x' || substr(md5(w), 1, 15))::BIGINT % 97 + 1 AS INTEGER)) AS ids,
            ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS pack_bucket
          FROM documents),
        t2 AS (SELECT doc_id, ids, pack_bucket, len(ids)::BIGINT AS n,
               row_number() OVER (PARTITION BY pack_bucket ORDER BY doc_id) AS rn FROM t),
        r AS (
          SELECT doc_id, ids, pack_bucket, n, rn, 0::BIGINT AS bin, n AS fill FROM t2 WHERE rn = 1
          UNION ALL
          SELECT t2.doc_id, t2.ids, t2.pack_bucket, t2.n, t2.rn,
            CASE WHEN r.fill + t2.n > 128 THEN r.bin + 1 ELSE r.bin END,
            CASE WHEN r.fill + t2.n > 128 THEN t2.n ELSE r.fill + t2.n END
          FROM r JOIN t2 ON t2.pack_bucket = r.pack_bucket AND t2.rn = r.rn + 1),
        agg AS (SELECT pack_bucket * 1099511627776 + bin AS seq_id,
                  count(*) AS n_docs, flatten(list(ids ORDER BY doc_id)) AS cat
                FROM r GROUP BY 1),
        p AS (SELECT seq_id, n_docs, CAST(len(cat) AS INTEGER) AS n_tokens FROM agg)
        SELECT count(*) AS n_seqs, CAST(sum(n_docs) AS BIGINT) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS payload_tokens,
          CAST(count(*) * 128 - sum(n_tokens) AS BIGINT) AS pad_tokens,
          (count(*) * 128 - sum(n_tokens))::DOUBLE / (count(*) * 128) AS pad_frac,
          min(n_tokens) AS min_fill, max(n_tokens) AS max_fill,
          sum(n_docs)::DOUBLE / count(*) AS mean_docs_per_seq
        FROM p""".stripMargin.trim)),

    Q("q_pack_emit_bounds",
      // doc-boundary metadata on packed sequences: doc_lens / doc_starts
      // (member-id order) are what a trainer consumes to reset attention
      // masks at document boundaries; the oracle replays the greedy
      // recursion and derives each member's offset as the running sum of
      // its predecessors' lengths within the sequence
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        // `words` doubles as the assignment side's token count: the
        // census pass needs only size(token_ids), and size(transform(X))
        // == size(X), so it counts the word array WITHOUT the per-word
        // md5 hashing (the expensive half of the tokenizer expression)
        val words =
          filter(split(operators.TextOps.normalize(col("text")), " "), w => w =!= "")
        val ids = d.select(col("doc_id"),
          transform(words,
            w => (pmod(operators.TextOps.portableHash60(w), lit(97)) + 1).cast("int"))
            .as("token_ids"), col("text"))
        operators.Packing.emitPackedIds(ids, budget = 128, buckets = 8, tokens = Some(size(words)))
          .select(col("seq_id"),
            posexplode(arrays_zip(col("doc_lens"), col("doc_starts"))))
          .select(col("seq_id"), col("pos").cast("int").as("di"),
            col("col.doc_lens").as("doc_len"), col("col.doc_starts").as("doc_start"))
      },
      Some("""
        WITH RECURSIVE t AS (
          SELECT doc_id,
            list_transform(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), w -> w <> ''),
              w -> CAST(('0x' || substr(md5(w), 1, 15))::BIGINT % 97 + 1 AS INTEGER)) AS ids,
            ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS pack_bucket
          FROM documents),
        t2 AS (SELECT doc_id, ids, pack_bucket, len(ids)::BIGINT AS n,
               row_number() OVER (PARTITION BY pack_bucket ORDER BY doc_id) AS rn FROM t),
        r AS (
          SELECT doc_id, ids, pack_bucket, n, rn, 0::BIGINT AS bin, n AS fill FROM t2 WHERE rn = 1
          UNION ALL
          SELECT t2.doc_id, t2.ids, t2.pack_bucket, t2.n, t2.rn,
            CASE WHEN r.fill + t2.n > 128 THEN r.bin + 1 ELSE r.bin END,
            CASE WHEN r.fill + t2.n > 128 THEN t2.n ELSE r.fill + t2.n END
          FROM r JOIN t2 ON t2.pack_bucket = r.pack_bucket AND t2.rn = r.rn + 1)
        SELECT pack_bucket * 1099511627776 + bin AS seq_id,
          CAST(row_number() OVER (PARTITION BY pack_bucket, bin ORDER BY doc_id) - 1 AS INTEGER) AS di,
          CAST(n AS INTEGER) AS doc_len,
          CAST(COALESCE(sum(n) OVER (PARTITION BY pack_bucket, bin ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INTEGER) AS doc_start
        FROM r""".stripMargin.trim)),

    Q("q_pack_chunks",
      // concat-then-chunk materialization (GPT-style: docs SPLIT across
      // fixed-budget sequences, zero waste except each bucket's padded
      // tail) — token ids are the same SQL-replayable word-hash mapping
      // as q_pack_emit; the oracle replays the offset cumsum, the per-doc
      // chunk fan-out, the list slicing, and the padded concat — no
      // recursion needed (chunk layout is a closed form of the offsets)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        // `words` doubles as the assignment side's token count: the
        // census pass needs only size(token_ids), and size(transform(X))
        // == size(X), so it counts the word array WITHOUT the per-word
        // md5 hashing (the expensive half of the tokenizer expression)
        val words =
          filter(split(operators.TextOps.normalize(col("text")), " "), w => w =!= "")
        val ids = d.select(col("doc_id"),
          transform(words,
            w => (pmod(operators.TextOps.portableHash60(w), lit(97)) + 1).cast("int"))
            .as("token_ids"), col("text"))
        operators.Packing.emitPackedChunks(ids, budget = 128, buckets = 8, tokens = Some(size(words)))
          .select(col("seq_id"), col("n_docs"), col("n_tokens"),
            posexplode(col("token_ids")).as(Seq("pos", "token_id")))
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
            list_transform(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), w -> w <> ''),
              w -> CAST(('0x' || substr(md5(w), 1, 15))::BIGINT % 97 + 1 AS INTEGER)) AS ids,
            ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS pack_bucket
          FROM documents),
        s AS (SELECT doc_id, ids, pack_bucket, len(ids)::BIGINT AS n,
               COALESCE(sum(len(ids)::BIGINT) OVER (PARTITION BY pack_bucket ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
              FROM t),
        seg AS (SELECT doc_id, ids, pack_bucket, n, st,
                 unnest(range(CAST(st // 128 AS BIGINT), CAST((st + n - 1) // 128 + 1 AS BIGINT))) AS k
                FROM s WHERE n > 0),
        seg2 AS (SELECT pack_bucket * 1099511627776 + k AS seq_id,
                  CAST(greatest(0, st - k * 128) AS INTEGER) AS at,
                  ids[CAST(greatest(0, k * 128 - st) + 1 AS INTEGER) : CAST(least(n, (k + 1) * 128 - st) AS INTEGER)] AS seg
                 FROM seg),
        agg AS (SELECT seq_id, count(*) AS n_docs,
                  flatten(list(seg ORDER BY at)) AS cat
                FROM seg2 GROUP BY seq_id),
        p AS (SELECT seq_id, n_docs, CAST(len(cat) AS INTEGER) AS n_tokens,
                list_concat(cat, [0 for i in range(greatest(0, 128 - len(cat)))]) AS tid
              FROM agg)
        SELECT seq_id, n_docs, n_tokens,
          CAST(unnest(range(len(tid))) AS INTEGER) AS pos,
          unnest(tid) AS token_id
        FROM p""".stripMargin.trim)),

    Q("q_pack_chunks_bounds",
      // segment-boundary metadata on chunked sequences: where each doc
      // SEGMENT (a split doc contributes one per sequence touched) starts
      // and how long it is — the attention-mask reset points
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        // `words` doubles as the assignment side's token count: the
        // census pass needs only size(token_ids), and size(transform(X))
        // == size(X), so it counts the word array WITHOUT the per-word
        // md5 hashing (the expensive half of the tokenizer expression)
        val words =
          filter(split(operators.TextOps.normalize(col("text")), " "), w => w =!= "")
        val ids = d.select(col("doc_id"),
          transform(words,
            w => (pmod(operators.TextOps.portableHash60(w), lit(97)) + 1).cast("int"))
            .as("token_ids"), col("text"))
        operators.Packing.emitPackedChunks(ids, budget = 128, buckets = 8, tokens = Some(size(words)))
          .select(col("seq_id"),
            posexplode(arrays_zip(col("doc_lens"), col("doc_starts"))))
          .select(col("seq_id"), col("pos").cast("int").as("di"),
            col("col.doc_lens").as("doc_len"), col("col.doc_starts").as("doc_start"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
            list_transform(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), w -> w <> ''),
              w -> CAST(('0x' || substr(md5(w), 1, 15))::BIGINT % 97 + 1 AS INTEGER)) AS ids,
            ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS pack_bucket
          FROM documents),
        s AS (SELECT doc_id, pack_bucket, len(ids)::BIGINT AS n,
               COALESCE(sum(len(ids)::BIGINT) OVER (PARTITION BY pack_bucket ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
              FROM t),
        seg AS (SELECT pack_bucket, n, st,
                 unnest(range(CAST(st // 128 AS BIGINT), CAST((st + n - 1) // 128 + 1 AS BIGINT))) AS k
                FROM s WHERE n > 0)
        SELECT pack_bucket * 1099511627776 + k AS seq_id,
          CAST(row_number() OVER (PARTITION BY pack_bucket, k
            ORDER BY greatest(0, st - k * 128)) - 1 AS INTEGER) AS di,
          CAST(least(n, (k + 1) * 128 - st) - greatest(0, k * 128 - st) AS INTEGER) AS doc_len,
          CAST(greatest(0, st - k * 128) AS INTEGER) AS doc_start
        FROM seg""".stripMargin.trim)),

    Q("q_train_pipeline",
      // END-TO-END tokenizer-side composition — the artifact a trainer
      // actually consumes, pinned in one gate: trainMerges → vocab →
      // tokenizeIds → emitPackedIds → shardForTraining. The oracle
      // replays the 8-merge table the trainer deterministically learns on
      // this fixture — (e,r)(e,</w>)(n,</w>)(er,</w>)(o,w)(ow,</w>)(o,r)
      // (s,t) — as CLOSED-FORM string surgery: each internal merge is a
      // left-to-right non-overlapping pair replace (equivalent to the
      // rank-order greedy fold because no merge here is self-adjacent and
      // consumed symbols are marker-substituted before later ranks), the
      // four end-of-word merges each claim a distinct terminal symbol.
      // The in-entry require() pins the trained table, so fixture drift
      // fails loudly with instructions instead of a silent hash mismatch.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir)("documents")
        val merges = operators.Bpe.trainMerges(docs, 8)
        val expect = Seq("e" -> "r", "e" -> "</w>", "n" -> "</w>",
          "er" -> "</w>", "o" -> "w", "ow" -> "</w>", "o" -> "r", "s" -> "t")
        // the oracle replays the sf0.01 fixture's learned table; on that
        // fixture, drift must fail loudly with instructions instead of a
        // confusing hash mismatch. Other SFs (the bench runs this chain at
        // sf0.1) train and run whatever their corpus yields — no oracle
        // is evaluated there.
        if (dir.contains("sf0.01"))
          require(merges == expect, s"fixture drift: trained merges $merges " +
            s"!= oracle-pinned $expect — re-derive q_train_pipeline's oracle")
        val v = operators.Bpe.vocab(docs, merges)
        // localCheckpoint: emitPackedIds consumes its input twice (the
        // slim packing census + the payload join), and token_ids here is
        // an UNMATERIALIZED BPE-kernel expression — without materializing
        // it the corpus is tokenized twice per run (the r14 before-plan's
        // nodes (2)/(6) each carried the bpeSegment StaticInvoke). The
        // BPE piece count cannot be derived cheaper than the segmentation
        // itself (unlike the q_pack_* word-hash ids, which pass a
        // pre-transform `tokens` override instead), so this is the §8
        // "fingerprint once, reuse" materialization: tokenize exactly
        // once, both consumers read the checkpointed blocks. Same
        // lineage-cut precedent as q_crawl_rank's per-round checkpoint.
        val ids = operators.Bpe.tokenizeIds(docs, merges, v)
          .select(col("doc_id"), col("token_ids"))
          .localCheckpoint()
        val packed = operators.Packing.emitPackedIds(ids, budget = 256, buckets = 8)
        operators.Packing.shardForTraining(packed, shards = 4, idCol = "seq_id")
          .select(col("seq_id"), col("shard"), col("shard_pos"),
            col("n_docs"), col("n_tokens"),
            posexplode(col("token_ids")).as(Seq("pos", "token_id")))
      },
      Some("""
        WITH RECURSIVE norm AS (
          SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s FROM documents),
        alpha AS (
          SELECT ch, CAST(row_number() OVER (ORDER BY ch) AS INTEGER) AS token_id
          FROM (SELECT DISTINCT unnest(string_split(replace(s, ' ', ''), '')) AS ch FROM norm)
          WHERE ch <> ''),
        k AS (SELECT max(token_id) AS mx FROM alpha),
        vocab AS (
          SELECT CAST(0 AS INTEGER) AS token_id, '<unk>' AS token
          UNION ALL SELECT token_id, ch FROM alpha
          UNION ALL SELECT mx + 1, '</w>' FROM k
          UNION ALL SELECT mx + 2, 'er' FROM k
          UNION ALL SELECT mx + 3, 'e</w>' FROM k
          UNION ALL SELECT mx + 4, 'n</w>' FROM k
          UNION ALL SELECT mx + 5, 'er</w>' FROM k
          UNION ALL SELECT mx + 6, 'ow' FROM k
          UNION ALL SELECT mx + 7, 'ow</w>' FROM k
          UNION ALL SELECT mx + 8, 'or' FROM k
          UNION ALL SELECT mx + 9, 'st' FROM k),
        words AS (
          SELECT doc_id, CAST(unnest(range(len(wl))) AS INTEGER) AS wi, unnest(wl) AS w
          FROM (SELECT doc_id, list_filter(string_split(s, ' '), x -> x <> '') AS wl FROM norm)),
        seg AS (
          SELECT doc_id, wi,
            replace(replace(replace(replace(w, 'er', chr(1)), 'ow', chr(2)), 'or', chr(3)), 'st', chr(4)) AS m
          FROM words),
        pieces AS (
          SELECT doc_id, wi,
            list_concat(list_transform(
              list_filter(string_split(CASE WHEN substr(m, length(m), 1) IN ('e', 'n', chr(1), chr(2))
                THEN substr(m, 1, length(m) - 1) ELSE m END, ''), c -> c <> ''),
              c -> CASE c WHEN chr(1) THEN 'er' WHEN chr(2) THEN 'ow'
                          WHEN chr(3) THEN 'or' WHEN chr(4) THEN 'st' ELSE c END),
            [CASE substr(m, length(m), 1) WHEN 'e' THEN 'e</w>' WHEN 'n' THEN 'n</w>'
                  WHEN chr(1) THEN 'er</w>' WHEN chr(2) THEN 'ow</w>' ELSE '</w>' END]) AS pl
          FROM seg),
        tok AS (
          SELECT doc_id, wi, CAST(unnest(range(len(pl))) AS INTEGER) AS pi, unnest(pl) AS p
          FROM pieces),
        ids0 AS (
          SELECT t.doc_id, list(v.token_id ORDER BY t.wi, t.pi) AS ids
          FROM tok t JOIN vocab v ON v.token = t.p GROUP BY t.doc_id),
        t AS (
          SELECT n.doc_id, COALESCE(i.ids, []) AS ids,
            ('0x' || substr(md5(n.doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS pack_bucket
          FROM norm n LEFT JOIN ids0 i ON i.doc_id = n.doc_id),
        t2 AS (SELECT doc_id, ids, pack_bucket, len(ids)::BIGINT AS n,
               row_number() OVER (PARTITION BY pack_bucket ORDER BY doc_id) AS rn FROM t),
        r AS (
          SELECT doc_id, ids, pack_bucket, n, rn, 0::BIGINT AS bin, n AS fill FROM t2 WHERE rn = 1
          UNION ALL
          SELECT t2.doc_id, t2.ids, t2.pack_bucket, t2.n, t2.rn,
            CASE WHEN r.fill + t2.n > 256 THEN r.bin + 1 ELSE r.bin END,
            CASE WHEN r.fill + t2.n > 256 THEN t2.n ELSE r.fill + t2.n END
          FROM r JOIN t2 ON t2.pack_bucket = r.pack_bucket AND t2.rn = r.rn + 1),
        agg AS (SELECT pack_bucket * 1099511627776 + bin AS seq_id,
                  count(*) AS n_docs, flatten(list(ids ORDER BY doc_id)) AS cat
                FROM r GROUP BY 1),
        p AS (SELECT seq_id, n_docs, CAST(len(cat) AS INTEGER) AS n_tokens,
                list_concat(cat, [0 for i in range(greatest(0, 256 - len(cat)))]) AS tid,
                ('0x' || substr(md5(seq_id::VARCHAR), 1, 15))::BIGINT AS h
              FROM agg),
        sh AS (SELECT *, CAST(h % 4 AS INTEGER) AS shard,
                 CAST(row_number() OVER (PARTITION BY h % 4 ORDER BY h, seq_id) - 1 AS BIGINT) AS shard_pos
               FROM p)
        SELECT seq_id, shard, shard_pos, n_docs, n_tokens,
          CAST(unnest(range(len(tid))) AS INTEGER) AS pos,
          unnest(tid) AS token_id
        FROM sh""".stripMargin.trim)),

    Q("q_embed_quantize",
      // L2-normalize + int8 scalar quantization, exploded per dimension
      // (array columns explode to scalars for the hash compare)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val emb = Tables.load(s, dir)("embeddings")
        emb.select(col("vec_id"),
            operators.Similarity.l2Normalize(col("embedding")).as("u"),
            operators.Similarity.quantizeInt8(col("embedding")).as("q"))
          .select(col("vec_id"), posexplode(col("u")).as(Seq("i", "u_val")), col("q"))
          .select(col("vec_id"), col("i"),
            col("u_val"), element_at(col("q"), col("i") + 1).as("q_val"))
      },
      Some("""
        WITH b AS (
          SELECT vec_id, embedding,
            sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
            list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx
          FROM embeddings
        ), u AS (
          SELECT vec_id,
            list_transform(embedding, x -> CASE WHEN nrm = 0 THEN 0.0 ELSE round(x::DOUBLE / nrm, 6) END) AS un,
            list_transform(embedding, x -> CASE WHEN mx = 0 THEN 0 ELSE CAST(round(x::DOUBLE * (127.0 / mx), 0) AS INTEGER) END) AS qn,
            len(embedding) AS d
          FROM b
        )
        SELECT vec_id, CAST(unnest(range(d)) AS INTEGER) AS i,
          unnest(un) AS u_val, unnest(qn) AS q_val
        FROM u""".stripMargin.trim)),

    Q("q_embed_meanpool",
      // chunk→doc embedding roll-up: element-wise mean per group (50
      // groups by vec_id hash-mod), O(d) aggregator partials — exploded
      // per dimension for the hash compare
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val emb = Tables.load(s, dir)("embeddings")
          .withColumn("grp", pmod(col("vec_id"), lit(50)))
        operators.Similarity.meanPool(emb, Seq("grp"))
          .select(col("grp"), posexplode(col("mean_vec")).as(Seq("i", "v")))
          .select(col("grp"), col("i"), round(col("v"), 6).as("v"))
      },
      Some("""
        WITH t AS (
          SELECT vec_id % 50 AS grp, CAST(unnest(range(64)) AS INT) AS i,
            unnest(embedding)::DOUBLE AS v
          FROM embeddings
        )
        SELECT grp, i, round(avg(v), 6) AS v FROM t GROUP BY grp, i""".stripMargin.trim)),

    Q("q_pca_project",
      // PCA dim-reduction over a planted Walsh-pattern design: 496 rows
      // (31 complete 16-periods of the id bits), so the four ±1 patterns
      // are exactly orthogonal and the population covariance is EXACTLY
      // [[52,36,0,0],[36,73,0,0],[0,0,1,0],[0,0,0,4]] with eigenpairs
      // (100,[.6,.8,0,0]) (25,[.8,-.6,0,0]) (4,e3) (1,e2). The Jacobi
      // rotation, eigenvalue ordering, sign canonicalization and centered
      // projection all land on exactly-representable values (±10/±5/±2),
      // so the oracle is the hand-computed closed form.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        def sgn(b: Int) =
          lit(1.0) - lit(2.0) * pmod(floor(col("doc_id") / lit(1L << b)), lit(2))
        val vecs = Tables.load(s, dir)("documents")
          .where(col("doc_id") < 496)
          .select(col("doc_id").as("vec_id"), array(
            (lit(7.0) + lit(6.0) * sgn(0) - lit(4.0) * sgn(1)).cast("float"),
            (lit(-3.0) + lit(8.0) * sgn(0) + lit(3.0) * sgn(1)).cast("float"),
            (lit(2.0) + sgn(2)).cast("float"),
            (lit(1.0) + lit(2.0) * sgn(3)).cast("float")).as("embedding"))
        operators.Similarity.pcaReduce(vecs, k = 3)
          .select(col("vec_id"),
            round(element_at(col("proj"), 1), 6).as("p0"),
            round(element_at(col("proj"), 2), 6).as("p1"),
            round(element_at(col("proj"), 3), 6).as("p2"))
      },
      Some("""
        SELECT doc_id AS vec_id,
          round(10.0 * (1 - 2 * (doc_id % 2)), 6) AS p0,
          round(-5.0 * (1 - 2 * ((doc_id // 2) % 2)), 6) AS p1,
          round(2.0 * (1 - 2 * ((doc_id // 8) % 2)), 6) AS p2
        FROM documents WHERE doc_id < 496""".stripMargin.trim)),

    // --- LLM-pipeline operators: deduplication ----------------------------
    Q("q_dedup_exact",
      (s, dir) => operators.Dedup.exact(Tables.load(s, dir)("documents")),
      Some("SELECT doc_id, text, lang, source, n_chars FROM documents " +
        "WHERE doc_id IN (SELECT min(doc_id) FROM documents " +
        "GROUP BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))")),

    Q("q_dedup_minhash",
      (s, dir) => operators.Dedup.minHashPairs(
        Tables.load(s, dir)("documents"), threshold = 0.7),
      // LSH recall at j≥0.7 with 16 bands × 4 rows ≈ 1 − (1−j⁴)¹⁶ > 0.988;
      // the oracle is the exact all-pairs 3-gram Jaccard.
      Some("""
        WITH n AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w FROM documents),
        s AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) END AS sh FROM n)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          round(len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7""".stripMargin.trim)),

    Q("q_dedup_components",
      (s, dir) => {
        val docs = Tables.load(s, dir)("documents")
        val pairs = operators.Dedup.minHashPairs(docs, threshold = 0.7)
        val cc = operators.Dedup.connectedComponents(pairs)
        pairs.unpersist(false)
        cc
      },
      // transitive closure over the exact-Jaccard pair set; comp = min
      // reachable id (DuckDB recursive CTE — clusters are tiny at sf0.01)
      Some("""
        WITH RECURSIVE n AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w FROM documents),
        s AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) END AS sh FROM n),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7),
        e AS (SELECT doc_a AS src, doc_b AS dst FROM p UNION SELECT doc_b, doc_a FROM p),
        reach(src, dst) AS (
          SELECT src, dst FROM e
          UNION
          SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src WHERE e2.dst <> r.src)
        SELECT src AS doc_id, least(src, min(dst)) AS comp FROM reach GROUP BY src""".stripMargin.trim)),

    Q("q_dedup_sig_pairs",
      // stored-sketch near-dup pairs: signatures materialized once, then
      // banding AND Jaccard-estimate verification run on sketches only —
      // zero text access, the daily-ingest shape at 100 TB. xxhash64-based
      // sketches have no ANSI-SQL analog, so the sig-path pairs cannot be
      // oracle-replayed DIRECTLY — instead the entry emits the sig-path
      // pair set full-outer-diffed against the in-engine text path
      // (q_dedup_minhash's operator, same fixture + threshold) with a
      // status column, and the oracle asserts every emitted pair is
      // 'both' and equals the exact all-pairs Jaccard set at >= 0.85.
      // GUARD BAND (r9): the sig path verifies by the k=64 signature
      // ESTIMATE (std err ~0.057 near the 0.7 threshold), so est-vs-exact
      // can legitimately disagree on borderline pairs; pairs whose EXACT
      // Jaccard falls in [0.55, 0.85) are therefore excluded from the
      // diff on BOTH sides (their >= 0.7 coverage stays gated by
      // q_dedup_minhash's text path). A sig-only pair with exact J
      // < 0.55 (>4 sigma from the estimate threshold) or a missing pair
      // with exact J >= 0.85 still goes RED; SketchesSpec additionally
      // pins bit-identical banding and estimator accuracy.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir)("documents")
        val sigs = operators.Dedup.minHashSignatures(docs)
        val sig = operators.Dedup.minHashPairsFromSignatures(sigs, threshold = 0.7)
          .select(col("doc_a"), col("doc_b"), lit(true).as("in_sig"))
        // exact Jaccard for EVERY banding candidate (threshold 0 keeps
        // them all): the >= 0.7 slice is the text-path comparison set,
        // the rest feeds the guard-band filter
        val exact = operators.Dedup.minHashPairs(docs, threshold = 0.0)
          .select(col("doc_a"), col("doc_b"), col("jaccard"))
        val text = exact.filter(col("jaccard") >= 0.7)
          .select(col("doc_a"), col("doc_b"), lit(true).as("in_text"))
        sig.join(text, Seq("doc_a", "doc_b"), "full_outer")
          .join(exact, Seq("doc_a", "doc_b"), "left")
          .filter(col("jaccard").isNull ||
            col("jaccard") < 0.55 || col("jaccard") >= 0.85)
          .select(col("doc_a"), col("doc_b"),
            when(col("in_sig") && col("in_text"), "both")
              .when(col("in_sig"), "sig_only")
              .otherwise("text_only").as("status"))
      },
      Some("""
        WITH n AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w FROM documents),
        s AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) END AS sh FROM n)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 'both' AS status
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.85""".stripMargin.trim)),

    Q("q_dedup_incremental",
      // incremental (new-batch-vs-corpus) near-dup pairs: odd ids play
      // the fresh crawl, even ids the existing corpus
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir)("documents")
        operators.Dedup.minHashPairsAgainst(
          docs.filter(pmod(col("doc_id"), lit(2)) === 1),
          docs.filter(pmod(col("doc_id"), lit(2)) === 0),
          threshold = 0.7)
      },
      Some("""
        WITH n AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w FROM documents),
        s AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) END AS sh FROM n)
        SELECT a.doc_id AS doc_new, b.doc_id AS doc_corpus,
          round(len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
        FROM s a JOIN s b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7""".stripMargin.trim)),

    Q("q_dedup_keep_new",
      // ingest decision: odd-id "fresh crawl" docs that near-dup nothing
      // in the even-id "corpus" survive
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir)("documents")
        operators.Dedup.keepNewAgainst(
            docs.filter(pmod(col("doc_id"), lit(2)) === 1),
            docs.filter(pmod(col("doc_id"), lit(2)) === 0),
            threshold = 0.7)
          .select(col("doc_id"))
      },
      Some("""
        WITH n AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w FROM documents),
        s AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) END AS sh FROM n)
        SELECT d.doc_id FROM documents d
        WHERE d.doc_id % 2 = 1 AND d.doc_id NOT IN (
          SELECT a.doc_id
          FROM s a JOIN s b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
          WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7)""".stripMargin.trim)),

    Q("q_dedup_keep_sigs",
      // stored-signature ingest keep decision end-to-end (sign → band →
      // pair vs store → within-batch CC election with corpus ownership
      // propagating through clusters → anti-join): batch doc b carries a
      // synthesized text keyed by k = b - b%3, so consecutive id triples
      // form exact in-batch dup clusters, and every-7th key also sits in
      // the corpus signature store. Texts of DIFFERENT keys use disjoint
      // per-key vocabularies (zero shared shingles), so at threshold 1.0
      // the k=64 estimator is deterministic — identical texts estimate
      // exactly 1.0, disjoint texts cannot reach it — and DuckDB replays
      // the whole decision with text-key arithmetic. (The first draft
      // fed the documents fixture's word-salad texts through this: with
      // thousands of J≈0.9 pairs, a few hit 64/64 matching positions by
      // construction-independent chance, which no SQL replay can see —
      // disjoint vocabularies remove the phenomenon rather than guard-
      // banding it.)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        def synth(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          concat_ws(" ", transform(sequence(lit(1), lit(25)),
            i => concat(lit("t"), k, lit("_w"), i)))
        val corpusSigs = operators.Dedup.minHashSignatures(
          s.range(0, 600).filter(col("id") % 7 === 0)
            .select(col("id").as("doc_id"), synth(col("id")).as("text")))
        val batch = s.range(0, 400)
          .select((col("id") + 1000000).as("doc_id"),
            synth(col("id") - pmod(col("id"), lit(3))).as("text"))
        operators.Dedup.keepNewAgainstSignatures(batch, corpusSigs,
          threshold = 1.0)
      },
      Some("""
        WITH b AS (SELECT range AS bid FROM range(0, 400)),
        c AS (SELECT bid, bid - bid % 3 AS k FROM b)
        SELECT bid + 1000000 AS doc_id,
          array_to_string([('t' || k || '_w' || i) for i in range(1, 26)], ' ') AS text
        FROM c
        WHERE bid = k AND k % 7 <> 0""".stripMargin.trim)),

    Q("q_dedup_component_stats",
      // cluster-size histogram of the near-dup components — the dedup
      // audit a pipeline runs before committing a canonical keep
      (s, dir) => {
        val docs = Tables.load(s, dir)("documents")
        val pairs = operators.Dedup.minHashPairs(docs, threshold = 0.7)
        val st = operators.Dedup.componentStats(pairs)
        pairs.unpersist(false)
        st
      },
      Some("""
        WITH RECURSIVE n AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w FROM documents),
        s AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) END AS sh FROM n),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7),
        e AS (SELECT doc_a AS src, doc_b AS dst FROM p UNION SELECT doc_b, doc_a FROM p),
        reach(src, dst) AS (
          SELECT src, dst FROM e
          UNION
          SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src WHERE e2.dst <> r.src),
        comps AS (SELECT src AS doc_id, least(src, min(dst)) AS comp FROM reach GROUP BY src),
        sizes AS (SELECT comp, count(*) AS csize FROM comps GROUP BY comp)
        SELECT csize, count(*) AS n_clusters FROM sizes GROUP BY csize""".stripMargin.trim)),

    Q("q_dedup_keep",
      (s, dir) => {
        val docs = Tables.load(s, dir)("documents")
        val pairs = operators.Dedup.minHashPairs(docs, threshold = 0.7)
        val kept = operators.Dedup.keepCanonical(docs, pairs)
          .select(org.apache.spark.sql.functions.col("doc_id"))
        pairs.unpersist(false)
        kept
      },
      Some("""
        WITH RECURSIVE n AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w FROM documents),
        s AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) END AS sh FROM n),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7),
        e AS (SELECT doc_a AS src, doc_b AS dst FROM p UNION SELECT doc_b, doc_a FROM p),
        reach(src, dst) AS (
          SELECT src, dst FROM e
          UNION
          SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src WHERE e2.dst <> r.src)
        SELECT d.doc_id FROM documents d
        WHERE d.doc_id NOT IN (
          SELECT src FROM (SELECT src, least(src, min(dst)) AS comp FROM reach GROUP BY src)
          WHERE src <> comp)""".stripMargin.trim)),

    Q("q_dedup_keep_best",
      // quality-based canonical keep: each near-dup cluster keeps its
      // longest member (n_chars as the quality score), ties to lowest id —
      // what a production dedup actually does, vs keepCanonical's min-id
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val docs = Tables.load(s, dir)("documents")
        val pairs = operators.Dedup.minHashPairs(docs, threshold = 0.7)
        val kept = operators.Dedup.keepBest(docs, pairs, col("n_chars"))
          .select(col("doc_id"))
        pairs.unpersist(false)
        kept
      },
      Some("""
        WITH RECURSIVE n AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w FROM documents),
        s AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) END AS sh FROM n),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7),
        e AS (SELECT doc_a AS src, doc_b AS dst FROM p UNION SELECT doc_b, doc_a FROM p),
        reach(src, dst) AS (
          SELECT src, dst FROM e
          UNION
          SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src WHERE e2.dst <> r.src),
        comps AS (SELECT src AS doc_id, least(src, min(dst)) AS comp FROM reach GROUP BY src),
        scored AS (SELECT c.doc_id, c.comp, d.n_chars FROM comps c JOIN documents d USING (doc_id)),
        winners AS (SELECT comp, (list(doc_id ORDER BY n_chars DESC, doc_id ASC))[1] AS keep
                    FROM scored GROUP BY comp)
        SELECT d.doc_id FROM documents d
        WHERE d.doc_id NOT IN (
          SELECT sc.doc_id FROM scored sc JOIN winners w USING (comp)
          WHERE sc.doc_id <> w.keep)""".stripMargin.trim)),

    Q("q_vocab",
      // corpus vocabulary stats: top-50 tokens by occurrence count with
      // document frequency — tokenizer-training prep
      (s, dir) => operators.TextOps.vocab(
        Tables.load(s, dir)("documents"), k = 50),
      Some("""
        WITH t AS (
          SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
          FROM documents
        )
        SELECT token, count(*) AS cnt, count(DISTINCT doc_id) AS df
        FROM t WHERE length(token) > 0
        GROUP BY token ORDER BY cnt DESC, token LIMIT 50""".stripMargin.trim)),

    Q("q_fertility",
      // tokenizer fertility audit per source: tokens/word and chars/token
      // from the BPE-proxy count (any real tokenizer's size(token_ids)
      // drops into the same report) — the vocab-size / multilingual-
      // balance health table; the oracle replays counts and ratios
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val d = Tables.load(s, dir)("documents")
        operators.Bpe.fertilityReport(d,
          operators.TextOps.tokenCountBpe(col("text")),
          groupCols = Seq("source"))
      },
      Some("""
        WITH b AS (
          SELECT source,
            CAST(CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
              ELSE len(string_split_regex(trim(coalesce(text, '')), '\s+')) END AS BIGINT) AS w,
            CAST(CASE WHEN text IS NULL THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) +
                floor(length(regexp_replace(text, '\s+', '', 'g')) / 4) END AS BIGINT) AS t,
            CAST(length(regexp_replace(coalesce(text, ''), '\s', '', 'g')) AS BIGINT) AS c
          FROM documents)
        SELECT source, count(*) AS n_docs,
          CAST(sum(w) AS BIGINT) AS n_words, CAST(sum(t) AS BIGINT) AS n_tokens,
          CAST(sum(c) AS BIGINT) AS n_chars,
          round(sum(t)::DOUBLE / CASE WHEN sum(w) > 0 THEN sum(w) END, 6) AS tokens_per_word,
          round(sum(c)::DOUBLE / CASE WHEN sum(t) > 0 THEN sum(t) END, 6) AS chars_per_token
        FROM b GROUP BY source""".stripMargin.trim)),

    Q("q_tokenizer_ab",
      // BPE-vs-unigram selection table (Bpe.abReport): both tokenizers
      // run over the SAME planted four-word corpus — the q_train_pipeline
      // pinned 8-merge BPE table and the q_unigram_encode hand model —
      // so every per-word piece count is hand-derivable and the oracle is
      // closed-form in the doc_id%4 class counts. Unigram also reports
      // corpusNll (mean Viterbi NLL per word: database -1.5, basedata
      // -2, nation -4.5, zebra 5·-5, xq7 -5-5-30(unk)); merge-table BPE
      // has no probability model → NULL, by design
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val mm = pmod(col("doc_id"), lit(4))
        val txt = when(mm === 0, lit("database"))
          .when(mm === 1, lit("basedata nation"))
          .when(mm === 2, lit("zebra"))
          .otherwise(lit("xq7"))
        val d = Tables.load(s, dir)("documents")
          .select(col("doc_id"), txt.as("text"))
        val merges = Seq("e" -> "r", "e" -> "</w>", "n" -> "</w>",
          "er" -> "</w>", "o" -> "w", "ow" -> "</w>", "o" -> "r", "s" -> "t")
        val base = ('a' to 'z').map(c => c.toString -> -5.0)
        val uni = operators.Unigram.Model(
          (base ++ Seq("data" -> -1.0, "base" -> -1.0, "database" -> -1.5,
            "na" -> -2.5, "tion" -> -2.0)).map(_._1),
          (base ++ Seq("data" -> -1.0, "base" -> -1.0, "database" -> -1.5,
            "na" -> -2.5, "tion" -> -2.0)).map(_._2))
        val tokenized = operators.Unigram.tokenize(
          operators.Bpe.tokenize(d, merges, "text", "bpe_pieces"),
          uni, "text", "uni_pieces")
        operators.Bpe.abReport(tokenized, Seq(
          ("bpe", size(col("bpe_pieces")), None),
          ("unigram", size(col("uni_pieces")),
            Some(operators.Unigram.corpusNll(d, uni)))))
      },
      Some("""
        WITH k AS (
          SELECT count(*) FILTER (WHERE doc_id % 4 = 0) AS n0,
            count(*) FILTER (WHERE doc_id % 4 = 1) AS n1,
            count(*) FILTER (WHERE doc_id % 4 = 2) AS n2,
            count(*) FILTER (WHERE doc_id % 4 = 3) AS n3,
            count(*) AS nd
          FROM documents),
        v AS (
          SELECT 'bpe' AS tokenizer,
            8*n0 + 15*n1 + 6*n2 + 4*n3 AS t,
            CAST(NULL AS DOUBLE) AS nll, n0, n1, n2, n3, nd FROM k
          UNION ALL
          SELECT 'unigram',
            1*n0 + 4*n1 + 5*n2 + 3*n3,
            round((1.5*n0 + 6.5*n1 + 25*n2 + 40*n3)
              / (n0 + 2*n1 + n2 + n3), 6), n0, n1, n2, n3, nd FROM k)
        SELECT tokenizer, CAST(nd AS BIGINT) AS n_docs,
          CAST(n0 + 2*n1 + n2 + n3 AS BIGINT) AS n_words,
          CAST(t AS BIGINT) AS n_tokens,
          CAST(8*n0 + 14*n1 + 5*n2 + 3*n3 AS BIGINT) AS n_chars,
          round(t::DOUBLE / (n0 + 2*n1 + n2 + n3), 6) AS tokens_per_word,
          round((8*n0 + 14*n1 + 5*n2 + 3*n3)::DOUBLE / t, 6) AS chars_per_token,
          nll AS nll_per_word
        FROM v""".stripMargin.trim)),

    Q("q_lang_segments",
      // paragraph-level language segmentation over mixed-language synth
      // docs (a German and/or French paragraph appended to the English-ish
      // fixture text): per doc the char-weighted primary language, its
      // char fraction, and the distinct-language vote count — the
      // multilingual-pollution gate doc-level langId can't see; the
      // oracle replays the per-paragraph langId CASE and the argmax
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents").filter(col("doc_id") < 600)
        val de = "der die das und ist nicht mit der die das und ist nicht mit"
        val fr = "le la les et est dans pour le la les et est dans pour"
        val synth = d.select(col("doc_id"),
          when(pmod(col("doc_id"), lit(3)) === 0,
              concat_ws("\n\n", col("text"), lit(de)))
            .when(pmod(col("doc_id"), lit(3)) === 1,
              concat_ws("\n\n", col("text"), lit(de), lit(fr)))
            .otherwise(col("text")).as("text"))
        operators.TextOps.langSegments(synth)
      },
      Some("""
        WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 600),
        synth AS (SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN concat_ws(chr(10) || chr(10), text,
                'der die das und ist nicht mit der die das und ist nicht mit')
              WHEN doc_id % 3 = 1 THEN concat_ws(chr(10) || chr(10), text,
                'der die das und ist nicht mit der die das und ist nicht mit',
                'le la les et est dans pour le la les et est dans pour')
              ELSE text END AS text
          FROM d),
        p AS (SELECT doc_id, unnest(string_split(text, chr(10) || chr(10))) AS para FROM synth),
        v AS (SELECT doc_id, para, ' ' || lower(para) || ' ' AS padded,
                CAST(length(para) AS BIGINT) AS chars
              FROM p WHERE length(trim(para)) >= 20),
        h AS (SELECT doc_id, chars,
            len(regexp_extract_all(padded, ' (the|and|is|of|to|that|with) ')) AS en,
            len(regexp_extract_all(padded, ' (der|die|das|und|ist|nicht|mit) ')) AS de,
            len(regexp_extract_all(padded, ' (le|la|les|et|est|dans|pour) ')) AS fr,
            len(regexp_extract_all(padded, ' (el|los|las|es|en|que|por) ')) AS es,
            length(regexp_replace(para, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS zh,
            length(regexp_replace(para, '[^\x{0400}-\x{04ff}]', '', 'g')) AS ru,
            length(regexp_replace(para, '[^\x{0600}-\x{06ff}]', '', 'g')) AS ar,
            length(regexp_replace(para, '[^\x{ac00}-\x{d7af}]', '', 'g')) AS ko,
            length(regexp_replace(para, '[^\x{3040}-\x{30ff}]', '', 'g')) AS ja,
            length(regexp_replace(para, '[^\x{0900}-\x{097f}]', '', 'g')) AS hi
          FROM v),
        l AS (SELECT doc_id, chars,
            CASE WHEN greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) = 0 THEN 'und'
                 WHEN ja = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ja'
                 WHEN zh = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'zh'
                 WHEN ru = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ru'
                 WHEN ar = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ar'
                 WHEN ko = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'ko'
                 WHEN hi = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'hi'
                 WHEN en = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'en'
                 WHEN de = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'de'
                 WHEN fr = greatest(en, de, fr, es, zh, ru, ar, ko, ja, hi) THEN 'fr'
                 ELSE 'es' END AS lang
          FROM h),
        g AS (SELECT doc_id, lang, sum(chars) AS lc, count(*) AS np
              FROM l GROUP BY doc_id, lang),
        r AS (SELECT doc_id, lang, lc,
                row_number() OVER (PARTITION BY doc_id ORDER BY lc DESC, lang) AS rk,
                sum(lc) OVER (PARTITION BY doc_id) AS total,
                sum(np) OVER (PARTITION BY doc_id) AS n_paras,
                count(*) OVER (PARTITION BY doc_id) AS n_langs
              FROM g)
        SELECT s.doc_id,
          coalesce(r.lang, 'und') AS lang_primary,
          round(r.lc::DOUBLE / r.total, 6) AS primary_char_frac,
          CAST(coalesce(r.n_langs, 0) AS BIGINT) AS n_langs,
          CAST(coalesce(r.n_paras, 0) AS BIGINT) AS n_paras
        FROM synth s LEFT JOIN (SELECT * FROM r WHERE rk = 1) r USING (doc_id)""".stripMargin.trim)),

    Q("q_vocab_drift",
      // token-distribution drift between two deterministic snapshot
      // slices: top-30 vocab per side, full-outer join, per-snapshot
      // frequency shares and their raw-double shift
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        operators.TextOps.vocabDrift(
          d.filter(pmod(col("doc_id"), lit(3)) =!= 0),
          d.filter(pmod(col("doc_id"), lit(5)) =!= 0), k = 30)
      },
      Some("""
        WITH prevd AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
        nextd AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
        pv AS (SELECT token, count(*) AS cnt, count(DISTINCT doc_id) AS df FROM (
            SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token FROM prevd)
          WHERE length(token) > 0 GROUP BY token ORDER BY cnt DESC, token LIMIT 30),
        nv AS (SELECT token, count(*) AS cnt, count(DISTINCT doc_id) AS df FROM (
            SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token FROM nextd)
          WHERE length(token) > 0 GROUP BY token ORDER BY cnt DESC, token LIMIT 30),
        ps AS (SELECT token, cnt AS prev_cnt, df AS prev_df,
            cnt::DOUBLE / (SELECT CAST(sum(cnt) AS BIGINT) FROM pv) AS prev_frac FROM pv),
        ns AS (SELECT token, cnt AS next_cnt, df AS next_df,
            cnt::DOUBLE / (SELECT CAST(sum(cnt) AS BIGINT) FROM nv) AS next_frac FROM nv)
        SELECT coalesce(ps.token, ns.token) AS token,
          prev_cnt, prev_df, prev_frac, next_cnt, next_df, next_frac,
          coalesce(next_frac, 0) - coalesce(prev_frac, 0) AS frac_shift
        FROM ps FULL OUTER JOIN ns ON ps.token = ns.token""".stripMargin.trim)),

    Q("q_heavy_hitters",
      // bounded-memory Space-Saving top-k over the token stream: with
      // capacity >= the fixture's key space the sketch is EXACT (err = 0),
      // so the plain GROUP BY oracle pins the whole aggregator path
      // (per-partition summaries, mergeable-summaries combine, final sort)
      (s, dir) => {
        val docs = Tables.load(s, dir)("documents")
        val toks = docs.select(org.apache.spark.sql.functions.explode(
            org.apache.spark.sql.functions.split(
              operators.TextOps.normalize(org.apache.spark.sql.functions.col("text")), " ")).as("token"))
          .filter(org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("token")) > 0)
        operators.Sketches.heavyHitters(toks, org.apache.spark.sql.functions.col("token"),
          k = 30, capacity = 100000)
      },
      Some("""
        WITH t AS (
          SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
          FROM documents
        )
        SELECT token AS key, count(*) AS est, CAST(0 AS BIGINT) AS err
        FROM t WHERE length(token) > 0
        GROUP BY token ORDER BY est DESC, key LIMIT 30""".stripMargin.trim)),

    Q("q_distinct_by_group",
      // one-pass per-source distinct-token cardinalities plus the merged
      // whole-corpus roll-up (hll_union_agg over the per-group sketches —
      // never a second scan). At fixture cardinality the DataSketches HLL
      // is still in exact coupon mode, so the exact-COUNT(DISTINCT) oracle
      // pins the sketch path end-to-end
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir)("documents")
        val toks = docs.select(col("source"),
            explode(split(operators.TextOps.normalize(col("text")), " ")).as("token"))
          .filter(length(col("token")) > 0)
        operators.Sketches.distinctByGroup(toks, col("source"), col("token"))
          .withColumnRenamed("group", "source")
      },
      Some("""
        WITH t AS (
          SELECT source, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
          FROM documents
        ), g AS (
          SELECT source, count(DISTINCT token) AS n_distinct
          FROM t WHERE length(token) > 0 GROUP BY source
        )
        SELECT * FROM g
        UNION ALL
        SELECT '__total__' AS source, count(DISTINCT token) AS n_distinct
        FROM t WHERE length(token) > 0""".stripMargin.trim)),

    Q("q_corpus_overlap",
      // sketch-mode corpus overlap audit (the 100 TB path: one HLL pass
      // per side, union + inclusion-exclusion, NO join anywhere): two
      // overlapping doc slices keyed by normalized text. The slices are
      // bounded on BOTH ends (< 300 / [200, 500)) so each side stays
      // ≤ 300 distinct keys — far inside the DataSketches HLL's exact
      // coupon range at ANY fixture SF (sf0.1's 5000 docs would push an
      // unbounded side past coupon promotion and make this exact oracle
      // fail spuriously); the exact FULL-JOIN oracle therefore pins the
      // sketch path end-to-end at every scale Verify runs
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir)("documents")
        val key = operators.TextOps.normalize(col("text"))
        operators.Sketches.corpusOverlap(
          docs.where(col("doc_id") < 300),
          docs.where(col("doc_id") >= 200 && col("doc_id") < 500),
          key, key)
      },
      Some("""
        WITH a AS (
          SELECT DISTINCT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS k
          FROM documents WHERE doc_id < 300 AND text IS NOT NULL
        ), b AS (
          SELECT DISTINCT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS k
          FROM documents WHERE doc_id >= 200 AND doc_id < 500 AND text IS NOT NULL
        ), u AS (
          SELECT (a.k IS NOT NULL) AS ia, (b.k IS NOT NULL) AS ib
          FROM a FULL OUTER JOIN b ON a.k = b.k
        ), m AS (
          SELECT CAST(count(*) FILTER (WHERE ia) AS BIGINT) AS n_a,
            CAST(count(*) FILTER (WHERE ib) AS BIGINT) AS n_b,
            CAST(count(*) AS BIGINT) AS n_union,
            CAST(count(*) FILTER (WHERE ia AND ib) AS BIGINT) AS n_intersect
          FROM u
        )
        SELECT n_a, n_b, n_union, n_intersect,
          CASE WHEN n_union > 0
            THEN round(n_intersect::DOUBLE / n_union, 6) ELSE 0.0 END AS jaccard,
          CASE WHEN n_a > 0
            THEN round(n_intersect::DOUBLE / n_a, 6) ELSE 0.0 END AS containment_a,
          CASE WHEN n_b > 0
            THEN round(n_intersect::DOUBLE / n_b, 6) ELSE 0.0 END AS containment_b
        FROM m""".stripMargin.trim)),

    Q("q_join_asof",
      // as-of enrichment: every click carries the user's latest
      // preceding purchase value (null when none) — union + one
      // partitioned window, never a theta join
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.load(s, dir)("events")
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts", "value")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
        operators.Joins.asof(clicks, purchases, Seq("user_id"),
            valueCols = Seq("purchase_value"))
          .select("event_id", "user_id", "value", "purchase_value")
      },
      Some("""
        WITH l AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        r AS (SELECT user_id, ts, value AS purchase_value FROM events WHERE event_type = 'purchase')
        SELECT l.event_id, l.user_id, l.value, r.purchase_value
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin.trim)),

    Q("q_join_asof_tol",
      // as-of with a staleness tolerance (merge-asof semantics): the match
      // is still the latest preceding purchase, but one older than 6h is
      // too stale to carry — the oracle nulls it the same way
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.load(s, dir)("events")
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts", "value")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
        operators.Joins.asof(clicks, purchases, Seq("user_id"),
            valueCols = Seq("purchase_value"), toleranceSec = 21600)
          .select("event_id", "user_id", "value", "purchase_value")
      },
      Some("""
        WITH l AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        r AS (SELECT user_id, ts, value AS purchase_value FROM events WHERE event_type = 'purchase')
        SELECT l.event_id, l.user_id, l.value,
          CASE WHEN epoch(l.ts) - epoch(r.ts) <= 21600 THEN r.purchase_value END AS purchase_value
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin.trim)),

    Q("q_join_asof_fwd",
      // forward as-of (next-event lookahead): every click carries the
      // user's EARLIEST following purchase — same union+window shape over
      // reversed time; DuckDB's native ASOF with l.ts <= r.ts is the
      // oracle
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.load(s, dir)("events")
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts", "value")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
        operators.Joins.asof(clicks, purchases, Seq("user_id"),
            valueCols = Seq("purchase_value"), direction = "forward")
          .select("event_id", "user_id", "value", "purchase_value")
      },
      Some("""
        WITH l AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        r AS (SELECT user_id, ts, value AS purchase_value FROM events WHERE event_type = 'purchase')
        SELECT l.event_id, l.user_id, l.value, r.purchase_value
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts""".stripMargin.trim)),

    Q("q_event_paths",
      // most-common event paths: 30-minute-gap sessions, first 4 event
      // types per session in (ts, event_id) order, top-25 paths with
      // session and distinct-user counts — the oracle replays
      // sessionization, step ranking and the path census verbatim
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.load(s, dir)("events")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("t"), col("event_type"))
        operators.Events.topPaths(ev, Seq("user_id"), "t", "event_type",
          gap = 1800000000L, tiebreak = "event_id", maxSteps = 4, k = 25)
      },
      Some("""
        WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t, event_type FROM events),
        s AS (SELECT *, CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                 OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > 1800000000
               THEN 1 ELSE 0 END AS ns FROM e),
        s2 AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_seq FROM s),
        r AS (SELECT *, row_number() OVER (PARTITION BY user_id, session_seq
                 ORDER BY t, event_id) AS step FROM s2),
        p AS (SELECT user_id, session_seq,
                array_to_string(list(event_type ORDER BY step), '>') AS path
              FROM r WHERE step <= 4 GROUP BY user_id, session_seq)
        SELECT path, count(*) AS n_sessions,
          count(DISTINCT user_id) AS n_keys
        FROM p GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT 25""".stripMargin.trim)),

    Q("q_sessionize",
      // row-level gap sessionization: 30-minute gap per user, every event
      // tagged with its session index
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.load(s, dir)("events")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("t"))
        operators.Events.sessionize(ev, Seq("user_id"), "t",
            gap = 1800000000L, tiebreak = "event_id")
          .select("event_id", "user_id", "session_seq")
      },
      Some("""
        WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events),
        s AS (
          SELECT event_id, user_id, t,
            CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000000
              THEN 1 ELSE 0 END AS ns
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
        )
        SELECT event_id, user_id,
          CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM s""".stripMargin.trim)),

    Q("q_funnel",
      // ordered conversion funnel view→click→purchase: earliest strictly
      // increasing completion chain per user; oracle replays the min-after
      // fixpoint as chained min-aggregations
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.load(s, dir)("events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("t"))
        operators.Events.funnel(ev, "user_id", "event_type", "t",
          Seq("view", "click", "purchase"))
      },
      Some("""
        WITH d AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events
                   WHERE event_type IN ('view', 'click', 'purchase')),
        k AS (SELECT DISTINCT user_id FROM d),
        s1 AS (SELECT user_id, min(t) AS step_1 FROM d WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT d.user_id, min(d.t) AS step_2 FROM d JOIN s1 USING (user_id)
               WHERE d.event_type = 'click' AND d.t > s1.step_1 GROUP BY d.user_id),
        s3 AS (SELECT d.user_id, min(d.t) AS step_3 FROM d JOIN s2 USING (user_id)
               WHERE d.event_type = 'purchase' AND d.t > s2.step_2 GROUP BY d.user_id)
        SELECT k.user_id, s1.step_1, s2.step_2, s3.step_3,
          CAST(CASE WHEN s1.user_id IS NULL THEN 0 WHEN s2.user_id IS NULL THEN 1
               WHEN s3.user_id IS NULL THEN 2 ELSE 3 END AS INTEGER) AS steps_completed
        FROM k LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)""".stripMargin.trim)),

    Q("q_retention",
      // daily cohort retention: first-active day per user, distinct active
      // users per (cohort day, day offset)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.load(s, dir)("events")
          .select(col("user_id"), unix_micros(col("ts")).as("t"))
        operators.Events.retention(ev, "user_id", "t", period = 86400000000L)
      },
      Some("""
        WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS p FROM events),
        f AS (SELECT user_id, min(p) AS cohort FROM d GROUP BY user_id)
        SELECT f.cohort, d.p - f.cohort AS offset, count(DISTINCT d.user_id) AS active
        FROM d JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin.trim)),

    Q("q_join_range",
      // interval enrichment: clicks inside the hour after any purchase of
      // the same user — bucketized equi-join, never a per-key nested loop
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.load(s, dir)("events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("cts"),
            col("event_id").as("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("pstart"),
            (unix_micros(col("ts")) + lit(3600000000L)).as("pend"),
            col("event_id").as("purchase_id"))
        operators.Joins.range(clicks, purchases, Seq("user_id"),
            "cts", "pstart", "pend", bucketWidth = 3600000000L)
          .select("click_id", "purchase_id", "user_id")
      },
      Some("""
        WITH l AS (SELECT user_id, epoch_us(ts) AS cts, event_id AS click_id FROM events WHERE event_type = 'click'),
        r AS (SELECT user_id, epoch_us(ts) AS pstart, epoch_us(ts) + 3600000000 AS pend, event_id AS purchase_id FROM events WHERE event_type = 'purchase')
        SELECT l.click_id, r.purchase_id, l.user_id
        FROM l JOIN r ON l.user_id = r.user_id AND l.cts BETWEEN r.pstart AND r.pend""".stripMargin.trim)),

    Q("q_vocab_bigrams",
      // corpus bigram stats: top-50 word bigrams by occurrence with
      // document frequency — phrase/bigram-LM prep (non-distinct counting)
      (s, dir) => operators.TextOps.vocabNgrams(
        Tables.load(s, dir)("documents"), n = 2, k = 50),
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
          FROM documents
        ), g AS (
          SELECT doc_id, unnest([array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]) AS gram
          FROM t WHERE len(w) >= 2
        )
        SELECT gram, count(*) AS cnt, count(DISTINCT doc_id) AS df
        FROM g WHERE length(gram) > 0
        GROUP BY gram ORDER BY cnt DESC, gram LIMIT 50""".stripMargin.trim)),

    Q("q_lm_ce",
      // CCNet-style unigram cross-entropy: LM trained on the corpus
      // itself with a tight vocab (top-200) so the OOV floor path is
      // exercised; per-doc mean negative log-prob
      (s, dir) => {
        val docs = Tables.load(s, dir)("documents")
        operators.TextOps.crossEntropy(docs, docs, vocabK = 200)
      },
      Some("""
        WITH t AS (
          SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
          FROM documents
        ), tt AS (SELECT * FROM t WHERE length(token) > 0),
        n AS (SELECT count(*)::DOUBLE AS total FROM tt),
        lm AS (
          SELECT token, count(*) AS cnt FROM tt GROUP BY token
          ORDER BY cnt DESC, token LIMIT 200
        ), lp AS (SELECT token, ln((cnt + 1) / (total + 200 + 1)) AS logp FROM lm, n),
        sc AS (
          SELECT tt.doc_id, coalesce(lp.logp, ln(1 / (n.total + 200 + 1))) AS lp
          FROM tt LEFT JOIN lp USING (token), n
        )
        SELECT doc_id, count(*) AS tokens, round(-avg(lp), 6) AS ce
        FROM sc GROUP BY doc_id""".stripMargin.trim)),

    Q("q_shard",
      // deterministic training-shard assignment: 16 shards by id hash,
      // dense hash-order position within each shard
      (s, dir) => operators.Packing.shardForTraining(
          Tables.load(s, dir)("documents"), shards = 16)
        .select("doc_id", "shard", "shard_pos"),
      Some("""
        WITH t AS (
          SELECT doc_id, ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
          FROM documents
        )
        SELECT doc_id, CAST(h % 16 AS INT) AS shard,
          row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) - 1 AS shard_pos
        FROM t""".stripMargin.trim)),

    Q("q_zorder",
      // multi-column Z-order clustering key on (l_partkey, l_suppkey),
      // 8 bits/dim: exact long rescaling + bit interleave, replayed in
      // the oracle with the same integer arithmetic (bit term list is
      // generated below — zorderOracleSql)
      (s, dir) => operators.Packing.zorderKey(
          Tables.load(s, dir)("lineitem"), Seq("l_partkey", "l_suppkey"),
          bits = 8)
        .select("l_orderkey", "l_linenumber", "zkey"),
      Some(zorderOracleSql)),

    Q("q_shard_manifest",
      // per-shard audit manifest: doc/token/char totals, id range and an
      // order-insensitive membership checksum per training shard
      (s, dir) => operators.Packing.shardManifest(
        Tables.load(s, dir)("documents"), shards = 16),
      Some("""
        WITH t AS (
          SELECT doc_id, text, ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
          FROM documents
        )
        SELECT CAST(h % 16 AS INT) AS shard, count(*) AS n_docs,
          CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS n_tokens,
          CAST(sum(length(text)) AS BIGINT) AS n_chars,
          min(doc_id) AS min_id, max(doc_id) AS max_id,
          CAST(sum(h % 1000003) AS BIGINT) AS fingerprint
        FROM t GROUP BY 1""".stripMargin.trim)),

    Q("q_dedup_lines",
      // corpus-frequency boilerplate line removal: the fixture has no
      // newlines, so the query plants a per-doc id line + two shared
      // footer lines; the footers exceed maxDf and must vanish from every
      // doc while the order of surviving lines is preserved
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
          .withColumn("text", concat(
            lit("doc "), col("doc_id"), lit("\n"),
            lit("Follow us on social media!\n"),
            col("text"),
            when(pmod(col("doc_id"), lit(2)) === 0, lit("\nCookie notice"))
              .otherwise(lit(""))))
        operators.Dedup.dropCommonLines(d, maxDf = 30)
      },
      Some("""
        WITH src AS (
          SELECT doc_id, concat('doc ', doc_id::VARCHAR, chr(10),
            'Follow us on social media!', chr(10), text,
            CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'Cookie notice' ELSE '' END) AS t
          FROM documents
        ), l AS (
          SELECT doc_id, u.line, u.pos
          FROM src, LATERAL (SELECT unnest(string_split(t, chr(10))) AS line,
            generate_subscripts(string_split(t, chr(10)), 1) AS pos) u
        ), hot AS (
          SELECT line FROM l GROUP BY line HAVING count(DISTINCT doc_id) > 30
        )
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        FROM l WHERE line NOT IN (SELECT line FROM hot)
        GROUP BY doc_id""".stripMargin.trim)),

    Q("q_dedup_lines_within",
      // intra-doc repeated-line removal: the fixture has no newlines, so
      // the query plants a repeated header, blank separators, and a
      // duplicated body-prefix line; the repeats vanish, first
      // occurrences and blanks survive in order
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
          .withColumn("text", concat(
            lit("header\n\n"), col("text"), lit("\nheader\n\n"),
            substring(col("text"), 1, 30), lit("\n"),
            substring(col("text"), 1, 30)))
        operators.Dedup.dropRepeatedLines(d).select("doc_id", "text")
      },
      Some("""
        WITH src AS (
          SELECT doc_id, 'header' || chr(10) || chr(10) || text || chr(10) ||
            'header' || chr(10) || chr(10) || substr(text, 1, 30) || chr(10) ||
            substr(text, 1, 30) AS t
          FROM documents
        ), l AS (
          SELECT doc_id, u.line, u.pos
          FROM src, LATERAL (SELECT unnest(string_split(t, chr(10))) AS line,
            generate_subscripts(string_split(t, chr(10)), 1) AS pos) u
        ), f AS (
          SELECT doc_id, line, pos,
            min(pos) OVER (PARTITION BY doc_id, line) AS fp
          FROM l
        )
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        FROM f WHERE len(line) < 1 OR pos = fp
        GROUP BY doc_id""".stripMargin.trim)),

    Q("q_chunk",
      // fixed-token-budget chunking with overlap (20-word windows, 4-word
      // overlap → ~4 chunks per ~54-word fixture doc); chunk_id dense per
      // doc, trailing chunk carries the short remainder
      (s, dir) => operators.TextOps.chunkDocs(
        Tables.load(s, dir)("documents"), maxTokens = 20, overlap = 4),
      Some("""
        WITH w AS (
          SELECT doc_id,
            string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS ws
          FROM documents
        ), c AS (
          SELECT doc_id, ws, len(ws) AS n,
            CASE WHEN len(ws) <= 20 THEN 1
                 ELSE CAST(ceil((len(ws) - 4) / 16.0) AS INT) END AS nc
          FROM w
        )
        SELECT doc_id, CAST(u.i AS INT) AS chunk_id,
          array_to_string(ws[(u.i*16+1):(u.i*16+20)], ' ') AS chunk,
          CAST(least(20, n - u.i*16) AS INT) AS n_tokens
        FROM c, LATERAL (SELECT unnest(range(0, nc)) AS i) u""".stripMargin.trim)),

    Q("q_clf_score",
      // trained-LR quality classifier applied at scan speed: logistic over
      // analyze()'s (rounded) feature columns with fixed example weights;
      // the oracle replays feature extraction + the same ordered weighted
      // sum, so fp addition order matches
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        operators.TextOps.scoreLinear(
          operators.TextOps.analyze(Tables.load(s, dir)("documents")),
          Seq(col("token_count") -> 0.02,
            col("alpha_ratio") -> 3.0,
            col("punct_ratio") -> -4.0),
          bias = -1.5)
          .select("doc_id", "clf_score")
      },
      Some("""
        WITH b AS (
          SELECT doc_id,
            CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS token_count,
            length(text) AS n,
            length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS npunct,
            length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS nalpha
          FROM documents
        ), r AS (
          SELECT doc_id, token_count,
            round(CASE WHEN n = 0 THEN 0 ELSE npunct::DOUBLE / n END, 6) AS punct_ratio,
            round(CASE WHEN n = 0 THEN 0 ELSE nalpha::DOUBLE / n END, 6) AS alpha_ratio
          FROM b
        )
        SELECT doc_id,
          round(1.0 / (1.0 + exp(-(((-1.5 + token_count * 0.02) + alpha_ratio * 3.0)
            + punct_ratio * -4.0))), 6) AS clf_score
        FROM r""".stripMargin.trim)),

    Q("q_fit_linear",
      // the TRAINING half of the classifier story: one-pass distributed
      // normal-equations OLS (token_count ~ text length + vowel count);
      // the oracle solves the identical 3×3 system by Cramer's rule over
      // the same DuckDB-computed moments — both engines see the system in
      // exact real arithmetic, so 4dp rounding absorbs fp summation order
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, length, regexp_replace}
        val d = Tables.load(s, dir)("documents")
        operators.Fit.fitLinearDf(d,
          Seq(length(col("text")),
            length(regexp_replace(col("text"), "[^aeiou]", ""))),
          operators.TextOps.tokenCount(col("text")))
      },
      Some("""
        WITH f AS (
          SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS y,
            CAST(length(text) AS DOUBLE) AS x1,
            CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS DOUBLE) AS x2
          FROM documents
        ), m AS (
          SELECT count(*)::DOUBLE AS n, sum(x1) AS s1, sum(x2) AS s2,
            sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
            sum(y) AS sy, sum(x1*y) AS s1y, sum(x2*y) AS s2y
          FROM f)
        SELECT
          round((sy*(s11*s22-s12*s12) - s1*(s1y*s22-s12*s2y) + s2*(s1y*s12-s11*s2y)) /
                ( n*(s11*s22-s12*s12) - s1*(s1 *s22-s12*s2 ) + s2*(s1 *s12-s11*s2 )), 4) AS bias,
          round(( n*(s1y*s22-s2y*s12) - sy*(s1*s22-s12*s2) + s2*(s1*s2y-s1y*s2)) /
                ( n*(s11*s22-s12*s12) - s1*(s1*s22-s12*s2) + s2*(s1*s12-s11*s2)), 4) AS w_1,
          round(( n*(s11*s2y-s12*s1y) - s1*(s1*s2y-s2*s1y) + sy*(s1*s12-s11*s2)) /
                ( n*(s11*s22-s12*s12) - s1*(s1*s22-s12*s2) + s2*(s1*s12-s11*s2)), 4) AS w_2
        FROM m""".stripMargin.trim)),

    // --- LLM-pipeline operators: URL / domain hygiene ---------------------
    // (documents carry no URL column; a deterministic one is synthesized
    // from (source, doc_id) identically on both sides. The oracle derives
    // the expected parts directly from the construction CASEs — an
    // independent derivation, not a replay of the regex parser.)
    Q("q_url_parts",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents").withColumn("url",
          concat(lit("https://"),
            when(pmod(col("doc_id"), lit(5)) === 0, lit("www.")).otherwise(lit("")),
            col("source"),
            when(pmod(col("doc_id"), lit(4)) === 0, lit(".co.uk")).otherwise(lit(".com")),
            lit("/a/b/"), col("doc_id").cast("string"),
            when(pmod(col("doc_id"), lit(3)) === 0, lit("?ref=1")).otherwise(lit(""))))
        operators.WebOps.urlParts(d)
          .select("doc_id", "host", "registered_domain", "tld", "path_depth",
            "has_query")
      },
      Some("""
        SELECT doc_id,
          (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END) || source ||
            (CASE WHEN doc_id % 4 = 0 THEN '.co.uk' ELSE '.com' END) AS host,
          source || (CASE WHEN doc_id % 4 = 0 THEN '.co.uk' ELSE '.com' END)
            AS registered_domain,
          CASE WHEN doc_id % 4 = 0 THEN 'uk' ELSE 'com' END AS tld,
          CAST(3 AS INTEGER) AS path_depth,
          doc_id % 3 = 0 AS has_query
        FROM documents""".stripMargin.trim)),

    Q("q_domain_block",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import s.implicits._
        val d = Tables.load(s, dir)("documents").withColumn("url",
          concat(lit("https://"),
            when(pmod(col("doc_id"), lit(5)) === 0, lit("www.")).otherwise(lit("")),
            col("source"),
            when(pmod(col("doc_id"), lit(4)) === 0, lit(".co.uk")).otherwise(lit(".com")),
            lit("/a/b/"), col("doc_id").cast("string")))
        val blocked = Seq("src3.com", "src7.co.uk", "src11.com").toDF("domain")
        operators.WebOps.filterBlockedDomains(d, blocked).select("doc_id")
      },
      Some("SELECT doc_id FROM documents WHERE source || " +
        "(CASE WHEN doc_id % 4 = 0 THEN '.co.uk' ELSE '.com' END) " +
        "NOT IN ('src3.com', 'src7.co.uk', 'src11.com')")),

    Q("q_domain_stats",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents").withColumn("url",
          concat(lit("https://"),
            when(pmod(col("doc_id"), lit(5)) === 0, lit("www.")).otherwise(lit("")),
            col("source"), lit(".com/a/"), col("doc_id").cast("string")))
        operators.WebOps.domainStats(d)
      },
      Some("""
        SELECT source || '.com' AS registered_domain, count(*) AS n_docs,
          CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
            AS total_tokens,
          round(count(*)::DOUBLE / sum(count(*)) OVER (), 6) AS doc_share
        FROM documents GROUP BY 1""".stripMargin.trim)),

    Q("q_html_extract",
      // HTML → text extraction: markup is synthesized deterministically
      // around the fixture text (same construction on both sides — title,
      // style block, comment, conditional script, entity-bearing footer,
      // anchor), then HtmlOps.htmlStats extracts visible text, title, tag
      // and anchor counts, and link density. The oracle replays the
      // documented RE2-portable chain in DuckDB (precedent: the ANN LSH
      // oracle replays the operator's construction).
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents").withColumn("html",
          concat(
            lit("<html><head><title> Doc "), col("doc_id").cast("string"),
            lit(" &amp; Co </title><style>p { color: red }</style></head>"),
            lit("<body><!-- nav\nbar --><p>"), col("text"), lit("</p>"),
            when(pmod(col("doc_id"), lit(3)) === 0,
              lit("<script type=\"text/javascript\">var x = \"<p>not text</p>\";</script>"))
              .otherwise(lit("")),
            lit("<div class=\"f\">Footer &lt;nav&gt;</div><p><a href=\"/x\">click "),
            col("doc_id").cast("string"),
            lit("</a>&nbsp;<b>more</b></p></body></html>")))
        operators.HtmlOps.htmlStats(d)
          .select("doc_id", "text_extracted", "title", "n_tags", "n_anchors",
            "link_density")
      },
      Some("""
        WITH h AS (
          SELECT doc_id,
            '<html><head><title> Doc ' || doc_id || ' &amp; Co </title>' ||
            '<style>p { color: red }</style></head>' ||
            '<body><!-- nav' || chr(10) || 'bar --><p>' || text || '</p>' ||
            (CASE WHEN doc_id % 3 = 0
              THEN '<script type="text/javascript">var x = "<p>not text</p>";</script>'
              ELSE '' END) ||
            '<div class="f">Footer &lt;nav&gt;</div><p><a href="/x">click ' ||
            doc_id || '</a>&nbsp;<b>more</b></p></body></html>' AS html
          FROM documents),
        t AS (
          SELECT doc_id, html,
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
              '(?s)<!--.*?-->', ' ', 'g'),
              '(?is)<script.*?</script>', ' ', 'g'),
              '(?is)<style.*?</style>', ' ', 'g'),
              '(?is)<(?:script|style).*', ' ', 'g'),
              '(?i)</?(?:p|div|h[1-6]|li|ul|ol|tr|table|blockquote|pre|section|article|header|footer|title|head|body|html)[^>]*>', chr(10), 'g'),
              '(?i)<br[^>]*>', chr(10), 'g') AS s1
          FROM h),
        u AS (
          SELECT doc_id, html,
            replace(replace(replace(replace(replace(replace(replace(
              regexp_replace(s1, '(?s)<[^>]*>', '', 'g'),
              '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
              '&#39;', chr(39)), '&apos;', chr(39)), '&nbsp;', ' '),
              '&amp;', '&') AS s2
          FROM t),
        v AS (
          SELECT doc_id, html,
            trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(s2,
              '[ \t\r\f]+', ' ', 'g'),
              ' ?\n ?', chr(10), 'g'),
              '\n+', chr(10), 'g'),
              '^\n+|\n+$', '', 'g')) AS text_extracted
          FROM u)
        SELECT v.doc_id, v.text_extracted,
          trim(regexp_replace(
            replace(replace(replace(replace(replace(replace(replace(
              regexp_extract(v.html, '(?is)<title[^>]*>(.*?)</title>', 1),
              '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
              '&#39;', chr(39)), '&apos;', chr(39)), '&nbsp;', ' '),
              '&amp;', '&'),
            '[ \t\n\r\f]+', ' ', 'g')) AS title,
          CAST(len(regexp_extract_all(v.html, '(?s)</?[a-zA-Z][^>]*>')) AS INTEGER)
            AS n_tags,
          CAST(len(regexp_extract_all(v.html, '(?is)<a[^>]*>(.*?)</a>', 1)) AS INTEGER)
            AS n_anchors,
          round(CAST(coalesce(list_sum(list_transform(
              regexp_extract_all(v.html, '(?is)<a[^>]*>(.*?)</a>', 1),
              x -> length(trim(regexp_replace(
                replace(replace(replace(replace(replace(replace(replace(
                  regexp_replace(x, '(?s)<[^>]*>', '', 'g'),
                  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                  '&#39;', chr(39)), '&apos;', chr(39)), '&nbsp;', ' '),
                  '&amp;', '&'),
                '[ \t\n\r\f]+', ' ', 'g'))))), 0) AS DOUBLE)
            / nullif(length(v.text_extracted), 0), 6) AS link_density
        FROM v""".stripMargin.trim)),

    Q("q_blocklist_filter",
      // C4 "bad words" page filter: distinct-blocklist-hit count with the
      // C4 word definition ([a-z0-9'] runs), threshold keep. "slow"/"dup"
      // occur naturally in the fixture corpus, so both branches are
      // exercised without injection.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        operators.TextOps.filterBlockedWords(d, Seq("slow", "dup"), maxHits = 1)
          .withColumn("n_blocked",
            operators.TextOps.blocklistHits(col("text"), Seq("slow", "dup")))
          .select("doc_id", "n_blocked")
      },
      Some("""
        WITH h AS (
          SELECT doc_id,
            CAST(len(list_intersect(
              string_split_regex(lower(text), '[^a-z0-9'']+'),
              ['slow', 'dup'])) AS INTEGER) AS n_blocked
          FROM documents)
        SELECT doc_id, n_blocked FROM h WHERE n_blocked <= 1""".stripMargin.trim)),

    Q("q_blocklist_phrases",
      // multi-word phrase blocklist: whitespace-normalized lowercase
      // containment; "batch batch" and "slow small" occur naturally in
      // the fixture corpus.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        d.select(col("doc_id"),
          operators.TextOps.blocklistPhraseHits(col("text"),
            Seq("batch batch", "slow small")).as("n_phrases"))
      },
      Some("""
        SELECT doc_id,
          CAST(len(list_filter(['batch batch', 'slow small'],
            p -> contains(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g'), p)))
            AS INTEGER) AS n_phrases
        FROM documents""".stripMargin.trim)),

    Q("q_graph_degrees",
      // same synthesized host graph as q_pagerank; out/in degree audit
      // with sources and sinks visible via the outer join.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val e = Tables.load(s, dir)("documents").select(
          concat(lit("h"), pmod(col("doc_id"), lit(13)).cast("string")).as("src"),
          concat(lit("h"), pmod(col("doc_id"), lit(17)).cast("string")).as("dst"))
          .distinct()
        operators.Graphs.degreeStats(e)
      },
      Some("""
        WITH e AS (SELECT DISTINCT 'h' || (doc_id % 13) AS src,
                     'h' || (doc_id % 17) AS dst FROM documents),
        o AS (SELECT src AS node, count(*) AS out_deg FROM e GROUP BY src),
        i AS (SELECT dst AS node, count(*) AS in_deg FROM e GROUP BY dst)
        SELECT coalesce(o.node, i.node) AS node,
          coalesce(o.out_deg, 0) AS out_deg,
          coalesce(i.in_deg, 0) AS in_deg
        FROM o FULL OUTER JOIN i ON o.node = i.node""".stripMargin.trim)),

    Q("q_split_sentences",
      // sentence segmentation: terminators injected by construction (the
      // fixture text has none); the oracle replays the normalize → extract
      // → trim → filter chain with DuckDB's positionally-zipped unnests.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents").withColumn("text2",
          concat(lit("Intro. "), col("text"), lit(" End! Fin? Tail")))
        operators.TextOps.splitSentences(d, "text2")
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
            list_filter(list_transform(
              regexp_extract_all(
                regexp_replace('Intro. ' || text || ' End! Fin? Tail',
                  '[ \t\n\r\f]+', ' ', 'g'),
                '[^.!?]+[.!?]*'),
              x -> trim(x)), x -> x <> '') AS ss
          FROM documents)
        SELECT doc_id,
          CAST(unnest(range(len(ss))) AS INTEGER) AS sent_pos,
          unnest(ss) AS sentence
        FROM t""".stripMargin.trim)),

    Q("q_hashed_features",
      // fastText-style hashed bigram bag (dim=16): the oracle recomputes
      // every gram's md5 bucket and the per-bucket counts in SQL — the
      // same vocabulary-free featurization both engines must agree on for
      // fit-time and scoring-time parity. Output is posexploded to scalar
      // (doc_id, bucket, cnt) rows so the driver's pandas canonicalization
      // can lexsort it (array-valued columns crash its hasher, r7 red row).
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        d.select(col("doc_id"),
          operators.TextOps.hashedNgramFeatures(col("text"), dim = 16).as("features"))
          .select(col("doc_id"),
            posexplode(col("features")).as(Seq("bucket", "cnt")))
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
          FROM documents),
        g AS (
          SELECT doc_id,
            CASE WHEN len(w) >= 2
              THEN [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
              ELSE [] END AS grams
          FROM t)
        SELECT doc_id,
          CAST(unnest(range(0, 16)) AS INTEGER) AS bucket,
          unnest(list_transform(range(0, 16), b -> CAST(len(list_filter(grams,
            x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 16 = b)) AS INTEGER)))
            AS cnt
        FROM g""".stripMargin.trim)),

    Q("q_line_flags",
      // FineWeb line-shape signals: a 4-line document is built around the
      // fixture text (prose line with terminal punct / the raw text / a
      // short listing line / another punct line); the oracle replays the
      // strip → filter → fraction chain.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents").withColumn("text2",
          concat_ws("\n", lit("Good sentence one."), col("text"),
            lit("  short \r"), lit("Another fine line!")))
        operators.TextOps.lineFlags(d, "text2")
          .select("doc_id", "punct_line_frac", "short_line_frac",
            "flag_line_punct", "flag_short_lines")
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
            list_filter(list_transform(
              string_split('Good sentence one.' || chr(10) || text || chr(10) ||
                '  short ' || chr(13) || chr(10) || 'Another fine line!', chr(10)),
              l -> regexp_replace(l, '^[ \t\r]+|[ \t\r]+$', '', 'g')),
              l -> l <> '') AS lines
          FROM documents),
        f AS (
          SELECT doc_id, len(lines) AS n,
            len(list_filter(lines, l -> regexp_matches(l, '[.!?"'']$'))) AS np,
            len(list_filter(lines, l -> length(l) < 30)) AS ns
          FROM t)
        SELECT doc_id,
          round(CASE WHEN n = 0 THEN 0 ELSE np::DOUBLE / n END, 6) AS punct_line_frac,
          round(CASE WHEN n = 0 THEN 1 ELSE ns::DOUBLE / n END, 6) AS short_line_frac,
          (CASE WHEN n = 0 THEN 0 ELSE np::DOUBLE / n END) >= 0.12 AS flag_line_punct,
          (CASE WHEN n = 0 THEN 1 ELSE ns::DOUBLE / n END) <= 0.67 AS flag_short_lines
        FROM f""".stripMargin.trim)),

    Q("q_join_salted",
      // skew-salted join must be result-identical to the plain equi-join
      // (the salt only places rows); the oracle IS the plain join.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        val dim = d.groupBy("source").agg(count(lit(1)).as("n_docs_src"))
        operators.Joins.saltedJoin(d, dim, Seq("source"), salts = 8)
          .select("doc_id", "source", "n_docs_src")
      },
      Some("""
        SELECT d.doc_id, d.source, c.n_docs_src
        FROM documents d
        JOIN (SELECT source, count(*) AS n_docs_src FROM documents GROUP BY source) c
          ON d.source = c.source""".stripMargin.trim)),

    Q("q_crawl_rank",
      // end-to-end web composition: synthesized page HTML → extractLinks →
      // host-graph edges (absolute link + root-relative self link) →
      // 2-round PageRank. The oracle derives the edge list from the
      // construction and unrolls the same fixpoint as q_pagerank.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
          .withColumn("url", concat(lit("https://"), col("source"), lit(".com/page")))
          .withColumn("html", concat(
            lit("<p><a href=\"https://h"), pmod(col("doc_id"), lit(7)).cast("string"),
            lit(".example/x\">ext</a><a href=\"/self\">self</a></p>")))
        val edges = operators.HtmlOps.extractLinks(d)
          .filter(col("abs_url").isNotNull)
          .select(operators.WebOps.host(col("url")).as("src"),
            operators.WebOps.host(col("abs_url")).as("dst"))
          .distinct()
        operators.Graphs.pageRank(edges, iters = 2)
          .select(col("node"), round(col("rank"), 6).as("rank"))
      },
      Some("""
        WITH e AS (
          SELECT DISTINCT source || '.com' AS src,
            'h' || (doc_id % 7) || '.example' AS dst FROM documents
          UNION
          SELECT DISTINCT source || '.com', source || '.com' FROM documents),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        nn AS (SELECT count(*)::DOUBLE AS c FROM nodes),
        deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src),
        r0 AS (SELECT node, 1.0 / nn.c AS r FROM nodes CROSS JOIN nn),
        d0 AS (SELECT coalesce(sum(r), 0) AS dm FROM r0
               WHERE node NOT IN (SELECT src FROM e)),
        c0 AS (SELECT e.dst AS node, sum(r0.r / deg.d) AS m FROM e
               JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
               GROUP BY e.dst),
        r1 AS (SELECT nodes.node,
                 0.15 / nn.c + 0.85 * (coalesce(c0.m, 0) + d0.dm / nn.c) AS r
               FROM nodes CROSS JOIN nn CROSS JOIN d0
               LEFT JOIN c0 ON nodes.node = c0.node),
        d1 AS (SELECT coalesce(sum(r), 0) AS dm FROM r1
               WHERE node NOT IN (SELECT src FROM e)),
        c1 AS (SELECT e.dst AS node, sum(r1.r / deg.d) AS m FROM e
               JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
               GROUP BY e.dst)
        SELECT nodes.node,
          round(0.15 / nn.c + 0.85 * (coalesce(c1.m, 0) + d1.dm / nn.c), 6) AS rank
        FROM nodes CROSS JOIN nn CROSS JOIN d1
        LEFT JOIN c1 ON nodes.node = c1.node""".stripMargin.trim)),

    Q("q_rate_anomalies",
      // windowed rate anomaly: hourly per-type buckets scored against the
      // 8 trailing observed buckets; z stays NULL (and never flags) until
      // >= 2 history buckets with variance exist.
      (s, dir) => {
        val e = Tables.load(s, dir)("events")
        operators.Events.rateAnomalies(e, Seq("event_type"),
          bucketSec = 3600L, trailing = 8, threshold = 3.0)
      },
      Some("""
        WITH c AS (
          SELECT event_type,
            (floor(epoch(ts))::BIGINT // 3600) * 3600 AS bucket_start,
            count(*) AS n_events
          FROM events GROUP BY 1, 2),
        zc AS (
          SELECT event_type, bucket_start, n_events,
            avg(n_events) OVER w AS mu,
            stddev_samp(n_events) OVER w AS sd,
            count(n_events) OVER w AS cw
          FROM c
          WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start
            ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
        SELECT event_type, bucket_start, n_events,
          CASE WHEN cw >= 2
            THEN round((n_events - mu) / greatest(sd, 1.0), 6) END AS z,
          coalesce((CASE WHEN cw >= 2
            THEN round((n_events - mu) / greatest(sd, 1.0), 6) END) >= 3.0, false)
            AS anomaly
        FROM zc""".stripMargin.trim)),

    Q("q_entropy",
      // per-doc code-point and word entropy (bits) — the gibberish gate;
      // the oracle recomputes both distributions from scratch in DuckDB
      // (string_split('') yields code points, matching the kernel's
      // codePointAt walk) with the identical -p·ln(p)/ln(2) fold.
      // Edge contract pinned on both sides (fixture-independent): empty
      // normalized text → 0.0 entropies (LEFT JOIN + coalesce replays
      // the kernel's n=0 fold), NULL text → NULL entropies
      (s, dir) => {
        import org.apache.spark.sql.functions._
        operators.TextOps.entropyMetrics(Tables.load(s, dir)("documents"))
          .select(col("doc_id"),
            round(col("char_entropy"), 6).as("char_entropy"),
            round(col("word_entropy"), 6).as("word_entropy"))
      },
      Some("""
        WITH n AS (
          SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
          FROM documents
        ), cg AS (
          SELECT doc_id, ch, count(*) AS c
          FROM (SELECT doc_id, unnest(string_split(t, '')) AS ch FROM n)
          GROUP BY 1, 2
        ), ct AS (SELECT doc_id, sum(c) AS tot FROM cg GROUP BY 1),
        ce AS (
          SELECT cg.doc_id,
            sum(-(c::DOUBLE / tot) * ln(c::DOUBLE / tot) / ln(2)) AS h
          FROM cg JOIN ct USING (doc_id) GROUP BY 1
        ), wg AS (
          SELECT doc_id, w, count(*) AS c
          FROM (SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM n)
          GROUP BY 1, 2
        ), wt AS (SELECT doc_id, sum(c) AS tot FROM wg GROUP BY 1),
        we AS (
          SELECT wg.doc_id,
            sum(-(c::DOUBLE / tot) * ln(c::DOUBLE / tot) / ln(2)) AS h
          FROM wg JOIN wt USING (doc_id) GROUP BY 1
        )
        SELECT n.doc_id,
          CASE WHEN n.t IS NULL THEN NULL
               ELSE round(coalesce(ce.h, 0.0), 6) END AS char_entropy,
          CASE WHEN n.t IS NULL THEN NULL
               ELSE round(coalesce(we.h, 0.0), 6) END AS word_entropy
        FROM n LEFT JOIN ce ON ce.doc_id = n.doc_id
        LEFT JOIN we ON we.doc_id = n.doc_id""".stripMargin.trim)),

    Q("q_url_features",
      // URL lexical features over decorated synthesized URLs; the oracle
      // derives depth/params/labels/tracking from the construction CASEs
      // and replays only the trivial length/digit arithmetic
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents").withColumn("url",
          concat(lit("http://"),
            when(pmod(col("doc_id"), lit(5)) === 0, lit("sub.")).otherwise(lit("")),
            col("source"), lit(".com/a/"), col("doc_id").cast("string"),
            when(pmod(col("doc_id"), lit(2)) === 0, lit("/x7")).otherwise(lit("")),
            when(pmod(col("doc_id"), lit(3)) === 0, lit("?utm_s=1&q=2")).otherwise(lit("")),
            when(pmod(col("doc_id"), lit(4)) === 0, lit("#f")).otherwise(lit(""))))
        operators.WebOps.urlFeatures(d)
          .select(col("doc_id"), col("url_len"), col("url_depth"),
            col("n_params"), col("n_host_labels"),
            round(col("digit_ratio"), 6).as("digit_ratio"),
            col("has_tracking"))
      },
      Some("""
        WITH u AS (
          SELECT doc_id,
            'http://' || (CASE WHEN doc_id % 5 = 0 THEN 'sub.' ELSE '' END) ||
            source || '.com/a/' || doc_id ||
            (CASE WHEN doc_id % 2 = 0 THEN '/x7' ELSE '' END) ||
            (CASE WHEN doc_id % 3 = 0 THEN '?utm_s=1&q=2' ELSE '' END) ||
            (CASE WHEN doc_id % 4 = 0 THEN '#f' ELSE '' END) AS url
          FROM documents)
        SELECT doc_id, CAST(length(url) AS INT) AS url_len,
          CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END AS INT) AS url_depth,
          CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 0 END AS INT) AS n_params,
          CAST(CASE WHEN doc_id % 5 = 0 THEN 3 ELSE 2 END AS INT) AS n_host_labels,
          round((length(url) - length(regexp_replace(url, '[0-9]', '', 'g')))::DOUBLE
            / length(url), 6) AS digit_ratio,
          doc_id % 3 = 0 AS has_tracking
        FROM u""".stripMargin.trim)),

    Q("q_url_canonical",
      // crawl-dedup canonical key: decorated URLs (case noise, userinfo,
      // default and non-default ports, trailing slash, utm params,
      // fragment) are synthesized identically on both sides; the oracle
      // derives the expected canonical form from the construction CASEs —
      // an independent derivation, not a replay of the operator.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents").withColumn("url",
          concat(lit("HTTP://"),
            when(pmod(col("doc_id"), lit(5)) === 0, lit("u@")).otherwise(lit("")),
            upper(col("source")), lit(".COM"),
            when(pmod(col("doc_id"), lit(7)) === 0, lit(":80"))
              .when(pmod(col("doc_id"), lit(11)) === 0, lit(":8080"))
              .otherwise(lit("")),
            lit("/Docs/"), col("doc_id").cast("string"),
            when(pmod(col("doc_id"), lit(2)) === 0, lit("/")).otherwise(lit("")),
            when(pmod(col("doc_id"), lit(3)) === 0, lit("?utm_campaign=c&z=1&a=2"))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(4)) === 0, lit("#frag")).otherwise(lit(""))))
        d.select(col("doc_id"),
          operators.WebOps.canonicalUrl(col("url")).as("canonical_url"))
      },
      Some("""
        SELECT doc_id,
          'http://' || lower(source) || '.com' ||
          (CASE WHEN doc_id % 7 = 0 THEN ''
                WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END) ||
          '/Docs/' || doc_id ||
          (CASE WHEN doc_id % 3 = 0 THEN '?a=2&z=1' ELSE '' END) AS canonical_url
        FROM documents""".stripMargin.trim)),

    Q("q_profile",
      // one-pass table audit (exact-distinct mode so the oracle can match
      // bit-for-bit; the approx default is the 100 TB path and is spec- and
      // plan-covered): per column null count, cardinality, native-typed
      // min/max rendered as strings, numeric means.
      (s, dir) => {
        val d = Tables.load(s, dir)("documents")
        operators.Profile.profile(d, exactDistinct = true)
      },
      Some("""
        SELECT 'doc_id' AS col_name, count(*) AS n_rows,
          count(*) - count(doc_id) AS n_nulls,
          count(DISTINCT doc_id) AS n_distinct,
          CAST(min(doc_id) AS VARCHAR) AS min, CAST(max(doc_id) AS VARCHAR) AS max,
          round(avg(doc_id), 6) AS mean FROM documents
        UNION ALL
        SELECT 'text', count(*), count(*) - count(text), count(DISTINCT text),
          min(text), max(text), CAST(NULL AS DOUBLE) FROM documents
        UNION ALL
        SELECT 'lang', count(*), count(*) - count(lang), count(DISTINCT lang),
          min(lang), max(lang), CAST(NULL AS DOUBLE) FROM documents
        UNION ALL
        SELECT 'source', count(*), count(*) - count(source), count(DISTINCT source),
          min(source), max(source), CAST(NULL AS DOUBLE) FROM documents
        UNION ALL
        SELECT 'n_chars', count(*), count(*) - count(n_chars), count(DISTINCT n_chars),
          CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR),
          round(avg(n_chars), 6) FROM documents""".stripMargin.trim)),

    Q("q_profile_by",
      // per-group audit slice: same one-aggregation shape keyed on source
      (s, dir) => {
        val d = Tables.load(s, dir)("documents")
        operators.Profile.profileBy(d, Seq("source"),
          cols = Seq("doc_id", "lang"), exactDistinct = true)
      },
      Some("""
        SELECT source, 'doc_id' AS col_name, count(*) AS n_rows,
          count(*) - count(doc_id) AS n_nulls,
          count(DISTINCT doc_id) AS n_distinct,
          CAST(min(doc_id) AS VARCHAR) AS min, CAST(max(doc_id) AS VARCHAR) AS max,
          round(avg(doc_id), 6) AS mean FROM documents GROUP BY source
        UNION ALL
        SELECT source, 'lang', count(*), count(*) - count(lang),
          count(DISTINCT lang), min(lang), max(lang), CAST(NULL AS DOUBLE)
        FROM documents GROUP BY source""".stripMargin.trim)),

    Q("q_dedup_url",
      // crawl dedup on the canonical key: 5 decorated fetches of each of
      // 100 pages collapse to the min-id row; junk rows pass through
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents").withColumn("url",
          when(pmod(col("doc_id"), lit(25)) === 24, lit("junk"))
            .otherwise(concat(lit("HTTP://Host"),
              pmod(col("doc_id"), lit(100)).cast("string"), lit(".com/p"),
              when(pmod(col("doc_id"), lit(2)) === 0, lit("?utm_a=1&gclid=2"))
                .otherwise(lit("#frag")))))
        operators.Dedup.exactBy(d, operators.WebOps.canonicalUrl(col("url")))
          .select("doc_id")
      },
      Some("""
        SELECT doc_id FROM documents
        WHERE doc_id % 25 = 24
           OR doc_id = (SELECT min(d2.doc_id) FROM documents d2
                        WHERE d2.doc_id % 100 = documents.doc_id % 100
                          AND d2.doc_id % 25 <> 24)""".stripMargin.trim)),

    Q("q_histogram",
      // explicit-range equi-width histogram with clamping and zero-filled
      // empty bins (plot-ready shape, one pass over the data)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        operators.Profile.histogram(d, col("n_chars"), bins = 10, lo = 0.0, hi = 2000.0)
      },
      Some("""
        WITH b AS (SELECT unnest(range(10)) AS bin),
        c AS (
          SELECT least(greatest(CAST(floor(n_chars / 200.0) AS INTEGER), 0), 9) AS bin,
            count(*) AS n
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1)
        SELECT CAST(b.bin AS INTEGER) AS bin,
          round(b.bin * 200.0, 6) AS bin_lo,
          round((b.bin + 1) * 200.0, 6) AS bin_hi,
          coalesce(c.n, 0) AS n
        FROM b LEFT JOIN c ON b.bin = c.bin""".stripMargin.trim)),

    Q("q_quantiles_by",
      // per-source quantile slice (exact mode for the oracle; the approx
      // sketch is the default scale path) — Spark's exact percentile and
      // DuckDB's quantile_cont share the interpolated-rank definition
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val d = Tables.load(s, dir)("documents")
        operators.Profile.quantilesBy(d, Seq("source"), col("n_chars"), exact = true)
      },
      Some("""
        SELECT source,
          unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS p,
          round(unnest(quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9, 0.99])), 6)
            AS value
        FROM documents GROUP BY source""".stripMargin.trim)),

    Q("q_corr_matrix",
      // one-pass pairwise Pearson over numeric columns (order pairs i<j)
      (s, dir) => {
        val d = Tables.load(s, dir)("lineitem")
        operators.Profile.corrMatrix(d,
          Seq("l_quantity", "l_extendedprice", "l_discount"))
      },
      Some("""
        SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
          round(corr(l_quantity, l_extendedprice), 6) AS pearson FROM lineitem
        UNION ALL
        SELECT 'l_quantity', 'l_discount',
          round(corr(l_quantity, l_discount), 6) FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', 'l_discount',
          round(corr(l_extendedprice, l_discount), 6) FROM lineitem""".stripMargin.trim)),

    Q("q_psi",
      // PSI distribution drift between even/odd l_orderkey halves of
      // lineitem (exact ref-quantile edges, B=10, add-0.5 smoothing) —
      // full per-(column, bucket) detail replayed by the generated
      // oracle (psiOracleSql)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val li = Tables.load(s, dir)("lineitem")
        operators.Profile.psiReport(
          li.where(pmod(col("l_orderkey"), lit(2)) === 0),
          li.where(pmod(col("l_orderkey"), lit(2)) === 1),
          Seq("l_quantity", "l_extendedprice", "l_discount"),
          exact = true)
      },
      Some(psiOracleSql)),

    Q("q_clip",
      // quantile winsorization: both columns clamp into their own
      // [p05, p95] (exact mode, 6dp-rounded bounds); inside-range values
      // pass through bit-identically, so no output rounding is needed
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        operators.Profile.clipOutliers(
            Tables.load(s, dir)("lineitem"),
            Seq("l_extendedprice", "l_quantity"),
            lo = 0.05, hi = 0.95, exact = true)
          .select("l_orderkey", "l_linenumber", "l_extendedprice",
            "l_quantity")
      },
      Some("""
        WITH q AS (
          SELECT round(quantile_cont(l_extendedprice, 0.05), 6) AS e_lo,
            round(quantile_cont(l_extendedprice, 0.95), 6) AS e_hi,
            round(quantile_cont(l_quantity, 0.05), 6) AS q_lo,
            round(quantile_cont(l_quantity, 0.95), 6) AS q_hi
          FROM lineitem)
        SELECT l_orderkey, l_linenumber,
          greatest(least(l_extendedprice, e_hi), e_lo) AS l_extendedprice,
          greatest(least(l_quantity, q_hi), q_lo) AS l_quantity
        FROM lineitem, q""".stripMargin.trim)),

    Q("q_redact_cards",
      // Luhn-validated card redaction: one valid and one checksum-broken
      // card are appended by construction; the oracle derives the expected
      // output from the CASEs (the valid number redacts, the look-alike
      // survives) — independent of the operator's fold.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents").withColumn("text2",
          concat(col("text"),
            when(pmod(col("doc_id"), lit(4)) === 0, lit(" card 4111 1111 1111 1111 ok"))
              .when(pmod(col("doc_id"), lit(4)) === 1, lit(" card 4111 1111 1111 1112 ok"))
              .otherwise(lit(""))))
        d.select(col("doc_id"),
          operators.TextOps.redactCards(col("text2")).as("redacted"))
      },
      Some("""
        SELECT doc_id, text ||
          (CASE WHEN doc_id % 4 = 0 THEN ' card <CARD> ok'
                WHEN doc_id % 4 = 1 THEN ' card 4111 1111 1111 1112 ok'
                ELSE '' END) AS redacted
        FROM documents""".stripMargin.trim)),

    Q("q_meta_robots",
      // page-level crawl directives over 5 planted page shapes (both
      // attribute orders, case-insensitivity, the 'none' token, nofollow
      // link counting, a directive-free page that also plants
      // <area>/<abbr> nofollow rels which must NOT count as anchor
      // links); the oracle is the hand-computed decision table,
      // independent of the regex chain
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val m = pmod(col("doc_id"), lit(5))
        val html = when(m === 0, lit("<html><head><meta name=\"robots\" content=\"noindex, follow\">" +
            "<link rel=\"canonical\" href=\"https://e.com/c0\"></head>" +
            "<body><a href=\"/x\" rel=\"nofollow\">x</a><a href=\"/y\">y</a></body></html>"))
          .when(m === 1, lit("<head><meta content=\"nofollow\" name=\"robots\"></head>" +
            "<a href=\"/a\" rel=\"external nofollow\">a</a>"))
          .when(m === 2, lit("<meta name=\"robots\" content=\"none\">" +
            "<a rel=\"nofollow\" href=\"/1\">1</a><a rel=\"nofollow\" href=\"/2\">2</a>"))
          // the <area>/<abbr> rows pin the tag-name boundary: a nofollow
          // rel on a NON-anchor tag whose name starts with 'a' must not
          // count as a nofollow link
          .when(m === 3, lit("<p>plain</p><a href=\"/z\">z</a>" +
            "<area href=\"/m\" rel=\"nofollow\"><abbr rel=\"nofollow\">t</abbr>"))
          .otherwise(lit("<META NAME=\"ROBOTS\" CONTENT=\"NOINDEX,NOFOLLOW\">" +
            "<link href=\"https://e.com/c4\" rel=\"canonical\">"))
        val d = Tables.load(s, dir)("documents").select(col("doc_id"), html.as("html"))
        operators.HtmlOps.metaRobots(d)
          .select("doc_id", "robots_noindex", "robots_nofollow",
            "canonical_url", "n_nofollow_links")
      },
      Some("""
        SELECT doc_id,
          (doc_id % 5) IN (0, 2, 4) AS robots_noindex,
          (doc_id % 5) IN (1, 2, 4) AS robots_nofollow,
          CASE doc_id % 5 WHEN 0 THEN 'https://e.com/c0'
                          WHEN 4 THEN 'https://e.com/c4' END AS canonical_url,
          CAST(CASE doc_id % 5 WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2
                               ELSE 0 END AS INT) AS n_nofollow_links
        FROM documents""".stripMargin.trim)),

    Q("q_html_links",
      // link-graph extraction: three anchors per doc by construction
      // (absolute / root-relative / fragment); the oracle derives each
      // (pos, href, abs_url, anchor_text) row from the construction, not
      // from the operator's regex chain.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
          .withColumn("url", concat(lit("https://"), col("source"), lit(".com/page")))
          .withColumn("html", concat(
            lit("<p><a href=\"https://ext.example/p\">Ext "), col("doc_id").cast("string"),
            lit("</a> mid <a href=\"/local/"), col("doc_id").cast("string"),
            lit("\"><b>go</b>  now</a><a href=\"#top\">top</a></p>")))
        operators.HtmlOps.extractLinks(d)
          .select("doc_id", "link_pos", "href", "abs_url", "anchor_text")
      },
      Some("""
        SELECT doc_id, CAST(0 AS INTEGER) AS link_pos,
          'https://ext.example/p' AS href,
          'https://ext.example/p' AS abs_url,
          'Ext ' || doc_id AS anchor_text FROM documents
        UNION ALL
        SELECT doc_id, CAST(1 AS INTEGER), '/local/' || doc_id,
          'https://' || source || '.com/local/' || doc_id, 'go now' FROM documents
        UNION ALL
        SELECT doc_id, CAST(2 AS INTEGER), '#top', CAST(NULL AS VARCHAR), 'top'
        FROM documents""".stripMargin.trim)),

    Q("q_pagerank",
      // power-iteration PageRank on a host graph synthesized from the
      // corpus (h(doc_id%13) -> h(doc_id%17), deduped; h13..h16 are
      // dangling). iters=2 so the oracle can unroll the exact fixpoint
      // as CTEs; the operator's default 10 rounds is spec-covered against
      // an in-memory reference implementation.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val e = Tables.load(s, dir)("documents").select(
          concat(lit("h"), pmod(col("doc_id"), lit(13)).cast("string")).as("src"),
          concat(lit("h"), pmod(col("doc_id"), lit(17)).cast("string")).as("dst"))
          .distinct()
        operators.Graphs.pageRank(e, iters = 2)
          .select(col("node"), round(col("rank"), 6).as("rank"))
      },
      Some("""
        WITH e AS (SELECT DISTINCT 'h' || (doc_id % 13) AS src,
                     'h' || (doc_id % 17) AS dst FROM documents),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        nn AS (SELECT count(*)::DOUBLE AS c FROM nodes),
        deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src),
        r0 AS (SELECT node, 1.0 / nn.c AS r FROM nodes CROSS JOIN nn),
        d0 AS (SELECT coalesce(sum(r), 0) AS dm FROM r0
               WHERE node NOT IN (SELECT src FROM e)),
        c0 AS (SELECT e.dst AS node, sum(r0.r / deg.d) AS m FROM e
               JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
               GROUP BY e.dst),
        r1 AS (SELECT nodes.node,
                 0.15 / nn.c + 0.85 * (coalesce(c0.m, 0) + d0.dm / nn.c) AS r
               FROM nodes CROSS JOIN nn CROSS JOIN d0
               LEFT JOIN c0 ON nodes.node = c0.node),
        d1 AS (SELECT coalesce(sum(r), 0) AS dm FROM r1
               WHERE node NOT IN (SELECT src FROM e)),
        c1 AS (SELECT e.dst AS node, sum(r1.r / deg.d) AS m FROM e
               JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
               GROUP BY e.dst)
        SELECT nodes.node,
          round(0.15 / nn.c + 0.85 * (coalesce(c1.m, 0) + d1.dm / nn.c), 6) AS rank
        FROM nodes CROSS JOIN nn CROSS JOIN d1
        LEFT JOIN c1 ON nodes.node = c1.node""".stripMargin.trim)),

    Q("q_encoding_flags",
      // mojibake / lossy-decode detection: artifacts are injected
      // deterministically (the fixture corpus is clean), same injection
      // CASE on both sides; counters and flag must agree exactly
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents").withColumn("text2",
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" cafÃ© â€™x")))
            .when(pmod(col("doc_id"), lit(11)) === 0,
              concat(col("text"), lit("� ok �")))
            .otherwise(col("text")))
        operators.TextOps.encodingFlags(d, "text2")
          .select("doc_id", "n_replacement", "n_control", "n_mojibake",
            "flag_encoding")
      },
      Some(("""
        WITH d AS (
          SELECT doc_id,
            CASE WHEN doc_id % 7 = 0 THEN text || ' cafÃ© â€™x'
                 WHEN doc_id % 11 = 0 THEN text || '� ok �'
                 ELSE text END AS t
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t, '�')) AS INTEGER) AS n_replacement,
          CAST(len(regexp_extract_all(t, '[\x00-\x08\x0b\x0c\x0e-\x1f]')) AS INTEGER)
            AS n_control,
          CAST(len(regexp_extract_all(t,
            'Ã[-¿]|â€|â|Â[ -¿]')) AS INTEGER)
            AS n_mojibake,
          len(regexp_extract_all(t, '�')) = 0 AND
            len(regexp_extract_all(t, '[\x00-\x08\x0b\x0c\x0e-\x1f]')) = 0 AND
            len(regexp_extract_all(t,
              'Ã[-¿]|â€|â|Â[ -¿]')) = 0
            AS flag_encoding
        FROM d""").stripMargin.trim)),

    Q("q_decontaminate",
      // benchmark decontamination: docs < 100 act as the eval set; any
      // doc >= 100 sharing an 8-gram (near-dups planted in the fixture)
      // is flagged with its distinct-overlap count
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val d = Tables.load(s, dir)("documents")
        operators.Dedup.contamination(
          d.filter(col("doc_id") >= 100), d.filter(col("doc_id") < 100), n = 8)
      },
      Some("""
        WITH nw AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w FROM documents),
        s AS (SELECT doc_id, CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
              ELSE list_distinct([array_to_string(w[i:i+7], ' ') for i in range(1, len(w) - 6)]) END AS g FROM nw),
        b AS (SELECT DISTINCT unnest(g) AS g FROM s WHERE doc_id < 100),
        d AS (SELECT doc_id, unnest(g) AS g FROM s WHERE doc_id >= 100)
        SELECT d.doc_id, count(*) AS hits FROM d JOIN b USING (g) GROUP BY d.doc_id""".stripMargin.trim)),

    Q("q_contamination_report",
      // per-benchmark-set contamination audit: eval docs (< 100) labeled
      // into 3 sets by id, corpus = docs >= 100; report rows carry doc
      // counts, corpus share, and breadth of gram overlap per set
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        val bench = d.filter(col("doc_id") < 100).withColumn("benchmark",
          concat(lit("set"), pmod(col("doc_id"), lit(3)).cast("string")))
        operators.Dedup.contaminationReport(
          d.filter(col("doc_id") >= 100), bench, n = 8)
      },
      Some("""
        WITH nw AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w FROM documents),
        s AS (SELECT doc_id, CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
              ELSE list_distinct([array_to_string(w[i:i+7], ' ') for i in range(1, len(w) - 6)]) END AS g FROM nw),
        b AS (SELECT DISTINCT 'set' || (doc_id % 3) AS benchmark, unnest(g) AS g
              FROM s WHERE doc_id < 100),
        d AS (SELECT doc_id, unnest(g) AS g FROM s WHERE doc_id >= 100),
        t AS (SELECT count(*) AS total FROM documents WHERE doc_id >= 100),
        sets AS (SELECT DISTINCT 'set' || (doc_id % 3) AS benchmark
                 FROM documents WHERE doc_id < 100),
        j AS (SELECT b.benchmark,
                count(DISTINCT d.doc_id) AS n_docs_contaminated,
                count(DISTINCT d.g) AS n_grams_matched
              FROM d JOIN b USING (g) GROUP BY 1)
        SELECT sets.benchmark,
          coalesce(j.n_docs_contaminated, 0) AS n_docs_contaminated,
          coalesce(j.n_grams_matched, 0) AS n_grams_matched,
          round(coalesce(j.n_docs_contaminated, 0)::DOUBLE / t.total, 6) AS doc_share
        FROM sets LEFT JOIN j USING (benchmark) CROSS JOIN t""".stripMargin.trim)),

    Q("q_dedup_ngram_blocked",
      (s, dir) => {
        val docs = Tables.load(s, dir)("documents")
        operators.Dedup.ngramJaccardPairs(docs, org.apache.spark.sql.functions.col("source"),
          n = 3, threshold = 0.5)
      },
      Some("""
        WITH n AS (SELECT doc_id, source, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w FROM documents),
        s AS (SELECT doc_id, source, CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) END AS sh FROM n)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          round(len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
        FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5""".stripMargin.trim)),

    // portableHash=true → md5-derived 60-bit token hashes, bit-identical in
    // DuckDB; pigeonhole banding has full recall, so the op output is
    // exactly the ≤-maxDist pair set and the oracle recomputes it directly
    Q("q_dedup_simhash",
      (s, dir) => operators.Dedup.simHashPairs(
        Tables.load(s, dir)("documents"), maxDist = 10, portableHash = true),
      Some("""
        WITH nrm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
        tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS t FROM nrm),
        h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS hv FROM tok),
        bitc AS (SELECT doc_id, i, sum(CASE WHEN ((hv >> i) & 1) = 1 THEN 1 ELSE -1 END) AS c
                 FROM h CROSS JOIN range(0, 64) r(i) GROUP BY doc_id, i),
        sig AS (SELECT doc_id, sum(CASE WHEN c >= 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)::BIGINT AS sig
                FROM bitc GROUP BY doc_id)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS dist
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= 10""".stripMargin.trim)),

    Q("q_dedup_sig_pairs_simhash",
      // SimHash twin of q_dedup_sig_pairs: stored 64-bit signatures →
      // pigeonhole banding + Hamming verification with ZERO text access,
      // full-outer-diffed in-entry against the text-side simHashPairs on
      // the same fixture; with portableHash=true (md5-derived token
      // hashes, bit-identical in DuckDB) and full-recall pigeonhole
      // banding, the oracle is the exact ≤-maxDist pair set, every row
      // 'both' — a sig/text divergence or a wrong pair goes red.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir)("documents")
        val sigs = operators.Dedup.simHashSignatures(docs, portableHash = true)
        val sig = operators.Dedup.simHashPairsFromSignatures(sigs, maxDist = 10)
          .select(col("doc_a"), col("doc_b"), lit(true).as("in_sig"))
        val text = operators.Dedup.simHashPairs(docs, maxDist = 10, portableHash = true)
          .select(col("doc_a"), col("doc_b"), lit(true).as("in_text"))
        sig.join(text, Seq("doc_a", "doc_b"), "full_outer")
          .select(col("doc_a"), col("doc_b"),
            when(col("in_sig") && col("in_text"), "both")
              .when(col("in_sig"), "sig_only")
              .otherwise("text_only").as("status"))
      },
      Some("""
        WITH nrm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
        tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS t FROM nrm),
        h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS hv FROM tok),
        bitc AS (SELECT doc_id, i, sum(CASE WHEN ((hv >> i) & 1) = 1 THEN 1 ELSE -1 END) AS c
                 FROM h CROSS JOIN range(0, 64) r(i) GROUP BY doc_id, i),
        sig AS (SELECT doc_id, sum(CASE WHEN c >= 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)::BIGINT AS sig
                FROM bitc GROUP BY doc_id)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 'both' AS status
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= 10""".stripMargin.trim)),

    Q("q_dedup_sig_pairs_simhash_incr",
      // the at-ingest SimHash shape: new-batch signatures (doc_id >= 400)
      // against the stored corpus sketch table (doc_id < 400), zero text
      // access on either side. In-entry full-outer diff against the
      // within-corpus path restricted to cross pairs (full-recall
      // pigeonhole banding ⇒ both compute the exact ≤-maxDist set); the
      // oracle replays that exact cross-side pair set, every row 'both'.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir)("documents")
        val sigs = operators.Dedup.simHashSignatures(docs, portableHash = true)
        val corpus = sigs.filter(col("doc_id") < 400)
        val batch = sigs.filter(col("doc_id") >= 400)
        val cross = operators.Dedup
          .simHashPairsAgainstSignatures(batch, corpus, maxDist = 10)
          .select(col("doc_new"), col("doc_corpus"), lit(true).as("in_cross"))
        val full = operators.Dedup.simHashPairsFromSignatures(sigs, maxDist = 10)
          .filter(col("doc_a") < 400 && col("doc_b") >= 400)
          .select(col("doc_b").as("doc_new"), col("doc_a").as("doc_corpus"),
            lit(true).as("in_full"))
        cross.join(full, Seq("doc_new", "doc_corpus"), "full_outer")
          .select(col("doc_new"), col("doc_corpus"),
            when(col("in_cross") && col("in_full"), "both")
              .when(col("in_cross"), "cross_only")
              .otherwise("full_only").as("status"))
      },
      Some("""
        WITH nrm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
        tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS t FROM nrm),
        h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS hv FROM tok),
        bitc AS (SELECT doc_id, i, sum(CASE WHEN ((hv >> i) & 1) = 1 THEN 1 ELSE -1 END) AS c
                 FROM h CROSS JOIN range(0, 64) r(i) GROUP BY doc_id, i),
        sig AS (SELECT doc_id, sum(CASE WHEN c >= 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)::BIGINT AS sig
                FROM bitc GROUP BY doc_id)
        SELECT b.doc_id AS doc_new, c.doc_id AS doc_corpus, 'both' AS status
        FROM sig b JOIN sig c ON b.doc_id >= 400 AND c.doc_id < 400
        WHERE bit_count(xor(b.sig, c.sig)) <= 10""".stripMargin.trim)),

    // winnowed k-gram fingerprints (MOSS): md5-derived hashes → window
    // minima → shared-count join; the oracle replays the same scheme in SQL
    Q("q_winnow_pairs",
      (s, dir) => operators.Dedup.winnowPairs(
        Tables.load(s, dir)("documents"), k = 8, w = 16, minShared = 5),
      Some("""
        WITH nrm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s FROM documents),
        g AS (SELECT doc_id, r.i, length(s) - 8 + 1 AS ng,
                ('0x' || substr(md5(substr(s, r.i::INTEGER, 8)), 1, 15))::BIGINT AS h
              FROM nrm CROSS JOIN range(1, 100001) r(i)
              WHERE r.i <= length(s) - 8 + 1),
        m AS (SELECT doc_id, i, ng, min(h) OVER (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS mh FROM g),
        f AS (SELECT DISTINCT doc_id, mh FROM m WHERE i <= greatest(1, ng - 16 + 1))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        FROM f a JOIN f b ON a.mh = b.mh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 5""".stripMargin.trim)),

    // --- LLM-pipeline operators: similarity search ------------------------
    Q("q_embed_topk",
      (s, dir) => {
        val emb = Tables.load(s, dir)("embeddings")
        val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
          .withColumnRenamed("vec_id", "query_id")
        operators.Similarity.topK(emb, queries, k = 10)
      },
      Some("""
        WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
        p AS (SELECT q.query_id, e.vec_id,
          round(list_inner_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
            (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
             sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 6) AS sim
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank FROM p)
        SELECT query_id, vec_id, sim, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= 10""".stripMargin.trim)),

    Q("q_hybrid_topk",
      // hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
      // ranking and the embedding-cosine ranking (doc_id/vec_id aligned in
      // the fixture); query ids offset by 10000 so neither pool
      // self-excludes. Both modality rankings are 6dp-rounded with id
      // tiebreaks, so the oracle replays lex pool, sem pool, RRF and the
      // final top-10 exactly.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val t = Tables.load(s, dir)
        val queries = t("documents")
          .join(t("embeddings"), col("doc_id") === col("vec_id"))
          .filter(col("doc_id") < 5)
          .select((col("doc_id") + 10000L).as("query_id"),
            col("text").as("qtext"), col("embedding"))
        operators.Similarity.hybridTopK(
          t("documents"), t("embeddings"), queries, k = 10, poolK = 20)
      },
      Some("""
        WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents),
        b AS (SELECT doc_id, CASE WHEN length(t) = 0 THEN 0 ELSE len(string_split(t, ' ')) END AS dl, t FROM d),
        c AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM b),
        p AS (SELECT doc_id, dl, token, count(*) AS tf FROM (
                SELECT doc_id, dl, unnest(string_split(t, ' ')) AS token FROM b)
              WHERE length(token) > 0 GROUP BY doc_id, dl, token),
        q AS (SELECT DISTINCT query_id, token FROM (
                SELECT doc_id + 10000 AS query_id, unnest(string_split(t, ' ')) AS token FROM d WHERE doc_id < 5)
              WHERE length(token) > 0),
        f AS (SELECT p.token, count(*) AS df FROM p JOIN (SELECT DISTINCT token FROM q) qt ON p.token = qt.token GROUP BY p.token),
        s AS (SELECT q.query_id, p.doc_id,
                round(sum(ln(1 + (c.n - f.df + 0.5) / (f.df + 0.5)) *
                  p.tf * (1.2 + 1) / (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / c.avgdl))), 6) AS score
              FROM p JOIN q ON p.token = q.token JOIN f ON p.token = f.token CROSS JOIN c
              GROUP BY q.query_id, p.doc_id),
        lex0 AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS lex_rank FROM s),
        lex AS (SELECT query_id, doc_id, CAST(lex_rank AS INTEGER) AS lex_rank FROM lex0 WHERE lex_rank <= 20),
        qv AS (SELECT vec_id + 10000 AS query_id, embedding FROM embeddings WHERE vec_id < 5),
        pv AS (SELECT qv.query_id, e.vec_id AS doc_id,
                round(list_inner_product(e.embedding::DOUBLE[], qv.embedding::DOUBLE[]) /
                  (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                   sqrt(list_inner_product(qv.embedding::DOUBLE[], qv.embedding::DOUBLE[]))), 6) AS sim
               FROM embeddings e CROSS JOIN qv),
        sem0 AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS sem_rank FROM pv),
        sem AS (SELECT query_id, doc_id, CAST(sem_rank AS INTEGER) AS sem_rank FROM sem0 WHERE sem_rank <= 20),
        fused AS (SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
                coalesce(lex.doc_id, sem.doc_id) AS doc_id, lex.lex_rank, sem.sem_rank,
                round(coalesce(1.0 / (60 + lex.lex_rank), 0) + coalesce(1.0 / (60 + sem.sem_rank), 0), 6) AS rrf
              FROM lex FULL OUTER JOIN sem ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank FROM fused)
        SELECT query_id, doc_id, lex_rank, sem_rank, rrf, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= 10""".stripMargin.trim)),

    Q("q_embed_neardup",
      (s, dir) => {
        val emb = Tables.load(s, dir)("embeddings")
        // exact brute-force pairs (the LSH path is covered rows-only + spec)
        import org.apache.spark.sql.functions._
        val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("va"))
        val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("vb"))
        a.join(b, col("vec_a") < col("vec_b"))
          .withColumn("sim", round(operators.Similarity.cosine(col("va"), col("vb")), 6))
          .filter(col("sim") >= 0.4)
          .select("vec_a", "vec_b", "sim")
      },
      Some("""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          round(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
            (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
             sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
          (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
           sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.4""".stripMargin.trim)),

    // the oracle inlines the SAME deterministic hyperplanes the operator
    // uses (seed 42), so the approximate candidate set is reproduced exactly
    Q("q_embed_ann_lsh",
      (s, dir) => {
        val emb = Tables.load(s, dir)("embeddings")
        val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
          .withColumnRenamed("vec_id", "query_id")
        // planesN/chunks pinned to the values the oracle inlines — the
        // operator's tuned defaults are free to move
        operators.Similarity.topKBucketed(emb, queries, k = 10,
          planesN = 12, chunks = 4, dims = 64)
      }, Some(annLshOracleSql)),

    // IVF with deterministic centroids — oracle replays cell assignment,
    // probe selection, and candidate ranking from inlined literals
    Q("q_embed_ivf",
      (s, dir) => {
        val emb = Tables.load(s, dir)("embeddings")
        val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
          .withColumnRenamed("vec_id", "query_id")
        // kmeansIter=0: the oracle replays the seeded centroid DIRECTIONS —
        // k-means refinement (float-sum order dependent) is not portably
        // replayable in ANSI SQL; the refined path is covered by the
        // recall-floor spec against brute-force topK instead
        operators.Similarity.topKIvf(emb, queries, k = 10, nlist = 16, nprobe = 4,
          dims = 64, kmeansIter = 0)
      }, Some(annIvfOracleSql)),

    // PQ ADC scan with seeded codebooks — oracle replays code assignment,
    // the fixed-point lookup table, the integer shortlist, and the exact
    // cosine rerank from inlined literals (iters=0: refined books are
    // float-sum order dependent; that path is covered by the bench recall
    // gate, as with IVF)
    Q("q_embed_pq",
      (s, dir) => {
        val emb = Tables.load(s, dir)("embeddings")
        val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
          .withColumnRenamed("vec_id", "query_id")
        operators.Similarity.topKPq(emb, queries, k = 10, m = 8, ksub = 16,
          rerank = 2, dims = 64, iters = 0)
      }, Some(annPqOracleSql)),

    // random projection 64→8 dims with re-normalization — the oracle
    // inlines the seeded direction literals and replays dot, ordered-list
    // norm (left-to-right, matching the kernel), and the 6-dp rounding
    Q("q_embed_project",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        operators.Similarity.randomProject(
            Tables.load(s, dir)("embeddings"), outDims = 8)
          .select(col("vec_id"), posexplode(col("proj")).as(Seq("i", "p_val")))
      },
      Some(annProjectOracleSql)),

    Q("q_profile_drift",
      // snapshot promotion audit: two deterministic corpus slices, full
      // profile side-by-side plus raw-double shift columns (unrounded:
      // IEEE subtraction of already-rounded means is bit-equal across
      // engines; a second rounding would reintroduce half-mode skew)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        operators.Profile.drift(
          d.filter(pmod(col("doc_id"), lit(3)) =!= 0),
          d.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          cols = Seq("n_chars", "lang"), exactDistinct = true)
      },
      Some("""
        WITH prev AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
        nxt AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
        pp AS (
          SELECT 'n_chars' AS col_name, count(*) AS prev_rows,
            count(*) - count(n_chars) AS prev_nulls,
            count(DISTINCT n_chars) AS prev_distinct,
            CAST(min(n_chars) AS VARCHAR) AS prev_min,
            CAST(max(n_chars) AS VARCHAR) AS prev_max,
            round(avg(n_chars), 6) AS prev_mean FROM prev
          UNION ALL
          SELECT 'lang', count(*), count(*) - count(lang),
            count(DISTINCT lang), min(lang), max(lang),
            CAST(NULL AS DOUBLE) FROM prev),
        np AS (
          SELECT 'n_chars' AS col_name, count(*) AS next_rows,
            count(*) - count(n_chars) AS next_nulls,
            count(DISTINCT n_chars) AS next_distinct,
            CAST(min(n_chars) AS VARCHAR) AS next_min,
            CAST(max(n_chars) AS VARCHAR) AS next_max,
            round(avg(n_chars), 6) AS next_mean FROM nxt
          UNION ALL
          SELECT 'lang', count(*), count(*) - count(lang),
            count(DISTINCT lang), min(lang), max(lang),
            CAST(NULL AS DOUBLE) FROM nxt)
        SELECT pp.col_name, prev_rows, prev_nulls, prev_distinct, prev_min,
          prev_max, prev_mean, next_rows, next_nulls, next_distinct,
          next_min, next_max, next_mean,
          next_nulls::DOUBLE / next_rows - prev_nulls::DOUBLE / prev_rows
            AS null_frac_shift,
          next_mean - prev_mean AS mean_shift
        FROM pp JOIN np USING (col_name)""".stripMargin.trim)),

    Q("q_embed_centroids",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val emb = Tables.load(s, dir)("embeddings")
        // fixed-decimal formatting: raw double stringification flips to
        // scientific notation below 1e-3 in the JVM but not in DuckDB
        operators.Similarity.centroids(emb, col("vec_id") % 10)
          .select(col("grp"),
            array_join(transform(col("centroid"),
              c => format_string("%.6f", round(c, 6))), ",").as("centroid"))
      },
      Some("""
        WITH e AS (SELECT vec_id % 10 AS grp, u.x AS v, u.pos AS pos
                   FROM embeddings, LATERAL (SELECT unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS pos) u),
        m AS (SELECT grp, pos, printf('%.6f', round(avg(v::DOUBLE), 6)) AS m FROM e GROUP BY grp, pos)
        SELECT grp, array_to_string(list(m ORDER BY pos), ',') AS centroid
        FROM m GROUP BY grp""".stripMargin.trim)),

    // SemDeDup-shaped semantic near-dup: kmeansIter=0 so the oracle can
    // replay the seeded cell directions (refined path covered by spec)
    Q("q_semantic_pairs",
      (s, dir) => operators.Similarity.semanticPairs(
        Tables.load(s, dir)("embeddings"), threshold = 0.3,
        nlist = 16, kmeansIter = 0, dims = 64),
      Some(semanticPairsOracleSql)),

    // SemDeDup end-to-end: semantic clusters each keep their best-scoring
    // member (label as the quality proxy, ties to lowest id)
    Q("q_curate_semantic",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        operators.Curation.curateSemantic(
          Tables.load(s, dir)("embeddings"), col("label"),
          threshold = 0.3, nlist = 16, kmeansIter = 0, dims = 64)
          .select("vec_id")
      },
      Some(semanticKeepOracleSql)),

    // per-language top-fraction quality gate (exact ranked path; the
    // approx broadcast-threshold path is spec-verified against this one)
    Q("q_quality_topfrac",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        operators.TextOps.keepTopQuality(
          Tables.load(s, dir)("documents"),
          col("n_chars"), 0.25, col("lang"), col("doc_id"))
          .select("doc_id", "lang", "n_chars")
      },
      Some("""
        WITH r AS (SELECT doc_id, lang, n_chars,
          row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk,
          count(*) OVER (PARTITION BY lang) AS cnt FROM documents)
        SELECT doc_id, lang, n_chars FROM r WHERE rk <= ceil(0.25 * cnt)""".stripMargin.trim)),

    // per-group count cap: "at most K docs per domain" curation step
    Q("q_cap_per_group",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        operators.TextOps.capPerGroup(
          Tables.load(s, dir)("documents"),
          col("n_chars"), 7, col("lang"), col("doc_id"))
          .select("doc_id", "lang", "n_chars")
      },
      Some("""
        WITH r AS (SELECT doc_id, lang, n_chars,
          row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk
          FROM documents)
        SELECT doc_id, lang, n_chars FROM r WHERE rk <= 7""".stripMargin.trim)),

    Q("q_bpe_merges",
      // distributed BPE tokenizer training: the merge table learned from
      // the corpus word-frequency dict. Iterative — a DuckDB replay would
      // need one full re-aggregation of the evolving dict per merge round,
      // which a recursive CTE cannot express over array-rewriting steps,
      // so no SQL oracle is possible (the canonical merge sequence is
      // instead differentially pinned in OperatorsSpec). The rows-only
      // check is strengthened in-entry: the trainer runs TWICE — once on
      // the default driver-local path, once FORCING the distributed
      // incremental loop (localThreshold=0) on a differently-partitioned
      // input — and each row carries `stable` = both implementations
      // agreed at that rank, making the determinism claim AND the
      // local/distributed equivalence visible in the dumped artifact.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir)("documents")
        val m1 = operators.Bpe.mergesDf(docs, numMerges = 30)
        val m2 = operators.Bpe.mergesDf(docs.repartition(7), numMerges = 30,
            localThreshold = 0L)
          .withColumnsRenamed(Map("left" -> "left2", "right" -> "right2"))
        val diff = m1.join(m2, Seq("rank"), "full_outer")
          .select(col("rank"), col("left"), col("right"),
            coalesce(col("left") === col("left2") && col("right") === col("right2"),
              lit(false)).as("stable"))
        // self-ENFORCING, not just self-checking: any divergent rank is
        // emitted twice, so a local/distributed disagreement shifts the
        // driver's rows-only count red without relying on the spec suite
        diff.union(diff.filter(not(col("stable"))))
      },
      None),

    Q("q_bpe_vocab",
      // exportable tokenizer vocabulary (token_id, token): <unk>=0, the
      // corpus base alphabet in lexicographic order, the end-of-word
      // sentinel, then merge products in rank order. The merge table is a
      // fixed literal here so the oracle can replay the alphabet
      // extraction and id assignment exactly (trained tables are covered
      // by q_bpe_merges + specs).
      (s, dir) => operators.Bpe.vocabDf(
        Tables.load(s, dir)("documents"),
        Seq("t" -> "h", "th" -> "e", "e" -> "</w>")),
      Some("""
        WITH n AS (SELECT replace(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ', '') AS s FROM documents),
        a AS (SELECT DISTINCT unnest(string_split(s, '')) AS ch FROM n),
        alpha AS (SELECT ch, CAST(row_number() OVER (ORDER BY ch) AS INTEGER) AS rn FROM a WHERE ch <> ''),
        k AS (SELECT max(rn) AS mx FROM alpha)
        SELECT CAST(0 AS INTEGER) AS token_id, '<unk>' AS token
        UNION ALL SELECT rn AS token_id, ch AS token FROM alpha
        UNION ALL SELECT CAST(mx + 1 AS INTEGER), '</w>' FROM k
        UNION ALL SELECT CAST(mx + 2 AS INTEGER), 'th' FROM k
        UNION ALL SELECT CAST(mx + 3 AS INTEGER), 'the' FROM k
        UNION ALL SELECT CAST(mx + 4 AS INTEGER), 'e</w>' FROM k""".stripMargin.trim)),

    Q("q_compression_window",
      // DEFLATE compressibility flags: DuckDB exposes no deflate/zlib
      // function, so no SQL oracle is possible for this query in
      // principle; the kernel is instead differentially pinned against
      // java.util.zip.Deflater in OperatorsSpec (bit-exact byte counts),
      // which is the stronger check anyway — same codec family the
      // production pipeline would use.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        operators.TextOps.compressionMetrics(
          Tables.load(s, dir)("documents"))
          .select("doc_id", "raw_bytes", "deflate_bytes", "flag_compression")
      },
      None),

    // --- LLM-pipeline operators: multimodal plumbing ----------------------
    Q("q_multimodal_features",
      (s, dir) => operators.Multimodal
        .featureTable(s, Tables.load(s, dir)("documents"))
        .select("media_id", "kind", "byte_len", "sha", "frames_sampled"),
      Some("SELECT doc_id AS media_id, " +
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "CAST(strlen(text) AS INTEGER) AS byte_len, sha256(text) AS sha, " +
        "CAST(CASE WHEN doc_id % 3 = 2 THEN " +
        "floor((greatest(1, floor(strlen(text) / 4096)) + 9) / 10) ELSE 1 END AS INTEGER) AS frames_sampled " +
        "FROM documents")),

    Q("q_multimodal_audio",
      // audio twin of the image-dimension path: real RIFF/WAVE headers
      // (synthetic but bit-genuine), probeWav wired through
      // extractFeatures → header-only duration/channel/rate filters
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        operators.Multimodal
          .extractFeatures(operators.Multimodal
            .syntheticWavMedia(s, Tables.load(s, dir)("documents")))
          .toDF()
          .select(col("media_id"), col("channels"), col("sample_rate"),
            col("duration_ms"), col("byte_len"))
      },
      Some("SELECT doc_id AS media_id, " +
        "CAST(1 + doc_id % 2 AS INTEGER) AS channels, " +
        "CAST(8000 * (1 + doc_id % 4) AS INTEGER) AS sample_rate, " +
        "CAST((strlen(text) * 1000) // (8000 * (1 + doc_id % 4) * (1 + doc_id % 2) * 2) AS BIGINT) AS duration_ms, " +
        "CAST(strlen(text) + 44 AS INTEGER) AS byte_len " +
        "FROM documents")),

    Q("q_multimodal_exif",
      // EXIF/TIFF metadata byte-probe over hand-built literal payloads:
      // JPEG APP1 + little-endian TIFF with DateTimeOriginal and a GPS
      // IFD, big-endian standalone TIFF, a corrupt IFD (offset past the
      // buffer), an exif-less JPEG, orientation-only, GPS-only — the
      // oracle is the hand-computed decision table (every payload is
      // deterministic bytes, so orientation/timestamp/GPS-presence are
      // computable by inspection)
      (s, dir) => operators.Multimodal.exifFixture(s),
      Some("""
        SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), true, CAST(6 AS INTEGER), '2023:12:31 23:59:58', true),
          (CAST(2 AS BIGINT), true, CAST(1 AS INTEGER), '2024:05:06 07:08:09', false),
          (CAST(3 AS BIGINT), false, CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), false),
          (CAST(4 AS BIGINT), false, CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), false),
          (CAST(5 AS BIGINT), true, CAST(3 AS INTEGER), CAST(NULL AS VARCHAR), false),
          (CAST(6 AS BIGINT), true, CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), true)
        ) AS t(media_id, exif_ok, orientation, captured_at, has_gps)""".stripMargin.trim)),

    Q("q_multimodal_decode",
      // REAL image pixel decode (JDK ImageIO — no native codec) over the
      // deterministic image fixture: a hand-built BMP (every byte placed
      // by the fixture), lossless PNG/GIF constructions, a solid JPEG
      // (only the uniform-image hash contract is pinned — lossy means),
      // corrupt bytes, and a WebP header (probes as webp, JDK has no
      // reader → decode_ok=false). The oracle is the hand-computed
      // feature table from the documented integer-luma + box-downsample
      // + aHash/dHash spec — pixels are construction literals, so every
      // non-JPEG value is closed-form
      (s, dir) => {
        import org.apache.spark.sql.functions._
        operators.Multimodal.imageFeatures(operators.Multimodal.imageFixture(s))
          .select(col("media_id"), col("decode_ok"), col("format"),
            col("width"), col("height"), col("ahash"), col("dhash"),
            // JPEG channel means are codec-approximate: shaped out here,
            // not in the operator
            when(col("media_id") =!= 4, round(col("mean_r"), 6)).as("mean_r"),
            when(col("media_id") =!= 4, round(col("gray_mean"), 6)).as("gray_mean"))
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), true, 'bmp', CAST(8 AS INTEGER), CAST(8 AS INTEGER),
           CAST(-1085102592571150096 AS BIGINT), CAST(-72340172838076674 AS BIGINT),
           CAST(56.0 AS DOUBLE), CAST(56.0 AS DOUBLE)),
          (2, true, 'png', 16, 16, -4294967296, 0, 56.0, 56.0),
          (3, true, 'gif', 8, 8, -1085102592571150096, 1157442765409226768, 127.5, 127.5),
          (4, true, 'jpeg', 32, 16, 0, 0, NULL, NULL),
          (5, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
          (6, false, 'webp', NULL, NULL, NULL, NULL, NULL, NULL)
        ) AS t(media_id, decode_ok, format, width, height, ahash, dhash,
               mean_r, gray_mean)""".stripMargin.trim)),

    Q("q_image_thumbnail",
      // materialized resize: the 8×8 / 16×16 lossless fixture images
      // box-resampled to 4×4 luma grids — the same pinned integer-floor
      // kernel the hashes consume, so thumbnail and hash can never
      // drift. Block means are closed-form in the constructions: the
      // column gradient averages 2-col pairs to 8+32·(pos%4), the
      // 16×16 row bands average 4-row blocks to 8+32·(pos/4), the
      // half/half page to 0/0/255/255 per row. JPEG is lossy → excluded
      // by construction (ids 1-3 only)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        operators.Multimodal.imageThumbnail(
            operators.Multimodal.imageFixture(s).where(col("media_id") <= 3), 4, 4)
          .select(col("media_id"),
            posexplode(col("thumb")).as(Seq("pos", "luma")))
      },
      Some("""
        SELECT media_id, CAST(pos AS INTEGER) AS pos,
          CASE media_id
            WHEN 1 THEN CAST(8 + 32 * (pos % 4) AS DOUBLE)
            WHEN 2 THEN CAST(8 + 32 * (pos // 4) AS DOUBLE)
            ELSE CAST(CASE WHEN pos % 4 >= 2 THEN 255 ELSE 0 END AS DOUBLE)
          END AS luma
        FROM (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS media_id),
             (SELECT unnest(range(16)) AS pos)""".stripMargin.trim)),

    Q("q_image_neardup",
      // perceptual image near-dup — the pixel twin of SimHash text dedup:
      // aHash signatures from REAL decoded pixels, then the existing
      // 16-bit pigeonhole banding + Hamming verify
      // (Dedup.simHashPairsFromSignatures, full recall at dist ≤ 3). The
      // fixture plants a 2-bit pair (one swapped cell pair preserving the
      // mean) and a 0-bit pair (same luma grid via DIFFERENT formats and
      // pixel dimensions — the recompressed-copy case). The oracle
      // replays banding + bit_count(xor) from the hand-computed aHash
      // literals, independent of the Scala chunking code
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val sigs = operators.Multimodal
          .imageFeatures(operators.Multimodal.imageNearDupFixture(s))
          .where(col("decode_ok"))
          .select(col("media_id").as("doc_id"), col("ahash").as("sig"))
        operators.Dedup.simHashPairsFromSignatures(sigs, maxDist = 3)
      },
      Some("""
        WITH sigs(id, sig) AS (VALUES
          (CAST(10 AS BIGINT), CAST(-1085102592571150096 AS BIGINT)),
          (11, -1085102592571150111),
          (12, -4294967296),
          (13, -4294967296),
          (14, -6172840429334713771)),
        b AS (
          SELECT id, sig, c, (sig >> (16 * c)) & 65535 AS key
          FROM sigs, (SELECT unnest(range(4)) AS c)),
        cand AS (
          SELECT DISTINCT x.id AS doc_a, y.id AS doc_b, x.sig AS sa, y.sig AS sb
          FROM b x JOIN b y ON x.c = y.c AND x.key = y.key AND x.id < y.id)
        SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS dist
        FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin.trim)),

    Q("q_image_phash",
      // DCT perceptual hash over the textured fixture: a rich 16×16
      // texture and its 2× nearest-neighbor upscale hash IDENTICALLY
      // (the 32×32 box downsample reproduces the same grid — the
      // resize-robustness property pHash exists for), the checkerboard
      // is distinct, the uniform image pins the all-AC-at-median → 0
      // convention. Oracle literals come from an independent replica of
      // the documented spec (box downsample, orthonormal DCT-II, 6dp
      // coefficient quantization, strict-above-median bits)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        operators.Multimodal.imageFeatures(operators.Multimodal.pHashFixture(s))
          .select(col("media_id"), col("decode_ok"), col("phash"))
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(20 AS BIGINT), true, CAST(7160629319854493870 AS BIGINT)),
          (21, true, 7160629319854493870),
          (22, true, -6196766167432910336),
          (23, true, 0)
        ) AS t(media_id, decode_ok, phash)""".stripMargin.trim)),

    Q("q_wav_decode",
      // REAL WAV PCM sample decode (pure byte arithmetic): square waves
      // of amplitude 1000·(1+id%3) and 10+(id%5) periods of 8 frames, so
      // RMS = amplitude EXACTLY, crossings = 2·periods−1; plus an 8-bit
      // variant, a stereo row (channel-0 stats — silent channel 1 must
      // not dilute), an IEEE-float WAV and corrupt bytes (both refuse).
      // The oracle is the closed-form table
      (s, dir) => {
        import org.apache.spark.sql.functions._
        operators.Multimodal.wavStats(operators.Multimodal.wavPcmFixture(s))
          .select(col("media_id"), col("pcm_ok"), col("channels"),
            col("sample_rate"), col("bits"), col("n_frames"),
            col("duration_ms"), round(col("rms"), 6).as("rms"),
            col("peak"), col("zero_crossings"))
      },
      Some("""
        WITH sq AS (
          SELECT id,
            1000 * (1 + id % 3) AS amp,
            10 + (id % 5) AS periods
          FROM (SELECT unnest(range(20, 26)) AS id))
        SELECT CAST(id AS BIGINT) AS media_id, true AS pcm_ok,
          CAST(1 AS INTEGER) AS channels, CAST(8000 AS INTEGER) AS sample_rate,
          CAST(16 AS INTEGER) AS bits, CAST(periods * 8 AS BIGINT) AS n_frames,
          CAST(periods AS BIGINT) AS duration_ms, CAST(amp AS DOUBLE) AS rms,
          CAST(amp AS INTEGER) AS peak, CAST(2 * periods - 1 AS BIGINT) AS zero_crossings
        FROM sq
        UNION ALL SELECT * FROM (VALUES
          (CAST(26 AS BIGINT), true, CAST(1 AS INTEGER), CAST(8000 AS INTEGER),
           CAST(8 AS INTEGER), CAST(80 AS BIGINT), CAST(10 AS BIGINT),
           CAST(50.0 AS DOUBLE), CAST(50 AS INTEGER), CAST(19 AS BIGINT)),
          (27, true, 2, 16000, 16, 96, 6, 3000.0, 3000, 23),
          (28, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
          (29, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL)
        ) AS t(media_id, pcm_ok, channels, sample_rate, bits, n_frames,
               duration_ms, rms, peak, zero_crossings)""".stripMargin.trim)),

    Q("q_media_funcs",
      // the media kernels as DIALECT scalars (the SQL surface is the
      // product): header probe (image_format/width/height — fills for
      // codec-less WebP too, and gates the corrupt row in WHERE before
      // any decode), perceptual hashes, and the hamming64 near-dup
      // verify — over the same imageFixture whose feature literals
      // q_multimodal_decode pinned. The oracle re-derives hd from the
      // hash literals, so the dialect lowering chain (parse → UDF →
      // getField → bit_count) is what's under test
      (s, dir) => {
        val t = Tables.load(s, dir) +
          ("images" -> operators.Multimodal.imageFixture(s))
        GraftEngine.sql(
          "SELECT media_id, image_ok(bytes) AS ok, " +
            "image_format(bytes) AS fmt, image_width(bytes) AS w, " +
            "image_height(bytes) AS h, image_ahash(bytes) AS ah, " +
            "image_dhash(bytes) AS dh, " +
            "hamming64(image_ahash(bytes), image_dhash(bytes)) AS hd " +
            "FROM images WHERE image_width(bytes) >= 8", t)
      },
      Some("""
        WITH v(media_id, ok, fmt, w, h, ah, dh) AS (VALUES
          (CAST(1 AS BIGINT), true, 'bmp', CAST(8 AS INTEGER), CAST(8 AS INTEGER),
           CAST(-1085102592571150096 AS BIGINT), CAST(-72340172838076674 AS BIGINT)),
          (2, true, 'png', 16, 16, -4294967296, 0),
          (3, true, 'gif', 8, 8, -1085102592571150096, 1157442765409226768),
          (4, true, 'jpeg', 32, 16, 0, 0),
          (6, false, 'webp', 8, 8, NULL, NULL))
        SELECT media_id, ok, fmt, w, h, ah, dh,
          CAST(bit_count(xor(ah, dh)) AS INTEGER) AS hd
        FROM v""".stripMargin.trim)),

    Q("q_media_funcs2",
      // WAV PCM dialect scalars with wav_ok as the WHERE gate (drops the
      // float-format and corrupt rows before any stat is read); the
      // square-wave fixture keeps every statistic closed-form
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val t = Tables.load(s, dir) +
          ("wavs" -> operators.Multimodal.wavPcmFixture(s))
        GraftEngine.sql(
          "SELECT media_id, round(wav_rms(bytes), 6) AS rms, " +
            "wav_peak(bytes) AS peak, wav_duration_ms(bytes) AS dur_ms, " +
            "wav_crossings(bytes) AS zc FROM wavs WHERE wav_ok(bytes)", t)
      },
      Some("""
        WITH sq AS (
          SELECT id, 1000 * (1 + id % 3) AS amp, 10 + (id % 5) AS periods
          FROM (SELECT unnest(range(20, 26)) AS id))
        SELECT CAST(id AS BIGINT) AS media_id, CAST(amp AS DOUBLE) AS rms,
          CAST(amp AS INTEGER) AS peak, CAST(periods AS BIGINT) AS dur_ms,
          CAST(2 * periods - 1 AS BIGINT) AS zc
        FROM sq
        UNION ALL SELECT * FROM (VALUES
          (CAST(26 AS BIGINT), CAST(50.0 AS DOUBLE), CAST(50 AS INTEGER),
           CAST(10 AS BIGINT), CAST(19 AS BIGINT)),
          (27, 3000.0, 3000, 6, 23)
        ) AS t(media_id, rms, peak, dur_ms, zc)""".stripMargin.trim)),

    Q("q_media_funcs3",
      // image_phash and exif_orientation on the dialect surface, set-op
      // composed: the pHash fixture's pinned literals (incl. the 2×
      // resize-identity pair 20≡21) union the EXIF fixture's orientation
      // table (JPEG APP1 walk incl. corrupt-IFD and no-APP1 rows → NULL)
      (s, dir) => {
        val t = Tables.load(s, dir) +
          ("phimgs" -> operators.Multimodal.pHashFixture(s)) +
          ("exifs" -> operators.Multimodal.exifBytesFixture(s)) +
          ("envwavs" -> operators.Multimodal.wavEnvelopeFixture(s))
        GraftEngine.sql(
          "SELECT media_id, image_phash(bytes) AS v FROM phimgs " +
            "WHERE image_ok(bytes) " +
            "UNION ALL " +
            "SELECT media_id, cast(exif_orientation(bytes), 'bigint') AS v " +
            "FROM exifs " +
            "UNION ALL " +
            "SELECT media_id, wav_envelope_hash(bytes) AS v FROM envwavs", t)
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(20 AS BIGINT), CAST(7160629319854493870 AS BIGINT)),
          (21, 7160629319854493870),
          (22, -6196766167432910336),
          (23, 0),
          (1, 6), (2, 1), (3, NULL), (4, NULL), (5, 3), (6, NULL),
          (30, 4294967295), (31, 4294967295), (32, -4294967296),
          (33, 12884901887), (34, 0)
        ) AS t(media_id, v)""".stripMargin.trim)),

    Q("q_media_funcs4",
      // the codec-free audio/video header probes as dialect scalars:
      // audio_* (WAV→FLAC→MP3 chain — format routing + channel/rate/
      // length gates with zero sample access), mp3_frame_count (strict
      // complete-frame walk), mp4_duration_ms (mvhd). The cross-
      // container rows are part of the test: every probe must return
      // NULL on a foreign/corrupt container, never garbage
      (s, dir) => {
        val t = Tables.load(s, dir) +
          ("mp3s" -> operators.Multimodal.mp3Fixture(s)) +
          ("mp4s" -> operators.Multimodal.mp4Fixture(s))
        GraftEngine.sql(
          "SELECT media_id, audio_format(bytes) AS fmt, " +
            "audio_channels(bytes) AS ch, audio_rate(bytes) AS rate, " +
            "audio_duration_ms(bytes) AS dur_ms, " +
            "mp3_frame_count(bytes) AS frames FROM mp3s " +
            "UNION ALL " +
            "SELECT media_id, audio_format(bytes) AS fmt, " +
            "audio_channels(bytes) AS ch, audio_rate(bytes) AS rate, " +
            "mp4_duration_ms(bytes) AS dur_ms, " +
            "mp3_frame_count(bytes) AS frames FROM mp4s", t)
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(50 AS BIGINT), 'mp3', CAST(2 AS INTEGER),
           CAST(24000 AS INTEGER), CAST(96 AS BIGINT), CAST(4 AS INTEGER)),
          (51, 'mp3', 2, 24000, 73, 3),
          (52, 'mp3', 2, 24000, 60, 2),
          (53, NULL, NULL, NULL, NULL, NULL),
          (40, NULL, NULL, NULL, 800, NULL),
          (41, NULL, NULL, NULL, 1200, NULL),
          (42, NULL, NULL, NULL, 12, NULL),
          (43, NULL, NULL, NULL, NULL, NULL)
        ) AS t(media_id, fmt, ch, rate, dur_ms, frames)""".stripMargin.trim)),

    Q("q_media_funcs5",
      // the animated-vs-static GIF gate as dialect scalars over the
      // hand-placed block fixture (delays 5/10/20 cs, NETSCAPE loop 0;
      // single static frame; truncated and non-GIF rows refuse to
      // NULL). gif_frames also runs as a WHERE gate — the actual
      // curation shape ("drop multi-frame GIFs from the image corpus")
      (s, dir) => {
        val t = Tables.load(s, dir) +
          ("gifs" -> operators.Multimodal.gifAnimFixture(s))
        GraftEngine.sql(
          "SELECT media_id, gif_frames(bytes) AS frames, " +
            "gif_duration_ms(bytes) AS dur_ms, gif_loops(bytes) AS loops, " +
            "gif_frames(bytes) > 1 AS animated FROM gifs", t)
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(60 AS BIGINT), CAST(3 AS INTEGER), CAST(350 AS BIGINT),
           CAST(0 AS INTEGER), true),
          (61, 1, 0, NULL, false),
          (62, NULL, NULL, NULL, NULL),
          (63, NULL, NULL, NULL, NULL)
        ) AS t(media_id, frames, dur_ms, loops, animated)""".stripMargin.trim)),

    Q("q_pdf_extract",
      // scan-based PDF text extraction (PdfOps): stream framing, real
      // FlateDecode via the JDK Inflater, BT..ET text operators (Tj
      // chains, octal escapes, kerned TJ array, T* line break, hex
      // string), a /DCTDecode image stream counted-but-skipped, a
      // corrupt-deflate stream skipped with pages still read, and a
      // non-PDF row flagged. Every value is a construction literal
      (s, dir) => operators.PdfOps.pdfTextPlan(operators.PdfOps.pdfFixture(s)),
      Some("""
        SELECT * FROM (VALUES
          (CAST(70 AS BIGINT), true, CAST(2 AS INTEGER), CAST(3 AS INTEGER),
           CAST(2 AS INTEGER),
           'Hello World(!)' || chr(10) || 'Second line' || chr(10) || 'Hello2'),
          (71, true, 1, 1, 0, ''),
          (72, false, NULL, NULL, NULL, NULL),
          (73, true, 1, 1, 0, '')
        ) AS t(doc_id, pdf_ok, pages, n_streams, n_text_streams, text)""".stripMargin.trim)),

    Q("q_pdf_funcs",
      // the PDF extractor as dialect scalars, pdf_ok as the WHERE gate
      // (the crawl-routing shape: non-PDF payloads drop before any
      // inflate); pdf_text composes with the text kernels — token count
      // over the extracted text proves the chain feeds the pipeline
      (s, dir) => {
        val t = Tables.load(s, dir) +
          ("pdfs" -> operators.PdfOps.pdfFixture(s))
        GraftEngine.sql(
          "SELECT doc_id, pdf_pages(bytes) AS pages, " +
            "pdf_text(bytes) AS text, " +
            "token_count(pdf_text(bytes)) AS toks " +
            "FROM pdfs WHERE pdf_ok(bytes)", t)
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(70 AS BIGINT), CAST(2 AS INTEGER),
           'Hello World(!)' || chr(10) || 'Second line' || chr(10) || 'Hello2',
           CAST(5 AS INTEGER)),
          (71, 1, '', 0),
          (73, 1, '', 0)
        ) AS t(doc_id, pages, text, toks)""".stripMargin.trim)),

    Q("q_wiki_extract",
      // wikitext → text on the dialect surface (Wikipedia-dump corpora):
      // nested template/table strip, link-label rewrite, File-link drop
      // incl. a nested caption link, ref removal, heading fences and
      // list markers to plain lines — then the shared html extractor
      // chain. The walk is nesting-aware (not regex-expressible), so
      // the oracle pins construction-literal outputs, like q_pdf_extract
      (s, dir) => {
        import s.implicits._
        val wiki = Seq(
          (1L, "'''Alpha''' is a [[Greek alphabet|letter]]." +
            "{{Infobox|a=1|b={{nested}}}} See [[beta]]." +
            "<ref name=\"x\">cite</ref>\n== History ==\n* item one\n" +
            "* item two\n{| class=\"t\"\n|cell\n|}\n" +
            "External [http://e.com/x site] and " +
            "[[File:Pic.png|thumb|A [[caption]] here]] done."),
          (2L, "a{{unclosed template c"),
          (3L, "* one\n* two\n== H ==\n''x''")
        ).toDF("doc_id", "text")
        val t = Tables.load(s, dir) + ("wiki" -> wiki)
        GraftEngine.sql(
          "SELECT doc_id, wiki_text(text) AS text, " +
            "token_count(wiki_text(text)) AS toks FROM wiki", t)
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(1 AS BIGINT),
           'Alpha is a letter. See beta.' || chr(10) || 'History' ||
           chr(10) || 'item one' || chr(10) || 'item two' || chr(10) ||
           'External site and done.', CAST(15 AS INTEGER)),
          (2, 'a', 1),
          (3, 'one' || chr(10) || 'two' || chr(10) || 'H' || chr(10) || 'x', 4)
        ) AS t(doc_id, text, toks)""".stripMargin.trim)),

    Q("q_latex_extract",
      // LaTeX → text on the dialect surface (arXiv corpora): preamble/
      // reference commands and math/float environments drop, sectioning
      // arguments become lines, unknown commands keep braced content,
      // escaped specials survive. Nesting-aware walk → literal oracle,
      // like q_wiki_extract
      (s, dir) => {
        import s.implicits._
        val tex = Seq(
          (1L, "\\documentclass{article}\n\\title{A Study of Things}\n" +
            "\\begin{document}\n\\section{Intro}\n" +
            "We study $x^2 + y$ things~\\cite{smith2020}.\n" +
            "\\textbf{Bold claim} holds.\n% comment\n" +
            "\\begin{equation}\nE = mc^2\n\\end{equation}\n" +
            "The result is 42\\%.\n" +
            "See \\href{http://x.org}{the site}.\n\\end{document}\n"),
          (2L, "broken $math never closes"),
          (3L, "row one\\\\row two")
        ).toDF("doc_id", "text")
        val t = Tables.load(s, dir) + ("tex" -> tex)
        GraftEngine.sql(
          "SELECT doc_id, latex_text(text) AS text, " +
            "token_count(latex_text(text)) AS toks FROM tex", t)
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(1 AS BIGINT),
           'A Study of Things' || chr(10) || 'Intro' || chr(10) ||
           'We study things .' || chr(10) || 'Bold claim holds.' ||
           chr(10) || 'The result is 42%.' || chr(10) || 'See the site.',
           CAST(19 AS INTEGER)),
          (2, 'broken', 1),
          (3, 'row one' || chr(10) || 'row two', 4)
        ) AS t(doc_id, text, toks)""".stripMargin.trim)),

    Q("q_zip_entries",
      // bounded zip entry listing (JDK ZipInputStream walk): names,
      // dir flags and UNCOMPRESSED sizes counted from the inflate —
      // nothing materialized; corrupt/non-zip rows flag. Sizes replay
      // as length() of the same construction literals
      (s, dir) => operators.ArchiveOps.zipListPlan(
        operators.ArchiveOps.zipFixture(s)),
      Some("""
        SELECT * FROM (VALUES
          (CAST(90 AS BIGINT), true, 'mimetype', false, CAST(20 AS BIGINT)),
          (90, true, 'META-INF/container.xml', false,
           length('<?xml version="1.0"?><container><rootfiles><rootfile full-path="OEBPS/content.opf"/></rootfiles></container>')),
          (90, true, 'OEBPS/content.opf', false,
           length('<package><manifest><item id="c1" href="ch1.xhtml"/><item id="c2" href="ch2.xhtml"/><item id="im" href="img.png"/></manifest><spine><itemref idref="c2"/><itemref idref="c1"/></spine></package>')),
          (90, true, 'OEBPS/ch1.xhtml', false,
           length('<html><body><p>Chapter one text</p></body></html>')),
          (90, true, 'OEBPS/ch2.xhtml', false,
           length('<html><body><p>Chapter two text</p></body></html>')),
          (90, true, 'OEBPS/img.png', false, 8),
          (91, true, 'a.html', false, 12),
          (91, true, 'b.html', false, 11),
          (92, false, NULL, NULL, NULL),
          (93, false, NULL, NULL, NULL)
        ) AS t(doc_id, zip_ok, entry, is_dir, size)""".stripMargin.trim)),

    Q("q_epub_extract",
      // EPUB → reading-order text: container.xml → OPF spine (which
      // orders chapter 2 BEFORE chapter 1 — reading order must beat
      // archive order), html-to-text through the SAME extractor chain
      // as q_html_extract; the plain zip row exercises the no-OPF
      // archive-order fallback
      (s, dir) => operators.ArchiveOps.epubTextPlan(
        operators.ArchiveOps.zipFixture(s)),
      Some("""
        SELECT * FROM (VALUES
          (CAST(90 AS BIGINT), true, CAST(6 AS INTEGER), CAST(2 AS INTEGER),
           'Chapter two text' || chr(10) || 'Chapter one text'),
          (91, true, 2, 2, 'alpha' || chr(10) || 'beta'),
          (92, false, NULL, NULL, NULL),
          (93, false, NULL, NULL, NULL)
        ) AS t(doc_id, epub_ok, n_entries, n_docs, text)""".stripMargin.trim)),

    Q("q_epub_funcs",
      // the archive scalars on the dialect surface, zip_ok as the
      // WHERE gate; token_count over epub_text proves the books front
      // door feeds the text pipeline like any other source
      (s, dir) => {
        val t = Tables.load(s, dir) +
          ("zips" -> operators.ArchiveOps.zipFixture(s))
        GraftEngine.sql(
          "SELECT doc_id, epub_docs(bytes) AS docs, " +
            "epub_text(bytes) AS text, " +
            "token_count(epub_text(bytes)) AS toks " +
            "FROM zips WHERE zip_ok(bytes)", t)
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(90 AS BIGINT), CAST(2 AS INTEGER),
           'Chapter two text' || chr(10) || 'Chapter one text',
           CAST(6 AS INTEGER)),
          (91, 2, 'alpha' || chr(10) || 'beta', 2)
        ) AS t(doc_id, docs, text, toks)""".stripMargin.trim)),

    Q("q_wav_segments",
      // energy segmentation of decoded PCM (the speech-span extractor
      // that pairs with subtitle transcripts): relative threshold,
      // window-granular spans, the fixture's 150 ms gap merges under
      // the default 200 ms floor, active-only rms replayed closed-form
      // (sqrt((20·1000² + 10·2000²)/30)); all-silence decodes to a
      // NULL-segment row, corrupt flags
      (s, dir) => {
        import org.apache.spark.sql.functions._
        operators.Multimodal.wavSegmentPlan(operators.Multimodal.wavSegFixture(s))
          .select(col("media_id"), col("pcm_ok"), col("segment"),
            col("start_ms"), col("end_ms"), col("active_ms"),
            round(col("rms"), 6).as("rms"))
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(110 AS BIGINT), true, CAST(1 AS INTEGER),
           CAST(100 AS BIGINT), CAST(550 AS BIGINT), CAST(300 AS BIGINT),
           round(sqrt(2000000.0), 6)),
          (111, true, NULL, NULL, NULL, NULL, NULL),
          (112, false, NULL, NULL, NULL, NULL, NULL)
        ) AS t(media_id, pcm_ok, segment, start_ms, end_ms, active_ms, rms)""".stripMargin.trim)),

    Q("q_auto_extract",
      // the one-call front door on the dialect surface: magic-byte
      // sniffing (content-type labels lie) routing to the matching
      // extractor — html, pdf, epub, docx, vtt, gzip-then-reroute
      // (one level; double-gzip nulls), textless mp4 keeps its label
      // with NULL text, plain text normalizes
      (s, dir) => {
        import s.implicits._
        def row(df: DataFrame, id: Long): Array[Byte] =
          df.collect().find(_.getLong(0) == id).get.getAs[Array[Byte]](1)
        def gz(data: Array[Byte]): Array[Byte] = {
          val bos = new java.io.ByteArrayOutputStream()
          val gos = new java.util.zip.GZIPOutputStream(bos)
          gos.write(data); gos.close()
          bos.toByteArray
        }
        def utf8(x: String) =
          x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val mixed = Seq(
          (1L, utf8("<html><body><p>web page</p></body></html>")),
          (2L, row(operators.PdfOps.pdfFixture(s), 70L)),
          (3L, row(operators.ArchiveOps.zipFixture(s), 90L)),
          (4L, row(operators.ArchiveOps.docxFixture(s), 94L)),
          (5L, utf8("WEBVTT\n\n00:01.000 --> 00:02.000\ncaption line")),
          (6L, gz(utf8("<html><body><p>gzipped page</p></body></html>"))),
          (7L, gz(gz(utf8("double gzip")))),
          (8L, row(operators.Multimodal.mp4Fixture(s), 40L)),
          (9L, utf8("plain text stays  itself")),
          (10L, utf8("\\documentclass{article}\\begin{document}" +
            "\\section{A}body text $x$\\end{document}"))
        ).toDF("doc_id", "bytes")
        val t = Tables.load(s, dir) + ("mixed" -> mixed)
        GraftEngine.sql(
          "SELECT doc_id, sniff_format(bytes) AS format, " +
            "auto_text(bytes) AS text FROM mixed", t)
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), 'html', 'web page'),
          (2, 'pdf', 'Hello World(!)' || chr(10) || 'Second line' ||
           chr(10) || 'Hello2'),
          (3, 'epub', 'Chapter two text' || chr(10) || 'Chapter one text'),
          (4, 'docx', 'Para one & more' || chr(10) || 'Para two'),
          (5, 'vtt', 'caption line'),
          (6, 'gzip', 'gzipped page'),
          (7, 'gzip', NULL),
          (8, 'mp4', NULL),
          (9, 'text', 'plain text stays itself'),
          (10, 'latex', 'A' || chr(10) || 'body text')
        ) AS t(doc_id, format, text)""".stripMargin.trim)),

    Q("q_extract_report",
      // the per-format ingestion audit over the same mixed batch: one
      // routed scan + one tiny-key aggregation; the oracle DERIVES the
      // report by aggregating the q_auto_extract literals — the two
      // views can never drift
      (s, dir) => {
        import s.implicits._
        def row(df: DataFrame, id: Long): Array[Byte] =
          df.collect().find(_.getLong(0) == id).get.getAs[Array[Byte]](1)
        def gz(data: Array[Byte]): Array[Byte] = {
          val bos = new java.io.ByteArrayOutputStream()
          val gos = new java.util.zip.GZIPOutputStream(bos)
          gos.write(data); gos.close()
          bos.toByteArray
        }
        def utf8(x: String) =
          x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val mixed = Seq(
          (1L, utf8("<html><body><p>web page</p></body></html>")),
          (2L, row(operators.PdfOps.pdfFixture(s), 70L)),
          (3L, row(operators.ArchiveOps.zipFixture(s), 90L)),
          (4L, row(operators.ArchiveOps.docxFixture(s), 94L)),
          (5L, utf8("WEBVTT\n\n00:01.000 --> 00:02.000\ncaption line")),
          (6L, gz(utf8("<html><body><p>gzipped page</p></body></html>"))),
          (7L, gz(gz(utf8("double gzip")))),
          (8L, row(operators.Multimodal.mp4Fixture(s), 40L)),
          (9L, utf8("plain text stays  itself")),
          (10L, utf8("\\documentclass{article}\\begin{document}" +
            "\\section{A}body text $x$\\end{document}"))
        ).toDF("doc_id", "bytes")
        operators.Extract.extractionReport(mixed)
      },
      Some("""
        SELECT format, count(*) AS n_docs, count(text) AS n_extracted,
          CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS text_chars
        FROM (VALUES
          (CAST(1 AS BIGINT), 'html', 'web page'),
          (2, 'pdf', 'Hello World(!)' || chr(10) || 'Second line' ||
           chr(10) || 'Hello2'),
          (3, 'epub', 'Chapter two text' || chr(10) || 'Chapter one text'),
          (4, 'docx', 'Para one & more' || chr(10) || 'Para two'),
          (5, 'vtt', 'caption line'),
          (6, 'gzip', 'gzipped page'),
          (7, 'gzip', NULL),
          (8, 'mp4', NULL),
          (9, 'text', 'plain text stays itself'),
          (10, 'latex', 'A' || chr(10) || 'body text')
        ) AS t(doc_id, format, text)
        GROUP BY format""".stripMargin.trim)),

    Q("q_subtitles",
      // SRT/WebVTT cue parsing (the text⇄media alignment layer): CRLF
      // SRT with multi-line cues and tags, VTT with header/NOTE blocks,
      // cue ids, per-cue settings, optional hours; walk-order cue
      // numbering; the no-timing row flags
      (s, dir) => operators.SubtitleOps.cuePlan(
        operators.SubtitleOps.subtitleFixture(s)),
      Some("""
        SELECT * FROM (VALUES
          (CAST(100 AS BIGINT), true, CAST(1 AS INTEGER),
           CAST(1000 AS BIGINT), CAST(4500 AS BIGINT), 'Hello there.'),
          (100, true, 2, 5250, 7000, 'Two lines' || chr(10) || 'of text'),
          (101, true, 1, 65000, 67500, 'Styled cue'),
          (101, true, 2, 3600000, 3602000, 'With hours'),
          (102, false, NULL, NULL, NULL, NULL)
        ) AS t(media_id, sub_ok, cue, start_ms, end_ms, text)""".stripMargin.trim)),

    Q("q_subtitle_funcs",
      // subtitles as a text DOCUMENT on the dialect surface: cue text
      // joined in order feeds token counting like any other source
      (s, dir) => {
        val t = Tables.load(s, dir) +
          ("subs" -> operators.SubtitleOps.subtitleFixture(s))
        GraftEngine.sql(
          "SELECT media_id, subtitle_text(content) AS text, " +
            "token_count(if_null(subtitle_text(content), '')) AS toks " +
            "FROM subs", t)
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(100 AS BIGINT),
           'Hello there.' || chr(10) || 'Two lines' || chr(10) || 'of text',
           CAST(6 AS INTEGER)),
          (101, 'Styled cue' || chr(10) || 'With hours', 4),
          (102, NULL, 0)
        ) AS t(media_id, text, toks)""".stripMargin.trim)),

    Q("q_docx_funcs",
      // DOCX → text on the dialect surface: the OOXML document member
      // through the shared extractor, paragraph closes as line breaks;
      // a zip without the member and a non-zip both null out
      (s, dir) => {
        val t = Tables.load(s, dir) +
          ("docs" -> operators.ArchiveOps.docxFixture(s))
        GraftEngine.sql(
          "SELECT doc_id, docx_text(bytes) AS text, " +
            "token_count(if_null(docx_text(bytes), '')) AS toks " +
            "FROM docs", t)
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(94 AS BIGINT),
           'Para one & more' || chr(10) || 'Para two', CAST(6 AS INTEGER)),
          (95, NULL, 0),
          (96, NULL, 0)
        ) AS t(doc_id, text, toks)""".stripMargin.trim)),

    Q("q_tar_entries",
      // checksum-validated tar walk behind signature-detected gzip
      // (tar.gz and raw tar list identically); corrupt checksum,
      // plain-gzip-not-tar, and non-archive rows all flag
      (s, dir) => operators.ArchiveOps.tarListPlan(
        operators.ArchiveOps.tarFixture(s)),
      Some("""
        SELECT * FROM (VALUES
          (CAST(95 AS BIGINT), true, 'a/', true, CAST(0 AS BIGINT)),
          (95, true, 'a/doc1.txt', false, 9),
          (95, true, 'doc2.txt', false, 5),
          (96, true, 'a/', true, 0),
          (96, true, 'a/doc1.txt', false, 9),
          (96, true, 'doc2.txt', false, 5),
          (97, false, NULL, NULL, NULL),
          (98, false, NULL, NULL, NULL),
          (99, false, NULL, NULL, NULL)
        ) AS t(doc_id, tar_ok, entry, is_dir, size)""".stripMargin.trim)),

    Q("q_archive_extract",
      // member EXPLOSION: one archive row in, one row per regex-matched
      // member out (zip, tar and tar.gz through one plan) — the corpus
      // shape feeding auto_text; corrupt archives and the
      // gzip-but-not-tar row keep a flagged row
      (s, dir) => {
        import org.apache.spark.sql.functions._
        operators.ArchiveOps.archiveExtractPlan(
          operators.ArchiveOps.tarFixture(s), ".*\\.txt")
          .select(col("doc_id"), col("archive_ok"), col("entry"),
            decode(col("entry_bytes"), "UTF-8").as("text"))
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(95 AS BIGINT), true, 'a/doc1.txt', 'hello tar'),
          (95, true, 'doc2.txt', 'world'),
          (96, true, 'a/doc1.txt', 'hello tar'),
          (96, true, 'doc2.txt', 'world'),
          (97, false, NULL, NULL),
          (98, false, NULL, NULL),
          (99, false, NULL, NULL)
        ) AS t(doc_id, archive_ok, entry, text)""".stripMargin.trim)),

    Q("q_gzip_funcs",
      // gzip dialect scalars: gzip_ok as the routing gate, gunzip_text
      // feeding the text pipeline (token_count over the inflated
      // member) — the compressed-payload shape crawl archives actually
      // ship
      (s, dir) => {
        val t = Tables.load(s, dir) +
          ("gzs" -> operators.ArchiveOps.tarFixture(s))
        GraftEngine.sql(
          "SELECT doc_id, gzip_ok(bytes) AS ok, " +
            "gunzip_text(bytes) AS text, " +
            "token_count(if_null(gunzip_text(bytes), '')) AS toks " +
            "FROM gzs WHERE doc_id IN (98, 99)", t)
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(98 AS BIGINT), true, 'plain gzip text', CAST(3 AS INTEGER)),
          (99, false, NULL, 0)
        ) AS t(doc_id, ok, text, toks)""".stripMargin.trim)),

    Q("q_audio_neardup",
      // the audio member of the perceptual near-dup family: waveform
      // envelope hashes ([[Multimodal.envHash64]] — closed-form over the
      // amplitude-modulated square fixture) through the SAME 16-bit
      // pigeonhole banding as image aHash and text SimHash. The planted
      // pairs: a resampled/regained copy at distance 0, a one-bucket
      // perturbation at distance 1; the staircase and constant rows band
      // into candidates (zero halves collide) but fail the Hamming
      // verify. Oracle replays banding + bit_count(xor) from the
      // closed-form hash literals
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val sigs = operators.Multimodal
          .wavEnvelopeSigs(operators.Multimodal.wavEnvelopeFixture(s))
          .where(col("pcm_ok"))
          .select(col("media_id").as("doc_id"), col("env_hash").as("sig"))
        operators.Dedup.simHashPairsFromSignatures(sigs, maxDist = 1)
      },
      Some("""
        WITH sigs(id, sig) AS (VALUES
          (CAST(30 AS BIGINT), CAST(4294967295 AS BIGINT)),
          (31, 4294967295),
          (32, -4294967296),
          (33, 12884901887),
          (34, 0)),
        b AS (
          SELECT id, sig, c, (sig >> (16 * c)) & 65535 AS key
          FROM sigs, (SELECT unnest(range(4)) AS c)),
        cand AS (
          SELECT DISTINCT x.id AS doc_a, y.id AS doc_b, x.sig AS sa, y.sig AS sb
          FROM b x JOIN b y ON x.c = y.c AND x.key = y.key AND x.id < y.id)
        SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS dist
        FROM cand WHERE bit_count(xor(sa, sb)) <= 1""".stripMargin.trim)),

    Q("q_mp4_keyframes",
      // MP4 keyframe PLAN extraction (pure sample-table byte arithmetic —
      // stts/stsz/stsc/stco/co64/stss): which byte ranges a downstream
      // decoder reads, per sync sample. The fixture's tables are
      // construction literals: a two-run stsc (keyframe 5 lands as the
      // second sample of chunk 2), a no-stss track (spec: every sample
      // syncs) on the co64 path, an audio-only track and corrupt bytes
      // (both flagged, not dropped)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        operators.Multimodal.mp4KeyframePlan(operators.Multimodal.mp4Fixture(s))
          .select(col("media_id"), col("mp4_ok"), col("sample"),
            col("time_ms"), col("offset"), col("size"))
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(40 AS BIGINT), true, CAST(1 AS INTEGER), CAST(0 AS BIGINT),
           CAST(1000 AS BIGINT), CAST(10 AS BIGINT)),
          (40, true, 5, 400, 2040, 50),
          (41, true, 1, 0, 5000, 500),
          (41, true, 2, 400, 5500, 500),
          (41, true, 3, 800, 9000, 500),
          (42, false, NULL, NULL, NULL, NULL),
          (43, false, NULL, NULL, NULL, NULL)
        ) AS t(media_id, mp4_ok, sample, time_ms, "offset", size)""".stripMargin.trim)),

    Q("q_mp3_frames",
      // MP3 frame INDEX (pure header arithmetic — bitrate table +
      // padding slot give each frame's exact byte length, sample counts
      // give exact VBR times). Fixture rows are construction literals:
      // CBR×4, VBR behind an ID3 tag with a padded frame + trailing
      // junk (walk stops), a truncated final frame (not indexed), and
      // a no-sync buffer (flagged)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        operators.Multimodal.mp3FramePlan(operators.Multimodal.mp3Fixture(s))
          .select(col("media_id"), col("mp3_ok"), col("frame"),
            col("time_ms"), col("offset"), col("size"), col("kbps"))
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(50 AS BIGINT), true, CAST(1 AS INTEGER), CAST(0 AS BIGINT),
           CAST(0 AS BIGINT), CAST(192 AS INTEGER), CAST(64 AS INTEGER)),
          (50, true, 2, 24, 192, 192, 64),
          (50, true, 3, 48, 384, 192, 64),
          (50, true, 4, 72, 576, 192, 64),
          (51, true, 1, 0, 30, 192, 64),
          (51, true, 2, 24, 222, 288, 96),
          (51, true, 3, 48, 510, 97, 32),
          (52, true, 1, 0, 0, 192, 64),
          (52, true, 2, 24, 192, 192, 64),
          (53, false, NULL, NULL, NULL, NULL, NULL)
        ) AS t(media_id, mp3_ok, frame, time_ms, "offset", size, kbps)""".stripMargin.trim)),

    Q("q_flac_frames",
      // FLAC frame INDEX (CRC-8-gated sync scan — a FLAC header does
      // not encode its frame length, so sizes come from successive
      // validated syncs). Fixture literals: fixed blocking with a
      // short last block + STREAMINFO-rate code, variable blocking
      // with a 2-byte coded sample number, a frameless stream and a
      // non-FLAC row (both flagged)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        operators.Multimodal.flacFramePlan(operators.Multimodal.flacFixture(s))
          .select(col("media_id"), col("flac_ok"), col("frame"),
            col("number"), col("block_size"), col("rate"), col("time_ms"),
            col("offset"), col("size"))
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(80 AS BIGINT), true, CAST(1 AS INTEGER), CAST(0 AS BIGINT),
           CAST(192 AS INTEGER), CAST(24000 AS INTEGER), CAST(0 AS BIGINT),
           CAST(42 AS BIGINT), CAST(26 AS BIGINT)),
          (80, true, 2, 1, 192, 24000, 8, 68, 26),
          (80, true, 3, 2, 100, 24000, 16, 94, 17),
          (81, true, 1, 0, 256, 44100, 0, 42, 21),
          (81, true, 2, 256, 256, 44100, 5, 63, 16),
          (82, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
          (83, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL)
        ) AS t(media_id, flac_ok, frame, number, block_size, rate,
               time_ms, "offset", size)""".stripMargin.trim)),

    Q("q_dup_spans",
      // cross-doc exact-substring duplication: fraction of each doc's
      // distinct 8-word windows shared with another document (Lee et al.
      // 2022 signal); windows shuffle as 60-bit hashes, the oracle
      // groups the raw gram strings — hash-collision-freedom included
      // in the check
      (s, dir) => operators.TextOps.dupSpans(
        Tables.load(s, dir)("documents"), n = 8),
      Some("""
        WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents),
        w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
        i AS (SELECT doc_id, w, unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS i FROM w),
        g AS (SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 7), ' ') AS gram FROM i),
        h AS (SELECT doc_id, gram, count(*) OVER (PARTITION BY gram) AS docs FROM g WHERE length(gram) > 0)
        SELECT doc_id, count(*) AS spans, CAST(sum(CASE WHEN docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
          round(sum(CASE WHEN docs > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS dup_frac
        FROM h GROUP BY doc_id""".stripMargin.trim)),

    Q("q_remove_dup_spans",
      // the acting half of q_dup_spans: every duplicated 8-word window
      // keeps only its first (doc, pos) occurrence; covered words are
      // deleted. Oracle replays the full keep/delete layout — window
      // census, first-occurrence election, coverage union, per-doc
      // rebuild — on the raw gram strings (the Spark side shuffles
      // 60-bit hashes, so collision-freedom is part of the check)
      (s, dir) => operators.TextOps.removeDupSpans(
        Tables.load(s, dir)("documents"), n = 8),
      Some("""
        WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents),
        w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
        o AS (SELECT doc_id, w, unnest(range(0, greatest(len(w) - 7, 0))) AS p FROM w),
        g AS (SELECT doc_id, p, array_to_string(list_slice(w, p + 1, p + 8), ' ') AS gram FROM o),
        m AS (SELECT doc_id, p, count(*) OVER (PARTITION BY gram) AS occ,
                first_value(doc_id) OVER (PARTITION BY gram ORDER BY doc_id, p) AS fdoc,
                first_value(p) OVER (PARTITION BY gram ORDER BY doc_id, p) AS fp
              FROM g),
        r AS (SELECT doc_id, p FROM m WHERE occ > 1 AND NOT (doc_id = fdoc AND p = fp)),
        cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + 8)) AS pos FROM r),
        pos AS (SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) - 1 AS pos FROM w),
        keep AS (SELECT pos.doc_id, pos.word, pos.pos FROM pos
                 LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.pos = cov.pos
                 WHERE cov.pos IS NULL),
        agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS clean_text,
                  count(*) AS kept FROM keep GROUP BY doc_id)
        SELECT w.doc_id, coalesce(agg.clean_text, '') AS clean_text,
          CAST(len(w.w) AS BIGINT) AS n_words,
          CAST(len(w.w) - coalesce(agg.kept, 0) AS BIGINT) AS n_removed
        FROM w LEFT JOIN agg USING (doc_id)""".stripMargin.trim)),

    Q("q_remove_spans_incr",
      // incremental span removal: documents split into a stored corpus
      // (doc_id % 3 = 0, kept as span-hash signatures only) and a new
      // batch — batch windows already in the corpus are deleted wherever
      // they occur, batch-internal dups keep their first (doc, pos);
      // the oracle replays both rules on raw gram strings (the Spark
      // side shuffles 60-bit hashes, so collision-freedom is checked)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir)("documents")
        val corpus = d.filter(pmod(col("doc_id"), lit(3)) === 0)
        val batch = d.filter(pmod(col("doc_id"), lit(3)) =!= 0)
        operators.TextOps.removeDupSpansAgainst(batch,
          operators.TextOps.spanSignatures(corpus, n = 8), n = 8)
      },
      Some("""
        WITH ct AS (SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                    FROM documents WHERE doc_id % 3 = 0),
        cw AS (SELECT string_split(t, ' ') AS w FROM ct),
        cg AS (SELECT DISTINCT array_to_string(list_slice(w, p + 1, p + 8), ' ') AS gram
               FROM (SELECT w, unnest(range(0, greatest(len(w) - 7, 0))) AS p FROM cw)),
        d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
              FROM documents WHERE doc_id % 3 <> 0),
        w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
        o AS (SELECT doc_id, w, unnest(range(0, greatest(len(w) - 7, 0))) AS p FROM w),
        g AS (SELECT doc_id, p, array_to_string(list_slice(w, p + 1, p + 8), ' ') AS gram FROM o),
        m AS (SELECT doc_id, p, gram, count(*) OVER (PARTITION BY gram) AS occ,
                first_value(doc_id) OVER (PARTITION BY gram ORDER BY doc_id, p) AS fdoc,
                first_value(p) OVER (PARTITION BY gram ORDER BY doc_id, p) AS fp
              FROM g),
        r AS (SELECT m.doc_id, m.p FROM m LEFT JOIN cg ON m.gram = cg.gram
              WHERE cg.gram IS NOT NULL
                 OR (occ > 1 AND NOT (m.doc_id = fdoc AND m.p = fp))),
        cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + 8)) AS pos FROM r),
        pos AS (SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) - 1 AS pos FROM w),
        keep AS (SELECT pos.doc_id, pos.word, pos.pos FROM pos
                 LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.pos = cov.pos
                 WHERE cov.pos IS NULL),
        agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS clean_text,
                  count(*) AS kept FROM keep GROUP BY doc_id)
        SELECT w.doc_id, coalesce(agg.clean_text, '') AS clean_text,
          CAST(len(w.w) AS BIGINT) AS n_words,
          CAST(len(w.w) - coalesce(agg.kept, 0) AS BIGINT) AS n_removed
        FROM w LEFT JOIN agg USING (doc_id)""".stripMargin.trim)),

    Q("q_bm25",
      // Okapi BM25 top-10 per query over the corpus — targeted-crawl /
      // decontamination search; query side broadcast, one corpus
      // postings shuffle, exact df restricted to query terms
      (s, dir) => {
        import s.implicits._
        val queries = Seq(
          ("q1", "spark window join"),
          ("q2", "hash table scan"),
          ("q3", "customer query value")).toDF("query_id", "qtext")
        operators.TextOps.bm25(
          Tables.load(s, dir)("documents"), queries, topK = 10)
      },
      Some("""
        WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents),
        b AS (SELECT doc_id, CASE WHEN length(t) = 0 THEN 0 ELSE len(string_split(t, ' ')) END AS dl, t FROM d),
        c AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM b),
        p AS (SELECT doc_id, dl, token, count(*) AS tf FROM (
                SELECT doc_id, dl, unnest(string_split(t, ' ')) AS token FROM b)
              WHERE length(token) > 0 GROUP BY doc_id, dl, token),
        q AS (SELECT DISTINCT query_id, token FROM (
                SELECT query_id, unnest(string_split(qtext, ' ')) AS token
                FROM (VALUES ('q1', 'spark window join'), ('q2', 'hash table scan'), ('q3', 'customer query value')) AS v(query_id, qtext))
              WHERE length(token) > 0),
        f AS (SELECT p.token, count(*) AS df FROM p JOIN (SELECT DISTINCT token FROM q) qt ON p.token = qt.token GROUP BY p.token),
        s AS (SELECT q.query_id, p.doc_id,
                round(sum(ln(1 + (c.n - f.df + 0.5) / (f.df + 0.5)) *
                  p.tf * (1.2 + 1) / (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / c.avgdl))), 6) AS score
              FROM p JOIN q ON p.token = q.token JOIN f ON p.token = f.token CROSS JOIN c
              GROUP BY q.query_id, p.doc_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank FROM s)
        SELECT query_id, doc_id, score, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= 10""".stripMargin.trim)),

    Q("q_hard_negatives",
      // hard-negative mining with the positives = each query's BM25 top-2
      // (so the anti-join provably bites on real hits): negatives are
      // ranks 3..12 re-ranked 1..10 — the oracle replays the BM25 chain
      // and shifts the rank
      (s, dir) => {
        import s.implicits._
        val queries = Seq(
          ("q1", "spark window join"),
          ("q2", "hash table scan"),
          ("q3", "customer query value")).toDF("query_id", "qtext")
        val docs = Tables.load(s, dir)("documents")
        val positives = operators.TextOps.bm25(docs, queries, topK = 2)
          .select("query_id", "doc_id")
        operators.TextOps.hardNegatives(docs, queries, positives,
          k = 10, posBuffer = 2)
      },
      Some("""
        WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents),
        b AS (SELECT doc_id, CASE WHEN length(t) = 0 THEN 0 ELSE len(string_split(t, ' ')) END AS dl, t FROM d),
        c AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM b),
        p AS (SELECT doc_id, dl, token, count(*) AS tf FROM (
                SELECT doc_id, dl, unnest(string_split(t, ' ')) AS token FROM b)
              WHERE length(token) > 0 GROUP BY doc_id, dl, token),
        q AS (SELECT DISTINCT query_id, token FROM (
                SELECT query_id, unnest(string_split(qtext, ' ')) AS token
                FROM (VALUES ('q1', 'spark window join'), ('q2', 'hash table scan'), ('q3', 'customer query value')) AS v(query_id, qtext))
              WHERE length(token) > 0),
        f AS (SELECT p.token, count(*) AS df FROM p JOIN (SELECT DISTINCT token FROM q) qt ON p.token = qt.token GROUP BY p.token),
        s AS (SELECT q.query_id, p.doc_id,
                round(sum(ln(1 + (c.n - f.df + 0.5) / (f.df + 0.5)) *
                  p.tf * (1.2 + 1) / (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / c.avgdl))), 6) AS score
              FROM p JOIN q ON p.token = q.token JOIN f ON p.token = f.token CROSS JOIN c
              GROUP BY q.query_id, p.doc_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank FROM s)
        SELECT query_id, doc_id, score, CAST(rank - 2 AS INTEGER) AS neg_rank
        FROM r WHERE rank BETWEEN 3 AND 12""".stripMargin.trim)),

    Q("q_keywords_tfidf",
      // per-doc top-3 keywords by smoothed tf·idf — cheap doc-topic
      // signal; one postings shuffle + vocab-sized df agg + per-doc
      // top-N window
      (s, dir) => operators.TextOps.keywordsTfidf(
        Tables.load(s, dir)("documents"), topN = 3),
      Some("""
        WITH p AS (SELECT doc_id, token, count(*) AS tf FROM (
                SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token FROM documents)
              WHERE length(token) > 0 GROUP BY doc_id, token),
        f AS (SELECT token, count(*) AS df FROM p GROUP BY token),
        n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        s AS (SELECT p.doc_id, p.token, round(p.tf * (ln((n.n + 1) / (f.df + 1)) + 1), 6) AS tfidf
              FROM p JOIN f USING (token) CROSS JOIN n),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank FROM s)
        SELECT doc_id, token, tfidf, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= 3""".stripMargin.trim)),

    Q("q_lm_ce2",
      // stupid-backoff bigram cross-entropy (order-2 CCNet signal):
      // unigram+bigram LMs trained on the corpus itself with small
      // deterministic top-K cuts so truncation + backoff are exercised
      (s, dir) => {
        val docs = Tables.load(s, dir)("documents")
        operators.TextOps.crossEntropyBigram(docs, docs,
          vocabK = 200, bigramK = 500)
      },
      Some("""
        WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents),
        w AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
        toks AS (SELECT unnest(w) AS token FROM w),
        ftoks AS (SELECT token FROM toks WHERE length(token) > 0),
        tot AS (SELECT count(*)::DOUBLE AS total FROM ftoks),
        uni AS (SELECT token, count(*) AS cnt FROM ftoks GROUP BY token ORDER BY cnt DESC, token LIMIT 200),
        bp0 AS (SELECT w[i] AS w1, w[i+1] AS w2 FROM (SELECT w, unnest(range(1, len(w))) AS i FROM w)),
        bp AS (SELECT w1, w2 FROM bp0 WHERE length(w1) > 0 AND length(w2) > 0),
        bi0 AS (SELECT w1, w2, count(*) AS bcnt FROM bp GROUP BY w1, w2 ORDER BY bcnt DESC, w1, w2 LIMIT 500),
        bi AS (SELECT b.w1, b.w2, ln(b.bcnt::DOUBLE / u.cnt) AS blogp FROM bi0 b JOIN uni u ON b.w1 = u.token),
        sm AS (SELECT token AS w2, ln((cnt + 1) / (total + 201)) AS ulogp FROM uni CROSS JOIN tot),
        dp0 AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2 FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM w)),
        dp AS (SELECT doc_id, w1, w2 FROM dp0 WHERE length(w1) > 0 AND length(w2) > 0),
        sc AS (SELECT dp.doc_id,
                coalesce(bi.blogp, ln(0.4) + coalesce(sm.ulogp, ln(1.0 / (tot.total + 201)))) AS lp
               FROM dp LEFT JOIN bi ON dp.w1 = bi.w1 AND dp.w2 = bi.w2
               LEFT JOIN sm ON dp.w2 = sm.w2 CROSS JOIN tot)
        SELECT doc_id, count(*) AS pairs, round(-avg(lp), 6) AS ce2 FROM sc GROUP BY doc_id""".stripMargin.trim)),

    // --- conversion / encode / regexp (§2.8) ------------------------------
    gq("q_conversion_funcs",
      "SELECT p_partkey, encode(p_brand, 'base64') AS b64, " +
        "decode(encode(p_brand, 'base64'), 'base64') AS rt, " +
        "trunc(p_retailprice / 7, 2) AS tr, " +
        "regexp_replace(p_name, '[aeiou]', '_') AS rr, " +
        "regexp_matches(p_name, '^[a-z]+ ') AS rm " +
        "FROM part WHERE p_partkey <= 400",
      "SELECT p_partkey, to_base64(p_brand::BLOB) AS b64, " +
        "from_base64(to_base64(p_brand::BLOB))::VARCHAR AS rt, " +
        "CAST(sign(p_retailprice / 7) AS DOUBLE) * floor(abs(p_retailprice / 7) * 100) / 100 AS tr, " +
        "regexp_replace(p_name, '[aeiou]', '_', 'g') AS rr, " +
        "regexp_matches(p_name, '^[a-z]+ ') AS rm " +
        "FROM part WHERE p_partkey <= 400"),

    gq("q_datetime_arith",
      "SELECT o_orderkey, date_add(o_orderdate, 3, 'day') AS d3, " +
        "date_diff(date_add(o_orderdate, 90, 'minute'), o_orderdate, 'minute') AS dm, " +
        "extract('year', o_orderdate) AS ey, " +
        "to_seconds(o_orderdate) AS secs " +
        "FROM orders WHERE o_orderkey < 2000",
      "SELECT o_orderkey, strftime(o_orderdate + INTERVAL 3 DAY, '%Y-%m-%d %H:%M:%S') AS d3, " +
        "90 AS dm, CAST(year(o_orderdate) AS INTEGER) AS ey, " +
        "CAST(epoch(o_orderdate) AS BIGINT) AS secs " +
        "FROM orders WHERE o_orderkey < 2000"),

    gq("q_misc_funcs2",
      // case_when function form (functions_conditional.go:196), plan-time
      // dynamic expr() (functions_expr.go:16), typeof-based predicates
      "SELECT l_orderkey, l_linenumber, " +
        "case_when(l_quantity > 40, 'high', l_quantity > 20, 'mid', 'low') AS band, " +
        "expr('l_extendedprice * (1 - l_discount)') AS net, " +
        "is_string(l_returnflag) AS iss, is_bool(l_returnflag = 'R') AS isb, " +
        "is_array(split(l_linestatus, ' ')) AS isa " +
        "FROM lineitem WHERE l_partkey < 70",
      "SELECT l_orderkey, l_linenumber, " +
        "CASE WHEN l_quantity > 40 THEN 'high' WHEN l_quantity > 20 THEN 'mid' ELSE 'low' END AS band, " +
        "l_extendedprice * (1 - l_discount) AS net, " +
        "TRUE AS iss, TRUE AS isb, TRUE AS isa " +
        "FROM lineitem WHERE l_partkey < 70"),

    gq("q_expr_dynamic",
      // RUNTIME expr(): the expression string is built per row and
      // interpreted against that row (functions_expr.go:16) — result is
      // stringly typed (documented delta, SURVEY §2.8); integer arithmetic
      // keeps Spark/DuckDB string forms identical
      "SELECT event_id, " +
        "expr(concat('event_id % ', cast(1 + user_id % 3, 'string'))) AS dyn " +
        "FROM events WHERE user_id < 1000",
      "SELECT event_id, CAST(event_id % (1 + user_id % 3) AS VARCHAR) AS dyn " +
        "FROM events WHERE user_id < 1000"),

    gq("q_datetime_arith2",
      // date_sub / month add / hour diff / extract fields / convert_tz
      // (functions_datetime.go:172-241, functions_conversion.go:242-300)
      "SELECT o_orderkey, date_sub(o_orderdate, 45, 'day') AS dsub, " +
        "date_add(o_orderdate, 2, 'month') AS dmon, " +
        "date_diff(o_orderdate, date_sub(o_orderdate, 36, 'hour'), 'hour') AS dh, " +
        "extract('dow', o_orderdate) AS dw, extract('week', o_orderdate) AS wk, " +
        "date_format(convert_tz(o_orderdate, 'America/New_York'), 'yyyy-MM-dd HH:mm') AS nyt, " +
        "date_parse(date_format(o_orderdate, 'dd/MM/yyyy'), 'dd/MM/yyyy') AS rt2 " +
        "FROM orders WHERE o_orderkey < 1500",
      "SELECT o_orderkey, strftime(o_orderdate - INTERVAL 45 DAY, '%Y-%m-%d %H:%M:%S') AS dsub, " +
        "strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d %H:%M:%S') AS dmon, " +
        "36 AS dh, " +
        "CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dw, " +
        "CAST(weekofyear(o_orderdate) AS INTEGER) AS wk, " +
        "strftime(timezone('America/New_York', o_orderdate::TIMESTAMPTZ), '%Y-%m-%d %H:%M') AS nyt, " +
        "strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y') AS rt2 " +
        "FROM orders WHERE o_orderkey < 1500"),

    gq("q_url_funcs",
      // url_encode/url_decode (functions_conversion.go:382-441); p_name is
      // strictly [a-z ] and p_brand is Brand#N, so the oracle's replace
      // chain reproduces application/x-www-form-urlencoded exactly
      "SELECT p_partkey, url_encode(p_name) AS ue, " +
        "url_decode(url_encode(p_name)) AS rt, url_encode(p_brand) AS ub " +
        "FROM part WHERE p_partkey <= 300",
      "SELECT p_partkey, replace(p_name, ' ', '+') AS ue, p_name AS rt, " +
        "replace(p_brand, '#', '%23') AS ub FROM part WHERE p_partkey <= 300"),

    gq("q_from_json",
      // from_json → dynamic map (functions_json.go:42-69): values land as
      // strings (map<string,string>), re-cast at use; to_json round-trips
      "SELECT event_id, cast(element_at(from_json(props), 'k'), 'int') AS k, " +
        "to_json(from_json(props)) AS rt FROM events WHERE event_id < 250",
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, " +
        "'{\"k\":\"' || json_extract_string(props, '$.k') || '\"}' AS rt " +
        "FROM events WHERE event_id < 250"),

    gq("q_rank_funcs",
      // ranking functions — absent in the reference (SURVEY §2.5), exposed
      // as Spark-first extensions with full OVER (PARTITION BY … ORDER BY …)
      "SELECT user_id, event_id, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn, " +
        "rank() OVER (PARTITION BY user_id ORDER BY event_type) AS rk, " +
        "dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS drk, " +
        "ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nt, " +
        "lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt " +
        "FROM events WITH (TIMESTAMP='ts', TIEBREAK='event_id')",
      "SELECT user_id, event_id, " +
        "CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS rn, " +
        "CAST(rank() OVER (PARTITION BY user_id ORDER BY event_type) AS INTEGER) AS rk, " +
        "CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS INTEGER) AS drk, " +
        "CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS nt, " +
        "lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events"),

    gq("q_array_funcs",
      // first5 joined to a string: the driver's pandas compare cannot hash
      // ndarray cells, so array outputs are stringified on BOTH sides
      "SELECT doc_id, array_length(split(text, ' ')) AS n, " +
        "array_contains(split(text, ' '), 'spark') AS has_spark, " +
        "array_join(array_sort(array_distinct(slice(split(text, ' '), 1, 5))), '|') AS first5, " +
        "element_at(split(text, ' '), 1) AS w1 " +
        "FROM documents WHERE doc_id < 100",
      "SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n, " +
        "list_contains(string_split(text, ' '), 'spark') AS has_spark, " +
        "array_to_string(list_sort(list_distinct(string_split(text, ' ')[1:5])), '|') AS first5, " +
        "string_split(text, ' ')[1] AS w1 " +
        "FROM documents WHERE doc_id < 100"),

    gq("q_window_id",
      "SELECT event_type, count(*) AS cnt, window_id() AS wid FROM events " +
        "GROUP BY event_type, TumblingWindow('1d') WITH (TIMESTAMP='ts')",
      "SELECT event_type, count(*) AS cnt, " +
        "CAST(floor(epoch(ts) / 86400) * 86400000 AS BIGINT)::VARCHAR || '_' || " +
        "CAST((floor(epoch(ts) / 86400) + 1) * 86400000 AS BIGINT)::VARCHAR AS wid " +
        "FROM events GROUP BY event_type, floor(epoch(ts) / 86400)"),

    // --- type predicates (§2.8) -------------------------------------------
    gq("q_type_predicates",
      "SELECT event_id, is_null(value) AS n, is_not_null(value) AS nn, " +
        "is_numeric(json_extract(props, '$.k')) AS num, " +
        "if_null(cast(json_extract(props, '$.k'), 'int'), -1) AS kv " +
        "FROM events WHERE event_id < 300",
      "SELECT event_id, value IS NULL AS n, value IS NOT NULL AS nn, " +
        "TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL AS num, " +
        "ifnull(CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS kv " +
        "FROM events WHERE event_id < 300"),

    // --- set operations, dialect-level (Spark-first extension, SURVEY §2.7;
    // the reference only reserves the keywords) ----------------------------
    gq("q_intersect",
      "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000 " +
        "INTERSECT SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0",
      "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000 " +
        "INTERSECT SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0"),

    gq("q_except",
      "SELECT c_custkey AS k FROM customer " +
        "EXCEPT SELECT o_custkey AS k FROM orders",
      "SELECT c_custkey AS k FROM customer " +
        "EXCEPT SELECT o_custkey AS k FROM orders"),

    gq("q_intersect_all",
      // multiset semantics: duplicate keys survive up to min(multiplicity)
      "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000 " +
        "INTERSECT ALL SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'",
      "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000 " +
        "INTERSECT ALL SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'"),

    gq("q_except_all",
      "SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 40 " +
        "EXCEPT ALL SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 40",
      "SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 40 " +
        "EXCEPT ALL SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 40"),

    gq("q_negated_predicates",
      "SELECT p_partkey, p_name FROM part WHERE p_size NOT BETWEEN 5 AND 45 " +
        "AND p_brand NOT IN ('Brand#1', 'Brand#2') AND p_name NOT LIKE '%red%' " +
        "AND NOT (p_retailprice IS NULL)",
      "SELECT p_partkey, p_name FROM part WHERE p_size NOT BETWEEN 5 AND 45 " +
        "AND p_brand NOT IN ('Brand#1', 'Brand#2') AND p_name NOT LIKE '%red%' " +
        "AND NOT (p_retailprice IS NULL)"),

    gq("q_union",
      "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 250000 " +
        "UNION SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0",
      "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 250000 " +
        "UNION SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0"),

    gq("q_union_all",
      "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 250000 " +
        "UNION ALL SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0",
      "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 250000 " +
        "UNION ALL SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0")
  )

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
