package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/**
 * Text-analysis + dedup operators over the `documents` table — the
 * training-data-pipeline surface (language id, quality scoring, token
 * counting, fingerprinting, exact + n-gram dedup). Oracle-matched where the
 * logic is expressible identically in DuckDB; hash-family ops (MinHash,
 * SimHash) are rows-only here and exactness-tested in ScalaTest.
 */
object TextQueries {

  /** ENGINE-computed exact-Jaccard pairs over the fixed 500-doc slice,
    * materialized once per sf dir and shared by the downstream dedup steps
    * (the q_hm_* shared-cells pattern applied to the dedup family): q_d6
    * RUNS `jaccardJoin` — it is the measured pair operator — while q_d7
    * measures its marginal operator (connected components) over the dumped
    * pairs and q_d9 measures ITS marginal operator (the keep-list join)
    * over the dumped clusters, instead of each re-running the whole
    * upstream chain per invocation (pairs recomputed 3× + CC 2× ≈ 5 s of
    * duplicated catalog time at sf0.1). The DuckDB oracles are unchanged —
    * both recompute pairs AND closure independently from the documents
    * table, so the dumps stay on the Spark side of the compare only. */
  val JaccardPairsDumpPath = "/tmp/graft_oracle/jaccard_pairs.parquet"
  val DedupClustersDumpPath = "/tmp/graft_oracle/dedup_clusters.parquet"

  /** The fixed 500-doc slice the dedup/cross-signal catalog queries and
    * services run over (scale-independent bench cost). NOT a resize knob:
    * the DuckDB oracle SQL strings pin `doc_id < 500` as literals by
    * design (they mirror a fixed test universe) — this constant exists so
    * the ENGINE side, the service-dump universes and the interpolating
    * oracles stay in provable lock-step; changing the slice means also
    * updating the literal oracles (grep `doc_id < 500`). */
  val DedupSliceRows = 500L

  private[queries] def dedupDocs(s: SparkSession, d: String): DataFrame =
    documents(s, d).where(col("doc_id") < DedupSliceRows)

  private[queries] def jaccardPairsDump(s: SparkSession, d: String): DataFrame =
    GraftQueries.sharedDump(s, JaccardPairsDumpPath, d) { path =>
      implicit val sp: SparkSession = s
      val out = graft.dedup.Dedup.jaccardJoin(dedupDocs(s, d), threshold = 0.7)
      out.coalesce(1).write.mode("overwrite").parquet(path)
      graft.dedup.Dedup.releaseCheckpoint(out)
    }

  private def clustersDump(s: SparkSession, d: String): DataFrame =
    GraftQueries.sharedDump(s, DedupClustersDumpPath, d) { path =>
      implicit val sp: SparkSession = s
      val out = graft.dedup.Dedup.connectedComponents(
        jaccardPairsDump(s, d).select("a", "b"),
        dedupDocs(s, d).select("doc_id"))
      out.coalesce(1).write.mode("overwrite").parquet(path)
      graft.dedup.Dedup.releaseCheckpoint(out)
    }

  /** The STANDING clustering of the already-indexed corpus (docs below the
    * q_d8 index split) — the persisted service state q_d11's incremental
    * update folds a batch into. Shared-dump'd like the other upstreams so
    * the query measures ONLY the O(batch) incremental step. */
  val IncrBaseLabelsDumpPath = "/tmp/graft_oracle/incr_base_labels.parquet"
  /** One row per (doc, 13-word n-gram) OCCURRENCE — the decontamination
    * relation's shared front end (q_t5 and q_d13 must agree on what
    * "contaminated" means, so the n-gram definition lives once). NOT
    * de-duplicated here: the corpus side of the decontamination join flows
    * straight into `count_distinct(ng)` / `distinct(doc_id)` aggregations
    * that absorb duplicate occurrences anyway, so a corpus-wide
    * (doc_id, ng) dedup exchange BEFORE the join is pure cost (r7: it was
    * the widest shuffle of both queries — every n-gram string moved once
    * just to be re-deduplicated downstream). The small EVAL side is
    * de-duplicated at its use sites, where it bounds the broadcast and the
    * join fan-out. */
  private def ngrams13(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
      .where(size(col("ws")) >= 13)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("ws")) - 12),
        i => concat_ws(" ", slice(col("ws"), i, lit(13))))).as("ng"))

  private def incrBaseLabelsDump(s: SparkSession, d: String): DataFrame =
    GraftQueries.sharedDump(s, IncrBaseLabelsDumpPath, d) { path =>
      implicit val sp: SparkSession = s
      val split = GraftQueries.LshProbeSplit
      val out = graft.dedup.Dedup.connectedComponents(
        jaccardPairsDump(s, d).where(col("a") < split && col("b") < split)
          .select("a", "b"),
        dedupDocs(s, d).where(col("doc_id") < split).select("doc_id"))
      out.coalesce(1).write.mode("overwrite").parquet(path)
      graft.dedup.Dedup.releaseCheckpoint(out)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting (whitespace tokens)
    "q_t1_token_count" -> ((s, d) =>
      documents(s, d)
        .groupBy(col("source"))
        .agg(sum(size(split(col("text"), " ", -1))).cast("long").as("total_tokens"),
          count(lit(1)).as("docs"))),

    // quality tiers from length stats
    "q_t2_quality_tiers" -> ((s, d) =>
      documents(s, d)
        .select(col("lang"),
          when(col("n_chars") < 200, "short")
            .when(col("n_chars") < 400, "mid")
            .otherwise("long").as("tier"))
        .groupBy(col("lang"), col("tier")).agg(count(lit(1)).as("n"))),

    // language-id n-gram/stopword heuristic vs the labeled lang column
    "q_t3_langid" -> ((s, d) =>
      documents(s, d)
        .select(col("lang"),
          when(instr(concat(lit(" "), col("text"), lit(" ")), " the ") > 0, "en")
            .when(instr(concat(lit(" "), col("text"), lit(" ")), " le ") > 0, "fr")
            .when(instr(concat(lit(" "), col("text"), lit(" ")), " der ") > 0, "de")
            .otherwise("other").as("pred"))
        .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))),

    // exact dedup by content hash (hash-groupBy; keeper = min id)
    "q_d1_dedup_exact" -> ((s, d) =>
      documents(s, d)
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("dupes"))),

    // character 3-gram shingle cardinality per doc (n-gram dedup primitive)
    "q_d2_shingles" -> ((s, d) =>
      graft.dedup.Dedup.shingleRelation(documents(s, d))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))),

    // EXACT Jaccard similarity join (inverted shingle index) — the exact
    // counterpart of the MinHash approximation, on a fixed 500-doc slice
    // so the bench cost is scale-independent (the operator itself scales
    // via the maxDf posting-list cap)
    "q_d6_jaccard_join" -> ((s, d) => {
      implicit val sp: SparkSession = s
      graft.dedup.Dedup.jaccardJoin(
        documents(s, d).where(col("doc_id") < 500), threshold = 0.7)
    }),

    // near-dup CLUSTER resolution (the dedup final step): exact Jaccard
    // pairs resolved to canonical cluster ids via connected components
    // (min-label + pointer jumping); singletons keep themselves. DuckDB
    // recomputes the clusters independently with a recursive reachability
    // CTE over ITS OWN pair recomputation.
    "q_d7_dedup_clusters" -> ((s, d) => {
      implicit val sp: SparkSession = s
      graft.dedup.Dedup.connectedComponents(
          jaccardPairsDump(s, d).select("a", "b"),
          dedupDocs(s, d).select("doc_id"))
        .select(col("id").as("doc_id"), col("cluster_id"))
    }),

    // the TERMINAL dedup step: the kept corpus after cluster resolution —
    // exactly one (canonical, minimum-id) document per near-dup cluster,
    // singletons included. DuckDB recomputes keep-or-drop independently
    // from its own recursive reachability closure.
    "q_d9_keep_corpus" -> ((s, d) => {
      implicit val sp: SparkSession = s
      graft.dedup.Dedup.applyKeepList(dedupDocs(s, d), clustersDump(s, d))
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // INCREMENTAL cluster maintenance — the arrival-time completion of the
    // incremental dedup loop (q_d8 probes the standing index for the
    // batch's pairs; this folds them into the STANDING clustering without
    // re-running CC over the corpus: representative-graph CC bounded by
    // O(batch + touched clusters), then one remap join). Must reproduce
    // the batch-mode clustering of the full corpus EXACTLY — the oracle is
    // q_d7's recursive-CTE closure over all 500 docs, while the Spark side
    // only ever runs CC on the tiny representative graph.
    "q_d11_incr_clusters" -> ((s, d) => {
      implicit val sp: SparkSession = s
      val split = GraftQueries.LshProbeSplit
      val pairs = jaccardPairsDump(s, d)
      graft.dedup.Dedup.incrementalClusters(
          incrBaseLabelsDump(s, d),
          pairs.where(col("a") >= split || col("b") >= split).select("a", "b"),
          dedupDocs(s, d).where(col("doc_id") >= split).select("doc_id"))
        .select(col("id").as("doc_id"), col("cluster_id"))
    }),

    // BPE-ish token counting (the other half of the token-counting op next
    // to q_t1's whitespace split): greedy left-to-right subword chunking —
    // alpha runs split into ≤4-char pieces, digits and punctuation one
    // token each — i.e. a BPE whose merge table saturates at 4-char pieces.
    // Same greedy regex semantics in Java (Spark) and RE2 (DuckDB), so the
    // counts are oracle-comparable exactly.
    "q_t4_bpe_tokens" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          size(expr("regexp_extract_all(text, '[a-z]{1,4}|[0-9]|[^a-z0-9 ]', 0)"))
            .cast("long").as("n_bpe_tokens"))),

    // quality score: avg chars per whitespace token (deterministic double)
    "q_t2b_chars_per_token" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          (col("n_chars").cast("double") / size(split(col("text"), " ", -1)).cast("double"))
            .as("chars_per_token"))),

    // BENCHMARK DECONTAMINATION — the training-data hygiene step next to
    // dedup: any training document sharing a 13-word n-gram with the eval
    // set (here: doc_id % 5 == 0 plays the held-out benchmark) is flagged
    // with its distinct-overlap count (the GPT-3/Llama 13-gram rule). The
    // broadcast hint encodes the operator's CONTRACT: the build side is a
    // benchmark suite, bounded by construction (eval sets don't grow with
    // the corpus) — the %5 slice only plays that role at test scale, and a
    // caller decontaminating against a corpus-proportional relation should
    // drop the hint and let the planner shuffle. At corpus scale the join
    // key would be xxhash64(ngram) to move 8 bytes instead of ~90, kept
    // as the raw string here for exact oracle comparability.
    "q_t5_decontam" -> ((s, d) => {
      val ng = ngrams13(s, d)
      // train side: raw occurrences (count_distinct/min absorb duplicates);
      // eval side: (ng, eval_doc) de-duplicated — bounds the broadcast and
      // the join fan-out, and is the only distinct the answer needs
      ng.where(col("doc_id") % 5 =!= 0)
        .join(broadcast(ng.where(col("doc_id") % 5 === 0)
          .select(col("ng"), col("doc_id").as("eval_doc")).distinct()), "ng")
        .groupBy(col("doc_id"))
        .agg(count_distinct(col("ng")).as("n_contaminated"),
          min(col("eval_doc")).as("eval_doc"))
    }),

    // DETERMINISTIC MIXTURE SAMPLING — per-source keep rates applied via a
    // seedless MINSTD LCG over the doc id, so the sampled corpus is a pure
    // function of the data (re-runs, retries and the DuckDB oracle all
    // select the identical rows — the property Spark's sample() lacks).
    // Narrow decision + one aggregation exchange; the same predicate IS
    // the corpus filter at 100 TB (no shuffle to sample).
    "q_mix_sample" -> ((s, d) => {
      val ratePct = lit(25) + (substring(col("source"), 4, 10).cast("int") * 7) % 60
      val kept = (col("doc_id") * 48271) % 2147483647L % 100 < ratePct
      documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
          max(ratePct.cast("long")).as("rate_pct"))
    }),

    // THE TERMINAL CORPUS-HYGIENE COMPOSITION — what a pretraining pipeline
    // actually ships: dedup and decontamination folded into ONE clean
    // training corpus. Training docs (non-eval) are clustered over the
    // shared Jaccard pair dump restricted to train endpoints, the keep-list
    // drops near-dups, and the decontamination relation (any 13-gram shared
    // with the eval slice, q_t5's join) is anti-joined off the keepers.
    // Each stage reuses the engine's existing operators — the query
    // measures the composition, the oracle recomputes all three stages
    // independently in SQL.
    "q_d13_clean_corpus" -> ((s, d) => {
      implicit val sp: SparkSession = s
      val train = dedupDocs(s, d).where(col("doc_id") % 5 =!= 0)
      val clusters = graft.dedup.Dedup.connectedComponents(
        jaccardPairsDump(s, d)
          .where(col("a") % 5 =!= 0 && col("b") % 5 =!= 0).select("a", "b"),
        train.select("doc_id"))
      val ng = ngrams13(s, d)
      // broadcast = the bounded-benchmark contract (see q_t5's comment);
      // eval n-grams distinct'd so the semi-decision join cannot fan out
      val contaminated = ng.where(col("doc_id") % 5 =!= 0)
        .join(broadcast(ng.where(col("doc_id") % 5 === 0).select("ng").distinct()), "ng")
        .select("doc_id").distinct()
      graft.dedup.Dedup.applyKeepList(train, clusters)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // SEQUENCE PACKING — concat-and-chunk: documents are concatenated in
    // id order within a source shard and split into fixed 512-token
    // training sequences; each doc reports the sequence span it lands in.
    // The window is PARTITIONED BY source (the shard): packing is
    // sequential within a shard by construction, embarrassingly parallel
    // across shards — the only layout a 100 TB pretraining pack can use
    // (a global cumulative sum would serialize the corpus).
    "q_pack_sequences" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tok = size(split(col("text"), " ", -1)).cast("long")
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      documents(s, d)
        .select(col("doc_id"), col("source"), tok.as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          floor((col("cum") - col("n_tokens")) / 512).as("start_seq"),
          floor((col("cum") - 1) / 512).as("end_seq"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_t1_token_count" ->
      """SELECT source, CAST(sum(length(string_split(text, ' '))) AS BIGINT) AS total_tokens,
                count(*) AS docs FROM documents GROUP BY source""",
    "q_t2_quality_tiers" ->
      """SELECT lang, CASE WHEN n_chars < 200 THEN 'short' WHEN n_chars < 400 THEN 'mid'
                           ELSE 'long' END AS tier, count(*) AS n
         FROM documents GROUP BY 1, 2""",
    "q_t3_langid" ->
      """SELECT lang, CASE WHEN strpos(' ' || text || ' ', ' the ') > 0 THEN 'en'
                           WHEN strpos(' ' || text || ' ', ' le ') > 0 THEN 'fr'
                           WHEN strpos(' ' || text || ' ', ' der ') > 0 THEN 'de'
                           ELSE 'other' END AS pred, count(*) AS n
         FROM documents GROUP BY 1, 2""",
    "q_d1_dedup_exact" ->
      "SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS dupes FROM documents GROUP BY 1",
    "q_d2_shingles" ->
      """SELECT doc_id, count(DISTINCT substring(text, g, 3)) AS n_shingles
         FROM (SELECT doc_id, text, unnest(generate_series(1, length(text)-2)) AS g
               FROM documents WHERE length(text) >= 3)
         GROUP BY doc_id""",
    "q_d6_jaccard_join" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id, substring(text, g, 3) AS s
           FROM (SELECT doc_id, text, unnest(generate_series(1, length(text)-2)) AS g
                 FROM documents WHERE length(text) >= 3 AND doc_id < 500)),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT a, b, round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = a
         JOIN sizes sb ON sb.doc_id = b
         WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.7""",
    "q_t2b_chars_per_token" ->
      """SELECT doc_id, CAST(n_chars AS DOUBLE) / CAST(length(string_split(text, ' ')) AS DOUBLE)
                AS chars_per_token FROM documents""",
    "q_t4_bpe_tokens" ->
      """SELECT doc_id, CAST(length(regexp_extract_all(text, '[a-z]{1,4}|[0-9]|[^a-z0-9 ]')) AS BIGINT)
                AS n_bpe_tokens FROM documents""",
    "q_t5_decontam" ->
      """WITH ngd AS (
           SELECT DISTINCT doc_id, array_to_string(list_slice(ws, g, g + 12), ' ') AS ng
           FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 12)) AS g
                 FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
                 WHERE len(ws) >= 13))
         SELECT a.doc_id, count(DISTINCT a.ng) AS n_contaminated, min(b.doc_id) AS eval_doc
         FROM ngd a JOIN ngd b ON a.ng = b.ng AND b.doc_id % 5 = 0 AND a.doc_id % 5 <> 0
         GROUP BY 1""",
    // all three hygiene stages recomputed independently: exact-Jaccard
    // pairs over TRAIN docs only, closed with the recursive reachability
    // CTE, keepers = cluster minima, then the 13-gram decontamination
    // relation anti-joined off the keepers
    "q_d13_clean_corpus" ->
      """WITH RECURSIVE sh AS (
           SELECT DISTINCT doc_id, substring(text, g, 3) AS s
           FROM (SELECT doc_id, text, unnest(generate_series(1, length(text)-2)) AS g
                 FROM documents WHERE length(text) >= 3 AND doc_id < 500 AND doc_id % 5 <> 0)),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         pairs AS (SELECT a, b FROM inter
                   JOIN sizes sa ON sa.doc_id = a
                   JOIN sizes sb ON sb.doc_id = b
                   WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.7),
         edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
         reach(u, m) AS (
           SELECT doc_id, doc_id FROM documents WHERE doc_id < 500 AND doc_id % 5 <> 0
           UNION
           SELECT e.u, r.m FROM edges e JOIN reach r ON e.v = r.u),
         kept AS (SELECT u AS doc_id FROM reach GROUP BY u HAVING min(m) = u),
         ngd AS (
           SELECT DISTINCT doc_id, array_to_string(list_slice(ws, g, g + 12), ' ') AS ng
           FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 12)) AS g
                 FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
                 WHERE len(ws) >= 13)),
         contaminated AS (
           SELECT DISTINCT a.doc_id FROM ngd a
           JOIN ngd b ON a.ng = b.ng AND b.doc_id % 5 = 0 AND a.doc_id % 5 <> 0)
         SELECT d.doc_id, d.lang, d.n_chars
         FROM documents d
         JOIN kept k ON d.doc_id = k.doc_id
         LEFT JOIN contaminated c ON d.doc_id = c.doc_id
         WHERE c.doc_id IS NULL""",
    "q_mix_sample" ->
      """SELECT source, count(*) AS n_docs,
                CAST(sum(CASE WHEN (doc_id * 48271) % 2147483647 % 100
                              < 25 + (CAST(substring(source, 4) AS INT) * 7) % 60
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                CAST(max(25 + (CAST(substring(source, 4) AS INT) * 7) % 60) AS BIGINT) AS rate_pct
         FROM documents GROUP BY source""",
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                    FROM documents),
         c AS (SELECT doc_id, source, n_tokens,
                      CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
               FROM t)
         SELECT doc_id, source, n_tokens,
                (cum - n_tokens) // 512 AS start_seq,
                (cum - 1) // 512 AS end_seq
         FROM c""",
    // independent cluster recomputation: the same exact-Jaccard pair SQL
    // as q_d6, closed transitively with a recursive reachability CTE;
    // cluster id = min reachable doc id, singletons label themselves
    "q_d7_dedup_clusters" ->
      """WITH RECURSIVE sh AS (
           SELECT DISTINCT doc_id, substring(text, g, 3) AS s
           FROM (SELECT doc_id, text, unnest(generate_series(1, length(text)-2)) AS g
                 FROM documents WHERE length(text) >= 3 AND doc_id < 500)),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         pairs AS (SELECT a, b FROM inter
                   JOIN sizes sa ON sa.doc_id = a
                   JOIN sizes sb ON sb.doc_id = b
                   WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.7),
         edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
         reach(u, m) AS (
           SELECT doc_id, doc_id FROM documents WHERE doc_id < 500
           UNION
           SELECT e.u, r.m FROM edges e JOIN reach r ON e.v = r.u)
         SELECT u AS doc_id, min(m) AS cluster_id FROM reach GROUP BY 1""",
    // q_d11 must equal the BATCH-MODE clustering of the full corpus — the
    // oracle is q_d7's closure verbatim (the incremental path's entire
    // point is reproducing it while only touching O(batch) state)
    "q_d11_incr_clusters" ->
      """WITH RECURSIVE sh AS (
           SELECT DISTINCT doc_id, substring(text, g, 3) AS s
           FROM (SELECT doc_id, text, unnest(generate_series(1, length(text)-2)) AS g
                 FROM documents WHERE length(text) >= 3 AND doc_id < 500)),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         pairs AS (SELECT a, b FROM inter
                   JOIN sizes sa ON sa.doc_id = a
                   JOIN sizes sb ON sb.doc_id = b
                   WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.7),
         edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
         reach(u, m) AS (
           SELECT doc_id, doc_id FROM documents WHERE doc_id < 500
           UNION
           SELECT e.u, r.m FROM edges e JOIN reach r ON e.v = r.u)
         SELECT u AS doc_id, min(m) AS cluster_id FROM reach GROUP BY 1""",
    // same reachability closure; kept = documents that ARE their cluster's
    // minimum (singletons trivially keep themselves)
    "q_d9_keep_corpus" ->
      """WITH RECURSIVE sh AS (
           SELECT DISTINCT doc_id, substring(text, g, 3) AS s
           FROM (SELECT doc_id, text, unnest(generate_series(1, length(text)-2)) AS g
                 FROM documents WHERE length(text) >= 3 AND doc_id < 500)),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         pairs AS (SELECT a, b FROM inter
                   JOIN sizes sa ON sa.doc_id = a
                   JOIN sizes sb ON sb.doc_id = b
                   WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.7),
         edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
         reach(u, m) AS (
           SELECT doc_id, doc_id FROM documents WHERE doc_id < 500
           UNION
           SELECT e.u, r.m FROM edges e JOIN reach r ON e.v = r.u),
         kept AS (SELECT u AS doc_id FROM reach GROUP BY u HAVING min(m) = u)
         SELECT d.doc_id, d.lang, d.n_chars
         FROM documents d JOIN kept k ON d.doc_id = k.doc_id"""
  )
}
