package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Oracle-checked queries for the deterministic samplers in [[Sampling]].
  *
  * Both queries hash a stable business key (never partition/offset state), so
  * the exact same rows are selected on any cluster size, any partition
  * layout, and even by a different engine — the DuckDB oracle reproduces the
  * membership decision bit-for-bit from the same md5-prefix hash. That
  * portability is the point: a training corpus' held-out split must survive
  * re-runs and engine migrations without leakage.
  */
object SamplingQueries {

  /** 60-bit md5-prefix hash, DuckDB side (same value as [[Sampling.hash60]]). */
  private def duckHash(k: String): String =
    s"('0x' || substr(md5(CAST($k AS VARCHAR)), 1, 15))::BIGINT"

  /** Deterministic 10% Bernoulli sample of the documents corpus. Pure map —
    * the membership filter runs at the scan with no shuffle, so this costs a
    * single pass regardless of corpus size.
    */
  private val q60 = Q(
    "q60_sample_bernoulli",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Sampling
        .bernoulli(T.documents, $"doc_id", 10, 100)
        .select($"doc_id", $"lang", $"source", $"n_chars")
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id, lang, source, n_chars
      FROM documents
      WHERE ${duckHash("doc_id")} % 100 < 10
      ORDER BY doc_id
    """.trim)
  )

  /** Deterministic stratified sample: exactly 20 orders per priority class,
    * drawn uniformly without replacement by smallest key hash. One hash
    * shuffle on the strata column — window-query cost shape.
    */
  private val q61 = Q(
    "q61_sample_stratified",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Sampling
        .stratified(T.orders, Seq($"o_orderpriority"), $"o_orderkey", 20)
        .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderpriority", $"o_orderkey")
    },
    Some(s"""
      SELECT o_orderpriority, o_orderkey, o_totalprice
      FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (
                 PARTITION BY o_orderpriority
                 ORDER BY ${duckHash("o_orderkey")}, o_orderkey
               ) AS rn
        FROM orders
      )
      WHERE rn <= 20
      ORDER BY o_orderpriority, o_orderkey
    """.trim)
  )

  /** Quality-weighted subsampling ([[Sampling.weighted]]): keep probability
    * = the q30 quality score, so the sample tilts toward higher-quality
    * docs while staying hash-deterministic. The weight×2^20 threshold
    * arithmetic is exact-double both sides, so membership is reproducible.
    */
  private val q72 = Q(
    "q72_weighted_sample",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Sampling
        .weighted(
          T.documents.withColumn("quality", TextAnalysis.qualityScore($"text")),
          $"doc_id",
          $"quality"
        )
        .select($"doc_id", $"quality")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH t AS (SELECT doc_id, regexp_split_to_array(lower(text), '[ \\t\\n\\v\\f\\r]+') AS toks FROM documents),
      m AS (SELECT doc_id, len(toks) AS n,
                   len(list_filter(toks, w -> w IN ('the','a','of','and','to','in','is','it','on','for'))) AS n_stop,
                   list_sum(list_transform(toks, w -> len(w))) AS total_len
            FROM t),
      q AS (SELECT doc_id,
                   0.3 * (CAST(n_stop AS DOUBLE) / n)
                     + 0.3 * least((CAST(total_len AS DOUBLE) / n) / 8.0, 1.0)
                     + 0.4 * least(CAST(n AS DOUBLE) / 50.0, 1.0) AS quality
            FROM m)
      SELECT doc_id, quality FROM q
      WHERE CAST(${duckHash("doc_id")} % 1048576 AS DOUBLE) < quality * 1048576
      ORDER BY doc_id
    """.trim)
  )

  /** Per-source mixture assembly ([[Sampling.mixture]]): each source keeps
    * its own deterministic fraction — "the training mix" as one scan-side
    * filter (rate lookup is a literal CASE, membership is key-hashed, no
    * join, no shuffle). Sources absent from the mix drop out entirely.
    */
  private val q73 = Q(
    "q73_mixture",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Sampling
        .mixture(
          T.documents,
          $"source",
          $"doc_id",
          Map("src0" -> 100, "src1" -> 50, "src2" -> 20, "src3" -> 5),
          denominator = 100
        )
        .select($"doc_id", $"source", $"lang")
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id, source, lang FROM documents
      WHERE ${duckHash("doc_id")} % 100 <
            CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
                        WHEN 'src2' THEN 20 WHEN 'src3' THEN 5 ELSE -1 END
      ORDER BY doc_id
    """.trim)
  )

  /** Deterministic shuffle-shard ([[Sampling.shard]]): the corpus dealt
    * into 8 shards with a reproducible training order — shard by key-hash
    * modulus, position by ascending hash within the shard. The oracle
    * reproduces the identical (shard, pos) assignment from the same
    * md5-prefix hash, proving the order is an engine-independent property
    * of the keys, not of any runtime's partitioning.
    */
  private val q78 = Q(
    "q78_shuffle_shard",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Sampling
        .shard(T.documents.select($"doc_id", $"source"), $"doc_id", 8)
        .orderBy($"shard", $"pos")
    },
    Some(s"""
      WITH h AS (SELECT doc_id, source, ${duckHash("doc_id")} AS h FROM documents)
      SELECT doc_id, source, CAST(h % 8 AS INT) AS shard,
             CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT) AS pos
      FROM h ORDER BY shard, pos
    """.trim)
  )

  /** Sequence packing ([[Sampling.packSequences]]): the corpus packed into
    * ~512-token training bins across 4 shards — shard and in-shard order by
    * the portable key hash, bin by exact-integer prefix sum. The oracle
    * reproduces the identical (shard, bin) for every document, proving the
    * trainer's batch composition is a property of the data, not the run.
    */
  private val q82 = Q(
    "q82_sequence_packing",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Sampling
        .packSequences(
          T.documents.select($"doc_id", $"text"),
          $"doc_id",
          TextAnalysis.tokenCount($"text"),
          numShards = 4,
          maxTokens = 512L
        )
        .select($"doc_id", $"shard", $"bin", $"n_tokens")
        .orderBy($"shard", $"bin", $"doc_id")
    },
    Some(s"""
      WITH t AS (SELECT doc_id,
                        CAST(len(regexp_split_to_array(lower(text), '[ \\t\\n\\v\\f\\r]+')) AS BIGINT) AS n,
                        ${duckHash("doc_id")} AS h
                 FROM documents),
      c AS (SELECT doc_id, CAST(h % 4 AS INT) AS shard, n,
                   CAST(SUM(n) OVER (PARTITION BY h % 4 ORDER BY h, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM t)
      SELECT doc_id, shard, (cum - n) // 512 AS bin, n AS n_tokens
      FROM c ORDER BY shard, bin, doc_id
    """.trim)
  )

  /** Leakage-free split assignment ([[Sampling.leakageFreeSplit]]): a
    * 90/5/5 train/val/test carve where every exact-duplicate group (same
    * md5(text) digest) moves as ONE unit — the split hashes the group's
    * min-doc_id representative, so a duplicated document can never sit in
    * train while its copy scores as held-out. The documents fixture plants
    * exact dups (q22's subject), so the grouping is genuinely exercised;
    * the oracle recomputes representative and band from the same md5-prefix
    * hash.
    */
  private val q97 = Q(
    "q97_group_split",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Sampling
        .leakageFreeSplit(
          T.documents,
          "doc_id",
          md5($"text"),
          splits = Seq("train" -> 90, "val" -> 5, "test" -> 5),
          denominator = 100
        )
        .select($"doc_id", $"rep", $"split")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH g AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS rep FROM documents),
      h AS (SELECT doc_id, rep, ${duckHash("rep")} % 100 AS hb FROM g)
      SELECT doc_id, rep,
             CASE WHEN hb < 90 THEN 'train' WHEN hb < 95 THEN 'val' ELSE 'test' END AS split
      FROM h ORDER BY doc_id
    """.trim)
  )

  /** q102/q106/q109 shared oracle builder: the two-phase token-budget
    * prefix sum with the per-doc token count, the group derivation, and
    * the budget table as parameters — the whitespace count (q102), the
    * exact BPE count (q106) and the registered-domain grouping (q109) all
    * gate through the SAME budget arithmetic, so none can drift.
    */
  private[operators] def tokenBudgetOracleSql(
      tokExpr: String,
      groupExpr: String = "source",
      groupName: String = "source",
      budgets: Seq[(String, Long)] =
        Seq("src0" -> 2000L, "src1" -> 1000L, "src2" -> 500L),
      budgetCte: Option[String] = None
  ): String = {
    // budgets either render as a literal CASE (the config-supplied shape) or
    // come from a caller CTE named bt(grp, budget) DERIVED from the corpus —
    // q118's temperature budgets, where the oracle must replay the budget
    // COMPUTATION, not just the selection
    val cases = budgets.map { case (g, b) => s"WHEN '$g' THEN $b" }.mkString(" ")
    val baseCte = budgetCte match {
      case Some(cte) =>
        s"""$cte,
      base AS (SELECT base0.doc_id, base0.grp, base0.tok,
                      ${duckHash("base0.doc_id")} AS h,
                      coalesce(bt.budget, -1) AS budget
               FROM base0 LEFT JOIN bt ON base0.grp = bt.grp),"""
      case None =>
        s"""base AS (SELECT doc_id, grp, tok,
                      ${duckHash("doc_id")} AS h,
                      CASE grp $cases ELSE -1 END AS budget
               FROM base0),"""
    }
    s"""
      WITH base0 AS (SELECT doc_id, $groupExpr AS grp, $tokExpr AS tok FROM documents),
      $baseCte
      f AS (SELECT *, CAST(h % 8 AS INT) AS shard FROM base WHERE budget >= 0),
      st AS (SELECT grp, shard, CAST(sum(tok) AS BIGINT) AS stok FROM f GROUP BY 1, 2),
      o AS (SELECT grp, shard,
                   CAST(sum(stok) OVER (PARTITION BY grp ORDER BY shard) - stok AS BIGINT) AS off
            FROM st),
      cum AS (SELECT f.doc_id, f.grp, f.tok, f.budget,
                     CAST(sum(f.tok) OVER (PARTITION BY f.grp, f.shard ORDER BY f.h, f.doc_id, f.tok
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + o.off AS BIGINT) AS cum
              FROM f JOIN o ON f.grp = o.grp AND f.shard = o.shard)
      SELECT doc_id, grp AS $groupName, tok AS n_tokens FROM cum
      WHERE cum - tok < budget ORDER BY doc_id
    """.trim
  }

  /** Token-budget mixture ([[Sampling.tokenBudgetMixture]]): fill 2000
    * tokens of src0, 1000 of src1, 500 of src2 (other sources dropped)
    * with the two-phase distributed prefix sum — the oracle replays the
    * identical shard-major arithmetic, so the kept set hash-matches
    * row-for-row including the boundary (first-overshooting) docs.
    */
  private val q102 = Q(
    "q102_token_budget",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val withTok = T.documents
        .withColumn("n_tokens", size(split(lower($"text"), "\\s+")).cast("long"))
      Sampling
        .tokenBudgetMixture(
          withTok,
          group = $"source",
          key = $"doc_id",
          tokens = $"n_tokens",
          budgets = Map("src0" -> 2000L, "src1" -> 1000L, "src2" -> 500L),
          numShards = 8
        )
        .select($"doc_id", $"source", $"n_tokens")
        .orderBy($"doc_id")
    },
    Some(tokenBudgetOracleSql(
      "CAST(len(regexp_split_to_array(lower(text), '[ \\t\\n\\v\\f\\r]+')) AS BIGINT)"))
  )

  /** The merges table q106 budgets with: a tiny well-formed English-pair
    * BPE (each compound symbol produced by an earlier rank), shared
    * verbatim between the engine expression and the oracle's unrolled
    * replace chain.
    */
  private[graft] val BpeMerges: Seq[(String, String)] = Seq(
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("an", "d"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
    ("in", "g"),
    ("o", "u")
  )

  /** BPE token-budget mixture ([[graft.functions.BpeExprs.bpeTokenCount]]
    * feeding [[Sampling.tokenBudgetMixture]]): the q102 contract with the
    * budgets measured in EXACT model tokens instead of whitespace splits —
    * how budgets are actually specified in production ("20B tokens of
    * web"). The oracle re-derives the same merges walk per word (the
    * rank-sequential replace chain, provably equal to the min-rank loop
    * for validated tables — [[graft.functions.BpeSupport]]) and then the
    * same budget arithmetic through the shared builder.
    */
  private val q106 = Q(
    "q106_bpe_token_budget",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val withTok = T.documents.withColumn(
        "n_tokens",
        graft.functions.BpeExprs.bpeTokenCount(lower($"text"), BpeMerges).cast("long"))
      Sampling
        .tokenBudgetMixture(
          withTok,
          group = $"source",
          key = $"doc_id",
          tokens = $"n_tokens",
          budgets = Map("src0" -> 2000L, "src1" -> 1000L, "src2" -> 500L),
          numShards = 8
        )
        .select($"doc_id", $"source", $"n_tokens")
        .orderBy($"doc_id")
    },
    Some(tokenBudgetOracleSql(
      graft.functions.BpeSupport.duckDocCountSql("lower(text)", BpeMerges)))
  )

  /** q113's BYTE-level merges: pairs over the GPT-2 bytes_to_unicode
    * alphabet. The first two ranks rebuild the multi-byte characters the
    * query plants (ä = C3 A4 -> "Ã","¤"; é = C3 A9 -> "Ã","©") from their
    * byte pieces; later ranks merge across them ("thé", "än") — the
    * byte-level capability character-level symbols cannot express. Shared
    * verbatim with the oracle's remap-then-replace chain.
    */
  private[graft] val BpeByteMerges: Seq[(String, String)] = Seq(
    ("Ã", "¤"), // ä
    ("Ã", "©"), // é
    ("t", "h"),
    ("th", "Ã©"), // thé
    ("i", "n"),
    ("Ã¤", "n"), // än
    ("o", "n"),
    ("r", "Ã©"), // ré
    ("in", "g"),
    ("o", "u")
  )

  /** BYTE-level BPE token-budget mixture: q106's contract with the
    * production GPT-2 alphabet — each word's UTF-8 bytes pass the
    * published bytes_to_unicode bijection before the merge walk
    * ([[graft.functions.BpeSupport.ByteToChar]]), so multi-byte characters
    * tokenize from their byte pieces. The query plants non-ASCII
    * deterministically (translate a->ä, e->é — documents are ASCII, and an
    * identity-remap corpus would not exercise the byte path), and the
    * oracle REPLAYS THE REMAP ITSELF: hex(encode(word)) decoded pair-wise
    * through the same 256-char table rendered as a SQL literal, then the
    * same replace chain ([[graft.functions.BpeSupport.duckByteDocCountSql]]).
    */
  private val q113 = Q(
    "q113_bpe_byte_budget",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val withTok = T.documents.withColumn(
        "n_tokens",
        graft.functions.BpeExprs
          .bpeByteTokenCount(translate(lower($"text"), "ae", "äé"), BpeByteMerges)
          .cast("long"))
      Sampling
        .tokenBudgetMixture(
          withTok,
          group = $"source",
          key = $"doc_id",
          tokens = $"n_tokens",
          budgets = Map("src0" -> 2000L, "src1" -> 1000L, "src2" -> 500L),
          numShards = 8
        )
        .select($"doc_id", $"source", $"n_tokens")
        .orderBy($"doc_id")
    },
    Some(tokenBudgetOracleSql(
      graft.functions.BpeSupport
        .duckByteDocCountSql("translate(lower(text), 'ae', 'äé')", BpeByteMerges)))
  )

  /** q128's byte-level vocabulary: all 256 remapped byte atoms plus every
    * compound [[BpeByteMerges]] produces — TOTAL coverage (the point of a
    * byte-level vocabulary), so encode never emits -1 and the round trip
    * is total. Shared verbatim with nothing: the oracle re-derives the
    * decode from the symbol chain and the inverse byte table instead of
    * trusting a vocabulary list.
    */
  private val BpeByteVocab: Seq[String] =
    (0 until 256).map(b => String.valueOf(graft.functions.BpeSupport.ByteToChar(b))) ++
      BpeByteMerges.map { case (a, b) => a + b }

  /** BPE DETOKENIZATION round trip
    * ([[graft.functions.BpeExprs.bpeByteDecodeIds]]): encode each doc's
    * first (non-ASCII-planted) word to byte-level token ids, decode the
    * ids back to text, and report (word, n_ids, decoded) — the law
    * `decoded == word` holds by the spec-pinned round trip, and the
    * ORACLE proves it independently: it replays the merge chain to the
    * final symbols (the q113 remap-then-replace machinery), then inverts
    * bytes_to_unicode IN SQL (strpos into the same table literal →
    * from_hex → decode), so a drift in either direction of the remap, the
    * walk, or the vocabulary indexing breaks the hash.
    */
  private val q128 = Q(
    "q128_bpe_roundtrip",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val word = element_at(split(trim(translate(lower($"text"), "ae", "äé")), "\\s+"), 1)
      val ids = graft.functions.BpeExprs.bpeByteTokenIds(word, BpeByteMerges, BpeByteVocab)
      T.documents
        .select($"doc_id", word.as("word"), ids.as("__ids"))
        .select(
          $"doc_id",
          $"word",
          size($"__ids").cast("long").as("n_ids"),
          graft.functions.BpeExprs.bpeByteDecodeIds($"__ids", BpeByteVocab).as("decoded"))
        .orderBy($"doc_id")
    },
    Some {
      val wordSql = """regexp_split_to_array(trim(translate(lower(text), 'ae', 'äé')), '\s+')[1]"""
      val cnt = graft.functions.BpeSupport.duckByteWordCountSql("word", BpeByteMerges)
      val sym = graft.functions.BpeSupport.duckByteWordSymbolsSql("word", BpeByteMerges)
      val dec = graft.functions.BpeSupport.duckByteDecodeSql(sym)
      s"""
      WITH w AS (SELECT doc_id, $wordSql AS word FROM documents)
      SELECT doc_id, word, CAST($cnt AS BIGINT) AS n_ids, $dec AS decoded
      FROM w ORDER BY doc_id
      """.trim
    }
  )

  /** q120's vocabulary: the lowercase alphabet plus every symbol
    * [[BpeMerges]] can produce — so after the merge walk, exactly the
    * NON-LETTER symbols (digits, punctuation) of the lowercased text are
    * out-of-vocabulary. Shared verbatim with the oracle's membership list.
    */
  private val BpeFitVocab: Seq[String] =
    ('a' to 'z').map(_.toString) ++ BpeMerges.map { case (a, b) => a + b }

  /** Tokenizer-fit report ([[graft.functions.BpeExprs.bpeTokenIds]]): per
    * doc, the exact BPE token count AND the out-of-vocabulary token count
    * under a (merges, vocab) pair — the coverage statistic that decides
    * whether a tokenizer fits a corpus before a training run commits to
    * it (an OOV symbol becomes bytes/UNK at training time). The engine
    * reads OOV straight off the ids projection (-1 = not in vocab); the
    * oracle replays the merge walk per word and filters the FINAL SYMBOLS
    * by the same vocabulary list — count and membership share one symbol
    * derivation on both sides, so neither can drift.
    */
  private val q120 = Q(
    "q120_tokenizer_fit",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val ids = graft.functions.BpeExprs.bpeTokenIds(lower($"text"), BpeMerges, BpeFitVocab)
      T.documents
        .select($"doc_id", ids.as("__ids"))
        .select(
          $"doc_id",
          size($"__ids").cast("long").as("n_tokens"),
          size(filter($"__ids", x => x === -1)).cast("long").as("n_oov"))
        .orderBy($"doc_id")
    },
    Some {
      val cnt = graft.functions.BpeSupport.duckDocCountSql("lower(text)", BpeMerges)
      val oov = graft.functions.BpeSupport.duckDocOovCountSql("lower(text)", BpeMerges, BpeFitVocab)
      s"""
      SELECT doc_id, $cnt AS n_tokens, $oov AS n_oov
      FROM documents ORDER BY doc_id
      """.trim
    }
  )

  /** Temperature-sampled source mixture ([[Sampling.temperatureBudgets]] →
    * [[Sampling.tokenBudgetMixture]]): per-source budgets ∝ √(source token
    * share) of an 8,000-token target — the multilingual α-sampling rule at
    * α = 1/2, the one α whose power function (sqrt) IEEE 754 requires
    * correctly rounded, so the budget DERIVATION itself is bit-replayable
    * cross-engine. The oracle recomputes the per-source totals, the
    * floor(sqrt·2^26) weights, the exact HUGEINT budget split, AND the
    * two-phase selection from the corpus alone — any drift in either half
    * (weights or prefix-sum arithmetic) breaks the hash.
    */
  private val q118 = Q(
    "q118_temperature_mixture",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val withTok = T.documents
        .withColumn("n_tokens", size(split(lower($"text"), "\\s+")).cast("long"))
      val budgets =
        Sampling.temperatureBudgets(withTok, $"source", $"n_tokens", totalTokens = 8000L)
      Sampling
        .tokenBudgetMixture(
          withTok,
          group = $"source",
          key = $"doc_id",
          tokens = $"n_tokens",
          budgets = budgets,
          numShards = 8
        )
        .select($"doc_id", $"source", $"n_tokens")
        .orderBy($"doc_id")
    },
    Some(tokenBudgetOracleSql(
      "CAST(len(regexp_split_to_array(lower(text), '[ \\t\\n\\v\\f\\r]+')) AS BIGINT)",
      budgetCte = Some("""
      srcw AS (SELECT grp, CAST(floor(sqrt(CAST(sum(tok) AS DOUBLE)) * 67108864) AS BIGINT) AS w
               FROM base0 GROUP BY grp),
      bt AS (SELECT grp,
                    CAST((CAST(8000 AS HUGEINT) * w) // (SELECT sum(w) FROM srcw) AS BIGINT) AS budget
             FROM srcw)""".trim)))
  )

  /** Upsampling mixture ([[Sampling.tokenBudgetMixtureWithRepeats]]):
    * src0's 4,000-token budget exceeds its natural total → full epochs +
    * a remainder prefix; src1's budget is a down-selection or exact fit;
    * src2 pure down-selection; every other source dropped. The oracle
    * replays the whole derivation — per-group totals, epochs = budget DIV
    * total, the epoch fan-out via range(), and the remainder through the
    * IDENTICAL shard-major prefix-sum arithmetic as q102's — so both the
    * repeat count and the boundary doc of the partial epoch are
    * hash-checked.
    */
  private val q121 = Q(
    "q121_repeats_mixture",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val withTok = T.documents
        .withColumn("n_tokens", size(split(lower($"text"), "\\s+")).cast("long"))
      Sampling
        .tokenBudgetMixtureWithRepeats(
          withTok,
          group = $"source",
          key = $"doc_id",
          tokens = $"n_tokens",
          budgets = Map("src0" -> 4000L, "src1" -> 1540L, "src2" -> 700L),
          numShards = 8
        )
        .select($"doc_id", $"source", $"n_tokens", $"epoch")
        .orderBy($"doc_id", $"epoch")
    },
    Some {
      val tok = "CAST(len(regexp_split_to_array(lower(text), '[ \\t\\n\\v\\f\\r]+')) AS BIGINT)"
      val h = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
      s"""
      WITH base0 AS (SELECT doc_id, source AS grp, $tok AS tok, $h AS h FROM documents),
      b AS (SELECT *, CASE grp WHEN 'src0' THEN 4000 WHEN 'src1' THEN 1540
                               WHEN 'src2' THEN 700 ELSE -1 END AS budget
            FROM base0),
      f0 AS (SELECT * FROM b WHERE budget >= 0),
      t AS (SELECT grp, CAST(sum(tok) AS BIGINT) AS gt FROM f0 GROUP BY grp),
      e AS (SELECT f0.*, t.gt,
                   CASE WHEN t.gt > 0 THEN budget // t.gt ELSE 0 END AS epochs,
                   CASE WHEN t.gt > 0 THEN budget % t.gt ELSE budget END AS rem
            FROM f0 JOIN t USING (grp)),
      fullep AS (SELECT doc_id, grp, tok, CAST(u AS BIGINT) AS epoch
                 FROM (SELECT doc_id, grp, tok, unnest(range(epochs)) AS u FROM e)),
      f AS (SELECT *, CAST(h % 8 AS INT) AS shard FROM e),
      st AS (SELECT grp, shard, CAST(sum(tok) AS BIGINT) AS stok FROM f GROUP BY 1, 2),
      o AS (SELECT grp, shard,
                   CAST(sum(stok) OVER (PARTITION BY grp ORDER BY shard) - stok AS BIGINT) AS off
            FROM st),
      cum AS (SELECT f.doc_id, f.grp, f.tok, f.rem, f.epochs,
                     CAST(sum(f.tok) OVER (PARTITION BY f.grp, f.shard ORDER BY f.h, f.doc_id, f.tok
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + o.off AS BIGINT) AS cum
              FROM f JOIN o ON f.grp = o.grp AND f.shard = o.shard),
      remsel AS (SELECT doc_id, grp, tok, CAST(epochs AS BIGINT) AS epoch
                 FROM cum WHERE cum - tok < rem)
      SELECT doc_id, grp AS source, tok AS n_tokens, epoch
      FROM (SELECT * FROM fullep UNION ALL SELECT * FROM remsel)
      ORDER BY doc_id, epoch
      """.trim
    }
  )

  /** Hashed-bigram importance resampling
    * ([[Sampling.hashedImportanceResample]], DSIR-shaped): `src0` plays the
    * curated target domain, every other source is the raw pool; each doc's
    * score is the exact-permille target-mass fraction of its hashed bigram
    * occurrences, and the keep decision is the portable md5 coin against
    * that score — sampling probability proportional to target-likeness.
    * The oracle replays the whole chain (tokenize → bigram → md5 bucket →
    * corpus bucket stats → per-doc exact DIV → coin) in DuckDB, so any
    * drift in the feature construction, the bucket hash, the integer
    * division, or the coin breaks the hash compare.
    */
  private val q151 = {
    val numBuckets = 4096
    Q(
      "q151_importance_resample",
      (s, dir) => {
        val T = Tables(s, dir); import s.implicits._
        Sampling
          .hashedImportanceResample(
            T.documents, "doc_id", "text", $"source" === "src0", numBuckets)
          .select($"doc_id", $"is_target", $"num", $"den", $"score_permille", $"keep")
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, source = 'src0' AS tgt,
                             regexp_split_to_array(lower(text), '[ \\t\\n\\v\\f\\r]+') AS t
                      FROM documents),
        bi AS (SELECT doc_id, tgt,
                      unnest([array_to_string(t[i:i+1], ' ') for i in range(1, greatest(len(t), 2))]) AS g
               FROM toks),
        bk AS (SELECT doc_id, tgt,
                      ('0x' || substr(md5(g), 1, 15))::BIGINT % $numBuckets AS b
               FROM bi),
        st AS (SELECT b,
                      CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                      CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS cr
               FROM bk GROUP BY b),
        sc AS (SELECT bk.doc_id,
                      CAST(sum(st.ct) AS BIGINT) AS num,
                      CAST(sum(st.ct + st.cr) AS BIGINT) AS den
               FROM bk JOIN st USING (b) GROUP BY bk.doc_id)
        SELECT d.doc_id,
               d.source = 'src0' AS is_target,
               coalesce(sc.num, 0) AS num,
               coalesce(sc.den, 0) AS den,
               coalesce(CAST((1000 * CAST(sc.num AS HUGEINT)) // sc.den AS BIGINT), 0) AS score_permille,
               (NOT d.source = 'src0') AND
                 ('0x' || substr(md5('isr:' || d.doc_id), 1, 15))::BIGINT % 1000 <
                 -- same HUGEINT widening as score_permille above: both
                 -- columns must derive from ONE overflow-safe computation,
                 -- or at corpus scale the BIGINT product overflows (DuckDB
                 -- errors) while the widened score silently diverges
                 coalesce(CAST((1000 * CAST(sc.num AS HUGEINT)) // sc.den AS BIGINT), 0) AS keep
        FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        ORDER BY d.doc_id
      """.trim)
    )
  }

  val all: Seq[Q] =
    Seq(q60, q61, q72, q73, q78, q82, q97, q102, q106, q113, q118, q120, q121, q128, q151)
}
