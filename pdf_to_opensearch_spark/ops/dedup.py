"""Deduplication operators for web-scale corpora.

All hot paths are JVM-side built-ins (xxhash64, md5, groupBy) — the
MinHash signature computation never leaves whole-stage codegen; only the
SimHash bit-unpacking uses a vectorized numpy kernel.

Scale notes (100 TB):
- exact dedup: one shuffle on a 128-bit digest — uniformly distributed
  keys, no skew by construction.
- MinHash-LSH: signatures via ``min(xxhash64(shingle, seed_i))`` per doc
  (map-side partial min, skew-immune); candidate generation via band
  buckets; verification joins only within buckets. Hot buckets (boiler-
  plate shingles) are bounded by banding width; a count-based guard drops
  degenerate buckets larger than ``max_bucket`` (logged, like Spark's own
  MinHashLSH behavior on trivial signatures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analyzer import tokenize_udf


def md5_60(col: Column, seed: int | None = None) -> Column:
    """60-bit integer hash from the md5 hex prefix — the SHARED hash family
    both Spark and DuckDB can compute exactly:

        Spark:  conv(substring(md5(x), 1, 15), 16, 10)::long
        DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

    Seeded variants append ``:{seed}`` to the input. Used by the
    oracle-checked minhash/simhash entries; the xxhash64 family remains the
    production default (one JVM hash call vs md5+substr+conv)."""
    x = F.concat(col.cast("string"), F.lit(f":{seed}")) if seed is not None \
        else col.cast("string")
    return F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")


def _spread(df: DataFrame) -> DataFrame:
    """Widen a narrow input (e.g. one small parquet file) to the session's
    default parallelism BEFORE the per-row tokenize/hash work — otherwise
    the whole map side runs single-threaded. At real scale inputs have
    plenty of partitions and this is a no-op (no shuffle added)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(target, 16):
        return df.repartition(target)
    return df


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by md5(text).

    Returns (content_hash, n_docs, keeper_id) for groups with ≥2 docs;
    keeper = min id (deterministic survivor).
    """
    return (df
            .withColumn("content_hash", F.md5(F.col(text_col)))
            .groupBy("content_hash")
            .agg(F.count("*").alias("n_docs"),
                 F.min(id_col).alias("keeper_id"))
            .filter(F.col("n_docs") >= 2))


def _shingle_udf(n: int):
    """Arrow-batch shingle kernel: text → array<string> of word n-grams
    (space-joined analyzer tokens). Tokenization runs in Arrow C++
    (analyzer.tokenize_arrow_batch — no per-token Python strings during
    split); only the ~|shingles| join step touches Python objects. ~3×
    faster than tokenize_udf + JVM slice/concat at bench scale, and
    byte-identical output (space-joined tokens of the frozen analyzer)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..analyzer import tokenize_arrow_batch

    # no type hints: `from __future__ import annotations` makes them
    # strings that pandas_udf can't resolve against the local pd import
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def kernel(texts):
        tk = tokenize_arrow_batch(texts)
        toks = tk["uniq"][tk["codes"]]                  # object[ntok]
        dl, doc_idx = tk["dl"], tk["doc_idx"]
        nsh = np.maximum(dl - (n - 1), 0)               # shingles per doc
        if toks.size == 0 or int(nsh.sum()) == 0:
            return pd.Series([[] for _ in range(len(texts))])
        # a flat position is a shingle START iff its n-1 successors are in
        # the same doc: position-within-doc < dl - (n-1)
        starts_ok = tk["pos"] < (dl[doc_idx] - (n - 1))
        idx = np.flatnonzero(starts_ok)
        sh = toks[idx]
        for j in range(1, n):
            sh = sh + " " + toks[idx + j]               # object concat, C loop
        counts = np.bincount(doc_idx[idx], minlength=len(texts))
        offsets = np.cumsum(counts) - counts
        return pd.Series([sh[offsets[i]:offsets[i] + counts[i]].tolist()
                          for i in range(len(texts))])

    return kernel


def shingles(df: DataFrame, text_col: str = "text", n: int = 3,
             out_col: str = "shingle") -> DataFrame:
    """Explode word n-gram shingles (analyzer-tokenized, space-joined)."""
    sh = _shingle_udf(n)
    return (_spread(df)
            .withColumn(out_col, F.explode(sh(F.col(text_col)))))


def raw_shingles(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", shingle_n: int = 3) -> DataFrame:
    """(id, shingle) pairs WITH duplicates — the shared input of MinHash
    signature generation (min is idempotent under duplicates, so the
    full-corpus distinct shuffle is unnecessary there) AND Jaccard
    verification (which needs distinct SETS, but only over candidate
    docs — dedupe after the candidate semi-join, never corpus-wide)."""
    return (shingles(df.select(id_col, text_col), text_col, n=shingle_n)
            .select(F.col(id_col).alias("id"), "shingle"))


def distinct_shingles(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", shingle_n: int = 3) -> DataFrame:
    """(id, shingle) distinct pairs. Prefer :func:`raw_shingles` in fused
    pipelines — corpus-wide distinct is a full shuffle whose only consumer
    (Jaccard verification) needs distinct sets for candidate docs only."""
    return raw_shingles(df, id_col, text_col, shingle_n).distinct()


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", num_hashes: int = 16,
                       shingle_n: int = 3,
                       shingle_df: DataFrame | None = None,
                       hash_family: str = "xxhash64") -> DataFrame:
    """MinHash signatures: sig_i = min over shingles of hash_i(shingle).

    Entirely built-in expressions → map-side combined min aggregation.
    Output: (id, sig_0..sig_{h-1}). ``shingle_df``: optional precomputed
    (id, shingle) table — distinct or raw (min is idempotent under
    duplicate shingles, so :func:`raw_shingles` works and skips a full
    shuffle). ``hash_family``: 'xxhash64' (production default) or 'md5'
    (:func:`md5_60`, exactly reproducible in the DuckDB oracle).
    """
    sh = (shingle_df if shingle_df is not None
          else raw_shingles(df, id_col, text_col, shingle_n))
    if hash_family == "md5":
        aggs = [F.min(md5_60(F.col("shingle"), seed=i)).alias(f"sig_{i}")
                for i in range(num_hashes)]
    else:
        aggs = [F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"sig_{i}")
                for i in range(num_hashes)]
    return sh.groupBy("id").agg(*aggs).withColumnRenamed("id", id_col)


def minhash_candidate_pairs(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", num_hashes: int = 32,
                            bands: int = 8, shingle_n: int = 3,
                            max_bucket: int = 1000,
                            shingle_df: DataFrame | None = None,
                            hash_family: str = "xxhash64",
                            materialize: bool = True) -> DataFrame:
    """LSH candidate pairs: same band-bucket in any band → candidate.

    Returns distinct (id_a, id_b) with id_a < id_b. Buckets larger than
    ``max_bucket`` are dropped (degenerate boilerplate guard).

    With ``materialize=True`` (default) the candidate set — tiny by
    construction: it is bounded by the near-duplicate pair count — is
    localCheckpoint'ed inside (materialized AND lineage-truncated, so
    downstream consumers never re-analyze the signature DAG), after which
    the intermediate ``banded`` cache is released deterministically.
    ``materialize=False`` returns the lazy plan (intermediate frames stay
    persisted until the session's LRU evicts them) — for plan
    inspection/tests only.
    """
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n,
                              shingle_df=shingle_df, hash_family=hash_family)
    rows = num_hashes // bands
    if hash_family == "md5":
        # equality-only band key: the plain concat of the band's signature
        # values (no re-hash needed → byte-reproducible in SQL)
        band_arr = F.array(*[
            F.concat_ws(",", *[F.col(f"sig_{b*rows+r}").cast("string")
                               for r in range(rows)])
            for b in range(bands)
        ])
    else:
        band_arr = F.array(*[
            F.xxhash64(*[F.col(f"sig_{b*rows+r}") for r in range(rows)],
                       F.lit(b))
            for b in range(bands)
        ])
    # one posexplode + one self-join (vs a union of per-band joins, which
    # would recompute the signature DAG per band)
    from pyspark import StorageLevel

    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.posexplode(band_arr).alias("band", "bucket"))
    # persist BEFORE the guard + self-join: banded is tiny (docs × bands
    # rows) but its upstream is the whole shingle→signature pipeline,
    # which would otherwise run once per join side
    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    # degenerate-bucket guard as a map-side-combinable groupBy count +
    # broadcast anti-join of the (rare) oversized buckets — the previous
    # count(*) OVER (PARTITION BY band, bucket) window shuffled and sorted
    # EVERY banded row
    big = (banded.groupBy("band", "bucket")
           .agg(F.count("*").alias("bn"))
           .filter(F.col("bn") > max_bucket)
           .select("band", "bucket"))
    kept = banded.join(F.broadcast(big), ["band", "bucket"], "left_anti")
    # pair generation via ONE groupBy + in-row combination explode (round
    # 6): the previous a⋈b self-join shuffled the banded table twice and
    # sorted/probed per bucket; collecting each bucket's ids (safe: the
    # guard above bounds every surviving bucket at max_bucket) and
    # exploding the i<j combinations inside the row emits the identical
    # pair set with a single exchange and no join
    grp = (kept.groupBy("band", "bucket")
           .agg(F.collect_list("id").alias("ids"))
           .filter(F.size("ids") >= 2))
    out = (grp.select(F.explode("ids").alias("id_a"), "ids")
           .select("id_a",
                   F.explode(F.filter(F.col("ids"),
                                      lambda x: x > F.col("id_a")))
                   .alias("id_b"))
           .distinct())
    if materialize:
        # localCheckpoint materializes the (tiny) candidate set AND
        # truncates its lineage — verification references the candidates
        # twice, and without truncation every downstream action would
        # re-analyze the whole shingle→signature→banding plan
        out = out.localCheckpoint(eager=True)
        banded.unpersist()
    return out


def _round6_half_up(x: float) -> float:
    """Spark ``round(col, 6)`` semantics for DoubleType: shortest-repr
    decimal, HALF_UP at the 6th place (BigDecimal.valueOf + setScale).
    Python's builtin round is half-even — NOT equivalent."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"),
                                                  rounding=ROUND_HALF_UP))


# Driver fast path for candidate-restricted Jaccard verification: at or
# below these bounds the candidate docs' shingle sets collect to the
# driver and the pair loop runs in Python sets — one Spark job instead of
# the ~6-stage join cascade. Same spirit (and same safety argument) as
# duplicate_clusters' small_max union-find: candidate sets are the
# near-dup pair neighborhood, tiny relative to the corpus; web-scale
# candidate sets keep the distributed joins.
JACCARD_SMALL_PAIRS_MAX = 10_000
JACCARD_SMALL_DOCS_MAX = 5_000


def _jaccard_driver(spark, sh: DataFrame, cand_pdf, threshold: float):
    """Candidate-pair Jaccard on the driver: ``sh`` is the candidate-
    restricted (id, shingle) frame (one Spark job to collect), pairs and
    set ops run in Python. Emits exactly the join path's rows: pairs
    sharing ≥1 shingle, ``inter / (|A| + |B| − inter) ≥ threshold`` in
    f64, rounded to 6 dp with Spark's HALF_UP."""
    sh_pdf = sh.toPandas()
    sets: dict[int, set] = {}
    for i, s in zip(sh_pdf["id"].to_numpy(), sh_pdf["shingle"].to_numpy()):
        sets.setdefault(int(i), set()).add(s)
    rows = []
    for a, b in zip(cand_pdf["id_a"].to_numpy(),
                    cand_pdf["id_b"].to_numpy()):
        a, b = int(a), int(b)
        if a >= b:  # the join path only emits canonical id_a < id_b pairs
            continue
        sa, sb = sets.get(a), sets.get(b)
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter == 0:
            continue
        j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            rows.append((int(a), int(b), _round6_half_up(j)))
    rows.sort()
    return spark.createDataFrame(rows, "id_a long, id_b long, jaccard double")


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", shingle_n: int = 3,
                  threshold: float = 0.7,
                  candidates: DataFrame | None = None,
                  shingle_df: DataFrame | None = None,
                  shingles_distinct: bool = True) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs.

    WARNING — scale foot-gun: with ``candidates=None`` this degenerates to
    an all-pairs join over every doc pair sharing ≥1 shingle, which is
    quadratic in hot-shingle frequency. At scale ALWAYS pass the LSH
    ``candidates`` (the verification stage of MinHash-LSH) — or call
    :func:`minhash_near_duplicates`, which wires the two together over one
    shared shingle table.

    Jaccard = |A∩B| / |A∪B| over distinct shingle sets.
    ``shingles_distinct`` describes the PROVIDED ``shingle_df`` (True =
    "my frame is already per-doc distinct"); when no frame is given it
    selects which producer builds one. With ``shingles_distinct=False``
    the frame carries duplicates (:func:`raw_shingles` — the preferred
    producer) and the distinct is applied AFTER the candidate
    restriction — candidate docs are a vanishing fraction of the corpus,
    so this replaces a corpus-wide dedup shuffle with one over the
    candidate subset. On the ``candidates`` path a caller-provided frame
    is deduped defensively regardless of the flag (cheap on the
    candidate subset; a mislabeled raw frame used to inflate Jaccard
    silently). Without ``candidates``, the flag is trusted as given.
    """
    if shingle_df is not None:
        sh = shingle_df
    elif shingles_distinct:
        sh = distinct_shingles(df, id_col, text_col, shingle_n)
    else:
        sh = raw_shingles(df, id_col, text_col, shingle_n)
    cand_shingles = None
    if candidates is not None:
        # shrink the shingle table to candidate docs BEFORE the heavy
        # self-join — avoids the all-pairs blowup at scale
        cand_ids = (candidates.select(F.col("id_a").alias("id"))
                    .unionByName(candidates.select(F.col("id_b").alias("id")))
                    .distinct())
        sh = sh.join(F.broadcast(cand_ids), "id", "left_semi")
        # dedupe whenever the frame is not one WE built distinct: a
        # caller-provided frame may carry duplicates regardless of the
        # flag, and the distinct runs over the candidate subset only
        # (the driver fast path below dedups implicitly: sets)
        if shingle_df is not None or not shingles_distinct:
            sh = sh.distinct()
        # DRIVER fast path (round 6): a bounded candidate set verifies in
        # one collect + a Python set loop — the distributed path costs a
        # ~6-stage join cascade (self-join by shingle, two size joins, a
        # pair semi-join) whose scheduling dwarfs the data at pair counts
        # this small. f64 arithmetic and HALF_UP rounding replicate the
        # Spark expressions exactly (hash-verified); above the bounds the
        # join path runs unchanged.
        n_pairs = candidates.count()
        if n_pairs <= JACCARD_SMALL_PAIRS_MAX:
            import pandas as pd

            cand_pdf = candidates.select("id_a", "id_b").toPandas()
            uniq_ids = pd.concat([cand_pdf["id_a"],
                                  cand_pdf["id_b"]]).nunique()
            if uniq_ids <= JACCARD_SMALL_DOCS_MAX:
                return _jaccard_driver(df.sparkSession, sh, cand_pdf,
                                       threshold)
        # the candidate-restricted shingle sets feed THREE consumers
        # (sizes, both self-join sides) — persist the tiny frame so the
        # semi-join + distinct over the full shingle table runs once;
        # exposed on the result as ``_cand_shingles`` so materializing
        # callers can release it deterministically
        from pyspark import StorageLevel

        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
        cand_shingles = sh
    elif not shingles_distinct:
        sh = sh.distinct()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    out = (inter
           .join(sizes.withColumnRenamed("id", "id_a")
                 .withColumnRenamed("sz", "sz_a"), "id_a")
           .join(sizes.withColumnRenamed("id", "id_b")
                 .withColumnRenamed("sz", "sz_b"), "id_b")
           .withColumn("jaccard",
                       F.col("inter") /
                       (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))
    out._cand_shingles = cand_shingles
    return out


def minhash_near_duplicates(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", num_hashes: int = 32,
                            bands: int = 8, shingle_n: int = 3,
                            threshold: float = 0.7,
                            max_bucket: int = 1000,
                            hash_family: str = "xxhash64") -> DataFrame:
    """MinHash-LSH near-duplicate pairs, Jaccard-verified — the fused
    pipeline: ONE raw shingle table (tokenize+explode runs once,
    persisted, NO corpus-wide distinct — min-hash is idempotent under
    duplicates and verification dedupes only the candidate subset) feeds
    both the signature/banding stage and the verification join.

    Returns (id_a, id_b, jaccard) with jaccard ≥ threshold.
    """
    from pyspark import StorageLevel

    sh = raw_shingles(df, id_col, text_col, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK)
    # minhash_candidate_pairs materializes the (tiny) candidate set and
    # releases its own intermediate cache; the verification stage joins the
    # candidates twice, so the persisted frame is reused, not recomputed
    cands = minhash_candidate_pairs(df, id_col, text_col, num_hashes, bands,
                                    shingle_n, max_bucket, shingle_df=sh,
                                    hash_family=hash_family)
    out = jaccard_pairs(df, id_col, text_col, shingle_n, threshold,
                        candidates=cands, shingle_df=sh,
                        shingles_distinct=False)
    # materialize the (tiny) verified-pair result, then deterministically
    # release the big shingle cache and the candidate-subset cache — no
    # frame outlives this call except the persisted result itself (the
    # candidate set is localCheckpoint'ed inside minhash_candidate_pairs;
    # its blocks are freed by the context cleaner)
    cand_sh = getattr(out, "_cand_shingles", None)
    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    sh.unpersist()
    if cand_sh is not None:
        cand_sh.unpersist()
    return out


def simhash(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text",
            hash_family: str = "xxhash64") -> DataFrame:
    """SimHash per doc (64-bit with xxhash64, 60-bit with the md5 shared
    family — :func:`md5_60` is exactly reproducible in the DuckDB oracle).

    Token hashes are computed JVM-side; the per-doc weighted bit-vote runs
    in a vectorized numpy kernel over grouped token hashes.
    """
    import numpy as np
    import pandas as pd

    bits_n = 60 if hash_family == "md5" else 64
    hash_col = (md5_60(F.col("token")) if hash_family == "md5"
                else F.xxhash64("token"))
    toks = (_spread(df)
            .select(id_col, tokenize_udf(F.col(text_col)).alias("t"))
            .select(id_col, F.explode("t").alias("token"))
            .groupBy(id_col, "token")
            .agg(F.count("*").alias("tf"))
            .withColumn("h", hash_col)
            # coarse grouping key: one kernel call handles ~1/64 of docs
            # (per-doc applyInPandas would mean one Python call per doc)
            .withColumn("_gk", F.pmod(F.col(id_col), F.lit(64))))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(np.int64)
        h = pdf["h"].to_numpy(np.int64).astype(np.uint64)
        tf = pdf["tf"].to_numpy(np.float64)
        order = np.argsort(ids, kind="stable")
        ids, h, tf = ids[order], h[order], tf[order]
        bits = ((h[:, None] >> np.arange(bits_n, dtype=np.uint64)) &
                np.uint64(1)).astype(np.float64)  # (n_tokens, bits_n)
        votes = (2.0 * bits - 1.0) * tf[:, None]
        # fully vectorized per-doc bit vote: reduceat over sorted groups
        # (no per-doc Python loop — one segmented sum for the whole batch)
        starts = np.flatnonzero(np.concatenate(
            ([True], ids[1:] != ids[:-1])))
        summed = np.add.reduceat(votes, starts, axis=0)  # (n_docs, bits_n)
        sig_bits = (summed > 0).astype(np.uint64)
        sigs = (sig_bits << np.arange(bits_n, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64)
        # reinterpret uint64→int64 (two's complement view; np.int64(scalar)
        # raises OverflowError on numpy>=2.0 when bit 63 is set)
        return pd.DataFrame({id_col: ids[starts],
                             "simhash": sigs.view(np.int64)})

    return toks.groupBy("_gk").applyInPandas(
        kernel, schema=f"{id_col} long, simhash long")


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_hamming: int = 3,
                       hash_family: str = "xxhash64",
                       materialize: bool = True) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation: split the signature into 4 chunks (16 bits for
    the 64-bit family, 15 for the 60-bit md5 family); by pigeonhole, any
    pair within Hamming ≤3 shares at least one exact chunk → equi-join per
    chunk, then exact popcount filter (JVM-side bit_count). EXACT under
    max_hamming ≤ 3 (4 chunks, 3 flips can't touch all chunks).

    ``s`` (the signature table) feeds BOTH sides of all 4 chunk joins —
    Spark has no cross-branch common-subexpression elimination, so without
    a persist the tokenize→explode→groupBy→applyInPandas simhash pipeline
    would re-run up to 8×. ``materialize=True`` (default) persists ``s``,
    materializes the (tiny) pair result, and releases the signature cache
    deterministically; ``materialize=False`` returns the lazy plan with
    ``s`` persisted (plan inspection/tests only).
    """
    from pyspark import StorageLevel

    sigs = simhash(df, id_col, text_col, hash_family=hash_family)
    cw = 15 if hash_family == "md5" else 16
    mask = (1 << cw) - 1
    chunks = [F.shiftrightunsigned(F.col("simhash"), cw * c)
              .bitwiseAND(F.lit(mask)).alias(f"c{c}") for c in range(4)]
    s = (sigs.select(F.col(id_col).alias("id"), "simhash", *chunks)
         .persist(StorageLevel.MEMORY_AND_DISK))
    pairs = None
    for c in range(4):
        a = s.select(F.col("id").alias("id_a"),
                     F.col("simhash").alias("sig_a"), F.col(f"c{c}").alias("ck"))
        b = s.select(F.col("id").alias("id_b"),
                     F.col("simhash").alias("sig_b"), F.col(f"c{c}").alias("ck"))
        p = (a.join(b, "ck").filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sig_a", "sig_b"))
        pairs = p if pairs is None else pairs.unionByName(p)
    out = (pairs.distinct()
           .withColumn("hamming", F.bit_count(
               F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
           .filter(F.col("hamming") <= max_hamming)
           .select("id_a", "id_b", "hamming"))
    if materialize:
        out = out.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()
        s.unpersist()
    return out


def duplicate_clusters(pairs: DataFrame, max_iters: int = 20,
                       small_max: int = 500_000) -> DataFrame:
    """Near-duplicate pair set → duplicate CLUSTERS (connected components):
    the step a real dedup pipeline needs after pair generation — transitive
    closure turns chains (A~B, B~C, A!~C) into one keep-group.

    Returns (cluster_id, doc_id): one row per member of a ≥2-doc cluster;
    cluster_id = min doc_id of the component (the deterministic keeper).

    Pair sets are tiny relative to the corpus (they are the near-dup
    graph, not the doc set), so at or below ``small_max`` pairs the
    closure runs as driver-side union-find — one Arrow-batched toPandas,
    zero iterative Spark jobs. The default is sized against a
    default-sized driver (~16 bytes/edge in two int64 numpy columns plus
    the dict; the previous 5M default pushed hundreds of MB of Row
    objects through collect()).

    Above ``small_max``, the distributed path runs alternating
    LARGE-STAR / SMALL-STAR contraction — the published MapReduce
    connected-components algorithm (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC 2014): each round re-points every
    node's larger neighbors at its smallest known neighbor (large-star)
    and then contracts each node's smaller neighbors onto their minimum
    (small-star). The edge set's fixed points are exactly star forests
    rooted at component minima, and convergence is O(log n) rounds on ANY
    graph shape — min-label propagation (the previous implementation) is
    O(diameter), which an adversarial chain turns into O(n).
    Deterministic. Every round localCheckpoints (lineage truncation —
    Catalyst plan growth is exponential across iterative joins).

    If ``max_iters`` rounds pass without reaching the fixed point, a
    RuntimeWarning is raised and the best-effort labels are returned
    (with max_iters=20 that takes a component needing >20 star rounds —
    beyond any realistic graph; the previous min-label loop hit its bound
    silently at diameter 20 and returned wrong labels with no signal).

    The result DataFrame carries ``_cc_rounds`` (rounds executed) and
    ``_cc_converged`` attributes as instrumentation.
    """
    spark = pairs.sparkSession
    n_pairs = pairs.count()
    if n_pairs <= small_max:
        pdf = pairs.select("id_a", "id_b").toPandas()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pdf["id_a"].to_numpy(), pdf["id_b"].to_numpy()):
            a, b = int(a), int(b)
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min: the smaller root stays the representative
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        rows = sorted((find(n), n) for n in parent)
        out = spark.createDataFrame(rows, "cluster_id long, doc_id long")
        out._cc_rounds = 0
        out._cc_converged = True
        return out

    # canonical undirected edges (hi > lo), deduped
    e = (pairs.select(F.greatest("id_a", "id_b").alias("hi"),
                      F.least("id_a", "id_b").alias("lo"))
         .filter(F.col("hi") != F.col("lo"))
         .distinct()
         .localCheckpoint(eager=True))
    n_e = e.count()
    converged = False
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        # LARGE-STAR: for every node u, re-point each STRICTLY LARGER
        # neighbor v at m = min(neighbors(u) ∪ {u}). Emitted (v, m) stays
        # canonical: v > u ≥ m.
        sym = (e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
               .unionByName(
                   e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("mn", "u").alias("mn")))
        large = (sym.join(mins, "u")
                 .filter(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("hi"), F.col("mn").alias("lo"))
                 .distinct())
        # SMALL-STAR: group each edge at its LARGER endpoint; contract
        # all smaller neighbors (and the node itself) onto their minimum.
        smins = large.groupBy("hi").agg(F.min("lo").alias("mn"))
        small = (large.join(smins, "hi")
                 .filter(F.col("lo") != F.col("mn"))
                 .select(F.col("lo").alias("hi"), F.col("mn").alias("lo"))
                 .unionByName(smins.select("hi", F.col("mn").alias("lo")))
                 .distinct()
                 .localCheckpoint(eager=True))
        n_new = small.count()
        if n_new == n_e and small.join(
                e, ["hi", "lo"], "left_anti").limit(1).count() == 0:
            e = small
            converged = True
            break
        e, n_e = small, n_new
    if not converged:
        import warnings

        warnings.warn(
            f"duplicate_clusters: star contraction did not reach its "
            f"fixed point within max_iters={max_iters} rounds; labels "
            f"may be partially propagated", RuntimeWarning, stacklevel=2)
    # converged edge set = star forest rooted at component minima:
    # members are the hi side, roots label themselves
    out = (e.select(F.col("lo").alias("cluster_id"),
                    F.col("hi").alias("doc_id"))
           .unionByName(e.select(F.col("lo").alias("cluster_id"),
                                 F.col("lo").alias("doc_id")))
           .distinct())
    out._cc_rounds = rounds
    out._cc_converged = converged
    return out
