"""BM25 top-k query engine (SURVEY.md J9, O5, W7, §3.3 query lifecycle).

Natively re-owns what the reference delegated to OpenSearch/Lucene
(opensearch_loader.py:873-890): analyze query → term dictionary lookup →
postings traversal → BM25 scores → per-shard top-k → global merge.

Physical plan:
1. Tokenize queries with the frozen analyzer; look up (df, idf) in the
   dictionary with a parquet scan *filtered by the query terms* (predicate
   pushdown; the per-query term set is tiny so this is a pruned point read,
   the broadcast-join analogue of Lucene's term-dictionary seek).
2. Scan only postings partitions whose term-bucket can contain a query term
   (``bucket IN (...)`` partition pruning) further filtered ``term IN (...)``
   (parquet row-group min/max pruning).
3. ``applyInPandas`` per doc-range: decode blocks, score **term-at-a-time,
   fully vectorized** (numpy concat → groupby-sum), per-range top-k.
   Because every document lives in exactly one range, per-range scores are
   complete — no cross-range combine of partial scores is needed.
   Optional block-max pruning drops whole 128-posting blocks whose
   summed upper bounds cannot reach the running threshold (sound: uses the
   per-block max stored at build time; differential-tested vs exhaustive).
4. Global top-k: per-range candidates are ≤ k·n_ranges rows → window
   ``row_number() over (partition by query order by score desc, doc_id)``
   ≤ k (TakeOrderedAndProject-scale, not a full sort).

Rank identity: ties broken by ascending doc_id everywhere, scores f64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .analyzer import tokenize_text
from .codec import (
    BLOCK,
    decode_block_meta,
    decode_positions,
    decode_postings,
    tf_norm,
)
from .indexer import IndexPaths, bucket_of
from .oracle import idf as idf_fn

RESULT_SCHEMA = "query_id int, doc_id long, score double"

# Above this many terms/keys, a literal IN-list bloats the plan (and its
# serialized size) — switch to a broadcast semi-join. Below it, keep isin:
# the literal predicate reaches the parquet reader as row-group min/max
# pruning, which a join cannot.
IN_LIST_MAX = 256


def _filter_in(df: DataFrame, col: str, values: list) -> DataFrame:
    """``col IN values`` — literal pushdown for small lists, broadcast
    semi-join for large ones (plan-size safe at thousands of keys)."""
    if len(values) <= IN_LIST_MAX:
        return df.filter(F.col(col).isin(values))
    spark = df.sparkSession
    vdf = spark.createDataFrame([(v,) for v in values], f"{col} string")
    return df.join(F.broadcast(vdf), col, "left_semi")


def lookup_dict_rows(spark: SparkSession, dict_path: str,
                     terms: list[str]) -> list:
    """Dictionary point-lookup: (term, df, …) rows for ``terms``.

    On a local FS this is a driver-side pyarrow read with a C++-side
    ``term IN`` filter (parquet row-group min/max pruning — the same
    pruning the Spark scan did) and NO Spark job: a search call's term
    set is tiny, and the previous per-call scan job spent more wall on
    scheduling than on I/O. The row-group pruning keeps this a point
    read at any dictionary size (Lucene's term-dict seek analogue runs
    on one node too). Non-local paths keep the pushed-down Spark scan.
    """
    import glob
    import os

    from .indexer import _is_local_path

    if _is_local_path(dict_path, spark):
        p = dict_path[7:] if dict_path.startswith("file://") else dict_path
        files = sorted(glob.glob(os.path.join(p, "*.parquet")))
        if files:
            import pyarrow.parquet as pq

            tbl = pq.read_table(files, filters=[("term", "in",
                                                 list(terms))])
            return tbl.to_pylist()
    return _filter_in(spark.read.parquet(dict_path), "term",
                      list(terms)).collect()


_ALIGN_CACHE: dict[tuple, bool] = {}


def _ranges_file_aligned(files: list[str]) -> bool:
    """True iff every doc range's postings live WHOLLY in one file —
    the property that lets a per-file task score its ranges completely.
    Both builders write range-aligned files, but an external rewrite
    (a crash-simulation overwrite, a third-party compaction) can
    scatter a range across files, and a kernel that sees only part of
    a range would emit wrong partial scores. Checked from parquet
    FOOTER stats only (range_id min/max per file, pairwise-disjoint
    intervals ⟹ aligned); memoized per (path, mtime, size) snapshot."""
    import os

    key = tuple((f, int(os.path.getmtime(f) * 1000), os.path.getsize(f))
                for f in files)
    hit = _ALIGN_CACHE.get(key)
    if hit is not None:
        return hit
    import pyarrow.parquet as pq

    spans = []
    ok = True
    for f in files:
        try:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().names.index("range_id")
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    raise ValueError("no stats")
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is None:
                continue  # empty file
            spans.append((lo, hi))
        except Exception:
            ok = False
            break
    if ok:
        spans.sort()
        ok = all(a_hi < b_lo for (_a, a_hi), (b_lo, _b)
                 in zip(spans, spans[1:]))
    if len(_ALIGN_CACHE) > 64:
        _ALIGN_CACHE.clear()
    _ALIGN_CACHE[key] = ok
    return ok


def _python_scan_per_range(spark: SparkSession, paths: IndexPaths,
                           kernel, buckets: list[int], terms: list[str],
                           need_positions: bool = False
                           ) -> DataFrame | None:
    """Fused postings scan + per-range kernel with PYTHON-NATIVE I/O:
    one Spark task per postings FILE; the task reads its file with
    pyarrow (``filters=`` gives C++-side bucket/term row-group pruning,
    the same pruning the JVM scan did) and runs the scoring kernel on
    each whole range inside it — the postings bytes never cross the
    JVM↔Python Arrow socket and the ``groupBy(range_id)`` EXCHANGE
    disappears (every range's rows live in exactly one file by the
    build's range-alignment invariant, for both the JVM and the pyio
    writer).

    Why (BENCH.md §6 round-5 diagnosis): the kernel scales 1→4 cores
    like the Spark-free pool control (~0.86) while the JVM→Arrow
    transfer path scales at ~0.60 — the boundary doubles memory traffic
    and hits the shared-bandwidth wall first; for the 2048-query batch
    the transfer is the whole pruned postings table plus a shuffle of
    it. ``need_positions=False`` additionally prunes the ``poss``
    column (dead weight for pure BM25 — the JVM path shipped it).

    Returns None when the layout doesn't allow it (non-local postings,
    or the legacy ``bucket=N/`` partitioned dirs whose files lack the
    bucket column) — callers fall back to the JVM scan. Disable
    globally with SPARK_GRAFT_PYSCAN=0.
    """
    import glob
    import os

    if os.environ.get("SPARK_GRAFT_PYSCAN", "1") == "0":
        return None
    from .indexer import _is_local_path

    if not _is_local_path(paths.postings, spark):
        return None
    files = sorted(glob.glob(os.path.join(paths.postings, "*.parquet")))
    if not files or not _ranges_file_aligned(files):
        return None
    bucket_list = sorted(int(b) for b in buckets)
    term_list = sorted(terms)

    def task(it):
        import pyarrow as pa
        import pyarrow.parquet as pq

        # Spark's task slots are the parallelism; Arrow's own pool
        # defaults to ALL host CPUs per process (oversubscription)
        pa.set_cpu_count(1)
        pa.set_io_thread_count(1)
        filters = [("bucket", "in", bucket_list),
                   ("term", "in", term_list)]
        for fdf in it:
            for path in (p for b in fdf["bin"] for p in bins[int(b)]):
                pf_names = pq.ParquetFile(path).schema_arrow.names
                cols = [c for c in pf_names
                        if need_positions or c != "poss"]
                tbl = pq.read_table(path, columns=cols, filters=filters,
                                    use_threads=False)
                if tbl.num_rows == 0:
                    continue
                pdf = tbl.to_pandas()
                for _rid, grp in pdf.groupby("range_id", sort=False):
                    out = kernel(grp)
                    if len(out):
                        yield out

    # task granularity (round 6): each mapInPandas task pays a fixed
    # JVM↔worker turnaround (closure deserialize — the query batch's
    # qinfo rides in the closure — plus scheduling), so one-file-per-task
    # charges that constant once per FILE. Pack files into
    # min(len(files), max(8, 2·slots)) LPT bins instead: the constant is
    # paid O(bins) times, and the parallelism-independent floor keeps the
    # physical task layout identical across core counts (the same
    # fixed-granularity choice as the bench's pool control), so scaling
    # ratios measure the kernel, not the task-count asymmetry.
    # Bin ids ride a spark.range frame (one id per partition, pure JVM —
    # no shuffle, no pickled-RDD evaluation under the Arrow runner); the
    # bins themselves travel in the task closure next to qinfo.
    import os as _os

    slots = max(1, spark.sparkContext.defaultParallelism)
    n_bins = min(len(files), max(8, 2 * slots))
    bins: list[list[str]] = [[] for _ in range(n_bins)]
    loads = [0] * n_bins
    for f in sorted(files, key=_os.path.getsize, reverse=True):
        i = loads.index(min(loads))
        bins[i].append(f)
        loads[i] += _os.path.getsize(f)
    bins.sort(key=lambda b: -sum(_os.path.getsize(f) for f in b))
    return (spark.range(0, n_bins, 1, numPartitions=n_bins)
            .withColumnRenamed("id", "bin")
            .mapInPandas(task, schema=RESULT_SCHEMA))


def _weighted_qinfo(q_terms: dict, idfs: dict) -> dict:
    """{query_id: {term: idf · occurrence-count}} — BM25 scores accumulate
    once per query-term OCCURRENCE (oracle.py:53-64 semantics), so repeated
    terms get proportionally larger weights."""
    from collections import Counter

    qinfo = {}
    for qid, toks in q_terms.items():
        ti = {t: idfs[t] * c for t, c in Counter(toks).items() if t in idfs}
        if ti:
            qinfo[int(qid)] = ti
    return qinfo


class IndexStats:
    def __init__(self, row):
        self.N = int(row["N"])
        self.avgdl = float(row["avgdl"])
        self.avgdl_build = float(row["avgdl_build"])
        self.n_buckets = int(row["n_buckets"])
        self.k1 = float(row["k1"])
        self.b = float(row["b"])


def load_stats(spark: SparkSession, index_dir: str) -> IndexStats:
    from .indexer import read_small_table

    return IndexStats(
        read_small_table(spark, IndexPaths(index_dir).stats).iloc[0])


def _score_kernel(qinfo: dict, k: int, stats: IndexStats, prune: bool,
                  filtered: bool = False, bool_spec: dict | None = None,
                  after_spec: dict | None = None,
                  msm_spec: dict | None = None):
    """Per-doc-range scorer. qinfo: {query_id: {term: weight}} where
    weight = idf · (occurrences of the term in the query) — BM25 accumulates
    per query-term occurrence (Lucene BooleanQuery / BruteForceBM25.search
    semantics), so 'the the cat' scores 'the' twice.

    With ``filtered=True`` the kernel is used as a cogroup function:
    (postings_pdf, allowed_pdf) where allowed_pdf carries the doc_ids that
    pass the metadata filter in this range (the Lucene bool/filter context:
    scores are corpus-global, the filter only restricts the candidate set —
    opensearch_loader.py:873-884 semantics).

    ``after_spec``: {query_id: (score, doc_id)} — the search_after
    cursor: only docs sorting STRICTLY AFTER the cursor in the
    (score desc, doc_id asc) total order compete for the page's top-k.
    The filter runs range-locally before selection, so a deep page
    never materializes more than k rows per range (the OpenSearch
    search_after contract, vs the from+size deep-paging trap). Cursor
    scores must come from the same engine (bit-identical f64); callers
    pass ``prune=False`` — block-max thresholds assume the
    unconstrained top-k, and the after-page lives below it.

    ``bool_spec``: {query_id: (must_terms, must_not_terms)} — Lucene
    BooleanQuery clause constraints (the reference's bool query builder,
    opensearch_loader.py:430-441). A doc qualifies only if it contains
    EVERY must term and NO must_not term; constraints are range-local
    because each doc lives in exactly one range. must terms also score
    (they are in qinfo); must_not terms only exclude. Callers must pass
    ``prune=False`` with a non-empty bool_spec: block-max thresholds are
    computed over unconstrained candidates, and clause filtering can push
    the true k-th score below that threshold (same soundness argument as
    the metadata-filter path).

    ``msm_spec``: {query_id: m} — the ``minimum_should_match`` parameter
    of the reference's match queries (the OpenSearch search body the
    repo's verify step issues, opensearch_loader.py:873-884): a doc
    qualifies only if it matches ≥ m DISTINCT query terms. The matched
    count per doc falls out of the TAAT combine for free (one
    contribution segment per distinct matched term — reduceat segment
    lengths), so this is a vectorized mask, not a second pass. Requires
    ``prune=False`` for the same soundness reason as bool_spec: block-max
    masks drop low-scoring postings, which would undercount a doc's
    matched-term tally.
    """
    k1, b, avgdl = stats.k1, stats.b, stats.avgdl
    # dense-accumulator batch path (guide §1.2 "the distributed algorithm
    # first"): eligible when nothing query-specific constrains the doc set
    # — per-doc sums are bit-identical to the loop path (see score_range)
    # ≥16 queries: dense per-query work is O(range span), which only
    # beats the loop when a batch amortizes the per-range setup — and
    # small declared query sets (3-5 queries, oracle-hash-gated) keep the
    # loop path byte-for-byte (the dense accumulator's per-doc sums can
    # differ from np.add.reduceat's SIMD association by 1 ULP)
    dense_ok = (not prune and not filtered and not bool_spec
                and not after_spec and not msm_spec and len(qinfo) >= 16)
    batch_terms = sorted({t for ti in qinfo.values() for t in ti})

    def score_cogroup(pdf: pd.DataFrame, allowed: pd.DataFrame) -> pd.DataFrame:
        out = score_range(pdf, allowed["doc_id"].to_numpy(np.int64))
        return out

    def score_range(pdf: pd.DataFrame,
                    allowed_ids: np.ndarray | None = None) -> pd.DataFrame:
        by_term: dict[str, dict] = {}
        for rec in pdf.to_dict("records"):
            by_term[rec["term"]] = rec
        # per-range caches shared across the query batch: each term is
        # decoded and tf-normalized ONCE even when thousands of queries hit
        # it (the per-query idf·count weight is a cheap scalar multiply)
        dec_cache: dict[str, tuple] = {}
        norm_cache: dict[str, np.ndarray] = {}
        ub_cache: dict[str, np.ndarray] = {}

        def get_decoded(t: str):
            got = dec_cache.get(t)
            if got is None:
                ids, tfs, dls = decode_postings(by_term[t])
                if allowed_ids is not None:
                    m = np.isin(ids, allowed_ids)
                    ids, tfs, dls = ids[m], tfs[m], dls[m]
                got = dec_cache[t] = (ids, tfs, dls)
            return got

        # ---- dense-accumulator batch path (round 6): a doc range is a
        # CONTIGUOUS doc_id span, so scores accumulate into a direct-
        # offset array (col = doc_id - range_min): no per-query concat,
        # no argsort, no reduceat. Contributions are strictly positive
        # and added in the same per-query term order as the loop path
        # (and IEEE 0.0 + x == x, so the zeros start adds nothing);
        # differential-tested equal to the loop on ranks/doc sets — raw
        # scores can differ from np.add.reduceat's SIMD-internal
        # association by 1 ULP, which is why dense_ok requires a ≥16
        # query batch (oracle-gated small query sets never come here).
        # Gated on density — per-query work is O(ncols), which only
        # beats the loop's O(Σ|lists| · log) when the batch touches most
        # columns; sparse workloads keep the loop.
        if dense_ok:
            live: dict[str, tuple] = {}
            lo_id = hi_id = None
            nnz = 0
            for t in batch_terms:
                if t not in by_term:
                    continue
                ids, tfs, dls = get_decoded(t)
                if ids.size == 0:
                    continue
                c = norm_cache.get(t)
                if c is None:
                    c = norm_cache[t] = tf_norm(tfs, dls, avgdl, k1, b)
                live[t] = (ids, c)
                nnz += ids.size
                lo_id = ids[0] if lo_id is None else min(lo_id, ids[0])
                hi_id = ids[-1] if hi_id is None else max(hi_id, ids[-1])
            ncols = 0 if lo_id is None else int(hi_id) - int(lo_id) + 1
            if live and 0 < ncols <= 8_000_000 and nnz >= ncols:
                lo_id = int(lo_id)
                # pre-bind (cols, contrib) per term so the per-query loop
                # does two dict gets and one fancy-indexed add per term
                pre = {t: (ids - lo_id, c) for t, (ids, c) in live.items()}
                parts_q, parts_d, parts_s = [], [], []
                acc = np.empty(ncols)
                for query_id, term_idfs in qinfo.items():
                    acc[:] = 0.0
                    n_hit = 0
                    for t, w in term_idfs.items():
                        tl = pre.get(t)
                        if tl is None:
                            continue
                        acc[tl[0]] += w * tl[1]
                        n_hit += 1
                    if n_hit == 0:
                        continue
                    uniq0 = np.flatnonzero(acc > 0.0)
                    if uniq0.size == 0:
                        continue
                    accm = acc[uniq0]
                    uniq = (uniq0 + lo_id).astype(np.int64)
                    top = min(k, uniq.size)
                    if uniq.size > top:
                        kth = np.partition(
                            accm, accm.size - top)[accm.size - top]
                        mm = accm >= kth
                        cand_u, cand_a = uniq[mm], accm[mm]
                    else:
                        cand_u, cand_a = uniq, accm
                    order = np.lexsort((cand_u, -cand_a))[:top]
                    parts_q.append(np.full(top, query_id, dtype=np.int32))
                    parts_d.append(cand_u[order])
                    parts_s.append(cand_a[order])
                if parts_q:
                    qcat = np.concatenate(parts_q)
                    dcat = np.concatenate(parts_d)
                    scat = np.concatenate(parts_s)
                else:
                    qcat = np.empty(0, dtype=np.int32)
                    dcat = np.empty(0, dtype=np.int64)
                    scat = np.empty(0)
                return pd.DataFrame({
                    "query_id": pd.Series(qcat, dtype="int32"),
                    "doc_id": pd.Series(dcat, dtype="int64"),
                    "score": pd.Series(scat, dtype="float64"),
                })

        # NOTE: a fully-batched variant (one global (query,doc) key sort
        # across the query set) was tried and measured 4× SLOWER than this
        # per-query loop — many small cache-resident accumulates beat one
        # huge uint64 sort. The shared decode/contrib caches above are
        # what matters for batch workloads.
        out_q, out_d, out_s = [], [], []
        for query_id, term_idfs in qinfo.items():
            hits = [(t, w, by_term[t]) for t, w in term_idfs.items()
                    if t in by_term]
            if not hits:
                continue
            decoded = {t: get_decoded(t) for t, _w, _rec in hits}
            hits = [(t, w, rec) for t, w, rec in hits if decoded[t][0].size]
            if not hits:
                continue
            spec = bool_spec.get(query_id) if bool_spec else None
            if spec:
                live = {t for t, _w, _rec in hits}
                if any(t not in live for t in spec[0]):
                    continue  # a must term has no postings in this range
            m_req = msm_spec.get(query_id) if msm_spec else None
            if m_req is not None and len(hits) < m_req:
                continue  # fewer live terms than the floor: nothing matches
            contribs = {}
            for t, w, _rec in hits:
                c = norm_cache.get(t)
                if c is None:
                    c = norm_cache[t] = tf_norm(
                        decoded[t][1], decoded[t][2], avgdl, k1, b)
                contribs[t] = w * c
            # block maxes index ORIGINAL posting positions → pruning is
            # disabled under a metadata filter (positions no longer align)
            if prune and len(hits) > 1 and allowed_ids is None:
                masks = _block_prune_masks(hits, contribs, k, avgdl, k1, b,
                                           ub_cache)
            else:
                masks = None
            parts_ids, parts_sc = [], []
            for t, _w, _rec in hits:
                doc_ids = decoded[t][0]
                sc_t = contribs[t]
                if masks is not None and masks[t] is not None:
                    keep = masks[t]
                    doc_ids, sc_t = doc_ids[keep], sc_t[keep]
                parts_ids.append(doc_ids)
                parts_sc.append(sc_t)
            ids = np.concatenate(parts_ids)
            sc = np.concatenate(parts_sc)
            if ids.size == 0:
                continue
            # vectorized TAAT combine: stable sort by doc → segmented sum.
            # reduceat's left-to-right per-segment sum adds contributions
            # in the SAME order as the former unique+add.at (stable sort
            # keeps term order within a doc; IEEE: 0+c1 == c1), so scores
            # are bit-identical — ~2× less work than unique(return_inverse)
            order0 = np.argsort(ids, kind="stable")
            ids_s, sc_s = ids[order0], sc[order0]
            chg = np.empty(ids_s.size, dtype=bool)
            chg[0] = True
            chg[1:] = ids_s[1:] != ids_s[:-1]
            starts = np.flatnonzero(chg)
            acc = np.add.reduceat(sc_s, starts)
            uniq = ids_s[starts]
            if m_req is not None and m_req > 1:
                # contribution segments per doc = distinct matched terms
                seglen = np.diff(np.append(starts, ids_s.size))
                keep = seglen >= m_req
                uniq, acc = uniq[keep], acc[keep]
                if uniq.size == 0:
                    continue
            if spec:
                keep = np.ones(uniq.size, dtype=bool)
                for t in spec[0]:           # must: intersect posting sets
                    keep &= np.isin(uniq, decoded[t][0])
                for t in spec[1]:           # must_not: subtract
                    if t in by_term:
                        keep &= ~np.isin(uniq, get_decoded(t)[0])
                uniq, acc = uniq[keep], acc[keep]
                if uniq.size == 0:
                    continue
            aft = after_spec.get(query_id) if after_spec else None
            if aft is not None:
                a_s, a_d = aft
                keep = (acc < a_s) | ((acc == a_s) & (uniq > a_d))
                uniq, acc = uniq[keep], acc[keep]
                if uniq.size == 0:
                    continue
            top = min(k, uniq.size)
            if uniq.size > top:
                # tie-safe selection: keep every doc scoring >= the k-th
                # value (boundary ties included), then rank only those —
                # argpartition alone would break boundary ties arbitrarily
                # instead of by ascending doc_id (rank-identity contract)
                kth = np.partition(acc, acc.size - top)[acc.size - top]
                m = acc >= kth
                cand_u, cand_a = uniq[m], acc[m]
            else:
                cand_u, cand_a = uniq, acc
            order = np.lexsort((cand_u, -cand_a))[:top]
            out_q.extend([query_id] * top)
            out_d.extend(cand_u[order].tolist())
            out_s.extend(cand_a[order].tolist())
        return pd.DataFrame({
            "query_id": pd.Series(out_q, dtype="int32"),
            "doc_id": pd.Series(out_d, dtype="int64"),
            "score": pd.Series(out_s, dtype="float64"),
        })

    def score_plain(pdf: pd.DataFrame) -> pd.DataFrame:
        # single-arg wrapper: applyInPandas passes (key, pdf) to two-arg
        # functions, so score_range(pdf, allowed_ids=None) must be wrapped
        return score_range(pdf)

    return score_cogroup if filtered else score_plain


def _block_prune_masks(hits: list, contribs: dict, k: int,
                       avgdl: float, k1: float, b: float,
                       ub_cache: dict | None = None) -> dict:
    """Block-max pruning masks (BMW family; sound, vectorized).

    Threshold seeding: the *champion* term (largest idf·block-max) has its
    actual per-posting contributions already computed — each is a lower
    bound on that doc's final score, so the k-th largest contribution is a
    sound lower bound on the true k-th best total score in this range.

    Block prune rule: a 128-posting block b of term t is skippable iff
    ``idf_t·block_max_t[b] + Σ_{t'≠t} max(idf_t'·block_max_t') < threshold``
    — every doc in that block then provably misses top-k, so dropping its
    t-contribution cannot perturb the top-k set or the exact scores of its
    members (their own blocks are never prunable). Differential-tested
    against exhaustive scoring (prune=False).

    Returns {term: bool posting mask or None (keep all)}.
    """
    ubs = {}
    for t, w, rec in hits:
        u = ub_cache.get(t) if ub_cache is not None else None
        if u is None:
            btf, bdl = decode_block_meta(rec["block_max_tf"],
                                         rec["block_min_dl"])
            # (max_tf, min_dl) bound is valid at ANY avgdl; the (1+1e-9)
            # pad absorbs float monotonicity edge cases. Cached unweighted:
            # the per-query idf·count weight w varies across queries.
            u = tf_norm(btf, bdl, avgdl, k1, b) * (1.0 + 1e-9)
            if ub_cache is not None:
                ub_cache[t] = u
        ubs[t] = w * u
    term_max = {t: (u.max() if u.size else 0.0) for t, u in ubs.items()}
    total_ub = float(sum(term_max.values()))
    champ = max(term_max, key=term_max.get)
    champ_contrib = contribs[champ]
    masks: dict = {t: None for t, _w, _r in hits}
    if champ_contrib.size < k:
        return masks  # not enough evidence to seed a sound threshold
    thresh = float(np.partition(champ_contrib,
                                champ_contrib.size - k)[champ_contrib.size - k])
    for t, _w, _rec in hits:
        ub = ubs[t]
        if not ub.size:
            continue
        bound = ub + (total_ub - term_max[t])
        keep_blocks = bound >= thresh
        if keep_blocks.all():
            continue
        n = contribs[t].size
        masks[t] = np.repeat(keep_blocks, BLOCK)[:n]
    return masks


def _allowed_docs(spark: SparkSession, paths: IndexPaths,
                  doc_filter: str) -> DataFrame:
    """(doc_id, range_id) of docs passing a SQL predicate over the docs
    table — the bool/filter context shared by every query type
    (opensearch_loader.py:386-408 builds term filters; 873-884 attaches
    them to ANY search, match and match_phrase alike). Grouped by range_id
    for the cogroup with the postings scan: each doc-range kernel sees only
    its own allowed ids, never a global id broadcast."""
    docs_scan = spark.read.parquet(paths.docs)
    if "range_id" in docs_scan.columns:
        # prepare-assigned ranges ride on the docs table
        return docs_scan.filter(doc_filter).select("doc_id", "range_id")
    # legacy fixed-width ranges
    st_row = spark.read.parquet(paths.stats).collect()[0]
    dpr = int(st_row["docs_per_range"])
    return (docs_scan.filter(doc_filter)
            .select("doc_id",
                    (F.col("doc_id") / F.lit(dpr)).cast("int")
                    .alias("range_id")))


def resolve_msm(spec: int | str, n_terms: int) -> int:
    """Resolve a ``minimum_should_match`` spec against a query's distinct
    analyzed-term count: an int is taken as-is (clamped to ≥1), a
    percentage string like ``"75%"`` floors (Lucene's rounding for
    positive percentages) over the distinct-term clause count."""
    if isinstance(spec, str):
        pct = float(spec.rstrip("%"))
        return max(1, int(n_terms * pct / 100.0))
    return max(1, int(spec))


def search(spark: SparkSession, index_dir: str, queries: list[tuple[int, str]],
           k: int = 10, prune: bool = True,
           doc_filter: str | None = None,
           filter_root: str | None = None,
           after: dict[int, tuple[float, int]] | None = None,
           minimum_should_match: int | str | None = None) -> DataFrame:
    """queries: [(query_id, text)] → DataFrame(query_id, rank, doc_id, score).

    ``after``: {query_id: (score, doc_id)} — search_after cursor
    pagination: return the top-k among docs sorting STRICTLY AFTER the
    cursor in (score desc, doc_id asc) order. Cursor values must be the
    engine's own previous-page last-row values (bit-identical f64).
    Forces ``prune=False`` (block-max thresholds assume the
    unconstrained top-k; the after-page lives below it). Queries without
    a cursor entry page from the top.

    ``doc_filter``: optional SQL predicate over the ``docs`` table columns
    (url, lang, ...) — the bool/filter context of the reference's search
    (opensearch_loader.py:873-884): restricts the candidate set without
    changing corpus-global BM25 statistics. Implemented as a cogrouped
    kernel so each doc-range only sees its own allowed doc_ids (no
    broadcast of a global id set — scale-safe).

    ``filter_root``: index root whose DOCS table resolves ``doc_filter``
    (default ``index_dir``). Field posting spaces project their docs down
    to (doc_id, text, range_id, dl), so metadata predicates must resolve
    against the ROOT index's docs — doc_ids and ranges are shared.

    ``minimum_should_match``: int or ``"N%"`` — a doc must match at least
    that many DISTINCT query terms (OpenSearch match-query semantics;
    percentage resolves per query by Lucene's positive-percentage floor).
    Forces ``prune=False`` when the resolved floor exceeds 1."""
    paths = IndexPaths(index_dir)
    stats = load_stats(spark, index_dir)
    if after:
        prune = False
        after = {int(q): (float(s), int(d)) for q, (s, d) in after.items()}

    q_terms = {qid: tokenize_text(text) for qid, text in queries}
    msm_spec = None
    if minimum_should_match is not None:
        # clause count = DISTINCT analyzed terms; terms absent from the
        # dictionary still count as clauses (Lucene builds the TermQuery
        # regardless — it just never matches), so resolve BEFORE the df
        # lookup. m > live-term count ⇒ the query legitimately matches
        # nothing.
        msm_spec = {qid: resolve_msm(minimum_should_match, len(set(toks)))
                    for qid, toks in q_terms.items()}
        if any(m > 1 for m in msm_spec.values()):
            prune = False  # block-max masks would undercount match tallies
    terms = sorted({t for toks in q_terms.values() for t in toks})
    if not terms:
        return spark.createDataFrame([], "query_id int, rank int, doc_id long, score double")
    # dictionary point-lookup with pushdown (Lucene term-dict seek analogue)
    dict_rows = lookup_dict_rows(spark, paths.dictionary, terms)
    dfs = {r["term"]: int(r["df"]) for r in dict_rows}
    idfs = {t: float(idf_fn(stats.N, np.array([dfs[t]]))[0])
            for t in terms if t in dfs}
    qinfo = _weighted_qinfo(q_terms, idfs)
    if not qinfo:
        return spark.createDataFrame([], "query_id int, rank int, doc_id long, score double")

    live_terms = sorted({t for ti in qinfo.values() for t in ti})
    buckets = sorted({bucket_of(t, stats.n_buckets) for t in live_terms})
    postings = _filter_in(                                    # row-group pruning
        spark.read.parquet(paths.postings)
        .filter(F.col("bucket").isin(buckets)),               # partition pruning
        "term", live_terms)
    if doc_filter is not None:
        fpaths = IndexPaths(filter_root) if filter_root else paths
        allowed = _allowed_docs(spark, fpaths, doc_filter)
        per_range = (postings.groupBy("range_id")
                     .cogroup(allowed.groupBy("range_id"))
                     .applyInPandas(
                         _score_kernel(qinfo, k, stats, prune, filtered=True,
                                       after_spec=after, msm_spec=msm_spec),
                         schema=RESULT_SCHEMA))
    else:
        kern = _score_kernel(qinfo, k, stats, prune, after_spec=after,
                             msm_spec=msm_spec)
        per_range = _python_scan_per_range(spark, paths, kern, buckets,
                                           live_terms)
        if per_range is None:
            per_range = (postings
                         .groupBy("range_id")
                         .applyInPandas(kern, schema=RESULT_SCHEMA))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    return (per_range
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score"))


# --------------------------------------------------------- phrase queries

_POS_SHIFT = np.uint64(24)  # doc_id<<24 | position keys: dl < 2^24 tokens,
#                             doc_id < 2^39 — both safe at 10^12-doc scale


def _phrase_kernel(qinfo: dict, k: int, stats: IndexStats,
                   filtered: bool = False, slop: int = 0):
    """Per-doc-range phrase scorer (match_phrase semantics,
    opensearch_loader.py:386-408 / Lucene PhraseQuery):
    tf = exact-phrase frequency, idf = Σ per-term idfs,
    score = idf · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)).

    ``slop > 0`` is the ``match_phrase`` slop option under an ORDERED
    WINDOW contract: an anchor position p₀ of the first term matches iff
    the remaining terms occur IN ORDER at positions
    p₀ < p₁ < … < pₙ₋₁ ≤ p₀ + (n−1) + slop; tf = count of matching
    anchors, each match weighing 1 (slop=0 degenerates to the exact
    contiguous phrase). This is deliberately simpler than Lucene's
    SloppyPhraseScorer (which admits reordering within an edit budget
    and weighs matches 1/(distance+1)) — the ordered-window form has a
    closed relational statement the SQL oracle reproduces exactly, and
    out-of-order matches at slop ≤ 2 are corner cases of repeated terms.
    The existence test per anchor is a greedy minimal-next-occurrence
    chain (greedy succeeds iff any in-order assignment exists).

    qinfo: {query_id: {"terms": [t0, t1, ...], "idf": float}}.

    With ``filtered=True`` the kernel cogroups with the allowed-doc frame
    (same contract as :func:`_score_kernel`): the metadata filter only
    restricts the candidate set, phrase statistics stay corpus-global. The
    restriction is applied to the matched docs AFTER position intersection
    — phrase candidates are already tiny, so a per-term pre-filter buys
    nothing and would complicate the position-key bookkeeping.
    """
    k1, b, avgdl = stats.k1, stats.b, stats.avgdl

    def score_cogroup(pdf: pd.DataFrame, allowed: pd.DataFrame) -> pd.DataFrame:
        return score_range(pdf, allowed["doc_id"].to_numpy(np.int64))

    def score_range(pdf: pd.DataFrame,
                    allowed_ids: np.ndarray | None = None) -> pd.DataFrame:
        by_term: dict[str, dict] = {}
        for rec in pdf.to_dict("records"):
            by_term[rec["term"]] = rec
        out_q, out_d, out_s = [], [], []
        for query_id, info in qinfo.items():
            terms = info["terms"]
            if not all(t in by_term for t in terms):
                continue
            decoded = {}
            for t in set(terms):
                rec = by_term[t]
                doc_ids, tfs, dls = decode_postings(rec)
                poss = decode_positions(rec["poss"], tfs)
                if doc_ids.size == 0:
                    keys = np.empty(0, dtype=np.uint64)
                else:
                    keys = ((np.repeat(doc_ids, tfs).astype(np.uint64)
                             << _POS_SHIFT) | poss.astype(np.uint64))
                decoded[t] = (doc_ids, tfs, dls, keys)
            # anchor: (doc, pos) pairs of the first term
            d0, t0f, dl0, keys0 = decoded[terms[0]]
            if slop == 0:
                cand = keys0
                for i, t in enumerate(terms[1:], start=1):
                    if cand.size == 0:
                        break
                    cand = cand[np.isin(cand + np.uint64(i), decoded[t][3])]
            else:
                # greedy chain: for each anchor, repeatedly take the
                # SMALLEST next-term occurrence after the previous one
                # (searchsorted over the sorted doc<<S|pos keys — the
                # codec emits doc_ids and per-doc positions ascending);
                # anchor survives iff the chain stays in-doc and within
                # the p0 + (n-1) + slop window
                pos_mask = (np.uint64(1) << _POS_SHIFT) - np.uint64(1)
                docs_a = keys0 >> _POS_SHIFT
                p0 = keys0 & pos_mask
                limit = p0 + np.uint64(len(terms) - 1 + slop)
                prev = p0.copy()
                alive = np.ones(keys0.size, dtype=bool)
                for t in terms[1:]:
                    if not alive.any():
                        break
                    keys_t = decoded[t][3]
                    lookup = (docs_a << _POS_SHIFT) | (prev + np.uint64(1))
                    idx = np.searchsorted(keys_t, lookup, side="left")
                    ok = idx < keys_t.size
                    found = keys_t[np.minimum(idx, keys_t.size - 1)]
                    fdoc = found >> _POS_SHIFT
                    fpos = found & pos_mask
                    alive &= ok & (fdoc == docs_a) & (fpos <= limit)
                    prev = np.where(alive, fpos, prev)
                cand = keys0[alive]
            if cand.size == 0:
                continue
            cand_docs = (cand >> _POS_SHIFT).astype(np.int64)
            uniq, pf = np.unique(cand_docs, return_counts=True)
            if allowed_ids is not None:
                keep = np.isin(uniq, allowed_ids)
                uniq, pf = uniq[keep], pf[keep]
                if uniq.size == 0:
                    continue
            # dl lookup from the anchor term's posting run
            dl_map = dl0[np.searchsorted(d0, uniq)]
            sc = info["idf"] * tf_norm(pf, dl_map, avgdl, k1, b)
            top = min(k, uniq.size)
            order = np.lexsort((uniq, -sc))[:top]
            out_q.extend([query_id] * top)
            out_d.extend(uniq[order].tolist())
            out_s.extend(sc[order].tolist())
        return pd.DataFrame({
            "query_id": pd.Series(out_q, dtype="int32"),
            "doc_id": pd.Series(out_d, dtype="int64"),
            "score": pd.Series(out_s, dtype="float64"),
        })

    def score_plain(pdf: pd.DataFrame) -> pd.DataFrame:
        return score_range(pdf)

    return score_cogroup if filtered else score_plain


def phrase_search(spark: SparkSession, index_dir: str,
                  queries: list[tuple[int, str]], k: int = 10,
                  doc_filter: str | None = None,
                  filter_root: str | None = None,
                  slop: int = 0) -> DataFrame:
    """Exact-phrase top-k (the match_phrase surface of the reference).

    ``slop``: the match_phrase slop option under the ordered-window
    contract documented on :func:`_phrase_kernel` (0 = exact phrase).

    Same physical shape as :func:`search`: dictionary point-lookup →
    bucket/term-pruned postings scan → per-range vectorized kernel →
    global top-k window.

    ``doc_filter``: optional SQL predicate over the docs table — the
    reference attaches the same bool/filter context to every query type
    including match_phrase (opensearch_loader.py:386-408, 873-884); the
    filter restricts candidates without changing corpus-global stats.
    """
    paths = IndexPaths(index_dir)
    stats = load_stats(spark, index_dir)
    q_terms = {qid: tokenize_text(text) for qid, text in queries}
    terms = sorted({t for toks in q_terms.values() for t in toks})
    empty = "query_id int, rank int, doc_id long, score double"
    if not terms:
        return spark.createDataFrame([], empty)
    dict_rows = lookup_dict_rows(spark, paths.dictionary, terms)
    dfs = {r["term"]: int(r["df"]) for r in dict_rows}
    qinfo = {}
    for qid, toks in q_terms.items():
        if toks and all(t in dfs for t in toks):
            s_idf = float(sum(
                idf_fn(stats.N, np.array([dfs[t]]))[0] for t in toks))
            qinfo[int(qid)] = {"terms": toks, "idf": s_idf}
    if not qinfo:
        return spark.createDataFrame([], empty)
    live_terms = sorted({t for i in qinfo.values() for t in i["terms"]})
    buckets = sorted({bucket_of(t, stats.n_buckets) for t in live_terms})
    postings = _filter_in(
        spark.read.parquet(paths.postings)
        .filter(F.col("bucket").isin(buckets)),
        "term", live_terms)
    if doc_filter is not None:
        fpaths = IndexPaths(filter_root) if filter_root else paths
        allowed = _allowed_docs(spark, fpaths, doc_filter)
        per_range = (postings.groupBy("range_id")
                     .cogroup(allowed.groupBy("range_id"))
                     .applyInPandas(
                         _phrase_kernel(qinfo, k, stats, filtered=True,
                                        slop=slop),
                         schema=RESULT_SCHEMA))
    else:
        kern = _phrase_kernel(qinfo, k, stats, slop=slop)
        per_range = _python_scan_per_range(spark, paths, kern, buckets,
                                           live_terms,
                                           need_positions=True)
        if per_range is None:
            per_range = (postings.groupBy("range_id")
                         .applyInPandas(kern, schema=RESULT_SCHEMA))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    return (per_range
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score"))


def explain_scores(spark: SparkSession, index_dir: str,
                   queries: list[tuple[int, str]], k: int = 10,
                   hits: DataFrame | None = None) -> DataFrame:
    """The ``explain=true`` surface: per-term BM25 contribution breakdown
    for each of the query's top-k hits —
    ``contribution = idf(t) · qcount(t) · tfnorm(tf, dl)`` with
    Σ contributions over terms == the hit's :func:`search` score (the
    invariant pytest pins bit-for-bit).

    Physical shape: :func:`search` produces the top-k (query, doc) pairs;
    only THOSE docs' text is re-analyzed (frozen Arrow tokenizer — tf
    identical to the postings by construction) via a join-pruned docs
    scan, then one explode + filter to the query's terms and a codegen
    formula. Cost is bounded by k·|queries| docs, never the corpus.

    ``hits``: optional (query_id, doc_id) frame naming the exact pairs
    to explain (the ``/_explain/{id}`` endpoint shape); default is the
    engine's own top-k.

    Returns DataFrame(query_id, doc_id, term, tf, contribution), ordered
    (query_id, doc_id, contribution desc, term).
    """
    from .analyzer import token_count_udf, with_tokens

    paths = IndexPaths(index_dir)
    stats = load_stats(spark, index_dir)
    q_terms = {int(qid): tokenize_text(text) for qid, text in queries}
    terms = sorted({t for ts in q_terms.values() for t in ts})
    out_schema = ("query_id int, doc_id long, term string, tf long, "
                  "contribution double")
    if not terms:
        return spark.createDataFrame([], out_schema)
    dict_rows = lookup_dict_rows(spark, paths.dictionary, terms)
    dfs = {r["term"]: int(r["df"]) for r in dict_rows}
    # per-(query, term) weight = idf · occurrence count (search semantics)
    from collections import Counter

    wrows = []
    for qid, ts in q_terms.items():
        for t, c in Counter(ts).items():
            if t in dfs:
                idf = float(idf_fn(stats.N, np.array([dfs[t]]))[0])
                wrows.append((qid, t, idf * c))
    if not wrows:
        return spark.createDataFrame([], out_schema)
    weights = spark.createDataFrame(
        sorted(wrows), "query_id int, term string, w double")

    if hits is None:
        hits = search(spark, index_dir, queries, k=k).select("query_id",
                                                             "doc_id")
    else:
        hits = hits.select("query_id", "doc_id")
    docs = spark.read.parquet(paths.docs).select("doc_id", "text")
    hit_docs = (hits.join(docs, "doc_id")
                .withColumn("dl", token_count_udf(F.col("text"))
                            .cast("double")))
    toks = (with_tokens(hit_docs)
            .select("query_id", "doc_id", "dl",
                    F.explode("tokens").alias("term")))
    tf = (toks.join(F.broadcast(weights), ["query_id", "term"])
          .groupBy("query_id", "doc_id", "term")
          .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"),
               F.first("w").alias("w")))
    k1, b, avgdl = stats.k1, stats.b, stats.avgdl
    contrib = (F.col("w") * F.col("tf") * (k1 + 1)
               / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)))
    return (tf.withColumn("contribution", contrib)
            .select("query_id", "doc_id", "term", "tf", "contribution")
            .orderBy("query_id", "doc_id",
                     F.col("contribution").desc(), "term"))


class Searcher:
    """Reusable query handle: caches stats + (optionally) the dictionary.

    ``search()``/``phrase_search()`` re-read the tiny stats/dictionary
    parquet on every call — correct, but two extra driver round-trips per
    query. A serving deployment keeps stats resident (one row). The
    dictionary default is the per-query pruned parquet point-lookup:
    at web scale |vocab| is billions of rows and collecting it to the
    driver would OOM. ``preload_dictionary=True`` is an explicit opt-in
    for small corpora / latency-critical serving on bounded vocabularies.
    """

    def __init__(self, spark: SparkSession, index_dir: str,
                 preload_dictionary: bool = False):
        self.spark = spark
        self.index_dir = index_dir
        self.paths = IndexPaths(index_dir)
        self.stats = load_stats(spark, index_dir)
        self._dfs: dict[str, int] | None = None
        if preload_dictionary:
            from .indexer import read_small_table

            pdf = read_small_table(spark, self.paths.dictionary)
            self._dfs = dict(zip(pdf["term"],
                                 pdf["df"].astype(int).tolist()))

    def _lookup_dfs(self, terms: list[str]) -> dict[str, int]:
        if self._dfs is not None:
            return {t: self._dfs[t] for t in terms if t in self._dfs}
        rows = lookup_dict_rows(self.spark, self.paths.dictionary, terms)
        return {r["term"]: int(r["df"]) for r in rows}

    def search(self, queries: list[tuple[int, str]], k: int = 10,
               prune: bool = True,
               doc_filter: str | None = None) -> DataFrame:
        stats = self.stats
        q_terms = {qid: tokenize_text(text) for qid, text in queries}
        terms = sorted({t for toks in q_terms.values() for t in toks})
        empty = "query_id int, rank int, doc_id long, score double"
        if not terms:
            return self.spark.createDataFrame([], empty)
        dfs = self._lookup_dfs(terms)
        idfs = {t: float(idf_fn(stats.N, np.array([dfs[t]]))[0])
                for t in terms if t in dfs}
        qinfo = _weighted_qinfo(q_terms, idfs)
        if not qinfo:
            return self.spark.createDataFrame([], empty)
        live_terms = sorted({t for ti in qinfo.values() for t in ti})
        buckets = sorted({bucket_of(t, stats.n_buckets) for t in live_terms})
        postings = _filter_in(
            self.spark.read.parquet(self.paths.postings)
            .filter(F.col("bucket").isin(buckets)),
            "term", live_terms)
        if doc_filter is not None:
            allowed = _allowed_docs(self.spark, self.paths, doc_filter)
            per_range = (postings.groupBy("range_id")
                         .cogroup(allowed.groupBy("range_id"))
                         .applyInPandas(
                             _score_kernel(qinfo, k, stats, prune,
                                           filtered=True),
                             schema=RESULT_SCHEMA))
        else:
            kern = _score_kernel(qinfo, k, stats, prune)
            per_range = _python_scan_per_range(self.spark, self.paths,
                                               kern, buckets, live_terms)
            if per_range is None:
                per_range = (postings.groupBy("range_id")
                             .applyInPandas(kern, schema=RESULT_SCHEMA))
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc())
        return (per_range
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "rank", "doc_id", "score"))

    def phrase_search(self, queries: list[tuple[int, str]], k: int = 10,
                      doc_filter: str | None = None) -> DataFrame:
        """match_phrase through the resident-stats handle (same engine as
        module-level :func:`phrase_search`, minus the per-call stats read;
        the dictionary lookup reuses the preloaded df map when present)."""
        stats = self.stats
        q_terms = {qid: tokenize_text(text) for qid, text in queries}
        terms = sorted({t for toks in q_terms.values() for t in toks})
        empty = "query_id int, rank int, doc_id long, score double"
        if not terms:
            return self.spark.createDataFrame([], empty)
        dfs = self._lookup_dfs(terms)
        qinfo = {}
        for qid, toks in q_terms.items():
            if toks and all(t in dfs for t in toks):
                s_idf = float(sum(
                    idf_fn(stats.N, np.array([dfs[t]]))[0] for t in toks))
                qinfo[int(qid)] = {"terms": toks, "idf": s_idf}
        if not qinfo:
            return self.spark.createDataFrame([], empty)
        live_terms = sorted({t for i in qinfo.values() for t in i["terms"]})
        buckets = sorted({bucket_of(t, stats.n_buckets) for t in live_terms})
        postings = _filter_in(
            self.spark.read.parquet(self.paths.postings)
            .filter(F.col("bucket").isin(buckets)),
            "term", live_terms)
        if doc_filter is not None:
            allowed = _allowed_docs(self.spark, self.paths, doc_filter)
            per_range = (postings.groupBy("range_id")
                         .cogroup(allowed.groupBy("range_id"))
                         .applyInPandas(
                             _phrase_kernel(qinfo, k, stats, filtered=True),
                             schema=RESULT_SCHEMA))
        else:
            per_range = (postings.groupBy("range_id")
                         .applyInPandas(_phrase_kernel(qinfo, k, stats),
                                        schema=RESULT_SCHEMA))
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc())
        return (per_range
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "rank", "doc_id", "score"))
