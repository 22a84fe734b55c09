"""Posting-list block codec: delta + LEB128 varint, block-max metadata.

Replaces the Lucene postings formats that sat invisibly behind the
reference's bulk indexing (reference: opensearch_loader.py:372-384). All
encode/decode paths are numpy-vectorized: the loops below iterate over
*byte positions* (≤10) or *blocks*, never over individual postings.

Layout per (term, doc-range-partition) row:
    doc_ids : varint(delta(doc_ids))        — doc_ids sorted ascending;
              first delta is vs ``first_doc_id`` stored in the row
    tfs     : varint(tf - 1)                — term frequencies ≥ 1
    dls     : varint(dl)                    — per-posting doc length (token
              count), inlined Lucene-norms-style so BM25 scoring needs no
              doc_stats join at query time
    block_maxes : float32[ceil(n/BLOCK)]    — per 128-posting block, max of
              tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) at build-time avgdl;
              multiplied by idf at query time this upper-bounds every score
              contribution in the block (block-max pruning, BMW family)
"""

from __future__ import annotations

import numpy as np

from . import BM25_B, BM25_K1

BLOCK = 128


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative integer array (vectorized over byte slots)."""
    a = np.asarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
    nb = np.ones(a.shape, dtype=np.int64)
    v = a >> np.uint64(7)
    while v.any():
        nb += (v > 0).astype(np.int64)
        v >>= np.uint64(7)
    starts = np.cumsum(nb) - nb
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    v = a.copy()
    for k in range(int(nb.max())):
        mask = nb > k
        idx = starts[mask] + k
        byte = (v[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[mask] > k + 1).astype(np.uint8) << 7
        out[idx] = byte | cont
        v >>= np.uint64(7)
    return out.tobytes()


def decode_varint(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_start = np.empty(b.shape, dtype=bool)
    is_start[0] = True
    is_start[1:] = (b[:-1] & 0x80) == 0  # new value starts after a terminator byte
    val_idx = np.cumsum(is_start) - 1
    start_pos = np.flatnonzero(is_start)
    pos_in_val = np.arange(b.size) - start_pos[val_idx]
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos_in_val.astype(np.uint64)
    )
    out = np.zeros(start_pos.size, dtype=np.uint64)
    np.bitwise_or.at(out, val_idx, contrib)
    return out


def tf_norm(tfs: np.ndarray, dls: np.ndarray, avgdl: float,
            k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    """BM25 per-posting factor (everything except idf):
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))."""
    tfs = tfs.astype(np.float64)
    dls = dls.astype(np.float64)
    return tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))


def block_maxes(tfs: np.ndarray, dls: np.ndarray, avgdl: float) -> np.ndarray:
    """Per-BLOCK max of :func:`tf_norm` — the block-max metadata."""
    norms = tf_norm(tfs, dls, avgdl)
    n = norms.size
    nblocks = (n + BLOCK - 1) // BLOCK
    padded = np.full(nblocks * BLOCK, -np.inf)
    padded[:n] = norms
    maxes = padded.reshape(nblocks, BLOCK).max(axis=1)
    f32 = maxes.astype(np.float32)
    # float32 cast rounds to nearest — nudge any rounded-down value up so the
    # stored max stays a true upper bound (pruning soundness invariant)
    return np.where(f32.astype(np.float64) < maxes,
                    np.nextafter(f32, np.float32(np.inf)), f32).astype(np.float32)


def encode_positions(positions: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode flat per-posting term positions (sorted within each doc).

    ``positions`` holds the concatenated position lists of every posting in
    doc order; ``tfs`` gives the per-doc counts. Within-doc delta encoding
    with an absolute value at each doc boundary, then varint — vectorized
    (boundary reset via index assignment, no per-doc loop).
    """
    positions = np.asarray(positions, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    if positions.size == 0:
        return b""
    deltas = positions.copy()
    deltas[1:] -= positions[:-1]
    starts = np.cumsum(tfs) - tfs  # first flat index of each doc's run
    deltas[starts] = positions[starts]  # absolute at each doc boundary
    return encode_varint(deltas)


def decode_positions(buf: bytes, tfs: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_positions`: flat absolute positions."""
    deltas = decode_varint(buf).astype(np.int64)
    if deltas.size == 0:
        return deltas
    tfs = np.asarray(tfs, dtype=np.int64)
    starts = np.cumsum(tfs) - tfs
    # segment-local cumsum: global cumsum minus the carried-over prefix
    csum = np.cumsum(deltas)
    carry = np.zeros_like(deltas)
    carry[starts[1:]] = csum[starts[1:] - 1]
    return csum - np.maximum.accumulate(carry)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                    avgdl: float, positions: np.ndarray | None = None) -> dict:
    """Encode one (term, partition) posting run. ``doc_ids`` must be sorted;
    ``positions`` (optional) is the flat per-doc position array for the
    positional (match_phrase) index."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    first = int(doc_ids[0]) if doc_ids.size else 0
    deltas = np.empty_like(doc_ids)
    if doc_ids.size:
        deltas[0] = 0
        np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    bm = block_maxes(tfs, dls, avgdl)
    return {
        "first_doc_id": first,
        "n": int(doc_ids.size),
        "doc_ids": encode_varint(deltas),
        "tfs": encode_varint(tfs - 1),
        "dls": encode_varint(dls),
        "poss": (encode_positions(positions, tfs)
                 if positions is not None else b""),
        "block_maxes": bm.tobytes(),
        "max_tf_norm": float(bm.max()) if bm.size else 0.0,
        "cf": int(tfs.sum()),
    }


def decode_postings(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a posting row (mapping or pandas row) → (doc_ids, tfs, dls)."""
    deltas = decode_varint(row["doc_ids"]).astype(np.int64)
    doc_ids = np.cumsum(deltas) + row["first_doc_id"]
    tfs = decode_varint(row["tfs"]).astype(np.int64) + 1
    dls = decode_varint(row["dls"]).astype(np.int64)
    return doc_ids, tfs, dls


def decode_block_maxes(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.float32)
