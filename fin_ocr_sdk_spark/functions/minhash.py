"""Portable MinHash/LSH band signatures — shared by the batch dedup
query (``__spark_entry__.q_minhash_dedup``) and the streaming near-dup
operator (``streaming/neardup.py``), so both paths flag the same
near-duplicate pairs and the DuckDB oracle arithmetic stays the single
source of truth.

All hashes are polynomial folds over code points mod a prime — plain
integer arithmetic computable identically in SQL (the oracle twins in
``__spark_entry__``) and vectorized here in NumPy (one Horner pass over
character positions; no per-string python loop).
"""

from __future__ import annotations

import numpy as np

HASH_P = 1_000_000_007
SIMHASH_MULTS = (31, 131, 257, 8191)   # 4 x 16 bits = 64 simhash bits
MINHASH_N = 16
MINHASH_A = tuple(52 + 11 * i for i in range(MINHASH_N))
MINHASH_B = tuple(3 + 17 * i for i in range(MINHASH_N))
MINHASH_BANDS = 4                      # 4 bands x 4 rows

_A_VEC = np.array(MINHASH_A, dtype=np.int64)
_B_VEC = np.array(MINHASH_B, dtype=np.int64)


def poly_hashes(strs: list, mults) -> np.ndarray:
    """(len(strs), len(mults)) int64 matrix of h_m(s) = fold over code
    points of (acc*m + cp) % P — one vectorized Horner pass over char
    positions."""
    n = len(strs)
    m = np.asarray(mults, dtype=np.int64)
    h = np.zeros((n, len(m)), dtype=np.int64)
    if n == 0:
        return h
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return h
    codes = np.frombuffer("".join(strs).encode("utf-32-le"),
                          dtype=np.uint32).astype(np.int64)
    mat = np.zeros((n, int(lens.max())), dtype=np.int64)
    row = np.repeat(np.arange(n), lens)
    col = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    mat[row, col] = codes
    for j in range(mat.shape[1]):
        live = lens > j
        h[live] = (h[live] * m + mat[live, j, None]) % HASH_P
    return h


def word_shingles(text: str) -> set:
    toks = text.strip().lower().split()
    return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}


def band_signatures(texts: list) -> "tuple[list[int], np.ndarray]":
    """All 16 minhashes per text in one vectorized pass (tokenize →
    shingle → base hash → 16 affine transforms → min), folded into
    MINHASH_BANDS band signatures of 4 rows each.

    Returns (keep, sigs): `keep` indexes the texts that produced at
    least one 3-token shingle (shorter texts emit nothing, matching the
    SQL twin's empty GROUP BY), `sigs` is (len(keep), MINHASH_BANDS)
    int64."""
    keep: list[int] = []
    grams_per_doc: list[list] = []
    for i, text in enumerate(texts):
        g = word_shingles(text) if text is not None else None
        if g:
            keep.append(i)
            grams_per_doc.append(sorted(g))
    if not keep:
        return [], np.zeros((0, MINHASH_BANDS), dtype=np.int64)
    counts = np.fromiter((len(g) for g in grams_per_doc),
                         dtype=np.int64, count=len(grams_per_doc))
    flat = [s for g in grams_per_doc for s in g]
    base = poly_hashes(flat, (31,))[:, 0]               # (G,)
    affine = (base[:, None] * _A_VEC + _B_VEC) % HASH_P  # (G, 16)
    mhs = np.full((len(keep), MINHASH_N), HASH_P, dtype=np.int64)
    np.minimum.at(mhs, np.repeat(np.arange(len(keep)), counts), affine)
    sig = np.zeros((len(keep), MINHASH_BANDS), dtype=np.int64)
    for bi in range(MINHASH_BANDS):
        s = np.zeros(len(keep), dtype=np.int64)
        for j in range(4):
            s = (s * 31 + mhs[:, bi * 4 + j]) % HASH_P
        sig[:, bi] = s
    return keep, sig
