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
    points of (acc*m + cp) % P, computed in closed form as
    sum(cp_j * m^(L-1-j)) % P over the FLAT code-point array: per-char
    exponents index a tiny m-power table and per-string sums come from
    one add.reduceat — no (n_strings x max_len) dense matrix (the
    previous Horner sweep allocated ~60M-element scratch on corpus
    batches and was memory-bandwidth-bound, ~5x slower).  Every product
    cp * m^e stays < 2^51 and every per-string sum of (x % P) terms
    < 2^30 each fits int64, so the arithmetic is exact."""
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
    maxlen = int(lens.max())
    ends = np.cumsum(lens)
    starts = ends - lens
    # exponent of m for each flat char: len_i - 1 - offset_in_string
    exps = (np.repeat(lens, lens) - 1
            - (np.arange(total, dtype=np.int64) - np.repeat(starts, lens)))
    nz = lens > 0
    starts_nz = starts[nz]
    for k in range(len(m)):
        powt = np.empty(maxlen, dtype=np.int64)
        powt[0] = 1
        mk = int(m[k])
        for e in range(1, maxlen):
            powt[e] = (powt[e - 1] * mk) % HASH_P
        terms = (codes * powt[exps]) % HASH_P
        h[nz, k] = np.add.reduceat(terms, starts_nz) % HASH_P
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
        # non-strings (None, and the NaN pandas surfaces for a NULL
        # text column) carry no shingles — skip, don't crash the task
        g = word_shingles(text) if isinstance(text, str) else None
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
    # per-doc minima in one segmented reduce (every kept doc has >=1
    # shingle, so the reduceat segments are all non-empty); minimum.at
    # scatter is ~10x slower on corpus batches
    doc_starts = np.cumsum(counts) - counts
    mhs = np.minimum.reduceat(affine, doc_starts, axis=0)
    sig = np.zeros((len(keep), MINHASH_BANDS), dtype=np.int64)
    for bi in range(MINHASH_BANDS):
        s = np.zeros(len(keep), dtype=np.int64)
        for j in range(4):
            s = (s * 31 + mhs[:, bi * 4 + j]) % HASH_P
        sig[:, bi] = s
    return keep, sig
