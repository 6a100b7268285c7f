"""Skew-safety tests for the dedup family: a hot shingle planted in
every document (stopword-like) and a giant near-dup cluster must NOT
blow up the candidate-pair join quadratically — plus positive checks
that genuine near-dups still surface, and parity checks for the
portable-hash implementations vs their oracle arithmetic."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as m


@pytest.fixture(scope="module")
def spark():
    from fin_ocr_sdk_spark.session import get_spark
    s = get_spark("pytest-dedup", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _write_docs(path: str, texts: list[str]) -> str:
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": [f"d{i:04d}" for i in range(len(texts))],
        "text": texts,
    }), os.path.join(path, "documents.parquet"))
    return path


def test_jaccard_hot_shingle_capped(spark, tmp_path_factory):
    """One shingle in all 100 docs would emit 4950 join rows; the
    document-frequency cap drops it, leaving only the one genuine pair
    that shares 3 rare shingles."""
    hot = "the quick fox"
    texts = [f"{hot} filler{i} x{i} y{i} z{i} w{i}" for i in range(98)]
    texts += [f"{hot} alpha beta gamma delta unique{i}" for i in (0, 1)]
    d = _write_docs(str(tmp_path_factory.mktemp("jac")), texts)
    rows = m.q_ngram_jaccard_pairs(spark, d).collect()
    # the genuine pair shares 'quick fox alpha', 'fox alpha beta',
    # 'alpha beta gamma', 'beta gamma delta' (the hot 'the quick fox'
    # is capped away; 'gamma delta uniqueN' differs) -> 4 shared
    assert len(rows) == 1
    assert (rows[0].doc_a, rows[0].doc_b) == ("d0098", "d0099")
    assert rows[0].shared_ngrams == 4


def test_minhash_giant_cluster_capped(spark, tmp_path_factory):
    """60 identical docs (> bucket cap 50) must produce no pairs from
    their saturated band buckets, while a separate 3-doc cluster still
    pairs."""
    big = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 3
    small = "completely different tiny cluster of near duplicate text here"
    texts = [big] * 60 + [small] * 3
    d = _write_docs(str(tmp_path_factory.mktemp("mh")), texts)
    pairs = {(r.doc_a, r.doc_b)
             for r in m.q_minhash_dedup(spark, d).collect()}
    assert pairs == {("d0060", "d0061"), ("d0060", "d0062"),
                     ("d0061", "d0062")}


def test_simhash_matches_reference_arithmetic(spark, tmp_path_factory):
    """The pandas-UDF 64-bit simhash equals a direct scalar-python
    evaluation of the documented formula (and near-dup texts land near
    each other in Hamming space)."""
    P = m._HASH_P

    def poly(s, mult):
        h = 0
        for ch in s:
            h = (h * mult + ord(ch)) % P
        return h

    def simhash_ref(text):
        votes = [0] * 64
        for t in set(text.strip().lower().split()):
            hs = [poly(t, mu) for mu in m._SIMHASH_MULTS]
            for i in range(64):
                votes[i] += 1 if (hs[i // 16] >> (i % 16)) & 1 else -1
        val = sum(1 << i for i in range(63) if votes[i] > 0)
        return val - (1 << 63) if votes[63] > 0 else val

    texts = ["the quick brown fox jumps over the lazy dog",
             "the quick brown fox jumps over the lazy cat",
             "entirely unrelated content about spark partitions"]
    d = _write_docs(str(tmp_path_factory.mktemp("sh")), texts)
    got = {r.doc_id: r.simhash64 for r in m.q_simhash(spark, d).collect()}
    want = {f"d{i:04d}": simhash_ref(t) for i, t in enumerate(texts)}
    assert got == want
    ham = bin((got["d0000"] ^ got["d0001"]) & ((1 << 64) - 1)).count("1")
    ham_far = bin((got["d0000"] ^ got["d0002"]) & ((1 << 64) - 1)).count("1")
    assert ham < ham_far


def test_ann_lsh_buckets_deterministic(spark, tmp_path_factory):
    """Integer-quantized hyperplane LSH: same vector → same bucket, and
    the bucket equals the documented integer formula."""
    rng = np.random.default_rng(21)
    vecs = rng.normal(size=(20, 16)).astype(np.float32)
    vecs[1] = vecs[0]
    d = str(tmp_path_factory.mktemp("lsh"))
    pq.write_table(pa.table({
        "vec_id": pa.array(range(20), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    }), os.path.join(d, "embeddings.parquet"))
    got = {r.vec_id: r.bucket
           for r in m.q_ann_lsh_buckets(spark, d).collect()}
    assert got[0] == got[1]
    w = np.floor(vecs.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
    i = np.arange(16)[:, None]
    b = np.arange(8)[None, :]
    s = np.where(((i * 2654435761 + b * 40503) % 97) < 48, 1, -1)
    buckets = (((w @ s) > 0) * (1 << np.arange(8))).sum(axis=1)
    assert got == {k: int(v) for k, v in enumerate(buckets)}


def _write_vecs(path: str, vecs: np.ndarray) -> str:
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    }), os.path.join(path, "embeddings.parquet"))
    return path


def test_embedding_giant_cluster_capped(spark, tmp_path_factory):
    """One giant cluster of identical vectors (> _EMB_BUCKET_CAP) lands
    in one (band, bucket) cell per band; the cap must drop those cells
    before pairing, so candidate pairs stay bounded — while a separate
    small cluster of near-identical vectors still pairs."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=16).astype(np.float32)
    other = rng.normal(size=16).astype(np.float32)
    n_big = m._EMB_BUCKET_CAP + 10
    vecs = np.vstack([np.tile(base, (n_big, 1)),
                      np.tile(other, (3, 1))
                      + rng.normal(scale=1e-4, size=(3, 16))
                      .astype(np.float32)])
    d = _write_vecs(str(tmp_path_factory.mktemp("embcap")), vecs)
    pairs = {(r.vec_a, r.vec_b)
             for r in m.q_embedding_near_dup(spark, d).collect()}
    small_ids = {n_big, n_big + 1, n_big + 2}
    # the 60-vector cluster would contribute C(60,2)=1770 pairs; the
    # cap erases all of them (its cells exceed the cap in BOTH bands)
    assert pairs == {(a, b) for a in small_ids for b in small_ids if a < b}


def test_embedding_near_dup_banding_recall(spark, tmp_path_factory):
    """Two near-identical vectors must be candidates if ANY band
    agrees, and the confirmed cosine_e4 must equal the documented
    integer formula."""
    rng = np.random.default_rng(11)
    a = rng.normal(size=16).astype(np.float32)
    vecs = np.vstack([a, a + rng.normal(scale=1e-5, size=16)
                      .astype(np.float32),
                      rng.normal(size=(5, 16)).astype(np.float32)])
    d = _write_vecs(str(tmp_path_factory.mktemp("embrec")), vecs)
    rows = {(r.vec_a, r.vec_b): r.cosine_e4
            for r in m.q_embedding_near_dup(spark, d).collect()}
    assert (0, 1) in rows
    w = np.floor(vecs.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
    num = float((w[0] * w[1]).sum())
    den = (np.sqrt(float((w[0] * w[0]).sum()))
           * np.sqrt(float((w[1] * w[1]).sum())))
    assert rows[(0, 1)] == int(np.floor(num / den * 10000 + 0.5))


def test_streaming_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState exact-dedup across micro-batches: state
    carries between batches within a run AND across runs through the
    checkpoint; only first occurrences are emitted."""
    from fin_ocr_sdk_spark.streaming.dedup import run_dedup_drain

    ingest = tmp_path / "ingest"
    ingest.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_part(name, rows):
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": [r[1] for r in rows],
        }), str(ingest / name))

    write_part("part-000.parquet", [(1, "alpha"), (2, "beta"),
                                    (3, "alpha")])
    write_part("part-001.parquet", [(4, "beta"), (5, "gamma")])
    rows = run_dedup_drain(spark, str(ingest), ckpt,
                           max_files_per_trigger=1)
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 5]

    # resume: a new file with one dup and one new text; the checkpoint
    # restores state so 'alpha' stays suppressed
    write_part("part-002.parquet", [(6, "alpha"), (7, "delta")])
    rows2 = run_dedup_drain(spark, str(ingest), ckpt,
                            max_files_per_trigger=1)
    assert sorted(r["doc_id"] for r in rows2) == [7]


def test_boilerplate_strip_semantics(spark):
    """Main-content extraction: template header/footer/nav spans (>=50%
    document frequency) are stripped, unique prose survives with a
    dense renumbering."""
    out = m.q_boilerplate_strip(spark, "").toPandas()
    texts = set(out["text"])
    assert "ACME CORP INVESTOR RELATIONS HOME NEWS CONTACT" not in texts
    assert not any("all rights reserved" in t for t in texts)
    assert not any("subscribe to our newsletter" in t for t in texts)
    assert len(out) > 0
    one = out[out.doc_id == "web-00000"].sort_values("order")
    assert list(one["order"]) == list(range(len(one)))
