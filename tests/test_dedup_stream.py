"""Streaming incremental near-dup gate vs a plain-Python oracle.

The oracle replays the documented admission policy exactly — including
the LSH band prune (same md5 base hash + affine permutation family +
band hashes as operators/dedup.py), so an LSH false negative is a
false negative in BOTH engines and the comparison is bit-honest."""

from __future__ import annotations

import hashlib
import math

import pytest

from ftw_crawler_spark.operators import dedup
from ftw_crawler_spark.streaming.dedup_stream import DedupStream

TAU = 0.6


# -- plain-Python mirror of the sketch stack --------------------------------

def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _shingle_hashes(text: str) -> set:
    toks = text.split()
    w = dedup.P_SHINGLE_WIDTH
    shs = {" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)}
    return {_md5_long(s) for s in shs}


def _bands(text: str, n_perm: int, bands: int) -> set:
    toks = text.split()
    w = dedup.P_SHINGLE_WIDTH
    shs = {" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)}
    if not shs:
        return set()
    consts = dedup._minhash_consts(n_perm)
    xs = [_md5_long(s) & dedup.MINHASH_MASK for s in shs]
    sig = [min((a * x + b) % dedup.MINHASH_P for x in xs)
           for a, b in consts]
    r = n_perm // bands
    out = set()
    for bi in range(bands):
        key = ":".join(str(v) for v in sig[bi * r:(bi + 1) * r])
        out.add((bi, hashlib.md5(key.encode()).hexdigest()))
    return out


def _jaccard_ok(ta: str, tb: str) -> bool:
    a, b = _shingle_hashes(ta), _shingle_hashes(tb)
    if not a or not b:
        return False
    shared = len(a & b)
    if shared == 0:
        return False
    j = shared / (len(a) + len(b) - shared)
    # mirror F.round (half-up), not Python's banker's rounding
    return math.floor(j * 10_000 + 0.5) / 10_000 >= TAU


def _oracle(chunks, n_perm, bands):
    """Sequential replay of the admission policy; returns admitted ids."""
    admitted = {}           # id -> text
    hashes = set()          # admitted content hashes
    band_index = {}         # (band_idx, band_hash) -> set[old id]
    for chunk in chunks:
        # 1. exact in-batch: min id per content hash
        byh = {}
        for i, t in sorted(chunk):
            byh.setdefault(hashlib.md5(t.encode()).hexdigest(), (i, t))
        docs = sorted(byh.values())
        # 2. exact vs store
        docs = [(i, t) for i, t in docs
                if hashlib.md5(t.encode()).hexdigest() not in hashes]
        # 3. near vs store: band-collided old docs only, Jaccard verify
        survivors = []
        for i, t in docs:
            collided = set()
            for bk in _bands(t, n_perm, bands):
                collided |= band_index.get(bk, set())
            if any(_jaccard_ok(t, admitted[o]) for o in collided):
                continue
            survivors.append((i, t))
        # 4. near in-batch: Jaccard pairs -> components -> min id kept
        parent = {i: i for i, _ in survivors}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for ai in range(len(survivors)):
            for bi in range(ai + 1, len(survivors)):
                (ia, ta), (ib, tb) = survivors[ai], survivors[bi]
                if _jaccard_ok(ta, tb):
                    ra, rb = find(ia), find(ib)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        kept = [(i, t) for i, t in survivors if find(i) == i]
        # 5. fold into state
        for i, t in kept:
            admitted[i] = t
            hashes.add(hashlib.md5(t.encode()).hexdigest())
            for bk in _bands(t, n_perm, bands):
                band_index.setdefault(bk, set()).add(i)
    return set(admitted)


# -- corpus: exact dups, near dups (in/cross batch), chains, distinct -------

def _mk(words):
    return " ".join(words)


BASE = [f"w{i}" for i in range(30)]
CHUNKS = [
    # batch 0
    [(1, _mk(BASE)),
     (2, _mk(BASE)),                          # exact dup of 1 (in-batch)
     (3, _mk(BASE[:28] + ["x1", "x2"])),      # near dup of 1 (in-batch)
     (4, _mk([f"a{i}" for i in range(30)])),  # distinct
     (5, "tiny doc")],                        # < shingle width: no sketch
    # batch 1
    [(6, _mk(BASE)),                          # exact dup of 1 (cross)
     (7, _mk(BASE[:27] + ["y1", "y2", "y3"])),  # near dup of 1 (cross)
     (8, _mk([f"b{i}" for i in range(30)])),  # distinct
     (9, "tiny doc")],                        # exact dup of 5 (cross)
    # batch 2: chain A~B~C within one batch (CC keeps only the min)
    [(10, _mk([f"c{i}" for i in range(24)] + ["p1"] * 6)),
     (11, _mk([f"c{i}" for i in range(24)] + ["p1"] * 3 + ["p2"] * 3)),
     (12, _mk([f"c{i}" for i in range(24)] + ["p2"] * 6))],
]


@pytest.fixture(scope="module")
def stream_state(spark, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("dedup_state"))
    ds = DedupStream(spark, state, tau=TAU)
    for bid, chunk in enumerate(CHUNKS):
        batch = spark.createDataFrame(chunk, "doc_id long, text string")
        ds._process_batch(batch, bid)
    return ds


def test_stream_matches_python_oracle(stream_state):
    got = {r["doc_id"] for r in stream_state.admitted().collect()}
    want = _oracle(CHUNKS, stream_state.n_perm, stream_state.bands)
    assert got == want
    # sanity on the scenario itself: exact dups dropped (in-batch and
    # cross-batch), in-batch near dups resolved to the min id, the
    # batch-2 chain collapsed to one survivor, no-sketch docs admitted
    # once, distincts admitted
    assert {1, 4, 5, 8, 10}.issubset(got)
    assert {2, 3, 6, 9, 11, 12}.isdisjoint(got)


def test_replayed_batch_is_idempotent(stream_state):
    before = sorted(
        map(tuple, stream_state.admitted().collect()))
    spark = stream_state.spark
    batch = spark.createDataFrame(CHUNKS[1], "doc_id long, text string")
    stream_state._process_batch(batch, 1)   # crash-replay of batch 1
    after = sorted(map(tuple, stream_state.admitted().collect()))
    assert after == before


def test_real_stream_plumbing(spark, tmp_path_factory):
    """True readStream runs (file source), one wave per chunk so the
    batch order is pinned — matching the Python oracle's replay."""
    delta = str(tmp_path_factory.mktemp("dedup_deltas"))
    state = str(tmp_path_factory.mktemp("dedup_state2"))
    ds = DedupStream(spark, state, tau=TAU)
    for chunk in CHUNKS[:2]:
        (spark.createDataFrame(chunk, "doc_id long, text string")
         .coalesce(1).write.mode("append").parquet(delta))
        ds.run_available(delta)
    got = {r["doc_id"] for r in ds.admitted().collect()}
    assert got == _oracle(CHUNKS[:2], ds.n_perm, ds.bands)


def test_single_drain_matches_two(spark, tmp_path_factory):
    """One availableNow drain over BOTH waves (maxFilesPerTrigger=1,
    mtimes pinned so the file source's modification-time ordering is
    deterministic) must produce the same two ordered micro-batches —
    and therefore the same admission set — as draining wave-by-wave.
    This is the shape the stream_dedup_curation registry query runs
    (one streaming-query startup instead of two)."""
    import os

    delta = str(tmp_path_factory.mktemp("dedup_deltas_1d"))
    state = str(tmp_path_factory.mktemp("dedup_state_1d"))
    ds = DedupStream(spark, state, tau=TAU)

    def parts():
        return {os.path.join(delta, f) for f in os.listdir(delta)
                if f.endswith(".parquet")}

    (spark.createDataFrame(CHUNKS[0], "doc_id long, text string")
     .coalesce(1).write.mode("append").parquet(delta))
    wave0 = parts()
    (spark.createDataFrame(CHUNKS[1], "doc_id long, text string")
     .coalesce(1).write.mode("append").parquet(delta))
    t0 = 1_700_000_000
    for p in wave0:
        os.utime(p, (t0, t0))
    for p in parts() - wave0:
        os.utime(p, (t0 + 60, t0 + 60))
    ds.run_available(delta)
    got = {r["doc_id"] for r in ds.admitted().collect()}
    assert got == _oracle(CHUNKS[:2], ds.n_perm, ds.bands)


def test_compaction_preserves_admission(spark, tmp_path_factory):
    """compact_every=2 over the 3-chunk scenario folds mid-stream; the
    admitted set, the state contents, and a subsequent batch's
    admission decisions must equal the uncompacted run's."""
    import os

    state_a = str(tmp_path_factory.mktemp("dedup_nc"))
    state_b = str(tmp_path_factory.mktemp("dedup_c"))
    a = DedupStream(spark, state_a, tau=TAU)            # never folds
    b = DedupStream(spark, state_b, tau=TAU, compact_every=2)
    extra = [(20, _mk(BASE)),                # exact dup of 1 (cross)
             (21, _mk([f"d{i}" for i in range(30)]))]   # distinct
    for bid, chunk in enumerate(CHUNKS + [extra]):
        batch = spark.createDataFrame(chunk, "doc_id long, text string")
        a._process_batch(batch, bid)
        b._process_batch(batch, bid)
    rows_a = sorted(map(tuple, a.admitted().collect()))
    rows_b = sorted(map(tuple, b.admitted().collect()))
    assert rows_a == rows_b
    # the fold actually happened: a compacted segment exists and the
    # folded deltas are gone
    names = os.listdir(b.admitted_dir)
    assert any(d.startswith("c") for d in names)
    assert sum(d.startswith("b") for d in names) < len(CHUNKS) + 1


def test_replay_after_fold_reads_compacted_state(spark,
                                                 tmp_path_factory):
    """Crash-replay of the batch whose _process_batch performed the
    fold: the replayed batch must read the compacted segment exactly
    as it read the deltas it replaced (before=B excludes b{B} but
    includes c{B})."""
    state = str(tmp_path_factory.mktemp("dedup_replay_fold"))
    ds = DedupStream(spark, state, tau=TAU, compact_every=2)
    for bid, chunk in enumerate(CHUNKS):
        batch = spark.createDataFrame(chunk, "doc_id long, text string")
        ds._process_batch(batch, bid)
    before = sorted(map(tuple, ds.admitted().collect()))
    # batch 2 triggered the fold (2 deltas pending at its start);
    # replay it — idempotence must hold across the fold boundary
    batch = spark.createDataFrame(CHUNKS[2], "doc_id long, text string")
    ds._process_batch(batch, 2)
    after = sorted(map(tuple, ds.admitted().collect()))
    assert after == before


def test_interrupted_sweep_is_invisible(spark, tmp_path_factory):
    """A fold that renamed its segment but crashed before deleting the
    superseded deltas: the reader must ignore deltas below the segment
    boundary (no double counting), and the next fold sweeps them."""
    import os
    import shutil

    state = str(tmp_path_factory.mktemp("dedup_sweepcrash"))
    ds = DedupStream(spark, state, tau=TAU, compact_every=2)
    b0 = spark.createDataFrame(CHUNKS[0], "doc_id long, text string")
    b1 = spark.createDataFrame(CHUNKS[1], "doc_id long, text string")
    ds._process_batch(b0, 0)
    ds._process_batch(b1, 1)
    # simulate: fold at boundary 2 completed the rename for every root
    # but the sweep never ran (superseded deltas left behind)
    for root, schema in ds._roots:
        folded = ds._read_state(root, schema, before=2)
        tmp = os.path.join(root, "_tmp_c000000002")
        folded.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, os.path.join(root, "c000000002"))
        # deltas b0/b1 intentionally NOT deleted
    want = _oracle(CHUNKS[:2], ds.n_perm, ds.bands)
    got = {r["doc_id"] for r in ds.admitted().collect()}
    assert got == want                      # no double counting
    b2 = spark.createDataFrame(CHUNKS[2], "doc_id long, text string")
    ds._process_batch(b2, 2)               # runs fine on mixed state
    got = {r["doc_id"] for r in ds.admitted().collect()}
    assert got == _oracle(CHUNKS, ds.n_perm, ds.bands)
