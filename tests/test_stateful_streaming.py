"""Session windows + arbitrary stateful (applyInPandasWithState) operators,
including state survival across restarts via the streaming checkpoint."""

import math

import pandas as pd
import pytest

from sparkgraph.streaming import ewma_per_user, run_to_memory, sessionized_counts


def _write_events(path, rows):
    pd.DataFrame(
        {
            "ts": pd.to_datetime([r[0] for r in rows]),
            "user_id": [r[1] for r in rows],
            "value": [float(r[2]) for r in rows],
        }
    ).astype({"ts": "datetime64[us]"}).to_parquet(path)


SCHEMA = "ts timestamp, user_id long, value double"


def test_session_windows(spark, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    _write_events(
        d / "p1.parquet",
        [
            ("2024-01-01 00:00:00", 1, 1.0),
            ("2024-01-01 00:02:00", 1, 1.0),  # same session (gap 5m)
            ("2024-01-01 00:20:00", 1, 1.0),  # new session
            ("2024-01-01 00:00:30", 2, 1.0),
        ],
    )
    stream = spark.readStream.schema(SCHEMA).parquet(str(d))
    # session-window aggs don't allow update mode; complete keeps all sessions
    out = run_to_memory(sessionized_counts(stream), "sess_t", "complete")
    rows = {(r.user_id, str(r.session_start)): r.n_events for r in out.collect()}
    assert rows[(1, "2024-01-01 00:00:00")] == 2
    assert rows[(1, "2024-01-01 00:20:00")] == 1
    assert rows[(2, "2024-01-01 00:00:30")] == 1


def _ewma_oracle(values, alpha=0.3):
    e = None
    for v in values:
        e = v if e is None else alpha * v + (1 - alpha) * e
    return e


def test_ewma_stateful_and_resumes_across_restart(spark, tmp_path):
    d = tmp_path / "ev2"
    d.mkdir()
    ck = str(tmp_path / "ck")
    _write_events(
        d / "p1.parquet",
        [("2024-01-01 00:00:00", 7, 10.0), ("2024-01-01 00:01:00", 7, 20.0)],
    )

    def drain(name):
        stream = spark.readStream.schema(SCHEMA).parquet(str(d))
        got = {}

        def sink(batch_df, _batch_id):
            for r in batch_df.collect():
                got[r.user_id] = (r.n_events, r.ewma)

        # foreachBatch sink: supports checkpoint recovery (memory sink doesn't)
        q = (
            ewma_per_user(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return got

    got1 = drain("ewma_a")
    assert got1[7][0] == 2
    assert math.isclose(got1[7][1], _ewma_oracle([10.0, 20.0]), abs_tol=1e-9)

    # "restart": new files + same checkpoint — state must carry over
    _write_events(d / "p2.parquet", [("2024-01-01 00:02:00", 7, 30.0)])
    got2 = drain("ewma_b")
    assert got2[7][0] == 3
    assert math.isclose(
        got2[7][1], _ewma_oracle([10.0, 20.0, 30.0]), abs_tol=1e-9
    )


def test_streaming_signatures_match_batch(spark):
    """The stateless in-row signature must be bit-identical to the batch
    shingle-explode + groupBy construction."""
    from sparkgraph.text import minhash_signatures, shingles, streaming_signatures

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different content with other words here"),
            (4, "ab"),
        ],
        "doc_id long, text string",
    )
    batch = {r.id: list(r.sig) for r in minhash_signatures(shingles(docs)).collect()}
    stream_style = {r.id: list(r.sig) for r in streaming_signatures(docs).collect()}
    assert batch == stream_style


def test_streaming_neardup_detects_cross_batch_pairs(spark, tmp_path):
    """Near-dups arriving in DIFFERENT micro-batches are detected (bucket
    state persists across batches); results match the batch LSH estimate."""
    import pandas as pd

    from sparkgraph.streaming import run_to_memory
    from sparkgraph.text import minhash_lsh_pairs, streaming_neardup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    b1 = [(1, base), (3, "unrelated words about spark engines and graphs here")]
    b2 = [(2, base + " extra"), (4, "yet more totally unrelated material okay")]
    docs_dir = tmp_path / "docs_in"
    docs_dir.mkdir()
    pd.DataFrame(b1, columns=["doc_id", "text"]).to_parquet(docs_dir / "b1.parquet")
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(docs_dir))
    out1 = run_to_memory(
        streaming_neardup_pairs(stream), "nd_t1", "append"
    )
    assert out1.count() == 0  # no pair within batch 1

    pd.DataFrame(b2, columns=["doc_id", "text"]).to_parquet(docs_dir / "b2.parquet")
    # fresh query re-reads both files; two micro-batch files, state carries
    out2 = run_to_memory(
        streaming_neardup_pairs(stream), "nd_t2", "append"
    )
    got = {(r.a, r.b) for r in out2.collect()}
    assert got == {(1, 2)}
    # estimate agrees with the batch LSH path on the union corpus
    union = spark.createDataFrame(b1 + b2, "doc_id long, text string")
    want = {
        (r.a, r.b): r.est_jaccard for r in minhash_lsh_pairs(union).collect()
    }
    est = {r.est_jaccard for r in out2.collect()}
    assert set(want) == {(1, 2)} and est == {want[(1, 2)]}


def test_neardup_bucket_update_batched_append():
    """The bucket state transition must (a) match a brute-force pairwise
    oracle, and (b) append the whole batch with exactly ONE vstack — the
    r3 version copied the full bucket matrix per arriving doc."""
    import numpy as np

    from sparkgraph import text as text_mod
    from sparkgraph.text import _neardup_bucket_update

    rng = np.random.RandomState(7)
    nh = 32
    stored = rng.randint(0, 50, size=(40, nh)).astype(np.int64)
    stored_ids = list(range(1000, 1040))
    batch = [(2000 + i, rng.randint(0, 50, size=nh).astype(np.int64)) for i in range(25)]
    batch.append((1005, stored[5].copy()))        # replayed stored doc
    batch.append((2100, batch[3][1].copy()))      # intra-batch near-dup
    thr = 0.5

    calls = {"n": 0}
    real_vstack = np.vstack

    def counting_vstack(*a, **k):
        calls["n"] += 1
        return real_vstack(*a, **k)

    np.vstack = counting_vstack
    try:
        ids, mat, aa, bb, ee = _neardup_bucket_update(
            list(stored_ids), stored, batch, nh, thr, 10_000
        )
    finally:
        np.vstack = real_vstack
    assert calls["n"] == 1  # one append for the whole batch

    # brute-force oracle: replay sequentially against the growing member set
    o_ids = list(stored_ids)
    o_mat = [r for r in stored]
    want = []
    for d, v in batch:
        for oid, w in zip(o_ids, o_mat):
            est = float((w == v).sum()) / nh
            if est >= thr:
                a, b = sorted((oid, d))
                want.append((a, b, round(est, 6)))
        if d not in o_ids:
            o_ids.append(d)
            o_mat.append(v)
    assert list(zip(aa, bb, ee)) == want
    assert ids == o_ids
    assert mat.shape == (len(o_ids), nh)
    assert (mat == np.asarray(o_mat)).all()
