"""Round-3 regression tests: ADVICE fixes + scale-refinement parameters.

- rel_qts must not corrupt qt values above 2^53 when a touched rel has a
  NULL qt (pandas float64 promotion bug, ADVICE r02 high).
- multi-block SimHash banding (m_blocks > max_hamming+1) must produce the
  exact same pair set as the classic layout / brute force (pigeonhole
  recall 1).
- MinHash k parameterization: wider signatures extend (not perturb) the
  k=4 prefix; candidate sets grow monotonically when bands scale with k.
- connected_components reliable checkpoint mode.
- asof_join reserved internal names raise; LSH dim guard raises.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtree_rust_spark.operators import calcqts as CQ
from osmquadtree_rust_spark.operators import dedup as D


BIG_QT = (3 << 61) + 1  # level-1 cell value using bit 62 — int(float()) corrupts it
assert int(float(BIG_QT)) != BIG_QT  # the test is vacuous if this ever fails


def _rels(spark, rows):
    return spark.createDataFrame(
        rows,
        "id long, members array<struct<role:string,mem_type:int,mem_ref:long>>",
    )


def test_rel_qts_preserves_high_bit_qt_with_null_sibling(spark):
    # rel 1: node member with a qt above 2^53
    # rel 2: references rel 1 (rel->rel edge -> driver fixed-point path)
    # rel 3: node member whose qt is invalid (-1) -> base qt NULL
    # rel 4: references rel 3 -> rel 3 lands in the toPandas harvest too,
    #        which used to promote the whole qt column to float64
    rels = _rels(
        spark,
        [
            (1, [("", 0, 100)]),
            (2, [("", 2, 1)]),
            (3, [("", 0, 200)]),
            (4, [("", 2, 3)]),
        ],
    )
    nqts = spark.createDataFrame(
        [(100, BIG_QT), (200, -1)], "id long, qt long"
    )
    wqts = spark.createDataFrame([], "id long, qt long")
    out = {r.id: r.qt for r in CQ.rel_qts(rels, nqts, wqts).collect()}
    assert out[1] == BIG_QT  # exact — float64 round-trip would change it
    assert out[2] == BIG_QT  # propagated over the rel->rel edge, exact
    assert out[3] == 0  # NULL qt finalizes to 0
    assert out[4] == 0  # missing parent contributes 0 on pass 5


def _random_sigs(spark, n=220, seed=7):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 2**63, n).astype(np.uint64)
    # plant near-dup runs: every 10th signature = previous with <=3 flipped bits
    for i in range(1, n, 10):
        flips = rng.choice(64, rng.randint(0, 4), replace=False)
        v = base[i - 1]
        for f in flips:
            v ^= np.uint64(1) << np.uint64(f)
        base[i] = v
    sig = base.astype(np.int64)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "simhash": sig})
    )
    return df, sig


def _brute_pairs(sig, max_hamming):
    n = len(sig)
    x = sig.astype(np.uint64)
    out = set()
    for i in range(n):
        d = x[i] ^ x[i + 1 :]
        ham = np.array([bin(int(v)).count("1") for v in d])
        for j in np.nonzero(ham <= max_hamming)[0]:
            out.add((i, int(i + 1 + j)))
    return out


@pytest.mark.parametrize("m_blocks,max_hamming", [(6, 3), (5, 2), (None, 3)])
def test_simhash_multiblock_banding_recall_one(spark, m_blocks, max_hamming):
    df, sig = _random_sigs(spark)
    got = {
        (r.a, r.b)
        for r in D.simhash_neardup_pairs(
            df, max_hamming=max_hamming, m_blocks=m_blocks
        ).collect()
    }
    assert got == _brute_pairs(sig, max_hamming)


def test_simhash_multiblock_key_width(spark):
    # (m=6, h=3): 20 combo keys, each ~32 bits — the 10^12-doc layout
    keys = D._band_keys(6, 3)
    assert len(keys) == 20 and all(len(k) == 3 for k in keys)
    with pytest.raises(ValueError):
        D._band_keys(3, 3)


def _docs(spark, n=120, seed=5):
    rng = np.random.RandomState(seed)
    words = [f"w{j}" for j in range(40)]
    rows = []
    for i in range(n):
        k = rng.randint(5, 20)
        text = " ".join(words[j] for j in rng.choice(40, k))
        rows.append((i, text))
        if i % 7 == 0:  # planted near-duplicate
            rows.append((n + i, text + " extra"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_k_extends_prefix_and_candidates_grow(spark):
    docs = _docs(spark)
    s4 = D.minhash_signatures(docs, k=4)
    s8 = D.minhash_signatures(docs, k=8)
    assert [c for c in s8.columns if c.startswith("mh")] == [
        f"mh{i}" for i in range(8)
    ]
    j4 = {r.doc_id: (r.mh0, r.mh1, r.mh2, r.mh3) for r in s4.collect()}
    j8 = {r.doc_id: (r.mh0, r.mh1, r.mh2, r.mh3) for r in s8.collect()}
    assert j4 == j8  # wider k extends, never perturbs, the shared prefix
    c4 = {
        (r.a, r.b) for r in D.minhash_lsh_candidates(s4, bands=2).collect()
    }
    c8 = {
        (r.a, r.b) for r in D.minhash_lsh_candidates(s8, bands=4).collect()
    }
    # same rows-per-band, more bands -> candidate recall grows monotonically
    assert c4 <= c8
    with pytest.raises(ValueError):
        D.minhash_lsh_candidates(s4, bands=3)


def test_connected_components_reliable_mode(spark, tmp_path):
    verts = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "a long, b long"
    )
    exp = {
        r.doc_id: r.comp
        for r in D.connected_components(verts, pairs).collect()
    }
    out = D.connected_components(
        verts, pairs, reliable=True, checkpoint_dir=str(tmp_path / "ckpt")
    )
    got = {r.doc_id: r.comp for r in out.collect()}
    assert got == exp == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 6, 7: 7}
    # dead generations (edges + superseded labels) are cleaned as the loop
    # advances; only the final labels parquet backs the returned frame
    import os

    gens = sorted(os.listdir(tmp_path / "ckpt"))
    assert len(gens) == 1, gens
    assert {r.doc_id: r.comp for r in out.collect()} == exp  # still readable


def test_asof_join_rejects_reserved_columns(spark):
    from osmquadtree_rust_spark.operators.temporal import asof_join

    ev = spark.createDataFrame([(1, 10, 0)], "id long, ts long, __is_evt int")
    up = spark.createDataFrame([(1, 5, 2.0)], "id long, ts long, px double")
    with pytest.raises(ValueError, match="__is_evt"):
        asof_join(ev, up)


def test_lsh_dim_guard_raises(spark):
    from osmquadtree_rust_spark.operators import similarity as SIM

    df = spark.createDataFrame(
        [(1, [0.1] * 8), (2, [0.2] * 8)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="embedding shorter"):
        SIM.cosine_neardup_pairs(df, dim=16).collect()
    # matching dim still works
    assert SIM.cosine_neardup_pairs(df, dim=8).count() >= 0


def _asof_data(spark, n_ev=4000, n_upd=800, hot_frac=0.5, seed=11):
    rng = np.random.RandomState(seed)
    n_keys = 40
    ev_keys = rng.randint(0, n_keys, n_ev)
    ev_keys[: int(n_ev * hot_frac)] = 7  # hot key
    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": ev_keys.astype(np.int64),
                "ts": rng.randint(0, 500000, n_ev).astype(np.int64),
                "evp": rng.randint(0, 1000, n_ev).astype(np.int64),
            }
        )
    )
    up_keys = rng.randint(0, n_keys, n_upd)
    up_ts = rng.randint(0, 500000, n_upd).astype(np.int64)
    updf = pd.DataFrame(
        {"id": up_keys.astype(np.int64), "ts": up_ts, "px": rng.rand(n_upd)}
    ).drop_duplicates(["id", "ts"])
    return ev, spark.createDataFrame(updf)


def test_asof_bucketed_matches_plain(spark):
    from osmquadtree_rust_spark.operators.temporal import asof_join, asof_join_bucketed

    ev, up = _asof_data(spark)
    plain = {
        (r.id, r.ts, r.evp): r.px
        for r in asof_join(ev, up).collect()
    }
    for bucket in (1000, 77777):
        got = {
            (r.id, r.ts, r.evp): r.px
            for r in asof_join_bucketed(ev, up, bucket=bucket).collect()
        }
        assert got == plain, f"bucket={bucket}"


def test_asof_bucketed_partitions_on_bucket(spark):
    from osmquadtree_rust_spark.operators.temporal import asof_join_bucketed

    ev, up = _asof_data(spark)
    out = asof_join_bucketed(ev, up, bucket=1000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the hot-path window must partition on (key, bucket), never key alone:
    # every Window node's partition spec that mentions id must mention __bkt
    import re

    win_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    keyed = [s for s in win_specs if "id" in s]
    assert keyed, plan[:2000]
    assert all("__bkt" in s for s in keyed), keyed


def test_replication_sequence_catchup(spark, tmp_path):
    from osmquadtree_rust_spark.streaming import ingest as I

    remote = str(tmp_path / "remote")
    state = str(tmp_path / "state.txt")
    for seq in range(1, 6):
        spark.createDataFrame([(seq, seq * 10)], "id long, v long").write.parquet(
            f"{remote}/{seq:09d}.parquet"
        )
        I.write_state(f"{remote}/{seq:09d}.state.txt", seq, timestamp=seq * 1000)
    I.write_state(state, 2, timestamp=2000)  # already applied 1..2

    seen: list[tuple[int, int]] = []
    crashed = {"done": False}

    def on_batch(df, seq):
        if seq == 5 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("simulated crash mid-catch-up")
        seen.append((seq, df.count()))

    with pytest.raises(RuntimeError):
        I.catch_up(spark, remote, state, on_batch)
    # crash at 5: state advanced through 4, strictly in order
    assert [s for s, _ in seen] == [3, 4]
    assert I.read_state(state) == {"sequence": 4, "timestamp": 4000}
    # resume applies exactly the missed tail
    seen.clear()
    applied = I.catch_up(spark, remote, state, on_batch)
    assert applied == [5] and I.read_state(state)["sequence"] == 5
    assert I.pending_sequences(state, remote) == []


def test_kmeans_quantized_recovers_blobs(spark):
    from osmquadtree_rust_spark.operators import similarity as SIM

    rng = np.random.RandomState(17)
    centers = rng.rand(4, 16) * 10
    vecs, gold = [], []
    for i in range(400):
        g = i % 4
        vecs.append((centers[g] + rng.rand(16) * 0.1).astype(np.float32))
        gold.append(g)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(400)],
        "vec_id long, embedding array<float>",
    )
    out, cents = SIM.kmeans_quantized(df, k=4, iters=4)
    got = {r.vec_id: r.cluster for r in out.collect()}
    # every gold blob must map to exactly one k-means cluster (pure blobs)
    for g in range(4):
        labels = {got[i] for i in range(400) if gold[i] == g}
        assert len(labels) == 1, f"blob {g} split across {labels}"
    # distinct blobs -> distinct clusters
    assert len({next(iter({got[i] for i in range(400) if gold[i] == g})) for g in range(4)}) == 4
    # deterministic end-to-end (no RNG anywhere)
    out2, cents2 = SIM.kmeans_quantized(df, k=4, iters=4)
    assert cents == cents2
    assert {r.vec_id: r.cluster for r in out2.collect()} == got


def test_replication_gap_stops_catchup(spark, tmp_path):
    from osmquadtree_rust_spark.streaming import ingest as I

    remote = str(tmp_path / "remote")
    state = str(tmp_path / "state.txt")
    for seq in (3, 4, 6, 7):  # 5 is missing: catch-up must stop before it
        spark.createDataFrame([(seq,)], "id long").write.parquet(
            f"{remote}/{seq:09d}.parquet"
        )
    I.write_state(state, 2)
    assert I.pending_sequences(state, remote) == [3, 4]  # stops at the gap
    applied = I.catch_up(spark, remote, state, lambda df, seq: None)
    assert applied == [3, 4] and I.read_state(state)["sequence"] == 4
    # once 5 lands, the tail becomes applicable
    spark.createDataFrame([(5,)], "id long").write.parquet(
        f"{remote}/{5:09d}.parquet"
    )
    assert I.pending_sequences(state, remote) == [5, 6, 7]
    # fresh state (no local file): start from the smallest available
    state2 = str(tmp_path / "state2.txt")
    assert I.pending_sequences(state2, remote)[0] == 3


def test_quantize_int8_roundtrip_bound(spark):
    from osmquadtree_rust_spark.operators import similarity as SIM

    rng = np.random.RandomState(23)
    vecs = (rng.rand(100, 16) * 4 - 2).astype(np.float32)
    vecs[0] = 0.0  # zero vector edge
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in SIM.quantize_int8(df).collect()}
    for i in range(100):
        r = out[i]
        scale = r.scale_ppm / 1e6
        if i == 0:
            assert r.scale_ppm == 0 and all(v == 0 for v in r.q)
            continue
        assert all(-127 <= v <= 127 for v in r.q)
        # FLOOR quantization: dequant error < one step (scale/127) + ppm slack
        for d in range(16):
            err = abs(float(vecs[i][d]) - r.q[d] * scale / 127.0)
            assert err <= scale / 127.0 + 1e-4, (i, d, err, scale)


def test_int8_neardup_finds_planted_pairs(spark):
    from osmquadtree_rust_spark.operators import similarity as SIM

    rng = np.random.RandomState(29)
    base = (rng.rand(60, 64) * 2 - 1).astype(np.float32)
    rows = []
    for i in range(60):
        rows.append((i, [float(x) for x in base[i]]))
        rows.append((1000 + i, [float(x) * 1.01 + 0.001 for x in base[i]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = SIM.quantize_int8(df).select("vec_id", "q")
    pairs = {
        (r.a, r.b)
        for r in SIM.cosine_neardup_pairs_int8(q, threshold_ppm=950000).collect()
    }
    planted = {(i, 1000 + i) for i in range(60)}
    found = pairs & planted
    # sign-LSH banding recall < 1 by design; the scaled copies are nearly
    # parallel so most planted pairs must surface and verify
    assert len(found) >= 50, len(found)
    # every reported pair must genuinely pass the integer predicate
    qmap = {r.vec_id: np.array(r.q, dtype=np.int64) for r in q.collect()}
    for a, b in pairs:
        d = int(np.dot(qmap[a], qmap[b]))
        na = int(np.dot(qmap[a], qmap[a]))
        nb = int(np.dot(qmap[b], qmap[b]))
        assert d > 0 and d * d * 1000000 >= 950000 * na * nb


def test_repetition_ratio_planted(spark):
    from osmquadtree_rust_spark.operators import text as TX

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),   # 7 trigrams, 3 distinct
            (2, "w1 w2 w3 w4 w5"),      # all distinct
            (3, "x y"),                 # shorter than n
            (4, ""),                    # empty
            (5, "t  t  t  t"),          # double spaces filtered
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_ngrams, r.rep_ppm) for r in
           TX.with_repetition_ratio(docs, n=3).collect()}
    assert out[1] == (7, int((1 - 3 / 7) * 1e6))
    assert out[2] == (3, 0)
    assert out[3] == (0, 0)
    assert out[4] == (0, 0)
    assert out[5] == (2, 500000)  # "t t t" twice, 1 distinct of 2


def test_ngram_neardup_planted_and_cap(spark):
    # 0/1: near-dups (one word changed of 12 -> 3-gram jaccard well over
    # 0.5); 2: unrelated; every doc shares the same 6-word footer, whose
    # shingles have df = n_docs and must be dropped by df_cap=2 — without
    # the cap doc 2 would pair with everyone through the footer alone.
    body0 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    body1 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 zz"
    body2 = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12"
    footer = " f1 f2 f3 f4 f5 f6"
    docs = spark.createDataFrame(
        [(i, b + footer) for i, b in enumerate((body0, body1, body2))],
        "doc_id long, text string",
    )
    rows = D.ngram_neardup_pairs(docs, n=3, threshold_ppm=500000, df_cap=2).collect()
    assert len(rows) == 1
    r = rows[0]
    # capped space: bodies only (footer df=3 > 2; the 2 bridge shingles
    # spanning body->footer are unique per doc and stay).  10 body
    # trigrams each + 2 bridge = 12; intersection = 9 shared body
    # trigrams; union = 15 -> jaccard 0.6
    assert (r.a, r.b) == (0, 1)
    assert r.jaccard_ppm == int(9 / 15 * 1e6)
    # without a cap the footer bridges everything: doc 2 now shares the 4
    # footer-only trigrams (df=3) with both others; jaccard 4/24 < 0.5
    # so the threshold still drops it, but 0-1 remains
    rows2 = D.ngram_neardup_pairs(docs, n=3, threshold_ppm=500000).collect()
    assert {(r.a, r.b) for r in rows2} == {(0, 1)}


def test_ngram_neardup_validations(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        D.ngram_shingles(docs, n=0)
    with pytest.raises(ValueError):
        D.ngram_neardup_pairs(docs, df_cap=0)


def test_multimodal_neardup_policies(spark):
    from osmquadtree_rust_spark.operators import multimodal as MM

    cap_a = "the quick brown fox jumps over the lazy dog today"
    cap_b = "the quick brown fox jumps over the lazy dog tonight"  # near
    cap_c = "completely different caption about something else entirely here"
    rows = [
        # 1-2: images near (hamming 2) AND captions near
        (1, 0x123456789AB, cap_a),
        (2, 0x123456789AB ^ 0x11, cap_b),
        # 3: image near 1 (hamming 1), caption unrelated
        (3, 0x123456789AB ^ 0x4, cap_c),
        # 4: caption near 1, image far (28 bits)
        (4, 0x123456789AB ^ 0x0FFFFFFF, cap_b),
    ]
    df = spark.createDataFrame(rows, "image_id long, phash long, caption string")

    both = {(r.a, r.b) for r in MM.multimodal_neardup_pairs(df, policy="both").collect()}
    assert both == {(1, 2)}

    any_rows = {
        (r.a, r.b): (r.hamming, r.jaccard_ppm)
        for r in MM.multimodal_neardup_pairs(df, policy="any").collect()
    }
    # image-only pairs carry NULL jaccard, caption-only carry NULL hamming
    assert set(any_rows) == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)}
    assert any_rows[(1, 3)][1] is None and any_rows[(1, 3)][0] == 1
    assert any_rows[(1, 4)][0] is None and any_rows[(1, 4)][1] is not None
    assert None not in any_rows[(1, 2)]

    with pytest.raises(ValueError):
        MM.multimodal_neardup_pairs(df, policy="either")


def test_ngram_neardup_matches_bruteforce(spark):
    """Randomized corpus (seeded), several (n, df_cap, threshold) combos:
    the shared-shingle candidate join + integer threshold + pinned-order
    FLOOR must equal a pure-Python brute force exactly — including the
    capped-space semantics."""
    import math

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> hot shingles
    rows = []
    for i in range(60):
        k = rng.randint(3, 12)
        rows.append((i, " ".join(vocab[j] for j in rng.randint(0, 12, k))))
    for i in range(0, 60, 4):  # near-dup copies with one word swapped
        ws = rows[i][1].split()
        ws[rng.randint(0, len(ws))] = "zz"
        rows.append((1000 + i, " ".join(ws)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def brute(n, cap, thr):
        sets = {}
        for i, t in rows:
            ws = [w for w in t.split(" ") if w]
            sets[i] = {" ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)}
        if cap is not None:
            dfreq = {}
            for s in sets.values():
                for sh in s:
                    dfreq[sh] = dfreq.get(sh, 0) + 1
            sets = {i: {sh for sh in s if dfreq[sh] <= cap} for i, s in sets.items()}
        out = {}
        ids = sorted(sets)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                inter = len(sets[a] & sets[b])
                union = len(sets[a]) + len(sets[b]) - inter
                if union > 0 and inter * 1000000 >= thr * union:
                    out[(a, b)] = math.floor(inter / union * 1000000.0)
        return out

    for n, cap, thr in [(2, None, 500000), (3, 3, 500000), (2, 2, 300000)]:
        got = {
            (r.a, r.b): r.jaccard_ppm
            for r in D.ngram_neardup_pairs(
                df, n=n, threshold_ppm=thr, df_cap=cap
            ).collect()
        }
        assert got == brute(n, cap, thr), (n, cap, thr)


def test_normalize_text_cross_engine(spark):
    """The regex-free normalization must agree with DuckDB byte-for-byte
    on whitespace runs, case, punctuation, quotes, backslashes, empties."""
    import duckdb

    from osmquadtree_rust_spark.functions import text_sql as TS
    from osmquadtree_rust_spark.operators import text as TX

    cases = [
        "  Hello,   WORLD!! (it's\t a\n\n test) -- ok/maybe  ",
        "", "   ", "a", "A.B.C", "x\\y'z", "already clean text",
        "....", "a" + " " * 40 + "b",  # long space run: 3-pass collapse
        "foo\x01\x02 bar", "\x01\x02", "a\x01b\x02c",  # marker bytes
    ]
    # 100 seeded random ASCII strings over the full printable+control mix
    rng = np.random.RandomState(21)
    pool = [chr(c) for c in range(1, 127)]
    for _ in range(100):
        k = rng.randint(0, 40)
        cases.append("".join(pool[i] for i in rng.randint(0, len(pool), k)))
    df = spark.createDataFrame(list(enumerate(cases)), "i long, text string")
    got = {r.i: r.norm_text for r in TX.with_normalized_text(df).collect()}
    expr = TS.normalize_text_sql("t")
    con = duckdb.connect()
    want = {
        i: con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [c]).fetchone()[0]
        for i, c in enumerate(cases)
    }
    assert got == want
    assert got[0] == "hello world it s a test ok maybe"
    assert got[8] == "a b"


def test_sample_by_hash_properties(spark):
    """Deterministic, nested (larger rate is a superset), composable
    across salts, and empty/full at the rate extremes."""
    from osmquadtree_rust_spark.operators import text as TX

    df = spark.range(0, 4000).select(F.col("id").alias("doc_id"))

    def ids(rate, salt="sample-v1"):
        return {
            r.doc_id
            for r in TX.sample_by_hash(df, rate_ppm=rate, salt=salt).collect()
        }

    s10, s25, s50 = ids(100000), ids(250000), ids(500000)
    assert s10 < s25 < s50          # nested supersets
    assert ids(250000) == s25       # deterministic across reruns
    assert ids(0) == set() and len(ids(1000000)) == 4000
    # rates land near expectation (binomial, wide tolerance)
    assert 320 <= len(s10) <= 480 and 1800 <= len(s50) <= 2200
    # a different salt re-rolls: overlap of two 50% samples ~ 25%
    other = ids(500000, salt="sample-v2")
    assert 800 <= len(s50 & other) <= 1200
    with pytest.raises(ValueError):
        TX.sample_by_hash(df, rate_ppm=2000000)


def test_review_fixes_r3(spark, tmp_path):
    """Round-3 review fixes: incremental window may not cross a squash
    base; pruned replication gap raises instead of posing as caught-up;
    hostile \\x01\\x02 input cannot corrupt normalize collapse; bucketed
    temporal ops reject non-positive buckets."""
    from osmquadtree_rust_spark.operators import temporal as TMP
    from osmquadtree_rust_spark.operators import text as TX
    from osmquadtree_rust_spark.plans import checkpoint as CK
    from osmquadtree_rust_spark.streaming import ingest as I

    # --- incremental read refuses windows crossing a squashed base
    base = str(tmp_path / "store")
    s0 = spark.range(0, 10).select(
        F.col("id"), F.lit(0).cast("long").alias("changetype"),
        (F.col("id") % 2).alias("tile"),
    )
    CK.write_tiles_checkpointed(s0, base, "s0", n_batches=2)
    CK.append_filelist(base, "s0", 100, "base")
    CK.write_tiles_checkpointed(s0.limit(4), base, "s1", n_batches=2)
    CK.append_filelist(base, "s1", 150, "change")
    CK.squash_snapshots(spark, base, 150, "sq0", n_batches=2)
    with pytest.raises(ValueError, match="squash"):
        CK.read_changes_between(spark, base, 100, 150)

    # --- pruned replication gap raises; caught-up still returns []
    remote = str(tmp_path / "remote")
    state = str(tmp_path / "state.txt")
    for seq in (100, 101):
        spark.createDataFrame([(seq,)], "id long").write.parquet(
            f"{remote}/{seq:09d}.parquet"
        )
    I.write_state(state, 10)
    with pytest.raises(ValueError, match="replication gap"):
        I.pending_sequences(state, remote)
    I.write_state(state, 101)  # fully applied -> genuinely caught up
    assert I.pending_sequences(state, remote) == []

    # --- \x01\x02 in input folds to whitespace, never merges words
    df = spark.createDataFrame([("foo\x01\x02 bar",), ("foo bar",)], "text string")
    got = [r.norm_text for r in TX.with_normalized_text(df).collect()]
    assert got == ["foo bar", "foo bar"]

    # --- non-positive buckets rejected
    ev = spark.createDataFrame([(1, 5)], "k long, ets long")
    up = spark.createDataFrame([(1, 3, 1.0)], "k long, ets long, price double")
    with pytest.raises(ValueError, match="bucket"):
        TMP.asof_join_bucketed(ev, up, key="k", ts="ets", bucket=0)
    iv = spark.createDataFrame([(1, 0, 10)], "iv_id long, start long, end long")
    with pytest.raises(ValueError, match="bucket_seconds"):
        TMP.bucketed_range_join(ev, iv, ts="ets", bucket_seconds=0)


def test_qt_rollup_pyramid_consistency(spark):
    """Parent count == sum of children across adjacent levels; total per
    level == row count; validations reject bad depths."""
    from osmquadtree_rust_spark.functions import qt_spark as QS
    from osmquadtree_rust_spark.operators import count as CNT

    rng = np.random.RandomState(3)
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": np.arange(3000, dtype=np.int64),
                "lon": rng.randint(-1_700_000_000, 1_700_000_000, 3000).astype(np.int64),
                "lat": rng.randint(-800_000_000, 800_000_000, 3000).astype(np.int64),
            }
        )
    )
    cells = QS.with_point_qt(pts, "lon", "lat")
    out = CNT.qt_rollup(cells, depths=(3, 6, 12)).collect()
    by_depth = {}
    for r in out:
        by_depth.setdefault(r.depth, {})[r.cell] = r.cnt
    assert all(sum(v.values()) == 3000 for v in by_depth.values())
    # every depth-6 cell's ancestor at depth 3 accumulates its count
    from osmquadtree_rust_spark.functions import qt_numpy as QN

    roll = {}
    for cell, cnt in by_depth[6].items():
        anc = int(QN.qt_round(np.int64(cell), 3))
        roll[anc] = roll.get(anc, 0) + cnt
    assert roll == by_depth[3]
    with pytest.raises(ValueError):
        CNT.qt_rollup(cells, depths=())
    with pytest.raises(ValueError):
        CNT.qt_rollup(cells, depths=(4, 4))
    with pytest.raises(ValueError):
        CNT.qt_rollup(cells, depths=(19,))


def test_geohash_neighbors_wrap_pole_and_recall(spark):
    """Antimeridian wrap, pole-row truncation, self-exclusion, and the
    proximity-recall property (nearby points share cell or neighbor)."""
    from osmquadtree_rust_spark.functions import geohash as GH
    from osmquadtree_rust_spark.operators.spatial_join import geohash_neighbors

    chars = 4
    pts = spark.createDataFrame(
        [
            (1, 1799999999, 0),        # just west of the antimeridian
            (2, -1800000000, 0),       # just east of it (wrapped)
            (3, 0, 899999999),         # top latitude row
            (4, 0, 0),
            (5, 1000, 1000),           # same cell as 4 at chars=4
        ],
        "id long, lon long, lat long",
    )
    rows = geohash_neighbors(pts, chars=chars).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, set()).add(r.neighbor)
    cells = {
        r.id: int(GH.geohash_int_np(np.array([r.lon]), np.array([r.lat]), chars)[0])
        for r in pts.collect()
    }
    # top-row point loses its 3 northern neighbors
    assert len(by_id[3]) == 5 and all(len(by_id[i]) == 8 for i in (1, 2, 4, 5))
    # a cell is never its own neighbor
    assert all(cells[i] not in by_id[i] for i in by_id)
    # antimeridian: the wrapped points are mutual neighbors
    assert cells[2] in by_id[1] and cells[1] in by_id[2]
    # proximity recall: co-located points share a cell (trivially) and
    # each neighbor set contains the other's cell only if cells differ
    assert cells[4] == cells[5]


def test_geohash_radius_join_matches_bruteforce(spark):
    """Random dense points + an antimeridian straddling pair: the
    neighbor-candidate join must equal brute force exactly; oversized
    radius raises (recall would silently break)."""
    from osmquadtree_rust_spark.operators.spatial_join import geohash_radius_join

    rng = np.random.RandomState(9)
    n = 300
    lons = rng.randint(0, 10_000_000, n).astype(np.int64)
    lats = rng.randint(0, 10_000_000, n).astype(np.int64)
    # straddle the antimeridian: two points 2000 fixed units apart
    lons[0], lats[0] = 1_799_999_500, 5_000_000
    lons[1], lats[1] = -1_799_998_500, 5_000_000
    pts = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n, dtype=np.int64), "lon": lons, "lat": lats})
    )
    d = 40000
    got = {
        (r.a, r.b): r.dist_sq
        for r in geohash_radius_join(pts, d, chars=6).collect()
    }
    exp = {}
    for i in range(n):
        for j in range(i + 1, n):
            dl = abs(int(lons[i]) - int(lons[j]))
            wl = min(dl, 3600000000 - dl)
            da = abs(int(lats[i]) - int(lats[j]))
            ds = wl * wl + da * da
            if ds <= d * d:
                exp[(i, j)] = ds
    assert got == exp
    assert (0, 1) in got and got[(0, 1)] == 2000 * 2000  # wrapped pair found
    with pytest.raises(ValueError, match="cell span"):
        geohash_radius_join(pts, 10_000_000, chars=6)


def test_bbox_intersection_join_bruteforce_and_guard(spark):
    """Grid-covering + reference-point dedup equals brute force exactly
    (each pair once); oversized coverings raise instead of losing
    recall."""
    from osmquadtree_rust_spark.operators.spatial_join import bbox_intersection_join

    rng = np.random.RandomState(13)
    n = 200
    mnx = rng.randint(0, 9_000_000, n).astype(np.int64)
    mny = rng.randint(0, 9_000_000, n).astype(np.int64)
    w = rng.randint(1000, 300_000, n).astype(np.int64)
    h = rng.randint(1000, 300_000, n).astype(np.int64)
    pts = spark.createDataFrame(
        pd.DataFrame(
            {"id": np.arange(n, dtype=np.int64), "minlon": mnx, "minlat": mny,
             "maxlon": mnx + w, "maxlat": mny + h}
        )
    )
    got = sorted(
        (r.a, r.b, r.ix_area) for r in bbox_intersection_join(pts, chars=6).collect()
    )
    exp = []
    for i in range(n):
        for j in range(i + 1, n):
            if (mnx[i] <= mnx[j] + w[j] and mnx[j] <= mnx[i] + w[i]
                    and mny[i] <= mny[j] + h[j] and mny[j] <= mny[i] + h[i]):
                a = (min(mnx[i] + w[i], mnx[j] + w[j]) - max(mnx[i], mnx[j])) * (
                    min(mny[i] + h[i], mny[j] + h[j]) - max(mny[i], mny[j])
                )
                exp.append((i, j, int(a)))
    assert got == sorted(exp)
    # a 2-degree-wide box spans >64 chars-6 cells -> hard error
    big = spark.createDataFrame(
        [(0, 0, 0, 20_000_000, 1000), (1, 0, 0, 1000, 1000)],
        "id long, minlon long, minlat long, maxlon long, maxlat long",
    )
    with pytest.raises(Exception, match="covering exceeds"):
        bbox_intersection_join(big, chars=6).collect()
