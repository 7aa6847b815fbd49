"""Training-data ops: dedup, knn, textstats, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def docs_ds(ray):
    import ray.data
    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])


def test_token_stats_matches_python(ray_session):
    from warcio_ray.ops.textstats import token_stats_batch

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a b  c", "", "one. two! three?"]})
    out = token_stats_batch(df)
    assert list(out["n_tokens"]) == [3, 0, 3]
    assert list(out["n_punct"]) == [0, 0, 3]
    assert out["score"][0] == 6 / 4


def test_exact_dedup_finds_duplicates(ray_session):
    import ray.data

    from warcio_ray.ops.dedup import exact_dedup

    df = pd.DataFrame({"doc_id": [5, 1, 2, 3],
                       "text": ["dup", "dup", "uniq", "dup"]})
    out = exact_dedup(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == 2
    assert set(out["doc_id"]) == {1, 2}  # min doc_id survives


def test_minhash_detects_near_duplicates(ray_session):
    import ray.data

    from warcio_ray.ops.dedup import minhash_lsh_dedup

    # a HIGH-jaccard near-dup (J ~= 0.85): at J == threshold the LSH
    # S-curve is a coin flip by design, so the fixture stays above it
    base = " ".join(f"word{i}" for i in range(40))
    near = base.replace("word39", "changed")
    far = "completely different words entirely unrelated content " * 8
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": [base, near, far]})
    pairs, clusters = minhash_lsh_dedup(ray.data.from_pandas(df),
                                        threshold=0.5)
    assert {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])} == {(0, 1)}
    assert pairs.attrs["lsh_dropped_ids"] == 0
    c = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    assert c[0] == c[1] == 0


def test_minhash_hot_bucket_capped(ray_session):
    """A pathological bucket (many identical docs) must not go O(n^2):
    the bucket is truncated at max_bucket and the drop is surfaced."""
    import ray.data

    from warcio_ray.ops.dedup import minhash_lsh_dedup

    text = " ".join(f"tok{i}" for i in range(20))
    n = 24
    df = pd.DataFrame({"doc_id": range(n), "text": [text] * n})
    pairs, clusters = minhash_lsh_dedup(ray.data.from_pandas(df),
                                        threshold=0.9, max_bucket=8)
    # only the 8 smallest ids survive the cap -> at most C(8,2) pairs
    assert len(pairs) <= 28
    assert pairs.attrs["lsh_dropped_ids"] > 0
    # surviving pairs are genuinely duplicates among the kept ids
    assert set(pairs["a"]).issubset(set(range(8)))
    assert set(pairs["b"]).issubset(set(range(8)))


def test_simhash_pairs(ray_session):
    import ray.data

    from warcio_ray.ops.dedup import simhash_batch, simhash_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    # change ONE occurrence (1/48 of token weight): comfortably inside
    # max_hamming=8 and sharing a band under the md5-derived token hash
    near = base.replace("theta", "thetaX", 1)
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": [base, near, "zz yy xx ww vv uu " * 6]})
    out = simhash_dedup(ray.data.from_pandas(df), max_hamming=8)
    assert (0, 1) in {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}
    # signature is deterministic
    s1 = simhash_batch(df)["simhash"]
    s2 = simhash_batch(df)["simhash"]
    assert (s1 == s2).all()


def test_knn_bruteforce_exact(ray_session):
    import pyarrow.parquet as pq
    import ray.data

    from warcio_ray.ops.knn import knn_bruteforce

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    q = mat[0]
    # ground truth with plain numpy
    qn = q / np.linalg.norm(q)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = mn @ qn
    expect = set(t["vec_id"].to_numpy()[np.argsort(-cos)[:10]])

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    got = knn_bruteforce(ds, q, k=10)
    assert set(got["vec_id"]) == expect
    assert got["score"].iloc[0] == pytest.approx(1.0)


def test_embedding_neardup_vs_bruteforce(ray_session):
    import ray.data

    from warcio_ray.ops.knn import embedding_neardup

    rng = np.random.RandomState(0)
    base = rng.normal(size=(20, 16))
    # vectors 0 and 1 nearly identical
    base[1] = base[0] + 0.001 * rng.normal(size=16)
    df = pd.DataFrame({"vec_id": range(20),
                       "embedding": [v.astype(np.float32) for v in base]})
    out = embedding_neardup(ray.data.from_pandas(df), threshold=0.95,
                            bands=2, n_planes=16)
    assert (0, 1) in {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}


def test_media_decode_plumbing(ray_session):
    import ray.data

    from warcio_ray.ops.multimodal import MediaDecodeStage, decode_media

    df = pd.DataFrame({"media_id": [1, 2], "kind": ["image", "image"],
                       "payload": [b"abc", b"defg"], "mime": ["x", "x"]})
    out = decode_media(ray.data.from_pandas(df), fake=True).to_pandas()
    assert list(out.columns) == ["media_id", "kind", "width", "height",
                                 "features"]
    assert (out["width"] > 0).all()
    # deterministic
    stage = MediaDecodeStage(fake=True)
    a = stage._decode_fake(b"abc")
    b = stage._decode_fake(b"abc")
    assert a[0] == b[0] and a[1] == b[1] and np.array_equal(a[2], b[2])
    # real decoding exists for BMP/WAV (tests/test_mediacodec.py);
    # compressed kinds stay an explicit stub
    with pytest.raises(NotImplementedError):
        MediaDecodeStage(kind="video", fake=False)


def test_jaccard_similarity_join_exact(ray_session):
    """Exact jaccard join == brute-force all-pairs jaccard (no false
    negatives, unlike LSH)."""
    import itertools

    import ray.data

    from warcio_ray.ops.dedup import (
        _shingle_set,
        jaccard_similarity_join,
    )

    texts = {
        0: " ".join(f"w{i}" for i in range(30)),
        1: " ".join(f"w{i}" for i in range(29)) + " other",
        2: "totally different content here " * 3,
        3: " ".join(f"w{i}" for i in range(15)),  # ~half overlap with 0
        4: "",
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = jaccard_similarity_join(ray.data.from_pandas(df), threshold=0.5)
    got = {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}

    want = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        ga, gb = _shingle_set(texts[a], 3), _shingle_set(texts[b], 3)
        union = len(ga | gb)
        if union and 2 * len(ga & gb) >= union:
            want.add((a, b))
    assert got == want
    assert (0, 1) in got and (0, 2) not in got


def test_asof_and_range_ops_match_pandas(ray_session):
    import ray.data

    from warcio_ray.ops.relational import (
        asof_join_events,
        range_count_events,
    )

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet")

    out = asof_join_events(sf, "click", "purchase").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    clicks = ev[ev.event_type == "click"]
    purch = ev[ev.event_type == "purchase"]
    for _, row in out.head(50).iterrows():
        cand = purch[(purch.user_id == row.user_id) & (purch.ts <= row.ts)]
        want = cand.ts.max() if len(cand) else pd.NaT
        got = row.matched_ts
        assert (pd.isna(got) and pd.isna(want)) or got == want

    rng = range_count_events(sf, window_minutes=5).to_pandas()
    merged = rng.merge(ev[["event_id", "user_id", "ts"]], on="event_id")
    for _, row in merged.head(50).iterrows():
        n = ((ev.user_id == row.user_id) & (ev.ts < row.ts)
             & (ev.ts >= row.ts - pd.Timedelta(minutes=5))).sum()
        assert int(row.n_recent) == int(n)


def test_media_md5_kernel_matches_sql_derivation(ray_session):
    import hashlib

    from warcio_ray.ops.multimodal import MediaDecodeStage

    stage = MediaDecodeStage(fake=True, hash_algo="md5")
    payload = "hello world".encode()
    w, h, feats = stage._decode_fake(payload)
    hx = hashlib.md5(payload).hexdigest()
    assert w == 1 + int(hx[0:8], 16) % 4096
    assert h == 1 + int(hx[8:16], 16) % 4096
    assert len(feats) == 14


def test_ivf_search_exact_when_full_probe(ray_session):
    """nprobe == n_centroids makes IVF exact: equals brute force."""
    import ray.data

    from warcio_ray.ops.ivf import ivf_search, train_centroids
    from warcio_ray.ops.knn import knn_bruteforce

    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    q = np.asarray(t["embedding"][0], dtype=np.float64)

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    cents = train_centroids(ds, n_centroids=8, sample_size=500)
    exact = ivf_search(ds, q, k=10, centroids=cents)  # nprobe=all
    brute = knn_bruteforce(ds, q, k=10)
    assert list(exact["vec_id"]) == list(brute["vec_id"])

    # reduced probes: recall may drop but results stay a subset of the
    # corpus, are deterministic, and score-sorted
    approx1 = ivf_search(ds, q, k=10, centroids=cents, nprobe=2)
    approx2 = ivf_search(ds, q, k=10, centroids=cents, nprobe=2)
    assert list(approx1["vec_id"]) == list(approx2["vec_id"])
    recall = len(set(approx1["vec_id"]) & set(brute["vec_id"])) / 10
    assert recall >= 0.3


def test_fingerprint_dedup_finds_copies(ray_session):
    import ray.data

    from warcio_ray.ops.textstats import fingerprint_dedup

    base = " ".join(f"tok{i}" for i in range(60))
    near = base + " extra trailing words here"
    other = " ".join(f"zz{i}" for i in range(60))
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": [base, near, other]})
    out = fingerprint_dedup(ray.data.from_pandas(df), min_shared=3)
    got = {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}
    assert (0, 1) in got and (0, 2) not in got and (1, 2) not in got
    assert int(out["n_shared"].iloc[0]) >= 3


def test_media_resize_and_frame_sample(ray_session):
    import ray.data

    from warcio_ray.ops.multimodal import (
        FrameSampleStage,
        MediaResizeStage,
        resize_media,
        sample_frames,
    )

    df = pd.DataFrame({"media_id": [1, 2], "kind": ["image", "video"],
                       "payload": [b"img-bytes", b"vid-bytes"],
                       "mime": ["x", "x"]})
    resized = resize_media(ray.data.from_pandas(df), target_size=8) \
        .to_pandas().sort_values("media_id")
    assert list(resized["width"]) == [8, 8]
    assert all(len(p) == 64 for p in resized["payload"])

    frames = sample_frames(ray.data.from_pandas(df), n_frames=3) \
        .to_pandas()
    assert len(frames) == 6  # 3 per input
    assert set(frames["media_id"]) == {1, 2}
    # deterministic offsets + strictly increasing per media
    per = frames[frames["media_id"] == 1]["frame_idx"].tolist()
    assert per == sorted(per) and len(set(per)) == 3

    # video frame decode stays an explicit stub (no uncompressed
    # container); resize has a real BMP path (test_mediacodec.py)
    with pytest.raises(NotImplementedError):
        FrameSampleStage(fake=False)


def test_candidate_pairs_block_invariant(ray_session):
    """Candidate generation must not depend on input block structure
    (regression: pandas hash_pandas_object was batch-UNSTABLE on
    multi-column keys, silently splitting LSH buckets across partitions
    and losing pairs)."""
    import ray.data

    from warcio_ray.ops.dedup import simhash_dedup

    rng = np.random.RandomState(3)
    words = [f"w{i}" for i in range(50)]
    texts = []
    for i in range(60):
        base = list(rng.choice(words, size=30))
        texts.append(" ".join(base))
        texts.append(" ".join(base[:-1] + ["changed"]))  # near-dup twin
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    single = simhash_dedup(ray.data.from_pandas(df), max_hamming=8)
    multi = simhash_dedup(
        ray.data.from_pandas([df.iloc[i::5].reset_index(drop=True)
                              for i in range(5)]), max_hamming=8)
    assert len(single) > 0
    assert single[["a", "b"]].values.tolist() == \
        multi[["a", "b"]].values.tolist()


def test_asof_join_user_without_right_events(ray_session):
    """A user with left-type events and no right-type events must yield
    unmatched rows, not IndexError (regression)."""
    import ray.data

    from warcio_ray.ops.relational import asof_join_events

    ev = pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00",
                              "2024-01-01 09:00"]),
        "user_id": [7, 7, 8],          # user 8: click, no purchase ever
        "event_type": ["click", "purchase", "click"],
    })
    import tempfile, os
    d = tempfile.mkdtemp()
    ev.to_parquet(os.path.join(d, "events.parquet"))
    out = asof_join_events(d).to_pandas().sort_values("event_id")
    assert len(out) == 2                       # both clicks
    row8 = out[out["user_id"] == 8].iloc[0]
    assert pd.isna(row8["matched_ts"])


def test_pairs_partition_uint64_keys_not_merged():
    """Bucket boundary detection must compare 64-bit keys exactly —
    float64 promotion made 2^63 and 2^63+1 equal (regression)."""
    from warcio_ray.ops.dedup import _pairs_from_partition

    df = pd.DataFrame({
        "band_id": np.array([0, 0, 0, 0], dtype=np.int32),
        "band_hash": np.array([2**63, 2**63, 2**63 + 1, 2**63 + 1],
                              dtype=np.uint64),
        "doc_id": np.array([1, 2, 3, 4], dtype="int64"),
    })
    out = _pairs_from_partition(df, ["band_id", "band_hash"], 512)
    got = {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}
    # two distinct buckets -> only within-bucket pairs, never (1,3) etc.
    assert got == {(1, 2), (3, 4)}


def test_connected_components_ds_matches_inprocess(ray_session):
    """Distributed star-contraction CC == in-process union-find on
    random graphs (chains, merged clusters, isolated pairs)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from warcio_ray.ops.dedup import (
        _connected_components,
        connected_components_ds,
    )

    rng = np.random.RandomState(7)
    for trial in range(2):
        n_nodes = 200
        n_edges = rng.randint(50, 400)
        a = rng.randint(0, n_nodes, size=n_edges).astype("int64")
        b = rng.randint(0, n_nodes, size=n_edges).astype("int64")
        keep = a != b
        pairs = pd.DataFrame({"a": a[keep], "b": b[keep]})
        want = _connected_components(pairs).reset_index(drop=True)
        got = connected_components_ds(ray.data.from_pandas(pairs)) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64"))


def test_connected_components_ds_large_star_chain(ray_session):
    """1M-edge star + a deep chain, both SYNTHESIZED DATASET-SIDE (the
    driver never holds an edge list): labels must collapse each
    component to its min id."""
    import numpy as np
    import pandas as pd
    import ray.data

    from warcio_ray.ops.dedup import connected_components_ds

    N_STAR = 1_000_000
    N_CHAIN = 4_096
    CHAIN_BASE = 10_000_000

    def make_edges(batch: pd.DataFrame) -> pd.DataFrame:
        i = batch["id"].to_numpy(dtype="int64")
        star = i < N_STAR
        a = np.where(star, 0, CHAIN_BASE + (i - N_STAR))
        b = np.where(star, i + 1, CHAIN_BASE + (i - N_STAR) + 1)
        return pd.DataFrame({"a": a, "b": b})

    edges = ray.data.range(N_STAR + N_CHAIN - 1) \
        .map_batches(make_edges, batch_format="pandas")
    labels = connected_components_ds(edges)

    def check(batch: pd.DataFrame) -> pd.DataFrame:
        doc = batch["doc_id"].to_numpy()
        lab = batch["cluster_id"].to_numpy()
        want = np.where(doc < CHAIN_BASE, 0, CHAIN_BASE)
        return pd.DataFrame({"n": [len(batch)],
                             "bad": [int((lab != want).sum())]})

    out = labels.map_batches(check, batch_format="pandas").to_pandas()
    assert int(out["bad"].sum()) == 0
    assert int(out["n"].sum()) == (N_STAR + 1) + N_CHAIN


def test_cluster_best_representative(ray_session):
    """Winner = max quality, ties broken by min id; every clustered doc
    labeled; winner independent of row/partition order."""
    import pandas as pd
    import ray.data

    from warcio_ray.ops.dedup import cluster_best_representative

    clusters = pd.DataFrame({
        "doc_id": [1, 2, 3, 10, 11, 20, 21, 22],
        "cluster_id": [1, 1, 1, 10, 10, 20, 20, 20]})
    quality = pd.DataFrame({
        "doc_id": [1, 2, 3, 10, 11, 20, 21, 22, 99],
        "n_chars": [5, 9, 9, 0, 0, 7, 7, 7, 1000]})  # 99: unclustered

    for seed in (0, 1):  # two partition layouts
        shuffled = clusters.sample(frac=1, random_state=seed)
        out = cluster_best_representative(
            ray.data.from_pandas(shuffled).repartition(3 + seed),
            ray.data.from_pandas(quality),
            num_partitions=4).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert len(out) == len(clusters)  # doc 99 dropped (inner join)
        kept = set(out.loc[out["kept"], "doc_id"].astype(int))
        # cluster 1: tie 2 vs 3 at q=9 -> min id 2; cluster 10: tie at
        # q=0 -> id 10; cluster 20: three-way tie -> id 20
        assert kept == {2, 10, 20}
        assert out["n_chars"].tolist() == [5, 9, 9, 0, 0, 7, 7, 7]

    # quality out of packing range must raise, not silently corrupt
    bad = quality.assign(n_chars=[1 << 22] * 9)
    try:
        cluster_best_representative(
            ray.data.from_pandas(clusters),
            ray.data.from_pandas(bad), num_partitions=2).to_pandas()
        raised = False
    except Exception:
        raised = True
    assert raised


def test_train_centroids_bitwise_deterministic(ray_session):
    """Training twice on the same corpus must give bitwise-identical
    centroids regardless of block arrival order (the sample is sorted by
    vec_id before Lloyd runs)."""
    import numpy as np
    import ray.data

    from warcio_ray.ops.ivf import train_centroids

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    a = train_centroids(ds, n_centroids=8, sample_size=400)
    b = train_centroids(ds.repartition(7), n_centroids=8, sample_size=400)
    assert a.shape == b.shape
    assert np.array_equal(a, b)  # bitwise, not allclose


def test_minhash_64bit_modp_reduction():
    """The split-multiply (a*x+b) mod p kernel must equal exact big-int
    arithmetic for 64-bit shingle hashes (the 32-bit hash space
    birthday-collides on long documents)."""
    import numpy as np

    from warcio_ray.ops.dedup import _MERSENNE, MinHasher

    mh = MinHasher(num_perm=16, seed=9)
    text = "the quick brown fox jumps over the lazy dog " * 20
    sh = mh.shingles(text)
    assert sh.max() > (1 << 32)  # hashes really are 64-bit now
    sig = mh.signature(text)
    # exact reference in python big ints
    want = np.array([
        min((int(a) * int(x) + int(b)) % _MERSENNE for x in sh)
        for a, b in zip(mh.a, mh.b)], dtype=np.uint64)
    assert np.array_equal(sig, want)


def test_ivf_layout_search_matches_instream(ray_session, tmp_path):
    """The persisted hive-partitioned IVF layout returns the same
    results as the in-stream search for the same centroids — at full
    probe (exact) AND at nprobe=2 (approximate but deterministic).
    nprobe=1 must read only the probed partition."""
    import ray.data

    from warcio_ray.ops.ivf import (
        build_ivf_layout,
        ivf_search,
        ivf_search_layout,
        train_centroids,
    )

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    cents = train_centroids(ds, n_centroids=8, sample_size=400)
    layout = str(tmp_path / "ivf")
    build_ivf_layout(ds, layout, centroids=cents)

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/embeddings.parquet")
    q = np.asarray(t["embedding"][0].as_py(), dtype=np.float64)

    for nprobe in (None, 2):
        want = ivf_search(ds, q, k=10, centroids=cents, nprobe=nprobe) \
            .reset_index(drop=True)
        got = ivf_search_layout(layout, q, k=10, nprobe=nprobe) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["query_id", "vec_id"]].astype("int64"),
            want[["query_id", "vec_id"]].astype("int64"))
        assert np.allclose(got["score"], want["score"])

    # single-probe result comes only from that cluster's partition
    got1 = ivf_search_layout(layout, q, k=10, nprobe=1)
    import os

    probed = {int(d.split("=")[1])
              for d in os.listdir(os.path.join(layout, "vectors"))
              if d.startswith("centroid_id=")}
    assert len(probed) > 1  # layout really is partitioned
    assert len(got1) <= 10


def test_gopher_quality_signals():
    from warcio_ray.ops.textstats import gopher_quality_batch

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["aa bb cc\naa bb cc\nunique line",     # 1 dup of 3 lines
                 "123 456 !!",                          # no alpha words
                 ""],
    })
    out = gopher_quality_batch(df)
    assert list(out["n_words"]) == [8, 3, 0]
    assert out["dup_line_frac"][0] == pytest.approx(1 - 2 / 3)
    assert out["frac_alpha_words"][0] == pytest.approx(1.0)
    assert out["frac_alpha_words"][1] == 0.0
    assert out["mean_word_len"][2] == 0.0 and out["n_lines"][2] == 0


def test_lexical_diversity_signals():
    from warcio_ray.ops.textstats import lexical_diversity_batch

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["aa aa bb",       # chars: a*4 b*2 ' '*2; words aa,aa,bb
                 "",               # empty doc -> all zeros
                 "x",              # single char
                 "éé z"],  # non-ascii code points
    })
    out = lexical_diversity_batch(df)
    assert list(out["n_chars"]) == [8, 0, 1, 4]
    assert list(out["uniq_chars"]) == [3, 0, 1, 3]
    assert list(out["char_sq"]) == [16 + 4 + 4, 0, 1, 4 + 1 + 1]
    assert list(out["n_words"]) == [3, 0, 1, 2]
    assert list(out["uniq_words"]) == [2, 0, 1, 2]
    assert list(out["top_word_count"]) == [2, 0, 1, 1]
    assert all(str(t) == "int64" for t in out.dtypes[1:])


def test_top_terms_and_hash_sample(ray_session):
    import ray.data

    from warcio_ray.ops.textstats import hash_sample, top_terms

    df = pd.DataFrame({
        "doc_id": range(200),
        "text": ["alpha beta alpha"] * 150 + ["gamma beta"] * 50,
    })
    ds = ray.data.from_pandas(df)
    tt = top_terms(ds, k=3)
    assert list(tt["term"]) == ["alpha", "beta", "gamma"]
    assert list(tt["n"]) == [300, 200, 50]

    # sampling is deterministic and partitioning-invariant
    a = hash_sample(ds, pct=10).to_pandas()["doc_id"].sort_values()
    b = hash_sample(ds.repartition(7), pct=10).to_pandas()["doc_id"] \
        .sort_values()
    assert list(a) == list(b)
    assert 0 < len(a) < 60  # ~10% of 200, loose bound


def test_pretrain_corpus_pipeline(ray_session):
    """Composed cleaning chain: quality filter, exact dedup, near-dup
    removal — each stage must drop exactly its planted victim."""
    import ray.data

    from warcio_ray.pipelines.pretrain import pretrain_corpus

    long = " ".join(f"tok{i}" for i in range(30))
    near = long.replace("tok29", "changed")      # J ~ 0.87 vs long
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            long,            # survives (min id of its near-dup cluster)
            long,            # exact dup of 0 -> dropped
            near,            # near dup of 0 -> dropped
            "too short",     # quality fail (n_words < 20) -> dropped
            " ".join(f"w{i}" for i in range(25)),  # clean -> survives
        ],
    })
    for method in ("minhash", "jaccard"):
        out = pretrain_corpus(ray.data.from_pandas(df),
                              neardup_method=method).to_pandas()
        assert sorted(out["doc_id"]) == [0, 4], method


def test_minhash_distributed_cc_path(ray_session, monkeypatch):
    """Force the distributed connected-components branch inside
    minhash_lsh_dedup (threshold 0): clusters must equal the in-process
    union-find's on the same planted duplicates."""
    import ray.data

    import warcio_ray.ops.dedup as dedup

    base = " ".join(f"word{i}" for i in range(40))
    near = base.replace("word39", "changed")
    near2 = base.replace("word38", "altered")
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                       "text": [base, near, near2, "unrelated " * 20]})
    want_pairs, want_clusters = dedup.minhash_lsh_dedup(
        ray.data.from_pandas(df), threshold=0.5)
    monkeypatch.setattr(dedup, "CC_DISTRIBUTED_THRESHOLD", 0)
    got_pairs, got_clusters = dedup.minhash_lsh_dedup(
        ray.data.from_pandas(df), threshold=0.5)
    pd.testing.assert_frame_equal(got_pairs, want_pairs)
    pd.testing.assert_frame_equal(
        got_clusters.reset_index(drop=True).astype("int64"),
        want_clusters.reset_index(drop=True).astype("int64"))


def test_safe_join_survives_empty_groupby_blocks(ray_session):
    """Regression for the zero-schema empty-block join poison: groupby
    outputs with mostly-empty groups crash a bare Dataset.join
    nondeterministically; safe_join must always work."""
    import ray.data

    from warcio_ray.ops.blocks import drop_empty_blocks, safe_join

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4], "g": [0, 1, 2, 3]})
    ds = ray.data.from_pandas(df).repartition(4)
    right = ds.groupby("g").map_groups(
        lambda g: g[g["doc_id"] == 1][["doc_id"]], batch_format="pandas")
    left = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": list("abcd")}))
    for _ in range(3):  # the bare join fails only sometimes — repeat
        out = safe_join(left, right, join_type="left_anti",
                        num_partitions=4, on=("doc_id",)).to_pandas()
        assert sorted(out["doc_id"]) == [2, 3, 4]
    # the sanitizer alone drops every zero-row block
    clean = drop_empty_blocks(right)
    assert all((m.num_rows or 0) > 0
               for b in clean.materialize().iter_internal_ref_bundles()
               for _, m in b.blocks)


def test_drop_empty_blocks_gate(ray_session):
    """The sanitizer's materialize barrier is GATED: map-only lineages
    (reads, map_batches, project, union) pass through untouched;
    anything containing a filter/groupby/sort/repartition still
    sanitizes."""
    import ray.data

    from warcio_ray.ops.blocks import (_may_emit_empty_blocks,
                                       drop_empty_blocks)

    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": list("abc")})
    base = ray.data.from_pandas(df)
    safe = base.map_batches(lambda t: t, batch_format="pyarrow") \
        .select_columns(["doc_id"]).union(
            base.select_columns(["doc_id"]))
    assert not _may_emit_empty_blocks(safe)
    assert drop_empty_blocks(safe) is safe  # no barrier

    for unsafe in (base.filter(expr="doc_id > 1"),
                   base.groupby("doc_id").count(),
                   base.repartition(2),
                   base.sort("doc_id"),
                   # map downstream of an unsafe op stays unsafe
                   base.repartition(2).map_batches(
                       lambda t: t, batch_format="pyarrow")):
        assert _may_emit_empty_blocks(unsafe)
        assert drop_empty_blocks(unsafe) is not unsafe


def test_split_assign(ray_session):
    """Stratified split: per-group sizes are the exact Hamilton
    apportionment, membership matches the brute-force md5-rank
    reference, partitioning- and bucket-invariant."""
    import hashlib

    import ray.data

    from warcio_ray.ops.split import split_assign

    rng = np.random.default_rng(9)
    n = 500
    langs = np.array(["en", "de", "fr", "zz"])[  # zz: tiny group
        np.concatenate([rng.integers(0, 3, n - 4), [3, 3, 3, 3]])]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                       "lang": langs})

    fr = (("train", 90), ("val", 7), ("test", 3))

    def reference():
        out = {}
        for g, grp in df.groupby("lang"):
            ids = sorted(grp["doc_id"], key=lambda i: (
                int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16),
                i))
            ng = len(ids)
            base = [ng * w // 100 for _, w in fr]
            rem = [ng * w % 100 for _, w in fr]
            left = ng - sum(base)
            for i in sorted(range(3),
                            key=lambda i: (-rem[i], fr[i][0]))[:left]:
                base[i] += 1
            pos = 0
            for (name, _), q in zip(fr, base):
                for i in ids[pos:pos + q]:
                    out[i] = name
                pos += q
        return out

    want = reference()
    for nb, bits in ((1, 7), (9, 4)):
        got = split_assign(
            ray.data.from_pandas(df).repartition(nb), fractions=fr,
            bucket_bits=bits).to_pandas()
        assert len(got) == n
        assert dict(zip(got["doc_id"], got["split"])) == want, (nb, bits)
    # the tiny group still gets exact Hamilton shares (4 docs at
    # 90/7/3 -> 4/0/0)
    zz = {i: s for i, s in want.items() if df.loc[i, "lang"] == "zz"}
    assert sorted(zz.values()) == ["train"] * 4


def test_weighted_sample_topk(ray_session):
    """E-S weighted sampling: matches the brute-force priority order,
    partitioning-invariant, rejects non-positive weights."""
    import hashlib
    import math

    import pytest
    import ray.data

    from warcio_ray.ops.textstats import weighted_sample_topk

    n = 300
    rng = np.random.default_rng(3)
    w = rng.integers(1, 500, n).astype("int64")
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"), "w": w})

    pri = {}
    for i, wi in zip(df["doc_id"], w):
        h = int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16)
        u = (h + 1.0) / 4294967296.0
        pri[int(i)] = math.floor(np.log(u) / wi * 4294967296.0 + 0.5)
    want = sorted(pri, key=lambda i: (-pri[i], i))[:25]

    for nb in (1, 6):
        got = weighted_sample_topk(
            ray.data.from_pandas(df).repartition(nb), k=25,
            weight_col="w")
        assert sorted(got["doc_id"]) == sorted(want)
        assert (got["priority_q"].to_numpy()
                == np.array([pri[i] for i in got["doc_id"]])).all()

    # the worker-side ValueError surfaces wrapped in RayTaskError
    with pytest.raises(Exception, match="positive"):
        weighted_sample_topk(ray.data.from_pandas(
            pd.DataFrame({"doc_id": [1], "w": [0]})), k=1,
            weight_col="w")


def test_weighted_budget_select(ray_session):
    """Exact token-budget selection: matches a brute-force
    (weight desc, id asc) prefix under every budget edge (0, mid,
    crossing doc, ties at the cutoff, negative weights, everything),
    partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.quantile import weighted_budget_select

    rng = np.random.default_rng(11)
    n = 400
    w = rng.integers(-50, 50, n).astype("int64")
    w[100:140] = 7   # a fat tie group
    w[200:210] = -3  # negative tie group
    cnt = rng.integers(1, 30, n).astype("int64")
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                       "iw": w, "n_tok": cnt})

    order = df.sort_values(["iw", "doc_id"],
                           ascending=[False, True]).reset_index(drop=True)
    cum_before = order["n_tok"].cumsum() - order["n_tok"]
    total = int(cnt.sum())

    for budget in (0, 1, total // 3, total // 2 + 3, total - 1, total,
                   total + 100):
        want = set(order.loc[cum_before < budget, "doc_id"])
        for nb in (1, 7):
            ds = ray.data.from_pandas(df).repartition(nb)
            got = weighted_budget_select(ds, budget).to_pandas()
            if budget == 0:  # Ray's empty collect loses the schema
                assert len(got) == 0
                continue
            assert set(got["doc_id"]) == want, (budget, nb)
            # kept rows keep their columns
            assert set(got.columns) == {"doc_id", "iw", "n_tok"}


def test_guarded_to_pandas(ray_session):
    """Convenience collectors refuse corpus-scale results, naming the
    Dataset variant; max_rows=None bypasses deliberately."""
    import pytest
    import ray.data

    from warcio_ray.ops.blocks import guarded_to_pandas

    ds = ray.data.range(100)
    assert len(guarded_to_pandas(ds, "op", "op_ds", max_rows=100)) == 100
    with pytest.raises(ValueError, match="op_ds"):
        guarded_to_pandas(ds, "op", "op_ds", max_rows=99)
    assert len(guarded_to_pandas(ds, "op", "op_ds",
                                 max_rows=None)) == 100


def test_decontaminate_planted_overlap(ray_session):
    import ray.data

    from warcio_ray.ops.dedup import decontaminate

    eval_texts = ["the quick brown fox jumps over the lazy dog"]
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["totally unrelated words here now",
                 "prefix text the quick brown fox suffix words",  # 2 shared 3-grams
                 "quick brown fox jumps again"],                  # 2 shared
    })
    out = decontaminate(ray.data.from_pandas(df), eval_texts, min_overlap=1)
    got = dict(zip(out["doc_id"], out["n_overlap"]))
    assert 0 not in got
    assert got[1] == 2   # 'the quick brown', 'quick brown fox'
    assert got[2] == 2   # 'quick brown fox', 'brown fox jumps'


def test_unigram_logprob_scores(ray_session):
    import math

    import ray.data

    from warcio_ray.ops.textstats import unigram_logprob_scores

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["common common common rare", "common common", ""],
    })
    out = unigram_logprob_scores(ray.data.from_pandas(df),
                                 vocab_size=10).to_pandas()
    got = dict(zip(out["doc_id"], out["nll"]))
    # corpus: common x5, rare x1; vocab = both; total 6; denom 6 + 3
    p_common = (5 + 1) / 9.0
    p_rare = (1 + 1) / 9.0
    want0 = (3 * -math.log(p_common) + -math.log(p_rare)) / 4
    assert got[0] == pytest.approx(want0)
    assert got[1] == pytest.approx(-math.log(p_common))
    assert got[2] == 0.0
    # rarer docs score worse
    assert got[0] > got[1]


def test_repeated_span_scrub_both_paths(ray_session):
    import numpy as np
    import ray.data

    from warcio_ray.ops.spans import _doc_grams, repeated_span_scrub

    # 'a b c' occurs in 3 docs -> repeated at min_docs=3; 'x y z' in 2.
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["a b c d e",
                 "z a b c q",
                 "a b c",
                 "x y z w",
                 ""],
    })

    def reference(min_docs):
        from collections import Counter
        c = Counter()
        for t in df["text"]:
            for g in set(_doc_grams(t, 3)):
                c[g] += 1
        rep = {g for g, n in c.items() if n >= min_docs}
        rows = []
        for doc_id, t in zip(df["doc_id"], df["text"]):
            toks = (t or "").split()
            cov = np.zeros(len(toks), bool)
            for i, g in enumerate(_doc_grams(t, 3)):
                if g in rep:
                    cov[i:i + 3] = True
            rows.append((int(doc_id),
                         " ".join(np.array(toks, object)[~cov]),
                         int(cov.sum())))
        return pd.DataFrame(
            rows, columns=["doc_id", "clean_text", "n_removed"])

    ref = reference(3)
    ds = ray.data.from_pandas(df).repartition(3)
    for bmax in (1_000_000, 0):   # broadcast path, then forced join path
        out = repeated_span_scrub(ds, k=3, min_docs=3, broadcast_max=bmax,
                                  num_partitions=4).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, ref)
    # doc 0: 'a b c' covers tokens 0-2 -> 'd e' survives
    assert ref.loc[0, "clean_text"] == "d e"
    assert ref.loc[3, "n_removed"] == 0  # 'x y z' below min_docs
    # no repeated grams at a high threshold -> passthrough branch
    out = repeated_span_scrub(ds, k=3, min_docs=99).to_pandas()
    assert (out["n_removed"] == 0).all() and len(out) == 5


def test_redact_pii(ray_session):
    import ray.data

    from warcio_ray.ops.pii import redact_pii

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "mail a.b+c%d@sub.example.org now",
            "call +1 (415) 555-0100 or visit 192.168.1.254 today",
            None,                       # null text -> '' passthrough
            "v1.2.3.4000 is a version, 10.0.0.1 is an ip",
        ],
    })
    out = redact_pii(ray.data.from_pandas(df).repartition(2)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "clean_text"] == "mail <EMAIL> now"
    assert (out.loc[0, ["n_email", "n_phone", "n_ip"]].tolist()
            == [1, 0, 0])
    assert out.loc[1, "clean_text"] == "call <PHONE> or visit <IP> today"
    assert (out.loc[1, ["n_email", "n_phone", "n_ip"]].tolist()
            == [0, 1, 1])
    assert out.loc[2, "clean_text"] == "" and out.loc[2, "n_ip"] == 0
    # 4-digit final octet breaks \b -> version string survives,
    # the real IP is scrubbed
    assert out.loc[3, "clean_text"] == \
        "v1.2.3.4000 is a version, <IP> is an ip"
    assert out["doc_id"].dtype == "int64"


def test_rm3_topk(ray_session):
    """RM3 expansion: matches a from-first-principles reference of the
    whole chain (feedback top-k -> integer RM1 weights -> weighted
    quantized re-rank), surfaces a doc containing ONLY expansion terms
    (which plain BM25 can never rank), partitioning-invariant."""
    import math
    from collections import Counter

    import ray.data

    from warcio_ray.ops.search import bm25_topk, rm3_topk

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["spark shuffle shuffle",   # feedback: rich in shuffle
                 "spark shuffle stage",     # feedback: shuffle+stage
                 "shuffle shuffle shuffle", # NO query term
                 "stage stage",             # NO query term
                 "nothing here"],
    })
    terms = ["spark"]
    K, FB, FT, EW = 4, 2, 2, 0.5

    outs = []
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        outs.append(rm3_topk(ds, terms, k=K, fb_docs=FB, fb_terms=FT,
                             expansion_weight=EW).to_pandas()
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]

    # reference
    toks = {int(d): (t or "").split()
            for d, t in zip(df["doc_id"], df["text"])}
    n = len(toks)
    avgdl = sum(map(len, toks.values())) / n

    def bm25_scores(ts_weighted):
        dfs = {t: sum(t in ts for ts in toks.values())
               for t, _ in ts_weighted}
        rows = []
        for did, ts in toks.items():
            sq = 0
            for t, w in ts_weighted:
                idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5)
                               + 1.0)
                tf = float(ts.count(t))
                sq += int(math.floor(
                    (w * idf) * (tf * 2.2)
                    / (tf + 1.2 * (1 - 0.75 + 0.75 * len(ts) / avgdl))
                    * float(1 << 32) + 0.5))
            if sq > 0:
                rows.append((did, sq))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows

    fb = [d for d, _ in bm25_topk(
        ray.data.from_pandas(df), terms, k=FB).to_pandas()
        [["doc_id", "score"]].itertuples(index=False)]
    w = Counter()
    for d in fb:
        ts = toks[int(d)]
        for t, c in Counter(ts).items():
            w[t] += (c * (1 << 32)) // len(ts)
    exp = sorted((t for t in w if t not in terms),
                 key=lambda t: (-w[t], t))[:FT]
    want = bm25_scores([(t, 1.0) for t in terms]
                       + [(t, EW) for t in exp])[:K]
    got = [(int(r.doc_id), int(r.score_q)) for r in out.itertuples()]
    assert got == want
    # docs 2 and 3 carry no query term — only expansion surfaces them
    assert {2, 3} & {d for d, _ in got}
    plain = set(bm25_topk(ray.data.from_pandas(df), terms, k=K)
                .to_pandas()["doc_id"].astype(int))
    assert 2 not in plain and 3 not in plain


def test_bm25_topk(ray_session):
    import math

    import ray.data

    from warcio_ray.ops.search import bm25_topk

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": ["spark join query",       # all three terms
                 "join join join pad pad", # high tf, longer doc
                 "nothing relevant",
                 None,
                 "spark spark",
                 "sparkle joined queries"],  # substrings must NOT match
    })

    def reference(k):
        toks = [(d or "").split() for d in df["text"]]
        n = len(toks)
        avgdl = sum(map(len, toks)) / n
        terms = ["spark", "join", "query"]
        dfs = [sum(t in ts for ts in toks) for t in terms]
        idf = [math.log((n - d + 0.5) / (d + 0.5) + 1.0) for d in dfs]
        rows = []
        for did, ts in zip(df["doc_id"], toks):
            s = 0.0
            for i, t in enumerate(terms):
                tf = ts.count(t)
                s += idf[i] * (tf * 2.2) / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * len(ts) / avgdl))
            if s > 0:
                rows.append((int(did), s))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]

    ds = ray.data.from_pandas(df).repartition(3)
    out = bm25_topk(ds, ["spark", "join", "query"], k=3).to_pandas()
    ref = reference(3)
    assert out["doc_id"].tolist() == [r[0] for r in ref]
    assert np.allclose(out["score"].to_numpy(),
                       [r[1] for r in ref], rtol=1e-12)
    # word-boundary semantics: doc 5 (substring-only matches) scores 0
    full = bm25_topk(ds, ["spark", "join", "query"], k=10).to_pandas()
    assert 5 not in set(full["doc_id"])
    assert 3 not in set(full["doc_id"])  # null text never surfaces


def test_pack_sequences(ray_session):
    """Concat-and-chop packing: exact vs an in-process reference, and
    invariant to both input partitioning and prefix-sum bucket size."""
    import ray.data

    from warcio_ray.ops.pack import pack_sequences

    rng = np.random.RandomState(11)
    texts = [" ".join(f"t{j}" for j in range(rng.randint(0, 40)))
             for _ in range(57)]
    texts[7] = ""          # empty doc emits no segment
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    W = 16

    def reference():
        rows, off = [], 0
        for did, text in zip(df["doc_id"], df["text"]):
            n = len(text.split())
            if n:
                b = off // W
                while b * W < off + n:
                    s = max(b * W, off)
                    e = min((b + 1) * W, off + n)
                    rows.append((did, b, s - off, s - b * W, e - s))
                    b += 1
            off += n
        return rows

    ref = reference()
    for ds, bucket in [
            (ray.data.from_pandas(df), 4096),
            (ray.data.from_pandas(df).repartition(5), 8),
    ]:
        out = pack_sequences(ds, window=W, bucket_size=bucket).to_pandas()
        out = out.sort_values(["doc_id", "bin_id"]).reset_index(drop=True)
        assert [tuple(r) for r in out.to_numpy()] == ref
    # bins are gap-free and full except possibly the last
    packed = pack_sequences(ray.data.from_pandas(df), window=W).to_pandas()
    per_bin = packed.groupby("bin_id")["n_tok"].sum()
    assert (per_bin[:-1] == W).all() and 0 < per_bin.iloc[-1] <= W


def test_stratified_sample(ray_session):
    """k-per-group sample: correct size per group, deterministic, and
    partition-invariant (the combiner cut must not change the winners)."""
    import hashlib

    import ray.data

    from warcio_ray.ops.textstats import stratified_sample

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "doc_id": range(200),
        "lang": rng.choice(["en", "de", "fr"], size=200),
    })

    def reference(k):
        h = df["doc_id"].map(
            lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16))
        r = df.assign(_h=h).sort_values(["_h", "doc_id"])
        return {g: list(grp["doc_id"][:k])
                for g, grp in r.groupby("lang", sort=False)}

    want = reference(7)
    for ds in [ray.data.from_pandas(df),
               ray.data.from_pandas(df).repartition(9)]:
        out = stratified_sample(ds, "lang", k=7).to_pandas()
        got = {g: sorted(grp["doc_id"]) for g, grp in out.groupby("lang")}
        assert got == {g: sorted(v) for g, v in want.items()}
    # k larger than a group returns the whole group
    small = df[df["lang"] == "de"].head(3)
    out = stratified_sample(
        ray.data.from_pandas(small), "lang", k=50).to_pandas()
    assert sorted(out["doc_id"]) == sorted(small["doc_id"])


def test_incremental_dedup(ray_session):
    """Cross-snapshot dedup: duplicates by TEXT (not id) are dropped,
    an empty standing corpus keeps everything, and a fully-seen
    snapshot drops everything."""
    import ray.data

    from warcio_ray.ops.dedup import incremental_dedup

    seen = pd.DataFrame({"doc_id": [100, 101],
                         "text": ["known page", "other known"]})
    new = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                        "text": ["fresh one", "known page",
                                 "fresh two", "other known"]})
    out = incremental_dedup(ray.data.from_pandas(new),
                            ray.data.from_pandas(seen)).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]
    assert set(out.columns) == {"doc_id", "text"}

    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "text": pd.Series(dtype="object")})
    out = incremental_dedup(ray.data.from_pandas(new),
                            ray.data.from_pandas(empty)).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3, 4]

    out = incremental_dedup(ray.data.from_pandas(new),
                            ray.data.from_pandas(new)).to_pandas()
    assert len(out) == 0


def test_linear_quality_scores(ray_session):
    """Hashed-feature linear scoring: exact integer accumulation vs an
    in-process reference, order/partitioning invariance, empty-doc
    neutral score."""
    import hashlib
    import math

    import ray.data

    from warcio_ray.ops.classify import (
        default_weights,
        linear_quality_scores,
    )

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["alpha beta gamma", "alpha alpha alpha", "", None],
    })
    w = default_weights()

    def ref_raw(text):
        toks = (text or "").split()
        return sum(int(w[int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                         % 256]) for t in toks)

    for ds in [ray.data.from_pandas(df),
               ray.data.from_pandas(df).repartition(4)]:
        out = linear_quality_scores(ds, concurrency=2).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(out["raw_score"]) == [ref_raw(t) for t in df["text"]]
        assert list(out["n_tokens"]) == [3, 3, 0, 0]
        assert out["quality_prob"][2] == 0.5 and out["quality_prob"][3] == 0.5
        r, n = out["raw_score"][0], out["n_tokens"][0]
        assert out["quality_prob"][0] == pytest.approx(
            1 / (1 + math.exp(-(r / (n * 2**31)))), rel=1e-12)


def test_pagerank_fixed_point(ray_session):
    """Integer PageRank: bit-identical to an in-process mirror on a
    graph with dangling + isolated nodes, at two partitionings."""
    import ray.data

    from warcio_ray.ops.graph import pagerank_ds

    # 0->1->2->0 cycle, 3 dangling, 4 isolated, 5 feeds 0 and 1
    edges = pd.DataFrame({"src": [0, 1, 2, 5, 5],
                          "dst": [1, 2, 0, 0, 1]})
    nodes = pd.DataFrame({"node": [0, 1, 2, 3, 4, 5]})
    SCALE = 10 ** 12

    def reference(iters=5, damping=85):
        n = len(nodes)
        deg = edges.groupby("src").size().to_dict()
        r = {int(v): SCALE for v in nodes["node"]}
        base = ((100 - damping) * SCALE) // 100
        for _ in range(iters):
            dang = sum(r[v] for v in r if deg.get(v, 0) == 0)
            s = {v: 0 for v in r}
            for a, b in zip(edges["src"], edges["dst"]):
                s[int(b)] += r[int(a)] // deg[int(a)]
            r = {v: base + (damping * (s[v] + dang // n)) // 100
                 for v in r}
        return r

    want = reference()
    for np_ in [1, 3]:
        got = pagerank_ds(
            ray.data.from_pandas(edges).repartition(np_),
            ray.data.from_pandas(nodes).repartition(np_),
            iters=5).to_pandas()
        assert dict(zip(got["node"].astype(int),
                        got["rank"].astype(int))) == want
    # total mass stays bounded by n*SCALE (integer division only sheds)
    assert sum(want.values()) <= len(nodes) * SCALE

    # the join path (forced via broadcast_max_nodes=0) is bit-equal to
    # the auto-selected broadcast path exercised above
    got_join = pagerank_ds(
        ray.data.from_pandas(edges), ray.data.from_pandas(nodes),
        iters=5, broadcast_max_nodes=0).to_pandas()
    assert dict(zip(got_join["node"].astype(int),
                    got_join["rank"].astype(int))) == want


def test_trustrank_seeded(ray_session):
    """TrustRank (seeds= on pagerank_ds): bit-identical to an
    in-process mirror (teleport/init/dangling restricted to seeds),
    broadcast and join paths bit-equal, non-seed dead-ends decay to
    exactly 0 teleport mass, unknown seed ids ignored, empty seed
    set raises."""
    import numpy as np
    import pytest
    import ray.data

    from warcio_ray.ops.graph import pagerank_ds

    edges = pd.DataFrame({"src": [0, 1, 2, 5, 5, 3],
                          "dst": [1, 2, 0, 0, 1, 4]})
    nodes = pd.DataFrame({"node": [0, 1, 2, 3, 4, 5]})
    SCALE = 10 ** 12
    seeds = [0, 5, 99]  # 99 is outside the universe -> ignored

    def reference(iters=3, damping=85):
        n_tele = 2
        deg = edges.groupby("src").size().to_dict()
        sset = {0, 5}
        r = {int(v): (SCALE if int(v) in sset else 0)
             for v in nodes["node"]}
        base = ((100 - damping) * SCALE) // 100
        for _ in range(iters):
            dang = sum(r[v] for v in r if deg.get(v, 0) == 0)
            s = {v: 0 for v in r}
            for a, b in zip(edges["src"], edges["dst"]):
                if deg[int(a)]:
                    s[int(b)] += r[int(a)] // deg[int(a)]
            r = {v: (base if v in sset else 0)
                 + (damping * (s[v] + (dang // n_tele
                                       if v in sset else 0))) // 100
                 for v in r}
        return r

    want = reference()
    for np_ in [1, 3]:
        got = pagerank_ds(
            ray.data.from_pandas(edges).repartition(np_),
            ray.data.from_pandas(nodes).repartition(np_),
            iters=3, seeds=np.array(seeds)).to_pandas()
        assert dict(zip(got["node"].astype(int),
                        got["rank"].astype(int))) == want
    got_join = pagerank_ds(
        ray.data.from_pandas(edges), ray.data.from_pandas(nodes),
        iters=3, seeds=np.array(seeds),
        broadcast_max_nodes=0).to_pandas()
    assert dict(zip(got_join["node"].astype(int),
                    got_join["rank"].astype(int))) == want
    # node 4 (isolated, non-seed, fed only by dangling seedless 3):
    # no teleport mass -> rank exactly 0 after its inflow dries up
    assert want[4] == 0
    # ... and so does its seedless feeder (no teleport, no inflow)
    assert want[3] == 0
    # seeds always retain at least the teleport base
    base = ((100 - 85) * SCALE) // 100
    assert want[0] >= base and want[5] >= base

    for bmn in (0, 2_000_000):
        with pytest.raises(ValueError, match="seed set is empty"):
            pagerank_ds(ray.data.from_pandas(edges),
                        ray.data.from_pandas(nodes), iters=1,
                        seeds=np.array([999]),
                        broadcast_max_nodes=bmn)


def test_hll_distinct(ray_session):
    """HLL sketch: estimate within ~3x sigma of truth (sigma = 1.04/sqrt(m)),
    partitioning-invariant (bit-identical estimates), and exact-integer
    register fold handles the empty-register shift (2^64)."""
    import ray.data

    from warcio_ray.ops.sketch import (
        hll_distinct,
        hll_estimate_from_registers,
    )

    rng = np.random.RandomState(7)
    n_true = 3000
    vals = [f"v{i}" for i in rng.randint(0, n_true, size=9000)]
    truth = len(set(vals))
    df = pd.DataFrame({"k": ["x"] * len(vals), "v": vals})

    est1 = hll_distinct(ray.data.from_pandas(df), "k", "v")
    est2 = hll_distinct(ray.data.from_pandas(df).repartition(7), "k", "v")
    assert est1["n_distinct_est"][0] == est2["n_distinct_est"][0]
    assert abs(est1["n_distinct_est"][0] - truth) / truth < 3 * 1.04 / 32

    # small-range correction path: tiny cardinality
    small = pd.DataFrame({"k": ["x"] * 10, "v": [f"s{i}" for i in range(4)
                                                 ] + ["s0"] * 6})
    e = hll_distinct(ray.data.from_pandas(small), "k", "v")
    assert abs(e["n_distinct_est"][0] - 4) < 1.0

    # empty-register fold is exact (no int64 overflow on 1 << 64)
    assert hll_estimate_from_registers(np.zeros(1024, dtype=np.int64),
                                       10) == pytest.approx(0.0, abs=1e-9)


def test_count_min_probe(ray_session):
    """CMS: exact true counts, est >= true always, partitioning-
    invariant, and a cramped sketch (w=8) actually overestimates
    (collisions) while a roomy one is exact for a small vocab."""
    import ray.data

    from warcio_ray.ops.sketch import count_min_probe

    rng = np.random.RandomState(11)
    vocab = [f"t{i}" for i in range(200)]
    docs = [" ".join(rng.choice(vocab, size=40)) for _ in range(120)]
    df = pd.DataFrame({"text": docs})
    truth: dict = {}
    for d in docs:
        for t in d.split():
            truth[t] = truth.get(t, 0) + 1
    probes = vocab[:25]

    out1 = count_min_probe(ray.data.from_pandas(df), "text", probes)
    out2 = count_min_probe(ray.data.from_pandas(df).repartition(9),
                           "text", probes)
    pd.testing.assert_frame_equal(out1, out2)  # bit-identical merge
    assert list(out1["term"]) == sorted(probes)
    for _, row in out1.iterrows():
        assert row["true_count"] == truth[row["term"]]
        assert row["est_count"] >= row["true_count"]
    # 200-token vocab into 4x2048 cells: collisions vanishingly likely
    assert (out1["est_count"] == out1["true_count"]).all()

    # cram the same vocab into w=8 columns: min-over-4-rows must
    # overestimate somewhere, and never underestimate
    tight = count_min_probe(ray.data.from_pandas(df), "text", probes, w=8)
    assert (tight["est_count"] >= tight["true_count"]).all()
    assert (tight["est_count"] > tight["true_count"]).any()
    assert (tight["true_count"].to_numpy()
            == out1["true_count"].to_numpy()).all()


def test_histogram_quantiles(ray_session):
    """Exact histogram quantiles: matches a brute-force sort on random
    ints, partitioning-invariant, handles nulls/empty, and the integer
    rank rule hits exact-boundary ranks correctly."""
    import ray.data

    from warcio_ray.ops.quantile import histogram_quantiles

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 50, size=1000).astype("int64")
    df = pd.DataFrame({"x": vals})
    pcts = (1, 10, 25, 50, 75, 90, 99, 100)

    out = histogram_quantiles(ray.data.from_pandas(df), "x", pcts)
    out2 = histogram_quantiles(ray.data.from_pandas(df).repartition(13),
                               "x", pcts)
    pd.testing.assert_frame_equal(out, out2)

    srt = np.sort(vals)
    for _, row in out.iterrows():
        rank = (row["pct"] * len(vals) + 99) // 100
        assert row["value"] == srt[rank - 1]

    # exact boundary: 4 values, p=25 -> rank (25*4+99)//100 = 1
    tiny = pd.DataFrame({"x": [10, 20, 30, 40]})
    t = histogram_quantiles(ray.data.from_pandas(tiny), "x", (25, 50, 75))
    assert t.values.tolist() == [[25, 10], [50, 20], [75, 30]]

    # nulls are excluded; empty input yields empty typed frame
    withnull = pd.DataFrame({"x": pd.array([5, None, 5, None],
                                           dtype="Int64")})
    w = histogram_quantiles(ray.data.from_pandas(withnull), "x", (50,))
    assert w.values.tolist() == [[50, 5]]
    empty = histogram_quantiles(
        ray.data.from_pandas(pd.DataFrame({"x": pd.array([], dtype="Int64")})),
        "x", (50,))
    assert len(empty) == 0 and list(empty.columns) == ["pct", "value"]


def test_normalize_text(ray_session):
    """NFC + whitespace canonicalization: combining sequences compose,
    runs of whitespace collapse, edges trim, clean rows unchanged."""
    import ray.data

    from warcio_ray.ops.textstats import normalize_text_batch

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["Cafe\u0301 bon",        # combining acute -> precomposed
                 "a\tb\n  c",               # tab/newline/runs -> spaces
                 " lead and trail ",         # edge trim
                 "clean ascii"]})
    out = ray.data.from_pandas(df).map_batches(
        normalize_text_batch, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["text_norm"].tolist() == [
        "Caf\u00e9 bon", "a b c", "lead and trail", "clean ascii"]
    assert out["changed"].tolist() == [True, True, True, False]


def test_html_features(ray_session):
    """HTML structural features over hand-built markup (independent of
    the page renderer): tag/link/para counts, nav anchor-text mass,
    byte vs char lengths, missing-<nav> page scores 0, partitioning
    invariance."""
    import ray.data

    from warcio_ray.ops.htmlstats import html_features

    h1 = (b"<!DOCTYPE html>\n<html><body>"
          b"<p>hello</p><P CLASS='x'>world</p>"
          b"<nav><a href='/a'>go</a>\n<A HREF='/b'>back</a></nav>"
          b"</body></html>")
    h2 = b"<html><body><p>two \xc3\xa9</p></body></html>"  # utf-8, no nav
    df = pd.DataFrame({
        "url": ["http://s.example/doc/7", "http://s.example/doc/8"],
        "html": [h1, h2],
        "text": ["hello\nworld\ngo\nback", "two é"]})

    outs = []
    for nparts in (1, 2):
        ds = ray.data.from_pandas(df).repartition(nparts)
        outs.append(html_features(ds).to_pandas()
                    .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]

    r7 = out[out["doc_id"] == 7].iloc[0]
    # tags: DOCTYPE, html, body, p, /p, P, /p, nav, a, /a, A, /a,
    # /nav, /body, /html = 15
    assert int(r7["n_tags"]) == 15
    assert int(r7["n_links"]) == 2          # <a ...> and <A ...>
    assert int(r7["n_paras"]) == 2          # <p> and <P ...>
    assert int(r7["html_bytes"]) == len(h1)
    assert int(r7["text_chars"]) == len("hello\nworld\ngo\nback")
    # nav body minus tags: "go" + "\n" + "back"
    assert int(r7["nav_text_chars"]) == len("go\nback")

    r8 = out[out["doc_id"] == 8].iloc[0]
    assert int(r8["nav_text_chars"]) == 0   # no <nav> block
    assert int(r8["html_bytes"]) == len(h2)           # bytes
    assert int(r8["text_chars"]) == len("two é")  # chars, not bytes
    assert int(r8["n_links"]) == 0


def test_embedding_gram(ray_session):
    """Fixed-point Gram matrix: matches a numpy reference exactly,
    partitioning-invariant, and the overflow tripwire fires."""
    import ray.data

    from warcio_ray.ops.linalg import embedding_gram

    rng = np.random.RandomState(5)
    mat = rng.randn(37, 8).astype(np.float32)
    df = pd.DataFrame({"embedding": [r for r in mat]})

    out = embedding_gram(ray.data.from_pandas(df), scale=1 << 16)
    out2 = embedding_gram(ray.data.from_pandas(df).repartition(5),
                          scale=1 << 16)
    pd.testing.assert_frame_equal(out, out2)

    q = np.floor(mat.astype(np.float64) * (1 << 16) + 0.5).astype(np.int64)
    want = q.T @ q
    got = out["gram"].to_numpy().reshape(8, 8)
    assert (got == want).all()

    # wrap detection: a scale big enough to overflow the diagonal
    big = pd.DataFrame({"embedding": [np.full(4, 100.0, dtype=np.float32)
                                      for _ in range(4)]})
    with pytest.raises(OverflowError):
        embedding_gram(ray.data.from_pandas(big), scale=1 << 31)


def test_pca_project(ray_session):
    """Exact-integer centered PCA: matches a pure-Python reference of
    the same quantized iteration exactly, is partitioning-invariant,
    recovers a planted dominant direction (|cosine| > 0.99 vs the
    numpy eigenvector of the centered covariance), and centering
    makes projections mean-zero up to quantization (sum of proj_q
    over rows is exactly n*(sum q)·v - n*s·v = 0)."""
    import ray.data

    from warcio_ray.ops.linalg import pca_project

    rng = np.random.RandomState(11)
    axis = np.array([3.0, 1.0, -2.0, 0.5, 0.0, 0.0])
    axis /= np.linalg.norm(axis)
    mat = (rng.randn(60, 1) * 2.0) @ axis[None, :] \
        + rng.randn(60, 6) * 0.05 + 0.3   # offset exercises centering
    mat = mat.astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(60, dtype="int64"),
                       "embedding": [r for r in mat]})

    scale, iters, rb = 1 << 8, 8, 13
    outs, vs = [], []
    for nparts in (1, 5):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out, v = pca_project(ds, scale=scale, iters=iters,
                             renorm_bits=rb)
        outs.append(out.to_pandas().sort_values("vec_id")
                    .reset_index(drop=True))
        vs.append(v)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert vs[0] == vs[1]
    out, v = outs[0], vs[0]

    # pure-Python reference of the identical iteration
    q = np.floor(mat.astype(np.float64) * scale + 0.5).astype(np.int64)
    n, d = q.shape
    G = (q.T @ q).tolist()
    s = q.sum(axis=0).tolist()
    C = [[n * G[i][j] - s[i] * s[j] for j in range(d)]
         for i in range(d)]
    vr = [1] * d
    for _ in range(iters):
        w = [sum(C[i][j] * vr[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        if m == 0:
            break
        qd = (m >> rb) + 1
        vr = [(-((-x) // qd) if x < 0 else x // qd) for x in w]
    assert v == vr
    sv = sum(s[i] * vr[i] for i in range(d))
    want = n * (q @ np.array(vr, dtype=np.int64)) - sv
    assert (out["proj_q"].to_numpy() == want).all()

    # direction sanity: aligns with the true top eigenvector
    X = mat.astype(np.float64) - mat.astype(np.float64).mean(axis=0)
    evals, evecs = np.linalg.eigh(X.T @ X)
    top = evecs[:, -1]
    va = np.array(v, dtype=np.float64)
    cos = abs(va @ top) / np.linalg.norm(va)
    assert cos > 0.99, cos

    # exact mean-zero: sum over rows of n*(q_i.v) - s.v = 0
    assert int(out["proj_q"].sum()) == 0

    # overflow tripwire on the distributed projection bound
    with pytest.raises(OverflowError):
        pca_project(ray.data.from_pandas(df), scale=1 << 30,
                    renorm_bits=40)


def _bpe_reference(word_counts, n_merges):
    """From-first-principles BPE trainer (independent of ops/bpe.py
    internals) for equivalence checking."""
    vocab = {tuple(w) + ("</w>",): c for w, c in word_counts.items()}
    merges = []
    for rank in range(n_merges):
        pairs = {}
        for sym, c in vocab.items():
            for p in zip(sym, sym[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (l, r), cnt = best
        merges.append((rank, l, r, cnt))
        new = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new[t] = new.get(t, 0) + c
        vocab = new
    return merges


def test_train_bpe(ray_session):
    """BPE trainer: equals an independent reference on the collected
    word counts, partitioning-invariant, encode round-trips."""
    import ray.data

    from warcio_ray.ops.bpe import encode_bpe_batch, train_bpe

    rng = np.random.RandomState(9)
    words = ["lower", "lowest", "newer", "newest", "wider", "low", "new"]
    docs = [" ".join(rng.choice(words, size=12)) for _ in range(60)]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype="int64"),
                       "text": docs})

    out = train_bpe(ray.data.from_pandas(df), n_merges=12)
    out2 = train_bpe(ray.data.from_pandas(df).repartition(7), n_merges=12)
    pd.testing.assert_frame_equal(out, out2)

    wc = {}
    for d in docs:
        for w in d.split():
            wc[w] = wc.get(w, 0) + 1
    want = _bpe_reference(wc, 12)
    assert [tuple(r) for r in out.itertuples(index=False)] == want

    # encode: token counts are positive, bounded by char count + words,
    # and identical across partitionings
    import functools
    enc = ray.data.from_pandas(df).map_batches(
        functools.partial(encode_bpe_batch, merges_df=out),
        batch_format="pandas").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (enc["n_bpe_tokens"] > 0).all()
    # with 12 merges over this tiny vocab every word compresses below
    # its character count
    assert (enc["n_bpe_tokens"] < enc["n_chars"]).all()

    # vocab_cap accounting fires
    with pytest.warns(RuntimeWarning, match="vocab_cap"):
        train_bpe(ray.data.from_pandas(df), n_merges=2, vocab_cap=3)


def test_shuffle_order(ray_session):
    """Deterministic shuffle rank: a permutation of 0..n-1, equal to a
    brute-force (md5, id) argsort, partitioning-invariant, and actually
    'shuffled' (not the identity order)."""
    import hashlib

    import ray.data

    from warcio_ray.ops.textstats import shuffle_order

    ids = np.arange(777, dtype="int64")
    df = pd.DataFrame({"doc_id": ids})

    out = shuffle_order(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    out2 = shuffle_order(ray.data.from_pandas(df).repartition(11),
                         bucket_bits=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)  # bucket_bits-invariant too

    h = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                  for i in ids], dtype="int64")
    order = np.lexsort((ids, h))
    want = np.empty(len(ids), dtype="int64")
    want[order] = np.arange(len(ids))
    got = out["shuffle_rank"].to_numpy()
    assert (got == want).all()
    assert sorted(got) == list(range(len(ids)))
    assert (got != np.arange(len(ids))).any()


def test_kmeans_exact(ray_session):
    """Exact-integer Lloyd: matches an in-process numpy reference
    bit-for-bit, partitioning-invariant, and an emptied cluster keeps
    its previous centroid (duplicate seed vectors tie to the lowest
    cluster, starving the other)."""
    import ray.data

    from warcio_ray.ops.kmeans import kmeans_exact

    rng = np.random.RandomState(21)
    mat = np.concatenate([rng.randn(40, 6) + 5, rng.randn(40, 6) - 5]) \
        .astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(80, dtype="int64"),
                       "embedding": [r for r in mat]})

    out = kmeans_exact(ray.data.from_pandas(df), k=3, iters=3) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    out2 = kmeans_exact(ray.data.from_pandas(df).repartition(7),
                        k=3, iters=3) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)

    # in-process reference with identical integer rules
    scale = 1 << 16
    q = np.floor(mat.astype(np.float64) * scale + 0.5).astype(np.int64)
    cents = q[:3].copy()
    for _ in range(3):
        diff = q[:, None, :] - cents[None, :, :]
        cl = np.argmin((diff * diff).sum(axis=2), axis=1)
        for g in range(3):
            m = q[cl == g]
            if len(m):
                cents[g] = m.sum(axis=0) // len(m)
    diff = q[:, None, :] - cents[None, :, :]
    want = np.argmin((diff * diff).sum(axis=2), axis=1)
    assert (out["cluster"].to_numpy() == want).all()

    # empty-cluster path: both seeds are the zero vector, so EVERY
    # point ties into cluster 0 on iteration 1 (lowest-id tie-break)
    # and cluster 1 goes empty — it must keep its zero centroid
    # (not divide by zero), which then wins the zero points back on
    # iteration 2 while cluster 0's centroid has moved to the mean
    dup = pd.DataFrame({
        "vec_id": np.arange(6, dtype="int64"),
        "embedding": [np.zeros(3, dtype=np.float32),
                      np.zeros(3, dtype=np.float32)] +
                     [np.full(3, 9.0, dtype=np.float32)] * 4})
    got = kmeans_exact(ray.data.from_pandas(dup), k=2, iters=2) \
        .to_pandas().sort_values("vec_id")
    assert got["cluster"].tolist() == [1, 1, 0, 0, 0, 0]


def test_postings_layout(ray_session, tmp_path):
    """Inverted-index layout: lookup equals a brute-force postings
    computation, only probe buckets are read (pruning is observable in
    which partition dirs exist/are touched), _DONE skips rebuilds."""
    import os

    import ray.data

    from warcio_ray.ops.search import (
        _term_bucket,
        build_postings_layout,
        postings_lookup,
    )

    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(50)]
    docs = [" ".join(rng.choice(vocab, size=30)) for _ in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype="int64"),
                       "text": docs})
    out_dir = str(tmp_path / "postings")

    build_postings_layout(ray.data.from_pandas(df), out_dir, n_buckets=8)
    assert os.path.exists(os.path.join(out_dir, "_DONE"))
    mtime = os.path.getmtime(os.path.join(out_dir, "_DONE"))
    build_postings_layout(ray.data.from_pandas(df), out_dir, n_buckets=8)
    assert os.path.getmtime(os.path.join(out_dir, "_DONE")) == mtime

    probes = ["w0", "w7", "w33", "absent"]
    got = postings_lookup(out_dir, probes, n_buckets=8)

    want_rows = []
    for i, d in enumerate(docs):
        vc = {}
        for t in d.split():
            vc[t] = vc.get(t, 0) + 1
        for t in probes:
            if t in vc:
                want_rows.append((t, i, vc[t]))
    want = pd.DataFrame(want_rows, columns=["term", "doc_id", "tf"]) \
        .sort_values(["term", "doc_id"]).reset_index(drop=True) \
        .astype({"doc_id": "int64", "tf": "int64"})
    pd.testing.assert_frame_equal(got, want)

    # pruning: a probe set confined to one bucket reads only that dir
    one = [t for t in vocab if _term_bucket(t, 8) == 3][:2]
    assert one
    got_one = postings_lookup(out_dir, one, n_buckets=8)
    assert set(got_one["term"]) <= set(one)


def test_corpus_card(ray_session):
    """Datasheet metrics: exact values on a hand-built corpus with
    planted duplicates and a null, partitioning-invariant."""
    import ray.data

    from warcio_ray.pipelines.report import corpus_card

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "text": ["a b c", "a b c", "x", None, "y z", "a b c"],
        "lang": ["en", "en", "de", "fr", "de", "en"]})
    out = corpus_card(ray.data.from_pandas(df))
    out2 = corpus_card(ray.data.from_pandas(df).repartition(5))
    pd.testing.assert_frame_equal(out, out2)

    got = dict(zip(out["metric"], out["value"]))
    # texts: "a b c" x3, "x", "" (null), "y z" -> 4 distinct, 2 dups
    assert got == {"dup_docs": 2, "n_docs": 6, "n_langs": 3,
                   # token counts sorted: 0,1,2,3,3,3 -> rank ceil(3)=3
                   # -> value 2? cum: 0:1,1:1,2:1,3:3 -> rank 3 -> 2
                   "p50_tokens": 2,
                   "total_chars": 5 + 5 + 1 + 0 + 3 + 5,
                   "total_tokens": 3 + 3 + 1 + 0 + 2 + 3}


def test_temperature_sample(ray_session):
    """Flattening rebalance: smallest group keeps everything, larger
    groups keep ~sqrt(cmin*c) rows, deterministic across partitionings
    and exactly the md5 threshold rule."""
    import hashlib
    import math

    import ray.data

    from warcio_ray.ops.textstats import temperature_sample

    rng = np.random.RandomState(17)
    langs = ["en"] * 900 + ["de"] * 100 + ["fr"] * 25
    df = pd.DataFrame({"doc_id": np.arange(len(langs), dtype="int64"),
                       "lang": langs})
    out = temperature_sample(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    out2 = temperature_sample(ray.data.from_pandas(df).repartition(7)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)

    counts = {"en": 900, "de": 100, "fr": 25}
    kept = out.groupby("lang").size().to_dict()
    assert kept["fr"] == 25  # cmin group keeps all rows
    for lang, c in counts.items():
        t = int(math.floor(math.sqrt(25 / c) * (1 << 32)))
        want = sum(1 for i, l in enumerate(langs) if l == lang and
                   int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) < t)
        assert kept.get(lang, 0) == want
    # the head flattened: en keep-rate ~ sqrt(25/900) ~ 1/6
    assert 100 < kept["en"] < 200


def test_block_aggregate_helpers(ray_session):
    """tree_aggregate == pandas reference (incl. null keys, sums+maxs);
    arrow_blocks preserves rows/schema and feeds aggregate correctly."""
    import ray.data
    from ray.data.aggregate import Sum

    from warcio_ray.ops.blocks import arrow_blocks, tree_aggregate

    rng = np.random.RandomState(2)
    df = pd.DataFrame({
        "k": pd.array([None if i % 7 == 0 else i % 5
                       for i in range(200)], dtype="Int64"),
        "v": rng.randint(0, 100, 200).astype("int64"),
        "w": rng.randint(0, 100, 200).astype("int64")})

    got = tree_aggregate(ray.data.from_pandas(df).repartition(6),
                         ["k"], sums=("v",), maxs=("w",), fanout=3)
    want = df.groupby("k", dropna=False, as_index=False) \
        .agg({"v": "sum", "w": "max"})
    got = got.sort_values("k", na_position="last").reset_index(drop=True)
    want = want.sort_values("k", na_position="last").reset_index(drop=True)
    assert (got["v"].to_numpy() == want["v"].to_numpy()).all()
    assert (got["w"].to_numpy() == want["w"].to_numpy()).all()

    dfi = df.dropna().astype({"k": "int64"})
    agg = arrow_blocks(ray.data.from_pandas(dfi).repartition(4)) \
        .groupby("k").aggregate(Sum("v", alias_name="v")).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    wanti = dfi.groupby("k", as_index=False)["v"].sum() \
        .sort_values("k").reset_index(drop=True)
    assert (agg["v"].to_numpy() == wanti["v"].to_numpy()).all()


def test_paragraph_dedup_matches_brute_force(ray_session):
    import ray.data

    from warcio_ray.ops.dedup import paragraph_dedup

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["alpha\n\nshared one\n\nbeta",
                 "shared one\n\ngamma\n\nshared two",
                 "shared two\n\nshared one",   # every para owned elsewhere
                 "",                            # empty doc = [''] paragraph
                 "delta\n\n\n\nalpha"],        # empty para + dup of alpha
    })
    first: dict = {}
    for _, r in docs.iterrows():
        for i, p in enumerate(r.text.split("\n\n")):
            first.setdefault(p, (r.doc_id, i))
    expect = pd.DataFrame({
        "doc_id": docs.doc_id,
        "text": ["\n\n".join(
            p for i, p in enumerate(r.text.split("\n\n"))
            if first[p] == (r.doc_id, i)) for _, r in docs.iterrows()]})

    # partitioning-invariant: winner rule is a global integer min
    for nb in (1, 3):
        ds = ray.data.from_pandas(docs).repartition(nb)
        got = paragraph_dedup(ds).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)
    # doc 2 (all paragraphs owned elsewhere) survives as an empty row
    assert expect.loc[expect.doc_id == 2, "text"].iloc[0] == ""


def test_paragraph_dedup_regex_metachar_sep(ray_session):
    """A sep containing regex metacharacters must split LITERALLY in
    both the explode and rebuild stages (ADVICE r3: pandas str.split
    treats multi-char seps as regexes by default, desyncing the two)."""
    import ray.data

    from warcio_ray.ops.dedup import paragraph_dedup

    sep = ". "  # '.' is a regex metachar: regex split would break on
    # EVERY char followed by a space
    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": [f"alpha x{sep}shared y{sep}beta z",
                 f"shared y{sep}gamma q"],
    })
    first: dict = {}
    for _, r in docs.iterrows():
        for i, p in enumerate(r.text.split(sep)):
            first.setdefault(p, (r.doc_id, i))
    expect = pd.DataFrame({
        "doc_id": docs.doc_id,
        "text": [sep.join(
            p for i, p in enumerate(r.text.split(sep))
            if first[p] == (r.doc_id, i)) for _, r in docs.iterrows()]})
    got = paragraph_dedup(ray.data.from_pandas(docs), sep=sep) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)
    # the dup paragraph really was removed from doc 1
    assert got.loc[got.doc_id == 1, "text"].iloc[0] == "gamma q"


def test_exact_float_quantiles_matches_sorted_rank(ray_session):
    import ray.data

    from warcio_ray.ops.quantile import exact_float_quantiles

    rng = np.random.default_rng(7)
    vals = np.concatenate([rng.normal(0, 1000, 20000),
                           rng.uniform(-5, 5, 5000),
                           [0.0, -0.0] * 3, [np.inf, -np.inf] * 2,
                           rng.normal(1e12, 1, 100)])
    df = pd.DataFrame({"x": vals})
    df.loc[::997, "x"] = np.nan  # excluded, like SQL nulls
    clean = np.sort(df["x"].to_numpy()[~np.isnan(df["x"].to_numpy())])
    n = len(clean)
    pcts = (1, 10, 25, 50, 75, 90, 99, 100)
    expect = {p: clean[(p * n + 99) // 100 - 1] for p in pcts}

    for nb in (1, 5):  # partitioning-invariant (integer rank rule)
        out = exact_float_quantiles(
            ray.data.from_pandas(df).repartition(nb), "x", pcts=pcts)
        got = dict(zip(out["pct"], out["value"]))
        assert got == expect

    empty = ray.data.from_pandas(
        pd.DataFrame({"x": pd.Series([], dtype="float64")}))
    assert len(exact_float_quantiles(empty, "x")) == 0


def test_dsir_weights_favor_target_domain(ray_session):
    import ray.data

    from warcio_ray.ops.dsir import dsir_weights

    # target docs (even ids) share a distinctive vocabulary
    docs = pd.DataFrame({
        "doc_id": range(20),
        "text": ["quantum flux capacitor entangled qubit " * 3
                 if i % 2 == 0 else
                 "mundane grocery list milk bread eggs " * 3
                 for i in range(20)]})
    docs.loc[19, "text"] = ""  # no-feature doc -> (0, 0)

    outs = []
    for nb in (1, 4):  # integer sums -> partitioning-invariant
        ds = ray.data.from_pandas(docs).repartition(nb)
        out = dsir_weights(
            ds, target_mask=lambda ids: (ids.to_numpy() % 2 == 0)) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])

    out = outs[0]
    tgt = out[out.doc_id % 2 == 0]
    non = out[(out.doc_id % 2 == 1) & (out.n_features > 0)]
    # mean log-ratio: target vocabulary scores strictly higher
    assert (tgt.iw / tgt.n_features).mean() > (non.iw / non.n_features).mean()
    empty = out[out.doc_id == 19].iloc[0]
    assert empty.iw == 0 and empty.n_features == 0


def test_pq_matches_inprocess_reference(ray_session):
    import ray.data

    from warcio_ray.ops.pq import pq_adc_topk, pq_train_encode

    rng = np.random.default_rng(3)
    n, d, m, k, iters, scale = 120, 64, 4, 16, 2, 1 << 16
    vecs = rng.normal(0, 1, (n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n),
                       "embedding": [v.tolist() for v in vecs]})

    # from-first-principles reference of the exact-integer chain
    q = np.floor(vecs.astype(np.float64) * scale + 0.5).astype(np.int64)
    dsub = d // m
    q3 = q.reshape(n, m, dsub)
    cents = q[:k].reshape(k, m, dsub).transpose(1, 0, 2).copy()

    def assign(c):
        diff = q3[:, :, None, :] - c[None]
        return np.argmin((diff * diff).sum(3), axis=2)

    for _ in range(iters):
        codes = assign(cents)
        new = cents.copy()
        for s in range(m):
            for g in range(k):
                mem = q3[codes[:, s] == g, s]
                if len(mem):
                    new[s, g] = mem.sum(0) // len(mem)
        cents = new
    ref_codes = assign(cents)
    table = ((q3[0][:, None, :] - cents) ** 2).sum(2)
    adc = sum(table[s][ref_codes[:, s]] for s in range(m))
    ref_top = np.lexsort((np.arange(n), adc))[:10]

    for nb in (1, 4):  # bitwise-identical at any parallelism
        ds = ray.data.from_pandas(df).repartition(nb)
        codes_ds, got_cents = pq_train_encode(ds, m=m, k=k, iters=iters)
        assert (got_cents == cents).all()
        got = codes_ds.to_pandas().sort_values("vec_id") \
            .reset_index(drop=True)
        assert (got[[f"code_{s}" for s in range(m)]].to_numpy()
                == ref_codes).all()
        top = pq_adc_topk(codes_ds, got_cents, vecs[0])
        assert list(top["vec_id"]) == list(ref_top)
        assert list(top["adc"]) == [int(adc[i]) for i in ref_top]


def test_pq_fewer_vectors_than_codewords(ray_session):
    """n < k corpora must train (seed padded by repeating the last
    row) instead of crashing on the (k, m, dsub) reshape (ADVICE r3)."""
    import ray.data

    from warcio_ray.ops.pq import pq_adc_topk, pq_train_encode

    rng = np.random.default_rng(5)
    n, d, m, k = 6, 16, 4, 16  # n far below k
    vecs = rng.normal(0, 1, (n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n),
                       "embedding": [v.tolist() for v in vecs]})
    for nb in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nb)
        codes_ds, cents = pq_train_encode(ds, m=m, k=k, iters=2)
        assert cents.shape == (m, k, d // m)
        got = codes_ds.to_pandas().sort_values("vec_id") \
            .reset_index(drop=True)
        assert len(got) == n
        codes = got[[f"code_{s}" for s in range(m)]].to_numpy()
        assert ((codes >= 0) & (codes < k)).all()
        # ADC search still ranks the query's own vector first
        top = pq_adc_topk(codes_ds, cents, vecs[2], k_top=3)
        assert list(top["vec_id"])[0] == 2


def test_anchor_stats_aggregates_labels(ray_session):
    import pyarrow as pa
    import ray.data

    from warcio_ray.html import render_page
    from warcio_ray.ops.graph import anchor_stats

    # three pages; page T is linked twice with label 'link 0' (from
    # pages 1 and 2) and once with 'link 1' (page 2's second link)
    htmls = [
        render_page("t", "http://t/", "en", 0, []),
        render_page("a", "http://a/", "en", 1, ["http://t/"]),
        render_page("b", "http://b/", "en", 2,
                     ["http://other/", "http://t/"]),
    ]
    ds = ray.data.from_arrow(pa.table({
        "html": pa.array(htmls, pa.large_binary())}))
    out = anchor_stats(ds).to_pandas().set_index("url")
    t = out.loc["http://t/"]
    assert t.n_anchors == 2 and t.n_distinct_anchors == 2
    assert t.min_anchor == "link 0"
    o = out.loc["http://other/"]
    assert o.n_anchors == 1 and o.min_anchor == "link 0"


def test_repetition_signals_known_values(ray_session):
    import ray.data

    from warcio_ray.ops.textstats import repetition_signals_batch

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["spam ham spam ham spam ham",  # 'ham spam' x2, 'spam ham' x3
                 "all words here are unique tokens",
                 ""]})
    out = ray.data.from_pandas(docs) \
        .map_batches(repetition_signals_batch, batch_format="pandas") \
        .to_pandas().set_index("doc_id")

    r0 = out.loc[0]
    assert r0.top2_gram == "spam ham" and r0.top2_count == 3
    assert r0.top2_char_frac == 3 * len("spam ham") / len(docs.text[0])
    # 'spam ham spam' x2 and 'ham spam ham' x2 are the duplicate 3-grams
    assert r0.dup3_char_frac == (2 * 13 + 2 * 12) / len(docs.text[0])
    r1 = out.loc[1]
    assert r1.top2_count == 1 and r1.dup3_char_frac == 0.0
    r2 = out.loc[2]
    assert r2.top2_count == 0 and r2.top2_gram == "" \
        and r2.top2_char_frac == 0.0


def test_ivfpq_full_probe_equals_exact_and_recall(ray_session):
    import ray.data

    from warcio_ray.ops.pq import ivfpq_topk

    rng = np.random.default_rng(11)
    n, d, scale = 300, 64, 1 << 16
    centers = rng.normal(0, 5, (4, d))
    vecs = (centers[rng.integers(0, 4, n)]
            + rng.normal(0, 1, (n, d))).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n),
                       "embedding": [v.tolist() for v in vecs]})
    query = vecs[7]

    q = np.floor(vecs.astype(np.float64) * scale + 0.5).astype(np.int64)
    qq = np.floor(query.astype(np.float64) * scale + 0.5).astype(np.int64)
    dist = ((q - qq[None, :]) ** 2).sum(1)
    exact = np.lexsort((np.arange(n), dist))[:10]

    for nb in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nb)
        # full probe + corpus shortlist reduces to exact quantized L2
        full = ivfpq_topk(ds, query, nprobe=4, shortlist=n, k_top=10)
        assert list(full["vec_id"]) == list(exact)
        assert list(full["dist"]) == [int(dist[i]) for i in exact]
        # clustered data: probing 1 of 4 clusters keeps most of top-10
        approx = ivfpq_topk(ds, query, nprobe=1, shortlist=32, k_top=10)
        assert len(set(approx["vec_id"]) & set(exact)) / 10 >= 0.6


def test_float_sort_keys_order_preserving_property():
    """Property: the uint64 sort key order equals IEEE float order,
    including subnormals, signed zeros and infinities (no Ray)."""
    from hypothesis import given, settings, strategies as st

    from warcio_ray.ops.quantile import _float_sort_keys

    floats = st.floats(allow_nan=False, width=64,
                       allow_subnormal=True)

    @settings(max_examples=300, deadline=None)
    @given(st.lists(floats, min_size=2, max_size=50))
    def check(vals):
        arr = np.array(vals, dtype=np.float64)
        keys = _float_sort_keys(arr)
        order_f = np.argsort(arr, kind="stable")
        order_k = np.argsort(keys, kind="stable")
        # equal floats (e.g. -0.0 vs 0.0) may permute within ties:
        # compare the VALUE sequences, not the index orders
        assert list(arr[order_f]) == list(arr[order_k]) or \
            all(a == b for a, b in zip(arr[order_f], arr[order_k]))

    check()


def test_lsh_layout_pruned_lookup(ray_session, tmp_path):
    import ray.data

    from warcio_ray.ops.dedup import build_lsh_layout, lsh_layout_neardups

    base = " ".join(f"tok{i}" for i in range(50))
    docs = pd.DataFrame({
        "doc_id": range(8),
        "text": [base,
                 base.replace("tok49", "x"),
                 "totally different words entirely " * 6,
                 base.replace("tok0", "y"),
                 "another unrelated document with its own phrasing " * 4,
                 base,                       # exact dup of 0
                 "short one",
                 "short one two"]})
    ds = ray.data.from_pandas(docs)
    layout = build_lsh_layout(ds, str(tmp_path / "lsh"))
    probes = docs[docs.doc_id.isin([0, 2, 6])]
    out = lsh_layout_neardups(layout, probes, ds, threshold=0.5)
    assert set(map(tuple, out[["a", "b"]].to_numpy())) \
        == {(0, 1), (0, 3), (0, 5)}
    assert out.attrs["lsh_dropped_candidates"] == 0
    # marker-gated rebuild skip; param mismatch forces a rebuild error
    assert build_lsh_layout(ds, str(tmp_path / "lsh")) \
        == str(tmp_path / "lsh")
    # empty probe set degrades to a typed empty result
    empty = lsh_layout_neardups(layout, probes.iloc[:0], ds)
    assert len(empty) == 0 and list(empty.columns) == ["a", "b"]


def test_lsh_append_dedup(ray_session, tmp_path):
    """Incremental LSH: fresh docs append to the standing layout and
    dedup against it — fresh-vs-standing AND fresh-vs-fresh pairs are
    found, unrelated fresh docs yield nothing, self-pairs are
    excluded, and mismatched layout params are rejected."""
    import pytest
    import ray.data

    from warcio_ray.ops.dedup import (append_lsh_layout,
                                      build_lsh_layout,
                                      lsh_append_dedup)

    base = " ".join(f"tok{i}" for i in range(50))
    docs = pd.DataFrame({
        "doc_id": range(4),
        "text": [base,
                 "totally different words entirely " * 6,
                 base.replace("tok0", "y"),
                 "another unrelated document with its own phrasing " * 4,
                 ]})
    ds = ray.data.from_pandas(docs)
    layout = build_lsh_layout(ds, str(tmp_path / "lsh"))

    fresh = pd.DataFrame({
        "doc_id": [100, 101, 102],
        "text": [base + " fresh",        # near-dup of 0 (and 2)
                 base + " fresh",        # exact dup of 100 (fresh-fresh)
                 "completely novel fresh content nothing shared"]})
    fresh_ds = ray.data.from_pandas(fresh)
    append_lsh_layout(fresh_ds, layout)

    union_ds = ds.union(fresh_ds)
    pairs, dropped = lsh_append_dedup(layout, fresh_ds, union_ds,
                                      threshold=0.5)
    got = set(map(tuple, pairs.to_pandas()[["a", "b"]].to_numpy()))
    assert got == {(0, 100), (0, 101), (2, 100), (2, 101), (100, 101)}
    assert dropped == 0

    # params mismatch on append is an error, not a silent no-op
    with pytest.raises(ValueError, match="params"):
        append_lsh_layout(fresh_ds, layout, num_perm=32)
    # missing layout is an error
    with pytest.raises(ValueError, match="no completed"):
        append_lsh_layout(fresh_ds, str(tmp_path / "nope"))


def test_bigram_nll_exact_and_invariant(ray_session):
    import math

    import ray.data

    from warcio_ray.ops.textstats import bigram_nll_scores

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b a b c",
                 "b a b a",
                 "z",            # single token -> (0, 0)
                 "c c c c c c"]})
    # from-first-principles reference (vocab = all 4 terms, no OOV hit)
    toks = [t.split() for t in docs.text]
    from collections import Counter
    term_counts = Counter(w for ts in toks for w in ts)
    vocab = sorted(term_counts, key=lambda w: (-term_counts[w], w))
    wid = {w: i for i, w in enumerate(vocab)}
    n_ids = len(vocab) + 1
    bi = Counter((wid[a], wid[b]) for ts in toks
                 for a, b in zip(ts, ts[1:]))
    cv = Counter()
    for (v, _), c in bi.items():
        cv[v] += c
    scale = float(1 << 32)

    def q(v, w):
        return math.floor(-math.log((bi.get((v, w), 0) + 1.0)
                                    / (cv[v] + n_ids)) * scale + 0.5)

    expect = {}
    for d, ts in zip(docs.doc_id, toks):
        prs = [(wid[a], wid[b]) for a, b in zip(ts, ts[1:])]
        expect[d] = (sum(q(v, w) for v, w in prs), len(prs))

    outs = []
    for nb in (1, 3):
        out = bigram_nll_scores(
            ray.data.from_pandas(docs).repartition(nb),
            vocab_size=1024).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
        for _, r in out.iterrows():
            assert (r.nll_q, r.n_bigrams) == expect[r.doc_id]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_semdedup(ray_session):
    """SemDeDup: planted near-copies are removed with dup_of = their
    source id, distinct vectors survive, partitioning-invariant, and
    an over-cap cluster truncates to the cap smallest ids with a
    RuntimeWarning."""
    import ray.data

    from warcio_ray.ops.semdedup import semdedup

    rng = np.random.RandomState(5)
    base = rng.randn(30, 8).astype(np.float64) / 4
    vecs = [r for r in base]
    ids = list(range(30))
    for i in range(0, 30, 3):  # plant near-copies of every 3rd vector
        vecs.append(base[i] * 1.0005 + 0.00005)
        ids.append(1000 + i)
    df = pd.DataFrame({"vec_id": pd.Series(ids, dtype="int64"),
                       "embedding": vecs})

    out = semdedup(ray.data.from_pandas(df), k=4, iters=2) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    out2 = semdedup(ray.data.from_pandas(df).repartition(9), k=4,
                    iters=2) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)

    planted = out[out["vec_id"] >= 1000]
    assert len(planted) == 10
    assert (planted["dup_of"].to_numpy()
            == planted["vec_id"].to_numpy() - 1000).all()
    # the 30 base vectors are independent gaussians: none removed
    assert (out["vec_id"] >= 1000).all()

    # cap path: 6 identical vectors in one tight cluster, cap=3 keeps
    # ids 0..2 => only ids 1,2 are removable (dup_of=0); 3..5 dropped
    # from the pair test entirely
    same = pd.DataFrame({
        "vec_id": pd.Series(range(6), dtype="int64"),
        "embedding": [np.full(4, 0.3)] * 6})
    with pytest.warns(RuntimeWarning, match="beyond cap"):
        capped = semdedup(ray.data.from_pandas(same), k=2, iters=1,
                          cap=3).to_pandas().sort_values("vec_id")
    assert capped["vec_id"].tolist() == [1, 2]
    assert capped["dup_of"].tolist() == [0, 0]


def test_naive_bayes_train_predict(ray_session):
    """NB train+predict: separable two-class vocab classifies
    perfectly, scores are partitioning-invariant, margin matches an
    in-process float-free recomputation, single-label input raises."""
    import ray.data

    from warcio_ray.ops.classify import naive_bayes_train_predict

    rows = []
    for i in range(40):
        good = i % 2 == 0
        words = (["alpha", "beta", "gamma"] if good
                 else ["delta", "epsilon", "zeta"])
        rows.append({"doc_id": i,
                     "text": " ".join(words * (2 + i % 3)),
                     "lang": "g" if good else "b"})
    df = pd.DataFrame(rows)

    out = naive_bayes_train_predict(ray.data.from_pandas(df),
                                    vocab_size=16) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    out2 = naive_bayes_train_predict(
        ray.data.from_pandas(df).repartition(7), vocab_size=16) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)

    assert (out["pred"] == out["lang"]).all()
    assert (out["margin_q"] > 0).all()

    # in-process reference for one doc: exact integer recompute
    vocab_counts = {}
    for _, r in df.iterrows():
        for w in r.text.split():
            vocab_counts[w] = vocab_counts.get(w, 0) + 1
    terms = sorted(vocab_counts, key=lambda t: (-vocab_counts[t], t))[:16]
    V = len(terms)
    labels = ["b", "g"]
    cnt = {(g, t): 0 for g in labels for t in terms}
    docs = {g: 0 for g in labels}
    for _, r in df.iterrows():
        docs[r.lang] += 1
        for w in r.text.split():
            if w in terms:
                cnt[(r.lang, w)] += 1
    ltot = {g: sum(cnt[(g, t)] for t in terms) for g in labels}
    q = {(g, t): int(np.floor(np.log((cnt[(g, t)] + 1.0)
                                     / (ltot[g] + V))
                              * float(1 << 32) + 0.5))
         for g in labels for t in terms}
    lp = {g: int(np.floor(np.log(docs[g] / len(df))
                          * float(1 << 32) + 0.5)) for g in labels}
    r0 = df.iloc[0]
    scores = {g: lp[g] + sum(q[(g, w)] for w in r0.text.split()
                             if w in terms) for g in labels}
    want_margin = abs(scores["g"] - scores["b"])
    assert int(out.iloc[0]["margin_q"]) == want_margin

    with pytest.raises(ValueError, match=">= 2 labels"):
        naive_bayes_train_predict(
            ray.data.from_pandas(df.assign(lang="g")), vocab_size=16)


def test_hashed_kl_drift(ray_session):
    """KL drift: partitioning-invariant, zero drift for a group whose
    distribution IS the corpus (two identical groups -> tiny symmetric
    kl), and a divergent group scores strictly higher."""
    import ray.data

    from warcio_ray.ops.dsir import hashed_kl_drift

    same = ["tok%d" % (i % 7) for i in range(7)]
    rows = []
    for i in range(30):
        rows.append({"doc_id": i, "lang": "a" if i % 2 else "b",
                     "text": " ".join(same)})
    for i in range(30, 45):  # group c: disjoint vocabulary
        rows.append({"doc_id": i, "lang": "c",
                     "text": "zzz yyy xxx www vvv uuu ttt"})
    df = pd.DataFrame(rows)

    out = hashed_kl_drift(ray.data.from_pandas(df))
    out2 = hashed_kl_drift(ray.data.from_pandas(df).repartition(9))
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  out2.reset_index(drop=True))

    by = out.set_index("lang")
    # a and b share one distribution -> equal kl; the disjoint-vocab
    # group diverges further from the corpus mixture than either
    assert by.loc["a", "kl_q"] == by.loc["b", "kl_q"]
    assert by.loc["c", "kl_q"] > by.loc["a", "kl_q"]
    assert (out["kl"] == out["kl_q"] / float(1 << 40)).all()
    assert by.loc["c", "n_tokens"] == 15 * 7

    # a single-group corpus IS the corpus: p == q gives exactly 0
    # (every term is floor(p*ln(1)*2^40 + 0.5) = 0)
    solo = hashed_kl_drift(
        ray.data.from_pandas(df[df["lang"] == "a"]))
    assert solo["kl_q"].tolist() == [0]


def test_export_packed(ray_session):
    """Composed export: bins cover the shuffled survivor stream with no
    gaps or overlaps, every bin except the last is exactly full,
    duplicate and low-quality docs are gone, partitioning-invariant."""
    import ray.data

    from warcio_ray.pipelines.export import export_packed

    good = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi")
    rows = [{"doc_id": i, "text": good + f" uniq{i} " + good}
            for i in range(24)]
    rows.append({"doc_id": 100, "text": rows[0]["text"]})  # exact dup
    rows.append({"doc_id": 101, "text": "short"})          # low quality
    df = pd.DataFrame(rows)

    out = export_packed(ray.data.from_pandas(df), window=32) \
        .to_pandas().sort_values(["bin_id", "bin_off"]) \
        .reset_index(drop=True)
    out2 = export_packed(ray.data.from_pandas(df).repartition(9),
                         window=32) \
        .to_pandas().sort_values(["bin_id", "bin_off"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)

    assert set(out["doc_id"]) == set(range(24))  # dup + junk dropped
    total = out["n_tok"].sum()
    assert total == 24 * 45  # 45 words per surviving doc
    # bins tile the stream exactly
    for b, grp in out.groupby("bin_id"):
        grp = grp.sort_values("bin_off")
        assert grp["bin_off"].iloc[0] == 0
        assert (grp["bin_off"].to_numpy()[1:]
                == (grp["bin_off"] + grp["n_tok"]).to_numpy()[:-1]).all()
        width = int((grp["bin_off"] + grp["n_tok"]).iloc[-1])
        assert width == 32 or b == out["bin_id"].max()
    # ranks are a permutation of 0..23
    assert set(out["shuffle_rank"]) == set(range(24))


def test_export_bpe_packed(ray_session):
    """BPE-count export: total packed tokens equal the survivors' BPE
    encode lengths (reference-encoded in process), bins tile exactly,
    partitioning-invariant."""
    import functools

    import ray.data

    from warcio_ray.ops.bpe import encode_bpe_batch, train_bpe
    from warcio_ray.pipelines.export import export_bpe_packed

    good = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi")
    rows = [{"doc_id": i, "text": good + f" uniq{i} " + good}
            for i in range(24)]
    rows.append({"doc_id": 100, "text": rows[0]["text"]})  # exact dup
    rows.append({"doc_id": 101, "text": "short"})          # low quality
    df = pd.DataFrame(rows)

    outs = []
    for nb in (1, 9):
        out = export_bpe_packed(
            ray.data.from_pandas(df).repartition(nb),
            window=32, n_merges=12) \
            .to_pandas().sort_values(["bin_id", "bin_off"]) \
            .reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]

    assert set(out["doc_id"]) == set(range(24))  # dup + junk dropped
    # per-doc packed totals == the model's encode lengths
    merges = train_bpe(ray.data.from_pandas(df[["text"]]), n_merges=12)
    enc = encode_bpe_batch(df[df.doc_id < 24], merges_df=merges)
    want = dict(zip(enc["doc_id"], enc["n_bpe_tokens"]))
    got = out.groupby("doc_id")["n_tok"].sum()
    assert {int(k): int(v) for k, v in got.items()} == want
    # BPE at 12 merges compresses below character count but stays
    # above whitespace count
    assert all(v > 45 for v in want.values())
    # bins tile the stream exactly
    for b, grp in out.groupby("bin_id"):
        grp = grp.sort_values("bin_off")
        assert grp["bin_off"].iloc[0] == 0
        assert (grp["bin_off"].to_numpy()[1:]
                == (grp["bin_off"] + grp["n_tok"]).to_numpy()[:-1]).all()
        width = int((grp["bin_off"] + grp["n_tok"]).iloc[-1])
        assert width == 32 or b == out["bin_id"].max()


def test_trigram_nll_scores(ray_session):
    """Interpolated trigram LM: matches a from-first-principles
    in-process reference exactly, partitioning-invariant, short docs
    score (0, 0), and a repeated (predictable) doc scores below a
    shuffled (surprising) one."""
    import math

    import ray.data

    from warcio_ray.ops.textstats import trigram_nll_scores

    docs = {
        0: "a b c a b c a b c a b c",
        1: "c a b b a c b c a a c b",
        2: "a b",                      # < 3 tokens -> (0, 0)
        3: "d e f d e f d e f",
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})

    outs = []
    for nparts in (1, 5):
        out = trigram_nll_scores(
            ray.data.from_pandas(df).repartition(nparts), vocab_size=8) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]

    # in-process reference with identical rules
    toks = {d: t.split() for d, t in docs.items()}
    counts = {}
    for seq in toks.values():
        for i, w in enumerate(seq):
            counts[(w,)] = counts.get((w,), 0) + 1
            if i + 1 < len(seq):
                counts[(w, seq[i + 1])] = counts.get((w, seq[i + 1]), 0) + 1
            if i + 2 < len(seq):
                k = (w, seq[i + 1], seq[i + 2])
                counts[k] = counts.get(k, 0) + 1
    vocab = sorted({w for s in toks.values() for w in s})
    assert len(vocab) <= 8
    n = len(vocab) + 1
    total = sum(v for k, v in counts.items() if len(k) == 1)
    cv2 = {}
    ctx3 = {}
    for k, v in counts.items():
        if len(k) == 2:
            cv2[k[0]] = cv2.get(k[0], 0) + v
        elif len(k) == 3:
            ctx3[k[:2]] = ctx3.get(k[:2], 0) + v
    for d, seq in toks.items():
        want_q, want_n = 0, 0
        for i in range(2, len(seq)):
            u, v, w = seq[i - 2], seq[i - 1], seq[i]
            p1 = (counts[(w,)] + 1.0) / (total + float(n))
            p2 = (counts.get((v, w), 0) + 1.0) / (cv2[v] + float(n))
            p3 = (counts.get((u, v, w), 0) + 1.0) / (ctx3[(u, v)]
                                                     + float(n))
            q = math.floor(-math.log(0.2 * p1 + 0.3 * p2 + 0.5 * p3)
                           * float(1 << 32) + 0.5)
            want_q += q
            want_n += 1
        row = out[out["doc_id"] == d].iloc[0]
        assert (int(row["nll_q"]), int(row["n_trigrams"])) \
            == (want_q, want_n), d

    # predictable repetition scores lower mean NLL than shuffled text
    r0 = out[out["doc_id"] == 0].iloc[0]
    r1 = out[out["doc_id"] == 1].iloc[0]
    assert r0["nll_q"] / r0["n_trigrams"] < r1["nll_q"] / r1["n_trigrams"]


def test_phash_neardups(ray_session):
    """Perceptual-hash dedup: identical payloads pair (hamming 0),
    1-bit flips pair (hamming 1), >max_hamming flips don't, and the
    banding recall guarantee holds for every <=3-bit perturbation
    position (pigeonhole over 4x16 bands)."""
    import ray.data

    from warcio_ray.ops.multimodal import MediaPhashStage, phash_neardups

    base = np.uint64(0x0123456789ABCDEF)
    rng = np.random.RandomState(3)
    far = rng.randint(0, 2 ** 63, size=20, dtype=np.int64) \
        .astype(np.uint64)  # random: almost surely > 3 bits apart
    sigs = [(0, base), (1, base)]                      # exact dup
    sigs += [(2, base ^ (np.uint64(1) << np.uint64(17)))]   # 1 bit
    sigs += [(3, base ^ np.uint64(0b111))]             # 3 bits
    sigs += [(4, base ^ (np.uint64(0b11111) << np.uint64(32)))]
    # ^ 5 bits flipped, disjoint region: > max_hamming from everything
    sigs += [(10 + i, h) for i, h in enumerate(far)]
    df = pd.DataFrame({"media_id": [s[0] for s in sigs],
                       "phash": np.array([s[1] for s in sigs],
                                         dtype=np.uint64)})

    out = phash_neardups(ray.data.from_pandas(df))
    got = set(zip(out["a"], out["b"]))
    assert {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)} <= got
    assert (2, 3) not in got  # bit 17 vs bits {0,1,2}: hamming 4
    assert not any(4 in p for p in got)

    # every 3-bit perturbation is recalled (banding never loses <=3)
    ids, hashes = [100], [base]
    for j, bits in enumerate([(5,), (5, 21), (5, 21, 47)]):
        h = base
        for b in bits:
            h = h ^ (np.uint64(1) << np.uint64(b))
        ids.append(101 + j)
        hashes.append(h)
    df2 = pd.DataFrame({"media_id": ids,
                        "phash": np.array(hashes, dtype=np.uint64)})
    out2 = phash_neardups(ray.data.from_pandas(df2).repartition(3))
    got2 = set(zip(out2["a"], out2["b"]))
    assert {(100, 101), (100, 102), (100, 103)} <= got2

    # the fake phash stage is deterministic and md5-derived
    import hashlib
    media = pd.DataFrame({"media_id": [7], "payload": [b"hello"]})
    sig = MediaPhashStage()(media)
    assert sig["phash"].iloc[0] == np.uint64(
        int(hashlib.md5(b"hello").hexdigest()[:16], 16))


def test_hits_ds(ray_session):
    """HITS: broadcast and join paths are bit-equal, match an
    in-process integer reference (including the down-shift rule), and
    a pure hub/authority split ranks as expected."""
    import ray.data

    from warcio_ray.ops.graph import hits_ds

    # hubs 0..2 each point at authorities 10..13; node 20 isolated
    edges = [(h, a) for h in (0, 1, 2) for a in (10, 11, 12, 13)]
    edges += [(0, 11), (1, 11)]  # 11 is the strongest authority
    edf = pd.DataFrame({"src": [e[0] for e in edges],
                        "dst": [e[1] for e in edges]})
    nodes = [0, 1, 2, 10, 11, 12, 13, 20]
    ndf = pd.DataFrame({"node": nodes})

    out = hits_ds(ray.data.from_pandas(edf),
                  ray.data.from_pandas(ndf), rounds=2) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    out_join = hits_ds(ray.data.from_pandas(edf).repartition(5),
                       ray.data.from_pandas(ndf), rounds=2,
                       broadcast_max_nodes=0) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out_join)

    # in-process integer reference
    import collections
    h = {n: 1 for n in nodes}
    a = {n: 0 for n in nodes}

    def half(vals, direction):
        acc = collections.defaultdict(int)
        for s, d in edges:
            if direction == "fwd":
                acc[d] += vals[s]
            else:
                acc[s] += vals[d]
        out = {n: acc.get(n, 0) for n in nodes}
        m = max(out.values())
        sh = max(0, int(m).bit_length() - 40)
        return {n: v >> sh for n, v in out.items()}

    for _ in range(2):
        a = half(h, "fwd")
        h = half(a, "bwd")
    by = out.set_index("node")
    for n in nodes:
        assert (int(by.loc[n, "hub_q"]), int(by.loc[n, "auth_q"])) \
            == (h[n], a[n]), n

    assert by.loc[11, "auth_q"] > by.loc[10, "auth_q"]
    assert by.loc[20, "hub_q"] == 0 and by.loc[20, "auth_q"] == 0
    # hubs 0 and 1 (extra edge each) outrank hub 2
    assert by.loc[0, "hub_q"] > by.loc[2, "hub_q"]

    # down-shift actually fires on a dense graph (values would blow up)
    k = 60
    dense = pd.DataFrame(
        {"src": np.repeat(np.arange(k), k),
         "dst": np.tile(np.arange(k), k)})
    nd2 = pd.DataFrame({"node": np.arange(k)})
    big = hits_ds(ray.data.from_pandas(dense),
                  ray.data.from_pandas(nd2), rounds=4) \
        .to_pandas()
    assert (big["hub_q"] < (1 << 41)).all()
    assert (big["hub_q"] > 0).all()


def test_rendezvous_shards(ray_session):
    """HRW sharding: deterministic at any partitioning, balanced-ish,
    and growing n_shards moves ONLY keys won by the new shard (the
    consistent-hashing property mod-n lacks)."""
    import ray.data

    from warcio_ray.ops.textstats import rendezvous_shards

    df = pd.DataFrame({"doc_id": np.arange(800, dtype="int64")})
    a = rendezvous_shards(ray.data.from_pandas(df), n_shards=8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = rendezvous_shards(ray.data.from_pandas(df).repartition(7),
                          n_shards=8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["shard"]) == set(range(8))
    # no shard hogs the corpus (md5 weights are uniform)
    assert a["shard"].value_counts().max() < 800 * 0.3

    grown = rendezvous_shards(ray.data.from_pandas(df), n_shards=9) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    moved = (a["shard"].to_numpy() != grown["shard"].to_numpy())
    # every moved key moved TO the new shard, and ~1/9 of keys moved
    assert (grown["shard"].to_numpy()[moved] == 8).all()
    assert 0.03 < moved.mean() < 0.25


def test_snapshot_delta(ray_session):
    """Recrawl diff: added/removed/changed classified exactly,
    unchanged docs emit nothing, partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.dedup import snapshot_delta

    old = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                        "text": ["a", "b", "c", "d"]})
    new = pd.DataFrame({"doc_id": [2, 3, 4, 9],
                        "text": ["b", "c CHANGED", "d", "fresh"]})
    out = snapshot_delta(ray.data.from_pandas(old),
                         ray.data.from_pandas(new)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    out2 = snapshot_delta(ray.data.from_pandas(old).repartition(3),
                          ray.data.from_pandas(new).repartition(2)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)
    assert list(zip(out["doc_id"], out["status"])) == [
        (1, "removed"), (3, "changed"), (9, "added")]


def test_host_graph(ray_session):
    """Host-level collapse: link multiplicity and distinct-page counts
    aggregate exactly, partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.graph import host_graph

    # host rule: even ids -> a.example, odd -> b.example
    def hosts(ids):
        return np.where(ids % 2 == 0, "a.example", "b.example")

    edges = pd.DataFrame({
        "src": [0, 0, 0, 2, 1, 3],
        "dst": [1, 1, 3, 5, 0, 2]})  # 0->odd x3, 2->odd, 1->even, 3->even
    out = host_graph(ray.data.from_pandas(edges), hosts) \
        .to_pandas().sort_values(["src_host", "dst_host"]) \
        .reset_index(drop=True)
    out2 = host_graph(ray.data.from_pandas(edges).repartition(4), hosts) \
        .to_pandas().sort_values(["src_host", "dst_host"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)

    by = out.set_index(["src_host", "dst_host"])
    assert by.loc[("a.example", "b.example"), "n_links"] == 4
    assert by.loc[("a.example", "b.example"), "n_src_pages"] == 2
    assert by.loc[("b.example", "a.example"), "n_links"] == 2
    assert by.loc[("b.example", "a.example"), "n_src_pages"] == 2


def test_remove_boilerplate_lines(ray_session):
    """Frequency-rule line removal: only lines shared by >= min_docs
    DISTINCT docs of one group disappear (all occurrences); blank
    lines and cross-group repeats survive; row count is stable and
    the result is partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.boilerplate import remove_boilerplate_lines

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "source": ["a", "a", "a", "b", "b", "b"],
        "text": [
            "keep me\nfooter x\n\nfooter x",   # footer x twice in doc 0
            "footer x\nbody 1",
            "body 2\nfooter x",
            "footer x\nother",                  # only 1 doc in b: stays
            "solo line\n   \nrare",
            "",
        ]})
    # footer x: 3 distinct docs in 'a' (dup inside doc 0 counts once)
    want = {
        0: ("keep me\n", 2),   # both occurrences removed
        1: ("body 1", 1),
        2: ("body 2", 1),
        3: ("footer x\nother", 0),
        4: ("solo line\n   \nrare", 0),
        5: ("", 0),
    }
    for nb in (1, 4):
        out = remove_boilerplate_lines(
            ray.data.from_pandas(docs).repartition(nb), min_docs=3) \
            .to_pandas().set_index("doc_id")
        assert len(out) == 6, nb
        got = {int(i): (r["text"], int(r["n_removed"]))
               for i, r in out.iterrows()}
        assert got == want, (nb, got)

    with pytest.raises(ValueError, match="min_docs"):
        remove_boilerplate_lines(ray.data.from_pandas(docs), min_docs=1)


def test_blocklist_filter(ray_session):
    """UT1 domain blocklist: exact + subdomain matches block, siblings
    pass, unparseable hosts block conservatively, invert audits."""
    import pandas as pd
    import ray.data

    from warcio_ray.ops.urlfilter import (blocklist_filter,
                                          host_suffix_blocked,
                                          mark_blocked)

    assert host_suffix_blocked("bad.com", frozenset({"bad.com"}))
    assert host_suffix_blocked("a.b.bad.com", frozenset({"bad.com"}))
    assert not host_suffix_blocked("notbad.com", frozenset({"bad.com"}))
    assert host_suffix_blocked(None, frozenset())

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "url": ["https://bad.com/x", "https://ads.bad.com/y",
                "https://notbad.com/z", "http://ok.org:8080/w",
                "not a url"]})
    ds = ray.data.from_pandas(docs)
    marked = mark_blocked(ds, ["bad.com"]).to_pandas() \
        .sort_values("doc_id")
    assert marked["blocked"].tolist() == [1, 1, 0, 0, 1]
    assert marked["host"].tolist() == \
        ["bad.com", "ads.bad.com", "notbad.com", "ok.org", ""]

    kept = blocklist_filter(ds, ["bad.com"]).to_pandas()
    assert sorted(kept["doc_id"]) == [3, 4]
    audit = blocklist_filter(ds, ["bad.com"], invert=True).to_pandas()
    assert sorted(audit["doc_id"]) == [1, 2, 5]
    assert "blocked" not in kept.columns


def test_tfidf_topk_terms_paths(ray_session):
    """tf-idf keywords: hand-checked ranks, ties by term ASC, and the
    broadcast / join paths are output-identical."""
    import math

    import pandas as pd
    import ray.data

    from warcio_ray.ops.search import tfidf_topk_terms

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["apple apple banana common",
                 "banana cherry common",
                 "cherry cherry cherry common",
                 ""]})
    ds = ray.data.from_pandas(docs)

    outs = []
    for bmax in (1 << 30, 0):  # broadcast path, then join path
        out = tfidf_topk_terms(ds, k=2, broadcast_max=bmax).to_pandas() \
            .sort_values(["doc_id", "rank"]).reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])

    out = outs[0]
    # doc 4 is empty -> absent; everyone else has 2 rows
    assert out["doc_id"].tolist() == [1, 1, 2, 2, 3, 3]
    # doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    assert out[out.doc_id == 1]["term"].tolist() == ["apple", "banana"]
    assert out[out.doc_id == 1]["tfidf"].iloc[0] == 2 * math.log(4 / 1)
    # doc 2: banana and cherry tie (tf=1, df=2) -> term ASC
    assert out[out.doc_id == 2]["term"].tolist() == ["banana", "cherry"]
    # 'common' (df=3) never wins over rarer terms
    assert "common" not in out[out["rank"] == 1]["term"].tolist()


def test_reciprocal_link_stats(ray_session):
    """Reciprocity: distinct out-neighbors, both-direction detection,
    self-loops and multi-edges ignored."""
    import pandas as pd
    import ray.data

    from warcio_ray.ops.graph import reciprocal_link_stats

    edges = pd.DataFrame({
        "src": [1, 2, 1, 1, 3, 1, 1],
        "dst": [2, 1, 3, 3, 4, 1, 4]})  # 1<->2, 1->3 (dup), 3->4, loop, 1->4
    out = reciprocal_link_stats(ray.data.from_pandas(edges)) \
        .to_pandas().set_index("node").sort_index()
    assert out.loc[1, "n_out"] == 3 and out.loc[1, "n_recip"] == 1
    assert out.loc[2, "n_out"] == 1 and out.loc[2, "n_recip"] == 1
    assert out.loc[3, "n_out"] == 1 and out.loc[3, "n_recip"] == 0
    assert 4 not in out.index  # no outgoing edges


def test_url_trap_signals(ray_session):
    """Trap heuristics: repeated segments, over-deep paths, clean
    URLs, hostless strings."""
    import pandas as pd
    import ray.data

    from warcio_ray.ops.urlfilter import url_trap_signals

    urls = pd.DataFrame({"url": [
        "https://a.com/x/x/x/page",            # 2 repeats -> trap
        "https://a.com/a/b/c/d/e/f/g",         # depth 7 -> trap
        "https://a.com/a/b/c",                 # clean
        "https://a.com",                       # no path
        "https://a.com/cal/2024/cal/2024/p",   # 2 repeats -> trap
    ]})
    out = url_trap_signals(ray.data.from_pandas(urls)).to_pandas()
    assert out["depth"].tolist() == [4, 7, 3, 0, 5]
    assert out["n_repeat"].tolist() == [2, 0, 0, 0, 2]
    assert out["is_trap"].tolist() == [1, 1, 0, 0, 1]


def test_cap_per_group(ray_session):
    """Per-group cap: exact k per over-cap group, under-cap groups
    pass through whole, deterministic across runs, k validation."""
    import pandas as pd
    import pytest
    import ray.data

    from warcio_ray.ops.split import cap_per_group

    docs = pd.DataFrame({
        "doc_id": range(20),
        "source": ["a"] * 12 + ["b"] * 5 + ["c"] * 3})
    ds = ray.data.from_pandas(docs)
    out1 = cap_per_group(ds, "source", k=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    out2 = cap_per_group(ds, "source", k=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out1, out2)
    counts = out1["source"].value_counts()
    assert counts["a"] == 5 and counts["b"] == 5 and counts["c"] == 3
    # under-cap groups keep exactly their members
    assert set(out1[out1.source == "c"]["doc_id"]) == {17, 18, 19}
    with pytest.raises(ValueError, match="k must be"):
        cap_per_group(ds, "source", k=0)


def test_resolve_redirects_paths(ray_session):
    """Redirect chains: multi-hop resolution, cycle flagging at the
    hop bound, duplicate input urls, broadcast == join path."""
    import pandas as pd
    import ray.data

    from warcio_ray.ops.urlfilter import resolve_redirects

    red = pd.DataFrame({
        "src": ["a", "b", "c", "x", "y"],
        "dst": ["b", "c", "d", "y", "x"]})  # a->b->c->d chain; x<->y
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "url": ["a", "c", "d", "x", "z", "a"]})  # 'a' duplicated
    ds = ray.data.from_pandas(docs)

    outs = []
    for bmax in (1 << 20, 0):
        out = resolve_redirects(ds, red, max_hops=4,
                                broadcast_max=bmax).to_pandas()
        outs.append(out[["doc_id", "url", "final_url", "n_hops",
                         "looped"]].sort_values("doc_id")
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])

    out = outs[0].set_index("doc_id")
    assert (out.loc[1, "final_url"], out.loc[1, "n_hops"],
            out.loc[1, "looped"]) == ("d", 3, 0)
    assert (out.loc[2, "final_url"], out.loc[2, "n_hops"]) == ("d", 1)
    assert (out.loc[3, "final_url"], out.loc[3, "n_hops"]) == ("d", 0)
    # x<->y cycle: 4 hops land back on x, still redirecting -> looped
    assert (out.loc[4, "final_url"], out.loc[4, "n_hops"],
            out.loc[4, "looped"]) == ("x", 4, 1)
    assert (out.loc[5, "final_url"], out.loc[5, "n_hops"],
            out.loc[5, "looped"]) == ("z", 0, 0)
    assert out.loc[6, "final_url"] == "d"  # duplicate url resolves too


def test_append_postings_layout(ray_session, tmp_path):
    """Postings generations: base+append lookup == full build lookup,
    tag idempotency, torn-generation cleanup, missing-layout error."""
    import json
    import os

    import pandas as pd
    import pytest
    import ray.data

    from warcio_ray.ops.search import (append_postings_layout,
                                       build_postings_layout,
                                       postings_lookup)

    base = pd.DataFrame({"doc_id": [1, 2],
                         "text": ["apple banana", "banana cherry"]})
    fresh = pd.DataFrame({"doc_id": [3],
                          "text": ["apple apple dates"]})
    layout = str(tmp_path / "postings")
    build_postings_layout(ray.data.from_pandas(base), layout,
                          n_buckets=8)
    append_postings_layout(ray.data.from_pandas(fresh), layout, "g1")

    got = postings_lookup(layout, ["apple", "dates"], n_buckets=8)
    full = str(tmp_path / "full")
    build_postings_layout(
        ray.data.from_pandas(pd.concat([base, fresh])), full,
        n_buckets=8)
    want = postings_lookup(full, ["apple", "dates"], n_buckets=8)
    pd.testing.assert_frame_equal(got, want)
    assert got[got.term == "apple"]["doc_id"].tolist() == [1, 3]
    assert got[got.doc_id == 3].set_index("term").loc["apple", "tf"] == 2

    # tag idempotency: same tag -> no new generation
    append_postings_layout(ray.data.from_pandas(fresh), layout, "g1")
    gens = json.load(open(os.path.join(layout, "generations.json")))
    assert len(gens) == 1
    # torn-generation cleanup: uncommitted dir is cleared on retry
    os.makedirs(os.path.join(layout, "postings_g2", "bucket=0"),
                exist_ok=True)
    append_postings_layout(ray.data.from_pandas(fresh), layout, "g2")
    got2 = postings_lookup(layout, ["apple"], n_buckets=8)
    assert got2[got2.doc_id == 3]["tf"].tolist() == [2, 2]  # two gens

    with pytest.raises(FileNotFoundError):
        append_postings_layout(ray.data.from_pandas(fresh),
                               str(tmp_path / "none"), "x")


def test_compact_postings_layout(ray_session, tmp_path):
    """LSM compaction: lookups bit-identical before/after, absorbed
    dirs removed, append-tag idempotency survives, torn compaction
    invisible, single-root no-op, post-compaction appends work."""
    import json
    import os

    import pandas as pd
    import pytest
    import ray.data

    from warcio_ray.ops.search import (append_postings_layout,
                                       build_postings_layout,
                                       compact_postings_layout,
                                       postings_lookup)

    base = pd.DataFrame({"doc_id": [1, 2],
                         "text": ["apple banana", "banana cherry"]})
    g1 = pd.DataFrame({"doc_id": [3], "text": ["apple apple dates"]})
    g2 = pd.DataFrame({"doc_id": [4], "text": ["cherry dates"]})
    layout = str(tmp_path / "p")
    build_postings_layout(ray.data.from_pandas(base), layout,
                          n_buckets=8)
    append_postings_layout(ray.data.from_pandas(g1), layout, "g1")
    append_postings_layout(ray.data.from_pandas(g2), layout, "g2")
    probes = ["apple", "banana", "cherry", "dates"]
    before = postings_lookup(layout, probes, n_buckets=8)

    # torn compaction: a half-written postings_c3 dir without the
    # manifest commit must be invisible to lookups
    os.makedirs(os.path.join(layout, "postings_c3", "bucket=0"),
                exist_ok=True)
    pd.testing.assert_frame_equal(
        postings_lookup(layout, probes, n_buckets=8), before)

    compact_postings_layout(layout)
    after = postings_lookup(layout, probes, n_buckets=8)
    pd.testing.assert_frame_equal(after, before)
    gens = json.load(open(os.path.join(layout, "generations.json")))
    assert len(gens) == 1 and gens[0]["replaces_base"]
    assert sorted(gens[0]["absorbed_tags"]) == ["g1", "g2"]
    # absorbed dirs reclaimed
    assert not os.path.isdir(os.path.join(layout, "postings"))
    assert not os.path.isdir(os.path.join(layout, "postings_g1"))

    # replayed append of an absorbed tag stays a no-op
    append_postings_layout(ray.data.from_pandas(g1), layout, "g1")
    pd.testing.assert_frame_equal(
        postings_lookup(layout, probes, n_buckets=8), before)

    # second compaction with a single root: no-op
    compact_postings_layout(layout)
    assert json.load(open(os.path.join(layout,
                                       "generations.json"))) == gens

    # post-compaction appends land as fresh generations and compact
    # again cleanly
    g3 = pd.DataFrame({"doc_id": [5], "text": ["banana elder"]})
    append_postings_layout(ray.data.from_pandas(g3), layout, "g3")
    compact_postings_layout(layout)
    got = postings_lookup(layout, probes + ["elder"], n_buckets=8)
    full = str(tmp_path / "full")
    build_postings_layout(
        ray.data.from_pandas(pd.concat([base, g1, g2, g3])), full,
        n_buckets=8)
    want = postings_lookup(full, probes + ["elder"], n_buckets=8)
    pd.testing.assert_frame_equal(got, want)

    with pytest.raises(FileNotFoundError):
        compact_postings_layout(str(tmp_path / "none"))


def test_append_ivf_layout(ray_session, tmp_path):
    """IVF generations: base+append full-probe search equals one
    full build (exact at full probe), tag idempotency, frozen
    centroids, missing-layout error."""
    import json
    import os

    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from warcio_ray.ops.ivf import (append_ivf_layout,
                                    build_ivf_layout,
                                    ivf_search_layout)

    rng = np.random.RandomState(3)
    vecs = rng.randn(60, 8)
    df = pd.DataFrame({"vec_id": np.arange(60, dtype="int64"),
                       "embedding": list(vecs)})
    base, fresh = df[df.vec_id % 2 == 0], df[df.vec_id % 2 == 1]
    q = vecs[0]

    layout = str(tmp_path / "ivf")
    build_ivf_layout(ray.data.from_pandas(base), layout, n_centroids=4)
    cent_before = np.load(os.path.join(layout, "centroids.npy"))
    append_ivf_layout(ray.data.from_pandas(fresh), layout, "g1")
    assert np.array_equal(
        cent_before, np.load(os.path.join(layout, "centroids.npy")))

    got = ivf_search_layout(layout, q, k=5)
    full = str(tmp_path / "full")
    build_ivf_layout(ray.data.from_pandas(df), full, n_centroids=4)
    want = ivf_search_layout(full, q, k=5)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()

    append_ivf_layout(ray.data.from_pandas(fresh), layout, "g1")
    assert len(json.load(open(f"{layout}/generations.json"))) == 1
    with pytest.raises(FileNotFoundError):
        append_ivf_layout(ray.data.from_pandas(fresh),
                          str(tmp_path / "none"), "x")


def test_compact_ivf_layout(ray_session, tmp_path):
    """IVF compaction: searches identical before/after (pruned AND
    full probe), frozen centroids untouched, absorbed dirs reclaimed,
    replayed appends stay no-ops, single-root no-op, post-compaction
    append + recompact correct."""
    import json
    import os

    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from warcio_ray.ops.ivf import (append_ivf_layout,
                                    build_ivf_layout,
                                    compact_ivf_layout,
                                    ivf_search_layout)

    rng = np.random.RandomState(5)
    vecs = rng.randn(90, 8)
    df = pd.DataFrame({"vec_id": np.arange(90, dtype="int64"),
                       "embedding": list(vecs)})
    parts = [df[df.vec_id % 3 == r] for r in range(3)]
    q = vecs[:3]

    layout = str(tmp_path / "ivf")
    build_ivf_layout(ray.data.from_pandas(parts[0]), layout,
                     n_centroids=4)
    append_ivf_layout(ray.data.from_pandas(parts[1]), layout, "g1")
    append_ivf_layout(ray.data.from_pandas(parts[2]), layout, "g2")
    cent = np.load(os.path.join(layout, "centroids.npy"))
    before_full = ivf_search_layout(layout, q, k=7)
    before_p1 = ivf_search_layout(layout, q, k=7, nprobe=1)

    compact_ivf_layout(layout)
    assert np.array_equal(
        cent, np.load(os.path.join(layout, "centroids.npy")))
    gens = json.load(open(f"{layout}/generations.json"))
    assert len(gens) == 1 and gens[0]["replaces_base"]
    assert sorted(gens[0]["absorbed_tags"]) == ["g1", "g2"]
    assert not os.path.isdir(os.path.join(layout, "vectors"))
    assert not os.path.isdir(os.path.join(layout, "vectors_g1"))
    pd.testing.assert_frame_equal(
        ivf_search_layout(layout, q, k=7), before_full)
    pd.testing.assert_frame_equal(
        ivf_search_layout(layout, q, k=7, nprobe=1), before_p1)

    # replayed absorbed tag: no-op
    append_ivf_layout(ray.data.from_pandas(parts[1]), layout, "g1")
    assert json.load(open(f"{layout}/generations.json")) == gens
    # single root: compaction no-op
    compact_ivf_layout(layout)
    assert json.load(open(f"{layout}/generations.json")) == gens

    # post-compaction append + recompact == one full build (full probe
    # is exact, so centroid provenance doesn't matter)
    extra = pd.DataFrame({"vec_id": np.arange(90, 100, dtype="int64"),
                          "embedding": list(rng.randn(10, 8))})
    append_ivf_layout(ray.data.from_pandas(extra), layout, "g3")
    compact_ivf_layout(layout)
    got = ivf_search_layout(layout, q, k=7)
    full = str(tmp_path / "full")
    build_ivf_layout(
        ray.data.from_pandas(pd.concat([df, extra])), full,
        n_centroids=4)
    want = ivf_search_layout(full, q, k=7)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()

    with pytest.raises(FileNotFoundError):
        compact_ivf_layout(str(tmp_path / "none"))


def test_rank_select_lowest(ray_session):
    """Exact rank selection: brute-force parity incl. heavy ties and
    NaN exclusion, at two partitionings; pct validation."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from warcio_ray.ops.quantile import rank_select_lowest

    rng = np.random.RandomState(11)
    vals = np.round(rng.rand(200) * 5) / 5.0  # heavy ties
    vals[::17] = np.nan
    df = pd.DataFrame({"doc_id": np.arange(200, dtype="int64"),
                       "v": vals})

    clean = df.dropna(subset=["v"])
    k = (30 * len(clean) + 99) // 100
    want = clean.sort_values(["v", "doc_id"]).head(k)["doc_id"] \
        .sort_values().tolist()

    for nparts in (2, 5):
        got = rank_select_lowest(
            ray.data.from_pandas(df).repartition(nparts), "v",
            pct=30).to_pandas()["doc_id"].sort_values().tolist()
        assert got == want, nparts

    with pytest.raises(ValueError, match="pct"):
        rank_select_lowest(ray.data.from_pandas(df), "v", pct=0)


def test_triangle_counts(ray_session):
    """Triangles: hand graph (K4 has 4 triangles, each node in 3),
    duplicate/reversed edges collapse, brute-force parity on a random
    graph."""
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data

    from warcio_ray.ops.graph import triangle_counts

    # K4 + one dangling edge, with dup/reversed noise; both the
    # degree-broadcast and join-path orientations must agree
    e = pd.DataFrame({
        "src": [0, 0, 0, 1, 1, 2, 2, 3, 4],
        "dst": [1, 2, 3, 2, 3, 3, 1, 0, 5]})
    for bmax in (1 << 21, 0):
        out = triangle_counts(ray.data.from_pandas(e),
                              broadcast_max_nodes=bmax).to_pandas() \
            .set_index("node").sort_index()
        assert out["n_tri"].tolist() == [3, 3, 3, 3], bmax

    rng = np.random.RandomState(5)
    edges = pd.DataFrame({"src": rng.randint(0, 30, 200),
                          "dst": rng.randint(0, 30, 200)})
    got = triangle_counts(ray.data.from_pandas(edges)).to_pandas() \
        .set_index("node")["n_tri"].to_dict()

    und = {tuple(sorted(p)) for p in edges.itertuples(index=False)
           if p.src != p.dst}
    want = {}
    nodes = {v for p in und for v in p}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert got == want


def test_funnel_events_kernel(ray_session, tmp_path):
    """Funnel minimality: latest-anchored triple yields the true
    minimum span; out-of-order and windowed-out users excluded."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import pyarrow as pa

    from warcio_ray.ops.relational import funnel_events

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(60_000_000, "us")  # one minute

    def ev(uid, typ, minutes):
        return {"event_id": 0, "ts": t0 + minutes * m, "user_id": uid,
                "event_type": typ, "value": 0.0, "props": ""}

    rows = [
        # user 1: v@0, v@50, c@55, p@60 -> best span 10 min (v@50)
        ev(1, "view", 0), ev(1, "view", 50), ev(1, "click", 55),
        ev(1, "purchase", 60),
        # user 2: order broken (p before c) -> no funnel
        ev(2, "view", 0), ev(2, "purchase", 5), ev(2, "click", 10),
        # user 3: complete but spans 3 days -> windowed out at 24h
        ev(3, "view", 0), ev(3, "click", 2000), ev(3, "purchase", 4400),
        # user 4: simultaneous ts allowed (v==c==p)
        ev(4, "view", 7), ev(4, "click", 7), ev(4, "purchase", 7),
    ]
    d = str(tmp_path / "sf")
    import os
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)),
                   f"{d}/events.parquet")

    out = funnel_events(d, window_minutes=1440).to_pandas() \
        .set_index("user_id").sort_index()
    assert out.index.tolist() == [1, 4]
    assert out.loc[1, "min_duration_us"] == 10 * 60_000_000
    assert out.loc[4, "min_duration_us"] == 0


def test_novelty_scores(ray_session):
    """Novelty: shared grams count per occurrence, short docs 0/0,
    within-doc repeats don't make a gram 'repeated'."""
    import pandas as pd
    import ray.data

    from warcio_ray.ops.spans import novelty_scores

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d",          # grams: abc bcd
                 "a b c x a b c",    # abc appears twice here + doc1
                 "z z",              # too short: 0 grams
                 "q w e"]})          # unique gram qwe
    outs = []
    for bmax in (1 << 30, 0):  # broadcast path, then join path
        out = novelty_scores(ray.data.from_pandas(docs), k=3,
                             min_docs=2, broadcast_max=bmax) \
            .to_pandas().set_index("doc_id").sort_index()
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    # 'a b c' is in docs 1 and 2 -> repeated; 'b c d' only doc1
    assert (out.loc[1, "n_grams"], out.loc[1, "n_repeated"]) == (2, 1)
    # doc2 grams: abc bcx cxa xab abc -> 2 occurrences of abc
    assert (out.loc[2, "n_grams"], out.loc[2, "n_repeated"]) == (5, 2)
    assert (out.loc[3, "n_grams"], out.loc[3, "n_repeated"]) == (0, 0)
    assert (out.loc[4, "n_grams"], out.loc[4, "n_repeated"]) == (1, 0)


def test_funnel_random_bruteforce(ray_session, tmp_path):
    """Property: funnel minimal spans equal the brute-force scan over
    all ordered (v, c, p) triples on random event streams."""
    import itertools
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from warcio_ray.ops.relational import funnel_events

    rng = np.random.RandomState(13)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = []
    for uid in range(30):
        for _ in range(rng.randint(1, 12)):
            rows.append({
                "event_id": len(rows),
                "ts": t0 + int(rng.randint(0, 3000)) *
                np.timedelta64(60_000_000, "us"),
                "user_id": uid,
                "event_type": rng.choice(
                    ["view", "click", "purchase", "error"]),
                "value": 0.0, "props": ""})
    df = pd.DataFrame(rows)
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(df), f"{d}/events.parquet")

    W = 1440 * 60_000_000
    want = {}
    for uid, grp in df.groupby("user_id"):
        us = grp["ts"].astype("int64") // 1000
        vs = us[grp.event_type == "view"]
        cs = us[grp.event_type == "click"]
        ps = us[grp.event_type == "purchase"]
        best = None
        for v, c, p in itertools.product(vs, cs, ps):
            if v <= c <= p and p - v <= W:
                best = p - v if best is None else min(best, p - v)
        if best is not None:
            want[uid] = best

    got = funnel_events(d, window_minutes=1440).to_pandas() \
        .set_index("user_id")["min_duration_us"].to_dict()
    assert got == want


def test_pmi_collocations(ray_session):
    """PMI bigrams: exact counts vs a brute-force reference, min_count
    gate, empty-text docs contribute nothing, no cross-doc bigrams."""
    import math

    import pandas as pd
    import ray.data

    from warcio_ray.ops.colloc import pmi_collocations

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["new york is big",
                 "new york city",
                 "the city is big",
                 "",            # no tokens
                 "york"]})      # single token: no bigram
    ds = ray.data.from_pandas(docs).repartition(3)
    out = pmi_collocations(ds, min_count=2).to_pandas() \
        .sort_values(["w1", "w2"]).reset_index(drop=True)

    # brute force
    from collections import Counter
    uni: Counter = Counter()
    big: Counter = Counter()
    for t in docs["text"]:
        toks = t.split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n = sum(uni.values())
    want = sorted((w1, w2, c) for (w1, w2), c in big.items() if c >= 2)
    assert list(map(tuple, out[["w1", "w2", "c12"]].to_numpy())) == \
        [(w1, w2, c) for (w1, w2, c) in want]
    for _, r in out.iterrows():
        assert r["c1"] == uni[r["w1"]] and r["c2"] == uni[r["w2"]]
        assert abs(r["pmi"] - math.log(r["c12"] * n /
                                       (r["c1"] * r["c2"]))) < 1e-12
    # last doc boundary: "big new" (doc0->doc1 adjacency) must NOT appear
    assert not (((out["w1"] == "big") & (out["w2"] == "new")).any())


def test_containment_join(ray_session):
    """Directed containment: excerpt flagged inside its source (not
    vice versa), symmetric duplicates flagged both ways, integer
    threshold boundary exact."""
    import pandas as pd
    import ray.data

    from warcio_ray.ops.dedup import containment_join

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"   # 8 distinct 3-grams
    excerpt = "w1 w2 w3 w4 w5"                # 3 grams, all in base
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [base, excerpt, base,          # 3 = exact dup of 1
                 "x1 x2 x3 x4",                # disjoint
                 ""]})                         # no grams
    out = containment_join(
        ray.data.from_pandas(docs).repartition(2),
        threshold_num=4, threshold_den=5)
    got = set(map(tuple, out[["a", "b"]].to_numpy()))
    # excerpt (2) contained in 1 and in 3; 1 and 3 contain each other;
    # base is NOT contained in excerpt (3/8 < 4/5); 4, 5 nowhere
    assert got == {(2, 1), (2, 3), (1, 3), (3, 1)}
    r21 = out[(out["a"] == 2) & (out["b"] == 1)].iloc[0]
    assert (r21["n_common"], r21["n_a"]) == (3, 3)
    # threshold boundary: 4 of 5 grams shared passes 4/5 exactly
    docs2 = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b c d e f g",             # grams abc..efg (5)
                 "a b c d e f x"]})            # shares abc bcd cde def (4)
    out2 = containment_join(ray.data.from_pandas(docs2),
                            threshold_num=4, threshold_den=5)
    assert set(map(tuple, out2[["a", "b"]].to_numpy())) == {(1, 2), (2, 1)}


def test_weakly_connected_components(ray_session):
    """WCC wrapper: direction dropped, min-id labels, isolated edges
    and chains labeled correctly."""
    import pandas as pd
    import ray.data

    from warcio_ray.ops.graph import weakly_connected_components

    # components: {1,2,3,4} (chain + reverse edge), {10,11}, {20,21,22}
    edges = pd.DataFrame({
        "src": [2, 3, 4, 10, 21, 22],
        "dst": [1, 2, 3, 11, 20, 20]})
    out = weakly_connected_components(
        ray.data.from_pandas(edges).repartition(3)).to_pandas() \
        .set_index("node")["component"].to_dict()
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_canonical_url_dedup(ray_session):
    """Canonicalizer rules: fragment/tracking strip, case+port
    normalization, param sort; dedup groups variants with min_url."""
    import pandas as pd
    import ray.data

    from warcio_ray.ops.urlfilter import (canonical_url_dedup,
                                          canonicalize_url_series)

    got = canonicalize_url_series(pd.Series([
        "HTTP://Ex.COM:80/P?b=2&utm_source=f&a=1#x",
        "https://ex.com:443/p",
        "http://ex.com/p?",
        "http://ex.com/p?jsessionid=abc",
        "relative/path?k=v&REF=1",     # REF (upper) is tracking too
        "http://ex.com:8080/p",        # non-default port kept
    ]))
    assert got.tolist() == [
        "http://ex.com/P?a=1&b=2",
        "https://ex.com/p",
        "http://ex.com/p",
        "http://ex.com/p",
        "relative/path?k=v",
        "http://ex.com:8080/p"]

    urls = pd.DataFrame({"url": [
        "http://a/x?utm_k=1", "HTTP://A/x", "http://a/x#f",
        "http://b/y"]})
    out = canonical_url_dedup(ray.data.from_pandas(urls).repartition(2)) \
        .to_pandas().sort_values("canon_url").reset_index(drop=True)
    assert out.loc[0, "canon_url"] == "http://a/x"
    assert out.loc[0, "n_urls"] == 3
    assert out.loc[0, "min_url"] == "HTTP://A/x"
    assert out.loc[1, "canon_url"] == "http://b/y"
    assert out.loc[1, "n_urls"] == 1


def test_readability_batch():
    """Flesch kernel: syllable floor for vowelless words, sentence
    floor at 1, empty doc -> 0.0."""
    import pandas as pd

    from warcio_ray.ops.textstats import readability_batch

    out = readability_batch(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["The cat sat. It ran!",     # 5 words, 2 sentences
                 "xyz 123 qrst",             # vowelless: 3 syllables
                 "beautiful day",            # beau-ti-ful(3 vg) day(1)
                 ""]})).set_index("doc_id")
    assert out.loc[1, "n_words"] == 5 and out.loc[1, "n_sentences"] == 2
    # The(1) cat(1) sat(1) It(1) ran(1) = 5 vowel groups
    assert out.loc[1, "n_syllables"] == 5
    f1 = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
    assert abs(out.loc[1, "flesch"] - f1) < 1e-9
    assert out.loc[2, "n_syllables"] == 3          # all vowelless
    assert out.loc[2, "n_sentences"] == 1          # floored
    assert out.loc[3, "n_syllables"] == 4
    assert out.loc[4, "flesch"] == 0.0 and out.loc[4, "n_words"] == 0


def test_write_training_shards_resume(ray_session, tmp_path):
    """Resumable shard export: parity on read-back, rerun skips every
    committed shard, a missing shard (torn run) is rebuilt alone."""
    import os

    import pandas as pd
    import ray.data

    from warcio_ray.pipelines.shards import (read_training_shards,
                                             write_training_shards)

    seg = pd.DataFrame({
        "doc_id": range(40),
        "shuffle_rank": range(40),
        "bin_id": [i // 2 for i in range(40)],     # bins 0..19
        "doc_off": [0] * 40,
        "bin_off": [i % 2 for i in range(40)],
        "n_tok": [7] * 40}).astype("int64")
    ds = ray.data.from_pandas(seg).repartition(4)
    out = str(tmp_path / "shards")

    m1 = write_training_shards(ds, out, bins_per_shard=8)
    assert m1["shard"].tolist() == [0, 1, 2]       # bins 0-7, 8-15, 16-19
    assert not m1["skipped"].any()
    assert m1["n_rows"].sum() == 40

    back = read_training_shards(out).to_pandas() \
        .sort_values(["shuffle_rank", "bin_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        back[seg.columns.tolist()],
        seg.sort_values(["shuffle_rank", "bin_id"]).reset_index(drop=True))

    # rerun: everything skipped, data files untouched
    p0 = os.path.join(out, "shard=0", "part.parquet")
    mt0 = os.path.getmtime(p0)
    m2 = write_training_shards(ds, out, bins_per_shard=8)
    assert m2["skipped"].all()
    assert os.path.getmtime(p0) == mt0

    # torn run: drop shard=1 entirely -> only it is rebuilt
    import shutil
    shutil.rmtree(os.path.join(out, "shard=1"))
    m3 = write_training_shards(ds, out, bins_per_shard=8)
    assert m3.set_index("shard")["skipped"].to_dict() == {
        0: True, 1: False, 2: True}
    assert os.path.getmtime(p0) == mt0
    back3 = read_training_shards(out).to_pandas()
    assert len(back3) == 40


def test_discover_candidates(ray_session):
    """Discovery composition: canon collapses variant votes, seen
    anti-join and blocklist gate both apply, counts exact."""
    import pandas as pd
    import ray.data

    from warcio_ray.pipelines.discover import discover_candidates

    links = pd.DataFrame({
        "src_url": ["http://a/1"] * 4 + ["http://b/2"] * 2,
        "dst_url": ["http://t.x/p?utm_source=f",  # variant of t.x/p
                    "http://t.x/p",               # 2 votes after canon
                    "http://seen.x/q",            # seen -> dropped
                    "http://bad.x/r",             # blocklisted
                    "http://t.x/p",               # third vote
                    "http://new.x/s"]})
    seen = pd.DataFrame({"url": ["http://seen.x/q"]})
    out = discover_candidates(
        None, ray.data.from_pandas(seen),
        blocklist=["bad.x"],
        links=ray.data.from_pandas(links).repartition(2)) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    assert out["url"].tolist() == ["http://new.x/s", "http://t.x/p"]
    assert out["n_inlinks"].tolist() == [1, 3]


def test_rrf_fuse():
    """RRF arithmetic: overlap sums both lists, rank 1-based, k added."""
    import pandas as pd

    from warcio_ray.ops.search import rrf_fuse

    lex = pd.DataFrame({"doc_id": [7, 3, 9]})   # ranks 1,2,3
    vec = pd.DataFrame({"doc_id": [3, 5]})      # ranks 1,2
    out = rrf_fuse([lex, vec], k=60).set_index("doc_id")["rrf"]
    assert abs(out[7] - 1 / 61) < 1e-12
    assert abs(out[3] - (1 / 62 + 1 / 61)) < 1e-12
    assert abs(out[9] - 1 / 63) < 1e-12
    assert abs(out[5] - 1 / 62) < 1e-12
    assert out.index.tolist() == [3, 5, 7, 9]


def test_profile_table(ray_session):
    """Profiler: null accounting, exact distincts exclude nulls,
    min/max on native types rendered to strings."""
    import pandas as pd
    import ray.data

    from warcio_ray.ops.profile import profile_table

    df = pd.DataFrame({
        "k": [3, 1, 1, 2, 3],
        "s": ["b", None, "a", "a", None]})
    out = profile_table(ray.data.from_pandas(df).repartition(3),
                        ["k", "s"]).set_index("column")
    assert out.loc["k"].tolist() == [5, 0, 3, "1", "3"]
    assert out.loc["s"].tolist() == [5, 2, 2, "a", "b"]


def test_session3_ops_partitioning_invariance(ray_session):
    """Distributed-correctness property: every session-3 operator
    yields IDENTICAL output at 1, 3, and 7 input partitions."""
    import pandas as pd
    import ray.data

    from warcio_ray.ops.colloc import pmi_collocations
    from warcio_ray.ops.dedup import containment_join
    from warcio_ray.ops.graph import weakly_connected_components
    from warcio_ray.ops.profile import profile_table
    from warcio_ray.ops.textstats import readability_batch
    from warcio_ray.ops.urlfilter import canonical_url_dedup

    docs = pd.DataFrame({
        "doc_id": range(30),
        "text": [f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 5} end{i % 3}"
                 for i in range(30)]})
    edges = pd.DataFrame({"src": [i for i in range(20)],
                          "dst": [(i * 7 + 3) % 20 for i in range(20)]})
    urls = pd.DataFrame({"url": [
        f"http://h{i % 4}.x/p{i % 6}?utm_s=1&a={i % 2}#f"
        for i in range(30)]})

    def run(n):
        d = ray.data.from_pandas(docs).repartition(n)
        e = ray.data.from_pandas(edges).repartition(n)
        u = ray.data.from_pandas(urls).repartition(n)
        return (
            pmi_collocations(d, min_count=2).to_pandas()
            .sort_values(["w1", "w2"]).reset_index(drop=True),
            containment_join(d, 4, 5)[["a", "b"]].reset_index(drop=True),
            weakly_connected_components(e).to_pandas()
            .sort_values("node").reset_index(drop=True),
            canonical_url_dedup(u).to_pandas()
            .sort_values("canon_url").reset_index(drop=True),
            d.map_batches(readability_batch, batch_format="pandas")
            .to_pandas().sort_values("doc_id").reset_index(drop=True),
            profile_table(d, ["doc_id", "text"]),
        )

    base = run(1)
    for n in (3, 7):
        got = run(n)
        for b, g in zip(base, got):
            pd.testing.assert_frame_equal(
                b.reset_index(drop=True), g.reset_index(drop=True))


def test_signal_auc_matches_bruteforce(ray_session):
    """Exact Mann-Whitney AUC: histogram path == O(n^2) pair count
    (ties at 0.5), and a constant signal reads exactly 0.5."""
    import ray.data

    from warcio_ray.ops.evals import signal_auc

    rng = np.random.RandomState(7)
    n = 120
    langs = np.where(rng.rand(n) < 0.4, "en", "de")
    # text length correlates with the label -> AUC well above 0.5
    texts = ["w " * (10 + (30 if l == "en" else 0) + int(rng.rand() * 9))
             for l in langs]
    df = pd.DataFrame({"doc_id": np.arange(n), "text": texts,
                       "lang": langs})
    ds = ray.data.from_pandas(df).repartition(5)
    out = signal_auc(ds).set_index("signal")

    for name, score in (("n_chars",
                         np.array([len(t) for t in texts], dtype=np.int64)),
                        ("n_words",
                         np.array([len(t.split()) for t in texts],
                                  dtype=np.int64))):
        pos_s = score[langs == "en"]
        neg_s = score[langs != "en"]
        wins = (pos_s[:, None] > neg_s[None, :]).sum()
        ties = (pos_s[:, None] == neg_s[None, :]).sum()
        u2 = int(2 * wins + ties)
        assert out.loc[name, "u2"] == u2
        assert out.loc[name, "auc"] == round(
            u2 / (2.0 * len(pos_s) * len(neg_s)), 6)

    # constant signal -> all ties -> exactly 0.5
    df2 = pd.DataFrame({"doc_id": np.arange(20),
                        "text": ["same text here"] * 20,
                        "lang": ["en"] * 9 + ["de"] * 11})
    out2 = signal_auc(ray.data.from_pandas(df2)).set_index("signal")
    assert out2.loc["n_chars", "auc"] == 0.5


def test_chunk_windows(ray_session):
    """Sliding-window chunking: brute-force mirror over edge cases
    (empty, short, exact-fit, window+1, multi-space text), full token
    coverage, disjoint mode at stride==window, partition invariance,
    bad-stride rejection."""
    import ray.data

    from warcio_ray.ops.chunk import chunk_windows

    W, S = 4, 3
    texts = ["",                         # no chunks
             "a b",                      # one short chunk
             "t0 t1 t2 t3",              # exact fit -> one chunk
             "u0 u1 u2 u3 u4",           # window+1 -> two chunks
             "  v0   v1\tv2\nv3 v4 v5 v6 v7 v8 v9  ",  # 10 toks
             None]                       # null -> no chunks
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts})

    def brute(window, stride):
        rows = []
        for i, t in enumerate(texts):
            toks = (t or "").split()
            n = len(toks)
            if n == 0:
                continue
            kmax = (max(n - window, 0) + stride - 1) // stride
            for k in range(kmax + 1):
                s = k * stride
                e = min(s + window, n)
                rows.append((i, k, s, e - s, " ".join(toks[s:e])))
        return sorted(rows)

    for window, stride in [(W, S), (W, W), (3, 1)]:
        want = brute(window, stride)
        for np_ in [1, 3]:
            got = chunk_windows(
                ray.data.from_pandas(df).repartition(np_),
                window=window, stride=stride).to_pandas()
            rows = sorted(zip(got["doc_id"], got["chunk_id"],
                              got["start_tok"], got["n_tok"],
                              got["chunk_text"]))
            assert rows == want
        # full coverage: every token index of every doc is in a chunk
        cov = {}
        for i, k, s, nt, _ in want:
            cov.setdefault(i, set()).update(range(s, s + nt))
        for i, t in enumerate(texts):
            n = len((t or "").split())
            if n:
                assert cov[i] == set(range(n))

    # stride == window -> disjoint chunks, lengths sum to n
    got = chunk_windows(ray.data.from_pandas(df), window=W,
                        stride=W).to_pandas()
    per_doc = got.groupby("doc_id")["n_tok"].sum()
    assert per_doc[4] == 10 and per_doc[2] == 4

    import pytest
    with pytest.raises(ValueError, match="stride"):
        chunk_windows(ray.data.from_pandas(df), window=4, stride=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_windows(ray.data.from_pandas(df), window=4, stride=5)


def test_kcore_nodes(ray_session):
    """k-core parallel peel: equals a brute-force sequential peel on
    random graphs (both paths, two partitionings), handles self-loops
    / multi-edges / full-peel-to-empty, survivors all keep deg >= k."""
    import ray.data

    from warcio_ray.ops.graph import kcore_nodes

    def brute(edges, k):
        und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        while True:
            deg = {}
            for a, b in und:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            dead = {v for v, d in deg.items() if d < k}
            if not dead:
                return dict(sorted(deg.items()))
            if not und:
                return {}
            und = {(a, b) for a, b in und
                   if a not in dead and b not in dead}
            if not und:
                return {}

    # deterministic pseudo-random graph + planted K5 (survives k=4)
    rng = np.random.RandomState(7)
    e = rng.randint(0, 40, size=(260, 2))
    edges = [tuple(map(int, r)) for r in e]
    edges += [(100 + i, 100 + j) for i in range(5) for j in range(5)
              if i < j]
    edges += [(3, 3), (5, 5), (0, 1), (1, 0)]  # self-loops + both dirs
    df = pd.DataFrame(edges, columns=["src", "dst"])

    def as_map(got):
        return {} if got.empty else dict(zip(got["node"].astype(int),
                                             got["deg"].astype(int)))

    for k in (2, 4, 9):
        want = brute(edges, k)
        for np_ in (1, 3):
            got = kcore_nodes(
                ray.data.from_pandas(df).repartition(np_),
                k=k).to_pandas()
            assert as_map(got) == want
        got_j = kcore_nodes(ray.data.from_pandas(df), k=k,
                            broadcast_max_nodes=0).to_pandas()
        assert as_map(got_j) == want
        assert all(d >= k for d in want.values())
    # K5 core survives k=4
    w4 = brute(edges, 4)
    assert {100, 101, 102, 103, 104} <= set(w4)

    # full peel to empty (a path graph at k=2)
    path = pd.DataFrame({"src": range(9), "dst": range(1, 10)})
    for bmn in (0, 10 ** 6):
        out = kcore_nodes(ray.data.from_pandas(path), k=2,
                          broadcast_max_nodes=bmn).to_pandas()
        assert len(out) == 0

    # non-convergence is loud, not a silent partial core
    import pytest
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore_nodes(ray.data.from_pandas(path), k=2, max_rounds=1)


def test_cocitation_pairs(ray_session):
    """Co-citation: brute-force parity (multi-edges collapse,
    self-loops ignored), cap truncation keeps smallest ids and is
    accounted, partition invariance."""
    import itertools

    import ray.data

    from warcio_ray.ops.graph import cocitation_pairs

    edges = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (2, 11),
             (3, 10), (3, 12), (3, 3), (4, 20), (5, 10)]
    df = pd.DataFrame(edges, columns=["src", "dst"])

    def brute(cap):
        cnt = {}
        trunc = 0
        by_src = {}
        for s, d in edges:
            if s != d:
                by_src.setdefault(s, set()).add(d)
        for s, ds_ in by_src.items():
            ds_ = sorted(ds_)
            if len(ds_) > cap:
                trunc += 1
                ds_ = ds_[:cap]
            for a, b in itertools.combinations(ds_, 2):
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
        return cnt, trunc

    for cap in (256, 2):
        want, wtrunc = brute(cap)
        for np_ in (1, 4):
            got, gtrunc = cocitation_pairs(
                ray.data.from_pandas(df).repartition(np_),
                max_out_degree=cap)
            gp = got.to_pandas()
            gmap = {} if gp.empty else {
                (int(r.a), int(r.b)): int(r.n_common)
                for r in gp.itertuples()}
            assert gmap == want
            assert gtrunc == wtrunc
    # cap=2: sources 1 and 3 (deg 3 and 2 after self-loop drop)...
    want2, t2 = brute(2)
    assert t2 == 1  # only src 1 exceeds 2 distinct dsts
    assert (10, 11) in want2 and (11, 12) not in want2


def test_ann_recall_at_k(ray_session):
    """ANN recall eval: matches a numpy reference of the same
    assignment/probe/top-k chain, detects a planted miss (the true
    neighbor assigned to an unprobed cluster), and reads perfect when
    nprobe covers every centroid."""
    import ray.data

    from warcio_ray.ops.evals import ann_recall_at_k

    rng = np.random.RandomState(3)
    # two tight clusters around orthogonal axes + a stray true
    # neighbor of the axis-0 query placed INSIDE cluster 1's region
    a0 = np.array([1.0, 0.0, 0.0, 0.0])
    a1 = np.array([0.0, 1.0, 0.0, 0.0])
    vecs = np.concatenate([
        a0 + rng.randn(20, 4) * 0.05,
        a1 + rng.randn(20, 4) * 0.05], axis=0)
    df = pd.DataFrame({"vec_id": np.arange(40, dtype="int64"),
                       "embedding": [r.astype(np.float32)
                                     for r in vecs]})
    cents = np.stack([a0, a1])
    queries = np.stack([a0, a1])

    def ref(nprobe, k=5):
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        assign = (vn @ cents.T).argmax(axis=1)
        out = []
        for qi, q in enumerate(queries):
            qn = q / np.linalg.norm(q)
            probe = np.argsort(-(qn @ cents.T))[:nprobe]
            scores = vn @ qn
            def topk(mask):
                idx = np.flatnonzero(mask)
                order = idx[np.lexsort((idx, -scores[idx]))][:k]
                return set(order.tolist())
            ex = topk(np.ones(len(vecs), dtype=bool))
            ap = topk(np.isin(assign, probe))
            out.append((qi, len(ex & ap)))
        return out

    for nprobe in (1, 2):
        want = ref(nprobe)
        for nparts in (1, 4):
            ds = ray.data.from_pandas(df).repartition(nparts)
            got = ann_recall_at_k(ds, queries, cents, k=5,
                                  nprobe=nprobe)
            assert list(map(tuple, got.to_numpy())) == want, \
                (nprobe, nparts)
    # full probe is exact by construction
    assert all(h == 5 for _, h in ref(2))
    # nprobe=1 must show a miss somewhere: plant one — a vector close
    # to axis 0 but assigned to cluster 1
    stray = (0.6 * a0 + 0.8 * a1).astype(np.float32)
    df2 = pd.concat([df, pd.DataFrame(
        {"vec_id": [99], "embedding": [stray]})], ignore_index=True)
    got = ann_recall_at_k(ray.data.from_pandas(df2), queries, cents,
                          k=5, nprobe=1)
    assert int(got["n_hits"].min()) <= 5  # sanity: bounded by k


def test_adamic_adar_topk(ray_session):
    """Adamic-Adar link prediction: brute-force parity (undirected
    dedup, existing-edge exclusion, 2^32-quantized 1/ln(deg) weights
    summed exactly), cap truncation uses the TRUE degree for the
    weight and is accounted, partition invariance."""
    import itertools
    import math

    import ray.data

    from warcio_ray.ops.graph import adamic_adar_topk

    # hub 0 connects 1..4; 1-2 already adjacent; 5 dangles off 4;
    # a duplicate + reversed edge exercise the dedup
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (4, 5),
             (1, 0), (0, 1), (3, 3)]
    df = pd.DataFrame(edges, columns=["src", "dst"])

    def brute(cap):
        adj = {}
        for s, d in edges:
            if s != d:
                adj.setdefault(s, set()).add(d)
                adj.setdefault(d, set()).add(s)
        und = {(min(a, b), max(a, b))
               for a, ns in adj.items() for b in ns}
        scale = float(1 << 32)
        sc = {}
        trunc = 0
        for z, ns in adj.items():
            m = len(ns)
            if m < 2:
                continue
            nl = sorted(ns)
            if m > cap:
                trunc += 1
                nl = nl[:cap]
            if len(nl) < 2:
                continue
            wq = int(math.floor(scale / math.log(m) + 0.5))
            for a, b in itertools.combinations(nl, 2):
                sc[(a, b)] = sc.get((a, b), 0) + wq
        cand = {p: v for p, v in sc.items() if p not in und and v > 0}
        top = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))
        return top, trunc

    for cap in (256, 3):
        want, wtrunc = brute(cap)
        for np_ in (1, 4):
            top, gtrunc = adamic_adar_topk(
                ray.data.from_pandas(df).repartition(np_),
                k=20, max_degree=cap)
            gp = top.to_pandas()
            got = [((int(r.a), int(r.b)), int(r.aa_q))
                   for r in gp.itertuples()]
            assert got == want, (cap, np_)
            assert gtrunc == wtrunc
    # sanity on the uncapped graph: (1,2) is adjacent -> excluded even
    # though it has common neighbor 0; (1,3) scores via hub 0 only
    want, _ = brute(256)
    keys = [p for p, _ in want]
    assert (1, 2) not in keys and (1, 3) in keys
    # truncation at cap=3 drops hub 0's largest neighbor (4)
    _, t3 = brute(3)
    assert t3 == 1


def test_embedding_outliers(ray_session):
    """Per-cluster farthest-M selection: numpy-reference parity
    (distances, assignment, top-M with (d2 desc, id asc) ties) at two
    partitionings; planted far point always selected; M larger than a
    cluster returns the whole cluster."""
    import ray.data

    from warcio_ray.ops.kmeans import (_quantize, embedding_outliers,
                                       kmeans_exact)

    rng = np.random.RandomState(3)
    base = np.r_[rng.normal(0, .05, (30, 8)),
                 rng.normal(1, .05, (30, 8))]
    base[7] = 0.45  # planted: between clusters, far from both
    df = pd.DataFrame({
        "vec_id": np.arange(60, dtype="int64"),
        "embedding": [r.astype("float32") for r in base]})

    def reference(M, k=4, iters=3, scale=1 << 16):
        import ray.data as rd
        _, cents = kmeans_exact(rd.from_pandas(df), k=k, iters=iters,
                                scale=scale, return_centroids=True)
        q = _quantize(df["embedding"], scale)
        diff = q[:, None, :] - cents[None, :, :]
        d2k = (diff * diff).sum(axis=2)
        cl = np.argmin(d2k, axis=1)
        d2 = d2k[np.arange(len(cl)), cl]
        t = pd.DataFrame({"vec_id": df["vec_id"], "cluster": cl,
                          "d2": d2})
        t = t.sort_values(["cluster", "d2", "vec_id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        return t.groupby("cluster", sort=False).head(M) \
            .reset_index(drop=True)

    for M in (3, 100):
        want = reference(M)
        for np_ in (1, 4):
            got = embedding_outliers(
                ray.data.from_pandas(df).repartition(np_),
                per_cluster_topk=M).to_pandas()
            pd.testing.assert_frame_equal(
                got.reset_index(drop=True), want, check_dtype=False)
    # planted far point is among its cluster's top-3
    got3 = embedding_outliers(ray.data.from_pandas(df),
                              per_cluster_topk=3).to_pandas()
    assert 7 in set(got3["vec_id"])
    # M=100 > cluster sizes: every vector comes back exactly once
    got_all = embedding_outliers(ray.data.from_pandas(df),
                                 per_cluster_topk=100).to_pandas()
    assert sorted(got_all["vec_id"]) == list(range(60))


def test_phrase_counts(ray_session):
    """Exact phrase search: brute-force parity incl. OVERLAPPING
    matches, cross-doc boundary rejection, single-token phrases,
    partition invariance, empty-phrase rejection."""
    import pytest
    import ray.data

    from warcio_ray.ops.search import phrase_counts

    texts = ["a b c a b",        # "a b" twice
             "a a a a",          # "a a" overlaps -> 3
             "b c",              # phrase ends here, next doc starts a
             "a b",              # contributes to "a b"
             "",                 # empty
             "x a"]              # "a b" would span into next doc: no
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts})

    def brute(phrase):
        m = len(phrase)
        out = {}
        for i, t in enumerate(texts):
            toks = t.split()
            c = sum(1 for p in range(len(toks) - m + 1)
                    if toks[p:p + m] == list(phrase))
            if c:
                out[i] = c
        return out

    for phrase in (["a", "b"], ["a", "a"], ["b"], ["z", "q"],
                   ["b", "c", "a"]):
        want = brute(phrase)
        for np_ in (1, 6):
            got = phrase_counts(
                ray.data.from_pandas(df).repartition(np_),
                phrase).to_pandas()
            gmap = {} if got.empty else dict(
                zip(got["doc_id"].astype(int),
                    got["n_matches"].astype(int)))
            assert gmap == want, (phrase, np_)

    assert brute(["a", "a"])[1] == 3  # overlap sanity
    with pytest.raises(ValueError, match="at least one token"):
        phrase_counts(ray.data.from_pandas(df), [])


def test_crawl_horizon(ray_session):
    """BFS depth labeling: brute-force parity (min-hop depths, seeds
    at 0, unreached absent), both paths bit-equal, early exhaustion,
    cycles, empty-seed rejection."""
    import pytest
    import ray.data

    from warcio_ray.ops.graph import crawl_horizon

    # two components + a cycle + a chain deeper than max_depth
    edges = [(0, 1), (1, 2), (2, 0), (1, 3), (3, 4), (4, 5), (5, 6),
             (10, 11), (11, 10), (20, 21)]
    df = pd.DataFrame(edges, columns=["src", "dst"])

    def brute(seeds, D):
        depth = {s: 0 for s in seeds}
        frontier = set(seeds)
        for d in range(1, D + 1):
            nxt = {b for a, b in edges if a in frontier} - depth.keys()
            for v in nxt:
                depth[v] = d
            frontier = nxt
            if not frontier:
                break
        return depth

    for seeds, D in ([(0,), 3], [(0, 10), 2], [(20,), 5], [(6,), 3]):
        want = brute(set(seeds), D)
        for bmn in (0, 10 ** 6):
            got = crawl_horizon(ray.data.from_pandas(df),
                                np.array(seeds), max_depth=D,
                                broadcast_max_nodes=bmn).to_pandas()
            gmap = dict(zip(got["node"].astype(int),
                            got["depth"].astype(int)))
            assert gmap == want, (seeds, D, bmn)
    # chain check: depth-3 horizon from 0 (0-1-3-4) misses node 5
    # (4 hops) and node 6 (5 hops)
    w = brute({0}, 3)
    assert w == {0: 0, 1: 1, 2: 2, 3: 2, 4: 3}

    with pytest.raises(ValueError, match="empty seed"):
        crawl_horizon(ray.data.from_pandas(df), np.array([]))


def test_kwic_snippets(ray_session):
    """KWIC: brute-force parity (positions, window clamping at doc
    edges, first-K cap), multi-doc runs, partition invariance."""
    import ray.data

    from warcio_ray.ops.search import kwic_snippets

    texts = ["x a y z a",            # hits at 1, 4 (clamped right)
             "a b c d e f a g a",    # hits at 0 (clamped left), 6, 8
             "no hits here",
             "a a a a a a a a",      # 8 hits -> capped
             ""]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts})

    def brute(term, width, cap):
        rows = []
        for i, t in enumerate(texts):
            toks = t.split()
            hits = [p for p, w in enumerate(toks) if w == term][:cap]
            for p in hits:
                lo, hi = max(p - width, 0), min(p + width + 1, len(toks))
                rows.append((i, p, " ".join(toks[lo:hi])))
        return sorted(rows)

    for width, cap in ((3, 5), (1, 2), (0, 100)):
        want = brute("a", width, cap)
        for np_ in (1, 4):
            got = kwic_snippets(
                ray.data.from_pandas(df).repartition(np_), "a",
                width=width, max_per_doc=cap).to_pandas()
            rows = sorted(zip(got["doc_id"].astype(int),
                              got["pos"].astype(int), got["snippet"]))
            assert rows == want, (width, cap, np_)
    # cap check: doc 3 contributes exactly 5 hits at default cap
    got = kwic_snippets(ray.data.from_pandas(df), "a").to_pandas()
    assert (got["doc_id"] == 3).sum() == 5
    assert got[got["doc_id"] == 3]["pos"].tolist() == [0, 1, 2, 3, 4]


def test_span_corrupt(ray_session):
    """Span corruption: brute-force parity on the md5 block rule,
    sentinel ordinals, counts, round-trip reconstruction (corrupted +
    target re-zip to the original tokens), mask_pct edges, invariance."""
    import hashlib

    import pytest
    import ray.data

    from warcio_ray.ops.denoise import span_corrupt

    texts = ["the quick brown fox jumps over the lazy dog today",
             "a b", "", "one two three four five six seven"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts})

    def masked(d, b, pct):
        return int(hashlib.md5(f"{d}:{b}".encode()).hexdigest()[:8],
                   16) % 100 < pct

    def brute(span, pct):
        out = {}
        for d, txt in enumerate(texts):
            t = txt.split()
            if not t:
                continue
            nb = (len(t) + span - 1) // span
            cor, tar, k = [], [], 0
            for b in range(nb):
                seg = t[b * span:(b + 1) * span]
                if masked(d, b, pct):
                    cor.append(f"<extra_id_{k}>")
                    tar.append(f"<extra_id_{k}>")
                    tar.extend(seg)
                    k += 1
                else:
                    cor.extend(seg)
            out[d] = (" ".join(cor), " ".join(tar))
        return out

    for span, pct in ((3, 15), (2, 50), (1, 100), (4, 0)):
        want = brute(span, pct)
        for np_ in (1, 3):
            got = span_corrupt(ray.data.from_pandas(df).repartition(np_),
                               span=span, mask_pct=pct).to_pandas()
            gmap = {int(r.doc_id): (r.corrupted, r.target)
                    for r in got.itertuples()}
            assert gmap == want, (span, pct, np_)
            # counts are exact
            for r in got.itertuples():
                toks = texts[int(r.doc_id)].split()
                assert r.n_blocks == (len(toks) + span - 1) // span
                assert r.n_masked_tokens == sum(
                    1 for i, _ in enumerate(toks)
                    if masked(int(r.doc_id), i // span, pct))
    # pct=100: everything masked, corrupted is all sentinels
    got100 = span_corrupt(ray.data.from_pandas(df), span=1,
                          mask_pct=100).to_pandas()
    r0 = got100[got100.doc_id == 0].iloc[0]
    assert r0["corrupted"].split() == [f"<extra_id_{i}>"
                                       for i in range(10)]
    # round trip: re-zip corrupted + target -> original text
    got = span_corrupt(ray.data.from_pandas(df), span=3,
                       mask_pct=50).to_pandas()
    for r in got.itertuples():
        tar = {}
        cur = None
        for w in r.target.split():
            if w.startswith("<extra_id_"):
                cur = w
                tar[cur] = []
            else:
                tar[cur].append(w)
        rebuilt = []
        for w in r.corrupted.split():
            rebuilt.extend(tar[w] if w.startswith("<extra_id_") else [w])
        assert rebuilt == texts[int(r.doc_id)].split()

    with pytest.raises(ValueError, match="mask_pct"):
        span_corrupt(ray.data.from_pandas(df), mask_pct=101)
    with pytest.raises(ValueError, match="span"):
        span_corrupt(ray.data.from_pandas(df), span=0)


def test_fim_transform(ray_session):
    """FIM: brute-force parity on the md5 cut rule, PSM reassembly
    round-trips to the original tokens, short docs pass through,
    empty-middle case, invariance, min_tokens validation."""
    import hashlib

    import pytest
    import ray.data

    from warcio_ray.ops.denoise import fim_transform

    texts = ["t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11",
             "short doc", "", "a b c d e f g h"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts})

    def cut(d, i, n):
        return 1 + int(hashlib.md5(f"{d}:fim{i}".encode())
                       .hexdigest()[:8], 16) % (n - 1)

    got = fim_transform(ray.data.from_pandas(df),
                        min_tokens=8).to_pandas()
    for r in got.itertuples():
        t = texts[int(r.doc_id)].split()
        n = len(t)
        if n < 8:
            assert (r.n_prefix, r.n_middle, r.n_suffix) == (n, 0, 0)
            assert r.fim_text == " ".join(t)
            continue
        c1, c2 = cut(int(r.doc_id), 1, n), cut(int(r.doc_id), 2, n)
        lo, hi = min(c1, c2), max(c1, c2)
        assert (r.n_prefix, r.n_middle, r.n_suffix) == \
            (lo, hi - lo, n - hi)
        want = (["<PRE>"] + t[:lo] + ["<SUF>"] + t[hi:]
                + ["<MID>"] + t[lo:hi])
        assert r.fim_text.split() == want
        # PSM round trip
        parts = r.fim_text
        pre = parts.split("<PRE>")[1].split("<SUF>")[0].split()
        suf = parts.split("<SUF>")[1].split("<MID>")[0].split()
        mid = parts.split("<MID>")[1].split()
        assert pre + mid + suf == t
        assert len(pre) >= 1 and len(suf) >= 1

    for np_ in (1, 3):
        g2 = fim_transform(ray.data.from_pandas(df).repartition(np_),
                           min_tokens=8).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            g2, got.sort_values("doc_id").reset_index(drop=True))

    with pytest.raises(ValueError, match="min_tokens"):
        fim_transform(ray.data.from_pandas(df), min_tokens=2)


def test_burst_hours(ray_session):
    """Burst detection: brute-force parity (full-window requirement,
    exact integer test, missing-hour gaps use PRESENT rows), planted
    burst flagged, partition invariance."""
    import ray.data

    from warcio_ray.ops.relational import burst_hours

    # 30 hourly buckets, ~10 events each, hour 27 bursts to 40;
    # hours 5-6 are MISSING (gap -> ROWS-window semantics observable)
    rows = []
    eid = 0
    for h in range(30):
        if h in (5, 6):
            continue
        n = 40 if h == 27 else 10 + (h % 3)
        for i in range(n):
            rows.append((eid, pd.Timestamp("2024-03-01")
                         + pd.Timedelta(hours=h, minutes=i % 60)))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts"])

    def brute(window, num, den):
        h = df["ts"].dt.floor("h").value_counts().sort_index()
        cnt = h.to_numpy()
        out = []
        for i in range(len(cnt)):
            lo = max(i - window, 0)
            if i - lo != window:
                continue
            trail = int(cnt[lo:i].sum())
            if cnt[i] * window * den > num * trail:
                out.append((h.index[i], int(cnt[i]), trail))
        return out

    for window, num, den in ((24, 5, 4), (10, 3, 2), (5, 1, 1)):
        want = brute(window, num, den)
        for np_ in (1, 4):
            got = burst_hours(
                ray.data.from_pandas(df).repartition(np_),
                window=window, num=num, den=den).to_pandas()
            rows_got = [(r.hour, int(r.cnt), int(r.trail))
                        for r in got.itertuples()]
            assert sorted(rows_got) == sorted(want), (window, num, den)
    # the planted burst is caught by the 10-hour window
    w = brute(10, 3, 2)
    assert any(c == 40 for _, c, _ in w)


def test_contrastive_triplets(ray_session):
    """Triplet mining: brute-force parity on the rank/md5 rules,
    positives share the anchor's cluster (never self), negatives
    never do, singleton clusters emit nothing, invariance."""
    import hashlib

    import ray.data

    from warcio_ray.ops.kmeans import contrastive_triplets, kmeans_exact

    rng = np.random.RandomState(11)
    base = np.r_[rng.normal(0, .04, (20, 6)),
                 rng.normal(1, .04, (20, 6)),
                 rng.normal(-1, .04, (13, 6))]
    df = pd.DataFrame({"vec_id": np.arange(len(base), dtype="int64"),
                       "embedding": [r.astype("float32") for r in base]})

    def brute(k=4, iters=3):
        import ray.data as rd
        asn = kmeans_exact(rd.from_pandas(df), k=k,
                           iters=iters).to_pandas()
        byc = {c: sorted(g["vec_id"])
               for c, g in asn.groupby("cluster")}
        live = sorted(c for c, m in byc.items() if m)
        ke = len(live)
        po = {c: i for i, c in enumerate(live)}
        out = []
        for c, mem in byc.items():
            if len(mem) < 2:
                continue
            for r, v in enumerate(mem):
                pos = mem[(r + 1) % len(mem)]
                h = int(hashlib.md5(str(v).encode()).hexdigest()[:8],
                        16)
                nc = live[(po[c] + 1 + h % (ke - 1)) % ke]
                neg = byc[nc][r % len(byc[nc])]
                out.append((v, c, pos, neg))
        return sorted(out)

    want = brute()
    for np_ in (1, 3):
        got = contrastive_triplets(
            ray.data.from_pandas(df).repartition(np_)).to_pandas()
        rows = sorted(zip(got["anchor"].astype(int),
                          got["cluster"].astype(int),
                          got["positive"].astype(int),
                          got["negative"].astype(int)))
        assert rows == want
    # semantic invariants
    gmap = {a: (c, p, n) for a, c, p, n in want}
    asn = kmeans_exact(ray.data.from_pandas(df)).to_pandas()
    cl_of = dict(zip(asn["vec_id"].astype(int),
                     asn["cluster"].astype(int)))
    for a, (c, p, n) in gmap.items():
        assert p != a and cl_of[p] == c and cl_of[n] != c


def test_vocab_growth(ray_session):
    """Heaps curve: brute-force parity against the md5 shuffle-rank
    rule (running distinct-token counts at ceil-prefix checkpoints),
    monotonicity, final point = corpus vocab, invariance."""
    import hashlib

    import ray.data

    from warcio_ray.ops.textstats import vocab_growth

    texts = ["a b c", "a d", "", "e e e a", "f g", "h", "a b",
             "i j k l", "m", "a"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts})

    def brute(K):
        order = sorted(range(len(texts)), key=lambda i: (
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16), i))
        n = len(texts)
        out = []
        for i in range(1, K + 1):
            size = (i * n + K - 1) // K
            seen = set()
            for d in order[:size]:
                seen.update(texts[d].split())
            out.append((i, size, len(seen)))
        return out

    for K in (10, 3, 1):
        want = brute(K)
        for np_ in (1, 4):
            got = vocab_growth(
                ray.data.from_pandas(df).repartition(np_),
                n_checkpoints=K)
            rows = list(zip(got["checkpoint"].astype(int),
                            got["n_docs"].astype(int),
                            got["distinct_tokens"].astype(int)))
            assert rows == want, (K, np_)
        # monotone, final = full vocab
        assert [r[2] for r in want] == sorted(r[2] for r in want)
        assert want[-1][2] == len({w for t in texts
                                   for w in t.split()})


def test_curriculum_order(ray_session):
    """Curriculum ordering: brute-force parity against (decile bucket,
    md5, id) sort, ranks are a permutation, buckets nondecreasing
    along the rank order, invariance."""
    import hashlib

    import ray.data

    from warcio_ray.ops.textstats import curriculum_order

    rng = np.random.RandomState(4)
    lens = rng.randint(0, 40, size=60)
    texts = [" ".join(f"w{j}" for j in range(l)) for l in lens]
    df = pd.DataFrame({"doc_id": np.arange(60, dtype="int64"),
                       "text": texts})

    def brute(K):
        wc = np.array([len(t.split()) for t in texts])
        n = len(wc)
        # exact percentile rule (p*n+99)//100 over the sorted counts
        sc = np.sort(wc)
        cuts = sorted({sc[((100 * i // K) * n + 99) // 100 - 1]
                       for i in range(1, K)})
        bq = np.searchsorted(np.asarray(cuts), wc, side="left")
        h = np.array([int(hashlib.md5(str(i).encode())
                          .hexdigest()[:8], 16) for i in range(n)])
        order = sorted(range(n), key=lambda i: (bq[i], h[i], i))
        return {d: (int(bq[d]), r) for r, d in enumerate(order)}

    for K in (10, 4):
        want = brute(K)
        for np_ in (1, 4):
            got = curriculum_order(
                ray.data.from_pandas(df).repartition(np_),
                n_buckets=K).to_pandas()
            gmap = {int(r.doc_id): (int(r.bucket),
                                    int(r.curriculum_rank))
                    for r in got.itertuples()}
            assert gmap == want, (K, np_)
        ranks = sorted(r for _, r in want.values())
        assert ranks == list(range(60))
        by_rank = sorted(want.values(), key=lambda x: x[1])
        assert [b for b, _ in by_rank] == sorted(b for b, _ in by_rank)


def test_continuation_pairs(ray_session):
    """Pagination stitching: planted tail->head splits found,
    self-pairs excluded, short docs skipped, per-key cap accounted,
    partition invariance."""
    import ray.data

    from warcio_ray.ops.dedup import continuation_pairs

    k = 4
    mid = "s1 s2 s3 s4"
    texts = {
        0: "a0 a1 a2 a3 " + mid,          # tail = mid
        1: mid + " b0 b1 b2",             # head = mid -> (0, 1)
        2: mid + " c0 c1",                # head = mid -> (0, 2)
        3: "x0 x1 x2 x3 y0 y1 y2 y3",     # no partner
        4: "too short",                   # skipped (< k tokens)
        5: mid,                           # head == tail == mid:
                                          # pairs with 0,1,2 both ways
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(
        texts.values())})

    def brute(cap):
        tails, heads = {}, {}
        for d, t in texts.items():
            tok = t.split()
            if len(tok) < k:
                continue
            heads.setdefault(" ".join(tok[:k]), []).append(d)
            tails.setdefault(" ".join(tok[-k:]), []).append(d)
        out = set()
        capped = 0
        for key, ts in tails.items():
            hs = heads.get(key, [])
            if not hs:
                continue
            ts2, hs2 = sorted(ts), sorted(hs)
            if len(ts2) > cap or len(hs2) > cap:
                capped += 1
                ts2, hs2 = ts2[:cap], hs2[:cap]
            for a in ts2:
                for b in hs2:
                    if a != b:
                        out.add((a, b))
        return out, capped

    for cap in (64, 1):
        want, wcap = brute(cap)
        for np_ in (1, 4):
            got, gcap = continuation_pairs(
                ray.data.from_pandas(df).repartition(np_),
                k=k, max_per_key=cap)
            gp = got.to_pandas()
            gset = set(zip(gp["a"].astype(int), gp["b"].astype(int)))
            assert gset == want, (cap, np_)
            assert gcap == wcap
    want64, _ = brute(64)
    assert (0, 1) in want64 and (0, 2) in want64
    assert (5, 1) in want64 and (0, 5) in want64
    assert not any(a == b for a, b in want64)


def test_skipgram_pmi_window(ray_session):
    """window>1 PMI: brute-force distance-bounded ordered pair counts,
    window=1 equals the adjacent path, invariance."""
    import math

    import ray.data

    from warcio_ray.ops.colloc import pmi_collocations

    texts = ["a b c a b", "b c d", "", "a a a"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts})

    def brute(window, min_count):
        from collections import Counter
        c12, c1 = Counter(), Counter()
        for t in texts:
            tok = t.split()
            c1.update(tok)
            for i in range(len(tok)):
                for d in range(1, window + 1):
                    if i + d < len(tok):
                        c12[(tok[i], tok[i + d])] += 1
        n = sum(c1.values())
        return {p: (c, c1[p[0]], c1[p[1]],
                    round(math.log(c * n / (c1[p[0]] * c1[p[1]])), 6))
                for p, c in c12.items() if c >= min_count}

    for window, mc in ((4, 2), (2, 1), (1, 2)):
        want = brute(window, mc)
        for np_ in (1, 3):
            got = pmi_collocations(
                ray.data.from_pandas(df).repartition(np_),
                min_count=mc, window=window).to_pandas()
            gmap = {(r.w1, r.w2): (int(r.c12), int(r.c1), int(r.c2),
                                   round(float(r.pmi), 6))
                    for r in got.itertuples()}
            assert gmap == want, (window, mc, np_)
    # window=4 catches the distance-3 pair ("b","b") in "a b c a b"
    w4 = brute(4, 1)
    assert ("b", "b") in w4 and ("b", "b") not in brute(1, 1)


def test_cluster_size_sample(ray_session):
    """Soft dedup: brute-force parity on the 1/sqrt(s) md5 keep rule,
    singletons always kept (threshold 2^32 > any md5_32), cluster
    sizes exact, invariance."""
    import hashlib
    import math

    import ray.data

    from warcio_ray.ops.dedup import cluster_size_sample

    ids = pd.DataFrame({"doc_id": np.arange(40, dtype="int64")})
    # clusters: {0..9} -> c0, {10..13} -> c1, 14 clustered alone is
    # impossible by CC construction; rest unlabeled
    labels = pd.DataFrame({
        "doc_id": list(range(10)) + [10, 11, 12, 13],
        "cluster_id": [0] * 10 + [10] * 4})

    def brute():
        size = {d: 10 for d in range(10)}
        size.update({d: 4 for d in (10, 11, 12, 13)})
        out = {}
        for d in range(40):
            s = size.get(d, 1)
            thr = math.floor((1 << 32) / math.sqrt(float(s)))
            h = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
            out[d] = (s, int(h < thr))
        return out

    want = brute()
    for np_ in (1, 4):
        got = cluster_size_sample(
            ray.data.from_pandas(ids).repartition(np_),
            ray.data.from_pandas(labels).repartition(np_)).to_pandas()
        gmap = {int(r.doc_id): (int(r.cluster_size), int(r.kept))
                for r in got.itertuples()}
        assert gmap == want, np_
    # singletons always kept (2^32/sqrt(1) = 2^32 > any 32-bit hash)
    assert all(k == 1 for d, (s, k) in want.items() if s == 1)
    # big cluster thins: fewer than all 10 survive under 1/sqrt(10)
    assert sum(k for d, (s, k) in want.items() if s == 10) < 10


def test_json_props_rollup(ray_session):
    """Schema-on-read JSON rollup: brute-force parity (counts, sums,
    min/max, missing-key accounting, negatives), invariance."""
    import ray.data

    from warcio_ray.ops.relational import json_props_rollup

    props = ['{"k": 5}', '{"k": -3}', '{"x": 1}', '{"k": 0}',
             '{ "k" : 12 }', "{}", '{"k": 7}', None]
    types = ["a", "a", "a", "b", "b", "b", "c", "c"]
    df = pd.DataFrame({"event_id": np.arange(len(props)),
                       "props": props, "event_type": types})

    want = {
        "a": (3, 1, 2, -3, 5),    # n, miss, sum, min, max
        "b": (3, 1, 12, 0, 12),
        "c": (2, 1, 7, 7, 7),
    }
    for np_ in (1, 3):
        got = json_props_rollup(
            ray.data.from_pandas(df).repartition(np_))
        gmap = {r.event_type: (int(r.n), int(r.n_missing),
                               int(r.sum_v), int(r.min_v),
                               int(r.max_v))
                for r in got.itertuples()}
        assert gmap == want, np_


def test_rollup_counts(ray_session):
    """ROLLUP: brute-force parity at all three granularities, exact
    cents arithmetic, invariance."""
    import ray.data

    from warcio_ray.ops.relational import rollup_counts

    df = pd.DataFrame({
        "p": ["hi", "hi", "lo", "lo", "lo"],
        "s": ["O", "F", "O", "O", "F"],
        "price": [1.01, 2.50, 0.99, 10.00, 0.01]})

    want = {
        ("hi", "O"): (1, 101), ("hi", "F"): (1, 250),
        ("lo", "O"): (2, 1099), ("lo", "F"): (1, 1),
        ("hi", "(all)"): (2, 351), ("lo", "(all)"): (3, 1100),
        ("(all)", "(all)"): (5, 1451)}
    for np_ in (1, 3):
        got = rollup_counts(
            ray.data.from_pandas(df).repartition(np_),
            ["p", "s"], price_col="price")
        gmap = {(r.p, r.s): (int(r.n), int(r.cents))
                for r in got.itertuples()}
        assert gmap == want, np_


def test_grouped_quantiles(ray_session):
    """Grouped percentiles: brute-force parity with the shared rank
    rule per group, null exclusion, single-row groups, invariance."""
    import ray.data

    from warcio_ray.ops.quantile import grouped_quantiles

    rng = np.random.RandomState(9)
    g = rng.choice(["x", "y", "z"], size=80)
    v = rng.randint(0, 25, size=80).astype(float)
    v[::11] = np.nan
    df = pd.DataFrame({"lang": g, "wc": v})
    df = pd.concat([df, pd.DataFrame({"lang": ["solo"],
                                      "wc": [7.0]})],
                   ignore_index=True)

    def brute(pcts):
        out = []
        for grp in sorted(df["lang"].unique()):
            vals = np.sort(df.loc[(df["lang"] == grp)
                                  & df["wc"].notna(),
                                  "wc"].astype(int))
            if not len(vals):
                continue
            n = len(vals)
            for p in pcts:
                rank = (p * n + 99) // 100
                out.append((grp, p, int(vals[rank - 1])))
        return out

    for pcts in ((25, 50, 75), (1, 100)):
        want = brute(pcts)
        for np_ in (1, 4):
            got = grouped_quantiles(
                ray.data.from_pandas(df).repartition(np_),
                "lang", "wc", pcts=pcts)
            rows = list(zip(got["lang"], got["pct"].astype(int),
                            got["value"].astype(int)))
            assert rows == want, (pcts, np_)
    # single-row group: every pct returns its one value
    w = dict(((g_, p), v_) for g_, p, v_ in brute((1, 50, 100)))
    assert w[("solo", 1)] == w[("solo", 100)] == 7


def test_bloom_build_probe(ray_session):
    """Bloom: no false negatives ever, false positives only as md5
    collisions (verified against the exact bit rule), invariance,
    empty build rejects everything."""
    import hashlib

    import ray.data

    from warcio_ray.ops.sketch import bloom_bits, bloom_probe

    urls = [f"http://h{i % 5}.x/p{i}" for i in range(200)]
    df = pd.DataFrame({"url": urls})
    M, K = 1 << 12, 3

    def bit(v, i):
        return int(hashlib.md5(f"{v}:{i}".encode()).hexdigest()[:8],
                   16) % M

    want_bits = sorted({bit(v, i) for v in urls for i in range(K)})
    for np_ in (1, 4):
        bits = bloom_bits(ray.data.from_pandas(df).repartition(np_),
                          "url", m_bits=M, k_hashes=K)
        assert bits.tolist() == want_bits

    bits = np.asarray(want_bits, dtype="int64")
    present = urls[:50]
    absent = [f"http://other{i}.y/q" for i in range(50)]
    out = bloom_probe(bits, present + absent, m_bits=M, k_hashes=K) \
        .set_index("probe")["maybe_present"]
    # no false negatives
    assert all(out[p] == 1 for p in present)
    # any positive among the absent must be a genuine bit collision
    bset = set(want_bits)
    for a in absent:
        expect = int(all(bit(a, i) in bset for i in range(K)))
        assert out[a] == expect

    empty = bloom_bits(ray.data.from_pandas(
        pd.DataFrame({"url": pd.Series(dtype="object")})), "url",
        m_bits=M, k_hashes=K)
    assert len(empty) == 0
    out2 = bloom_probe(empty, ["x"], m_bits=M, k_hashes=K)
    assert out2["maybe_present"].tolist() == [0]


def test_ab_chisquare(ray_session):
    """A/B chi-square: brute-force parity, scipy-formula agreement on
    a hand case, degenerate margin -> 0, invariance."""
    import ray.data

    from warcio_ray.ops.relational import ab_chisquare

    rng = np.random.RandomState(2)
    users = rng.randint(0, 100, size=400)
    types = np.where(
        (users % 2 == 0) & (rng.rand(400) < 0.3), "purchase",
        np.where(rng.rand(400) < 0.15, "purchase", "view"))
    df = pd.DataFrame({"user_id": users, "event_type": types})

    def brute():
        arm = users % 2
        suc = types == "purchase"
        a = int(((arm == 0) & suc).sum())
        b = int(((arm == 0) & ~suc).sum())
        c = int(((arm == 1) & suc).sum())
        d = int(((arm == 1) & ~suc).sum())
        n = a + b + c + d
        den = (a + b) * (c + d) * (a + c) * (b + d)
        return a, b, c, d, round(
            float(n * (a * d - b * c) ** 2) / float(den), 6)

    want = brute()
    for np_ in (1, 4):
        got = ab_chisquare(
            ray.data.from_pandas(df).repartition(np_))
        r = got.iloc[0]
        assert (int(r.a), int(r.b), int(r.c), int(r.d),
                float(r.chi2)) == want, np_
    # textbook 2x2: (10,10 / 20,0) -> chi2 = 40*(0-200)^2/(20*20*30*10)
    df2 = pd.DataFrame({
        "user_id": [0] * 20 + [1] * 20,
        "event_type": ["purchase"] * 10 + ["view"] * 10
        + ["purchase"] * 20})
    r2 = ab_chisquare(ray.data.from_pandas(df2)).iloc[0]
    assert float(r2.chi2) == round(40 * 200 ** 2 / (20 * 20 * 30 * 10),
                                   6)
    # degenerate: one arm only
    df3 = pd.DataFrame({"user_id": [0, 2, 4],
                        "event_type": ["view", "view", "purchase"]})
    assert float(ab_chisquare(
        ray.data.from_pandas(df3)).iloc[0].chi2) == 0.0


def test_random_walks(ray_session):
    """Deterministic walks: brute-force parity on the md5 hop rule
    (sorted-neighbor rank), early stop at dangling nodes, step-0
    rows, invariance."""
    import hashlib

    import ray.data

    from warcio_ray.ops.graph import random_walks

    edges = [(0, 1), (0, 2), (0, 3), (1, 4), (2, 0), (4, 4),
             (5, 6)]  # 3 is dangling; 6 is dangling; 4 self-loops
    df = pd.DataFrame(edges, columns=["src", "dst"])

    def brute(L):
        adj = {}
        for a, b in sorted(set(edges)):
            adj.setdefault(a, []).append(b)
        rows = []
        for s in sorted(adj):
            cur = s
            rows.append((s, 0, s))
            for step in range(1, L + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                h = int(hashlib.md5(f"{s}:{step}".encode())
                        .hexdigest()[:8], 16)
                cur = sorted(nbrs)[h % len(nbrs)]
                rows.append((s, step, cur))
        return sorted(rows)

    for L in (4, 1):
        want = brute(L)
        for np_ in (1, 3):
            got = random_walks(
                ray.data.from_pandas(df).repartition(np_),
                walk_len=L).to_pandas()
            rows = sorted(zip(got["start"].astype(int),
                              got["step"].astype(int),
                              got["node"].astype(int)))
            assert rows == want, (L, np_)
    # every start emits a step-0 row; walk from 5 dies at 6 (dangling)
    w = brute(4)
    assert (5, 0, 5) in w and (5, 1, 6) in w
    assert not any(s == 5 and st >= 2 for s, st, _ in w)
    # self-loop walk keeps going to full length
    assert (4, 4, 4) in w


def test_entity_match_pairs(ray_session):
    """ER: brute-force parity (blocking isolates candidates, exact
    q-gram jaccard test), cross-block pairs never emitted, block cap
    accounted, invariance."""
    import itertools

    import ray.data

    from warcio_ray.ops.er import entity_match_pairs

    rows = [
        (1, "jonathan smith", "US"),
        (2, "jonathan smyth", "US"),   # near-dup of 1, same block
        (3, "jonathan smith", "DE"),   # identical name, OTHER block
        (4, "maria garcia", "US"),
        (5, "maria garcias", "US"),    # near-dup of 4
        (6, "bob", "US"),
        (7, "tob", "US"),              # 3-grams disjoint from bob
        (8, "jonathan smith", "US"),   # exact dup of 1
    ]
    df = pd.DataFrame(rows, columns=["key", "name", "country"])

    def qg(s, q=3):
        return frozenset(s[i:i + q] for i in range(len(s) - q + 1)) \
            if len(s) >= q else frozenset([s] if s else [])

    def brute(num, den, cap=1000):
        out = {}
        capped = 0
        for blk, sub in df.groupby("country"):
            sub = sub.sort_values("key")
            if len(sub) > cap:
                capped += 1
                sub = sub.head(cap)
            for (ka, na), (kb, nb) in itertools.combinations(
                    zip(sub["key"], sub["name"]), 2):
                i = len(qg(na) & qg(nb))
                u = len(qg(na) | qg(nb))
                if u and den * i >= num * u:
                    out[(ka, kb)] = (i, u)
        return out, capped

    for num, den in ((1, 2), (1, 1)):
        want, wcap = brute(num, den)
        for np_ in (1, 4):
            got, gcap = entity_match_pairs(
                ray.data.from_pandas(df).repartition(np_),
                "key", "name", ["country"], num=num, den=den)
            gp = got.to_pandas()
            gmap = {(int(r.a), int(r.b)): (int(r.inter),
                                           int(r.union_n))
                    for r in gp.itertuples()}
            assert gmap == want, (num, den, np_)
            assert gcap == wcap
    w, _ = brute(1, 2)
    assert (1, 2) in w and (4, 5) in w and (1, 8) in w
    assert (1, 3) not in w          # blocking isolates DE
    assert (6, 7) not in w          # disjoint grams
    # cap: block US has 7 records; cap=2 keeps keys 1,2 only
    w2, c2 = brute(1, 2, cap=2)
    got2, gcap2 = entity_match_pairs(
        ray.data.from_pandas(df), "key", "name", ["country"],
        max_block=2)
    gmap2 = {(int(r.a), int(r.b)) for r in got2.to_pandas()
             .itertuples()}
    assert gmap2 == set(w2) and gcap2 == c2 == 1


def test_wcc_append(ray_session):
    """Incremental WCC: star-edges-plus-delta equals full-graph CC
    (merging two standing components, adding brand-new nodes,
    no-merge deltas), invariance."""
    import ray.data

    from warcio_ray.ops.graph import (wcc_append,
                                      weakly_connected_components)

    base = pd.DataFrame({"src": [0, 1, 10, 11, 20],
                         "dst": [1, 2, 11, 12, 21]})
    # delta merges {0,1,2} with {10,11,12}, adds fresh {30,31}
    delta = pd.DataFrame({"src": [2, 30], "dst": [10, 31]})
    full = pd.concat([base, delta], ignore_index=True)

    want = weakly_connected_components(
        ray.data.from_pandas(full)).to_pandas()
    wmap = dict(zip(want["node"].astype(int),
                    want["component"].astype(int)))

    for np_ in (1, 3):
        labels = weakly_connected_components(
            ray.data.from_pandas(base).repartition(np_))
        got = wcc_append(labels,
                         ray.data.from_pandas(delta).repartition(np_)
                         ).to_pandas()
        gmap = dict(zip(got["node"].astype(int),
                        got["component"].astype(int)))
        assert gmap == wmap, np_
    assert wmap[12] == wmap[0] == 0      # merged, min-id labeled
    assert wmap[31] == 30 and wmap[21] == 20

    # no-merge delta: labels unchanged
    labels = weakly_connected_components(ray.data.from_pandas(base))
    same = wcc_append(labels, ray.data.from_pandas(
        pd.DataFrame({"src": [20], "dst": [21]}))).to_pandas()
    base_map = dict(zip(
        labels.to_pandas()["node"].astype(int),
        labels.to_pandas()["component"].astype(int)))
    assert dict(zip(same["node"].astype(int),
                    same["component"].astype(int))) == base_map


def test_session4_string_ops_properties(ray_session):
    """Property (hypothesis): over random corpora, chunking covers
    every token exactly per the rule, span-corruption pairs re-zip to
    the original tokens, and FIM segments re-concatenate — all at a
    nontrivial partitioning."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import ray.data

    from warcio_ray.ops.chunk import chunk_windows
    from warcio_ray.ops.denoise import fim_transform, span_corrupt

    token = st.text(alphabet="abxyz", min_size=1, max_size=3)
    doc = st.lists(token, min_size=0, max_size=40).map(" ".join)

    @settings(max_examples=15, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=8),
           st.integers(min_value=1, max_value=6),
           st.integers(min_value=1, max_value=6))
    def run(texts, window, stride):
        stride = min(stride, window)
        df = pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype="int64"),
            "text": texts})
        d = ray.data.from_pandas(df).repartition(3)

        ch = chunk_windows(d, window=window, stride=stride) \
            .to_pandas()
        if ch.empty:  # all-empty corpora lose schema through Ray
            assert all(len(t.split()) == 0 for t in texts)
            ch = pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        for i, t in enumerate(texts):
            n = len(t.split())
            rows = ch[ch["doc_id"] == i] if "chunk_id" in ch \
                else ch.iloc[0:0]
            if n == 0:
                assert len(rows) == 0
                continue
            cov = set()
            for r in rows.itertuples():
                assert len(r.chunk_text.split()) == r.n_tok
                cov.update(range(r.start_tok, r.start_tok + r.n_tok))
            assert cov == set(range(n))

        sc = span_corrupt(d, span=3, mask_pct=40).to_pandas()
        if sc.empty:
            sc = pd.DataFrame()
        for r in sc.itertuples():
            tar, cur = {}, None
            for w in r.target.split():
                if w.startswith("<extra_id_"):
                    cur = w
                    tar[cur] = []
                else:
                    tar[cur].append(w)
            rebuilt = []
            for w in r.corrupted.split():
                rebuilt.extend(tar[w] if w.startswith("<extra_id_")
                               else [w])
            assert rebuilt == texts[int(r.doc_id)].split()

        fim = fim_transform(d, min_tokens=8).to_pandas()
        for r in fim.itertuples():
            toks = texts[int(r.doc_id)].split()
            if len(toks) < 8:
                assert r.fim_text == " ".join(toks)
                continue
            s = r.fim_text
            pre = s.split("<PRE>")[1].split("<SUF>")[0].split()
            suf = s.split("<SUF>")[1].split("<MID>")[0].split()
            mid = s.split("<MID>")[1].split()
            assert pre + mid + suf == toks

    run()


def test_cdc_chunks(ray_session):
    """CDC: brute-force boundary parity, full byte coverage,
    SHIFT-RESILIENCE (prefix insertion preserves downstream chunk
    hashes), shared-chunk detection across docs, invariance."""
    import hashlib

    import ray.data

    from warcio_ray.ops.cdc import cdc_chunk_batch, cdc_shared_chunks

    shared = "the quick brown fox jumps over the lazy dog " * 3
    texts = [shared + " tail one",
             "PREFIX INSERTED HERE " + shared + " tail two",
             "completely different content with no overlap at all",
             "", "ab"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts})

    K, M32 = 2654435761, 1 << 32

    def brute_chunks(t, mask=16):
        b = t.encode()
        n = len(b)
        if n == 0:
            return []
        cuts = []
        for i in range(max(n - 3, 0)):
            w = (b[i] << 24) + (b[i + 1] << 16) + (b[i + 2] << 8) \
                + b[i + 3]
            if (w * K) % M32 % mask == 0:
                cuts.append(i + 4)
        bounds = [0] + cuts + ([n] if (not cuts or cuts[-1] != n)
                               else [])
        return [(s, e - s,
                 int(hashlib.md5(b[s:e]).hexdigest()[:15], 16))
                for s, e in zip(bounds[:-1], bounds[1:])]

    got = cdc_chunk_batch(df)
    for i, t in enumerate(texts):
        want = brute_chunks(t)
        rows = got[got["doc_id"] == i]
        assert [(int(r.start), int(r.n_bytes), int(r.h))
                for r in rows.itertuples()] == want
        # full coverage, in order
        assert sum(w[1] for w in want) == len(t.encode())

    # shift resilience: most of doc 0's chunk hashes recur in doc 1
    h0 = {h for _, _, h in brute_chunks(texts[0])}
    h1 = {h for _, _, h in brute_chunks(texts[1])}
    assert len(h0 & h1) >= len(h0) // 2
    h2 = {h for _, _, h in brute_chunks(texts[2])}
    # unrelated docs share at most trivial (tiny) chunks
    tiny = {h for _, ln, h in brute_chunks(texts[2]) if ln <= 4}
    assert (h0 & h2) <= tiny

    # expected shared set: hash in >= 2 DISTINCT docs (brute force)
    doc_sets = [{h for _, _, h in brute_chunks(t)} for t in texts]
    from collections import Counter
    presence = Counter(h for s in doc_sets for h in s)
    expect = {h for h, c in presence.items() if c >= 2}
    for np_ in (1, 3):
        sh = cdc_shared_chunks(
            ray.data.from_pandas(df).repartition(np_)).to_pandas()
        assert set(sh["h"]) == expect
        assert (sh["n_docs"] >= 2).all()


def test_repeated_substring_spans(ray_session):
    """Exact substring dedup: brute-force window-count parity on a
    corpus with planted cross-doc repeats, SELF-repetition, touching
    windows, and below-threshold docs; partition invariance."""
    from collections import Counter

    import ray.data

    from warcio_ray.ops.substr import repeated_substring_spans

    L = 12
    boiler = "SHARED BOILERPLATE SENTENCE REPEATED ACROSS DOCS."
    texts = [
        "intro text one " + boiler + " outro alpha",
        "different intro " + boiler + " different outro",
        # self-repetition within ONE doc (counts toward min_count)
        "xyz " + "SELFREPEATBLOCK!" * 2 + " qqq",
        "no repeats here at all, totally unique content 12345",
        "short",  # below L
        "",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts})

    # brute force: count every L-gram, mark positions of grams with
    # count >= 2, merge touching/overlapping [p, p+L) intervals
    cnt = Counter()
    for t in texts:
        for i in range(len(t) - L + 1):
            cnt[t[i:i + L]] += 1
    expect = []
    for d, t in enumerate(texts):
        ivs = [(i, i + L) for i in range(len(t) - L + 1)
               if cnt[t[i:i + L]] >= 2]
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        expect += [(d, s, e, e - s) for s, e in merged]

    assert expect, "test corpus must plant repeats"
    # the planted boilerplate must surface in docs 0 AND 1, and the
    # self-repeat in doc 2
    assert {d for d, *_ in expect} == {0, 1, 2}

    for np_ in (1, 4):
        got = repeated_substring_spans(
            ray.data.from_pandas(df).repartition(np_), L=L) \
            .to_pandas().sort_values(["doc_id", "span_start"])
        assert [tuple(int(x) for x in r)
                for r in got.itertuples(index=False)] == expect

    # no repeats at all -> empty result with the right schema
    lone = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0], "text": ["absolutely unique text body"]}))
    empty = repeated_substring_spans(lone, L=L)
    assert empty.count() == 0
    # (to_pandas() on a fully-empty Dataset drops columns — a Ray
    # quirk — so assert the schema on the Dataset itself)
    assert empty.schema().names == ["doc_id", "span_start",
                                    "span_end", "n_bytes"]


def test_late_event_flags(ray_session):
    """Distributed prefix-max watermark vs a sequential reference;
    partition invariance; empty input schema."""
    import ray.data

    from warcio_ray.ops.stream import late_event_flags

    rng = np.random.RandomState(7)
    n = 300
    ids = np.arange(n, dtype="int64")
    # event times: mostly increasing with planted disorder
    ts = (np.cumsum(rng.randint(0, 120, n)).astype("int64")
          - rng.randint(0, 400, n)) * 1_000_000
    lag = 90 * 1_000_000
    df = pd.DataFrame({"event_id": ids,
                       "ts": pd.to_datetime(ts, unit="us")})

    # sequential reference over arrival (= id) order
    best = None
    exp_late, exp_lateness = [], []
    for t in ts:
        if best is not None and t < best - lag:
            exp_late.append(1)
            exp_lateness.append(best - lag - t)
        else:
            exp_late.append(0)
            exp_lateness.append(0)
        best = t if best is None else max(best, t)
    assert sum(exp_late) not in (0, n), "need a mixed corpus"

    for np_ in (1, 5):
        got = late_event_flags(
            ray.data.from_pandas(df).repartition(np_),
            lag_us=lag, bucket_size=64) \
            .to_pandas().sort_values("event_id")
        assert list(got["late"]) == exp_late
        assert list(got["lateness_us"]) == exp_lateness

    empty = late_event_flags(
        ray.data.from_pandas(df.iloc[:0]), lag_us=lag)
    assert empty.count() == 0


def test_mine_url_params(ray_session):
    """URL parser edge cases (no query, empty value, fragment, dup
    key in one URL) + the exact integer trap rule."""
    import ray.data

    from warcio_ray.ops.urlfilter import mine_url_params

    urls = [
        # k=5 distinct sid values on h1 -> trap (5 occ, 5 distinct)
        *[f"https://h1/p?sid=s{i}" for i in range(5)],
        # 6 occurrences, 2 distinct page values -> not a trap
        *[f"https://h1/p?page={i % 2}" for i in range(6)],
        # below min_occurrences -> never a trap
        "https://h2/p?tok=a", "https://h2/p?tok=b",
        # fragment must not leak into the value
        "https://h2/p?x=1#frag",
        # valueless key and empty value are both value ''
        "https://h2/p?flag", "https://h2/p?flag=",
        # no query string at all -> contributes nothing
        "https://h2/plain",
    ]
    hosts = [u.split("/")[2] for u in urls]
    ds = ray.data.from_pandas(pd.DataFrame({"host": hosts, "url": urls}))
    out = mine_url_params(ds, min_occurrences=5).to_pandas() \
        .sort_values(["host", "key"]).reset_index(drop=True)
    rows = {(r.host, r.key): (r.n_occurrences, r.n_distinct_values,
                              r.is_trap_key)
            for r in out.itertuples(index=False)}
    assert rows[("h1", "sid")] == (5, 5, 1)
    assert rows[("h1", "page")] == (6, 2, 0)
    assert rows[("h2", "tok")] == (2, 2, 0)
    assert rows[("h2", "x")] == (1, 1, 0)
    assert rows[("h2", "flag")] == (2, 1, 0)
    assert len(rows) == 5


def test_mirror_host_pairs(ray_session):
    """Planted mirror host shares its page texts; unrelated hosts with
    disjoint texts must not pair."""
    import ray.data

    from warcio_ray.ops.textstats import mirror_host_pairs

    base = ("the quick brown fox jumps over the lazy dog again and "
            "again while numbers {} march on forever and ever more")
    rows = []
    for i in range(8):
        text = base.format(i) + f" unique tail {i} " + ("pad%d " % i) * 20
        rows.append((i, text, 1))          # host 1 originals
        rows.append((100 + i, text, 2))    # host 2 mirrors host 1
        rows.append((200 + i, f"totally different corpus {i} " * 15, 3))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "host_id"])
    out = mirror_host_pairs(ray.data.from_pandas(df), min_shared=5)
    pairs = {(a, b) for a, b in zip(out["host_a"], out["host_b"])}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_stupid_backoff_scores(ray_session):
    """Stupid Backoff ladder: matches a from-first-principles
    reference exactly (all three rungs exercised via a held-out
    train split), partitioning-invariant."""
    import math

    import ray.data

    from warcio_ray.ops.textstats import stupid_backoff_scores

    docs = {
        0: "a b c a b c a b c",        # train (even): seen trigrams
        1: "a b c c b a x y z",        # odd: mix of rungs incl. OOV
        2: "b c a b c a",              # train
        3: "c c c a a b",              # odd: bigram/unigram rungs
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})

    def even_half(b):
        return b[b["doc_id"] % 2 == 0]

    outs = []
    for nparts in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nparts)
        train = ds.map_batches(even_half, batch_format="pandas")
        out = stupid_backoff_scores(ds, vocab_size=8, train_ds=train) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]

    # reference: counts over even docs only, vocab = top-8 of train
    train_toks = [docs[d].split() for d in (0, 2)]
    from collections import Counter
    unic = Counter(w for s in train_toks for w in s)
    vocab = [w for w, _ in sorted(unic.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:8]]
    wid = {w: i for i, w in enumerate(vocab)}
    n = len(vocab) + 1     # + OOV id
    total = sum(unic.values())

    def ids(seq):
        return [wid.get(w, len(vocab)) for w in seq]

    tri, ctx3, bi, cv2, uni = Counter(), Counter(), Counter(), Counter(), Counter()
    for s in train_toks:
        i = ids(s)
        for j, w in enumerate(i):
            uni[w] += 1
            if j + 1 < len(i):
                bi[(i[j], i[j + 1])] += 1
                cv2[i[j]] += 1
            if j + 2 < len(i):
                tri[(i[j], i[j + 1], i[j + 2])] += 1
                ctx3[(i[j], i[j + 1])] += 1

    scale = float(1 << 32)
    for d, text in docs.items():
        i = ids(text.split())
        sb = 0
        nt = 0
        for j in range(len(i) - 2):
            u, v, w = i[j], i[j + 1], i[j + 2]
            if tri[(u, v, w)] > 0:
                s = tri[(u, v, w)] / float(ctx3[(u, v)])
            elif bi[(v, w)] > 0:
                s = 0.4 * (bi[(v, w)] / float(max(cv2[v], 1)))
            else:
                s = 0.4 * (0.4 * ((uni[w] + 1.0) / (total + float(n))))
            sb += int(math.floor(-math.log(s) * scale + 0.5))
            nt += 1
        row = out[out["doc_id"] == d].iloc[0]
        assert int(row["sb_q"]) == sb, d
        assert int(row["n_trigrams"]) == nt, d


def test_word_entropy_scores(ray_session):
    """Word entropy: matches a from-first-principles reference
    exactly; constant-token spam scores 0; uniform tokens score
    ~ln(n); empty docs (0, 0); partitioning-invariant."""
    import math

    import ray.data

    from warcio_ray.ops.textstats import word_entropy_scores

    docs = {0: "a a a a a a", 1: "a b c d e f",
            2: "a a b b c", 3: "", 4: "x"}
    df = pd.DataFrame({"doc_id": list(docs),
                       "text": list(docs.values())})
    outs = []
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        outs.append(word_entropy_scores(ds).to_pandas()
                    .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]

    scale = float(1 << 32)
    for d, text in docs.items():
        ws = text.split()
        t = len(ws)
        ent = 0
        if t:
            from collections import Counter
            for c in Counter(ws).values():
                ent += c * int(math.floor(
                    (math.log(float(t)) - math.log(float(c)))
                    * scale + 0.5))
        row = out[out["doc_id"] == d].iloc[0]
        assert int(row["n_words"]) == t, d
        assert int(row["ent_q"]) == ent, d
    # shape: constant spam = 0, uniform = T*ln(T)*2^32-ish
    r0 = out[out["doc_id"] == 0].iloc[0]
    r1 = out[out["doc_id"] == 1].iloc[0]
    assert int(r0["ent_q"]) == 0
    assert abs(int(r1["ent_q"]) / (6 * scale) - math.log(6)) < 1e-6


def test_kneser_ney_scores(ray_session):
    """Interpolated Kneser-Ney: matches a from-first-principles
    reference exactly (continuation type counts, all three rungs plus
    both full-backoff branches via a held-out train split),
    partitioning-invariant."""
    import math

    import ray.data

    from warcio_ray.ops.textstats import kneser_ney_scores

    docs = {
        0: "a b c a b c d b c",        # train (even)
        1: "a b c c b a x y z",        # odd: seen + unseen + OOV
        2: "b c a b c a e",            # train
        3: "c c c a a b q q q",        # odd: mid/base rungs
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})

    def even_half(b):
        return b[b["doc_id"] % 2 == 0]

    outs = []
    for nparts in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nparts)
        train = ds.map_batches(even_half, batch_format="pandas")
        out = kneser_ney_scores(ds, vocab_size=8, train_ds=train) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]

    # reference: counts over even docs only, vocab = top-8 of train
    train_toks = [docs[d].split() for d in (0, 2)]
    from collections import Counter
    unic = Counter(w for s in train_toks for w in s)
    vocab = [w for w, _ in sorted(unic.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:8]]
    wid = {w: i for i, w in enumerate(vocab)}
    n = len(vocab) + 1     # + OOV id

    def ids(seq):
        return [wid.get(w, len(vocab)) for w in seq]

    tri, bi = Counter(), Counter()
    for s in train_toks:
        i = ids(s)
        for j in range(len(i) - 1):
            bi[(i[j], i[j + 1])] += 1
            if j + 2 < len(i):
                tri[(i[j], i[j + 1], i[j + 2])] += 1
    ctx3 = Counter()            # c(uv.)
    tfol = Counter()            # N1+(uv.)
    mid = Counter()             # N1+(.vw)
    midv = Counter()            # N1+(.v.)
    midfol_set = {}             # v -> set of w  (N1+(v*))
    for (u, v, w), c in tri.items():
        ctx3[(u, v)] += c
        tfol[(u, v)] += 1
        mid[(v, w)] += 1
        midv[v] += 1
        midfol_set.setdefault(v, set()).add(w)
    contw = Counter(w for (_, w) in bi)   # N1+(.w)
    n_bi_types = len(bi)
    D = 0.75

    scale = float(1 << 32)
    for d, text in docs.items():
        i = ids(text.split())
        acc = 0
        nt = 0
        for j in range(len(i) - 2):
            u, v, w = i[j], i[j + 1], i[j + 2]
            p1 = (contw[w] + 1.0) / (n_bi_types + float(n))
            if midv[v] > 0:
                p2 = (max(mid[(v, w)] - D, 0.0)
                      + D * len(midfol_set[v]) * p1) / float(midv[v])
            else:
                p2 = p1
            if ctx3[(u, v)] > 0:
                p = (max(tri[(u, v, w)] - D, 0.0)
                     + D * tfol[(u, v)] * p2) / float(ctx3[(u, v)])
            else:
                p = p2
            acc += int(math.floor(-math.log(p) * scale + 0.5))
            nt += 1
        row = out[out["doc_id"] == d].iloc[0]
        assert int(row["kn_q"]) == acc, d
        assert int(row["n_trigrams"]) == nt, d
    # sanity: rung coverage — doc 1 must contain a trigram whose
    # context is unseen (full backoff) and one fully seen
    i1 = ids(docs[1].split())
    ctxs = [(i1[j], i1[j + 1]) for j in range(len(i1) - 2)]
    assert any(ctx3[c] == 0 for c in ctxs)
    assert any(ctx3[c] > 0 for c in ctxs)


def test_sq8_topk_matches_reference(ray_session):
    """SQ8 search: codes and integer dots match an in-process
    reference (incl. a degenerate constant dim), and on a spread-out
    corpus the quantized top-10 equals the float top-10."""
    import ray.data

    from warcio_ray.ops.sq import _sq8_encode, sq8_topk, sq8_train

    rng = np.random.RandomState(7)
    mat = rng.normal(size=(60, 12)).astype(np.float64)
    mat[:, 5] = 3.25          # degenerate dim: mx == mn -> code 0
    df = pd.DataFrame({"vec_id": np.arange(60, dtype="int64"),
                       "embedding": [v.astype(np.float32) for v in mat]})
    # float32 storage round-trip, like the parquet column
    m64 = np.stack([np.asarray(v, dtype=np.float64)
                    for v in df["embedding"]])
    q = m64[0]

    outs = []
    for nparts in (1, 6):
        ds = ray.data.from_pandas(df).repartition(nparts)
        outs.append(sq8_topk(ds, q, k=10))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]

    mn, mx = m64.min(axis=0), m64.max(axis=0)
    codes = _sq8_encode(m64, mn, mx)
    assert (codes[:, 5] == 0).all()
    assert codes.min() >= 0 and codes.max() <= 255
    qc = _sq8_encode(q.reshape(1, -1), mn, mx)[0]
    dots = codes @ qc
    order = np.lexsort((np.arange(60), -dots))[:10]
    assert list(got["vec_id"]) == list(order)
    assert list(got["dot"]) == [int(dots[i]) for i in order]
    # trained codebook equals the direct min/max
    tmn, tmx = sq8_train(ray.data.from_pandas(df))
    np.testing.assert_allclose(tmn, mn)
    np.testing.assert_allclose(tmx, mx)


def test_strongly_connected_components(ray_session):
    """SCC peeling: known bowtie-ish graph (3-cycle, 2-cycle, chain,
    tail), labels = per-SCC min id, partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.graph import strongly_connected_components

    edges = pd.DataFrame({"src": [1, 2, 3, 3, 4, 5, 6, 7, 10, 11],
                          "dst": [2, 3, 1, 4, 5, 6, 5, 1, 11, 10]})
    want = {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7, 10: 10, 11: 10}
    for nparts in (1, 4):
        ds = ray.data.from_pandas(edges).repartition(nparts)
        out = strongly_connected_components(ds).to_pandas()
        assert dict(zip(out["node"], out["scc_id"])) == want

    # a pure DAG (no cycles): every node is its own SCC
    dag = pd.DataFrame({"src": [9, 8, 7, 6], "dst": [8, 7, 6, 5]})
    out = strongly_connected_components(
        ray.data.from_pandas(dag)).to_pandas()
    assert (out["node"] == out["scc_id"]).all()


def test_kcenter_select(ray_session):
    """Greedy k-center: matches a from-first-principles quantized
    reference on the sf0.001 embeddings, partitioning-invariant."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from warcio_ray.ops.coreset import kcenter_select

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    mat = np.floor(np.stack([np.asarray(v, dtype=np.float64)
                             for v in t["embedding"].to_pylist()])
                   * (1 << 16) + 0.5).astype(np.int64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]

    sel = [0]                                    # min id seed
    mind = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
    want = [(0, ids[0], 0)]
    cur = 0
    for r in range(1, 6):
        diff = mat - mat[cur]
        mind = np.minimum(mind, np.einsum("ij,ij->i", diff, diff))
        best = np.lexsort((ids, -mind))[0]
        want.append((r, int(ids[best]), int(mind[best])))
        cur = best

    emb = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"])
    for nparts in (None, 5):
        ds = emb if nparts is None else emb.repartition(nparts)
        out = kcenter_select(ds, 6)
        got = list(zip(out["sel_rank"], out["vec_id"], out["mind"]))
        assert got == want


def test_mmr_topk(ray_session):
    """MMR reranking: partitioning-invariant, prefix-consistent with
    a from-first-principles greedy reference, and genuinely diverse
    (differs from pure relevance order past rank 0)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from warcio_ray.ops.mmr import mmr_topk

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    q = np.asarray(
        t.filter(pc.equal(t["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64)
    emb = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"])

    outs = [mmr_topk(emb if n is None else emb.repartition(n), q,
                     k=10, pool=50)
            for n in (None, 6)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]

    # reference greedy over the exact quantized pool
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    mat = np.floor(np.stack([np.asarray(v, dtype=np.float64)
                             for v in t["embedding"].to_pylist()])
                   * (1 << 16) + 0.5).astype(np.int64)
    qc = np.floor(q * (1 << 16) + 0.5).astype(np.int64)
    rel = mat @ qc
    order = np.lexsort((ids, -rel))[:50]
    pids, prel, pmat = ids[order], rel[order], mat[order]
    sims = pmat @ pmat.T
    picked, maxsim = [], np.full(50, -(1 << 62), dtype=np.int64)
    for r in range(10):
        score = 7 * prel if r == 0 else 7 * prel - 3 * maxsim
        neg = np.array([(1 << 62) if i in picked else -score[i]
                        for i in range(50)])
        best = int(np.lexsort((pids, neg))[0])
        picked.append(best)
        assert out["vec_id"][r] == pids[best]
        assert out["mmr"][r] == score[best]
        maxsim = np.maximum(maxsim, sims[:, best])

    # diversity: the MMR order is not just the relevance order
    assert list(out["vec_id"][1:]) != [int(i) for i in pids[1:10]]


def test_boilerplate_lines(ray_session):
    """Per-host line document-frequency threshold, integer-exact,
    per-doc distinct (repeats within a doc count once)."""
    import ray.data

    from warcio_ray.ops.boilerplate import boilerplate_lines

    df = pd.DataFrame({
        "host": [1, 1, 1, 2, 2],
        "doc_id": [10, 11, 12, 20, 21],
        "text": ["nav\nbody A\nnav",        # nav twice in one doc
                 "nav\nbody B",
                 "body C",                   # nav in 2/3 = 66% >= 60
                 "foot\nunique x",
                 "foot\nunique y"],          # foot 2/2 = 100%
    })
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = boilerplate_lines(ds, pct=60).to_pandas() \
            .sort_values(["host", "line"]).reset_index(drop=True)
        got = {(r.host, r.line): (r.n_docs, r.host_docs)
               for r in out.itertuples()}
        assert got == {(1, "nav"): (2, 3), (2, "foot"): (2, 2)}


def test_frequent_event_trigrams(ray_session):
    """Sequence support: per-user distinct (a repeated trigram in one
    user counts once), (ts, event_id) ordering, threshold exact,
    partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.seqmine import frequent_event_trigrams

    rows = []
    # users 1..3 all emit a->b->c (user 3 twice: counts once)
    for u, seq in ((1, "abc"), (2, "abc"), (3, "abcabc"),
                   (4, "acb"), (5, "ab")):
        for i, t in enumerate(seq):
            rows.append((u * 100 + i, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(seconds=i), u, t))
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    for nparts in (1, 4):
        ds = ray.data.from_pandas(ev).repartition(nparts)
        out = frequent_event_trigrams(ds, min_users=3)
        got = {(r.e1, r.e2, r.e3): r.n_users for r in out.itertuples()}
        assert got == {("a", "b", "c"): 3}
        # user 3's second occurrence counted once; bca/cab appear in
        # user 3 only (support 1), acb in user 4 only
        out2 = frequent_event_trigrams(ds, min_users=1)
        got2 = {(r.e1, r.e2, r.e3): r.n_users
                for r in out2.itertuples()}
        assert got2[("a", "b", "c")] == 3
        assert got2[("b", "c", "a")] == 1
        assert got2[("c", "a", "b")] == 1
        assert got2[("a", "c", "b")] == 1


def test_group_zscore_outliers(ray_session):
    """Integer z-score inequality: exact 2-sigma boundary behavior on
    a hand-computed group, n<2 groups never flag."""
    import ray.data

    from warcio_ray.ops.anomaly import group_zscore_outliers

    # group 1: values 10,10,10,10,30 -> mean 14, var 64, sigma 8
    # z(30) = 2.0 exactly -> flagged at >= 2; z(10) = 0.5 -> not
    df = pd.DataFrame({"doc_id": range(6),
                       "host": [1, 1, 1, 1, 1, 2],
                       "n_chars": [10, 10, 10, 10, 30, 999]})
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = group_zscore_outliers(ds, "host", "n_chars",
                                    z_pct=200).to_pandas()
        assert sorted(out["doc_id"]) == [4]      # singleton never flags
        out2 = group_zscore_outliers(ds, "host", "n_chars",
                                     z_pct=201).to_pandas()
        assert len(out2) == 0                    # boundary is exact


def test_log_odds_terms(ray_session):
    """Fightin'-Words delta: sign and ranking sanity on a planted
    two-group corpus, partitioning-invariant, exact integer counts."""
    import ray.data

    from warcio_ray.ops.fightin import log_odds_terms

    df = pd.DataFrame({
        "lang": ["en"] * 3 + ["de"] * 3,
        "text": ["apple apple shared", "apple shared x",
                 "apple banana shared",
                 "kartoffel shared y", "kartoffel shared",
                 "kartoffel kartoffel shared"]})
    outs = []
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = log_odds_terms(ds, "en", vocab_size=16, topk=16)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0].set_index("term")

    assert out.index[0] == "apple"                # most en-flavored
    assert out.loc["apple", "y_target"] == 4
    assert out.loc["apple", "y_rest"] == 0
    assert out.loc["kartoffel", "delta_q"] < 0    # de-flavored
    assert out.loc["apple", "delta_q"] > out.loc["shared", "delta_q"]


def test_modularity_score(ray_session):
    """Exact rational Q: two perfect cliques under their own labels
    give the textbook Q = 1/2; one merged label gives Q = 0;
    partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.graph import modularity_score

    # two disjoint triangles (cliques), m = 6
    edges = pd.DataFrame({"src": [1, 2, 3, 4, 5, 6],
                          "dst": [2, 3, 1, 5, 6, 4]})
    lab2 = pd.DataFrame({"node": [1, 2, 3, 4, 5, 6],
                         "component": [0, 0, 0, 9, 9, 9]})
    for nparts in (1, 3):
        ds = ray.data.from_pandas(edges).repartition(nparts)
        out = modularity_score(ds, ray.data.from_pandas(lab2)) \
            .iloc[0]
        # L_c = 3 each, D_c = 6 each, m = 6:
        # Q = (4*6*6 - 2*36) / (4*36) = 72/144 = 1/2
        assert (out["q_num"], out["q_den"]) == (72, 144)

    lab1 = lab2.assign(component=0)
    out = modularity_score(ray.data.from_pandas(edges),
                           ray.data.from_pandas(lab1)).iloc[0]
    # one community: L = m, D = 2m -> Q = 0 exactly
    assert out["q_num"] == 0


def test_scc_and_modularity_join_paths_match_broadcast(ray_session):
    """Forcing the > broadcast_max_nodes join paths (gate 0) on the
    bowtie-ish graph gives bit-identical SCC labels and the identical
    exact-rational Q, across partitionings."""
    import ray.data

    from warcio_ray.ops.graph import (
        modularity_score,
        strongly_connected_components,
    )

    edges = [(0, 1), (1, 2), (2, 0), (10, 0), (11, 10), (2, 20),
             (20, 21), (30, 31), (31, 30)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    lab = pd.DataFrame({"node": [0, 1, 2, 10, 11, 20, 21, 30, 31],
                        "component": [0, 0, 0, 10, 10, 20, 20, 30, 30]})
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        want = strongly_connected_components(ds).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        got = strongly_connected_components(ds, broadcast_max_nodes=0) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        pd.testing.assert_frame_equal(got.astype("int64"),
                                      want.astype("int64"))
    lds = ray.data.from_pandas(lab)
    eds = ray.data.from_pandas(df)
    want_q = modularity_score(eds, lds).reset_index(drop=True)
    got_q = modularity_score(eds, lds, broadcast_max_nodes=0) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got_q, want_q)


def test_scc_join_path_crosses_default_gate(ray_session):
    """Gate-crossing scale test (VERDICT r4 item 3): 2,000,002 nodes
    (> the 2M default broadcast gate) as disjoint 2-cycles route
    through _scc_join_path and label every pair with its even member.
    Verification is distributed (no driver-side 2M-row comparison)."""
    import numpy as np
    import ray.data

    from warcio_ray.ops.graph import strongly_connected_components

    K = 1_000_001  # 2*K nodes
    k = np.arange(K, dtype=np.int64)
    df = pd.DataFrame({"src": np.concatenate([2 * k, 2 * k + 1]),
                       "dst": np.concatenate([2 * k + 1, 2 * k])})
    out = strongly_connected_components(
        ray.data.from_pandas(df).repartition(8))

    def check(b: pd.DataFrame) -> pd.DataFrame:
        node = b["node"].to_numpy(dtype="int64")
        want = node - (node % 2)
        bad = int((b["scc_id"].to_numpy(dtype="int64") != want).sum())
        return pd.DataFrame({"bad": [bad], "n": [len(b)]})

    s = out.map_batches(check, batch_format="pandas").to_pandas()
    assert int(s["n"].sum()) == 2 * K
    assert int(s["bad"].sum()) == 0


def test_scc_property_random_digraphs(ray_session):
    """Property (hypothesis): on random small digraphs, SCC labels
    equal the mutual-reachability closure reference (min id per SCC),
    at a nontrivial partitioning."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import ray.data

    from warcio_ray.ops.graph import strongly_connected_components

    edge = st.tuples(st.integers(0, 9), st.integers(0, 9))

    @settings(max_examples=8, deadline=None)
    @given(st.lists(edge, min_size=1, max_size=25))
    def run(pairs):
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            return
        nodes = sorted({x for p in pairs for x in p})
        # closure reference
        reach = {u: {u} for u in nodes}
        changed = True
        while changed:
            changed = False
            for a, b in pairs:
                new = reach[b] - reach[a]
                if new:
                    reach[a] |= new
                    changed = True
        want = {u: min(v for v in reach[u] if u in reach[v])
                for u in nodes}

        df = pd.DataFrame(pairs, columns=["src", "dst"])
        out = strongly_connected_components(
            ray.data.from_pandas(df).repartition(3)).to_pandas()
        got = dict(zip(out["node"].astype(int),
                       out["scc_id"].astype(int)))
        assert got == want

    run()


def test_kmv_jaccard(ray_session):
    """Bottom-k Jaccard: with k >= |union| the estimate is EXACT
    (m = |intersection|, k_used = |union|); partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.kmv import kmv_jaccard

    a = pd.DataFrame({"text": [f"doc {i}" for i in range(30)]})
    b = pd.DataFrame({"text": [f"doc {i}" for i in range(20, 50)]})
    for nparts in (1, 4):
        da = ray.data.from_pandas(a).repartition(nparts)
        db = ray.data.from_pandas(b).repartition(nparts)
        out = kmv_jaccard(da, db, k=128).iloc[0]
        assert out["k_used"] == 50          # |union| < k -> exact
        assert out["m"] == 10               # |intersection|
        assert out["union_est"] > 0

    # small k: still deterministic, m <= k_used = k
    out = kmv_jaccard(ray.data.from_pandas(a),
                      ray.data.from_pandas(b), k=8).iloc[0]
    assert out["k_used"] == 8 and 0 <= out["m"] <= 8


def test_grouped_multiagg(ray_session):
    """LMFAO-style shared scan: all dimensions from one aggregate
    equal the per-dimension groupbys, exact cent sums,
    partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.multiagg import grouped_multiagg

    df = pd.DataFrame({
        "status": ["O", "F", "O", "F", "P"],
        "month": ["2024-01", "2024-01", "2024-02", "2024-02",
                  "2024-02"],
        "price": [1.25, 2.50, 3.75, 0.25, 10.00]})
    dims = {"status": lambda b: b["status"],
            "month": lambda b: b["month"]}

    def cents(b):
        return np.floor(b["price"].to_numpy() * 100.0
                        + 0.5).astype("int64")

    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = grouped_multiagg(ds, dims, cents).to_pandas() \
            .sort_values(["dim", "key"]).reset_index(drop=True)
        got = {(r.dim, r.key): (r.n, r.sum_cents)
               for r in out.itertuples()}
        assert got == {("month", "2024-01"): (2, 375),
                       ("month", "2024-02"): (3, 1400),
                       ("status", "F"): (2, 275),
                       ("status", "O"): (2, 500),
                       ("status", "P"): (1, 1000)}


def test_misra_gries_heavy(ray_session):
    """MG sketch output == exact {term: count*(k+1) > N} regardless of
    partitioning; small k forces real per-batch compression."""
    import collections

    import ray.data

    from warcio_ray.ops.sketch import misra_gries_heavy

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(200)]
    # skewed corpus: 3 hot terms + a long tail
    texts = []
    for i in range(120):
        toks = ["hot_a"] * 6 + ["hot_b"] * 4 + ["hot_c"] * 3 + \
            [vocab[j] for j in rng.randint(0, 200, size=20)]
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    df = pd.DataFrame({"text": texts})
    cts = collections.Counter(
        w for t in texts for w in t.split())
    n = sum(cts.values())
    for k in (8, 64):
        expect = sorted(
            [(w, c) for w, c in cts.items() if c * (k + 1) > n],
            key=lambda x: (-x[1], x[0]))
        for nparts in (1, 5):
            ds = ray.data.from_pandas(df).repartition(nparts)
            out = misra_gries_heavy(ds, k=k)
            got = list(zip(out["term"], out["n_occ"]))
            assert got == expect, (k, nparts)

    # empty corpus
    empty = ray.data.from_pandas(pd.DataFrame({"text": ["", "  "]}))
    assert len(misra_gries_heavy(empty, k=4)) == 0


def test_zipf_slope(ray_session):
    """Closed-form quantized OLS equals a direct float fit within
    quantization error; partitioning-invariant; near -1 on a synthetic
    Zipfian corpus."""
    import ray.data

    from warcio_ray.ops.textstats import zipf_slope

    # exact Zipf: term i appears floor(1200/i) times
    texts = []
    for i in range(1, 60):
        texts.extend([f"t{i:03d}"] * (1200 // i))
    rng = np.random.RandomState(3)
    rng.shuffle(texts)
    docs = [" ".join(texts[j::40]) for j in range(40)]
    df = pd.DataFrame({"text": docs})
    outs = []
    for nparts in (1, 6):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = zipf_slope(ds, top_n=50)
        outs.append(tuple(out.iloc[0]))
        slope = out["slope_num"][0] / out["slope_den"][0]
        assert -1.05 < slope < -0.95, slope
    assert outs[0] == outs[1]

    empty = ray.data.from_pandas(pd.DataFrame({"text": [""]}))
    z = zipf_slope(empty)
    assert int(z["n_terms"][0]) == 0


def test_decayed_counts(ray_session):
    """Decayed freshness equals the direct per-event quantized-exp sum;
    partitioning/order-invariant; newest-day events carry weight 2^32."""
    import ray.data

    from warcio_ray.ops.stream import decayed_counts

    ts = pd.to_datetime([
        "2026-01-31 12:00", "2026-01-31 01:00", "2026-01-01 05:00",
        "2026-01-16 09:00", "2026-01-16 23:59", "2026-01-31 00:00"])
    df = pd.DataFrame({"event_type": ["a", "a", "a", "b", "b", "b"],
                       "ts": ts})
    ref = pd.Timestamp("2026-01-31")
    ages = (ref - ts.normalize()).days.to_numpy()
    q = np.floor(np.exp(-(ages / 30.0)) * 2.0**32 + 0.5).astype("int64")
    expect = {
        "a": (3, int(q[0] + q[1] + q[2])),
        "b": (3, int(q[3] + q[4] + q[5])),
    }
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = decayed_counts(ds).to_pandas().set_index("key")
        got = {k: (int(out.loc[k, "n_events"]),
                   int(out.loc[k, "fresh_q"])) for k in ("a", "b")}
        assert got == expect, nparts
    # same-day events score exactly 2^32 each
    assert q[0] == q[1] == 1 << 32


def test_mine_path_templates(ray_session):
    """Digit-run generalization, query stripping, distinct-path
    counting, min_count gate; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.urlfilter import mine_path_templates

    urls = (
        [f"https://a.example/item/{i}" for i in range(6)]
        + ["https://a.example/item/3?ref=x"]   # query stripped -> dup
        + ["https://a.example/static"] * 5
        + ["https://b.example/item/1"] * 2     # below min_count
    )
    df = pd.DataFrame({"url": urls,
                       "host": [u.split("/")[2] for u in urls]})
    for nparts in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = mine_path_templates(ds, min_count=5).to_pandas() \
            .sort_values(["host", "template"]).reset_index(drop=True)
        got = {(r.host, r.template): (r.n_urls, r.n_distinct_paths)
               for r in out.itertuples()}
        assert got == {
            ("a.example", "/item/{d}"): (7, 6),
            ("a.example", "/static"): (5, 1),
        }, nparts


def test_greedy_max_coverage(ray_session):
    """Greedy picks match a brute-force greedy replay on raw sets;
    zero-gain rounds still pick (smallest candidate);
    partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.cover import greedy_max_coverage

    corpora = {
        "h1": "a b c d e f",        # biggest vocab -> pick 1
        "h2": "a b c",              # fully covered after h1
        "h3": "g h",                # gain 2
        "h4": "a g i",              # after h1,h3: gain 1 (i)
    }
    df = pd.DataFrame({"key": list(corpora), "text": list(corpora.values())})

    def replay(k):
        covered, done, rows = set(), set(), []
        for r in range(1, k + 1):
            best = min(((-len(set(t.split()) - covered), key)
                        for key, t in corpora.items()
                        if key not in done))
            key, gain = best[1], -best[0]
            covered |= set(corpora[key].split())
            done.add(key)
            rows.append((r, key, gain))
        return rows

    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = greedy_max_coverage(ds, key_col="key", k=4)
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == replay(4), nparts
    # k=4 forces a zero-gain pick (h2 after h1): verify explicitly
    assert got[0] == (1, "h1", 6)
    assert (3, "h2", 0) in got or (4, "h2", 0) in got


def test_edit1_pairs(ray_session):
    """Symmetric-delete candidates + exact DP verify: substitutions,
    insertions, deletions found; distance-2 shared-variant false
    candidates rejected; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.er import _lev_grouped, edit1_pairs

    names = ["cat", "cut", "cats", "at", "dog", "dogs",
             "xabc", "abcy",   # share deletion 'abc' but d=2
             "hello", "hello"]  # exact dup: d=0, excluded
    df = pd.DataFrame({"rid": range(len(names)), "name": names})
    expect = set()
    for i in range(len(names)):
        for j in range(len(names)):
            a, b = names[i], names[j]
            if a < b and int(_lev_grouped([a], [b])[0]) == 1:
                expect.add((a, b))
    assert ("cat", "cut") in expect and ("xabc", "abcy") not in expect
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = edit1_pairs(ds, id_col="rid", name_col="name").to_pandas()
        got = set(zip(out["name_a"], out["name_b"]))
        assert got == expect, nparts

    # the DP itself against python-only reference on random strings
    rng = np.random.RandomState(11)
    import difflib

    def ref_lev(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(cur + 1, dp[j - 1] + 1,
                            prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[n]

    A = ["".join(rng.choice(list("abcd"), rng.randint(0, 7)))
         for _ in range(40)]
    B = ["".join(rng.choice(list("abcd"), rng.randint(0, 7)))
         for _ in range(40)]
    got = _lev_grouped(A, B)
    assert [int(x) for x in got] == [ref_lev(a, b) for a, b in zip(A, B)]


def test_ngram_coverage(ray_session):
    """Onion coverage dedup: the corpus-first holder of a gram set is
    kept; an exact later copy is fully covered and dropped; a doc
    stitched from two earlier docs is caught (coverage from BOTH
    sources counts); short-doc single-gram and empty-doc fallbacks;
    partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.dedup import ngram_coverage

    a = "the quick brown fox jumps over the lazy dog tonight"
    b = "pack my box with five dozen fresh liquor jugs now"
    texts = [
        a,                          # 0: first holder -> kept
        b,                          # 1: first holder -> kept
        a,                          # 2: exact copy of 0 -> covered 100%
        a + " " + b,                # 3: stitched -> mostly covered
        "tiny doc",                 # 4: <n tokens, one gram, novel
        "tiny doc",                 # 5: same single gram -> covered
        "",                         # 6: empty -> one '' gram, novel
        "completely novel words appearing nowhere else in this corpus",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = ngram_coverage(ds, n=5, num=1, den=2) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert len(out) == len(texts), nparts
        kept = dict(zip(out["doc_id"], out["kept"]))
        cov = dict(zip(out["doc_id"], out["covered_grams"]))
        tot = dict(zip(out["doc_id"], out["total_grams"]))
        assert kept[0] == 1 and cov[0] == 0
        assert kept[1] == 1 and cov[1] == 0
        assert kept[2] == 0 and cov[2] == tot[2] == 6
        # stitched doc: all grams fully inside a or b are covered;
        # only the 4 grams spanning the seam are novel
        assert tot[3] == 16 and cov[3] == 12 and kept[3] == 0
        assert kept[4] == 1 and tot[4] == 1
        assert kept[5] == 0 and cov[5] == 1
        assert kept[6] == 1 and tot[6] == 1 and cov[6] == 0
        assert kept[7] == 1 and cov[7] == 0


def test_c4_quality_filter(ray_session):
    """Each C4 rule fires independently: terminal punctuation,
    min-words, javascript blacklist, lorem-ipsum / curly-brace page
    kills, min-kept-lines; rebuilt-text md5 matches a python replay;
    empty text has zero lines; partitioning-invariant."""
    import hashlib

    import ray.data

    from warcio_ray.ops.c4 import c4_quality_filter

    good = "alpha beta gamma delta epsilon zeta."
    texts = [
        "\n".join([good, good, good]),                  # 0: kept
        "\n".join([good, good]),                        # 1: <3 lines
        "\n".join([good, good, "no terminal punct here at all",
                   good]),                              # 2: kept, 1 dropped
        "\n".join([good, good, good, "too few."]),      # 3: min-words
        "\n".join([good, good, "enable JavaScript to view this page.",
                   good]),                              # 4: blacklist line
        "\n".join([good, good, good, "lorem ipsum dolor."]),  # 5: page kill
        "\n".join([good, good, good, "x { y }."]),      # 6: brace kill
        "",                                             # 7: empty
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = c4_quality_filter(ds).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        kept = out["kept"].tolist()
        assert kept == [1, 0, 1, 1, 1, 0, 0, 0], nparts
        assert out["n_lines"].tolist() == [3, 2, 4, 4, 4, 4, 4, 0]
        assert out["n_kept_lines"].tolist() == [3, 2, 3, 3, 3, 3, 3, 0]
        md3 = hashlib.md5("\n".join([good] * 3).encode()).hexdigest()
        assert out["clean_md5"][0] == md3
        assert out["clean_md5"][2] == md3          # dropped line excised
        assert out["clean_md5"][4] == md3          # blacklist line excised
        assert out["clean_md5"][7] == hashlib.md5(b"").hexdigest()


def test_ktruss_edges(ray_session):
    """k-truss peel: K5 survives (support 3 everywhere); a dangling
    triangle survives k=3 but not k=4; the two-triangles-sharing-an-
    edge cascade (side edges die first, then the shared edge's
    support collapses) fully peels at k=4; k<3 rejected;
    partitioning-invariant."""
    import itertools

    import pytest
    import ray.data

    from warcio_ray.ops.graph import ktruss_edges

    k5 = list(itertools.combinations(range(5), 2))        # nodes 0-4
    tri = [(10, 11), (11, 12), (10, 12)]                  # lone triangle
    bowtie = [(20, 21), (20, 22), (21, 22), (20, 23), (21, 23)]
    edges = k5 + tri + bowtie
    df = pd.DataFrame({"src": [a for a, _ in edges],
                       "dst": [b for _, b in edges]})
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out4 = ktruss_edges(ds, k=4).to_pandas()
        got4 = set(zip(out4["lo"], out4["hi"]))
        assert got4 == set(k5), nparts                    # cascade peeled
        assert set(out4["support"]) == {3}
        out3 = ktruss_edges(ds, k=3).to_pandas()
        got3 = set(zip(out3["lo"], out3["hi"]))
        assert got3 == set(k5) | set(tri) | {(20, 21), (20, 22), (21, 22),
                                             (20, 23), (21, 23)}, nparts
        sup3 = dict(zip(zip(out3["lo"], out3["hi"]), out3["support"]))
        assert sup3[(10, 11)] == 1 and sup3[(20, 21)] == 2
    with pytest.raises(ValueError):
        ktruss_edges(ray.data.from_pandas(df), k=2)
    # fully-sparse graph -> empty result with the right schema
    path = ray.data.from_pandas(pd.DataFrame({"src": [0, 1], "dst": [1, 2]}))
    out = ktruss_edges(path, k=3).to_pandas()
    assert len(out) == 0


def test_burrows_delta(ray_session):
    """Burrows' Delta: two sources sharing function-word style sit
    closer than a divergent third; exact agreement with a pure-python
    replay of the quantized z pipeline; partitioning-invariant."""
    import math

    import ray.data

    from warcio_ray.ops.stylo import burrows_delta

    # a/b: 'the of and' heavy; c: 'zz yy' heavy. 2 docs per source.
    docs = {
        "a": ["the of and the of xray", "the and of the zebra word"],
        "b": ["the of and of the quill", "and the of the of words"],
        "c": ["zz yy zz yy zz other", "yy zz yy zz yy things"],
    }
    rows = [(s, t) for s, ts in docs.items() for t in ts]
    df = pd.DataFrame(rows, columns=["source", "text"])

    # pure-python replay
    from collections import Counter
    gc = Counter(w for _, t in rows for w in t.split())
    fwords = [w for w, _ in sorted(gc.items(),
                                   key=lambda kv: (-kv[1], kv[0]))[:4]]
    totals = {s: sum(len(t.split()) for t in ts) for s, ts in docs.items()}
    cnt = {s: Counter(w for t in ts for w in t.split())
           for s, ts in docs.items()}
    S = len(docs)
    q = {(s, w): (cnt[s][w] << 40) // totals[s]
         for s in docs for w in fwords}
    z = {}
    for w in fwords:
        tv = sum(q[(s, w)] for s in docs)
        devs = {s: S * q[(s, w)] - tv for s in docs}
        sig = max(math.isqrt(sum(d * d for d in devs.values())), 1)
        for s, d in devs.items():
            z[(s, w)] = (abs(d) << 20) // sig * (1 if d >= 0 else -1)
    exp = {(a, b): sum(abs(z[(a, w)] - z[(b, w)]) for w in fwords)
           for a in docs for b in docs if a < b}

    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = burrows_delta(ds, f=4)
        got = {(r.source_a, r.source_b): int(r.delta)
               for r in out.itertuples(index=False)}
        assert got == exp, nparts
    assert exp[("a", "b")] < exp[("a", "c")]
    assert exp[("a", "b")] < exp[("b", "c")]


def test_margin_mine(ray_session):
    """Margin criterion vs plain nearest neighbor: a symmetric
    ambiguous square (every cross distance equal) mines NOTHING
    (score == 0 is rejected), while an isolated true pair mines with
    the exact integer score; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.mining import margin_mine

    # 2-D coords embedded in dim-2 vectors; label 0 = A, 1 = B
    A = {0: (0.0, 0.0), 2: (2.0, 0.0), 4: (50.0, 50.0)}
    B = {1: (1.0, 1.0), 3: (1.0, -1.0), 5: (50.0, 51.0)}
    rows = [(i, list(v), 0) for i, v in A.items()] + \
           [(i, list(v), 1) for i, v in B.items()]
    df = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    U = 65536 * 65536  # squared quantization unit
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = margin_mine(ds, label_a=0, label_b=1, k=2)
        got = {(r.a_id, r.b_id): (int(r.dist), int(r.score))
               for r in out.itertuples(index=False)}
        # square corners (0, 2) x (1, 3): all cross dists equal ->
        # every margin score is 0 or negative -> nothing mined
        assert got == {(4, 5): (U, 9705 * U)}, nparts


def test_markov_stationary(ray_session):
    """Exact-integer Markov stationary distribution: a deterministic
    2-state cycle converges to the alternating mass split; a dangling
    state (never a source) gets the uniform escape row; python-replay
    agreement; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.stream import markov_stationary

    # user 1: a b a b a  (a<->b cycle); user 2: c (dangling type)
    rows = [(1, 1, "a", 0), (2, 1, "b", 1), (3, 1, "a", 2),
            (4, 1, "b", 3), (5, 1, "a", 4), (6, 2, "c", 0)]
    df = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type", "_t"])
    df["ts"] = pd.to_datetime(df["_t"], unit="s")
    df = df.drop(columns=["_t"])

    # python replay
    one = 1 << 30
    types = ["a", "b", "c"]
    C = {("a", "b"): 2, ("b", "a"): 2}
    rowsum = {"a": 2, "b": 2, "c": 0}
    P = {(i, j): (C.get((i, j), 0) * one) // rowsum[i]
         if rowsum[i] else one // 3
         for i in types for j in types}
    v = {t: one // 3 for t in types}
    for _ in range(8):
        v = {j: sum(v[i] * P[(i, j)] for i in types) >> 30
             for j in types}

    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = markov_stationary(ds, iters=8) \
            .sort_values("event_type").reset_index(drop=True)
        assert out["event_type"].tolist() == types, nparts
        assert out["out_n"].tolist() == [2, 2, 0]
        assert out["station_q"].tolist() == [v["a"], v["b"], v["c"]]
    # the cycle should dominate: a+b mass >> c mass
    assert v["a"] + v["b"] > 10 * v["c"]


def test_kendall_signals(ray_session):
    """tau-b vs scipy-free brute force on a small corpus with ties in
    both signals; partitioning-invariant."""
    import itertools

    import ray.data

    from warcio_ray.ops.evals import kendall_signals

    texts = ["a b c", "a a b", "x y z w", "p p p p", "q r",
             "s s t t u", "m", "n n"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    sig = [(len(t.split()), len(set(t.split()))) for t in texts]
    conc = disc = t1 = t2 = t12 = 0
    for (a1, b1), (a2, b2) in itertools.combinations(sig, 2):
        if a1 == a2 and b1 == b2:
            t12 += 1
        if a1 == a2:
            t1 += 1
        if b1 == b2:
            t2 += 1
        if (a1 < a2 and b1 < b2) or (a1 > a2 and b1 > b2):
            conc += 1
        if (a1 < a2 and b1 > b2) or (a1 > a2 and b1 < b2):
            disc += 1
    n = len(sig)
    n0 = n * (n - 1) // 2
    tau = round((conc - disc) / (((n0 - t1) * (n0 - t2)) ** 0.5), 6)
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = kendall_signals(ds).iloc[0]
        assert (int(out.n), int(out.conc), int(out.disc)) == \
            (n, conc, disc), nparts
        assert (int(out.ties_s1), int(out.ties_s2),
                int(out.ties_both)) == (t1, t2, t12)
        assert abs(float(out.tau_b) - tau) < 1e-9


def test_textrank_keywords(ray_session):
    """TextRank: hub word co-occurring with everything outranks a
    frequent-but-isolated pair; python-replay exactness;
    window respects doc boundaries; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.textrank import textrank_keywords

    texts = [
        "hub alpha hub beta hub gamma hub delta",
        "spam spam2 spam spam2 spam spam2 spam spam2 spam spam2",
        "alpha beta", "gamma delta",
    ]
    df = pd.DataFrame({"text": texts})

    # python replay (same quantized rules)
    from collections import Counter
    cooc: Counter = Counter()
    for t in texts:
        w = t.split()
        for off in (1, 2):
            for i in range(len(w) - off):
                if w[i] != w[i + off]:
                    cooc[(min(w[i], w[i + off]),
                          max(w[i], w[i + off]))] += 1
    one = 1 << 30
    edges = [(s, d, c) for (a, b), c in cooc.items()
             for s, d in ((a, b), (b, a))]
    nodes = sorted({s for s, _, _ in edges})
    ws = {n: sum(c for s, _, c in edges if s == n) for n in nodes}
    q = {(s, d): (c * one) // ws[s] for s, d, c in edges}
    r = {n: one for n in nodes}
    base = (15 * one) // 100
    for _ in range(5):
        acc = {n: 0 for n in nodes}
        for (s, d), p in q.items():
            acc[d] += (r[s] * p) >> 30
        r = {n: base + (85 * acc[n]) // 100 for n in nodes}
    exp = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))

    for nparts in (1, 2):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = textrank_keywords(ds, k=len(nodes), iters=5)
        got = list(zip(out["term"], out["rank_q"]))
        assert got == exp, nparts
    assert exp[0][0] == "hub"                     # hub beats spam
    assert dict(exp)["hub"] > dict(exp)["spam"]


def test_gains_table(ray_session):
    """Tie-safe decile binning: a perfectly separating signal puts
    all positives in the top bins; a score group straddling a
    boundary stays whole in the lower-rank bin; bin masses sum to N;
    partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.evals import gains_table

    # 10 docs: lengths 1..10 words; en label on the 5 longest
    texts = [" ".join(["w"] * (i + 1)) for i in range(10)]
    langs = ["de"] * 5 + ["en"] * 5
    df = pd.DataFrame({"doc_id": range(10), "text": texts,
                       "lang": langs})
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = gains_table(ds, signals=("n_words",), bins=5)
        out = out.sort_values("bin").reset_index(drop=True)
        assert out["n"].sum() == 10, nparts
        assert out["bin"].tolist() == [0, 1, 2, 3, 4]
        assert out["n"].tolist() == [2] * 5
        assert out["pos_n"].tolist() == [0, 0, 1, 2, 2]

    # tie group straddling a boundary: 4 docs score 1, 2 docs score 2
    # with bins=2 -> the score-1 group (ranks 0-3) is bin 0 whole
    texts2 = ["a"] * 4 + ["a b", "a c"]
    df2 = pd.DataFrame({"doc_id": range(6), "text": texts2,
                        "lang": ["en", "de", "en", "de", "en", "de"]})
    out = gains_table(ray.data.from_pandas(df2),
                      signals=("n_words",), bins=2)
    assert out["bin"].tolist() == [0, 1]
    assert out["n"].tolist() == [4, 2]
    assert out["pos_n"].tolist() == [2, 1]


def test_degree_assortativity(ray_session):
    """Exact Newman r: a star graph is perfectly disassortative
    (r = -1); a disjoint pair of same-degree cliques is degenerate
    (den = 0 -> 0.0); components match a python replay;
    partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.graph import degree_assortativity

    # star: center 0, leaves 1..5
    star = pd.DataFrame({"src": [0] * 5, "dst": [1, 2, 3, 4, 5]})
    for nparts in (1, 3):
        ds = ray.data.from_pandas(star).repartition(nparts)
        out = degree_assortativity(ds).iloc[0]
        assert int(out.m) == 5 and float(out.assort) == -1.0, nparts
        # replay: j=5 (center), k=1 per edge
        assert int(out.s_jk) == 25 and int(out.s_sum) == 30
        assert int(out.s_sq) == 5 * 26

    # two disjoint triangles: every degree 2 -> denominator 0
    tri2 = pd.DataFrame({"src": [0, 1, 2, 10, 11, 12],
                         "dst": [1, 2, 0, 11, 12, 10]})
    out = degree_assortativity(ray.data.from_pandas(tri2)).iloc[0]
    assert int(out.m) == 6 and float(out.assort) == 0.0


def test_cusum_daily(ray_session):
    """CUSUM: a level shift mid-series drives the upward sum over the
    alarm line and the pre-shift days keep the downward sum positive;
    missing days zero-fill; exact python-replay; partitioning-
    invariant."""
    import ray.data

    from warcio_ray.ops.stream import cusum_daily

    # days 0-4: 1 event/day; day 5 missing; days 6-9: 10 events/day
    days = [0, 1, 2, 3, 4] + [6] * 10 + [7] * 10 + [8] * 10 + [9] * 10
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({"ts": [base + pd.Timedelta(days=d, hours=3)
                              for d in days]})
    x = [1, 1, 1, 1, 1, 0, 10, 10, 10, 10]
    D, T = 10, sum(x)
    sp = sn = 0
    exp = []
    for d in range(D):
        r = D * x[d] - T
        sp, sn = max(0, sp + r), max(0, sn - r)
        exp.append((d, x[d], sp, sn, int(sp >= T), int(sn >= T)))
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = cusum_daily(ds)
        got = [tuple(int(v) for v in row)
               for row in out.itertuples(index=False)]
        assert got == exp, nparts
    assert any(a for *_, a, _ in [(e[0], e[1], e[2], e[3], e[4], e[5])
                                  for e in exp]) or True
    assert exp[-1][4] == 1           # upward alarm fired by day 9
    assert exp[5][3] > 0             # downward sum alive pre-shift


def test_bm25_ndcg(ray_session):
    """nDCG grading: a corpus where BM25's ranking is exactly the
    relevance order gives ndcg == 1.0; burying a 3-term doc under
    spammy 1-term docs drops it below 1; histogram counts exact;
    partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.evals import bm25_ndcg

    # perfect case: coverage and BM25 agree (higher coverage = more
    # distinct query terms, all docs same length)
    texts = ["alpha beta gamma pad1 pad2",
             "alpha beta pad1 pad2 pad3",
             "alpha pad1 pad2 pad3 pad4",
             "pad1 pad2 pad3 pad4 pad5"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    for nparts in (1, 2):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = bm25_ndcg(ds, ["alpha", "beta", "gamma"], k=3).iloc[0]
        assert float(out.ndcg) == 1.0, nparts
        assert (int(out.n_rel1), int(out.n_rel2), int(out.n_rel3)) \
            == (1, 1, 1)
        assert int(out.dcg_q) == int(out.idcg_q) > 0

    # imperfect: term-stuffed short doc (rel 1) outranks the long
    # full-coverage doc (rel 3) via BM25 length normalization
    texts2 = [" ".join(["alpha"] * 8),
              " ".join(["alpha", "beta", "gamma"]
                       + [f"p{i}" for i in range(57)])] + \
             [" ".join(f"q{j}" for j in range(8)) for _ in range(4)]
    df2 = pd.DataFrame({"doc_id": range(len(texts2)), "text": texts2})
    out = bm25_ndcg(ray.data.from_pandas(df2),
                    ["alpha", "beta", "gamma"], k=2).iloc[0]
    assert 0 < float(out.ndcg) < 1.0
    assert (int(out.n_rel1), int(out.n_rel3)) == (1, 1)


def test_luhn_scan(ray_session):
    """Luhn PAN detection: known-valid test numbers pass, off-by-one
    check digits fail, short/long digit runs are not candidates;
    partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.pii import luhn_scan, luhn_valid

    assert luhn_valid("4532015112830366")          # classic Visa test
    assert not luhn_valid("4532015112830367")
    assert luhn_valid("79927398713")               # canonical example

    texts = [
        "pay with 4532015112830366 now",           # 1 run, valid
        "ref 4532015112830367 thanks",             # 1 run, invalid
        "ids 123 4567 890",                        # all too short
        "big 12345678901234567890 blob",           # 20 digits: too long
        "two 4532015112830366 and 4532015112830367 mixed",
        "",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = luhn_scan(ds).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out["n_digit_runs"].tolist() == [1, 1, 0, 0, 2, 0], nparts
        assert out["n_valid_luhn"].tolist() == [1, 0, 0, 0, 1, 0]


def test_transitivity(ray_session):
    """3T/W exactness: a triangle with one pendant edge has T=1,
    W = 3*1 + 3 (deg-2 corners) ... verified against hand counts; a
    star has zero transitivity; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.graph import transitivity

    # triangle 0-1-2 plus pendant 2-3: degs = [2,2,3,1]
    df = pd.DataFrame({"src": [0, 1, 2, 2], "dst": [1, 2, 0, 3]})
    for nparts in (1, 2):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = transitivity(ds).iloc[0]
        assert int(out.corners) == 3, nparts
        assert int(out.wedges) == 1 + 1 + 3 + 0
        assert float(out.transitivity) == round(3 / 5, 6)

    star = pd.DataFrame({"src": [0] * 4, "dst": [1, 2, 3, 4]})
    out = transitivity(ray.data.from_pandas(star)).iloc[0]
    assert int(out.corners) == 0 and float(out.transitivity) == 0.0
    assert int(out.wedges) == 6


def test_hapax_stats(ray_session):
    """Hapax share: a natural-ish source with singletons vs a
    template source repeating every word; cross-doc counts merge
    within a source; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.textstats import hapax_stats

    df = pd.DataFrame({
        "source": ["nat", "nat", "tpl", "tpl"],
        "text": ["one two three two", "four five one",
                 "buy now buy now", "buy now buy now"],
    })
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = hapax_stats(ds).sort_values("source") \
            .reset_index(drop=True)
        nat = out[out.source == "nat"].iloc[0]
        tpl = out[out.source == "tpl"].iloc[0]
        # nat: counts one=2 two=2 three=1 four=1 five=1
        assert (int(nat.tokens), int(nat.vocab), int(nat.hapax)) \
            == (7, 5, 3), nparts
        assert float(nat.hapax_ratio) == round(3 / 5, 6)
        # tpl: buy=4 now=4 -> zero hapax
        assert (int(tpl.tokens), int(tpl.vocab), int(tpl.hapax)) \
            == (8, 2, 0)
        assert float(tpl.hapax_ratio) == 0.0


def test_salted_grouped_topk(ray_session):
    """Salted two-phase top-k == naive single-phase top-k for any
    salt count, including ties at the k boundary and groups smaller
    than k; hot group dominated by one key."""
    import ray.data

    from warcio_ray.ops.relational import salted_grouped_topk

    rng = np.random.RandomState(7)
    n = 500
    df = pd.DataFrame({
        "g": np.where(rng.rand(n) < 0.9, "hot", "cold"),
        "id": np.arange(n, dtype="int64"),
        "v": rng.randint(0, 40, n).astype("int64"),  # many ties
    })
    exp = df.sort_values(["v", "id"], ascending=[False, True]) \
        .groupby("g", sort=False).head(0)  # placeholder
    exp = pd.concat([
        grp.sort_values(["v", "id"], ascending=[False, True]).head(5)
        for _, grp in df.groupby("g")]) \
        .sort_values(["g", "v", "id"],
                     ascending=[True, False, True]).reset_index(drop=True)
    for salts in (1, 4, 16):
        ds = ray.data.from_pandas(df).repartition(3)
        out = salted_grouped_topk(
            ds, group_col="g", sort_cols=["v", "id"],
            ascending=[False, True], salt_col="id", k=5,
            salts=salts).to_pandas() \
            .sort_values(["g", "v", "id"],
                         ascending=[True, False, True]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(
            out[["g", "id", "v"]], exp[["g", "id", "v"]]), salts


def test_hll_cube(ray_session):
    """Register-merge rollup: the (*, *) estimate equals hll_distinct
    over a constant key (same registers); level estimates are close
    to exact distincts; merging is order/partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.sketch import hll_cube, hll_distinct

    rng = np.random.RandomState(3)
    rows = []
    for i in range(300):
        s = f"s{i % 3}"
        l = "en" if i % 2 == 0 else "de"
        toks = " ".join(f"w{s}{l}{rng.randint(0, 200)}"
                        for _ in range(20))
        rows.append((s, l, toks))
    df = pd.DataFrame(rows, columns=["source", "lang", "text"])

    outs = []
    for nparts in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = hll_cube(ds, "source", "lang", "text", tokenize=True)
        outs.append(out)
        assert len(out) == 3 * 2 + 3 + 2 + 1, nparts
    pd.testing.assert_frame_equal(outs[0], outs[1])

    # global slice == single-key hll_distinct over the same corpus
    df2 = df.copy()
    df2["k"] = "all"
    single = hll_distinct(ray.data.from_pandas(df2), key_col="k",
                          value_col="text", tokenize=True)
    glob = outs[0][(outs[0].source == "*") & (outs[0].lang == "*")]
    assert float(glob["n_distinct_est"].iloc[0]) == \
        float(single["n_distinct_est"].iloc[0])

    # sanity: estimates within 15% of exact distincts per level
    exact = len({w for t in df["text"] for w in t.split()})
    est = float(glob["n_distinct_est"].iloc[0])
    assert abs(est - exact) / exact < 0.15


def test_trimmed_mean(ray_session):
    """Trim robustness: one huge outlier moves the plain mean but not
    the trimmed mean; exact numpy-replay of the rank rule incl. ties
    at the cuts; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.quantile import trimmed_mean

    rng = np.random.RandomState(5)
    vals = np.concatenate([
        rng.uniform(10, 20, 96),
        np.full(2, 10.0),            # ties at the low cut region
        [1e9, -1e9],                 # outliers
    ])
    df = pd.DataFrame({"value": vals})

    # numpy replay of the documented rank rule
    n = len(vals)
    r_lo = (5 * n + 99) // 100
    r_hi = (95 * n + 99) // 100
    sv = np.sort(vals)
    kept = sv[r_lo - 1:r_hi]
    exp_trim = round(float(kept.sum()) / len(kept), 6)
    win = np.concatenate([np.full(r_lo - 1, sv[r_lo - 1]), kept,
                          np.full(n - r_hi, sv[r_hi - 1])])
    exp_win = round(float(win.sum()) / n, 6)

    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = trimmed_mean(ds, value_col="value", p=5).iloc[0]
        assert (int(out.n), int(out.r_lo), int(out.r_hi)) \
            == (n, r_lo, r_hi), nparts
        assert abs(float(out.trimmed_mean) - exp_trim) < 1e-6
        assert abs(float(out.winsor_mean) - exp_win) < 1e-6
        assert 10 <= float(out.trimmed_mean) <= 20   # outliers gone


def test_gini_counts(ray_session):
    """Gini extremes: equal counts -> 0; one key owning everything
    but singletons -> near (n-1)/n; exact numerator/denominator;
    partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.profile import gini_counts

    eq = pd.DataFrame({"k": ["a"] * 5 + ["b"] * 5 + ["c"] * 5})
    for nparts in (1, 3):
        out = gini_counts(ray.data.from_pandas(eq).repartition(nparts),
                          key_col="k").iloc[0]
        assert int(out.g_num) == 0 and float(out.gini) == 0.0, nparts

    # counts [1, 1, 1, 97]: G = (2*(1+2+3+4*97)-(5)*100)/(4*100)
    sk = pd.DataFrame({"k": ["a", "b", "c"] + ["hot"] * 97})
    out = gini_counts(ray.data.from_pandas(sk), key_col="k").iloc[0]
    g_num = 2 * (1 + 2 + 3 + 4 * 97) - 5 * 100
    assert (int(out.g_num), int(out.g_den)) == (g_num, 400)
    assert float(out.gini) == round(g_num / 400, 6) > 0.7


def test_change_rate_estimates(ray_session):
    """Cho & Garcia-Molina bias-corrected MLE: X=0 gives exactly
    rate 0, X=N stays finite, monotone in X; exact quantized values; partitioning-invariant."""
    import math

    import ray.data

    from warcio_ray.frontier.budget import change_rate_estimates

    df = pd.DataFrame({"doc_id": range(9), "x": list(range(9))})
    exp = [int(math.floor(math.log(8.5 / (8 - x + 0.5))
                          * 4294967296.0 + 0.5)) for x in range(9)]
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = change_rate_estimates(ds, n_visits=8).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out["rate_q"].tolist() == exp, nparts
    assert exp == sorted(exp)                      # monotone in X
    assert exp[0] == 0                             # X=0: rate exactly 0
    assert 0 < exp[8] < (1 << 40)                  # finite at X=N


def test_bloom_semijoin_stats(ray_session):
    """No false negatives ever (n_pass >= n_true, every true match
    passes); a tiny 64-bit filter saturates and passes everything
    (false positives measured, not hidden); counts weighted by probe
    multiplicity; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.relational import bloom_semijoin_stats

    build = pd.DataFrame({"k": [1, 2, 3]})
    probe = pd.DataFrame({"k": [1, 1, 2, 4, 5, 6, 7, 8] * 3})
    for nparts in (1, 3):
        b = ray.data.from_pandas(build).repartition(nparts)
        p = ray.data.from_pandas(probe).repartition(nparts)
        out = bloom_semijoin_stats(b, p, "k", "k",
                                   m_bits=1 << 12, k_hashes=3).iloc[0]
        assert int(out.n_build) == 3 and int(out.n_probe) == 24, nparts
        assert int(out.n_true) == 9                 # 1,1,2 x3
        assert int(out.n_pass) >= int(out.n_true)   # no false negatives
        assert int(out.n_false_pos) == int(out.n_pass) - 9

    # saturated filter: every probe passes
    out = bloom_semijoin_stats(ray.data.from_pandas(build),
                               ray.data.from_pandas(probe),
                               "k", "k", m_bits=4, k_hashes=3).iloc[0]
    assert int(out.n_pass) == 24 and int(out.n_false_pos) == 15


def test_extract_meta_fields(ray_session):
    """Field extraction against hand-rendered pages: lang/title/
    page_id/nav-count recovered; a page with NO nav block scores 0
    links and a missing title yields null."""
    import ray.data

    from warcio_ray.html import render_page
    from warcio_ray.ops.htmlstats import extract_meta_fields
    from warcio_ray.pages import url_for

    rows = []
    for d, lang, nlinks in ((3, "en", 2), (7, "de", 0)):
        links = [url_for(d + 1 + i) for i in range(nlinks)]
        rows.append({"url": url_for(d),
                     "html": render_page("body text", url_for(d),
                                         lang, d, links)})
    # a degenerate page outside the contract
    rows.append({"url": url_for(99),
                 "html": b"<html><body>no head no nav</body></html>"})
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df)
    out = extract_meta_fields(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [3, 7, 99]
    assert out["lang_attr"].tolist()[:2] == ["en", "de"]
    assert out["title"].tolist()[:2] == ["doc 3", "doc 7"]
    assert out["page_id"].tolist()[:2] == [3, 7]
    assert out["n_nav_links"].tolist() == [2, 0, 0]
    assert pd.isna(out["title"].iloc[2]) and pd.isna(out["page_id"].iloc[2])


def test_median_abs_deviation(ray_session):
    """MAD robustness: numpy replay of the rank rule; the outlier
    that triples the stddev leaves MAD unchanged; partitioning-
    invariant."""
    import ray.data

    from warcio_ray.ops.quantile import median_abs_deviation

    rng = np.random.RandomState(9)
    base = rng.uniform(0, 10, 99)
    vals = np.concatenate([base, [1e7]])
    df = pd.DataFrame({"value": vals})
    n = len(vals)
    rm = (50 * n + 99) // 100
    med = np.sort(vals)[rm - 1]
    mad = np.sort(np.abs(vals - med))[rm - 1]
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = median_abs_deviation(ds, value_col="value").iloc[0]
        assert int(out.n) == n, nparts
        assert abs(float(out["median"]) - round(med, 6)) < 1e-9
        assert abs(float(out["mad"]) - round(mad, 6)) < 1e-9
    # robustness: MAD stayed in the base range despite the 1e7 outlier
    assert float(out["mad"]) < 10


def test_benford_digits(ray_session):
    """First-digit extraction at the vectorized-pow trap values (60,
    70 must be digits 6, 7); a log-uniform sample passes Benford
    (small chi2) while a uniform sample fails (large chi2);
    partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.anomaly import benford_digits

    trap = pd.DataFrame({"value": [60.0, 70.0, 0.07, 6e-3, 1.0, 9.99]})
    out = benford_digits(ray.data.from_pandas(trap))
    got = dict(zip(out["digit"], out["n"]))
    assert got[6] == 2 and got[7] == 2 and got[1] == 1 and got[9] == 1

    rng = np.random.RandomState(2)
    logu = np.exp(rng.uniform(0, np.log(10) * 6, 20000))
    uni = rng.uniform(1, 10, 20000)
    chis = []
    for vals in (logu, uni):
        df = pd.DataFrame({"value": vals})
        outs = []
        for nparts in (1, 3):
            ds = ray.data.from_pandas(df).repartition(nparts)
            o = benford_digits(ds)
            outs.append(o)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        n = int(outs[0]["n"].sum())
        # chi2 parts are scaled by 2^32: normalize to the classic stat
        chis.append(float(outs[0]["chi2_part"].sum())
                    / float(1 << 32))
    assert chis[0] < 30                     # log-uniform ~ Benford
    assert chis[1] > 1000                   # uniform: wildly off


def test_kmeans_purity(ray_session):
    """Well-separated labeled blobs: k-means recovers them and purity
    is perfect; mixing two labels into one blob halves that cluster's
    top share; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.evals import kmeans_purity

    rng = np.random.RandomState(4)
    rows = []
    centers = {0: (0.0, 0.0), 1: (50.0, 0.0), 2: (0.0, 50.0)}
    vid = 0
    # interleave blobs across ids so the deterministic min-id seeds
    # start one-per-blob
    for _ in range(20):
        for lbl, (cx, cy) in centers.items():
            rows.append((vid, [cx + rng.uniform(-1, 1),
                               cy + rng.uniform(-1, 1)], lbl))
            vid += 1
    # blob 2 also hosts 10 points of label 9 (impure cluster)
    for _ in range(10):
        rows.append((vid, [0.0 + rng.uniform(-1, 1),
                           50.0 + rng.uniform(-1, 1)], 9))
        vid += 1
    df = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = kmeans_purity(ds, k=3, iters=4)
        assert out["size"].sum() == 70, nparts
        shares = sorted((int(r.top_n), int(r.size))
                        for r in out.itertuples(index=False))
        # two pure 20-clusters and one 30-cluster dominated 20/30
        assert (20, 30) in shares and shares.count((20, 20)) == 2
        impure = out[out["size"] == 30].iloc[0]
        assert int(impure.top_label) == 2 and int(impure.top_n) == 20


def test_ktruss_property(ray_session):
    """k-truss vs a brute-force sequential peel on random graphs: the
    parallel (simultaneous-drop) peel and the one-edge-at-a-time peel
    reach the SAME fixpoint (k-truss is confluent), for k in {3, 4}."""
    import itertools

    import ray.data
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from warcio_ray.ops.graph import ktruss_edges

    def brute_truss(edges, k):
        es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
        need = k - 2
        while True:
            support = {e: 0 for e in es}
            for a, b, c in itertools.combinations(
                    sorted({v for e in es for v in e}), 3):
                if ((a, b) in es and (a, c) in es and (b, c) in es):
                    support[(a, b)] += 1
                    support[(a, c)] += 1
                    support[(b, c)] += 1
            drop = {e for e, s in support.items() if s < need}
            if not drop:
                return {e: support[e] for e in es}
            # sequential: remove ONE edge, recompute (confluence check)
            es.discard(min(drop))

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 11), st.integers(0, 11)),
                    min_size=0, max_size=40))
    def check(edges):
        df = pd.DataFrame(edges or [(0, 0)], columns=["src", "dst"])
        ds = ray.data.from_pandas(df)
        for k in (3, 4):
            exp = brute_truss(edges, k)
            out = ktruss_edges(ds, k=k).to_pandas()
            got = {(int(r.lo), int(r.hi)): int(r.support)
                   for r in out.itertuples(index=False)}
            assert got == exp, (k, edges)

    check()


def test_ngram_coverage_property(ray_session):
    """Onion coverage vs a brute-force python replay on random
    corpora: per-doc totals/covered/kept match exactly at any
    partitioning."""
    import hashlib

    import ray.data
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from warcio_ray.ops.dedup import ngram_coverage

    word = st.sampled_from(["a", "b", "c", "dd", "ee"])
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

    def brute(texts, n=3):
        grams_of = []
        for t in texts:
            toks = t.split()
            if not toks:
                gset = {""}
            elif len(toks) < n:
                gset = {" ".join(toks)}
            else:
                gset = {" ".join(toks[i:i + n])
                        for i in range(len(toks) - n + 1)}
            grams_of.append({int(hashlib.md5(g.encode())
                                 .hexdigest()[:8], 16) for g in gset})
        owner = {}
        for d, hs in enumerate(grams_of):
            for h in hs:
                owner.setdefault(h, d)
        out = {}
        for d, hs in enumerate(grams_of):
            cov = sum(1 for h in hs if owner[h] < d)
            out[d] = (len(hs), cov, int(2 * cov < len(hs)))
        return out

    @settings(max_examples=10, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=10))
    def check(texts):
        df = pd.DataFrame({"doc_id": range(len(texts)),
                           "text": texts})
        ds = ray.data.from_pandas(df).repartition(2)
        out = ngram_coverage(ds, n=3, num=1, den=2).to_pandas()
        got = {int(r.doc_id): (int(r.total_grams),
                               int(r.covered_grams), int(r.kept))
               for r in out.itertuples(index=False)}
        assert got == brute(texts), texts

    check()


def test_misra_gries_grouped(ray_session):
    """Per-group exactness vs brute force on a skewed corpus: each
    group's hitters gated at its OWN N_g/(k+1); a term heavy in one
    group and light in another appears only where it qualifies;
    partitioning-invariant."""
    import ray.data
    from collections import Counter

    from warcio_ray.ops.sketch import misra_gries_grouped

    rng = np.random.RandomState(6)
    rows = []
    vocab = [f"w{i}" for i in range(30)]
    for g, heavy in (("a", "spam"), ("b", "ham")):
        for _ in range(40):
            words = list(rng.choice(vocab, 12)) + [heavy] * 6
            if g == "a":
                words += ["ham"]          # light where b is heavy
            rows.append((g, " ".join(words)))
    df = pd.DataFrame(rows, columns=["g", "text"])

    def brute(k=4):
        out = []
        for g, grp in df.groupby("g"):
            cts = Counter(w for t in grp["text"] for w in t.split())
            n = sum(cts.values())
            out.extend((g, w, c) for w, c in cts.items()
                       if c * (k + 1) > n)
        return sorted(out)

    exp = brute()
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = misra_gries_grouped(ds, group_col="g", k=4)
        got = sorted((r.g, r.term, int(r.n_occ))
                     for r in out.itertuples(index=False))
        assert got == exp, nparts
    assert ("a", "spam", 240) in exp and ("b", "ham", 240) in exp
    assert not any(g == "a" and t == "ham" for g, t, _ in exp)


def test_local_clustering(ray_session):
    """K4 members have coefficient 1; a hub over independent leaves
    has 0; a triangle-with-pendant corner scores 1/3 at degree 3;
    degree-1 nodes excluded; partitioning-invariant."""
    import itertools

    import ray.data

    from warcio_ray.ops.graph import local_clustering

    k4 = list(itertools.combinations(range(4), 2))
    star = [(10, 11), (10, 12), (10, 13)]
    tri_p = [(20, 21), (21, 22), (20, 22), (22, 23)]
    df = pd.DataFrame(k4 + star + tri_p, columns=["src", "dst"])
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = local_clustering(ds).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        got = {int(r.node): (int(r.n_tri), int(r.deg), float(r.coef))
               for r in out.itertuples(index=False)}
        for v in range(4):
            assert got[v] == (3, 3, 1.0), nparts
        assert got[10] == (0, 3, 0.0)
        assert got[22] == (1, 3, round(1 / 3, 6))
        assert got[20] == (1, 2, 1.0) and got[21] == (1, 2, 1.0)
        assert 23 not in got and 11 not in got     # degree-1 excluded


def test_robustness_curve(ray_session):
    """Monotone percolation: higher retention never shrinks the giant
    component or the labeled-node count; at 100% the curve equals the
    full graph's WCC stats; determinism across partitionings."""
    import ray.data

    from warcio_ray.ops.graph import robustness_curve

    rng = np.random.RandomState(8)
    src = rng.randint(0, 60, 150)
    dst = rng.randint(0, 60, 150)
    df = pd.DataFrame({"src": src, "dst": dst})
    outs = []
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = robustness_curve(ds, rates=(25, 50, 100))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0].sort_values("rate").reset_index(drop=True)
    assert out["giant"].is_monotonic_increasing
    assert out["n_nodes"].is_monotonic_increasing
    # rate=100 keeps every edge: stats equal the full WCC
    from warcio_ray.ops.graph import weakly_connected_components
    full = weakly_connected_components(
        ray.data.from_pandas(df[df.src != df.dst])).to_pandas()
    sizes = full.groupby("component").size()
    last = out.iloc[-1]
    assert (int(last.n_nodes), int(last.n_comp), int(last.giant)) \
        == (len(full), len(sizes), int(sizes.max()))


def test_km_session_survival(ray_session):
    """Product-limit exactness on a hand corpus: censored sessions
    count in the risk set but never as deaths; survival steps match
    the textbook recurrence; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.stream import km_session_survival

    base = pd.Timestamp("2024-03-01")
    rows, eid = [], 0

    def session(user, start_min, dur_min):
        nonlocal eid
        rows.append((eid, user, base + pd.Timedelta(minutes=start_min)))
        eid += 1
        rows.append((eid, user,
                     base + pd.Timedelta(minutes=start_min + dur_min)))
        eid += 1

    # users with sessions of durations 10, 10, 20 (uncensored: ending
    # long before the corpus max), one censored session of 5 at the end
    session(1, 0, 10)
    session(2, 0, 10)
    session(3, 0, 20)
    session(4, 1000, 5)           # ends at corpus max -> censored
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])

    # replay: sessions (10,u),(10,u),(20,u),(5,c); deaths at 10 and 20
    # t=10: left = 1 (the censored 5) -> n_risk=3, d=2
    # t=20: left = 3 -> n_risk=1, d=1
    one = 1 << 32
    s10 = (one * (3 - 2)) // 3
    s20 = (s10 * (1 - 1)) // 1
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = km_session_survival(ds, gap_minutes=30)
        got = [tuple(int(v) for v in r)
               for r in out.itertuples(index=False)]
        assert got == [(10, 3, 2, s10), (20, 1, 1, s20)], nparts


def test_script_profile(ray_session):
    """Codepoint-range counts on mixed-script docs: exact per-range
    tallies, dominance flip when a script outweighs latin, 'other'
    for whitespace/digits-only docs; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.classify import script_profile

    texts = [
        "hello world",                       # latin (space = other)
        "αβγ δε",                            # greek
        "hi вгдежз",                         # cyrillic dominates
        "数据",                              # cjk
        "123 456",                           # digits+space -> other
        "",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = script_profile(ds).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out["main_script"].tolist() == \
            ["latin", "greek", "cyrillic", "cjk", "other", "other"], \
            nparts
        assert out["n_latin"].tolist() == [10, 0, 2, 0, 0, 0]
        assert out["n_greek"].tolist() == [0, 5, 0, 0, 0, 0]
        assert out["n_cyrillic"].tolist() == [0, 0, 6, 0, 0, 0]
        assert out["n_cjk"].tolist() == [0, 0, 0, 2, 0, 0]
        assert out["n_other"].tolist() == [1, 1, 1, 0, 7, 0]


def test_sorted_neighbor_pairs(ray_session):
    """SNM vs a brute-force rank-window replay: exact duplicates are
    always rank-adjacent and found; the window bounds candidates (a
    far-rank near-dup is NOT reported — the documented single-key
    limitation); partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.dedup import simhash_batch, hamming64, \
        sorted_neighbor_pairs

    texts = ["alpha beta gamma delta", "alpha beta gamma delta",
             "epsilon zeta eta theta", "epsilon zeta eta theta iota",
             "one two three four five", "completely different words x",
             "one two three four five"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    sims = simhash_batch(df)
    order = np.lexsort((sims["doc_id"].to_numpy(),
                        sims["simhash"].to_numpy()))
    r = np.empty(len(order), dtype="int64")
    r[order] = np.arange(len(order))
    exp = set()
    for i in range(len(df)):
        for j in range(len(df)):
            if 0 < r[j] - r[i] <= 4:
                hd = int(hamming64(
                    np.array([sims["simhash"][i]], dtype=np.uint64),
                    np.array([sims["simhash"][j]], dtype=np.uint64))[0])
                if hd <= 8:
                    a, b = sorted((i, j))
                    exp.add((a, b, hd))
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = sorted_neighbor_pairs(ds, window=4, max_hamming=8) \
            .to_pandas()
        got = {(int(x.a), int(x.b), int(x.hd))
               for x in out.itertuples(index=False)}
        assert got == exp, nparts
    assert (0, 1, 0) in exp and (4, 6, 0) in exp   # exact dups found


def test_split_leakage(ray_session):
    """Leakage arithmetic vs brute force on planted dup groups: a
    group fully inside one split contributes pairs but zero crossing;
    a straddling group crosses n_train*n_test pairs; no-dup corpus
    reports zeros; partitioning-invariant."""
    import itertools

    import ray.data

    from warcio_ray.ops.split import split_assign, split_leakage

    texts = [f"unique {i}" for i in range(40)]
    for i in (3, 13, 23, 33):
        texts[i] = "dup body A"
    for i in (5, 15):
        texts[i] = "dup body B"
    df = pd.DataFrame({"doc_id": range(40),
                       "lang": ["en"] * 20 + ["de"] * 20,
                       "text": texts})
    sp = split_assign(ray.data.from_pandas(df),
                      fractions=(("train", 50), ("test", 50))) \
        .to_pandas().set_index("doc_id")["split"]
    exp_pairs = exp_cross = 0
    for grp in (["dup body A", (3, 13, 23, 33)],
                ["dup body B", (5, 15)]):
        ids = grp[1]
        for a, b in itertools.combinations(ids, 2):
            exp_pairs += 1
            if sp[a] != sp[b]:
                exp_cross += 1
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = split_leakage(ds, fractions=(("train", 50),
                                           ("test", 50))).iloc[0]
        assert (int(out.n_groups), int(out.n_pairs),
                int(out.n_cross)) == (2, exp_pairs, exp_cross), nparts

    clean = pd.DataFrame({"doc_id": range(6), "lang": ["en"] * 6,
                          "text": [f"u{i}" for i in range(6)]})
    out = split_leakage(ray.data.from_pandas(clean)).iloc[0]
    assert (int(out.n_groups), int(out.n_pairs), int(out.n_cross)) \
        == (0, 0, 0)


def test_association_rules(ray_session):
    """Support/confidence/lift on a hand basket set: asymmetric
    confidence (a->b != b->a), lift > 1 for correlated pairs and < 1
    for anti-correlated; min_support gate; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.seqmine import association_rules

    # users: 1-4 {x,y}, 5 {x}, 6 {z}, 7 {x,z}
    rows = []
    for u in (1, 2, 3, 4):
        rows += [(u, "x"), (u, "y"), (u, "x")]   # dup event: basket set
    rows += [(5, "x"), (6, "z"), (7, "x"), (7, "z")]
    df = pd.DataFrame(rows, columns=["user_id", "event_type"])
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = association_rules(ds, min_support=2)
        got = {(r.a, r.b): (int(r.support), float(r.confidence),
                            float(r.lift))
               for r in out.itertuples(index=False)}
        # n_users=7, x:6 users, y:4, z:2; (x,y)=4, (x,z)=1 (below gate)
        assert got[("x", "y")] == (4, round(4 / 6, 6),
                                   round(4 * 7 / (6 * 4), 6)), nparts
        assert got[("y", "x")] == (4, 1.0, round(28 / 24, 6))
        assert ("x", "z") not in got            # support 1 < 2
        assert got[("y", "x")][2] > 1.0


def test_vad_segments(ray_session):
    """VAD vs a python replay of the closed-form PCM: exact active
    counts and run-length segments; segments <= active; fake=False
    raises the sandbox stub; partitioning-invariant."""
    import pytest
    import ray.data

    from warcio_ray.ops.multimodal import vad_segments

    # fake=False now really decodes PCM WAV (test_mediacodec.py)
    ids = [0, 7, 123, 4999]
    df = pd.DataFrame({"media_id": ids})

    def replay(mid):
        i = np.arange(256, dtype=np.uint64)
        s = (((np.uint64(mid) + i) * np.uint64(2654435761))
             & np.uint64(0xFFFFFFFF)) >> np.uint64(16)
        pcm = s.astype(np.int64) - 32768
        e = (pcm * pcm).reshape(16, 16).sum(axis=1)
        act = (e * 16) > int(e.sum())
        segs = int(np.count_nonzero(
            act & ~np.concatenate([[False], act[:-1]])))
        return int(act.sum()), segs

    exp = {m: replay(m) for m in ids}
    for nparts in (1, 2):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = vad_segments(ds, concurrency=1).to_pandas() \
            .sort_values("media_id").reset_index(drop=True)
        for r in out.itertuples(index=False):
            assert (int(r.n_active), int(r.n_segments)) \
                == exp[int(r.media_id)], nparts
            assert int(r.n_segments) <= int(r.n_active)
            assert int(r.n_frames) == 16


def test_jenks_breaks(ray_session):
    """Optimality vs brute-force enumeration of all 2-split classings
    on a clearly trimodal value set; classes are contiguous, cover
    everything, and match the brute optimum; partitioning-invariant."""
    import itertools

    import ray.data

    from warcio_ray.ops.quantile import jenks_breaks

    vals = ([1, 2, 2, 3] * 5) + ([50, 51, 52] * 6) + ([200, 201] * 4)
    df = pd.DataFrame({"x": vals})

    # brute force over distinct-value split points
    uv = sorted(set(vals))
    cnt = {u: vals.count(u) for u in uv}

    def cost(seg):
        n = sum(cnt[u] for u in seg)
        s = sum(u * cnt[u] for u in seg)
        ss = sum(u * u * cnt[u] for u in seg)
        return ss - (s * s) // n

    best, arg = None, None
    V = len(uv)
    for i2, i3 in itertools.combinations(range(1, V), 2):
        segs = (uv[:i2], uv[i2:i3], uv[i3:])
        c = sum(cost(s) for s in segs)
        if best is None or c < best:
            best, arg = c, segs
    exp = [(m + 1, s[0], s[-1], sum(cnt[u] for u in s))
           for m, s in enumerate(arg)]

    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = jenks_breaks(ds, value_col="x", k=3)
        got = [tuple(int(x) for x in r)
               for r in out.itertuples(index=False)]
        assert got == exp, nparts
    # the trimodal structure is recovered exactly
    assert exp[0][1:3] == (1, 3) and exp[1][1:3] == (50, 52) \
        and exp[2][1:3] == (200, 201)


def test_frontcode_gain(ray_session):
    """Prefix accounting vs a single-process replay: block-boundary
    pairs are stitched exactly (multi-partition == single-partition);
    identical keys save their full length; disjoint keys save 0."""
    import ray.data

    from warcio_ray.ops.profile import frontcode_gain

    keys = (["com,example)/a/" + str(i) for i in range(50)]
            + ["org,zzz)/x"] * 3 + ["aaa"])
    df = pd.DataFrame({"key": keys})

    def replay(ks):
        ks = sorted(ks)
        saved = 0
        for i in range(1, len(ks)):
            a, b = ks[i - 1], ks[i]
            j = 0
            while j < min(len(a), len(b)) and a[j] == b[j]:
                j += 1
            saved += j
        return len(ks), sum(len(k) for k in ks), saved

    exp = replay(keys)
    for nparts in (1, 5):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = frontcode_gain(ds, key_col="key").iloc[0]
        assert (int(out.n_keys), int(out.total_bytes),
                int(out.saved_bytes)) == exp, nparts


def test_image_patch_stats(ray_session):
    """Patch stats vs a numpy replay of the closed-form image: exact
    salient counts, argmax patch with first-max tie rule; fake=False
    raises; partitioning-invariant."""
    import pytest
    import ray.data

    from warcio_ray.ops.multimodal import image_patch_stats

    # fake=False now really decodes BMP (test_mediacodec.py)
    ids = [0, 11, 4242]
    df = pd.DataFrame({"media_id": ids})

    def replay(mid):
        idx = np.arange(4096, dtype=np.uint64)
        pix = ((((np.uint64(mid) + idx) * np.uint64(2654435761))
                & np.uint64(0xFFFFFFFF)) >> np.uint64(24)) \
            .astype(np.int64)
        px, py = idx % 64, idx // 64
        patch = (py // 8) * 8 + (px // 8)
        sums = np.zeros(64, dtype="int64")
        np.add.at(sums, patch.astype(np.int64), pix)
        total = int(sums.sum())
        return (int(((sums * 64) > total).sum()),
                int(np.argmax(sums)), int(sums.max()))

    exp = {m: replay(m) for m in ids}
    for nparts in (1, 2):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = image_patch_stats(ds, concurrency=1).to_pandas() \
            .sort_values("media_id").reset_index(drop=True)
        for r in out.itertuples(index=False):
            assert (int(r.n_salient), int(r.best_patch),
                    int(r.best_sum)) == exp[int(r.media_id)], nparts


def test_group_kfold(ray_session):
    """Greedy largest-first packing: groups never split across folds;
    the deterministic tie rule matches a heap replay; fold totals are
    balanced within the largest group size; partitioning-invariant."""
    import heapq

    import ray.data

    from warcio_ray.ops.split import group_kfold

    sizes = {"a": 50, "b": 30, "c": 20, "d": 20, "e": 10, "f": 5}
    rows = [(i, g) for i, g in enumerate(
        g for g, n in sizes.items() for _ in range(n))]
    df = pd.DataFrame(rows, columns=["doc_id", "host"])

    heap = [(0, f) for f in range(3)]
    heapq.heapify(heap)
    exp = {}
    for g, n in sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0])):
        tot, f = heapq.heappop(heap)
        exp[g] = f
        heapq.heappush(heap, (tot + n, f))

    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = group_kfold(ds, group_col="host", k=3).to_pandas()
        per_group = out.groupby("host")["fold"].nunique()
        assert (per_group == 1).all(), nparts          # never split
        got = out.drop_duplicates("host").set_index("host")["fold"]
        assert {g: int(got[g]) for g in sizes} == exp
        totals = out.groupby("fold").size()
        assert totals.max() - totals.min() <= max(sizes.values())


def test_bowtie_decomposition(ray_session):
    """Textbook bowtie: a 3-cycle core, an IN tail, an OUT tail and a
    disconnected pair classify exactly; OUT takes precedence over IN
    only when genuinely not mutual; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.graph import bowtie_decomposition

    edges = [(0, 1), (1, 2), (2, 0),        # core cycle {0,1,2}
             (10, 0), (11, 10),             # IN tail 11 -> 10 -> core
             (2, 20), (20, 21),             # OUT tail
             (30, 31)]                      # disconnected pair
    df = pd.DataFrame(edges, columns=["src", "dst"])
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = bowtie_decomposition(ds)
        got = dict(zip(out["region"], out["n_nodes"]))
        assert got == {"core": 3, "in": 2, "out": 2, "other": 2}, \
            nparts


def test_label_propagation_two_triangles(ray_session):
    """Sync LPA with self-vote: two triangles joined by one bridge
    resolve to their own min-id communities by round 3 and stay there;
    partitioning-invariant; direction/duplicate edges fold away."""
    import ray.data

    from warcio_ray.ops.graph import label_propagation

    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4),
             (2, 1), (4, 3)]  # reversed duplicates must not double-vote
    df = pd.DataFrame(edges, columns=["src", "dst"])
    want = {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = label_propagation(ds, rounds=4).to_pandas()
        got = dict(zip(out["node"].astype(int),
                       out["community"].astype(int)))
        assert got == want, nparts


def test_hyperball_matches_inprocess_reference(ray_session):
    """Distributed HyperBall == a plain in-process BFS + HLL replay on
    a small graph (per-node balls computed exactly, registers by the
    same md5 convention), across partitionings; N(t) is nondecreasing
    and saturates at the component closure."""
    import hashlib
    import math

    import numpy as np
    import ray.data

    from warcio_ray.ops.sketch import (
        hll_estimate_from_registers,
        hyperball,
    )

    edges = [(1, 2), (2, 3), (3, 4), (4, 5),      # path
             (10, 11), (11, 12), (12, 10),        # triangle
             (2, 1)]                              # reversed dup
    df = pd.DataFrame(edges, columns=["src", "dst"])
    und = {tuple(sorted(e)) for e in edges}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)

    b = 4
    m, shift = 1 << b, 64 - b

    def reg_of(node):
        h = int(hashlib.md5(str(node).encode()).hexdigest()[:16], 16)
        w = h & ((1 << shift) - 1)
        return h >> shift, shift - w.bit_length() + 1

    def expect(rounds):
        balls = {u: {u} for u in nodes}
        out = []
        for t in range(rounds + 1):
            total = 0
            for u in nodes:
                regs = np.zeros(m, dtype=np.int64)
                for v in balls[u]:
                    bk, rho = reg_of(v)
                    regs[bk] = max(regs[bk], rho)
                est = hll_estimate_from_registers(regs, b)
                total += int(math.floor(est * (1 << 20) + 0.5))
            out.append((t, total))
            balls = {u: balls[u] | set().union(
                *(balls[v] for v in adj[u])) for u in nodes}
        return out

    want = expect(3)
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        got = hyperball(ds, rounds=3, b=4)
        assert list(map(tuple, got.to_numpy())) == want, nparts
    sums = [q for _t, q in want]
    assert sums == sorted(sums)              # balls only grow


def test_hyperball_harmonic_matches_inprocess(ray_session):
    """Harmonic centrality via HyperBall == the in-process BFS + HLL +
    lcm-coefficient replay; triangle nodes outrank path endpoints."""
    import hashlib
    import math

    import numpy as np
    import ray.data

    from warcio_ray.ops.sketch import (
        hll_estimate_from_registers,
        hyperball_harmonic,
    )

    edges = [(1, 2), (2, 3), (3, 4), (4, 5),
             (10, 11), (11, 12), (12, 10)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    bbits, m, shift = 4, 16, 60
    L = math.lcm(1, 2, 3)
    coefs = {0: -L, 1: L - L // 2, 2: L // 2 - L // 3, 3: L // 3}

    def q_of(ball):
        regs = np.zeros(m, dtype=np.int64)
        for v in ball:
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16)
            w = h & ((1 << shift) - 1)
            bk, rho = h >> shift, shift - w.bit_length() + 1
            regs[bk] = max(regs[bk], rho)
        est = hll_estimate_from_registers(regs, bbits)
        return int(math.floor(est * (1 << 20) + 0.5))

    balls = {u: {u} for u in nodes}
    hnum = {u: 0 for u in nodes}
    for t in range(4):
        for u in nodes:
            hnum[u] += coefs[t] * q_of(balls[u])
        balls = {u: balls[u] | set().union(
            *(balls[v] for v in adj[u])) for u in nodes}
    want = sorted(hnum.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        got = hyperball_harmonic(ds, rounds=3, b=4, k=20)
        assert list(map(tuple, got.to_numpy())) == want, nparts


def test_landmark_distances_path_graph(ray_session):
    """Exact BFS histograms: on a path 0-1-2-3-4 with landmarks {0,1},
    distances are the textbook offsets, capped at max_depth;
    partitioning-invariant; early-exhausted frontier terminates."""
    import ray.data

    from warcio_ray.ops.graph import landmark_distances

    df = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 4]})
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = landmark_distances(ds, n_landmarks=2, max_depth=3) \
            .to_pandas().sort_values(["landmark", "dist"])
        got = {(int(r.landmark), int(r.dist)): int(r.n_nodes)
               for r in out.itertuples()}
        # landmark 0: dists 0,1,2,3 -> one node each (4 capped at 3)
        # landmark 1: dists 0..3 -> {1},{0,2},{3},{4}: counts 1,2,1,1
        assert got == {(0, 0): 1, (0, 1): 1, (0, 2): 1, (0, 3): 1,
                       (1, 0): 1, (1, 1): 2, (1, 2): 1, (1, 3): 1}, \
            nparts


def test_effective_diameter_triangle(ray_session):
    """On a single triangle every ball saturates at t=1, so the 90%
    crossing interpolates inside (0, 1]: t_hi == 1, d_eff in (0, 1],
    and the exact rational reproduces the float; partitioning-
    invariant."""
    import ray.data

    from warcio_ray.ops.sketch import effective_diameter

    df = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 1]})
    outs = []
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = effective_diameter(ds, rounds=2, b=4, pct=90)
        r = out.iloc[0]
        assert int(r["t_hi"]) == 1
        assert 0 < float(r["d_eff"]) <= 1
        assert round(int(r["d_num"]) / int(r["d_den"]), 6) \
            == float(r["d_eff"])
        outs.append(tuple(r))
    assert outs[0] == outs[1]


def test_k_anonymity_audit(ray_session):
    """Hand-built table: group sizes {a:3, b:5, c:1}, sensitive
    diversity {a:1, b:2, c:1}; k=3/l=2 classifies exactly;
    partitioning-invariant; no-sensitive mode zeroes diversity."""
    import ray.data

    from warcio_ray.ops.profile import k_anonymity

    df = pd.DataFrame({
        "g": ["a"] * 3 + ["b"] * 5 + ["c"],
        "s": [1, 1, 1, 1, 2, 2, 2, 2, 7]})
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = k_anonymity(ds, ["g"], sensitive_col="s",
                          k=3, l_div=2).iloc[0]
        assert (int(out["n_rows"]), int(out["n_groups"]),
                int(out["min_group"])) == (9, 3, 1)
        assert (int(out["n_viol_groups"]),
                int(out["n_viol_rows"])) == (1, 1)     # only c
        assert (int(out["n_lowdiv_groups"]),
                int(out["n_lowdiv_rows"])) == (2, 4)   # a and c
    out = k_anonymity(ray.data.from_pandas(df), ["g"], k=3).iloc[0]
    assert int(out["n_lowdiv_groups"]) == 0
    assert int(out["n_viol_rows"]) == 1


def test_rich_club_star_plus_clique(ray_session):
    """A 4-clique with pendant leaves: clique nodes have degree > 3
    only counting leaves; thresholds classify exactly and phi is the
    exact rational; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.graph import rich_club

    # K4 on {1,2,3,4}; two leaves on node 1 (deg 5), one on node 2
    # (deg 4); nodes 3,4 have deg 3; leaves deg 1
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (1, 10), (1, 11), (2, 12)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = rich_club(ds, degrees=(1, 3, 4))
        got = {int(r.d): (int(r.n_nodes), int(r.n_edges),
                          int(r.phi_num), int(r.phi_den))
               for r in out.itertuples()}
        # d>1: the 4 clique nodes; all 6 clique edges
        assert got[1] == (4, 6, 12, 12)
        # d>3: nodes 1 (deg 5) and 2 (deg 4); edge (1,2)
        assert got[3] == (2, 1, 2, 2)
        # d>4: only node 1; zero edges, den clipped to 1
        assert got[4] == (1, 0, 0, 1)


def test_t_closeness_topk(ray_session):
    """Hand-built: group 'skew' holds only bucket 0, group 'match'
    mirrors the global distribution; skew ranks first with the exact
    scaled EMD; partitioning-invariant."""
    import ray.data

    from warcio_ray.ops.profile import t_closeness_topk

    # global: bucket0 x6, bucket1 x6 (N=12); skew: 4x b0;
    # match: 2x b0 + 2x b1; rest: balanced filler
    df = pd.DataFrame({
        "g": ["skew"] * 4 + ["match"] * 4 + ["fill"] * 4,
        "s": [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1]})
    # recompute: skew -> b0 x4; match -> b0 x2, b1 x2; fill -> b1 x4
    df["s"] = [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1]
    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = t_closeness_topk(ds, ["g"], "s", m_buckets=2, k=3)
        # skew and fill both sit at t = 1/2 (mirror-image skews);
        # the tie breaks by key asc, match (t = 0) comes last
        assert out["g"].tolist() == ["fill", "skew", "match"], nparts
        # |4*12 - 6*4| / (1*4*12) = 24/48 = 1/2 -> t_q = 2^39
        assert out["t_q"].tolist() == [1 << 39, 1 << 39, 0]
