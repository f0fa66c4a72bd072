"""Multimodal stage plumbing + IVF ANN recall tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data


def test_media_feature_extraction(ray_session):
    from ugfraud_ray.pipelines.multimodal import media_features, synthesize_media

    t = synthesize_media(40, kind="image")
    ds = ray.data.from_arrow(t)
    feats = media_features(ds).to_pandas().sort_values("media_id")
    assert len(feats) == 40
    assert feats["content_hash"].nunique() == 40  # deterministic, distinct
    # deterministic across runs
    feats2 = media_features(ray.data.from_arrow(t)).to_pandas().sort_values("media_id")
    assert (feats["content_hash"].to_numpy() == feats2["content_hash"].to_numpy()).all()


def test_media_resize_roundtrip(ray_session):
    from ugfraud_ray.pipelines.multimodal import (
        FakeDecoder,
        media_features,
        media_resize,
        synthesize_media,
    )

    ds = ray.data.from_arrow(synthesize_media(10, kind="image"))
    resized = media_resize(ds, target=(8, 8))
    out = resized.to_pandas()
    assert len(out) == 10
    assert (out["width"] == 8).all() and (out["height"] == 8).all()
    dec = FakeDecoder()
    arr = dec.decode(out.iloc[0]["payload"])
    assert arr.shape == (8, 8)
    # resized output feeds the next stage (composability)
    feats = media_features(resized).to_pandas()
    assert len(feats) == 10 and (feats["h"] == 8).all()


def test_frame_sampler_flatmap(ray_session):
    from ugfraud_ray.pipelines.multimodal import sample_frames, synthesize_media

    t = synthesize_media(12, kind="video")
    out = sample_frames(ray.data.from_arrow(t), every_k=4).to_pandas()
    want = sum(len(range(0, max(1, nf), 4)) for nf in t["n_frames"].to_pylist())
    assert len(out) == want


def test_strict_decoder_marks_missing_codec(ray_session):
    from ugfraud_ray.pipelines.multimodal import media_features, synthesize_media

    ds = ray.data.from_arrow(synthesize_media(4, kind="image"))
    with pytest.raises(Exception) as ei:
        media_features(ds, decoder="strict").to_pandas()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_ivf_recall_vs_brute_force(ray_session):
    from ugfraud_ray.pipelines.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(41)
    n, dim = 600, 32
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), dim
            ),
        }
    )
    emb = ray.data.from_arrow(t)
    qids = [0, 1, 2]
    exact = brute_force_topk(emb, qids, k=10, round_to=None).to_pandas()
    approx = ivf_topk(emb, qids, k=10, n_centroids=8, n_probe=4).to_pandas()
    recalls = []
    for q in qids:
        e = set(exact[exact.query_id == q]["neighbor_id"])
        a = set(approx[approx.query_id == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    # n_probe=4 of 8 buckets: expect strong but not perfect recall
    assert np.mean(recalls) >= 0.6, recalls


def test_lsh_topk_matches_numpy_replica(ray_session):
    """lsh_topk must equal a local replica: same-bucket candidates only,
    ranked by (round-6 cosine desc, id asc)."""
    from ugfraud_ray.pipelines.similarity import lsh_topk

    rng = np.random.default_rng(3)
    n, dim, n_planes, seed, k = 300, 16, 3, 11, 5
    X = rng.standard_normal((n, dim))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(X.reshape(-1)), dim
                ),
            }
        )
    ).repartition(4)
    queries = [0, 1, 2]
    got = (
        lsh_topk(ds, queries, k=k, n_planes=n_planes, seed=seed)
        .to_pandas()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )

    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    buckets = ((X @ planes) > 0).astype(np.int64) @ (1 << np.arange(n_planes))
    Xn = X / np.linalg.norm(X, axis=1)[:, None]
    rows = []
    for q in queries:
        cand = np.flatnonzero((buckets == buckets[q]) & (np.arange(n) != q))
        sims = np.round(Xn[cand] @ Xn[q], 6)
        order = np.lexsort((cand, -sims))[:k]
        for r, o in enumerate(order):
            rows.append((q, int(cand[o]), float(sims[o]), r + 1))
    import pandas as pd

    want = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim", "rnk"])
    assert got["neighbor_id"].tolist() == want["neighbor_id"].tolist()
    assert got["rnk"].tolist() == want["rnk"].tolist()
    assert np.allclose(got["sim"], want["sim"], atol=1e-9)


def test_topk_partition_invariance(ray_session):
    """brute_force_topk and lsh_topk results must not depend on how the
    corpus is partitioned (the per-batch local top-k + merge must be a
    true combiner)."""
    from ugfraud_ray.pipelines.similarity import brute_force_topk, lsh_topk

    rng = np.random.default_rng(7)
    n, dim = 200, 8
    X = rng.standard_normal((n, dim))
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(pa.array(X.reshape(-1)), dim),
        }
    )
    outs = {}
    for parts in (1, 3, 11):
        ds = ray.data.from_arrow(t).repartition(parts)
        bf = brute_force_topk(ds, [0, 5], k=7).to_pandas().sort_values(
            ["query_id", "rnk"]).reset_index(drop=True)
        ls = lsh_topk(ds, [0, 5], k=7, n_planes=3, seed=11).to_pandas().sort_values(
            ["query_id", "rnk"]).reset_index(drop=True)
        outs[parts] = (bf, ls)
    ref_bf, ref_ls = outs[1]
    for parts in (3, 11):
        bf, ls = outs[parts]
        assert bf["neighbor_id"].tolist() == ref_bf["neighbor_id"].tolist()
        assert np.allclose(bf["sim"], ref_bf["sim"], atol=1e-9)
        assert ls["neighbor_id"].tolist() == ref_ls["neighbor_id"].tolist()
        assert np.allclose(ls["sim"], ref_ls["sim"], atol=1e-9)


def test_label_centroids_matches_numpy(ray_session):
    from ugfraud_ray.pipelines.similarity import label_centroids

    rng = np.random.default_rng(6)
    n, d = 300, 8
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 4, size=n).astype(np.int64)
    t = pa.table(
        {
            "label": pa.array(labels),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), d
            ).cast(pa.list_(pa.float32())),
        }
    )
    got = (
        label_centroids(ray.data.from_arrow(t))
        .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
    )
    q = np.floor(vecs.astype(np.float64) * 10_000 + 0.5)
    for lab in range(4):
        m = labels == lab
        want = np.round((q[m].sum(axis=0) / 10_000) / m.sum(), 9)
        sub = got[got["label"] == lab]
        assert sub["dim"].tolist() == list(range(d))
        np.testing.assert_array_equal(sub["centroid"].to_numpy(), want)


def test_quantize_embeddings(ray_session):
    from ugfraud_ray.pipelines.similarity import quantize_embeddings

    vecs = np.array(
        [[0.5, -1.0, 0.25, 0.0], [0.0, 0.0, 0.0, 0.0], [2.0, 2.0, -2.0, 1.0]],
        dtype=np.float32,
    )
    t = pa.table(
        {
            "vec_id": pa.array([10, 11, 12], pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), 4
            ).cast(pa.list_(pa.float32())),
        }
    )
    got = (
        quantize_embeddings(ray.data.from_arrow(t))
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    # row 0: scale 1.0 -> q = [64, -127, 32, 0] (floor(x*127+0.5))
    assert got.loc[0, "scale"] == 1.0
    assert got.loc[0, "q_sum"] == 64 - 127 + 32 + 0
    assert got.loc[0, "q_min"] == -127 and got.loc[0, "q_max"] == 64
    # zero vector: scale 0, all q 0
    assert got.loc[1, "scale"] == 0.0 and got.loc[1, "q_sum"] == 0
    # row 2: scale 2 -> q = [127, 127, -127, 64]
    assert got.loc[2, "q_sum"] == 127 + 127 - 127 + 64
    assert (got["n_dims"] == 4).all()


def test_ivf_index_persistence_matches_inline(ray_session, tmp_path):
    """build_ivf_index + ivf_index_query reproduce the in-line ivf_topk
    exactly (same seeded quantizer, probes, tie rule), reading only the
    probed bucket partitions."""
    import os

    from ugfraud_ray.pipelines.similarity import (
        build_ivf_index,
        ivf_index_query,
        ivf_topk,
    )

    rng = np.random.default_rng(17)
    n, d = 400, 16
    vecs = rng.normal(size=(n, d))
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1)), d
                ),
            }
        )
    ).repartition(4)

    qids = [0, 7, 42]
    inline = (
        ivf_topk(emb, qids, k=5, n_centroids=8, n_probe=3)
        .to_pandas()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )

    idx = str(tmp_path / "ivf")
    man = build_ivf_index(emb, idx, n_centroids=8)
    assert man["n_centroids"] == 8 and os.path.isfile(os.path.join(idx, "manifest.json"))
    got = (
        ivf_index_query(idx, qids, vecs[qids], k=5, n_probe=3)
        .to_pandas()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )
    assert (inline[["query_id", "neighbor_id", "rnk"]].to_numpy()
            == got[["query_id", "neighbor_id", "rnk"]].to_numpy()).all()
    np.testing.assert_allclose(inline["sim"], got["sim"], atol=1e-12)


def test_media_exact_dedup(ray_session):
    from ugfraud_ray.pipelines.multimodal import media_exact_dedup, synthesize_media

    t = synthesize_media(30, kind="image")
    # plant duplicates: rows 25..29 reuse payloads 0..4 with new ids
    dup = t.slice(0, 5)
    planted = pa.table(
        {
            "media_id": pa.array([100 + i for i in range(5)], pa.int64()),
            "kind": dup["kind"],
            "payload": dup["payload"],
            "width": dup["width"],
            "height": dup["height"],
            "n_frames": dup["n_frames"],
            "sample_rate": dup["sample_rate"],
        }
    )
    ds = ray.data.from_arrow(pa.concat_tables([t, planted])).repartition(3)
    out = media_exact_dedup(ds).to_pandas()
    assert len(out) == 30  # 30 distinct payloads
    n2 = out[out.n_copies == 2]
    assert len(n2) == 5
    assert (n2["media_id"] < 100).all()  # min-id survivor


def test_wav_round_trip_and_chunk_walk():
    from ugfraud_ray.pipelines.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(9)
    s = rng.integers(-32768, 32767, 333, dtype=np.int16)
    got, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(got, s)

    # a LIST chunk between fmt and data must be walked over, and an
    # odd-sized chunk is word-aligned
    import struct

    payload = encode_wav(s, 8000)
    fmt_end = 12 + 8 + 16
    info = b"xyz"  # odd size 3 -> 1 pad byte
    listchunk = b"LIST" + struct.pack("<I", len(info)) + info + b"\x00"
    wedged = payload[:fmt_end] + listchunk + payload[fmt_end:]
    got2, _ = decode_wav(wedged)
    np.testing.assert_array_equal(got2, s)


def test_bmp_round_trip_padding_and_topdown():
    import struct

    from ugfraud_ray.pipelines.multimodal import decode_bmp, encode_bmp_gray8

    rng = np.random.default_rng(10)
    for w in (5, 7, 8, 31):  # strides 8, 8, 8, 32 -> padding exercised
        img = rng.integers(0, 256, (11, w), dtype=np.uint8)
        np.testing.assert_array_equal(decode_bmp(encode_bmp_gray8(img)), img)

    # top-down variant: negative height, rows NOT flipped
    img = rng.integers(0, 256, (4, 6), dtype=np.uint8)
    b = bytearray(encode_bmp_gray8(img[::-1]))  # stored bottom-up = img
    b[22:26] = struct.pack("<i", -4)  # declare top-down
    np.testing.assert_array_equal(decode_bmp(bytes(b)), img[::-1][::-1])


def test_ppm_round_trip_with_comments():
    from ugfraud_ray.pipelines.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(rgb)), rgb)
    gray = rng.integers(0, 256, (6, 4), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(gray)), gray)

    commented = b"P5\n# a comment\n4 2\n# another\n255\n" + bytes(range(8))
    np.testing.assert_array_equal(
        decode_ppm(commented), np.arange(8, dtype=np.uint8).reshape(2, 4)
    )


def test_real_decoder_mixed_pool(ray_session):
    """RealDecoder streams a MIXED media table (WAV + BMP + PPM + the
    synthetic FAKEMEDIA container) through the one actor-pool feature
    stage; a compressed payload raises NotImplementedError."""
    import pyarrow as pa
    import pytest

    from ugfraud_ray.pipelines.multimodal import (
        RealDecoder,
        encode_bmp_gray8,
        encode_ppm,
        encode_wav,
        media_features,
        synthesize_media,
    )

    rng = np.random.default_rng(12)
    wav = encode_wav(rng.integers(-100, 100, 50, dtype=np.int16))
    bmp = encode_bmp_gray8(rng.integers(0, 256, (8, 5), dtype=np.uint8))
    ppm = encode_ppm(rng.integers(0, 256, (3, 4, 3), dtype=np.uint8))
    fake = synthesize_media(1, kind="image")["payload"][0].as_py()
    t = pa.table(
        {
            "media_id": pa.array([0, 1, 2, 3], pa.int64()),
            "payload": pa.array([wav, bmp, ppm, fake], pa.binary()),
        }
    )
    got = (
        media_features(ray.data.from_arrow(t), decoder=RealDecoder())
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert got["h"].tolist() == [1, 8, 3, fake and got["h"][3]]
    assert got["w"].tolist()[:3] == [50, 5, 4]

    with pytest.raises(Exception, match="codec library"):
        RealDecoder().decode(b"\x89PNG\r\n\x1a\n....")


def test_media_dhash_dedup_planted(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.multimodal import (
        DHasher,
        encode_bmp_gray8,
        media_dhash_dedup,
        RealDecoder,
    )

    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 256, (24, 32), dtype=np.uint8) for _ in range(6)]
    # plant: id 6 = pixel-identical copy of id 0; id 7 = same image
    # re-sampled 2x (dHash's index grid picks the same samples)
    imgs.append(imgs[0].copy())
    big = np.kron(imgs[0], np.ones((2, 2), dtype=np.uint8))
    imgs.append(big)
    t = pa.table(
        {
            "media_id": pa.array(range(len(imgs)), pa.int64()),
            "payload": pa.array([encode_bmp_gray8(im) for im in imgs], pa.binary()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = media_dhash_dedup(ds, decoder=RealDecoder()).to_pandas()
    keep = dict(zip(out["media_id"].astype(int), out["keep"]))
    h = dict(zip(out["media_id"].astype(int), out["dhash"]))
    assert h[6] == h[0] and not keep[6] and keep[0]
    assert h[7] == h[0] and not keep[7]  # scale-invariant fingerprint
    # distinct random images keep themselves
    assert all(keep[i] for i in range(1, 6))

    # hashes are 64-bit and deterministic across block splits
    out2 = media_dhash_dedup(ds.repartition(6), decoder=RealDecoder()).to_pandas()
    assert dict(zip(out2["media_id"].astype(int), out2["dhash"])) == h


def test_media_audio_dedup_planted(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.multimodal import (
        AudioFingerprinter,
        encode_wav,
        media_audio_dedup,
        RealDecoder,
    )

    rng = np.random.default_rng(13)
    clips = [rng.integers(-2000, 2000, 500).astype(np.int16) for _ in range(5)]
    clips.append(clips[0].copy())  # planted identical audio
    short = rng.integers(-5, 5, 30).astype(np.int16)  # < 65 samples: dropped
    t = pa.table(
        {
            "media_id": pa.array(range(7), pa.int64()),
            "payload": pa.array(
                [encode_wav(c) for c in clips] + [encode_wav(short)], pa.binary()
            ),
        }
    )
    out = media_audio_dedup(
        ray.data.from_arrow(t).repartition(3), decoder=RealDecoder()
    ).to_pandas()
    keep = dict(zip(out["media_id"].astype(int), out["keep"]))
    h = dict(zip(out["media_id"].astype(int), out["afp"]))
    assert 6 not in keep  # short clip emitted nothing
    assert h[5] == h[0] and not keep[5] and keep[0]
    assert all(keep[i] for i in range(1, 5))
    # fingerprint matches the naive mirror on negative-sample audio
    s = clips[1].astype(np.int64)
    n = len(s)
    b = (np.arange(66) * n) // 65
    means = np.array([s[b[i]:b[i + 1]].sum() // (b[i + 1] - b[i]) for i in range(65)])
    bits = (means[:-1] > means[1:]).astype(np.uint64)
    want = int((bits * (np.uint64(1) << np.arange(64, dtype=np.uint64))).sum())
    assert np.int64(h[1]) == np.uint64(want).astype(np.int64)


def test_jl_project_distance_preservation(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.similarity import jl_project

    rng = np.random.default_rng(3)
    n, d, k = 60, 64, 16
    V = rng.normal(0, 1, (n, d)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(V), pa.list_(pa.float32())),
        }
    )
    out = jl_project(ray.data.from_arrow(t).repartition(3), k=k).to_pandas()
    P = np.zeros((n, k))
    for r in out.itertuples(index=False):
        P[int(r.vec_id), int(r.j)] = r.val / 10000.0
    # naive mirror: exact signed sums over the quantized grid
    from ugfraud_ray.pipelines.sketches import _md5_low64

    q = np.floor(V.astype(np.float64) * 10000 + 0.5).astype(np.int64)
    S = np.empty((d, k), dtype=np.int64)
    for j in range(k):
        h = _md5_low64([f"jl-7-{i}-{j}" for i in range(d)])
        S[:, j] = np.where((h % np.uint64(2)) == 1, 1, -1)
    np.testing.assert_array_equal((q @ S).astype(float) / 10000.0, P)
    # JL property: scaled pairwise distances roughly preserved
    a, b = V[0].astype(np.float64), V[1].astype(np.float64)
    orig = np.linalg.norm(a - b)
    projd = np.linalg.norm((P[0] - P[1]) / np.sqrt(k))
    assert 0.3 * orig < projd < 3.0 * orig


def test_filtered_topk_prefilter_semantics(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.similarity import brute_force_topk, filtered_topk

    rng = np.random.default_rng(29)
    n, d = 200, 8
    X = rng.standard_normal((n, d))
    labels = (np.arange(n) % 3).astype(np.int32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(pa.array(X.reshape(-1)), d),
            "label": pa.array(labels),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    out = filtered_topk(ds, [0, 1], k=6).to_pandas()
    # all neighbors share the query's label
    for r in out.itertuples(index=False):
        assert labels[int(r.neighbor_id)] == labels[int(r.query_id)]
    # equals brute force run on the label stratum alone
    for q in (0, 1):
        stratum = ray.data.from_arrow(t.filter(pa.compute.equal(t["label"], labels[q])))
        want = brute_force_topk(stratum, [q], k=6).to_pandas()
        got = out[out.query_id == q].reset_index(drop=True)
        assert got["neighbor_id"].tolist() == want["neighbor_id"].tolist()
        assert np.allclose(got["sim"], want["sim"], atol=1e-9)


# ---------------------------------------------------------------------------
# baseline JPEG codec (r5 — pipelines/jpeg.py)
# ---------------------------------------------------------------------------


def _smooth_img(h=64, w=96):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    return (128 + 60 * np.sin(x / 9.0) + 50 * np.cos(y / 7.0)).clip(0, 255).astype(np.uint8)


def test_jpeg_round_trip():
    import numpy as np

    from ugfraud_ray.pipelines.jpeg import decode_jpeg_luma, encode_jpeg_gray

    img = _smooth_img()
    enc = encode_jpeg_gray(img, quality=90)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    dec = decode_jpeg_luma(enc)
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0  # q=90 on smooth content

    # non-multiple-of-8 dims crop correctly; lossy but bounded on noise
    rng = np.random.default_rng(5)
    img2 = rng.integers(0, 256, (41, 53), dtype=np.uint8)
    dec2 = decode_jpeg_luma(encode_jpeg_gray(img2, quality=50))
    assert dec2.shape == (41, 53)
    assert np.abs(dec2.astype(int) - img2.astype(int)).mean() < 40


def test_jpeg_restart_intervals():
    import numpy as np

    from ugfraud_ray.pipelines.jpeg import decode_jpeg_luma, encode_jpeg_gray

    img = _smooth_img(80, 120)
    ref = decode_jpeg_luma(encode_jpeg_gray(img, quality=85))
    for ri in (1, 3, 7):
        dec = decode_jpeg_luma(encode_jpeg_gray(img, quality=85, restart_interval=ri))
        # restart markers change the byte stream but not the pixels
        assert np.array_equal(dec, ref)


def test_jpeg_three_component_interleaved_scan():
    """Hand-built 4:2:0 YCbCr JPEG (one MCU: 4 Y + 1 Cb + 1 Cr blocks,
    flat DC-only content): the decoder must entropy-decode the chroma
    blocks to stay in sync and IDCT only luma. Each Y block gets a
    distinct DC level, so any desync scrambles the quadrant means."""
    import struct

    import numpy as np

    from ugfraud_ray.pipelines.jpeg import (
        AC_LUMA_BITS, AC_LUMA_VALS, DC_LUMA_BITS, DC_LUMA_VALS, ZIGZAG,
        _BitWriter, _build_huff_codes, _magnitude, decode_jpeg_luma,
    )

    dc_codes = _build_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _build_huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    qt = np.ones(64, dtype=np.uint8)  # identity quantization

    bw = _BitWriter()
    # DC-only blocks: levels chosen so dequantized DC/8 + 128 hits exact
    # grays (DCT DC basis = 1/8 per pixel with this normalization)
    y_dc = [-256, -128, 128, 256]  # -> 96, 112, 144, 160 gray
    prev = 0
    for dc in y_dc:
        size, amp = _magnitude(dc - prev)
        prev = dc
        c, ln = dc_codes[size]
        bw.write(c, ln)
        if size:
            bw.write(amp, size)
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    for _ in range(2):  # Cb, Cr: zero DC (same tables), EOB
        c, ln = dc_codes[0]
        bw.write(c, ln)
        c, ln = ac_codes[0x00]
        bw.write(c, ln)
    bw.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(qt[ZIGZAG])
    # SOF0: 16x16 image, Y 2x2 sampling, Cb/Cr 1x1, all qtable 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += b"\x01\x22\x00" + b"\x02\x11\x00" + b"\x03\x11\x00"
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(DC_LUMA_VALS)) + b"\x00" + bytes(
        DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(AC_LUMA_VALS)) + b"\x10" + bytes(
        AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    # SOS: 3 components, all using DC table 0 / AC table 0
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += b"\x01\x00\x02\x00\x03\x00" + b"\x00\x3f\x00"
    out += bytes(bw.out) + b"\xff\xd9"

    dec = decode_jpeg_luma(bytes(out))
    assert dec.shape == (16, 16)
    quads = [dec[:8, :8], dec[:8, 8:], dec[8:, :8], dec[8:, 8:]]
    assert [int(np.round(q.mean())) for q in quads] == [96, 112, 144, 160]
    for q in quads:  # DC-only -> flat blocks
        assert q.std() == 0


def test_jpeg_rejects_progressive():
    import pytest

    from ugfraud_ray.pipelines.jpeg import decode_jpeg_luma, encode_jpeg_gray

    enc = bytearray(encode_jpeg_gray(_smooth_img(16, 16)))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg_luma(bytes(enc))


def test_dhash_dedup_on_planted_jpeg_duplicates(ray_session):
    """dHash dedup over a mixed BMP/JPEG corpus: a JPEG re-encode of a
    BMP image is a near-dup (tiny Hamming distance), and two identical
    JPEG payloads are exact dHash duplicates."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.jpeg import encode_jpeg_gray
    from ugfraud_ray.pipelines.multimodal import (
        DHasher,
        RealDecoder,
        encode_bmp_gray8,
        media_dhash_dedup,
    )

    rng = np.random.default_rng(11)
    base = [_smooth_img(24, 32) + rng.integers(0, 40, (24, 32), dtype=np.uint8)
            for _ in range(4)]
    payloads = [encode_bmp_gray8(im) for im in base]
    payloads.append(encode_jpeg_gray(base[0], quality=95))  # id 4 ~ id 0
    payloads.append(payloads[4])                            # id 5 == id 4
    t = pa.table({
        "media_id": pa.array(range(len(payloads)), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    out = media_dhash_dedup(ds, decoder=RealDecoder()).to_pandas()
    h = dict(zip(out["media_id"].astype(int), out["dhash"]))
    keep = dict(zip(out["media_id"].astype(int), out["keep"]))
    assert h[5] == h[4] and not keep[5]  # identical JPEG payloads collapse
    # q=95 re-encode of the same pixels: hashes within a few bits
    ham = bin(int(h[4]) ^ int(h[0])).count("1")
    assert ham <= 6, ham
