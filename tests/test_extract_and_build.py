"""M1/M2: pages synthesis -> extraction -> graph build.

Conformance gate #1 (SURVEY §7.4): per-url extracted text byte-identical
to the ground-truth text column.
"""

import numpy as np
import pyarrow as pa
import ray.data

from ugfraud_ray.sources.pages import PagesSpec, synthesize_pages, prod_url, user_url
from ugfraud_ray.stages.extract import extract_edges, extract_text
from ugfraud_ray.stages.graph_build import (
    build_graph,
    dedup_edges,
    degree_table,
    number_vertices,
    with_row_index,
)


def _pages_ds(spec: PagesSpec):
    table, edges = synthesize_pages(spec)
    return ray.data.from_arrow(table), table, edges


def test_text_extraction_byte_identical():
    ds, table, _ = _pages_ds(PagesSpec(n_users=60, n_prods=8, n_edges=150, seed=7))
    out = extract_text(ds).to_pandas().set_index("url")["extracted_text"]
    truth = dict(zip(table["url"].to_pylist(), table["text"].to_pylist()))
    assert len(out) == len(truth)
    for url, text in truth.items():
        assert out[url] == text, f"text mismatch for {url}"
    # byte-identical, not just str-equal
    assert all(out[u].encode() == t.encode() for u, t in truth.items())


def test_edge_extraction_matches_ground_truth():
    spec = PagesSpec(n_users=60, n_prods=8, n_edges=150, seed=7)
    ds, _, gt_edges = _pages_ds(spec)
    got = extract_edges(ds).to_pandas()
    got_pairs = set(zip(got.src_url, got.dst_url))
    want_pairs = {(user_url(int(u)), prod_url(int(p))) for u, p in gt_edges}
    assert got_pairs == want_pairs


def test_with_row_index_contiguous():
    ds = ray.data.from_arrow(pa.table({"x": list(range(100))})).repartition(7)
    out = with_row_index(ds, "idx").to_pandas()
    assert sorted(out.idx.tolist()) == list(range(100))


def test_build_graph_numbering_and_degree():
    spec = PagesSpec(n_users=40, n_prods=6, n_edges=120, seed=3)
    ds, _, gt_edges = _pages_ds(spec)
    g = build_graph(ds)
    verts = g["vertices"].to_pandas()
    # vids contiguous from 0
    assert sorted(verts.vid.tolist()) == list(range(len(verts)))
    # products (kind 0 = appears as dst) numbered before users
    max_prod_vid = verts[verts.kind == 0].vid.max()
    min_user_vid = verts[verts.kind == 1].vid.min()
    assert max_prod_vid < min_user_vid
    # edge count matches dedup of ground truth
    n_unique = len({(int(u), int(p)) for u, p in gt_edges})
    assert g["edges"].count() == n_unique
    # degree table: total degree == 2 * edges (undirected)
    deg = degree_table(g["edges"], "both").to_pandas()
    assert deg.degree.sum() == 2 * n_unique
    # in-degree of most popular product should dominate (zipf skew)
    deg_in = degree_table(g["edges"], "in").to_pandas()
    assert deg_in.degree.max() >= deg_in.degree.mean() * 2


def test_dedup_edges_is_exact():
    t = pa.table(
        {
            "src_url": ["a", "a", "a", "b"],
            "dst_url": ["x", "x", "y", "x"],
            "ts": pa.array([3, 1, 2, 5], pa.timestamp("us")),
        }
    )
    out = dedup_edges(ray.data.from_arrow(t)).to_pandas().sort_values(["src_url", "dst_url"])
    assert len(out) == 3
    # keeps min ts deterministically
    assert out[(out.src_url == "a") & (out.dst_url == "x")].ts.iloc[0].value // 1000 == 1


def test_multi_component_spec():
    spec = PagesSpec(n_users=20, n_prods=4, n_edges=40, seed=5, n_components=3)
    _, edges = synthesize_pages(spec)
    users = {int(u) for u, _ in edges}
    assert max(users) >= 40  # shifted clone components exist


def test_distributed_pages_writer_resumable(tmp_path):
    import os

    import ray.data

    from ugfraud_ray.sources.pages import synthesize_pages_distributed
    from ugfraud_ray.stages.extract import text_conformance_mismatches

    out = str(tmp_path / "corpus")
    w1 = synthesize_pages_distributed(out, n_users=2500, n_prods=300, shard_rows=1000)
    assert w1 == 3
    # resume: nothing rewritten
    assert synthesize_pages_distributed(out, n_users=2500, n_prods=300, shard_rows=1000) == 0
    # partial failure sim: drop one shard's marker -> only it rewrites
    os.remove(os.path.join(out, "shard=1", "_DONE"))
    assert synthesize_pages_distributed(out, n_users=2500, n_prods=300, shard_rows=1000) == 1
    ds = ray.data.read_parquet(out)
    assert ds.count() == 2800
    # the invariant holds on the distributed corpus too
    assert text_conformance_mismatches(ds) == 0


def test_read_metadata_gz_matches_reference_parse(ray_session, tmp_path):
    """sources/metadata.read_metadata must parse the reference's gzipped
    5-field format (helper.py:123-202) including the 'None' rating and
    the truncating <=3 -> 2 binning."""
    import gzip

    from ugfraud_ray.sources.metadata import read_edge_list, read_metadata

    lines = [
        "u1 p1 5.0 -1 2012-06-01",
        "u2 p1 3.5 1 2012-06-02",   # int(3.5)=3 -> binned 2
        "u2 p2 None 0 2012-06-03",
        "u3 p2 1.0 1 2012-06-04",
    ]
    gz = tmp_path / "meta.gz"
    with gzip.open(gz, "wt") as f:
        f.write("\n".join(lines) + "\n")
    got = read_metadata(str(gz)).to_pandas().sort_values(["user_id", "prod_id"]).reset_index(drop=True)
    assert got["user_id"].tolist() == ["u1", "u2", "u2", "u3"]
    assert got["prod_id"].tolist() == ["p1", "p1", "p2", "p2"]
    import numpy as np
    r = got["rating"].to_numpy()
    assert r[0] == 5.0 and r[1] == 3.5 and np.isnan(r[2]) and r[3] == 1.0
    assert got["label"].tolist() == [-1, 1, 0, 1]
    b = got["rating_12"].tolist()
    assert b[0] == 1 and b[1] == 2 and b[3] == 2

    el = tmp_path / "edges.txt"
    el.write_text("0 1\n2 3\n2 1\n")
    e = read_edge_list(str(el)).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert e["src"].tolist() == [0, 2, 2]
    assert e["dst"].tolist() == [1, 1, 3]


def test_number_int_vertices_distributed_parity(ray_session):
    """broadcast_threshold=0 forces the range-bucket distributed
    numbering (per-block distinct -> ONE coarse shuffle -> driver
    prefix offsets over bucket counts); it must agree with the
    driver-local path on the vid map AND the remapped edges."""
    import pyarrow as pa

    from ugfraud_ray.pipelines.testdata_graph import number_int_vertices

    rng = np.random.default_rng(17)
    # sparse, clumpy id domain (exercises empty range buckets)
    ids = np.unique(rng.choice([5, 7, 900, 901, 10_000, 10_001, 777_777], 200))
    src = rng.choice(ids, 300).astype(np.int64)
    dst = rng.choice(ids, 300).astype(np.int64)
    e = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(5)
    e1, v1, n1 = number_int_vertices(e)
    e2, v2, n2 = number_int_vertices(e, broadcast_threshold=0)
    assert n1 == n2
    p1 = v1.to_pandas().sort_values("id").reset_index(drop=True)
    p2 = v2.to_pandas().sort_values("id").reset_index(drop=True)
    assert p1["id"].tolist() == p2["id"].tolist()
    assert p1["vid"].tolist() == p2["vid"].tolist()
    cols = ["src", "dst"]
    a = e1.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    b = e2.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_unmap_vids_join_branch_parity(ray_session):
    """local_threshold=0 forces the unmap hash-join branch (the O(V)
    map never lands on the driver); must equal the broadcast gather,
    including the double-unmap shape where the result already carries
    an 'id' column."""
    import pyarrow as pa

    from ugfraud_ray.pipelines.testdata_graph import unmap_vids

    vmap = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([100, 200, 300, 400], pa.int64()),
                "vid": pa.array([0, 1, 2, 3], pa.int64()),
            }
        )
    )
    res = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array([2, 0, 3], pa.int64()),
                "component": pa.array([0, 0, 3], pa.int64()),
            }
        )
    )
    a = unmap_vids(res, vmap, vid_col="vid", out_col="id")
    b = unmap_vids(res, vmap, vid_col="vid", out_col="id", local_threshold=0)
    pa_ = a.to_pandas().sort_values("id").reset_index(drop=True)
    pb = b.to_pandas().sort_values("id").reset_index(drop=True)
    assert pa_["id"].tolist() == pb["id"].tolist() == [100, 300, 400]
    assert pa_["component"].tolist() == pb["component"].tolist()

    # second unmap: result already has an 'id' column
    c = unmap_vids(a, vmap, vid_col="component", out_col="cluster", local_threshold=0)
    pc_ = c.to_pandas().sort_values("id").reset_index(drop=True)
    assert pc_["cluster"].tolist() == [100, 100, 400]
