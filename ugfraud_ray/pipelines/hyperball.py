"""HyperBall: the neighborhood function N(v, r) via per-vertex HLL balls.

The canonical web-graph distance analysis (Boldi–Vigna HyperBall): each
vertex keeps a small HyperLogLog of the set of vertices reachable from
it within r hops; one superstep unions every vertex's sketch with its
successors' sketches, so after r rounds register state describes the
radius-r out-ball. Ball-size estimates give the neighborhood function,
average-distance and effective-diameter readouts that are otherwise
O(n·E) BFS work. Reference analog: SpEagle's `local_schedule` explores
exactly these bounded balls one source at a time
(/root/reference Detector/SpEagle.py:339-379); HyperBall is the
all-sources-at-once sketch version.

Determinism contract (same as pipelines/sketches.py, so the DuckDB
oracle replays registers AND estimates bit-exactly): item hash =
md5-low64 of the vertex's ORIGINAL id string (== DuckDB
``md5_number_upper``); rho from EXACT integer bit length (the suffix
has 57 bits here — too wide for the float-frexp shortcut, so a 6-step
vectorized shift cascade computes bit length exactly); register sums
are exact integers; int→double through the decimal string.

Scale shape, two paths (identical registers, parity-tested):

- ≤ ``local_threshold`` edges: registers are a dense (n, 128) uint8
  driver matrix; one superstep is a collected-edge ``np.maximum.at``
  pass (the usual shuffle-spin-up gate).
- above it: NO (n, 128) matrix anywhere. Edges are written once as
  dst%P-partitioned parquet; P ``_HBShard`` actors each own the
  registers of vids with vid % P == pid plus the edge slice whose dsts
  they own, so the gather regs[dst] is shard-LOCAL. Each round a shard
  pre-combines its contributions per src (``np.maximum.at`` into a
  per-src-owner buffer — max-union is mergeable, so pre-combining is
  exact) and ships P (src, regs) payloads as direct actor-to-actor
  refs; owners fold with another ``maximum.at``. Per-round readouts
  accumulate shard-local; the driver sees only the final (n·(R+1), 5)
  readout table (the query result itself), never register state. The
  vid→original-id map still ships once via ``ray.put`` (8 B/vertex —
  at full web scale it would come from the layout's vertex files).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray
import ray.data

HB_P = 7
HB_M = 1 << HB_P                 # 128 registers -> rel std err ~1.04/sqrt(128) = 9.2%
_W_BITS = 64 - HB_P
_RHO_MAX = _W_BITS + 1           # 58
HB_ALPHA_NUM = (
    0.7213 / (1 + 1.079 / float(HB_M)) * float(HB_M) * float(HB_M) * float(1 << _RHO_MAX)
)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact integer bit length of uint64 values (vectorized shift
    cascade — float frexp is wrong past 2^53)."""
    x = x.copy()
    bl = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        x[m] >>= np.uint64(s)
    bl[x > 0] += 1
    return bl


def init_registers(ids: np.ndarray) -> np.ndarray:
    """(n, HB_M) uint8: each vertex's sketch of {itself}, hashed by
    ORIGINAL id (decimal string)."""
    from ugfraud_ray.pipelines.sketches import _md5_low64

    hv = _md5_low64(ids.tolist())
    j = (hv & np.uint64(HB_M - 1)).astype(np.int64)
    w = hv >> np.uint64(HB_P)
    rho = np.where(w > 0, _RHO_MAX - _bit_length_u64(w), _RHO_MAX).astype(np.uint8)
    regs = np.zeros((len(ids), HB_M), dtype=np.uint8)
    regs[np.arange(len(ids)), j] = rho
    return regs


def _estimates(regs: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-vertex (nz, float(S_total), estimate). S_total = Σ_j 2^(RHO_MAX
    - rho_j) (rho=0 for an empty register contributes 2^RHO_MAX) can reach
    128·2^58 = 2^65 — past int64 — so each row sums EXACT int64 hi/lo
    halves (term>>32 / term&0xffffffff, both ≤ 2^39·128) and only the
    final per-row (hi<<32)+lo runs through an exact Python int → float64
    conversion (correctly rounded, matching SQL's VARCHAR→DOUBLE route).
    Estimator op-for-op as sketches.hll_estimate."""
    n = regs.shape[0]
    nz = (regs > 0).sum(axis=1).astype(np.int64)
    shift = (np.int64(_RHO_MAX) - regs.astype(np.int64)).astype(np.uint64)
    term = np.left_shift(np.uint64(1), shift).astype(np.uint64)
    hi = (term >> np.uint64(32)).astype(np.int64).sum(axis=1)
    lo = (term & np.uint64(0xFFFFFFFF)).astype(np.int64).sum(axis=1)
    s_f = np.fromiter(
        (float((int(h) << 32) + int(l)) for h, l in zip(hi.tolist(), lo.tolist())),
        dtype=np.float64,
        count=n,
    )
    raw = HB_ALPHA_NUM / s_f
    zeros = (HB_M - nz).astype(np.float64)
    e = raw.copy()
    # math.log (not np.log) for bit-parity with the verified
    # sketches.hll_estimate / DuckDB ln() path; loop is mask-only
    for i in np.flatnonzero((zeros > 0) & (raw <= 2.5 * float(HB_M))).tolist():
        e[i] = float(HB_M) * math.log(float(HB_M) / zeros[i])
    est = np.floor(e * 100.0 + 0.5) / 100.0
    return nz, s_f, est


@ray.remote
class _HBShard:
    """Owns registers for vids with vid % P == pid and the edge slice
    whose dsts it owns (dst % P == pid)."""

    def __init__(self, pid: int, P: int, edge_dir: str, ids: np.ndarray):
        import glob
        import os

        import pyarrow.parquet as pq

        self.pid, self.P = pid, P
        self.ids_owned = ids[pid::P].astype(np.int64)
        self.regs = init_registers(self.ids_owned)  # (n_local, 128)
        files = sorted(glob.glob(os.path.join(edge_dir, f"part={pid}", "*.parquet")))
        if files:
            t = pa.concat_tables(
                [pq.read_table(f, columns=["src", "dst"]) for f in files]
            )
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            src = dst = np.empty(0, dtype=np.int64)
        # per-src-owner precompute: unique srcs + inverse for the exact
        # pre-combine (max-union is mergeable), plus the dst gather index
        self.groups = []
        owner = src % P
        for p in range(P):
            m = owner == p
            uniq, inv = np.unique(src[m], return_inverse=True)
            self.groups.append((uniq, inv, (dst[m] // P)))
        self.rows: list = []
        self._emit(0)

    def _emit(self, r: int) -> None:
        nz, s_f, est = _estimates(self.regs)
        self.rows.append(
            pa.table(
                {
                    "id": pa.array(self.ids_owned),
                    "r": pa.array(np.full(len(self.ids_owned), r, dtype=np.int64)),
                    "n_registers": pa.array(nz),
                    "s_hll": pa.array(s_f),
                    "approx": pa.array(est),
                }
            )
        )

    def partials(self, r: int):
        out = []
        for uniq, inv, dst_loc in self.groups:
            buf = np.zeros((len(uniq), HB_M), dtype=np.uint8)
            if len(inv):
                np.maximum.at(buf, inv, self.regs[dst_loc])
            out.append((uniq, buf))
        return tuple(out)

    def fold(self, r: int, *payloads) -> None:
        for srcs, buf in payloads:
            if len(srcs):
                np.maximum.at(self.regs, srcs // self.P, buf)
        self._emit(r)

    def collect(self) -> pa.Table:
        return pa.concat_tables(self.rows)


def _nf_sharded(
    edges: "ray.data.Dataset",
    ids: np.ndarray,
    radius: int,
    P: int,
    edge_dir: str | None,
) -> pa.Table:
    import tempfile

    edge_dir = edge_dir or tempfile.mkdtemp(prefix="hb_")
    P = max(2, P)  # num_returns=P routing assumes a list of refs
    P_ = P

    def assign(t: pa.Table) -> pa.Table:
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array((dst % P_).astype(np.int64)))

    edges.select_columns(["src", "dst"]).map_batches(
        assign, batch_format="pyarrow"
    ).write_parquet(edge_dir, partition_cols=["part"])

    ids_ref = ray.put(ids.astype(np.int64))
    shards = [_HBShard.remote(p, P, edge_dir, ids_ref) for p in range(P)]
    for r in range(1, radius + 1):
        outs = [
            shards[i].partials.options(num_returns=P).remote(r) for i in range(P)
        ]
        folds = [
            shards[j].fold.remote(r, *[outs[i][j] for i in range(P)])
            for j in range(P)
        ]
        ray.get(folds)
    t = pa.concat_tables(ray.get([s.collect.remote() for s in shards]))
    for s in shards:
        ray.kill(s)
    order = np.lexsort(
        (
            t["id"].to_numpy(zero_copy_only=False),
            t["r"].to_numpy(zero_copy_only=False),
        )
    )
    return t.take(pa.array(order))


def neighborhood_function(
    edges: "ray.data.Dataset",
    ids: np.ndarray,
    radius: int = 4,
    local_threshold: int = 5_000_000,
    approx_edges: int | None = None,
    P: int = 4,
    edge_dir: str | None = None,
) -> pa.Table:
    """(id, r, n_registers, s_hll, approx) for r = 0..radius: the
    estimated out-ball size |{u : dist(v→u) <= r}| per vertex. ``ids``
    maps contiguous vids to original ids (hash identity); ``edges`` are
    directed on the vid domain; multi-edges are harmless (max-union is
    idempotent)."""
    # unknown size is treated as LARGE: collecting an unhinted input
    # to the driver is the one unrecoverable choice at scale
    if approx_edges is None or approx_edges > local_threshold:
        return _nf_sharded(edges, ids, radius, P, edge_dir)

    n = len(ids)
    regs = init_registers(ids)
    out_id, out_r, out_nz, out_s, out_e = [], [], [], [], []

    def emit(r: int, regs: np.ndarray) -> None:
        nz, s_f, est = _estimates(regs)
        out_id.append(ids.astype(np.int64))
        out_r.append(np.full(n, r, dtype=np.int64))
        out_nz.append(nz)
        out_s.append(s_f)
        out_e.append(est)

    emit(0, regs)
    from ugfraud_ray.functions.collect import collect_table

    t = collect_table(edges.select_columns(["src", "dst"]))
    a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    for r in range(1, radius + 1):
        upd = np.zeros_like(regs)
        np.maximum.at(upd, a, regs[b])
        regs = np.maximum(regs, upd)
        emit(r, regs)

    return pa.table(
        {
            "id": pa.array(np.concatenate(out_id)),
            "r": pa.array(np.concatenate(out_r)),
            "n_registers": pa.array(np.concatenate(out_nz)),
            "s_hll": pa.array(np.concatenate(out_s)),
            "approx": pa.array(np.concatenate(out_e)),
        }
    )


def harmonic_centrality(nf: pa.Table) -> pa.Table:
    """Approximate harmonic centrality from the neighborhood function:
    h(v) = Σ_{r=1..R} (|B(v,r)| − |B(v,r−1)|) / r — HyperBall's headline
    readout (each shell's members sit at distance exactly r under the
    sketch approximation). Terms are added in ASCENDING r order as one
    fixed float expression; the SQL oracle pivots r explicitly and sums
    the identical expression left-to-right, so the float result is
    bit-exact. Input is the (id, r, …, approx) table from
    ``neighborhood_function``; output (id, harmonic) sorted by id."""
    ids = nf["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    rs = nf["r"].to_numpy(zero_copy_only=False).astype(np.int64)
    ap = nf["approx"].to_numpy(zero_copy_only=False).astype(np.float64)
    radius = int(rs.max()) if len(rs) else 0
    order = np.lexsort((rs, ids))
    ids_s, ap_s = ids[order], ap[order]
    n = len(ids_s) // (radius + 1)
    mat = ap_s.reshape(n, radius + 1)
    h = np.zeros(n, dtype=np.float64)
    for r in range(1, radius + 1):  # fixed ascending-order summation
        h = h + (mat[:, r] - mat[:, r - 1]) / float(r)
    return pa.table({"id": pa.array(ids_s.reshape(n, radius + 1)[:, 0]), "harmonic": pa.array(h)})


def closeness_centrality(nf: pa.Table) -> pa.Table:
    """Approximate (Lin-style, out-)closeness from the neighborhood
    function: c(v) = reach(v) / S(v) with reach = |B(v,R)| − 1 and
    S(v) = Σ_{r=1..R} r·(|B(v,r)| − |B(v,r−1)|) — the estimated sum of
    distances to everything reachable within the horizon. c = 0 when
    S = 0 (sink vertices). Same fixed ascending-r float association as
    ``harmonic_centrality`` so the SQL pivot replays bit-exactly.
    Output (id, closeness) sorted by id."""
    ids = nf["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    rs = nf["r"].to_numpy(zero_copy_only=False).astype(np.int64)
    ap = nf["approx"].to_numpy(zero_copy_only=False).astype(np.float64)
    radius = int(rs.max()) if len(rs) else 0
    order = np.lexsort((rs, ids))
    ids_s, ap_s = ids[order], ap[order]
    n = len(ids_s) // (radius + 1)
    mat = ap_s.reshape(n, radius + 1)
    s = np.zeros(n, dtype=np.float64)
    for r in range(1, radius + 1):  # fixed ascending-order summation
        s = s + (mat[:, r] - mat[:, r - 1]) * float(r)
    reach = mat[:, radius] - 1.0
    c = np.where(s > 0.0, reach / np.where(s > 0.0, s, 1.0), 0.0)
    return pa.table(
        {"id": pa.array(ids_s.reshape(n, radius + 1)[:, 0]), "closeness": pa.array(c)}
    )


def distance_distribution(nf: pa.Table) -> pa.Table:
    """Global neighborhood function N(r) = Σ_v |B(v,r)| (estimated
    reachable-pairs count within r hops) — HyperBall's whole-graph
    distance-distribution readout. ``approx`` sits on an exact 0.01
    grid (see ``_estimates``), so each total is an EXACT integer sum of
    round-half-up(approx·100) int64 partials (order-independent ⇒
    bit-exact vs SQL SUM) read out as float(total)/100. Output
    (r, n_pairs) for r = 0..R, ascending."""
    rs = nf["r"].to_numpy(zero_copy_only=False).astype(np.int64)
    ap = nf["approx"].to_numpy(zero_copy_only=False).astype(np.float64)
    radius = int(rs.max()) if len(rs) else 0
    q = np.floor(ap * 100.0 + 0.5).astype(np.int64)
    totals = np.zeros(radius + 1, dtype=np.int64)
    np.add.at(totals, rs, q)
    return pa.table(
        {
            "r": pa.array(np.arange(radius + 1, dtype=np.int64)),
            "n_pairs": pa.array(totals.astype(np.float64) / 100.0),
        }
    )


def effective_diameter(nf: pa.Table, alpha: float = 0.9) -> pa.Table:
    """Interpolated effective diameter at fraction ``alpha``: the
    smallest (linearly interpolated) r such that N(r) ≥ alpha·N(R),
    computed from the exact-integer distance-distribution totals with
    one fixed scalar float expression per branch (SQL replays the same
    CASE chain). Single row (alpha, effective_diameter)."""
    dist = distance_distribution(nf)
    tot = dist["n_pairs"].to_numpy(zero_copy_only=False).astype(np.float64)
    target = alpha * tot[-1]
    # sequential first-match scan (NOT searchsorted): identical branch
    # order to the SQL CASE chain even if totals were non-monotone
    d = 0.0
    if tot[0] < target:
        for r in range(1, len(tot)):
            if tot[r] >= target:
                d = float(r - 1) + (target - tot[r - 1]) / (tot[r] - tot[r - 1])
                break
    return pa.table(
        {"alpha": pa.array([float(alpha)]), "effective_diameter": pa.array([d])}
    )
