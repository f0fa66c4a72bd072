"""GANG — linearized loopy BP on the product-user graph.

Reference /root/reference/UGFraud/Detector/GANG.py:

- prior vector: centered priors, products first then users
  (GANG.py:63-93; centering mean = 0.5 when nor_flg, else the
  nor_priors medians, helper.py:89-115)
- iteration (pu_lbp, GANG.py:115-137):
      x <- x0 + 2*0.008 * A @ x          (A = symmetric 0/1 adjacency)
  stop when |sum(x_new) - sum(x_old)| < 0.1 or max_iters.
- classify (GANG.py:139-162): user post = x[user], prod post = x[prod],
  review post = (user post + review prior)/2; all three scale_value'd.

The iteration is a pure Jacobi SpMV — identical math per superstep, so
the engine's partition-parallel run matches the reference per-iteration
(allclose; float summation order differs). The stop rule is the global
belief-sum difference, computed through the engine's stats channel and
evaluated by a driver-side stop_fn.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ugfraud_ray.functions.collect import collect_table
import ray.data

from ugfraud_ray.state.engine import SuperstepEngine, VertexProgram
from ugfraud_ray.state.layout import build_layout, symmetrize

GANG_WEIGHT = 2 * 0.008


class GANGProgram(VertexProgram):
    state_dim = 1
    combine = "sum"

    def init_state(self, vids, shard):
        # posterior starts at zeros (GANG.py:55)
        return np.zeros((len(vids), 1))

    def message(self, src_state, edge_data, shard):
        return src_state[:, 0]

    def apply(self, vids, old, agg, have_msg, aux, shard):
        prior = shard.vertex_aux("prior_centered", 0.0)
        new = prior + GANG_WEIGHT * agg[:, 0]
        return new, {
            "delta": float(np.abs(new - old[:, 0]).sum()),
            "belief_sum": float(new.sum()),
        }


def _stop_on_sum_diff(threshold: float = 0.1):
    def stop(stats: dict, prev_aux: dict) -> bool:
        prev = prev_aux.get("belief_sum", 0.0)
        return abs(stats["belief_sum"] - prev) < threshold

    return stop


def normalize_priors_by_kind(vertex_prior: "ray.data.Dataset") -> "ray.data.Dataset":
    """The nor_flg=False prior path: per-kind min-max normalization then
    centering by the per-kind "mean" — which the reference defines as
    the element at index int(n/2) of the DESCENDING value sort
    (nor_priors, Utils/helper.py:89-115; B7 in SURVEY §2.11).

    Per-kind min/max via grouped aggregate; the median element via a
    per-kind sort + offset pick (kinds are few, values per kind are the
    vertex count — the sort is the only shuffle).
    """
    from ray.data.aggregate import Count, Max, Min

    stats_t = collect_table(
        vertex_prior.groupby("kind").aggregate(
            Min("prior", alias_name="mn"), Max("prior", alias_name="mx"),
            Count(alias_name="n"),
        )
    )
    stats = {}
    for r in stats_t.to_pylist():
        stats[int(r["kind"])] = (float(r["mn"]), float(r["mx"]), int(r["n"]))
    from ugfraud_ray.functions.quantiles import exact_rank

    medians = {}
    for kind, (mn, mx, n) in stats.items():
        # B7 picks the element at DESCENDING index int(n/2)
        # (helper.py:105-107) = ascending rank n-1-int(n/2) of the same
        # multiset; exact_rank resolves it with the shared
        # histogram-select machinery — no sort, no driver take(n/2)
        sub = vertex_prior.filter(expr=f"kind == {int(kind)}")
        # the reference subtracts the RAW median from the NORMALIZED
        # values (nor_priors returns pre-normalization medians,
        # helper.py:105-107 + GANG.py:69-80) — replicated exactly
        medians[kind] = exact_rank(sub, "prior", n - 1 - n // 2, n, approx_rows=n)
    stats_ref = ray.put((stats, medians))

    def center(t: pa.Table) -> pa.Table:
        st, med = ray.get(stats_ref)
        kind = t["kind"].to_numpy(zero_copy_only=False)
        p = t["prior"].to_numpy(zero_copy_only=False).astype(np.float64)
        out = np.empty_like(p)
        for k, (mn, mx, _) in st.items():
            m = kind == k
            span = (mx - mn) or 1.0
            out[m] = (p[m] - mn) / span - med[k]
        return pa.table({"vid": t["vid"], "prior_centered": pa.array(out)})

    return vertex_prior.map_batches(center, batch_format="pyarrow")


def gang(
    edges: "ray.data.Dataset",
    vertex_prior: "ray.data.Dataset",
    n_vertices: int,
    layout_dir: str,
    P: int = 4,
    max_iters: int = 1000,
    nor_flg: bool = True,
    hub_threshold: int | None = None,
    ckpt_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
) -> tuple["ray.data.Dataset", list[dict]]:
    """Run GANG pu_lbp; returns (Dataset(vid, posterior), metrics).

    edges: directed user->prod (symmetrized here); vertex_prior:
    (vid, prior, kind). nor_flg=True centers RAW priors at 0.5
    (GANG.py:66-68); nor_flg=False min-max-normalizes per kind and
    centers at the per-kind nor_priors median (GANG.py:69-71).
    """
    if nor_flg:
        def center(t: pa.Table) -> pa.Table:
            c = t["prior"].to_numpy(zero_copy_only=False) - 0.5
            return pa.table({"vid": t["vid"], "prior_centered": pa.array(c, pa.float64())})

        centered = vertex_prior.map_batches(center, batch_format="pyarrow")
    else:
        centered = normalize_priors_by_kind(vertex_prior)
    sym = symmetrize(edges.select_columns(["src", "dst"]))
    # small materialized inputs: materialize sym and the centered priors
    # so build_layout's driver-local write path applies
    import ray.data as _rd

    if isinstance(edges, _rd.dataset.MaterializedDataset) and edges.count() * 2 <= 1_000_000:
        sym = sym.materialize()
        centered = centered.materialize()
    layout = build_layout(
        sym, n_vertices, layout_dir, P=P, hub_threshold=hub_threshold,
        vertex_aux=centered,
    )
    eng = SuperstepEngine(layout, GANGProgram(), ckpt_dir=ckpt_dir,
                          checkpoint_every=checkpoint_every)
    eng.run(max_iters=max_iters, tol=None, resume=resume, stop_fn=_stop_on_sum_diff(0.1))
    out = eng.result_dataset().rename_columns({"s0": "posterior"}).materialize()
    eng.shutdown()
    return out, eng.metrics


def gang_review_scores(
    posteriors: "ray.data.Dataset", review_prior_edges: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """classify's review read-out: (user posterior + review prior) / 2
    (GANG.py:158-159), via broadcast of the (per-vertex, small) posterior
    table into a map over edges."""
    pt = collect_table(posteriors)
    vid = pt["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
    post = pt["posterior"].to_numpy(zero_copy_only=False)
    dense = np.zeros(int(vid.max()) + 1 if len(vid) else 1, dtype=np.float64)
    dense[vid] = post
    ref = ray.put(dense)

    def f(t: pa.Table) -> pa.Table:
        d = ray.get(ref)
        u_post = d[t["src"].to_numpy(zero_copy_only=False)]
        score = (u_post + t["prior"].to_numpy(zero_copy_only=False)) / 2.0
        return pa.table({"src": t["src"], "dst": t["dst"], "score": pa.array(score)})

    return review_prior_edges.map_batches(f, batch_format="pyarrow")
