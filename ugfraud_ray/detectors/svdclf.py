"""SVD classifier head — the reference's SVM step, deterministic numpy.

Reference /root/reference/UGFraud/Detector/SVD.py:90-138: ``classify``
fits ``sklearn.svm.SVC(probability=True)`` on the SVD user embedding
rows of a 50/50 random split and returns ``predict_proba``;
``evaluate_SVD`` wires ``random_split`` (SVD.py:57-88: pos = users
with any ``label == 0`` review under the demo remap, i.e. any SPAM
review; train = ``np.random.choice`` of half of each class, WITH
replacement) -> feature gather by ``user_index`` -> classify, and
reads out ``probas_pred[:, 0]`` — the probability of the −1 (=
non-spam) class. The stray ``SVC(C=100, tol=0.00001)`` at SVD.py:93
constructs and DISCARDS an object (reference bug — defaults rule the
fit), so no C/tol knobs are replicated.

sklearn is unavailable in this sandbox (the reference itself cannot
run this step here), so the engine substitutes ``LinearSVC``: an
L2-regularized linear model on the ±1 labels trained by FIXED-STEP,
FIXED-ITERATION full-batch gradient descent on the logistic loss —
fully deterministic, no RNG, no line search. Conformance is
end-to-end: tests/test_reference_conformance.py executes the
UNMODIFIED reference ``evaluate_SVD`` with ``sklearn.svm`` shimmed to
THIS class, so the split semantics, index plumbing and column-0
readout are verified against the reference's own code.

Scale shape: the trained model is (k+1) floats for a k-dim embedding,
so training needs only a bounded sample — ``train_cap`` keeps the
collected (cap, k) feature matrix driver-sized via a deterministic
md5-hash-ordered cap (smallest hashes win; order-free, resumable).
Scoring is the big pass and streams: ``map_batches`` with the weights
broadcast once via ``ray.put``. Label attachment is a broadcast
semi-join below ``local_threshold`` labeled users, else a Ray hash
join.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table
from ugfraud_ray.stages.graph_build import join_partitions


class LinearSVC:
    """Deterministic linear classifier on ±1 labels.

    Logistic loss + L2, full-batch gradient descent with fixed step
    and iteration count; features standardized to the training
    moments. ``predict_proba`` columns are ordered by ASCENDING class
    label (sklearn convention): [P(−1), P(+1)].
    """

    def __init__(self, lam: float = 1e-3, lr: float = 0.5, n_iters: int = 300):
        self.lam = float(lam)
        self.lr = float(lr)
        self.n_iters = int(n_iters)

    def fit(self, X: np.ndarray, y: np.ndarray) -> "LinearSVC":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if X.ndim != 2 or len(X) != len(y):
            raise ValueError(f"bad training shapes {X.shape} vs {y.shape}")
        if not np.isin(y, (-1.0, 1.0)).all():
            raise ValueError("labels must be ±1")
        self.mu_ = X.mean(axis=0)
        sd = X.std(axis=0)
        self.sd_ = np.where(sd > 0, sd, 1.0)
        Z = (X - self.mu_) / self.sd_
        n, k = Z.shape
        w = np.zeros(k)
        b = 0.0
        for _ in range(self.n_iters):
            m = Z @ w + b
            # d/dm of log(1+exp(-y m)) = -y * sigma(-y m); tanh form is
            # overflow-free for any margin
            g = -y * 0.5 * (1.0 - np.tanh(0.5 * y * m))
            gw = Z.T @ g / n + self.lam * w
            gb = g.sum() / n
            w -= self.lr * gw
            b -= self.lr * gb
        self.w_, self.b_ = w, b
        return self

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        Z = (np.asarray(X, dtype=np.float64) - self.mu_) / self.sd_
        return Z @ self.w_ + self.b_

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.where(self.decision_function(X) > 0, 1.0, -1.0)

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        m = self.decision_function(X)
        p_pos = 0.5 * (1.0 + np.tanh(0.5 * m))
        return np.column_stack([1.0 - p_pos, p_pos])


def classify(
    training_data: np.ndarray,
    training_labels: np.ndarray,
    testing_data: np.ndarray,
) -> np.ndarray:
    """SVD.py:90-96 ``classify``: fit on the training split, return
    (n_test, 2) probabilities ordered [P(−1), P(+1)]."""
    return LinearSVC().fit(training_data, training_labels).predict_proba(testing_data)


def classify_binary(
    training_data: np.ndarray,
    training_labels: np.ndarray,
    testing_data: np.ndarray,
) -> np.ndarray:
    """SVD.py:97-103 ``classify_binary``: ±1 predictions."""
    return LinearSVC().fit(training_data, training_labels).predict(testing_data)


def _hash64(vids: np.ndarray, seed: int) -> np.ndarray:
    """md5-low64 of f"{seed}:{vid}" — the engine's shared hash
    convention (pipelines/sketches._md5_low64 == DuckDB
    md5_number_upper)."""
    from ugfraud_ray.pipelines.sketches import _md5_low64

    return _md5_low64([f"{seed}:{v}" for v in vids.tolist()])


def _emb_matrix(t: pa.Table) -> np.ndarray:
    col = t["emb"].combine_chunks()
    k = col.type.list_size
    return np.asarray(col.flatten().to_numpy(zero_copy_only=False)).reshape(
        t.num_rows, k
    )


def svd_classifier_probs(
    embedding: "ray.data.Dataset",
    user_labels: "ray.data.Dataset",
    seed: int = 11,
    train_ids: "set | None" = None,
    test_ids: "set | None" = None,
    train_cap: int = 2_000_000,
    local_threshold: int = 20_000_000,
) -> "ray.data.Dataset":
    """(vid, prob) for the held-out users — evaluate_SVD, SVD.py:104-138.

    embedding: (vid, emb fixed_size_list<double,k>) from
    ``svd_user_embedding``; user_labels: (vid, label∈{0,1}) from
    ``user_ground_truth`` (1 ⇔ any spam review — the reference's
    ``pos`` set under the demo label remap, demo_pre.py:49-52). The ±1
    training target is +1 for pos, −1 otherwise (SVD.py:106-107);
    ``prob`` is the −1-class probability (SVD.py:137 column 0).

    Split: explicit (train_ids, test_ids) when given (the conformance
    path — the reference's own random_split injected); otherwise a
    seeded md5 coin per vid — a DELIBERATE seeded substitute for the
    reference's unseeded ``np.random.choice`` (same substitution as
    GANG's semi_data, SURVEY J4). Training rows beyond ``train_cap``
    are dropped by smallest-md5-first rank so the driver-side matrix
    stays bounded at any corpus size; scoring streams.
    """
    n_lab = user_labels.count()
    if n_lab <= local_threshold:
        lt = collect_table(user_labels)
        lab_vid = lt["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab_val = lt["label"].to_numpy(zero_copy_only=False).astype(np.int8)
        lab_ref = ray.put((lab_vid, lab_val))
        labeled = None
    else:
        # Arrow's hash join rejects fixed_size_list payload columns, so
        # the embedding is unpacked to k scalar columns around the join
        # and repacked after (found by the forced-gate parity test).
        lab_ref = None
        sch = embedding.schema()
        k_dim = sch.types[sch.names.index("emb")].list_size
        ecols = [f"_e{j}" for j in range(k_dim)]

        def unpack(t: pa.Table) -> pa.Table:
            m = _emb_matrix(t)
            out = {"vid": t["vid"]}
            for j, c in enumerate(ecols):
                out[c] = pa.array(m[:, j])
            return pa.table(out)

        def repack(t: pa.Table) -> pa.Table:
            m = np.column_stack(
                [t[c].to_numpy(zero_copy_only=False) for c in ecols]
            ).astype(np.float64)
            return pa.table(
                {
                    "vid": t["vid"],
                    "emb": pa.FixedSizeListArray.from_arrays(
                        pa.array(m.reshape(-1)), k_dim
                    ),
                    "label": t["label"],
                }
            )

        labeled = (
            embedding.map_batches(unpack, batch_format="pyarrow")
            .join(
                user_labels,
                join_type="inner",
                on=("vid",),
                num_partitions=join_partitions(),
            )
            .map_batches(repack, batch_format="pyarrow")
        )

    def attach(t: pa.Table) -> pa.Table:
        lv, lval = ray.get(lab_ref)
        vid = t["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lv) == 0:
            lab = np.full(len(vid), -1, dtype=np.int8)
            return t.append_column("label", pa.array(lab))
        order = np.argsort(lv, kind="stable")
        pos = np.clip(np.searchsorted(lv, vid, sorter=order), 0, len(lv) - 1)
        idx = order[pos]
        lab = np.where(lv[idx] == vid, lval[idx], -1).astype(np.int8)
        return t.append_column("label", pa.array(lab))

    if labeled is None:
        labeled = embedding.map_batches(attach, batch_format="pyarrow")
    labeled = labeled.filter(expr="label >= 0")

    if train_ids is not None or test_ids is not None:
        if train_ids is None or test_ids is None:
            raise ValueError("train_ids and test_ids must be given together")
        tr_arr = pa.array(sorted(int(v) for v in train_ids), pa.int64())
        te_arr = pa.array(sorted(int(v) for v in test_ids), pa.int64())
        tr_ref, te_ref = ray.put(tr_arr), ray.put(te_arr)

        def mark(t: pa.Table) -> pa.Table:
            is_tr = pc.is_in(t["vid"], value_set=ray.get(tr_ref))
            is_te = pc.is_in(t["vid"], value_set=ray.get(te_ref))
            sel = pc.fill_null(pc.or_(is_tr, is_te), False)
            t = t.filter(sel)
            return t.append_column(
                "is_train",
                pc.fill_null(pc.is_in(t["vid"], value_set=ray.get(tr_ref)), False),
            )

        labeled = labeled.map_batches(mark, batch_format="pyarrow")
    else:
        sref = int(seed)

        def coin(t: pa.Table) -> pa.Table:
            vid = t["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
            h = _hash64(vid, sref)
            return t.append_column("is_train", pa.array(h % np.uint64(2) == 0))

        labeled = labeled.map_batches(coin, batch_format="pyarrow")

    labeled = labeled.materialize()

    # ---- train: bounded driver-side gather (smallest-md5-first cap) ----
    train_t = collect_table(
        labeled.filter(expr="is_train == True").select_columns(
            ["vid", "emb", "label"]
        )
    )
    if train_t.num_rows > train_cap:
        h = _hash64(
            train_t["vid"].to_numpy(zero_copy_only=False).astype(np.int64), seed + 1
        )
        keep = np.argsort(h, kind="stable")[:train_cap]
        train_t = train_t.take(pa.array(np.sort(keep)))
    # vid-sort the training rows: the GD matmuls sum over rows, so row
    # order (which depends on block order / broadcast-vs-join path)
    # would otherwise perturb the model by ulps run to run
    vsort = np.argsort(
        train_t["vid"].to_numpy(zero_copy_only=False).astype(np.int64), kind="stable"
    )
    train_t = train_t.take(pa.array(vsort))
    if train_t.num_rows == 0:
        raise ValueError("empty training split")
    X = _emb_matrix(train_t)
    y = np.where(
        train_t["label"].to_numpy(zero_copy_only=False) == 1, 1.0, -1.0
    )
    if len(np.unique(y)) < 2:
        raise ValueError("training split has a single class")
    model = LinearSVC().fit(X, y)
    mref = ray.put((model.w_, model.b_, model.mu_, model.sd_))

    def score(t: pa.Table) -> pa.Table:
        w, b, mu, sd = ray.get(mref)
        Xb = _emb_matrix(t)
        m = ((Xb - mu) / sd) @ w + b
        prob_neg = 1.0 - 0.5 * (1.0 + np.tanh(0.5 * m))
        return pa.table({"vid": t["vid"], "prob": pa.array(prob_neg)})

    return labeled.filter(expr="is_train == False").map_batches(
        score, batch_format="pyarrow"
    )
