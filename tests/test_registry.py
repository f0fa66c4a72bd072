"""Driver-contract registry invariants (cheap freeze guard, no Ray
pipeline execution): the queries()/oracle_sql() maps stay consistent,
and every oracle SQL string parses AND binds against the real sf0.001
views via EXPLAIN — catching column typos / broken CTE edits without
paying the full value sweep."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# resolve the testdata root from the environment (same convention as
# bench.py's GRAFT_SF_DIR) so the SQL-bind guard runs wherever the
# tables are staged, not only on the driver host's layout
SF = os.environ.get(
    "GRAFT_SF0001_DIR",
    os.path.join(os.environ.get("GRAFT_TESTDATA_ROOT", "/root/testdata"), "sf0.001"),
)
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def entry_maps():
    import __ray_entry__ as em

    return em.queries(), em.oracle_sql()


def test_every_oracle_has_a_query(entry_maps):
    qs, osql = entry_maps
    orphans = set(osql) - set(qs)
    assert not orphans, f"oracle_sql keys without queries(): {sorted(orphans)}"


def test_rows_only_set_is_the_documented_eight(entry_maps):
    # r5: doc_bpe_merges + doc_bpe_tokens_trained (merge-loop CTE
    # unroll + final-state encode) and msf_edges (unique-weight Borůvka
    # unroll) gained full value oracles
    qs, osql = entry_maps
    rows_only = set(qs) - set(osql)
    expected = {
        "ann_ivf_topk",
        "embedding_pca", "fbox_suspicious_users", "fraudar_blocks",
        "fraudar_user_scores", "media_features",
        "svd_singular_values", "svd_user_probs",
    }
    assert rows_only == expected, (
        f"rows-only drift: +{sorted(rows_only - expected)} "
        f"-{sorted(expected - rows_only)} — update SURVEY §11.6 if intentional"
    )


def test_every_oracle_sql_binds(entry_maps):
    if not os.path.isdir(SF):  # pragma: no cover
        pytest.skip("driver testdata absent")
    _, osql = entry_maps
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    bad = []
    for name, sql in osql.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: {type(e).__name__}: {str(e)[:200]}")
    assert not bad, "oracle SQL fails to bind:\n" + "\n".join(bad)
