"""Partitioning-perturbation determinism harness (round-4 verdict
item 3).

The local oracle mirror runs every query under ONE fixed partitioning,
so it is structurally blind to order-dependent float accumulation: a
query whose result depends on shuffle merge order (the class of bug
that shipped as round 4's `emb_covariance_matrix` driver failure) is
green locally and red on the driver, which runs a different layout.

This module reruns EVERY registry key with a deliberately hostile
layout — a small odd shuffle-partition count, tiny input splits (so
file scans and mapInPandas see many more, differently-sized
partitions), and a tiny AQE advisory size (so runtime coalescing picks
different merge groupings) — and asserts the canonicalized result
still equals the DuckDB oracle. Any key that is only green under the
default 8/16/32-partition layout fails here first, not on the driver.
"""

from __future__ import annotations

import pytest

from bigdata_financial_reporting_spark.queries import QUERIES

from test_oracle import (
    _ORACLE_SMOKE,
    _ROWS_SMOKE,
    _tiered,
    ORACLE_SPECS,
    ROWS_ONLY_SPECS,
    assert_no_complex_output_types,
    canon_rows,
)

#: Hostile layout: 7 is odd and coprime to every input partition count
#: the fixtures produce; 64 KiB splits force multi-split scans of even
#: the sf0.01 files; the tiny advisory size changes AQE's coalesced
#: partitioning, hence shuffle merge order; the 128 KiB auto-broadcast
#: threshold flips every non-hinted join to sort-merge (explicit
#: F.broadcast hints still win), exercising the join-strategy variation
#: a driver environment with default thresholds would see.
PERTURB_CONF = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": "65536",
    "spark.sql.files.openCostInBytes": "16384",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    "spark.sql.autoBroadcastJoinThreshold": "131072",
}


@pytest.fixture(scope="module", autouse=True)
def perturbed_layout(spark):
    saved = {}
    for k in PERTURB_CONF:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    for k, v in PERTURB_CONF.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.mark.parametrize(
    "spec", _tiered(ORACLE_SPECS, _ORACLE_SMOKE), ids=lambda s: s.name
)
def test_oracle_match_under_perturbed_partitioning(spec, spark, ddb, sf_dir):
    sdf = spec.fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(spec.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert len(s_rows) == len(d_rows), (
        f"{spec.name}: row count under perturbed layout "
        f"spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    cs = canon_rows(sdf.columns, s_rows)
    cd = canon_rows(d_cols, d_rows)
    mism = [(a, b) for a, b in zip(cs, cd) if a != b]
    assert not mism, (
        f"{spec.name}: {len(mism)} rows differ from the oracle ONLY "
        f"under a perturbed partition layout — order-dependent "
        f"accumulation; first 3: {mism[:3]}"
    )


@pytest.mark.parametrize(
    "spec", _tiered(ROWS_ONLY_SPECS, _ROWS_SMOKE), ids=lambda s: s.name
)
def test_rows_only_runs_under_perturbed_partitioning(spec, spark, sf_dir):
    sdf = spec.fn(spark, sf_dir)
    assert_no_complex_output_types(sdf, spec.name)
    assert sdf.count() > 0, f"{spec.name}: empty under perturbed layout"


def test_every_registry_key_is_covered():
    assert len(ORACLE_SPECS) + len(ROWS_ONLY_SPECS) == len(QUERIES)
