"""ANN recall on clustered embeddings (VERDICT r3 item 5).

The driver's near-uniform synthetic vectors are the worst case for
coarse quantization — every cell boundary cuts through probe
neighborhoods.  Real embedding corpora cluster; this fixture
(deterministic mixture-of-Gaussians, tools/gen_scaledata.py) shows the
IVF/SRP structure actually separating, and pins the multi-probe >
single-probe ordering on BOTH distributions.
"""

from __future__ import annotations

import pytest

from experts_etl_spark.plans.registry import QUERIES
from tools.gen_scaledata import generate


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("ann_fixtures")
    dirs = {}
    for mode in ("uniform", "clustered"):
        d = str(root / mode)
        generate(d, docs=50, vecs=1200, seed=42, mode=mode)
        dirs[mode] = d
    return dirs


def _recalls(spark, d):
    return {r["method"]: r["recall"] for r in QUERIES["ann_recall"](spark, d).collect()}


def test_clustered_embeddings_separate(spark, fixture_dirs):
    uni = _recalls(spark, fixture_dirs["uniform"])
    clu = _recalls(spark, fixture_dirs["clustered"])
    # clustered data: the index structure works — high absolute recall
    assert clu["ivf_nprobe4"] >= 0.85, clu
    assert clu["srp_multiprobe"] >= 0.85, clu
    # and each method separates clustered >> uniform
    for m in ("srp_bucketed", "srp_multiprobe", "ivf_nprobe2", "ivf_nprobe4"):
        assert clu[m] > uni[m], (m, clu[m], uni[m])


def test_multiprobe_dominates_single_probe(spark, fixture_dirs):
    """Hamming-1 multi-probe can only ADD candidate buckets: recall is
    monotonically ≥ single-probe on any distribution."""
    for d in fixture_dirs.values():
        r = _recalls(spark, d)
        assert r["srp_multiprobe"] >= r["srp_bucketed"], r
