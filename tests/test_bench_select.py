"""bench.py flagship-artifact selection — the self-proving-record contract.

BENCH_r03/r04 were both invalid because artifact selection keyed on recency
(mtime) + a spec field ResNet specs never carry: round 4 benched a ResNeXt
A/B byproduct under the "int8_pruned_resnet18" label (VERDICT r4 item 1).
These tests pin the structural rule: identity (pruned resnet18, 6 classes,
provenance model_type=pruned) decides; mtime can only break ties.
"""

import json
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

PRUNED = {"name": "resnet18", "stage_widths": [56, 112, 224, 456], "num_classes": 6}
UNPRUNED = {"name": "resnet18", "stage_widths": [64, 128, 256, 512], "num_classes": 12}
RESNEXT = {"name": "resnext26_32x4d", "stage_widths": [224, 456, 912, 1824],
           "num_classes": 6}


def _mk(root, exp, fold, spec, prov=None, mtime=None):
    d = os.path.join(root, "quantization", exp, f"fold_{fold}")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "model_static_int8.msgpack")
    with open(p, "wb") as f:
        f.write(b"x")
    with open(os.path.join(d, "spec.json"), "w") as f:
        json.dump(spec, f)
    if prov is not None:
        with open(os.path.join(d, "provenance.json"), "w") as f:
            json.dump(prov, f)
    if mtime is not None:
        os.utime(p, (mtime, mtime))
    return d


@pytest.fixture
def tree(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("BENCH_EXP", raising=False)
    return str(tmp_path)


def test_no_artifacts_returns_none(tree):
    assert bench._find_artifact() == (None, None, None)


def test_byproducts_never_match(tree):
    """Unpruned A/B byproducts and other families can't claim the headline."""
    _mk("output", "h1r_qat", 0, UNPRUNED)   # full-width 12-class A/B run
    _mk("output", "rx1", 0, RESNEXT)        # the exact r4 failure artifact
    assert bench._find_artifact() == (None, None, None)


def test_identity_beats_recency(tree):
    """A newer byproduct cannot shadow the older flagship artifact."""
    now = time.time()
    good = _mk(os.path.join("artifacts", "bench"), "r2", 0, PRUNED,
               prov={"model_type": "pruned"}, mtime=now - 10_000)
    _mk("output", "rx1", 0, RESNEXT, mtime=now)
    _mk("output", "h1r_ada", 0, UNPRUNED, mtime=now)
    d, spec, prov = bench._find_artifact()
    assert d == good
    assert spec["name"] == "resnet18"
    assert prov["model_type"] == "pruned"


def test_provenance_model_type_gates(tree):
    """A pruned-width spec whose provenance says it is NOT a pruned-protocol
    model (e.g. a hand-copied experiment) is rejected."""
    _mk("output", "weird", 0, PRUNED, prov={"model_type": "student"})
    assert bench._find_artifact() == (None, None, None)


def test_bench_exp_preference(tree, monkeypatch):
    now = time.time()
    _mk("output", "other", 0, PRUNED, prov={"model_type": "pruned"}, mtime=now)
    want = _mk("output", "r2", 0, PRUNED, prov={"model_type": "pruned"},
               mtime=now - 10_000)
    d, _, _ = bench._find_artifact()
    assert d == want  # default BENCH_EXP=r2 wins over newer non-protocol exp
    monkeypatch.setenv("BENCH_EXP", "other")
    d, _, _ = bench._find_artifact()
    assert d == os.path.join("output", "quantization", "other", "fold_0")


def test_fresh_output_run_beats_committed_fallback(tree):
    now = time.time()
    _mk(os.path.join("artifacts", "bench"), "r2", 0, PRUNED,
        prov={"model_type": "pruned"}, mtime=now)  # checkout-time mtime
    fresh = _mk("output", "r2", 0, PRUNED, prov={"model_type": "pruned"},
                mtime=now - 5_000)
    d, _, _ = bench._find_artifact()
    assert d == fresh


def test_legacy_artifact_without_provenance_still_matches(tree):
    """Pre-round-5 artifacts carry no provenance.json; spec identity alone
    qualifies them (but provenance-tagged ones are preferred)."""
    now = time.time()
    legacy = _mk("output", "r2", 0, PRUNED, mtime=now)
    d, _, prov = bench._find_artifact()
    assert d == legacy and prov is None
    tagged = _mk("output", "r2", 1, PRUNED, prov={"model_type": "pruned"},
                 mtime=now - 10_000)
    d, _, prov = bench._find_artifact()
    assert d == tagged and prov is not None


def test_repo_committed_artifact_is_selected():
    """On the real tree the committed flagship must be found (guards against
    a refactor orphaning artifacts/bench/)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cwd = os.getcwd()
    os.chdir(repo)
    try:
        d, spec, prov = bench._find_artifact()
    finally:
        os.chdir(cwd)
    assert d is not None
    assert spec["name"] == "resnet18"
    assert [int(w) for w in spec["stage_widths"]] != bench.UNPRUNED_WIDTHS
    assert int(spec["num_classes"]) == 6
    assert prov is None or prov.get("model_type") == "pruned"
