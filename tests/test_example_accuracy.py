"""Pinned accuracy regression through the FULL example path.

The reference's flagship example prints valid/test accuracy per run
(reference: python/pylibwholegraph/examples/node_classfication.py:39-60);
BASELINE.md's north star is matching its accuracy on OGB node
classification.  This environment has no network egress, so no OGB data is
obtainable (recorded in BASELINE.md) — instead this test pins accuracy on
the deterministic synthetic community graph through the COMPLETE example
pipeline: multilayer sampling -> distributed gather over the 8-device mesh
-> SAGE training -> EXACT full-graph evaluation.  Measured 91.5% at these
settings; the 80% floor leaves margin for cross-platform fp reassociation
while still catching any real regression (an untrained model scores 12.5%,
block/approximation bugs land far below the floor).
"""

import os
import re
import subprocess
import sys

import pytest

_EXAMPLE = os.path.join(
    os.path.dirname(__file__), "..", "examples", "node_classification.py"
)


def _run_example(extra_args, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    proc = subprocess.run(
        [sys.executable, _EXAMPLE, *extra_args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc.stdout


def _test_accuracy(stdout: str) -> float:
    m = re.search(r"\[TEST\] loss [\d.]+ accuracy ([\d.]+)%", stdout)
    assert m, f"no [TEST] line in output:\n{stdout}"
    return float(m.group(1))


@pytest.mark.slow
def test_smoke_example_accuracy_pinned():
    out = _run_example(
        ["--smoke", "--epochs", "10", "--full-graph-eval", "--seed", "0"]
    )
    acc = _test_accuracy(out)
    assert acc >= 80.0, f"test accuracy regressed: {acc}% (pinned floor 80%)\n{out}"
    # the per-epoch contract lines the reference also prints must be present
    assert "[EPOCH_TIME]" in out and "[TRAIN_TIME]" in out


@pytest.mark.slow
def test_smoke_example_trainable_embedding_accuracy():
    """Same pipeline with --train-embedding: the sparse-optimizer exchange
    path (dedup -> exact a2a -> masked apply) must also learn."""
    out = _run_example(
        ["--smoke", "--epochs", "10", "--train-embedding", "--seed", "0"]
    )
    acc = _test_accuracy(out)
    assert acc >= 75.0, f"trainable-embedding accuracy regressed: {acc}%\n{out}"


@pytest.mark.slow
def test_link_prediction_example_accuracy_pinned():
    """RGCN link prediction (encoder sample->gather->RGCN, DistMult
    decoder, negative sampling): pairwise-rank accuracy through the full
    example must clear 75% (measured 88.6%; random is 50%)."""
    example = os.path.join(
        os.path.dirname(__file__), "..", "examples", "link_prediction.py"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    proc = subprocess.run(
        [sys.executable, example, "--epochs", "2", "--seed", "0"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    m = re.search(r"\[TEST\] pairwise-rank acc ([\d.]+)%", proc.stdout)
    assert m, proc.stdout
    acc = float(m.group(1))
    assert acc >= 75.0, f"link-prediction accuracy regressed: {acc}%\n{proc.stdout}"


_HETERO_EXAMPLE = os.path.join(
    os.path.dirname(__file__), "..", "examples", "hetero_node_classification.py"
)


@pytest.mark.slow
def test_hetero_example_accuracy_pinned():
    """Typed-node + typed-edge pipeline (HeteroFeatureStore -> unified-id
    relation-typed sampling -> TypedProjection + R-GCN): pinned at >=75%
    (measured 86.2% at these settings; random is 12.5%)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    proc = subprocess.run(
        [sys.executable, _HETERO_EXAMPLE, "--smoke", "--epochs", "40",
         "--seed", "0"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    acc = _test_accuracy(proc.stdout)
    assert acc >= 75.0, f"hetero accuracy regressed: {acc}%\n{proc.stdout}"
    assert "[EPOCH_TIME]" in proc.stdout and "relations" in proc.stdout


@pytest.mark.slow
def test_gat_example_accuracy_pinned():
    """GAT sampled training through the full example (SDDMM attention +
    padded softmax + SpMM): pinned >=75% (measured 85.75%; random 12.5%)."""
    out = _run_example(
        ["--smoke", "--epochs", "15", "--model", "gat", "--seed", "0"],
        timeout=600,
    )
    acc = _test_accuracy(out)
    assert acc >= 75.0, f"GAT accuracy regressed: {acc}%\n{out}"


@pytest.mark.slow
def test_rgcn_example_accuracy_pinned():
    """R-GCN sampled training through the full example (per-relation
    weights + per-relation degree means over typed sampled hops): pinned
    >=75% (measured 84.25%; random 12.5%).  The homogeneous synthetic
    dataset gets deterministic pseudo-relations — the relation machinery
    must not hurt learnability."""
    out = _run_example(
        ["--smoke", "--epochs", "15", "--model", "rgcn", "--seed", "0"],
        timeout=600,
    )
    acc = _test_accuracy(out)
    assert acc >= 75.0, f"RGCN accuracy regressed: {acc}%\n{out}"
