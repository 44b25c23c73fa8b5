"""MSM tuning table: record/lookup semantics (reference decision-tree
analog, cpu_msm.hpp:199-224)."""

import os

import pytest

from icicle_tpu.ops import msm_tuning


@pytest.fixture
def table(tmp_path, monkeypatch):
    path = str(tmp_path / "tuning.json")
    monkeypatch.setenv(msm_tuning._ENV_PATH, path)
    msm_tuning.reload()
    yield path
    monkeypatch.delenv(msm_tuning._ENV_PATH)
    msm_tuning.reload()


def test_empty_table_returns_none(table):
    assert msm_tuning.tuned_params("v3:u32", "bn254", 1 << 20) is None


def test_record_and_exact_lookup(table):
    msm_tuning.record("v3:u32", "bn254", 20, {"c": 14, "T": 4096}, 1e6)
    tp = msm_tuning.tuned_params("v3:u32", "bn254", 1 << 20)
    assert tp == {"c": 14, "T": 4096}
    # wrong pipeline/curve/nu -> miss
    assert msm_tuning.tuned_params("v2", "bn254", 1 << 20) is None
    assert msm_tuning.tuned_params("v3:u32", "bls12_381", 1 << 20) is None
    assert msm_tuning.tuned_params("v3:u32", "bn254", 1 << 20, 4) is None


def test_nearest_logn_snap_within_2(table):
    msm_tuning.record("v3:u32", "bn254", 20, {"c": 14}, 1e6)
    assert msm_tuning.tuned_params("v3:u32", "bn254", 1 << 22) == {"c": 14}
    assert msm_tuning.tuned_params("v3:u32", "bn254", 1 << 18) == {"c": 14}
    assert msm_tuning.tuned_params("v3:u32", "bn254", 1 << 23) is None
    # a closer measurement wins over a farther one
    msm_tuning.record("v3:u32", "bn254", 22, {"c": 16}, 5e5)
    assert msm_tuning.tuned_params("v3:u32", "bn254", 1 << 22) == {"c": 16}


def test_record_keeps_fastest(table):
    msm_tuning.record("v3:u32", "bn254", 20, {"c": 14}, 1e6)
    msm_tuning.record("v3:u32", "bn254", 20, {"c": 12}, 5e5)  # slower: kept out
    assert msm_tuning.tuned_params("v3:u32", "bn254", 1 << 20) == {"c": 14}
    msm_tuning.record("v3:u32", "bn254", 20, {"c": 15}, 2e6)  # faster: replaces
    assert msm_tuning.tuned_params("v3:u32", "bn254", 1 << 20) == {"c": 15}
    # file round-trips
    msm_tuning.reload()
    assert msm_tuning.tuned_params("v3:u32", "bn254", 1 << 20) == {"c": 15}


def test_packaged_default_table_loads():
    # the shipped table must parse even if empty
    msm_tuning.reload()
    assert msm_tuning.tuned_params("nope", "bn254", 4) is None
