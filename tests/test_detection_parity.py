"""Detection-math parity vs the reference's own torch code, in the fast lane.

Runs the checks from ``tools/detection_parity.py``: the reference's
``fcaf3d_head.py`` is imported with the mm registries and MinkowskiEngine
stubbed, and its ``_bbox_pred_to_bbox`` (ref :300-349), ``compute_centerness``
(:395-402), ``FCAF3DAssigner.assign`` (:405-484) and ``_loss_single``
(:141-214) are compared against our JAX counterparts on random inputs.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import detection_parity as dp  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(dp.REF), reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_head():
    return dp.load_reference_head()


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_decode_parity(ref_head, rng):
    worst = dp.check_decode(ref_head, rng)
    for yp, v in worst.items():
        assert v <= dp.TOL, (yp, v)


def test_centerness_parity(ref_head, rng):
    assert dp.check_centerness(ref_head, rng) <= dp.TOL


@pytest.mark.parametrize("with_yaw,pad", [(False, False), (False, True),
                                          (True, False)])
def test_assigner_parity(ref_head, rng, with_yaw, pad):
    r = dp.check_assigner(ref_head, rng, with_yaw, pad=pad)
    assert r["n_pos"] > 20          # the case must actually exercise topk
    assert r["labels_mismatch"] == 0
    assert r["centerness"] <= dp.TOL
    assert r["bbox_targets"] <= dp.TOL


def test_loss_scalars_parity(ref_head, rng):
    r = dp.check_loss(ref_head, rng)
    for k in ("loss_centerness", "loss_bbox", "loss_cls"):
        assert r[k] <= 2e-4, (k, r[k], r["_ref"])
