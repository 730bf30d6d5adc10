"""Golden tests for the v2 fused ESPCN kernel (kernels/attic/espcn_fused2.py — retired, see attic/__init__.py).

Interpreter mode on CPU = exact f32 math; on-device numbers in RESULTS.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_super_resolution_tpu.kernels.attic.espcn_fused2 import (
    espcn_fused2_forward,
    extract_espcn_weights,
)
from ml_super_resolution_tpu.models import build_model
from ml_super_resolution_tpu.utils.config import ModelConfig


def _setup(h, w, r, n=1, seed=0):
    m = build_model(ModelConfig(name="espcn", scale=r, channels=1))
    x = jnp.asarray(
        np.random.default_rng(seed).random((n, h, w, 1)), jnp.float32
    )
    v = m.init(jax.random.key(seed), x[:1], train=False)
    ref = m.apply(v, x, train=False)
    return extract_espcn_weights(v["params"]), x, ref


@pytest.mark.parametrize(
    "h,w,r,n",
    [
        (40, 56, 4, 2),   # multi-block, multi-frame
        (27, 33, 3, 1),   # odd dims, height not divisible by the tile
        (12, 20, 2, 1),   # smaller than one 32-row tile
    ],
)
def test_fused2_matches_flax_f32(h, w, r, n):
    wts, x, ref = _setup(h, w, r, n)
    out = espcn_fused2_forward(wts, x, r, interpret=True, bf16=False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)


def test_fused2_bf16_operand_error_bounded():
    wts, x, ref = _setup(40, 56, 4, n=2)
    out = espcn_fused2_forward(wts, x, 4, interpret=True, bf16=True)
    err = float(jnp.abs(out - ref).max())
    assert err < 3e-2  # bf16 operand rounding, f32 accumulation
    # and on a [0,1]-image scale that is < 1 uint8 quantization step * 8
    assert err * 255 < 8
