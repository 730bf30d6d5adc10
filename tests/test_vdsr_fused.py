"""Golden tests: fused multi-layer VDSR kernel vs the flax apply.

Interpret mode on the CPU test mesh (conftest forces CPU; interpret=None
auto-selects off-TPU).  bf16=False must match the reference to f32
tolerance; bf16=True to bf16-operand tolerance.  Shapes cover non-divisible
heights/widths, multi-segment depths (>6 convs), and batch >1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_super_resolution_tpu.kernels.vdsr_fused import vdsr_fused_forward
from ml_super_resolution_tpu.models import build_model
from ml_super_resolution_tpu.utils.config import ModelConfig


def _make(depth, h, w, batch=1, seed=0):
    m = build_model(ModelConfig(name="vdsr", scale=2, channels=1,
                                overrides={"depth": depth}))
    x = jnp.asarray(
        np.random.default_rng(seed).random((batch, h, w, 1)), jnp.float32
    )
    v = m.init(jax.random.key(seed), x[:1], train=False)
    ref = np.asarray(m.apply(v, x, train=False))
    return v["params"], x, ref


@pytest.mark.parametrize(
    "depth,h,w",
    [
        (4, 24, 40, ),   # single segment (first+2 mid+last)
        (8, 24, 40),     # two segments (crosses the boundary glue)
        (14, 37, 51),    # three segments, non-divisible H and W
    ],
)
def test_vdsr_fused_matches_flax_f32(depth, h, w):
    params, x, ref = _make(depth, h, w)
    out = np.asarray(
        vdsr_fused_forward(params, x, bf16=False, tile_h=16)
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_vdsr_fused_depth20_batch2_bf16():
    params, x, ref = _make(20, 29, 45, batch=2, seed=3)
    exact = np.asarray(vdsr_fused_forward(params, x, bf16=False, tile_h=16))
    np.testing.assert_allclose(exact, ref, atol=5e-5)
    loose = np.asarray(vdsr_fused_forward(params, x, bf16=True, tile_h=16))
    assert float(np.abs(loose - ref).max()) < 5e-2


def test_vdsr_fused_group2_matches():
    params, x, ref = _make(8, 32, 33, seed=5)
    out = np.asarray(
        vdsr_fused_forward(params, x, bf16=False, tile_h=24, group=2)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_vdsr_fused_compact_group_loop_matches():
    """compact=True (fori_loop over groups, dynamic offsets) == unrolled."""
    params, x, ref = _make(8, 32, 40, seed=7)
    out = np.asarray(
        vdsr_fused_forward(params, x, bf16=False, tile_h=16, compact=True)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize(
    "depth,h,w,kw",
    [
        (8, 24, 200, dict(tile_h=16, wc=128)),           # 2 width chunks
        (14, 37, 300, dict(tile_h=16, wc=128)),          # 3 chunks, ragged W
        (20, 40, 300, dict(tile_h=32, wc=128, compact=True)),  # flagship shape
    ],
)
def test_vdsr_fused_width_chunked_matches(depth, h, w, kw):
    """Round-3 width chunking: wc-column chunks with 128-lane halos must be
    bitwise-equivalent in structure (and f32-equal in value) to whole-width;
    covers the chunk-major boundary glue and the segment-final roll."""
    params, x, ref = _make(depth, h, w)
    out = np.asarray(vdsr_fused_forward(params, x, bf16=False, **kw))
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_vdsr_fused_chunked_bf16_batch2():
    params, x, ref = _make(20, 29, 260, batch=2, seed=3)
    loose = np.asarray(
        vdsr_fused_forward(params, x, bf16=True, tile_h=16, wc=128)
    )
    assert float(np.abs(loose - ref).max()) < 5e-2
