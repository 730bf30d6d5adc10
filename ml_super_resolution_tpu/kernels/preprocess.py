"""K3: fused training-pair preprocess — RGB->Y + Matlab-bicubic degrade.

The reference's data path did this per step on the host with numpy/PIL
(BASELINE.json:5); the rebuild's default path is the XLA-fused on-device
pipeline in ``ops/patches.py``.  This kernel is the Pallas realization of
the same stage for the hot inner case (HR patches -> (LR, HR) luma pairs):
one VMEM-resident pass per patch — luma extraction on the VPU, then the
separable bicubic as two resize-matrix matmuls on the MXU — with a single
DMA in and two DMAs out.

Layout: host supplies planar ``(N, 3, P, Pp)`` (channel-major, width padded
to a lane multiple) so every DMA minor dim is 128-aligned; outputs are
``(N*P, Pp)`` HR luma and ``(N*P/s, Pp)`` LR luma, reshaped/cropped by the
wrapper.  Grid-free fori_loop structure (see kernels/__init__ notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ml_super_resolution_tpu.ops.color import _RGB2YCBCR, _YCBCR_OFFSET
from ml_super_resolution_tpu.ops.resize import resize_kernel_matrix

__all__ = ["preprocess_pairs", "preprocess_pairs_reference"]


def preprocess_pairs_reference(rgb_patches: jnp.ndarray, scale: int):
    """XLA reference semantics: (hr_y, lr_y) from (N, P, P, 3) RGB in [0,1]."""
    from ml_super_resolution_tpu.ops.color import rgb_to_y
    from ml_super_resolution_tpu.ops.resize import imresize

    hr = rgb_to_y(rgb_patches)
    lr = imresize(hr, scale=1.0 / scale)
    return hr, lr


def _kernel(xp_ref, mh_ref, mw_ref, hr_ref, lr_ref, xv, hv, lv, s_in, s_hr, s_lr,
            *, n, p, pp, lp):
    wy = [c / 255.0 for c in _RGB2YCBCR[0]]
    off = _YCBCR_OFFSET[0] / 255.0

    def step(i, _):
        cp = pltpu.make_async_copy(xp_ref.at[pl.ds(i * 3 * p, 3 * p)], xv, s_in)
        cp.start()
        cp.wait()
        # luma: BT.601 studio swing (VPU)
        y = (
            wy[0] * xv[0:p, :]
            + wy[1] * xv[p : 2 * p, :]
            + wy[2] * xv[2 * p : 3 * p, :]
            + off
        )
        hv[:, :] = y
        c1 = pltpu.make_async_copy(hv, hr_ref.at[pl.ds(i * p, p)], s_hr)
        c1.start()
        c1.wait()
        # separable Matlab bicubic: rows then cols on the MXU
        t = jnp.dot(mh_ref[:], y, preferred_element_type=jnp.float32)  # (lp, Pp)
        lv[:, :] = jnp.dot(t, mw_ref[:], preferred_element_type=jnp.float32)
        c2 = pltpu.make_async_copy(lv, lr_ref.at[pl.ds(i * lp, lp)], s_lr)
        c2.start()
        c2.wait()
        return 0

    jax.lax.fori_loop(0, n, step, 0)


def preprocess_pairs(
    rgb_patches: jnp.ndarray, scale: int, interpret: bool | None = None
):
    """Fused (N, P, P, 3) RGB [0,1] -> ``(hr_y (N,P,P,1), lr_y (N,P/s,P/s,1))``.

    Matches :func:`preprocess_pairs_reference` (same resize matrices, same
    BT.601 constants).  P must divide by ``scale``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, p, p2, c = rgb_patches.shape
    assert p == p2 and c == 3 and p % scale == 0
    lp = p // scale
    pp = -(-p // 128) * 128

    # planar channel-major, width padded to lanes
    xp = jnp.transpose(rgb_patches, (0, 3, 1, 2))  # (N, 3, P, P)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, pp - p)))
    xp = xp.reshape(n * 3 * p, pp).astype(jnp.float32)

    mh_full = jnp.asarray(resize_kernel_matrix(p, lp), jnp.float32)  # (lp, P)
    # column matrix acts on lanes: (Pp, Pp) with zero padding rows/cols so
    # lane-padding columns contribute/receive nothing
    mw_core = np.zeros((pp, pp), np.float32)
    mw_core[:p, :lp] = np.asarray(resize_kernel_matrix(p, lp), np.float32).T
    mw = jnp.asarray(mw_core)

    kernel = functools.partial(_kernel, n=n, p=p, pp=pp, lp=lp)
    hr_flat, lr_flat = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n * p, pp), jnp.float32),
            jax.ShapeDtypeStruct((n * lp, pp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3 * p, pp), jnp.float32),
            pltpu.VMEM((p, pp), jnp.float32),
            pltpu.VMEM((lp, pp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, mh_full, mw)

    hr = hr_flat.reshape(n, p, pp)[:, :, :p, None]
    lr = lr_flat.reshape(n, lp, pp)[:, :, :lp, None]
    return hr, lr
