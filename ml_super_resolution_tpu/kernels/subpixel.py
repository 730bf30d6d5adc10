"""K1: fused sub-pixel head — 3x3 conv to r^2*C channels + in-kernel
depth-to-space rows, one VMEM-resident pass (SURVEY §2b K1, §7 hard part #4).

Why fuse: the sub-pixel head's conv output (``r^2*C`` channels at LR
resolution) is exactly the data volume of the final HR image; materializing
it in HBM and re-reading it for the shuffle doubles the head's HBM traffic.
Here the conv runs as per-output-row MXU matmuls with a tap-concatenated
K dim (``9*Cin``) and the sub-pixel row interleave happens in the epilogue
before the single HBM write; the final lane interleave is one XLA transpose
in the wrapper.

Structure follows the constraints probed on the v5e attach path (see
``espcn_fused.py`` and the kernels/__init__ notes): grid-free fori_loop with
manual sublane-aligned DMA, W-on-lanes layout at full 128-multiple widths,
dx taps realigned with ``pltpu.roll``, no lane-dim reshapes, no 3D
dot_general.  Being a single conv layer, zero padding in the slab IS exact
SAME padding — no inter-layer masking needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ml_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

__all__ = ["conv_pixel_shuffle", "conv_pixel_shuffle_reference"]


def conv_pixel_shuffle_reference(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, r: int
) -> jnp.ndarray:
    """XLA reference: SAME 3x3 conv + pixel shuffle (the golden semantics)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
    return pixel_shuffle(y + b, r)


def _pick_tile(h: int) -> int:
    for th in (32, 24, 16, 8):
        if th <= h or h % th == 0:
            return th
    return 8


def _kernel(xp_ref, w_ref, b_ref, out_ref, xv, ov, sin, sout,
            *, n, nb, th, width, wp, cin, r2c):
    def step(k, _):
        ni = k // nb
        hi = k % nb
        # slab: (th+2) rows x cin channel-planes, flattened on dim 0
        src = (ni * (nb * th + 2) + hi * th) * cin
        cp = pltpu.make_async_copy(xp_ref.at[pl.ds(src, (th + 2) * cin)], xv, sin)
        cp.start()
        cp.wait()

        xv_all = xv[:, :]
        # dx-rolled variants per row-plane, shared by consumer rows
        variants = [
            [
                (
                    xv_all[h_ * cin : (h_ + 1) * cin, :]
                    if dx == 0
                    else pltpu.roll(
                        xv_all[h_ * cin : (h_ + 1) * cin, :], wp - dx, axis=1
                    )
                )
                for dx in range(3)
            ]
            for h_ in range(th + 2)
        ]
        planes = []
        for h_ in range(th):
            panel = jnp.concatenate(
                [variants[h_ + dy][dx] for dy in range(3) for dx in range(3)],
                axis=0,
            )  # (9*cin, wp)
            row = jnp.dot(w_ref[:], panel, preferred_element_type=jnp.float32)
            planes.append(row + b_ref[:])  # (r2c, wp)
        # channel-planar rows per block: (r2c * th, wp), plane-major
        acc = jnp.stack(planes, axis=1)  # (r2c, th, wp)
        ov[:, :] = jnp.concatenate([acc[c] for c in range(r2c)], axis=0)
        dst = (ni * nb + hi) * r2c * th
        cpo = pltpu.make_async_copy(ov, out_ref.at[pl.ds(dst, r2c * th)], sout)
        cpo.start()
        cpo.wait()
        return 0

    jax.lax.fori_loop(0, n * nb, step, 0)


def conv_pixel_shuffle(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    r: int,
    tile_h: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused SAME 3x3 conv (Cin -> r^2*C) + depth-to-space.

    x: (N, H, W, Cin); w: (3, 3, Cin, r^2*C); b: (r^2*C,).
    Returns (N, rH, rW, C).  ``interpret=None`` auto-selects off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _conv_pixel_shuffle(x, w, b, r, interpret)


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def _conv_pixel_shuffle(x, w, b, r, interpret):
    n, h, width, cin = x.shape
    r2c = w.shape[-1]
    cout = r2c // (r * r)
    # channel planes must be sublane(8)-aligned for the DMA offsets
    cpad = -(-cin // 8) * 8
    th = _pick_tile(h)
    hp = -(-h // th) * th
    nb = hp // th
    wp = -(-(width + 2) // 128) * 128

    # planar (N, hp+2, Cin, Wp): row halo +-1, col offset 1 (left halo)
    xq = jnp.transpose(x, (0, 1, 3, 2))  # (N, H, Cin, W)
    xp = jnp.zeros((n, hp + 2, cpad, wp), jnp.float32)
    xp = xp.at[:, 1 : 1 + h, :cin, 1 : 1 + width].set(xq.astype(jnp.float32))
    xp = xp.reshape(n * (hp + 2) * cpad, wp)

    # (r2c, 9*cpad), columns (dy, dx) outer, channel inner
    wm = jnp.pad(w, ((0, 0), (0, 0), (0, cpad - cin), (0, 0)))
    wm = jnp.transpose(wm, (3, 0, 1, 2)).reshape(r2c, 9 * cpad).astype(jnp.float32)

    kernel = functools.partial(
        _kernel, n=n, nb=nb, th=th, width=width, wp=wp, cin=cpad, r2c=r2c
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n * hp * r2c, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((th + 2) * cpad, wp), jnp.float32),
            pltpu.VMEM((r2c * th, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, wm, b.reshape(r2c, 1).astype(jnp.float32))

    # untangle channel-planar rows: (n, nb, (i,j,c), th, wp) -> NHWC
    # kernel out col j == conv output col j (the +-1 dx taps read the
    # 1-col-left-padded slab at j, j+1, j+2)
    out = out.reshape(n, nb, r, r, cout, th, wp)[..., :width]
    out = jnp.transpose(out, (0, 1, 5, 2, 6, 3, 4))  # (n, nb, th, i, W, j, c)
    out = out.reshape(n, hp * r, width * r, cout)
    return out[:, : h * r].astype(x.dtype)
