"""Spatial tiling + halo exchange for full-frame inference (P2, SURVEY §5.7).

The reference upscaled full frames sequentially on one device (SURVEY §3.3);
here a frame's rows are sharded into bands across the ``space`` mesh axis and
each device exchanges a receptive-field halo with its neighbors via
``ppermute`` over ICI before running the conv stack — the ring pattern of
context parallelism applied to the image height dimension.

Bit-exactness argument (tested in tests/test_tiling.py): a kept output row is
identical to the whole-frame result iff (a) it is ≥ R real input rows away
from any *fake* band edge (R = composed receptive-field radius — garbage from
SAME padding at a fake edge cannot reach it), and (b) every *real* frame edge
within R of it coincides with the band's own array edge, so SAME padding
applies exactly as in the whole-frame pass.  A naive symmetric halo fails (b)
at the global top/bottom: zero halo rows are not SAME padding once the first
conv layer has turned them into nonzero bias/activation rows.  So bands are
asymmetric contiguous windows of the frame (uniform length B + 2R):

    device 0:      rows [0,        B + 2R)   keep output rows [0,   B)
    interior i:    rows [iB - R,  iB+B + R)  keep            [R,  R+B)
    device n-1:    rows [H - B - 2R,    H)   keep            [2R, 2R+B)

Each device ``ppermute``s its block-edge 2R rows to both neighbors over ICI;
branch-free selects assemble the right window per device.  Requires
``B >= 2R`` (checked).

Halo widths come from the model registry (``MODEL_SPECS[name]['rf_radius']``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tiled_apply", "tiled_upscale"]


def _band_fn(
    x: jnp.ndarray,
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    halo: int,
    scale: int,
    axis: str,
):
    """Per-shard body: exchange 2R block-edge rows, assemble this device's
    asymmetric band, run fn, crop the kept rows (see module docstring)."""
    n = jax.lax.axis_size(axis)
    if n == 1 or halo == 0:
        return fn(x)
    r = halo
    b = x.shape[1]
    i = jax.lax.axis_index(axis)
    # from_above = last 2R rows of block i-1; from_below = first 2R of i+1.
    from_above = jax.lax.ppermute(
        x[:, -2 * r :], axis, [(j, j + 1) for j in range(n - 1)]
    )
    from_below = jax.lax.ppermute(
        x[:, : 2 * r], axis, [(j + 1, j) for j in range(n - 1)]
    )
    band_first = jnp.concatenate([x, from_below], axis=1)
    band_mid = jnp.concatenate([from_above[:, r:], x, from_below[:, :r]], axis=1)
    band_last = jnp.concatenate([from_above, x], axis=1)
    band = jnp.where(
        i == 0, band_first, jnp.where(i == n - 1, band_last, band_mid)
    )
    y = fn(band)  # (b + 2r) * scale rows
    # kept-region start: first 0, interior r*scale, last 2r*scale
    offset = r * scale * ((i > 0).astype(jnp.int32) + (i == n - 1).astype(jnp.int32))
    return jax.lax.dynamic_slice_in_dim(y, offset, b * scale, axis=1)


def tiled_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    frames: jnp.ndarray,
    mesh: Mesh,
    halo: int,
    scale: int,
    axis: str = "space",
) -> jnp.ndarray:
    """Apply an image-to-image ``fn`` over row-band shards of ``frames``.

    ``frames``: (N, H, W, C); H must divide by the ``axis`` mesh size.
    ``fn`` maps (n, h, w, c) -> (n, h*scale, w*scale, c') and must be built
    from SAME-padded ops (true for every model in the zoo).
    ``halo``: receptive-field radius of ``fn`` in *input* rows.
    """
    nsp = mesh.shape[axis]
    if frames.shape[1] % nsp:
        raise ValueError(
            f"frame height {frames.shape[1]} not divisible by mesh '{axis}'={nsp}"
        )
    band = frames.shape[1] // nsp
    if nsp > 1 and band < 2 * halo:
        raise ValueError(
            f"band height {band} < 2*halo ({2 * halo}): use fewer '{axis}' shards "
            f"or taller frames"
        )
    body = partial(_band_fn, fn=fn, halo=halo, scale=scale, axis=axis)
    shard = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(None, axis, None, None),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    return shard(frames)


def tiled_upscale(
    model_apply: Callable[[jnp.ndarray], jnp.ndarray],
    frames: jnp.ndarray,
    mesh: Mesh,
    halo: int,
    scale: int,
    axis: str = "space",
) -> jnp.ndarray:
    """Jitted sharded full-frame upscale; output gathered to all devices.

    One XLA program: shard rows -> ppermute halos -> conv stack -> crop ->
    all-gather (implicit from the output sharding).  No host involvement
    until the caller pulls the result (SURVEY §3.5).
    """

    @partial(jax.jit, static_argnums=())
    def run(x):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(None, axis, None, None))
        )
        return tiled_apply(model_apply, x, mesh, halo, scale, axis)

    return run(frames)
