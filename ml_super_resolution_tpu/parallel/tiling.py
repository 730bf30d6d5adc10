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

__all__ = ["tiled_apply", "tiled_apply_2d", "tiled_upscale"]


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


def _extend_axis(x: jnp.ndarray, axis_name: str, r: int, dim: int):
    """Build this shard's asymmetric contiguous window along ``dim``.

    Same 3-case construction as :func:`_band_fn` (see module docstring),
    generalized to either spatial dim.  Returns the (B + 2r)-wide window and
    the post-``fn`` crop offset multiplier (0 / r / 2r, traced).
    """
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    take_lead = lambda a, k: jax.lax.slice_in_dim(a, 0, k, axis=dim)  # noqa: E731
    take_tail = lambda a, k: jax.lax.slice_in_dim(  # noqa: E731
        a, a.shape[dim] - k, a.shape[dim], axis=dim
    )
    from_prev = jax.lax.ppermute(
        take_tail(x, 2 * r), axis_name, [(j, j + 1) for j in range(n - 1)]
    )
    from_next = jax.lax.ppermute(
        take_lead(x, 2 * r), axis_name, [(j + 1, j) for j in range(n - 1)]
    )
    first = jnp.concatenate([x, from_next], axis=dim)
    mid = jnp.concatenate(
        [take_tail(from_prev, r), x, take_lead(from_next, r)], axis=dim
    )
    last = jnp.concatenate([from_prev, x], axis=dim)
    window = jnp.where(i == 0, first, jnp.where(i == n - 1, last, mid))
    offset = r * ((i > 0).astype(jnp.int32) + (i == n - 1).astype(jnp.int32))
    return window, offset


def tiled_apply_2d(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    frames: jnp.ndarray,
    mesh: Mesh,
    halo: int,
    scale: int,
    axes: tuple[str, str] = ("space", "space_w"),
) -> jnp.ndarray:
    """2D (rows x cols) tiled apply with halo exchange on both axes.

    Column halos are exchanged first, then row halos of the col-extended
    block — corner halos arrive transitively.  Bitwise-equal to whole-frame
    for SAME-padded ``fn`` (tested), with the same asymmetric boundary
    windows as the 1D path.  Requires each block dim >= 2*halo.
    """
    ah, aw = axes
    nh, nw = mesh.shape[ah], mesh.shape[aw]
    if frames.shape[1] % nh or frames.shape[2] % nw:
        raise ValueError(
            f"frame {frames.shape[1:3]} not divisible by mesh ({nh}, {nw})"
        )
    if (nh > 1 and frames.shape[1] // nh < 2 * halo) or (
        nw > 1 and frames.shape[2] // nw < 2 * halo
    ):
        raise ValueError(f"block smaller than 2*halo ({2 * halo})")

    def body(x):
        off_h = off_w = jnp.zeros((), jnp.int32)
        if nw > 1 and halo > 0:
            x, off_w = _extend_axis(x, aw, halo, dim=2)
        if nh > 1 and halo > 0:
            x, off_h = _extend_axis(x, ah, halo, dim=1)
        y = fn(x)
        bh = (frames.shape[1] // nh) * scale
        bw = (frames.shape[2] // nw) * scale
        y = jax.lax.dynamic_slice_in_dim(y, off_h * scale, bh, axis=1)
        return jax.lax.dynamic_slice_in_dim(y, off_w * scale, bw, axis=2)

    shard = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(None, ah, aw, None),
        out_specs=P(None, ah, aw, None),
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
