"""Fused multi-layer VDSR: width-chunked segment kernels, bf16 MXU.

VDSR (models/vdsr.py; arXiv:1511.04587) is a 20-deep chain of 3x3 convs at
HR resolution — the heaviest per-pixel model in the zoo (~1.33 MFLOP/px).
Run layer-by-layer, every intermediate activation (H x W x 64) makes an HBM
round trip: ~0.5 GB per layer boundary at 1080p, ~10 GB per frame — the
XLA path is HBM-bound long before the MXU saturates.  This kernel fuses
*runs of layers* so activations stay VMEM-resident across layer boundaries:

* **Segments**: the depth-D conv chain is split into segments of <=max_seg
  convs.  Each segment is one grid-free ``pallas_call`` sweeping the frame
  in (row-block x width-chunk) tiles; only segment boundaries touch HBM.
* **Width chunks** (round 3): blocks cover ``wc`` output columns and read a
  ``wc + 256``-lane slab (128-col halo each side).  This is the lever that
  unlocks big row tiles: the remote tpu_compile_helper crashes on row-spans
  >=24 at 2048 lanes but accepts span-40 at 1280 lanes (probe
  ``vdsrchunk``), and the 16 MB scoped-VMEM cap is per-lane-width.  At
  tile_h=32/wc=1024 the halo-recompute multiplier drops from round-2's 4x
  (tile_h=8, full width) to ~2.1x.
* **Row blocks with halo recompute**: a block of ``tile_h`` output rows
  reads ``tile_h + 2*S`` input rows (S = convs in the segment) and computes
  the full span at every layer; garbage creeps inward one row per layer and
  is exactly absorbed by the halo.  Row/col masks re-zero out-of-image
  positions after every conv, which reproduces SAME zero-padding at frame
  edges and keeps lane-roll wraparound garbage confined to the chunk
  margins (>= 128 cols >> S creep).
* **Row-group matmuls** (espcn_fused2 pattern): G output rows x 64 channels
  form one MXU matmul of M = G*64 against a K = (G+2)*64 sublane-aligned
  window of the activation buffer; per dx tap the f32 product is lane-rolled
  into alignment (``out[j] = sum_d mm_d[j+d]``).  K carries (G+2)/3 x the
  taps actually used — the zero-weight MACs are the price of full-occupancy
  MXU shapes and no per-row VPU work.
* **Chunk-major HBM layouts**: every kernel input/output is chunk-major
  ((N, C, rows, ...) flattened 2D) so ALL DMAs slice rows only — no 2D DMA,
  every offset a provable multiple of 8 sublanes.  Overlapped input chunks
  and guard rows/cols are materialized by cheap XLA passes between
  segments; the coordinate shift of S columns per segment is undone by one
  lane-roll of each segment-final conv output, which simultaneously lands
  the write window at lane offset 0 (alignment by construction).
* **bf16 operands**: activations are stored bf16 (cast once per layer after
  the mask), weights pre-cast; accumulation is f32 via
  ``preferred_element_type``.  All lane rolls happen on f32 matmul outputs
  (Mosaic on this path lacks bf16 sublane rolls; lane rolls of f32 are the
  measured-safe pattern).

Golden-tested against the flax ``VDSR.apply`` in tests/test_vdsr_fused.py
(interpret mode on CPU, exact to ~1e-5 with ``bf16=False``, incl. chunked
configs); opt-in under ``sr upscale --pallas`` via SR_VDSR_FUSED=1
(kernels/apply.py).

Round-2 on-device baseline (v5e attach path): tile_h=8 full-width compiles
in ~45 s, parity 6e-2 bf16, 36.8 MP/s @1080p x4 — exactly its issued-FLOP
roofline (4x redundant FLOPs).  Round-3 chunked target: tile_h=32/wc=1024
=> ~2.1x multiplier, projected ~60+ MP/s vs XLA-bf16's 42.6.

Round-5 STATUS (decision record, VERDICT r4 weak #4): lane packing
(kernels/apply.py) raised the XLA bar to 64.4 MP/s at even batches —
beyond this kernel's reachable roofline: with the >=2.1x halo-recompute
multiplier, tying packed-XLA's measured 85.7 useful TFLOP/s requires
>=180 TFLOP/s sustained issued throughput (91% of v5e bf16 peak), vs the
123.6 this kernel measures at its own roofline.  A pack-aware 128-lane
variant therefore cannot win and was not built.  The kernel REMAINS the
``--pallas`` route for odd/single-frame batches (44.1 vs XLA-bf16's
42.6 MP/s), where packing cannot apply; even batches route to packed XLA
(kernels/apply.py::pallas_apply_fn).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["vdsr_fused_forward", "extract_vdsr_weights"]

_G1 = 8  # first-conv (1->64) row group
_GL = 8  # last-conv (64->1) row group
_MAX_SEG = 6  # convs per segment (VMEM- and halo-bounded)
# Chunk column halo (lane-aligned margin each side).  Must be a multiple of
# 128 lanes /2 = 64 so wcin stays 128-aligned with both margins; needs only
# >= max_seg + roll-wrap creep (<= 2*max_seg), so 64 is ample and keeps the
# lane-overhead multiplier at (wc+128)/wc instead of (wc+256)/wc.
_M = 64


def extract_vdsr_weights(params: dict) -> list[tuple[jnp.ndarray, jnp.ndarray]]:
    """Ordered [(kernel (3,3,ci,co), bias (co,)), ...] from the flax tree."""
    depth = len(params)
    return [
        (params[f"Conv_{i}"]["kernel"], params[f"Conv_{i}"]["bias"])
        for i in range(depth)
    ]


def _segment_sizes(depth: int, max_seg: int = _MAX_SEG) -> list[int]:
    """Split `depth` convs into segments of at most ``max_seg``."""
    sizes = []
    left = depth
    while left > 0:
        s = min(max_seg, left)
        sizes.append(s)
        left -= s
    return sizes


def _align(v: int, m: int) -> int:
    return -(-v // m) * m


# --------------------------------------------------------------------------
# weight assembly (trace-time, tiny)
# --------------------------------------------------------------------------


def _first_weights(w, b, cdt):
    """W1 (G1*F, 3*16): col d*16 + (k+dyi) <- w[dyi, d, 0, c]; row k*F + c."""
    f = w.shape[-1]
    w1 = jnp.zeros((_G1 * f, 3 * 16), jnp.float32)
    for k in range(_G1):
        for d in range(3):
            w1 = jax.lax.dynamic_update_slice(
                w1, w[:, d, 0, :].T.astype(jnp.float32), (k * f, d * 16 + k)
            )
    b1 = jnp.tile(b, _G1).reshape(_G1 * f, 1).astype(jnp.float32)
    return w1.astype(cdt), b1


def _mid_weights(w, b, g, cdt):
    """Per dx: (G*F, (G+2)*F); col (k+dyi)*F + ci <- w[dyi, d, ci, c]."""
    ci, f = w.shape[2], w.shape[3]
    mats = []
    for d in range(3):
        m = jnp.zeros((g * f, (g + 2) * ci), jnp.float32)
        blk = jnp.transpose(w[:, d], (2, 0, 1)).reshape(f, 3 * ci)
        for k in range(g):
            m = jax.lax.dynamic_update_slice(m, blk, (k * f, k * ci))
        mats.append(m.astype(cdt))
    bt = jnp.tile(b, g).reshape(g * f, 1).astype(jnp.float32)
    return mats, bt


def _last_weights(w, b, cdt):
    """Per dx: (GL, (GL+2)*Ci); col (k+dyi)*Ci + ci <- w[dyi, d, ci, 0]."""
    ci = w.shape[2]
    mats = []
    for d in range(3):
        m = jnp.zeros((_GL, (_GL + 2) * ci), jnp.float32)
        blk = w[:, d, :, 0].reshape(1, 3 * ci)
        for k in range(_GL):
            m = jax.lax.dynamic_update_slice(m, blk, (k, k * ci))
        mats.append(m.astype(cdt))
    bl = jnp.full((_GL, 1), b[0], jnp.float32)
    return mats, bl


# --------------------------------------------------------------------------
# segment kernel
# --------------------------------------------------------------------------


def _seg_kernel(*refs, cfg):
    (n, nb, ncw, tb, h, width, wc, wcin, feat, seg, has_first, has_last, g,
     spanp, slabp, stride_in, stride_skip, hp, cdt, compact) = cfg
    n_mid = seg - int(has_first) - int(has_last)

    it = iter(refs)
    in_ref = next(it)
    skip_ref = next(it) if has_last else None
    if has_first:
        w1, b1 = next(it), next(it)
    mids = [(next(it), next(it), next(it), next(it)) for _ in range(n_mid)]
    if has_last:
        wl = (next(it), next(it), next(it))
        bl = next(it)
    out_ref = next(it)
    bufs = [next(it), next(it)]
    slab = next(it) if has_first else None
    gbuf = next(it) if not has_last else None
    if has_last:
        skipv, outv = next(it), next(it)
    sem_in, sem_out = next(it), next(it)
    sem_skip = next(it) if has_last else None

    col = jax.lax.broadcasted_iota(jnp.int32, (1, wcin), 1)
    # the segment-final roll undoes the seg-column shift AND lands the
    # output window at lane offset 0: rolled[s'] = v[s' + _M - seg]
    rollback = (wcin + seg - _M) % wcin

    def col_ok(cb, li):
        # slab col s holds global col g = cb + s - _M + li after li convs
        lo = _M - li - cb
        return jnp.logical_and(col >= lo, col < lo + width)

    def row_ok(base, gb, rows, chan):
        m = jax.lax.broadcasted_iota(jnp.int32, (rows * chan, 1), 0)
        t = base - seg + gb + m // chan
        return jnp.logical_and(t >= 0, t < h)

    def step(k, _):
        ni = k // (ncw * nb)
        ci = (k // nb) % ncw
        hi = k % nb
        base = hi * tb
        cb = ci * wc
        li = 0  # convs consumed so far in this segment
        cur = 0  # ping-pong index holding the segment's current activations

        if has_first:
            cp = pltpu.make_async_copy(
                in_ref.at[pl.ds((ni * ncw + ci) * stride_in + base, slabp)],
                slab.at[0:slabp], sem_in,
            )
            cp.start()
            cp.wait()
            sl_all = slab[:, :]
            slab3 = [
                sl_all if d == 0 else pltpu.roll(sl_all, wcin - d, axis=1)
                for d in range(3)
            ]
            okc = col_ok(cb, 1)
            for gi in range(spanp // _G1):
                panel = jnp.concatenate(
                    [s3[_G1 * gi : _G1 * gi + 16, :] for s3 in slab3], axis=0
                )  # (48, wcin) f32, 8-aligned 16-row pieces
                mm = jnp.dot(
                    w1[:], panel.astype(cdt), preferred_element_type=jnp.float32
                )  # (G1*feat, wcin)
                v = jax.nn.relu(mm + b1[:])
                ok = jnp.logical_and(row_ok(base, _G1 * gi, _G1, feat), okc)
                bufs[0][pl.ds((1 + _G1 * gi) * feat, _G1 * feat), :] = jnp.where(
                    ok, v, 0.0
                ).astype(cdt)
            li, cur = 1, 0
        else:
            cp = pltpu.make_async_copy(
                in_ref.at[pl.ds(
                    ((ni * ncw + ci) * stride_in + 8 + base - seg) * feat,
                    spanp * feat)],
                bufs[0].at[pl.ds(feat, spanp * feat)], sem_in,
            )
            cp.start()
            cp.wait()

        for mi, (wd0, wd1, wd2, bt) in enumerate(mids):
            wd = (wd0, wd1, wd2)
            src, dst = bufs[cur], bufs[1 - cur]
            okc = col_ok(cb, li + 1)
            final = (not has_last) and mi == n_mid - 1

            def group(gb, *, wd=wd, bt=bt, src=src, dst=dst, okc=okc,
                      final=final):
                sl = src[pl.ds(gb * feat, (g + 2) * feat), :]
                acc = None
                for d in range(3):
                    mm = jnp.dot(
                        wd[d][:], sl, preferred_element_type=jnp.float32
                    )  # (g*feat, wcin)
                    if d:  # out[j] = sum_d mm_d[j + d]
                        mm = pltpu.roll(mm, wcin - d, axis=1)
                    acc = mm if acc is None else acc + mm
                v = jax.nn.relu(acc + bt[:])
                ok = jnp.logical_and(row_ok(base, gb, g, feat), okc)
                v = jnp.where(ok, v, 0.0)
                if not final:
                    dst[pl.ds((1 + gb) * feat, g * feat), :] = v.astype(cdt)
                    return
                # segment-final conv: roll the seg-shift away (window lands
                # at lane offset 0), slice the chunk's wc columns, DMA the
                # group's rows straight to the chunk-major HBM output.
                # DMAs go through a 2-slot ring with deferred waits: a
                # serialized start->wait per group costs ~2 us x tb/g groups
                # x blocks x segments (>10 ms/frame at 1080p); the ring keeps
                # the next group's matmul running while the copy drains.
                rolled = pltpu.roll(v, rollback, axis=1)
                gi_ = jnp.int32(gb // g) - seg // g  # 0-based final group idx
                slot = jax.lax.rem(gi_, jnp.int32(2)) * (g * feat)
                dst = gbuf.at[pl.ds(slot, g * feat)]

                @pl.when(gi_ >= 2)
                def _wait_prev():
                    # one completion of this byte count (FIFO per engine)
                    pltpu.make_async_copy(dst, dst, sem_out).wait()

                gbuf[pl.ds(slot, g * feat), :] = rolled[:, 0:wc].astype(cdt)
                pltpu.make_async_copy(
                    dst,
                    out_ref.at[pl.ds(
                        ((ni * ncw + ci) * hp + base + gb - seg) * feat,
                        g * feat)],
                    sem_out,
                ).start()

            # the segment-final conv only needs the interior output rows
            # [seg, seg+tb); earlier convs compute the full (shrinking) span
            g0, g1 = (seg // g, (seg + tb) // g) if final else (0, spanp // g)
            if compact:
                # fori_loop over groups with dynamic (x feat sublanes,
                # alignment-provable) offsets: ~(spanp/g)x smaller Mosaic
                # program — the compile-time lever.
                jax.lax.fori_loop(
                    g0, g1, lambda gi, _: (group(gi * g), 0)[1], 0
                )
            else:
                for gi in range(g0, g1):
                    group(g * gi)
            if final:
                # drain the 2-slot output-DMA ring before the block moves on
                for s_ in range(min(2, g1 - g0)):
                    d_ = gbuf.at[pl.ds(s_ * g * feat, g * feat)]
                    pltpu.make_async_copy(d_, d_, sem_out).wait()
            li += 1
            cur = 1 - cur

        if has_last:
            cs = pltpu.make_async_copy(
                skip_ref.at[pl.ds((ni * ncw + ci) * stride_skip + base, tb)],
                skipv, sem_skip,
            )
            cs.start()
            cs.wait()
            src = bufs[cur]
            for gi in range(tb // _GL):
                gb = seg + _GL * gi  # first output interior row of the group
                sl = src[pl.ds(gb * feat, (_GL + 2) * feat), :]
                acc = None
                for d in range(3):
                    mm = jnp.dot(
                        wl[d][:], sl, preferred_element_type=jnp.float32
                    )  # (GL, wcin)
                    if d:
                        mm = pltpu.roll(mm, wcin - d, axis=1)
                    acc = mm if acc is None else acc + mm
                rolled = pltpu.roll(acc + bl[:], rollback, axis=1)
                outv[pl.ds(_GL * gi, _GL), :] = (
                    rolled[:, 0:wc] + skipv[pl.ds(_GL * gi, _GL), :]
                )
            cpo = pltpu.make_async_copy(
                outv,
                out_ref.at[pl.ds((ni * ncw + ci) * stride_skip + base, tb)],
                sem_out,
            )
            cpo.start()
            cpo.wait()
        return 0

    # zero guard rows once; interior rows are fully rewritten every block.
    for b_ in bufs:
        rows = b_.shape[0]
        b_[0:feat, :] = jnp.zeros((feat, wcin), cdt)
        b_[rows - feat : rows, :] = jnp.zeros((feat, wcin), cdt)
    if has_first:
        slab[:, :] = jnp.zeros((slabp, wcin), jnp.float32)
    jax.lax.fori_loop(0, n * ncw * nb, step, 0)


# --------------------------------------------------------------------------
# host-side driver
# --------------------------------------------------------------------------


def vdsr_fused_forward(
    params: dict,
    x: jnp.ndarray,
    tile_h: int | None = None,
    group: int = 2,
    bf16: bool = True,
    compact: bool = True,
    max_seg: int = 4,
    wc: int | None = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused VDSR forward.  x: (N, H, W[, 1]) pre-upscaled Y -> (N, H, W, 1).

    ``bf16=True`` stores activations/weights in bf16 with f32 accumulation
    (~1e-2 absolute error — PSNR-irrelevant); ``bf16=False`` matches the
    flax apply to ~1e-5.  ``group`` is the MXU row-group G (2 or 4): the
    assembled K window wastes (G+2)/3 x FLOPs, so G=2 minimizes MACs while
    G=4 maximizes matmul size.  ``wc`` is the width-chunk in output columns
    (multiple of 128; None = whole width in one chunk) — chunking keeps the
    activation slab narrow so ``tile_h`` can grow inside the 16 MB
    scoped-VMEM cap.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ws = extract_vdsr_weights(params)
    assert ws[0][0].shape[2] == 1 and ws[-1][0].shape[3] == 1, (
        "fused VDSR supports channels=1 (the Y protocol path)"
    )
    assert len(ws) >= 3 and max_seg >= 2
    return _vdsr_fused(tuple(ws), x, tile_h, group, bf16, compact, max_seg,
                       wc, interpret)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_h", "group", "bf16", "compact", "max_seg", "wc", "interpret"
    ),
)
def _vdsr_fused(ws, x, tile_h, group, bf16, compact, max_seg, wc, interpret):
    if x.ndim == 4:
        x = x[..., 0]
    x = x.astype(jnp.float32)
    n, h, width = x.shape
    feat = ws[0][0].shape[-1]
    depth = len(ws)
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    sizes = _segment_sizes(depth, max_seg)

    # Default config: the measured on-device winner (RESULTS.md round 3):
    # tb=32/wc=1024/compact at 44.7 MP/s 1080p x4 vs XLA-bf16's 42.6 — and
    # the largest config the remote Mosaic compiler accepts (span<=40 rows
    # at <=1152 lanes; everything bigger crashes tpu_compile_helper).
    tb = tile_h if tile_h is not None else 32
    tb = min(tb, _align(h, 8))
    hp = _align(h, tb)
    nb = hp // tb
    hps = _align(hp, 8)
    if wc is None or wc >= _align(width, 128):
        wc = _align(width, 128)
    assert wc % 128 == 0
    ncw = -(-width // wc)
    wcin = wc + 2 * _M
    cw = ncw * wc  # covered output columns (>= width; excess masked to 0)
    # non-last segments end in a group-DMA'd mid conv whose interior window
    # [seg, seg+tb) must align to the group grid
    for seg in sizes[:-1]:
        assert seg % group == 0, (seg, group)
    assert tb % group == 0 and tb % _GL == 0

    def chunk_overlapped(full):
        """(..., _M + cw + _M) -> (n, ncw, ..., wcin) overlapped chunks."""
        return jnp.stack(
            [full[..., ci * wc : ci * wc + wcin] for ci in range(ncw)], axis=1
        )

    # skip, chunk-major non-overlapped: (n*ncw*hps, wc) f32
    spad = jnp.zeros((n, hps, cw), jnp.float32)
    spad = spad.at[:, :h, :width].set(x)
    sp = spad.reshape(n, hps, ncw, wc).transpose(0, 2, 1, 3)
    sp = sp.reshape(n * ncw * hps, wc)

    cur = None  # inter-segment activations: (n*ncw*hp*feat, wc) cdt
    ci0 = 0
    for si, seg in enumerate(sizes):
        has_first = si == 0
        has_last = si == len(sizes) - 1
        n_mid = seg - int(has_first) - int(has_last)
        spanp = _align(tb + 2 * seg, 8)
        slabp = _align(spanp + 2, 8)

        ins = []
        if has_first:
            stride_in = _align(seg + 1 + hp + seg + 8, 8)
            xp = jnp.zeros((n, stride_in, _M + cw + _M), jnp.float32)
            xp = xp.at[:, seg + 1 : seg + 1 + h, _M : _M + width].set(x)
            xp = chunk_overlapped(xp)  # (n, ncw, stride_in, wcin)
            ins.append(xp.reshape(n * ncw * stride_in, wcin))
        else:
            stride_in = 8 + hp + 16
            full = cur.reshape(n, ncw, hp, feat, wc)
            full = full.transpose(0, 2, 3, 1, 4).reshape(n, hp, feat, cw)
            xp = jnp.zeros((n, stride_in, feat, _M + cw + _M), cdt)
            xp = xp.at[:, 8 : 8 + hp, :, _M : _M + cw].set(full)
            xp = chunk_overlapped(xp)  # (n, ncw, stride_in, feat, wcin)
            ins.append(xp.reshape(n * ncw * stride_in * feat, wcin))
        if has_last:
            ins.append(sp)

        args = []
        if has_first:
            w1, b1 = _first_weights(*ws[ci0], cdt)
            args += [w1, b1]
        for li in range(n_mid):
            mats, bt = _mid_weights(*ws[ci0 + int(has_first) + li], group, cdt)
            args += [*mats, bt]
        if has_last:
            wl, bl = _last_weights(*ws[ci0 + seg - 1], cdt)
            args += [*wl, bl]

        scratch = [
            pltpu.VMEM(((spanp + 2) * feat, wcin), cdt),
            pltpu.VMEM(((spanp + 2) * feat, wcin), cdt),
        ]
        if has_first:
            scratch.append(pltpu.VMEM((slabp, wcin), jnp.float32))
        if not has_last:
            # 2-slot output-DMA ring (deferred waits; see _seg_kernel)
            scratch.append(pltpu.VMEM((2 * group * feat, wc), cdt))
        if has_last:
            scratch.append(pltpu.VMEM((tb, wc), jnp.float32))  # skipv
            scratch.append(pltpu.VMEM((tb, wc), jnp.float32))  # outv
        scratch += [pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())]
        if has_last:
            scratch.append(pltpu.SemaphoreType.DMA(()))

        if has_last:
            out_shape = jax.ShapeDtypeStruct((n * ncw * hps, wc), jnp.float32)
        else:
            out_shape = jax.ShapeDtypeStruct((n * ncw * hp * feat, wc), cdt)

        cfg = (n, nb, ncw, tb, h, width, wc, wcin, feat, seg, has_first,
               has_last, group, spanp, slabp, stride_in, hps, hp, cdt,
               compact)
        kernel = functools.partial(_seg_kernel, cfg=cfg)
        cur = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(ins)
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*ins, *args)
        ci0 += seg

    out = cur.reshape(n, ncw, hps, wc).transpose(0, 2, 1, 3)
    out = out.reshape(n, hps, cw)[:, :h, :width]
    return out[..., None].astype(jnp.float32)
