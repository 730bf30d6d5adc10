"""Halo-exchange tiling goldens: tiled output must equal whole-frame output
bitwise (SURVEY §4 "distributed without a cluster"; §7 hard part #3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_super_resolution_tpu.infer import upscale_frames
from ml_super_resolution_tpu.models import MODEL_SPECS, build_model
from ml_super_resolution_tpu.parallel.mesh import make_mesh
from ml_super_resolution_tpu.parallel.tiling import tiled_apply
from ml_super_resolution_tpu.utils.config import ModelConfig


def test_make_mesh_shapes():
    m = make_mesh(dp=2, sp=4)
    assert m.shape == {"data": 2, "space": 4}
    m2 = make_mesh(sp=8)
    assert m2.shape == {"data": 1, "space": 8}
    with pytest.raises(ValueError):
        make_mesh(dp=4, sp=4)


@pytest.mark.parametrize(
    "name,sp,h",
    [
        ("srcnn", 4, 64),
        ("espcn", 8, 64),
        # band >= 2*halo; the 20-conv vdsr case is the slow one
        pytest.param("vdsr", 2, 80, marks=pytest.mark.slow),
    ],
)
def test_tiled_equals_whole_frame(name, sp, h, rng):
    """The load-bearing parity test: band-tiled conv stack with ppermute halo
    exchange reproduces the whole-frame result exactly — including at the
    global frame edges (asymmetric boundary bands)."""
    scale = 2
    cfg = ModelConfig(name=name, scale=scale, channels=1)
    model = build_model(cfg)
    spec = MODEL_SPECS[name]
    x = jnp.asarray(rng.random((1, h, 40, 1)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)

    def apply_fn(inp):
        return model.apply(variables, inp, train=False)

    whole = apply_fn(x)
    mesh = make_mesh(sp=sp)
    net_scale = scale if spec["lr_space"] else 1
    tiled = tiled_apply(
        apply_fn, x, mesh, halo=spec["rf_radius"](scale), scale=net_scale
    )
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(whole))


def test_insufficient_halo_breaks_exactness(rng):
    """Sanity check that the test is sharp: halo=0 on a conv net must differ
    at band boundaries (otherwise the parity test proves nothing)."""
    cfg = ModelConfig(name="espcn", scale=2, channels=1)
    model = build_model(cfg)
    x = jnp.asarray(rng.random((1, 64, 40, 1)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)

    def apply_fn(inp):
        return model.apply(variables, inp, train=False)

    whole = np.asarray(apply_fn(x))
    mesh = make_mesh(sp=8)
    broken = np.asarray(tiled_apply(apply_fn, x, mesh, halo=0, scale=2))
    assert not np.array_equal(broken, whole)


def test_tiled_apply_rejects_indivisible_height(rng):
    mesh = make_mesh(sp=8)
    x = jnp.zeros((1, 30, 16, 1))
    with pytest.raises(ValueError):
        tiled_apply(lambda v: v, x, mesh, halo=1, scale=1)


def test_tiled_apply_rejects_band_smaller_than_two_halos(rng):
    mesh = make_mesh(sp=8)
    x = jnp.zeros((1, 64, 16, 1))  # band 8 < 2*8
    with pytest.raises(ValueError):
        tiled_apply(lambda v: v, x, mesh, halo=8, scale=1)


@pytest.mark.parametrize("name,sp,h", [("espcn", 8, 64), ("srcnn", 4, 32)])
@pytest.mark.slow
def test_upscale_frames_tiled_equals_whole(name, sp, h, rng):
    """End-to-end upscale (color split + network + merge): tiled == whole,
    covering both LR-space (espcn) and pre-upscaled (srcnn) input paths."""
    scale = 2
    cfg = ModelConfig(name=name, scale=scale, channels=1)
    model = build_model(cfg)
    dummy = jnp.zeros((1, 16, 16, 1), jnp.float32)
    variables = model.init(jax.random.key(0), dummy, train=False)

    frames = (rng.random((2, h, 48, 3)) * 255).astype(np.uint8)
    whole = upscale_frames(model, variables, jnp.asarray(frames), name, scale, mesh=None)
    mesh = make_mesh(sp=sp)
    tiled = upscale_frames(model, variables, jnp.asarray(frames), name, scale, mesh=mesh)
    assert whole.shape == (2, h * scale, 96, 3)
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(whole))


@pytest.mark.slow
def test_upscale_frames_pads_indivisible_height(rng):
    """Heights not divisible by the space axis: padded band pass + exact
    bottom-strip fixup must still equal whole-frame bitwise."""
    cfg = ModelConfig(name="espcn", scale=2, channels=1)
    model = build_model(cfg)
    dummy = jnp.zeros((1, 8, 8, 1), jnp.float32)
    variables = model.init(jax.random.key(0), dummy, train=False)
    frames = (rng.random((1, 49, 40, 3)) * 255).astype(np.uint8)  # 49 % 4 != 0
    whole = upscale_frames(model, variables, jnp.asarray(frames), "espcn", 2, mesh=None)
    mesh = make_mesh(sp=4)
    tiled = upscale_frames(model, variables, jnp.asarray(frames), "espcn", 2, mesh=mesh)
    assert whole.shape == (1, 98, 80, 3)
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(whole))


def test_upscale_frames_short_frame_falls_back_to_whole(rng):
    """Frames too short to satisfy band >= 2*halo run whole-frame (no crash)."""
    cfg = ModelConfig(name="vdsr", scale=2, channels=1)
    model = build_model(cfg)
    dummy = jnp.zeros((1, 8, 8, 1), jnp.float32)
    variables = model.init(jax.random.key(0), dummy, train=False)
    frames = (rng.random((1, 24, 24, 3)) * 255).astype(np.uint8)
    mesh = make_mesh(sp=8)
    out = upscale_frames(model, variables, jnp.asarray(frames), "vdsr", 2, mesh=mesh)
    assert out.shape == (1, 48, 48, 3)


def test_upscale_frames_pallas_path_matches(rng):
    """use_pallas (fused ESPCN kernel, interpret on CPU) == flax path."""
    cfg = ModelConfig(name="espcn", scale=2, channels=1)
    model = build_model(cfg)
    dummy = jnp.zeros((1, 8, 8, 1), jnp.float32)
    variables = model.init(jax.random.key(0), dummy, train=False)
    frames = (rng.random((2, 24, 32, 3)) * 255).astype(np.uint8)
    a = upscale_frames(model, variables, jnp.asarray(frames), "espcn", 2)
    b = upscale_frames(
        model, variables, jnp.asarray(frames), "espcn", 2, use_pallas=True
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("name,grid,hw", [
    ("espcn", (2, 4), (32, 64)),   # block 16x16 >= 2*4
    ("espcn", (4, 2), (64, 32)),
    ("srcnn", (2, 2), (64, 64)),   # halo 8 -> blocks 32x32
])
@pytest.mark.slow
def test_tiled_2d_equals_whole_frame(name, grid, hw, rng):
    """2D rows x cols halo exchange == whole-frame, bitwise."""
    from ml_super_resolution_tpu.parallel.tiling import tiled_apply_2d

    scale = 2
    cfg = ModelConfig(name=name, scale=scale, channels=1)
    model = build_model(cfg)
    spec = MODEL_SPECS[name]
    h, w = hw
    x = jnp.asarray(rng.random((1, h, w, 1)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)

    def apply_fn(inp):
        return model.apply(variables, inp, train=False)

    whole = apply_fn(x)
    mesh = make_mesh(dp=1, sp=grid[0], sw=grid[1])
    net_scale = scale if spec["lr_space"] else 1
    tiled = tiled_apply_2d(
        apply_fn, x, mesh, halo=spec["rf_radius"](scale), scale=net_scale
    )
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(whole))


def test_tiled_2d_rejects_small_blocks(rng):
    from ml_super_resolution_tpu.parallel.tiling import tiled_apply_2d

    mesh = make_mesh(dp=1, sp=2, sw=4)
    x = jnp.zeros((1, 32, 32, 1))  # col blocks 8 < 2*8
    with pytest.raises(ValueError):
        tiled_apply_2d(lambda v: v, x, mesh, halo=8, scale=1)


@pytest.mark.slow
def test_upscale_frames_2d_tiled_equals_whole(rng):
    """Product-path 2D tiling (mesh with space_w) == whole-frame bitwise,
    on H and W both indivisible by the grid (pad + strip fixup, both axes)."""
    cfg = ModelConfig(name="espcn", scale=2, channels=1)
    model = build_model(cfg)
    dummy = jnp.zeros((1, 8, 8, 1), jnp.float32)
    variables = model.init(jax.random.key(0), dummy, train=False)
    # 45 % 2 != 0 and 53 % 4 != 0: both axes need pad + exact fixup
    frames = (rng.random((1, 45, 53, 3)) * 255).astype(np.uint8)
    whole = upscale_frames(model, variables, jnp.asarray(frames), "espcn", 2, mesh=None)
    mesh = make_mesh(dp=1, sp=2, sw=4)
    tiled = upscale_frames(model, variables, jnp.asarray(frames), "espcn", 2, mesh=mesh)
    assert whole.shape == (1, 90, 106, 3)
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(whole))


@pytest.mark.slow
def test_upscale_frames_2d_divisible(rng):
    """2D tiling on exactly-divisible dims (no fixup path)."""
    cfg = ModelConfig(name="srcnn", scale=2, channels=1)
    model = build_model(cfg)
    dummy = jnp.zeros((1, 8, 8, 1), jnp.float32)
    variables = model.init(jax.random.key(0), dummy, train=False)
    frames = (rng.random((1, 64, 64, 3)) * 255).astype(np.uint8)
    whole = upscale_frames(model, variables, jnp.asarray(frames), "srcnn", 2, mesh=None)
    mesh = make_mesh(dp=1, sp=2, sw=2)
    tiled = upscale_frames(model, variables, jnp.asarray(frames), "srcnn", 2, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(whole))


@pytest.mark.slow
def test_upscale_frames_int8_tiled_equals_whole(rng):
    """--tiles x --int8 composition: the quantized convs are exact integer
    ops and the epilogue is per-element, so halo-exchange tiling must be
    bitwise-identical to the whole-frame int8 forward."""
    scale = 2
    name = "espcn"
    cfg = ModelConfig(name=name, scale=scale, channels=1)
    model = build_model(cfg)
    dummy = jnp.zeros((1, 16, 16, 1), jnp.float32)
    variables = model.init(jax.random.key(0), dummy, train=False)

    frames = (rng.random((2, 64, 48, 3)) * 255).astype(np.uint8)
    whole = upscale_frames(model, variables, jnp.asarray(frames), name,
                           scale, mesh=None, int8=True)
    tiled = upscale_frames(model, variables, jnp.asarray(frames), name,
                           scale, mesh=make_mesh(sp=4), int8=True)
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(whole))
    # and int8 really changed the numbers vs f32 (the flag is live)
    f32 = upscale_frames(model, variables, jnp.asarray(frames), name,
                         scale, mesh=None)
    assert not np.array_equal(np.asarray(whole), np.asarray(f32))
