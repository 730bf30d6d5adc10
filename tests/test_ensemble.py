"""Geometric self-ensemble (EDSR+, arXiv:1707.02921 §5) goldens.

The wrapper averages the net output over the 8 dihedral transforms of the
input; the reference here builds each transform independently with numpy
(np.rot90 / np.flip on HWC) so the jax axes conventions are cross-checked,
not just replayed.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from ml_super_resolution_tpu.infer import d4_ensemble, upscale_frames
from ml_super_resolution_tpu.models import build_model
from ml_super_resolution_tpu.parallel.mesh import make_mesh
from ml_super_resolution_tpu.utils.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)


def _espcn(scale=2):
    model = build_model(ModelConfig(name="espcn", scale=scale, channels=1))
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 12, 16, 1)), jnp.float32)
    variables = model.init(jax.random.key(1), x, train=False)
    return model, variables, x


def test_d4_ensemble_matches_numpy_reference():
    model, variables, x = _espcn()

    def ap(b):
        return model.apply(variables, b, train=False)

    got = np.asarray(d4_ensemble(ap)(x))

    outs = []
    xn = np.asarray(x)
    for flip in (False, True):
        xf = xn[:, :, ::-1] if flip else xn
        for k in range(4):
            t = np.rot90(xf, k, axes=(1, 2)).copy()
            y = np.asarray(ap(jnp.asarray(t)))
            y = np.rot90(y, -k, axes=(1, 2))
            if flip:
                y = y[:, :, ::-1]
            outs.append(y)
    ref = np.mean(outs, axis=0)
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # the net is NOT D4-equivariant, so the ensemble must actually differ
    # from the plain forward (otherwise this test proves nothing)
    plain = np.asarray(ap(x))
    assert np.abs(got - plain).max() > 1e-6


def test_d4_ensemble_is_identity_for_equivariant_fn():
    # nearest-neighbor x2 upsample commutes with every dihedral transform,
    # so all 8 ensemble members coincide with the plain output exactly
    def up(b):
        return jnp.repeat(jnp.repeat(b, 2, axis=1), 2, axis=2)

    x = jnp.asarray(np.random.default_rng(2).random((2, 7, 9, 3)), jnp.float32)
    # (to float-accumulation tolerance: x+x+x rounds, so /8 is not bit-exact)
    np.testing.assert_allclose(np.asarray(d4_ensemble(up)(x)),
                               np.asarray(up(x)), rtol=1e-6, atol=0)


@pytest.mark.slow
def test_upscale_frames_ensemble_tiled_equals_whole():
    # ensemble wraps the whole tiled forward; tiled == whole bitwise per
    # transform, so the ensembled uint8 frames must match bitwise too
    model, variables, _ = _espcn()
    frames = (np.random.default_rng(3).random((1, 64, 48, 3)) * 255
              ).astype(np.uint8)
    whole = upscale_frames(model, variables, jnp.asarray(frames), "espcn", 2,
                           mesh=None, ensemble=True)
    tiled = upscale_frames(model, variables, jnp.asarray(frames), "espcn", 2,
                           mesh=make_mesh(dp=1, sp=4), ensemble=True)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(tiled))
    assert whole.shape == (1, 128, 96, 3)


def test_trainer_evaluate_ensemble():
    from ml_super_resolution_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        model=ModelConfig(name="espcn", scale=2, channels=1),
        data=DataConfig(patch_size=16, batch_size=4),
        train=TrainConfig(steps=1, log_every=10**9),
    )
    trainer = Trainer(cfg, workdir=None)
    state = trainer.init_state(0)
    # perturb params so the net is decisively non-equivariant (a fresh init
    # can land in [0,1]-clip saturation where all 8 members coincide)
    leaves, treedef = jax.tree.flatten(state.params)
    rng = np.random.default_rng(7)
    leaves = [jnp.asarray(l) + jnp.asarray(
        rng.normal(0, 0.05, np.shape(l)), jnp.float32) for l in leaves]
    state = state.replace(params=jax.tree.unflatten(treedef, leaves))
    imgs = [(np.random.default_rng(4).random((24, 28, 3)) * 255
             ).astype(np.uint8)]
    plain = trainer.evaluate(state, imgs)
    ens = trainer.evaluate(state, imgs, ensemble=True)
    ens2 = trainer.evaluate(state, imgs, ensemble=True)  # cached jit path
    assert np.isfinite(ens["psnr"]) and np.isfinite(ens["ssim"])
    assert ens == ens2
    assert ens["psnr"] != plain["psnr"]  # untrained net: members disagree
