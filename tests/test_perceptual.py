"""FeatureNet perceptual metric: feature_distance unit goldens + the
`sr eval --perceptual` CLI path (the metric counterpart of the SRGAN
perceptual loss; reference analogue: VGG-space distances reported in
arXiv:1609.04802's perceptual-quality discussion)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_super_resolution_tpu.cli import main
from ml_super_resolution_tpu.models.featurenet import (
    FeatureNet,
    FeatureNetAE,
    feature_distance,
    save_feature_net,
)


@pytest.fixture(scope="module")
def feat_params():
    net = FeatureNet()
    return net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]


def test_identity_distance_is_zero(feat_params, rng):
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    assert float(feature_distance(feat_params, x, x)) == 0.0


def test_noise_increases_distance(feat_params, rng):
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    small = x + 0.01 * jnp.asarray(rng.standard_normal(x.shape), x.dtype)
    large = x + 0.3 * jnp.asarray(rng.standard_normal(x.shape), x.dtype)
    d_small = float(feature_distance(feat_params, x, small))
    d_large = float(feature_distance(feat_params, x, large))
    assert 0.0 < d_small < d_large


def test_unbatched_and_grayscale_inputs(feat_params, rng):
    a = jnp.asarray(rng.random((32, 32, 1)).astype(np.float32))
    b = jnp.asarray(rng.random((32, 32, 1)).astype(np.float32))
    d = float(feature_distance(feat_params, a, b))
    # grayscale is replicated to 3 channels; must equal the explicit tiling
    d3 = float(feature_distance(
        feat_params, jnp.repeat(a[None], 3, -1), jnp.repeat(b[None], 3, -1)))
    assert np.isfinite(d) and d > 0
    assert d == pytest.approx(d3)


@pytest.mark.slow
def test_cli_eval_perceptual(tmp_path, capsys):
    wd = tmp_path / "run"
    rc = main([
        "train", "--model", "espcn", "--scale", "2",
        "--workdir", str(wd), "--steps", "2", "--batch-size", "4",
        "--patch-size", "32", "--dp", "1",
        "--ckpt-every", "2", "--eval-every", "1000", "--log-every", "2",
    ])
    assert rc == 0
    capsys.readouterr()

    ae = FeatureNetAE()
    params = ae.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    fn_path = save_feature_net({"encoder": params["encoder"]}, tmp_path / "fn")

    rc = main(["eval", "--workdir", str(wd), "--perceptual", str(fn_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["perceptual"] == str(fn_path)
    assert np.isfinite(out["featnet"]) and out["featnet"] >= 0
